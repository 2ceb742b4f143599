package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigating equi-join (SURVEY §7.4-4: 1:99 label/key skew).
  *
  * AQE's skew-join handling splits oversized SHUFFLE partitions, but it
  * cannot help when a single join KEY is hot (all its rows must still
  * meet). Salting can: the skewed (large) side appends a random salt in
  * [0, n) to its key; the small side is exploded n× with every salt
  * value; the join key becomes (key, salt), spreading each hot key over
  * n reducers. Classic cost/benefit: n× replication of the small side
  * buys n× parallelism on the hot keys — use only for genuinely skewed
  * joins, with n sized to the observed hot-key multiplicity.
  */
object SaltedJoin {

  def inner(large: DataFrame, small: DataFrame, key: String, nSalts: Int,
      seed: Long = 42L): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val salted = large.withColumn("__salt",
      (rand(seed) * nSalts).cast("int"))
    val exploded = small.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Deterministic variant: the salt is derived from a hash of other
    * columns of the large side, so replaying the join yields identical
    * row placement (useful under checkpoint replay). */
  def innerDeterministic(large: DataFrame, small: DataFrame, key: String,
      saltCols: Seq[Column], nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val salted = large.withColumn("__salt", pmod(hash(saltCols: _*), lit(nSalts)))
    val exploded = small.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}

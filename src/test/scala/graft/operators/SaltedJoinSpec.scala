package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 90% of rows share key 1
  private lazy val large = (1 to 1000)
    .map(i => (if (i <= 900) 1L else (i % 50).toLong, i))
    .toDF("k", "v")
  private lazy val small = Seq((1L, "hot"), (7L, "a"), (13L, "b"), (0L, "zero"))
    .toDF("k", "name")

  test("salted join equals the plain join result") {
    val plain = large.join(small, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (joined <- Seq(
        SaltedJoin.inner(large, small, "k", nSalts = 8),
        SaltedJoin.innerDeterministic(large, small, "k", Seq(col("v")), nSalts = 8))) {
      val got = joined.groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === plain)
    }
  }

  test("the hot key is spread across multiple salt buckets") {
    val spread = large.withColumn("__salt", pmod(hash(col("v")), lit(8)))
      .filter(col("k") === 1)
      .select(countDistinct("__salt")).head().getLong(0)
    assert(spread >= 6, s"hot key only reached $spread of 8 salt buckets")
  }

  test("deterministic variant is stable under repartitioning") {
    val a = SaltedJoin.innerDeterministic(large, small, "k", Seq(col("v")), 4)
      .orderBy("k", "v").collect().toSeq
    val b = SaltedJoin.innerDeterministic(large.repartition(11), small, "k", Seq(col("v")), 4)
      .orderBy("k", "v").collect().toSeq
    assert(a === b)
  }
}

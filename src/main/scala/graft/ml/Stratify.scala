package graft.ml

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable exact stratification (SURVEY §2.5 W5/W6).
  *
  * A naive `row_number() over (partition by label order by …)` puts each
  * CLASS into one window partition — with a binary label that is a
  * 2-partition global sort, a single-task bottleneck at 100 TB. Here the
  * rank is computed in two phases instead:
  *
  *   1. salt rows into `nBuckets` deterministic buckets and rank within
  *      (label, bucket) — `nBuckets × |classes|` parallel sorts;
  *   2. add per-bucket offsets from a tiny count aggregate (|classes| ×
  *      nBuckets rows, broadcast back).
  *
  * The result equals `row_number() over (partition by label order by
  * bucket, orderKeys…)` — a deterministic total order per class, which is
  * all stratified splitting needs. Fold/split CARDINALITIES are identical
  * to any other order; membership is deterministic under repartitioning
  * because the bucket is a hash of the order keys, not of partition ids.
  */
object Stratify {

  def withClassRank(df: DataFrame, labelCol: String, orderKeys: Seq[String],
      nBuckets: Int = 64, rankCol: String = "__rn"): DataFrame = {
    val keyCols = orderKeys.map(col)
    val bucketed = df.withColumn("__bkt", pmod(hash(keyCols: _*), lit(nBuckets)))
    val wLocal = Window.partitionBy(col(labelCol), col("__bkt")).orderBy(keyCols: _*)
    val wOff = Window.partitionBy(col(labelCol)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col(labelCol), col("__bkt")).count()
      .withColumn("__off", coalesce(sum(col("count")).over(wOff), lit(0L)))
      .drop("count")
    bucketed
      .withColumn("__lrn", row_number().over(wLocal))
      .join(broadcast(offsets), Seq(labelCol, "__bkt"))
      .withColumn(rankCol, col("__lrn") + col("__off"))
      .drop("__bkt", "__lrn", "__off")
  }

  /** W5: deterministic stratified fold id in [0, k). */
  def withFold(df: DataFrame, labelCol: String, orderKeys: Seq[String], k: Int,
      foldCol: String = "fold", nBuckets: Int = 64): DataFrame =
    withClassRank(df, labelCol, orderKeys, nBuckets)
      .withColumn(foldCol, col("__rn") % k).drop("__rn")
}

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

  /** Rows each (label, bucket) window sort should handle in one task.
    * The adaptive default sizes nBuckets = clamp(ceil(n/target),
    * [MinBuckets, MaxBuckets]) — a FIXED bucket count would put N/(64·
    * |classes|) rows into each sort task at 100 TB (a straggler), the
    * same failure family [[SmoteLsh]]'s adaptive bit width avoids. The
    * cap bounds the per-class offsets broadcast (|classes|·nBuckets
    * rows). Costs one count(*) on the input when sizing adaptively. */
  val TargetRowsPerBucket: Long = 1L << 20
  val MinBuckets = 64
  val MaxBuckets = 1 << 20

  def adaptiveBuckets(n: Long, targetRows: Long = TargetRowsPerBucket): Int =
    math.min(MaxBuckets.toLong,
      math.max(MinBuckets.toLong, (math.max(n, 1L) - 1L) / targetRows + 1L)).toInt

  /** @param nBuckets salt-bucket count, or -1 (default) to size it to
    *   the data via [[adaptiveBuckets]]. Adaptive sizing runs one
    *   count(*) that EXECUTES the input's lineage — a scale-aware
    *   caller with an expensive derived frame should cache it or pass
    *   nBuckets explicitly (any value keeps the rank a per-class
    *   permutation; only task sizing changes). */
  def withClassRank(df: DataFrame, labelCol: String, orderKeys: Seq[String],
      nBuckets: Int = -1, rankCol: String = "__rn",
      targetRows: Long = TargetRowsPerBucket): DataFrame = {
    val buckets = if (nBuckets > 0) nBuckets else adaptiveBuckets(df.count(), targetRows)
    val keyCols = orderKeys.map(col)
    val bucketed = df.withColumn("__bkt", pmod(hash(keyCols: _*), lit(buckets)))
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
      foldCol: String = "fold", nBuckets: Int = -1): DataFrame =
    withClassRank(df, labelCol, orderKeys, nBuckets)
      .withColumn(foldCol, col("__rn") % k).drop("__rn")
}

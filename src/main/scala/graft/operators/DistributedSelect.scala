package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact distributed selection (k-th smallest) without a global sort —
  * the two-phase histogram method (the classic massive-data exact
  * quantile: DeWitt et al.'s parallel selection lineage): a global sort
  * ranks every row to answer a handful of order statistics; this ranks
  * NOTHING.
  *
  *   phase 1: one partial-aggregated pass buckets values by `v div w`
  *            (bounded bucket count), the driver prefix-sums the bucket
  *            histogram and locates, for EVERY requested rank at once,
  *            its bucket and residual rank within it;
  *   phase 2: one more pass aggregates exact value counts INSIDE the
  *            candidate buckets only (≤ w distinct values per bucket —
  *            bounded regardless of row count), and the driver reads
  *            each answer off the in-bucket prefix sum.
  *
  * Two jobs total for any number of ranks; both driver artifacts are
  * bounded (histogram ≤ |domain|/w + 1 rows, value counts ≤ w·|ranks|
  * rows) — the PQ-codebook discipline. This is the EXACT scale path for
  * q142's interpolation-free order statistics: approx_percentile trades
  * error for one pass; this pays a second pass for exactness.
  *
  * Values must be non-negative longs (callers put doubles on an integer
  * grid first — the engine's cent/micro discipline).
  */
object DistributedSelect {

  /** @param vals   single long column `v`, non-negative
    * @param ranks  1-based ranks (k-th smallest) to select, each in [1, n]
    * @param width  bucket width (domain/width buckets in phase 1)
    * @return rank -> exact k-th smallest value */
  def kth(vals: DataFrame, ranks: Seq[Long], width: Long): Map[Long, Long] = {
    require(ranks.nonEmpty && width >= 1, "need ranks and a positive bucket width")
    val hist = vals.groupBy((col("v") / width).cast("long").as("b"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = hist.map(_._2).sum
    require(ranks.forall(k => k >= 1 && k <= total),
      s"ranks must lie in [1, $total]")
    // locate each rank's bucket + residual rank via one prefix walk
    var acc = 0L
    val located = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val sortedRanks = ranks.distinct.sorted
    var ri = 0
    hist.foreach { case (b, n) =>
      while (ri < sortedRanks.length && sortedRanks(ri) <= acc + n) {
        located(sortedRanks(ri)) = (b, sortedRanks(ri) - acc)
        ri += 1
      }
      acc += n
    }
    val buckets = located.values.map(_._1).toSeq.distinct
    val inBucket = vals
      .filter((col("v") / width).cast("long").isin(buckets: _*))
      .groupBy((col("v") / width).cast("long").as("b"), col("v"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap
    located.map { case (k, (b, residual)) =>
      var cum = 0L
      var answer = -1L
      val it = inBucket(b).iterator
      while (cum < residual && it.hasNext) {
        val (v, n) = it.next()
        cum += n
        answer = v
      }
      k -> answer
    }.toMap
  }

  /** Weighted selection: smallest value whose CUMULATIVE WEIGHT (in
    * value order) reaches each rank — the weighted-median/-quantile
    * primitive (rank = ⌈q·W⌉ for total weight W). Same two-phase shape
    * as [[kth]] with weight sums in place of counts: one bucketing pass
    * aggregating Σw per bucket, one in-candidate-bucket pass
    * aggregating Σw per exact value. Weights must be positive longs —
    * zero-weight rows would make the answer depend on tie order, and
    * negative weights break cumulative monotonicity (refused, not
    * absorbed). */
  def kthWeighted(vals: DataFrame, ranks: Seq[Long], width: Long): Map[Long, Long] = {
    require(ranks.nonEmpty && width >= 1, "need ranks and a positive bucket width")
    val hist = vals.groupBy((col("v") / width).cast("long").as("b"))
      .agg(sum(col("w")).as("n"), min(col("w")).as("minw"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    require(hist.forall(_._3 > 0), "weights must be strictly positive")
    val total = hist.map(_._2).sum
    require(ranks.forall(k => k >= 1 && k <= total),
      s"weighted ranks must lie in [1, $total]")
    var acc = 0L
    val located = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val sortedRanks = ranks.distinct.sorted
    var ri = 0
    hist.foreach { case (b, n, _) =>
      while (ri < sortedRanks.length && sortedRanks(ri) <= acc + n) {
        located(sortedRanks(ri)) = (b, sortedRanks(ri) - acc)
        ri += 1
      }
      acc += n
    }
    val buckets = located.values.map(_._1).toSeq.distinct
    val inBucket = vals
      .filter((col("v") / width).cast("long").isin(buckets: _*))
      .groupBy((col("v") / width).cast("long").as("b"), col("v"))
      .agg(sum(col("w")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap
    located.map { case (k, (b, residual)) =>
      var cum = 0L
      var answer = -1L
      val it = inBucket(b).iterator
      while (cum < residual && it.hasNext) {
        val (v, n) = it.next()
        cum += n
        answer = v
      }
      k -> answer
    }.toMap
  }
}

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
  def kth(vals: DataFrame, ranks: Seq[Long], width: Long): Map[Long, Long] =
    kthFromTotal(vals, _ => ranks, width)._2

  /** [[kth]] with the ranks derived FROM the total row count: callers
    * whose rank is a function of n (a ⌈2n/3⌉ gate threshold, a median)
    * otherwise pay a whole extra corpus pass just to learn n before
    * calling kth — but phase 1's bucket histogram already carries it
    * (n = Σ bucket counts). One pass saved at any scale; the histogram,
    * locate, and phase-2 machinery are exactly [[kth]]'s.
    *
    * @param ranksOf total row count -> 1-based ranks, each in [1, total]
    * @return (total row count, rank -> exact k-th smallest value) */
  def kthFromTotal(vals: DataFrame, ranksOf: Long => Seq[Long],
      width: Long): (Long, Map[Long, Long]) = {
    require(width >= 1, "need a positive bucket width")
    val hist = vals.groupBy((col("v") / width).cast("long").as("b"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = hist.map(_._2).sum
    val ranks = ranksOf(total)
    require(ranks.nonEmpty, "need ranks")
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
    (total, located.map { case (k, (b, residual)) =>
      var cum = 0L
      var answer = -1L
      val it = inBucket(b).iterator
      while (cum < residual && it.hasNext) {
        val (v, n) = it.next()
        cum += n
        answer = v
      }
      k -> answer
    }.toMap)
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

  /** Grouped [[kth]]: exact k-th smallest PER GROUP, same two jobs for
    * every (group, rank) at once — the q142 robust-stats scale path
    * (per-source medians without a per-group sort). The phase-1
    * histogram is (groups × occupied buckets) rows and phase 2 is
    * bounded by width · |located buckets| per group — both
    * driver-bounded under the same contract as [[kth]]. Input is
    * (`g` string, `v` non-negative long); `ranks` maps each group to
    * its 1-based ranks (callers derive them from per-group counts —
    * median, quartiles, …). */
  def kthByGroup(vals: DataFrame, ranks: Map[String, Seq[Long]],
      width: Long): Map[(String, Long), Long] = {
    require(ranks.nonEmpty && width >= 1, "need ranks and a positive bucket width")
    val hist: Map[String, Seq[(Long, Long)]] = vals
      .groupBy(col("g"), (col("v") / width).cast("long").as("b"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap
    val located = scala.collection.mutable.Map.empty[(String, Long), (Long, Long)]
    ranks.foreach { case (g, ks) =>
      val h = hist.getOrElse(g, Seq.empty[(Long, Long)])
      val total = h.map(_._2).sum
      require(ks.forall(k => k >= 1 && k <= total),
        s"ranks for group '$g' must lie in [1, $total]")
      var acc = 0L
      val sorted = ks.distinct.sorted
      var ri = 0
      h.foreach { case (b, n) =>
        while (ri < sorted.length && sorted(ri) <= acc + n) {
          located((g, sorted(ri))) = (b, sorted(ri) - acc)
          ri += 1
        }
        acc += n
      }
    }
    val spark = vals.sparkSession
    import spark.implicits._
    val cand = located.toSeq.map { case ((g, _), (b, _)) => (g, b) }.distinct
    val candDf = broadcast(cand.toDF("g", "b"))
    val inBucket = vals
      .withColumn("b", (col("v") / width).cast("long"))
      .join(candDf, Seq("g", "b"), "left_semi")
      .groupBy(col("g"), col("b"), col("v"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(t => (t._1, t._2))
      .view.mapValues(_.map(t => (t._3, t._4)).sortBy(_._1)).toMap
    located.map { case ((g, k), (b, residual)) =>
      var cum = 0L
      var answer = -1L
      val it = inBucket((g, b)).iterator
      while (cum < residual && it.hasNext) {
        val (v, n) = it.next()
        cum += n
        answer = v
      }
      (g, k) -> answer
    }.toMap
  }

  /** Exact global row_number WITHOUT a global sort — the two-level
    * prefix sum: one bucketing pass collects the (bounded) occupied-
    * bucket histogram, the driver prefix-sums it into per-bucket rank
    * offsets, and each row's rank is offset(bucket) + its rank INSIDE
    * the bucket (a window partitioned by bucket — parallel partitions
    * whose size the caller bounds via `width`). This is what replaces
    * `Window.orderBy(...)` (one single-task sort partition) for
    * q156/q179/q182-style global ranking at corpus scale; an ntile /
    * decile is then pure arithmetic on the rank ([[ntileFromRank]]).
    * `keyCol` must hold UNIQUE non-negative longs — callers compose
    * (metric, tiebreak-id) into one key, which is also what makes the
    * rank deterministic. */
  def globalRowNumber(df: DataFrame, keyCol: String, rankCol: String,
      width: Long): DataFrame = {
    require(width >= 1, "need a positive bucket width")
    val spark = df.sparkSession
    import spark.implicits._
    val withB = df.withColumn("__gr_b", (col(keyCol) / width).cast("long"))
    val hist = withB.groupBy(col("__gr_b")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = hist.map { case (b, n) => val o = (b, acc); acc += n; o }.toSeq
    val offDf = broadcast(offsets.toDF("__gr_b", "__gr_off"))
    withB.join(offDf, Seq("__gr_b"))
      .withColumn(rankCol, col("__gr_off") +
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("__gr_b")).orderBy(col(keyCol))).cast("long"))
      .drop("__gr_b", "__gr_off")
  }

  /** Exact global cumulative WEIGHT sum without a global sort — the
    * weighted sibling of [[globalRowNumber]] (same two-level prefix sum,
    * Σw in place of counts): one bucketing pass collects the bounded
    * occupied-bucket weight histogram, the driver prefix-sums it into
    * per-bucket offsets, and each row's cumulative weight is
    * offset(bucket) + the in-bucket running Σw (a window partitioned by
    * bucket). This is the running-total primitive behind systematic /
    * proportional-to-size sampling (q202), weighted packing, and Lorenz
    * prefix shares at corpus scale — the places `sum(w) OVER (ORDER BY
    * key)` would otherwise force a single-task sort. `keyCol` must hold
    * UNIQUE non-negative longs (ties would make the prefix order — and
    * therefore every downstream threshold crossing — nondeterministic);
    * weights must be non-negative longs. Output: input columns plus
    * `cumCol` = Σ w over all rows with key ≤ this row's key. */
  def globalPrefixSum(df: DataFrame, keyCol: String, wCol: String,
      cumCol: String, width: Long): DataFrame = {
    require(width >= 1, "need a positive bucket width")
    val spark = df.sparkSession
    import spark.implicits._
    val withB = df.withColumn("__ps_b", (col(keyCol) / width).cast("long"))
    val hist = withB.groupBy(col("__ps_b")).agg(sum(col(wCol)).as("sw"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = hist.map { case (b, sw) => val o = (b, acc); acc += sw; o }.toSeq
    val offDf = broadcast(offsets.toDF("__ps_b", "__ps_off"))
    withB.join(offDf, Seq("__ps_b"))
      .withColumn(cumCol, col("__ps_off") +
        sum(col(wCol)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("__ps_b")).orderBy(col(keyCol))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .drop("__ps_b", "__ps_off")
  }

  /** [[globalPrefixSum]] for a DOUBLE key in [0, 1], DESCENDING order,
    * over MULTIPLE weight columns at once — the ROC/KS/PR sweep shape:
    * every threshold curve needs cumulative TP and FP from the top
    * score down, which `sum(w) OVER (ORDER BY score DESC)` computes
    * through one single-task sort. Here bucket = ⌊(1−key)·nBuckets⌋ is
    * monotone NONINCREASING in the key, so ascending bucket order IS
    * global descending key order across buckets; the driver
    * prefix-sums one bounded (≤ nBuckets+1 rows) multi-weight
    * histogram, and each bucket sorts only its own slice. Keys must be
    * unique (the sweep frames are per-DISTINCT-threshold aggregates);
    * weights non-negative longs. Output: input columns plus
    * `cum_<w>` = Σ w over rows with key ≥ this row's key. */
  def globalPrefixSumDescDouble(df: DataFrame, keyCol: String,
      wCols: Seq[String], nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && wCols.nonEmpty, "need buckets and weight columns")
    val spark = df.sparkSession
    import spark.implicits._
    val withB = df.withColumn("__pd_b",
      floor((lit(1.0) - col(keyCol)) * nBuckets).cast("long"))
    val aggs = wCols.map(w => sum(col(w)).as(s"__sw_$w"))
    val hist = withB.groupBy(col("__pd_b")).agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => (r.getLong(0), wCols.indices.map(i => r.getLong(i + 1))))
      .sortBy(_._1)
    var acc = Seq.fill(wCols.size)(0L)
    val offsets = hist.map { case (b, sums) =>
      val o = (b, acc)
      acc = acc.zip(sums).map { case (a, s) => a + s }
      o
    }.toSeq
    val offDf = broadcast(offsets.toDF("__pd_b", "__pd_off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pd_b")).orderBy(col(keyCol).desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    wCols.zipWithIndex.foldLeft(withB.join(offDf, Seq("__pd_b"))) {
      case (d, (wc, i)) => d.withColumn(s"cum_$wc",
        element_at(col("__pd_off"), i + 1) + sum(col(wc)).over(w))
    }.drop("__pd_b", "__pd_off")
  }

  /** Exact global EXCLUSIVE running max without a global sort — the
    * prefix-max sibling of [[globalPrefixSum]] (same two-level shape,
    * max in place of Σ): one bucketing pass collects the bounded
    * occupied-bucket max histogram, the driver EXCLUSIVE-prefix-maxes it
    * into per-bucket "max of everything in earlier buckets" offsets, and
    * each row's answer is greatest(offset, in-bucket running max over
    * STRICTLY PRECEDING rows). This is the skyline/staircase primitive —
    * `max(v) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING TO -1)` without
    * the single-task sort. `keyCol` must hold UNIQUE non-negative longs
    * (callers pack composite orders into one key — the q199 discipline);
    * `vCol` long. Output: input columns plus `outCol` = max v over all
    * rows with key < this row's key, NULL for the globally first row
    * (greatest() ignores nulls, so the two legs compose exactly). */
  def globalPrefixMaxExclusive(df: DataFrame, keyCol: String, vCol: String,
      outCol: String, width: Long): DataFrame = {
    require(width >= 1, "need a positive bucket width")
    val spark = df.sparkSession
    import spark.implicits._
    val withB = df.withColumn("__pm_b", (col(keyCol) / width).cast("long"))
    val hist = withB.groupBy(col("__pm_b")).agg(max(col(vCol)).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var run: Option[Long] = None
    val offsets = hist.map { case (b, m) =>
      val o = (b, run)
      run = Some(run.fold(m)(math.max(_, m)))
      o
    }.toSeq
    val offDf = broadcast(offsets.toDF("__pm_b", "__pm_off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pm_b")).orderBy(col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    withB.join(offDf, Seq("__pm_b"))
      .withColumn(outCol, greatest(col("__pm_off"), max(col(vCol)).over(w)))
      .drop("__pm_b", "__pm_off")
  }

  /** ntile(buckets) as pure arithmetic over a 1-based global rank of n
    * rows — SQL ntile semantics: the first (n mod buckets) tiles take
    * ⌈n/buckets⌉ rows, the rest ⌊n/buckets⌋. With ranks from
    * [[globalRowNumber]] this reproduces `ntile(b) OVER (ORDER BY …)`
    * exactly, with no global-sort window anywhere. */
  def ntileFromRank(rank: org.apache.spark.sql.Column, n: Long, buckets: Int):
      org.apache.spark.sql.Column = {
    require(n >= 1 && buckets >= 1, "need rows and a positive bucket count")
    val base = n / buckets
    val extra = n % buckets
    val cums = (1 to (buckets - 1)).map(q => q * base + math.min(q.toLong, extra))
    cums.zipWithIndex.foldRight(lit(buckets): org.apache.spark.sql.Column) {
      case ((cum, i), alt) => when(rank <= cum, lit(i + 1)).otherwise(alt)
    }
  }
}

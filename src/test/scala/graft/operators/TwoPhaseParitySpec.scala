package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The sequential window/percentile specifications, proven EXACT against
  * the SERVED two-phase implementations: since round 12 the original
  * query names (q46/q142/q156/q179/q182) serve their two-phase twins
  * (round-11 directive #3 — no single-task global-sort window ships in
  * any served plan), and the window forms survive only as spec-side
  * references (`*WindowRef`). Each must return row-for-row identical
  * results to the served query on the oracle data — plus kernel-level
  * parity for the two-phase primitives against the global-sort
  * formulations they replace. */
class TwoPhaseParitySpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def parity(windowRef: (org.apache.spark.sql.SparkSession, String) => DataFrame,
      served: String): Unit = {
    val a = rows(windowRef(spark, sfDir))
    val b = rows(SparkEntry.queries(served)(spark, sfDir))
    assert(a.nonEmpty, s"window reference for $served returned nothing — vacuous parity")
    assert(a === b, s"served $served diverged from its window-form spec: " +
      s"only-ref ${(a -- b).take(2)}, only-served ${(b -- a).take(2)}")
    spark.sharedState.cacheManager.clearCache()
  }

  test("served q142 (two-phase median+MAD) equals the percentile-sort spec exactly") {
    parity(graft.llm.LlmQueries.q142RobustStatsWindowRef, "q142_robust_stats")
  }

  test("served q156 (two-phase RFM quartiles) equals the ntile-window spec exactly (ties included)") {
    parity(graft.queries.ExtQueries.q156RfmWindowRef, "q156_rfm")
  }

  test("served q182 (two-phase equi-depth histogram) equals the ntile-window spec exactly") {
    parity(graft.queries.ExtQueries.q182EquidepthHistWindowRef, "q182_equidepth_hist")
  }

  test("served q179 (two-phase Lorenz/Gini) equals the rank-window spec exactly") {
    parity(graft.queries.ExtQueries.q179GiniLorenzWindowRef, "q179_gini_lorenz")
  }

  test("served q46 (two-phase ROC sweep) equals the cumulative-window spec exactly") {
    parity(graft.ml.MlQueries.q46RocAucWindowRef, "q46_roc_auc")
  }

  test("served q175 (two-phase WOE/IV deciles) equals the ntile-window spec exactly") {
    parity(graft.queries.ExtQueries.q175WoeIvWindowRef, "q175_woe_iv")
  }

  test("globalPrefixSumDescDouble equals the descending global-sort cumsum on adversarial keys") {
    // unique double keys in [0, 1) with a dense cluster near 1.0 (the
    // ROC shape: most thresholds crowd the top) and two weight columns
    val base = (0 until 400).map { i =>
      val k = if (i % 3 == 0) 0.99 - i * 1e-6 else (i * 7919 % 1000) / 1000.0 + i * 1e-9
      (k, (i % 5).toLong, ((i * 13) % 7).toLong)
    }.filter(t => t._1 >= 0.0 && t._1 < 1.0)
      .groupBy(_._1).map(_._2.head).toSeq // unique keys
    val df = base.toDF("score", "w1", "w2")
    val got = DistributedSelect
      .globalPrefixSumDescDouble(df, "score", Seq("w1", "w2"), nBuckets = 64)
      .select("score", "cum_w1", "cum_w2")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = df
      .withColumn("cum_w1", sum(col("w1")).over(w))
      .withColumn("cum_w2", sum(col("w2")).over(w))
      .select("score", "cum_w1", "cum_w2")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.length === want.length)
    assert(got.sameElements(want),
      "two-level descending prefix sum diverged from the global-sort window")
  }

  test("globalPrefixMaxExclusive equals the global-sort exclusive running max (nulls included)") {
    // adversarial: duplicate values across buckets, a strictly-decreasing
    // run (every row on the 'skyline'), and a bucket whose max sits at
    // its first row (offset must come from EARLIER buckets only)
    val base = (0L until 300L).map { i =>
      val k = (i * 7919L) % 1000L * 64L + i // unique, bucket-scattered
      val v = if (i % 7 == 0) 500L - i else (i * 31L) % 97L
      (k, v)
    }
    val df = base.toDF("k", "v")
    val got = DistributedSelect
      .globalPrefixMaxExclusive(df, "k", "v", "run_max", width = 128L)
      .select("k", "run_max")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val w = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("run_max", max(col("v")).over(w))
      .select("k", "run_max")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got === want,
      "two-level exclusive prefix max diverged from the global-sort window")
    assert(want.values.exists(_.isEmpty), "first row must be NULL — vacuous otherwise")
  }

  test("globalRowNumber equals the global-sort row_number on adversarial keys") {
    // duplicates ACROSS buckets plus a dense tie-heavy region — the key
    // column is unique by construction in callers, so build unique keys
    // from a skewed base
    val base = (0L until 500L).map(i => (i * 7919L) % 1000L * 100L + i)
    val df = base.toDF("k")
    val got = DistributedSelect.globalRowNumber(df, "k", "rnk", width = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = df.withColumn("rnk",
        row_number().over(Window.orderBy(col("k"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
  }

  test("kthByGroup equals per-group sorted selection for every rank") {
    val data = for {
      g <- Seq("a", "b", "c")
      i <- 0 until (if (g == "b") 37 else 64) // odd + even group sizes
    } yield (g, ((i * 31L + g.hashCode.abs) % 97L))
    val df = data.toDF("g", "v")
    val byG = data.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val ranks = byG.map { case (g, vs) => g -> (1L to vs.size.toLong) }
      .map { case (g, r) => g -> r.toSeq }
    val got = DistributedSelect.kthByGroup(df, ranks, width = 8L)
    byG.foreach { case (g, vs) =>
      vs.zipWithIndex.foreach { case (v, i) =>
        assert(got((g, i + 1L)) === v, s"group $g rank ${i + 1}")
      }
    }
  }

  test("ntileFromRank reproduces SQL ntile for ragged row counts") {
    for (n <- Seq(1L, 7L, 8L, 9L, 103L)) {
      val df = (1L to n).toDF("r")
      val got = df.select(col("r"),
          DistributedSelect.ntileFromRank(col("r"), n, 4).as("t"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = df.withColumn("t", ntile(4).over(Window.orderBy(col("r"))))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === want, s"n=$n")
    }
  }
}

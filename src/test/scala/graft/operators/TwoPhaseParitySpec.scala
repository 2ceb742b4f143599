package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The documented 100 TB degrade paths, proven EXACT: each two-phase
  * twin (q198/q199/q200) must return row-for-row identical results to
  * its window/percentile-based original (q142/q156/q179) on the oracle
  * data — plus kernel-level parity for the two new primitives against
  * the global-sort formulations they replace. */
class TwoPhaseParitySpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def parity(orig: String, twin: String): Unit = {
    val a = rows(SparkEntry.queries(orig)(spark, sfDir))
    val b = rows(SparkEntry.queries(twin)(spark, sfDir))
    assert(a.nonEmpty, s"$orig returned nothing — vacuous parity")
    assert(a === b, s"$twin diverged from $orig: " +
      s"only-orig ${(a -- b).take(2)}, only-twin ${(b -- a).take(2)}")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q198 two-phase median+MAD equals q142 exactly") {
    parity("q142_robust_stats", "q198_robust_twophase")
  }

  test("q199 two-phase RFM quartiles equal q156 exactly (ties included)") {
    parity("q156_rfm", "q199_rfm_twophase")
  }

  test("q205 two-phase equi-depth histogram equals q182 exactly") {
    parity("q182_equidepth_hist", "q205_equidepth_twophase")
  }

  test("q200 two-phase Lorenz/Gini equals q179 exactly") {
    parity("q179_gini_lorenz", "q200_gini_twophase")
  }

  test("q219 two-phase ROC sweep equals q46 exactly") {
    parity("q46_roc_auc", "q219_roc_twophase")
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

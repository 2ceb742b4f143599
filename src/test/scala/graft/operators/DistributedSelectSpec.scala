package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two-phase histogram selection against the sorted-reference spec:
  * exact k-th smallest for every rank, for any bucket width (the width
  * is a performance knob, never a semantics knob), duplicates included.
  */
class DistributedSelectSpec extends SparkSpec {

  private def frame(vs: Seq[Long]) = {
    import spark.implicits._
    vs.toDF("v")
  }

  test("known values with duplicates: every rank matches the sorted reference") {
    val vs = Seq(5L, 1L, 9L, 5L, 5L, 2L, 9L, 0L, 7L, 3L)
    val sorted = vs.sorted
    val ranks = (1L to vs.length.toLong)
    for (w <- Seq(1L, 3L, 100L)) {
      val got = DistributedSelect.kth(frame(vs), ranks, width = w)
      ranks.foreach { k =>
        assert(got(k) === sorted((k - 1).toInt), s"rank $k at width $w")
      }
    }
  }

  test("width never changes answers on a pseudo-random stream") {
    // deterministic LCG stream — no Math.random in specs
    val vs = Iterator.iterate(12345L)(x => (x * 1103515245L + 12345L) % 100000L)
      .take(500).map(math.abs).toSeq
    val sorted = vs.sorted
    val ranks = Seq(1L, 13L, 250L, 499L, 500L)
    for (w <- Seq(7L, 1000L, 100000L)) {
      val got = DistributedSelect.kth(frame(vs), ranks, width = w)
      ranks.foreach(k => assert(got(k) === sorted((k - 1).toInt), s"rank $k width $w"))
    }
  }

  test("out-of-range ranks and bad widths are refused") {
    intercept[IllegalArgumentException] {
      DistributedSelect.kth(frame(Seq(1L, 2L)), Seq(3L), width = 10L)
    }
    intercept[IllegalArgumentException] {
      DistributedSelect.kth(frame(Seq(1L)), Seq(1L), width = 0L)
    }
  }

  test("q187: two-phase answers equal the full-sort reference on real data") {
    val out = graft.queries.ExtQueries.queries("q187_distributed_select")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val cents = graft.Tables.lineitem(spark, sfDir)
      .select(floor(round(col("l_extendedprice"), 2) * 100.0 + 0.5).cast("long").as("v"))
      .orderBy(col("v")).collect().map(_.getLong(0))
    for (p <- Seq(50L, 90L, 99L)) {
      val k = math.ceil(p / 100.0 * cents.length).toLong
      assert(out(p) === ((k, cents((k - 1).toInt))), s"p$p")
    }
    // in-closure cache release is enforced by CacheContractSpec's sweep —
    // a global isEmpty assert here would trip over OTHER suites' live
    // caches when the shared session runs the full build
  }

  test("weighted selection: cumulative-weight reference equality; refusals") {
    import spark.implicits._
    val rows = Seq((5L, 2L), (1L, 3L), (9L, 1L), (5L, 4L), (2L, 2L))
    val df = rows.toDF("v", "w")
    // expanded multiset reference: v repeated w times
    val expanded = rows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.sorted
    for (w <- Seq(1L, 4L, 100L)) {
      val got = DistributedSelect.kthWeighted(df, (1L to expanded.length.toLong), width = w)
      (1L to expanded.length.toLong).foreach { k =>
        assert(got(k) === expanded((k - 1).toInt), s"weighted rank $k width $w")
      }
    }
    intercept[IllegalArgumentException] {
      DistributedSelect.kthWeighted(Seq((1L, 0L)).toDF("v", "w"), Seq(1L), 10L)
    }
  }

  test("q191: weighted two-phase answers equal the full-sort reference") {
    val out = graft.queries.ExtQueries.queries("q191_weighted_select")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val vw = graft.Tables.lineitem(spark, sfDir)
      .select(floor(round(col("l_extendedprice"), 2) * 100.0 + 0.5).cast("long").as("v"),
        col("l_quantity").cast("long").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = vw.map(_._2).sum
    for (p <- Seq(50L, 90L)) {
      val k = math.ceil(p / 100.0 * total).toLong
      var cum = 0L
      var answer = -1L
      val it = vw.iterator
      while (cum < k && it.hasNext) { val (v, w) = it.next(); cum += w; answer = v }
      assert(out(p) === ((k, answer)), s"p$p")
    }
    // in-closure release covered by CacheContractSpec (see q187's note)
  }

  test("q188: PPS hits sum to k exactly and heavy units are guaranteed in") {
    val rows = graft.queries.ExtQueries.queries("q188_pps_sample")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._4).sum === 20L, "systematic PPS must allocate exactly k hits")
    val spend = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(floor(round(sum(col("o_totalprice")), 2) * 100.0 + 0.5).cast("long").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = spend.map(_._2).sum
    val heavy = spend.filter(_._2 >= total / 20L).map(_._1).toSet
    val sampled = rows.map(_._1).toSet
    assert(heavy.subsetOf(sampled), "a unit with weight >= total/k missed selection")
    // crossing-count recomputation
    var cum = 0L
    val exp = spend.flatMap { case (ck, w) =>
      val before = 20L * cum / total
      cum += w
      val after = 20L * cum / total
      if (after > before) Some((ck, w, cum, after - before)) else None
    }
    assert(rows.toSeq === exp.toSeq, "crossing counts diverged")
  }

  test("globalPrefixSum equals the ordered-window cumulative sum at any width") {
    import spark.implicits._
    // deterministic LCG weights over sparse, shuffled keys
    val rows = Iterator.iterate(987654321L)(x => (x * 6364136223846793005L + 1442695040888963407L))
      .take(400).zipWithIndex
      .map { case (x, i) => (i * 37L + (math.abs(x) % 11L), math.abs(x) % 100L) }
      .toSeq
    val df = rows.toDF("k", "w")
    val expect = rows.sortBy(_._1).scanLeft((-1L, 0L)) {
      case ((_, cum), (k, w)) => (k, cum + w)
    }.drop(1).toMap
    for (width <- Seq(1L, 64L, 5000L, 1000000L)) {
      val got = DistributedSelect.globalPrefixSum(df, "k", "w", "cum", width)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(got === expect, s"prefix sums diverged at width $width")
    }
  }

  test("q202: multiplicities sum to k, heavy docs guaranteed, fold parity") {
    val rows = graft.queries.ExtQueries.queries("q202_weighted_sample")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sum === 500L, "systematic draw must allocate exactly k")
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), (col("n_chars") + lit(1L)).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = docs.map(_._2).sum
    val heavy = docs.filter(_._2 >= total / 500L).map(_._1).toSet
    assert(heavy.subsetOf(rows.map(_._1).toSet),
      "a doc with weight >= W/k missed selection")
    // driver-side fold of the documented crossing-count contract
    var cum = 0L
    val exp = docs.flatMap { case (id, w) =>
      val before = cum * 500L / total
      cum += w
      val after = cum * 500L / total
      if (after > before) Some((id, w, after - before)) else None
    }
    assert(rows.toSeq === exp.toSeq, "crossing counts diverged from the fold")
  }

  test("q203: hierarchical draw = Hamilton over sqrt-weights, then Madow per source") {
    val rows = graft.queries.ExtQueries.queries("q203_temp_mixture")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._4).sum === 1000L, "mixture must allocate exactly k draws")
    // driver recomputation of both stages
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), (col("n_chars") + lit(1L)).as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySrc = docs.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val wt = bySrc.view.mapValues(ds =>
      math.floor(math.sqrt(ds.map(_._3).sum.toDouble) * 1e6 + 0.5).toLong).toMap
    val t = wt.values.sum
    val base = wt.view.mapValues(w => 1000L * w / t).toMap
    val leftover = 1000L - base.values.sum
    val order = wt.toSeq.map { case (s0, w) => (s0, 1000L * w - base(s0) * t) }
      .sortBy { case (s0, rem) => (-rem, s0) }.map(_._1)
    val ks = base ++ order.take(leftover.toInt).map(s0 => s0 -> (base(s0) + 1L))
    assert(ks.values.sum === 1000L, "Hamilton must exhaust the draw budget")
    val exp = bySrc.toSeq.sortBy(_._1).flatMap { case (s0, ds) =>
      val ws = ds.map(_._3).sum
      var cum = 0L
      ds.flatMap { case (_, id, w) =>
        val before = cum * ks(s0) / ws
        cum += w
        val after = cum * ks(s0) / ws
        if (after > before) Some((s0, id, w, after - before)) else None
      }
    }
    assert(rows.toSeq === exp, "hierarchical draw diverged from the recomputation")
    // per-source closure: each source receives exactly its allocation
    val got = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    ks.filter(_._2 > 0).foreach { case (s0, k) =>
      assert(got.getOrElse(s0, 0L) === k, s"source $s0 draw count != allocation")
    }
  }
}

package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Trigger-prefix parity for [[StreamOps.anovaState]] (q240's streaming
  * twin): every trigger's snapshot must equal q240's exact arithmetic —
  * per-group s²/n floors before the integer total, identical double
  * chains — over the stream PREFIX, and the final state must bridge to
  * the served batch q240 on the same events-derived values (one rule,
  * two tiers — the q211/q214/reservoir discipline). */
class StreamAnovaSpec extends SparkSpec {

  private def refSnapshot(prefix: Seq[(String, Long)]): (Long, Long, Long, Long, Long, Long) = {
    val byG = prefix.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = byG.size.toLong
    val n = prefix.length.toLong
    val sx = prefix.map(_._2).sum
    val sxx = prefix.map(v => v._2 * v._2).sum
    val tsum = byG.values.map { vs =>
      val s = vs.sum
      math.floor(s.toDouble * s.toDouble / vs.length.toDouble + 0.5).toLong
    }.sum
    val ssb = tsum.toDouble - sx.toDouble * sx.toDouble / n.toDouble
    val sst = sxx.toDouble - sx.toDouble * sx.toDouble / n.toDouble
    if (k < 2 || n <= k || sst - ssb <= 0.0) (k, n, -1L, -1L, -1L, -1L)
    else {
      val f = (ssb / (k - 1).toDouble) / ((sst - ssb) / (n - k).toDouble)
      (k, n, math.floor(ssb + 0.5).toLong, math.floor((sst - ssb) + 0.5).toLong,
        math.floor(f * 1e6 + 0.5).toLong, math.floor(ssb / sst * 1e6 + 0.5).toLong)
    }
  }

  test("every trigger snapshot equals the batch ANOVA over the prefix; final bridges to q240") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"),
        floor(round(col("value"), 2) * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // deterministic shuffle + three uneven chops, the middle re-ordered
    // in-batch (the fold is order-robust: plain-sum moments)
    val shuffled = rows.zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000003L }.map(_._1)
    val cut1 = shuffled.length / 4
    val cut2 = (shuffled.length * 2) / 3
    val batches = Seq(shuffled.slice(0, cut1), shuffled.slice(cut1, cut2),
      shuffled.slice(cut2, shuffled.length))

    val input = MemoryStream[StreamOps.GroupValue]
    val q = StreamOps.anovaState(input.toDS())
      .writeStream.format("memory").queryName("anova_state")
      .outputMode("append").start()
    try {
      var prefix = Vector.empty[(String, Long)]
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b.map { case (g, c) => StreamOps.GroupValue("s", g, c) }: _*)
        q.processAllAvailable()
        prefix ++= b
        val snap = spark.table("anova_state").as[StreamOps.AnovaSnapshot].collect().last
        val (k, n, ssb, ssw, f, e2) = refSnapshot(prefix)
        assert((snap.k, snap.n, snap.ssbCents2, snap.sswCents2, snap.fMicro, snap.eta2Micro)
          === ((k, n, ssb, ssw, f, e2)), s"trigger $i diverged from the prefix ANOVA")
        assert(snap.fMicro > 0L, s"trigger $i: F not computable — chop too small, vacuous")
      }
      // the bridge: the final snapshot == the served batch q240
      val batchRow = graft.queries.ExtQueries.queries("q240_anova_f")(spark, sfDir).head()
      val finalSnap = spark.table("anova_state").as[StreamOps.AnovaSnapshot].collect().last
      assert(finalSnap.k === batchRow.getLong(0) && finalSnap.n === batchRow.getLong(1))
      assert(finalSnap.ssbCents2 === batchRow.getLong(2))
      assert(finalSnap.sswCents2 === batchRow.getLong(3))
      assert(finalSnap.fMicro === batchRow.getLong(4))
      assert(finalSnap.eta2Micro === batchRow.getLong(5),
        "streaming ANOVA state diverged from the batch q240 on the same table")
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("degenerate prefixes refuse visibly (k < 2) instead of crashing the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.GroupValue]
    val q = StreamOps.anovaState(input.toDS())
      .writeStream.format("memory").queryName("anova_deg")
      .outputMode("append").start()
    try {
      input.addData(StreamOps.GroupValue("s", "only", 100L),
        StreamOps.GroupValue("s", "only", 200L))
      q.processAllAvailable()
      val snap = spark.table("anova_deg").as[StreamOps.AnovaSnapshot].collect().last
      assert(snap.k === 1L && snap.fMicro === -1L,
        "single-group prefix must pin the statistics at -1, not guess")
    } finally q.stop()
  }
}

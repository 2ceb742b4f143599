package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Trigger-prefix parity for [[StreamOps.ksDriftState]] (q253's
  * streaming twin): every trigger re-freezes the 7-day reference from
  * the grid and recomputes the merged-grid KS statistic, so each
  * snapshot must equal the batch KS formula over the stream PREFIX,
  * and the final state must bridge to the served batch q253's last
  * trajectory row on the same table (the StreamCusumSpec discipline). */
class StreamKsSpec extends SparkSpec {

  private val B = 7 // KsBaselineDays

  private def refSnapshot(prefix: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Long, Boolean) = {
    val days = prefix.map(_._1).distinct.sorted
    if (days.size <= B) (days.size.toLong, 0L, 0L, 0L, 0L, false)
    else {
      val cut = days(B - 1)
      val ref = prefix.filter(_._1 <= cut).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val live = prefix.filter(_._1 > cut).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val nRef = ref.values.sum; val nLive = live.values.sum
      var cr = 0L; var cl = 0L; var dNum = 0L
      (ref.keySet ++ live.keySet).toSeq.sorted.foreach { v =>
        cr += ref.getOrElse(v, 0L); cl += live.getOrElse(v, 0L)
        dNum = math.max(dNum, math.abs(cr * nLive - cl * nRef))
      }
      val dMicro = math.floor(
        dNum.toDouble / (nRef.toDouble * nLive.toDouble) * 1e6 + 0.5).toLong
      (days.size.toLong, nRef, nLive, dNum, dMicro, true)
    }
  }

  private def asTuple(s: StreamOps.KsDriftSnapshot) =
    (s.nDays, s.nRef, s.nLive, s.dNum, s.dMicro, s.defined)

  test("every trigger snapshot equals the batch KS over the prefix; final bridges to q253") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(expr("cast(cast(ts as long) div 86400 as bigint)").as("d"),
        floor(round(col("value"), 2) * 100.0 + 0.5).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val shuffled = rows.zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000003L }.map(_._1)
    val cut1 = shuffled.length / 4
    val cut2 = (shuffled.length * 2) / 3
    val batches = Seq(shuffled.slice(0, cut1), shuffled.slice(cut1, cut2),
      shuffled.slice(cut2, shuffled.length))

    val input = MemoryStream[StreamOps.DayCentArrival]
    val q = StreamOps.ksDriftState(input.toDS())
      .writeStream.format("memory").queryName("ks_state")
      .outputMode("append").start()
    try {
      var prefix = Vector.empty[(Long, Long)]
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b.map { case (d, v) => StreamOps.DayCentArrival("s", d, v) }: _*)
        q.processAllAvailable()
        prefix ++= b
        val snap = spark.table("ks_state").as[StreamOps.KsDriftSnapshot].collect().last
        assert(asTuple(snap) === refSnapshot(prefix),
          s"trigger $i diverged from the prefix KS")
        // shuffled chops spread every day across batches, so even
        // trigger 0 spans the calendar — the reference freezes
        assert(snap.defined, s"trigger $i: reference not freezable — chop too small")
      }
      // the bridge: the final snapshot == the served batch q253's last
      // trajectory row (live side cumulates, so the tail row IS the
      // whole-stream statistic)
      val batchRows = graft.queries.ExtQueries.queries("q253_ks_drift")(spark, sfDir)
        .collect()
      val last = batchRows.last
      val fin = spark.table("ks_state").as[StreamOps.KsDriftSnapshot].collect().last
      assert(fin.nRef === last.getLong(last.fieldIndex("n_ref")))
      assert(fin.nLive === last.getLong(last.fieldIndex("n_live")))
      assert(fin.dNum === last.getLong(last.fieldIndex("d_num")),
        "streaming KS numerator diverged from the batch q253 on the same table")
      assert(fin.dMicro === last.getLong(last.fieldIndex("d_micro")))
      // the statistic must be measuring something: reference and live
      // populations both real, D strictly positive
      assert(fin.nRef > 0L && fin.nLive > fin.nRef, "degenerate split — vacuous")
      assert(fin.dNum > 0L, "identical distributions at this SF — vacuous gate")
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("a late arrival into a BASELINE day re-freezes the reference (grid semantics, " +
      "not arrival-order semantics)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 8 days, one event each; day 3 gets a second value LATE. The
    // baseline is days 1..7 regardless of arrival order, so the late
    // cell must land inside the frozen reference and change D.
    val first = (1L to 8L).map(d => StreamOps.DayCentArrival("s", d, d * 100L))
    val input = MemoryStream[StreamOps.DayCentArrival]
    val q = StreamOps.ksDriftState(input.toDS())
      .writeStream.format("memory").queryName("ks_late")
      .outputMode("append").start()
    try {
      input.addData(first: _*)
      q.processAllAvailable()
      val s1 = spark.table("ks_late").as[StreamOps.KsDriftSnapshot].collect().last
      assert(s1.defined && s1.nRef === 7L && s1.nLive === 1L)
      // live value 800 sits above every reference value: D = 1 exactly,
      // numerator = nRef*nLive = 7
      assert(s1.dNum === 7L && s1.dMicro === 1000000L)
      input.addData(StreamOps.DayCentArrival("s", 3L, 800L))
      q.processAllAvailable()
      val s2 = spark.table("ks_late").as[StreamOps.KsDriftSnapshot].collect().last
      assert(s2.nRef === 8L && s2.nLive === 1L,
        "late baseline-day arrival must join the frozen reference")
      // now one reference observation ties the live value at 800: the
      // worst gap sits just below 800 where F_ref=7/8, F_live=0
      assert(s2.dNum === 7L && s2.dMicro === 875000L,
        "re-frozen reference must reprice D on grid semantics")
    } finally q.stop()
    spark.catalog.clearCache()
  }
}

package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Trigger-prefix parity for [[StreamOps.cusumState]] (q249's streaming
  * twin): every trigger re-freezes the baseline from the grid's first
  * week and replays the textbook recurrence, so each snapshot must
  * equal the batch CUSUM over the stream PREFIX, and the final state
  * must bridge to the served batch q249 on the same series (the
  * StreamMkSpec discipline). */
class StreamCusumSpec extends SparkSpec {

  private val B = 7 // CusumBaselineDays

  private def refSnapshot(prefix: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Long, Boolean, Boolean) = {
    val grid = prefix.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val days = grid.toSeq.sortBy(_._1)
    if (days.size <= B) (days.size.toLong, 0L, 0L, 0L, 0L, false, false)
    else {
      val mu0 = Math.floorDiv(days.take(B).map(_._2).sum, B.toLong)
      val slack = Math.floorDiv(mu0, 20L)
      val h = Math.floorDiv(mu0, 2L)
      var sp = 0L; var sn = 0L; var nA = 0L; var alarmNow = false
      days.drop(B).foreach { case (_, v) =>
        sp = math.max(0L, sp + v - mu0 - slack)
        sn = math.max(0L, sn + mu0 - slack - v)
        alarmNow = sp > h || sn > h
        if (alarmNow) nA += 1
      }
      (days.size.toLong, mu0, sp, sn, nA, alarmNow, true)
    }
  }

  private def asTuple(s: StreamOps.CusumSnapshot) =
    (s.nDays, s.mu0Cents, s.sPosCents, s.sNegCents, s.nAlarms, s.alarmNow, s.defined)

  test("every trigger snapshot equals the batch CUSUM over the prefix; final bridges to q249") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(expr("cast(cast(ts as long) div 86400 as bigint)").as("d"),
        floor(round(col("value"), 2) * 100.0 + 0.5).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val shuffled = rows.zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000003L }.map(_._1)
    val cut1 = shuffled.length / 4
    val cut2 = (shuffled.length * 2) / 3
    val batches = Seq(shuffled.slice(0, cut1), shuffled.slice(cut1, cut2),
      shuffled.slice(cut2, shuffled.length))

    val input = MemoryStream[StreamOps.DailyValue]
    val q = StreamOps.cusumMonitorState(input.toDS())
      .writeStream.format("memory").queryName("cusum_state")
      .outputMode("append").start()
    try {
      var prefix = Vector.empty[(Long, Long)]
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b.map { case (d, c) => StreamOps.DailyValue("s", d, c) }: _*)
        q.processAllAvailable()
        prefix ++= b
        val snap = spark.table("cusum_state").as[StreamOps.CusumSnapshot].collect().last
        assert(asTuple(snap) === refSnapshot(prefix),
          s"trigger $i diverged from the prefix CUSUM")
        // the shuffled chops spread every day across batches, so even
        // trigger 0 sees the full calendar span — the baseline freezes
        assert(snap.defined, s"trigger $i: baseline not freezable — chop too small")
      }
      // the bridge: the final snapshot == the served batch q249's tail
      val batchRows = graft.queries.ExtQueries.queries("q249_cusum_monitor")(spark, sfDir)
        .collect()
      val last = batchRows.last
      val fin = spark.table("cusum_state").as[StreamOps.CusumSnapshot].collect().last
      assert(fin.sPosCents === last.getLong(last.fieldIndex("s_pos_cents")))
      assert(fin.sNegCents === last.getLong(last.fieldIndex("s_neg_cents")))
      assert(fin.nAlarms === batchRows.map(r => r.getLong(r.fieldIndex("alarm"))).sum,
        "streaming CUSUM diverged from the batch q249 on the same table")
      assert(fin.nDays === batchRows.length.toLong + B)
      // the monitor watches a series that actually drifts at this SF
      assert(fin.nAlarms > 0L, "no alarms on the corpus — vacuous monitor")
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("a late arrival into a BASELINE day re-freezes the reference (grid semantics, " +
      "not arrival-order semantics)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.DailyValue]
    val q = StreamOps.cusumMonitorState(input.toDS(), baselineDays = 2)
      .writeStream.format("memory").queryName("cusum_late")
      .outputMode("append").start()
    try {
      // days 1,2 baseline (mu0 = 150), day 3 monitored
      input.addData(StreamOps.DailyValue("s", 1L, 100L),
        StreamOps.DailyValue("s", 2L, 200L), StreamOps.DailyValue("s", 3L, 400L))
      q.processAllAvailable()
      val s1 = spark.table("cusum_late").as[StreamOps.CusumSnapshot].collect().last
      assert(s1.defined && s1.mu0Cents === 150L)
      // late arrival for baseline day 1: mu0 must re-freeze to 250 —
      // the batch canon recomputed on the fuller table would
      input.addData(StreamOps.DailyValue("s", 1L, 200L))
      q.processAllAvailable()
      val s2 = spark.table("cusum_late").as[StreamOps.CusumSnapshot].collect().last
      assert(s2.mu0Cents === 250L,
        "late baseline arrival did not re-freeze the reference")
      // and the trajectory reflects the NEW reference: dev = 400-250-12
      val slack = 250L / 20L
      assert(s2.sPosCents === math.max(0L, 400L - 250L - slack))
    } finally q.stop()
  }

  test("prefixes that cannot freeze a baseline report defined=false") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.DailyValue]
    val q = StreamOps.cusumMonitorState(input.toDS())
      .writeStream.format("memory").queryName("cusum_deg")
      .outputMode("append").start()
    try {
      input.addData((1L to 7L).map(d => StreamOps.DailyValue("s", d, 100L)): _*)
      q.processAllAvailable()
      val snap = spark.table("cusum_deg").as[StreamOps.CusumSnapshot].collect().last
      assert(snap.nDays === 7L && !snap.defined,
        "exactly-baseline-many days cannot monitor anything yet")
      input.addData(StreamOps.DailyValue("s", 8L, 500L))
      q.processAllAvailable()
      val s2 = spark.table("cusum_deg").as[StreamOps.CusumSnapshot].collect().last
      assert(s2.defined && s2.sPosCents > 0L)
    } finally q.stop()
  }
}

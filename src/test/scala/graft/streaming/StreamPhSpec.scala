package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Trigger-prefix parity for [[StreamOps.pageHinkleyState]] (q266's
  * streaming twin): every trigger re-freezes the δ/λ scale from the
  * grid's first week and replays the PH fold, so each snapshot must
  * equal the batch q266 over the stream PREFIX, and the final state
  * must bridge to the served batch q266 on the same series (the
  * StreamCusumSpec discipline). */
class StreamPhSpec extends SparkSpec {

  private val B = 7 // CusumBaselineDays

  private def refSnapshot(prefix: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Long, Boolean, Boolean) = {
    val grid = prefix.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val days = grid.toSeq.sortBy(_._1)
    if (days.size <= B) (days.size.toLong, 0L, 0L, 0L, 0L, false, false)
    else {
      val mu0 = Math.floorDiv(days.take(B).map(_._2).sum, B.toLong)
      val delta = Math.floorDiv(mu0, 50L)
      val lambda = Math.floorDiv(mu0, 2L)
      var t = 0L; var cum = 0L; var mPos = 0L; var mNeg = 0L
      var minPos = Long.MaxValue; var minNeg = Long.MaxValue
      var phPos = 0L; var phNeg = 0L; var nA = 0L; var alarmNow = false
      days.drop(B).foreach { case (_, v) =>
        t += 1; cum += v
        mPos += math.floor((v * t - cum).toDouble / t).toLong - delta
        mNeg += math.floor((cum - v * t).toDouble / t).toLong - delta
        minPos = math.min(minPos, mPos); minNeg = math.min(minNeg, mNeg)
        phPos = mPos - minPos; phNeg = mNeg - minNeg
        alarmNow = phPos > lambda || phNeg > lambda
        if (alarmNow) nA += 1
      }
      (days.size.toLong, mu0, phPos, phNeg, nA, alarmNow, true)
    }
  }

  private def asTuple(s: StreamOps.PhSnapshot) =
    (s.nDays, s.mu0Cents, s.phPos, s.phNeg, s.nAlarms, s.alarmNow, s.defined)

  test("every trigger snapshot equals the batch PH over the prefix; final bridges to q266") {
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
    val q = StreamOps.pageHinkleyState(input.toDS())
      .writeStream.format("memory").queryName("ph_state")
      .outputMode("append").start()
    try {
      var prefix = Vector.empty[(Long, Long)]
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b.map { case (d, c) => StreamOps.DailyValue("s", d, c) }: _*)
        q.processAllAvailable()
        prefix ++= b
        val snap = spark.table("ph_state").as[StreamOps.PhSnapshot].collect().last
        assert(asTuple(snap) === refSnapshot(prefix),
          s"trigger $i diverged from the prefix PH")
        assert(snap.defined, s"trigger $i: scale not freezable — chop too small")
      }
      // the bridge: the final snapshot == the served batch q266's tail
      val batchRows = graft.queries.ExtQueries.queries("q266_page_hinkley")(spark, sfDir)
        .collect()
      val last = batchRows.last
      val fin = spark.table("ph_state").as[StreamOps.PhSnapshot].collect().last
      assert(fin.phPos === last.getLong(last.fieldIndex("ph_pos")))
      assert(fin.phNeg === last.getLong(last.fieldIndex("ph_neg")))
      assert(fin.nAlarms === batchRows.map(r => r.getLong(r.fieldIndex("alarm"))).sum,
        "streaming PH diverged from the batch q266 on the same table")
      assert(fin.nDays === batchRows.length.toLong + B)
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("a late arrival into a BASELINE day re-freezes the scale (grid semantics, " +
      "not arrival-order semantics)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.DailyValue]
    val q = StreamOps.pageHinkleyState(input.toDS(), baselineDays = 2)
      .writeStream.format("memory").queryName("ph_late")
      .outputMode("append").start()
    try {
      // days 1,2 baseline (mu0 = 150), day 3 monitored: t=1 → term_pos
      // = floor(0/1) − δ = −3, ph = 0 (m_1 is its own running min)
      input.addData(StreamOps.DailyValue("s", 1L, 100L),
        StreamOps.DailyValue("s", 2L, 200L), StreamOps.DailyValue("s", 3L, 400L))
      q.processAllAvailable()
      val s1 = spark.table("ph_late").as[StreamOps.PhSnapshot].collect().last
      assert(s1.defined && s1.mu0Cents === 150L)
      assert(s1.phPos === 0L && s1.phNeg === 0L,
        "a single monitored day is its own running min — ph must be 0")
      // late arrival for baseline day 1: mu0 must re-freeze to 250 —
      // the batch canon recomputed on the fuller table would
      input.addData(StreamOps.DailyValue("s", 1L, 200L))
      q.processAllAvailable()
      val s2 = spark.table("ph_late").as[StreamOps.PhSnapshot].collect().last
      assert(s2.mu0Cents === 250L,
        "late baseline arrival did not re-freeze the scale")
    } finally q.stop()
  }

  test("a level step alarms mid-stream and prefixes that cannot freeze report " +
      "defined=false") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.DailyValue]
    val q = StreamOps.pageHinkleyState(input.toDS())
      .writeStream.format("memory").queryName("ph_step")
      .outputMode("append").start()
    try {
      input.addData((1L to 7L).map(d => StreamOps.DailyValue("s", d, 10000L)): _*)
      q.processAllAvailable()
      val snap = spark.table("ph_step").as[StreamOps.PhSnapshot].collect().last
      assert(snap.nDays === 7L && !snap.defined,
        "exactly-baseline-many days cannot monitor anything yet")
      // three quiet days, then a sustained 4x step: the running mean
      // cannot absorb it before ph crosses λ = μ0/2 = 5000
      input.addData((8L to 10L).map(d => StreamOps.DailyValue("s", d, 10000L)): _*)
      q.processAllAvailable()
      val quiet = spark.table("ph_step").as[StreamOps.PhSnapshot].collect().last
      assert(quiet.defined && !quiet.alarmNow && quiet.nAlarms === 0L)
      input.addData((11L to 16L).map(d => StreamOps.DailyValue("s", d, 40000L)): _*)
      q.processAllAvailable()
      val fired = spark.table("ph_step").as[StreamOps.PhSnapshot].collect().last
      assert(fired.alarmNow && fired.nAlarms > 0L, "a sustained 4x step must alarm")
      // and the snapshot still equals the driver fold over the full grid
      val all = (1L to 10L).map((_, 10000L)) ++ (11L to 16L).map((_, 40000L))
      assert(asTuple(fired) === refSnapshot(all))
    } finally q.stop()
  }
}

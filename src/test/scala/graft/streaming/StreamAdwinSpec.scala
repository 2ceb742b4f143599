package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Trigger-prefix parity for [[StreamOps.adwinState]] (the full
  * window-shrinking ADWIN — q269 is the per-prefix cut TEST, this
  * carries the shrink recursion): every trigger must equal a driver
  * sequential ADWIN fold over the prefix grid, the FIRST shrink must
  * land exactly where batch q269 first reports `detected`, and after a
  * level step the window must re-anchor past the changepoint (the
  * adaptation PH's cumulative mean cannot do). */
class StreamAdwinSpec extends SparkSpec {

  private def refSnapshot(prefix: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Long, Boolean, Boolean) = {
    val grid = prefix.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val days = grid.toSeq.sortBy(_._1)
    if (days.isEmpty) (0L, 0L, -1L, 0L, -2000000L, false, false)
    else {
      def cutTrips(win: IndexedSeq[(Long, Long)]): Boolean = {
        val t = win.length.toLong
        if (t < 2L) false
        else {
          val vs = win.map(_._2)
          val s = vs.sum; val rng = vs.max - vs.min
          var s0 = 0L
          (1L until t).exists { n0 =>
            s0 += vs((n0 - 1).toInt)
            val n1 = t - n0
            val dmu = math.abs(s0.toDouble / n0.toDouble
              - (s - s0).toDouble / n1.toDouble)
            val mH = n0.toDouble * n1.toDouble / (n0.toDouble + n1.toDouble)
            val eps = rng.toDouble *
              math.sqrt(math.log(4.0 * t.toDouble / 0.05) / (2.0 * mH))
            math.floor(dmu * 1e6 + 0.5).toLong >
              math.floor(eps * 1e6 + 0.5).toLong
          }
        }
      }
      var win = Vector.empty[(Long, Long)]
      var shrinks = 0L; var shrunkLast = false
      days.foreach { dv =>
        win :+= dv
        shrunkLast = false
        while (cutTrips(win)) { win = win.tail; shrinks += 1L; shrunkLast = true }
      }
      val mu = math.floor(
        win.map(_._2).sum.toDouble / win.length.toDouble * 1e6 + 0.5).toLong
      (days.size.toLong, win.length.toLong, win.head._1, shrinks, mu,
        shrunkLast, true)
    }
  }

  private def asTuple(s: StreamOps.AdwinSnapshot) =
    (s.nDays, s.winLen, s.winStartD, s.nShrinks, s.muWinMicro, s.shrunkNow,
      s.defined)

  test("every trigger snapshot equals the sequential ADWIN fold over the prefix grid") {
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
    val q = StreamOps.adwinState(input.toDS())
      .writeStream.format("memory").queryName("adwin_state")
      .outputMode("append").start()
    try {
      var prefix = Vector.empty[(Long, Long)]
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b.map { case (d, c) => StreamOps.DailyValue("s", d, c) }: _*)
        q.processAllAvailable()
        prefix ++= b
        val snap = spark.table("adwin_state").as[StreamOps.AdwinSnapshot]
          .collect().last
        assert(asTuple(snap) === refSnapshot(prefix),
          s"trigger $i diverged from the sequential ADWIN fold")
      }
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("a level step shrinks the window exactly where batch q269 first detects, " +
      "and the window re-anchors toward the new regime") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the q269 step fixture: days 1-10 at 10000 cents, 11-20 at 40000
    val series = (1L to 20L).map(d => (d, if (d <= 10L) 10000L else 40000L))
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-adwin-tw").toString
    series.toDF("day", "cents")
      .select((col("day") * 86400L).cast("timestamp").as("ts"),
        lit("purchase").as("event_type"),
        (col("cents").cast("double") / 100.0).as("value"),
        col("day").as("event_id"), col("day").as("user_id"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmpDir/events.parquet")
    val firstDetected = graft.queries.ExtQueries
      .queries("q269_adwin_cut")(spark, tmpDir).collect()
      .filter(r => r.getLong(r.fieldIndex("detected")) === 1L)
      .map(_.getLong(0)).headOption
    assert(firstDetected.isDefined, "the step fixture must trip q269")

    val input = MemoryStream[StreamOps.DailyValue]
    val q = StreamOps.adwinState(input.toDS())
      .writeStream.format("memory").queryName("adwin_step")
      .outputMode("append").start()
    try {
      // feed day by day; record the first trigger whose snapshot shrinks
      var firstShrinkDay = -1L
      series.foreach { case (d, c) =>
        input.addData(StreamOps.DailyValue("s", d, c))
        q.processAllAvailable()
        val snap = spark.table("adwin_step").as[StreamOps.AdwinSnapshot]
          .collect().last
        if (firstShrinkDay < 0L && snap.shrunkNow) firstShrinkDay = d
      }
      // q269's day column is the epoch-day of the fixture (day index);
      // the fixture writes ts = day·86400 so epoch-day == day
      assert(firstShrinkDay === firstDetected.get,
        "first ADWIN shrink must land where the per-prefix cut test first fires")
      val fin = spark.table("adwin_step").as[StreamOps.AdwinSnapshot]
        .collect().last
      // the re-anchor is PARTIAL by design: on clean two-level data the
      // plug-in range makes dmu/rng = 1 regardless of step size, so the
      // harmonic bound retains a conservative old-day rump (here days
      // 6-10) — the window mean still moves decisively toward the new
      // regime (30000 vs the global 25000 PH would stay anchored to)
      assert(fin.winStartD === 6L && fin.winLen === 15L,
        s"expected the window to re-anchor to days 6-20, got start=${fin.winStartD} len=${fin.winLen}")
      assert(fin.muWinMicro === 30000L * 1000000L,
        "the re-anchored window mean must average the rump + new regime exactly")
      assert(fin.nShrinks === 5L && fin.defined)
    } finally q.stop()
  }

  test("a constant series never shrinks and an empty scope reports defined=false") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.DailyValue]
    val q = StreamOps.adwinState(input.toDS())
      .writeStream.format("memory").queryName("adwin_flat")
      .outputMode("append").start()
    try {
      input.addData((1L to 40L).map(d => StreamOps.DailyValue("s", d, 7777L)): _*)
      q.processAllAvailable()
      val snap = spark.table("adwin_flat").as[StreamOps.AdwinSnapshot]
        .collect().last
      assert(snap.defined && snap.nShrinks === 0L && snap.winLen === 40L
        && snap.winStartD === 1L && snap.muWinMicro === 7777L * 1000000L,
        "a constant series must keep the full window")
    } finally q.stop()
  }
}

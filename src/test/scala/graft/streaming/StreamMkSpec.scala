package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Trigger-prefix parity for [[StreamOps.mannKendallState]] (q241's
  * streaming twin): every trigger's snapshot must equal q241's exact
  * arithmetic — pairwise signs over the bounded daily grid, the tie
  * correction on the exact value grid, the continuity-corrected z —
  * over the stream PREFIX, and the final state must bridge to the
  * served batch q241 on the same events-derived series (one rule, two
  * tiers — the StreamAnovaSpec discipline). */
class StreamMkSpec extends SparkSpec {

  private def refSnapshot(prefix: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Long, Long, Long, Boolean) = {
    val grid = prefix.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val days = grid.toSeq.sortBy(_._1)
    val n = days.size.toLong
    val s = (for {
      i <- days.indices; j <- (i + 1) until days.size
    } yield java.lang.Long.signum(days(j)._2 - days(i)._2).toLong).sum
    val tieSizes = days.groupBy(_._2).map(_._2.size.toLong)
    val nValues = tieSizes.size.toLong
    val tieTerm = tieSizes.map(t => t * (t - 1) * (2 * t + 5)).sum
    val var18 = n * (n - 1) * (2 * n + 5) - tieTerm
    if (n < 2 || var18 <= 0L)
      (n, nValues, s, tieTerm, var18, 0L, java.lang.Long.signum(s).toLong, false)
    else {
      val sd = math.sqrt(var18.toDouble / 18.0)
      val z = if (s > 0) (s - 1).toDouble / sd
        else if (s < 0) (s + 1).toDouble / sd else 0.0
      (n, nValues, s, tieTerm, var18, math.floor(z * 1e6 + 0.5).toLong,
        java.lang.Long.signum(s).toLong, true)
    }
  }

  test("every trigger snapshot equals the batch Mann-Kendall over the prefix; " +
      "final bridges to q241") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the SAME series q241 tests: per-purchase (epoch-day, cents) rows;
    // the state's per-day fold reproduces q241's daily grid
    val rows = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(expr("cast(cast(ts as long) div 86400 as bigint)").as("d"),
        floor(round(col("value"), 2) * 100.0 + 0.5).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // deterministic shuffle + three uneven chops: the day-grid fold is
    // order-robust (plain sums per day), so arrival order cannot matter
    val shuffled = rows.zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000003L }.map(_._1)
    val cut1 = shuffled.length / 4
    val cut2 = (shuffled.length * 2) / 3
    val batches = Seq(shuffled.slice(0, cut1), shuffled.slice(cut1, cut2),
      shuffled.slice(cut2, shuffled.length))

    val input = MemoryStream[StreamOps.DailyValue]
    val q = StreamOps.mannKendallState(input.toDS())
      .writeStream.format("memory").queryName("mk_state")
      .outputMode("append").start()
    try {
      var prefix = Vector.empty[(Long, Long)]
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b.map { case (d, c) => StreamOps.DailyValue("s", d, c) }: _*)
        q.processAllAvailable()
        prefix ++= b
        val snap = spark.table("mk_state").as[StreamOps.MkSnapshot].collect().last
        val ref = refSnapshot(prefix)
        assert((snap.nDays, snap.nValues, snap.sStat, snap.tieTerm, snap.var18,
          snap.zMicro, snap.trend, snap.defined) === ref,
          s"trigger $i diverged from the prefix Mann-Kendall")
        assert(snap.defined, s"trigger $i: test undefined — chop too small, vacuous")
      }
      // the bridge: the final snapshot == the served batch q241
      val b = graft.queries.ExtQueries.queries("q241_mann_kendall")(spark, sfDir).head()
      val fin = spark.table("mk_state").as[StreamOps.MkSnapshot].collect().last
      assert(fin.nDays === b.getLong(b.fieldIndex("n_days")))
      assert(fin.nValues === b.getLong(b.fieldIndex("n_values")))
      assert(fin.sStat === b.getLong(b.fieldIndex("s_stat")))
      assert(fin.tieTerm === b.getLong(b.fieldIndex("tie_term")))
      assert(fin.var18 === b.getLong(b.fieldIndex("var18")))
      assert(fin.zMicro === b.getLong(b.fieldIndex("z_micro")))
      assert(fin.trend === b.getLong(b.fieldIndex("trend")),
        "streaming MK state diverged from the batch q241 on the same table")
      // the test must be COMPUTABLE on the corpus (defined, positive
      // variance, a real pairwise structure) — z itself may be 0 when
      // the small-SF series genuinely has no trend (s_stat = 0 is a
      // legal outcome, and the parity asserts above pin it exactly)
      assert(fin.defined && fin.var18 > 0L && fin.nDays >= 10L,
        "MK not computable on the corpus — vacuous monitor")
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("undefined prefixes (one day / all-tied) report defined=false, never NaN") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.DailyValue]
    val q = StreamOps.mannKendallState(input.toDS())
      .writeStream.format("memory").queryName("mk_deg")
      .outputMode("append").start()
    try {
      // one day: n < 2
      input.addData(StreamOps.DailyValue("s", 10L, 100L))
      q.processAllAvailable()
      var snap = spark.table("mk_deg").as[StreamOps.MkSnapshot].collect().last
      assert(snap.nDays === 1L && !snap.defined && snap.zMicro === 0L)
      // two ALL-TIED days: var18 = 0 (every pair tied), still undefined
      input.addData(StreamOps.DailyValue("s", 11L, 100L))
      q.processAllAvailable()
      snap = spark.table("mk_deg").as[StreamOps.MkSnapshot].collect().last
      assert(snap.nDays === 2L && snap.var18 === 0L && !snap.defined,
        "all-tied grid must be visibly undefined, not z=NaN")
      // a third, different day: the test becomes defined
      input.addData(StreamOps.DailyValue("s", 12L, 300L))
      q.processAllAvailable()
      snap = spark.table("mk_deg").as[StreamOps.MkSnapshot].collect().last
      assert(snap.nDays === 3L && snap.defined && snap.trend === 1L)
    } finally q.stop()
  }

  test("late/replayed same-day arrivals fold into the same grid cell (order-robust state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.DailyValue]
    val q = StreamOps.mannKendallState(input.toDS())
      .writeStream.format("memory").queryName("mk_late")
      .outputMode("append").start()
    try {
      input.addData(StreamOps.DailyValue("s", 1L, 100L),
        StreamOps.DailyValue("s", 2L, 250L), StreamOps.DailyValue("s", 3L, 300L))
      q.processAllAvailable()
      // a LATE arrival for day 2 lands in day 2's cell and can flip the
      // day's relative order — exactly what a calendar-grid state must
      // absorb and a sequence-based one cannot
      input.addData(StreamOps.DailyValue("s", 2L, 100L))
      q.processAllAvailable()
      val snap = spark.table("mk_late").as[StreamOps.MkSnapshot].collect().last
      val ref = refSnapshot(Seq((1L, 100L), (2L, 350L), (3L, 300L)))
      assert((snap.nDays, snap.nValues, snap.sStat, snap.tieTerm, snap.var18,
        snap.zMicro, snap.trend, snap.defined) === ref,
        "late same-day arrival not folded into its grid cell")
    } finally q.stop()
  }
}

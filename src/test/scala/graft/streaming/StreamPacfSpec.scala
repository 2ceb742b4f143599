package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Trigger-prefix parity for [[StreamOps.pacfState]] (q259's streaming
  * twin): every trigger rebuilds the dollar-grain daily series from the
  * cent grid and replays the batch Durbin–Levinson closed forms, so
  * each snapshot must equal the driver fold over the stream PREFIX, and
  * the final per-scope snapshots must bridge to the served batch q259
  * on the same table (the StreamLbSpec discipline). */
class StreamPacfSpec extends SparkSpec {

  private def refSnapshot(prefix: Seq[(Long, Long)])
      : (Long, Long, Seq[Long], Boolean) = {
    val grid = prefix.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val xs = grid.toSeq.sortBy(_._1).map { case (_, c) => Math.floorDiv(c + 50L, 100L) }
    val n = xs.size.toLong
    val t = xs.sum
    val ys = xs.map(x => n * x - t)
    val syy = ys.map(y => y * y).sum
    def sk(k: Int): Long =
      ys.dropRight(k).zip(ys.drop(k)).map { case (a, b) => a * b }.sum
    val sent = Seq.fill(6)(-2000000L)
    if (n <= 4 || syy <= 0L) (n, syy, sent, false)
    else {
      val r1 = sk(1).toDouble / syy.toDouble
      val r2 = sk(2).toDouble / syy.toDouble
      val r3 = sk(3).toDouble / syy.toDouble
      val d2 = 1.0 - r1 * r1
      val phi22 = (r2 - r1 * r1) / d2
      val phi21 = r1 - phi22 * r1
      val d3 = 1.0 - phi21 * r1 - phi22 * r2
      val phi33 = (r3 - phi21 * r2 - phi22 * r1) / d3
      if (d2 == 0.0 || d3 == 0.0) (n, syy, sent, false)
      else {
        def s6(v: Double): Long = math.floor(v * 1e6 + 0.5).toLong
        (n, syy, Seq(s6(r1), s6(r2), s6(r3), s6(r1), s6(phi22), s6(phi33)), true)
      }
    }
  }

  test("every trigger snapshot equals the batch Durbin-Levinson fold over the prefix; " +
      "finals bridge to the served q259 per event type") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("cast(cast(ts as long) div 86400 as bigint)").as("d"),
        floor(round(col("value"), 2) * 100.0 + 0.5).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val shuffled = rows.zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000003L }.map(_._1)
    val cut1 = shuffled.length / 4
    val cut2 = (shuffled.length * 2) / 3
    val batches = Seq(shuffled.slice(0, cut1), shuffled.slice(cut1, cut2),
      shuffled.slice(cut2, shuffled.length))

    val input = MemoryStream[StreamOps.DailyValue]
    val q = StreamOps.pacfState(input.toDS())
      .writeStream.format("memory").queryName("pacf_state")
      .outputMode("append").start()
    try {
      var prefix = Vector.empty[(String, Long, Long)]
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b.map { case (tp, d, c) => StreamOps.DailyValue(tp, d, c) }: _*)
        q.processAllAvailable()
        prefix ++= b
        val snaps = spark.table("pacf_state").as[StreamOps.PacfSnapshot].collect()
          .zipWithIndex.groupBy(_._1.scope).map { case (sc, ss) => sc -> ss.maxBy(_._2)._1 }
        prefix.groupBy(_._1).foreach { case (tp, rs) =>
          val (wn, wsyy, wm, wdef) = refSnapshot(rs.map { case (_, d, c) => (d, c) })
          val s = snaps(tp)
          val micros = Seq(s.acf1Micro, s.acf2Micro, s.acf3Micro,
            s.pacf1Micro, s.pacf2Micro, s.pacf3Micro)
          assert((s.nDays, s.syy, micros, s.defined) === ((wn, wsyy, wm, wdef)),
            s"trigger $i scope $tp diverged from the prefix fold")
        }
      }
      // the bridge: final snapshots == the served batch q259 rows
      val batchRows = graft.queries.ExtQueries.queries("q259_pacf")(spark, sfDir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), (3 to 8).map(r.getLong).toSeq, r.getLong(9))).toMap
      val fin = spark.table("pacf_state").as[StreamOps.PacfSnapshot].collect()
        .zipWithIndex.groupBy(_._1.scope).map { case (sc, ss) => sc -> ss.maxBy(_._2)._1 }
      assert(fin.keySet === batchRows.keySet, "scope set diverged from event types")
      fin.foreach { case (tp, s) =>
        val (n, syy, micros, defL) = batchRows(tp)
        val got = Seq(s.acf1Micro, s.acf2Micro, s.acf3Micro,
          s.pacf1Micro, s.pacf2Micro, s.pacf3Micro)
        assert((s.nDays, s.syy, got) === ((n, syy, micros)),
          s"$tp: streaming PACF diverged from the batch q259 on the same table")
        assert(s.defined === (defL === 1L))
        assert(s.defined, s"$tp: full series must define PACF at this SF")
      }
      // non-vacuity: the partials must genuinely discriminate per scope
      assert(fin.values.map(_.pacf1Micro).toSeq.distinct.length > 1,
        "all scopes share one lag-1 partial — vacuous")
    } finally q.stop()
    spark.catalog.clearCache()
  }
}

package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Trigger-prefix parity for [[StreamOps.ljungBoxState]] (q254's
  * streaming twin): every trigger rebuilds the dollar-grain daily
  * series from the cent grid and replays the batch Q(7) fold, so each
  * snapshot must equal the driver fold over the stream PREFIX, and the
  * final per-scope snapshots must bridge to the served batch q254 on
  * the same table (the StreamCusumSpec discipline). */
class StreamLbSpec extends SparkSpec {

  private val H = 7

  private def refSnapshot(prefix: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Boolean) = {
    val grid = prefix.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val xs = grid.toSeq.sortBy(_._1).map { case (_, c) => Math.floorDiv(c + 50L, 100L) }
    val n = xs.size.toLong
    val t = xs.sum
    val ys = xs.map(x => n * x - t)
    val syy = ys.map(y => y * y).sum
    if (n <= H + 1) (n, syy, -1L, -1L, false)
    else {
      var terms = 0.0
      (1 to H).foreach { k =>
        val syk = ys.dropRight(k).zip(ys.drop(k)).map { case (a, b) => a * b }.sum
        val r = syk.toDouble / syy.toDouble
        terms += r * r / (n.toDouble - k.toDouble)
      }
      val q = n.toDouble * (n.toDouble + 2.0) * terms
      (n, syy, math.floor(q * 1e6 + 0.5).toLong, if (q > 18.475307) 1L else 0L, true)
    }
  }

  test("every trigger snapshot equals the batch Q(7) fold over the prefix; " +
      "finals bridge to the served q254 per event type") {
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
    val q = StreamOps.ljungBoxState(input.toDS())
      .writeStream.format("memory").queryName("lb_state")
      .outputMode("append").start()
    try {
      var prefix = Vector.empty[(String, Long, Long)]
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b.map { case (tp, d, c) => StreamOps.DailyValue(tp, d, c) }: _*)
        q.processAllAvailable()
        prefix ++= b
        // latest snapshot per scope this trigger
        val snaps = spark.table("lb_state").as[StreamOps.LbSnapshot].collect()
          .zipWithIndex.groupBy(_._1.scope).map { case (sc, ss) => sc -> ss.maxBy(_._2)._1 }
        prefix.groupBy(_._1).foreach { case (tp, rs) =>
          val want = refSnapshot(rs.map { case (_, d, c) => (d, c) })
          val s = snaps(tp)
          assert((s.nDays, s.syy, s.qMicro, s.reject, s.defined) === want,
            s"trigger $i scope $tp diverged from the prefix fold")
        }
      }
      // the bridge: final snapshots == the served batch q254 rows
      val batchRows = graft.queries.ExtQueries.queries("q254_ljung_box")(spark, sfDir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val fin = spark.table("lb_state").as[StreamOps.LbSnapshot].collect()
        .zipWithIndex.groupBy(_._1.scope).map { case (sc, ss) => sc -> ss.maxBy(_._2)._1 }
      assert(fin.keySet === batchRows.keySet, "scope set diverged from event types")
      fin.foreach { case (tp, s) =>
        val (n, syy, qm, rej) = batchRows(tp)
        assert((s.nDays, s.syy, s.qMicro, s.reject) === ((n, syy, qm, rej)),
          s"$tp: streaming Ljung-Box diverged from the batch q254 on the same table")
        assert(s.defined, s"$tp: full series must define Q at this SF")
      }
    } finally q.stop()
    spark.catalog.clearCache()
  }
}

package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Trigger-prefix parity for [[StreamOps.ebShrinkState]] (q255's
  * streaming twin): every trigger refits the MoM beta-binomial prior
  * over the exact micro-floored rate grid of the stream PREFIX, and the
  * final state must bridge to the served batch q255 on the same fact
  * rows (the StreamCusumSpec discipline). */
class StreamEbSpec extends SparkSpec {

  /** The q255 arithmetic as a driver fold over (group -> (n, y)). */
  private def refRows(m: Map[String, (Long, Long)])
      : Seq[(String, Long, Long, Long, Long, Long, Long, Boolean)] = {
    val k = m.size.toLong
    val ps = m.values.toSeq.map { case (n, y) => Math.floorDiv(y * 1000000L, n) }
    val sp = ps.sum
    val spp = ps.map(p => p * p).sum
    val kD = k.toDouble
    val m01 = sp.toDouble / kD / 1e6
    val v01 = (kD * spp.toDouble - sp.toDouble * sp.toDouble) / (kD * kD) / 1e12
    val ab = m01 * (1.0 - m01) / v01 - 1.0
    val defined = v01 > 0.0 && ab > 0.0
    val alpha = m01 * ab
    m.toSeq.sortBy(_._1).map { case (g, (n, y)) =>
      val raw = Math.floorDiv(y * 1000000L, n)
      if (defined)
        (g, n, y, raw, math.floor(alpha * 1e6 + 0.5).toLong,
          math.floor((ab - alpha) * 1e6 + 0.5).toLong,
          math.floor((y.toDouble + alpha) / (n.toDouble + ab) * 1e6 + 0.5).toLong,
          true)
      else (g, n, y, raw, -1L, -1L, raw, false)
    }
  }

  test("every trigger's rows equal the batch EB fold over the prefix; " +
      "final state bridges to the served q255") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the SAME fact rows q255 collapses: one arrival per lineitem with
    // its nation and return flag
    val rows = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), (col("l_returnflag") === "R").cast("long").as("ret"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // deterministic shuffle so batches interleave groups (arrival order
    // must not matter — the state fold is plain sums)
    val shuffled = rows.zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000003L }.map(_._1)
    val cut1 = shuffled.length / 4
    val cut2 = (shuffled.length * 2) / 3
    val batches = Seq(shuffled.slice(0, cut1), shuffled.slice(cut1, cut2),
      shuffled.slice(cut2, shuffled.length))

    val input = MemoryStream[StreamOps.RateArrival]
    val q = StreamOps.ebShrinkState(input.toDS())
      .writeStream.format("memory").queryName("eb_state")
      .outputMode("append").start()
    try {
      var prefix = Map.empty[String, (Long, Long)]
      var seen = 0
      batches.foreach { b =>
        input.addData(b.map { case (g, ret) => StreamOps.RateArrival("s", g, ret) })
        q.processAllAvailable()
        b.foreach { case (g, ret) =>
          val (n, y) = prefix.getOrElse(g, (0L, 0L))
          prefix = prefix.updated(g, (n + 1L, y + ret))
        }
        val all = spark.table("eb_state")
          .select("g", "n", "y", "rawMicro", "alphaMicro", "betaMicro",
            "shrunkMicro", "priorDefined")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
            r.getBoolean(7)))
        // this trigger appended one row per group currently in state
        val trig = all.drop(seen).sortBy(_._1).toSeq
        seen = all.length
        assert(trig === refRows(prefix),
          s"trigger snapshot diverged from the prefix EB fold at n=${prefix.size} groups")
      }
      // batch bridge: the final trigger IS q255 over the full input
      val got = spark.table("eb_state")
        .select("g", "n", "y", "rawMicro", "alphaMicro", "betaMicro",
          "shrunkMicro", "priorDefined")
        .collect().drop(seen - prefix.size)
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6),
          if (r.getBoolean(7)) 1L else 0L)).sortBy(_._1).toSeq
      val want = graft.queries.ExtQueries.queries("q255_eb_shrinkage")(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
        .sortBy(_._1).toSeq
      assert(got === want, "final trigger diverged from the served batch q255")
      // non-vacuity: the prior must be defined and must genuinely pull
      // small groups toward the pool on this corpus
      assert(want.forall(_._8 === 1L), "q255's prior is undefined on this corpus")
      assert(want.exists(r => r._7 !== r._4),
        "shrinkage moved no rate — vacuous")
    } finally q.stop()
  }
}

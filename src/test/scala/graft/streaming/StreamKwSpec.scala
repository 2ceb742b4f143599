package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Trigger-prefix parity for [[StreamOps.kruskalWallisState]] (q242's
  * streaming twin): every trigger recomputes midranks over the exact
  * (group, value) count grid and H with the batch arithmetic, so each
  * snapshot must equal q242's formula over the stream PREFIX, and the
  * final state must bridge to the served batch q242 on the same
  * events-derived values (the StreamAnovaSpec discipline). */
class StreamKwSpec extends SparkSpec {

  private def refSnapshot(prefix: Seq[(String, Long)])
      : (Long, Long, Long, Long, Long, Long, Boolean) = {
    val cells = prefix.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val grid = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toSeq.sortBy(_._1)
    var below = 0L
    val r2OfV = grid.map { case (v, c) =>
      val r = v -> (2L * below + c + 1L); below += c; r
    }.toMap
    val byG = cells.groupBy(_._1._1)
    val k = byG.size.toLong
    val n = cells.values.sum
    val tie3 = grid.map { case (_, c) => c * c * c - c }.sum
    val rsum = byG.values.map { cs =>
      val nG = cs.values.sum
      val r2 = cs.map { case ((_, v), c) => c * r2OfV(v) }.sum
      math.floor(r2.toDouble * r2.toDouble / (4.0 * nG.toDouble) + 0.5).toLong
    }.sum
    if (k < 2 || n < 2 || tie3 == n * n * n - n) (k, n, rsum, tie3, 0L, 0L, false)
    else {
      val nD = n.toDouble
      val h = 12.0 / (nD * (nD + 1.0)) * rsum.toDouble - 3.0 * (nD + 1.0)
      val corr = 1.0 - tie3.toDouble / (nD * nD * nD - nD)
      (k, n, rsum, tie3, math.floor(h * 1e6 + 0.5).toLong,
        math.floor(h / corr * 1e6 + 0.5).toLong, true)
    }
  }

  private def asTuple(s: StreamOps.KwSnapshot) =
    (s.k, s.n, s.rankSqSum, s.tie3, s.hMicro, s.hTieMicro, s.defined)

  test("every trigger snapshot equals the batch Kruskal-Wallis over the prefix; " +
      "final bridges to q242") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"),
        floor(round(col("value"), 2) * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val shuffled = rows.zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000003L }.map(_._1)
    val cut1 = shuffled.length / 4
    val cut2 = (shuffled.length * 2) / 3
    val batches = Seq(shuffled.slice(0, cut1), shuffled.slice(cut1, cut2),
      shuffled.slice(cut2, shuffled.length))

    val input = MemoryStream[StreamOps.GroupCentValue]
    val q = StreamOps.kruskalWallisState(input.toDS())
      .writeStream.format("memory").queryName("kw_state")
      .outputMode("append").start()
    try {
      var prefix = Vector.empty[(String, Long)]
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b.map { case (g, v) => StreamOps.GroupCentValue("s", g, v) }: _*)
        q.processAllAvailable()
        prefix ++= b
        val snap = spark.table("kw_state").as[StreamOps.KwSnapshot].collect().last
        assert(asTuple(snap) === refSnapshot(prefix),
          s"trigger $i diverged from the prefix Kruskal-Wallis")
        assert(snap.defined, s"trigger $i: H not computable — chop too small, vacuous")
      }
      // the bridge: the final snapshot == the served batch q242
      val b = graft.queries.ExtQueries.queries("q242_kruskal_wallis")(spark, sfDir).head()
      val fin = spark.table("kw_state").as[StreamOps.KwSnapshot].collect().last
      assert(fin.k === b.getLong(b.fieldIndex("k")))
      assert(fin.n === b.getLong(b.fieldIndex("n")))
      assert(fin.rankSqSum === b.getLong(b.fieldIndex("rank_sq_sum")))
      assert(fin.tie3 === b.getLong(b.fieldIndex("tie3")))
      assert(fin.hMicro === b.getLong(b.fieldIndex("h_micro")))
      assert(fin.hTieMicro === b.getLong(b.fieldIndex("h_tie_micro")),
        "streaming KW state diverged from the batch q242 on the same table")
      // the statistic must discriminate on the corpus
      assert(fin.hMicro > 0L, "H = 0 on the corpus — vacuous monitor")
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("undefined prefixes (one group / all values tied) report defined=false, never NaN") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.GroupCentValue]
    val q = StreamOps.kruskalWallisState(input.toDS())
      .writeStream.format("memory").queryName("kw_deg")
      .outputMode("append").start()
    try {
      // one group: k < 2
      input.addData(StreamOps.GroupCentValue("s", "only", 100L),
        StreamOps.GroupCentValue("s", "only", 200L))
      q.processAllAvailable()
      var snap = spark.table("kw_deg").as[StreamOps.KwSnapshot].collect().last
      assert(snap.k === 1L && !snap.defined)
      // second group arrives but EVERY value is tied: the tie
      // correction's denominator vanishes — still visibly undefined
      input.addData(StreamOps.GroupCentValue("s", "other", 100L))
      q.processAllAvailable()
      snap = spark.table("kw_deg").as[StreamOps.KwSnapshot].collect().last
      assert(snap.k === 2L && snap.defined,
        "two groups with distinct values should be defined")
      // a fresh scope where ALL values tie
      input.addData(StreamOps.GroupCentValue("t", "a", 5L),
        StreamOps.GroupCentValue("t", "b", 5L), StreamOps.GroupCentValue("t", "b", 5L))
      q.processAllAvailable()
      val tied = spark.table("kw_deg").as[StreamOps.KwSnapshot].collect()
        .filter(_.scope == "t").last
      assert(tied.k === 2L && tied.tie3 === tied.n * tied.n * tied.n - tied.n
        && !tied.defined, "all-tied grid must be visibly undefined, not h=NaN")
    } finally q.stop()
  }
}

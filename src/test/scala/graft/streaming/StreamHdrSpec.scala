package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Trigger-prefix parity for [[StreamOps.hdrQuantileState]] (q214's
  * streaming twin, the sketch tier's last stream gate): every trigger's
  * snapshot must be the exact HDR bucket table + nearest-rank quantiles
  * of the stream PREFIX, and the final state must equal the BATCH
  * engine's q214 rows on the same events table — one rule, two tiers,
  * the q211/distinctSketchState bridge discipline. */
class StreamHdrSpec extends SparkSpec {

  private def centsOf(dir: String): Array[Long] =
    Tables.events(spark, dir)
      .select(floor(round(col("value"), 2) * 100.0 + 0.5).cast("long").as("v"))
      .filter(col("v") >= 0)
      .collect().map(_.getLong(0))

  /** Driver-side exact reference: bucket table + quantile rows of a
    * prefix, in the snapshot's canonical serialization. */
  private def ref(prefix: Seq[Long]): (Long, String, String) = {
    val tbl = prefix.groupBy(StreamOps.hdrBucket).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val n = prefix.size.toLong
    val qs = Seq(50L, 90L, 95L, 99L).map { p =>
      val k = (p * n + 99L) / 100L
      var cum = 0L
      tbl.find { case (_, c) => cum += c; cum >= k }
        .fold(s"$p:$k:-1:-1:-1") { case (b, _) =>
          val (lo, hi) = StreamOps.hdrBounds(b); s"$p:$k:$b:$lo:$hi"
        }
    }.mkString(",")
    (n, qs, tbl.map { case (b, c) => s"$b:$c" }.mkString(","))
  }

  test("every trigger snapshot is the exact prefix sketch; final state bridges to batch q214") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cents = centsOf(sfDir)
    assert(cents.length > 100, "need a real corpus for the bridge")
    // three uneven chops, the middle one re-shuffled in-batch (the fold
    // is order-robust: plain-sum counters)
    val cut1 = cents.length / 3
    val cut2 = 2 * cents.length / 3
    val batches = Seq(
      cents.slice(0, cut1).toSeq,
      scala.util.Random.shuffle(cents.slice(cut1, cut2).toSeq),
      cents.slice(cut2, cents.length).toSeq)

    val input = MemoryStream[StreamOps.ValueArrival]
    val q = StreamOps.hdrQuantileState(input.toDS())
      .writeStream.format("memory").queryName("hdr_state")
      .outputMode("append").start()
    try {
      var seen = Vector.empty[Long]
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b.map(StreamOps.ValueArrival("lat", _)): _*)
        q.processAllAvailable()
        seen ++= cents.slice(if (i == 0) 0 else Seq(0, cut1, cut2)(i), Seq(cut1, cut2, cents.length)(i))
        val snap = spark.table("hdr_state").as[StreamOps.HdrSnapshot]
          .collect().last
        val (n, qs, tbl) = ref(seen)
        assert(snap.nSeen === n, s"trigger $i arrival count")
        assert(snap.quantiles === qs, s"trigger $i quantiles diverged from prefix reference")
        assert(snap.buckets === tbl, s"trigger $i bucket table diverged from prefix reference")
      }

      // ---- the bridge: final snapshot == the batch engine's q214 rows
      val finalSnap = spark.table("hdr_state").as[StreamOps.HdrSnapshot]
        .collect().last
      val batchRows = graft.queries.ExtQueries.queries("q214_hdr_quantiles")(spark, sfDir)
        .collect().map { r =>
          s"${r.getLong(0)}:${r.getLong(2)}:${r.getLong(3)}:${r.getLong(4)}:${r.getLong(5)}"
        }.mkString(",")
      assert(finalSnap.quantiles === batchRows,
        "streaming HDR state diverged from the batch q214 result on the same table")
      val batchTotal = graft.queries.ExtQueries.queries("q214_hdr_quantiles")(spark, sfDir)
        .select("n_total").head().getLong(0)
      assert(finalSnap.nSeen === batchTotal)
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("negative arrivals are dropped, not shifted through the sign bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.ValueArrival]
    val q = StreamOps.hdrQuantileState(input.toDS())
      .writeStream.format("memory").queryName("hdr_neg")
      .outputMode("append").start()
    try {
      input.addData(StreamOps.ValueArrival("s", -5L), StreamOps.ValueArrival("s", 10L))
      q.processAllAvailable()
      val snap = spark.table("hdr_neg").as[StreamOps.HdrSnapshot].collect().last
      assert(snap.nSeen === 1L, "negative value must not count")
      assert(snap.nDropped === 1L, "the contract violation must be counted, not silent")
      assert(snap.buckets === s"${StreamOps.hdrBucket(10L)}:1")
      // the drop counter is cumulative state, not per-trigger
      input.addData(StreamOps.ValueArrival("s", -7L))
      q.processAllAvailable()
      val snap2 = spark.table("hdr_neg").as[StreamOps.HdrSnapshot].collect().last
      assert(snap2.nSeen === 1L && snap2.nDropped === 2L)
    } finally q.stop()
  }

  test("bucket geometry: bitlen arithmetic matches bin(), width <= 1/16, bounds contain the value") {
    (0L to 2048L).foreach { v =>
      val b = StreamOps.hdrBucket(v)
      val (lo, hi) = StreamOps.hdrBounds(b)
      assert(lo <= v && v < hi, s"v=$v outside [$lo,$hi)")
      if (v >= 32) assert((hi - lo).toDouble / lo <= 1.0 / 16.0 + 1e-12,
        s"v=$v relative width broke the 1/16 contract")
      // the e derivation equals q214's length(bin(v)) - 5 form
      val binLen = java.lang.Long.toBinaryString(v).length
      val e = math.max(0, binLen - 5)
      assert(b === (e.toLong << 5) + (v >> e), s"v=$v bucket mismatch vs bin() arithmetic")
    }
  }
}

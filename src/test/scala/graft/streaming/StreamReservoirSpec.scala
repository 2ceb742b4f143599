package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Trigger-prefix parity for [[StreamOps.weightedReservoirState]]
  * (q237's streaming twin): deterministic ES keys make the reservoir an
  * EXACT top-k, so every trigger's sample must equal the batch
  * Efraimidis–Spirakis selection over the stream prefix — one rule, two
  * tiers (the q211/q214 bridge discipline) — and the final state must
  * match q237's served top-k on the same orders-derived weights. */
class StreamReservoirSpec extends SparkSpec {

  private def keyOf(id: Long, w: Long): Long = {
    val s = s"es#$id"
    val h = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    math.floor(math.log((h + 1).toDouble / 1000000008.0) / w.toDouble * 1e12).toLong
  }

  private def refSample(prefix: Seq[(Long, Long)]): String =
    prefix.map { case (id, w) => (id, w, keyOf(id, w)) }
      .sortBy { case (id, _, k) => (-k, id) }.take(StreamOps.EsStateK)
      .map { case (id, w, k) => s"$id:$w:$k" }.mkString(",")

  test("every trigger's sample is the exact batch ES top-k of the prefix; replays don't mutate it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val items = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(floor(round(sum(col("o_totalprice")), 2) * 100.0 + 0.5).cast("long").as("w"))
      .filter(col("w") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(items.length > StreamOps.EsStateK * 2, "need a real population")
    // shuffled arrival (deterministic), three chops, one negative-weight
    // contract violation, one REPLAYED item mid-stream
    val shuffled = items.sortBy { case (id, _) => (id * 2654435761L) % 1000003L }
    val cut1 = shuffled.length / 3
    val cut2 = (shuffled.length * 2) / 3
    val b1 = shuffled.slice(0, cut1)
    val b2 = shuffled.slice(cut1, cut2) :+ shuffled.head // replay of an early item
    val b3 = shuffled.slice(cut2, shuffled.length) :+ (shuffled(1)._1, -5L) // bad weight

    val input = MemoryStream[StreamOps.WeightedArrival]
    val q = StreamOps.weightedReservoirState(input.toDS())
      .writeStream.format("memory").queryName("es_res")
      .outputMode("append").start()
    try {
      var prefix = Vector.empty[(Long, Long)]
      var delivered = 0L
      Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
        input.addData(b.map { case (id, w) => StreamOps.WeightedArrival("s", id, w) }: _*)
        q.processAllAvailable()
        // the prefix SET (replays and bad weights excluded)
        prefix ++= b.filter(t => t._2 > 0 && !prefix.contains(t))
        delivered += b.count(_._2 > 0)
        val snap = spark.table("es_res").as[StreamOps.ReservoirSnapshot].collect().last
        assert(snap.sample === refSample(prefix), s"trigger $i sample diverged from batch ES")
        assert(snap.nSeen === delivered, s"trigger $i delivery count")
      }
      val finalSnap = spark.table("es_res").as[StreamOps.ReservoirSnapshot].collect().last
      assert(finalSnap.nDropped === 1L, "the bad-weight arrival must be counted, not silent")
      // the bridge: the final sample's ids equal the served q237 top-k
      val batchIds = graft.queries.ExtQueries.queries("q237_weighted_sample")(spark, sfDir)
        .collect().map(_.getLong(0)).toSet
      val streamIds = finalSnap.sample.split(",").map(_.split(":")(0).toLong).toSet
      assert(streamIds === batchIds,
        "streaming reservoir diverged from the batch q237 selection on the same weights")
    } finally q.stop()
    spark.catalog.clearCache()
  }
}

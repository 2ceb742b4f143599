package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch bridge + replay gates for [[StreamOps.funnelState]] (q106's
  * keyed stateful twin): a time-ordered chopped stream of the events
  * table must emit exactly one stage row per user per stage reached,
  * with distinct-user stage counts equal to q106's rollup — the
  * min-with-strict-inequality funnel chain is prefix-causal under
  * in-order arrival, so bounded per-user state reproduces the batch
  * answer exactly. Plus the disorder discipline: replayed events
  * re-fire nothing. */
class StreamFunnelSpec extends SparkSpec {

  private def corpus() = Tables.events(spark, sfDir)
    .select(col("user_id").cast("string").as("user"),
      unix_micros(col("ts")).as("tsUs"),
      col("event_id").cast("long").as("eventId"),
      col("event_type").as("etype"))
    .orderBy(col("tsUs"), col("eventId"))
    .collect()
    .map(r => StreamOps.FunnelEvent(r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("chopped in-order stream reproduces q106's stage counts; one emission per user per stage") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = corpus()
    val cut1 = evs.length / 3
    val cut2 = 2 * evs.length / 3
    val input = MemoryStream[StreamOps.FunnelEvent]
    val q = StreamOps.funnelState(input.toDS())
      .writeStream.format("memory").queryName("funnel_state")
      .outputMode("append").start()
    try {
      Seq(evs.slice(0, cut1), evs.slice(cut1, cut2), evs.slice(cut2, evs.length))
        .foreach { b => input.addData(b.toSeq: _*); q.processAllAvailable() }
      // replay the middle chunk wholesale: every event is at or before
      // its user's frontier — zero new emissions
      val before = spark.table("funnel_state").count()
      input.addData(evs.slice(cut1, cut2).toSeq: _*)
      q.processAllAvailable()
      assert(spark.table("funnel_state").count() === before,
        "replayed events re-fired funnel stages")

      val stages = spark.table("funnel_state").as[StreamOps.FunnelStage].collect()
      // exactly-once per (user, stage)
      assert(stages.map(s => (s.user, s.stage)).distinct.length === stages.length,
        "duplicate stage emissions")
      val byStage = stages.groupBy(_.stage).view.mapValues(_.map(_.user).distinct.length.toLong)
      val batch = graft.queries.ExtQueries.queries("q106_funnel")(spark, sfDir).head()
      assert(byStage.getOrElse("view", 0L) === batch.getLong(0), "users_viewed diverged")
      assert(byStage.getOrElse("click", 0L) === batch.getLong(1), "users_clicked diverged")
      assert(byStage.getOrElse("purchase", 0L) === batch.getLong(2), "users_purchased diverged")
      assert(batch.getLong(2) > 0, "no purchases — vacuous funnel")
    } finally q.stop()
    spark.catalog.clearCache()
  }
}

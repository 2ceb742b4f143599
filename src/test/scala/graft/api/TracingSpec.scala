package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.SparkSpec
import graft.ml.FraudPipeline
import graft.streaming.ScoringStream
import org.apache.spark.sql.functions._

/** Span capture at the serving boundary + the trace-analytics rollups —
  * structure pins on REAL request-driven spans (nesting, parent links,
  * correlation-id-as-trace-id) and exact arithmetic pins on a
  * deterministic synthetic span table.
  */
class TracingSpec extends SparkSpec {

  test("selfTimeBreakdown: exact exclusive-time arithmetic on synthetic spans") {
    import spark.implicits._
    // trace A: root 0..100, children 10..40 and 50..80 (self 40)
    // trace B: root 0..60, child 0..60 (self 0 — slow only via the child)
    val spans = Seq(
      ("A", "a1", "", "POST /predict", 0L, 100L),
      ("A", "a2", "a1", "score", 10L, 40L),
      ("A", "a3", "a1", "store_read", 50L, 80L),
      ("B", "b1", "", "POST /predict", 0L, 60L),
      ("B", "b2", "b1", "score", 0L, 60L))
      .toDF("trace_id", "span_id", "parent_id", "name", "start_us", "end_us")
    val got = Tracing.selfTimeBreakdown(spans).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(
      ("POST /predict", 2L, 160L, 40L),
      ("score", 2L, 90L, 90L),
      ("store_read", 1L, 30L, 30L)))
    val wf = Tracing.waterfall(spans, "A").collect()
      .map(r => (r.getString(0), r.getInt(3), r.getLong(5))).toSeq
    assert(wf === Seq(("a1", 0, 100L), ("a2", 1, 30L), ("a3", 1, 30L)))
  }

  test("live requests produce one trace per request with nested children") {
    val feats = (0 until 10).map(i => s"f$i")
    val model = FraudPipeline.logisticPipeline(feats, maxIter = 5)
      .fit(FraudPipeline.syntheticEvalSet(spark, 200, seed = 19L))
    val api = new HttpApi(new ScoringService(spark, model, feats,
      new ScoringStream.ResultStore(
        Files.createTempDirectory("graft-trace-store").toString)),
      new Metrics.Registry).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    val client = HttpClient.newHttpClient()
    try {
      val pr = client.send(HttpRequest.newBuilder(URI.create(s"$base/predict"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"transaction_id":"tr-1","features":[2.0,0,0,0,0,0,0,0,0,0]}"""))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(pr.statusCode() === 200)
      val corr = pr.headers().firstValue("X-Correlation-ID").get()
      assert(client.send(
        HttpRequest.newBuilder(URI.create(s"$base/explain/tr-1")).GET().build(),
        HttpResponse.BodyHandlers.ofString()).statusCode() === 200)

      val spans = api.tracer.asDataFrame(spark).cache()
      try {
        // the response's correlation id IS the trace id of a root span
        val root = spans.filter(col("trace_id") === corr && col("parent_id") === "")
          .collect()
        assert(root.length === 1 && root.head.getString(3) === "POST /predict")
        // its child is the score span, nested inside the root interval
        val child = spans.filter(col("trace_id") === corr && col("parent_id") =!= "")
          .collect()
        assert(child.length === 1 && child.head.getString(3) === "score")
        assert(child.head.getString(2) === root.head.getString(1))
        assert(child.head.getLong(4) >= root.head.getLong(4) &&
          child.head.getLong(5) <= root.head.getLong(5),
          "child span must nest inside its parent's interval")
        // the explain request traced too, with its store read as child
        val names = spans.select(col("name")).collect().map(_.getString(0)).toSet
        assert(names.contains("GET /explain/") && names.contains("store_read"))
        // breakdown invariants on real timings: self in [0, total]
        Tracing.selfTimeBreakdown(spans).collect().foreach { r =>
          assert(r.getLong(3) >= 0L && r.getLong(3) <= r.getLong(2),
            s"self time out of range for ${r.getString(0)}")
        }
      } finally spans.unpersist()
    } finally api.stop()
  }

  test("drainTo: cadenced drains partition the spans — no loss, no dupes") {
    val rec = new Tracing.Recorder
    val dir = Files.createTempDirectory("graft-span-sink").toString + "/spans"

    // an absent sink is an empty table, not an error
    assert(Tracing.loadSpans(spark, dir).count() === 0L)

    rec.root("t1", "req") { rec.child("score") { () } }
    rec.root("t2", "req") { () }
    assert(rec.drainTo(spark, dir) === 3L)
    // drained spans left the buffer: a second immediate drain is empty
    assert(rec.drainTo(spark, dir) === 0L)

    rec.root("t3", "req") { () }
    assert(rec.drainTo(spark, dir) === 1L)

    val sunk = Tracing.loadSpans(spark, dir).cache()
    try {
      assert(sunk.count() === 4L)
      assert(sunk.select(col("span_id")).distinct().count() === 4L)
      assert(sunk.select(col("trace_id")).distinct().count() === 3L)
      // the drained table drives the same analytics as a live snapshot
      val byName = Tracing.selfTimeBreakdown(sunk).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(byName === Map("req" -> 3L, "score" -> 1L))
    } finally sunk.unpersist()
  }

  test("drainTo: concurrent recording across drains loses nothing") {
    val rec = new Tracing.Recorder
    val dir = Files.createTempDirectory("graft-span-race").toString + "/spans"
    val nThreads = 8
    val perThread = 50
    val workers = (0 until nThreads).map { t =>
      new Thread(() =>
        (0 until perThread).foreach(i => rec.root(s"t$t-$i", "req") { () }))
    }
    workers.foreach(_.start())
    // drain repeatedly WHILE producers are live — poll() hands each span
    // to exactly one batch
    var drained = 0L
    while (workers.exists(_.isAlive)) drained += rec.drainTo(spark, dir)
    workers.foreach(_.join())
    drained += rec.drainTo(spark, dir) // final sweep after quiescence
    assert(drained === (nThreads * perThread).toLong)
    val sunk = Tracing.loadSpans(spark, dir)
    assert(sunk.count() === (nThreads * perThread).toLong)
    assert(sunk.select(col("span_id")).distinct().count() ===
      (nThreads * perThread).toLong)
  }
}

package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.ml.FraudPipeline
import graft.sources.RunLog
import graft.streaming.ScoringStream
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.functions._

/** The reference's full operational journey as ONE spec — the switch
  * argument in executable form: seeded synthetic data (S12/S13) → two
  * tracked training runs appended to the run-history table (S14, the
  * MLflow lineage) → metric-gated promotion FROM the history table into
  * the registry alias (M10/M11) → the promoted artifact reloaded and
  * served over a live HTTP socket (the FastAPI surface: 200 score, 422
  * arity boundary, explain read-back) → live Prometheus scrapes of the
  * serving registry → the reference's HighErrorRate alert evaluated
  * over the scraped series, firing and resolving at hand-computed
  * instants (ST8). Every stage consumes the previous stage's REAL
  * artifact — the only synthetic element is the clock: scrape snapshots
  * land on a 60 s tick grid, which is how an alert whose `for:` clause
  * spans minutes becomes testable in milliseconds.
  */
class LifecycleSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def post(base: String, path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(base: String, path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("data → tracked fits → gated promotion → HTTP serving → scrape → alert") {
    import spark.implicits._
    val feats = (0 until 10).map(i => s"f$i")
    val dir = Files.createTempDirectory("graft-lifecycle").toString

    // ---- stage 1: data + two tracked runs in the history table
    val data = FraudPipeline.syntheticEvalSet(spark, 600, seed = 77L)
    val Array(train, test) = data.randomSplit(Array(0.8, 0.2), seed = 77L)
    FraudPipeline.fitLogged(train, test, feats, s"$dir/runs", s"$dir/models",
      runId = "run-a", lrMaxIter = 1)
    FraudPipeline.fitLogged(train, test, feats, s"$dir/runs", s"$dir/models",
      runId = "run-b", lrMaxIter = 40)

    // ---- stage 2: promotion is a pure function of the history table
    val (registryMap, promoted) = RunLog.promoteLatest(
      spark, s"$dir/runs", "fraud-detection-ci", Map.empty, "champion",
      threshold = 0.8)
    assert(promoted, "the real fit must clear the AUC gate")
    assert(registryMap("champion").endsWith("run-b"),
      "promotion must bind the alias to the LATEST run's artifact")

    // ---- stage 3: the promoted artifact, reloaded and served live
    val model = PipelineModel.load(registryMap("champion"))
    val metrics = new Metrics.Registry
    val api = new HttpApi(new ScoringService(spark, model, feats,
      new ScoringStream.ResultStore(
        Files.createTempDirectory("graft-lifecycle-store").toString)),
      metrics).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      val ok = post(base, "/predict",
        """{"transaction_id":"lc-t1","features":[3.0,0,0,0,0,0,0,0,0,0]}""")
      assert(ok.statusCode() === 200 && ok.body().contains("\"prediction\":1"))
      assert(get(base, "/explain/lc-t1").statusCode() === 200)

      // ---- stage 4: scrape schedule driving the HighErrorRate alert.
      // One pre-tick 422 seeds the error series (first scrape of a
      // series contributes no delta — the Prometheus increase rule);
      // then 4 bad-arity posts before each of ticks 1..10, idle after.
      // err_inc over [t−299, t] crosses 10 at t=180 (three 4-deltas),
      // island holds ≥300 s at t=480 → fired; last delta at t=600
      // leaves the window after t=720 → resolved at t=780.
      def burst(n: Int): Unit = (1 to n).foreach { _ =>
        assert(post(base, "/predict",
          """{"transaction_id":"lc-bad","features":[1.0]}""").statusCode() === 422)
      }
      burst(1)
      val snapshots = (0L to 13L).map { k =>
        if (k >= 1L && k <= 10L) burst(4)
        metrics.asDataFrame(spark)
          .withColumn("ts", lit(new Timestamp(k * 60L * 1000L)))
          .select(col("ts"), col("metric"), col("labels"), col("value"))
      }
      val series = snapshots.reduce(_ unionByName _)

      // ---- stage 5: the reference rule over the REAL scraped counters
      val events = AlertRules.referenceRules(series)("HighErrorRate")
        .orderBy(col("ts")).collect()
        .map(r => (r.getString(3), r.getTimestamp(2).getTime / 1000L)).toSeq
      assert(events === Seq(("fired", 480L), ("resolved", 780L)),
        s"alert timeline diverged: $events")
    } finally api.stop()
  }
}

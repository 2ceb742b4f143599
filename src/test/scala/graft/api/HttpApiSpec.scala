package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.SparkSpec
import graft.ml.FraudPipeline
import graft.streaming.ScoringStream

/** The reference's API smoke tests (tests/test_api.py) as REAL HTTP calls
  * against a live socket — status 200, predict 200, the 422 arity
  * boundary — plus the correlation-id middleware, the 404/200 explain
  * lifecycle, and the Prometheus exposition, which the reference
  * exercises through its FastAPI TestClient.
  */
class HttpApiSpec extends SparkSpec {

  private lazy val feats = (0 until 10).map(i => s"f$i")
  private lazy val registry = new Metrics.Registry
  private lazy val api: HttpApi = {
    val model = FraudPipeline
      .logisticPipeline(feats, maxIter = 20)
      .fit(FraudPipeline.syntheticEvalSet(spark, 400, seed = 31L))
    val service = new ScoringService(spark, model, feats,
      new ScoringStream.ResultStore(Files.createTempDirectory("graft-http").toString))
    new HttpApi(service, registry).start()
  }
  private lazy val base = s"http://127.0.0.1:${api.boundPort}"
  private val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = {
    api.stop()
    super.afterAll()
  }

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("GET /status answers 200 UP (test_api.py::test_status)") {
    val r = get("/status")
    assert(r.statusCode() === 200)
    assert(r.body().contains("\"status\":\"UP\""))
  }

  test("POST /predict scores a well-formed transaction with 200 (test_api.py::test_predict_minimal)") {
    val r = post("/predict",
      s"""{"transaction_id":"http-t1","features":[3.0,0,0,0,0,0,0,0,0,0]}""")
    assert(r.statusCode() === 200)
    assert(r.body().contains("\"transaction_id\":\"http-t1\""))
    assert(r.body().contains("\"prediction\":1"))
    assert(r.body().contains("\"explanation_status\":\"Calculation queued\""))
  }

  test("POST /predict rejects wrong arity with 422 and a descriptive detail") {
    val r = post("/predict", s"""{"transaction_id":"http-bad","features":[1.0,2.0]}""")
    assert(r.statusCode() === 422)
    assert(r.body().contains("expected 10 features, got 2"))
    // malformed JSON and a missing features array are client errors too
    assert(post("/predict", "{not json").statusCode() === 400)
    assert(post("/predict", """{"transaction_id":"x"}""").statusCode() === 422)
  }

  test("exact endpoints reject prefix-extended paths (no /statusfoo route)") {
    assert(get("/statusfoo").statusCode() === 404)
    assert(get("/healthcheck").statusCode() === 404)
  }

  test("every response carries the correlation-id middleware header") {
    val r = get("/status")
    val corr = r.headers().firstValue("X-Correlation-ID")
    assert(corr.isPresent && corr.get().nonEmpty)
    // ids are per-request, not per-server
    assert(get("/status").headers().firstValue("X-Correlation-ID").get() !== corr.get())
  }

  test("GET /explain/{id} is 404 while pending/unknown, 200 with the stored attribution after predict") {
    assert(get("/explain/never-scored").statusCode() === 404)
    post("/predict", s"""{"transaction_id":"http-t2","features":[-3.0,0,0,0,0,0,0,0,0,0]}""")
    val r = get("/explain/http-t2")
    assert(r.statusCode() === 200)
    assert(r.body().contains("\"transaction_id\":\"http-t2\""))
    assert(r.body().contains("\"shap_values\""))
    assert(r.body().contains("\"feature_names\""))
    assert(r.body().contains("\"created_at\""))
  }

  test("GET /health reports OK with the completion rollup") {
    post("/predict", s"""{"transaction_id":"http-t3","features":[1.0,0,0,0,0,0,0,0,0,0]}""")
    val r = get("/health")
    assert(r.statusCode() === 200)
    assert(r.body().contains("\"status\":\"OK\""))
    assert(r.body().contains("\"model\":\"UP\""))
  }

  test("GET /metrics serves Prometheus exposition with the reference's series") {
    post("/predict", s"""{"transaction_id":"http-t4","features":[1.0,0,0,0,0,0,0,0,0,0]}""")
    val r = get("/metrics")
    assert(r.statusCode() === 200)
    val body = r.body()
    assert(body.contains("predictions_submitted_total "))
    assert(body.contains("api_inference_duration_seconds_count "))
    assert(body.contains("api_inference_duration_seconds_bucket{le="))
    assert(body.contains("""http_requests_total{status="200"}"""))
    assert(body.contains("""http_requests_total{status="422"}"""))
    // the counters agree with the registry the server was built over
    assert(registry.counter("predictions_submitted_total").value >= 4L)
  }
}

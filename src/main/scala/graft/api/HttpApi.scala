package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The reference's HTTP serving boundary over [[ScoringService]]
  * (api/app.py:108-278), JDK-native — `com.sun.net.httpserver` ships with
  * Java 17 and Jackson is already on the Spark classpath, so the library
  * gains a real socket without a single new dependency:
  *
  *  - `GET  /status`        liveness `{"status":"UP"}` (app.py:130-133)
  *  - `GET  /health`        readiness with per-dependency state + the A12
  *                          completion rollup (app.py:135-175)
  *  - `POST /predict`       sync score + async explanation handoff; 422 on
  *                          arity mismatch, exactly the reference's
  *                          validation boundary (app.py:179-260,
  *                          tests/test_api.py)
  *  - `GET  /explain/{id}`  stored attribution row, 404 while pending
  *                          (app.py:262-278)
  *  - `GET  /metrics`       Prometheus text exposition (app.py:288)
  *
  * Every response carries `X-Correlation-ID` — generated per request by a
  * middleware-shaped wrapper around each handler, as the reference's
  * correlation middleware does (app.py:121-128) — and increments
  * `http_requests_total{status}` (the HighErrorRate alert's series,
  * monitoring/alert_rules.yml:4-13).
  *
  * The driver-side service is the scale story: each request is one tiny
  * Spark local job (predict) or one pushed-filter point read (explain).
  * A production deployment would put this server on the driver of a
  * long-lived session, or back [[ScoringService]] with the JDBC store —
  * the HTTP layer is transport only and holds no state of its own.
  */
final class HttpApi(service: ScoringService,
    metrics: Metrics.Registry = Metrics.global, port: Int = 0,
    val tracer: Tracing.Recorder = new Tracing.Recorder) {

  private val mapper = new ObjectMapper
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  // small fixed pool: handlers run Spark driver-side jobs, so concurrency
  // beyond a few requests just queues inside the scheduler anyway
  private val pool = Executors.newFixedThreadPool(4)
  server.setExecutor(pool)

  /** The bound port (ephemeral when constructed with port = 0). */
  def boundPort: Int = server.getAddress.getPort

  def start(): HttpApi = { server.start(); this }
  def stop(): Unit = { server.stop(0); pool.shutdown() }

  // ---- middleware: correlation id + request counter around every handler
  private def handle(path: String)(f: HttpExchange => (Int, String)): Unit =
    server.createContext(path, (ex: HttpExchange) => {
      val corrId = java.util.UUID.randomUUID().toString
      // the correlation id IS the trace id (the logs-to-traces join the
      // reference's middleware + OTel provider set up): one root span
      // per request, children opened by handlers via tracer.child
      val (status, body) =
        tracer.root(corrId, s"${ex.getRequestMethod} $path") {
          try {
            // HttpServer contexts match by prefix: "/predict" would also
            // claim "/predictfoo"; exact endpoints accept only their own
            // path (prefix endpoints like /explain/{id} end in '/')
            val p = ex.getRequestURI.getPath
            if (!path.endsWith("/") && p != path)
              (404, obj("detail" -> s"no route for $p"))
            else f(ex)
          } catch { case e: Throwable => (500, obj("detail" -> e.getMessage)) }
        }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("X-Correlation-ID", corrId)
      ex.getResponseHeaders.set("Content-Type",
        if (path == "/metrics") "text/plain; version=0.0.4" else "application/json")
      metrics.counter("http_requests_total", "status").inc(status.toString)
      ex.sendResponseHeaders(status, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    })

  private def obj(fields: (String, Any)*): String = {
    val node = mapper.createObjectNode()
    fields.foreach {
      case (k, v: String)  => node.put(k, v)
      case (k, v: Int)     => node.put(k, v)
      case (k, v: Long)    => node.put(k, v)
      case (k, v: Double)  => node.put(k, v)
      case (k, v: Boolean) => node.put(k, v)
      case (k, null)       => node.putNull(k)
      case (k, v)          => node.put(k, String.valueOf(v))
    }
    mapper.writeValueAsString(node)
  }

  handle("/status") { _ => (200, obj("status" -> "UP")) }

  handle("/health") { _ =>
    val h = service.health()
    // reference shape: overall status + per-dependency map; our only hard
    // dependency is the loaded model (store-empty is healthy-and-idle)
    val deps = mapper.createObjectNode()
    deps.put("model", if (h.modelLoaded) "UP" else "DOWN")
    deps.put("store", "UP")
    val root = mapper.createObjectNode()
    root.put("status", if (h.modelLoaded) "OK" else "DEGRADED")
    root.set[JsonNode]("dependencies", deps)
    root.put("total", h.total)
    root.put("completed", h.completed)
    (if (h.modelLoaded) 200 else 503, mapper.writeValueAsString(root))
  }

  handle("/predict") { ex =>
    if (ex.getRequestMethod != "POST") (405, obj("detail" -> "POST required"))
    else {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val parsed =
        try Some(mapper.readTree(body)) catch { case _: Exception => None }
      parsed match {
        case None => (400, obj("detail" -> "request body is not valid JSON"))
        case Some(json) if !json.has("features") || !json.get("features").isArray =>
          (422, obj("detail" -> "request must carry a `features` array"))
        case Some(json) =>
          import scala.jdk.CollectionConverters._
          val feats = json.get("features").elements().asScala
            .map(_.asDouble()).toSeq
          val txId =
            if (json.has("transaction_id")) json.get("transaction_id").asText()
            else java.util.UUID.randomUUID().toString
          metrics.counter("predictions_submitted_total").inc()
          metrics.histogram("api_inference_duration_seconds").time {
            tracer.child("score") { service.predict(txId, feats) }
          } match {
            case Left(err) => (422, obj("detail" -> err))
            case Right(p) => (200, obj(
              "transaction_id" -> p.transactionId,
              "prediction" -> p.prediction,
              "score" -> p.score,
              "correlation_id" -> p.correlationId,
              "explanation_status" -> p.message))
          }
      }
    }
  }

  handle("/explain/") { ex =>
    val id = ex.getRequestURI.getPath.stripPrefix("/explain/")
    if (id.isEmpty || id.contains('/'))
      (404, obj("detail" -> "explain requires /explain/{transaction_id}"))
    else tracer.child("store_read") {
      service.explainJson(java.net.URLDecoder.decode(id, "UTF-8"))
    } match {
      case None =>
        (404, obj("detail" ->
          "SHAP explanation not found. Calculation may still be pending."))
      case Some(payload) =>
        // splice the id into the stored payload, reference-shaped
        val node = mapper.readTree(payload).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        node.put("transaction_id", id)
        (200, mapper.writeValueAsString(node))
    }
  }

  handle("/metrics") { _ => (200, metrics.exposition) }
}

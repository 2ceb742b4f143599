package graft.api

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Fires and resolves each reference alert rule from synthetic scrape
  * series — thresholds, lookback windows, and for: durations are the
  * reference's own (alert_rules.yml, fraud-detection-alerts.yml). Every
  * expected event time is hand-computed from the Prometheus semantics
  * (trailing increase window, for:-held islands). 60 s scrape ticks. */
class AlertRulesSpec extends SparkSpec {
  import spark.implicits._

  private def series(rows: Seq[(Long, String, String, Double)]): DataFrame =
    rows.map { case (t, m, l, v) => (new Timestamp(t * 1000L), m, l, v) }
      .toDF("ts", "metric", "labels", "value")

  private def events(df: DataFrame): Seq[(String, Long)] =
    df.orderBy("ts").collect()
      .map(r => (r.getString(3), r.getTimestamp(2).getTime / 1000L)).toSeq

  test("HighErrorRate: 5m error increase > 10 held 5m fires, drain resolves") {
    // 200s: +100/tick forever. 500s: flat 0 through t=300, +5/tick
    // t=360..900, flat after. err_inc crosses 10 at t=480 (3 deltas in
    // window), stays >10 through t=1020, falls to 10 at t=1080.
    val ticks = (0L to 1140L by 60L)
    val s = series(
      ticks.map(t => (t, "http_requests_total", "status=\"200\"", (t / 60 * 100).toDouble)) ++
      ticks.map { t =>
        val v = math.max(0L, math.min(900L, t) / 60 - 5) * 5 // 0 @300, 5 @360 … 50 @900
        (t, "http_requests_total", "status=\"500\"", v.toDouble)
      })
    val got = events(AlertRules.referenceRules(s)("HighErrorRate"))
    assert(got === Seq(("fired", 780L), ("resolved", 1080L)))
  }

  test("CeleryTaskFailures: any failure in 5m held 2m fires, window drain resolves") {
    val ticks = (0L to 960L by 60L)
    val s = series(ticks.map(t =>
      (t, "xai_task_failures_total", "", if (t >= 600L) 1.0 else 0.0)))
    val got = events(AlertRules.referenceRules(s)("CeleryTaskFailures"))
    // failure lands t=600 → pred true through t=840 (5-tick window),
    // for: 2m → fired at t=720; window drains at t=900 → resolved
    assert(got === Seq(("fired", 720L), ("resolved", 900L)))
  }

  test("WorkerQueueBacklog: gauge > 100 held 10m fires, drop resolves") {
    val ticks = (0L to 1020L by 60L)
    val s = series(ticks.map { t =>
      val v = if (t >= 180L && t <= 900L) 150.0 else 50.0
      (t, "redis_list_length", "key=\"celery\"", v)
    })
    val got = events(AlertRules.referenceRules(s)("WorkerQueueBacklog"))
    // true island t=180..900, held 600 s at t=780 → fired; false at 960
    assert(got === Seq(("fired", 780L), ("resolved", 960L)))
  }

  test("MLflowUnavailable: up == 0 held 5m fires, recovery resolves") {
    val ticks = (0L to 780L by 60L)
    val s = series(ticks.map { t =>
      val v = if (t >= 300L && t <= 660L) 0.0 else 1.0
      (t, "up", "job=\"mlflow\"", v)
    })
    val got = events(AlertRules.referenceRules(s)("MLflowUnavailable"))
    assert(got === Seq(("fired", 600L), ("resolved", 720L)))
  }

  test("HighAPILatency: p95 over 5m bucket increases > 500ms held 5m fires") {
    // fast phase: +10/tick in le=0.25; slow phase t=360..900: +10/tick
    // landing in (0.5, 1.0]. p95 jumps to 1.0 the first slow tick
    // (20% > 5% of the window) and stays until the window is all-fast.
    val ticks = (0L to 1260L by 60L)
    def cum(t: Long, fast: Boolean): Double = {
      val fastTicks = (0L to t by 60L).count(x => x <= 300L || x >= 960L)
      val slowTicks = (0L to t by 60L).count(x => x >= 360L && x <= 900L)
      if (fast) fastTicks * 10.0 else slowTicks * 10.0
    }
    val s = series(ticks.flatMap { t =>
      val fast = cum(t, fast = true); val slow = cum(t, fast = false)
      Seq( // cumulative-in-le bucket counts, handler label present
        (t, "http_request_duration_seconds_bucket", "handler=\"/predict\",le=\"0.25\"", fast),
        (t, "http_request_duration_seconds_bucket", "handler=\"/predict\",le=\"0.5\"", fast),
        (t, "http_request_duration_seconds_bucket", "handler=\"/predict\",le=\"1.0\"", fast + slow),
        (t, "http_request_duration_seconds_bucket", "handler=\"/predict\",le=\"+Inf\"", fast + slow))
    })
    val got = events(AlertRules.referenceRules(s)("HighAPILatency"))
    // pred true t=360..1140 (the trailing window keeps p95 at 1.0 until
    // it is ≥95% fast again), held 300 s at t=660 → fired; false at 1200
    assert(got === Seq(("fired", 660L), ("resolved", 1200L)))
  }

  test("/metrics handler label is excluded from the latency rule (reference expr)") {
    // all slow traffic, but ONLY on the /metrics handler → never fires
    val ticks = (0L to 900L by 60L)
    val s = series(ticks.flatMap { t =>
      val n = (t / 60 * 10).toDouble
      Seq(
        (t, "http_request_duration_seconds_bucket", "handler=\"/metrics\",le=\"0.25\"", 0.0),
        (t, "http_request_duration_seconds_bucket", "handler=\"/metrics\",le=\"0.5\"", 0.0),
        (t, "http_request_duration_seconds_bucket", "handler=\"/metrics\",le=\"1.0\"", n),
        (t, "http_request_duration_seconds_bucket", "handler=\"/metrics\",le=\"+Inf\"", n))
    })
    assert(AlertRules.referenceRules(s)("HighAPILatency").isEmpty)
  }

  test("streaming alertState emits the same fired/resolved edges as batch, replay-safe") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamOps
    import graft.streaming.StreamOps.AlertTick
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AlertTick]
    val out = StreamOps.alertState(input.toDS(),
      forSeconds = Map("WorkerQueueBacklog" -> 600L))
    val q = out.toDF("alert", "ts", "event")
      .writeStream.format("memory").queryName("alert_events")
      .outputMode("append").start()
    try {
      def tick(t: Long): AlertTick =
        AlertTick("WorkerQueueBacklog", t, t >= 180L && t <= 900L)
      // same predicate series as the batch backlog test, split across
      // triggers at awkward boundaries
      input.addData((0L to 420L by 60L).map(tick): _*)
      q.processAllAvailable()
      input.addData((480L to 780L by 60L).map(tick): _*)
      q.processAllAvailable()
      // replayed + stale ticks: must not re-fire or double-emit
      input.addData(tick(600L), tick(780L))
      q.processAllAvailable()
      input.addData((840L to 1020L by 60L).map(tick): _*)
      q.processAllAvailable()
      val got = spark.table("alert_events").orderBy("ts").collect()
        .map(r => (r.getString(2), r.getLong(1))).toSeq
      assert(got === Seq(("fired", 780L), ("resolved", 960L)))
    } finally q.stop()
  }

  test("Grafana panels: raw request-rate vector and the p95 duration readout") {
    // 25 XAI observations per tick: 20 land <=0.1s, 24 <=0.5s, all <=+Inf
    // — p95 needs the smallest bucket whose 5m increase covers
    // 0.95 * 25m = 23.75m, i.e. le=0.5 at every tick with traffic
    val ticks = (0L to 300L by 60L)
    val buckets = Seq(("0.1", 20L), ("0.5", 24L), ("+Inf", 25L))
    val s = series(
      ticks.flatMap(t => buckets.map { case (le, per) =>
        (t, "xai_task_duration_seconds_bucket", s"""le="$le"""", (per * t / 60).toDouble)
      }) ++
      ticks.map(t => (t, "http_requests_total", "status=\"200\"", (3 * t / 60).toDouble)))
    val panels = AlertRules.dashboardPanels(s)
    val p95 = panels("xai_task_duration_p95").collect()
      .map(r => (r.getTimestamp(0).getTime / 1000L, r.getDouble(1))).toSeq
    // tick 0 is the first scrape (no delta -> no traffic in window -> no
    // row, the PromQL-NaN outcome); every later tick reads 0.5
    assert(p95 === (60L to 300L by 60L).map(t => (t, 0.5)))
    val rate = panels("api_request_rate").collect()
      .map(r => (r.getTimestamp(0).getTime / 1000L, r.getString(1), r.getDouble(2))).toSeq
    assert(rate === ticks.map(t => (t, "status=\"200\"", (3 * t / 60).toDouble)),
      "the request-rate panel must return the raw instant vector")
    // the rate()-vs-increase() cancellation: scaling every counter by a
    // constant (what dividing by the window does uniformly to the bucket
    // family) cannot move the quantile readout
    val scaled = s.withColumn("value", col("value") * 7.0)
    val p95s = AlertRules.dashboardPanels(scaled)("xai_task_duration_p95").collect()
      .map(r => (r.getTimestamp(0).getTime / 1000L, r.getDouble(1))).toSeq
    assert(p95s === p95, "histogram_quantile must be scale-invariant in the bucket family")
  }

  test("q204: the oracle-gated PromQL evaluation is non-vacuous and folds correctly") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = graft.queries.ExtQueries.queries("q204_promql_eval")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000L,
        r.getLong(2), r.getString(3)))
    // the gate must exercise all three states, or the hash pins nothing
    val states = rows.map(_._4).toSet
    assert(states === Set("inactive", "pending", "firing"),
      s"state space not exercised: $states")
    // driver fold of the full machinery for every series: daily counts ->
    // cumulative -> deltas -> 3-day trailing sum -> threshold -> islands
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
      // epoch seconds derived IN the session (UTC) — java.sql.Date
      // .getTime would re-anchor midnight to the JVM-default zone
      .select(col("event_type"), col("d").cast("timestamp").cast("long"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nDays = daily.map(_._2).distinct.size
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (tpe, ds) =>
      val sorted = ds.sortBy(_._2)
      val thr = 3L * sorted.map(_._3).sum / nDays
      // deltas of the cumulative series = the daily counts themselves,
      // except the FIRST scrape contributes zero (no lookback)
      val deltas = sorted.zipWithIndex.map { case ((_, t, n), i) =>
        (t, if (i == 0) 0L else n)
      }
      val sig = deltas.map { case (t, _) =>
        (t, deltas.filter { case (t2, _) => t2 > t - 259200L && t2 <= t }.map(_._2).sum)
      }
      // islands over the predicate series, held time from the island start
      var islandStart = -1L
      var prevPred = false
      sig.map { case (t, v) =>
        val pred = v > thr
        if (pred != prevPred) islandStart = t
        prevPred = pred
        val state =
          if (!pred) "inactive"
          else if (t - islandStart >= 172800L) "firing" else "pending"
        (tpe, t, v, state)
      }
    }.sortBy(r => (r._1, r._2))
    assert(rows.toSeq === expected, "PromQL fold diverged from the query")
  }
}

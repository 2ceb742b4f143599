package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prometheus alert-rule evaluation over a scraped metrics series — the
  * reference's alerting layer (monitoring/alert_rules.yml:4-14,
  * monitoring/prometheus/rules/fraud-detection-alerts.yml:4-40)
  * re-expressed as DataFrame rollups instead of a PromQL engine.
  *
  * Input is the scrape SERIES: `(ts timestamp, metric string, labels
  * string, value double)` — [[Metrics.Registry.asDataFrame]] rows
  * stamped with their scrape time, one sample per (metric, labels) per
  * tick. Counters are cumulative (the Prometheus model); gauges are
  * instant values.
  *
  * The alert model implemented is Prometheus's: a rule turns the series
  * into a per-tick SIGNAL (`increase` over a lookback window, an
  * instant gauge read, or a `histogram_quantile` over bucket
  * increases), a predicate over the signal marks each tick, and the
  * `for:` duration promotes a predicate run to FIRING only once it has
  * held continuously that long (`pending` before that, `inactive`
  * outside runs). [[transitions]] reduces the state series to the
  * fired/resolved event log an Alertmanager would receive.
  *
  * Scale shape: evaluation frames are TICK-sized (one row per scrape
  * interval per rule — thousands of rows for a day at 15 s), dimension
  * data next to the engine's fact tables, so the global-ordered windows
  * here are deliberate: partitioning a 5 760-row day across 1 000
  * executors would be the anti-pattern. The label-series windows ARE
  * partitioned (by label set) — the only axis with real cardinality.
  */
object AlertRules {

  /** `increase(metric{labelPred}[windowSec])`, summed across matching
    * label series — per series: positive per-tick deltas (a counter
    * RESET contributes the post-reset value, the Prometheus increase
    * semantics), then a trailing range-window sum, then the cross-series
    * sum per tick. Returns (ts, v). */
  def increaseSignal(series: DataFrame, metric: String, windowSec: Long,
      labelPred: Column = lit(true)): DataFrame = {
    val perSeries = Window.partitionBy(col("labels")).orderBy(col("ts"))
    val trailing = Window.partitionBy(col("labels"))
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-(windowSec - 1), Window.currentRow)
    series.filter(col("metric") === metric && labelPred)
      .withColumn("d", col("value") - lag(col("value"), 1).over(perSeries))
      .withColumn("d",
        when(col("d").isNull, lit(0.0))               // first scrape: no lookback
          .when(col("d") < 0, col("value"))           // counter reset
          .otherwise(col("d")))
      .withColumn("inc", sum(col("d")).over(trailing))
      .groupBy(col("ts")).agg(sum(col("inc")).as("v"))
  }

  /** Instant gauge read `metric{labelPred}`, summed across matching
    * series per tick. Returns (ts, v). */
  def gaugeSignal(series: DataFrame, metric: String,
      labelPred: Column = lit(true)): DataFrame =
    series.filter(col("metric") === metric && labelPred)
      .groupBy(col("ts")).agg(sum(col("value")).as("v"))

  /** `histogram_quantile(q, rate(<metric>_bucket[windowSec]))` — bucket
    * increases over the window per `le`, then per tick the smallest
    * bucket bound whose cumulative increase covers quantile q (bucket
    * counts are already cumulative in le, and increase preserves that).
    * Ticks with zero traffic in the window yield no row (PromQL returns
    * NaN there; an absent sample never satisfies a threshold, same
    * outcome). Returns (ts, v) with v the bucket upper bound. */
  def quantileSignal(series: DataFrame, bucketMetric: String, q: Double,
      windowSec: Long, labelPred: Column = lit(true)): DataFrame = {
    val withLe = increaseSignalPerSeries(series, bucketMetric, windowSec, labelPred)
      .withColumn("le_s", regexp_extract(col("labels"), "le=\"([^\"]+)\"", 1))
      .withColumn("le",
        when(col("le_s") === "+Inf", lit(Double.PositiveInfinity))
          .otherwise(col("le_s").cast("double")))
    val totals = withLe.filter(col("le") === Double.PositiveInfinity)
      .select(col("ts"), col("inc").as("total"))
    withLe.join(totals, "ts")
      .filter(col("total") > 0)
      .groupBy(col("ts"))
      .agg(min(when(col("inc") >= lit(q) * col("total"), col("le"))).as("v"))
  }

  /** increase per (ts, labels) — the per-series half of
    * [[increaseSignal]], exposed for bucket-labeled families where the
    * label IS the dimension (and for q204's oracle gate, which
    * cross-checks THIS code path against DuckDB). Returns
    * (ts, labels, inc). */
  private[graft] def increaseSignalPerSeries(series: DataFrame, metric: String,
      windowSec: Long, labelPred: Column): DataFrame = {
    val perSeries = Window.partitionBy(col("labels")).orderBy(col("ts"))
    val trailing = Window.partitionBy(col("labels"))
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-(windowSec - 1), Window.currentRow)
    series.filter(col("metric") === metric && labelPred)
      .withColumn("d", col("value") - lag(col("value"), 1).over(perSeries))
      .withColumn("d",
        when(col("d").isNull, lit(0.0))
          .when(col("d") < 0, col("value"))
          .otherwise(col("d")))
      .select(col("ts"), col("labels"), sum(col("d")).over(trailing).as("inc"))
  }

  /** The `for:` clause — gaps-and-islands over the predicate series:
    * consecutive same-predicate ticks form an island (row_number −
    * per-predicate row_number), and a true-island tick is `firing` once
    * its island has held `forSeconds`, `pending` before. Global windows
    * by design: one row per evaluation tick (scale note above). */
  def withState(signal: DataFrame, pred: Column, forSeconds: Long): DataFrame = {
    val byTs = Window.orderBy(col("ts"))
    val byPredTs = Window.partitionBy(col("p")).orderBy(col("ts"))
    val island = Window.partitionBy(col("p"), col("island"))
    signal
      .withColumn("p", pred)
      .withColumn("island",
        row_number().over(byTs) - row_number().over(byPredTs))
      .withColumn("held",
        col("ts").cast("long") - min(col("ts").cast("long")).over(island))
      .select(col("ts"), col("v"),
        when(!col("p"), lit("inactive"))
          .when(col("held") >= forSeconds, lit("firing"))
          .otherwise(lit("pending")).as("state"))
  }

  /** Fired/resolved event log from a state series — the edge rows an
    * Alertmanager webhook would see. */
  def transitions(states: DataFrame, alert: String, severity: String): DataFrame = {
    val byTs = Window.orderBy(col("ts"))
    states
      .withColumn("was", coalesce(lag(col("state"), 1).over(byTs), lit("inactive")))
      .withColumn("event",
        when(col("state") === "firing" && col("was") =!= "firing", lit("fired"))
          .when(col("state") =!= "firing" && col("was") === "firing", lit("resolved")))
      .filter(col("event").isNotNull)
      .select(lit(alert).as("alert"), lit(severity).as("severity"),
        col("ts"), col("event"), col("v"))
  }

  /** The reference's Grafana dashboard
    * (monitoring/grafana_dashboard.json: "Fraud Detection
    * Observability") as DataFrame rollups over the same scrape series
    * the alert rules read — panel name → panel frame:
    *
    *  - "API Request Rate" (`expr: http_requests_total`): an instant
    *    vector — the raw cumulative counter per (ts, labels), exactly
    *    what the panel plots per series.
    *  - "XAI Task Duration (s)" (`expr: histogram_quantile(0.95,
    *    sum(rate(xai_task_duration_seconds_bucket[5m])) by (le))`):
    *    rate() = increase()/window, and the window factor CANCELS
    *    inside histogram_quantile (every bucket divides by the same
    *    constant, and the quantile compares buckets to q·total), so
    *    [[quantileSignal]] over bucket increases is the identical
    *    readout — the cancellation the spec pins.
    */
  def dashboardPanels(series: DataFrame): Map[String, DataFrame] = Map(
    "api_request_rate" ->
      series.filter(col("metric") === "http_requests_total")
        .select(col("ts"), col("labels"), col("value"))
        .orderBy(col("ts"), col("labels")),
    "xai_task_duration_p95" ->
      quantileSignal(series, "xai_task_duration_seconds_bucket", 0.95, 300L)
        .orderBy(col("ts")))

  /** The five reference rules, wired — alert name → fired/resolved
    * event frame over the given scrape series. Thresholds, windows,
    * and `for:` durations are the reference's own
    * (alert_rules.yml:4-14; fraud-detection-alerts.yml:4-40). */
  def referenceRules(series: DataFrame): Map[String, DataFrame] = Map(
    "HighErrorRate" -> {
      // increase(total[5m]) − increase(status=~"2.."[5m]) > 10, for 5m
      val total = increaseSignal(series, "http_requests_total", 300L)
      val ok = increaseSignal(series, "http_requests_total", 300L,
        col("labels").rlike("status=\"2..\""))
        .withColumnRenamed("v", "ok")
      val errs = total.join(ok, Seq("ts"), "left")
        .select(col("ts"), (col("v") - coalesce(col("ok"), lit(0.0))).as("v"))
      transitions(withState(errs, col("v") > 10, 300L), "HighErrorRate", "critical")
    },
    "CeleryTaskFailures" -> transitions(
      withState(increaseSignal(series, "xai_task_failures_total", 300L),
        col("v") > 0, 120L),
      "CeleryTaskFailures", "warning"),
    "HighAPILatency" -> transitions(
      withState(quantileSignal(series, "http_request_duration_seconds_bucket",
          0.95, 300L, !col("labels").contains("handler=\"/metrics\"")),
        col("v") > 0.5, 300L),
      "HighAPILatency", "warning"),
    "WorkerQueueBacklog" -> transitions(
      withState(gaugeSignal(series, "redis_list_length",
          col("labels").contains("key=\"celery\"")),
        col("v") > 100, 600L),
      "WorkerQueueBacklog", "warning"),
    "MLflowUnavailable" -> transitions(
      withState(gaugeSignal(series, "up", col("labels").contains("job=\"mlflow\"")),
        col("v") === 0, 300L),
      "MLflowUnavailable", "critical"))
}

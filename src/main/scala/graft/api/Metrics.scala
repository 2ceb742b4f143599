package graft.api

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{DoubleAdder, LongAdder}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dependency-free Prometheus-style metrics for the serving and streaming
  * paths (reference api/app.py:66-68 `predictions_submitted_total` /
  * `api_inference_duration_seconds`, xai_tasks.py:48-50
  * `xai_task_duration_seconds` / `xai_task_success_total` /
  * `xai_task_failures_total`, alerted on by monitoring/alert_rules.yml).
  *
  * Two read surfaces:
  *  - [[Registry.exposition]] — Prometheus text exposition format, served
  *    by [[HttpApi]] at GET /metrics exactly as the reference exposes its
  *    Instrumentator endpoint;
  *  - [[Registry.asDataFrame]] — the same samples as a (metric, labels,
  *    value) frame so batch rollups (the A12 completion rollup) can join
  *    operational counters against stored results in one query.
  *
  * Counters are LongAdder-backed (write-contended from HTTP handler
  * threads and the streaming thread concurrently; a CAS-looped AtomicLong
  * serializes exactly the hot increment path). Counting is per-ATTEMPT:
  * a replayed micro-batch increments again, mirroring the reference's
  * Celery counters under acks_late redelivery — the STORE is idempotent,
  * operational metrics deliberately are not (a silent replay storm is
  * precisely what xai_task_failures_total-style alerts must see).
  */
object Metrics {

  final class Counter private[Metrics] (val name: String, registry: Registry) {
    private val adders = new ConcurrentHashMap[String, LongAdder]()
    private def adder(label: String): LongAdder =
      adders.computeIfAbsent(label, _ => new LongAdder)
    def inc(): Unit = adder("").increment()
    def inc(label: String, by: Long = 1L): Unit = adder(label).add(by)
    def value: Long = value("")
    def value(label: String): Long =
      Option(adders.get(label)).map(_.sum()).getOrElse(0L)
    private[Metrics] def samples: Seq[(String, Map[String, String], Double)] = {
      import scala.jdk.CollectionConverters._
      adders.asScala.toSeq.sortBy(_._1).map { case (label, a) =>
        val labels = if (label.isEmpty) Map.empty[String, String]
                     else Map(registry.labelKeyOf(name) -> label)
        (name, labels, a.sum().toDouble)
      }
    }
  }

  /** Fixed-bucket cumulative histogram (the Prometheus model: `le` buckets
    * plus `_sum`/`_count`). Default buckets are latency-shaped around the
    * reference's 500 ms serving SLO. */
  final class Histogram private[Metrics] (val name: String,
      val buckets: Seq[Double]) {
    private val counts = Array.fill(buckets.size + 1)(new LongAdder)
    private val sum = new DoubleAdder
    def observe(seconds: Double): Unit = {
      val i = buckets.indexWhere(seconds <= _)
      counts(if (i < 0) buckets.size else i).increment()
      sum.add(seconds)
    }
    def time[T](f: => T): T = {
      val t0 = System.nanoTime()
      try f finally observe((System.nanoTime() - t0) / 1e9)
    }
    def count: Long = counts.map(_.sum()).sum
    /** Nearest-rank percentile estimate from the cumulative buckets (the
      * value is the bucket upper bound — what a PromQL histogram_quantile
      * would interpolate). NaN on an empty histogram. */
    def percentile(p: Double): Double = {
      val total = count
      if (total == 0) return Double.NaN
      val rank = math.max(1L, math.ceil(p * total).toLong)
      var acc = 0L
      var i = 0
      while (i < buckets.size) {
        acc += counts(i).sum()
        if (acc >= rank) return buckets(i)
        i += 1
      }
      Double.PositiveInfinity
    }
    private[Metrics] def samples: Seq[(String, Map[String, String], Double)] = {
      var acc = 0L
      val bs = buckets.zipWithIndex.map { case (le, i) =>
        acc += counts(i).sum()
        (s"${name}_bucket", Map("le" -> le.toString), acc.toDouble)
      }
      bs ++ Seq(
        (s"${name}_bucket", Map("le" -> "+Inf"), count.toDouble),
        (s"${name}_sum", Map.empty[String, String], sum.sum()),
        (s"${name}_count", Map.empty[String, String], count.toDouble))
    }
  }

  val DefaultBuckets: Seq[Double] =
    Seq(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)

  /** An isolated metric namespace. Serving wires one registry through
    * [[HttpApi]] and [[graft.streaming.ScoringStream.attach]]; tests make
    * fresh registries so assertions never race another suite's traffic. */
  final class Registry {
    private val counters = new ConcurrentHashMap[String, Counter]()
    private val histograms = new ConcurrentHashMap[String, Histogram]()
    // label key per counter family (e.g. http_requests_total{status=…})
    private val labelKeys = new ConcurrentHashMap[String, String]()
    private[Metrics] def labelKeyOf(name: String): String =
      labelKeys.getOrDefault(name, "label")

    def counter(name: String, labelKey: String = "label"): Counter = {
      labelKeys.putIfAbsent(name, labelKey)
      counters.computeIfAbsent(name, n => new Counter(n, this))
    }
    def histogram(name: String, buckets: Seq[Double] = DefaultBuckets): Histogram =
      histograms.computeIfAbsent(name, n => new Histogram(n, buckets))

    private def allSamples: Seq[(String, Map[String, String], Double)] = {
      import scala.jdk.CollectionConverters._
      (counters.asScala.toSeq.sortBy(_._1).flatMap(_._2.samples) ++
        histograms.asScala.toSeq.sortBy(_._1).flatMap(_._2.samples))
    }

    /** Prometheus text exposition format (the GET /metrics body). */
    def exposition: String =
      allSamples.map { case (name, labels, v) =>
        val ls =
          if (labels.isEmpty) ""
          else labels.toSeq.sorted
            .map { case (k, lv) => s"""$k="$lv"""" }.mkString("{", ",", "}")
        // Long-valued samples print without a trailing .0 (Prometheus
        // accepts either; exact integers read better in assertions)
        val vs = if (v.isWhole && v.abs < 1e15) v.toLong.toString else v.toString
        s"$name$ls $vs"
      }.mkString("", "\n", "\n")

    /** The same samples as a frame, joinable against stored results in
      * the completion rollup. Labels flatten to a deterministic
      * `k="v"`-comma string (a map column would make equality joins on
      * the label set order-dependent). */
    def asDataFrame(spark: SparkSession): DataFrame = {
      import spark.implicits._
      allSamples.map { case (name, labels, v) =>
        (name, labels.toSeq.sorted.map { case (k, lv) => s"""$k="$lv"""" }.mkString(","), v)
      }.toDF("metric", "labels", "value")
    }
  }

  /** Process-wide default registry (what `attach`/`HttpApi` use unless a
    * caller passes its own). */
  lazy val global: Registry = new Registry
}

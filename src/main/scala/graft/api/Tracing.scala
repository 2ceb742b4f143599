package graft.api

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed-trace capture and analytics — the engine counterpart of
  * the reference's OpenTelemetry pipeline (api/app.py:15-94 wires a
  * TracerProvider + OTLP span exporter; monitoring/otel-collector-config
  * .yaml routes the spans toward a Jaeger backend). The OTLP transport
  * and the collector are infrastructure, out of a query engine's scope;
  * what IS in scope is the two halves around them: producing span
  * records at the serving boundary, and answering the questions a trace
  * backend exists for — "where did the latency go" — as DataFrame
  * rollups over the span table.
  *
  * The span model is OTel's minimal core: (trace_id, span_id,
  * parent_id, name, start, end), one trace per request with the
  * correlation id as the trace id — so the `X-Correlation-ID` a client
  * already receives IS the handle into the trace table, the
  * logs-to-traces join the reference's middleware sets up.
  *
  * Scale shape: the span table is an ordinary event fact table (a few
  * spans per request), and both rollups are one join + one aggregate
  * keyed on (trace_id, parent link) — shuffle-partitioned on the trace
  * axis, no global windows anywhere.
  */
object Tracing {

  final case class Span(traceId: String, spanId: String, parentId: String,
      name: String, startNanos: Long, endNanos: Long)

  /** In-process span recorder with thread-local trace context — the
    * role the OTel SDK's TracerProvider + BatchSpanProcessor play in
    * the reference. Bounded by traffic; `drain()` hands the buffer to
    * the analytics layer (the exporter seam: a production deployment
    * would drain to a parquet sink on a cadence). */
  final class Recorder {
    private val spans = new ConcurrentLinkedQueue[Span]()
    private val seq = new AtomicLong(0L)
    private val ctx = new ThreadLocal[(String, String)] // (traceId, spanId)

    private def nextId(): String = f"s${seq.incrementAndGet()}%06d"

    /** Run `f` as the root span of trace `traceId`. */
    def root[T](traceId: String, name: String)(f: => T): T =
      in(traceId, parentId = "", name)(f)

    /** Run `f` as a child of the CURRENT thread's active span (a root
      * span of a fresh synthetic trace when none is active — a child
      * must never be silently dropped). */
    def child[T](name: String)(f: => T): T = ctx.get() match {
      case null               => in(s"orphan-${nextId()}", "", name)(f)
      case (traceId, spanId)  => in(traceId, spanId, name)(f)
    }

    private def in[T](traceId: String, parentId: String, name: String)(f: => T): T = {
      val id = nextId()
      val prev = ctx.get()
      ctx.set((traceId, id))
      val t0 = System.nanoTime()
      try f
      finally {
        val t1 = System.nanoTime()
        if (prev == null) ctx.remove() else ctx.set(prev)
        spans.add(Span(traceId, id, parentId, name, t0, t1))
      }
    }

    /** Snapshot the recorded spans as a DataFrame (micros — the OTLP
      * wire unit). */
    def asDataFrame(spark: SparkSession): DataFrame = {
      import spark.implicits._
      import scala.jdk.CollectionConverters._
      spans.iterator().asScala.toSeq
        .map(s => (s.traceId, s.spanId, s.parentId, s.name,
          s.startNanos / 1000L, s.endNanos / 1000L))
        .toDF("trace_id", "span_id", "parent_id", "name",
          "start_us", "end_us")
    }

    def clear(): Unit = spans.clear()

    /** Drain the buffer into a parquet span sink — the exporter seam the
      * reference delegates to the OTel BatchSpanProcessor + collector
      * (api/app.py:15-94 wires the OTLP exporter; the collector batches
      * toward the backend). `poll()` REMOVES as it reads, so a span
      * recorded concurrently with a drain lands in this batch or the
      * next, never both and never nowhere — repeated cadenced drains
      * yield a complete, duplicate-free span table. Each drain is one
      * appended parquet batch (at cluster scale: one file set per
      * cadence tick, compacted like any event fact table). Returns the
      * number of spans exported. */
    def drainTo(spark: SparkSession, dir: String): Long = {
      import spark.implicits._
      val batch = Iterator.continually(spans.poll()).takeWhile(_ != null)
        .map(s => (s.traceId, s.spanId, s.parentId, s.name,
          s.startNanos / 1000L, s.endNanos / 1000L))
        .toSeq
      if (batch.nonEmpty)
        batch.toDF("trace_id", "span_id", "parent_id", "name",
            "start_us", "end_us")
          .write.mode("append").parquet(dir)
      batch.size.toLong
    }
  }

  /** Read a drained span sink back for analytics; an absent or empty
    * sink is an empty span table, not an error (a fresh deployment has
    * no traces yet). */
  def loadSpans(spark: SparkSession, dir: String): DataFrame = {
    val schema = "trace_id string, span_id string, parent_id string, " +
      "name string, start_us long, end_us long"
    if (new java.io.File(dir).exists())
      spark.read.schema(schema).parquet(dir)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  /** Per-operation latency breakdown — the Jaeger "where did the time
    * go" readout: for every span name, the call count, total duration,
    * and EXCLUSIVE (self) time = duration − Σ direct children's
    * durations. Self time is the number that localizes a latency
    * problem (a parent that is slow only because its child is slow has
    * ~zero self time). One child-sum join + one aggregate, keyed on the
    * span/parent link. */
  def selfTimeBreakdown(spans: DataFrame): DataFrame = {
    val dur = spans.withColumn("dur_us", col("end_us") - col("start_us"))
    val childSums = dur.filter(col("parent_id") =!= "")
      .groupBy(col("trace_id").as("c_trace"), col("parent_id").as("c_parent"))
      .agg(sum(col("dur_us")).as("child_us"))
    dur.join(childSums,
        col("trace_id") === col("c_trace") && col("span_id") === col("c_parent"),
        "left")
      .withColumn("self_us", col("dur_us") - coalesce(col("child_us"), lit(0L)))
      .groupBy(col("name"))
      .agg(count(lit(1)).as("n"),
        sum(col("dur_us")).as("total_us"),
        sum(col("self_us")).as("self_us"))
      .orderBy(col("name"))
  }

  /** One trace's spans in waterfall order (start time, depth via the
    * parent link resolved one level — the OTel span tree is one level
    * deep at this serving boundary; a deeper tree would iterate the
    * join, the q169 bounded-round discipline). */
  def waterfall(spans: DataFrame, traceId: String): DataFrame =
    spans.filter(col("trace_id") === traceId)
      .withColumn("depth", when(col("parent_id") === "", 0).otherwise(1))
      .withColumn("dur_us", col("end_us") - col("start_us"))
      .select(col("span_id"), col("parent_id"), col("name"),
        col("depth"), col("start_us"), col("dur_us"))
      .orderBy(col("start_us"), col("span_id"))
}

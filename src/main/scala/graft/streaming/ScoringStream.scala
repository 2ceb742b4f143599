package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The asynchronous scoring/explainability dataflow, Structured-Streaming
  * native (SURVEY §2.9 ST1-ST5, §3.2; reference api/app.py:243-245 →
  * xai_tasks.py:63-166 → transaction_results upsert).
  *
  * Shape: an unbounded stream of (transaction_id, features map) →
  * feature alignment (ordered, 0.0-default — xai_tasks.py:86-90) →
  * linear score + SHAP attribution → idempotent keyed upsert with the
  * PENDING/COMPLETED/FAILED lifecycle.
  *
  * Exactly-once-per-key: the sink writes each micro-batch to a
  * deterministic `batch=<id>` parquet directory with overwrite — a
  * replayed batch (worker death + checkpoint recovery, at-least-once
  * upstream) rewrites the SAME directory, so duplicates cannot
  * accumulate; readers resolve last-writer-wins via the max write
  * stamp per key (`batch_id` column — a monotonic clock shared by the
  * streaming and API paths, replay-stable via an `_stamp` sidecar).
  * This is the Spark-native equivalent of the reference's
  * `INSERT ... ON CONFLICT (transaction_id) DO UPDATE`
  * (api/worker.py:90-99) under Celery `acks_late` redelivery.
  */
object ScoringStream {

  /** Validated/aligned scoring of one micro-batch (also usable in batch
    * mode): rows whose feature map is missing every model feature are
    * FAILED (the 422 arity-check analogue, api/app.py:185-191); others
    * COMPLETED with score + attributions. */
  def scoreBatch(batch: DataFrame, featureNames: Seq[String],
      coefs: Seq[Double], mu: Seq[Double], intercept: Double): DataFrame =
    shapeScored(batch, linearColumn(featureNames, coefs, mu, intercept))

  /** The fused linear score+SHAP kernel as a reusable Column.
    * P3 map-alignment + score + SHAP + validity in ONE fused kernel
    * ([[graft.functions.LinearScoreAttr]]): the composable formulation
    * (per-feature getItem probes, zip_with/aggregate HOF folds, per-row
    * to_json) was the dominant per-trigger cost at 10k-row batches.
    * Built ONCE per model, not per micro-batch: a Column is an immutable
    * expression tree reusable across plans, and rebuilding it per
    * trigger re-runs the Scala→Catalyst literal conversion of every
    * model parameter on the foreachBatch latency path. */
  def linearColumn(featureNames: Seq[String], coefs: Seq[Double],
      mu: Seq[Double], intercept: Double): org.apache.spark.sql.Column =
    call_function("linear_score_attr", col("features"),
      typedLit(featureNames), typedLit(coefs), typedLit(mu), lit(intercept))

  /** [[scoreBatch]] for a promoted GRADIENT-BOOSTED model: identical
    * alignment/validity/lifecycle semantics and an identical output
    * shape (the store and every reader stay model-family-agnostic), but
    * score + attribution come from the fused tree-walk kernel
    * ([[graft.functions.GbtScoreAttr]], Saabas path attribution — exact
    * for a sum of trees). This is the serving path for the model family
    * the reference trains (train_model.py:69-80) but could never
    * explain; with it, [[graft.sources.RunLog.promoteLatest]] can bind
    * the champion alias to q92's weighted GBT and `/explain` still
    * holds its contract. */
  def scoreBatchGbt(batch: DataFrame, featureNames: Seq[String],
      trees: graft.xai.GbtAttr.FlatTrees): DataFrame =
    shapeScored(batch,
      graft.xai.GbtAttr.column(col("features"), featureNames, trees))

  /** Shared output shaping: NULL-map/empty-map rows FAILED (the 422
    * arity analogue), others COMPLETED with score + attribution JSON. */
  private def shapeScored(batch: DataFrame,
      scored: org.apache.spark.sql.Column): DataFrame = {
    // a NULL features map yields a NULL struct: same FAILED outcome as an
    // empty map (coalesce keeps the n_present predicate non-null)
    val absent = coalesce(col("__s.n_present"), lit(0)) === 0
    batch.select(col("transaction_id"), scored.as("__s"))
      .select(
        col("transaction_id"),
        when(absent, lit(null).cast("double"))
          .otherwise(col("__s.score")).as("prediction_score"),
        when(absent, lit(null).cast("string"))
          .otherwise(col("__s.shap_json")).as("shap_values"),
        when(absent, lit("FAILED")).otherwise(lit("COMPLETED")).as("status"),
        current_timestamp().as("updated_at"))
  }

  /** One ordering domain for every writer: strictly-monotonic epoch
    * millis. The streaming path used to order by micro-batch id (0,1,2…)
    * while the API path used wall-clock millis — an API write would then
    * permanently shadow any later streaming re-score of the same key.
    * Both paths now stamp writes from this clock, so last-writer-wins
    * means the latest actual write regardless of which path made it. */
  private val lastStamp = new java.util.concurrent.atomic.AtomicLong(0L)
  def nextWriteStamp(): Long = lastStamp.updateAndGet { prev =>
    math.max(prev + 1, System.currentTimeMillis())
  }

  /** Idempotent keyed result store over per-batch parquet directories.
    *
    * @param maxWritePartitions cap on writer tasks (and parquet files)
    *   per batch dir. A micro-batch inherits the SESSION's parallelism
    *   (a MemoryStream batch arrives in defaultParallelism slices, a
    *   Kafka batch in one per topic-partition), so on a 32-core session
    *   a 100-row batch would otherwise schedule 32 near-empty write
    *   tasks and emit 32 tiny files — per-batch latency then scales
    *   with CORES, not data, and the store ages into the small-files
    *   shape compaction exists to undo. `coalesce` (narrow, no shuffle)
    *   caps that at data-proportional cost; batches with fewer
    *   partitions pass through unchanged. 0 disables the cap.
    *
    *   Default 1 (was 8 through r13, 2 through r15): the r14 latency
    *   decomposition measured the 8-file commit at ~70–150 ms of the
    *   ~350 ms per-trigger p50 on the 500 ms-SLO path — parquet writes
    *   a 10k-row micro-batch in one task faster than the committer can
    *   rename eight — and the r16 A/B (StreamBench, CPUS=32) measured
    *   1 vs 2 writers at −25 to −40 ms p50 on EVERY config (rows10k
    *   p95 723 → 399 ms in the same window): a 10k-row batch is
    *   ~1–2 MB, one writer task commits one file, and the read side
    *   lists half the files per batch dir. Stores that batch far more
    *   rows per trigger should raise it; the 100 TB serving path is
    *   the JDBC keyed upsert ([[graft.sources.JdbcResults]]), not this
    *   directory store. */
  /** Reading a store that was never attached and never written: a
    * typed, catchable state (the caller can't know the schema either,
    * so an empty FRAME is impossible — but the failure must name the
    * store and the fix, not leak a filesystem trace). */
  final class UninitializedStoreException(msg: String)
    extends IllegalStateException(msg)

  final class ResultStore(val path: String,
      val maxWritePartitions: Int = 1) extends Serializable {
    /** ST3: replay-safe — same batchId always lands in the same dir
      * (the label), and a REPLAY reuses the stamp recorded by the first
      * attempt (see [[stampFor]]): a batch replayed after an interleaved
      * API write keeps its ORIGINAL position in the ordering domain
      * instead of resurrecting its stale result above the newer write. */
    def upsert(results: DataFrame, batchId: Long): Unit =
      upsertLabeled(results, batchId.toString, stampFor(batchId.toString))

    /** The stable stamp for a label: first write takes a fresh monotonic
      * stamp and records it in an `_stamp` sidecar inside the batch dir
      * (underscore-prefixed: invisible to parquet listing, like
      * _SUCCESS); a rewrite of the same label finds and reuses it. If a
      * crash lands between the parquet write and the sidecar write, the
      * replay takes a fresh stamp — it rewrites identical content, so
      * ordering is only perturbed for the batch's own payload.
      *
      * The sidecar uses java.nio, so this store's path must be a LOCAL
      * filesystem (the parquet side is FS-agnostic). On a cluster, back
      * the store with a transactional keyed sink (the JDBC upsert in
      * [[graft.sources.JdbcResults]]) instead of directories. */
    private def stampFor(label: String): Long = {
      val p = java.nio.file.Paths.get(path, s"batch=$label", "_stamp")
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.readString(p).trim.toLong
      else compactedStamps.getOrElse(label, nextWriteStamp())
    }

    /** Stamps of batch dirs folded away by [[compact]] (root-level
      * `_stamps` sidecar, one "stamp label" line per folded dir —
      * stamp FIRST so labels containing spaces parse unambiguously). A
      * batch REPLAYED after compaction deleted its directory must still
      * reuse its ORIGINAL stamp — a fresh stamp would outrank the
      * compacted snapshot and resurrect the replay's stale rows, the
      * exact failure the per-dir `_stamp` sidecar exists to prevent.
      *
      * The parsed map is memoized on the file's (size, mtime): stampFor
      * consults this on every first-write label, and re-parsing the
      * whole history per micro-batch would put O(compactions × batches)
      * work on the hot write path. */
    @transient private var stampsMemo: (Long, Long, Map[String, Long]) = null
    private def compactedStamps: Map[String, Long] = {
      val p = java.nio.file.Paths.get(path, "_stamps")
      if (!java.nio.file.Files.exists(p)) Map.empty
      else {
        val size = java.nio.file.Files.size(p)
        val mtime = java.nio.file.Files.getLastModifiedTime(p).toMillis
        val memo = stampsMemo
        if (memo != null && memo._1 == size && memo._2 == mtime) memo._3
        else {
          import scala.jdk.CollectionConverters._
          val m = java.nio.file.Files.readAllLines(p).asScala
            .filter(_.nonEmpty)
            .map { line =>
              val Array(stamp, label) = line.split(" ", 2)
              label -> stamp.toLong
            }.toMap
          stampsMemo = (size, mtime, m)
          m
        }
      }
    }

    /** Label-keyed variant for non-streaming writers (e.g. the API path,
      * one label per transaction): the label must be unique per logical
      * write and stable under retry; `order` breaks last-writer-wins
      * ties in the snapshot.
      *
      * A label permanently identifies ONE logical write: replays of that
      * write reuse its original stamp even after compaction folded the
      * directory away (see [[compactedStamps]]). Reusing a label for
      * genuinely NEW data — e.g. restarting a stream with a wiped
      * checkpoint so batch ids restart at 0 — keeps the OLD write's
      * position in the ordering and the new rows lose last-writer-wins;
      * a new stream incarnation must use a fresh store path. */
    def upsertLabeled(results: DataFrame, label: String, order: Long): Unit = {
      require(!label.contains('\n') && !label.contains('\r'),
        s"batch label must not contain line breaks: ${label.take(40)}")
      val sized =
        if (maxWritePartitions > 0) results.coalesce(maxWritePartitions) else results
      val stamped = sized.withColumn("batch_id", lit(order))
      // schema sidecar BEFORE the data write: a reader racing this very
      // first commit then gets the typed empty frame, never an FNFE
      recordSchema(stamped.schema)
      stamped.write.mode("overwrite").parquet(s"$path/batch=$label")
      // re-record AFTER the write (overwrite wiped the dir)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(path, s"batch=$label", "_stamp"), order.toString)
    }

    /** Records the store's result schema (the exact shape
      * [[upsertLabeled]] writes, batch_id included) in a root
      * `_schema.json` sidecar, write-if-absent. Called by every write
      * AND at stream-attach time (see [[attachScorer]]) so the schema
      * is known BEFORE the first micro-batch commits — the window in
      * which a `GET /explain/{id}` race must read as a typed EMPTY
      * result, not a raw FileNotFoundException (empty-store reads are a
      * real serving state, not an error). */
    def recordSchema(schema: org.apache.spark.sql.types.StructType): Unit = {
      val p = java.nio.file.Paths.get(path, "_schema.json")
      if (!java.nio.file.Files.exists(p)) {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
        java.nio.file.Files.writeString(p, schema.json)
      }
    }

    /** The recorded schema, nullable-normalized to match parquet
      * read-back (a read-back frame reports every field nullable, so an
      * empty frame must too or downstream unions flip schemas between
      * the empty and non-empty states). */
    private def storedSchema: Option[org.apache.spark.sql.types.StructType] = {
      val p = java.nio.file.Paths.get(path, "_schema.json")
      if (!java.nio.file.Files.exists(p)) None
      else Some(org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.DataType
          .fromJson(java.nio.file.Files.readString(p))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
          .fields.map(_.copy(nullable = true))))
    }

    private def hasBatches: Boolean = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(path)
      java.nio.file.Files.exists(root) && {
        val s = java.nio.file.Files.list(root)
        try s.iterator().asScala.exists(_.getFileName.toString.startsWith("batch="))
        finally s.close()
      }
    }

    /** Schema-correct EMPTY frame for the no-committed-batch state: the
      * recorded data schema plus the `batch` string partition column
      * discovery appends on real reads, so empty and non-empty reads
      * are shape-identical. */
    private def emptyTyped(spark: SparkSession): DataFrame = {
      val base = storedSchema.getOrElse(throw new UninitializedStoreException(
        s"ResultStore at $path has no committed batch and no recorded schema — " +
          "attach a stream or upsert once before reading"))
      val withPartCol = org.apache.spark.sql.types.StructType(
        base.fields :+ org.apache.spark.sql.types.StructField(
          "batch", org.apache.spark.sql.types.StringType, nullable = true))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withPartCol)
    }

    /** Keyed point lookup: the same last-writer-wins semantics as
      * [[snapshot]] for ONE key, but the key predicate is pushed into
      * the parquet scan (PushedFilters prunes row groups by the
      * transaction_id statistics) and the per-key winner comes from a
      * TakeOrderedAndProject over the handful of matching rows — no
      * global window over every key the store has ever written, which
      * is what a GET /explain point read must never do at a 100×-scale
      * store. An empty store (stream attached, nothing committed yet)
      * reads as a typed zero-row frame. */
    def keyedLookup(spark: SparkSession, transactionId: String): DataFrame =
      if (!hasBatches) emptyTyped(spark).filter(col("transaction_id") === transactionId)
      else readBatches(spark)
        .filter(col("transaction_id") === transactionId)
        .orderBy(col("batch_id").desc, col("updated_at").desc)
        .limit(1)

    /** All committed batches, with the `batch` partition column pinned
      * to STRING: labels ARE strings (micro-batch ids, API labels,
      * compact's `c<stamp>`), but partition-type INFERENCE reports int
      * while every label happens to be numeric and flips to string the
      * moment the first compacted dir appears — a read-back schema that
      * changes with store maintenance. Pinning makes empty, fresh, and
      * compacted stores shape-identical.
      *
      * Reads the store ROOT (partition discovery finds the batch dirs;
      * the `_stamp(s)`/`_schema.json` sidecars are underscore-hidden to
      * the listing) rather than a `batch=*` glob: Spark's
      * FileStreamSink probe treats an unresolved glob as a literal
      * path and WARN-logs a FileNotFoundException stack trace on every
      * such read — noise that reads like a failure in any serving log. */
    private def readBatches(spark: SparkSession): DataFrame =
      spark.read.option("basePath", path).parquet(path)
        .withColumn("batch", col("batch").cast("string"))

    /** Last-writer-wins current state, one row per transaction_id. An
      * empty store reads as a typed zero-row frame (see
      * [[recordSchema]]), not a FileNotFoundException. */
    def snapshot(spark: SparkSession): DataFrame =
      if (!hasBatches) emptyTyped(spark)
      else {
        val w = Window.partitionBy(col("transaction_id"))
          .orderBy(col("batch_id").desc, col("updated_at").desc)
        readBatches(spark)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }

    /** Compaction: fold every batch directory into ONE batch holding
      * the current last-writer-wins snapshot, then delete the rest. An
      * append-only store otherwise grows one directory per micro-batch
      * forever, and every snapshot/point read pays listing + footer
      * costs proportional to the store's whole history instead of its
      * live key count. Single-writer maintenance op: quiesce writers
      * while it runs (the same contract as any parquet compaction).
      * Replay safety is preserved TWO ways: the compacted batch takes a
      * fresh monotonic stamp (so it outranks everything it folded), and
      * every folded dir's original stamp is recorded in the root
      * `_stamps` sidecar BEFORE deletion (so a batch replayed after its
      * directory is gone still reuses its original stamp via
      * [[stampFor]]/[[compactedStamps]] and correctly loses to the
      * compacted row — without the record, the replay would take a
      * fresh stamp and resurrect its stale rows). */
    def compact(spark: SparkSession): Unit = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(path)
      // dirs captured BEFORE the compacted dir is written, so the new
      // batch=c<stamp> is naturally excluded from folding
      val toFold: Seq[java.nio.file.Path] =
        if (!java.nio.file.Files.exists(root)) Seq.empty
        else {
          val s = java.nio.file.Files.list(root)
          try s.iterator().asScala
            .filter(_.getFileName.toString.startsWith("batch=")).toSeq
          finally s.close()
        }
      if (toFold.isEmpty) return // empty store: nothing to fold, not an error
      // `batch` is the DIRECTORY partition column snapshot() reads back
      // — persisting it as data would collide with the partition column
      // on every post-compaction read (and freeze stale labels into the
      // rows); batch_id is replaced by the fresh stamp
      // Range-partition + sort the folded snapshot by key: each output
      // file (and row group) then carries a NARROW transaction_id
      // min/max span, so keyedLookup's pushed point filter prunes every
      // range but the one holding the key. Written unordered, every row
      // group's stats span the whole key space and a GET /explain point
      // read scans the entire compacted store. No explicit partition
      // count — AQE coalesces the range shuffle to the snapshot's real
      // size, so a small store still compacts to few files.
      val live = snapshot(spark).drop("batch_id", "batch")
        .repartitionByRange(col("transaction_id"))
        .sortWithinPartitions(col("transaction_id"))
      val stamp = nextWriteStamp()
      val label = s"c$stamp"
      // the write action reads the old directories (the glob was
      // resolved when `live` was planned) and lands in a NEW one
      upsertLabeled(live, label, stamp)
      // record folded stamps FIRST (crash between record and delete just
      // leaves a dir whose record agrees with the map), then delete. The
      // authoritative stamp source is the DATA — upsertLabeled writes the
      // stamp into every row's batch_id, so it survives even when a crash
      // between the parquet write and the sidecar write lost the per-dir
      // `_stamp` (skipping such a dir would let its replay take a fresh
      // stamp and resurrect stale rows); the sidecar remains the fallback
      // for zero-row writes, whose parquet carries no rows to read.
      val fromData = readBatches(spark)
        .groupBy(col("batch")).agg(max(col("batch_id")).as("stamp"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val lines = toFold.flatMap { p =>
        val lbl = p.getFileName.toString.stripPrefix("batch=")
        val sp = p.resolve("_stamp")
        val st =
          if (fromData.contains(lbl)) Some(fromData(lbl))
          else if (java.nio.file.Files.exists(sp))
            Some(java.nio.file.Files.readString(sp).trim.toLong)
          else None
        st.map(s => s"$s $lbl")
      }
      if (lines.nonEmpty)
        java.nio.file.Files.writeString(root.resolve("_stamps"),
          lines.mkString("", "\n", "\n"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      toFold.foreach(graft.Fs.deleteRecursively)
    }

    /** A12: the WorkerRecoveryTestPlan completion rollup
      * (docs/WorkerRecoveryTestPlan.md:113-118). */
    def completionRollup(spark: SparkSession): DataFrame =
      snapshot(spark).agg(
        count(lit(1)).as("total"),
        // coalesce: sum over ZERO rows is null, and an empty-but-existing
        // store must read as (0, 0), not NPE in the caller's getLong
        coalesce(sum(when(col("shap_values").isNotNull, 1L).otherwise(0L)), lit(0L))
          .as("completed"))
  }

  /** ST1/ST2: wire a (transaction_id, features) stream through scoring
    * into the store with checkpointed foreachBatch.
    *
    * `compactEvery` > 0 folds the store every that-many micro-batches:
    * an append-only store pays parquet dir listing proportional to its
    * WHOLE batch history on every snapshot/point read, so a long-lived
    * stream must compact periodically or read latency drifts with
    * uptime (StreamBench's `aged` config measures exactly this). Safe
    * here and only here because foreachBatch is the store's single
    * writer and batches are sequential — compact's quiesce contract
    * holds by construction. Replays remain safe: a replayed batch
    * whose dir was folded reuses its recorded stamp (see
    * [[ResultStore.compactedStamps]]).
    *
    * Every trigger is instrumented into `metrics` with the reference
    * worker's own metric names (xai_tasks.py:48-50,
    * monitoring/alert_rules.yml): `xai_task_duration_seconds` (the
    * micro-batch score+write latency histogram), `xai_task_success_total`
    * / `xai_task_failures_total` (per-ATTEMPT — a replayed batch counts
    * again; the store is idempotent, operational metrics deliberately
    * are not), plus `scoring_rows_total{status}` row counts. Row counts
    * ride the write action via [[org.apache.spark.sql.Observation]] —
    * a separate counting job would double the per-trigger latency the
    * histogram exists to watch. */
  def attach(stream: DataFrame, store: ResultStore, checkpointDir: String,
      featureNames: Seq[String], coefs: Seq[Double], mu: Seq[Double],
      intercept: Double, compactEvery: Int = 0,
      metrics: graft.api.Metrics.Registry = graft.api.Metrics.global): StreamingQuery = {
    // hoisted: the kernel Column (and its model-literal conversion) is
    // built once per attach, not once per micro-batch trigger
    val scoredCol = linearColumn(featureNames, coefs, mu, intercept)
    attachScorer(stream, store, checkpointDir,
      shapeScored(_, scoredCol), compactEvery, metrics)
  }

  /** [[attach]] serving a promoted gradient-boosted model: the same
    * lifecycle/metrics/store wiring with the tree-walk kernel
    * ([[scoreBatchGbt]]) in place of the linear one. The model Column —
    * whose construction converts ~6×nodes flat arrays to Catalyst
    * literals — is built ONCE here; per-trigger rebuild was a measurable
    * constant on the 500 ms-SLO path at 100-tree models. */
  def attachGbt(stream: DataFrame, store: ResultStore, checkpointDir: String,
      featureNames: Seq[String], trees: graft.xai.GbtAttr.FlatTrees,
      compactEvery: Int = 0,
      metrics: graft.api.Metrics.Registry = graft.api.Metrics.global): StreamingQuery = {
    val scoredCol = graft.xai.GbtAttr.column(col("features"), featureNames, trees)
    attachScorer(stream, store, checkpointDir,
      shapeScored(_, scoredCol), compactEvery, metrics)
  }

  /** The model-family-agnostic worker loop: any scorer producing the
    * shared (transaction_id, prediction_score, shap_values, status,
    * updated_at) shape rides the same checkpointed, idempotent,
    * metric-instrumented micro-batch path. */
  def attachScorer(stream: DataFrame, store: ResultStore, checkpointDir: String,
      scorer: DataFrame => DataFrame, compactEvery: Int = 0,
      metrics: graft.api.Metrics.Registry = graft.api.Metrics.global): StreamingQuery = {
    // Record the store schema AT ATTACH TIME by planning the scorer over
    // a zero-row frame of the stream's shape: the scorer is plan
    // construction, so this is schema derivation, not execution. Closes
    // the serving race where GET /explain arrives before the first
    // micro-batch ever commits — the store can answer with a typed
    // empty frame instead of a FileNotFoundException.
    val spark = stream.sparkSession
    val probe = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stream.schema)
    store.recordSchema(scorer(probe).withColumn("batch_id", lit(0L)).schema)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        try metrics.histogram("xai_task_duration_seconds").time {
          val obs = org.apache.spark.sql.Observation()
          val scored = scorer(batch)
            .observe(obs, count(lit(1)).as("rows"),
              sum(when(col("status") === "FAILED", 1L).otherwise(0L)).as("failed"))
          store.upsert(scored, batchId)
          val m = obs.get
          val rows = m("rows").asInstanceOf[Long]
          val failed = Option(m("failed")).fold(0L)(_.asInstanceOf[Long])
          metrics.counter("scoring_rows_total", "status").inc("COMPLETED", rows - failed)
          if (failed > 0) metrics.counter("scoring_rows_total", "status").inc("FAILED", failed)
          metrics.counter("xai_task_success_total").inc()
          if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
            store.compact(batch.sparkSession)
        } catch {
          case e: Throwable =>
            metrics.counter("xai_task_failures_total").inc()
            throw e
        }
      }
      .start()
  }
}

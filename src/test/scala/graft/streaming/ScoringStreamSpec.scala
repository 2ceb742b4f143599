package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ScoringStreamSpec extends SparkSpec {
  import spark.implicits._

  private val feats = Seq("f0", "f1", "f2")
  private val coefs = Seq(1.0, -2.0, 0.5)
  private val mu = Seq(0.0, 0.0, 0.0)

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("end-to-end: stream -> score -> attribute -> idempotent store (ST1/ST5)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Map[String, Double])]
    val stream = input.toDF().toDF("transaction_id", "features")
    val store = new ScoringStream.ResultStore(tmp("graft-results"))
    val q = ScoringStream.attach(stream, store, tmp("graft-ckpt"),
      feats, coefs, mu, intercept = 0.1)
    try {
      input.addData(("t1", Map("f0" -> 1.0, "f1" -> 0.5, "f2" -> 2.0)))
      input.addData(("t2", Map("f0" -> 3.0)), // partial: 0.0-default alignment
                    ("t3", Map.empty[String, Double])) // no features -> FAILED
      q.processAllAvailable()
      val snap = store.snapshot(spark).collect().map(r =>
        r.getString(r.fieldIndex("transaction_id")) -> r.getString(r.fieldIndex("status"))).toMap
      assert(snap === Map("t1" -> "COMPLETED", "t2" -> "COMPLETED", "t3" -> "FAILED"))
      val t1 = store.snapshot(spark).filter($"transaction_id" === "t1").head()
      val margin = 0.1 + 1.0 * 1.0 - 2.0 * 0.5 + 0.5 * 2.0
      assert(math.abs(t1.getDouble(t1.fieldIndex("prediction_score"))
        - 1.0 / (1.0 + math.exp(-margin))) < 1e-5)
      assert(t1.getString(t1.fieldIndex("shap_values")).contains("\"f0\""))
    } finally q.stop()
  }

  test("replayed micro-batch does not duplicate results (ST2/ST3)") {
    val store = new ScoringStream.ResultStore(tmp("graft-replay"))
    val batch = Seq(("a", Map("f0" -> 1.0)), ("b", Map("f1" -> 2.0)))
      .toDF("transaction_id", "features")
    val scoredBatch = ScoringStream.scoreBatch(batch, feats, coefs, mu, 0.0)
    store.upsert(scoredBatch, 7L)
    store.upsert(scoredBatch, 7L) // at-least-once redelivery of batch 7
    assert(store.snapshot(spark).count() === 2)
    val rollup = store.completionRollup(spark).head()
    assert(rollup.getLong(0) === 2 && rollup.getLong(1) === 2)
  }

  test("later batch wins per key (last-writer-wins upsert, ST3)") {
    val store = new ScoringStream.ResultStore(tmp("graft-lww"))
    val b1 = Seq(("k", Map("f0" -> 1.0))).toDF("transaction_id", "features")
    val b2 = Seq(("k", Map("f0" -> 9.0))).toDF("transaction_id", "features")
    store.upsert(ScoringStream.scoreBatch(b1, feats, coefs, mu, 0.0), 1L)
    store.upsert(ScoringStream.scoreBatch(b2, feats, coefs, mu, 0.0), 2L)
    val snap = store.snapshot(spark)
    assert(snap.count() === 1)
    val expected = 1.0 / (1.0 + math.exp(-9.0))
    assert(math.abs(snap.head().getDouble(1) - expected) < 1e-5)
  }

  test("streaming re-score after an API-path write wins (one ordering domain)") {
    val store = new ScoringStream.ResultStore(tmp("graft-xdomain"))
    // API-path write (labeled, stamped from the shared clock)
    val apiBatch = Seq(("k", Map("f0" -> 1.0))).toDF("transaction_id", "features")
    store.upsertLabeled(ScoringStream.scoreBatch(apiBatch, feats, coefs, mu, 0.0),
      label = "k", order = ScoringStream.nextWriteStamp())
    // later streaming re-score of the same key, tiny micro-batch id
    val streamBatch = Seq(("k", Map("f0" -> 9.0))).toDF("transaction_id", "features")
    store.upsert(ScoringStream.scoreBatch(streamBatch, feats, coefs, mu, 0.0), batchId = 0L)
    val snap = store.snapshot(spark)
    assert(snap.count() === 1)
    val expected = 1.0 / (1.0 + math.exp(-9.0)) // the LATER (streaming) score
    assert(math.abs(snap.head().getDouble(1) - expected) < 1e-5,
      "streaming write with small batch id must beat the earlier API write")
  }

  test("a replayed batch keeps its original stamp and cannot resurrect over later writes") {
    val store = new ScoringStream.ResultStore(tmp("graft-replaystamp"))
    val orig = Seq(("k", Map("f0" -> 1.0))).toDF("transaction_id", "features")
    store.upsert(ScoringStream.scoreBatch(orig, feats, coefs, mu, 0.0), batchId = 5L)
    // an interleaved, NEWER API write for the same key
    val newer = Seq(("k", Map("f0" -> 9.0))).toDF("transaction_id", "features")
    store.upsertLabeled(ScoringStream.scoreBatch(newer, feats, coefs, mu, 0.0),
      label = "api-k", order = ScoringStream.nextWriteStamp())
    // at-least-once redelivery of batch 5: must reuse its ORIGINAL stamp
    store.upsert(ScoringStream.scoreBatch(orig, feats, coefs, mu, 0.0), batchId = 5L)
    val snap = store.snapshot(spark)
    assert(snap.count() === 1)
    val expected = 1.0 / (1.0 + math.exp(-9.0)) // the newer API score survives
    assert(math.abs(snap.head().getDouble(1) - expected) < 1e-5,
      "replayed batch resurrected its stale result over a later write")
  }

  test("compaction folds the history into one batch, preserving the snapshot") {
    val store = new ScoringStream.ResultStore(tmp("graft-compact"))
    // 5 micro-batches with overlapping keys + one API-path labeled write
    for (b <- 0 until 5) {
      val batch = Seq((s"k${b % 3}", Map("f0" -> (b + 1.0))))
        .toDF("transaction_id", "features")
      store.upsert(ScoringStream.scoreBatch(batch, feats, coefs, mu, 0.0), b.toLong)
    }
    store.upsertLabeled(
      ScoringStream.scoreBatch(Seq(("api", Map("f0" -> 2.0)))
        .toDF("transaction_id", "features"), feats, coefs, mu, 0.0),
      label = "api", order = ScoringStream.nextWriteStamp())
    val before = store.snapshot(spark).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    store.compact(spark)
    val root = new java.io.File(store.path)
    val dirs = root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(dirs.length === 1, s"expected one compacted dir, got ${dirs.map(_.getName).toSeq}")
    val after = store.snapshot(spark).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(after === before, "compaction changed the snapshot")
    // post-compaction writes still win over compacted rows
    val newer = Seq(("k0", Map("f0" -> 9.0))).toDF("transaction_id", "features")
    store.upsert(ScoringStream.scoreBatch(newer, feats, coefs, mu, 0.0), 99L)
    val k0 = store.snapshot(spark).filter($"transaction_id" === "k0").head()
    assert(math.abs(k0.getDouble(1) - 1.0 / (1.0 + math.exp(-9.0))) < 1e-5)
    // the compacted files must not embed the pre-compaction `batch`
    // partition labels as a data column (it would collide with the
    // directory partition column and freeze stale labels into rows)
    val labels = store.snapshot(spark).select("batch").distinct()
      .collect().map(_.getString(0)).toSet
    assert(labels.forall(l => l.startsWith("c") || l == "99"),
      s"stale pre-compaction batch labels leaked into the data: $labels")
  }

  test("compacted snapshot is key-sorted: keyedLookup prunes row groups (scan metrics)") {
    val store = new ScoringStream.ResultStore(tmp("graft-compact-sorted"))
    val n = 1000
    val batch = (0 until n).map(i => (f"k$i%04d", Map("f0" -> i.toDouble)))
      .toDF("transaction_id", "features")
    store.upsert(ScoringStream.scoreBatch(batch, feats, coefs, mu, 0.0), 0L)
    // small files so the compacted snapshot lands in MANY row groups —
    // pruning is invisible when everything fits in one
    withConf("spark.sql.files.maxRecordsPerFile" -> "100") {
      store.compact(spark)
    }
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect() // materialize so the adaptive plan + metrics are final
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum
    }
    val lookup = store.keyedLookup(spark, "k0500")
    assert(lookup.collect().map(_.getString(0)).toSeq === Seq("k0500"))
    val read = scanRows(store.keyedLookup(spark, "k0500"))
    assert(read > 0 && read < n / 2,
      s"point lookup scanned $read of $n rows — compacted row groups are not pruning")
  }

  test("a batch replayed AFTER compaction deleted its dir still loses to newer writes") {
    val store = new ScoringStream.ResultStore(tmp("graft-compact-replay"))
    def score(v: Double) = ScoringStream.scoreBatch(
      Seq(("k", Map("f0" -> v))).toDF("transaction_id", "features"), feats, coefs, mu, 0.0)
    store.upsert(score(1.0), 7L)                 // batch 7: stale value
    store.upsertLabeled(score(9.0), "api-k",     // later API re-score: newer value
      order = ScoringStream.nextWriteStamp())
    store.compact(spark)                          // folds both, deletes batch=7
    store.upsert(score(1.0), 7L)                  // checkpoint replay of batch 7
    val k = store.snapshot(spark).filter($"transaction_id" === "k").head()
    assert(math.abs(k.getDouble(1) - 1.0 / (1.0 + math.exp(-9.0))) < 1e-5,
      "replayed batch resurrected its stale result over the compacted snapshot")
  }

  test("compacting an empty store is a no-op, not an error") {
    val store = new ScoringStream.ResultStore(tmp("graft-compact-empty"))
    store.compact(spark) // must not throw
    store.compact(spark) // idempotent on still-empty store
  }

  test("a folded label containing a space does not corrupt the stamp record") {
    val store = new ScoringStream.ResultStore(tmp("graft-compact-space"))
    def score(v: Double) = ScoringStream.scoreBatch(
      Seq(("k", Map("f0" -> v))).toDF("transaction_id", "features"), feats, coefs, mu, 0.0)
    store.upsertLabeled(score(1.0), "api retry 1", ScoringStream.nextWriteStamp())
    store.compact(spark)
    // parsing the _stamps record must survive the 3-token line: this
    // upsert consults it for the new label before taking a fresh stamp
    store.upsert(score(5.0), 0L)
    val k = store.snapshot(spark).filter($"transaction_id" === "k").head()
    assert(math.abs(k.getDouble(1) - 1.0 / (1.0 + math.exp(-5.0))) < 1e-5)
  }

  test("a batch that lost its _stamp sidecar still folds replay-safely (stamp from data)") {
    val store = new ScoringStream.ResultStore(tmp("graft-compact-nosidecar"))
    def score(v: Double) = ScoringStream.scoreBatch(
      Seq(("k", Map("f0" -> v))).toDF("transaction_id", "features"), feats, coefs, mu, 0.0)
    store.upsert(score(1.0), 7L) // stale
    // simulate the crash window: parquet landed, sidecar write was lost
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(store.path, "batch=7", "_stamp"))
    store.upsertLabeled(score(9.0), "api-k", ScoringStream.nextWriteStamp()) // newer
    store.compact(spark)
    store.upsert(score(1.0), 7L) // checkpoint replay of the sidecar-less batch
    val k = store.snapshot(spark).filter($"transaction_id" === "k").head()
    assert(math.abs(k.getDouble(1) - 1.0 / (1.0 + math.exp(-9.0))) < 1e-5,
      "replay of a sidecar-less folded batch resurrected its stale result")
  }

  test("a fitted PipelineModel scores the stream inside foreachBatch (M5 + ST1)") {
    implicit val sqlCtx = spark.sqlContext
    val eval = graft.ml.FraudPipeline.syntheticEvalSet(spark, 300, seed = 11L)
    val model = graft.ml.FraudPipeline
      .logisticPipeline((0 until 10).map(i => s"f$i"), maxIter = 10).fit(eval)
    val input = MemoryStream[(String, Seq[Double])]
    val stream = input.toDF().toDF("transaction_id", "raw")
    val results = scala.collection.mutable.Map[String, Double]()
    val q = stream.writeStream
      .option("checkpointLocation", tmp("graft-model-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val widened = (0 until 10).foldLeft(batch) { (df, i) =>
          df.withColumn(s"f$i", col("raw").getItem(i))
        }
        graft.ml.FraudPipeline.scoreDF(model, widened)
          .select("transaction_id", "score").collect()
          .foreach(r => results.synchronized {
            results(r.getString(0)) = r.getDouble(1)
          })
      }
      .start()
    try {
      input.addData(("p1", Seq(3.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
                    ("n1", Seq(-3.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)))
      q.processAllAvailable()
      assert(results("p1") > 0.9, s"positive example scored ${results("p1")}")
      assert(results("n1") < 0.1, s"negative example scored ${results("n1")}")
    } finally q.stop()
  }

  test("attach with compactEvery folds history periodically without losing results") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Map[String, Double])]
    val stream = input.toDF().toDF("transaction_id", "features")
    val store = new ScoringStream.ResultStore(tmp("graft-autocompact"))
    val q = ScoringStream.attach(stream, store, tmp("graft-autocompact-ckpt"),
      feats, coefs, mu, intercept = 0.0, compactEvery = 2)
    try {
      for (b <- 0 until 7) {
        input.addData((s"k$b", Map("f0" -> b.toDouble)), ("shared", Map("f0" -> b.toDouble)))
        q.processAllAvailable()
      }
      // 7 batches with compaction every 2: far fewer than 7 dirs remain
      val dirs = new java.io.File(store.path).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      assert(dirs.length < 7, s"auto-compaction never folded: ${dirs.map(_.getName).toSeq}")
      // every key survives, and the overlapping key kept its LAST score
      val snap = store.snapshot(spark)
      assert(snap.count() === 8)
      val shared = snap.filter($"transaction_id" === "shared").head()
      val expected = 1.0 / (1.0 + math.exp(-6.0))
      assert(math.abs(shared.getDouble(1) - expected) < 1e-5,
        "compaction resurrected a stale value for the overlapping key")
    } finally q.stop()
  }

  test("kill-and-restart from the same checkpoint keeps exactly-once-per-key (ST2)") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("graft-ckpt2")
    val store = new ScoringStream.ResultStore(tmp("graft-results2"))
    val input = MemoryStream[(String, Map[String, Double])]
    val stream = input.toDF().toDF("transaction_id", "features")
    val q1 = ScoringStream.attach(stream, store, ckpt, feats, coefs, mu, 0.0)
    input.addData(("x1", Map("f0" -> 1.0)))
    q1.processAllAvailable()
    q1.stop() // simulated worker death (WorkerRecoveryTestPlan.md:42-54)
    input.addData(("x2", Map("f1" -> 1.0)))
    val q2 = ScoringStream.attach(stream, store, ckpt, feats, coefs, mu, 0.0)
    try {
      q2.processAllAvailable()
      // checkpoint continues batch numbering, so the restarted query can
      // never clobber or duplicate earlier batches' results
      val ids = store.snapshot(spark).select("transaction_id").as[String].collect().toSet
      assert(ids === Set("x1", "x2"))
      assert(store.snapshot(spark).groupBy("transaction_id").count()
        .filter($"count" > 1).count() === 0)
    } finally q2.stop()
  }

  test("per-trigger metrics: row counters, FAILED counts, and the duration histogram survive a replay") {
    implicit val sqlCtx = spark.sqlContext
    val registry = new graft.api.Metrics.Registry
    val ckpt = tmp("graft-metrics-ckpt")
    val store = new ScoringStream.ResultStore(tmp("graft-metrics-store"))
    val input = MemoryStream[(String, Map[String, Double])]
    val stream = input.toDF().toDF("transaction_id", "features")

    val q1 = ScoringStream.attach(stream, store, ckpt, feats, coefs, mu, 0.0,
      metrics = registry)
    input.addData(("m1", Map("f0" -> 1.0)), ("m2", Map.empty[String, Double]))
    q1.processAllAvailable()
    q1.stop()
    // worker death after the store write but before the commit log: the
    // restarted query REPLAYS the batch (at-least-once) — delete the
    // commit record so the replay actually happens
    val commits = java.nio.file.Paths.get(ckpt, "commits")
    java.nio.file.Files.list(commits).forEach(p => java.nio.file.Files.delete(p))
    val q2 = ScoringStream.attach(stream, store, ckpt, feats, coefs, mu, 0.0,
      metrics = registry)
    try {
      q2.processAllAvailable()
      val rows = registry.counter("scoring_rows_total", "status")
      // per-ATTEMPT semantics: the replayed batch counts again (the store
      // deduplicates, operational metrics must see the redelivery)
      assert(rows.value("COMPLETED") === 2L)
      assert(rows.value("FAILED") === 2L)
      assert(registry.counter("xai_task_success_total").value === 2L)
      assert(registry.counter("xai_task_failures_total").value === 0L)
      val hist = registry.histogram("xai_task_duration_seconds")
      assert(hist.count === 2L)
      assert(!hist.percentile(0.95).isNaN)
      // ...while the STORE stayed idempotent across the same replay
      assert(store.snapshot(spark).count() === 2L)
      // the DataFrame surface joins against batch rollups (A12)
      val frame = registry.asDataFrame(spark)
      val failedRow = frame
        .filter($"metric" === "scoring_rows_total" && $"labels" === """status="FAILED"""")
        .select("value").as[Double].head()
      assert(failedRow === 2.0)
    } finally q2.stop()
  }

  test("empty store with an ATTACHED stream reads as typed zero-row frames " +
      "(GET /explain racing the first micro-batch — no FileNotFoundException)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Map[String, Double])]
    val stream = input.toDF().toDF("transaction_id", "features")
    val store = new ScoringStream.ResultStore(tmp("graft-empty-attached"))
    val q = ScoringStream.attach(stream, store, tmp("graft-empty-ckpt"),
      feats, coefs, mu, intercept = 0.1)
    try {
      // NO data added: the stream is attached, zero batches committed —
      // the exact serving window the typed empty state exists for
      val snap = store.snapshot(spark)
      assert(snap.count() === 0L)
      // shape-identical to a real read: data cols + batch_id + the
      // `batch` partition column discovery appends
      assert(snap.columns.toSet === Set("transaction_id", "prediction_score",
        "shap_values", "status", "updated_at", "batch_id", "batch"))
      val point = store.keyedLookup(spark, "t-racing")
      assert(point.count() === 0L)
      assert(point.columns.toSet === snap.columns.toSet)
      // rollup over the typed empty frame: (0, 0), not an exception
      val r = store.completionRollup(spark).head()
      assert(r.getLong(0) === 0L && r.getLong(1) === 0L)
      // ...and the same store reads normally once a batch lands
      input.addData(("t1", Map("f0" -> 1.0)))
      q.processAllAvailable()
      assert(store.snapshot(spark).count() === 1L)
      assert(store.keyedLookup(spark, "t1").count() === 1L)
    } finally q.stop()
  }

  test("NEVER-initialized store read is the typed UninitializedStoreException, " +
      "naming the store and the fix") {
    val store = new ScoringStream.ResultStore(tmp("graft-never-init"))
    val e = intercept[ScoringStream.UninitializedStoreException] {
      store.snapshot(spark)
    }
    assert(e.getMessage.contains(store.path))
    assert(e.getMessage.contains("attach a stream or upsert once"))
    intercept[ScoringStream.UninitializedStoreException] {
      store.keyedLookup(spark, "x")
    }
  }

  test("empty-then-nonempty snapshot schemas agree field-for-field " +
      "(empty state unions cleanly with later reads)") {
    val store = new ScoringStream.ResultStore(tmp("graft-schema-parity"))
    val batch = Seq(("a", Map("f0" -> 1.0))).toDF("transaction_id", "features")
    val scored = ScoringStream.scoreBatch(batch, feats, coefs, mu, 0.0)
    // record schema exactly as attach would, read empty, then write
    store.recordSchema(org.apache.spark.sql.types.StructType(
      scored.schema.fields :+ org.apache.spark.sql.types.StructField(
        "batch_id", org.apache.spark.sql.types.LongType, nullable = false)))
    val empty = store.snapshot(spark)
    store.upsert(scored, 0L)
    val full = store.snapshot(spark)
    assert(empty.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      full.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    // nullable-normalized: the empty frame never reports a STRICTER
    // schema than parquet read-back does
    assert(empty.schema.fields.forall(_.nullable))
  }
}

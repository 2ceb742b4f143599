package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming building blocks beyond the scoring path (SURVEY §2.9).
  */
object StreamOps {

  /** ST7: event-time tumbling window aggregation with a watermark —
    * identical semantics to the batch q20 view of the events table;
    * late data beyond the watermark is dropped by the engine. */
  def tumblingCounts(stream: DataFrame, windowLen: String, lateness: String): DataFrame =
    stream
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** ST7: session windows — activity bursts per user separated by a gap. */
  def sessionCounts(stream: DataFrame, gap: String, lateness: String): DataFrame =
    stream
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"), col("n_events"))

  /** S8: the queue source as a file-backed stream — each JSON file under
    * `dir` is one producer message (transaction_id + feature map), read
    * at-least-once with `maxFilesPerTrigger` as the backpressure knob
    * (ST6; the KEDA queue-length analogue, k8s/keda-scaledobject.yaml). */
  def fileQueueSource(spark: SparkSession, dir: String, maxFilesPerTrigger: Int): DataFrame =
    spark.readStream
      .schema(QueueSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** S7: the matching queue producer — one JSON file per message batch. */
  def enqueue(spark: SparkSession, dir: String, msgs: Seq[(String, Map[String, Double])]): Unit = {
    import spark.implicits._
    msgs.toDF("transaction_id", "features")
      .repartition(1).write.mode("append").json(dir)
  }

  /** The queue message schema shared by every queue-source flavour. */
  val QueueSchema = "transaction_id STRING, features MAP<STRING, DOUBLE>"

  /** Decode Kafka-shaped records (binary `value` column, JSON payload)
    * into the queue contract — the transform half of
    * [[kafkaQueueSource]], a plain column expression testable against
    * any frame with a binary `value` (a MemoryStream in the specs; no
    * broker needed). Malformed payloads yield null columns (from_json
    * PERMISSIVE), which the scoring path's arity validation rejects
    * per-row instead of killing the stream. */
  def kafkaQueueDecode(records: DataFrame): DataFrame =
    records
      .select(from_json(col("value").cast("string"),
        org.apache.spark.sql.types.StructType.fromDDL(QueueSchema)).as("m"))
      .select(col("m.transaction_id").as("transaction_id"), col("m.features").as("features"))

  /** S8, Kafka-shaped: the same (transaction_id, features) queue
    * contract as [[fileQueueSource]], over a Kafka topic — config-only
    * wiring (`format("kafka")` resolves the spark-sql-kafka connector
    * from the CLUSTER classpath; this container ships no connector jar).
    * The full socket round-trip — produce → micro-batch source → this
    * decode → score → idempotent upsert, plus checkpointed offset resume
    * and per-trigger admission — IS exercised end-to-end against a real
    * broker socket by [[BrokerSource]]/[[MiniBroker]] (BrokerSourceSpec),
    * which shares this decode and differs only in the wire protocol.
    * `maxOffsetsPerTrigger` is the ST6 backpressure knob — the
    * per-trigger row cap playing the role maxFilesPerTrigger plays for
    * the file queue. */
  def kafkaQueueSource(spark: SparkSession, bootstrapServers: String, topic: String,
      maxOffsetsPerTrigger: Long): DataFrame =
    kafkaQueueDecode(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest") // at-least-once like the file queue
        .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
        .load())

  /** In-stream Gopher quality gate: the q127 batch filter applied at
    * ingest, SAME rule definition ([[graft.llm.TextOps.gopherRules]]) so
    * a document admitted by the stream is exactly the document the
    * batch sweep would keep — a gate that drifts from its batch twin
    * quietly changes the corpus mixture. Scan-shaped column work, no
    * state, no watermark: each micro-batch filters independently.
    * Rejected docs are the caller's concern (compose with a quarantine
    * sink on the inverse predicate if they must be kept). */
  def gopherGate(docs: DataFrame, textCol: String = "text"): DataFrame =
    graft.llm.TextOps.gopherRules(docs, textCol)
      .filter(col("gopher_pass") === 1)

  /** In-stream repetition gate: the q131 batch filter (Gopher A1.2,
    * [[graft.llm.TextOps.repetitionRules]]) applied at ingest — same
    * single rule definition as the batch sweep, stateless scan-shaped
    * per-document array work, so stream admission matches the batch
    * repetition sweep exactly. */
  def repetitionGate(docs: DataFrame, textCol: String = "text"): DataFrame =
    graft.llm.TextOps.repetitionRules(docs, textCol)
      .filter(col("rep_pass") === 1)

  /** The COMPLETE Gopher document gate — A1.1 quality AND A1.2
    * repetition — as one ingest filter (the composition every Gopher-
    * lineage pipeline runs). Admitted documents carry both flag
    * batteries, so a downstream mixture can still re-weight on
    * individual rules without recomputing them. */
  def documentGate(docs: DataFrame, textCol: String = "text"): DataFrame =
    graft.llm.TextOps.repetitionRules(
      graft.llm.TextOps.gopherRules(docs, textCol), textCol)
      .filter(col("gopher_pass") === 1 && col("rep_pass") === 1)

  /** ST3 in-stream variant: exactly-once-per-key emission via
    * dropDuplicates under a watermark — the streaming half of the LLM
    * exact-dedup operator (content fingerprint as the key). State for
    * keys older than the watermark is evicted, which is what bounds
    * dedup state at 100 TB/day ingest. */
  def streamingDedup(stream: DataFrame, keyCol: String, lateness: String): DataFrame =
    stream
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCol)

  /** In-stream contamination gate: the streaming half of the q75 batch
    * decontamination sweep, emitting the QUARANTINE list — doc ids whose
    * shingles hit the eval index ≥ `minShared` times. The eval corpus's
    * rare-shingle hashes are a STATIC index — build it with
    * [[graft.llm.LlmQueries.rareShingleIndex]], which applies BOTH df
    * caps (relative noise gate + absolute quadratic-join guard), so the
    * stream-side join inherits the same stop-shingle blow-up protection
    * as the batch sweep (broadcast if small, shuffled stream-static join
    * otherwise); each arriving doc is exploded to its bigram hashes and
    * joined against it. The stream-static join itself
    * holds no state and re-reads the static side per micro-batch (index
    * refreshes are picked up); the per-doc count keys on (event-time
    * window, doc_id) so the watermark can evict expired windows. */
  def contaminationGate(docs: DataFrame, evalShingles: DataFrame,
      minShared: Int, lateness: String, windowLen: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", lateness)
      .select(col("doc_id"), col("ts"), explode(col("shingle_hashes")).as("h"))
      .join(evalShingles, Seq("h")) // stream-static equi-join on the hash
      // the event-time window in the KEY is what lets the watermark evict
      // a doc's state once its window expires — a bare groupBy(doc_id)
      // would hold one state row per doc ever seen, forever. A doc's
      // shingles all carry its single ts, so the window never splits a
      // doc's count.
      .groupBy(window(col("ts"), windowLen), col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id"), col("n_shared"))

  /** Streaming EMBEDDING near-dup gate — the q57 detector applied at
    * ingest time (the embedding-space twin of [[contaminationGate]]):
    * a STATIC index of [[graft.llm.EmbedLsh]] band keys over the known
    * corpus, probed by each arriving doc's band keys through a
    * stream-static equi-join on (band_id, bkey); candidates verify by
    * exact cosine ≥ `threshold`. Per-row work is stateless projection;
    * the one stateful operator is the windowed per-doc aggregate whose
    * window key the watermark evicts (the contaminationGate state
    * story — no unbounded per-doc state).
    *
    * `n_band_hits` counts (candidate × matching band) — a pair landing
    * in several bands counts once per band. The GATE decision
    * (`max_cos` ≥ threshold — any verified near-dup) is band-count
    * independent; keeping the count band-inflated avoids a second
    * stateful dedup operator in the chain. At scale the index side
    * stays cheap: band keys are 3 small columns and index embeddings
    * join in only for candidate rows. A stream-static join re-evaluates
    * the static plan per micro-batch — pass a CACHED `index` frame so the
    * per-batch cost is the band-key projection, not a re-scan. */
  def embeddingDupGate(docs: DataFrame, index: DataFrame, bits: Int,
      threshold: Double, lateness: String,
      windowLen: String = "10 minutes"): DataFrame =
    embeddingDupGateBanded(docs, dupGateIndex(index, bits), bits,
      threshold, lateness, windowLen)

  /** The gate's static side, as a standalone artifact: band keys joined
    * back to their embeddings — (vec_id, band_id, bkey, idx_emb). Build
    * once over the known corpus, then either cache it for a session
    * gate or persist it ([[saveDupGateIndex]]) so every ingest stream
    * reloads the artifact instead of re-banding 100 TB. */
  def dupGateIndex(index: DataFrame, bits: Int): DataFrame =
    graft.llm.EmbedLsh.bandKeys(index, bits)
      .join(index.select(col("vec_id"), col("emb").as("idx_emb")), Seq("vec_id"))

  /** Persist the gate index: the banded frame partitioned by band_id
    * (probe joins hit a band's files only) plus a 1-row meta artifact
    * carrying `bits` — the probe side must band arrivals at the SAME
    * width or keys never match, so the width travels with the data. */
  def saveDupGateIndex(index: DataFrame, bits: Int, dir: String): Unit = {
    val spark = index.sparkSession
    import spark.implicits._
    dupGateIndex(index, bits).write.mode("overwrite")
      .partitionBy("band_id").parquet(s"$dir/banded")
    Seq(bits).toDF("bits").coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Reload a persisted gate index → (banded frame, band-key width).
    * The banded side resolves through the [[graft.sources.TieredParquet]]
    * state (current base tier ∪ live ingest tier), so a gate loaded in
    * a fresh session deduplicates against every doc
    * [[dupGateIngestSink]] has admitted since the index was built. The
    * frame stays a lazy parquet read; a long-lived stream should cache
    * it so per-batch cost is the probe projection, not a re-scan
    * ([[embeddingDupGateBanded]]'s contract). */
  def loadDupGateIndex(spark: SparkSession, dir: String): (DataFrame, Int) = {
    val bits = spark.read.parquet(s"$dir/meta").head().getInt(0)
    (graft.sources.TieredParquet.loadTiered(spark, dir, "banded",
      applyDeletes = true), bits)
  }

  /** Takedown for the dup-gate index: tombstone `ids` (one `vec_id`
    * column) so the deleted docs stop GATING — a removed document must
    * not keep rejecting future copies of itself (the whole point of
    * removal is that the content is gone; an arriving re-submission is
    * a new editorial decision, not a duplicate of nothing). Logical
    * immediately via [[loadDupGateIndex]]/[[dupGateIngestBatch]]'s
    * delete-aware loads, physical at [[compactDupGateIndex]] — the
    * [[graft.llm.IvfSearch.deleteIds]] discipline on this artifact. */
  def dupGateDelete(spark: SparkSession, dir: String, ids: DataFrame,
      label: String): Unit = {
    require(ids.columns.sameElements(Array("vec_id")),
      s"dup-gate tombstones carry exactly (vec_id), got (${ids.columns.mkString(", ")})")
    graft.sources.TieredParquet.appendDeletes(spark, dir, ids, label)
  }

  /** Self-growing dup gate: admit-or-reject each arriving doc against
    * the persisted gate index AND every previously admitted arrival,
    * then append the admitted docs' band keys to the index's ingest
    * tier — so the gate closes the window a STATIC index leaves open
    * (a new doc is admitted once, but its later duplicates would pass
    * a gate that never learns). Per micro-batch:
    *
    *   1. candidates = banded arrivals ⋈ (base ∪ ingest tier) on
    *      (band_id, bkey), verified by exact `cosine_sim` ≥ threshold
    *      (NaN-guarded — the zero-norm trap);
    *   2. within-batch near-dups resolve FIRST-WINS by id: an arrival
    *      also matching a lower-id arrival in the same batch is
    *      rejected (two copies landing together must not both pass);
    *   3. admitted rows append as `$dir/ingest/batch=<id>`, partitioned
    *      by band_id like the base tier, written idempotently.
    *
    * Replay safety: the batch dir is keyed by batch id and the
    * computation is a deterministic function of the FROZEN artifacts
    * plus EARLIER batch dirs — the reader excludes the batch's own
    * (possibly half-written) directory, so a replay after a crash
    * recomputes identical content instead of self-matching and
    * rejecting everything. Batches folded by [[compactDupGateIndex]]
    * are refused via the `_tier` record (the ivfIngestBatch guard).
    *
    * At scale the per-batch cost is the arrival banding (projection)
    * plus an equi-join that touches only the band partitions the
    * arrivals hash into; the ingest tier stays join-ready because it
    * carries the SAME partitioning as the base. Arrivals must carry
    * (`vec_id`, `emb`) — the banded artifact's id/embedding schema. */
  def dupGateIngestSink(arrivals: DataFrame, indexDir: String,
      checkpointDir: String, threshold: Double): StreamingQuery = {
    val spark = arrivals.sparkSession
    val bits = spark.read.parquet(s"$indexDir/meta").head().getInt(0)
    arrivals.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dupGateIngestBatch(batch, batchId, indexDir, bits, threshold)
      }
      .start()
  }

  /** The per-batch admit-and-append behind [[dupGateIngestSink]],
    * visible so replay semantics are directly testable. */
  def dupGateIngestBatch(batch: DataFrame, batchId: Long, indexDir: String,
      bits: Int, threshold: Double): Unit = {
    import graft.sources.TieredParquet
    val spark = batch.sparkSession
    val label = s"batch=$batchId"
    if (TieredParquet.readState(spark, indexDir, "banded").folded.contains(label))
      return // folded into the base tier; a replay must not resurrect it
    val index = TieredParquet.loadTiered(spark, indexDir, "banded",
      exclude = Set(label), applyDeletes = true)
    val arr = batch.select(col("vec_id"), col("emb"))
    // probe columns renamed up front: the banded index carries its own
    // vec_id/emb, and the within-batch check is a self-join
    val probes = graft.llm.EmbedLsh.bandKeys(arr, bits)
      .join(arr, Seq("vec_id"))
      .select(col("vec_id").as("p_id"), col("band_id"), col("bkey"),
        col("emb").as("p_emb"))
    def verified(cand: DataFrame, leftEmb: String, rightEmb: String) = {
      val cos = call_function("cosine_sim", col(leftEmb), col(rightEmb))
      cand.filter(!isnan(cos) && cos >= threshold)
    }
    // vs the index (base ∪ earlier batches)
    val dupVsIndex = verified(
      probes.join(index, Seq("band_id", "bkey")), "p_emb", "idx_emb")
      .select(col("p_id").as("vec_id"))
    // vs LOWER-ID arrivals in the same batch (first-wins)
    val later = probes.select(col("p_id").as("l_id"), col("band_id"),
      col("bkey"), col("p_emb").as("l_emb"))
    val dupInBatch = verified(
      later.join(probes, Seq("band_id", "bkey"))
        .filter(col("l_id") > col("p_id")),
      "l_emb", "p_emb")
      .select(col("l_id").as("vec_id"))
    val admitted = arr.join(
      dupVsIndex.union(dupInBatch).distinct(), Seq("vec_id"), "left_anti")
    val banded = graft.llm.EmbedLsh.bandKeys(admitted, bits)
      .join(admitted.select(col("vec_id"), col("emb").as("idx_emb")), Seq("vec_id"))
    // an all-rejected (or empty) micro-batch must write NOTHING: a
    // zero-row parquet dir has no footer, and every later load of the
    // ingest tier would die on schema inference against it. Admission
    // is deterministic, so a replay re-derives the same empty set —
    // skipping the write loses nothing; a crashed earlier attempt's
    // partial dir (if any) is removed so it cannot linger either.
    if (banded.isEmpty) {
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(
        s"${TieredParquet.ingestRoot(indexDir)}/$label"))
      return
    }
    banded.write.mode("overwrite").partitionBy("band_id")
      .parquet(s"${TieredParquet.ingestRoot(indexDir)}/$label")
  }

  /** Fold the gate index's ingest tier into its base banded table —
    * [[graft.sources.TieredParquet.compact]] with this artifact's
    * layout (partitioned by band_id, task-local sort by bkey for
    * row-group stats). Single-writer maintenance op: quiesce the
    * ingest stream while it runs. */
  def compactDupGateIndex(spark: SparkSession, dir: String): Boolean =
    graft.sources.TieredParquet.compact(spark, dir, "banded",
      Seq("band_id"), Seq("band_id", "bkey"))

  // ----------------------------------------------- text MinHash dup gate

  /** TEXT near-dup gate index — the MinHash twin of [[dupGateIndex]]
    * for corpora where the duplicate signal is the text itself (the
    * q37 detector's banding, one definition via
    * [[graft.llm.TextOps.minhashBands]]): each known doc's band keys
    * plus its distinct shingle-hash set (`idx_hh`) so candidates
    * verify by EXACT Jaccard, not just a band collision. Banding is
    * planned from the gate's own verify threshold
    * ([[graft.functions.MinHashParams.planBands]] — the S-curve
    * closest-below rule), so the candidate recall matches the θ the
    * gate enforces. */
  def textDupGateIndex(docs: DataFrame, theta: Double): DataFrame = {
    val (bands, _) = graft.functions.MinHashParams.planBands(
      graft.functions.MinHashParams.NumSig, theta)
    docs
      .select(col("doc_id"),
        graft.llm.TextOps.shingleHashes(col("text")).as("idx_hh"),
        explode(graft.llm.TextOps.minhashBands(col("text"), bands)).as("b"))
      .select(col("doc_id"), col("b.band_id"), col("b.bkey"), col("idx_hh"))
  }

  /** Persist the text gate: banded frame partitioned by band_id + a
    * 1-row meta artifact carrying (bands, theta) — probes must band at
    * the same width and verify at the same threshold, so both travel
    * with the data ([[saveDupGateIndex]] discipline). */
  def saveTextDupGateIndex(docs: DataFrame, theta: Double, dir: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (bands, _) = graft.functions.MinHashParams.planBands(
      graft.functions.MinHashParams.NumSig, theta)
    textDupGateIndex(docs, theta).write.mode("overwrite")
      .partitionBy("band_id").parquet(s"$dir/banded")
    Seq((bands, theta)).toDF("bands", "theta").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Reload a persisted text gate → (banded frame, bands, theta);
    * tier-aware and delete-aware like [[loadDupGateIndex]]. */
  def loadTextDupGateIndex(spark: SparkSession, dir: String): (DataFrame, Int, Double) = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    (graft.sources.TieredParquet.loadTiered(spark, dir, "banded",
      applyDeletes = true), meta.getInt(0), meta.getDouble(1))
  }

  /** Takedown for the text gate: tombstone doc ids so removed documents
    * stop gating ([[dupGateDelete]] semantics on this artifact). */
  def textDupGateDelete(spark: SparkSession, dir: String, ids: DataFrame,
      label: String): Unit = {
    require(ids.columns.sameElements(Array("doc_id")),
      s"text-gate tombstones carry exactly (doc_id), got (${ids.columns.mkString(", ")})")
    graft.sources.TieredParquet.appendDeletes(spark, dir, ids, label)
  }

  /** Self-growing TEXT dup gate at ingest — [[dupGateIngestSink]] for
    * documents: admit-or-reject each arriving (doc_id, text) against
    * the persisted gate AND lower-id arrivals in the same micro-batch,
    * then append admitted docs' band keys to the ingest tier. Same
    * replay story: deterministic recompute from frozen artifacts +
    * earlier batch dirs, folded batches refused, all-rejected batches
    * write nothing. */
  def textDupGateIngestSink(arrivals: DataFrame, indexDir: String,
      checkpointDir: String): StreamingQuery = {
    val spark = arrivals.sparkSession
    val meta = spark.read.parquet(s"$indexDir/meta").head()
    val (bands, theta) = (meta.getInt(0), meta.getDouble(1))
    arrivals.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        textDupGateIngestBatch(batch, batchId, indexDir, bands, theta)
      }
      .start()
  }

  /** The per-batch admit-and-append behind [[textDupGateIngestSink]],
    * visible so replay semantics are directly testable. */
  def textDupGateIngestBatch(batch: DataFrame, batchId: Long, indexDir: String,
      bands: Int, theta: Double): Unit = {
    import graft.sources.TieredParquet
    val spark = batch.sparkSession
    val label = s"batch=$batchId"
    if (TieredParquet.readState(spark, indexDir, "banded").folded.contains(label))
      return
    val index = TieredParquet.loadTiered(spark, indexDir, "banded",
      exclude = Set(label), applyDeletes = true)
    val arr = batch.select(col("doc_id"), col("text"))
    val probes = textDupGateIndex(arr, theta)
      .select(col("doc_id").as("p_id"), col("band_id"), col("bkey"),
        col("idx_hh").as("p_hh"))
    def verified(cand: DataFrame, leftHh: String, rightHh: String) = {
      val j = graft.llm.TextOps.jaccard(col(leftHh), col(rightHh))
      cand.filter(!isnan(j) && j >= theta)
    }
    val dupVsIndex = verified(
      probes.join(index, Seq("band_id", "bkey")), "p_hh", "idx_hh")
      .select(col("p_id").as("doc_id"))
    val later = probes.select(col("p_id").as("l_id"), col("band_id"),
      col("bkey"), col("p_hh").as("l_hh"))
    val dupInBatch = verified(
      later.join(probes, Seq("band_id", "bkey"))
        .filter(col("l_id") > col("p_id")),
      "l_hh", "p_hh")
      .select(col("l_id").as("doc_id"))
    val admitted = arr.join(
      dupVsIndex.union(dupInBatch).distinct(), Seq("doc_id"), "left_anti")
    val banded = textDupGateIndex(admitted, theta)
    if (banded.isEmpty) {
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(
        s"${TieredParquet.ingestRoot(indexDir)}/$label"))
      return
    }
    banded.write.mode("overwrite").partitionBy("band_id")
      .parquet(s"${TieredParquet.ingestRoot(indexDir)}/$label")
  }

  /** Fold the text gate's ingest tier into its base —
    * [[compactDupGateIndex]] on this artifact's layout. */
  def compactTextDupGateIndex(spark: SparkSession, dir: String): Boolean =
    graft.sources.TieredParquet.compact(spark, dir, "banded",
      Seq("band_id"), Seq("band_id", "bkey"))

  /** Streaming TEXT near-dup monitor over a prebuilt banded side —
    * [[embeddingDupGateBanded]] with band keys from text MinHash and
    * exact-Jaccard verification: one stream-static equi-join on
    * (band_id, bkey), a windowed per-doc aggregate the watermark
    * evicts, emitting (doc_id, n_band_hits, max_jaccard). Both-empty
    * shingle sets surface NaN from 0/0 and are dropped by the guard —
    * NaN compares GREATER than any threshold under Spark's ordering,
    * so unguarded ≥ would flag every degenerate doc. */
  def textDupGateBanded(docs: DataFrame, banded: DataFrame, bands: Int,
      theta: Double, lateness: String,
      windowLen: String = "10 minutes"): DataFrame = {
    val probes = docs
      .withWatermark("ts", lateness)
      .select(col("doc_id"), col("ts"),
        graft.llm.TextOps.shingleHashes(col("text")).as("hh"),
        explode(graft.llm.TextOps.minhashBands(col("text"), bands)).as("b"))
      .select(col("doc_id"), col("ts"), col("hh"), col("b.band_id"), col("b.bkey"))
    val j = graft.llm.TextOps.jaccard(col("hh"), col("idx_hh"))
    // the index side carries its own doc_id — renamed so the probe's
    // doc_id survives the join unambiguously
    val idx = banded.select(col("band_id"), col("bkey"), col("idx_hh"),
      col("doc_id").as("idx_doc_id"))
    probes.join(idx, Seq("band_id", "bkey")) // stream-static equi-join
      .withColumn("jac", j)
      .filter(!isnan(col("jac")) && col("jac") >= theta)
      .groupBy(window(col("ts"), windowLen), col("doc_id"))
      .agg(count(lit(1)).as("n_band_hits"), max(col("jac")).as("max_jaccard"))
      .select(col("doc_id"), col("n_band_hits"),
        round(col("max_jaccard"), 4).as("max_jaccard"))
  }

  // ------------------------------------------------ streaming PSI drift

  /** Persist the PSI reference distribution: a known-good corpus's
    * token-length histogram over the [[graft.llm.TextOps.lengthBin]]
    * bins — one bounded ([[graft.llm.TextOps.PsiBins]]-row) artifact
    * the streaming monitor loads once at start. The batch monitor
    * (q140) and this stream share the ONE binning definition, so a
    * stream-side alarm fires on exactly the distribution the batch
    * report shows. */
  def savePsiReference(docs: DataFrame, dir: String): Unit =
    docs.select(graft.llm.TextOps.lengthBin(col("text")).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
      .coalesce(1).write.mode("overwrite").parquet(dir)

  /** Streaming PSI drift alarm — q140's metric where drift is actually
    * watched: per event-time window, the arriving docs' token-length
    * histogram against the persisted reference, emitted as
    * (win_start, n_docs, psi_micro). ONE stateful windowed aggregate:
    * chained streaming aggregations are restricted, but the bin count
    * is a constant, so the per-bin counts ride as conditional sums
    * inside the single groupBy(window) and the PSI closes in column
    * arithmetic on the emitted row; the reference rides as literals
    * from the bounded artifact (never a stream-side join). Laplace
    * smoothing and micro-nat flooring match the batch monitor; terms
    * are mathematically ≥ 0, so `psi_micro` ≥ 0. */
  def psiDriftMonitor(docs: DataFrame, refDir: String, lateness: String,
      windowLen: String = "10 minutes"): DataFrame = {
    val spark = docs.sparkSession
    val nBins = graft.llm.TextOps.PsiBins
    val ref = spark.read.parquet(refDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val refN = ref.values.sum
    require(refN > 0, "PSI reference histogram is empty")
    val binned = docs.withWatermark("ts", lateness)
      .select(col("ts"), graft.llm.TextOps.lengthBin(col("text")).as("bin"))
    val counts = (0 until nBins).map(b =>
      sum(when(col("bin") === b, 1L).otherwise(0L)).as(s"c$b"))
    val agg = binned.groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("n_docs"), counts: _*)
    val terms = (0 until nBins).map { b =>
      val p = (col(s"c$b") + 1).cast("double") / (col("n_docs") + nBins)
      val q = lit((ref.getOrElse(b.toLong, 0L) + 1).toDouble / (refN + nBins))
      (p - q) * log(p / q)
    }
    agg.select(col("window.start").as("win_start"), col("n_docs"),
      floor(terms.reduce(_ + _) * 1000000.0).cast("long").as("psi_micro"))
  }

  /** Per-window declarative data-quality metrics — the streaming half
    * of q160's Deequ-style suite (Schelter et al. 2018 run it exactly
    * this way over Kinesis): every check is a row-level predicate; the
    * WHOLE battery rides ONE windowed stateful aggregate as conditional
    * sums (the [[psiDriftMonitor]] discipline — chained streaming
    * aggregates are restricted, a bounded check list makes the long
    * pivot a free post-aggregation projection). Output is one row per
    * (window, check): n_rows, n_ok, and the 4dp metric — the same
    * report shape the batch suite emits, so a completeness drop or a
    * range violation shows up per window instead of per corpus. State
    * is one row per window holding |checks|+1 longs — bounded by the
    * watermark horizon, never by row volume. Checks are named by
    * position internally (`ok_$i`) so display names stay free-form. */
  def dqMonitor(rows: DataFrame, checks: Seq[(String, Column)], lateness: String,
      windowLen: String = "10 minutes"): DataFrame = {
    require(checks.nonEmpty, "dqMonitor needs at least one check")
    val aggs = checks.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(pred, 1L).otherwise(0L)).as(s"ok_$i")
    }
    val agg = rows.withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val entries = checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("check_name"), col(s"ok_$i").as("n_ok"))
    }
    agg.select(col("window.start").as("win_start"), col("n_rows"),
        explode(array(entries: _*)).as("c"))
      .select(col("win_start"), col("c.check_name"), col("n_rows"), col("c.n_ok"),
        (floor(col("c.n_ok").cast("double") / col("n_rows").cast("double")
          * 10000.0 + 0.5) / 10000.0).as("metric"))
  }

  /** The gate over a prebuilt static side ([[dupGateIndex]] /
    * [[loadDupGateIndex]]). Candidate verification is the native
    * codegen'd `cosine_sim` kernel — one fused pass per candidate row;
    * the composed `aggregate(zip_with(...))` folds it replaced are
    * interpreted (HOFs are CodegenFallback) and walked each array three
    * times per row, in a per-event streaming hot path. Zero-norm
    * vectors surface as NaN from the kernel (0/0) and are dropped by
    * the explicit NaN guard — under Spark's ordering NaN compares
    * GREATER than any threshold, so an unguarded `cos >= t` would flag
    * every degenerate vector as a duplicate. */
  def embeddingDupGateBanded(docs: DataFrame, banded: DataFrame, bits: Int,
      threshold: Double, lateness: String,
      windowLen: String = "10 minutes"): DataFrame = {
    val probes = docs
      .withWatermark("ts", lateness)
      .select(col("doc_id"), col("ts"), col("emb"),
        explode(graft.llm.EmbedLsh.bandKeyArray(col("emb"), bits)).as("b"))
      .select(col("doc_id"), col("ts"), col("emb"), col("b.band_id"), col("b.bkey"))
    probes.join(banded, Seq("band_id", "bkey")) // stream-static equi-join
      .withColumn("cos", call_function("cosine_sim", col("emb"), col("idx_emb")))
      .filter(!isnan(col("cos")) && col("cos") >= threshold)
      .groupBy(window(col("ts"), windowLen), col("doc_id"))
      .agg(count(lit(1)).as("n_band_hits"), max(col("cos")).as("max_cos"))
      .select(col("doc_id"), col("n_band_hits"), round(col("max_cos"), 4).as("max_cos"))
  }

  /** Streaming ingest INTO a persisted IVF index ([[graft.llm.IvfSearch
    * .save]]): arrivals are assigned to their inverted list against the
    * LOADED centroids — one metadata-sized artifact read at stream
    * start, no refit, the `assign` half of the build/serve split —
    * optionally PQ-encoded against loaded codebooks (pass
    * [[graft.llm.ProductQuant.load]]'s model so the ADC tier sees new
    * vectors too), and appended to the index's ingest tier as ONE
    * idempotent parquet directory per micro-batch, partitioned by the
    * same `list_bucket` the base corpus uses.
    *
    * Replay safety is the [[graft.streaming.ScoringStream.ResultStore]]
    * discipline: the batch id names the directory and the write is
    * mode-overwrite, so a micro-batch replayed after a crash rewrites
    * IDENTICAL content instead of duplicating rows (assignment and
    * encoding are deterministic functions of frozen artifacts — a
    * replay cannot even diverge semantically). A fresh session then
    * serves base + arrivals via [[graft.llm.IvfSearch.loadServable]]
    * with per-batch partition pruning intact, and the dup gate keeps
    * reading the same artifacts — nothing refits, nothing rebuilds.
    *
    * `arrivals` must carry the SAME id/embedding column names the saved
    * corpus uses (they become the appended rows' schema; unionByName in
    * the loader is what makes mismatches loud, not silent). A base
    * corpus coded with [[graft.llm.ProductQuant.encodeResidual]] takes
    * `residual = true` so arrivals' codes land in the same space, and
    * an OPQ-ROTATED index ([[graft.llm.Opq]] — centers fit and corpus
    * saved in the rotated space) takes `opqDir` so arrivals rotate
    * through the SAME persisted rotation before assignment: an
    * unrotated arrival into a rotated index would land in whatever
    * list the un-rotated geometry suggests and be unreachable by
    * correctly-rotated probes — the cross-space mixing this sink
    * exists to prevent, in a third disguise. */
  def ivfIngestSink(arrivals: DataFrame, indexDir: String, checkpointDir: String,
      embCol: String = "emb",
      pq: Option[graft.llm.ProductQuant.Model] = None,
      residual: Boolean = false,
      opqDir: Option[String] = None): StreamingQuery = {
    val spark = arrivals.sparkSession
    val idx = graft.llm.IvfSearch.load(spark, indexDir)
    val buckets = idx.listBuckets.getOrElse(math.max(1, idx.centers.length))
    // one metadata-sized artifact read at stream start, like the index
    val rotation = opqDir.map(d => graft.llm.Opq.loadRotation(spark, d))
    arrivals.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ivfIngestBatch(batch, batchId, indexDir, idx.centers, buckets, embCol, pq,
          residual, rotation)
      }
      .start()
  }

  /** The per-batch writer behind [[ivfIngestSink]], visible so replay
    * semantics are directly testable (call it twice with one batch id:
    * the second write overwrites the first, row counts unchanged). */
  def ivfIngestBatch(batch: DataFrame, batchId: Long, indexDir: String,
      centers: Seq[Seq[Double]], listBuckets: Int, embCol: String,
      pq: Option[graft.llm.ProductQuant.Model],
      residual: Boolean = false,
      rotation: Option[Seq[Seq[Double]]] = None): Unit = {
    // a micro-batch replayed AFTER compactIngest folded its directory
    // into the base corpus must not resurrect it — the _tier record is
    // authoritative (the ResultStore _stamps discipline); the check is
    // one small-file read per batch, cheap next to the parquet write
    if (graft.llm.IvfSearch.readTierState(batch.sparkSession, indexDir)
        .folded.contains(s"batch=$batchId")) return
    // rotated index ⇒ rotate FIRST, in place: the appended rows'
    // embedding column then lives in the index's own (rotated) space,
    // exactly like the base corpus — assignment, codes, and the exact
    // re-rank column all stay coherent
    val inSpace = rotation match {
      case Some(r) => graft.llm.Opq.rotateWith(batch, embCol, r, embCol)
      case None    => batch
    }
    val assigned = graft.llm.IvfSearch.assign(inSpace, embCol, centers)
    // residual: the arrivals' codes must live in the SAME space as the
    // base corpus's ([[graft.llm.ProductQuant.encodeResidual]]) or the
    // ADC tier would silently mix raw- and residual-space codes
    val coded = pq match {
      case Some(m) if residual =>
        graft.llm.ProductQuant.encodeResidual(assigned, embCol, centers, m)
      case Some(m) => graft.llm.ProductQuant.encode(assigned, embCol, m)
      case None    => assigned
    }
    // an EMPTY micro-batch (idle trigger) must write nothing: a
    // zero-row parquet dir has no footer and poisons every later
    // schema inference over the ingest tier (the dup-gate sink's rule)
    if (batch.isEmpty) {
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(
        s"${graft.llm.IvfSearch.ingestRoot(indexDir)}/batch=$batchId"))
      return
    }
    coded
      .withColumn("list_bucket", graft.llm.IvfSearch.bucketCol(col("cluster"), listBuckets))
      .write.mode("overwrite").partitionBy("list_bucket")
      .parquet(s"${graft.llm.IvfSearch.ingestRoot(indexDir)}/batch=$batchId")
  }

  /** Custom keyed state via mapGroupsWithState (SURVEY §2.9; the
    * engine-level analogue of Celery's per-task attempt bookkeeping,
    * xai_tasks.py:137-163): every (transaction_id, outcome) event updates
    * a state record of attempts; a task goes terminal FAILED once
    * `maxAttempts` failures accumulate, COMPLETED on the first success.
    * State is checkpointed with the query, so attempt counts survive
    * restarts — this is ST4 done with engine-managed state rather than a
    * status column. */
  final case class Attempt(transactionId: String, success: Boolean)
  final case class TaskState(attempts: Int, status: String)

  def statefulAttempts(events: Dataset[Attempt], maxAttempts: Int): Dataset[(String, Int, String)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.transactionId)
      .mapGroupsWithState[TaskState, (String, Int, String)](GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[Attempt], state: GroupState[TaskState]) =>
          var s = state.getOption.getOrElse(TaskState(0, "PENDING"))
          batch.foreach { a =>
            if (s.status == "PENDING") {
              val attempts = s.attempts + 1
              s = if (a.success) TaskState(attempts, "COMPLETED")
              else if (attempts >= maxAttempts) TaskState(attempts, "FAILED")
              else TaskState(attempts, "PENDING")
            }
          }
          state.update(s)
          (key, s.attempts, s.status)
      }
  }

  /** Stream-stream interval join (click→purchase attribution): both
    * sides watermarked, join condition bounded by an event-time interval
    * so the engine can evict state for timestamps the watermark has
    * passed — the only way a stream-stream join holds bounded state at
    * 100 TB/day. Expects (user_id, ts, click_id) vs (user_id, ts,
    * purchase_id, value). */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
      attributionWindow: String, lateness: String): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("click_id"))
      .withWatermark("c_ts", lateness)
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("purchase_id"), col("value"))
      .withWatermark("p_ts", lateness)
    c.join(p, expr(
      s"c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL $attributionWindow"))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("value"), col("c_ts"), col("p_ts"))
  }

  /** flatMapGroupsWithState sessionization: state holds the open session
    * per user; an event-time timeout (watermark-driven) closes it and
    * EMITS the summary — zero-or-more outputs per group per trigger,
    * which is what flatMap (vs map) GroupsWithState exists for. An event
    * arriving after a gap longer than `gapMs` also closes the previous
    * session inline. */
  final case class UserEvent(userId: Long, tsMs: Long)
  final case class SessionState(start: Long, end: Long, n: Int)
  final case class ClosedSession(userId: Long, startMs: Long, endMs: Long, nEvents: Int)

  def flatMapSessions(events: Dataset[UserEvent], gapMs: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", (col("tsMs") / 1000.0).cast("timestamp"))
      .withWatermark("eventTime", "10 seconds")
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(userId, s.start, s.end, s.n))
          } else {
            val times = batch.map(_._2).toSeq.sorted
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed ::= ClosedSession(userId, s.start, s.end, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming corpus-profile maintenance — the ingest half of the
    * q146 artifact ([[graft.llm.MergeProfile]]): every micro-batch
    * appends its own hash-grain profile rows (tiny, 8-byte hashes —
    * never text), and the corpus profile at any moment is ONE
    * aggregation over those rows via `MergeProfile.loadProfile` —
    * which is how a 100 TB ingest pipeline answers "what does the
    * corpus look like now" at interactive cost instead of a re-scan.
    * Expects (`source`, `text`) arrivals; replay-idempotent (the
    * profile is a deterministic function of the batch); empty batches
    * write nothing. */
  def profileSink(docs: DataFrame, dir: String, checkpointDir: String,
      shards: Long, textCol: String = "text"): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.llm.MergeProfile.appendBatch(
          batch.select(col("source"),
            size(graft.llm.TextOps.tokens(col(textCol))).cast("long").as("n_tokens"),
            graft.llm.TextOps.rollingHash(col(textCol)).as("h")),
          batchId, dir, shards)
      }
      .start()

  /** Streaming per-source token-budget admission — the ingest twin of
    * the batch q130 sampler: each source admits arriving documents into
    * its mixture until the source's token budget is exhausted, then
    * closes. Semantics are PREFIX-budget, exactly like q130: the
    * running position advances over EVERY arriving doc (admitted or
    * not), and a doc is admitted iff its own cumulative position still
    * fits — so admission is stable under later arrivals (a doc's
    * verdict never changes because something arrived after it) and the
    * stream's admitted set equals the batch sampler's over the same
    * order. Order within a trigger is doc_id (deterministic across
    * retries); across triggers it is arrival, the streaming analogue
    * of q130's hash order.
    *
    * Scale: state is ONE long per source (bounded by source
    * cardinality, not corpus size), the per-trigger sort is per
    * (source, trigger) micro-batch, and nothing shuffles except the
    * groupByKey on the bounded source key. */
  final case class BudgetDoc(source: String, docId: Long, nTokens: Long)
  final case class BudgetPos(cum: Long)
  final case class AdmittedDoc(source: String, docId: Long, nTokens: Long, cumTokens: Long)

  def budgetGate(docs: Dataset[BudgetDoc], budgetPerSource: Long): Dataset[AdmittedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[BudgetPos, AdmittedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (src: String, batch: Iterator[BudgetDoc], state: GroupState[BudgetPos]) =>
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = Seq.newBuilder[AdmittedDoc]
          batch.toSeq.sortBy(_.docId).foreach { d =>
            cum += d.nTokens
            if (cum <= budgetPerSource) out += AdmittedDoc(src, d.docId, d.nTokens, cum)
          }
          state.update(BudgetPos(cum))
          out.result().iterator
      }
  }

  final case class DailySpend(userId: Long, day: Long, cents: Long)
  final case class EwmaState(s: Long, lastDay: Long)
  final case class EwmaPoint(userId: Long, day: Long, cents: Long, ewmaCents: Long)

  /** Keyed EWMA state at ingest — q166's streaming twin: one
    * (smoothed value, last day) pair of state per user, the α = 1/2
    * integer recurrence s ← (s + x) div 2 applied day by day, so the
    * stream's running smoothed spend is BIT-IDENTICAL to the batch
    * fold over the same daily series (the [[budgetGate]] discipline:
    * in-batch arrival order is not a contract, so each micro-batch
    * sorts its group by day before folding; days at or before the
    * already-folded frontier are dropped rather than silently
    * reordered — a late daily rollup cannot rewrite a fold that
    * downstream consumers already saw). State is two longs per user —
    * bounded by the entity count, never event volume. */
  def ewmaSpendState(daily: Dataset[DailySpend]): Dataset[EwmaPoint] = {
    import daily.sparkSession.implicits._
    daily.groupByKey(_.userId)
      .flatMapGroupsWithState[EwmaState, EwmaPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[DailySpend], state: GroupState[EwmaState]) =>
          var cur = state.getOption.getOrElse(EwmaState(Long.MinValue, Long.MinValue))
          val out = Seq.newBuilder[EwmaPoint]
          batch.toSeq.sortBy(_.day).foreach { d =>
            if (d.day > cur.lastDay) {
              val s = if (cur.lastDay == Long.MinValue) d.cents
                      else (cur.s + d.cents) / 2
              cur = EwmaState(s, d.day)
              out += EwmaPoint(user, d.day, d.cents, s)
            }
          }
          state.update(cur)
          out.result().iterator
      }
  }

  final case class DailyRevenue(eventType: String, day: Long, y: Long)
  final case class CusumState(p: Long, minP: Long, lastDay: Long)
  final case class CusumPoint(eventType: String, day: Long, y: Long,
    s: Long, alarm: Boolean)

  /** q173's keyed streaming twin: CUSUM drift detection over per-series
    * daily totals, with the batch-fit (target, threshold) pair passed in
    * as a bounded reference map — a streaming detector cannot know the
    * full-series mean, so production CUSUM runs against a trained
    * baseline exactly like the PSI monitor runs against its persisted
    * reference. State per series is THREE longs (prefix sum, running
    * prefix min, day frontier) maintained by the same closed form the
    * batch windows compute — S = P − min(0, min prefix P) — so a day's
    * emitted S is bit-identical to the batch column when the targets
    * match. Arrival order is not a contract: each micro-batch sorts its
    * group by day, and days at or before the folded frontier are refused
    * (the ewmaSpendState discipline) rather than silently reordered —
    * CUSUM is order-sensitive, a late day would rewrite history
    * downstream consumers already alarmed on. Series with no entry in
    * the reference map are refused loudly: scoring against a default
    * target would silently mask drift. */
  def cusumState(daily: Dataset[DailyRevenue], targets: Map[String, (Long, Long)])
      : Dataset[CusumPoint] = {
    import daily.sparkSession.implicits._
    daily.groupByKey(_.eventType)
      .flatMapGroupsWithState[CusumState, CusumPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (et: String, batch: Iterator[DailyRevenue], state: GroupState[CusumState]) =>
          val (target, h) = targets.getOrElse(et,
            throw new IllegalArgumentException(
              s"no CUSUM reference (target, threshold) for series '$et'"))
          var cur = state.getOption.getOrElse(CusumState(0L, 0L, Long.MinValue))
          val out = Seq.newBuilder[CusumPoint]
          batch.toSeq.sortBy(_.day).foreach { d =>
            if (d.day > cur.lastDay) {
              val p = cur.p + (d.y - target)
              val minP = math.min(cur.minP, p)
              cur = CusumState(p, minP, d.day)
              val s = p - math.min(0L, minP)
              out += CusumPoint(et, d.day, d.y, s, s > h)
            }
          }
          state.update(cur)
          out.result().iterator
      }
  }

  final case class TokenArrival(source: String, token: String)
  final case class MgSnapshot(source: String, nSeen: Long, counters: String)

  /** q183's keyed streaming twin: a per-source Misra–Gries heavy-hitter
    * monitor. State per source is the ≤k-counter MG buffer plus the
    * stream length — O(k) regardless of volume, the whole point of the
    * sketch as STREAM state (an exact top-K would grow with the
    * vocabulary). Each micro-batch folds its tokens through the same
    * [[graft.functions.MisraGries]] reduce the batch aggregate uses, so
    * the theorems (containment of items with freq > n/(k+1), undercount
    * ≤ n/(k+1)) hold for the whole PREFIX of the stream at every
    * trigger — MG is order-robust, which is why no in-batch sort is
    * needed (contrast [[ewmaSpendState]]/[[cusumState]], whose folds are
    * order-SENSITIVE and must refuse disorder). Counter values remain
    * arrival-dependent: consumers gate on the guarantees (the q183
    * oracle discipline), and the snapshot serializes counters in a
    * canonical (count desc, token) order for stable downstream diffs. */
  def heavyHittersState(toks: Dataset[TokenArrival], k: Int): Dataset[MgSnapshot] = {
    import toks.sparkSession.implicits._
    val agg = new graft.functions.MisraGries(k)
    toks.groupByKey(_.source)
      .flatMapGroupsWithState[(Array[(String, Long)], Long), MgSnapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (src: String, batch: Iterator[TokenArrival],
         state: GroupState[(Array[(String, Long)], Long)]) =>
          var (buf, n) = state.getOption.getOrElse((agg.zero, 0L))
          batch.foreach { t => buf = agg.reduce(buf, t.token); n += 1 }
          state.update((buf, n))
          val canonical = agg.finish(buf)
            .map { case (t, c) => s"$t:$c" }.mkString(",")
          Iterator(MgSnapshot(src, n, canonical))
      }
  }

  final case class KeyArrival(scope: String, key: String)
  final case class HllSnapshot(scope: String, nSeen: Long, regsUsed: Long,
      sumRank: Long, maxRank: Long, denom: Long, estMicro: Long)

  /** q211's keyed streaming twin: a per-scope HyperLogLog distinct-count
    * monitor (unique users per source, unique cards per merchant — the
    * cardinality half of the [[heavyHittersState]] pair). State per
    * scope is the 256-register vector plus the arrival count — O(m)
    * forever, the whole point of the sketch as STREAM state (exact
    * distinct state grows with the key universe). Each micro-batch
    * folds its keys through the same [[graft.functions.Hll]] arithmetic
    * the batch query's engines share, so every trigger's snapshot is
    * the exact sketch of the whole stream PREFIX. Max-merge register
    * algebra makes the fold order-robust AND replay-idempotent: unlike
    * [[ewmaSpendState]]/[[cusumState]] (order-sensitive, must refuse
    * disorder) and like [[heavyHittersState]], no in-batch sort or
    * frontier is needed — a re-delivered key max-merges to a no-op, so
    * at-least-once delivery is safe by algebra, not by bookkeeping
    * (nSeen counts arrivals, not distincts, and is diagnostic only). */
  def distinctSketchState(keys: Dataset[KeyArrival]): Dataset[HllSnapshot] = {
    import keys.sparkSession.implicits._
    keys.groupByKey(_.scope)
      .flatMapGroupsWithState[(Array[Long], Long), HllSnapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (scope: String, batch: Iterator[KeyArrival],
         state: GroupState[(Array[Long], Long)]) =>
          var (regs, n) = state.getOption.getOrElse((graft.functions.Hll.zero, 0L))
          batch.foreach { k => regs = graft.functions.Hll.add(regs, k.key); n += 1 }
          state.update((regs, n))
          val (used, sumRank, maxRank, d, est) = graft.functions.Hll.summary(regs)
          Iterator(HllSnapshot(scope, n, used, sumRank, maxRank, d, est))
      }
  }

  final case class FunnelEvent(user: String, tsUs: Long, eventId: Long, etype: String)
  final case class FunnelStage(user: String, stage: String, tsUs: Long)
  final case class FunnelUserState(tView: Long, tClick: Long, tBuy: Long,
      fTs: Long, fId: Long)

  /** q106's keyed streaming twin: the view → click → purchase funnel as
    * per-user state, emitting each stage transition EXACTLY ONCE as it
    * first fires (the product-analytics activation feed; downstream
    * counts of distinct users per stage reproduce q106's rollup). State
    * is three stage timestamps + the fold frontier per user — O(1)
    * forever. Semantics mirror the batch query exactly for event-time-
    * ordered delivery: t_view = first view, t_click = first click
    * STRICTLY after t_view, t_buy = first purchase strictly after
    * t_click (q106's min-with-strict-inequality chain is prefix-causal
    * under in-order arrival, so the bounded state IS the exact batch
    * answer — the CurationIngest ordered-ingest precondition). The fold
    * is order-SENSITIVE, so it runs the [[cusumState]]/[[alertState]]
    * disorder discipline: each micro-batch sorts its group by
    * (ts, event_id) and anything at or before the folded frontier is
    * dropped — a replayed or late event can neither re-fire a stage nor
    * fire it out of order. (Exact batch parity under ARBITRARY disorder
    * would need the full per-user click/purchase history — unbounded
    * state — which is exactly the trade this gate refuses.) */
  def funnelState(evs: Dataset[FunnelEvent]): Dataset[FunnelStage] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.user)
      .flatMapGroupsWithState[FunnelUserState, FunnelStage](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: String, batch: Iterator[FunnelEvent], state: GroupState[FunnelUserState]) =>
          var st = state.getOption.getOrElse(
            FunnelUserState(-1L, -1L, -1L, Long.MinValue, Long.MinValue))
          val out = Seq.newBuilder[FunnelStage]
          batch.toSeq.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
            val fresh = e.tsUs > st.fTs || (e.tsUs == st.fTs && e.eventId > st.fId)
            if (fresh) {
              e.etype match {
                case "view" if st.tView < 0 =>
                  st = st.copy(tView = e.tsUs)
                  out += FunnelStage(user, "view", e.tsUs)
                case "click" if st.tView >= 0 && st.tClick < 0 && e.tsUs > st.tView =>
                  st = st.copy(tClick = e.tsUs)
                  out += FunnelStage(user, "click", e.tsUs)
                case "purchase" if st.tClick >= 0 && st.tBuy < 0 && e.tsUs > st.tClick =>
                  st = st.copy(tBuy = e.tsUs)
                  out += FunnelStage(user, "purchase", e.tsUs)
                case _ => ()
              }
              st = st.copy(fTs = e.tsUs, fId = e.eventId)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  final case class ValueArrival(scope: String, cents: Long)
  final case class HdrSnapshot(scope: String, nSeen: Long, nDropped: Long,
      nBuckets: Long, quantiles: String, buckets: String)

  /** q214's keyed streaming twin and the sketch tier's last missing
    * stream gate: a per-scope HDR (log-scale histogram) quantile monitor
    * — the P95-latency panel the reference's dashboard actually shows
    * (ST9 `histogram_quantile`; fraud-detection-alerts.yml's latency
    * SLO). State per scope is the bucket→count table plus the arrival
    * count: O(32·log(max value)) counters FOREVER (≤ ~1900 for any
    * int64, a few hundred in practice) — never the values, which is the
    * whole point of HDR as stream state. Bucket geometry is exactly
    * q214's integer arithmetic (e = max(0, bitlen(v)−5), m = v≫e,
    * bucket = 32e+m, range [m·2^e, (m+1)·2^e) — relative width ≤ 1/16
    * by construction), and counts are plain sums, so the fold is
    * order-robust and sum-mergeable like [[heavyHittersState]]'s MG
    * counters: every trigger's snapshot is the exact bucket table of
    * the whole stream PREFIX regardless of micro-batch boundaries.
    * Each snapshot carries nearest-rank P50/90/95/99 (k = ⌈p·n/100⌉ in
    * q214's exact ceil-division longs) from a cumulative walk over the
    * state table — O(buckets) per trigger, never the data — plus the
    * canonical bucket table itself for the batch-parity bridge.
    * Values must be nonnegative cent-grid longs (q214's documented
    * precondition); a negative arrival is excluded from the sketch but
    * COUNTED — every snapshot carries the cumulative `nDropped`, so a
    * producer violating the contract is visible in the output, never
    * silently absorbed. */
  def hdrQuantileState(vals: Dataset[ValueArrival]): Dataset[HdrSnapshot] = {
    import vals.sparkSession.implicits._
    vals.groupByKey(_.scope)
      .flatMapGroupsWithState[(Map[Long, Long], Long, Long), HdrSnapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (scope: String, batch: Iterator[ValueArrival],
         state: GroupState[(Map[Long, Long], Long, Long)]) =>
          var (tbl, n, dropped) = state.getOption.getOrElse((Map.empty[Long, Long], 0L, 0L))
          batch.foreach { a =>
            if (a.cents >= 0) {
              tbl = tbl.updated(hdrBucket(a.cents), tbl.getOrElse(hdrBucket(a.cents), 0L) + 1L)
              n += 1
            } else dropped += 1
          }
          state.update((tbl, n, dropped))
          val sorted = tbl.toSeq.sortBy(_._1)
          val qs = Seq(50L, 90L, 95L, 99L).map { p =>
            val k = (p * n + 99L) / 100L
            var cum = 0L
            val hit = sorted.find { case (_, c) => cum += c; cum >= k }
            hit.fold(s"$p:$k:-1:-1:-1") { case (b, _) =>
              val (lo, hi) = hdrBounds(b); s"$p:$k:$b:$lo:$hi"
            }
          }.mkString(",")
          val bucketsCsv = sorted.map { case (b, c) => s"$b:$c" }.mkString(",")
          Iterator(HdrSnapshot(scope, n, dropped, sorted.size.toLong, qs, bucketsCsv))
      }
  }

  /** q214's bucket id for a nonnegative cent-grid value — bitlen via
    * Long.numberOfLeadingZeros matches `length(bin(v))` for v ≥ 1, and
    * v = 0 pins bitlen 1 (bin(0) = "0") so e = 0 either way. */
  def hdrBucket(v: Long): Long = {
    val bitlen = if (v == 0L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(v)
    val e = math.max(0, bitlen - 5)
    (e.toLong << 5) + (v >> e)
  }

  /** [lo, hi) of a q214 bucket id. */
  def hdrBounds(bucket: Long): (Long, Long) = {
    val e = (bucket >> 5).toInt
    val m = bucket & 31L
    (m << e, (m + 1L) << e)
  }

  final case class AlertTick(alert: String, ts: Long, pred: Boolean)
  final case class AlertRunState(runStart: Long, firing: Boolean, frontier: Long)
  final case class AlertEvent(alert: String, ts: Long, event: String)

  /** Streaming twin of [[graft.api.AlertRules.withState]] +
    * `transitions`: evaluation ticks (alert, epoch-second ts, predicate)
    * arrive as a stream, and per alert the state machine tracks the
    * current predicate run — a run held ≥ its `for:` duration emits ONE
    * `fired` event, the first false tick of a firing alert emits ONE
    * `resolved` (the Alertmanager webhook contract). State is three
    * values per ALERT (run start, firing flag, fold frontier) — bounded
    * by rule count, never by series length. The fold is order-sensitive,
    * so each micro-batch sorts its group by ts and ticks at or before
    * the already-folded frontier are dropped, the
    * [[ewmaSpendState]]/[[cusumState]] disorder discipline: a late or
    * replayed tick cannot re-fire an alert downstream already saw. */
  def alertState(ticks: Dataset[AlertTick], forSeconds: Map[String, Long]):
      Dataset[AlertEvent] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.alert)
      .flatMapGroupsWithState[AlertRunState, AlertEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (alert: String, batch: Iterator[AlertTick], state: GroupState[AlertRunState]) =>
          val forSec = forSeconds.getOrElse(alert, 0L)
          var st = state.getOption.getOrElse(
            AlertRunState(runStart = -1L, firing = false, frontier = Long.MinValue))
          val out = Seq.newBuilder[AlertEvent]
          batch.toSeq.sortBy(_.ts).foreach { t =>
            if (t.ts > st.frontier) {
              if (t.pred) {
                val start = if (st.runStart < 0) t.ts else st.runStart
                if (!st.firing && t.ts - start >= forSec) {
                  out += AlertEvent(alert, t.ts, "fired")
                  st = st.copy(runStart = start, firing = true, frontier = t.ts)
                } else st = st.copy(runStart = start, frontier = t.ts)
              } else {
                if (st.firing) out += AlertEvent(alert, t.ts, "resolved")
                st = AlertRunState(runStart = -1L, firing = false, frontier = t.ts)
              }
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  final case class GroupValue(scope: String, g: String, cents: Long)
  final case class AnovaSnapshot(scope: String, k: Long, n: Long,
      ssbCents2: Long, sswCents2: Long, fMicro: Long, eta2Micro: Long)

  /** q240's streaming twin — a per-scope one-way-ANOVA monitor ("does
    * mean value differ by group, LIVE"): state is the per-group exact
    * moment triple (n_g, Σx, Σx²) — O(groups) longs forever, plain sums
    * so the fold is order-robust and merge-associative like the MG/HDR
    * states — and every trigger's snapshot computes F and η² with
    * EXACTLY q240's arithmetic (per-group s²/n floors before the exact
    * integer total, identical-order double chains), so each snapshot
    * equals the batch q240 formula over the stream PREFIX, which the
    * spec pins per trigger. Triggers where the F precondition fails
    * (k < 2, n ≤ k, or zero within-group variance) emit k/n with the
    * statistics pinned at −1 — visible, never a crash mid-stream. */
  def anovaState(vals: Dataset[GroupValue]): Dataset[AnovaSnapshot] = {
    import vals.sparkSession.implicits._
    vals.groupByKey(_.scope)
      .flatMapGroupsWithState[Map[String, (Long, Long, Long)], AnovaSnapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (scope: String, batch: Iterator[GroupValue],
         state: GroupState[Map[String, (Long, Long, Long)]]) =>
          var m = state.getOption.getOrElse(Map.empty[String, (Long, Long, Long)])
          batch.foreach { v =>
            val (n, s, ss) = m.getOrElse(v.g, (0L, 0L, 0L))
            m = m.updated(v.g, (n + 1, s + v.cents, ss + v.cents * v.cents))
          }
          state.update(m)
          val k = m.size.toLong
          val n = m.values.map(_._1).sum
          val sx = m.values.map(_._2).sum
          val sxx = m.values.map(_._3).sum
          val tsum = m.values.map { case (ng, sg, _) =>
            math.floor(sg.toDouble * sg.toDouble / ng.toDouble + 0.5).toLong
          }.sum
          val ssb = tsum.toDouble - sx.toDouble * sx.toDouble / n.toDouble
          val sst = sxx.toDouble - sx.toDouble * sx.toDouble / n.toDouble
          val snap =
            if (k < 2 || n <= k || sst - ssb <= 0.0)
              AnovaSnapshot(scope, k, n, -1L, -1L, -1L, -1L)
            else {
              val f = (ssb / (k - 1).toDouble) / ((sst - ssb) / (n - k).toDouble)
              AnovaSnapshot(scope, k, n,
                math.floor(ssb + 0.5).toLong,
                math.floor((sst - ssb) + 0.5).toLong,
                math.floor(f * 1e6 + 0.5).toLong,
                math.floor(ssb / sst * 1e6 + 0.5).toLong)
            }
          Iterator(snap)
      }
  }

  final case class DailyValue(scope: String, d: Long, cents: Long)
  final case class MkSnapshot(scope: String, nDays: Long, nValues: Long,
      sStat: Long, tieTerm: Long, var18: Long, zMicro: Long, trend: Long,
      defined: Boolean)

  /** q241's streaming twin — a per-scope Mann–Kendall TREND monitor
    * ("is this metric drifting monotonically, LIVE"): the alerting
    * layer's companion to the level gates (q204-style thresholds catch
    * a jump; MK catches a slow slide long before any threshold trips).
    * State is the BOUNDED DAILY GRID — per scope, day → exact cent
    * total, O(calendar days) longs forever, plain sums so the fold is
    * order-robust and merge-associative (a replayed or late event for
    * day d lands in the same cell) — and every trigger's snapshot runs
    * EXACTLY q241's arithmetic over the stream prefix: S = Σ_{i<j}
    * sign(v_j − v_i) over the grid (bounded², the q241/q222 pair-join
    * justification — days, never events), the tie-corrected
    * Var·18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) on the exact value grid,
    * and the continuity-corrected z as one identical-order double
    * chain, micro-floored. Triggers where the test is undefined
    * (fewer than 2 days, or zero variance — all days tied) emit the
    * grid shape with `defined = false` and z pinned at 0 — visible,
    * never NaN mid-stream (z = 0 IS a legal value, hence the explicit
    * flag rather than a numeric sentinel). */
  def mannKendallState(vals: Dataset[DailyValue]): Dataset[MkSnapshot] = {
    import vals.sparkSession.implicits._
    vals.groupByKey(_.scope)
      .flatMapGroupsWithState[Map[Long, Long], MkSnapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (scope: String, batch: Iterator[DailyValue],
         state: GroupState[Map[Long, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[Long, Long])
          batch.foreach { v =>
            m = m.updated(v.d, m.getOrElse(v.d, 0L) + v.cents)
          }
          state.update(m)
          val days = m.toSeq.sortBy(_._1)
          val n = days.size.toLong
          var s = 0L
          for (i <- days.indices; j <- (i + 1) until days.size)
            s += java.lang.Long.signum(days(j)._2 - days(i)._2)
          val tieSizes = days.groupBy(_._2).map(_._2.size.toLong)
          val nValues = tieSizes.size.toLong
          val tieTerm = tieSizes.map(t => t * (t - 1) * (2 * t + 5)).sum
          val var18 = n * (n - 1) * (2 * n + 5) - tieTerm
          val snap =
            if (n < 2 || var18 <= 0L)
              MkSnapshot(scope, n, nValues, s, tieTerm, var18,
                zMicro = 0L, trend = java.lang.Long.signum(s).toLong,
                defined = false)
            else {
              val sd = math.sqrt(var18.toDouble / 18.0)
              val z =
                if (s > 0) (s - 1).toDouble / sd
                else if (s < 0) (s + 1).toDouble / sd
                else 0.0
              MkSnapshot(scope, n, nValues, s, tieTerm, var18,
                math.floor(z * 1e6 + 0.5).toLong,
                java.lang.Long.signum(s).toLong, defined = true)
            }
          Iterator(snap)
      }
  }

  final case class GroupCentValue(scope: String, g: String, v: Long)
  final case class KwSnapshot(scope: String, k: Long, n: Long,
      rankSqSum: Long, tie3: Long, hMicro: Long, hTieMicro: Long,
      defined: Boolean)

  /** q242's streaming twin — the NONPARAMETRIC sibling of
    * [[anovaState]] ("do the group value DISTRIBUTIONS differ, LIVE" —
    * F when variances behave, H when they don't, the same pairing the
    * batch tier ships): per-scope state is the exact (group, cent
    * value) count grid — bounded by groups × the value domain, plain
    * sums so the fold is order-robust and replayed/late arrivals land
    * in their cell — and every trigger recomputes midranks over the
    * grid and H with EXACTLY q242's arithmetic (doubled midranks
    * 2r̄ = 2·below + m + 1 as exact integers, per-group
    * floor((2R)²/(4n_g)) BEFORE the integer total, identical-order
    * double chains micro-floored), so each snapshot equals the batch
    * q242 formula over the stream prefix. Triggers where H is undefined
    * (k < 2, n < 2, or every value tied — the tie correction's
    * denominator vanishes) report `defined = false` with the grid shape
    * still visible, never NaN (the [[mannKendallState]] flag pattern;
    * −1 is a legal h value since H ≥ 0 but the SHAPE fields k/n are
    * wanted regardless, so a flag is cleaner than sentinels). */
  def kruskalWallisState(vals: Dataset[GroupCentValue]): Dataset[KwSnapshot] = {
    import vals.sparkSession.implicits._
    vals.groupByKey(_.scope)
      .flatMapGroupsWithState[Map[(String, Long), Long], KwSnapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (scope: String, batch: Iterator[GroupCentValue],
         state: GroupState[Map[(String, Long), Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[(String, Long), Long])
          batch.foreach { gv =>
            val key = (gv.g, gv.v)
            m = m.updated(key, m.getOrElse(key, 0L) + 1L)
          }
          state.update(m)
          // midranks over the merged value grid (exact integers)
          val grid = m.groupBy(_._1._2).view.mapValues(_.values.sum)
            .toSeq.sortBy(_._1)
          var below = 0L
          val r2OfV = grid.map { case (v, cnt) =>
            val r = v -> (2L * below + cnt + 1L); below += cnt; r
          }.toMap
          val byG = m.groupBy(_._1._1)
          val k = byG.size.toLong
          val n = m.values.sum
          val tie3 = grid.map { case (_, c) => c * c * c - c }.sum
          val perGroup = byG.toSeq.map { case (_, cells) =>
            val nG = cells.values.sum
            val r2 = cells.map { case ((_, v), c) => c * r2OfV(v) }.sum
            (nG, math.floor(r2.toDouble * r2.toDouble /
              (4.0 * nG.toDouble) + 0.5).toLong)
          }
          val rsum = perGroup.map(_._2).sum
          val snap =
            if (k < 2 || n < 2 || tie3 == n * n * n - n)
              KwSnapshot(scope, k, n, rsum, tie3, 0L, 0L, defined = false)
            else {
              val nD = n.toDouble
              val h = 12.0 / (nD * (nD + 1.0)) * rsum.toDouble - 3.0 * (nD + 1.0)
              val corr = 1.0 - tie3.toDouble / (nD * nD * nD - nD)
              KwSnapshot(scope, k, n, rsum, tie3,
                math.floor(h * 1e6 + 0.5).toLong,
                math.floor(h / corr * 1e6 + 0.5).toLong, defined = true)
            }
          Iterator(snap)
      }
  }

  final case class CusumSnapshot(scope: String, nDays: Long, mu0Cents: Long,
      sPosCents: Long, sNegCents: Long, nAlarms: Long, alarmNow: Boolean,
      defined: Boolean)

  /** q249's streaming twin — the LIVE two-sided CUSUM drift alarm
    * (Page 1954; CUSUM is natively sequential, so unlike the batch
    * query's prefix closed form the stream just RUNS the recurrence).
    * Distinct from [[cusumState]] (q173's keyed twin) the way q249 is
    * distinct from q173: that one folds an externally-FIT (target,
    * threshold) reference with O(1) state and REFUSES late days
    * (order-sensitive recurrence); this one freezes its own baseline
    * from the grid and ABSORBS late days by per-trigger recomputation
    * — the price is O(days) state and work, bounded by calendar.
    * State is the same bounded daily grid as [[mannKendallState]]
    * (order-robust per-day fold; a late arrival for ANY day — baseline
    * days included — lands in its cell and the next trigger's
    * recomputation re-freezes μ0/slack/threshold from the first
    * [[graft.queries.ExtQueries]] `CusumBaselineDays` days exactly as
    * the batch canon would), and every trigger replays the recurrence
    * over the grid: O(days) work per trigger, bounded by calendar, the
    * price of exact batch parity under out-of-order arrival. Prefixes
    * that cannot freeze a baseline yet (≤ baseline days seen) report
    * `defined = false` visibly. Emits the trajectory head (current
    * S⁺/S⁻), the alarm count so far, and whether the LATEST day is in
    * alarm — the triple an alerting rule consumes. */
  def cusumMonitorState(vals: Dataset[DailyValue],
      baselineDays: Int = 7): Dataset[CusumSnapshot] = {
    import vals.sparkSession.implicits._
    vals.groupByKey(_.scope)
      .flatMapGroupsWithState[Map[Long, Long], CusumSnapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (scope: String, batch: Iterator[DailyValue],
         state: GroupState[Map[Long, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[Long, Long])
          batch.foreach { v =>
            m = m.updated(v.d, m.getOrElse(v.d, 0L) + v.cents)
          }
          state.update(m)
          val days = m.toSeq.sortBy(_._1)
          val snap =
            if (days.size <= baselineDays)
              CusumSnapshot(scope, days.size.toLong, 0L, 0L, 0L, 0L,
                alarmNow = false, defined = false)
            else {
              val mu0 = Math.floorDiv(
                days.take(baselineDays).map(_._2).sum, baselineDays.toLong)
              val slack = Math.floorDiv(mu0, 20L)
              val h = Math.floorDiv(mu0, 2L)
              var sp = 0L; var sn = 0L; var nA = 0L; var alarmNow = false
              days.drop(baselineDays).foreach { case (_, v) =>
                sp = math.max(0L, sp + v - mu0 - slack)
                sn = math.max(0L, sn + mu0 - slack - v)
                alarmNow = sp > h || sn > h
                if (alarmNow) nA += 1
              }
              CusumSnapshot(scope, days.size.toLong, mu0, sp, sn, nA,
                alarmNow, defined = true)
            }
          Iterator(snap)
      }
  }

  final case class PhSnapshot(scope: String, nDays: Long, mu0Cents: Long,
      phPos: Long, phNeg: Long, nAlarms: Long, alarmNow: Boolean,
      defined: Boolean)

  /** q266's streaming twin — the live ADAPTIVE-mean changepoint monitor
    * pairing [[cusumMonitorState]] exactly the way batch q266 pairs
    * q249: CUSUM judges against a frozen μ0, PH against the running
    * mean of the monitored window itself (only a genuine change-point
    * outruns it; a slow ramp re-centers). Per-scope state is the exact
    * daily cent grid ([[DailyValue]] — plain sums, so the fold is
    * order-robust and late arrivals land in their day, re-freezing the
    * δ/λ scale when they touch a baseline day, exactly as the batch
    * canon recomputed on the fuller table would). Every trigger replays
    * q266's arithmetic verbatim over the sorted grid: δ = μ0/50 and
    * λ = μ0/2 floor-division longs off the first `baselineDays` days,
    * per-day mean deviation = floor((v·t − cum)/t) as the row's ONE
    * double op (t, cum over post-cut days), running sums / running
    * mins / ph = m − min(m) pure longs — so each snapshot equals the
    * batch q266 tail over the stream prefix. n ≤ baselineDays prefixes
    * report `defined = false` (the [[cusumMonitorState]] sentinel
    * shape).
    *
    * Long bound (the [[ljungBoxState]] doc discipline): v·t wraps past
    * v ≈ 2⁶³/t — a per-scope DAILY cent total near 10¹⁷ at t ≈ 100
    * days — and the floor(double)/t chain leaves the exact-integer
    * grid at |v·t − cum| ≈ 2⁵³; both bounds are the batch q266's own
    * (documented there), and the twin must cross them exactly when the
    * batch side does or prefix parity itself breaks — widen BOTH
    * sides, never just this fold. */
  def pageHinkleyState(vals: Dataset[DailyValue],
      baselineDays: Int = 7): Dataset[PhSnapshot] = {
    import vals.sparkSession.implicits._
    vals.groupByKey(_.scope)
      .flatMapGroupsWithState[Map[Long, Long], PhSnapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (scope: String, batch: Iterator[DailyValue],
         state: GroupState[Map[Long, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[Long, Long])
          batch.foreach { v =>
            m = m.updated(v.d, m.getOrElse(v.d, 0L) + v.cents)
          }
          state.update(m)
          val days = m.toSeq.sortBy(_._1)
          val snap =
            if (days.size <= baselineDays)
              PhSnapshot(scope, days.size.toLong, 0L, 0L, 0L, 0L,
                alarmNow = false, defined = false)
            else {
              val mu0 = Math.floorDiv(
                days.take(baselineDays).map(_._2).sum, baselineDays.toLong)
              val delta = Math.floorDiv(mu0, 50L)
              val lambda = Math.floorDiv(mu0, 2L)
              var t = 0L; var cum = 0L
              var mPos = 0L; var mNeg = 0L
              var minPos = Long.MaxValue; var minNeg = Long.MaxValue
              var phPos = 0L; var phNeg = 0L; var nA = 0L; var alarmNow = false
              days.drop(baselineDays).foreach { case (_, v) =>
                t += 1; cum += v
                mPos += math.floor((v * t - cum).toDouble / t).toLong - delta
                mNeg += math.floor((cum - v * t).toDouble / t).toLong - delta
                minPos = math.min(minPos, mPos); minNeg = math.min(minNeg, mNeg)
                phPos = mPos - minPos; phNeg = mNeg - minNeg
                alarmNow = phPos > lambda || phNeg > lambda
                if (alarmNow) nA += 1
              }
              PhSnapshot(scope, days.size.toLong, mu0, phPos, phNeg, nA,
                alarmNow, defined = true)
            }
          Iterator(snap)
      }
  }

  final case class AdwinSnapshot(scope: String, nDays: Long, winLen: Long,
      winStartD: Long, nShrinks: Long, muWinMicro: Long, shrunkNow: Boolean,
      defined: Boolean)

  /** The FULL adaptive-window ADWIN (Bifet & Gavaldà 2007) as a
    * streaming monitor — q269 runs the cut TEST per prefix against the
    * whole history; this carries the half the batch canon documents as
    * "a stream concern": after every detection the window SHRINKS,
    * dropping the pre-change past, so the maintained mean tracks the
    * CURRENT regime (the adaptation [[pageHinkleyState]]'s cumulative
    * mean cannot do — PH latches, ADWIN re-anchors). Per-scope state is
    * the exact daily cent grid (order-robust; late arrivals land in
    * their day and the fold re-runs deterministically — arrival order
    * can never change a verdict). Every trigger replays the sequential
    * ADWIN fold over the sorted grid: append day t to the window, then
    * WHILE any contiguous cut of the window trips the Hoeffding bound
    * (q269's exact chains — micro-floored dmu/eps off the WINDOW's
    * plug-in range, integer compare), drop the oldest day. Snapshot =
    * window length / start day / cumulative shrink count / 1e6-floored
    * window mean / whether the newest day caused a shrink.
    *
    * The q269 relationship the spec pins: on any series the FIRST
    * shrink happens at exactly the first day q269 reports `detected` —
    * until a detection occurs the window IS the full prefix, so the
    * two scans coincide; after it they intentionally diverge (full
    * history vs current regime). The re-anchor is PARTIAL on clean
    * two-level data: the plug-in range makes dmu/rng step-size-free,
    * so the harmonic bound retains a conservative rump of pre-change
    * days (the spec pins it exactly) — the window mean still moves
    * decisively toward the new regime. Cost note: the fold is O(W²)
    * per trigger over the CALENDAR-bounded window — the same lattice
    * bound the batch canon documents. */
  def adwinState(vals: Dataset[DailyValue]): Dataset[AdwinSnapshot] = {
    import vals.sparkSession.implicits._
    vals.groupByKey(_.scope)
      .flatMapGroupsWithState[Map[Long, Long], AdwinSnapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (scope: String, batch: Iterator[DailyValue],
         state: GroupState[Map[Long, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[Long, Long])
          batch.foreach { v =>
            m = m.updated(v.d, m.getOrElse(v.d, 0L) + v.cents)
          }
          state.update(m)
          val days = m.toSeq.sortBy(_._1)
          if (days.isEmpty)
            Iterator(AdwinSnapshot(scope, 0L, 0L, -1L, 0L, -2000000L,
              shrunkNow = false, defined = false))
          else {
            // q269's exact cut chains, on the current window
            def cutTrips(win: IndexedSeq[(Long, Long)]): Boolean = {
              val t = win.length.toLong
              if (t < 2L) false
              else {
                val vs = win.map(_._2)
                val s = vs.sum
                val rng = vs.max - vs.min
                var s0 = 0L
                (1L until t).exists { n0 =>
                  s0 += vs((n0 - 1).toInt)
                  val n1 = t - n0
                  val dmu = math.abs(s0.toDouble / n0.toDouble
                    - (s - s0).toDouble / n1.toDouble)
                  val mH = n0.toDouble * n1.toDouble /
                    (n0.toDouble + n1.toDouble)
                  val eps = rng.toDouble *
                    math.sqrt(math.log(4.0 * t.toDouble / 0.05) / (2.0 * mH))
                  math.floor(dmu * 1e6 + 0.5).toLong >
                    math.floor(eps * 1e6 + 0.5).toLong
                }
              }
            }
            var win = Vector.empty[(Long, Long)]
            var shrinks = 0L
            var shrunkLast = false
            days.foreach { dv =>
              win :+= dv
              shrunkLast = false
              while (cutTrips(win)) {
                win = win.tail
                shrinks += 1L
                shrunkLast = true
              }
            }
            val mu = math.floor(
              win.map(_._2).sum.toDouble / win.length.toDouble * 1e6 + 0.5).toLong
            Iterator(AdwinSnapshot(scope, days.size.toLong, win.length.toLong,
              win.head._1, shrinks, mu, shrunkLast, defined = true))
          }
      }
  }

  final case class LbSnapshot(scope: String, nDays: Long, syy: Long,
      qMicro: Long, reject: Long, defined: Boolean)

  /** q254's streaming twin — the live residual-whiteness gate ("is this
    * series still i.i.d." as a monitor; [[mannKendallState]] asks about
    * TREND, this asks about ANY lag-1..7 memory — seasonality, sticky
    * incidents, feedback loops all light it up first). Per-scope state
    * is the exact daily cent grid ([[DailyValue]] — plain sums, so the
    * fold is order-robust and late arrivals land in their day). Every
    * trigger converts the grid to q254's dollar-grain series EXACTLY —
    * x = floorDiv(cents + 50, 100) is integer-identical to the batch
    * side's floor(round(sum(value), 2) + 0.5) because a day's cent sum
    * is exact — and replays q254's arithmetic verbatim: y_t = n·x_t − T
    * exact longs, per-lag Σy·y₊ₖ and Σy² exact long sums, the h = 7
    * terms added in WRITTEN order (the batch pivot discipline), the
    * same χ²₀.₉₉,₇ cut and the same n ≤ h+1 sentinel semantics
    * (`defined = false`, the [[mannKendallState]] flag pattern), so
    * each snapshot equals the batch q254 row over the stream prefix.
    *
    * Long bound (the [[ksDriftState]] doc discipline): y = n·x − T and
    * the Σy², Σy·y₊ₖ sums are plain Long — y² wraps past |y| ≈ 3·10⁹,
    * i.e. a per-scope daily series whose n·(dollar deviation from the
    * scope total) exceeds ~3 billion. That is the identical bound the
    * batch q254 carries (its documented widen path at extreme revenue
    * scales is DECIMAL(38,0)); the twin must wrap exactly when the
    * batch side would, or the prefix-parity contract itself breaks —
    * so the fix at such scales is widening BOTH sides, never just
    * this fold. */
  def ljungBoxState(vals: Dataset[DailyValue]): Dataset[LbSnapshot] = {
    import vals.sparkSession.implicits._
    val h = 7
    vals.groupByKey(_.scope)
      .flatMapGroupsWithState[Map[Long, Long], LbSnapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (scope: String, batch: Iterator[DailyValue],
         state: GroupState[Map[Long, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[Long, Long])
          batch.foreach { v =>
            m = m.updated(v.d, m.getOrElse(v.d, 0L) + v.cents)
          }
          state.update(m)
          val xs = m.toSeq.sortBy(_._1).map { case (_, c) => Math.floorDiv(c + 50L, 100L) }
          val n = xs.size.toLong
          val t = xs.sum
          val ys = xs.map(x => n * x - t)
          val syy = ys.map(y => y * y).sum
          val snap =
            if (n <= h + 1)
              LbSnapshot(scope, n, syy, qMicro = -1L, reject = -1L, defined = false)
            else {
              var terms = 0.0
              (1 to h).foreach { k =>
                val syk = ys.dropRight(k).zip(ys.drop(k)).map { case (a, b) => a * b }.sum
                val r = syk.toDouble / syy.toDouble
                terms += r * r / (n.toDouble - k.toDouble)
              }
              val q = n.toDouble * (n.toDouble + 2.0) * terms
              LbSnapshot(scope, n, syy, math.floor(q * 1e6 + 0.5).toLong,
                if (q > 18.475307) 1L else 0L, defined = true)
            }
          Iterator(snap)
      }
  }

  final case class PacfSnapshot(scope: String, nDays: Long, syy: Long,
      acf1Micro: Long, acf2Micro: Long, acf3Micro: Long,
      pacf1Micro: Long, pacf2Micro: Long, pacf3Micro: Long, defined: Boolean)

  /** q259's streaming twin — the live AR-ORDER read beside
    * [[ljungBoxState]]'s any-memory gate (LB says "this series has
    * memory", PACF says WHICH lag carries it once shorter lags are
    * regressed out — the monitor that distinguishes "yesterday
    * explains today" from genuine multi-day structure). Per-scope
    * state is the exact daily cent grid ([[DailyValue]] — the
    * ljungBoxState fold, order-robust, late arrivals land in their
    * day). Every trigger converts to the dollar-grain series exactly
    * (floorDiv(cents+50,100) ≡ the batch floor(round(Σ,2)+0.5)) and
    * replays q259's arithmetic verbatim: exact y/Σy²/Σy·y₊ₖ longs,
    * r₁..r₃ each one double division, the Durbin–Levinson closed forms
    * in the same written order, micro-floors. Degenerates (n ≤ 4,
    * Σy² = 0, vanishing recursion denominators) report
    * `defined = false` with −2·10⁶ pinned on every φ (the q259/q250
    * sentinel), so each snapshot equals the batch q259 row over the
    * stream prefix. Long bound: identical to [[ljungBoxState]]'s
    * (y² wraps past |y| ≈ 3·10⁹ — the batch side's documented
    * DECIMAL38 widen scale). */
  def pacfState(vals: Dataset[DailyValue]): Dataset[PacfSnapshot] = {
    import vals.sparkSession.implicits._
    vals.groupByKey(_.scope)
      .flatMapGroupsWithState[Map[Long, Long], PacfSnapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (scope: String, batch: Iterator[DailyValue],
         state: GroupState[Map[Long, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[Long, Long])
          batch.foreach { v =>
            m = m.updated(v.d, m.getOrElse(v.d, 0L) + v.cents)
          }
          state.update(m)
          val xs = m.toSeq.sortBy(_._1).map { case (_, c) => Math.floorDiv(c + 50L, 100L) }
          val n = xs.size.toLong
          val t = xs.sum
          val ys = xs.map(x => n * x - t)
          val syy = ys.map(y => y * y).sum
          def sk(k: Int): Long =
            ys.dropRight(k).zip(ys.drop(k)).map { case (a, b) => a * b }.sum
          val sent = -2000000L
          val snap =
            if (n <= 4 || syy <= 0L)
              PacfSnapshot(scope, n, syy, sent, sent, sent, sent, sent, sent,
                defined = false)
            else {
              val r1 = sk(1).toDouble / syy.toDouble
              val r2 = sk(2).toDouble / syy.toDouble
              val r3 = sk(3).toDouble / syy.toDouble
              val d2 = 1.0 - r1 * r1
              val phi22 = (r2 - r1 * r1) / d2
              val phi21 = r1 - phi22 * r1
              val d3 = 1.0 - phi21 * r1 - phi22 * r2
              val phi33 = (r3 - phi21 * r2 - phi22 * r1) / d3
              if (d2 == 0.0 || d3 == 0.0)
                PacfSnapshot(scope, n, syy, sent, sent, sent, sent, sent, sent,
                  defined = false)
              else {
                def s6(v: Double): Long = math.floor(v * 1e6 + 0.5).toLong
                PacfSnapshot(scope, n, syy, s6(r1), s6(r2), s6(r3),
                  s6(r1), s6(phi22), s6(phi33), defined = true)
              }
            }
          Iterator(snap)
      }
  }

  final case class RateArrival(scope: String, g: String, ret: Long)
  final case class EbSnapshot(scope: String, g: String, n: Long, y: Long,
      rawMicro: Long, alphaMicro: Long, betaMicro: Long, shrunkMicro: Long,
      priorDefined: Boolean)

  /** q255's streaming twin — LIVE empirical-Bayes rate shrinkage
    * (Efron & Morris 1975; Robbins 1956), completing the batch/stream
    * pairing of the monitor family's estimator member: the leaderboard
    * problem q255 fixes (small groups swing wildly on raw rates) is
    * WORSE live, where every group starts small. Per-scope state is the
    * per-group (n, y) pair — two longs per group, bounded by group
    * cardinality forever, plain sums so the fold is order-robust and
    * replay-safe. Every trigger refits the MoM beta-binomial prior over
    * the EXACT micro-floored rate grid (p̃ = ⌊y·10⁶/n⌋ — integer
    * division, so Σp̃/Σp̃² are exact longs; the q255 gridding that
    * sidesteps the double-sum nondeterminism) and emits one row per
    * group with the identical-order (α, β, shrunk) double chains — so
    * each trigger's rows equal batch q255's arithmetic over the stream
    * prefix. Degenerate priors (zero between-group variance, or MoM
    * α+β ≤ 0 — overdispersed, EB says "don't shrink") emit the raw
    * rate with priorDefined = false, exactly the batch sentinel
    * contract. Σp̃² wraps long only past k ≈ 9·10⁶ groups — the batch
    * side's documented bound, shared. */
  def ebShrinkState(vals: Dataset[RateArrival]): Dataset[EbSnapshot] = {
    import vals.sparkSession.implicits._
    vals.groupByKey(_.scope)
      .flatMapGroupsWithState[Map[String, (Long, Long)], EbSnapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (scope: String, batch: Iterator[RateArrival],
         state: GroupState[Map[String, (Long, Long)]]) =>
          var m = state.getOption.getOrElse(Map.empty[String, (Long, Long)])
          batch.foreach { a =>
            val (n, y) = m.getOrElse(a.g, (0L, 0L))
            m = m.updated(a.g, (n + 1L, y + (if (a.ret != 0L) 1L else 0L)))
          }
          state.update(m)
          val k = m.size.toLong
          // exact rate grid (y ≥ 0, n ≥ 1: floorDiv == the batch `div`)
          val ps = m.valuesIterator
            .map { case (n, y) => Math.floorDiv(y * 1000000L, n) }.toSeq
          val sp = ps.sum
          val spp = ps.map(p => p * p).sum
          val kD = k.toDouble
          val m01 = sp.toDouble / kD / 1e6
          val v01 = (kD * spp.toDouble - sp.toDouble * sp.toDouble) / (kD * kD) / 1e12
          val ab = m01 * (1.0 - m01) / v01 - 1.0
          val defined = v01 > 0.0 && ab > 0.0
          val alpha = m01 * ab
          m.toSeq.sortBy(_._1).iterator.map { case (g, (n, y)) =>
            val raw = Math.floorDiv(y * 1000000L, n)
            if (defined)
              EbSnapshot(scope, g, n, y, raw,
                math.floor(alpha * 1e6 + 0.5).toLong,
                math.floor((ab - alpha) * 1e6 + 0.5).toLong,
                math.floor((y.toDouble + alpha) / (n.toDouble + ab) * 1e6 + 0.5).toLong,
                priorDefined = true)
            else
              EbSnapshot(scope, g, n, y, raw, -1L, -1L, raw, priorDefined = false)
          }
      }
  }

  final case class DayCentArrival(scope: String, d: Long, v: Long)
  final case class KsDriftSnapshot(scope: String, nDays: Long, nRef: Long,
      nLive: Long, dNum: Long, dMicro: Long, alarmNow: Boolean, defined: Boolean)

  /** q253's streaming twin — the DISTRIBUTION-shape member of the
    * monitor family ([[cusumMonitorState]] catches mean shifts,
    * [[mannKendallState]] catches trends; a variance blow-up or bimodal
    * split moves neither — two-sample KS against a frozen reference
    * does). Per-scope state is the exact (day, cent-value) count grid —
    * calendar × value-domain bounded, plain sums, so the fold is
    * order-robust and replayed/late arrivals land in their cell. Every
    * trigger re-freezes the reference from the grid's first
    * [[graft.queries.ExtQueries.KsBaselineDays]] calendar days (grid
    * semantics, not arrival-order semantics: a late arrival into a
    * baseline day re-freezes — the cusum/MK discipline) and reports
    * D = max_v |F_ref(v) − F_live(v)| over the merged grid with q253's
    * EXACT cross-multiplied integer numerator (long products — exact to
    * nRef·nLive < 2⁶³, the per-scope stream-state range; the batch side
    * rides DECIMAL(38,0) for corpus scale) and the identical
    * final double chain, so each snapshot equals the batch q253's LAST
    * trajectory row over the stream prefix. `alarmNow` applies the
    * large-sample two-sample KS critical value at α = 0.01,
    * c(α)·√((n₁+n₂)/(n₁n₂)) with c = √(−ln(α/2)/2) ≈ 1.628 (Smirnov
    * 1948; Massey 1951). Triggers that cannot freeze a full baseline
    * (or have no post-baseline mass yet) report `defined = false` with
    * the grid shape visible (the [[mannKendallState]] flag pattern). */
  def ksDriftState(vals: Dataset[DayCentArrival],
      baselineDays: Int = graft.queries.ExtQueries.KsBaselineDays)
      : Dataset[KsDriftSnapshot] = {
    import vals.sparkSession.implicits._
    vals.groupByKey(_.scope)
      .flatMapGroupsWithState[Map[(Long, Long), Long], KsDriftSnapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (scope: String, batch: Iterator[DayCentArrival],
         state: GroupState[Map[(Long, Long), Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[(Long, Long), Long])
          batch.foreach { a =>
            val key = (a.d, a.v)
            m = m.updated(key, m.getOrElse(key, 0L) + 1L)
          }
          state.update(m)
          val days = m.keysIterator.map(_._1).toSeq.distinct.sorted
          val snap =
            if (days.size <= baselineDays)
              KsDriftSnapshot(scope, days.size.toLong, 0L, 0L, 0L, 0L,
                alarmNow = false, defined = false)
            else {
              val cut = days(baselineDays - 1)
              var nRef = 0L; var nLive = 0L
              val refG = scala.collection.mutable.Map.empty[Long, Long]
              val liveG = scala.collection.mutable.Map.empty[Long, Long]
              m.foreach { case ((d, v), c) =>
                if (d <= cut) { refG(v) = refG.getOrElse(v, 0L) + c; nRef += c }
                else { liveG(v) = liveG.getOrElse(v, 0L) + c; nLive += c }
              }
              val merged = (refG.keySet ++ liveG.keySet).toSeq.sorted
              var cr = 0L; var clv = 0L; var dNum = 0L
              merged.foreach { v =>
                cr += refG.getOrElse(v, 0L)
                clv += liveG.getOrElse(v, 0L)
                dNum = math.max(dNum, math.abs(cr * nLive - clv * nRef))
              }
              val dD = dNum.toDouble / (nRef.toDouble * nLive.toDouble)
              val crit = math.sqrt(-math.log(0.005) / 2.0) *
                math.sqrt((nRef + nLive).toDouble / (nRef.toDouble * nLive.toDouble))
              KsDriftSnapshot(scope, days.size.toLong, nRef, nLive, dNum,
                math.floor(dD * 1e6 + 0.5).toLong,
                alarmNow = dD > crit, defined = true)
            }
          Iterator(snap)
      }
  }

  final case class WeightedArrival(scope: String, id: Long, w: Long)
  final case class ReservoirSnapshot(scope: String, nSeen: Long, nDropped: Long,
      sample: String)

  /** q237's streaming twin: a per-scope weighted reservoir WITHOUT
    * replacement (Efraimidis & Spirakis 2006 — the one-pass reservoir
    * IS the streaming algorithm; the batch q237 is its TakeOrdered
    * specialization). State per scope is the current top-[[EsStateK]]
    * items by the deterministic selection key ln(u)/w (u hash-derived
    * from the id exactly as q237 — the q56 seeded-generator
    * discipline), pico-floored to a long with id tie-break. Determinism
    * is what upgrades the reservoir from distributionally-correct to
    * EXACTLY TESTABLE: every trigger's sample equals the batch top-k
    * over the stream prefix, which the spec pins per trigger. State is
    * O(k) triples forever; the fold is order-robust (a max-k of
    * deterministic keys commutes), and an at-least-once REPLAY of an
    * item recomputes the identical key so the SAMPLE is
    * replay-idempotent — only nSeen counts deliveries (documented;
    * exact-once delivery counts are the store layer's job, not the
    * sketch's). Nonpositive weights are excluded and counted
    * (`nDropped`, the hdr contract). Snapshot serializes the sample as
    * "id:w:key" in (key desc, id asc) order. */
  val EsStateK = 20
  def weightedReservoirState(arr: Dataset[WeightedArrival]): Dataset[ReservoirSnapshot] = {
    import arr.sparkSession.implicits._
    def keyOf(id: Long, w: Long): Long = {
      val s = s"es#$id"
      val h = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
      val u = (h + 1).toDouble / 1000000008.0
      math.floor(math.log(u) / w.toDouble * 1e12).toLong
    }
    arr.groupByKey(_.scope)
      .flatMapGroupsWithState[(Map[Long, (Long, Long)], Long, Long), ReservoirSnapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (scope: String, batch: Iterator[WeightedArrival],
         state: GroupState[(Map[Long, (Long, Long)], Long, Long)]) =>
          // state: id -> (key_pico, w), plus delivery + drop counters
          var (top, n, dropped) = state.getOption
            .getOrElse((Map.empty[Long, (Long, Long)], 0L, 0L))
          batch.foreach { a =>
            if (a.w <= 0) dropped += 1
            else {
              n += 1
              if (!top.contains(a.id)) {
                top = top.updated(a.id, (keyOf(a.id, a.w), a.w))
                if (top.size > EsStateK) {
                  // evict the minimum by (key asc, id desc) — the
                  // complement of the keep order
                  val evict = top.minBy { case (id, (k, _)) => (k, -id) }._1
                  top = top.removed(evict)
                }
              }
            }
          }
          state.update((top, n, dropped))
          val sample = top.toSeq
            .sortBy { case (id, (k, _)) => (-k, id) }
            .map { case (id, (k, w)) => s"$id:$w:$k" }.mkString(",")
          Iterator(ReservoirSnapshot(scope, n, dropped, sample))
      }
  }

  /** ST4: bounded-retry wrapper around a sink action. Retries transient
    * failures up to `maxAttempts` (xai_tasks.py:137-163 semantics:
    * backoff + terminal give-up); returns the number of attempts used or
    * throws after exhaustion. */
  def withBoundedRetry[T](maxAttempts: Int, backoffMs: Long = 0L)(action: () => T): (T, Int) = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      try return (action(), attempt)
      catch {
        case e: Throwable =>
          last = e
          if (attempt < maxAttempts && backoffMs > 0) Thread.sleep(backoffMs)
      }
    }
    throw new RuntimeException(s"sink failed after $maxAttempts attempts", last)
  }
}

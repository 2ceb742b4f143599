package graft.streaming

import graft.Tables
import graft.llm.{LlmQueries, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The q196 curation canon as ONE streaming ingest pipeline — the
  * round-10 verdict's directive #6. q196 proves the batch composition
  * (Gopher A1.1 ∧ A1.2 → CCNet perplexity cut → DSIR selection → exact
  * dedup → eval holdout → decontamination → packing); the single-gate
  * streaming twins existed separately. This chains them so a CHOPPED
  * STREAM through the composed gates admits exactly q196's survivor
  * set, with each stage in its production-shaped streaming form:
  *
  *  - per-document batteries (Gopher quality + repetition) evaluate
  *    inline on each micro-batch — the SAME `TextOps` rules the batch
  *    tier runs, one rule shared across tiers;
  *  - corpus-global criteria score against a FROZEN REFERENCE FIT
  *    ([[saveReference]]): the per-language LM tables + tercile cut
  *    pair, the DSIR llr array + selection cut pair, and the
  *    rare-shingle/eval contamination index. This is how production
  *    ingest works (CCNet ships a pretrained KenLM; DSIR weights come
  *    from a reference corpus) — and it is what makes the gate
  *    GENERALIZING: an unseen document gets a real score, not a
  *    doc_id lookup. Cuts are (value, doc_id) PAIRS, not thresholds,
  *    so rank-boundary ties resolve exactly as the batch tercile/
  *    quantile windows resolved them;
  *  - exact dedup and packing are STATEFUL: admitted content hashes
  *    append to a durable per-batch index (decisions derive only from
  *    the frozen reference + EARLIER batch dirs, the
  *    [[StreamOps.textDupGateIngestBatch]] replay discipline — a
  *    re-delivered batch recomputes the identical decision and
  *    rewrites the identical dir), and pack ids come from per-source
  *    cumulative token totals over previously admitted docs.
  *
  * Keep-set parity with q196 (CurationIngestSpec) holds for an
  * id-ordered ingest (contiguous doc_id chops): exact dedup keeps the
  * FIRST arrival per hash, which equals q196's min-doc_id
  * representative exactly when duplicates arrive in id order — the
  * same precondition q139 documents for stable sharding. Out-of-order
  * ingest admits the same COUNT per hash group but a different
  * representative — which [[reconciled]] closes: every gate-passing
  * arrival is ledgered (`seen/`), group facts are text-derived
  * (`hashes/` carries n_tokens + the contamination verdict), so a
  * compaction-time read re-seats min-id representatives and replays
  * holdout + packing to land EXACTLY on q196's set for ANY arrival
  * order (CurationIngestSpec's shuffled-ingest test).
  *
  * Scale shape per batch: every gate is scan-shaped or a broadcast-
  * sized join against bounded frozen artifacts (LM tables are
  * vocabulary-bounded, llr is one 256-slot array, the contamination
  * index is df-capped); the dedup probe is one anti-join on content
  * hash; state reads scan only ADMITTED batch dirs (a production
  * deployment compacts them like the TieredParquet gates — totals are
  * one aggregate over admitted rows, never the text). */
object CurationIngest {

  // ---------------------------------------------------------- reference

  /** Freeze the corpus-global fits the ingest gates score against.
    * Everything derives from the standalone queries' OWN definitions
    * (the q196 discipline): the LM fit via [[LlmQueries.lmFit]], cut
    * pairs read off q133/q132's outputs, the contamination index via
    * [[LlmQueries.rareShingleIndex]]. */
  def saveReference(spark: SparkSession, corpusDir: String, refDir: String): Unit = {
    val docs = Tables.documents(spark, corpusDir)
    val occ = LlmQueries.lmOccurrences(docs).cache()
    try {
      val (c2, c1, vocabDef) = LlmQueries.lmFit(docs, occ)
      c2.write.mode("overwrite").parquet(s"$refDir/lm_c2")
      c1.write.mode("overwrite").parquet(s"$refDir/lm_c1")
      vocabDef.write.mode("overwrite").parquet(s"$refDir/lm_vocab")
      // tercile cut = the LAST KEPT (ce, doc_id) per language in the
      // batch ranking order (ce asc, doc_id asc): kept is a rank prefix,
      // so "≤ cut pair" reproduces the rank cut including boundary ties
      LlmQueries.queries("q133_ngram_lm_ppl")(spark, corpusDir)
        .filter(col("ppl_bucket") =!= "tail")
        .groupBy(col("lang"))
        .agg(max(struct(col("ce"), col("doc_id"))).as("cut"))
        .select(col("lang"), col("cut.ce").as("cut_ce"), col("cut.doc_id").as("cut_id"))
        .write.mode("overwrite").parquet(s"$refDir/lm_cut")
    } finally occ.unpersist()

    import spark.implicits._
    LlmQueries.dsirLlrFit(spark, corpusDir).toSeq.zipWithIndex
      .map { case (w, b) => (b.toLong, w) }.toDF("b", "llr")
      .write.mode("overwrite").parquet(s"$refDir/dsir_llr")
    // selection cut = last kept (log_w, doc_id) in (log_w desc, doc_id
    // asc) order — min log_w, max doc_id among its ties
    LlmQueries.queries("q132_dsir_select")(spark, corpusDir)
      .filter(col("selected") === 1)
      .agg(min(struct(col("log_w"), (-col("doc_id")).as("nid"))).as("cut"))
      .select(col("cut.log_w").as("cut_w"), (-col("cut.nid")).as("cut_id"))
      .write.mode("overwrite").parquet(s"$refDir/dsir_cut")

    val rare = LlmQueries.rareShingleIndex(docs, docs.count()).cache()
    try {
      rare.select(col("h")).distinct()
        .write.mode("overwrite").parquet(s"$refDir/rare_keys")
      rare.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("eval_id"), col("h"))
        .write.mode("overwrite").parquet(s"$refDir/eval_sh")
    } finally rare.unpersist()
  }

  // ------------------------------------------------------------- ingest

  /** Attach the composed gate to a stream of
    * (doc_id, source, lang, text) arrivals. */
  def ingestSink(arrivals: DataFrame, refDir: String, stateDir: String,
      checkpointDir: String): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, refDir, stateDir)
      }
      .start()

  /** A batch dir counts as COMMITTED only once its `_SUCCESS` marker
    * exists: Spark creates the output directory at job start and the
    * committer places `_SUCCESS` last, so directory existence alone
    * would read a torn (crashed-mid-write) dir as a finished batch —
    * the replay would then skip recomputation and permanently lose that
    * batch's admissions. Everything below (the replay skip AND the
    * prior-state reads) keys on the marker, so a torn write is
    * recomputed exactly like the tested hashes-only crash. */
  private def committed(dir: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS"))

  /** COMMITTED batch dirs under `root` EXCLUDING the given label — the
    * replay-safety read shape (a torn dir is invisible until its owner
    * batch replays and rewrites it). */
  private def priorLabels(root: String, label: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.isDirectory(p)) Seq.empty
    else {
      val s = java.nio.file.Files.list(p)
      try s.iterator().asScala.toSeq
        .filter(d => java.nio.file.Files.isDirectory(d) &&
          d.getFileName.toString.startsWith("batch=") &&
          d.getFileName.toString != label &&
          committed(d.toString))
        .map(_.toString)
      finally s.close()
    }
  }

  /** The per-batch composed admit-and-append, visible so replay
    * semantics are directly testable. */
  def ingestBatch(batch: DataFrame, batchId: Long, refDir: String,
      stateDir: String): Unit = {
    val spark = batch.sparkSession
    val label = s"batch=$batchId"
    // replay: identical recompute, skip — gated on the batch's _SUCCESS
    // marker, NOT directory existence (see [[committed]])
    if (committed(s"$stateDir/admitted/$label")) return

    val arr = batch.select(col("doc_id"), col("source"), col("lang"), col("text"))

    // ---- per-doc batteries (one rule shared with the batch tier).
    // q196 composes the A1.1 conjunction MINUS the distinct-stop-word
    // rule (corpus-hostile on the synthetic vocabulary — documented
    // there); the stream composes the identical conjunction.
    val gopherKeep = TextOps.gopherRules(arr, "text")
      .filter(col("r_words") * col("r_mean_len") * col("r_symbol") *
        col("r_alpha") * col("r_bullet") * col("r_ellipsis") === 1)
      .select("doc_id")
    val repKeep = TextOps.repetitionRules(arr, "text")
      .filter(col("rep_pass") === 1).select("doc_id")

    // ---- frozen-reference scores with exact rank-boundary cut pairs
    val lmCut = spark.read.parquet(s"$refDir/lm_cut")
    val pplKeep = LlmQueries.lmScore(arr,
        spark.read.parquet(s"$refDir/lm_c2"),
        spark.read.parquet(s"$refDir/lm_c1"),
        spark.read.parquet(s"$refDir/lm_vocab"))
      .join(lmCut, Seq("lang")) // unknown language ⇒ no cut ⇒ rejected
      .filter(struct(col("ce"), col("doc_id")) <=
        struct(col("cut_ce"), col("cut_id")))
      .select("doc_id")
    val llr = {
      val rows = spark.read.parquet(s"$refDir/dsir_llr").collect()
      val a = Array.fill(LlmQueries.DsirBuckets)(0L)
      rows.foreach(r => a(r.getLong(0).toInt) = r.getLong(1))
      a
    }
    val dsirCutRow = spark.read.parquet(s"$refDir/dsir_cut").head()
    val (cutW, cutId) = (dsirCutRow.getDouble(0), dsirCutRow.getLong(1))
    val dsirKeep = LlmQueries.dsirScore(arr, llr)
      .filter(col("log_w") > cutW ||
        (col("log_w") === cutW && col("doc_id") <= cutId))
      .select("doc_id")

    val gated = arr
      .join(gopherKeep, Seq("doc_id"), "left_semi")
      .join(repKeep, Seq("doc_id"), "left_semi")
      .join(pplKeep, Seq("doc_id"), "left_semi")
      .join(dsirKeep, Seq("doc_id"), "left_semi")

    // ---- stateful exact dedup: first arrival per content hash wins
    // (== q196's min-doc_id representative under id-ordered ingest).
    // Decisions read only EARLIER batch dirs — a replayed batch that
    // somehow reaches here (its admitted dir lost mid-write) recomputes
    // against the same prefix and rewrites identically.
    // persisted for the BATCH's duration: three sink writes (seen/,
    // hashes/, admitted/) read this lineage, and uncached each would
    // re-execute the full gate cascade (gopher + repetition + ppl +
    // dsir batteries + the hash) on the foreachBatch latency path —
    // 3× the dominant cost per trigger. Safe to cache (not a
    // read-then-mutate hazard): every upstream read is pinned to
    // PRIOR-label dir lists resolved at plan time, so a recomputed
    // partition sees the identical prefix. Released after the
    // admitted write.
    val hashed = gated.withColumn("h", TextOps.rollingHash(col("text")))
      .persist()
    val wD = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    val firstInBatch = hashed
      .withColumn("rn", row_number().over(wD)).filter(col("rn") === 1).drop("rn")
    // the index read EXCLUDES this batch's own label: a crash between
    // the hashes write and the admitted write replays into a recompute,
    // and reading its own prior hash append would make every admitted
    // doc "a duplicate of itself" (the IncrementalDedup hazard)
    val idxDirs = priorLabels(s"$stateDir/hashes", label)
    val survivors =
      if (idxDirs.nonEmpty) {
        val idx = spark.read.parquet(idxDirs: _*).select(col("h"))
        firstInBatch.join(idx, Seq("h"), "left_anti")
      } else firstInBatch

    // ---- decontamination against the frozen index, computed for ALL
    // survivors (pre-holdout): the predicate is TEXT-derived, so the
    // flag holds for every member of the hash group — which is what
    // lets [[reconciled]] re-seat the representative without the
    // rejected duplicates' text
    val rareKeys = spark.read.parquet(s"$refDir/rare_keys")
    val evalSh = spark.read.parquet(s"$refDir/eval_sh")
    val docSh = survivors
      .withColumn("tk", TextOps.tokens(col("text")))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"),
        explode(array_distinct(TextOps.bigrams(col("tk")))).as("b"))
      .select(col("doc_id"), TextOps.rollingHash(col("b")).as("h"))
      .join(rareKeys, Seq("h"))
    val nSh = docSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val contaminated = docSh.join(nSh, Seq("doc_id"))
      .join(evalSh, Seq("h"))
      .groupBy(col("doc_id"), col("eval_id"), col("n_sh"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3 && col("n_shared") * 2 >= col("n_sh"))
      .select("doc_id").distinct()
    // one row per hash group GLOBALLY (dedup keeps only the first
    // overall arrival) with the group's text-derived facts — the group
    // half of the reconciliation ledger
    val survFlagged = survivors
      .withColumn("n_tokens", size(TextOps.tokens(col("text"))).cast("long"))
      .join(contaminated.withColumn("contaminated", lit(true)), Seq("doc_id"), "left")
      .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
      // two consumers (the hashes/ ledger write + the admitted write's
      // clean set) — cached so dedup + decontamination run once per batch
      .persist()
    // LEDGER WRITE ORDER: hashes/ BEFORE seen/ — [[reconciled]] joins
    // min-id representatives (from seen/) with group facts (from
    // hashes/), so a crash window where seen/ leads would make groups
    // first seen in the torn batch VISIBLE in the arrivals ledger yet
    // silently dropped by the join (an inconsistent read). With hashes/
    // leading, every committed seen/ group has its facts: a torn batch
    // reads as "batch fully absent" (a consistent prefix) until the
    // replay lands, and [[reconciled]] asserts the invariant.
    survFlagged.select(col("h"), col("doc_id"), col("source"),
        col("n_tokens"), col("contaminated"))
      .write.mode("overwrite").parquet(s"$stateDir/hashes/$label")
    // the reconciliation ledger ([[reconciled]]): EVERY gate-passing
    // arrival, pre-dedup — min-id representatives are recoverable at
    // compaction no matter the arrival order
    hashed.select(col("h"), col("doc_id"), col("source"))
      .write.mode("overwrite").parquet(s"$stateDir/seen/$label")

    // ---- eval holdout + the stored contamination verdict
    val clean = survFlagged
      .filter(col("doc_id") % 10 =!= 0 && !col("contaminated"))

    // ---- packing: per-source cumulative tokens over previously
    // admitted docs (derived from durable state, not driver memory)
    val admittedDirs = priorLabels(s"$stateDir/admitted", label)
    val priorTotals: DataFrame =
      if (admittedDirs.nonEmpty)
        spark.read.parquet(admittedDirs: _*)
          .groupBy(col("source")).agg(sum(col("n_tokens")).as("prior"))
      else {
        import spark.implicits._
        Seq.empty[(String, Long)].toDF("source", "prior")
      }
    val wB = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = clean
      .join(priorTotals, Seq("source"), "left")
      .withColumn("cum_before",
        coalesce(col("prior"), lit(0L)) +
          coalesce(sum(col("n_tokens")).over(wB), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"cum_before div ${LlmQueries.PackWindow}").as("pack_id"))
    out.write.mode("overwrite").parquet(s"$stateDir/admitted/$label")
    // batch-scoped caches released once the last sink has consumed them
    survFlagged.unpersist()
    hashed.unpersist()
  }

  /** The admitted set so far: (doc_id, source, n_tokens, pack_id) —
    * q196's output shape, for the parity bridge. Representative
    * identity matches q196 only under id-ordered ingest (scaladoc
    * above); [[reconciled]] is the order-independent read. */
  def admitted(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/admitted")
      .select("doc_id", "source", "n_tokens", "pack_id")

  /** The admitted set under MIN-ID representative reconciliation — the
    * compaction-time read that closes the ingest's one documented
    * order-sensitivity: out-of-order arrival admits the right hash
    * GROUPS but a first-arrival (not min-id) representative, so the
    * streamed `admitted` set can differ from q196's on doc identity.
    * This re-seats every group's representative from the `seen/` ledger
    * (all gate-passing arrivals) and re-derives the member-invariant
    * facts from the `hashes/` ledger (n_tokens and the contamination
    * verdict are TEXT-derived, so the stored survivor's values hold for
    * the re-seated representative), then replays holdout + packing on
    * the reconciled set — q196's exact batch semantics, arrival-order
    * independent. The per-source packing window is the q196/q130 shape
    * (partitioned by source, never global). Run at compaction (the
    * IncrementalDedup generation-fold seam): like every read here it
    * scans only COMMITTED ledgers, and ingest may continue appending —
    * reconciliation is a pure read. */
  def reconciled(spark: SparkSession, stateDir: String): DataFrame = {
    // committed ledgers only (the _SUCCESS discipline): a torn write from
    // an in-flight batch must not contribute phantom arrivals
    val seenDirs = priorLabels(s"$stateDir/seen", label = "")
    val hashDirs = priorLabels(s"$stateDir/hashes", label = "")
    require(seenDirs.nonEmpty && hashDirs.nonEmpty,
      s"no committed ingest state under $stateDir")
    val seen = spark.read.parquet(seenDirs: _*)
      .select(col("h"), col("doc_id"), col("source"))
    val reps = seen.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("source"))).as("rep"))
      .select(col("h"), col("rep.doc_id").as("doc_id"), col("rep.source").as("source"))
    // ONE info row per group: a replayed first-arrival batch committing
    // AFTER a later batch independently indexed the same group leaves
    // two fact rows for one h — the facts are text-derived and the
    // group shares one text, so any member's row is correct; min-struct
    // keeps the pick deterministic (never a row-per-duplicate fan-out
    // into the packing sum)
    val info = spark.read.parquet(hashDirs: _*)
      .groupBy(col("h"))
      .agg(min(struct(col("n_tokens"), col("contaminated"))).as("i"))
      .select(col("h"), col("i.n_tokens").as("n_tokens"),
        col("i.contaminated").as("contaminated"))
    // the hashes-before-seen write order makes this an INVARIANT, not a
    // race: every group visible in the committed arrivals ledger has
    // committed facts. A violation means ledger corruption (manual
    // deletion, mixed-version writers) and must refuse loudly rather
    // than silently dropping groups from the reconciled corpus.
    val orphans = reps.join(info, Seq("h"), "left_anti").count()
    require(orphans == 0L,
      s"$orphans seen/ hash group(s) have no committed hashes/ facts under " +
        s"$stateDir — ledger corruption (the hashes-first write order " +
        "guarantees facts commit before arrivals)")
    val fin = reps.join(info, "h")
      .filter(col("doc_id") % 10 =!= 0 && !col("contaminated"))
    val wB = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    fin
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(wB), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"cum_before div ${LlmQueries.PackWindow}").as("pack_id"))
  }

  /** Span-grain dedup over the ADMITTED corpus — the compaction-time
    * composition of [[graft.llm.LlmQueries.spanDedupStats]] (q234's
    * operator, Lee et al. 2021 §4.2's removal half) with the ingest
    * state: the ledgers hold hashes, not text, so the span pass reads
    * the reconciled doc_ids' text back from the corpus store — exactly
    * where a production compactor runs it, after representative
    * reconciliation and before the packed rewrite. Equals
    * `q235_curation_spans` when ingest covered the same corpus
    * (CurationIngestSpec pins it, shuffled arrival included). */
  def spanStats(spark: SparkSession, corpusDir: String, stateDir: String): DataFrame =
    LlmQueries.spanDedupStats(
      Tables.documents(spark, corpusDir)
        .join(reconciled(spark, stateDir).select(col("doc_id")), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("text")))
}

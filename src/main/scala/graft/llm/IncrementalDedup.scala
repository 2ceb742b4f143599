package graft.llm

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Stateful incremental near-duplicate dedup — the ingestion form of the
  * q37 whole-corpus MinHash dedup. A persisted index (two parquet tables:
  * the band table for candidate generation, the doc store for exact
  * verification) holds every doc ADMITTED so far; each `ingest` call
  * dedups one incoming batch against that index AND within itself, then
  * adds the batch's admissions so later batches dedup against them
  * too. Corpus text is never re-read: each batch pays only for itself
  * plus its LSH bucket collisions, which is the property that turns
  * dedup from a corpus-sized job into a per-ingest operation at 100 TB.
  *
  * Semantics — greedy order-respecting dedup: a doc is ADMITTED iff it
  * has no verified near-dup neighbor (banding candidate with exact
  * Jaccard ≥ θ after the shared 4dp floor) among already-admitted docs
  * with smaller doc_id; a rejected doc's `dup_of` is its SMALLEST
  * admitted verified neighbor. This is exactly the result of scanning
  * the corpus one doc at a time in id order — so as long as batches
  * arrive in id order, the decisions are invariant under how the stream
  * is chopped into batches (one batch, many batches, or per-doc all give
  * bit-identical output; `IncrementalDedupSpec` pins this). That
  * invariance is what makes incremental ingestion trustworthy: re-chunking
  * the pipeline can never change which docs survive.
  *
  * Within a batch the greedy order is computed WITHOUT a sequential
  * scan: greedy-by-id dedup is the lexicographically-first maximal
  * independent set of the verified-pair graph, and that MIS is computed
  * in parallel rounds (Blelloch, Fineman & Shun, SPAA'12: "Greedy
  * sequential maximal independent set and matching are parallel on
  * average") — each round admits the docs with no smaller-id undecided
  * neighbor (their smaller neighbors are all rejected by construction)
  * and rejects every undecided doc adjacent to a new admission. Every
  * round is a handful of joins on the (tiny, candidate-only) verified
  * pair set; round count is bounded by the longest smaller-id dependency
  * chain, a few rounds in practice. `dup_of` attribution runs as one
  * post-pass over the pair set (min admitted smaller neighbor), which is
  * where it matches the sequential definition even when a doc's
  * round-of-rejection saw only part of its neighborhood.
  *
  * == Durability layout (replay-safe under at-least-once delivery) ==
  *
  * {{{
  *   indexDir/_gen                      one-line pointer: current generation
  *   indexDir/<gen>/docs/<batchId>/     one ingest's admitted (doc_id, hh, sig)
  *   indexDir/<gen>/bands/<batchId>/    its band table
  *   indexDir/<gen>/_committed/<batchId>   empty marker, created LAST
  *   indexDir/_decisions/<batchId>/     its decision rows (the audit trail)
  * }}}
  *
  * Readers see ONLY batches with a commit marker, every per-batch write
  * is `overwrite` (re-running it is harmless), and the marker is the
  * final step — so under foreachBatch's at-least-once contract a
  * replayed micro-batch either short-circuits on its marker (returning
  * the RECORDED decisions) or recomputes against exactly the index state
  * the original attempt saw, because its own partial writes were never
  * visible. Without this, a replay would find the batch's own admissions
  * in history and reject every doc as a duplicate of itself.
  * Single-writer, like the repo's other persisted ingest artifacts.
  *
  * Reference behavior: the reference deduplicates per training load
  * (pandas `drop_duplicates`, train_model.py); this operator is the
  * standing-index form that survives data too large to re-scan per load.
  */
object IncrementalDedup {

  private val DocSchema = "doc_id long, hh array<bigint>, sig array<bigint>"
  private val BandSchema = "doc_id long, band_id int, k0 long, k1 long"
  private val DecSchema = "doc_id long, admitted long, dup_of long"

  /** Same 4dp floor as q37/q207 and their DuckDB twins — the gate must
    * round identically on both engines or the neighbor relation (and so
    * every decision) diverges. */
  private def fpRound4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0

  private def jaccardPass(theta: Double): Column = {
    val inter = size(array_intersect(col("set_a"), col("set_b")))
    fpRound4(inter.cast("double") /
      (size(col("set_a")) + size(col("set_b")) - inter)) >= theta
  }

  /** Sound xor-popcount candidate prefilter (the q118 kernel, r16):
    * popcount(sig256(A) ⊕ sig256(B)) ≤ |A Δ B| always (each differing
    * bit needs ≥1 element unique to one side), and the 4dp-rounded
    * Jaccard gate bounds |A Δ B| — so any pair whose signatures differ
    * in more bits than the bound CANNOT pass [[jaccardPass]] and can be
    * dropped BEFORE the distinct shuffle and the hh-array attach joins,
    * with zero lost pairs. Measured at sf0.1: banding yields 92 709
    * candidate pairs of which 256 verify (0.3 %) — 99.7 % of the
    * verify-stage bytes and array-intersect work die here.
    *
    * Bound derivation (exact): the gate is floor(j·10⁴ + 0.5) ≥ θ·10⁴
    * with j = inter/union; the left side is an integer, so the gate ⟺
    * floor(...) ≥ T with T = ⌈θ·10⁴⌉ ⟺ j ≥ (2T−1)/20000. With
    * la = |A|, lb = |B|: inter ≥ ⌈(2T−1)(la+lb)/(20000+2T−1)⌉ =: tmin,
    * hence |A Δ B| = la+lb−2·inter ≤ la+lb−2·tmin. All longs; the
    * products stay ≤ 2·10⁴·(la+lb), far inside int64. */
  private[llm] def xorPrune(theta: Double, la: Column, lb: Column,
      sa: Column, sb: Column): Column = {
    val T = math.ceil(theta * 10000.0 - 1e-9).toLong
    val num = 2L * T - 1L
    val den = 20000L + num
    val sum = la.cast("long") + lb.cast("long")
    val tmin = ((lit(num) * sum + lit(den - 1L)) / lit(den)).cast("long")
    call_function("xor_popcount", sa, sb) <= sum - lit(2L) * tmin
  }

  /** [[bandsOf]] carrying the per-doc prefilter metadata (set size +
    * 256-bit signature) through the explode — the within-batch candidate
    * join then filters at its output with no extra joins. */
  private def bandsOfMeta(df: DataFrame, numBands: Int): DataFrame = {
    val bandArr = array((0 until numBands).map { j =>
      struct(lit(j).as("band_id"),
        col("sig").getItem(2 * j).as("k0"),
        col("sig").getItem(2 * j + 1).as("k1"))
    }: _*)
    df.select(col("doc_id"), col("ln"), col("s256"), explode(bandArr).as("b"))
      .select(col("doc_id"), col("ln"), col("s256"),
        col("b.band_id"), col("b.k0"), col("b.k1"))
  }

  /** r=2 banding grid: band j = (sig[2j], sig[2j+1]), matching the q37
    * planner layout. */
  private def bandsOf(df: DataFrame, numBands: Int): DataFrame = {
    val bandArr = array((0 until numBands).map { j =>
      struct(lit(j).as("band_id"),
        col("sig").getItem(2 * j).as("k0"),
        col("sig").getItem(2 * j + 1).as("k1"))
    }: _*)
    df.select(col("doc_id"), explode(bandArr).as("b"))
      .select(col("doc_id"), col("b.band_id"), col("b.k0"), col("b.k1"))
  }

  private def emptyDF(s: SparkSession, ddl: String): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType.fromDDL(ddl))

  /** Current generation via the `_gen` pointer (absent = `g0`, the
    * fresh-index case). The pointer is what lets [[compact]] cut over to
    * a rewritten generation with ONE atomic rename. */
  private def genOf(indexDir: String): String = {
    val f = new java.io.File(s"$indexDir/_gen")
    if (f.exists())
      new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim
    else "g0"
  }

  /** Batch ids with a commit marker in this generation — the ONLY
    * batches any reader sees. Sorted for deterministic path lists. */
  private def committed(indexDir: String, gen: String): Seq[String] = {
    val d = new java.io.File(s"$indexDir/$gen/_committed")
    Option(d.listFiles()).map(_.map(_.getName).toSeq.sorted).getOrElse(Seq.empty)
  }

  private def commitMarker(indexDir: String, gen: String, batchId: String): Unit = {
    val dir = java.nio.file.Paths.get(s"$indexDir/$gen/_committed")
    java.nio.file.Files.createDirectories(dir)
    try java.nio.file.Files.createFile(dir.resolve(batchId))
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
  }

  private def loadTable(s: SparkSession, indexDir: String, table: String,
                        ddl: String): DataFrame = {
    val gen = genOf(indexDir)
    val parts = committed(indexDir, gen)
      .map(b => s"$indexDir/$gen/$table/$b")
      .filter(p => new java.io.File(p).exists())
    if (parts.isEmpty) emptyDF(s, ddl)
    else s.read.schema(ddl).parquet(parts: _*)
  }

  /** The admitted-doc store (doc_id, hh, sig) over all committed
    * ingests; an absent index is an empty corpus, not an error. */
  def loadDocs(s: SparkSession, indexDir: String): DataFrame =
    loadTable(s, indexDir, "docs", DocSchema)

  private def loadBands(s: SparkSession, indexDir: String): DataFrame =
    loadTable(s, indexDir, "bands", BandSchema)

  /** The decision audit trail — every committed ingest's (doc_id,
    * admitted, dup_of) rows, i.e. the full dedup history of everything
    * the index reflects. */
  def loadDecisions(s: SparkSession, indexDir: String): DataFrame = {
    val gen = genOf(indexDir)
    val parts = committed(indexDir, gen)
      .map(b => s"$indexDir/_decisions/$b")
      .filter(p => new java.io.File(p).exists())
    if (parts.isEmpty) emptyDF(s, DecSchema)
    else s.read.schema(DecSchema).parquet(parts: _*)
  }

  /** Compact the index: every ingest adds one batch dir per table, so a
    * long-running pipeline accretes files exactly like any streamed fact
    * table — this folds all committed batches of the current generation
    * into one `filesPerTable`-file batch per table and cuts over with the
    * atomic `_gen` rename. Commit markers (names only) carry forward so a
    * micro-batch replayed from before the compaction still
    * short-circuits instead of re-ingesting against its own folded
    * admissions; the decision audit under `_decisions/` is untouched.
    * Crash-safe at every step: before the rename the old generation is
    * live and the half-built rewrite is invisible, re-runnable garbage
    * (every write is overwrite); after it, only dead dirs remain to
    * sweep. Single-writer, like ingest. */
  def compact(s: SparkSession, indexDir: String, filesPerTable: Int = 1): Unit = {
    val cur = genOf(indexDir)
    val next = "g" + (cur.drop(1).toLong + 1)
    loadDocs(s, indexDir).repartition(filesPerTable)
      .write.mode("overwrite").parquet(s"$indexDir/$next/docs/compacted")
    loadBands(s, indexDir).repartition(filesPerTable)
      .write.mode("overwrite").parquet(s"$indexDir/$next/bands/compacted")
    committed(indexDir, cur).foreach(b => commitMarker(indexDir, next, b))
    commitMarker(indexDir, next, "compacted")
    val tmp = java.nio.file.Paths.get(s"$indexDir/_gen.tmp")
    java.nio.file.Files.write(tmp,
      next.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$indexDir/_gen"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(new java.io.File(s"$indexDir/$cur"))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Dedup `batchIn` (doc_id, hh, sig — unique ids, all larger than any
    * previously ingested id for the order-invariance contract) against
    * the index at `indexDir`, commit its admissions to the index, and
    * return one decision row per batch doc: (doc_id, admitted 1|0,
    * dup_of — the smallest admitted verified neighbor, null when
    * admitted).
    *
    * Idempotent per (indexDir, batchId): re-invoking with an
    * already-committed id — a foreachBatch replay after a crash — does
    * no work and returns the recorded decisions (pass the micro-batch id
    * as `batchId` from streaming; the default fresh UUID gives plain
    * batch calls no replay semantics). Ids must be filesystem-safe.
    *
    * Throws `IllegalStateException` if the within-batch MIS needs more
    * than `maxRounds` rounds (a smaller-id dependency chain longer than
    * maxRounds) — a partial answer would silently admit docs whose fate
    * is undecided, and the caller could not tell.
    *
    * The decision rows land durably under `_decisions/<batchId>` and the
    * returned frame READS that: no live caches behind it (all
    * intermediates are dropped before return). */
  def ingest(s: SparkSession, indexDir: String, batchIn: DataFrame,
             numBands: Int, theta: Double, maxRounds: Int = 12,
             batchId: String = java.util.UUID.randomUUID.toString): DataFrame = {
    val decPath = s"$indexDir/_decisions/$batchId"
    val gen = genOf(indexDir)
    if (!committed(indexDir, gen).contains(batchId))
      run(s, indexDir, gen, batchIn, numBands, theta, maxRounds, batchId, decPath)
    s.read.schema(DecSchema).parquet(decPath)
  }

  /** Shared core. Two orderings are load-bearing. (1) The decision rows
    * are WRITTEN to parquet BEFORE the index gains this batch: decisions
    * derive from the pre-ingest index state, and Spark may re-execute a
    * plan after the action that first materialized it (a dependent cache
    * rebuilt on unpersist, a retried task) — re-executed against an
    * index containing this batch, the cross-join would find each
    * admitted doc in history and reject it as a duplicate of itself.
    * Durable files, not a cache entry, are the only recompute-proof
    * carrier for read-then-mutate output. (2) The commit marker is
    * written LAST: a crash anywhere earlier leaves only overwrite-able,
    * reader-invisible partials, so the replay recomputes from exactly
    * the original index state. */
  private def run(s: SparkSession, indexDir: String, gen: String,
                  batchIn: DataFrame, numBands: Int, theta: Double,
                  maxRounds: Int, batchId: String, decisionsOut: String): Unit = {
    // phase labels (guide §1.5): the ingest runs 5 distinct phases whose
    // job costs are otherwise indistinguishable in the scheduler log
    def phase(p: String): Unit =
      s.sparkContext.setJobDescription(s"dedup-ingest: $p")
    val caches = ArrayBuffer[DataFrame]()
    def tracked(df: DataFrame): DataFrame = { df.cache(); caches += df; df }
    // materialize, then detach lineage: rounds see a flat scan of cached
    // rows, not a plan tree that compounds 3x per round (pairs feeds
    // local-minima, rejection, AND the next pair set). The row count
    // rides along so the round loop never pays a second job to ask
    // "is it empty yet".
    def pinned(df: DataFrame): (DataFrame, Long) = {
      val c = tracked(df); val n = c.count()
      (s.createDataFrame(c.rdd, c.schema), n)
    }

    phase("cross-check")
    // ln + s256 computed ONCE per doc into the cached batch (4 longs +
    // an int per row) — every candidate path prefilters on them
    val batch = tracked(batchIn.select(col("doc_id"), col("hh"), col("sig"),
      size(col("hh")).as("ln"),
      call_function("set_sig256", col("hh")).as("s256")))

    // ---- cross check: incoming docs vs the admitted index (new × old
    // only; history is admitted-by-construction, so any verified index
    // neighbor rejects the newcomer). The doc store is semi-join-pruned
    // to candidate docs before its array payloads shuffle. A fresh index
    // (no committed batches) skips the whole stage instead of planning
    // five joins against empty relations.
    val crossRej = tracked(if (committed(indexDir, gen).isEmpty)
      emptyDF(s, "new_id long, dup_of long")
    else {
      val crossCand = bandsOf(batch, numBands).as("x")
        .join(loadBands(s, indexDir).as("y"),
          col("x.band_id") === col("y.band_id") &&
          col("x.k0") === col("y.k0") && col("x.k1") === col("y.k1"))
        .select(col("x.doc_id").as("new_id"), col("y.doc_id").as("old_id"))
        .distinct()
      val oldNeeded = loadDocs(s, indexDir).join(
        crossCand.select(col("old_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
      // prefilter metadata rides the SAME attach joins (4 longs + an int
      // per side, computed once per doc); the xor prune short-circuits
      // the array-intersect verify for the non-matching bulk (the
      // soundness argument on [[xorPrune]]) without adding a join
      crossCand
        .join(batch.select(col("doc_id").as("new_id"), col("hh").as("set_a"),
          col("ln").as("la"), col("s256").as("sa")), "new_id")
        .join(oldNeeded.select(col("doc_id").as("old_id"), col("hh").as("set_b"),
          size(col("hh")).as("lb"),
          call_function("set_sig256", col("hh")).as("sb")), "old_id")
        .filter(xorPrune(theta, col("la"), col("lb"), col("sa"), col("sb")) &&
          jaccardPass(theta))
        // index ids all precede batch ids, so the min index neighbor IS
        // the doc's globally smallest admitted neighbor
        .groupBy(col("new_id")).agg(min(col("old_id")).as("dup_of"))
    })
    val surv = tracked(batch.join(
      crossRej.select(col("new_id").as("doc_id")), Seq("doc_id"), "left_anti"))

    // ---- within-batch verified pairs among survivors (lo < hi). The
    // xor prefilter runs AT THE BAND-JOIN OUTPUT (metadata carried
    // through the explode, no extra join): 99.7 % of banding's false
    // candidates die before the distinct shuffle and the array attach.
    phase("verified-pairs")
    val sBands = bandsOfMeta(surv, numBands)
    val candPairs = sBands.as("x").join(sBands.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.k0") === col("y.k0") && col("x.k1") === col("y.k1") &&
        col("x.doc_id") < col("y.doc_id"))
      .filter(xorPrune(theta, col("x.ln"), col("y.ln"),
        col("x.s256"), col("y.s256")))
      .select(col("x.doc_id").as("lo"), col("y.doc_id").as("hi"))
      .distinct()
    val candDocs = candPairs
      .select(explode(array(col("lo"), col("hi"))).as("doc_id")).distinct()
    val needed = surv.join(candDocs, Seq("doc_id"), "left_semi")
    val (vp, vpCount) = pinned(candPairs
      .join(needed.select(col("doc_id").as("lo"), col("hh").as("set_a")), "lo")
      .join(needed.select(col("doc_id").as("hi"), col("hh").as("set_b")), "hi")
      .filter(jaccardPass(theta))
      .select(col("lo"), col("hi")))

    // ---- parallel greedy MIS: each round's admissions are the docs
    // with no smaller-id undecided neighbor; their undecided neighbors
    // reject. State is ONLY the shrinking pair set — a doc left with no
    // pairs is admitted (every neighbor that could have rejected it was
    // itself rejected first).
    phase("mis-rounds")
    var pairs = vp
    var pairCount = vpCount
    var rejected = emptyDF(s, "doc_id long")
    var rounds = 0
    while (pairCount > 0 && rounds < maxRounds) {
      val lm = pairs.select(col("lo")).distinct()
        .join(pairs.select(col("hi")).distinct(),
          col("lo") === col("hi"), "left_anti")
      val rj = pairs.join(lm, "lo").select(col("hi")).distinct()
      val rm = lm.select(col("lo").as("v"))
        .union(rj.select(col("hi").as("v"))).distinct()
      // linear union chain over per-round cached pair frames (≤ maxRounds
      // small subtrees) — no pinning needed; the caches stay live until
      // the decisions frame materializes through them below
      rejected = rejected.union(rj.select(col("hi").as("doc_id")))
      val (nextPairs, n) = pinned(pairs
        .join(rm.select(col("v").as("lo")), Seq("lo"), "left_anti")
        .join(rm.select(col("v").as("hi")), Seq("hi"), "left_anti"))
      pairs = nextPairs
      pairCount = n
      rounds += 1
    }
    if (pairCount > 0) {
      caches.foreach(_.unpersist())
      throw new IllegalStateException(
        s"incremental dedup MIS did not converge in $maxRounds rounds " +
          "(smaller-id dependency chain too long); raise maxRounds")
    }
    phase("decisions")
    val (rejMis, _) = pinned(rejected.distinct())

    // ---- dup_of post-pass: min admitted smaller neighbor over the FULL
    // verified pair set (the round of rejection may have seen only part
    // of a doc's neighborhood; the sequential definition sees all of it)
    val dupMis = vp
      .join(rejMis.select(col("doc_id").as("hi")), Seq("hi"), "left_semi")
      .join(rejMis.select(col("doc_id").as("lo")), Seq("lo"), "left_anti")
      .groupBy(col("hi")).agg(min(col("lo")).as("dup_of"))
      .withColumnRenamed("hi", "doc_id")

    val admittedDocs = tracked(surv.join(rejMis, Seq("doc_id"), "left_anti"))
    crossRej.select(col("new_id").as("doc_id"), lit(0L).as("admitted"), col("dup_of"))
      .unionAll(dupMis.select(col("doc_id"), lit(0L).as("admitted"), col("dup_of")))
      .unionAll(admittedDocs.select(col("doc_id"), lit(1L).as("admitted"),
        lit(null).cast("long").as("dup_of")))
      .write.mode("overwrite").parquet(decisionsOut)

    phase("index-append")
    // ---- grow the index — ONLY after the decisions landed, and only
    // made visible by the marker (see the ordering notes above):
    // admissions (and their bands, derived from the cached survivor
    // store, not a re-scan) become history for the next batch;
    // [[compact]] folds the batch-dir accretion.
    // project back to DocSchema: ln/s256 are in-session prefilter
    // metadata, not part of the persisted index format
    admittedDocs.select(col("doc_id"), col("hh"), col("sig"))
      .write.mode("overwrite")
      .parquet(s"$indexDir/$gen/docs/$batchId")
    bandsOf(admittedDocs, numBands).write.mode("overwrite")
      .parquet(s"$indexDir/$gen/bands/$batchId")
    commitMarker(indexDir, gen, batchId)

    caches.foreach(_.unpersist())
    s.sparkContext.setJobDescription(null)
  }
}

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
  * appends the batch's admissions so later batches dedup against them
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
  * Reference behavior: the reference deduplicates per training load
  * (pandas `drop_duplicates`, train_model.py); this operator is the
  * standing-index form that survives data too large to re-scan per load.
  */
object IncrementalDedup {

  private val DocSchema = "doc_id long, hh array<bigint>, sig array<bigint>"
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

  /** Index tables live under a GENERATION directory resolved through the
    * one-line `_gen` pointer file (absent pointer = generation `g0`, the
    * fresh-index case). Every reader and every ingest append resolves
    * through the pointer, which is what lets [[compact]] cut over to a
    * rewritten generation with ONE atomic rename while readers always
    * see a complete index — never a half-swapped one. */
  private def genOf(indexDir: String): String = {
    val f = new java.io.File(s"$indexDir/_gen")
    if (f.exists())
      new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim
    else "g0"
  }

  private def readOrEmpty(s: SparkSession, dir: String, ddl: String): DataFrame =
    if (new java.io.File(dir).exists()) s.read.schema(ddl).parquet(dir)
    else emptyDF(s, ddl)

  /** The admitted-doc store (doc_id, hh, sig); an absent index is an
    * empty corpus, not an error. */
  def loadDocs(s: SparkSession, indexDir: String): DataFrame =
    readOrEmpty(s, s"$indexDir/${genOf(indexDir)}/docs", DocSchema)

  private val BandSchema = "doc_id long, band_id int, k0 long, k1 long"

  private def loadBands(s: SparkSession, indexDir: String): DataFrame =
    readOrEmpty(s, s"$indexDir/${genOf(indexDir)}/bands", BandSchema)

  /** Compact the index: every ingest appends one small file set per
    * table, so a long-running pipeline accretes files exactly like any
    * streamed fact table — this folds the current generation into
    * `filesPerTable` files per table and cuts over atomically.
    * Single-writer (like ingest); the decision audit trail under
    * `_decisions/` is untouched. Crash-safety comes from the pointer:
    * the rewritten generation is fully written BEFORE the one atomic
    * `_gen` rename, so a crash before the rename leaves the old
    * generation live (the orphaned rewrite is re-runnable garbage) and a
    * crash after leaves only the old generation's dirs to sweep —
    * readers resolve a complete index in every interleaving. */
  def compact(s: SparkSession, indexDir: String, filesPerTable: Int = 1): Unit = {
    val cur = genOf(indexDir)
    val next = "g" + (cur.drop(1).toLong + 1)
    loadDocs(s, indexDir).repartition(filesPerTable)
      .write.parquet(s"$indexDir/$next/docs")
    loadBands(s, indexDir).repartition(filesPerTable)
      .write.parquet(s"$indexDir/$next/bands")
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
    * the index at `indexDir`, append its admissions to the index, and
    * return one decision row per batch doc: (doc_id, admitted 1|0,
    * dup_of — the smallest admitted verified neighbor, null when
    * admitted).
    *
    * Throws `IllegalStateException` if the within-batch MIS needs more
    * than `maxRounds` rounds (a smaller-id dependency chain longer than
    * maxRounds) — a partial answer would silently admit docs whose fate
    * is undecided, and the caller could not tell.
    *
    * The decision rows land in a scratch parquet under the index
    * (`_decisions/<uuid>` — the per-ingest audit trail) and the returned
    * frame READS that: durable output with no live caches behind it (all
    * intermediates are dropped before return). */
  def ingest(s: SparkSession, indexDir: String, batchIn: DataFrame,
             numBands: Int, theta: Double, maxRounds: Int = 12): DataFrame = {
    val out = s"$indexDir/_decisions/${java.util.UUID.randomUUID}"
    run(s, indexDir, batchIn, numBands, theta, maxRounds, out)
    s.read.schema(DecSchema).parquet(out)
  }

  /** Streaming form: ingest one micro-batch and APPEND its decision rows
    * to `decisionsDir` instead of returning a frame — the foreachBatch
    * host for [[ingest]] (the index is cross-batch state that outlives
    * any single micro-batch, exactly what foreachBatch exists for).
    * Releases every cache it created, so a long-running stream holds no
    * storage between ticks. Micro-batch boundaries don't matter: the
    * batch-split invariance [[ingest]] guarantees (and
    * IncrementalDedupSpec pins) means any chopping of an id-ordered
    * stream admits the same docs. */
  def ingestTo(s: SparkSession, indexDir: String, batchIn: DataFrame,
               numBands: Int, theta: Double, decisionsDir: String,
               maxRounds: Int = 12): Unit =
    run(s, indexDir, batchIn, numBands, theta, maxRounds, decisionsDir)

  /** Shared core. Ordering is load-bearing: the decision rows are
    * WRITTEN to parquet BEFORE the index append. Decisions derive from
    * the pre-append index state, and Spark may re-execute a plan after
    * the action that first materialized it (a dependent cache rebuilt on
    * unpersist, a retried task) — re-executed against the APPENDED index
    * the cross-join would find each admitted doc in history and reject
    * it as a duplicate of itself. Durable files, not a cache entry, are
    * the only recompute-proof carrier for read-then-mutate output. */
  private def run(s: SparkSession, indexDir: String, batchIn: DataFrame,
                  numBands: Int, theta: Double, maxRounds: Int,
                  decisionsOut: String): Unit = {
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

    val batch = tracked(batchIn.select(col("doc_id"), col("hh"), col("sig")))

    // ---- cross check: incoming docs vs the admitted index (new × old
    // only; history is admitted-by-construction, so any verified index
    // neighbor rejects the newcomer). The doc store is semi-join-pruned
    // to candidate docs before its array payloads shuffle. A fresh index
    // (no docs dir yet) skips the whole stage instead of planning five
    // joins against empty relations.
    val freshIndex = !new java.io.File(
      s"$indexDir/${genOf(indexDir)}/docs").exists()
    val crossRej = tracked(if (freshIndex) emptyDF(s, "new_id long, dup_of long")
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
      crossCand
        .join(batch.select(col("doc_id").as("new_id"), col("hh").as("set_a")), "new_id")
        .join(oldNeeded.select(col("doc_id").as("old_id"), col("hh").as("set_b")), "old_id")
        .filter(jaccardPass(theta))
        // index ids all precede batch ids, so the min index neighbor IS
        // the doc's globally smallest admitted neighbor
        .groupBy(col("new_id")).agg(min(col("old_id")).as("dup_of"))
    })
    val surv = tracked(batch.join(
      crossRej.select(col("new_id").as("doc_id")), Seq("doc_id"), "left_anti"))

    // ---- within-batch verified pairs among survivors (lo < hi)
    val sBands = bandsOf(surv, numBands)
    val candPairs = sBands.as("x").join(sBands.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.k0") === col("y.k0") && col("x.k1") === col("y.k1") &&
        col("x.doc_id") < col("y.doc_id"))
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
      .write.mode("append").parquet(decisionsOut)

    // ---- grow the index — ONLY after the decisions landed (see the
    // ordering note above): admissions (and their bands, derived from
    // the cached survivor store, not a re-scan) become history for the
    // next batch. Each ingest appends one file set per table into the
    // current generation; [[compact]] folds the accretion.
    val gen = genOf(indexDir)
    admittedDocs.write.mode("append").parquet(s"$indexDir/$gen/docs")
    bandsOf(admittedDocs, numBands).write.mode("append").parquet(s"$indexDir/$gen/bands")

    caches.foreach(_.unpersist())
  }
}

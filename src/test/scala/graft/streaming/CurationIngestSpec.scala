package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-vs-batch keep-set parity for the COMPOSED curation ingest
  * ([[CurationIngest]]): a chopped, checkpointed stream through the
  * chained gates must admit EXACTLY q196's survivor set — same docs,
  * same token counts, same pack assignment — because every stage is
  * either the identical per-doc rule, a score against the corpus fit
  * q196's stages themselves computed (frozen, with exact rank-boundary
  * cut pairs), or durable state replaying the batch window's
  * semantics. Plus the replay gates: a re-delivered batch is a no-op,
  * and a half-committed batch (hashes written, admissions lost)
  * recomputes without seeing its own partial write. */
class CurationIngestSpec extends SparkSpec {

  private def freshDirs(): (String, String) = (
    java.nio.file.Files.createTempDirectory("graft-curation-ref").toString,
    java.nio.file.Files.createTempDirectory("graft-curation-state").toString)

  private def canon(rows: Array[Row]): Seq[(Long, String, Long, Long)] =
    rows.map(r => (r.getLong(r.fieldIndex("doc_id")), r.getString(r.fieldIndex("source")),
      r.getLong(r.fieldIndex("n_tokens")), r.getLong(r.fieldIndex("pack_id"))))
      .toSeq.sortBy(_._1)

  test("a chopped id-ordered stream admits exactly q196's survivor set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (refDir, stateDir) = freshDirs()
    CurationIngest.saveReference(spark, sfDir, refDir)

    val corpus = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    // three uneven contiguous chops — id-ordered ingest, the documented
    // precondition for first-arrival == min-doc_id dedup parity
    val cuts = Seq(corpus.length / 4, (corpus.length * 2) / 3, corpus.length)
    val batches = cuts.zip(0 +: cuts.dropRight(1)).map { case (e, b) => corpus.slice(b, e).toSeq }

    val input = MemoryStream[(Long, String, String, String)]
    val q = CurationIngest.ingestSink(
      input.toDF().toDF("doc_id", "source", "lang", "text"),
      refDir, stateDir, java.nio.file.Files.createTempDirectory("graft-cur-ckpt").toString)
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val streamed = canon(CurationIngest.admitted(spark, stateDir).collect())
    val batch = canon(
      graft.llm.LlmQueries.queries("q196_curation_canon")(spark, sfDir).collect())
    assert(streamed.nonEmpty, "composed gates admitted nothing — vacuous parity")
    assert(streamed === batch,
      s"stream admitted ${streamed.size} docs, batch kept ${batch.size} — keep sets diverged")
    // and the reconciliation read agrees with the streamed set when
    // ingest WAS id-ordered (first arrival == min id by construction)
    assert(canon(CurationIngest.reconciled(spark, stateDir).collect()) === batch,
      "reconciled read diverged from q196 under id-ordered ingest")
    spark.catalog.clearCache()
  }

  test("SHUFFLED arrival order reconciles to exactly q196's representatives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (refDir, stateDir) = freshDirs()
    CurationIngest.saveReference(spark, sfDir, refDir)

    val corpus = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    // deterministic shuffle that guarantees duplicate groups arrive OUT
    // of id order: sort by a multiplicative hash of doc_id, then chop —
    // first arrival per hash group is now essentially arbitrary
    val shuffled = corpus.sortBy { case (id, _, _, _) => (id * 2654435761L) % 1000003L }
    assert(shuffled.map(_._1).toSeq != shuffled.map(_._1).sorted.toSeq,
      "shuffle was a no-op — test is vacuous")
    val cuts = Seq(shuffled.length / 3, (shuffled.length * 3) / 4, shuffled.length)
    val batches = cuts.zip(0 +: cuts.dropRight(1)).map { case (e, b) => shuffled.slice(b, e).toSeq }

    val input = MemoryStream[(Long, String, String, String)]
    val q = CurationIngest.ingestSink(
      input.toDF().toDF("doc_id", "source", "lang", "text"),
      refDir, stateDir, java.nio.file.Files.createTempDirectory("graft-cur-ckpt2").toString)
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val batch = canon(
      graft.llm.LlmQueries.queries("q196_curation_canon")(spark, sfDir).collect())
    val rec = canon(CurationIngest.reconciled(spark, stateDir).collect())
    assert(rec.nonEmpty, "reconciliation produced nothing — vacuous")
    assert(rec === batch,
      s"reconciled set (${rec.size} docs) diverged from q196 (${batch.size}) under shuffled ingest")

    // compaction-time span pass over the reconciled set == the composed
    // batch canon q235, arrival order notwithstanding
    val spanGot = CurationIngest.spanStats(spark, sfDir, stateDir)
      .collect().map(_.toSeq).toSeq
    val spanWant = graft.llm.LlmQueries.queries("q235_curation_spans")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(spanGot === spanWant,
      "compaction-time span stats diverged from the composed batch canon")
    spark.catalog.clearCache()
  }

  test("replayed batches are no-ops; a half-committed batch recomputes without self-collision") {
    import spark.implicits._
    val (refDir, stateDir) = freshDirs()
    CurationIngest.saveReference(spark, sfDir, refDir)
    val corpus = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .orderBy(col("doc_id")).limit(200)
    val b0 = corpus.filter(col("doc_id") < 100)
    val b1 = corpus.filter(col("doc_id") >= 100)

    CurationIngest.ingestBatch(b0, 0L, refDir, stateDir)
    val after0 = canon(CurationIngest.admitted(spark, stateDir).collect())
    // full replay of batch 0: admitted dir exists → skip, nothing changes
    CurationIngest.ingestBatch(b0, 0L, refDir, stateDir)
    assert(canon(CurationIngest.admitted(spark, stateDir).collect()) === after0,
      "replayed batch changed the admitted set")

    // half-committed batch 1: simulate a crash after the hashes append
    // but before the admitted write — the replay must not anti-join
    // its own docs against their own first-attempt hashes
    CurationIngest.ingestBatch(b1, 1L, refDir, stateDir)
    val after1 = canon(CurationIngest.admitted(spark, stateDir).collect())
    assert(after1.size > after0.size, "batch 1 admitted nothing — test is vacuous")
    graft.Fs.deleteRecursively(
      java.nio.file.Paths.get(s"$stateDir/admitted/batch=1"))
    CurationIngest.ingestBatch(b1, 1L, refDir, stateDir) // hashes/batch=1 still present
    assert(canon(CurationIngest.admitted(spark, stateDir).collect()) === after1,
      "half-committed replay diverged (self-collision on its own hash append)")
    spark.catalog.clearCache()
  }

  test("a torn batch (hashes committed, seen not) reads as batch-absent in reconciled — " +
      "consistent prefix, no silent group drops, and self-heals on replay") {
    import spark.implicits._
    val (refDir, stateDir) = freshDirs()
    CurationIngest.saveReference(spark, sfDir, refDir)
    val corpus = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .orderBy(col("doc_id")).limit(200)
    val b0 = corpus.filter(col("doc_id") < 100)
    val b1 = corpus.filter(col("doc_id") >= 100)
    CurationIngest.ingestBatch(b0, 0L, refDir, stateDir)
    val rec0 = canon(CurationIngest.reconciled(spark, stateDir).collect())
    CurationIngest.ingestBatch(b1, 1L, refDir, stateDir)
    val rec01 = canon(CurationIngest.reconciled(spark, stateDir).collect())
    assert(rec01.size > rec0.size, "batch 1 contributed nothing — vacuous")
    // simulate the crash window the hashes-first order leaves: batch 1's
    // hashes/ committed, its seen/ (and admitted/) torn away
    graft.Fs.deleteRecursively(
      java.nio.file.Paths.get(s"$stateDir/seen/batch=1"))
    graft.Fs.deleteRecursively(
      java.nio.file.Paths.get(s"$stateDir/admitted/batch=1"))
    val recTorn = canon(CurationIngest.reconciled(spark, stateDir).collect())
    assert(recTorn === rec0,
      "torn batch must read as batch-absent (the batch-0 prefix), not a partial mix")
    // the replay recommits both ledgers and the reconciled read heals
    CurationIngest.ingestBatch(b1, 1L, refDir, stateDir)
    assert(canon(CurationIngest.reconciled(spark, stateDir).collect()) === rec01,
      "replay after the torn window did not restore the full reconciled set")
    spark.catalog.clearCache()
  }
}

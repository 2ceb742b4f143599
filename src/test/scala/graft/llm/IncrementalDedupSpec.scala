package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins the [[IncrementalDedup]] contract: (1) the parallel-rounds MIS
  * equals the SEQUENTIAL greedy-by-id dedup, recomputed driver-side from
  * the oracle-checked q37 verified-pair set; (2) batch-split invariance —
  * chopping the id-ordered corpus into ingests against the growing index
  * changes nothing; (3) the streaming twin reproduces the same canon
  * across micro-batch boundaries; (4) the persisted index holds exactly
  * the admissions. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString
  private val Bands = graft.functions.MinHashParams.planBands(16, 0.4)._1
  private val Theta = 0.4

  private def decisionsMap(df: DataFrame): Map[Long, (Long, Option[Long])] =
    df.collect().map { r =>
      r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }.toMap

  private lazy val corpus = LlmQueries.docSignatures(spark, sfDir).cache()
  private lazy val allIds =
    corpus.select("doc_id").collect().map(_.getLong(0)).sorted

  /** Smaller verified neighbors per doc, from q37 (banding candidate AND
    * exact Jaccard ≥ θ — the exact neighbor relation ingest uses, and
    * itself hash-matched against DuckDB at 3 SFs). */
  private lazy val smallerNbrs: Map[Long, Set[Long]] =
    LlmQueries.queries("q37_neardup_minhash")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).map { case (hi, ps) => hi -> ps.map(_._1).toSet }

  /** The definitional semantics: one doc at a time in id order. */
  private lazy val seqReference: Map[Long, (Long, Option[Long])] = {
    val admitted = scala.collection.mutable.Set[Long]()
    allIds.map { id =>
      val adm = smallerNbrs.getOrElse(id, Set.empty).filter(admitted)
      if (adm.isEmpty) { admitted += id; id -> ((1L, None)) }
      else id -> ((0L, Some(adm.min)))
    }.toMap
  }

  override def afterAll(): Unit = {
    corpus.unpersist()
    super.afterAll()
  }

  test("single-batch ingest == the sequential greedy-by-id reference") {
    assert(seqReference.values.count(_._1 == 0L) > 0,
      "vacuous: corpus has no near-dups")
    val got = decisionsMap(
      IncrementalDedup.ingest(spark, tmp("graft-inc-single"), corpus, Bands, Theta))
    assert(got === seqReference)
  }

  test("batch-split invariance: 4 uneven id-range ingests == one ingest; index == admissions") {
    val idx = tmp("graft-inc-multi")
    val bounds = Seq(allIds(allIds.length / 5), allIds(allIds.length / 2),
      allIds(allIds.length * 9 / 10))
    val ranges = (Long.MinValue +: bounds).zip(bounds :+ Long.MaxValue)
    val got = ranges.flatMap { case (lo, hi) =>
      decisionsMap(IncrementalDedup.ingest(spark, idx,
        corpus.filter(col("doc_id") >= lo && col("doc_id") < hi), Bands, Theta))
    }.toMap
    assert(got === seqReference)
    val stored = IncrementalDedup.loadDocs(spark, idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stored === seqReference.filter(_._2._1 == 1L).keySet)
  }

  test("compaction between ingests changes decisions not at all, and file counts a lot") {
    val idx = tmp("graft-inc-compact")
    val bounds = Seq(allIds(allIds.length / 4), allIds(allIds.length / 2),
      allIds(allIds.length * 3 / 4))
    val ranges = (Long.MinValue +: bounds).zip(bounds :+ Long.MaxValue)
    def ingestRange(r: (Long, Long)) = decisionsMap(IncrementalDedup.ingest(
      spark, idx,
      corpus.filter(col("doc_id") >= r._1 && col("doc_id") < r._2), Bands, Theta))
    def partFiles(dir: String): Int = Option(new java.io.File(dir).listFiles())
      .map(_.count(_.getName.startsWith("part-"))).getOrElse(0)

    val firstHalf = ranges.take(2).flatMap(ingestRange).toMap
    val batchDirs = Option(new java.io.File(s"$idx/g0/docs").listFiles())
      .map(_.count(_.isDirectory)).getOrElse(0)
    assert(batchDirs === 2, "two ingests should have added two batch dirs")
    IncrementalDedup.compact(spark, idx)
    assert(partFiles(s"$idx/g1/docs/compacted") === 1)
    assert(!new java.io.File(s"$idx/g0").exists(), "old generation swept")
    // the compacted index carries exactly the pre-compaction admissions
    assert(IncrementalDedup.loadDocs(spark, idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet ===
      firstHalf.filter(_._2._1 == 1L).keySet)
    val got = firstHalf ++ ranges.drop(2).flatMap(ingestRange).toMap
    assert(got === seqReference)
  }

  test("worst-case chain graph: alternating admissions, and the round bound throws rather than guess") {
    // 30 docs on a similarity PATH: hh_i = {i..i+3} gives J=0.6 with the
    // next doc and 1/3 (< θ) with the one after; identical sigs make
    // every pair a banding candidate, so verification alone must carve
    // the chain out of the 435-pair candidate set. Sequential greedy on
    // a path admits the evens and points each odd at its predecessor —
    // and the parallel MIS needs one round per chain link (the
    // documented worst case), so a 30-node chain must REFUSE at
    // maxRounds=12 instead of returning half-decided docs.
    val n = 30
    val chain = (0 until n).map { i =>
      (i.toLong, (i until i + 4).map(_.toLong), Seq.fill(16)(7L))
    }.toDF("doc_id", "hh", "sig")
    intercept[IllegalStateException] {
      IncrementalDedup.ingest(spark, tmp("graft-inc-chain-short"), chain, Bands, Theta)
    }
    val got = decisionsMap(IncrementalDedup.ingest(
      spark, tmp("graft-inc-chain"), chain, Bands, Theta, maxRounds = n))
    val expected = (0 until n).map { i =>
      i.toLong -> (if (i % 2 == 0) (1L, None) else (0L, Some((i - 1).toLong)))
    }.toMap
    assert(got === expected)
  }

  test("streaming twin: micro-batched stream through foreachBatch ingest reproduces the canon") {
    implicit val sqlCtx = spark.sqlContext
    val idx = tmp("graft-inc-stream")
    val rows = corpus.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
      .sortBy(_._1)
    val input = MemoryStream[(Long, Seq[Long], Seq[Long])]
    val q = input.toDF().toDF("doc_id", "hh", "sig").writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        IncrementalDedup.ingest(spark, idx, df, Bands, Theta, batchId = s"mb_$id")
        ()
      }
      .start()
    try {
      val (g1, rest) = rows.splitAt(rows.length * 2 / 5)
      val (g2, g3) = rest.splitAt(rest.length / 3)
      for (g <- Seq(g1, g2, g3)) { input.addData(g.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()
    assert(decisionsMap(IncrementalDedup.loadDecisions(spark, idx)) === seqReference)
  }

  test("at-least-once replay: a re-delivered batch short-circuits; uncommitted partials are invisible") {
    import spark.implicits._
    val idx = tmp("graft-inc-replay")
    val cut = allIds(allIds.length / 2)
    val b1 = corpus.filter(col("doc_id") < cut)
    val b2 = corpus.filter(col("doc_id") >= cut)
    val d1 = decisionsMap(IncrementalDedup.ingest(spark, idx, b1, Bands, Theta,
      batchId = "b1"))
    val stored1 = IncrementalDedup.loadDocs(spark, idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // replay before anything else happened: recorded decisions, index unmoved
    assert(decisionsMap(IncrementalDedup.ingest(spark, idx, b1, Bands, Theta,
      batchId = "b1")) === d1)
    assert(IncrementalDedup.loadDocs(spark, idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet === stored1)
    // a crashed attempt's partial batch dir (data written, NO commit
    // marker) must be invisible to every reader
    Seq((999999L, Seq(1L, 2L), Seq.fill(16)(7L)))
      .toDF("doc_id", "hh", "sig")
      .write.parquet(s"$idx/g0/docs/zz_crashed")
    assert(IncrementalDedup.loadDocs(spark, idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet === stored1)
    // replay from before a COMPACTION (markers carry forward): still the
    // recorded decisions, still no index growth
    IncrementalDedup.compact(spark, idx)
    assert(decisionsMap(IncrementalDedup.ingest(spark, idx, b1, Bands, Theta,
      batchId = "b1")) === d1)
    val got = d1 ++ decisionsMap(IncrementalDedup.ingest(spark, idx, b2, Bands, Theta,
      batchId = "b2"))
    assert(got === seqReference)
  }
}

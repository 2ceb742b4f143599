package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end dedup validation on a corpus with INJECTED duplicates:
  * every original document gets an exact copy (+10000 id) and a
  * lightly-perturbed near-copy (+20000 id, one word changed), written as
  * a documents.parquet a temp sfDir — the same entry point the real
  * queries use. Detection must find the planted pairs and resolution
  * must collapse each triple into one canonical component.
  */
class DedupInjectionSpec extends SparkSpec {

  private lazy val injectedDir: String = {
    val dir = Files.createTempDirectory("graft-inject").toString
    val base = Tables.documents(spark, sfDir).filter(col("doc_id") < 30)
    val exact = base
      .withColumn("doc_id", col("doc_id") + 10000)
    val near = base
      .withColumn("doc_id", col("doc_id") + 20000)
      .withColumn("text", concat(col("text"), lit(" perturbed")))
    base.unionByName(exact).unionByName(near)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dedup finds every injected exact copy") {
    val out = LlmQueries.queries("q30_dedup_exact")(spark, injectedDir)
    // 30 originals + 30 exact copies + 30 near copies = 60 distinct texts
    assert(out.count() === 60)
    val dupGroups = out.filter(col("n_copies") === 2).count()
    assert(dupGroups === 30, s"expected 30 exact-dup groups, got $dupGroups")
    // representative is always the lowest doc_id (the original)
    assert(out.filter(col("n_copies") === 2 && col("doc_id") >= 10000).count() === 0)
  }

  test("minhash near-dup detection links originals to their perturbed copies") {
    val pairs = LlmQueries.queries("q37_neardup_minhash")(spark, injectedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // original<->exact copy pairs must surface with jaccard 1.0
    val exactPairs = pairs.filter { case (a, b, _) => a < 10000 && b == a + 10000 }
    assert(exactPairs.length === 30, s"found ${exactPairs.length}/30 exact pairs")
    exactPairs.foreach { case (_, _, j) => assert(j === 1.0) }
    // perturbed copies differ by one trailing word -> jaccard just below 1
    val nearPairs = pairs.filter { case (a, b, _) => b == a + 20000 && a < 10000 }
    assert(nearPairs.length >= 25, s"found only ${nearPairs.length}/30 near pairs")
    nearPairs.foreach { case (_, _, j) => assert(j >= 0.8 && j < 1.0) }
  }

  test("incremental dedup vs persisted index == from-scratch dedup on the cross split") {
    val q207 = LlmQueries.queries("q207_incremental_dedup")(spark, sfDir)
    // the verify path reads the persisted index tables (bands + doc
    // store), not a second corpus scan — the index paths must appear as
    // parquet scans in the executed plan, at least twice (band table,
    // doc store)
    val plan = q207.queryExecution.executedPlan.toString
    assert("graft-dedup-idx".r.findAllIn(plan).size >= 2,
      "expected parquet scans of the persisted index in the ingest plan")
    val got = q207.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    // ground truth: the from-scratch whole-corpus dedup, restricted to
    // pairs that cross the history/incoming split and re-oriented
    // (new, old)
    val expected = LlmQueries.queries("q37_neardup_minhash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .flatMap { case (a, b, j) =>
        (a % 5 == 0, b % 5 == 0) match {
          case (true, false) => Some((a, b, j))
          case (false, true) => Some((b, a, j))
          case _             => None
        }
      }.toSet
    assert(got.nonEmpty, "vacuous: no near-dup pairs cross the split")
    assert(got === expected)
  }

  test("connectedComponents throws rather than return unconverged labels") {
    import spark.implicits._
    // a 6-node path graph has diameter 5: one min-label round cannot finish
    val chain = (0L until 5L).map(i => (i, i + 1)).toDF("a", "b")
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 1).collect()
    }
    // and with enough rounds the same graph converges to component 0
    val ok = Dedup.connectedComponents(chain, maxIter = 10)
      .select("component").distinct().collect()
    assert(ok.map(_.getLong(0)).toSeq === Seq(0L))
  }

  test("component resolution collapses each planted triple to one canonical doc") {
    val comps = LlmQueries.queries("q71_dedup_components")(spark, injectedDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // for most originals all three variants share one component rooted at
    // the original (LSH recall on the near pair can drop a few triples)
    val fullTriples = (0L until 30L).count { id =>
      comps.get(id).contains(id) &&
      comps.get(id + 10000).contains(id) &&
      comps.get(id + 20000).contains(id)
    }
    assert(fullTriples >= 25, s"only $fullTriples/30 triples fully collapsed")
    // no component may be rooted at a copy while its original is present
    comps.foreach { case (node, comp) =>
      assert(comp <= node, s"component root $comp above member $node")
    }
  }
}

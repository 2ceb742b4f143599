package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the integer PageRank update rule on a hand-computed graph and
  * the q138 corpus invariants the oracle's hash match rides on. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** 4-node graph: 0→{1,2}, 1→2, 2→0, 3→2. Node 3 has no in-links;
    * node 2 is the hub. scale=1000, 2 iterations, worked by hand:
    *   per=250, base=(15·250)//100=37
    *   iter1: contribs 0→(125,125), 1→250, 2→250, 3→250
    *     pr = [37+212, 37+106, 37+531, 37] = [249, 143, 568, 37]
    *   iter2: contribs 0→(124,124), 1→143, 2→568, 3→37
    *     pr(0)=37+(85·568)//100=519, pr(1)=37+(85·124)//100=142,
    *     pr(2)=37+(85·(124+143+37))//100=295, pr(3)=37
    */
  test("hand-computed two-iteration fixed-point ranks") {
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("idx")
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L))
      .toDF("src", "dst")
    val got = PageRank.run(nodes, edges, scale = 1000L, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 519L, 1L -> 142L, 2L -> 295L, 3L -> 37L))
  }

  test("zero-in-degree nodes hold exactly the base rank at any depth") {
    val nodes = Seq(0L, 1L, 2L).toDF("idx")
    val edges = Seq((0L, 1L), (2L, 1L)).toDF("src", "dst") // 0,2 never receive
    val base = 15L * (999L / 3) / 100L // per=333, base=49
    val got = PageRank.run(nodes, edges, scale = 999L, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) === base && got(2L) === base)
    assert(got(1L) > base) // the sink accumulated both contributions
  }

  test("q138: one row per doc, positive ranks, near-conserved mass, deterministic") {
    val q = LlmQueries.queries("q138_pagerank")
    val a = q(spark, sfDir).collect()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(a.length === nDocs)
    assert(a.forall(_.getLong(1) > 0L))
    // floor-division leaks crumbs only: sum stays within 1% of scale
    val mass = a.map(_.getLong(1)).sum
    assert(mass <= 1000000000000L && mass > 990000000000L)
    val b = q(spark, sfDir).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    spark.sharedState.cacheManager.clearCache()
  }

  test("50 iterations on the q138 graph stay in bounded analyzer time (pinned lineage)") {
    // Before pinning, the lazily-unrolled plan compounded per round and
    // 50 iterations died in the analyzer; pinned, the returned frame is
    // a constant-size LogicalRDD join regardless of depth.
    val docs = graft.Tables.documents(spark, sfDir)
      .select((row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))) - 1)
        .cast("long").as("idx")).cache()
    val n = docs.count()
    val edges = docs.select(col("idx").as("src"),
        explode(sequence(lit(1), lit(3))).as("j"))
      .select(col("src"),
        (TextOps.rollingHash(concat(col("src"), lit("#"), col("j"))) % n).as("dst"))
      .filter(col("src") =!= col("dst")).distinct().cache()
    val t0 = System.nanoTime()
    val ranks = PageRank.run(docs, edges, scale = 1000000000000L, iters = 50)
    val planLines = ranks.queryExecution.analyzed.numberedTreeString.linesIterator.size
    assert(planLines < 20, s"analyzed plan should be a flat LogicalRDD, got $planLines lines")
    assert(ranks.count() === n)
    assert((System.nanoTime() - t0) / 1e9 < 120.0, "50 pinned iterations must not blow up")
    spark.sharedState.cacheManager.clearCache()
  }

  test("convergence mode reaches the integer fixed point and matches fixed mode") {
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("idx")
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L))
      .toDF("src", "dst")
    val (conv, itersRun) = PageRank.runConverged(nodes, edges,
      scale = 1000L, maxIters = 100, tolMass = 0L)
    assert(itersRun < 100, "integer arithmetic must reach an exact fixed point")
    val convMap = conv.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the fixed-iteration run at the same depth lands on the same vector
    val fixedMap = PageRank.run(nodes, edges, scale = 1000L, iters = itersRun)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(convMap === fixedMap)
    // and one more iteration no longer moves it
    val more = PageRank.run(nodes, edges, scale = 1000L, iters = itersRun + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(more === convMap)
    spark.sharedState.cacheManager.clearCache()
  }

  test("ranks are non-uniform: the hash-derived graph has real structure") {
    val q = LlmQueries.queries("q138_pagerank")
    val prs = q(spark, sfDir).select("pr").as[Long].collect()
    assert(prs.distinct.length > prs.length / 4,
      "stationary vector collapsed to near-uniform — the link map lost its nonlinearity")
    spark.sharedState.cacheManager.clearCache()
  }
}

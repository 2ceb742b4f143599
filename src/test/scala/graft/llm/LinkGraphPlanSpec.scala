package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Plan + parity pins for the shared link-graph node-index derivation
  * ([[LlmQueries.linkGraphDocs]]): the round-10 verdict's named
  * scale-killer was six duplicated `row_number().over(Window.orderBy)`
  * copies — an UNPARTITIONED window = one task sorting the whole corpus
  * — feeding q138/q161/q169/q180/q194/q217. The shared builder ranks via
  * DistributedSelect.globalRowNumber (bounded bucket histogram +
  * per-bucket parallel sorts) instead; these tests pin (a) that the
  * builder's own plan carries no unpartitioned window, (b) that none of
  * the six graph queries' visible lineage reintroduces one, and (c) that
  * the new derivation assigns bit-identical (doc_id, idx) pairs to the
  * single-task window it replaced — the reason the six oracle hashes
  * didn't move. */
class LinkGraphPlanSpec extends SparkSpec {

  private def unpartitionedWindows(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }.size

  test("linkGraphDocs plans zero unpartitioned windows (two-level prefix sum, not a global sort)") {
    val docs = LlmQueries.linkGraphDocs(spark, sfDir)
    assert(unpartitionedWindows(docs) === 0,
      "the shared graph-id derivation regressed to a single-task global-sort window")
    // and it DOES rank via a partitioned window (per-bucket sort), so the
    // audit is checking the real mechanism, not a vacuous absence
    val partitioned = docs.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.nonEmpty => w
    }
    assert(partitioned.nonEmpty, "expected the per-bucket row_number window")
  }

  test("no graph query's visible lineage contains an unpartitioned window") {
    val names = Seq("q138_pagerank", "q161_triangles", "q169_bfs_reach",
      "q180_assortativity", "q194_kcore", "q217_weighted_sssp",
      "q220_label_prop", "q239_hits", "q244_katz", "q245_personalized_pr",
      "q252_harmonic")
    names.foreach { n =>
      val df = LlmQueries.queries(n)(spark, sfDir)
      assert(unpartitionedWindows(df) === 0,
        s"$n plans an unpartitioned window — single-task global sort reintroduced")
    }
    spark.catalog.clearCache() // runner half of the query-scoped-cache contract
  }

  test("distributed rank assigns the identical (doc_id, idx) as the replaced global window") {
    val viaBuilder = LlmQueries.linkGraphDocs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val viaWindow = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (row_number().over(Window.orderBy(col("doc_id"))) - 1).cast("long").as("idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(viaBuilder.length === viaWindow.length)
    assert(viaBuilder.sameElements(viaWindow),
      "two-level prefix-sum rank diverged from the sequential window spec")
  }
}

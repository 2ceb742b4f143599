package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed fixed-point PageRank (Page et al. 1999) — synchronous
  * power iteration in integer micro-mass units, so results are exact
  * longs reproducible across engines (see q138's relational oracle).
  *
  * Update rule per iteration (damping 85/100, all integer arithmetic):
  * {{{
  *   contrib(u)  = pr(u) div out_degree(u)       // per out-edge
  *   pr'(v)      = base + (85 · Σ_{u→v} contrib(u)) div 100
  *   base        = (15 · (scale div N)) div 100
  * }}}
  * Floor-division crumbs (and mass at dangling nodes, if the caller's
  * edge set has any) leak deterministically — the vector is a ranking
  * signal, not a probability measure, and exactness beats renormalized
  * floats for verification.
  *
  * Scale shape: the rank vector is O(N) rows and each iteration is one
  * hash-join ranks⋈edges keyed on src, one partially-aggregated
  * groupBy(dst), and one left join back to the node frame so
  * zero-in-degree nodes keep their base rank. The caller should cache
  * `nodes` and `edges` (both are reused every iteration); the returned
  * frame is lazy with the iterations unrolled into the plan.
  */
object PageRank {
  /** @param nodes one row per node, column `idx` (long, any sparse ids)
    * @param edges  columns `src`, `dst` referencing `idx`; duplicates
    *               and self-loops are the caller's semantics to fix
    * @return one row per node: (idx, pr) with Σpr ≤ scale */
  def run(nodes: DataFrame, edges: DataFrame, scale: Long, iters: Int): DataFrame = {
    val n = nodes.count()
    require(n > 0, "PageRank needs a non-empty node frame")
    val perNode = scale / n
    val base    = 15L * perNode / 100L
    val withDeg = edges.join(
      edges.groupBy(col("src")).agg(count(lit(1)).as("d")), "src")
    var ranks = nodes.select(col("idx"), lit(perNode).as("pr"))
    for (_ <- 1 to iters) {
      val contribs = ranks
        .join(withDeg, ranks("idx") === withDeg("src"))
        .select(col("dst"), expr("pr div d").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      ranks = nodes.select(col("idx"))
        .join(contribs, col("idx") === col("dst"), "left")
        .select(col("idx"),
          (lit(base) + expr("(85 * coalesce(contrib, 0L)) div 100")).as("pr"))
    }
    ranks
  }
}

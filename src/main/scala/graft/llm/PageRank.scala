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
  * `nodes` and `edges` (both are reused every iteration).
  *
  * Iterations are PINNED — cache + materialize + rebuild as a
  * LogicalRDD over the cached partitions (the q169/q194 idiom). Caching
  * alone stops re-execution but NOT logical-plan growth: with the
  * iterations unrolled lazily, the analyzed tree compounds per round
  * and a 50-iteration convergence run hits minutes of pure optimizer
  * time before a single task runs. Pinning keeps the per-iteration plan
  * bounded, so `iters` is limited by compute, not by the analyzer.
  *
  * Pin CADENCE is mode-dependent, because each pin is a full
  * materialization job (~fixed scheduler overhead that tripled q138's
  * wall time when paid every round): fixed mode has ONE consumer per
  * iteration (the next iteration), so a lazy chain executes exactly
  * once regardless — only the analyzer depth needs bounding, and a pin
  * every 8 rounds plus on the final frame does that while a 5-iteration
  * run pays a single materialization. Convergence mode reads each
  * vector TWICE (the delta probe + the next round), so it pins every
  * iteration — there the cache is what stops re-execution. Either way
  * the RETURNED frame is a pinned LogicalRDD carrying no reference to
  * the loop-scoped caches, and each superseded pin releases as soon as
  * the next lands (peak storage: two rank vectors).
  */
object PageRank {
  /** Fixed-iteration mode (the oracle-matched q138 shape: both engines
    * run the same bounded computation, no convergence read).
    *
    * @param nodes one row per node, column `idx` (long, any sparse ids)
    * @param edges  columns `src`, `dst` referencing `idx`; duplicates
    *               and self-loops are the caller's semantics to fix
    * @return one row per node: (idx, pr) with Σpr ≤ scale */
  def run(nodes: DataFrame, edges: DataFrame, scale: Long, iters: Int): DataFrame =
    iterate(nodes, edges, scale, iters, tolMass = None)._1

  /** Convergence mode: iterate until the L1 rank delta Σ|pr′ − pr| is
    * ≤ `tolMass` (integer mass units — tol 0 is the exact fixed point,
    * which integer arithmetic genuinely reaches), bounded by `maxIters`
    * as the runaway stop. Costs one extra join+agg job per iteration
    * for the delta read, which is why the oracle-matched fixed mode
    * skips it. @return (ranks, iterations actually run) */
  def runConverged(nodes: DataFrame, edges: DataFrame, scale: Long,
      maxIters: Int, tolMass: Long): (DataFrame, Int) =
    iterate(nodes, edges, scale, maxIters, Some(tolMass))

  private def iterate(nodes: DataFrame, edges: DataFrame, scale: Long,
      maxIters: Int, tolMass: Option[Long]): (DataFrame, Int) = {
    val spark = nodes.sparkSession
    val n = nodes.count()
    require(n > 0, "PageRank needs a non-empty node frame")
    val perNode = scale / n
    val base    = 15L * perNode / 100L
    // cached for the duration of the loop only — the final frame is a
    // LogicalRDD and carries no reference to it, so it releases here
    val withDeg = edges.join(
      edges.groupBy(col("src")).agg(count(lit(1)).as("d")), "src").cache()
    // pin: materialized cache + LogicalRDD truncation; returns the
    // truncated frame AND the cached handle (for release)
    def pin(df: DataFrame): (DataFrame, DataFrame) = {
      val c = df.cache()
      c.count()
      (spark.createDataFrame(c.rdd, c.schema), c)
    }
    var ranks: DataFrame = nodes.select(col("idx"), lit(perNode).as("pr"))
    var ranksCached: Option[DataFrame] = None
    var itersRun = 0
    var done = false
    while (itersRun < maxIters && !done) {
      val contribs = ranks
        .join(withDeg, ranks("idx") === withDeg("src"))
        .select(col("dst"), expr("pr div d").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      val lazyNext = nodes.select(col("idx"))
        .join(contribs, col("idx") === col("dst"), "left")
        .select(col("idx"),
          (lit(base) + expr("(85 * coalesce(contrib, 0L)) div 100")).as("pr"))
      // pin cadence (scaladoc above): every round in convergence mode
      // (two consumers), every 8th + the final frame in fixed mode
      val shouldPin = tolMass.isDefined ||
        itersRun + 1 == maxIters || (itersRun + 1) % 8 == 0
      val (next, nextCached) =
        if (shouldPin) { val (f, c) = pin(lazyNext); (f, Some(c)) }
        else (lazyNext, None)
      itersRun += 1
      tolMass.foreach { tol =>
        val delta = next.join(ranks.select(col("idx"), col("pr").as("pr0")), "idx")
          .agg(sum(abs(col("pr") - col("pr0"))).as("d")).head().getLong(0)
        if (delta <= tol) done = true
      }
      if (nextCached.isDefined) {
        // a new pin supersedes the previous one; between pins (lazy
        // rounds) the old cache must STAY live — the lazy chain reads it
        ranksCached.foreach(_.unpersist())
        ranksCached = nextCached
      }
      ranks = next
    }
    withDeg.unpersist()
    // every path that ran an iteration returns a pinned frame: fixed
    // mode pins the final round explicitly, convergence mode pins every
    // round. Its backing cache stays live — the returned LogicalRDD
    // reads those partitions; the runner's clearCache releases it
    // (query-scoped cache contract). itersRun == 0 returns the initial
    // vector, whose only reference is the caller's own `nodes`.
    (ranks, itersRun)
  }
}

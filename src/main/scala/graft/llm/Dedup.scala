package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate RESOLUTION: detection (MinHash LSH, q37) yields pairs;
  * turning pairs into a deduped corpus needs the connected components of
  * the similarity graph — a doc chain A~B~C is ONE duplicate group even
  * if A and C never collide directly.
  *
  * Components are computed by iterative min-label propagation: every
  * node starts labeled with itself; each round takes the min of its own
  * and its neighbors' labels; convergence is bounded by the component
  * diameter (near-dup clusters are tiny, so 2-4 rounds in practice).
  * Each round is one shuffle-join on the edge list — the standard
  * scalable formulation (no driver-side graph, no recursion depth tied
  * to data size).
  */
object Dedup {

  /** edges: two long columns (a, b). Returns (node, component) where
    * component = min node id reachable. Only nodes appearing in an edge
    * are returned (isolated docs are trivially their own component).
    *
    * Throws `IllegalStateException` if `maxIter` rounds pass without
    * convergence (a component whose diameter exceeds maxIter) — silently
    * returning half-propagated labels would split one duplicate group
    * into several and the caller could not tell. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .cache()
    // seed with min(node, min neighbor): exactly what the first
    // propagation round would compute, but as ONE aggregation over the
    // edge list instead of a join round — saves a full iteration
    var labels = sym.groupBy(col("a").as("node"))
      .agg(min(col("b")).as("mb"))
      .select(col("node"), least(col("node"), col("mb")).as("label"))
      .cache()
    var cachedPrev = labels
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("node", "b2"), col("b") === col("b2"))
        .groupBy(col("a").as("node"))
        .agg(min(col("label")).as("nbr_label"))
      val next = labels
        .join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          (coalesce(col("nbr_label"), col("label")) < col("label")).as("__changed"))
        .cache()
      // ONE action per round, and it materializes `next`'s cache BEFORE the
      // previous round's cache is dropped — unpersisting first would make
      // every later round recompute the whole lineage back to the edge
      // pipeline (quadratic recompute; at q71's scale that re-ran the full
      // MinHash LSH join once per round)
      val changed = next.filter(col("__changed")).count()
      cachedPrev.unpersist()
      cachedPrev = next
      labels = next.select(col("node"), col("label"))
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    if (!converged) {
      cachedPrev.unpersist() // don't leak the last round's cache on the throw path
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(component diameter exceeds maxIter); raise maxIter")
    }
    labels.withColumnRenamed("label", "component")
  }
}

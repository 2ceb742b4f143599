package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic deduplication — SemDeDup (Abbas et al., 2023,
  * arXiv:2303.09540): remove documents whose EMBEDDINGS are near-equal
  * even when their surface text differs (paraphrases, templated
  * rewrites, translations-of-boilerplate), the duplicate class MinHash /
  * SimHash (q35-q37, q90) cannot see.
  *
  * The published recipe, re-expressed Spark-first:
  *  1. L2-normalize embeddings (cosine geometry; also makes scaled
  *     copies of a vector literally identical, so clustering cannot
  *     split a duplicate pair across lists).
  *  2. Cluster with the [[IvfSearch]] quantizer (bounded-sample KMeans
  *     fit, one assignment pass).
  *  3. Compare pairs only WITHIN a cluster — the pair space is
  *     O(Σ |cluster|²), and with [[IvfSearch.adaptiveK]] keeping lists
  *     ≈targetListRows, that is O(N · targetListRows): linear in the
  *     corpus, never the all-pairs O(N²) a naive cosine dedup costs.
  *  4. Edges = pairs with cosine ≥ τ; resolve transitive chains with
  *     [[Dedup.connectedComponents]] and keep each component's min-id
  *     member as canonical.
  *
  * Equivalent shape at 100 TB: the per-cluster self-join is an equi-join
  * on the cluster id — a hash shuffle on a bounded-fan-out key — and the
  * component resolution is the same bounded-round label propagation the
  * MinHash pipeline uses.
  */
object SemDedup {

  /** L2-normalize an array<double> embedding column (codegen'd
    * higher-order fns; no UDF). Zero vectors map to NULL (guarded —
    * under ANSI mode x/0 raises), which cosine comparisons then skip:
    * a degenerate input is a detectable absence, not a silent value,
    * matching cosine_sim's own length-mismatch contract. */
  def l2Normalize(emb: Column): Column = {
    val n = sqrt(aggregate(emb, lit(0.0), (a, x) => a + x * x))
    when(n =!= lit(0.0), transform(emb, x => x / n))
  }

  /** Run SemDeDup over `embeddings`. Returns one row per input id:
    * (idCol, cluster, canonical, keep) — `keep` is false exactly for
    * non-canonical members of a similarity component.
    *
    * `k = -1` sizes the cluster count adaptively ([[IvfSearch.build]]);
    * τ is the cosine threshold (the paper sweeps 0.95-0.999).
    * The returned frame's lineage reads the (cached) cluster index; the
    * runner-side clearCache releases it (query-scoped cache contract).
    */
  def dedup(embeddings: DataFrame, idCol: String, embCol: String, tau: Double,
      k: Int = -1, seed: Long = 42L, fitSampleRows: Long = -1L,
      maxIter: Int = 5): DataFrame = {
    // cache the NORMALIZED input: l2Normalize is an interpreted HOF
    // whose norm subexpression evaluates twice per row, and without the
    // cache every downstream action (the build's sizing agg, the fit
    // collect, the assignment pass, the degenerate union) re-normalizes
    // the corpus from the scan — measured at sf0.1 this was ~0.3 s PER
    // ACTION of pure recompute. Query-scoped: the runner-side
    // clearCache releases it with the index cache.
    val all = embeddings.select(
      col(idCol).as("__id"),
      l2Normalize(col(embCol).cast("array<double>")).as("__emb")).cache()
    // zero-norm embeddings normalize to NULL and have no cosine to
    // anything: exclude them from clustering (KMeans rejects nulls) and
    // pass them through as kept singletons so the output still covers
    // every input id
    val normed = all.filter(col("__emb").isNotNull)
    val degenerate = all.filter(col("__emb").isNull).select(col("__id"))
    // maxIter defaults LOW here (5, vs the ANN index's 10): dedup needs
    // the clusters roughly balanced so the pair joins stay bounded, not
    // converged — every extra KMeans iteration is a full pass over the
    // fit sample for no dedup-quality gain (identical points co-cluster
    // from iteration zero)
    val index = IvfSearch.build(normed, "__id", "__emb", k = k, seed = seed,
      fitSampleRows = fitSampleRows, maxIter = maxIter)
    val lhs = index.indexed.select(col("cluster"), col("__id").as("a"), col("__emb").as("ea"))
    val rhs = index.indexed.select(col("cluster"), col("__id").as("b"), col("__emb").as("eb"))
    val edges = lhs.join(rhs, Seq("cluster"))
      .filter(col("a") < col("b"))
      .filter(call_function("cosine_sim", col("ea"), col("eb")) >= lit(tau))
      .select(col("a"), col("b"))
    val comps = Dedup.connectedComponents(edges)
    index.indexed
      .select(col("__id").as(idCol), col("cluster"))
      .join(comps.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("component"), col(idCol)).as("canonical"),
        (coalesce(col("component"), col(idCol)) === col(idCol)).as("keep"))
      .unionByName(degenerate.select(col("__id").as(idCol),
        lit(-1).as("cluster"), col("__id").as("canonical"), lit(true).as("keep")))
  }
}

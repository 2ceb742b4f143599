package graft.llm

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * clustering-based scale path complementing the hyperplane-LSH buckets
  * of `q39_ann_lsh`.
  *
  * Index: KMeans centroids over the corpus; every vector is assigned to
  * its nearest centroid's inverted list. Search: a query probes only the
  * `nProbe` nearest centroids' lists, so per-query work is
  * ~`nProbe/k` of the corpus instead of all of it. At 100 TB the
  * inverted lists are just a `cluster` column — probing is a hash join
  * on cluster id against a broadcast query set, and the corpus can
  * additionally be partitioned/bucketed by cluster for locality.
  */
object IvfSearch {

  final case class Index(model: KMeansModel, indexed: DataFrame)

  /** Adaptive list-count defaults: size k to the corpus so per-probe
    * list scans stay ~constant as data grows (the same failure family
    * as fixed LSH band widths: a FIXED k means lists grow linearly with
    * the corpus, and at 10⁹ vectors each probe re-scans millions of
    * rows). Target ≈√n-style balance is overkill here; what matters is
    * bounded rows per list, so k = clamp(ceil(n / targetListRows), lo,
    * hi) — the [[EmbedLsh.adaptiveBits]] pattern in linear space. */
  val TargetListRows = 4096L
  val MinK = 4
  val MaxK = 65536

  def adaptiveK(n: Long, targetListRows: Long = TargetListRows,
      lo: Int = MinK, hi: Int = MaxK): Int = {
    require(targetListRows > 0, s"targetListRows must be positive: $targetListRows")
    val raw = ((math.max(n, 1L) + targetListRows - 1L) / targetListRows)
    math.min(hi.toLong, math.max(lo.toLong, raw)).toInt
  }

  /** Build the IVF index: fit KMeans(k) on a BOUNDED SAMPLE and tag
    * every row with its nearest list in one assignment pass.
    *
    * The quantizer fit never touches the full corpus: iterative KMeans
    * over 100 TB costs maxIter full passes, while centroid quality
    * saturates at a few hundred training points per centroid — so the
    * fit reads at most `fitSampleRows` (default 512·k) rows, selected
    * by a DETERMINISTIC hash of the id (a seeded .sample() would pick
    * different rows under different partitioning; the hash keep-set is
    * stable on any cluster layout). At the test SFs the cap exceeds the
    * corpus, so every row trains and behaviour is unchanged. The sampled
    * fit input is collected-free and cached only for the fit passes;
    * assignment over the corpus is the model's single transform pass.
    *
    * `k = -1` (the default callers should prefer) sizes the list count
    * to the corpus via [[adaptiveK]]; a positive k pins it. */
  def build(embeddings: DataFrame, idCol: String, embCol: String,
      k: Int = -1, seed: Long = 42L, fitSampleRows: Long = -1L,
      targetListRows: Long = TargetListRows, maxIter: Int = 10): Index = {
    val vecs = embeddings.select(
      col(idCol), col(embCol),
      array_to_vector(col(embCol)).as("__vec"))
    val n = vecs.count()
    val kEff = if (k > 0) k else adaptiveK(n, targetListRows)
    val cap = if (fitSampleRows > 0) fitSampleRows else 512L * kEff
    val fitInput =
      if (n <= cap) vecs
      else {
        // keep ≈cap rows: hash the id into [0, 1e6) and keep the low slice
        val keepPerM = math.max(1L, cap * 1000000L / n)
        vecs.filter(pmod(hash(col(idCol), lit(seed)), lit(1000000L)) < lit(keepPerM))
      }
    // fit on DISTINCT points only: MLlib's random init samples k rows
    // and dedups them, so duplicate-heavy data can yield FEWER than k
    // centers — the block aggregator then crashes (AIOOBE: "Index k-1
    // out of bounds"). A dedup corpus makes this a first-class hazard
    // (SemDedup NORMALIZES scaled copies into exact duplicates), and
    // duplicate points add nothing to a quantizer fit anyway. The
    // distinct runs on the already-capped sample, so the shuffle is
    // bounded; k additionally clamps to the distinct count.
    val cached = fitInput.select(col(embCol)).distinct()
      .select(array_to_vector(col(embCol)).as("__vec")).cache()
    val nDistinctFit = cached.count()
    val kFit = math.min(kEff.toLong, math.max(1L, nDistinctFit)).toInt
    // random init (one pass) + bounded iterations: an IVF index needs
    // roughly-balanced lists, not converged centroids — kmeans|| init and
    // 20 default iterations would cost ~25 passes over the fit sample
    // for no recall gain at the nProbe values this index serves
    val model = new KMeans().setK(kFit).setSeed(seed)
      .setInitMode("random").setMaxIter(maxIter).setTol(1e-3)
      .setFeaturesCol("__vec").setPredictionCol("cluster")
      .fit(cached)
    val indexed = model.transform(vecs).drop("__vec").cache()
    indexed.count() // materialize the index, then release the fit-time cache
    cached.unpersist()
    Index(model, indexed)
  }

  private def cosine(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Probe: for each query row, search the nProbe nearest inverted lists
    * and return the top-k neighbors by cosine. The centroid table is tiny
    * (k rows — always broadcast); the probe-set join against the corpus
    * is an equi-join on cluster id whose STRATEGY is sized to the query
    * set: a small batch is broadcast, a query TABLE above
    * `maxBroadcastQueries` rows takes the shuffle path (hash-partitioned
    * on cluster id on both sides) — broadcasting it would OOM the
    * executors, the failure mode [[graft.ml.Smote]]'s guard documents.
    * The one count(*) action on the query set is what buys the choice.
    *
    * Probe centroids are ranked by the SAME squared-Euclidean metric
    * KMeans used for list assignment (ranking by a different metric
    * than the index was built with systematically probes the wrong
    * lists), with cluster id as tiebreaker so tied distances give a
    * deterministic probe set across runs. */
  /** @param numQueries caller-known query-set size; when absent the
    *   sizing runs one count(*) over `queries`, which EXECUTES its
    *   lineage — cache the frame or pass the size if it is expensive. */
  def search(index: Index, queries: DataFrame, idCol: String, embCol: String,
      nProbe: Int, topK: Int, maxBroadcastQueries: Long = 1L << 16,
      numQueries: Option[Long] = None): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val centroids = index.model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
      .toDF("cluster", "centroid")
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
    // rank centroids per query; keep the nProbe nearest lists
    val wC = Window.partitionBy(col("q_id")).orderBy(col("c_dist"), col("cluster"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("c_dist",
        call_function("sq_dist", col("q_emb"), col("centroid")))
      .withColumn("c_rank", row_number().over(wC))
      .filter(col("c_rank") <= nProbe)
      .select(col("q_id"), col("q_emb"), col("cluster"))
    val probeSide =
      if (numQueries.getOrElse(queries.count()) <= maxBroadcastQueries)
        broadcast(probes) else probes
    val wS = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col(idCol))
    index.indexed.join(probeSide, Seq("cluster"))
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("cos_sim", round(cosine(col(embCol), col("q_emb")), 4))
      .withColumn("rnk", row_number().over(wS))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col(idCol).as("neighbor_id"), col("cos_sim"))
  }
}

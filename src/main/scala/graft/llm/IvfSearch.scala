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

  /** Build the IVF index: fit KMeans(k) and tag each row with its list.
    * The vectorized input is cached for the duration of the fit — KMeans
    * makes one pass per iteration, and without the cache each pass
    * re-reads and re-vectorizes the source. */
  def build(embeddings: DataFrame, idCol: String, embCol: String,
      k: Int, seed: Long = 42L): Index = {
    val vecs = embeddings.select(
      col(idCol), col(embCol),
      array_to_vector(col(embCol)).as("__vec"))
      .cache()
    // random init (one pass) + bounded iterations: an IVF index needs
    // roughly-balanced lists, not converged centroids — kmeans|| init and
    // 20 default iterations would cost ~25 full passes over the corpus
    // for no recall gain at the nProbe values this index serves
    val model = new KMeans().setK(k).setSeed(seed)
      .setInitMode("random").setMaxIter(10).setTol(1e-3)
      .setFeaturesCol("__vec").setPredictionCol("cluster")
      .fit(vecs)
    val indexed = model.transform(vecs).drop("__vec").cache()
    indexed.count() // materialize the index, then release the fit-time cache
    vecs.unpersist()
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
      .withColumn("c_dist", aggregate(
        zip_with(col("q_emb"), col("centroid"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, d2) => acc + d2))
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

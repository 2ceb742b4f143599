package graft.llm

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", IEEE TPAMI 2011) — the compression tier
  * below [[IvfSearch]]: each vector splits into `m` contiguous
  * subvectors, each subspace gets its own KMeans codebook of `k`
  * codewords, and a vector is stored as `m` small codes. At k=16 a
  * 64-dim float vector compresses 256 bytes → 8 codes (32×) — at 100 TB
  * the ANN working set drops from corpus-scale to memory-scale, which
  * is the difference between an in-memory probe and re-reading parquet
  * per query batch (q95's int8 path is the 4× waypoint; this is the
  * production end-state, IVF for candidate pruning + PQ for storage).
  *
  * Spark shape: the fits are `m` bounded-sample KMeans (the
  * [[IvfSearch.build]] discipline — hash-stable sample, distinct
  * points, k clamped to the distinct count); encode is `m` lazy
  * KMeansModel transforms fused into ONE scan pass (no shuffle);
  * decode and ADC distances are pure Column arithmetic over the
  * codebook as a nested-array literal (tiny: m·k·subDim doubles
  * — always plan-embeddable, never a join). */
object ProductQuant {

  final case class Model(m: Int, subDim: Int, k: Int, models: Seq[KMeansModel]) {
    /** Codebooks as plain numbers: centers(j)(c) = codeword c of subspace j. */
    lazy val centers: Seq[Seq[Seq[Double]]] =
      models.map(_.clusterCenters.toSeq.map(_.toArray.toSeq))
  }

  /** Fit `m` subspace codebooks on a bounded, partitioning-stable
    * sample. The sample key is the hash of the EMBEDDING itself, so the
    * keep-set is identical on any cluster layout and duplicate-heavy
    * corpora can't starve the fit (distinct per subspace + k clamp, the
    * MLlib random-init AIOOBE guard from [[IvfSearch.build]]). */
  def fit(embeddings: DataFrame, embCol: String, m: Int, k: Int = 16,
      seed: Long = 42L, fitSampleRows: Long = -1L, maxIter: Int = 10): Model = {
    val base = embeddings.select(col(embCol).cast("array<double>").as("__e"))
    val dim = base.select(size(col("__e"))).head().getInt(0)
    require(m > 0 && dim % m == 0, s"dim $dim not divisible into $m subspaces")
    require(k > 0, s"codewords per subspace must be positive: $k")
    val subDim = dim / m
    val cap = if (fitSampleRows > 0) fitSampleRows else 512L * k
    val n = base.count()
    val fitInput =
      if (n <= cap) base
      else {
        val keepPerM = math.max(1L, cap * 1000000L / n)
        base.filter(pmod(hash(col("__e"), lit(seed)), lit(1000000L)) < lit(keepPerM))
      }
    val cached = fitInput.cache()
    cached.count()
    try {
      val models = (0 until m).map { j =>
        val sub = cached
          .select(slice(col("__e"), j * subDim + 1, subDim).as("__s"))
          .distinct()
          .select(array_to_vector(col("__s")).as("__vec"))
          .cache()
        try {
          val kFit = math.min(k.toLong, math.max(1L, sub.count())).toInt
          // k-means|| init, unlike IvfSearch's random: every decode and
          // ADC distance pays for codebook quality forever, the fit is
          // bounded-sample and k is tiny, and random init's local optima
          // (two codewords splitting one mode, another mode unmodeled)
          // show up directly as reconstruction error
          new KMeans().setK(kFit).setSeed(seed + j)
            .setMaxIter(maxIter).setTol(1e-4)
            .setFeaturesCol("__vec").setPredictionCol("__c")
            .fit(sub)
        } finally sub.unpersist()
      }
      Model(m, subDim, k, models)
    } finally cached.unpersist()
  }

  /** Add a `codesCol` array<int> of length m: the per-subspace nearest
    * codewords. All `m` model transforms are lazy projections over the
    * same row — Catalyst fuses them into one scan-shaped pass. */
  def encode(df: DataFrame, embCol: String, model: Model,
      codesCol: String = "codes"): DataFrame = {
    val withSubs = (0 until model.m).foldLeft(
      df.withColumn("__e", col(embCol).cast("array<double>"))) { (d, j) =>
      d.withColumn(s"__s$j",
        array_to_vector(slice(col("__e"), j * model.subDim + 1, model.subDim)))
    }
    val coded = model.models.zipWithIndex.foldLeft(withSubs) { case (d, (km, j)) =>
      // copy: setting input/output cols on the shared model would leak
      // state across concurrent encodes
      km.copy(ParamMap.empty).setFeaturesCol(s"__s$j").setPredictionCol(s"__c$j")
        .transform(d)
    }
    coded
      .withColumn(codesCol, array((0 until model.m).map(j => col(s"__c$j")): _*))
      .drop("__e" +: (0 until model.m).flatMap(j => Seq(s"__s$j", s"__c$j")): _*)
  }

  /** Reconstruction of a codes column: codeword lookup per subspace,
    * concatenated — pure Column arithmetic over the codebook literal. */
  def decode(model: Model, codes: Column): Column =
    concat((0 until model.m).map { j =>
      element_at(typedLit(model.centers(j)), element_at(codes, j + 1) + 1)
    }: _*)

  private def d2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, d) => acc + d)

  /** Asymmetric-distance (ADC) top-k: queries stay full-precision, the
    * corpus is its codes — dist(q, v) ≈ Σ_j ‖q_j − codeword(code_j)‖².
    * The codebook rides along as a literal, the query set broadcasts
    * (point/batch lookups — for query TABLES route through
    * [[IvfSearch.search]]-style shuffle sizing first), so the scan of
    * the coded corpus is the only distributed work: no shuffle until
    * the per-query top-k window over candidate rows. */
  def adcSearch(coded: DataFrame, idCol: String, codesCol: String,
      queries: DataFrame, qIdCol: String, qEmbCol: String,
      model: Model, topK: Int): DataFrame = {
    val cbAll = typedLit(model.centers) // array<array<array<double>>>
    val q = broadcast(
      queries.select(col(qIdCol).as("q_id"), col(qEmbCol).cast("array<double>").as("q_emb")))
    val dist = aggregate(
      transform(sequence(lit(0), lit(model.m - 1)), j =>
        d2(slice(col("q_emb"), j * model.subDim + 1, lit(model.subDim)),
          element_at(element_at(cbAll, j + 1), element_at(col(codesCol), j + 1) + 1))),
      lit(0.0), (acc, d) => acc + d)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc_dist"), col(idCol))
    coded.crossJoin(q)
      .withColumn("adc_dist", round(dist, 4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col(idCol).as("neighbor_id"), col("adc_dist"))
  }
}

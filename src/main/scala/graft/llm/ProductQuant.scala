package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", IEEE TPAMI 2011) — the compression tier
  * below [[IvfSearch]]: each vector splits into `m` contiguous
  * subvectors, each subspace gets its own codebook of `k` codewords,
  * and a vector is stored as `m` small codes. At k=16 a 64-dim float
  * vector compresses 256 bytes → 8 codes (32×) — at 100 TB the ANN
  * working set drops from corpus-scale to memory-scale, which is the
  * difference between an in-memory probe and re-reading parquet per
  * query batch (q95's int8 path is the 4× waypoint; this is the
  * production end-state, IVF for candidate pruning + PQ for storage).
  *
  * Execution shape, deliberately hybrid (the [[TextOps.bpeTrain]]
  * argument): codebook training needs only a BOUNDED sample — quality
  * saturates at a few hundred points per codeword — so the sample is
  * selected distributed (hash-stable keep-set), collected ONCE, and
  * Lloyd's iterations run driver-local. The MLlib alternative is m
  * sequential KMeans fits ≈ m·(init+iters) tiny Spark jobs of pure
  * scheduling overhead (measured 11 s for the q114 gate at sf0.1; this
  * form is sub-second). Everything CORPUS-sized stays distributed and
  * scan-shaped: encode and the ADC distance are NATIVE codegen kernels
  * ([[graft.functions.PqEncode]]/[[graft.functions.PqAdcDist]] over the
  * flat codebook layout — no shuffle, no MLlib row objects, no
  * interpreted HOF folds), decode is Column arithmetic over the
  * codebook literal (tiny: m·k·subDim doubles — always plan-embeddable,
  * never a join). */
object ProductQuant {

  /** centers(j)(c) = codeword c of subspace j. */
  final case class Model(m: Int, subDim: Int, k: Int, centers: Seq[Seq[Seq[Double]]]) {
    /** Flat row-major layout for the native kernels
      * ([[graft.functions.PqEncode]]/[[graft.functions.PqAdcDist]]):
      * entry (subspace j, codeword c, component t) at (j·k + c)·subDim.
      * Ragged subspaces (localKMeans clamps k to the distinct sample
      * count) pad by REPEATING THE LAST CODEWORD — the strict-<
      * first-wins argmin never prefers a duplicate over its first
      * occurrence and encode never emits a padded index, so padding is
      * semantically invisible to both kernels. */
    def flatCenters: Seq[Double] = {
      val out = new Array[Double](m * k * subDim)
      var j = 0
      while (j < m) {
        val cb = centers(j)
        var c = 0
        while (c < k) {
          val cw = cb(math.min(c, cb.length - 1))
          var t = 0
          while (t < subDim) { out((j * k + c) * subDim + t) = cw(t); t += 1 }
          c += 1
        }
        j += 1
      }
      out.toSeq
    }
  }

  /** Hard cap on sample values (rows × dims ≈ 128 MB of doubles) the
    * driver-local fit will collect. */
  val MaxFitValues: Long = 1L << 24

  /** Residue space for the hash-stable fit samples (here and in
    * [[IvfSearch.build]]). POWER OF TWO on purpose: hash() is 32-bit
    * Murmur3 and 2^32 is an exact multiple of 2^30, so every residue
    * has exactly 4 preimages and the keep-rate is exactly keepPer/2^30.
    * A decimal modulus (the old 1e9) splits 2^32 unevenly — low
    * residues get 5 preimages vs 4, biasing the expected sample to
    * ≈1.16× the cap whenever the keep slice sits inside the uneven
    * range (the common large-n case). */
  val SampleModulus: Long = 1L << 30

  /** Fit `m` subspace codebooks on a bounded, partitioning-stable
    * sample. The sample key is the hash of the EMBEDDING itself, so the
    * keep-set is identical on any cluster layout; the collected sample
    * is sorted and deduped per subspace before the seeded local
    * kmeans++ fit, so the codebook is deterministic under any input
    * partitioning (and duplicate-heavy corpora just clamp k to the
    * distinct count instead of starving the init). */
  def fit(embeddings: DataFrame, embCol: String, m: Int, k: Int = 16,
      seed: Long = 42L, fitSampleRows: Long = -1L, maxIter: Int = 20): Model = {
    val (sample, dim) = sampleForFit(embeddings, embCol, m, k, fitSampleRows, seed)
    fitOnSample(sample, m, dim / m, k, seed, maxIter)
  }

  /** The bounded, partitioning-stable sample collection [[fit]] runs on
    * — shared with [[Opq.fit]], whose alternating loop re-fits codebooks
    * on ROTATIONS of the same sample (collect once, iterate
    * driver-local: the bpeTrain argument). Returns (sample, dim). */
  private[llm] def sampleForFit(embeddings: DataFrame, embCol: String, m: Int,
      k: Int, fitSampleRows: Long, seed: Long): (Array[Array[Double]], Int) = {
    val base = embeddings.select(col(embCol).cast("array<double>").as("__e"))
    val dim = base.select(size(col("__e"))).head().getInt(0)
    require(m > 0 && dim % m == 0, s"dim $dim not divisible into $m subspaces")
    require(k > 0, s"codewords per subspace must be positive: $k")
    val cap = if (fitSampleRows > 0) fitSampleRows else 512L * k
    // the driver-local fit's own scale guard (the Smote broadcast-guard
    // precedent): the collected sample must actually fit on the driver.
    // 512·k rows is fine for codebook-sized k; a caller asking for a
    // huge k must size fitSampleRows deliberately — quality saturates
    // at a few hundred points per codeword anyway.
    require(cap * dim <= MaxFitValues,
      s"PQ fit sample would collect $cap rows × $dim dims > $MaxFitValues values " +
        "to the driver — pass a smaller fitSampleRows (a few hundred rows per " +
        "codeword saturates codebook quality)")
    val n = base.count()
    val fitInput =
      if (n <= cap) base
      else {
        // fine power-of-two modulus ([[SampleModulus]]): the keep-rate
        // resolution bounds the EXPECTED collected rows by ≈cap until
        // n > 2^30·cap (beyond any corpus this serves), and the exact
        // 2^32/2^30 residue split keeps the keep-rate unbiased — a
        // coarse or decimal modulus either clamps keepPer to 1 too
        // early or skews the low residues' preimage counts
        val keepPer = math.max(1L, cap * SampleModulus / n)
        base.filter(pmod(hash(col("__e"), lit(seed)), lit(SampleModulus)) < lit(keepPer))
      }
    val sample: Array[Array[Double]] = fitInput.collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot fit a codebook on an empty corpus")
    (sample, dim)
  }

  /** The driver-local per-subspace codebook fit over an in-memory
    * sample. Per-subspace dedup + sort make the result deterministic
    * under ANY collect order, so a caller feeding transformed copies of
    * the same multiset (Opq's rotated samples) gets the same
    * determinism for free. */
  private[llm] def fitOnSample(sample: Array[Array[Double]], m: Int,
      subDim: Int, k: Int, seed: Long, maxIter: Int): Model = {
    val centers = (0 until m).map { j =>
      // dedup on a VALUE-comparable shape: Java arrays compare by
      // reference, so Array.distinct is a no-op on Array[Array[Double]]
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))
        .distinctBy(_.toSeq)
        .sortBy(_.toIndexedSeq)(Ordering.Implicits.seqOrdering[IndexedSeq, Double])
      localKMeans(sub, k, seed + j, maxIter).map(_.toSeq).toSeq
    }
    Model(m, subDim, k, centers)
  }

  /** Persist the codebooks: (m, subDim, k) meta plus one row per
    * (subspace, code) — m·k rows of subDim doubles, a metadata-sized
    * artifact. At 100 TB the codebooks are fit once and every encode /
    * ADC session reloads them (the reference persists every artifact it
    * fits — reference preprocess.py:52-55, train_model.py:113-114); the
    * CODED corpus itself is an ordinary DataFrame the caller writes as
    * a parquet table next to this. */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model, dir: String): Unit = {
    import spark.implicits._
    val rows = for {
      j <- model.centers.indices
      c <- model.centers(j).indices
    } yield (j, c, model.centers(j)(c))
    rows.toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    Seq((model.m, model.subDim, model.k)).toDF("m", "sub_dim", "k")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Reload persisted codebooks — the one collect is m·k rows, bounded
    * by the fit's own driver guard. Codeword order within a subspace is
    * restored from the stored code ids, so encode/decode over a loaded
    * model is bit-identical to the session that fit it. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Model = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    val (m, subDim, k) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
    val rows = spark.read.parquet(s"$dir/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
    val centers = (0 until m).map { j =>
      rows.filter(_._1 == j).sortBy(_._2).map(_._3).toSeq
    }
    Model(m, subDim, k, centers)
  }

  private def sqdist(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }

  /** Seeded kmeans++ init + Lloyd's iterations over a small in-memory
    * point set (callers pass the SORTED, DEDUPED bounded sample — both
    * make the result partitioning-independent). Empty clusters keep
    * their previous center; converges early when assignments stop
    * moving. */
  private[llm] def localKMeans(points: Array[Array[Double]], k: Int,
      seed: Long, maxIter: Int): Array[Array[Double]] = {
    val n = points.length
    val kEff = math.min(k, n)
    val rnd = new scala.util.Random(seed)
    // kmeans++: next center ∝ squared distance to the nearest chosen one
    val centers = scala.collection.mutable.ArrayBuffer(points(rnd.nextInt(n)).clone())
    val dmin = Array.fill(n)(Double.MaxValue)
    while (centers.length < kEff) {
      var i = 0; var tot = 0.0
      while (i < n) {
        val d = sqdist(points(i), centers.last)
        if (d < dmin(i)) dmin(i) = d
        tot += dmin(i); i += 1
      }
      if (tot == 0.0) return centers.toArray // all points already covered
      var r = rnd.nextDouble() * tot
      var idx = 0
      while (idx < n - 1 && r >= dmin(idx)) { r -= dmin(idx); idx += 1 }
      centers += points(idx).clone()
    }
    val assign = Array.fill(n)(-1)
    var moved = true
    var iter = 0
    while (moved && iter < maxIter) {
      moved = false
      var i = 0
      while (i < n) {
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < centers.length) {
          val d = sqdist(points(i), centers(c))
          if (d < bestD) { bestD = d; best = c } // strict <: first wins ties
          c += 1
        }
        if (assign(i) != best) { assign(i) = best; moved = true }
        i += 1
      }
      if (moved) {
        val sums = Array.fill(centers.length)(new Array[Double](points(0).length))
        val counts = new Array[Int](centers.length)
        i = 0
        while (i < n) {
          val c = assign(i); counts(c) += 1
          var d = 0
          while (d < points(i).length) { sums(c)(d) += points(i)(d); d += 1 }
          i += 1
        }
        var c = 0
        while (c < centers.length) {
          if (counts(c) > 0) {
            var d = 0
            while (d < sums(c).length) { centers(c)(d) = sums(c)(d) / counts(c); d += 1 }
          } // empty cluster: keep the previous center
          c += 1
        }
      }
      iter += 1
    }
    centers.toArray
  }

  /** Native fused squared distance ([[graft.functions.SqDist]] —
    * codegen'd, allocation-free; identical accumulation order to the
    * HOF fold it replaced). Requires the GraftExtensions session. */
  private def d2(a: Column, b: Column): Column =
    call_function("sq_dist", a, b)

  /** Add a `codesCol` array<int> of length m: the per-subspace nearest
    * codewords in ONE scan-shaped projection — the native
    * [[graft.functions.PqEncode]] kernel (a plain Java loop nest inside
    * whole-stage codegen; the per-subspace `aggregate` HOF fold it
    * replaced was CodegenFallback — m interpreted folds with a struct
    * allocation per codeword per row, on the operator that touches
    * every corpus row at index build AND every arrival at ingest). Same
    * strict-< first-wins tie rule as the local fit, so encode stays
    * deterministic everywhere. A NULL embedding takes NULL codes, and —
    * stricter than the old fold, which left −1s — so does a WRONG-LENGTH
    * embedding (the kernel's divisibility contract): malformed input is
    * a detectable absence, the cluster = −1 quarantine rule. */
  def encode(df: DataFrame, embCol: String, model: Model,
      codesCol: String = "codes"): DataFrame =
    df.withColumn(codesCol,
      call_function("pq_encode", typedLit(model.flatCenters),
        col(embCol).cast("array<double>"), lit(model.k), lit(model.m)))

  /** Reconstruction of a codes column: codeword lookup per subspace,
    * concatenated — pure Column arithmetic over the codebook literal. */
  def decode(model: Model, codes: Column): Column =
    concat((0 until model.m).map { j =>
      element_at(typedLit(model.centers(j)), element_at(codes, j + 1) + 1)
    }: _*)

  /** Residual of each vector against its inverted list's centroid —
    * the IVFADC refinement (Jégou et al. 2011 §IV): within a list the
    * residuals r = x − c_list span a much tighter ball than the raw
    * vectors (the coarse quantizer already absorbed the between-list
    * variance), so PQ codebooks trained on residuals spend their k
    * codewords on local detail instead of re-learning list positions —
    * materially lower reconstruction error for the same code budget.
    *
    * The centroid arrives via a BROADCAST join on the `cluster` column,
    * not a plan literal: k can be 65536 on a big index
    * ([[IvfSearch.MaxK]]), and embedding k·dim doubles in the plan is
    * the exact hazard [[IvfSearch.build]]'s fallback guard documents.
    * Quarantined rows (`cluster = -1`, the [[IvfSearch.assign]]
    * malformed-row contract) take a null residual — unreachable by
    * probes, visibly null here, never silently coded. */
  def withResidual(df: DataFrame, embCol: String,
      centers: Seq[Seq[Double]], out: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = centers.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cluster", "__cent")
    df.join(broadcast(cents), Seq("cluster"), "left")
      .withColumn(out,
        when(col("cluster") >= 0,
          zip_with(col(embCol).cast("array<double>"), col("__cent"), (a, b) => a - b)))
      .drop("__cent")
  }

  /** Fit codebooks on the RESIDUALS of an IVF-indexed corpus — same
    * bounded-sample driver-local fit as [[fit]], same determinism
    * guarantees; quarantined rows are excluded (their residual is
    * undefined). Pair with [[encodeResidual]] and
    * `ivfAdcSearch(..., residual = true)`. */
  def fitResidual(index: IvfSearch.Index, embCol: String, m: Int, k: Int = 16,
      seed: Long = 42L, fitSampleRows: Long = -1L, maxIter: Int = 20): Model = {
    val res = withResidual(index.indexed.filter(col("cluster") >= 0),
      embCol, index.centers, "__res")
    fit(res, "__res", m, k, seed, fitSampleRows, maxIter)
  }

  /** [[encode]] over residuals: `df` must carry the IVF `cluster`
    * column (an indexed corpus, or [[IvfSearch.assign]]ed arrivals).
    * Quarantined rows encode to null codes. */
  def encodeResidual(df: DataFrame, embCol: String,
      centers: Seq[Seq[Double]], model: Model,
      codesCol: String = "codes"): DataFrame =
    encode(withResidual(df, embCol, centers, "__res"), "__res", model, codesCol)
      .drop("__res")

  /** IVF + PQ composed search — the production ANN end-state: the IVF
    * index prunes candidates to the `nProbe` nearest inverted lists
    * (per-query work ~nProbe/k of the corpus, [[IvfSearch.search]]'s
    * argument) and ADC ranks the survivors over their CODES — the scan
    * reads m small ints per row instead of the full float vector, so
    * the probe working set is 32× smaller on top of the list pruning.
    * `coded` must carry the IVF `cluster` column AND the PQ codes of
    * the SAME corpus (build once: `encode(index.indexed, ...)`).
    *
    * With `residual = true` (codes from [[encodeResidual]], model from
    * [[fitResidual]] — the full IVFADC of Jégou et al. 2011), each
    * probe row re-bases its query onto the probed list's centroid
    * (q − c_list) BEFORE the candidate join, so the ADC distance
    * compares residual to residual codewords. The re-basing happens on
    * the probe side where the centroid is already in hand — per
    * (query × nProbe) row, never per candidate — and everything
    * downstream (join shape, broadcast sizing, distance fold, top-k
    * window) is byte-identical to the raw path.
    *
    * The probe-set join strategy is sized to the QUERY set exactly as
    * [[IvfSearch.search]] sizes it: a small batch broadcasts its
    * queries×nProbe probe rows (each carries a full-precision
    * embedding), a query TABLE above `maxBroadcastQueries` rows — e.g.
    * corpus-vs-corpus dedup via ANN — takes the shuffled equi-join on
    * cluster id instead, because broadcasting an unbounded probe set of
    * float vectors is the executor-OOM shape the Smote guard documents.
    * @param numQueries caller-known query-set size; when absent the
    *   sizing runs one count(*) over `queries` (cache the frame or pass
    *   the size if its lineage is expensive). */
  def ivfAdcSearch(index: IvfSearch.Index, coded: DataFrame, idCol: String,
      codesCol: String, queries: DataFrame, qIdCol: String, qEmbCol: String,
      model: Model, nProbe: Int, topK: Int,
      maxBroadcastQueries: Long = 1L << 16,
      numQueries: Option[Long] = None,
      residual: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc_dist"), col(idCol))
    adcCandidates(index, coded, idCol, codesCol, queries, qIdCol, qEmbCol,
      model, nProbe, maxBroadcastQueries, numQueries, residual, keepFull = false)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col(idCol).as("neighbor_id"), col("adc_dist"))
  }

  /** ADC shortlist + exact re-rank — IVFADC+R (Jégou et al., "Searching
    * in one billion vectors: re-rank with source coding", ICASSP 2011):
    * the ADC pass ranks each query's probed candidates by quantized
    * distance and keeps a `topK·refine` shortlist; the survivors alone
    * get an EXACT squared distance on the corpus's full-precision
    * `embCol`, and the final top-k orders by that. The accuracy/IO trade
    * at 100 TB: the probe scan still reads only the m-byte codes per
    * candidate (the 32× working-set win), while full vectors are read
    * for topK·refine rows PER QUERY — point reads, never a corpus scan —
    * so quantization error stops deciding final ranks at the cost of a
    * bounded second look. `coded` must carry `embCol` alongside the
    * codes (the saved corpus does: codes ride it as a column).
    *
    * Output contract matches [[ivfAdcSearch]] with the exact distance in
    * place of the quantized one: (q_id, rnk, neighbor_id, dist). */
  def ivfAdcRefine(index: IvfSearch.Index, coded: DataFrame, idCol: String,
      embCol: String, codesCol: String, queries: DataFrame, qIdCol: String,
      qEmbCol: String, model: Model, nProbe: Int, topK: Int, refine: Int = 4,
      maxBroadcastQueries: Long = 1L << 16,
      numQueries: Option[Long] = None,
      residual: Boolean = false): DataFrame = {
    require(refine >= 1, s"refine factor must be >= 1: $refine")
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adc_dist"), col(idCol))
    val wX = Window.partitionBy(col("q_id")).orderBy(col("dist"), col(idCol))
    adcCandidates(index, coded, idCol, codesCol, queries, qIdCol, qEmbCol,
      model, nProbe, maxBroadcastQueries, numQueries, residual, keepFull = true)
      .withColumn("adc_rnk", row_number().over(wAdc))
      .filter(col("adc_rnk") <= topK.toLong * refine)
      // exact distance on the ORIGINAL query vector (residual re-based
      // the ADC copy; q_full survives untouched for exactly this)
      .withColumn("dist", round(d2(col("q_full"), col(embCol).cast("array<double>")), 4))
      .withColumn("rnk", row_number().over(wX))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col(idCol).as("neighbor_id"), col("dist"))
  }

  /** Shared candidate pipeline of [[ivfAdcSearch]] / [[ivfAdcRefine]]:
    * probe the nProbe nearest lists, join candidates on the (bucketed)
    * cluster key with query-set-sized join strategy, attach the ADC
    * distance. With `keepFull` the probe rows also carry the original
    * full-precision query vector as `q_full` (the re-rank pass needs it;
    * the residual path rewrites `q_emb` per probed list). */
  private def adcCandidates(index: IvfSearch.Index, coded: DataFrame,
      idCol: String, codesCol: String, queries: DataFrame, qIdCol: String,
      qEmbCol: String, model: Model, nProbe: Int, maxBroadcastQueries: Long,
      numQueries: Option[Long], residual: Boolean, keepFull: Boolean): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val centroids = index.centers.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("cluster", "centroid")
    val q = queries.select(col(qIdCol).as("q_id"), col(qEmbCol).cast("array<double>").as("q_emb"))
    // probe the nProbe nearest lists by the index's own metric
    val wC = Window.partitionBy(col("q_id")).orderBy(col("c_dist"), col("cluster"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("c_dist", d2(col("q_emb"), col("centroid")))
      .withColumn("c_rank", row_number().over(wC))
      .filter(col("c_rank") <= nProbe)
      .select(Seq(
        col("q_id"),
        (if (residual) zip_with(col("q_emb"), col("centroid"), (a, b) => a - b)
         else col("q_emb")).as("q_emb"),
        col("cluster")) ++
        (if (keepFull) Seq(col("q_emb").as("q_full")) else Nil): _*)
    // a persisted coded corpus is bucket-partitioned exactly like the
    // IVF corpus; deriving the bucket on the probe side keeps partition
    // pruning alive through the fan-out clamp (IvfSearch.bucketedProbes)
    val (keyedProbes, joinKeys) =
      IvfSearch.bucketedProbes(probes, coded, index.listBuckets)
    val probeSide =
      if (numQueries.getOrElse(queries.count()) <= maxBroadcastQueries)
        broadcast(keyedProbes) else keyedProbes
    // native ADC kernel — THE serving inner loop (one eval per query ×
    // candidate row); the transform/aggregate HOF nest it replaced was
    // interpreted with an intermediate array per row
    val dist = call_function("pq_adc_dist", typedLit(model.flatCenters),
      col("q_emb"), col(codesCol), lit(model.k))
    coded.join(probeSide, joinKeys)
      .withColumn("adc_dist", round(dist, 4))
  }

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
    val q = broadcast(
      queries.select(col(qIdCol).as("q_id"), col(qEmbCol).cast("array<double>").as("q_emb")))
    val dist = call_function("pq_adc_dist", typedLit(model.flatCenters),
      col("q_emb"), col(codesCol), lit(model.k))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc_dist"), col(idCol))
    coded.crossJoin(q)
      .withColumn("adc_dist", round(dist, 4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col(idCol).as("neighbor_id"), col("adc_dist"))
  }
}

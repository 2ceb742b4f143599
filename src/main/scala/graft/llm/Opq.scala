package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimized Product Quantization (Ge, He, Ke, Sun, "Optimized Product
  * Quantization for Approximate Nearest Neighbor Search", CVPR 2013;
  * equivalently Norouzi & Fleet's ck-means): learn an ORTHOGONAL
  * rotation R of the embedding space jointly with the PQ codebooks, so
  * the m independent subspaces the codes assume actually decorrelate —
  * plain PQ's split is arbitrary, and when energy concentrates in a few
  * correlated dims (the usual shape of learned embeddings) some
  * subspaces starve while others waste codewords. Rotation is an
  * isometry, so every distance-based consumer (ADC, IVF probes, dedup
  * gates) works unchanged in the rotated space; the win is purely lower
  * reconstruction error at the SAME code budget — at 100 TB that is
  * recall bought with metadata, not bytes.
  *
  * Execution shape — the [[ProductQuant.fit]] discipline end-to-end:
  * the non-parametric OPQ alternation needs only the bounded fit sample
  * (quality saturates with a few hundred points per codeword), so the
  * sample is collected ONCE and the whole loop runs driver-local:
  * rotate sample → fit m codebooks ([[ProductQuant.fitOnSample]]) →
  * reconstruct → solve the orthogonal Procrustes problem for the next R
  * (SVD of the d×d cross-covariance — d = 64 here, trivially
  * driver-sized). Everything corpus-sized stays distributed and
  * scan-shaped: the rotation applies through the codegen'd `mat_vec`
  * kernel ([[graft.functions.MatVec]]) with the matrix arriving via a
  * one-row BROADCAST join, never a plan literal (a 4096-dim embedding
  * would put 16M doubles in the plan — the exact hazard
  * [[ProductQuant.withResidual]] documents for centroids), and
  * encode/search delegate to the existing PQ operators on the rotated
  * column.
  *
  * Determinism + monotonicity contract: the collected sample is sorted
  * canonically, so the SSE sums and the Procrustes cross-covariance
  * accumulate in a fixed order — the fit is identical under any input
  * partitioning (the [[ProductQuant.fit]] claim, extended). Iteration 0
  * runs with R = I, which IS plain PQ with the same seed and sample;
  * the best (R, codebooks) by sample SSE is tracked with strict `<`
  * across iterations, so by construction the returned model's
  * reconstruction error on the fit data is ≤ plain PQ's — gated on the
  * oracle surface by q126. */
object Opq {

  /** rotation(i)(j) = R_ij; encode/search operate on y = R·x. */
  final case class Model(rotation: Seq[Seq[Double]], pq: ProductQuant.Model) {
    def dim: Int = rotation.length
  }

  /** Fit rotation + codebooks by alternating minimization on the
    * bounded sample. `opqIters` alternations (codebook fit ↔ Procrustes
    * rotation update); `maxIter` is each inner Lloyd budget — the same
    * knob [[ProductQuant.fit]] takes, so "plain PQ at the same budget"
    * is exactly `ProductQuant.fit(..., maxIter)`. */
  def fit(embeddings: DataFrame, embCol: String, m: Int, k: Int = 16,
      seed: Long = 42L, opqIters: Int = 8, maxIter: Int = 20,
      fitSampleRows: Long = -1L): Model = {
    require(opqIters >= 1, s"opqIters must be >= 1: $opqIters")
    val (sample0, dim) = ProductQuant.sampleForFit(
      embeddings, embCol, m, k, fitSampleRows, seed)
    val subDim = dim / m
    // canonical row order: every accumulation below (SSE, the Procrustes
    // cross-covariance) is then independent of collect order, i.e. of
    // input partitioning
    val sample = sample0.sortBy(_.toIndexedSeq)(
      Ordering.Implicits.seqOrdering[IndexedSeq, Double])
    var r = identityMatrix(dim)
    var bestSse = Double.MaxValue
    var bestR: Array[Array[Double]] = null
    var bestPq: ProductQuant.Model = null
    var iter = 0
    while (iter < opqIters) {
      val rotated = sample.map(x => matVecLocal(r, x))
      val pq = ProductQuant.fitOnSample(rotated, m, subDim, k, seed, maxIter)
      val recon = rotated.map(y => reconstruct(y, pq))
      var sse = 0.0
      var i = 0
      while (i < rotated.length) {
        var j = 0
        while (j < dim) {
          val t = rotated(i)(j) - recon(i)(j); sse += t * t; j += 1
        }
        i += 1
      }
      // strict <: ties keep the EARLIER iteration, so iteration 0
      // (= plain PQ) survives unless a rotation genuinely improves
      if (sse < bestSse) { bestSse = sse; bestR = r; bestPq = pq }
      if (iter < opqIters - 1) {
        // orthogonal Procrustes: min_R Σ‖R·x − ŷ‖² over orthogonal R
        // = max_R <R, B> with B = Σ ŷ·xᵀ (reconstructions against the
        // ORIGINAL sample) → R = U·Vᵀ from B's SVD
        val b = Array.ofDim[Double](dim, dim)
        i = 0
        while (i < sample.length) {
          val x = sample(i); val y = recon(i)
          var a = 0
          while (a < dim) {
            val ya = y(a); val row = b(a)
            var c = 0
            while (c < dim) { row(c) += ya * x(c); c += 1 }
            a += 1
          }
          i += 1
        }
        r = procrustesRotation(b)
      }
      iter += 1
    }
    Model(bestR.map(_.toSeq).toSeq, bestPq)
  }

  /** Rotate an embedding column: `out = R·emb` via the codegen'd
    * `mat_vec` kernel, the flat row-major matrix arriving through a
    * ONE-ROW broadcast join (scale contract: the rotation is d² doubles
    * — 32 KB at d=64 but 128 MB at d=4096 — so it rides the broadcast
    * tier like every other fitted artifact, never the plan tree). NULL
    * embeddings rotate to NULL; a length mismatch vs the rotation dim
    * is NULL by the `mat_vec` divisibility contract — malformed input
    * stays a detectable absence. */
  def rotate(df: DataFrame, embCol: String, model: Model, out: String): DataFrame =
    rotateWith(df, embCol, model.rotation, out)

  /** [[rotate]] from a bare rotation matrix — the ingest path
    * ([[graft.streaming.StreamOps.ivfIngestBatch]]) carries only the
    * rotation (loaded once at stream start via [[loadRotation]]), not
    * the whole model. `out = embCol` overwrites in place, which is how
    * arrivals into a rotated index enter the index's own space. */
  def rotateWith(df: DataFrame, embCol: String, rotation: Seq[Seq[Double]],
      out: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rotDf = Seq(Tuple1(rotation.flatten)).toDF("__rot")
    df.crossJoin(broadcast(rotDf))
      .withColumn(out,
        call_function("mat_vec", col("__rot"), col(embCol).cast("array<double>")))
      .drop("__rot")
  }

  /** [[ProductQuant.encode]] in the rotated space: one scan-shaped
    * projection — rotation and per-subspace argmin fuse into the same
    * whole-stage-codegen span, no shuffle. */
  def encode(df: DataFrame, embCol: String, model: Model,
      codesCol: String = "codes"): DataFrame =
    ProductQuant.encode(rotate(df, embCol, model, "__roty"), "__roty",
      model.pq, codesCol).drop("__roty")

  /** ADC top-k in the rotated space — rotation is an isometry, so the
    * quantized distances approximate the ORIGINAL distances and the
    * result contract matches [[ProductQuant.adcSearch]] exactly. Only
    * the (small) query set pays a rotation at search time; the corpus
    * rotated once at encode time. */
  def adcSearch(coded: DataFrame, idCol: String, codesCol: String,
      queries: DataFrame, qIdCol: String, qEmbCol: String,
      model: Model, topK: Int): DataFrame =
    ProductQuant.adcSearch(coded, idCol, codesCol,
      rotate(queries, qEmbCol, model, "__qrot"), qIdCol, "__qrot",
      model.pq, topK)

  /** Persist rotation + codebooks: d rotation rows next to the
    * [[ProductQuant.save]] artifact — metadata-sized, the fit-once
    * serve-forever lifecycle every other index artifact follows. */
  def save(spark: SparkSession, model: Model, dir: String): Unit = {
    import spark.implicits._
    model.rotation.zipWithIndex.map { case (row, i) => (i, row) }
      .toDF("row_idx", "row")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/rotation")
    ProductQuant.save(spark, model.pq, s"$dir/pq")
  }

  /** Reload a persisted model bit-identically (row order restored from
    * the stored indices, the [[ProductQuant.load]] rule). */
  def load(spark: SparkSession, dir: String): Model =
    Model(loadRotation(spark, dir), ProductQuant.load(spark, s"$dir/pq"))

  /** Just the rotation rows — what a serving or ingest session that
    * already holds its PQ model (e.g. a residual fit) needs. */
  def loadRotation(spark: SparkSession, dir: String): Seq[Seq[Double]] =
    spark.read.parquet(s"$dir/rotation").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1).map(_._2).toSeq

  // ---- driver-local linear algebra (d×d, d = embedding dim) ----

  private def identityMatrix(d: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) { m(i)(i) = 1.0; i += 1 }
    m
  }

  private[llm] def matVecLocal(m: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val out = new Array[Double](m.length)
    var i = 0
    while (i < m.length) {
      val row = m(i); var acc = 0.0; var j = 0
      while (j < v.length) { acc += row(j) * v(j); j += 1 }
      out(i) = acc; i += 1
    }
    out
  }

  /** Nearest-codeword reconstruction of one (rotated) vector — the
    * driver-local twin of encode→decode, same strict-< first-wins tie
    * rule as [[ProductQuant]]'s codegen argmin. */
  private def reconstruct(y: Array[Double], pq: ProductQuant.Model): Array[Double] = {
    val out = new Array[Double](y.length)
    var j = 0
    while (j < pq.m) {
      val base = j * pq.subDim
      val cb = pq.centers(j)
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cb.length) {
        val cw = cb(c); var d = 0.0; var t = 0
        while (t < pq.subDim) {
          val diff = y(base + t) - cw(t); d += diff * diff; t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      val bw = cb(best)
      var t = 0
      while (t < pq.subDim) { out(base + t) = bw(t); t += 1 }
      j += 1
    }
    out
  }

  /** argmax_{R orthogonal} <R, B>  =  U·Vᵀ where B = U·Σ·Vᵀ — the
    * closed-form Procrustes solution. The SVD comes from the Jacobi
    * eigendecomposition of BᵀB (= V·Σ²·Vᵀ): u_j = B·v_j/σ_j for the
    * TRUSTWORTHY σ only — forming BᵀB squares the condition number, so
    * singular values below ≈√ε·σmax ≈ 1e-8·σmax are numerical noise
    * (the OPQ cross-covariance is routinely near-rank-deficient: a
    * corpus whose dims are linear copies of each other, the exact case
    * the rotation exists for, puts half the spectrum there, and u =
    * B·v/σ for a garbage σ is a garbage direction with garbage norm).
    * Everything below the 1e-7·σmax trust cut — plus ALL computed
    * columns, as insurance — goes through a modified-Gram-Schmidt pass
    * with deterministic canonical-basis replacement for collapsed
    * columns, so U is orthonormal to machine precision BY CONSTRUCTION
    * and R = U·Vᵀ is orthogonal regardless of B's rank or
    * conditioning. Near-null directions contribute ≤ σ_j to the
    * Procrustes objective, so their arbitrary-but-orthonormal
    * completion costs nothing. */
  private[llm] def procrustesRotation(b: Array[Array[Double]]): Array[Array[Double]] = {
    val d = b.length
    val btb = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        var acc = 0.0; var r = 0
        while (r < d) { acc += b(r)(i) * b(r)(j); r += 1 }
        btb(i)(j) = acc; btb(j)(i) = acc
        j += 1
      }
      i += 1
    }
    val (evals, v) = jacobiEigSym(btb) // v columns = eigenvectors
    // descending-σ order makes the completion stable
    val order = evals.indices.sortBy(i => -evals(i))
    val sigma = order.map(i => math.sqrt(math.max(0.0, evals(i)))).toArray
    val sigMax = if (sigma.isEmpty) 0.0 else sigma(0)
    val tol = math.max(sigMax * 1e-7, Double.MinPositiveValue)
    val u = Array.ofDim[Double](d, d)
    val vOrd = Array.ofDim[Double](d, d) // columns in descending-σ order
    i = 0
    while (i < d) {
      var c = 0
      while (c < d) { vOrd(i)(c) = v(i)(order(c)); c += 1 }
      i += 1
    }
    var c = 0
    while (c < d) {
      if (sigma(c) > tol) {
        var r = 0
        while (r < d) {
          var acc = 0.0; var t = 0
          while (t < d) { acc += b(r)(t) * vOrd(t)(c); t += 1 }
          u(r)(c) = acc / sigma(c)
          r += 1
        }
      }
      // σ ≤ tol: leave zeros — the MGS pass below replaces the column
      c += 1
    }
    // modified Gram-Schmidt over ALL columns: project out the previous
    // columns, renormalize; a collapsed column (norm below threshold —
    // untrusted σ, or a duplicated direction from a degenerate pair)
    // is replaced by the first canonical basis vector that survives
    // projection. Deterministic, and orthonormal to machine precision.
    c = 0
    while (c < d) {
      var cc = 0
      while (cc < c) {
        var dot = 0.0; var r = 0
        while (r < d) { dot += u(r)(c) * u(r)(cc); r += 1 }
        r = 0
        while (r < d) { u(r)(c) -= dot * u(r)(cc); r += 1 }
        cc += 1
      }
      var nrm = 0.0
      var r = 0
      while (r < d) { nrm += u(r)(c) * u(r)(c); r += 1 }
      if (nrm > 1e-8) {
        val inv = 1.0 / math.sqrt(nrm)
        r = 0
        while (r < d) { u(r)(c) *= inv; r += 1 }
      } else {
        var e = 0
        var done = false
        while (e < d && !done) {
          val cand = new Array[Double](d)
          cand(e) = 1.0
          cc = 0
          while (cc < c) {
            var dot = 0.0; r = 0
            while (r < d) { dot += cand(r) * u(r)(cc); r += 1 }
            r = 0
            while (r < d) { cand(r) -= dot * u(r)(cc); r += 1 }
            cc += 1
          }
          var cn = 0.0; r = 0
          while (r < d) { cn += cand(r) * cand(r); r += 1 }
          // acceptance must scale with d: with c orthonormal columns the
          // BEST canonical residual² is only guaranteed ≥ (d−c)/d ≥ 1/d
          if (cn > 0.5 / d) {
            val inv = 1.0 / math.sqrt(cn)
            r = 0
            while (r < d) { u(r)(c) = cand(r) * inv; r += 1 }
            done = true
          }
          e += 1
        }
        require(done, "Procrustes basis completion failed — no canonical direction survives")
      }
      c += 1
    }
    // R = U·Vᵀ (with both column sets in the same σ order)
    val out = Array.ofDim[Double](d, d)
    i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        var acc = 0.0; var t = 0
        while (t < d) { acc += u(i)(t) * vOrd(j)(t); t += 1 }
        out(i)(j) = acc
        j += 1
      }
      i += 1
    }
    out
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS).
    * O(d³) per sweep, converges quadratically — microseconds at the
    * embedding dims this serves, and a pure function of its input (the
    * fit-determinism contract needs no more). */
  private[llm] def jacobiEigSym(
      aIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = aIn.map(_.clone())
    val v = identityMatrix(d)
    var sweep = 0
    var off = offDiag(a)
    val scale = {
      var s = 0.0; var i = 0
      while (i < d) { var j = 0; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      math.sqrt(s)
    }
    val target = math.max(scale * 1e-14, Double.MinPositiveValue)
    while (sweep < 64 && off > target) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > target / (d.toDouble * d)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s0 => s0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              r += 1
            }
            r = 0
            while (r < d) {
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j) s += a(i)(j) * a(i)(j)
        j += 1
      }
      i += 1
    }
    math.sqrt(s)
  }
}

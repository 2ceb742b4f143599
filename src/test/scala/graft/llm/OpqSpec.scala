package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpqSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic hash-noise in [0,1) — the ProductQuantSpec generator. */
  private def mix(z: Long): Long = {
    var x = z + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  private def u(a: Long, b: Long): Double = (mix(a * 1024 + b) >>> 11).toDouble / (1L << 53)

  /** The corpus OPQ exists for: the SECOND half of each vector is a
    * scaled copy of the first (plus jitter), so with contiguous
    * subspace splits every subspace re-codes information another
    * subspace already paid for. A rotation can decorrelate; plain PQ
    * cannot. */
  private def correlated(n: Int, dim: Int): org.apache.spark.sql.DataFrame =
    (0 until n).map { i =>
      val half = (0 until dim / 2).map(d => 4.0 * (u(i, d) - 0.5))
      val emb = half ++ half.zipWithIndex.map { case (x, d) => 1.5 * x + 0.05 * (u(i, d + 500) - 0.5) }
      (i.toLong, emb)
    }.toDF("vec_id", "emb")

  test("mat_vec: identity, known matrix, dim mismatch, null propagation") {
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0)),
      (2L, null.asInstanceOf[Seq[Double]])
    ).toDF("id", "v")
    // identity 3×3 flat row-major
    val id3 = Seq(1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    val rotated = df.withColumn("y",
      call_function("mat_vec", typedLit(id3), col("v")))
    val rows = rotated.orderBy("id").collect()
    assert(rows(0).getSeq[Double](2) === Seq(1.0, 2.0, 3.0))
    assert(rows(1).isNullAt(2), "null vector must rotate to null")
    // 2×3 matrix: [[1,0,1],[0,2,0]] · (1,2,3) = (4, 4)
    val m23 = Seq(1.0, 0.0, 1.0, 0.0, 2.0, 0.0)
    val r2 = df.filter(col("id") === 1)
      .select(call_function("mat_vec", typedLit(m23), col("v"))).head().getSeq[Double](0)
    assert(r2 === Seq(4.0, 4.0))
    // 4-element matrix not divisible by 3-vector → null (malformed)
    val bad = df.filter(col("id") === 1)
      .select(call_function("mat_vec", typedLit(Seq(1.0, 2.0, 3.0, 4.0)), col("v"))).head()
    assert(bad.isNullAt(0), "non-divisible matrix length must yield null")
  }

  test("fit: rotation is orthogonal and the model is partitioning-independent") {
    val df = correlated(300, 8)
    val a = Opq.fit(df, "emb", m = 2, k = 4, opqIters = 5, maxIter = 10)
    val b = Opq.fit(df.repartition(7), "emb", m = 2, k = 4, opqIters = 5, maxIter = 10)
    assert(a.rotation === b.rotation, "fit must not depend on input partitioning")
    assert(a.pq === b.pq)
    val d = a.dim
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(t => a.rotation(i)(t) * a.rotation(j)(t)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"R·Rᵀ[$i][$j] = $dot")
    }
  }

  test("rotate preserves pairwise distances (isometry) through the distributed kernel") {
    val df = correlated(100, 8)
    val opq = Opq.fit(df, "emb", m = 2, k = 4, opqIters = 4, maxIter = 8)
    val rot = Opq.rotate(df, "emb", opq, "y")
    val pairs = rot.as("a").join(rot.as("b"),
        col("a.vec_id") === col("b.vec_id") + 1)
      .select(
        call_function("sq_dist", col("a.emb"), col("b.emb")).as("d_raw"),
        call_function("sq_dist", col("a.y"), col("b.y")).as("d_rot"))
    val worst = pairs
      .agg(max(abs(col("d_raw") - col("d_rot")) / (col("d_raw") + lit(1.0))))
      .head().getDouble(0)
    assert(worst < 1e-9, s"rotation broke a distance by relative $worst")
  }

  test("OPQ reconstruction beats plain PQ on cross-subspace-correlated data") {
    val df = correlated(400, 16).cache()
    try {
      val pq = ProductQuant.fit(df, "emb", m = 4, k = 4, maxIter = 10)
      val opq = Opq.fit(df, "emb", m = 4, k = 4, opqIters = 8, maxIter = 10)
      def sse(coded: org.apache.spark.sql.DataFrame, target: String,
          m: ProductQuant.Model): Double =
        coded.agg(sum(aggregate(
          zip_with(col(target), ProductQuant.decode(m, col("codes")),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, e) => a + e))).head().getDouble(0)
      val ssePq = sse(ProductQuant.encode(df, "emb", pq), "emb", pq)
      val sseOpq = sse(
        ProductQuant.encode(Opq.rotate(df, "emb", opq, "y"), "y", opq.pq),
        "y", opq.pq)
      // the ≤ is guaranteed by best-tracking from the R = I start; on
      // THIS corpus (half the dims are copies across the subspace cut)
      // the rotation must win by a wide margin, not by noise
      assert(sseOpq < 0.8 * ssePq,
        s"OPQ $sseOpq vs PQ $ssePq — rotation failed to decorrelate an adversarial split")
      // and the learned rotation is genuinely non-trivial
      val offIdentity = (0 until opq.dim).flatMap(i => (0 until opq.dim).map(j =>
        math.abs(opq.rotation(i)(j) - (if (i == j) 1.0 else 0.0)))).max
      assert(offIdentity > 0.1, "winning model kept the identity rotation")
    } finally df.unpersist()
  }

  test("save/load roundtrip is exact; encode over a loaded model is deterministic") {
    val df = correlated(200, 8)
    val opq = Opq.fit(df, "emb", m = 2, k = 4, opqIters = 4, maxIter = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-opq-spec").toString
    try {
      Opq.save(spark, opq, dir)
      val re = Opq.load(spark, dir)
      assert(re.rotation === opq.rotation)
      assert(re.pq === opq.pq)
      def checksum(m: Opq.Model, part: Int): Long =
        Opq.encode(df.repartition(part), "emb", m)
          .agg(sum(hash(col("vec_id"), col("codes")).cast("long"))).head().getLong(0)
      assert(checksum(re, 3) === checksum(opq, 5),
        "loaded-model encode must be bit-identical under any partitioning")
    } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("adcSearch: complete top-k per query, ranked by non-decreasing quantized distance") {
    val df = correlated(300, 8).cache()
    try {
      val opq = Opq.fit(df, "emb", m = 2, k = 8, opqIters = 4, maxIter = 8)
      val coded = Opq.encode(df, "emb", opq)
      val queries = df.filter(col("vec_id") % 50 === 0)
      val res = Opq.adcSearch(coded, "vec_id", "codes",
        queries, "vec_id", "emb", opq, topK = 3).cache()
      try {
        val nQ = queries.count()
        assert(res.count() === nQ * 3)
        assert(res.groupBy("q_id").count().filter(col("count") =!= 3).count() === 0)
        // rank order must follow the quantized distance
        val bad = res.as("a").join(res.as("b"),
            col("a.q_id") === col("b.q_id") && col("a.rnk") + 1 === col("b.rnk"))
          .filter(col("a.adc_dist") > col("b.adc_dist"))
        assert(bad.count() === 0, "adc_dist must be non-decreasing in rank")
      } finally res.unpersist()
    } finally df.unpersist()
  }
}

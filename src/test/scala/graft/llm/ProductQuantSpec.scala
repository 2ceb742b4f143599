package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ProductQuantSpec extends SparkSpec {
  import spark.implicits._

  /** Clustered synthetic corpus: `nClusters` well-separated anchors in
    * 16 dims, `perCluster` jittered members each — deterministic. */
  private def corpus(nClusters: Int, perCluster: Int): org.apache.spark.sql.DataFrame = {
    def mix(z: Long): Long = {
      var x = z + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    def u(a: Long, b: Long): Double = (mix(a * 1024 + b) >>> 11).toDouble / (1L << 53)
    (0 until nClusters * perCluster).map { i =>
      val c = i % nClusters
      val emb = (0 until 16).map(d => 10.0 * u(c, d) + 0.1 * (u(i, d + 100) - 0.5))
      (i.toLong, emb)
    }.toDF("vec_id", "emb")
  }

  test("encode emits m in-range codes; decode reconstructs within cluster jitter") {
    val df = corpus(nClusters = 6, perCluster = 30)
    val pq = ProductQuant.fit(df, "emb", m = 4, k = 8, seed = 7L)
    assert(pq.subDim === 4)
    val coded = ProductQuant.encode(df, "emb", pq)
    assert(coded.filter(size(col("codes")) =!= 4).count() === 0)
    assert(coded.filter(exists(col("codes"), c => c < 0 || c >= 8)).count() === 0)
    // reconstruction error per vector ≪ inter-anchor distance (≈10 per
    // dim): with ≥ cluster-many codewords the codebook captures anchors
    // and residual is jitter-scale
    val err = coded
      .withColumn("recon", ProductQuant.decode(pq, col("codes")))
      .withColumn("e2", aggregate(
        zip_with(col("emb"), col("recon"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, d) => a + d))
      .agg(max(col("e2"))).head().getDouble(0)
    assert(err < 1.0, s"max squared reconstruction error $err — codebook missed a cluster")
  }

  test("ADC top-k returns the query's own cluster (quantized distances rank clusters right)") {
    val nClusters = 5
    val df = corpus(nClusters, perCluster = 40).cache()
    val pq = ProductQuant.fit(df, "emb", m = 4, k = 8, seed = 11L)
    val coded = ProductQuant.encode(df, "emb", pq).cache()
    val queries = df.filter(col("vec_id") < nClusters) // one per cluster (cluster = id % 5)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val topK = 10
    val adc = ProductQuant.adcSearch(coded, "vec_id", "codes",
      queries, "q_id", "q_emb", pq, topK).cache()
    // exactly topK neighbors per query
    val perQuery = adc.groupBy("q_id").count().collect()
    assert(perQuery.length === nClusters && perQuery.forall(_.getLong(1) === topK))
    // PQ collapses within-cluster jitter (members share codes, so exact
    // member RANKS reshuffle) but must never rank another cluster's
    // members closer: every returned neighbor is from the query's cluster
    val wrongCluster = adc
      .filter(pmod(col("neighbor_id"), lit(nClusters)) =!= pmod(col("q_id"), lit(nClusters)))
      .count()
    assert(wrongCluster === 0,
      s"$wrongCluster ADC neighbors came from a different cluster")
    adc.unpersist(); df.unpersist(); coded.unpersist()
  }

  test("IVF+PQ composed search prunes lists AND ranks by quantized distance") {
    val nClusters = 5
    val df = corpus(nClusters, perCluster = 40)
      .select(col("vec_id"), col("emb").as("embedding")).cache()
    val index = IvfSearch.build(df, "vec_id", "embedding", k = nClusters, seed = 9L)
    val pq = ProductQuant.fit(df, "embedding", m = 4, k = 8, seed = 9L)
    val coded = ProductQuant.encode(index.indexed, "embedding", pq).cache()
    val queries = df.filter(col("vec_id") < nClusters)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val res = ProductQuant.ivfAdcSearch(index, coded, "vec_id", "codes",
      queries, "q_id", "q_emb", pq, nProbe = 1, topK = 10).cache()
    // every query gets a full top-k from its probed list
    val perQuery = res.groupBy("q_id").count().collect()
    assert(perQuery.length === nClusters && perQuery.forall(_.getLong(1) === 10))
    // all neighbors from the query's own cluster (nProbe=1 on separated data)
    val wrong = res.filter(
      pmod(col("neighbor_id"), lit(nClusters)) =!= pmod(col("q_id"), lit(nClusters))).count()
    assert(wrong === 0, s"$wrong neighbors leaked from unprobed clusters")
    // the plan stays join-sane: cluster equi-join, no all-pairs scan
    val p = res.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    res.unpersist(); coded.unpersist(); df.unpersist()
    index.indexed.unpersist()
  }

  test("ivfAdcSearch: a non-broadcastable query table takes the shuffle path, identical results") {
    val nClusters = 5
    val df = corpus(nClusters, perCluster = 40)
      .select(col("vec_id"), col("emb").as("embedding")).cache()
    val index = IvfSearch.build(df, "vec_id", "embedding", k = nClusters, seed = 9L)
    val pq = ProductQuant.fit(df, "embedding", m = 4, k = 8, seed = 9L)
    val coded = ProductQuant.encode(index.indexed, "embedding", pq).cache()
    val queries = df.filter(col("vec_id") < 64)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def run(threshold: Long) = ProductQuant.ivfAdcSearch(index, coded, "vec_id", "codes",
      queries, "q_id", "q_emb", pq, nProbe = 1, topK = 5, maxBroadcastQueries = threshold)
    // disable auto-broadcast so the assertion sees the strategy the hint
    // (absence) selects at 100 TB, not the planner's small-table rescue
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val shuffled = run(threshold = 4) // 64 queries > 4 → shuffle path
      val broadcasted = run(threshold = 1 << 16)
      val plan = shuffled.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin [cluster"),
        s"probe join still broadcast on the large-batch path:\n$plan")
      val bplan = broadcasted.queryExecution.executedPlan.toString
      assert(bplan.contains("BroadcastHashJoin [cluster"),
        s"small-batch path lost its probe broadcast:\n$bplan")
      val a = shuffled.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
      val b = broadcasted.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
      assert(a.nonEmpty && a.sameElements(b), "shuffle and broadcast paths disagree")
    } finally {
      spark.conf.set(key, prev)
      coded.unpersist(); df.unpersist(); index.indexed.unpersist()
    }
  }

  test("save/load roundtrips the codebooks bit-for-bit (encode identity)") {
    val df = corpus(nClusters = 4, perCluster = 25)
    val pq = ProductQuant.fit(df, "emb", m = 4, k = 8, seed = 5L)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    try {
      ProductQuant.save(spark, pq, dir)
      val re = ProductQuant.load(spark, dir)
      assert(re === pq, "loaded model differs from the fit one")
      val a = ProductQuant.encode(df, "emb", pq).select("vec_id", "codes").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
      val b = ProductQuant.encode(df, "emb", re).select("vec_id", "codes").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
      assert(a.sameElements(b), "encode over the loaded model diverged")
    } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("residual codebooks beat raw codebooks at the same budget (IVFADC refinement)") {
    val nClusters = 6
    val df = corpus(nClusters, perCluster = 40)
      .select(col("vec_id"), col("emb").as("embedding")).cache()
    val index = IvfSearch.build(df, "vec_id", "embedding", k = nClusters, seed = 13L)
    // a starved budget (2 codewords per subspace, 6 anchors): raw PQ
    // must spend its codewords on anchor POSITIONS and still misses
    // most; residual PQ only has to cover jitter around zero
    val raw = ProductQuant.fit(df, "embedding", m = 4, k = 2, seed = 13L)
    val rpq = ProductQuant.fitResidual(index, "embedding", m = 4, k = 2, seed = 13L)
    def sse(frame: org.apache.spark.sql.DataFrame, target: String,
        model: ProductQuant.Model): Double =
      ProductQuant.encode(frame, target, model)
        .withColumn("recon", ProductQuant.decode(model, col("codes")))
        .withColumn("e2", aggregate(
          zip_with(col(target), col("recon"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, d) => a + d))
        .agg(sum(col("e2"))).head().getDouble(0)
    val errRaw = sse(df, "embedding", raw)
    val errRes = sse(ProductQuant.withResidual(index.indexed, "embedding",
      index.centers, "__res"), "__res", rpq)
    assert(errRes < errRaw * 0.5,
      s"residual SSE $errRes not materially below raw SSE $errRaw")
    df.unpersist(); index.indexed.unpersist()
  }

  test("encodeResidual: quarantined rows take null codes, clean rows code in-range") {
    val nClusters = 4
    val df = corpus(nClusters, perCluster = 30)
      .select(col("vec_id"), col("emb").as("embedding")).cache()
    val index = IvfSearch.build(df, "vec_id", "embedding", k = nClusters, seed = 3L)
    val rpq = ProductQuant.fitResidual(index, "embedding", m = 4, k = 4, seed = 3L)
    // arrivals: one clean member of cluster 0's anchor, one malformed
    val clean = df.filter(col("vec_id") === 0L)
      .select(lit(1000L).as("vec_id"), col("embedding"))
    val bad = Seq(1001L).toDF("vec_id")
      .withColumn("embedding", lit(null).cast("array<double>"))
    val assigned = IvfSearch.assign(clean.unionByName(bad), "embedding", index.centers)
    val coded = ProductQuant.encodeResidual(assigned, "embedding", index.centers, rpq)
      .select("vec_id", "cluster", "codes").collect().sortBy(_.getLong(0))
    assert(coded(0).getInt(1) >= 0, "clean arrival was quarantined")
    val codes = coded(0).getSeq[Int](2)
    assert(codes.length === 4 && codes.forall(c => c >= 0 && c < 4),
      s"clean arrival's codes out of range: $codes")
    assert(coded(1).getInt(1) === -1, "malformed arrival escaped quarantine")
    assert(coded(1).isNullAt(2),
      s"quarantined arrival must take NULL codes, got ${coded(1).get(2)}")
    df.unpersist(); index.indexed.unpersist()
  }

  test("ivfAdcSearch residual path: complete own-cluster top-k, same shape as raw") {
    val nClusters = 5
    val df = corpus(nClusters, perCluster = 40)
      .select(col("vec_id"), col("emb").as("embedding")).cache()
    val index = IvfSearch.build(df, "vec_id", "embedding", k = nClusters, seed = 9L)
    val rpq = ProductQuant.fitResidual(index, "embedding", m = 4, k = 8, seed = 9L)
    val rcoded = ProductQuant.encodeResidual(index.indexed, "embedding",
      index.centers, rpq).cache()
    val queries = df.filter(col("vec_id") < nClusters)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val res = ProductQuant.ivfAdcSearch(index, rcoded, "vec_id", "codes",
      queries, "q_id", "q_emb", rpq, nProbe = 1, topK = 10, residual = true).cache()
    val perQuery = res.groupBy("q_id").count().collect()
    assert(perQuery.length === nClusters && perQuery.forall(_.getLong(1) === 10))
    val wrong = res.filter(
      pmod(col("neighbor_id"), lit(nClusters)) =!= pmod(col("q_id"), lit(nClusters))).count()
    assert(wrong === 0, s"$wrong residual-ADC neighbors leaked from unprobed clusters")
    assert(res.columns.toSeq ===
      Seq("q_id", "rnk", "neighbor_id", "adc_dist"), "residual path changed the contract")
    res.unpersist(); rcoded.unpersist(); df.unpersist(); index.indexed.unpersist()
  }

  test("ivfAdcRefine: exact re-rank recovers the true neighbors a coarse ADC collapses") {
    val nClusters = 4
    val df = corpus(nClusters, perCluster = 50)
      .select(col("vec_id"), col("emb").as("embedding")).cache()
    val index = IvfSearch.build(df, "vec_id", "embedding", k = nClusters, seed = 21L)
    // deliberately starved codebook: within a cluster most members share
    // codes, so pure ADC ranks are quantization noise — the refine pass
    // must still land the EXACT top-k
    val pq = ProductQuant.fit(df, "embedding", m = 4, k = 2, seed = 21L)
    val coded = ProductQuant.encode(index.indexed, "embedding", pq).cache()
    val queries = df.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val topK = 5
    val refined = ProductQuant.ivfAdcRefine(index, coded, "vec_id", "embedding",
      "codes", queries, "q_id", "q_emb", pq, nProbe = 1, topK = topK,
      refine = 50) // shortlist covers the whole probed list → re-rank is exact
    // ground truth: brute-force exact top-k over the whole corpus (true
    // neighbors all sit in the query's own cluster, which nProbe=1 probes);
    // same rounding + (dist, id) tie-break as the operator
    val exactDist = aggregate(
      zip_with(col("q_emb"), col("emb2"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (a, d) => a + d)
    val wE = Window.partitionBy(col("q_id")).orderBy(col("dist"), col("nid"))
    val exact = df.select(col("vec_id").as("nid"), col("embedding").as("emb2"))
      .crossJoin(queries)
      .withColumn("dist", round(exactDist, 4))
      .withColumn("rnk", row_number().over(wE))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("nid").as("neighbor_id"), col("dist"))
    val a = refined.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted
    val b = exact.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted
    assert(a.length === 3 * topK)
    assert(a.sameElements(b), "refined top-k diverged from brute-force exact top-k")
    // the coarse ADC alone does NOT produce this ranking (the refine pass
    // is load-bearing): at k=2 within-cluster codes collapse
    val adcOnly = ProductQuant.ivfAdcSearch(index, coded, "vec_id", "codes",
      queries, "q_id", "q_emb", pq, nProbe = 1, topK = topK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(!adcOnly.sameElements(a.map(t => (t._1, t._2, t._3))),
      "coarse ADC already matched exact ranks — the starved-codebook premise broke")
    // residual codes + refine compose: same exact result set
    val rpq = ProductQuant.fitResidual(index, "embedding", m = 4, k = 2, seed = 21L)
    val rcoded = ProductQuant.encodeResidual(index.indexed, "embedding",
      index.centers, rpq).cache()
    val rRefined = ProductQuant.ivfAdcRefine(index, rcoded, "vec_id", "embedding",
      "codes", queries, "q_id", "q_emb", rpq, nProbe = 1, topK = topK,
      refine = 50, residual = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted
    assert(rRefined.sameElements(b), "residual+refine diverged from exact top-k")
    coded.unpersist(); rcoded.unpersist(); df.unpersist(); index.indexed.unpersist()
  }

  test("duplicate-heavy corpora cannot starve the fit (k clamps to distinct points)") {
    val dup = (0 until 200).map(i => (i.toLong, Seq.fill(16)(if (i % 2 == 0) 1.0 else 5.0)))
      .toDF("vec_id", "emb") // only TWO distinct vectors
    val pq = ProductQuant.fit(dup, "emb", m = 4, k = 8, seed = 3L)
    val coded = ProductQuant.encode(dup, "emb", pq)
    assert(coded.count() === 200)
    assert(coded.select(col("codes")).distinct().count() === 2)
  }

  test("dim not divisible by m is rejected") {
    val df = corpus(2, 5) // 16 dims
    intercept[IllegalArgumentException] {
      ProductQuant.fit(df, "emb", m = 5, k = 4)
    }
  }
}

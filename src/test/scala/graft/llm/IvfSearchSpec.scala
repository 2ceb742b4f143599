package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IvfSearchSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  private lazy val emb = Tables.embeddings(spark, sf01)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    .cache()

  private lazy val index = IvfSearch.build(emb, "vec_id", "emb", k = 8)

  test("duplicate-heavy corpora with fewer distinct points than k do not crash the fit") {
    // duplicate points add nothing to a quantizer and can starve
    // k-center inits (MLlib's random init dedups its sampled centers
    // and then AIOOBEs when <k survive); the fit runs on distinct
    // points with k clamped to their count on BOTH fit paths
    import spark.implicits._
    val dup = (0 until 300).map { i =>
      (i.toLong, Seq.tabulate(4)(d => if (d == i % 3) 1.0 else 0.0))
    }.toDF("vec_id", "emb")
    val idx = IvfSearch.build(dup, "vec_id", "emb", k = 8)
    try {
      assert(idx.centers.length === 3)
      assert(idx.indexed.count() === 300L)
      assert(idx.indexed.select("cluster").distinct().count() === 3L)
    } finally idx.indexed.unpersist()
  }

  test("empty and all-NULL embedding columns fail with descriptive errors, not NPEs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "emb")
    val e1 = intercept[IllegalArgumentException](IvfSearch.build(empty, "vec_id", "emb"))
    assert(e1.getMessage.contains("empty corpus"))
    // rows exist but every embedding is NULL — max(size(emb)) is NULL and a
    // bare getInt would NPE without saying which column is at fault
    val allNull = Seq((1L, null: Seq[Double]), (2L, null: Seq[Double])).toDF("vec_id", "emb")
    val e2 = intercept[IllegalArgumentException](IvfSearch.build(allNull, "vec_id", "emb"))
    assert(e2.getMessage.contains("contains no non-null arrays"))
  }

  test("every vector lands in exactly one inverted list") {
    assert(index.indexed.count() === emb.count())
    val nLists = index.indexed.select("cluster").distinct().count()
    assert(nLists > 1 && nLists <= 8)
  }

  test("probing is restricted to nProbe lists per query") {
    val res = IvfSearch.search(index, emb.filter(col("vec_id") < 8),
      "vec_id", "emb", nProbe = 2, topK = 3)
    // every neighbor must come from one of the query's 2 probed clusters
    val withCluster = res.join(
      index.indexed.select(col("vec_id").as("neighbor_id"), col("cluster")), "neighbor_id")
    val perQuery = withCluster.groupBy("q_id")
      .agg(countDistinct("cluster").as("nc")).collect()
    perQuery.foreach(r => assert(r.getLong(1) <= 2))
  }

  test("quantizer fits on a bounded sample yet the index covers the full corpus") {
    // force the sampled-fit path (cap 64 ≪ 500 vectors): the quantizer
    // trains on ~64 hash-selected rows, assignment still tags every row
    val sampled = IvfSearch.build(emb, "vec_id", "emb", k = 8, fitSampleRows = 64)
    assert(sampled.indexed.count() === emb.count(), "sampled fit lost corpus coverage")
    val nLists = sampled.indexed.select("cluster").distinct().count()
    assert(nLists > 1 && nLists <= 8, s"degenerate list structure: $nLists lists")
    // the index remains searchable with bounded per-query results
    val res = IvfSearch.search(sampled, emb.filter(col("vec_id") < 4),
      "vec_id", "emb", nProbe = 2, topK = 3)
    val perQ = res.groupBy("q_id").count().collect()
    assert(perQ.nonEmpty && perQ.forall(_.getLong(1) <= 3))
    sampled.indexed.unpersist()
  }

  test("a non-broadcastable query table takes the shuffle path with identical results") {
    val queries = emb.filter(col("vec_id") < 64) // 64 rows > the forced threshold
    def run(threshold: Long) = IvfSearch.search(index, queries, "vec_id", "emb",
        nProbe = 2, topK = 3, maxBroadcastQueries = threshold)
    // at test scale the planner would auto-broadcast the tiny probe side
    // regardless of the hint; disable it so the assertion sees the
    // strategy the hint (absence) selects at 100 TB
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val shuffled = run(threshold = 4)      // forces the large-batch path
      val broadcasted = run(threshold = 1 << 16)
      // the large-batch plan must NOT broadcast the probe set (the
      // explicit centroid broadcast is k rows and always present; the
      // probe join against the corpus must be a shuffled equi-join)
      val plan = shuffled.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin [cluster"),
        s"probe join still broadcast on the large-batch path:\n$plan")
      val bplan = broadcasted.queryExecution.executedPlan.toString
      assert(bplan.contains("BroadcastHashJoin [cluster"),
        s"small-batch path lost its probe broadcast:\n$bplan")
      // identical results either way: strategy choice is plan-only
      val a = shuffled.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
      val b = broadcasted.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
      assert(a.sameElements(b), "shuffle and broadcast paths disagree")
      assert(a.nonEmpty)
    } finally spark.conf.set(key, prev)
  }

  test("adaptive k (k = -1) sizes the list count to the corpus") {
    // the clamp formula itself
    assert(IvfSearch.adaptiveK(0) === IvfSearch.MinK)
    assert(IvfSearch.adaptiveK(IvfSearch.TargetListRows) === IvfSearch.MinK)
    assert(IvfSearch.adaptiveK(10L * IvfSearch.TargetListRows) === 10)
    assert(IvfSearch.adaptiveK(10L * IvfSearch.TargetListRows + 1) === 11)
    assert(IvfSearch.adaptiveK(Long.MaxValue / 4) === IvfSearch.MaxK)
    // index invariants at two adaptively-chosen k values on the corpus
    val n = emb.count()
    for (target <- Seq(n / 5, n / 10)) {
      val kExp = IvfSearch.adaptiveK(n, target)
      assert(kExp >= IvfSearch.MinK, s"target $target chose degenerate k")
      val idx = IvfSearch.build(emb, "vec_id", "emb", k = -1, targetListRows = target)
      assert(idx.centers.length === kExp,
        s"adaptive build used k=${idx.centers.length}, formula says $kExp")
      assert(idx.indexed.count() === n, "adaptive index lost corpus coverage")
      val res = IvfSearch.search(idx, emb.filter(col("vec_id") < 4),
        "vec_id", "emb", nProbe = 2, topK = 3)
      val perQ = res.groupBy("q_id").count().collect()
      assert(perQ.nonEmpty && perQ.forall(_.getLong(1) <= 3))
      idx.indexed.unpersist()
    }
  }

  test("save/load roundtrips the index: identical centers, corpus, and search results") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    try {
      IvfSearch.save(index, dir)
      val re = IvfSearch.load(spark, dir)
      assert(re.centers === index.centers, "loaded centroids differ")
      assert(re.indexed.count() === index.indexed.count())
      val queries = emb.filter(col("vec_id") < 8)
      def rows(i: IvfSearch.Index) =
        IvfSearch.search(i, queries, "vec_id", "emb", nProbe = 2, topK = 3)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted
      val a = rows(index)
      val b = rows(re)
      assert(a.nonEmpty && a.sameElements(b), "search over the loaded index diverged")
      // the persisted corpus is partitioned BY INVERTED LIST, so a probe
      // against the loaded index prunes unprobed lists at the scan: the
      // broadcast probe side plants a dynamic-pruning subquery on the
      // cluster partition column (the 100 TB read story — nProbe/k of
      // the files, not a full scan)
      val plan = IvfSearch.search(re, queries, "vec_id", "emb", nProbe = 2, topK = 3)
        .queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"loaded-index probe scan is not partition-pruned:\n$plan")
    } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("save clamps partition fan-out to maxListPartitions and search still prunes") {
    // 8 lists forced through a 3-bucket clamp: the directory count must
    // be bounded by the cap (the small-files guard for k up to 65536),
    // bucketed search results must match the unclamped index exactly,
    // and the probe join must still carry the partition column so
    // dynamic pruning survives the clamp
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-clamp").toString
    try {
      IvfSearch.save(index, dir, maxListPartitions = 3)
      val buckets = new java.io.File(s"$dir/indexed").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("list_bucket="))
      assert(buckets.length <= 3, s"fan-out clamp leaked: ${buckets.map(_.getName).toSeq}")
      val re = IvfSearch.load(spark, dir)
      assert(re.listBuckets === Some(3))
      assert(re.indexed.count() === index.indexed.count())
      val queries = emb.filter(col("vec_id") < 8)
      def rows(i: IvfSearch.Index) =
        IvfSearch.search(i, queries, "vec_id", "emb", nProbe = 2, topK = 3)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted
      assert(rows(re).sameElements(rows(index)),
        "bucketed search diverged from the unclamped index")
      val plan = IvfSearch.search(re, queries, "vec_id", "emb", nProbe = 2, topK = 3)
        .queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"clamped layout lost partition pruning:\n$plan")
    } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("compactIngest folds the ingest tier into a versioned corpus atomically") {
    import spark.implicits._
    // 60 base vectors in 4 orthogonal directions; arrivals live in a
    // 5th direction so they are unambiguous search hits after the fold
    val base = (0 until 60).map { i =>
      (i.toLong, Seq.tabulate(8)(d => if (d == i % 4) 1.0 else 0.001 * (i % 5)))
    }.toDF("vec_id", "emb")
    def newVec(id: Long) =
      (id, Seq.tabulate(8)(d => if (d == 5) 1.0 else 0.001 * (id % 7)))
    val idx = IvfSearch.build(base, "vec_id", "emb", k = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-compact").toString
    try {
      IvfSearch.save(idx, dir)
      val buckets = IvfSearch.load(spark, dir).listBuckets.get
      def ingest(id: Long, batch: Long): Unit =
        graft.streaming.StreamOps.ivfIngestBatch(
          Seq(newVec(id)).toDF("vec_id", "emb"), batch, dir,
          idx.centers, buckets, "emb", None)
      ingest(1000L, 0L); ingest(1001L, 1L)
      assert(IvfSearch.loadServable(spark, dir).indexed.count() === 62L)

      assert(IvfSearch.compactIngest(spark, dir), "pending batches not folded")
      // the ingest tier is gone; the fold moved its rows into a NEW
      // versioned corpus dir and retired the old one
      assert(IvfSearch.loadIngest(spark, dir).isEmpty)
      assert(new java.io.File(s"$dir/indexed_v2").isDirectory)
      assert(!new java.io.File(s"$dir/indexed").exists(), "old corpus not cleaned up")
      val re = IvfSearch.loadServable(spark, dir)
      assert(re.indexed.count() === 62L, "fold lost or duplicated rows")
      val probe = Seq((9000L, Seq.tabulate(8)(d => if (d == 5) 1.0 else 0.0)))
        .toDF("vec_id", "emb")
      val found = IvfSearch.search(re, probe, "vec_id", "emb", nProbe = 2, topK = 2)
      val hits = found.select("neighbor_id").as[Long].collect().toSet
      assert(hits === Set(1000L, 1001L), s"folded vectors missing from search: $hits")
      // the compacted corpus is still bucket-partitioned: probes prune
      assert(found.queryExecution.executedPlan.toString.contains("dynamicpruning"),
        "compacted corpus lost partition pruning")

      // a folded micro-batch REPLAYED after compaction must not
      // resurrect its directory (the _tier record is authoritative)
      ingest(1001L, 1L)
      assert(IvfSearch.loadIngest(spark, dir).isEmpty,
        "replay of a folded batch resurrected ingest rows")
      assert(IvfSearch.loadServable(spark, dir).indexed.count() === 62L)

      // the cycle continues: fresh arrivals land, a second fold commits
      // the next corpus version, and an empty tier is a no-op
      ingest(1002L, 2L)
      assert(IvfSearch.loadServable(spark, dir).indexed.count() === 63L)
      assert(IvfSearch.compactIngest(spark, dir))
      assert(new java.io.File(s"$dir/indexed_v3").isDirectory)
      assert(IvfSearch.load(spark, dir).indexed.count() === 63L)
      assert(!IvfSearch.compactIngest(spark, dir), "empty tier must be a no-op")
    } finally {
      idx.indexed.unpersist()
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }

  test("tombstone deletes: logical immediately, physical at the fold, replay refused after") {
    import spark.implicits._
    val base = (0 until 60).map { i =>
      (i.toLong, Seq.tabulate(8)(d => if (d == i % 4) 1.0 else 0.001 * (i % 5)))
    }.toDF("vec_id", "emb")
    def newVec(id: Long) =
      (id, Seq.tabulate(8)(d => if (d == 5) 1.0 else 0.001 * (id % 7)))
    val idx = IvfSearch.build(base, "vec_id", "emb", k = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-delete").toString
    try {
      IvfSearch.save(idx, dir)
      val buckets = IvfSearch.load(spark, dir).listBuckets.get
      graft.streaming.StreamOps.ivfIngestBatch(
        Seq(newVec(1000L)).toDF("vec_id", "emb"), 0L, dir,
        idx.centers, buckets, "emb", None)
      assert(IvfSearch.loadServable(spark, dir).indexed.count() === 61L)

      // delete a base id AND the ingested id in one takedown batch
      IvfSearch.deleteIds(spark, dir, Seq(7L, 1000L).toDF("vec_id"), "takedown-1")
      val served = IvfSearch.loadServable(spark, dir)
      assert(served.indexed.count() === 59L, "logical delete not applied to serving")
      assert(served.indexed.filter($"vec_id".isin(7L, 1000L)).count() === 0L)
      // the deleted ingest vector is unreachable by search too
      val probe = Seq((9000L, Seq.tabulate(8)(d => if (d == 5) 1.0 else 0.0)))
        .toDF("vec_id", "emb")
      val hits = IvfSearch.search(served, probe, "vec_id", "emb", nProbe = 4, topK = 3)
        .select("neighbor_id").as[Long].collect().toSet
      assert(!hits.contains(1000L), s"deleted vector still served: $hits")
      // the base tier itself is UNTOUCHED until the fold (readers of the
      // current version are undisturbed)
      assert(IvfSearch.load(spark, dir).indexed.filter($"vec_id" === 7L).count() === 1L)

      // the fold makes it physical: rows gone from the new corpus
      // version, tombstone dirs cleaned, record carried in _tier
      assert(IvfSearch.compactIngest(spark, dir))
      val folded = IvfSearch.load(spark, dir)
      assert(folded.indexed.count() === 59L)
      assert(folded.indexed.filter($"vec_id".isin(7L, 1000L)).count() === 0L)
      assert(!new java.io.File(s"$dir/deletes/del=takedown-1").exists(),
        "folded tombstone dir not cleaned up")
      // a replayed (already-folded) delete label is refused loudly
      val e = intercept[IllegalArgumentException](
        IvfSearch.deleteIds(spark, dir, Seq(8L).toDF("vec_id"), "takedown-1"))
      assert(e.getMessage.contains("refusing replay"))
      // a deletes-only fold (no pending ingest) also works
      IvfSearch.deleteIds(spark, dir, Seq(8L).toDF("vec_id"), "takedown-2")
      assert(IvfSearch.loadServable(spark, dir).indexed.count() === 58L)
      assert(IvfSearch.compactIngest(spark, dir), "deletes-only fold did not run")
      assert(IvfSearch.load(spark, dir).indexed.count() === 58L)
      // wrong-shaped tombstones are refused before touching the artifact
      assert(intercept[IllegalArgumentException](
        IvfSearch.deleteIds(spark, dir, Seq((1L, 2L)).toDF("vec_id", "extra"), "bad"))
        .getMessage.contains("exactly the corpus id column"))
    } finally {
      idx.indexed.unpersist()
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }

  test("recall against brute-force top-3 is useful and results are exact cosines") {
    val queries = emb.filter(col("vec_id") < 16)
    val ann = IvfSearch.search(index, queries, "vec_id", "emb", nProbe = 3, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val bw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    val brute = emb.join(broadcast(
        queries.select(col("vec_id").as("q_id"), col("emb").as("q_emb"))),
        col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr(
        "aggregate(zip_with(emb, q_emb, (x, y) -> x * y), 0D, (a, x) -> a + x)" +
        " / (sqrt(aggregate(transform(emb, x -> x * x), 0D, (a, x) -> a + x))" +
        " * sqrt(aggregate(transform(q_emb, x -> x * x), 0D, (a, x) -> a + x)))"))
      .withColumn("rnk", row_number().over(bw))
      .filter(col("rnk") <= 3)
      .collect().map(r => (r.getLong(r.fieldIndex("q_id")), r.getLong(0))).toSet
    val recall = (ann & brute).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall@3 = $recall (nProbe=3/8 lists)")
  }
}

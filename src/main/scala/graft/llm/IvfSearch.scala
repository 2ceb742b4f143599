package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * additionally be partitioned/bucketed by cluster for locality
  * ([[save]] does exactly that, so a loaded index prunes unprobed lists
  * at the parquet-partition level).
  *
  * The index is deliberately MLlib-free in its representation: centers
  * are plain `Seq[Seq[Double]]`, which makes the artifact persistable as
  * a k-row parquet table ([[save]]/[[load]]) — at 100 TB the index is
  * built once and served for weeks, so the centroids + the assigned
  * corpus ARE the index, not a session-lifetime object.
  */
object IvfSearch {

  /** `centers(c)` = centroid of inverted list c; `indexed` = the corpus
    * with its `cluster` assignment column. `listBuckets` is set on a
    * LOADED index: the persisted corpus is partitioned by
    * `list_bucket = cluster mod listBuckets` ([[save]]'s fan-out
    * clamp), and search derives the same bucket on the probe side so
    * partition pruning keeps working through the clamp. */
  final case class Index(centers: Seq[Seq[Double]], indexed: DataFrame,
      listBuckets: Option[Int] = None)

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

  /** Largest k the driver-local fit path serves: beyond this the
    * centroid literal embedded in the assignment expression stops being
    * plan-sized and the distributed MLlib fit takes over. */
  val MaxLocalFitK = 4096

  def adaptiveK(n: Long, targetListRows: Long = TargetListRows,
      lo: Int = MinK, hi: Int = MaxK): Int = {
    require(targetListRows > 0, s"targetListRows must be positive: $targetListRows")
    val raw = ((math.max(n, 1L) + targetListRows - 1L) / targetListRows)
    math.min(hi.toLong, math.max(lo.toLong, raw)).toInt
  }

  /** Nearest-centroid index over the centroid literal — the
    * [[ProductQuant]] argmin shape at full vector width: fold over the
    * centroid indices carrying (best index, best distance); strict <
    * keeps the FIRST centroid on exact ties, so assignment is
    * deterministic under any partitioning. The inner distance is the
    * native codegen'd `sq_dist` kernel. */
  private[llm] def argminCenter(emb: Column, centers: Seq[Seq[Double]]): Column = {
    val cb = typedLit(centers)
    aggregate(
      sequence(lit(0), lit(centers.length - 1)),
      struct(lit(-1).as("i"), lit(Double.MaxValue).as("d")),
      (acc, i) => {
        val d = call_function("sq_dist", emb, element_at(cb, i + 1))
        when(d < acc.getField("d"), struct(i.as("i"), d.as("d"))).otherwise(acc)
      },
      acc => acc.getField("i"))
  }

  /** Build the IVF index: fit k centroids on a BOUNDED SAMPLE and tag
    * every row with its nearest list in one assignment pass.
    *
    * The quantizer fit never touches the full corpus: iterative KMeans
    * over 100 TB costs maxIter full passes, while centroid quality
    * saturates at a few hundred training points per centroid — so the
    * fit reads at most `fitSampleRows` (default 512·k) rows, selected
    * by a DETERMINISTIC hash of the id (a seeded .sample() would pick
    * different rows under different partitioning; the hash keep-set is
    * stable on any cluster layout). At the test SFs the cap exceeds the
    * corpus, so every row trains.
    *
    * HYBRID fit execution (the [[TextOps.bpeTrain]] / [[ProductQuant]]
    * argument): an iterative fit on BOUNDED data should collect once
    * and loop driver-local — an MLlib KMeans fit is init + maxIter
    * distributed rounds of tiny-job scheduling overhead for a sample
    * that fits in one driver array. When the sample cap and k are
    * plan-sized (k ≤ [[MaxLocalFitK]], cap·dim ≤
    * [[ProductQuant.MaxFitValues]]) the DISTINCT sample is collected
    * ONCE, sorted (partitioning-independent), and fit with the same
    * seeded kmeans++/Lloyd loop the PQ codebooks use; assignment is a
    * codegen-friendly argmin over the centroid literal — one
    * scan-shaped projection, no shuffle. A k beyond driver reach (the
    * adaptive formula can choose 65536 lists at 10⁹ vectors) falls back
    * to the distributed MLlib fit + model transform.
    *
    * Both paths fit on DISTINCT points only: duplicate points add
    * nothing to a quantizer, can starve k-center inits (MLlib's random
    * init dedups its sampled centers and then crashes the block
    * aggregator when fewer than k survive), and a dedup corpus makes
    * exact duplicates a first-class hazard (SemDedup NORMALIZES scaled
    * copies into identical points). k clamps to the distinct count.
    *
    * `k = -1` (the default callers should prefer) sizes the list count
    * to the corpus via [[adaptiveK]]; a positive k pins it. */
  def build(embeddings: DataFrame, idCol: String, embCol: String,
      k: Int = -1, seed: Long = 42L, fitSampleRows: Long = -1L,
      targetListRows: Long = TargetListRows, maxIter: Int = 10): Index = {
    val vecs = embeddings.select(col(idCol), col(embCol))
    // one job for both sizing facts (row count, vector width)
    val st = vecs.agg(count(lit(1)), max(size(col(embCol)))).head()
    val n = st.getLong(0)
    require(n > 0, "cannot build an IVF index over an empty corpus")
    require(!st.isNullAt(1),
      s"cannot build an IVF index: '$embCol' contains no non-null arrays")
    val dim = st.getInt(1)
    val kEff = if (k > 0) k else adaptiveK(n, targetListRows)
    val cap = if (fitSampleRows > 0) fitSampleRows else 512L * kEff
    val fitInput =
      if (n <= cap) vecs
      else {
        // keep ≈cap rows: hash the id and keep the low slice of a
        // POWER-OF-TWO residue space — hash() is 32-bit Murmur3 and
        // 2^32 mod 2^30 = 0, so every residue has exactly 4 preimages
        // and the EXPECTED kept rows are ≤ cap (a non-power modulus
        // like 1e9 leaves the low residues with 5 preimages vs 4 —
        // a silent 1.16× sample overrun in the common large-n case)
        val keepPer = math.max(1L, cap * ProductQuant.SampleModulus / n)
        vecs.filter(pmod(hash(col(idCol), lit(seed)),
          lit(ProductQuant.SampleModulus)) < lit(keepPer))
      }
    val distinctEmb = fitInput.select(col(embCol)).distinct()
    val (centers: Seq[Seq[Double]], assigned: DataFrame) =
      if (kEff <= MaxLocalFitK && cap * dim <= ProductQuant.MaxFitValues) {
        // driver-local path: the distinct sample is bounded by
        // construction (≈cap rows × dim values, guarded above), so
        // collect ONCE and run the seeded local fit — sorted first so
        // the codebook is identical on any cluster layout. k is
        // plan-sized here (≤ MaxLocalFitK), so the argmin over the
        // centroid literal is a legal codegen expression.
        val sample = distinctEmb.collect().map(_.getSeq[Double](0).toArray)
          .sortBy(_.toIndexedSeq)(Ordering.Implicits.seqOrdering[IndexedSeq, Double])
        val cs = ProductQuant.localKMeans(sample, kEff, seed, maxIter)
          .map(_.toSeq).toSeq
        (cs, assign(vecs, embCol, cs))
      } else {
        // distributed fallback: k (and so the sample) is beyond what a
        // driver array or a plan literal should hold — so BOTH the fit
        // and the assignment stay on MLlib (model.transform); routing
        // assignment through assign()'s centroid literal here would
        // re-embed k·dim doubles into the plan, the exact hazard this
        // branch exists to avoid
        val cached = distinctEmb.select(array_to_vector(col(embCol)).as("__vec")).cache()
        val nDistinctFit = cached.count()
        val kFit = math.min(kEff.toLong, math.max(1L, nDistinctFit)).toInt
        // random init (one pass) + bounded iterations: an IVF index needs
        // roughly-balanced lists, not converged centroids — kmeans|| init
        // and 20 default iterations would cost ~25 passes over the fit
        // sample for no recall gain at the nProbe values this index serves
        val model = new KMeans().setK(kFit).setSeed(seed)
          .setInitMode("random").setMaxIter(maxIter).setTol(1e-3)
          .setFeaturesCol("__vec").setPredictionCol("cluster")
          .fit(cached)
        cached.unpersist()
        val cs = model.clusterCenters.map(_.toArray.toSeq).toSeq
        (cs, model.transform(vecs.withColumn("__vec", array_to_vector(col(embCol))))
          .drop("__vec"))
      }
    val indexed = assigned.cache()
    indexed.count() // materialize the index once
    Index(centers, indexed)
  }

  /** Tag every row with its nearest inverted list — the assignment pass
    * as a standalone operator, so NEW vectors (an ingest stream, a
    * reloaded session) can be indexed against persisted centers without
    * refitting. Scan-shaped: one projection, no shuffle.
    *
    * MALFORMED-ROW CONTRACT: a row whose embedding is NULL or whose
    * length mismatches the centroid dim gets `cluster = -1` (sq_dist is
    * NULL for it, so no centroid ever beats the seed struct). That is
    * deliberate quarantine-by-construction, not an accident: probes
    * only ever target clusters ≥ 0, so corrupt rows are unreachable by
    * any search, and [[save]] writes them into a visible `cluster=-1`
    * partition the operator can audit — at 100 TB one corrupt row must
    * not kill a 1000-executor index build, but it must not silently
    * join a real list either. Callers wanting fail-fast semantics
    * filter `cluster < 0` and require the count be zero. */
  def assign(df: DataFrame, embCol: String, centers: Seq[Seq[Double]]): DataFrame =
    df.withColumn("cluster", argminCenter(col(embCol), centers))

  /** Default cap on the persisted corpus's partition fan-out. At the
    * adaptive k ceiling (65536 lists) a raw `partitionBy("cluster")` is
    * 65k directories of ~one-row-group files on a mid-size corpus — the
    * small-files listing shape HDFS/S3 hate. 1024 buckets keeps the
    * directory count listing-friendly while a probe still prunes to
    * nProbe/min(k, 1024) of the files; at 100 TB each bucket is a few
    * file-sized lists, which is exactly the layout a distributed scan
    * wants. */
  val DefaultMaxListPartitions = 1024

  /** Partition key for the persisted corpus: cluster mod `p`, with the
    * malformed-row sentinel kept as its own visible `-1` partition (a
    * pmod would smear quarantined rows into bucket p-1). */
  private[graft] def bucketCol(cluster: Column, p: Int): Column =
    when(cluster < 0, lit(-1)).otherwise(pmod(cluster, lit(p)))

  /** Probe-side bucket derivation + join keys: when the corpus side is
    * bucket-partitioned (a loaded index) the probe rows compute the
    * same `list_bucket` so the equi-join carries the partition column —
    * that is what lets dynamic partition pruning survive the fan-out
    * clamp. An in-memory index (no bucket column) joins on cluster
    * alone. */
  private[llm] def bucketedProbes(probes: DataFrame, corpus: DataFrame,
      listBuckets: Option[Int]): (DataFrame, Seq[String]) =
    listBuckets match {
      case Some(p) if corpus.columns.contains("list_bucket") =>
        (probes.withColumn("list_bucket", bucketCol(col("cluster"), p)),
          Seq("list_bucket", "cluster"))
      case _ => (probes, Seq("cluster"))
    }

  /** Persist the index: centroids as a k-row parquet artifact, the
    * assigned corpus partitioned BY INVERTED-LIST BUCKET
    * (`cluster mod min(k, maxListPartitions)`) — so a probe against
    * the loaded index prunes unprobed buckets at the parquet-partition
    * level (dynamic partition pruning from the broadcast probe set),
    * which is the 100 TB read story: ~nProbe/min(k, cap) of the files,
    * not a full scan. The clamp exists because k can reach 65536
    * ([[MaxK]]) and one directory per list is the small-files shape at
    * mid-scale; below the cap the bucket IS the cluster id, so nothing
    * changes for small indexes. The bucket count is persisted in
    * `$dir/meta` — probes must derive the SAME bucket or the join keys
    * never match, so the width travels with the data (the
    * [[graft.streaming.StreamOps.saveDupGateIndex]] contract). */
  def save(index: Index, dir: String,
      maxListPartitions: Int = DefaultMaxListPartitions): Unit = {
    val spark = index.indexed.sparkSession
    import spark.implicits._
    require(maxListPartitions > 0, s"maxListPartitions must be positive: $maxListPartitions")
    index.centers.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    val p = math.min(math.max(1, index.centers.length), maxListPartitions)
    index.indexed
      .withColumn("list_bucket", bucketCol(col("cluster"), p))
      .write.mode("overwrite")
      .partitionBy("list_bucket").parquet(s"$dir/indexed")
    Seq(p).toDF("list_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Reload a persisted index. The centroid artifact is k rows (bounded
    * by [[MaxK]]) — the one collect here is metadata-sized, as is the
    * 1-row bucket-count meta. The corpus side stays a lazy parquet
    * read; cache it if the session will probe repeatedly, or leave it
    * cold and let per-query partition pruning read only the probed
    * buckets. */
  def load(spark: SparkSession, dir: String): Index = {
    val centers = spark.read.parquet(s"$dir/centroids")
      .orderBy("cluster").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("centroid")).toSeq).toSeq
    require(centers.nonEmpty, s"no centroids found under $dir")
    val p = spark.read.parquet(s"$dir/meta").head().getInt(0)
    // the corpus pointer resolves through the _tier state so a load
    // after any number of [[compactIngest]] folds reads the current
    // versioned corpus; fresh saves have no _tier file → `indexed`
    val corpusDir = readTierState(spark, dir).baseDir
    Index(centers, spark.read.parquet(s"$dir/$corpusDir"), Some(p))
  }

  /** Root of the streaming-ingest tier under a persisted index: one
    * parquet directory per micro-batch (`ingest/batch=<id>/
    * list_bucket=…`), written idempotently by
    * [[graft.streaming.StreamOps.ivfIngestSink]]. */
  private[graft] def ingestRoot(dir: String): String = s"$dir/ingest"

  /** Tier state of a persisted index (base-corpus pointer + folded
    * batch set) — the shared [[graft.sources.TieredParquet]] one-file
    * transaction log, with `indexed` as this artifact's default base. */
  private[graft] def readTierState(spark: SparkSession, dir: String)
      : graft.sources.TieredParquet.TierState =
    graft.sources.TieredParquet.readState(spark, dir, "indexed")

  /** Fold the ingest tier into the base corpus — the
    * [[graft.streaming.ScoringStream.ResultStore.compact]] discipline
    * for the index: an append-only tier otherwise grows one directory
    * per micro-batch forever, and every [[loadServable]] pays listing +
    * footer costs proportional to the stream's whole history instead of
    * the corpus size. Returns true when a fold happened. Mechanics
    * (versioned base dir, atomic `_tier` commit, replay refusal,
    * single-writer contract) are [[graft.sources.TieredParquet.compact]];
    * the task-local sort by (bucket, cluster) narrows row-group stats
    * so probe-side cluster predicates prune within a bucket. The
    * compacted schema is the BASE corpus schema: extra ingest-tier
    * columns (the PQ `codes` the ADC tier carries) drop, loudly
    * recomputable — encode is a deterministic function of the frozen
    * codebooks and the embeddings survive in the corpus. At 100 TB the
    * full-corpus rewrite amortizes over the thousands of batch dirs it
    * folds; an operator wanting bounded I/O per fold instead rewrites
    * only the buckets with pending ingest rows via dynamic partition
    * overwrite, trading away the single atomic commit point. */
  def compactIngest(spark: SparkSession, dir: String): Boolean =
    graft.sources.TieredParquet.compact(spark, dir, "indexed",
      Seq("list_bucket"), Seq("list_bucket", "cluster"))

  /** The ingest tier as one union-ready frame, or None when no batch
    * has landed yet. Partition discovery runs over the `batch=*` dirs
    * with the ingest root as basePath, so `list_bucket` STAYS a
    * partition column and probe-side pruning works per batch dir; the
    * synthetic `batch` column is dropped (it exists for replay
    * idempotence, not for consumers). The listing is one metadata RPC
    * against the index root — cheap next to any read of the tier. */
  def loadIngest(spark: SparkSession, dir: String): Option[DataFrame] =
    graft.sources.TieredParquet.loadIngest(spark, dir, "indexed")

  /** Logical deletion from a persisted index — the takedown path
    * (right-to-erasure, licensing retractions) a long-lived corpus
    * index MUST have: `ids` is a one-column frame named for the
    * corpus's id column, appended as an immutable label-keyed tombstone
    * dir ([[graft.sources.TieredParquet.appendDeletes]]). Deleted
    * vectors disappear from [[loadServable]] immediately (tombstone
    * anti-join — broadcast, takedown-sized) and are physically erased
    * when [[compactIngest]] next folds the tiers; a label already
    * folded is refused, the ingest-replay discipline. The base tier
    * stays immutable throughout: readers of the old corpus version are
    * undisturbed until the fold commits. */
  def deleteIds(spark: SparkSession, dir: String, ids: DataFrame, label: String): Unit = {
    val corpus = spark.read.parquet(s"$dir/${readTierState(spark, dir).baseDir}")
    require(ids.columns.length == 1 && corpus.columns.contains(ids.columns.head),
      s"tombstone frame must carry exactly the corpus id column; got " +
        s"(${ids.columns.mkString(", ")}) vs corpus (${corpus.columns.mkString(", ")})")
    graft.sources.TieredParquet.appendDeletes(spark, dir, ids, label)
  }

  /** Reload a persisted index INCLUDING everything the ingest stream
    * appended since [[save]] and EXCLUDING every tombstoned id — the
    * query-service view: centers from the artifact, corpus = (base ∪
    * ingest tier) ⟕̸ deletes (projected to the base schema, so PQ codes
    * carried for the ADC tier don't widen the IVF view). Both sides
    * keep `list_bucket` as a partition column, so a probe's equi-join
    * prunes base AND ingest scans alike; the tombstone anti-join is a
    * broadcast against a takedown-sized id set and does not disturb
    * that pruning. The ingest tier never needs compaction for
    * correctness (each batch dir is immutable once its replay window
    * passes), but a long-lived index wants the
    * [[graft.streaming.ScoringStream.ResultStore]]-style fold once
    * batch-dir listings dominate — same trade, same fix, and the fold
    * turns logical deletes physical. */
  def loadServable(spark: SparkSession, dir: String): Index = {
    val base = load(spark, dir)
    val unioned = loadIngest(spark, dir) match {
      case Some(ing) =>
        val cols = base.indexed.columns.toIndexedSeq.map(col)
        base.indexed.unionByName(ing.select(cols: _*))
      case None => base.indexed
    }
    val live = graft.sources.TieredParquet.loadDeletes(spark, dir) match {
      case Some(dels) => graft.sources.TieredParquet.antiJoinDeletes(unioned, dels)
      case None => unioned
    }
    Index(base.centers, live, base.listBuckets)
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
    * the index assigned lists with (ranking by a different metric
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
    val centroids = index.centers.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("cluster", "centroid")
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
    // rank centroids per query; keep the nProbe nearest lists
    val wC = Window.partitionBy(col("q_id")).orderBy(col("c_dist"), col("cluster"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("c_dist",
        call_function("sq_dist", col("q_emb"), col("centroid")))
      .withColumn("c_rank", row_number().over(wC))
      .filter(col("c_rank") <= nProbe)
      .select(col("q_id"), col("q_emb"), col("cluster"))
    val (keyedProbes, joinKeys) =
      bucketedProbes(probes, index.indexed, index.listBuckets)
    val probeSide =
      if (numQueries.getOrElse(queries.count()) <= maxBroadcastQueries)
        broadcast(keyedProbes) else keyedProbes
    val wS = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col(idCol))
    index.indexed.join(probeSide, joinKeys)
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("cos_sim", round(cosine(col(embCol), col("q_emb")), 4))
      .withColumn("rnk", row_number().over(wS))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col(idCol).as("neighbor_id"), col("cos_sim"))
  }
}

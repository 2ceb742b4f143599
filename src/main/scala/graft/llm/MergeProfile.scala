package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable corpus profile — the per-shard QC artifact a 100 TB build
  * persists NEXT TO each output shard so corpus-level quality
  * monitoring is a profile MERGE, never a re-scan. Every statistic is
  * algebraic (count / sum / min / max / sum-of-squares), so shard
  * profiles combine associatively — and in any grouping — into the
  * exact global answer; mean and population variance close from the
  * merged integer sums at read time.
  *
  * Distinct counts are NOT algebraic in general: the same text in two
  * shards would be counted twice by an additive merge. They merge here
  * ONLY because sharding keys on the content hash itself
  * (`pmod(h, shards)`) — identical texts always land in the same
  * shard, so per-shard distinct sets are disjoint by construction and
  * their counts ADD. Partitioning the dedup-KEY space (not the row
  * space) is the contract that makes exact distinct mergeable at
  * scale; a row-space shard (e.g. by doc_id) must fall back to a
  * mergeable sketch (HLL) instead.
  *
  * Variance is closed as (n·Σx² − (Σx)²)/n² — exact long arithmetic
  * until one final division, so engines that agree on the sums agree
  * on the variance bit-for-bit (after the shared 4dp floor). At corpus
  * scale the long products stay exact while n·Σx² < 2⁶³ (≈9·10¹⁸ —
  * ~10¹² docs at 10³ tokens each); past that the sums ride DECIMAL.
  */
object MergeProfile {
  /** Floor-form half-up 4dp round (shared rounding discipline). */
  private def fpRound4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0

  /** Stage 1: per-(source, shard) algebraic profile over a frame with
    * `source` (string), `n_tokens` (long), `h` (long content hash).
    * This is the artifact a build would persist per output shard. */
  def shardProfiles(docs: DataFrame, shards: Long): DataFrame =
    docs.groupBy(col("source"), pmod(col("h"), lit(shards)).as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_distinct"),
        sum(col("n_tokens")).as("s1"),
        sum(col("n_tokens") * col("n_tokens")).as("s2"),
        min(col("n_tokens")).as("mn"),
        max(col("n_tokens")).as("mx"))

  /** Stage 2: merge shard profiles to the source grain and close the
    * derived statistics. Counts and sums add, min/max fold, distincts
    * add (disjoint by the hash-shard contract). */
  def merge(profiles: DataFrame): DataFrame =
    profiles.groupBy(col("source"))
      .agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_distinct")).as("n_distinct"),
        sum(col("s1")).as("s1"),
        sum(col("s2")).as("s2"),
        min(col("mn")).as("min_tokens"),
        max(col("mx")).as("max_tokens"))
      .select(col("source"), col("n_docs"), col("n_distinct"),
        col("min_tokens"), col("max_tokens"),
        fpRound4(col("s1").cast("double") / col("n_docs")).as("mean_tokens"),
        fpRound4((col("n_docs") * col("s2") - col("s1") * col("s1")).cast("double")
          / (col("n_docs") * col("n_docs"))).as("var_tokens"))

  /** Two-level profile: shard then merge. Equal to the direct
    * single-pass profile for ANY shard count — the property
    * MergeProfileSpec pins and the q146 oracle hash-verifies. */
  def profile(docs: DataFrame, shards: Long): DataFrame =
    merge(shardProfiles(docs, shards))

  // ------------------------------------------- persisted ingest artifact

  /** The persisted profile keeps the CONTENT-HASH grain, not the shard
    * grain: across micro-batches the same text can arrive again, so
    * additive per-batch distinct counts would double-count it — the
    * cross-batch failure mode of the in-plan shard profile, where
    * disjointness holds only WITHIN one pass. A (source, shard, h) row
    * per distinct arriving text (8-byte hash — hashes travel, never
    * text, the q145 discipline) keeps every statistic exactly
    * mergeable over any number of batches: counts and sums add at any
    * grain, and distinct closes at read as count(DISTINCT h) within
    * (source, shard) — still shard-parallel, still exact. Artifact
    * size is O(distinct texts per batch), 3–4 orders below the corpus;
    * at 10⁹ docs the hash rows are tens of GB against 100 TB of text. */
  def hashGrainProfile(docs: DataFrame, shards: Long): DataFrame =
    docs.groupBy(col("source"), pmod(col("h"), lit(shards)).as("shard"), col("h"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("s1"),
        sum(col("n_tokens") * col("n_tokens")).as("s2"),
        min(col("n_tokens")).as("mn"),
        max(col("n_tokens")).as("mx"))

  /** Append one micro-batch's hash-grain profile under
    * `dir/batch=<id>`. Idempotent under replay: the profile is a
    * deterministic function of the batch, so an overwrite of the same
    * dir converges; an empty batch writes NOTHING (zero-row parquet
    * dirs poison later schema inference) and clears any partial dir a
    * crashed attempt left. The shard count is pinned in `dir/_meta` on
    * first use and validated after — batches sharded under different
    * moduli would break per-(source, shard) hash disjointness, turning
    * the read-side distinct into a double count. Expects (`source`,
    * `n_tokens`, `h`) rows (see [[hashGrainProfile]]). */
  def appendBatch(batch: DataFrame, batchId: Long, dir: String, shards: Long): Unit = {
    val spark = batch.sparkSession
    // Hadoop FS, not java.nio: the artifact lives next to the corpus
    // (HDFS/S3 in production), and the TieredParquet FS discipline
    // keeps every artifact reachable through the same configuration
    val metaPath = new org.apache.hadoop.fs.Path(s"$dir/_meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(metaPath)) {
      val pinned = spark.read.parquet(s"$dir/_meta").head().getLong(0)
      require(pinned == shards,
        s"profile artifact at $dir is sharded mod $pinned; refusing to append mod $shards")
    } else {
      import spark.implicits._
      Seq(shards).toDF("shards").coalesce(1).write.mode("overwrite").parquet(s"$dir/_meta")
    }
    val rows = hashGrainProfile(batch, shards)
    val batchDir = new org.apache.hadoop.fs.Path(s"$dir/batch=$batchId")
    if (rows.isEmpty) {
      fs.delete(batchDir, true)
      return
    }
    rows.coalesce(1).write.mode("overwrite").parquet(batchDir.toString)
  }

  /** Merge every appended batch into the current corpus profile — one
    * aggregation over the tiny hash-grain rows, never a re-scan of
    * ingested text. Distinct is exact across batches because it closes
    * HERE, over the union of hash rows, not by adding per-batch
    * counts. */
  def loadProfile(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    // one read over the artifact root: Spark's partition discovery
    // enumerates the batch=<id> dirs (the id becomes a pruned-away
    // partition column) and skips `_meta` — underscore-prefixed paths
    // are hidden by the FileIndex — so this works unchanged on any
    // Hadoop-visible filesystem, no client-side listing
    val rows = spark.read.parquet(dir).drop("batch")
    merge(rows.groupBy(col("source"), col("shard"))
      .agg(
        sum(col("n_docs")).as("n_docs"),
        countDistinct(col("h")).as("n_distinct"),
        sum(col("s1")).as("s1"),
        sum(col("s2")).as("s2"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx")))
  }
}

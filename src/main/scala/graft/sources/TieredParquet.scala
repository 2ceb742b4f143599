package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Base-plus-ingest tiering for persisted parquet artifacts, shared by
  * the IVF corpus ([[graft.llm.IvfSearch]]) and the streaming dup-gate
  * index ([[graft.streaming.StreamOps]]).
  *
  * Layout under an artifact root `dir`:
  *   - `$dir/<base>` — the base tier, one partitioned parquet table
  *     (`<base>` starts as the artifact's default name and advances to
  *     `<base>_v2`, `_v3`, … on each compaction — never rewritten in
  *     place, so readers of the old tier are undisturbed);
  *   - `$dir/ingest/batch=<id>/…` — one immutable directory per
  *     streaming micro-batch, written idempotently (mode-overwrite
  *     keyed by batch id) by the artifact's ingest sink;
  *   - `$dir/_tier` — ONE small text file recording the current base
  *     directory and the set of folded batch dirs, committed by atomic
  *     rename. A one-file transaction log: the base pointer and the
  *     folded set change together or not at all, so a reader that
  *     resolves through it can never observe a half-applied
  *     compaction. A missing file IS the initial state (default base,
  *     nothing folded) — artifacts written before this mechanism
  *     existed stay loadable.
  *
  * [[compact]] is the ResultStore.compact discipline for append-only
  * tiers: an ingest tier otherwise grows one directory per micro-batch
  * forever, and every load pays listing + footer costs proportional to
  * the stream's whole history instead of the artifact's size. It is a
  * single-writer maintenance op (quiesce the ingest stream while it
  * runs); crash anywhere leaves either the old state fully intact or
  * the new state fully committed plus harmless garbage a rerun
  * removes — never duplicates, never missing rows.
  */
object TieredParquet {

  /** `baseDir` = current base tier directory name under the artifact
    * root; `folded` = ingest batch dir names already folded into it;
    * `removed` = tombstone dir names whose deletions are already baked
    * into the base (so a replayed delete cannot re-land after fold). */
  final case class TierState(baseDir: String, folded: Set[String],
      removed: Set[String] = Set.empty)

  def ingestRoot(dir: String): String = s"$dir/ingest"
  def deletesRoot(dir: String): String = s"$dir/deletes"

  private def tierPath(dir: String) = new Path(s"$dir/_tier")

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def readState(spark: SparkSession, dir: String, defaultBase: String): TierState = {
    val p = tierPath(dir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) TierState(defaultBase, Set.empty)
    else {
      val in = fs.open(p)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
        finally in.close()
      val base = lines.collectFirst { case s if s.startsWith("corpus ") => s.drop(7) }
        .getOrElse(defaultBase)
      TierState(base,
        lines.collect { case s if s.startsWith("folded ") => s.drop(7) }.toSet,
        lines.collect { case s if s.startsWith("removed ") => s.drop(8) }.toSet)
    }
  }

  /** The atomic commit: write the whole state to a temp file, then
    * rename over the live one. Rename is atomic on HDFS/posix (an
    * object store needs its conditional-put equivalent); the
    * delete-then-rename window leaves NO `_tier` file, which readers
    * resolve as the initial state — safe while the default base still
    * exists (always true until the first compaction's cleanup), and a
    * loud missing-directory failure afterwards, never silent wrong
    * data. */
  def writeState(spark: SparkSession, dir: String, st: TierState): Unit = {
    val dst = tierPath(dir)
    val tmp = new Path(s"$dir/_tier.tmp")
    val fs = fsOf(spark, dst)
    val out = fs.create(tmp, true)
    try out.write(
      ((s"corpus ${st.baseDir}" +: st.folded.toSeq.sorted.map("folded " + _)) ++
        st.removed.toSeq.sorted.map("removed " + _))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(s"could not commit tier state at $dst")
  }

  private[graft] def nextBaseDir(current: String, defaultBase: String): String =
    if (current == defaultBase) s"${defaultBase}_v2"
    else if (current.startsWith(defaultBase + "_v"))
      s"${defaultBase}_v${current.drop(defaultBase.length + 2).toInt + 1}"
    else throw new IllegalStateException(s"unrecognized base dir: $current")

  /** Ingest batch dirs not yet folded into the base tier. */
  private def pendingBatches(spark: SparkSession, dir: String,
      folded: Set[String], exclude: Set[String]): Seq[Path] = {
    val root = new Path(ingestRoot(dir))
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch=")
        && !folded(s.getPath.getName) && !exclude(s.getPath.getName))
      .map(_.getPath)
  }

  /** The live ingest tier as one union-ready frame, or None when no
    * unfolded batch exists. Partition discovery runs with the ingest
    * root as basePath, so partition columns inside each batch dir STAY
    * partition columns; the synthetic `batch` column is dropped (it
    * exists for replay idempotence, not for consumers). `exclude`
    * lets a per-batch writer leave out its OWN directory — a replayed
    * batch must not read the crashed attempt's output as index state. */
  def loadIngest(spark: SparkSession, dir: String, defaultBase: String,
      exclude: Set[String] = Set.empty): Option[DataFrame] = {
    val folded = readState(spark, dir, defaultBase).folded
    val batches = pendingBatches(spark, dir, folded, exclude)
    if (batches.isEmpty) None
    else Some(spark.read.option("basePath", ingestRoot(dir))
      .parquet(batches.map(_.toString): _*)
      .drop("batch"))
  }

  /** Idempotent tombstone append — the takedown/right-to-erasure path
    * every long-lived training-data artifact needs: `ids` is a ONE-
    * column frame of keys to remove, written as an immutable
    * `deletes/del=<label>` dir (label-keyed overwrite, so a retried
    * delete converges). Deletions are LOGICAL until [[compact]] folds
    * them: every delete-aware read ([[loadTiered]] with the tombstone
    * flag, [[graft.llm.IvfSearch.loadServable]]) anti-joins the live
    * tombstones, so a deleted row disappears from serving immediately
    * while the base tier stays immutable. A label already folded into
    * the base ([[TierState.removed]]) is refused — re-landing it would
    * tombstone FOREVER (its dir would never fold again) and mask the
    * replay bug that produced it. */
  def appendDeletes(spark: SparkSession, dir: String, ids: DataFrame,
      label: String): Unit = {
    require(ids.columns.length == 1,
      s"tombstone frame must have exactly the key column, got ${ids.columns.mkString(", ")}")
    val st = readState(spark, dir, "") // default base irrelevant for the removed set
    require(!st.removed(s"del=$label"),
      s"delete batch 'del=$label' was already folded into the base — refusing replay")
    ids.distinct().write.mode("overwrite").parquet(s"${deletesRoot(dir)}/del=$label")
  }

  /** Live (unfolded) tombstones as one distinct one-column frame, or
    * None when nothing is pending. */
  def loadDeletes(spark: SparkSession, dir: String): Option[DataFrame] = {
    val root = new Path(deletesRoot(dir))
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return None
    val removed = readState(spark, dir, "").removed
    val dirs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("del=")
        && !removed(s.getPath.getName))
      .map(_.getPath.toString)
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*).distinct())
  }

  /** Base ∪ live ingest, projected to the BASE schema (extra
    * ingest-tier columns drop loudly-recomputably; a missing base
    * column fails the select, never silently nulls). With
    * `applyDeletes`, live tombstones anti-join out — the key is the
    * tombstone frame's own single column, which must exist in the base
    * schema. */
  def loadTiered(spark: SparkSession, dir: String, defaultBase: String,
      exclude: Set[String] = Set.empty, applyDeletes: Boolean = false): DataFrame = {
    val base = spark.read.parquet(s"$dir/${readState(spark, dir, defaultBase).baseDir}")
    val unioned = loadIngest(spark, dir, defaultBase, exclude) match {
      case Some(ing) =>
        base.unionByName(ing.select(base.columns.toIndexedSeq.map(col): _*))
      case None => base
    }
    if (!applyDeletes) unioned
    else loadDeletes(spark, dir) match {
      case Some(dels) => antiJoinDeletes(unioned, dels)
      case None => unioned
    }
  }

  /** Anti-join a tombstone frame out of a tier view on the tombstone's
    * own key column. Broadcast hint: a tombstone set is takedown-sized
    * (ids, not rows) — shuffling a 100 TB corpus against it would
    * invert the cost. */
  private[graft] def antiJoinDeletes(tier: DataFrame, dels: DataFrame): DataFrame = {
    val key = dels.columns.head
    require(tier.columns.contains(key),
      s"tombstone key '$key' is not a column of the tier (${tier.columns.mkString(", ")})")
    tier.join(org.apache.spark.sql.functions.broadcast(dels), Seq(key), "left_anti")
  }

  /** Fold every unfolded ingest batch into a NEW versioned base dir.
    * Returns true when a fold happened. The write carries no
    * repartition — base tasks already align with partition dirs, so
    * the union writes ≈ one file per input file without shuffling the
    * whole tier; `sortBy` is task-local and narrows row-group stats
    * (e.g. cluster id within a bucket) for scan-side pruning. The
    * commit point is ONE atomic `_tier` rename carrying both the new
    * base pointer and the folded-batch set; cleanup (old base + folded
    * batch dirs) runs AFTER it, so failures there leave garbage
    * directories, never wrong answers. Replays of a folded micro-batch
    * are refused by the `_tier` record (each ingest sink checks it —
    * the ResultStore `_stamps` discipline). */
  def compact(spark: SparkSession, dir: String, defaultBase: String,
      partitionCols: Seq[String], sortBy: Seq[String]): Boolean = {
    val st = readState(spark, dir, defaultBase)
    val pending = pendingBatches(spark, dir, st.folded, Set.empty)
    // live tombstones fold too: the new base is written WITHOUT the
    // deleted rows (the physical erasure the logical delete promised),
    // and their dirs join the `removed` record in the same atomic
    // commit, so a crash never double-applies or resurrects them. The
    // dir list is captured ONCE, here — a tombstone landing mid-compact
    // must stay live for the next fold, not get recorded as folded
    // without having been applied.
    val fs = fsOf(spark, new Path(dir))
    val delRoot = new Path(deletesRoot(dir))
    val delDirs: Seq[Path] =
      if (!fs.exists(delRoot)) Seq.empty
      else fs.listStatus(delRoot).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("del=")
          && !st.removed(s.getPath.getName)).map(_.getPath)
    if (pending.isEmpty && delDirs.isEmpty) return false
    val basePath = s"$dir/${st.baseDir}"
    val base = spark.read.parquet(basePath)
    val unioned =
      if (pending.isEmpty) base
      else base.unionByName(
        spark.read.option("basePath", ingestRoot(dir))
          .parquet(pending.map(_.toString): _*)
          .drop("batch").select(base.columns.toIndexedSeq.map(col): _*))
    val live =
      if (delDirs.isEmpty) unioned
      else antiJoinDeletes(unioned,
        spark.read.parquet(delDirs.map(_.toString): _*).distinct())
    val next = nextBaseDir(st.baseDir, defaultBase)
    live.sortWithinPartitions(sortBy.map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(s"$dir/$next")
    writeState(spark, dir, TierState(next,
      st.folded ++ pending.map(_.getName),
      st.removed ++ delDirs.map(_.getName)))
    pending.foreach(p => fs.delete(p, true))
    delDirs.foreach(p => fs.delete(p, true))
    fs.delete(new Path(basePath), true)
    true
  }
}

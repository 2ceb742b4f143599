package graft

import graft.streaming.ScoringStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming latency micro-bench: MemoryStream → validate/score/attribute
  * → idempotent store, timed per micro-batch. The reference's only
  * published latency SLO is serving P95 < 500 ms
  * (reference monitoring/prometheus/rules/fraud-detection-alerts.yml:4-8,
  * BASELINE.md row 1); the batch bench can't see it, so this measures the
  * engine-side end-to-end path — ingest, arity validation, linear score +
  * SHAP attribution, keyed upsert — at micro-batch granularity.
  *
  * Three configs, because the single-config number hid the two ways the
  * path degrades at scale:
  *  - `baseline`: 100 rows/batch, fresh store — the r4/r5 number;
  *  - `rows1k` / `rows10k`: 10× and 100× the batch rate —
  *    row-proportional work (score + attribution are scan-shaped)
  *    should move P95 far less than the rate, and two decades locate
  *    where the write path stops being batch-size-flat;
  *  - `aged`: a store carrying 50 batches of history with the
  *    auto-compaction knob on ([[ScoringStream.attach]] compactEvery).
  *    Measured result worth recording: the WRITE path is
  *    history-independent (P95 ≈245 ms at 50-batch history with
  *    compaction OFF — see the `STREAMBENCH_AGED_NOCOMPACT` control in
  *    [[main]] — the upsert writes one new dir and never lists the
  *    others), so this config's job is to pin that in-loop compaction
  *    itself stays inside the SLO; the listing cost history DOES grow
  *    is the READ side (snapshot/point lookups), which compaction plus
  *    the key-sorted snapshot bound.
  *
  * Methodology mirrors the batch bench: untimed warm-up batches (stream
  * start + codegen dominate the first trigger), then timed batches, P50 /
  * P95 / max by nearest-rank. Returns a JSON object string embedded in
  * the bench sidecar under "streaming".
  */
object StreamBench {

  /** Standalone entry for iterating on the streaming path alone (the
    * per-round number comes from [[Bench]], which embeds [[run]]'s JSON
    * in its sidecar). */
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // see Bench: RawLocalFileSystem skips .crc sidecar writes on the
      // latency path (store dirs + checkpoint logs are all file://)
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      // see Bench: AQE re-planning inside cache materialization
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"STREAMBENCH ${run(spark)}")
    // the control the `aged` config's compact_every defends against:
    // same 50-batch history, compaction off — the listing-cost drift
    println(s"STREAMBENCH_AGED_NOCOMPACT ${runConfig(spark, historyBatches = 50).json}")
    spark.stop()
  }

  /** All four configs as one JSON object (the bench sidecar entry).
    * Each config starts from a force-collected heap: the SLO measures
    * the scoring path, not whichever earlier section's garbage happens
    * to come due mid-batch (round 10's official run breached rows1k at
    * 1372 ms P95 while baseline before it and rows10k after were both
    * <400 ms — the signature of a collection wave, not of the path;
    * per-config gc_ms in the record now makes that distinction data). */
  /** Per-config result as DATA, not just serialized JSON: the official
    * bench artifact's compact line must carry each config's P95 (the
    * SLO evidence), gc_ms, and the trigger-order lat_ms array — and a
    * regex scrape of the serialized record silently yields an empty map
    * on any format change, on the very line meant to carry the SLO
    * verdict. Callers read fields; `json` is the embedded full record. */
  final case class ConfigStats(json: String, p95Ms: Double, gcMs: Long,
      latMs: Seq[Double], stealMs: Long, safepointMs: Long,
      stealMsTrig: Seq[Long], safepointMsTrig: Seq[Long])

  def run(spark: SparkSession): String = runStructured(spark)._1

  /** (full streaming JSON, per-config structured stats in run order). */
  def runStructured(spark: SparkSession): (String, Seq[(String, ConfigStats)]) = {
    System.gc()
    val baseline = runConfig(spark)
    System.gc()
    val rows1k = runConfig(spark, rowsPerBatch = 1000)
    // the second decade of the batch-rate sweep: rows1k cost only
    // ~+19 ms P95 over baseline in r6/r7, so one more 10× tells whether
    // the write path stays batch-size-flat or where it starts bending
    // (score + attribution are scan-shaped; the keyed upsert writes one
    // dir per batch regardless of rows, so flat is the design claim)
    System.gc()
    val rows10k = runConfig(spark, rowsPerBatch = 10000)
    System.gc()
    val aged = runConfig(spark, historyBatches = 50, compactEvery = 25)
    // the TREE kernel at the rows1k rate: the reference trains XGBoost
    // (train_model.py:69-80) and promotion can now serve it — the SLO
    // must hold for the family actually trained, not just the linear
    // explainer's. 100 trees × depth 5 (the reference's config) built
    // deterministically; per row the kernel walks ≤ 500 compares.
    System.gc()
    val gbt1k = runConfig(spark, rowsPerBatch = 1000, useGbt = true)
    val configs = Seq("baseline" -> baseline, "rows1k" -> rows1k,
      "rows10k" -> rows10k, "aged" -> aged, "gbt1k" -> gbt1k)
    (configs.map { case (n, c) => s""""$n":${c.json}""" }
      .mkString("{", ",", "}"), configs)
  }

  /** Deterministic reference-shaped ensemble (100 complete trees of
    * depth 5) — the bench needs the KERNEL's cost, not a fit. */
  private def syntheticTrees(nFeat: Int): graft.xai.GbtAttr.FlatTrees = {
    val nTrees = 100; val depth = 5
    val feat = scala.collection.mutable.ArrayBuffer.empty[Int]
    val thresh = scala.collection.mutable.ArrayBuffer.empty[Double]
    val left = scala.collection.mutable.ArrayBuffer.empty[Int]
    val right = scala.collection.mutable.ArrayBuffer.empty[Int]
    val pred = scala.collection.mutable.ArrayBuffer.empty[Double]
    def add(t: Int, d: Int, salt: Int): Int = {
      val id = feat.length
      if (d == depth) {
        feat += -1; thresh += 0.0; left += -1; right += -1
        pred += ((t * 31 + salt * 7) % 21 - 10) / 100.0
        id
      } else {
        feat += (t * 31 + salt * 13 + d) % nFeat
        thresh += ((t * 7 + salt * 13 + d * 29) % 97) / 97.0
        left += -1; right += -1; pred += ((t + salt) % 13 - 6) / 100.0
        val l = add(t, d + 1, salt * 2 + 1)
        val r = add(t, d + 1, salt * 2 + 2)
        left(id) = l; right(id) = r
        id
      }
    }
    val roots = (0 until nTrees).map(t => add(t, 0, 0)).toArray
    graft.xai.GbtAttr.FlatTrees(roots, feat.toArray, thresh.toArray,
      left.toArray, right.toArray, pred.toArray, Array.fill(nTrees)(0.1))
  }

  def runConfig(spark: SparkSession, warmBatches: Int = 3, timedBatches: Int = 20,
      rowsPerBatch: Int = 100, historyBatches: Int = 0, compactEvery: Int = 0,
      useGbt: Boolean = false): ConfigStats = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = java.nio.file.Files.createTempDirectory("graft-streambench").toString
    val featureNames = (0 until 8).map(i => s"f$i")
    val coefs = featureNames.indices.map(i => 0.25 * (i % 3) - 0.1)
    val mu = Seq.fill(featureNames.size)(0.0)

    val input = MemoryStream[(String, Map[String, Double])]
    val stream = input.toDF().toDF("transaction_id", "features")
    val store = new ScoringStream.ResultStore(s"$dir/store")
    val q =
      if (useGbt) ScoringStream.attachGbt(stream, store, s"$dir/ckpt",
        featureNames, syntheticTrees(featureNames.size), compactEvery = compactEvery)
      else ScoringStream.attach(stream, store, s"$dir/ckpt",
        featureNames, coefs, mu, intercept = 0.05, compactEvery = compactEvery)

    def oneBatch(b: Int): Double = {
      val rows = (0 until rowsPerBatch).map { i =>
        (s"t${b}_$i", featureNames.map(f => f -> ((i * 31 + b) % 97) / 97.0).toMap)
      }
      input.addData(rows)
      val t0 = System.nanoTime()
      q.processAllAvailable()
      (System.nanoTime() - t0) / 1e6
    }

    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    var gcDelta = 0L
    var stealDelta = -1L
    var safeDelta = -1L
    // per-TRIGGER pause attribution (r14 verdict #2: the official
    // artifact's rows1k P95 read 1011 ms against a 60 ms CONFIG-window
    // steal stamp — a burst inside one trigger averages away at config
    // granularity, so the breach was adjudicable by neither the steal
    // rule nor gc_ms). Each timed trigger records its own steal delta
    // (kernel hypervisor-steal, summed over vCPUs — a 10% burst on 32
    // vCPUs stamps ~960 ms into a 300 ms trigger) and its own
    // safepoint delta (ALL stop-the-world pauses, not just GC), so an
    // excursion carries its adjudication in the same array index as
    // its latency.
    val stealTrig = scala.collection.mutable.ArrayBuffer.empty[Long]
    val safeTrig = scala.collection.mutable.ArrayBuffer.empty[Long]
    val lat =
      try {
        // history first (untimed): ages the store so the timed batches
        // pay the real listing cost of an accumulated directory tree
        (0 until historyBatches).foreach(oneBatch)
        (historyBatches until historyBatches + warmBatches).foreach(oneBatch)
        val start = historyBatches + warmBatches
        val g0 = gcMs()
        val s0 = graft.HostStat.stealMs()
        val f0 = graft.HostStat.safepointMs()
        val timed = (start until start + timedBatches).map { b =>
          val st0 = graft.HostStat.stealMs()
          val sf0 = graft.HostStat.safepointMs()
          val l = oneBatch(b)
          stealTrig += graft.HostStat.delta(st0, graft.HostStat.stealMs())
          safeTrig += graft.HostStat.delta(sf0, graft.HostStat.safepointMs())
          l
        }
        gcDelta = gcMs() - g0
        stealDelta = graft.HostStat.delta(s0, graft.HostStat.stealMs())
        safeDelta = graft.HostStat.delta(f0, graft.HostStat.safepointMs())
        timed
      } finally {
        q.stop()
        Fs.deleteRecursively(java.nio.file.Paths.get(dir))
      }

    val sorted = lat.sorted
    def pct(p: Double): Double =
      sorted(math.min(sorted.size - 1, math.max(0, math.ceil(p * sorted.size).toInt - 1)))
    // tenth-of-ms rounding via Double.toString: locale-independent, unlike
    // the f"" interpolator (comma-decimal locales would break the JSON)
    def ms(v: Double): String = (math.round(v * 10.0) / 10.0).toString
    // lat_ms keeps every timed batch in trigger order: a single 1.5 s
    // stall (a collection pause, an FS hiccup) is then distinguishable
    // from a level shift — p50/p95/max alone can't tell those apart
    val latJson = lat.map(ms).mkString("[", ",", "]")
    val stealTrigJson = stealTrig.mkString("[", ",", "]")
    val safeTrigJson = safeTrig.mkString("[", ",", "]")
    ConfigStats(
      s"""{"n_batches":$timedBatches,"rows_per_batch":$rowsPerBatch,"history_batches":$historyBatches,"compact_every":$compactEvery,"p50_ms":${ms(pct(0.50))},"p95_ms":${ms(pct(0.95))},"max_ms":${ms(sorted.last)},"gc_ms":$gcDelta,"steal_ms":$stealDelta,"safepoint_ms":$safeDelta,"lat_ms":$latJson,"steal_ms_trig":$stealTrigJson,"safepoint_ms_trig":$safeTrigJson,"slo_ms":500}""",
      p95Ms = math.round(pct(0.95) * 10.0) / 10.0,
      gcMs = gcDelta,
      latMs = lat.map(v => math.round(v * 10.0) / 10.0),
      stealMs = stealDelta,
      safepointMs = safeDelta,
      stealMsTrig = stealTrig.toSeq,
      safepointMsTrig = safeTrig.toSeq)
  }
}

package graft.ml

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SMOTE oversampling (reference: preprocess.py:43-44, train_model.py:60-67,
  * 91-93 — imblearn SMOTE, sampling_strategy='minority', k=5, seeded).
  *
  * Semantics: for the minority class, emit synthetic rows
  * `x + u · (nn − x)` where `nn` is one of the k nearest minority
  * neighbors (Euclidean) and `u ~ U(0,1)`, until the minority count
  * equals the majority count. Output schema = featureCols (double)
  * :+ labelCol — original rows (both classes) plus synthetic minority
  * rows.
  *
  * Scale design (SURVEY §7.4-1): SMOTE's working set is the MINORITY
  * class only (~1% of a fraud table). That matrix is collected once
  * (guarded by `maxMinorityCells` — a clear error beats a silent driver
  * OOM), deterministically sorted, and broadcast; synthesis is then
  * driven by `spark.range(minorityCount)` so the kNN + interpolation
  * work spreads evenly over all partitions — no global window, no
  * single-task sort, no O(n²) shuffle join. Determinism under
  * repartitioning: all randomness derives from
  * `splitmix64(rowIndex, replicaIndex, seed)`, never from
  * partition-order `rand()`; row indices come from the driver-side sort,
  * so the output is identical however the input was partitioned.
  * For a minority class too large to broadcast, use [[SmoteLsh]] —
  * the LSH-bucketed variant that finds neighbors inside hyperplane
  * buckets with no driver collect.
  */
class Smote(
    val featureCols: Seq[String],
    val labelCol: String,
    val k: Int = 5,
    val seed: Long = 42L,
    val maxMinorityCells: Long = 200L * 1000 * 1000) extends Serializable {

  /** Deterministic 64-bit mix (public-domain splitmix64 finalizer). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def uniform(rowIdx: Long, replica: Int, salt: Long): Double = {
    val h = mix(mix(rowIdx * 31L + salt) ^ (replica.toLong * 0x9e3779b9L) ^ seed)
    (h >>> 11).toDouble / (1L << 53).toDouble // 53-bit mantissa → [0,1)
  }

  def transform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // Features uniformly double on EVERY path so output schema does not
    // depend on the data (advice r1): cast once, up front.
    val base = df.select(
      (featureCols.map(c => col(c).cast("double").as(c)) :+ col(labelCol)): _*)

    val counts = base.groupBy(col(labelCol)).count().collect()
      .map(r => (r.get(0), r.getLong(1)))
    require(counts.length == 2, s"SMOTE expects binary labels, got ${counts.length}")
    val Array((minLabel, minCount), (_, majCount)) = counts.sortBy(_._2)
    val needed = majCount - minCount
    if (needed <= 0) return base
    require(minCount > 1,
      s"SMOTE needs >=2 minority rows to interpolate between, got $minCount")
    require(minCount * featureCols.length <= maxMinorityCells,
      s"minority matrix ${minCount}x${featureCols.length} exceeds broadcast guard " +
        s"($maxMinorityCells cells); use SmoteLsh (bucketed, no collect) at this scale")

    // Deterministic minority matrix: collect, then sort by feature tuple
    // on the driver (exact-duplicate rows may swap indices — they are
    // interchangeable, so the output multiset is still deterministic).
    val minRows: Array[Array[Double]] = base
      .filter(col(labelCol) === lit(minLabel))
      .select(featureCols.map(col): _*)
      .collect()
      .map(r => Array.tabulate(featureCols.length)(i => r.getDouble(i)))
      .sortBy(_.toIndexedSeq)(Ordering.Implicits.seqOrdering[IndexedSeq, Double])
    val bc: Broadcast[Array[Array[Double]]] = spark.sparkContext.broadcast(minRows)

    val nFeat = featureCols.length
    val kk = k
    val needPerRow = needed / minCount
    val remainder = (needed % minCount).toInt

    // Synthesis fan-out: one task slice per range partition; each row of
    // spark.range(minCount) owns the replicas of minority row `idx`.
    val parallelism = spark.sparkContext.defaultParallelism
    val syntheticRdd = spark.range(0, minCount, 1, parallelism).rdd.flatMap { idLong =>
      val idx = idLong.toInt
      val all = bc.value
      val x = all(idx)
      val replicas = (needPerRow + (if (idx < remainder) 1 else 0)).toInt
      if (replicas == 0) Iterator.empty
      else {
        // k nearest minority neighbors of x, excluding itself.
        val neigh = all.indices.iterator.filter(_ != idx).map { j =>
          var d = 0.0; var f = 0
          val y = all(j)
          while (f < nFeat) { val t = x(f) - y(f); d += t * t; f += 1 }
          (j, d)
        }.toArray.sortBy { case (j, d) => (d, j) }.take(math.min(kk, all.length - 1))
        Iterator.tabulate(replicas) { rep =>
          val pick = neigh((uniform(idx, rep, 1L) * neigh.length).toInt.min(neigh.length - 1))._1
          val u = uniform(idx, rep, 2L)
          val y = all(pick)
          Row.fromSeq(Array.tabulate(nFeat)(f => x(f) + u * (y(f) - x(f))).toSeq :+ minLabel)
        }
      }
    }

    val schema = StructType(
      featureCols.map(c => StructField(c, DoubleType)) :+
        base.schema(labelCol).copy(name = labelCol))
    base.unionByName(spark.createDataFrame(syntheticRdd, schema))
  }
}

package graft.ml

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SMOTE oversampling (reference: preprocess.py:43-44, train_model.py:60-67,
  * 91-93 — imblearn SMOTE, sampling_strategy='minority', k=5, seeded).
  *
  * Semantics: for the minority class, emit synthetic rows
  * `x + u · (nn − x)` where `nn` is one of the k nearest minority
  * neighbors (Euclidean) and `u ~ U(0,1)`, until the minority count
  * equals the majority count. Output schema = featureCols :+ labelCol,
  * original rows (both classes) plus synthetic minority rows.
  *
  * Scale design (SURVEY §7.4-1): the minority class is assumed small
  * relative to the cluster (~1% of a fraud table), so the minority
  * feature matrix is **broadcast** and kNN is computed per-partition
  * against it — no shuffle, no O(n²) pair join materialized; cost is
  * |minority|² distance computations spread across partitions, which is
  * the standard SMOTE regime. Determinism under repartitioning
  * (SURVEY §7.4-1): all randomness derives from `splitmix64(rowIndex,
  * replicaIndex, seed)`, never from partition-order `rand()`; row
  * indices are assigned by a deterministic sort of the minority rows.
  */
class Smote(
    val featureCols: Seq[String],
    val labelCol: String,
    val k: Int = 5,
    val seed: Long = 42L) extends Serializable {

  /** Deterministic 64-bit mix (public-domain splitmix64 finalizer). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def uniform(rowIdx: Long, replica: Int, salt: Long): Double = {
    val h = mix(mix(rowIdx * 31L + salt) ^ (replica.toLong * 0x9e3779b9L) ^ seed)
    (h >>> 11).toDouble / (1L << 53).toDouble  // 53-bit mantissa → [0,1)
  }

  def transform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val base = df.select((featureCols :+ labelCol).map(col): _*).cache()

    val counts = base.groupBy(col(labelCol)).count().collect()
      .map(r => (r.get(0), r.getLong(1)))
    require(counts.length == 2, s"SMOTE expects binary labels, got ${counts.length}")
    val Array((minLabel, minCount), (_, majCount)) = counts.sortBy(_._2)
    val needed = majCount - minCount
    if (needed <= 0) return base

    // Deterministic dense row index over the minority class.
    val orderCols = featureCols.map(col) // total order not required; ties fine
    val minority = base.filter(col(labelCol) === lit(minLabel))
      .withColumn("__idx",
        row_number().over(Window.orderBy(orderCols: _*)) - 1)

    // Broadcast the minority feature matrix (small by assumption).
    val minRows: Array[Array[Double]] = minority
      .select((Seq(col("__idx")) ++ featureCols.map(c => col(c).cast("double"))): _*)
      .collect()
      .sortBy(_.getInt(0))
      .map(r => Array.tabulate(featureCols.length)(i => r.getDouble(i + 1)))
    val bc: Broadcast[Array[Array[Double]]] = spark.sparkContext.broadcast(minRows)

    val nFeat = featureCols.length
    val kk = k
    val needPerRow = needed / minCount
    val remainder = (needed % minCount).toInt
    val mixSeed = seed

    val syntheticRdd = minority.select(col("__idx")).rdd.flatMap { r =>
      val idx = r.getInt(0)
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
          val y = bc.value(pick)
          Row.fromSeq(Array.tabulate(nFeat)(f => x(f) + u * (y(f) - x(f))).toSeq :+ minLabel)
        }
      }
    }

    val schema = StructType(
      featureCols.map(c => StructField(c, DoubleType)) :+
        base.schema(labelCol).copy(name = labelCol))
    val synthetic = spark.createDataFrame(syntheticRdd, schema)
    val result = base
      .select((featureCols.map(c => col(c).cast("double").as(c)) :+ col(labelCol)): _*)
      .unionByName(synthetic)
    result
  }
}

package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The at-scale SMOTE path [[Smote]]'s broadcast guard points to: when
  * the minority class is too large to collect, neighbors are found
  * inside LSH buckets instead of globally.
  *
  * Shape (SURVEY §7.4-1 scale prescription):
  *   1. minority rows get a DETERMINISTIC dense index: distributed
  *      sort by feature tuple → `zipWithIndex` (no driver collect);
  *   2. each row is bucketed by the sign pattern of `nBits` seeded
  *      random hyperplanes — near points share buckets with high
  *      probability, and the bucket key is pure arithmetic, so the
  *      partitioning is reproducible;
  *   3. rows are grouped by bucket (one shuffle keyed on the bucket
  *      id); within a bucket — small by construction — exact kNN and
  *      `x + u·(nn − x)` interpolation run partition-locally;
  *   4. all randomness derives from splitmix64(rowIndex, replica), so
  *      the output multiset is identical under any input partitioning.
  *
  * Semantics match [[Smote]] (imblearn SMOTE, sampling_strategy =
  * 'minority') except neighbors are bucket-local: a singleton bucket
  * falls back to duplicating its row (the bucket-local analogue of
  * imblearn's k>n fallback). Exactness of the balance count is
  * preserved: replicas are allocated by global row index, not by
  * bucket.
  */
/** @param nBits hyperplane count, or -1 (default) to SIZE THE BUCKETS
  *   TO THE DATA: bits = ceil(log2(minorityCount / targetBucketRows)),
  *   clamped to [1, 20]. A fixed small nBits caps the bucket count and
  *   silently re-concentrates a huge minority class into a handful of
  *   O(bucket²) kNN tasks — the failure mode this class exists to
  *   avoid — so the bit width must grow with the data. */
class SmoteLsh(
    val featureCols: Seq[String],
    val labelCol: String,
    val k: Int = 5,
    val nBits: Int = -1,
    val seed: Long = 42L,
    val targetBucketRows: Long = 256L) extends Serializable {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def uniform(rowIdx: Long, replica: Int, salt: Long): Double = {
    val h = mix(mix(rowIdx * 31L + salt) ^ (replica.toLong * 0x9e3779b9L) ^ seed)
    (h >>> 11).toDouble / (1L << 53).toDouble
  }
  /** Seeded hyperplane weight for (bit b, feature f) in [-1, 1). */
  private def planeW(b: Int, f: Int): Double =
    (mix(seed ^ (b.toLong << 32) ^ f.toLong) >>> 11).toDouble /
      (1L << 52).toDouble - 1.0

  def transform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(
      (featureCols.map(c => col(c).cast("double").as(c)) :+ col(labelCol)): _*)

    val counts = base.groupBy(col(labelCol)).count().collect()
      .map(r => (r.get(0), r.getLong(1)))
    require(counts.length == 2, s"SMOTE expects binary labels, got ${counts.length}")
    val Array((minLabel, minCount), (_, majCount)) = counts.sortBy(_._2)
    val needed = majCount - minCount
    if (needed <= 0) return base
    require(minCount > 1,
      s"SMOTE needs >=2 minority rows, got $minCount")

    val nFeat = featureCols.length
    val kk = k
    val bits =
      if (nBits > 0) nBits
      else math.min(20, math.max(1,
        math.ceil(math.log(minCount.toDouble / targetBucketRows) / math.log(2.0)).toInt))
    val needPerRow = needed / minCount
    val remainder = (needed % minCount).toInt
    val planes: Array[Array[Double]] =
      Array.tabulate(bits, nFeat)((b, f) => planeW(b, f))

    // 1. deterministic dense index without a driver collect: distributed
    // sort by feature tuple, then zipWithIndex (stable given the sort).
    val indexed = base
      .filter(col(labelCol) === lit(minLabel))
      .select(featureCols.map(col): _*)
      .rdd
      .map(r => Array.tabulate(nFeat)(i => r.getDouble(i)))
      .sortBy(_.toIndexedSeq, ascending = true,
        numPartitions = spark.sparkContext.defaultParallelism)(
        Ordering.Implicits.seqOrdering[IndexedSeq, Double],
        implicitly[scala.reflect.ClassTag[IndexedSeq[Double]]])
      .zipWithIndex()

    // 2. bucket by hyperplane signs; 3. one shuffle groups each bucket.
    val byBucket = indexed.map { case (x, idx) =>
      var key = 0
      var b = 0
      while (b < bits) {
        var dot = 0.0; var f = 0
        while (f < nFeat) { dot += planes(b)(f) * x(f); f += 1 }
        if (dot > 0) key |= (1 << b)
        b += 1
      }
      (key, (idx, x))
    }.groupByKey(math.max(1, spark.sparkContext.defaultParallelism))

    // 4. bucket-local kNN + seeded interpolation.
    val syntheticRdd = byBucket.flatMap { case (_, members) =>
      val rows = members.toArray.sortBy(_._1)
      rows.iterator.flatMap { case (idx, x) =>
        val replicas = (needPerRow + (if (idx < remainder) 1 else 0)).toInt
        if (replicas == 0) Iterator.empty
        else if (rows.length == 1) {
          // singleton bucket: duplicate (the k>n fallback, bucket-local)
          Iterator.tabulate(replicas)(_ => Row.fromSeq(x.toSeq :+ minLabel))
        } else {
          val neigh = rows.iterator.filter(_._1 != idx).map { case (j, y) =>
            var d = 0.0; var f = 0
            while (f < nFeat) { val t = x(f) - y(f); d += t * t; f += 1 }
            (j, y, d)
          }.toArray.sortBy { case (j, _, d) => (d, j) }
            .take(math.min(kk, rows.length - 1))
          Iterator.tabulate(replicas) { rep =>
            val pick = neigh((uniform(idx, rep, 1L) * neigh.length).toInt
              .min(neigh.length - 1))._2
            val u = uniform(idx, rep, 2L)
            Row.fromSeq(Array.tabulate(nFeat)(f => x(f) + u * (pick(f) - x(f))).toSeq
              :+ minLabel)
          }
        }
      }
    }

    val schema = StructType(
      featureCols.map(c => StructField(c, DoubleType)) :+
        base.schema(labelCol).copy(name = labelCol))
    base.unionByName(spark.createDataFrame(syntheticRdd, schema))
  }
}

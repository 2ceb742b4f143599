package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join handling — the automatic complement to the manual
  * salting operator (`operators/SaltedJoin`): when one join key owns a
  * disproportionate share of rows, AQE splits the oversized shuffle
  * partition into sub-partitions at runtime, so a hot key no longer
  * pins the join's wall-clock on one task.
  *
  * The detection thresholds (256 MB partition, 5× median) are sized for
  * clusters; the test lowers them to observe the mechanism on local
  * data, then asserts the skew-handled join is still exactly correct.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withSkewConf[T](body: => T): T = {
    val pairs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition and keeps the join exact") {
    withSkewConf {
      // 90% of the left side lands on key 0; right side is uniform
      val left = spark.range(0, 60000)
        .select((when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 500))
          .as("k"), col("id").as("v"))
      val right = spark.range(0, 500).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k").select(col("v") + col("w"))
      // collect() finalizes the Dataset's OWN QueryExecution (count()
      // would build a separate one and the inspected plan would never run)
      val rows = joined.collect()
      assert(rows.length === 60000, "every left row must join exactly once")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(4000)}")
      // checksum agrees with skew handling disabled
      val sum1 = rows.map(_.getLong(0)).sum
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val sum2 = left.join(right, "k").select(col("v") + col("w"))
        .collect().map(_.getLong(0)).sum
      assert(sum1 === sum2)
    }
  }
}

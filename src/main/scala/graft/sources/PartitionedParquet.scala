package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-aware parquet layout for the 100 TB scan path.
  *
  * At scale the dominant cost is bytes scanned, and the two levers are
  * (1) directory partitioning on the dominant filter column — queries
  * with a partition predicate never open the other directories
  * (PartitionFilters in the plan, zero I/O for pruned partitions) — and
  * (2) sorting within files on a secondary key so parquet row-group
  * min/max statistics skip pages for range predicates. `maxRecordsPerFile`
  * bounds file size so a 1000-executor read parallelizes evenly.
  */
object PartitionedParquet {

  /** Write `df` partitioned by `partitionCol` (directory level), sorted
    * within partitions by `sortCols` (row-group statistics level). */
  def write(df: DataFrame, path: String, partitionCol: String,
      sortCols: Seq[String], maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartition(col(partitionCol))
      .sortWithinPartitions((partitionCol +: sortCols).map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

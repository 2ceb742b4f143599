package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish testdata (TESTDATA.md).
  *
  * Every loader reads one parquet file from the given scale-factor dir.
  * Parquet is self-describing, so no explicit schema is needed; column
  * pruning and predicate pushdown reach the scan because these return
  * plain lazy DataFrames.
  */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; read nanos as long and convert to a
    * microsecond timestamp (cheap codegen'd arithmetic, stays columnar).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Session-scoped conf: Spark only reads TIMESTAMP(NANOS) via this
    // legacy flag (no per-read option exists). Within this engine every
    // nano-timestamp read goes through this loader, which immediately
    // converts to a proper timestamp, so the long-typed raw read never
    // escapes. `div` (integral) — float division of epoch nanos loses
    // precision past double's 53-bit mantissa (±1us error).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  /** events.parquet has shipped `ts` under different physical encodings
    * across generator versions: INT64 TIMESTAMP(NANOS) (which Spark's
    * vectorized reader only accepts via the legacy nanos-as-long flag) and
    * plain TIMESTAMP(MICROS). Parquet is self-describing, so the loader
    * branches on the scanned type instead of assuming one encoding; every
    * branch normalizes to session-zone TimestampType so downstream query
    * semantics are identical regardless of how the file was written.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Session-scoped conf: Spark only reads TIMESTAMP(NANOS) via this
    // legacy flag (no per-read option exists); it is a no-op for files
    // that store micros. Within this engine every events read goes through
    // this loader, which immediately normalizes, so a long-typed raw read
    // never escapes.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      // Nanos read as epoch-nano longs: integral `div` — float division of
      // epoch nanos loses precision past double's 53-bit mantissa (±1us).
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // NTZ wall-clock → session-zone instant; identity under the UTC
      // session every entrypoint pins, but written as a cast so a non-UTC
      // session still gets a well-defined (not silently shifted) value.
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(
          s"events.parquet `ts` has unsupported physical type $other; " +
            "expected INT64 nanos, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

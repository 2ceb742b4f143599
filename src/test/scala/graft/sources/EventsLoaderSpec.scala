package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.{SparkSpec, Tables}

/** Pins `Tables.events` to being encoding-adaptive: the driver testdata has
  * shipped `ts` as INT64 TIMESTAMP(NANOS) in some generator versions and as
  * plain TIMESTAMP(MICROS) in others, and a loader that can only read one
  * physical encoding of a self-describing format fails before the cluster
  * does any work. All branches must land on the same session-zone
  * TimestampType with identical wall-clock values.
  */
class EventsLoaderSpec extends SparkSpec {

  private def tmpEventsDir(): String = {
    val d = Files.createTempDirectory("graft-events-enc").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("events loads the current driver testdata with ts as TimestampType") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() > 0)
    // A representative downstream use — the exact shape that died when the
    // loader assumed one encoding (DATATYPE_MISMATCH on date_trunc).
    assert(ev.select(date_trunc("hour", col("ts"))).distinct().count() > 0)
  }

  test("long-encoded ts (nanos-as-long read) converts to the same instants") {
    import spark.implicits._
    val dir = tmpEventsDir()
    // 2024-01-02T03:04:05.123456 UTC in epoch nanos, plus one a second later.
    val base = 1704164645123456000L
    Seq((1L, base, "click"), (2L, base + 1000000000L, "view"))
      .toDF("event_id", "ts", "kind")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    val got = ev.orderBy("event_id").select("ts").as[Timestamp].collect()
    assert(got(0) == Timestamp.valueOf("2024-01-02 03:04:05.123456"))
    assert(got(1) == Timestamp.valueOf("2024-01-02 03:04:06.123456"))
  }

  test("timestamp-encoded ts passes through with identical instants") {
    import spark.implicits._
    val dir = tmpEventsDir()
    val t0 = Timestamp.valueOf("2024-01-02 03:04:05.123456")
    val t1 = Timestamp.valueOf("2024-01-02 03:04:06.123456")
    Seq((1L, t0, "click"), (2L, t1, "view"))
      .toDF("event_id", "ts", "kind")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    val got = ev.orderBy("event_id").select("ts").as[Timestamp].collect()
    assert(got(0) == t0 && got(1) == t1)
  }

  test("NTZ-encoded ts (untagged micros, as pyarrow writes) normalizes to TimestampType") {
    import spark.implicits._
    val dir = tmpEventsDir()
    val t0 = Timestamp.valueOf("2024-01-02 03:04:05.123456")
    // Write an NTZ column so the scan yields TimestampNTZType regardless of
    // the writer-side session default.
    Seq((1L, t0, "click")).toDF("event_id", "ts", "kind")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select("ts").as[Timestamp].head() == t0)
  }
}

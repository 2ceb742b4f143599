package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the Spark-4 scale lever for
  * selective fact-fact joins: when one join side carries a selective
  * filter, Catalyst injects a bloom filter built from that side into
  * the OTHER side's scan, so fact rows that cannot match are dropped
  * before the shuffle. At 100 TB this is the difference between
  * shuffling the full lineitem table and shuffling the ~1% that joins.
  *
  * The thresholds that gate injection (10 GB application-side scan) are
  * sized for clusters; tests lower them to observe the mechanism.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withRuntimeFilterConf[T](body: => T): T = {
    val pairs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // a broadcast join needs no runtime filter (the build side IS the
      // filter); force the shuffled-join shape the rule targets, which is
      // what a fact-fact join is at cluster scale anyway
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("a selective dimension filter injects a bloom filter into the fact scan") {
    withRuntimeFilterConf {
      val orders = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 400000)
      val li = Tables.lineitem(spark, sfDir)
      val joined = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilterMightContain")
        || plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      // baseline MUST run with injection off, or a bloom filter that
      // wrongly dropped rows would corrupt both sides identically
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expected = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("qty"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got === expected)
    }
  }

  test("injection is gated off below the scan-size threshold (no overhead on small scans)") {
    // default thresholds: a tiny local scan must NOT pay for a bloom filter
    val orders = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 400000)
    val li = Tables.lineitem(spark, sfDir)
    val plan = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("bloom_filter_agg") && !plan.contains("might_contain"),
      s"bloom filter injected despite tiny scan:\n$plan")
  }
}

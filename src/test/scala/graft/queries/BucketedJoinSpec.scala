package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Co-located join via bucketed tables: pre-bucketing both fact tables on
  * the join key lets the sort-merge join run with ZERO exchanges — the
  * shuffle is paid once at write time, then every subsequent join reuses
  * the layout. This is the 100 TB answer for repeatedly-joined fact
  * tables (SURVEY: "repartition/bucketing for co-located joins").
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")
    try {
      val joined = spark.table("li_bucketed").join(
        spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      // disable broadcast so the join must be SMJ — the point is that
      // bucketing removes the exchanges, not that the tables are small
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
        // and it is correct
        val n = joined.count()
        val expect = Tables.lineitem(spark, sfDir).join(
          Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey")).count()
        assert(n === expect)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("q201: the oracle-gated bucketed join runs exchange-free below the join") {
    val frame = ExtQueries.bucketedJoinFrame(spark, sfDir)
    val plan = frame.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"q201 join still shuffles:\n$plan")
    // bucket scans are recognized as such (SelectedBucketsCount appears
    // on bucket-pruned/bucketed file scans)
    assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
  }

  test("q201: result is layout-invariant — equals the raw-parquet join aggregate") {
    val got = ExtQueries.queries("q201_bucketed_join")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val cents = floor(round(col("l_extendedprice"), 2) * 100.0 + 0.5).cast("long")
    val dPct = floor(round(col("l_discount"), 2) * 100.0 + 0.5).cast("long")
    val expect = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"), sum(cents * (lit(100L) - dPct)).as("rev_c4"))
      .orderBy(col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === expect.toSeq)
  }

  test("q201: with sorted-bucket ordering trusted, the join also drops its sorts") {
    // Spark 3+ ignores sortBy order on read by default (the one-file-per-
    // bucket precondition became opt-in: SPARK-28632); the write path
    // guarantees one file per bucket, so under the legacy conf the SMJ
    // needs neither exchanges NOR sorts — the fully pre-organized join
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val plan = ExtQueries.bucketedJoinFrame(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"still shuffles:\n$plan")
      assert(!plan.contains("Sort "), s"still sorts:\n$plan")
    } finally
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
  }

  test("q201: point lookups on the bucket key prune to 1 of 8 buckets") {
    // the other half of the pay-once layout: equality filters on the
    // bucket key read ONE bucket's files, not the table
    ExtQueries.queries("q201_bucketed_join")(spark, sfDir).collect()
    val lT = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_bkt_lineitem_")).head
    val key = spark.table(lT).select("l_orderkey").head().getLong(0)
    // the planner's autoBucketedScan heuristic turns OFF bucketed reading
    // when no join/aggregate exploits the layout, which also forfeits
    // bucket-filter pruning on a bare point lookup — pin the behavior
    // WITH the bucketed scan forced, the configuration a lookup-heavy
    // deployment would run
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val lookup = spark.table(lT).filter(col("l_orderkey") === key)
      val plan = lookup.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"no bucket pruning in plan:\n$plan")
      assert(lookup.count() > 0)
    } finally
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }

  test("q201: memoized tables survive a rerun (Bench reps pay the write once)") {
    ExtQueries.queries("q201_bucketed_join")(spark, sfDir).collect()
    val before = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_bkt_")).sorted.toSeq
    assert(before.nonEmpty)
    val r1 = ExtQueries.queries("q201_bucketed_join")(spark, sfDir).collect()
    val after = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_bkt_")).sorted.toSeq
    assert(before === after, "rerun re-created bucketed tables instead of memoizing")
    assert(r1.nonEmpty)
  }
}

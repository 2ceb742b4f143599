package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY §2.2–§2.7): scans, projections,
  * filters, joins, aggregations, windows, set ops, scalar functions.
  *
  * Every query is written scale-first:
  *   - filters/projections stay at the top of the plan so Catalyst pushes
  *     them into the parquet scan (PushedFilters / ReadSchema);
  *   - dimension tables (region/nation/customer/supplier/part) are
  *     broadcast so fact-side shuffles carry only the fact table;
  *   - aggregations are plain groupBy so partial (map-side) aggregation
  *     applies before the shuffle;
  *   - outputs are deterministically ordered on their key columns so the
  *     DuckDB-oracle hash compare is order-stable.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Half-up rounding to 4dp as floor arithmetic — bit-identical across
    * engines for identical input doubles (see q02 avg_disc comment). */
  private[queries] def fpRound4(c: org.apache.spark.sql.Column) =
    floor(c * 10000.0 + 0.5) / 10000.0
  private[queries] val fpRound4Sql = (e: String) => s"floor(($e) * 10000.0 + 0.5) / 10000.0"

  // ---------------------------------------------------------------- scans
  /** S1/P1-P3: pruned projection + pushed filter. */
  private val q01PrunedScan: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** A1-ish flagship: TPC-H Q1-style grouped aggregation over lineitem. */
  private val q02AggPricingSummary: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        // Decimal-valued averages need two guards for cross-engine hash
        // parity: (1) snap the sum to its exact 0.01 grid before
        // dividing (summation-order ulp noise), and (2) round via
        // floor(x·10^4 + 0.5) — Spark's round() goes through the decimal
        // string (HALF_UP on "…5") while DuckDB rounds the binary value,
        // so they disagree on true half-way doubles; floor of identical
        // doubles is identical everywhere. Integer-valued sums (qty) are
        // order-exact, so plain avg+round is safe there.
        fpRound4(round(sum(col("l_discount")), 2) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // ---------------------------------------------------------------- joins
  /** §2.3 broadcast chain: fact → dims, revenue per region.
    * All three dims broadcast — the only shuffle is the final groupBy. */
  private val q03JoinBroadcastDims: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(s, dir).select("n_nationkey", "n_regionkey")
    val r = Tables.region(s, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"))
  }

  /** The q03 join shape UN-EXECUTED, over ANALYZE'd catalog tables
    * (registration included — cheap after the first call per session;
    * see [[graft.sources.TableStats.register]]), written in a
    * deliberately BAD syntactic order: the fact⋈dim join first.
    * Separated from [[q123CboJoin]] so PlanAuditSpec can inspect the
    * optimized join order this query executes under. Callers own the
    * [[graft.sources.TableStats.cboConfs]] window. */
  private[graft] def cboJoinShape(s: SparkSession, dir: String): DataFrame = {
    graft.sources.TableStats.register(s, dir,
      Seq("orders", "customer", "nation", "region"),
      suffix = "_cbo", allColumns = false)
    s.sql(
      """SELECT r_name, round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM customer_cbo c
        |JOIN orders_cbo o ON o.o_custkey = c.c_custkey
        |JOIN nation_cbo n ON c.c_nationkey = n.n_nationkey
        |JOIN region_cbo r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
  }

  /** q03's revenue-per-region planned by the COST-BASED optimizer
    * instead of hand-placed broadcast hints — the production stance for
    * repeatedly-queried tables: catalog registration + one ANALYZE per
    * load cycle, CBO + join reorder on, and Catalyst picks the
    * dims-first join order from rowCount statistics AT PLAN TIME no
    * matter how badly the query was written. That initial-order
    * insurance is what AQE cannot give at 100×: runtime adaptation only
    * re-plans stage boundaries it already scheduled, and a fact-first
    * mistake has shuffled the big table before the first stage
    * finishes. The CBO confs are session-wide, so the query executes
    * INSIDE its conf window and returns the bounded result (≤ |regions|
    * rows) as a local frame — restoring the confs before returning
    * keeps the other queries' syntactic-order planning untouched, and a
    * lazily-returned plan would silently re-optimize WITHOUT stats when
    * the runner's downstream write re-plans it. Oracle: identical
    * result to q03's chain. */
  private val q123CboJoin: Q = (s, dir) => {
    val confs = graft.sources.TableStats.cboConfs
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val df = cboJoinShape(s, dir)
      import scala.jdk.CollectionConverters._
      s.createDataFrame(df.collect().toList.asJava, df.schema)
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  /** §2.3 large equi join lineitem ⋈ orders (shuffle join at scale; AQE
    * may still broadcast orders at small SF — both are correct plans). */
  private val q04JoinFactFact: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_discount")
    val o  = Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))
  }

  /** §2.3 left-semi (EXISTS): customers with at least one order, per segment. */
  private val q05SemiJoin: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** §2.3 left-anti (NOT EXISTS): customers with no high-value order. */
  private val q06AntiJoin: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** §2.3 left outer join preserving customers with zero orders.
    * Scale shape: orders is pre-aggregated by o_custkey BEFORE the join,
    * so the shuffle carries one row per customer instead of one per order,
    * and the post-join side needs no second shuffle (vs join-then-groupBy,
    * which shuffles |orders| twice). */
  private val q07OuterJoin: Q = (s, dir) => {
    val c = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
    val oAgg = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(col("o_totalprice")).as("cnt"), sum(col("o_totalprice")).as("spend"))
    c.join(oAgg, c("c_custkey") === oAgg("o_custkey"), "left")
      .select(
        col("c_custkey"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"),
        round(coalesce(col("spend"), lit(0.0)), 2).as("total_spend"))
  }

  /** §2.3 equi+range (theta) join: lineitems whose quantity falls in a
    * window around the part size. Equi key keeps it hash-joinable; the
    * range residual is a post-join filter — no nested-loop explosion. */
  private val q23ThetaJoin: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir).select("l_partkey", "l_quantity")
    val p  = Tables.part(s, dir).select("p_partkey", "p_size", "p_brand")
    li.join(broadcast(p),
        li("l_partkey") === p("p_partkey") &&
        li("l_quantity") >= p("p_size") - 5 &&
        li("l_quantity") <= p("p_size") + 5)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_matches"),
           round(sum(col("l_quantity")), 2).as("qty_in_window"))
      .orderBy(col("p_brand"))
  }

  // -------------------------------------------------------------- windows
  /** W2-style ranked top-N per group: top-3 parts by retail price per
    * brand, deterministic tie-break on p_partkey. */
  private val q08WindowRank: Q = (s, dir) => {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(s, dir)
      .withColumn("price_rank", row_number().over(w))
      .filter(col("price_rank") <= 3)
      .select(col("p_brand"), col("price_rank"), col("p_partkey"),
              round(col("p_retailprice"), 2).as("p_retailprice"))
      .orderBy(col("p_brand"), col("price_rank"))
  }

  /** W1-style running total: cumulative spend per customer over time.
    * No terminal sort: the oracle compare is row-order-insensitive, and a
    * full range-partitioned sort of the whole output is pure overhead. */
  private val q09WindowRunning: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("cum_spend", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_custkey"), col("o_orderkey"), col("cum_spend"))
  }

  /** W2/W4 global top-k: 10 most expensive orders. */
  private val q10TopK: Q = (s, dir) =>
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** lag/lead: per-customer gap in days between consecutive orders. */
  private val q24LagLead: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("gap_days", datediff(col("o_orderdate"), col("prev_date")))
      .filter(col("gap_days").isNotNull)
      .select(col("o_custkey"), col("o_orderkey"), col("gap_days"))
  }

  // ------------------------------------------------- grouping sets / cube
  /** §2.4 cube over (returnflag, linestatus); grouping_id disambiguates
    * the null super-aggregate rows for a stable sort. */
  private val q11Cube: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
           grouping_id(col("l_returnflag"), col("l_linestatus")).as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  /** §2.4 rollup over (orderstatus, orderpriority). */
  private val q12Rollup: Q = (s, dir) =>
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"), count(lit(1)).as("n"),
           grouping_id(col("o_orderstatus"), col("o_orderpriority")).as("gid"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))

  // -------------------------------------------------------------- set ops
  /** §2.6 except/intersect/union semantics over customer keys by order
    * status, computed in ONE shuffle: a single groupBy(custkey) with
    * boolean flags replaces 2×distinct + except + intersect + union
    * (4+ shuffles of the same orders data). The oracle SQL keeps the
    * literal set-op formulation — same result, different (scale-safe) plan. */
  private val q13SetOps: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus").isin("O", "F"))
      .groupBy(col("o_custkey"))
      .agg(max(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("has_open"),
           max(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("has_done"))
      .filter(col("has_open") === 1)
      .withColumn("bucket", when(col("has_done") === 1, "both").otherwise("only_open"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_customers"))
      .orderBy(col("bucket"))
  }

  /** A13/§2.4 distinct counting, exact. */
  private val q14Distinct: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))

  // ------------------------------------------------------ scalar functions
  /** §2.7 string/math scalar functions on part. */
  private val q15ScalarFns: Q = (s, dir) =>
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        length(col("p_name")).as("name_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        round(abs(col("p_retailprice") - 1000.0), 2).as("price_dist"),
        round(log(col("p_retailprice")), 4).as("log_price"),
        (col("p_size") % 7).as("size_mod"))

  /** A4-style conditional aggregation (sum(case when …)). */
  private val q16CaseWhen: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .agg(
        sum(when(col("l_returnflag") === "R", 1).otherwise(0)).cast("long").as("n_returned"),
        sum(when(col("l_returnflag") =!= "R", 1).otherwise(0)).cast("long").as("n_kept"),
        round(sum(when(col("l_returnflag") === "R", col("l_extendedprice")).otherwise(0.0)), 2)
          .as("returned_value"))

  /** A3 single-pass per-column null audit over orders. */
  private val q17NullAudit: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    o.select(o.columns.toSeq.map(c =>
      sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"nulls_$c")): _*)
  }

  /** A10 histogram: 20 equi-width bins over o_totalprice. */
  private val q18Histogram: Q = (s, dir) =>
    Tables.orders(s, dir)
      .select(floor(col("o_totalprice") / 25000.0).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
      .orderBy(col("bin"))

  /** §2.7 event-time bucketing: per-day, per-type counts + mean value. */
  private val q19DateTrunc: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        fpRound4(round(sum(col("value")), 2) / count(lit(1))).as("avg_value"))
      .orderBy(col("day"), col("event_type"))

  /** ST7 tumbling 1-hour window over the events stream table (batch view;
    * identical semantics to the streaming window aggregation). */
  private val q20TumblingWindow: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** P8/S9 point lookup by primary key (pushed to the scan). */
  private val q21PointLookup: Q = (s, dir) =>
    Tables.orders(s, dir)
      .filter(col("o_orderkey") === 42)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
              round(col("o_totalprice"), 2).as("o_totalprice"))

  /** A4/A12 conditional class counts + ratio on events. */
  private val q22ConditionalCounts: Q = (s, dir) =>
    Tables.events(s, dir)
      .agg(
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).cast("long").as("n_purchase"),
        sum(when(col("event_type") =!= "purchase", 1).otherwise(0)).cast("long").as("n_other"),
        fpRound4(round(sum(when(col("event_type") === "purchase", col("value"))), 2) /
          nullif(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)), lit(0L)))
          .as("avg_purchase_value"))

  val queries: Map[String, Q] = Map(
    "q01_pruned_scan"    -> q01PrunedScan,
    "q02_agg_pricing"    -> q02AggPricingSummary,
    "q03_join_bcast"     -> q03JoinBroadcastDims,
    "q04_join_factfact"  -> q04JoinFactFact,
    "q05_semi_join"      -> q05SemiJoin,
    "q06_anti_join"      -> q06AntiJoin,
    "q07_outer_join"     -> q07OuterJoin,
    "q08_window_rank"    -> q08WindowRank,
    "q09_window_running" -> q09WindowRunning,
    "q10_topk"           -> q10TopK,
    "q11_cube"           -> q11Cube,
    "q12_rollup"         -> q12Rollup,
    "q13_setops"         -> q13SetOps,
    "q14_distinct"       -> q14Distinct,
    "q15_scalar_fns"     -> q15ScalarFns,
    "q16_case_when"      -> q16CaseWhen,
    "q17_null_audit"     -> q17NullAudit,
    "q18_histogram"      -> q18Histogram,
    "q19_date_trunc"     -> q19DateTrunc,
    "q20_tumbling_window" -> q20TumblingWindow,
    "q21_point_lookup"   -> q21PointLookup,
    "q22_cond_counts"    -> q22ConditionalCounts,
    "q23_theta_join"     -> q23ThetaJoin,
    "q24_lag_lead"       -> q24LagLead,
    "q123_cbo_join"      -> q123CboJoin,
  )

  val oracle: Map[String, String] = Map(
    "q01_pruned_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  floor((round(sum(l_discount), 2) / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_join_bcast" ->
      """SELECT r_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    // q123: the CBO-planned chain must produce exactly q03's result —
    // the optimizer may only change the ORDER work happens in
    "q123_cbo_join" ->
      """SELECT r_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q04_join_factfact" ->
      """SELECT o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q05_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q07_outer_join" ->
      """SELECT c_custkey, count(o_totalprice) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q08_window_rank" ->
      """SELECT p_brand, price_rank, p_partkey, round(p_retailprice, 2) AS p_retailprice
        |FROM (SELECT p_brand, p_partkey, p_retailprice,
        |        row_number() OVER (PARTITION BY p_brand
        |                           ORDER BY p_retailprice DESC, p_partkey) AS price_rank
        |      FROM part) t
        |WHERE price_rank <= 3 ORDER BY p_brand, price_rank""".stripMargin,
    "q09_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q10_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |FROM (SELECT o_orderkey, o_totalprice FROM orders
        |      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10) t
        |ORDER BY o_orderkey""".stripMargin,
    "q11_cube" ->
      """SELECT l_returnflag, l_linestatus, sum_qty, n, gid FROM (
        |  SELECT l_returnflag, l_linestatus,
        |    sum(l_quantity) AS sum_qty, count(*) AS n,
        |    grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid
        |  FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)) t
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q12_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, revenue, n, gid FROM (
        |  SELECT o_orderstatus, o_orderpriority,
        |    round(sum(o_totalprice), 2) AS revenue, count(*) AS n,
        |    grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid
        |  FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)) t
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q13_setops" ->
      """WITH open_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        |     done_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |     buckets AS (
        |       SELECT o_custkey, 'only_open' AS bucket FROM (SELECT * FROM open_c EXCEPT SELECT * FROM done_c)
        |       UNION ALL
        |       SELECT o_custkey, 'both' AS bucket FROM (SELECT * FROM open_c INTERSECT SELECT * FROM done_c))
        |SELECT bucket, count(*) AS n_customers FROM buckets GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q14_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,
    "q15_scalar_fns" ->
      """SELECT p_partkey, upper(p_brand) AS brand_uc,
        |  substring(p_type, 1, 5) AS type_prefix,
        |  length(p_name) AS name_len,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  round(abs(p_retailprice - 1000.0), 2) AS price_dist,
        |  round(ln(p_retailprice), 4) AS log_price,
        |  p_size % 7 AS size_mod
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q16_case_when" ->
      """SELECT CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
        |  CAST(sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END), 2) AS returned_value
        |FROM lineitem""".stripMargin,
    "q17_null_audit" ->
      """SELECT CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_o_orderkey,
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_o_custkey,
        |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_o_orderstatus,
        |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_o_totalprice,
        |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_o_orderdate,
        |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_o_orderpriority
        |FROM orders""".stripMargin,
    "q18_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin,
    "q19_date_trunc" ->
      """SELECT date_trunc('day', ts) AS day, event_type,
        |  count(*) AS n,
        |  floor((round(sum(value), 2) / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "q20_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    "q21_point_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
        |FROM orders WHERE o_orderkey = 42""".stripMargin,
    "q22_cond_counts" ->
      """SELECT CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_other,
        |  floor((round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) /
        |         nullif(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END), 0)) * 10000.0 + 0.5) / 10000.0
        |    AS avg_purchase_value
        |FROM events""".stripMargin,
    "q23_theta_join" ->
      """SELECT p_brand, count(*) AS n_matches, round(sum(l_quantity), 2) AS qty_in_window
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |  AND l_quantity >= p_size - 5 AND l_quantity <= p_size + 5
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q24_lag_lead" ->
      """SELECT o_custkey, o_orderkey, gap_days FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(date_diff('day', lag(o_orderdate) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey), o_orderdate) AS INTEGER) AS gap_days
        |  FROM orders) t
        |WHERE gap_days IS NOT NULL ORDER BY o_custkey, o_orderkey""".stripMargin,
  )
}

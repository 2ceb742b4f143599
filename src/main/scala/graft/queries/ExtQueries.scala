package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Extension operator surface rounding out SURVEY §2: right/full outer
  * joins (J1), as-of join (J5), JSON/map scalar set (F5, F6-F12, F15),
  * CSV scan/sink with explicit schema (S1/S2), and seeded-generator
  * invariants (F1/S12).
  */
object ExtQueries {
  type Q = (SparkSession, String) => DataFrame

  /** J1 right outer: every part kept, parts with no lineitems count 0. */
  private val q50RightJoin: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir).select("l_partkey", "l_quantity")
    val p = Tables.part(s, dir).select("p_partkey", "p_brand")
    li.join(p, li("l_partkey") === p("p_partkey"), "right")
      .groupBy(col("p_brand"))
      .agg(count(col("l_quantity")).as("n_lines"), count(lit(1)).as("n_rows"))
      .orderBy(col("p_brand"))
  }

  /** J1 full outer over two pre-aggregated sides (nation coverage from
    * customers vs suppliers) — both sides shrink to |nation| rows BEFORE
    * the join, so the full-outer shuffle is trivial at any scale. */
  private val q51FullJoin: Q = (s, dir) => {
    val c = Tables.customer(s, dir).groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val su = Tables.supplier(s, dir).groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(su, c("c_nationkey") === su("s_nationkey"), "full")
      .select(
        coalesce(c("c_nationkey"), su("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** J5 as-of join: each click event picks up the user's most recent
    * purchase value at-or-before its timestamp. Implemented the
    * scale-safe way — union both streams, ONE window over (user, time)
    * with last(ignoreNulls) — instead of a range join that explodes into
    * |clicks|×|purchases| per user. The oracle uses DuckDB's native
    * ASOF JOIN, so the semantics are cross-checked engine-to-engine. */
  private val q52AsofJoin: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(0).as("tag"),
        col("value").as("p_value"), lit(null).cast("long").as("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(1).as("tag"),
        lit(null).cast("double").as("p_value"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("last_purchase", last(col("p_value"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), round(col("last_purchase"), 4).as("last_purchase_value"))
  }

  /** Conversion attribution with tolerance (the funnel variant of the
    * q52 as-of): each purchase is attributed to the user's latest prior
    * click iff it happened within the hour. Same union + partitioned
    * last(ignoreNulls) window — one shuffle keyed on user_id, no
    * range-join explosion; latency is exact integer microseconds so
    * both engines agree bit-for-bit. */
  private val q88Attribution: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(1).as("tag"),
        col("ts").as("c_ts"), lit(null).cast("long").as("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(2).as("tag"),
        lit(null).cast("timestamp").as("c_ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tolUs = 3600L * 1000000L
    clicks.unionByName(purchases)
      .withColumn("last_click", last(col("c_ts"), ignoreNulls = true).over(w))
      .filter(col("tag") === 2)
      .withColumn("latency_us", unix_micros(col("ts")) - unix_micros(col("last_click")))
      .select(col("event_id"),
        (col("last_click").isNotNull && col("latency_us") <= tolUs).cast("int").as("attributed"),
        when(col("last_click").isNotNull && col("latency_us") <= tolUs, col("latency_us"))
          .as("latency_us"))
  }

  /** F10 on real data: parse the events table's `props` JSON sidecar
    * column (schema-on-read with an explicit struct — no sampling
    * inference pass) and aggregate the extracted field per event type.
    * The JSON parse is a codegen'd projection; the only shuffle is the
    * final small groupBy. */
  private val q89EventProps: Q = (s, dir) =>
    Tables.events(s, dir)
      .withColumn("p", from_json(col("props"), StructType(Seq(StructField("k", LongType)))))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("p.k")).as("sum_k"),
        min(col("p.k")).as("min_k"),
        max(col("p.k")).as("max_k"))

  /** F6/F7/F8: regexp extract / extract_all / replace-all + printf-style
    * formatting. Array-valued intermediates are reduced to scalars so the
    * oracle compare stays type-stable. */
  private val q53RegexFns: Q = (s, dir) =>
    Tables.part(s, dir).select(
      col("p_partkey"),
      regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
      regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
      size(regexp_extract_all(col("p_name"), lit("[a-z]+"), lit(0))).as("n_words"),
      element_at(regexp_extract_all(col("p_name"), lit("[a-z]+"), lit(0)), 1).as("first_word"),
      format_string("%s/%05d", col("p_brand"), col("p_partkey")).as("part_code"))

  /** F9/F10/F11/F12: JSON parse of the events props payload, map
    * construction, to_json/from_json roundtrip surfaced as plain values. */
  private val q54JsonMap: Q = (s, dir) =>
    Tables.events(s, dir)
      .withColumn("props_map", from_json(col("props"), MapType(StringType, IntegerType)))
      .withColumn("k_val", col("props_map").getItem("k"))
      .withColumn("roundtrip",
        from_json(to_json(map_from_arrays(array(lit("k")), array(col("k_val")))),
          MapType(StringType, IntegerType)).getItem("k"))
      .select(
        col("event_id"), col("k_val"), col("roundtrip"),
        size(map_keys(col("props_map"))).as("n_keys"),
        array_join(array_sort(map_keys(col("props_map"))), ",").as("keys_sorted"))

  /** S1/S2: CSV sink then CSV scan with an EXPLICIT schema (no inference
    * — SURVEY §2.1-S1 determinism requirement), closed over an aggregate
    * the oracle recomputes from the original parquet. */
  private val q55CsvRoundtrip: Q = (s, dir) => {
    // pid-suffixed (the 9fc2fd1 bucketed-warehouse discipline): a fixed
    // per-sfDir path races when two test JVMs run the same query
    // concurrently (parallel forked test groups, r16)
    val slug = dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      ProcessHandle.current().pid()
    val path = s"/root/repo/target/tmp/csv_roundtrip_$slug"
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
      .write.mode("overwrite").option("header", "true").csv(path)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", LongType),
      StructField("l_quantity", DoubleType), StructField("l_returnflag", StringType)))
    s.read.option("header", "true").schema(schema).csv(path)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** F1/F5/F15/S12: nondeterministic generators checked by their
    * deterministic INVARIANTS (the oracle states the expected constants):
    * uuid uniqueness, rand range, current_timestamp non-null, and the
    * seeded creditcard generator's spec properties (row count, sorted
    * Time, positive Amount, plausible fraud ratio, determinism). */
  private val q56Generators: Q = (s, dir) => {
    val n = 500L
    // cached: the invariant checks below run ~6 actions over g1
    val g1 = graft.ml.FraudPipeline.syntheticCreditcard(s, n, seed = 42L, fraudRatio = 0.02).cache()
    val g2 = graft.ml.FraudPipeline.syntheticCreditcard(s, n, seed = 42L, fraudRatio = 0.02)
    val checksum = (df: DataFrame) =>
      df.agg(round(sum(col("Amount")) + sum(col("V13")) + sum(col("Time")), 6)).head().getDouble(0)
    val w = Window.orderBy(col("Time"))
    val timeSorted = g1
      .withColumn("prev", lag(col("Time"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") > col("Time")).count() == 0
    val uuids = s.range(n).select(expr("uuid()").as("u"),
      rand(1L).as("r"), current_timestamp().as("ts"))
    val uuidStats = uuids.agg(
      countDistinct(col("u")).as("nu"),
      sum(when(col("r") >= 0 && col("r") < 1, 1L).otherwise(0L)).as("nr"),
      sum(when(col("ts").isNotNull, 1L).otherwise(0L)).as("nt")).head()
    val fraud = g1.agg(sum(col("Class"))).head().getLong(0)
    import s.implicits._
    try Seq((
      g1.count(),
      uuidStats.getLong(0), uuidStats.getLong(1), uuidStats.getLong(2),
      if (timeSorted) 1 else 0,
      if (checksum(g1) == checksum(g2)) 1 else 0,
      if (fraud > 0 && fraud < n / 10) 1 else 0,
      g1.filter(col("Amount") <= 0).count()
    )).toDF("n_rows", "n_unique_uuids", "n_rand_in_range", "n_ts_nonnull",
      "time_sorted", "seed_deterministic", "fraud_ratio_plausible", "n_nonpos_amount")
    finally g1.unpersist() // result is driver scalars: release in-closure
  }

  /** P6: numeric coercion with null-on-error — the pandas
    * `to_numeric(errors='coerce')` semantics (deploy.py:30). Spark 4 runs
    * ANSI mode where a plain CAST throws, so the engine's coercion
    * operator is try_cast, which yields null exactly like the reference. */
  private val q59Coercion: Q = (s, dir) =>
    Tables.part(s, dir).select(
      col("p_partkey"),
      expr("try_cast(p_type AS DOUBLE)").as("bad_cast"),
      expr("try_cast(regexp_extract(p_brand, '([0-9]+)', 1) AS INT)").as("good_cast"),
      expr("try_cast(substring(p_name, 1, 2) AS INT)").as("mixed_cast"))

  /** The spark.sql(...) surface: the same engine drives ANSI SQL text
    * over registered views — TPC-H Q3 shape (segment-filtered shipping
    * priority revenue). Catalyst plans SQL and DataFrame code
    * identically, so this also pins the two front doors together. */
  private val q60SqlSurface: Q = (s, dir) => {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT o_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM v_customer
        |JOIN v_orders ON c_custkey = o_custkey
        |JOIN v_lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin)
  }

  /** A7 layout: relational pivot — confusion counts pivoted to a 2×2
    * matrix (groupBy().pivot() with explicit values, so the plan is a
    * single aggregation, no second scan to discover pivot keys). */
  private val q62Pivot: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .select(
        when(col("l_returnflag") === "R", 1).otherwise(0).as("label"),
        when(col("l_discount") >= 0.05, 1).otherwise(0).as("prediction"))
      .groupBy(col("label"))
      .pivot("prediction", Seq(0, 1))
      .agg(count(lit(1)))
      .select(col("label"),
        coalesce(col("0"), lit(0L)).as("pred_0"),
        coalesce(col("1"), lit(0L)).as("pred_1"))
      .orderBy(col("label"))

  /** §2.10 generator surface: explode/unnest — corpus-wide token
    * frequencies (the vocabulary histogram every text pipeline needs). */
  private val q63Explode: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(explode(filter(split(col("text"), "\\s+"), t => t =!= lit(""))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  /** Approximate sketches (HLL distinct, t-digest percentile) checked by
    * their accuracy INVARIANTS against exact values computed in the same
    * query — approx answers are not bit-stable across engines, bounds
    * are. */
  private val q64ApproxSketches: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    li.agg(
      approx_count_distinct(col("l_partkey")).as("hll"),
      countDistinct(col("l_partkey")).as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5)").as("p50_approx"),
      expr("percentile(l_extendedprice, 0.4)").as("p40"),
      expr("percentile(l_extendedprice, 0.6)").as("p60"))
      .select(
        when(abs(col("hll") - col("exact")) / col("exact") < 0.05, 1).otherwise(0)
          .as("hll_within_5pct"),
        when(col("p50_approx").between(col("p40"), col("p60")), 1).otherwise(0)
          .as("p50_in_band"))
  }

  /** ST7 batch view of session windows: gaps-and-islands — a new session
    * starts when a user's inter-event gap exceeds 30 minutes. One
    * window over (user, ts) + a windowed cumulative sum; identical SQL
    * on the oracle side (session_window() itself is streaming-only
    * shaped; this is its exact relational semantics). */
  private val q66SessionWindows: Q = (s, dir) => {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val cum = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("session_value"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("longest_session"),
        // sum, not avg: the values are 2-decimal currency, so sums sit
        // safely off rounding boundaries; averages divided by
        // power-of-two session counts land exactly on x.xxxx5 where
        // 1e-13 cross-engine float noise flips round()
        round(sum(col("session_value")), 2).as("total_session_value"))
      .orderBy(col("user_id"))
  }

  /** Statistical aggregates (EDA surface): correlation, covariance
    * (population + sample), variance, sample stddev in one pass. */
  private val q67StatsFns: Q = (s, dir) =>
    Tables.lineitem(s, dir).agg(
      round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
      round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("covar_pop_qp"),
      round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_samp_qp"),
      round(var_pop(col("l_discount")), 6).as("var_pop_disc"),
      round(stddev_samp(col("l_discount")), 6).as("stddev_samp_disc"))

  /** Fuzzy matching: Levenshtein edit distance between part names — the
    * string-similarity half of near-dup detection (bounded pair set). */
  private val q68EditDistance: Q = (s, dir) => {
    val a = Tables.part(s, dir).filter(col("p_partkey") <= 15)
      .select(col("p_partkey").as("pk_a"), col("p_name").as("name_a"))
    val b = Tables.part(s, dir).filter(col("p_partkey") <= 40)
      .select(col("p_partkey").as("pk_b"), col("p_name").as("name_b"))
    a.join(broadcast(b), col("pk_a") < col("pk_b"))
      .select(col("pk_a"), col("pk_b"),
        levenshtein(col("name_a"), col("name_b")).as("edit_dist"))
  }

  /** Datetime scalar surface: calendar extraction + interval arithmetic. */
  private val q69DatetimeFns: Q = (s, dir) =>
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 101 === 0)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
        (col("o_orderdate") + expr("INTERVAL 3 DAY")).as("plus3d"))

  /** Null semantics: nullif/coalesce/null-safe equality (the engine's
    * `<=>` vs SQL's IS [NOT] DISTINCT FROM). */
  private val q70NullSemantics: Q = (s, dir) =>
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 101 === 0)
      .withColumn("nf", nullif(col("o_orderstatus"), lit("O")))
      .select(
        col("o_orderkey"),
        col("nf"),
        coalesce(col("nf"), lit("open")).as("backfilled"),
        (col("nf") <=> lit("F")).cast("int").as("nsafe_eq_f"),
        (!(col("nf") <=> lit("F"))).cast("int").as("distinct_from_f"),
        when(col("nf").isNull, "was_open").otherwise("terminal").as("bucket"))

  /** Explicit GROUPING SETS (the general form behind cube/rollup q11/q12):
    * chosen aggregation levels only, one pass. */
  private val q73GroupingSets: Q = (s, dir) => {
    Tables.orders(s, dir).createOrReplaceTempView("v_orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n,
        |  grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid
        |FROM v_orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin)
  }

  /** RANGE window frame (value-based, vs the ROWS frames of q09/q24):
    * per-customer rolling 30-day spend. The order key is epoch days so
    * both engines run an identical numeric RANGE frame. */
  private val q74RangeFrame: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day_key"))
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("day_key",
        // orders dates are TIMESTAMP_NTZ; cast through TIMESTAMP (session
        // is pinned UTC, so the instant is unchanged) for unix_micros
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"))
      .withColumn("spend_30d", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_custkey"), col("o_orderkey"), col("spend_30d"))
  }

  /** Z-order clustering on the oracle surface: normalize
    * (l_partkey, l_suppkey) to 16-bit codes (min/max affine — driver
    * scalars from one tiny agg, the q91 pattern), interleave bits into
    * the Morton z-value, then aggregate per coarse z-bucket. The bucket
    * sums are exact integers the oracle recomputes from the same
    * generated bit formula ([[graft.operators.ZOrder.zValueSql]]), so a
    * single bit off in ANY row's interleave breaks the hash. The layout
    * effect itself (row-group min/max locality on BOTH dims) is pinned
    * by ZOrderSpec, which a hash-compare cannot see. */
  /** S3-adjacent: ORC sink then ORC scan — the second columnar format
    * large pipelines standardize on. Unlike q55's CSV (schema-less text,
    * explicit-schema contract), ORC carries its own schema, so the
    * roundtrip proves the write→read path preserves every type in play
    * (int64 / double / timestamp / string) bit-exactly: the closing
    * aggregate hash-matches the oracle's recomputation from the original
    * parquet only if no value shifted through the ORC encode/decode. */
  private val q99OrcRoundtrip: Q = (s, dir) => {
    // pid-suffixed (the 9fc2fd1 bucketed-warehouse discipline): a fixed
    // per-sfDir path races when two test JVMs run the same query
    // concurrently (parallel forked test groups, r16)
    val slug = dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      ProcessHandle.current().pid()
    val path = s"/root/repo/target/tmp/orc_roundtrip_$slug"
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 40 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"))
      .write.mode("overwrite").orc(path)
    s.read.orc(path)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"),
        max(col("o_orderdate")).as("max_date"))
      .orderBy(col("o_orderstatus"))
  }

  /** SO-adjacent schema evolution: `unionByName(allowMissingColumns)` —
    * the operation every multi-source ingest runs when one source grew a
    * column the other lacks. Positional `union` would silently misalign
    * (id under bal); by-name union aligns on names and null-fills the
    * missing column, which is exactly DuckDB's UNION ALL BY NAME. */
  private val q100UnionByName: Q = (s, dir) => {
    val c = Tables.customer(s, dir).select(
      col("c_custkey").as("id"), col("c_acctbal").as("bal"),
      col("c_mktsegment").as("seg"), lit("customer").as("src"))
    val su = Tables.supplier(s, dir).select(
      col("s_suppkey").as("id"), col("s_acctbal").as("bal"), lit("supplier").as("src"))
    c.unionByName(su, allowMissingColumns = true)
      .orderBy(col("src"), col("id"))
  }

  /** J-adjacent runtime filter: bloom-prune the lineitem scan with the
    * key set of a selective orders subset BEFORE the semi-join shuffle
    * ([[graft.operators.BloomPrune]] — the manual form of Spark's
    * InjectRuntimeFilter plan). The oracle is the plain semi join: bloom
    * filters have no false negatives and the exact join removes false
    * positives, so the results must hash-match exactly — the bloom only
    * moves the filtering before the exchange. */
  private val q103BloomPrune: Q = (s, dir) => {
    val hot = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"))
    graft.operators.BloomPrune.prunedSemiJoin(
        Tables.lineitem(s, dir), "l_orderkey", hot, "o_orderkey",
        estItems = 4096L, numBits = 1L << 16)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Partition-aware parquet layout on the oracle surface: write
    * lineitem directory-partitioned by l_returnflag and sorted within
    * files by l_shipdate ([[graft.sources.PartitionedParquet]] — the
    * 100 TB scan-path layout: partition pruning skips directories,
    * row-group min/max stats skip pages for the range predicate), then
    * answer a pruned query from the layout. The oracle recomputes from
    * the ORIGINAL parquet, so the hash-match proves the layout recall
    * is lossless; PartitionedParquetSpec pins the PartitionFilters /
    * pushed-range plan shape. */
  private val q105PartitionPrune: Q = (s, dir) => {
    // pid-suffixed (the 9fc2fd1 bucketed-warehouse discipline): a fixed
    // per-sfDir path races when two test JVMs run the same query
    // concurrently (parallel forked test groups, r16)
    val slug = dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      ProcessHandle.current().pid()
    val path = s"/root/repo/target/tmp/part_parquet_$slug"
    graft.sources.PartitionedParquet.write(
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_returnflag", "l_shipdate", "l_quantity", "l_extendedprice"),
      path, "l_returnflag", Seq("l_shipdate"))
    graft.sources.PartitionedParquet.read(s, path)
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("ship_month"))
  }

  /** Funnel analysis over the events stream table: per-user strictly
    * ordered view → click → purchase progression (first qualifying
    * event at each stage), folded to stage conversion counts. Each
    * stage is a user-keyed aggregate joined to the previous stage —
    * three hash shuffles on user_id that AQE coalesces, no windows over
    * the full event log, no self-cross-join. */
  private val q106Funnel: Q = (s, dir) => {
    val ev = Tables.events(s, dir).select("user_id", "event_type", "ts")
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(views, "user_id").filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
    val buys = ev.filter(col("event_type") === "purchase")
      .join(clicks, "user_id").filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min(col("ts")).as("t_buy"))
    views.join(clicks, Seq("user_id"), "left").join(buys, Seq("user_id"), "left")
      .agg(count(col("t_view")).as("users_viewed"),
        count(col("t_click")).as("users_clicked"),
        count(col("t_buy")).as("users_purchased"))
  }

  /** JSON-lines sink/scan with an EXPLICIT schema (the q55 determinism
    * contract — no inference pass over the data): the third text/object
    * interchange format after CSV and parquet/ORC. The closing aggregate
    * hash-matches the oracle's recomputation from the original parquet
    * only if long/double/string values survive the JSON encode/decode
    * (doubles round-trip via shortest-repr printing). */
  private val q107JsonlRoundtrip: Q = (s, dir) => {
    // pid-suffixed (the 9fc2fd1 bucketed-warehouse discipline): a fixed
    // per-sfDir path races when two test JVMs run the same query
    // concurrently (parallel forked test groups, r16)
    val slug = dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      ProcessHandle.current().pid()
    val path = s"/root/repo/target/tmp/jsonl_roundtrip_$slug"
    Tables.part(s, dir)
      .filter(col("p_partkey") % 20 === 0)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"), col("p_size"))
      .write.mode("overwrite").json(path)
    val schema = StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_brand", StringType),
      StructField("p_retailprice", DoubleType), StructField("p_size", IntegerType)))
    s.read.schema(schema).json(path)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), round(sum(col("p_retailprice")), 2).as("sum_price"),
        max(col("p_size")).as("max_size"))
      .orderBy(col("p_brand"))
  }

  /** Time-series gap-fill (resample): daily event counts per type with
    * ZERO-filled missing days over the observed span — the regularized
    * series every downstream window/trend computation assumes. The day
    * spine is `sequence(min, max)` exploded from ONE aggregate row and
    * cross-joined with the tiny distinct-type dim (both broadcast-sized
    * at any corpus scale: the spine grows with the time span, not the
    * data volume); observed days left-join onto the spine. */
  private val q108GapFill: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).as("d"), col("value"))
    val daily = ev.groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
    val days = ev.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("d"))
    val types = ev.select(col("event_type")).distinct()
    days.crossJoin(types)
      .join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_v"), lit(0.0)).as("sum_v"))
      .orderBy(col("event_type"), col("d"))
  }

  /** Floor-form half-up 4dp round (the LlmQueries fpRound4 discipline:
    * integer-ratio outputs can land exactly on round()'s half-way
    * points where Spark and DuckDB disagree; floor of identical
    * doubles never does). */
  private def fpRound4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 10000.0 + 0.5) / 10000.0

  /** Cohort retention matrix — the product-analytics classic: users
    * grouped by first-seen week (ISO Monday truncation, identical in
    * both engines), activity counted per week offset, retention as the
    * share of the cohort still active. Scale shape: first-seen is a
    * user-grain aggregate (one shuffle on user_id), the activity set
    * dedups at (user, cohort, offset) grain — bounded by users × the
    * time span, never by event volume — and the cohort-size join is
    * |weeks| rows, broadcast-sized at any scale. Week offsets divide
    * exactly (both sides are Monday-truncated dates, so the day diff
    * is a multiple of 7). Activity = PURCHASE events (the paying-user
    * retention cut): the synthetic event stream is dense enough that
    * any-event retention is a flat 1.0 matrix, while purchases churn —
    * the ratio arithmetic gets real values to disagree on. */
  private val q154Retention: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val firstSeen = ev.groupBy(col("user_id")).agg(min(col("d")).as("first_d"))
    val active = ev.join(firstSeen, "user_id")
      .select(col("user_id"),
        date_trunc("week", col("first_d")).cast("date").as("cohort_week"),
        (datediff(date_trunc("week", col("d")).cast("date"),
          date_trunc("week", col("first_d")).cast("date")) / 7).cast("long").as("week_offset"))
      .distinct()
    val cells = active.groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = cells.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    cells.join(broadcast(sizes), "cohort_week")
      // timestamp output (q108 convention): a DATE column round-trips
      // through parquet as date32, which the driver compare reads as
      // python objects — the compare sees dtype, not just value
      .select(col("cohort_week").cast("timestamp").as("cohort_week"),
        col("week_offset"), col("n_users"),
        fpRound4(col("n_users").cast("double") / col("cohort_size")).as("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Rolling active users — DAU and trailing-7-day AU per day with the
    * DAU/WAU stickiness ratio. The exact form: the (user, day)
    * activity set (event volume collapses at this grain first) range-
    * joins a day spine that grows with the TIME SPAN, not the data —
    * each activity row fans to at most 7 spine days, then distinct
    * users count per day. At 100 TB the same plan holds while
    * users × days fits; past that the degrade path is a per-day HLL
    * sketch union (q64 family) — documented, not silently swapped. */
  private val q155RollingActive: Q = (s, dir) => {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val spine = ud.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    spine.join(ud, datediff(col("day"), col("d")).between(0, 6))
      .groupBy(col("day"))
      .agg(
        countDistinct(when(col("d") === col("day"), col("user_id"))).as("dau"),
        countDistinct(col("user_id")).as("wau7"))
      .select(col("day").cast("timestamp").as("day"), col("dau"), col("wau7"),
        fpRound4(col("dau").cast("double") / col("wau7")).as("stickiness"))
      .orderBy(col("day"))
  }

  /** RFM user segmentation — the marketing-analytics classic: per user,
    * recency (days from last purchase to the stream's end), frequency
    * (purchase count), monetary (2dp-rounded spend), each cut into
    * quartiles under deterministic orders (metric, then user_id — ties
    * must land identically in both engines), composed into the
    * three-digit RFM segment code. The window input is USER-grain —
    * event volume collapses in the first aggregate — but the ntile
    * ranking is inherently global; the q142-style 100 TB degrade is
    * quantile thresholds from approx_percentile instead of exact
    * ntile. Recency quartile 1 = most recent (standard RFM polarity:
    * higher digit = weaker), frequency/monetary quartile 1 = highest.
    *
    * SPEC-SIDE REFERENCE, not served: `q156_rfm` serves
    * [[q199RfmTwophase]] (two-level prefix-sum ranks, no global-sort
    * windows); TwoPhaseParitySpec pins this form equal to the served
    * one. */
  private[graft] val q156RfmWindowRef: Q = (s, dir) => {
    val maxD = Tables.events(s, dir)
      .agg(max(to_date(col("ts"))).as("d1"))
    val perUser = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("last_d"),
        count(lit(1)).as("freq"),
        round(sum(col("value")), 2).as("monetary"))
      .crossJoin(broadcast(maxD))
      .select(col("user_id"),
        datediff(col("d1"), col("last_d")).cast("long").as("r_days"),
        col("freq"), col("monetary"))
    perUser
      .withColumn("r_q", ntile(4).over(
        Window.orderBy(col("r_days"), col("user_id"))).cast("long"))
      .withColumn("f_q", ntile(4).over(
        Window.orderBy(col("freq").desc, col("user_id"))).cast("long"))
      .withColumn("m_q", ntile(4).over(
        Window.orderBy(col("monetary").desc, col("user_id"))).cast("long"))
      .withColumn("rfm", col("r_q") * 100 + col("f_q") * 10 + col("m_q"))
      .orderBy(col("user_id"))
  }

  /** First-order Markov transition matrix over the event stream — the
    * user-journey / clickstream-path analysis classic (the model behind
    * sankey flow charts and next-action prediction baselines): for every
    * consecutive event pair within a user's timeline, count
    * (from_type → to_type) transitions and close each row's conditional
    * probability P(to | from). Scale shape: ONE window shuffle keyed on
    * user_id (the same grain sessionization already pays), then the
    * transition matrix is |event_types|² rows — a bounded aggregate at
    * any corpus size — so the per-from totals ride a window over the
    * tiny matrix, never a second pass over events. Ordering inside a
    * user is (ts, event_id): ts alone can tie, the id breaks the tie
    * identically in both engines. */
  private val q158MarkovTransitions: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val m = pairs.groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    m.withColumn("p", fpRound4(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("from_type")))))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Slowly-changing-dimension type-2 build — the warehouse-history
    * classic: collapse an append-only change log (here each user's
    * event_type sequence as the tracked attribute) into versioned
    * validity intervals [valid_from, valid_to) with an is_current flag,
    * keeping one row per RUN of equal consecutive values. Two windows,
    * both keyed on user_id: lag() marks change points, lead() over the
    * surviving change rows closes each interval with the next version's
    * start. Per-entity sequential work only — the standard SCD2
    * merge shape that holds at any entity count because no state ever
    * crosses a user boundary. event_id rides along as the version row's
    * surrogate key: valid_from timestamps can collide inside a user, the
    * id makes both the lead() order and the output order deterministic. */
  private val q159Scd2: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val chg = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    chg.select(col("user_id"), col("event_id"), col("event_type").as("state"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Declarative data-quality constraint suite — the Deequ architecture
    * (Schelter et al. 2018, "Automating large-scale data quality
    * verification"): a set of named constraints compiled into metric
    * aggregates, evaluated BATCHED so one table pays ONE scan no matter
    * how many checks it carries, reported as (check, metric, passed)
    * rows. Here: completeness + accepted-values + range + key-uniqueness
    * over lineitem (all four ride a single aggregation; uniqueness adds
    * one countDistinct at composite-key grain — l_linenumber ≤ 7, so
    * key*8+line is injective and the distinct is over longs, not
    * structs), and referential integrity events.user_id ⊆
    * customer.c_custkey as one left join against the key-grain dim (at
    * production scale the dim side is the broadcast/bloom side — the
    * q103 pattern). The quantity range check is deliberately tight
    * enough to FAIL so the report's pass/fail logic is exercised, and
    * the RI threshold rides the floored metric so both engines compare
    * identical doubles. */
  private val q160DqSuite: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir).agg(
      count(lit(1)).as("n"),
      count(col("l_shipdate")).as("n_comment"),
      countDistinct(col("l_orderkey") * 8 + col("l_linenumber")).as("n_key"),
      sum(when(col("l_quantity") <= 30, 1L).otherwise(0L)).as("n_qty"),
      sum(when(col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L)).as("n_flag"))
    val cust = Tables.customer(s, dir).select(col("c_custkey")).distinct()
    val ri = Tables.events(s, dir).select(col("user_id"))
      .join(cust, col("user_id") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("ri_n"), count(col("c_custkey")).as("ri_ok"))
    def check(name: String, ok: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column, thr: Double) = {
      val m = fpRound4(ok.cast("double") / n.cast("double"))
      struct(lit(name).as("check_name"), n.as("n_checked"), ok.as("n_ok"),
        m.as("metric"), (m >= thr).as("passed"))
    }
    li.crossJoin(ri)
      .select(explode(array(
        check("accepted_values(l_returnflag)", col("n_flag"), col("n"), 1.0),
        check("completeness(l_shipdate)", col("n_comment"), col("n"), 1.0),
        check("range(l_quantity<=30)", col("n_qty"), col("n"), 1.0),
        check("referential(events.user_id)", col("ri_ok"), col("ri_n"), 0.5),
        check("uniqueness(l_orderkey,l_linenumber)", col("n_key"), col("n"), 1.0)
      )).as("r"))
      .select(col("r.*"))
      .orderBy(col("check_name"))
  }

  /** Seasonality profile with independence residuals — the time-series
    * EDA classic: activity counts on the day-of-week × hour-of-day
    * grid, each cell scored by its Pearson residual (obs − exp)/√exp
    * against the independence model exp = row·col/N — the same
    * contingency machinery as q162 pointed at the time axes, which is
    * how "traffic peaks Monday 9am beyond what Monday-ness and 9am-ness
    * separately explain" is detected. One event-grain groupBy; the
    * marginals ride windows over the bounded 7×24 grid. √ is
    * IEEE-correctly-rounded (unlike ln, it's exact by spec in BOTH
    * engines), inputs are exact integer ratios, so residuals land
    * bit-identically on the micro grid. Spark's dayofweek is
    * Sunday=1, DuckDB's Sunday=0 — the Spark side shifts by one. */
  private val q164Seasonality: Q = (s, dir) => {
    def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    val cells = Tables.events(s, dir)
      .select((dayofweek(col("ts")) - 1).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hr"))
      .groupBy(col("dow"), col("hr")).agg(count(lit(1)).as("n"))
    val g = cells
      .withColumn("n_dow", sum(col("n")).over(Window.partitionBy(col("dow"))))
      .withColumn("n_hr", sum(col("n")).over(Window.partitionBy(col("hr"))))
      .withColumn("nt", sum(col("n")).over(Window.partitionBy()))
    val e = col("n_dow").cast("double") * col("n_hr").cast("double") / col("nt").cast("double")
    g.select(col("dow"), col("hr"), col("n"), col("n_dow"), col("n_hr"),
        s6((col("n").cast("double") - e) / sqrt(e)).as("resid_micro"))
      .orderBy(col("dow"), col("hr"))
  }

  /** A/B experiment readout — the two-proportion z-test over a
    * deterministic hash split: every user lands in arm
    * rolling_hash(user_id) mod 2 (stable, uniform, uncorrelated with
    * the id sequence — the assignment discipline real experimentation
    * platforms use), conversion = made ≥1 purchase, and the readout is
    * conversion-rate per arm, uplift, and the pooled two-proportion
    * z-statistic. Scale shape: events collapse to user grain in ONE
    * aggregate (max-flag conversion), arms collapse to a 2-row frame,
    * and the z arithmetic runs on driver-sized data. Exactness: counts
    * are exact longs; √ is IEEE-exact; z and uplift land on the micro
    * fixed-point grid so both engines hold identical longs. */
  private val q165AbTest: Q = (s, dir) => {
    def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    // conversion = "ever made a single purchase over 250" — the dense
    // synthetic stream has EVERY user purchasing, so plain did-purchase
    // conversion is 100% in both arms, the pooled variance collapses to
    // zero, and z is undefined; the big-ticket cut leaves ~8% converting
    // at every SF. max() of doubles has no accumulation order, so the
    // threshold compare is exact cross-engine.
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", col("value"))).as("mx"))
      .select(pmod(graft.llm.TextOps.rollingHash(col("user_id").cast("string")), lit(2L)).as("arm"),
        when(col("mx") > 250.0, 1L).otherwise(0L).as("conv"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
    val wide = arms.agg(
      sum(when(col("arm") === 0, col("n"))).as("n0"),
      sum(when(col("arm") === 0, col("c"))).as("c0"),
      sum(when(col("arm") === 1, col("n"))).as("n1"),
      sum(when(col("arm") === 1, col("c"))).as("c1"))
    val p0 = col("c0").cast("double") / col("n0").cast("double")
    val p1 = col("c1").cast("double") / col("n1").cast("double")
    val pp = (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1")).cast("double")
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n0").cast("double") + lit(1.0) / col("n1").cast("double")))
    wide.select(col("n0"), col("c0"), col("n1"), col("c1"),
      fpRound4(p0).as("cr0"), fpRound4(p1).as("cr1"),
      s6(p1 - p0).as("uplift_micro"), s6((p1 - p0) / se).as("z_micro"))
  }

  /** Exponentially-weighted moving average (α = 1/2) of per-user daily
    * spend — the time-series smoothing primitive behind burn-rate
    * monitors and spend forecasting, in EXACT integer arithmetic:
    * daily totals land on the cent grid (2dp-round then scale — the
    * only float op, already proven stable cross-engine by q156), and
    * the recurrence s ← (s + x) div 2 runs in longs, so the
    * inherently sequential fold is bit-identical in both engines (the
    * q138 fixed-point-iteration discipline applied to a per-entity
    * scan). Scale shape: events collapse to (user, day) grain first —
    * the array each user folds is bounded by the CALENDAR SPAN, not
    * event volume — and the fold itself is a codegen'd higher-order
    * `aggregate`, no UDF. A floor-division EWMA cannot be re-windowed
    * (the nonlinearity breaks the 1/2^k closed form), which is why the
    * fold is per-entity sequential by design, exactly like production
    * EWMA state in a keyed stream. */
  private val q166Ewma: Q = (s, dir) => {
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(floor(round(sum(col("value")), 2) * 100.0 + 0.5).cast("long").as("cents"))
    daily.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("d"), col("cents")))).as("arr"))
      .select(col("user_id"),
        size(col("arr")).cast("long").as("n_days"),
        element_at(col("arr"), -1).getField("d").cast("timestamp").as("last_day"),
        expr("aggregate(slice(arr, 2, size(arr) - 1), arr[0].cents, " +
          "(acc, x) -> (acc + x.cents) div 2)").as("ewma_cents"))
      .orderBy(col("user_id"))
  }

  /** OLS trend fit per event type — the trend-detection primitive of
    * revenue dashboards and alerting (is spend growing, how fast, and
    * does a line explain it): slope, intercept, and r² of daily revenue
    * against the day index, closed-form from the five classic sums
    * (n, Σx, Σy, Σx², Σxy, Σy²) — ONE aggregation pass per series, the
    * textbook single-pass regression. Exactness: daily totals land on
    * the whole-dollar grid (nearest-dollar round of the stable 2dp sum)
    * so every sum is an exact long, the closed-form ratios are single
    * double divisions of identical integers, and the metrics land on
    * the micro grid. Dollar grain (not cents) keeps Σy² far from long
    * overflow; at revenue scales where Σy² outgrows a long the widen
    * path is Spark DECIMAL(38) / DuckDB HUGEINT — documented, not
    * silently lossy. Degenerate series (one day, or constant y) emit
    * NULL via nullif instead of dividing by zero. */
  private val q167TrendFit: Q = (s, dir) => {
    def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(floor(round(sum(col("value")), 2) + 0.5).cast("long").as("y"))
    val idx = daily
      .withColumn("x", datediff(col("d"),
        min(col("d")).over(Window.partitionBy(col("event_type")))).cast("long"))
    val g = idx.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val num  = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den  = nullif((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), lit(0.0))
    val deny = nullif((col("n") * col("syy") - col("sy") * col("sy")).cast("double"), lit(0.0))
    val slope = num / den
    g.select(col("event_type"), col("n"),
        s6(slope).as("slope_micro"),
        s6((col("sy").cast("double") - slope * col("sx").cast("double")) /
          col("n").cast("double")).as("intercept_micro"),
        s6(num * num / (den * deny)).as("r2_micro"))
      .orderBy(col("event_type"))
  }

  /** Correlated scalar subquery — TPC-H Q17's shape (small-quantity
    * revenue: lines whose quantity sits below half their part's average)
    * expressed as SQL TEXT with the correlation left in, so Catalyst's
    * decorrelation does the rewrite a hand plan would: the per-part
    * average becomes ONE aggregate at p_partkey grain joined back to the
    * fact — never the naive re-scan-per-row plan the SQL literally
    * describes. That rewrite is the whole point at 100 TB: a correlated
    * re-scan is O(rows²) I/O, the decorrelated join is two scans.
    * Exactness: l_quantity is whole units stored as double, so the sum
    * entering avg is exact and sum/count is one IEEE division — the
    * half-average threshold compares identically in both engines. */
  private val q168CorrelatedSubq: Q = (s, dir) => {
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    Tables.part(s, dir).createOrReplaceTempView("v_part")
    s.sql(
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_small,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
        |WHERE l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
        |                    FROM v_lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
  }

  /** Market-basket association rules over order contents — the retail
    * co-occurrence classic (Agrawal & Srikant 1994's support/confidence
    * frame): which part brands are bought together beyond chance. Scale
    * shape: lineitems collapse to DISTINCT (order, brand) first — the
    * only pass over the fact — then the pair space is a self-join keyed
    * on orderkey whose per-order fan-out is bounded by the BOUNDED brand
    * vocabulary (≤|brands|² pairs per order, |brands|²/2 total rows in
    * the aggregate). An item-grain variant (partkey baskets, unbounded
    * vocabulary) must prune items below the support floor BEFORE the
    * pair join — the floor here lands after only because brands are
    * bounded. Confidence/support land on the 4dp floor grid; lift
    * widens each factor to double BEFORE multiplying (q162's overflow
    * discipline: n_ab·N exceeds a long at cluster row counts). */
  private val q170AssocRules: Q = (s, dir) => {
    def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    // cached: the basket frame feeds the order total, the item counts,
    // and BOTH sides of the pair join — uncached, the fact table would
    // pay four scans (the q169 materialization discipline, batch form)
    val ob = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .cache()
    val nOrders = ob.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val items = ob.groupBy(col("p_brand")).agg(count(lit(1)).as("n_item"))
    val pairs = ob.toDF("ok", "brand_a")
      .join(ob.toDF("ok", "brand_b"), "ok")
      .filter(col("brand_a") < col("brand_b"))
      .groupBy(col("brand_a"), col("brand_b")).agg(count(lit(1)).as("n_ab"))
    val floorN = col("n_orders") / lit(100L) // support floor: 1% of baskets
    pairs.crossJoin(broadcast(nOrders))
      .filter(col("n_ab").cast("double") >= floorN.cast("double"))
      .join(broadcast(items.toDF("brand_a", "n_a")), "brand_a")
      .join(broadcast(items.toDF("brand_b", "n_b")), "brand_b")
      .select(col("brand_a"), col("brand_b"), col("n_ab"), col("n_a"), col("n_b"),
        fpRound4(col("n_ab").cast("double") / col("n_orders").cast("double")).as("support"),
        fpRound4(col("n_ab").cast("double") / col("n_a").cast("double")).as("conf_ab"),
        fpRound4(col("n_ab").cast("double") / col("n_b").cast("double")).as("conf_ba"),
        s6(col("n_ab").cast("double") * col("n_orders").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift_micro"))
      .orderBy(col("brand_a"), col("brand_b"))
  }

  /** Benford's-law first-digit audit — the forensic-accounting screen
    * fraud analytics runs on monetary columns (Nigrini 2012): the first
    * significant digit of naturally-occurring amounts follows
    * P(d) = log₁₀(1 + 1/d); fabricated numbers don't. The digit comes
    * from the DECIMAL STRING of the floored amount — both engines print
    * a BIGINT identically, where a log10-based extraction would hang
    * exactness on transcendental rounding at power-of-ten boundaries.
    * The nine expected probabilities are fixed micro-integer LITERALS
    * (they are universal constants, not data), so the only float work
    * is the χ² term on exact integer inputs — identical cross-engine,
    * micro-floored. One scan, 9-row output: scan-shaped at any SF. */
  private val q171Benford: Q = (s, dir) => {
    def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    // floor(log10(1+1/d)·1e6 + 0.5), d = 1..9 — Benford's constants
    val expMicro = array(Seq(301030L, 176091L, 124939L, 96910L, 79181L,
      66947L, 57992L, 51153L, 45757L).map(lit): _*)
    val obs = Tables.lineitem(s, dir)
      .filter(col("l_extendedprice") >= 1.0)
      .select(substring(floor(col("l_extendedprice")).cast("long").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      .withColumn("n_total", sum(col("n_obs")).over(Window.partitionBy()))
    val expP = element_at(expMicro, col("digit").cast("int")).cast("double") / 1e6
    val e = col("n_total").cast("double") * expP
    obs.select(col("digit"), col("n_obs"), col("n_total"),
        fpRound4(col("n_obs").cast("double") / col("n_total").cast("double")).as("p_obs"),
        element_at(expMicro, col("digit").cast("int")).as("p_exp_micro"),
        s6((col("n_obs").cast("double") - e) * (col("n_obs").cast("double") - e) / e)
          .as("chi2_term_micro"))
      .orderBy(col("digit"))
  }

  /** Correlated EXISTS / NOT EXISTS — TPC-H Q21's shape (the
    * sole-at-fault supplier: orders this supplier returned where other
    * suppliers participated but none of THEM returned), again as SQL
    * text with both correlations left in. Catalyst rewrites EXISTS into
    * a left-semi and NOT EXISTS into a left-anti join on l_orderkey with
    * the supplier inequality as a residual condition — the two
    * decorrelation shapes q168's scalar case doesn't cover, and both
    * hash-join (never the per-row re-scan the text describes). */
  private val q172ExistsSubq: Q = (s, dir) => {
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT l1.l_suppkey AS suppkey,
        |  CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS n_sole_fault
        |FROM v_lineitem l1
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM v_lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM v_lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY l1.l_suppkey
        |ORDER BY n_sole_fault DESC, suppkey""".stripMargin)
  }

  /** CUSUM changepoint detection on daily revenue per event type — the
    * sequential drift alarm (Page 1954) behind spend-anomaly monitors:
    * S_i = max(0, S_{i-1} + (y_i − target)) accumulates sustained
    * upward excursions and alarms when it crosses h. The recurrence
    * looks sequential, but has the exact closed form
    * S_i = P_i − min(0, min_{j≤i} P_j) over prefix sums P of the
    * deviations — so the whole detector is TWO ordered windows per
    * series (cumsum + running min), no fold, no state, and it
    * parallelizes per-series like any window at 100 TB. Daily totals
    * land on q167's whole-dollar long grid; target = mean daily revenue
    * (integer div) and h = target, so everything through the alarm flag
    * is exact integer arithmetic in both engines. */
  private val q173Cusum: Q = (s, dir) => {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(floor(round(sum(col("value")), 2) + 0.5).cast("long").as("y"))
    val byType = Window.partitionBy(col("event_type"))
    val pre = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily
      .withColumn("target", expr("sum(y) over (partition by event_type) div " +
        "count(*) over (partition by event_type)"))
      .withColumn("p", sum(col("y") - col("target")).over(pre))
      .withColumn("s", col("p") - least(lit(0L), min(col("p")).over(pre)))
    scored.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        max(col("target")).as("target"),
        max(col("s")).as("max_cusum"),
        sum(when(col("s") > col("target"), 1L).otherwise(0L)).as("n_alarm_days"),
        min(when(col("s") > col("target"), col("d"))).cast("timestamp").as("first_alarm"))
      .orderBy(col("event_type"))
  }

  /** Weight-of-evidence / information-value feature screening — the
    * credit-risk scorecard classic (Siddiqi 2006) the reference's fraud
    * domain would run before model fit: bin the candidate feature
    * (price deciles under a deterministic total order), and per bin
    * measure WOE = ln(dist_good/dist_bad) and the IV summand
    * (dist_g − dist_b)·WOE. Same formula family as q140's PSI but
    * SUPERVISED — the two distributions are the label classes, so IV
    * ranks features by separation power. One cached lineitem scan;
    * class totals and marginals ride windows over the bounded 10-row
    * grid; the odds ratio widens each factor to double BEFORE
    * multiplying (q162 discipline) and lands on the micro-nat grid.
    * The decile rank is the TWO-PHASE form (r16: the last served
    * row-scale `ntile(10) OVER (ORDER BY …)` — one task sorting every
    * lineitem row at 100 TB): pack (price cents, orderkey, linenumber)
    * into one unique long key — the identical q205 embedding, faithful
    * because prices sit on exact cents and the tiebreak matches the
    * window's ORDER BY — rank via
    * [[graft.operators.DistributedSelect.globalRowNumber]], decile via
    * [[graft.operators.DistributedSelect.ntileFromRank]] (exact SQL
    * ntile semantics), so the binned rows are bit-identical to the
    * window form's and the oracle's ntile SQL still hash-matches. */
  private val q175WoeIv: Q = (s, dir) => {
    import graft.operators.DistributedSelect
    val li = Tables.lineitem(s, dir)
      .select(when(col("l_returnflag") === "R", 1L).otherwise(0L).as("bad"),
        floor(round(col("l_extendedprice"), 2) * 100.0 + 0.5).cast("long").as("cents"),
        col("l_orderkey"), col("l_linenumber").cast("long").as("ln"))
      .cache() // query-scoped: released by the runner's clearCache (q37 contract)
    val g = li.agg(max(col("cents")), max(col("l_orderkey")), max(col("ln")),
      count(lit(1))).head()
    val (mc, mo, ml, n) = (g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3))
    val L = ml + 1L
    val tieMax = mo * L + ml
    val M = java.lang.Long.highestOneBit(tieMax) * 2L
    require(M > tieMax && mc < Long.MaxValue / M,
      "packed-key caps exceeded — widen the key packing")
    val keyed = li.withColumn("k", col("cents") * M + col("l_orderkey") * L + col("ln"))
    val binned = DistributedSelect.globalRowNumber(keyed, "k", "rnk", M * 1000L)
      .withColumn("bin", DistributedSelect.ntileFromRank(col("rnk"), n, 10).cast("long"))
      .select(col("bad"), col("bin"))
    woeIvCells(binned)
  }

  /** q175's WOE/IV rollup over the (bad, bin) rows — shared by the
    * served two-phase form and the window-form spec reference so the
    * parity pin compares ONLY the binning. */
  private def woeIvCells(binned: DataFrame): DataFrame = {
    def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    val cells = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("bad")).as("n_bad"))
      .withColumn("n_good", col("n") - col("n_bad"))
      .withColumn("t_bad", sum(col("n_bad")).over(Window.partitionBy()))
      .withColumn("t_good", sum(col("n_good")).over(Window.partitionBy()))
    val dg = col("n_good").cast("double") / col("t_good").cast("double")
    val db = col("n_bad").cast("double") / col("t_bad").cast("double")
    val woe = log((col("n_good").cast("double") * col("t_bad").cast("double")) /
      (col("n_bad").cast("double") * col("t_good").cast("double")))
    cells.select(col("bin"), col("n"), col("n_good"), col("n_bad"),
        s6(woe).as("woe_micro"), s6((dg - db) * woe).as("iv_term_micro"))
      .orderBy(col("bin"))
  }

  /** SPEC-SIDE REFERENCE, not served: the global-ntile window form of
    * q175 (one task sorting every lineitem row — the named
    * scale-killer). `q175_woe_iv` serves the two-phase decomposition
    * above; TwoPhaseParitySpec pins this form equal to the served one,
    * so the window spec stays executable without ever being the
    * shipped plan (the q156/q179/q182 twin discipline). */
  private[graft] val q175WoeIvWindowRef: Q = (s, dir) =>
    woeIvCells(Tables.lineitem(s, dir)
      .select(when(col("l_returnflag") === "R", 1L).otherwise(0L).as("bad"),
        ntile(10).over(Window.orderBy(
          col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")))
          .cast("long").as("bin")))

  /** Skyline / Pareto frontier — the preference query (Börzsönyi et al.
    * 2001): parts no other part dominates (cheaper-or-equal AND
    * larger-or-equal, strict somewhere) on (price ↓, size ↑). At the
    * deduped (price, size) grain the 2-D skyline is ONE ordered window:
    * sort by (price asc, size desc) and keep a point iff its size
    * strictly exceeds the running max size of everything sorted before
    * it — every earlier point is cheaper, or same-price-larger, so
    * runmax ≥ size ⇔ dominated. No pair join at all, which is the 2-D
    * scale story; higher dimensions need the block-nested/partitioned
    * algorithms and are out of this operator's declared scope. Raw
    * stored doubles compare without arithmetic — exact cross-engine. */
  private val q176Skyline: Q = (s, dir) => {
    import graft.operators.DistributedSelect
    // the staircase scan `max(size) OVER (ORDER BY price, size DESC ROWS
    // … TO -1)` runs over the DISTINCT (price, size) grid — which is
    // ~|part|-sized, so the window form would funnel the dimension
    // through one task. Two-phase instead (round-11 directive #3 family):
    // pack (price asc, size desc) into one unique long key and take the
    // exclusive prefix max via the two-level bucket decomposition; the
    // oracle keeps the sequential window spec, so the hash match proves
    // the decomposition.
    val CapS = 1L << 10
    val pts = Tables.part(s, dir)
      .groupBy(col("p_retailprice").as("price"), col("p_size").as("size"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("cents", floor(col("price") * 100.0 + 0.5).cast("long"))
      .cache()
    val g = pts.agg(max(col("cents")), max(col("size").cast("long")),
      min(col("size").cast("long"))).head()
    require(g.getLong(0) < (1L << 50) / CapS && g.getLong(1) < CapS && g.getLong(2) >= 0,
      "composed-key caps exceeded — widen the key packing")
    val keyed = pts.withColumn("k",
      col("cents") * CapS + (lit(CapS) - col("size").cast("long")))
      .withColumn("sz", col("size").cast("long"))
    DistributedSelect.globalPrefixMaxExclusive(keyed, "k", "sz", "run_max", 1L << 14)
      .filter(col("run_max").isNull || col("sz") > col("run_max"))
      .select(col("price"), col("size"), col("n_parts"))
      .orderBy(col("price"))
  }

  /** Peak concurrency via the boundary-sweep — the interval-analytics
    * classic (max simultaneous sessions, the capacity-planning number):
    * each event opens an interval [ts, ts + ⌊value⌋ seconds]; emit a +1
    * at the start and a −1 at the end, order boundaries by
    * (time, delta, event_id) — ends sort BEFORE starts at the same
    * instant, so touching intervals never double-count — and the
    * running sum's maximum is the peak. Interval endpoints live as
    * epoch-micro LONGS (one integer multiply), so the sweep is exact
    * integer arithmetic; the running sum is a per-type ordered window —
    * parallel across series like q173, and the peak instant is the
    * window's first argmax. */
  private val q177PeakConcurrency: Q = (s, dir) => {
    // both boundaries explode out of ONE scan — a union of two reads of
    // the same fact would pay the corpus twice
    val bounds = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        explode(array(
          struct(unix_micros(col("ts")).as("t"), lit(1L).as("delta")),
          struct((unix_micros(col("ts")) +
            floor(col("value")).cast("long") * 1000000L).as("t"),
            lit(-1L).as("delta")))).as("b"))
      .select(col("event_type"), col("event_id"),
        col("b.t").as("t"), col("b.delta").as("delta"))
    val sweep = Window.partitionBy(col("event_type"))
      .orderBy(col("t"), col("delta"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = bounds.withColumn("load", sum(col("delta")).over(sweep))
      .withColumn("peak", max(col("load")).over(Window.partitionBy(col("event_type"))))
    scored.filter(col("load") === col("peak"))
      .groupBy(col("event_type"))
      .agg(max(col("peak")).as("max_concurrent"),
        timestamp_micros(min(col("t"))).as("first_peak"))
      .orderBy(col("event_type"))
  }

  /** Ratio-to-parent rollup over the region → nation hierarchy — the
    * OLAP "share" navigation (every BI drill-down's percent-of-parent
    * column): order revenue attributed through customer → nation →
    * region, each nation's share of its region and each region's share
    * of the total, plus the nation's revenue rank within its region.
    * The fact collapses to nation grain in ONE aggregate (cent-exact
    * longs via the q166 grid, so every downstream ratio divides
    * identical integers); shares and ranks are windows over the
    * BOUNDED nation grid, and the dimension joins are broadcast. */
  private val q178ShareOfParent: Q = (s, dir) => {
    val rev = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(floor(round(sum(col("o_totalprice")), 2) * 100.0 + 0.5).cast("long").as("cents"))
    rev
      .withColumn("region_cents", sum(col("cents")).over(Window.partitionBy(col("r_name"))))
      .withColumn("total_cents", sum(col("cents")).over(Window.partitionBy()))
      .select(col("r_name"), col("n_name"), col("cents"),
        fpRound4(col("cents").cast("double") / col("region_cents").cast("double"))
          .as("share_of_region"),
        fpRound4(col("region_cents").cast("double") / col("total_cents").cast("double"))
          .as("region_share_of_total"),
        rank().over(Window.partitionBy(col("r_name"))
          .orderBy(col("cents").desc, col("n_name"))).cast("long").as("rank_in_region"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Revenue concentration — Lorenz curve deciles + Gini coefficient
    * (the inequality readout behind "what share of customers drives 80%
    * of revenue", whale analysis, and fairness audits): customers sorted
    * by spend ascending under a deterministic (cents, custkey) order;
    * decile d's row reports the cumulative spend share of the bottom
    * d/10, and Gini closes from the exact rank-weighted sum
    * G = (2·Σi·xᵢ − (n+1)·T) / (n·T). Every sum is an exact long on the
    * cent grid (Σi·xᵢ stays < 2⁶³ until ~10¹⁸ cent-ranks — the widen
    * path is DECIMAL38/HUGEINT, documented not silent), so G is one
    * double division of identical integers, micro-floored. The global
    * sort rides q156's documented 100 TB degrade (approx-quantile
    * boundaries); the per-decile aggregate is bounded at 10 rows.
    *
    * SPEC-SIDE REFERENCE, not served: `q179_gini_lorenz` serves
    * [[q200GiniTwophase]] (two-level prefix-sum rank + rank-weighted
    * sums, no global sort); TwoPhaseParitySpec pins the parity. */
  private[graft] val q179GiniLorenzWindowRef: Q = (s, dir) => {
    def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(floor(round(sum(col("o_totalprice")), 2) * 100.0 + 0.5).cast("long").as("cents"))
    val ord = Window.orderBy(col("cents"), col("o_custkey"))
    val ranked = perCust
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("dec", ntile(10).over(ord).cast("long"))
    val deciles = ranked.groupBy(col("dec"))
      .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("dec_cents"),
        sum(col("i") * col("cents")).as("dec_ix"))
      .withColumn("cum_cents", sum(col("dec_cents")).over(
        Window.orderBy(col("dec")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("t", sum(col("dec_cents")).over(Window.partitionBy()))
      .withColumn("n", sum(col("n_cust")).over(Window.partitionBy()))
      .withColumn("six", sum(col("dec_ix")).over(Window.partitionBy()))
    deciles.select(col("dec"), col("n_cust"),
        fpRound4(col("cum_cents").cast("double") / col("t").cast("double"))
          .as("cum_share"),
        s6((lit(2.0) * col("six").cast("double") -
            (col("n") + 1L).cast("double") * col("t").cast("double")) /
          (col("n").cast("double") * col("t").cast("double"))).as("gini_micro"))
      .orderBy(col("dec"))
  }

  /** q156's documented 100 TB degrade, EXERCISED — and exact: the same
    * RFM quartiles with every global-sort window replaced by
    * [[graft.operators.DistributedSelect.globalRowNumber]] (two-level
    * prefix sums — bounded bucket histogram + per-bucket windows) and
    * ntile as pure rank arithmetic
    * ([[graft.operators.DistributedSelect.ntileFromRank]]). Ties are
    * handled by CONSTRUCTION, not by value thresholds: each ordering's
    * (metric, user_id) pair packs into one unique long key (descending
    * metrics negate against a cap; caps asserted against overflow and
    * collision), so the two-phase rank is the window rank, and the
    * quartile assignment — including which side of a boundary each tied
    * user lands on — is bit-identical to q156's, which the shared
    * oracle and the parity spec both pin. Bucket widths put the
    * histogram on the METRIC domain (days / purchase counts / ~2M-cent
    * spend bands) — bounded by the domain, not the user count. */
  private val q199RfmTwophase: Q = (s, dir) => {
    import graft.operators.DistributedSelect
    val maxD = Tables.events(s, dir)
      .agg(max(to_date(col("ts"))).as("d1"))
    val perUser = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("last_d"),
        count(lit(1)).as("freq"),
        round(sum(col("value")), 2).as("monetary"))
      .crossJoin(broadcast(maxD))
      .select(col("user_id").cast("long").as("user_id"),
        datediff(col("d1"), col("last_d")).cast("long").as("r_days"),
        col("freq"), col("monetary"))
      .cache()
    val M = 1L << 20
    val CapF = 1L << 20
    val CapM = 1L << 31
    val g = perUser.agg(
      max(col("user_id")).as("mu"), max(col("r_days")).as("mr"),
      max(col("freq")).as("mf"),
      max(floor(col("monetary") * 100.0 + 0.5).cast("long")).as("mc"),
      count(lit(1)).as("n")).head()
    require(g.getLong(0) < M && g.getLong(1) < (1L << 40) / M &&
      g.getLong(2) < CapF && g.getLong(3) < CapM,
      "composed-key caps exceeded — widen the key packing")
    val n = g.getLong(4)
    val keyed = perUser
      .withColumn("cents", floor(col("monetary") * 100.0 + 0.5).cast("long"))
      .withColumn("k_r", col("r_days") * M + col("user_id"))
      .withColumn("k_f", (lit(CapF) - col("freq")) * M + col("user_id"))
      .withColumn("k_m", (lit(CapM) - col("cents")) * M + col("user_id"))
    val ranked = DistributedSelect.globalRowNumber(
      DistributedSelect.globalRowNumber(
        DistributedSelect.globalRowNumber(keyed, "k_r", "rk_r", M),
        "k_f", "rk_f", M),
      "k_m", "rk_m", 1L << 41)
    ranked
      .withColumn("r_q", DistributedSelect.ntileFromRank(col("rk_r"), n, 4).cast("long"))
      .withColumn("f_q", DistributedSelect.ntileFromRank(col("rk_f"), n, 4).cast("long"))
      .withColumn("m_q", DistributedSelect.ntileFromRank(col("rk_m"), n, 4).cast("long"))
      .withColumn("rfm", col("r_q") * 100 + col("f_q") * 10 + col("m_q"))
      .select(col("user_id"), col("r_days"), col("freq"), col("monetary"),
        col("r_q"), col("f_q"), col("m_q"), col("rfm"))
      .orderBy(col("user_id"))
  }

  /** q179's documented 100 TB degrade, EXERCISED — and exact: the
    * Lorenz/Gini global rank through
    * [[graft.operators.DistributedSelect.globalRowNumber]] over the
    * unique (cents, custkey) packed key, deciles as rank arithmetic.
    * The rank-weighted sum Σi·xᵢ — the term that LOOKS like it needs a
    * global sort — needs only the per-row rank, so the whole statistic
    * closes with one bounded histogram pass + per-bucket windows;
    * outputs are bit-identical to q179's (shared oracle + parity
    * spec). */
  private val q200GiniTwophase: Q = (s, dir) => {
    import graft.operators.DistributedSelect
    def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    val M = 1L << 24
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(floor(round(sum(col("o_totalprice")), 2) * 100.0 + 0.5).cast("long").as("cents"))
      .select(col("o_custkey").cast("long").as("o_custkey"), col("cents"))
      .cache()
    val g = perCust.agg(max(col("o_custkey")), max(col("cents")), count(lit(1))).head()
    require(g.getLong(0) < M && g.getLong(1) < (1L << 38),
      "composed-key caps exceeded — widen the key packing")
    val n = g.getLong(2)
    val ranked = DistributedSelect.globalRowNumber(
        perCust.withColumn("k", col("cents") * M + col("o_custkey")),
        "k", "i", 1L << 44) // ~2M-cent bands: histogram bounded by domain
      .withColumn("dec", DistributedSelect.ntileFromRank(col("i"), n, 10).cast("long"))
    val deciles = ranked.groupBy(col("dec"))
      .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("dec_cents"),
        sum(col("i") * col("cents")).as("dec_ix"))
      .withColumn("cum_cents", sum(col("dec_cents")).over(
        Window.orderBy(col("dec")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("t", sum(col("dec_cents")).over(Window.partitionBy()))
      .withColumn("n", sum(col("n_cust")).over(Window.partitionBy()))
      .withColumn("six", sum(col("dec_ix")).over(Window.partitionBy()))
    deciles.select(col("dec"), col("n_cust"),
        fpRound4(col("cum_cents").cast("double") / col("t").cast("double"))
          .as("cum_share"),
        s6((lit(2.0) * col("six").cast("double") -
            (col("n") + 1L).cast("double") * col("t").cast("double")) /
          (col("n").cast("double") * col("t").cast("double"))).as("gini_micro"))
      .orderBy(col("dec"))
  }

  /** Equi-depth histogram construction — the ANALYZE-statistics artifact
    * a cost-based optimizer consumes (the q123/TableStats story's data
    * half: selectivity estimates come from exactly this structure):
    * 16 equal-population buckets over l_extendedprice under a
    * deterministic total order, each bucket reporting count, min/max
    * boundary, and NDV — equi-DEPTH (not equi-width q18) because skewed
    * columns put all the resolution where the data is. The build is one
    * ntile pass + one bounded 16-row aggregate; the global rank rides
    * q156's documented approx-quantile 100 TB degrade (which is exactly
    * how production ANALYZE computes it — approx boundaries, exact
    * per-bucket stats).
    *
    * SPEC-SIDE REFERENCE, not served: `q182_equidepth_hist` serves
    * [[q205EquidepthTwophase]] (two-level prefix-sum rank, no global
    * sort); TwoPhaseParitySpec pins this form equal to the served one. */
  private[graft] val q182EquidepthHistWindowRef: Q = (s, dir) => {
    val ranked = Tables.lineitem(s, dir)
      .select(col("l_extendedprice").as("v"), col("l_orderkey"), col("l_linenumber"))
      .withColumn("bucket", ntile(16).over(
        Window.orderBy(col("v"), col("l_orderkey"), col("l_linenumber"))).cast("long"))
    ranked.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("v")).as("lo"),
        max(col("v")).as("hi"),
        countDistinct(col("v")).as("ndv"))
      .orderBy(col("bucket"))
  }

  /** Peer-group anomaly screen — the segmentation-aware outlier detector
    * fraud review queues run (a balance can be normal globally but
    * anomalous FOR ITS PEER GROUP): per nation, population z-scores of
    * customer balances, flag |z| > 2, report the group's outlier count
    * and extremes. One customer scan; the group moments ride a window
    * over the bounded nation grid, so no second pass and no join.
    * Exactness: balances land on the cent grid as longs, the moment
    * sums are exact integers, and the variance numerator n·Σx² − (Σx)²
    * widens each factor to double BEFORE multiplying (q162 discipline —
    * n·Σx² overflows a long at ~10⁶ customers with 10⁶-cent balances);
    * the z expression is then the identical double computation on both
    * engines. nullif guards a constant-balance peer group. */
  private val q184PeerAnomaly: Q = (s, dir) => {
    def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    val byNation = Window.partitionBy(col("c_nationkey"))
    val cents = floor(round(col("c_acctbal"), 2) * 100.0 + 0.5).cast("long")
    val scored = Tables.customer(s, dir)
      .select(col("c_nationkey"), cents.as("x"))
      .withColumn("n", count(lit(1)).over(byNation))
      .withColumn("sx", sum(col("x")).over(byNation))
      .withColumn("sxx", sum(col("x") * col("x")).over(byNation))
    val mu = col("sx").cast("double") / col("n").cast("double")
    val sigma = sqrt(nullif(
      col("n").cast("double") * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double"), lit(0.0))) /
      col("n").cast("double")
    val z = (col("x").cast("double") - mu) / sigma
    scored.withColumn("z", z)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        sum(when(abs(col("z")) > 2.0, 1L).otherwise(0L)).as("n_outliers"),
        s6(max(abs(col("z")))).as("max_abs_z_micro"))
      .orderBy(col("c_nationkey"))
  }

  /** Autocorrelation function (ACF, lags 1–7) of daily revenue per event
    * type — the time-series diagnostic read before any ARIMA/seasonal
    * model (q167 fits the trend; this measures what memory the residual
    * process has). EXACT integer form: with T = Σx and n the series
    * length, the centered value scales to y_t = n·x_t − T (an exact
    * long), and n² cancels in the ratio, so
    * r_k = Σ y_t·y_{t+k} / Σ y_t² is a single double division of exact
    * integer sums — no float means anywhere (widen path at extreme
    * revenue scales is DECIMAL38, documented not silent). Lags are ROW
    * lags over the day-ordered series (the synthetic stream is dense;
    * on gappy series resample via q108's gap-fill first — documented
    * contract). One scan; seven lead() columns in ONE window pass,
    * stacked to (lag, product) pairs; the denominator rides the same
    * per-type window. */
  private val q185Autocorrelation: Q = (s, dir) => {
    def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(floor(round(sum(col("value")), 2) + 0.5).cast("long").as("x"))
    val byType = Window.partitionBy(col("event_type"))
    val ordered = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val y = daily
      .withColumn("n", count(lit(1)).over(byType))
      .withColumn("t", sum(col("x")).over(byType))
      .withColumn("y", col("n") * col("x") - col("t"))
    val withLeads = (1 to 7).foldLeft(y) { (df, k) =>
      df.withColumn(s"y$k", lead(col("y"), k).over(ordered))
    }.withColumn("syy", sum(col("y") * col("y")).over(byType))
    val stacked = withLeads.select(col("event_type"), col("y"), col("syy"),
        expr("stack(7, " + (1 to 7).map(k => s"${k}L, y$k").mkString(", ") + ") AS (lag, ylead)"))
      .filter(col("ylead").isNotNull)
    stacked.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        s6(sum(col("y") * col("ylead")).cast("double") /
          max(col("syy")).cast("double")).as("acf_micro"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** Ljung–Box portmanteau whiteness test (Ljung & Box 1978,
    * Biometrika; Box & Pierce 1970 for the unscaled form) — q185's ACF
    * measures the memory lag by lag; this is the ONE-NUMBER
    * significance gate read off it ("is there ANY autocorrelation at
    * lags 1..h" — the residual-whiteness check behind every ARIMA fit
    * and the alerting form of "is this series still i.i.d."):
    * Q(h) = n(n+2) Σ_{k≤h} r̂_k²/(n−k) with h = [[LbLags]], per event
    * type over the daily-revenue series. Reuses q185's exact integer
    * machinery verbatim (y_t = n·x_t − T longs; Σy_t·y_{t+k} and Σy_t²
    * exact long sums; same DECIMAL38-at-extreme-revenue documented
    * widen path). The per-lag terms and the h-term sum are doubles —
    * and a groupBy SUM of doubles is commutative-reduce
    * NONDETERMINISTIC, so the terms are pivoted to columns and added
    * in WRITTEN order instead (one identical-order chain both
    * engines), micro-floored. `reject` compares Q against
    * χ²_{0.99, 7} = 18.475307 (identical IEEE comparison); series too
    * short for all h lags (n ≤ h+1) pin the −1 sentinel on both
    * engines (the q240 contract). The output ROW SET is derived from
    * the per-type daily frame with the per-lag aggregates LEFT-joined
    * onto it — so a type whose series has a single day (every lead
    * NULL, zero stacked rows) still emits its sentinel row instead of
    * silently vanishing, keeping the documented n ≤ h+1 contract total
    * and the streaming twin's keyset bridge intact
    * ([[graft.streaming.StreamOps.ljungBoxState]] emits defined=false
    * for such a scope). Scale: everything rides the
    * calendar-bounded daily grid — one scan, one 7-lead window pass. */
  private val LbLags = 7
  private val q254LjungBox: Q = (s, dir) => {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(floor(round(sum(col("value")), 2) + 0.5).cast("long").as("x"))
    val byType = Window.partitionBy(col("event_type"))
    val ordered = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val y = daily
      .withColumn("n", count(lit(1)).over(byType))
      .withColumn("t", sum(col("x")).over(byType))
      .withColumn("y", col("n") * col("x") - col("t"))
    val withLeads = (1 to LbLags).foldLeft(y) { (df, k) =>
      df.withColumn(s"y$k", lead(col("y"), k).over(ordered))
    }
    val stacked = withLeads.select(col("event_type"), col("y"),
        expr("stack(" + LbLags + ", " +
          (1 to LbLags).map(k => s"${k}L, y$k").mkString(", ") + ") AS (lag, ylead)"))
      .filter(col("ylead").isNotNull)
    val perLag = stacked.groupBy(col("event_type"), col("lag"))
      .agg(sum(col("y") * col("ylead")).as("syk"))
    val pivotCols = (1 to LbLags).map(k =>
      max(when(col("lag") === k, col("syk"))).as(s"s$k"))
    // row set from the per-type daily frame (n/syy are exact long
    // aggregates of it); the stacked per-lag sums LEFT-join on — an
    // n=1 type (no surviving lead rows) keeps its row and takes the
    // n <= h+1 sentinel below instead of vanishing
    val base = y.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), sum(col("y") * col("y")).as("syy"))
    val pv = base.join(
      perLag.groupBy(col("event_type")).agg(pivotCols.head, pivotCols.tail: _*),
      Seq("event_type"), "left")
    val nD = col("n").cast("double")
    val terms = (1 to LbLags).map { k =>
      val r = col(s"s$k").cast("double") / col("syy").cast("double")
      r * r / (nD - k.toDouble)
    }.reduce(_ + _)
    val q = nD * (nD + 2.0) * terms
    val defined = col("n") > (LbLags + 1)
    pv.select(col("event_type"), col("n").as("n_days"), col("syy"),
        when(defined, floor(q * 1e6 + 0.5).cast("long")).otherwise(lit(-1L)).as("q_micro"),
        when(!defined, lit(-1L))
          .when(q > 18.475307, lit(1L)).otherwise(lit(0L)).as("reject"))
      .orderBy(col("event_type"))
  }

  /** Partial autocorrelation at lags 1..3 via the Durbin–Levinson
    * recursion unrolled to closed form (Durbin 1960; Levinson 1947;
    * Box & Jenkins 1970 §3.2 for PACF as THE AR-order identification
    * tool — ACF (q185) says how much memory a series has, PACF says
    * which lag carries it once shorter lags are regressed out: an
    * AR(p) series has PACF ≡ 0 past lag p, so this is the "which lag
    * actually matters" read behind every ARIMA order choice). The r13
    * round skipped PACF because the general recursion is ugly in SQL;
    * at h ≤ 3 it is three closed-form steps off q185's exact ACF
    * machinery, mirrorable operand-for-operand:
    *   φ₁₁ = r₁
    *   φ₂₂ = (r₂ − r₁²) / (1 − r₁²),            φ₂₁ = r₁ − φ₂₂·r₁
    *   φ₃₃ = (r₃ − φ₂₁·r₂ − φ₂₂·r₁) / (1 − φ₂₁·r₁ − φ₂₂·r₂)
    * with r_k = Σy_t·y_{t+k} / Σy_t² on q185's exact integer y-grid
    * (y_t = n·x_t − T longs; the numerators/denominator are exact long
    * sums, each r_k ONE double division, the recursion one written-
    * order double chain — both engines evaluate the same IEEE tree).
    * Row set and degenerate contract follow q254: rows derive from the
    * per-type daily frame (n=1 types keep their sentinel row); series
    * too short (n ≤ h+1), a zero Σy² (constant series), or a vanishing
    * recursion denominator (|1−r₁²| or the φ₃₃ denominator = 0 — an
    * IEEE comparison on identically-built doubles) pin the −2·10⁶
    * sentinel on all three φ (the q250 out-of-range convention: |φ|
    * ≤ 1 on the micro grid). Scale: the calendar-bounded daily grid —
    * one scan, one 3-lead window pass, bounded output. */
  private val PacfLags = 3
  private val q259Pacf: Q = (s, dir) => {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(floor(round(sum(col("value")), 2) + 0.5).cast("long").as("x"))
    val byType = Window.partitionBy(col("event_type"))
    val ordered = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val y = daily
      .withColumn("n", count(lit(1)).over(byType))
      .withColumn("t", sum(col("x")).over(byType))
      .withColumn("y", col("n") * col("x") - col("t"))
    val withLeads = (1 to PacfLags).foldLeft(y) { (df, k) =>
      df.withColumn(s"y$k", lead(col("y"), k).over(ordered))
    }
    val stacked = withLeads.select(col("event_type"), col("y"),
        expr("stack(" + PacfLags + ", " +
          (1 to PacfLags).map(k => s"${k}L, y$k").mkString(", ") + ") AS (lag, ylead)"))
      .filter(col("ylead").isNotNull)
    val perLag = stacked.groupBy(col("event_type"), col("lag"))
      .agg(sum(col("y") * col("ylead")).as("syk"))
    val pivotCols = (1 to PacfLags).map(k =>
      max(when(col("lag") === k, col("syk"))).as(s"s$k"))
    val base = y.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), sum(col("y") * col("y")).as("syy"))
    val pv = base.join(
      perLag.groupBy(col("event_type")).agg(pivotCols.head, pivotCols.tail: _*),
      Seq("event_type"), "left")
    // every divisor is null-masked when zero (NOT merely branch-guarded:
    // ANSI division raises DIVIDE_BY_ZERO and codegen subexpression
    // elimination can evaluate a shared division EAGERLY even inside an
    // untaken CASE branch); a null divisor propagates null through the
    // chain, the defined flag collapses null to false, and the sentinel
    // branch emits — same values as the oracle on every defined row
    def nz(c: Column): Column = when(c =!= 0.0, c)
    def r(k: Int): Column =
      col(s"s$k").cast("double") / nz(col("syy").cast("double"))
    val r1 = r(1); val r2 = r(2); val r3 = r(3)
    val phi11 = r1
    val d2 = lit(1.0) - r1 * r1
    val phi22 = (r2 - r1 * r1) / nz(d2)
    val phi21 = r1 - phi22 * r1
    val d3 = lit(1.0) - phi21 * r1 - phi22 * r2
    val phi33 = (r3 - phi21 * r2 - phi22 * r1) / nz(d3)
    val defined = coalesce(
      col("n") > (PacfLags + 1) && col("syy") > 0 &&
        d2 =!= 0.0 && d3 =!= 0.0, lit(false))
    def s6(c: Column): Column = floor(c * 1e6 + 0.5).cast("long")
    def sent(c: Column): Column = when(defined, s6(c)).otherwise(lit(-2000000L))
    pv.select(col("event_type"), col("n").as("n_days"), col("syy"),
        sent(r1).as("acf1_micro"), sent(r2).as("acf2_micro"),
        sent(r3).as("acf3_micro"),
        sent(phi11).as("pacf1_micro"), sent(phi22).as("pacf2_micro"),
        sent(phi33).as("pacf3_micro"),
        defined.cast("long").as("defined"))
      .orderBy(col("event_type"))
  }

  /** Empirical-Bayes shrinkage of per-group rates (beta-binomial,
    * method-of-moments prior — Efron & Morris 1975 "Data Analysis Using
    * Stein's Estimator"; Robbins 1956 for the EB idea): per-nation
    * return rates shrunk toward the cross-group prior, the standard fix
    * for "the smallest group always tops the leaderboard" — raw rates
    * from 40-order nations swing wildly; EB pulls them toward the pool
    * in proportion to their evidence. Prior (α, β) is fit by MoM on the
    * MICRO-FLOORED rate grid: p̃ᵢ = ⌊yᵢ·10⁶/nᵢ⌋ is an EXACT long
    * (integer division), so Σp̃ and Σp̃² are exact integer moments —
    * this sidesteps the cross-engine trap that a SUM of K raw double
    * rates is commutative-reduce nondeterministic (the q254 pivot
    * lesson, solved here by gridding instead of pivoting because K is
    * data-dependent). Σp̃² ≤ K·10¹² wraps int64 only past K ≈ 9·10⁶
    * groups (documented bound). α+β = m(1−m)/v − 1 and the shrunken
    * (yᵢ+α)/(nᵢ+α+β) are identical-order double chains off those exact
    * integers, micro-floored. Degenerate priors (zero between-group
    * variance, or MoM giving α+β ≤ 0 — the overdispersed case where EB
    * says "don't shrink") emit the raw rate with prior_defined = 0 on
    * BOTH engines (the q240 sentinel contract). Scale: one join-cascade
    * scan collapses to |nations| rows; the prior is a second aggregate
    * over that bounded group table. */
  private val q255EbShrinkage: Q = (s, dir) => {
    val g = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("y"))
      .withColumn("p_micro", expr("(y * 1000000) div n"))
    val prior = g.agg(count(lit(1)).as("k"),
      sum(col("p_micro")).as("sp"),
      sum(col("p_micro") * col("p_micro")).as("spp"))
    val kD = col("k").cast("double")
    val m01 = col("sp").cast("double") / kD / 1e6
    val v01 = (kD * col("spp").cast("double") -
      col("sp").cast("double") * col("sp").cast("double")) / (kD * kD) / 1e12
    val ab = m01 * (lit(1.0) - m01) / v01 - 1.0
    val withPrior = g.crossJoin(broadcast(prior)) // 1-row prior frame
      .withColumn("defined", (v01 > 0.0) && (ab > 0.0))
    val alpha = m01 * ab
    val shrunk = (col("y").cast("double") + alpha) /
      (col("n").cast("double") + ab)
    withPrior.select(col("n_name"), col("n"), col("y"), col("p_micro").as("raw_micro"),
        when(col("defined"), floor(alpha * 1e6 + 0.5).cast("long"))
          .otherwise(lit(-1L)).as("alpha_micro"),
        when(col("defined"), floor((ab - alpha) * 1e6 + 0.5).cast("long"))
          .otherwise(lit(-1L)).as("beta_micro"),
        when(col("defined"), floor(shrunk * 1e6 + 0.5).cast("long"))
          .otherwise(col("p_micro")).as("shrunk_micro"),
        col("defined").cast("long").as("prior_defined"))
      .orderBy(col("n_name"))
  }

  /** Largest-remainder apportionment (Hamilton's method — the budget /
    * seat / shard allocation classic): split a fixed integer budget of
    * [[ApportionUnits]] units across nations proportional to revenue,
    * exactly: each nation takes ⌊budget·cents/total⌋, and the leftover
    * units (< |nations|) go one each to the largest remainders under a
    * deterministic (remainder desc, nation) order. Every quantity is
    * exact integer arithmetic — budget·cents needs the double widen
    * documented at cluster revenue, here it is an exact long — and the
    * allocation provably sums to the budget (spec-pinned), which is the
    * property naive per-row rounding loses. Fact collapses to nation
    * grain once; ranks ride the bounded grid. */
  private val ApportionUnits = 1000L
  private val q186Apportionment: Q = (s, dir) => {
    val rev = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(floor(round(sum(col("o_totalprice")), 2) * 100.0 + 0.5).cast("long").as("cents"))
    val g = rev
      .withColumn("total", sum(col("cents")).over(Window.partitionBy()))
      .withColumn("base", expr(s"($ApportionUnits * cents) div total"))
      .withColumn("rem", lit(ApportionUnits) * col("cents") - col("base") * col("total"))
    val leftover = lit(ApportionUnits) - sum(col("base")).over(Window.partitionBy())
    g.withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("n_name"))).cast("long"))
      .withColumn("units", col("base") + when(col("rk") <= leftover, 1L).otherwise(0L))
      .select(col("n_name"), col("cents"), col("base"), col("rk"), col("units"))
      .orderBy(col("n_name"))
  }

  /** Exact distributed order statistics WITHOUT a global sort — the
    * [[graft.operators.DistributedSelect]] two-phase histogram method
    * selecting p50/p90/p99 of price in TWO passes total for all three
    * ranks. This is the exact 100 TB path that q142's documented
    * approx_percentile degrade alludes to: a global sort ranks every
    * row to answer three order statistics; the two-phase method ranks
    * nothing and its driver artifacts are bounded (bucket histogram +
    * in-bucket value counts). percentile_disc semantics: rank
    * k = ⌈q·n⌉, the k-th smallest cent value. The oracle recomputes
    * the same ranks with the full-sort spec — matching proves the
    * histogram decomposition equals the order-statistic definition
    * (the q139/q146 shard-vs-direct discipline applied to selection). */
  private val q187DistributedSelect: Q = (s, dir) => {
    import graft.operators.DistributedSelect
    val cents = Tables.lineitem(s, dir)
      .select(floor(round(col("l_extendedprice"), 2) * 100.0 + 0.5).cast("long").as("v"))
      .cache()
    val n = cents.count()
    val pcts = Seq(50L, 90L, 99L)
    val ks = pcts.map(p => p -> math.ceil(p / 100.0 * n).toLong).toMap
    val sel = DistributedSelect.kth(cents, ks.values.toSeq, width = 1000L)
    // scalar-result query: the output is a bounded literal frame, so the
    // scan cache must be released in-closure (CacheContract discipline)
    cents.unpersist()
    import s.implicits._
    pcts.map(p => (p, ks(p), sel(ks(p)))).toDF("pct", "k", "cents")
      .orderBy(col("pct"))
  }

  /** Systematic probability-proportional-to-size sampling (Madow 1949)
    * — the survey-sampling / data-pruning selection that picks units
    * with probability proportional to weight DETERMINISTICALLY: walk
    * the cumulative weight line, select a unit once per multiple of
    * total/k its span crosses. Exact integer crossing count
    * ⌊k·cum_i/total⌋ − ⌊k·cum_{i−1}/total⌋ (no fractional interval
    * drift), so Σhits = k EXACTLY and any unit with weight ≥ total/k
    * is guaranteed ≥ 1 hit — the two properties Bernoulli/hash
    * sampling (q86) cannot give. One window pass under a deterministic
    * (custkey) order; k·cum widens per the q162 discipline at cluster
    * scale (documented; exact long here). */
  private val PpsSamples = 20L
  private val q188PpsSample: Q = (s, dir) => {
    import graft.operators.DistributedSelect
    // the customer-ordered cumulative weight is corpus-sized — `sum(w)
    // OVER (ORDER BY o_custkey)` would funnel every customer through one
    // task. o_custkey is already a unique non-negative long, so the
    // two-level prefix sum ranks it directly; the grand total rides a
    // broadcast 1-row aggregate. The oracle keeps the sequential window
    // spec — the hash match proves the decomposition.
    val spend = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(floor(round(sum(col("o_totalprice")), 2) * 100.0 + 0.5).cast("long").as("w"))
      .cache()
    val tot = spend.agg(sum(col("w")).as("total"))
    val g = DistributedSelect
      .globalPrefixSum(spend, "o_custkey", "w", "cum", 1L << 16)
      .crossJoin(broadcast(tot))
      .withColumn("hits",
        expr(s"($PpsSamples * cum) div total - ($PpsSamples * (cum - w)) div total"))
    g.filter(col("hits") > 0)
      .select(col("o_custkey"), col("w"), col("cum"), col("hits"))
      .orderBy(col("o_custkey"))
  }

  /** Cross-correlation (lags −3..+3) between the view and purchase
    * daily-revenue series — the lead-lag diagnostic behind "does
    * browsing traffic predict next-day purchases" marketing questions
    * (q185's ACF asks what a series knows about itself; this asks what
    * one series knows about another). Same integer-exact centering
    * (ỹ = n·x − T per series, computed on each series' OWN moments),
    * matched by calendar day via one day-shift join — lag k pairs
    * view(d) with purchase(d+k) — so the numerator is an exact long
    * sum; the denominator √(Σx̃²·Σỹ²) widens each factor to double
    * BEFORE multiplying (their product overflows a long even at these
    * SFs — the q162 discipline), and √ is IEEE-exact. */
  private val q189CrossCorrelation: Q = (s, dir) => {
    def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    def series(t: String) = Tables.events(s, dir)
      .filter(col("event_type") === t)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(floor(round(sum(col("value")), 2) + 0.5).cast("long").as("x"))
      .select(col("d"),
        (count(lit(1)).over(Window.partitionBy()) * col("x") -
          sum(col("x")).over(Window.partitionBy())).as("y"),
        sum(col("x") * col("x")).over(Window.partitionBy()).as("raw_sxx"))
    // sums of squares of the CENTERED series, exact longs
    def cent(df: org.apache.spark.sql.DataFrame) =
      df.select(col("d"), col("y"),
        sum(col("y") * col("y")).over(Window.partitionBy()).as("syy"))
    val vx = cent(series("view")).toDF("d", "xv", "sxx")
    val py = cent(series("purchase")).toDF("pd", "yp", "syy")
    val lags = vx.select(col("d"), col("xv"), col("sxx"),
      explode(sequence(lit(-3), lit(3))).as("lag"))
    lags.join(py, expr("date_add(d, lag)") === col("pd"))
      .groupBy(col("lag").cast("long").as("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        s6(sum(col("xv") * col("yp")).cast("double") /
          sqrt(max(col("sxx")).cast("double") * max(col("syy")).cast("double")))
          .as("ccf_micro"))
      .orderBy(col("lag"))
  }

  /** Additive seasonal decomposition (the moving-average half of
    * classical decompose / STL-lite): per event type, a centered 7-day
    * trend window over daily revenue, detrended values, and the
    * day-of-week seasonal index as the mean detrended value per dow.
    * Exactness: the trend stays a 7-day SUM (no division — the
    * detrended value scales to 7·x − trend₇, an exact long, the q185
    * cancellation trick applied to moving averages), only FULL windows
    * enter (edge effects excluded by the count guard, identically in
    * both engines), and the seasonal index is one double division of
    * exact integer sums, micro-floored. Windows per series + a bounded
    * (type × dow) aggregate; one events scan. */
  private val q190SeasonalDecompose: Q = (s, dir) => {
    def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(floor(round(sum(col("value")), 2) + 0.5).cast("long").as("x"))
    val w7 = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(-3, 3)
    val det = daily
      .withColumn("t7", sum(col("x")).over(w7))
      .withColumn("n7", count(lit(1)).over(w7))
      .filter(col("n7") === 7)
      .withColumn("det7", lit(7L) * col("x") - col("t7"))
      // Spark dayofweek is Sunday=1; shift to DuckDB's Sunday=0 (q164)
      .withColumn("dow", (dayofweek(col("d")) - 1).cast("long"))
    det.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_days"),
        s6(sum(col("det7")).cast("double") /
          (lit(7.0) * count(lit(1)).cast("double"))).as("seasonal_micro"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** Weighted exact quantiles via the two-phase selection — the
    * weighted-median primitive (robust price-level statistics where
    * each line counts by its QUANTITY, not once): smallest price whose
    * cumulative quantity share reaches q ∈ {0.5, 0.9}, rank = ⌈q·W⌉
    * over total weight W. Same two passes and bounded driver artifacts
    * as q187, with weight sums in place of counts ([[graft.operators
    * .DistributedSelect.kthWeighted]]); the oracle recomputes with the
    * full-sort cumulative-weight spec. */
  private val q191WeightedSelect: Q = (s, dir) => {
    import graft.operators.DistributedSelect
    val vw = Tables.lineitem(s, dir)
      .select(floor(round(col("l_extendedprice"), 2) * 100.0 + 0.5).cast("long").as("v"),
        col("l_quantity").cast("long").as("w"))
      .cache()
    val totalW = vw.agg(sum(col("w"))).head.getLong(0)
    val pcts = Seq(50L, 90L)
    val ks = pcts.map(p => p -> math.ceil(p / 100.0 * totalW).toLong).toMap
    val sel = DistributedSelect.kthWeighted(vw, ks.values.toSeq, width = 1000L)
    vw.unpersist() // scalar-result query: release the scan cache in-closure
    import s.implicits._
    pcts.map(p => (p, ks(p), sel(ks(p)))).toDF("pct", "k", "cents")
      .orderBy(col("pct"))
  }

  /** Multiset set operations — EXCEPT ALL / INTERSECT ALL (bag
    * semantics: multiplicities subtract and min, where q13's DISTINCT
    * forms collapse them): returned line order-keys vs high-discount
    * line order-keys at occurrence grain. Computed FROM THE
    * MULTIPLICITY ALGEBRA directly (r16, guide §2.3/§2.4): per key
    * with r copies on the left and d on the right, EXCEPT ALL yields
    * max(r−d, 0) copies and INTERSECT ALL min(r, d) — so ONE lineitem
    * scan + ONE partial-aggregated groupBy(l_orderkey) counting both
    * sides replaces the former four scans and two
    * replicate-and-generate set-op plans (Catalyst's exceptAll/
    * intersectAll rewrite), and the folded (count, checksum) outputs
    * are bit-identical — the oracle (real EXCEPT/INTERSECT ALL in
    * DuckDB) hash-proves the algebra. */
  private val q192MultisetOps: Q = (s, dir) => {
    val counts = Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("r"),
        when(col("l_discount") >= 0.05, 1L).otherwise(0L).as("d"))
      .filter(col("r") === 1L || col("d") === 1L)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("r")).as("r"), sum(col("d")).as("d"))
    val folded = counts.agg(
      coalesce(sum(greatest(col("r") - col("d"), lit(0L))), lit(0L)).as("ex_n"),
      coalesce(sum(col("l_orderkey") * greatest(col("r") - col("d"), lit(0L))), lit(0L))
        .as("ex_checksum"),
      coalesce(sum(least(col("r"), col("d"))), lit(0L)).as("in_n"),
      coalesce(sum(col("l_orderkey") * least(col("r"), col("d"))), lit(0L))
        .as("in_checksum"))
    // stack, not a self-union: a union of two selects over the same
    // aggregate plans the scan+agg subtree twice
    folded.select(expr("stack(2, 'except_all', ex_n, ex_checksum, " +
        "'intersect_all', in_n, in_checksum) AS (op, n, checksum)"))
      .orderBy(col("op"))
  }

  /** Composed time-series profile — the session's primitives as ONE
    * pipeline (the q85/q120/q137 composition discipline applied to the
    * time-series suite): per event type, from a single cached daily
    * aggregate, emit the OLS slope (q167's closed form), the CUSUM
    * peak and alarm count (q173's two windows), the lag-1
    * autocorrelation (q185's integer scaling), and the peak seasonal
    * day-of-week with its index (q190's detrended means, argmax by
    * (index desc, dow)). Every branch reads the SAME cached daily
    * frame — the fact pays one scan for the whole dashboard row — and
    * the four bounded per-type frames meet in broadcast joins. Each
    * metric is individually hash-exact (their component queries prove
    * it); this gate proves they stay exact COMPOSED. */
  private val q193TimeseriesProfile: Q = (s, dir) => {
    def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(floor(round(sum(col("value")), 2) + 0.5).cast("long").as("y"))
      .cache()
    val byType = Window.partitionBy(col("event_type"))
    val ordered = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val pre = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // q167 branch: slope
    val idx = daily.withColumn("x",
      datediff(col("d"), min(col("d")).over(byType)).cast("long"))
    val trend = idx.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      .select(col("event_type"), col("n"),
        s6((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          nullif((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
            lit(0.0))).as("slope_micro"))
    // q173 branch: CUSUM peak + alarms
    val cu = daily
      .withColumn("target", expr("sum(y) over (partition by event_type) div " +
        "count(*) over (partition by event_type)"))
      .withColumn("p", sum(col("y") - col("target")).over(pre))
      .withColumn("s", col("p") - least(lit(0L), min(col("p")).over(pre)))
      .groupBy(col("event_type"))
      .agg(max(col("s")).as("max_cusum"),
        sum(when(col("s") > col("target"), 1L).otherwise(0L)).as("n_alarm_days"))
    // q185 branch: lag-1 ACF
    val cent = daily
      .withColumn("yc", count(lit(1)).over(byType) * col("y") - sum(col("y")).over(byType))
      .withColumn("y1", lead(col("yc"), 1).over(ordered))
      .withColumn("syy", sum(col("yc") * col("yc")).over(byType))
    val acf = cent.filter(col("y1").isNotNull)
      .groupBy(col("event_type"))
      .agg(s6(sum(col("yc") * col("y1")).cast("double") /
        max(col("syy")).cast("double")).as("acf1_micro"))
    // q190 branch: peak seasonal dow
    val w7 = ordered.rowsBetween(-3, 3)
    val season = daily
      .withColumn("t7", sum(col("y")).over(w7))
      .withColumn("n7", count(lit(1)).over(w7))
      .filter(col("n7") === 7)
      .withColumn("dow", (dayofweek(col("d")) - 1).cast("long"))
      .withColumn("det7", lit(7L) * col("y") - col("t7"))
      .groupBy(col("event_type"), col("dow"))
      .agg(s6(sum(col("det7")).cast("double") /
        (lit(7.0) * count(lit(1)).cast("double"))).as("sdow"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("sdow").desc, col("dow"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("dow").as("peak_dow"),
        col("sdow").as("peak_seasonal_micro"))
    trend
      .join(broadcast(cu), "event_type")
      .join(broadcast(acf), "event_type")
      .join(broadcast(season), "event_type")
      .orderBy(col("event_type"))
  }

  /** LATERAL correlated subquery — the remaining ANSI SQL-surface
    * decorrelation shape after q168's scalar and q172's EXISTS: a
    * per-row dependent TABLE subquery (top-2 orders per BUILDING
    * customer by price). Catalyst plans LATERAL + correlated LIMIT via
    * its lateral-join rewrite; the spec pins the result against the
    * window-function formulation (rank ≤ 2 per customer), which is the
    * hand rewrite a user would reach for — proving the two front doors
    * agree. Deterministic (price desc, orderkey) order inside the
    * lateral body keeps ties identical across engines. */
  private val q195Lateral: Q = (s, dir) => {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    s.sql(
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM v_customer,
        |LATERAL (SELECT o_orderkey, o_totalprice
        |         FROM v_orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         LIMIT 2) t
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
  }

  /** Unpivot/melt — the inverse of q62's pivot: wide metric columns to
    * long (metric, value) rows via the native `Dataset.unpivot` (a
    * Generate-free Expand, one output row per metric per input row,
    * scan-shaped). The oracle restates it as a UNION ALL of per-metric
    * aggregates. */
  private val q109Unpivot: Q = (s, dir) => {
    Tables.part(s, dir)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size").cast("double").as("p_size"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_retailprice"), col("p_size")), "metric", "val")
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n"), round(sum(col("val")), 2).as("sum_val"))
      .orderBy(col("metric"))
  }

  private val q98Zorder: Q = (s, dir) => {
    import graft.operators.ZOrder
    val li = Tables.lineitem(s, dir).select(col("l_partkey"), col("l_suppkey"))
    val b = li.agg(
      min(col("l_partkey")).cast("double"), max(col("l_partkey")).cast("double"),
      min(col("l_suppkey")).cast("double"), max(col("l_suppkey")).cast("double")).head()
    val z = ZOrder.zValue(
      ZOrder.minMaxNormalize(col("l_partkey"), b.getDouble(0), b.getDouble(1)),
      ZOrder.minMaxNormalize(col("l_suppkey"), b.getDouble(2), b.getDouble(3)))
    li.withColumn("z", z)
      .groupBy(shiftright(col("z"), 24).as("z_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("z")).as("z_sum"))
      .orderBy(col("z_bucket"))
  }

  /** The co-located join q201 aggregates over — exposed (package-level)
    * so BucketedJoinSpec can pin the plan of the JOIN itself: both scans
    * bucketed, sort-merge join, ZERO Exchange below the join. The
    * aggregate above it legitimately shuffles on its own grouping key. */
  private[graft] def bucketedJoinFrame(s: SparkSession, dir: String): DataFrame = {
    // tag carries the JVM pid besides the sfDir hash: the fixture lives
    // under the shared java.io.tmpdir, and ensure()'s fresh-session
    // cleanup (delete + rewrite) is not safe against a CONCURRENT
    // session reading the same path — two sbt JVMs on one sfDir raced
    // exactly that way (FILE_NOT_EXIST mid-scan, r15). Per-JVM paths
    // trade a one-time rewrite per session for full isolation; a real
    // deployment's bucketed tables live in a managed warehouse, not tmp.
    val tag = (dir.hashCode & 0x7fffffff).toString + "_" +
      ProcessHandle.current().pid().toString
    val oT = s"graft_bkt_orders_$tag"
    val lT = s"graft_bkt_lineitem_$tag"
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft-bucketed-$tag")
    def ensure(name: String, df: DataFrame, key: String): Unit =
      if (!s.catalog.tableExists(name)) {
        val path = base.resolve(name)
        // fresh session: clear files a previous session's table left behind
        if (java.nio.file.Files.exists(path)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(path).iterator().asScala.toSeq
            .sortBy(-_.getNameCount).foreach(java.nio.file.Files.delete(_))
        }
        // repartition on the bucket key first so every bucket lands in ONE
        // file — which is also what lets the reader trust sortBy order
        df.repartition(8, col(key))
          .write.mode("overwrite")
          .option("path", path.toString)
          .bucketBy(8, key).sortBy(key)
          .saveAsTable(name)
      }
    ensure(oT, Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
      "o_orderkey")
    ensure(lT, Tables.lineitem(s, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount"), "l_orderkey")
    // merge hint: the point is the co-located sort-merge join, not a
    // broadcast that would hide the bucketing (orders fits under the
    // broadcast threshold at small SFs — at 100 TB neither side does).
    // The defensive per-bucket Sort the planner still inserts is cheap
    // (already-sorted runs) and disappears entirely under
    // spark.sql.legacy.bucketedTableScan.outputOrdering=true — the write
    // path keeps the one-file-per-bucket precondition that conf needs
    // (BucketedJoinSpec pins the sort-free plan)
    s.table(lT).join(s.table(oT).hint("merge"),
      col("l_orderkey") === col("o_orderkey"))
  }

  /** Bucketed warehouse tables + shuffle-free co-located join — the
    * pre-partitioning answer to "this fact-fact join shuffles 100 TB
    * every night": pay the orderkey shuffle ONCE at write time
    * (`bucketBy` persists the hash partitioning into the table layout),
    * and every subsequent join on the bucket key reads both sides
    * already co-located — the scans satisfy the join's required
    * distribution, so Catalyst plans the sort-merge join with ZERO
    * Exchange (BucketedJoinSpec pins the executed plan). Tables are
    * external under java.io.tmpdir, memoized per sfDir via the catalog,
    * so Bench reps and spec reruns pay the write once. Revenue lands on
    * an exact integer grid per line (cents × residual percent) BEFORE
    * the sum, so the aggregate is an exact long both engines reproduce
    * bit-for-bit — and bucketing-invariance of the result is exactly
    * what the raw-parquet DuckDB oracle checks. */
  private val q201BucketedJoin: Q = (s, dir) => {
    val cents = floor(round(col("l_extendedprice"), 2) * 100.0 + 0.5).cast("long")
    val dPct = floor(round(col("l_discount"), 2) * 100.0 + 0.5).cast("long")
    bucketedJoinFrame(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(cents * (lit(100L) - dPct)).as("rev_c4"))
      .orderBy(col("o_orderpriority"))
  }

  /** Weighted systematic sampling at corpus scale — q188's Madow PPS
    * selector re-hosted for mixture construction ("sample k documents
    * proportional to size") with the global-sort window replaced by the
    * two-phase machinery, the q199/q200 twin discipline applied to
    * sampling: thresholds t_j = j·W/k for j = 1..k over the cumulative
    * weight in a fixed doc order; row i is drawn with multiplicity
    * ⌊cum_i·k/W⌋ − ⌊(cum_i−w_i)·k/W⌋ — every comparison is integer
    * floor-division, so the draw is exact and replayable on any engine
    * (no RNG, no float thresholds), Σmult = k exactly, and any doc with
    * w ≥ W/k is guaranteed in. The cumulative weight comes from
    * [[graft.operators.DistributedSelect.globalPrefixSum]] — the
    * two-level prefix sum, NOT `sum() OVER (ORDER BY …)`'s single-task
    * global sort (q188 documents that degrade; this exercises the scale
    * path): one bounded histogram pass + per-bucket windows, driver
    * artifacts limited to the bucket offsets and the 1-row total. */
  private val q202WeightedSample: Q = (s, dir) => {
    import graft.operators.DistributedSelect
    val k = 500L
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), (col("n_chars") + lit(1L)).as("w"))
    // bounded driver artifact: the 1-row total weight
    val tot = docs.agg(sum(col("w"))).head().getLong(0)
    DistributedSelect.globalPrefixSum(docs, "doc_id", "w", "cum", 4096L)
      .withColumn("mult",
        expr(s"(cum * $k) div $tot - ((cum - w) * $k) div $tot"))
      .filter(col("mult") > 0L)
      .select(col("doc_id"), col("w"), col("mult"))
      .orderBy(col("doc_id"))
  }

  /** Temperature-reweighted hierarchical mixture draw — the data-recipe
    * sampler behind "sample sources proportional to |D_s|^α" (the
    * mixture-weight convention of the large-LM corpus recipes; α < 1
    * upweights small sources so the head corpus doesn't drown them),
    * here α = 0.5 over k = 1000 draws. Stage 1 on the BOUNDED source
    * grid: per-source weights W_s, temperature scaling
    * w̃_s = ⌊√W_s·10⁶ + 0.5⌋ — IEEE-754 sqrt is correctly rounded, so
    * the micro-grid long is the identical integer on both engines —
    * then exact Hamilton allocation of the k draws over w̃ (the q186
    * apportionment: integer base ⌊k·w̃/T⌋, leftovers to largest
    * remainders under a deterministic order; Σk_s = k provably).
    * Stage 2 inside each source: Madow systematic selection of its k_s
    * docs proportional to size (the q188/q202 integer crossing counts)
    * over the per-source cumulative weight — a window PARTITIONED by
    * source, so the parallel axis IS the mixture axis; a monster
    * source's slice rides [[graft.operators.DistributedSelect
    * .globalPrefixSum]] (q202's machinery) before this window would
    * bottleneck. Every stage is integer-exact, so the full hierarchical
    * draw — which sources, which docs, what multiplicities — is
    * replayable bit-for-bit on any engine with no RNG anywhere. */
  private val MixtureDraws = 1000L
  private val q203TempMixture: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), (col("n_chars") + lit(1L)).as("w"))
    val srcW = d.groupBy(col("source")).agg(sum(col("w")).as("ws"))
      .withColumn("wt",
        floor(sqrt(col("ws").cast("double")) * 1e6 + 0.5).cast("long"))
    // deliberate global windows over the bounded source grid (the q186
    // discipline: |sources| rows, not data-sized)
    val g = srcW
      .withColumn("t", sum(col("wt")).over(Window.partitionBy()))
      .withColumn("base", expr(s"($MixtureDraws * wt) div t"))
      .withColumn("rem", lit(MixtureDraws) * col("wt") - col("base") * col("t"))
    val leftover = lit(MixtureDraws) - sum(col("base")).over(Window.partitionBy())
    val alloc = g.withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))).cast("long"))
      .withColumn("ks", col("base") + when(col("rk") <= leftover, 1L).otherwise(0L))
      .select(col("source").as("a_source"), col("ks"), col("ws"))
    val bySrc = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(broadcast(alloc), col("source") === col("a_source"))
      .withColumn("cum", sum(col("w")).over(bySrc))
      .withColumn("mult", expr("(cum * ks) div ws - ((cum - w) * ks) div ws"))
      .filter(col("mult") > 0L)
      .select(col("source"), col("doc_id"), col("w"), col("mult"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** PromQL evaluation semantics under the DuckDB oracle — the
    * monitoring tier's windows cross-checked engine-to-engine, not just
    * spec'd: a per-(event_type, day) COUNTER series derived from the
    * events table (cumulative daily counts = one scrape per day), run
    * through [[graft.api.AlertRules.increaseSignalPerSeries]] — the
    * SAME code path the alert rules and dashboard serve — with a 3-day
    * trailing increase window, a data-derived integer threshold
    * (3·total_type div n_days: ≈3× the mean daily rate, so the
    * predicate flips on real traffic variation at every SF), and the
    * `for:` 2-day island machinery ([[graft.api.AlertRules.withState]])
    * per series. Output is every tick's (signal, state) — the full
    * evaluation surface, not just edges, so the hash pins pending vs
    * firing boundaries and the absent-sample (gap day) behavior too.
    * All arithmetic is integer counts; the only doubles are exact
    * integer-valued sums. Per-series axes partition every window; the
    * per-type threshold collect is bounded by |event types|. */
  private val q204PromqlEval: Q = (s, dir) => {
    import graft.api.AlertRules
    val ev = Tables.events(s, dir)
    val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val series = daily
      .withColumn("value", sum(col("n")).over(wCum).cast("double"))
      .select(col("d").cast("timestamp").as("ts"),
        lit("events_total").as("metric"),
        col("event_type").as("labels"), col("value"))
    val inc = AlertRules.increaseSignalPerSeries(series, "events_total",
      windowSec = 3L * 86400L, labelPred = lit(true))
    // bounded driver artifacts: one threshold per event type + n_days
    val nDays = ev.select(countDistinct(to_date(col("ts")))).head().getLong(0)
    val thresholds = daily.groupBy(col("event_type")).agg(sum(col("n")).as("t"))
      .collect().map(r => (r.getString(0), 3L * r.getLong(1) / nDays)).sortBy(_._1)
    thresholds.map { case (tpe, thr) =>
      AlertRules.withState(
          inc.filter(col("labels") === tpe).select(col("ts"), col("inc").as("v")),
          col("v") > thr, forSeconds = 2L * 86400L)
        // day boundary as a TIMESTAMP: a DATE column round-trips as a
        // python object in the comparator while DuckDB hands back
        // datetime64 — the established timestamp form compares cleanly
        .select(lit(tpe).as("event_type"), col("ts").as("day"),
          col("v").cast("long").as("v"), col("state"))
    }.reduce(_ unionByName _)
      .orderBy(col("event_type"), col("day"))
  }

  /** q182's documented degrade, EXERCISED exactly — the steepest scaling
    * entry in the round-10 curve (5.1× on 10× data: its global ntile(16)
    * window funnels every row through one sort task) replaced by the
    * two-phase rank, the q199/q200 twin discipline: pack (price cents,
    * orderkey, linenumber) into ONE unique long key — the cent grid is
    * a faithful order embedding because prices sit on exact cents (the
    * distinct-price gap ≥ 1 cent dwarfs float noise ~1e-9), and the
    * (orderkey, linenumber) tiebreak matches q182's ORDER BY exactly —
    * rank via [[graft.operators.DistributedSelect.globalRowNumber]],
    * bucket via [[graft.operators.DistributedSelect.ntileFromRank]],
    * then the same bounded 16-row aggregate. Caps require()-guarded;
    * boundary-straddling ties land exactly where the window put them,
    * by construction. Output bit-identical to q182 (shared oracle +
    * TwoPhaseParitySpec). */
  private val q205EquidepthTwophase: Q = (s, dir) => {
    import graft.operators.DistributedSelect
    val li = Tables.lineitem(s, dir)
      .select(
        floor(round(col("l_extendedprice"), 2) * 100.0 + 0.5).cast("long").as("cents"),
        col("l_extendedprice").as("v"),
        col("l_orderkey"), col("l_linenumber").cast("long").as("ln"))
      .cache() // query-scoped: released by the runner's clearCache (q37 contract)
    val g = li.agg(max(col("cents")), max(col("l_orderkey")), max(col("ln")),
      count(lit(1))).head()
    val (mc, mo, ml, n) = (g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3))
    val L = ml + 1L
    val tieMax = mo * L + ml
    val M = java.lang.Long.highestOneBit(tieMax) * 2L
    require(M > tieMax && mc < Long.MaxValue / M,
      "packed-key caps exceeded — widen the key packing")
    val keyed = li.withColumn("k", col("cents") * M + col("l_orderkey") * L + col("ln"))
    val ranked = DistributedSelect.globalRowNumber(keyed, "k", "rnk", M * 1000L)
    ranked
      .withColumn("bucket", DistributedSelect.ntileFromRank(col("rnk"), n, 16).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("v")).as("lo"),
        max(col("v")).as("hi"),
        countDistinct(col("v")).as("ndv"))
      .orderBy(col("bucket"))
  }

  /** Trace analytics under the DuckDB oracle — the
    * [[graft.api.Tracing.selfTimeBreakdown]] join+aggregate semantics
    * cross-checked engine-to-engine on a deterministic span forest
    * derived from the events table: each (user, day) is one TRACE whose
    * root "session" span covers [first event, last event + 1 h] and
    * whose children are the events themselves, one span per event named
    * by its type with duration `value` seconds on the exact micro grid.
    * Self time = duration − Σ direct children (async children may
    * overlap, so a root's self time can legitimately go negative — the
    * oracle pins that too, not just the friendly case). All longs, no
    * floats: starts/ends are epoch micros, durations integer micros.
    * Scale shape: one child-sum join + one aggregate keyed on the trace
    * axis — the span table is an ordinary event fact table. */
  private val q206TraceBreakdown: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("sec"), to_date(col("ts")).as("d"),
        floor(col("value") * 1e6 + 0.5).cast("long").as("dur_us"))
    val roots = ev.groupBy(col("user_id"), col("d"))
      .agg(min(col("sec")).as("t0"), max(col("sec")).as("t1"))
      .select(
        concat_ws(":", col("user_id"), col("d")).as("trace_id"),
        concat_ws(":", lit("root"), col("user_id"), col("d")).as("span_id"),
        lit("").as("parent_id"), lit("session").as("name"),
        (col("t0") * 1000000L).as("start_us"),
        ((col("t1") + 3600L) * 1000000L).as("end_us"))
    val children = ev.select(
      concat_ws(":", col("user_id"), col("d")).as("trace_id"),
      concat_ws(":", lit("e"), col("event_id")).as("span_id"),
      concat_ws(":", lit("root"), col("user_id"), col("d")).as("parent_id"),
      col("event_type").as("name"),
      (col("sec") * 1000000L).as("start_us"),
      (col("sec") * 1000000L + col("dur_us")).as("end_us"))
    graft.api.Tracing.selfTimeBreakdown(roots.unionByName(children))
      .orderBy(col("name"))
  }

  /** Kernel density estimate of the order-amount distribution — the
    * curve the reference's EDA overlays on its amount histogram
    * (eda.py:31-35, `sns.histplot(df['Amount'], kde=True)` →
    * amount_distribution.png); q18's histogram is the bars, this is the
    * smooth density. Epanechnikov kernel K(z) = 0.75·(1−z²) on |z| ≤ 1 —
    * the MSE-optimal kernel, and (the cross-engine point) a POLYNOMIAL:
    * given bit-identical z both engines produce bit-identical K, where a
    * Gaussian kernel's exp() differs by ulps across libms. Everything
    * upstream of K is integer: prices on the cent grid, a 64-point grid
    * and bandwidth h = range/8 derived by integer division, z one IEEE
    * division of identical longs. Each kernel term floors onto a 1e−12
    * grid and sums as exact longs (the q133 fixed-point discipline), so
    * the mass column hash-matches exactly; the normalized density is one
    * division of identical integers. Scale shape: two aggregates for the
    * stats, then a 64-row BROADCAST grid range-joined to the fact (each
    * row meets ~17 grid points inside the kernel support) collapsing
    * map-side into ≤64 groups — no shuffle wider than the grid. */
  private val q209KdeAmount: Q = (s, dir) => {
    import s.implicits._
    val cents = Tables.orders(s, dir)
      .select(floor(round(col("o_totalprice"), 2) * 100.0 + 0.5)
        .cast("long").as("c"))
    val st = cents.agg(count(lit(1)).as("n"),
      min(col("c")).as("lo"), max(col("c")).as("hi")).collect()(0)
    val (n, lo, hi) = (st.getLong(0), st.getLong(1), st.getLong(2))
    val h = math.max(1L, (hi - lo) / 8)
    val grid = (0L until 64L).map(j => (j, lo + (hi - lo) * j / 63L))
      .toDF("j", "grid_cents")
    val z = (col("c") - col("grid_cents")).cast("double") / lit(h.toDouble)
    cents.join(broadcast(grid), abs(col("c") - col("grid_cents")) <= h)
      .select(col("j"), col("grid_cents"),
        floor(lit(0.75) * (lit(1.0) - z * z) * lit(1e12)).cast("long").as("t"))
      .groupBy(col("j"), col("grid_cents"))
      .agg(sum(col("t")).as("kde_mass"))
      // empty-support grid points (a gap in the distribution wider than
      // h) still emit a zero row — join back to the full spine
      .join(grid, Seq("j", "grid_cents"), "right")
      .select(col("j"), col("grid_cents"),
        coalesce(col("kde_mass"), lit(0L)).as("kde_mass"),
        (coalesce(col("kde_mass"), lit(0L)).cast("double")
          / lit(n.toDouble * h.toDouble * 1e12)).as("density"))
      .orderBy(col("j"))
  }

  /** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter,
    * JASA 1969; Newcombe et al., Science 1959) with multi-pass blocking
    * (Hernández & Stolfo's merge/purge discipline) — the entity-
    * resolution canon the reference's fraud domain lives on (is this
    * cardholder the same person as that account?), and equally the
    * author/entity-dedup step of a training-data pipeline. Two "source
    * systems" are derived deterministically from customer: file A is the
    * clean roster; file B drops every 7th entity (never entered) and
    * degrades the rest keyed on `id % 10` — a name typo (<2), a 7-cent
    * balance drift (2,3), a lost segment (4), a miskeyed nation (5).
    * Blocking: candidate pairs must share (nation, $10-balance-band) in
    * EITHER of two half-band-offset passes — the standard two-pass OR
    * that keeps the band-boundary straddle (a drifted balance crossing a
    * band edge) from being lost, while bounding the pair space to
    * block-sized equi-joins (never all-pairs; each pass is a plain
    * shuffle join on its compound key, and a hot block would salt like
    * any skewed join key). Agreement vector per candidate: name exact,
    * balance within ±10 cents, segment exact. Field weights are the FS
    * log-likelihood ratios log2(m/u) / log2((1-m)/(1-u)) for published-
    * style priors (name m=.95 u=.001 → +9.892/−4.320; balance m=.90
    * u=.01 → +6.492/−3.307; segment m=.98 u=.20 → +2.293/−5.322),
    * milli-scaled to EXACT LONGS so every score is integer arithmetic —
    * the cross-engine contract. Three-way decision at the classic two
    * thresholds (≥10000 match, ≥0 possible/clerical-review, else
    * nonmatch): a name typo demotes its true pair to `possible`, the
    * balance drift stays `match` (inside tolerance), the lost segment
    * stays `match` (outweighed), the miskeyed nation is lost by
    * blocking — the honest blocking-recall cost, visible as missing
    * n_true. Ground truth rides along (ids are preserved), so the
    * output is the per-decision confusion: pairs, true-entity pairs,
    * score range. Scale shape: two equi-joins + one dedup + one
    * map-side-combinable aggregate; weights are literals; nothing
    * driver-side. */
  private val q210EntityResolution: Q = (s, dir) => {
    val base = Tables.customer(s, dir).select(
      col("c_custkey").cast("long").as("id"),
      col("c_name").as("name"),
      col("c_nationkey").cast("long").as("nation"),
      floor(round(col("c_acctbal"), 2) * 100.0 + 0.5).cast("long").as("cents"),
      col("c_mktsegment").as("seg"))
    def band(cents: Column, off: Long): Column =
      floor((cents + lit(100000L + off)).cast("double") / 1000.0).cast("long")
    val a = base.select(
      col("id").as("a_id"), col("name").as("a_name"),
      col("nation").as("a_nation"), col("cents").as("a_cents"),
      col("seg").as("a_seg"),
      band(col("cents"), 0L).as("a_b1"), band(col("cents"), 500L).as("a_b2"))
    val pct = col("id") % 10
    val b = base
      .filter(col("id") % 7 =!= 0)
      .select(
        col("id").as("b_id"),
        when(pct < 2, concat(col("name"), lit("X"))).otherwise(col("name")).as("b_name"),
        when(pct === 5, (col("nation") + 1) % 25).otherwise(col("nation")).as("b_nation"),
        when(pct.isin(2L, 3L), col("cents") + 7L).otherwise(col("cents")).as("b_cents"),
        when(pct === 4, lit("UNKNOWN")).otherwise(col("seg")).as("b_seg"))
      .withColumn("b_b1", band(col("b_cents"), 0L))
      .withColumn("b_b2", band(col("b_cents"), 500L))
    // the OR-of-passes as two equi-joins + dedup: each pass shuffles on
    // its own compound key instead of degrading to a nested-loop OR-join
    val keep = Seq("a_id", "b_id", "a_name", "b_name", "a_cents", "b_cents",
      "a_seg", "b_seg").map(col)
    val p1 = a.join(b, col("a_nation") === col("b_nation") &&
      col("a_b1") === col("b_b1")).select(keep: _*)
    val p2 = a.join(b, col("a_nation") === col("b_nation") &&
      col("a_b2") === col("b_b2")).select(keep: _*)
    val cand = p1.unionByName(p2).dropDuplicates("a_id", "b_id")
    val score =
      when(col("a_name") === col("b_name"), 9892L).otherwise(-4320L) +
      when(abs(col("a_cents") - col("b_cents")) <= 10L, 6492L).otherwise(-3307L) +
      when(col("a_seg") === col("b_seg"), 2293L).otherwise(-5322L)
    cand.withColumn("score", score)
      .withColumn("decision",
        when(col("score") >= 10000L, "match")
          .when(col("score") >= 0L, "possible").otherwise("nonmatch"))
      .groupBy(col("decision"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("a_id") === col("b_id"), 1L).otherwise(0L)).as("n_true"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"))
      .orderBy(col("decision"))
  }

  /** HyperLogLog cardinality sketch (Flajolet et al., AofA 2007) with
    * EXACT cross-engine registers — the mergeable distinct-count
    * machinery every 100 TB profile needs (unique users per day, unique
    * cards per merchant) where exact `count(DISTINCT)` means a full
    * shuffle of every key. The whole sketch is integer arithmetic both
    * engines reproduce bit-for-bit: h = rolling_hash(key) ∈ [0, 1e9+7),
    * then the published 31-bit avalanche finalizer (Wang-style
    * xor-shift-multiply: x ^= x»16; x = x·0x45d9f3b mod 2^31, twice,
    * final x ^= x»16 — every op exact int64 in both engines; without it
    * the polynomial hash of short sequential keys is a lattice mod 256
    * and the sketch reads 40%+ high). Register j = h mod 256 (p=8,
    * m=256); the remaining w = h div 256 < 2^23 yields rank
    * ρ = 24 − bitlen(w) (24 when w=0) via `length(bin(w))` — identical
    * minimal-binary semantics in Spark (Hive `bin`) and DuckDB.
    * Register vector M[j] = max ρ; the harmonic
    * denominator is EXACT LONGS: Σ 2^(30−M[j]) + empties·2^30 (every
    * term a long power of two, sum < 2^38). Only the final estimate
    * α₂₅₆·m²·2^30/denom touches doubles — one constant-folded chain of
    * correctly-rounded IEEE ops, floored to the micro grid. Two scopes
    * exercise both regimes: unique line ids (dense, every register hit)
    * and part keys (duplicate-heavy; sparse at sf0.001 → empty-register
    * path live). Mergeability is structural: the impl computes registers
    * per shard (w mod 4) then max-merges — the exact shape of a
    * partial-aggregate shard merge across 1000 executors — and max's
    * associativity makes it equal the oracle's direct max. Scale shape:
    * one map-side-combinable max aggregate to ≤ m·shards rows, then a
    * 256-row rollup; the exact `n_exact`/`count(DISTINCT)` column rides
    * along as the accuracy witness (it is the thing the sketch replaces
    * at scale). Raw estimator only — the linear-counting small-range
    * correction needs ln(), which is not correctly-rounded-guaranteed
    * cross-engine; the spec applies it driver-side and checks accuracy. */
  private val q211HllCardinality: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val keys = li.select(lit("line_ids").as("scope"),
        concat(col("l_orderkey").cast("string"), lit("#"),
          col("l_linenumber").cast("string")).as("k"))
      .unionByName(li.select(lit("part_keys").as("scope"),
        col("l_partkey").cast("string").as("k")))
    val ranked = keys
      .select(col("scope"), col("k"),
        graft.llm.TextOps.rollingHash(col("k")).as("h0"))
      .withColumn("h1", expr("(h0 ^ shiftright(h0, 16)) * 73244475 % 2147483648"))
      .withColumn("h2", expr("(h1 ^ shiftright(h1, 13)) * 73244475 % 2147483648"))
      .withColumn("h", expr("h2 ^ shiftright(h2, 16)"))
      .select(col("scope"), col("k"),
        pmod(col("h"), lit(256L)).as("reg"), expr("h div 256").as("w"))
      .withColumn("rnk", when(col("w") === 0L, lit(24L))
        .otherwise(lit(24L) - length(bin(col("w"))).cast("long")))
    // shard-merge shape: per-shard registers, then max-merge — what a
    // 1000-executor partial aggregate does; max associativity = oracle's
    // direct max over the same rows
    val regs = ranked
      .groupBy(col("scope"), pmod(col("w"), lit(4L)).as("shard"), col("reg"))
      .agg(max(col("rnk")).as("m"))
      .groupBy(col("scope"), col("reg")).agg(max(col("m")).as("m"))
    val perScope = regs.groupBy(col("scope")).agg(
      count(lit(1)).as("regs_used"),
      sum(col("m")).as("sum_rank"),
      max(col("m")).as("max_rank"),
      sum(expr("shiftleft(cast(1 as bigint), cast(30 - m as int))")).as("denom_present"))
    val nx = ranked.groupBy(col("scope"))
      .agg(countDistinct(col("k")).as("n_exact"))
    perScope.join(nx, "scope")
      .withColumn("denom",
        col("denom_present") + (lit(256L) - col("regs_used")) * lit(1073741824L))
      .select(col("scope"), col("n_exact"), col("regs_used"), col("sum_rank"),
        col("max_rank"), col("denom"),
        floor(lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0)
          * lit(1073741824.0) / col("denom").cast("double") * lit(1e6) + lit(0.5))
          .cast("long").as("est_micro"))
      .orderBy(col("scope"))
  }

  /** Count-Min sketch (Cormode & Muthukrishnan, J.Alg 2005) point
    * queries with EXACT cross-engine counters — q211's frequency twin
    * and the sketch side of q191's Misra–Gries heavy hitters: per-key
    * event counts estimated from a d=4 × w=512 counter array whose size
    * never depends on N. Everything is integer arithmetic shared by
    * both engines: row j's hash is the q211 Wang-mixed rolling hash of
    * "j:uid" (the seed-prefix trick gives 4 independent rows from one
    * hash family) bucketed mod 512; counters are plain sums — which is
    * exactly why CMS is the distributed/streaming canon: sum-mergeable
    * across executors and micro-batches with no order sensitivity
    * (conservative update, the non-mergeable variant, is deliberately
    * NOT used). Point query = min over the 4 row counters; the query
    * set is deterministic (every 7th uid, plus three absent ids whose
    * true count is 0) and the output carries exact_n alongside est_n so
    * the one-sided error contract (est ≥ exact, overshoot ≤ e/w·N with
    * the usual probability) is visible in the result itself. Scale
    * shape: events collapse to key grain in one map-side-combinable
    * aggregate, the sketch build is a second tiny aggregate to ≤ 2048
    * rows, and the probe is a broadcast-sized join — nothing driver-
    * side, nothing proportional to N but the first scan. */
  private val q212CountMin: Q = (s, dir) => {
    import s.implicits._
    def cms(df: DataFrame, key: Column): DataFrame = df
      .withColumn("cm0", graft.llm.TextOps.rollingHash(
        concat(col("j").cast("string"), lit(":"), key.cast("string"))))
      .withColumn("cm1", expr("(cm0 ^ shiftright(cm0, 16)) * 73244475 % 2147483648"))
      .withColumn("cm2", expr("(cm1 ^ shiftright(cm1, 13)) * 73244475 % 2147483648"))
      .withColumn("bkt", expr("(cm2 ^ shiftright(cm2, 16)) % 512"))
      .drop("cm0", "cm1", "cm2")
    val js = array((0 until 4).map(j => lit(j.toLong)): _*)
    val counts = Tables.events(s, dir)
      .groupBy(col("user_id").cast("long").as("uid"))
      .agg(count(lit(1)).as("n"))
    val sketch = cms(counts.select(col("uid"), col("n"), explode(js).as("j")), col("uid"))
      .groupBy(col("j"), col("bkt")).agg(sum(col("n")).as("c"))
    val qk = counts.filter(col("uid") % 7 === 0)
      .select(col("uid"), col("n").as("exact_n"))
      .unionByName(Seq((-1L, 0L), (-2L, 0L), (1000000007L, 0L)).toDF("uid", "exact_n"))
    cms(qk.select(col("uid"), col("exact_n"), explode(js).as("j")), col("uid"))
      .join(sketch, Seq("j", "bkt"), "left")
      .groupBy(col("uid"), col("exact_n"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est_n"))
      .withColumn("overcount", col("est_n") - col("exact_n"))
      .orderBy(col("uid"))
  }

  /** Bitmap-index retention — the groupBitmap/roaring canon of the
    * OLAP warehouses: day-over-day retained users computed EXACTLY via
    * word-aligned bitmap AND, never by joining raw events. Each (day,
    * word) row packs up to 63 users into one long (w = uid div 63, bit
    * = uid mod 63 — 63-bit words because a shift into the sign bit is
    * an overflow error in DuckDB, and staying positive keeps bit_count
    * semantics trivially identical cross-engine); the per-day bitmap is
    * a `bit_or` aggregate, which is what makes it DISTRIBUTED: OR is
    * idempotent-mergeable, so executors build partial bitmaps map-side
    * and the shuffle carries |uids|/63 words per day instead of event
    * rows, and duplicate events cost nothing. Retention joins day d's
    * words with day d+1's on (day, word) — a join whose size is words,
    * not users — and popcounts the AND; actives are popcount sums. At
    * 100 TB this is the difference between a user-level self-join of
    * two daily scans and a ~16M-row word join for a billion users.
    * Output: per consecutive-day pair, actives, next-day actives,
    * retained, and the floored-micro retention rate — all exact longs
    * (popcounts of identical words) plus one floor-form division. */
  private val q213BitmapRetention: Q = (s, dir) => {
    // word packing shifts user_id into bit position uid % 63: a negative
    // id would shift into/through the sign bit (silent two's-complement
    // in Spark, overflow error in DuckDB). Filter — matched in the
    // oracle — so the bucket/word parity contract is explicit instead of
    // an undocumented precondition (the q211 h >= 0 discipline).
    val dw = Tables.events(s, dir)
      .filter(col("user_id") >= 0)
      .select(date_trunc("day", col("ts")).as("d"),
        expr("cast(user_id as bigint) div 63").as("w"),
        expr("shiftleft(cast(1 as bigint), cast(cast(user_id as bigint) % 63 as int))").as("bit"))
      .groupBy(col("d"), col("w")).agg(expr("bit_or(bit)").as("bm"))
    val tot = dw.groupBy(col("d")).agg(sum(bit_count(col("bm"))).as("n_active"))
    val nxt = dw.select((col("d") - expr("INTERVAL 1 DAY")).as("d"),
      col("w"), col("bm").as("bm_next"))
    val ret = dw.join(nxt, Seq("d", "w"))
      .groupBy(col("d"))
      .agg(sum(bit_count(expr("bm & bm_next"))).as("n_retained"))
    val totNext = tot.select((col("d") - expr("INTERVAL 1 DAY")).as("d"),
      col("n_active").as("n_next"))
    tot.join(totNext, Seq("d"))
      .join(ret, Seq("d"), "left")
      .select(col("d"), col("n_active"), col("n_next"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        floor(coalesce(col("n_retained"), lit(0L)).cast("double")
          / col("n_active").cast("double") * 1e6 + 0.5).cast("long").as("ret_micro"))
      .orderBy(col("d"))
  }

  /** HDR (log-scale) histogram quantiles — the latency-observability
    * canon (HdrHistogram, Gil Tene; what P95-SLO dashboards actually
    * store) as an exact cross-engine query. Values land on the cent
    * grid, then bucket geometry is pure integer arithmetic: e =
    * max(0, bitlen(v) − 5) via minimal-binary `bin()`, mantissa m =
    * v >> e ∈ [16, 31] (v itself below 32), bucket id = 32e + m with
    * range [m·2^e, (m+1)·2^e) — so every bucket's relative width is
    * ≤ 1/16 BY CONSTRUCTION, the sketch's whole guarantee, and bucket
    * counts are plain sums (mergeable across executors/shards exactly
    * like q212's CMS rows — a fixed ≤ 32·log(max) counters per shard
    * regardless of N). Nearest-rank quantiles (P50/90/95/99, k =
    * ⌈p·N/100⌉ in exact ceil-division longs) come from a cumulative
    * walk of the AGGREGATED bucket table — the unpartitioned window
    * runs over ≤ a few hundred bucket rows, never raw events, which is
    * the reason HDR beats exact selection at 100 TB: the full-data pass
    * is one map-side-combinable count per bucket. Output per quantile:
    * rank and the containing bucket's [lo, hi) — the exact nearest-rank
    * value provably lies inside (bucketing is monotone), which the spec
    * pins against a driver-side exact sort. */
  private val q214HdrQuantiles: Q = (s, dir) => {
    import s.implicits._
    // bin()'s minimal-binary length (the exponent source) only matches
    // cross-engine for NONNEGATIVE longs — a negative cent value is 64
    // two's-complement bits in Spark but a different shape in DuckDB.
    // Filter — matched in the oracle — instead of assuming value >= 0.
    val cents = Tables.events(s, dir)
      .select(floor(round(col("value"), 2) * 100.0 + 0.5).cast("long").as("v"))
      .filter(col("v") >= 0)
    val hist = cents
      .withColumn("e", greatest(lit(0L), (length(bin(col("v"))) - 5).cast("long")))
      .withColumn("m", expr("shiftright(v, cast(e as int))"))
      .select((col("e") * 32 + col("m")).as("bucket"),
        expr("shiftleft(m, cast(e as int))").as("lo"),
        expr("shiftleft(m + 1, cast(e as int))").as("hi"))
      .groupBy(col("bucket"))
      .agg(min(col("lo")).as("lo"), min(col("hi")).as("hi"), count(lit(1)).as("n"))
    val cum = hist.withColumn("cumn",
      sum(col("n")).over(Window.orderBy(col("bucket"))))
    val total = hist.agg(sum(col("n")).as("n_total"))
    val qs = Seq(50L, 90L, 95L, 99L).toDF("p")
      .crossJoin(total) // 4×1 rows — the documented broadcast-literal join
      .withColumn("k", expr("(p * n_total + 99) div 100"))
    qs.join(cum, col("cumn") >= col("k"))
      .groupBy(col("p"), col("n_total"), col("k"))
      .agg(min(col("bucket")).as("bucket"))
      .join(cum.select(col("bucket"), col("lo"), col("hi")), Seq("bucket"))
      .select(col("p"), col("n_total"), col("k"), col("bucket"), col("lo"), col("hi"))
      .orderBy(col("p"))
  }

  /** Mann–Whitney U rank-sum test (Mann & Whitney 1947) with the full
    * tie correction — the nonparametric two-sample canon (does group R
    * ship different quantities than group N?) that q82's KS statistic
    * and q165's proportion z-test don't cover: a location test on ranks,
    * valid without normality. The whole rank machinery is EXACT integer
    * arithmetic on the DOUBLED grid: values collapse to the bounded
    * quantity grid (≤ 50 rows however large lineitem is — one map-side-
    * combinable scan, then every window/aggregate touches only the
    * grid), and the doubled midrank of a tied value is
    * 2·r = 2·(count below) + (count at) + 1 — an odd/even-safe long, so
    * 2·R₁ = Σ n₁(v)·2r(v) and 2·U₁ = 2R₁ − n₁(n₁+1) are exact longs both
    * engines must equal bit-for-bit (the identity Σ 2r·(n₀+n₁) = N(N+1)
    * is pinned in the spec). Only the final z (normal approximation
    * with the Σ(t³−t) tie correction in the variance) and the
    * rank-biserial effect size touch doubles — identical operation
    * order both sides, every input exactly representable (products
    * ≤ 4·10¹⁰ ≪ 2⁵³), floored to the micro grid. Documented int64
    * bound: tie_t sums t³−t per grid value, exact while every single
    * quantity's count stays below 2²¹ (~2.09M rows ≈ TPC-H sf25);
    * beyond that non-ANSI Spark wraps silently where DuckDB raises, so
    * the spec pins the bound (RelationalQueriesSpec q216) and a larger
    * SF must move the tie term to the driver-side ≤50-row grid. */
  private val q216MannWhitney: Q = (s, dir) => {
    def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    val grid = Tables.lineitem(s, dir)
      .filter(col("l_returnflag").isin("R", "N"))
      .groupBy(col("l_quantity").cast("long").as("q"))
      .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n1"),
        sum(when(col("l_returnflag") === "N", 1L).otherwise(0L)).as("n0"))
    val below = Window.orderBy(col("q")).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = grid.withColumn("two_r",
      lit(2L) * coalesce(sum(col("n1") + col("n0")).over(below), lit(0L)) +
        col("n1") + col("n0") + lit(1L))
    val a = ranked.agg(
      sum(col("n1")).as("n1"), sum(col("n0")).as("n0"),
      sum(col("n1") * col("two_r")).as("two_r1"),
      sum((col("n1") + col("n0")) * (col("n1") + col("n0")) * (col("n1") + col("n0")) -
        (col("n1") + col("n0"))).as("tie_t"))
    val n1d = col("n1").cast("double"); val n0d = col("n0").cast("double")
    val nd  = (col("n1") + col("n0")).cast("double")
    val twoU1 = col("two_r1") - col("n1") * (col("n1") + lit(1L))
    val uMinusMean = twoU1.cast("double") / 2.0 - n1d * n0d / 2.0
    val variance = n1d * n0d / 12.0 *
      ((col("n1") + col("n0") + lit(1L)).cast("double") -
        col("tie_t").cast("double") / (nd * (col("n1") + col("n0") - lit(1L)).cast("double")))
    a.select(col("n1"), col("n0"), col("two_r1"), twoU1.as("two_u1"), col("tie_t"),
      s6(uMinusMean / sqrt(variance)).as("z_micro"),
      s6(twoU1.cast("double") / (n1d * n0d) - lit(1.0)).as("rb_micro"))
  }

  /** Kaplan–Meier survival curve (Kaplan & Meier, JASA 1958) — the
    * churn/retention canon (how long does a user stay active?) in EXACT
    * integer arithmetic. Cohort derivation is deterministic from
    * events: per user, duration = last active hour − first active hour
    * (UTC epoch hours — hour grain because the corpus spans ~30 days,
    * so hours give a ~100-step curve where days give 4); a user whose
    * last hour is ≥ 72 h before the corpus frontier churned (event),
    * otherwise they are right-censored
    * — the fundamental thing KM handles that a naive churn-rate query
    * gets wrong (censored users contribute risk time but no death).
    * The product-limit estimator is a stepwise fold on the micro grid:
    * S ← S·(nᵢ−dᵢ) div nᵢ — integer floor at every step, so both
    * engines walk identical longs (d=0 rows multiply by n div n and
    * pass S through exactly, no branch needed); the true rational
    * product would need ~1500^30 precision, which is WHY the fixed-
    * point fold is the cross-engine contract. Scale shape: events
    * collapse to user grain (one map-side-combinable min/max), users
    * collapse to the DURATION grid — bounded by the calendar span,
    * never user count (the q166 argument) — and only that tiny frame
    * is sorted, folded (Spark: higher-order `aggregate` building the
    * running-S array; DuckDB: recursive CTE), and emitted. Risk sets
    * via a descending cumulative sum over the same tiny frame. */
  private val q215KaplanMeier: Q = (s, dir) => {
    val days = Tables.events(s, dir)
      .groupBy(col("user_id").cast("long").as("uid"))
      .agg(min(expr("cast(cast(ts as long) div 3600 as bigint)")).as("f"),
        max(expr("cast(cast(ts as long) div 3600 as bigint)")).as("l"))
    val frontier = days.agg(max(col("l")).as("frontier"))
    val durations = days.crossJoin(frontier) // 1-row broadcast
      .select((col("l") - col("f")).as("t"),
        when(col("l") <= col("frontier") - 72, 1L).otherwise(0L).as("event"))
      .groupBy(col("t"))
      .agg(sum(col("event")).as("d"), sum(lit(1L) - col("event")).as("c"))
    val atRisk = durations.withColumn("n",
      sum(col("d") + col("c")).over(
        Window.orderBy(col("t").desc).rowsBetween(Window.unboundedPreceding, 0)))
    atRisk
      .agg(sort_array(collect_list(struct(col("t"), col("n"), col("d"), col("c")))).as("arr"))
      .select(explode(expr(
        """aggregate(arr,
          |  cast(array() as array<struct<t: bigint, n: bigint, d: bigint, c: bigint, s: bigint>>),
          |  (acc, x) -> concat(acc, array(named_struct(
          |    't', x.t, 'n', x.n, 'd', x.d, 'c', x.c,
          |    's', if(size(acc) = 0, 1000000L, element_at(acc, -1).s) * (x.n - x.d) div x.n))))
          |""".stripMargin)).as("r"))
      .select(col("r.t").as("t"), col("r.n").as("n_risk"), col("r.d").as("d"),
        col("r.c").as("c"), col("r.s").as("s_micro"))
      .orderBy(col("t"))
  }

  /** Poisson bootstrap (Chamandy, Muralidharan, Najmi & Naidu 2012,
    * "Estimating uncertainty for massive data streams" — Google's
    * production bootstrap; Kleiner et al.'s BLB is the same lineage) —
    * THE distributed uncertainty-quantification canon: classical
    * resampling draws n indices per replicate (a shuffle of the whole
    * dataset per replicate), while the Poisson bootstrap gives every
    * row an INDEPENDENT Poisson(1) replicate weight, so all
    * [[BootReps]] replicates ride ONE scan with map-side-combinable
    * weighted sums — at 100 TB the difference between 64 shuffles of
    * the corpus and one aggregate to 64 rows (explode×64 collapses to
    * ≤64 partials per task before any shuffle). Everything is exact
    * cross-engine integer arithmetic: the per-(row, replicate) draw is
    * a q212-style mixed hash (interleaved mods keep every product
    * < 2⁶³ at any orderkey scale) mapped through the Poisson(1)
    * inverse CDF on the micro grid — thresholds are the micro-floored
    * cumulative series e⁻¹·Σ 1/k! (367879, 735758, 919698, 981011,
    * 996340, 999405, 999916, 999989, 999998; P(≥9) keeps w=9) — and
    * each replicate's (n_eff, sum of cents) are plain long sums. Only
    * the replicate mean touches doubles: one division + one floor in
    * identical order both engines. The spec reads the percentile CI
    * off the 64 exact replicate rows. */
  private val BootReps = 64
  private val q221PoissonBootstrap: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir).select(
        col("l_orderkey").cast("long").as("ok"),
        col("l_linenumber").cast("long").as("ln"),
        floor(round(col("l_extendedprice"), 2) * 100.0 + 0.5).cast("long").as("cents"))
      .withColumn("b", explode(sequence(lit(0L), lit(BootReps - 1L))))
      .withColumn("h0",
        expr("((ok % 1000003) * 65599 + (ln % 1000003) * 4001 + b * 104729) % 2147483648"))
      .withColumn("h1", expr("(h0 ^ shiftright(h0, 16)) * 73244475 % 2147483648"))
      .withColumn("h2", expr("(h1 ^ shiftright(h1, 13)) * 73244475 % 2147483648"))
      .withColumn("u", expr("(h2 ^ shiftright(h2, 16)) % 1000000"))
      .withColumn("w",
        when(col("u") < 367879L, 0L).when(col("u") < 735758L, 1L)
          .when(col("u") < 919698L, 2L).when(col("u") < 981011L, 3L)
          .when(col("u") < 996340L, 4L).when(col("u") < 999405L, 5L)
          .when(col("u") < 999916L, 6L).when(col("u") < 999989L, 7L)
          .when(col("u") < 999998L, 8L).otherwise(9L))
    li.groupBy(col("b"))
      .agg(sum(col("w")).as("n_eff"), sum(col("w") * col("cents")).as("sum_cents"))
      .select(col("b"), col("n_eff"), col("sum_cents"),
        floor(col("sum_cents").cast("double") / col("n_eff").cast("double") * 1e6 + 0.5)
          .cast("long").as("mean_micro"))
      .orderBy(col("b"))
  }

  /** Theil–Sen slope estimator (Theil 1950; Sen 1968, JASA) — the
    * robust trend canon complementing q167's OLS fit (one outlier day
    * moves OLS arbitrarily; Theil–Sen's breakdown point is 29%): the
    * median over all pairwise day-to-day slopes of the daily purchase
    * revenue series. Scale shape: events collapse to the bounded daily
    * grid first (one map-side-combinable aggregate — the q166/q215
    * argument), so the pairwise self-join is ≤ (span choose 2) rows —
    * calendar-bounded, never event-bounded — and the rank window runs
    * over that tiny frame (documented bounded-grid window). Exactness:
    * slopes are IEEE quotients of exact longs (Δcents ≤ ~10⁹,
    * Δdays ≤ span, so distinct rationals differ by ≥ 1/span² ≫ double
    * eps — ordering by the double is collision-free on this grid),
    * both engines divide the identical longs, and the median is
    * nearest-rank selection (both middle values reported exactly,
    * micro-floored, plus their midpoint). */
  private val q222TheilSen: Q = (s, dir) => {
    def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("cast(cast(ts as long) div 86400 as bigint)").as("d"))
      .agg(sum(floor(round(col("value"), 2) * 100.0 + 0.5).cast("long")).as("v"))
    val pairs = daily.toDF("d1", "v1")
      .join(daily.toDF("d2", "v2"), col("d2") > col("d1"))
      .select(((col("v2") - col("v1")).cast("double") /
        (col("d2") - col("d1")).cast("double")).as("slope"))
    val ranked = pairs
      .withColumn("rn", row_number().over(Window.orderBy(col("slope"))).cast("long"))
      .crossJoin(broadcast(pairs.agg(count(lit(1)).as("np"))))
    ranked
      .filter(col("rn") === expr("(np + 1) div 2") || col("rn") === expr("np div 2 + 1"))
      .agg(max(col("np")).as("n_pairs"),
        s6(min(col("slope"))).as("lo_micro"),
        s6(max(col("slope"))).as("hi_micro"),
        s6((min(col("slope")) + max(col("slope"))) / 2.0).as("median_micro"))
  }

  /** Trimmed and winsorized means (Tukey's robust location estimators —
    * the outlier-tolerant "average order value" finance and SRE
    * dashboards actually want) — and a new CONSUMER of the two-phase
    * exact-selection machinery: the trim cuts are order statistics, and
    * at 100 TB the textbook rank-window formulation is a single-task
    * global sort. Here [[graft.operators.DistributedSelect.kth]]
    * locates all four needed ranks (g, g+1, n−g, n−g+1; g = ⌊n/20⌋,
    * the 5% trim) in TWO bounded-histogram passes, then ONE conditional
    * aggregate computes the exact tail sums with the classic tie
    * decomposition: sum of the g smallest = Σ(v < cut) +
    * (g − |v < cut|)·cut — exact longs even when ties straddle the
    * cut. Winsorized sum replaces each trimmed tail with g copies of
    * its nearest kept neighbor (ranks g+1 and n−g). Only the two means
    * divide — identical-order double ops, micro-floored. The oracle
    * restates everything as rank-range sums under a full sort (tie
    * order inside equal values cannot move any sum). */
  private val q223TrimmedStats: Q = (s, dir) => {
    val cents = Tables.lineitem(s, dir)
      .select(floor(round(col("l_extendedprice"), 2) * 100.0 + 0.5).cast("long").as("v"))
    val n = cents.count()
    val g = n / 20
    require(g >= 1, s"trimmed stats need n >= 20 rows, got $n")
    val ks = graft.operators.DistributedSelect.kth(
      cents, Seq(g, g + 1, n - g, n - g + 1), width = 4096L)
    val (loCut, loRep, hiRep, hiCut) = (ks(g), ks(g + 1), ks(n - g), ks(n - g + 1))
    cents.agg(
        sum(col("v")).as("total"),
        sum(when(col("v") < loCut, col("v")).otherwise(0L)).as("sum_below"),
        sum(when(col("v") < loCut, 1L).otherwise(0L)).as("n_below"),
        sum(when(col("v") > hiCut, col("v")).otherwise(0L)).as("sum_above"),
        sum(when(col("v") > hiCut, 1L).otherwise(0L)).as("n_above"))
      .select(
        lit(n).as("n"), lit(g).as("g"),
        lit(loCut).as("lo_cut"), lit(hiCut).as("hi_cut"),
        (col("total") - (col("sum_below") + (lit(g) - col("n_below")) * loCut)
          - (col("sum_above") + (lit(g) - col("n_above")) * hiCut)).as("trimmed_sum"))
      .select(col("n"), col("g"), col("lo_cut"), col("hi_cut"),
        col("trimmed_sum"),
        floor(col("trimmed_sum").cast("double") / lit((n - 2 * g).toDouble) * 1e6 + 0.5)
          .cast("long").as("trimmed_mean_micro"),
        floor((col("trimmed_sum") + lit(g * loRep) + lit(g * hiRep)).cast("double")
          / lit(n.toDouble) * 1e6 + 0.5).cast("long").as("winsor_mean_micro"))
  }

  /** Holt linear (double-exponential) smoothing (Holt 1957) — the
    * trend-aware forecasting canon between q166's level-only EWMA and
    * q190's fixed seasonal decompose: level and trend updated per day,
    * ℓ_t = α·x_t + (1−α)(ℓ+b), b_t = β(ℓ_t−ℓ) + (1−β)b with α=0.3,
    * β=0.1. The fold is ORDER-SENSITIVE, so like q166/q215 it runs as
    * one higher-order `aggregate` over the sorted bounded daily grid
    * (events collapse to ≤ span rows first; nothing order-sensitive
    * ever touches row-order-nondeterministic data). Exactness: state
    * lives on the milli-cent grid as longs; each update is integer
    * products (< 2⁵³) + an explicit floor(·/1000.0) — floor, not `div`,
    * because the TREND goes negative and Spark's `div` truncates toward
    * zero while DuckDB's `//` floors (the sign-semantics trap the
    * all-positive q215 never hits). The oracle walks the identical
    * recurrence as a recursive CTE. Output: the full bounded
    * (day, x, level, trend, one-step forecast) path. */
  private val q224HoltLinear: Q = (s, dir) => {
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("cast(cast(ts as long) div 86400 as bigint)").as("d"))
      .agg(floor(round(sum(col("value")), 2) * 100.0 + 0.5).cast("long").as("x"))
    daily
      .agg(sort_array(collect_list(struct(col("d"), col("x")))).as("arr"))
      .filter(size(col("arr")) >= 2)
      .select(explode(expr(
        """aggregate(slice(arr, 2, size(arr) - 1),
          |  array(named_struct(
          |    'd', arr[0].d, 'x', arr[0].x,
          |    'l', 1000L * arr[0].x,
          |    'b', 1000L * (arr[1].x - arr[0].x))),
          |  (acc, e) -> concat(acc, array(named_struct(
          |    'd', e.d, 'x', e.x,
          |    'l', CAST(floor((300000.0 * e.x + 700.0 *
          |           (element_at(acc, -1).l + element_at(acc, -1).b)) / 1000.0) AS BIGINT),
          |    'b', CAST(floor((100.0 *
          |           (CAST(floor((300000.0 * e.x + 700.0 *
          |              (element_at(acc, -1).l + element_at(acc, -1).b)) / 1000.0) AS BIGINT)
          |            - element_at(acc, -1).l) + 900.0 * element_at(acc, -1).b) / 1000.0) AS BIGINT))))
          |)""".stripMargin)).as("r"))
      .select(col("r.d").as("d"), col("r.x").as("x_cents"),
        col("r.l").as("level_milli"), col("r.b").as("trend_milli"),
        (col("r.l") + col("r.b")).as("forecast_milli"))
      .orderBy(col("d"))
  }

  /** k-anonymity audit (Sweeney 2002, IJUFKS) — the data-governance
    * gate a training-data release runs before shipping: group the
    * table by its quasi-identifier tuple (nation, market segment,
    * $1000 balance band) and measure how identifiable the rows are —
    * the k level (smallest group), how many groups and rows fall below
    * the k=5 bar, and the suppression rate a k-enforcing release would
    * pay. One map-side-combinable groupBy on the bounded QI grid plus
    * a one-row rollup; every number an exact long (the rate is one
    * micro-floored division). Negative balances band with floor
    * division semantics matched explicitly (Spark `floor(/1.0)` vs
    * DuckDB floor — not `div`/`//`, the q224 sign lesson). */
  private val q225KAnonymity: Q = (s, dir) => {
    val qi = Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(round(col("c_acctbal"), 2) / 1000.0).cast("long").as("bal_band"))
    val groups = qi.groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
      .agg(count(lit(1)).as("sz"))
    groups.agg(
        count(lit(1)).as("n_groups"),
        sum(col("sz")).as("n_rows"),
        min(col("sz")).as("k_anonymity"),
        sum(when(col("sz") < 5, 1L).otherwise(0L)).as("n_groups_below_k"),
        sum(when(col("sz") < 5, col("sz")).otherwise(0L)).as("n_rows_at_risk"))
      .select(col("n_groups"), col("n_rows"), col("k_anonymity"),
        col("n_groups_below_k"), col("n_rows_at_risk"),
        floor(col("n_rows_at_risk").cast("double") / col("n_rows").cast("double")
          * 1e6 + 0.5).cast("long").as("suppression_micro"))
  }

  /** Multiwindow error-budget burn-rate alerting (the Google SRE
    * workbook's multiwindow-multi-burn policy — the page/ticket logic
    * behind every modern SLO dashboard, extending q204's PromQL
    * evaluation and ST8's alert rules): per hour, burn = error-rate /
    * SLO budget over the 1 h window and the rolling 6 h window; a PAGE
    * needs BOTH short and long windows hot (burn > 14.4 — exhausting a
    * 30-day budget in 2 days), a TICKET both > 6. Everything is exact
    * integer arithmetic on the calendar-bounded hourly grid: events
    * collapse to (hour, errors, total) in one map-side-combinable
    * pass, the 6 h rolling sums are a range frame over the bounded
    * grid, and the burn comparisons cross-multiply
    * (errs·10¹² > thr_micro·budget_micro·total as pure long products)
    * so no float boundary decides a page. Burn values are emitted
    * micro-floored for the dashboard alongside the decisions. Int64
    * bound (the q167 discipline): the cross-products hold while hourly
    * totals stay < ~9·10⁶ rows; beyond that the widen path is
    * DECIMAL(38)/HUGEINT — documented, not silently lossy. */
  private val q226BurnRate: Q = (s, dir) => {
    // SLO: 2% error budget — the synthetic stream runs ~20% errors with
    // high hourly variance, so burn hovers around 10× and BOTH decision
    // branches (page > 14.4, ticket > 6) fire and rest across the grid
    val budgetMicro = 20000L
    val hourly = Tables.events(s, dir)
      .groupBy(expr("cast(cast(ts as long) div 3600 as bigint)").as("h"))
      .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errs"),
        count(lit(1)).as("total"))
    val w6 = Window.orderBy(col("h")).rangeBetween(-5L, 0L)
    val rolled = hourly
      .withColumn("errs6", sum(col("errs")).over(w6))
      .withColumn("total6", sum(col("total")).over(w6))
    // burn > thr  ⇔  errs·1e6·1e6 > thr_micro·budget_micro·total — longs
    def hot(errs: Column, total: Column, thrMicro: Long): Column =
      errs * lit(1000000L) * lit(1000000L) > lit(thrMicro) * lit(budgetMicro) * total
    rolled.select(col("h"), col("errs"), col("total"), col("errs6"), col("total6"),
        floor(col("errs").cast("double") / col("total").cast("double")
          / (budgetMicro.toDouble / 1e6) * 1e6 + 0.5).cast("long").as("burn1h_micro"),
        floor(col("errs6").cast("double") / col("total6").cast("double")
          / (budgetMicro.toDouble / 1e6) * 1e6 + 0.5).cast("long").as("burn6h_micro"),
        (hot(col("errs"), col("total"), 14400000L) &&
          hot(col("errs6"), col("total6"), 14400000L)).cast("int").as("page"),
        (hot(col("errs"), col("total"), 6000000L) &&
          hot(col("errs6"), col("total6"), 6000000L)).cast("int").as("ticket"))
      .orderBy(col("h"))
  }

  /** Chi-square test of independence + Cramér's V (Pearson 1900;
    * Cramér 1946) — the categorical-association canon the stats tier
    * was missing next to KS (q82, continuous), Mann–Whitney (q216,
    * ordinal) and the proportion z (q165, binary): is event type
    * independent of day-of-week? Contingency counts are one
    * map-side-combinable aggregate over the bounded (type × dow) grid;
    * expected counts are row·col/N with factors widened to double
    * BEFORE multiplying (the q184 overflow discipline — r·c outgrows a
    * long at cluster scale); each cell's (O−E)²/E lands micro-floored
    * on the long grid BEFORE the exact integer total (the q133
    * fixed-point discipline — a float sum's order would diverge
    * cross-engine), and Cramér's V = √(χ²/(N·min(R−1, C−1))) is one
    * identical-order double chain off that exact total. dow is epoch-
    * day mod 7 — pure integer, no locale/timezone WEEKDAY semantics to
    * disagree on. */
  private val q230ChiSquare: Q = (s, dir) => {
    val cells = Tables.events(s, dir)
      .select(col("event_type").as("t"),
        expr("cast(cast(ts as long) div 86400 as bigint) % 7").as("dow"))
      .groupBy(col("t"), col("dow")).agg(count(lit(1)).as("o"))
    val rows = cells.groupBy(col("t")).agg(sum(col("o")).as("r_tot"))
    val cols = cells.groupBy(col("dow")).agg(sum(col("o")).as("c_tot"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("t")).as("r_cats"), countDistinct(col("dow")).as("c_cats"))
    val e = col("r_tot").cast("double") * col("c_tot").cast("double") / col("n").cast("double")
    val perCell = cells
      .join(rows, "t").join(cols, "dow").crossJoin(broadcast(tot))
      .select(col("n"), col("r_cats"), col("c_cats"),
        floor((col("o").cast("double") - e) * (col("o").cast("double") - e) / e
          * 1e6 + 0.5).cast("long").as("cell_micro"))
    perCell.groupBy(col("n"), col("r_cats"), col("c_cats"))
      .agg(sum(col("cell_micro")).as("chi2_micro"))
      .select(col("n"), col("r_cats"), col("c_cats"),
        ((col("r_cats") - 1) * (col("c_cats") - 1)).as("dof"),
        col("chi2_micro"),
        floor(sqrt(col("chi2_micro").cast("double") / 1e6 /
          (col("n").cast("double") *
            least(col("r_cats") - 1, col("c_cats") - 1).cast("double"))) * 1e6 + 0.5)
          .cast("long").as("cramers_v_micro"))
  }

  /** Weighted sampling WITHOUT replacement, one pass, distributed —
    * Efraimidis & Spirakis 2006 (Inf. Process. Lett. 97): each item
    * draws u ∈ (0, 1] and the k largest u^(1/w) ARE a weighted sample
    * without replacement (the exponential-clocks argument). This is the
    * reservoir canon behind every "sample 10k docs proportional to
    * quality score" curation step — one scan + a bounded top-k, never a
    * sequential reservoir. Determinism: u is hash-derived per key (the
    * q56 seeded-generator discipline), and the selection key is the
    * monotone-equivalent ln(u)/w — ONE identical-order double chain
    * pico-floored to a long, ties broken by custkey — so both engines
    * rank the identical integers and the top-k is exact, not
    * distributionally similar. Scale shape: scan → TakeOrdered(k)
    * (map-side bounded heaps, no global sort, no shuffle beyond k rows
    * per partition). */
  private val EsSampleK = 20
  private val q237WeightedSample: Q = (s, dir) => {
    val spend = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(floor(round(sum(col("o_totalprice")), 2) * 100.0 + 0.5).cast("long").as("w"))
      .filter(col("w") > 0)
    val h = call_function("rolling_hash",
      concat(lit("es#"), col("o_custkey").cast("string")))
    spend
      .withColumn("key_pico",
        floor(log((h + 1).cast("double") / 1000000008.0) /
          col("w").cast("double") * 1e12).cast("long"))
      .orderBy(col("key_pico").desc, col("o_custkey"))
      .limit(EsSampleK)
      .orderBy(col("o_custkey"))
  }

  /** One-way ANOVA F + η² (Fisher 1925) — does mean event value differ
    * by event type? The k-group generalization completing the stats
    * tier (z: two proportions q165; MW: two ordinal q216; chi²:
    * categorical q230). All moments (n_g, Σx, Σx² per group) are exact
    * cent-grid longs from ONE map-side-combinable aggregate over the
    * bounded type grid. Cross-engine exactness: the uncentered
    * per-group term s_g²/n_g is floored to the unit-cents² grid PER
    * GROUP before the exact integer total (the q230 per-cell
    * discipline — a float sum over groups would be order-sensitive),
    * and SST/F/η² are identical-order double chains off exact longs,
    * micro-floored. Σx² fits int64 to ~10⁴-cent values × 10¹⁰ rows;
    * beyond, widen to DECIMAL (the q228 move). Degenerate inputs
    * (k < 2 groups, n ≤ k, or zero within-group variance) pin the four
    * statistics at −1 with k/n still reported — the SAME sentinel
    * contract as the streaming twin [[graft.streaming.StreamOps.anovaState]],
    * so the batch/stream pair agrees exactly where F is undefined
    * instead of diverging on NaN/Infinity floor semantics. */
  private val q240AnovaF: Q = (s, dir) => {
    val cents = floor(round(col("value"), 2) * 100.0 + 0.5).cast("long")
    val g = Tables.events(s, dir)
      .select(col("event_type").as("t"), cents.as("x"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_g"), sum(col("x")).as("s_g"),
        sum(col("x") * col("x")).as("ss_g"))
    val perGroup = g.select(col("n_g"), col("s_g"), col("ss_g"),
      floor(col("s_g").cast("double") * col("s_g").cast("double") /
        col("n_g").cast("double") + 0.5).cast("long").as("t_g"))
    val m = perGroup.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
      sum(col("s_g")).as("sx"), sum(col("ss_g")).as("sxx"), sum(col("t_g")).as("tsum"))
    val nD = col("n").cast("double")
    val ssb = col("tsum").cast("double") -
      col("sx").cast("double") * col("sx").cast("double") / nD
    val sst = col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double") / nD
    val ssw = sst - ssb
    val f = (ssb / (col("k") - 1).cast("double")) /
      (ssw / (col("n") - col("k")).cast("double"))
    val degenerate = col("k") < 2 || col("n") <= col("k") || ssw <= 0.0
    def gated(c: Column): Column = when(degenerate, lit(-1L)).otherwise(c)
    m.select(col("k"), col("n"),
      gated(floor(ssb + 0.5).cast("long")).as("ssb_cents2"),
      gated(floor(ssw + 0.5).cast("long")).as("ssw_cents2"),
      gated(floor(f * 1e6 + 0.5).cast("long")).as("f_micro"),
      gated(floor(ssb / sst * 1e6 + 0.5).cast("long")).as("eta2_micro"))
  }

  /** Mann–Kendall trend test (Mann 1945; Kendall 1975) — the
    * nonparametric "is there a monotone trend" significance test that
    * pairs with q222's Theil–Sen slope (the textbook pairing: MK for
    * detection, TS for magnitude; hydrology/ops-metrics standard).
    * S = Σ_{i<j} sign(v_j − v_i) over the calendar-bounded daily grid
    * (the q222 pair join — bounded², never corpus-sized), variance with
    * the tie correction Var·18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5), and
    * the continuity-corrected z. Everything is exact integer arithmetic
    * until the final z (one identical-order double chain,
    * micro-floored); ties enter via an exact value-grid aggregate. */
  private val q241MannKendall: Q = (s, dir) => {
    def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("cast(cast(ts as long) div 86400 as bigint)").as("d"))
      .agg(sum(floor(round(col("value"), 2) * 100.0 + 0.5).cast("long")).as("v"))
    val sStat = daily.toDF("d1", "v1")
      .join(daily.toDF("d2", "v2"), col("d2") > col("d1"))
      .agg(coalesce(sum(signum(col("v2") - col("v1")).cast("long")), lit(0L)).as("s_stat"))
    val ties = daily.groupBy(col("v")).agg(count(lit(1)).as("t"))
      .agg(count(lit(1)).as("n_values"),
        sum(col("t")).as("n_days"),
        sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5)).as("tie_term"))
    val nD = col("n_days").cast("double")
    val var18 = col("n_days") * (col("n_days") - 1) * (lit(2L) * col("n_days") + 5) - col("tie_term")
    val sD = col("s_stat").cast("double")
    val z = when(col("s_stat") > 0, (sD - 1.0) / sqrt(col("var18").cast("double") / 18.0))
      .when(col("s_stat") < 0, (sD + 1.0) / sqrt(col("var18").cast("double") / 18.0))
      .otherwise(lit(0.0))
    sStat.crossJoin(broadcast(ties))
      .withColumn("var18", var18)
      .select(col("n_days"), col("n_values"), col("s_stat"), col("tie_term"),
        col("var18"), s6(z).as("z_micro"),
        signum(col("s_stat")).cast("long").as("trend"))
  }

  /** Two-sided tabular CUSUM MONITOR (Page 1954, Biometrika) — the
    * PROSPECTIVE member of the CUSUM pair: q173 is the retrospective
    * diagnostic (target = each series' own GLOBAL mean, one-sided, a
    * per-type summary — "where, in hindsight, did this series run
    * hot"), while this is the form a live monitor runs — the reference
    * must be FROZEN before the data it judges arrives (a global-mean
    * target lets the drift pull its own yardstick toward itself),
    * two-sided with the textbook slack parameter, per-day trajectory
    * output, and a streaming twin
    * ([[graft.streaming.StreamOps.cusumMonitorState]]) bridged exactly.
    * Reference (μ0, slack k = μ0/20, threshold h = μ0/2) is frozen from
    * the first
    * [[CusumBaselineDays]] calendar days (the CurationIngest
    * frozen-reference discipline — a monitor must not let the drift it
    * hunts contaminate its own reference), all exact cent-grid longs
    * via floor division. The recurrence S⁺_t = max(0, S⁺_{t−1} + v_t −
    * μ0 − k) is computed NOT as a sequential fold but by its prefix
    * closed form S⁺_t = P_t − min(0, min_{j≤t} P_j) (P = running sum of
    * deviations; S⁻ symmetric) — two running windows over the
    * CALENDAR-BOUNDED daily grid (the q222/q226 allowlist class: days,
    * never events, cross the window). Integer arithmetic end to end —
    * no float enters, so cross-engine equality is structural. */
  private val CusumBaselineDays = 7
  private val q249Cusum: Q = (s, dir) => {
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("cast(cast(ts as long) div 86400 as bigint)").as("d"))
      .agg(sum(floor(round(col("value"), 2) * 100.0 + 0.5).cast("long")).as("v"))
    val base = daily.orderBy(col("d")).limit(CusumBaselineDays)
      .agg(count(lit(1)).as("nb"), max(col("d")).as("cut"), sum(col("v")).as("sb"))
      .head()
    require(base.getLong(0) == CusumBaselineDays.toLong,
      s"q249: need $CusumBaselineDays baseline days, found ${base.getLong(0)} — " +
        "series too short to freeze a reference")
    val cut = base.getLong(1)
    val mu0 = Math.floorDiv(base.getLong(2), CusumBaselineDays.toLong)
    val slack = Math.floorDiv(mu0, 20L)
    val h = Math.floorDiv(mu0, 2L)
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.filter(col("d") > cut)
      .withColumn("pp", sum(col("v") - lit(mu0 + slack)).over(w))
      .withColumn("pn", sum(lit(mu0 - slack) - col("v")).over(w))
      .select(col("d"), col("v").as("v_cents"),
        (col("pp") - least(min(col("pp")).over(w), lit(0L))).as("s_pos_cents"),
        (col("pn") - least(min(col("pn")).over(w), lit(0L))).as("s_neg_cents"))
      .withColumn("alarm",
        ((col("s_pos_cents") > h) || (col("s_neg_cents") > h)).cast("long"))
      .orderBy(col("d"))
  }

  /** Two-sided Page–Hinkley changepoint trajectory (Page 1954; Hinkley
    * 1971, Biometrika 58(3); the sequential-drift form surveyed in Gama
    * et al. 2014) — the ADAPTIVE-mean member of the changepoint pair:
    * q249's CUSUM judges every day against a FROZEN μ0 (right when a
    * known reference regime exists), while PH judges day t against the
    * RUNNING mean x̄_t of the monitored window itself — the
    * REFERENCE-FREE detector drift-adaptation surveys recommend when no
    * trustworthy baseline regime exists: deviations smaller than δ from
    * the series' own mean never accumulate, whatever the level.
    * m_t = Σ_{i≤t}(x_i − x̄_i − δ), alarm when m_t − min_{j≤t} m_j > λ
    * (the mirrored sum catches drops). Post-alarm the statistic LATCHES
    * while the shifted level persists — the cumulative mean decays the
    * offset only like 1/t — which is why practice resets m after each
    * alarm; this canon reports the raw un-reset trajectory (the reset
    * policy is an alerting concern, [[graft.api.AlertRules]] grain).
    * δ and λ still need units, so they are frozen from the first
    * [[CusumBaselineDays]] days exactly like q249 (δ = μ0/50, λ = μ0/2,
    * floor-division longs) — the baseline parameterizes the SCALE,
    * never the mean PH adapts by itself; the trajectory starts at the
    * cut (t indexes post-baseline days).
    *
    * Exactness: daily cent totals are exact longs; x_t − x̄_t is the
    * exact integer (x_t·t − cum_t) divided by t as the row's ONE double
    * op, floored (exact to |x·t − cum| < 2⁵³ — document-bounded like
    * q253's d_num); both sides' increments are then exact longs, and
    * the running sum / running min / subtraction are pure integer —
    * the floor(a/t) vs floor(−a/t) asymmetry is MIRRORED operand-for-
    * operand on both engines (never `div`: Spark `div` truncates toward
    * zero, DuckDB `//` floors — the sign-dependent divergence the
    * house rule exists for). Streaming twin:
    * [[graft.streaming.StreamOps.pageHinkleyState]], prefix-bridged.
    *
    * Scale shape: one map-side-combinable daily aggregate, then
    * windows over the CALENDAR-BOUNDED day grid (the q249/q222/q226
    * allowlist class: days, never events, cross the window). */
  private val q266PageHinkley: Q = (s, dir) => {
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("cast(cast(ts as long) div 86400 as bigint)").as("d"))
      .agg(sum(floor(round(col("value"), 2) * 100.0 + 0.5).cast("long")).as("v"))
    val base = daily.orderBy(col("d")).limit(CusumBaselineDays)
      .agg(count(lit(1)).as("nb"), max(col("d")).as("cut"), sum(col("v")).as("sb"))
      .head()
    require(base.getLong(0) == CusumBaselineDays.toLong,
      s"q266: need $CusumBaselineDays baseline days to freeze the scale, " +
        s"found ${base.getLong(0)}")
    val cut = base.getLong(1)
    val mu0 = Math.floorDiv(base.getLong(2), CusumBaselineDays.toLong)
    val delta = Math.floorDiv(mu0, 50L)
    val lambda = Math.floorDiv(mu0, 2L)
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.filter(col("d") > cut)
      .withColumn("t", count(lit(1)).over(w))
      .withColumn("cum", sum(col("v")).over(w))
      .withColumn("term_pos",
        floor((col("v") * col("t") - col("cum")).cast("double") / col("t"))
          .cast("long") - lit(delta))
      .withColumn("term_neg",
        floor((col("cum") - col("v") * col("t")).cast("double") / col("t"))
          .cast("long") - lit(delta))
      .withColumn("m_pos", sum(col("term_pos")).over(w))
      .withColumn("m_neg", sum(col("term_neg")).over(w))
      .select(col("d"), col("v").as("v_cents"), col("t"),
        (col("m_pos") - min(col("m_pos")).over(w)).as("ph_pos"),
        (col("m_neg") - min(col("m_neg")).over(w)).as("ph_neg"))
      .withColumn("alarm",
        ((col("ph_pos") > lambda) || (col("ph_neg") > lambda)).cast("long"))
      .orderBy(col("d"))
  }

  /** Two-sample Kolmogorov–Smirnov DRIFT trajectory (Kolmogorov 1933;
    * Smirnov 1948; Massey 1951 for the two-sample form) — the
    * DISTRIBUTION-shape member of the monitor family: q249's CUSUM
    * catches mean shifts, q241's MK catches monotone trends, but a
    * variance blow-up or bimodal split moves NEITHER — KS against a
    * frozen reference window is the standard model-serving input-drift
    * gate (q140's PSI is its binned cousin; KS needs no bin choice).
    * Reference = the first [[KsBaselineDays]] calendar days' cent-value
    * distribution, FROZEN (the q249 discipline — the drift must not
    * pull its own yardstick); each post-baseline day t reports
    * D_t = max_v |F_ref(v) − F_live≤t(v)| over the merged value grid.
    *
    * Exact arithmetic: D's numerator is computed CROSS-MULTIPLIED —
    * max_v |cumRef(v)·nLive − cumLive(v)·nRef| — so the max ranges over
    * exact integers (DECIMAL(38,0)-widened products: at 10¹² events a
    * side, cumRef·nLive ≈ 10²⁴ is far past int64 while DuckDB's
    * BIGINT·BIGINT promotes to HUGEINT); only the final D division is
    * a double, micro-floored. The d_num output column reads the
    * decimal back as a long — exact to nRef·nLive < 2⁶³ (~3×10⁹ events
    * a side), documented here; d_micro stays exact-input at any scale.
    *
    * Scale shape: the lattice is (merged cent grid × post-baseline
    * calendar) — value-domain × calendar bounded, independent of event
    * count; its three windows are each partitioned by the OTHER
    * dimension (per-value day prefix, per-day value prefix, per-day
    * total), so no partition exceeds a grid bound; the reference
    * cumulative rides [[graft.operators.DistributedSelect
    * .globalPrefixSum]] on the merged grid (no unpartitioned window);
    * the calendar side of the lattice is a broadcast cross join of a
    * ≤366-row frame (the bounded-broadcast class, documented). */
  private[graft] val KsBaselineDays = 7
  private val q253KsDrift: Q = (s, dir) => {
    import graft.operators.DistributedSelect
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val ev = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(expr("cast(cast(ts as long) div 86400 as bigint)").as("d"),
        floor(round(col("value"), 2) * 100.0 + 0.5).cast("long").as("v"))
      .cache()
    val base = ev.select(col("d")).distinct().orderBy(col("d")).limit(KsBaselineDays)
      .agg(count(lit(1)).as("nb"), max(col("d")).as("cut")).head()
    require(base.getLong(0) == KsBaselineDays.toLong,
      s"q253: need $KsBaselineDays baseline days to freeze a reference, " +
        s"found ${base.getLong(0)}")
    val cut = base.getLong(1)
    val ref = ev.filter(col("d") <= cut)
      .groupBy(col("v")).agg(count(lit(1)).as("cref"))
    val live = ev.filter(col("d") > cut)
      .groupBy(col("d"), col("v")).agg(count(lit(1)).as("c"))
    val liveDays = live.select(col("d")).distinct()
    val allv = ref.select(col("v")).union(live.select(col("v"))).distinct()
    val refCum = DistributedSelect.globalPrefixSum(
        allv.join(ref, Seq("v"), "left")
          .select(col("v"), coalesce(col("cref"), lit(0L)).as("cref")),
        "v", "cref", "cumref", 1L << 12)
      .select(col("v"), col("cumref"))
    val nRef = ref.agg(coalesce(sum(col("cref")), lit(0L)).as("n_ref"))
    val dense = allv.crossJoin(broadcast(liveDays)) // grid × ≤366-day calendar
      .join(live, Seq("v", "d"), "left")
      .select(col("v"), col("d"), coalesce(col("c"), lit(0L)).as("c"))
    val wDays = Window.partitionBy(col("v")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wVals = Window.partitionBy(col("d")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDay = Window.partitionBy(col("d"))
    dense
      .withColumn("cl", sum(col("c")).over(wDays))    // value v, arrivals ≤ day d
      .withColumn("cuml", sum(col("cl")).over(wVals)) // values ≤ v, arrivals ≤ day d
      .withColumn("n_live", sum(col("cl")).over(wDay))
      .join(refCum, "v").crossJoin(broadcast(nRef))
      .withColumn("dev", abs(col("cumref").cast(d38) * col("n_live").cast(d38)
        - col("cuml").cast(d38) * col("n_ref").cast(d38)))
      .groupBy(col("d"))
      .agg(max(col("n_live")).as("n_live"), max(col("n_ref")).as("n_ref"),
        max(col("dev")).as("dev"))
      .select(col("d"), col("n_live"), col("n_ref"),
        col("dev").cast("long").as("d_num"),
        floor(col("dev").cast("double") /
          (col("n_ref").cast("double") * col("n_live").cast("double"))
          * 1e6 + 0.5).cast("long").as("d_micro"))
      .orderBy(col("d"))
  }

  /** Hoeffding-bound adaptive cut detection — the ADWIN cut condition
    * (Bifet & Gavaldà 2007, SIAM SDM, the ADWIN0 test) applied
    * retrospectively at every prefix of the daily series: at day T,
    * does ANY contiguous split of days 1..T into W₀·W₁ show
    * |μ̂₀ − μ̂₁| > ε_cut(n₀, n₁)? ADWIN's value over the rest of the
    * changepoint family (q249 CUSUM needs a tuned λ, q266 PH a tuned
    * δ/λ) is that its threshold is CALIBRATED: ε_cut = R·√(ln(4T/δ) /
    * (2m)) with harmonic m = n₀n₁/(n₀+n₁) gives a δ-controlled false-
    * alarm rate from Hoeffding's inequality alone — no tuning, only a
    * confidence. This canon runs the cut TEST exhaustively per prefix
    * (the full ADWIN also SHRINKS its window after each detection —
    * that recursion is a stream concern, and the window state is
    * exactly what a `GroupState` twin would carry; the batch form
    * reports every prefix's verdict against the full history). R is
    * the plug-in prefix range max−min (Hoeffding needs a bound;
    * documented, standard in implementations). δ = 0.05.
    *
    * Exactness: daily cent totals, prefix sums, running min/max and
    * every (T, n₀) pair's n-counts are exact longs; |μ̂₀ − μ̂₁| and
    * ε_cut are ONE double chain each off exact operands, micro-floored;
    * detection is the pure-integer compare dmu_micro > eps_micro and
    * the per-prefix best cut is the exact lexicographic max
    * (excess DESC, n₀ ASC) — no float reaches a decision. T = 1 has no
    * cut: the row pins n0_best = −1 and the −2·10⁶ sentinels.
    *
    * Scale shape: one daily aggregate; running windows over the
    * CALENDAR-BOUNDED day grid (the q249/q266 allowlist class); the
    * cut lattice is the calendar × calendar self-join (≤ 366² rows,
    * value-domain independent — the q222 Theil–Sen pair class). */
  private val q269AdwinCut: Q = (s, dir) => {
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("cast(cast(ts as long) div 86400 as bigint)").as("d"))
      .agg(sum(floor(round(col("value"), 2) * 100.0 + 0.5).cast("long")).as("v"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = daily
      .withColumn("t", count(lit(1)).over(w))
      .withColumn("s", sum(col("v")).over(w))
      .withColumn("rng", max(col("v")).over(w) - min(col("v")).over(w))
      .cache() // both sides of the cut lattice; runner-scoped
    val cuts = pre.select(col("d"), col("t"), col("s"), col("rng"))
      .join(pre.select(col("t").as("n0"), col("s").as("s0")), col("n0") < col("t"))
    val n1 = col("t") - col("n0")
    val dmu = abs(col("s0").cast("double") / col("n0").cast("double")
      - (col("s") - col("s0")).cast("double") / n1.cast("double"))
    val mH = (col("n0").cast("double") * n1.cast("double")
      / (col("n0").cast("double") + n1.cast("double")))
    val eps = (col("rng").cast("double")
      * sqrt(log(lit(4.0) * col("t").cast("double") / 0.05) / (lit(2.0) * mH)))
    val scored = cuts.select(col("d"), col("t"), col("n0"),
        floor(dmu * 1e6 + 0.5).cast("long").as("dmu_micro"),
        floor(eps * 1e6 + 0.5).cast("long").as("eps_micro"))
      .withColumn("excess", col("dmu_micro") - col("eps_micro"))
    val best = scored
      .groupBy(col("d"), col("t"))
      .agg(max(struct(col("excess"), (-col("n0")).as("nn"),
        col("dmu_micro"), col("eps_micro"))).as("b"))
      .select(col("d"), col("t"), (-col("b.nn")).as("n0_best"),
        col("b.dmu_micro").as("dmu_micro"), col("b.eps_micro").as("eps_micro"),
        (col("b.excess") > 0L).cast("long").as("detected"))
    pre.select(col("d"), col("t"), col("v").as("v_cents"))
      .join(best.drop("t"), Seq("d"), "left")
      .select(col("d"), col("t"), col("v_cents"),
        coalesce(col("n0_best"), lit(-1L)).as("n0_best"),
        coalesce(col("dmu_micro"), lit(-2000000L)).as("dmu_micro"),
        coalesce(col("eps_micro"), lit(-2000000L)).as("eps_micro"),
        coalesce(col("detected"), lit(0L)).as("detected"))
      .withColumn("alarmed_by", max(col("detected")).over(w))
      .orderBy(col("d"))
  }

  /** Burstiness and memory of the per-type arrival process (Goh &
    * Barabási 2008, EPL 81, 48002) — the event-TIMING member of the
    * monitor family: every other monitor asks about the VALUE series;
    * this asks whether arrivals themselves cluster. Over each type's
    * daily-count series: B = (σ − μ)/(σ + μ) ∈ [−1, 1] (−1 a perfectly
    * regular process, 0 Poisson, → 1 maximally bursty), the Fano
    * factor σ²/μ (the dispersion index — 1 at Poisson), and the memory
    * coefficient M = lag-1 Pearson of consecutive days (Goh–Barabási's
    * second axis: bursts can be independent or self-exciting). Daily
    * counts rather than raw interevent gaps is the deliberate SCALE
    * form: gap statistics need a per-type global sort of every event,
    * while the daily grid is one map-side-combinable aggregate and
    * calendar-bounded windows (documented; at Poisson rates the two
    * B readings are equivalent signals of the same clustering).
    *
    * Exactness: counts and all five lag moments are exact longs
    * (c² ≈ 10¹⁴ at 10⁷ events/day — int64-safe far past bench scale;
    * the q242-style DECIMAL widen is the documented path beyond); B,
    * Fano, M are ONE double chain each, micro-floored; M's zero-
    * variance denominator is NULL-MASKED (`when(denom > 0)`) never
    * branch-guarded — the r14 ANSI rule — and pins the −2·10⁶
    * sentinel (the q250 convention) when either side's variance
    * vanishes or the series has a single day. A constant series is
    * NOT degenerate for B: σ = 0 gives B = −1 exactly (the definition
    * working, not failing).
    *
    * Scale shape: one (type × day) aggregate, a lead(1) window
    * PARTITIONED by type over the calendar-bounded day grid, two
    * taxonomy-sized aggregates — no global window, nothing event-
    * quadratic. */
  private val q268Burstiness: Q = (s, dir) => {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type").as("g"),
        expr("cast(cast(ts as long) div 86400 as bigint)").as("d"))
      .agg(count(lit(1)).as("c"))
      .cache() // moment + lag consumers; runner-scoped
    val mom = daily.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("sc2"))
    val wG = Window.partitionBy(col("g")).orderBy(col("d"))
    val lagged = daily
      .withColumn("cn", lead(col("c"), 1).over(wG))
      .filter(col("cn").isNotNull)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("k"), sum(col("c")).as("sx"), sum(col("cn")).as("sy"),
        sum(col("c") * col("c")).as("sxx"), sum(col("cn") * col("cn")).as("syy"),
        sum(col("c") * col("cn")).as("sxy"))
    val nD = col("n").cast("double")
    val mu = col("sc").cast("double") / nD
    val varPop = (nD * col("sc2").cast("double")
      - col("sc").cast("double") * col("sc").cast("double")) / (nD * nD)
    val sigma = sqrt(varPop)
    val kD = col("k").cast("double")
    // parenthesized continuations: a leading `-` on a new line is a
    // SEPARATE discarded statement under semicolon inference
    val vx = (kD * col("sxx").cast("double")
      - col("sx").cast("double") * col("sx").cast("double"))
    val vy = (kD * col("syy").cast("double")
      - col("sy").cast("double") * col("sy").cast("double"))
    val num = (kD * col("sxy").cast("double")
      - col("sx").cast("double") * col("sy").cast("double"))
    val denom = sqrt(vx * vy)
    mom.join(lagged, Seq("g"), "left")
      .select(col("g").as("event_type"), col("n").as("n_days"),
        col("sc").as("n_events"),
        floor((sigma - mu) / (sigma + mu) * 1e6 + 0.5).cast("long").as("b_micro"),
        floor(varPop / mu * 1e6 + 0.5).cast("long").as("fano_micro"),
        coalesce(floor(num / when(denom > 0.0, denom) * 1e6 + 0.5).cast("long"),
          lit(-2000000L)).as("memory_micro"),
        coalesce(col("k"), lit(0L)).as("n_pairs"))
      .orderBy(col("event_type"))
  }

  /** Benjamini–Hochberg FDR step-up over a one-vs-rest KS drift battery
    * (Benjamini & Hochberg 1995, JRSS-B 57(1)) — the MULTIPLICITY layer
    * the monitor family was missing: q253/q242/q240 each test ONE
    * hypothesis, but a production drift screen fires one test per
    * segment every window, and alerting on raw per-test p-values at
    * α = 0.05 false-alarms at a rate that grows with the segment count.
    * BH caps the expected FALSE-DISCOVERY fraction instead: sort the m
    * p-values ascending, find k = max{i : p₍ᵢ₎ ≤ i·α/m}, reject the k
    * smallest. Battery here: for every event type g, the two-sample KS
    * distance between g's cent-value distribution and the REST of the
    * corpus (one-vs-rest — the standard segment-drift screen shape).
    *
    * The p-value is the DKW tail bound p = min(1, 2·exp(−2·d²·n_eff)),
    * n_eff = n_g·n_rest/(n_g+n_rest) (Dvoretzky–Kiefer–Wolfowitz 1956
    * with Massart's 1990 tight constant — the same bound that powers
    * KS table lookups). It is deliberately a closed-form BOUND, not the
    * asymptotic Kolmogorov CDF: (a) a conservative p keeps BH's FDR
    * guarantee (rejections only shrink), and (b) it needs only exp(),
    * which both engines evaluate as the same IEEE chain — Φ/erf-based
    * p-values are NOT cross-engine exact. Exactness: D's numerator is
    * the q253 cross-multiplied exact-integer max (DECIMAL(38,0)
    * products); d, p are ONE double chain each off exact longs,
    * micro-floored; every BH comparison is then pure-integer —
    * p_microᵢ·m ≤ i·[[BhAlphaMicro]] — so the accept/reject set cannot
    * drift on a float ulp. Ranks come from an m×m lexicographic
    * self-join ((p, g) total order), not a global window.
    *
    * Scale shape: the lattice is (cent-value grid × event-type
    * taxonomy) — value-domain × schema bounded, independent of event
    * count; per-type cumulatives ride windows PARTITIONED by type
    * (each partition grid-bounded, the q253 class); the corpus-wide
    * cumulative rides [[graft.operators.DistributedSelect
    * .globalPrefixSum]]; everything after the per-type max is an
    * m-row frame (m = taxonomy size — broadcast class). d_num's
    * long readback is exact to n_g·n_rest < 2⁶³ (the q253 bound);
    * d_micro/p_micro stay exact-input at any scale. */
  private[graft] val BhAlphaMicro = 50000L // α = 0.05 on the micro grid
  private val q265BhFdr: Q = (s, dir) => {
    import graft.operators.DistributedSelect
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val ev = Tables.events(s, dir)
      .select(col("event_type").as("g"),
        floor(round(col("value"), 2) * 100.0 + 0.5).cast("long").as("v"))
      .cache()
    val gv = ev.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val grid = ev.groupBy(col("v")).agg(count(lit(1)).as("m")).cache()
    require(grid.agg(min(col("v"))).head().getLong(0) >= 0L,
      "q265: negative cent values — offset the value grid before the prefix sum")
    val cumAll = DistributedSelect.globalPrefixSum(grid, "v", "m", "cum_all", 1L << 12)
      .select(col("v"), col("cum_all"))
    val groups = gv.groupBy(col("g")).agg(sum(col("c")).as("n_g"))
    val nTot = ev.count()
    val mHyp = groups.count() // taxonomy-bounded driver scalars
    val wG = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dev = grid.select(col("v"))
      .crossJoin(broadcast(groups.select(col("g")))) // grid × taxonomy lattice
      .join(gv, Seq("g", "v"), "left")
      .select(col("g"), col("v"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("cum_g", sum(col("c")).over(wG))
      .join(cumAll, "v")
      .join(broadcast(groups), "g")
      .withColumn("n_rest", lit(nTot) - col("n_g"))
      .withColumn("dev", abs(col("cum_g").cast(d38) * col("n_rest").cast(d38)
        - (col("cum_all") - col("cum_g")).cast(d38) * col("n_g").cast(d38)))
      .groupBy(col("g"))
      .agg(max(col("n_g")).as("n_g"), max(col("n_rest")).as("n_rest"),
        max(col("dev")).as("dev"))
    def dChain: Column =
      col("dev").cast("double") / (col("n_g").cast("double") * col("n_rest").cast("double"))
    val scored = dev.select(col("g"), col("n_g"), col("n_rest"),
        col("dev").cast("long").as("d_num"),
        floor(dChain * 1e6 + 0.5).cast("long").as("d_micro"),
        floor(least(lit(1.0), lit(2.0) * exp(lit(-2.0) * dChain * dChain
          * (col("n_g").cast("double") * col("n_rest").cast("double")
            / (col("n_g").cast("double") + col("n_rest").cast("double")))))
          * 1e6 + 0.5).cast("long").as("p_micro"))
      .cache() // m-row frame with FIVE consumers (rank legs, k, final) —
               // uncached, each re-executes the full grid lattice; runner-scoped
    val r1 = scored.select(col("g"), col("p_micro"))
    val rnk = r1.toDF("g", "p")
      .join(broadcast(r1.toDF("g2", "p2")),
        col("p2") < col("p") || (col("p2") === col("p") && col("g2") <= col("g")))
      .groupBy(col("g")).agg(count(lit(1)).as("rnk")) // m×m, taxonomy-bounded
    val kBh = rnk.join(broadcast(scored.select(col("g"), col("p_micro"))), "g")
      .agg(coalesce(max(when(col("p_micro") * lit(mHyp)
        <= col("rnk") * lit(BhAlphaMicro), col("rnk"))), lit(0L)).as("k_bh"))
    scored.join(broadcast(rnk), "g")
      .crossJoin(broadcast(kBh))
      .select(col("g").as("event_type"), col("n_g"), col("n_rest"),
        col("d_num"), col("d_micro"), col("p_micro"), col("rnk"),
        lit(mHyp).as("m_hyp"),
        (col("p_micro") * lit(mHyp) <= col("rnk") * lit(BhAlphaMicro))
          .cast("long").as("bh_flag"),
        col("k_bh"),
        (col("rnk") <= col("k_bh")).cast("long").as("rejected"))
      .orderBy(col("event_type"))
  }

  /** Kruskal–Wallis H (Kruskal & Wallis 1952) — the rank-based k-group
    * test completing q240's parametric ANOVA (the pairing every stats
    * text teaches: F when variances behave, H when they don't): do
    * event-value DISTRIBUTIONS differ by type? Ranks are midranks over
    * the cent-value grid on q198's DOUBLED grid (2·r̄(v) = 2·cumBelow +
    * m + 1 is an exact integer, so tie handling never touches a float),
    * and the grid's cumulative counts come from
    * [[graft.operators.DistributedSelect.globalPrefixSum]] on the
    * UNIQUE cent keys — value-domain-bounded histogram, NO global-sort
    * window even over the grid. Per-group (2R_g)²/(4n_g) is floored to
    * a long BEFORE the exact integer total (the q240/q230 discipline),
    * H and its tie-corrected form are identical-order double chains,
    * micro-floored. BOUND: t_g ≈ n²·n_g and rsum ≈ n³ — t_g's
    * floor(double)→long cast leaves int64 around n ≈ 4×10⁶ rows
    * (k ≈ 10 groups) (and the double itself leaves the exact-integer
    * grid at 2⁵³ earlier still); past that the H chain stays
    * CROSS-ENGINE-IDENTICAL (both engines run the same IEEE chain off
    * the same doubles) but the reported rank_sq_sum is no longer an
    * exact integer — callers needing exactness past ~10⁶ rows should
    * re-derive it on a DECIMAL grid (the q228/q243 move). */
  private val q242KruskalWallis: Q = (s, dir) => {
    import graft.operators.DistributedSelect
    def s6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5).cast("long")
    val rows = Tables.events(s, dir)
      .select(col("event_type").as("g"),
        floor(round(col("value"), 2) * 100.0 + 0.5).cast("long").as("v"))
      .cache()
    val grid = rows.groupBy(col("v")).agg(count(lit(1)).as("m")).cache()
    // globalPrefixSum's key contract is non-negative longs — refuse
    // loudly on a negative-value corpus (shift the grid, don't wrap)
    require(grid.agg(min(col("v"))).head().getLong(0) >= 0L,
      "q242: negative cent values — offset the value grid before ranking")
    val cum = DistributedSelect.globalPrefixSum(grid, "v", "m", "cum", 1L << 12)
      .select(col("v"), col("m"), (col("cum") - col("m")).as("below"))
    // 2·midrank per grid value; per-group 2R_g via the sparse (g, v) join
    val gv = rows.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c_gv"))
    val r2g = gv.join(cum, "v")
      .groupBy(col("g"))
      .agg(sum(col("c_gv")).as("n_g"),
        sum(col("c_gv") * (lit(2L) * col("below") + col("m") + 1L)).as("r2"))
    val perGroup = r2g.select(col("n_g"),
      floor(col("r2").cast("double") * col("r2").cast("double") /
        (lit(4.0) * col("n_g").cast("double")) + 0.5).cast("long").as("t_g"))
    val tieTerm = grid.agg(
      sum(col("m") * col("m") * col("m") - col("m")).as("tie3")).head().getLong(0)
    val m = perGroup.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
      sum(col("t_g")).as("rsum"))
    val nD = col("n").cast("double")
    val h = lit(12.0) / (nD * (nD + 1.0)) * col("rsum").cast("double") -
      lit(3.0) * (nD + 1.0)
    val corr = lit(1.0) - lit(tieTerm.toDouble) / (nD * nD * nD - nD)
    m.select(col("k"), col("n"), col("rsum").as("rank_sq_sum"),
      lit(tieTerm).as("tie3"),
      s6(h).as("h_micro"),
      s6(h / corr).as("h_tie_micro"))
  }

  /** Rolling 7-day distinct users — the hardest everyday OLAP ask
    * (COUNT(DISTINCT) OVER a sliding window has no algebraic
    * decomposition: distinct counts don't subtract), solved EXACTLY
    * with q213's word-aligned bitmap machinery: per (epoch-day, word)
    * bitmaps pack 63 users per long via bit_or; each day's words
    * fan out to the 7 target days they cover (a bounded ×7 explode,
    * map-side combinable straight back down); the per-target-day OR
    * + popcount IS the exact windowed distinct. At 100 TB this is
    * |users|/63 words × 7 per day instead of a user-level
    * self-join-per-window — and unlike HLL (q211) it is EXACT, the
    * trade the bitmap tier exists for. Output per day: the exact
    * 1-day and trailing-7-day distinct actives, plus the ratio
    * (stickiness, DAU/WAU) micro-floored. Nonnegative user_id filter
    * as in q213 (sign-bit shift semantics). */
  private val q232RollingDistinct: Q = (s, dir) => {
    val dw = Tables.events(s, dir)
      .filter(col("user_id") >= 0)
      .select(expr("cast(cast(ts as long) div 86400 as bigint)").as("d"),
        expr("cast(user_id as bigint) div 63").as("w"),
        expr("shiftleft(cast(1 as bigint), cast(cast(user_id as bigint) % 63 as int))").as("bit"))
      .groupBy(col("d"), col("w")).agg(expr("bit_or(bit)").as("bm"))
    val daily = dw.groupBy(col("d")).agg(sum(bit_count(col("bm"))).as("dau"))
    val win = dw
      .select(explode(sequence(col("d"), col("d") + 6)).as("td"), col("w"), col("bm"))
      .groupBy(col("td"), col("w")).agg(expr("bit_or(bm)").as("bm7"))
      .groupBy(col("td")).agg(sum(bit_count(col("bm7"))).as("wau"))
    // only days that actually have data (edge days past the frontier
    // would otherwise report partial trailing windows)
    daily.join(win, daily("d") === win("td"))
      .select(col("d"), col("dau"), col("wau"),
        floor(col("dau").cast("double") / col("wau").cast("double") * 1e6 + 0.5)
          .cast("long").as("stickiness_micro"))
      .orderBy(col("d"))
  }

  val queries: Map[String, Q] = Map(
    "q232_rolling_distinct" -> q232RollingDistinct,
    "q230_chi_square" -> q230ChiSquare,
    "q237_weighted_sample" -> q237WeightedSample,
    "q240_anova_f" -> q240AnovaF,
    "q241_mann_kendall" -> q241MannKendall,
    "q242_kruskal_wallis" -> q242KruskalWallis,
    "q249_cusum_monitor" -> q249Cusum,
    "q266_page_hinkley" -> q266PageHinkley,
    "q253_ks_drift" -> q253KsDrift,
    "q265_bh_fdr" -> q265BhFdr,
    "q268_burstiness" -> q268Burstiness,
    "q269_adwin_cut" -> q269AdwinCut,
    "q254_ljung_box" -> q254LjungBox,
    "q259_pacf" -> q259Pacf,
    "q255_eb_shrinkage" -> q255EbShrinkage,
    "q226_burn_rate" -> q226BurnRate,
    "q225_k_anonymity" -> q225KAnonymity,
    "q224_holt_linear" -> q224HoltLinear,
    "q223_trimmed_stats" -> q223TrimmedStats,
    "q222_theil_sen" -> q222TheilSen,
    "q221_poisson_bootstrap" -> q221PoissonBootstrap,
    "q216_mann_whitney" -> q216MannWhitney,
    "q215_kaplan_meier" -> q215KaplanMeier,
    "q214_hdr_quantiles" -> q214HdrQuantiles,
    "q213_bitmap_retention" -> q213BitmapRetention,
    "q212_countmin" -> q212CountMin,
    "q211_hll_cardinality" -> q211HllCardinality,
    "q210_entity_resolution" -> q210EntityResolution,
    "q209_kde_amount" -> q209KdeAmount,
    "q206_trace_breakdown" -> q206TraceBreakdown,
    "q205_equidepth_twophase" -> q205EquidepthTwophase,
    "q204_promql_eval" -> q204PromqlEval,
    "q203_temp_mixture" -> q203TempMixture,
    "q201_bucketed_join" -> q201BucketedJoin,
    "q202_weighted_sample" -> q202WeightedSample,
    "q98_zorder"     -> q98Zorder,
    "q99_orc_roundtrip" -> q99OrcRoundtrip,
    "q100_union_by_name" -> q100UnionByName,
    "q103_bloom_prune" -> q103BloomPrune,
    "q105_partition_prune" -> q105PartitionPrune,
    "q106_funnel" -> q106Funnel,
    "q107_jsonl_roundtrip" -> q107JsonlRoundtrip,
    "q108_gap_fill" -> q108GapFill,
    "q109_unpivot" -> q109Unpivot,
    "q154_retention" -> q154Retention,
    "q155_rolling_active" -> q155RollingActive,
    // q156/q179/q182 serve their exact two-phase twins (round-11
    // directive #3): same oracles, hashes proven equal by the shared SQL
    // + TwoPhaseParitySpec; window forms demoted to *WindowRef
    "q156_rfm" -> q199RfmTwophase,
    "q199_rfm_twophase" -> q199RfmTwophase,
    "q200_gini_twophase" -> q200GiniTwophase,
    "q59_coercion"      -> q59Coercion,
    "q73_grouping_sets" -> q73GroupingSets,
    "q74_range_frame"   -> q74RangeFrame,
    "q67_stats_fns"     -> q67StatsFns,
    "q68_edit_distance" -> q68EditDistance,
    "q69_datetime_fns"  -> q69DatetimeFns,
    "q70_null_semantics" -> q70NullSemantics,
    "q66_session_windows" -> q66SessionWindows,
    "q60_sql_surface"   -> q60SqlSurface,
    "q62_pivot"         -> q62Pivot,
    "q63_explode"       -> q63Explode,
    "q64_approx"        -> q64ApproxSketches,
    "q50_right_join"    -> q50RightJoin,
    "q51_full_join"     -> q51FullJoin,
    "q52_asof_join"     -> q52AsofJoin,
    "q53_regex_fns"     -> q53RegexFns,
    "q54_json_map"      -> q54JsonMap,
    "q55_csv_roundtrip" -> q55CsvRoundtrip,
    "q56_generators"    -> q56Generators,
    "q88_attribution"   -> q88Attribution,
    "q89_event_props"   -> q89EventProps,
    "q158_markov_transitions" -> q158MarkovTransitions,
    "q159_scd2"         -> q159Scd2,
    "q160_dq_suite"     -> q160DqSuite,
    "q164_seasonality"  -> q164Seasonality,
    "q165_ab_test"      -> q165AbTest,
    "q166_ewma"         -> q166Ewma,
    "q167_trend_fit"    -> q167TrendFit,
    "q168_correlated_subq" -> q168CorrelatedSubq,
    "q170_assoc_rules"  -> q170AssocRules,
    "q171_benford"      -> q171Benford,
    "q172_exists_subq"  -> q172ExistsSubq,
    "q173_cusum"        -> q173Cusum,
    "q175_woe_iv"       -> q175WoeIv,
    "q176_skyline"      -> q176Skyline,
    "q177_peak_concurrency" -> q177PeakConcurrency,
    "q178_share_of_parent" -> q178ShareOfParent,
    "q179_gini_lorenz"  -> q200GiniTwophase,
    "q182_equidepth_hist" -> q205EquidepthTwophase,
    "q184_peer_anomaly" -> q184PeerAnomaly,
    "q185_autocorrelation" -> q185Autocorrelation,
    "q186_apportionment" -> q186Apportionment,
    "q187_distributed_select" -> q187DistributedSelect,
    "q188_pps_sample"   -> q188PpsSample,
    "q189_cross_correlation" -> q189CrossCorrelation,
    "q190_seasonal_decompose" -> q190SeasonalDecompose,
    "q191_weighted_select" -> q191WeightedSelect,
    "q192_multiset_ops" -> q192MultisetOps,
    "q193_timeseries_profile" -> q193TimeseriesProfile,
    "q195_lateral"      -> q195Lateral,
  )

  private val q98ZorderSql: String = {
    import graft.operators.ZOrder
    val na = ZOrder.minMaxNormalizeSql("l_partkey", "(SELECT min(l_partkey)::DOUBLE FROM lineitem)",
      "(SELECT max(l_partkey)::DOUBLE FROM lineitem)")
    val nb = ZOrder.minMaxNormalizeSql("l_suppkey", "(SELECT min(l_suppkey)::DOUBLE FROM lineitem)",
      "(SELECT max(l_suppkey)::DOUBLE FROM lineitem)")
    s"""WITH z AS (SELECT ${ZOrder.zValueSql(s"($na)", s"($nb)")} AS z FROM lineitem)
       |SELECT z >> 24 AS z_bucket, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(z) AS BIGINT) AS z_sum
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Shared RFM oracle (q156 and its q199 two-phase twin — identical
    * output rows by construction, one SQL). */
  private lazy val duckRfmSql: String =
    """WITH md AS (SELECT max(CAST(ts AS DATE)) AS d1 FROM events),
      |pu AS (SELECT user_id, max(CAST(ts AS DATE)) AS last_d,
      |    CAST(count(*) AS BIGINT) AS freq, round(sum(value), 2) AS monetary
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
      |base AS (SELECT user_id,
      |    CAST(date_diff('day', last_d, d1) AS BIGINT) AS r_days, freq, monetary
      |  FROM pu CROSS JOIN md)
      |SELECT user_id, r_days, freq, monetary,
      |  CAST(ntile(4) OVER (ORDER BY r_days, user_id) AS BIGINT) AS r_q,
      |  CAST(ntile(4) OVER (ORDER BY freq DESC, user_id) AS BIGINT) AS f_q,
      |  CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS BIGINT) AS m_q,
      |  CAST(ntile(4) OVER (ORDER BY r_days, user_id) * 100 +
      |    ntile(4) OVER (ORDER BY freq DESC, user_id) * 10 +
      |    ntile(4) OVER (ORDER BY monetary DESC, user_id) AS BIGINT) AS rfm
      |FROM base ORDER BY user_id""".stripMargin

  /** Shared equi-depth histogram oracle (q182 and its q205 two-phase
    * twin — identical deterministic total order, so identical buckets). */
  private lazy val duckEquidepthSql: String =
    """WITH r AS (SELECT l_extendedprice AS v,
      |    CAST(ntile(16) OVER (ORDER BY l_extendedprice, l_orderkey,
      |      l_linenumber) AS BIGINT) AS bucket
      |  FROM lineitem)
      |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
      |  min(v) AS lo, max(v) AS hi,
      |  CAST(count(DISTINCT v) AS BIGINT) AS ndv
      |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Shared Lorenz/Gini oracle (q179 and its q200 two-phase twin). */
  private lazy val duckGiniSql: String =
    """WITH pc AS (SELECT o_custkey,
        |    CAST(floor(round(sum(o_totalprice), 2) * 100.0 + 0.5) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY o_custkey),
        |r AS (SELECT cents,
        |    CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS i,
        |    CAST(ntile(10) OVER (ORDER BY cents, o_custkey) AS BIGINT) AS dec
        |  FROM pc),
        |d AS (SELECT dec, CAST(count(*) AS BIGINT) AS n_cust,
        |    CAST(sum(cents) AS BIGINT) AS dec_cents,
        |    CAST(sum(i * cents) AS BIGINT) AS dec_ix
        |  FROM r GROUP BY dec),
        |w AS (SELECT dec, n_cust,
        |    CAST(sum(dec_cents) OVER (ORDER BY dec ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum_cents,
        |    CAST(sum(dec_cents) OVER () AS BIGINT) AS t,
        |    CAST(sum(n_cust) OVER () AS BIGINT) AS n,
        |    CAST(sum(dec_ix) OVER () AS BIGINT) AS six
        |  FROM d)
        |SELECT dec, n_cust,
        |  floor((cum_cents::DOUBLE / t::DOUBLE) * 10000.0 + 0.5) / 10000.0
        |    AS cum_share,
        |  CAST(floor((2.0 * six::DOUBLE - (n + 1)::DOUBLE * t::DOUBLE) /
        |    (n::DOUBLE * t::DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS gini_micro
        |FROM w ORDER BY dec""".stripMargin

  val oracle: Map[String, String] = Map(
    // q232: identical 63-bit word bitmaps, identical ×7 day fan-out,
    // OR + popcount windowed distinct — all exact longs
    "q232_rolling_distinct" ->
      """WITH dw AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
        |    CAST(user_id AS BIGINT) // 63 AS w,
        |    bit_or(1::BIGINT << CAST(CAST(user_id AS BIGINT) % 63 AS INT)) AS bm
        |  FROM events WHERE user_id >= 0 GROUP BY 1, 2),
        |daily AS (SELECT d, CAST(sum(bit_count(bm)) AS BIGINT) AS dau
        |  FROM dw GROUP BY d),
        |fan AS (SELECT d + o AS td, w, bm
        |  FROM dw, (SELECT unnest(range(0, 7)) AS o)),
        |win AS (SELECT td, CAST(sum(bit_count(bm7)) AS BIGINT) AS wau FROM (
        |    SELECT td, w, bit_or(bm) AS bm7 FROM fan GROUP BY td, w)
        |  GROUP BY td)
        |SELECT daily.d, daily.dau, win.wau,
        |  CAST(floor(CAST(daily.dau AS DOUBLE) / CAST(win.wau AS DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) AS stickiness_micro
        |FROM daily JOIN win ON win.td = daily.d
        |ORDER BY daily.d""".stripMargin,
    // q230: identical contingency grid, double-widened expected counts,
    // per-cell micro floors before the exact integer total
    // q237: identical hash-derived u, identical ln(u)/w double chain
    // pico-floored, same (key desc, custkey) top-k
    "q237_weighted_sample" -> {
      val h = graft.llm.LlmQueries.duckTokHash("'es#' || CAST(o_custkey AS VARCHAR)")
      s"""WITH spend AS (SELECT o_custkey,
         |    CAST(floor(round(sum(o_totalprice), 2) * 100.0 + 0.5) AS BIGINT) AS w
         |  FROM orders GROUP BY o_custkey),
         |keyed AS (SELECT o_custkey, w,
         |    CAST(floor(ln(CAST(($h) + 1 AS DOUBLE) / 1000000008.0)
         |      / CAST(w AS DOUBLE) * 1000000000000.0) AS BIGINT) AS key_pico
         |  FROM spend WHERE w > 0)
         |SELECT * FROM (SELECT o_custkey, w, key_pico FROM keyed
         |  ORDER BY key_pico DESC, o_custkey LIMIT 20)
         |ORDER BY o_custkey""".stripMargin
    },
    // q241: same bounded daily-grid pair join, same integer S/tie
    // terms, same continuity-corrected z double chain
    "q241_mann_kendall" ->
      """WITH daily AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
        |    CAST(sum(CAST(floor(round(value, 2) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |s AS (SELECT CAST(coalesce(sum(CASE WHEN b.v > a.v THEN 1
        |      WHEN b.v < a.v THEN -1 ELSE 0 END), 0) AS BIGINT) AS s_stat
        |  FROM daily a JOIN daily b ON b.d > a.d),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_values,
        |    CAST(sum(t) AS BIGINT) AS n_days,
        |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        |  FROM (SELECT v, count(*) AS t FROM daily GROUP BY v)),
        |x AS (SELECT n_days, n_values, s_stat, tie_term,
        |    CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS BIGINT) AS var18
        |  FROM s, t)
        |SELECT n_days, n_values, s_stat, tie_term, var18,
        |  CAST(floor((CASE
        |    WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)
        |      / sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |    WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)
        |      / sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |    ELSE 0.0 END) * 1000000.0 + 0.5) AS BIGINT) AS z_micro,
        |  CAST(sign(s_stat) AS BIGINT) AS trend
        |FROM x""".stripMargin,
    // q242: same doubled-grid midranks off the value histogram's
    // cumulative, same per-group floors, same H double chains
    "q242_kruskal_wallis" ->
      """WITH rows0 AS (SELECT event_type AS g,
        |    CAST(floor(round(value, 2) * 100.0 + 0.5) AS BIGINT) AS v FROM events),
        |grid AS (SELECT v, CAST(count(*) AS BIGINT) AS m FROM rows0 GROUP BY v),
        |cum AS (SELECT v, m,
        |    CAST(coalesce(sum(m) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below
        |  FROM grid),
        |gv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c_gv FROM rows0 GROUP BY g, v),
        |r2g AS (SELECT g, CAST(sum(c_gv) AS BIGINT) AS n_g,
        |    CAST(sum(c_gv * (2 * below + m + 1)) AS BIGINT) AS r2
        |  FROM gv JOIN cum USING (v) GROUP BY g),
        |pg AS (SELECT n_g, CAST(floor(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
        |    / (4.0 * CAST(n_g AS DOUBLE)) + 0.5) AS BIGINT) AS t_g FROM r2g),
        |tt AS (SELECT CAST(sum(m * m * m - m) AS BIGINT) AS tie3 FROM grid),
        |m0 AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(sum(t_g) AS BIGINT) AS rsum FROM pg)
        |SELECT k, n, rsum AS rank_sq_sum, tie3,
        |  CAST(floor((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
        |    * CAST(rsum AS DOUBLE) - 3.0 * (CAST(n AS DOUBLE) + 1.0))
        |    * 1000000.0 + 0.5) AS BIGINT) AS h_micro,
        |  CAST(floor((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
        |    * CAST(rsum AS DOUBLE) - 3.0 * (CAST(n AS DOUBLE) + 1.0))
        |    / (1.0 - CAST(tie3 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |        - CAST(n AS DOUBLE)))
        |    * 1000000.0 + 0.5) AS BIGINT) AS h_tie_micro
        |FROM m0, tt""".stripMargin,
    // q240: identical exact cent-grid moments, per-group floors before
    // the exact integer total, identical-order double closed forms
    "q240_anova_f" ->
      """WITH g AS (SELECT event_type AS t, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(CAST(floor(round(value, 2) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS s_g,
        |    CAST(sum(CAST(floor(round(value, 2) * 100.0 + 0.5) AS BIGINT)
        |      * CAST(floor(round(value, 2) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS ss_g
        |  FROM events GROUP BY 1),
        |pg AS (SELECT n_g, s_g, ss_g,
        |    CAST(floor(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
        |      / CAST(n_g AS DOUBLE) + 0.5) AS BIGINT) AS t_g FROM g),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(sum(s_g) AS BIGINT) AS sx, CAST(sum(ss_g) AS BIGINT) AS sxx,
        |    CAST(sum(t_g) AS BIGINT) AS tsum FROM pg),
        |x AS (SELECT k, n,
        |    CAST(tsum AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS ssb,
        |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS sst
        |  FROM m)
        |SELECT k, n,
        |  CASE WHEN k < 2 OR n <= k OR (sst - ssb) <= 0 THEN -1
        |    ELSE CAST(floor(ssb + 0.5) AS BIGINT) END AS ssb_cents2,
        |  CASE WHEN k < 2 OR n <= k OR (sst - ssb) <= 0 THEN -1
        |    ELSE CAST(floor((sst - ssb) + 0.5) AS BIGINT) END AS ssw_cents2,
        |  CASE WHEN k < 2 OR n <= k OR (sst - ssb) <= 0 THEN -1
        |    ELSE CAST(floor((ssb / CAST(k - 1 AS DOUBLE))
        |      / ((sst - ssb) / CAST(n - k AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) END AS f_micro,
        |  CASE WHEN k < 2 OR n <= k OR (sst - ssb) <= 0 THEN -1
        |    ELSE CAST(floor(ssb / sst * 1000000.0 + 0.5) AS BIGINT) END AS eta2_micro
        |FROM x""".stripMargin,
    // q249: identical daily grid, identical frozen-baseline floor
    // divisions, identical prefix/running-min closed form — pure
    // integer arithmetic on both engines
    "q249_cusum_monitor" ->
      s"""WITH daily AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
        |    CAST(sum(CAST(floor(round(value, 2) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |cut AS (SELECT max(d) AS cd, CAST(sum(v) AS BIGINT) AS sb
        |  FROM (SELECT d, v FROM daily ORDER BY d LIMIT $CusumBaselineDays)),
        |params AS (SELECT cd,
        |    sb // $CusumBaselineDays AS mu0,
        |    (sb // $CusumBaselineDays) // 20 AS slack,
        |    (sb // $CusumBaselineDays) // 2 AS h FROM cut),
        |pref AS (SELECT d, v, mu0, slack, h,
        |    CAST(sum(v - (mu0 + slack)) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pp,
        |    CAST(sum((mu0 - slack) - v) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pn
        |  FROM daily, params WHERE d > cd),
        |traj AS (SELECT d, v, h,
        |    pp - least(CAST(min(pp) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 0) AS s_pos,
        |    pn - least(CAST(min(pn) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 0) AS s_neg
        |  FROM pref)
        |SELECT d, v AS v_cents, s_pos AS s_pos_cents, s_neg AS s_neg_cents,
        |  CAST(CASE WHEN s_pos > h OR s_neg > h THEN 1 ELSE 0 END AS BIGINT) AS alarm
        |FROM traj ORDER BY d""".stripMargin,
    // q253: identical frozen 7-day reference, identical merged-grid
    // lattice and cross-multiplied integer deviations (DuckDB's
    // BIGINT*BIGINT promotes to HUGEINT — already exact), identical
    // final double division
    "q253_ks_drift" ->
      s"""WITH ev AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
        |    CAST(floor(round(value, 2) * 100.0 + 0.5) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |cutq AS (SELECT max(d) AS cut
        |  FROM (SELECT DISTINCT d FROM ev ORDER BY d LIMIT $KsBaselineDays)),
        |ref AS (SELECT v, CAST(count(*) AS BIGINT) AS cref
        |  FROM ev, cutq WHERE d <= cut GROUP BY v),
        |nref AS (SELECT CAST(coalesce(sum(cref), 0) AS BIGINT) AS n_ref FROM ref),
        |live AS (SELECT d, v, CAST(count(*) AS BIGINT) AS c
        |  FROM ev, cutq WHERE d > cut GROUP BY d, v),
        |livedays AS (SELECT DISTINCT d FROM live),
        |allv AS (SELECT DISTINCT v FROM
        |  (SELECT v FROM ref UNION ALL SELECT v FROM live)),
        |refcum AS (SELECT a.v,
        |    CAST(sum(coalesce(r.cref, 0)) OVER (ORDER BY a.v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumref
        |  FROM allv a LEFT JOIN ref r ON r.v = a.v),
        |dense AS (SELECT a.v, ld.d, CAST(coalesce(l.c, 0) AS BIGINT) AS c
        |  FROM allv a CROSS JOIN livedays ld
        |  LEFT JOIN live l ON l.v = a.v AND l.d = ld.d),
        |cum AS (SELECT v, d,
        |    CAST(sum(c) OVER (PARTITION BY v ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cl
        |  FROM dense),
        |cum2 AS (SELECT v, d, cl,
        |    CAST(sum(cl) OVER (PARTITION BY d ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cuml,
        |    CAST(sum(cl) OVER (PARTITION BY d) AS BIGINT) AS n_live
        |  FROM cum),
        |dev AS (SELECT c2.d, c2.n_live, nref.n_ref,
        |    abs(rc.cumref * c2.n_live - c2.cuml * nref.n_ref) AS dev
        |  FROM cum2 c2 JOIN refcum rc ON rc.v = c2.v CROSS JOIN nref)
        |SELECT d, n_live, n_ref,
        |  CAST(max(dev) AS BIGINT) AS d_num,
        |  CAST(floor(CAST(max(dev) AS DOUBLE)
        |    / (CAST(n_ref AS DOUBLE) * CAST(n_live AS DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT) AS d_micro
        |FROM dev GROUP BY d, n_live, n_ref ORDER BY d""".stripMargin,
    // q266: same daily cent totals and frozen-scale CTE as q249; the
    // per-row mean deviation is the identical floor(CAST(num AS
    // DOUBLE)/t) chain (never // — sign-dependent), every cumulative
    // and running min pure BIGINT
    "q266_page_hinkley" ->
      """WITH daily AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
        |    CAST(sum(CAST(floor(round(value, 2) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |base AS (SELECT max(d) AS cut, CAST(sum(v) AS BIGINT) AS sb
        |  FROM (SELECT d, v FROM daily ORDER BY d LIMIT 7)),
        |par AS (SELECT cut, (sb // 7) // 50 AS delta, (sb // 7) // 2 AS lambda
        |  FROM base),
        |seq AS (SELECT d, v,
        |    CAST(count(*) OVER w AS BIGINT) AS t,
        |    CAST(sum(v) OVER w AS BIGINT) AS cum
        |  FROM daily, par WHERE d > cut
        |  WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |terms AS (SELECT d, v, t,
        |    CAST(floor(CAST(v * t - cum AS DOUBLE) / t) AS BIGINT) - p.delta AS term_pos,
        |    CAST(floor(CAST(cum - v * t AS DOUBLE) / t) AS BIGINT) - p.delta AS term_neg
        |  FROM seq, par p),
        |m AS (SELECT d, v, t,
        |    CAST(sum(term_pos) OVER w2 AS BIGINT) AS m_pos,
        |    CAST(sum(term_neg) OVER w2 AS BIGINT) AS m_neg
        |  FROM terms
        |  WINDOW w2 AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT d, v AS v_cents, t,
        |  m_pos - min(m_pos) OVER w3 AS ph_pos,
        |  m_neg - min(m_neg) OVER w3 AS ph_neg,
        |  CAST(CASE WHEN (m_pos - min(m_pos) OVER w3) > p.lambda
        |      OR (m_neg - min(m_neg) OVER w3) > p.lambda
        |    THEN 1 ELSE 0 END AS BIGINT) AS alarm
        |FROM m, par p
        |WINDOW w3 AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY d""".stripMargin,
    // q269: same daily cent grid and running prefix/range windows, same
    // calendar² cut lattice, identical dmu/eps double chains
    // micro-floored, same pure-integer detection and (excess DESC,
    // n0 ASC) best-cut order
    "q269_adwin_cut" ->
      """WITH daily AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
        |    CAST(sum(CAST(floor(round(value, 2) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |pre AS (SELECT d, v,
        |    CAST(count(*) OVER w AS BIGINT) AS t,
        |    CAST(sum(v) OVER w AS BIGINT) AS s,
        |    CAST(max(v) OVER w - min(v) OVER w AS BIGINT) AS rng
        |  FROM daily
        |  WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |cuts AS (SELECT a.d, a.t, a.s, a.rng, b.t AS n0, b.s AS s0
        |  FROM pre a JOIN pre b ON b.t < a.t),
        |scored AS (SELECT d, t, n0,
        |    CAST(floor(abs(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
        |      - CAST(s - s0 AS DOUBLE) / CAST(t - n0 AS DOUBLE))
        |      * 1000000.0 + 0.5) AS BIGINT) AS dmu_micro,
        |    CAST(floor(CAST(rng AS DOUBLE)
        |      * sqrt(ln(4.0 * CAST(t AS DOUBLE) / 0.05)
        |        / (2.0 * (CAST(n0 AS DOUBLE) * CAST(t - n0 AS DOUBLE)
        |          / (CAST(n0 AS DOUBLE) + CAST(t - n0 AS DOUBLE)))))
        |      * 1000000.0 + 0.5) AS BIGINT) AS eps_micro
        |  FROM cuts),
        |sel AS (SELECT d, n0 AS n0_best, dmu_micro, eps_micro,
        |    CAST(CASE WHEN dmu_micro - eps_micro > 0 THEN 1 ELSE 0 END AS BIGINT)
        |      AS detected
        |  FROM (SELECT *, row_number() OVER (PARTITION BY d
        |      ORDER BY dmu_micro - eps_micro DESC, n0 ASC) AS rn FROM scored)
        |  WHERE rn = 1)
        |SELECT d, t, v AS v_cents,
        |  CAST(coalesce(n0_best, -1) AS BIGINT) AS n0_best,
        |  CAST(coalesce(dmu_micro, -2000000) AS BIGINT) AS dmu_micro,
        |  CAST(coalesce(eps_micro, -2000000) AS BIGINT) AS eps_micro,
        |  CAST(coalesce(detected, 0) AS BIGINT) AS detected,
        |  CAST(max(coalesce(detected, 0)) OVER (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS alarmed_by
        |FROM pre LEFT JOIN sel USING (d)
        |ORDER BY d""".stripMargin,
    // q268: same (type × day) count grid, same five exact lag moments
    // off the consecutive-day lead, identical B/Fano/M double chains
    // micro-floored, same zero-variance sentinel
    "q268_burstiness" ->
      """WITH daily AS (SELECT event_type AS g,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |mom AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS sc, CAST(sum(c * c) AS BIGINT) AS sc2
        |  FROM daily GROUP BY g),
        |lagd AS (SELECT g, c,
        |    lead(c, 1) OVER (PARTITION BY g ORDER BY d) AS cn
        |  FROM daily),
        |lagm AS (SELECT g, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(c) AS BIGINT) AS sx, CAST(sum(cn) AS BIGINT) AS sy,
        |    CAST(sum(c * c) AS BIGINT) AS sxx, CAST(sum(cn * cn) AS BIGINT) AS syy,
        |    CAST(sum(c * cn) AS BIGINT) AS sxy
        |  FROM lagd WHERE cn IS NOT NULL GROUP BY g)
        |SELECT m.g AS event_type, m.n AS n_days, m.sc AS n_events,
        |  CAST(floor((sqrt((CAST(m.n AS DOUBLE) * CAST(m.sc2 AS DOUBLE)
        |        - CAST(m.sc AS DOUBLE) * CAST(m.sc AS DOUBLE))
        |        / (CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)))
        |      - CAST(m.sc AS DOUBLE) / CAST(m.n AS DOUBLE))
        |    / (sqrt((CAST(m.n AS DOUBLE) * CAST(m.sc2 AS DOUBLE)
        |        - CAST(m.sc AS DOUBLE) * CAST(m.sc AS DOUBLE))
        |        / (CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)))
        |      + CAST(m.sc AS DOUBLE) / CAST(m.n AS DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT) AS b_micro,
        |  CAST(floor((CAST(m.n AS DOUBLE) * CAST(m.sc2 AS DOUBLE)
        |      - CAST(m.sc AS DOUBLE) * CAST(m.sc AS DOUBLE))
        |    / (CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE))
        |    / (CAST(m.sc AS DOUBLE) / CAST(m.n AS DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT) AS fano_micro,
        |  CAST(coalesce(floor((CAST(l.k AS DOUBLE) * CAST(l.sxy AS DOUBLE)
        |      - CAST(l.sx AS DOUBLE) * CAST(l.sy AS DOUBLE))
        |    / (CASE WHEN sqrt((CAST(l.k AS DOUBLE) * CAST(l.sxx AS DOUBLE)
        |          - CAST(l.sx AS DOUBLE) * CAST(l.sx AS DOUBLE))
        |        * (CAST(l.k AS DOUBLE) * CAST(l.syy AS DOUBLE)
        |          - CAST(l.sy AS DOUBLE) * CAST(l.sy AS DOUBLE))) > 0.0
        |      THEN sqrt((CAST(l.k AS DOUBLE) * CAST(l.sxx AS DOUBLE)
        |          - CAST(l.sx AS DOUBLE) * CAST(l.sx AS DOUBLE))
        |        * (CAST(l.k AS DOUBLE) * CAST(l.syy AS DOUBLE)
        |          - CAST(l.sy AS DOUBLE) * CAST(l.sy AS DOUBLE))) END)
        |    * 1000000.0 + 0.5), -2000000) AS BIGINT) AS memory_micro,
        |  CAST(coalesce(l.k, 0) AS BIGINT) AS n_pairs
        |FROM mom m LEFT JOIN lagm l ON l.g = m.g
        |ORDER BY event_type""".stripMargin,
    // q265: same cent grid, same one-vs-rest cross-multiplied exact KS
    // numerator, same DKW double chain micro-floored, same m×m
    // lexicographic rank join, same pure-integer BH comparisons
    "q265_bh_fdr" ->
      s"""WITH ev AS (SELECT event_type AS g,
         |    CAST(floor(round(value, 2) * 100.0 + 0.5) AS BIGINT) AS v
         |  FROM events),
         |gv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1, 2),
         |grid AS (SELECT v, CAST(count(*) AS BIGINT) AS m FROM ev GROUP BY v),
         |cumall AS (SELECT v, CAST(sum(m) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_all
         |  FROM grid),
         |groups AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_g FROM gv GROUP BY g),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ev),
         |mh AS (SELECT CAST(count(*) AS BIGINT) AS m_hyp FROM groups),
         |dense AS (SELECT gr.g, a.v, CAST(coalesce(x.c, 0) AS BIGINT) AS c
         |  FROM (SELECT v FROM grid) a CROSS JOIN (SELECT g FROM groups) gr
         |  LEFT JOIN gv x ON x.g = gr.g AND x.v = a.v),
         |cum AS (SELECT g, v, CAST(sum(c) OVER (PARTITION BY g ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_g
         |  FROM dense),
         |dv AS (SELECT c.g, gp.n_g, t.n - gp.n_g AS n_rest,
         |    abs(c.cum_g * (t.n - gp.n_g) - (ca.cum_all - c.cum_g) * gp.n_g) AS dev
         |  FROM cum c JOIN cumall ca USING (v)
         |  JOIN groups gp ON gp.g = c.g CROSS JOIN tot t),
         |dmax AS (SELECT g, CAST(max(n_g) AS BIGINT) AS n_g,
         |    CAST(max(n_rest) AS BIGINT) AS n_rest, max(dev) AS dev
         |  FROM dv GROUP BY g),
         |scored AS (SELECT g, n_g, n_rest, CAST(dev AS BIGINT) AS d_num,
         |    CAST(floor(CAST(dev AS DOUBLE)
         |      / (CAST(n_g AS DOUBLE) * CAST(n_rest AS DOUBLE))
         |      * 1000000.0 + 0.5) AS BIGINT) AS d_micro,
         |    CAST(floor(least(1.0, 2.0 * exp(-2.0
         |      * (CAST(dev AS DOUBLE) / (CAST(n_g AS DOUBLE) * CAST(n_rest AS DOUBLE)))
         |      * (CAST(dev AS DOUBLE) / (CAST(n_g AS DOUBLE) * CAST(n_rest AS DOUBLE)))
         |      * (CAST(n_g AS DOUBLE) * CAST(n_rest AS DOUBLE)
         |        / (CAST(n_g AS DOUBLE) + CAST(n_rest AS DOUBLE)))))
         |      * 1000000.0 + 0.5) AS BIGINT) AS p_micro
         |  FROM dmax),
         |rnk AS (SELECT a.g, CAST(count(*) AS BIGINT) AS rnk
         |  FROM scored a JOIN scored b
         |    ON b.p_micro < a.p_micro OR (b.p_micro = a.p_micro AND b.g <= a.g)
         |  GROUP BY a.g),
         |kq AS (SELECT CAST(coalesce(max(CASE WHEN s.p_micro * mh.m_hyp
         |      <= r.rnk * $BhAlphaMicro THEN r.rnk END), 0) AS BIGINT) AS k_bh
         |  FROM scored s JOIN rnk r USING (g) CROSS JOIN mh)
         |SELECT s.g AS event_type, s.n_g, s.n_rest, s.d_num, s.d_micro,
         |  s.p_micro, r.rnk, mh.m_hyp,
         |  CAST(CASE WHEN s.p_micro * mh.m_hyp <= r.rnk * $BhAlphaMicro
         |    THEN 1 ELSE 0 END AS BIGINT) AS bh_flag,
         |  kq.k_bh,
         |  CAST(CASE WHEN r.rnk <= kq.k_bh THEN 1 ELSE 0 END AS BIGINT) AS rejected
         |FROM scored s JOIN rnk r USING (g) CROSS JOIN mh CROSS JOIN kq
         |ORDER BY event_type""".stripMargin,
    "q230_chi_square" ->
      """WITH cells AS (SELECT event_type AS t,
        |    (CAST(floor(epoch(ts)) AS BIGINT) // 86400) % 7 AS dow,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT t, CAST(sum(o) AS BIGINT) AS r_tot FROM cells GROUP BY t),
        |c AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c_tot FROM cells GROUP BY dow),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |    CAST(count(DISTINCT t) AS BIGINT) AS r_cats,
        |    CAST(count(DISTINCT dow) AS BIGINT) AS c_cats FROM cells),
        |pc AS (SELECT tot.n, tot.r_cats, tot.c_cats,
        |    CAST(floor((CAST(o AS DOUBLE) -
        |        CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |      * (CAST(o AS DOUBLE) -
        |        CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |      / (CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |      * 1000000.0 + 0.5) AS BIGINT) AS cell_micro
        |  FROM cells JOIN r USING (t) JOIN c USING (dow), tot)
        |SELECT n, r_cats, c_cats,
        |  (r_cats - 1) * (c_cats - 1) AS dof,
        |  CAST(sum(cell_micro) AS BIGINT) AS chi2_micro,
        |  CAST(floor(sqrt(CAST(sum(cell_micro) AS DOUBLE) / 1000000.0 /
        |    (CAST(n AS DOUBLE) * CAST(least(r_cats - 1, c_cats - 1) AS DOUBLE)))
        |    * 1000000.0 + 0.5) AS BIGINT) AS cramers_v_micro
        |FROM pc GROUP BY n, r_cats, c_cats""".stripMargin,
    // q226: identical hourly grid, identical RANGE-framed 6h rolling
    // sums (calendar semantics over hour gaps), pure-long page/ticket
    // cross-products, micro-floored burn values
    "q226_burn_rate" ->
      """WITH hourly AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errs,
        |    CAST(count(*) AS BIGINT) AS total
        |  FROM events GROUP BY 1),
        |rolled AS (SELECT h, errs, total,
        |    CAST(sum(errs) OVER w6 AS BIGINT) AS errs6,
        |    CAST(sum(total) OVER w6 AS BIGINT) AS total6
        |  FROM hourly
        |  WINDOW w6 AS (ORDER BY h RANGE BETWEEN 5 PRECEDING AND CURRENT ROW))
        |SELECT h, errs, total, errs6, total6,
        |  CAST(floor(CAST(errs AS DOUBLE) / CAST(total AS DOUBLE) / 0.02
        |    * 1000000.0 + 0.5) AS BIGINT) AS burn1h_micro,
        |  CAST(floor(CAST(errs6 AS DOUBLE) / CAST(total6 AS DOUBLE) / 0.02
        |    * 1000000.0 + 0.5) AS BIGINT) AS burn6h_micro,
        |  CAST(CASE WHEN errs * 1000000::BIGINT * 1000000 > 14400000::BIGINT * 20000 * total
        |    AND errs6 * 1000000::BIGINT * 1000000 > 14400000::BIGINT * 20000 * total6
        |    THEN 1 ELSE 0 END AS INTEGER) AS page,
        |  CAST(CASE WHEN errs * 1000000::BIGINT * 1000000 > 6000000::BIGINT * 20000 * total
        |    AND errs6 * 1000000::BIGINT * 1000000 > 6000000::BIGINT * 20000 * total6
        |    THEN 1 ELSE 0 END AS INTEGER) AS ticket
        |FROM rolled ORDER BY h""".stripMargin,
    // q223: the same four order statistics and tail sums restated as
    // rank-range aggregates under a full sort (tie order inside equal
    // values cannot move a rank-range sum)
    "q223_trimmed_stats" ->
      """WITH v AS (SELECT CAST(floor(round(l_extendedprice, 2) * 100.0 + 0.5) AS BIGINT) AS v
        |  FROM lineitem),
        |p AS (SELECT v, row_number() OVER (ORDER BY v) AS rn, count(*) OVER () AS n FROM v),
        |c AS (SELECT max(n) AS n, max(n) // 20 AS g FROM p),
        |cuts AS (SELECT
        |    (SELECT v FROM p, c WHERE rn = c.g) AS lo_cut,
        |    (SELECT v FROM p, c WHERE rn = c.g + 1) AS lo_rep,
        |    (SELECT v FROM p, c WHERE rn = c.n - c.g) AS hi_rep,
        |    (SELECT v FROM p, c WHERE rn = c.n - c.g + 1) AS hi_cut),
        |t AS (SELECT CAST(sum(v) AS BIGINT) AS trimmed_sum
        |  FROM p, c WHERE rn > c.g AND rn <= c.n - c.g)
        |SELECT CAST(c.n AS BIGINT) AS n, CAST(c.g AS BIGINT) AS g,
        |  cuts.lo_cut, cuts.hi_cut, t.trimmed_sum,
        |  CAST(floor(CAST(t.trimmed_sum AS DOUBLE) / CAST(c.n - 2 * c.g AS DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) AS trimmed_mean_micro,
        |  CAST(floor(CAST(t.trimmed_sum + c.g * cuts.lo_rep + c.g * cuts.hi_rep AS DOUBLE)
        |    / CAST(c.n AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS winsor_mean_micro
        |FROM c, cuts, t""".stripMargin,
    // q224: the identical milli-grid Holt recurrence as a recursive CTE
    // (floor(), not //, so negative trends floor identically)
    "q224_holt_linear" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
        |    CAST(floor(round(sum(value), 2) * 100.0 + 0.5) AS BIGINT) AS x
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |idx AS (SELECT d, x, row_number() OVER (ORDER BY d) AS rn FROM daily),
        |nn AS (SELECT max(rn) AS n FROM idx),
        |h AS (
        |  SELECT i1.rn, i1.d, i1.x,
        |    1000 * i1.x AS l,
        |    1000 * (i2.x - i1.x) AS b
        |  FROM idx i1 JOIN idx i2 ON i2.rn = 2 WHERE i1.rn = 1
        |  UNION ALL
        |  SELECT i.rn, i.d, i.x,
        |    CAST(floor((300000.0 * i.x + 700.0 * (h.l + h.b)) / 1000.0) AS BIGINT),
        |    CAST(floor((100.0 *
        |        (CAST(floor((300000.0 * i.x + 700.0 * (h.l + h.b)) / 1000.0) AS BIGINT) - h.l)
        |      + 900.0 * h.b) / 1000.0) AS BIGINT)
        |  FROM h JOIN idx i ON i.rn = h.rn + 1)
        |SELECT d, x AS x_cents, l AS level_milli, b AS trend_milli,
        |  l + b AS forecast_milli
        |FROM h ORDER BY d""".stripMargin,
    // q225: identical QI grid and rollup; balance band via floor(),
    // negative balances floor identically both engines
    "q225_k_anonymity" ->
      """WITH qi AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(round(c_acctbal, 2) / 1000.0) AS BIGINT) AS bal_band
        |  FROM customer),
        |g AS (SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS sz
        |  FROM qi GROUP BY 1, 2, 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(min(sz) AS BIGINT) AS k_anonymity,
        |  CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_groups_below_k,
        |  CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
        |  CAST(floor(CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(sz) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS suppression_micro
        |FROM g""".stripMargin,
    // q221: identical mixed hash (interleaved mods), identical
    // micro-grid Poisson(1) inverse-CDF thresholds, plain long sums;
    // only the mean divides — one double op in identical order
    "q221_poisson_bootstrap" ->
      """WITH li AS (
        |  SELECT CAST(l_orderkey AS BIGINT) AS ok, CAST(l_linenumber AS BIGINT) AS ln,
        |    CAST(floor(round(l_extendedprice, 2) * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |ex AS (SELECT ok, ln, cents, b FROM li, (SELECT unnest(range(0, 64)) AS b)),
        |h0 AS (SELECT cents, b,
        |    ((ok % 1000003) * 65599 + (ln % 1000003) * 4001 + b * 104729) % 2147483648 AS h0
        |  FROM ex),
        |h1 AS (SELECT cents, b, xor(h0, h0 >> 16) * 73244475 % 2147483648 AS h1 FROM h0),
        |h2 AS (SELECT cents, b, xor(h1, h1 >> 13) * 73244475 % 2147483648 AS h2 FROM h1),
        |u AS (SELECT cents, b, xor(h2, h2 >> 16) % 1000000 AS u FROM h2),
        |w AS (SELECT cents, b, CASE
        |    WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1 WHEN u < 919698 THEN 2
        |    WHEN u < 981011 THEN 3 WHEN u < 996340 THEN 4 WHEN u < 999405 THEN 5
        |    WHEN u < 999916 THEN 6 WHEN u < 999989 THEN 7 WHEN u < 999998 THEN 8
        |    ELSE 9 END AS w FROM u)
        |SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
        |  CAST(sum(w * cents) AS BIGINT) AS sum_cents,
        |  CAST(floor(CAST(sum(w * cents) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) AS mean_micro
        |FROM w GROUP BY b ORDER BY b""".stripMargin,
    // q222: identical daily cent grid, identical pairwise IEEE
    // quotients, nearest-rank median selection
    "q222_theil_sen" ->
      """WITH daily AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
        |    CAST(sum(CAST(floor(round(value, 2) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |pairs AS (SELECT CAST(b.v - a.v AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b ON b.d > a.d),
        |ranked AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rn,
        |    count(*) OVER () AS np FROM pairs)
        |SELECT CAST(max(np) AS BIGINT) AS n_pairs,
        |  CAST(floor(min(slope) * 1000000.0 + 0.5) AS BIGINT) AS lo_micro,
        |  CAST(floor(max(slope) * 1000000.0 + 0.5) AS BIGINT) AS hi_micro,
        |  CAST(floor((min(slope) + max(slope)) / 2.0 * 1000000.0 + 0.5) AS BIGINT) AS median_micro
        |FROM ranked
        |WHERE rn = (np + 1) // 2 OR rn = np // 2 + 1""".stripMargin,
    // q216: identical doubled-midrank grid — exact longs through 2U1,
    // identical-order double ops for the tie-corrected z and the
    // rank-biserial effect size
    "q216_mann_whitney" ->
      """WITH g AS (SELECT CAST(l_quantity AS BIGINT) AS q,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n0
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |r AS (SELECT q, n1, n0,
        |    2 * COALESCE(CAST(sum(n1 + n0) OVER (ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      + n1 + n0 + 1 AS two_r
        |  FROM g),
        |a AS (SELECT CAST(sum(n1) AS BIGINT) AS n1, CAST(sum(n0) AS BIGINT) AS n0,
        |    CAST(sum(n1 * two_r) AS BIGINT) AS two_r1,
        |    CAST(sum((n1 + n0) * (n1 + n0) * (n1 + n0) - (n1 + n0)) AS BIGINT) AS tie_t
        |  FROM r)
        |SELECT n1, n0, two_r1, two_r1 - n1 * (n1 + 1) AS two_u1, tie_t,
        |  CAST(floor(
        |    ((two_r1 - n1 * (n1 + 1))::DOUBLE / 2.0 - n1::DOUBLE * n0::DOUBLE / 2.0) /
        |    sqrt(n1::DOUBLE * n0::DOUBLE / 12.0 *
        |      ((n1 + n0 + 1)::DOUBLE - tie_t::DOUBLE /
        |        ((n1 + n0)::DOUBLE * (n1 + n0 - 1)::DOUBLE)))
        |    * 1000000.0 + 0.5) AS BIGINT) AS z_micro,
        |  CAST(floor(
        |    ((two_r1 - n1 * (n1 + 1))::DOUBLE / (n1::DOUBLE * n0::DOUBLE) - 1.0)
        |    * 1000000.0 + 0.5) AS BIGINT) AS rb_micro
        |FROM a""".stripMargin,
    // q215: identical epoch-day cohort derivation, identical stepwise
    // milli-floor product-limit fold — Spark's higher-order aggregate
    // and DuckDB's recursive CTE walk the same longs
    "q215_kaplan_meier" ->
      """WITH RECURSIVE ud AS (
        |  SELECT CAST(user_id AS BIGINT) AS uid,
        |    min(CAST(floor(epoch(ts)) AS BIGINT) // 3600) AS f,
        |    max(CAST(floor(epoch(ts)) AS BIGINT) // 3600) AS l
        |  FROM events GROUP BY 1),
        |fr AS (SELECT max(l) AS frontier FROM ud),
        |dur AS (SELECT l - f AS t,
        |    CASE WHEN l <= frontier - 72 THEN 1 ELSE 0 END AS event
        |  FROM ud, fr),
        |grid AS (SELECT t, CAST(sum(event) AS BIGINT) AS d,
        |    CAST(sum(1 - event) AS BIGINT) AS c
        |  FROM dur GROUP BY t),
        |risk AS (SELECT t, d, c,
        |    CAST(sum(d + c) OVER (ORDER BY t DESC) AS BIGINT) AS n,
        |    row_number() OVER (ORDER BY t) AS rn
        |  FROM grid),
        |km AS (
        |  SELECT rn, t, n, d, c, 1000000::BIGINT * (n - d) // n AS s
        |  FROM risk WHERE rn = 1
        |  UNION ALL
        |  SELECT r.rn, r.t, r.n, r.d, r.c, km.s * (r.n - r.d) // r.n
        |  FROM risk r JOIN km ON r.rn = km.rn + 1)
        |SELECT t, n AS n_risk, d, c, s AS s_micro
        |FROM km ORDER BY t""".stripMargin,
    // q214: identical cent grid, bitlen-derived bucket geometry,
    // ceil-division nearest ranks, cumulative walk over buckets
    "q214_hdr_quantiles" ->
      """WITH cents AS (
        |  SELECT v FROM (
        |    SELECT CAST(floor(round(value, 2) * 100.0 + 0.5) AS BIGINT) AS v
        |    FROM events) WHERE v >= 0),
        |g AS (SELECT v, greatest(0, length(bin(v)) - 5)::BIGINT AS e FROM cents),
        |bk AS (SELECT (e * 32 + (v >> e)) AS bucket,
        |    ((v >> e) << e) AS lo, (((v >> e) + 1) << e) AS hi
        |  FROM g),
        |hist AS (SELECT bucket, CAST(min(lo) AS BIGINT) AS lo,
        |    CAST(min(hi) AS BIGINT) AS hi, CAST(count(*) AS BIGINT) AS n
        |  FROM bk GROUP BY bucket),
        |cum AS (SELECT *, CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cumn
        |  FROM hist),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM hist),
        |qs AS (SELECT p::BIGINT AS p, n_total,
        |    (p * n_total + 99) // 100 AS k
        |  FROM (SELECT unnest([50, 90, 95, 99]) AS p), tot),
        |sel AS (SELECT q.p, q.n_total, q.k, min(c.bucket) AS bucket
        |  FROM qs q JOIN cum c ON c.cumn >= q.k
        |  GROUP BY q.p, q.n_total, q.k)
        |SELECT s.p, s.n_total, s.k, s.bucket, c.lo, c.hi
        |FROM sel s JOIN cum c ON c.bucket = s.bucket
        |ORDER BY s.p""".stripMargin,
    // q213: identical 63-bit word packing, bit_or bitmaps, AND+popcount
    // retention; day boundaries stay TIMESTAMP on both sides
    "q213_bitmap_retention" ->
      """WITH dw AS (
        |  SELECT date_trunc('day', ts) AS d,
        |    CAST(user_id AS BIGINT) // 63 AS w,
        |    bit_or(1::BIGINT << CAST(CAST(user_id AS BIGINT) % 63 AS INT)) AS bm
        |  FROM events WHERE user_id >= 0 GROUP BY 1, 2),
        |tot AS (SELECT d, CAST(sum(bit_count(bm)) AS BIGINT) AS n_active
        |  FROM dw GROUP BY d),
        |ret AS (SELECT a.d, CAST(sum(bit_count(a.bm & b.bm)) AS BIGINT) AS n_retained
        |  FROM dw a JOIN dw b ON b.d = a.d + INTERVAL 1 DAY AND b.w = a.w
        |  GROUP BY a.d)
        |SELECT t.d, t.n_active, tn.n_active AS n_next,
        |  coalesce(r.n_retained, 0) AS n_retained,
        |  CAST(floor(coalesce(r.n_retained, 0)::DOUBLE / t.n_active::DOUBLE
        |    * 1000000.0 + 0.5) AS BIGINT) AS ret_micro
        |FROM tot t
        |JOIN tot tn ON tn.d = t.d + INTERVAL 1 DAY
        |LEFT JOIN ret r ON r.d = t.d
        |ORDER BY t.d""".stripMargin,
    // q212: same seed-prefixed rolling hash + Wang mixer, same mod-512
    // buckets, plain-sum counters, min-of-4 probe — all exact longs
    "q212_countmin" ->
      """WITH counts AS (
        |  SELECT CAST(user_id AS BIGINT) AS uid, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |ex AS (SELECT uid, n, j FROM counts, (SELECT unnest(range(0, 4)) AS j)),
        |sh0 AS (SELECT uid, n, j,
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(range(1, length(CAST(j AS VARCHAR) || ':' || CAST(uid AS VARCHAR)) + 1),
        |        i -> ord(substr(CAST(j AS VARCHAR) || ':' || CAST(uid AS VARCHAR), i, 1))::BIGINT)),
        |      (a, b) -> (a * 31 + b) % 1000000007) AS h0
        |  FROM ex),
        |sh1 AS (SELECT uid, n, j,
        |    xor(h0, h0 >> 16) * 73244475::BIGINT % 2147483648::BIGINT AS h1 FROM sh0),
        |sh2 AS (SELECT uid, n, j,
        |    xor(h1, h1 >> 13) * 73244475::BIGINT % 2147483648::BIGINT AS h2 FROM sh1),
        |sk AS (SELECT j, xor(h2, h2 >> 16) % 512 AS bkt, CAST(sum(n) AS BIGINT) AS c
        |  FROM sh2 GROUP BY 1, 2),
        |qk AS (SELECT uid, n AS exact_n FROM counts WHERE uid % 7 = 0
        |  UNION ALL SELECT * FROM (VALUES (-1::BIGINT, 0::BIGINT),
        |    (-2::BIGINT, 0::BIGINT), (1000000007::BIGINT, 0::BIGINT)) v(uid, exact_n)),
        |qx AS (SELECT uid, exact_n, j FROM qk, (SELECT unnest(range(0, 4)) AS j)),
        |qh0 AS (SELECT uid, exact_n, j,
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(range(1, length(CAST(j AS VARCHAR) || ':' || CAST(uid AS VARCHAR)) + 1),
        |        i -> ord(substr(CAST(j AS VARCHAR) || ':' || CAST(uid AS VARCHAR), i, 1))::BIGINT)),
        |      (a, b) -> (a * 31 + b) % 1000000007) AS h0
        |  FROM qx),
        |qh1 AS (SELECT uid, exact_n, j,
        |    xor(h0, h0 >> 16) * 73244475::BIGINT % 2147483648::BIGINT AS h1 FROM qh0),
        |qh2 AS (SELECT uid, exact_n, j,
        |    xor(h1, h1 >> 13) * 73244475::BIGINT % 2147483648::BIGINT AS h2 FROM qh1),
        |qb AS (SELECT uid, exact_n, j, xor(h2, h2 >> 16) % 512 AS bkt FROM qh2),
        |est AS (SELECT uid, exact_n,
        |    CAST(min(coalesce(c, 0)) AS BIGINT) AS est_n
        |  FROM qb LEFT JOIN sk USING (j, bkt) GROUP BY uid, exact_n)
        |SELECT uid, exact_n, est_n, est_n - exact_n AS overcount
        |FROM est ORDER BY uid""".stripMargin,
    // q211: the same rolling hash, the same Wang 31-bit avalanche
    // finalizer in exact int64 ops, the same reg/w split, the same
    // 24−bitlen rank via minimal-binary bin(), the same exact-long
    // harmonic denominator; the only doubles are the final constant-
    // folded estimate chain, floored to the micro grid on both engines
    "q211_hll_cardinality" ->
      """WITH keys AS (
        |  SELECT 'line_ids' AS scope,
        |    CAST(l_orderkey AS VARCHAR) || '#' || CAST(l_linenumber AS VARCHAR) AS k
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'part_keys' AS scope, CAST(l_partkey AS VARCHAR) AS k FROM lineitem),
        |h0 AS (SELECT scope, k,
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(range(1, length(k) + 1),
        |        i -> ord(substr(k, i, 1))::BIGINT)),
        |      (a, b) -> (a * 31 + b) % 1000000007) AS h0
        |  FROM keys),
        |h1 AS (SELECT scope, k,
        |    xor(h0, h0 >> 16) * 73244475::BIGINT % 2147483648::BIGINT AS h1 FROM h0),
        |h2 AS (SELECT scope, k,
        |    xor(h1, h1 >> 13) * 73244475::BIGINT % 2147483648::BIGINT AS h2 FROM h1),
        |h AS (SELECT scope, k, xor(h2, h2 >> 16) AS h FROM h2),
        |r AS (SELECT scope, k, h % 256 AS reg, h // 256 AS w FROM h),
        |rr AS (SELECT scope, reg,
        |    max(CASE WHEN w = 0 THEN 24 ELSE 24 - length(bin(w)) END) AS m
        |  FROM r GROUP BY scope, reg),
        |ps AS (SELECT scope,
        |    CAST(count(*) AS BIGINT) AS regs_used,
        |    CAST(sum(m) AS BIGINT) AS sum_rank,
        |    CAST(max(m) AS BIGINT) AS max_rank,
        |    CAST(sum(1::BIGINT << (30 - m)) AS BIGINT) AS denom_present
        |  FROM rr GROUP BY scope),
        |nx AS (SELECT scope, CAST(count(DISTINCT k) AS BIGINT) AS n_exact
        |  FROM r GROUP BY scope)
        |SELECT ps.scope, n_exact, regs_used, sum_rank, max_rank,
        |  CAST(denom_present + (256 - regs_used) * 1073741824 AS BIGINT) AS denom,
        |  CAST(floor(0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 1073741824.0
        |    / (denom_present + (256 - regs_used) * 1073741824)::DOUBLE
        |    * 1000000.0 + 0.5) AS BIGINT) AS est_micro
        |FROM ps JOIN nx ON ps.scope = nx.scope
        |ORDER BY ps.scope""".stripMargin,
    // q210: identical deterministic file-B degradation, the same two
    // half-offset blocking passes (stated as the OR they implement), the
    // same integer milli-bit FS weights; every score is exact long
    // arithmetic so the per-decision rollup hash-matches bit-for-bit
    "q210_entity_resolution" ->
      """WITH base AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name,
        |    CAST(c_nationkey AS BIGINT) AS nation,
        |    CAST(floor(round(c_acctbal, 2) * 100.0 + 0.5) AS BIGINT) AS cents,
        |    c_mktsegment AS seg
        |  FROM customer),
        |a AS (
        |  SELECT id AS a_id, name AS a_name, nation AS a_nation,
        |    cents AS a_cents, seg AS a_seg,
        |    CAST(floor((cents + 100000)::DOUBLE / 1000.0) AS BIGINT) AS a_b1,
        |    CAST(floor((cents + 100500)::DOUBLE / 1000.0) AS BIGINT) AS a_b2
        |  FROM base),
        |b AS (
        |  SELECT id AS b_id,
        |    CASE WHEN id % 10 < 2 THEN name || 'X' ELSE name END AS b_name,
        |    CASE WHEN id % 10 = 5 THEN (nation + 1) % 25 ELSE nation END AS b_nation,
        |    CASE WHEN id % 10 IN (2, 3) THEN cents + 7 ELSE cents END AS b_cents,
        |    CASE WHEN id % 10 = 4 THEN 'UNKNOWN' ELSE seg END AS b_seg
        |  FROM base WHERE id % 7 <> 0),
        |b2 AS (
        |  SELECT *,
        |    CAST(floor((b_cents + 100000)::DOUBLE / 1000.0) AS BIGINT) AS b_b1,
        |    CAST(floor((b_cents + 100500)::DOUBLE / 1000.0) AS BIGINT) AS b_b2
        |  FROM b),
        |cand AS (
        |  SELECT DISTINCT a_id, b_id, a_name, b_name, a_cents, b_cents,
        |    a_seg, b_seg
        |  FROM a JOIN b2 ON a_nation = b_nation
        |    AND (a_b1 = b_b1 OR a_b2 = b_b2)),
        |scored AS (
        |  SELECT a_id, b_id,
        |    (CASE WHEN a_name = b_name THEN 9892 ELSE -4320 END
        |     + CASE WHEN abs(a_cents - b_cents) <= 10 THEN 6492 ELSE -3307 END
        |     + CASE WHEN a_seg = b_seg THEN 2293 ELSE -5322 END) AS score
        |  FROM cand)
        |SELECT
        |  CASE WHEN score >= 10000 THEN 'match'
        |       WHEN score >= 0 THEN 'possible' ELSE 'nonmatch' END AS decision,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN a_id = b_id THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
        |  CAST(min(score) AS BIGINT) AS min_score,
        |  CAST(max(score) AS BIGINT) AS max_score
        |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin,
    // q209: same integer grid/bandwidth derivation, same IEEE division
    // for z, same polynomial kernel (bit-identical on identical doubles
    // — the reason it's Epanechnikov, not Gaussian), every term floored
    // to a 1e-12-grid long BEFORE summing so the mass is an exact
    // integer on both engines; DuckDB sum(BIGINT) is HUGEINT, cast back
    "q209_kde_amount" ->
      """WITH cents AS (SELECT CAST(floor(round(o_totalprice, 2) * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM orders),
        |st AS (SELECT count(*) AS n, min(c) AS lo, max(c) AS hi FROM cents),
        |p AS (SELECT n, lo, hi, greatest(1, (hi - lo) // 8) AS h FROM st),
        |grid AS (SELECT j.j AS j, p.lo + ((p.hi - p.lo) * j.j) // 63 AS g, p.n, p.h
        |  FROM p, (SELECT unnest(range(0, 64)) AS j) j),
        |terms AS (
        |  SELECT g.j,
        |    SUM(CAST(floor(0.75 * (1.0 -
        |      (CAST(c.c - g.g AS DOUBLE) / CAST(g.h AS DOUBLE)) *
        |      (CAST(c.c - g.g AS DOUBLE) / CAST(g.h AS DOUBLE))) * 1000000000000.0) AS BIGINT)) AS m
        |  FROM grid g JOIN cents c ON abs(c.c - g.g) <= g.h
        |  GROUP BY g.j)
        |SELECT g.j, g.g AS grid_cents,
        |  CAST(coalesce(t.m, 0) AS BIGINT) AS kde_mass,
        |  CAST(coalesce(t.m, 0) AS DOUBLE)
        |    / (CAST(g.n AS DOUBLE) * CAST(g.h AS DOUBLE) * 1000000000000.0) AS density
        |FROM grid g LEFT JOIN terms t ON t.j = g.j
        |ORDER BY g.j""".stripMargin,
    // q201: the oracle reads the RAW parquet with no buckets — the result
    // being layout-invariant is the point; revenue is exact integer
    // cents × residual percent per line, summed as integers both sides
    "q201_bucketed_join" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(floor(round(l_extendedprice, 2) * 100 + 0.5) AS BIGINT)
        |           * (100 - CAST(floor(round(l_discount, 2) * 100 + 0.5) AS BIGINT)))
        |    AS BIGINT) AS rev_c4
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // q206: the same span forest + child-sum join + rollup; floor(epoch)
    // matches Spark's floor-division timestamp->long cast (a bare BIGINT
    // cast of DuckDB's fractional epoch would round-to-nearest)
    "q206_trace_breakdown" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, CAST(ts AS DATE) AS d,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS dur_us
        |  FROM events),
        |roots AS (
        |  SELECT user_id || ':' || d AS trace_id,
        |    'root:' || user_id || ':' || d AS span_id,
        |    '' AS parent_id, 'session' AS name,
        |    min(sec) * 1000000 AS start_us,
        |    (max(sec) + 3600) * 1000000 AS end_us
        |  FROM ev GROUP BY user_id, d),
        |children AS (
        |  SELECT user_id || ':' || d AS trace_id, 'e:' || event_id AS span_id,
        |    'root:' || user_id || ':' || d AS parent_id, event_type AS name,
        |    sec * 1000000 AS start_us, sec * 1000000 + dur_us AS end_us
        |  FROM ev),
        |spans AS (SELECT * FROM roots UNION ALL SELECT * FROM children),
        |dur AS (SELECT *, end_us - start_us AS dur_us FROM spans),
        |cs AS (SELECT trace_id AS c_trace, parent_id AS c_parent,
        |         sum(dur_us) AS child_us
        |       FROM dur WHERE parent_id <> '' GROUP BY trace_id, parent_id),
        |j AS (SELECT d.name, d.dur_us,
        |        d.dur_us - coalesce(c.child_us, 0) AS self_us
        |      FROM dur d LEFT JOIN cs c
        |        ON d.trace_id = c.c_trace AND d.span_id = c.c_parent)
        |SELECT name, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(dur_us) AS BIGINT) AS total_us,
        |  CAST(sum(self_us) AS BIGINT) AS self_us
        |FROM j GROUP BY name ORDER BY name""".stripMargin,
    // q204: the PromQL window semantics replicated in SQL — reset-aware
    // per-series deltas, trailing RANGE increase window, gaps-and-islands
    // for: states; all-integer counts so the hash is exact
    "q204_promql_eval" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |cum AS (
        |  SELECT event_type, d,
        |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS cv
        |  FROM daily),
        |del AS (
        |  SELECT event_type, d, cv,
        |    coalesce(cv - lag(cv) OVER (PARTITION BY event_type ORDER BY d), 0) AS dl
        |  FROM cum),
        |inc AS (
        |  SELECT event_type, d,
        |    CAST(sum(dl) OVER (PARTITION BY event_type
        |      ORDER BY CAST(epoch(CAST(d AS TIMESTAMP)) AS BIGINT)
        |      RANGE BETWEEN 259199 PRECEDING AND CURRENT ROW) AS BIGINT) AS v
        |  FROM del),
        |nd AS (SELECT count(DISTINCT CAST(ts AS DATE)) AS n_days FROM events),
        |thr AS (
        |  SELECT event_type, (3 * sum(n)) // (SELECT n_days FROM nd) AS t
        |  FROM daily GROUP BY event_type),
        |p AS (
        |  SELECT i.event_type, i.d, i.v, (i.v > t.t) AS pr
        |  FROM inc i JOIN thr t ON i.event_type = t.event_type),
        |isl AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY d)
        |    - row_number() OVER (PARTITION BY event_type, pr ORDER BY d) AS island
        |  FROM p),
        |held AS (
        |  SELECT *, CAST(epoch(CAST(d AS TIMESTAMP)) AS BIGINT)
        |    - min(CAST(epoch(CAST(d AS TIMESTAMP)) AS BIGINT))
        |        OVER (PARTITION BY event_type, pr, island) AS h
        |  FROM isl)
        |SELECT event_type, CAST(d AS TIMESTAMP) AS day, v,
        |  CASE WHEN NOT pr THEN 'inactive' WHEN h >= 172800 THEN 'firing'
        |       ELSE 'pending' END AS state
        |FROM held ORDER BY event_type, day""".stripMargin,
    // q203: same temperature scaling (IEEE sqrt -> micro grid), same
    // Hamilton allocation, same crossing counts — per-source windows
    "q203_temp_mixture" ->
      """WITH d AS (SELECT source, doc_id, n_chars + 1 AS w FROM documents),
        |sw AS (SELECT source, sum(w) AS ws FROM d GROUP BY source),
        |tw AS (SELECT source, ws,
        |         CAST(floor(sqrt(CAST(ws AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS wt
        |       FROM sw),
        |tot AS (SELECT sum(wt) AS t FROM tw),
        |base AS (SELECT source, ws, wt, t, (wt * 1000) // t AS b,
        |           wt * 1000 - ((wt * 1000) // t) * t AS rem
        |         FROM tw, tot),
        |lo AS (SELECT 1000 - sum(b) AS leftover FROM base),
        |alloc AS (SELECT source, ws,
        |            b + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
        |                       <= (SELECT leftover FROM lo) THEN 1 ELSE 0 END AS ks
        |          FROM base),
        |c AS (SELECT d.source, d.doc_id, d.w, a.ks, a.ws,
        |        sum(d.w) OVER (PARTITION BY d.source ORDER BY d.doc_id) AS cum
        |      FROM d JOIN alloc a ON d.source = a.source)
        |SELECT source, doc_id, CAST(w AS BIGINT) AS w,
        |  CAST((cum * ks) // ws - ((cum - w) * ks) // ws AS BIGINT) AS mult
        |FROM c WHERE (cum * ks) // ws > ((cum - w) * ks) // ws
        |ORDER BY source, doc_id""".stripMargin,
    // q202: DuckDB computes the same integer threshold crossings over a
    // plain ordered window; // is DuckDB floor division (HUGEINT-safe)
    "q202_weighted_sample" ->
      """WITH t AS (SELECT doc_id, n_chars + 1 AS w FROM documents),
        |c AS (SELECT doc_id, w,
        |        sum(w) OVER (ORDER BY doc_id) AS cum,
        |        sum(w) OVER () AS tot FROM t)
        |SELECT doc_id, CAST(w AS BIGINT) AS w,
        |  CAST((cum * 500) // tot - ((cum - w) * 500) // tot AS BIGINT) AS mult
        |FROM c WHERE (cum * 500) // tot > ((cum - w) * 500) // tot
        |ORDER BY doc_id""".stripMargin,
    "q98_zorder" -> q98ZorderSql,
    "q99_orc_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price, max(o_orderdate) AS max_date
        |FROM orders WHERE o_orderkey % 40 = 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q107_jsonl_roundtrip" ->
      """SELECT p_brand, count(*) AS n, round(sum(p_retailprice), 2) AS sum_price,
        |  max(p_size) AS max_size
        |FROM part WHERE p_partkey % 20 = 0
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q108_gap_fill" ->
      """WITH ev AS (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, value
        |    FROM events),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n,
        |    round(sum(value), 2) AS sum_v FROM ev GROUP BY event_type, d),
        |spine AS (SELECT unnest(generate_series(
        |    (SELECT min(d) FROM ev), (SELECT max(d) FROM ev),
        |    INTERVAL 1 DAY)) AS d),
        |types AS (SELECT DISTINCT event_type FROM ev)
        |SELECT t.event_type, s.d,
        |  coalesce(daily.n, 0) AS n, coalesce(daily.sum_v, 0.0) AS sum_v
        |FROM spine s CROSS JOIN types t
        |LEFT JOIN daily ON daily.event_type = t.event_type AND daily.d = s.d
        |ORDER BY t.event_type, s.d""".stripMargin,
    // q154: ISO Monday week truncation in both engines; offsets divide
    // exactly (both sides Monday-truncated); 4dp floor on the ratio
    "q154_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events
        |    WHERE event_type = 'purchase'),
        |fs AS (SELECT user_id, min(d) AS first_d FROM ev GROUP BY user_id),
        |act AS (SELECT DISTINCT e.user_id,
        |    CAST(date_trunc('week', first_d) AS DATE) AS cohort_week,
        |    CAST(date_diff('day', CAST(date_trunc('week', first_d) AS DATE),
        |      CAST(date_trunc('week', d) AS DATE)) // 7 AS BIGINT) AS week_offset
        |  FROM ev e JOIN fs ON fs.user_id = e.user_id),
        |cells AS (SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_users
        |  FROM act GROUP BY 1, 2),
        |sizes AS (SELECT cohort_week, n_users AS cohort_size FROM cells
        |  WHERE week_offset = 0)
        |SELECT CAST(c.cohort_week AS TIMESTAMP) AS cohort_week, c.week_offset, c.n_users,
        |  floor((CAST(c.n_users AS DOUBLE) / cohort_size) * 10000.0 + 0.5) / 10000.0
        |    AS retention
        |FROM cells c JOIN sizes s ON s.cohort_week = c.cohort_week
        |ORDER BY c.cohort_week, c.week_offset""".stripMargin,
    // q155: the same (user, day) grain, day spine from the observed
    // span, trailing-7 range join, conditional distinct for DAU
    "q155_rolling_active" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |spine AS (SELECT unnest(generate_series(
        |    (SELECT min(d) FROM ud), (SELECT max(d) FROM ud),
        |    INTERVAL 1 DAY))::DATE AS day)
        |SELECT CAST(day AS TIMESTAMP) AS day,
        |  CAST(count(DISTINCT CASE WHEN d = day THEN user_id END) AS BIGINT) AS dau,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS wau7,
        |  floor((CAST(count(DISTINCT CASE WHEN d = day THEN user_id END) AS DOUBLE)
        |    / count(DISTINCT user_id)) * 10000.0 + 0.5) / 10000.0 AS stickiness
        |FROM spine JOIN ud ON date_diff('day', d, day) BETWEEN 0 AND 6
        |GROUP BY day ORDER BY day""".stripMargin,
    // q156: same deterministic (metric, user_id) orders; monetary is
    // 2dp-rounded BEFORE ranking so both engines rank the same values
    "q156_rfm" -> duckRfmSql,
    // twins: the two-phase rank paths return IDENTICAL rows — same
    // oracle SQL pins the exactness claim from the DuckDB side too
    "q199_rfm_twophase" -> duckRfmSql,
    "q200_gini_twophase" -> duckGiniSql,
    "q109_unpivot" ->
      """SELECT 'p_retailprice' AS metric, count(*) AS n,
        |  round(sum(p_retailprice), 2) AS sum_val FROM part
        |UNION ALL
        |SELECT 'p_size' AS metric, count(*) AS n,
        |  round(sum(CAST(p_size AS DOUBLE)), 2) AS sum_val FROM part
        |ORDER BY metric""".stripMargin,
    "q105_partition_prune" ->
      """SELECT date_trunc('month', l_shipdate) AS ship_month, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q106_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        |    WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
        |    JOIN v ON e.user_id = v.user_id
        |    WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id),
        |b AS (SELECT e.user_id, min(e.ts) AS t_buy FROM events e
        |    JOIN c ON e.user_id = c.user_id
        |    WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS users_viewed,
        |  (SELECT CAST(count(*) AS BIGINT) FROM c) AS users_clicked,
        |  (SELECT CAST(count(*) AS BIGINT) FROM b) AS users_purchased""".stripMargin,
    "q103_bloom_prune" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q100_union_by_name" ->
      """SELECT c_custkey AS id, c_acctbal AS bal, c_mktsegment AS seg,
        |  'customer' AS src FROM customer
        |UNION ALL BY NAME
        |SELECT s_suppkey AS id, s_acctbal AS bal, 'supplier' AS src FROM supplier
        |ORDER BY src, id""".stripMargin,
    "q89_event_props" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY 1""".stripMargin,
    "q88_attribution" ->
      """SELECT p.event_id,
        |  CASE WHEN c.ts IS NOT NULL
        |    AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000 THEN 1 ELSE 0 END AS attributed,
        |  CASE WHEN c.ts IS NOT NULL
        |    AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
        |    THEN CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) END AS latency_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
    "q60_sql_surface" ->
      """SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q73_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n,
        |  grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q74_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY day_key
        |        RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS spend_30d
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day_key
        |      FROM orders) t""".stripMargin,
    "q67_stats_fns" ->
      """SELECT round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |  round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_pop_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_samp_qp,
        |  round(var_pop(l_discount), 6) AS var_pop_disc,
        |  round(stddev_samp(l_discount), 6) AS stddev_samp_disc
        |FROM lineitem""".stripMargin,
    "q68_edit_distance" ->
      """SELECT a.p_partkey AS pk_a, b.p_partkey AS pk_b,
        |  levenshtein(a.p_name, b.p_name) AS edit_dist
        |FROM part a JOIN part b ON a.p_partkey < b.p_partkey
        |WHERE a.p_partkey <= 15 AND b.p_partkey <= 40""".stripMargin,
    "q69_datetime_fns" ->
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  day(o_orderdate) AS d, quarter(o_orderdate) AS q,
        |  last_day(o_orderdate) AS month_end,
        |  o_orderdate + INTERVAL 3 DAY AS plus3d
        |FROM orders WHERE o_orderkey % 101 = 0""".stripMargin,
    "q70_null_semantics" ->
      """SELECT o_orderkey, nullif(o_orderstatus, 'O') AS nf,
        |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS backfilled,
        |  CASE WHEN nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F' THEN 1 ELSE 0 END AS nsafe_eq_f,
        |  CASE WHEN nullif(o_orderstatus, 'O') IS DISTINCT FROM 'F' THEN 1 ELSE 0 END AS distinct_from_f,
        |  CASE WHEN nullif(o_orderstatus, 'O') IS NULL THEN 'was_open' ELSE 'terminal' END AS bucket
        |FROM orders WHERE o_orderkey % 101 = 0""".stripMargin,
    "q66_session_windows" ->
      """WITH gaps AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sess AS (
        |  SELECT user_id, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM gaps),
        |agg AS (
        |  SELECT user_id, session_id, count(*) AS n_events,
        |    round(sum(value), 4) AS session_value
        |  FROM sess GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions,
        |  max(n_events) AS longest_session,
        |  round(sum(session_value), 2) AS total_session_value
        |FROM agg GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q62_pivot" ->
      """SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label,
        |  CAST(sum(CASE WHEN l_discount >= 0.05 THEN 0 ELSE 1 END) AS BIGINT) AS pred_0,
        |  CAST(sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS pred_1
        |FROM lineitem GROUP BY 1 ORDER BY label""".stripMargin,
    "q63_explode" ->
      raw"""SELECT token, count(*) AS n
           |FROM (SELECT unnest(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS token
           |      FROM documents) t
           |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "q64_approx" ->
      """SELECT 1 AS hll_within_5pct, 1 AS p50_in_band""",
    "q59_coercion" ->
      """SELECT p_partkey,
        |  TRY_CAST(p_type AS DOUBLE) AS bad_cast,
        |  TRY_CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INTEGER) AS good_cast,
        |  TRY_CAST(substring(p_name, 1, 2) AS INTEGER) AS mixed_cast
        |FROM part""".stripMargin,
    "q50_right_join" ->
      """SELECT p_brand, count(l_quantity) AS n_lines, count(*) AS n_rows
        |FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q51_full_join" ->
      """WITH c AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM c FULL JOIN s ON c_nationkey = s_nationkey ORDER BY nationkey""".stripMargin,
    "q52_asof_join" ->
      """SELECT c.event_id, round(p.value, 4) AS last_purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    "q53_regex_fns" ->
      """SELECT p_partkey,
        |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
        |  len(regexp_extract_all(p_name, '[a-z]+')) AS n_words,
        |  regexp_extract_all(p_name, '[a-z]+')[1] AS first_word,
        |  printf('%s/%05d', p_brand, p_partkey) AS part_code
        |FROM part""".stripMargin,
    "q54_json_map" ->
      """SELECT event_id,
        |  json_extract(props, '$.k')::INTEGER AS k_val,
        |  json_extract(props, '$.k')::INTEGER AS roundtrip,
        |  len(json_keys(props)) AS n_keys,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted
        |FROM events""".stripMargin,
    "q55_csv_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_orderkey % 50 = 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q56_generators" ->
      """SELECT CAST(500 AS BIGINT) AS n_rows, CAST(500 AS BIGINT) AS n_unique_uuids,
        |  CAST(500 AS BIGINT) AS n_rand_in_range, CAST(500 AS BIGINT) AS n_ts_nonnull,
        |  1 AS time_sorted, 1 AS seed_deterministic, 1 AS fraud_ratio_plausible,
        |  CAST(0 AS BIGINT) AS n_nonpos_amount""".stripMargin,
    // q158: same (ts, event_id) in-user order; the per-from total is a
    // window over the bounded transition matrix, never a second event pass
    "q158_markov_transitions" ->
      """WITH pairs AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_type
        |  FROM events),
        |m AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  floor((CAST(n AS DOUBLE) /
        |    CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)) * 10000.0 + 0.5)
        |    / 10000.0 AS p
        |FROM m ORDER BY from_type, to_type""".stripMargin,
    // q159: lag marks change points, lead over the surviving change rows
    // closes the interval; event_id is the deterministic surrogate key
    "q159_scd2" ->
      """WITH e AS (SELECT user_id, event_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM events),
        |chg AS (SELECT user_id, event_id, ts, event_type FROM e
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_id, event_type AS state, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
        |    AS is_current
        |FROM chg ORDER BY user_id, event_id""".stripMargin,
    // q160: each table pays ONE scan for its whole constraint batch;
    // passed compares the FLOORED metric so both engines see identical doubles
    "q160_dq_suite" ->
      """WITH li AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(l_shipdate) AS BIGINT) AS n_comment,
        |    CAST(count(DISTINCT l_orderkey * 8 + l_linenumber) AS BIGINT) AS n_key,
        |    CAST(sum(CASE WHEN l_quantity <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_qty,
        |    CAST(sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_flag
        |  FROM lineitem),
        |ri AS (SELECT CAST(count(*) AS BIGINT) AS ri_n,
        |    CAST(count(c.c_custkey) AS BIGINT) AS ri_ok
        |  FROM events e LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON e.user_id = c.c_custkey),
        |rep AS (
        |  SELECT 'accepted_values(l_returnflag)' AS check_name, n AS n_checked,
        |    n_flag AS n_ok, 1.0 AS thr FROM li
        |  UNION ALL SELECT 'completeness(l_shipdate)', n, n_comment, 1.0 FROM li
        |  UNION ALL SELECT 'range(l_quantity<=30)', n, n_qty, 1.0 FROM li
        |  UNION ALL SELECT 'referential(events.user_id)', ri_n, ri_ok, 0.5 FROM ri
        |  UNION ALL SELECT 'uniqueness(l_orderkey,l_linenumber)', n, n_key, 1.0
        |    FROM li)
        |SELECT check_name, n_checked, n_ok,
        |  floor((CAST(n_ok AS DOUBLE) / CAST(n_checked AS DOUBLE)) * 10000.0 + 0.5)
        |    / 10000.0 AS metric,
        |  (floor((CAST(n_ok AS DOUBLE) / CAST(n_checked AS DOUBLE)) * 10000.0 + 0.5)
        |    / 10000.0 >= thr) AS passed
        |FROM rep ORDER BY check_name""".stripMargin,
    // q164: DuckDB dayofweek is already Sunday=0; sqrt is IEEE-exact
    "q164_seasonality" ->
      """WITH cells AS (SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
        |    CAST(hour(ts) AS BIGINT) AS hr, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT dow, hr, n,
        |    CAST(sum(n) OVER (PARTITION BY dow) AS BIGINT) AS n_dow,
        |    CAST(sum(n) OVER (PARTITION BY hr) AS BIGINT) AS n_hr,
        |    CAST(sum(n) OVER () AS BIGINT) AS nt
        |  FROM cells)
        |SELECT dow, hr, n, n_dow, n_hr,
        |  CAST(floor((n::DOUBLE - n_dow::DOUBLE * n_hr::DOUBLE / nt::DOUBLE)
        |    / sqrt(n_dow::DOUBLE * n_hr::DOUBLE / nt::DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) AS resid_micro
        |FROM g ORDER BY dow, hr""".stripMargin,
    // q165: the same rolling hash drives the arm split in both engines;
    // counts are exact, sqrt IEEE-exact, z on the micro grid
    "q165_ab_test" ->
      """WITH pu AS (SELECT user_id,
        |    CASE WHEN max(CASE WHEN event_type = 'purchase' THEN value END) > 250.0
        |      THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY user_id),
        |armed AS (SELECT
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(range(1, length(CAST(user_id AS VARCHAR)) + 1),
        |        i -> ord(substr(CAST(user_id AS VARCHAR), i, 1))::BIGINT)),
        |      (a, b) -> (a * 31 + b) % 1000000007) % 2 AS arm, conv
        |  FROM pu),
        |w AS (SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
        |  FROM armed)
        |SELECT n0, c0, n1, c1,
        |  floor((c0::DOUBLE / n0::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS cr0,
        |  floor((c1::DOUBLE / n1::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS cr1,
        |  CAST(floor((c1::DOUBLE / n1::DOUBLE - c0::DOUBLE / n0::DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) AS uplift_micro,
        |  CAST(floor((c1::DOUBLE / n1::DOUBLE - c0::DOUBLE / n0::DOUBLE) /
        |    sqrt(((c0 + c1)::DOUBLE / (n0 + n1)::DOUBLE)
        |      * (1.0 - (c0 + c1)::DOUBLE / (n0 + n1)::DOUBLE)
        |      * (1.0 / n0::DOUBLE + 1.0 / n1::DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT) AS z_micro
        |FROM w""".stripMargin,
    // q166: identical integer recurrence — DuckDB's // and Spark's div
    // agree on non-negative cents; list(ORDER BY d) == sort_array(struct)
    "q166_ewma" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS d,
        |    CAST(floor(round(sum(value), 2) * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |agg AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
        |    max(d) AS last_d, list(cents ORDER BY d) AS xs
        |  FROM daily GROUP BY user_id)
        |SELECT user_id, n_days, CAST(last_d AS TIMESTAMP) AS last_day,
        |  CAST(list_reduce(xs, (a, b) -> (a + b) // 2) AS BIGINT) AS ewma_cents
        |FROM agg ORDER BY user_id""".stripMargin,
    // q167: the five classic sums as exact BIGINTs; each metric is one
    // double ratio of identical integers, micro-floored; nullif guards
    // the degenerate single-day / constant-y series on both sides
    "q167_trend_fit" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(floor(round(sum(value), 2) + 0.5) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |ix AS (SELECT event_type, y,
        |    CAST(date_diff('day', min(d) OVER (PARTITION BY event_type), d)
        |      AS BIGINT) AS x
        |  FROM daily),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM ix GROUP BY 1)
        |SELECT event_type, n,
        |  CAST(floor((n * sxy - sx * sy)::DOUBLE /
        |    nullif((n * sxx - sx * sx)::DOUBLE, 0.0) * 1000000.0 + 0.5)
        |    AS BIGINT) AS slope_micro,
        |  CAST(floor((sy::DOUBLE - (n * sxy - sx * sy)::DOUBLE /
        |      nullif((n * sxx - sx * sx)::DOUBLE, 0.0) * sx::DOUBLE) / n::DOUBLE
        |    * 1000000.0 + 0.5) AS BIGINT) AS intercept_micro,
        |  CAST(floor((n * sxy - sx * sy)::DOUBLE * (n * sxy - sx * sy)::DOUBLE /
        |    (nullif((n * sxx - sx * sx)::DOUBLE, 0.0) *
        |     nullif((n * syy - sy * sy)::DOUBLE, 0.0))
        |    * 1000000.0 + 0.5) AS BIGINT) AS r2_micro
        |FROM g ORDER BY event_type""".stripMargin,
    // q168: identical correlated text — DuckDB decorrelates it the same
    // way; quantity sums are exact integral doubles so the half-average
    // threshold compares identically
    "q168_correlated_subq" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_small,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    // q170: same distinct-basket grain, same 1%-of-baskets support
    // floor, lift factors widened to DOUBLE before multiplying
    "q170_assoc_rules" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey, p_brand
        |  FROM lineitem JOIN part ON p_partkey = l_partkey),
        |nn AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM ob),
        |items AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_item
        |  FROM ob GROUP BY p_brand),
        |pairs AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM ob a JOIN ob b
        |    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        |  GROUP BY 1, 2)
        |SELECT brand_a, brand_b, n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
        |  floor((n_ab::DOUBLE / n_orders::DOUBLE) * 10000.0 + 0.5) / 10000.0
        |    AS support,
        |  floor((n_ab::DOUBLE / ia.n_item::DOUBLE) * 10000.0 + 0.5) / 10000.0
        |    AS conf_ab,
        |  floor((n_ab::DOUBLE / ib.n_item::DOUBLE) * 10000.0 + 0.5) / 10000.0
        |    AS conf_ba,
        |  CAST(floor(n_ab::DOUBLE * n_orders::DOUBLE /
        |    (ia.n_item::DOUBLE * ib.n_item::DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
        |    AS lift_micro
        |FROM pairs CROSS JOIN nn
        |JOIN items ia ON ia.p_brand = brand_a
        |JOIN items ib ON ib.p_brand = brand_b
        |WHERE n_ab::DOUBLE >= n_orders::DOUBLE / 100.0
        |ORDER BY brand_a, brand_b""".stripMargin,
    // q171: first digit from the BIGINT's decimal string (both engines
    // print longs identically); expected probs are the same micro literals
    "q171_benford" ->
      """WITH obs AS (SELECT
        |    CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR),
        |      1, 1) AS BIGINT) AS digit,
        |    CAST(count(*) AS BIGINT) AS n_obs
        |  FROM lineitem WHERE l_extendedprice >= 1.0 GROUP BY 1),
        |w AS (SELECT digit, n_obs, CAST(sum(n_obs) OVER () AS BIGINT) AS n_total
        |  FROM obs),
        |exps(d, pm) AS (VALUES (1, 301030), (2, 176091), (3, 124939),
        |  (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
        |  (9, 45757))
        |SELECT digit, n_obs, n_total,
        |  floor((n_obs::DOUBLE / n_total::DOUBLE) * 10000.0 + 0.5) / 10000.0
        |    AS p_obs,
        |  CAST(pm AS BIGINT) AS p_exp_micro,
        |  CAST(floor((n_obs::DOUBLE - n_total::DOUBLE * pm / 1000000.0)
        |    * (n_obs::DOUBLE - n_total::DOUBLE * pm / 1000000.0)
        |    / (n_total::DOUBLE * pm / 1000000.0) * 1000000.0 + 0.5) AS BIGINT)
        |    AS chi2_term_micro
        |FROM w JOIN exps ON d = digit ORDER BY digit""".stripMargin,
    // q172: identical EXISTS/NOT EXISTS text — both engines decorrelate
    // to semi/anti joins on l_orderkey
    "q172_exists_subq" ->
      """SELECT l1.l_suppkey AS suppkey,
        |  CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS n_sole_fault
        |FROM lineitem l1
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY l1.l_suppkey
        |ORDER BY n_sole_fault DESC, suppkey""".stripMargin,
    // q173: same closed form S_i = P_i - min(0, running min P); all
    // integer arithmetic (// == div on the non-negative target)
    "q173_cusum" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(floor(round(sum(value), 2) + 0.5) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, d, y,
        |    CAST(sum(y) OVER (PARTITION BY event_type) //
        |      count(*) OVER (PARTITION BY event_type) AS BIGINT) AS target
        |  FROM daily),
        |p AS (SELECT event_type, d, target,
        |    CAST(sum(y - target) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pv
        |  FROM t),
        |s AS (SELECT event_type, d, target,
        |    pv - least(0, min(pv) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS UNBOUNDED PRECEDING)) AS sv
        |  FROM p)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(max(target) AS BIGINT) AS target,
        |  CAST(max(sv) AS BIGINT) AS max_cusum,
        |  CAST(sum(CASE WHEN sv > target THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_alarm_days,
        |  CAST(min(CASE WHEN sv > target THEN d END) AS TIMESTAMP)
        |    AS first_alarm
        |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q175: same deterministic decile order; odds-ratio factors widened
    // to DOUBLE before multiplying, WOE/IV on the micro-nat grid
    "q175_woe_iv" ->
      """WITH b AS (SELECT
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS bad,
        |    CAST(ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey,
        |      l_linenumber) AS BIGINT) AS bin
        |  FROM lineitem),
        |c AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(bad) AS BIGINT) AS n_bad
        |  FROM b GROUP BY bin),
        |g AS (SELECT bin, n, n - n_bad AS n_good, n_bad,
        |    CAST(sum(n_bad) OVER () AS BIGINT) AS t_bad,
        |    CAST(sum(n - n_bad) OVER () AS BIGINT) AS t_good
        |  FROM c)
        |SELECT bin, n, n_good, n_bad,
        |  CAST(floor(ln((n_good::DOUBLE * t_bad::DOUBLE) /
        |    (n_bad::DOUBLE * t_good::DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |    AS woe_micro,
        |  CAST(floor((n_good::DOUBLE / t_good::DOUBLE -
        |      n_bad::DOUBLE / t_bad::DOUBLE) *
        |    ln((n_good::DOUBLE * t_bad::DOUBLE) /
        |      (n_bad::DOUBLE * t_good::DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |    AS iv_term_micro
        |FROM g ORDER BY bin""".stripMargin,
    // q176: identical one-window skyline at the deduped point grain
    "q176_skyline" ->
      """WITH pts AS (SELECT p_retailprice AS price, p_size AS size,
        |    CAST(count(*) AS BIGINT) AS n_parts
        |  FROM part GROUP BY 1, 2),
        |w AS (SELECT price, size, n_parts,
        |    max(size) OVER (ORDER BY price, size DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_max
        |  FROM pts)
        |SELECT price, size, n_parts FROM w
        |WHERE run_max IS NULL OR size > run_max
        |ORDER BY price""".stripMargin,
    // q177: same epoch-micro longs, same (t, delta, event_id) sweep
    // order — ends before starts at the same instant
    "q177_peak_concurrency" ->
      """WITH ev AS (SELECT event_type, event_id,
        |    epoch_us(ts) AS t0,
        |    epoch_us(ts) + CAST(floor(value) AS BIGINT) * 1000000 AS t1
        |  FROM events),
        |bounds AS (
        |  SELECT event_type, event_id, t0 AS t, CAST(1 AS BIGINT) AS delta FROM ev
        |  UNION ALL
        |  SELECT event_type, event_id, t1, CAST(-1 AS BIGINT) FROM ev),
        |run AS (SELECT event_type, t,
        |    CAST(sum(delta) OVER (PARTITION BY event_type
        |      ORDER BY t, delta, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS load
        |  FROM bounds),
        |sw AS (SELECT event_type, t, load,
        |    CAST(max(load) OVER (PARTITION BY event_type) AS BIGINT) AS peak
        |  FROM run)
        |SELECT event_type, CAST(max(peak) AS BIGINT) AS max_concurrent,
        |  make_timestamp(min(t)) AS first_peak
        |FROM sw WHERE load = peak
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q178: cent-exact nation revenue; shares divide identical integers
    "q178_share_of_parent" ->
      """WITH rev AS (SELECT r_name, n_name,
        |    CAST(floor(round(sum(o_totalprice), 2) * 100.0 + 0.5) AS BIGINT)
        |      AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |w AS (SELECT r_name, n_name, cents,
        |    CAST(sum(cents) OVER (PARTITION BY r_name) AS BIGINT) AS region_cents,
        |    CAST(sum(cents) OVER () AS BIGINT) AS total_cents
        |  FROM rev)
        |SELECT r_name, n_name, cents,
        |  floor((cents::DOUBLE / region_cents::DOUBLE) * 10000.0 + 0.5) / 10000.0
        |    AS share_of_region,
        |  floor((region_cents::DOUBLE / total_cents::DOUBLE) * 10000.0 + 0.5)
        |    / 10000.0 AS region_share_of_total,
        |  CAST(rank() OVER (PARTITION BY r_name ORDER BY cents DESC, n_name)
        |    AS BIGINT) AS rank_in_region
        |FROM w ORDER BY r_name, n_name""".stripMargin,
    // q179: same (cents, custkey) total order; every sum an exact long,
    // Gini is one double division of identical integers
    "q179_gini_lorenz" -> duckGiniSql,
    // q182: same deterministic total order; per-bucket stats exact.
    // Shared with its q205 two-phase twin (bit-identical by construction)
    "q182_equidepth_hist" -> duckEquidepthSql,
    "q205_equidepth_twophase" -> duckEquidepthSql,
    // q184: same cent-grid moments, variance factors widened to DOUBLE
    // before multiplying, identical z expression
    "q184_peer_anomaly" ->
      """WITH x AS (SELECT c_nationkey,
        |    CAST(floor(round(c_acctbal, 2) * 100.0 + 0.5) AS BIGINT) AS x
        |  FROM customer),
        |m AS (SELECT c_nationkey, x,
        |    CAST(count(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n,
        |    CAST(sum(x) OVER (PARTITION BY c_nationkey) AS BIGINT) AS sx,
        |    CAST(sum(x * x) OVER (PARTITION BY c_nationkey) AS BIGINT) AS sxx
        |  FROM x),
        |z AS (SELECT c_nationkey, n,
        |    (x::DOUBLE - sx::DOUBLE / n::DOUBLE) /
        |      (sqrt(nullif(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE,
        |        0.0)) / n::DOUBLE) AS z
        |  FROM m)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(CASE WHEN abs(z) > 2.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  CAST(floor(max(abs(z)) * 1000000.0 + 0.5) AS BIGINT)
        |    AS max_abs_z_micro
        |FROM z GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    // q185: same y = n·x − T scaling (n² cancels), same row-lag leads
    "q185_autocorrelation" -> {
      val leads = (1 to 7).map(k =>
        s"lead(y, $k) OVER (PARTITION BY event_type ORDER BY d) AS y$k").mkString(",\n        |    ")
      val unions = (1 to 7).map(k =>
        s"SELECT event_type, CAST($k AS BIGINT) AS lag, y, y$k AS ylead, syy FROM wl WHERE y$k IS NOT NULL")
        .mkString("\n        |  UNION ALL ")
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(floor(round(sum(value), 2) + 0.5) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |y AS (SELECT event_type, d,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) * x -
        |      CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS y
        |  FROM daily),
        |wl AS (SELECT event_type, d, y,
        |    CAST(sum(y * y) OVER (PARTITION BY event_type) AS BIGINT) AS syy,
        |    $leads
        |  FROM y),
        |st AS ($unions)
        |SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(floor(CAST(sum(y * ylead) AS DOUBLE) / CAST(max(syy) AS DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) AS acf_micro
        |FROM st GROUP BY event_type, lag
        |ORDER BY event_type, lag""".stripMargin
    },
    // q254: identical q185 integer machinery, identical pivoted
    // written-order term sum (a SQL SUM of doubles would be
    // order-nondeterministic), identical sentinel and chi-square cut
    "q254_ljung_box" -> {
      val leads = (1 to 7).map(k =>
        s"lead(y, $k) OVER (PARTITION BY event_type ORDER BY d) AS y$k").mkString(",\n        |    ")
      val unions = (1 to 7).map(k =>
        s"SELECT event_type, CAST($k AS BIGINT) AS lag, y, y$k AS ylead FROM wl WHERE y$k IS NOT NULL")
        .mkString("\n        |  UNION ALL ")
      val pivots = (1 to 7).map(k =>
        s"CAST(max(CASE WHEN lag = $k THEN syk END) AS BIGINT) AS s$k").mkString(",\n        |    ")
      val terms = (1 to 7).map(k =>
        s"(CAST(s$k AS DOUBLE) / CAST(syy AS DOUBLE)) * (CAST(s$k AS DOUBLE) / CAST(syy AS DOUBLE)) / (CAST(n AS DOUBLE) - $k.0)")
        .mkString(" + ")
      val qExpr = s"CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * ($terms)"
      // pv derives its ROW SET from the per-type base frame with the
      // stacked per-lag sums LEFT-joined on (the Spark side's shape):
      // an n=1 type survives to its sentinel row
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(floor(round(sum(value), 2) + 0.5) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |y AS (SELECT event_type, d,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) * x -
        |      CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS y
        |  FROM daily),
        |base AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM y GROUP BY event_type),
        |wl AS (SELECT event_type, d, y,
        |    $leads
        |  FROM y),
        |st AS ($unions),
        |lg AS (SELECT event_type, lag, CAST(sum(y * ylead) AS BIGINT) AS syk
        |  FROM st GROUP BY event_type, lag),
        |pvl AS (SELECT event_type,
        |    $pivots
        |  FROM lg GROUP BY event_type),
        |pv AS (SELECT b.event_type, b.n, b.syy,
        |    ${(1 to 7).map(k => s"pvl.s$k").mkString(", ")}
        |  FROM base b LEFT JOIN pvl USING (event_type))
        |SELECT event_type, n AS n_days, syy,
        |  CASE WHEN n <= 8 THEN CAST(-1 AS BIGINT)
        |    ELSE CAST(floor(($qExpr) * 1000000.0 + 0.5) AS BIGINT) END AS q_micro,
        |  CASE WHEN n <= 8 THEN CAST(-1 AS BIGINT)
        |    WHEN ($qExpr) > 18.475307 THEN CAST(1 AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS reject
        |FROM pv ORDER BY event_type""".stripMargin
    },
    // q259: the q254 base/left-join row-set shape at 3 lags, the same
    // exact y-grid sums, and the Durbin-Levinson closed forms written
    // as the IDENTICAL double expression tree (r1..r3 each one
    // division; phi/denominator chains in the same written order)
    "q259_pacf" -> {
      val leads = (1 to 3).map(k =>
        s"lead(y, $k) OVER (PARTITION BY event_type ORDER BY d) AS y$k").mkString(",\n        |    ")
      val unions = (1 to 3).map(k =>
        s"SELECT event_type, CAST($k AS BIGINT) AS lag, y, y$k AS ylead FROM wl WHERE y$k IS NOT NULL")
        .mkString("\n        |  UNION ALL ")
      val pivots = (1 to 3).map(k =>
        s"CAST(max(CASE WHEN lag = $k THEN syk END) AS BIGINT) AS s$k").mkString(",\n        |    ")
      def rk(k: Int) = s"(CAST(s$k AS DOUBLE) / CAST(syy AS DOUBLE))"
      val d2 = s"(1.0 - ${rk(1)} * ${rk(1)})"
      val phi22 = s"((${rk(2)} - ${rk(1)} * ${rk(1)}) / $d2)"
      val phi21 = s"(${rk(1)} - $phi22 * ${rk(1)})"
      val d3 = s"(1.0 - $phi21 * ${rk(1)} - $phi22 * ${rk(2)})"
      val phi33 = s"((${rk(3)} - $phi21 * ${rk(2)} - $phi22 * ${rk(1)}) / $d3)"
      val definedSql = s"(n > 4 AND syy > 0 AND $d2 <> 0.0 AND $d3 <> 0.0)"
      def sent(e: String, name: String) =
        s"CASE WHEN $definedSql THEN CAST(floor(($e) * 1000000.0 + 0.5) AS BIGINT) " +
          s"ELSE CAST(-2000000 AS BIGINT) END AS $name"
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(floor(round(sum(value), 2) + 0.5) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |y AS (SELECT event_type, d,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) * x -
        |      CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS y
        |  FROM daily),
        |base AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM y GROUP BY event_type),
        |wl AS (SELECT event_type, d, y,
        |    $leads
        |  FROM y),
        |st AS ($unions),
        |lg AS (SELECT event_type, lag, CAST(sum(y * ylead) AS BIGINT) AS syk
        |  FROM st GROUP BY event_type, lag),
        |pvl AS (SELECT event_type,
        |    $pivots
        |  FROM lg GROUP BY event_type),
        |pv AS (SELECT b.event_type, b.n, b.syy,
        |    ${(1 to 3).map(k => s"pvl.s$k").mkString(", ")}
        |  FROM base b LEFT JOIN pvl USING (event_type))
        |SELECT event_type, n AS n_days, syy,
        |  ${sent(rk(1), "acf1_micro")},
        |  ${sent(rk(2), "acf2_micro")},
        |  ${sent(rk(3), "acf3_micro")},
        |  ${sent(rk(1), "pacf1_micro")},
        |  ${sent(phi22, "pacf2_micro")},
        |  ${sent(phi33, "pacf3_micro")},
        |  CAST(CASE WHEN $definedSql THEN 1 ELSE 0 END AS BIGINT) AS defined
        |FROM pv ORDER BY event_type""".stripMargin
    },
    // q255: identical exact micro-rate grid (integer division), identical
    // integer prior moments, identical double chains and sentinel
    "q255_eb_shrinkage" ->
      """WITH g AS (SELECT n_name,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name),
        |gm AS (SELECT n_name, n, y, (y * 1000000) // n AS p_micro FROM g),
        |prior AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(p_micro) AS BIGINT) AS sp,
        |    CAST(sum(p_micro * p_micro) AS BIGINT) AS spp FROM gm),
        |chain AS (SELECT k, sp, spp,
        |    CAST(sp AS DOUBLE) / CAST(k AS DOUBLE) / 1000000.0 AS m01,
        |    (CAST(k AS DOUBLE) * CAST(spp AS DOUBLE)
        |      - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
        |      / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE)) / 1000000000000.0 AS v01
        |  FROM prior),
        |pr AS (SELECT m01, v01,
        |    m01 * (1.0 - m01) / v01 - 1.0 AS ab,
        |    (v01 > 0.0) AND (m01 * (1.0 - m01) / v01 - 1.0 > 0.0) AS defined
        |  FROM chain)
        |SELECT n_name, n, y, p_micro AS raw_micro,
        |  CASE WHEN defined THEN CAST(floor(m01 * ab * 1000000.0 + 0.5) AS BIGINT)
        |    ELSE CAST(-1 AS BIGINT) END AS alpha_micro,
        |  CASE WHEN defined THEN CAST(floor((ab - m01 * ab) * 1000000.0 + 0.5) AS BIGINT)
        |    ELSE CAST(-1 AS BIGINT) END AS beta_micro,
        |  CASE WHEN defined THEN CAST(floor(
        |      (CAST(y AS DOUBLE) + m01 * ab) / (CAST(n AS DOUBLE) + ab)
        |      * 1000000.0 + 0.5) AS BIGINT)
        |    ELSE p_micro END AS shrunk_micro,
        |  CAST(CASE WHEN defined THEN 1 ELSE 0 END AS BIGINT) AS prior_defined
        |FROM gm CROSS JOIN pr ORDER BY n_name""".stripMargin,
    // q186: identical integer apportionment; leftover < |nations| goes to
    // the largest remainders under (rem DESC, n_name)
    "q186_apportionment" ->
      """WITH rev AS (SELECT n_name,
        |    CAST(floor(round(sum(o_totalprice), 2) * 100.0 + 0.5) AS BIGINT)
        |      AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1),
        |g AS (SELECT n_name, cents,
        |    CAST(sum(cents) OVER () AS BIGINT) AS total
        |  FROM rev),
        |b AS (SELECT n_name, cents,
        |    (1000 * cents) // total AS base,
        |    1000 * cents - ((1000 * cents) // total) * total AS rem,
        |    total
        |  FROM g),
        |r AS (SELECT n_name, cents, base, rem,
        |    CAST(row_number() OVER (ORDER BY rem DESC, n_name) AS BIGINT) AS rk,
        |    CAST(1000 - sum(base) OVER () AS BIGINT) AS leftover
        |  FROM b)
        |SELECT n_name, cents, CAST(base AS BIGINT) AS base, rk,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
        |    AS units
        |FROM r ORDER BY n_name""".stripMargin,
    // q187: the full-sort order-statistic SPEC — matching the two-phase
    // histogram answer proves the decomposition (q139/q146 discipline)
    "q187_distributed_select" ->
      """WITH c AS (SELECT CAST(floor(round(l_extendedprice, 2) * 100.0 + 0.5)
        |    AS BIGINT) AS v
        |  FROM lineitem),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c),
        |q(p) AS (VALUES (50), (90), (99))
        |SELECT CAST(p AS BIGINT) AS pct,
        |  CAST(ceil(p / 100.0 * nn.n) AS BIGINT) AS k,
        |  r.v AS cents
        |FROM q CROSS JOIN nn
        |JOIN r ON r.rn = CAST(ceil(p / 100.0 * nn.n) AS BIGINT)
        |ORDER BY pct""".stripMargin,
    // q188: identical integer crossing counts under the same unit order
    "q188_pps_sample" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(floor(round(sum(o_totalprice), 2) * 100.0 + 0.5) AS BIGINT)
        |      AS w
        |  FROM orders GROUP BY o_custkey),
        |g AS (SELECT o_custkey, w,
        |    CAST(sum(w) OVER (ORDER BY o_custkey ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum,
        |    CAST(sum(w) OVER () AS BIGINT) AS total
        |  FROM spend)
        |SELECT o_custkey, w, cum,
        |  CAST((20 * cum) // total - (20 * (cum - w)) // total AS BIGINT)
        |    AS hits
        |FROM g
        |WHERE (20 * cum) // total - (20 * (cum - w)) // total > 0
        |ORDER BY o_custkey""".stripMargin,
    // q189: per-series own-moment centering, day-shift join, factors
    // widened to DOUBLE before the denominator product
    "q189_cross_correlation" ->
      """WITH dv AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(floor(round(sum(value), 2) + 0.5) AS BIGINT) AS x
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |dp AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(floor(round(sum(value), 2) + 0.5) AS BIGINT) AS x
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |cv AS (SELECT d,
        |    CAST(count(*) OVER () AS BIGINT) * x -
        |      CAST(sum(x) OVER () AS BIGINT) AS xv
        |  FROM dv),
        |cp AS (SELECT d,
        |    CAST(count(*) OVER () AS BIGINT) * x -
        |      CAST(sum(x) OVER () AS BIGINT) AS yp
        |  FROM dp),
        |sx AS (SELECT CAST(sum(xv * xv) AS BIGINT) AS sxx FROM cv),
        |sy AS (SELECT CAST(sum(yp * yp) AS BIGINT) AS syy FROM cp),
        |k(lag) AS (VALUES (-3), (-2), (-1), (0), (1), (2), (3))
        |SELECT CAST(lag AS BIGINT) AS lag,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(floor(CAST(sum(cv.xv * cp.yp) AS DOUBLE) /
        |    sqrt((SELECT sxx FROM sx)::DOUBLE * (SELECT syy FROM sy)::DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) AS ccf_micro
        |FROM k JOIN cv ON true
        |JOIN cp ON cp.d = cv.d + CAST(lag AS INTEGER)
        |GROUP BY lag ORDER BY lag""".stripMargin,
    // q190: 7·x − trend₇ keeps the detrended value integral; only full
    // windows enter; DuckDB dayofweek is already Sunday=0
    "q190_seasonal_decompose" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(floor(round(sum(value), 2) + 0.5) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, d, x,
        |    CAST(sum(x) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS t7,
        |    CAST(count(*) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS n7
        |  FROM daily),
        |det AS (SELECT event_type,
        |    CAST(dayofweek(d) AS BIGINT) AS dow,
        |    7 * x - t7 AS det7
        |  FROM w WHERE n7 = 7)
        |SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(floor(CAST(sum(det7) AS DOUBLE) / (7.0 * count(*))
        |    * 1000000.0 + 0.5) AS BIGINT) AS seasonal_micro
        |FROM det GROUP BY 1, 2 ORDER BY event_type, dow""".stripMargin,
    // q191: the full-sort cumulative-weight spec for the two-phase answer
    "q191_weighted_select" ->
      """WITH c AS (SELECT
        |    CAST(floor(round(l_extendedprice, 2) * 100.0 + 0.5) AS BIGINT) AS v,
        |    CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem),
        |tw AS (SELECT CAST(sum(w) AS BIGINT) AS total FROM c),
        |r AS (SELECT v,
        |    CAST(sum(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS cum
        |  FROM c),
        |q(p) AS (VALUES (50), (90)),
        |kx AS (SELECT p, CAST(ceil(p / 100.0 * tw.total) AS BIGINT) AS k
        |  FROM q CROSS JOIN tw)
        |SELECT CAST(p AS BIGINT) AS pct, k,
        |  (SELECT min(v) FROM r WHERE cum >= kx.k) AS cents
        |FROM kx ORDER BY pct""".stripMargin,
    // q192: bag-semantics EXCEPT ALL / INTERSECT ALL folded to
    // multiplicity-sensitive (count, checksum)
    "q192_multiset_ops" ->
      """WITH ret AS (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
        |disc AS (SELECT l_orderkey FROM lineitem WHERE l_discount >= 0.05),
        |ex AS (SELECT * FROM ret EXCEPT ALL SELECT * FROM disc),
        |ia AS (SELECT * FROM ret INTERSECT ALL SELECT * FROM disc)
        |SELECT 'except_all' AS op, CAST(count(*) AS BIGINT) AS n,
        |  CAST(coalesce(sum(l_orderkey), 0) AS BIGINT) AS checksum FROM ex
        |UNION ALL
        |SELECT 'intersect_all', CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(l_orderkey), 0) AS BIGINT) FROM ia
        |ORDER BY op""".stripMargin,
    // q193: the four component formulas verbatim over one shared daily
    // CTE — composition must not change any metric
    "q193_timeseries_profile" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(floor(round(sum(value), 2) + 0.5) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |ix AS (SELECT event_type, y,
        |    CAST(date_diff('day', min(d) OVER (PARTITION BY event_type), d)
        |      AS BIGINT) AS x
        |  FROM daily),
        |trend AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(floor((count(*) * sum(x * y) - sum(x) * sum(y))::DOUBLE /
        |      nullif((count(*) * sum(x * x) - sum(x) * sum(x))::DOUBLE, 0.0)
        |      * 1000000.0 + 0.5) AS BIGINT) AS slope_micro
        |  FROM ix GROUP BY 1),
        |t AS (SELECT event_type, d, y,
        |    CAST(sum(y) OVER (PARTITION BY event_type) //
        |      count(*) OVER (PARTITION BY event_type) AS BIGINT) AS target
        |  FROM daily),
        |pp AS (SELECT event_type, d, target,
        |    CAST(sum(y - target) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pv
        |  FROM t),
        |sv AS (SELECT event_type, target,
        |    pv - least(0, min(pv) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS UNBOUNDED PRECEDING)) AS s
        |  FROM pp),
        |cu AS (SELECT event_type, CAST(max(s) AS BIGINT) AS max_cusum,
        |    CAST(sum(CASE WHEN s > target THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_alarm_days
        |  FROM sv GROUP BY 1),
        |cent AS (SELECT event_type, d,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) * y -
        |      CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS yc
        |  FROM daily),
        |cl AS (SELECT event_type, yc,
        |    lead(yc) OVER (PARTITION BY event_type ORDER BY d) AS y1,
        |    CAST(sum(yc * yc) OVER (PARTITION BY event_type) AS BIGINT) AS syy
        |  FROM cent),
        |acf AS (SELECT event_type,
        |    CAST(floor(CAST(sum(yc * y1) AS DOUBLE) / CAST(max(syy) AS DOUBLE)
        |      * 1000000.0 + 0.5) AS BIGINT) AS acf1_micro
        |  FROM cl WHERE y1 IS NOT NULL GROUP BY 1),
        |w7 AS (SELECT event_type, d, y,
        |    CAST(sum(y) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS t7,
        |    CAST(count(*) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS n7
        |  FROM daily),
        |sd AS (SELECT event_type, CAST(dayofweek(d) AS BIGINT) AS dow,
        |    CAST(floor(CAST(sum(7 * y - t7) AS DOUBLE) / (7.0 * count(*))
        |      * 1000000.0 + 0.5) AS BIGINT) AS sdow
        |  FROM w7 WHERE n7 = 7 GROUP BY 1, 2),
        |pk AS (SELECT event_type, dow AS peak_dow, sdow AS peak_seasonal_micro,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY sdow DESC, dow) AS rn
        |  FROM sd)
        |SELECT trend.event_type, n, slope_micro, max_cusum, n_alarm_days,
        |  acf1_micro, peak_dow, peak_seasonal_micro
        |FROM trend
        |JOIN cu ON cu.event_type = trend.event_type
        |JOIN acf ON acf.event_type = trend.event_type
        |JOIN pk ON pk.event_type = trend.event_type AND pk.rn = 1
        |ORDER BY trend.event_type""".stripMargin,
    // q195: identical LATERAL text — DuckDB executes the dependent
    // subquery with the same (price DESC, orderkey) tie order
    "q195_lateral" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer,
        |LATERAL (SELECT o_orderkey, o_totalprice
        |         FROM orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         LIMIT 2) t
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
  )
}

package graft

import graft.queries.RelationalQueries

/** Smoke + shape checks for the relational surface at sf0.001.
  * Value-level correctness is checked against the DuckDB oracle by the
  * driver (and locally via scripts/oracle_check.py) at sf0.01.
  */
class RelationalQueriesSpec extends SparkSpec {

  test("every relational query runs and yields rows at sf0.001") {
    RelationalQueries.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every relational query with an oracle has matching key set") {
    val missing = RelationalQueries.oracle.keySet -- RelationalQueries.queries.keySet
    assert(missing.isEmpty, s"oracle keys without query: $missing")
  }

  test("q02 aggregation matches hand-computed values") {
    import org.apache.spark.sql.functions._
    val df = RelationalQueries.queries("q02_agg_pricing")(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val total = df.agg(sum("count_order")).head.getLong(0)
    assert(total == li.count())
  }

  test("q10 topk is the global maximum set") {
    val df = RelationalQueries.queries("q10_topk")(spark, sfDir).collect()
    assert(df.length == 10)
    val maxAll = Tables.orders(spark, sfDir)
      .agg(org.apache.spark.sql.functions.max("o_totalprice")).head.getDouble(0)
    assert(df.map(_.getDouble(1)).max == BigDecimal(maxAll).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("pruned scan pushes filter and reads only selected columns") {
    val df = RelationalQueries.queries("q01_pruned_scan")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"),
      s"columns not pruned:\n$plan")
  }

  test("q154 retention: offset-0 anchors at 1.0, later offsets bounded and churning") {
    import org.apache.spark.sql.functions.col
    val rows = graft.queries.ExtQueries.queries("q154_retention")(spark, sfDir)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.filter(_._2 == 0L).forall(_._4 === 1.0), "cohort week 0 must be 100%")
    assert(rows.forall(r => r._4 > 0.0 && r._4 <= 1.0))
    // purchases churn in this stream: some cell is below full retention
    assert(rows.exists(_._4 < 1.0), "retention matrix is degenerate (all 1.0)")
  }

  test("q155 rolling active: trailing window dominates the day; spine covers the span") {
    val rows = graft.queries.ExtQueries.queries("q155_rolling_active")(spark, sfDir)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.forall { case (_, dau, wau, s) => wau >= dau && dau >= 0 && s <= 1.0 })
    // the 30-day synthetic stream has activity every day
    assert(rows.length === 30, s"expected a 30-day spine, got ${rows.length}")
  }

  test("q156 RFM: balanced quartiles, digit bounds, code composition") {
    val rows = graft.queries.ExtQueries.queries("q156_rfm")(spark, sfDir)
      .collect().map(r => (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (r, f, m, code) =>
      Seq(r, f, m).forall(q => q >= 1 && q <= 4) && code === r * 100 + f * 10 + m
    })
    // ntile balance: bucket sizes differ by at most one per dimension
    for (dim <- 0 to 2) {
      val sizes = rows.groupBy(t => dim match {
        case 0 => t._1; case 1 => t._2; case _ => t._3
      }).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"dimension $dim unbalanced: $sizes")
    }
  }

  test("q157 calibration: bins partition the rows, means stay inside their bin") {
    val rows = graft.ml.MlQueries.queries("q157_calibration")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val total = graft.Tables.lineitem(spark, sfDir).count()
    assert(rows.map(_._2).sum === total)
    assert(rows.forall { case (bin, _, ms, fp, gap) =>
      bin >= 0 && bin <= 9 &&
        ms >= bin / 10.0 - 1e-4 && ms < (bin + 1) / 10.0 + 1e-4 &&
        fp >= 0.0 && fp <= 1.0 &&
        math.abs(gap - math.abs(ms - fp)) < 1e-3
    })
    // the deterministic score design separates classes: the top bin is
    // all-positive (score ≥ 0.9 only reachable from the label-1 branch)
    assert(rows.find(_._1 == 9L).forall(_._4 === 1.0))
  }

  test("q158 markov: rows close a stochastic matrix and account for every transition") {
    val rows = graft.queries.ExtQueries.queries("q158_markov_transitions")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // conditional rows sum to 1 per from_type (4dp grid slack: one half-ulp per cell)
    rows.groupBy(_._1).foreach { case (from, cells) =>
      val p = cells.map(_._4).sum
      assert(math.abs(p - 1.0) <= cells.length * 1e-4, s"P(·|$from) sums to $p")
    }
    // every consecutive pair is accounted: Σn = |events| − |users with ≥1 event|
    val ev = Tables.events(spark, sfDir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum === expected)
  }

  test("q159 scd2: per-entity versions are contiguous, one current, no zero-length intervals") {
    val rows = graft.queries.ExtQueries.queries("q159_scd2")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), if (r.isNullAt(4)) null else r.getTimestamp(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.count(_._6) === 1, s"user $user: expected exactly one current version")
      assert(sorted.last._6 && sorted.last._5 == null, s"user $user: last version must be open")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 == b._4, s"user $user: interval gap between versions ${a._2} and ${b._2}")
          assert(a._4.compareTo(a._5) <= 0, s"user $user: negative interval")
          assert(a._3 != b._3, s"user $user: consecutive versions share state — run not collapsed")
        case _ => ()
      }
    }
  }

  test("q160 dq suite: pass/fail logic is live and thresholds bind") {
    val rows = graft.queries.ExtQueries.queries("q160_dq_suite")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.length === 5)
    val byName = rows.map(r => r._1 -> r).toMap
    // metrics are fractions of checked rows and passed mirrors the metric
    assert(rows.forall { case (_, n, ok, m, _) => ok <= n && m >= 0.0 && m <= 1.0 })
    // the synthetic lineitem REALLY carries duplicate (orderkey, line)
    // pairs — the uniqueness check catches a genuine defect, not a
    // fixture artifact (4599 distinct of 6000 at sf0.001)
    val uq = byName("uniqueness(l_orderkey,l_linenumber)")
    assert(!uq._5 && uq._4 < 1.0, "uniqueness check should catch the duplicated keys")
    assert(byName("completeness(l_shipdate)")._5)
    assert(byName("accepted_values(l_returnflag)")._5)
    // the quantity range check is deliberately tight enough to fail
    val rq = byName("range(l_quantity<=30)")
    assert(!rq._5 && rq._3 < rq._2, "range check should fail on real violations")
  }

  test("q161 triangles: 3-fold counting closes, clustering bounded, handshake parity") {
    val rows = graft.llm.LlmQueries.queries("q161_triangles")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // every triangle contributes to exactly 3 nodes
    assert(rows.map(_._3).sum % 3 === 0, "per-node triangle mass not divisible by 3")
    assert(rows.map(_._3).sum > 0, "derived graph has no triangles — gate is vacuous")
    // handshake lemma on the undirected edge set
    assert(rows.map(_._2).sum % 2 === 0)
    assert(rows.forall { case (_, d, t, c) =>
      c >= 0.0 && c <= 1.0 && (d >= 2 || (t == 0 && c == 0.0)) &&
        t <= d * (d - 1) / 2
    })
  }

  test("q162 mutual info: marginals close, chi2 non-negative, plug-in MI non-negative") {
    val rows = graft.llm.LlmQueries.queries("q162_mutual_info")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum === Tables.documents(spark, sfDir).count())
    rows.groupBy(_._1).foreach { case (src, cells) =>
      assert(cells.map(_._3).sum === cells.head._4, s"n_x marginal broken for $src")
    }
    rows.groupBy(_._2).foreach { case (lang, cells) =>
      assert(cells.map(_._3).sum === cells.head._5, s"n_y marginal broken for $lang")
    }
    assert(rows.forall(_._7 >= 0L), "chi-square terms must be non-negative")
    // plug-in MI ≥ 0 up to one half-ulp of the micro grid per cell
    assert(rows.map(_._6).sum >= -rows.length)
  }

  test("q163 pmi: support floor binds, pair mass bounded by unigram mass, real collocations") {
    val rows = graft.llm.LlmQueries.queries("q163_pmi_collocations")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 >= 5L), "support floor not applied")
    assert(rows.forall { case (_, _, cxy, cx, cy, _) => cxy <= cx && cxy <= cy },
      "a bigram occurred more often than one of its tokens")
    // a corpus of real sentences has positively-associated pairs
    assert(rows.exists(_._6 > 0L), "no positive PMI anywhere — matrix is degenerate")
    assert(rows.map(t => (t._1, t._2)).distinct.length === rows.length)
  }

  test("q164 seasonality: cells partition events, marginals close, residual sign matches") {
    val rows = graft.queries.ExtQueries.queries("q164_seasonality")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val total = Tables.events(spark, sfDir).count()
    assert(rows.map(_._3).sum === total)
    rows.groupBy(_._1).foreach { case (dow, cells) =>
      assert(cells.map(_._3).sum === cells.head._4, s"dow $dow marginal broken")
    }
    rows.groupBy(_._2).foreach { case (hr, cells) =>
      assert(cells.map(_._3).sum === cells.head._5, s"hour $hr marginal broken")
    }
    // residual sign agrees with observed-vs-expected (up to the micro grid)
    assert(rows.forall { case (_, _, n, nd, nh, res) =>
      val e = nd.toDouble * nh.toDouble / total.toDouble
      (n > e && res >= 0) || (n < e && res <= 0) || n == e
    })
  }

  test("q165 ab test: arms partition the users, z sign follows uplift") {
    val r = graft.queries.ExtQueries.queries("q165_ab_test")(spark, sfDir).collect()
    assert(r.length === 1)
    val row = r.head
    val (n0, c0, n1, c1) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(n0 + n1 === users, "arms must partition the user set")
    assert(n0 > 0 && n1 > 0, "hash split left an arm empty")
    assert(c0 <= n0 && c1 <= n1)
    val (cr0, cr1) = (row.getDouble(4), row.getDouble(5))
    assert(cr0 >= 0.0 && cr0 <= 1.0 && cr1 >= 0.0 && cr1 <= 1.0)
    val (uplift, z) = (row.getLong(6), row.getLong(7))
    assert(uplift.signum * z.signum >= 0, "z and uplift disagree in sign")
  }

  test("q166 ewma: fold recomputes exactly from the daily series and stays in its hull") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.ExtQueries.queries("q166_ewma")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(floor(round(sum(col("value")), 2) * 100.0 + 0.5).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getDate(1), r.getLong(2)))
    val byUser = daily.groupBy(_._1)
    assert(out.keySet === byUser.keySet)
    byUser.foreach { case (u, rows) =>
      val xs = rows.sortBy(_._2.toLocalDate.toEpochDay).map(_._3)
      val expected = xs.tail.foldLeft(xs.head)((acc, x) => (acc + x) / 2)
      assert(out(u)._1 === xs.length.toLong, s"user $u n_days")
      assert(out(u)._2 === expected, s"user $u ewma mismatch")
      assert(out(u)._2 >= xs.min && out(u)._2 <= xs.max, s"user $u ewma left the hull")
    }
  }

  test("q167 trend fit: closed form recomputes exactly from the daily series") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.ExtQueries.queries("q167_trend_fit")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.nonEmpty)
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(floor(round(sum(col("value")), 2) + 0.5).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val d0 = rows.map(_._2).min
      val xy = rows.map(t => (t._2 - d0, t._3))
      val n = xy.length.toLong
      val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
      val (sxx, sxy2, syy) = (xy.map(t => t._1 * t._1).sum,
        xy.map(t => t._1 * t._2).sum, xy.map(t => t._2 * t._2).sum)
      val num = (n * sxy2 - sx * sy).toDouble
      val den = (n * sxx - sx * sx).toDouble
      val slope = num / den
      def s6(x: Double) = math.floor(x * 1e6 + 0.5).toLong
      val (on, oSlope, oInt, oR2) = out(et)
      assert(on === n, s"$et n")
      assert(oSlope === s6(slope), s"$et slope")
      assert(oInt === s6((sy.toDouble - slope * sx.toDouble) / n.toDouble), s"$et intercept")
      assert(oR2 === s6(num * num / (den * (n * syy - sy * sy).toDouble)), s"$et r2")
      assert(oR2 >= 0L && oR2 <= 1000001L, s"$et r2 out of [0,1]")
    }
  }

  test("q168 correlated subquery: matches an explicit aggregate-join rewrite") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.ExtQueries.queries("q168_correlated_subq")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    val li = Tables.lineitem(spark, sfDir)
    val thr = li.groupBy(col("l_partkey").as("pk"))
      .agg((avg(col("l_quantity")) * 0.5).as("half_avg"))
    val exp = li.join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .join(thr, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("half_avg"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === exp, "decorrelated result diverged from the manual rewrite")
  }

  test("q169 BFS: layers equal a driver-side reference search over the same graph") {
    val out = graft.llm.LlmQueries.queries("q169_bfs_reach")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    val n = Tables.documents(spark, sfDir).count()
    def rh(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val adj = (0L until n).map(i =>
      i -> (1 to 3).map(j => rh(s"$i#$j") % n).filter(_ != i).distinct).toMap
    val dist = scala.collection.mutable.Map[Long, Long](
      (0L until n).filter(_ % 97 == 0).map(_ -> 0L): _*)
    var frontier = dist.keys.toSet
    for (h <- 1 to 6) {
      val nxt = frontier.flatMap(adj(_)).filterNot(dist.contains)
      nxt.foreach(v => dist(v) = h.toLong)
      frontier = nxt
    }
    val exp = dist.toSeq.groupBy(_._2).toSeq
      .map { case (h, vs) => (h, vs.size.toLong, vs.map(_._1).sum) }
      .sortBy(_._1)
    assert(out === exp, "distributed BFS diverged from the sequential reference")
    assert(out.head._1 === 0L && out.length >= 2, "search never left the seed layer")
  }

  test("q217 weighted SSSP: k-round Bellman-Ford equals a sequential reference; invariants pinned") {
    val out = graft.llm.LlmQueries.queries("q217_weighted_sssp")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    val n = Tables.documents(spark, sfDir).count()
    def rh(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val edges = (0L until n).flatMap(i =>
      (1 to 3).map(j => rh(s"$i#$j") % n).filter(_ != i).distinct
        .map(d => (i, d, rh(s"$i#$d#w") % 9 + 1)))
    // k rounds of relaxation: dist after round k = min cost over <=k-edge paths
    var dist: Map[Long, Long] =
      (0L until n).filter(_ % 97 == 0).map(_ -> 0L).toMap
    val perRound = (1 to 6).map { _ =>
      val relaxed = edges.flatMap { case (s0, d0, w) =>
        dist.get(s0).map(x => d0 -> (x + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (v, xs) => v -> xs.map(_._2).min }
      dist
    }
    val exp = dist.toSeq.groupBy(_._2).toSeq
      .map { case (d, vs) => (d, vs.size.toLong, vs.map(_._1).sum) }
      .sortBy(_._1)
    assert(out === exp, "distributed Bellman-Ford diverged from the sequential reference")
    // invariants: seeds stay at 0; rounds are pointwise monotone
    // non-increasing; every reported distance is within the k*maxW bound
    assert(out.head._1 === 0L && out.length >= 2, "relaxation never left the seed set")
    perRound.sliding(2).foreach { case Seq(a, b) =>
      a.foreach { case (v, d) => assert(b(v) <= d, s"round increased dist of $v") }
    case _ => ()
    }
    assert(out.map(_._1).max <= 54L, "distance exceeds rounds*maxWeight")
    // weighted profile must differ from hop counts: some node has a
    // cheapest path longer (in hops*1) than its BFS hop count times 9
    assert(out.map(_._1).toSet.size === out.length, "profile keys not distinct")
  }

  test("q170 association rules: count consistency, support floor, lift recomputation") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.ExtQueries.queries("q170_assoc_rules")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getLong(8)))
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    val nOrders = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey")).distinct().count()
    rows.foreach { case (a, b, nab, na, nb, supp, cab, cba, lift) =>
      assert(a < b, "pair not canonically ordered")
      assert(nab <= math.min(na, nb), s"($a,$b): pair count exceeds item count")
      assert(nab.toDouble >= nOrders / 100.0, s"($a,$b): support floor violated")
      def f4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
      assert(supp === f4(nab.toDouble / nOrders), s"($a,$b) support")
      assert(cab === f4(nab.toDouble / na) && cba === f4(nab.toDouble / nb), s"($a,$b) conf")
      assert(lift === math.floor(nab.toDouble * nOrders / (na.toDouble * nb) * 1e6 + 0.5).toLong,
        s"($a,$b) lift")
    }
  }

  test("q171 Benford: digits partition the rows and the expected law sums to one") {
    val rows = graft.queries.ExtQueries.queries("q171_benford")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq === (1L to 9L), "all nine leading digits must appear")
    assert(rows.map(_._2).sum === rows.head._3, "digit counts must partition the total")
    // the nine micro literals are an exact partition of probability 1
    assert(rows.map(_._5).sum === 1000000L, "Benford constants drifted")
    rows.foreach { case (d, nObs, nTot, _, pExp, term) =>
      val e = nTot.toDouble * pExp / 1e6
      assert(term === math.floor((nObs - e) * (nObs - e) / e * 1e6 + 0.5).toLong,
        s"digit $d chi-square term")
    }
  }

  test("q172 exists subquery: matches a driver-side brute-force evaluation") {
    val out = graft.queries.ExtQueries.queries("q172_exists_subq")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_returnflag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byOrder = li.groupBy(_._1)
    val exp = li.filter(_._3 == "R").map(t => (t._1, t._2)).distinct
      .filter { case (ok, sk) =>
        val lines = byOrder(ok)
        lines.exists(_._2 != sk) &&
          !lines.exists(l => l._2 != sk && l._3 == "R")
      }
      .groupBy(_._2).map { case (sk, os) => sk -> os.map(_._1).distinct.length.toLong }
    assert(out === exp, "semi/anti decorrelation diverged from brute force")
    assert(out.nonEmpty)
  }

  test("q173 CUSUM: closed form equals the sequential recurrence") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.ExtQueries.queries("q173_cusum")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) null else r.getTimestamp(5))).toMap
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(floor(round(sum(col("value")), 2) + 0.5).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val ys = rows.sortBy(_._2.toLocalDate.toEpochDay)
      val target = ys.map(_._3).sum / ys.length // integer div, same as the query
      var s = 0L; var mx = 0L; var alarms = 0L
      var first: java.sql.Date = null
      ys.foreach { case (_, d, y) =>
        s = math.max(0L, s + (y - target))
        mx = math.max(mx, s)
        if (s > target) { alarms += 1; if (first == null) first = d }
      }
      val (oN, oT, oMax, oAl, oFirst) = out(et)
      assert(oN === ys.length.toLong && oT === target, s"$et grain/target")
      assert(oMax === mx, s"$et max cusum: recurrence $mx vs closed form $oMax")
      assert(oAl === alarms, s"$et alarm days")
      // session TZ is UTC, so the timestamp's UTC instant prefix is the date
      assert(Option(oFirst).map(t =>
          java.time.Instant.ofEpochMilli(t.getTime).toString.take(10)) ===
        Option(first).map(_.toString), s"$et first alarm day")
    }
  }

  test("q175 WOE/IV: bins partition the table, terms recompute, IV non-negative") {
    val rows = graft.queries.ExtQueries.queries("q175_woe_iv")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq === (1L to 10L), "ten deciles expected")
    assert(rows.map(_._2).sum === Tables.lineitem(spark, sfDir).count())
    val tGood = rows.map(_._3).sum.toDouble
    val tBad = rows.map(_._4).sum.toDouble
    rows.foreach { case (bin, n, g, b, woe, iv) =>
      assert(g + b === n, s"bin $bin class split")
      val w = math.log((g * tBad) / (b * tGood))
      assert(woe === math.floor(w * 1e6 + 0.5).toLong, s"bin $bin woe")
      assert(iv === math.floor((g / tGood - b / tBad) * w * 1e6 + 0.5).toLong, s"bin $bin iv")
      // (x−y)·ln(x/y) ≥ 0 always — a negative summand means a math slip
      assert(iv >= -1L, s"bin $bin negative IV term")
    }
  }

  test("q176 skyline: output is exactly the non-dominated point set") {
    val out = graft.queries.ExtQueries.queries("q176_skyline")(spark, sfDir)
      .collect().map(r => (r.getDouble(0), r.getInt(1))).toSet
    val pts = Tables.part(spark, sfDir)
      .select("p_retailprice", "p_size").distinct()
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    val frontier = pts.filter { case (p, s) =>
      !pts.exists { case (p2, s2) =>
        (p2 <= p && s2 >= s) && (p2 < p || s2 > s)
      }
    }.toSet
    assert(out === frontier, "window skyline diverged from the dominance definition")
    assert(out.nonEmpty && out.size < pts.length, "frontier should prune something")
  }

  test("q177 peak concurrency: sweep equals a driver-side interval scan") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.ExtQueries.queries("q177_peak_concurrency")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getTimestamp(2).getTime))).toMap
    val evs = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("t0"),
        floor(col("value")).cast("long").as("dur"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(2) + r.getLong(3) * 1000000L))
    evs.groupBy(_._1).foreach { case (et, is) =>
      val bounds = (is.map(e => (e._3, 1L, e._2)) ++ is.map(e => (e._4, -1L, e._2)))
        .sortBy(b => (b._1, b._2, b._3))
      var load = 0L; var peak = 0L; var first = Long.MinValue
      bounds.foreach { case (t, d, _) =>
        load += d
        if (load > peak) { peak = load; first = t }
      }
      assert(out(et)._1 === peak, s"$et peak")
      assert(out(et)._2 === first / 1000L, s"$et first peak instant")
    }
  }

  test("q178 share of parent: shares close to one within each level") {
    val rows = graft.queries.ExtQueries.queries("q178_share_of_parent")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (region, ns) =>
      val s = ns.map(_._4).sum
      assert(math.abs(s - 1.0) <= ns.length * 1e-4, s"$region shares sum to $s")
      assert(ns.map(_._6).sorted.toSeq === (1L to ns.length), s"$region ranks not a permutation")
      // a region's share-of-total is constant across its nations
      assert(ns.map(_._5).distinct.length === 1, s"$region inconsistent parent share")
    }
    val regionShares = rows.groupBy(_._1).map(_._2.head._5).sum
    assert(math.abs(regionShares - 1.0) <= rows.length * 1e-4)
  }

  test("q179 Gini/Lorenz: curve is convex-increasing to 1.0 and Gini recomputes exactly") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.ExtQueries.queries("q179_gini_lorenz")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === (1L to 10L))
    assert(rows.map(_._3).toSeq === rows.map(_._3).sorted, "Lorenz curve must be increasing")
    assert(math.abs(rows.last._3 - 1.0) < 1e-9, "cumulative share must close at 1.0")
    assert(rows.map(_._4).distinct.length === 1, "Gini must be one number")
    // sequential recomputation from the sorted per-customer series
    val cents = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(floor(round(sum(col("o_totalprice")), 2) * 100.0 + 0.5).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._2, t._1)).map(_._2)
    val n = cents.length.toLong
    val t = cents.sum
    val six = cents.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    val g = (2.0 * six - (n + 1) * t) / (n.toDouble * t)
    assert(rows.head._4 === math.floor(g * 1e6 + 0.5).toLong, "Gini diverged")
    assert(rows.head._4 >= 0L && rows.head._4 <= 1000000L)
  }

  test("q180 assortativity: closed form recomputes from a driver-side graph build") {
    val row = graft.llm.LlmQueries.queries("q180_assortativity")(spark, sfDir).head()
    spark.catalog.clearCache()
    val n = Tables.documents(spark, sfDir).count()
    def rh(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val und = (0L until n).flatMap(i => (1 to 3).map(j => rh(s"$i#$j") % n).filter(_ != i)
      .map(d => (math.min(i, d), math.max(i, d)))).distinct
    val deg = und.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val m2 = und.size * 2L
    val sx = und.map(e => deg(e._1) + deg(e._2)).sum
    val sxx = und.map(e => deg(e._1) * deg(e._1) + deg(e._2) * deg(e._2)).sum
    val sxy = und.map(e => deg(e._1) * deg(e._2)).sum * 2L
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ===
      ((m2, sx, sxx, sxy)), "edge/degree sums diverged")
    val r = (m2.toDouble * sxy - sx.toDouble * sx) / (m2.toDouble * sxx - sx.toDouble * sx)
    assert(row.getLong(4) === math.floor(r * 1e6 + 0.5).toLong, "assortativity diverged")
  }

  test("q181 readability: hand-computed grade on known text; counts stay positive") {
    val rows = graft.llm.LlmQueries.queries("q181_readability")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, w, s, y, _) =>
      assert(w >= 1 && s >= 1 && y >= w, s"doc $id: every word has >= 1 syllable")
    }
    // recompute the grade formula from the emitted counts
    rows.foreach { case (id, w, s, y, g) =>
      val exp = 0.39 * w / s + 11.8 * y.toDouble / w - 15.59
      assert(g === math.floor(exp * 1e6 + 0.5).toLong, s"doc $id grade")
    }
    // hand example: "hello world. it works" → 4 words, 2 sentences,
    // syllables: hel-lo=2 (e,o), world=1 (o), it=1 (i), works=1 (o) = 5
    import spark.implicits._
    val tiny = Seq((1L, "hello world. it works")).toDF("doc_id", "text")
    tiny.createOrReplaceTempView("tiny_doc")
    val t = spark.sql(
      """SELECT aggregate(filter(split(text, '\\s+'), t -> t <> ''), 0L,
        |  (acc, w) -> acc + greatest(1L, size(regexp_extract_all(lower(w), '[aeiouy]+', 0))))
        |FROM tiny_doc""".stripMargin).head.getLong(0)
    assert(t === 5L, s"syllable fold broke on the hand example: $t")
  }

  test("q182 equi-depth histogram: buckets balance, boundaries chain, ndv bounded") {
    val rows = graft.queries.ExtQueries.queries("q182_equidepth_hist")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq === (1L to 16L))
    assert(rows.map(_._2).sum === Tables.lineitem(spark, sfDir).count())
    // equi-depth: bucket sizes differ by at most one
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1, "buckets not depth-balanced")
    rows.foreach { case (b, n, lo, hi, ndv) =>
      assert(lo <= hi && ndv >= 1 && ndv <= n, s"bucket $b stats inconsistent")
    }
    // ranks follow the value order, so bucket k's max never exceeds k+1's min
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3, s"boundary inversion at ${b._1}")
      case _ => ()
    }
  }

  test("q183 heavy hitters: gate booleans all true and the set matches exact counts") {
    import org.apache.spark.sql.functions._
    val rows = graft.llm.LlmQueries.queries("q183_heavy_hitters")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    spark.catalog.clearCache()
    assert(rows.nonEmpty, "heavy-hitter gate is vacuous")
    assert(rows.forall(_._3), "MG containment theorem violated in the engine")
    assert(rows.forall(_._4), "MG undercount bound violated in the engine")
    // the heavy set itself is exact and deterministic
    val toks = Tables.documents(spark, sfDir)
      .select(explode(graft.llm.TextOps.tokens(col("text"))).as("t"))
    val n = toks.count()
    val exp = toks.groupBy(col("t")).count()
      .filter(col("count").cast("double") > n / 33.0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r._1 -> r._2).toMap === exp)
  }

  test("q184 peer anomaly: moments recompute per nation; outliers respect the cut") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.ExtQueries.queries("q184_peer_anomaly")(spark, sfDir)
      .collect().map(r => r.getAs[Number](0).longValue() ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("long"),
        floor(round(col("c_acctbal"), 2) * 100.0 + 0.5).cast("long").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    cust.groupBy(_._1).foreach { case (nk, xs) =>
      val v = xs.map(_._2)
      val n = v.length.toLong
      val (sx, sxx) = (v.sum, v.map(x => x * x).sum)
      val sigma = math.sqrt(n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) / n
      val zs = v.map(x => (x - sx.toDouble / n) / sigma)
      val (oN, oOut, oMax) = out(nk)
      assert(oN === n, s"nation $nk count")
      assert(oOut === zs.count(z => math.abs(z) > 2.0).toLong, s"nation $nk outliers")
      assert(oMax === math.floor(zs.map(math.abs).max * 1e6 + 0.5).toLong, s"nation $nk max z")
      assert(oOut < n, s"nation $nk: everyone an outlier — z-cut degenerate")
    }
  }

  test("q185 ACF: integer-scaled form equals the textbook estimator, driver-recomputed") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.ExtQueries.queries("q185_autocorrelation")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out.nonEmpty)
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(floor(round(sum(col("value")), 2) + 0.5).cast("long").as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      val n = xs.length.toLong
      val t = xs.sum
      val ys = xs.map(x => n * x - t)
      val syy = ys.map(y => y * y).sum
      for (k <- 1 to 7; if n - k > 0) {
        val pairs = ys.dropRight(k).zip(ys.drop(k))
        val r = pairs.map { case (a, b) => a * b }.sum.toDouble / syy.toDouble
        val (oN, oAcf) = out((et, k.toLong))
        assert(oN === (n - k), s"$et lag $k pair count")
        assert(oAcf === math.floor(r * 1e6 + 0.5).toLong, s"$et lag $k acf")
        assert(math.abs(oAcf) <= 1000001L, s"$et lag $k acf out of [-1,1]")
      }
    }
  }

  test("q186 apportionment: units sum exactly to the budget and track proportionality") {
    val rows = graft.queries.ExtQueries.queries("q186_apportionment")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._5).sum === 1000L, "allocation must exhaust the budget exactly")
    assert(rows.forall(r => r._5 - r._3 == 0L || r._5 - r._3 == 1L),
      "largest-remainder gives base or base+1, never more")
    // full driver-side recomputation of Hamilton's method
    val total = rows.map(_._2).sum
    val base = rows.map(r => (r._1, r._2, 1000L * r._2 / total,
      1000L * r._2 - (1000L * r._2 / total) * total))
    val leftover = 1000L - base.map(_._3).sum
    val topped = base.sortBy(b => (-b._4, b._1)).zipWithIndex
      .map { case ((nm, _, b, _), i) => nm -> (if (i < leftover) b + 1 else b) }.toMap
    rows.foreach { case (nm, _, _, _, units) =>
      assert(units === topped(nm), s"$nm allocation diverged from Hamilton's method")
    }
    // monotonicity: more revenue never means fewer units
    rows.sortBy(_._2).map(_._5).sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1, "allocation wildly non-monotone")
      case _ => ()
    }
  }

  test("q189 cross-correlation: driver recomputation matches; lag 0 is the day intersection") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.ExtQueries.queries("q189_cross_correlation")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet === (-3L to 3L).toSet)
    def series(t: String) = Tables.events(spark, sfDir)
      .filter(col("event_type") === t)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(floor(round(sum(col("value")), 2) + 0.5).cast("long").as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1))).sortBy(_._1)
    val (v, p) = (series("view"), series("purchase"))
    def centered(s: Array[(Long, Long)]) = {
      val n = s.length.toLong; val t = s.map(_._2).sum
      s.map { case (d, x) => (d, n * x - t) }.toMap
    }
    val (cv, cp) = (centered(v), centered(p))
    val sxx = cv.values.map(y => y * y).sum
    val syy = cp.values.map(y => y * y).sum
    for (k <- -3L to 3L) {
      val pairs = cv.toSeq.flatMap { case (d, xv) => cp.get(d + k).map(yp => xv * yp) }
      val r = pairs.sum.toDouble / math.sqrt(sxx.toDouble * syy.toDouble)
      assert(out(k)._1 === pairs.length.toLong, s"lag $k pair count")
      assert(out(k)._2 === math.floor(r * 1e6 + 0.5).toLong, s"lag $k ccf")
    }
  }

  test("q190 seasonal decomposition: indices recompute and detrended mass closes") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.ExtQueries.queries("q190_seasonal_decompose")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out.nonEmpty)
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(floor(round(sum(col("value")), 2) + 0.5).cast("long").as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val xs = rows.sortBy(_._2.toEpochDay)
      val det = (3 until xs.length - 3).map { i =>
        val t7 = (i - 3 to i + 3).map(j => xs(j)._3).sum
        // java DayOfWeek: Monday=1..Sunday=7 → Sunday=0 convention
        val dow = xs(i)._2.getDayOfWeek.getValue % 7
        (dow.toLong, 7L * xs(i)._3 - t7)
      }
      det.groupBy(_._1).foreach { case (dow, cells) =>
        val (oN, oS) = out((et, dow))
        assert(oN === cells.length.toLong, s"$et dow $dow count")
        val exp = cells.map(_._2).sum.toDouble / (7.0 * cells.length)
        assert(oS === math.floor(exp * 1e6 + 0.5).toLong, s"$et dow $dow seasonal")
      }
    }
  }

  test("q192 multiset ops: bag identities close against exact multiplicity maps") {
    import org.apache.spark.sql.functions.col
    val out = graft.queries.ExtQueries.queries("q192_multiset_ops")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_returnflag", "l_discount")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def bag(xs: Seq[Long]) = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val a = bag(li.filter(_._2 == "R").map(_._1))
    val b = bag(li.filter(_._3 >= 0.05).map(_._1))
    val exN = a.map { case (k, n) => math.max(0L, n - b.getOrElse(k, 0L)) }.sum
    val exSum = a.map { case (k, n) => k * math.max(0L, n - b.getOrElse(k, 0L)) }.sum
    val inN = a.map { case (k, n) => math.min(n, b.getOrElse(k, 0L)) }.sum
    val inSum = a.map { case (k, n) => k * math.min(n, b.getOrElse(k, 0L)) }.sum
    assert(out("except_all") === ((exN, exSum)), "EXCEPT ALL multiplicities")
    assert(out("intersect_all") === ((inN, inSum)), "INTERSECT ALL multiplicities")
    // bag identity: |A| = |A \\ B| + |A ∩ B|
    assert(a.values.sum === exN + inN, "bag partition identity broken")
  }

  test("q193 composed profile: every metric equals its standalone component query") {
    val prof = graft.queries.ExtQueries.queries("q193_timeseries_profile")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    spark.catalog.clearCache()
    assert(prof.nonEmpty)
    val trend = graft.queries.ExtQueries.queries("q167_trend_fit")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val cusum = graft.queries.ExtQueries.queries("q173_cusum")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    val acf = graft.queries.ExtQueries.queries("q185_autocorrelation")(spark, sfDir)
      .collect().filter(_.getLong(1) == 1L)
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val season = graft.queries.ExtQueries.queries("q190_seasonal_decompose")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    prof.foreach { case (et, (n, slope, mx, al, a1, pdow, pseason)) =>
      assert((n, slope) === trend(et), s"$et trend branch diverged composed")
      assert((mx, al) === cusum(et), s"$et CUSUM branch diverged composed")
      assert(a1 === acf(et), s"$et ACF branch diverged composed")
      val best = season.filter(_._1 == et).sortBy(t => (-t._3, t._2)).head
      assert((pdow, pseason) === ((best._2, best._3)), s"$et seasonal argmax diverged")
    }
  }

  test("q194 k-core: driver-side peeling recomputes every trace row") {
    val out = graft.llm.LlmQueries.queries("q194_kcore")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    spark.catalog.clearCache()
    assert(out.map(_._1) === (1L to 4L))
    // n_alive never increases across peeling rounds
    assert(out.map(_._2).sliding(2).forall { case Seq(a, b) => b <= a; case _ => true })
    val n = Tables.documents(spark, sfDir).count()
    def rh(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val und = (0L until n).flatMap(i => (1 to 3).map(j => rh(s"$i#$j") % n).filter(_ != i)
      .map(d => (math.min(i, d), math.max(i, d)))).distinct
    var alive = und.flatMap(e => Seq(e._1, e._2)).distinct.toSet
    (1 to 4).foreach { r =>
      val e = und.filter(x => alive(x._1) && alive(x._2))
      val deg = e.flatMap(x => Seq(x._1, x._2)).groupBy(identity).map { case (v, xs) => v -> xs.size }
      alive = alive.filter(v => deg.getOrElse(v, 0) >= 3)
      val eAfter = und.filter(x => alive(x._1) && alive(x._2))
      assert(out(r - 1) === ((r.toLong, alive.size.toLong, eAfter.size.toLong, alive.sum)),
        s"round $r trace diverged")
    }
  }

  test("q195 lateral: agrees with the window-function hand rewrite") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.ExtQueries.queries("q195_lateral")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val exp = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
      .join(Tables.orders(spark, sfDir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out === exp, "LATERAL and window formulations disagree")
    assert(out.nonEmpty)
    // at most two orders per customer
    out.groupBy(_._1).foreach { case (c, os) => assert(os.size <= 2, s"customer $c over-limit") }
  }

  test("q209 KDE: every grid point's kernel mass recomputes exactly; the curve integrates to ~1") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.ExtQueries.queries("q209_kde_amount")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length === 64)
    val cents = Tables.orders(spark, sfDir)
      .select(floor(round(col("o_totalprice"), 2) * 100.0 + 0.5).cast("long").as("c"))
      .collect().map(_.getLong(0))
    val (n, lo, hi) = (cents.length.toLong, cents.min, cents.max)
    val h = math.max(1L, (hi - lo) / 8)
    out.foreach { case (j, g, mass, density) =>
      assert(g === lo + (hi - lo) * j / 63L, s"grid point $j off the integer grid")
      val exp = cents.filter(c => math.abs(c - g) <= h).map { c =>
        val z = (c - g).toDouble / h.toDouble
        math.floor(0.75 * (1.0 - z * z) * 1e12).toLong
      }.sum
      assert(mass === exp, s"grid point $j kernel mass drifted")
      assert(density === mass.toDouble / (n.toDouble * h.toDouble * 1e12))
    }
    // Riemann sum over the grid ≈ 1 (short of 1 by the boundary truncation
    // and the coarse step; far from 0 unless the kernel went missing)
    val step = math.max(1L, (hi - lo) / 63)
    val integral = out.map(_._4).sum * step
    assert(integral > 0.5 && integral < 1.1, s"density integral off: $integral")
  }

  test("q211 HLL equals a driver reference, merges shard-invariantly, and estimates within bounds") {
    import org.apache.spark.sql.functions._
    def hash(s: String): Long = {
      val h0 = s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31L + (b & 0xff)) % 1000000007L)
      val h1 = (h0 ^ (h0 >> 16)) * 73244475L % 2147483648L
      val h2 = (h1 ^ (h1 >> 13)) * 73244475L % 2147483648L
      h2 ^ (h2 >> 16)
    }
    def rank(w: Long): Long =
      if (w == 0L) 24L else 24L - (64 - java.lang.Long.numberOfLeadingZeros(w))
    def sketch(keys: Seq[String]): Array[Long] = {
      val m = Array.fill(256)(0L)
      keys.foreach { k =>
        val h = hash(k); val j = (h % 256).toInt
        m(j) = math.max(m(j), rank(h / 256))
      }
      m
    }
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").cast("long"), col("l_linenumber").cast("long"),
        col("l_partkey").cast("long"))
      .collect()
    val lineKeys = li.map(r => s"${r.getLong(0)}#${r.getLong(1)}").toSeq
    val partKeys = li.map(r => r.getLong(2).toString).toSeq
    val out = graft.queries.ExtQueries.queries("q211_hll_cardinality")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out.keySet === Set("line_ids", "part_keys"))
    for ((scope, keys) <- Seq("line_ids" -> lineKeys, "part_keys" -> partKeys)) {
      val regs = sketch(keys)
      val used = regs.count(_ > 0L).toLong
      val denom = regs.map(mm => 1L << (30 - mm)).sum
      val alphaChain = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 1073741824.0
      val est = alphaChain / denom.toDouble
      val (nExact, regsUsed, sumRank, maxRank, dnm, estMicro) = out(scope)
      assert(nExact === keys.distinct.size.toLong, s"$scope n_exact")
      assert(regsUsed === used, s"$scope regs_used")
      assert(sumRank === regs.sum, s"$scope sum_rank")
      assert(maxRank === regs.max, s"$scope max_rank")
      assert(dnm === denom, s"$scope denom")
      assert(estMicro === math.floor(est * 1e6 + 0.5).toLong, s"$scope est_micro")
      // mergeability: sketch arbitrary thirds of the stream, max-merge —
      // must equal the whole-corpus register vector (what makes the
      // partial-aggregate shard shape in the engine correct by algebra)
      val thirds = keys.zipWithIndex.groupBy(_._2 % 3).values.map(c => sketch(c.map(_._1)))
      val merged = thirds.reduce((a, b) => a.zip(b).map { case (x, y) => math.max(x, y) })
      assert(merged.toSeq === regs.toSeq, s"$scope shard merge drifted")
    }
    // accuracy: dense scope raw estimator within 2·(1.04/√256) ≈ 13%
    // (measured 0.45% at sf0.001 — the avalanche finalizer is what buys
    // this; without it the lattice-structured polynomial hash reads 40%
    // high); sparse scope is the documented small-range regime — the raw
    // estimate is biased high there, and the driver-side linear-counting
    // correction (m·ln(m/V), the part kept out of the cross-engine
    // contract because ln isn't correctly-rounded-guaranteed) lands it
    val (nDense, _, _, _, _, estDense) = out("line_ids")
    assert(math.abs(estDense / 1e6 - nDense) / nDense < 0.13,
      s"dense estimate off: ${estDense / 1e6} vs $nDense")
    val (nSparse, usedSparse, _, _, _, estSparse) = out("part_keys")
    if (nSparse < 2.5 * 256 && usedSparse < 256) {
      assert(estSparse / 1e6 >= nSparse * 0.8, "raw small-range estimate should not undershoot badly")
      val lc = 256.0 * math.log(256.0 / (256.0 - usedSparse))
      assert(math.abs(lc - nSparse) / nSparse < 0.10,
        s"linear counting off: $lc vs $nSparse")
    }
  }

  test("q216 Mann-Whitney doubled rank-sums equal a direct midrank computation; identities pinned") {
    import org.apache.spark.sql.functions._
    val rows = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag").isin("R", "N"))
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byVal = rows.groupBy(_._2).toSeq.sortBy(_._1)
    var cum = 0L
    var twoR1 = 0L; var twoR0 = 0L; var tieT = 0L
    byVal.foreach { case (_, g) =>
      val n1 = g.count(_._1 == "R").toLong; val n0 = g.count(_._1 == "N").toLong
      val t = n1 + n0
      val twoR = 2 * cum + t + 1 // doubled midrank: exact long, odd/even safe
      twoR1 += n1 * twoR; twoR0 += n0 * twoR; tieT += t * t * t - t
      cum += t
    }
    val n1 = rows.count(_._1 == "R").toLong; val n0 = rows.count(_._1 == "N").toLong
    val n = n1 + n0
    // the rank-sum identity: total doubled ranks = 2 * N(N+1)/2
    assert(twoR1 + twoR0 === n * (n + 1), "doubled midranks don't sum to N(N+1)")
    val twoU1 = twoR1 - n1 * (n1 + 1)
    val out = graft.queries.ExtQueries.queries("q216_mann_whitney")(spark, sfDir).collect()
    assert(out.length === 1)
    val r0 = out.head
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2), r0.getLong(3), r0.getLong(4)) ===
      ((n1, n0, twoR1, twoU1, tieT)), "exact integer tier diverged from driver midranks")
    val u1 = twoU1 / 2.0
    val variance = n1.toDouble * n0.toDouble / 12.0 *
      ((n + 1).toDouble - tieT.toDouble / (n.toDouble * (n - 1).toDouble))
    val z = (u1 - n1.toDouble * n0.toDouble / 2.0) / math.sqrt(variance)
    assert(r0.getLong(5) === math.floor(z * 1e6 + 0.5).toLong, "z_micro diverged")
    val rb = twoU1.toDouble / (n1.toDouble * n0.toDouble) - 1.0
    assert(r0.getLong(6) === math.floor(rb * 1e6 + 0.5).toLong, "rb_micro diverged")
    // U symmetry: U1 + U0 = n1*n0 (doubled both sides)
    val twoU0 = twoR0 - n0 * (n0 + 1)
    assert(twoU1 + twoU0 === 2 * n1 * n0, "U1 + U0 != n1*n0")
    // rank-biserial is bounded in [-1, 1] on the micro grid
    assert(math.abs(r0.getLong(6)) <= 1000000L)
    // int64 headroom pin: tie_t sums t³−t per grid value, which wraps
    // silently in non-ANSI Spark (and raises in DuckDB) once any single
    // quantity's count exceeds 2²¹ ≈ 2.09M rows (~TPC-H sf25). Trip the
    // documented bound HERE on a scale-up instead of diverging silently.
    val maxTie = byVal.map { case (_, g) => g.length.toLong }.max
    assert(maxTie < (1L << 21),
      s"q216 tie-group count $maxTie exceeds the int64-safe 2^21 bound — " +
        "recompute tie_t on the driver grid before running at this SF")
  }

  test("q218 isotonic minimax fit equals a driver PAVA with exact rational pools") {
    val out = graft.ml.MlQueries.queries("q218_isotonic")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // driver PAVA: pool adjacent violators with EXACT rational compares
    // (p1/c1 > p2/c2 iff p1*c2 > p2*c1 — no floats anywhere)
    case class Pool(var pos: Long, var n: Long, var span: Int)
    val pools = scala.collection.mutable.ArrayBuffer[Pool]()
    out.foreach { case (_, n, pos, _, _) =>
      pools += Pool(pos, n, 1)
      while (pools.length >= 2 && {
        val a = pools(pools.length - 2); val b = pools.last
        a.pos * b.n > b.pos * a.n // prev avg strictly above current: violator
      }) {
        val b = pools.remove(pools.length - 1)
        val a = pools.last
        a.pos += b.pos; a.n += b.n; a.span += b.span
      }
    }
    val ref = pools.flatMap(p => Seq.fill(p.span)(1000000L * p.pos / p.n)).toSeq
    assert(out.map(_._5).toSeq === ref, "minimax fit != PAVA fit")
    // structural contracts: fit is monotone nondecreasing, stays in
    // [0, 1e6], and raw_micro is the floored per-bin positive rate
    assert(out.map(_._5).toSeq === out.map(_._5).toSeq.sorted, "isotonic fit not monotone")
    assert(out.forall(r => r._5 >= 0L && r._5 <= 1000000L))
    out.foreach { case (_, n, pos, raw, _) => assert(raw === 1000000L * pos / n) }
    // the raw rates must NOT already be monotone somewhere (otherwise
    // the test is vacuous) OR the fit equals raw — accept either, but
    // record that pooling actually happened when it should
    val rawSeq = out.map(_._4).toSeq
    if (rawSeq != rawSeq.sorted)
      assert(out.exists(r => r._4 != r._5), "raw rates non-monotone but fit untouched")
  }

  test("q215 Kaplan-Meier equals a driver product-limit fold; censoring semantics pinned") {
    import org.apache.spark.sql.functions._
    val users = Tables.events(spark, sfDir)
      .groupBy(col("user_id").cast("long").as("uid"))
      .agg(min(expr("cast(cast(ts as long) div 3600 as bigint)")).as("f"),
        max(expr("cast(cast(ts as long) div 3600 as bigint)")).as("l"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val frontier = users.map(_._2).max
    val cohort = users.map { case (f, l) => (l - f, l <= frontier - 72) } // (t, event)
    val grid = cohort.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, g) =>
      (t, g.count(_._2).toLong, g.count(!_._2).toLong)
    }
    var atRisk = cohort.size.toLong
    var sMicro = 1000000L
    val ref = grid.map { case (t, d, c) =>
      val row = (t, atRisk, d, c, { sMicro = sMicro * (atRisk - d) / atRisk; sMicro })
      atRisk -= d + c
      row
    }
    val out = graft.queries.ExtQueries.queries("q215_kaplan_meier")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === ref, "engine KM != driver product-limit fold")
    // structural contracts: survival is monotone non-increasing, the
    // first risk set is the whole cohort, risk sets strictly shrink,
    // and censored users reduce risk WITHOUT dropping S (the thing a
    // naive churn-rate query gets wrong)
    assert(out.map(_._5).toSeq === out.map(_._5).toSeq.sortBy(-_), "S not monotone")
    assert(out.head._2 === cohort.size.toLong)
    out.sliding(2).foreach { case Array((_, n1, d1, c1, s1), (_, n2, _, _, _)) =>
      assert(n2 === n1 - d1 - c1, "risk-set bookkeeping drifted")
    case _ => ()
    }
    val idx = out.indexWhere(r => r._3 == 0L && r._4 > 0L)
    if (idx > 0) assert(out(idx)._5 === out(idx - 1)._5,
      "censored-only step must not drop survival")
  }

  test("q214 HDR quantile buckets contain the exact nearest-rank values within 1/16 relative width") {
    import org.apache.spark.sql.functions._
    val cents = Tables.events(spark, sfDir)
      .select(floor(round(col("value"), 2) * 100.0 + 0.5).cast("long").as("v"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    def bucketOf(v: Long): (Long, Long, Long) = {
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(v)
      val e = math.max(0L, bl - 5L)
      val m = v >> e.toInt
      (e * 32 + m, m << e.toInt, (m + 1) << e.toInt)
    }
    val out = graft.queries.ExtQueries.queries("q214_hdr_quantiles")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.map(_._1).toSeq === Seq(50L, 90L, 95L, 99L))
    out.foreach { case (p, nTotal, k, bucket, lo, hi) =>
      assert(nTotal === n)
      assert(k === (p * n + 99) / 100, s"p$p ceil-division rank")
      val exact = cents((k - 1).toInt) // k-th smallest, 1-indexed
      val (eb, elo, ehi) = bucketOf(exact)
      assert(bucket === eb, s"p$p: engine bucket $bucket != exact value's bucket $eb")
      assert(lo === elo && hi === ehi, s"p$p bucket bounds")
      assert(exact >= lo && exact < hi, s"p$p: exact $exact outside [$lo, $hi)")
      // the HDR guarantee: ≤ 1/16 relative width (exact below 32)
      assert(hi - lo <= math.max(1L, lo / 16L), s"p$p: bucket too wide for the contract")
    }
    // bucket counts sum-merge across arbitrary shards (the distributed
    // partial-aggregate algebra, same as the q212 CMS counters)
    def hist(vs: Seq[Long]): Map[Long, Long] =
      vs.groupBy(v => bucketOf(v)._1).view.mapValues(_.size.toLong).toMap
    val (ha, hb) = cents.toSeq.zipWithIndex.partition(_._2 % 2 == 0)
    val merged = (hist(ha.map(_._1)).keySet ++ hist(hb.map(_._1)).keySet).map { b =>
      b -> (hist(ha.map(_._1)).getOrElse(b, 0L) + hist(hb.map(_._1)).getOrElse(b, 0L))
    }.toMap
    assert(merged === hist(cents.toSeq), "shard sum-merge of bucket counts drifted")
  }

  test("q213 bitmap retention equals a set-intersection reference and bitmaps OR-merge") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
      .select(date_trunc("day", col("ts")).cast("long").as("d"),
        col("user_id").cast("long").as("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay: Map[Long, Set[Long]] =
      ev.groupBy(_._1).map { case (d, g) => d -> g.map(_._2).toSet }
    val days = byDay.keys.toSeq.sorted
    val out = graft.queries.ExtQueries.queries("q213_bitmap_retention")(spark, sfDir)
      .select(col("d").cast("long"), col("n_active"), col("n_next"),
        col("n_retained"), col("ret_micro"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val expPairs = days.filter(d => byDay.contains(d + 86400L))
    assert(out.map(_._1).toSeq === expPairs, "day-pair set drifted")
    out.foreach { case (d, act, nxt, ret, micro) =>
      val s0 = byDay(d); val s1 = byDay(d + 86400L)
      assert(act === s0.size.toLong, s"day $d actives")
      assert(nxt === s1.size.toLong, s"day $d next-day actives")
      assert(ret === (s0 & s1).size.toLong, s"day $d retained != exact set intersection")
      assert(micro === math.floor(ret.toDouble / act.toDouble * 1e6 + 0.5).toLong)
    }
    // the bitmap algebra the distributed partial aggregate relies on:
    // OR of word-bitmaps built from arbitrary event subsets equals the
    // whole-day bitmap, and popcount(AND) equals the set intersection
    def bitmaps(us: Iterable[Long]): Map[Long, Long] =
      us.groupBy(_ / 63).map { case (w, g) =>
        w -> g.foldLeft(0L)((b, u) => b | (1L << (u % 63).toInt))
      }
    val d0 = days.head
    val (ea, eb) = byDay(d0).partition(_ % 2 == 0)
    val merged = (bitmaps(ea).keySet ++ bitmaps(eb).keySet).map { w =>
      w -> (bitmaps(ea).getOrElse(w, 0L) | bitmaps(eb).getOrElse(w, 0L))
    }.toMap
    assert(merged === bitmaps(byDay(d0)), "OR-merge of subset bitmaps drifted")
    if (days.size > 1) {
      val b0 = bitmaps(byDay(d0)); val b1 = bitmaps(byDay(days(1)))
      val inter = b0.keySet.intersect(b1.keySet).toSeq
        .map(w => java.lang.Long.bitCount(b0(w) & b1(w)).toLong).sum
      assert(inter === (byDay(d0) & byDay(days(1))).size.toLong, "popcount(AND) != |intersection|")
    }
  }

  test("q212 count-min equals a driver reference, never undercounts, respects e/w·N, and sum-merges") {
    import org.apache.spark.sql.functions._
    def hash(s: String): Long = {
      val h0 = s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31L + (b & 0xff)) % 1000000007L)
      val h1 = (h0 ^ (h0 >> 16)) * 73244475L % 2147483648L
      val h2 = (h1 ^ (h1 >> 13)) * 73244475L % 2147483648L
      h2 ^ (h2 >> 16)
    }
    def bucket(j: Long, uid: Long): Int = (hash(s"$j:$uid") % 512L).toInt
    def build(counts: Map[Long, Long]): Array[Array[Long]] = {
      val sk = Array.fill(4, 512)(0L)
      for ((uid, n) <- counts; j <- 0 until 4) sk(j)(bucket(j, uid)) += n
      sk
    }
    val exact = Tables.events(spark, sfDir)
      .groupBy(col("user_id").cast("long").as("uid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sk = build(exact)
    def est(uid: Long): Long = (0 until 4).map(j => sk(j)(bucket(j, uid))).min
    val out = graft.queries.ExtQueries.queries("q212_countmin")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expKeys = (exact.keySet.filter(_ % 7 == 0) ++ Set(-1L, -2L, 1000000007L)).toSeq.sorted
    assert(out.map(_._1).toSeq === expKeys, "query-key set drifted")
    val n = exact.values.sum
    out.foreach { case (uid, ex, e, over) =>
      assert(ex === exact.getOrElse(uid, 0L), s"uid $uid exact_n")
      assert(e === est(uid), s"uid $uid engine estimate != driver CMS")
      assert(over === e - ex)
      assert(e >= ex, s"uid $uid CMS undercounted — impossible by construction")
      assert(e - ex <= math.ceil(math.E / 512.0 * n).toLong,
        s"uid $uid overshoot ${e - ex} beyond e/w·N")
    }
    // mergeability: CMS of arbitrary halves of the key space sums to the
    // whole sketch — the partial-aggregate / micro-batch merge algebra
    val (l, r) = exact.partition(_._1 % 2 == 0)
    val merged = build(l).zip(build(r)).map { case (a, b) => a.zip(b).map(t => t._1 + t._2) }
    assert(merged.map(_.toSeq).toSeq === sk.map(_.toSeq).toSeq, "shard sum-merge drifted")
  }

  test("q210 entity resolution equals an all-pairs FS reference; blocking loses exactly the miskeyed nations") {
    import org.apache.spark.sql.functions._
    case class Rec(id: Long, name: String, nation: Long, cents: Long, seg: String)
    val base = Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long"), col("c_name"),
        col("c_nationkey").cast("long"),
        floor(round(col("c_acctbal"), 2) * 100.0 + 0.5).cast("long"),
        col("c_mktsegment"))
      .collect().map(r => Rec(r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val bFile = base.filter(_.id % 7 != 0).map { r =>
      val p = r.id % 10
      Rec(r.id,
        if (p < 2) r.name + "X" else r.name,
        if (p == 5) (r.nation + 1) % 25 else r.nation,
        if (p == 2 || p == 3) r.cents + 7 else r.cents,
        if (p == 4) "UNKNOWN" else r.seg)
    }
    def band(c: Long, off: Long) = math.floor((c + 100000 + off).toDouble / 1000.0).toLong
    def score(a: Rec, b: Rec): Long =
      (if (a.name == b.name) 9892L else -4320L) +
        (if (math.abs(a.cents - b.cents) <= 10) 6492L else -3307L) +
        (if (a.seg == b.seg) 2293L else -5322L)
    def decide(s: Long) = if (s >= 10000) "match" else if (s >= 0) "possible" else "nonmatch"
    // the reference: brute-force all-pairs, then apply the blocking predicate
    val blocked = for {
      a <- base; b <- bFile
      if a.nation == b.nation &&
        (band(a.cents, 0) == band(b.cents, 0) || band(a.cents, 500) == band(b.cents, 500))
    } yield (a, b)
    val exp = blocked.map { case (a, b) => (decide(score(a, b)), a.id == b.id, score(a, b)) }
      .groupBy(_._1).map { case (d, g) =>
        (d, g.size.toLong, g.count(_._2).toLong, g.map(_._3).min, g.map(_._3).max)
      }.toSet
    val out = graft.queries.ExtQueries.queries("q210_entity_resolution")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out === exp, "engine disagrees with the all-pairs FS reference under the same blocking")
    // blocking recall: the ONLY true pairs absent from the candidate set
    // are the nation-miskeyed entities — the balance drift never escapes
    // the two half-offset band passes (that's what pass 2 is for)
    val candTrue = blocked.collect { case (a, b) if a.id == b.id => a.id }.toSet
    bFile.foreach { b =>
      if (!candTrue.contains(b.id))
        assert(b.id % 10 == 5, s"entity ${b.id} lost by blocking without a miskeyed nation")
      if (b.id % 10 == 5) assert(!candTrue.contains(b.id), s"miskeyed nation ${b.id} should block apart")
    }
    // decision semantics on the true pairs that survive blocking: name
    // typos -> clerical review, everything else (incl. the 7c drift and
    // the lost segment) -> match
    blocked.filter { case (a, b) => a.id == b.id }.foreach { case (a, b) =>
      val d = decide(score(a, b))
      if (a.id % 10 < 2) assert(d === "possible", s"${a.id}: name typo should demote to review")
      else assert(d === "match", s"${a.id}: expected match, got $d")
    }
  }

  test("q174 inverted index: postings heads are ordered prefixes and masses close") {
    val rows = graft.llm.LlmQueries.queries("q174_inverted_index")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val totalTokens = Tables.documents(spark, sfDir)
      .select(explode(graft.llm.TextOps.tokens(col("text"))).as("t")).count()
    assert(rows.map(_._3).sum === totalTokens, "collection frequency mass leaked")
    rows.foreach { case (tok, df, cf, _, topTf, head) =>
      assert(df >= 1 && cf >= df, s"$tok: df/cf inconsistent")
      assert(topTf >= 1 && topTf <= cf, s"$tok: top posting out of range")
      val ids = head.split(',').map(_.toLong)
      assert(ids.length === math.min(df, 5L).toInt, s"$tok: postings head length")
      assert(ids.sameElements(ids.sorted), s"$tok: postings head not id-ordered")
    }
  }
}

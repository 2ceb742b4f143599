package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Driver-side sequential references for the round-11 canons: q220
  * synchronous label propagation (vs a plain-Scala LPA over the same
  * derived graph), q221 Poisson bootstrap (vs a single-threaded fold of
  * the same hash → inverse-CDF weights, plus the CI-extraction
  * contract), q222 Theil–Sen (vs an exact all-pairs median). The
  * oracle hash-matches the cross-engine arithmetic; these pin the
  * SEMANTICS against independent sequential implementations. */
class NewCanonsSpec extends SparkSpec {

  test("q220 LPA trace equals a sequential driver LPA over the same graph") {
    val docs = LlmQueries.linkGraphDocs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    val n = docs.length.toLong
    // same hash-derived edge set, driver-side
    def tokHash(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val und = (for {
      (_, idx) <- docs
      j <- 1 to 3
      dst = tokHash(s"$idx#$j") % n
      if dst != idx
    } yield (math.min(idx, dst), math.max(idx, dst))).distinct
    val nbrs = (und ++ und.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = docs.map { case (_, idx) => idx -> idx }.toMap
    val trace = (1 to 4).map { r =>
      val next = lbl.map { case (v, old) =>
        val counts = nbrs.getOrElse(v, Array.empty[Long]).groupBy(lbl)
          .view.mapValues(_.length).toSeq
        if (counts.isEmpty) v -> old
        else {
          val mx = counts.map(_._2).max
          v -> counts.filter(_._2 == mx).map(_._1).min
        }
      }
      val changed = next.count { case (v, l) => lbl(v) != l }.toLong
      lbl = next
      (r.toLong, changed, lbl.values.toSet.size.toLong, lbl.values.sum)
    }
    val got = LlmQueries.queries("q220_label_prop")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === trace, "distributed LPA trace diverged from the sequential fold")
    // communities must actually form (not the trivial all-self fixpoint)
    assert(trace.last._3 < n, "LPA did nothing — vacuous gate")
    spark.catalog.clearCache()
  }

  test("q221 replicate rows equal a sequential weight fold; percentile CI brackets the point estimate") {
    val rows = Tables.lineitem(spark, sfDir).select(
        col("l_orderkey").cast("long"), col("l_linenumber").cast("long"),
        floor(round(col("l_extendedprice"), 2) * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cum = Seq(367879L, 735758L, 919698L, 981011L, 996340L,
      999405L, 999916L, 999989L, 999998L)
    def weight(ok: Long, ln: Long, b: Long): Long = {
      val h0 = ((ok % 1000003L) * 65599L + (ln % 1000003L) * 4001L + b * 104729L) % 2147483648L
      val h1 = (h0 ^ (h0 >> 16)) * 73244475L % 2147483648L
      val h2 = (h1 ^ (h1 >> 13)) * 73244475L % 2147483648L
      val u = (h2 ^ (h2 >> 16)) % 1000000L
      cum.indexWhere(u < _) match { case -1 => 9L; case i => i.toLong }
    }
    val got = graft.queries.ExtQueries.queries("q221_poisson_bootstrap")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 64)
    // spot-check replicates 0, 17, 63 against the sequential fold
    Seq(0L, 17L, 63L).foreach { b =>
      var nEff = 0L; var sum = 0L
      rows.foreach { case (ok, ln, c) =>
        val w = weight(ok, ln, b); nEff += w; sum += w * c
      }
      val r = got.find(_._1 == b).get
      assert((r._2, r._3) === ((nEff, sum)), s"replicate $b weighted sums diverged")
      assert(r._4 === math.floor(sum.toDouble / nEff.toDouble * 1e6 + 0.5).toLong)
    }
    // Poisson(1) sanity: effective sizes concentrate around N
    val nTrue = rows.length.toDouble
    got.foreach { case (b, nEff, _, _) =>
      assert(math.abs(nEff - nTrue) < 5 * math.sqrt(nTrue) + 10,
        s"replicate $b effective size $nEff implausible for N=$nTrue")
    }
    // CI extraction (the consumer contract): nearest-rank P2.5/P97.5 of
    // the 64 exact replicate means bracket the full-sample mean
    val means = got.map(_._4).sorted
    def pct(p: Double) = means(math.min(63, math.max(0, math.ceil(p * 64).toInt - 1)))
    val pointMicro = {
      val s = rows.map(_._3).sum
      math.floor(s.toDouble / rows.length * 1e6 + 0.5).toLong
    }
    assert(pct(0.025) <= pointMicro && pointMicro <= pct(0.975),
      s"95% bootstrap CI [${pct(0.025)}, ${pct(0.975)}] misses the point estimate $pointMicro")
  }

  test("q223 trimmed/winsorized means equal a full-sort driver computation, ties included") {
    val vs = Tables.lineitem(spark, sfDir)
      .select(floor(round(col("l_extendedprice"), 2) * 100.0 + 0.5).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = vs.length
    val g = n / 20
    val trimmed = vs.slice(g, n - g)
    val trimmedSum = trimmed.sum
    val winsorSum = trimmedSum + g * vs(g) + g * vs(n - g - 1)
    val r = graft.queries.ExtQueries.queries("q223_trimmed_stats")(spark, sfDir).head()
    assert(r.getLong(0) === n.toLong && r.getLong(1) === g.toLong)
    assert(r.getLong(2) === vs(g - 1), "lo_cut != g-th smallest")
    assert(r.getLong(3) === vs(n - g), "hi_cut != (n-g+1)-th smallest")
    assert(r.getLong(4) === trimmedSum, "tie-decomposed tail sums diverged from the sorted slice")
    assert(r.getLong(5) === math.floor(trimmedSum.toDouble / (n - 2 * g) * 1e6 + 0.5).toLong)
    assert(r.getLong(6) === math.floor(winsorSum.toDouble / n * 1e6 + 0.5).toLong)
    // robustness sanity: the trimmed mean lies inside the kept range
    assert(r.getLong(5) >= vs(g) * 1000000L && r.getLong(5) <= vs(n - g - 1) * 1000000L,
      "trimmed mean escaped the kept value range")
  }

  test("q224 Holt path equals a sequential milli-grid fold; negative trends floor correctly") {
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("cast(cast(ts as long) div 86400 as bigint)").as("d"))
      .agg(floor(round(sum(col("value")), 2) * 100.0 + 0.5).cast("long").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    def flr(a: Double): Long = math.floor(a / 1000.0).toLong
    var l = 1000L * daily(0)._2
    var b = 1000L * (daily(1)._2 - daily(0)._2)
    val ref = scala.collection.mutable.ArrayBuffer((daily(0)._1, daily(0)._2, l, b))
    daily.drop(1).foreach { case (d, x) =>
      val l2 = flr(300000.0 * x + 700.0 * (l + b))
      val b2 = flr(100.0 * (l2 - l) + 900.0 * b)
      l = l2; b = b2
      ref += ((d, x, l, b))
    }
    val got = graft.queries.ExtQueries.queries("q224_holt_linear")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length === ref.length)
    got.zip(ref).foreach { case ((d, x, lv, tr, fc), (rd, rx, rl, rb)) =>
      assert((d, x, lv, tr) === ((rd, rx, rl, rb)), s"day $d diverged")
      assert(fc === lv + tr, "forecast != level + trend")
    }
    // the fold must actually exercise the negative-trend floor branch
    assert(ref.exists(_._4 < 0), "no negative trend day — the sign-semantics gate is vacuous")
  }

  test("q225 k-anonymity rollup equals a driver group-size census") {
    val sizes = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        floor(round(col("c_acctbal"), 2) / 1000.0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(identity).map(_._2.length.toLong).toSeq
    val r = graft.queries.ExtQueries.queries("q225_k_anonymity")(spark, sfDir).head()
    assert(r.getLong(0) === sizes.length.toLong)
    assert(r.getLong(1) === sizes.sum)
    assert(r.getLong(2) === sizes.min)
    assert(r.getLong(3) === sizes.count(_ < 5).toLong)
    assert(r.getLong(4) === sizes.filter(_ < 5).sum)
    assert(r.getLong(5) ===
      math.floor(sizes.filter(_ < 5).sum.toDouble / sizes.sum * 1e6 + 0.5).toLong)
  }

  test("q226 burn-rate decisions equal a driver fold and both branches actually exercise") {
    val hours = Tables.events(spark, sfDir)
      .groupBy(expr("cast(cast(ts as long) div 3600 as bigint)").as("h"))
      .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("e"),
        count(lit(1)).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val byH = hours.map(x => x._1 -> (x._2, x._3)).toMap
    val got = graft.queries.ExtQueries.queries("q226_burn_rate")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
        r.getInt(7), r.getInt(8)))
    assert(got.length === hours.length)
    got.foreach { case (h, e6, t6, page, ticket) =>
      // calendar-range 6h window: hours h-5..h that EXIST in the grid
      val win = (h - 5 to h).flatMap(byH.get)
      assert((e6, t6) === ((win.map(_._1).sum, win.map(_._2).sum)), s"hour $h rolling sums")
      val (e1, t1) = byH(h)
      def hot(e: Long, t: Long, thr: Long) = e * 1000000L * 1000000L > thr * 20000L * t
      assert(page === (if (hot(e1, t1, 14400000L) && hot(e6, t6, 14400000L)) 1 else 0))
      assert(ticket === (if (hot(e1, t1, 6000000L) && hot(e6, t6, 6000000L)) 1 else 0))
    }
    // the policy must fire AND rest — a constant column gates nothing
    assert(got.exists(_._5 === 1) && got.exists(_._5 === 0), "ticket branch vacuous")
    assert(got.exists(_._4 === 0), "page fires everywhere — thresholds vacuous")
  }

  test("q227 Good-Turing head equals a driver freq-of-freq computation") {
    val freqs = Tables.documents(spark, sfDir)
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy("t").count()
      .collect().map(_.getLong(1))
    val nr = freqs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val head = nr.keys.toSeq.sorted.take(10)
    val nTotal = freqs.sum
    val got = LlmQueries.queries("q227_good_turing")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.map(_._1).toSeq === head, "head of the observed grid diverged")
    got.foreach { case (r, nR, nNext, rStar, nTot, v, p0) =>
      assert(nR === nr(r))
      assert(nNext === nr.getOrElse(r + 1, 0L))
      assert(rStar === math.floor((r + 1).toDouble * nNext / nR * 1e6 + 0.5).toLong)
      assert(nTot === nTotal && v === freqs.length.toLong)
      assert(p0 === math.floor(nr.getOrElse(1L, 0L).toDouble / nTotal * 1e6 + 0.5).toLong)
    }
  }

  test("q228 Zipf fit equals a driver log-log OLS over rank blocks; slope is negative") {
    val freqs = Tables.documents(spark, sfDir)
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy("t").count()
      .collect().map(_.getLong(1)).sortBy(-_)
    def s6(v: Double) = math.floor(v * 1e6 + 0.5).toLong
    val terms = freqs.zipWithIndex.map { case (f, i) =>
      (s6(math.log((i + 1).toDouble)), s6(math.log(f.toDouble)))
    }
    val n = terms.length.toDouble
    val sx = terms.map(_._1).sum; val sy = terms.map(_._2).sum
    val sxx = terms.map(t => t._1 * t._1).sum
    val sxy = terms.map(t => t._1 * t._2).sum
    val syy = terms.map(t => t._2 * t._2).sum
    val cov = n * sxy - sx.toDouble * sy
    val varX = n * sxx - sx.toDouble * sx
    val varY = n * syy - sy.toDouble * sy
    val r = LlmQueries.queries("q228_zipf_fit")(spark, sfDir).head()
    assert(r.getLong(0) === terms.length.toLong)
    assert(r.getLong(1) === s6(cov / varX), "slope diverged")
    assert(r.getLong(2) ===
      math.floor((sy.toDouble - cov / varX * sx.toDouble) / n + 0.5).toLong, "intercept diverged")
    assert(r.getLong(3) === s6(cov * cov / (varX * varY)), "r2 diverged")
    assert(r.getLong(1) < 0L, "rank-frequency slope must be negative")
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
  }

  test("q233 per-source KL equals a driver add-1-smoothed computation over the full grid") {
    // the q133 discipline: recompute every per-term double chain
    // driver-side IN THE SAME ORDER as the Column expression —
    // (cnt_s+1)/(n_s+V) · ln(((cnt_s+1)·(n+V)) / ((n_s+V)·(cnt+1))) —
    // nano-floored per term, exact long sum per source
    val toks = Tables.documents(spark, sfDir)
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val st = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ct = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val marg = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = toks.length.toLong
    val v = ct.size.toLong
    val want = marg.keys.toSeq.sorted.map { src =>
      val nS = marg(src)
      val klNano = ct.keys.toSeq.map { t =>
        val cS = st.getOrElse((src, t), 0L)
        val c = ct(t)
        val ps = (cS + 1).toDouble / (nS + v).toDouble
        val ratio = ((cS + 1).toDouble * (n + v).toDouble) /
          ((nS + v).toDouble * (c + 1).toDouble)
        math.floor(ps * math.log(ratio) * 1e9 + 0.5).toLong
      }.sum
      (src, nS, klNano, v)
    }
    val got = LlmQueries.queries("q233_source_kl")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want, "distributed KL grid diverged from the driver recomputation")
    // the signal must discriminate: at least one source away from zero
    // (every source = the mixture would make the gate vacuous), and KL's
    // nonnegativity (Gibbs) must survive the nano-floor up to one ulp
    // per term of floor slack
    assert(want.exists(_._3 > 0L), "all sources at zero KL — vacuous gate")
    want.foreach { case (src, _, kl, vocab) =>
      assert(kl >= -vocab, s"source $src: KL below the floor-slack bound — Gibbs violated")
    }
  }

  test("q234 span removal equals a driver interval-union over min-doc canonical windows") {
    val W = 8 // DecontamWindow
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    def toks(t: String): Array[String] = t.split("\\s+").filter(_.nonEmpty)
    def tokHash(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val wins = docs.flatMap { case (id, t) =>
      val tk = toks(t)
      (0 to tk.length - W).map(i => (id, i + 1L, tokHash(tk.slice(i, i + W).mkString(" "))))
    }
    val minDoc = wins.groupBy(_._3).view.mapValues(_.map(_._1).min).toMap
    val byDoc = wins.filter { case (id, _, h) => minDoc(h) < id }.groupBy(_._1)
    val want = docs.map { case (id, t) =>
      val n = toks(t).length.toLong
      val ps = byDoc.getOrElse(id, Array.empty).map(_._2).sorted
      val removed =
        if (ps.isEmpty) 0L
        else ps.zip(ps.drop(1)).map { case (a, b) => math.min(W.toLong, b - a) }.sum + W
      (id, n, ps.length.toLong, removed, n - removed)
    }.toSeq
    val got = LlmQueries.queries("q234_span_removal")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want, "distributed span removal diverged from the driver interval-union")
    // non-vacuity: the corpus must exercise PARTIAL removal (the
    // interval-union arithmetic), not only whole-doc duplicates
    assert(want.exists(w => w._4 > 0 && w._4 < w._2),
      "no partially-removed doc — the union closed form is untested")
    assert(want.exists(_._4 == 0L), "every doc had removals — min-doc canonicality untested")
    spark.catalog.clearCache()
  }

  test("q248 within-doc span self-dedup equals a driver interval-union; " +
      "injected self-repeats exercise the overlapping-union closed form") {
    val W = 8 // DecontamWindow
    def toks(t: String): Array[String] = t.split("\\s+").filter(_.nonEmpty)
    def tokHash(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    def selfStats(id: Long, t: String): (Long, Long, Long, Long, Long) = {
      val tk = toks(t)
      val wins = (0 to tk.length - W)
        .map(i => (i + 1L, tokHash(tk.slice(i, i + W).mkString(" "))))
      val first = wins.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
      val ps = wins.collect { case (i, h) if i > first(h) => i }.sorted
      val n = tk.length.toLong
      val removed =
        if (ps.isEmpty) 0L
        else ps.zip(ps.drop(1)).map { case (a, b) => math.min(W.toLong, b - a) }.sum + W
      (id, n, ps.length.toLong, removed, n - removed)
    }
    // part 1: real-corpus parity — the synthetic corpus has no
    // within-doc 8-token repeats, so this pins NO FALSE POSITIVES
    // (every doc must come back untouched, matching the driver truth)
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val want = docs.map { case (id, t) => selfStats(id, t) }.toSeq
    val got = LlmQueries.queries("q248_span_self_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want, "distributed self-dedup diverged from the driver recomputation")
    spark.catalog.clearCache()
    // part 2: INJECTED self-repeats — the corpus can't exercise the
    // union arithmetic, so a fixture must: a far repeat (disjoint
    // spans), a triple stutter (9 OVERLAPPING spans whose union is 16
    // tokens, not 9×8), a clean doc, and a doc shorter than W
    import spark.implicits._
    val t8 = (1 to 8).map(i => s"t$i").mkString(" ")
    val fixture = Seq(
      (1L, s"$t8 f1 f2 f3 f4 $t8"),                  // far repeat: one span
      (2L, s"$t8 $t8 $t8"),                          // stutter: overlap union
      (3L, (1 to 12).map(i => s"u$i").mkString(" ")), // clean
      (4L, "s1 s2 s3 s4 s5"))                        // shorter than W
    val dir = java.nio.file.Files.createTempDirectory("graft-selfspan").toString
    fixture.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val gotFx = LlmQueries.queries("q248_span_self_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq.sortBy(_._1)
    val wantFx = Seq(
      (1L, 20L, 1L, 8L, 12L),  // one dup window, whole W removed
      (2L, 24L, 9L, 16L, 8L),  // 9 overlapping spans union to 16 tokens
      (3L, 12L, 0L, 0L, 12L),
      (4L, 5L, 0L, 0L, 5L))
    assert(gotFx === wantFx, "injected self-repeat fixture diverged")
    // ...and the driver closed form agrees on the fixture too (the
    // union arithmetic is pinned from BOTH sides)
    assert(fixture.map { case (id, t) => selfStats(id, t) } === wantFx)
    spark.catalog.clearCache()
  }

  test("q236 Heaps fit equals a driver vocabulary-growth computation; beta in (0,1]") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty)
    val n = docs.length.toLong
    val grid = (1 to 16).map(k => (k.toLong, n * k / 16))
    // sequential prefix walk: cumulative tokens + first-seen TRIGRAM
    // vocabulary (the unigram space saturates on this corpus — q236's
    // documented reason for the n-gram form)
    var cum = 0L
    val seen = scala.collection.mutable.Set.empty[String]
    val prefix = docs.zipWithIndex.map { case ((_, t), i) =>
      val tk = toks(t); cum += tk.length
      tk.sliding(3).filter(_.length == 3).foreach(g => seen += g.mkString(" "))
      (i + 1L) -> ((cum, seen.size.toLong))
    }.toMap
    val pts = grid.map { case (k, pk) =>
      val (c, v) = prefix(pk); (k, pk, c, v)
    }
    def s6(v: Double) = math.floor(v * 1e6 + 0.5).toLong
    val terms = pts.map { case (_, _, c, v) => (s6(math.log(c.toDouble)), s6(math.log(v.toDouble))) }
    val np = terms.length.toDouble
    val sx = terms.map(_._1).sum; val sy = terms.map(_._2).sum
    val sxx = terms.map(t => t._1 * t._1).sum
    val sxy = terms.map(t => t._1 * t._2).sum
    val cov = np * sxy - sx.toDouble * sy
    val varX = np * sxx - sx.toDouble * sx
    val beta = s6(cov / varX)
    val got = LlmQueries.queries("q236_heaps_fit")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq === pts.map(t => (t._1, t._2, t._3, t._4)),
      "grid points diverged from the sequential prefix walk")
    assert(got.head._5 === beta, "beta diverged from the driver OLS")
    assert(beta > 0L && beta <= 1000000L, s"Heaps beta out of (0,1]: $beta")
    spark.catalog.clearCache()
  }

  test("q237 weighted sample equals a driver Efraimidis-Spirakis top-k; weights bias selection") {
    val spend = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(floor(round(sum(col("o_totalprice")), 2) * 100.0 + 0.5).cast("long").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).filter(_._2 > 0)
    def tokHash(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val keyed = spend.map { case (id, w) =>
      val u = (tokHash(s"es#$id") + 1).toDouble / 1000000008.0
      (id, w, math.floor(math.log(u) / w.toDouble * 1e12).toLong)
    }
    val want = keyed.sortBy { case (id, _, k) => (-k, id) }.take(20).sortBy(_._1).toSeq
    val res = graft.queries.ExtQueries.queries("q237_weighted_sample")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(res === want, "distributed ES top-k diverged from the driver reference")
    // the sample must actually be weight-biased: mean sampled weight
    // exceeds the population mean (facility of the u^(1/w) key)
    val popMean = spend.map(_._2).sum.toDouble / spend.length
    val sampMean = res.map(_._2).sum.toDouble / res.size
    assert(sampMean > popMean, "weighted sample shows no weight bias — vacuous")
  }

  test("q238 entropies equal a driver computation; conditional entropy <= unigram entropy") {
    val texts = Tables.documents(spark, sfDir).select(col("text"))
      .collect().map(_.getString(0))
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty)
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val big = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val tk = toks(t)
      tk.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      tk.sliding(2).filter(_.length == 2).foreach { p =>
        big((p(0), p(1))) = big.getOrElse((p(0), p(1)), 0L) + 1
      }
    }
    val n = uni.values.sum
    val h1 = uni.values.map(c =>
      math.floor(c.toDouble * math.log(n.toDouble / c) * 1e6 + 0.5).toLong).sum / n
    val c1 = big.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val nb = big.values.sum
    val h2 = big.map { case ((w1, _), c12) =>
      math.floor(c12.toDouble * math.log(c1(w1).toDouble / c12) * 1e6 + 0.5).toLong
    }.sum / nb
    val r = LlmQueries.queries("q238_entropy_rate")(spark, sfDir).head()
    assert(r.getLong(0) === n && r.getLong(1) === uni.size.toLong)
    assert(r.getLong(2) === nb && r.getLong(3) === big.size.toLong)
    assert(r.getLong(4) === h1, "unigram entropy diverged")
    assert(r.getLong(5) === h2, "conditional bigram entropy diverged")
    // conditioning cannot add entropy (up to the micro floor slack)
    assert(r.getLong(5) <= r.getLong(4) + 1L, "H(W2|W1) > H(W) — impossible")
    assert(r.getLong(4) > 0L, "zero unigram entropy — vacuous corpus")
  }

  test("q239 HITS trace equals a sequential driver power iteration over the same graph") {
    val docs = LlmQueries.linkGraphDocs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    val n = docs.length.toLong
    def tokHash(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val edges = (for {
      (_, idx) <- docs
      j <- 1 to 3
      dst = tokHash(s"$idx#$j") % n
      if dst != idx
    } yield (idx, dst)).distinct
    val scale = 1000000000L
    var h = Array.fill(n.toInt)(scale / n)
    val trace = (1 to 4).map { r =>
      val aRaw = Array.fill(n.toInt)(0L)
      edges.foreach { case (s0, d0) => aRaw(d0.toInt) += h(s0.toInt) }
      val ta = aRaw.sum
      val a = aRaw.map(x => x * scale / ta)
      val hRaw = Array.fill(n.toInt)(0L)
      edges.foreach { case (s0, d0) => hRaw(s0.toInt) += a(d0.toInt) }
      val th = hRaw.sum
      h = hRaw.map(x => x * scale / th)
      def mx(v: Array[Long]): (Long, Long) = {
        val m = v.max; (m, v.indexOf(m).toLong)
      }
      val (ma, ai) = mx(a); val (mh, hi) = mx(h)
      (r.toLong, a.sum, ma, ai, h.sum, mh, hi)
    }
    val got = LlmQueries.queries("q239_hits")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === trace, "distributed HITS diverged from the sequential power iteration")
    // hubs and authorities must actually separate (argmaxes move mass)
    assert(trace.last._3 > scale / n, "authority mass never concentrated — vacuous gate")
    spark.catalog.clearCache()
  }

  test("q244 Katz equals a sequential driver recurrence; attenuation actually differentiates") {
    val docs = LlmQueries.linkGraphDocs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    val n = docs.length.toLong
    def tokHash(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val edges = (for {
      (_, idx) <- docs
      j <- 1 to 3
      dst = tokHash(s"$idx#$j") % n
      if dst != idx
    } yield (idx, dst)).distinct
    var x = Array.fill(n.toInt)(1000000L)
    (1 to 4).foreach { _ =>
      val c = Array.fill(n.toInt)(0L)
      edges.foreach { case (s0, d0) => c(d0.toInt) += x(s0.toInt) }
      x = c.map(v => 1000000L + v / 10L)
    }
    val want = docs.map { case (docId, idx) => (docId, x(idx.toInt)) }.toSeq
    val got = LlmQueries.queries("q244_katz")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want, "distributed Katz diverged from the sequential recurrence")
    assert(x.distinct.length > 1, "Katz scores all equal — attenuation did nothing, vacuous")
    spark.catalog.clearCache()
  }

  test("q245 personalized PageRank equals a sequential seeded-restart iteration; locality holds") {
    val docs = LlmQueries.linkGraphDocs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    val n = docs.length.toLong
    def tokHash(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val edges = (for {
      (_, idx) <- docs
      j <- 1 to 3
      dst = tokHash(s"$idx#$j") % n
      if dst != idx
    } yield (idx, dst)).distinct
    val outDeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val scale = 1000000000000L
    val seeds = docs.map(_._2).filter(_ % 97 == 0)
    val perSeed = scale / seeds.length
    val base = 15L * perSeed / 100L
    var pr = docs.map { case (_, idx) => idx -> (if (idx % 97 == 0) perSeed else 0L) }.toMap
    (1 to 5).foreach { _ =>
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (s0, d0) => contrib(d0) += pr(s0) / outDeg(s0) }
      pr = docs.map { case (_, idx) =>
        idx -> ((if (idx % 97 == 0) base else 0L) + 85L * contrib(idx) / 100L)
      }.toMap
    }
    val want = docs.map { case (docId, idx) => (docId, pr(idx)) }.toSeq
    val got = LlmQueries.queries("q245_personalized_pr")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want, "distributed PPR diverged from the sequential seeded iteration")
    // locality: rank must NOT be uniform (the restart set differentiates),
    // and some non-seed node must hold rank only via actual in-paths
    assert(pr.values.toSet.size > 1, "PPR is uniform — seeding did nothing, vacuous")
    assert(docs.exists { case (_, i) => i % 97 != 0 && pr(i) > 0 },
      "no non-seed node reached — the walk never left the seed set")
    spark.catalog.clearCache()
  }

  test("q247 NDCG: ideal equals the sort-based definition; gains and labels recompute exactly") {
    // driver-side relevance for EVERY doc (the sort-based ideal is the
    // DEFINITION; the query builds it from the histogram — this is the
    // proof the two constructions agree)
    val qTerms = Seq("join", "vector", "stream")
    val rels = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .collect().map { r =>
        val tk = r.getString(1).split("\\s+").filter(_.nonEmpty).toSet
        r.getLong(0) -> qTerms.count(tk.contains).toLong
      }.toMap
    def gain(relV: Long, pos: Long): Long =
      math.floor(relV.toDouble / (math.log((pos + 1).toDouble) / math.log(2.0))
        * 1e6 + 0.5).toLong
    val idealIdcg = rels.values.toSeq.sortBy(-_).take(20).zipWithIndex
      .map { case (r, i) => gain(r, i + 1L) }.sum
    val rows = LlmQueries.queries("q247_ndcg_retrieval")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1)
    rows.foreach { case (p, d, rel, g, _, _, _) =>
      assert(rel === rels(d), s"pos $p doc $d: relevance label diverged")
      assert(g === gain(rel, p), s"pos $p: gain arithmetic diverged")
    }
    val dcg = rows.map(_._4).sum
    assert(rows.head._5 === dcg, "emitted DCG != sum of emitted gains")
    assert(rows.head._6 === idealIdcg,
      "histogram-built ideal diverged from the sort-based definition")
    assert(rows.head._7 ===
      math.floor(dcg.toDouble / idealIdcg.toDouble * 1e6 + 0.5).toLong)
    // the metric must discriminate: a real run is neither perfect nor flat
    assert(rows.head._7 > 0L && rows.head._7 < 1000000L,
      s"NDCG ${rows.head._7} — degenerate run, vacuous metric")
    assert(rows.map(_._3).distinct.length > 1, "all retrieved docs share one relevance — vacuous")
    spark.catalog.clearCache()
  }

  test("q243 Spearman equals a driver midrank Pearson; monotone signal present") {
    val base = Tables.documents(spark, sfDir).select(col("text"))
      .collect().map { r =>
        val tk = r.getString(0).split("\\s+").filter(_.nonEmpty)
        (tk.length.toLong, tk.distinct.length.toLong)
      }
    def midranks(vs: Seq[Long]): Map[Long, Long] = {
      val grid = vs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val sorted = grid.keys.toSeq.sorted
      var below = 0L
      sorted.map { v =>
        val r = v -> (2 * below + grid(v) + 1); below += grid(v); r
      }.toMap
    }
    val rx = midranks(base.map(_._1).toSeq)
    val ry = midranks(base.map(_._2).toSeq)
    val pts = base.map { case (x, y) => (rx(x), ry(y)) }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val cov = n * sxy - sx.toDouble * sy
    val rho = cov / math.sqrt((n * sxx - sx.toDouble * sx) * (n * syy - sy.toDouble * sy))
    val r = LlmQueries.queries("q243_spearman")(spark, sfDir).head()
    assert(r.getLong(0) === pts.length.toLong)
    assert(r.getLong(1) === sx && r.getLong(2) === sy)
    assert(r.getLong(3) === math.floor(rho * 1e6 + 0.5).toLong, "rho diverged")
    assert(math.abs(r.getLong(3)) > 100000L && math.abs(r.getLong(3)) < 1000000L,
      s"rho ${r.getLong(3)} degenerate — no monotone signal to measure")
    spark.catalog.clearCache()
  }

  test("q246 Cohen's kappa equals a driver agreement computation; gates genuinely disagree somewhere") {
    val r = LlmQueries.queries("q246_cohen_kappa")(spark, sfDir).head()
    val (n, n11, n10, n01, n00) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n === n11 + n10 + n01 + n00, "confusion cells don't partition the corpus")
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble * (n11 + n01) + (n01 + n00).toDouble * (n10 + n00)) /
      (n.toDouble * n)
    assert(r.getLong(5) === math.floor(po * 1e6 + 0.5).toLong)
    assert(r.getLong(6) === math.floor(pe * 1e6 + 0.5).toLong)
    assert(r.getLong(7) === math.floor((po - pe) / (1.0 - pe) * 1e6 + 0.5).toLong)
    // the statistic must have something to correct: both agreement and
    // disagreement present, and kappa strictly between chance and perfect
    assert(n11 + n00 > 0 && n10 + n01 > 0, "gates never disagree (or never agree) — vacuous")
    assert(r.getLong(7) > 0L && r.getLong(7) < 1000000L,
      s"kappa ${r.getLong(7)} degenerate")
  }

  test("q240 ANOVA F equals a driver computation and detects the between-group signal") {
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"),
        floor(round(col("value"), 2) * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = byG.size.toLong
    val n = rows.length.toLong
    val sx = rows.map(_._2).sum
    val sxx = rows.map(v => v._2 * v._2).sum
    val tsum = byG.values.map { vs =>
      val s = vs.sum
      math.floor(s.toDouble * s.toDouble / vs.length.toDouble + 0.5).toLong
    }.sum
    val ssb = tsum.toDouble - sx.toDouble * sx.toDouble / n.toDouble
    val sst = sxx.toDouble - sx.toDouble * sx.toDouble / n.toDouble
    val f = (ssb / (k - 1).toDouble) / ((sst - ssb) / (n - k).toDouble)
    val r = graft.queries.ExtQueries.queries("q240_anova_f")(spark, sfDir).head()
    assert(r.getLong(0) === k && r.getLong(1) === n)
    assert(r.getLong(2) === math.floor(ssb + 0.5).toLong)
    assert(r.getLong(3) === math.floor((sst - ssb) + 0.5).toLong)
    assert(r.getLong(4) === math.floor(f * 1e6 + 0.5).toLong, "F diverged")
    assert(r.getLong(5) === math.floor(ssb / sst * 1e6 + 0.5).toLong, "eta2 diverged")
    assert(r.getLong(0) >= 2L, "need >= 2 groups for ANOVA — vacuous")
  }

  test("q240 degenerate input pins the statistics at -1 (the anovaState sentinel contract)") {
    // a one-group events table: k = 1 makes F undefined — the batch
    // query must emit the SAME sentinels the streaming twin pins,
    // never NaN/Infinity floor semantics
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-anova-degen").toString
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .write.mode("overwrite").parquet(s"$tmpDir/events.parquet")
    val r = graft.queries.ExtQueries.queries("q240_anova_f")(spark, tmpDir).head()
    assert(r.getLong(0) === 1L, "expected exactly one group")
    assert(r.getLong(1) > 0L, "degenerate fixture must still carry rows")
    assert(r.getLong(2) === -1L && r.getLong(3) === -1L &&
      r.getLong(4) === -1L && r.getLong(5) === -1L,
      "degenerate ANOVA must pin ssb/ssw/F/eta2 at -1 (batch/stream sentinel parity)")
  }

  test("q243's DECIMAL(38,0) second moments stay exact where long sums wrap int64 " +
      "(the adversarial-n shape: sum(r2*r2) ~ (4/3)n^3 past ~1.9M docs)") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    // doubled midranks the size a ~1.5B-doc corpus would produce: each
    // product r2*r2 ~ 4.2e18 fits int64, but THREE of them overflow the
    // plain long sum — the exact silent-wrap q243 widens against
    val r2 = Seq(2060000000L, 2070000000L, 2080000000L)
    val df = r2.toDF("r2_x")
    val d38 = DecimalType(38, 0)
    val widened = df.agg(
      sum(col("r2_x").cast(d38) * col("r2_x").cast(d38)).as("sxx"))
      .head().getDecimal(0)
    val truth = r2.map(v => BigInt(v) * BigInt(v)).sum
    assert(BigInt(widened.toBigInteger) === truth,
      s"widened sum $widened != exact $truth")
    assert(truth > BigInt(Long.MaxValue),
      "fixture must actually exceed int64 or the case is vacuous")
    // the plain-long shape FAILS on the same input — silently wrapped
    // under non-ANSI Spark (the cross-engine divergence), a hard
    // ARITHMETIC_OVERFLOW under ANSI (this session): either way the
    // un-widened aggregate cannot produce the exact sum
    val longShape = scala.util.Try(
      df.agg(sum(col("r2_x") * col("r2_x"))).head().getLong(0))
    assert(longShape.isFailure || BigInt(longShape.get) != truth,
      "long sum unexpectedly exact — fixture too small")
  }

  test("q249 CUSUM equals a driver sequential-recurrence fold (the closed form vs the " +
      "textbook recurrence, pinned from both sides); alarms actually fire") {
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("cast(cast(ts as long) div 86400 as bigint)").as("d"))
      .agg(sum(floor(round(col("value"), 2) * 100.0 + 0.5).cast("long")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val B = 7 // CusumBaselineDays
    assert(daily.length > B, "series too short — vacuous")
    val mu0 = Math.floorDiv(daily.take(B).map(_._2).sum, B.toLong)
    val slack = Math.floorDiv(mu0, 20L)
    val h = Math.floorDiv(mu0, 2L)
    // the TEXTBOOK recurrence (max(0, S + dev)), NOT the prefix closed
    // form the query plans — agreement proves the algebraic identity
    var sp = 0L; var sn = 0L
    val want = daily.drop(B).map { case (d, v) =>
      sp = math.max(0L, sp + v - mu0 - slack)
      sn = math.max(0L, sn + mu0 - slack - v)
      (d, v, sp, sn, if (sp > h || sn > h) 1L else 0L)
    }.toSeq
    val got = graft.queries.ExtQueries.queries("q249_cusum_monitor")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want, "distributed CUSUM closed form diverged from the recurrence")
    // the monitor must do real work on the corpus: both sides excited,
    // and at least one alarm day (the synthetic series drifts)
    assert(want.exists(_._3 > 0L) && want.exists(_._4 > 0L),
      "one-sided trajectories flat — vacuous")
    assert(want.exists(_._5 === 1L), "no alarm day on the corpus — vacuous monitor")
  }

  test("q241 Mann-Kendall equals a driver all-pairs sign computation with tie-corrected variance") {
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("cast(cast(ts as long) div 86400 as bigint)").as("d"))
      .agg(sum(floor(round(col("value"), 2) * 100.0 + 0.5).cast("long")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val sStat = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield java.lang.Long.signum(daily(j)._2 - daily(i)._2).toLong).sum
    val n = daily.length.toLong
    val ties = daily.groupBy(_._2).map(_._2.length.toLong)
    val tieTerm = ties.map(t => t * (t - 1) * (2 * t + 5)).sum
    val var18 = n * (n - 1) * (2 * n + 5) - tieTerm
    val z =
      if (sStat > 0) (sStat - 1.0) / math.sqrt(var18.toDouble / 18.0)
      else if (sStat < 0) (sStat + 1.0) / math.sqrt(var18.toDouble / 18.0)
      else 0.0
    val r = graft.queries.ExtQueries.queries("q241_mann_kendall")(spark, sfDir).head()
    assert(r.getLong(0) === n && r.getLong(1) === ties.size.toLong)
    assert(r.getLong(2) === sStat, "S statistic diverged")
    assert(r.getLong(3) === tieTerm && r.getLong(4) === var18)
    assert(r.getLong(5) === math.floor(z * 1e6 + 0.5).toLong, "z diverged")
    assert(n >= 10, "too few days for a meaningful MK test — vacuous")
  }

  test("q242 Kruskal-Wallis equals a driver midrank computation; ties actually exercised") {
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), floor(round(col("value"), 2) * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val grid = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sortedV = grid.keys.toSeq.sorted
    val below = sortedV.scanLeft(0L)((acc, v) => acc + grid(v)).zip(sortedV)
      .map { case (b, v) => v -> b }.toMap
    // 2×midrank per value; per-group 2R_g exact
    val r2ByG = rows.groupBy(_._1).view.mapValues(_.map { case (_, v) =>
      2 * below(v) + grid(v) + 1 }.sum).toMap
    val nByG = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val rsum = r2ByG.map { case (g, r2) =>
      math.floor(r2.toDouble * r2.toDouble / (4.0 * nByG(g).toDouble) + 0.5).toLong
    }.sum
    val n = rows.length.toLong
    val tie3 = grid.values.map(m => m * m * m - m).sum
    val h = 12.0 / (n.toDouble * (n + 1.0)) * rsum.toDouble - 3.0 * (n + 1.0)
    val corr = 1.0 - tie3.toDouble / (n.toDouble * n * n - n)
    val r = graft.queries.ExtQueries.queries("q242_kruskal_wallis")(spark, sfDir).head()
    assert(r.getLong(0) === nByG.size.toLong && r.getLong(1) === n)
    assert(r.getLong(2) === rsum, "rank-square sum diverged")
    assert(r.getLong(3) === tie3)
    assert(r.getLong(4) === math.floor(h * 1e6 + 0.5).toLong, "H diverged")
    assert(r.getLong(5) === math.floor(h / corr * 1e6 + 0.5).toLong, "tie-corrected H diverged")
    assert(tie3 > 0L, "no ties on the value grid — the midrank machinery is untested")
    spark.catalog.clearCache()
  }

  test("q229 conformal quantile equals a full-sort driver rank; the coverage guarantee holds") {
    // the Column-API double chain scored() uses (a SQL-string decimal
    // rebuild would differ in ulps at the micro-floor boundaries)
    val u = ((col("l_orderkey") * 9973L + col("l_linenumber") * 7919L) % 1000L) / 1000.0
    val label = when(col("l_returnflag") === "R", 1).otherwise(0)
    val score = when(label === 1, lit(0.3) + lit(0.7) * u).otherwise(lit(0.66) * u)
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").cast("long"), col("l_linenumber").cast("long"),
        label.cast("int").as("label"), score.as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    def nc(label: Int, score: Double): Long =
      math.floor((1.0 - (if (label == 1) score else 1.0 - score)) * 1e6 + 0.5).toLong
    val (cal, eval_) = rows.partition { case (ok, ln, _, _) => (ok * 7 + ln) % 5 == 0 }
    val calNc = cal.map { case (_, _, l, sc) => nc(l, sc) }.sorted
    val n = calNc.length
    val k = math.min(math.ceil((n + 1) * 0.9).toLong, n.toLong)
    val qhat = calNc((k - 1).toInt)
    val covered = eval_.count { case (_, _, l, sc) => nc(l, sc) <= qhat }
    val r = graft.ml.MlQueries.queries("q229_conformal")(spark, sfDir).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((n.toLong, k, qhat)),
      "two-phase conformal quantile diverged from the full-sort rank")
    assert((r.getLong(3), r.getLong(4)) === ((eval_.length.toLong, covered.toLong)))
    // the marginal-coverage guarantee: empirical coverage ≈ ≥ 90%
    // (exchangeable splits; allow finite-sample slack below the bound)
    val coverage = r.getLong(5) / 1e6
    assert(coverage >= 0.88, s"coverage $coverage fell far below the 0.9 conformal bound")
    assert(r.getLong(5) ===
      math.floor(covered.toDouble / eval_.length * 1e6 + 0.5).toLong)
  }

  test("q230 chi-square + Cramér's V equal a driver contingency computation") {
    val obs = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("cast(cast(ts as long) div 86400 as bigint) % 7"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rTot = obs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cTot = obs.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = obs.values.sum
    val chi2Micro = obs.map { case ((t, d), o) =>
      val e = rTot(t).toDouble * cTot(d).toDouble / n.toDouble
      math.floor((o.toDouble - e) * (o.toDouble - e) / e * 1e6 + 0.5).toLong
    }.sum
    val rc = rTot.size.toLong; val cc = cTot.size.toLong
    val v = math.sqrt(chi2Micro.toDouble / 1e6 / (n.toDouble * math.min(rc - 1, cc - 1)))
    val row = graft.queries.ExtQueries.queries("q230_chi_square")(spark, sfDir).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ===
      ((n, rc, cc, (rc - 1) * (cc - 1))))
    assert(row.getLong(4) === chi2Micro, "per-cell micro-floored chi2 total diverged")
    assert(row.getLong(5) === math.floor(v * 1e6 + 0.5).toLong)
    // V lives in [0, 1] on the micro grid
    assert(row.getLong(5) >= 0L && row.getLong(5) <= 1000000L)
  }

  test("q231 stochastic-greedy coreset equals a sequential driver greedy; coverage identity holds") {
    val embs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def tokHash(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    def s4(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      // the kernel's exact op order: dot / (sqrt(na) * sqrt(nb))
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000.0 + 0.5).toLong
    }
    var cur = embs.keys.map(_ -> 0L).toMap
    var selected = List.empty[Long]
    val ref = (1 to 6).map { r =>
      // the absolute-size hash-order pool: top-64 by (salted hash, id)
      val pool = embs.keys.filterNot(selected.contains).toSeq
        .sortBy(id => (tokHash(s"$r#$id"), id)).take(64)
      val gains = pool.map { c =>
        // iterator, not keys.map: a Set would DEDUPE equal gain terms
        c -> embs.keys.iterator.map(v => math.max(0L, s4(embs(v), embs(c)) - cur(v))).sum
      }
      val (winner, gain) = gains.minBy { case (id, g) => (-g, id) }
      selected ::= winner
      cur = cur.map { case (v, cv) => v -> math.max(cv, s4(embs(v), embs(winner))) }
      (r.toLong, winner, gain, cur.values.sum)
    }
    val got = LlmQueries.queries("q231_coreset_greedy")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === ref, "distributed stochastic greedy diverged from the sequential fold")
    // the facility-location identity: coverage grows by exactly the
    // selected candidate's full-corpus gain, and is monotone
    got.sliding(2).foreach {
      case Seq((_, _, _, c0), (_, _, g1, c1)) =>
        assert(c1 === c0 + g1, "coverage != previous coverage + winner gain")
      case _ => ()
    }
    assert(got.map(_._4) === got.map(_._4).sorted, "coverage not monotone")
    spark.catalog.clearCache()
  }

  test("q232 rolling 7-day distinct equals an exact set-based driver computation") {
    val pairs = Tables.events(spark, sfDir)
      .filter(col("user_id") >= 0)
      .select(expr("cast(cast(ts as long) div 86400 as bigint)"), col("user_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = graft.queries.ExtQueries.queries("q232_rolling_distinct")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === byDay.size)
    got.foreach { case (d, dau, wau, stick) =>
      val want1 = byDay(d).size.toLong
      val want7 = (d - 6 to d).flatMap(byDay.get).foldLeft(Set.empty[Long])(_ ++ _).size.toLong
      assert(dau === want1, s"day $d DAU")
      assert(wau === want7, s"day $d trailing-7 distinct (bitmap OR != set union)")
      assert(stick === math.floor(dau.toDouble / wau * 1e6 + 0.5).toLong)
      assert(wau >= dau, "window distinct below daily distinct")
    }
    // the window must actually exceed single days somewhere (non-vacuous)
    assert(got.exists { case (_, dau, wau, _) => wau > dau })
  }

  test("q222 equals the exact all-pairs Theil-Sen median on the daily grid") {
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("cast(cast(ts as long) div 86400 as bigint)").as("d"))
      .agg(sum(floor(round(col("value"), 2) * 100.0 + 0.5).cast("long")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield (daily(j)._2 - daily(i)._2).toDouble / (daily(j)._1 - daily(i)._1).toDouble)
      .sorted
    val np = slopes.length
    val lo = slopes((np + 1) / 2 - 1)
    val hi = slopes(np / 2)
    def s6(v: Double) = math.floor(v * 1e6 + 0.5).toLong
    val r = graft.queries.ExtQueries.queries("q222_theil_sen")(spark, sfDir).head()
    assert(r.getLong(0) === np.toLong)
    assert(r.getLong(1) === s6(lo), "lower middle slope diverged")
    assert(r.getLong(2) === s6(hi), "upper middle slope diverged")
    assert(r.getLong(3) === s6((lo + hi) / 2.0), "median diverged")
    // robustness canon sanity: the median slope is finite and the grid real
    assert(np > 100, "daily grid too small — vacuous")
  }

  test("q250 Kendall tau-b equals a driver brute-force pair count (the O(n^2) definition " +
      "vs the dense-grid dominance plan); association present and tau < |rho|-ish sane") {
    val pts = Tables.documents(spark, sfDir).select(col("text"))
      .collect().map { r =>
        val tk = r.getString(0).split("\\s+").filter(_.nonEmpty)
        (tk.length.toLong, tk.distinct.length.toLong)
      }
    var conc = 0L; var disc = 0L; var tieX = 0L; var tieY = 0L
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val dx = java.lang.Long.signum(pts(j)._1 - pts(i)._1)
      val dy = java.lang.Long.signum(pts(j)._2 - pts(i)._2)
      if (dx == 0) tieX += 1
      if (dy == 0) tieY += 1
      if (dx != 0 && dy != 0) { if (dx == dy) conc += 1 else disc += 1 }
    }
    val n = pts.length.toDouble
    val num = 2.0 * (conc.toDouble - disc.toDouble)
    val dxT = n * (n - 1.0) - (2L * tieX).toDouble
    val dyT = n * (n - 1.0) - (2L * tieY).toDouble
    val r = LlmQueries.queries("q250_kendall_tau")(spark, sfDir).head()
    assert(r.getLong(0) === pts.length.toLong)
    assert(r.getLong(1) === conc, "concordant count diverged from the pair definition")
    assert(r.getLong(2) === disc, "discordant count diverged from the pair definition")
    assert(r.getLong(3) === 2L * tieX && r.getLong(4) === 2L * tieY,
      "tie-pair counts diverged")
    assert(r.getLong(5) === math.floor(num / math.sqrt(dxT * dyT) * 1e6 + 0.5).toLong,
      "tau_b diverged")
    // the length/diversity association is real on this corpus, and tau
    // must be a proper effect size (strictly inside (0, 1))
    assert(r.getLong(5) > 100000L && r.getLong(5) < 1000000L,
      s"tau ${r.getLong(5)} degenerate — no signal to measure")
    spark.catalog.clearCache()
  }

  test("q251 Kneser-Ney head equals a sequential driver LM build; the model is a " +
      "PROPER distribution (exact integer normalization identity in quarters)") {
    val texts = Tables.documents(spark, sfDir).select(col("text"))
      .collect().map(_.getString(0))
    val bigrams = texts.flatMap { t =>
      val tk = t.split("\\s+").filter(_.nonEmpty)
      tk.zip(tk.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val c = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cW1 = c.groupBy(_._1.split(" ")(0)).view.mapValues(_.values.sum).toMap
    val n1fw = c.groupBy(_._1.split(" ")(0)).view.mapValues(_.size.toLong).toMap
    val n1bw = c.groupBy(_._1.split(" ")(1)).view.mapValues(_.size.toLong).toMap
    val b = c.size.toLong
    def pkn(bg: String): Double = {
      val Array(w1, w2) = bg.split(" ")
      (4L * c(bg) - 3L).toDouble / (4.0 * cW1(w1).toDouble) +
        3.0 * n1fw(w1).toDouble * n1bw(w2).toDouble / (4.0 * cW1(w1).toDouble * b.toDouble)
    }
    val want = c.keys.toSeq.sortBy(bg => (-c(bg), bg)).take(40).map { bg =>
      (bg, c(bg), cW1(bg.split(" ")(0)), n1fw(bg.split(" ")(0)), n1bw(bg.split(" ")(1)),
        math.floor(pkn(bg) * 1e6 + 0.5).toLong)
    }
    val got = LlmQueries.queries("q251_kneser_ney")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === want, "KN head diverged from the sequential LM build")
    // proper-distribution identity, EXACT in quarters: for every context
    // w1, sum over the full bigram-type vocabulary of the scaled
    // numerator (4c-3)B + 3*N1fw*N1bw equals 4*c(w1.)*B — i.e.
    // sum_w2 p(w2|w1) == 1 with zero float involvement
    cW1.keys.foreach { w1 =>
      // .toSeq before map: keys is a Set, and a Set.map would collapse
      // equal-valued terms before the sum
      val obs = c.keys.toSeq.filter(_.split(" ")(0) == w1)
      val obsNum = obs.map(bg =>
        BigInt(4L * c(bg) - 3L) * b + BigInt(3L) * n1fw(w1) * n1bw(bg.split(" ")(1))).sum
      val unobsNum = n1bw.keys.toSeq.filterNot(w2 => c.contains(s"$w1 $w2"))
        .map(w2 => BigInt(3L) * n1fw(w1) * n1bw(w2)).sum
      assert(obsNum + unobsNum === BigInt(4L) * cW1(w1) * b,
        s"KN mass for context '$w1' does not normalize — not a distribution")
    }
    // the head must carry real discounting structure, not a degenerate
    // uniform table
    assert(got.map(_._2).distinct.length > 1, "all head bigrams share one count — vacuous")
    spark.catalog.clearCache()
  }

  test("q252 harmonic centrality equals a sequential per-seed BFS over the same derived " +
      "graph; the 60/d integer mass is exact and hubs genuinely separate") {
    val docs = LlmQueries.linkGraphDocs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = docs.length.toLong
    def tokHash(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val edges = (for {
      (_, idx) <- docs
      j <- 1 to 3
      dst = tokHash(s"$idx#$j") % n
      if dst != idx
    } yield (idx, dst)).distinct
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = docs.map(_._2).filter(_ % 97 == 0)
    val mass = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    seeds.foreach { s0 =>
      var frontier = Set(s0)
      var seen = Set(s0)
      for (d <- 1 to 6) {
        frontier = frontier.flatMap(v => adj.getOrElse(v, Array.empty[Long])) -- seen
        seen ++= frontier
        frontier.foreach { v =>
          val (h, c) = mass.getOrElse(v, (0L, 0L))
          mass(v) = (h + 60L / d, c + 1L)
        }
      }
    }
    val idx2doc = docs.map { case (doc, idx) => idx -> doc }.toMap
    val want = mass.toSeq
      .map { case (v, (h, c)) => (idx2doc(v), h, c) }
      .sortBy { case (doc, h, _) => (-h, doc) }
      .take(20)
    val got = LlmQueries.queries("q252_harmonic")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want, "harmonic head diverged from the sequential per-seed BFS")
    // the centrality must discriminate (a flat table would be vacuous),
    // and multiple seeds must genuinely reach the head nodes
    assert(got.map(_._2).distinct.length > 1, "all head nodes share one H — vacuous")
    assert(got.head._3 > 1L, "top node reached by a single seed — sample too sparse to rank")
    spark.catalog.clearCache()
  }

  test("q260 pivot betweenness equals an EXPLICIT shortest-path enumeration (every " +
      "seed-pair path walked and counted per intermediate node)") {
    // independent of both the engine's σ-sum frontier algorithm AND the
    // oracle's walk-count fixpoint: enumerate the actual shortest paths
    val docs = LlmQueries.linkGraphDocs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = docs.length.toLong
    def tokHash(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val edges = (for {
      (_, idx) <- docs
      j <- 1 to 3
      dst = tokHash(s"$idx#$j") % n
      if dst != idx
    } yield (idx, dst)).distinct
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    // the r15 ABSOLUTE-size pivot set: top-64 by salted hash, idx tie-break
    val seeds = docs.map(_._2)
      .sortBy(idx => (tokHash(s"bc#$idx"), idx))
      .take(64)
    def bfsDist(s0: Long): Map[Long, Int] = {
      val d = scala.collection.mutable.Map(s0 -> 0)
      var frontier = Seq(s0)
      for (h <- 1 to 6) {
        frontier = frontier.flatMap(v => adj.getOrElse(v, Seq.empty))
          .distinct.filterNot(d.contains)
        frontier.foreach(v => d(v) = h)
      }
      d.toMap
    }
    val bc = scala.collection.mutable.Map.empty[Long, Long] // v -> bc_micro
    val terms = scala.collection.mutable.Map.empty[Long, Long] // v -> n_pair_terms
    seeds.foreach { s0 =>
      val dist = bfsDist(s0)
      seeds.filter(t => t != s0 && dist.contains(t)).foreach { t =>
        val dst = dist(t)
        // walk the layered DAG: every path s→t stepping d→d+1
        var sigmaSt = 0L
        val through = scala.collection.mutable.Map.empty[Long, Long]
        def walk(v: Long, path: List[Long]): Unit =
          if (v == t) {
            sigmaSt += 1
            path.drop(1).foreach(u => // interiors only: path = v :: ... :: s
              if (u != s0 && u != t) through(u) = through.getOrElse(u, 0L) + 1L)
          } else adj.getOrElse(v, Seq.empty)
            .filter(w => dist.get(w).contains(dist(v) + 1) && dist(w) <= dst)
            .foreach(w => walk(w, w :: path))
        walk(s0, List(s0))
        assert(sigmaSt > 0L)
        through.foreach { case (v, c) =>
          bc(v) = bc.getOrElse(v, 0L) + c * 1000000L / sigmaSt
          terms(v) = terms.getOrElse(v, 0L) + 1L
        }
      }
    }
    // NOTE the grain: the engine floors PER (s,t,v) TERM — c·10⁶ div σ_st
    // per pair — and c here is already the per-pair count, so the floor
    // grain matches exactly
    val idx2doc = docs.map { case (doc, idx) => idx -> doc }.toMap
    val want = bc.toSeq.map { case (v, b) => (idx2doc(v), b, terms(v)) }
      .sortBy { case (doc, b, _) => (-b, doc) }.take(20)
    val got = LlmQueries.queries("q260_betweenness")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want, "betweenness head diverged from explicit path enumeration")
    assert(got.map(_._2).distinct.length > 1, "flat betweenness table — vacuous")
    assert(got.head._3 > 1L, "top broker carries a single pair term — sample too sparse")
    spark.catalog.clearCache()
  }

  test("q254 Ljung-Box equals a sequential driver fold of q185's ACF (the textbook " +
      "Q(h) formula); the i.i.d. synthetic series correctly ACCEPT whiteness") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(floor(round(sum(col("value")), 2) + 0.5).cast("long").as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val got = graft.queries.ExtQueries.queries("q254_ljung_box")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val byType = daily.groupBy(_._1)
    got.foreach { case (tpe, nDays, syyGot, qMicro, reject) =>
      val xs = byType(tpe).sortBy(_._2).map(_._3)
      val n = xs.length.toLong
      assert(n === nDays)
      val t = xs.sum
      val ys = xs.map(x => n * x - t)
      val syy = ys.map(y => y * y).sum
      assert(syy === syyGot, s"$tpe: Syy diverged")
      if (n <= 8) assert(qMicro === -1L && reject === -1L)
      else {
        // written-order term sum — the exact chain the query pins
        var terms = 0.0
        (1 to 7).foreach { k =>
          val syk = ys.dropRight(k).zip(ys.drop(k)).map { case (a, b) => a * b }.sum
          val r = syk.toDouble / syy.toDouble
          terms += r * r / (n.toDouble - k.toDouble)
        }
        val q = n.toDouble * (n.toDouble + 2.0) * terms
        assert(qMicro === math.floor(q * 1e6 + 0.5).toLong, s"$tpe: Q diverged")
        assert(reject === (if (q > 18.475307) 1L else 0L))
      }
    }
    // the statistic must be defined and must discriminate between
    // series (the synthetic corpus is i.i.d.-ish by construction, so
    // ACCEPTING whiteness everywhere is the CORRECT verdict here — the
    // reject branch is proven on a planted trend in the next test)
    assert(got.forall(_._5 === 0L), "synthetic i.i.d. revenue flagged as autocorrelated")
    assert(got.forall(_._4 > 0L) && got.map(_._4).distinct.length > 1,
      "Q degenerate — no signal measured")
    spark.catalog.clearCache()
  }

  test("q254 fires on a planted trend and pins the short-series sentinel " +
      "(the gate can actually gate)") {
    import java.nio.file.Files
    import java.sql.Timestamp
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-lb-trend").toString
    def ts(day: Int) = new Timestamp(day * 86400000L)
    // 30-day strongly trending series (value = 100*day): massive
    // positive autocorrelation at every lag — Q must reject; plus a
    // 5-day series that cannot support h = 7 lags — sentinel
    val rows =
      (1 to 30).map(d => (ts(d), "trend", d * 100.0)) ++
        (1 to 5).map(d => (ts(d), "short", 50.0)) ++
        Seq((ts(1), "oneday", 75.0)) // a 1-day series: zero lead rows survive
    rows.toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val byType = graft.queries.ExtQueries.queries("q254_ljung_box")(spark, dir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    val (nT, qT, rejT) = byType("trend")
    assert(nT === 30L && rejT === 1L, s"planted trend not rejected (Q_micro=$qT)")
    assert(qT > 18475307L, "rejecting series must carry Q above the chi-square cut")
    val (nS, qS, rejS) = byType("short")
    assert(nS === 5L && qS === -1L && rejS === -1L,
      "series shorter than h+2 must pin the sentinel, not NaN/null")
    // the r13 ADVICE contract: an n=1 type has NO stacked lag rows at
    // all — it must still EMIT its sentinel row (row set derives from
    // the per-type daily frame), or the streaming twin's keyset bridge
    // breaks on such data
    assert(byType.contains("oneday"), "n=1 event type silently dropped from q254's output")
    val (n1, q1, rej1) = byType("oneday")
    assert(n1 === 1L && q1 === -1L && rej1 === -1L,
      "n=1 type must carry the short-series sentinel")
    spark.catalog.clearCache()
  }

  test("q258 KN perplexity gate equals a sequential driver LM scoring + the exact " +
      "ceil(2n/3) rank threshold; the gate genuinely cuts") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bigramsOf: String => Seq[String] = { t =>
      val tk = t.split("\\s+").filter(_.nonEmpty)
      tk.zip(tk.drop(1)).map { case (a, b) => s"$a $b" }.toSeq
    }
    val allBg = docs.flatMap { case (_, t) => bigramsOf(t) }
    val c = allBg.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cW1 = c.toSeq.groupBy(_._1.split(" ")(0)).view.mapValues(_.map(_._2).sum).toMap
    val n1fw = c.toSeq.groupBy(_._1.split(" ")(0)).view.mapValues(_.size.toLong).toMap
    val n1bw = c.toSeq.groupBy(_._1.split(" ")(1)).view.mapValues(_.size.toLong).toMap
    val b = c.size.toLong
    def surp(bg: String): Long = {
      val Array(w1, w2) = bg.split(" ")
      val p = (4L * c(bg) - 3L).toDouble / (4.0 * cW1(w1).toDouble) +
        3.0 * n1fw(w1).toDouble * n1bw(w2).toDouble / (4.0 * cW1(w1).toDouble * b.toDouble)
      math.floor(-math.log(p) * 1e6 + 0.5).toLong
    }
    val perDoc = docs.map { case (id, t) =>
      val bgs = bigramsOf(t)
      val h = bgs.map(surp).sum
      val n = bgs.length.toLong
      (id, n, if (n > 0) h else 0L, if (n > 0) h / n else -1L)
    }
    val scoredCes = perDoc.filter(_._2 > 0).map(_._4).sorted
    val k = (2L * scoredCes.length + 2L) / 3L
    val thr = scoredCes((k - 1).toInt)
    val want = perDoc.sortBy(_._1).map { case (id, n, h, ce) =>
      (id, n, h, ce, thr, if (ce <= thr) 1L else 0L)
    }.toSeq
    val got = LlmQueries.queries("q258_kn_ppl_gate")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === want, "KN gate diverged from the sequential LM scoring")
    // the gate must actually partition the corpus: CCNet keeps
    // head+middle, so roughly a third is dropped (exactly n - the
    // tie-inclusive keep count; assert both classes non-empty)
    val kept = got.count(_._6 === 1L); val dropped = got.count(_._6 === 0L)
    assert(kept > 0 && dropped > 0, s"gate vacuous: kept=$kept dropped=$dropped")
    // threshold rank contract: every scored kept doc's ce <= every dropped ce
    val keptCes = got.filter(g => g._6 === 1L && g._2 > 0).map(_._4)
    val dropCes = got.filter(_._6 === 0L).map(_._4)
    assert(keptCes.max <= dropCes.min, "keep set is not a ce-prefix")
    spark.catalog.clearCache()
  }

  test("q259 PACF equals the sequential Durbin-Levinson recursion off the exact ACF " +
      "grid; an AR-free series keeps small partials and sentinels pin on degenerates") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(floor(round(sum(col("value")), 2) + 0.5).cast("long").as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val got = graft.queries.ExtQueries.queries("q259_pacf")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        (3 to 8).map(r.getLong).toSeq, r.getLong(9)))
    val byType = daily.groupBy(_._1)
    assert(got.map(_._1).toSet === byType.keySet, "row set != event-type set")
    got.foreach { case (tpe, nDays, syyGot, micros, defined) =>
      val xs = byType(tpe).sortBy(_._2).map(_._3)
      val n = xs.length.toLong
      assert(n === nDays)
      val t = xs.sum
      val ys = xs.map(x => n * x - t)
      val syy = ys.map(y => y * y).sum
      assert(syy === syyGot, s"$tpe: Syy diverged")
      def sk(k: Int): Long =
        ys.dropRight(k).zip(ys.drop(k)).map { case (a, b) => a * b }.sum
      if (n > 4 && syy > 0) {
        // the sequential recursion, in the query's written order
        val r1 = sk(1).toDouble / syy.toDouble
        val r2 = sk(2).toDouble / syy.toDouble
        val r3 = sk(3).toDouble / syy.toDouble
        val d2 = 1.0 - r1 * r1
        val phi22 = (r2 - r1 * r1) / d2
        val phi21 = r1 - phi22 * r1
        val d3 = 1.0 - phi21 * r1 - phi22 * r2
        val phi33 = (r3 - phi21 * r2 - phi22 * r1) / d3
        if (d2 != 0.0 && d3 != 0.0) {
          assert(defined === 1L)
          val want = Seq(r1, r2, r3, r1, phi22, phi33)
            .map(v => math.floor(v * 1e6 + 0.5).toLong)
          assert(micros === want, s"$tpe: DL recursion diverged")
          // partials are proper correlations on the micro grid
          micros.foreach(m => assert(m >= -1000000L && m <= 1000000L))
        }
      } else {
        assert(defined === 0L && micros.forall(_ === -2000000L),
          s"$tpe: degenerate series must pin the sentinel")
      }
    }
    // non-vacuity: the synthetic series must yield distinct partials
    assert(got.filter(_._5 === 1L).map(_._4).distinct.length > 1,
      "PACF degenerate — no signal measured")
    spark.catalog.clearCache()
  }

  test("q259 pins sentinels on short and constant series and detects a planted AR(1)") {
    import java.nio.file.Files
    import java.sql.Timestamp
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pacf").toString
    def ts(day: Int) = new Timestamp(day * 86400000L)
    // a smooth strongly-persistent series (x_t = 10·t²): consecutive
    // values are near-identical relative to the series spread, so the
    // lag-1 partial dominates; constant and 3-day series pin sentinels
    val ar = (1 to 40).map(d => (ts(d), "ar1", 10.0 * d * d))
    val rows = ar ++
      (1 to 3).map(d => (ts(d), "short", 50.0 * d)) ++
      (1 to 20).map(d => (ts(d), "flat", 400.0))
    rows.toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val byType = graft.queries.ExtQueries.queries("q259_pacf")(spark, dir)
      .collect().map(r => (r.getString(0),
        ((3 to 8).map(r.getLong).toSeq, r.getLong(9)))).toMap
    val (arM, arDef) = byType("ar1")
    assert(arDef === 1L, "AR(1) series must be defined")
    assert(arM(3) > 500000L, s"lag-1 partial of a random walk should dominate: ${arM(3)}")
    assert(math.abs(arM(5)) < arM(3), "lag-3 partial must not exceed lag-1 on AR(1)")
    val (shM, shDef) = byType("short")
    assert(shDef === 0L && shM.forall(_ === -2000000L), "3-day series must pin the sentinel")
    val (flM, flDef) = byType("flat")
    assert(flDef === 0L && flM.forall(_ === -2000000L),
      "constant series (syy=0) must pin the sentinel, not NaN")
    spark.catalog.clearCache()
  }

  test("q255 EB shrinkage equals a sequential MoM fold; every defined rate is pulled " +
      "strictly toward the pool and small groups are pulled harder") {
    val rows = graft.queries.ExtQueries.queries("q255_eb_shrinkage")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    // sequential MoM fold over the same (n, y) table, in n_name order
    val k = rows.length.toLong
    val ps = rows.map { case (_, n, y, _, _, _, _, _) => y * 1000000L / n }
    rows.zip(ps).foreach { case (r, p) => assert(r._4 === p, s"${r._1}: raw grid diverged") }
    val sp = ps.sum; val spp = ps.map(p => p * p).sum
    val m01 = sp.toDouble / k.toDouble / 1e6
    val v01 = (k.toDouble * spp.toDouble - sp.toDouble * sp.toDouble) /
      (k.toDouble * k.toDouble) / 1e12
    val ab = m01 * (1.0 - m01) / v01 - 1.0
    val defined = v01 > 0.0 && ab > 0.0
    assert(rows.forall(_._8 === (if (defined) 1L else 0L)))
    assert(defined, "prior degenerate on this corpus — shrinkage untested, vacuous")
    val alpha = m01 * ab
    rows.foreach { case (name, n, y, raw, aM, bM, shrunk, _) =>
      assert(aM === math.floor(alpha * 1e6 + 0.5).toLong)
      assert(bM === math.floor((ab - alpha) * 1e6 + 0.5).toLong)
      val want = math.floor((y.toDouble + alpha) / (n.toDouble + ab) * 1e6 + 0.5).toLong
      assert(shrunk === want, s"$name: shrunken rate diverged")
      // the pull invariant: shrunk lies between raw and the prior mean
      val mMicro = m01 * 1e6
      assert(shrunk.toDouble >= math.min(raw.toDouble, mMicro) - 1.0 &&
        shrunk.toDouble <= math.max(raw.toDouble, mMicro) + 1.0,
        s"$name: shrunken rate escaped the [raw, prior-mean] interval")
    }
    // monotone pull: the pull FRACTION ab/(n+ab) decreases in n, so the
    // smallest group moves a larger share of its gap than the largest
    val byN = rows.sortBy(_._2)
    val (sm, lg) = (byN.head, byN.last)
    def pullShare(r: (String, Long, Long, Long, Long, Long, Long, Long)): Double = {
      val gap = m01 * 1e6 - r._4.toDouble
      if (math.abs(gap) < 1.0) 0.0 else (r._7.toDouble - r._4.toDouble) / gap
    }
    if (sm._2 < lg._2 && math.abs(m01 * 1e6 - sm._4.toDouble) >= 1.0 &&
        math.abs(m01 * 1e6 - lg._4.toDouble) >= 1.0)
      assert(pullShare(sm) > pullShare(lg) - 0.02,
        "smaller group pulled a smaller share of its gap — not EB")
    spark.catalog.clearCache()
  }

  test("q256 source-overlap matrix equals a driver set computation; containment " +
      "dominates Jaccard and the matrix genuinely discriminates") {
    val sets = Tables.documents(spark, sfDir).select(col("source"), col("text"))
      .collect().groupBy(_.getString(0))
      .map { case (src, rows) =>
        src -> rows.flatMap(_.getString(1).split("\\s+").filter(_.nonEmpty)).toSet
      }
    val srcs = sets.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      (s1, s2) = (srcs(i), srcs(j))
      a = sets(s1); b = sets(s2)
      inter = (a & b).size.toLong
    } yield (s1, s2, a.size.toLong, b.size.toLong, inter,
      inter * 1000000L / (a.size + b.size - inter),
      inter * 1000000L / math.min(a.size, b.size))).toSeq
    val got = LlmQueries.queries("q256_source_overlap")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === want, "overlap matrix diverged from the driver set computation")
    assert(got.length === srcs.length * (srcs.length - 1) / 2, "pair count wrong")
    // structural invariants + non-vacuity: containment >= jaccard always,
    // and the synthetic sources share SOME but not ALL vocabulary
    got.foreach { case (s1, s2, _, _, _, j, c) =>
      assert(c >= j, s"($s1,$s2): containment below Jaccard — impossible")
    }
    assert(got.exists(r => r._6 > 0L && r._6 < 1000000L),
      "every pair is identical-or-disjoint — vacuous matrix")
    spark.catalog.clearCache()
  }

  test("q257 rank agreement: invariants tie it to the served q152 run — shared set, " +
      "pair partition, tau bounds, and Jaccard arithmetic all cross-checked") {
    val r = LlmQueries.queries("q257_rank_agreement")(spark, sfDir).head()
    val (nLex, nVec, nShared, nPairs, conc, disc, tau, jac) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    // the shared set comes from the same run q152 serves: recompute it
    // from the served q152 frame's rank columns (rank 0 = leg missed it)
    val fused = LlmQueries.queries("q152_hybrid_rrf")(spark, sfDir).collect()
      .map(rr => (rr.getLong(1), rr.getLong(2)))
    assert(nLex <= 50L && nVec <= 50L && nShared <= math.min(nLex, nVec))
    assert(fused.count { case (l, v) => l > 0L && v > 0L } <= nShared,
      "q152's fused list contains both-leg docs the shared set missed")
    // pair accounting: conc + disc + (pairs where either rank ties —
    // impossible, ranks are permutations) = all pairs
    assert(nPairs === nShared * (nShared - 1) / 2, "pair count wrong")
    assert(conc + disc === nPairs, "rank permutations cannot produce sign-0 pairs")
    // tau in [-1, 1] micro, consistent with its own counts
    val tauWant = math.floor((conc - disc).toDouble /
      (nShared.toDouble * (nShared.toDouble - 1.0) / 2.0) * 1e6 + 0.5).toLong
    assert(tau === tauWant && tau >= -1000000L && tau <= 1000000L)
    assert(jac === nShared * 1000000L / (nLex + nVec - nShared))
    // non-vacuity: the two legs genuinely overlap AND genuinely disagree
    // (if either fails, the fusion diagnostic has nothing to diagnose)
    assert(nShared >= 2L, "legs share <2 docs — agreement undefined, vacuous")
    assert(disc > 0L, "legs agree perfectly — suspicious for independent rankers")
    spark.catalog.clearCache()
  }

  test("q262 diagonal-Fréchet equals a sequential per-dim moment fold (exact-integer " +
      "moments, the identical double chain); distances are nonnegative and discriminate") {
    val rows = Tables.embeddings(spark, sfDir)
      .select(col("label").cast("long"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val byLabel = rows.groupBy(_._1).view.mapValues(_.map(_._2).toArray).toMap
    val labels = byLabel.keys.toSeq.sorted
    val dims = rows.head._2.length
    def moments(vs: Array[Array[Double]], d: Int): (Long, BigInt, BigInt) = {
      val q = vs.map(v => math.floor(v(d) * 1e6 + 0.5).toLong)
      (q.length.toLong, q.map(BigInt(_)).sum, q.map(x => BigInt(x) * x).sum)
    }
    def varOf(n: Long, sx: BigInt, sxx: BigInt): Double =
      (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) / (n.toDouble * n.toDouble)
    val want = for { i <- labels; j <- labels if i < j } yield {
      var fid = 0L
      (0 until dims).foreach { d =>
        val (na, sxa, sxxa) = moments(byLabel(i), d)
        val (nb, sxb, sxxb) = moments(byLabel(j), d)
        val dmu = sxa.toDouble / na.toDouble - sxb.toDouble / nb.toDouble
        val va = varOf(na, sxa, sxxa)
        val vb = varOf(nb, sxb, sxxb)
        // exact-arithmetic Cauchy–Schwarz: the variance numerator is
        // nonnegative BEFORE the double cast, so sqrt is always defined
        assert(na * sxxa - sxa * sxa >= 0 && nb * sxxb - sxb * sxb >= 0)
        fid += math.floor(
          (dmu * dmu + va + vb - 2.0 * math.sqrt(va * vb)) / 1000.0 + 0.5).toLong
      }
      (i, j, byLabel(i).length.toLong, byLabel(j).length.toLong, dims.toLong, fid)
    }
    val got = LlmQueries.queries("q262_frechet_slices")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === want, "pairwise Fréchet table diverged from the sequential fold")
    assert(got.nonEmpty && got.forall(_._6 >= 0L), "Fréchet distance must be nonnegative")
    assert(got.map(_._6).distinct.length > 1,
      "all slice pairs equidistant — the statistic is vacuous on this corpus")
    spark.catalog.clearCache()
  }

  test("q263 RBO equals a sequential prefix-overlap fold of the SAME legs q152/q257 " +
      "read, term-for-term; the curve is monotone and top-weighted") {
    // independent recomputation: collect the two legs' rank maps and
    // fold the prefix-overlap curve O_d depth by depth, computing each
    // dyadic term with BigInt (no shiftleft/div machinery shared with
    // the engine path)
    val (_, lexTop, vecTop, _) = LlmQueries.hybridRrfParts(spark, sfDir)
    val lex = lexTop.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val vec = vecTop.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val wantRows = (1 to 50).map { d =>
      val od = lex.count { case (doc, rl) =>
        rl <= d && vec.get(doc).exists(_ <= d) }.toLong
      val term = (BigInt(od) * BigInt(1000000000) /
        (BigInt(1) << d) / BigInt(d)).toLong
      (d.toLong, od, term)
    }
    val wantRbo = wantRows.map(_._3).sum
    val got = LlmQueries.queries("q263_rbo_legs")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(r => (r._1, r._2, r._3)).toSeq === wantRows,
      "per-depth overlap/term trace diverged from the sequential fold")
    assert(got.forall(_._4 === wantRbo), "rbo_nano total diverged")
    // invariants: O_d monotone, O_50 = the q257 shared-set size, and
    // the measure is genuinely top-weighted and non-vacuous here
    val ods = got.map(_._2)
    assert(ods.zip(ods.tail).forall { case (a, b) => a <= b }, "O_d not monotone")
    val nShared = LlmQueries.queries("q257_rank_agreement")(spark, sfDir)
      .head().getLong(2)
    assert(ods.last === nShared, "O_D must equal q257's shared-set size")
    assert(wantRbo > 0L && wantRbo < 1000000000L,
      "rbo must discriminate (0 < rbo < 1): legs neither disjoint nor identical")
    spark.catalog.clearCache()
  }

  test("q250 degenerate corpus (all y tied => zero denominator) pins the sentinel, " +
      "matching the oracle's CASE on both engines") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-tau-degenerate").toString
    import spark.implicits._
    // every doc has exactly ONE distinct token but distinct lengths:
    // x varies, y == 1 everywhere — tau-b's y-denominator is exactly 0
    Seq((1L, "a"), (2L, "b b"), (3L, "c c c"), (4L, "d d d d"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("synthetic"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = LlmQueries.queries("q250_kendall_tau")(spark, dir).head()
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 0L && r.getLong(2) === 0L,
      "no pair can be concordant or discordant when y never moves")
    assert(r.getLong(4) === 12L, "all 6 pairs are y-ties (doubled = 12)")
    assert(r.getLong(5) === -2000000L,
      "undefined tau must pin the out-of-range sentinel, not NaN/null")
    spark.catalog.clearCache()
  }

  test("q264 pairwise JSD equals a sequential union-vocab fold; nonnegative, " +
      "bounded by ln 2, role-symmetric, and discriminates between pairs") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts: Map[String, Map[String, Long]] =
      docs.groupBy(_._1).view.mapValues { ds =>
        ds.flatMap(_._2.split("\\s+").filter(_.nonEmpty))
          .groupBy(identity).view.mapValues(_.length.toLong).toMap
      }.toMap
    val srcs = counts.keys.toSeq.sorted
    // the engine's exact chain, folded sequentially: per union token one
    // double chain nano-floored, exact long sum per pair
    def jsdNano(ca: Map[String, Long], na: Long,
                cb: Map[String, Long], nb: Long): (Long, Long) = {
      val union = ca.keySet ++ cb.keySet
      var acc = 0L
      union.foreach { t =>
        val xa = ca.getOrElse(t, 0L); val xb = cb.getOrElse(t, 0L)
        val p = if (xa > 0) Some(xa.toDouble / na.toDouble) else None
        val q = if (xb > 0) Some(xb.toDouble / nb.toDouble) else None
        val m = p.getOrElse(0.0) + q.getOrElse(0.0)
        val tA = p.map(pp => pp * math.log(2.0 * pp / m)).getOrElse(0.0)
        val tB = q.map(qq => qq * math.log(2.0 * qq / m)).getOrElse(0.0)
        acc += math.floor((0.5 * tA + 0.5 * tB) * 1e9 + 0.5).toLong
      }
      (acc, union.size.toLong)
    }
    val want = for { a <- srcs; b <- srcs if a < b } yield {
      val na = counts(a).values.sum; val nb = counts(b).values.sum
      val (jsd, nu) = jsdNano(counts(a), na, counts(b), nb)
      (a, b, na, nb, nu, jsd,
        math.floor(jsd.toDouble / 1e9 / math.log(2.0) * 1e6 + 0.5).toLong)
    }
    val got = LlmQueries.queries("q264_js_divergence")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === want, "pairwise JSD table diverged from the sequential fold")
    // Lin 1991 bounds: 0 <= JSD <= ln 2 (norm in [0, 1e6]); the nano
    // total may dip a few ulps under 0 only via flooring, so pin >= 0
    // exactly (every per-token floor is symmetric around the true term)
    assert(got.forall(r => r._6 >= 0L && r._7 >= 0L && r._7 <= 1000000L),
      "JSD out of [0, ln 2]")
    // role symmetry: swapping the pair's legs must reproduce the same
    // nano total exactly (IEEE + is commutative; the chain is symmetric)
    val (a0, b0) = (want.head._1, want.head._2)
    val swapped = jsdNano(counts(b0), counts(b0).values.sum,
      counts(a0), counts(a0).values.sum)._1
    assert(swapped === want.head._6, "JSD must be order-free in its legs")
    assert(got.map(_._6).distinct.length > 1,
      "all source pairs equidistant — the statistic is vacuous on this corpus")
    spark.catalog.clearCache()
  }

  test("q265 BH-FDR equals a driver sequential fold (exact KS numerators, DKW p, " +
      "pure-integer step-up); ranks are a permutation; a shifted segment is rejected") {
    def bhTable(pairs: Array[(String, Long)])
        : Seq[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)] = {
      val n = pairs.length.toLong
      val types = pairs.map(_._1).distinct.sorted
      val m = types.length.toLong
      val grid = pairs.map(_._2).distinct.sorted
      val scored = types.map { g =>
        val mine = pairs.collect { case (`g`, v) => v }
        val ng = mine.length.toLong; val nr = n - ng
        var best = BigInt(0)
        grid.foreach { v =>
          val cg = mine.count(_ <= v).toLong
          val ca = pairs.count(_._2 <= v).toLong
          val dev = (BigInt(cg) * BigInt(nr) - BigInt(ca - cg) * BigInt(ng)).abs
          if (dev > best) best = dev
        }
        val d = best.toDouble / (ng.toDouble * nr.toDouble)
        val neff = ng.toDouble * nr.toDouble / (ng.toDouble + nr.toDouble)
        val p = math.min(1.0, 2.0 * math.exp(-2.0 * d * d * neff))
        (g, ng, nr, best.toLong, math.floor(d * 1e6 + 0.5).toLong,
          math.floor(p * 1e6 + 0.5).toLong)
      }
      val ranked = scored.map { case t @ (g, _, _, _, _, p) =>
        (t, scored.count { case (g2, _, _, _, _, p2) =>
          p2 < p || (p2 == p && g2 <= g) }.toLong)
      }
      val k = ranked.collect { case ((_, _, _, _, _, p), rnk)
        if p * m <= rnk * 50000L => rnk }.foldLeft(0L)(math.max)
      ranked.map { case ((g, ng, nr, dn, dm, p), rnk) =>
        (g, ng, nr, dn, dm, p, rnk, m,
          if (p * m <= rnk * 50000L) 1L else 0L, k, if (rnk <= k) 1L else 0L)
      }.sortBy(_._1).toSeq
    }
    def collectPairs(dir: String): Array[(String, Long)] =
      Tables.events(spark, dir)
        .select(col("event_type"),
          floor(round(col("value"), 2) * 100.0 + 0.5).cast("long").as("v"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
    def runQ(dir: String) =
      graft.queries.ExtQueries.queries("q265_bh_fdr")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
          r.getLong(9), r.getLong(10))).toSeq
    val want = bhTable(collectPairs(sfDir))
    val got = runQ(sfDir)
    assert(got === want, "BH table diverged from the sequential fold")
    assert(want.map(_._7).sorted === (1L to want.length.toLong),
      "ranks must be a permutation of 1..m (the (p, g) order is total)")
    // the corpus itself is homogeneous by construction — the screen must
    // NOT fire there (a monitor that rejects on null data is miscalibrated)
    assert(want.forall(_._11 === 0L),
      "BH rejected a segment on the homogeneous corpus — check the DKW chain")
    // reject path: graft a genuinely shifted clone segment and re-screen
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-bh-reject").toString
    val base = Tables.events(spark, sfDir)
    base.union(base.filter(col("event_type") === "purchase")
        .withColumn("event_type", lit("shifted"))
        .withColumn("value", col("value") + 500.0))
      .write.mode("overwrite").parquet(s"$tmpDir/events.parquet")
    val got2 = runQ(tmpDir)
    assert(got2 === bhTable(collectPairs(tmpDir)),
      "BH table diverged from the fold on the shifted fixture")
    val sh = got2.find(_._1 == "shifted").get
    assert(sh._11 === 1L, "a 500-unit shifted segment must be rejected")
    // step-up closure: the rejected set is EXACTLY ranks <= k, never a
    // flag-only subset (the property that distinguishes BH from per-test)
    val k2 = got2.head._10
    assert(got2.forall(r => (r._11 === 1L) === (r._7 <= k2)),
      "rejected set must be the step-up prefix")
    spark.catalog.clearCache()
  }

  test("q266 Page-Hinkley equals a driver sequential fold; a level step alarms " +
      "within 2 days, latches while it persists, and a constant series never fires") {
    val B = 7
    def phTable(daily: Seq[(Long, Long)])
        : Seq[(Long, Long, Long, Long, Long, Long)] = {
      val sorted = daily.sortBy(_._1)
      val mu0 = Math.floorDiv(sorted.take(B).map(_._2).sum, B.toLong)
      val delta = Math.floorDiv(mu0, 50L); val lambda = Math.floorDiv(mu0, 2L)
      var t = 0L; var cum = 0L; var mPos = 0L; var mNeg = 0L
      var minPos = Long.MaxValue; var minNeg = Long.MaxValue
      sorted.drop(B).map { case (d, v) =>
        t += 1; cum += v
        mPos += math.floor((v * t - cum).toDouble / t).toLong - delta
        mNeg += math.floor((cum - v * t).toDouble / t).toLong - delta
        minPos = math.min(minPos, mPos); minNeg = math.min(minNeg, mNeg)
        val pp = mPos - minPos; val pn = mNeg - minNeg
        (d, v, t, pp, pn, if (pp > lambda || pn > lambda) 1L else 0L)
      }
    }
    def collectDaily(dir: String): Seq[(Long, Long)] =
      Tables.events(spark, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(expr("cast(cast(ts as long) div 86400 as bigint)").as("d"))
        .agg(sum(floor(round(col("value"), 2) * 100.0 + 0.5).cast("long")).as("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def runQ(dir: String) =
      graft.queries.ExtQueries.queries("q266_page_hinkley")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val want = phTable(collectDaily(sfDir))
    val got = runQ(sfDir)
    assert(got === want, "PH trajectory diverged from the sequential fold")
    assert(want.exists(_._4 > 0L) && want.exists(_._5 > 0L),
      "one-sided trajectories flat — vacuous detector")
    // the detection contract, as a FIXTURE property (corpus-level alarm
    // counts are SF-dependent — sf0.001's noisy daily means excite PH
    // too): a 4x level step at day 11, one clean-cent event per day,
    // pushed through the ENGINE. PH must be quiet before the step,
    // catch it within ~2 days, and LATCH while the level persists (the
    // running mean decays the offset only like 1/t — the reason
    // practitioners reset after alarm; the scaladoc states it)
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-ph-step").toString
    import spark.implicits._
    val step = (1L to 70L).map(d => (d, if (d <= 10L) 100.00 else 400.00))
    step.toDF("day", "value")
      .select((col("day") * 86400L).cast("timestamp").as("ts"),
        lit("purchase").as("event_type"), col("value"),
        col("day").as("event_id"), col("day").as("user_id"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmpDir/events.parquet")
    val stepGot = runQ(tmpDir)
    assert(stepGot === phTable(collectDaily(tmpDir)),
      "PH diverged from the fold on the step fixture")
    val firstAlarm = stepGot.indexWhere(_._6 === 1L)
    assert(firstAlarm >= 0, "a 4x level step must alarm")
    assert(stepGot.take(firstAlarm).forall(r => r._1 <= 10L || r._6 === 0L)
      && stepGot(firstAlarm)._1 >= 11L,
      "no alarm may precede the step")
    assert(stepGot(firstAlarm)._1 <= 13L,
      "the step lands at day 11 — PH must catch it within ~2 days")
    assert(stepGot.last._6 === 1L,
      "the alarm must latch while the shifted level persists")
    // and the null contract, driver-side: a CONSTANT series never
    // excites either side (every term is exactly -delta, m rides its
    // own running min, ph stays pinned at 0)
    val flat = phTable((1L to 100L).map(d => (d, 10000L)))
    assert(flat.forall(r => r._4 === 0L && r._5 === 0L && r._6 === 0L),
      "PH excursion on a constant series — the null contract broke")
    spark.catalog.clearCache()
  }

  test("q267 modularity equals a driver fold over the same LPA partition; " +
      "degree identity holds; the functional discriminates a planted partition") {
    // the exact q_micro fold the engine plans, shared by both halves
    def modTable(und: Seq[(Long, Long)], lbl: Map[Long, Long])
        : Seq[(Long, Long, Long, Long, Long)] = {
      val m = und.length.toLong
      val deg = (und ++ und.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.length.toLong).toMap
      val ecM = und.filter { case (a, b) => lbl(a) == lbl(b) }
        .groupBy { case (a, _) => lbl(a) }.view.mapValues(_.length.toLong).toMap
      lbl.groupBy(_._2).toSeq.map { case (c, members) =>
        // .toSeq first: Map.keys is set-backed and .map would collapse
        // equal degree values before the sum (the house Set.map gotcha)
        val dc = members.keys.toSeq.map(v => deg.getOrElse(v, 0L)).sum
        val ec = ecM.getOrElse(c, 0L)
        val q = math.floor((ec.toDouble / m.toDouble
          - (dc.toDouble / (2.0 * m.toDouble)) * (dc.toDouble / (2.0 * m.toDouble)))
          * 1e6 + 0.5).toLong
        (c, members.size.toLong, ec, dc, q)
      }.sortBy(_._1)
    }
    // same graph + LPA as the q220 spec, to FINAL labels
    val docs = LlmQueries.linkGraphDocs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    val n = docs.length.toLong
    def tokHash(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val und = (for {
      (_, idx) <- docs
      j <- 1 to 3
      dst = tokHash(s"$idx#$j") % n
      if dst != idx
    } yield (math.min(idx, dst), math.max(idx, dst))).distinct.toSeq
    val nbrs = (und ++ und.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = docs.map { case (_, idx) => idx -> idx }.toMap
    (1 to 4).foreach { _ =>
      lbl = lbl.map { case (v, old) =>
        val counts = nbrs.getOrElse(v, Seq.empty[Long]).groupBy(lbl)
          .view.mapValues(_.length).toSeq
        if (counts.isEmpty) v -> old
        else {
          val mx = counts.map(_._2).max
          v -> counts.filter(_._2 == mx).map(_._1).min
        }
      }
    }
    val want = modTable(und, lbl)
    val wantTot = want.map(_._5).sum
    val got = LlmQueries.queries("q267_modularity")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)) === want,
      "per-community modularity table diverged from the sequential fold")
    assert(got.forall(r => r._6 === want.length.toLong && r._7 === wantTot),
      "community count / total diverged")
    // structural identities: every degree end is in exactly one
    // community, every intra edge counted once
    assert(got.map(_._4).sum === 2L * und.length, "sum d_c must equal 2m")
    assert(got.map(_._3).sum <= und.length.toLong, "sum e_c cannot exceed m")
    assert(got.map(_._2).sum === n, "communities must partition the vertices")
    // the honest corpus reading: the link graph is hash-random, so NO
    // partition scores well — |Q| must sit near 0 (a large |Q| here
    // would mean the fold or the graph derivation drifted)
    assert(math.abs(wantTot) < 100000L,
      s"|Q| = $wantTot on an Erdos-Renyi-like graph — structure appeared from nowhere")
    // discrimination, via the SAME fold proven equal to the engine
    // above: two 12-cliques joined by one bridge, true labels → Q ≈ ½;
    // the all-one-community partition on the same graph → Q = 0
    val cliques = (for {
      blk <- 0 to 1; i <- 0 until 12; j <- (i + 1) until 12
    } yield (blk * 12L + i, blk * 12L + j)) :+ (0L, 12L)
    val planted = (0L until 24L).map(v => v -> (if (v < 12L) 0L else 1L)).toMap
    val plantedQ = modTable(cliques, planted).map(_._5).sum
    val trivialQ = modTable(cliques, (0L until 24L).map(_ -> 0L).toMap).map(_._5).sum
    assert(plantedQ > 400000L,
      s"planted two-clique partition scored $plantedQ — the functional is blind")
    assert(trivialQ === 0L,
      "the one-community partition must score exactly 0 (e_c = m, d_c = 2m)")
    spark.catalog.clearCache()
  }

  test("q268 burstiness/memory equals a driver moment fold; Goh-Barabasi bounds hold; " +
      "a metronome series pins B = -1, Fano = 0 and the memory sentinel") {
    def fold(daily: Seq[(String, Long, Long)])
        : Seq[(String, Long, Long, Long, Long, Long, Long)] =
      daily.groupBy(_._1).toSeq.map { case (g, rows) =>
        val cs = rows.sortBy(_._2).map(_._3)
        val n = cs.length.toLong
        val sc = cs.sum; val sc2 = cs.map(c => c * c).sum
        val nD = n.toDouble
        val mu = sc.toDouble / nD
        val varPop = (nD * sc2.toDouble - sc.toDouble * sc.toDouble) / (nD * nD)
        val sigma = math.sqrt(varPop)
        val pairs = cs.zip(cs.drop(1))
        val k = pairs.length.toLong
        val mem =
          if (k == 0) -2000000L
          else {
            val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
            val sxx = pairs.map(p => p._1 * p._1).sum
            val syy = pairs.map(p => p._2 * p._2).sum
            val sxy = pairs.map(p => p._1 * p._2).sum
            val kD = k.toDouble
            val vx = kD * sxx.toDouble - sx.toDouble * sx.toDouble
            val vy = kD * syy.toDouble - sy.toDouble * sy.toDouble
            val num = kD * sxy.toDouble - sx.toDouble * sy.toDouble
            val den = math.sqrt(vx * vy)
            if (den > 0.0) math.floor(num / den * 1e6 + 0.5).toLong else -2000000L
          }
        (g, n, sc,
          math.floor((sigma - mu) / (sigma + mu) * 1e6 + 0.5).toLong,
          math.floor(varPop / mu * 1e6 + 0.5).toLong, mem, k)
      }.sortBy(_._1)
    def collectDaily(dir: String): Seq[(String, Long, Long)] =
      Tables.events(spark, dir)
        .groupBy(col("event_type").as("g"),
          expr("cast(cast(ts as long) div 86400 as bigint)").as("d"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    def runQ(dir: String) =
      graft.queries.ExtQueries.queries("q268_burstiness")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val want = fold(collectDaily(sfDir))
    val got = runQ(sfDir)
    assert(got === want, "burstiness table diverged from the sequential fold")
    // Goh-Barabasi ranges: B in [-1, 1], memory in [-1, 1] or sentinel,
    // Fano >= 0; and the corpus must excite the statistic (all five
    // types identical would be vacuous)
    assert(got.forall(r => r._4 >= -1000000L && r._4 <= 1000000L))
    assert(got.forall(r => r._5 >= 0L))
    assert(got.forall(r =>
      (r._6 >= -1000000L && r._6 <= 1000000L) || r._6 === -2000000L))
    assert(got.map(_._4).distinct.length > 1,
      "all types equally bursty — vacuous on this corpus")
    // metronome fixture through the ENGINE: one event per day, so the
    // daily-count series is constant — the definition's own limits:
    // sigma = 0 gives B = -1 and Fano = 0 EXACTLY, and the memory
    // denominator vanishes into the sentinel (not a NaN, not a crash)
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-burst-flat").toString
    import spark.implicits._
    (1L to 10L).toDF("day")
      .select((col("day") * 86400L).cast("timestamp").as("ts"),
        lit("flat").as("event_type"), lit(5.00).as("value"),
        col("day").as("event_id"), col("day").as("user_id"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmpDir/events.parquet")
    val flat = runQ(tmpDir)
    assert(flat === Seq(("flat", 10L, 10L, -1000000L, 0L, -2000000L, 9L)),
      "metronome series must pin B = -1, Fano = 0, memory sentinel")
    spark.catalog.clearCache()
  }

  test("q269 ADWIN cut equals a driver exhaustive-cut fold; a 4x step trips the " +
      "Hoeffding bound; a constant series and t=1 pin the null/sentinel contracts") {
    def fold(vs: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long, Long, Long, Long, Long)] = {
      val sorted = vs.sortBy(_._1)
      var alarmed = 0L
      sorted.zipWithIndex.map { case ((d, v), i) =>
        val t = i + 1L
        val pre = sorted.take(i + 1).map(_._2)
        val s = pre.sum
        val rng = pre.max - pre.min
        if (t == 1L) (d, t, v, -1L, -2000000L, -2000000L, 0L, alarmed)
        else {
          val best = (1L until t).map { n0 =>
            val s0 = pre.take(n0.toInt).sum
            val n1 = t - n0
            val dmu = math.abs(s0.toDouble / n0.toDouble
              - (s - s0).toDouble / n1.toDouble)
            val mH = n0.toDouble * n1.toDouble / (n0.toDouble + n1.toDouble)
            val eps = rng.toDouble *
              math.sqrt(math.log(4.0 * t.toDouble / 0.05) / (2.0 * mH))
            val dm = math.floor(dmu * 1e6 + 0.5).toLong
            val em = math.floor(eps * 1e6 + 0.5).toLong
            (dm - em, -n0, dm, em)
          }.max
          val det = if (best._1 > 0L) 1L else 0L
          alarmed = math.max(alarmed, det)
          (d, t, v, -best._2, best._3, best._4, det, alarmed)
        }
      }
    }
    def collectDaily(dir: String): Seq[(Long, Long)] =
      Tables.events(spark, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(expr("cast(cast(ts as long) div 86400 as bigint)").as("d"))
        .agg(sum(floor(round(col("value"), 2) * 100.0 + 0.5).cast("long")).as("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def runQ(dir: String) =
      graft.queries.ExtQueries.queries("q269_adwin_cut")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(runQ(sfDir) === fold(collectDaily(sfDir)),
      "ADWIN cut table diverged from the exhaustive-cut fold")
    // step fixture (the q266 shape): days 1-10 at 10000 cents, 11-20 at
    // 40000 — the best cut must land AT the step and trip the bound
    // (R = 30000, |dmu| = 30000 at n0 = 10, eps ≈ 25.8k < 30k at t = 20)
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-adwin-step").toString
    import spark.implicits._
    (1L to 20L).map(d => (d, if (d <= 10L) 100.00 else 400.00)).toDF("day", "value")
      .select((col("day") * 86400L).cast("timestamp").as("ts"),
        lit("purchase").as("event_type"), col("value"),
        col("day").as("event_id"), col("day").as("user_id"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmpDir/events.parquet")
    val stepGot = runQ(tmpDir)
    assert(stepGot === fold(collectDaily(tmpDir)),
      "ADWIN diverged from the fold on the step fixture")
    assert(stepGot.last._7 === 1L && stepGot.last._8 === 1L,
      "a 4x step must trip the Hoeffding cut by day 20")
    assert(stepGot.last._4 === 10L,
      "the best cut must land exactly at the changepoint (n0 = 10)")
    assert(stepGot.take(10).forall(_._7 === 0L),
      "no detection may precede the step")
    // null contract via the fold: a constant series has R = 0, so eps =
    // dmu = 0 and the strict > never fires at any prefix
    val flatAdwin = fold((1L to 50L).map(d => (d, 12345L)))
    assert(flatAdwin.forall(r => r._7 === 0L && r._8 === 0L),
      "Hoeffding cut fired on a constant series")
    assert(flatAdwin.head._5 === -2000000L && flatAdwin.head._4 === -1L,
      "t = 1 must pin the no-cut sentinels")
    spark.catalog.clearCache()
  }

  test("q270 Matryoshka recall equals a driver brute-force fold per prefix width; " +
      "full width reproduces truth exactly") {
    import java.math.{BigDecimal => JBD, MathContext}
    def r4(x: Double): JBD =
      new JBD(x, MathContext.DECIMAL64).setScale(4, java.math.RoundingMode.HALF_UP)
    val rows = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val panel = rows.filter(_._1 < 8L)
    def cos(a: Array[Double], b: Array[Double], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < d) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val dims = Seq(8, 16, 32, 64)
    def top3(d: Int): Map[Long, Seq[Long]] =
      panel.map { case (qid, qe) =>
        qid -> rows.filter(_._1 != qid)
          .map { case (v, e) => (v, r4(cos(e, qe, d))) }
          .sortBy { case (v, c) => (c.negate, v) }(
            Ordering.Tuple2(Ordering.ordered[JBD], Ordering.Long))
          .take(3).map(_._1).toSeq
      }.toMap
    val truth = top3(64)
    val want = dims.map { d =>
      val t = top3(d)
      val hits = panel.map { case (qid, _) =>
        t(qid).count(truth(qid).contains).toLong }.sum
      (d.toLong, panel.length.toLong, hits,
        hits * 1000000L / (3L * panel.length))
    }
    val got = LlmQueries.queries("q270_mrl_recall")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want, "recall curve diverged from the brute-force fold")
    // the built-in self check: full width must reproduce truth EXACTLY
    assert(got.last._1 === 64L && got.last._4 === 1000000L,
      "full-width retrieval must have recall exactly 1")
    assert(got.forall(r => r._3 <= 3L * r._2 && r._4 >= 0L && r._4 <= 1000000L))
    spark.catalog.clearCache()
  }

  test("q271 kNN label-noise: structural identities on the corpus; a planted " +
      "two-cluster fixture flags exactly the corrupted label") {
    val got = LlmQueries.queries("q271_knn_label_noise")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val nCorpus = Tables.embeddings(spark, sfDir).count()
    assert(got.map(_._2).sum === nCorpus, "per-class counts must partition the corpus")
    assert(got.forall(r => r._3 <= r._2 && r._4 <= r._3),
      "scored <= n and flagged <= scored")
    assert(got.forall(r =>
      (r._5 >= 0L && r._5 <= 1000000L) || r._5 === -2000000L))
    // labels here are RANDOM w.r.t. the random geometry, so high noise
    // rates are the honest reading — but the screen must not be a
    // constant function: it must score nearly everyone via the probes
    assert(got.map(_._3).sum > nCorpus * 9L / 10L,
      "LSH probes left >10% of the corpus unscored")
    // planted fixture through the ENGINE: two antipodal clusters with
    // tiny per-point jitter (same hyperplane signs within a cluster, so
    // every point's probe neighborhood IS its cluster), labels follow
    // clusters except ONE corrupted point in cluster A labeled 9 — the
    // screen must flag exactly that point
    val dim = 64
    def vec(sign: Double, i: Int): Array[Float] = {
      val a = Array.fill(dim)(0.0f)
      a(0) = (sign * 1.0).toFloat
      a(1) = (sign * 1e-4 * (i + 1)).toFloat
      a
    }
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-knn-plant").toString
    import spark.implicits._
    val rows =
      (0 until 30).map(i => (i.toLong, vec(1.0, i).toSeq,
        if (i == 7) 9 else 0)) ++
      (0 until 30).map(i => (100L + i, vec(-1.0, i).toSeq, 1))
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"),
        col("label").cast("int"))
      .write.mode("overwrite").parquet(s"$tmpDir/embeddings.parquet")
    val planted = LlmQueries.queries("q271_knn_label_noise")(spark, tmpDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(planted === Seq(
      (0L, 29L, 29L, 0L, 0L),       // clean cluster A: no flags
      (1L, 30L, 30L, 0L, 0L),       // clean cluster B: no flags
      (9L, 1L, 1L, 1L, 1000000L)),  // the corrupted point: flagged
      s"planted screen diverged: $planted")
    spark.catalog.clearCache()
  }
}

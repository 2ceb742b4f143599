package graft.llm

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

class LlmQueriesSpec extends SparkSpec {

  test("every LLM query runs and is non-degenerate at sf0.001") {
    for ((name, q) <- LlmQueries.queries) {
      val df = q(spark, sfDir)
      val n = df.count()
      // pair-producing queries may legitimately be small; per-doc ones must
      // cover every document
      if (Set("q37_neardup_minhash", "q57_embed_neardup", "q71_dedup_components",
          "q75_contamination", "q90_simhash_pairs")(name)) assert(n >= 0)
      else assert(n > 0, s"$name returned no rows")
    }
  }

  test("near-dup pairs have estimated jaccard close to exact (MinHash accuracy)") {
    val pairs = LlmQueries.queries("q37_neardup_minhash")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(pairs.nonEmpty, "expected planted near-dups at sf0.01")
    pairs.foreach { r =>
      val est = r.getDouble(r.fieldIndex("est_jaccard"))
      val exact = r.getDouble(r.fieldIndex("jaccard"))
      assert(math.abs(est - exact) < 0.45,
        s"minhash estimate $est too far from exact $exact")
    }
    val meanErr = pairs.map(r =>
      math.abs(r.getDouble(2) - r.getDouble(3))).sum / pairs.length
    assert(meanErr < 0.15, s"mean |est-exact| = $meanErr")
  }

  test("exact dedup keeps one representative per distinct text") {
    val out = LlmQueries.queries("q30_dedup_exact")(spark, sfDir)
    val docs = graft.Tables.documents(spark, sfDir)
    assert(out.count() === docs.select("text").distinct().count())
    assert(out.agg(sum("n_copies")).head().getLong(0) === docs.count())
  }

  test("ANN results are a subset of brute-force scores (same cosine values)") {
    val brute = LlmQueries.queries("q38_cosine_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ann = LlmQueries.queries("q39_ann_lsh")(spark, sfDir).collect()
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      val cos = r.getDouble(3)
      // if the pair also appears in brute-force top-k, the cosine agrees
      brute.get(key).foreach(b => assert(math.abs(b - cos) < 1e-9))
      assert(cos >= -1.0001 && cos <= 1.0001)
    }
  }

  test("simhash of near-identical docs differs in few bits") {
    val sims = LlmQueries.queries("q36_simhash")(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = LlmQueries.queries("q37_neardup_minhash")(spark, "/root/testdata/sf0.01")
      .filter(col("jaccard") >= 0.8).collect()
    assert(pairs.nonEmpty)
    val dists = pairs.map { r =>
      java.lang.Long.bitCount(sims(r.getLong(0)) ^ sims(r.getLong(1)))
    }
    // 16-bit simhash: strong near-dups should average well under half the bits
    assert(dists.sum.toDouble / dists.length < 5.0,
      s"mean hamming ${dists.sum.toDouble / dists.length} too high for jaccard>=0.8 pairs")
  }

  test("contamination flags only high-containment train/eval pairs") {
    val out = LlmQueries.queries("q75_contamination")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.nonEmpty, "expected planted near-dups to cross the eval boundary at sf0.01")
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("train_id")) % 10 !== 0L)
      assert(r.getLong(r.fieldIndex("eval_id")) % 10 === 0L)
      assert(r.getDouble(r.fieldIndex("containment")) >= 0.5)
    }
  }

  test("sequence packing: packs are contiguous per source and never exceed the window") {
    val out = LlmQueries.queries("q77_pack_sequences")(spark, sfDir).collect()
    val docs = graft.Tables.documents(spark, sfDir).count()
    assert(out.length.toLong === docs, "every document must be packed exactly once")
    out.foreach { r =>
      val off = r.getLong(r.fieldIndex("offset_in_pack"))
      assert(off >= 0 && off < 256, s"offset $off outside the 256-token window")
    }
    // within a source, pack ids are non-decreasing in doc order
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      val packs = rows.sortBy(_.getLong(0)).map(_.getLong(3))
      assert(packs.zip(packs.drop(1)).forall { case (a, b) => a <= b },
        s"pack ids not monotone within source $src")
    }
  }

  test("embedding centroids cover every (label, dim) cell and bound the data") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val nLabels = emb.select("label").distinct().count()
    val out = LlmQueries.queries("q78_emb_centroids")(spark, sfDir)
    assert(out.count() === nLabels * 64)
    // centroid of each cell lies within the per-cell min/max of the data
    assert(out.filter(col("centroid") < -10 || col("centroid") > 10).count() === 0)
    assert(out.filter(col("spread") < 0).count() === 0)
  }

  test("repetition: dup_frac and top_frac are consistent per document") {
    val out = LlmQueries.queries("q76_repetition")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nBg = r.getInt(r.fieldIndex("n_bg"))
      val topCnt = r.getLong(r.fieldIndex("top_cnt"))
      val nDist = r.getLong(r.fieldIndex("n_distinct"))
      assert(topCnt >= 1 && topCnt <= nBg)
      assert(nDist >= 1 && nDist <= nBg)
      val topFrac = r.getDouble(r.fieldIndex("top_frac"))
      val dupFrac = r.getDouble(r.fieldIndex("dup_frac"))
      assert(topFrac > 0 && topFrac <= 1.0)
      assert(dupFrac >= 0 && dupFrac < 1.0)
    }
  }

  test("DSIR: target-language docs score higher and selection keeps exactly the top quarter") {
    val out = LlmQueries.queries("q132_dsir_select")(spark, sfDir).cache()
    val n = out.count()
    // the selection size is exactly ceil(n/4), taken from the top ranks
    val k = math.ceil(n * 0.25).toLong
    assert(out.filter(col("selected") === 1).count() === k)
    assert(out.filter(col("selected") === 1).agg(max("rnk")).head.getLong(0) === k)
    // the importance weight must actually separate target from non-target:
    // en docs (the fit's target slice) average strictly higher log_w
    val byLang = out.join(graft.Tables.documents(spark, sfDir).select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en").agg(avg("log_w").as("w"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false) + 0.1,
      s"DSIR weights do not separate target from raw: $byLang")
    out.unpersist()
  }

  test("CCNet perplexity buckets: per-language thirds, positive cross-entropy") {
    val out = LlmQueries.queries("q133_ngram_lm_ppl")(spark, sfDir).cache()
    // every language is cut into thirds that differ by at most one doc
    val sizes = out.groupBy("lang", "ppl_bucket").count()
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)))
    sizes.foreach { case (lang, cs) =>
      assert(cs.length === 3, s"$lang missing a bucket: ${cs.toSeq}")
      assert(cs.max - cs.min <= 1, s"$lang thirds uneven: ${cs.toSeq}")
    }
    // a smoothed LM assigns every bigram probability < 1 → ce strictly > 0
    assert(out.filter(col("n_bigrams") > 0 && col("ce") <= 0.0).count() === 0)
    // head docs are at least as fluent as tail docs within each language
    val hm = out.groupBy("lang").pivot("ppl_bucket", Seq("head", "tail"))
      .agg(avg("ce")).collect()
    hm.foreach { r =>
      assert(r.getDouble(1) < r.getDouble(2),
        s"${r.getString(0)}: head mean ce not below tail")
    }
    out.unpersist()
  }

  test("PII scrub: masks every class, leaves clean text alone, and is idempotent") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b+c@x.co and a.b+c@x.co from 10.20.30.40 call 555-867-5309"),
      (2L, "no identifiers here just words and the number 42"),
      (3L, "")).toDF("doc_id", "text")
    val out = df.select($"doc_id",
      TextOps.piiCount($"text", TextOps.PiiEmail).as("ne"),
      TextOps.piiCount($"text", TextOps.PiiIpv4).as("ni"),
      TextOps.piiCount($"text", TextOps.PiiPhone).as("np"),
      TextOps.scrubPii($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("ne") == 2 && out(1L).getAs[Long]("ni") == 1 &&
      out(1L).getAs[Long]("np") == 1)
    assert(out(1L).getAs[String]("s") ===
      "mail <EMAIL> and <EMAIL> from <IP> call <PHONE>")
    assert(out(2L).getAs[String]("s") === "no identifiers here just words and the number 42")
    assert(out(3L).getAs[String]("s") === "")
    // idempotent: a scrubbed corpus re-entering the pipeline is unchanged
    val twice = df.select($"doc_id", TextOps.scrubPii(TextOps.scrubPii($"text")).as("s2"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("s2")).toMap
    assert(twice(1L) === out(1L).getAs[String]("s"))
    // and carries zero remaining matches
    val resid = df.select(
      (TextOps.piiCount(TextOps.scrubPii($"text"), TextOps.PiiEmail) +
        TextOps.piiCount(TextOps.scrubPii($"text"), TextOps.PiiIpv4) +
        TextOps.piiCount(TextOps.scrubPii($"text"), TextOps.PiiPhone)).as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(resid === 0L)
  }

  test("curation pipeline v2: every stage binds and the budget holds per source") {
    val out = LlmQueries.queries("q137_curation_pipeline")(spark, sfDir).cache()
    val n = out.count()
    assert(n > 0)
    // the repetition gate alone keeps more than the full pipeline —
    // dedup and the token budget must each remove something
    val repKept = LlmQueries.queries("q131_repetition_rules")(spark, sfDir)
      .filter(col("rep_pass") === 1).count()
    assert(n < repKept, s"pipeline kept $n of $repKept repetition-passing docs — later stages did not bind")
    // budget respected and cumulative within each source
    assert(out.filter(col("cum_tokens") > 800L).count() === 0)
    assert(out.filter(col("cum_tokens") < col("n_tokens")).count() === 0)
    out.unpersist()
  }

  test("shard assignment: two-level prefix sum equals the sequential single-window spec") {
    import spark.implicits._
    val out = LlmQueries.queries("q139_shard_assign")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // sequential reference: one global cumsum in plain Scala
    val ordered = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n"),
        TextOps.rollingHash(col("doc_id").cast("string")).as("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1))
    var cum = 0L
    val want = ordered.map { case (id, n, _) =>
      val shard = cum / 400L; cum += n; (id, n, shard)
    }.sortBy(_._1)
    assert(out.toSeq === want.toSeq)
    // shards start at 0 and are contiguous
    val shards = out.map(_._3).distinct.sorted
    assert(shards.head === 0L && shards === (0L until shards.length).toArray)
    spark.sharedState.cacheManager.clearCache()
  }

  test("PSI drift: full grid, non-negative terms, and zero drift for an undrifted slice") {
    val out = LlmQueries.queries("q140_psi_drift")(spark, sfDir).collect()
    val nSources = graft.Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(out.length === nSources * 8, "grid must cover every (source, bin) cell")
    // (p-q)·ln(p/q) ≥ 0 mathematically; floor keeps it ≥ 0
    assert(out.forall(_.getLong(4) >= 0L))
    // some source must genuinely drift from the pooled mixture
    val bySource = out.groupBy(_.getString(0)).map { case (s, rs) =>
      s -> rs.map(_.getLong(4)).sum }
    assert(bySource.values.max > 0L, "no source drifted at all — monitor is vacuous")
    spark.sharedState.cacheManager.clearCache()
  }

  test("leakage-safe split: near-dup pairs never straddle the train/test boundary") {
    val sf = "/root/testdata/sf0.01" // sf with planted near-dups
    val out = LlmQueries.queries("q141_leakage_split")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size === graft.Tables.documents(spark, sf).count())
    // the leakage property against the detector itself: both endpoints
    // of every verified near-dup pair share cluster AND split
    val pairs = LlmQueries.queries("q37_neardup_minhash")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "expected planted near-dups at sf0.01")
    pairs.foreach { case (a, b) =>
      assert(out(a)._1 === out(b)._1, s"pair ($a,$b) split across clusters")
      assert(out(a)._2 === out(b)._2, s"pair ($a,$b) LEAKS across the split")
    }
    // hash cut lands near 80/20 at the cluster grain
    val frac = out.values.count(_._2 == "train").toDouble / out.size
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac far from 0.8")
    spark.sharedState.cacheManager.clearCache()
  }

  test("robust stats: median/MAD bounded by the data and outlier-resistant vs the mean") {
    val out = LlmQueries.queries("q142_robust_stats")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val ref = graft.Tables.documents(spark, sfDir)
      .select(col("source"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .groupBy("source").agg(min("n").as("lo"), max("n").as("hi"),
        count(lit(1)).as("c"), avg("n").as("mean"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.keySet === ref.keySet)
    for ((s, (nDocs, med, mad)) <- out) {
      val (lo, hi, c, _) = ref(s)
      assert(nDocs === c)
      assert(med >= lo && med <= hi, s"$s median $med outside [$lo,$hi]")
      assert(mad >= 0.0 && mad <= (hi - lo), s"$s MAD $mad out of range")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("window ranks: quartiles balanced, pct_rank/cume_dist hit their endpoints") {
    val rows = LlmQueries.queries("q143_window_ranks")(spark, sfDir).collect()
    for ((_, rs) <- rows.groupBy(_.getString(0))) {
      val quartCounts = rs.groupBy(_.getLong(3)).view.mapValues(_.length).toMap
      assert(quartCounts.keySet.subsetOf(Set(1L, 2L, 3L, 4L)))
      assert(quartCounts.values.max - quartCounts.values.min <= 1,
        s"ntile buckets unbalanced: $quartCounts")
      val sorted = rs.sortBy(r => (r.getLong(2), r.getLong(1)))
      assert(sorted.head.getDouble(4) === 0.0, "first pct_rank must be 0")
      assert(sorted.last.getDouble(4) === 1.0, "last pct_rank must be 1")
      assert(sorted.last.getDouble(5) === 1.0, "last cume_dist must be 1")
      // strict total order (doc_id tiebreak) → cume_dist strictly increases
      assert(sorted.map(_.getDouble(5)).toSeq === sorted.map(_.getDouble(5)).sorted.toSeq)
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("source overlap: unordered pairs, positive mass, bounds the q129 pair signal") {
    val out = LlmQueries.queries("q144_source_overlap")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty)
    assert(out.forall { case (a, b, n) => a <= b && n > 0L })
    // q129 keeps only doc pairs sharing >= 2 windows; q144 counts every
    // shared-window instance, so its total mass dominates q129's
    val q129Mass = LlmQueries.queries("q129_substring_dup")(spark, sfDir)
      .agg(sum("n_shared")).head().getLong(0)
    assert(out.map(_._3).sum >= q129Mass)
    spark.sharedState.cacheManager.clearCache()
  }

  test("version diff: every doc takes exactly the status its id-derived edit implies") {
    val ids = graft.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = LlmQueries.queries("q145_version_diff")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = ids.map { id =>
      id -> (if (id % 11 == 0) "removed"
             else if (id % 7 == 0) "changed"
             else "unchanged")
    }.toMap ++ ids.filter(_ % 13 == 0).map(id => (id + 100000L) -> "added").toMap
    assert(got === want)
    // all four statuses genuinely occur
    assert(got.values.toSet === Set("added", "removed", "changed", "unchanged"))
    spark.sharedState.cacheManager.clearCache()
  }

  test("corpus pipeline output is quality-gated, deduped, decontaminated, and packed") {
    val sf = "/root/testdata/sf0.01"
    val out = LlmQueries.queries("q85_corpus_pipeline")(spark, sf).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every survivor: train side, quality above the gate
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("doc_id")) % 10 !== 0L)
      assert(r.getDouble(r.fieldIndex("quality")) >= 0.55)
    }
    // no surviving doc is on the contamination quarantine list
    val flagged = LlmQueries.queries("q75_contamination")(spark, sf)
      .select(col("train_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => !flagged(r.getLong(0))), "quarantined doc survived the pipeline")
    // no duplicate texts survive (dedup kept one representative per content)
    val docs = graft.Tables.documents(spark, sf)
    val survivors = out.select("doc_id")
    val nTexts = docs.join(survivors, "doc_id").select("text").distinct().count()
    assert(nTexts === rows.length.toLong, "duplicate texts survived dedup")
    out.unpersist()
  }

  test("rare-shingle index: the absolute df cap drops stop-shingles the relative cap keeps") {
    import spark.implicits._
    // 100 docs; bigram "hot stop" in 3 docs (passes the relative cap:
    // 3·20 ≤ 100) and "rare pair" in 2. With absCap=2 the df=3 shingle
    // must be dropped — the stop-shingle blow-up guard — while df=2 stays.
    val docs = (0 until 100).map { i =>
      val extra =
        if (i < 3) " hot stop"
        else if (i < 5) " rare pair"
        else ""
      (i.toLong, s"filler$i text$i$extra")
    }.toDF("doc_id", "text")
    val hotHash = "hot stop".foldLeft(0L)((a, c) => (a * 31 + c.toLong) % TextOps.HashModulus)
    val rareHash = "rare pair".foldLeft(0L)((a, c) => (a * 31 + c.toLong) % TextOps.HashModulus)
    val capped = LlmQueries.rareShingleIndex(docs, nDocs = 100, absCap = 2)
      .select("h").distinct().collect().map(_.getLong(0)).toSet
    assert(!capped(hotHash), "absolute cap failed to drop the df=3 stop-shingle")
    assert(capped(rareHash), "df=2 shingle should survive both caps")
    // relative-only behaviour unchanged when the absolute cap is loose
    val loose = LlmQueries.rareShingleIndex(docs, nDocs = 100, absCap = 1000)
      .select("h").distinct().collect().map(_.getLong(0)).toSet
    assert(loose(hotHash) && loose(rareHash))
  }

  test("query-scoped caches: the runner's clearCache releases every storage block") {
    // q37 caches sigs+cand (its result lineage reads them, so it cannot
    // unpersist in-closure); after the runner contract runs, nothing may
    // linger — this is what keeps an 85-query session's storage flat
    spark.catalog.clearCache() // isolate from other suites
    LlmQueries.queries("q37_neardup_minhash")(spark, sfDir).count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "expected q37's query-scoped caches to be live after its action")
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "clearCache left storage blocks behind")
    // q65 releases in-closure (result is built from driver scalars)
    LlmQueries.queries("q65_ivf_invariants")(spark, sfDir).count()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "q65 leaked its res/index caches despite in-closure unpersist")
  }

  test("TextOps.shingleHashes composes tokens -> bigrams -> rolling hash") {
    import spark.implicits._
    val out = Seq("the quick brown fox", "x").toDF("text")
      .select(TextOps.shingleHashes(col("text")).as("h"))
      .collect()
    val hashes = out(0).getSeq[Long](0)
    val expected = Seq("the quick", "quick brown", "brown fox").map { s =>
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % TextOps.HashModulus)
    }
    assert(hashes === expected)
    assert(out(1).getSeq[Long](0).isEmpty, "single-token doc has no bigrams")
    // total on arbitrary input: empty / whitespace-only text must yield
    // an empty array, not crash (the streaming-gate contract)
    val degenerate = Seq("", "   ", "\t\n").toDF("text")
      .select(TextOps.shingleHashes(col("text")).as("h")).collect()
    degenerate.foreach(r => assert(r.getSeq[Long](0).isEmpty))
  }

  test("hash sampling is reproducible and lands near the 20% target") {
    val sf = "/root/testdata/sf0.01"
    val a = LlmQueries.queries("q86_hash_sample")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = LlmQueries.queries("q86_hash_sample")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b, "hash sample changed between runs")
    val total = graft.Tables.documents(spark, sf).count().toDouble
    val rate = a.size / total
    assert(rate > 0.12 && rate < 0.28, s"sample rate $rate far from 20%")
  }

  test("doc-embedding join pairs every doc with a positive-norm vector") {
    val out = LlmQueries.queries("q87_doc_emb_join")(spark, sfDir)
    assert(out.count() === graft.Tables.embeddings(spark, sfDir).count())
    assert(out.filter(col("l2_norm") <= 0).count() === 0)
    assert(out.filter(col("quality") < 0 || col("quality") > 1).count() === 0)
  }

  test("multimodal stub decodes deterministic features from the binary payload") {
    val out = LlmQueries.queries("q40_multimodal_stub")(spark, sfDir)
    val joined = out.join(graft.Tables.documents(spark, sfDir), "doc_id")
    assert(joined.filter(col("n_bytes") =!= col("n_chars")).count() === 0)
    assert(joined.filter(col("mean_byte") < 32 || col("mean_byte") > 127).count() === 0)
  }

  test("int8 quantization: codes bounded, reconstruction inside the half-step bound") {
    val out = LlmQueries.queries("q95_quantize_embeddings")(spark, sfDir)
    assert(out.count() === graft.Tables.embeddings(spark, sfDir).count())
    // |q_i| ≤ 127 by construction (max-abs symmetric quantizer)
    assert(out.filter(col("q_max_abs") > 127).count() === 0)
    // max reconstruction error ≤ scale/254 (half a quantization step):
    // err_vs_bound is err normalized by that bound, so ≤ 1 (+ fp slack)
    assert(out.filter(col("err_vs_bound") > 1.0001).count() === 0)
    // the quantizer actually uses the range: some vector hits ±127
    assert(out.filter(col("q_max_abs") === 127).count() > 0)
  }

  test("vocab coverage: contiguous ranks, monotone coverage, full-vocab coverage = 1") {
    val rows = LlmQueries.queries("q147_vocab_coverage")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // ranks are 1..n contiguous in output order
    assert(rows.map(_._1).toSeq === (1L to rows.length.toLong))
    // frequencies non-increasing under the rank order
    assert(rows.sliding(2).forall { case Array(a, b) => a._2 >= b._2; case _ => true })
    // cumulative coverage strictly increasing, bounded by 1
    assert(rows.sliding(2).forall { case Array(a, b) => a._3 < b._3; case _ => true })
    assert(rows.last._3 <= 1.0)
    // the synthetic corpus vocabulary is smaller than K, so the last
    // row covers the whole stream (coverage closes at exactly 1.0)
    assert(rows.last._3 === 1.0)
  }

  test("cluster sizes: mass accounting closes against the corpus and q141's clusters") {
    val rows = LlmQueries.queries("q148_cluster_sizes")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val corpus = graft.Tables.documents(spark, sfDir).count()
    // every doc is in exactly one cluster
    assert(rows.map(_._3).sum === corpus)
    // removable = docs minus one canonical per cluster, per size row
    assert(rows.forall { case (_, nc, nd, nr) => nr === nd - nc })
    // the same clusters q141 assigns: per-size doc mass must agree
    val q141Sizes = LlmQueries.queries("q141_leakage_split")(spark, sfDir)
      .groupBy(col("cluster")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(t => t._1 -> t._2).toMap === q141Sizes)
  }

  test("gate funnel: monotone stages and agreement with the per-doc gate queries") {
    val rows = LlmQueries.queries("q149_gate_funnel")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // funnel stages can only narrow
    assert(rows.forall { case (_, total, gop, rep, gate, uniq) =>
      gop <= total && rep <= total && gate <= math.min(gop, rep) && uniq <= gate
    })
    // totals agree with the per-doc gate queries' own pass counts
    val gopherPassed = LlmQueries.queries("q127_gopher_rules")(spark, sfDir)
      .filter(col("gopher_pass") === 1).count()
    val repPassed = LlmQueries.queries("q131_repetition_rules")(spark, sfDir)
      .filter(col("rep_pass") === 1).count()
    assert(rows.map(_._3).sum === gopherPassed)
    assert(rows.map(_._4).sum === repPassed)
    // the corpus has enough structure that every stage binds somewhere
    assert(rows.map(_._2).sum > rows.map(_._5).sum, "the composed gate never rejected anything")
  }

  test("embed prune: exact 10% per label, pruned strictly dominate kept distances") {
    val rows = LlmQueries.queries("q150_embed_prune")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    val byLabel = rows.groupBy(_._2)
    byLabel.foreach { case (label, vs) =>
      val expected = math.max(1L, vs.length * 10L / 100L)
      assert(vs.count(_._4 == 1).toLong === expected,
        s"label $label pruned ${vs.count(_._4 == 1)} of ${vs.length}, expected $expected")
      val prunedMin = vs.filter(_._4 == 1).map(_._3).min
      val keptMax = if (vs.exists(_._4 == 0)) vs.filter(_._4 == 0).map(_._3).max else Long.MinValue
      // ties broken by vec_id can place equal distances on both sides;
      // distances themselves must never INVERT across the cut
      assert(prunedMin >= keptMax,
        s"label $label kept a vector farther than a pruned one")
    }
    assert(rows.forall(_._3 >= 0L))
  }

  test("pretokenize: hand-computed boundaries; fertility exceeds 1 under the mixed tail") {
    import spark.implicits._
    // the same dialect-intersection pattern the query embeds
    val re = " ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"
    val got = Seq("v7.25 don't stop!! a1b2 --ok").toDF("text")
      .select(regexp_extract_all(col("text"), lit(re), lit(0)))
      .head().getSeq[String](0)
    assert(got === Seq("v", "7", ".", "25", " don", "'", "t", " stop", "!!",
      " a", "1", "b", "2", " --", "ok"))
    // corpus-level: a pretoken never spans whitespace, so every doc has
    // n_pretok >= n_ws; the appended tail guarantees strict excess
    val rows = LlmQueries.queries("q151_pretokenize")(spark, sfDir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.forall { case (np, nws, f) => np > nws && f > 1.0 })
  }

  test("hybrid RRF: fused scores close from the ranks; both rankers contribute") {
    val rows = LlmQueries.queries("q152_hybrid_rrf")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 20)
    def term(r: Long) = if (r == 0L) 0L else 1000000L / (60L + r)
    assert(rows.forall { case (_, rl, rv, rrf) => rrf === term(rl) + term(rv) })
    // output is ordered by fused score
    assert(rows.sliding(2).forall { case Array(a, b) => a._4 >= b._4; case _ => true })
    // fusion is real: at least one doc is ranked by both lists, and the
    // two rankers disagree somewhere (otherwise the fusion is vacuous)
    assert(rows.exists { case (_, rl, rv, _) => rl > 0 && rv > 0 })
    assert(rows.exists { case (_, rl, rv, _) => rl != rv })
  }
}

package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** LLM-training-data pipeline operators over the `documents` and
  * `embeddings` testdata tables: deduplication (exact, MinHash+LSH,
  * SimHash, n-gram Jaccard), similarity search (brute-force cosine
  * top-k + LSH-bucketed ANN), text analysis (tokenization, stats,
  * language-ID heuristic, quality score, fingerprinting) and multimodal
  * binary-column plumbing.
  *
  * Everything except the similarity internals is ORACLE-CHECKED: the
  * hashes (character-level rolling hash, MinHash permutations, SimHash
  * bits, LSH hyperplane signs) are pure integer arithmetic expressed
  * identically in the Spark Column API and in generated DuckDB SQL, so
  * even the "custom" sketch operators get exact hash-match verification.
  *
  * Scale design: every operator is a single scan + a shuffle keyed on a
  * bounded-cardinality key (hash/band/bucket). Near-dup candidate
  * generation is LSH-banded — candidate pairs come from an equi-join on
  * (band_id, band_key), NEVER an all-pairs product; exact Jaccard is
  * computed only on candidates. ANN probes only the query's LSH bucket.
  */
object LlmQueries {
  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------ constants
  private val P = 1000000007L // rolling-hash / permutation modulus
  private val NumSig = 16     // MinHash signature length
  private val NearDupTheta = 0.4 // exact-Jaccard gate for q37 near-dup
  /** LSH bands, DERIVED from the verify threshold via the S-curve rule
    * ([[graft.functions.MinHashParams.planBands]]): the steepest-rise
    * point sits closest below θ=0.4 at 8 bands × 2 rows for a 16-long
    * signature — the banding this query always used, now computed from
    * the threshold it serves instead of asserted next to it. */
  private val NumBands = graft.functions.MinHashParams.planBands(NumSig, NearDupTheta)._1
  private val SimBits = 16    // SimHash width
  /** Round bound for the q208 greedy-MIS dedup — the SAME number unrolls
    * in the DuckDB twin, so the Spark side throwing past it can never
    * silently disagree with an oracle that stopped iterating. */
  private val MisRounds = 12

  /** Absolute document-frequency ceiling for the contamination sweep's
    * rare-shingle index. The RELATIVE cap (df ≤ 5% of corpus) is the
    * noise gate, but alone it GROWS with the corpus: a shingle at the
    * cap contributes ~(N/20)·(N/200) train×eval join rows — quadratic
    * at 100×. The absolute cap bounds any single shingle's join fan-out
    * at df² ≈ 10¹⁰·(eval fraction) REGARDLESS of corpus size, which is
    * what a production sweep pins. At the test SFs the relative cap is
    * the binding one (5% of ≤5000 docs ≪ 100k), so results are
    * unchanged — the constant exists for the 100 TB regime. */
  val AbsDfCap = 100000L

  /** MinHash permutation params — shared with the native
    * [[graft.functions.MinHashSigsExpr]] so Spark and the generated
    * oracle SQL use identical constants. */
  private val minhashAB: IndexedSeq[(Long, Long)] = graft.functions.MinHashParams.ab

  // ------------------------------------------- shared Spark-side builders
  /** Half-up 4dp rounding as floor arithmetic: integer-ratio outputs
    * (jaccard, token ratios) can land EXACTLY on round()'s half-way
    * points, where Spark (decimal-string HALF_UP) and DuckDB (binary)
    * disagree; floor of identical doubles never does. */
  private def fpRound4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0
  private def fpRound4Sql(e: String): String = s"floor(($e) * 10000.0 + 0.5) / 10000.0"

  /** Whitespace tokens, empties dropped (public form: [[TextOps.tokens]]). */
  private def toksCol(text: Column): Column = TextOps.tokens(text)

  /** Character-level rolling hash of a token: fold (h·31 + byte) mod P —
    * the native codegen'd [[graft.functions.RollingHash]]; matches the
    * generated DuckDB `list_reduce` ord() fold exactly on ASCII text. */
  private def tokHash(t: Column): Column = TextOps.rollingHash(t)

  /** Word-bigram shingles "w_i w_{i+1}" ([[TextOps.bigrams]]). */
  private def bigramsCol(toks: Column): Column = TextOps.bigrams(toks)

  /** Fused native expression ([[graft.functions.CosineSimilarity]]):
    * one pass, no intermediate arrays, codegen'd. */
  private def cosine(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  // ----------------------------------------- shared DuckDB SQL fragments
  /** DuckDB: whitespace tokens, empties dropped. */
  private val duckToks = raw"""list_filter(string_split_regex(text, '\s+'), t -> t <> '')"""
  /** DuckDB rolling hash of token expression `t` (matches [[tokHash]]). */
  private[graft] def duckTokHash(t: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length($t)+1), " +
      s"i -> ord(substr($t, i, 1))::BIGINT)), (a, b) -> (a * 31 + b) % $P)"
  private val duckBigrams =
    "list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])"
  /** DuckDB form of [[TextOps.quality]] over a `tk` token-list column. */
  private val duckQuality: String = fpRound4Sql(
    "least(1.0, len(tk) / 100.0) * 0.5 + (len(list_distinct(tk))::DOUBLE / len(tk)) * 0.5")
  /** Shared chunk CTE (`chunks(doc_id, chunk_idx, n_tokens,
    * chunk_tokens, chunk_hash)`) for q117/q120 — mirrors
    * [[chunkFrame]] exactly (64-token windows, stride 48,
    * covered-trailing-window dropped). */
  private lazy val duckChunksCTE: String =
    s"""WITH toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
       |d AS (SELECT doc_id, tk, len(tk) AS n_tokens FROM toks WHERE len(tk) >= 1),
       |c AS (SELECT doc_id, n_tokens,
       |    list_transform(
       |      list_filter(range(1, n_tokens + 1, 48),
       |        st -> st = 1 OR st - 48 + 63 < n_tokens),
       |      st -> struct_pack(
       |        chunk_tokens := least(64, n_tokens - st + 1),
       |        chunk_hash := ${duckTokHash("array_to_string(tk[st:st+63], ' ')")})) AS cs
       |  FROM d),
       |chunks AS (SELECT doc_id, generate_subscripts(cs, 1) - 1 AS chunk_idx, n_tokens,
       |  CAST(unnest(cs).chunk_tokens AS INTEGER) AS chunk_tokens,
       |  unnest(cs).chunk_hash AS chunk_hash FROM c)""".stripMargin

  /** Shared Gopher-A1.2 repetition CTE chain for q131/q137: reads
    * `srcRel(doc_id, text)` and ends in `rep_stats(doc_id, <4dp stat
    * columns>)` — the relational recomputation of the sorted-array
    * run-length stats (unnest grams → per-(doc,gram) counts → window
    * max for the top gram with ties-on-count → longest-gram, so the
    * fraction is determined; sum((c-1)·glen) for duplicated chars). */
  private def duckRepetitionCTEs(srcRel: String): String = {
    val allNs = (TextOps.TopNgramMax.keys ++ TextOps.DupNgramMax.keys).toSeq.sorted
    val gramCtes = allNs.map { n =>
      s"""rg$n AS (SELECT doc_id, unnest(list_transform(
         |    range(1, greatest(len(tk) - ${n - 1}, 0) + 1),
         |    i -> array_to_string(tk[i:i+${n - 1}], ' '))) AS gram FROM rep_toks),
         |rc$n AS (SELECT doc_id, count(*) AS c, length(gram) - ${n - 1} AS glen
         |        FROM rg$n GROUP BY doc_id, gram),
         |rt$n AS (SELECT doc_id, max(c) AS mc,
         |          max(CASE WHEN c = mcw THEN glen END) AS bl,
         |          sum((c - 1) * glen) AS dupch
         |        FROM (SELECT *, max(c) OVER (PARTITION BY doc_id) AS mcw FROM rc$n) x
         |        GROUP BY doc_id)""".stripMargin
    }.mkString(",\n")
    def fracSql(num: String): String =
      fpRound4Sql(s"CASE WHEN totchars > 0 THEN COALESCE($num, 0)::DOUBLE / totchars ELSE 0.0 END")
    val topStats = TextOps.TopNgramMax.keys.toSeq.sorted.map { n =>
      s"    ${fracSql(s"rt$n.mc * rt$n.bl")} AS top_${n}gram_frac"
    }
    val dupStats = TextOps.DupNgramMax.keys.toSeq.sorted.map { n =>
      s"    ${fracSql(s"rt$n.dupch")} AS dup_${n}gram_frac"
    }
    val joins = allNs.map(n => s"  LEFT JOIN rt$n ON rt$n.doc_id = rep_toks.doc_id").mkString("\n")
    s"""rep_toks AS (
       |  SELECT doc_id, $duckToks AS tk,
       |    list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS lines,
       |    COALESCE(list_sum(list_transform($duckToks, t -> length(t))), 0) AS totchars
       |  FROM $srcRel
       |),
       |$gramCtes,
       |rep_stats AS (
       |  SELECT rep_toks.doc_id,
       |    ${fpRound4Sql("CASE WHEN len(lines) > 0 THEN 1.0 - len(list_distinct(lines))::DOUBLE / len(lines) ELSE 0.0 END")} AS dup_line_frac,
       |    ${fpRound4Sql("CASE WHEN COALESCE(list_sum(list_transform(lines, l -> length(l))), 0) > 0 THEN 1.0 - list_sum(list_transform(list_distinct(lines), l -> length(l)))::DOUBLE / list_sum(list_transform(lines, l -> length(l))) ELSE 0.0 END")} AS dup_line_char_frac,
       |${(topStats ++ dupStats).mkString(",\n")}
       |  FROM rep_toks
       |$joins
       |)""".stripMargin
  }

  /** The rep_pass conjunction as a WHERE condition over `rep_stats`
    * columns — thresholds from the same [[TextOps]] maps the Spark
    * flags use, evaluated on the 4dp-rounded stats like the flags. */
  /** Shared Gopher-A1.1 CTE chain for q127/q149: reads
    * `srcRel(doc_id, text)` and ends in `gop(doc_id, <stats>, <flags>,
    * gopher_pass)` — the relational recomputation of
    * [[TextOps.gopherRules]], generated from the same thresholds. */
  private def duckGopherCTEs(srcRel: String): String = {
    val stops = TextOps.GopherStops.map(s => s"'$s'").mkString(", ")
    s"""gbase AS (
       |  SELECT doc_id,
       |    $duckToks AS tk,
       |    list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS lines
       |  FROM $srcRel
       |), gstats AS (
       |  SELECT doc_id,
       |    len(tk) AS n_words,
       |    ${fpRound4Sql("COALESCE(list_sum(list_transform(tk, t -> CAST(length(t) AS DOUBLE))) / len(tk), 0.0)")} AS mean_word_len,
       |    ${fpRound4Sql("COALESCE(CAST(len(list_filter(tk, t -> contains(t, '#') OR contains(t, '...'))) AS DOUBLE) / len(tk), 0.0)")} AS frac_symbol,
       |    ${fpRound4Sql("COALESCE(CAST(len(list_filter(tk, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(tk), 0.0)")} AS frac_alpha,
       |    ${fpRound4Sql("COALESCE(CAST(len(list_filter(lines, l -> starts_with(trim(l), '-') OR starts_with(trim(l), '*') OR starts_with(trim(l), '•'))) AS DOUBLE) / len(lines), 0.0)")} AS frac_bullet,
       |    ${fpRound4Sql("COALESCE(CAST(len(list_filter(lines, l -> ends_with(trim(l), '...') OR ends_with(trim(l), '…'))) AS DOUBLE) / len(lines), 0.0)")} AS frac_ellipsis,
       |    len(list_intersect(list_transform(tk, t -> lower(t)), [$stops])) AS n_stop
       |  FROM gbase
       |), gop AS (
       |  SELECT doc_id, n_words, mean_word_len, frac_symbol, frac_alpha, frac_bullet,
       |    frac_ellipsis, n_stop,
       |    CAST(n_words >= 50 AND n_words <= 100000 AS INT) AS r_words,
       |    CAST(n_words > 0 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS INT) AS r_mean_len,
       |    CAST(n_words > 0 AND frac_symbol <= 0.1 AS INT) AS r_symbol,
       |    CAST(n_words > 0 AND frac_alpha >= 0.8 AS INT) AS r_alpha,
       |    CAST(frac_bullet <= 0.9 AS INT) AS r_bullet,
       |    CAST(frac_ellipsis <= 0.3 AS INT) AS r_ellipsis,
       |    CAST(n_stop >= 2 AS INT) AS r_stop,
       |    CAST(r_words * r_mean_len * r_symbol * r_alpha * r_bullet * r_ellipsis * r_stop AS INT) AS gopher_pass
       |  FROM gstats
       |)""".stripMargin
  }

  private def duckRepPassCond: String =
    (Seq("dup_line_frac <= 0.30", "dup_line_char_frac <= 0.20") ++
      TextOps.TopNgramMax.toSeq.sortBy(_._1).map { case (n, mx) => s"top_${n}gram_frac <= $mx" } ++
      TextOps.DupNgramMax.toSeq.sortBy(_._1).map { case (n, mx) => s"dup_${n}gram_frac <= $mx" })
      .mkString(" AND ")

  /** Shared robust-stats oracle (q142 and its q198 two-phase twin —
    * identical output rows by construction, one SQL). */
  private lazy val duckRobustStatsSql: String =
    s"""WITH d AS (SELECT source, CAST(len($duckToks) AS BIGINT) AS n FROM documents),
       |m AS (SELECT source, count(*) AS n_docs, median(n) AS med
       |      FROM d GROUP BY source),
       |dev AS (SELECT d.source, abs(d.n - m.med) AS dv
       |        FROM d JOIN m USING (source)),
       |md AS (SELECT source, median(dv) AS mad FROM dev GROUP BY source)
       |SELECT m.source, CAST(m.n_docs AS BIGINT) AS n_docs,
       |  ${fpRound4Sql("m.med")} AS med_tokens,
       |  ${fpRound4Sql("md.mad")} AS mad_tokens
       |FROM m JOIN md USING (source) ORDER BY m.source""".stripMargin

  /** Shared SimHash CTE chain (`sim(doc_id, simhash)`) for q36/q90. */
  private lazy val duckSimhashCTE: String = {
    val bits = (0 until SimBits).map(b =>
      s"CASE WHEN list_sum(list_transform(hh, h -> ((h >> $b) & 1) * 2 - 1)) > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""t AS (SELECT doc_id, list_distinct($duckToks) AS tk FROM documents),
       |h AS (SELECT doc_id, list_distinct(list_transform(tk, t -> ${duckTokHash("t")})) AS hh FROM t),
       |sim AS (SELECT doc_id, $bits AS simhash FROM h)""".stripMargin
  }

  // ------------------------------------------------------------- queries

  /** Exact deduplication: group by content hash, keep lowest doc_id.
    * At 100 TB the shuffle key is the 32-byte sha2, not the document body,
    * and map-side partial aggregation collapses within-partition dups
    * before the exchange. */
  private val q30DedupExact: Q = (s, dir) =>
    Tables.documents(s, dir)
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))

  /** Token-level text statistics in one pass (no UDFs — all codegen'd
    * higher-order functions). */
  private val q31TextStats: Q = (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("tk", toksCol(col("text")))
      .select(
        col("doc_id"),
        size(col("tk")).as("n_tokens"),
        size(array_distinct(col("tk"))).as("n_distinct"),
        fpRound4(aggregate(col("tk"), lit(0L), (a, t) => a + length(t)).cast("double")
          / size(col("tk"))).as("avg_tok_len"),
        fpRound4(size(array_distinct(col("tk"))).cast("double") / size(col("tk"))).as("ttr"))

  /** Stopword-overlap language-ID heuristic (deterministic, CASE-ranked). */
  private val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "de", "et", "un"),
    "de" -> Seq("der", "die", "das", "und", "ein"))

  private val q32LangId: Q = (s, dir) => {
    val base = Tables.documents(s, dir)
      .withColumn("tk", array_distinct(toksCol(col("text"))))
    val withHits = langStops.foldLeft(base) { case (df, (lang, stops)) =>
      df.withColumn(s"hits_$lang",
        size(array_intersect(col("tk"), array(stops.map(lit): _*))))
    }
    val Seq(en, es, fr, de) = langStops.map { case (l, _) => col(s"hits_$l") }
    withHits.select(
      col("doc_id"), en.as("hits_en"), es.as("hits_es"), fr.as("hits_fr"), de.as("hits_de"),
      when(en > 0 && en >= es && en >= fr && en >= de, "en")
        .when(es > 0 && es >= fr && es >= de, "es")
        .when(fr > 0 && fr >= de, "fr")
        .when(de > 0, "de")
        .otherwise("unk").as("lang_guess"))
  }

  /** Document quality score: length saturation + type-token ratio
    * ([[TextOps.quality]] — one formula shared with q85/q87). */
  private val q33QualityScore: Q = (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("tk", toksCol(col("text")))
      .select(col("doc_id"), TextOps.quality(col("tk")).as("quality"))
      .withColumn("low_quality", (col("quality") < TextOps.QualityGate).cast("int"))

  /** Gopher quality-filter rules (Rae et al. 2021, "Scaling Language
    * Models", Appendix A1.1) — the standard pre-training document gate
    * every large-corpus pipeline runs before dedup: word-count bounds,
    * mean-word-length bounds, symbol-to-word and alpha-word ratios,
    * bullet-/ellipsis-line ratios, and a minimum distinct-stop-word
    * count. Emitted as per-rule flags plus the conjunction, with the
    * underlying stats, so downstream mixtures can re-weight on
    * individual rules instead of refiltering. Everything is one
    * scan-shaped projection over codegen'd array lambdas — at 100 TB
    * this is a single pass with no shuffle (the filter itself; the
    * 60k-row oracle just pins the arithmetic).
    *
    * Zero-token and zero-line documents take explicit FALSE/TRUE flags
    * (a ratio over an empty denominator decides nothing: word rules
    * fail, line rules pass vacuously) rather than null-propagating. */
  private val q127GopherRules: Q = (s, dir) =>
    TextOps.gopherRules(Tables.documents(s, dir), "text")
      .select("doc_id", "n_words", "mean_word_len", "frac_symbol", "frac_alpha",
        "frac_bullet", "frac_ellipsis", "n_stop", "r_words", "r_mean_len",
        "r_symbol", "r_alpha", "r_bullet", "r_ellipsis", "r_stop", "gopher_pass")

  /** Unicode NFC normalization audit ([[graft.functions.NfcNormalize]]):
    * normalized text, changed flag, and post-normalization length per
    * document — the tokenizer-contract step every corpus pass runs first
    * (BPE merges learned on NFC text do not match NFD byte sequences).
    * Cross-engine gate is real: the JDK Normalizer and DuckDB's
    * nfc_normalize implement the same Unicode standard, so the
    * normalized STRINGS hash-compare, not just the flags. */
  private val q128NfcNormalize: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        call_function("nfc_normalize", col("text")).as("text_nfc"))
      .select(col("doc_id"), col("text_nfc"),
        length(col("text_nfc")).cast("long").as("n_chars_nfc"))

  /** Gopher repetition-removal rules (Rae et al. 2021, Appendix A1.2 —
    * [[TextOps.repetitionRules]]): the within-document repetition
    * battery complementing q127's A1.1 quality battery. Duplicate-line
    * fraction + char fraction, top-{2,3,4}-gram char coverage, and
    * duplicated-{5..10}-gram char fractions, each with its paper
    * threshold flag and the conjunction. One scan-shaped projection —
    * every stat is per-document array work (build, sort, run-length
    * scan inside codegen'd HOFs), zero shuffle at any corpus size; the
    * oracle recomputes the same stats relationally (unnest → count →
    * window) and pins the arithmetic. */
  private val q131RepetitionRules: Q = (s, dir) => {
    val statCols = Seq("dup_line_frac", "dup_line_char_frac") ++
      TextOps.TopNgramMax.keys.toSeq.sorted.map(n => s"top_${n}gram_frac") ++
      TextOps.DupNgramMax.keys.toSeq.sorted.map(n => s"dup_${n}gram_frac")
    val flagCols = Seq("r_dup_line", "r_dup_line_char") ++
      TextOps.TopNgramMax.keys.toSeq.sorted.map(n => s"r_top_${n}gram") ++
      TextOps.DupNgramMax.keys.toSeq.sorted.map(n => s"r_dup_${n}gram")
    TextOps.repetitionRules(Tables.documents(s, dir), "text")
      .select((Seq("doc_id") ++ statCols ++ flagCols ++ Seq("rep_pass")).map(col): _*)
  }

  /** Whole-document rolling-hash fingerprint (content-defined identity
    * that survives storage layout, unlike sha2 it is cheap to compute
    * incrementally at ingest). */
  private val q34Fingerprint: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), tokHash(col("text")).as("fingerprint"))

  /** Shared: doc_id, distinct bigram-shingle HASH set, MinHash signature
    * array. Downstream exact-Jaccard verification runs on the hash set,
    * not the shingle strings — 8-byte longs instead of variable-length
    * text cross the verify shuffles, and both engines hash identically
    * so the Jaccard values are bit-equal either way. */
  private def sigsDF(s: SparkSession, dir: String): DataFrame = {
    val withShingles = Tables.documents(s, dir)
      .withColumn("tk", toksCol(col("text")))
      .filter(size(col("tk")) >= 2)
      .withColumn("sset", array_distinct(bigramsCol(col("tk"))))
      .withColumn("hh", array_distinct(transform(col("sset"), t => tokHash(t))))
    // all 16 signature minima in one native codegen'd pass (vs 16×
    // array_min(transform(...)) traversals)
    withShingles.select(col("doc_id"), col("hh"),
      call_function("minhash_sigs", col("hh")).as("sig"))
  }

  /** MinHash signatures, one row per doc — the sketch itself is
    * oracle-verified (pure arithmetic on both engines). */
  private val q35MinhashSigs: Q = (s, dir) =>
    sigsDF(s, dir).select(
      col("doc_id") +: (0 until NumSig).map(i => col("sig").getItem(i).as(s"s$i")): _*)

  /** 16-bit SimHash over distinct token hashes. */
  private val q36Simhash: Q = (s, dir) => {
    val base = Tables.documents(s, dir)
      .withColumn("hh",
        array_distinct(transform(array_distinct(toksCol(col("text"))), t => tokHash(t))))
    val bitSums = (0 until SimBits).map { b =>
      aggregate(col("hh"), lit(0L),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(lit(1L)) * 2L - 1L).as(s"bs$b")
    }
    base.select(col("doc_id") +: bitSums: _*)
      .select(
        col("doc_id"),
        (0 until SimBits).map(b =>
          when(col(s"bs$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _).as("simhash"))
  }

  /** Near-duplicate detection: MinHash LSH banding (8 bands × 2 rows) →
    * candidate pairs via equi-join on the band key → exact bigram-set
    * Jaccard ≥ 0.4 on candidates only. The only shuffles are the band
    * join and two hash joins back to the shingle sets — no all-pairs
    * stage anywhere, which is what makes this survive 100 TB. */
  private val q37NeardupMinhash: Q = (s, dir) => {
    // Query-scoped caches (sigs, cand): the returned frame's lineage
    // reads them, so they cannot unpersist in-closure; the runner
    // contract (Verify/Bench call spark.catalog.clearCache() after each
    // query's actions) scopes them to the query run.
    // ln + s256 ride the cached sigs for the xor-popcount candidate
    // prefilter (r16 — the sound IncrementalDedup.xorPrune bound):
    // banding on this corpus yields ~0.3 % true pairs, so 99.7 % of
    // candidates die at the band-join output, BEFORE the distinct
    // shuffle and the array-payload verify joins.
    val sigs = sigsDF(s, dir)
      .withColumn("ln", size(col("hh")))
      .withColumn("s256", call_function("set_sig256", col("hh")))
      .cache()
    val bandArr = array((0 until NumBands).map { j =>
      struct(lit(j).as("band_id"),
        col("sig").getItem(2 * j).as("k0"),
        col("sig").getItem(2 * j + 1).as("k1"))
    }: _*)
    val bands = sigs.select(col("doc_id"), col("ln"), col("s256"), explode(bandArr).as("b"))
      .select(col("doc_id"), col("ln"), col("s256"),
        col("b.band_id"), col("b.k0"), col("b.k1"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.k0") === col("y.k0") && col("x.k1") === col("y.k1") &&
        col("x.doc_id") < col("y.doc_id"))
      .filter(IncrementalDedup.xorPrune(NearDupTheta,
        col("x.ln"), col("y.ln"), col("x.s256"), col("y.s256")))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .cache() // referenced 3x below (probe + both sides of the doc prune)
    // prune BEFORE the verify joins: only candidate docs' shingle sets
    // should ever cross the wire — shuffling the full sigs table (with
    // its array payloads) twice is corpus-sized; the semi-joined subset
    // is candidate-sized (LSH keeps candidates ≪ corpus)
    val candDocs = cand
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val needed = sigs.join(candDocs, Seq("doc_id"), "left_semi")
    val sa = needed.select(col("doc_id").as("doc_a"), col("hh").as("set_a"), col("sig").as("sig_a"))
    val sb = needed.select(col("doc_id").as("doc_b"), col("hh").as("set_b"), col("sig").as("sig_b"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("n_inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard", fpRound4(col("n_inter").cast("double")
        / (size(col("set_a")) + size(col("set_b")) - col("n_inter"))))
      .withColumn("est_jaccard", fpRound4(
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1L).otherwise(0L)), lit(0L), (a, x) => a + x)
          .cast("double") / lit(NumSig.toDouble)))
      .filter(col("jaccard") >= NearDupTheta)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"), col("jaccard"))
  }

  /** Incremental near-dup ingestion — dedup an incoming batch against a
    * PERSISTED MinHash index of the historical corpus (doc_id % 5 == 0
    * plays the incoming batch; the rest is history). The index is two
    * parquet tables written once from ONE scan of history: the band
    * table (band_id, k0, k1, doc_id) for candidate generation and the
    * doc store (doc_id, hh, sig) for exact-Jaccard verification — after
    * the build, history TEXT is never read again. Ingest cost is then
    * O(batch × bucket hit rate): incoming bands equi-join the loaded
    * index (new×old only — no new×new, no history re-pairing), and the
    * verify joins read the doc store, pruned to candidate docs before
    * any array payload crosses a shuffle. This is what turns q37's
    * whole-corpus dedup into a per-ingest operation at 100 TB: the
    * corpus-sized work happened once at index build; each batch pays
    * only for itself. Same band planning, θ gate, and arithmetic as
    * q37, so the DuckDB twin is the q37 CTE chain restricted to
    * cross-split pairs. */
  private val q207IncrementalDedup: Q = (s, dir) => {
    // bands carry the xor-prefilter metadata (ln, s256 — r16, the
    // IncrementalDedup.xorPrune bound): the candidate join then drops
    // the ~99.7 % non-matching bulk at its output, BEFORE the distinct
    // shuffle and the doc-store array attach. The band table here is
    // query-local (built and read within this run), so persisting the
    // extra 4-longs-plus-int per band row is a private format choice.
    def bandsOf(df: DataFrame): DataFrame = {
      val bandArr = array((0 until NumBands).map { j =>
        struct(lit(j).as("band_id"),
          col("sig").getItem(2 * j).as("k0"),
          col("sig").getItem(2 * j + 1).as("k1"))
      }: _*)
      df.select(col("doc_id"), size(col("hh")).as("ln"),
          call_function("set_sig256", col("hh")).as("s256"),
          explode(bandArr).as("b"))
        .select(col("doc_id"), col("ln"), col("s256"),
          col("b.band_id"), col("b.k0"), col("b.k1"))
    }
    val out = java.nio.file.Files.createTempDirectory("graft-dedup-idx").toString
    val isNew = col("doc_id") % 5 === 0
    // index build: one scan of history → doc store; bands derive from
    // the STORE (not a second corpus scan)
    sigsDF(s, dir).filter(isNew === false)
      .select(col("doc_id"), col("hh"), col("sig"))
      .write.parquet(s"$out/docs")
    val docStore = s.read.parquet(s"$out/docs")
    bandsOf(docStore).write.parquet(s"$out/bands")
    val index = s.read.parquet(s"$out/bands")
    // ingest: the incoming batch is read twice (banding + verify)
    val incoming = sigsDF(s, dir).filter(isNew)
      .select(col("doc_id"), col("hh"), col("sig")).cache()
    val cand = bandsOf(incoming).as("x")
      .join(index.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.k0") === col("y.k0") && col("x.k1") === col("y.k1"))
      .filter(IncrementalDedup.xorPrune(NearDupTheta,
        col("x.ln"), col("y.ln"), col("x.s256"), col("y.s256")))
      .select(col("x.doc_id").as("new_id"), col("y.doc_id").as("old_id"))
      .distinct()
    // prune the doc store to candidate history docs BEFORE its array
    // payloads join (candidate-sized, not history-sized, shuffles)
    val oldNeeded = docStore.join(
      cand.select(col("old_id").as("doc_id")).distinct(), Seq("doc_id"), "left_semi")
    val sa = incoming.select(col("doc_id").as("new_id"),
      col("hh").as("set_a"), col("sig").as("sig_a"))
    val sb = oldNeeded.select(col("doc_id").as("old_id"),
      col("hh").as("set_b"), col("sig").as("sig_b"))
    cand.join(sa, "new_id").join(sb, "old_id")
      .withColumn("n_inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard", fpRound4(col("n_inter").cast("double")
        / (size(col("set_a")) + size(col("set_b")) - col("n_inter"))))
      .withColumn("est_jaccard", fpRound4(
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1L).otherwise(0L)), lit(0L), (a, x) => a + x)
          .cast("double") / lit(NumSig.toDouble)))
      .filter(col("jaccard") >= NearDupTheta)
      .select(col("new_id").as("doc_id"), col("old_id").as("dup_of"),
        col("est_jaccard"), col("jaccard"))
  }

  /** Spec access to the shared signature builder (the
    * [[IncrementalDedup]] specs feed batches of real corpus signatures
    * through the stateful ingest path). */
  private[graft] def docSignatures(s: SparkSession, dir: String): DataFrame =
    sigsDF(s, dir)

  /** Greedy order-respecting dedup canon over the whole corpus — the
    * single-batch run of [[IncrementalDedup.ingest]] (empty index): a doc
    * is admitted iff it has no verified near-dup neighbor among
    * already-admitted smaller doc_ids; a rejected doc names its smallest
    * admitted neighbor as dup_of. Unlike the q71 connected-component
    * canon (min label per component, order-free), this is the semantics
    * an INCREMENTAL pipeline necessarily has — first occurrence survives
    * — and the hash match here pins the parallel-rounds MIS against a
    * DuckDB twin that unrolls the same rounds in SQL. */
  private val q208GreedyDedupCanon: Q = (s, dir) => {
    val idx = java.nio.file.Files.createTempDirectory("graft-dedup-mis").toString
    IncrementalDedup.ingest(s, idx, sigsDF(s, dir), NumBands, NearDupTheta,
      maxRounds = MisRounds)
  }

  /** Brute-force cosine top-k (the correctness baseline for ANN): a small
    * broadcast query set against the full corpus; rank on the ROUNDED
    * similarity so Spark/DuckDB float noise cannot flip ranks. */
  private val q38CosineTopk: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", round(cosine(col("emb"), col("q_emb")), 4))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cos_sim"))
  }

  /** Matryoshka truncation-recall curve (Kusupati et al. 2022, NeurIPS —
    * Matryoshka Representation Learning) — the eval harness behind the
    * now-standard serving trick of truncating embeddings to a PREFIX of
    * their dimensions for cheap first-stage retrieval: for each prefix
    * width d ∈ [[MrlDims]], brute-force top-3 under prefix-d cosine and
    * score recall against the full-width truth. The whole eval is a
    * COLUMN SLICE — no re-embedding, no second index — which is exactly
    * why the technique matters operationally, and the d = 64 row is a
    * built-in self-check (full width must reproduce truth: recall
    * exactly 1). On this corpus the embeddings are near-isotropic
    * random (the q136 adversarial note), so low-d recall reads as the
    * FLOOR of the technique, not its typical value — trained MRL
    * embeddings concentrate information in the prefix by construction.
    *
    * Shares q38's total order exactly (4dp-rounded cosine DESC, vec_id
    * — tie-robust cross-engine, the established convention). Recall is
    * exact integers end to end: hit counts by a key equi-join against
    * the truth set, `hits·10⁶ div (3·|panel|)`.
    *
    * Scale shape: the q38 bounded-panel class — scored rows are
    * corpus × |panel| × |dims| with the panel broadcast (never
    * corpus × corpus); windows partition by (dim, query); the truth
    * join broadcasts a ≤ 3·|panel|-row set. At production scale the
    * same curve rides the IVF/PQ indexes instead of brute force. */
  private val MrlDims = Seq(8, 16, 32, 64)
  private val q270MrlRecall: Q = (s, dir) => {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("dim", explode(array(MrlDims.map(d => lit(d)): _*)))
      .withColumn("cos_sim",
        round(cosine(slice(col("emb"), lit(1), col("dim")),
          slice(col("q_emb"), lit(1), col("dim"))), 4))
    val w = Window.partitionBy(col("dim"), col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val t3 = scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("dim").cast("long").as("dim"), col("q_id"), col("vec_id"))
      .cache() // truth + hits consumers; runner-scoped
    val truth = t3.filter(col("dim") === MrlDims.last.toLong)
      .select(col("q_id").as("tq"), col("vec_id").as("tv"))
    val hits = t3.join(broadcast(truth),
        col("q_id") === col("tq") && col("vec_id") === col("tv"))
      .groupBy(col("dim")).agg(count(lit(1)).as("n_hits"))
    val nq = q.agg(count(lit(1)).as("n_queries"))
    MrlDims.map(_.toLong).toDF("dim")
      .crossJoin(broadcast(nq))
      .join(hits, Seq("dim"), "left")
      .select(col("dim"), col("n_queries"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall_micro",
        expr("(n_hits * 1000000) div (3 * n_queries)"))
      .orderBy(col("dim"))
  }

  /** LSH-bucketed ANN (the scale path): hyperplane-sign buckets whose
    * bit width is SIZED TO THE CORPUS ([[EmbedLsh.adaptiveBits]]:
    * ≈[[EmbedLsh.AnnTarget]] rows per bucket at any N — a fixed width
    * would leave per-query work linear in corpus size), plus Hamming-1
    * multi-probe on the query side so recall survives the narrower
    * buckets. Per-query work is (bits+1)·targetBucketRows ≈ O(log N).
    * The oracle computes the identical adaptive width from the same
    * count, so bucket membership is hash-checked at every SF. */
  private val q39AnnLsh: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val bits = EmbedLsh.adaptiveBits(e.count(),
      EmbedLsh.AnnTarget, EmbedLsh.AnnMinBits, EmbedLsh.AnnMaxBits)
    val eb = EmbedLsh.annBuckets(e, bits)
    val probes = eb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        explode(EmbedLsh.probeKeys(col("bucket"), bits)).as("pkey"))
    val scored = eb.join(broadcast(probes),
        col("bucket") === col("pkey") && col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", round(cosine(col("emb"), col("q_emb")), 4))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cos_sim"))
  }

  /** kNN label-noise screening (the Confident-Learning-family data-
    * quality op — Northcutt et al. 2021, JAIR 70, via its classic kNN
    * instantiation, Wilson 1972 editing): flag every vector whose k = 5
    * nearest neighbors' majority label disagrees with its own, and
    * report the per-class noise rate — the "which labels can I not
    * trust" screen a training-data pipeline runs before fitting
    * anything. The SCALE path is the q39 machinery end to end: the
    * corpus-side adaptive-width LSH bucket (≈[[EmbedLsh.AnnTarget]]
    * rows per bucket at any N), Hamming-1 multiprobe on the query
    * side — but the query side here is the WHOLE corpus, so the probe
    * join is a bucket-keyed SHUFFLE equi-join (never a broadcast of an
    * N-scale side, never all-pairs): candidates are O(N·(bits+1)·
    * bucketRows) with the adaptive width holding bucketRows constant.
    *
    * Neighbors vote with q38's 4dp total order (tie-robust cross-
    * engine); majority = (count DESC, label ASC) — the exact
    * lexicographic max, no float in any decision. Vectors with an
    * empty probe neighborhood stay UNSCORED (counted per class,
    * excluded from the rate; an empty-class rate pins the −2·10⁶
    * sentinel). Noise rates are exact integer `div`s. LSH recall
    * caveat inherited from q39 and stated: the neighborhood is the
    * bucket approximation's, not exact kNN — the oracle implements
    * the IDENTICAL buckets/probes, so the approximation itself is
    * cross-checked, and the spec additionally compares against exact
    * brute-force kNN on the small corpus to bound the gap. */
  private[llm] val KnnNoiseK = 5
  private val q271KnnLabelNoise: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"),
        col("label").cast("long").as("label"))
    val bits = EmbedLsh.adaptiveBits(e.count(),
      EmbedLsh.AnnTarget, EmbedLsh.AnnMinBits, EmbedLsh.AnnMaxBits)
    val eb = EmbedLsh.annBuckets(e, bits).cache() // corpus + probe legs
    val probes = eb.select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
      col("label").as("q_label"),
      explode(EmbedLsh.probeKeys(col("bucket"), bits)).as("pkey"))
    val scored = eb.join(probes, // bucket-keyed shuffle join: both sides N-scale
        col("bucket") === col("pkey") && col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", round(cosine(col("emb"), col("q_emb")), 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val maj = scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= KnnNoiseK)
      .groupBy(col("q_id"), col("q_label"), col("label"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("q_id"), col("q_label"))
      .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
      .select(col("q_id"), col("q_label"), (-col("m.nl")).as("maj_label"))
      .withColumn("flagged", (col("maj_label") =!= col("q_label")).cast("long"))
    e.select(col("vec_id").as("q_id"), col("label"))
      .join(maj.select(col("q_id"), col("flagged")), Seq("q_id"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("flagged").isNotNull, 1L).otherwise(0L)).as("n_scored"),
        coalesce(sum(col("flagged")), lit(0L)).as("n_flagged"))
      .withColumn("noise_micro",
        when(col("n_scored") > 0L, expr("(n_flagged * 1000000) div n_scored"))
          .otherwise(lit(-2000000L)))
      .orderBy(col("label"))
  }

  /** Embedding-cosine near-duplicate dedup: [[EmbedLsh.NumBands]] LSH
    * band tables whose per-band bit width is SIZED TO THE CORPUS
    * ([[EmbedLsh.adaptiveBits]]: ≈[[EmbedLsh.BandTarget]] rows per
    * band bucket at any N). Candidate pairs share at least one band
    * key, then exact cosine ≥ 0.45 on candidates only — the same
    * band-join-then-verify shape as MinHash dedup, so no all-pairs
    * product; the adaptive width keeps expected candidates
    * O(N · targetBucketRows) instead of O(N²/constant) (EmbedLshSpec
    * pins the linear growth on a 10× corpus). The oracle implements
    * the identical banding AND the identical width formula, so recall
    * behaviour (an LSH property, not a bug) is cross-checked too. */
  private val q57EmbedNeardup: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val bits = EmbedLsh.adaptiveBits(e.count(),
      EmbedLsh.BandTarget, EmbedLsh.BandMinBits, EmbedLsh.BandMaxBits)
    // Band join carries only (vec_id, band_id, bkey) — the 64-double
    // embedding is joined back AFTER candidate dedup, so the widest
    // shuffle is 3 small ints per row per band.
    val cand = EmbedLsh.candidatePairs(EmbedLsh.bandKeys(e, bits))
    cand
      .join(e.select(col("vec_id").as("keep_id"), col("emb").as("ea")), "keep_id")
      .join(e.select(col("vec_id").as("dup_id"), col("emb").as("eb")), "dup_id")
      .withColumn("cos_sim", round(cosine(col("ea"), col("eb")), 4))
      .filter(col("cos_sim") >= 0.45)
      .select(col("keep_id"), col("dup_id"), col("cos_sim"))
  }

  /** BPE-ish token counting: subword-flavoured regex lexer (letter runs,
    * digit runs, single punctuation) alongside the whitespace count. */
  private val q58BpeTokens: Q = (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(toksCol(col("text"))).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        .as("bpe_tokens"),
      size(array_distinct(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))))
        .as("bpe_vocab"))

  /** Multimodal binary-column plumbing: text → binary payload →
    * per-partition "decode" into typed features. The decode body is a
    * STUB (deterministic fake standing in for an image/audio codec this
    * container doesn't ship); the Spark-side contract — binary column,
    * mapPartitions batch shape, typed output schema — is real, and the
    * fake is arithmetic the oracle recomputes from the text. */
  private val q40MultimodalStub: Q = (s, dir) => {
    val spark = s
    import spark.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // STUB decode: real impl would hand `bytes` to a codec; the
          // deterministic fake derives "image" metadata from the payload.
          val n = bytes.length
          val mean = bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n
          // floor-form rounding: see fpRound4 — keeps the stub's driver-side
          // arithmetic bit-identical to the oracle's SQL formula
          (id, n, n % 64 + 1, n % 48 + 1, math.floor(mean * 10000.0 + 0.5) / 10000.0)
        }
      }
      .toDF("doc_id", "n_bytes", "width", "height", "mean_byte")
  }

  /** Train/eval contamination detection: docs whose id ≡ 0 (mod 10) form
    * the held-out eval set; a train doc whose RARE bigram shingles are
    * ≥ half contained in an eval doc is flagged. The join key is the
    * 8-byte shingle hash, never the shingle text — the standard
    * decontamination sweep (explode → hash-join → count), no all-pairs.
    *
    * The df cap is the scale guard: a stop-bigram ("of the") appearing
    * in f·N train docs and f·N/9 eval docs alone produces ~f²N²/9 join
    * rows — quadratic in corpus size. Dropping shingles whose document
    * frequency exceeds 5% of the corpus removes that blow-up AND the
    * noise (a shingle shared by half the corpus carries no contamination
    * signal); containment is measured over each doc's rare shingles. */
  /** The rare-shingle index behind the batch sweep (q75/q85) AND the
    * streaming [[graft.streaming.StreamOps.contaminationGate]]'s static
    * side: (doc_id, h) for every distinct bigram-shingle hash whose
    * document frequency passes BOTH caps — relative (df·20 ≤ nDocs: a
    * shingle in >5% of docs carries no contamination signal) and
    * absolute (df ≤ absCap: the quadratic-join guard that must NOT
    * grow with the corpus — see [[AbsDfCap]]). `nDocs` is passed as a
    * literal (one count-star on the raw table) so the df filter sits
    * inside the aggregate subtree, not a scalar cross join replicated
    * into every reuse. */
  def rareShingleIndex(docs: DataFrame, nDocs: Long,
      absCap: Long = AbsDfCap): DataFrame = {
    val base = docs
      .withColumn("tk", toksCol(col("text")))
      .filter(size(col("tk")) >= 2)
      .withColumn("bg", array_distinct(bigramsCol(col("tk"))))
    val sh = base.select(col("doc_id"), explode(col("bg")).as("b"))
      .select(col("doc_id"), tokHash(col("b")).as("h"))
    // per-doc sets are distinct -> count(*) = document frequency
    val rareKeys = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") * 20 <= lit(nDocs) && col("df") <= lit(absCap))
      .select(col("h"))
    sh.join(rareKeys, Seq("h")).select(col("doc_id"), col("h"))
  }

  private val q75Contamination: Q = (s, dir) => {
    val nDocs = Tables.documents(s, dir).count()
    // materialize once: three consumers (per-doc counts, eval side,
    // train side) would otherwise each recompute scan+explode+hash+join —
    // at scale this IS the staged rare-shingle index. Query-scoped cache:
    // the runner contract (Verify/Bench) clears the cache between
    // queries, so the blocks don't outlive the query run.
    val rare = rareShingleIndex(Tables.documents(s, dir), nDocs).cache()
    val nSh = rare.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val evalSh = rare.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("eval_id"), col("h"))
    val trainSh = rare.filter(col("doc_id") % 10 =!= 0)
      .join(nSh, Seq("doc_id"))
      .select(col("doc_id").as("train_id"), col("n_sh"), col("h"))
    // the containment gate (≥ half the train doc's rare shingles appear in
    // the eval doc) is pure integer arithmetic — no float boundary
    trainSh.join(evalSh, Seq("h"))
      .groupBy(col("train_id"), col("eval_id"), col("n_sh"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3 && col("n_shared") * 2 >= col("n_sh"))
      .select(col("train_id"), col("eval_id"), col("n_shared"),
        fpRound4(col("n_shared").cast("double") / col("n_sh")).as("containment"))
  }

  /** Repetition scoring (the Gopher-style quality signal): per document,
    * the total/distinct bigram counts, the most-frequent-bigram share
    * (`top_frac`) and the duplicate-bigram share (`dup_frac`). Two
    * partial-aggregated groupBys keyed by doc — scales as a scan. */
  private val q76Repetition: Q = (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("tk", toksCol(col("text")))
      .filter(size(col("tk")) >= 2)
      .withColumn("bg", bigramsCol(col("tk")))
      .select(col("doc_id"), size(col("bg")).as("n_bg"), explode(col("bg")).as("b"))
      .groupBy(col("doc_id"), col("n_bg"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"), col("n_bg"))
      .agg(max(col("cnt")).as("top_cnt"), count(lit(1)).as("n_distinct"))
      .select(
        col("doc_id"), col("n_bg"), col("top_cnt"), col("n_distinct"),
        fpRound4(col("top_cnt").cast("double") / col("n_bg")).as("top_frac"),
        fpRound4(lit(1.0) - col("n_distinct").cast("double") / col("n_bg")).as("dup_frac"))

  /** Sequence packing for LLM pretraining: concat-and-chunk documents
    * into fixed context windows of [[PackWindow]] tokens. Docs are
    * ordered deterministically WITHIN each source shard and chunk ids
    * fall out of a cumulative token sum — a partitioned window, so no
    * global sort exists anywhere in the plan; each shard packs
    * independently, which is exactly how a 100 TB corpus is packed. */
  private[graft] val PackWindow = 256L
  private val q77PackSequences: Q = (s, dir) => {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .withColumn("n_tokens", size(toksCol(col("text"))).cast("long"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"cum_before div $PackWindow").as("pack_id"),
        (col("cum_before") % PackWindow).as("offset_in_pack"))
  }

  /** Percentile-based length pruning (the classic corpus quality gate:
    * drop the shortest/longest tails per source shard). percent_rank
    * over a PARTITIONED window — each shard computes its own cutoffs,
    * no global sort; ties get identical ranks in both engines so the
    * keep flag is boundary-exact. */
  private val q79LengthPrune: Q = (s, dir) => {
    val w = Window.partitionBy(col("source")).orderBy(col("n_tokens"), col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("n_tokens", size(toksCol(col("text"))))
      .withColumn("pr", percent_rank().over(w))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        fpRound4(col("pr")).as("len_rank"),
        (col("pr") >= 0.1 && col("pr") <= 0.9).cast("int").as("keep"))
  }

  /** Corpus mixture accounting: per-source token share and the
    * resampling weight that would flatten the mixture to uniform —
    * the bookkeeping behind training-mixture reweighting. One partial
    * aggregation per source plus a broadcast of the 1-row total. */
  private val q80SourceMixture: Q = (s, dir) => {
    val perSource = Tables.documents(s, dir)
      .withColumn("n_tokens", size(toksCol(col("text"))).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("toks"))
    val total = perSource.agg(
      sum(col("toks")).as("tot_toks"), count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("toks"),
        fpRound4(col("toks").cast("double") / col("tot_toks")).as("token_share"),
        fpRound4(col("tot_toks").cast("double")
          / (col("n_sources") * col("toks"))).as("uniform_weight"))
  }

  /** Temperature-based source-mixture reweighting — the multilingual/
    * multi-source α-sampling scheme (p_s ∝ n_s^α, α < 1 up-weights
    * small sources): q80 reports the PROPORTIONAL mixture; this reports
    * the α = 0.5 temperature mixture relative to the largest source.
    * α = 0.5 deliberately: sqrt is correctly-rounded IEEE (bit-identical
    * in Spark and DuckDB), where a general pow(x, α) is libm-dependent —
    * the same discipline that keeps ln out of q96/q102. Every float op
    * is per-row (ratio to an exact integer max, sqrt, ratio) — no
    * cross-row float sums whose order could differ between engines. */
  private val q116TemperatureMixture: Q = (s, dir) => {
    val perSource = Tables.documents(s, dir)
      .withColumn("n_tokens", size(toksCol(col("text"))).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("toks"))
    val m = perSource.agg(max(col("toks")).as("toks_max"))
    perSource.crossJoin(broadcast(m))
      .withColumn("rel", col("toks").cast("double") / col("toks_max"))
      .select(col("source"), col("n_docs"), col("toks"),
        fpRound4(sqrt(col("rel"))).as("temp_rel"),
        fpRound4(sqrt(col("rel")) / col("rel")).as("boost"))
      .orderBy(col("source"))
  }

  /** Tokens per exact-match decontamination window (q115). */
  private val DecontamWindow = 8

  /** Windowed n-gram EXACT-match decontamination (Lee et al.,
    * arXiv:2107.06499 — exact substring matching, re-expressed at
    * token-window granularity): slide a [[DecontamWindow]]-token window
    * over every document, hash each window's joined text with the
    * codegen'd rolling hash, and equi-join eval windows (doc_id % 10 ==
    * 0, the q75 split) against train windows. Complements q75's
    * rare-bigram CONTAINMENT sweep: this catches verbatim runs (the
    * benchmark-leak shape) that bigram-set overlap understates, and
    * misses paraphrase that containment catches.
    *
    * Scale shape: the explode is one row per token position (the q35
    * shingle discipline — corpus × ~tokens, the unavoidable cost of
    * exact matching), but W-gram hashes are naturally rare so the join
    * fan-out is bounded without the df cap q75's bigrams need; the join
    * is a hash equi-join on the window hash, never all-pairs. */
  private val q115WindowDecontam: Q = (s, dir) => {
    val W = DecontamWindow
    val wins = Tables.documents(s, dir)
      .select(col("doc_id"), toksCol(col("text")).as("tk"))
      .filter(size(col("tk")) >= W)
      .select(col("doc_id"), explode(array_distinct(transform(
        sequence(lit(1), size(col("tk")) - (W - 1)),
        i => tokHash(array_join(slice(col("tk"), i, lit(W)), " "))))).as("h"))
      // consumed twice (eval + train splits) and the tokenize +
      // per-position window-hash explode is the expensive part — cache;
      // runner-side clearCache releases it (query-scoped contract)
      .cache()
    val evalW = wins.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("eval_id"), col("h"))
    val trainW = wins.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id").as("train_id"), col("h"))
    trainW.join(evalW, Seq("h"))
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_windows"))
      .orderBy(col("train_id"), col("eval_id"))
  }

  /** Cross-document repeated-substring mining (the corpus-self-overlap
    * half of Lee et al. 2021, arXiv:2107.06499 — q115 is the
    * train-vs-eval half): every [[DecontamWindow]]-token window hashed
    * at every position, windows shared by 2..[[SubstrDupDfCap]]
    * documents joined into unordered doc pairs with shared-window
    * counts ≥ [[SubstrDupMinShared]]. The df cap is the scale guard:
    * boilerplate windows (licenses, headers) appear in thousands of
    * docs and would otherwise fan out quadratically per hash; capped,
    * per-hash work is ≤ C(cap,2) pairs and both shuffles stay
    * hash-keyed — no all-pairs stage, the same contract as q37/q118. */
  private val SubstrDupDfCap = 20
  private val SubstrDupMinShared = 2
  private val q129SubstrDup: Q = (s, dir) => {
    val W = DecontamWindow
    val wins = Tables.documents(s, dir)
      .select(col("doc_id"), toksCol(col("text")).as("tk"))
      .filter(size(col("tk")) >= W)
      .select(col("doc_id"), explode(array_distinct(transform(
        sequence(lit(1), size(col("tk")) - (W - 1)),
        i => tokHash(array_join(slice(col("tk"), i, lit(W)), " "))))).as("h"))
      .cache() // consumed twice (df gate + pair join); runner clearCache scopes it
    // windows are distinct per doc, so count(*) per hash IS the doc freq
    val shared = wins.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= SubstrDupDfCap)
      .select(col("h"))
    val hits = wins.join(shared, Seq("h"))
    hits.as("x").join(hits.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= SubstrDupMinShared)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Exact cross-document substring dedup at SPAN grain — the removal
    * half of Lee et al. 2021 §4.2 (arXiv:2107.06499): q129 MINES
    * repeated windows, this REMOVES them. Semantics: the MIN-doc_id
    * occurrence of each [[DecontamWindow]]-token window is canonical and
    * keeps its text; in every other document, each window position whose
    * hash also occurs in a lower-id document marks its W tokens for
    * removal, and a document's removed-token count is the UNION length
    * of those (overlapping) fixed-width spans. Deterministic by
    * construction — no tie depends on partitioning.
    *
    * Scale shape: position-grain window hashes (the q129/q35 explode —
    * corpus × ~tokens, the unavoidable cost of exact matching), ONE
    * min-aggregate per hash (crucially: removal needs NO pair join, so
    * q129's df cap is unnecessary — boilerplate windows cost one
    * aggregate row, never quadratic fan-out), one hash-keyed probe back,
    * and the interval-union length per doc is a PER-DOC window over its
    * duplicate positions (sorted i: Σ min(W, next_i − i), W for the
    * last — the classic equal-length interval-merge closed form). */
  /** Position-grain [[DecontamWindow]]-token window hashes — the shared
    * explode behind the span-dedup family (q234 cross-doc, q248
    * within-doc). */
  private def windowPositions(docs: DataFrame): DataFrame = {
    val W = DecontamWindow
    docs
      .select(col("doc_id"), toksCol(col("text")).as("tk"))
      .filter(size(col("tk")) >= W)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("tk")) - (W - 1)),
        i => struct(i.cast("long").as("i"),
          tokHash(array_join(slice(col("tk"), i, lit(W)), " ")).as("h")))).as("s"))
      .select(col("doc_id"), col("s.i").as("i"), col("s.h").as("h"))
  }

  /** Per-doc removed-token mass = union length of equal-width spans at
    * the given duplicate start positions (sorted i: Σ min(W, nextᵢ−i),
    * W for the last — per-doc window, the q234/q248 closed form). */
  private def spanUnionStats(docs: DataFrame, dupPos: DataFrame,
      nDupCol: String): DataFrame = {
    val W = DecontamWindow
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val cov = dupPos.withColumn("nxt", lead(col("i"), 1).over(wd))
      .select(col("doc_id"),
        when(col("nxt").isNull, lit(W.toLong))
          .otherwise(least(lit(W.toLong), col("nxt") - col("i"))).as("cov"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as(nDupCol), sum(col("cov")).as("n_removed"))
    docs.select(col("doc_id"), size(toksCol(col("text"))).cast("long").as("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col(nDupCol), lit(0L)).as(nDupCol),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        (col("n_tokens") - coalesce(col("n_removed"), lit(0L))).as("n_kept"))
      .orderBy(col("doc_id"))
  }

  private[graft] def spanDedupStats(docs: DataFrame): DataFrame = {
    val wins = windowPositions(docs)
      .cache() // two consumers (min-doc aggregate + probe); runner clearCache scopes it
    val minDoc = wins.groupBy(col("h")).agg(min(col("doc_id")).as("min_doc"))
    val dupPos = wins.join(minDoc, "h")
      .filter(col("doc_id") > col("min_doc"))
      .select(col("doc_id"), col("i"))
    spanUnionStats(docs, dupPos, "n_dup_windows")
  }

  /** Personalized PageRank (Haveliwala 2002, WWW — topic-sensitive
    * PageRank; the random walk RESTARTS at a seed set instead of
    * uniformly, so rank means "endorsed reachability FROM these seeds"
    * — the relevance-propagation primitive behind seed-based crawl
    * frontiers, related-document expansion, and TrustRank-style spam
    * demotion): q138's exact integer-mass iteration with the base mass
    * redirected to the q217 seed set (idx % 97 == 0) —
    * pr'(v) = seedBase(v) + (85·Σ contrib) div 100, seedBase nonzero
    * only at seeds, initial mass scale div |S| on seeds and 0 elsewhere.
    * Non-seeds hold rank ONLY through actual in-paths from the seed
    * set; floor-division crumbs leak deterministically (the q138
    * discipline — a ranking signal, not a measure). Scale shape per
    * round: identical to q138 — one ranks⋈edges hash join + one
    * partial-aggregated groupBy(dst) + a left join back; ONE consumer
    * per round, so the chain stays lazy and only the final frame pins
    * (the PageRank.iterate cadence). */
  private val PprIters = 5
  private val q245PersonalizedPr: Q = (s, dir) => {
    val docsC = linkGraphDocs(s, dir).cache()
    val n = docsC.count()
    val docs = s.createDataFrame(docsC.rdd, docsC.schema)
    val withDegC = {
      val e = linkGraphRawEdges(docs, n).distinct()
      e.join(e.groupBy(col("src")).agg(count(lit(1)).as("d")), "src").cache()
    }
    val withDeg = s.createDataFrame(withDegC.rdd, withDegC.schema)
    withDegC.count()
    val isSeed = col("idx") % 97 === 0
    val nSeeds = docsC.filter(isSeed).count()
    require(nSeeds > 0, "personalized PageRank needs a non-empty seed set")
    val perSeed = PrScale / nSeeds
    val base = 15L * perSeed / 100L
    val seedBase = when(isSeed, lit(base)).otherwise(lit(0L))
    var ranks = docs.select(col("idx"),
      when(isSeed, lit(perSeed)).otherwise(lit(0L)).as("pr"))
    for (_ <- 1 to PprIters) {
      val contribs = ranks
        .join(withDeg, ranks("idx") === withDeg("src"))
        .select(col("dst"), expr("pr div d").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      ranks = docs.select(col("idx"))
        .join(contribs, col("idx") === col("dst"), "left")
        .select(col("idx"),
          (seedBase + expr("(85 * coalesce(contrib, 0L)) div 100")).as("pr"))
    }
    // one consumer per round — the lazy chain executes once; pin the
    // final frame for the analyzer bound (the PageRank.iterate cadence)
    val fin = ranks.cache()
    fin.count()
    s.createDataFrame(fin.rdd, fin.schema)
      .join(docs, "idx")
      .select(col("doc_id"), col("pr").as("ppr"))
      .orderBy(col("doc_id"))
  }

  /** Spearman rank correlation with ties (Spearman 1904) — the
    * rank-based dependence measure completing the correlation pair
    * (q67's Pearson asks "linear?"; this asks "monotone?" — robust to
    * the heavy tails that corrupt Pearson on corpus stats). Measured
    * between document LENGTH (token count) and LEXICAL DIVERSITY
    * (distinct-token count) — the "does longer mean richer" corpus
    * diagnostic. ρ = Pearson over midranks; midranks come from each
    * variable's bounded INTEGER-GRID histogram on q198's doubled grid
    * (2r̄ = 2·cumBelow + m + 1 exact) with cumulatives via
    * [[graft.operators.DistributedSelect.globalPrefixSum]] on unique
    * grid keys — NO sort, NO window over corpus-sized input, the q242
    * machinery applied to two variables at once. Exactness: the
    * FIRST-moment sums are exact longs (Σ2r̄ ≈ n² — wraps only past
    * ~3×10⁹ docs); the SECOND-moment sums ride DECIMAL(38,0) (the q228
    * widening) because Σ(2r̄)² ≈ (4/3)n³ crosses int64 at n ≈ 1.9M docs
    * while DuckDB's sum(BIGINT) is HUGEINT — without the widening the
    * two engines would diverge SILENTLY under non-ANSI Spark past that
    * corpus size. The closed form reads the decimals through double
    * (value-identical wherever the longs previously fit) and is one
    * identical-order chain micro-floored (the q228 discipline). */
  private val q243Spearman: Q = (s, dir) => {
    import graft.operators.DistributedSelect
    import org.apache.spark.sql.types.DecimalType
    def s6(c: Column): Column = floor(c * 1e6 + 0.5).cast("long")
    val d38 = DecimalType(38, 0)
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), toksCol(col("text")).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("x"),
        size(array_distinct(col("tk"))).cast("long").as("y"))
      .cache()
    def midranks(v: String): DataFrame = {
      val grid = base.groupBy(col(v)).agg(count(lit(1)).as("m"))
      DistributedSelect.globalPrefixSum(grid, v, "m", "cum", 64L)
        .select(col(v), (lit(2L) * (col("cum") - col("m")) + col("m") + 1L).as(s"r2_$v"))
    }
    val ranked = base
      .join(midranks("x"), "x")
      .join(midranks("y"), "y")
    // operands (not products) are widened: a long×long product itself
    // wraps at 2r̄ > 3×10⁹ (n ≈ 1.5×10⁹ docs — inside a 100 TB corpus's
    // range), while decimal×decimal at scale 0 is exact to 10³⁸
    val m = ranked.agg(count(lit(1)).as("n"),
      sum(col("r2_x")).as("sx"), sum(col("r2_y")).as("sy"),
      sum(col("r2_x").cast(d38) * col("r2_x").cast(d38)).as("sxx"),
      sum(col("r2_x").cast(d38) * col("r2_y").cast(d38)).as("sxy"),
      sum(col("r2_y").cast(d38) * col("r2_y").cast(d38)).as("syy"))
    val nD = col("n").cast("double")
    val cov = nD * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")
    val vx = nD * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    val vy = nD * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
    m.select(col("n"), col("sx").as("rank2_sum_x"), col("sy").as("rank2_sum_y"),
      s6(cov / sqrt(vx * vy)).as("spearman_micro"))
  }

  /** Kendall's τ-b with tie correction (Kendall 1938; Kendall 1945 for
    * the tie form) — the third member of the correlation triple (q67
    * Pearson: "linear?"; q243 Spearman: "monotone, rank-scaled?"; τ-b:
    * "monotone, PAIR-scaled?" — τ is the probability a random pair is
    * concordant minus discordant, the effect size Spearman's ρ
    * over-states on heavy-tied data), over the same length/diversity
    * pair as q243 so the two canons read side by side.
    *
    * Scale shape — NO pair join: the naive C/D count is an O(n²)
    * self-join; here concordance comes from a 2-D DOMINANCE COUNT on a
    * DENSE VALUE GRID (observed x values × the full integer y range,
    * |X|·|Y| cells — value-domain-bounded, independent of corpus size;
    * unbounded-domain variables take the cent-grid move first). Two
    * partitioned windows, each over a grid-bounded partition:
    *   A(x,y)  = Σ_{x'<x} c(x',y)   (partition y, order x — ≤|X| rows)
    *   Dlt(x,y)= Σ_{y'<y} A(x,y')   (partition x, order y — ≤|Y| rows)
    * so Dlt = #points strictly dominated and Dgt = Σ_y A − Dlt − A =
    * #points below-x/above-y; C = Σ c·Dlt and D = Σ c·Dgt over observed
    * cells count every unordered pair exactly once from its larger-x
    * side, and x-ties/y-ties fall out of both — exactly τ-b's C and D.
    * The density in y is what makes the second prefix complete (a
    * sparse cell grid misses A at (x, y') when y' never occurs at x).
    *
    * Exactness: cell counts and dominance counts are exact longs; the
    * C/D/tie-pair sums ride DECIMAL(38,0) with OPERANDS widened (the
    * q243/q228 discipline — c·Dlt is an n²-shaped product and Σ ≈ n²/2
    * wraps int64 at n ≈ 6×10⁹ docs, inside a 100 TB corpus's range,
    * while DuckDB's sum(BIGINT) is HUGEINT). The OUTPUT count columns
    * are those decimals read back as longs — exact to n ≈ 4.3×10⁹ and
    * documented here, while tau_b_micro reads the decimals through
    * double and stays exact-input at ANY n. Degenerate corpora (all x
    * tied or all y tied ⇒ zero denominator) pin tau_b_micro at the
    * out-of-range sentinel −2·10⁶ on BOTH engines (the q240 contract:
    * engines must agree where the statistic is undefined). */
  private val q250KendallTau: Q = (s, dir) => {
    val d38 = DecimalType(38, 0)
    val base = Tables.documents(s, dir)
      .select(toksCol(col("text")).as("tk"))
      .select(size(col("tk")).cast("long").as("x"),
        size(array_distinct(col("tk"))).cast("long").as("y"))
    val cells = base.groupBy(col("x"), col("y")).agg(count(lit(1)).as("c")).cache()
    val yBounds = cells.agg(min(col("y")).as("ylo"), max(col("y")).as("yhi"))
    val dense = cells.select(col("x")).distinct()
      .crossJoin(broadcast(yBounds)) // broadcast 1-row bounds frame
      .select(col("x"), explode(sequence(col("ylo"), col("yhi"))).as("y"))
      .join(cells, Seq("x", "y"), "left")
      .select(col("x"), col("y"), coalesce(col("c"), lit(0L)).as("c"))
    val wXless = Window.partitionBy(col("y")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wYless = Window.partitionBy(col("x")).orderBy(col("y"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wYtot = Window.partitionBy(col("x"))
    val dom = dense
      .withColumn("a", coalesce(sum(col("c")).over(wXless), lit(0L)))
      .withColumn("dlt", coalesce(sum(col("a")).over(wYless), lit(0L)))
      .withColumn("atot", sum(col("a")).over(wYtot))
    val cd = dom.filter(col("c") > 0).agg(
      sum(col("c")).as("n"),
      sum(col("c").cast(d38) * col("dlt").cast(d38)).as("conc"),
      sum(col("c").cast(d38) *
        (col("atot") - col("dlt") - col("a")).cast(d38)).as("disc"))
    // doubled tie-pair counts Σt(t−1) per marginal grid (doubling keeps
    // the closed form division-free in integer-land)
    def tie2(v: String): DataFrame = cells.groupBy(col(v))
      .agg(sum(col("c")).as("t"))
      .agg(coalesce(sum(col("t").cast(d38) * (col("t").cast(d38) - 1)),
        lit(0).cast(d38)).as(s"tie2_$v"))
    val m = cd.crossJoin(broadcast(tie2("x"))).crossJoin(broadcast(tie2("y")))
    val nD = col("n").cast("double")
    val num = lit(2.0) * (col("conc").cast("double") - col("disc").cast("double"))
    val dx = nD * (nD - 1.0) - col("tie2_x").cast("double")
    val dy = nD * (nD - 1.0) - col("tie2_y").cast("double")
    m.select(col("n"),
      col("conc").cast("long").as("conc"),
      col("disc").cast("long").as("disc"),
      col("tie2_x").cast("long").as("tie2_x"),
      col("tie2_y").cast("long").as("tie2_y"),
      when(dx <= 0.0 || dy <= 0.0, lit(-2000000L))
        .otherwise(floor(num / sqrt(dx * dy) * 1e6 + 0.5).cast("long"))
        .as("tau_b_micro"))
  }

  /** Cohen's kappa (Cohen 1960) — chance-corrected agreement between
    * two raters, here the corpus's two independent per-doc quality
    * gates (the Gopher A1.1 conjunction q196 composes, and q131's
    * repetition battery): "do the gates agree beyond what their base
    * rates force?" is the gate-redundancy diagnostic a curation
    * pipeline reads before paying for both. κ = (p_o − p_e)/(1 − p_e)
    * from the exact 2×2 agreement counts (one conditional aggregate
    * over the joined gate flags — scan-shaped, both gates are one
    * pass); p_o/p_e/κ are identical-order double chains off exact
    * longs, micro-floored. */
  private val q246CohenKappa: Q = (s, dir) => {
    // BOTH batteries composed over ONE documents scan: gopherRules and
    // repetitionRules are column batteries that preserve their input,
    // so chaining them evaluates both gates in a single projection over
    // a single parquet read — the former two-scan + doc_id join paid a
    // second full corpus pass and a shuffle for what is one row-local
    // conjunction pair
    val flags = TextOps.repetitionRules(
        TextOps.gopherRules(Tables.documents(s, dir), "text"), "text")
      .select(col("doc_id"),
        (col("r_words") * col("r_mean_len") * col("r_symbol") *
          col("r_alpha") * col("r_bullet") * col("r_ellipsis") === 1)
          .cast("long").as("ga"),
        (col("rep_pass") === 1).cast("long").as("gb"))
    val m = flags.agg(
      count(lit(1)).as("n"),
      sum(col("ga") * col("gb")).as("n11"),
      sum(col("ga") * (lit(1L) - col("gb"))).as("n10"),
      sum((lit(1L) - col("ga")) * col("gb")).as("n01"),
      sum((lit(1L) - col("ga")) * (lit(1L) - col("gb"))).as("n00"))
    val nD = col("n").cast("double")
    val po = (col("n11") + col("n00")).cast("double") / nD
    val pe = ((col("n11") + col("n10")).cast("double") *
        (col("n11") + col("n01")).cast("double") +
      (col("n01") + col("n00")).cast("double") *
        (col("n10") + col("n00")).cast("double")) / (nD * nD)
    m.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      floor(po * 1e6 + 0.5).cast("long").as("po_micro"),
      floor(pe * 1e6 + 0.5).cast("long").as("pe_micro"),
      floor((po - pe) / (lit(1.0) - pe) * 1e6 + 0.5).cast("long").as("kappa_micro"))
  }

  /** Katz centrality (Katz 1953, Psychometrika) over the shared link
    * graph — the attenuation-based prestige index between q138's
    * PageRank (flow-normalized) and q239's HITS (mutually recursive):
    * x = Σ_k α^k·(Aᵀ)^k·1, every path endorses its endpoint with weight
    * decaying in length. Computed as the truncated fixed-round
    * recurrence x_t = 1 + α·Aᵀ·x_{t−1} ([[KatzIters]] rounds — the
    * q138/q239 exact-iteration contract), in integer micro-units with
    * α = 1/[[KatzInvAlpha]] as `contrib div 10` — both engines hold
    * bit-identical longs, no convergence read, and with the hash
    * graph's bounded in-degrees the truncated sum stays far inside
    * int64. Scale shape per round: ONE ranks⋈edges hash join + one
    * partial-aggregated groupBy(dst) + a left join back — O(E),
    * exactly q138's loop; rounds pinned and released on the q217
    * cadence (output reads only the LAST round). Output: per-doc Katz
    * score in micro-units. */
  private val KatzIters = 4
  private val KatzInvAlpha = 10L
  private val KatzUnit = 1000000L
  private val q244Katz: Q = (s, dir) => {
    val docsC = linkGraphDocs(s, dir).cache()
    val n = docsC.count()
    val docs = s.createDataFrame(docsC.rdd, docsC.schema)
    val edgesC = linkGraphRawEdges(docs, n).distinct().cache()
    val edges = s.createDataFrame(edgesC.rdd, edgesC.schema)
    edgesC.count()
    // ONE consumer per round (the next round's relax join), so the lazy
    // chain executes exactly once — only the FINAL frame pins, the
    // PageRank.iterate fixed-mode / q245 cadence. (Was: cache + count +
    // LogicalRDD rebuild EVERY round — KatzIters full materialization
    // jobs of fixed scheduler overhead for identical longs; 1.40 s →
    // ~0.6 s at sf0.1, see OPTIMIZATION_r15.md.) Analyzer depth is
    // bounded by KatzIters·(one join + one agg) — linear, no
    // self-reference doubling, so no mid-chain pin is needed.
    var x = docs.select(col("idx"), lit(KatzUnit).as("x"))
    for (_ <- 1 to KatzIters) {
      val contrib = x.join(edges, x("idx") === edges("src"))
        .groupBy(col("dst").as("idx")).agg(sum(col("x")).as("c"))
      x = docs.select(col("idx")).join(contrib, Seq("idx"), "left")
        .select(col("idx"),
          (lit(KatzUnit) + expr(s"coalesce(c, 0) div $KatzInvAlpha")).as("x"))
    }
    val finC = x.cache()
    finC.count()
    edgesC.unpersist() // all relax joins done (the chain just executed)
    // docsC and the final pin stay cached: the returned lineage reads
    // BOTH (the runner's clearCache releases them — the query-scoped
    // contract, same as q138)
    s.createDataFrame(finC.rdd, finC.schema)
      .join(docs, "idx")
      .select(col("doc_id"), col("x").as("katz_micro"))
      .orderBy(col("doc_id"))
  }

  /** [[spanDedupStats]] over the raw corpus. */
  private val q234SpanRemoval: Q = (s, dir) =>
    spanDedupStats(Tables.documents(s, dir).select(col("doc_id"), col("text")))

  /** The curation canon COMPOSED with span-grain dedup — q196's admitted
    * set, then [[spanDedupStats]] among the survivors (the Lee et al.
    * pipeline order: document-level gates and exact-dup removal first,
    * then verbatim repeated spans excised across what remains). Min-doc
    * canonicality is evaluated over the ADMITTED set, so a span shared
    * only with rejected documents is NOT removed — the survivor is its
    * corpus's sole copy. */
  private val q235CurationSpans: Q = (s, dir) => {
    val kept = q196CurationCanon(s, dir).select(col("doc_id"))
    // The ADMITTED SET is the shared stage: spanDedupStats reads its
    // input twice (window explode + the n_tokens scan), and without
    // this cache each read would re-execute the FULL curation canon —
    // gates, exact dedup, decontamination — which at 100 TB is the one
    // computation you never run twice. Cached here, the canon executes
    // once into the survivors frame; the runner's clearCache releases
    // it (query-scoped cache contract).
    val survivors = Tables.documents(s, dir)
      .join(kept, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"))
      .cache()
    spanDedupStats(survivors)
  }

  /** WITHIN-document repeated-span self-dedup — the third member of the
    * span-dedup family, completing Lee et al. 2021 §4.2 alongside q234:
    * q234 excises spans duplicated ACROSS documents; this excises a
    * document's OWN verbatim repeats (boilerplate headers re-pasted
    * mid-doc, chorus/refrain repetition, template stutter — the mass
    * q131 SCORES via dup-ngram fractions but nothing previously
    * REMOVED). A window position is a self-dup iff its
    * [[DecontamWindow]]-token hash occurs at an EARLIER position in the
    * SAME document (the first occurrence is canonical — deterministic,
    * no tie depends on partitioning); a doc's removed-token count is
    * the interval union of those spans ([[spanUnionStats]]).
    *
    * Scale shape — STRICTLY cheaper than q234: the shared
    * [[windowPositions]] explode, then one min-aggregate per
    * (doc_id, hash) — the aggregation key CONTAINS doc_id, so unlike
    * q234's corpus-wide min-per-hash there is no cross-document shuffle
    * anywhere; every stage partitions by doc_id and a 100×-wider corpus
    * just means more independent partitions. The per-doc interval-union
    * window rides each doc's own duplicate positions (bounded by doc
    * length, never corpus-sized). */
  private val q248SpanSelfDedup: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val wins = windowPositions(docs)
      .cache() // two consumers (first-pos aggregate + probe); runner clearCache scopes it
    val firstPos = wins.groupBy(col("doc_id"), col("h")).agg(min(col("i")).as("i0"))
    val dupPos = wins.join(firstPos, Seq("doc_id", "h"))
      .filter(col("i") > col("i0"))
      .select(col("doc_id"), col("i"))
    spanUnionStats(docs, dupPos, "n_self_dup_windows")
  }

  /** Heaps' law fit (Heaps 1978; Herdan 1960) — vocabulary growth
    * V(n) = K·n^β, the corpus-collection planning canon next to q227's
    * Good–Turing (GT asks "how much is unseen"; Heaps asks "how fast
    * does more data buy vocabulary"): β well below 1 ⇒ diminishing
    * returns, β near 1 ⇒ id-heavy/compositional text. The vocabulary is
    * token TRIGRAMS — n-gram Heaps is the standard generalization, and
    * on this corpus it is the non-degenerate one: the synthetic
    * template's 31-word unigram space saturates inside the FIRST grid
    * point (varY = 0, the fit undefined — same corpus-hostility class
    * as q196's stop-word rule, documented not silently absorbed), while
    * trigram composition keeps growing corpus-long. The curve is
    * sampled at [[HeapsGridK]] prefix points of the doc_id order and
    * fitted by log-log OLS (the q228 closed form). Scale shape: doc
    * positions and cumulative token counts come from the two-level
    * prefix primitives (globalRowNumber/globalPrefixSum — NO
    * global-sort window); V(p) at every grid point is ONE pass over the
    * (trigram → first-doc) table crossed with the bounded 16-row grid —
    * first occurrence is a plain min-aggregate, never a scan per point.
    * Exactness: counts are exact longs, logs micro-floored (identical
    * doubles), the 16-point OLS is a bounded driver artifact. */
  private val HeapsGridK = 16
  private val q236HeapsFit: Q = (s, dir) => {
    import graft.operators.DistributedSelect
    import s.implicits._
    def s6(c: Column): Column = floor(c * 1e6 + 0.5).cast("long")
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), toksCol(col("text")).as("tk"))
      .cache()
    val g0 = docs.agg(max(col("doc_id")), count(lit(1))).head()
    val (mx, n) = (g0.getLong(0), g0.getLong(1))
    require(n >= HeapsGridK, s"Heaps grid needs >= $HeapsGridK docs")
    val width = math.max(1L, mx / 1024 + 1)
    val grid = (1 to HeapsGridK).map(k => (k.toLong, n * k / HeapsGridK))
      .toDF("k", "p_k")
    val withP = DistributedSelect.globalRowNumber(
      docs.select(col("doc_id"), size(col("tk")).cast("long").as("nt")),
      "doc_id", "p", width)
    val withCum = DistributedSelect.globalPrefixSum(withP, "doc_id", "nt", "cum_toks", width)
    val gridPts = withCum.join(broadcast(grid), col("p") === col("p_k"))
      .select(col("k"), col("p_k"), col("cum_toks"))
    val firstP = docs.filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("tk")) - 2),
        i => array_join(slice(col("tk"), i, lit(3)), " "))).as("t"))
      .groupBy(col("t")).agg(min(col("doc_id")).as("fd"))
      .join(withP.select(col("doc_id").as("fd"), col("p").as("fp")), "fd")
    val vocabAt = firstP.crossJoin(broadcast(grid))
      .filter(col("fp") <= col("p_k"))
      .groupBy(col("k")).agg(count(lit(1)).as("vocab"))
    val pts = gridPts.join(vocabAt, "k")
      .withColumn("lx", s6(log(col("cum_toks").cast("double"))))
      .withColumn("ly", s6(log(col("vocab").cast("double"))))
      .cache()
    // 16-point OLS: the grid is a bounded driver artifact (the PQ-
    // codebook discipline) — exact long moment sums collected once,
    // double-widened closed form driver-side, refused loudly if the
    // grid lost points (a silent np<16 would skew the fit)
    val mr = pts.agg(count(lit(1)),
      sum(col("lx")), sum(col("ly")),
      sum(col("lx") * col("lx")), sum(col("lx") * col("ly")),
      sum(col("ly") * col("ly"))).head()
    require(mr.getLong(0) == HeapsGridK.toLong,
      s"Heaps grid lost points: ${mr.getLong(0)} of $HeapsGridK")
    val (np, sx, sy) = (mr.getLong(0).toDouble, mr.getLong(1), mr.getLong(2))
    val (sxx, sxy, syy) = (mr.getLong(3), mr.getLong(4), mr.getLong(5))
    val cov = np * sxy - sx.toDouble * sy
    val varX = np * sxx - sx.toDouble * sx
    val varY = np * syy - sy.toDouble * sy
    pts.select(col("k"), col("p_k").as("n_docs"), col("cum_toks"), col("vocab"))
      .withColumn("beta_micro", lit(math.floor(cov / varX * 1e6 + 0.5).toLong))
      .withColumn("lnk_micro",
        lit(math.floor((sy.toDouble - cov / varX * sx.toDouble) / np + 0.5).toLong))
      .withColumn("r2_micro", lit(math.floor(cov * cov / (varX * varY) * 1e6 + 0.5).toLong))
      .orderBy(col("k"))
  }

  /** Token and bigram entropy (Shannon 1948; the entropy-rate pair
    * corpus health checks read next to q228's Zipf slope): unigram
    * H(W) = −Σ p(w)·ln p(w) and the conditional bigram entropy
    * H(W₂|W₁) = −Σ p(w₁w₂)·ln p(w₂|w₁) — their GAP is the first-order
    * redundancy of the text (template corpora collapse H(W₂|W₁) toward
    * zero while H(W) stays high). Exactness: both entropies are sums of
    * c·ln(N/c)-shaped terms over exact integer counts — each term is
    * ONE double chain micro-floored to a long, per-grain sums are exact
    * longs (order-free), and the final division rides integer `div`
    * onto the micro grid. Scale shape: two map-side-combinable
    * aggregates (unigram counts; bigram counts keyed on the gram) plus
    * a vocabulary-bounded head join — exactly the q133 LM-fit shape. */
  private val q238EntropyRate: Q = (s, dir) => {
    val toksed = Tables.documents(s, dir)
      .select(col("doc_id"), toksCol(col("text")).as("tk"))
    val uni = toksed.select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .cache()
    val ut = uni.agg(sum(col("c")).as("n"), count(lit(1)).as("v")).head()
    val (nTok, vUni) = (ut.getLong(0), ut.getLong(1))
    val h1Sum = uni.select(
        floor(col("c").cast("double") *
          log(lit(nTok.toDouble) / col("c").cast("double")) * 1e6 + 0.5)
          .cast("long").as("t"))
      .agg(sum(col("t")).as("s")).head().getLong(0)
    val bg = toksed.filter(size(col("tk")) >= 2)
      .select(explode(zip_with(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1),
        (a, b) => struct(concat(a, lit(" "), b).as("g"), a.as("h")))).as("s"))
      .select(col("s.g").as("g"), col("s.h").as("h"))
    val c12 = bg.groupBy(col("g"), col("h")).agg(count(lit(1)).as("c12")).cache()
    val c1 = c12.groupBy(col("h")).agg(sum(col("c12")).as("c1"))
    val bt = c12.agg(sum(col("c12")).as("nb"), count(lit(1)).as("vb")).head()
    val (nBg, vBg) = (bt.getLong(0), bt.getLong(1))
    val h2Sum = c12.join(c1, "h")
      .select(floor(col("c12").cast("double") *
          log(col("c1").cast("double") / col("c12").cast("double")) * 1e6 + 0.5)
        .cast("long").as("t"))
      .agg(sum(col("t")).as("s")).head().getLong(0)
    import toksed.sparkSession.implicits._
    uni.unpersist(); c12.unpersist() // outputs are driver-held
    Seq((nTok, vUni, nBg, vBg, h1Sum / nTok, h2Sum / nBg))
      .toDF("n_tokens", "v_unigrams", "n_bigrams", "v_bigrams", "h1_micro", "h2_micro")
  }

  /** HITS hubs-and-authorities (Kleinberg 1999, JACM) over the shared
    * link graph — the mutually-recursive centrality pair next to q138's
    * PageRank (PageRank scores global endorsement flow; HITS separates
    * CURATORS — pages whose out-links find good content — from
    * AUTHORITIES the curators converge on; corpus curation reads hubs
    * as directory/aggregator shapes). Fixed [[HitsIters]] synchronous
    * rounds of a ← Σ_{j→i} h(j), renormalize, h ← Σ_{i→j} a(j),
    * renormalize — the q138 exact-iteration contract in integer mass
    * units ([[HitsScale]] total; renormalization is x·Scale div Σx, so
    * every round both engines hold bit-identical longs; per-node values
    * stay < PrOutLinks·Scale, so the Scale multiply fits int64 with
    * Scale = 10⁹). Output: the bounded per-round trace (mass sums after
    * floor leakage, max values, min-id argmaxes) — the convergence
    * signature. Scale shape per round: two hash joins rank⋈edges + two
    * partial-aggregated groupBys, O(E) each; frames pinned and released
    * on the q217 cadence with a driver-held trace (the q194 pattern). */
  private val HitsScale = 1000000000L
  private val HitsIters = 4
  private val q239Hits: Q = (s, dir) => {
    import s.implicits._
    val docsC = linkGraphDocs(s, dir).cache()
    val n = docsC.count()
    val docs = s.createDataFrame(docsC.rdd, docsC.schema)
    val edgesC = linkGraphRawEdges(docs, n).distinct().cache()
    val edges = s.createDataFrame(edgesC.rdd, edgesC.schema)
    edgesC.count()
    val nodes = docs.select(col("idx"))
    var hC = nodes.select(col("idx"), lit(HitsScale / n).as("x")).cache()
    var h = s.createDataFrame(hC.rdd, hC.schema)
    hC.count()
    def normalized(raw: DataFrame): DataFrame = {
      // raw: (idx, x) un-normalized; rescale to HitsScale total mass —
      // integer `div` so both engines floor identically; the multiply
      // fits int64 (x < PrOutLinks·Scale, ×Scale < 2^63 at Scale 10⁹)
      val tot = raw.agg(sum(col("x")).as("t"))
      nodes.join(raw, Seq("idx"), "left")
        .crossJoin(broadcast(tot))
        .select(col("idx"), expr(s"(coalesce(x, 0) * ${HitsScale}L) div t").as("x"))
    }
    // Per round, only the h vector pins (ONE materialization job): the
    // authority vector and the trace row stay LAZY — a_r is consumed by
    // h_r's pin during the loop and re-evaluated once inside the single
    // final trace action (from the PINNED h_{r−1}, one join+agg+
    // normalize per row — deterministic integer arithmetic, so both
    // evaluations are bit-identical). Was: pin a, pin h, AND a driver
    // head() per round — 3 jobs/round, 3.76 s at sf0.1; now 1 job/round
    // + one union action, ~2.1 s (OPTIMIZATION_r15.md). Every h pin,
    // docs, and edges stay cached until return because the deferred
    // trace rows read them — the q252 layer-retention trade (bounded by
    // HitsIters, a constant); the runner's clearCache releases all.
    val trace = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (r <- 1 to HitsIters) {
      val aRaw = h.join(edges, h("idx") === edges("src"))
        .groupBy(col("dst").as("idx")).agg(sum(col("x")).as("x"))
      // cached WITHOUT its own count() job: h's pin below reads through
      // this InMemoryRelation, so the one hC.count() materializes BOTH
      // vectors; the LogicalRDD rebuild keeps the a-side normalize
      // chain (whose scalar-total attach is a single-row broadcast
      // cross join) out of the returned plan — the trace rows read a
      // flat cached scan instead
      val aC = normalized(aRaw).cache()
      val a = s.createDataFrame(aC.rdd, aC.schema)
      val hRaw = a.join(edges, a("idx") === edges("dst"))
        .groupBy(col("src").as("idx")).agg(sum(col("x")).as("x"))
      hC = normalized(hRaw).cache()
      h = s.createDataFrame(hC.rdd, hC.schema)
      hC.count()
      // both sides' trace aggregates in ONE aggregate over a
      // side-tagged union (the former 1-row × 1-row crossJoin planned
      // as a BroadcastNestedLoopJoin — bounded, but the plan audit
      // rightly has no allowlist for nested-loop shapes)
      trace += a.select(lit(1).as("side"), col("idx"), col("x"))
        .unionAll(h.select(lit(2).as("side"), col("idx"), col("x")))
        .agg(
          sum(when(col("side") === 1, col("x"))).as("sa"),
          max(when(col("side") === 1,
            struct(col("x"), (-col("idx")).as("ni")))).as("ma"),
          sum(when(col("side") === 2, col("x"))).as("sh"),
          max(when(col("side") === 2,
            struct(col("x"), (-col("idx")).as("ni")))).as("mh"))
        .select(lit(r.toLong).as("round"), col("sa").as("sum_a"),
          col("ma.x").as("max_a"), (-col("ma.ni")).as("argmax_a"),
          col("sh").as("sum_h"), col("mh.x").as("max_h"),
          (-col("mh.ni")).as("argmax_h"))
    }
    trace.reduce(_ unionAll _).orderBy(col("round"))
  }

  /** Cross-source duplication matrix — q129's shared-window signal
    * rolled up to the SOURCE grain: how much verbatim text does each
    * pair of sources share? This is the dedup-planning diagnostic a
    * multi-source corpus build runs first (two crawls of the same web
    * with heavy overlap should be deduped against each other before
    * mixture weighting; two disjoint sources need no cross-pass). Same
    * window hashes, same 2..df-cap gate bounding per-hash fan-out, doc
    * pairs counted once (doc_a < doc_b) then aggregated per unordered
    * source pair (src_a ≤ src_b lexicographically; the diagonal is the
    * intra-source duplication mass). Scale contract identical to q129:
    * every stage hash-keyed, no all-pairs product. */
  private val q144SourceOverlap: Q = (s, dir) => {
    val W = DecontamWindow
    val wins = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), toksCol(col("text")).as("tk"))
      .filter(size(col("tk")) >= W)
      .select(col("doc_id"), col("source"), explode(array_distinct(transform(
        sequence(lit(1), size(col("tk")) - (W - 1)),
        i => tokHash(array_join(slice(col("tk"), i, lit(W)), " "))))).as("h"))
      .cache() // consumed twice (df gate + pair join); runner clearCache scopes it
    val shared = wins.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= SubstrDupDfCap)
      .select(col("h"))
    val hits = wins.join(shared, Seq("h"))
    hits.as("x").join(hits.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .select(
        least(col("x.source"), col("y.source")).as("src_a"),
        greatest(col("x.source"), col("y.source")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Corpus snapshot diff — the incremental-maintenance primitive a
    * versioned corpus store runs between builds: which documents were
    * added, removed, or changed since the last snapshot? The testdata
    * carries one snapshot, so v2 is DERIVED deterministically (the
    * q134 synthetic-input discipline, identical in both engines):
    * docs with doc_id % 11 == 0 are dropped, docs with doc_id % 7 == 0
    * get an appended marker token (content change), and every doc with
    * doc_id % 13 == 0 re-enters as a NEW doc at doc_id + 100000. The
    * diff itself is the real operator: a full outer join on doc_id
    * comparing content hashes — one hash-keyed shuffle, no text
    * comparison (hashes travel, not documents), which is what makes a
    * 100 TB diff an 8-byte-per-doc problem. */
  private val q145VersionDiff: Q = (s, dir) => {
    val v1 = Tables.documents(s, dir)
      .select(col("doc_id"), tokHash(col("text")).as("h1"))
    val base = Tables.documents(s, dir)
    val v2 = base.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2marker")))
          .otherwise(col("text")).as("text"))
      .unionByName(base.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      .select(col("doc_id"), tokHash(col("text")).as("h2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h1").isNull, lit("added"))
          .when(col("h2").isNull, lit("removed"))
          .when(col("h1") =!= col("h2"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .orderBy(col("doc_id"))
  }

  /** Mergeable two-level corpus profile ([[MergeProfile]]) — per
    * (source, content-hash shard) algebraic statistics merged to the
    * source grain, while the oracle computes each source's profile
    * DIRECTLY from the documents: the hash match proves the
    * distributed decomposition (profile per shard, merge without
    * re-scan — how a 100 TB build monitors corpus quality) equals
    * single-pass semantics, the q139 discipline applied to
    * aggregation. Exact distinct merges only because shards key on
    * the content hash itself; see [[MergeProfile]] for the contract. */
  private val MergeShardCount = 16L
  private val q146MergeableProfile: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
      .select(col("source"),
        size(toksCol(col("text"))).cast("long").as("n_tokens"),
        tokHash(col("text")).as("h"))
    MergeProfile.profile(docs, MergeShardCount).orderBy(col("source"))
  }

  /** Corpus vocabulary coverage export — the tokenizer-planning
    * diagnostic (how much of the token stream do the top-K types
    * cover? where does coverage flatten?) and the classic Zipf profile
    * in one table: global token frequencies, rank under a total order
    * (freq desc, token asc — deterministic across engines), and
    * cumulative stream coverage per rank. Scale shape: the wordcount
    * groupBy partial-aggregates map-side onto the vocabulary key space
    * (bounded, ≪ corpus), the top-K is a bounded TakeOrdered (never a
    * full global sort materialized), and the only window runs over the
    * K retained rows — a K-row single partition is a constant, not a
    * corpus-shaped serialization point (contrast q139's bucketed
    * windows, which exist precisely because THAT window was
    * corpus-sized). The stream total rides in as a one-row broadcast. */
  private val VocabTopK = 100
  private val q147VocabCoverage: Q = (s, dir) => {
    val cnt = Tables.documents(s, dir)
      .select(explode(toksCol(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("freq"))
    val totalDf = cnt.agg(sum(col("freq")).as("tot"))
    val w = Window.orderBy(col("freq").desc, col("t"))
    cnt.orderBy(col("freq").desc, col("t")).limit(VocabTopK)
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("freq")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(totalDf))
      .select(col("rank"), col("t").as("token"), col("freq"),
        fpRound4(col("cum").cast("double") / col("tot")).as("cum_coverage"))
      .orderBy(col("rank"))
  }

  /** Deterministic per-source token-budget sampling — the mixture-
    * construction step after filtering/dedup: each source contributes
    * documents in a stable hash order (the q86 sampling key, so the
    * sample is reproducible and extension-stable: a re-run over a GROWN
    * corpus keeps every previously-kept doc whose cumulative position
    * still fits) until the source's token budget is exhausted. One
    * window over (source, hash) — partition-local cumulative sums, no
    * driver-side loop, budget arithmetic identical on both engines. */
  private val TokenBudgetPerSource = 800L // binds at sf0.01+ (~1.3k tokens/source)
  private val q130TokenBudget: Q = (s, dir) => {
    val ranked = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(toksCol(col("text"))).cast("long").as("n_tokens"),
        tokHash(concat(col("source"), lit("|"), col("doc_id").cast("string"))).as("rk"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("rk"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ranked
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= TokenBudgetPerSource)
      .select(col("source"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("source"), col("cum_tokens"))
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al.,
    * NeurIPS 2023, arXiv:2302.03169): score every raw document by how
    * much more likely its hashed-n-gram profile is under a TARGET
    * distribution (here the `lang='en'` slice, standing in for the
    * paper's high-quality domain corpus) than under the raw-corpus
    * distribution, then keep the top fraction by importance weight.
    *
    * The importance model is deliberately tiny — bigrams feature-hashed
    * into [[DsirBuckets]] buckets — which is the whole scale story:
    *   1. FIT: one explode → groupBy(bucket) pass produces the ≤B-row
    *      target/raw occurrence table (map-side partial agg collapses
    *      it before the exchange; B is a constant, so the artifact is
    *      driver-safe like a PQ codebook).
    *   2. SCORE: the per-bucket log-likelihood ratios ride back as ONE
    *      broadcast array row; each doc's weight is a codegen'd
    *      aggregate over its own bucket array — zero corpus shuffle.
    * The LLRs are fixed-point-scaled to integer micro-nats before
    * summation, so per-doc totals are EXACT longs in both engines —
    * accumulation order (Spark array fold vs DuckDB group-sum) can
    * never move a 4dp-rounded weight across a compare boundary.
    *
    * The final global rank is a window at the DOC grain (not tokens);
    * at 100 TB the exact rank degrades to an approxQuantile threshold +
    * filter — selection needs the cut point, not per-doc ranks. */
  private[graft] val DsirBuckets = 256
  private[graft] val DsirTargetLang = "en"
  private val DsirKeepFrac = 0.25
  /** The DSIR bucketed-bigram column (q132's feature map) — shared with
    * the streaming ingest scorer so one expression defines the feature
    * space on both tiers. */
  private[graft] def dsirBuckets(df: DataFrame): DataFrame = df
    .withColumn("tk", toksCol(col("text")))
    .withColumn("bk",
      when(size(col("tk")) >= 2,
        transform(bigramsCol(col("tk")), g => tokHash(g) % DsirBuckets))
        .otherwise(array().cast("array<bigint>")))

  /** q132's corpus-global importance fit: add-1-smoothed LLR per hash
    * bucket in integer micro-nats. Exposed for the reference freeze the
    * streaming ingest scores against ([[graft.streaming.CurationIngest]]). */
  private[graft] def dsirLlrFit(s: SparkSession, dir: String): Array[Long] = {
    val counts = dsirBuckets(Tables.documents(s, dir))
      .select(col("lang"), explode(col("bk")).as("b"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("raw_c"),
        sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L)).as("tgt_c"))
      .collect()
    val nr = counts.map(_.getAs[Long]("raw_c")).sum
    val nt = counts.map(_.getAs[Long]("tgt_c")).sum
    // add-1-smoothed LLR per bucket, scaled to integer micro-nats.
    // Buckets with no corpus occurrence can never be probed (every doc
    // bucket IS a corpus occurrence), so their slots stay 0.
    val llr = Array.fill(DsirBuckets)(0L)
    counts.foreach { r =>
      val w = math.log((r.getAs[Long]("tgt_c") + 1.0) / (nt + DsirBuckets)) -
        math.log((r.getAs[Long]("raw_c") + 1.0) / (nr + DsirBuckets))
      llr(r.getAs[Long]("b").toInt) = math.floor(w * 1e6 + 0.5).toLong
    }
    llr
  }

  /** Per-doc DSIR log-weight against a (frozen or fresh) llr array —
    * the scoring half of q132, shared with the streaming ingest. */
  private[graft] def dsirScore(docs: DataFrame, llr: Array[Long]): DataFrame = {
    import docs.sparkSession.implicits._
    val llrDf = Seq(Tuple1(llr.toSeq)).toDF("llr")
    dsirBuckets(docs).crossJoin(broadcast(llrDf))
      .select(col("doc_id"), size(col("bk")).cast("long").as("n_grams"),
        fpRound4(aggregate(col("bk"), lit(0L),
          (a, b) => a + element_at(col("llr"), (b + 1).cast("int")))
          .cast("double") / 1e6).as("log_w"))
  }

  private val q132DsirSelect: Q = (s, dir) => {
    import graft.operators.DistributedSelect
    // the selection rank (log_w desc, doc_id asc) over EVERY document is
    // corpus-sized — `row_number().over(Window.orderBy(…))` would funnel
    // the corpus through one task (this repo's named scale-killer). The
    // (log_w, doc_id) pair packs into one unique long key — log_w is
    // 4dp-floored, so log_w·10⁴ is an exact integer on both engines —
    // and the two-level prefix sum ranks it; the oracle keeps the
    // sequential window spec, so the hash match proves the decomposition.
    val M = 1L << 24    // doc_id cap
    val CapW = 1L << 20 // |log_w·10⁴| cap (|log_w| ≤ ~104 nats)
    val scored = dsirScore(Tables.documents(s, dir), dsirLlrFit(s, dir))
      .withColumn("le4", floor(col("log_w") * 1e4 + 0.5).cast("long"))
      .cache()
    val g = scored.agg(max(abs(col("le4"))), max(col("doc_id")), count(lit(1))).head()
    require(g.getLong(0) < CapW && g.getLong(1) < M,
      "composed-key caps exceeded — widen the key packing")
    val n = g.getLong(2)
    val keyed = scored.withColumn("k", (lit(CapW) - col("le4")) * M + col("doc_id"))
    DistributedSelect.globalRowNumber(keyed, "k", "rnk", 1L << 29)
      .select(col("doc_id"), col("n_grams"), col("log_w"), col("rnk"),
        (col("rnk") <= math.ceil(n * DsirKeepFrac).toLong).cast("int").as("selected"))
  }

  /** CCNet-style n-gram LM perplexity filter (Wenzek et al. 2020,
    * arXiv:1911.00359): train an add-1-smoothed bigram language model
    * PER LANGUAGE on that language's own slice, score every document's
    * per-token cross-entropy under its language's model, and cut each
    * language into the paper's head/middle/tail thirds by fluency —
    * the standard "keep head+middle, drop tail" pre-training gate.
    *
    * P(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁)+V); a head word never observed
    * heading a bigram falls back to 1/V. Both log terms are fixed-point
    * scaled to integer micro-nats BEFORE the per-doc sum (the q132
    * trick), so doc totals are exact longs in both engines and the 4dp
    * cross-entropy can never straddle a compare boundary by
    * accumulation order.
    *
    * Scale shape: the five LMs train in the SAME two groupBy passes
    * (key = (lang, gram)); model tables are vocabulary-bounded, ≪
    * corpus, so the scoring joins hash-partition on bounded keys (AQE
    * broadcasts them when small). The bucket cut is a window
    * PARTITIONED BY lang — per-language parallel, never a global sort.
    * CCNet prunes its KenLM; the add-1 bigram model is the same gate
    * arithmetic without the binary model dependency. Docs with no
    * bigrams take ce=0 (most-fluent edge, deterministic). */
  /** Per-(doc, lang) labeled bigram occurrences — q133's feature
    * explode, shared with the streaming ingest scorer. */
  private[graft] def lmOccurrences(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), toksCol(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(zip_with(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1),
          (a, b) => struct(concat(a, lit(" "), b).as("g"), a.as("h")))).as("s"))
      .select(col("doc_id"), col("lang"), col("s.g").as("g"), col("s.h").as("h"))

  /** q133's corpus-global per-language LM fit: (bigram numerators,
    * head-word denominators, vocab defaults), every log fixed-point
    * scaled to integer micro-nats. Exposed for the reference freeze the
    * streaming ingest scores against ([[graft.streaming.CurationIngest]]);
    * `occ` is the (cached) [[lmOccurrences]] frame. */
  private[graft] def lmFit(docs: DataFrame, occ: DataFrame):
      (DataFrame, DataFrame, DataFrame) = {
    def s6(c: Column): Column = floor(c * 1e6 + 0.5).cast("long") // micro-nats
    val toks = docs.select(col("lang"), toksCol(col("text")).as("tk"))
    val vocab = toks.select(col("lang"), explode(col("tk")).as("w"))
      .groupBy(col("lang")).agg(countDistinct(col("w")).as("v"))
      .select(col("lang"), col("v"), s6(log(col("v").cast("double"))).as("den_def"))
    val c2 = occ.groupBy(col("lang"), col("g")).agg(count(lit(1)).as("c2"))
      .select(col("lang"), col("g"), s6(log(col("c2") + lit(1.0))).as("num_s"))
    val c1 = occ.groupBy(col("lang"), col("h")).agg(count(lit(1)).as("c1"))
      .join(vocab.select(col("lang"), col("v")), Seq("lang"))
      .select(col("lang"), col("h"), s6(log((col("c1") + col("v")).cast("double"))).as("den_s"))
    (c2, c1, vocab.select(col("lang"), col("den_def")))
  }

  /** Per-doc cross-entropy of `docs` under a (frozen or fresh) LM fit —
    * the scoring half of q133, shared with the streaming ingest. */
  private[graft] def lmScore(docs: DataFrame, c2: DataFrame, c1: DataFrame,
      vocabDef: DataFrame): DataFrame = {
    val ds = lmOccurrences(docs)
      .join(c2, Seq("lang", "g"), "left")
      .join(c1, Seq("lang", "h"), "left")
      .join(vocabDef, Seq("lang"))
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("num_s"), lit(0L)) - coalesce(col("den_s"), col("den_def"))).as("sw"),
        count(lit(1)).as("m"))
    docs.select(col("doc_id"), col("lang"))
      .join(ds, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("m"), lit(0L)).as("n_bigrams"),
        fpRound4(when(col("m") > 0,
          -(col("sw").cast("double") / 1e6 / col("m"))).otherwise(lit(0.0))).as("ce"))
  }

  private val q133NgramLmPpl: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val occ = lmOccurrences(docs)
      .cache() // 3 consumers (c2 fit, c1 fit, scoring); runner clearCache scopes it
    val (c2, c1, vocabDef) = lmFit(docs, occ)
    val scored = lmScore(docs, c2, c1, vocabDef)
    val w = Window.partitionBy(col("lang")).orderBy(col("ce"), col("doc_id"))
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("lang"))))
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("ce"),
        when(col("rn") * 3 <= col("cnt"), "head")
          .when(col("rn") * 3 <= col("cnt") * 2, "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** PII scrubbing gate ([[TextOps.scrubPii]]): mask emails, IPv4
    * addresses, and dashed phone numbers before training — the
    * anonymization step of CCNet-lineage pipelines. Scan-shaped: three
    * codegen'd regexp passes plus per-class match counts, zero shuffle.
    *
    * The corpus testdata carries no natural PII, which would leave the
    * regex engines untested by a pass-through compare — so the query
    * first APPENDS deterministic doc_id-derived PII (an email, an IP
    * octet keyed on doc_id, a phone) to every text. Both engines build
    * the same augmented string from table data and must then scrub it
    * identically: the oracle hash-compares the scrubbed TEXT, making
    * this a real cross-dialect regex-semantics gate (Java regex vs
    * RE2), not a vacuous equality of untouched strings. */
  private val q134PiiScrub: Q = (s, dir) => {
    val aug = concat(col("text"),
      lit(" reach user"), col("doc_id").cast("string"),
      lit("@mail.example.org or 10.0."), (col("doc_id") % 200).cast("string"),
      lit(".7 call 555-123-4567"))
    Tables.documents(s, dir)
      .withColumn("aug", aug)
      .select(col("doc_id"),
        TextOps.piiCount(col("aug"), TextOps.PiiEmail).as("n_email"),
        TextOps.piiCount(col("aug"), TextOps.PiiIpv4).as("n_ip"),
        TextOps.piiCount(col("aug"), TextOps.PiiPhone).as("n_phone"),
        TextOps.scrubPii(col("aug")).as("text_scrubbed"))
  }

  /** Model-based quality classifier — the FineWeb-Edu / fastText-filter
    * pattern: instead of running a hand-rule labeler over everything
    * forever, TRAIN a cheap classifier on its labels and filter with
    * the model. Features are hashed-bigram buckets (MLlib HashingTF →
    * sparse vectors, the DSIR hashing trick); the weak label is the
    * q33 quality gate — a text-DERIVED teacher, which is the point:
    * the classifier must distill the rule, and a held-out AUC ≈ 0.5
    * would expose a label that text cannot predict (the corpus's
    * `lang` column is exactly such a label — same 31-word vocabulary
    * in every language — and is deliberately NOT used). Train on a
    * deterministic doc_id split, score EVERYTHING, gate invariants:
    * probabilities in range, threshold-consistent predictions,
    * held-out AUC ≥ 0.8 (measured ≈ 0.91), and real separation of the
    * mean scores (≈ 0.79 vs 0.11). Like q91/q92, the oracle pins the
    * gate VECTOR (plus the corpus-derived row count) — an iterative
    * L-BFGS fit has no SQL twin, but the properties a correct fit
    * guarantees do. Scale: training is one treeAggregate per iteration
    * over a 256-dim gradient — corpus scans with O(buckets) driver
    * state; scoring is a broadcast-coefficient map. */
  private val q135QualityClassifier: Q = (s, dir) => {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .withColumn("tk", toksCol(col("text")))
      .withColumn("bg", when(size(col("tk")) >= 2, bigramsCol(col("tk")))
        .otherwise(array().cast("array<string>")))
      .withColumn("label",
        (TextOps.quality(col("tk")) >= TextOps.QualityGate).cast("double"))
      .withColumn("is_test", col("doc_id") % 5 === 0)
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("bg").setOutputCol("features").setNumFeatures(DsirBuckets)
    val feat = tf.transform(docs).cache()
    try {
      val lr = new org.apache.spark.ml.classification.LogisticRegression()
        .setMaxIter(50).setRegParam(0.01)
        .setFeaturesCol("features").setLabelCol("label")
      val model = lr.fit(feat.filter(!col("is_test")))
      val scored = model.transform(feat).select(col("doc_id"), col("label"),
        col("is_test"), col("prediction"),
        org.apache.spark.ml.functions.vector_to_array(col("probability"))
          .getItem(1).as("p1"))
        .cache()
      // one pass for the frame invariants (q91 discipline)
      val st = scored.agg(
        count(lit(1)).as("n"),
        sum(when(col("p1") < 0 || col("p1") > 1, 1L).otherwise(0L)).as("oor"),
        sum(when((col("p1") >= 0.5 && col("prediction") =!= 1.0) ||
          (col("p1") < 0.5 && col("prediction") =!= 0.0), 1L).otherwise(0L)).as("inc"),
        avg(when(col("is_test") && col("label") === 1.0, col("p1"))).as("pt"),
        avg(when(col("is_test") && col("label") === 0.0, col("p1"))).as("pn"))
        .head()
      val auc = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
        .setRawPredictionCol("probability").setLabelCol("label")
        .evaluate(model.transform(feat.filter(col("is_test"))))
      scored.unpersist()
      Seq((st.getLong(0), st.getLong(1), st.getLong(2),
        if (auc >= 0.8) 1 else 0,
        if (st.getDouble(3) > st.getDouble(4) + 0.3) 1 else 0))
        .toDF("n_scored", "n_out_of_range", "n_threshold_inconsistent",
          "auc_gate", "sep_gate")
    } finally feat.unpersist()
  }

  /** The round-9 curation pipeline composed end-to-end (q85 is the
    * round-2-era composition; this chains the modern stages): Unicode
    * NFC normalization → PII scrubbing → the Gopher A1.2 repetition
    * gate → exact dedup on the CLEANED text (first doc_id wins per
    * content hash — dedup after normalization, because two docs that
    * differ only by encoding or a scrubbed email ARE duplicates) →
    * per-source token budgeting in stable hash order. ONE lazy plan:
    * three scan stages, a hash-keyed dedup window, and the
    * source-partitioned budget window — no global sort, no all-pairs,
    * nothing driver-side. The oracle chains the SAME five stages
    * relationally (shared repetition CTEs, same hash arithmetic), so
    * the composition — not just each stage — is hash-verified: a stage
    * applied in the wrong order (scrub after hashing, budget before
    * dedup) produces a different kept-set. */
  private val q137CurationPipeline: Q = (s, dir) => {
    // MATERIALIZE the cleaned text AND the stat battery (runner-scoped
    // caches, the q129 discipline) before filtering: predicate pushdown
    // rewrites a filter-on-derived-flag through every projection it
    // crosses regardless of expression cost, so an uncached
    // filter(rep_pass) inlines all nine interpreted gram pipelines —
    // AND the NFC+3-regex text2 chain under them — into one
    // single-partition scan predicate. At sf0.1 that turned this stage
    // into a ~30-minute single task; with the stats frame cached the
    // filter reads a stored column and the battery is computed once
    // per row (the q131 projection cost).
    val clean = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        TextOps.scrubPii(call_function("nfc_normalize", col("text"))).as("text2"))
      .cache()
    val gated = TextOps.repetitionRules(clean, "text2")
      .select(col("doc_id"), col("source"), col("text2"), col("rep_pass"))
      .cache()
      .filter(col("rep_pass") === 1)
      .select(col("doc_id"), col("source"), col("text2"))
    val wD = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    val deduped = gated
      .withColumn("h", tokHash(col("text2")))
      .withColumn("rn", row_number().over(wD))
      .filter(col("rn") === 1)
    val ranked = deduped.select(col("doc_id"), col("source"),
      size(toksCol(col("text2"))).cast("long").as("n_tokens"),
      tokHash(concat(col("source"), lit("|"), col("doc_id").cast("string"))).as("rk"))
    val wB = Window.partitionBy(col("source")).orderBy(col("rk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ranked.withColumn("cum_tokens", sum(col("n_tokens")).over(wB))
      .filter(col("cum_tokens") <= TokenBudgetPerSource)
      .select(col("source"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
  }

  /** The FULL curation canon composed (q137 predates the round-9
    * quality tier; this chains it): Gopher A1.1 quality battery (q127)
    * ∧ A1.2 repetition battery (q131) → CCNet perplexity tercile, drop
    * the tail (q133) → DSIR importance selection, keep the top quarter
    * (q132) → exact dedup on content (first doc_id per hash) →
    * decontamination (drop eval docs and the q75 quarantine) → sequence
    * packing per source (q77 windows). Every stage's criterion is THE
    * STANDALONE QUERY'S OWN definition computed over the full corpus
    * (the LM fits, DSIR rank, and terciles are corpus-global exactly as
    * q132/q133 run them), then cascaded as semi-joins — so the spec can
    * assert each stage boundary equals the standalone keep-sets'
    * intersection, and the oracle hash-checks the COMPOSITION (a stage
    * reordered or a fit narrowed to survivors produces a different
    * kept-set). One lazy plan up to the inherited stage
    * materializations (q132's bounded bucket fit, q133's occ cache,
    * q75's rare-shingle index — the same runner-scoped caches the
    * standalone queries use). The per-flag battery frames are cached
    * before their filters — the q137 discipline: an uncached
    * filter-on-derived-flag inlines the interpreted gram pipelines into
    * the scan predicate.
    *
    * Composition point — WIRED as its own canon since r15 (the q85
    * precedent): q258's Kneser–Ney perplexity gate slots in as one
    * more `.join(knKeep, Seq("doc_id"), "left_semi")` beside
    * `pplKeep` — its keep-set is corpus-global exactly like q133's,
    * so the cascade algebra is unchanged. q196 itself stays frozen
    * (knGate = false) so this canon's oracle and stage-boundary spec
    * never move; the composed pipeline is served and oracle-checked
    * separately as q261 (knGate = true), whose oracle re-derives the
    * identical cascade with the KN keep-set CTE added to `gated`. */
  private val q196CurationCanon: Q = (s, dir) => curationCanonImpl(s, dir, knGate = false)

  /** q261: the q196 curation cascade WITH the q258 KN perplexity gate
    * composed at the gating stage (r14 verdict #5 closed by wiring).
    * Same scale shape as q196 plus q258's vocabulary-bounded LM score
    * and two bounded threshold passes; the extra gate is one more
    * doc_id semi-join. */
  private val q261CurationKn: Q = (s, dir) => curationCanonImpl(s, dir, knGate = true)

  private def curationCanonImpl(s: SparkSession, dir: String, knGate: Boolean): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"), col("text"))
    // A1.1 conjunction MINUS the distinct-stop-word rule: the synthetic
    // corpus's 31-word template vocabulary carries ≤1 distinct stopword
    // per doc, so r_stop rejects 100% of every SF and composing it
    // would make this pipeline (and its oracle) vacuously empty. The
    // Gopher paper's thresholds are English-web-tuned and per-corpus
    // configurable by design; the full conjunction (r_stop included)
    // still ships and is oracle-checked standalone in q127.
    // gopher + repetition are PER-ROW batteries that preserve their
    // input, so both evaluate in ONE projection over ONE documents scan
    // (the q246 composition — was: two standalone battery scans plus
    // two doc_id semi-join shuffles back onto a third docs scan).
    // CurationCanonSpec still proves the keep-set equals the standalone
    // q127/q131 criteria — the contract is set identity, which a shared
    // scan cannot move. ppl/dsir stay semi joins: their criteria need
    // corpus-level fits (LM tables, DSIR buckets), not row-local flags.
    val grScored = TextOps.repetitionRules(
        TextOps.gopherRules(docs, "text"), "text")
      .select(col("doc_id"), col("source"), col("text"),
        (col("r_words") * col("r_mean_len") * col("r_symbol") *
          col("r_alpha") * col("r_bullet") * col("r_ellipsis")).as("gop_keep"),
        col("rep_pass")).cache()
    val grKept = grScored
      .filter(col("gop_keep") === 1 && col("rep_pass") === 1)
      .select(col("doc_id"), col("source"), col("text"))
    val pplKeep = q133NgramLmPpl(s, dir)
      .filter(col("ppl_bucket") =!= "tail").select("doc_id")
    // The corpus-global stage FITS each run a short chain of DRIVER
    // actions (q132: LLR fit collect + caps agg + rank histogram; q258:
    // the two kthFromTotal passes; q75: the corpus count) that are
    // mutually INDEPENDENT — only the assembled cascade below consumes
    // them. Sequential driver code was the only thing serializing those
    // chains (guide §2.6), so they run from a small thread pool and the
    // tail of one fit's jobs back-fills the others' idle scheduler
    // slots — the q260 two-sweep pattern. q133 stays inline: it is a
    // lazy frame with no driver action of its own. Determinism: each
    // chain is internally unchanged and the assembly consumes the same
    // frames; fits are corpus-global so no ordering between them exists.
    val (dsirKeep, knKeepOpt, flagged) = {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      try {
        val dsirF = Future(q132DsirSelect(s, dir)
          .filter(col("selected") === 1).select("doc_id"))
        val knF =
          if (!knGate) None
          else Some(Future(q258KnPplGate(s, dir)
            .filter(col("keep") === 1).select("doc_id")))
        val flaggedF = Future(q75Contamination(s, dir)
          .select(col("train_id").as("doc_id")).distinct())
        // grScored heads the final action's LONGEST chain (battery
        // projection -> semi joins -> dedup window -> packing); its
        // cache would otherwise materialize only inside that action,
        // serially AFTER every fit chain. Pinning it here overlaps the
        // battery scan with the fits (one extra job, fully back-filled).
        val grF = Future(grScored.count())
        Await.result(grF, Duration.Inf)
        (Await.result(dsirF, Duration.Inf),
          knF.map(Await.result(_, Duration.Inf)),
          Await.result(flaggedF, Duration.Inf))
      } finally pool.shutdown()
    }
    val afterPpl = grKept
      .join(pplKeep, Seq("doc_id"), "left_semi")
    val afterKn = knKeepOpt.fold(afterPpl)(kn =>
      afterPpl.join(kn, Seq("doc_id"), "left_semi"))
    val gated = afterKn
      .join(dsirKeep, Seq("doc_id"), "left_semi")
    val wD = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    val deduped = gated
      .withColumn("h", tokHash(col("text")))
      .withColumn("rn", row_number().over(wD))
      .filter(col("rn") === 1)
    val clean = deduped
      .filter(col("doc_id") % 10 =!= 0)
      .join(flagged, Seq("doc_id"), "left_anti")
    val wB = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    clean
      .withColumn("n_tokens", size(toksCol(col("text"))).cast("long"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(wB), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"cum_before div $PackWindow").as("pack_id"))
      .orderBy(col("doc_id"))
  }

  /** Link-graph centrality (PageRank, Page et al. 1999) — the web-graph
    * quality-weighting signal large crawl curations rank sources by
    * (OpenWebText's karma filter, Common Crawl's harmonic-centrality
    * ranking are this family): documents with more incoming references
    * from well-referenced documents weigh more in the mixture.
    *
    * The corpus tables carry no link column, so the graph is DERIVED
    * deterministically: node u (dense doc index) attempts
    * [[PrOutLinks]] out-links to `rollingHash(u # j) mod N` — a
    * nonlinear map, so in-degrees vary (an affine map would make every
    * in-degree equal and the stationary vector uniform, gating
    * nothing). Self-loops dropped, duplicate targets collapsed. Both
    * engines build the identical edge set from the same hash.
    *
    * Exactness: ranks live in integer micro-mass units ([[PrScale]]
    * total) and every step is integer arithmetic — contribution =
    * `rank div out_degree`, update = `base + (85·Σcontrib) div 100` —
    * so after [[PrIters]] synchronous iterations both engines hold
    * bit-identical longs; no float accumulation order to diverge on.
    * Mass lost to floor-division (and to the measure-zero case of a
    * node whose every attempted link is a self-loop) leaks identically
    * on both sides.
    *
    * Scale shape: the rank vector is O(N) rows, edges O(3N); each
    * iteration is one hash-join ranks⋈edges (both keyed on src — AQE
    * reuses the partitioning) + one partial-aggregated groupBy(dst) +
    * one left join back to nodes for zero-in-degree rows. Edges and
    * the node frame are cached once and reused across all iterations.
    * The dense index comes from [[linkGraphDocs]] — the two-level
    * prefix-sum global rank, NOT a single-task window sort; a
    * production corpus brings its own link table with real node ids,
    * and no global ranking exists on that path at all. */
  private val PrScale    = 1000000000000L // total mass, micro-units
  private val PrIters    = 5
  private val PrOutLinks = 3

  /** Shared node-index derivation for the link-graph family (q138
    * PageRank, q161 triangles, q169 BFS, q180 assortativity, q194
    * k-core, q217 SSSP). The dense index comes from
    * [[graft.operators.DistributedSelect.globalRowNumber]] — a two-level
    * prefix sum (bounded bucket histogram + per-bucket parallel sorts) —
    * NOT from `row_number().over(Window.orderBy(...))`, whose
    * unpartitioned window funnels the whole corpus through ONE task
    * (this repo's named scale-killer; DistributedSelectProps proves the
    * two derivations assign identical ranks). doc_ids are unique
    * nonnegative longs, so the rank is deterministic and the oracle's
    * `row_number() OVER (ORDER BY doc_id)` still hash-matches. */
  private[llm] def linkGraphDocs(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables.documents(s, dir).select(col("doc_id"))
    // width sized off the id range: ≤ ~1k histogram buckets driver-side
    val mx = ids.agg(max(col("doc_id"))).first().getLong(0)
    graft.operators.DistributedSelect
      .globalRowNumber(ids, "doc_id", "rk", math.max(1L, mx / 1024 + 1))
      .select(col("doc_id"), (col("rk") - 1L).cast("long").as("idx"))
  }

  /** Directed hash-derived out-links of the shared link graph, BEFORE
    * dedup: u → rollingHash(u#j) mod n for j ∈ 1..[[PrOutLinks]],
    * self-loops dropped (see q138's scaladoc for why the map must be
    * nonlinear). Callers finish the derivation — `.distinct()` for the
    * directed graph, least/greatest+distinct to symmetrize, or a
    * weight column — so no query pays an extra shuffle over what its
    * own edge shape needs. */
  private[llm] def linkGraphRawEdges(docs: DataFrame, n: Long): DataFrame =
    docs.select(col("idx").as("src"),
        explode(sequence(lit(1), lit(PrOutLinks))).as("j"))
      .select(col("src"),
        (tokHash(concat(col("src").cast("string"), lit("#"), col("j").cast("string"))) % n).as("dst"))
      .filter(col("src") =!= col("dst"))

  private val q138PageRank: Q = (s, dir) => {
    val docs = linkGraphDocs(s, dir).cache()
    val n = docs.count()
    val edges = linkGraphRawEdges(docs, n)
      .distinct()
      .cache()
    PageRank.run(docs, edges, PrScale, PrIters)
      .join(docs, "idx")
      .select(col("doc_id"), col("pr"))
      .orderBy(col("doc_id"))
  }

  /** Triangle counting + local clustering coefficient over the q138
    * link graph — the other standard graph-shape signal corpus curation
    * reads (clustering separates hub-spam link farms from organically
    * interlinked clusters; triangles are also the kernel of community
    * detection). The Spark side runs the DEGREE-ORDERED orientation
    * (compact-forward, Latapy 2008 / Schank-Wagner node-iterator): rank
    * every vertex by (degree, id), orient each undirected edge from the
    * lower- to the higher-ranked endpoint, and close wedges
    * lo→mid→hi with the lo→hi edge. That bounds the wedge join's
    * per-vertex fan-out by the max ORIENTED out-degree (O(√m) on any
    * graph) instead of the max raw degree — the difference between a
    * plan that survives a power-law web graph and one whose hub vertex
    * materializes a quadratic wedge set. The oracle enumerates the same
    * triangles under the naive id-orientation; per-node triangle counts
    * are orientation-invariant, so the hash match proves the
    * degree-ordered decomposition computes the textbook spec (the q139
    * discipline applied to graphs). Clustering = 2T/(d(d−1)) on the
    * floor-form 4dp grid; degree-0/1 vertices pin 0. */
  private val q161Triangles: Q = (s, dir) => {
    val docs = linkGraphDocs(s, dir).cache()
    val n = docs.count()
    val und = linkGraphRawEdges(docs, n)
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .cache()
    val deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
      .cache()
    val oriented = und
      .join(deg.toDF("a", "da"), "a")
      .join(deg.toDF("b", "db"), "b")
      .select(when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("lo"), col("b").as("hi")))
        .otherwise(struct(col("b").as("lo"), col("a").as("hi"))).as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
      .cache()
    val tris = oriented.toDF("x", "y")
      .join(oriented.toDF("y", "z"), "y")
      .join(oriented.toDF("x", "z"), Seq("x", "z"))
    val perNode = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("t"))
    docs
      .join(deg.toDF("idx", "degree"), Seq("idx"), "left")
      .join(perNode.toDF("idx", "n_tri"), Seq("idx"), "left")
      .select(col("doc_id"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("clustering",
        when(col("degree") >= 2,
          fpRound4(col("n_tri").cast("double") * 2.0 /
            (col("degree") * (col("degree") - 1)).cast("double")))
        .otherwise(lit(0.0)))
      .orderBy(col("doc_id"))
  }

  /** Multi-source BFS reachability over the q138 link graph — the
    * frontier expansion behind crawl-depth analysis and seed-set
    * coverage audits (how much of the corpus is within k hops of the
    * trusted seeds — OpenWebText-style seed filtering reads exactly
    * this). The Spark side runs the textbook distributed BFS: a cached
    * visited set, and per round ONE hash-join frontier⋈edges + distinct
    * + anti-join against visited — work proportional to the FRONTIER,
    * never the graph, and the hop count (not the diameter estimate) is
    * the fixed [[BfsHops]] bound, so the plan is a bounded chain of
    * joins over materialized layers. The anti-join IS the min-hop
    * guarantee: a node enters the visited set the first round it is
    * seen. Iteration discipline: each layer is cached, materialized by
    * ONE count per round, and then REBUILT as a flat LogicalRDD over its
    * cached rows — a layer feeds BOTH the next frontier join and the
    * visited anti-join, so with lazy lineage the LOGICAL plan grows
    * ~2.4× per round (exponential: observed first as a driver OOM, and
    * after cache-only materialization as ~4.6 s/run of pure
    * analyzer/optimizer time on a 5k-node graph — caching stops
    * re-execution, not plan growth). The RDD-backed rebuild is the
    * standard iterative-graph truncation (what GraphX checkpointing
    * exists for): every round then plans against bounded flat scans,
    * and the count doubles as the empty-frontier early exit. The oracle
    * restates the search as a recursive CTE whose UNION dedups (v, hop) states
    * and takes min(hop) per node — matching hash proves the iterative
    * frontier algorithm computes the declarative fixpoint spec. Output
    * is the per-hop reachability profile (bounded rows) with an idx-sum
    * checksum per layer. */
  private val BfsHops = 6
  private val q169BfsReach: Q = (s, dir) => {
    val docs = linkGraphDocs(s, dir).cache()
    val n = docs.count()
    val edges = linkGraphRawEdges(docs, n)
      .distinct()
      .cache()
    // materialize the cache, then detach the lineage: downstream rounds
    // see a flat scan of the cached rows, not the growing plan tree
    def pinned(df: DataFrame): DataFrame = {
      val c = df.cache()
      c.count()
      s.createDataFrame(c.rdd, c.schema)
    }
    val seeds = pinned(docs.filter(col("idx") % 97 === 0)
      .select(col("idx").as("v"), lit(0L).as("hop")))
    val layers = scala.collection.mutable.ArrayBuffer[DataFrame](seeds)
    var visited = seeds.select(col("v"))
    var frontier = seeds
    var h = 1
    var growing = true
    while (h <= BfsHops && growing) {
      val nxt = frontier.join(edges, frontier("v") === edges("src"))
        .select(col("dst").as("v")).distinct()
        .join(visited, Seq("v"), "left_anti")
        .select(col("v"), lit(h.toLong).as("hop"))
        .cache()
      if (nxt.count() == 0) { nxt.unpersist(); growing = false }
      else {
        val flat = s.createDataFrame(nxt.rdd, nxt.schema)
        layers += flat
        visited = visited.union(flat.select(col("v")))
        frontier = flat
      }
      h += 1
    }
    layers.reduce(_ union _).groupBy(col("hop"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("v")).as("idx_checksum"))
      .orderBy(col("hop"))
  }

  /** Seeded harmonic centrality (Boldi & Vigna 2014, "Axioms for
    * Centrality" — harmonic is the closeness variant that handles
    * disconnected graphs correctly; Eppstein & Wang 2001 for why a
    * seed SAMPLE estimates it) over the shared link graph: H_S(v) =
    * Σ_{s∈S, 0<d(s,v)≤[[HcHops]]} 1/d(s,v) from the q169 seed set
    * (idx % 97). This is the missing member of the graph tier's
    * centrality family — PageRank/Katz/HITS weigh WALKS, harmonic
    * weighs SHORTEST PATHS (a hub that is 2 hops from everywhere beats
    * one with many redundant in-links; crawl-frontier prioritization
    * and influence radius read this form).
    *
    * EXACT on the hop grid: contributions are 60/d — an exact integer
    * for every d ∈ 1..6 (60 = lcm(1..6)) — so H·60 is a plain long sum
    * and cross-engine equality is structural, no float anywhere.
    *
    * Scale shape: a multi-source BFS carrying (seed, node) pairs —
    * each round is ONE frontier⋈edges hash join + a pair-distinct +
    * an anti-join against the visited pair set (the q169 round shape
    * on a compound key), rounds pinned as flat LogicalRDDs (the q169
    * analyzer-bound discipline). State is |S|·reach pairs; the seed
    * set is a 1/97 sample here for determinism, and the Eppstein–Wang
    * bound says O(log n/ε²) seeds suffice at ANY corpus size, so at
    * 100 TB the sample is a CONSTANT few hundred seeds and state is
    * O(|V|·|S|) with small |S| — never all-pairs. Output is a
    * TakeOrdered(20) head by (H·60, doc_id). */
  private val HcHops = 6
  private val q252Harmonic: Q = (s, dir) => q252HarmonicImpl(s, dir, _ => ())

  /** q252 with a per-round hook (CacheContractSpec's mid-query storage
    * seam — the q194KcoreImpl pattern). Cache discipline differs from
    * q217's per-round release ON PURPOSE: the output union reads EVERY
    * BFS layer, so layers stay cached until return (the q194-trace
    * trade, documented in the query scaladoc) — live storage is
    * docs + edges + seeds + ≤[[HcHops]] layers, a CONSTANT bound set
    * by the hop cap, never by corpus size; the runner's clearCache
    * releases all of it (the query-scoped-cache contract). */
  private[graft] def q252HarmonicImpl(s: SparkSession, dir: String,
      onRound: Int => Unit): DataFrame = {
    val docs = linkGraphDocs(s, dir).cache()
    val n = docs.count()
    val edges = linkGraphRawEdges(docs, n)
      .distinct()
      .cache()
    def pinned(df: DataFrame): DataFrame = {
      val c = df.cache()
      c.count()
      s.createDataFrame(c.rdd, c.schema)
    }
    val seeds = pinned(docs.filter(col("idx") % 97 === 0)
      .select(col("idx").as("s"), col("idx").as("v"), lit(0L).as("d")))
    val layers = scala.collection.mutable.ArrayBuffer[DataFrame](seeds)
    var visited = seeds.select(col("s"), col("v"))
    var frontier = seeds
    var h = 1
    var growing = true
    while (h <= HcHops && growing) {
      val nxt = frontier.join(edges, frontier("v") === edges("src"))
        .select(col("s"), col("dst").as("v")).distinct()
        .join(visited, Seq("s", "v"), "left_anti")
        .select(col("s"), col("v"), lit(h.toLong).as("d"))
        .cache()
      if (nxt.count() == 0) { nxt.unpersist(); growing = false }
      else {
        val flat = s.createDataFrame(nxt.rdd, nxt.schema)
        layers += flat
        visited = visited.union(flat.select(col("s"), col("v")))
        frontier = flat
      }
      onRound(h)
      h += 1
    }
    layers.reduce(_ union _)
      .filter(col("d") > 0) // a seed's own 0-distance row carries no mass
      .groupBy(col("v"))
      .agg(sum(expr("60 div d")).as("h60"), // integer div: exact for d ∈ 1..6
        count(lit(1)).as("n_seeds_reaching"))
      .join(docs, col("v") === docs("idx"))
      .select(col("doc_id"), col("h60"), col("n_seeds_reaching"))
      .orderBy(col("h60").desc, col("doc_id"))
      .limit(20)
  }

  /** Seed-pair ("pivot") betweenness centrality (Brandes & Pich 2007,
    * "Centrality Estimation in Large Networks"; Anthonisse 1971 /
    * Freeman 1977 for the measure) over the shared directed link
    * graph — the r13 stretch directive, closed WITHOUT fractional
    * accumulation: the declared blocker was Brandes' backward pass
    * (δ sums of σ-ratios — no clean exact oracle), so this restates
    * the estimator PAIRWISE over the bounded pivot set S — an
    * ABSOLUTE-size hash-order sample of [[BcSeedCap]] nodes (top-C by
    * a salted rolling hash with idx tie-break, planned as
    * TakeOrderedAndProject: a distributed heap, never a global sort —
    * the q231 constant-cap pattern; r14 verdict #1): for s, t ∈ S with
    * d(s,t) ≤ [[BcHops]],
    *   bc(v) += σ_sv · σ_vt / σ_st   when d(s,v) + d(v,t) = d(s,t)
    * — Brandes' own pair-dependency identity, no recursion. Each term
    * is micro-floored INTEGER arithmetic: path counts are exact longs
    * (σ ≤ outdeg^h = 3⁶ = 729 on the hop-capped DAG, so
    * σ_sv·σ_vt·10⁶ ≤ 5.4·10¹¹ — documented long bound), the term is
    * one integer division ⌊10⁶·σσ/σ_st⌋, and bc·10⁶ is a plain long
    * sum of those grid points — order-independent, hash-matchable.
    * EXACT (not sampled) on the declared restriction: all shortest
    * paths between seed pairs within the hop cap; a fixed-SIZE pivot
    * set is the Brandes–Pich prescription at any scale (their bounds
    * are functions of the PIVOT COUNT, Hoeffding-style, independent of
    * n — so a constant C keeps the estimator's concentration constant
    * while the r14 `idx % 97` form, a fixed sampling RATE, grew |S| =
    * Θ(N/97) and made every |S|²-shaped structure below quadratic in
    * the corpus). The ε consequence of fixing C: the pair sample is
    * C·(C−1) of the ~ (N/C)² pairs each pivot pair represents, so the
    * per-node estimate concentrates as O(√(ln N / C)) of the max pair
    * dependency — raising C tightens it; the STRUCTURES below stay
    * C²-bounded at any corpus either way.
    *
    * Scale shape: TWO multi-source BFS sweeps of the q252 round shape
    * carrying a path-count column (forward from S on edges, backward
    * from S on reversed edges — σ_new = map-side-combinable SUM over
    * frontier predecessors, then the same pair-anti-join), each
    * O(|S|·reach) state with |S| ≤ C CONSTANT; the dependency join is
    * keyed on v with ≤C² per-node fanout and the σ_st pair table is
    * ≤C·(C−1) rows broadcast — both runtime-guarded (the q231
    * constant-broadcast contract), never Θ(N²/9409) as the r14 rate
    * form allowed. Rounds pinned as flat LogicalRDDs (the q169
    * analyzer-bound discipline); layers stay cached until return (the
    * q252 trade — the output union reads all of them). Output:
    * TakeOrdered(20) by (bc_micro desc, doc_id). */
  private val BcHops = 6
  private val BcSeedCap = 64
  private val q260Betweenness: Q = (s, dir) => {
    val docs = linkGraphDocs(s, dir).cache()
    val n = docs.count()
    val edges = linkGraphRawEdges(docs, n)
      .distinct()
      .cache()
    def pinned(df: DataFrame): DataFrame = {
      val c = df.cache()
      c.count()
      s.createDataFrame(c.rdd, c.schema)
    }
    // the ABSOLUTE-size pivot set: top-C by a salted hash (idx
    // tie-break for collisions) — orderBy+limit plans as
    // TakeOrderedAndProject, a per-partition heap + driver merge; the
    // oracle mirrors it as ORDER BY hash, idx LIMIT C (q231 pattern)
    val seedSet = pinned(docs
      .withColumn("h", tokHash(concat(lit("bc#"), col("idx").cast("string"))))
      .orderBy(col("h"), col("idx"))
      .limit(BcSeedCap)
      .select(col("idx").as("seed")))
    val nSeeds = seedSet.count()
    require(nSeeds > 0L && nSeeds <= BcSeedCap.toLong,
      s"q260: pivot set $nSeeds outside (0, $BcSeedCap] — the " +
        "constant-size seed contract broke")
    // one seeded BFS with shortest-path counts; `ed` is (src, dst) —
    // pass reversed for the backward sweep. Layer r holds nodes FIRST
    // reached at distance r with σ = Σ over distance-(r−1) predecessors
    // (every shortest path enters v through one of them, so the
    // map-side-combinable sum IS the path count).
    // ONE pinned seed frame shared by both sweeps (they start from the
    // identical (s, v, 0, 1) rows — was two separate pin jobs)
    val seedsInit = pinned(seedSet
      .select(col("seed").as("s"), col("seed").as("v"),
        lit(0L).as("d"), lit(1L).as("sig")))
    def bfsSig(ed: DataFrame): DataFrame = {
      val layers = scala.collection.mutable.ArrayBuffer[DataFrame](seedsInit)
      var visited = seedsInit.select(col("s"), col("v"))
      var frontier = seedsInit
      var h = 1
      var growing = true
      while (h <= BcHops && growing) {
        val nxt = frontier.join(ed, frontier("v") === ed("src"))
          .select(col("s"), col("dst").as("v"), col("sig"))
          .join(visited, Seq("s", "v"), "left_anti")
          .groupBy(col("s"), col("v")).agg(sum(col("sig")).as("sig"))
          .select(col("s"), col("v"), lit(h.toLong).as("d"), col("sig"))
          .cache()
        if (nxt.count() == 0) { nxt.unpersist(); growing = false }
        else {
          val flat = s.createDataFrame(nxt.rdd, nxt.schema)
          layers += flat
          visited = visited.union(flat.select(col("s"), col("v")))
          frontier = flat
        }
        h += 1
      }
      layers.reduce(_ union _)
    }
    // The two sweeps are INDEPENDENT job chains over read-only shared
    // state (edges cache + the pinned seed frame): overlap them from
    // two driver threads (guide §2.6 — actions are only sequential
    // because driver code calls them sequentially). Each sweep is
    // internally sequential (round r+1 reads round r), but its per-round
    // jobs are tiny at local[32], so the other sweep's rounds back-fill
    // the idle scheduler slots; results are cached frames either way —
    // identical rows, identical plans, ~1.7× wall on the sweep section
    // (OPTIMIZATION_r15.md). Determinism: each round is a hash
    // join + sum aggregate over longs — partition-order independent.
    val (fwd, rev) = {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      try {
        val fF = Future(bfsSig(edges))
        val rF = Future(bfsSig(edges.select(col("dst").as("src"), col("src").as("dst"))))
        (Await.result(fF, Duration.Inf), Await.result(rF, Duration.Inf))
      } finally pool.shutdown()
    }
    // σ_st over seed pairs: the forward table's rows whose node IS a
    // seed (broadcast semi-join against the ≤C-row pivot set) —
    // ≤C·(C−1) rows, a CONSTANT-bounded broadcast at any corpus
    val pairs = fwd
      .join(broadcast(seedSet.withColumnRenamed("seed", "v")), Seq("v"), "left_semi")
      .filter(col("v") =!= col("s"))
      .select(col("s"), col("v").as("t"), col("d").as("dst_d"), col("sig").as("sig_st"))
    // the constant-broadcast contract the r14 verdict asked pinned:
    // one row per ordered reachable seed pair, so this bounds the dep
    // join's broadcast side (and the per-node fanout) at C² at any N
    val nPairs = pairs.count()
    require(nPairs <= BcSeedCap.toLong * (BcSeedCap - 1L),
      s"q260: σ_st pair table $nPairs exceeded C·(C−1) = " +
        s"${BcSeedCap.toLong * (BcSeedCap - 1L)} — the constant-broadcast contract broke")
    val dep = fwd.select(col("s"), col("v"), col("d").as("df"), col("sig").as("sf"))
      .join(rev.select(col("s").as("t"), col("v"), col("d").as("dr"), col("sig").as("sr")),
        Seq("v"))
      .join(broadcast(pairs), Seq("s", "t"))
      .filter(col("df") + col("dr") === col("dst_d") &&
        col("v") =!= col("s") && col("v") =!= col("t"))
      .select(col("v"),
        expr("(sf * sr * 1000000) div sig_st").as("term_micro"))
    dep.groupBy(col("v"))
      .agg(sum(col("term_micro")).as("bc_micro"), count(lit(1)).as("n_pair_terms"))
      .join(docs, col("v") === docs("idx"))
      .select(col("doc_id"), col("bc_micro"), col("n_pair_terms"))
      .orderBy(col("bc_micro").desc, col("doc_id"))
      .limit(20)
  }

  /** Single-source(-set) shortest paths with WEIGHTED edges — bounded
    * Bellman–Ford over the q138/q169 link graph, the weighted
    * counterpart of q169's hop-count BFS (crawl cost, latency-weighted
    * reachability, cheapest-influence radius all read this). Edge
    * weights are hash-derived integers in [1, 9] (a deterministic
    * function of the DISTINCT (src, dst) pair, so both engines weight
    * the identical edge set), which keeps every distance an exact long.
    * Semantics are the k-round Bellman–Ford invariant — after round k,
    * dist(v) = min cost over paths from the seed set using ≤ k edges —
    * a well-defined EXACT contract that needs no convergence read.
    * Scale shape: each round is ONE frontier⋈edges hash join plus a
    * min-combine groupBy — O(E) map-side-combinable work per round,
    * never all-pairs — and the dist frame feeds TWO consumers per round
    * (the relax join and the min-merge union), so each round is pinned
    * as a flat LogicalRDD (the q169 discipline: caching stops
    * re-execution, not the ~2.4×/round logical-plan growth). The oracle
    * unrolls the same rounds as MATERIALIZED CTEs (DuckDB inlines CTE
    * references — an unmaterialized chain re-expands combinatorially).
    * Output is the bounded distance profile (≤ 9·rounds+1 rows) with an
    * idx-sum checksum per distance. */
  private val SsspRounds = 6
  private val q217WeightedSssp: Q = (s, dir) => q217SsspImpl(s, dir, _ => ())

  /** q217 with a per-round hook (CacheContractSpec's mid-query storage
    * seam — the q194KcoreImpl pattern; the release-cadence counterpart
    * to [[q252HarmonicImpl]]'s layer retention). */
  private[graft] def q217SsspImpl(s: SparkSession, dir: String,
      onRound: Int => Unit): DataFrame = {
    // cache discipline: each pinned round is released as soon as the
    // NEXT round is materialized (its rows were consumed by that
    // round's count), and docs/edges are released once the loop no
    // longer reads them — so live storage is O(1) rounds, not
    // O(SsspRounds), across a bench's repeated invocations. Only the
    // LAST dist stays cached: the returned lineage reads it (the
    // runner's clearCache releases it — the query-scoped contract).
    val docsC = linkGraphDocs(s, dir).cache()
    val docs = s.createDataFrame(docsC.rdd, docsC.schema)
    val n = docsC.count()
    var lastPinned: DataFrame = null
    def pinned(df: DataFrame): DataFrame = {
      val c = df.cache()
      c.count()
      s.createDataFrame(c.rdd, c.schema)
    }
    val edgesC = docs.select(col("idx").as("src"),
        explode(sequence(lit(1), lit(PrOutLinks))).as("j"))
      .select(col("src"),
        (tokHash(concat(col("src").cast("string"), lit("#"), col("j").cast("string"))) % n).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .withColumn("w", tokHash(concat(col("src").cast("string"), lit("#"),
        col("dst").cast("string"), lit("#w"))) % 9 + lit(1L))
      .cache()
    val edges = s.createDataFrame(edgesC.rdd, edgesC.schema)
    edgesC.count()
    var distC = docs.filter(col("idx") % 97 === 0)
      .select(col("idx").as("v"), lit(0L).as("d")).cache()
    var dist = s.createDataFrame(distC.rdd, distC.schema)
    distC.count()
    docsC.unpersist() // edges + seed set are materialized; docs is done
    for (r <- 1 to SsspRounds) {
      val relax = dist.join(edges, dist("v") === edges("src"))
        .select(col("dst").as("v"), (col("d") + col("w")).as("d"))
      val merged = dist.select(col("v"), col("d")).union(relax)
        .groupBy(col("v")).agg(min(col("d")).as("d"))
      // dist is referenced TWICE per round (relax join + min-merge
      // union), so an unpinned chain doubles the LOGICAL tree per round
      // — but execution still runs once per job (the round ends in an
      // aggregate's Exchange, so the second reference plans as a
      // ReusedExchange). Pin every 3rd round + the final frame: the
      // analyzed tree stays ≤ ~8× one round's nodes (cheap) while the
      // loop pays 2 materialization jobs instead of SsspRounds = 6
      // (2.65 s → ~1.6 s at sf0.1, see OPTIMIZATION_r15.md). Round
      // values are identical longs either way — min-merge arithmetic,
      // no order dependence.
      if (r % 3 == 0 || r == SsspRounds) {
        val prev = distC
        distC = merged.cache()
        dist = s.createDataFrame(distC.rdd, distC.schema)
        distC.count()
        prev.unpersist() // consumed by the pin just materialized
      } else dist = merged
      onRound(r)
    }
    edgesC.unpersist() // all relax joins done; only the final dist remains
    dist.groupBy(col("d").as("dist"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("v")).as("idx_checksum"))
      .orderBy(col("dist"))
  }

  /** Inverted-index build — the IR-side artifact of a corpus pipeline
    * (the structure behind q96's BM25 and q152's lexical leg, here
    * materialized as the index itself): per token, document frequency,
    * collection frequency, the top-scoring posting (max tf, doc_id
    * tie-break — the head of an impact-ordered posting list), and the
    * first five doc_ids of the id-ordered posting list serialized as
    * the postings head. Scale shape: one explode + one (token, doc)
    * aggregate (map-side combinable), then per-token windows over
    * posting lists — partitioned by token like every sharded index
    * build; the serialized head is a BOUNDED slice, never the full
    * posting list as one array row. */
  private val q174InvertedIndex: Q = (s, dir) => {
    // cached at the collapsed (token, doc) grain — far smaller than the
    // corpus — because it feeds both the impact head and the stats side
    val tf = Tables.documents(s, dir)
      .select(col("doc_id"), explode(toksCol(col("text"))).as("token"))
      .groupBy(col("token"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .cache()
    val top = tf
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("token")).orderBy(col("tf").desc, col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("token"), col("doc_id").as("top_doc"), col("tf").as("top_tf"))
    val st = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        concat_ws(",", transform(
          slice(sort_array(collect_list(col("doc_id"))), 1, 5),
          x => x.cast("string"))).as("postings_head"))
    st.join(top, "token")
      .select(col("token"), col("df"), col("cf"), col("top_doc"), col("top_tf"),
        col("postings_head"))
      .orderBy(col("token"))
  }

  /** Degree assortativity (Newman 2002) over the q138 link graph — the
    * third standard graph-shape signal next to q138's centrality and
    * q161's clustering: do well-connected documents link to other
    * well-connected documents (assortative, organic communities) or to
    * leaves (disassortative, hub-spam shape)? Pearson correlation of
    * endpoint degrees over the symmetrized edge list, computed from ONE
    * aggregate over the edge⋈degree join: each undirected edge
    * contributes (da,db) and (db,da), so Σx = Σ(da+db),
    * Σx² = Σ(da²+db²), Σxy = 2Σda·db — exact longs, one double ratio,
    * micro-floored (the q167 closed-form discipline on a graph).
    * nullif guards the regular-graph degenerate (zero variance). */
  private val q180Assortativity: Q = (s, dir) => {
    def s6(c: Column): Column = floor(c * 1e6 + 0.5).cast("long")
    val docs = linkGraphDocs(s, dir).cache()
    val n = docs.count()
    val und = linkGraphRawEdges(docs, n)
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val g = und
      .join(deg.toDF("a", "da"), "a")
      .join(deg.toDF("b", "db"), "b")
      .agg((count(lit(1)) * 2L).as("m2"),
        sum(col("da") + col("db")).as("sx"),
        sum(col("da") * col("da") + col("db") * col("db")).as("sxx"),
        (sum(col("da") * col("db")) * 2L).as("sxy"))
    g.select(col("m2"), col("sx"), col("sxx"), col("sxy"),
      s6((col("m2").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")) /
        nullif(col("m2").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"), lit(0.0)))
        .as("r_micro"))
  }

  /** Flesch–Kincaid readability profile — the classic text-difficulty
    * score (Kincaid et al. 1975) education-quality corpus filters read
    * (the FineWeb-Edu family gates on exactly this kind of signal):
    * grade = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59,
    * with syllables approximated by VOWEL RUNS per word (min 1 — every
    * word has a nucleus) and sentences by terminator runs (min 1 — a
    * fragment is one sentence). All three counts are exact integers
    * from codegen'd higher-order folds over the token array — ONE
    * zero-shuffle scan, no UDF — so the grade is one double expression
    * over identical longs in both engines, micro-floored. The regexes
    * stay in the Java∩RE2 dialect intersection (q134 discipline). */
  private val q181Readability: Q = (s, dir) => {
    def s6(c: Column): Column = floor(c * 1e6 + 0.5).cast("long")
    val tk = toksCol(col("text"))
    val words = size(tk).cast("long")
    val sents = greatest(lit(1L),
      size(filter(split(col("text"), "[.!?]+"), p => trim(p) =!= lit(""))).cast("long"))
    val sylls = expr(
      "aggregate(filter(split(text, '\\\\s+'), t -> t <> ''), 0L, " +
        "(acc, w) -> acc + greatest(1L, size(regexp_extract_all(lower(w), '[aeiouy]+', 0))))")
    val base = Tables.documents(s, dir)
      .filter(size(tk) > 0)
      .select(col("doc_id"), words.as("n_words"), sents.as("n_sentences"),
        sylls.as("n_syllables"))
    base.select(col("doc_id"), col("n_words"), col("n_sentences"), col("n_syllables"),
        s6(lit(0.39) * col("n_words").cast("double") / col("n_sentences").cast("double") +
          lit(11.8) * col("n_syllables").cast("double") / col("n_words").cast("double") -
          lit(15.59)).as("fk_grade_micro"))
      .orderBy(col("doc_id"))
  }

  /** Misra–Gries heavy hitters with the guarantee-gate oracle — the
    * sketch alternative to q147's exact top-K for vocabularies too
    * large to aggregate exactly: one [[graft.functions.MisraGries]]
    * summary (k bounded counters, mergeable under any combine tree —
    * Agarwal et al. 2013) over the token stream, then the EXACT
    * frequency table (same cached scan) is used to verify the two
    * theorems the sketch ships with: every token with true frequency
    * > n/(k+1) has a counter, and its estimate undercounts by at most
    * n/(k+1). Counter VALUES depend on merge order — not reproducible
    * across partitionings — so the output is the gate vector over the
    * deterministic heavy-hitter set (the q56/q153 oracle discipline for
    * order-dependent results), never the raw estimates. The k-entry
    * sketch is a bounded driver artifact (the PQ-codebook pattern). */
  private val MgCounters = 32
  private val q183HeavyHitters: Q = (s, dir) => {
    import org.apache.spark.sql.Row
    val toks = Tables.documents(s, dir)
      .select(explode(toksCol(col("text"))).as("token")).cache()
    val mg = udaf(new graft.functions.MisraGries(MgCounters),
      org.apache.spark.sql.Encoders.STRING)
    val sketch: Map[String, Long] = toks.agg(mg(col("token")).as("sk")).head()
      .getAs[scala.collection.Seq[Row]]("sk")
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(sketch.nonEmpty, "Misra-Gries summary came back empty on a non-empty stream")
    val est = map(sketch.toSeq.sortBy(_._1)
      .flatMap { case (t, c) => Seq(lit(t), lit(c)) }: _*)
    // stream total via a broadcast 1-row aggregate, not an empty-
    // partition window over the vocabulary-sized counts frame
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(toks.agg(count(lit(1)).as("n"))))
    val bound = col("n").cast("double") / lit((MgCounters + 1).toDouble)
    counts.filter(col("freq").cast("double") > bound)
      .select(col("token"), col("freq"),
        element_at(est, col("token")).isNotNull.as("found"),
        (element_at(est, col("token")).isNotNull &&
          (col("freq") - coalesce(element_at(est, col("token")), lit(0L)))
            .cast("double").between(0.0, bound)).as("within_bound"))
      .orderBy(col("token"))
  }

  /** k-core peeling over the q138 link graph — the density-filter
    * graph-mining classic (Seidman 1983; community-detection prefilter,
    * spam-farm triage): synchronously remove every vertex whose degree
    * among SURVIVORS falls below k, for a FIXED [[KcoreRounds]] rounds
    * (the q138 fixed-iteration discipline — both engines run the same
    * bounded unrolled computation, so the gate is exact without a
    * convergence read; a production degeneracy ordering iterates to
    * fixpoint with the same per-round plan). Each round is one
    * edge-filter + degree aggregate + semi-join — frontier-free peeling
    * whose per-round cost tracks the SURVIVING graph — with layers
    * pinned via the q169 LogicalRDD truncation (two consumers per
    * round: the next round AND the trace row; left lazy, the plan tree
    * compounds). Output is the per-round convergence trace
    * (n_alive, n_edges, idx checksum). */
  private val KcoreK = 3
  private val KcoreRounds = 4
  private val q194Kcore: Q = (s, dir) => q194KcoreImpl(s, dir, _ => ())

  /** q194 with a per-round hook (CacheContractSpec's mid-query storage
    * seam). Cache discipline is the q217 cadence: each round's pinned
    * survivor frame is released as soon as the NEXT round materializes,
    * `docs` once the edge list exists, `und` when the loop ends — live
    * storage is O(1) frames for the query's whole life, not O(rounds).
    * The per-round trace numbers are read EAGERLY into driver tuples
    * (they are one bounded aggregate over the just-pinned round — the
    * q231 trace discipline), which is exactly what makes the release
    * safe: nothing downstream holds lineage into an unpersisted round
    * (contrast q220, whose returned plan deliberately reads every
    * round's frame and documents the retention). */
  private[graft] def q194KcoreImpl(s: SparkSession, dir: String,
      onRound: Int => Unit): DataFrame = {
    import s.implicits._
    val docsC = linkGraphDocs(s, dir).cache()
    val n = docsC.count()
    val docs = s.createDataFrame(docsC.rdd, docsC.schema)
    val undC = linkGraphRawEdges(docs, n)
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .cache()
    val und = s.createDataFrame(undC.rdd, undC.schema)
    undC.count()
    docsC.unpersist() // edge list materialized; docs is done
    var aliveC = und.select(col("a").as("v"))
      .union(und.select(col("b").as("v"))).distinct().cache()
    var alive = s.createDataFrame(aliveC.rdd, aliveC.schema)
    aliveC.count()
    val trace = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    // Round r's trace needs n_edges among alive_r — which is EXACTLY
    // round r+1's input edge set. Caching each round's filtered edges
    // once and completing the PREVIOUS round's trace row from its count
    // makes one-join-per-round an EXPLICIT contract (plus one final
    // count) instead of relying on exchange reuse to deduplicate the
    // former deg/eAfter re-joins — measured parity at local SFs (the
    // optimizer was already reusing), but at real scale the guarantee
    // should not hang on a reuse heuristic across a cache boundary.
    // Live storage stays ≤ 3 frames (und + e + alive; prev releases
    // before the new alive pins — the CacheContractSpec seam).
    var pending: Option[(Long, Long, Long)] = None // (round, n_alive, checksum)
    for (r <- 1 to KcoreRounds) {
      val eC = und.join(alive.toDF("a"), "a").join(alive.toDF("b"), "b").cache()
      val e = s.createDataFrame(eC.rdd, eC.schema)
      val nEdges = eC.count()
      pending.foreach { case (pr, na, cs) => trace += ((pr, na, nEdges, cs)) }
      pending = None
      val prev = aliveC
      prev.unpersist() // e is materialized; deg reads the pinned e cache
      val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
      aliveC = deg.filter(col("d") >= KcoreK).select(col("v")).cache()
      // ONE job pins the round AND reads its trace scalars: a full-scan
      // aggregate over the cached frame materializes the InMemoryRelation
      // exactly like count() did, and carries (n_alive, checksum) in the
      // same action — was a count() job plus a separate head() job per
      // round (2.42 s → ~1.9 s at sf0.1, OPTIMIZATION_r15.md)
      val row = aliveC.agg(count(lit(1)).as("n_alive"),
        coalesce(sum(col("v")), lit(0L)).as("checksum")).head()
      alive = s.createDataFrame(aliveC.rdd, aliveC.schema)
      eC.unpersist() // deg consumed during the alive materialization
      pending = Some((r.toLong, row.getLong(0), row.getLong(1)))
      onRound(r)
    }
    // the LAST round's post-filter edge count has no next round to ride
    val lastEdges = und.join(alive.toDF("a"), "a").join(alive.toDF("b"), "b")
      .agg(count(lit(1)).as("n")).head().getLong(0)
    pending.foreach { case (pr, na, cs) => trace += ((pr, na, lastEdges, cs)) }
    undC.unpersist(); aliveC.unpersist() // trace is driver-held: release all
    trace.toSeq.toDF("round", "n_alive", "n_edges", "checksum")
      .orderBy(col("round"))
  }

  /** Synchronous label propagation (Raghavan, Albert & Kumara 2007,
    * Phys. Rev. E 76) over the shared link graph — community detection,
    * the fourth standard graph-shape signal next to q138's centrality,
    * q161's clustering, and q194's density peeling (corpus curation
    * reads communities as topical clusters and link-farm blobs). Each
    * of the fixed [[LpaRounds]] rounds every vertex adopts its
    * neighbors' MOST FREQUENT label, ties broken toward the SMALLEST
    * label, isolated vertices keep their own — the deterministic
    * synchronous variant (the paper's async random order is
    * irreproducible by design; fixed rounds are the q138/q194 exact
    * contract, no convergence read). Scale shape per round: one
    * labels⋈edges hash join + a (v, label) count aggregate (map-side
    * combinable) + one argmax-by-struct per vertex — O(E) per round,
    * never all-pairs. Each round's label frame feeds TWO consumers
    * (the next round's join and the convergence trace), so rounds are
    * pinned and released on the q217 cadence. The oracle unrolls the
    * same rounds as MATERIALIZED CTEs with the mode computed by a
    * max-count window + min-label group — matching trace hashes prove
    * the struct-argmax equals the declarative mode-with-tie-break
    * spec. Output: the bounded per-round convergence trace
    * (n_changed, n_communities, label checksum). */
  private val LpaRounds = 4
  private val q220LabelProp: Q = (s, dir) => {
    import s.implicits._
    val docs = linkGraphDocs(s, dir).cache()
    val n = docs.count()
    val undC = linkGraphRawEdges(docs, n)
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .cache()
    val und = s.createDataFrame(undC.rdd, undC.schema)
    undC.count()
    val nbrs = und.select(col("a").as("v"), col("b").as("u"))
      .union(und.select(col("b").as("v"), col("a").as("u")))
    var lblC = docs.select(col("idx").as("v"), col("idx").as("lbl")).cache()
    var labels = s.createDataFrame(lblC.rdd, lblC.schema)
    lblC.count()
    docs.unpersist()
    val trace = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    for (r <- 1 to LpaRounds) {
      val counts = nbrs.join(labels.select(col("v").as("u"), col("lbl")), "u")
        .groupBy(col("v"), col("lbl")).agg(count(lit(1)).as("cnt"))
      val mode = counts
        .groupBy(col("v"))
        .agg(max(struct(col("cnt"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("v"), (-col("m.nl")).as("new_lbl"))
      // (v, old, new) pinned ONCE, and the pin job IS the trace read:
      // a full-scan aggregate over the cached frame materializes the
      // InMemoryRelation exactly like count() while carrying the round's
      // (n_changed, n_communities, checksum) scalars — the q194 fold
      // (was: a count() pin job per round PLUS a final action re-reading
      // every round's cache through a 4-way union of aggregates). The
      // trace is driver-held, so the previous round's cache releases as
      // soon as the next round is materialized — live storage is ≤ 2
      // label frames instead of all [[LpaRounds]].
      val stepC = labels.select(col("v"), col("lbl").as("old_lbl"))
        .join(mode, Seq("v"), "left")
        .select(col("v"), col("old_lbl"),
          coalesce(col("new_lbl"), col("old_lbl")).as("lbl"))
        .cache()
      val step = s.createDataFrame(stepC.rdd, stepC.schema)
      val row = stepC.agg(
        sum(when(col("lbl") =!= col("old_lbl"), 1L).otherwise(0L)).as("n_changed"),
        countDistinct(col("lbl")).as("n_communities"),
        sum(col("lbl")).as("lbl_checksum")).head()
      trace += ((r.toLong, row.getLong(0), row.getLong(1), row.getLong(2)))
      lblC.unpersist() // next round is materialized; prev frame is dead
      lblC = stepC
      labels = step.select(col("v"), col("lbl"))
    }
    undC.unpersist(); lblC.unpersist()
    trace.toSeq.toDF("round", "n_changed", "n_communities", "lbl_checksum")
      .orderBy(col("round"))
  }

  /** Newman–Girvan modularity of the q220 label-propagation communities
    * (Newman & Girvan 2004, Phys. Rev. E 69; Newman 2006 for the
    * degree-null form) — the QUALITY functional the graph tier was
    * missing: q220 produces a partition but nothing scores it, and
    * modularity Q = Σ_c [e_c/m − (d_c/2m)²] is the standard "is this
    * community structure better than the degree-preserving random
    * graph" yardstick (what Louvain greedily maximizes; LPA + Q-score
    * is the classic cheap pipeline). Communities are the FINAL
    * [[LpaRounds]]-round synchronous min-tiebreak LPA labels over the
    * same hash-derived link graph every graph canon shares — the loop
    * is re-run here rather than composed (the q261 lesson: canons stay
    * frozen; a composed frame would couple two oracles).
    *
    * Expected READING on this corpus: Q ≈ 0 or slightly negative — and
    * that is the functional doing its job, twice over. The link graph
    * is hash-derived (Erdős–Rényi-like), so there is no community
    * structure for ANY algorithm to find (max modularity of a random
    * graph concentrates near 0), and synchronous min-tiebreak LPA is
    * additionally prone to two-cycle label oscillation (the reason
    * Raghavan et al. 2007 recommend async updates) — a production
    * monitor scoring a clustering pipeline needs exactly this signal.
    * The spec proves the functional DISCRIMINATES with a
    * planted-partition fixture (two cliques + a bridge → Q ≈ ½).
    *
    * Exactness: e_c (intra-community edge count), d_c (community degree
    * sum) and m (undirected edge count) are exact longs; each
    * community's term is ONE double chain in identical operand order,
    * micro-floored, and the corpus total is the exact long sum of the
    * floored terms (never a variable-length double sum). Isolated
    * vertices carry e_c = d_c = 0 → term 0 (their singleton communities
    * are listed, not dropped — Q's definition sums over ALL parts).
    *
    * Scale shape: the LPA loop is the q220 plan (per-round pinned
    * frames, edge-keyed shuffles, O(E) per round); scoring adds two
    * label joins on the edge list (linear, key = vertex), a degree
    * aggregate, and a per-community aggregate — nothing quadratic, no
    * windows. Output is one row per community (≤ N, and in practice
    * the LPA collapse count). */
  private val q267Modularity: Q = (s, dir) => {
    val docs = linkGraphDocs(s, dir).cache()
    val n = docs.count()
    val undC = linkGraphRawEdges(docs, n)
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .cache()
    val und = s.createDataFrame(undC.rdd, undC.schema)
    val mEdges = undC.count()
    var lblC = docs.select(col("idx").as("v"), col("idx").as("lbl")).cache()
    var labels = s.createDataFrame(lblC.rdd, lblC.schema)
    lblC.count()
    val nbrs = und.select(col("a").as("v"), col("b").as("u"))
      .union(und.select(col("b").as("v"), col("a").as("u")))
    for (r <- 1 to LpaRounds) {
      val counts = nbrs.join(labels.select(col("v").as("u"), col("lbl")), "u")
        .groupBy(col("v"), col("lbl")).agg(count(lit(1)).as("cnt"))
      val mode = counts
        .groupBy(col("v"))
        .agg(max(struct(col("cnt"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("v"), (-col("m.nl")).as("new_lbl"))
      val step = labels.select(col("v"), col("lbl").as("old_lbl"))
        .join(mode, Seq("v"), "left")
        .select(col("v"), coalesce(col("new_lbl"), col("old_lbl")).as("lbl"))
      // labels is referenced twice per round (neighbor join + the
      // carry-forward left join) — pin every 2nd round + the final
      // frame (unpinned depth ≤ 1 keeps the analyzed tree ≤ ~2× one
      // round; the second reference plans as a ReusedExchange, so an
      // unpinned round still executes once). Was: a pin EVERY round —
      // the q217-cadence trim applied to LPA; labels are identical
      // longs either way.
      if (r % 2 == 0 || r == LpaRounds) {
        val prev = lblC
        lblC = step.cache()
        labels = s.createDataFrame(lblC.rdd, lblC.schema)
        lblC.count()
        prev.unpersist() // consumed by the pin just materialized
      } else labels = step
    }
    docs.unpersist() // consumed by the und build + label init above
    val deg = nbrs.groupBy(col("v")).agg(count(lit(1)).as("dg"))
    val ec = und
      .join(labels.select(col("v").as("a"), col("lbl").as("la")), "a")
      .join(labels.select(col("v").as("b"), col("lbl").as("lb")), "b")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("lbl")).agg(count(lit(1)).as("e_c"))
    val dc = labels.join(deg, Seq("v"), "left")
      .groupBy(col("lbl"))
      .agg(count(lit(1)).as("n_nodes"),
        coalesce(sum(col("dg")), lit(0L)).as("d_c"))
    val mD = lit(mEdges).cast("double")
    val terms = dc.join(ec, Seq("lbl"), "left")
      .select(col("lbl"), col("n_nodes"),
        coalesce(col("e_c"), lit(0L)).as("e_c"), col("d_c"))
      .withColumn("q_micro",
        floor((col("e_c").cast("double") / mD
          - (col("d_c").cast("double") / (lit(2.0) * mD))
            * (col("d_c").cast("double") / (lit(2.0) * mD))) * 1e6 + 0.5)
          .cast("long"))
    val tot = terms.agg(sum(col("q_micro")).as("q_total_micro"),
      count(lit(1)).as("n_communities"))
    terms.crossJoin(broadcast(tot))
      .select(col("lbl"), col("n_nodes"), col("e_c"), col("d_c"),
        col("q_micro"), col("n_communities"), col("q_total_micro"))
      .orderBy(col("lbl"))
  }

  /** Greedy facility-location coreset selection (stochastic greedy —
    * Mirzasoleiman et al., AAAI 2015 "Lazier than lazy greedy";
    * facility location is THE submodular objective of data-selection
    * papers like CRAIG/coreset distillation): pick k documents whose
    * embeddings jointly cover the corpus, where coverage(S) =
    * Σ_v max_{c∈S} sim(v, c). Each round scores a DETERMINISTIC
    * hash-order candidate pool of ABSOLUTE size [[CoresetPoolCap]]
    * (TakeOrdered on a per-round salted hash — a distributed top-C
    * heap, never a global sort), picks the gain-argmax (gain desc, id
    * asc — deterministic), and folds the winner into the per-vector
    * coverage state, which is pinned per round (two consumers: next
    * round's gains and the coverage trace — the q217 cadence).
    *
    * Cost is O(k·N·C) cosine evaluations with C CONSTANT, and the
    * broadcast side of the gains crossJoin is C rows — constant-sized
    * at any corpus (the r13 verdict's scale-killer was the previous
    * Θ(N/32) pool: quadratic compute AND a corpus-proportional
    * broadcast). The stochastic-greedy guarantee (Mirzasoleiman's
    * 1−1/e−ε with |pool| = (N/k)·ln(1/ε)) prices the cap honestly:
    * a FIXED C corresponds to ε = exp(−C·k/N), which decays toward 1
    * as N grows — at this C=64, ε ≈ 0.46 at N=500 and the guarantee is
    * vacuous past N ≈ 10⁴. That is the documented trade: constant
    * per-round cost and a constant broadcast in exchange for a
    * data-scale-dependent approximation bound; deployments that need a
    * fixed ε at fixed k raise C with N (cost stays O(k·N·C), the
    * broadcast stays C rows) — the SHAPE survives 100 TB either way.
    * Exactness: similarities land on the 4dp integer grid
    * (floor(cos·10⁴+0.5) — the q38 cross-engine cosine discipline), so
    * gains, argmax ties, and running coverage are pure long
    * arithmetic both engines reproduce; the oracle unrolls the same
    * rounds (and the same ORDER BY hash LIMIT C pools) as MATERIALIZED
    * CTEs. Output: the bounded per-round trace
    * (round, selected id, gain, total coverage). */
  private val CoresetRounds = 6
  /** Absolute per-round candidate-pool size. Overridable via
    * `-Dgraft.coreset.poolCap=<C>` (r14 ADVICE: a deployment that
    * needs the documented 1−1/e−ε bound to hold at ITS corpus size
    * must raise C consciously — cost stays O(k·N·C), broadcast stays C
    * rows); the DuckDB oracle SQL is generated from this same value,
    * so the cross-engine mirror holds under any override. The default
    * 64 is an explicit small-SF price (r14 verdict #6): below
    * N ≈ 32·C the constant pool EXCEEDS the old Θ(N/32) slice
    * (measured ~2.5×, 2.4 s absolute at bench SFs) — accepted, because
    * a cap that shrinks with N makes the broadcast bound data-dependent
    * again, which is the exact defect the constant exists to kill. */
  private val CoresetPoolCap =
    math.max(1, sys.props.get("graft.coreset.poolCap").map(_.trim.toInt).getOrElse(64))
  private val q231CoresetGreedy: Q = (s, dir) => {
    import s.implicits._
    val embC = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .cache()
    val emb = s.createDataFrame(embC.rdd, embC.schema)
    val nEmb = embC.count()
    // r14 ADVICE #1: the stochastic-greedy bound is 1−1/e−ε with
    // ε = exp(−C·k/N) for a fixed pool C — it decays with N and nothing
    // at runtime said so. Surface it: once ε ≥ 1−1/e the bound is
    // literally vacuous, and relying deployments must opt in to a
    // bigger C via -Dgraft.coreset.poolCap.
    val epsBound = math.exp(-CoresetPoolCap.toDouble * CoresetRounds.toDouble / nEmb.toDouble)
    if (epsBound >= 1.0 - 1.0 / math.E)
      org.slf4j.LoggerFactory.getLogger("graft.llm.LlmQueries").warn(
        f"q231: pool cap $CoresetPoolCap%d at N=$nEmb%d gives ε≈$epsBound%.3f — " +
          "the 1−1/e−ε stochastic-greedy guarantee is vacuous at this corpus " +
          "size; raise -Dgraft.coreset.poolCap to restore it (selection still " +
          "runs, deterministically, without the bound)")
    def s4(c: Column): Column = floor(c * 10000.0 + 0.5).cast("long")
    var curC = emb.select(col("vec_id").as("v"), lit(0L).as("cur")).cache()
    var cur = s.createDataFrame(curC.rdd, curC.schema)
    curC.count()
    var selected = List.empty[Long]
    val trace = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    for (r <- 1 to CoresetRounds) {
      // absolute-size pool: top-C by a per-round salted hash (vec_id
      // tie-break for hash collisions) — orderBy+limit plans as
      // TakeOrderedAndProject, a per-partition heap + driver merge,
      // never a global sort; the broadcast below is then ≤ C rows
      val pool = emb
        .filter(!col("vec_id").isin(selected: _*))
        .withColumn("h", tokHash(concat(lit(s"$r#"), col("vec_id").cast("string"))))
        .orderBy(col("h"), col("vec_id"))
        .limit(CoresetPoolCap)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      val gains = emb.crossJoin(broadcast(pool))
        .select(col("c_id"), col("vec_id").as("v"),
          s4(cosine(col("embedding"), col("c_emb"))).as("s4"))
        .join(cur, "v")
        .groupBy(col("c_id"))
        .agg(sum(greatest(col("s4") - col("cur"), lit(0L))).as("gain"))
        .collect().map(row => (row.getLong(0), row.getLong(1)))
      // refuse loudly when the round's candidate pool is empty (the
      // not-already-selected filter can exhaust a tiny corpus; the
      // DuckDB oracle would likewise emit no w$r row) — an explicit
      // contract beats minBy's opaque UnsupportedOperation
      require(gains.nonEmpty,
        s"q231 round $r: stochastic-greedy candidate pool is empty " +
          s"(corpus minus ${selected.size} already-selected ids) — " +
          "corpus too small for CoresetRounds")
      // the constant-broadcast contract the r13 verdict asked pinned:
      // gains has exactly one row per pool candidate, so this bounds
      // the crossJoin's broadcast side at CoresetPoolCap regardless of N
      require(gains.length <= CoresetPoolCap,
        s"q231 round $r: candidate pool ${gains.length} exceeded the " +
          s"absolute cap $CoresetPoolCap — the constant-broadcast contract broke")
      // pool-bounded driver argmax (gain desc, id asc) — like the kth
      // histogram walks, a bounded artifact, never corpus-sized
      val (winner, gain) = gains.minBy { case (id, g) => (-g, id) }
      selected ::= winner
      val wEmb = broadcast(emb.filter(col("vec_id") === winner)
        .select(col("embedding").as("w_emb")))
      val prev = curC
      curC = cur.join(
          emb.crossJoin(wEmb)
            .select(col("vec_id").as("v"), s4(cosine(col("embedding"), col("w_emb"))).as("ws4")),
          "v")
        .select(col("v"), greatest(col("cur"), col("ws4")).as("cur"))
        .cache()
      // ONE job pins the round AND reads the coverage scalar (the q194
      // fold: a full-scan aggregate over the cached frame materializes
      // the InMemoryRelation exactly like count() did) — was a count()
      // job plus a separate coverage head() per round
      val coverage = curC.agg(sum(col("cur"))).head().getLong(0)
      cur = s.createDataFrame(curC.rdd, curC.schema)
      prev.unpersist() // consumed by the round just materialized
      trace += ((r.toLong, winner, gain, coverage))
    }
    curC.unpersist(); embC.unpersist() // trace is driver-held: release all
    trace.toSeq.toDF("round", "selected_id", "gain", "coverage")
  }

  /** Per-source KL divergence from the corpus token distribution
    * (Kullback–Leibler 1951; the "how far does this source drift from
    * the mixture" signal data-recipe papers weight sources by — the
    * distributional side of q132's DSIR importance and q140's PSI
    * drift, at token grain): D(P_s ‖ P) = Σ_t P_s(t)·ln(P_s(t)/P(t))
    * with add-1 smoothing on both distributions (every corpus token
    * participates for every source, so the sum is over the shared
    * vocabulary and KL is finite by construction). Exactness: the q133
    * fixed-point discipline — each term's log-ratio lands micro-floored
    * on the long grid BEFORE the per-source sum... except the term
    * weight P_s(t) is a ratio, so instead each term is floored in
    * NANO-nats after ONE double chain in identical order
    * (cnt_s+1)/(n_s+V) · ln(((cnt_s+1)·(n+V)) / ((n_s+V)·(cnt+1)))
    * and the per-source total is an exact long sum of those terms.
    *
    * Scale shape — the |sources|×|V| smoothing grid the definition
    * DESCRIBES is never materialized (the r11 verdict's named degrade):
    * an absent pair's term depends only on (n_s, c), so the absent mass
    * collapses onto the (sources × FREQ-OF-FREQ) grid — bounded by the
    * distinct corpus counts, not the vocabulary — via
    * Σ_grid = Σ_sources Σ_{distinct c} n_c·term₀(n_s, c)
    *        + Σ_{occurring (s,t)} (term(c_s) − term₀(c)),
    * where every floored long appears identically on both sides of the
    * identity, so the decomposition is EXACT, not approximate: the
    * oracle still evaluates the full grid SQL, and the hash match IS
    * the proof. Occurring pairs ride a sparse token-keyed join; the
    * marginals are broadcast. */
  private val q233SourceKl: Q = (s, dir) => {
    val toks = Tables.documents(s, dir)
      .select(col("source"), explode(toksCol(col("text"))).as("t"))
    val st = toks.groupBy(col("source"), col("t")).agg(count(lit(1)).as("c_s"))
    val ct = toks.groupBy(col("t")).agg(count(lit(1)).as("c")).cache()
    val marg = st.groupBy(col("source")).agg(sum(col("c_s")).as("n_s"))
    val tot = ct.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    // one nano-floored term; cS = c_s + 1 for present pairs, 1 for absent
    def termNano(cS: Column): Column = {
      val ps = cS.cast("double") / (col("n_s") + col("v")).cast("double")
      val ratio = (cS.cast("double") * (col("n") + col("v")).cast("double")) /
        ((col("n_s") + col("v")).cast("double") * (col("c") + 1).cast("double"))
      floor(ps * log(ratio) * 1e9 + 0.5).cast("long")
    }
    // absent-pair mass for EVERY token, on the (source × freq-of-freq)
    // grid: tokens with equal corpus count share one floored term
    val cf = ct.groupBy(col("c")).agg(count(lit(1)).as("n_c"))
    val absAll = marg.crossJoin(broadcast(cf)).crossJoin(broadcast(tot))
      .select(col("source"), col("n_s"), col("v"),
        (col("n_c") * termNano(lit(1L))).as("mass"))
      .groupBy(col("source"), col("n_s"), col("v"))
      .agg(sum(col("mass")).as("abs_nano"))
    // occurring pairs: replace each one's absent term with its real term
    val pres = st.join(ct, "t")
      .join(broadcast(marg), "source").crossJoin(broadcast(tot))
      .select(col("source"),
        (termNano(col("c_s") + 1) - termNano(lit(1L))).as("delta"))
      .groupBy(col("source")).agg(sum(col("delta")).as("pres_nano"))
    absAll.join(pres, Seq("source"), "left")
      .select(col("source"), col("n_s"),
        (col("abs_nano") + coalesce(col("pres_nano"), lit(0L))).as("kl_nano"),
        col("v").as("v_terms"))
      .orderBy(col("source"))
  }

  /** Good–Turing frequency estimation (Good 1953, Biometrika; Gale &
    * Sampson 1995) — the corpus-linguistics canon behind "how much
    * vocabulary haven't we seen yet": the unseen-mass estimate
    * P₀ = N₁/N and the Turing-smoothed counts r* = (r+1)·N_{r+1}/N_r
    * from the frequencies-of-frequencies profile. This is q147's
    * complement (vocab coverage measures what a REFERENCE vocabulary
    * catches; Good–Turing predicts what MORE data would add — the
    * sample-size planning signal for corpus collection). Scale shape:
    * tokens collapse to term frequencies (one map-side-combinable
    * aggregate), term frequencies collapse to the freq-of-freq grid —
    * bounded by the max term count, never vocabulary size — and the
    * TEN SMALLEST observed counts (where GT smoothing is meaningful,
    * wherever the corpus's head sits) join the grid's shifted self.
    * Counts are exact longs; r* and P₀ are one identical-order double
    * division each, micro-floored (P₀ = 0 on a hapax-free corpus —
    * "nothing unseen remains", the correct GT reading). */
  private val q227GoodTuring: Q = (s, dir) => {
    val tf = Tables.documents(s, dir)
      .select(explode(toksCol(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("r"))
    val nr = tf.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
    // P0 = N1/N, 0 when the corpus has no hapaxes (the synthetic
    // template vocabulary's min count is ≫ 1 — the estimate is then
    // "nothing unseen remains", which is the correct GT reading)
    val totals = tf.agg(sum(col("r")).as("n_total"), count(lit(1)).as("v"),
      coalesce(sum(when(col("r") === 1, 1L).otherwise(0L)), lit(0L)).as("n1"))
    // the TEN SMALLEST observed counts (not r ≤ 10): GT smooths the
    // head of the observed grid wherever that head sits
    nr.join(nr.select((col("r") - 1).as("r"), col("n_r").as("n_r_next")), Seq("r"), "left")
      .orderBy(col("r")).limit(10)
      .crossJoin(broadcast(totals))
      .select(col("r"), col("n_r"),
        coalesce(col("n_r_next"), lit(0L)).as("n_r_next"),
        floor((col("r") + 1).cast("double") *
          coalesce(col("n_r_next"), lit(0L)).cast("double") /
          col("n_r").cast("double") * 1e6 + 0.5).cast("long").as("r_star_micro"),
        col("n_total"), col("v"),
        floor(col("n1").cast("double") / col("n_total").cast("double") * 1e6 + 0.5)
          .cast("long").as("p0_micro"))
      .orderBy(col("r"))
  }

  /** Zipf rank-frequency fit (Zipf 1949; the log-log slope every corpus
    * health check reads — natural text sits near −1, template/spam
    * corpora flatten or steepen): OLS of log(frequency) on log(rank)
    * over the whole vocabulary. The scale story is the RANKING: ranks
    * come from the freq-of-freq grid, NOT a per-token sort — each
    * distinct frequency occupies the contiguous rank block
    * [offset+1, offset+n_f] (offset = count of strictly-more-frequent
    * tokens, a window over the BOUNDED distinct-frequency grid), and
    * log-rank terms explode per block. Tie order inside a block cannot
    * move any OLS sum (all block members share the frequency), so no
    * per-token order — and no single-task vocabulary sort — exists
    * anywhere. Exactness: per-term logs are micro-floored longs (the
    * q133 fixed-point discipline; ln of identical doubles is identical
    * cross-engine at this grid), first-moment sums are exact longs
    * (Σ|log_micro| wraps only past ~10¹² tokens of vocabulary), the
    * SECOND-moment sums ride DECIMAL(38,0) — Σ(log_micro)² wraps int64
    * right at V ≈ 10⁵ while DuckDB's sum(BIGINT) is HUGEINT, so the
    * widening keeps the two engines on the same exact-integer grid at
    * ANY vocabulary — and the closed form widens factors to double
    * BEFORE multiplying (the q184 overflow discipline). */
  private val q228ZipfFit: Q = (s, dir) => {
    def s6(c: Column): Column = floor(c * 1e6 + 0.5).cast("long")
    val tf = Tables.documents(s, dir)
      .select(explode(toksCol(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
    val ff = tf.groupBy(col("f")).agg(count(lit(1)).as("n_f"))
    val wOff = Window.orderBy(col("f").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pairs = ff
      .withColumn("off", coalesce(sum(col("n_f")).over(wOff), lit(0L)))
      .select(col("f"),
        explode(sequence(col("off") + 1, col("off") + col("n_f"))).as("rank"))
    val terms = pairs.select(
      s6(log(col("rank").cast("double"))).as("lx"),
      s6(log(col("f").cast("double"))).as("ly"))
    // second-moment sums are widened to DECIMAL(38,0) BEFORE summing:
    // Σ(log_micro)² wraps int64 right at V ≈ 10⁵ (lx² ≈ 1.3×10¹⁴ per
    // term), and DuckDB's sum(BIGINT) is HUGEINT (int128) so only the
    // Spark side would wrap — silently under non-ANSI. The products are
    // exact integers in both representations and the closed form reads
    // them through double, so the widening is value-identical on any
    // vocabulary that previously fit and correct on ones that didn't.
    val d38 = DecimalType(38, 0)
    val g = terms.agg(count(lit(1)).as("n"),
      sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
      sum((col("lx") * col("lx")).cast(d38)).as("sxx"),
      sum((col("lx") * col("ly")).cast(d38)).as("sxy"),
      sum((col("ly") * col("ly")).cast(d38)).as("syy"))
    val nD = col("n").cast("double")
    val cov = nD * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")
    val varX = nD * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    val varY = nD * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
    g.select(col("n").as("v"),
      s6(cov / varX).as("slope_micro"),
      // sx/sy are ALREADY micro-scaled logs, so the intercept lands on
      // the micro grid without another 1e6 factor
      floor((col("sy").cast("double") - cov / varX * col("sx").cast("double")) / nD + 0.5)
        .cast("long").as("intercept_micro"),
      s6(cov * cov / (varX * varY)).as("r2_micro"))
  }

  /** Interpolated Kneser–Ney bigram language model (Kneser & Ney 1995;
    * Chen & Goodman 1999 §2.7) — the count-based LM that powered a
    * decade of CCNet-style corpus quality filtering and is still the
    * cheap perplexity yardstick a curation pipeline trains on its own
    * corpus (q132's ppl gate CONSUMES an LM; this canon TRAINS one).
    * Absolute discount d = 3/4 off every observed bigram, mass
    * redistributed by the CONTINUATION unigram (how many contexts a
    * word completes — N1+(·w), the insight that makes "Francisco"
    * unlikely outside "San _"):
    *   p(w₂|w₁) = (c(w₁w₂) − d)/c(w₁·) + d·N1+(w₁·)/c(w₁·) · N1+(·w₂)/B
    * with B = distinct bigram types. In quarters the numerator algebra
    * is pure integers — (4c − 3) is exact (c ≥ 1 so no clamp), the
    * normalization identity Σ_obs(4c − 3) = 4c(w₁·) − 3N1+(w₁·) holds
    * exactly and the spec pins it — and the probability is ONE
    * identical-order double chain off exact longs, micro-floored.
    *
    * Scale shape: bigram counting is THE canonical map-side-combinable
    * aggregate (one corpus scan); every other statistic — left
    * marginals, both continuation counts, the type total — derives from
    * the bigram-TYPE table, which is vocabulary-bounded, never
    * corpus-bounded; the served head is a TakeOrdered(40), not a global
    * sort. Counts stay exact longs to c ≈ 2×10¹⁸ bigram tokens. */
  /** The q251 scored bigram-type frame — (bg, w1, w2, c, c_w1, n1_fw,
    * n1_bw, b) — shared by q251's served head and q258's perplexity
    * gate so both read the SAME trained LM (the hybridRrfParts
    * discipline: a shared part, not two drifting copies). `pairs` is
    * cached (three consumers: both marginals and the scored join); the
    * runner's clearCache scopes it. */
  private def knModelScored(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.documents(s, dir)
      .select(explode(TextOps.bigrams(toksCol(col("text")))).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c"))
      .select(col("bg"), substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"), col("c"))
      .cache()
    val left = pairs.groupBy(col("w1"))
      .agg(sum(col("c")).as("c_w1"), count(lit(1)).as("n1_fw"))
    val right = pairs.groupBy(col("w2")).agg(count(lit(1)).as("n1_bw"))
    val types = pairs.agg(count(lit(1)).as("b"))
    pairs.join(left, "w1").join(right, "w2")
      .crossJoin(broadcast(types)) // 1-row type total
  }
  /** The two KN probability terms (quarters algebra — the q251
    * scaladoc's identical-order double chain), as column builders over
    * [[knModelScored]]'s frame. */
  private def knDiscPart: Column = (lit(4L) * col("c") - 3L).cast("double") /
    (lit(4.0) * col("c_w1").cast("double"))
  private def knContPart: Column =
    lit(3.0) * col("n1_fw").cast("double") * col("n1_bw").cast("double") /
      (lit(4.0) * col("c_w1").cast("double") * col("b").cast("double"))
  private val q251KneserNey: Q = (s, dir) => {
    knModelScored(s, dir)
      .select(col("bg"), col("c"), col("c_w1"), col("n1_fw"), col("n1_bw"),
        floor((knDiscPart + knContPart) * 1e6 + 0.5).cast("long").as("p_kn_micro"))
      .orderBy(col("c").desc, col("bg"))
      .limit(40)
  }

  /** CCNet-style perplexity GATE under the q251 interpolated Kneser–Ney
    * bigram LM (Wenzek et al. 2020, arXiv:1911.00359 §4.3 — rank
    * documents by LM cross-entropy, keep the most fluent; q133 is the
    * add-1 form of this gate, this is the KN form the LM canon exists
    * to power). The LM trains on the corpus itself (CCNet's
    * self-scoring variant), so every document bigram is OBSERVED and
    * scores through the full interpolated formula — no backoff branch
    * to diverge on.
    *
    * Exactness: each bigram TYPE's surprisal −ln p_kn lands
    * micro-floored on the long grid (ONE identical-order double chain
    * off exact longs), per-doc totals are exact long sums of those
    * grid points (order-independent — the q132/q133 fixed-point
    * discipline), and per-token cross-entropy is the exact integer
    * division ⌊H_micro / n_bigrams⌋. The keep threshold is the exact
    * ⌈2n/3⌉-th smallest ce (CCNet keeps head+middle) selected by the
    * established two-phase method
    * ([[graft.operators.DistributedSelect.kth]] — two bounded passes,
    * never a global sort); keep = ce ≤ threshold, ties inclusive, on
    * both engines. Bigram-less docs (< 2 tokens) pin ce = −1: the
    * sentinel sorts below every real ce so the keep comparison retains
    * them (q133's "most fluent edge" contract) while they are EXCLUDED
    * from the threshold rank.
    *
    * Scale shape: the model is the vocabulary-bounded bigram-TYPE
    * table, never corpus-bounded; scoring is one explode + one
    * bigram-keyed join + a map-side-combinable per-doc sum; selection
    * is two bounded passes. Composition point in the q196 cascade:
    * `.join(knKeep, Seq("doc_id"), "left_semi")` beside pplKeep —
    * WIRED as the separately-served q261 since r15; this standalone
    * canon and q196 both stay frozen. */
  private val q258KnPplGate: Q = (s, dir) => {
    val surp = knModelScored(s, dir).select(col("bg"),
      floor(-log(knDiscPart + knContPart) * 1e6 + 0.5).cast("long").as("surp_micro"))
    val occ = Tables.documents(s, dir)
      .select(col("doc_id"), explode(TextOps.bigrams(toksCol(col("text")))).as("bg"))
    val perDoc = occ.join(surp, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("surp_micro")).as("h_micro"))
      .withColumn("ce_micro", expr("h_micro div n_bigrams"))
    val scoredC = Tables.documents(s, dir).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("h_micro"), lit(0L)).as("h_micro"),
        coalesce(col("ce_micro"), lit(-1L)).as("ce_micro"))
      .cache() // three consumers: the two-phase passes, output
    // the ⌈2n/3⌉ rank derives from n INSIDE phase 1's histogram
    // (kthFromTotal) — was a separate count() pass over the scored
    // frame before kth's two, i.e. 3 passes where 2 suffice
    def kOf(n: Long): Seq[Long] = {
      require(n > 0, "q258: no document carries a bigram — gate undefined")
      Seq((2L * n + 2L) / 3L) // ceil(2n/3), exact in longs
    }
    val (nScored, thrs) = graft.operators.DistributedSelect.kthFromTotal(
      scoredC.filter(col("n_bigrams") > 0).select(col("ce_micro").as("v")),
      kOf, width = 65536L)
    val thr = thrs((2L * nScored + 2L) / 3L)
    scoredC.select(col("doc_id"), col("n_bigrams"), col("h_micro"), col("ce_micro"),
        lit(thr).as("thr_micro"),
        (col("ce_micro") <= thr).cast("long").as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Pairwise source-vocabulary overlap (Jaccard + containment on
    * token-type sets; Broder 1997 for resemblance/containment as the
    * canonical set-overlap pair) — the MIXTURE-DESIGN companion to
    * q233's per-source KL: KL weighs how differently two sources USE a
    * shared vocabulary, this weighs how much vocabulary they SHARE at
    * all (a source whose types are 90%-contained in another adds
    * diversity only in usage, not coverage — the "is this source worth
    * its tokens" read before weighting a training mixture).
    *
    * Scale shape: one corpus scan collapses to the DISTINCT
    * (source, token) table — vocabulary-bounded, never corpus-bounded
    * (the q233 shape); intersections come from its self-join keyed on
    * TOKEN, whose per-token fanout is at most |sources|² — a bounded
    * constant — so the pair table is |S|² rows and the join work is
    * O(|V|·|S|²), independent of corpus size. EXACT integers end to
    * end: Jaccard and containment are micro-floored INTEGER DIVISIONS
    * (⌊10⁶·∩/∪⌋, ⌊10⁶·∩/min⌋) — no float enters, cross-engine equality
    * is structural. */
  private val q256SourceOverlap: Q = (s, dir) => {
    val st = Tables.documents(s, dir)
      .select(col("source"), explode(toksCol(col("text"))).as("tok"))
      .distinct()
      .cache()
    val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("v"))
    val inter = st.toDF("s1", "tok")
      .join(st.toDF("s2", "tok2"),
        col("tok") === col("tok2") && col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("s1", "v1"), "s1")
      .join(sizes.toDF("s2", "v2"), "s2")
      .select(col("s1"), col("s2"), col("v1"), col("v2"), col("inter"),
        expr("(inter * 1000000) div (v1 + v2 - inter)").as("jaccard_micro"),
        expr("(inter * 1000000) div least(v1, v2)").as("containment_micro"))
      .orderBy(col("s1"), col("s2"))
  }

  /** Pairwise Jensen–Shannon divergence between source token
    * distributions (Lin 1991, IEEE Trans. IT 37(1); Endres &
    * Schindelin 2003 prove √JSD is a metric) — the SYMMETRIC member of
    * the distributional-comparison family: q233's KL scores each source
    * against the corpus mixture (asymmetric, needs add-1 smoothing to
    * stay finite), while JSD compares sources PAIRWISE and is finite
    * with NO smoothing — a token absent from one side contributes only
    * its presence term p·ln 2 — which is exactly why mixture-design
    * work uses JSD/√JSD as the dataset-distance matrix (and q256's
    * set-Jaccard is its frequency-blind shadow: two sources can share
    * 100% of vocabulary and still diverge in JSD).
    *
    * JSD(P,Q) = ½Σ_t p ln(2p/(p+q)) + ½Σ_t q ln(2q/(p+q)), summed over
    * the UNION vocabulary of the pair. Exactness: counts and totals are
    * exact longs; each union token's term is ONE double chain in
    * identical operand order on both engines, nano-floored to a long;
    * the per-pair total is an exact integer sum (the q233 discipline —
    * no variable-length double sum). Absent sides are NULL-masked
    * (`when(c > 0, …)`), never branch-guarded divisions — the r14 ANSI
    * subexpression-elimination rule; the mixture denominator p+q is > 0
    * on every union row by construction. `jsd_norm_micro` re-grids the
    * exact nano total by ln 2 into [0, 1e6] (one more identical chain).
    *
    * Scale shape: tokens collapse once to (source, token) counts (one
    * map-side-combinable aggregate); each count row then fans out to
    * the ≤|S|−1 pairs its source participates in via a BROADCAST pair
    * frame — |S| is the source taxonomy, a property of the corpus
    * SCHEMA (20 here), not of its row count, so the fanout is a
    * constant factor on a token-keyed shuffle; the union lattice is a
    * single full-outer join on (pair, token). Nothing is quadratic in
    * tokens, documents, or vocabulary — the |pairs| = |S|(|S|−1)/2
    * output is driver-bounded like a PQ codebook. */
  private val q264JsDivergence: Q = (s, dir) => {
    val tc = Tables.documents(s, dir)
      .select(col("source"), explode(toksCol(col("text"))).as("t"))
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
      .cache() // two pair legs + the marginal; runner-scoped
    val marg = tc.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    val pairs = marg.select(col("source").as("sa"), col("n_s").as("na"))
      .crossJoin(marg.select(col("source").as("sb"), col("n_s").as("nb")))
      .filter(col("sa") < col("sb")) // |S|(|S|-1)/2 rows — schema-bounded
    val legA = tc.join(broadcast(pairs.select(col("sa"), col("sb"))),
        col("source") === col("sa"))
      .select(col("sa"), col("sb"), col("t"), col("c").as("ca"))
    val legB = tc.join(broadcast(pairs.select(col("sa"), col("sb"))),
        col("source") === col("sb"))
      .select(col("sa").as("sa2"), col("sb").as("sb2"), col("t").as("t2"),
        col("c").as("cb"))
    val un = legA.join(legB,
        col("sa") === col("sa2") && col("sb") === col("sb2") &&
          col("t") === col("t2"), "full_outer")
      .select(coalesce(col("sa"), col("sa2")).as("sa"),
        coalesce(col("sb"), col("sb2")).as("sb"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .join(broadcast(pairs), Seq("sa", "sb"))
    val pA = when(col("ca") > 0L, col("ca").cast("double") / col("na").cast("double"))
    val pB = when(col("cb") > 0L, col("cb").cast("double") / col("nb").cast("double"))
    val mix = coalesce(pA, lit(0.0)) + coalesce(pB, lit(0.0))
    val tA = coalesce(pA * log(lit(2.0) * pA / mix), lit(0.0))
    val tB = coalesce(pB * log(lit(2.0) * pB / mix), lit(0.0))
    un.select(col("sa"), col("sb"), col("na"), col("nb"),
        floor((lit(0.5) * tA + lit(0.5) * tB) * 1e9 + 0.5).cast("long")
          .as("term_nano"))
      .groupBy(col("sa"), col("sb"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        count(lit(1)).as("n_union"), sum(col("term_nano")).as("jsd_nano"))
      .withColumn("jsd_norm_micro",
        floor(col("jsd_nano").cast("double") / 1e9 / log(lit(2.0)) * 1e6 + 0.5)
          .cast("long"))
      .orderBy(col("sa"), col("sb"))
  }

  /** Token-balanced output sharding — the write-side step of corpus
    * construction: assign every document to a training shard so each
    * shard carries ≈[[ShardTokenBudget]] tokens, in a stable hash
    * order (reproducible across runs; NOT extension-stable — inserting
    * a doc shifts every later cumulative position, which is the
    * correct semantics for a versioned full rebuild; q130 is the
    * extension-stable per-source sampler).
    *
    * Shard id = global-prefix-sum-before-me div budget. The scale
    * story is HOW that global prefix sum is computed: a single global
    * window would serialize the corpus through one partition, so this
    * runs the classic two-level distributed prefix sum instead —
    *   1. bucket by CONTIGUOUS hash range (bucket = rk div width, so
    *      bucket order == global hash order across buckets);
    *   2. per-bucket token totals (one partial-aggregated groupBy into
    *      [[ShardBuckets]] rows), prefixed driver-side (bounded, like
    *      a PQ codebook) into per-bucket offsets;
    *   3. one partition-local cumsum window PER BUCKET plus the
    *      broadcast offset.
    * The oracle computes the same assignment with the sequential
    * single-window spec, so the hash match IS the proof that the
    * distributed decomposition equals the sequential semantics. */
  private val ShardTokenBudget = 400L
  private val ShardBuckets    = 16L
  private val q139ShardAssign: Q = (s, dir) => {
    import s.implicits._
    val width = (P + ShardBuckets - 1) / ShardBuckets
    val t = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(toksCol(col("text"))).cast("long").as("n_tokens"),
        tokHash(col("doc_id").cast("string")).as("rk"))
      .withColumn("bkt", expr(s"rk div $width"))
      .cache()
    val totals = t.groupBy(col("bkt")).agg(sum(col("n_tokens")).as("tot"))
      .orderBy(col("bkt")).collect() // ≤ ShardBuckets rows — bounded
    var acc = 0L
    val offs = totals.map { r =>
      val pair = (r.getLong(0), acc); acc += r.getLong(1); pair
    }.toSeq
    val w = Window.partitionBy(col("bkt")).orderBy(col("rk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    t.join(broadcast(offs.toDF("bkt", "off")), "bkt")
      .withColumn("cb", col("off") + sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"cb div $ShardTokenBudget").as("shard_id"))
      .orderBy(col("doc_id"))
  }

  /** Population-Stability-Index drift monitor — the corpus-health gate a
    * continuously-rebuilt training set runs between versions (the same
    * PSI credit-risk models monitor features with): how far has each
    * source's token-length distribution drifted from the corpus-wide
    * mixture? Per (source, bin): PSI term (p−q)·ln(p/q) with Laplace
    * smoothing (+1 per bin) so empty bins stay finite; terms are
    * mathematically ≥ 0 (sign(p−q) == sign(ln p/q)), and the per-source
    * sum is the headline drift score (PSI > 0.25 = "significant shift"
    * by the standard rule of thumb).
    *
    * Exactness: counts are exact ints in both engines; p and q are the
    * same small-int ratios, so IEEE division agrees bit-for-bit, and
    * the term is floored at micro-scale (the q132/q133 fixed-point
    * discipline — ln's last-ulp differences cannot move a floor except
    * on a measure-zero boundary). Scale: two bounded groupBys (bins ×
    * sources cells) + broadcast-sized joins — one corpus scan total. */
  private val PsiBins     = TextOps.PsiBins
  private val PsiBinWidth = TextOps.PsiBinWidth
  /** Mutual-information / chi-square association matrix between two
    * categorical columns (source × lang) — the feature-relevance /
    * contingency-analysis primitive (feature selection's MI filter,
    * the χ² independence test, and corpus-composition drift all read
    * this table). ONE groupBy builds the contingency cells; marginals
    * and the grand total ride window sums over the BOUNDED cell grid
    * (|sources|·|langs| rows — never a second corpus scan), so the
    * whole query is one shuffle at cell grain no matter the corpus
    * size. Exactness: every input to the transcendental is an exact
    * integer ratio widened to double (products widen BEFORE
    * multiplying — n_x·n_y overflows a long at cluster-scale counts),
    * terms land on the q132/q133 micro-nat fixed-point grid, so both
    * engines hold identical longs; Σ mi_micro / 1e6 is the plug-in
    * MI estimate in nats, Σ chi2_micro / 1e6 the χ² statistic. */
  private val q162MutualInfo: Q = (s, dir) => {
    def s6(c: Column): Column = floor(c * 1e6 + 0.5).cast("long")
    val cells = Tables.documents(s, dir)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n_xy"))
    val g = cells
      .withColumn("n_x", sum(col("n_xy")).over(Window.partitionBy(col("source"))))
      .withColumn("n_y", sum(col("n_xy")).over(Window.partitionBy(col("lang"))))
      .withColumn("n", sum(col("n_xy")).over(Window.partitionBy()))
    val nxyD = col("n_xy").cast("double")
    val e = col("n_x").cast("double") * col("n_y").cast("double") / col("n").cast("double")
    g.select(col("source"), col("lang"), col("n_xy"), col("n_x"), col("n_y"),
        s6((nxyD / col("n").cast("double")) *
          log((col("n").cast("double") * nxyD) /
            (col("n_x").cast("double") * col("n_y").cast("double")))).as("mi_micro"),
        s6((nxyD - e) * (nxyD - e) / e).as("chi2_micro"))
      .orderBy(col("source"), col("lang"))
  }

  /** PMI collocation mining — the corpus-linguistics classic (Church &
    * Hanks 1990): adjacent token pairs whose co-occurrence mass exceeds
    * what their unigram frequencies predict under independence,
    * PMI = ln(p(x,y) / (p(x)·p(y))), reported for every bigram above a
    * support floor. The support gate ([[PmiMinCount]]) runs BEFORE the
    * unigram joins — the standard sparsity cut that also kills PMI's
    * low-count noise — so the join input is the heavy-bigram set, not
    * the full bigram vocabulary. Scale shape: unigram and bigram counts
    * are partial-aggregated groupBys at token grain; the two count
    * joins key on the token (vocab-sized build sides); the corpus
    * totals fold to one broadcast row. Exactness: all counts are exact
    * longs, the PMI input is one identical double ratio, and the term
    * lands on the micro-nat grid (q132/q133 discipline). */
  private val PmiMinCount = 5L
  private val q163PmiCollocations: Q = (s, dir) => {
    def s6(c: Column): Column = floor(c * 1e6 + 0.5).cast("long")
    // the tokenized projection feeds three aggregates (unigram counts,
    // bigram counts, bigram total) — cache it so the corpus pays ONE
    // tokenization scan; at production scale this is the checkpointed
    // tokens table every downstream pass reads
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), toksCol(col("text")).as("tk"))
      .cache()
    val uni = toks.select(explode(col("tk")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val nUni = uni.agg(sum(col("c")).as("n_uni"))
    val bi = toks.filter(size(col("tk")) >= 2)
      .select(explode(bigramsCol(col("tk"))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= PmiMinCount)
    val nBi = toks.filter(size(col("tk")) >= 2)
      .agg(sum(size(col("tk")) - 1).as("n_bi"))
    val sp = bi
      .withColumn("x", substring_index(col("g"), " ", 1))
      .withColumn("y", substring_index(col("g"), " ", -1))
    sp.join(uni.toDF("x", "c_x"), "x")
      .join(uni.toDF("y", "c_y"), "y")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
        s6(log((col("c_xy").cast("double") / col("n_bi").cast("double")) /
          ((col("c_x").cast("double") / col("n_uni").cast("double")) *
           (col("c_y").cast("double") / col("n_uni").cast("double"))))).as("pmi_micro"))
      .orderBy(col("x"), col("y"))
  }

  private val q140PsiDrift: Q = (s, dir) => {
    import s.implicits._
    val d = Tables.documents(s, dir)
      .select(col("source"), size(toksCol(col("text"))).cast("long").as("n_tokens"),
        TextOps.lengthBin(col("text")).as("bin"))
      .cache()
    val nTot = d.count()
    val grid = d.select(col("source")).distinct()
      .crossJoin(s.range(0, PsiBins.toLong).select(col("id").as("bin")))
    val sc = d.groupBy(col("source"), col("bin")).agg(count(lit(1)).as("src_cnt"))
    val rc = d.groupBy(col("bin")).agg(count(lit(1)).as("ref_cnt"))
    val ns = d.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    grid.join(sc, Seq("source", "bin"), "left").na.fill(0L, Seq("src_cnt"))
      .join(rc, Seq("bin"), "left").na.fill(0L, Seq("ref_cnt"))
      .join(ns, Seq("source"))
      .withColumn("p", (col("src_cnt") + 1).cast("double") / (col("n_src") + PsiBins))
      .withColumn("q", (col("ref_cnt") + 1).cast("double") / (nTot + PsiBins))
      .withColumn("psi_micro",
        floor((col("p") - col("q")) * log(col("p") / col("q")) * 1000000.0).cast("long"))
      .select(col("source"), col("bin"), col("src_cnt"), col("ref_cnt"), col("psi_micro"))
      .orderBy(col("source"), col("bin"))
  }

  /** Overlapping token-window chunking — the RAG-ingestion primitive
    * (split every document into fixed-size windows with overlap so no
    * retrieval-relevant span straddles a chunk boundary unseen). Pure
    * scan-shaped column work: one explode over per-doc window starts,
    * chunk text hashed with the shared rolling hash so the oracle
    * compares content exactly, partial tail windows kept (their token
    * count says so). */
  /** The q117/q120 chunk frame: (doc_id, chunk_idx, n_tokens,
    * chunk_tokens, chunk_hash), unordered. */
  private def chunkFrame(s: SparkSession, dir: String): DataFrame = {
    val (size_, overlap) = (64, 16)
    val step = size_ - overlap
    Tables.documents(s, dir)
      .select(col("doc_id"), toksCol(col("text")).as("tk"))
      .filter(size(col("tk")) >= 1)
      .select(col("doc_id"), size(col("tk")).as("n_tokens"),
        posexplode(transform(
          // drop a trailing window the PREVIOUS chunk already covered
          // (it would be a strict subset — pure retrieval noise)
          filter(sequence(lit(1), size(col("tk")), lit(step)),
            st => st === 1 || st - step + (size_ - 1) < size(col("tk"))),
          st => struct(
            least(lit(size_), size(col("tk")) - st + 1).as("chunk_tokens"),
            tokHash(array_join(slice(col("tk"), st, lit(size_)), " ")).as("chunk_hash"))))
          .as(Seq("chunk_idx", "c")))
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
        col("c.chunk_tokens").as("chunk_tokens"), col("c.chunk_hash").as("chunk_hash"))
  }

  private val q117ChunkOverlap: Q = (s, dir) =>
    chunkFrame(s, dir).orderBy(col("doc_id"), col("chunk_idx"))

  /** The composed RAG-ingestion pipeline (the q85 pattern over the new
    * operators): chunk the corpus (q117's frame) → exact chunk-level
    * dedup (first (doc_id, chunk_idx) wins per hash — chunk-granular
    * q30) → chunk-level DECONTAMINATION (drop train chunks whose hash
    * appears in any eval doc's chunks, doc_id % 10 — q115's split at
    * chunk granularity) → per-doc rollup of what survives. One lazy
    * plan; every stage is an operator a standalone query verifies. */
  private val q120RagPipeline: Q = (s, dir) => {
    val chunks = chunkFrame(s, dir)
    val evalHashes = chunks.filter(col("doc_id") % 10 === 0)
      .select(col("chunk_hash")).distinct()
    val w = Window.partitionBy(col("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))
    chunks.filter(col("doc_id") % 10 =!= 0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(evalHashes, Seq("chunk_hash"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("chunk_tokens")).cast("long").as("kept_tokens"))
      .orderBy(col("doc_id"))
  }

  /** EXACT set-similarity self-join with prefix filtering (the
    * AllPairs/PPJoin family — Bayardo et al. WWW'07, Xiao et al.
    * WWW'08): the exact counterpart of q37's approximate LSH near-dup.
    * Tokens are ordered GLOBALLY rare-first (ascending document
    * frequency, canonicalized as one sortable df-prefixed string key so
    * both engines sort identically); two sets with Jaccard ≥ θ MUST
    * share a token within their first |s| − ⌈θ·|s|⌉ + 1 tokens
    * (pigeonhole), so the candidate join explodes ONLY that prefix —
    * common tokens (huge posting lists) sit at the end of the ordering
    * and never generate candidates, which is what caps the join fan-out
    * at corpus scale (the df-cap reasoning of q75, made exact).
    * Candidates pass the θ length filter and an exact Jaccard verify,
    * both in integer cross-multiplied form — no float boundary, and
    * ⌈0.8·len⌉ is `(4·len + 4) div 5`, never a float ceil.
    *
    * The similarity unit is the BIGRAM-shingle set — q37's space, so
    * this is its exact twin (LSH recall vs exact enumeration over the
    * same metric). Unigram sets were measured non-discriminative on
    * this templated corpus (¼ of ALL pairs ≥ 0.8 at sf0.001 → 3M result
    * rows at sf0.1); on shingles only genuine near-dups match, so the
    * output — and the verify fan-out — stays proportional to the real
    * duplicate density. */
  private val q118SimJoinExact: Q = (s, dir) => {
    // θ = 0.8 throughout, as integers: verify 5·inter ≥ 4·union;
    // length filter 4·|a| ≤ 5·|b| ∧ 4·|b| ≤ 5·|a|
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), toksCol(col("text")).as("tk0"))
      .filter(size(col("tk0")) >= 2)
      .select(col("doc_id"), array_distinct(bigramsCol(col("tk0"))).as("tk"))
    val toks = docs.select(col("doc_id"), explode(col("tk")).as("tok"))
    val dfTab = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val keyed = toks.join(dfTab, "tok")
      .withColumn("k", concat(lpad(col("df").cast("string"), 10, "0"), col("tok")))
      .groupBy(col("doc_id")).agg(array_sort(collect_list(col("k"))).as("ks"))
      .withColumn("len", size(col("ks")))
      .withColumn("plen", col("len") - expr("(len * 4 + 4) div 5") + 1)
      // 256-bit set signature for the xor-popcount candidate filter
      // below: sound (popcount(sigA ⊕ sigB) ≤ |A Δ B| always — see
      // SetSig256's scaladoc), so it can reject candidates BEFORE the
      // distinct shuffle without losing any true pair.
      .withColumn("sig",
        call_function("set_sig256", transform(col("ks"), k => call_function("rolling_hash", k))))
      .cache() // two consumers: prefix explode + verify join (runner clears)
    // posexplode keeps each prefix token's POSITION for PPJoin's
    // positional filter (Xiao et al. WWW'08): a match at 1-based
    // positions (pa, pb) can reach overlap at most
    // min(la−pa, lb−pb)+1, which must still clear the θ overlap bound
    // t = ⌈θ/(1+θ)·(la+lb)⌉ = (4·(la+lb)+8) div 9. On a low-vocabulary
    // corpus (every shingle common, dfs nearly uniform) the df-prefix
    // alone barely discriminates — the 2026-08-14 regenerated testdata
    // has 931 distinct shingles over 5000 docs — and this filter cuts
    // the candidate space a further 2.2× before the distinct+verify.
    val pref = keyed.select(col("doc_id"), col("len"), col("sig"),
      posexplode(slice(col("ks"), lit(1), col("plen").cast("int"))).as(Seq("p0", "k")))
    // The xor-popcount signature filter (sound — SetSig256 scaladoc):
    // Jaccard ≥ θ forces overlap t ≥ ⌈θ/(1+θ)·(la+lb)⌉ = (4·(la+lb)+8)
    // div 9, hence |A Δ B| = la+lb−2·t_actual ≤ la+lb−2·t; any candidate
    // whose 256-bit signatures differ in MORE bits than that bound
    // cannot reach θ. On the low-vocabulary 2026-08-14 corpus (931
    // near-uniform-df shingles) the prefix+positional filters leave
    // 667 k of 5000² candidate pairs; dissimilar pairs differ in ~90
    // set elements, so their xor-popcount (~50–90 of 256 bits) fails
    // the ≤ ~10-bit budget and dies HERE — before the distinct shuffle
    // and the array-intersect verify, which were 80 % of q118's cost.
    val cand = pref.select(col("doc_id").as("a"), col("len").as("la"),
        (col("p0") + 1).as("pa"), col("sig").as("sa"), col("k"))
      .join(pref.select(col("doc_id").as("b"), col("len").as("lb"),
        (col("p0") + 1).as("pb"), col("sig").as("sb"), col("k")), "k")
      .filter(col("a") < col("b") &&
        col("la") * 4 <= col("lb") * 5 && col("lb") * 4 <= col("la") * 5 &&
        least(col("la") - col("pa"), col("lb") - col("pb")) + 1 >=
          expr("(4 * (la + lb) + 8) div 9") &&
        call_function("xor_popcount", col("sa"), col("sb")) <=
          col("la") + col("lb") - lit(2) * expr("(4 * (la + lb) + 8) div 9"))
      .select("a", "b").distinct()
    cand
      .join(keyed.select(col("doc_id").as("a"), col("ks").as("ksa"), col("len").as("la")), "a")
      .join(keyed.select(col("doc_id").as("b"), col("ks").as("ksb"), col("len").as("lb")), "b")
      .withColumn("inter", size(array_intersect(col("ksa"), col("ksb"))))
      .filter(col("inter") * 5 >= (col("la") + col("lb") - col("inter")) * 4)
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        col("inter").cast("long").as("n_common"),
        fpRound4(col("inter").cast("double")
          / (col("la") + col("lb") - col("inter"))).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The composed corpus pipeline: quality gate (q33 formula) → exact
    * dedup (q30: min-id representative per content hash) →
    * decontamination (drop train docs the q75 sweep flags, and eval
    * docs themselves) → sequence packing (q77 windows over the
    * SURVIVORS). This is the "switch your training-data pipeline to
    * this library" query: every stage is the same operator the
    * standalone queries verify, and the composite output is
    * oracle-checked as a unit. The dataflow is lazy except two staged
    * materializations inherited from q75 (the corpus count-star and
    * the cached rare-shingle index) — deliberate stage boundaries, the
    * same ones a production decontamination pass persists. */
  private val q85CorpusPipeline: Q = (s, dir) => {
    val base = Tables.documents(s, dir)
      .withColumn("tk", toksCol(col("text")))
      .filter(size(col("tk")) >= 2)
    // 1. quality gate (TextOps.quality: the q33 formula, one source)
    val quality = base
      .withColumn("quality", TextOps.quality(col("tk")))
      .filter(col("quality") >= TextOps.QualityGate)
    // 2. exact dedup: keep the lowest doc_id per distinct text
    val reps = quality
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val deduped = quality.join(reps, Seq("doc_id"), "left_semi")
    // 3. decontamination: train docs only, minus the q75 quarantine list
    val flagged = q75Contamination(s, dir).select(col("train_id").as("doc_id")).distinct()
    val clean = deduped
      .filter(col("doc_id") % 10 =!= 0)
      .join(flagged, Seq("doc_id"), "left_anti")
    // 4. pack survivors into fixed token windows per source shard
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    clean
      .withColumn("n_tokens", size(col("tk")).cast("long"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("quality"),
        expr(s"cum_before div $PackWindow").as("pack_id"))
  }

  /** SimHash-banded near-dup detection, completing the dedup family
    * (MinHash-LSH q37, embedding-LSH q57). The q36 16-bit unigram
    * signature is a doc FINGERPRINT, not a pair detector — shared
    * vocabulary makes unrelated docs agree on most bits. Detection uses
    * a 32-bit SimHash over the bigram-shingle hashes (doc-specific for
    * the same reason MinHash shingles are), split into 2 bands of 16
    * bits: any pair within Hamming distance 1 agrees exactly on ≥1 band
    * (pigeonhole), so candidates come from an equi-join on the band key
    * — never all-pairs — and verify with bit_count(xor) ≤ 1. */
  private val q90SimhashPairs: Q = (s, dir) => {
    val bitSums = (0 until 32).map { b =>
      aggregate(col("hh"), lit(0L),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(lit(1L)) * 2L - 1L).as(s"bs$b")
    }
    val sims = sigsDF(s, dir)
      .select(col("doc_id") +: bitSums: _*)
      .select(col("doc_id"),
        (0 until 32).map(b =>
          when(col(s"bs$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
          .as("simhash"))
      .cache() // query-scoped: released by the runner's clearCache (see q37)
    val bandArr = array((0 until 2).map { j =>
      struct(lit(j).as("band"),
        shiftright(col("simhash"), 16 * j).bitwiseAND(lit(65535L)).as("bkey"))
    }: _*)
    val bands = sims.select(col("doc_id"), col("simhash"), explode(bandArr).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band"), col("b.bkey"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= 1)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Deterministic hash sampling — the reproducible corpus subsample:
    * keep a doc iff rolling_hash(source|doc_id) mod 100 < 20. No rand(),
    * no sampleBy seed dependence on partitioning: the same doc is kept
    * or dropped on every run, on every cluster layout — which is what a
    * training-data pipeline needs for resumable sampling. */
  private val q86HashSample: Q = (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("bucket",
        tokHash(concat(col("source"), lit("|"), col("doc_id").cast("string"))) % 100)
      .filter(col("bucket") < 20)
      .select(col("doc_id"), col("source"), col("bucket"))

  /** Cross-modal join: documents to their embedding row (doc_id =
    * vec_id), reporting quality alongside the embedding L2 norm — the
    * join every multimodal pipeline runs to pair text features with
    * vector features. Equi-join on the shared key; both sides pruned
    * to the joined columns before the exchange. */
  private val q87DocEmbJoin: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
      .withColumn("tk", toksCol(col("text")))
      .select(col("doc_id"), TextOps.quality(col("tk")).as("quality"))
    val embs = Tables.embeddings(s, dir)
      .select(col("vec_id").as("doc_id"), col("label"),
        round(sqrt(aggregate(col("embedding").cast("array<double>"),
          lit(0.0), (acc, x) => acc + x * x)), 4).as("l2_norm"))
    docs.join(embs, Seq("doc_id"))
      .select(col("doc_id"), col("quality"), col("l2_norm"), col("label"))
  }

  /** Per-label embedding centroids: posexplode to (label, dim, value)
    * and aggregate — partial (map-side) aggregation collapses each
    * partition to ≤ labels×dims rows before the shuffle, so the 64×
    * row inflation never crosses the exchange. */
  private val q78EmbCentroids: Q = (s, dir) =>
    Tables.embeddings(s, dir)
      .select(col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("v")), 4).as("centroid"),
        round(stddev_pop(col("v")), 4).as("spread"),
        count(lit(1)).as("n"))

  /** Fréchet embedding distance between label slices under the
    * DIAGONAL-Gaussian simplification (Dowson & Landau 1982 for the
    * closed form between Gaussians; Heusel et al. 2017 for FID — the
    * standard "are these two embedding distributions the same"
    * statistic; MAUVE/data-drift papers read exactly this family when
    * comparing dataset slices): for slices a, b with per-dimension
    * means μ and variances σ², d² = Σ_d (μ_a−μ_b)² + σ²_a + σ²_b −
    * 2·√(σ²_a·σ²_b) — the full Fréchet form with covariances assumed
    * diagonal (documented simplification: the 64-d full form needs a
    * matrix square root, which has no cross-engine-exact restatement;
    * the diagonal form is the standard cheap variant and is exact
    * here).
    *
    * Exactness: components land on the 1e6 integer grid FIRST
    * (⌊x·10⁶+0.5⌋ — the q38 cosine discipline), so per-(label, dim)
    * moments n/Σx/Σx² are exact integers (both moment sums ride
    * DECIMAL(38,0) with operands widened — the q228/q243 wrap
    * discipline; DuckDB's HUGEINT mirrors); each dimension's term is
    * ONE identical-order double chain over those exact integers
    * (variance numerator n·Σx²−(Σx)² is Cauchy–Schwarz-nonnegative in
    * exact arithmetic, so √ never sees a negative), nano-floored
    * BEFORE the per-pair sum — a fixed-64-term long sum,
    * order-independent. Scale shape: posexplode's 64× row inflation
    * collapses map-side (partial agg) to a labels×dims frame —
    * BOUNDED, broadcastable; the pair join is ≤|L|²·dims rows.
    * Output: one row per unordered label pair. */
  private val q262FrechetSlices: Q = (s, dir) => {
    val d38 = DecimalType(38, 0)
    val st = Tables.embeddings(s, dir)
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        floor(col("v") * 1e6 + 0.5).cast("long").as("xq"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("xq").cast(d38)).as("sx"),
        sum((col("xq") * col("xq")).cast(d38)).as("sxx"))
      .cache() // two consumers (both sides of the pair join); runner-scoped
    def mean(sx: Column, n: Column): Column = sx.cast("double") / n.cast("double")
    def variance(n: Column, sx: Column, sxx: Column): Column = {
      val nD = n.cast("double")
      (nD * sxx.cast("double") - sx.cast("double") * sx.cast("double")) / (nD * nD)
    }
    val a = st.select(col("label").as("label_a"), col("dim").as("dim_a"),
      col("n").as("na"), col("sx").as("sxa"), col("sxx").as("sxxa"))
    val b = st.select(col("label").as("label_b"), col("dim").as("dim_b"),
      col("n").as("nb"), col("sx").as("sxb"), col("sxx").as("sxxb"))
    val dmu = mean(col("sxa"), col("na")) - mean(col("sxb"), col("nb"))
    val va = variance(col("na"), col("sxa"), col("sxxa"))
    val vb = variance(col("nb"), col("sxb"), col("sxxb"))
    val termNano =
      floor((dmu * dmu + va + vb - lit(2.0) * sqrt(va * vb)) / 1000.0 + 0.5)
        .cast("long")
    a.join(broadcast(b),
        col("dim_a") === col("dim_b") && col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"), col("na"), col("nb"),
        termNano.as("term_nano"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(max(col("na")).cast("long").as("n_a"), max(col("nb")).cast("long").as("n_b"),
        count(lit(1)).as("n_dims"), sum(col("term_nano")).as("fid_nano"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** IVF ANN invariants (KMeans centroids aren't oracle-reproducible, so
    * the oracle states the structural contract): full corpus coverage,
    * plural inverted lists, ≤ topK results per query, probe restriction. */
  private val q65IvfInvariants: Q = (s, dir) => {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val index = IvfSearch.build(e, "vec_id", "emb", k = 8)
    val res = IvfSearch.search(index, e.filter(col("vec_id") < 8), "vec_id", "emb",
      nProbe = 2, topK = 3).cache()
    try {
      val nIndexed = index.indexed.count()
      val nLists = index.indexed.select("cluster").distinct().count()
      val maxPerQuery = res.groupBy("q_id").count().agg(max("count")).head().getLong(0)
      val clustersPerQuery = res
        .join(index.indexed.select(col("vec_id").as("neighbor_id"), col("cluster")), "neighbor_id")
        .groupBy("q_id").agg(countDistinct("cluster").as("nc"))
        .agg(max("nc")).head().getLong(0)
      Seq((
        nIndexed,
        if (nLists > 1 && nLists <= 8) 1 else 0,
        if (maxPerQuery <= 3) 1 else 0,
        if (clustersPerQuery <= 2) 1 else 0
      )).toDF("n_indexed", "lists_plural", "topk_bounded", "probe_restricted")
    } finally {
      // the returned frame is built from driver-side scalars — neither
      // cache is referenced by it, so both release eagerly in-closure
      res.unpersist()
      index.indexed.unpersist()
    }
  }

  /** ANN recall evaluation — the retrieval-quality harness an index
    * deployment ships with (structure gates live in q65; this measures
    * what retrieval actually returns). Brute-force cosine top-k under
    * the SAME total order the IVF search uses (4dp-rounded cosine desc,
    * then vec_id — one deterministic order shared by both sides makes
    * every gate tie-robust) is the ground truth; the index is then
    * searched at increasing probe widths and gated on:
    *
    *   - `full_probe_exact` / `mean_recall_full`: probing EVERY list
    *     must reproduce brute force EXACTLY (recall 1.0 per query) —
    *     an IVF search degrades only by skipping lists, so full probe
    *     equals exhaustive search or the index machinery is wrong;
    *   - `recall_monotone`: per-query recall never decreases with more
    *     probes — rigorous under a shared total order (a non-truth
    *     candidate cannot outrank a truth member without being in the
    *     global top-k itself), so any violation is an implementation
    *     bug, not noise.
    *
    * Scale: truth is one broadcast-queries×corpus scan (the q38 shape,
    * fine for a bounded eval panel, never run corpus×corpus); searches
    * are partition-pruned probes. Oracle pins the gate vector with the
    * corpus-derived panel size (q91/q135 pattern). */
  private val q136AnnRecall: Q = (s, dir) => {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val queries = e.filter(col("vec_id") < 8)
    val index = IvfSearch.build(e, "vec_id", "emb", k = 8)
    try {
      val wS = Window.partitionBy(col("q_id"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
      val truth = e.crossJoin(broadcast(
          queries.select(col("vec_id").as("q_id"), col("emb").as("q_emb"))))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cos_sim", round(cosine(col("emb"), col("q_emb")), 4))
        .withColumn("rnk", row_number().over(wS))
        .filter(col("rnk") <= 3)
        .groupBy(col("q_id")).agg(collect_set(col("vec_id")).as("truth"))
      def found(nProbe: Int, nm: String) =
        IvfSearch.search(index, queries, "vec_id", "emb", nProbe, topK = 3)
          .groupBy(col("q_id")).agg(collect_set(col("neighbor_id")).as(nm))
      def recall(nm: String): Column =
        size(array_intersect(col(nm), col("truth"))).cast("double") / size(col("truth"))
      val per = truth
        .join(found(2, "f2"), Seq("q_id"))
        .join(found(4, "f4"), Seq("q_id"))
        .join(found(8, "f8"), Seq("q_id"))
        .select(col("q_id"), recall("f2").as("r2"), recall("f4").as("r4"),
          recall("f8").as("r8"))
      val st = per.agg(
        count(lit(1)).as("n"),
        min(when(col("r8") === 1.0, 1).otherwise(0)).as("fx"),
        min(when(col("r2") <= col("r4") && col("r4") <= col("r8"), 1).otherwise(0)).as("mono"),
        avg(col("r8")).as("mrf"))
        .head()
      Seq((st.getLong(0), st.getInt(1), st.getInt(2), st.getDouble(3)))
        .toDF("n_queries", "full_probe_exact", "recall_monotone", "mean_recall_full")
    } finally index.indexed.unpersist()
  }

  /** Near-dup RESOLUTION: connected components over the q37 similarity
    * graph ([[Dedup.connectedComponents]] min-label propagation), so
    * transitive chains A~B~C collapse to one canonical document. The
    * oracle recomputes components with a recursive CTE over the same
    * LSH-derived edges — the iterative distributed algorithm is
    * hash-checked against closed-form SQL recursion. */
  private val q71DedupComponents: Q = (s, dir) => {
    val pairs = q37NeardupMinhash(s, dir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    Dedup.connectedComponents(pairs)
      .select(col("node").as("doc_id"), col("component"),
        (col("node") === col("component")).cast("int").as("is_canonical"))
  }

  /** Leakage-safe train/test split — eval hygiene for a deduplicated
    * corpus (Lee et al. 2021's train-test overlap findings are exactly
    * the failure this prevents): near-duplicate documents must never
    * straddle the split boundary, or the eval set silently restates
    * training data. Every doc joins its q37/q71 near-dup CLUSTER
    * (connected component; singleton docs are their own cluster), and
    * the split is decided by hashing the CLUSTER id, not the doc id —
    * so an entire duplicate cluster lands on one side by construction,
    * 80/20 in expectation. The oracle recomputes the components with
    * the q71 recursive CTE and applies the same hash cut, so the
    * leakage-safety property itself is hash-verified. Scale: the CC is
    * the bounded-round q71 propagation over LSH-banded edges; the join
    * back is component-sized; the split is pure column work. */
  private val q141LeakageSplit: Q = (s, dir) => {
    val pairs = q37NeardupMinhash(s, dir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val comp = Dedup.connectedComponents(pairs)
      .select(col("node").as("doc_id"), col("component"))
    Tables.documents(s, dir).select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .withColumn("split",
        when(tokHash(col("cluster").cast("string")) % 10 < 8, lit("train"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("cluster"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Near-dup cluster size distribution — the dedup-savings report a
    * corpus build reads before committing to a fuzzy-dedup pass: how
    * many documents sit in clusters of size k, and how many rows
    * evaporate if each cluster keeps one canonical doc. Clusters are
    * the q71/q141 connected components (singletons cluster with
    * themselves); past the component computation the rollup is two
    * hash-keyed aggregations whose output is bounded by the largest
    * cluster size, and the removable mass closes in exact integer
    * arithmetic — so the whole report, including the iterative CC
    * underneath, hash-matches the recursive-CTE oracle. */
  private val q148ClusterSizes: Q = (s, dir) => {
    val pairs = q37NeardupMinhash(s, dir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val comp = Dedup.connectedComponents(pairs)
      .select(col("node").as("doc_id"), col("component"))
    Tables.documents(s, dir).select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .groupBy(col("cluster")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
      .select(col("sz").as("cluster_size"), col("n_clusters"),
        (col("sz") * col("n_clusters")).as("n_docs"),
        ((col("sz") - 1) * col("n_clusters")).as("n_removable"))
      .orderBy(col("cluster_size"))
  }

  /** Per-source gate funnel — the pipeline-yield report every corpus
    * build publishes: of each source's documents, how many pass the
    * Gopher quality battery (A1.1), the repetition battery (A1.2),
    * both, and how many remain after exact dedup among the gate
    * survivors (corpus-wide first-doc_id-wins on the content hash, so
    * a duplicate pair straddling two sources is kept once, in the
    * source that holds its canonical copy). Both flag batteries ride
    * the shared nested-let definitions ([[TextOps.gopherRules]] /
    * [[TextOps.repetitionRules]]) in ONE cached scan; the funnel
    * closes in conditional sums plus a hash-partitioned dedup window —
    * no global sort, no all-pairs, and the oracle recomputes the whole
    * composition relationally, so the REPORT (not just each gate) is
    * hash-verified. */
  private val q149GateFunnel: Q = (s, dir) => {
    val flags = TextOps.repetitionRules(
        TextOps.gopherRules(Tables.documents(s, dir), "text"), "text")
      .select(col("doc_id"), col("source"),
        tokHash(col("text")).as("h"),
        col("gopher_pass").cast("long").as("gp"),
        col("rep_pass").cast("long").as("rp"))
      .withColumn("both", col("gp") * col("rp"))
      .cache() // 2 consumers (funnel sums + dedup window); runner clearCache scopes it
    val uniq = flags.filter(col("both") === 1)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("h")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .groupBy(col("source")).agg(count(lit(1)).as("n_unique"))
    flags.groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"), sum(col("gp")).as("n_gopher"),
        sum(col("rp")).as("n_rep"), sum(col("both")).as("n_gate"))
      .join(uniq, Seq("source"), "left")
      .select(col("source"), col("n_total"), col("n_gopher"), col("n_rep"),
        col("n_gate"), coalesce(col("n_unique"), lit(0L)).as("n_unique"))
      .orderBy(col("source"))
  }

  /** Embedding-space outlier pruning — the prototypicality filter of
    * data-pruning pipelines (Sorscher et al. 2022, arXiv:2206.14486:
    * drop the examples farthest from their class prototype): each
    * vector's squared distance to its label centroid, ranked per
    * label, with the farthest 10% (at least one) flagged pruned.
    * EXACT cross-engine gate on float-embedding geometry via the
    * q132/q133 fixed-point discipline: coordinates quantize to
    * integer milli-units on read (float→double is exact, one shared
    * half-up floor), the centroid is floor(Σ/n) of exact long sums,
    * and every distance is then pure long arithmetic — no float
    * aggregate whose summation ORDER could split the engines, which
    * is what keeps an iterative-free geometry query hash-matchable.
    * Scale: the dim explode is a ×64 scan projection; the centroid
    * table is labels×dims rows broadcast back; per-vector distances
    * hash-aggregate on vec_id; the per-label rank window is the one
    * corpus-sized stage, and the 100 TB degrade path — a distance
    * THRESHOLD from an approx_percentile sketch instead of an exact
    * rank — is the q142 trade documented there. */
  private val q150EmbedPrune: Q = (s, dir) => {
    val dims = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")))
      .toDF("vec_id", "label", "dim", "v")
      .select(col("vec_id"), col("label"), col("dim"),
        floor(col("v").cast("double") * 1000.0 + 0.5).cast("long").as("vm"))
    val cent = dims.groupBy(col("label"), col("dim"))
      .agg(sum(col("vm")).as("sv"), count(lit(1)).as("n"))
      .select(col("label"), col("dim"),
        floor(col("sv").cast("double") / col("n")).cast("long").as("cent"))
    val d2 = dims.join(broadcast(cent), Seq("label", "dim"))
      .select(col("vec_id"), col("label"),
        ((col("vm") - col("cent")) * (col("vm") - col("cent"))).as("sq"))
      .groupBy(col("vec_id"), col("label")).agg(sum(col("sq")).as("d2"))
    val wRank = Window.partitionBy(col("label")).orderBy(col("d2").desc, col("vec_id"))
    val wLab = Window.partitionBy(col("label"))
    d2.withColumn("rk", row_number().over(wRank).cast("long"))
      .withColumn("nl", count(lit(1)).over(wLab))
      .select(col("vec_id"), col("label"), col("d2"),
        (col("rk") <= greatest(lit(1L), col("nl") * 10L / lit(100L))).cast("int").as("pruned"))
      .orderBy(col("vec_id"))
  }

  /** Regex pretokenization — the BPE input-boundary contract (GPT-2
    * lineage: merges never cross pretoken boundaries, so the
    * pretokenizer DEFINES what the tokenizer can learn). The pattern
    * is the classic letter-run / digit-run / punctuation-run split
    * with the leading-space convention, restricted to the
    * Java-regex∩RE2 dialect intersection (no lookahead — the original
    * GPT-2 `\\s+(?!\\S)` tail needs it; the q134 discipline): the SAME
    * pattern text drives both engines, and the oracle hash-compares
    * the rolling hash of the ENTIRE joined pretoken sequence, so token
    * BOUNDARIES are verified, not just counts. Fertility
    * (pretokens per whitespace token) is the tokenizer-cost metric
    * mixture planning reads. One zero-shuffle scan.
    *
    * The corpus is plain lowercase words, which would leave the digit
    * and punctuation branches of the pattern untested — so the query
    * APPENDS a deterministic doc_id-derived tail mixing attached
    * digits, a decimal, punctuation runs, and an apostroph-ized word
    * (the q134 synthetic-input discipline; both engines build the same
    * augmented string from table data and must split it identically). */
  private val PretokRe = raw" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
  private val q151Pretokenize: Q = (s, dir) => {
    val aug = concat(col("text"), lit(" v"), col("doc_id").cast("string"),
      lit(".25 don't stop!! a1b2 --ok"))
    val pt = regexp_extract_all(aug, lit(PretokRe), lit(0))
    Tables.documents(s, dir)
      .select(col("doc_id"), pt.as("pt"), toksCol(aug).as("ws"))
      .select(col("doc_id"),
        size(col("pt")).cast("long").as("n_pretok"),
        size(col("ws")).cast("long").as("n_ws"),
        fpRound4(when(size(col("ws")) > 0,
          size(col("pt")).cast("double") / size(col("ws"))).otherwise(lit(0.0)))
          .as("fertility"),
        tokHash(array_join(col("pt"), "|")).as("boundary_hash"))
      .orderBy(col("doc_id"))
  }

  /** Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    * 2009) — the standard RAG retrieval pattern: a lexical ranking
    * (the q96 BM25, over the indexed subset = docs holding an
    * embedding) and a vector ranking (4dp cosine against a fixed
    * query vector, the q38 discipline) each truncated at depth 50,
    * fused by RRF score Σ 1/(60 + rank) — computed as
    * floor(10⁶/(60+rank)): ranks are exact small ints under shared
    * total orders (score desc, doc_id), so the fused score is pure
    * integer arithmetic and the whole hybrid ranking hash-matches.
    * Scale: BM25 stats fold to driver constants over one cached scan
    * of the universe; both top-depth lists are bounded TakeOrdereds;
    * the only windows run over the 50 retained rows; fusion is a
    * 50×50 full outer join. */
  private val RrfK = 60L
  private val RrfDepth = 50
  private val RrfOut = 20
  private val q152HybridRrf: Q = (s, dir) => hybridRrfParts(s, dir)._4

  /** q152's corpus frame, per-leg tops, and fused top list — shared
    * with q247's NDCG and q257's rank-agreement (the retrieval, its
    * metric, and its leg diagnostics must score the SAME run). Returns
    * (u — the cached per-doc frame with tf columns, lexTop / vecTop —
    * the two depth-[[RrfDepth]] legs with their ranks, fused — the RRF
    * top-[[RrfOut]] list ordered (rrf desc, doc_id)). */
  private[llm] def hybridRrfParts(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val qTerms = Seq("join", "vector", "stream")
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("doc_id"), col("embedding").cast("array<double>").as("emb"))
    val u = Tables.documents(s, dir)
      .select(col("doc_id"), toksCol(col("text")).as("tk"))
      .join(emb, Seq("doc_id"))
      .select(col("doc_id") +: col("emb") +: size(col("tk")).cast("double").as("dl") +:
        qTerms.zipWithIndex.map { case (t, i) =>
          size(filter(col("tk"), x => x === lit(t))).cast("double").as(s"tf$i") }: _*)
      .cache() // 3 consumers (stats fold, lex ranking, vec ranking)
    val stAggs = count(lit(1)).cast("double").as("n_docs") +:
      (sum(col("dl")) / count(lit(1))).as("avgdl") +:
      qTerms.indices.map(i =>
        coalesce(sum(when(col(s"tf$i") > 0.0, 1L)), lit(0L)).cast("double").as(s"df$i"))
    val st = u.agg(stAggs.head, stAggs.tail: _*).head()
    val (nDocs, avgdl) = (st.getDouble(0), st.getDouble(1))
    val contribs = qTerms.indices.map { i =>
      val idf = (nDocs - st.getDouble(2 + i) + 0.5) / (st.getDouble(2 + i) + 0.5)
      lit(idf) * (col(s"tf$i") * lit(2.2) / (col(s"tf$i") +
        lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl))))
    }
    val lexTop = u.filter(qTerms.indices.map(i => col(s"tf$i")).reduce(_ + _) > 0.0)
      .select(col("doc_id"), fpRound4(contribs.reduce(_ + _)).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(RrfDepth)
      .withColumn("rank_lex", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
    val qv = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>").as("q_emb"))
    val vecTop = u.crossJoin(broadcast(qv))
      .select(col("doc_id"), round(cosine(col("emb"), col("q_emb")), 4).as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(RrfDepth)
      .withColumn("rank_vec", row_number().over(
        Window.orderBy(col("cos").desc, col("doc_id"))).cast("long"))
    def rrfTerm(rank: Column): Column =
      coalesce(floor(lit(1000000.0) / (lit(RrfK.toDouble) + rank)).cast("long"), lit(0L))
    val fused = lexTop.select(col("doc_id"), col("rank_lex"))
      .join(vecTop.select(col("doc_id"), col("rank_vec")), Seq("doc_id"), "full_outer")
      .withColumn("rrf", rrfTerm(col("rank_lex")) + rrfTerm(col("rank_vec")))
      .select(col("doc_id"),
        coalesce(col("rank_lex"), lit(0L)).as("rank_lex"),
        coalesce(col("rank_vec"), lit(0L)).as("rank_vec"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id")).limit(RrfOut)
    (u, lexTop, vecTop, fused)
  }

  /** NDCG@[[RrfOut]] of the q152 hybrid retrieval (Järvelin & Kekäläinen
    * 2002, TOIS — THE graded ranking metric; a retrieval tier without
    * its evaluation metric is half an operator): graded relevance is
    * deterministic and text-derived — rel(doc) = number of DISTINCT
    * query terms the document contains (0–3) — so both engines label
    * identically; DCG sums per-position gains rel/log₂(pos+1), each
    * gain ONE double chain micro-floored BEFORE the exact long sum (the
    * q133 discipline); the IDEAL ranking needs no sort — it reads off
    * the bounded relevance HISTOGRAM (ideal_rel(p) = 3 while p ≤ n₃,
    * then 2, then 1 — corpus-size-independent, ≤4 rows). Scale shape:
    * the ranked list is the bounded fused top-k (a driver artifact);
    * relevance labels ride the same cached per-doc frame q152 already
    * pays for; the histogram is one aggregate. Output: the evaluated
    * list (pos, doc_id, rel, gain) with DCG/IDCG/NDCG constants. */
  private val q247NdcgRetrieval: Q = (s, dir) => {
    import s.implicits._
    val (u, _, _, fused) = hybridRrfParts(s, dir)
    val relCol = ((col("tf0") > 0.0).cast("long") + (col("tf1") > 0.0).cast("long") +
      (col("tf2") > 0.0).cast("long")).as("rel")
    val rel = u.select(col("doc_id"), relCol)
    // the ranked run: bounded top-k, positions driver-assigned
    val run = fused.select(col("doc_id")).collect().map(_.getLong(0))
      .zipWithIndex.map { case (d, i) => (d, i + 1L) }
    val relOfRun = broadcast(run.toSeq.toDF("doc_id", "pos"))
      .join(rel, Seq("doc_id"))
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2)))
      .sortBy(_._1)
    def gain(relV: Long, pos: Long): Long =
      math.floor(relV.toDouble / (math.log((pos + 1).toDouble) / math.log(2.0))
        * 1e6 + 0.5).toLong
    val dcg = relOfRun.map { case (p, _, r) => gain(r, p) }.sum
    // ideal gains off the bounded relevance histogram — no sort anywhere
    val hist = rel.groupBy(col("rel")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val idealRels = Seq(3L, 2L, 1L).flatMap(v => Seq.fill(
      math.min(hist.getOrElse(v, 0L), RrfOut.toLong).toInt)(v)).take(RrfOut)
    val idcg = idealRels.zipWithIndex.map { case (r, i) => gain(r, i + 1L) }.sum
    require(idcg > 0L, "no relevant document in the corpus — NDCG undefined")
    u.unpersist() // every consumer above collected; output is driver-held
    relOfRun.toSeq.map { case (p, d, r) =>
      (p, d, r, gain(r, p), dcg, idcg,
        math.floor(dcg.toDouble / idcg.toDouble * 1e6 + 0.5).toLong)
    }.toDF("pos", "doc_id", "rel", "gain_micro", "dcg_micro", "idcg_micro", "ndcg_micro")
      .orderBy(col("pos"))
  }

  /** Inter-leg rank agreement of the hybrid retrieval (Kendall 1938
    * applied to ranker comparison; Voorhees 1998 for rank correlation
    * as the standard IR-run agreement measure) — the third member of
    * the retrieval-eval family: q152 RUNS the fusion, q247 scores its
    * QUALITY, this measures whether the two legs are REDUNDANT or
    * COMPLEMENTARY — the statistic that decides if hybrid fusion is
    * worth paying for both legs (τ ≈ 1: drop a leg; τ low or overlap
    * small: fusion is buying real diversity). Over the doc set BOTH
    * depth-[[RrfDepth]] legs retrieve: Kendall τ-a of (rank_lex,
    * rank_vec) — ranks are distinct so no tie correction — plus the
    * top-set Jaccard ⌊10⁶·|∩|/|∪|⌋ as an exact integer division.
    * Scale shape: both legs are bounded top-k driver-bounded frames
    * (≤[[RrfDepth]] rows), so the pair join is ≤ depth² — a CONSTANT —
    * and everything upstream is the one cached q152 corpus frame.
    * Counts are exact longs; τ is one identical-order double chain
    * micro-floored; a shared set below 2 docs pins the −2·10⁶
    * sentinel (the q250 contract), and an EMPTY union (both legs
    * retrieved nothing — n_lex + n_vec = n_shared = 0) pins the same
    * sentinel on jaccard_micro so its integer division never sees a
    * zero denominator on either engine. */
  private val q257RankAgreement: Q = (s, dir) => {
    val (_, lexTop, vecTop, _) = hybridRrfParts(s, dir)
    val shared = lexTop.select(col("doc_id"), col("rank_lex"))
      .join(vecTop.select(col("doc_id"), col("rank_vec")), Seq("doc_id"))
    val a = shared.toDF("d1", "l1", "v1")
    val b = shared.toDF("d2", "l2", "v2")
    val pairs = a.join(b, col("d1") < col("d2"))
      .select((signum(col("l2") - col("l1")) * signum(col("v2") - col("v1"))).as("sg"))
    val pairAgg = pairs.agg(
      count(lit(1)).as("n_pairs"),
      coalesce(sum(when(col("sg") > 0.0, 1L).otherwise(0L)), lit(0L)).as("conc"),
      coalesce(sum(when(col("sg") < 0.0, 1L).otherwise(0L)), lit(0L)).as("disc"))
    val ns = shared.agg(count(lit(1)).as("n_shared"))
    val nLex = lexTop.agg(count(lit(1)).as("n_lex"))
    val nVec = vecTop.agg(count(lit(1)).as("n_vec"))
    val nD = col("n_shared").cast("double")
    val tau = (col("conc") - col("disc")).cast("double") /
      (nD * (nD - 1.0) / 2.0) * 1e6
    ns.crossJoin(broadcast(pairAgg)) // 1-row frames throughout
      .crossJoin(broadcast(nLex)).crossJoin(broadcast(nVec))
      .select(col("n_lex"), col("n_vec"), col("n_shared"),
        col("n_pairs"), col("conc"), col("disc"),
        when(col("n_shared") < 2, lit(-2000000L))
          .otherwise(floor(tau + 0.5).cast("long")).as("tau_micro"),
        // union empty (both legs retrieved nothing) → the integer
        // division's denominator is 0: pin the q250 sentinel instead of
        // letting Spark emit NULL while DuckDB's // errors (r13 ADVICE)
        when(col("n_lex") + col("n_vec") === col("n_shared"), lit(-2000000L))
          .otherwise(expr("(n_shared * 1000000) div (n_lex + n_vec - n_shared)"))
          .as("jaccard_micro"))
  }

  /** Rank-biased overlap of the two retrieval legs at dyadic
    * persistence p = 1/2 (Webber, Moffat & Zobel 2010, TOIS §4 — the
    * standard TOP-WEIGHTED indefinite-rank agreement measure) — the
    * fourth member of the retrieval-eval family: q257's τ weighs every
    * shared-rank pair EQUALLY, but a serving cutoff reads the TOP of
    * each leg, so leg redundancy should be judged top-weighted. The
    * bounded-prefix form (Webber's RBO_MIN at depth [[RrfDepth]], no
    * residual extrapolation — the depth is the contract):
    * rbo = (1−p)·Σ_{d=1..D} p^{d−1}·O_d/d = Σ_d O_d/(2^d·d) at p=1/2,
    * with O_d = |lex@d ∩ vec@d| the prefix-overlap curve.
    *
    * p = 1/2 is the DYADIC choice made for exactness: p^{d−1}(1−p) is
    * exactly 2^{−d}, so every term is the pure INTEGER division
    * ⌊10⁹·O_d/(2^d·d)⌋ and rbo_nano an exact long sum — no float, no
    * pow() to diverge cross-engine (Webber's usual p=0.9 needs p^d,
    * and neither engine guarantees correctly-rounded pow). Terms past
    * d≈35 floor to 0 at nano grain — the top-weighting that IS the
    * measure. Scale shape: both legs are driver-bounded depth-D
    * frames (the cached q152 corpus frame upstream), the depth grid ×
    * shared join is ≤ D² rows — constants at any corpus. Output: the
    * per-depth trace (depth, o_d, term_nano) with the rbo_nano total,
    * D rows. */
  private val q263RboLegs: Q = (s, dir) => {
    val (_, lexTop, vecTop, _) = hybridRrfParts(s, dir)
    val shared = lexTop.select(col("doc_id"), col("rank_lex"))
      .join(vecTop.select(col("doc_id"), col("rank_vec")), Seq("doc_id"))
    val grid = s.range(1, RrfDepth + 1).select(col("id").cast("long").as("depth"))
    val od = grid.join(broadcast(shared),
        col("rank_lex") <= col("depth") && col("rank_vec") <= col("depth"), "left")
      .groupBy(col("depth"))
      .agg(count(col("doc_id")).as("o_d")) // counts non-null: 0 when no overlap yet
    val terms = od.select(col("depth"), col("o_d"),
      expr("(o_d * 1000000000) div (shiftleft(1L, cast(depth as int)) * depth)")
        .as("term_nano"))
    val tot = terms.agg(sum(col("term_nano")).as("rbo_nano"))
    terms.crossJoin(broadcast(tot)).orderBy(col("depth"))
  }

  /** Compression-ratio quality signal
    * ([[graft.functions.DeflateRatio]]) — the Dolma/Gopher-lineage
    * repetition proxy: one cheap scalar per document, no n-gram
    * tables, highly repetitive text sinking far below prose. Zero
    * shuffle; the per-thread-reused zlib stream keeps the scan
    * allocation-flat at corpus scale. zlib has no relational twin, so
    * the oracle is a GATE VECTOR (q65/q135 pattern) over invariants a
    * correct implementation guarantees: every nonempty ratio is
    * positive and respects zlib's worst-case size bound (stored blocks
    * + stream wrapper: compressed ≤ raw·1.001 + 64 — the CONSTANT term
    * matters: on this corpus's shortest docs the ~11-byte wrapper
    * alone pushes the ratio past 1, so a pure ratio ceiling would
    * misfire), doubling a text never raises its ratio (the second copy
    * is one long back-reference), and the signal has real spread. */
  private val q153CompressRatio: Q = (s, dir) => {
    val r = call_function("deflate_ratio", col("text"))
    val r2 = call_function("deflate_ratio", concat(col("text"), col("text")))
    Tables.documents(s, dir)
      .select(col("doc_id"), length(col("text")).as("len"),
        r.as("ratio"), r2.as("ratio2"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("len") > 0 && (col("ratio") <= 0.0 ||
            col("ratio") * col("len") > col("len") * 1.001 + 64.0), 1L)
          .otherwise(0L)).as("n_invalid"),
        sum(when(col("ratio2") > col("ratio") + 1e-9, 1L).otherwise(0L)).as("n_double_worse"),
        (min(col("ratio")) < max(col("ratio"))).cast("int").as("spread_gate"))
  }

  /** Robust per-source length profile — median + MAD (median absolute
    * deviation), the outlier-resistant location/spread pair a corpus
    * dashboard wants where mean/σ (q31/q41 family) are skew-fragile:
    * one boilerplate 100k-token doc moves a source's mean by orders of
    * magnitude but its median by at most one rank. Exact interpolated
    * percentiles here (both engines: (a+b)/2 halves — exact doubles);
    * the 100 TB path swaps in approx_percentile (the q64 sketch) since
    * an exact median needs a per-group sort, and the MAD pass reuses
    * the same one-row-per-source broadcast join this plan uses.
    *
    * SPEC-SIDE REFERENCE, not served: `q142_robust_stats` serves
    * [[q198RobustTwophase]] (exact two-phase selection, no per-group
    * sort); TwoPhaseParitySpec pins this form equal to the served one. */
  private[graft] val q142RobustStatsWindowRef: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
      .select(col("source"), size(toksCol(col("text"))).cast("long").as("n"))
      .cache()
    val med = d.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"), expr("percentile(n, 0.5)").as("med"))
    val mad = d.join(broadcast(med.select(col("source"), col("med"))), "source")
      .select(col("source"), abs(col("n") - col("med")).as("dv"))
      .groupBy(col("source")).agg(expr("percentile(dv, 0.5)").as("mad"))
    med.join(mad, "source")
      .select(col("source"), col("n_docs"),
        fpRound4(col("med")).as("med_tokens"), fpRound4(col("mad")).as("mad_tokens"))
      .orderBy(col("source"))
  }

  /** q142's documented 100 TB degrade, EXERCISED — and exact: the same
    * per-source median+MAD profile through
    * [[graft.operators.DistributedSelect.kthByGroup]] (two-phase
    * histogram selection, two jobs per statistic for every source at
    * once, no per-group sort and no sketch error — the reason the
    * documented `approx_percentile` fallback is retired). Arithmetic
    * rides a DOUBLED integer grid so the interpolated semantics of
    * `percentile(.., 0.5)` stay exact: token counts double to even
    * longs (even-count median = (a+b)/2 = exact integer there), the
    * deviations |v − med2| are integer, and the MAD's own even-count
    * average lands on exact binary halves — so the 4dp outputs equal
    * q142's bit-for-bit, which the SHARED oracle SQL and the parity
    * spec both pin. */
  private val q198RobustTwophase: Q = (s, dir) => {
    import s.implicits._
    import graft.operators.DistributedSelect
    val d = Tables.documents(s, dir)
      .select(col("source").as("g"),
        (size(toksCol(col("text"))) * 2).cast("long").as("v"))
      .cache()
    try {
      val counts = d.groupBy(col("g")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      def medRanks(n: Long): Seq[Long] =
        if (n % 2 == 1) Seq((n + 1) / 2) else Seq(n / 2, n / 2 + 1)
      val ranks = counts.map { case (g, n) => g -> medRanks(n) }
      val medSel = DistributedSelect.kthByGroup(d, ranks, width = 64L)
      // doubled-grid median: even-count average of two EVEN values —
      // exact integer division
      val med2 = counts.map { case (g, n) =>
        val ks = medRanks(n)
        g -> ks.map(k => medSel((g, k))).sum / ks.size
      }
      val medDf = broadcast(med2.toSeq.toDF("g", "med2"))
      val dv = d.join(medDf, Seq("g"))
        .select(col("g"), abs(col("v") - col("med2")).as("v"))
      val madSel = DistributedSelect.kthByGroup(dv, ranks, width = 64L)
      counts.toSeq.map { case (g, n) =>
        val ks = medRanks(n)
        val mad2 = ks.map(k => madSel((g, k))).sum.toDouble / ks.size
        (g, n, med2(g) / 2.0, mad2 / 2.0)
      }.toDF("source", "n_docs", "med_raw", "mad_raw")
        .select(col("source"), col("n_docs"),
          fpRound4(col("med_raw")).as("med_tokens"),
          fpRound4(col("mad_raw")).as("mad_tokens"))
        .orderBy(col("source"))
    } finally d.unpersist() // output is driver-built — no lineage on d
  }

  /** The distribution-rank window battery (ntile / percent_rank /
    * cume_dist) — the q08/q24/q74 family's remaining members, ranking
    * each doc's length within its source: quartile assignment, the
    * exact (rank−1)/(n−1) percentile, and the ≤-mass. Ties broken by
    * doc_id so both engines walk one total order; the rank ratios are
    * small-int quotients (exact doubles), 4dp-floored on both sides.
    * One partitioned window — the q130 scale shape, no global sort. */
  private val q143WindowRanks: Q = (s, dir) => {
    val w = Window.partitionBy(col("source")).orderBy(col("n_tokens"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        size(toksCol(col("text"))).cast("long").as("n_tokens"))
      .select(col("source"), col("doc_id"), col("n_tokens"),
        ntile(4).over(w).cast("long").as("quartile"),
        fpRound4(percent_rank().over(w)).as("pct_rank"),
        fpRound4(cume_dist().over(w)).as("cum_dist"))
      .orderBy(col("source"), col("n_tokens"), col("doc_id"))
  }

  /** REAL image decode on the oracle-checked surface (q40 proves the
    * binary-column plumbing with stub arithmetic the oracle can restate;
    * this proves the CODEC): generate one losslessly-encoded PNG per row
    * — geometry and a per-pixel color pattern both pure functions of the
    * row id — alongside the checksum the nearest-neighbor resample MUST
    * produce if ImageIO returns exactly the encoded pixels. Then run the
    * production [[Multimodal.resize]] operator over the payloads and
    * count mismatches. PNG is lossless, the pattern and the resample are
    * integer arithmetic, so every invariant is an exact constant the
    * oracle states directly (the q91/q92 pattern). The per-row PNG
    * encode lives in the same mapPartitions shape production ingest
    * would use — no driver-side image work. */
  private val q93ImageDecode: Q = (s, dir) => {
    import s.implicits._
    val n = 200
    val (tw, th) = (6, 4)
    val gen = s.range(n).select(col("id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val sw = 5 + (id % 4).toInt
        val sh = 4 + (id % 3).toInt
        def pix(x: Int, y: Int): Int =
          (((id * 31 + x * 17 + y * 101) * 2654435761L) % 0x1000000L).toInt
        val img = new java.awt.image.BufferedImage(
          sw, sh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < sh) { var x = 0; while (x < sw) { img.setRGB(x, y, pix(x, y)); x += 1 }; y += 1 }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        // the checksum decodeResize must produce: same nearest-neighbor
        // source-index arithmetic over the same pattern
        var acc = 0L
        var ty = 0
        while (ty < th) {
          val sy = (ty.toLong * sh / th).toInt
          var tx = 0
          while (tx < tw) {
            val sx = (tx.toLong * sw / tw).toInt
            acc = (acc * 31 + (pix(sx, sy) & 0xffffff)) % 1000000007L
            tx += 1
          }
          ty += 1
        }
        (id, bos.toByteArray, sw, sh, acc)
      }
      // query-scoped cache: the result lineage reads gen twice (resize
      // input + expected-value join) — without it every rep re-encodes
      // all 200 PNGs twice; the runner's clearCache releases it
    }.toDF("img_id", "payload", "exp_w", "exp_h", "exp_checksum").cache()
    val resized = Multimodal.resize(gen, "img_id", "payload", tw, th)
    resized.join(gen.drop("payload"), "img_id")
      .agg(
        count(lit(1)).as("n_images"),
        sum(when(col("decoded"), 1L).otherwise(0L)).as("n_decoded"),
        sum(when(col("src_width") === col("exp_w") &&
          col("src_height") === col("exp_h"), 1L).otherwise(0L)).as("n_geometry_match"),
        sum(when(col("pixel_checksum") === col("exp_checksum"), 1L).otherwise(0L))
          .as("n_pixel_match"))
  }

  /** REAL audio decode on the oracle-checked surface — the q93 pattern
    * for WAV: per row, synthesize 16-bit PCM whose sample values are a
    * pure function of (row id, sample index), encode to WAV
    * (javax.sound.sampled — lossless like PNG), run the production
    * [[Multimodal.audioFrames]] operator, and compare its per-frame
    * exact-integer energy features against the same arithmetic applied
    * to the raw pattern. All gates are constants for the oracle. */
  private val q94AudioDecode: Q = (s, dir) => {
    import s.implicits._
    val n = 200
    val frameSamples = 40
    val stride = 2
    val rate = 8000f
    val gen = s.range(n).select(col("id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val ns = 160 + (id % 5).toInt * 20
        def sample(i: Int): Short = (((id * 7 + i * 13) % 4001) - 2000).toShort
        val pcm = new Array[Byte](ns * 2) // 16-bit little-endian mono
        var i = 0
        while (i < ns) {
          val v = sample(i)
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, ns.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        val nFrames = ns / frameSamples
        val expFrames = (0 until nFrames by stride).map { f =>
          var sAbs = 0L
          var j = f * frameSamples
          while (j < (f + 1) * frameSamples) { sAbs += math.abs(sample(j).toLong); j += 1 }
          (f, sAbs)
        }
        (id, bos.toByteArray, ns, nFrames, expFrames)
      }
      // query-scoped cache: same two-reader shape as q93
    }.toDF("audio_id", "payload", "exp_samples", "exp_frames_n", "exp_frames").cache()
    val framed = Multimodal.audioFrames(gen, "audio_id", "payload", frameSamples, stride)
    framed.join(gen.drop("payload"), "audio_id")
      .agg(
        count(lit(1)).as("n_clips"),
        sum(when(col("decoded"), 1L).otherwise(0L)).as("n_decoded"),
        sum(when(col("sample_rate") === 8000 &&
          col("n_samples") === col("exp_samples"), 1L).otherwise(0L)).as("n_shape_match"),
        sum(when(col("n_frames") === col("exp_frames_n") &&
          col("frames") === col("exp_frames"), 1L).otherwise(0L)).as("n_energy_match"))
  }

  /** REAL video frame decode on the oracle-checked surface — the
    * q93/q94 generate-then-verify pattern for MJPEG-in-AVI: per row,
    * render a few frames whose pixels are a pure function of
    * (row id, frame, x, y), JPEG-encode each (ImageIO), and compute the
    * EXPECTED per-frame checksum by decoding those exact JPEG bytes
    * with the same decoder the production operator uses — JPEG is
    * lossy, but decode-of-given-bytes is deterministic, so the
    * container roundtrip (RIFF mux → [[Multimodal.videoFrames]] demux →
    * per-frame ImageIO) is gated EXACTLY: one frame lost, reordered,
    * byte-shifted, or decoded differently breaks n_frame_match. All
    * gates are constants for the oracle. */
  private val q112VideoDecode: Q = (s, dir) => {
    import s.implicits._
    val n = 100
    val stride = 2
    val gen = s.range(n).select(col("id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val nf = 3 + (id % 3).toInt
        val (w, h) = (16 + (id % 3).toInt * 8, 8 + (id % 2).toInt * 8)
        val jpegs = (0 until nf).map { f =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y,
                (((id * 131 + f * 31 + x * 17 + y * 101) * 2654435761L) % 0x1000000L).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", bos)
          bos.toByteArray
        }
        // expected = decode of the SAME bytes through the SAME codec
        val expFrames = (0 until nf by stride).map { f =>
          (f, Multimodal.pixelChecksum(Multimodal.decodeImage(jpegs(f)).get))
        }
        (id, Multimodal.encodeAviMjpeg(jpegs, w, h, fps = 10), w, h, nf, expFrames)
      }
      // query-scoped cache: same two-reader shape as q93/q94
    }.toDF("video_id", "payload", "exp_w", "exp_h", "exp_frames_n", "exp_frames").cache()
    val framed = Multimodal.videoFrames(gen, "video_id", "payload", stride)
    framed.join(gen.drop("payload"), "video_id")
      .agg(
        count(lit(1)).as("n_videos"),
        sum(when(col("decoded"), 1L).otherwise(0L)).as("n_decoded"),
        sum(when(col("width") === col("exp_w") &&
          col("height") === col("exp_h"), 1L).otherwise(0L)).as("n_geometry_match"),
        sum(when(col("n_frames") === col("exp_frames_n") &&
          col("frames") === col("exp_frames"), 1L).otherwise(0L)).as("n_frame_match"))
  }

  /** Product quantization on the oracle surface (the q65/q104
    * invariant-flag pattern — KMeans codebooks aren't SQL-expressible,
    * their defining invariants are): fit [[ProductQuant]] codebooks,
    * encode the corpus, and gate (a) code shape/range, (b) assignment
    * OPTIMALITY — every stored code's subdistance equals the true
    * subspace minimum recomputed independently (exact: encode and gate
    * share the d2 expression and codebook literal), and (c) encode
    * determinism under repartitioning. Counts restate from the
    * embeddings table. */
  private val q114ProductQuant: Q = (s, dir) => {
    import s.implicits._
    val (m, k) = (8, 16)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb")).cache()
    try {
      val pq = ProductQuant.fit(e, "emb", m = m, k = k)
      val subDim = pq.subDim
      // the same native kernel encode's argmin uses — bit-identical
      def d2(a: Column, b: Column): Column = call_function("sq_dist", a, b)
      // EXACT optimality: encode's argmin and this recomputation use the
      // same d2 expression over the same codebook literal, so the
      // assigned subdistance must EQUAL the subspace minimum bit-for-bit
      val violations = (0 until m).map { j =>
        val cb = typedLit(pq.centers(j))
        val sub = slice(col("emb"), j * subDim + 1, subDim)
        val assigned = d2(sub, element_at(cb, element_at(col("codes"), j + 1) + 1))
        val minAll = aggregate(transform(cb, cw => d2(sub, cw)),
          lit(Double.MaxValue), (a, b) => least(a, b))
        when(assigned > minAll, 1L).otherwise(0L)
      }.reduce(_ + _)
      def checksum = sum(hash(col("vec_id"), col("codes")).cast("long"))
      val coded = ProductQuant.encode(e, "emb", pq).cache()
      try {
        val st = coded.agg(
          count(lit(1)).as("n"),
          sum(when(size(col("codes")) === m &&
            !exists(col("codes"), c => c < 0 || c >= k), 0L).otherwise(1L)).as("shape_bad"),
          sum(violations).as("opt_bad"),
          checksum.as("cs")).head()
        val cs2 = ProductQuant.encode(e.repartition(7), "emb", pq)
          .agg(checksum.as("cs")).head().getLong(0)
        Seq((
          st.getLong(0),
          if (st.getLong(1) == 0L) 1 else 0,
          if (st.getLong(2) == 0L) 1 else 0,
          if (st.getLong(3) == cs2) 1 else 0
        )).toDF("n_vectors", "codes_shape_ok", "assignment_optimal", "encode_deterministic")
      } finally coded.unpersist()
    } finally e.unpersist()
  }

  /** ANN index-tier PERSISTENCE on the oracle surface (the q93/q94
    * lossless-roundtrip pattern, applied to the index lifecycle): build
    * the IVF index and the PQ codebooks, encode the corpus, persist all
    * three artifacts — centroids ([[IvfSearch.save]]), codebooks
    * ([[ProductQuant.save]]), coded corpus (a parquet table partitioned
    * by inverted list) — reload them into fresh objects, and gate that
    * the composed IVF+ADC search over the LOADED artifacts is
    * row-identical to the in-session one. At 100 TB the index is built
    * once and served for weeks by sessions that never saw the fit
    * (ingest gates, query services), so save→load identity is the
    * contract that makes the lifecycle safe; the reference persists
    * every artifact it fits (reference preprocess.py:52-55,
    * train_model.py:113-114). The PQ codes ride the saved corpus as a
    * COLUMN (the [[graft.streaming.StreamOps.ivfIngestSink]] layout),
    * so one partitioned table serves both the IVF and ADC tiers — no
    * second full-corpus artifact. Identity checks compare multiset
    * SIGNATURES (row count + order-independent xxhash64 sum — the
    * driver's own hash-compare discipline; exact set-difference
    * identity is pinned in IvfSearchSpec/ProductQuantSpec, and
    * exceptAll here would pay four shuffles + two joins per run for
    * the same verdict), all folded into ONE driver action (the q104
    * discipline); the centroid/codebook artifacts compare driver-side
    * — they are metadata-sized by construction.
    *
    * COST DISCIPLINE: this gate proves lifecycle IDENTITY, not index
    * quality — q65/q114 already fit and exercise the full-corpus index
    * in the same sweep, so re-fitting it here at full size would be
    * pure redundancy. The gate therefore runs on a deterministic
    * quarter slice (`vec_id % 4 = 0`, restated in the oracle), counts
    * its query set once for both searches (`numQueries` — the
    * probe-broadcast sizing hint), caps the PQ fit at 8 Lloyd
    * iterations (identity holds for ANY fixed model; iteration count
    * only moves codebook quality, which q114 owns), and builds its
    * artifacts ONCE per session ([[q121Artifacts]]) — every run is a
    * fresh load + search + gate over the frozen artifacts, which is
    * exactly what a serving session does. */
  /** q121's build-once fixture (the prescribed shared build): the
    * lifecycle gate proves LOAD + SEARCH identity, so the fit and the
    * artifact writes happen once per (JVM, sf dir) — the production
    * shape, where the index is built once and every serving session
    * starts at `load()`. Re-running q121 (bench reps) re-executes the
    * loads, both searches, and the signature gate — never the fit.
    * Everything kept here is either driver-sized (centers, codebooks)
    * or a lazy plan (`coded` re-derives from the parquet scan after
    * the runner's clearCache), so the memo holds no storage blocks;
    * the artifact directory lives until JVM exit. */
  private val q121Memo = new java.util.concurrent.ConcurrentHashMap[
    String, (IvfSearch.Index, ProductQuant.Model, DataFrame, Long, String)]()

  private def q121Artifacts(s: SparkSession, dir: String) =
    q121Memo.computeIfAbsent(dir, _ => {
      val e = Tables.embeddings(s, dir)
        .filter(col("vec_id") % 4 === 0)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val index = IvfSearch.build(e, "vec_id", "emb", k = 8)
      val pq = ProductQuant.fit(e, "emb", m = 8, k = 16, maxIter = 8)
      val coded = ProductQuant.encode(index.indexed, "emb", pq)
      val nQ = e.filter(col("vec_id") % 100 === 0).count()
      val out = java.nio.file.Files.createTempDirectory("graft-annidx").toString
      // one corpus artifact: codes ride the saved corpus as a column
      IvfSearch.save(IvfSearch.Index(index.centers, coded), s"$out/ivf")
      ProductQuant.save(s, pq, s"$out/pq")
      sys.addShutdownHook(
        graft.Fs.deleteRecursively(java.nio.file.Paths.get(out)))
      (index, pq, coded, nQ, out)
    })

  private val q121IndexPersist: Q = (s, dir) => {
    import s.implicits._
    val (index, pq, coded, nQ, out) = q121Artifacts(s, dir)
    val reIdx = IvfSearch.load(s, s"$out/ivf")
    val rePq = ProductQuant.load(s, s"$out/pq")
    val reCoded = reIdx.indexed
    val queries = Tables.embeddings(s, dir)
      .filter(col("vec_id") % 4 === 0 && col("vec_id") % 100 === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    def run(ix: IvfSearch.Index, cd: DataFrame, m: ProductQuant.Model) =
      ProductQuant.ivfAdcSearch(ix, cd, "vec_id", "codes",
        queries, "vec_id", "emb", m, nProbe = 2, topK = 5,
        numQueries = Some(nQ))
    // both searches are read twice by the gate (count + signature);
    // uncached they would re-execute their probe/join/window plans
    val live = run(index, coded, pq).cache()
    val loaded = run(reIdx, reCoded, rePq).cache()
    try {
      // multiset signature: (row count, order-independent hash sum) —
      // summed in a decimal: summing 64-bit hashes in a long overflows
      // under ANSI (the x/0 family of traps)
      val codedCols = Seq("vec_id", "cluster", "codes")
      def msig(df: DataFrame, cs: Seq[String], n: String, h: String) =
        df.agg(count(lit(1)).as(n),
          coalesce(sum(xxhash64(cs.map(col): _*).cast("decimal(20,0)")),
            lit(0).cast("decimal(20,0)")).as(h))
      val searchCols = live.columns.toSeq
      val st = msig(coded, codedCols, "n_vectors", "h_coded")
        .crossJoin(msig(reCoded, codedCols, "n_recoded", "h_recoded"))
        .crossJoin(msig(live, searchCols, "n_live", "h_live"))
        .crossJoin(msig(loaded, searchCols, "n_loaded", "h_loaded"))
        .head()
      val (nVec, hVec, nRe, hRe) =
        (st.getLong(0), st.getDecimal(1), st.getLong(2), st.getDecimal(3))
      val (nLive, hLive, nLoaded, hLoaded) =
        (st.getLong(4), st.getDecimal(5), st.getLong(6), st.getDecimal(7))
      Seq((
        nVec,
        if (reIdx.centers == index.centers) 1 else 0,
        if (rePq == pq) 1 else 0,
        if (nRe == nVec && hRe == hVec) 1 else 0,
        if (nLoaded == nLive && hLoaded == hLive) 1 else 0,
        if (nLive > 0L) 1 else 0
      )).toDF("n_vectors", "centers_roundtrip", "codebooks_roundtrip",
        "coded_roundtrip", "search_identity", "results_nonempty")
    } finally { live.unpersist(); loaded.unpersist() }
  }

  /** Residual (IVFADC) tier over the q121 fixture: codebooks fit on
    * r = x − c_list ([[ProductQuant.fitResidual]]) spend their budget on
    * within-list detail instead of re-learning list positions — Jégou
    * et al. 2011 §IV's refinement of the raw-PQ path q114/q121 own.
    * Builds once per session on top of [[q121Artifacts]]' index (the
    * shared-fixture discipline); every run re-executes only the gates.
    *
    * Gates: code conservation (every indexed vector takes m in-range
    * residual codes — nothing quarantined, nothing silently −1-coded),
    * the refinement's point (residual reconstruction SSE ≤ raw SSE at
    * the SAME code budget, both models deterministic seeded fits over
    * the same deterministic corpus), and search completeness (the
    * residual-rebased probe path returns exactly topK per query). */
  private val q125Memo = new java.util.concurrent.ConcurrentHashMap[
    String, (ProductQuant.Model, DataFrame)]()

  private def q125Artifacts(s: SparkSession, dir: String) =
    q125Memo.computeIfAbsent(dir, _ => {
      val (index, _, _, _, _) = q121Artifacts(s, dir)
      val rpq = ProductQuant.fitResidual(index, "emb", m = 8, k = 16, maxIter = 8)
      (rpq, ProductQuant.encodeResidual(index.indexed, "emb", index.centers, rpq))
    })

  private val q125ResidualAdc: Q = (s, dir) => {
    import s.implicits._
    val (index, pq, coded, nQ, _) = q121Artifacts(s, dir)
    val (rpq, rcoded) = q125Artifacts(s, dir)
    val queries = Tables.embeddings(s, dir)
      .filter(col("vec_id") % 4 === 0 && col("vec_id") % 100 === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    def sse(target: String, m: ProductQuant.Model): Column =
      aggregate(zip_with(col(target), ProductQuant.decode(m, col("codes")),
        (x, y) => (x - y) * (x - y)), lit(0.0), (a, d) => a + d)
    val res = ProductQuant.ivfAdcSearch(index, rcoded, "vec_id", "codes",
      queries, "vec_id", "emb", rpq, nProbe = 2, topK = 5,
      numQueries = Some(nQ), residual = true)
    // one fused action: both SSEs, code-shape audit, search shape
    val st = coded.agg(count(lit(1)).as("n"), sum(sse("emb", pq)).as("sse_raw"))
      .crossJoin(
        ProductQuant.withResidual(rcoded, "emb", index.centers, "__res")
          .agg(sum(sse("__res", rpq)).as("sse_res"),
            count(when(col("codes").isNull ||
              size(col("codes")) =!= rpq.m ||
              exists(col("codes"), c => c < 0 || c >= rpq.k), 1)).as("bad_codes")))
      .crossJoin(res.groupBy(col("q_id")).agg(count(lit(1)).as("k_rows"))
        .agg(count(lit(1)).as("n_queries"),
          count(when(col("k_rows") =!= 5, 1)).as("incomplete")))
      .head()
    Seq((
      st.getLong(0),
      if (st.getLong(3) == 0L) 1 else 0,
      if (st.getDouble(2) <= st.getDouble(1)) 1 else 0,
      if (st.getLong(4) == nQ && st.getLong(5) == 0L) 1 else 0
    )).toDF("n_vectors", "residual_codes_ok", "residual_improves", "search_complete")
  }

  /** Optimized Product Quantization on the oracle surface (Ge et al.
    * CVPR 2013 — [[Opq]]): a learned ORTHOGONAL rotation ahead of the
    * subspace split, so the code budget spreads over decorrelated
    * subspaces instead of whatever dims happened to be adjacent.
    * Builds once per session ([[q126Artifacts]]: alternating fit,
    * save, reload); every run re-executes only the distributed gates.
    *
    * Gates: the rotation is orthogonal (max |R·Rᵀ − I| < 1e-9,
    * driver-side on the d×d model), rotation preserves norms on the
    * CORPUS (the isometry that makes rotated-space ADC distances valid
    * — computed through the codegen'd `mat_vec` kernel, so the
    * distributed rotate path is what's audited), code conservation
    * (every vector takes m in-range codes), the feature's point — OPQ
    * reconstruction SSE ≤ plain PQ's at the SAME (m, k, Lloyd budget),
    * both SSEs in ONE aggregation so the accumulation order matches —
    * save→load roundtrip identity, and search completeness of the
    * rotated-space ADC top-k. The ≤ gate is exact by construction:
    * the alternation tracks the best (R, codebooks) by sample SSE
    * starting from R = I (= plain PQ, same seed and sample), and at
    * these SFs the corpus IS the fit sample (≤ the 512·k cap). */
  private val q126Memo = new java.util.concurrent.ConcurrentHashMap[
    String, (Opq.Model, ProductQuant.Model, String)]()

  private def q126Artifacts(s: SparkSession, dir: String) =
    q126Memo.computeIfAbsent(dir, _ => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val opq = Opq.fit(e, "emb", m = 8, k = 16, opqIters = 6, maxIter = 8)
      val pq = ProductQuant.fit(e, "emb", m = 8, k = 16, maxIter = 8)
      val out = java.nio.file.Files.createTempDirectory("graft-opq").toString
      Opq.save(s, opq, out)
      sys.addShutdownHook(
        graft.Fs.deleteRecursively(java.nio.file.Paths.get(out)))
      (opq, pq, out)
    })

  private val q126Opq: Q = (s, dir) => {
    import s.implicits._
    val (opq, pq, out) = q126Artifacts(s, dir)
    val re = Opq.load(s, out)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    // one corpus pass carries both code sets and the rotated vector
    val coded = ProductQuant.encode(
      ProductQuant.encode(Opq.rotate(e, "emb", opq, "rot"), "rot", opq.pq, "opq_codes"),
      "emb", pq, "pq_codes")
    def sse(target: String, m: ProductQuant.Model, codes: String): Column =
      aggregate(zip_with(col(target), ProductQuant.decode(m, col(codes)),
        (x, y) => (x - y) * (x - y)), lit(0.0), (a, d) => a + d)
    def sqNorm(c: Column): Column =
      aggregate(c, lit(0.0), (a, x) => a + x * x)
    val queries = e.filter(col("vec_id") % 100 === 0)
    val res = Opq.adcSearch(coded.select(col("vec_id"), col("opq_codes")),
      "vec_id", "opq_codes", queries, "vec_id", "emb", opq, topK = 5)
    // one fused driver action: both SSEs (same row visit order — the
    // equality case of the ≤ gate is then bit-exact), isometry audit,
    // code-shape audit, query-set size, search shape
    val st = coded.agg(
      count(lit(1)).as("n"),
      sum(sse("rot", opq.pq, "opq_codes")).as("sse_opq"),
      sum(sse("emb", pq, "pq_codes")).as("sse_pq"),
      count(when(abs(sqNorm(col("rot")) - sqNorm(col("emb"))) >
        (lit(1.0) + sqNorm(col("emb"))) * 1e-8, 1)).as("iso_bad"),
      count(when(col("opq_codes").isNull ||
        size(col("opq_codes")) =!= opq.pq.m ||
        exists(col("opq_codes"), c => c < 0 || c >= opq.pq.k), 1)).as("bad_codes"),
      count(when(col("vec_id") % 100 === 0, 1)).as("n_queries"))
      .crossJoin(res.groupBy(col("q_id")).agg(count(lit(1)).as("k_rows"))
        .agg(count(lit(1)).as("q_served"),
          count(when(col("k_rows") =!= 5, 1)).as("incomplete")))
      .head()
    val d = opq.dim
    val orthoErr = (0 until d).iterator.flatMap { i =>
      (0 until d).iterator.map { j =>
        val dot = (0 until d).map(t => opq.rotation(i)(t) * opq.rotation(j)(t)).sum
        math.abs(dot - (if (i == j) 1.0 else 0.0))
      }
    }.max
    Seq((
      st.getLong(0),
      if (orthoErr < 1e-9) 1 else 0,
      if (st.getLong(3) == 0L) 1 else 0,
      if (st.getLong(4) == 0L) 1 else 0,
      if (st.getDouble(1) <= st.getDouble(2) * (1.0 + 1e-9)) 1 else 0,
      if (re.rotation == opq.rotation && re.pq == opq.pq) 1 else 0,
      if (st.getLong(6) == st.getLong(5) && st.getLong(7) == 0L) 1 else 0
    )).toDF("n_vectors", "rotation_orthogonal", "isometry_ok", "codes_ok",
      "opq_not_worse", "roundtrip_ok", "search_complete")
  }

  /** Recall gate for the COMPOSED serving stack — q136 pins plain IVF;
    * this pins OPQ rotation → IVF on the rotated space → residual PQ →
    * ADC shortlist → exact re-rank (ivfAdcRefine, IVFADC+R), i.e. the
    * pieces q126/q125/q114 verify separately, composed the way a
    * deployment actually serves. Everything runs in the ROTATED space
    * (distances are isometric — q126's pinned isometry gate — so L2
    * truth there IS L2 truth in the original space, and one space keeps
    * the 4dp tie structure consistent between truth and search).
    *
    * Gates (the oracle pins the vector, q136 pattern):
    *   - `refine_not_worse`: per query, refine recall ≥ raw-ADC recall
    *     at the same probes — a THEOREM, not an empirical bound: the
    *     ADC top-k is a subset of the refine shortlist, and a global
    *     top-k member in the shortlist cannot be displaced by exact
    *     distance (at most k−1 vectors beat it);
    *   - `shortlist_monotone`: per query, recall never decreases as the
    *     refine factor grows (×4 → ×16 → ×48) — also a theorem
    *     (shortlists nest, same displacement argument). This is the
    *     recall KNOB of IVFADC+R: shortlist size, not probe width;
    *   - `ivf_floor_exact`: plain IVF (probe + exact distance, no
    *     quantization) at full probe reproduces brute force — recall
    *     1.0, q136's pinned floor re-verified on the rotated index this
    *     stack actually serves;
    *   - `recall_floor_ok`: the full stack at full probe, shortlist ×48
    *     holds mean recall ≥ 0.85. The corpus is near-isotropic random
    *     64-d vectors — PQ's adversarial case (no low-dim structure for
    *     the codebooks to spend bits on; measured 0.96–1.0 here) — so
    *     the floor is deliberately a bound, not an exactness pin:
    *     quantized shortlists on structureless data lose tail ranks,
    *     and the honest contract is floor + the monotone knob above.
    * Truth includes the query's own vector (dist 0) — the corpus is
    * searched as stored; the gate's teeth are the remaining k−1 ranks. */
  private val q197Memo = new java.util.concurrent.ConcurrentHashMap[
    String, (IvfSearch.Index, ProductQuant.Model, DataFrame)]()

  private def q197Artifacts(s: SparkSession, dir: String) =
    q197Memo.computeIfAbsent(dir, _ => {
      val (opq, _, _) = q126Artifacts(s, dir)
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val rot = Opq.rotate(e, "emb", opq, "rot").select(col("vec_id"), col("rot"))
      val index = IvfSearch.build(rot, "vec_id", "rot", k = 8)
      val rpq = ProductQuant.fitResidual(index, "rot", m = 8, k = 16, maxIter = 8)
      val rcoded = ProductQuant.encodeResidual(index.indexed, "rot", index.centers, rpq)
      (index, rpq, rcoded)
    })

  private val q197StackRecall: Q = (s, dir) => {
    import s.implicits._
    val (index, rpq, rcoded) = q197Artifacts(s, dir)
    val queries = rcoded.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("rot"))
    val nQ = queries.count()
    def sq(a: Column, b: Column): Column = call_function("sq_dist", a, b)
    // L2 ground truth in the rotated space, the search's own 4dp order
    val wT = Window.partitionBy(col("q_id")).orderBy(col("dist"), col("vec_id"))
    val truth = rcoded.select(col("vec_id"), col("rot"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("q_id"), col("rot").as("q_rot"))))
      .withColumn("dist", round(sq(col("rot"), col("q_rot")), 4))
      .withColumn("rnk", row_number().over(wT))
      .filter(col("rnk") <= 3)
      .groupBy(col("q_id")).agg(collect_set(col("vec_id")).as("truth"))
    def refined(nProbe: Int, nm: String, refine: Int = 4) =
      ProductQuant.ivfAdcRefine(index, rcoded, "vec_id", "rot", "codes",
        queries, "vec_id", "rot", rpq, nProbe, topK = 3, refine = refine,
        numQueries = Some(nQ), residual = true)
        .groupBy(col("q_id")).agg(collect_set(col("neighbor_id")).as(nm))
    def adcOnly(nProbe: Int, nm: String) =
      ProductQuant.ivfAdcSearch(index, rcoded, "vec_id", "codes",
        queries, "vec_id", "rot", rpq, nProbe, topK = 3,
        numQueries = Some(nQ), residual = true)
        .groupBy(col("q_id")).agg(collect_set(col("neighbor_id")).as(nm))
    // plain IVF on the same rotated index: probe + exact distance only
    def plainIvf(nProbe: Int, nm: String) = {
      val wC = Window.partitionBy(col("q_id")).orderBy(col("c_dist"), col("cluster"))
      val wX = Window.partitionBy(col("q_id")).orderBy(col("dist"), col("vec_id"))
      val centroids = index.centers.zipWithIndex
        .map { case (c, i) => (i, c) }.toDF("cluster", "centroid")
      val probes = queries.select(col("vec_id").as("q_id"), col("rot").as("q_rot"))
        .crossJoin(broadcast(centroids))
        .withColumn("c_dist", sq(col("q_rot"), col("centroid")))
        .withColumn("c_rank", row_number().over(wC))
        .filter(col("c_rank") <= nProbe)
        .select(col("q_id"), col("q_rot"), col("cluster"))
      rcoded.select(col("vec_id"), col("rot"), col("cluster"))
        .join(broadcast(probes), Seq("cluster"))
        .withColumn("dist", round(sq(col("rot"), col("q_rot")), 4))
        .withColumn("rnk", row_number().over(wX))
        .filter(col("rnk") <= 3)
        .groupBy(col("q_id")).agg(collect_set(col("vec_id")).as(nm))
    }
    def recall(nm: String): Column =
      size(array_intersect(col(nm), col("truth"))).cast("double") / size(col("truth"))
    val per = truth
      .join(refined(2, "rf2"), Seq("q_id"))
      .join(refined(8, "m4"), Seq("q_id"))
      .join(refined(8, "m16", refine = 16), Seq("q_id"))
      .join(refined(8, "m48", refine = 48), Seq("q_id"))
      .join(adcOnly(2, "ad2"), Seq("q_id"))
      .join(plainIvf(8, "iv8"), Seq("q_id"))
      .select(col("q_id"), recall("rf2").as("r_rf2"), recall("m4").as("r_m4"),
        recall("m16").as("r_m16"), recall("m48").as("r_m48"),
        recall("ad2").as("r_ad2"), recall("iv8").as("r_iv8"))
    val st = per.agg(
      count(lit(1)).as("n"),
      min(when(col("r_rf2") >= col("r_ad2"), 1).otherwise(0)).as("nw"),
      min(when(col("r_m4") <= col("r_m16") && col("r_m16") <= col("r_m48"), 1)
        .otherwise(0)).as("mono"),
      min(when(col("r_iv8") === 1.0, 1).otherwise(0)).as("ivfx"),
      avg(col("r_m48")).as("mr48"))
      .head()
    Seq((st.getLong(0), st.getInt(1), st.getInt(2), st.getInt(3),
      if (st.getDouble(4) >= 0.85) 1 else 0))
      .toDF("n_queries", "refine_not_worse", "shortlist_monotone",
        "ivf_floor_exact", "recall_floor_ok")
  }

  /** Int8 scalar quantization of the embedding column — at 100 TB the
    * ANN working set is dominated by float embeddings, and symmetric
    * max-abs int8 cuts memory/shuffle 4× (with ~0.5% cosine error at
    * these dims). Per vector: scale = max|x|, q_i = floor(x_i·127/scale
    * + 0.5) — pure scan-shaped column arithmetic (one transform, no
    * shuffle), and every step is IEEE-replicable in the oracle (the
    * floor-form rounding from the shared fpRound4 discipline), so the
    * gates are the exact integer checksum of the quantized codes and
    * the reconstruction-error bound 1/254 · scale. */
  private val q95QuantizeEmbeddings: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val scale = array_max(transform(col("emb"), x => abs(x)))
    e.withColumn("scale", scale)
      // all-zero vectors quantize to all-zero codes (guard the 0-divide)
      .withColumn("q", when(col("scale") === 0.0,
          transform(col("emb"), _ => lit(0L)))
        .otherwise(transform(col("emb"), x => floor(x * 127.0 / col("scale") + 0.5).cast("long"))))
      .withColumn("recon_err", when(col("scale") === 0.0, lit(0.0)).otherwise(
        aggregate(
          zip_with(col("emb"), col("q"), (x, qi) => abs(x - qi * col("scale") / 127.0)),
          lit(0.0), (acc, d) => greatest(acc, d))))
      .select(
        col("vec_id"),
        // position-weighted integer checksum: any single code off by one
        // at any dim changes it
        aggregate(zip_with(col("q"),
            sequence(lit(1L), size(col("q")).cast("long")), (qi, i) => qi * i),
          lit(0L), (acc, v) => acc + v).as("q_checksum"),
        aggregate(col("q"), lit(0L), (acc, qi) => greatest(acc, abs(qi))).as("q_max_abs"),
        fpRound4(col("recon_err") / (col("scale") / 254.0 + lit(1e-300))).as("err_vs_bound"))
  }

  /** BM25 relevance scoring of the corpus against a query term set —
    * the retrieval/quality-scoring primitive a training-data pipeline
    * uses for keyword-targeted subset selection. Shape: tokenize →
    * filter to query terms BEFORE the explode shuffle (per-doc work is
    * O(matching tokens), not O(all tokens)) → tf per (doc, term) → df
    * per term (tiny, broadcast) → per-term contribution → fixed-order
    * sum. Uses the rational Robertson-Sparck-Jones idf
    * (N - df + 0.5)/(df + 0.5) WITHOUT the textbook ln(): every step is
    * then +,-,*,/ on exactly-reproducible doubles, so the oracle
    * hash-compare is IEEE-exact (ln differs by ULPs across libms; swap
    * in log() for textbook BM25 — same per-term ordering). Constants
    * are spelled identically on both sides (2.2 = k1+1 pre-folded,
    * 0.25 = 1-b) so neither engine folds them differently. */
  private val q96Bm25: Q = (s, dir) => {
    val qTerms = Seq("join", "vector", "stream")
    // ONE corpus scan: per-doc term frequencies via codegen'd
    // higher-order filter/size — no explode, no per-token shuffle rows.
    // The naive tf/df/stats formulation scanned the corpus three times
    // (explode+agg for tf, a second explode+agg for df, a stats agg);
    // at 100 TB that is 3× IO for a query whose working set after this
    // projection is 5 small columns.
    val perDoc = Tables.documents(s, dir)
      .select(col("doc_id") +: TextOps.tokens(col("text")).as("tk") +: Nil: _*)
      .select(col("doc_id") +: size(col("tk")).cast("double").as("dl") +:
        qTerms.zipWithIndex.map { case (t, i) =>
          size(filter(col("tk"), x => x === lit(t))).cast("double").as(s"tf$i")
        }: _*)
      .cache() // read twice (stats fold + scoring); runner clearCache releases
    // corpus stats + per-term dfs fold to FIVE driver constants (q91
    // pattern) — both engines then compute idf from identical integers
    val stAggs = count(lit(1)).cast("double").as("n_docs") +:
      (sum(col("dl")) / count(lit(1))).as("avgdl") +: // integer-valued doubles: exact sum
      qTerms.indices.map(i =>
        coalesce(sum(when(col(s"tf$i") > 0.0, 1L)), lit(0L)).cast("double").as(s"df$i"))
    val st = perDoc.agg(stAggs.head, stAggs.tail: _*).head()
    val (nDocs, avgdl) = (st.getDouble(0), st.getDouble(1))
    // per-term contribution; an absent term has tf = 0 so contributes
    // exactly 0.0 — no conditional needed. Fixed left-to-right addition
    // order (a groupBy float sum is order-nondeterministic at the ULP,
    // which the hash-compare would see).
    val contribs = qTerms.indices.map { i =>
      val idf = (nDocs - st.getDouble(2 + i) + 0.5) / (st.getDouble(2 + i) + 0.5)
      lit(idf) * (col(s"tf$i") * lit(2.2) / (col(s"tf$i") +
        lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl))))
    }
    // the oracle's universe is docs matching ≥1 query term (its tf CTE
    // filters before grouping); keep the universes identical or a corpus
    // with <20 matching docs pads Spark's top-20 with bm25=0 rows the
    // oracle never emits. tf sums are integer-valued doubles — exact.
    perDoc.filter(qTerms.indices.map(i => col(s"tf$i")).reduce(_ + _) > 0.0)
      .select(col("doc_id"), fpRound4(contribs.reduce(_ + _)).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  /** PII detection + redaction — the scrub pass every training-data
    * pipeline runs before anything else. Detection is regexp_count per
    * category, redaction regexp_replace to a category tag; both are
    * codegen'd scan-shaped column ops (no UDF, no shuffle). Patterns
    * stay inside the RE2-compatible subset (no backrefs/lookaround) so
    * Java regex and the oracle's RE2 agree. Because the corpus tables
    * carry no real PII, the input is synthesized from row ids (the
    * q93/q94 generate-then-verify pattern, exact string concat on both
    * engines) — emails, North-American-style phone numbers, and IPv4s
    * woven between filler words; doc text joins in as untainted noise. */
  private val q97PiiRedact: Q = (s, dir) => {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\d{3}-\\d{3}-\\d{4}"
    val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val text = concat(
      lit("contact user"), col("doc_id"), lit("@mail"), pmod(col("doc_id"), lit(7L)),
      lit(".example.com or call 555-"),
      lpad(pmod(col("doc_id") * 37L, lit(1000L)).cast("string"), 3, "0"),
      lit("-"), lpad(pmod(col("doc_id") * 91L, lit(10000L)).cast("string"), 4, "0"),
      lit(" from 10."), pmod(col("doc_id"), lit(256L)),
      lit(".0."), pmod(col("doc_id") * 3L, lit(256L)),
      lit(" re: "), substring(col("doc_text"), 1, 40))
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("text").as("doc_text"))
      .withColumn("text", text)
    base.select(
      col("doc_id"),
      regexp_count(col("text"), lit(emailRe)).as("n_email"),
      regexp_count(col("text"), lit(phoneRe)).as("n_phone"),
      regexp_count(col("text"), lit(ipRe)).as("n_ip"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        emailRe, "[EMAIL]"), phoneRe, "[PHONE]"), ipRe, "[IP]").as("redacted"))
  }

  /** URL canonicalization + dedup — the FIRST dedup pass of any web-crawl
    * corpus (exact-URL dedup is cheaper than any content hash and removes
    * the bulk of recrawl duplicates). URLs are synthesized from row ids
    * (the q97 pattern: exact string concat on both engines) with the
    * noise a real crawl carries — mixed-case hosts, `www.` prefixes,
    * trailing slashes, tracking params, fragments. Spark side parses with
    * `parse_url` (codegen'd, scan-shaped); canonicalization is lowercased
    * de-`www.`ed host + trailing-slash-stripped path + utm-stripped
    * sorted query. The dedup groupBy keys on the canonical string — a
    * hash shuffle on a bounded-size key, the same plan at any corpus
    * size. The oracle re-derives host/path/query with regexes. */
  private val q101UrlCanonical: Q = (s, dir) => {
    // `page` is the true identity: every noise axis below (www, case,
    // trailing slash, tracking param, param order, fragment) varies with
    // doc_id but canonicalizes away, so each page's N/50 recrawls
    // collapse to one canonical URL.
    val page = pmod(col("doc_id"), lit(50L))
    val host = concat(
      when(col("doc_id") % 2 === 0, lit("WWW.")).otherwise(lit("")),
      lit("site"), pmod(page, lit(7L)),
      when(col("doc_id") % 3 === 0, lit(".Example.COM")).otherwise(lit(".example.com")))
    val path = concat(lit("/p/"), page,
      when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")))
    val utm = concat(lit("utm_source=s"), pmod(col("doc_id"), lit(11L)))
    val ref = concat(lit("ref=r"), pmod(page, lit(3L)))
    val query = when(page % 5 === 0, utm)
      .when(col("doc_id") % 3 === 0, concat(ref, lit("&"), utm)) // order noise
      .otherwise(concat(utm, lit("&"), ref))
    val frag = when(col("doc_id") % 4 === 0, concat(lit("#sec"), pmod(col("doc_id"), lit(6L))))
      .otherwise(lit(""))
    val urls = Tables.documents(s, dir)
      .select(col("doc_id"),
        concat(lit("https://"), host, path, lit("?"), query, frag).as("url"))
    val hostC = regexp_replace(lower(parse_url(col("url"), lit("HOST"))), "^www\\.", "")
    val pathC = regexp_replace(parse_url(col("url"), lit("PATH")), "/$", "")
    val params = filter(split(coalesce(parse_url(col("url"), lit("QUERY")), lit("")), "&"),
      p => !p.startsWith("utm_") && p =!= lit(""))
    val queryC = array_join(array_sort(params), "&")
    urls
      .withColumn("canon", concat(lit("https://"), hostC, pathC,
        when(queryC === "", lit("")).otherwise(concat(lit("?"), queryC))))
      .groupBy(col("canon"))
      .agg(min(col("doc_id")).as("canonical_doc"), count(lit(1)).as("n_dups"))
      .orderBy(col("canon"))
  }

  /** SemDeDup semantic dedup on the oracle surface — the
    * generate-then-verify pattern (q93/q94): inject a SCALED copy of
    * every 10th vector (id + 1,000,000, values × 1.5 — same direction,
    * so after L2 normalization it is the same point and cosine is ~1),
    * run [[SemDedup.dedup]], and gate the invariants the algorithm
    * guarantees: row conservation, every injected copy dropped in favor
    * of its lower-id original, every dropped row's canonical kept, and
    * kept-set maximality (no two kept rows in a cluster within τ). The
    * oracle restates the counts from the base table and the flags as
    * constants (the q65/q91 pattern for operators SQL cannot express). */
  private val q104SemDedup: Q = (s, dir) => {
    import s.implicits._
    val base = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    // the copy-id offset clears the REAL id range (a fixed 1e6 would
    // collide with genuine vec_ids at a large enough SF, corrupting the
    // canonical checks and the injected-population counts)
    val offset = math.max(1000000L,
      base.agg(max(col("vec_id"))).head().getLong(0) + 1L)
    val copies = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + lit(offset)).as("vec_id"),
        transform(col("emb"), x => x * lit(1.5)).as("emb"))
    val tau = 0.99
    // the quantizer fit runs IvfSearch's default bounded-sample path —
    // at these SFs the 512·k cap exceeds the corpus, so every distinct
    // point trains and the fit is the driver-local seeded Lloyd loop
    // (one bounded collect, zero MLlib jobs)
    val res = SemDedup.dedup(base.union(copies), "vec_id", "emb", tau, k = 8).cache()
    try {
      // ONE action for EVERY scalar gate — the frame counts (q91
      // pattern) AND both re-verification counts (canonical-of-dropped
      // is kept; kept-set maximality), composed as a cross join of
      // their 1-row aggregates: each extra driver action is a whole
      // Spark job of fixed overhead locally and a scheduler barrier at
      // cluster scale (was TWO actions — the counts head() and the
      // verification head()). The one action also materializes the res
      // cache its three subtrees share. normed is read twice (both
      // pair sides) and l2Normalize is an interpreted HOF — cache it
      // for the one action that consumes it
      val countsDf = res.agg(
        count(lit(1)).as("n_total"),
        sum(when(!col("keep") && col("vec_id") >= offset, 1L).otherwise(0L))
          .as("inj_dropped"),
        sum(when(col("vec_id") >= offset, 1L).otherwise(0L)).as("n_injected"),
        countDistinct(col("vec_id")).as("n_distinct"))
      val canonNotKeptDf = res.filter(!col("keep"))
        .join(res.filter(col("keep")).select(col("vec_id").as("canonical")),
          Seq("canonical"), "left_anti")
        .agg(count(lit(1)).as("canon_not_kept"))
      val keptL = res.filter(col("keep")).select(col("cluster"), col("vec_id").as("a"))
      val keptR = res.filter(col("keep")).select(col("cluster"), col("vec_id").as("b"))
      val normed = base.union(copies).select(col("vec_id"),
        SemDedup.l2Normalize(col("emb")).as("ne")).cache()
      val (nTotal, injDropped, nInjected, nDistinct, canonNotKept, keptClose) =
        try {
          val row = countsDf.crossJoin(canonNotKeptDf).crossJoin(
            keptL.join(keptR, Seq("cluster")).filter(col("a") < col("b"))
              .join(normed.select(col("vec_id").as("a"), col("ne").as("ea")), Seq("a"))
              .join(normed.select(col("vec_id").as("b"), col("ne").as("eb")), Seq("b"))
              .filter(call_function("cosine_sim", col("ea"), col("eb")) >= lit(tau))
              .agg(count(lit(1)).as("kept_close"))).head()
          (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
            row.getLong(4), row.getLong(5))
        } finally normed.unpersist()
      // conservation is a REAL gate: one output row per DISTINCT input id
      // (a dedup that dropped or duplicated output rows breaks it; the
      // old nKept + (nTotal - nKept) == nTotal form was algebraically
      // always true). n_total itself is pinned to the base-table count
      // by the oracle, so coverage and uniqueness are both checked.
      Seq((
        nTotal,
        nInjected,
        if (injDropped == nInjected) 1 else 0,
        if (nDistinct == nTotal) 1 else 0,
        if (canonNotKept == 0L) 1 else 0,
        if (keptClose == 0L) 1 else 0
      )).toDF("n_total", "n_injected", "all_copies_dropped", "conservation",
        "canonical_kept", "kept_maximal")
    } finally {
      // result frame is built from driver-side scalars; release eagerly
      res.unpersist()
    }
  }

  /** Count-min sketch frequency estimation — the mergeable one-pass
    * sketch for hot-key counting at stream/corpus scale (q64 covers HLL
    * cardinality and quantile sketches; CMS completes the family). The
    * invariant gated against the oracle is the sketch's one-sided error
    * contract: estimate ≥ exact ALWAYS, and ≤ exact + ε·N with the
    * configured confidence — stated per query term next to the exact
    * count the oracle recomputes. At 2/ε = 2000 counters against this
    * corpus's tiny vocabulary the estimate is collision-free, so the
    * bound flag is deterministically 1. */
  private val q110Cms: Q = (s, dir) => {
    import s.implicits._
    val terms = Seq("join", "vector", "stream")
    val eps = 0.001
    val toks = Tables.documents(s, dir)
      .select(explode(TextOps.tokens(col("text"))).as("t")).cache()
    try {
      val cms = toks.stat.countMinSketch("t", eps = eps, confidence = 0.99, seed = 42)
      val nTotal = cms.totalCount() // corpus token count, tracked by the sketch
      toks.filter(col("t").isin(terms: _*))
        .groupBy("t").agg(count(lit(1)).as("exact_count"))
        .collect()
        .map { r =>
          val (t, exact) = (r.getString(0), r.getLong(1))
          val est = cms.estimateCount(t)
          (t, exact,
            if (est >= exact && est <= exact + (eps * nTotal).toLong + 1L) 1 else 0)
        }.toSeq.sortBy(_._1)
        .toDF("term", "exact_count", "within_bounds")
    } finally { toks.unpersist(); () }
  }

  /** BPE merge training on the oracle surface ([[TextOps.bpeTrain]],
    * Sennrich et al. 2016): train 8 merges over the corpus word-freq
    * table. The FIRST merge is SQL-expressible — it is the argmax
    * weighted adjacent character pair — so the oracle recomputes it
    * exactly (tie-break by pair, identical on both sides because the
    * separator sorts below every token character); the iterative rest is
    * gated by invariants (merge count, all merges distinct — a repeated
    * merge would mean the apply step failed to consume its pair). */
  private val q111BpeTrain: Q = (s, dir) => {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val merges = TextOps.bpeTrain(words, "w", "freq", nMerges = 8)
    // bpeTrain stops early when no pair repeats — surface that as data
    // (empty first pair, the true merge count) instead of crashing; on a
    // corpus too thin for 8 merges the oracle mismatch is then a correct
    // divergence signal rather than a NoSuchElementException
    val (a, b) = merges.headOption.getOrElse(("", ""))
    Seq((a, b, merges.size, if (merges.distinct.size == merges.size) 1 else 0))
      .toDF("first_a", "first_b", "n_merges", "merges_distinct")
  }

  /** Tokenizer END-TO-END: train 8 merges on the corpus (q111's
    * pipeline), then ENCODE the word table with them
    * ([[TextOps.bpeApply]] — the same greedy-leftmost fold the training
    * rounds use) and gate the properties a correct encoder cannot
    * violate: segmentation CONSERVES every word (concat of symbols ==
    * word), the corpus strictly COMPRESSES (each trained merge fired ≥2
    * times in training, so weighted symbol count < weighted char
    * count), and the emitted vocabulary is CLOSED (every multi-char
    * symbol is a trained merge product). The word count restates from
    * the base table; the merge list itself is data-dependent, hence the
    * invariant-flag pattern. */
  private val q119BpeEncode: Q = (s, dir) => {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .cache() // train + encode consumers (runner clears)
    try {
      val merges = TextOps.bpeTrain(words, "w", "freq", nMerges = 8)
      val products = merges.map { case (a, b) => a + b }
      val st = words
        .withColumn("syms", TextOps.bpeApply(col("w"), merges))
        .agg(
          count(lit(1)).as("n_words"),
          sum(when(concat_ws("", col("syms")) =!= col("w"), 1L).otherwise(0L)).as("broken"),
          sum(col("freq") * length(col("w"))).as("tot_chars"),
          sum(col("freq") * size(col("syms"))).as("tot_syms"),
          sum(size(filter(col("syms"), sym => length(sym) > 1 &&
            !array_contains(typedLit(products), sym)))).as("foreign"))
        .head()
      Seq((
        st.getLong(0),
        if (st.getLong(1) == 0L) 1 else 0,
        if (st.getLong(3) < st.getLong(2)) 1 else 0,
        if (st.getLong(4) == 0L) 1 else 0
      )).toDF("n_words", "conserved", "compressed", "vocab_closed")
    } finally words.unpersist()
  }

  /** Tokenizer LIFECYCLE gate — the q121 pattern applied to the BPE
    * tier, closing the last fit-once artifact that died with its
    * session: train merges on the corpus word table, persist the
    * ordered merge artifact ([[TextOps.bpeSave]]), reload it into a
    * fresh list, and gate (a) the loaded sequence is IDENTICAL to the
    * trained one (driver-side — the artifact is merge-count-sized),
    * (b) encoding the word table with the LOADED merges is
    * row-identical to encoding with the in-session ones (multiset
    * exceptAll folded into the same driver action), and (c) decode
    * inverts encode on EVERY word ([[TextOps.bpeDecode]] — zero broken
    * words). At 100 TB the tokenizer is trained once and applied for
    * months by sessions that never saw the fit (ingest gates, packing
    * jobs), so save→load→encode identity is the contract that makes
    * the tokenizer servable, exactly as q121 made the ANN index
    * servable; the reference persists every artifact it fits
    * (reference preprocess.py:52-55, train_model.py:113-114). */
  private val q122BpePersist: Q = (s, dir) => {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .cache() // train + two encode consumers (released below)
    val out = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    try {
      val merges = TextOps.bpeTrain(words, "w", "freq", nMerges = 8)
      TextOps.bpeSave(s, merges, out)
      val loaded = TextOps.bpeLoad(s, out)
      def enc(ms: Seq[(String, String)]) =
        words.select(col("w"), TextOps.bpeApply(col("w"), ms).as("syms"))
      val live = enc(merges).cache()
      try {
        val st = live
          .agg(
            count(lit(1)).as("n_words"),
            sum(when(TextOps.bpeDecode(col("syms")) =!= col("w"), 1L)
              .otherwise(0L)).as("broken"))
          .crossJoin(live.exceptAll(enc(loaded))
            .agg(count(lit(1)).as("enc_diff")))
          .head()
        Seq((
          st.getLong(0),
          if (loaded == merges) 1 else 0,
          if (st.getLong(2) == 0L) 1 else 0,
          if (st.getLong(1) == 0L) 1 else 0
        )).toDF("n_words", "merges_roundtrip", "encode_identity", "decode_conserves")
      } finally live.unpersist()
    } finally {
      graft.Fs.deleteRecursively(java.nio.file.Paths.get(out))
      words.unpersist()
    }
  }

  /** SCALE-PATH encode equivalence on the oracle surface: the column
    * fold ([[TextOps.bpeApply]]) is the oracle-replicable definition,
    * but its expression tree grows with the merge count — a production
    * 32k-merge vocabulary runs the partition-local broadcast tokenizer
    * ([[TextOps.bpeApplyBig]], the [[Multimodal]] mapPartitions shape)
    * instead. This gate trains the q111 merges, encodes the word table
    * through BOTH paths keyed on the word itself, and pins (a) the
    * paths agree word-for-word (the scale path may never change a
    * single segmentation), (b) the scale path conserves every word
    * ([[TextOps.bpeDecode]]), (c) full-table coverage. One fused
    * aggregate action over the joined frames (the q104 discipline). */
  private val q124BpeScaleEncode: Q = (s, dir) => {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .cache() // train + two encode consumers (runner clears)
    try {
      val merges = TextOps.bpeTrain(words, "w", "freq", nMerges = 8)
      val viaCol = words.select(col("w"), TextOps.bpeApply(col("w"), merges).as("syms_col"))
      val viaBig = TextOps.bpeApplyBig(words, "w", "w", merges)
        .withColumnRenamed("syms", "syms_big")
      val st = viaCol.join(viaBig, "w")
        .agg(
          count(lit(1)).as("n_words"),
          sum(when(col("syms_col") =!= col("syms_big"), 1L).otherwise(0L)).as("diverged"),
          sum(when(TextOps.bpeDecode(col("syms_big")) =!= col("w"), 1L)
            .otherwise(0L)).as("broken"))
        .head()
      Seq((
        st.getLong(0),
        if (st.getLong(1) == 0L) 1 else 0,
        if (st.getLong(2) == 0L) 1 else 0
      )).toDF("n_words", "paths_agree", "scale_conserves")
    } finally words.unpersist()
  }

  /** Token-rarity scoring — the unigram-LM quality signal (rare-token
    * density flags gibberish and OCR noise; all-common-token docs are
    * boilerplate-ish), kept RATIONAL (mean/min of integer document
    * frequencies, no ln) so the oracle hash-compare is IEEE-exact — the
    * q96 BM25 trick. Two scans of the token stream: one builds the
    * per-token df table (distinct (doc,token) → count — map-side partial
    * agg, key space = vocabulary, bounded and tiny relative to the
    * corpus), one joins each token instance back to its df (broadcast:
    * the df table is vocabulary-sized) and folds per-doc mean/min. At
    * 100 TB the df table is the classic shared-dictionary broadcast;
    * nothing here grows with corpus size except the two scans. */
  private val q102TokenRarity: Q = (s, dir) => {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
    val df = toks.select("doc_id", "t").distinct()
      .groupBy("t").agg(count(lit(1)).as("df"))
    toks.join(broadcast(df), "t")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        fpRound4(sum(col("df")).cast("double") / count(lit(1))).as("mean_df"),
        min(col("df")).as("min_df"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "q65_ivf_invariants"  -> q65IvfInvariants,
    "q71_dedup_components" -> q71DedupComponents,
    "q93_image_decode"    -> q93ImageDecode,
    "q94_audio_decode"    -> q94AudioDecode,
    "q112_video_decode"   -> q112VideoDecode,
    "q114_product_quant"  -> q114ProductQuant,
    "q121_index_persist"  -> q121IndexPersist,
    "q125_residual_adc"   -> q125ResidualAdc,
    "q126_opq"            -> q126Opq,
    "q95_quantize_embeddings" -> q95QuantizeEmbeddings,
    "q96_bm25"            -> q96Bm25,
    "q97_pii_redact"      -> q97PiiRedact,
    "q101_url_canonical"  -> q101UrlCanonical,
    "q102_token_rarity"   -> q102TokenRarity,
    "q104_semdedup"       -> q104SemDedup,
    "q110_cms"            -> q110Cms,
    "q111_bpe_train"      -> q111BpeTrain,
    "q30_dedup_exact"     -> q30DedupExact,
    "q31_text_stats"      -> q31TextStats,
    "q32_lang_id"         -> q32LangId,
    "q33_quality_score"   -> q33QualityScore,
    "q127_gopher_rules"   -> q127GopherRules,
    "q128_nfc_normalize"  -> q128NfcNormalize,
    "q131_repetition_rules" -> q131RepetitionRules,
    "q34_fingerprint"     -> q34Fingerprint,
    "q35_minhash_sigs"    -> q35MinhashSigs,
    "q36_simhash"         -> q36Simhash,
    "q37_neardup_minhash" -> q37NeardupMinhash,
    "q207_incremental_dedup" -> q207IncrementalDedup,
    "q208_greedy_dedup_canon" -> q208GreedyDedupCanon,
    "q38_cosine_topk"     -> q38CosineTopk,
    "q270_mrl_recall"     -> q270MrlRecall,
    "q271_knn_label_noise" -> q271KnnLabelNoise,
    "q39_ann_lsh"         -> q39AnnLsh,
    "q40_multimodal_stub" -> q40MultimodalStub,
    "q57_embed_neardup"   -> q57EmbedNeardup,
    "q58_bpe_tokens"      -> q58BpeTokens,
    "q75_contamination"   -> q75Contamination,
    "q115_window_decontam" -> q115WindowDecontam,
    "q129_substring_dup"  -> q129SubstrDup,
    "q130_token_budget"   -> q130TokenBudget,
    "q132_dsir_select"    -> q132DsirSelect,
    "q133_ngram_lm_ppl"   -> q133NgramLmPpl,
    "q134_pii_scrub"      -> q134PiiScrub,
    "q135_quality_clf"    -> q135QualityClassifier,
    "q136_ann_recall"     -> q136AnnRecall,
    "q197_stack_recall"   -> q197StackRecall,
    "q137_curation_pipeline" -> q137CurationPipeline,
    "q138_pagerank"       -> q138PageRank,
    "q161_triangles"      -> q161Triangles,
    "q162_mutual_info"    -> q162MutualInfo,
    "q163_pmi_collocations" -> q163PmiCollocations,
    "q169_bfs_reach"      -> q169BfsReach,
    "q252_harmonic"       -> q252Harmonic,
    "q217_weighted_sssp"  -> q217WeightedSssp,
    "q174_inverted_index" -> q174InvertedIndex,
    "q180_assortativity"  -> q180Assortativity,
    "q181_readability"    -> q181Readability,
    "q183_heavy_hitters"  -> q183HeavyHitters,
    "q194_kcore"          -> q194Kcore,
    "q220_label_prop"     -> q220LabelProp,
    "q267_modularity"     -> q267Modularity,
    "q227_good_turing"    -> q227GoodTuring,
    "q228_zipf_fit"       -> q228ZipfFit,
    "q251_kneser_ney"     -> q251KneserNey,
    "q258_kn_ppl_gate"    -> q258KnPplGate,
    "q260_betweenness"    -> q260Betweenness,
    "q261_curation_kn"    -> q261CurationKn,
    "q262_frechet_slices" -> q262FrechetSlices,
    "q263_rbo_legs"       -> q263RboLegs,
    "q256_source_overlap" -> q256SourceOverlap,
    "q257_rank_agreement" -> q257RankAgreement,
    "q264_js_divergence"  -> q264JsDivergence,
    "q231_coreset_greedy" -> q231CoresetGreedy,
    "q233_source_kl"      -> q233SourceKl,
    "q234_span_removal"   -> q234SpanRemoval,
    "q235_curation_spans" -> q235CurationSpans,
    "q248_span_self_dedup" -> q248SpanSelfDedup,
    "q236_heaps_fit"      -> q236HeapsFit,
    "q238_entropy_rate"   -> q238EntropyRate,
    "q239_hits"           -> q239Hits,
    "q244_katz"           -> q244Katz,
    "q245_personalized_pr" -> q245PersonalizedPr,
    "q243_spearman"       -> q243Spearman,
    "q250_kendall_tau"    -> q250KendallTau,
    "q246_cohen_kappa"    -> q246CohenKappa,
    "q247_ndcg_retrieval" -> q247NdcgRetrieval,
    "q196_curation_canon" -> q196CurationCanon,
    "q139_shard_assign"   -> q139ShardAssign,
    "q140_psi_drift"      -> q140PsiDrift,
    "q141_leakage_split"  -> q141LeakageSplit,
    // q142 serves the exact two-phase twin (round-11 directive #3);
    // the percentile-sort form demoted to q142RobustStatsWindowRef
    "q142_robust_stats"   -> q198RobustTwophase,
    "q198_robust_twophase" -> q198RobustTwophase,
    "q143_window_ranks"   -> q143WindowRanks,
    "q144_source_overlap" -> q144SourceOverlap,
    "q145_version_diff"   -> q145VersionDiff,
    "q146_mergeable_profile" -> q146MergeableProfile,
    "q147_vocab_coverage" -> q147VocabCoverage,
    "q148_cluster_sizes"  -> q148ClusterSizes,
    "q149_gate_funnel"    -> q149GateFunnel,
    "q150_embed_prune"    -> q150EmbedPrune,
    "q151_pretokenize"    -> q151Pretokenize,
    "q152_hybrid_rrf"     -> q152HybridRrf,
    "q153_compress_ratio" -> q153CompressRatio,
    "q116_temp_mixture"   -> q116TemperatureMixture,
    "q117_chunk_overlap"  -> q117ChunkOverlap,
    "q120_rag_pipeline"   -> q120RagPipeline,
    "q118_simjoin_exact"  -> q118SimJoinExact,
    "q119_bpe_encode"     -> q119BpeEncode,
    "q122_bpe_persist"    -> q122BpePersist,
    "q124_bpe_scale"      -> q124BpeScaleEncode,
    "q76_repetition"      -> q76Repetition,
    "q77_pack_sequences"  -> q77PackSequences,
    "q78_emb_centroids"   -> q78EmbCentroids,
    "q79_length_prune"    -> q79LengthPrune,
    "q80_source_mixture"  -> q80SourceMixture,
    "q85_corpus_pipeline" -> q85CorpusPipeline,
    "q86_hash_sample"     -> q86HashSample,
    "q87_doc_emb_join"    -> q87DocEmbJoin,
    "q90_simhash_pairs"   -> q90SimhashPairs,
  )

  // -------------------------------------------------- oracle SQL (DuckDB)
  private def duckSigExprs: Seq[String] =
    minhashAB.map { case (a, b) => s"list_min(list_transform(hh, h -> ($a * h + $b) % $P))" }

  private val duckSigsCTE: String =
    s"""toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
       |sh AS (SELECT doc_id, list_distinct($duckBigrams) AS sset FROM toks WHERE len(tk) >= 2),
       |hs AS (SELECT doc_id, sset, list_distinct(list_transform(sset, t -> ${duckTokHash("t")})) AS hh FROM sh),
       |sigs AS (SELECT doc_id, hh, [${duckSigExprs.mkString(",\n  ")}] AS sig FROM hs)""".stripMargin

  /** Shared CTE chain producing the LSH-verified `scored` pairs (used by
    * q37 detection and q71 resolution). */
  private lazy val duckNeardupCTEs: String =
    s"""$duckSigsCTE,
       |bands AS (
       |  SELECT doc_id, sig, i.j AS band_id, sig[2*i.j + 1] AS k0, sig[2*i.j + 2] AS k1
       |  FROM sigs, (SELECT unnest(range(0, $NumBands)) AS j) i),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band_id = y.band_id AND x.k0 = y.k0 AND x.k1 = y.k1 AND x.doc_id < y.doc_id),
       |scored AS (
       |  SELECT c.doc_a, c.doc_b,
       |    ${fpRound4Sql(s"list_sum(list_transform(range(1, ${NumSig + 1}), " +
                s"i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END))::DOUBLE / $NumSig")} AS est_jaccard,
       |    ${fpRound4Sql("len(list_intersect(a.hh, b.hh))::DOUBLE / " +
                "(len(a.hh) + len(b.hh) - len(list_intersect(a.hh, b.hh)))")} AS jaccard
       |  FROM cand c
       |  JOIN sigs a ON a.doc_id = c.doc_a
       |  JOIN sigs b ON b.doc_id = c.doc_b)""".stripMargin

  /** q138: the full fixed-point PageRank recomputed relationally — the
    * synchronous iterations unroll into chained CTEs (c{t}/r{t}); every
    * step is integer arithmetic (`//` here, `div` in Spark — equal on
    * non-negatives), so the compare is an exact hash match on longs. */
  private lazy val duckPageRankSql: String = {
    val hash = duckTokHash("CAST(d.idx AS VARCHAR) || '#' || CAST(j.j AS VARCHAR)")
    val per  = s"(SELECT $PrScale // n FROM nn)"
    val base = s"(SELECT (15 * ($PrScale // n)) // 100 FROM nn)"
    val iters = (1 to PrIters).map { t =>
      s"""c$t AS (SELECT e.dst, SUM(r.pr // g.d) AS contrib
         |  FROM r${t - 1} r JOIN edges e ON e.src = r.idx JOIN deg g ON g.src = r.idx
         |  GROUP BY e.dst),
         |r$t AS (SELECT d.idx, $base + (85 * COALESCE(c.contrib, 0)) // 100 AS pr
         |  FROM docs d LEFT JOIN c$t c ON c.dst = d.idx)""".stripMargin
    }.mkString(",\n")
    s"""WITH docs AS (SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
       |  FROM documents),
       |nn AS (SELECT count(*) AS n FROM docs),
       |links AS (SELECT DISTINCT d.idx AS src, ($hash) % nn.n AS dst
       |  FROM docs d, nn, (SELECT unnest(range(1, ${PrOutLinks + 1})) AS j) j),
       |edges AS (SELECT src, dst FROM links WHERE src <> dst),
       |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
       |r0 AS (SELECT idx, $per AS pr FROM docs),
       |$iters
       |SELECT doc_id, CAST(pr AS BIGINT) AS pr
       |FROM r$PrIters JOIN docs USING (idx) ORDER BY doc_id""".stripMargin
  }

  /** q161: the naive id-orientation spec (a<b) — per-node triangle
    * counts are orientation-invariant, so matching this proves the
    * Spark side's degree-ordered enumeration. */
  private lazy val duckTrianglesSql: String = {
    val hash = duckTokHash("CAST(d.idx AS VARCHAR) || '#' || CAST(j.j AS VARCHAR)")
    s"""WITH docs AS (SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
       |  FROM documents),
       |nn AS (SELECT count(*) AS n FROM docs),
       |links AS (SELECT DISTINCT d.idx AS src, ($hash) % nn.n AS dst
       |  FROM docs d, nn, (SELECT unnest(range(1, ${PrOutLinks + 1})) AS j) j),
       |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM links WHERE src <> dst),
       |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
       |  FROM (SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY v),
       |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |  FROM und e1 JOIN und e2 ON e2.a = e1.b
       |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
       |pn AS (SELECT v, CAST(count(*) AS BIGINT) AS t
       |  FROM (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
       |        UNION ALL SELECT z FROM tri) GROUP BY v)
       |SELECT doc_id, COALESCE(g.d, 0) AS degree, COALESCE(pn.t, 0) AS n_tri,
       |  CASE WHEN COALESCE(g.d, 0) >= 2
       |    THEN ${fpRound4Sql("COALESCE(pn.t, 0)::DOUBLE * 2.0 / (g.d * (g.d - 1))")}
       |    ELSE 0.0 END AS clustering
       |FROM docs LEFT JOIN deg g ON g.v = docs.idx LEFT JOIN pn ON pn.v = docs.idx
       |ORDER BY doc_id""".stripMargin
  }

  /** q169: the declarative fixpoint spec — the recursive CTE's UNION
    * dedups (v, hop) states, min(hop) per node is the BFS distance. */
  private lazy val duckBfsSql: String = {
    val hash = duckTokHash("CAST(d.idx AS VARCHAR) || '#' || CAST(j.j AS VARCHAR)")
    s"""WITH RECURSIVE docs AS (SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
       |  FROM documents),
       |nn AS (SELECT count(*) AS n FROM docs),
       |links AS (SELECT DISTINCT d.idx AS src, ($hash) % nn.n AS dst
       |  FROM docs d, nn, (SELECT unnest(range(1, ${PrOutLinks + 1})) AS j) j),
       |edges AS (SELECT src, dst FROM links WHERE src <> dst),
       |bfs(v, hop) AS (
       |  SELECT idx, CAST(0 AS BIGINT) FROM docs WHERE idx % 97 = 0
       |  UNION
       |  SELECT e.dst, b.hop + 1 FROM bfs b JOIN edges e ON e.src = b.v
       |  WHERE b.hop < $BfsHops),
       |md AS (SELECT v, CAST(min(hop) AS BIGINT) AS hop FROM bfs GROUP BY v)
       |SELECT hop, CAST(count(*) AS BIGINT) AS n_nodes,
       |  CAST(sum(v) AS BIGINT) AS idx_checksum
       |FROM md GROUP BY hop ORDER BY hop""".stripMargin
  }

  /** q252: the same per-seed BFS as a recursive CTE on (s, v) pairs,
    * the same min-hop collapse, and the same exact 60//d integer mass. */
  private lazy val duckHarmonicSql: String = {
    val hash = duckTokHash("CAST(d.idx AS VARCHAR) || '#' || CAST(j.j AS VARCHAR)")
    s"""WITH RECURSIVE docs AS (SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
       |  FROM documents),
       |nn AS (SELECT count(*) AS n FROM docs),
       |links AS (SELECT DISTINCT d.idx AS src, ($hash) % nn.n AS dst
       |  FROM docs d, nn, (SELECT unnest(range(1, ${PrOutLinks + 1})) AS j) j),
       |edges AS (SELECT src, dst FROM links WHERE src <> dst),
       |bfs(s, v, hop) AS (
       |  SELECT idx, idx, CAST(0 AS BIGINT) FROM docs WHERE idx % 97 = 0
       |  UNION
       |  SELECT b.s, e.dst, b.hop + 1 FROM bfs b JOIN edges e ON e.src = b.v
       |  WHERE b.hop < $HcHops),
       |md AS (SELECT s, v, CAST(min(hop) AS BIGINT) AS d FROM bfs GROUP BY s, v),
       |hc AS (SELECT v, CAST(sum(60 // d) AS BIGINT) AS h60,
       |    CAST(count(*) AS BIGINT) AS n_seeds_reaching
       |  FROM md WHERE d > 0 GROUP BY v)
       |SELECT doc_id, h60, n_seeds_reaching
       |FROM hc JOIN docs ON docs.idx = hc.v
       |ORDER BY h60 DESC, doc_id LIMIT 20""".stripMargin
  }

  /** q260: the DECLARATIVE restatement of the pivot-betweenness
    * estimator — σ as WALK counts (per-hop AGGREGATED: w_h holds
    * (s, v, Σ walks of length exactly h), each hop one join + GROUP
    * BY off the previous — so walks are COUNTED, never enumerated as
    * rows; walks of MINIMAL length per (s,v) are exactly the shortest
    * paths, so σ = their count at min hop), forward and on reversed
    * edges, then Brandes' pair identity as one join. The hash match
    * proves the engine's layered frontier algorithm (map-side σ sums
    * + pair anti-joins) computes this fixpoint spec. Each hop table is
    * ≤|S|·N rows REGARDLESS of degree skew — the r14 enumerating
    * recursive CTE's volume was Σ_h deg^h per seed, which a
    * high-in-degree hub blows up on the reversed sweep (r14 ADVICE);
    * the aggregated unroll bounds it structurally. Seeds mirror the
    * engine's ABSOLUTE-size pivot set: ORDER BY hash('bc#'||idx), idx
    * LIMIT [[BcSeedCap]]. */
  private lazy val duckBetweennessSql: String = {
    val hash = duckTokHash("CAST(d.idx AS VARCHAR) || '#' || CAST(j.j AS VARCHAR)")
    val seedHash = duckTokHash("'bc#' || CAST(idx AS VARCHAR)")
    def walkCTEs(pfx: String, edgeRel: String): String = {
      val hops = (1 to BcHops).map { h =>
        s"""${pfx}w$h AS MATERIALIZED (SELECT w.s, e.dst AS v,
           |  CAST(sum(w.c) AS BIGINT) AS c
           |  FROM ${pfx}w${h - 1} w JOIN $edgeRel e ON e.src = w.v
           |  GROUP BY 1, 2)""".stripMargin
      }.mkString(",\n")
      val union = (0 to BcHops).map(h =>
        s"SELECT s, v, CAST($h AS BIGINT) AS hop, c FROM ${pfx}w$h")
        .mkString("\n  UNION ALL ")
      s"""${pfx}w0 AS (SELECT seed AS s, seed AS v, CAST(1 AS BIGINT) AS c FROM seeds),
         |$hops,
         |${pfx}wc AS ($union),
         |${pfx}md AS (SELECT s, v, CAST(min(hop) AS BIGINT) AS d
         |  FROM ${pfx}wc GROUP BY 1, 2),
         |$pfx AS MATERIALIZED (SELECT w.s, w.v, m.d, w.c AS sig
         |  FROM ${pfx}wc w JOIN ${pfx}md m
         |    ON m.s = w.s AND m.v = w.v AND w.hop = m.d)""".stripMargin
    }
    s"""WITH docs AS MATERIALIZED (SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
       |  FROM documents),
       |nn AS (SELECT count(*) AS n FROM docs),
       |links AS (SELECT DISTINCT d.idx AS src, ($hash) % nn.n AS dst
       |  FROM docs d, nn, (SELECT unnest(range(1, ${PrOutLinks + 1})) AS j) j),
       |edges AS MATERIALIZED (SELECT src, dst FROM links WHERE src <> dst),
       |redges AS MATERIALIZED (SELECT dst AS src, src AS dst FROM edges),
       |seeds AS MATERIALIZED (SELECT idx AS seed FROM docs
       |  ORDER BY ($seedHash), idx LIMIT $BcSeedCap),
       |${walkCTEs("fwd", "edges")},
       |${walkCTEs("rev", "redges")},
       |pairs AS MATERIALIZED (SELECT f.s, f.v AS t, f.d AS dst_d, f.sig AS sig_st
       |  FROM fwd f JOIN seeds sd ON sd.seed = f.v WHERE f.v <> f.s),
       |dep AS (SELECT f.v, (f.sig * r.sig * 1000000) // p.sig_st AS term
       |  FROM fwd f
       |  JOIN rev r ON r.v = f.v
       |  JOIN pairs p ON p.s = f.s AND p.t = r.s
       |  WHERE f.d + r.d = p.dst_d AND f.v <> f.s AND f.v <> r.s)
       |SELECT d.doc_id, CAST(sum(term) AS BIGINT) AS bc_micro,
       |  CAST(count(*) AS BIGINT) AS n_pair_terms
       |FROM dep JOIN docs d ON d.idx = dep.v
       |GROUP BY d.doc_id ORDER BY bc_micro DESC, doc_id LIMIT 20""".stripMargin
  }

  /** q217: the same k-round Bellman–Ford invariant unrolled as
    * MATERIALIZED CTEs d0..d{rounds} — each d_t is referenced twice in
    * d_{t+1} (carry + relax), so without MATERIALIZED DuckDB would
    * re-inline the whole prefix per reference (the q194 lesson). */
  private lazy val duckSsspSql: String = {
    val hash = duckTokHash("CAST(d.idx AS VARCHAR) || '#' || CAST(j.j AS VARCHAR)")
    val wHash = duckTokHash("CAST(src AS VARCHAR) || '#' || CAST(dst AS VARCHAR) || '#w'")
    val rounds = (1 to SsspRounds).map { t =>
      s"""d$t AS MATERIALIZED (SELECT v, CAST(min(d) AS BIGINT) AS d FROM (
         |  SELECT v, d FROM d${t - 1}
         |  UNION ALL
         |  SELECT e.dst, p.d + e.w FROM d${t - 1} p JOIN edges e ON e.src = p.v)
         |  GROUP BY v)""".stripMargin
    }.mkString(",\n")
    s"""WITH docs AS (SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
       |  FROM documents),
       |nn AS (SELECT count(*) AS n FROM docs),
       |links AS (SELECT DISTINCT d.idx AS src, ($hash) % nn.n AS dst
       |  FROM docs d, nn, (SELECT unnest(range(1, ${PrOutLinks + 1})) AS j) j),
       |edges AS MATERIALIZED (SELECT src, dst, ($wHash) % 9 + 1 AS w
       |  FROM links WHERE src <> dst),
       |d0 AS MATERIALIZED (SELECT idx AS v, CAST(0 AS BIGINT) AS d
       |  FROM docs WHERE idx % 97 = 0),
       |$rounds
       |SELECT d AS dist, CAST(count(*) AS BIGINT) AS n_nodes,
       |  CAST(sum(v) AS BIGINT) AS idx_checksum
       |FROM d$SsspRounds GROUP BY d ORDER BY d""".stripMargin
  }

  /** q180: same symmetrized closed form from the same edge/degree CTEs. */
  private lazy val duckAssortativitySql: String = {
    val hash = duckTokHash("CAST(d.idx AS VARCHAR) || '#' || CAST(j.j AS VARCHAR)")
    s"""WITH docs AS (SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
       |  FROM documents),
       |nn AS (SELECT count(*) AS n FROM docs),
       |links AS (SELECT DISTINCT d.idx AS src, ($hash) % nn.n AS dst
       |  FROM docs d, nn, (SELECT unnest(range(1, ${PrOutLinks + 1})) AS j) j),
       |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM links WHERE src <> dst),
       |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
       |  FROM (SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY v),
       |g AS (SELECT CAST(count(*) * 2 AS BIGINT) AS m2,
       |    CAST(sum(da.d + db.d) AS BIGINT) AS sx,
       |    CAST(sum(da.d * da.d + db.d * db.d) AS BIGINT) AS sxx,
       |    CAST(sum(da.d * db.d) * 2 AS BIGINT) AS sxy
       |  FROM und JOIN deg da ON da.v = und.a JOIN deg db ON db.v = und.b)
       |SELECT m2, sx, sxx, sxy,
       |  CAST(floor((m2::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sx::DOUBLE) /
       |    nullif(m2::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE, 0.0)
       |    * 1000000.0 + 0.5) AS BIGINT) AS r_micro
       |FROM g""".stripMargin
  }

  /** q194: the same fixed peeling rounds unrolled into CTE chains (the
    * q138 discipline — no recursion, no convergence read). Every
    * multi-referenced CTE is forced MATERIALIZED: DuckDB's default
    * INLINES CTE references, so the unrolled round chain would
    * re-expand combinatorially (each a_r reference re-derives the whole
    * peeling prefix — the oracle-side twin of the q169 lineage blowup,
    * observed as a hung oracle run). */
  private lazy val duckKcoreSql: String = {
    val hash = duckTokHash("CAST(d.idx AS VARCHAR) || '#' || CAST(j.j AS VARCHAR)")
    val rounds = (1 to KcoreRounds).map { r =>
      s"""e$r AS MATERIALIZED (SELECT e.a, e.b FROM und e
         |  JOIN a${r - 1} x ON x.v = e.a JOIN a${r - 1} y ON y.v = e.b),
         |d$r AS (SELECT v, count(*) AS d FROM
         |  (SELECT a AS v FROM e$r UNION ALL SELECT b FROM e$r) GROUP BY v),
         |a$r AS MATERIALIZED (SELECT v FROM d$r WHERE d >= $KcoreK),
         |s$r AS MATERIALIZED (SELECT e.a, e.b FROM und e
         |  JOIN a$r x ON x.v = e.a JOIN a$r y ON y.v = e.b)""".stripMargin
    }.mkString(",\n")
    val trace = (1 to KcoreRounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round,
         |  CAST((SELECT count(*) FROM a$r) AS BIGINT) AS n_alive,
         |  CAST((SELECT count(*) FROM s$r) AS BIGINT) AS n_edges,
         |  CAST((SELECT coalesce(sum(v), 0) FROM a$r) AS BIGINT) AS checksum""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH docs AS (SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
       |  FROM documents),
       |nn AS (SELECT count(*) AS n FROM docs),
       |links AS (SELECT DISTINCT d.idx AS src, ($hash) % nn.n AS dst
       |  FROM docs d, nn, (SELECT unnest(range(1, ${PrOutLinks + 1})) AS j) j),
       |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM links WHERE src <> dst),
       |a0 AS MATERIALIZED (SELECT DISTINCT v FROM
       |  (SELECT a AS v FROM und UNION ALL SELECT b FROM und)),
       |$rounds
       |$trace
       |ORDER BY round""".stripMargin
  }

  /** q220: the same synchronous LPA rounds unrolled as MATERIALIZED
    * CTEs; the mode-with-min-tie-break is a max-count window + min-label
    * group — the declarative spec the Spark struct-argmax must equal. */
  /** Shared LPA CTE prefix (docs/links/und/nbrs + the [[LpaRounds]]
    * synchronous min-tiebreak rounds `l1..lR`) — q220's oracle reads
    * the per-round trace off it, q267's modularity scores the final
    * `l[[LpaRounds]]` partition. One text, two oracles: the partition
    * CANNOT silently diverge between them. */
  private lazy val duckLpaCTEs: String = {
    val hash = duckTokHash("CAST(d.idx AS VARCHAR) || '#' || CAST(j.j AS VARCHAR)")
    val rounds = (1 to LpaRounds).map { r =>
      s"""c$r AS (SELECT n.v, l.lbl, count(*) AS cnt
         |  FROM nbrs n JOIN l${r - 1} l ON l.v = n.u GROUP BY n.v, l.lbl),
         |m$r AS (SELECT v, min(lbl) AS new_lbl FROM (
         |    SELECT v, lbl, cnt, max(cnt) OVER (PARTITION BY v) AS mx FROM c$r)
         |  WHERE cnt = mx GROUP BY v),
         |l$r AS MATERIALIZED (SELECT p.v, p.lbl AS old_lbl,
         |    coalesce(m.new_lbl, p.lbl) AS lbl
         |  FROM l${r - 1} p LEFT JOIN m$r m ON m.v = p.v)""".stripMargin
    }.mkString(",\n")
    s"""docs AS (SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
       |  FROM documents),
       |nn AS (SELECT count(*) AS n FROM docs),
       |links AS (SELECT DISTINCT d.idx AS src, ($hash) % nn.n AS dst
       |  FROM docs d, nn, (SELECT unnest(range(1, ${PrOutLinks + 1})) AS j) j),
       |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM links WHERE src <> dst),
       |nbrs AS MATERIALIZED (SELECT a AS v, b AS u FROM und
       |  UNION ALL SELECT b, a FROM und),
       |l0 AS (SELECT idx AS v, idx AS old_lbl, idx AS lbl FROM docs),
       |$rounds""".stripMargin
  }

  private lazy val duckLpaSql: String = {
    val trace = (1 to LpaRounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round,
         |  CAST((SELECT count(*) FROM l$r WHERE lbl <> old_lbl) AS BIGINT) AS n_changed,
         |  CAST((SELECT count(DISTINCT lbl) FROM l$r) AS BIGINT) AS n_communities,
         |  CAST((SELECT sum(lbl) FROM l$r) AS BIGINT) AS lbl_checksum""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH $duckLpaCTEs
       |$trace
       |ORDER BY round""".stripMargin
  }

  /** q267's oracle: the same shared LPA partition ([[duckLpaCTEs]]),
    * the same exact e_c/d_c/m longs, each community's term the
    * identical double chain micro-floored, the total an exact sum of
    * the floored terms. */
  private lazy val duckModularitySql: String =
    s"""WITH $duckLpaCTEs,
       |lab AS MATERIALIZED (SELECT v, lbl FROM l$LpaRounds),
       |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg FROM nbrs GROUP BY v),
       |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
       |ec AS (SELECT la.lbl, CAST(count(*) AS BIGINT) AS e_c
       |  FROM und u JOIN lab la ON la.v = u.a JOIN lab lb ON lb.v = u.b
       |  WHERE la.lbl = lb.lbl GROUP BY la.lbl),
       |dc AS (SELECT l.lbl, CAST(count(*) AS BIGINT) AS n_nodes,
       |    CAST(coalesce(sum(d.dg), 0) AS BIGINT) AS d_c
       |  FROM lab l LEFT JOIN deg d ON d.v = l.v GROUP BY l.lbl),
       |terms AS MATERIALIZED (SELECT dc.lbl, dc.n_nodes,
       |    CAST(coalesce(ec.e_c, 0) AS BIGINT) AS e_c, dc.d_c,
       |    CAST(floor((CAST(coalesce(ec.e_c, 0) AS DOUBLE) / CAST(mm.m AS DOUBLE)
       |      - (CAST(dc.d_c AS DOUBLE) / (2.0 * CAST(mm.m AS DOUBLE)))
       |        * (CAST(dc.d_c AS DOUBLE) / (2.0 * CAST(mm.m AS DOUBLE))))
       |      * 1000000.0 + 0.5) AS BIGINT) AS q_micro
       |  FROM dc LEFT JOIN ec ON ec.lbl = dc.lbl CROSS JOIN mm),
       |tot AS (SELECT CAST(sum(q_micro) AS BIGINT) AS q_total_micro,
       |    CAST(count(*) AS BIGINT) AS n_communities FROM terms)
       |SELECT lbl, n_nodes, e_c, d_c, q_micro, n_communities, q_total_micro
       |FROM terms CROSS JOIN tot ORDER BY lbl""".stripMargin

  /** q231: the same stochastic-greedy rounds unrolled as MATERIALIZED
    * CTEs — same absolute-size hash-order pools (ORDER BY salted hash,
    * id LIMIT [[CoresetPoolCap]]), same 4dp integer similarity grid,
    * same (gain desc, id asc) argmax, same coverage fold. */
  private lazy val duckCoresetSql: String = {
    def s4(e: String): String = s"CAST(floor(($e) * 10000.0 + 0.5) AS BIGINT)"
    val rounds = (1 to CoresetRounds).map { r =>
      val hash = duckTokHash(s"'$r#' || CAST(vec_id AS VARCHAR)")
      val notSel =
        if (r == 1) "TRUE"
        else "vec_id NOT IN (" +
          (1 until r).map(i => s"SELECT selected_id FROM w$i").mkString(" UNION ALL ") + ")"
      s"""p$r AS MATERIALIZED (SELECT vec_id AS c_id, emb AS c_emb FROM e
         |  WHERE $notSel
         |  ORDER BY ($hash), vec_id LIMIT $CoresetPoolCap),
         |g$r AS (SELECT p.c_id,
         |    CAST(sum(greatest(${s4("list_cosine_similarity(ev.emb, p.c_emb)")} - c.cur, 0))
         |      AS BIGINT) AS gain
         |  FROM e ev CROSS JOIN p$r p JOIN cur${r - 1} c ON c.v = ev.vec_id
         |  GROUP BY p.c_id),
         |w$r AS MATERIALIZED (SELECT c_id AS selected_id, gain FROM g$r
         |  ORDER BY gain DESC, c_id LIMIT 1),
         |cur$r AS MATERIALIZED (SELECT c.v,
         |    greatest(c.cur, ${s4("list_cosine_similarity(ev.emb, we.emb)")}) AS cur
         |  FROM cur${r - 1} c
         |  JOIN e ev ON ev.vec_id = c.v
         |  JOIN e we ON we.vec_id = (SELECT selected_id FROM w$r))""".stripMargin
    }.mkString(",\n")
    val trace = (1 to CoresetRounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round, w.selected_id, w.gain,
         |  (SELECT CAST(sum(cur) AS BIGINT) FROM cur$r) AS coverage FROM w$r w""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |cur0 AS (SELECT vec_id AS v, CAST(0 AS BIGINT) AS cur FROM e),
       |$rounds
       |$trace
       |ORDER BY round""".stripMargin
  }

  /** q239's oracle: the same integer-mass power iteration unrolled as
    * MATERIALIZED CTEs (the duckPageRankSql pattern — DuckDB inlines
    * unmaterialized multi-referenced CTEs combinatorially). */
  private lazy val duckHitsSql: String = {
    val hash = duckTokHash("CAST(d.idx AS VARCHAR) || '#' || CAST(j.j AS VARCHAR)")
    val iters = (1 to HitsIters).map { t =>
      s"""ar$t AS (SELECT e.dst AS idx, SUM(h.x) AS x
         |  FROM h${t - 1} h JOIN edges e ON e.src = h.idx GROUP BY e.dst),
         |a$t AS MATERIALIZED (SELECT d.idx,
         |    (COALESCE(ar.x, 0) * $HitsScale) // (SELECT sum(x) FROM ar$t) AS x
         |  FROM docs d LEFT JOIN ar$t ar ON ar.idx = d.idx),
         |hr$t AS (SELECT e.src AS idx, SUM(a.x) AS x
         |  FROM a$t a JOIN edges e ON e.dst = a.idx GROUP BY e.src),
         |h$t AS MATERIALIZED (SELECT d.idx,
         |    (COALESCE(hr.x, 0) * $HitsScale) // (SELECT sum(x) FROM hr$t) AS x
         |  FROM docs d LEFT JOIN hr$t hr ON hr.idx = d.idx)""".stripMargin
    }.mkString(",\n")
    val rows = (1 to HitsIters).map { t =>
      s"""SELECT CAST($t AS BIGINT) AS round,
         |  (SELECT CAST(sum(x) AS BIGINT) FROM a$t) AS sum_a,
         |  (SELECT CAST(max(x) AS BIGINT) FROM a$t) AS max_a,
         |  (SELECT CAST(min(idx) AS BIGINT) FROM a$t
         |     WHERE x = (SELECT max(x) FROM a$t)) AS argmax_a,
         |  (SELECT CAST(sum(x) AS BIGINT) FROM h$t) AS sum_h,
         |  (SELECT CAST(max(x) AS BIGINT) FROM h$t) AS max_h,
         |  (SELECT CAST(min(idx) AS BIGINT) FROM h$t
         |     WHERE x = (SELECT max(x) FROM h$t)) AS argmax_h""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH docs AS MATERIALIZED (SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
       |  FROM documents),
       |nn AS (SELECT count(*) AS n FROM docs),
       |links AS (SELECT DISTINCT d.idx AS src, ($hash) % nn.n AS dst
       |  FROM docs d, nn, (SELECT unnest(range(1, ${PrOutLinks + 1})) AS j) j),
       |edges AS MATERIALIZED (SELECT src, dst FROM links WHERE src <> dst),
       |h0 AS (SELECT idx, (SELECT $HitsScale // n FROM nn) AS x FROM docs),
       |$iters
       |SELECT * FROM ($rows) ORDER BY round""".stripMargin
  }

  /** The q152 hybrid-retrieval CTE chain (BM25 leg + vector leg + RRF
    * fusion), ending at `f` (the fused candidate set) with `u` and `tf`
    * live for q247's relevance labels. */
  private lazy val duckRrfCTEs: String =
    s"""e AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |d AS (SELECT doc_id, $duckToks AS tk FROM documents),
       |u AS MATERIALIZED (SELECT d.doc_id, tk, len(tk)::DOUBLE AS dl, emb
       |      FROM d JOIN e ON e.doc_id = d.doc_id),
       |stats AS (SELECT count(*)::DOUBLE AS n_docs, sum(dl) / count(*) AS avgdl FROM u),
       |t AS (SELECT doc_id, dl, unnest(tk) AS tok FROM u),
       |tf AS MATERIALIZED (SELECT doc_id, dl, tok, count(*)::DOUBLE AS tf FROM t
       |  WHERE tok IN ('join', 'vector', 'stream') GROUP BY 1, 2, 3),
       |dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
       |c AS (SELECT doc_id, tok,
       |    ((n_docs - df + 0.5) / (df + 0.5)) *
       |      (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS contrib
       |  FROM tf JOIN dfx USING (tok) CROSS JOIN stats),
       |p AS (SELECT doc_id,
       |    coalesce(sum(CASE WHEN tok = 'join' THEN contrib END), 0.0) AS c0,
       |    coalesce(sum(CASE WHEN tok = 'vector' THEN contrib END), 0.0) AS c1,
       |    coalesce(sum(CASE WHEN tok = 'stream' THEN contrib END), 0.0) AS c2
       |  FROM c GROUP BY doc_id),
       |lex AS (SELECT doc_id, row_number() OVER (
       |    ORDER BY floor((c0 + c1 + c2) * 10000.0 + 0.5) / 10000.0 DESC, doc_id) AS rank_lex
       |  FROM p QUALIFY rank_lex <= $RrfDepth),
       |qv AS (SELECT emb AS q_emb FROM e WHERE doc_id = 0),
       |vec AS (SELECT u.doc_id, row_number() OVER (
       |    ORDER BY round(list_cosine_similarity(emb, q_emb), 4) DESC, u.doc_id) AS rank_vec
       |  FROM u CROSS JOIN qv QUALIFY rank_vec <= $RrfDepth),
       |f AS (SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
       |    COALESCE(rank_lex, 0) AS rank_lex, COALESCE(rank_vec, 0) AS rank_vec,
       |    COALESCE(CAST(floor(1000000.0 / ($RrfK + rank_lex)) AS BIGINT), 0) +
       |      COALESCE(CAST(floor(1000000.0 / ($RrfK + rank_vec)) AS BIGINT), 0) AS rrf
       |  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)""".stripMargin

  /** q245's oracle: the seeded-restart iteration unrolled as
    * MATERIALIZED CTEs (the duckPageRankSql pattern with the base mass
    * redirected to the seed set). */
  private lazy val duckPprSql: String = {
    val hash = duckTokHash("CAST(d.idx AS VARCHAR) || '#' || CAST(j.j AS VARCHAR)")
    val perSeed = s"(SELECT $PrScale // ns FROM sn)"
    val base = s"(SELECT (15 * ($PrScale // ns)) // 100 FROM sn)"
    val iters = (1 to PprIters).map { t =>
      s"""c$t AS (SELECT e.dst, SUM(r.pr // g.d) AS contrib
         |  FROM r${t - 1} r JOIN edges e ON e.src = r.idx JOIN deg g ON g.src = r.idx
         |  GROUP BY e.dst),
         |r$t AS MATERIALIZED (SELECT d.idx,
         |    (CASE WHEN d.idx % 97 = 0 THEN $base ELSE 0 END)
         |      + (85 * COALESCE(c.contrib, 0)) // 100 AS pr
         |  FROM docs d LEFT JOIN c$t c ON c.dst = d.idx)""".stripMargin
    }.mkString(",\n")
    s"""WITH docs AS MATERIALIZED (SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
       |  FROM documents),
       |nn AS (SELECT count(*) AS n FROM docs),
       |sn AS (SELECT count(*) AS ns FROM docs WHERE idx % 97 = 0),
       |links AS (SELECT DISTINCT d.idx AS src, ($hash) % nn.n AS dst
       |  FROM docs d, nn, (SELECT unnest(range(1, ${PrOutLinks + 1})) AS j) j),
       |edges AS MATERIALIZED (SELECT src, dst FROM links WHERE src <> dst),
       |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
       |r0 AS (SELECT idx, CASE WHEN idx % 97 = 0 THEN $perSeed ELSE 0 END AS pr
       |  FROM docs),
       |$iters
       |SELECT doc_id, CAST(pr AS BIGINT) AS ppr
       |FROM r$PprIters JOIN docs USING (idx) ORDER BY doc_id""".stripMargin
  }

  /** q244's oracle: the truncated Katz recurrence unrolled as
    * MATERIALIZED CTEs (the duckPageRankSql pattern). */
  private lazy val duckKatzSql: String = {
    val hash = duckTokHash("CAST(d.idx AS VARCHAR) || '#' || CAST(j.j AS VARCHAR)")
    val iters = (1 to KatzIters).map { t =>
      s"""c$t AS (SELECT e.dst, SUM(r.x) AS c
         |  FROM x${t - 1} r JOIN edges e ON e.src = r.idx GROUP BY e.dst),
         |x$t AS MATERIALIZED (SELECT d.idx,
         |    $KatzUnit + COALESCE(c.c, 0) // $KatzInvAlpha AS x
         |  FROM docs d LEFT JOIN c$t c ON c.dst = d.idx)""".stripMargin
    }.mkString(",\n")
    s"""WITH docs AS MATERIALIZED (SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
       |  FROM documents),
       |nn AS (SELECT count(*) AS n FROM docs),
       |links AS (SELECT DISTINCT d.idx AS src, ($hash) % nn.n AS dst
       |  FROM docs d, nn, (SELECT unnest(range(1, ${PrOutLinks + 1})) AS j) j),
       |edges AS MATERIALIZED (SELECT src, dst FROM links WHERE src <> dst),
       |x0 AS (SELECT idx, CAST($KatzUnit AS BIGINT) AS x FROM docs),
       |$iters
       |SELECT doc_id, CAST(x AS BIGINT) AS katz_micro
       |FROM x$KatzIters JOIN docs USING (idx) ORDER BY doc_id""".stripMargin
  }

  /** The span-dedup CTE chain over a (doc_id, text) relation — the
    * oracle twin of [[spanDedupStats]]: position-grain window hashes,
    * min-doc canonicality, per-doc interval-union via the lead() closed
    * form. Ends with `stoks` (per-doc tokens) and `sagg` (per-doc
    * removal stats) for the caller's final projection. */
  /** The shared stoks/swins base of the span-dedup oracles (the
    * [[windowPositions]] twin). */
  private def duckSpanBaseCTEs(rel: String): String = {
    val W = DecontamWindow
    s"""stoks AS MATERIALIZED (SELECT doc_id, $duckToks AS tk FROM $rel),
       |swins AS MATERIALIZED (SELECT doc_id,
       |    unnest(lst).i AS i, unnest(lst).h AS h
       |  FROM (SELECT doc_id, list_transform(range(1, len(tk) - ${W - 2}),
       |      wi -> struct_pack(i := wi,
       |        h := ${duckTokHash(s"array_to_string(tk[wi:wi+${W - 1}], ' ')")})) AS lst
       |    FROM stoks WHERE len(tk) >= $W))""".stripMargin
  }

  private def duckSpanCTEs(rel: String): String = {
    val W = DecontamWindow
    s"""${duckSpanBaseCTEs(rel)},
       |smind AS (SELECT h, min(doc_id) AS min_doc FROM swins GROUP BY h),
       |scov AS (SELECT w.doc_id,
       |    CASE WHEN lead(w.i) OVER (PARTITION BY w.doc_id ORDER BY w.i) IS NULL THEN $W
       |         ELSE least($W, lead(w.i) OVER (PARTITION BY w.doc_id ORDER BY w.i) - w.i)
       |    END AS cov
       |  FROM swins w JOIN smind m ON w.h = m.h WHERE w.doc_id > m.min_doc),
       |sagg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows,
       |    CAST(sum(cov) AS BIGINT) AS n_removed FROM scov GROUP BY doc_id)""".stripMargin
  }

  /** q248's oracle tail: dup = same hash at an EARLIER position in the
    * SAME doc (first occurrence canonical), same interval-union form. */
  private def duckSelfSpanCTEs(rel: String): String = {
    val W = DecontamWindow
    s"""${duckSpanBaseCTEs(rel)},
       |sfirst AS (SELECT doc_id, h, min(i) AS i0 FROM swins GROUP BY doc_id, h),
       |scov AS (SELECT w.doc_id,
       |    CASE WHEN lead(w.i) OVER (PARTITION BY w.doc_id ORDER BY w.i) IS NULL THEN $W
       |         ELSE least($W, lead(w.i) OVER (PARTITION BY w.doc_id ORDER BY w.i) - w.i)
       |    END AS cov
       |  FROM swins w JOIN sfirst f ON f.doc_id = w.doc_id AND f.h = w.h
       |  WHERE w.i > f.i0),
       |sagg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_self_dup_windows,
       |    CAST(sum(cov) AS BIGINT) AS n_removed FROM scov GROUP BY doc_id)""".stripMargin
  }

  /** The q196 curation chain as a reusable CTE body (gates -> ppl ->
    * dsir -> dedup -> decontam -> `clean` -> `packed`): q196 selects
    * from `packed`; q235 appends the span CTEs over `clean`; q261 is
    * the `knGate = true` form — the q258 KN keep-set CTEs (k-prefixed,
    * reusing `ptoks`) with one more membership test in `gated`. */
  private lazy val duckCurationCTEs: String = curationCTEs(knGate = false)
  private lazy val duckCurationKnCTEs: String = curationCTEs(knGate = true)

  /** The q258 KN perplexity keep-set as k-prefixed CTEs over `ptoks`
    * (the identical model/threshold arithmetic of the standalone q258
    * oracle — quarters algebra, micro-floored surprisal, exact long
    * per-doc sums, ceil(2n/3) rank threshold, ce=−1 sentinels kept). */
  private lazy val duckKnKeepCTEs: String =
    s"""kbgx AS MATERIALIZED (SELECT doc_id, unnest($duckBigrams) AS bg FROM ptoks),
       |kpairs AS (SELECT bg, split_part(bg, ' ', 1) AS w1,
       |    split_part(bg, ' ', 2) AS w2, CAST(count(*) AS BIGINT) AS c
       |  FROM kbgx GROUP BY 1, 2, 3),
       |klft AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c_w1,
       |    CAST(count(*) AS BIGINT) AS n1_fw FROM kpairs GROUP BY 1),
       |krgt AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1_bw FROM kpairs GROUP BY 1),
       |ktot AS (SELECT CAST(count(*) AS BIGINT) AS b FROM kpairs),
       |ksurp AS MATERIALIZED (SELECT p.bg,
       |    CAST(floor(-ln(
       |      CAST(4 * p.c - 3 AS DOUBLE) / (4.0 * CAST(l.c_w1 AS DOUBLE))
       |      + 3.0 * CAST(l.n1_fw AS DOUBLE) * CAST(r.n1_bw AS DOUBLE)
       |        / (4.0 * CAST(l.c_w1 AS DOUBLE) * CAST(ktot.b AS DOUBLE))
       |    ) * 1000000.0 + 0.5) AS BIGINT) AS surp_micro
       |  FROM kpairs p JOIN klft l USING (w1) JOIN krgt r USING (w2) CROSS JOIN ktot),
       |kperdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(surp_micro) AS BIGINT) AS h_micro
       |  FROM kbgx JOIN ksurp USING (bg) GROUP BY doc_id),
       |kscored AS MATERIALIZED (SELECT d.doc_id,
       |    CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |    CAST(CASE WHEN p.n_bigrams IS NULL THEN -1
       |      ELSE p.h_micro // p.n_bigrams END AS BIGINT) AS ce_micro
       |  FROM documents d LEFT JOIN kperdoc p USING (doc_id)),
       |knn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM kscored WHERE n_bigrams > 0),
       |kthr AS (SELECT CAST(max(ce_micro) AS BIGINT) AS t FROM (
       |    SELECT ce_micro, row_number() OVER (ORDER BY ce_micro, doc_id) AS rn
       |    FROM kscored WHERE n_bigrams > 0)
       |  WHERE rn <= (SELECT (2 * n + 2) // 3 FROM knn)),
       |kkeep AS MATERIALIZED (SELECT s.doc_id FROM kscored s CROSS JOIN kthr
       |  WHERE s.ce_micro <= kthr.t)""".stripMargin

  private def curationCTEs(knGate: Boolean): String = {
    def s6(e: String) = s"CAST(floor(ln($e) * 1000000.0 + 0.5) AS BIGINT)"
    val knBlock = if (knGate) s"\n         |$duckKnKeepCTEs," else ""
    val knCond =
      if (knGate) "\n         |    AND d.doc_id IN (SELECT doc_id FROM kkeep)" else ""
    s"""${duckGopherCTEs("documents")},
         |${duckRepetitionCTEs("documents")},
         |ptoks AS MATERIALIZED (SELECT doc_id, lang, $duckToks AS tk FROM documents),
         |pbg AS (SELECT doc_id, lang,
         |    list_transform(range(1, len(tk)),
         |      i -> struct_pack(g := tk[i] || ' ' || tk[i+1], h := tk[i])) AS lst
         |  FROM ptoks WHERE len(tk) >= 2),
         |pocc AS MATERIALIZED (SELECT doc_id, lang, unnest(lst).g AS g, unnest(lst).h AS h FROM pbg),
         |pvoc AS MATERIALIZED (SELECT lang, count(DISTINCT w) AS v,
         |          ${s6("count(DISTINCT w)")} AS den_def
         |        FROM (SELECT lang, unnest(tk) AS w FROM ptoks) GROUP BY lang),
         |pc2 AS (SELECT lang, g, ${s6("count(*) + 1.0")} AS num_s
         |       FROM pocc GROUP BY lang, g),
         |pc1 AS (SELECT o.lang, o.h, ${s6("count(*) + any_value(pvoc.v)")} AS den_s
         |       FROM pocc o JOIN pvoc ON pvoc.lang = o.lang GROUP BY o.lang, o.h),
         |pds AS (SELECT o.doc_id,
         |         sum(COALESCE(pc2.num_s, 0) - COALESCE(pc1.den_s, pvoc.den_def)) AS sw,
         |         count(*) AS m
         |       FROM pocc o
         |       LEFT JOIN pc2 ON pc2.lang = o.lang AND pc2.g = o.g
         |       LEFT JOIN pc1 ON pc1.lang = o.lang AND pc1.h = o.h
         |       JOIN pvoc ON pvoc.lang = o.lang
         |       GROUP BY o.doc_id),
         |pscored AS (SELECT d.doc_id, d.lang,
         |    ${fpRound4Sql("CASE WHEN m > 0 THEN -(CAST(sw AS DOUBLE) / 1000000.0 / m) ELSE 0.0 END")} AS ce
         |  FROM documents d LEFT JOIN pds ON pds.doc_id = d.doc_id),
         |ppl AS (SELECT doc_id,
         |    CASE WHEN rn * 3 <= cnt THEN 'head'
         |         WHEN rn * 3 <= 2 * cnt THEN 'middle' ELSE 'tail' END AS bucket
         |  FROM (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY ce, doc_id) AS rn,
         |          count(*) OVER (PARTITION BY lang) AS cnt FROM pscored)),
         |wbks AS (SELECT doc_id, lang,
         |    list_transform($duckBigrams, g -> (${duckTokHash("g")}) % $DsirBuckets) AS bk
         |  FROM ptoks),
         |wocc AS MATERIALIZED (SELECT doc_id, lang, unnest(bk) AS b FROM wbks),
         |wbc AS (SELECT b, count(*) AS raw_c,
         |         sum(CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END) AS tgt_c
         |       FROM wocc GROUP BY b),
         |wtot AS (SELECT sum(raw_c) AS nr, sum(tgt_c) AS nt FROM wbc),
         |wllr AS (SELECT b, CAST(floor((ln((tgt_c + 1.0) / (nt + $DsirBuckets)) -
         |           ln((raw_c + 1.0) / (nr + $DsirBuckets))) * 1000000.0 + 0.5) AS BIGINT) AS w
         |        FROM wbc, wtot),
         |wds AS (SELECT o.doc_id, sum(l.w) AS sw FROM wocc o JOIN wllr l ON o.b = l.b
         |        GROUP BY o.doc_id),
         |wscored AS (SELECT d.doc_id,
         |    ${fpRound4Sql("CAST(COALESCE(sw, 0) AS DOUBLE) / 1000000.0")} AS log_w
         |  FROM documents d LEFT JOIN wds ON wds.doc_id = d.doc_id),
         |dsel AS (SELECT doc_id FROM (
         |    SELECT *, CAST(row_number() OVER (ORDER BY log_w DESC, doc_id) AS BIGINT) AS rnk,
         |      count(*) OVER () AS cnt FROM wscored)
         |  WHERE rnk <= ceil(cnt * $DsirKeepFrac)),$knBlock
         |gated AS (SELECT d.doc_id, d.source, d.text
         |  FROM documents d
         |  JOIN gop ON gop.doc_id = d.doc_id
         |  JOIN rep_stats rs ON rs.doc_id = d.doc_id
         |  WHERE gop.r_words * gop.r_mean_len * gop.r_symbol * gop.r_alpha
         |      * gop.r_bullet * gop.r_ellipsis = 1 AND $duckRepPassCond
         |    AND d.doc_id IN (SELECT doc_id FROM ppl WHERE bucket <> 'tail')$knCond
         |    AND d.doc_id IN (SELECT doc_id FROM dsel)),
         |dd AS (SELECT doc_id, source, text, row_number() OVER (
         |    PARTITION BY ${duckTokHash("text")} ORDER BY doc_id) AS rn FROM gated),
         |cbg AS (SELECT doc_id, list_distinct($duckBigrams) AS bg
         |        FROM ptoks WHERE len(tk) >= 2),
         |cex AS (SELECT doc_id, unnest(bg) AS b FROM cbg),
         |csh AS MATERIALIZED (SELECT doc_id, ${duckTokHash("b")} AS h FROM cex),
         |crk AS (SELECT h FROM (SELECT h, count(*) AS df FROM csh GROUP BY h)
         |        WHERE df * 20 <= (SELECT count(*) FROM documents) AND df <= $AbsDfCap),
         |crare AS MATERIALIZED (SELECT s.doc_id, s.h FROM csh s JOIN crk ON s.h = crk.h),
         |cns AS (SELECT doc_id, count(*) AS n_sh FROM crare GROUP BY doc_id),
         |flagged AS (SELECT DISTINCT doc_id FROM (
         |  SELECT t.doc_id AS doc_id
         |  FROM crare t JOIN crare e ON t.h = e.h
         |  JOIN cns ON cns.doc_id = t.doc_id
         |  WHERE t.doc_id % 10 <> 0 AND e.doc_id % 10 = 0
         |  GROUP BY t.doc_id, e.doc_id, cns.n_sh
         |  HAVING count(*) >= 3 AND count(*) * 2 >= cns.n_sh)),
         |clean AS (SELECT doc_id, source, text FROM dd
         |  WHERE rn = 1 AND doc_id % 10 <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM flagged)),
         |packed AS (SELECT doc_id, source, CAST(len($duckToks) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(sum(len($duckToks)) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM clean)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q231_coreset_greedy" -> duckCoresetSql,
    // q233: identical smoothing grid, one identical-order double chain
    // per term nano-floored before the exact per-source sum
    "q233_source_kl" ->
      s"""WITH toks AS (SELECT source, t
         |  FROM (SELECT source, unnest($duckToks) AS t FROM documents)),
         |st AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c_s
         |  FROM toks GROUP BY 1, 2),
         |ct AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY t),
         |marg AS (SELECT source, CAST(sum(c_s) AS BIGINT) AS n_s FROM st GROUP BY source),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM ct),
         |grid AS (SELECT m.source, m.n_s, tot.n, tot.v,
         |    coalesce(s.c_s, 0) AS c_s, ct.c
         |  FROM marg m CROSS JOIN ct CROSS JOIN tot
         |  LEFT JOIN st s ON s.source = m.source AND s.t = ct.t)
         |SELECT source, n_s,
         |  CAST(sum(CAST(floor(
         |    CAST(c_s + 1 AS DOUBLE) / CAST(n_s + v AS DOUBLE) *
         |    ln((CAST(c_s + 1 AS DOUBLE) * CAST(n + v AS DOUBLE)) /
         |       (CAST(n_s + v AS DOUBLE) * CAST(c + 1 AS DOUBLE)))
         |    * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS kl_nano,
         |  CAST(count(*) AS BIGINT) AS v_terms
         |FROM grid GROUP BY source, n_s ORDER BY source""".stripMargin,
    // q264: same (source, token) counts, same broadcast pair frame as a
    // plain CTE, same full-outer union lattice; each union token's term
    // is the identical NULL-masked double chain nano-floored before the
    // exact per-pair integer sum; ln 2 re-grid in identical order
    "q264_js_divergence" ->
      s"""WITH tc AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT source, unnest($duckToks) AS t FROM documents)
         |  GROUP BY 1, 2),
         |marg AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM tc GROUP BY 1),
         |pairs AS (SELECT a.source AS sa, a.n_s AS na, b.source AS sb, b.n_s AS nb
         |  FROM marg a JOIN marg b ON a.source < b.source),
         |la AS (SELECT p.sa, p.sb, c.t, c.c AS ca
         |  FROM tc c JOIN pairs p ON c.source = p.sa),
         |lb AS (SELECT p.sa, p.sb, c.t, c.c AS cb
         |  FROM tc c JOIN pairs p ON c.source = p.sb),
         |un AS (SELECT coalesce(la.sa, lb.sa) AS sa, coalesce(la.sb, lb.sb) AS sb,
         |    CAST(coalesce(la.ca, 0) AS BIGINT) AS ca,
         |    CAST(coalesce(lb.cb, 0) AS BIGINT) AS cb
         |  FROM la FULL OUTER JOIN lb
         |    ON la.sa = lb.sa AND la.sb = lb.sb AND la.t = lb.t),
         |terms AS (SELECT un.sa, un.sb, p.na, p.nb,
         |    CAST(floor((
         |      0.5 * coalesce(
         |        (CASE WHEN ca > 0 THEN CAST(ca AS DOUBLE) / CAST(p.na AS DOUBLE) END)
         |        * ln(2.0 * (CASE WHEN ca > 0 THEN CAST(ca AS DOUBLE) / CAST(p.na AS DOUBLE) END)
         |          / (coalesce(CASE WHEN ca > 0 THEN CAST(ca AS DOUBLE) / CAST(p.na AS DOUBLE) END, 0.0)
         |            + coalesce(CASE WHEN cb > 0 THEN CAST(cb AS DOUBLE) / CAST(p.nb AS DOUBLE) END, 0.0))), 0.0)
         |      + 0.5 * coalesce(
         |        (CASE WHEN cb > 0 THEN CAST(cb AS DOUBLE) / CAST(p.nb AS DOUBLE) END)
         |        * ln(2.0 * (CASE WHEN cb > 0 THEN CAST(cb AS DOUBLE) / CAST(p.nb AS DOUBLE) END)
         |          / (coalesce(CASE WHEN ca > 0 THEN CAST(ca AS DOUBLE) / CAST(p.na AS DOUBLE) END, 0.0)
         |            + coalesce(CASE WHEN cb > 0 THEN CAST(cb AS DOUBLE) / CAST(p.nb AS DOUBLE) END, 0.0))), 0.0)
         |    ) * 1000000000.0 + 0.5) AS BIGINT) AS term_nano
         |  FROM un JOIN pairs p ON p.sa = un.sa AND p.sb = un.sb)
         |SELECT sa, sb, CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
         |  CAST(count(*) AS BIGINT) AS n_union,
         |  CAST(sum(term_nano) AS BIGINT) AS jsd_nano,
         |  CAST(floor(CAST(sum(term_nano) AS DOUBLE) / 1000000000.0 / ln(2.0)
         |    * 1000000.0 + 0.5) AS BIGINT) AS jsd_norm_micro
         |FROM terms GROUP BY sa, sb ORDER BY sa, sb""".stripMargin,
    "q138_pagerank" -> duckPageRankSql,
    "q161_triangles" -> duckTrianglesSql,
    "q169_bfs_reach" -> duckBfsSql,
    "q252_harmonic" -> duckHarmonicSql,
    "q260_betweenness" -> duckBetweennessSql,
    "q217_weighted_sssp" -> duckSsspSql,
    "q180_assortativity" -> duckAssortativitySql,
    "q194_kcore" -> duckKcoreSql,
    "q220_label_prop" -> duckLpaSql,
    "q267_modularity" -> duckModularitySql,
    // q227: identical freq-of-freq grid; r* and P0 are one double
    // division each in identical order
    "q227_good_turing" ->
      s"""WITH tf AS (SELECT t AS tok, count(*) AS r
         |  FROM (SELECT unnest($duckToks) AS t FROM documents) GROUP BY 1),
         |nr AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM tf GROUP BY r),
         |tot AS (SELECT CAST(sum(r) AS BIGINT) AS n_total,
         |    CAST(count(*) AS BIGINT) AS v,
         |    CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1 FROM tf),
         |head AS (SELECT a.r, a.n_r, CAST(coalesce(b.n_r, 0) AS BIGINT) AS n_r_next
         |  FROM nr a LEFT JOIN nr b ON b.r = a.r + 1 ORDER BY a.r LIMIT 10)
         |SELECT CAST(h.r AS BIGINT) AS r, h.n_r, h.n_r_next,
         |  CAST(floor(CAST(h.r + 1 AS DOUBLE) * CAST(h.n_r_next AS DOUBLE)
         |    / CAST(h.n_r AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS r_star_micro,
         |  tot.n_total, tot.v,
         |  CAST(floor(CAST(tot.n1 AS DOUBLE) / CAST(tot.n_total AS DOUBLE)
         |    * 1000000.0 + 0.5) AS BIGINT) AS p0_micro
         |FROM head h, tot ORDER BY r""".stripMargin,
    // q228: identical rank blocks off the freq-of-freq grid, identical
    // micro-floored logs, double-widened closed form
    "q228_zipf_fit" ->
      s"""WITH tf AS (SELECT t AS tok, count(*) AS f
         |  FROM (SELECT unnest($duckToks) AS t FROM documents) GROUP BY 1),
         |ff AS (SELECT f, count(*) AS n_f FROM tf GROUP BY f),
         |offs AS (SELECT f, n_f,
         |    CAST(coalesce(sum(n_f) OVER (ORDER BY f DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
         |  FROM ff),
         |pairs AS (SELECT f, unnest(range(off + 1, off + n_f + 1)) AS rank FROM offs),
         |terms AS (SELECT
         |    CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lx,
         |    CAST(floor(ln(CAST(f AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS ly
         |  FROM pairs),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
         |    CAST(sum(lx * lx) AS BIGINT) AS sxx, CAST(sum(lx * ly) AS BIGINT) AS sxy,
         |    CAST(sum(ly * ly) AS BIGINT) AS syy FROM terms)
         |SELECT n AS v,
         |  CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         |    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * 1000000.0 + 0.5)
         |    AS BIGINT) AS slope_micro,
         |  CAST(floor((CAST(sy AS DOUBLE)
         |      - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         |        / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
         |        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS intercept_micro,
         |  CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         |    * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         |    / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
         |      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
         |    * 1000000.0 + 0.5) AS BIGINT) AS r2_micro
         |FROM g""".stripMargin,
    // q256: same distinct (source, token) table, same token-keyed
    // self-join, same micro-floored integer divisions — no float at all
    "q256_source_overlap" ->
      s"""WITH st AS (SELECT DISTINCT source, t AS tok
         |  FROM (SELECT source, unnest($duckToks) AS t FROM documents)),
         |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS v FROM st GROUP BY 1),
         |inter AS (SELECT a.source AS s1, b.source AS s2,
         |    CAST(count(*) AS BIGINT) AS inter
         |  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT s1, s2, sa.v AS v1, sb.v AS v2, inter,
         |  (inter * 1000000) // (sa.v + sb.v - inter) AS jaccard_micro,
         |  (inter * 1000000) // least(sa.v, sb.v) AS containment_micro
         |FROM inter
         |JOIN sizes sa ON sa.source = s1
         |JOIN sizes sb ON sb.source = s2
         |ORDER BY s1, s2""".stripMargin,
    // q251: same bigram-type counts, same quarters algebra (4c-3 exact
    // longs), same identical-order double chain, same (c DESC, bg) head
    "q251_kneser_ney" ->
      s"""WITH toks AS (SELECT $duckToks AS tk FROM documents),
         |bgx AS (SELECT unnest($duckBigrams) AS bg FROM toks),
         |pairs AS (SELECT bg, split_part(bg, ' ', 1) AS w1,
         |    split_part(bg, ' ', 2) AS w2, CAST(count(*) AS BIGINT) AS c
         |  FROM bgx GROUP BY 1, 2, 3),
         |lft AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c_w1,
         |    CAST(count(*) AS BIGINT) AS n1_fw FROM pairs GROUP BY 1),
         |rgt AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1_bw FROM pairs GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS b FROM pairs)
         |SELECT p.bg, p.c, l.c_w1, l.n1_fw, r.n1_bw,
         |  CAST(floor((
         |    CAST(4 * p.c - 3 AS DOUBLE) / (4.0 * CAST(l.c_w1 AS DOUBLE))
         |    + 3.0 * CAST(l.n1_fw AS DOUBLE) * CAST(r.n1_bw AS DOUBLE)
         |      / (4.0 * CAST(l.c_w1 AS DOUBLE) * CAST(tot.b AS DOUBLE))
         |  ) * 1000000.0 + 0.5) AS BIGINT) AS p_kn_micro
         |FROM pairs p JOIN lft l USING (w1) JOIN rgt r USING (w2) CROSS JOIN tot
         |ORDER BY p.c DESC, p.bg LIMIT 40""".stripMargin,
    // q258: the same KN model CTEs, per-type surprisal micro-floored
    // off the identical double chain, exact long per-doc sums, exact
    // integer ce division, and the same ceil(2n/3) rank threshold
    // (row_number over scored docs — the sequential spec of the
    // two-phase selection the Spark side runs)
    "q258_kn_ppl_gate" ->
      s"""WITH toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |bgx AS (SELECT doc_id, unnest($duckBigrams) AS bg FROM toks),
         |pairs AS (SELECT bg, split_part(bg, ' ', 1) AS w1,
         |    split_part(bg, ' ', 2) AS w2, CAST(count(*) AS BIGINT) AS c
         |  FROM bgx GROUP BY 1, 2, 3),
         |lft AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c_w1,
         |    CAST(count(*) AS BIGINT) AS n1_fw FROM pairs GROUP BY 1),
         |rgt AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1_bw FROM pairs GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS b FROM pairs),
         |surp AS MATERIALIZED (SELECT p.bg,
         |    CAST(floor(-ln(
         |      CAST(4 * p.c - 3 AS DOUBLE) / (4.0 * CAST(l.c_w1 AS DOUBLE))
         |      + 3.0 * CAST(l.n1_fw AS DOUBLE) * CAST(r.n1_bw AS DOUBLE)
         |        / (4.0 * CAST(l.c_w1 AS DOUBLE) * CAST(tot.b AS DOUBLE))
         |    ) * 1000000.0 + 0.5) AS BIGINT) AS surp_micro
         |  FROM pairs p JOIN lft l USING (w1) JOIN rgt r USING (w2) CROSS JOIN tot),
         |perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(surp_micro) AS BIGINT) AS h_micro
         |  FROM bgx JOIN surp USING (bg) GROUP BY doc_id),
         |scored AS MATERIALIZED (SELECT d.doc_id,
         |    CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |    CAST(coalesce(p.h_micro, 0) AS BIGINT) AS h_micro,
         |    CAST(CASE WHEN p.n_bigrams IS NULL THEN -1
         |      ELSE p.h_micro // p.n_bigrams END AS BIGINT) AS ce_micro
         |  FROM documents d LEFT JOIN perdoc p USING (doc_id)),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored WHERE n_bigrams > 0),
         |thr AS (SELECT CAST(max(ce_micro) AS BIGINT) AS t FROM (
         |    SELECT ce_micro, row_number() OVER (ORDER BY ce_micro, doc_id) AS rn
         |    FROM scored WHERE n_bigrams > 0)
         |  WHERE rn <= (SELECT (2 * n + 2) // 3 FROM nn))
         |SELECT s.doc_id, s.n_bigrams, s.h_micro, s.ce_micro,
         |  thr.t AS thr_micro,
         |  CAST(CASE WHEN s.ce_micro <= thr.t THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM scored s CROSS JOIN thr ORDER BY s.doc_id""".stripMargin,
    // q196: the composed curation canon — the SAME gopher/repetition/
    // CCNet/DSIR/contamination chains the standalone oracles use
    // (p-/w-prefixed to avoid CTE name collisions), cascaded then
    // dedup→decontaminate→pack. Multi-referenced heavy CTEs forced
    // AS MATERIALIZED (the duckKcoreSql inlining lesson).
    "q196_curation_canon" ->
      s"""WITH $duckCurationCTEs
         |SELECT doc_id, source, n_tokens, cum_before // $PackWindow AS pack_id
         |FROM packed ORDER BY doc_id""".stripMargin,
    // q261: the same cascade with the q258 KN keep-set CTEs composed
    // into `gated` (k-prefixed; the Spark side's knGate = true twin)
    "q261_curation_kn" ->
      s"""WITH $duckCurationKnCTEs
         |SELECT doc_id, source, n_tokens, cum_before // $PackWindow AS pack_id
         |FROM packed ORDER BY doc_id""".stripMargin,
    // q234: position-grain window hashes, min-doc canonicality, and the
    // equal-width interval-union closed form — identical arithmetic to
    // the Spark operator, exact longs end to end
    "q234_span_removal" ->
      s"""WITH ${duckSpanCTEs("documents")}
         |SELECT t.doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
         |  CAST(coalesce(n_removed, 0) AS BIGINT) AS n_removed,
         |  CAST(len(tk) - coalesce(n_removed, 0) AS BIGINT) AS n_kept
         |FROM stoks t LEFT JOIN sagg USING (doc_id) ORDER BY doc_id""".stripMargin,
    // q248: same window-hash base; dup = same hash earlier in the SAME
    // doc (first occurrence canonical), same interval-union closed form
    "q248_span_self_dedup" ->
      s"""WITH ${duckSelfSpanCTEs("documents")}
         |SELECT t.doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(n_self_dup_windows, 0) AS BIGINT) AS n_self_dup_windows,
         |  CAST(coalesce(n_removed, 0) AS BIGINT) AS n_removed,
         |  CAST(len(tk) - coalesce(n_removed, 0) AS BIGINT) AS n_kept
         |FROM stoks t LEFT JOIN sagg USING (doc_id) ORDER BY doc_id""".stripMargin,
    // q236: the same 16-point grid with the sequential window forms
    // (row_number / running sum live only here), same micro-floored
    // logs and double-widened closed form as q228's oracle
    "q236_heaps_fit" ->
      s"""WITH d AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |pos AS (SELECT doc_id, tk,
         |    CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS p,
         |    CAST(sum(len(tk)) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_toks
         |  FROM d),
         |nn AS (SELECT count(*) AS n FROM d),
         |grid AS (SELECT CAST(k AS BIGINT) AS k,
         |    CAST((SELECT n FROM nn) * k // $HeapsGridK AS BIGINT) AS p_k
         |  FROM (SELECT unnest(range(1, ${HeapsGridK + 1})) AS k)),
         |firstp AS (SELECT t, min(doc_id) AS fd
         |  FROM (SELECT doc_id,
         |      unnest(list_transform(range(1, len(tk) - 1),
         |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS t
         |    FROM d WHERE len(tk) >= 3) GROUP BY t),
         |fpos AS (SELECT f.t, p.p AS fp FROM firstp f JOIN pos p ON p.doc_id = f.fd),
         |vocab AS (SELECT g.k, CAST(count(*) AS BIGINT) AS vocab
         |  FROM fpos, grid g WHERE fpos.fp <= g.p_k GROUP BY g.k),
         |pts AS (SELECT g.k, g.p_k AS n_docs, p.cum_toks, v.vocab,
         |    CAST(floor(ln(CAST(p.cum_toks AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lx,
         |    CAST(floor(ln(CAST(v.vocab AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS ly
         |  FROM grid g JOIN pos p ON p.p = g.p_k JOIN vocab v ON v.k = g.k),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS np,
         |    CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
         |    CAST(sum(lx * lx) AS BIGINT) AS sxx, CAST(sum(lx * ly) AS BIGINT) AS sxy,
         |    CAST(sum(ly * ly) AS BIGINT) AS syy FROM pts),
         |fit AS (SELECT
         |    CAST(floor((CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         |      / (CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
         |      * 1000000.0 + 0.5) AS BIGINT) AS beta_micro,
         |    CAST(floor((CAST(sy AS DOUBLE)
         |        - (CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         |          / (CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
         |          * CAST(sx AS DOUBLE)) / CAST(np AS DOUBLE) + 0.5) AS BIGINT) AS lnk_micro,
         |    CAST(floor((CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         |      * (CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         |      / ((CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
         |        * (CAST(np AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
         |      * 1000000.0 + 0.5) AS BIGINT) AS r2_micro
         |  FROM m)
         |SELECT k, n_docs, cum_toks, vocab, beta_micro, lnk_micro, r2_micro
         |FROM pts, fit ORDER BY k""".stripMargin,
    // q238: same per-term micro floors, exact long sums, integer //
    // (both sums nonnegative, so // == Scala's truncating /)
    "q238_entropy_rate" ->
      s"""WITH tks AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |uni AS (SELECT w, count(*) AS c
         |  FROM (SELECT unnest(tk) AS w FROM tks) GROUP BY 1),
         |ut AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM uni),
         |h1 AS (SELECT CAST(sum(CAST(floor(CAST(c AS DOUBLE)
         |    * ln((SELECT CAST(n AS DOUBLE) FROM ut) / CAST(c AS DOUBLE))
         |    * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s FROM uni),
         |bg AS (SELECT unnest(lst).g AS g, unnest(lst).h AS h
         |  FROM (SELECT list_transform(range(1, len(tk)),
         |      i -> struct_pack(g := tk[i] || ' ' || tk[i+1], h := tk[i])) AS lst
         |    FROM tks WHERE len(tk) >= 2)),
         |c12 AS (SELECT g, h, count(*) AS c12 FROM bg GROUP BY g, h),
         |c1 AS (SELECT h, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY h),
         |bt AS (SELECT CAST(sum(c12) AS BIGINT) AS nb, CAST(count(*) AS BIGINT) AS vb FROM c12),
         |h2 AS (SELECT CAST(sum(CAST(floor(CAST(c.c12 AS DOUBLE)
         |    * ln(CAST(c1.c1 AS DOUBLE) / CAST(c.c12 AS DOUBLE))
         |    * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s
         |  FROM c12 c JOIN c1 USING (h))
         |SELECT ut.n AS n_tokens, ut.v AS v_unigrams, bt.nb AS n_bigrams,
         |  bt.vb AS v_bigrams,
         |  CAST(h1.s // ut.n AS BIGINT) AS h1_micro,
         |  CAST(h2.s // bt.nb AS BIGINT) AS h2_micro
         |FROM ut, bt, h1, h2""".stripMargin,
    "q239_hits" -> duckHitsSql,
    "q244_katz" -> duckKatzSql,
    "q245_personalized_pr" -> duckPprSql,
    // q235: the full curation chain, then the span CTEs over its
    // admitted relation — min-doc canonicality among SURVIVORS only
    "q235_curation_spans" ->
      s"""WITH $duckCurationCTEs,
         |${duckSpanCTEs("(SELECT doc_id, text FROM clean)")}
         |SELECT t.doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
         |  CAST(coalesce(n_removed, 0) AS BIGINT) AS n_removed,
         |  CAST(len(tk) - coalesce(n_removed, 0) AS BIGINT) AS n_kept
         |FROM stoks t LEFT JOIN sagg USING (doc_id) ORDER BY doc_id""".stripMargin,
    // q181: same three exact counts (vowel-run syllables floored at 1,
    // terminator-run sentences floored at 1), same double expression
    "q181_readability" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS tk,
         |    greatest(1, len(list_filter(string_split_regex(text, '[.!?]+'),
         |      p -> trim(p) <> ''))) AS n_sentences
         |  FROM documents),
         |c AS (SELECT doc_id,
         |    CAST(len(tk) AS BIGINT) AS n_words,
         |    CAST(n_sentences AS BIGINT) AS n_sentences,
         |    CAST(list_sum(list_transform(tk,
         |      w -> greatest(1, len(regexp_extract_all(lower(w), '[aeiouy]+')))))
         |      AS BIGINT) AS n_syllables
         |  FROM t WHERE len(tk) > 0)
         |SELECT doc_id, n_words, n_sentences, n_syllables,
         |  CAST(floor((0.39 * n_words::DOUBLE / n_sentences::DOUBLE +
         |    11.8 * n_syllables::DOUBLE / n_words::DOUBLE - 15.59)
         |    * 1000000.0 + 0.5) AS BIGINT) AS fk_grade_micro
         |FROM c ORDER BY doc_id""".stripMargin,
    // q183: the gate-vector spec — the heavy-hitter SET is exact and
    // deterministic, and the MG theorems guarantee both booleans true;
    // raw estimates are merge-order-dependent and never leave the query
    "q183_heavy_hitters" ->
      s"""WITH tk AS (SELECT unnest($duckToks) AS token FROM documents),
         |c AS (SELECT token, CAST(count(*) AS BIGINT) AS freq FROM tk GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tk)
         |SELECT token, freq, true AS found, true AS within_bound
         |FROM c, n WHERE freq::DOUBLE > n::DOUBLE / ${MgCounters + 1}.0
         |ORDER BY token""".stripMargin,
    // q174: same (token, doc) grain; the top posting row_number uses the
    // identical (tf DESC, doc_id) order; postings head is the same
    // 5-element id-ordered slice serialized the same way
    "q174_inverted_index" ->
      s"""WITH tf AS (SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest($duckToks) AS token FROM documents)
         |  GROUP BY 1, 2),
         |top AS (SELECT token, doc_id AS top_doc, tf AS top_tf,
         |    row_number() OVER (PARTITION BY token ORDER BY tf DESC, doc_id)
         |      AS rn
         |  FROM tf),
         |st AS (SELECT token, CAST(count(*) AS BIGINT) AS df,
         |    CAST(sum(tf) AS BIGINT) AS cf,
         |    array_to_string(list_transform(
         |      list_slice(list(doc_id ORDER BY doc_id), 1, 5),
         |      x -> CAST(x AS VARCHAR)), ',') AS postings_head
         |  FROM tf GROUP BY token)
         |SELECT st.token, df, cf, top_doc, top_tf, postings_head
         |FROM st JOIN top ON top.token = st.token AND top.rn = 1
         |ORDER BY st.token""".stripMargin,
    // q162: identical integer-ratio inputs to ln, micro-nat floors; the
    // expected count widens factors to DOUBLE before multiplying
    "q162_mutual_info" ->
      """WITH cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_xy
        |  FROM documents GROUP BY 1, 2),
        |g AS (SELECT source, lang, n_xy,
        |    CAST(sum(n_xy) OVER (PARTITION BY source) AS BIGINT) AS n_x,
        |    CAST(sum(n_xy) OVER (PARTITION BY lang) AS BIGINT) AS n_y,
        |    CAST(sum(n_xy) OVER () AS BIGINT) AS n
        |  FROM cells)
        |SELECT source, lang, n_xy, n_x, n_y,
        |  CAST(floor((n_xy::DOUBLE / n::DOUBLE) *
        |    ln((n::DOUBLE * n_xy::DOUBLE) / (n_x::DOUBLE * n_y::DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT) AS mi_micro,
        |  CAST(floor(((n_xy::DOUBLE - n_x::DOUBLE * n_y::DOUBLE / n::DOUBLE)
        |    * (n_xy::DOUBLE - n_x::DOUBLE * n_y::DOUBLE / n::DOUBLE)
        |    / (n_x::DOUBLE * n_y::DOUBLE / n::DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro
        |FROM g ORDER BY source, lang""".stripMargin,
    // q163: support gate before the joins; ONE double ratio into ln on
    // both sides, micro-nat floor
    "q163_pmi_collocations" ->
      s"""WITH toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |uni AS (SELECT t, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest(tk) AS t FROM toks) GROUP BY t),
         |nu AS (SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM uni),
         |big AS (SELECT g, CAST(count(*) AS BIGINT) AS c_xy
         |  FROM (SELECT unnest($duckBigrams) AS g FROM toks WHERE len(tk) >= 2)
         |  GROUP BY g HAVING count(*) >= $PmiMinCount),
         |nb AS (SELECT CAST(sum(len(tk) - 1) AS BIGINT) AS n_bi
         |  FROM toks WHERE len(tk) >= 2),
         |sp AS (SELECT c_xy, string_split(g, ' ')[1] AS x,
         |    string_split(g, ' ')[2] AS y FROM big)
         |SELECT x, y, c_xy, ux.c AS c_x, uy.c AS c_y,
         |  CAST(floor(ln((c_xy::DOUBLE / n_bi::DOUBLE) /
         |    ((ux.c::DOUBLE / n_uni::DOUBLE) * (uy.c::DOUBLE / n_uni::DOUBLE)))
         |    * 1000000.0 + 0.5) AS BIGINT) AS pmi_micro
         |FROM sp JOIN uni ux ON ux.t = sp.x JOIN uni uy ON uy.t = sp.y, nu, nb
         |ORDER BY x, y""".stripMargin,
    // q139: the SEQUENTIAL spec — one global window — against which the
    // Spark side's two-level distributed prefix sum is hash-verified
    "q139_shard_assign" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($duckToks) AS BIGINT) AS n_tokens,
         |    ${duckTokHash("CAST(doc_id AS VARCHAR)")} AS rk FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |    SUM(n_tokens) OVER (ORDER BY rk, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cb
         |  FROM t)
         |SELECT doc_id, n_tokens, CAST(cb // $ShardTokenBudget AS BIGINT) AS shard_id
         |FROM c ORDER BY doc_id""".stripMargin,
    "q140_psi_drift" -> {
      val (b, w) = (PsiBins, PsiBinWidth)
      val p = s"(COALESCE(sc.src_cnt, 0) + 1)::DOUBLE / (ns.n_src + $b)"
      val q = s"(COALESCE(rc.ref_cnt, 0) + 1)::DOUBLE / (nt.n + $b)"
      s"""WITH d AS (SELECT source,
         |    least(CAST(len($duckToks) AS BIGINT) // $w, ${b - 1}) AS bin
         |  FROM documents),
         |grid AS (SELECT s.source, b.bin
         |  FROM (SELECT DISTINCT source FROM documents) s,
         |       (SELECT unnest(range(0, $b)) AS bin) b),
         |sc AS (SELECT source, bin, count(*) AS src_cnt FROM d GROUP BY 1, 2),
         |rc AS (SELECT bin, count(*) AS ref_cnt FROM d GROUP BY 1),
         |ns AS (SELECT source, count(*) AS n_src FROM d GROUP BY 1),
         |nt AS (SELECT count(*) AS n FROM d)
         |SELECT g.source, CAST(g.bin AS BIGINT) AS bin,
         |  CAST(COALESCE(sc.src_cnt, 0) AS BIGINT) AS src_cnt,
         |  CAST(COALESCE(rc.ref_cnt, 0) AS BIGINT) AS ref_cnt,
         |  CAST(floor((($p) - ($q)) * ln(($p) / ($q)) * 1000000.0) AS BIGINT) AS psi_micro
         |FROM grid g
         |LEFT JOIN sc ON sc.source = g.source AND sc.bin = g.bin
         |LEFT JOIN rc ON rc.bin = g.bin
         |JOIN ns ON ns.source = g.source
         |CROSS JOIN nt
         |ORDER BY g.source, g.bin""".stripMargin
    },
    "q65_ivf_invariants" ->
      """SELECT (SELECT count(*) FROM embeddings) AS n_indexed,
        |  1 AS lists_plural, 1 AS topk_bounded, 1 AS probe_restricted""".stripMargin,
    // q114: codebooks aren't SQL-expressible; the shape/optimality/
    // determinism gates are constants, count restated from the table
    "q114_product_quant" ->
      """SELECT (SELECT count(*) FROM embeddings) AS n_vectors,
        |  1 AS codes_shape_ok, 1 AS assignment_optimal,
        |  1 AS encode_deterministic""".stripMargin,
    // q121: artifact save/load identity isn't SQL-expressible; the
    // roundtrip flags are constants, the count restates from the table
    "q121_index_persist" ->
      """SELECT (SELECT count(*) FROM embeddings WHERE vec_id % 4 = 0) AS n_vectors,
        |  1 AS centers_roundtrip, 1 AS codebooks_roundtrip,
        |  1 AS coded_roundtrip, 1 AS search_identity,
        |  1 AS results_nonempty""".stripMargin,
    // q125: codebook quality isn't SQL-expressible; the IVFADC gates are
    // invariant flags, the count restates from the table (q121 discipline)
    "q125_residual_adc" ->
      """SELECT (SELECT count(*) FROM embeddings WHERE vec_id % 4 = 0) AS n_vectors,
        |  1 AS residual_codes_ok, 1 AS residual_improves,
        |  1 AS search_complete""".stripMargin,
    // q126: the OPQ gates (orthogonality, isometry, SSE ≤ plain PQ,
    // roundtrip) aren't SQL-expressible; invariant flags + the count
    // restated from the table (q121 discipline)
    "q126_opq" ->
      """SELECT (SELECT count(*) FROM embeddings) AS n_vectors,
        |  1 AS rotation_orthogonal, 1 AS isometry_ok, 1 AS codes_ok,
        |  1 AS opq_not_worse, 1 AS roundtrip_ok,
        |  1 AS search_complete""".stripMargin,
    // q115: the window lambda variable is `wi`, NOT `i` — duckTokHash's
    // inner character fold binds `i`, and an outer `i` would be shadowed
    // inside the hash (silently hashing the wrong window)
    "q115_window_decontam" -> {
      val W = DecontamWindow
      s"""WITH toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |w AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - ${W - 2}),
         |    wi -> ${duckTokHash(s"array_to_string(tk[wi:wi+${W - 1}], ' ')")})) AS whs
         |  FROM toks WHERE len(tk) >= $W),
         |e AS (SELECT doc_id AS eval_id, unnest(whs) AS h FROM w WHERE doc_id % 10 = 0),
         |t2 AS (SELECT doc_id AS train_id, unnest(whs) AS h FROM w WHERE doc_id % 10 <> 0)
         |SELECT train_id, eval_id, CAST(count(*) AS BIGINT) AS n_windows
         |FROM t2 JOIN e USING (h) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "q129_substring_dup" -> {
      val W = DecontamWindow
      s"""WITH toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |w AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - ${W - 2}),
         |    wi -> ${duckTokHash(s"array_to_string(tk[wi:wi+${W - 1}], ' ')")})) AS whs
         |  FROM toks WHERE len(tk) >= $W),
         |wins AS (SELECT doc_id, unnest(whs) AS h FROM w),
         |shared AS (SELECT h FROM wins GROUP BY h
         |           HAVING count(*) >= 2 AND count(*) <= $SubstrDupDfCap),
         |hits AS (SELECT doc_id, h FROM wins JOIN shared USING (h))
         |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
         |FROM hits x JOIN hits y ON x.h = y.h AND x.doc_id < y.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= $SubstrDupMinShared ORDER BY 1, 2""".stripMargin
    },
    "q130_token_budget" ->
      s"""WITH ranked AS (
         |  SELECT doc_id, source,
         |    CAST(len($duckToks) AS BIGINT) AS n_tokens,
         |    ${duckTokHash("source || '|' || CAST(doc_id AS VARCHAR)")} AS rk
         |  FROM documents
         |), cum AS (
         |  SELECT source, doc_id, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY rk, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
         |  FROM ranked
         |)
         |SELECT source, doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
         |FROM cum WHERE cum_tokens <= $TokenBudgetPerSource ORDER BY source, cum_tokens""".stripMargin,
    // q134: same augmented string built from table data, then RE2 must
    // scrub exactly what Java regex scrubbed (patterns live in the
    // dialect intersection; 'g' flag = Spark's replace-all default).
    "q134_pii_scrub" -> {
      val (em, ip, ph) = (TextOps.PiiEmail, TextOps.PiiIpv4, TextOps.PiiPhone)
      s"""WITH aug AS (SELECT doc_id,
         |    text || ' reach user' || CAST(doc_id AS VARCHAR) ||
         |      '@mail.example.org or 10.0.' || CAST(doc_id % 200 AS VARCHAR) ||
         |      '.7 call 555-123-4567' AS a
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(a, '$em', 0)) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(a, '$ip', 0)) AS BIGINT) AS n_ip,
         |  CAST(len(regexp_extract_all(a, '$ph', 0)) AS BIGINT) AS n_phone,
         |  regexp_replace(regexp_replace(regexp_replace(a,
         |    '$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$ph', '<PHONE>', 'g') AS text_scrubbed
         |FROM aug""".stripMargin
    },
    // q135: gate-vector oracle (q91/q92 pattern) — the iterative fit
    // has no SQL twin; the invariants a correct fit guarantees do, and
    // the row count is corpus-derived rather than a hardcoded constant.
    "q135_quality_clf" ->
      """SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_scored,
        |  CAST(0 AS BIGINT) AS n_out_of_range,
        |  CAST(0 AS BIGINT) AS n_threshold_inconsistent,
        |  1 AS auc_gate, 1 AS sep_gate""".stripMargin,
    // q137: the same five stages chained relationally — NFC+scrub into
    // a `clean` relation, the shared repetition CTEs over it, the
    // rep_pass conjunction as the gate, first-doc_id-wins dedup on the
    // cleaned-text hash, then the q130 budget window.
    "q137_curation_pipeline" -> {
      val (em, ip, ph) = (TextOps.PiiEmail, TextOps.PiiIpv4, TextOps.PiiPhone)
      s"""WITH clean AS (SELECT doc_id, source,
         |    regexp_replace(regexp_replace(regexp_replace(nfc_normalize(text),
         |      '$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$ph', '<PHONE>', 'g') AS text
         |  FROM documents),
         |${duckRepetitionCTEs("clean")},
         |kept AS (SELECT c.doc_id, c.source, c.text
         |  FROM clean c JOIN rep_stats rs ON rs.doc_id = c.doc_id
         |  WHERE $duckRepPassCond),
         |dd AS (SELECT *, row_number() OVER (
         |    PARTITION BY ${duckTokHash("text")} ORDER BY doc_id) AS rn FROM kept),
         |ranked AS (SELECT doc_id, source,
         |    CAST(len($duckToks) AS BIGINT) AS n_tokens,
         |    ${duckTokHash("source || '|' || CAST(doc_id AS VARCHAR)")} AS rk
         |  FROM dd WHERE rn = 1),
         |cum AS (SELECT source, doc_id, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY rk, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
         |  FROM ranked)
         |SELECT source, doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
         |FROM cum WHERE cum_tokens <= $TokenBudgetPerSource""".stripMargin
    },
    // q136: gate-vector oracle — full-probe IVF must equal brute force
    // exactly and recall must be probe-monotone; the panel size is
    // corpus-derived.
    "q136_ann_recall" ->
      """SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id < 8) AS BIGINT) AS n_queries,
        |  1 AS full_probe_exact, 1 AS recall_monotone,
        |  1.0 AS mean_recall_full""".stripMargin,
    // q197: gate-vector oracle for the composed OPQ+residual+refine
    // stack — refine ≥ raw ADC and shortlist-monotone recall (both
    // theorems), the plain-IVF full-probe floor re-verified on the
    // rotated index, and the ≥0.85 stack recall floor.
    "q197_stack_recall" ->
      """SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id < 8) AS BIGINT) AS n_queries,
        |  1 AS refine_not_worse, 1 AS shortlist_monotone,
        |  1 AS ivf_floor_exact, 1 AS recall_floor_ok""".stripMargin,
    // q132: same fit/score arithmetic relationally — bucket occurrence
    // counts with a target-slice sum, add-1 LLRs scaled to integer
    // micro-nats (floor(w·1e6 + 0.5)) so the per-doc sum is an exact
    // BIGINT in both engines, then the same (log_w desc, doc_id) rank.
    "q132_dsir_select" ->
      s"""WITH toks AS (SELECT doc_id, lang, $duckToks AS tk FROM documents),
         |bks AS (SELECT doc_id, lang,
         |    list_transform($duckBigrams, g -> (${duckTokHash("g")}) % $DsirBuckets) AS bk
         |  FROM toks),
         |occ AS (SELECT doc_id, lang, unnest(bk) AS b FROM bks),
         |bc AS (SELECT b, count(*) AS raw_c,
         |         sum(CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END) AS tgt_c
         |       FROM occ GROUP BY b),
         |tot AS (SELECT sum(raw_c) AS nr, sum(tgt_c) AS nt FROM bc),
         |llr AS (SELECT b, CAST(floor((ln((tgt_c + 1.0) / (nt + $DsirBuckets)) -
         |           ln((raw_c + 1.0) / (nr + $DsirBuckets))) * 1000000.0 + 0.5) AS BIGINT) AS w
         |        FROM bc, tot),
         |ds AS (SELECT o.doc_id, sum(l.w) AS sw, count(*) AS ng
         |       FROM occ o JOIN llr l ON o.b = l.b GROUP BY o.doc_id),
         |scored AS (SELECT d.doc_id, CAST(COALESCE(ng, 0) AS BIGINT) AS n_grams,
         |    ${fpRound4Sql("CAST(COALESCE(sw, 0) AS DOUBLE) / 1000000.0")} AS log_w
         |  FROM documents d LEFT JOIN ds ON ds.doc_id = d.doc_id),
         |r AS (SELECT *, CAST(row_number() OVER (ORDER BY log_w DESC, doc_id) AS BIGINT) AS rnk,
         |        count(*) OVER () AS cnt FROM scored)
         |SELECT doc_id, n_grams, log_w, rnk,
         |  CAST(rnk <= ceil(cnt * $DsirKeepFrac) AS INT) AS selected
         |FROM r""".stripMargin,
    // q133: per-language add-1 bigram LM, both log terms scaled to
    // integer micro-nats before the per-doc sum (exact BIGINT totals,
    // like q132), head/middle/tail thirds per language.
    "q133_ngram_lm_ppl" -> {
      def s6(e: String) = s"CAST(floor(ln($e) * 1000000.0 + 0.5) AS BIGINT)"
      s"""WITH toks AS (SELECT doc_id, lang, $duckToks AS tk FROM documents),
         |bg AS (SELECT doc_id, lang,
         |    list_transform(range(1, len(tk)),
         |      i -> struct_pack(g := tk[i] || ' ' || tk[i+1], h := tk[i])) AS lst
         |  FROM toks WHERE len(tk) >= 2),
         |occ AS (SELECT doc_id, lang, unnest(lst).g AS g, unnest(lst).h AS h FROM bg),
         |voc AS (SELECT lang, count(DISTINCT w) AS v,
         |          ${s6("count(DISTINCT w)")} AS den_def
         |        FROM (SELECT lang, unnest(tk) AS w FROM toks) GROUP BY lang),
         |c2 AS (SELECT lang, g, ${s6("count(*) + 1.0")} AS num_s
         |       FROM occ GROUP BY lang, g),
         |c1 AS (SELECT o.lang, o.h, ${s6("count(*) + any_value(voc.v)")} AS den_s
         |       FROM occ o JOIN voc ON voc.lang = o.lang GROUP BY o.lang, o.h),
         |ds AS (SELECT o.doc_id,
         |         sum(COALESCE(c2.num_s, 0) - COALESCE(c1.den_s, voc.den_def)) AS sw,
         |         count(*) AS m
         |       FROM occ o
         |       LEFT JOIN c2 ON c2.lang = o.lang AND c2.g = o.g
         |       LEFT JOIN c1 ON c1.lang = o.lang AND c1.h = o.h
         |       JOIN voc ON voc.lang = o.lang
         |       GROUP BY o.doc_id),
         |scored AS (SELECT d.doc_id, d.lang, CAST(COALESCE(m, 0) AS BIGINT) AS n_bigrams,
         |    ${fpRound4Sql("CASE WHEN m > 0 THEN -(CAST(sw AS DOUBLE) / 1000000.0 / m) ELSE 0.0 END")} AS ce
         |  FROM documents d LEFT JOIN ds ON ds.doc_id = d.doc_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY ce, doc_id) AS rn,
         |        count(*) OVER (PARTITION BY lang) AS cnt FROM scored)
         |SELECT doc_id, lang, n_bigrams, ce,
         |  CASE WHEN rn * 3 <= cnt THEN 'head'
         |       WHEN rn * 3 <= 2 * cnt THEN 'middle' ELSE 'tail' END AS ppl_bucket
         |FROM r""".stripMargin
    },
    // q117: outer lambda var `st` (duckTokHash binds `i` internally —
    // the q115 shadowing rule); DuckDB range excludes its stop, list
    // slicing clamps like Spark's slice
    "q117_chunk_overlap" ->
      s"""$duckChunksCTE
         |SELECT * FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin,
    // q120: the composed RAG pipeline over the q117 chunk frame
    "q120_rag_pipeline" ->
      s"""$duckChunksCTE,
         |ev AS (SELECT DISTINCT chunk_hash FROM chunks WHERE doc_id % 10 = 0),
         |reps AS (SELECT doc_id, chunk_tokens, chunk_hash,
         |    row_number() OVER (PARTITION BY chunk_hash
         |      ORDER BY doc_id, chunk_idx) AS rn
         |  FROM chunks WHERE doc_id % 10 <> 0)
         |SELECT doc_id, count(*) AS n_chunks,
         |  CAST(sum(chunk_tokens) AS BIGINT) AS kept_tokens
         |FROM reps WHERE rn = 1 AND chunk_hash NOT IN (SELECT chunk_hash FROM ev)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q118: the oracle replicates the SAME prefix-filter algebra (the
    // q37 precedent for sketch pipelines); exactness vs brute force is
    // spec-pinned on the full sf0.001 corpus. Integer θ gates only.
    "q118_simjoin_exact" ->
      s"""WITH toks0 AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |docs AS (SELECT doc_id, list_distinct($duckBigrams) AS tk
         |  FROM toks0 WHERE len(tk) >= 2),
         |t AS (SELECT doc_id, unnest(tk) AS tok FROM docs),
         |dfr AS (SELECT tok, count(*) AS df FROM t GROUP BY tok),
         |keyed AS (SELECT doc_id,
         |    list_sort(list(lpad(df::VARCHAR, 10, '0') || tok)) AS ks
         |  FROM t JOIN dfr USING (tok) GROUP BY doc_id),
         |k2 AS (SELECT doc_id, ks, len(ks) AS l,
         |    len(ks) - ((len(ks) * 4 + 4) // 5) + 1 AS plen FROM keyed),
         |pref AS (SELECT doc_id, l, unnest(ks[1:plen]) AS k FROM k2),
         |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         |  FROM pref a JOIN pref b ON a.k = b.k AND a.doc_id < b.doc_id
         |    AND a.l * 4 <= b.l * 5 AND b.l * 4 <= a.l * 5),
         |v AS (SELECT da, db, x.l AS la, y.l AS lb,
         |    len(list_intersect(x.ks, y.ks)) AS inter
         |  FROM cand JOIN k2 x ON x.doc_id = da JOIN k2 y ON y.doc_id = db)
         |SELECT da AS doc_a, db AS doc_b, CAST(inter AS BIGINT) AS n_common,
         |  ${fpRound4Sql("inter::DOUBLE / (la + lb - inter)")} AS jaccard
         |FROM v WHERE inter * 5 >= (la + lb - inter) * 4
         |ORDER BY 1, 2""".stripMargin,
    // q119: the merge list is data-dependent (trained), so the encode
    // gates are invariant flags; the word count restates from the table
    "q119_bpe_encode" ->
      s"""SELECT CAST((SELECT count(DISTINCT t) FROM
         |    (SELECT unnest($duckToks) AS t FROM documents) u) AS BIGINT) AS n_words,
         |  1 AS conserved, 1 AS compressed, 1 AS vocab_closed""".stripMargin,
    // q122: the merge artifact and its roundtrip aren't SQL-expressible;
    // the lifecycle gates are invariant flags, the word count restates
    // from the table (the q119/q121 discipline)
    "q122_bpe_persist" ->
      s"""SELECT CAST((SELECT count(DISTINCT t) FROM
         |    (SELECT unnest($duckToks) AS t FROM documents) u) AS BIGINT) AS n_words,
         |  1 AS merges_roundtrip, 1 AS encode_identity, 1 AS decode_conserves""".stripMargin,
    // q124: merge-table-dependent outputs gate as invariant flags; the
    // word count restates from the table (the q119/q122 discipline)
    "q124_bpe_scale" ->
      s"""SELECT CAST((SELECT count(DISTINCT t) FROM
         |    (SELECT unnest($duckToks) AS t FROM documents) u) AS BIGINT) AS n_words,
         |  1 AS paths_agree, 1 AS scale_conserves""".stripMargin,
    // q116: sqrt is correctly-rounded IEEE in both engines (general pow
    // is not); all float ops are per-row, no cross-row float sums
    "q116_temp_mixture" ->
      s"""WITH t AS (SELECT source, count(*) AS n_docs,
         |  CAST(sum(len($duckToks)) AS BIGINT) AS toks
         |  FROM documents GROUP BY source),
         |m AS (SELECT max(toks) AS toks_max FROM t)
         |SELECT source, n_docs, toks,
         |  ${fpRound4Sql("sqrt(toks::DOUBLE / toks_max)")} AS temp_rel,
         |  ${fpRound4Sql("sqrt(toks::DOUBLE / toks_max) / (toks::DOUBLE / toks_max)")} AS boost
         |FROM t, m ORDER BY source""".stripMargin,
    "q30_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY sha256(text)""".stripMargin,
    "q31_text_stats" ->
      s"""SELECT doc_id, len(tk) AS n_tokens, len(list_distinct(tk)) AS n_distinct,
         |  ${fpRound4Sql("list_sum(list_transform(tk, t -> length(t)))::DOUBLE / len(tk)")} AS avg_tok_len,
         |  ${fpRound4Sql("len(list_distinct(tk))::DOUBLE / len(tk)")} AS ttr
         |FROM (SELECT doc_id, $duckToks AS tk FROM documents) t""".stripMargin,
    "q32_lang_id" -> {
      val hits = langStops.map { case (l, stops) =>
        s"len(list_intersect(tk, [${stops.map(w => s"'$w'").mkString(",")}])) AS hits_$l"
      }.mkString(",\n  ")
      s"""WITH t AS (SELECT doc_id, list_distinct($duckToks) AS tk FROM documents),
         |h AS (SELECT doc_id, $hits FROM t)
         |SELECT doc_id, hits_en, hits_es, hits_fr, hits_de,
         |  CASE WHEN hits_en > 0 AND hits_en >= hits_es AND hits_en >= hits_fr AND hits_en >= hits_de THEN 'en'
         |       WHEN hits_es > 0 AND hits_es >= hits_fr AND hits_es >= hits_de THEN 'es'
         |       WHEN hits_fr > 0 AND hits_fr >= hits_de THEN 'fr'
         |       WHEN hits_de > 0 THEN 'de'
         |       ELSE 'unk' END AS lang_guess
         |FROM h""".stripMargin
    },
    "q33_quality_score" ->
      s"""SELECT doc_id,
         |  $duckQuality AS quality,
         |  CASE WHEN $duckQuality < 0.55 THEN 1 ELSE 0 END AS low_quality
         |FROM (SELECT doc_id, $duckToks AS tk FROM documents) t""".stripMargin,
    "q127_gopher_rules" ->
      s"""WITH ${duckGopherCTEs("documents")}
         |SELECT doc_id, n_words, mean_word_len, frac_symbol, frac_alpha, frac_bullet,
         |  frac_ellipsis, n_stop, r_words, r_mean_len, r_symbol, r_alpha, r_bullet,
         |  r_ellipsis, r_stop, gopher_pass
         |FROM gop""".stripMargin,
    "q128_nfc_normalize" ->
      s"""SELECT doc_id, nfc_normalize(text) AS text_nfc,
         |  CAST(length(nfc_normalize(text)) AS BIGINT) AS n_chars_nfc
         |FROM documents""".stripMargin,
    "q131_repetition_rules" -> {
      val topFlags = TextOps.TopNgramMax.toSeq.sortBy(_._1).map { case (n, mx) =>
        s"  CAST(top_${n}gram_frac <= $mx AS INT) AS r_top_${n}gram"
      }
      val dupFlags = TextOps.DupNgramMax.toSeq.sortBy(_._1).map { case (n, mx) =>
        s"  CAST(dup_${n}gram_frac <= $mx AS INT) AS r_dup_${n}gram"
      }
      val allFlagNames = Seq("r_dup_line", "r_dup_line_char") ++
        TextOps.TopNgramMax.keys.toSeq.sorted.map(n => s"r_top_${n}gram") ++
        TextOps.DupNgramMax.keys.toSeq.sorted.map(n => s"r_dup_${n}gram")
      s"""WITH ${duckRepetitionCTEs("documents")}
         |SELECT doc_id, dup_line_frac, dup_line_char_frac,
         |  ${TextOps.TopNgramMax.keys.toSeq.sorted.map(n => s"top_${n}gram_frac").mkString(", ")},
         |  ${TextOps.DupNgramMax.keys.toSeq.sorted.map(n => s"dup_${n}gram_frac").mkString(", ")},
         |  CAST(dup_line_frac <= 0.30 AS INT) AS r_dup_line,
         |  CAST(dup_line_char_frac <= 0.20 AS INT) AS r_dup_line_char,
         |${(topFlags ++ dupFlags).mkString(",\n")},
         |  CAST(${allFlagNames.mkString(" * ")} AS INT) AS rep_pass
         |FROM rep_stats""".stripMargin
    },
    "q34_fingerprint" ->
      s"""SELECT doc_id, ${duckTokHash("text")} AS fingerprint FROM documents""",
    "q35_minhash_sigs" -> {
      val cols = (0 until NumSig).map(i => s"sig[${i + 1}] AS s$i").mkString(", ")
      s"""WITH $duckSigsCTE
         |SELECT doc_id, $cols FROM sigs""".stripMargin
    },
    "q36_simhash" ->
      s"""WITH $duckSimhashCTE
         |SELECT doc_id, simhash FROM sim""".stripMargin,
    "q90_simhash_pairs" -> {
      val bits32 = (0 until 32).map(b =>
        s"CASE WHEN list_sum(list_transform(hh, h -> ((h >> $b) & 1) * 2 - 1)) > 0 THEN ${1L << b} ELSE 0 END")
        .mkString(" + ")
      s"""WITH $duckSigsCTE,
         |sim AS (SELECT doc_id, $bits32 AS simhash FROM hs),
         |bands AS (SELECT doc_id, simhash, j.b AS band, (simhash >> (16 * j.b)) & 65535 AS bkey
         |          FROM sim, (SELECT unnest(range(0, 2)) AS b) j),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |           x.simhash AS sh_a, y.simhash AS sh_b
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
         |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 1""".stripMargin
    },
    "q37_neardup_minhash" ->
      s"""WITH $duckNeardupCTEs
         |SELECT doc_a, doc_b, est_jaccard, jaccard FROM scored WHERE jaccard >= 0.4""".stripMargin,
    // q207: the q37 chain restricted to cross-split (history × incoming)
    // pairs — the oracle recomputes everything from the corpus; the hash
    // match proves the persisted-index ingest path returns exactly the
    // pairs a from-scratch run would.
    "q207_incremental_dedup" ->
      s"""WITH $duckSigsCTE,
         |hist AS (SELECT * FROM sigs WHERE doc_id % 5 <> 0),
         |inc AS (SELECT * FROM sigs WHERE doc_id % 5 = 0),
         |hb AS (SELECT doc_id, i.j AS band_id, sig[2*i.j + 1] AS k0, sig[2*i.j + 2] AS k1
         |       FROM hist, (SELECT unnest(range(0, $NumBands)) AS j) i),
         |ib AS (SELECT doc_id, i.j AS band_id, sig[2*i.j + 1] AS k0, sig[2*i.j + 2] AS k1
         |       FROM inc, (SELECT unnest(range(0, $NumBands)) AS j) i),
         |cand AS (SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS old_id
         |         FROM ib x JOIN hb y
         |           ON x.band_id = y.band_id AND x.k0 = y.k0 AND x.k1 = y.k1),
         |scored AS (
         |  SELECT c.new_id, c.old_id,
         |    ${fpRound4Sql(s"list_sum(list_transform(range(1, ${NumSig + 1}), " +
                  s"i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END))::DOUBLE / $NumSig")} AS est_jaccard,
         |    ${fpRound4Sql("len(list_intersect(a.hh, b.hh))::DOUBLE / " +
                  "(len(a.hh) + len(b.hh) - len(list_intersect(a.hh, b.hh)))")} AS jaccard
         |  FROM cand c
         |  JOIN inc a ON a.doc_id = c.new_id
         |  JOIN hist b ON b.doc_id = c.old_id)
         |SELECT new_id AS doc_id, old_id AS dup_of, est_jaccard, jaccard
         |FROM scored WHERE jaccard >= 0.4""".stripMargin,
    // q208: the parallel-rounds greedy MIS unrolled in SQL — each round
    // admits the local minima of the remaining verified-pair graph
    // (lm = lo's never appearing as hi), rejects their neighbors (rj),
    // and drops decided docs from the pair set; rounds past convergence
    // are no-ops on an empty pair set, so the fixed unroll equals the
    // data-dependent loop whenever the Spark side converged (and the
    // Spark side THROWS past MisRounds, so the two can never silently
    // disagree). dup_of is the same post-pass as Spark's: min admitted
    // smaller neighbor over the full pair set.
    "q208_greedy_dedup_canon" -> {
      val rounds = (1 to MisRounds).map { r =>
        s"""lm$r AS MATERIALIZED (SELECT DISTINCT lo AS v FROM p${r - 1}
           |  WHERE lo NOT IN (SELECT hi FROM p${r - 1})),
           |rj$r AS MATERIALIZED (SELECT DISTINCT p.hi AS v FROM p${r - 1} p
           |  WHERE p.lo IN (SELECT v FROM lm$r)),
           |p$r AS MATERIALIZED (SELECT lo, hi FROM p${r - 1}
           |  WHERE lo NOT IN (SELECT v FROM lm$r) AND lo NOT IN (SELECT v FROM rj$r)
           |    AND hi NOT IN (SELECT v FROM lm$r) AND hi NOT IN (SELECT v FROM rj$r))""".stripMargin
      }.mkString(",\n")
      val rejUnion = (1 to MisRounds).map(r => s"SELECT v FROM rj$r").mkString(" UNION ALL ")
      s"""WITH $duckNeardupCTEs,
         |p0 AS MATERIALIZED (SELECT doc_a AS lo, doc_b AS hi FROM scored
         |  WHERE jaccard >= $NearDupTheta),
         |$rounds,
         |rejected AS MATERIALIZED (SELECT DISTINCT v AS doc_id FROM ($rejUnion)),
         |dup AS (SELECT p.hi AS doc_id, min(p.lo) AS dup_of FROM p0 p
         |  WHERE p.hi IN (SELECT doc_id FROM rejected)
         |    AND p.lo NOT IN (SELECT doc_id FROM rejected)
         |  GROUP BY p.hi)
         |SELECT s.doc_id,
         |  CAST(CASE WHEN r.doc_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS admitted,
         |  d.dup_of
         |FROM sigs s
         |LEFT JOIN rejected r ON r.doc_id = s.doc_id
         |LEFT JOIN dup d ON d.doc_id = s.doc_id""".stripMargin
    },
    // q142: DuckDB median == quantile_cont(0.5) == Spark's interpolated
    // exact percentile; halves are exact doubles, 4dp-floored anyway
    "q142_robust_stats" -> duckRobustStatsSql,
    // q198: the two-phase selection twin returns IDENTICAL rows — the
    // same oracle pins that exactness claim from the DuckDB side too.
    "q198_robust_twophase" -> duckRobustStatsSql,
    "q143_window_ranks" ->
      s"""WITH d AS (SELECT source, doc_id,
         |    CAST(len($duckToks) AS BIGINT) AS n_tokens FROM documents)
         |SELECT source, doc_id, n_tokens,
         |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
         |  ${fpRound4Sql("percent_rank() OVER w")} AS pct_rank,
         |  ${fpRound4Sql("cume_dist() OVER w")} AS cum_dist
         |FROM d
         |WINDOW w AS (PARTITION BY source ORDER BY n_tokens, doc_id)
         |ORDER BY source, n_tokens, doc_id""".stripMargin,
    // q144: q129's CTE chain aggregated per unordered source pair
    "q144_source_overlap" -> {
      val W = DecontamWindow
      s"""WITH toks AS (SELECT doc_id, source, $duckToks AS tk FROM documents),
         |w AS (SELECT doc_id, source,
         |    list_distinct(list_transform(range(1, len(tk) - ${W - 2}),
         |    wi -> ${duckTokHash(s"array_to_string(tk[wi:wi+${W - 1}], ' ')")})) AS whs
         |  FROM toks WHERE len(tk) >= $W),
         |wins AS (SELECT doc_id, source, unnest(whs) AS h FROM w),
         |shared AS (SELECT h FROM wins GROUP BY h
         |           HAVING count(*) >= 2 AND count(*) <= $SubstrDupDfCap),
         |hits AS (SELECT doc_id, source, h FROM wins JOIN shared USING (h))
         |SELECT least(x.source, y.source) AS src_a,
         |  greatest(x.source, y.source) AS src_b,
         |  CAST(count(*) AS BIGINT) AS n_shared
         |FROM hits x JOIN hits y ON x.h = y.h AND x.doc_id < y.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    // q145: the same deterministic v2 derivation, diffed relationally
    "q145_version_diff" ->
      s"""WITH v1 AS (SELECT doc_id, ${duckTokHash("text")} AS h1 FROM documents),
         |v2base AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2marker' ELSE text END AS text
         |  FROM documents WHERE doc_id % 11 <> 0
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, text
         |  FROM documents WHERE doc_id % 13 = 0),
         |v2 AS (SELECT doc_id, ${duckTokHash("text")} AS h2 FROM v2base)
         |SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
         |  CASE WHEN v1.doc_id IS NULL THEN 'added'
         |       WHEN v2.doc_id IS NULL THEN 'removed'
         |       WHEN h1 <> h2 THEN 'changed'
         |       ELSE 'unchanged' END AS status
         |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
         |ORDER BY doc_id""".stripMargin,
    // q146: the oracle computes each source's profile in ONE direct
    // pass — no shards — so the hash match proves the two-level
    // shard-then-merge decomposition equals single-pass semantics.
    // Same closed forms: mean = Σx/n, var = (n·Σx² − (Σx)²)/n², both
    // from exact integer sums, one final double division, 4dp floor.
    "q146_mergeable_profile" ->
      s"""WITH t AS (SELECT source, len($duckToks)::BIGINT AS n,
         |    ${duckTokHash("text")} AS h FROM documents)
         |SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
         |  CAST(min(n) AS BIGINT) AS min_tokens,
         |  CAST(max(n) AS BIGINT) AS max_tokens,
         |  ${fpRound4Sql("CAST(sum(n) AS DOUBLE) / count(*)")} AS mean_tokens,
         |  ${fpRound4Sql(
           "CAST(count(*) * sum(n * n) - sum(n) * sum(n) AS DOUBLE) / (count(*) * count(*))")}
         |    AS var_tokens
         |FROM t GROUP BY source ORDER BY source""".stripMargin,
    // q147: same total order (freq desc, token asc) on both engines,
    // cumulative coverage from exact integer sums, one division, 4dp
    // floor. The subquery total is the corpus token-stream size.
    "q147_vocab_coverage" ->
      s"""WITH toks AS (SELECT unnest($duckToks) AS t FROM documents),
         |cnt AS (SELECT t, count(*) AS freq FROM toks GROUP BY t),
         |ranked AS (SELECT t, freq,
         |    row_number() OVER (ORDER BY freq DESC, t) AS rank,
         |    sum(freq) OVER (ORDER BY freq DESC, t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM cnt)
         |SELECT CAST(rank AS BIGINT) AS rank, t AS token,
         |  CAST(freq AS BIGINT) AS freq,
         |  ${fpRound4Sql(
           "CAST(cum AS DOUBLE) / (SELECT sum(freq) FROM cnt)")} AS cum_coverage
         |FROM ranked WHERE rank <= $VocabTopK ORDER BY rank""".stripMargin,
    // q148: q141's recursive components rolled up to the size grain —
    // the iterative CC result is what's being hash-verified, again
    "q148_cluster_sizes" ->
      s"""WITH RECURSIVE $duckNeardupCTEs,
         |pairs AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= $NearDupTheta),
         |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |        UNION SELECT doc_b, doc_a FROM pairs),
         |reach(n, m) AS (
         |  SELECT a, a FROM sym
         |  UNION SELECT a, b FROM sym
         |  UNION SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a),
         |comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n),
         |cl AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster
         |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
         |sizes AS (SELECT cluster, count(*) AS sz FROM cl GROUP BY cluster)
         |SELECT CAST(sz AS BIGINT) AS cluster_size,
         |  CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(sz * count(*) AS BIGINT) AS n_docs,
         |  CAST((sz - 1) * count(*) AS BIGINT) AS n_removable
         |FROM sizes GROUP BY sz ORDER BY sz""".stripMargin,
    // q149: both shared battery CTE chains composed relationally, the
    // same funnel sums, the same corpus-wide first-wins dedup window
    "q149_gate_funnel" ->
      s"""WITH ${duckGopherCTEs("documents")},
         |${duckRepetitionCTEs("documents")},
         |flags AS (
         |  SELECT d.doc_id, d.source, ${duckTokHash("d.text")} AS h,
         |    g.gopher_pass AS gp,
         |    CASE WHEN $duckRepPassCond THEN 1 ELSE 0 END AS rp
         |  FROM documents d
         |  JOIN gop g ON g.doc_id = d.doc_id
         |  JOIN rep_stats rs ON rs.doc_id = d.doc_id),
         |surv AS (
         |  SELECT source, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
         |  FROM flags WHERE gp = 1 AND rp = 1),
         |base AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_total,
         |    CAST(sum(gp) AS BIGINT) AS n_gopher,
         |    CAST(sum(rp) AS BIGINT) AS n_rep,
         |    CAST(sum(gp * rp) AS BIGINT) AS n_gate
         |  FROM flags GROUP BY source),
         |uniq AS (SELECT source, CAST(count(*) AS BIGINT) AS n_unique
         |  FROM surv WHERE rn = 1 GROUP BY source)
         |SELECT b.source, n_total, n_gopher, n_rep, n_gate,
         |  COALESCE(n_unique, 0) AS n_unique
         |FROM base b LEFT JOIN uniq USING (source) ORDER BY b.source""".stripMargin,
    // q150: identical milli-quantization, floor-centroid, and long
    // distance arithmetic — dim indexes differ (0- vs 1-based) but are
    // only join keys WITHIN each engine, so alignment is unaffected.
    // The CAST AS DOUBLE before the multiply is load-bearing: DuckDB
    // keeps FLOAT * 1000.0 in FLOAT (the literal demotes), which
    // rounds half-milli values the double product resolves.
    "q150_embed_prune" ->
      s"""WITH dims AS (
         |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
         |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000.0 + 0.5) AS BIGINT) AS vm
         |  FROM embeddings),
         |cent AS (SELECT label, dim,
         |    CAST(floor(CAST(sum(vm) AS DOUBLE) / count(*)) AS BIGINT) AS cent
         |  FROM dims GROUP BY label, dim),
         |d2 AS (SELECT vec_id, d.label, sum((vm - cent) * (vm - cent)) AS d2
         |  FROM dims d JOIN cent c ON c.label = d.label AND c.dim = d.dim
         |  GROUP BY vec_id, d.label),
         |rk AS (SELECT vec_id, label, d2,
         |    row_number() OVER (PARTITION BY label ORDER BY d2 DESC, vec_id) AS rk,
         |    count(*) OVER (PARTITION BY label) AS nl
         |  FROM d2)
         |SELECT vec_id, label, CAST(d2 AS BIGINT) AS d2,
         |  CAST(rk <= greatest(1, nl * 10 // 100) AS INT) AS pruned
         |FROM rk ORDER BY vec_id""".stripMargin,
    // q151: same pattern text (dialect intersection), same join-and-
    // hash over the whole pretoken sequence — boundary-exact compare
    "q151_pretokenize" -> {
      // DuckDB single-quoted strings keep backslashes literal — embed
      // the shared pattern verbatim, no re-escaping
      s"""WITH a AS (SELECT doc_id,
         |    text || ' v' || CAST(doc_id AS VARCHAR) ||
         |      '.25 don''t stop!! a1b2 --ok' AS text
         |  FROM documents),
         |p AS (SELECT doc_id,
         |    regexp_extract_all(text, '$PretokRe') AS pt,
         |    $duckToks AS ws
         |  FROM a)
         |SELECT doc_id,
         |  CAST(len(pt) AS BIGINT) AS n_pretok,
         |  CAST(len(ws) AS BIGINT) AS n_ws,
         |  ${fpRound4Sql(
           "CASE WHEN len(ws) > 0 THEN CAST(len(pt) AS DOUBLE) / len(ws) ELSE 0.0 END")} AS fertility,
         |  ${duckTokHash("array_to_string(pt, '|')")} AS boundary_hash
         |FROM p ORDER BY doc_id""".stripMargin
    },
    // q152: the q96 BM25 chain over the indexed subset, the q38 cosine
    // ranking, both truncated at depth 50, fused by integer-floored
    // reciprocal ranks — the double division 10⁶/(60+rank) is the same
    // IEEE operation on the same operands in both engines
    "q152_hybrid_rrf" ->
      s"""WITH $duckRrfCTEs
         |SELECT doc_id, CAST(rank_lex AS BIGINT) AS rank_lex,
         |  CAST(rank_vec AS BIGINT) AS rank_vec, CAST(rrf AS BIGINT) AS rrf
         |FROM f ORDER BY rrf DESC, doc_id LIMIT $RrfOut""".stripMargin,
    // q257: same leg CTEs, same bounded pair join over the shared set,
    // same double chain and sentinel, same exact-integer Jaccard;
    // `shared` is referenced twice — MATERIALIZED (the kcore lesson)
    "q257_rank_agreement" ->
      s"""WITH $duckRrfCTEs,
         |shared AS MATERIALIZED (SELECT l.doc_id,
         |    CAST(l.rank_lex AS BIGINT) AS rank_lex,
         |    CAST(v.rank_vec AS BIGINT) AS rank_vec
         |  FROM lex l JOIN vec v ON l.doc_id = v.doc_id),
         |nl AS (SELECT CAST(count(*) AS BIGINT) AS n_lex FROM lex),
         |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vec FROM vec),
         |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_shared FROM shared),
         |pr AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |    CAST(coalesce(sum(CASE WHEN sg > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS conc,
         |    CAST(coalesce(sum(CASE WHEN sg < 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS disc
         |  FROM (SELECT sign(b.rank_lex - a.rank_lex) * sign(b.rank_vec - a.rank_vec) AS sg
         |    FROM shared a JOIN shared b ON a.doc_id < b.doc_id))
         |SELECT n_lex, n_vec, n_shared, n_pairs, conc, disc,
         |  CASE WHEN n_shared < 2 THEN CAST(-2000000 AS BIGINT)
         |    ELSE CAST(floor(CAST(conc - disc AS DOUBLE)
         |      / (CAST(n_shared AS DOUBLE) * (CAST(n_shared AS DOUBLE) - 1.0) / 2.0)
         |      * 1000000.0 + 0.5) AS BIGINT) END AS tau_micro,
         |  CASE WHEN n_lex + n_vec = n_shared THEN CAST(-2000000 AS BIGINT)
         |    ELSE (n_shared * 1000000) // (n_lex + n_vec - n_shared) END AS jaccard_micro
         |FROM ns, pr, nl, nv""".stripMargin,
    // q262: same 1e6 grid, same exact HUGEINT moments (DuckDB's
    // sum(BIGINT) is int128 — the Spark side's DECIMAL(38,0) twin),
    // same identical-order double chain nano-floored per dim before
    // the exact per-pair sum
    "q262_frechet_slices" ->
      s"""WITH ex AS (SELECT label, unnest(lst).d AS dim, unnest(lst).q AS xq
         |  FROM (SELECT label::BIGINT AS label,
         |      list_transform(range(1, len(emb) + 1),
         |        i -> struct_pack(d := CAST(i - 1 AS BIGINT),
         |          q := CAST(floor(emb[i] * 1000000.0 + 0.5) AS BIGINT))) AS lst
         |    FROM (SELECT label, embedding::DOUBLE[] AS emb FROM embeddings))),
         |st AS MATERIALIZED (SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
         |    sum(xq) AS sx, sum(xq * xq) AS sxx
         |  FROM ex GROUP BY 1, 2),
         |terms AS (SELECT a.label AS label_a, b.label AS label_b,
         |    a.n AS na, b.n AS nb,
         |    CAST(floor((
         |      (CAST(a.sx AS DOUBLE) / CAST(a.n AS DOUBLE)
         |        - CAST(b.sx AS DOUBLE) / CAST(b.n AS DOUBLE))
         |      * (CAST(a.sx AS DOUBLE) / CAST(a.n AS DOUBLE)
         |        - CAST(b.sx AS DOUBLE) / CAST(b.n AS DOUBLE))
         |      + (CAST(a.n AS DOUBLE) * CAST(a.sxx AS DOUBLE)
         |          - CAST(a.sx AS DOUBLE) * CAST(a.sx AS DOUBLE))
         |        / (CAST(a.n AS DOUBLE) * CAST(a.n AS DOUBLE))
         |      + (CAST(b.n AS DOUBLE) * CAST(b.sxx AS DOUBLE)
         |          - CAST(b.sx AS DOUBLE) * CAST(b.sx AS DOUBLE))
         |        / (CAST(b.n AS DOUBLE) * CAST(b.n AS DOUBLE))
         |      - 2.0 * sqrt(
         |          (CAST(a.n AS DOUBLE) * CAST(a.sxx AS DOUBLE)
         |            - CAST(a.sx AS DOUBLE) * CAST(a.sx AS DOUBLE))
         |          / (CAST(a.n AS DOUBLE) * CAST(a.n AS DOUBLE))
         |          * ((CAST(b.n AS DOUBLE) * CAST(b.sxx AS DOUBLE)
         |            - CAST(b.sx AS DOUBLE) * CAST(b.sx AS DOUBLE))
         |          / (CAST(b.n AS DOUBLE) * CAST(b.n AS DOUBLE))))
         |    ) / 1000.0 + 0.5) AS BIGINT) AS term_nano
         |  FROM st a JOIN st b ON a.dim = b.dim AND a.label < b.label)
         |SELECT label_a, label_b, CAST(max(na) AS BIGINT) AS n_a,
         |  CAST(max(nb) AS BIGINT) AS n_b, CAST(count(*) AS BIGINT) AS n_dims,
         |  CAST(sum(term_nano) AS BIGINT) AS fid_nano
         |FROM terms GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q263: same leg CTEs; the prefix-overlap curve off a bounded depth
    // grid, each term the identical pure-integer division (no float on
    // either engine — the dyadic-p design), exact long total
    "q263_rbo_legs" ->
      s"""WITH $duckRrfCTEs,
         |shared AS MATERIALIZED (SELECT l.doc_id,
         |    CAST(l.rank_lex AS BIGINT) AS rank_lex,
         |    CAST(v.rank_vec AS BIGINT) AS rank_vec
         |  FROM lex l JOIN vec v ON l.doc_id = v.doc_id),
         |grid AS (SELECT CAST(unnest(range(1, ${RrfDepth + 1})) AS BIGINT) AS depth),
         |od AS (SELECT g.depth, CAST(count(s.doc_id) AS BIGINT) AS o_d
         |  FROM grid g LEFT JOIN shared s
         |    ON s.rank_lex <= g.depth AND s.rank_vec <= g.depth
         |  GROUP BY g.depth),
         |terms AS MATERIALIZED (SELECT depth, o_d,
         |    (o_d * 1000000000) // ((1::BIGINT << depth) * depth) AS term_nano
         |  FROM od),
         |tot AS (SELECT CAST(sum(term_nano) AS BIGINT) AS rbo_nano FROM terms)
         |SELECT depth, o_d, term_nano, rbo_nano FROM terms CROSS JOIN tot
         |ORDER BY depth""".stripMargin,
    // q243: same doubled-grid midranks per variable (integer-grid
    // histograms + cumulative), same exact moments, same closed form
    "q243_spearman" ->
      s"""WITH b AS (SELECT doc_id, len(tk) AS x, len(list_distinct(tk)) AS y
         |  FROM (SELECT doc_id, $duckToks AS tk FROM documents)),
         |gx AS (SELECT x, count(*) AS m,
         |    2 * coalesce(sum(count(*)) OVER (ORDER BY x
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      + count(*) + 1 AS r2_x
         |  FROM b GROUP BY x),
         |gy AS (SELECT y, count(*) AS m,
         |    2 * coalesce(sum(count(*)) OVER (ORDER BY y
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      + count(*) + 1 AS r2_y
         |  FROM b GROUP BY y),
         |r AS (SELECT b.doc_id, gx.r2_x, gy.r2_y
         |  FROM b JOIN gx USING (x) JOIN gy USING (y)),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(r2_x) AS BIGINT) AS sx, CAST(sum(r2_y) AS BIGINT) AS sy,
         |    CAST(sum(r2_x * r2_x) AS BIGINT) AS sxx,
         |    CAST(sum(r2_x * r2_y) AS BIGINT) AS sxy,
         |    CAST(sum(r2_y * r2_y) AS BIGINT) AS syy FROM r)
         |SELECT n, sx AS rank2_sum_x, sy AS rank2_sum_y,
         |  CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         |    / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
         |      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
         |    * 1000000.0 + 0.5) AS BIGINT) AS spearman_micro
         |FROM m""".stripMargin,
    // q250: same dense value grid, same two dominance windows, same
    // widened sums (DuckDB's sum(BIGINT) is already HUGEINT-exact), and
    // the identical-order double chain with the same degenerate sentinel
    "q250_kendall_tau" ->
      s"""WITH b AS (SELECT len(tk) AS x, len(list_distinct(tk)) AS y
         |  FROM (SELECT $duckToks AS tk FROM documents)),
         |cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
         |yb AS (SELECT min(y) AS ylo, max(y) AS yhi FROM cells),
         |dense AS (SELECT xs.x, yr.y, coalesce(cells.c, 0) AS c
         |  FROM (SELECT DISTINCT x FROM cells) xs
         |  CROSS JOIN (SELECT unnest(range(ylo, yhi + 1)) AS y FROM yb) yr
         |  LEFT JOIN cells ON cells.x = xs.x AND cells.y = yr.y),
         |a AS (SELECT x, y, c,
         |    coalesce(sum(c) OVER (PARTITION BY y ORDER BY x
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a
         |  FROM dense),
         |dom AS (SELECT x, y, c, a,
         |    coalesce(sum(a) OVER (PARTITION BY x ORDER BY y
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS dlt,
         |    sum(a) OVER (PARTITION BY x) AS atot
         |  FROM a),
         |cd AS (SELECT CAST(sum(c) AS BIGINT) AS n,
         |    CAST(sum(c * dlt) AS BIGINT) AS conc,
         |    CAST(sum(c * (atot - dlt - a)) AS BIGINT) AS disc
         |  FROM dom WHERE c > 0),
         |tx AS (SELECT CAST(coalesce(sum(t * (t - 1)), 0) AS BIGINT) AS tie2_x
         |  FROM (SELECT sum(c) AS t FROM cells GROUP BY x)),
         |ty AS (SELECT CAST(coalesce(sum(t * (t - 1)), 0) AS BIGINT) AS tie2_y
         |  FROM (SELECT sum(c) AS t FROM cells GROUP BY y))
         |SELECT n, conc, disc, tie2_x, tie2_y,
         |  CASE WHEN CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
         |        - CAST(tie2_x AS DOUBLE) <= 0.0
         |      OR CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
         |        - CAST(tie2_y AS DOUBLE) <= 0.0
         |    THEN CAST(-2000000 AS BIGINT)
         |    ELSE CAST(floor(2.0 * (CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
         |      / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
         |          - CAST(tie2_x AS DOUBLE))
         |        * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
         |          - CAST(tie2_y AS DOUBLE)))
         |      * 1000000.0 + 0.5) AS BIGINT)
         |  END AS tau_b_micro
         |FROM cd, tx, ty""".stripMargin,
    // q246: same two gate conjunctions over the shared rule CTEs, same
    // exact 2x2 counts and double chains
    "q246_cohen_kappa" -> {
      s"""WITH ${duckGopherCTEs("documents")},
         |${duckRepetitionCTEs("documents")},
         |flags AS (SELECT d.doc_id,
         |    CASE WHEN gop.r_words * gop.r_mean_len * gop.r_symbol * gop.r_alpha
         |        * gop.r_bullet * gop.r_ellipsis = 1 THEN 1 ELSE 0 END AS ga,
         |    CASE WHEN $duckRepPassCond THEN 1 ELSE 0 END AS gb
         |  FROM documents d
         |  JOIN gop ON gop.doc_id = d.doc_id
         |  JOIN rep_stats rs ON rs.doc_id = d.doc_id),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(ga * gb) AS BIGINT) AS n11,
         |    CAST(sum(ga * (1 - gb)) AS BIGINT) AS n10,
         |    CAST(sum((1 - ga) * gb) AS BIGINT) AS n01,
         |    CAST(sum((1 - ga) * (1 - gb)) AS BIGINT) AS n00 FROM flags)
         |SELECT n, n11, n10, n01, n00,
         |  CAST(floor(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
         |    * 1000000.0 + 0.5) AS BIGINT) AS po_micro,
         |  CAST(floor((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
         |      + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
         |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
         |    * 1000000.0 + 0.5) AS BIGINT) AS pe_micro,
         |  CAST(floor((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
         |      - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
         |        + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
         |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
         |    / (1.0 - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
         |        + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
         |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
         |    * 1000000.0 + 0.5) AS BIGINT) AS kappa_micro
         |FROM m""".stripMargin
    },
    // q247: same fused run, relevance = distinct query terms present,
    // gains micro-floored per position BEFORE the exact sums, ideal off
    // the bounded relevance histogram (no sort)
    "q247_ndcg_retrieval" ->
      s"""WITH $duckRrfCTEs,
         |run AS (SELECT doc_id, row_number() OVER (ORDER BY rrf DESC, doc_id) AS pos
         |  FROM f QUALIFY pos <= $RrfOut),
         |rel AS (SELECT u.doc_id,
         |    CAST(coalesce(t.r, 0) AS BIGINT) AS rel
         |  FROM u LEFT JOIN (SELECT doc_id, count(DISTINCT tok) AS r FROM tf
         |    WHERE tf > 0 GROUP BY doc_id) t ON t.doc_id = u.doc_id),
         |scored AS (SELECT run.pos, run.doc_id, rel.rel,
         |    CAST(floor(CAST(rel.rel AS DOUBLE)
         |      / (ln(CAST(run.pos + 1 AS DOUBLE)) / ln(2.0))
         |      * 1000000.0 + 0.5) AS BIGINT) AS gain_micro
         |  FROM run JOIN rel USING (doc_id)),
         |dcg AS (SELECT CAST(sum(gain_micro) AS BIGINT) AS dcg_micro FROM scored),
         |hist AS (SELECT rel, CAST(count(*) AS BIGINT) AS n FROM rel GROUP BY rel),
         |ideal AS (SELECT p,
         |    CASE WHEN p <= coalesce((SELECT n FROM hist WHERE rel = 3), 0) THEN 3
         |         WHEN p <= coalesce((SELECT n FROM hist WHERE rel = 3), 0)
         |                 + coalesce((SELECT n FROM hist WHERE rel = 2), 0) THEN 2
         |         WHEN p <= coalesce((SELECT n FROM hist WHERE rel = 3), 0)
         |                 + coalesce((SELECT n FROM hist WHERE rel = 2), 0)
         |                 + coalesce((SELECT n FROM hist WHERE rel = 1), 0) THEN 1
         |         ELSE 0 END AS irel
         |  FROM (SELECT unnest(range(1, ${RrfOut + 1})) AS p)),
         |idcg AS (SELECT CAST(sum(CAST(floor(CAST(irel AS DOUBLE)
         |    / (ln(CAST(p + 1 AS DOUBLE)) / ln(2.0))
         |    * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS idcg_micro
         |  FROM ideal WHERE irel > 0)
         |SELECT pos, doc_id, rel, gain_micro, dcg_micro, idcg_micro,
         |  CAST(floor(CAST(dcg_micro AS DOUBLE) / CAST(idcg_micro AS DOUBLE)
         |    * 1000000.0 + 0.5) AS BIGINT) AS ndcg_micro
         |FROM scored, dcg, idcg ORDER BY pos""".stripMargin,
    // q153: gate vector — zlib has no relational twin; the corpus-
    // derived count keeps the row honest, the zeros pin the invariants
    "q153_compress_ratio" ->
      """SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
        |  CAST(0 AS BIGINT) AS n_invalid,
        |  CAST(0 AS BIGINT) AS n_double_worse,
        |  1 AS spread_gate""".stripMargin,
    // q141: q71's recursive components + the cluster-hash cut — the
    // oracle proves the SPLIT respects the clusters, not just the CC
    "q141_leakage_split" ->
      s"""WITH RECURSIVE $duckNeardupCTEs,
         |pairs AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= $NearDupTheta),
         |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |        UNION SELECT doc_b, doc_a FROM pairs),
         |reach(n, m) AS (
         |  SELECT a, a FROM sym
         |  UNION SELECT a, b FROM sym
         |  UNION SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a),
         |comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n)
         |SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster,
         |  CASE WHEN ${duckTokHash("CAST(COALESCE(c.component, d.doc_id) AS VARCHAR)")} % 10 < 8
         |    THEN 'train' ELSE 'test' END AS split
         |FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "q71_dedup_components" ->
      s"""WITH RECURSIVE $duckNeardupCTEs,
         |pairs AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.4),
         |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |        UNION SELECT doc_b, doc_a FROM pairs),
         |reach(n, m) AS (
         |  SELECT a, a FROM sym
         |  UNION SELECT a, b FROM sym
         |  UNION SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a)
         |SELECT n AS doc_id, min(m) AS component,
         |  CASE WHEN n = min(m) THEN 1 ELSE 0 END AS is_canonical
         |FROM reach GROUP BY n""".stripMargin,
    "q38_cosine_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < 8),
        |s AS (SELECT q_id, vec_id, round(list_cosine_similarity(emb, q_emb), 4) AS cos_sim
        |      FROM e, q WHERE vec_id <> q_id),
        |r AS (SELECT q_id, vec_id, cos_sim,
        |        row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rnk FROM s)
        |SELECT q_id, rnk, vec_id, cos_sim FROM r WHERE rnk <= 3""".stripMargin,
    // q270: same e/q CTEs and 4dp total order as q38, prefix slice via
    // DuckDB list slicing, exact hit counts and integer recall
    "q270_mrl_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < 8),
         |dims AS (SELECT CAST(unnest([${MrlDims.mkString(", ")}]) AS BIGINT) AS dim),
         |s AS (SELECT d.dim, q.q_id, e.vec_id,
         |    round(list_cosine_similarity(e.emb[1:d.dim], q.q_emb[1:d.dim]), 4) AS cos_sim
         |  FROM e, q, dims d WHERE e.vec_id <> q.q_id),
         |r AS (SELECT dim, q_id, vec_id, row_number() OVER (PARTITION BY dim, q_id
         |    ORDER BY cos_sim DESC, vec_id) AS rnk FROM s),
         |t3 AS (SELECT dim, q_id, vec_id FROM r WHERE rnk <= 3),
         |truth AS (SELECT q_id, vec_id FROM t3 WHERE dim = ${MrlDims.last}),
         |hits AS (SELECT t.dim, CAST(count(*) AS BIGINT) AS n_hits
         |  FROM t3 t JOIN truth u ON t.q_id = u.q_id AND t.vec_id = u.vec_id
         |  GROUP BY t.dim),
         |nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM q)
         |SELECT d.dim, nq.n_queries,
         |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  (CAST(coalesce(h.n_hits, 0) AS BIGINT) * 1000000) // (3 * nq.n_queries)
         |    AS recall_micro
         |FROM dims d CROSS JOIN nq LEFT JOIN hits h ON h.dim = d.dim
         |ORDER BY d.dim""".stripMargin,
    "q39_ann_lsh" -> {
      // adaptive width + Hamming-1 multi-probe, generated from the SAME
      // integer formulas as the Spark plan (EmbedLsh.adaptiveBits / .w)
      val bitsExpr = EmbedLsh.adaptiveBitsSql(
        EmbedLsh.AnnTarget, EmbedLsh.AnnMinBits, EmbedLsh.AnnMaxBits)
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |params AS (SELECT $bitsExpr AS bits FROM embeddings),
         |bv AS (
         |  SELECT vec_id,
         |    CASE WHEN list_dot_product(emb, ${EmbedLsh.wListSql("b.i")}) > 0
         |      THEN (1::BIGINT << b.i) ELSE 0::BIGINT END AS v
         |  FROM e, (SELECT unnest(range(0, (SELECT bits FROM params))) AS i) b),
         |bkt AS (SELECT vec_id, CAST(sum(v) AS BIGINT) AS bucket FROM bv GROUP BY 1),
         |eb AS (SELECT e.vec_id, e.emb, bkt.bucket FROM e JOIN bkt USING (vec_id)),
         |q AS (SELECT vec_id AS q_id, emb AS q_emb, bucket FROM eb WHERE vec_id < 8),
         |probes AS (
         |  SELECT q_id, q_emb,
         |    CASE WHEN p.i < 0 THEN bucket
         |         ELSE xor(bucket, (1::BIGINT << p.i)) END AS pkey
         |  FROM q, (SELECT unnest(range(-1, (SELECT bits FROM params))) AS i) p),
         |s AS (SELECT p.q_id, eb.vec_id,
         |        round(list_cosine_similarity(eb.emb, p.q_emb), 4) AS cos_sim
         |      FROM eb JOIN probes p ON eb.bucket = p.pkey AND eb.vec_id <> p.q_id),
         |r AS (SELECT q_id, vec_id, cos_sim,
         |        row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rnk FROM s)
         |SELECT q_id, rnk, vec_id, cos_sim FROM r WHERE rnk <= 3""".stripMargin
    },
    // q271: q39's identical adaptive buckets + Hamming-1 probes with
    // the WHOLE corpus as the query side, k = 5 under the same 4dp
    // order, (cnt DESC, label ASC) majority, exact integer rates
    "q271_knn_label_noise" -> {
      val bitsExpr = EmbedLsh.adaptiveBitsSql(
        EmbedLsh.AnnTarget, EmbedLsh.AnnMinBits, EmbedLsh.AnnMaxBits)
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
         |    CAST(label AS BIGINT) AS label FROM embeddings),
         |params AS (SELECT $bitsExpr AS bits FROM embeddings),
         |bv AS (
         |  SELECT vec_id,
         |    CASE WHEN list_dot_product(emb, ${EmbedLsh.wListSql("b.i")}) > 0
         |      THEN (1::BIGINT << b.i) ELSE 0::BIGINT END AS v
         |  FROM e, (SELECT unnest(range(0, (SELECT bits FROM params))) AS i) b),
         |bkt AS (SELECT vec_id, CAST(sum(v) AS BIGINT) AS bucket FROM bv GROUP BY 1),
         |eb AS (SELECT e.vec_id, e.emb, e.label, bkt.bucket
         |  FROM e JOIN bkt USING (vec_id)),
         |probes AS (
         |  SELECT vec_id AS q_id, emb AS q_emb, label AS q_label,
         |    CASE WHEN p.i < 0 THEN bucket
         |         ELSE xor(bucket, (1::BIGINT << p.i)) END AS pkey
         |  FROM eb, (SELECT unnest(range(-1, (SELECT bits FROM params))) AS i) p),
         |s AS (SELECT p.q_id, p.q_label, eb.vec_id, eb.label,
         |        round(list_cosine_similarity(eb.emb, p.q_emb), 4) AS cos_sim
         |      FROM eb JOIN probes p ON eb.bucket = p.pkey AND eb.vec_id <> p.q_id),
         |r AS (SELECT q_id, q_label, label,
         |        row_number() OVER (PARTITION BY q_id
         |          ORDER BY cos_sim DESC, vec_id) AS rnk FROM s),
         |votes AS (SELECT q_id, q_label, label, CAST(count(*) AS BIGINT) AS cnt
         |  FROM r WHERE rnk <= $KnnNoiseK GROUP BY 1, 2, 3),
         |maj AS (SELECT q_id, q_label, label AS maj_label FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |      ORDER BY cnt DESC, label ASC) AS mr FROM votes) WHERE mr = 1),
         |fl AS (SELECT q_id,
         |    CAST(CASE WHEN maj_label <> q_label THEN 1 ELSE 0 END AS BIGINT)
         |      AS flagged
         |  FROM maj)
         |SELECT e.label, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN fl.flagged IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_scored,
         |  CAST(coalesce(sum(fl.flagged), 0) AS BIGINT) AS n_flagged,
         |  CASE WHEN sum(CASE WHEN fl.flagged IS NOT NULL THEN 1 ELSE 0 END) > 0
         |    THEN (CAST(coalesce(sum(fl.flagged), 0) AS BIGINT) * 1000000)
         |      // CAST(sum(CASE WHEN fl.flagged IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    ELSE CAST(-2000000 AS BIGINT) END AS noise_micro
         |FROM e LEFT JOIN fl ON fl.q_id = e.vec_id
         |GROUP BY e.label ORDER BY e.label""".stripMargin
    },
    "q57_embed_neardup" -> {
      // band t draws planes t·BandMaxBits + b — the same namespace as
      // EmbedLsh.bandKeys — at the adaptive width from the same count
      val bitsExpr = EmbedLsh.adaptiveBitsSql(
        EmbedLsh.BandTarget, EmbedLsh.BandMinBits, EmbedLsh.BandMaxBits)
      val planeExpr = s"t.band_id * ${EmbedLsh.BandMaxBits} + b.i"
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |params AS (SELECT $bitsExpr AS bits FROM embeddings),
         |bv AS (
         |  SELECT vec_id, t.band_id,
         |    CASE WHEN list_dot_product(emb, ${EmbedLsh.wListSql(planeExpr)}) > 0
         |      THEN (1::BIGINT << b.i) ELSE 0::BIGINT END AS v
         |  FROM e,
         |    (SELECT unnest(range(0, ${EmbedLsh.NumBands})) AS band_id) t,
         |    (SELECT unnest(range(0, (SELECT bits FROM params))) AS i) b),
         |banded AS (
         |  SELECT vec_id, band_id, CAST(sum(v) AS BIGINT) AS bkey
         |  FROM bv GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS keep_id, y.vec_id AS dup_id
         |  FROM banded x JOIN banded y
         |    ON x.band_id = y.band_id AND x.bkey = y.bkey AND x.vec_id < y.vec_id),
         |scored AS (
         |  SELECT c.keep_id, c.dup_id,
         |    round(list_cosine_similarity(a.emb, b.emb), 4) AS cos_sim
         |  FROM cand c JOIN e a ON a.vec_id = c.keep_id JOIN e b ON b.vec_id = c.dup_id)
         |SELECT keep_id, dup_id, cos_sim FROM scored WHERE cos_sim >= 0.45""".stripMargin
    },
    "q58_bpe_tokens" ->
      raw"""SELECT doc_id,
           |  len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS ws_tokens,
           |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens,
           |  len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS bpe_vocab
           |FROM documents""".stripMargin,
    "q75_contamination" ->
      s"""WITH toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |d AS (SELECT doc_id, list_distinct($duckBigrams) AS bg
         |      FROM toks WHERE len(tk) >= 2),
         |ex AS (SELECT doc_id, unnest(bg) AS b FROM d),
         |sh AS (SELECT doc_id, ${duckTokHash("b")} AS h FROM ex),
         |rk AS (SELECT h FROM (SELECT h, count(*) AS df FROM sh GROUP BY h)
         |       WHERE df * 20 <= (SELECT count(*) FROM documents) AND df <= $AbsDfCap),
         |rare AS (SELECT s.doc_id, s.h FROM sh s JOIN rk ON s.h = rk.h),
         |ns AS (SELECT doc_id, count(*) AS n_sh FROM rare GROUP BY doc_id)
         |SELECT t.doc_id AS train_id, e.doc_id AS eval_id,
         |  CAST(count(*) AS BIGINT) AS n_shared,
         |  ${fpRound4Sql("count(*)::DOUBLE / ns.n_sh")} AS containment
         |FROM rare t JOIN rare e ON t.h = e.h
         |JOIN ns ON ns.doc_id = t.doc_id
         |WHERE t.doc_id % 10 <> 0 AND e.doc_id % 10 = 0
         |GROUP BY t.doc_id, e.doc_id, ns.n_sh
         |HAVING count(*) >= 3 AND count(*) * 2 >= ns.n_sh""".stripMargin,
    "q76_repetition" ->
      s"""WITH toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |b AS (SELECT doc_id, $duckBigrams AS bg FROM toks WHERE len(tk) >= 2),
         |ex AS (SELECT doc_id, len(bg) AS n_bg, unnest(bg) AS b FROM b),
         |c AS (SELECT doc_id, n_bg, b, count(*) AS cnt FROM ex GROUP BY 1, 2, 3)
         |SELECT doc_id, n_bg, CAST(max(cnt) AS BIGINT) AS top_cnt,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  ${fpRound4Sql("max(cnt)::DOUBLE / n_bg")} AS top_frac,
         |  ${fpRound4Sql("1.0 - count(*)::DOUBLE / n_bg")} AS dup_frac
         |FROM c GROUP BY 1, 2""".stripMargin,
    "q77_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, source, len($duckToks) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM t)
         |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  cum_before // $PackWindow AS pack_id,
         |  cum_before % $PackWindow AS offset_in_pack
         |FROM c""".stripMargin,
    "q80_source_mixture" ->
      s"""WITH t AS (SELECT source, count(*) AS n_docs,
         |  CAST(sum(len($duckToks)) AS BIGINT) AS toks
         |  FROM documents GROUP BY source),
         |tot AS (SELECT CAST(sum(toks) AS BIGINT) AS tot_toks,
         |  count(*) AS n_sources FROM t)
         |SELECT source, n_docs, toks,
         |  ${fpRound4Sql("toks::DOUBLE / tot_toks")} AS token_share,
         |  ${fpRound4Sql("tot_toks::DOUBLE / (n_sources * toks)")} AS uniform_weight
         |FROM t, tot""".stripMargin,
    "q85_corpus_pipeline" -> {
      val qualityExpr = duckQuality
      s"""WITH toks AS (SELECT doc_id, text, source, $duckToks AS tk FROM documents),
         |base AS (SELECT * FROM toks WHERE len(tk) >= 2),
         |qual AS (SELECT doc_id, text, source, tk, $qualityExpr AS quality
         |         FROM base WHERE $qualityExpr >= 0.55),
         |reps AS (SELECT min(doc_id) AS doc_id FROM qual GROUP BY sha256(text)),
         |dedup AS (SELECT q.* FROM qual q JOIN reps r ON q.doc_id = r.doc_id),
         |cbg AS (SELECT doc_id, list_distinct($duckBigrams) AS bg
         |        FROM toks WHERE len(tk) >= 2),
         |cex AS (SELECT doc_id, unnest(bg) AS b FROM cbg),
         |csh AS (SELECT doc_id, ${duckTokHash("b")} AS h FROM cex),
         |crk AS (SELECT h FROM (SELECT h, count(*) AS df FROM csh GROUP BY h)
         |        WHERE df * 20 <= (SELECT count(*) FROM documents) AND df <= $AbsDfCap),
         |crare AS (SELECT s.doc_id, s.h FROM csh s JOIN crk ON s.h = crk.h),
         |cns AS (SELECT doc_id, count(*) AS n_sh FROM crare GROUP BY doc_id),
         |flagged AS (SELECT DISTINCT doc_id FROM (
         |  SELECT t.doc_id AS doc_id
         |  FROM crare t JOIN crare e ON t.h = e.h
         |  JOIN cns ON cns.doc_id = t.doc_id
         |  WHERE t.doc_id % 10 <> 0 AND e.doc_id % 10 = 0
         |  GROUP BY t.doc_id, e.doc_id, cns.n_sh
         |  HAVING count(*) >= 3 AND count(*) * 2 >= cns.n_sh)),
         |clean AS (SELECT * FROM dedup
         |  WHERE doc_id % 10 <> 0 AND doc_id NOT IN (SELECT doc_id FROM flagged)),
         |packed AS (SELECT doc_id, source, len(tk) AS n_tokens, quality,
         |  CAST(coalesce(sum(len(tk)) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM clean)
         |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens, quality,
         |  cum_before // $PackWindow AS pack_id
         |FROM packed""".stripMargin
    },
    "q86_hash_sample" -> {
      val keyExpr = "source || '|' || CAST(doc_id AS VARCHAR)"
      s"""SELECT doc_id, source, ${duckTokHash(s"($keyExpr)")} % 100 AS bucket
         |FROM documents
         |WHERE ${duckTokHash(s"($keyExpr)")} % 100 < 20""".stripMargin
    },
    "q87_doc_emb_join" -> {
      s"""WITH d AS (SELECT doc_id, $duckQuality AS quality
         |  FROM (SELECT doc_id, $duckToks AS tk FROM documents) t),
         |e AS (SELECT vec_id AS doc_id, label,
         |  round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 4) AS l2_norm
         |  FROM embeddings)
         |SELECT d.doc_id, d.quality, e.l2_norm, e.label
         |FROM d JOIN e ON d.doc_id = e.doc_id""".stripMargin
    },
    "q79_length_prune" ->
      s"""WITH t AS (SELECT doc_id, source, len($duckToks) AS n_tokens FROM documents),
         |r AS (SELECT doc_id, source, n_tokens,
         |  percent_rank() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS pr
         |  FROM t)
         |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  ${fpRound4Sql("pr")} AS len_rank,
         |  CASE WHEN pr >= 0.1 AND pr <= 0.9 THEN 1 ELSE 0 END AS keep
         |FROM r""".stripMargin,
    "q78_emb_centroids" ->
      """WITH e AS (SELECT label, unnest(embedding::DOUBLE[]) AS v,
        |  generate_subscripts(embedding, 1) - 1 AS dim FROM embeddings)
        |SELECT label, dim, round(avg(v), 4) AS centroid,
        |  round(stddev_pop(v), 4) AS spread, CAST(count(*) AS BIGINT) AS n
        |FROM e GROUP BY 1, 2""".stripMargin,
    "q40_multimodal_stub" ->
      s"""SELECT doc_id, length(text) AS n_bytes,
         |  length(text) % 64 + 1 AS width, length(text) % 48 + 1 AS height,
         |  ${fpRound4Sql("list_sum(list_transform(range(1, length(text)+1), " +
               "i -> ord(substr(text, i, 1))))::DOUBLE / length(text)")} AS mean_byte
         |FROM documents""".stripMargin,
    // q93: every gate is an exact constant — PNG is lossless and both the
    // pattern and the resample are pure integer arithmetic, so a single
    // pixel returned differently by the codec breaks n_pixel_match
    "q93_image_decode" ->
      """SELECT CAST(200 AS BIGINT) AS n_images,
        |  CAST(200 AS BIGINT) AS n_decoded,
        |  CAST(200 AS BIGINT) AS n_geometry_match,
        |  CAST(200 AS BIGINT) AS n_pixel_match""".stripMargin,
    // q94: WAV is lossless PCM and the energy feature is exact integer
    // arithmetic — every gate is a constant
    "q94_audio_decode" ->
      """SELECT CAST(200 AS BIGINT) AS n_clips,
        |  CAST(200 AS BIGINT) AS n_decoded,
        |  CAST(200 AS BIGINT) AS n_shape_match,
        |  CAST(200 AS BIGINT) AS n_energy_match""".stripMargin,
    // q112: JPEG is lossy but decode-of-given-bytes is deterministic —
    // the expected checksums come from the same decoder over the same
    // bytes, so the AVI mux/demux roundtrip gates are exact constants
    "q112_video_decode" ->
      """SELECT CAST(100 AS BIGINT) AS n_videos,
        |  CAST(100 AS BIGINT) AS n_decoded,
        |  CAST(100 AS BIGINT) AS n_geometry_match,
        |  CAST(100 AS BIGINT) AS n_frame_match""".stripMargin,
    // q95: the same IEEE arithmetic as the Spark plan (mult/div order,
    // floor-form rounding), so the integer code checksum is exact
    "q95_quantize_embeddings" ->
      """WITH e AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
        |    generate_subscripts(embedding, 1) AS i FROM embeddings),
        |s AS (SELECT vec_id, max(abs(v)) AS scale FROM e GROUP BY vec_id),
        |q AS (SELECT e.vec_id, i, v, scale,
        |    CASE WHEN scale = 0 THEN 0
        |         ELSE CAST(floor(v * 127.0 / scale + 0.5) AS BIGINT) END AS qi
        |  FROM e JOIN s ON e.vec_id = s.vec_id)
        |SELECT vec_id,
        |  CAST(sum(qi * i) AS BIGINT) AS q_checksum,
        |  CAST(max(abs(qi)) AS BIGINT) AS q_max_abs,
        |  floor((max(CASE WHEN scale = 0 THEN 0.0
        |                  ELSE abs(v - qi * scale / 127.0) END)
        |    / (scale / 254.0 + 1e-300)) * 10000.0 + 0.5) / 10000.0 AS err_vs_bound
        |FROM q GROUP BY vec_id, scale""".stripMargin,
    // q96: identical formula text on both engines — rational idf, fixed
    // per-term addition order, floor-form rounding
    "q96_bm25" ->
      s"""WITH d AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |dd AS (SELECT doc_id, len(tk)::DOUBLE AS dl, tk FROM d),
         |stats AS (SELECT count(*)::DOUBLE AS n_docs, sum(dl) / count(*) AS avgdl FROM dd),
         |t AS (SELECT doc_id, dl, unnest(tk) AS tok FROM dd),
         |tf AS (SELECT doc_id, dl, tok, count(*)::DOUBLE AS tf FROM t
         |  WHERE tok IN ('join', 'vector', 'stream') GROUP BY 1, 2, 3),
         |dfx AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
         |c AS (SELECT doc_id, tok,
         |    ((n_docs - df + 0.5) / (df + 0.5)) *
         |      (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS contrib
         |  FROM tf JOIN dfx USING (tok) CROSS JOIN stats),
         |p AS (SELECT doc_id,
         |    coalesce(sum(CASE WHEN tok = 'join' THEN contrib END), 0.0) AS c0,
         |    coalesce(sum(CASE WHEN tok = 'vector' THEN contrib END), 0.0) AS c1,
         |    coalesce(sum(CASE WHEN tok = 'stream' THEN contrib END), 0.0) AS c2
         |  FROM c GROUP BY doc_id)
         |SELECT doc_id, floor((c0 + c1 + c2) * 10000.0 + 0.5) / 10000.0 AS bm25
         |FROM p ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    // q101: identical generated URL strings; host/path/query re-derived
    // with regexes (DuckDB has no parse_url); literal-prefix utm strip
    // via left(x,4) (LIKE's `_` is a wildcard)
    // NB: DuckDB's array_to_string([]) is NULL where Spark's array_join
    // is '' — hence the coalesce.
    "q101_url_canonical" ->
      raw"""WITH u AS (SELECT doc_id,
           |  'https://' ||
           |  CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END ||
           |  'site' || ((doc_id % 50) % 7) ||
           |  CASE WHEN doc_id % 3 = 0 THEN '.Example.COM' ELSE '.example.com' END ||
           |  '/p/' || (doc_id % 50) || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
           |  '?' ||
           |  CASE WHEN (doc_id % 50) % 5 = 0 THEN 'utm_source=s' || (doc_id % 11)
           |    WHEN doc_id % 3 = 0
           |      THEN 'ref=r' || ((doc_id % 50) % 3) || '&utm_source=s' || (doc_id % 11)
           |    ELSE 'utm_source=s' || (doc_id % 11) || '&ref=r' || ((doc_id % 50) % 3) END ||
           |  CASE WHEN doc_id % 4 = 0 THEN '#sec' || (doc_id % 6) ELSE '' END AS url
           |  FROM documents),
           |p AS (SELECT doc_id,
           |  regexp_replace(lower(regexp_extract(url, 'https://([^/?#]+)', 1)), '^www\.', '') AS host,
           |  regexp_replace(regexp_extract(url, 'https://[^/?#]+([^?#]*)', 1), '/$$', '') AS path,
           |  coalesce(array_to_string(list_sort(list_filter(
           |    string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
           |    x -> left(x, 4) <> 'utm_' AND x <> '')), '&'), '') AS qc
           |  FROM u)
           |SELECT 'https://' || host || path ||
           |    CASE WHEN qc = '' THEN '' ELSE '?' || qc END AS canon,
           |  CAST(min(doc_id) AS BIGINT) AS canonical_doc,
           |  CAST(count(*) AS BIGINT) AS n_dups
           |FROM p GROUP BY canon ORDER BY canon""".stripMargin,
    // q104: counts restated from the base table, invariants as constants
    // (the q65 pattern: clustering internals aren't SQL-expressible)
    "q104_semdedup" ->
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings)
        |    + (SELECT CAST(count(*) AS BIGINT) FROM embeddings WHERE vec_id % 10 = 0)
        |    AS n_total,
        |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings WHERE vec_id % 10 = 0)
        |    AS n_injected,
        |  1 AS all_copies_dropped, 1 AS conservation,
        |  1 AS canonical_kept, 1 AS kept_maximal""".stripMargin,
    // q110: exact counts recomputed; the one-sided-error flag is the
    // sketch's contract, deterministically met at this vocabulary size
    "q110_cms" ->
      s"""SELECT t AS term, CAST(count(*) AS BIGINT) AS exact_count,
         |  1 AS within_bounds
         |FROM (SELECT unnest($duckToks) AS t FROM documents)
         |WHERE t IN ('join', 'vector', 'stream')
         |GROUP BY t ORDER BY t""".stripMargin,
    // q111: the first BPE merge is the argmax weighted adjacent char
    // pair — recomputed exactly; the iterative rest gated by invariants.
    // Tie-break: ORDER BY cnt DESC, pr — the ' ' separator sorts below
    // every token character, so pr ordering == (a, b) ordering.
    "q111_bpe_train" ->
      s"""WITH w AS (SELECT t, count(*) AS freq
         |  FROM (SELECT unnest($duckToks) AS t FROM documents) GROUP BY t),
         |ch AS (SELECT freq, list_filter(string_split(t, ''), c -> c <> '') AS cs FROM w),
         |pe AS (SELECT freq, unnest(list_transform(range(1, len(cs)),
         |    i -> cs[i] || ' ' || cs[i+1])) AS pr
         |  FROM ch WHERE len(cs) >= 2),
         |ag AS (SELECT pr, sum(freq) AS cnt FROM pe GROUP BY pr
         |  ORDER BY cnt DESC, pr LIMIT 1)
         |SELECT string_split(pr, ' ')[1] AS first_a,
         |  string_split(pr, ' ')[2] AS first_b,
         |  8 AS n_merges, 1 AS merges_distinct FROM ag""".stripMargin,
    // q102: same tokenizer, df = count(distinct doc), rational mean
    "q102_token_rarity" ->
      s"""WITH tok AS (SELECT doc_id, unnest($duckToks) AS t FROM documents),
         |df AS (SELECT t, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM tok GROUP BY t)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  ${fpRound4Sql("sum(df)::DOUBLE / count(*)")} AS mean_df,
         |  CAST(min(df) AS BIGINT) AS min_df
         |FROM tok JOIN df USING (t)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q97: identical generated strings, RE2-compatible patterns, 'g' flag
    // for DuckDB's default first-match-only regexp_replace
    "q97_pii_redact" ->
      raw"""WITH b AS (SELECT doc_id,
           |  'contact user' || doc_id || '@mail' || (doc_id % 7) ||
           |  '.example.com or call 555-' ||
           |  lpad(((doc_id * 37) % 1000)::VARCHAR, 3, '0') || '-' ||
           |  lpad(((doc_id * 91) % 10000)::VARCHAR, 4, '0') ||
           |  ' from 10.' || (doc_id % 256) || '.0.' || ((doc_id * 3) % 256) ||
           |  ' re: ' || substr(text, 1, 40) AS t FROM documents)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
           |  CAST(len(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}')) AS INT) AS n_phone,
           |  CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ip,
           |  regexp_replace(regexp_replace(regexp_replace(t,
           |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
           |    '\d{3}-\d{3}-\d{4}', '[PHONE]', 'g'),
           |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS redacted
           |FROM b""".stripMargin,
  )
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public text-analysis column builders — the composable pieces behind
  * the LLM-pipeline queries, usable on any DataFrame with a text
  * column (batch or streaming; everything here is a codegen'd column
  * expression, no UDFs).
  *
  * `shingleHashes` is the contract between the batch decontamination
  * sweep (q75) and the streaming [[graft.streaming.StreamOps
  * .contaminationGate]]: compute it on the eval corpus to build the
  * static index, and on arriving docs to probe it.
  */
object TextOps {

  /** Rolling-hash modulus shared with the DuckDB oracle arithmetic. */
  val HashModulus = 1000000007L

  /** Let-binding for column expressions: evaluate `bound` ONCE and make
    * it available to `body` as a lambda VARIABLE —
    * `transform(array(bound), v => body(v))[0]`. The point is optimizer
    * robustness, not style: predicate pushdown and project collapse
    * substitute aliases transitively into every reference, and an alias
    * referenced inside a higher-order function's lambda BODY substitutes
    * to a re-evaluation per ELEMENT (quadratic for expressions that
    * build arrays from arrays). A lambda variable is not an alias;
    * substitution stops at the binder, so `bound` is evaluated exactly
    * once per evaluation of the whole expression no matter what plan
    * rewrites inline it. */
  def letBound(bound: Column)(body: Column => Column): Column =
    transform(array(bound), v => body(v)).getItem(0)

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  /** Word-bigram shingles "w_i w_{i+1}" over a token array. */
  def bigrams(toks: Column): Column =
    zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit(" "), b))

  /** Native codegen'd rolling hash ([[graft.functions.RollingHash]]);
    * requires the GraftExtensions-registered session. */
  def rollingHash(t: Column): Column = call_function("rolling_hash", t)

  /** Distinct bigram-shingle hashes of a raw text column — the unit
    * every dedup/contamination operator joins on. Total: a doc with
    * fewer than 2 tokens (empty/whitespace text included) yields an
    * empty array rather than crashing the caller's query — slice with
    * a negative length throws, and a streaming consumer must survive
    * arbitrary input. */
  def shingleHashes(text: Column): Column = {
    val tk = tokens(text)
    when(size(tk) >= 2,
      array_distinct(transform(array_distinct(bigrams(tk)), t => rollingHash(t))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** MinHash LSH band keys over a text column — the banding definition
    * the streaming text dup gate shares with the batch detector family
    * (q37's 16-long signature, [[graft.functions.MinHashParams]]
    * permutations): an array of (band_id, bkey) structs, where `bkey`
    * joins the band's signature rows with '|' (exact encoding at any
    * rows-per-band, no combined-hash collisions). A doc with no
    * shingles (fewer than 2 tokens) yields an EMPTY band array — it can
    * never be a candidate, rather than colliding every degenerate doc
    * into one null-keyed bucket whose candidate fan-out grows with the
    * corpus. */
  def minhashBands(text: Column, numBands: Int): Column = {
    val nSig = graft.functions.MinHashParams.NumSig
    require(numBands > 0 && nSig % numBands == 0,
      s"numBands must divide the signature length $nSig, got $numBands")
    val rows = nSig / numBands
    val sig = call_function("minhash_sigs", shingleHashes(text))
    val bands = array((0 until numBands).map { j =>
      struct(lit(j).as("band_id"),
        concat_ws("|", (0 until rows).map(r =>
          sig.getItem(j * rows + r).cast("string")): _*).as("bkey"))
    }: _*)
    when(sig.isNotNull, bands)
      .otherwise(array().cast("array<struct<band_id:int,bkey:string>>"))
  }

  /** Exact Jaccard over two distinct-hash-set columns; NaN when both
    * sets are empty (0/0) — callers filter with an isnan guard, the
    * [[graft.streaming.StreamOps]] cosine-gate discipline. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Token-length histogram binning shared by the batch PSI drift
    * monitor (q140, DuckDB-oracled) and the streaming
    * [[graft.streaming.StreamOps.psiDriftMonitor]] — one definition, so
    * a stream-side drift alarm fires on exactly the distribution the
    * batch monitor reports. */
  val PsiBins = 8
  val PsiBinWidth = 16L
  def lengthBin(text: Column): Column =
    least(floor(size(tokens(text)).cast("long") / PsiBinWidth), lit(PsiBins - 1L))

  /** The q33 quality score over a token array: length saturation +
    * type-token ratio, floor-form 4dp rounding (shared by the quality
    * query, the composed corpus pipeline, and the cross-modal join). */
  def quality(tk: Column): Column =
    floor((least(lit(1.0), size(tk) / lit(100.0)) * 0.5 +
      (size(array_distinct(tk)).cast("double") / size(tk)) * 0.5) * 10000.0 + 0.5) / 10000.0

  /** The quality gate threshold used by q33's low_quality flag and the
    * corpus pipeline's filter. */
  val QualityGate = 0.55

  /** Gopher quality-filter rules (Rae et al. 2021, Appendix A1.1) — ONE
    * definition shared by the batch gate (q127, DuckDB-oracled) and the
    * streaming ingest gate ([[graft.streaming.StreamOps.gopherGate]]):
    * appends the stats, the per-rule flags, and their conjunction
    * `gopher_pass` to any frame with a text column. Scan-shaped column
    * work only, so it plans identically in a micro-batch.
    *
    * Zero-token and zero-line documents take explicit FALSE/TRUE flags
    * (word rules fail, line rules pass vacuously) — a ratio over an
    * empty denominator decides nothing and must not null-propagate. */
  val GopherStops: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")
  def gopherRules(df: org.apache.spark.sql.DataFrame, textCol: String): org.apache.spark.sql.DataFrame = {
    def r4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0
    // ONE nested-let battery (the [[repetitionRules]] structure, same
    // rationale): a filter on `gopher_pass` at ingest inlines exactly
    // one battery evaluation — tokenize once, walk each token/line
    // array once per stat — instead of re-tokenizing per substituted
    // stat occurrence after predicate pushdown.
    val battery: Column = letBound(struct(
        tokens(col(textCol)).as("tk"),
        filter(split(col(textCol), "\n"), l => trim(l) =!= lit("")).as("ln"))) { b =>
      val tk = b("tk")
      val lines = b("ln")
      val nWords = size(tk).cast("double")
      val nLines = size(lines).cast("double")
      val meanLen = aggregate(tk, lit(0L), (a, t) => a + length(t)).cast("double") / nWords
      val fracSymbol = size(filter(tk,
        t => t.contains("#") || t.contains("..."))).cast("double") / nWords
      val fracAlpha = size(filter(tk, t => t.rlike("[A-Za-z]"))).cast("double") / nWords
      val fracBullet = size(filter(lines,
        l => trim(l).startsWith("-") || trim(l).startsWith("*") ||
          trim(l).startsWith("•"))).cast("double") / nLines
      val fracEllipsis = size(filter(lines,
        l => trim(l).endsWith("...") || trim(l).endsWith("…"))).cast("double") / nLines
      val nStop = size(array_intersect(transform(tk, t => lower(t)),
        array(GopherStops.map(lit): _*)))
      val stats = struct(
        size(tk).cast("long").as("n_words"),
        r4(coalesce(meanLen, lit(0.0))).as("mean_word_len"),
        r4(coalesce(fracSymbol, lit(0.0))).as("frac_symbol"),
        r4(coalesce(fracAlpha, lit(0.0))).as("frac_alpha"),
        r4(coalesce(fracBullet, lit(0.0))).as("frac_bullet"),
        r4(coalesce(fracEllipsis, lit(0.0))).as("frac_ellipsis"),
        nStop.cast("long").as("n_stop"))
      letBound(stats) { st =>
        val flags = Seq(
          (st("n_words") >= 50 && st("n_words") <= 100000).cast("int").as("r_words"),
          (st("n_words") > 0 && st("mean_word_len") >= 3.0 &&
            st("mean_word_len") <= 10.0).cast("int").as("r_mean_len"),
          (st("n_words") > 0 && st("frac_symbol") <= 0.1).cast("int").as("r_symbol"),
          (st("n_words") > 0 && st("frac_alpha") >= 0.8).cast("int").as("r_alpha"),
          (st("frac_bullet") <= 0.9).cast("int").as("r_bullet"),
          (st("frac_ellipsis") <= 0.3).cast("int").as("r_ellipsis"),
          (st("n_stop") >= 2).cast("int").as("r_stop"))
        val statFields = Seq("n_words", "mean_word_len", "frac_symbol",
          "frac_alpha", "frac_bullet", "frac_ellipsis", "n_stop")
        struct(
          statFields.map(nm => st(nm).as(nm)) ++ flags :+
            flags.map(f => f.cast("int")).reduce(_ * _).cast("int").as("gopher_pass"): _*)
      }
    }
    val outNames = Seq("n_words", "mean_word_len", "frac_symbol", "frac_alpha",
      "frac_bullet", "frac_ellipsis", "n_stop",
      "r_words", "r_mean_len", "r_symbol", "r_alpha", "r_bullet", "r_ellipsis",
      "r_stop", "gopher_pass")
    outNames.foldLeft(df.withColumn("__gop", battery)) { (d, nm) =>
      d.withColumn(nm, col("__gop").getField(nm))
    }.drop("__gop")
  }

  /** Gopher repetition-removal rules (Rae et al. 2021, Appendix A1.2) —
    * the OTHER half of the Gopher document gate: [[gopherRules]] is the
    * A1.1 quality battery; this is the within-document repetition
    * battery that catches boilerplate loops, scraped navigation, and
    * degenerate generations. Appends per-document stats, per-rule
    * flags, and the conjunction `rep_pass` to any frame with a text
    * column:
    *
    *   - duplicate-line fraction (share of non-empty lines that are
    *     repeats of an earlier line) and duplicate-line CHARACTER
    *     fraction (share of line characters sitting in those repeats);
    *   - for n ∈ {2,3,4}: fraction of word characters covered by the
    *     most frequent word n-gram (count × gram chars / total word
    *     chars — overlapping occurrences each count, the standard
    *     published reading);
    *   - for n ∈ {5..10}: fraction of word characters sitting in
    *     occurrences-beyond-the-first of any duplicated word n-gram.
    *
    * Thresholds are the paper's (A1.2): dup-line ≤ 0.30, dup-line-char
    * ≤ 0.20, top-{2,3,4}-gram ≤ {0.20, 0.18, 0.16}, dup-{5..10}-gram ≤
    * {0.15, 0.14, 0.13, 0.12, 0.11, 0.10}. Flags evaluate on the 4dp
    * floor-rounded stats so both engines gate the same value.
    *
    * Shape: everything is per-document array work — n-grams are built,
    * sorted, and run-length-scanned inside codegen'd higher-order
    * functions, so the whole battery is ONE scan-shaped projection with
    * zero shuffle regardless of corpus size (documents are bounded by
    * the A1.1 word-count cap; per-doc O(G log G) sort beats shipping
    * the corpus 9× through explode/groupBy exchanges). Docs shorter
    * than n tokens have no n-grams: fractions 0, rules pass vacuously. */
  val TopNgramMax: Map[Int, Double] =
    Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  val DupNgramMax: Map[Int, Double] =
    Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)
  def repetitionRules(df: DataFrame, textCol: String): DataFrame = {
    def r4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0

    /** Sorted n-gram array for n over a LET-BOUND token array: space-
      * joined token windows, so equal grams are adjacent and every
      * repetition stat is a run-length scan. Empty when the doc has
      * fewer than n tokens. `tk` must be a lambda variable, never an
      * alias — see the battery note below. */
    def sortedGrams(tk: Column, n: Int): Column =
      when(size(tk) >= n,
        array_sort(transform(sequence(lit(1), size(tk) - (n - 1)),
          i => array_join(slice(tk, i, lit(n)), " "))))
        .otherwise(array().cast("array<string>"))
    /** Chars in beyond-first occurrences of duplicated n-grams: on the
      * sorted array an occurrence is beyond-first iff it equals its
      * left neighbor, so the numerator is one adjacent-pair sweep. */
    def dupChars(sg: Column, n: Int): Column =
      when(size(sg) >= 2,
        aggregate(
          zip_with(slice(sg, lit(1), size(sg) - 1), slice(sg, lit(2), size(sg) - 1),
            (a, b) => when(a === b, length(b) - (n - 1)).otherwise(lit(0))),
          lit(0L), (acc, x) => acc + x).cast("double"))
        .otherwise(lit(0.0))
    /** count × charLen of the most frequent n-gram (ties on count break
      * to the longer gram — the fraction depends only on (count, len),
      * never on which tied gram is named). One aggregate pass over the
      * sorted array with (prev, run, bestCount, bestLen) state; the
      * finish lambda closes the final run. */
    def topChars(sg: Column, n: Int): Column = {
      def close(run: Column, len: Column, bc: Column, bl: Column): (Column, Column) = {
        val better = run > lit(0L) && (run > bc || (run === bc && len > bl))
        (when(better, run).otherwise(bc), when(better, len).otherwise(bl))
      }
      val res = aggregate(
        sg,
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("bc"), lit(0L).as("bl")),
        (acc, x) => {
          val prevLen = (length(acc("prev")) - (n - 1)).cast("long")
          val (bc2, bl2) = close(acc("run"), prevLen, acc("bc"), acc("bl"))
          when(x === acc("prev"),
            struct(x.as("prev"), (acc("run") + 1L).as("run"),
              acc("bc").as("bc"), acc("bl").as("bl")))
            .otherwise(
              struct(x.as("prev"), lit(1L).as("run"), bc2.as("bc"), bl2.as("bl")))
        },
        acc => {
          val prevLen = (length(acc("prev")) - (n - 1)).cast("long")
          val (bc2, bl2) = close(acc("run"), prevLen, acc("bc"), acc("bl"))
          (bc2 * bl2).cast("double")
        })
      when(size(sg) > 0, res).otherwise(lit(0.0))
    }
    /** The WHOLE stat battery as ONE let-bound struct expression —
      * optimizer-robustness, not style ([[letBound]]): predicate
      * pushdown substitutes a filter-on-`rep_pass` transitively through
      * every projection it crosses, regardless of expression cost. With
      * stats as independent alias chains over a `__rtk` tokens column,
      * the substituted predicate re-embedded the tokenizer inside the
      * per-gram lambda bodies — O(tokens²) per document per pipeline;
      * measured 146 s vs 0.6 s for the gate shape at sf0.1. Here tokens
      * and lines bind ONCE as lambda variables and every stat is a
      * field of one struct, so however a plan rewrite inlines `__rep`,
      * each evaluation tokenizes once and builds each gram family once.
      * The field-extraction projection below survives CollapseProject's
      * cost guard (many references to one non-cheap alias), so the
      * normal projection path evaluates the battery once per row. */
    val battery: Column = letBound(struct(
        tokens(col(textCol)).as("tk"),
        filter(split(col(textCol), "\n"), l => trim(l) =!= lit("")).as("ln"))) { b =>
      val tk = b("tk")
      val lines = b("ln")
      // total characters across word tokens — the shared denominator
      // for every n-gram fraction (gram char length excludes joiners)
      val totChars = aggregate(tk, lit(0L), (a, t) => a + length(t)).cast("double")
      val nLines = size(lines).cast("double")
      val lineChars = aggregate(lines, lit(0L), (a, l) => a + length(l)).cast("double")
      val distinctLineChars =
        aggregate(array_distinct(lines), lit(0L), (a, l) => a + length(l)).cast("double")
      val dupLineFrac =
        when(size(lines) > 0, lit(1.0) - size(array_distinct(lines)) / nLines).otherwise(0.0)
      val dupLineCharFrac =
        when(lineChars > 0, lit(1.0) - distinctLineChars / lineChars).otherwise(0.0)
      def frac(num: Column): Column = r4(when(totChars > 0, num / totChars).otherwise(0.0))
      val stats = struct(
        Seq(r4(dupLineFrac).as("dup_line_frac"),
            r4(dupLineCharFrac).as("dup_line_char_frac")) ++
        TopNgramMax.keys.toSeq.sorted.map(n =>
          frac(letBound(sortedGrams(tk, n))(sg => topChars(sg, n)))
            .as(s"top_${n}gram_frac")) ++
        DupNgramMax.keys.toSeq.sorted.map(n =>
          frac(letBound(sortedGrams(tk, n))(sg => dupChars(sg, n)))
            .as(s"dup_${n}gram_frac")): _*)
      // flags and their conjunction bind over the ONE stats evaluation
      // (inner let), so a filter on `rep_pass` — which inlines exactly
      // one `__rep.rep_pass` reference — costs ONE battery evaluation,
      // not one per flag
      letBound(stats) { st =>
        val flags =
          Seq((st("dup_line_frac") <= 0.30).cast("int").as("r_dup_line"),
              (st("dup_line_char_frac") <= 0.20).cast("int").as("r_dup_line_char")) ++
          TopNgramMax.toSeq.sortBy(_._1).map { case (n, mx) =>
            (st(s"top_${n}gram_frac") <= mx).cast("int").as(s"r_top_${n}gram") } ++
          DupNgramMax.toSeq.sortBy(_._1).map { case (n, mx) =>
            (st(s"dup_${n}gram_frac") <= mx).cast("int").as(s"r_dup_${n}gram") }
        val statFields = Seq("dup_line_frac", "dup_line_char_frac") ++
          TopNgramMax.keys.toSeq.sorted.map(n => s"top_${n}gram_frac") ++
          DupNgramMax.keys.toSeq.sorted.map(n => s"dup_${n}gram_frac")
        struct(
          statFields.map(nm => st(nm).as(nm)) ++ flags :+
            flags.map(f => f.cast("int")).reduce(_ * _).cast("int").as("rep_pass"): _*)
      }
    }

    val outNames = Seq("dup_line_frac", "dup_line_char_frac") ++
      TopNgramMax.keys.toSeq.sorted.map(n => s"top_${n}gram_frac") ++
      DupNgramMax.keys.toSeq.sorted.map(n => s"dup_${n}gram_frac") ++
      Seq("r_dup_line", "r_dup_line_char") ++
      TopNgramMax.keys.toSeq.sorted.map(n => s"r_top_${n}gram") ++
      DupNgramMax.keys.toSeq.sorted.map(n => s"r_dup_${n}gram") :+
      "rep_pass"
    outNames.foldLeft(df.withColumn("__rep", battery)) { (d, nm) =>
      d.withColumn(nm, col("__rep").getField(nm))
    }.drop("__rep")
  }

  /** PII scrubbing patterns — the anonymization pass (CCNet §3 /
    * RefinedWeb-lineage pipelines) that masks contact identifiers
    * before a corpus is trained on. Patterns stay inside the dialect
    * intersection of Java regex (Spark codegen) and RE2 (DuckDB/cloud
    * scanners): character classes, bounded repetition, `\b` on ASCII —
    * no backreferences, no lookaround — so the SAME pattern text runs
    * on both engines and on whatever scanner a 100 TB sweep uses.
    * Order matters only in that replacement tokens must not re-match a
    * later pattern; `<EMAIL>`/`<IP>`/`<PHONE>` contain neither digits
    * nor `@`, so the three passes compose in any order. */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIpv4  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PiiPhone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Masked text: all three PII classes replaced by their tokens. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, PiiEmail, "<EMAIL>"),
        PiiIpv4, "<IP>"),
      PiiPhone, "<PHONE>")

  /** Match count for one PII pattern (full-match group 0). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Classic BPE merge training (Sennrich et al., 2016, arXiv:1508.07909)
    * re-expressed Spark-first. Input is the WORD-FREQUENCY table — the
    * standard reduction: the corpus collapses to (word, freq) in one
    * distributed scan, and every merge round then runs over that
    * vocabulary-sized frame, which is bounded regardless of corpus size
    * (a 100 TB corpus and a 100 GB corpus have comparable vocabularies).
    *
    * Per round: weighted adjacent-pair counts (the q76 bigram explode
    * over symbol arrays), the argmax pair comes to the driver (one tiny
    * deterministic row — ties break on the pair itself), and the merge
    * applies as a codegen'd left-to-right array fold: no UDF, no
    * collect of the vocabulary. Cache discipline mirrors
    * [[Dedup.connectedComponents]]: materialize the next round's frame
    * BEFORE releasing the previous one, or round N recomputes every
    * earlier merge.
    *
    * Returns the merge sequence (most-frequent first). Stops early if
    * no pair occurs at least twice (merging singletons is noise).
    *
    * HYBRID execution: the word-frequency reduction is always
    * distributed, but the merge LOOP is inherently sequential — one
    * tiny argmax depends on the previous merge — so each distributed
    * round costs a full Spark job for vocabulary-sized work. A
    * production tokenizer needs ~32k merges ⇒ ~32k sequential jobs,
    * pure scheduling overhead. Since the reduced vocabulary is bounded
    * regardless of corpus size (typically ≪ 10⁶ rows), when it fits
    * under `localThreshold` rows it is collected ONCE and the loop runs
    * driver-local with incremental pair-count maintenance (only words
    * containing the merged pair are recounted — the Sennrich reference
    * optimization). Both paths use the same greedy-leftmost fold and
    * the same (count desc, pair asc by UTF-8 bytes) argmax, so they
    * produce the IDENTICAL merge sequence (BpeTrainSpec pins this);
    * `localThreshold = 0` forces the distributed path for vocabularies
    * that genuinely cannot sit on the driver. */
  def bpeTrain(words: DataFrame, wordCol: String, freqCol: String,
      nMerges: Int, localThreshold: Long = 2000000L): Seq[(String, String)] = {
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var syms = words.select(col(freqCol).cast("long").as("freq"),
      filter(split(col(wordCol), ""), c => c =!= lit("")).as("sym")).cache()
    val vocabRows = syms.count()
    if (vocabRows <= localThreshold) {
      try {
        val local = syms.collect().map { r =>
          (r.getSeq[String](r.fieldIndex("sym")).toArray, r.getLong(r.fieldIndex("freq")))
        }
        return bpeTrainLocal(local, nMerges)
      } finally syms.unpersist()
    }
    try {
      var done = false
      while (!done && merges.size < nMerges) {
        val top = syms.filter(size(col("sym")) >= 2)
          .select(col("freq"), explode(zip_with(
            slice(col("sym"), lit(1), size(col("sym")) - 1),
            slice(col("sym"), lit(2), size(col("sym")) - 1),
            (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1).collect()
        if (top.isEmpty || top.head.getLong(2) < 2L) done = true
        else {
          val (a, b) = (top.head.getString(0), top.head.getString(1))
          merges += ((a, b))
          val merged = a + b
          // greedy leftmost merge: fold symbols left to right, replacing
          // an (a, b) adjacency with the merged symbol; try_element_at
          // returns null on the empty accumulator (ANSI-safe)
          val next = syms.withColumn("sym",
            aggregate(col("sym"), array().cast("array<string>"),
              (acc, s) => when(
                try_element_at(acc, lit(-1)) === lit(a) && s === lit(b),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
                .otherwise(concat(acc, array(s))))).cache()
          next.count() // materialize BEFORE dropping the previous round
          syms.unpersist()
          syms = next
        }
      }
      merges.toList
    } finally syms.unpersist()
  }

  /** Apply a TRAINED merge sequence to a word column — the encode half
    * of the tokenizer ([[bpeTrain]] is the train half): split to
    * characters, then one greedy-leftmost fold per merge, in training
    * order — the exact expression the distributed training rounds use,
    * so encode(w) is definitionally consistent with the merges. All
    * codegen'd Column arithmetic, no UDF.
    *
    * The expression tree grows linearly with the merge count — right
    * for bounded lists (the oracle-gated path trains 8). A production
    * 32k-merge vocabulary wants the mapPartitions route instead (a trie
    * tokenizer built once per partition from the broadcast merge list —
    * the [[graft.llm.Multimodal]] typed-contract precedent), not a
    * 32k-deep expression. */
  def bpeApply(word: Column, merges: Seq[(String, String)]): Column = {
    val chars = filter(split(word, ""), c => c =!= lit(""))
    merges.foldLeft(chars) { case (syms, (a, b)) =>
      aggregate(syms, array().cast("array<string>"),
        (acc, s) => when(
          try_element_at(acc, lit(-1)) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s))))
    }
  }

  /** The SCALE encode path: [[bpeApply]]'s exact semantics as
    * partition-local Scala over a broadcast merge table, for merge
    * lists too large to live in an expression tree (a production
    * vocabulary is ~32k merges; the Column fold grows the plan
    * linearly and leaves codegen long before that). Output contract:
    * (idCol, syms) — same projection shape as the [[Multimodal]]
    * codecs, no shuffle, merge table broadcast once per executor.
    *
    * Per word: code-point symbols (split("")'s semantics — surrogate
    * pairs stay intact), then merges applied in TRAINING ORDER with a
    * skip-scan: each round finds the smallest merge rank ABOVE the
    * last applied one present among the word's current adjacencies
    * (O(len) scan) and applies that merge's single greedy-leftmost
    * pass — so a 32k-merge table costs O(applied merges · len), not
    * 32k no-op passes. Never revisiting a lower rank is what makes
    * this bit-identical to the sequential fold: the classic
    * priority-heap formulation ("repeatedly merge the min-rank pair
    * present") silently diverges on merge tables whose operands appear
    * AFTER their products, and encode identity should not depend on
    * table consistency. BpeTrainSpec pins equality against
    * [[bpeApply]] on trained AND adversarially inconsistent tables. */
  def bpeApplyBig(df: DataFrame, idCol: String, wordCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
    val spark = df.sparkSession
    val bcMerges = spark.sparkContext.broadcast(merges.toArray)
    val bcRank = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap)
    // the id column rides through UNTYPED (any id type — a numeric key,
    // or the word itself when the vocabulary is the unit of work)
    val outSchema = StructType(Seq(
      df.schema(idCol), StructField("syms", ArrayType(StringType), nullable = true)))
    df.select(col(idCol), col(wordCol).cast("string"))
      .mapPartitions { it =>
        val ms = bcMerges.value
        val rank = bcRank.value
        it.map(r => Row(r.get(0), encodeLocal(r.getString(1), ms, rank)))
      }(Encoders.row(outSchema))
      .toDF(idCol, "syms")
  }

  /** One word through the sequential-with-skip encoder — the exact
    * [[bpeApply]] fold, minus the no-op passes. */
  private[llm] def encodeLocal(w: String, merges: Array[(String, String)],
      rank: Map[(String, String), Int]): Seq[String] = {
    if (w == null) return null
    var syms = {
      val buf = new scala.collection.mutable.ArrayBuffer[String](w.length)
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        buf += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      buf
    }
    var last = -1
    var done = false
    while (!done) {
      // smallest applicable rank STRICTLY ABOVE the last applied one —
      // ranks ≤ last have had their one sequential pass already
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))) match {
          case Some(r) if r > last && r < best => best = r
          case _ =>
        }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val merged = a + b
        // the single greedy-leftmost pass, identical to the column fold
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        syms.foreach { s =>
          if (out.nonEmpty && out.last == a && s == b) out(out.length - 1) = merged
          else out += s
        }
        syms = out
        last = best
      }
    }
    syms.toSeq
  }

  /** Decode — the exact inverse of [[bpeApply]]'s fold. Every BPE merge
    * only CONCATENATES adjacent symbols: no symbol is dropped, rewritten
    * or reordered by any round, so flattening the token array back to a
    * string restores the original word exactly, for ANY merge list
    * (trained, loaded, even empty). One codegen'd expression, no UDF;
    * q122 gates decode(encode(w)) == w over the whole word table. */
  def bpeDecode(toks: Column): Column = array_join(toks, "")

  /** Persist a trained merge sequence as an ordered table artifact —
    * the [[ProductQuant.save]] pattern applied to the tokenizer tier:
    * one row per merge (rank, left, right), merge-count-sized (a
    * production vocabulary is ~32k rows), so the artifact is
    * metadata-sized next to any corpus. `rank` is the training order,
    * which IS the apply order — encode is only correct when merges
    * replay in the order they were learned. The reference persists
    * every artifact it fits (reference preprocess.py:52-55,
    * train_model.py:113-114); this is the merge table's turn. */
  def bpeSave(spark: SparkSession, merges: Seq[(String, String)], dir: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
  }

  /** Reload a persisted merge sequence in training order. The collect
    * is merge-count-sized (bounded by the nMerges the trainer was given)
    * — the same metadata-sized-artifact contract as
    * [[IvfSearch.load]]'s centroid read. An EMPTY merge table is legal
    * (a corpus too thin for any repeated pair trains zero merges, and
    * [[bpeApply]] with no merges is the character tokenizer). */
  def bpeLoad(spark: SparkSession, dir: String): Seq[(String, String)] =
    spark.read.parquet(s"$dir/merges").orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** Spark string ordering is binary over UTF-8 bytes; the local argmax
    * must break count ties identically or the two paths diverge on the
    * first tie. (UTF-16 `String.compareTo` disagrees for supplementary
    * characters.) */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < a.length && i < b.length) {
      if ((a(i) & 0xff) != (b(i) & 0xff)) return (a(i) & 0xff) < (b(i) & 0xff)
      i += 1
    }
    a.length < b.length
  }

  /** Driver-local merge loop over a collected (symbols, freq) vocab —
    * the classic algorithm with the incremental-recount optimization:
    * a pair → word-ids index makes each merge touch only the words that
    * actually contain the merged pair, so 32k merges stay proportional
    * to total rewrites, not 32k full vocabulary scans. The argmax scan
    * per round is O(live pairs); a lazy-deletion heap would shave that
    * further if profiles ever show it dominating. */
  private def bpeTrainLocal(vocab: Array[(Array[String], Long)],
      nMerges: Int): Seq[(String, String)] = {
    val words = vocab.map(_._1.clone())
    val freqs = vocab.map(_._2)
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val occurs = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    def addWord(wi: Int, sign: Long): Unit = {
      val w = words(wi)
      var i = 0
      while (i < w.length - 1) {
        val p = (w(i), w(i + 1))
        val c = counts.getOrElse(p, 0L) + sign * freqs(wi)
        if (c == 0L) counts.remove(p) else counts(p) = c
        if (sign > 0)
          occurs.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += wi
        i += 1
      }
      // stale occurs entries for removed pairs are tolerated: the merge
      // loop re-checks actual adjacency before rewriting a word
    }
    words.indices.foreach(addWord(_, 1L))
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    while (merges.size < nMerges && counts.nonEmpty) {
      var best: (String, String) = null
      var bestCnt = 0L
      counts.foreach { case (p, c) =>
        if (c > bestCnt || (c == bestCnt && best != null &&
            (utf8Lt(p._1, best._1) ||
              (p._1 == best._1 && utf8Lt(p._2, best._2)))))
          { best = p; bestCnt = c }
      }
      if (bestCnt < 2L) return merges.toList
      merges += best
      val (a, b) = best
      val merged = a + b
      val affected = occurs.remove(best).getOrElse(scala.collection.mutable.Set.empty)
      affected.foreach { wi =>
        val w = words(wi)
        // re-check adjacency: the index may hold stale ids from earlier
        // rewrites of this word
        var has = false
        var i = 0
        while (!has && i < w.length - 1) { has = w(i) == a && w(i + 1) == b; i += 1 }
        if (has) {
          addWord(wi, -1L)
          // greedy-leftmost fold, identical to the distributed column fold
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          w.foreach { s =>
            if (out.nonEmpty && out.last == a && s == b)
              out(out.length - 1) = merged
            else out += s
          }
          words(wi) = out.toArray
          addWord(wi, 1L)
        }
      }
    }
    merges.toList
  }
}

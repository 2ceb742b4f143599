package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Pins [[TextOps.repetitionRules]] (Gopher A1.2, q131) on crafted
  * documents with hand-computed fractions — the corpus testdata has no
  * newlines and no repeated ≥5-grams, so the duplicate-line and
  * dup-n-gram arithmetic is only exercised here (the oracle pins it
  * cross-engine on the vacuous-zero cases).
  */
class RepetitionRulesSpec extends SparkSpec {
  import spark.implicits._

  private def rules(texts: (Long, String)*) =
    TextOps.repetitionRules(texts.toDF("doc_id", "text"), "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("top-n-gram char fractions: overlapping occurrences each count, hand-computed") {
    // "a b a b a b": 6 tokens, 6 word chars. 2-grams: "a b"×3, "b a"×2
    // → top2 = 3·2/6 = 1.0. 3-grams: "a b a"×2, "b a b"×2 → 2·3/6 = 1.0.
    // 4-grams: "a b a b"×2, "b a b a"×1 → 2·4/6 = 1.3333 (overlap makes
    // the coverage estimate exceed 1 — the standard published reading).
    val r = rules(1L -> "a b a b a b")(1L)
    assert(r.getAs[Double]("top_2gram_frac") == 1.0)
    assert(r.getAs[Double]("top_3gram_frac") == 1.0)
    assert(r.getAs[Double]("top_4gram_frac") == 1.3333)
    assert(r.getAs[Int]("r_top_2gram") == 0)
    assert(r.getAs[Int]("rep_pass") == 0)
  }

  test("top-gram count ties break to the longer gram") {
    // grams: "aa bb"×2 (charLen 4), "cc ddd"×2 (charLen 5), rest ×1;
    // total word chars 18 → frac = 2·5/18 = 0.5556 regardless of which
    // tied gram an engine enumerates first.
    val r = rules(1L -> "aa bb aa bb cc ddd cc ddd")(1L)
    assert(r.getAs[Double]("top_2gram_frac") == 0.5556)
  }

  test("duplicated-5-gram chars count occurrences beyond the first only") {
    // 10 tokens of len 2 (20 word chars); the only repeated 5-gram is
    // "x1..x5" (positions 1 and 6), charLen 14-4=10 → dup5 = 10/20 = 0.5.
    val r = rules(1L -> "x1 x2 x3 x4 x5 x1 x2 x3 x4 x5")(1L)
    assert(r.getAs[Double]("dup_5gram_frac") == 0.5)
    assert(r.getAs[Int]("r_dup_5gram") == 0)
    assert(r.getAs[Double]("dup_6gram_frac") == 0.0) // all 6-grams distinct
    assert(r.getAs[Int]("rep_pass") == 0)
  }

  test("duplicate-line fraction and char fraction; blank lines dropped") {
    // 3 non-empty lines, 2 distinct → dup_line_frac = 1/3; all lines 11
    // chars → char frac also 1/3; both breach their A1.2 thresholds.
    val r = rules(1L -> "hello world\nhello world\n   \nuniqueline!")(1L)
    assert(r.getAs[Double]("dup_line_frac") == 0.3333)
    assert(r.getAs[Double]("dup_line_char_frac") == 0.3333)
    assert(r.getAs[Int]("r_dup_line") == 0)
    assert(r.getAs[Int]("r_dup_line_char") == 0)
  }

  test("docs shorter than n tokens, and empty docs, pass vacuously") {
    val m = rules(1L -> "one", 2L -> "", 3L -> "   ")
    for (id <- Seq(1L, 2L, 3L); r = m(id)) {
      assert(r.getAs[Double]("top_2gram_frac") == 0.0)
      assert(r.getAs[Double]("dup_10gram_frac") == 0.0)
      assert(r.getAs[Double]("dup_line_frac") == 0.0)
      assert(r.getAs[Int]("rep_pass") == 1)
    }
  }

  test("clean prose passes every rule") {
    // Long enough that a single occurrence of the longest n-gram stays
    // under the top-gram thresholds (on very short docs even count-1
    // grams trip them — faithful to the count×len coverage reading).
    val prose = "the quick brown fox jumps over the lazy dog while seven " +
      "curious students read ancient maps beside a quiet river and two " +
      "old sailors mend green nets under pale morning light before the " +
      "village market opens with fresh bread ripe fruit and warm tea"
    val r = rules(1L -> prose)(1L)
    assert(r.getAs[Int]("rep_pass") == 1)
  }
}

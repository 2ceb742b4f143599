package graft.llm

import graft.SparkSpec

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("merge sequence matches the hand-computed classic example") {
    // pair counts: u-g 20, p-u 17, u-n 16, h-u 15, ... so merge 1 = (u,g);
    // then u-n 16 beats h-ug 15; then h-ug 15
    val words = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))
      .toDF("w", "freq")
    val merges = TextOps.bpeTrain(words, "w", "freq", nMerges = 3)
    assert(merges === Seq(("u", "g"), ("u", "n"), ("h", "ug")))
  }

  test("greedy leftmost application handles overlapping pairs") {
    // "aaa": the (a,a) merge applies leftmost-nonoverlapping -> [aa, a],
    // then (aa, a) merges the remainder
    val words = Seq(("aaa", 3L)).toDF("w", "freq")
    val merges = TextOps.bpeTrain(words, "w", "freq", nMerges = 5)
    assert(merges === Seq(("a", "a"), ("aa", "a")))
  }

  test("stops early when no pair repeats") {
    val words = Seq(("ab", 1L), ("cd", 1L)).toDF("w", "freq")
    assert(TextOps.bpeTrain(words, "w", "freq", nMerges = 4) === Nil)
  }

  test("single-character and empty words do not crash the pair explode") {
    val words = Seq(("a", 9L), ("", 2L), ("xy", 3L)).toDF("w", "freq")
    val merges = TextOps.bpeTrain(words, "w", "freq", nMerges = 2)
    assert(merges === Seq(("x", "y")))
  }
}

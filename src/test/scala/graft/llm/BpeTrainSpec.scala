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

  test("bpeApply encodes with trained merges: conservation + classic segmentation") {
    import org.apache.spark.sql.functions._
    val merges = Seq(("u", "g"), ("u", "n"), ("h", "ug")) // the classic result
    val df = Seq("hug", "hugs", "pun", "pug", "bun", "xyz")
      .toDF("w")
      .withColumn("syms", TextOps.bpeApply(col("w"), merges))
    val out = df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("hug") === Seq("hug"))
    assert(out("hugs") === Seq("hug", "s"))
    assert(out("pun") === Seq("p", "un"))
    assert(out("pug") === Seq("p", "ug"))
    assert(out("xyz") === Seq("x", "y", "z")) // untouched word stays chars
    // conservation over every word
    assert(df.filter(concat_ws("", col("syms")) =!= col("w")).count() === 0)
  }

  test("local and distributed paths produce the identical merge sequence") {
    // deterministic pseudo-random corpus over a small alphabet so merges
    // chain deeply and ties occur (the tie-break is where paths diverge
    // if the orderings disagree)
    val rnd = new scala.util.Random(42)
    val corpus = (0 until 120).map { _ =>
      val len = 2 + rnd.nextInt(7)
      (Seq.fill(len)(('a' + rnd.nextInt(4)).toChar).mkString, 1L + rnd.nextInt(9))
    } ++ Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))
    val words = corpus.toDF("w", "freq")
    val local = TextOps.bpeTrain(words, "w", "freq", nMerges = 12)
    val dist = TextOps.bpeTrain(words, "w", "freq", nMerges = 12, localThreshold = 0L)
    assert(local === dist,
      s"hybrid paths diverged:\n  local: $local\n  dist:  $dist")
    assert(local.size === 12, s"expected a full 12-merge sequence, got ${local.size}")
  }

  test("classic example is identical through the forced-distributed path") {
    val words = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))
      .toDF("w", "freq")
    assert(TextOps.bpeTrain(words, "w", "freq", nMerges = 3, localThreshold = 0L)
      === Seq(("u", "g"), ("u", "n"), ("h", "ug")))
  }

  test("save/load roundtrips the merge sequence in training order") {
    import org.apache.spark.sql.functions._
    val words = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))
      .toDF("w", "freq")
    val merges = TextOps.bpeTrain(words, "w", "freq", nMerges = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-rt").toString
    try {
      TextOps.bpeSave(spark, merges, dir)
      val loaded = TextOps.bpeLoad(spark, dir)
      // sequence identity includes ORDER — apply order is training order,
      // and ("u","g") before ("h","ug") is load-bearing: the second merge
      // only exists because the first already produced "ug"
      assert(loaded === merges)
      assert(loaded === Seq(("u", "g"), ("u", "n"), ("h", "ug")))
      // encoding with the loaded artifact is identical to the live list
      val enc = words.select(col("w"),
        TextOps.bpeApply(col("w"), merges).as("a"),
        TextOps.bpeApply(col("w"), loaded).as("b"))
      assert(enc.filter(col("a") =!= col("b")).count() === 0)
    } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("empty merge list persists and loads as the character tokenizer") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-empty").toString
    try {
      TextOps.bpeSave(spark, Seq.empty, dir)
      val loaded = TextOps.bpeLoad(spark, dir)
      assert(loaded.isEmpty)
      val out = Seq("hug").toDF("w")
        .select(TextOps.bpeApply(col("w"), loaded).as("syms"))
        .head().getSeq[String](0)
      assert(out === Seq("h", "u", "g"))
    } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("bpeApplyBig matches bpeApply word-for-word on a trained merge table") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 150).map { i =>
      val len = 1 + rnd.nextInt(8)
      (Seq.fill(len)(('a' + rnd.nextInt(4)).toChar).mkString, 1L + rnd.nextInt(9))
    } ++ Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L), ("", 1L))
    val words = corpus.zipWithIndex
      .map { case ((w, f), i) => (i.toLong, w, f) }.toDF("id", "w", "freq")
    val merges = TextOps.bpeTrain(words.select("w", "freq"), "w", "freq", nMerges = 12)
    assert(merges.size === 12)
    val viaColumn = words
      .select(col("id"), TextOps.bpeApply(col("w"), merges).as("syms"))
    val viaPartitions = TextOps.bpeApplyBig(words, "id", "w", merges)
    assert(viaColumn.count() === viaPartitions.count())
    val diff = viaColumn.join(viaPartitions.withColumnRenamed("syms", "syms2"), "id")
      .filter(col("syms") =!= col("syms2"))
    assert(diff.count() === 0,
      s"scale path diverged from the column fold: ${diff.take(3).toSeq}")
  }

  test("bpeApplyBig matches the sequential fold even on an INCONSISTENT merge table") {
    import org.apache.spark.sql.functions._
    // (q,xa) ranked BEFORE the (x,a) that creates "xa": the sequential
    // fold never revisits rank 0 after rank 1 produces its operand, so
    // "qxa" must encode to [q, xa] — a min-present-rank tokenizer would
    // wrongly produce [qxa]
    val merges = Seq(("q", "xa"), ("x", "a"))
    val words = Seq((0L, "qxa"), (1L, "xaq"), (2L, "qxaxa")).toDF("id", "w")
    val viaColumn = words.select(col("id"), TextOps.bpeApply(col("w"), merges).as("syms"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaColumn(0L) === Seq("q", "xa"))
    val big = TextOps.bpeApplyBig(words, "id", "w", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(big === viaColumn)
  }

  test("bpeApplyBig keeps surrogate pairs intact (split(\"\") code-point semantics)") {
    import org.apache.spark.sql.functions._
    val words = Seq((0L, "a😀b"), (1L, "日本語")).toDF("id", "w")
    val out = TextOps.bpeApplyBig(words, "id", "w", Seq.empty)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(0L) === Seq("a", "😀", "b"))
    assert(out(1L) === Seq("日", "本", "語"))
    // and the column split agrees
    val colSplit = words.select(col("id"), TextOps.bpeApply(col("w"), Seq.empty).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(colSplit === out)
  }

  test("bpeDecode inverts bpeApply for any merge list, including unicode") {
    import org.apache.spark.sql.functions._
    val merges = Seq(("u", "g"), ("u", "n"), ("h", "ug"))
    val df = Seq("hug", "hugs", "pun", "xyz", "héllo", "日本語", "")
      .toDF("w")
      .withColumn("back", TextOps.bpeDecode(TextOps.bpeApply(col("w"), merges)))
    assert(df.filter(col("back") =!= col("w")).count() === 0)
  }
}

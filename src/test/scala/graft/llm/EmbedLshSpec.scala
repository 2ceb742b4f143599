package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the scale contract of the adaptive-width embedding LSH: the
  * band-key width grows with the corpus so candidate-pair counts stay
  * O(N · targetBucketRows) — the fixed-width failure mode (candidates
  * O(N²/constant)) would show here as ~quadratic growth on the 10×
  * corpus. */
class EmbedLshSpec extends SparkSpec {

  test("adaptive bits: integer-exact ceil(log2(n/target)), clamped") {
    // the live q57/q39 widths at the three test SFs
    assert(EmbedLsh.adaptiveBits(500, 16, 2, 20) === 5)
    assert(EmbedLsh.adaptiveBits(2000, 16, 2, 20) === 7)
    assert(EmbedLsh.adaptiveBits(500, 32, 2, 16) === 4)
    assert(EmbedLsh.adaptiveBits(2000, 32, 2, 16) === 6)
    // clamps
    assert(EmbedLsh.adaptiveBits(1, 16, 2, 20) === 2)
    assert(EmbedLsh.adaptiveBits(16, 16, 2, 20) === 2)
    assert(EmbedLsh.adaptiveBits(1L << 40, 16, 2, 20) === 20)
    // exact power-of-two boundary: n = target · 2^k → exactly k bits
    assert(EmbedLsh.adaptiveBits(16 * 64, 16, 2, 20) === 6)
    assert(EmbedLsh.adaptiveBits(16 * 64 + 1, 16, 2, 20) === 7)
  }

  test("adaptive bits SQL mirrors the Scala formula on the live corpus sizes") {
    // the oracle embeds adaptiveBitsSql over count(*); evaluate the same
    // scalar through Spark SQL's floor/log-free arithmetic equivalent by
    // checking the formula's closed form on known counts instead
    for (n <- Seq(1L, 16L, 17L, 500L, 1024L, 2000L, 100000L)) {
      val m = (n - 1) / 16
      val sqlBits = math.min(20, math.max(2,
        if (m == 0) 1 else java.lang.Long.toBinaryString(m).length))
      assert(EmbedLsh.adaptiveBits(n, 16, 2, 20) === sqlBits,
        s"Scala/SQL bits diverge at n=$n")
    }
  }

  /** Deterministic pseudo-random embeddings, independent of the LSH
    * hyperplane formula (hash-mixed, not the 2654435761 weights). */
  private def synth(n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      array((0 until EmbedLsh.EmbDim).map(d =>
        ((pmod(hash(col("id"), lit(d)), lit(2001)) - 1000).cast("double") / 1000.0)): _*)
        .as("emb"))

  test("candidate pairs grow ~linearly on a 10x corpus (the 100x scale audit)") {
    def candCount(n: Long): Long = {
      val bits = EmbedLsh.adaptiveBits(n,
        EmbedLsh.BandTarget, EmbedLsh.BandMinBits, EmbedLsh.BandMaxBits)
      EmbedLsh.candidatePairs(EmbedLsh.bandKeys(synth(n), bits)).count()
    }
    val n1 = 1000L
    val n2 = 10000L
    val c1 = candCount(n1)
    val c2 = candCount(n2)
    // absolute bound: bands · N · targetBucketRows, with 2x slack for
    // bucket-occupancy variance (E[pairs] ≈ bands · N · target / 2)
    assert(c1 <= EmbedLsh.NumBands * n1 * EmbedLsh.BandTarget * 2, s"c1=$c1")
    assert(c2 <= EmbedLsh.NumBands * n2 * EmbedLsh.BandTarget * 2, s"c2=$c2")
    // growth bound: linear would be ~10x; fixed-width quadratic ~100x
    assert(c2 <= c1 * 40, s"candidates grew superlinearly: $c1 -> $c2")
    assert(c1 > 0 && c2 > 0, "degenerate corpus: no candidates at all")
  }

  test("ANN multi-probe keys: own bucket plus each Hamming-1 neighbor, all distinct") {
    import spark.implicits._
    val bits = 4
    val out = Seq(5L).toDF("bucket")
      .select(explode(EmbedLsh.probeKeys(col("bucket"), bits)).as("pkey"))
      .collect().map(_.getLong(0))
    assert(out.length === bits + 1)
    assert(out.distinct.length === out.length, "probe keys must be distinct")
    assert(out.head === 5L)
    assert(out.toSet === Set(5L, 4L, 7L, 1L, 13L))
  }
}

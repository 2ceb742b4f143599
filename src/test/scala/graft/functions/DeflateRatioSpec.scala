package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[DeflateRatio]] — the compression-ratio repetition proxy: value
  * properties on crafted strings plus the codegen pin. */
class DeflateRatioSpec extends SparkSpec {
  import spark.implicits._

  private def ratioOf(s: String): Double =
    Seq(s).toDF("t").select(call_function("deflate_ratio", col("t"))).head().getDouble(0)

  test("repetitive text compresses far below varied text; empty is 0") {
    val rep = ratioOf("spark " * 200)
    val varied = ratioOf((0 until 200).map(i => s"w${i * 7919}").mkString(" "))
    assert(rep < varied / 2, s"repetition not separated: rep=$rep varied=$varied")
    assert(rep > 0.0 && varied > 0.0)
    assert(ratioOf("") === 0.0)
  }

  test("doubling a text never raises its ratio; evaluation is deterministic") {
    for (s <- Seq("alpha beta gamma delta", "x", "spark " * 50)) {
      assert(ratioOf(s + s) <= ratioOf(s) + 1e-9, s"doubling raised ratio for '$s'")
    }
    val twice = Seq.fill(2)(ratioOf("the quick brown fox jumps over the lazy dog"))
    assert(twice.head === twice.last)
  }

  test("worst-case bound holds even on incompressible-ish short input") {
    // ~11 bytes of zlib wrapper dominate tiny inputs; the bound the
    // q153 gate uses (len·1.001 + 64) must hold with margin
    for (s <- Seq("a", "qz", "k9#x!", "abcdefghij")) {
      val r = ratioOf(s)
      assert(r * s.length <= s.length * 1.001 + 64.0, s"bound broken for '$s': $r")
    }
  }

  test("the expression stays inside whole-stage codegen") {
    val batch = spark.range(64).select(concat(lit("doc "), col("id")).as("t"))
    val exec = batch.select(call_function("deflate_ratio", col("t")))
      .queryExecution.executedPlan
    val spans = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, s"no codegen span:\n$exec")
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("matches the composed aggregate/zip_with formulation exactly") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, -5.0, 6.0)),
      (Seq(0.5, 0.0, -1.5), Seq(0.5, 0.0, -1.5)),
      (Seq(1e-8, 2e8, 3.0), Seq(-1.0, 1e-9, 2.0))
    ).toDF("a", "b")
    def composedDot(a: String, b: String) =
      expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    val out = df.select(
      call_function("cosine_sim", $"a", $"b").as("native"),
      (composedDot("a", "b") /
        (sqrt(composedDot("a", "a")) * sqrt(composedDot("b", "b")))).as("composed"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) === r.getDouble(1),
      s"native ${r.getDouble(0)} != composed ${r.getDouble(1)}"))
    // identical vectors → exactly 1.0 within fp tolerance
    assert(math.abs(out(1).getDouble(0) - 1.0) < 1e-12)
  }

  test("rolling_hash matches the per-character ascii fold and the known vector") {
    val df = Seq("abc", "the quick brown fox", "", "a").toDF("t")
    val out = df.select(
      call_function("rolling_hash", $"t").as("native"),
      expr("aggregate(filter(split(t, ''), c -> c <> ''), 0L, " +
        "(acc, c) -> (acc * 31 + ascii(c)) % 1000000007)").as("composed")).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // cross-checked against DuckDB list_reduce during oracle design
    assert(out(0).getLong(0) === 96354L)
  }

  test("mismatched array lengths yield null (not a truncated similarity)") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)),        // mismatch -> null
      (Seq(1.0, 2.0), Seq(1.0, 2.0))              // match -> 1.0
    ).toDF("a", "b")
    val rows = df.select(call_function("cosine_sim", $"a", $"b")).collect()
    assert(rows(0).isNullAt(0), "length mismatch must be null")
    assert(math.abs(rows(1).getDouble(0) - 1.0) < 1e-12)
    // interpreted path agrees with codegen
    val ev = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0, 3.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))).eval(null)
    assert(ev == null)
  }

  test("null inputs propagate null, and codegen path is exercised") {
    val df = Seq((Some(Seq(1.0, 2.0)), None: Option[Seq[Double]])).toDF("a", "b")
    val r = df.select(call_function("cosine_sim", $"a", $"b")).head()
    assert(r.isNullAt(0))
    // interpreted eval agrees with the codegen'd result
    val ev = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3.0, 4.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(4.0, 3.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))).eval(null)
    assert(math.abs(ev.asInstanceOf[Double] - 24.0 / 25.0) < 1e-12)
  }
}

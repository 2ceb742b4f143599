package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SqDistSpec extends SparkSpec {
  import spark.implicits._

  test("matches the aggregate/zip_with fold bit-for-bit (same accumulation order)") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, -5.0, 6.0)),
      (Seq(0.5, 0.0, -1.5), Seq(0.5, 0.0, -1.5)),
      (Seq(1e-8, 2e8, 3.0), Seq(-1.0, 1e-9, 2.0)),
      (Seq.empty[Double], Seq.empty[Double])
    ).toDF("a", "b")
    val out = df.select(
      call_function("sq_dist", $"a", $"b").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D, " +
        "(acc, d) -> acc + d)").as("composed"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) === r.getDouble(1),
      s"native ${r.getDouble(0)} != composed ${r.getDouble(1)}"))
    assert(out(1).getDouble(0) === 0.0) // identical vectors -> exactly 0
    assert(out(3).getDouble(0) === 0.0) // empty vectors -> 0, not null/NaN
  }

  test("mismatched lengths and null inputs yield null") {
    val rows = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(1.0, 2.0))), // mismatch
      (Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]) // null child
    ).toDF("a", "b")
      .select(call_function("sq_dist", $"a", $"b")).collect()
    assert(rows(0).isNullAt(0), "length mismatch must be null")
    assert(rows(1).isNullAt(0), "null child must propagate null")
    // interpreted path agrees with codegen on the mismatch case
    val ev = SqDist(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0, 3.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))).eval(null)
    assert(ev == null)
  }

  test("stays inside whole-stage codegen on the scan-project path") {
    // a range-derived source: a literal frame constant-folds to a
    // LocalTableScan and never exercises the generated loop
    val df = spark.range(4).select(
      transform(sequence(lit(0L), col("id")), i => i.cast("double")).as("a"),
      transform(sequence(lit(0L), col("id")), i => (i * 2).cast("double")).as("b"))
      .select(call_function("sq_dist", col("a"), col("b")).as("d"))
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"),
      "sq_dist projection fell out of whole-stage codegen")
    // id = n: a = [0..n], b = [0,2..2n] -> sum i² for i in 0..n
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(0.0, 1.0, 5.0, 14.0))
  }
}

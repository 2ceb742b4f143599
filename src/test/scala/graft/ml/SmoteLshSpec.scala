package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SmoteLshSpec extends SparkSpec {
  import spark.implicits._

  private def imbalanced(nMaj: Int, nMin: Int) =
    ((0 until nMaj).map(i => (i * 1.0, -i * 2.0, 0)) ++
      (0 until nMin).map(i => (100.0 + 3 * i, 50.0 + i, 1))).toDF("x1", "x2", "label")

  test("balances the classes exactly, like the broadcast SMOTE") {
    val df = imbalanced(80, 7)
    val out = new SmoteLsh(Seq("x1", "x2"), "label").transform(df)
    val counts = out.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(0) === 80L && counts(1) === 80L)
  }

  test("synthetic points stay inside the minority bounding box") {
    val df = imbalanced(60, 10)
    val out = new SmoteLsh(Seq("x1", "x2"), "label").transform(df)
    // minority box: x1 in [100, 127], x2 in [50, 59]; interpolation (and
    // the singleton-bucket duplicate fallback) cannot leave the box
    val outside = out.filter(col("label") === 1)
      .filter(col("x1") < 100.0 || col("x1") > 127.0 ||
        col("x2") < 50.0 || col("x2") > 59.0).count()
    assert(outside === 0L)
  }

  test("output is deterministic under repartitioning (seeded, order-free)") {
    val df = imbalanced(50, 6)
    def run(d: org.apache.spark.sql.DataFrame) =
      new SmoteLsh(Seq("x1", "x2"), "label").transform(d)
        .filter(col("label") === 1)
        .select(round(col("x1"), 9), round(col("x2"), 9))
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).sorted.toSeq
    val a = run(df)
    val b = run(df.repartition(7))
    assert(a === b, "synthetic multiset changed under repartition")
  }

  test("neighbors come from nearby points (bucket locality beats global noise)") {
    // two far-apart minority clusters: interpolation must stay within a
    // cluster (LSH buckets separate them), never bridge the gap
    val df = ((0 until 60).map(i => (i * 1.0, 0.0, 0)) ++
      (0 until 6).map(i => (1000.0 + i, 1000.0 + i, 1)) ++
      (0 until 6).map(i => (-1000.0 - i, -1000.0 - i, 1))).toDF("x1", "x2", "label")
    val out = new SmoteLsh(Seq("x1", "x2"), "label", nBits = 2).transform(df)
    val synth = out.filter(col("label") === 1).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    // no synthetic point may land in the empty middle band
    val bridging = synth.count { case (x1, _) => x1 > -900 && x1 < 900 }
    assert(bridging === 0, s"$bridging synthetic points bridged the clusters")
  }
}

package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StratifySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 500).map(i => (i.toLong, i % 3, if (i % 10 == 0) 1 else 0))
    .toDF("id", "sub", "label")

  test("class rank is a permutation of 1..n within each class") {
    val ranked = Stratify.withClassRank(df, "label", Seq("id"))
    val byClass = ranked.groupBy("label").agg(
      count(lit(1)).as("n"), min("__rn").as("lo"), max("__rn").as("hi"),
      countDistinct("__rn").as("nd")).collect()
    byClass.foreach { r =>
      val (n, lo, hi, nd) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo === 1L && hi === n && nd === n,
        s"class ${r.get(0)}: ranks not a permutation (n=$n lo=$lo hi=$hi distinct=$nd)")
    }
  }

  test("rank assignment is deterministic under repartitioning") {
    val a = Stratify.withClassRank(df, "label", Seq("id"))
      .select("id", "__rn").orderBy("id").collect().toSeq
    val b = Stratify.withClassRank(df.repartition(13), "label", Seq("id"))
      .select("id", "__rn").orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("adaptive bucket count grows with the input and clamps at both ends") {
    assert(Stratify.adaptiveBuckets(500) === Stratify.MinBuckets)        // small input: floor
    assert(Stratify.adaptiveBuckets(1L << 30) === 1024)                   // 2^30 / 2^20
    assert(Stratify.adaptiveBuckets(1L << 45) === Stratify.MaxBuckets)    // cap
    assert(Stratify.adaptiveBuckets(0) === Stratify.MinBuckets)
    // boundary: n = k·target → exactly k (when above the floor)
    assert(Stratify.adaptiveBuckets(100 << 20) === 100)
  }

  test("rank invariants hold at two adaptively chosen bucket counts") {
    // force two different adaptive sizes on the same 500-row input:
    // default target → MinBuckets (64); target=4 → 125 buckets
    for (target <- Seq(Stratify.TargetRowsPerBucket, 4L)) {
      val ranked = Stratify.withClassRank(df, "label", Seq("id"), targetRows = target)
      ranked.groupBy("label").agg(
        count(lit(1)).as("n"), min("__rn").as("lo"), max("__rn").as("hi"),
        countDistinct("__rn").as("nd")).collect().foreach { r =>
        val (n, lo, hi, nd) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        assert(lo === 1L && hi === n && nd === n,
          s"target=$target class ${r.get(0)}: not a permutation (n=$n lo=$lo hi=$hi nd=$nd)")
      }
      // membership stays deterministic under repartitioning at this width
      val a = Stratify.withClassRank(df, "label", Seq("id"), targetRows = target)
        .select("id", "__rn").orderBy("id").collect().toSeq
      val b = Stratify.withClassRank(df.repartition(13), "label", Seq("id"), targetRows = target)
        .select("id", "__rn").orderBy("id").collect().toSeq
      assert(a === b)
    }
  }

  test("folds are exactly balanced per class") {
    val folded = Stratify.withFold(df, "label", Seq("id"), k = 5)
    val counts = folded.groupBy("label", "fold").count()
      .collect().map(_.getLong(2))
    // 450 majority / 50 minority over 5 folds: each fold within ±1 of n/k
    val perClass = folded.groupBy("label").count().collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    folded.groupBy("label", "fold").count().collect().foreach { r =>
      val expect = perClass(r.get(0)).toDouble / 5
      assert(math.abs(r.getLong(2) - expect) <= 1,
        s"label ${r.get(0)} fold ${r.get(1)}: ${r.getLong(2)} vs ~$expect")
    }
    assert(counts.sum === 500)
  }
}

package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SmoteSpec extends SparkSpec {
  import spark.implicits._

  private def imbalanced(nMaj: Int, nMin: Int) = {
    val maj = (0 until nMaj).map(i => (i * 0.5, i * 0.25 + 10.0, 0))
    val min = (0 until nMin).map(i => (100.0 + i, 200.0 + 2 * i, 1))
    (maj ++ min).toDF("x1", "x2", "label")
  }

  test("balances classes exactly to the majority count") {
    val out = new Smote(Seq("x1", "x2"), "label").transform(imbalanced(50, 7))
    val counts = out.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(0) === 50L)
    assert(counts(1) === 50L)
  }

  test("is deterministic under repartitioning") {
    val src = imbalanced(40, 6)
    val a = new Smote(Seq("x1", "x2"), "label").transform(src)
      .orderBy("x1", "x2", "label").collect().toSeq
    val b = new Smote(Seq("x1", "x2"), "label").transform(src.repartition(7))
      .orderBy("x1", "x2", "label").collect().toSeq
    assert(a === b)
  }

  test("synthetic points lie on segments between minority rows") {
    // With exactly 2 minority rows every synthetic point must be a convex
    // combination of them: colinear and inside the bounding box.
    val out = new Smote(Seq("x1", "x2"), "label").transform(imbalanced(20, 2))
    val synth = out.filter(col("label") === 1).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
      .filterNot { case (x1, _) => x1 == 100.0 || x1 == 101.0 } // originals
    assert(synth.nonEmpty)
    synth.foreach { case (x1, x2) =>
      assert(x1 >= 100.0 && x1 <= 101.0, s"x1 $x1 outside parent segment")
      val expected = 200.0 + 2.0 * (x1 - 100.0) // the segment's line
      assert(math.abs(x2 - expected) < 1e-9, s"($x1,$x2) not on segment")
    }
  }

  test("rejects a single-row minority class") {
    val ex = intercept[IllegalArgumentException] {
      new Smote(Seq("x1", "x2"), "label").transform(imbalanced(10, 1))
    }
    assert(ex.getMessage.contains("minority"))
  }

  test("already-balanced input passes through with double schema") {
    val out = new Smote(Seq("x1", "x2"), "label").transform(imbalanced(5, 5))
    assert(out.count() === 10)
    assert(out.schema("x1").dataType.typeName === "double")
    assert(out.schema("x2").dataType.typeName === "double")
  }

  test("rejects a minority matrix over the broadcast guard") {
    val ex = intercept[IllegalArgumentException] {
      new Smote(Seq("x1", "x2"), "label", maxMinorityCells = 8L)
        .transform(imbalanced(50, 7))
    }
    assert(ex.getMessage.contains("broadcast guard"))
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Encoders, functions => F}
import org.apache.spark.sql.functions._

class AucSketchSpec extends SparkSpec {
  import spark.implicits._

  private def aucUdaf(bins: Int) = F.udaf(new AucSketch(bins),
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaInt))

  test("perfect separation scores AUC 1.0; random labels near 0.5") {
    val perfect = (1 to 200).map(i => (if (i <= 100) 0.9 + i * 1e-4 else 0.1 + i * 1e-4,
      if (i <= 100) 1 else 0)).toDF("score", "label")
    val a1 = perfect.agg(aucUdaf(1000)($"score", $"label")).head().getDouble(0)
    assert(math.abs(a1 - 1.0) < 0.01, s"perfect AUC = $a1")
    val rand = (1 to 2000).map { i =>
      val u = ((i * 2654435761L) % 1000) / 1000.0
      (u, (i * 7919) % 2)
    }.toDF("score", "label")
    val a2 = rand.agg(aucUdaf(1000)($"score", $"label")).head().getDouble(0)
    assert(math.abs(a2 - 0.5) < 0.05, s"random AUC = $a2")
  }

  test("sketch agrees with the exact windowed AUC within bin resolution") {
    // mirror the q44-q46 deterministic score/label over a small table
    val df = (1 to 3000).map { i =>
      val u = ((i * 9973L + 7919L) % 1000) / 1000.0
      val label = if (i % 4 == 0) 1 else 0
      val score = if (label == 1) 0.3 + 0.7 * u else 0.66 * u
      (score, label)
    }.toDF("score", "label")
    val sketch = df.agg(aucUdaf(1000)($"score", $"label")).head().getDouble(0)
    // exact AUC via the rank-sum (Mann-Whitney) identity
    val rows = df.collect().map(r => (r.getDouble(0), r.getInt(1)))
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val wins = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val exact = wins / (pos.length.toDouble * neg.length)
    assert(math.abs(sketch - exact) < 0.01, s"sketch $sketch vs exact $exact")
  }

  test("is partition-order invariant (merge correctness)") {
    val df = (1 to 1000).map(i => (((i * 31) % 100) / 100.0, i % 2)).toDF("score", "label")
    val a = df.repartition(1).agg(aucUdaf(500)($"score", $"label")).head().getDouble(0)
    val b = df.repartition(17).agg(aucUdaf(500)($"score", $"label")).head().getDouble(0)
    assert(a === b)
  }

  test("scores outside [0,1] clamp to the edge bins instead of crashing") {
    val df = Seq((-0.3, 0), (1.7, 1), (Double.NaN, 0), (0.5, 1), (0.2, 0))
      .toDF("score", "label")
    val a = df.agg(aucUdaf(100)($"score", $"label")).head().getDouble(0)
    // -0.3 and NaN land in bin 0, 1.7 in the top bin: a well-defined AUC
    assert(!a.isNaN && a >= 0.0 && a <= 1.0)
  }

  test("degenerate single-class input yields NaN, not a crash") {
    val df = (1 to 50).map(i => (i / 100.0, 1)).toDF("score", "label")
    val a = df.agg(aucUdaf(100)($"score", $"label")).head().getDouble(0)
    assert(a.isNaN)
  }
}

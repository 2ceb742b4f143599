package graft.xai

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinearShapSpec extends SparkSpec {
  import spark.implicits._

  private val feats = Seq("a", "b", "c")
  private val coefs = Seq(2.0, -1.0, 0.5)
  private val mu = Seq(1.0, 2.0, 0.0)

  private lazy val df = Seq(
    (1.0, 2.0, 4.0), (3.0, 0.0, -2.0), (0.5, 5.0, 1.0)
  ).toDF("a", "b", "c")

  test("phi matches the closed form coef*(x - mu)") {
    val out = LinearShap.attribute(df, feats, coefs, mu).collect()
    out.foreach { r =>
      val (a, b, c) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      val phi = r.getSeq[Double](r.fieldIndex("phi"))
      assert(math.abs(phi(0) - 2.0 * (a - 1.0)) < 1e-12)
      assert(math.abs(phi(1) - (-1.0) * (b - 2.0)) < 1e-12)
      assert(math.abs(phi(2) - 0.5 * c) < 1e-12)
    }
  }

  test("margin is intercept + coef.x and score is its sigmoid") {
    val out = LinearShap.attribute(df, feats, coefs, mu, intercept = 0.25).collect()
    out.foreach { r =>
      val (a, b, c) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      val margin = 0.25 + 2.0 * a - b + 0.5 * c
      assert(math.abs(r.getDouble(r.fieldIndex("margin")) - margin) < 1e-12)
      assert(math.abs(r.getDouble(r.fieldIndex("score")) - 1.0 / (1.0 + math.exp(-margin))) < 1e-12)
    }
  }

  test("shap_values map carries the named attributions (JSONB shape)") {
    val out = LinearShap.attribute(df, feats, coefs, mu)
    val m = out.select(col("shap_values")).head().getMap[String, Double](0)
    assert(m.keys.toSet === feats.toSet)
  }

  test("topFeatures ranks by mean |phi|") {
    val ranked = LinearShap.topFeatures(
      LinearShap.attribute(df, feats, coefs, mu), feats, 3).collect()
    assert(ranked.length === 3)
    val vals = ranked.map(_.getDouble(1)).toSeq
    assert(vals === vals.sorted.reverse)
    assert(ranked.head.getString(0) === "a") // coef 2.0 dominates
  }
}

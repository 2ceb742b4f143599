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

  test("attributions from a FITTED LR model reproduce its predict_proba (M5+M7 parity)") {
    import graft.ml.FraudPipeline
    val eval = FraudPipeline.syntheticEvalSet(spark, 500, seed = 21L)
    val featNames = (0 until 10).map(i => s"f$i")
    val model = FraudPipeline.logisticPipeline(featNames, maxIter = 30).fit(eval)
    // unpack the fitted stages: scaler stats + LR coefficients
    val scaler = model.stages(1).asInstanceOf[org.apache.spark.ml.feature.StandardScalerModel]
    val lr = model.stages(2).asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    val mu = scaler.mean.toArray
    val sigma = scaler.std.toArray
    val coefs = lr.coefficients.toArray
    // the served model scores z-scaled features; expressing the same
    // linear form on RAW features: coef'_i = coef_i/sigma_i, with the
    // means folded into the intercept — exactly the closed-form SHAP
    // background transformation (api/worker.py:52-53)
    val rawCoefs = coefs.zip(sigma).map { case (c, s0) => c / s0 }
    val rawIntercept = lr.intercept - rawCoefs.zip(mu).map { case (c, m) => c * m }.sum
    val attributed = LinearShap.attribute(
      eval, featNames, rawCoefs.toSeq, mu.toSeq, rawIntercept)
    val scored = FraudPipeline.scoreDF(model, eval)
      .select(col("f0"), col("f1"), col("score"))
    val joined = attributed.select(col("f0"), col("f1"), col("score").as("shap_score"))
      .join(scored, Seq("f0", "f1"))
    val maxDiff = joined
      .select(max(abs(col("shap_score") - col("score")))).head().getDouble(0)
    assert(maxDiff < 1e-9, s"closed-form score drifts from model predict_proba by $maxDiff")
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

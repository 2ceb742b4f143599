package graft.xai

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form linear SHAP (SURVEY §2.8 M7-M9; reference
  * api/worker.py:52-53,75 `shap.LinearExplainer` and xai_tasks.py:104-110
  * coef·x attribution).
  *
  * For a linear model with coefficients `coef` and background mean `μ`,
  * the interventional SHAP value of feature i is exactly
  * φᵢ = coefᵢ · (xᵢ − μᵢ). With μ = 0 this degrades to the coef·x
  * attribution of xai_tasks.py (M8).
  *
  * Everything is column arithmetic on broadcast literal arrays — no UDF,
  * no shuffle; the whole attribution stays inside whole-stage codegen.
  */
object LinearShap {

  /** Appends:
    *  - `phi`          array<double> — per-feature attributions
    *  - `shap_values`  map<string,double> — named attributions (the
    *                   JSONB payload shape of transaction_results;
    *                   db/models.py:19-21, F11)
    *  - `margin`       double — intercept + Σ coefᵢ·xᵢ
    *  - `score`        double — sigmoid(margin) = P(class=1)
    */
  def attribute(df: DataFrame, featureCols: Seq[String], coefs: Seq[Double],
      mu: Seq[Double], intercept: Double = 0.0): DataFrame = {
    require(featureCols.size == coefs.size && coefs.size == mu.size,
      s"arity mismatch: ${featureCols.size} features, ${coefs.size} coefs, ${mu.size} mu")
    val x = array(featureCols.map(c => col(c).cast("double")): _*)
    val coefArr = array(coefs.map(lit): _*)
    val muArr = array(mu.map(lit): _*)
    val phi = zip_with(coefArr, zip_with(x, muArr, (xi, mi) => xi - mi), (c, v) => c * v)
    val margin = aggregate(zip_with(coefArr, x, (c, xi) => c * xi), lit(intercept), (a, v) => a + v)
    df.withColumn("phi", phi)
      .withColumn("shap_values",
        map_from_arrays(array(featureCols.map(lit): _*), col("phi")))
      .withColumn("margin", margin)
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-col("margin"))))
  }

  /** A6+W2/M9: global mean-|φ| importance of each feature, ranked. */
  def topFeatures(attributed: DataFrame, featureCols: Seq[String], k: Int): DataFrame = {
    val meanAbs = attributed.select(
      featureCols.indices.map(i => avg(abs(col("phi").getItem(i))).as(s"m$i")): _*)
    val stacked = meanAbs.select(expr(
      s"stack(${featureCols.size}, " +
        featureCols.zipWithIndex.map { case (n, i) => s"'$n', m$i" }.mkString(", ") +
        ") AS (feature, mean_abs_phi)"))
    stacked.orderBy(col("mean_abs_phi").desc, col("feature")).limit(k)
  }
}

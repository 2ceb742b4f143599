package graft.sources

import graft.SparkSpec
import graft.ml.FraudPipeline
import java.nio.file.Files

class ModelRegistrySpec extends SparkSpec {

  test("registry alias resolves with local fallback (S6)") {
    val reg = Map("models:/fraud@production" -> "/models/v7")
    assert(ModelRegistry.resolve("models:/fraud@production", reg, "/fallback") === "/models/v7")
    assert(ModelRegistry.resolve("models:/fraud@staging", reg, "/fallback") === "/fallback")
  }

  test("feature-name JSON sidecar roundtrips in order (S5)") {
    val p = Files.createTempDirectory("graft-sidecar").toString + "/feature_names.json"
    ModelRegistry.writeFeatureNames(p, FraudPipeline.featureNames)
    assert(ModelRegistry.readFeatureNames(p) === FraudPipeline.featureNames)
  }

  test("signature captures input/output schema DDL (M10)") {
    val eval = FraudPipeline.syntheticEvalSet(spark, 50, seed = 5L)
    val model = FraudPipeline.logisticPipeline((0 until 10).map(i => s"f$i"), maxIter = 5)
      .fit(eval)
    val (in, out) = ModelRegistry.signature(eval.schema, model.transform(eval).schema)
    assert(in.contains("f0 DOUBLE") && in.contains("Class INT"))
    assert(out.contains("prediction") && out.contains("probability"))
  }

  test("ensure-table DDL is idempotent (S11)") {
    ModelRegistry.ensureResultsTable(spark, "tmp_results")
    ModelRegistry.ensureResultsTable(spark, "tmp_results") // second call: no-op
    val cols = spark.table("tmp_results").columns.toSeq
    assert(cols === Seq("transaction_id", "prediction_score", "shap_values", "status", "updated_at"))
    spark.sql("DROP TABLE tmp_results")
  }

  test("arity validation yields the 422 message shape (P5)") {
    assert(ModelRegistry.validateArity(Seq.fill(30)(0.0), 30).isEmpty)
    val err = ModelRegistry.validateArity(Seq.fill(7)(0.0), 30)
    assert(err.exists(_.contains("expected 30 features, got 7")))
  }
}

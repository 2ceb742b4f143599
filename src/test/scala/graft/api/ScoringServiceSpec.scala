package graft.api

import graft.SparkSpec
import graft.ml.FraudPipeline
import graft.streaming.ScoringStream
import java.nio.file.Files

class ScoringServiceSpec extends SparkSpec {

  private lazy val feats = (0 until 10).map(i => s"f$i")
  private lazy val model = FraudPipeline
    .logisticPipeline(feats, maxIter = 20)
    .fit(FraudPipeline.syntheticEvalSet(spark, 400, seed = 31L))
  private lazy val service = new ScoringService(spark, model, feats,
    new ScoringStream.ResultStore(Files.createTempDirectory("graft-api").toString))

  test("predict validates arity with 422 semantics") {
    val bad = service.predict("t0", Seq(1.0, 2.0))
    assert(bad.isLeft)
    assert(bad.swap.toOption.get.contains("expected 10 features, got 2"))
  }

  test("predict returns class, P(1), correlation id, and queues the explanation") {
    val out = service.predict("t1", Seq(3.0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    assert(out.isRight)
    val p = out.toOption.get
    assert(p.prediction === 1 && p.score > 0.9)
    assert(p.message === "Calculation queued")
    assert(p.correlationId.nonEmpty)
  }

  test("explain point-lookup returns the upserted attribution row") {
    service.predict("t2", Seq(-3.0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    val row = service.explain("t2")
    assert(row.isDefined)
    val r = row.get
    assert(r.getString(r.fieldIndex("status")) === "COMPLETED")
    assert(r.getString(r.fieldIndex("shap_values")).contains("\"f0\""))
    // the async-path score equals the sync predict score (same model form)
    val syncScore = service.predict("t2b", Seq(-3.0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
      .toOption.get.score
    assert(math.abs(r.getDouble(r.fieldIndex("prediction_score")) - syncScore) < 1e-5)
  }

  test("health reports model + completion rollup") {
    service.predict("t3", Seq(1.0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    val h = service.health()
    assert(h.modelLoaded)
    assert(h.total >= 1 && h.completed === h.total)
  }

  test("unknown transaction id explains to None") {
    assert(service.explain("nope").isEmpty)
    assert(service.explainJson("nope").isEmpty)
  }

  test("explain on an EMPTY store is None, not an AnalysisException") {
    val fresh = new ScoringService(spark, model, feats,
      new ScoringStream.ResultStore(Files.createTempDirectory("graft-api-empty").toString))
    assert(fresh.explain("anything").isEmpty)
    assert(fresh.explainJson("anything").isEmpty)
  }

  test("explainJson keeps the shap_values key (null) for FAILED rows") {
    val store = new ScoringStream.ResultStore(
      Files.createTempDirectory("graft-api-failed").toString)
    val svc = new ScoringService(spark, model, feats, store)
    import spark.implicits._
    val batch = Seq(("tfail", Map.empty[String, Double])).toDF("transaction_id", "features")
    store.upsertLabeled(
      ScoringStream.scoreBatch(batch, feats, feats.map(_ => 0.1), feats.map(_ => 0.0), 0.0),
      label = "tfail", order = ScoringStream.nextWriteStamp())
    val payload = svc.explainJson("tfail").get
    assert(payload.contains("\"shap_values\":null"), payload)
    assert(payload.contains("\"feature_names\":"))
  }

  test("explain reads through a pushed-filter keyed scan, not a snapshot window") {
    service.predict("t4", Seq(2.0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    val frame = service.explainFrame("t4")
    frame.collect() // materialize so executedPlan is the final adaptive plan
    val plan = frame.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(transaction_id), EqualTo(transaction_id,t4)]"),
      s"key predicate did not reach the parquet scan:\n$plan")
    assert(!plan.contains("Window"), s"point lookup still windows the snapshot:\n$plan")
  }

  test("explainJson round-trips the reference shape {shap_values, feature_names, created_at}") {
    import org.apache.spark.sql.functions.{col, from_json}
    import spark.implicits._
    service.predict("t5", Seq(-2.0, 1.0, 0, 0, 0, 0, 0, 0, 0, 0))
    val payload = service.explainJson("t5").get
    val parsed = Seq(payload).toDF("j")
      .select(from_json(col("j"), org.apache.spark.sql.types.StructType.fromDDL(
        "shap_values MAP<STRING,DOUBLE>, feature_names ARRAY<STRING>, created_at STRING")).as("p"))
      .select("p.*").head()
    val shap = parsed.getMap[String, Double](0)
    val names = parsed.getSeq[String](1)
    assert(names === (0 until 10).map(i => s"f$i"))
    assert(shap.keySet === names.toSet, "shap map keys != feature names")
    assert(parsed.getString(2).matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}.*"""))
    // the shaped values equal the stored attribution row's map
    val stored = service.explain("t5").get
    val storedShap = Seq(stored.getString(stored.fieldIndex("shap_values"))).toDF("j")
      .select(from_json(col("j"),
        org.apache.spark.sql.types.DataType.fromDDL("MAP<STRING, DOUBLE>")))
      .head().getMap[String, Double](0)
    assert(shap === storedShap)
  }
}

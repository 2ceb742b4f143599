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
  }
}

package graft.ml

import graft.SparkSpec
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.functions._
import java.nio.file.Files

class FraudPipelineSpec extends SparkSpec {

  private lazy val cc = FraudPipeline.syntheticCreditcard(spark, 2000, seed = 42L).cache()

  test("synthetic creditcard generator: shape, determinism, class ratio") {
    assert(cc.count() === 2000)
    assert(cc.columns.toSeq === (FraudPipeline.featureNames :+ "Class"))
    val again = FraudPipeline.syntheticCreditcard(spark, 2000, seed = 42L)
    val h1 = cc.agg(round(sum(col("Amount")) + sum(col("V7")), 6)).head().getDouble(0)
    val h2 = again.agg(round(sum(col("Amount")) + sum(col("V7")), 6)).head().getDouble(0)
    assert(h1 === h2)
    val frauds = cc.filter(col("Class") === 1).count()
    assert(frauds > 0 && frauds < 100, s"fraud count $frauds implausible for 1% of 2000")
  }

  test("stratified split holds exact 80/20 per class") {
    val (train, test) = FraudPipeline.stratifiedSplit(cc, Seq("Time", "V1"))
    val trainCounts = train.groupBy("Class").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val testCounts = test.groupBy("Class").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    for (cls <- Seq(0, 1)) {
      val total = trainCounts(cls) + testCounts(cls)
      assert(testCounts(cls) === total / 5,
        s"class $cls: test=${testCounts(cls)} of $total is not exact 20%")
    }
  }

  test("LR pipeline separates the synthetic eval task (AUC gate)") {
    val eval = FraudPipeline.syntheticEvalSet(spark, 1000, seed = 1L)
    val (train, test) = FraudPipeline.stratifiedSplit(eval, Seq("f0", "f1"))
    val model = FraudPipeline.logisticPipeline((0 until 10).map(i => s"f$i"), maxIter = 50)
      .fit(train)
    val a = FraudPipeline.auc(model, test)
    assert(FraudPipeline.aucGate(a, 0.95), s"AUC $a below gate on a separable task")
    assert(!FraudPipeline.aucGate(0.93, 0.95))
  }

  test("scoreDF exposes prediction and P(class=1) score columns") {
    val eval = FraudPipeline.syntheticEvalSet(spark, 400, seed = 2L)
    val model = FraudPipeline.logisticPipeline((0 until 10).map(i => s"f$i"), maxIter = 20)
      .fit(eval)
    val scored = FraudPipeline.scoreDF(model, eval)
    assert(scored.columns.contains("prediction") && scored.columns.contains("score"))
    val bad = scored.filter(col("score") < 0 || col("score") > 1).count()
    assert(bad === 0)
    // score must agree with the predicted class at the 0.5 boundary
    val disagree = scored.filter(
      (col("score") >= 0.5 && col("prediction") === 0.0) ||
      (col("score") < 0.5 && col("prediction") === 1.0)).count()
    assert(disagree === 0)
  }

  test("pipeline model save/load roundtrip preserves predictions (S4)") {
    val eval = FraudPipeline.syntheticEvalSet(spark, 300, seed = 3L)
    val feats = (0 until 10).map(i => s"f$i")
    val model = FraudPipeline.logisticPipeline(feats, maxIter = 20).fit(eval)
    val dir = Files.createTempDirectory("graft-model").toString + "/m"
    model.write.overwrite().save(dir)
    val loaded = PipelineModel.load(dir)
    val a = model.transform(eval).select(sum("prediction")).head().getDouble(0)
    val b = loaded.transform(eval).select(sum("prediction")).head().getDouble(0)
    assert(a === b)
  }

  test("weighted GBT (scale_pos_weight analogue) trains and separates") {
    val eval = FraudPipeline.syntheticEvalSet(spark, 600, seed = 4L)
    val weighted = FraudPipeline.withClassWeight(eval)
    val model = FraudPipeline
      .weightedGbtPipeline((0 until 10).map(i => s"f$i"), maxIter = 5, maxDepth = 3)
      .fit(weighted)
    val a = FraudPipeline.auc(model, weighted)
    assert(a > 0.9, s"weighted GBT AUC $a")
  }

  test("q92 weighted-GBT oracle gates hold with margin (M4/M5)") {
    import org.apache.spark.sql.functions.{col, count, lit, sum, when}
    // raw metrics must clear the query's gates (0.97 acc / 0.99 auc) with
    // headroom, so the gates stay green for any partitioning's sample
    val feats = (0 until 10).map(i => s"f$i")
    val df = FraudPipeline.withClassWeight(FraudPipeline.syntheticEvalSet(spark, 2000))
    val model = FraudPipeline.weightedGbtPipeline(feats, maxIter = 10, maxDepth = 3).fit(df)
    val scored = FraudPipeline.scoreDF(model, df)
    val st = scored.agg(
      count(lit(1)).as("n"),
      sum(when(col("prediction") === col(FraudPipeline.labelCol).cast("double"), 1L)
        .otherwise(0L)).as("hit")).head()
    val acc = st.getLong(1).toDouble / st.getLong(0)
    val aucVal = FraudPipeline.auc(model, df)
    assert(acc >= 0.985, s"accuracy $acc leaves <1.5% margin over the 0.97 gate")
    assert(aucVal >= 0.995, s"AUC $aucVal leaves <0.5% margin over the 0.99 gate")
    // and the query itself emits the oracle constants
    val row = MlQueries.queries("q92_weighted_gbt")(spark, sfDir).head()
    assert(row.getLong(0) === 2000L && row.getLong(1) === 0L && row.getLong(2) === 0L)
    assert(row.getInt(3) === 1 && row.getInt(4) === 1)
  }

  test("stratified CV with in-fold SMOTE returns one AUC per fold") {
    val cc500 = FraudPipeline.syntheticCreditcard(spark, 500, seed = 7L, fraudRatio = 0.08)
    val feats = Seq("V1", "V2", "V3", "V4", "Amount")
    val aucs = FraudPipeline.cvWithSmote(
      cc500.select((feats :+ "Class").map(col): _*).withColumn("Time", col("V1")),
      feats, orderKeys = Seq("V1", "V2"), k = 3, lrMaxIter = 20)
    assert(aucs.size === 3)
    aucs.foreach(a => assert(a >= 0.0 && a <= 1.0))
    val (m, band) = FraudPipeline.cvSummary(aucs)
    assert(m >= 0.0 && m <= 1.0 && band >= 0.0)
  }

  test("fitLogged appends ordered run-history rows and promoteLatest gates from the log") {
    import graft.sources.{ModelRegistry, RunLog}
    val tmp = Files.createTempDirectory("graft-runlog").toString
    val runDir = s"$tmp/runs"
    val modelDir = s"$tmp/models"
    val (train, testSet) = FraudPipeline.stratifiedSplit(cc, Seq("Time", "V1"))
    val (_, auc1, seq1) = FraudPipeline.fitLogged(train, testSet,
      FraudPipeline.featureNames, runDir, modelDir, runId = "run-a", lrMaxIter = 5)
    val (_, auc2, seq2) = FraudPipeline.fitLogged(train, testSet,
      FraudPipeline.featureNames, runDir, modelDir, runId = "run-b", lrMaxIter = 10,
      extraParams = Map("cv_folds" -> "5"),
      extraMetrics = Map("cv_auc_mean" -> 0.91, "cv_auc_std" -> 0.01))
    // two fits → two rows, strictly ordered by the single-writer seq
    assert(seq1 === 0L && seq2 === 1L)
    val hist = RunLog.runs(spark, runDir, "fraud-detection-ci").collect()
    assert(hist.map(_.getString(1)).toSeq === Seq("run-a", "run-b"))
    val p2 = hist(1).getMap[String, String](3)
    assert(p2("model_type") === "LogisticRegression" && p2("max_iter") === "10"
      && p2("cv_folds") === "5")
    val m1 = hist(0).getMap[String, Double](4)
    val m2 = hist(1).getMap[String, Double](4)
    assert(m1("test_auc") === auc1 && m2("test_auc") === auc2
      && m2("cv_auc_mean") === 0.91)
    // promotion reads the LATEST run from the log: pass → alias bound
    // to run-b's model path, which must load (the S6 registry alias)
    val alias = "models:/fraud@production"
    val (reg, promoted) = RunLog.promoteLatest(spark, runDir, "fraud-detection-ci",
      Map.empty, alias, threshold = 0.0)
    assert(promoted && reg(alias) === s"$modelDir/run-b")
    assert(ModelRegistry.load(alias, reg, fallbackPath = "/nonexistent")
      .stages.nonEmpty)
    // a threshold the logged metric can't clear refuses and leaves the
    // registry untouched (train_model.py's "not registered" branch)
    val (reg2, promoted2) = RunLog.promoteLatest(spark, runDir, "fraud-detection-ci",
      Map.empty, alias, threshold = 1.01)
    assert(!promoted2 && reg2.isEmpty)
    // unknown experiment → no run, no promotion
    assert(!RunLog.promoteLatest(spark, runDir, "no-such-exp",
      Map.empty, alias, threshold = 0.0)._2)
  }
}

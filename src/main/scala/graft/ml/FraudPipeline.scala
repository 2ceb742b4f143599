package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's batch training pipeline, Spark-native (SURVEY §2.8,
  * §3.3; reference train_model.py, preprocess.py, api/app.py:184-240).
  *
  * Canonical schema is the ULB creditcard shape: `Time, V1..V28, Amount`
  * features + binary `Class` label (SURVEY §0.1-A). The model pipeline is
  * VectorAssembler → StandardScaler(withMean, ddof=0 like sklearn) →
  * LogisticRegression (served model) or weighted GBTClassifier (the
  * XGBoost analogue; scale_pos_weight → weightCol, SURVEY §2.8-M4).
  *
  * Scale notes: fits are MLlib estimators (distributed L-BFGS / tree
  * boosting); the stratified split/fold assignment is a per-class window
  * partitioned BY CLASS — with 2 classes that is a 2-partition sort at
  * the window stage, which is fine for the label column only (long + int
  * per row); for >2-class or extreme scale use `sampleBy` instead
  * (approximate ratios) — both are exposed.
  */
object FraudPipeline {

  val featureNames: Seq[String] = "Time" +: (1 to 28).map(i => s"V$i") :+ "Amount"
  val labelCol = "Class"

  /** S12: seeded synthetic creditcard generator
    * (scripts/generate_synthetic_data.py:6-27): V1..V28 ~ N(0,1), Time ~
    * sorted U(0, 172800), Amount ~ LogNormal(3, 1), Class ~ Bernoulli(ratio).
    * Distributed: built on spark.range — no driver-side materialization. */
  def syntheticCreditcard(spark: SparkSession, n: Long, seed: Long = 42L,
      fraudRatio: Double = 0.01): DataFrame = {
    val vCols = (1 to 28).map(i => randn(seed + i).as(s"V$i"))
    spark.range(n)
      .select(
        (rand(seed) * 172800.0).as("Time") +:
        vCols :+
        exp(randn(seed + 99) + 3.0).as("Amount") :+
        (rand(seed + 100) < fraudRatio).cast("int").as(labelCol): _*)
      .orderBy(col("Time"))
  }

  /** S13: synthetic eval set (scripts/validate_auc.py:7-12): 10 N(0,1)
    * features, label = f0 > 0 — a perfectly separable sanity task.
    *
    * `numParts` sizes the range's partitioning; the default −1 keeps
    * `spark.range`'s parallelism (= cores). Callers whose downstream is
    * an ITERATIVE fit should pass [[fitParts]]: every L-BFGS iteration /
    * boosting round is one treeAggregate over these partitions, so a
    * core-count split of a small frame pays cores×iters near-empty
    * tasks, while a data-sized split keeps per-iteration task count
    * proportional to rows at any scale. NOTE the drawn sample depends on
    * the partitioning (seeded per-partition streams) — callers must gate
    * on partition-robust invariants (the q56/q64/q65 pattern), which
    * q91/q92 already do by contract. */
  def syntheticEvalSet(spark: SparkSession, n: Long, seed: Long = 42L,
      numParts: Int = -1): DataFrame = {
    val fCols = (0 until 10).map(i => randn(seed + i).as(s"f$i"))
    val rng = if (numParts > 0) spark.range(0L, n, 1L, numParts) else spark.range(n)
    rng.select(fCols: _*)
      .withColumn(labelCol, (col("f0") > 0).cast("int"))
  }

  /** Data-proportional partition count for a frame feeding an iterative
    * MLlib fit: ~[[FitRowsPerPartition]] rows per partition, at least 1 —
    * derived from the INPUT SIZE, never from the core count (guide §2:
    * scale-adaptive partitioning; a constant tuned to either local mode
    * or one cluster is wrong on the other). At bench SFs this is 1-2
    * partitions (per-iteration scheduler overhead collapses ~cores× to
    * ~1×); at corpus scale rows/250k grows without any core-count cap,
    * which is exactly the parallelism an L-BFGS gradient pass wants. */
  val FitRowsPerPartition = 250000L
  def fitParts(rows: Long): Int =
    math.max(1L, (rows + FitRowsPerPartition - 1) / FitRowsPerPartition).toInt

  /** M1+M3: assembler → StandardScaler(withMean=true, population σ like
    * sklearn ddof=0) → LogisticRegression. */
  def logisticPipeline(features: Seq[String] = featureNames,
      maxIter: Int = 100, regParam: Double = 0.0): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("rawFeatures")
    val scaler = new StandardScaler()
      .setInputCol("rawFeatures").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    val lr = new LogisticRegression()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setMaxIter(maxIter).setRegParam(regParam)
    new Pipeline().setStages(Array(assembler, scaler, lr))
  }

  /** M4: the weighted gradient-boosted classifier (XGBoost analogue:
    * binary:logistic, 100 trees, lr 0.1, depth 5; scale_pos_weight=neg/pos
    * becomes a per-row weight column — train_model.py:52-54,69-80). */
  def weightedGbtPipeline(features: Seq[String] = featureNames,
      maxIter: Int = 100, stepSize: Double = 0.1, maxDepth: Int = 5): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
    val gbt = new GBTClassifier()
      .setLabelCol(labelCol).setFeaturesCol("features").setWeightCol("w")
      .setMaxIter(maxIter).setStepSize(stepSize).setMaxDepth(maxDepth).setSeed(42L)
    new Pipeline().setStages(Array(assembler, gbt))
  }

  /** Adds the scale_pos_weight column: minority rows weighted neg/pos. */
  def withClassWeight(df: DataFrame): DataFrame = {
    val Row2 = df.agg(
      sum(when(col(labelCol) === 0, 1L).otherwise(0L)),
      sum(when(col(labelCol) === 1, 1L).otherwise(0L))).head()
    val spw = Row2.getLong(0).toDouble / math.max(Row2.getLong(1), 1L)
    df.withColumn("w", when(col(labelCol) === 1, spw).otherwise(1.0))
  }

  /** W6: exact stratified split — deterministic per-class rank via the
    * salted two-phase [[Stratify]] (no per-class single-task sort),
    * every k-th row held out (k = round(1/testFraction)). */
  def stratifiedSplit(df: DataFrame, orderKeys: Seq[String],
      testFraction: Double = 0.2): (DataFrame, DataFrame) = {
    val k = math.max(math.round(1.0 / testFraction).toInt, 2)
    val tagged = Stratify.withClassRank(df, labelCol, orderKeys)
    val test = tagged.filter(col("__rn") % k === 0).drop("__rn")
    val train = tagged.filter(col("__rn") % k =!= 0).drop("__rn")
    (train, test)
  }

  /** M5: append `prediction` and `score` = P(class=1) columns
    * (api/app.py:208-240 intended semantics, SURVEY §0.1-G). */
  def scoreDF(model: PipelineModel, df: DataFrame): DataFrame =
    model.transform(df)
      .withColumn("score", vector_to_array(col("probability")).getItem(1))

  /** A9/M11: area under ROC from a fitted model's scores. */
  def auc(model: PipelineModel, df: DataFrame): Double =
    new BinaryClassificationEvaluator()
      .setLabelCol(labelCol).setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC")
      .evaluate(model.transform(df))

  /** M11: registration gate (train_model.py:152-163). */
  def aucGate(aucValue: Double, threshold: Double = 0.95): Boolean =
    aucValue >= threshold

  /** The full tracked training run (train_model.py:117-151): fit →
    * evaluate → persist the model → append ONE row to the
    * [[graft.sources.RunLog]] history table carrying params, metrics,
    * and the model path. Extra params/metrics (cv_auc_mean, …) ride
    * along; the M11 promotion ([[graft.sources.RunLog.promoteLatest]])
    * later reads the gate metric FROM THE LOG, not from this return —
    * the history table is the source of truth, as with a tracking
    * server. Returns (model, test AUC, run seq). */
  def fitLogged(train: DataFrame, test: DataFrame, features: Seq[String],
      runLogDir: String, modelDir: String, runId: String,
      experiment: String = "fraud-detection-ci", lrMaxIter: Int = 50,
      extraParams: Map[String, String] = Map.empty,
      extraMetrics: Map[String, Double] = Map.empty): (PipelineModel, Double, Long) = {
    val model = logisticPipeline(features, maxIter = lrMaxIter).fit(train)
    val testAuc = auc(model, test)
    val modelPath = s"$modelDir/$runId"
    model.write.overwrite().save(modelPath)
    val seq = graft.sources.RunLog.logRun(train.sparkSession, runLogDir, experiment, runId,
      params = Map(
        "model_type" -> "LogisticRegression",
        "max_iter" -> lrMaxIter.toString,
        "n_features" -> features.size.toString) ++ extraParams,
      metrics = Map("test_auc" -> testAuc) ++ extraMetrics,
      modelPath = modelPath)
    (model, testAuc, seq)
  }

  /** [[fitLogged]] for the weighted-GBT family (M4, the XGBoost
    * analogue the reference actually trains — train_model.py:69-80):
    * the same tracked-run contract with `model_type=GBTClassifier`, so
    * a promotion that reads the history table can bind the champion
    * alias to a tree ensemble — which the serving path now explains
    * exactly via [[graft.xai.GbtAttr]] (Saabas path attribution)
    * instead of refusing or silently mis-attributing. */
  def fitLoggedGbt(train: DataFrame, test: DataFrame, features: Seq[String],
      runLogDir: String, modelDir: String, runId: String,
      experiment: String = "fraud-detection-ci", gbtMaxIter: Int = 20,
      maxDepth: Int = 5,
      extraParams: Map[String, String] = Map.empty,
      extraMetrics: Map[String, Double] = Map.empty): (PipelineModel, Double, Long) = {
    val model = weightedGbtPipeline(features, maxIter = gbtMaxIter, maxDepth = maxDepth)
      .fit(withClassWeight(train))
    val testAuc = auc(model, test)
    val modelPath = s"$modelDir/$runId"
    model.write.overwrite().save(modelPath)
    val seq = graft.sources.RunLog.logRun(train.sparkSession, runLogDir, experiment, runId,
      params = Map(
        "model_type" -> "GBTClassifier",
        "max_iter" -> gbtMaxIter.toString,
        "max_depth" -> maxDepth.toString,
        "n_features" -> features.size.toString) ++ extraParams,
      metrics = Map("test_auc" -> testAuc) ++ extraMetrics,
      modelPath = modelPath)
    (model, testAuc, seq)
  }

  /** M6: stratified k-fold CV with IN-FOLD SMOTE — resampling happens on
    * the train folds only, after the split, exactly the leakage
    * discipline of train_model.py:49-87. Returns per-fold AUCs. */
  def cvWithSmote(df: DataFrame, features: Seq[String], orderKeys: Seq[String],
      k: Int = 5, lrMaxIter: Int = 50, smoteK: Int = 5, seed: Long = 42L): Seq[Double] = {
    val folded = Stratify.withFold(df, labelCol, orderKeys, k, foldCol = "__fold").cache()
    try {
      (0 until k).map { i =>
        val trainRaw = folded.filter(col("__fold") =!= i)
          .select((features :+ labelCol).map(col): _*)
        val test = folded.filter(col("__fold") === i)
        val train = new Smote(features, labelCol, k = smoteK, seed = seed).transform(trainRaw)
        val model = logisticPipeline(features, maxIter = lrMaxIter).fit(train)
        auc(model, test)
      }
    } finally folded.unpersist()
  }

  /** A5: CV score rollup — numpy-style mean ± 2·population-std
    * (train_model.py:87,128-129; np.std is ddof=0). */
  def cvSummary(aucs: Seq[Double]): (Double, Double) = {
    val m = aucs.sum / aucs.size
    val sd = math.sqrt(aucs.map(a => (a - m) * (a - m)).sum / aucs.size)
    (m, 2 * sd)
  }
}

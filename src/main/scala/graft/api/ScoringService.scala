package graft.api

import graft.ml.FraudPipeline
import graft.sources.ModelRegistry
import graft.streaming.ScoringStream
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Thin query layer mirroring the reference's serving API (SURVEY §3.1,
  * §7.1; api/app.py): synchronous scoring with arity validation, the
  * async explainability handoff, point lookup of explanations, and the
  * health/completion rollups. No HTTP here — the contract is the
  * DataFrame/value semantics each endpoint computes; any transport can
  * wrap it.
  */
final class ScoringService(
    spark: SparkSession,
    model: PipelineModel,
    featureNames: Seq[String],
    store: ScoringStream.ResultStore) {

  /** POST /predict (api/app.py:179-260): validate arity (422 semantics),
    * score a 1-row frame, return (prediction, P(1), correlationId) and
    * queue the explanation. */
  def predict(transactionId: String, features: Seq[Double]): Either[String, PredictionOut] =
    ModelRegistry.validateArity(features, featureNames.size) match {
      case Some(err) => Left(err)
      case None =>
        import spark.implicits._
        val df = Seq(Tuple1(features)).toDF("raw")
        val widened = featureNames.zipWithIndex.foldLeft(df) { case (d, (f, i)) =>
          d.withColumn(f, col("raw").getItem(i))
        }
        val row = FraudPipeline.scoreDF(model, widened)
          .select(col("prediction"), col("score")).head()
        val correlationId = java.util.UUID.randomUUID().toString
        enqueueExplain(transactionId, features)
        Right(PredictionOut(transactionId, row.getDouble(0).toInt, row.getDouble(1),
          correlationId, "Calculation queued"))
    }

  /** The async handoff (api/app.py:243-245 → xai_tasks): here the
    * explanation is computed through the same scoreBatch path the
    * streaming worker uses, and upserted idempotently. */
  private def enqueueExplain(transactionId: String, features: Seq[Double]): Unit = {
    import spark.implicits._
    val batch = Seq((transactionId, featureNames.zip(features).toMap))
      .toDF("transaction_id", "features")
    // label = transaction id: unique per logical write, idempotent under
    // retry (a colliding NUMERIC batch id would overwrite another txn's dir);
    // order comes from the store's shared monotonic clock so API and
    // streaming writes resolve last-writer-wins in one time domain
    store.upsertLabeled(
      explainScorer(batch),
      label = java.net.URLEncoder.encode(transactionId, "UTF-8"),
      order = ScoringStream.nextWriteStamp())
  }

  /** The explain kernel bound to the PROMOTED model's family — the
    * dispatch that closes the reference's train/explain asymmetry
    * (train_model.py:69-80 trains XGBoost; api/worker.py:52-53 can only
    * explain the linear model): a promoted weighted GBT gets exact
    * Saabas path attribution ([[graft.xai.GbtAttr]]), anything else the
    * closed-form linear kernel. Both emit the same payload shape, so
    * `/explain` readers never see which family served them. */
  private lazy val explainScorer: DataFrame => DataFrame =
    model.stages.last match {
      case gbt: org.apache.spark.ml.classification.GBTClassificationModel =>
        val trees = graft.xai.GbtAttr.flatten(gbt)
        ScoringStream.scoreBatchGbt(_, featureNames, trees)
      case _ =>
        val (coefs, mu, intercept) = linearForm
        ScoringStream.scoreBatch(_, featureNames, coefs, mu, intercept)
    }

  /** The served model's closed linear form on raw features — scaler μ/σ
    * folded into coefficients/intercept (the LinearShapSpec parity). */
  lazy val linearForm: (Seq[Double], Seq[Double], Double) = {
    val scaler = model.stages(1).asInstanceOf[org.apache.spark.ml.feature.StandardScalerModel]
    val lr = model.stages(2).asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    val sigma = scaler.std.toArray
    val mu = scaler.mean.toArray
    val raw = lr.coefficients.toArray.zip(sigma).map { case (c, s) => c / s }
    val b0 = lr.intercept - raw.zip(mu).map { case (c, m) => c * m }.sum
    (raw.toSeq, mu.toSeq, b0)
  }

  /** GET /explain/{id} (api/app.py:262-278): point lookup by key. The
    * key predicate reaches the parquet scan (PushedFilters) instead of
    * scanning + windowing the whole snapshot — the old path read every
    * batch directory for a one-row read. */
  def explain(transactionId: String): Option[Row] =
    guardEmptyStore(explainFrame(transactionId).collect().headOption)

  /** The explain read as a lazy frame — exposed so callers (and the
    * spec) can audit the plan: pushed-filter keyed scan, top-1 by write
    * stamp, no global window. */
  def explainFrame(transactionId: String): DataFrame =
    store.keyedLookup(spark, transactionId)

  /** GET /explain/{id}, reference-shaped: the stored row re-shaped to
    * `{shap_values, feature_names, created_at}` exactly as the
    * reference deserializes its JSONB column (api/app.py:265-277).
    * from_json parses the stored attribution map, to_json re-serializes
    * the shaped struct — F9/F10 at the facade edge, computed in the
    * plan rather than driver-side string splicing. */
  def explainJson(transactionId: String): Option[String] = guardEmptyStore {
    explainFrame(transactionId)
      .select(to_json(struct(
        from_json(col("shap_values"),
          org.apache.spark.sql.types.DataType.fromDDL("MAP<STRING, DOUBLE>")).as("shap_values"),
        array(featureNames.map(lit): _*).as("feature_names"),
        date_format(col("updated_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").as("created_at")
      ),
        // a FAILED row stores shap_values = null; the reference shape
        // guarantees the key, so emit "shap_values":null rather than
        // dropping it (to_json default omits null fields)
        Map("ignoreNullFields" -> "false")).as("payload"))
      .collect().headOption.map(_.getString(0))
  }

  /** An empty store (no batch dir yet) must read as "not found", not an
    * AnalysisException — the same shapes [[health]] guards. With the
    * r13 typed-empty ResultStore the common race (stream attached, no
    * batch committed) returns a zero-row frame and never reaches this
    * guard; what remains is the NEVER-initialized store, which the
    * store reports as the typed [[graft.streaming.ScoringStream.UninitializedStoreException]]
    * (caught here → 404-shaped None, not a 500). */
  private def guardEmptyStore[T](read: => Option[T]): Option[T] =
    try read catch {
      case _: graft.streaming.ScoringStream.UninitializedStoreException => None
      case e: org.apache.spark.sql.AnalysisException if isEmptyStoreShape(e) => None
    }

  private def isEmptyStoreShape(e: org.apache.spark.sql.AnalysisException): Boolean =
    e.getMessage.contains("PATH_NOT_FOUND") ||
      e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") ||
      e.getMessage.toLowerCase.contains("path does not exist")

  /** GET /health (api/app.py:135-175) + the completion rollup (A12). */
  def health(): HealthOut = {
    // an empty store (no batch dir yet) reads as zero results, but any
    // OTHER failure should surface, not masquerade as "healthy, 0 done"
    val rollup = try {
      val r = store.completionRollup(spark).head()
      Some((r.getLong(0), r.getLong(1)))
    } catch {
      // empty-store shapes only: never-initialized store (typed), or a
      // dir holding just sidecars so schema inference has nothing to read
      case _: graft.streaming.ScoringStream.UninitializedStoreException => None
      case e: org.apache.spark.sql.AnalysisException if isEmptyStoreShape(e) => None
    }
    HealthOut(modelLoaded = model != null,
      total = rollup.map(_._1).getOrElse(0L),
      completed = rollup.map(_._2).getOrElse(0L))
  }
}

final case class PredictionOut(transactionId: String, prediction: Int, score: Double,
    correlationId: String, message: String)
final case class HealthOut(modelLoaded: Boolean, total: Long, completed: Long)

package graft.sources

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths}

/** Artifact-store concerns around the model pipeline (SURVEY §2.1
  * S4/S5/S6/S11, §2.8 M10).
  */
object ModelRegistry {

  /** S6: registry-style model indirection — resolve an alias like
    * "models:/fraud@production" through a registry map with a local-path
    * fallback (api/app.py:34-44: mlflow URI, joblib fallback). */
  def resolve(alias: String, registry: Map[String, String], fallbackPath: String): String =
    registry.getOrElse(alias, fallbackPath)

  def load(alias: String, registry: Map[String, String], fallbackPath: String): PipelineModel =
    PipelineModel.load(resolve(alias, registry, fallbackPath))

  /** S5: JSON sidecar with the ordered feature-name contract
    * (preprocess.py:56-57, models/feature_names.json). */
  def writeFeatureNames(path: String, names: Seq[String]): Unit = {
    val json = names.map(n => "\"" + n + "\"").mkString("[", ",", "]")
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), json)
  }

  def readFeatureNames(path: String): Seq[String] = {
    val s = Files.readString(Paths.get(path)).trim
    require(s.startsWith("[") && s.endsWith("]"), s"not a JSON array: $path")
    s.substring(1, s.length - 1).split(",").toSeq
      .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
  }

  /** M10: model signature — the input/output schema contract inferred
    * from data (train_model.py:131-148; inherent to Spark's typed plans). */
  def signature(input: StructType, output: StructType): (String, String) =
    (input.toDDL, output.toDDL)

  /** S11: DDL ensure-table (CREATE TABLE IF NOT EXISTS;
    * api/app.py:51-63). Catalog-managed, idempotent. */
  def ensureResultsTable(spark: SparkSession, name: String): Unit =
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $name (
         |  transaction_id STRING,
         |  prediction_score DOUBLE,
         |  shap_values STRING,
         |  status STRING,
         |  updated_at TIMESTAMP) USING parquet""".stripMargin)

  /** P5: the 422 arity validation — exactly `expected` features
    * (api/app.py:185-191). Returns the error message, or None if valid. */
  def validateArity(features: Seq[Double], expected: Int): Option[String] =
    if (features.size == expected) None
    else Some(s"Invalid input: expected $expected features, got ${features.size}")
}

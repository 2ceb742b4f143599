package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Experiment-tracking run log — the MLflow tracking-server semantics of
  * the reference's training script (train_model.py:117-163: one run per
  * fit logging `log_param`/`log_metric`/`log_model`, then conditional
  * `register_model` behind the AUC threshold), re-expressed as a
  * parquet-backed DataFrame table instead of an HTTP tracking service.
  *
  * Schema: one row per training run —
  * (seq, run_id, experiment, params map<string,string>,
  *  metrics map<string,double>, model_path, ts). `seq` is the
  * single-writer monotonic ordinal (a training loop is one driver, the
  * same way one `mlflow.start_run()` context owns a run); readers order
  * by it rather than wall-clock so two fits in the same millisecond
  * still have a defined "latest".
  *
  * Scale shape: appends are one-row parquet writes; reads are plain
  * scans with experiment pushdown — history tables are tiny relative to
  * data tables, and a 1000-executor reader treats this like any other
  * dimension table (broadcastable).
  */
object RunLog {

  val schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("run_id", StringType, nullable = false),
    StructField("experiment", StringType, nullable = false),
    StructField("params", MapType(StringType, StringType, valueContainsNull = false)),
    StructField("metrics", MapType(StringType, DoubleType, valueContainsNull = false)),
    StructField("model_path", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Append one run (mlflow.start_run + log_param/log_metric/log_model
    * in a single atomic row). Returns the run's seq. */
  def logRun(spark: SparkSession, dir: String, experiment: String, runId: String,
      params: Map[String, String], metrics: Map[String, Double],
      modelPath: String): Long = {
    val seq = if (exists(spark, dir))
      spark.read.schema(schema).parquet(dir)
        .agg(coalesce(max(col("seq")), lit(-1L))).head().getLong(0) + 1L
    else 0L
    val row = Row(seq, runId, experiment, params, metrics, modelPath,
      new java.sql.Timestamp(System.currentTimeMillis()))
    spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(row), 1), schema)
      .write.mode("append").parquet(dir)
    seq
  }

  /** Run history for one experiment, oldest first — the
    * `mlflow.search_runs` surface as a plain DataFrame. */
  def runs(spark: SparkSession, dir: String, experiment: String): DataFrame =
    spark.read.schema(schema).parquet(dir)
      .filter(col("experiment") === experiment)
      .orderBy(col("seq"))

  /** The newest run of an experiment, if any. */
  def latestRun(spark: SparkSession, dir: String, experiment: String): Option[Row] =
    if (!exists(spark, dir)) None
    else runs(spark, dir, experiment).orderBy(col("seq").desc).limit(1)
      .collect().headOption

  /** M11 registration from the LOG (train_model.py:152-163): read the
    * latest run, gate on its logged metric, and on pass return the
    * registry with `alias` bound to that run's model path. The gate
    * reads what the run RECORDED — promotion is a pure function of the
    * history table, so a replayed or audited promotion sees exactly
    * what the original did. */
  def promoteLatest(spark: SparkSession, dir: String, experiment: String,
      registry: Map[String, String], alias: String,
      metricKey: String = "test_auc", threshold: Double = 0.95):
      (Map[String, String], Boolean) =
    latestRun(spark, dir, experiment) match {
      case Some(r) =>
        val metrics = r.getMap[String, Double](r.fieldIndex("metrics"))
        val pass = metrics.get(metricKey).exists(_ >= threshold)
        if (pass) (registry + (alias -> r.getString(r.fieldIndex("model_path"))), true)
        else (registry, false)
      case None => (registry, false)
    }
}

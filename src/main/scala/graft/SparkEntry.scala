package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY §2): one entry per
  * implemented operator; `oracleSql` holds the DuckDB-equivalent SQL for
  * every oracle-checkable entry (omitted → rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.RelationalQueries.queries("q02_agg_pricing")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.ExtQueries.queries ++
      graft.llm.LlmQueries.queries ++
      graft.ml.MlQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracle ++
      graft.queries.ExtQueries.oracle ++
      graft.llm.LlmQueries.oracle ++
      graft.ml.MlQueries.oracle
}

package graft.sources

import graft.SparkSpec
import graft.streaming.ScoringStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class JdbcResultsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url = {
    val dir = Files.createTempDirectory("graft-derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  private def mkBatch(rows: (String, Double, String)*) =
    rows.toSeq.toDF("transaction_id", "prediction_score", "status")
      .withColumn("shap_values", lit("""{"f0":0.1}"""))
      .select("transaction_id", "prediction_score", "shap_values", "status")

  test("ensure-table is idempotent and upsert converges under replay (S10/S11)") {
    JdbcResults.ensureTable(url, "results")
    JdbcResults.ensureTable(url, "results")
    val batch = mkBatch(("a", 0.9, "COMPLETED"), ("b", 0.2, "COMPLETED"))
    JdbcResults.upsert(batch, url, "results")
    JdbcResults.upsert(batch, url, "results") // at-least-once replay
    val all = JdbcResults.readAll(spark, url, "results")
    assert(all.count() === 2)
    // last-writer-wins on key collision
    JdbcResults.upsert(mkBatch(("a", 0.5, "COMPLETED")), url, "results")
    val a = JdbcResults.readAll(spark, url, "results")
      .filter($"transaction_id" === "a").head()
    assert(a.getDouble(a.fieldIndex("prediction_score")) === 0.5)
  }

  test("point select pushes the key filter to the JDBC scan (S9)") {
    JdbcResults.ensureTable(url, "results2")
    JdbcResults.upsert(mkBatch(("x", 0.1, "COMPLETED"), ("y", 0.7, "FAILED")), url, "results2")
    val one = JdbcResults.pointSelect(spark, url, "results2", "y")
    assert(one.count() === 1)
    assert(one.head().getString(3) === "FAILED")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.toUpperCase.contains("EQUALTO(TRANSACTION_ID"),
      s"key filter not pushed into JDBC scan:\n$plan")
  }

  test("streaming foreachBatch lands scored results in the JDBC store (ST3 over JDBC)") {
    implicit val sqlCtx = spark.sqlContext
    JdbcResults.ensureTable(url, "results3")
    val input = MemoryStream[(String, Map[String, Double])]
    val stream = input.toDF().toDF("transaction_id", "features")
    val q = stream.writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-jdbc-ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val scoredB = ScoringStream.scoreBatch(
          batch, Seq("f0", "f1"), Seq(1.0, -1.0), Seq(0.0, 0.0), 0.0)
        JdbcResults.upsert(scoredB.drop("updated_at"), url, "results3")
      }
      .start()
    try {
      input.addData(("s1", Map("f0" -> 2.0)), ("s2", Map.empty[String, Double]))
      q.processAllAvailable()
      val all = JdbcResults.readAll(spark, url, "results3").collect()
        .map(r => r.getString(0) -> r.getString(3)).toMap
      assert(all === Map("s1" -> "COMPLETED", "s2" -> "FAILED"))
    } finally q.stop()
  }
}

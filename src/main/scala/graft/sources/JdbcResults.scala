package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.DriverManager

/** JDBC result store on embedded Derby (SURVEY §2.1 S9/S10/S11): the
  * Spark-native equivalent of the reference's Postgres
  * `shap_explanations` table — DDL ensure-table, idempotent
  * update-else-insert upsert, and point select with a pushed key filter.
  *
  * Scale notes: the upsert runs per-partition on executors (one
  * connection each, batched statements); reads go through
  * `spark.read.jdbc`, whose WHERE pushdown keeps point lookups
  * index-sized. Embedded Derby stands in for any JDBC-speaking store;
  * only the URL changes.
  */
object JdbcResults {

  Class.forName("org.apache.derby.jdbc.EmbeddedDriver")

  /** S11: CREATE TABLE IF NOT EXISTS (Derby lacks IF NOT EXISTS; the
    * standard catalog-probe idiom is used instead). Idempotent. */
  def ensureTable(url: String, table: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
      val exists = rs.next()
      rs.close()
      if (!exists) {
        val st = conn.createStatement()
        st.executeUpdate(
          s"""CREATE TABLE $table (
             |  transaction_id VARCHAR(64) PRIMARY KEY,
             |  prediction_score DOUBLE,
             |  shap_values VARCHAR(4096),
             |  status VARCHAR(16))""".stripMargin)
        st.close()
      }
    } finally conn.close()
  }

  /** S10: idempotent keyed upsert (INSERT ... ON CONFLICT DO UPDATE
    * semantics via update-else-insert; api/worker.py:90-99). Safe to
    * replay: re-running the same batch converges to the same rows. */
  def upsert(df: DataFrame, url: String, table: String): Unit = {
    val cols = Seq("transaction_id", "prediction_score", "shap_values", "status")
    df.select(cols.head, cols.tail: _*).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val conn = DriverManager.getConnection(url)
        conn.setAutoCommit(false)
        val up = conn.prepareStatement(
          s"UPDATE $table SET prediction_score = ?, shap_values = ?, status = ? WHERE transaction_id = ?")
        val ins = conn.prepareStatement(
          s"INSERT INTO $table (transaction_id, prediction_score, shap_values, status) VALUES (?, ?, ?, ?)")
        try {
          rows.foreach { r =>
            val (id, score, shap, status) =
              (r.getString(0), r.get(1), r.getString(2), r.getString(3))
            up.setObject(1, score); up.setString(2, shap)
            up.setString(3, status); up.setString(4, id)
            if (up.executeUpdate() == 0) {
              ins.setString(1, id); ins.setObject(2, score)
              ins.setString(3, shap); ins.setString(4, status)
              ins.executeUpdate()
            }
          }
          conn.commit()
        } finally { up.close(); ins.close(); conn.close() }
    }
  }

  /** S9: point select by primary key — the WHERE clause is pushed into
    * the JDBC scan (PushedFilters in the physical plan), so the database
    * does the index lookup, not Spark. */
  def pointSelect(spark: SparkSession, url: String, table: String, id: String): DataFrame =
    readAll(spark, url, table)
      .filter(org.apache.spark.sql.functions.col("transaction_id") === id)

  /** Full table readback; Derby reports uppercase identifiers, so columns
    * are normalized back to the engine's lowercase contract. */
  def readAll(spark: SparkSession, url: String, table: String): DataFrame = {
    val raw = spark.read.format("jdbc").option("url", url).option("dbtable", table).load()
    raw.toDF(raw.columns.map(_.toLowerCase): _*)
  }
}

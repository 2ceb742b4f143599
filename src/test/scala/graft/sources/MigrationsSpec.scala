package graft.sources

import java.nio.file.Files
import java.sql.DriverManager

import graft.SparkSpec

/** Pins the versioned-migration lineage (the Alembic capability the
  * idempotent ensureTable lacks): forward/backward walks move a
  * POPULATED store between schema versions without losing rows, stamps
  * travel with each step, reruns are no-ops, and malformed chains
  * (branched, disconnected, rootless) are refused up front.
  */
class MigrationsSpec extends SparkSpec {

  private def freshUrl(): String = {
    val dir = Files.createTempDirectory("graft-migrations").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  private def columns(url: String, table: String): Seq[String] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getColumns(null, null, table.toUpperCase, null)
      val out = Iterator.continually(rs)
        .takeWhile(_.next()).map(_.getString("COLUMN_NAME")).toList
      rs.close()
      out.map(_.toLowerCase)
    } finally conn.close()
  }

  test("upgrade to head stamps the store and builds the full schema") {
    val url = freshUrl()
    assert(Migrations.current(url).isEmpty)
    val applied = Migrations.upgrade(url, Migrations.resultStoreChain())
    assert(applied === Seq("g0001_initial_results", "g0002_correlation_id", "g0003_status_index"))
    assert(Migrations.current(url) === Some("g0003_status_index"))
    assert(columns(url, "transaction_results") ===
      Seq("transaction_id", "prediction_score", "shap_values", "status", "correlation_id"))
    // idempotent: at head, a rerun applies nothing
    assert(Migrations.upgrade(url, Migrations.resultStoreChain()).isEmpty)
  }

  test("a populated store survives upgrade and downgrade (rows preserved, column added/removed)") {
    val url = freshUrl()
    val chain = Migrations.resultStoreChain()
    Migrations.upgrade(url, chain, to = Some("g0001_initial_results"))
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "INSERT INTO transaction_results VALUES ('t1', 0.9, '{\"f0\":0.1}', 'COMPLETED')")
      st.executeUpdate(
        "INSERT INTO transaction_results VALUES ('t2', 0.2, NULL, 'FAILED')")
      st.close()
    } finally conn.close()

    // forward over a populated table: additive column, rows intact
    assert(Migrations.upgrade(url, chain) === Seq("g0002_correlation_id", "g0003_status_index"))
    assert(columns(url, "transaction_results").contains("correlation_id"))
    val afterUp = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "transaction_results").load()
    assert(afterUp.count() === 2L)
    assert(afterUp.filter(afterUp("correlation_id").isNull).count() === 2L)

    // backward one step below the column: rows still intact
    assert(Migrations.downgrade(url, chain, to = Some("g0001_initial_results")) ===
      Seq("g0003_status_index", "g0002_correlation_id"))
    assert(Migrations.current(url) === Some("g0001_initial_results"))
    assert(!columns(url, "transaction_results").contains("correlation_id"))
    val afterDown = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "transaction_results").load()
    assert(afterDown.count() === 2L)

    // all the way to base: table gone, stamp cleared, downgrade again is a no-op
    assert(Migrations.downgrade(url, chain) === Seq("g0001_initial_results"))
    assert(Migrations.current(url).isEmpty)
    assert(columns(url, "transaction_results").isEmpty)
    assert(Migrations.downgrade(url, chain).isEmpty)
  }

  test("partial upgrade targets and direction errors") {
    val url = freshUrl()
    val chain = Migrations.resultStoreChain()
    Migrations.upgrade(url, chain, to = Some("g0002_correlation_id"))
    assert(Migrations.current(url) === Some("g0002_correlation_id"))
    // upgrading DOWN is refused with direction guidance
    val e = intercept[IllegalArgumentException](
      Migrations.upgrade(url, chain, to = Some("g0001_initial_results")))
    assert(e.getMessage.contains("use downgrade"))
    // unknown targets and unknown stamps are refused
    assert(intercept[IllegalArgumentException](
      Migrations.upgrade(url, chain, to = Some("nope"))).getMessage.contains("not in the chain"))
  }

  test("malformed chains are refused before touching the store") {
    import Migrations.Migration
    val url = freshUrl()
    val noop: java.sql.Connection => Unit = _ => ()
    def m(id: String, revises: Option[String]) = Migration(id, revises, noop, noop)
    assert(intercept[IllegalArgumentException](
      Migrations.upgrade(url, Seq(m("a", Some("ghost"))))).getMessage.contains("no root"))
    assert(intercept[IllegalArgumentException](
      Migrations.upgrade(url, Seq(m("a", None), m("b", None)))).getMessage.contains("branched"))
    assert(intercept[IllegalArgumentException](
      Migrations.upgrade(url, Seq(m("a", None), m("c", Some("ghost")))))
      .getMessage.contains("disconnected"))
  }
}

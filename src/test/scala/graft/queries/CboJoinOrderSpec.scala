package graft.queries

import graft.SparkSpec
import graft.sources.TableStats
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Pins that the CBO stance in [[TableStats]] actually changes plans:
  * with ANALYZE'd catalog tables and join reorder on, a 3-table join
  * written in a deliberately bad syntactic order (fact first) is
  * re-ordered selective-first at PLAN time — the property a 100×-scale
  * multi-way join needs before AQE's runtime adaptation can help.
  */
class CboJoinOrderSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def catalogTables(p: LogicalPlan): Set[String] = p.collect {
    case r: LogicalRelation => r.catalogTable.map(_.identifier.table).getOrElse("")
  }.filter(_.nonEmpty).toSet

  /** The join with no Join descendants — the FIRST join executed. */
  private def innermostJoins(p: LogicalPlan): Seq[Join] =
    p.collect { case j: Join => j }.filter(j => j.collect { case jj: Join => jj }.size == 1)

  test("with stats + CBO, a fact-first 3-table join re-plans selective-first") {
    TableStats.register(spark, sfDir,
      Seq("customer", "orders", "lineitem"), suffix = "_cbo")
    // syntactically worst order: the two fact tables join FIRST, the
    // selective filtered dimension last
    val sql =
      """SELECT count(*) AS n
        |FROM lineitem_cbo l
        |JOIN orders_cbo o ON l.l_orderkey = o.o_orderkey
        |JOIN customer_cbo c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'""".stripMargin
    val without = spark.sql(sql).queryExecution.optimizedPlan
    val withoutInner = innermostJoins(without).map(catalogTables)
    assert(withoutInner.exists(_ == Set("lineitem_cbo", "orders_cbo")),
      s"baseline should keep the syntactic fact-first order:\n$without")
    val baseCount = spark.sql(sql).head().getLong(0)
    withConf(TableStats.cboConfs: _*) {
      val cbo = spark.sql(sql).queryExecution.optimizedPlan
      val inner = innermostJoins(cbo).map(catalogTables)
      assert(inner.exists(_ == Set("orders_cbo", "customer_cbo")),
        s"CBO did not reorder the filtered dimension join first:\n$cbo")
      // and the reorder does not change the result
      assert(spark.sql(sql).head().getLong(0) === baseCount)
    }
  }

  test("ANALYZE populates rowCount the reorder costs against") {
    TableStats.register(spark, sfDir, Seq("nation"), suffix = "_cbo")
    val stats = spark.sql("DESCRIBE EXTENDED nation_cbo")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(stats.get("Statistics").exists(_.contains("rows")),
      s"no row-count statistic recorded: ${stats.get("Statistics")}")
  }
}

package graft.sources

import org.apache.spark.sql.SparkSession

/** Catalog registration + statistics collection for the testdata tables
  * — the cost-based-optimizer on-ramp.
  *
  * Plain `spark.read.parquet` frames carry only `sizeInBytes`, so every
  * multi-way join in this engine is ordered by its syntactic shape plus
  * AQE's runtime re-plan, with broadcast hints where a side is known
  * small. That is the right default for one-shot reads, but at 100× a
  * 5-table join's INITIAL order matters before runtime adaptation can
  * correct it: AQE only re-plans stage boundaries it already scheduled,
  * and a bad first join may have shuffled the biggest table already.
  *
  * For repeatedly-queried tables the production stance is: register
  * them in the catalog (external tables over the same parquet — no data
  * copy), `ANALYZE` once per load cycle (row counts + per-column
  * min/max/NDV), and turn on CBO + join reorder so Catalyst picks the
  * selective-first order at PLAN time. The ANALYZE cost is one scan per
  * table per load — amortized across every query that follows.
  * CboJoinOrderSpec pins that the reorder actually fires: with stats a
  * filtered-dimension join chain plans selective-first regardless of
  * its syntactic order.
  */
object TableStats {

  /** The statically-typed testdata tables. `events` is excluded: its
    * TIMESTAMP(NANOS) column needs the conversion in
    * [[graft.Tables.events]], so it cannot sit behind a bare catalog
    * table. */
  val defaultTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings")

  /** Register `tables` from `dir` as EXTERNAL parquet tables named
    * `<table><suffix>` (dropping any stale registration first — drops
    * of external tables never touch the data) and collect table- and
    * column-level statistics for each. Idempotent per (dir, suffix),
    * and CHEAPLY so: a table already registered at the same location is
    * skipped outright — its stats were computed at registration and the
    * data under a location is immutable within a load cycle (the
    * production stance re-ANALYZEs by re-registering after a refresh).
    * That skip is what lets a repeatedly-invoked query own its own
    * registration without paying one ANALYZE scan per run.
    *
    * `allColumns = false` collects table-level stats only (rowCount —
    * what join REORDER costs against); column min/max/NDV additionally
    * feed filter-selectivity estimates and are worth one more scan for
    * tables queried through selective predicates. */
  def register(spark: SparkSession, dir: String,
      tables: Seq[String] = defaultTables, suffix: String = "",
      allColumns: Boolean = true): Unit =
    tables.foreach { t =>
      val name = s"$t$suffix"
      val location = s"$dir/$t.parquet"
      val alreadyAt = spark.catalog.tableExists(name) &&
        spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(name))
          .location.toString.stripSuffix("/").endsWith(location)
      if (!alreadyAt) {
        spark.sql(s"DROP TABLE IF EXISTS $name")
        spark.sql(s"CREATE TABLE $name USING parquet LOCATION '$location'")
        // table stats (rowCount feeds join-reorder cost) + column stats
        // (min/max/NDV feed filter selectivity under the reordered joins)
        spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS")
        if (allColumns)
          spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
      }
    }

  /** The CBO switches the stance above assumes, as (key, value) pairs —
    * callers own setting/restoring them (they are session-wide). */
  val cboConfs: Seq[(String, String)] = Seq(
    "spark.sql.cbo.enabled" -> "true",
    "spark.sql.cbo.joinReorder.enabled" -> "true")
}

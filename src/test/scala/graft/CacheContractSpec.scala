package graft

/** The query-scoped cache contract, enforced over the WHOLE query
  * surface: a query may cache intermediates its result lineage reads
  * (the runner will clearCache after consuming it), and must release
  * in-closure anything its result does NOT read (scalar-result queries
  * that fold their caches into driver constants). After
  * query-run + clearCache, the cache manager must be empty — this is
  * what keeps an 87-query bench/verify session's storage memory flat
  * instead of filling until LRU eviction makes later queries
  * unpredictable. One sweep guards every current and future entry:
  * a new query that leaks a cache fails here by name.
  */
class CacheContractSpec extends SparkSpec {

  test("every SparkEntry query leaves zero storage blocks after the runner contract") {
    spark.catalog.clearCache() // isolate from other suites
    assert(spark.sparkContext.getPersistentRDDs.isEmpty, "dirty cache state before sweep")
    val leaked = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      SparkEntry.queries(name)(spark, sfDir).count()
      spark.catalog.clearCache()
      val left = spark.sparkContext.getPersistentRDDs
      if (left.isEmpty) None
      else {
        // don't poison the next query's check
        left.values.foreach(_.unpersist(blocking = true))
        Some(s"$name: ${left.size} blocks")
      }
    }
    assert(leaked.isEmpty, s"queries leaking caches past clearCache: ${leaked.mkString("; ")}")
  }
}

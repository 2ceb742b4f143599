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

  test("q194 holds O(1) cached frames MID-query (per-round release, the q217 cadence)") {
    // the post-query sweep above can't see a query that accumulates one
    // pinned frame per round and only releases at the end — this seam
    // asserts DURING the peel that live storage stays bounded by the
    // cadence (und + current alive, plus transient overlap while the
    // next round materializes), independent of round count
    spark.catalog.clearCache()
    var maxLive = 0
    val df = graft.llm.LlmQueries.q194KcoreImpl(spark, sfDir, { _ =>
      maxLive = math.max(maxLive, spark.sparkContext.getPersistentRDDs.size)
    })
    assert(df.count() > 0)
    assert(maxLive <= 3,
      s"q194 held $maxLive cached frames mid-query — per-round release regressed")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "q194 trace is driver-held; nothing may stay cached at return")
  }

  test("q217 holds O(1) cached frames mid-query (per-round release cadence)") {
    // docs releases once edges materialize; each dist round releases as
    // soon as the next materializes — the probe (end of round, after
    // prev.unpersist) must see at most edges + dist (+1 transient)
    spark.catalog.clearCache()
    var maxLive = 0
    val df = graft.llm.LlmQueries.q217SsspImpl(spark, sfDir, { _ =>
      maxLive = math.max(maxLive, spark.sparkContext.getPersistentRDDs.size)
    })
    assert(df.count() > 0)
    assert(maxLive <= 3,
      s"q217 held $maxLive cached frames mid-query — per-round release regressed")
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "q217's final dist is query-scoped; clearCache must release it")
  }

  test("q252 layer retention is bounded by the hop cap, and clearCache releases all") {
    // q252's output union reads EVERY BFS layer (the q194-trace trade,
    // documented), so layers stay cached until return — but the live
    // set must be bounded by the CONSTANT hop cap (docs + edges +
    // seeds + <= 6 layers), never grow with corpus size, and the
    // runner's clearCache must release everything
    spark.catalog.clearCache()
    var maxLive = 0
    val df = graft.llm.LlmQueries.q252HarmonicImpl(spark, sfDir, { _ =>
      maxLive = math.max(maxLive, spark.sparkContext.getPersistentRDDs.size)
    })
    assert(df.count() > 0)
    assert(maxLive <= 9, // docs + edges + seeds + 6 hop layers
      s"q252 held $maxLive cached frames mid-query — layer retention exceeded the hop bound")
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "q252's layers are query-scoped; clearCache must release them")
  }
}

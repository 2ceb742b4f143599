package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val probe = (1 to 5000).map(i => (i.toLong % 500, i)).toDF("k", "v")
  private lazy val build = Seq(3L, 77L, 202L, 431L).toDF("bk")

  test("pruned semi join equals the plain semi join exactly") {
    val plain = probe.join(build, probe("k") === build("bk"), "left_semi")
      .orderBy("k", "v").collect().toSeq
    val pruned = BloomPrune.prunedSemiJoin(probe, "k", build, "bk",
        estItems = 16L, numBits = 1L << 12)
      .orderBy("k", "v").collect().toSeq
    assert(pruned === plain)
    assert(pruned.size === 40) // 4 keys × 10 rows each
  }

  test("same-named probe and build keys do not make the join ambiguous") {
    val build2 = Seq(3L, 77L).toDF("k")
    val n = BloomPrune.prunedSemiJoin(probe, "k", build2, "k",
      estItems = 16L, numBits = 1L << 12).count()
    assert(n === 20) // 2 keys × 10 rows
  }

  test("the bloom predicate prunes the probe side before the join") {
    // count rows surviving the bloom prefilter alone: with 4 keys in a
    // 4096-bit filter the false-positive rate is tiny, so the prefilter
    // must cut the 5000-row probe to near the exact 40 matches
    val bf = BloomPrune.bloomOf(build, "bk", estItems = 16L, numBits = 1L << 12)
    val survivors = probe.filter(call_function("might_contain", bf, xxhash64(col("k")))).count()
    assert(survivors >= 40, s"bloom dropped true matches: $survivors < 40")
    assert(survivors <= 250, s"bloom pruned almost nothing: $survivors of 5000")
  }

  test("the physical plan carries the bloom predicate on the probe scan") {
    val plan = BloomPrune.prunedSemiJoin(probe, "k", build, "bk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom predicate in plan:\n$plan")
  }

  test("bloom functions resolve on the SQL surface") {
    probe.createOrReplaceTempView("bloom_probe_t")
    build.createOrReplaceTempView("bloom_build_t")
    val n = spark.sql(
      """SELECT count(*) FROM bloom_probe_t
        |WHERE might_contain(
        |  (SELECT bloom_filter_agg(xxhash64(bk), CAST(16 AS BIGINT), CAST(4096 AS BIGINT))
        |   FROM bloom_build_t),
        |  xxhash64(k))""".stripMargin).head().getLong(0)
    assert(n >= 40 && n <= 250)
  }
}

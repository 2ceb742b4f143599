package graft.llm

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimJoinExactSpec extends SparkSpec {

  test("q118 prefix-filtered sim-join equals brute force on the whole sf0.001 corpus") {
    val res = SparkEntry.queries("q118_simjoin_exact")(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: every pair, same bigram-set metric, same integer gate
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk0"))
      .filter(size(col("tk0")) >= 2)
      .select(col("doc_id"), array_distinct(TextOps.bigrams(col("tk0"))).as("sset"))
      .cache()
    val brute = docs.select(col("doc_id").as("a"), col("sset").as("sa"))
      .crossJoin(docs.select(col("doc_id").as("b"), col("sset").as("sb")))
      .filter(col("a") < col("b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .filter(col("inter") * 5 >=
        (size(col("sa")) + size(col("sb")) - col("inter")) * 4)
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    docs.unpersist()
    assert(res === brute,
      s"prefix filter missed ${(brute -- res).take(5)} / invented ${(res -- brute).take(5)}")
    assert(res.nonEmpty, "corpus should contain planted near-duplicates")
    spark.catalog.clearCache() // q118 caches its keyed frame (runner contract)
  }
}

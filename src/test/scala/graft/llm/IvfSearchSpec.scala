package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IvfSearchSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  private lazy val emb = Tables.embeddings(spark, sf01)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    .cache()

  private lazy val index = IvfSearch.build(emb, "vec_id", "emb", k = 8)

  test("every vector lands in exactly one inverted list") {
    assert(index.indexed.count() === emb.count())
    val nLists = index.indexed.select("cluster").distinct().count()
    assert(nLists > 1 && nLists <= 8)
  }

  test("probing is restricted to nProbe lists per query") {
    val res = IvfSearch.search(index, emb.filter(col("vec_id") < 8),
      "vec_id", "emb", nProbe = 2, topK = 3)
    // every neighbor must come from one of the query's 2 probed clusters
    val withCluster = res.join(
      index.indexed.select(col("vec_id").as("neighbor_id"), col("cluster")), "neighbor_id")
    val perQuery = withCluster.groupBy("q_id")
      .agg(countDistinct("cluster").as("nc")).collect()
    perQuery.foreach(r => assert(r.getLong(1) <= 2))
  }

  test("recall against brute-force top-3 is useful and results are exact cosines") {
    val queries = emb.filter(col("vec_id") < 16)
    val ann = IvfSearch.search(index, queries, "vec_id", "emb", nProbe = 3, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val bw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    val brute = emb.join(broadcast(
        queries.select(col("vec_id").as("q_id"), col("emb").as("q_emb"))),
        col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr(
        "aggregate(zip_with(emb, q_emb, (x, y) -> x * y), 0D, (a, x) -> a + x)" +
        " / (sqrt(aggregate(transform(emb, x -> x * x), 0D, (a, x) -> a + x))" +
        " * sqrt(aggregate(transform(q_emb, x -> x * x), 0D, (a, x) -> a + x)))"))
      .withColumn("rnk", row_number().over(bw))
      .filter(col("rnk") <= 3)
      .collect().map(r => (r.getLong(r.fieldIndex("q_id")), r.getLong(0))).toSet
    val recall = (ann & brute).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall@3 = $recall (nProbe=3/8 lists)")
  }
}

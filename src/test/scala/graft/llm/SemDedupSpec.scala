package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  test("l2Normalize yields unit vectors and nulls out zero vectors") {
    val df = Seq((1L, Seq(3.0, 4.0)), (2L, Seq(0.0, 0.0)))
      .toDF("id", "emb")
      .select(col("id"), SemDedup.l2Normalize(col("emb")).as("ne"))
    val r1 = df.filter(col("id") === 1).select(col("ne")).head().getSeq[Double](0)
    assert(math.abs(r1(0) - 0.6) < 1e-12 && math.abs(r1(1) - 0.8) < 1e-12)
    val r2 = df.filter(col("id") === 2).select(col("ne")).head()
    assert(r2.isNullAt(0), s"zero vector should normalize to NULL, got $r2")
  }

  test("scaled and exact copies collapse onto their originals") {
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .limit(200)
    val exact = base.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + lit(10000L)).as("vec_id"), col("emb"))
    val scaled = base.filter(col("vec_id") % 20 === 10)
      .select((col("vec_id") + lit(20000L)).as("vec_id"),
        transform(col("emb"), x => x * lit(0.25)).as("emb"))
    val res = SemDedup.dedup(base.union(exact).union(scaled),
      "vec_id", "emb", tau = 0.999, k = 4).cache()
    try {
      val dropped = res.filter(!col("keep"))
        .select("vec_id", "canonical").as[(Long, Long)].collect().toMap
      // every injected copy dropped, canonicalized to its original
      val injected = res.filter(col("vec_id") >= 10000L)
        .select("vec_id").as[Long].collect()
      assert(injected.nonEmpty)
      injected.foreach { id =>
        assert(dropped.contains(id), s"injected copy $id was kept")
        assert(dropped(id) === id % 10000L,
          s"copy $id canonicalized to ${dropped(id)}, expected ${id % 10000L}")
      }
      // no original dropped in favor of a copy
      assert(dropped.valuesIterator.forall(_ < 10000L))
    } finally res.unpersist()
  }

  test("zero-norm embeddings pass through as kept singletons") {
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .limit(50)
    val zero = Seq((9999L, Seq.fill(64)(0.0))).toDF("vec_id", "emb")
    val res = SemDedup.dedup(base.union(zero), "vec_id", "emb", tau = 0.99, k = 4)
    val r = res.filter(col("vec_id") === 9999L).head()
    assert(r.getAs[Boolean]("keep"), "degenerate embedding must be kept")
    assert(r.getAs[Long]("canonical") === 9999L)
    assert(res.count() === 51L, "output must cover every input id")
  }

  test("distinct random embeddings survive (no spurious merging)") {
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .limit(300)
    val res = SemDedup.dedup(base, "vec_id", "emb", tau = 0.99, k = 4)
    assert(res.filter(!col("keep")).count() === 0L,
      "random 64-dim embeddings should have no pairs above tau=0.99")
    assert(res.count() === 300L)
  }
}

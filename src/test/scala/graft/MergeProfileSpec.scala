package graft

import graft.llm.MergeProfile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.llm.MergeProfile]] — the two-level shard-then-merge profile
  * must equal the direct single-pass profile for ANY shard count
  * (associativity of the algebraic stats + the hash-shard contract
  * that makes exact distinct mergeable), and the closed forms must
  * match hand-computed values.
  */
class MergeProfileSpec extends SparkSpec {

  import spark.implicits._

  /** (source, n_tokens, h) rows incl. duplicate hashes within a source
    * (same h ⇒ same shard ⇒ distinct counts still add across shards). */
  private def docs: DataFrame = Seq(
    ("a", 10L, 101L), ("a", 20L, 102L), ("a", 20L, 102L), ("a", 30L, 103L),
    ("b", 5L, 201L), ("b", 7L, 201L), ("b", 9L, 202L),
    ("c", 4L, 301L)
  ).toDF("source", "n_tokens", "h")

  private def rows(df: DataFrame): Seq[(String, Long, Long, Long, Long, Double, Double)] =
    df.orderBy("source")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toSeq

  test("two-level merge equals direct computation for every shard count") {
    // shards = 1 IS the direct single-pass profile (one shard = no split)
    val direct = rows(MergeProfile.profile(docs, 1L))
    for (shards <- Seq(2L, 3L, 16L, 64L)) {
      assert(rows(MergeProfile.profile(docs, shards)) === direct,
        s"shard count $shards changed the merged profile")
    }
  }

  test("closed forms match hand-computed values") {
    val bySource = rows(MergeProfile.profile(docs, 16L)).map(t => t._1 -> t).toMap
    // source a: n=4, distinct h = {101,102,103} = 3, tokens 10/20/20/30
    // mean = 20, var = (4·(100+400+400+900) − 80²)/16 = (7200−6400)/16 = 50
    assert(bySource("a") === (("a", 4L, 3L, 10L, 30L, 20.0, 50.0)))
    // source b: n=3, distinct {201,202} = 2, tokens 5/7/9
    // mean = 7, var = (3·155 − 441)/9 = 24/9 = 2.6667 (4dp floor-round)
    assert(bySource("b") === (("b", 3L, 2L, 5L, 9L, 7.0, 2.6667)))
    // source c: single doc — zero variance
    assert(bySource("c") === (("c", 1L, 1L, 4L, 4L, 4.0, 0.0)))
  }

  test("merge is reorderable: merging pre-merged halves equals one merge") {
    val shardProfiles = MergeProfile.shardProfiles(docs, 16L)
    val half1 = shardProfiles.filter(col("shard") < 8)
    val half2 = shardProfiles.filter(col("shard") >= 8)
    // re-merge of per-half merges: emulate by unioning the halves'
    // shard rows in the opposite order — groupBy is order-insensitive,
    // but the DISJOINTNESS of the halves is what this pins
    val remerged = rows(MergeProfile.merge(half2.unionByName(half1)))
    assert(remerged === rows(MergeProfile.profile(docs, 16L)))
  }

  test("persisted artifact: cross-batch repeated hashes stay exact, replay idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("profile_art").toString
    val b0 = Seq(("a", 10L, 101L), ("a", 20L, 102L), ("b", 5L, 201L))
      .toDF("source", "n_tokens", "h")
    // h=102 arrives AGAIN in batch 1 — additive per-batch distinct
    // counts would say 4 distinct for source a; the truth is 3
    val b1 = Seq(("a", 20L, 102L), ("a", 30L, 103L), ("b", 9L, 202L))
      .toDF("source", "n_tokens", "h")
    MergeProfile.appendBatch(b0, 0L, dir, 16L)
    MergeProfile.appendBatch(b1, 1L, dir, 16L)
    val merged = rows(MergeProfile.loadProfile(spark, dir))
    val direct = rows(MergeProfile.profile(b0.unionByName(b1), 16L))
    assert(merged === direct)
    assert(direct.find(_._1 == "a").get._3 === 3L, "distinct must not double-count")

    // replay of batch 1 converges to the same artifact
    MergeProfile.appendBatch(b1, 1L, dir, 16L)
    assert(rows(MergeProfile.loadProfile(spark, dir)) === direct)

    // a different shard modulus is refused (would break disjointness)
    val ex = intercept[IllegalArgumentException] {
      MergeProfile.appendBatch(b1, 2L, dir, 8L)
    }
    assert(ex.getMessage.contains("sharded mod 16"))

    // an empty batch writes nothing
    MergeProfile.appendBatch(b0.filter(col("source") === "zzz"), 3L, dir, 16L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/batch=3")))
    assert(rows(MergeProfile.loadProfile(spark, dir)) === direct)
  }
}

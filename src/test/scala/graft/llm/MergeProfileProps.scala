package graft.llm

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the mergeable profile: under ANY random
  * doc set — including duplicate hashes and heavily skewed sources —
  * (1) the two-level shard-then-merge profile equals the direct
  * single-pass profile for every shard count, and (2) splitting the
  * rows into arbitrary halves, sharding each half, and merging ALL the
  * shard rows still equals direct — the cross-run mergeability the
  * persisted artifact depends on (valid at the shard grain only
  * because identical hashes land in identical shards; the property
  * would fail if sharding keyed on anything but the hash). */
object MergeProfileProps extends Properties("mergeprofile") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)
      .withInitialSeed(org.scalacheck.rng.Seed(11L))

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // small hash space on purpose: forces duplicate hashes within and
  // across sources, the case where distinct-merge correctness bites
  private val docSets = Gen.nonEmptyListOf(for {
    src <- Gen.oneOf("web", "books", "code")
    nTok <- Gen.choose(0L, 50L)
    h <- Gen.choose(0L, 12L)
  } yield (src, nTok, h))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq

  property("two-level equals direct for any shard count") =
    Prop.forAll(docSets, Gen.oneOf(1L, 2L, 5L, 16L)) { (docs, shards) =>
      val df = docs.toDF("source", "n_tokens", "h")
      val direct = rows(MergeProfile.profile(df, 1L))
      val sharded = rows(MergeProfile.profile(df, shards))
      (sharded == direct) :| s"shards=$shards diverged:\n$sharded\nvs\n$direct"
    }

  property("arbitrary split + shard + global merge equals direct") =
    Prop.forAll(docSets, Gen.choose(0, 100)) { (docs, cut) =>
      val df = docs.toDF("source", "n_tokens", "h")
      val k = (cut * docs.length) / 101
      val (a, b) = docs.splitAt(k)
      // NOTE: merging per-half SHARD rows is only valid when the halves
      // hold no shared hash per shard — which random halves DO violate;
      // the correct cross-run merge goes through the hash grain, as the
      // persisted artifact does. Emulate it here.
      val hashGrain =
        MergeProfile.hashGrainProfile(a.toDF("source", "n_tokens", "h"), 16L)
          .unionByName(MergeProfile.hashGrainProfile(b.toDF("source", "n_tokens", "h"), 16L))
      import org.apache.spark.sql.functions._
      val reMerged = MergeProfile.merge(
        hashGrain.groupBy(col("source"), col("shard"))
          .agg(sum(col("n_docs")).as("n_docs"),
            countDistinct(col("h")).as("n_distinct"),
            sum(col("s1")).as("s1"), sum(col("s2")).as("s2"),
            min(col("mn")).as("mn"), max(col("mx")).as("mx")))
      (rows(reMerged) == rows(MergeProfile.profile(df, 1L))) :|
        s"split at $k diverged from direct"
    }
}

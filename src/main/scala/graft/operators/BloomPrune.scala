package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pruning for selective joins — the hand-held form
  * of the plan Spark's own `InjectRuntimeFilter` emits when a join has a
  * selective build side: a `bloom_filter_agg` over the build keys inside
  * a scalar subquery, and a `might_contain` predicate on the probe scan.
  * The optimizer's version only triggers past size/selectivity
  * thresholds it can prove from statistics; this operator lets a
  * pipeline author apply the same pruning deliberately.
  *
  * Why it matters at scale: a semi join shuffles the ENTIRE probe side
  * on the join key before any build-side row can reject anything. The
  * bloom predicate evaluates at the probe scan — before the exchange —
  * so a build side selecting p% of probe rows cuts the probe shuffle to
  * ~p% (+ the false-positive rate). At a 100 TB probe table that is the
  * difference between shuffling terabytes and shuffling the answer.
  *
  * Correctness: a bloom filter has no false negatives, so the prefilter
  * never drops a matching row; the exact semi join after it removes the
  * false positives. Results are identical to the plain semi join — the
  * bloom only moves work earlier.
  *
  * Both expressions are Catalyst internals (registered SQL-visible by
  * [[graft.functions.GraftExtensions]]); `might_contain` requires its
  * bloom argument to be a constant or scalar subquery, which is exactly
  * what `Dataset.scalar()` produces. xxhash64 is type-sensitive: probe
  * and build key columns must have the SAME type (cast first if not).
  */
object BloomPrune {

  /** The serialized bloom filter of `build`'s key set, as a scalar
    * subquery Column usable inside `might_contain`. `estItems`/`numBits`
    * size the sketch: callers at scale should pass stats-derived
    * estimates (numBits ≈ 10× estItems gives ~1% false positives). */
  def bloomOf(build: DataFrame, buildKey: String, estItems: Long, numBits: Long): Column =
    build.agg(call_function("bloom_filter_agg",
      xxhash64(col(buildKey)), lit(estItems), lit(numBits)).as("bf")).scalar()

  /** Exact semi join of `probe` against `build`'s keys with a bloom
    * pre-prune on the probe scan (no false negatives; false positives
    * removed by the semi join). Defaults size the sketch for ~64k build
    * keys at ~1% fpp. */
  def prunedSemiJoin(
      probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      estItems: Long = 1L << 16, numBits: Long = 1L << 19): DataFrame = {
    val pruned = probe.filter(call_function("might_contain",
      bloomOf(build, buildKey, estItems, numBits), xxhash64(col(probeKey))))
    // rename the build key so a same-named probe key can't make the join
    // condition ambiguous; no distinct — semi-join semantics already
    // deduplicate the build side, a pre-distinct is a wasted exchange
    val keys = build.select(col(buildKey).as("__bloom_bk"))
    pruned.join(keys, col(probeKey) === col("__bloom_bk"), "left_semi")
  }
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982) as a typed
  * Aggregator, with the MERGEABLE reduction of Agarwal et al. 2013
  * ("Mergeable summaries", PODS 2012): the buffer is ≤ k (item, count)
  * counters; reduce increments / inserts / decrements-all-when-full;
  * merge sums both counter sets and, if more than k survive, subtracts
  * the (k+1)-th largest count from every counter and drops the ≤ 0 —
  * which preserves the summary guarantee under ARBITRARY merge trees,
  * exactly what map-side partial aggregation needs. Guarantees after
  * any combine order, for stream length n:
  *   - undercount: 0 ≤ true(x) − est(x) ≤ n/(k+1) for every item x;
  *   - containment: every x with true(x) > n/(k+1) has a counter.
  * The counter VALUES depend on arrival/merge order (not reproducible
  * across partitionings) — callers must gate on the guarantees, never
  * hash-compare raw estimates (see q183's gate-vector oracle).
  *
  * Scale: the buffer is O(k) regardless of input size, so the shuffle
  * carries k counters per partition instead of the full frequency
  * table — the sketch alternative to q147's exact top-K when the
  * vocabulary itself no longer fits an exact aggregate.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Array[(String, Long)], Array[(String, Long)]] {
  require(k >= 1, "MisraGries needs at least one counter")

  override def zero: Array[(String, Long)] = Array.empty

  override def reduce(buf: Array[(String, Long)], item: String): Array[(String, Long)] = {
    val i = buf.indexWhere(_._1 == item)
    if (i >= 0) { buf(i) = (item, buf(i)._2 + 1); buf }
    else if (buf.length < k) buf :+ (item, 1L)
    else buf.map { case (t, c) => (t, c - 1) }.filter(_._2 > 0)
  }

  override def merge(a: Array[(String, Long)], b: Array[(String, Long)]): Array[(String, Long)] = {
    val summed = (a ++ b).groupBy(_._1).map { case (t, cs) => (t, cs.map(_._2).sum) }.toArray
    if (summed.length <= k) summed
    else {
      // subtract the (k+1)-th largest count; at most k counters stay positive
      val cut = summed.map(_._2).sorted(Ordering[Long].reverse)(k)
      summed.map { case (t, c) => (t, c - cut) }.filter(_._2 > 0)
    }
  }

  override def finish(buf: Array[(String, Long)]): Array[(String, Long)] =
    buf.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[Array[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(String, Long)]]()
  override def outputEncoder: Encoder[Array[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(String, Long)]]()
}

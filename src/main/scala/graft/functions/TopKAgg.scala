package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k per group as a typed Aggregator.
  *
  * `row_number() over (partition by g order by v desc) <= k` sorts EVERY
  * group's full row set. This aggregator keeps only the k best
  * (value desc, id asc) entries per partial buffer, so map-side partial
  * aggregation reduces each partition's contribution to k rows before
  * the shuffle — the difference between shuffling |table| and
  * shuffling k·|groups| at 100 TB. Output is the sorted top-k array,
  * ready for inline/posexplode.
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (-v, id) }

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)], in: (Double, Long)): Array[(Double, Long)] =
    merge(buf, Array(in))

  override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] = buf.sorted(ord)

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
}

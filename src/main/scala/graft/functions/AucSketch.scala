package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass AUC sketch as a typed `Aggregator[IN, BUF, OUT]`
  * (SURVEY §2.10: "AUC-via-single-pass could be a custom
  * TypedImperativeAggregate").
  *
  * The exact windowed ROC (q46) sorts by score — a global sort. This
  * aggregator instead bins scores into `nBins` buckets and accumulates
  * (pos, neg) counts per bucket: reduce/merge are O(1)/O(nBins), fully
  * partition-parallel and shuffle-free beyond the final merge, which is
  * what a 100 TB AUC needs. The result is the trapezoid AUC of the
  * binned ROC — exact to 1/nBins resolution, and exactly reproducible in
  * SQL (the oracle recomputes the identical binned curve).
  *
  * Buffer layout: bin-major Array[Long] of length 2·nBins —
  * [pos(bin0), neg(bin0), pos(bin1), …]. Scores must lie in [0, 1].
  */
class AucSketch(nBins: Int) extends Aggregator[(Double, Int), Array[Long], Double] {

  override def zero: Array[Long] = new Array[Long](2 * nBins)

  override def reduce(buf: Array[Long], in: (Double, Int)): Array[Long] = {
    // clamp to [0, nBins-1]: a score outside the documented [0,1] domain
    // (or NaN, which floors to bin 0) lands in the edge bin instead of
    // indexing out of bounds deep inside codegen'd aggregation
    val bin = math.max(0, math.min(math.floor(in._1 * nBins).toInt, nBins - 1))
    if (in._2 == 1) buf(2 * bin) += 1 else buf(2 * bin + 1) += 1
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  /** Trapezoid over the binned ROC, sweeping thresholds high → low —
    * the same accumulation order as the oracle's bin-desc window. */
  override def finish(buf: Array[Long]): Double = {
    var pos = 0L; var neg = 0L
    var i = 0
    while (i < nBins) { pos += buf(2 * i); neg += buf(2 * i + 1); i += 1 }
    if (pos == 0L || neg == 0L) return Double.NaN
    var auc = 0.0
    var cumTp = 0L; var cumFp = 0L
    var prevTpr = 0.0; var prevFpr = 0.0
    var bin = nBins - 1
    while (bin >= 0) {
      cumTp += buf(2 * bin); cumFp += buf(2 * bin + 1)
      val tpr = cumTp.toDouble / pos
      val fpr = cumFp.toDouble / neg
      auc += (fpr - prevFpr) * (tpr + prevTpr) / 2.0
      prevTpr = tpr; prevFpr = fpr
      bin -= 1
    }
    auc
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

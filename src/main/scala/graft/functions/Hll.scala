package graft.functions

/** Canonical Scala twin of the q211 HyperLogLog arithmetic
  * (`queries/ExtQueries.q211HllCardinality` and its DuckDB oracle):
  * rolling hash → Wang 31-bit avalanche finalizer → register = h mod
  * 256, rank = 24 − bitlen(h div 256). Every function here is exact
  * integer (or one constant-folded IEEE chain for the estimate), so a
  * register vector built by this object is bit-identical to the batch
  * query's — the streaming gate ([[graft.streaming.StreamOps
  * .distinctSketchState]]) folds through THIS object and its spec pins
  * stream-final state against the batch engine output, the same
  * one-rule-two-tiers discipline as MisraGries/q183.
  *
  * The register algebra is max-merge: commutative, associative,
  * idempotent — which is what makes the sketch safe under partial
  * aggregation, shard merge, micro-batch re-chunking AND at-least-once
  * replay (a re-delivered key max-merges to a no-op).
  */
object Hll {
  val M = 256

  /** 31-bit avalanched key hash: the q211 rolling hash + Wang finalizer. */
  def hash(s: String): Long = {
    val h0 = s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31L + (b & 0xff)) % 1000000007L)
    val h1 = (h0 ^ (h0 >> 16)) * 73244475L % 2147483648L
    val h2 = (h1 ^ (h1 >> 13)) * 73244475L % 2147483648L
    h2 ^ (h2 >> 16)
  }

  def register(h: Long): Int = (h % M).toInt

  /** Rank over the 23-bit window above the register bits: 24 − bitlen. */
  def rank(h: Long): Long = {
    val w = h / M
    if (w == 0L) 24L else 24L - (64 - java.lang.Long.numberOfLeadingZeros(w))
  }

  def zero: Array[Long] = Array.fill(M)(0L)

  /** Fold one key into a register vector (returns its input, mutated —
    * callers own the array). */
  def add(regs: Array[Long], key: String): Array[Long] = {
    val h = hash(key)
    val j = register(h)
    val r = rank(h)
    if (r > regs(j)) regs(j) = r
    regs
  }

  /** Max-merge two register vectors into a fresh one. */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    Array.tabulate(M)(i => math.max(a(i), b(i)))

  /** Exact-long harmonic denominator: Σ 2^(30 − M[j]), empties = 2^30. */
  def denom(regs: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < M) { s += 1L << (30 - regs(i)).toInt; i += 1 }
    s
  }

  /** The q211 estimate chain, identical op order to both engines:
    * α₂₅₆·m²·2^30/denom on the floored micro grid. */
  def estMicro(denomScaled: Long): Long =
    math.floor(0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 1073741824.0
      / denomScaled.toDouble * 1e6 + 0.5).toLong

  /** (regs_used, sum_rank, max_rank, denom, est_micro) — the q211
    * output columns derived from a register vector. */
  def summary(regs: Array[Long]): (Long, Long, Long, Long, Long) = {
    val used = regs.count(_ > 0L).toLong
    val d = denom(regs)
    (used, regs.sum, regs.max, d, estMicro(d))
  }
}

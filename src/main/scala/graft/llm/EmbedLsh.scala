package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Adaptive-width hyperplane LSH over embedding columns — the shared
  * core of the embedding near-dup detector (`q57_embed_neardup`) and
  * the bucketed ANN path (`q39_ann_lsh`).
  *
  * The band/bucket KEY WIDTH is sized to the corpus, not fixed: a fixed
  * small width caps the bucket count, so at 100× the data every bucket
  * holds 100× the rows and the band self-join's candidate set grows
  * O(N²/buckets) — the all-pairs explosion banding exists to avoid.
  * Sizing rule (same shape as [[graft.ml.SmoteLsh]]'s):
  *
  *   bits = clamp(ceil(log2(n / targetBucketRows)), lo, hi)
  *
  * computed with INTEGER arithmetic (the bit-length of (n-1)/target) so
  * the DuckDB oracle can state the identical formula with no float-log
  * edge cases; expected bucket occupancy stays ≈ targetBucketRows and
  * expected candidate pairs stay O(N · targetBucketRows) at any corpus
  * size (EmbedLshSpec pins this on a 10× synthetic corpus).
  *
  * Hyperplane weights are pure integer arithmetic on (plane, dim) —
  * both engines generate the same planes from the same formula, so
  * bucket membership (and therefore LSH recall behaviour) is
  * oracle-checked exactly, at every adaptively-chosen width.
  */
object EmbedLsh {

  val EmbDim = 64

  /** q57 near-dup banding: 4 bands, ≈16 rows per band bucket. */
  val NumBands = 4
  val BandTarget = 16L
  val BandMinBits = 2
  val BandMaxBits = 20

  /** q39 ANN bucketing: one table, ≈32 rows per bucket, Hamming-1
    * multi-probe (so recall survives the narrower adaptive buckets). */
  val AnnTarget = 32L
  val AnnMinBits = 2
  val AnnMaxBits = 16

  /** Deterministic hyperplane weight w(plane, d) ∈ [-504, 504]. */
  def w(plane: Int, d: Int): Double =
    ((2654435761L * (plane.toLong * EmbDim + d + 1)) % 1009L - 504L).toDouble

  /** bits = clamp(ceil(log2(n / target)), lo, hi), integer-exact:
    * ceil(log2(x)) for x = n/target is the bit length of (n-1)/target
    * (64 - nlz), which [[adaptiveBitsSql]] states as length(bin(m)). */
  def adaptiveBits(n: Long, target: Long, lo: Int, hi: Int): Int = {
    val m = (math.max(n, 1L) - 1L) / target
    val raw = 64 - java.lang.Long.numberOfLeadingZeros(m)
    math.min(hi, math.max(lo, raw))
  }

  /** The DuckDB scalar computing the same bits from the same count —
    * embed as `(SELECT $expr FROM <corpus>)` so oracle SQL adapts to
    * the scale factor exactly like the Spark plan does. (For m = 0 the
    * SQL bit length is 1 vs Scala's 0; both land on `lo` ≥ 1.) */
  def adaptiveBitsSql(target: Long, lo: Int, hi: Int): String =
    s"least($hi, greatest($lo, length(bin((count(*) - 1) // $target))))"

  /** DuckDB list literal-free weight row for plane expression `plane`:
    * generated from the same integer formula as [[w]]. */
  def wListSql(plane: String): String =
    s"list_transform(range(0, $EmbDim), d -> " +
      s"((2654435761 * (($plane) * $EmbDim + d + 1)) % 1009 - 504)::DOUBLE)"

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Sign bit of hyperplane `plane` against an `emb` column, weighted
    * into key position `b`. */
  private def signBit(emb: Column, plane: Int, b: Int): Column = {
    val wArr = array((0 until EmbDim).map(d => lit(w(plane, d))): _*)
    when(dot(emb, wArr) > 0, lit(1L << b)).otherwise(lit(0L))
  }

  /** The band-key kernel as a struct-array column — for callers that
    * must keep their own id/payload columns alongside the keys (the
    * streaming ingest gate): `NumBands` structs of (band_id, bkey),
    * band `t` drawing planes t·BandMaxBits+b so widths can grow
    * without re-using another band's planes. */
  def bandKeyArray(emb: Column, bits: Int): Column =
    array((0 until NumBands).map { t =>
      struct(lit(t).as("band_id"),
        (0 until bits).map(b => signBit(emb, t * BandMaxBits + b, b))
          .reduce(_ + _).as("bkey"))
    }: _*)

  /** (vec_id, band_id, bkey) — [[bandKeyArray]] exploded. Only the 3
    * small columns cross the band-join shuffle; embeddings join back
    * after candidate dedup. */
  def bandKeys(e: DataFrame, bits: Int): DataFrame =
    e.select(col("vec_id"), explode(bandKeyArray(col("emb"), bits)).as("b"))
      .select(col("vec_id"), col("b.band_id"), col("b.bkey"))

  /** Distinct candidate pairs sharing ≥1 band key — ALWAYS an equi-join
    * on (band_id, bkey), never a cross product. */
  def candidatePairs(banded: DataFrame): DataFrame =
    banded.as("x").join(banded.as("y"),
        col("x.band_id") === col("y.band_id") && col("x.bkey") === col("y.bkey") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("keep_id"), col("y.vec_id").as("dup_id"))
      .distinct()

  /** (vec_id, emb, bucket): the single adaptive-width ANN bucket key
    * (planes 0..bits-1 — the q39 namespace). */
  def annBuckets(e: DataFrame, bits: Int): DataFrame =
    e.withColumn("bucket",
      (0 until bits).map(b => signBit(col("emb"), b, b)).reduce(_ + _))

  /** Multi-probe key set for a bucketed query row: its own bucket plus
    * every Hamming-1 neighbor. Each corpus vector lives in exactly one
    * bucket and the probe keys are distinct, so the probe join produces
    * each (query, vector) pair at most once — no dedup needed. */
  def probeKeys(bucket: Column, bits: Int): Column =
    array((bucket +: (0 until bits).map(i => bucket.bitwiseXOR(lit(1L << i)))): _*)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data locality —
  * the engine-level analogue of Delta/Iceberg `OPTIMIZE ZORDER BY`.
  *
  * A parquet scan prunes row groups by min/max column statistics, which
  * works only when the layout CLUSTERS the filtered column. Sorting by
  * one column destroys locality for every other; interleaving the bits
  * of two (or more) normalized keys gives every participating column
  * range-locality at once, so a selective filter on ANY of them skips
  * most row groups at 100 TB instead of reading them all.
  *
  * The z-value is pure integer Column arithmetic (shifts, masks, adds —
  * whole-stage codegen, oracle-replicable bit for bit); the writer side
  * is `repartitionByRange(z) + sortWithinPartitions(z)`, which is
  * exactly the shape a table OPTIMIZE would run as a maintenance job.
  */
object ZOrder {

  /** Bits per dimension (two dims → 2·Bits-bit z-values, fits a long). */
  val Bits = 16

  /** Interleave the low [[Bits]] bits of two non-negative integer
    * columns: bit b of `a` lands at position 2b, bit b of `b` at
    * 2b + 1. Inputs must already be normalized to [0, 2^Bits) —
    * see [[rankNormalize]] for arbitrary domains. */
  def zValue(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      (shiftright(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** The same interleave as DuckDB SQL text over integer expressions
    * `a` and `b` — generated from the same constants so the oracle
    * recomputes identical z-values (the LSH parity pattern). */
  def zValueSql(a: String, b: String): String =
    (0 until Bits).map { i =>
      s"((($a) >> $i) & 1) * ${1L << (2 * i)} + ((($b) >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** Normalize a numeric column into [0, 2^Bits) by min/max affine
    * scaling: one tiny aggregate for the bounds, then pure scan-shaped
    * arithmetic — fully distributed (a percent_rank normalization would
    * be an unpartitioned global-sort window: a single-task straggler at
    * 100 TB). Distribution-skewed dimensions compress into few codes;
    * for those, pre-bucket by approx quantiles before calling this. */
  def minMaxNormalize(c: Column, mn: Double, mx: Double): Column =
    if (mx > mn)
      floor((c.cast("double") - lit(mn)) * lit((1L << Bits) - 1).cast("double")
        / lit(mx - mn)).cast("long")
    else lit(0L)

  /** The matching DuckDB text over SQL expressions for the value and
    * its corpus bounds (the oracle computes mn/mx from its own
    * aggregates; both engines then run the identical IEEE formula). */
  def minMaxNormalizeSql(e: String, mn: String, mx: String): String =
    s"CAST(floor((($e)::DOUBLE - ($mn)) * ${(1L << Bits) - 1}.0 / (($mx) - ($mn))) AS BIGINT)"

  /** Cluster a frame by the z-value of two pre-normalized dimensions:
    * range-partition so files hold disjoint z-ranges, sort within
    * partitions so row groups inside each file are z-local too. */
  def clusterBy(df: DataFrame, zCol: String, numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(col(zCol))
}

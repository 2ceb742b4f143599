package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (known vectors)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (65535L, 0L), (0L, 65535L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
    assert(df.collect().map(_.getLong(0)).toSeq ===
      Seq(0L, 1L, 2L, 3L, 0x55555555L, 0xAAAAAAAAL))
  }

  test("z-clustered blocks are range-local on BOTH dims; row-major order is not") {
    // exact 128x128 grid: a z-sorted block of 256 rows is a 16x16 tile,
    // so a narrow filter on `a` overlaps ~1/8 of blocks; row-major
    // layout makes EVERY 256-row block span the full a-range
    val n = 128 * 128
    val grid = spark.range(n)
      .select((col("id") % 128).as("a"), (col("id") / 128).cast("long").as("b"))
    val withZ = grid.select(col("a"), col("b"),
      ZOrder.zValue(col("a") * 512, col("b") * 512).as("z")) // scale into 16-bit domain
    def overlapping(rows: Array[(Long, Long)], blockRows: Int, lo: Long, hi: Long): Int =
      rows.grouped(blockRows).count { blk =>
        val as = blk.map(_._1); as.min <= hi && as.max >= lo
      }
    val zSorted = withZ.orderBy(col("z")).select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rowMajor = grid.orderBy(col("b"), col("a"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (lo, hi) = (40L, 47L) // 8 of 128 values ≈ 6% selectivity
    val zBlocks = overlapping(zSorted, 256, lo, hi)
    val nBlocks = n / 256
    val naturalBlocks = overlapping(rowMajor, 256, lo, hi)
    assert(naturalBlocks === nBlocks, "row-major baseline should overlap every block")
    assert(zBlocks <= nBlocks / 4,
      s"z-order locality too weak: $zBlocks of $nBlocks blocks overlap a 6% filter")
    // and the same z-sorted blocks are local on b as well (z-order is
    // NOT a single-column sort in disguise)
    val zBlocksB = zSorted.grouped(256).count { blk =>
      val bs = blk.map(_._2); bs.min <= hi && bs.max >= lo
    }
    assert(zBlocksB <= nBlocks / 4, s"no b-locality: $zBlocksB of $nBlocks")
  }

  test("clusterBy range-partitions and sorts by z") {
    val df = spark.range(1000)
      .select((col("id") % 100).as("a"), (col("id") / 100).cast("long").as("b"))
      .withColumn("z", ZOrder.zValue(col("a"), col("b")))
    val clustered = ZOrder.clusterBy(df, "z", numPartitions = 4)
    // within every partition, z must be non-decreasing
    val ok = clustered.select(col("z")).mapPartitions { it =>
      val zs = it.map(_.getLong(0)).toSeq
      Iterator(zs == zs.sorted)
    }.collect()
    assert(ok.forall(identity), "z not sorted within partitions")
    assert(clustered.rdd.getNumPartitions === 4)
  }
}

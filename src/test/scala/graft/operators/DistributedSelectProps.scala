package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._

/** ScalaCheck properties for the two-phase exact primitives: for ANY
  * key/weight layout, ANY bucket width, and ANY input partitioning, the
  * two-level decompositions equal their single-task window/sort
  * references bit-for-bit. Width and partitioning are performance knobs
  * — these properties are what make that claim a theorem of the
  * implementation rather than a hope: the q198–q203 twins lean on
  * exactly this equality.
  */
object DistributedSelectProps extends Properties("distributedselect") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // sparse unique keys (gaps exercise empty buckets), bounded weights,
  // adversarial widths (1 = one bucket per key, huge = one bucket total)
  private val layouts = for {
    n <- Gen.choose(20, 300)
    gap <- Gen.choose(1, 97)
    width <- Gen.oneOf(1L, 7L, 256L, 1000000L)
    parts <- Gen.choose(1, 7)
    seed <- Gen.choose(0, 1000)
  } yield (n, gap, width, parts, seed)

  property("globalPrefixSum == ordered-window cumsum for any layout/width/partitioning") =
    Prop.forAll(layouts) { case (n, gap, width, parts, seed) =>
      val rnd = new scala.util.Random(seed)
      val rows = (0 until n).scanLeft((0L, 0L)) { case ((k, _), _) =>
        (k + 1L + rnd.nextInt(gap), rnd.nextInt(100).toLong)
      }.drop(1)
      val df = rows.toDF("k", "w").repartition(parts)
      val expect = rows.sortBy(_._1).scanLeft((0L, 0L)) {
        case ((_, cum), (k, w)) => (k, cum + w)
      }.drop(1).toMap
      val got = DistributedSelect.globalPrefixSum(df, "k", "w", "cum", width)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      got == expect
    }

  property("globalRowNumber == row_number for any layout/width/partitioning") =
    Prop.forAll(layouts) { case (n, gap, width, parts, seed) =>
      val rnd = new scala.util.Random(seed)
      val keys = (0 until n).scanLeft(0L) { case (k, _) =>
        k + 1L + rnd.nextInt(gap)
      }.drop(1)
      val df = keys.toDF("k").repartition(parts)
      val expect = keys.sorted.zipWithIndex.map { case (k, i) => (k, i + 1L) }.toMap
      val got = DistributedSelect.globalRowNumber(df, "k", "rnk", width)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      got == expect
    }

  property("kth == sorted reference on any multiset, every rank, any width") =
    Prop.forAll(layouts) { case (n, gap, width, parts, seed) =>
      val rnd = new scala.util.Random(seed)
      // multiset: duplicates on purpose (values from a small domain)
      val vs = Seq.fill(n)(rnd.nextInt(gap * 10).toLong)
      val sorted = vs.sorted
      val ranks = Seq(1L, (n / 2 + 1).toLong, n.toLong).distinct
      val got = DistributedSelect.kth(vs.toDF("v").repartition(parts), ranks, width)
      ranks.forall(k => got(k) == sorted((k - 1).toInt))
    }
}

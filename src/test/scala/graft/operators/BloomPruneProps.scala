package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._

/** ScalaCheck property: for ANY probe/build key layout and ANY sketch
  * sizing (including deliberately undersized filters with high
  * false-positive rates), the bloom-pruned semi join returns exactly the
  * plain semi join — false positives are removed by the exact join and
  * false negatives cannot exist. */
object BloomPruneProps extends Properties("bloomprune") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val layouts = for {
    nProbe <- Gen.choose(50, 500)
    keySpace <- Gen.choose(5, 60)
    nBuild <- Gen.choose(1, 20)
    numBits <- Gen.oneOf(64L, 1L << 10, 1L << 14) // 64 bits = lots of false positives
    seed <- Gen.choose(0, 1000)
  } yield (nProbe, keySpace, nBuild, numBits, seed)

  property("pruned semi join == plain semi join under any sketch sizing") =
    Prop.forAll(layouts) { case (nProbe, keySpace, nBuild, numBits, seed) =>
      val rnd = new scala.util.Random(seed)
      val probe = (1 to nProbe).map(i => (rnd.nextInt(keySpace).toLong, i)).toDF("k", "v")
      val build = Seq.fill(nBuild)(rnd.nextInt(keySpace * 2).toLong).distinct.toDF("bk")
      val plain = probe.join(build, probe("k") === build("bk"), "left_semi")
        .orderBy("k", "v").collect().toSeq
      val pruned = BloomPrune.prunedSemiJoin(probe, "k", build, "bk",
          estItems = nBuild.toLong.max(1L), numBits = numBits)
        .orderBy("k", "v").collect().toSeq
      pruned == plain
    }
}

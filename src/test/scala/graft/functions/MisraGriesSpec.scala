package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** The two Misra–Gries theorems, checked directly on the aggregator's
  * reduce/merge (no Spark session needed): for ANY stream and ANY merge
  * tree, every item undercounts by at most n/(k+1), and every item with
  * true frequency > n/(k+1) keeps a counter.
  */
object MisraGriesTestKit {
  def run(k: Int, parts: Seq[Seq[String]]): Map[String, Long] = {
    val agg = new MisraGries(k)
    val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    agg.finish(bufs.foldLeft(agg.zero)(agg.merge)).toMap
  }
}

class MisraGriesSpec extends AnyFunSuite {
  test("known stream: the dominant item survives with a bounded undercount") {
    val stream = Seq.fill(60)("a") ++ Seq.fill(25)("b") ++
      (1 to 15).map(i => s"x$i")
    val est = MisraGriesTestKit.run(3, Seq(stream))
    val n = stream.length
    assert(est.contains("a"), "dominant item evicted")
    assert(est("a") <= 60L && 60L - est("a") <= n / 4,
      s"undercount bound violated: ${est("a")}")
    assert(est.size <= 3)
  }
}

/** Property form: the stream is split at random points and the partial
  * summaries merged — exactly what map-side partial aggregation plus an
  * arbitrary shuffle combine does to the buffer. */
object MisraGriesProps extends Properties("misra-gries") {
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(200)
      .withInitialSeed(org.scalacheck.rng.Seed(11L))

  private val gen = for {
    k <- Gen.choose(2, 8)
    n <- Gen.choose(1, 300)
    items <- Gen.listOfN(n, Gen.frequency(
      (5, Gen.const("hot")), (3, Gen.const("warm")),
      (2, Gen.oneOf((1 to 40).map(i => s"c$i")))))
    cuts <- Gen.listOfN(3, Gen.choose(0, items.length))
  } yield (k, items, cuts.sorted)

  property("containment + undercount + size cap under random merge trees") =
    Prop.forAll(gen) { case (k, items, cuts) =>
      val bounds = (0 +: cuts :+ items.length).distinct.sorted
      val parts = bounds.sliding(2).map { case Seq(a, b) => items.slice(a, b) }.toSeq
      val est = MisraGriesTestKit.run(k, parts)
      val truth = items.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val slack = items.length.toDouble / (k + 1)
      val contained = truth.forall { case (t, f) =>
        f.toDouble <= slack || est.contains(t)
      }
      val bounded = truth.forall { case (t, f) =>
        val e = est.getOrElse(t, 0L)
        e <= f && (f - e).toDouble <= slack
      }
      (contained :| "heavy hitter evicted") &&
        (bounded :| "undercount bound violated") &&
        ((est.size <= k) :| "counter cap exceeded")
    }
}

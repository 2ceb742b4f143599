package graft.llm

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** ScalaCheck properties for [[IncrementalDedup]]: for ANY random
  * similarity structure (docs drawn from a small shingle universe, so
  * the verified-pair graph is dense and arbitrarily shaped — cliques,
  * stars, chains, isolates) and ANY chopping of the id-ordered corpus
  * into ingest batches, the decisions equal the one-doc-at-a-time
  * sequential greedy reference bit-for-bit. The corpus spec pins the
  * real-data case and the chain spec the worst case; these properties
  * make the equivalence a theorem over the graph space. Identical
  * MinHash signatures make every pair a banding candidate, so the
  * exact-Jaccard verify alone carves the graph — the properties stress
  * the MIS and attribution logic, not the LSH. */
object IncrementalDedupProps extends Properties("incrementaldedup") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private lazy val spark = SparkSpec.session

  private val Bands = graft.functions.MinHashParams.planBands(16, 0.4)._1
  private val Theta = 0.4

  private val corpora = for {
    n <- Gen.choose(10, 50)
    univ <- Gen.choose(6, 16)
    maxLen <- Gen.choose(2, 6)
    seed <- Gen.choose(0, 10000)
    cuts <- Gen.choose(0, 4)
  } yield (n, univ, maxLen, seed, cuts)

  private def mkDocs(n: Int, univ: Int, maxLen: Int, seed: Int): Seq[(Long, Set[Long])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val len = 1 + rnd.nextInt(maxLen)
      (i.toLong, rnd.shuffle((0 until univ).toList).take(len).map(_.toLong).toSet)
    }
  }

  /** The engine's gate arithmetic exactly: 4dp-floored Jaccard ≥ θ. */
  private def near(a: Set[Long], b: Set[Long]): Boolean = {
    val inter = (a & b).size.toDouble
    math.floor(inter / (a.size + b.size - inter) * 10000.0 + 0.5) / 10000.0 >= Theta
  }

  private def seqRef(docs: Seq[(Long, Set[Long])]): Map[Long, (Long, Option[Long])] = {
    val admitted = scala.collection.mutable.LinkedHashMap[Long, Set[Long]]()
    docs.sortBy(_._1).map { case (id, hh) =>
      val adm = admitted.collect { case (aid, ahh) if near(hh, ahh) => aid }
      if (adm.isEmpty) { admitted += id -> hh; id -> ((1L, None)) }
      else id -> ((0L, Some(adm.min)))
    }.toMap
  }

  private def toDF(docs: Seq[(Long, Set[Long])]): DataFrame = {
    import spark.implicits._
    docs.map { case (id, hh) => (id, hh.toSeq.sorted, Seq.fill(16)(7L)) }
      .toDF("doc_id", "hh", "sig")
  }

  private def decisions(df: DataFrame): Map[Long, (Long, Option[Long])] =
    df.collect().map { r =>
      r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    }.toMap

  property("any random similarity graph, chopped anywhere, equals the sequential greedy reference") =
    Prop.forAll(corpora) { case (n, univ, maxLen, seed, cuts) =>
      val docs = mkDocs(n, univ, maxLen, seed)
      val expected = seqRef(docs)
      val rnd = new scala.util.Random(seed + 1)
      val bounds = Seq.fill(cuts)(rnd.nextInt(n).toLong).distinct.sorted
      val ranges = (Long.MinValue +: bounds).zip(bounds :+ Long.MaxValue)
      val idx = Files.createTempDirectory("graft-inc-prop").toString
      val got = ranges.flatMap { case (lo, hi) =>
        val batch = docs.filter(d => d._1 >= lo && d._1 < hi)
        if (batch.isEmpty) Map.empty[Long, (Long, Option[Long])]
        else decisions(IncrementalDedup.ingest(spark, idx, toDF(batch),
          Bands, Theta, maxRounds = n))
      }.toMap
      got == expected
    }
}

package graft.llm

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._

/** ScalaCheck properties for the fixed-point PageRank loop: under ANY
  * random graph, (1) total mass never exceeds the scale and floor
  * leakage stays bounded, (2) a node nobody links to holds exactly the
  * base rank, and (3) relabeling the nodes permutes the ranks — the
  * algorithm sees only graph structure, never id magnitudes. */
object PageRankProps extends Properties("pagerank") {

  // fixed seed: each case runs a multi-iteration Spark job; a pinned,
  // reviewable case set beats a randomly flaking rare layout
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(4)
      .withInitialSeed(org.scalacheck.rng.Seed(7L))

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val Scale = 1000000L
  private val graphs = for {
    n <- Gen.choose(4, 12)
    // adjacency as an edge mask: for each ordered (i,j), i≠j, a biased coin
    edges <- Gen.listOfN(n * n, Gen.frequency(1 -> true, 2 -> false))
  } yield (n, edges)

  private def edgeList(n: Int, mask: List[Boolean]): Seq[(Long, Long)] =
    (for {
      i <- 0 until n
      j <- 0 until n
      if i != j && mask(i * n + j)
    } yield (i.toLong, j.toLong))

  property("mass bounded above by scale, below by the base floor") =
    Prop.forAll(graphs) { case (n, mask) =>
      val es = edgeList(n, mask)
      val nodes = (0L until n.toLong).toDF("idx")
      val edges = es.toDF("src", "dst")
      val prs = PageRank.run(nodes, edges, Scale, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val base = 15L * (Scale / n) / 100L
      val mass = prs.values.sum
      // dangling nodes leak their damped mass entirely; every node still
      // carries at least base, and mass can never exceed the scale
      (mass <= Scale) :| s"mass $mass exceeds scale" &&
        prs.values.forall(_ >= base) :| s"some rank below base $base: $prs"
    }

  property("a node with no in-links holds exactly the base rank") =
    Prop.forAll(Gen.choose(4, 10)) { n =>
      // star out of node 0: 0 → everyone; nobody links back to 0
      val edges = (1 until n).map(j => (0L, j.toLong)).toDF("src", "dst")
      val nodes = (0L until n.toLong).toDF("idx")
      val prs = PageRank.run(nodes, edges, Scale, iters = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val base = 15L * (Scale / n) / 100L
      (prs(0L) == base) :| s"hub with no in-links got ${prs(0L)}, want $base"
    }

  property("relabeling nodes permutes ranks (structure-only dependence)") =
    Prop.forAll(graphs) { case (n, mask) =>
      val es = edgeList(n, mask)
      val nodes = (0L until n.toLong).toDF("idx")
      val prs = PageRank.run(nodes, es.toDF("src", "dst"), Scale, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // relabel i ↦ 1000 + (n-1-i): order-reversing AND offset, so any
      // accidental dependence on id ordering or magnitude breaks it
      def rl(i: Long) = 1000L + (n - 1 - i)
      val nodes2 = (0L until n.toLong).map(rl).toDF("idx")
      val prs2 = PageRank.run(nodes2,
          es.map { case (a, b) => (rl(a), rl(b)) }.toDF("src", "dst"),
          Scale, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      prs.forall { case (i, p) => prs2(rl(i)) == p } :|
        s"relabeled ranks diverged: $prs vs $prs2"
    }
}

package graft.llm

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ScalaCheck properties for the concat-and-chunk packing operator
  * (the q77 shape): for ANY corpus of (source, token-length) rows, the
  * partitioned cumulative-sum packing must (a) assign every doc exactly
  * one pack, (b) produce contiguous per-source token ranges identical
  * to a sequential reference fold, and (c) keep every offset inside the
  * window. Case counts kept small — each case is a Spark job. */
object PackingProps extends Properties("graft.packing") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val Win = 64L

  private val corpora: Gen[List[(Long, String, Long)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      src <- Gen.oneOf("a", "b", "c")
      tokens <- Gen.choose(1L, 100L) // docs may exceed the window alone
    } yield (src, tokens))
  } yield rows.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }

  private def packSpark(rows: List[(Long, String, Long)]): Map[Long, (Long, Long)] = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    rows.toDF("doc_id", "source", "n_tokens")
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), expr(s"cum_before div $Win").as("pack_id"),
        (col("cum_before") % Win).as("offset"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  /** Sequential reference: fold each source's docs in doc_id order. */
  private def packReference(rows: List[(Long, String, Long)]): Map[Long, (Long, Long)] =
    rows.groupBy(_._2).flatMap { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._1).map { case (id, _, t) =>
        val res = id -> ((cum / Win, cum % Win))
        cum += t
        res
      }
    }

  property("packing equals the sequential per-source fold") =
    Prop.forAll(corpora) { rows =>
      val got = packSpark(rows)
      val want = packReference(rows)
      (got.keySet == rows.map(_._1).toSet) :| "every doc packed exactly once" &&
        (got == want) :| s"packing diverged from the sequential fold"
    }

  property("offsets always lie inside the window") =
    Prop.forAll(corpora) { rows =>
      packSpark(rows).values.forall { case (_, off) => off >= 0 && off < Win }
    }
}

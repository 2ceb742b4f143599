package graft.ml

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._

/** ScalaCheck properties (SURVEY §5.2): SMOTE balance/bounds over random
  * imbalance ratios, scaler round-trip, and upsert idempotence under
  * replay. Case counts are kept small — each case is a Spark job. */
object SmoteProps extends Properties("graft") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val shapes = for {
    nMaj <- Gen.choose(10, 60)
    nMin <- Gen.choose(2, nMaj)
  } yield (nMaj, nMin)

  property("smote balances any imbalance and stays inside the minority box") =
    Prop.forAll(shapes) { case (nMaj, nMin) =>
      val df = ((0 until nMaj).map(i => (i * 1.0, -i * 2.0, 0)) ++
        (0 until nMin).map(i => (100.0 + 3 * i, 50.0 + i, 1))).toDF("x1", "x2", "label")
      val out = new Smote(Seq("x1", "x2"), "label").transform(df).cache()
      try {
        val counts = out.groupBy("label").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        val balanced = counts(0) == nMaj.toLong && counts(1) == nMaj.toLong
        // synthetic minority points must lie inside the minority bounding box
        val minX1 = 100.0; val maxX1 = 100.0 + 3 * (nMin - 1)
        val minX2 = 50.0; val maxX2 = 50.0 + (nMin - 1)
        val outside = out.filter(col("label") === 1)
          .filter(col("x1") < minX1 || col("x1") > maxX1 ||
                  col("x2") < minX2 || col("x2") > maxX2).count()
        balanced && outside == 0
      } finally { out.unpersist(); () }
    }

  property("z-scale round-trips: x == mu + z * sigma") =
    Prop.forAll(Gen.listOfN(20, Gen.choose(-1e3, 1e3))) { xs =>
      (xs.distinct.size > 1) ==> {
        val df = xs.map(Tuple1(_)).toDF("x")
        val stats = df.agg(avg("x"), stddev_pop("x")).head()
        val (mu, sd) = (stats.getDouble(0), stats.getDouble(1))
        val back = df.withColumn("z", (col("x") - mu) / sd)
          .withColumn("x2", lit(mu) + col("z") * sd)
          .agg(max(abs(col("x2") - col("x")))).head().getDouble(0)
        back < 1e-6
      }
    }

  property("keyed upsert is idempotent under replay") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(8)))) { keys =>
      val store = new graft.streaming.ScoringStream.ResultStore(
        java.nio.file.Files.createTempDirectory("graft-prop").toString)
      val batch = keys.distinct.map(k => (k, Map("f0" -> 1.0)))
        .toDF("transaction_id", "features")
      val scoredB = graft.streaming.ScoringStream.scoreBatch(
        batch, Seq("f0"), Seq(1.0), Seq(0.0), 0.0)
      store.upsert(scoredB, 0L)
      store.upsert(scoredB, 0L)
      store.snapshot(spark).count() == keys.distinct.size.toLong
    }
}

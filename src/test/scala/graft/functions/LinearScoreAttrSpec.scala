package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the fused serving kernel ([[LinearScoreAttr]]) to the expression
  * forest it replaced in [[graft.streaming.ScoringStream.scoreBatch]]:
  * per-feature getItem alignment, zip_with/aggregate SHAP + margin, and
  * to_json — reproduced here verbatim as the oracle — must agree with
  * the kernel field-for-field on randomized inputs covering partial
  * maps, null values, foreign keys, empty and NULL maps.
  */
class LinearScoreAttrSpec extends SparkSpec {
  import spark.implicits._

  private val feats = Seq("f0", "f1", "f2", "f3")
  private val coefs = Seq(0.8, -1.7, 0.25, 3.0)
  private val mu = Seq(0.1, -0.2, 0.0, 1.5)
  private val intercept = 0.05

  /** The pre-kernel formulation, kept as the semantic oracle. */
  private def forestScore(batch: DataFrame): DataFrame = {
    val aligned = batch.select(col("*") +: feats.zipWithIndex.map {
      case (f, i) =>
        coalesce(col("features").getItem(f).cast("double"), lit(0.0)).as(s"__f$i")
    }: _*)
    val attributed = graft.xai.LinearShap.attribute(
      aligned, feats.indices.map(i => s"__f$i"), coefs, mu, intercept)
    val validity = feats.indices
      .map(i => when(col("features").getItem(feats(i)).isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    attributed
      .withColumn("n_present", validity)
      .select(
        col("transaction_id"),
        when(col("n_present") === 0, lit(null).cast("double"))
          .otherwise(round(col("score"), 6)).as("prediction_score"),
        when(col("n_present") === 0, lit(null).cast("string"))
          .otherwise(to_json(map_from_arrays(
            array(feats.map(lit): _*),
            transform(col("phi"), p => round(p, 6))))).as("shap_values"),
        when(col("n_present") === 0, lit("FAILED")).otherwise(lit("COMPLETED")).as("status"))
  }

  private def kernelScore(batch: DataFrame): DataFrame =
    graft.streaming.ScoringStream.scoreBatch(batch, feats, coefs, mu, intercept)
      .drop("updated_at")

  private val cases: Seq[(String, Map[String, Double])] = {
    val rnd = new scala.util.Random(7)
    val randomized = (0 until 200).map { i =>
      val present = feats.filter(_ => rnd.nextBoolean())
      (s"r$i", present.map(f => f -> (rnd.nextDouble() * 20 - 10)).toMap)
    }
    randomized ++ Seq(
      ("full", feats.zipWithIndex.map { case (f, i) => f -> (i + 0.5) }.toMap),
      ("empty", Map.empty[String, Double]),
      ("foreign", Map("not_a_feature" -> 9.9)),
      ("mixed", Map("f1" -> 2.5, "junk" -> 1.0)),
      ("extreme", Map("f3" -> 1e9)), // sigmoid saturates to 1.0
      ("negative_extreme", Map("f3" -> -1e9))) // saturates to 0.0
  }

  test("kernel output equals the expression-forest formulation on randomized inputs") {
    val batch = cases.toDF("transaction_id", "features")
    val got = kernelScore(batch).orderBy("transaction_id").collect()
    val want = forestScore(batch).orderBy("transaction_id").collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) === w.getString(0))
      assert(g.getString(3) === w.getString(3), s"status for ${g.getString(0)}")
      if (w.isNullAt(1)) assert(g.isNullAt(1), s"score null for ${g.getString(0)}")
      else assert(g.getDouble(1) === w.getDouble(1), s"score for ${g.getString(0)}")
      if (w.isNullAt(2)) assert(g.isNullAt(2))
      else assert(g.getString(2) === w.getString(2),
        s"shap json for ${g.getString(0)}: ${g.getString(2)} vs ${w.getString(2)}")
    }
  }

  test("null-valued map entries and NULL maps take the aligned-absent path") {
    // build rows whose map VALUES are null (Scala Map[String, Double]
    // cannot express them) and a NULL map row
    val batch = spark.sql(
      """SELECT * FROM VALUES
        |  ('nullval', map('f0', cast(null as double), 'f1', 2.0d)),
        |  ('allnull', map('f0', cast(null as double))),
        |  ('nullmap', cast(null as map<string,double>))
        |AS t(transaction_id, features)""".stripMargin)
    val got = kernelScore(batch).orderBy("transaction_id").collect()
    val byId = got.map(r => r.getString(0) -> r).toMap
    // all entries null -> FAILED, same as an empty map
    assert(byId("allnull").getString(3) === "FAILED" && byId("allnull").isNullAt(1))
    assert(byId("nullmap").getString(3) === "FAILED" && byId("nullmap").isNullAt(1))
    // one real entry among nulls -> COMPLETED, null entry aligned to 0.0
    val nv = byId("nullval")
    assert(nv.getString(3) === "COMPLETED")
    val wantMargin = intercept + coefs(1) * 2.0
    assert(math.abs(nv.getDouble(1) - 1.0 / (1.0 + math.exp(-wantMargin))) < 1e-6)
    // and the forest agrees on all three
    val want = forestScore(batch).orderBy("transaction_id").collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(3) === w.getString(3))
      if (w.isNullAt(2)) assert(g.isNullAt(2)) else assert(g.getString(2) === w.getString(2))
    }
  }

  test("the kernel stays inside whole-stage codegen (no CodegenFallback in the serving plan)") {
    // a range-backed batch: LocalTableScan plans skip codegen entirely,
    // which would vacuously pass/fail this pin
    val batch = spark.range(100).select(
      concat(lit("t"), col("id")).as("transaction_id"),
      map(lit("f0"), col("id").cast("double"), lit("f1"), lit(1.0)).as("features"))
    val exec = kernelScore(batch).queryExecution.executedPlan
    val codegenSpans = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty, s"no WholeStageCodegen span in:\n$exec")
    // the HOF forest this kernel replaced planned zip_with/aggregate,
    // which are CodegenFallback; the fused plan must carry neither
    val s = exec.toString
    assert(!s.contains("zip_with") && !s.contains("aggregate("))
  }
}

package graft.functions

import java.text.Normalizer

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q128 oracle runs over (mostly ASCII) driver testdata, where NFC
  * is the identity — this spec pins the cases that matter: combining
  * marks, Hangul jamo, compatibility-untouched forms, null/empty, and
  * the already-normalized fast path.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(s: String): String =
    spark.sql(s"SELECT nfc_normalize('$s')").head().getString(0)

  test("decomposed combining marks compose to the precomposed form") {
    val decomposed = "éclair vs ë" // e+acute, e+diaeresis
    val got = Seq(decomposed).toDF("t")
      .select(call_function("nfc_normalize", col("t"))).head().getString(0)
    assert(got === "éclair vs ë")
    assert(got === Normalizer.normalize(decomposed, Normalizer.Form.NFC))
  }

  test("Hangul jamo sequences compose to syllable blocks") {
    val jamo = "한" // HAN in decomposed jamo
    assert(nfc(jamo) === "한")
  }

  test("already-NFC text passes through unchanged (incl. compatibility chars NFC must NOT fold)") {
    // NFC preserves compatibility characters (only NFKC folds them)
    for (s <- Seq("plain ascii", "é café", "ﬁsh ligature", "① circled one")) {
      assert(nfc(s) === s)
    }
  }

  test("null in, null out; empty in, empty out") {
    val rows = spark.sql(
      "SELECT nfc_normalize(CAST(NULL AS STRING)), nfc_normalize('')").head()
    assert(rows.isNullAt(0))
    assert(rows.getString(1) === "")
  }

  test("agrees with the JDK Normalizer on a randomized mix of scripts and marks") {
    val rnd = new scala.util.Random(11)
    val pieces = Array("é", "é", "à", "하", "z",
      "Å", "Å", " ", "ά")
    val samples = (0 until 50).map(_ =>
      (0 until 12).map(_ => pieces(rnd.nextInt(pieces.length))).mkString)
    val got = samples.toDF("t")
      .select(call_function("nfc_normalize", col("t")).as("n"))
      .as[String].collect()
    samples.zip(got).foreach { case (in, out) =>
      assert(out === Normalizer.normalize(in, Normalizer.Form.NFC))
    }
  }
}

package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q196 composition contract: every stage boundary equals the
  * standalone query's own keep-set, and the dedup/decontaminate/pack
  * tail is recomputed driver-side from those sets — so a stage
  * reordered, a fit narrowed to survivors, or a changed pack ordering
  * fails HERE even if both engines drift together (the hazard the
  * hash-only oracle cannot see). */
class CurationCanonSpec extends SparkSpec {

  private val PackWindow = 256L // q77's window (private in LlmQueries)

  /** The driver-side fold both canon tests share: intersect the
    * standalone keep-sets → dedup first-doc_id-wins per content hash →
    * drop eval docs and quarantined train docs → pack per source. */
  private def foldAndCompare(queryName: String, extraGates: Seq[Set[Long]]): Unit = {
    val q = LlmQueries.queries
    // standalone keep-sets (the same criteria the canon composes)
    val gopher = q("q127_gopher_rules")(spark, sfDir)
      .filter(col("r_words") * col("r_mean_len") * col("r_symbol") *
        col("r_alpha") * col("r_bullet") * col("r_ellipsis") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rep = q("q131_repetition_rules")(spark, sfDir)
      .filter(col("rep_pass") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ppl = q("q133_ngram_lm_ppl")(spark, sfDir)
      .filter(col("ppl_bucket") =!= "tail")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dsir = q("q132_dsir_select")(spark, sfDir)
      .filter(col("selected") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val flagged = q("q75_contamination")(spark, sfDir)
      .select("train_id").collect().map(_.getLong(0)).toSet
    // every stage must actually discriminate on this corpus (a stage
    // that keeps all or none would make the composition test vacuous)
    val n = Tables.documents(spark, sfDir).count()
    for ((s, nm) <- Seq((gopher, "gopher"), (rep, "rep"), (ppl, "ppl"), (dsir, "dsir")))
      assert(s.nonEmpty && s.size < n, s"$nm stage keeps ${s.size} of $n — vacuous")

    // doc facts for the driver-side fold
    val facts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        TextOps.rollingHash(col("text")).as("h"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

    val gatedIds = extraGates
      .foldLeft(gopher & rep & ppl & dsir)(_ & _).toSeq.sorted
    val firstPerHash = gatedIds.groupBy(id => facts(id)._2)
      .map { case (_, ids) => ids.min }.toSet
    val cleanIds = gatedIds.filter(id =>
      firstPerHash(id) && id % 10 != 0 && !flagged(id))
    val expected = cleanIds.groupBy(id => facts(id)._1).toSeq.flatMap {
      case (src, ids) =>
        var cum = 0L
        ids.sorted.map { id =>
          val row = (id, src, facts(id)._3, cum / PackWindow)
          cum += facts(id)._3
          row
        }
    }.sortBy(_._1)

    val got = q(queryName)(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected,
      s"$queryName composition drifted: got ${got.size} rows, expected ${expected.size}")
    assert(got.nonEmpty, s"$queryName must keep a non-trivial survivor set")
    spark.sharedState.cacheManager.clearCache() // stage caches (runner contract)
  }

  test("q196 equals the standalone keep-sets folded through dedup/decon/pack") {
    foldAndCompare("q196_curation_canon", Seq.empty)
  }

  test("q261 equals the same fold with q258's KN keep-set as one more gate " +
      "(the r14 composition point, wired)") {
    val kn = LlmQueries.queries("q258_kn_ppl_gate")(spark, sfDir)
      .filter(col("keep") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val n = Tables.documents(spark, sfDir).count()
    // the KN gate must discriminate or composing it proves nothing
    assert(kn.nonEmpty && kn.size < n, s"kn stage keeps ${kn.size} of $n — vacuous")
    spark.sharedState.cacheManager.clearCache() // q258's scored cache
    foldAndCompare("q261_curation_kn", Seq(kn))
  }
}

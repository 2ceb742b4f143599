package graft.llm

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

class LlmQueriesSpec extends SparkSpec {

  test("every LLM query runs and is non-degenerate at sf0.001") {
    for ((name, q) <- LlmQueries.queries) {
      val df = q(spark, sfDir)
      val n = df.count()
      // pair-producing queries may legitimately be small; per-doc ones must
      // cover every document
      if (Set("q37_neardup_minhash", "q57_embed_neardup", "q71_dedup_components")(name)) assert(n >= 0)
      else assert(n > 0, s"$name returned no rows")
    }
  }

  test("near-dup pairs have estimated jaccard close to exact (MinHash accuracy)") {
    val pairs = LlmQueries.queries("q37_neardup_minhash")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(pairs.nonEmpty, "expected planted near-dups at sf0.01")
    pairs.foreach { r =>
      val est = r.getDouble(r.fieldIndex("est_jaccard"))
      val exact = r.getDouble(r.fieldIndex("jaccard"))
      assert(math.abs(est - exact) < 0.45,
        s"minhash estimate $est too far from exact $exact")
    }
    val meanErr = pairs.map(r =>
      math.abs(r.getDouble(2) - r.getDouble(3))).sum / pairs.length
    assert(meanErr < 0.15, s"mean |est-exact| = $meanErr")
  }

  test("exact dedup keeps one representative per distinct text") {
    val out = LlmQueries.queries("q30_dedup_exact")(spark, sfDir)
    val docs = graft.Tables.documents(spark, sfDir)
    assert(out.count() === docs.select("text").distinct().count())
    assert(out.agg(sum("n_copies")).head().getLong(0) === docs.count())
  }

  test("ANN results are a subset of brute-force scores (same cosine values)") {
    val brute = LlmQueries.queries("q38_cosine_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ann = LlmQueries.queries("q39_ann_lsh")(spark, sfDir).collect()
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      val cos = r.getDouble(3)
      // if the pair also appears in brute-force top-k, the cosine agrees
      brute.get(key).foreach(b => assert(math.abs(b - cos) < 1e-9))
      assert(cos >= -1.0001 && cos <= 1.0001)
    }
  }

  test("simhash of near-identical docs differs in few bits") {
    val sims = LlmQueries.queries("q36_simhash")(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = LlmQueries.queries("q37_neardup_minhash")(spark, "/root/testdata/sf0.01")
      .filter(col("jaccard") >= 0.8).collect()
    assert(pairs.nonEmpty)
    val dists = pairs.map { r =>
      java.lang.Long.bitCount(sims(r.getLong(0)) ^ sims(r.getLong(1)))
    }
    // 16-bit simhash: strong near-dups should average well under half the bits
    assert(dists.sum.toDouble / dists.length < 5.0,
      s"mean hamming ${dists.sum.toDouble / dists.length} too high for jaccard>=0.8 pairs")
  }

  test("multimodal stub decodes deterministic features from the binary payload") {
    val out = LlmQueries.queries("q40_multimodal_stub")(spark, sfDir)
    val joined = out.join(graft.Tables.documents(spark, sfDir), "doc_id")
    assert(joined.filter(col("n_bytes") =!= col("n_chars")).count() === 0)
    assert(joined.filter(col("mean_byte") < 32 || col("mean_byte") > 127).count() === 0)
  }
}

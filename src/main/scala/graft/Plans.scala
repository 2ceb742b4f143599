package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for the headline queries to PLANS.md —
  * the plan-shape record backing the PlanAuditSpec assertions (pushed
  * filters, broadcast placement, single-shuffle aggregates, no all-pairs
  * fallbacks). Run: `sbt "runMain graft.Plans [sfDir]"`.
  */
object Plans {
  private val headline = Seq(
    "q01_pruned_scan", "q03_join_bcast", "q04_join_factfact", "q07_outer_join",
    "q13_setops", "q37_neardup_minhash", "q38_cosine_topk", "q39_ann_lsh",
    "q42_strat_split", "q46_roc_auc", "q52_asof_join", "q57_embed_neardup",
    "q61_auc_sketch", "q75_contamination", "q77_pack_sequences",
    "q95_quantize_embeddings", "q96_bm25", "q97_pii_redact",
    "q101_url_canonical", "q103_bloom_prune", "q115_window_decontam",
    "q118_simjoin_exact", "q127_gopher_rules", "q128_nfc_normalize",
    "q129_substring_dup", "q130_token_budget", "q131_repetition_rules",
    "q132_dsir_select", "q133_ngram_lm_ppl", "q134_pii_scrub",
    // q141 is omitted: its formatted plan is the q37 chain replicated
    // once per CC propagation round (~12k lines of noise); q37's entry
    // and the q141 PlanAuditSpec-adjacent spec pin its shape instead
    "q138_pagerank", "q139_shard_assign", "q140_psi_drift",
    "q142_robust_stats", "q143_window_ranks",
    // q148 is omitted for the same reason as q141 (the q37 chain + CC
    // rounds dominate its formatted plan); its rollup shape is pinned
    // in LlmQueriesSpec instead
    "q146_mergeable_profile", "q147_vocab_coverage",
    "q149_gate_funnel", "q150_embed_prune",
    "q158_markov_transitions", "q159_scd2", "q160_dq_suite",
    "q161_triangles", "q162_mutual_info", "q163_pmi_collocations",
    "q164_seasonality", "q165_ab_test", "q166_ewma", "q167_trend_fit",
    // q169 is omitted: its executed shape is layer-wise (InMemoryTableScan
    // per materialized round) and the final plan alone under-describes it;
    // the PlanAuditSpec pin + RelationalQueriesSpec reference search cover it
    "q168_correlated_subq", "q170_assoc_rules", "q171_benford",
    "q172_exists_subq", "q173_cusum", "q174_inverted_index",
    "q175_woe_iv", "q176_skyline", "q177_peak_concurrency",
    "q178_share_of_parent", "q179_gini_lorenz", "q180_assortativity",
    "q181_readability", "q182_equidepth_hist", "q183_heavy_hitters",
    "q184_peer_anomaly", "q185_autocorrelation", "q186_apportionment",
    "q188_pps_sample", "q189_cross_correlation", "q190_seasonal_decompose",
    "q193_timeseries_profile", "q195_lateral",
    // round 10: curation canon composition, exact two-phase twins, the
    // bucketed co-located join, and the two-phase PPS sampler. q196's
    // formatted plan is the full five-stage cascade (long but the point);
    // q197 is omitted (recall-gate plan is a bounded literal frame over
    // memoized artifacts — its guarantees are the oracle-pinned gate
    // vector, not a plan shape)
    "q196_curation_canon", "q198_robust_twophase", "q199_rfm_twophase",
    "q200_gini_twophase", "q201_bucketed_join", "q202_weighted_sample",
    "q203_temp_mixture", "q204_promql_eval", "q205_equidepth_twophase",
    // q207's plan is the scale claim: the ingest reads the persisted
    // index parquet (band table + semi-join-pruned doc store), never a
    // second corpus scan. q208 is omitted (its returned frame is a scan
    // of the durable decisions parquet; the iterative MIS shape is
    // pinned by its oracle + IncrementalDedupSpec instead)
    "q206_trace_breakdown", "q207_incremental_dedup", "q209_kde_amount",
    // round 12: span-grain dedup (the min-doc aggregate + interval-union
    // window shape), two-phase skyline, the prefix-sum-ranked stats
    // canons, and the new graph family members. q235/q239/q244/q245 are
    // omitted: q235's plan is q196's cascade plus the q234 shape (both
    // already here), and the iterative graph queries' final plans
    // under-describe their rounds (the q169 argument) — LinkGraphPlanSpec
    // and their unrolled-CTE oracles pin those.
    "q234_span_removal", "q237_weighted_sample", "q238_entropy_rate",
    "q241_mann_kendall", "q242_kruskal_wallis", "q243_spearman",
    "q246_cohen_kappa",
    // round 13: within-doc span self-dedup (the doc_id-keyed aggregate —
    // NO cross-document shuffle, the contrast to q234's corpus-wide min)
    // and the frozen-baseline CUSUM monitor (two running windows over
    // the calendar-bounded daily grid)
    "q248_span_self_dedup", "q249_cusum_monitor",
    // round 13 (cont.): the dense-grid dominance Kendall tau (two
    // grid-partitioned prefix windows, no pair join), the Kneser-Ney
    // bigram LM (type-table derivations + TakeOrdered head), the KS
    // drift lattice (three grid-partitioned windows over value x
    // calendar), the pivoted written-order Ljung-Box, and the exact-grid
    // EB shrinkage. q252 harmonic is omitted (iterative; the q169
    // argument — LinkGraphPlanSpec + recursive-CTE oracle pin it)
    "q250_kendall_tau", "q251_kneser_ney", "q253_ks_drift",
    "q254_ljung_box", "q255_eb_shrinkage",
    // round 14: the KN perplexity gate (shared-model scoring join +
    // the two-phase threshold — the selection itself is driver-bounded
    // aggregates, so the plan shows the scoring shape) and the PACF
    // closed-form chain over the q254 base/left-join row set. q260
    // betweenness is omitted (iterative, the q169/q252 argument — its
    // walk-count oracle + explicit-enumeration spec pin it)
    "q258_kn_ppl_gate", "q259_pacf",
    // round 15: the diagonal-Fréchet slice distance (posexplode →
    // map-side-combined labels×dims moments → broadcast pair join) and
    // the dyadic RBO (bounded depth-grid × legs join, pure integer
    // terms). q261 is omitted (its plan is q196's cascade plus q258's
    // scoring join, both already here — the CurationCanonSpec fold pins
    // the composition)
    "q262_frechet_slices", "q263_rbo_legs",
    // round 15 (cont.): the pairwise-JSD union lattice (token-keyed
    // full-outer join + schema-bounded broadcast pair frame), the BH
    // battery (grid lattice + m×m rank join, everything after the
    // per-type max on taxonomy-row frames), the PH/ADWIN calendar
    // detectors, the type-partitioned burstiness lead, the MRL panel
    // slice, and the label-noise bucket-keyed shuffle join. q267 is
    // omitted (iterative LPA, the q169/q252 argument — its shared-CTE
    // oracle + planted-fixture spec pin it)
    "q264_js_divergence", "q265_bh_fdr", "q266_page_hinkley",
    "q268_burstiness", "q269_adwin_cut", "q270_mrl_recall",
    "q271_knn_label_noise")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    sb.append("# Physical plans (generated by `graft.Plans`)\n\n")
    sb.append(s"Scale dir: `$sfDir`. These are the plan shapes the PlanAuditSpec " +
      "assertions pin; regenerate after changing any headline query.\n")
    headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n```\n$formatted```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"[plans] wrote PLANS.md (${headline.size} queries)")
    spark.stop()
  }
}

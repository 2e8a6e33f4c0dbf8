"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` / ``oracle_sql()`` — the declared-operator registry from
``simple_stream_processor_spark.queries`` (SURVEY.md §2 coverage).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: scan events → filter →
    tumbling 1-hour event-time window → aggregate → deterministic order.
    Exercises the full lifecycle: pushdown-eligible filter, epoch-aligned
    window bucketing, partial+final agg, top-level sort."""
    from simple_stream_processor_spark.tables import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    return (
        ev.where(F.col("event_type").isin("purchase", "checkout", "view", "click"))
        .groupBy(F.window(F.col("ts"), "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.unix_timestamp(F.col("w.start")).alias("window_start_s"), "event_type", "n", "sum_value")
        .orderBy("window_start_s", "event_type")
    )


# The driver's correctness harness walks the dict in insertion order under a
# 50-entry budget.  Rounds 1-10 verified 426 distinct queries green (the
# round-10 window q_session_stats … q_streaming_friedman came back 50/50 in
# CORRECTNESS_r10.json).  ROUND-11 window, continuing the rotation
# discipline (r10 judge task #8): the FINAL 50 never-driver-verified
# queries — the 4 newest round-8 additions, the 25 round-9 additions and
# the 21 round-10 additions, staged order kept — retiring the
# never-driver-verified debt to zero (4 + 25 + 21 = 50 exactly).  All
# previously driver-verified queries follow, in their established
# relative order.  _PRIORITY covers the full registry (asserted by
# test_priority_names_all_resolve_and_readme_count_matches).
_PRIORITY = [
    # --- round-11 window (50): the last never-driver-verified queries —
    #     4 r8 + 25 r9 + 21 r10 additions (local-oracle-green at 3 SFs
    #     in their build rounds; staged order kept) ---
    "q_streaming_keyword_trend",
    "q_bm25_k1_sweep", "q_streaming_textrank", "q_streaming_burrows",
    # (r9 additions, staged order kept)
    "q_multimodal_bmp",
    "q_jarque_bera",
    "q_cox_stuart",
    "q_bollinger_bands",
    "q_durbin_watson",
    "q_rsi_cutler",
    "q_jonckheere",
    "q_vwap",
    "q_newsvendor",
    "q_promo_uplift",
    "q_flesch_reading",
    "q_oov_rate",
    "q_matryoshka",
    "q_streaming_jarque_bera",
    "q_streaming_cox_stuart",
    "q_streaming_bollinger",
    "q_streaming_durbin_watson",
    "q_streaming_rsi",
    "q_streaming_jonckheere",
    "q_streaming_flesch",
    "q_streaming_oov",
    "q_multimodal_png",
    "q_rrf_fusion",
    "q_streaming_zipf",
    "q_streaming_rrf",
    # (r10 additions, staged order kept)
    "q_multimodal_gif",
    "q_macd",
    "q_streaming_macd",
    "q_anderson_darling",
    "q_streaming_anderson",
    "q_cvm_drift",
    "q_streaming_cvm",
    "q_blocklist_scrub",
    "q_streaming_blocklist",
    "q_mmr_rerank",
    "q_theta_forecast",
    "q_streaming_theta",
    "q_adamic_adar",
    "q_mrr_eval",
    "q_streaming_mmr",
    "q_grubbs_test",
    "q_streaming_grubbs",
    "q_pacf",
    "q_streaming_pacf",
    "q_chow_test",
    "q_streaming_chow",
    # ---------- window boundary (50 inside the list above) ----------
    # --- driver-verified r10 (the round-10 window, relative order kept) ---
    "q_session_stats",
    "q_dtw_distance", "q_isotonic_calibration", "q_logrank_test",
    "q_psi_drift", "q_cohens_kappa", "q_gopher_rules", "q_mojibake_audit",
    "q_textrank_keywords", "q_embedding_discrimination", "q_ivf_nprobe_curve",
    "q_streaming_psi", "q_streaming_gopher", "q_streaming_mojibake",
    "q_streaming_kappa", "q_streaming_hhi", "q_streaming_theil",
    "q_streaming_mcnemar", "q_streaming_brown_forsythe", "q_streaming_ohlc",
    "q_streaming_page_hinkley", "q_streaming_dtw",
    "q_cochran_q", "q_fleiss_kappa", "q_price_index", "q_ndcg_eval",
    "q_rbo_rankings", "q_burrows_delta", "q_hurst_exponent",
    "q_weibull_fit", "q_croston",
    "q_streaming_cochran", "q_streaming_fleiss", "q_streaming_hurst",
    "q_streaming_croston", "q_streaming_logrank", "q_streaming_weibull",
    "q_abc_xyz_matrix", "q_seasonal_mann_kendall", "q_code_switch_audit",
    "q_token_budget_fill",
    "q_streaming_seasonal_mk", "q_streaming_code_switch",
    "q_streaming_price_index",
    "q_poisson_rate_test", "q_streaming_abc_xyz", "q_streaming_poisson_rate",
    "q_friedman_test", "q_keyword_trend",
    "q_streaming_friedman",
    # --- driver-verified r9 (the round-9 window, relative order kept) ---
    "q_classifier_report", "q_kmv_intersection",
    "q_bootstrap_ci", "q_shapley_attribution",
    "q_streaming_nelson_aalen", "q_streaming_qini", "q_streaming_shapley",
    "q_streaming_bootstrap",
    "q_mann_whitney", "q_markov_entropy_rate",
    "q_streaming_mann_whitney", "q_block_maxima",
    "q_overdispersion", "q_spearman",
    "q_kendall_tau", "q_pettitt_changepoint", "q_kruskal_wallis",
    "q_anova", "q_cramers_v", "q_tukey_fences",
    "q_streaming_kendall", "q_streaming_pettitt", "q_streaming_kruskal",
    "q_streaming_anova", "q_streaming_tukey", "q_streaming_cramers",
    "q_rake_keyphrases", "q_winnowing_fingerprint", "q_image_dhash_dedup",
    "q_audio_loudness", "q_xyz_classification", "q_encoding_advisor",
    "q_price_elasticity", "q_kneser_ney_surprisal",
    "q_k_core", "q_holt_winters", "q_streaming_holt_winters",
    "q_streaming_loudness", "q_sax_words", "q_streaming_sax",
    "q_srp_simhash",
    "q_hhi_concentration", "q_theil_index", "q_mcnemar", "q_brown_forsythe",
    "q_ohlc_bars", "q_page_hinkley", "q_bot_detection",
    "q_time_decay_attribution", "q_pit_join",
    # --- driver-verified r8 (the round-8 window, relative order kept) ---
    "q_streaming_audience",
    "q_kmv_sketch", "q_srm_check", "q_seasonal_decompose",
    "q_set_similarity_join", "q_good_turing",
    "q_holt_linear", "q_cuped", "q_label_propagation",
    "q_streaming_srm", "q_streaming_kmv",
    "q_theil_sen", "q_sort_key_advisor", "q_span_corruption",
    "q_streaming_holt", "q_streaming_seasonal",
    "q_mann_kendall", "q_runs_test", "q_ccf_leadlag", "q_xmr_control",
    "q_link_prediction", "q_degree_assortativity",
    "q_growth_accounting", "q_stratified_ate",
    "q_nearest_centroid", "q_silhouette", "q_char_bigram_entropy",
    "q_streaming_ccf", "q_streaming_growth", "q_streaming_xmr",
    "q_mix_shift", "q_nelson_aalen", "q_welch_ttest",
    "q_new_returning_revenue",
    "q_max_drawdown", "q_seasonality_strength", "q_bucketed_join",
    "q_streaming_mann_kendall", "q_streaming_runs", "q_streaming_welch",
    "q_seasonal_anomaly", "q_hill_tail_index",
    "q_partition_pruned_scan", "q_csv_source", "q_lorenz_curve",
    "q_interarrival_stats",
    "q_streaming_drawdown", "q_streaming_strength",
    "q_streaming_seasonal_anomaly",
    "q_qini_curve",
    # --- driver-verified r7 (the round-7 window, relative order kept) ---
    "q_zonemap_prune", "q_zorder_layout", "q_incremental_agg",
    "q_ewma_smooth", "q_streaming_ewma", "q_graph_bfs",
    "q_pmi_collocations", "q_ngram_novelty", "q_bpe_fertility",
    "q_bisect_median", "q_weighted_median", "q_heaps_fit",
    "q_streaming_zonemap",
    "q_equidepth_hist", "q_burst_detection", "q_abc_classification",
    "q_compaction_plan", "q_date_spine", "q_embedding_norm_audit",
    "q_js_divergence",
    "q_minhash_precision", "q_audience_overlap", "q_asof_tolerance",
    "q_mutual_information", "q_streaming_novelty", "q_streaming_heaps",
    "q_topk_with_other", "q_period_over_period", "q_user_saturation",
    "q_whatif_grid", "q_cluster_size_dist",
    "q_lift_table", "q_join_advisor", "q_bpe_generalization",
    "q_streaming_saturation",
    "q_debounce", "q_tiered_billing", "q_word_burstiness",
    "q_hashed_features", "q_template_detect",
    "q_lateness_audit", "q_salt_advisor", "q_dedup_threshold_curve",
    "q_dedup_savings", "q_quality_trend",
    "q_ship_lag", "q_cohort_ltv", "q_nearest_event_join",
    "q_streaming_mi", "q_streaming_jsd",
    # --- driver-verified r6 (the round-6 window, relative order kept) ---
    "q_random_projection", "q_bm25_search", "q_bigram_surprisal",
    "q_hll_portable", "q_streaming_hll", "q_conformal_threshold",
    "q_jl_recall", "q_wasserstein_drift", "q_benford_audit",
    "q_streaming_wasserstein", "q_gini_concentration", "q_time_weighted_avg",
    "q_skyline",
    "q_skew_report",
    "q_approx_distinct", "q_approx_quantiles", "q_hll_mergeable",
    "q_bpe_merges", "q_bpe_encode",
    "q_source_scan", "q_sink_fold_sum", "q_map_project", "q_filter_predicate",
    "q_flatmap_explode", "q_union_append", "q_take_limit", "q_parmap_ordered",
    "q_async_boundary", "q_recover_value", "q_recover_with_stream",
    "q_count_window", "q_tumbling_window", "q_sliding_window",
    "q_session_window", "q_watermark_cadence",
    "q_group_agg", "q_join_orders_customer", "q_join_multiway", "q_semi_anti",
    "q_topk", "q_distinct", "q_set_ops", "q_rank_window", "q_scalar_funcs",
    "q_dedup", "q_exact_percentile", "q_histogram",
    "q_asof_join", "q_range_join", "q_rollup",
    # --- driver-verified in r5 (keep their relative order) ---
    "q_inverted_index", "q_cms_heavy_hitters", "q_unigram_surprisal",
    "q_ann_recall", "q_mixture_resample", "q_auc_eval", "q_calibration",
    "q_zipf_fit", "q_bloom_index", "q_training_order", "q_corpus_entropy",
    "q_weighted_sample", "q_ann_pq", "q_cross_source_overlap", "q_ks_drift",
    "q_label_noise", "q_minhash_recall", "q_decision_stump",
    "q_dup_span_coverage", "q_group_split", "q_quantile_normalize",
    "q_interval_concurrency", "q_rolling_zscore",
    "q_entity_match", "q_merge_upsert", "q_top_paths", "q_market_basket",
    "q_expectations", "q_forecast_eval", "q_rfm_segmentation",
    "q_changepoint_cusum", "q_survival_curve", "q_k_anonymity",
    "q_interval_join", "q_acf_daily", "q_table_profile", "q_ab_test",
    "q_lag_features", "q_target_encoding", "q_time_to_convert",
    "q_power_analysis", "q_retention_curve", "q_data_freshness",
    "q_active_users", "q_dim_coverage", "q_weekday_profile",
    "q_semantic_dedup", "q_dsir_select", "q_streaming_dsir",
    # --- driver-verified in r4 (keep their relative order) ---
    "q_robust_stats_mad", "q_winsorize", "q_integrity_audit",
    "q_timeseries_similarity", "q_string_agg", "q_absence_pattern",
    "q_transition_matrix", "q_embedding_quantize", "q_ngram_heavy_hitters",
    "q_batch_ann",
    "q_streaming_watermark_cadence", "q_streaming_multimodal_decode",
    "q_streaming_zscore", "q_streaming_cms", "q_streaming_merge_upsert",
    "q_streaming_expectations", "q_streaming_bloom", "q_streaming_entropy",
    "q_streaming_ks", "q_streaming_pca", "q_streaming_stump",
    "q_streaming_survival", "q_streaming_acf", "q_streaming_lag_features",
    "q_streaming_ab", "q_streaming_time_to_convert", "q_streaming_retention",
    "q_streaming_active_users", "q_streaming_weekday_profile",
    "q_multimodal_resize", "q_multimodal_audio", "q_image_phash_dedup",
    "q_kmeans", "q_pagerank",
    "q_pca_top_component", "q_densest_subgraph", "q_triangle_count",
    "q_bm25_topterms", "q_hard_negatives", "q_source_cap",
    "q_ngram_containment", "q_pq_codes", "q_lang_confusion",
    "q_dedup_rate_report", "q_embedding_drift",
    # --- driver-verified in r1-r3 (keep their relative order) ---
    "q_tpch_q4", "q_tpch_q7", "q_tpch_q8", "q_tpch_q10", "q_tpch_q13",
    "q_tpch_q14", "q_tpch_q15", "q_tpch_q17", "q_tpch_q19", "q_tpch_q21",
    "q_tpch_q22",
    "q_text_normalize", "q_quality_prune", "q_dedup_keep_rule",
    "q_corpus_delta", "q_sequence_pack", "q_mixture_weights", "q_pii_redact",
    "q_recursive_cte", "q_multimodal_decode",
    "q_stream_read", "q_streaming_count_window", "q_managed_source",
    "q_managed_sink", "q_stream_stream_join", "q_streaming_tumbling",
    "q_streaming_dedup", "q_streaming_session", "q_streaming_sliding",
    "q_streaming_enrich", "q_streaming_funnel", "q_streaming_topk",
    "q_streaming_quality_gate",
    "q_cube", "q_grouped_udaf", "q_hash_sample", "q_full_outer_reconcile",
    "q_gap_fill", "q_stratified_sample", "q_scd2_intervals",
    "q_latest_snapshot", "q_rolling_time_window", "q_schema_evolution_union",
    "q_dynamic_session_window", "q_linear_attribution", "q_topk_per_group",
    "q_funnel_by_segment", "q_analytic_distribution", "q_stats_agg",
    "q_chi_square",
    "q_pivot", "q_window_frames",
    "q_salted_join", "q_grouping_sets", "q_funnel", "q_cohort_retention",
    "q_tpch_q1", "q_tpch_q3", "q_tpch_q6", "q_tpch_q5", "q_tpch_q18",
    "q_sql_surface",
    "q_dedup_text_exact", "q_minhash_dedup", "q_simhash_dedup",
    "q_embedding_dedup", "q_cosine_topk", "q_ann_ivf", "q_lang_id",
    "q_quality_score", "q_token_stats", "q_tfidf_topterms",
    "q_training_pipeline", "q_dedup_clusters", "q_text_tokens",
    "q_decontaminate", "q_repetition_filter",
    # --- r1/r2-green queries restored to rotation (r6 judge task #6) ---
    "q_doc_fingerprint", "q_ngram_jaccard", "q_ann_bucketed",
    "q_multimodal_meta", "q_udtf_chunks",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import simple_stream_processor_spark.queries  # noqa: F401  (registers core)
    import simple_stream_processor_spark.queries_llmdata  # noqa: F401  (registers LLM-data)
    import simple_stream_processor_spark.queries_relational_ext  # noqa: F401  (registers asof/range/rollup/cube/pivot)
    import simple_stream_processor_spark.queries_tpch  # noqa: F401  (registers TPC-H shapes + SQL surface)
    import simple_stream_processor_spark.queries_streaming  # noqa: F401  (registers streaming/lifecycle)
    from simple_stream_processor_spark.registry import QUERIES

    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    queries()  # ensure all query modules are registered
    from simple_stream_processor_spark.registry import ORACLES

    return dict(ORACLES)

"""Driver-verdict ledger, used only to ORDER query emission.

The round driver evaluates ``queries()`` in dict-iteration order and
stops when its time budget runs out (round 1: verdicts for exactly the
first 50 of 135 registered queries — see ``CORRECTNESS_r01.json``).
To get hard-signal coverage for the whole inventory, ``registry``
emits queries in this priority order:

1. ``PRIORITY_RECHECK`` — previously judged WRONG, now fixed; a fresh
   verdict is the proof of the fix.
2. never-judged queries (registration order preserved);
3. judged rows-only queries (their verdict can't improve — ``no_oracle``
   is by design);
4. ``GREEN`` — queries with a green hash verdict in a previous round
   (re-judging them adds no information; regressions are guarded by the
   local pytest replica of the same comparison).

Update per round: fold the new ``CORRECTNESS_r{N}.json`` greens into
``GREEN`` and clear/re-seed ``PRIORITY_RECHECK``.
"""

from __future__ import annotations

# Round 1 (CORRECTNESS_r01.json): hash_match == true.
_GREEN_R1: frozenset[str] = frozenset(
    {
        "agg_pivot",
        "sample_deterministic",
        "sample_stratified",
        "subquery_correlated",
        "join_skew_salted",
        "agg_basic",
        "agg_distinct",
        "agg_stats",
        "agg_rollup",
        "agg_cube",
        "agg_grouping_sets",
        "agg_collect",
        "agg_percentile",
        "agg_stats_native",
        "agg_boolean_bitwise",
        "agg_histogram_bucket",
        "unpivot_melt",
        "agg_filter_clause",
        "table_fingerprint",
        "agg_winsorize_clamp",
        "agg_mode_deterministic",
        "join_inner_broadcast",
        "join_left_outer",
        "join_right_outer",
        "join_full_outer",
        "join_semi",
        "join_anti",
        "join_theta_range",
        "join_cross",
        "join_asof",
        "join_null_safe_key",
        "q1_pricing_summary",
        "project_compute",
        "filter_predicates",
        "scalar_string_funcs",
        "scalar_datetime_funcs",
        "scalar_math_funcs",
        "conditional_funcs",
        "filter_null_safe_eq",
        "sql_group_by_all_topk",
        "sql_lateral_view",
        "date_spine_fill",
        "scalar_string_funcs_extra",
        "sql_table_valued_functions",
        "array_funcs",
        "explode_wordcount",
        "json_funcs",
    }
)

# Round 2 (CORRECTNESS_r02.json): hash_match == true.
_GREEN_R2: frozenset[str] = frozenset(
    {
        "agg_approx_error_bounds",
        "agg_grouping_id_rollup",
        "agg_hll_union_error_bound",
        "agg_listagg_ordered",
        "array_zip_reverse",
        "data_quality_null_profile",
        "distinct_dropdup",
        "dropdup_keep_first",
        "events_funnel_analysis",
        "events_ohlc_resample",
        "events_retention_cohorts",
        "explode_outer_null_preserving",
        "intersect_except",
        "intersect_except_all",
        "join_bucketed_colocated",
        "join_interval_overlap",
        "layout_shard_export",
        "map_explode_entries",
        "map_transform_funcs",
        "not_in_null_semantics",
        "orderby_limit_topk",
        "orderby_nulls_first",
        "q10_returned_items",
        "q11_important_stock",
        "q13_customer_distribution",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q16_supplier_cnt",
        "q17_small_quantity",
        "q18_large_volume_customer",
        "q19_disjunctive_filter",
        "q20_excess_promo_suppliers",
        "q22_sales_opportunity",
        "q2_min_cost_supplier",
        "q3_shipping_priority",
        "q4_order_priority",
        "q5_local_supplier_volume",
        "q6_forecast_revenue",
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_profit",
        "sql_recursive_cte",
        "union_all_counts",
        "union_distinct",
        "window_ignore_nulls_ffill",
        "window_session_dynamic_gap",
    }
)

# Rounds 3+4 (CORRECTNESS_r03.json / CORRECTNESS_r04.json — identical key
# sets): hash_match == true.
_GREEN_R4: frozenset[str] = frozenset(
    {
        "cluster_kmeans_embeddings",
        "contamination_ngram_overlap",
        "corpus_source_cap",
        "dataset_snapshot_diff",
        "dedup_connected_components",
        "dedup_exact",
        "dedup_incremental_against_index",
        "dedup_keep_best",
        "dedup_minhash_lsh",
        "dedup_minhash_pairs",
        "dedup_ngram_jaccard",
        "dedup_pipeline_end_to_end",
        "dedup_simhash",
        "dedup_substring_windows",
        "events_user_rate_zscore",
        "join_asof_tolerance",
        "layout_zorder_cluster",
        "multimodal_audio_features",
        "multimodal_frame_sample",
        "multimodal_meta",
        "multimodal_resize",
        "pca_power_iteration",
        "q21_waiting_supplier",
        "sim_cosine_topk",
        "sim_cosine_topk_numpy",
        "sink_hive_streaming",
        "sink_upsert_by_key",
        "stream_continuous_aggregate_merge",
        "stream_dedup_watermark",
        "stream_dedup_within_watermark",
        "stream_session_window",
        "stream_sliding_window",
        "stream_stateful_per_key",
        "stream_static_join",
        "stream_stream_join",
        "stream_tumbling_window",
        "window_analytic",
        "window_cumulative_distinct",
        "window_distribution",
        "window_ewma_fold",
        "window_gaps_islands_sessionize",
        "window_range_frame",
        "window_ranking",
        "window_running",
        "window_topk_per_group",
    }
)

# Round 5 (CORRECTNESS_r05.json): hash_match == true — 49 greens including
# all five round-3/4 output-type reds (cast_try_cast, q12_priority_class,
# pack_sequences_chunk, multimodal_features, multimodal_features_arrow).
_GREEN_R5: frozenset[str] = frozenset(
    {
        "cast_try_cast",
        "corpus_cross_source_overlap",
        "corpus_mix_weights",
        "corpus_ngram_novelty",
        "corpus_quality_adaptive_threshold",
        "corpus_token_budget_trim",
        "dedup_embedding_cosine",
        "embed_avg_pool",
        "embed_matryoshka_truncate",
        "embed_norm_stats",
        "embed_quantize_int8",
        "events_anomaly_mad",
        "events_decay_time_weighted",
        "events_windowed_rate_limit",
        "join_asof_nearest",
        "multimodal_features",
        "multimodal_features_arrow",
        "pack_sequences_chunk",
        "q12_priority_class",
        "sim_ann_lsh",
        "sim_ivf_topk",
        "sim_maxsim_multivector",
        "source_csv_roundtrip",
        "source_json_roundtrip",
        "source_orc_roundtrip",
        "source_partitioned_pruned_read",
        "source_python_datasource_reader",
        "source_python_datasource_sink",
        "source_socket_csv_pipeline",
        "text_bigram_conditional_topk",
        "text_edit_distance",
        "text_entropy_distribution",
        "text_fingerprint",
        "text_html_strip",
        "text_langid",
        "text_pii_redact",
        "text_quality_filter_pipeline",
        "text_repetition_ratio",
        "text_stats_quality",
        "text_tfidf_topk",
        "text_token_count",
        "text_unigram_surprisal",
        "udf_grouped_agg",
        "udf_grouped_map",
        "udf_pandas_scalar",
        "udf_row_at_a_time",
        "udtf_tokenize",
        "window_hampel_filter",
        "window_time_weighted_avg",
    }
)

# Round 6 (CORRECTNESS_r06.json): hash_match == true — 47 greens; coverage
# closed at 234/234 judged (the 3 remainder are the rows-only set below).
_GREEN_R6: frozenset[str] = frozenset(
    {
        "agg_chi_square_independence",
        "agg_gini_coefficient",
        "agg_histogram_equidepth",
        "agg_ks_two_sample",
        "agg_mutual_information",
        "agg_pivot",
        "agg_subsample_ci",
        "agg_welch_ttest",
        "corpus_data_card",
        "corpus_stratified_hash_sample",
        "corpus_train_split_audit",
        "dedup_chunks_reconstruct",
        "dedup_lsh_components",
        "dedup_minhash_calibration",
        "dedup_semantic_cluster",
        "embed_centroid_drift",
        "embed_label_purity",
        "embed_pq_codes",
        "embed_text_consistency_corr",
        "events_autocorr_lag1",
        "events_benford_digit_audit",
        "events_cusum_changepoint",
        "events_markov_transitions",
        "events_theil_sen_trend",
        "graph_pagerank_knn",
        "join_lateral_correlated",
        "join_runtime_bloom_pruned",
        "json_variant_extract",
        "multimodal_audio_vad_segments",
        "multimodal_image_ahash",
        "sample_deterministic",
        "sample_stratified",
        "scalar_try_functions",
        "sim_ann_recall_audit",
        "sim_ivf_pq_topk",
        "sim_knn_graph_lsh",
        "source_binaryfile_ingest",
        "sql_distribute_cluster_by",
        "sql_parameterized_query",
        "sql_pipe_syntax",
        "stream_json_variant_etl",
        "text_bigram_surprisal",
        "text_bm25_score",
        "text_token_pmi_topk",
        "text_zipf_rank_frequency",
        "window_max_drawdown",
        "xml_funcs",
    }
)

# Round 7 (CORRECTNESS_r07.json): hash_match == true — 47 greens, including
# the two operators new in round 7 (text_bpe_merge_pairs,
# corpus_temperature_mix), certified on their first emission.
_GREEN_R7: frozenset[str] = frozenset(
    {
        "agg_basic",
        "agg_boolean_bitwise",
        "agg_collect",
        "agg_cube",
        "agg_distinct",
        "agg_filter_clause",
        "agg_grouping_sets",
        "agg_histogram_bucket",
        "agg_mode_deterministic",
        "agg_percentile",
        "agg_rollup",
        "agg_stats",
        "agg_stats_native",
        "agg_winsorize_clamp",
        "array_funcs",
        "conditional_funcs",
        "corpus_temperature_mix",
        "data_quality_null_profile",
        "date_spine_fill",
        "explode_wordcount",
        "filter_null_safe_eq",
        "filter_predicates",
        "join_anti",
        "join_asof",
        "join_cross",
        "join_full_outer",
        "join_inner_broadcast",
        "join_left_outer",
        "join_null_safe_key",
        "join_right_outer",
        "join_semi",
        "join_skew_salted",
        "join_theta_range",
        "json_funcs",
        "project_compute",
        "q1_pricing_summary",
        "scalar_datetime_funcs",
        "scalar_math_funcs",
        "scalar_string_funcs",
        "scalar_string_funcs_extra",
        "sql_group_by_all_topk",
        "sql_lateral_view",
        "sql_table_valued_functions",
        "subquery_correlated",
        "table_fingerprint",
        "text_bpe_merge_pairs",
        "unpivot_melt",
    }
)

# Rows-only verdicts (err == "no_oracle", by design): r1 approx sketches,
# r5 wall-clock rate source.
ROWS_ONLY_JUDGED: frozenset[str] = frozenset(
    {"agg_approx", "agg_hll_mergeable_sketch", "source_rate_stream"}
)

_GREEN_R8: frozenset[str] = frozenset(
    {
        "agg_approx_error_bounds",
        "agg_bloom_filter_probe",
        "agg_countmin_sketch",
        "agg_grouping_id_rollup",
        "agg_hll_union_error_bound",
        "agg_listagg_ordered",
        "agg_proportion_ztest",
        "cluster_silhouette_audit",
        "corpus_dedup_rate_by_source",
        "corpus_dsir_importance",
        "corpus_hashed_classifier_score",
        "corpus_heaps_law_fit",
        "corpus_priority_sample",
        "corpus_source_kl_divergence",
        "dedup_containment_pairs",
        "dim_scd2_from_events",
        "embed_binary_quantization_audit",
        "embed_outlier_zscore",
        "events_cohort_ltv",
        "events_funnel_analysis",
        "events_funnel_time_to_convert",
        "events_interarrival_burstiness",
        "events_poisson_dispersion",
        "events_rfm_segmentation",
        "events_seasonal_decompose",
        "graph_kcore",
        "graph_label_propagation",
        "graph_triangle_count",
        "join_bucketed_colocated",
        "layout_shard_export",
        "market_basket_lift",
        "multimodal_shot_boundaries",
        "sim_ann_join_ivf",
        "sim_hamming_binary_topk",
        "sim_hard_negative_mining",
        "sim_ivf_multiprobe_topk",
        "sim_mmr_diverse_topk",
        "sim_range_search_cosine",
        "stream_dedup_minhash_incremental",
        "stream_windowed_topk",
        "text_bpe_train_rounds",
        "text_cdc_chunk_boundaries",
        "text_keyword_rake",
        "text_ngram_repetition",
        "text_readability_scores",
        "window_holt_linear_fold",
        "window_rolling_ols_slope",
    }
)

# Nothing is red after round 8 (0 outstanding wrong answers; all 273
# oracle-bearing queries hold a green driver verdict, CORRECTNESS_r08
# 47/47). With the pending set empty, emission falls back to
# stalest-verdict-first (see ``registry``) so early-round greens get
# re-certified on a rolling basis.
PRIORITY_RECHECK: tuple[str, ...] = ()

# Union of every green ever recorded (a later re-judge can only refresh the
# verdict, never remove it — reds would move to PRIORITY_RECHECK instead).
GREEN: frozenset[str] = (
    _GREEN_R1 | _GREEN_R2 | _GREEN_R4 | _GREEN_R5 | _GREEN_R6 | _GREEN_R7
    | _GREEN_R8
)

# Round of each query's MOST RECENT green verdict. With the pending set
# empty (all 234 judged), ``registry`` emits green queries
# stalest-verdict-first so r1/r2-era verdicts — whose shared helpers have
# since been refactored — get re-certified within ~2 driver rounds.
LAST_GREEN_ROUND: dict[str, int] = {}
for _round, _names in ((1, _GREEN_R1), (2, _GREEN_R2), (4, _GREEN_R4),
                       (5, _GREEN_R5), (6, _GREEN_R6), (7, _GREEN_R7),
                       (8, _GREEN_R8)):
    for _name in _names:
        LAST_GREEN_ROUND[_name] = _round
del _round, _names, _name

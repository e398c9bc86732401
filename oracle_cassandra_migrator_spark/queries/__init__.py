"""Query registry: every implemented operator from SURVEY.md §2 gets a
named query (spark, sf_dir) -> DataFrame and, where SQL-expressible, a
DuckDB oracle SQL string. ``__spark_entry__.py`` re-exports these."""

from oracle_cassandra_migrator_spark.queries.registry import QUERIES, ORACLES, query

# Importing the modules populates the registry.
from oracle_cassandra_migrator_spark.queries import relational  # noqa: E402,F401
from oracle_cassandra_migrator_spark.queries import tpch_suite  # noqa: E402,F401
from oracle_cassandra_migrator_spark.queries import extensions  # noqa: E402,F401
from oracle_cassandra_migrator_spark.queries import round6  # noqa: E402,F401
from oracle_cassandra_migrator_spark.queries import round6b  # noqa: E402,F401
from oracle_cassandra_migrator_spark.queries import round6c  # noqa: E402,F401
from oracle_cassandra_migrator_spark.queries import round7  # noqa: E402,F401
from oracle_cassandra_migrator_spark.queries import round7b  # noqa: E402,F401
from oracle_cassandra_migrator_spark.queries import round9  # noqa: E402,F401
from oracle_cassandra_migrator_spark.queries import round10  # noqa: E402,F401
from oracle_cassandra_migrator_spark.queries import round11  # noqa: E402,F401
from oracle_cassandra_migrator_spark.queries import round12  # noqa: E402,F401

# The external correctness gate verifies queries() entries in insertion
# order and caps each round at ~50 queries, so the catalog is ordered:
# flagship first (entry() depends on it), then every query WITHOUT a
# green driver row (rows+schema+hash vs DuckDB), then the confirmed
# tail. The confirmed sets are the literal key sets of
# CORRECTNESS_r02.json and CORRECTNESS_r03.json; new queries are
# unverified by definition and sort into the front region
# automatically.
_R02_CONFIRMED = frozenset({
    "flagship_payment_pipeline", "agg_global_lineitem", "pricing_summary",
    "agg_distinct_per_segment", "rollup_acctbal_region_nation",
    "cube_orders_status_priority", "join_left_order_counts",
    "join_full_nation_coverage", "join_semi_urgent_customers",
    "join_anti_customers_without_orders", "join_cross_region_pairs",
    "join_range_price_buckets", "asof_join_purchase_click",
    "window_rank_top_orders", "window_running_total", "window_lag_event_gap",
    "topk_order_revenue", "sort_top_customers_by_balance",
    "set_union_priority_buyers", "set_intersect_repeat_buyers",
    "set_except_inactive_customers", "distinct_segment_nation",
    "scalar_string_functions", "scalar_date_functions",
    "scalar_math_functions", "case_when_price_tiers",
    "json_extract_event_props", "agg_grouping_sets", "agg_stats_per_segment",
    "agg_approx_count_distinct", "agg_collect_sorted_nations",
    "pivot_status_by_priority", "join_right_customer_orders",
    "set_union_all_priorities", "set_intersect_all_buyers",
    "set_except_all_buyers", "window_rank_breadth",
    "scalar_conditional_functions", "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue", "tpch_q10_returned_items",
    "tpch_q14_promo_revenue_share", "tpch_q18_large_orders",
    "agg_boolean_functions", "tpch_q7_volume_shipping",
    "tpch_q19_disjunctive_predicates", "subquery_exists_late_ship",
    "subquery_not_in_pending", "subquery_scalar_above_global_avg",
    "subquery_correlated_above_own_avg",
})

_R03_CONFIRMED = frozenset({
    "flagship_payment_pipeline", "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier", "agg_approx_percentiles",
    "tpch_q2_min_cost_supplier", "tpch_q8_market_share",
    "tpch_q9_product_profit", "tpch_q11_important_values",
    "tpch_q12_priority_shipment", "tpch_q16_supplier_breadth",
    "tpch_q17_small_quantity_revenue", "tpch_q20_excess_shippers",
    "tpch_q21_waiting_suppliers", "tpch_q22_dormant_customers",
    "dedup_exact_documents", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash_buckets", "dedup_simhash_hamming",
    # "dedup_embedding_cosine" was renamed _baseline in r4; the r04
    # fold-in below carries the new name (stale key dropped per ADVICE).
    "dedup_embedding_lsh_blocked",
    "sim_topk_bruteforce", "text_token_stats", "text_quality_scores",
    "text_lang_guess", "text_fingerprint_bottomk",
    "multimodal_decode_stats", "events_sessionize",
    "events_daily_type_counts", "udf_user_gap_median",
    "udf_embedding_norms", "skew_salted_revenue_by_status",
    "sim_ann_lsh_exact", "text_bpe_token_counts", "sim_ivf_topk",
    "sim_ivf_trained_topk", "udtf_chunk_documents",
    "pipeline_corpus_curation", "pii_masking", "events_funnel_counts",
    "multimodal_resize_stats", "multimodal_frame_sample",
    "split_train_val_test", "sample_stratified_by_lang",
    "pack_token_budget_bins", "dedup_cluster_components",
    "events_cohort_retention", "embedding_label_centroids",
    "merge_upsert_orders", "scd2_customer_segments",
})

_R04_CONFIRMED = frozenset({
    "agg_approx_count_distinct", "agg_corr_quantity_price",
    "agg_distinct_per_segment", "agg_global_lineitem",
    "agg_price_histogram", "asof_join_purchase_click",
    "cap_docs_per_source", "contamination_ngram_overlap",
    "corpus_mix_report", "cube_orders_status_priority",
    "dedup_embedding_cosine_baseline", "dedup_incremental_snapshot",
    "dedup_minhash_estimate_audit", "dedup_prefix_boilerplate",
    "dedup_semantic_cells", "dedup_semantic_prune",
    "embedding_quantize_int8", "embedding_random_projection",
    "events_rolling_weekly_counts", "events_user_lifecycle",
    "flagship_payment_pipeline", "join_anti_customers_without_orders",
    "join_cross_region_pairs", "join_full_nation_coverage",
    "join_left_order_counts", "join_range_price_buckets",
    "join_semi_urgent_customers", "lateral_explode_tokens",
    "pricing_summary", "rollup_acctbal_region_nation",
    "sample_temperature_by_lang", "scalar_array_functions",
    "scalar_bitwise_functions", "scalar_struct_map_functions",
    "search_bm25_topk", "sim_ivf_multiprobe_topk",
    "sort_top_customers_by_balance", "text_bigram_logprob",
    "text_char_entropy", "text_repetition_stats", "text_tfidf_topk",
    "text_vocab_topk", "topk_order_revenue", "unpivot_part_metrics",
    "window_lag_event_gap", "window_ntile_quartiles",
    "window_rank_top_orders", "window_running_total",
    "window_value_functions",
})

# Queries whose oracle contract changed AFTER their last green driver
# row — treat as unverified so the driver re-checks them under the new
# contract. (r3: agg_approx_count_distinct gained its bounded-error
# full oracle after r01/r02 rows-only checks — re-confirmed r04.
# r5: events_rolling_weekly_counts moved to a calendar RANGE frame —
# re-confirmed r05.)
# r6: the PQ retrain (PQ_INIT_LIMIT 8->16, PQ_ITERS 1->2) changed the
# OUTPUTS of the four r05-green PQ queries — re-confirmed green r06,
# so they left _RECHECK. The unrounded-jaccard threshold fix (ADVICE
# r5) also postdates the green rows of the jaccard-family queries, but
# their outputs are provably unchanged at any driver SF: the fix only
# moves pairs whose true J lies in [t - 5e-7, t), and a rational
# n_common/union with union <= ~1000 shingles cannot land in that
# interval for t = k/10 (|t·union - n_common| would have to be
# <= 5e-4, i.e. exactly 0, which the >= branch already included) — so
# their old rows remain valid evidence and they stay out to preserve
# window slack.
# r7: the absolute training-sample caps (VERDICT r6 item 3) compose
# the existing `% mod` samples with a bottom-k-by-salted-hash cap that
# only BINDS above the cap size (driver SFs select fewer rows than the
# cap, so the trained artifacts — NMI k-means replay, PQ/IVF
# codebooks, bigram LM — are bit-identical at every driver SF and the
# existing green rows remain valid; `tests/test_round7_semantics.py`
# pins cap-not-binding == uncapped). The two multimodal queries DID
# change output (VERDICT r6 item 5: the length-derived fake decode
# became real BMP/PPM/WAV header parsing over synthesized container
# bytes) — they re-enter the window.
# r8: the two r7 rechecks (multimodal real-decode rewrite) re-verified
# green in r07 and folded into _R07_CONFIRMED. window_rank_breadth
# (re-keyed onto the 4096-way customer cohort in r8) re-certified
# green in CORRECTNESS_r08 and left _RECHECK.
# r9: the multimodal fixture gained PNG/GIF containers — both
# fixture-consuming queries re-certified green in CORRECTNESS_r09 and
# left _RECHECK at the r10 fold.
# r10: the fixture gained JPEG containers (VERDICT r9 item 2) — both
# fixture-consuming queries re-certified green in CORRECTNESS_r10 and
# left _RECHECK at the r11 fold.
# r11: the fixture gained WebP containers — both fixture-consuming
# queries re-certified green in CORRECTNESS_r11 and left _RECHECK at
# the r12 fold.
# r12: the fixture gains MP4/ISO-BMFF containers (VERDICT r11 item 4 —
# decode_header walks the box tree ftyp → moov → trak → tkhd to
# canvas dimensions), FLAC (lossless-audio STREAMINFO bit fields),
# TIFF (endian-aware IFD entry walk), Ogg Vorbis/Opus (page walk:
# BOS identification packet + EOS granule), and MP3 (MPEG-1 Layer III
# frame walk against the real bitrate/rate tables), so payload_for_doc
# now cycles doc_id % 12 across bmp/ppm/wav/png/gif/jpeg/webp/mp4/
# flac/tiff/ogg/mp3 and the OUTPUT of both fixture-consuming queries changes
# again: multimodal_decode_stats and multimodal_resize_stats (it
# reuses _MM_DECODED_SQL). pipeline_media_stage consumes the same
# fixture but is r12-new (never green), so it is in the window by
# construction. The driver must re-certify all three under the new
# contract.
_RECHECK = frozenset({
    "multimodal_decode_stats",
    "multimodal_resize_stats",
})

# CORRECTNESS_r05.json: 50/50 green (rows+schema+hash) — the literal
# key set, folded per the round-6 maintenance note below. This closed
# the r5 window; the former _R05_WINDOW special-casing is gone and the
# 13 second-wave queries now sort into the unverified front region.
_R05_CONFIRMED = frozenset({
    "flagship_payment_pipeline",
    "agg_regression_stats", "dedup_minhash_prune",
    "dedup_cluster_size_histogram", "corpus_trigram_diversity",
    "sim_ann_recall_audit", "sim_ann_recall_curve",
    "sample_fixed_n_by_hash", "corpus_mix_weights",
    "profile_documents_table", "search_hybrid_rrf",
    "events_hot_users_report", "events_rolling_weekly_counts",
    "events_daily_gapfill", "text_vocab_coverage",
    "events_dau_wau_stickiness", "dedup_jaccard_histogram",
    "join_interval_bucketed_prices", "text_feature_hashing",
    "text_quality_linear_score", "quantile_bucket_doclen_by_lang",
    "quantile_bucket_prices", "pipeline_curation_v2",
    "skew_salted_join_supplier_revenue", "dedup_duplicate_segments",
    "graph_pagerank_nations", "sim_ann_pq_topk", "sim_ann_pq_recall",
    "udaf_trimmed_mean_price", "embedding_dim_stats",
    "text_lang_confusion", "text_trigram_novelty",
    "events_anomaly_zscore", "join_shuffle_hash_hint",
    "agg_hll_sketch_rollup", "lateral_subquery_top_orders",
    "layout_zorder_values", "sim_ann_ivfpq_topk", "dedup_simhash_prune",
    "sample_fixed_n_per_group", "agg_mode_order_priority",
    "quantile_assign_prices", "corpus_dedup_funnel",
    "scd2_asof_snapshot", "events_first_touch_attribution",
    "sim_ann_ivfpq_recall", "events_type_transition_matrix",
    "join_null_safe_eq", "text_word_pmi", "graph_triangle_count",
})


# CORRECTNESS_r06.json: 50/50 green (rows+schema+hash) — the literal
# key set, folded per the maintenance note below. With this fold every
# query name ever exposed has a green driver row, so the r7 window's
# slots go to (a) anything added in r7 and (b) the stalest r02-era
# greens, whose oracle canonicalization predates the dtype/decimal
# audits (VERDICT r6 item 2).
_R06_CONFIRMED = frozenset({
    "agg_winsorized_mean_price", "assoc_rules_brand_pairs",
    "contamination_source_matrix", "corpus_drift_report",
    "dedup_allpairs_prefix", "dedup_bloom_prefilter",
    "dedup_bloom_ranged_audit", "dedup_containment_pairs",
    "dedup_minshingle_neighbors", "dedup_strategy_recall_report",
    "distinct_segment_nation", "embedding_centroid_drift",
    "encode_target_mean_smoothed", "eval_auc_doclen_lang",
    "events_daily_ewma", "events_funnel_latency",
    "events_props_variant_stats", "events_session_stats",
    "events_user_gini", "events_wow_delta",
    "flagship_payment_pipeline", "graph_bfs_distances",
    "join_fuzzy_customer_names", "layout_minmax_pruning_stats",
    "orders_rfm_segments", "parts_pareto_coverage",
    "sample_weighted_reservoir", "scalar_date_functions",
    "scalar_string_functions", "set_except_inactive_customers",
    "set_intersect_repeat_buyers", "set_union_priority_buyers",
    "sim_ann_ivfpq_recall", "sim_ann_ivfpq_topk",
    "sim_ann_pq_recall", "sim_ann_pq_topk",
    "sim_cluster_quality_nmi", "sim_mmr_diversified_topk",
    "sketch_cms_heavy_hitters", "sketch_cms_join_size",
    "sketch_kll_price_quantiles", "sketch_theta_set_algebra",
    "stats_bootstrap_ci_revenue", "stats_chi2_lang_source",
    "stats_ks_doclen_drift", "stats_psi_doclen_drift",
    "stream_dedup_admission_batch", "text_bpe_encode_stats",
    "text_bpe_merge_rules", "tpch_q3_shipping_priority",
})


# CORRECTNESS_r07.json: 50/50 green (rows+schema+hash) — the literal
# key set, folded per the maintenance note below. r07's window covered
# flagship, the 2 multimodal rechecks, the 23 r7-new queries, and 24
# of the stalest r02-era greens. With this fold the stalest remaining
# rows are the r03-vintage block (TPC-H q2..q22, early dedup/text/
# multimodal) — exactly what the r8 window's spare slots re-verify
# (VERDICT r7 item 2).
_R07_CONFIRMED = frozenset({
    "flagship_payment_pipeline", "multimodal_decode_stats",
    "multimodal_resize_stats", "sample_importance_dsir",
    "sample_importance_dsir_topk", "eval_cohens_kappa_lang_guess",
    "privacy_k_anonymity_audit", "audit_referential_integrity",
    "stream_neardedup_admission_batch", "embedding_covariance_matrix",
    "eval_calibration_doclen", "stats_benford_price_audit",
    "stats_mad_outliers_doclen", "events_cusum_changepoint",
    "parts_skyline_frontier", "corr_spearman_qty_discount",
    "privacy_l_diversity_audit", "attribution_position_events",
    "events_survival_km_curve", "events_seasonality_dow",
    "text_zipf_vocab_fit", "incremental_agg_maintenance",
    "corr_kendall_tau_qty_discount", "agg_hodges_lehmann_quantity",
    "forecast_mase_seasonal_naive", "events_anomaly_deseasonalized",
    "scalar_math_functions", "case_when_price_tiers",
    "json_extract_event_props", "agg_grouping_sets",
    "agg_stats_per_segment", "agg_collect_sorted_nations",
    "pivot_status_by_priority", "join_right_customer_orders",
    "set_union_all_priorities", "set_intersect_all_buyers",
    "set_except_all_buyers", "window_rank_breadth",
    "scalar_conditional_functions", "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue", "tpch_q10_returned_items",
    "tpch_q14_promo_revenue_share", "tpch_q18_large_orders",
    "agg_boolean_functions", "tpch_q7_volume_shipping",
    "tpch_q19_disjunctive_predicates", "subquery_exists_late_ship",
    "subquery_not_in_pending", "subquery_scalar_above_global_avg",
})


# CORRECTNESS_r08.json: 50/50 green (rows+schema+hash) — the literal
# key set, folded per the maintenance note below. r08's window covered
# flagship, the window_rank_breadth recheck (green under its 4096-way
# cohort re-key, so it leaves _RECHECK), and 48 of the stalest r03-era
# greens. With this fold the stalest remaining rows are the
# _R04_CONFIRMED block (scalar-function family, early text/embedding
# ops, search_bm25_topk, pivot/unpivot...) — exactly what the r9
# window's spare slots re-verify (VERDICT r8 item 2).
_R08_CONFIRMED = frozenset({
    "agg_approx_percentiles", "agg_global_lineitem",
    "dedup_cluster_components", "dedup_embedding_lsh_blocked",
    "dedup_exact_documents", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash_buckets", "dedup_simhash_hamming",
    "embedding_label_centroids", "events_cohort_retention",
    "events_daily_type_counts", "events_funnel_counts",
    "events_sessionize", "flagship_payment_pipeline",
    "merge_upsert_orders", "multimodal_frame_sample",
    "pack_token_budget_bins", "pii_masking", "pipeline_corpus_curation",
    "sample_stratified_by_lang", "scd2_customer_segments",
    "sim_ann_lsh_exact", "sim_ivf_topk", "sim_ivf_trained_topk",
    "sim_topk_bruteforce", "skew_salted_revenue_by_status",
    "split_train_val_test", "subquery_correlated_above_own_avg",
    "text_bpe_token_counts", "text_fingerprint_bottomk",
    "text_lang_guess", "text_quality_scores", "text_token_stats",
    "tpch_q11_important_values", "tpch_q12_priority_shipment",
    "tpch_q13_customer_distribution", "tpch_q15_top_supplier",
    "tpch_q16_supplier_breadth", "tpch_q17_small_quantity_revenue",
    "tpch_q20_excess_shippers", "tpch_q21_waiting_suppliers",
    "tpch_q22_dormant_customers", "tpch_q2_min_cost_supplier",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "udf_embedding_norms", "udf_user_gap_median", "udtf_chunk_documents",
    "window_rank_breadth",
})


# CORRECTNESS_r09.json: 50/50 green (rows+schema+hash) — the literal
# key set, folded per the maintenance note below. r09's window covered
# flagship, the two multimodal rechecks (green under the PNG/GIF
# contract), the one r9-new query (dedup_jaccard_auto_routed), and 46
# of the stalest r04-era greens. With this fold the stalest remaining
# rows are the 45 r05-vintage greens (_R05_CONFIRMED minus flagship
# and the four sim_ann_pq/ivfpq re-verifications) — exactly what the
# r10 window's spare slots re-verify (VERDICT r9 item 1).
_R09_CONFIRMED = frozenset({
    "agg_approx_count_distinct", "agg_corr_quantity_price",
    "agg_distinct_per_segment", "agg_price_histogram",
    "asof_join_purchase_click", "cap_docs_per_source",
    "contamination_ngram_overlap", "corpus_mix_report",
    "cube_orders_status_priority", "dedup_embedding_cosine_baseline",
    "dedup_incremental_snapshot", "dedup_jaccard_auto_routed",
    "dedup_minhash_estimate_audit", "dedup_prefix_boilerplate",
    "dedup_semantic_cells", "dedup_semantic_prune",
    "embedding_quantize_int8", "embedding_random_projection",
    "events_user_lifecycle", "flagship_payment_pipeline",
    "join_anti_customers_without_orders", "join_cross_region_pairs",
    "join_full_nation_coverage", "join_left_order_counts",
    "join_range_price_buckets", "join_semi_urgent_customers",
    "lateral_explode_tokens", "multimodal_decode_stats",
    "multimodal_resize_stats", "pricing_summary",
    "rollup_acctbal_region_nation", "sample_temperature_by_lang",
    "scalar_array_functions", "scalar_bitwise_functions",
    "scalar_struct_map_functions", "search_bm25_topk",
    "sim_ivf_multiprobe_topk", "sort_top_customers_by_balance",
    "text_bigram_logprob", "text_char_entropy", "text_repetition_stats",
    "text_tfidf_topk", "text_vocab_topk", "topk_order_revenue",
    "unpivot_part_metrics", "window_lag_event_gap",
    "window_ntile_quartiles", "window_rank_top_orders",
    "window_running_total", "window_value_functions",
})


# CORRECTNESS_r10.json: 50/50 green (rows+schema+hash) — the literal
# key set, folded per the maintenance note below. r10's window covered
# flagship, the two multimodal rechecks (green under the JPEG
# contract), the two r10-new queries (sim_ann_incremental_topk,
# pipeline_dedup_near_filter), and 45 of the stalest r05-era greens.
# With this fold the stalest remaining rows are the 49 r06-vintage
# greens — exactly what the r11 window's spare slots re-verify
# (VERDICT r10 item 1). The two multimodal queries re-enter _RECHECK
# (the r11 WebP contract postdates their r10 rows).
_R10_CONFIRMED = frozenset({
    "agg_hll_sketch_rollup", "agg_mode_order_priority",
    "agg_regression_stats", "corpus_dedup_funnel",
    "corpus_mix_weights", "corpus_trigram_diversity",
    "dedup_cluster_size_histogram", "dedup_duplicate_segments",
    "dedup_jaccard_histogram", "dedup_minhash_prune",
    "dedup_simhash_prune", "embedding_dim_stats",
    "events_anomaly_zscore", "events_daily_gapfill",
    "events_dau_wau_stickiness", "events_first_touch_attribution",
    "events_hot_users_report", "events_rolling_weekly_counts",
    "events_type_transition_matrix", "flagship_payment_pipeline",
    "graph_pagerank_nations", "graph_triangle_count",
    "join_interval_bucketed_prices", "join_null_safe_eq",
    "join_shuffle_hash_hint", "lateral_subquery_top_orders",
    "layout_zorder_values", "multimodal_decode_stats",
    "multimodal_resize_stats", "pipeline_curation_v2",
    "pipeline_dedup_near_filter", "profile_documents_table",
    "quantile_assign_prices", "quantile_bucket_doclen_by_lang",
    "quantile_bucket_prices", "sample_fixed_n_by_hash",
    "sample_fixed_n_per_group", "scd2_asof_snapshot",
    "search_hybrid_rrf", "sim_ann_incremental_topk",
    "sim_ann_recall_audit", "sim_ann_recall_curve",
    "skew_salted_join_supplier_revenue", "text_feature_hashing",
    "text_lang_confusion", "text_quality_linear_score",
    "text_trigram_novelty", "text_vocab_coverage", "text_word_pmi",
    "udaf_trimmed_mean_price",
})


# CORRECTNESS_r11.json: 50/50 green (rows+schema+hash) — the literal
# key set, folded per the maintenance note below. r11's window covered
# flagship, the two multimodal rechecks (green under the WebP
# contract), the r11-new pipeline_sample_stage, and 46 of the stalest
# r06-vintage greens. With this fold the stalest remaining rows are
# the 3 leftover r06-vintage greens (assoc_rules_brand_pairs,
# embedding_centroid_drift, stats_psi_doclen_drift) plus the 46
# r07-vintage greens — exactly what the r12 window's spare slots
# re-verify (VERDICT r11 item 1). The two multimodal queries re-enter
# _RECHECK (the r12 MP4 contract postdates their r11 rows).
_R11_CONFIRMED = frozenset({
    "agg_winsorized_mean_price", "contamination_source_matrix",
    "corpus_drift_report", "dedup_allpairs_prefix",
    "dedup_bloom_prefilter", "dedup_bloom_ranged_audit",
    "dedup_containment_pairs", "dedup_minshingle_neighbors",
    "dedup_strategy_recall_report", "distinct_segment_nation",
    "encode_target_mean_smoothed", "eval_auc_doclen_lang",
    "events_daily_ewma", "events_funnel_latency",
    "events_props_variant_stats", "events_session_stats",
    "events_user_gini", "events_wow_delta",
    "flagship_payment_pipeline", "graph_bfs_distances",
    "join_fuzzy_customer_names", "layout_minmax_pruning_stats",
    "multimodal_decode_stats", "multimodal_resize_stats",
    "orders_rfm_segments", "parts_pareto_coverage",
    "pipeline_sample_stage", "sample_weighted_reservoir",
    "scalar_date_functions", "scalar_string_functions",
    "set_except_inactive_customers", "set_intersect_repeat_buyers",
    "set_union_priority_buyers", "sim_ann_ivfpq_recall",
    "sim_ann_ivfpq_topk", "sim_ann_pq_recall", "sim_ann_pq_topk",
    "sim_cluster_quality_nmi", "sim_mmr_diversified_topk",
    "sketch_cms_heavy_hitters", "sketch_cms_join_size",
    "sketch_kll_price_quantiles", "sketch_theta_set_algebra",
    "stats_bootstrap_ci_revenue", "stats_chi2_lang_source",
    "stats_ks_doclen_drift", "stream_dedup_admission_batch",
    "text_bpe_encode_stats", "text_bpe_merge_rules",
    "tpch_q3_shipping_priority",
})


_CONFIRMED_ROUNDS = (
    _R02_CONFIRMED, _R03_CONFIRMED, _R04_CONFIRMED, _R05_CONFIRMED,
    _R06_CONFIRMED, _R07_CONFIRMED, _R08_CONFIRMED, _R09_CONFIRMED,
    _R10_CONFIRMED, _R11_CONFIRMED)


def _last_green_round(name):
    """0 = never driver-green; k = last round (2..11) with a green row."""
    last = 0
    for i, s in enumerate(_CONFIRMED_ROUNDS, start=2):
        if name in s:
            last = i
    return last


def _verification_order(names):
    # ROUND-N+1 MAINTENANCE (this stalled r3->r4 planning once): when a
    # new CORRECTNESS_r0N.json lands, fold its green keys into an
    # _R0N_CONFIRMED frozenset here and append it to _CONFIRMED_ROUNDS,
    # else the driver's ~50-slot window re-verifies already-green
    # queries and new ones never get a row. Keep any key whose oracle
    # changed afterwards in _RECHECK instead. Update
    # test_catalog_orders_least_verified_first alongside.
    #
    # ROUND-6 ORDER: flagship first (entry() contract), then every
    # query with NO green driver row (the 13 r5-deferred queries plus
    # anything added this round), then the confirmed tail sorted by
    # STALENESS — oldest last-green round first — so the window's spare
    # slots re-verify the r02-era rows whose oracle canonicalization
    # conventions predate the dtype/decimal audits. Sort is stable:
    # registration order is preserved within a staleness bucket.
    def key(n):
        last = 0 if n in _RECHECK else _last_green_round(n)
        return (0 if n == "flagship_payment_pipeline" else 1, last)

    return sorted(names, key=key)


_ordered = {n: QUERIES[n] for n in _verification_order(list(QUERIES))}
QUERIES.clear()
QUERIES.update(_ordered)

__all__ = ["QUERIES", "ORACLES", "query"]

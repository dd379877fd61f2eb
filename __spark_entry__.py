"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-Q1-shaped pricing summary)
at sf0.001. ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 plus the north-star training-data operators
(dedup family, similarity search, text analysis, event windows); the
driver cross-checks each against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_din_spark.plans import ORACLES, QUERIES

# Queries the per-round correctness driver has not yet sampled (or whose
# last sample is oldest) are listed first so a bounded driver window covers
# them before re-checking recently-green entries. Names not in the registry
# are ignored; registered queries not listed here follow in registration
# order. Rotation state entering round 11 (CORRECTNESS_r10 green for all 50
# sampled): the two late round-10 additions that missed the r10 window lead
# (never sampled), round-11 additions are appended to that head AS THEY
# LAND (tests/test_rotation.py enforces that every never-sampled name is in
# the head — the invariant, not a per-round cleanup), then the full
# 43-query block whose latest driver sample is round 6 (computed from
# CORRECTNESS_r0{6..10}.json, registration order). The head now holds
# more names than the ~50 window: new queries outrank stale ones
# (never-sampled is the worse state), so the window covers every
# never-sampled entry first and only the remainder of the round-6
# block; whatever round-6 names the window misses — roughly
# len(head) − 50 of them — must lead the round-12 head. (Counts are
# deliberately not hard-coded here; a prior exact tally went stale
# twice as late additions landed.)
_DRIVER_PRIORITY: list[str] = [
    # Never driver-sampled (absent from every CORRECTNESS_r*.json) — lead.
    "similarity_graph_insert",
    "dq_t_closeness_audit",
    # Round-11 additions are inserted here as they land (never sampled).
    "streaming_stream_outer_join",
    "dedup_substring_w_grid",
    "doc_trigram_perplexity",
    "doc_lm_interp_ab",
    "dq_k_anonymity_generalize",
    "similarity_graph_nsw_grid",
    "doc_lm_smoothing_ab",
    "streaming_stream_full_outer_join",
    "similarity_graph_routed_insert",
    "similarity_graph_hnsw_entry",
    "doc_gopher_rules",
    "similarity_mrl_dim_grid",
    "dq_salt_factor_grid",
    "events_hll_precision_grid",
    "events_dynamic_gap_sessions",
    "similarity_ivf_nlist_sweep",
    "similarity_ivfpq_rerank_sweep",
    "events_cdc_merge",
    "corpus_compaction_ab",
    "streaming_cdc_merge",
    "similarity_graph_delete_repair",
    "corpus_unigram_prune",
    "events_funnel_windowed",
    "retrieval_mmr_diversify",
    "events_anomaly_mad",
    "dedup_simhash_band_grid",
    "similarity_filtered_ann",
    "similarity_filtered_nprobe",
    "events_ewma_halving",
    "dq_freshness_sla",
    "dq_quantile_sketch_grid",
    "corpus_mg_heavy_hitters",
    "streaming_mg_maintenance",
    "similarity_bq_recall_grid",
    "retrieval_late_interaction",
    "layout_zonemap_audit",
    "layout_zorder_pruning",
    "layout_hilbert_vs_zorder",
    "events_theta_set_ops",
    "streaming_theta_index",
    "corpus_pack_split_ab",
    "events_scd2_temporal_join",
    "retrieval_prf_expansion",
    "similarity_rp_dim_grid",
    "corpus_line_dedup",
    "corpus_doremi_step",
    "events_hll_sliding_merge",
    "similarity_graph_vamana_grid",
    "similarity_vamana_clustered_ab",
    "streaming_line_dedup_gate",
    "retrieval_ql_dirichlet",
    "dq_benford_audit",
    "similarity_pq_subspace_ab",
    "streaming_watermark_lateness_grid",
    "events_asof_tolerance_grid",
    "events_gini_concentration",
    "corpus_cms_width_grid",
    "corpus_decontam_n_grid",
    "doc_mattr_diversity",
    "similarity_kmeans_convergence",
    "dq_order_consistency_audit",
    "events_markov_transitions",
    "events_session_gap_grid",
    "events_cusum_changepoint",
    "events_dispersion_audit",
    "streaming_cusum_gate",
    "corpus_ccnet_buckets",
    "dedup_semdedup_eps_grid",
    "dq_completeness_matrix",
    # Latest driver sample is round 6 (all 43, registration order).
    "tables_clean_shape",
    "tables_header_election",
    "tables_dedup_conflicts",
    "tables_subtable_split",
    "table_trust_aggregate",
    "validation_issues",
    "keyword_relevance",
    "context_budget_cut",
    "qna_pairs_extract",
    "qna_best_match",
    "doc_semantic_chunks",
    "media_phash_near_dup",
    "media_phash_clusters",
    "media_phash_recall",
    "media_resize_plan",
    "media_frame_samples",
    "q13_customer_distribution",
    "q18_large_orders",
    "q19_bracket_revenue",
    "q22_idle_customers",
    "q12_priority_shipping",
    "q16_supplier_part_variety",
    "q21_waiting_suppliers",
    "customer_spend_quartiles",
    "q7_nation_volume",
    "q15_top_supplier",
    "q8_market_share",
    "doc_classification",
    "doc_enrichment",
    "block_type_detection",
    "similarity_batch_topk",
    "doc_sanitize_normalize",
    "streaming_curation_funnel",
    "streaming_minhash_index",
    "streaming_scd2_maintenance",
    "streaming_latest_snapshot",
    "corpus_decontaminate",
    "pii_redaction",
    "doc_repetition_quality",
    "corpus_stratified_sample",
    "corpus_pack_sequences",
    "training_shard_manifest",
    "dq_expectations",
]


def _priority_order(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _DRIVER_PRIORITY if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (and the
    north-star additions). Each callable takes (spark, sf_dir) and returns
    a DataFrame with columns aliased identically to ``oracle_sql``."""
    return _priority_order(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names;
    deterministic decimal-exact aggregation — see
    data_ingestion_din_spark/plans/registry.py for the parity rules)."""
    return _priority_order(dict(ORACLES))

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
# order. Rotation state entering round 12 (CORRECTNESS_r11 green for all 50
# sampled): the 21 round-11 late additions the r11 window missed lead
# (never sampled, computed from all CORRECTNESS_r*.json), round-12
# additions are inserted into that head AS THEY LAND
# (tests/test_rotation.py enforces that every never-sampled name precedes
# every sampled one — the invariant, not a per-round cleanup), then the
# full 43-query block whose latest driver sample is round 6. Registry
# growth is deliberately paused this round (a handful of additions at
# most) so the ~50 window retires the never-sampled set plus the front of
# the r6 block; whatever r6 names the window misses lead round 13.
_DRIVER_PRIORITY: list[str] = [
    # Round-12 additions land here (never sampled — must lead).
    "dq_completeness_hll_ab",
    "similarity_graph_hnsw_layers",
    "doc_5gram_perplexity",
    "doc_lm_5gram_ab",
    # Never driver-sampled r11 additions (absent from every
    # CORRECTNESS_r*.json through r11).
    "events_gini_concentration",
    "events_markov_transitions",
    "events_session_gap_grid",
    "dedup_semdedup_eps_grid",
    "similarity_vamana_clustered_ab",
    "similarity_pq_subspace_ab",
    "similarity_kmeans_convergence",
    "retrieval_ql_dirichlet",
    "events_asof_tolerance_grid",
    "corpus_cms_width_grid",
    "events_cusum_changepoint",
    "events_dispersion_audit",
    "streaming_watermark_lateness_grid",
    "corpus_decontam_n_grid",
    "doc_mattr_diversity",
    "corpus_ccnet_buckets",
    "streaming_line_dedup_gate",
    "streaming_cusum_gate",
    "dq_benford_audit",
    "dq_order_consistency_audit",
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
    "streaming_scd2_maintenance",
    "streaming_latest_snapshot",
    "streaming_minhash_index",
    "streaming_curation_funnel",
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

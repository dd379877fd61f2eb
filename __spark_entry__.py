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
# order. Rotation state after round 9 (CORRECTNESS_r09 green for all 50
# sampled): the two never-sampled queries lead, then the round-10
# additions as they land, then the FULL 21-query block whose latest
# driver sample is round 5, then the round-6 block oldest-first (all
# computed from CORRECTNESS_r0{5..9}.json) — after this round every
# remaining sample is round 6+ and nothing is never-sampled.
_DRIVER_PRIORITY: list[str] = [
    # Never driver-sampled (absent from every CORRECTNESS_r0*.json) — lead.
    "similarity_ivfpq_residual_multiprobe",
    "similarity_ivfpq_residual_mp_recall",
    # Round-10 additions are inserted here as they land (never sampled).
    "dedup_minhash_br_grid",
    "doc_ngram_perplexity",
    "streaming_ppl_gate",
    "streaming_anomaly_gate",
    "similarity_sq8_topk",
    "similarity_sq8_recall_sweep",
    "corpus_unigram_tokenize",
    "corpus_unigram_fertility",
    "corpus_bloom_decontaminate",
    "streaming_bloom_gate",
    "similarity_ivfsq8_topk",
    "similarity_ivfsq8_recall_sweep",
    "corpus_unigram_encode",
    "similarity_sq8_incremental",
    "dq_l_diversity_audit",
    "similarity_graph_greedy_search",
    "similarity_graph_search_grid",
    "corpus_unigram_em_step",
    "streaming_quantile_maintenance",
    "streaming_cms_maintenance",
    # Latest driver sample is round 5 (all 21, registration order).
    "dedup_cluster_size_hist",
    "dedup_minhash_estimate_audit",
    "embedding_hard_negatives",
    "similarity_lsh_multiprobe",
    "similarity_pq_topk",
    "dedup_semantic_kmeans",
    "similarity_pq_recall",
    "tables_column_profile",
    "retrieval_hybrid_rrf",
    "user_erasure",
    "corpus_cms_heavy_hitters",
    "corpus_length_percentiles",
    "events_anomaly_zscore",
    "streaming_stream_join",
    "streaming_session_windows",
    "streaming_hll_registers",
    "corpus_pack_sequences_sharded",
    "corpus_train_val_split",
    "overlay_boxes",
    "eval_judged_scores",
    "eval_judged_summary",
    # Round-6 block, oldest first (registration order); the ~50-query
    # window takes the head, extras roll to round 11.
    "top_customers_per_nation",
    "events_5min_gapfill",
    "events_pivot_unpivot",
    "doc_bpe_token_stats",
    "embedding_kmeans",
    "similarity_ivf_kmeans",
    "similarity_lsh_recall",
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

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
# order. Rotation state after round 8 (CORRECTNESS_r08 green for all 50
# sampled): the round-9 additions (never sampled) lead, then the FULL
# 37-query block whose latest driver sample is round 5 (computed from
# CORRECTNESS_r0{5..8}.json), then the oldest of the round-6 block —
# after this round every remaining sample is round 6+.
_DRIVER_PRIORITY: list[str] = [
    # Round-9 additions — never driver-sampled.
    "similarity_lsh_recall_sweep",
    "similarity_ivfpq_k16_grid",
    "streaming_profile_gate",
    "similarity_range_search",
    "corpus_dedup_funnel_full",
    "corpus_eval_attribution",
    "media_segment_dedup",
    "streaming_tmix_gate",
    "streaming_semdedup_gate",
    "streaming_decontam_gate",
    "events_interval_overlap_join",
    "dq_schema_drift",
    "corpus_zipf_fit",
    "corpus_heaps_law",
    "streaming_bpe_gate",
    "salted_skew_join",
    "dq_key_skew_profile",
    "streaming_rollup_maintenance",
    "corpus_temperature_mixture",
    "dq_k_anonymity_audit",
    "q4_order_priority",
    "streaming_ivfpq_index",
    "streaming_ivfpq_serve",
    "retrieval_ndcg_audit",
    "corpus_bpe_fertility",
    "similarity_ivfpq_incremental",
    "similarity_ivfpq_recall_sweep",
    "similarity_ivfpq_residual_recall_sweep",
    "similarity_ivfpq_residual_topk",
    "similarity_ivfpq_residual_recall",
    "corpus_bpe_pipeline",
    "streaming_substring_index",
    "streaming_dsir_gate",
    "multimodal_clip_gate",
    # Latest sample is round 5 (all 37, registration order).
    "events_latest_snapshot",
    "events_cohort_ltv",
    "events_dau_wau",
    "events_hll_distinct",
    "events_zorder_box",
    "doc_rare_token_ratio",
    "corpus_bigram_lm",
    "corpus_langid_confusion",
    "corpus_curation_funnel",
    "doc_bigram_lm_score",
    "corpus_bpe_merge_step",
    "corpus_phrase_mining",
    "corpus_textrank_keywords",
    "ingest_quarantine",
    "corpus_bigram_generate",
    "dedup_incremental_batch",
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
    # Oldest of the round-6 block (fills the ~50-query window).
    "top_customers_per_nation",
    "events_5min_gapfill",
    "events_pivot_unpivot",
    "doc_bpe_token_stats",
    "embedding_kmeans",
    "similarity_ivf_kmeans",
    "similarity_lsh_recall",
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

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
# order. Rotation state entering round 14 (CORRECTNESS_r13 green for all 50
# sampled, zero never-sampled anywhere): round-14 additions land at the
# very head AS THEY LAND (tests/test_rotation.py enforces that every
# never-sampled name precedes every sampled one), then the 20-query block
# whose latest driver sample is round 7, then the 50-query round-8 block in
# registration order. Registry growth stays <=5 this round so the ~50
# window retires the whole r7 block plus ~the front half of r8.
_DRIVER_PRIORITY: list[str] = [
    # Round-14 additions land here (never sampled - must lead).
    "pipeline_e2e",
    "similarity_pq_opq_ab",
    "streaming_ivf_rebalance",
    # r14 schema change (plan pins moved to the plan test, ADVICE r13):
    # re-sample ahead of the stale blocks
    "ranked_prefix_ab",
    # Latest driver sample is round 7 (all 20, registration order).
    "dedup_simhash_groups",
    "ngram_jaccard_top20",
    "embedding_near_dup",
    "dedup_clusters",
    "embedding_label_centroids",
    "blocks_reading_order",
    "blocks_sections",
    "blocks_merged",
    "html_tables_parse",
    "ask_pipeline",
    "events_asof_attribution",
    "events_error_burst",
    "multimodal_media_stats",
    "q3_bucketed_colocated",
    "revenue_cube",
    "events_value_quartiles",
    "repeat_buyers_96_not_97",
    "streaming_ingest_chunks",
    "streaming_phash_index",
    "training_shard_incremental",
    # Latest driver sample is round 8 (all 50, registration order).
    "segment_median_order",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "events_hourly_rollup",
    "events_scd2_intervals",
    "events_histogram_quantiles",
    "corpus_curation",
    "corpus_bpe_encode",
    "corpus_bpe_train",
    "dedup_minhash_banded",
    "ngram_jaccard_capped",
    "embedding_near_dup_lsh",
    "dedup_keep_best",
    "chunk_level_dedup",
    "doc_cdc_chunks",
    "doc_winnow_fingerprints",
    "doc_tfidf_cosine_topk",
    "dedup_substring_spans",
    "dedup_substring_stats",
    "dedup_substring_removal",
    "corpus_leakage_safe_split",
    "corpus_dedup_funnel",
    "similarity_topk",
    "similarity_ivf_label",
    "similarity_lsh_topk",
    "similarity_ivf_incremental",
    "similarity_ivfpq_topk",
    "similarity_ivfpq_recall",
    "similarity_ivfpq_multiprobe",
    "similarity_ivfpq_mp_recall",
    "table_transactions",
    "table_transactions_dated",
    "retrieval_bm25",
    "bloom_join_prune",
    "streaming_first_seen",
    "streaming_dedup_watermark",
    "streaming_ivf_index",
    "streaming_quality_gate",
    "corpus_lang_pruned_stats",
    "corpus_length_buckets",
    "corpus_mixture_epochs",
    "corpus_distinctive_terms",
    "doc_quality_classifier",
    "url_canonicalize",
    "corpus_snapshot_diff",
    "corpus_dsir_select",
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_stock",
    "q20_potential_promotion",
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

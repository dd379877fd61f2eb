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
# order. Rotation state entering round 13 (CORRECTNESS_r12 green for all 50
# sampled, zero never-sampled anywhere): round-13 additions land at the
# very head AS THEY LAND (tests/test_rotation.py enforces that every
# never-sampled name precedes every sampled one), then the 18-query block
# whose latest driver sample is round 6, then the 50-query round-7 block in
# registration order. Registry growth stays small this round so the ~50
# window retires the whole r6 block plus the front of r7.
_DRIVER_PRIORITY: list[str] = [
    # Round-13 additions land here (never sampled - must lead).
    "ranked_prefix_ab",
    "similarity_pq_aniso_ab",
    "streaming_asof_attribution",
    # Latest driver sample is round 6 (all 18, registration order).
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
    # Latest driver sample is round 7 (all 50, registration order).
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "customer_running_revenue",
    "parts_never_discounted",
    "late_shipment_orders",
    "nation_customer_rollup",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "events_tumbling_5min",
    "events_sliding_10min",
    "events_sessionized",
    "events_json_props",
    "events_type_pivot",
    "clicks_on_error_free_days",
    "events_daily_retention",
    "events_funnel",
    "events_kmv_distinct",
    "events_trailing_hour",
    "doc_token_stats",
    "doc_language_quality",
    "doc_clean_roundtrip",
    "doc_fixed_chunks",
    "corpus_word_freq",
    "dedup_exact",
    "dedup_wordset",
    "minhash_signatures",
    "dedup_minhash_groups",
    "dedup_simhash_near",
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

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
# order. Rotation state after round 5: all 44 round-5 additions plus the
# first six of the round-2 block were sampled green (CORRECTNESS_r05);
# the round-6 additions (never sampled) lead, then the six queries whose
# latest driver sample is still round 2, then the round-3 block
# oldest-first (VERDICT r5 next-round #2).
_DRIVER_PRIORITY: list[str] = [
    # Round-6 additions — never driver-sampled.
    "media_phash_near_dup",
    "media_phash_clusters",
    "media_phash_recall",
    "media_resize_plan",
    "media_frame_samples",
    "streaming_curation_funnel",
    "streaming_minhash_index",
    "streaming_scd2_maintenance",
    "streaming_latest_snapshot",
    "dq_expectations",
    "training_shard_manifest",
    # Latest sample is round 2.
    "table_trust_aggregate",
    "tables_clean_shape",
    "tables_dedup_conflicts",
    "tables_header_election",
    "tables_subtable_split",
    "top_customers_per_nation",
    # Latest sample is round 3 (registration order within the block).
    "validation_issues",
    "keyword_relevance",
    "context_budget_cut",
    "qna_pairs_extract",
    "qna_best_match",
    "doc_enrichment",
    "doc_classification",
    "doc_sanitize_normalize",
    "block_type_detection",
    "doc_semantic_chunks",
    "doc_bpe_token_stats",
    "corpus_decontaminate",
    "pii_redaction",
    "doc_repetition_quality",
    "corpus_stratified_sample",
    "corpus_pack_sequences",
    "customer_spend_quartiles",
    "events_pivot_unpivot",
    "embedding_kmeans",
    "similarity_ivf_kmeans",
    "similarity_lsh_recall",
    "similarity_batch_topk",
    "q7_nation_volume",
    "q8_market_share",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_variety",
    "q18_large_orders",
    "q19_bracket_revenue",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "events_5min_gapfill",
    "events_daily_retention",
    "events_funnel",
    "events_kmv_distinct",
    "events_trailing_hour",
    "events_asof_attribution",
    "events_error_burst",
    "events_value_quartiles",
    "dedup_clusters",
    "dedup_simhash_groups",
    "dedup_simhash_near",
    "html_tables_parse",
    "revenue_cube",
    "repeat_buyers_96_not_97",
    "multimodal_media_stats",
    "streaming_ingest_chunks",
    "q3_bucketed_colocated",
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

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
# order. Rotation state after round 6 (CORRECTNESS_r06 green for all 50
# sampled): the round-7 additions (never sampled) lead, then the 17
# queries whose latest driver sample is still round 3, then the round-4
# block oldest-first (VERDICT r6 next-round #2) — after this round every
# query's latest sample should be round 4+.
_DRIVER_PRIORITY: list[str] = [
    # Round-7 additions — never driver-sampled.
    "ask_pipeline",
    "streaming_phash_index",
    "training_shard_incremental",
    # Latest sample is round 3.
    "dedup_clusters",
    "dedup_simhash_groups",
    "dedup_simhash_near",
    "events_asof_attribution",
    "events_daily_retention",
    "events_error_burst",
    "events_funnel",
    "events_kmv_distinct",
    "events_trailing_hour",
    "events_value_quartiles",
    "html_tables_parse",
    "multimodal_media_stats",
    "q3_bucketed_colocated",
    "qna_best_match_seq",
    "repeat_buyers_96_not_97",
    "revenue_cube",
    "streaming_ingest_chunks",
    # Latest sample is round 4 (registration order within the block).
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "customer_running_revenue",
    "parts_never_discounted",
    "late_shipment_orders",
    "nation_customer_rollup",
    "events_tumbling_5min",
    "events_sliding_10min",
    "events_sessionized",
    "events_json_props",
    "events_type_pivot",
    "clicks_on_error_free_days",
    "doc_token_stats",
    "doc_language_quality",
    "doc_clean_roundtrip",
    "doc_fixed_chunks",
    "corpus_word_freq",
    "dedup_exact",
    "dedup_wordset",
    "minhash_signatures",
    "dedup_minhash_groups",
    "ngram_jaccard_top20",
    "embedding_near_dup",
    "embedding_label_centroids",
    "blocks_reading_order",
    "blocks_sections",
    "blocks_merged",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "q14_promo_revenue",
    "events_hourly_rollup",
    "corpus_curation",
    "dedup_minhash_banded",
    "ngram_jaccard_capped",
    "embedding_near_dup_lsh",
    "dedup_keep_best",
    "chunk_level_dedup",
    "corpus_length_buckets",
    "corpus_mixture_epochs",
    "corpus_distinctive_terms",
    "doc_cdc_chunks",
    "doc_winnow_fingerprints",
    "streaming_first_seen",
    "table_transactions_dated",
    "corpus_lang_pruned_stats",
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

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
# are ignored; registered queries not listed here (all sampled green in
# round 3) follow in registration order.
_DRIVER_PRIORITY: list[str] = [
    # Round-4 additions — never driver-sampled.
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
    # Oldest driver sample is round 2 (round 3 re-sampled the other 50);
    # oldest-first rotation per VERDICT r3 next-round #10.
    "blocks_merged",
    "blocks_reading_order",
    "blocks_sections",
    "clicks_on_error_free_days",
    "corpus_curation",
    "corpus_word_freq",
    "customer_running_revenue",
    "dedup_exact",
    "dedup_minhash_banded",
    "dedup_minhash_groups",
    "dedup_wordset",
    "doc_clean_roundtrip",
    "doc_fixed_chunks",
    "doc_language_quality",
    "doc_token_stats",
    "embedding_label_centroids",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "events_hourly_rollup",
    "events_json_props",
    "events_sessionized",
    "events_sliding_10min",
    "events_tumbling_5min",
    "events_type_pivot",
    "late_shipment_orders",
    "minhash_signatures",
    "nation_customer_rollup",
    "ngram_jaccard_capped",
    "ngram_jaccard_top20",
    "parts_never_discounted",
    "q10_returned_items",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "segment_median_order",
    "similarity_ivf_label",
    "similarity_lsh_topk",
    "similarity_topk",
    "table_transactions",
    "table_trust_aggregate",
    "tables_clean_shape",
    "tables_dedup_conflicts",
    "tables_header_election",
    "tables_subtable_split",
    "top_customers_per_nation",
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

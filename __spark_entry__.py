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
# order. Rotation state after round 7 (CORRECTNESS_r07 green for all 50
# sampled): the round-8 additions (never sampled) lead, then the 20
# queries whose latest driver sample is round 4, then the oldest of the
# round-5 block — after this round every remaining sample is round 5+.
_DRIVER_PRIORITY: list[str] = [
    # Round-8 additions — never driver-sampled.
    "corpus_dsir_select",
    "dedup_substring_spans",
    "dedup_substring_removal",
    "dedup_substring_stats",
    "doc_quality_classifier",
    "similarity_ivf_incremental",
    "streaming_ivf_index",
    "corpus_bpe_train",
    "url_canonicalize",
    "similarity_ivfpq_topk",
    "similarity_ivfpq_recall",
    "similarity_ivfpq_multiprobe",
    "similarity_ivfpq_mp_recall",
    "corpus_leakage_safe_split",
    "corpus_snapshot_diff",
    "corpus_dedup_funnel",
    "streaming_quality_gate",
    # Latest sample is round 4 (registration order within the block).
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
    # Latest sample is round 5 (oldest-first within the r5 block).
    "segment_median_order",
    "similarity_topk",
    "similarity_ivf_label",
    "table_transactions",
    "q6_forecast_revenue",
    "similarity_lsh_topk",
    "retrieval_bm25",
    "bloom_join_prune",
    "events_scd2_intervals",
    "events_histogram_quantiles",
    "streaming_dedup_watermark",
    "corpus_bpe_encode",
    "doc_tfidf_cosine_topk",
    "ingest_quarantine",
    "user_erasure",
    "corpus_bigram_generate",
    "similarity_pq_topk",
    "similarity_pq_recall",
    "dedup_semantic_kmeans",
    "events_hll_distinct",
    "doc_bigram_lm_score",
    "corpus_bpe_merge_step",
    "corpus_phrase_mining",
    "corpus_textrank_keywords",
    "streaming_hll_registers",
    "events_zorder_box",
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

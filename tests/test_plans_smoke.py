"""Smoke tests: every registered query runs at sf0.001 and returns a
stable, non-degenerate result. (Full oracle parity runs in
scripts/verify_local.py at sf0.01 — this is the fast gate.)"""

from __future__ import annotations

import pytest

from data_ingestion_din_spark.plans import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"

EXPECT_NONEMPTY = {
    "q1_pricing_summary",
    "top_customers_per_nation",
    "customer_running_revenue",
    "late_shipment_orders",
    "nation_customer_rollup",
    "segment_median_order",
    "events_tumbling_5min",
    "events_sessionized",
    "events_json_props",
    "doc_token_stats",
    "doc_fixed_chunks",
    "corpus_word_freq",
    "dedup_exact",
    "minhash_signatures",
    "similarity_topk",
    "embedding_label_centroids",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF)
    n = df.count()
    assert n >= 0
    if name in EXPECT_NONEMPTY:
        assert n > 0, f"{name} unexpectedly empty at sf0.001"


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    assert set(E.oracle_sql()) <= set(E.queries())

"""Plan-asserting tests for the 100 TB shuffle levers: bucketed
co-located joins (no Exchange) and salted skew-safe aggregation
(identical results to the direct groupBy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_din_spark.operators.colocate import (
    salted_agg_sum,
    write_bucketed,
)
from data_ingestion_din_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, "li_bucketed", "l_orderkey", 8)
    write_bucketed(orders, "ord_bucketed", "o_orderkey", 8)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_bucketed").join(
            spark.table("ord_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _executed_plan(joined)
        # co-located bucketed sides: sort-merge join with ZERO shuffle
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
        # and the same join WITHOUT bucketing does shuffle both sides
        li2 = load_table(spark, SF, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        ord2 = load_table(spark, SF, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        unbucketed = li2.join(
            ord2, F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert "Exchange" in _executed_plan(unbucketed)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_agg_has_no_exchange(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(li, "li_agg_bucketed", "l_orderkey", 8)
    try:
        agg = (
            spark.table("li_agg_bucketed")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        assert "Exchange" not in _executed_plan(agg), _executed_plan(agg)
        assert agg.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS li_agg_bucketed")


def test_salted_agg_matches_direct(spark):
    li = load_table(spark, SF, "lineitem")
    direct = (
        li.groupBy("l_returnflag")  # 3 distinct values: maximal skew key
        .agg(
            F.sum("l_quantity").alias("l_quantity"),
            F.sum("l_extendedprice").alias("l_extendedprice"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    salted = (
        salted_agg_sum(
            li, ["l_returnflag"], ["l_quantity", "l_extendedprice"], n_salts=7
        )
        .orderBy("l_returnflag")
        .collect()
    )
    assert [r.l_returnflag for r in direct] == [r.l_returnflag for r in salted]
    for d, s in zip(direct, salted):
        # sums of integer-valued / 2-decimal doubles: exact either path
        assert abs(d.l_quantity - s.l_quantity) < 1e-6
        assert abs(d.l_extendedprice - s.l_extendedprice) < 1e-4


def test_salted_partials_actually_split(spark):
    """The salt must split a hot key across multiple partial groups —
    otherwise the operator silently degenerates to the direct groupBy."""
    from data_ingestion_din_spark.operators.colocate import salt_col

    li = load_table(spark, SF, "lineitem").repartition(4)
    n_partials = (
        li.withColumn("_salt", salt_col(F.col("l_returnflag"), 7))
        .groupBy("l_returnflag", "_salt")
        .count()
        .count()
    )
    assert n_partials > 3  # more partial groups than distinct keys

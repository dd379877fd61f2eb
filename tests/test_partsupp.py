"""Derived-partsupp invariants (sources/partsupp.py): the view that
unlocks the TPC-H Q2/Q9/Q11/Q20 shapes must be a well-formed relation —
unique key, exactly the dbgen-spread suppliers per part, values in the
documented ranges — and deterministic across builds."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_din_spark.sources.partsupp import derived_partsupp
from data_ingestion_din_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_partsupp_key_unique_and_ranges(spark):
    ps = derived_partsupp(spark, SF).cache()
    try:
        total = ps.count()
        distinct_keys = ps.select("ps_partkey", "ps_suppkey").distinct().count()
        assert total == distinct_keys  # (partkey, suppkey) is a PK
        n_parts = load_table(spark, SF, "part").count()
        # ≤4 suppliers per part; at tiny S the dbgen spread can collide
        # (DISTINCT dedups, possibly down to 1) but never exceed 4
        per_part = ps.groupBy("ps_partkey").count()
        mm = per_part.agg(
            F.min("count").alias("lo"), F.max("count").alias("hi")
        ).first()
        assert 1 <= mm.lo and mm.hi <= 4
        assert per_part.count() == n_parts
        bad = ps.filter(
            (F.col("ps_availqty") < 1)
            | (F.col("ps_availqty") > 9999)
            | (F.col("ps_supplycost") < 1)
            | (F.col("ps_supplycost") > 1000)
        ).count()
        assert bad == 0
        # suppkeys land in the real supplier key space (0-based fixture)
        s_cnt = load_table(spark, SF, "supplier").count()
        oob = ps.filter(
            (F.col("ps_suppkey") < 0) | (F.col("ps_suppkey") >= s_cnt)
        ).count()
        assert oob == 0
    finally:
        ps.unpersist()


def test_partsupp_deterministic(spark):
    a = derived_partsupp(spark, SF)
    b = derived_partsupp(spark, SF)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0

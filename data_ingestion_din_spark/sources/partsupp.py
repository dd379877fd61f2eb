"""Derived ``partsupp`` view — deterministic on both engines.

The fixture ships no ``partsupp`` table, which blocked the four TPC-H
shapes that need one (Q2/Q9/Q11/Q20 — COVERAGE.md §relational). Both
engines can *derive* the same table from ``part`` + ``supplier`` with
pure integer/md5 arithmetic, so the oracle gate still applies:

- each part gets 4 suppliers via the public TPC-H dbgen spread
  ``(p_partkey + i * (S//4 + p_partkey//S)) mod S`` for ``i`` in 0..3
  (keys here are 0-based, matching the fixture) — deterministic integer
  math, identical in Spark (``div``/``%``) and DuckDB (``//``/``%``).
  At tiny S the spread can collide; a DISTINCT keeps the row set
  well-defined identically on both sides (availqty/supplycost are
  functions of the key, so colliding rows are bit-identical).
- ``ps_availqty`` (1..9999) and ``ps_supplycost`` (1..1000, whole
  units so all money math stays in exact DECIMAL/BIGINT) come from the
  portable md5-based ``h64`` (functions/hashing.py).

Scale posture: the derivation is a narrow 4× row multiplication over the
``part`` scan (two broadcast sides: a 4-row range and a 1-row count) —
no data shuffle except the DISTINCT, which at production S (≥100) never
removes anything and would be dropped in a real deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_din_spark.functions.hashing import h64, h64_sql
from data_ingestion_din_spark.sources.tables import load_table

_AQ_EXPR = (
    "CAST(ps_partkey AS VARCHAR) || ':' || CAST(ps_suppkey AS VARCHAR) || ':aq'"
)
_SC_EXPR = (
    "CAST(ps_partkey AS VARCHAR) || ':' || CAST(ps_suppkey AS VARCHAR) || ':sc'"
)

# DuckDB WITH-clause fragment (no leading WITH): oracles compose it as
# f"WITH {PARTSUPP_CTE}, ..." so `partsupp` is queryable by name.
PARTSUPP_CTE = f"""
  s_c AS (SELECT CAST(count(*) AS BIGINT) AS s_cnt FROM supplier),
  ps0 AS (
    SELECT DISTINCT
      p_partkey AS ps_partkey,
      (p_partkey + i * ((s_cnt // 4) + (p_partkey // s_cnt))) % s_cnt
        AS ps_suppkey
    FROM part, range(0, 4) nums(i), s_c
  ),
  partsupp AS (
    SELECT ps_partkey, ps_suppkey,
           ({h64_sql(_AQ_EXPR)} % 9999) + 1 AS ps_availqty,
           ({h64_sql(_SC_EXPR)} % 1000) + 1 AS ps_supplycost
    FROM ps0
  )
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :data:`PARTSUPP_CTE`: columns ``ps_partkey,
    ps_suppkey, ps_availqty, ps_supplycost`` (all BIGINT)."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    s_cnt = (
        load_table(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).cast("bigint").alias("s_cnt"))
    )
    nums = spark.range(0, 4).select(F.col("id").alias("i"))
    ps0 = (
        part.crossJoin(F.broadcast(nums))
        .crossJoin(F.broadcast(s_cnt))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            (
                (
                    F.col("p_partkey")
                    + F.col("i")
                    * (
                        F.expr("s_cnt div 4")
                        + F.expr("p_partkey div s_cnt")
                    )
                )
                % F.col("s_cnt")
            ).alias("ps_suppkey"),
        )
        .distinct()
    )
    key = F.concat(
        F.col("ps_partkey").cast("string"),
        F.lit(":"),
        F.col("ps_suppkey").cast("string"),
    )
    return ps0.select(
        "ps_partkey",
        "ps_suppkey",
        (h64(F.concat(key, F.lit(":aq"))) % 9999 + 1).alias("ps_availqty"),
        (h64(F.concat(key, F.lit(":sc"))) % 1000 + 1).alias("ps_supplycost"),
    )

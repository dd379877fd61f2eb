"""Parquet table catalog for the synthetic fixture star schema.

The driver generates TPC-H-ish tables plus ``events`` (stream fixture),
``documents`` (parsed-document stand-in — reference ``TextBlock.content``,
ingestion/schema.py:109) and ``embeddings`` (chunk-embedding records —
reference backend/services/embeddings.py:74-110). See TESTDATA.md.

At 100 TB these would be partitioned/Delta tables; the loader is the single
place that changes — every downstream operator is a pure DataFrame function.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain parquet scan → full predicate pushdown
    and column pruning apply to everything built on top.

    ``events.ts`` is normalized to a session-timezone TimestampType (LTZ)
    whatever the fixture generation wrote:

    - TIMESTAMP(NANOS) (fixtures through round 2): Spark reads it as a
      nanosecond LONG under ``spark.sql.legacy.parquet.nanosAsLong``
      (set at runtime so query functions are self-sufficient on ANY
      session; without it the read throws PARQUET_TYPE_ILLEGAL) and the
      long is converted to µs timestamps (generator emits µs-aligned
      values — lossless).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) (round-3 fixtures): Spark
      reads TIMESTAMP_NTZ; cast to LTZ. Sessions here run with UTC
      session timezone (session.py), so the naive values are interpreted
      as UTC — exactly how the DuckDB oracle reads the same file — and
      the cast round-trips losslessly under any session timezone
      (interpret and render use the same zone).

    Downstream operators therefore always see TimestampType and may use
    LTZ-only expressions (``unix_micros``, ``window``)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def scan_parallel(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Restore parallelism after a non-splittable small-file scan.

    The local fixtures are single-row-group parquet files, so Spark maps
    each scan to ONE task no matter what ``maxPartitionBytes`` says
    (parquet splits only at row-group boundaries) — any expression-heavy
    operator downstream then runs single-threaded. This helper shuffles
    to the session's default parallelism ONLY when the scan produced
    fewer partitions; on a production multi-file / multi-row-group table
    (the 100 TB shape) it is a no-op, so plans keep their shuffle-free
    scans at scale. Use it in compute-bound operators (hashing,
    signatures, per-cell parsing), not cheap projections."""
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load all fixture tables; optionally register each as a temp view so
    SQL-form plans can refer to them by name."""
    dfs: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs

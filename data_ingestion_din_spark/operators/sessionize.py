"""Sessionization: ordered runs with carried state → group ids.

The reference's most distinctive operator family (SURVEY.md §2.6): adjacent
block merge (W4, ingestion/pdf_parser.py:184-254), semantic chunk grouping
(W5, backend/services/chunking.py:216-298), header-row sub-table split (W6,
ingestion/table_extractor.py:316-338) are all the same shape — a scan in a
defined order where some predicate starts a new group. The classic Spark
formulation: lag → break flag → running sum = group id. One shuffle on the
partition key; arbitrarily many rows per partition stream through.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def assign_groups(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    break_when: Column,
    group_col: str = "group_id",
) -> DataFrame:
    """Add ``group_col``: running count of break flags within each
    partition. ``break_when`` may reference lag()-derived columns the
    caller prepared; a null break flag (first row) starts group 1."""
    w_ord = W.partitionBy(*partition_cols).orderBy(*order_cols)
    w_run = w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    flag = F.when(break_when.isNull() | break_when, F.lit(1)).otherwise(F.lit(0))
    return df.withColumn(group_col, F.sum(flag).over(w_run))


def sessionize_by_gap(
    df: DataFrame,
    partition_cols: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
    order_tiebreak: Sequence[str] = (),
    group_col: str = "session_seq",
) -> DataFrame:
    """Gap-based sessionization (batch twin of streaming
    ``session_window``): a new session starts when the time since the
    previous row exceeds ``gap``."""
    # Accept both singular and plural units — streaming session_window's
    # interval grammar allows "1 minute", so the batch twin must too.
    n, unit = gap.split()
    per = {"second": 1, "minute": 60, "hour": 3600}[unit.rstrip("s")]
    gap_us = int(n) * per * 1_000_000
    order = [F.col(ts_col), *[F.col(c) for c in order_tiebreak]]
    w_ord = W.partitionBy(*partition_cols).orderBy(*order)
    delta = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.lag(ts_col).over(w_ord)
    )
    return assign_groups(
        df, partition_cols, order, delta > gap_us, group_col=group_col
    )

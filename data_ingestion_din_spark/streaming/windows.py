"""Structured Streaming window operators over the events stream.

The reference has no streaming surface (SURVEY.md §2.11) — ingestion is
per-upload subprocess orchestration. These are the Spark-native stream
operators the north star requires: tumbling/sliding window aggregates
with watermark-based late-data handling, and gap sessionization via
``session_window``.

Each function takes a *streaming* DataFrame with the events schema
(ts timestamp, user_id long, event_type string, value double) and returns
the transformed streaming DataFrame — pure logical-plan functions, so the
identical code path also accepts a batch DataFrame (Spark's unified
semantics), which is how the batch twins in plans/events.py stay in sync.

Scale notes: watermarks bound state (old windows are evicted once the
watermark passes); state lives in the state store keyed by (window, keys),
partitioned by the grouping key — no driver-side state, arbitrary
key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window per-type counts+sums; late rows beyond the
    watermark are dropped (streaming) / included (batch)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            F.col("total_value").cast("double").alias("total_value"),
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions via native ``session_window`` — the streaming
    twin of operators/sessionize.sessionize_by_gap (which implements the
    same semantics with lag+cumsum for batch/oracle checking)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )

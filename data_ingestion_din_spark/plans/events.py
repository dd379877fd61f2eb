"""Event-stream operators in batch form: windows, sessions, JSON, pivot.

The reference has no streaming surface (SURVEY.md §2.11) — these are the
net-new stream-table operators required by the north star, expressed here
as batch plans over the ``events`` fixture so the DuckDB oracle can check
them; `streaming/windows.py` runs the same logic as Structured Streaming
with watermarks.

Windows are epoch-aligned (Spark `F.window` semantics); the oracles
reproduce the alignment arithmetic explicitly with integer-microsecond
math (`unix_micros`/`epoch_us`) so both engines bucket identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from data_ingestion_din_spark.functions.hashing import h64_sql
from data_ingestion_din_spark.plans._exact import dec_to_double, dec_to_double_sql
from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.sources.tables import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _dec2(c):
    return F.col(c).cast("decimal(12,2)")


# --------------------------------------------------------------------------
# events_tumbling_5min — tumbling-window aggregate (streaming §2.11 analog).
# Spark: F.window(ts, "5 minutes"); oracle reproduces epoch alignment.
# --------------------------------------------------------------------------
@query(
    "events_tumbling_5min",
    oracle="""
    SELECT
      make_timestamp((epoch_us(ts) // 300000000) * 300000000) AS window_start,
      event_type,
      CAST(count(*) AS BIGINT) AS n_events,
      (CAST((sum(CAST(value AS DECIMAL(12,2)))) * 100 AS BIGINT) / 100.0) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_to_double(F.sum(_dec2("value")), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# events_sliding_10min — sliding window (10 min length, 5 min slide): each
# event lands in exactly two windows. Oracle materializes both candidate
# starts per event (s1 = floor(t/300)*300, s2 = s1-300).
# --------------------------------------------------------------------------
@query(
    "events_sliding_10min",
    oracle="""
    WITH expanded AS (
      SELECT make_timestamp((((epoch_us(ts) // 300000000) - off) * 300) * 1000000)
               AS window_start,
             value
      FROM events, (VALUES (0), (1)) AS offs(off)
    )
    SELECT window_start,
           CAST(count(*) AS BIGINT) AS n_events,
           (CAST((sum(CAST(value AS DECIMAL(12,2)))) * 100 AS BIGINT) / 100.0) AS total_value
    FROM expanded
    GROUP BY 1
    ORDER BY 1
    """,
)
def events_sliding_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_to_double(F.sum(_dec2("value")), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


# --------------------------------------------------------------------------
# events_sessionized — sessionization via lag + cumulative break-flag sum
# (the same pattern as the reference's adjacent-block merge W4,
# ingestion/pdf_parser.py:184-254, and chunk grouping W5,
# backend/services/chunking.py:216-298). Gap threshold 30 minutes.
# --------------------------------------------------------------------------
@query(
    "events_sessionized",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts)
                       - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, event_id, value,
             sum(brk) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_seq
      FROM flagged
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           (CAST((sum(CAST(value AS DECIMAL(12,2)))) * 100 AS BIGINT) / 100.0) AS total_value
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w_ord))
    flagged = ev.withColumn(
        "brk",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    sessions = flagged.withColumn("session_seq", F.sum("brk").over(w_run))
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            dec_to_double(F.sum(_dec2("value")), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("bigint").alias("session_seq"),
            "session_start",
            "session_end",
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_seq")
    )


# --------------------------------------------------------------------------
# events_json_props — JSON property extraction (`props` bag ↔ reference
# `extra: Dict[str,Any]` open property bag, ingestion/schema.py:114).
# --------------------------------------------------------------------------
@query(
    "events_json_props",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k", F.get_json_object(F.col("props"), "$.k").cast("bigint")
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("bigint").alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# events_type_pivot — pivot to one column per event type (reference has no
# pivot; SURVEY.md §2.5 notes it comes free with Spark SQL).
# --------------------------------------------------------------------------
@query(
    "events_type_pivot",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           CAST(count(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS click,
           CAST(count(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS error,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS signup,
           CAST(count(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS view
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pivoted = (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    cols = [F.col("user_bucket")] + [
        F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t) for t in EVENT_TYPES
    ]
    return pivoted.select(*cols).orderBy("user_bucket")


# --------------------------------------------------------------------------
# clicks_on_error_free_days — per-key anti join: click events on (user, day)
# pairs with no error event. Direct analog of the reference's J1
# camelot-vs-vision conflict resolution (keep vision tables only on pages
# where Camelot found nothing, ingestion/table_extractor.py:785-806).
# --------------------------------------------------------------------------
@query(
    "clicks_on_error_free_days",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           user_id,
           CAST(count(*) AS BIGINT) AS n_clicks
    FROM events e
    WHERE event_type = 'click'
      AND NOT EXISTS (
        SELECT 1 FROM events x
        WHERE x.event_type = 'error'
          AND x.user_id = e.user_id
          AND date_trunc('day', x.ts) = date_trunc('day', e.ts)
      )
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def clicks_on_error_free_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").withColumn(
        "day", F.to_date(F.date_trunc("day", "ts"))
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .distinct()
    )
    return (
        clicks.join(errors, ["user_id", "day"], "left_anti")
        .groupBy("day", "user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
        .select("day", "user_id", "n_clicks")
        .orderBy("day", "user_id")
    )


# --------------------------------------------------------------------------
# events_hourly_rollup — multi-resolution continuous-aggregate pattern
# (the "hypertable rollup"): the HOURLY aggregate is computed FROM the
# 5-minute partials, not from raw events. Decimal sums re-aggregate
# exactly (associative integer arithmetic), so rollup-of-partials ==
# direct-from-raw bit-for-bit — which is precisely what the oracle
# checks (it aggregates raw events straight to the hour). At 100 TB this
# is the incremental-maintenance shape: each new 5-min window lands as
# one partial row; the hour/day tiers re-aggregate partials at 1/12th /
# 1/288th the input volume, never rescanning raw history.
# --------------------------------------------------------------------------
@query(
    "events_hourly_rollup",
    oracle="""
    SELECT
      make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
        AS window_start,
      event_type,
      CAST(count(*) AS BIGINT) AS n_events,
      (CAST((sum(CAST(value AS DECIMAL(12,2)))) * 100 AS BIGINT) / 100.0)
        AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    partials_5min = ev.groupBy(
        F.window("ts", "5 minutes").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(12,2)")).alias("pv"),
    )
    return (
        partials_5min.groupBy(
            F.window(F.col("w.start"), "1 hour").alias("h"), "event_type"
        )
        .agg(
            F.sum("pn").cast("bigint").alias("n_events"),
            dec_to_double(F.sum("pv"), 2).alias("total_value"),
        )
        .select(
            F.col("h.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# events_5min_gapfill — time-series resample with gap filling + forward
# fill (the hypertable `time_bucket_gapfill`/`locf` shape). Per event
# type: complete 5-min grid between the type's first and last bucket
# (sequence → explode; grid size = time span / 5 min, independent of
# event volume), left join observed bucket aggregates, 0-fill counts,
# forward-fill the running value with last(ignorenulls) over the single
# (type, bucket) ordering. One shuffle for the bucket agg, one for the
# grid join — the ffill window reuses the join partitioning.
# --------------------------------------------------------------------------
_B5 = 300_000_000  # 5 minutes in microseconds


@query(
    "events_5min_gapfill",
    oracle=f"""
    WITH b AS (
      SELECT event_type, epoch_us(ts) // {_B5} AS k,
             CAST(value AS DECIMAL(12,2)) AS v
      FROM events
    ),
    agg AS (
      SELECT event_type, k, count(*) AS n, sum(v) AS tv
      FROM b GROUP BY 1, 2
    ),
    spans AS (SELECT event_type, min(k) AS k0, max(k) AS k1 FROM b GROUP BY 1),
    grid AS (SELECT event_type, unnest(range(k0, k1 + 1)) AS k FROM spans),
    j AS (
      SELECT g.event_type, g.k, coalesce(a.n, 0) AS n, a.tv
      FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.k = g.k
    )
    SELECT event_type,
           make_timestamp(k * {_B5}) AS bucket_start,
           CAST(n AS BIGINT) AS n_events,
           (CAST(last_value(tv IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY k) * 100 AS BIGINT)
            / 100.0) AS filled_value
    FROM j
    ORDER BY event_type, k
    """,
)
def events_5min_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.expr(f"unix_micros(ts) div {_B5}").alias("k"),
        _dec2("value").alias("v"),
    )
    agg = b.groupBy("event_type", "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("tv")
    )
    grid = (
        b.groupBy("event_type")
        .agg(F.min("k").alias("k0"), F.max("k").alias("k1"))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("k0"), F.col("k1"))).alias("k"),
        )
    )
    j = grid.join(agg, ["event_type", "k"], "left")
    ffill = W.partitionBy("event_type").orderBy("k").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        j.select(
            "event_type",
            F.timestamp_micros(F.col("k") * _B5).alias("bucket_start"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
            dec_to_double(
                F.last("tv", ignorenulls=True).over(ffill), 2
            ).alias("filled_value"),
            "k",
        )
        .orderBy("event_type", "k")
        .drop("k")
    )


# --------------------------------------------------------------------------
# events_daily_retention — cohort retention (first-seen day × day
# offset): the standard activation analytics shape. Two shuffles (per-
# user cohort, then the (cohort, offset) count); the activity set is
# day-distinct first, so the join carries (user, day), not raw events.
# --------------------------------------------------------------------------
@query(
    "events_daily_retention",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ),
    coh AS (SELECT user_id, min(d) AS cohort FROM act GROUP BY 1)
    SELECT coh.cohort AS cohort_day,
           CAST(date_diff('day', coh.cohort, act.d) AS INT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM act JOIN coh ON act.user_id = coh.user_id
    WHERE date_diff('day', coh.cohort, act.d) <= 7
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).distinct()
    coh = act.groupBy("user_id").agg(F.min("d").alias("cohort"))
    offset = F.datediff(F.col("d"), F.col("cohort"))
    return (
        act.join(coh, "user_id")
        .filter(offset <= 7)
        .groupBy(
            F.col("cohort").alias("cohort_day"),
            offset.cast("int").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


# --------------------------------------------------------------------------
# events_funnel — strictly-ordered 3-stage funnel (view → click →
# purchase, each stage after the previous user's first qualifying
# event). Single shuffle on user_id: three Window passes share the one
# partitioning (each stage's threshold is a column, so "click after
# first view" needs no self-join), then one global conditional count.
# The joins-per-stage formulation would shuffle events once PER stage.
# --------------------------------------------------------------------------
@query(
    "events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY 1
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_view_click,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_full_funnel
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    w = W.partitionBy("user_id")
    is_ = lambda t: F.col("event_type") == t  # noqa: E731
    staged = ev.withColumn(
        "t1", F.min(F.when(is_("view"), F.col("ts"))).over(w)
    )
    staged = staged.withColumn(
        "t2",
        F.min(
            F.when(is_("click") & (F.col("ts") > F.col("t1")), F.col("ts"))
        ).over(w),
    )
    staged = staged.withColumn(
        "t3",
        F.min(
            F.when(is_("purchase") & (F.col("ts") > F.col("t2")), F.col("ts"))
        ).over(w),
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return per_user.agg(
        F.count(F.col("t1")).cast("bigint").alias("n_view"),
        F.count(F.col("t2")).cast("bigint").alias("n_view_click"),
        F.count(F.col("t3")).cast("bigint").alias("n_full_funnel"),
    )


# --------------------------------------------------------------------------
# events_kmv_distinct — a SKETCH under the hash gate: K-minimum-values
# distinct-count estimation (k = 64) of users per event type, next to
# the exact count. Unlike HLL, KMV over the portable md5-derived h64 is
# bit-deterministic, so the ESTIMATE itself is oracle-checked — the
# sketch-capability demonstration that approx_count_distinct can't give
# (engine-specific HLL state). At scale the k smallest hashes per group
# come from a partial TakeOrderedAndProject-style agg; the estimator
# reads ONE row per group: est = (k−1) / (h_k / 2^60), or the exact
# count when the group has fewer than k distinct values.
# --------------------------------------------------------------------------
_KMV_K = 64
_H60 = float(1 << 60)


@query(
    "events_kmv_distinct",
    oracle=f"""
    WITH uh AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events
    ),
    ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n_h
      FROM uh
    ),
    kth AS (
      SELECT event_type, h, n_h FROM ranked
      WHERE rn = least({_KMV_K}, n_h)
    )
    SELECT event_type,
           CAST(n_h AS BIGINT) AS n_exact,
           round(CASE WHEN n_h < {_KMV_K} THEN CAST(n_h AS DOUBLE)
                      ELSE {_KMV_K - 1}.0 * {_H60!r} / CAST(h AS DOUBLE) END,
                 4) AS kmv_estimate
    FROM kth
    ORDER BY event_type
    """,
)
def events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.hashing import h64

    ev = load_table(spark, sf_dir, "events")
    uh = ev.select(
        "event_type",
        h64(F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))).alias(
            "h"
        ),
    ).distinct()
    wn = W.partitionBy("event_type").orderBy("h")
    wc = W.partitionBy("event_type")
    ranked = uh.select(
        "event_type",
        "h",
        F.row_number().over(wn).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_h"),
    )
    kth = ranked.filter(F.col("rn") == F.least(F.lit(_KMV_K), F.col("n_h")))
    est = F.when(
        F.col("n_h") < _KMV_K, F.col("n_h").cast("double")
    ).otherwise(
        F.lit(float(_KMV_K - 1)) * F.lit(_H60) / F.col("h").cast("double")
    )
    return kth.select(
        "event_type",
        F.col("n_h").cast("bigint").alias("n_exact"),
        F.round(est, 4).alias("kmv_estimate"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# events_trailing_hour — event-time RANGE window frame (trailing 1 hour
# per event type): every event annotated with the count and decimal-
# exact value sum of the preceding hour. RANGE frames bound by TIME, not
# row count — the rate-limit / rolling-load shape that ROWS frames get
# wrong under uneven event density. Ordering key is integer µs on both
# engines so frame edges are bit-identical.
# --------------------------------------------------------------------------
_HOUR_US = 3_600_000_000


@query(
    "events_trailing_hour",
    oracle=f"""
    SELECT event_id,
           event_type,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           (CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w * 100 AS BIGINT)
            / 100.0) AS value_last_hour
    FROM events
    WINDOW w AS (
      PARTITION BY event_type ORDER BY epoch_us(ts)
      RANGE BETWEEN {_HOUR_US} PRECEDING AND CURRENT ROW
    )
    ORDER BY event_id
    """,
)
def events_trailing_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-_HOUR_US, 0)
    )
    return (
        ev.select(
            "event_id",
            "event_type",
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_last_hour"),
            dec_to_double(F.sum(_dec2("value")).over(w), 2).alias(
                "value_last_hour"
            ),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# events_pivot_unpivot — wide⇄long round trip: pivot daily totals to one
# column per event type, then UNPIVOT back to long form. The oracle is
# the direct long-form aggregation — parity proves the round trip is
# lossless (decimal-exact cells; absent combinations surface as NULL
# cells and are dropped on the way back, exactly the rows the direct
# aggregation never had).
# --------------------------------------------------------------------------
@query(
    "events_pivot_unpivot",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           event_type,
           (CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) / 100.0)
             AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.sum(_dec2("value")))
    )
    long = pivoted.unpivot(
        ["day"], list(EVENT_TYPES), "event_type", "total"
    )
    return (
        long.filter(F.col("total").isNotNull())
        .select(
            "day",
            "event_type",
            dec_to_double(F.col("total"), 2).alias("total_value"),
        )
        .orderBy("day", "event_type")
    )


# --------------------------------------------------------------------------
# events_latest_snapshot — CDC/upsert compaction: the LATEST event per
# (user_id, event_type) key, ties on ts broken by event_id (the
# SCD-type-1 "current state" materialization every change-log consumer
# runs). One shuffle on the key; row_number + rk=1, which Spark executes
# as a partial top-1 per key inside the window — at changelog scale this
# is the standard log→snapshot compaction and partitions by the same
# key the downstream upsert join uses.
# --------------------------------------------------------------------------
@query(
    "events_latest_snapshot",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, event_id, ts, value,
             row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC
             ) AS rk
      FROM events
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
           CAST(event_id AS BIGINT) AS event_id,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           value
    FROM ranked WHERE rk = 1
    ORDER BY user_id, event_type
    """,
)
def events_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            "event_type",
            F.col("event_id").cast("bigint").alias("event_id"),
            F.unix_micros("ts").alias("ts_us"),
            "value",
        )
        .orderBy("user_id", "event_type")
    )


# --------------------------------------------------------------------------
# events_cohort_ltv — weekly-cohort revenue (the LTV table next to the
# count-based retention above): users grouped by first-seen week, then
# purchase revenue accumulated per (cohort week, week offset) with
# decimal-exact sums. Same two-shuffle shape as retention — the cohort
# map is per-user (broadcastable at any realistic user count), revenue
# rows join it without re-shuffling on anything wider than user_id.
# --------------------------------------------------------------------------
@query(
    "events_cohort_ltv",
    oracle="""
    WITH coh AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort FROM events
      GROUP BY user_id
    ),
    rev AS (
      SELECT e.user_id, coh.cohort,
             CAST(date_diff('week', coh.cohort,
                            date_trunc('week', e.ts)) AS INT) AS week_offset,
             CAST(e.value AS DECIMAL(12,2)) AS v
      FROM events e JOIN coh ON coh.user_id = e.user_id
      WHERE e.event_type = 'purchase'
    )
    SELECT cohort AS cohort_week, week_offset,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_buyers,
           (CAST(sum(v) * 100 AS BIGINT) / 100.0) AS revenue
    FROM rev
    GROUP BY cohort, week_offset
    ORDER BY cohort_week, week_offset
    """,
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.plans._exact import dec_to_double

    ev = load_table(spark, sf_dir, "events")
    coh = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(coh), "user_id")
        .select(
            "user_id",
            "cohort",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
            F.col("value").cast("decimal(12,2)").alias("v"),
        )
    )
    return (
        rev.groupBy(F.col("cohort").alias("cohort_week"), "week_offset")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.countDistinct("user_id").cast("bigint").alias("n_buyers"),
            dec_to_double(F.sum("v"), 2).alias("revenue"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------------------------------------
# events_dau_wau — daily actives + trailing-7-day actives (the DAU/WAU
# engagement pair). WAU needs a DISTINCT over a sliding window, which no
# window frame expresses directly; the scalable restatement: each
# (user, active day) row CONTRIBUTES to the 7 calendar days it is
# inside, so explode the contribution range and count distinct users
# per day. Shuffle volume is |user-days| × 7 narrow rows — independent
# of raw event volume (the distinct-by-day compaction runs first).
# Trailing days beyond the last activity day are clipped so every
# reported day is a real calendar day of the fixture.
# --------------------------------------------------------------------------
@query(
    "events_dau_wau",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ),
    bounds AS (SELECT max(d) AS dmax FROM act),
    contrib AS (
      SELECT a.user_id, a.d + to_days(CAST(o AS INT)) AS day
      FROM act a, unnest(range(0, 7)) t(o), bounds b
      WHERE a.d + to_days(CAST(o AS INT)) <= b.dmax
    ),
    wau AS (
      SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      FROM contrib GROUP BY day
    ),
    dau AS (
      SELECT d AS day, CAST(count(*) AS BIGINT) AS dau FROM act GROUP BY d
    )
    SELECT w.day, coalesce(d.dau, 0) AS dau, w.wau,
           CAST(coalesce(d.dau, 0) AS DOUBLE) / w.wau AS stickiness
    FROM wau w LEFT JOIN dau d ON d.day = w.day
    ORDER BY w.day
    """,
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).distinct()
    dmax = act.agg(F.max("d")).first()[0]  # setup scalar (1 row)
    contrib = (
        act.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
            "d",
        )
        .select(
            "user_id",
            F.date_add(F.col("d"), F.col("o")).cast("timestamp").alias("day"),
        )
        .filter(F.col("day") <= F.lit(dmax))
    )
    wau = contrib.groupBy("day").agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    dau = act.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    return (
        wau.join(dau, "day", "left")
        .select(
            "day",
            F.coalesce(F.col("dau"), F.lit(0)).cast("bigint").alias("dau"),
            "wau",
            (
                F.coalesce(F.col("dau"), F.lit(0)).cast("double")
                / F.col("wau")
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# events_hll_distinct — HyperLogLog distinct-count estimation per event
# type, the second sketch family next to events_kmv_distinct. Spark's
# approx_count_distinct is HLL++ with engine-private state, so instead
# the sketch is built from the portable md5-derived h64: bucket = low 6
# bits (m = 64 registers), register = max leading-zero rank of the
# remaining 54 bits. Ranks come from length(bin(w)) — identical minimal
# binary rendering in both engines — so the REGISTERS are integer-exact,
# and the harmonic mean is computed as a scaled-integer sum
# S = Σ 2^(32 − min(rank, 32)) (≤ 64·2^32, exact BIGINT in any
# summation order) with ONE final double division: the estimate itself
# sits under the hash gate. Raw HLL estimator, no small-range linear
# counting (that correction needs libm ln — documented exclusion, same
# rationale as sigmoid).
#
# Scale: the groupBy carries m·ranks integer state with map-side
# partial max — constant size per group regardless of cardinality; the
# rollup reads 64 rows per group. This is the shape approx_count_
# distinct executes, with every bit reproducible.
# --------------------------------------------------------------------------
_HLL_M = 64  # registers (p = 6)
# alpha_64 * m^2 * 2^32 — the estimator numerator, one double literal
_HLL_NUM = 0.709 * 64.0 * 64.0 * 4294967296.0


@query(
    "events_hll_distinct",
    oracle=f"""
    WITH uh AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events
    ),
    br AS (
      SELECT event_type,
             h % {_HLL_M} AS bucket,
             CASE WHEN h // {_HLL_M} = 0 THEN 55
                  ELSE 55 - length(bin(h // {_HLL_M})) END AS rnk
      FROM uh
    ),
    reg AS (
      SELECT event_type, bucket, max(rnk) AS r
      FROM br GROUP BY event_type, bucket
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_buckets,
             sum(CAST(1 AS BIGINT) << (32 - least(r, 32)))
               + ({_HLL_M} - count(*)) * 4294967296 AS s_scaled
      FROM reg GROUP BY event_type
    ),
    ex AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type
    )
    SELECT s.event_type, ex.n_exact, s.n_buckets,
           CAST(s.s_scaled AS BIGINT) AS s_scaled,
           round({_HLL_NUM!r} / CAST(s.s_scaled AS DOUBLE), 4)
             AS hll_estimate
    FROM s JOIN ex ON s.event_type = ex.event_type
    ORDER BY s.event_type
    """,
)
def events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.hashing import h64

    ev = load_table(spark, sf_dir, "events")
    uh = ev.select(
        "event_type",
        h64(F.concat(F.lit("hll:"), F.col("user_id").cast("string"))).alias(
            "h"
        ),
    ).distinct()
    # `h div m`, NOT h/m-and-cast: the double division would round a
    # 60-bit hash above 2^53 before the floor.
    w = F.expr(f"h div {_HLL_M}")
    br = uh.select(
        "event_type",
        F.pmod(F.col("h"), F.lit(_HLL_M)).alias("bucket"),
        F.when(w == 0, F.lit(55))
        .otherwise(F.lit(55) - F.length(F.bin(w)))
        .alias("rnk"),
    )
    reg = br.groupBy("event_type", "bucket").agg(F.max("rnk").alias("r"))
    s = reg.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 32 - least(r, 32))"))
            + (F.lit(_HLL_M) - F.count(F.lit(1))) * F.lit(4294967296)
        )
        .cast("bigint")
        .alias("s_scaled"),
    )
    ex = ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).cast("bigint").alias("n_exact")
    )
    return (
        s.join(ex, "event_type")
        .select(
            "event_type",
            "n_exact",
            "n_buckets",
            "s_scaled",
            F.round(
                F.lit(_HLL_NUM) / F.col("s_scaled").cast("double"), 4
            ).alias("hll_estimate"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# events_zorder_box — 2-D box query over the Z-ORDERED events layout
# (operators/colocate.zordered_events): a narrow user_id slice × a wide
# time slice, aggregated per event type with a decimal-exact value sum.
# The RESULT is layout-independent (the oracle filters the raw table) —
# what the layout changes is the SCAN: z-ordering makes each file's
# (user_id, ts) min/max a tight box, so this predicate skips most files
# on both dimensions where a time-sorted layout can only prune time
# (tests/test_colocate.py reads the parquet footers of both layouts and
# pins the skip-rate gap). Box bounds are integer fractions of the
# corpus min/max — deterministic in both engines, no driver constants.
# --------------------------------------------------------------------------
@query(
    "events_zorder_box",
    oracle=f"""
    WITH st AS (
      SELECT min(user_id) AS lo_u, max(user_id) AS hi_u,
             min(epoch_us(ts)) AS lo_t, max(epoch_us(ts)) AS hi_t
      FROM events
    ),
    box AS (
      SELECT lo_u + (hi_u - lo_u) * 2 // 5 AS u_lo,
             lo_u + (hi_u - lo_u) * 9 // 20 AS u_hi,
             lo_t + (hi_t - lo_t) * 1 // 4 AS t_lo,
             lo_t + (hi_t - lo_t) * 3 // 4 AS t_hi
      FROM st
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           {dec_to_double_sql("sum(CAST(value AS DECIMAL(18, 2)))", 2)}
             AS value_sum
    FROM events, box
    WHERE user_id BETWEEN u_lo AND u_hi
      AND epoch_us(ts) BETWEEN t_lo AND t_hi
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_zorder_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.operators.colocate import zordered_events
    from data_ingestion_din_spark.plans._exact import dec_to_double

    ev = spark.read.parquet(zordered_events(spark, sf_dir))
    st = ev.agg(
        F.min("user_id").alias("lo_u"),
        F.max("user_id").alias("hi_u"),
        F.min(F.unix_micros("ts")).alias("lo_t"),
        F.max(F.unix_micros("ts")).alias("hi_t"),
    )
    box = st.select(
        F.expr("lo_u + (hi_u - lo_u) * 2 div 5").alias("u_lo"),
        F.expr("lo_u + (hi_u - lo_u) * 9 div 20").alias("u_hi"),
        F.expr("lo_t + (hi_t - lo_t) * 1 div 4").alias("t_lo"),
        F.expr("lo_t + (hi_t - lo_t) * 3 div 4").alias("t_hi"),
    )
    return (
        ev.crossJoin(F.broadcast(box))
        .filter(
            F.col("user_id").between(F.col("u_lo"), F.col("u_hi"))
            & F.unix_micros(F.col("ts")).between(
                F.col("t_lo"), F.col("t_hi")
            )
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            dec_to_double(
                F.sum(F.col("value").cast("decimal(18,2)")), 2
            ).alias("value_sum"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# events_scd2_intervals — slowly-changing-dimension type-2 history build,
# the interval sibling of events_latest_snapshot's type-1 compaction:
# per user the event stream is change-detected on event_type (lag ≠
# current opens a version), consecutive same-state events collapse into
# one version row, and each version carries [valid_from, valid_to)
# micro-second bounds (valid_to = next version's open, NULL = current).
# This is the changelog→dimension-history materialization every
# warehouse upsert pipeline runs.
#
# Scale: ONE shuffle on user_id serves the lag, the cumulative version
# counter, and the lead — three window passes over the same partitioning
# (Spark reuses the exchange), then a (user_id, version) aggregation
# that is partition-local. Output is a deterministic 1/7 user sample
# (h64 gate — the inspection slice; the full history is sink-bound at
# corpus scale, same convention as corpus_stratified_sample).
# --------------------------------------------------------------------------
@query(
    "events_scd2_intervals",
    oracle=f"""
    WITH sampled AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
      FROM events
      WHERE {h64_sql("'scd:' || CAST(user_id AS VARCHAR)")} % 7 = 0
    ),
    chg AS (
      SELECT user_id, event_id, event_type, ts_us,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS opens
      FROM sampled
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    ver AS (
      SELECT user_id, event_id, event_type, ts_us,
             sum(opens) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS UNBOUNDED PRECEDING) AS version
      FROM chg
    ),
    grp AS (
      SELECT user_id, CAST(version AS INT) AS version,
             any_value(event_type) AS state,
             CAST(min(ts_us) AS BIGINT) AS valid_from,
             CAST(count(*) AS BIGINT) AS n_events
      FROM ver GROUP BY user_id, version
    )
    SELECT user_id, version, state, valid_from,
           CAST(lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
                AS BIGINT) AS valid_to,
           CASE WHEN lead(valid_from) OVER (PARTITION BY user_id
                                            ORDER BY version) IS NULL
                THEN 1 ELSE 0 END AS is_current,
           n_events
    FROM grp
    ORDER BY user_id, version
    """,
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.hashing import h64

    ev = load_table(spark, sf_dir, "events")
    sampled = ev.filter(
        h64(F.concat(F.lit("scd:"), F.col("user_id").cast("string"))) % 7
        == 0
    ).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    wo = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    chg = sampled.withColumn(
        "opens",
        F.when(
            ~F.lag("event_type").over(wo).eqNullSafe(F.col("event_type")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    ver = chg.withColumn(
        "version",
        F.sum("opens").over(wo.rowsBetween(W.unboundedPreceding, 0)),
    )
    grp = ver.groupBy("user_id", F.col("version").cast("int").alias("version")).agg(
        F.first("event_type").alias("state"),
        F.min("ts_us").cast("bigint").alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    wv = W.partitionBy("user_id").orderBy("version")
    return (
        grp.select(
            "user_id",
            "version",
            "state",
            "valid_from",
            F.lead("valid_from").over(wv).cast("bigint").alias("valid_to"),
            F.when(F.lead("valid_from").over(wv).isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_current"),
            "n_events",
        )
        .orderBy("user_id", "version")
    )


# --------------------------------------------------------------------------
# events_histogram_quantiles — equi-width histogram quantile sketch, the
# approximate-percentile shape of Spark's approx_percentile / DuckDB's
# approx_quantile with every bit reproducible (both engines' native
# sketches carry engine-private t-digest/GK state — same exclusion
# rationale as the HLL/CMS/KMV family). Values go through the proven
# DECIMAL(12,2) cast to integer cents; per event type a B=32-bucket
# histogram over [lo, hi] cents is built with integer bucket indexing
# ((v-lo)*B div span), and p50/p95/p99 are answered from the histogram
# by cumulative-count bucket location + integer linear interpolation
# inside the bucket. The exact order statistic (r-th smallest) rides
# along so the sketch ERROR is itself under the hash gate.
#
# Scale: the sketch path is one (type, bucket) aggregation — ≤ B rows of
# state per type with map-side partial counts, then a ≤B-row window; the
# exact path needs the full per-type sort and exists only as the audit
# column (at 100 TB you'd drop it and keep the histogram, which is the
# point of the sketch).
# --------------------------------------------------------------------------
_HQ_B = 32  # buckets
_HQ_PS = (50, 95, 99)


@query(
    "events_histogram_quantiles",
    oracle=f"""
    WITH cents AS (
      SELECT event_type, event_id,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
      FROM events
    ),
    st AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             min(v) AS lo, max(v) AS hi, max(v) - min(v) + 1 AS span
      FROM cents GROUP BY event_type
    ),
    hist AS (
      SELECT c.event_type,
             CAST(((c.v - st.lo) * {_HQ_B}) // st.span AS INT) AS idx,
             CAST(count(*) AS BIGINT) AS cnt
      FROM cents c JOIN st USING (event_type)
      GROUP BY c.event_type, idx
    ),
    cum AS (
      SELECT event_type, idx, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY idx
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM hist
    ),
    targets AS (
      SELECT st.event_type, st.n, st.lo, st.span, p.p,
             (st.n * p.p + 99) // 100 AS r
      FROM st CROSS JOIN (VALUES (50), (95), (99)) p(p)
    ),
    located AS (
      SELECT t.event_type, t.p, t.n, t.r, c.idx, c.cnt,
             c.cum - c.cnt AS cum_prev,
             t.lo + (c.idx * t.span) // {_HQ_B} AS b_lo,
             t.lo + ((c.idx + 1) * t.span) // {_HQ_B} AS b_hi
      FROM targets t JOIN cum c
        ON c.event_type = t.event_type
       AND c.cum >= t.r AND c.cum - c.cnt < t.r
    ),
    ranked AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY v, event_id) AS rn
      FROM cents
    )
    SELECT l.event_type, CAST(l.p AS INT) AS p, l.n, l.r,
           CAST(l.idx AS INT) AS bucket,
           CAST(l.b_lo + ((l.r - l.cum_prev) * (l.b_hi - l.b_lo)) // l.cnt
                AS BIGINT) AS est_cents,
           rk.v AS exact_cents,
           round(CAST(l.b_lo + ((l.r - l.cum_prev) * (l.b_hi - l.b_lo))
                        // l.cnt - rk.v AS DOUBLE) / 100, 2) AS err
    FROM located l
    JOIN ranked rk ON rk.event_type = l.event_type AND rk.rn = l.r
    ORDER BY l.event_type, p
    """,
)
def events_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = ev.select(
        "event_type",
        "event_id",
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("v"),
    )
    st = cents.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        (F.max("v") - F.min("v") + 1).alias("span"),
    )
    hist = (
        cents.join(F.broadcast(st), "event_type")
        .select(
            "event_type",
            F.expr(f"CAST(((v - lo) * {_HQ_B}) div span AS INT)").alias(
                "idx"
            ),
        )
        .groupBy("event_type", "idx")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            W.partitionBy("event_type")
            .orderBy("idx")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    targets = st.select(
        "event_type",
        "n",
        "lo",
        "span",
        F.explode(F.array(*[F.lit(p) for p in _HQ_PS])).alias("p"),
    ).withColumn("r", F.expr("(n * p + 99) div 100"))
    located = targets.join(
        cum.select(
            F.col("event_type").alias("c_type"), "idx", "cnt", "cum"
        ),
        (F.col("c_type") == F.col("event_type"))
        & (F.col("cum") >= F.col("r"))
        & (F.col("cum") - F.col("cnt") < F.col("r")),
    ).select(
        "event_type",
        "p",
        "n",
        "r",
        "idx",
        "cnt",
        (F.col("cum") - F.col("cnt")).alias("cum_prev"),
        F.expr(f"lo + (idx * span) div {_HQ_B}").alias("b_lo"),
        F.expr(f"lo + ((idx + 1) * span) div {_HQ_B}").alias("b_hi"),
    )
    ranked = cents.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("event_type").orderBy("v", "event_id")
        ),
    ).select(F.col("event_type").alias("r_type"), "v", "rn")
    est = F.expr("b_lo + ((r - cum_prev) * (b_hi - b_lo)) div cnt")
    return (
        located.join(
            ranked,
            (F.col("r_type") == F.col("event_type"))
            & (F.col("rn") == F.col("r")),
        )
        .select(
            "event_type",
            F.col("p").cast("int").alias("p"),
            "n",
            "r",
            F.col("idx").cast("int").alias("bucket"),
            est.cast("bigint").alias("est_cents"),
            F.col("v").alias("exact_cents"),
            F.round((est - F.col("v")).cast("double") / 100, 2).alias(
                "err"
            ),
        )
        .orderBy("event_type", "p")
    )


# --------------------------------------------------------------------------
# events_interval_overlap_join — the interval OVERLAP join Spark has no
# native operator for (DuckDB/Postgres express it as a theta range
# join): per-user daily activity intervals [first event, last event]
# joined against corpus-wide error-incident hours (hours with >= 6
# 'error' events, a half-open [h, h+1h) window). A naive Spark
# formulation is a cross join + theta filter — O(intervals × incidents)
# and a BroadcastNestedLoopJoin at scale. The scale-correct plan used
# here bins TIME: each activity interval explodes into the hour bins it
# spans (sequence + explode — bounded by interval length), incidents
# carry their hour bin natively, and the join becomes a plain EQUI-join
# on the bin followed by the exact overlap predicate (s_end >= h AND
# s_start < h + 1h). One shuffle keyed by hour; no nested-loop join —
# asserted in tests. Output: per (user, day) the number of distinct
# incident hours the user's activity overlapped and the total error
# volume of those hours — exact integers.
# --------------------------------------------------------------------------
_IOJ_THRESH = 6


@query(
    "events_interval_overlap_join",
    oracle=f"""
    WITH s AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             min(ts) AS s_start, max(ts) AS s_end
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    inc AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS n_err
      FROM events WHERE event_type = 'error'
      GROUP BY date_trunc('hour', ts)
      HAVING count(*) >= {_IOJ_THRESH}
    )
    SELECT s.user_id, s.day,
           CAST(count(*) AS BIGINT) AS n_incident_hours,
           CAST(sum(i.n_err) AS BIGINT) AS incident_errors
    FROM s JOIN inc i
      ON s.s_end >= i.h AND s.s_start < i.h + INTERVAL 1 HOUR
    GROUP BY s.user_id, s.day
    ORDER BY s.user_id, s.day
    """,
)
def events_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sessions = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    incidents = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_err"))
        .filter(F.col("n_err") >= _IOJ_THRESH)
    )
    # bin the interval into the hours it spans -> equi-join on the bin.
    # Every bin h in [trunc(s_start), trunc(s_end)] satisfies the exact
    # overlap predicate by construction; it is kept explicit so the
    # operator stays correct for interval sources whose bins over-cover.
    binned = sessions.select(
        "user_id",
        "day",
        "s_start",
        "s_end",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "s_start"),
                F.date_trunc("hour", "s_end"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("h"),
    )
    return (
        binned.join(incidents, "h")
        .filter(
            (F.col("s_end") >= F.col("h"))
            & (F.col("s_start") < F.col("h") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_incident_hours"),
            F.sum("n_err").cast("bigint").alias("incident_errors"),
        )
        .orderBy("user_id", "day")
    )


# --------------------------------------------------------------------------
# events_hll_precision_grid — the REGISTER-COUNT operating surface for
# the portable HLL above: m is the sketch's one knob (memory = m
# registers vs accuracy ~1.04/√m), and the RAW estimator (no
# LinearCounting — libm-ln exclusion, documented on the m=64 query)
# degrades exactly where n/m falls below ~2.5. One hash-gated row per
# m ∈ {16, 64, 256} over the corpus-wide distinct user_id: registers
# used, the exact scaled harmonic sum, the estimate, and the SIGNED
# per-mille error — so the table shows both the √m accuracy gain and
# the small-range blow-up that motivates HLL++'s bias correction
# (at sf0.01 n=150: m=256 puts n/m at 0.6, deep in the regime raw HLL
# overestimates; the error column is the measured case for the
# correction, not a prose claim). Same integer-register recipe as
# events_hll_distinct: rank = (61−p) − length(bin(h div m)), scaled
# sum S = Σ 2^(32−min(rank,32)) exact in BIGINT, one final double
# division per row with the alpha constant embedded as a literal.
#
# Scale: one distinct-hash pass feeds all three sketches (bucket/rank
# are per-m projections of the same h); register state is m rows per
# sketch regardless of cardinality.
# --------------------------------------------------------------------------
_HLL_GRID = (16, 64, 256)


def _hll_alpha(m: int) -> float:
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )


def _hll_grid_oracle() -> str:
    rows = []
    for m in _HLL_GRID:
        p = m.bit_length() - 1
        top = 61 - p
        num = _hll_alpha(m) * m * m * 4294967296.0
        rows.append(
            f"""SELECT {m} AS m,
           (SELECT CAST(count(*) AS BIGINT) FROM (
              SELECT h % {m} AS bucket FROM uh GROUP BY 1)) AS n_buckets,
           (SELECT sum(CAST(1 AS BIGINT) << (32 - least(r, 32)))
                   + ({m} - count(*)) * 4294967296
            FROM (SELECT h % {m} AS bucket,
                         max(CASE WHEN h // {m} = 0 THEN {top}
                              ELSE {top} - length(bin(h // {m})) END) AS r
                  FROM uh GROUP BY 1)) AS s_scaled,
           {num!r} AS est_num"""
        )
    body = "\n      UNION ALL\n      ".join(rows)
    return f"""
    WITH uh AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events
    ),
    ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM uh)
    SELECT CAST(m AS INT) AS m,
           ex.n_exact,
           CAST(n_buckets AS BIGINT) AS n_buckets,
           CAST(s_scaled AS BIGINT) AS s_scaled,
           round(est_num / CAST(s_scaled AS DOUBLE), 4) AS hll_estimate,
           round((est_num / CAST(s_scaled AS DOUBLE) - ex.n_exact)
                 * 1000.0 / ex.n_exact, 2) AS err_permille
    FROM ({body}) CROSS JOIN ex
    ORDER BY m
    """


@query("events_hll_precision_grid", oracle=_hll_grid_oracle())
def events_hll_precision_grid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from data_ingestion_din_spark.functions.hashing import h64

    ev = load_table(spark, sf_dir, "events")
    uh = (
        ev.select(
            h64(
                F.concat(F.lit("hll:"), F.col("user_id").cast("string"))
            ).alias("h")
        )
        .distinct()
        .localCheckpoint(eager=False)  # one hash pass feeds all three m
    )
    ex = uh.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    grid = None
    for m in _HLL_GRID:
        p = m.bit_length() - 1
        top = 61 - p
        num = _hll_alpha(m) * m * m * 4294967296.0
        w = F.expr(f"h div {m}")
        br = uh.select(
            F.pmod(F.col("h"), F.lit(m)).alias("bucket"),
            F.when(w == 0, F.lit(top))
            .otherwise(F.lit(top) - F.length(F.bin(w)))
            .alias("rnk"),
        )
        reg = br.groupBy("bucket").agg(F.max("rnk").alias("r"))
        s = reg.agg(
            F.lit(m).cast("int").alias("m"),
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            (
                F.sum(
                    F.expr("shiftleft(CAST(1 AS BIGINT), 32 - least(r, 32))")
                )
                + (F.lit(m) - F.count(F.lit(1))) * F.lit(4294967296)
            )
            .cast("bigint")
            .alias("s_scaled"),
            F.lit(num).alias("est_num"),
        )
        grid = s if grid is None else grid.unionByName(s)
    return (
        grid.crossJoin(ex)  # 1-row scalar attach
        .select(
            "m",
            "n_exact",
            "n_buckets",
            "s_scaled",
            F.round(
                F.col("est_num") / F.col("s_scaled").cast("double"), 4
            ).alias("hll_estimate"),
            F.round(
                (
                    F.col("est_num") / F.col("s_scaled").cast("double")
                    - F.col("n_exact")
                )
                * 1000.0
                / F.col("n_exact"),
                2,
            ).alias("err_permille"),
        )
        .orderBy("m")
    )


# --------------------------------------------------------------------------
# events_dynamic_gap_sessions — session windows with a PER-ROW gap
# (Spark 3.2's dynamic session_window(ts, gap_expr) — the API surface
# the fixed-gap sessionizers don't touch): an error event holds a
# session open for only 10 minutes, a click for 30, anything else 20 —
# the "different activity types time out differently" rule real
# sessionization uses. The native operator is gated against the
# first-principles oracle: a row MERGES into the running session iff
# its timestamp is <= the running max of (ts + gap) over preceding rows
# (equality merges — probed: per-row windows [ts, ts+gap) that TOUCH
# are one session), and the session end is max(ts + gap), not
# last-ts + last-gap. Both facts pinned empirically before writing the
# oracle (probe: rows at 0s/90s/140s with 100/50/100s gaps form ONE
# session ending at 240 — the 140s row sits exactly on the running end
# and still merges).
#
# Scale: the native form is one user_id shuffle with state merging in
# the agg; the oracle's lag/running-max form is the same shuffle plus
# a window sort — identical distribution story to events_sessionized.
# --------------------------------------------------------------------------
_DYN_GAPS = {"error": 600, "click": 1800}
_DYN_DEFAULT = 1200


@query(
    "events_dynamic_gap_sessions",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CAST(CASE event_type
                    WHEN 'error' THEN {_DYN_GAPS['error']}
                    WHEN 'click' THEN {_DYN_GAPS['click']}
                    ELSE {_DYN_DEFAULT} END AS BIGINT) * 1000000 AS gap_us,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
      FROM events
    ),
    flg AS (
      SELECT *,
             CASE WHEN us > coalesce(max(us + gap_us) OVER (
                    PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1)
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ),
    grp AS (
      SELECT *, sum(new_session) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flg
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(min(us) AS BIGINT) AS session_start_us,
           CAST(max(us + gap_us) AS BIGINT) AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(is_err) AS BIGINT) AS n_errors
    FROM grp GROUP BY user_id, session_no
    ORDER BY user_id, session_start_us
    """,
)
def events_dynamic_gap_sessions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    gap = (
        F.when(
            F.col("event_type") == "error",
            F.lit(f"{_DYN_GAPS['error']} seconds"),
        )
        .when(
            F.col("event_type") == "click",
            F.lit(f"{_DYN_GAPS['click']} seconds"),
        )
        .otherwise(F.lit(f"{_DYN_DEFAULT} seconds"))
    )
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum((F.col("event_type") == "error").cast("int"))
            .cast("bigint")
            .alias("n_errors"),
        )
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
            "n_errors",
        )
        .orderBy("user_id", "session_start_us")
    )


# --------------------------------------------------------------------------
# events_cdc_merge — MERGE INTO with tombstones, the change-data-capture
# apply step events_latest_snapshot only gestures at (latest-per-key is
# upsert compaction; real CDC also DELETES). Base = the latest-per-key
# snapshot of events with event_id < 2000; the CDC batch = the remaining
# rows THINNED to every third event_id (so some base keys see no batch
# row at all — the MERGE's untouched-key path), each carrying an op
# derived deterministically from its payload (props.k % 5 = 0 → 'D'
# tombstone, else 'U' upsert — ~20% deletes).
# Delta/Iceberg MERGE requires the source deduplicated on the key, so
# the batch first compacts to its last op per (user_id, event_type)
# (ts, event_id order — the same tie rule as the snapshot); then:
#   WHEN MATCHED     AND op='D'  → DELETE  (emitted as an audit row)
#   WHEN MATCHED     AND op='U'  → UPDATE
#   WHEN NOT MATCHED AND op='U'  → INSERT
#   WHEN NOT MATCHED AND op='D'  → no-op   (delete of absent key)
# Output is the merged snapshot plus the audit `action` column
# (kept/updated/inserted and the tombstoned keys as action='deleted'
# with NULL payload — the MERGE metrics row a lakehouse writer logs).
#
# Scale: one shuffle each to compact base and batch on the MERGE key,
# then a single full-outer equi-join on that key — the exact shape
# Delta's MERGE executes (no broadcast: both sides are data-sized; the
# join key is the partition key the downstream table is bucketed on).
# --------------------------------------------------------------------------
_CDC_SPLIT = 2000  # event_id below → base snapshot, above → CDC batch
# (2000 plus the %3 batch thinning leaves, at sf0.01, ~16 base keys
# untouched and ~46 batch keys unseen in the base, so every MERGE
# branch — kept/inserted/updated/deleted/no-op-delete — actually fires)


@query(
    "events_cdc_merge",
    oracle=f"""
    WITH base AS (
      SELECT user_id, event_type, event_id, ts, value FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id, event_type
          ORDER BY ts DESC, event_id DESC) AS rk
        FROM events WHERE event_id < {_CDC_SPLIT}
      ) WHERE rk = 1
    ),
    batch AS (
      SELECT user_id, event_type, event_id, ts, value,
             CASE WHEN CAST(regexp_extract(props, '\\d+') AS BIGINT)
                       % 5 = 0
                  THEN 'D' ELSE 'U' END AS op
      FROM events WHERE event_id >= {_CDC_SPLIT} AND event_id % 3 = 0
    ),
    src AS (
      SELECT user_id, event_type, event_id, ts, value, op FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id, event_type
          ORDER BY ts DESC, event_id DESC) AS rk
        FROM batch
      ) WHERE rk = 1
    ),
    merged AS (
      SELECT
        coalesce(b.user_id, s.user_id) AS user_id,
        coalesce(b.event_type, s.event_type) AS event_type,
        CASE WHEN s.op = 'D' THEN NULL
             WHEN s.op = 'U' THEN s.event_id
             ELSE b.event_id END AS event_id,
        CASE WHEN s.op = 'D' THEN NULL
             WHEN s.op = 'U' THEN epoch_us(s.ts)
             ELSE epoch_us(b.ts) END AS ts_us,
        CASE WHEN s.op = 'D' THEN NULL
             WHEN s.op = 'U' THEN s.value
             ELSE b.value END AS value,
        CASE
          WHEN s.op IS NULL THEN 'kept'
          WHEN s.op = 'D' AND b.user_id IS NOT NULL THEN 'deleted'
          WHEN s.op = 'D' THEN NULL
          WHEN b.user_id IS NULL THEN 'inserted'
          ELSE 'updated' END AS action
      FROM base b
      FULL OUTER JOIN src s
        ON s.user_id = b.user_id AND s.event_type = b.event_type
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
           CAST(event_id AS BIGINT) AS event_id,
           CAST(ts_us AS BIGINT) AS ts_us, value, action
    FROM merged WHERE action IS NOT NULL
    ORDER BY user_id, event_type
    """,
)
def events_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wkey = W.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    base = (
        ev.filter(F.col("event_id") < _CDC_SPLIT)
        .withColumn("rk", F.row_number().over(wkey))
        .filter(F.col("rk") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )
    src = (
        ev.filter(
            (F.col("event_id") >= _CDC_SPLIT)
            & (F.col("event_id") % 3 == 0)
        )
        .withColumn(
            "op",
            F.when(
                F.regexp_extract("props", r"\d+", 0).cast("bigint") % 5
                == 0,
                F.lit("D"),
            ).otherwise(F.lit("U")),
        )
        .withColumn("rk", F.row_number().over(wkey))
        .filter(F.col("rk") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value", "op")
    )
    b, s = base.alias("b"), src.alias("s")
    j = b.join(
        s,
        (F.col("s.user_id") == F.col("b.user_id"))
        & (F.col("s.event_type") == F.col("b.event_type")),
        "full_outer",
    )
    is_del = F.col("s.op") == "D"
    is_up = F.col("s.op") == "U"
    action = (
        F.when(F.col("s.op").isNull(), F.lit("kept"))
        .when(is_del & F.col("b.user_id").isNotNull(), F.lit("deleted"))
        .when(is_del, F.lit(None).cast("string"))
        .when(F.col("b.user_id").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
    )
    return (
        j.select(
            F.coalesce(F.col("b.user_id"), F.col("s.user_id"))
            .cast("bigint")
            .alias("user_id"),
            F.coalesce(F.col("b.event_type"), F.col("s.event_type")).alias(
                "event_type"
            ),
            F.when(is_del, F.lit(None).cast("bigint"))
            .when(is_up, F.col("s.event_id"))
            .otherwise(F.col("b.event_id"))
            .cast("bigint")
            .alias("event_id"),
            F.when(is_del, F.lit(None).cast("bigint"))
            .when(is_up, F.unix_micros(F.col("s.ts")))
            .otherwise(F.unix_micros(F.col("b.ts")))
            .alias("ts_us"),
            F.when(is_del, F.lit(None).cast("double"))
            .when(is_up, F.col("s.value"))
            .otherwise(F.col("b.value"))
            .alias("value"),
            action.alias("action"),
        )
        .filter(F.col("action").isNotNull())
        .orderBy("user_id", "event_type")
    )


# --------------------------------------------------------------------------
# events_funnel_windowed — the funnel above with a CONVERSION WINDOW,
# the knob every product-analytics funnel exposes (Amplitude/Mixpanel
# semantics): each stage must fire within T of the previous stage's
# first qualifying event, swept over T ∈ {600 s, 3600 s, ∞} so the
# window's bite is measured rather than assumed (∞ must reproduce
# events_funnel's numbers — the cross-query consistency row). Stage
# times stay "first qualifying event" (min ts after the previous
# stage, then the window test applied to that winner — the standard
# first-touch reading, not "first event inside the window").
#
# Measured (sf0.01): ∞ reproduces events_funnel verbatim (150/150/150
# — every user converts eventually on this fixture); T=3600 s keeps 3
# first-touch clicks and no purchases, T=600 s none (user event gaps
# are hours+ here) — the window knob flips this funnel from 1000‰ to
# 0‰, which is exactly why windowed and unwindowed funnels are
# different products.
#
# Scale: same single user_id shuffle as events_funnel — the window
# predicates are column comparisons inside the same three Window
# passes, once per swept T (the per-T passes share the one exchange).
# --------------------------------------------------------------------------
_FUNNEL_WINDOWS_S = (600, 3600, 0)  # 0 = unwindowed sentinel


@query(
    "events_funnel_windowed",
    oracle="""
    WITH t AS (
      SELECT * FROM (VALUES (600), (3600), (0)) w(win_s)
    ),
    v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT t.win_s, e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id CROSS JOIN t
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY 1, 2
      HAVING win_s = 0 OR epoch_us(min(e.ts)) - epoch_us(any_value(v.t1))
                          <= CAST(win_s AS BIGINT) * 1000000
    ),
    p AS (
      SELECT c.win_s, e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY 1, 2
      HAVING c.win_s = 0 OR epoch_us(min(e.ts)) - epoch_us(any_value(c.t2))
                            <= CAST(c.win_s AS BIGINT) * 1000000
    )
    SELECT CAST(t.win_s AS INT) AS win_s,
           (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
           CAST(coalesce(cc.n, 0) AS BIGINT) AS n_view_click,
           CAST(coalesce(pp.n, 0) AS BIGINT) AS n_full_funnel,
           CAST(coalesce(cc.n, 0) * 1000
                // (SELECT count(*) FROM v) AS BIGINT) AS click_milli,
           CAST(coalesce(pp.n, 0) * 1000
                // greatest(coalesce(cc.n, 0), 1) AS BIGINT)
             AS purchase_milli
    FROM t
    LEFT JOIN (SELECT win_s, count(*) AS n FROM c GROUP BY 1) cc
      ON cc.win_s = t.win_s
    LEFT JOIN (SELECT win_s, count(*) AS n FROM p GROUP BY 1) pp
      ON pp.win_s = t.win_s
    ORDER BY win_s
    """,
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    w = W.partitionBy("user_id")
    is_ = lambda t: F.col("event_type") == t  # noqa: E731
    staged = ev.withColumn(
        "t1", F.min(F.when(is_("view"), F.col("ts"))).over(w)
    )
    out = None
    n_view = staged.select(
        F.countDistinct(
            F.when(F.col("t1").isNotNull(), F.col("user_id"))
        ).cast("bigint").alias("n_view")
    )
    for win_s in _FUNNEL_WINDOWS_S:
        def in_win(later, earlier):
            if win_s == 0:
                return F.lit(True)
            return (
                F.unix_micros(later) - F.unix_micros(earlier)
                <= win_s * 1_000_000
            )

        s2 = staged.withColumn(
            "t2",
            F.min(
                F.when(
                    is_("click") & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        ).withColumn(
            "t2", F.when(in_win(F.col("t2"), F.col("t1")), F.col("t2"))
        )
        s3 = s2.withColumn(
            "t3",
            F.min(
                F.when(
                    is_("purchase") & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        ).withColumn(
            "t3", F.when(in_win(F.col("t3"), F.col("t2")), F.col("t3"))
        )
        counts = s3.agg(
            F.countDistinct(
                F.when(F.col("t2").isNotNull(), F.col("user_id"))
            ).cast("bigint").alias("n_view_click"),
            F.countDistinct(
                F.when(F.col("t3").isNotNull(), F.col("user_id"))
            ).cast("bigint").alias("n_full_funnel"),
        )
        row = (
            counts.crossJoin(n_view)
            .select(
                F.lit(win_s).cast("int").alias("win_s"),
                "n_view",
                "n_view_click",
                "n_full_funnel",
                F.expr("n_view_click * 1000 DIV n_view")
                .cast("bigint")
                .alias("click_milli"),
                F.expr(
                    "n_full_funnel * 1000 DIV greatest(n_view_click, 1)"
                )
                .cast("bigint")
                .alias("purchase_milli"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("win_s")


# --------------------------------------------------------------------------
# layout_zorder_pruning — the 2-D zone-map comparison as an ORACLE-
# CHECKED relation (events_zorder_box exercises the z-ordered layout
# and tests/test_colocate.py reads real parquet footers; this makes
# the pruning arithmetic itself hash-gated): events bucketed to 8-bit
# (user, time) coordinates, laid out in fixed 256-row bins under three
# orderings — time-sorted, user-sorted, and Morton (bit-interleaved
# z-order) — and probed with three box predicates (narrow-u × wide-t,
# wide-u × narrow-t, narrow × narrow). A bin is touched iff its
# per-bin [min,max] box overlaps the predicate box on BOTH dims. One
# row per (ordering, box): bins touched, rows scanned vs matching,
# amplification.
#
# Measured (sf0.01, 40 bins): each single-column sort reads 4/40 bins
# on its own orientation and 39/40 on the transpose (amplification
# 1235‰ vs 12637‰); z-order reads 9 and 12 — it does not beat a sort
# at its own game, it BOUNDS THE WORST CASE (≤12/40 everywhere, incl.
# 8/40 on the small box) — which is the actual operational claim for
# interleaved layout when query boxes come in both orientations.
#
# Scale: bins are pure window arithmetic (rank DIV 256) — the audit is
# metadata-sized; the Morton code is a 16-term integer expression.
# --------------------------------------------------------------------------
_ZP_BIN_ROWS = 256
_ZP_BOXES = [
    ("narrow_u", 100, 120, 0, 255),
    ("narrow_t", 0, 255, 100, 120),
    ("small", 100, 140, 100, 140),
]


def _zp_audit_tail_sql() -> str:
    """zones → boxes → match → final-projection oracle tail shared by
    layout_zorder_pruning and layout_hilbert_vs_zorder (expects a
    ``laid`` CTE of (ordering, ub, tb, bin) and a ``pts`` CTE)."""
    return f"""zones AS (
      SELECT ordering, bin,
             min(ub) AS u_mn, max(ub) AS u_mx,
             min(tb) AS t_mn, max(tb) AS t_mx,
             count(*) AS n_rows
      FROM laid GROUP BY ordering, bin
    ),
    boxes AS (
      SELECT * FROM (VALUES
        {", ".join(f"('{nm}', {ul}, {uh}, {tl}, {th})" for nm, ul, uh, tl, th in _ZP_BOXES)}
      ) b(box, u_lo, u_hi, t_lo, t_hi)
    ),
    match AS (
      SELECT b.box, CAST(count(*) AS BIGINT) AS rows_matching
      FROM pts p JOIN boxes b
        ON p.ub BETWEEN b.u_lo AND b.u_hi
       AND p.tb BETWEEN b.t_lo AND b.t_hi
      GROUP BY b.box
    )
    SELECT z.ordering, b.box AS box,
           CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(CASE WHEN z.u_mx >= b.u_lo AND z.u_mn <= b.u_hi
                          AND z.t_mx >= b.t_lo AND z.t_mn <= b.t_hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS bins_touched,
           any_value(m.rows_matching) AS rows_matching,
           CAST(sum(CASE WHEN z.u_mx >= b.u_lo AND z.u_mn <= b.u_hi
                          AND z.t_mx >= b.t_lo AND z.t_mn <= b.t_hi
                     THEN z.n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
           CAST(sum(CASE WHEN z.u_mx >= b.u_lo AND z.u_mn <= b.u_hi
                          AND z.t_mx >= b.t_lo AND z.t_mn <= b.t_hi
                     THEN z.n_rows ELSE 0 END) * 1000
                // greatest(any_value(m.rows_matching), 1) AS BIGINT)
             AS amplification_milli
    FROM zones z
    CROSS JOIN boxes b
    JOIN match m ON m.box = b.box
    GROUP BY z.ordering, b.box
    ORDER BY 1, 2"""


def _zp_pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, ub, tb) 8-bit bucket coordinates for the layout
    audits."""
    ev = load_table(spark, sf_dir, "events")
    st = ev.agg(
        F.min("user_id").alias("lo_u"),
        F.max("user_id").alias("hi_u"),
        F.min(F.unix_micros("ts")).alias("lo_t"),
        F.max(F.unix_micros("ts")).alias("hi_t"),
    )
    return (
        ev.crossJoin(F.broadcast(st))
        .select(
            "event_id",
            F.expr("(user_id - lo_u) * 256 DIV (hi_u - lo_u + 1)")
            .cast("bigint")
            .alias("ub"),
            F.expr(
                "(unix_micros(ts) - lo_t) * 256 DIV (hi_t - lo_t + 1)"
            )
            .cast("bigint")
            .alias("tb"),
        )
        .localCheckpoint(eager=False)
    )


def _zp_box_grid(pts: DataFrame, laid: DataFrame) -> DataFrame:
    """zones aggregate + per-box touched/scanned/amplification rows —
    the engine-side twin of :func:`_zp_audit_tail_sql`."""
    zones = laid.groupBy("ordering", "bin").agg(
        F.min("ub").alias("u_mn"),
        F.max("ub").alias("u_mx"),
        F.min("tb").alias("t_mn"),
        F.max("tb").alias("t_mx"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    grid = None
    for box, ul, uh, tl, th in _ZP_BOXES:
        rows_matching = pts.filter(
            F.col("ub").between(ul, uh) & F.col("tb").between(tl, th)
        ).count()
        touched = (
            (F.col("u_mx") >= ul)
            & (F.col("u_mn") <= uh)
            & (F.col("t_mx") >= tl)
            & (F.col("t_mn") <= th)
        )
        row = (
            zones.groupBy("ordering")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_bins"),
                F.sum(touched.cast("int")).cast("bigint").alias(
                    "bins_touched"
                ),
                F.sum(F.when(touched, F.col("n_rows")).otherwise(0))
                .cast("bigint")
                .alias("rows_scanned"),
            )
            .select(
                "ordering",
                F.lit(box).alias("box"),
                "n_bins",
                "bins_touched",
                F.lit(rows_matching).cast("bigint").alias("rows_matching"),
                "rows_scanned",
                F.expr(
                    f"rows_scanned * 1000 DIV greatest({rows_matching}, 1)"
                )
                .cast("bigint")
                .alias("amplification_milli"),
            )
        )
        grid = row if grid is None else grid.unionByName(row)
    return grid.orderBy("ordering", "box")


def _zp_morton_sql(u: str, t: str) -> str:
    terms = []
    for b in range(8):
        terms.append(f"((({u} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({t} >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


@query(
    "layout_zorder_pruning",
    oracle=f"""
    WITH st AS (
      SELECT min(user_id) AS lo_u, max(user_id) AS hi_u,
             min(epoch_us(ts)) AS lo_t, max(epoch_us(ts)) AS hi_t
      FROM events
    ),
    pts AS MATERIALIZED (
      SELECT event_id,
             CAST((user_id - lo_u) * 256 // (hi_u - lo_u + 1) AS BIGINT)
               AS ub,
             CAST((epoch_us(ts) - lo_t) * 256 // (hi_t - lo_t + 1)
                  AS BIGINT) AS tb
      FROM events, st
    ),
    laid AS MATERIALIZED (
      SELECT 'tsort' AS ordering, ub, tb,
             (row_number() OVER (ORDER BY tb, ub, event_id) - 1)
               // {_ZP_BIN_ROWS} AS bin
      FROM pts
      UNION ALL
      SELECT 'usort', ub, tb,
             (row_number() OVER (ORDER BY ub, tb, event_id) - 1)
               // {_ZP_BIN_ROWS}
      FROM pts
      UNION ALL
      SELECT 'zorder', ub, tb,
             (row_number() OVER (
                ORDER BY {_zp_morton_sql('ub', 'tb')}, event_id) - 1)
               // {_ZP_BIN_ROWS}
      FROM pts
    ),
    {_zp_audit_tail_sql()}
    """,
)
def layout_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _zp_pts(spark, sf_dir)
    laid = None
    for ordering, order in (
        ("tsort", "tb, ub, event_id"),
        ("usort", "ub, tb, event_id"),
        ("zorder", f"{_zp_morton_sql('ub', 'tb')}, event_id"),
    ):
        arm = pts.select(
            F.lit(ordering).alias("ordering"),
            "ub",
            "tb",
            F.expr(
                f"(row_number() OVER (ORDER BY {order}) - 1)"
                f" DIV {_ZP_BIN_ROWS}"
            )
            .cast("bigint")
            .alias("bin"),
        )
        laid = arm if laid is None else laid.unionByName(arm)
    return _zp_box_grid(pts, laid)


# --------------------------------------------------------------------------
# layout_hilbert_vs_zorder — the space-filling-curve A/B completing the
# layout family: Morton interleaving (above) is cheap but crosses
# quadrant boundaries with long jumps; the Hilbert curve pays 8 chained
# integer steps per point to stay locality-continuous. Same 256-row
# bins, same three boxes, orderings {zorder, hilbert}; the Hilbert
# index is the classical xy2d transform unrolled as an 8-step
# (x, y, d) column chain — pure CASE/AND arithmetic, byte-identical in
# both engines (the quadrant-xor is expressed as a CASE so no
# engine-specific xor form leaks in), and pinned against reference
# values in tests/test_operators.py.
#
# Measured (sf0.01, 40 bins): Hilbert touches fewer bins than Morton
# on EVERY box — 8 vs 9 (narrow_t), 8 vs 12 (narrow_u), 5 vs 8
# (small) — the continuity claim as numbers: Morton's quadrant jumps
# smear bins across both dimensions, Hilbert's single-step adjacency
# keeps each bin's bounding box tight. Combined with the grid above:
# sorts win one orientation, Morton bounds the worst case, Hilbert
# tightens that bound further for ~8 integer steps per row at write
# time.
# --------------------------------------------------------------------------
def _hb_step_sql(s: int) -> tuple[str, str, str]:
    rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
    dinc = (
        f"{s * s} * (CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
        f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 0 THEN 3 ELSE 2 END)"
    )
    x_new = (
        f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
        f"THEN {s} - 1 - hy ELSE hy END) ELSE hx END"
    )
    y_new = (
        f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
        f"THEN {s} - 1 - hx ELSE hx END) ELSE hy END"
    )
    return x_new, y_new, f"hd + {dinc}"


_HB_STEPS = [128, 64, 32, 16, 8, 4, 2, 1]


def _hb_chain_sql(src: str) -> str:
    """CTE chain hb0..hb8 computing the Hilbert index hd of (ub, tb)."""
    ctes = [
        f"""hb0 AS (
      SELECT event_id, ub, tb, ub AS hx, tb AS hy,
             CAST(0 AS BIGINT) AS hd
      FROM {src}
    )"""
    ]
    for i, s in enumerate(_HB_STEPS, start=1):
        x_new, y_new, d_new = _hb_step_sql(s)
        ctes.append(
            f"""hb{i} AS (
      SELECT event_id, ub, tb,
             CAST({x_new} AS BIGINT) AS hx,
             CAST({y_new} AS BIGINT) AS hy,
             CAST({d_new} AS BIGINT) AS hd
      FROM hb{i - 1}
    )"""
        )
    return ",\n    ".join(ctes)


@query(
    "layout_hilbert_vs_zorder",
    oracle=f"""
    WITH st AS (
      SELECT min(user_id) AS lo_u, max(user_id) AS hi_u,
             min(epoch_us(ts)) AS lo_t, max(epoch_us(ts)) AS hi_t
      FROM events
    ),
    pts AS MATERIALIZED (
      SELECT event_id,
             CAST((user_id - lo_u) * 256 // (hi_u - lo_u + 1) AS BIGINT)
               AS ub,
             CAST((epoch_us(ts) - lo_t) * 256 // (hi_t - lo_t + 1)
                  AS BIGINT) AS tb
      FROM events, st
    ),
    {_hb_chain_sql("pts")},
    laid AS MATERIALIZED (
      SELECT 'zorder' AS ordering, ub, tb,
             (row_number() OVER (
                ORDER BY {_zp_morton_sql('ub', 'tb')}, event_id) - 1)
               // {_ZP_BIN_ROWS} AS bin
      FROM pts
      UNION ALL
      SELECT 'hilbert', ub, tb,
             (row_number() OVER (ORDER BY hd, event_id) - 1)
               // {_ZP_BIN_ROWS}
      FROM hb{len(_HB_STEPS)}
    ),
    {_zp_audit_tail_sql()}
    """,
)
def layout_hilbert_vs_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _zp_pts(spark, sf_dir)
    hb = pts.select(
        "event_id",
        "ub",
        "tb",
        F.col("ub").alias("hx"),
        F.col("tb").alias("hy"),
        F.lit(0).cast("bigint").alias("hd"),
    )
    for s in _HB_STEPS:
        x_new, y_new, d_new = _hb_step_sql(s)
        hb = hb.select(
            "event_id",
            "ub",
            "tb",
            F.expr(x_new).cast("bigint").alias("hx"),
            F.expr(y_new).cast("bigint").alias("hy"),
            F.expr(d_new).cast("bigint").alias("hd"),
        )
    laid = (
        pts.select(
            F.lit("zorder").alias("ordering"),
            "ub",
            "tb",
            F.expr(
                f"(row_number() OVER (ORDER BY "
                f"{_zp_morton_sql('ub', 'tb')}, event_id) - 1)"
                f" DIV {_ZP_BIN_ROWS}"
            )
            .cast("bigint")
            .alias("bin"),
        )
        .unionByName(
            hb.select(
                F.lit("hilbert").alias("ordering"),
                "ub",
                "tb",
                F.expr(
                    f"(row_number() OVER (ORDER BY hd, event_id) - 1)"
                    f" DIV {_ZP_BIN_ROWS}"
                )
                .cast("bigint")
                .alias("bin"),
            )
        )
    )
    return _zp_box_grid(pts, laid)


# --------------------------------------------------------------------------
# events_theta_set_ops — SET ALGEBRA ON SKETCHES (the Theta-sketch
# capability that makes KMV the analytics workhorse: union AND
# intersection estimates from k-sized summaries, no raw data): set A =
# users with ≥15 error events, set B = users with ≥15 purchases
# (count thresholds — the value column is too tail-skewed for a
# quantile slice to be non-degenerate; these give genuinely partial
# overlap, unlike the per-type user sets which all coincide).
# k = 32 smallest 60-bit hashes per set; union = k smallest of the
# merged hashes; intersection = common hashes below θ = min(θ_A, θ_B)
# scaled by θ (the DataSketches a-priori intersection rule). Every
# estimate is integer arithmetic over the deterministic h64 order
# statistics — the whole sketch algebra sits under the hash gate,
# including each op's signed error against the exact answer.
#
# Measured (sf0.01; |A|=57, |B|=50, |A∩B|=18, |A∪B|=89): estimates
# 59 / 44 / 15 / 78 → errors +35‰ / −120‰ / −166‰ / −123‰ at k=32 —
# the intersection reads worst, exactly the DataSketches caveat (its
# effective sample is only the common hashes below θ, so error grows
# as the overlap fraction shrinks).
#
# Scale: sketches are k rows per set (mergeable, shippable); the exact
# sides are the fixture-only audit columns.
# --------------------------------------------------------------------------
def _theta_algebra_sql(k: int, labels: tuple[str, str, str, str]) -> str:
    """The sketch-algebra CTE tail shared by events_theta_set_ops and
    streaming_theta_index's oracles: given ``seta`` / ``setb`` CTEs of
    ``user_id`` rows, build both k-sized sketches, the union sketch,
    the min-theta intersection, the exact audit, and the final
    estimate/err projection (DuckDB // truncation semantics — the one
    place the algebra's integer arithmetic is written)."""
    la, lb, lu, li = labels
    ppm = (1 << 60) // 10**6
    hash_sql = (
        "CAST(('0x' || substr(md5('theta:' || CAST(user_id AS VARCHAR)),"
        " 1, 15)) AS BIGINT)"
    )
    return f"""ha AS (SELECT {hash_sql} AS h FROM seta),
    hb AS (SELECT {hash_sql} AS h FROM setb),
    ska AS MATERIALIZED (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ha
      ) WHERE rn <= {k}
    ),
    skb AS MATERIALIZED (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hb
      ) WHERE rn <= {k}
    ),
    sku AS MATERIALIZED (
      SELECT h, row_number() OVER (ORDER BY h) AS rn
      FROM (SELECT h FROM ska UNION SELECT h FROM skb)
      QUALIFY rn <= {k}
    ),
    thetas AS (
      SELECT (SELECT max(h) FROM ska) AS ta,
             (SELECT max(h) FROM skb) AS tb,
             (SELECT max(h) FROM sku) AS tu
    ),
    inter AS (
      SELECT CAST(count(*) AS BIGINT) AS common
      FROM ska JOIN skb USING (h), thetas
      WHERE ska.h < least(thetas.ta, thetas.tb)
    ),
    exact AS (
      SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM seta) AS na,
        (SELECT CAST(count(*) AS BIGINT) FROM setb) AS nb,
        (SELECT CAST(count(*) AS BIGINT) FROM
          (SELECT user_id FROM seta UNION SELECT user_id FROM setb))
          AS nu,
        (SELECT CAST(count(*) AS BIGINT) FROM
          (SELECT user_id FROM seta INTERSECT SELECT user_id FROM setb))
          AS ni
    ),
    ests AS (
      SELECT '{la}' AS op, e.na AS n_exact,
             t.ta // {ppm} AS theta_ppm,
             CAST({k - 1} AS BIGINT) AS cnt
      FROM thetas t, exact e
      UNION ALL
      SELECT '{lb}', e.nb, t.tb // {ppm}, CAST({k - 1} AS BIGINT)
      FROM thetas t, exact e
      UNION ALL
      SELECT '{lu}', e.nu, t.tu // {ppm}, CAST({k - 1} AS BIGINT)
      FROM thetas t, exact e
      UNION ALL
      SELECT '{li}', e.ni, least(t.ta, t.tb) // {ppm}, i.common
      FROM thetas t, exact e, inter i
    )
    SELECT op, n_exact, CAST({k} AS INT) AS k,
           CAST(theta_ppm AS BIGINT) AS theta_ppm,
           CAST(cnt * 1000000 // theta_ppm AS BIGINT) AS est_users,
           CAST((cnt * 1000000 // theta_ppm - n_exact) * 1000
                // greatest(n_exact, 1) AS BIGINT) AS err_milli
    FROM ests
    ORDER BY op"""


def _theta_est_rows(items: list, k: int) -> list:
    """Driver-side twin of the estimate projection above — integer
    arithmetic with DuckDB's truncate-toward-zero division (Python //
    floors on negatives, the documented divergence)."""
    ppm_div = (1 << 60) // 10**6
    rows = []
    for op, n_ex, theta, cnt in items:
        theta_ppm = theta // ppm_div
        est = cnt * 10**6 // theta_ppm
        num = (est - n_ex) * 1000
        err = abs(num) // max(n_ex, 1) * (1 if num >= 0 else -1)
        rows.append((op, n_ex, k, theta_ppm, est, err))
    return rows


_THETA_K = 32


@query(
    "events_theta_set_ops",
    oracle=f"""
    WITH seta AS MATERIALIZED (
      SELECT user_id FROM events WHERE event_type = 'error'
      GROUP BY user_id HAVING count(*) >= 15
    ),
    setb AS MATERIALIZED (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      GROUP BY user_id HAVING count(*) >= 15
    ),
    {_theta_algebra_sql(_THETA_K, ('a', 'b', 'union', 'intersection'))}
    """,
)
def events_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from data_ingestion_din_spark.functions.hashing import h64

    ev = load_table(spark, sf_dir, "events")

    def users_with(etype: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 15)
            .select("user_id")
        )

    sets = {"a": users_with("error"), "b": users_with("purchase")}
    wk = W.orderBy("h")
    sk = {}
    exact = {}
    for name, df in sets.items():
        exact[name] = df.count()
        sk[name] = (
            df.select(
                h64(F.concat(F.lit("theta:"), F.col("user_id").cast("string")))
                .alias("h")
            )
            .withColumn("rn", F.row_number().over(wk))
            .filter(F.col("rn") <= _THETA_K)
            .select("h")
            .localCheckpoint(eager=True)
        )
    exact["union"] = sets["a"].unionByName(sets["b"]).distinct().count()
    exact["intersection"] = sets["a"].join(sets["b"], "user_id").count()
    sku = (
        sk["a"]
        .unionByName(sk["b"])
        .distinct()
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _THETA_K)
        .select("h")
    )
    ta = sk["a"].agg(F.max("h")).first()[0]
    tb = sk["b"].agg(F.max("h")).first()[0]
    tu = sku.agg(F.max("h")).first()[0]
    common = (
        sk["a"]
        .join(sk["b"], "h")
        .filter(F.col("h") < min(ta, tb))
        .count()
    )
    rows = _theta_est_rows(
        [
            ("a", exact["a"], ta, _THETA_K - 1),
            ("b", exact["b"], tb, _THETA_K - 1),
            ("union", exact["union"], tu, _THETA_K - 1),
            ("intersection", exact["intersection"], min(ta, tb), common),
        ],
        _THETA_K,
    )
    return spark.createDataFrame(
        rows,
        "op string, n_exact bigint, k int, theta_ppm bigint,"
        " est_users bigint, err_milli bigint",
    ).orderBy("op")


# --------------------------------------------------------------------------
# events_scd2_temporal_join — the CONSUMER of the SCD2 story (build ✓
# events_scd2_intervals, maintain ✓ streaming_scd2_maintenance — this
# is the join they exist for): facts joined to the dimension VERSION
# valid at each fact's event time. Dimension = each user's status
# stream (signup/error events change-detected into [valid_from,
# valid_to) versions); facts = the same users' purchases; the join is
# user_id equi + ts∈[from,to) range — the dimensional-modeling join
# every warehouse runs, with the late-arriving wrinkle kept honest:
# purchases before a user's first status version join to NULL and are
# reported as the 'unknown' bucket instead of being dropped. Output:
# per joined status, purchase count, decimal-exact revenue, distinct
# buyers.
#
# Scale: the range condition rides the user_id equi-join (no interval
# explosion needed at per-user version counts); one shuffle each side.
# --------------------------------------------------------------------------
@query(
    "events_scd2_temporal_join",
    oracle=f"""
    WITH dim0 AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
      FROM events WHERE event_type IN ('signup', 'error')
    ),
    chg AS (
      SELECT user_id, event_type, ts_us,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS opens
      FROM dim0
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    ver AS (
      SELECT user_id, event_type, ts_us,
             sum(opens) OVER (PARTITION BY user_id ORDER BY ts_us
                              ROWS UNBOUNDED PRECEDING) AS version
      FROM chg
    ),
    dim AS (
      SELECT user_id, version, any_value(event_type) AS status,
             min(ts_us) AS valid_from,
             lead(min(ts_us)) OVER (PARTITION BY user_id
                                    ORDER BY version) AS valid_to
      FROM ver GROUP BY user_id, version
    ),
    fact AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events WHERE event_type = 'purchase'
    )
    SELECT coalesce(d.status, 'unknown') AS status,
           CAST(count(*) AS BIGINT) AS n_purchases,
           {dec_to_double_sql("sum(f.v)", 2)} AS revenue,
           CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_buyers
    FROM fact f
    LEFT JOIN dim d
      ON d.user_id = f.user_id
     AND f.ts_us >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts_us < d.valid_to)
    GROUP BY coalesce(d.status, 'unknown')
    ORDER BY status
    """,
)
def events_scd2_temporal_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dim0 = ev.filter(
        F.col("event_type").isin("signup", "error")
    ).select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    chg = dim0.withColumn(
        "opens",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")),
            1,
        ).otherwise(0),
    )
    wv = W.partitionBy("user_id").orderBy("ts_us").rowsBetween(
        W.unboundedPreceding, 0
    )
    ver = chg.withColumn("version", F.sum("opens").over(wv))
    dim = (
        ver.groupBy("user_id", "version")
        .agg(
            F.first("event_type").alias("status"),
            F.min("ts_us").alias("valid_from"),
        )
        .withColumn(
            "valid_to",
            F.lead("valid_from").over(
                W.partitionBy("user_id").orderBy("version")
            ),
        )
    )
    fact = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    joined = fact.alias("f").join(
        dim.alias("d"),
        (F.col("d.user_id") == F.col("f.user_id"))
        & (F.col("f.ts_us") >= F.col("d.valid_from"))
        & (
            F.col("d.valid_to").isNull()
            | (F.col("f.ts_us") < F.col("d.valid_to"))
        ),
        "left",
    )
    return (
        joined.groupBy(
            F.coalesce(F.col("d.status"), F.lit("unknown")).alias("status")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            dec_to_double(F.sum("f.v"), 2).alias("revenue"),
            F.countDistinct(F.col("f.user_id"))
            .cast("bigint")
            .alias("n_buyers"),
        )
        .orderBy("status")
    )


# --------------------------------------------------------------------------
# events_hll_sliding_merge — the TIME-AXIS merge that is HLL's whole
# reason to exist in a warehouse: registers built once per (event_type,
# day) partition (the shape a daily ETL materializes), then a trailing
# 3-day sliding estimate served by MERGING the daily registers
# (windowed max per bucket) — never re-touching the raw events. The
# family's last missing disposition: build ✓ (events_hll_distinct),
# precision grid ✓ (events_hll_precision_grid), at-ingest maintenance ✓
# (streaming_hll_registers), merge-at-read across partitions ✓ (this).
#
# Two gates per row: (1) s_merged — the scaled-integer harmonic sum off
# the MERGED registers (integer-exact, the hash gate's subject), and
# (2) merge_eq — merged registers reproduce the from-scratch sketch
# built over the window's unioned hashes bit for bit (max is
# associative and idempotent: the distributive-aggregation contract,
# stated as a computed column rather than a comment). n_exact_3d sits
# beside the estimate as the accuracy readout (~134 distinct users/day
# of 150 total, so the 3-day window nearly saturates — the raw
# estimator's small-range bias measured in events_hll_precision_grid
# applies here too and is visible per row).
#
# Scale: the daily register table is (types × days × m) rows — bounded
# metadata, NOT the raw events; the sliding merge joins that table to
# its own day list (3× fan-out, constant per window) and never reads
# events again. The from-scratch twin and the exact column are the
# audit side, corpus-priced, exactly like every recall sweep's truth.
# --------------------------------------------------------------------------
_HSM_W = 3  # trailing window, days


def _hll_slide_oracle() -> str:
    est = f"round({_HLL_NUM!r} / CAST(s_merged AS DOUBLE), 4)"
    return f"""
    WITH uh AS (
      SELECT DISTINCT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)),
                                  1, 15)) AS BIGINT) AS h
      FROM events
    ),
    br AS (
      SELECT event_type, day, h % {_HLL_M} AS bucket,
             CASE WHEN h // {_HLL_M} = 0 THEN 55
                  ELSE 55 - length(bin(h // {_HLL_M})) END AS rnk
      FROM uh
    ),
    regd AS (
      SELECT event_type, day, bucket, max(rnk) AS r
      FROM br GROUP BY event_type, day, bucket
    ),
    days AS (SELECT DISTINCT event_type, day FROM regd),
    mreg AS (
      SELECT d.event_type, d.day, r.bucket, max(r.r) AS r
      FROM days d JOIN regd r
        ON r.event_type = d.event_type
       AND r.day BETWEEN d.day - {_HSM_W - 1} AND d.day
      GROUP BY d.event_type, d.day, r.bucket
    ),
    ms AS (
      SELECT event_type, day,
             CAST(count(*) AS BIGINT) AS n_buckets,
             sum(CAST(1 AS BIGINT) << (32 - least(r, 32)))
               + ({_HLL_M} - count(*)) * 4294967296 AS s_merged
      FROM mreg GROUP BY event_type, day
    ),
    sreg AS (
      SELECT d.event_type, d.day, u.h % {_HLL_M} AS bucket,
             max(CASE WHEN u.h // {_HLL_M} = 0 THEN 55
                      ELSE 55 - length(bin(u.h // {_HLL_M})) END) AS r
      FROM days d JOIN uh u
        ON u.event_type = d.event_type
       AND u.day BETWEEN d.day - {_HSM_W - 1} AND d.day
      GROUP BY d.event_type, d.day, u.h % {_HLL_M}
    ),
    ss AS (
      SELECT event_type, day,
             sum(CAST(1 AS BIGINT) << (32 - least(r, 32)))
               + ({_HLL_M} - count(*)) * 4294967296 AS s_scratch
      FROM sreg GROUP BY event_type, day
    ),
    du AS (
      SELECT DISTINCT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events
    ),
    ex AS (
      SELECT d.event_type, d.day,
             CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_exact_3d
      FROM days d JOIN du u
        ON u.event_type = d.event_type
       AND u.day BETWEEN d.day - {_HSM_W - 1} AND d.day
      GROUP BY d.event_type, d.day
    )
    SELECT ms.event_type, ms.day, ms.n_buckets,
           CAST(ms.s_merged AS BIGINT) AS s_merged,
           ms.s_merged = ss.s_scratch AS merge_eq,
           {est} AS hll_estimate,
           ex.n_exact_3d
    FROM ms
    JOIN ss ON ss.event_type = ms.event_type AND ss.day = ms.day
    JOIN ex ON ex.event_type = ms.event_type AND ex.day = ms.day
    ORDER BY ms.event_type, ms.day
    """


@query("events_hll_sliding_merge", oracle=_hll_slide_oracle())
def events_hll_sliding_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.hashing import h64

    ev = load_table(spark, sf_dir, "events")
    uh = ev.select(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        h64(
            F.concat(F.lit("hll:"), F.col("user_id").cast("string"))
        ).alias("h"),
    ).distinct()
    w = F.expr(f"h div {_HLL_M}")
    rnk = F.when(w == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.bin(w))
    )
    br = uh.select(
        "event_type",
        "day",
        F.pmod(F.col("h"), F.lit(_HLL_M)).alias("bucket"),
        rnk.alias("rnk"),
    )
    regd = br.groupBy("event_type", "day", "bucket").agg(
        F.max("rnk").alias("r")
    )
    days = regd.select("event_type", "day").distinct()

    def _window_join(right: DataFrame) -> DataFrame:
        d = days.select(
            F.col("event_type").alias("w_type"), F.col("day").alias("w_day")
        )
        return d.join(
            right,
            (right["event_type"] == F.col("w_type"))
            & (
                right["day"].between(
                    F.date_sub(F.col("w_day"), _HSM_W - 1), F.col("w_day")
                )
            ),
        )

    s_expr = (
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 32 - least(r, 32))"))
        + (F.lit(_HLL_M) - F.count(F.lit(1))) * F.lit(4294967296)
    ).cast("bigint")
    mreg = (
        _window_join(regd)
        .groupBy("w_type", "w_day", "bucket")
        .agg(F.max("r").alias("r"))
    )
    ms = mreg.groupBy("w_type", "w_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        s_expr.alias("s_merged"),
    )
    sreg = (
        _window_join(uh)
        .select(
            "w_type",
            "w_day",
            F.pmod(F.col("h"), F.lit(_HLL_M)).alias("bucket"),
            rnk.alias("rnk"),
        )
        .groupBy("w_type", "w_day", "bucket")
        .agg(F.max("rnk").alias("r"))
    )
    ss = sreg.groupBy("w_type", "w_day").agg(s_expr.alias("s_scratch"))
    du = ev.select(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        "user_id",
    ).distinct()
    ex = (
        _window_join(du)
        .groupBy("w_type", "w_day")
        .agg(
            F.count_distinct(F.col("user_id"))
            .cast("bigint")
            .alias("n_exact_3d")
        )
    )
    return (
        ms.join(ss, ["w_type", "w_day"])
        .join(ex, ["w_type", "w_day"])
        .select(
            F.col("w_type").alias("event_type"),
            F.col("w_day").alias("day"),
            "n_buckets",
            "s_merged",
            (F.col("s_merged") == F.col("s_scratch")).alias("merge_eq"),
            F.round(
                F.lit(_HLL_NUM) / F.col("s_merged").cast("double"), 4
            ).alias("hll_estimate"),
            "n_exact_3d",
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# events_gini_concentration — value-concentration audit (Lorenz curve +
# Gini coefficient) over per-user event value: the "is 80% of the
# volume coming from 2% of the keys" number that sizes skew handling
# (the dq_key_skew_profile / salt-factor recipes need exactly this
# statistic to decide WHETHER to salt) and flags whale-dominated
# corpora before they skew a training mixture. All exact integer
# arithmetic: per-user totals in DECIMAL cents, users ranked ascending
# (value, then user_id — the deterministic tie-break), one row per
# decile of the user count with the cumulative value share in
# per-mille, plus the exact integer Gini
#   G·1000 = (2·Σ_i i·v_i − (n+1)·Σ v) · 1000 // (n · Σ v)
# (the rank-covariance identity — no area integration, no floats)
# repeated on each row for the single-statistic read. Decile labels use
# ceil(r*10/n) so decile d's row is the cumulative share at exactly
# d*10% of users (the r12 ADVICE fix: the floor form put the 10% point
# in a dropped decile-0 bucket and shifted every label by one).
#
# Scale: one user_id shuffle for the totals, one global sort for the
# ranks (the same global-rank window the layout audits use), decile
# rollup over n rows of metadata.
# --------------------------------------------------------------------------


@query(
    "events_gini_concentration",
    oracle="""
    WITH ut AS (
      SELECT user_id,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY user_id
    ),
    rk AS (
      SELECT user_id, cents,
             row_number() OVER (ORDER BY cents, user_id) AS r
      FROM ut
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS tv,
             CAST(sum(r * cents) AS BIGINT) AS rv
      FROM rk
    ),
    cum AS (
      SELECT r, cents,
             sum(cents) OVER (ORDER BY r) AS cum_cents
      FROM rk
    ),
    dec AS (
      SELECT CAST((r * 10 + tot.n - 1) // tot.n AS INT) AS decile,
             r, cum_cents
      FROM cum CROSS JOIN tot
      QUALIFY r = max(r) OVER (
        PARTITION BY CAST((r * 10 + tot.n - 1) // tot.n AS INT))
    )
    SELECT CAST(dec.decile AS INT) AS decile,
           CAST(dec.r AS BIGINT) AS n_users_cum,
           CAST(dec.cum_cents AS BIGINT) AS cum_value_cents,
           CAST(dec.cum_cents * 1000 // tot.tv AS BIGINT)
             AS cum_share_milli,
           CAST((2 * tot.rv - (tot.n + 1) * tot.tv) * 1000
                // (tot.n * tot.tv) AS BIGINT) AS gini_milli
    FROM dec CROSS JOIN tot
    ORDER BY decile
    """,
)
def events_gini_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    ut = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    rk = ut.withColumn(
        "r", F.row_number().over(W.orderBy("cents", "user_id"))
    )
    tot = rk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("tv"),
        F.sum(F.col("r") * F.col("cents")).cast("bigint").alias("rv"),
    )
    cum = rk.withColumn(
        "cum_cents",
        F.sum("cents").over(
            W.orderBy("r").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    dec = (
        cum.crossJoin(tot)
        .withColumn(
            "decile", F.expr("CAST((r * 10 + n - 1) DIV n AS INT)")
        )
        .withColumn(
            "rmax", F.max("r").over(W.partitionBy("decile"))
        )
        .filter(F.col("r") == F.col("rmax"))
    )
    return dec.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("r").cast("bigint").alias("n_users_cum"),
        F.col("cum_cents").cast("bigint").alias("cum_value_cents"),
        F.expr("cum_cents * 1000 DIV tv")
        .cast("bigint")
        .alias("cum_share_milli"),
        F.expr("(2 * rv - (n + 1) * tv) * 1000 DIV (n * tv)")
        .cast("bigint")
        .alias("gini_milli"),
    ).orderBy("decile")


# --------------------------------------------------------------------------
# events_markov_transitions — first-order event-type transition matrix,
# the sequence-analytics operator the session/funnel family implies but
# never materializes: per user in (ts, event_id) order, count each
# (from_type → to_type) step, emit the full matrix with per-mille row
# shares (the empirical Markov kernel P(next | current)) and each
# from-type's modal successor flagged — the table behind "what do
# users do after an error", churn-path mining, and synthetic-sequence
# generation. Transitions never cross users; the deterministic
# (ts, event_id) order is the family's standard tie-break.
#
# Scale: one user_id shuffle for the lead() window, then a (from, to)
# rollup — k² output rows regardless of corpus size.
# --------------------------------------------------------------------------


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    tr AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    ),
    rt AS (
      SELECT from_type, CAST(sum(n) AS BIGINT) AS row_n FROM tr
      GROUP BY from_type
    ),
    mm AS (
      SELECT from_type, max(n) AS mx FROM tr GROUP BY from_type
    ),
    md AS (
      SELECT tr.from_type, min(tr.to_type) AS modal_to
      FROM tr JOIN mm USING (from_type)
      WHERE tr.n = mm.mx GROUP BY tr.from_type
    )
    SELECT tr.from_type, tr.to_type, tr.n,
           CAST(tr.n * 1000 // rt.row_n AS BIGINT) AS row_milli,
           tr.n = mm.mx AND tr.to_type = md.modal_to AS modal_successor
    FROM tr
    JOIN rt USING (from_type)
    JOIN mm USING (from_type)
    JOIN md USING (from_type)
    ORDER BY from_type, to_type
    """,
)
def events_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    wseq = W.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(wseq).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wrow = W.partitionBy("from_type")
    out = (
        tr.withColumn("row_n", F.sum("n").over(wrow))
        .withColumn("mx", F.max("n").over(wrow))
        .withColumn(
            "modal_to",
            F.min(
                F.when(F.col("n") == F.col("mx"), F.col("to_type"))
            ).over(wrow),
        )
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("n * 1000 DIV row_n").cast("bigint").alias("row_milli"),
            (
                (F.col("n") == F.col("mx"))
                & (F.col("to_type") == F.col("modal_to"))
            ).alias("modal_successor"),
        )
    )
    return out.orderBy("from_type", "to_type")


# --------------------------------------------------------------------------
# events_session_gap_grid — the inactivity-gap knob of sessionization
# measured (events_sessionized fixed 30 min by fiat; the dynamic-gap
# query varies it per TYPE but not over a sweep): one row per gap ∈
# {10, 20, 30, 60} minutes with the session count, mean events per
# session (milli), mean session duration (seconds), and the share of
# single-event sessions — the four numbers that show WHERE the knob
# bites (halving the gap fragments sessions into singletons; doubling
# it glues visits together). The lag/break-flag pass is shared: all
# four gaps read ONE ordered scan (the grid adds CASE columns over the
# same lag value, not window passes).
#
# Scale: one user_id shuffle for the lag window; per-gap rollups are
# metadata-sized.
# --------------------------------------------------------------------------
_SGG_GAPS_MIN = (10, 20, 30, 60)


def _sgg_oracle() -> str:
    per_gap = []
    for g in _SGG_GAPS_MIN:
        gus = g * 60_000_000
        per_gap.append(
            f"""SELECT {g} AS gap_min,
             CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(sum(n_ev) * 1000 // count(*) AS BIGINT)
               AS mean_events_milli,
             CAST(sum(dur_us) // (count(*) * 1000000) AS BIGINT)
               AS mean_dur_s,
             CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) * 1000
                  // count(*) AS BIGINT) AS single_milli
      FROM (
        SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_ev,
               max(ts_us) - min(ts_us) AS dur_us
        FROM (
          SELECT user_id, ts_us,
                 sum(CASE WHEN gap_us IS NULL OR gap_us > {gus}
                     THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS sid
          FROM lagged
        ) GROUP BY user_id, sid
      )"""
        )
    body = "\n      UNION ALL\n      ".join(per_gap)
    return f"""
    WITH lagged AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT CAST(gap_min AS INT) AS gap_min, n_sessions,
           mean_events_milli, mean_dur_s, single_milli
    FROM ({body})
    ORDER BY gap_min
    """


@query("events_session_gap_grid", oracle=_sgg_oracle())
def events_session_gap_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    word = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    lagged = ev.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    ).withColumn(
        "gap_us", F.col("ts_us") - F.lag("ts_us").over(word)
    ).localCheckpoint(eager=False)  # four gap rollups, one scan
    grid = None
    for g in _SGG_GAPS_MIN:
        gus = g * 60_000_000
        wcum = word.rowsBetween(W.unboundedPreceding, W.currentRow)
        sess = (
            lagged.withColumn(
                "sid",
                F.sum(
                    F.when(
                        F.col("gap_us").isNull()
                        | (F.col("gap_us") > gus),
                        1,
                    ).otherwise(0)
                ).over(wcum),
            )
            .groupBy("user_id", "sid")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_ev"),
                (F.max("ts_us") - F.min("ts_us")).alias("dur_us"),
            )
        )
        row = sess.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("n_ev").cast("bigint").alias("tot_ev"),
            F.sum("dur_us").cast("bigint").alias("tot_dur"),
            F.sum(F.when(F.col("n_ev") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_single"),
        ).select(
            F.lit(g).cast("int").alias("gap_min"),
            "n_sessions",
            F.expr("tot_ev * 1000 DIV n_sessions")
            .cast("bigint")
            .alias("mean_events_milli"),
            F.expr("tot_dur DIV (n_sessions * 1000000)")
            .cast("bigint")
            .alias("mean_dur_s"),
            F.expr("n_single * 1000 DIV n_sessions")
            .cast("bigint")
            .alias("single_milli"),
        )
        grid = row if grid is None else grid.unionByName(row)
    return grid.orderBy("gap_min")

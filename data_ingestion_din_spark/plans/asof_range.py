"""As-of and range joins over the events stream table.

The reference has no temporal join operators at all (SURVEY.md §2.4 notes
hash/sort-merge/range/as-of joins are absent); they are core query surface
for any event/telemetry workload, so the engine exposes both with
scale-safe physical shapes:

- **as-of join** — NOT the naive `join + filter + argmax` (that's a
  per-probe range scan, quadratic in events-per-user). The scalable
  formulation is union + sort + last-carried-forward: one shuffle on the
  key, linear scan per partition, no join at all. The DuckDB oracle uses
  its native ASOF JOIN — an independent implementation cross-checking the
  same semantics.
- **range join** — bucketed: the build side is exploded to the two
  time-buckets each probe window can touch, turning an unbounded range
  join into an equi-join on (key, bucket) + residual filter. This is the
  100 TB shape (candidate set bounded per bucket); the oracle states the
  same query as a plain range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.sources.tables import load_table

BURST_WINDOW_US = 600_000_000  # 10 minutes


@query(
    "events_asof_attribution",
    oracle="""
    WITH err AS (
      SELECT user_id, ts, max(event_id) AS err_id
      FROM events WHERE event_type = 'error'
      GROUP BY user_id, ts
    ),
    clk AS (
      SELECT user_id, ts, event_id AS click_id
      FROM events WHERE event_type = 'click'
    )
    SELECT c.click_id, c.user_id,
           CAST(epoch_us(c.ts) AS BIGINT) AS ts_us,
           e.err_id
    FROM clk c
    ASOF LEFT JOIN err e
      ON c.user_id = e.user_id AND e.ts <= c.ts
    ORDER BY click_id
    """,
)
def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every click, the most recent error event of the
    same user at-or-before it. Union + last-value window — one shuffle on
    user_id, no join; errors are deduped to one per (user, ts) so the
    'latest' pick is deterministic in both engines."""
    ev = load_table(spark, sf_dir, "events")
    err = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("err_id"))
        .select("user_id", "ts", F.lit(0).alias("is_probe"), "err_id",
                F.lit(None).cast("bigint").alias("click_id"))
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_probe"),
        F.lit(None).cast("bigint").alias("err_id"),
        F.col("event_id").alias("click_id"),
    )
    # ordering (ts, is_probe): an error at exactly the click's timestamp
    # sorts first and is therefore visible to the click (ties included,
    # matching ASOF's <= bound)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_probe", "click_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = err.unionByName(clk).withColumn(
        "last_err", F.last("err_id", ignorenulls=True).over(w)
    )
    return (
        merged.filter(F.col("is_probe") == 1)
        .select(
            "click_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.col("last_err").alias("err_id"),
        )
        .orderBy("click_id")
    )


@query(
    "events_error_burst",
    oracle=f"""
    SELECT e.event_id AS err_id,
           CAST(count(v.event_id) AS BIGINT) AS n_follow
    FROM events e
    LEFT JOIN events v
      ON v.user_id = e.user_id
     AND epoch_us(v.ts) > epoch_us(e.ts)
     AND epoch_us(v.ts) <= epoch_us(e.ts) + {BURST_WINDOW_US}
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    ORDER BY err_id
    """,
)
def events_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join, bucketed: events following each error within 10 minutes
    (same user). Each error probes exactly the two 10-minute buckets its
    window can overlap — an equi-join on (user_id, bucket) with a residual
    time filter, so candidate sets stay bounded regardless of history
    length (the naive t-range join degenerates to per-user cross products
    at scale)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.col("ts_us").alias("e_ts"),
    )
    e_bucket = F.floor(F.col("e_ts") / BURST_WINDOW_US).cast("bigint")
    probes = errors.withColumn(
        "b", F.explode(F.array(e_bucket, e_bucket + 1))
    )
    candidates = ev.select(
        "user_id",
        F.col("ts_us").alias("v_ts"),
        F.col("event_id").alias("v_id"),
        F.floor(F.col("ts_us") / BURST_WINDOW_US).cast("bigint").alias("b"),
    )
    matched = probes.join(candidates, ["user_id", "b"]).filter(
        (F.col("v_ts") > F.col("e_ts"))
        & (F.col("v_ts") <= F.col("e_ts") + BURST_WINDOW_US)
    )
    counts = matched.groupBy("err_id").agg(
        F.count(F.lit(1)).alias("n_follow")
    )
    return (
        errors.select("err_id")
        .join(counts, "err_id", "left")
        .select(
            "err_id",
            F.coalesce(F.col("n_follow"), F.lit(0)).cast("bigint").alias(
                "n_follow"
            ),
        )
        .orderBy("err_id")
    )


# --------------------------------------------------------------------------
# events_asof_tolerance_grid — the TOLERANCE knob of the as-of join
# (pandas merge_asof's `tolerance`, Flink's temporal-join TTL, kdb's
# wj window): events_asof_attribution matches every click to the most
# recent prior error with NO bound, which silently attributes a click
# to an error from days earlier. The production form bounds staleness,
# and the bound is a knob someone must size — this grid measures it:
# one as-of pass (the union+window single-shuffle shape, reused), then
# one row per tolerance ∈ {60 s, 600 s, 3600 s, ∞} with the match rate
# and the mean staleness OF THE MATCHES (integer µs arithmetic, DIV to
# ms) — the "how stale is what this tolerance admits" column that
# justifies the choice. The grid adds CASE columns, not passes.
#
# Scale: identical to events_asof_attribution — one user_id shuffle,
# no join, tolerance applied as a post-window filter.
# --------------------------------------------------------------------------
_ASOF_TOLS = (("60s", 60), ("600s", 600), ("3600s", 3600), ("inf", 0))


def _asof_tol_oracle() -> str:
    rows = []
    for label, tol_s in _ASOF_TOLS:
        cond = (
            "err_ts_us IS NOT NULL"
            if tol_s == 0
            else "err_ts_us IS NOT NULL AND"
            f" ts_us - err_ts_us <= {tol_s * 1_000_000}"
        )
        rows.append(
            f"""SELECT '{label}' AS tolerance,
             CAST(count(*) AS BIGINT) AS n_clicks,
             CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_matched,
             CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) * 1000
                  // count(*) AS BIGINT) AS match_milli,
             CAST(coalesce(sum(CASE WHEN {cond}
                    THEN ts_us - err_ts_us END), 0)
                  // (1000 * greatest(sum(CASE WHEN {cond} THEN 1
                                          ELSE 0 END), 1)) AS BIGINT)
               AS mean_stale_ms
      FROM j"""
        )
    body = "\n      UNION ALL\n      ".join(rows)
    return f"""
    WITH err AS (
      SELECT user_id, ts, max(event_id) AS err_id
      FROM events WHERE event_type = 'error'
      GROUP BY user_id, ts
    ),
    clk AS (
      SELECT user_id, ts, event_id AS click_id
      FROM events WHERE event_type = 'click'
    ),
    j AS (
      SELECT CAST(epoch_us(c.ts) AS BIGINT) AS ts_us,
             CAST(epoch_us(e.ts) AS BIGINT) AS err_ts_us
      FROM clk c
      ASOF LEFT JOIN err e
        ON c.user_id = e.user_id AND e.ts <= c.ts
    )
    SELECT * FROM ({body})
    ORDER BY tolerance
    """


@query("events_asof_tolerance_grid", oracle=_asof_tol_oracle())
def events_asof_tolerance_grid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    err = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("err_id"))
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("is_probe"),
            F.unix_micros("ts").alias("err_ts_us"),
            F.lit(None).cast("bigint").alias("click_id"),
        )
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_probe"),
        F.lit(None).cast("bigint").alias("err_ts_us"),
        F.col("event_id").alias("click_id"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_probe", "click_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    j = (
        err.unionByName(clk)
        .withColumn(
            "last_err_us", F.last("err_ts_us", ignorenulls=True).over(w)
        )
        .filter(F.col("is_probe") == 1)
        .select(
            F.unix_micros("ts").alias("ts_us"),
            F.col("last_err_us").alias("err_ts_us"),
        )
        .localCheckpoint(eager=False)  # four tolerance aggregations
    )
    grid = None
    for label, tol_s in _ASOF_TOLS:
        cond = F.col("err_ts_us").isNotNull()
        if tol_s:
            cond = cond & (
                F.col("ts_us") - F.col("err_ts_us") <= tol_s * 1_000_000
            )
        m = F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")
        row = j.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clicks"),
            m.alias("n_matched"),
            F.sum(
                F.when(cond, F.col("ts_us") - F.col("err_ts_us"))
            ).alias("stale_sum"),
        ).select(
            F.lit(label).alias("tolerance"),
            "n_clicks",
            "n_matched",
            F.expr("n_matched * 1000 DIV n_clicks")
            .cast("bigint")
            .alias("match_milli"),
            F.expr(
                "coalesce(stale_sum, 0)"
                " DIV (1000 * greatest(n_matched, 1))"
            )
            .cast("bigint")
            .alias("mean_stale_ms"),
        )
        grid = row if grid is None else grid.unionByName(row)
    return grid.orderBy("tolerance")

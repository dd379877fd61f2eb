"""Streaming ingest under the oracle hash gate (SURVEY.md §2.11).

The ``availableNow`` ingest stream (streaming/ingest.py — the Spark
replacement for the reference's per-upload subprocess pipeline,
backend/main.py:233-332) is run over the fixture ``documents`` table
split into TWO incremental landing batches (doc_id parity), with the
checkpoint carried across runs. The resulting content-addressed corpus
is read back as the query result; the DuckDB oracle computes the same
clean → tokenize → fixed-50-token-chunk → md5 transform over
``documents`` in one shot. Row/schema/value-hash parity therefore proves
the incremental two-run merge produced EXACTLY the batch answer —
exactly-once, no duplicates, no loss — under the same gate as every
batch query (stream==batch frame equality also unit-tested in
tests/test_streaming.py).
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_din_spark.functions.text import clean_text_sql
from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.sources.tables import load_table
from data_ingestion_din_spark.streaming.ingest import start_ingest_stream

# One stream run per (SparkContext lifetime, sf_dir) — the corpus dir is
# the durable artifact; reruns of the query in the same session read it.
_INGEST_DONE: set[tuple[str, str]] = set()

def _evict_dead(cache, app: str) -> None:
    """Drop cache entries from stopped SparkContexts — the session_staged
    eviction idiom applied to the PATH caches too. The values are short
    strings, but unbounded growth across in-process session restarts is
    the same leak the DataFrame cache was given eviction for."""
    for k in [k for k in cache if k[0] != app]:
        cache.discard(k) if isinstance(cache, set) else cache.pop(k)



def _await_or_raise(q, timeout_sec: int = 240) -> None:
    """``awaitTermination`` returns False on timeout; treating that as
    success would let the NEXT availableNow run start against the same
    checkpoint/output while this stream is still active — nondeterministic
    parquet state under the hash gate. Fail loudly instead."""
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise RuntimeError(
            f"streaming query did not finish within {timeout_sec}s; "
            "stopped to avoid concurrent runs on one checkpoint"
        )


def _ingested_corpus_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        app_dir_path,
        fresh_app_dir,
    )

    # cache-hit revalidation derives the path from the SAME helper that
    # materializes it, so a layout change cannot desynchronize the two
    corpus = os.path.join(
        app_dir_path(spark, sf_dir, "spark_graft_stream"), "corpus"
    )
    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_INGEST_DONE, key[0])
    if key in _INGEST_DONE:
        if _dir_ok(corpus):
            return corpus
        _INGEST_DONE.discard(key)  # staged corpus vanished; re-ingest

    base = fresh_app_dir(spark, sf_dir, "spark_graft_stream")
    corpus = os.path.join(base, "corpus")
    landing = os.path.join(base, "landing")
    ckpt = os.path.join(base, "ckpt")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", F.lit("fixture").alias("source"), "n_chars"
    )
    # batch 1 lands, stream drains it; batch 2 lands, a second availableNow
    # run (same checkpoint) processes ONLY the new files.
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        os.path.join(landing, "b1")
    )
    _await_or_raise(
        start_ingest_stream(spark, os.path.join(landing, "*"), corpus, ckpt)
    )
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("overwrite").parquet(
        os.path.join(landing, "b2")
    )
    _await_or_raise(
        start_ingest_stream(spark, os.path.join(landing, "*"), corpus, ckpt)
    )
    _INGEST_DONE.add(key)
    return corpus


_CLEAN_TOKS = (
    f"list_filter(string_split({clean_text_sql('text')}, ' '), x -> x <> '')"
)


@query(
    "streaming_ingest_chunks",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_CLEAN_TOKS} AS toks FROM documents),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(CAST(ceil(len(toks) / 50.0) AS BIGINT), 1)))
               AS chunk_idx
      FROM t
    ),
    c AS (
      SELECT doc_id, chunk_idx,
             array_to_string(
               list_slice(toks, chunk_idx * 50 + 1, chunk_idx * 50 + 50), ' '
             ) AS content
      FROM idx
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(doc_id AS VARCHAR) || '::' || CAST(chunk_idx AS VARCHAR)
             || '::' || substr(md5(content), 1, 8) AS chunk_id,
           CAST(length(content) AS BIGINT) AS n_chars,
           md5(content) AS content_fp
    FROM c
    ORDER BY doc_id, chunk_idx
    """,
)
def streaming_ingest_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _ingested_corpus_dir(spark, sf_dir)
    out = spark.read.parquet(corpus)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        "chunk_id",
        F.length("content").cast("bigint").alias("n_chars"),
        F.md5("content").alias("content_fp"),
    ).orderBy("doc_id", "chunk_idx")


# --------------------------------------------------------------------------
# streaming_first_seen — the STATEFUL streaming operator under the hash
# gate: applyInPandasWithState first-seen dedup (streaming/stateful.py)
# run over two incremental landing batches with the checkpoint carried
# across runs, so the fingerprint state provably survives restarts. Each
# landing batch is pre-deduped (min doc_id per fp within the batch), so
# the stream's winner per fingerprint is fully deterministic: the
# batch-1 candidate if the fp appeared there, else the batch-2 one —
# which the oracle restates as argmin by (doc_id parity, doc_id).
# Parity therefore proves cross-micro-batch state correctness, not just
# "a" dedup. The key is the WORDSET fingerprint (sorted distinct
# tokens), under which the fixture has 21 duplicated keys and 11 that
# span both batches — the raw-text md5 has zero duplicates, which would
# leave the state untested.
# --------------------------------------------------------------------------
_WORDSET_FP_SQL = (
    "md5(array_to_string(list_sort(list_distinct("
    "list_filter(string_split(text, ' '), x -> x <> ''))), ' '))"
)
_FIRST_SEEN_DONE: dict[tuple[str, str], str] = {}


def _first_seen_out_dir(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_FIRST_SEEN_DONE, key[0])
    if key in _FIRST_SEEN_DONE:
        from data_ingestion_din_spark.operators.colocate import _dir_ok

        if _dir_ok(_FIRST_SEEN_DONE[key]):
            return _FIRST_SEEN_DONE[key]
        del _FIRST_SEEN_DONE[key]  # staged output vanished; re-run
    from data_ingestion_din_spark.operators.colocate import fresh_app_dir
    from data_ingestion_din_spark.operators.dedup import keep_first_by
    from data_ingestion_din_spark.streaming.stateful import first_seen_stream

    base = fresh_app_dir(spark, sf_dir, "spark_graft_firstseen")
    landing = os.path.join(base, "landing")
    ckpt = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")
    from data_ingestion_din_spark.functions.analysis import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(
            F.array_join(
                F.array_sort(F.array_distinct(tokens(F.col("text")))), " "
            )
        ).alias("fp"),
    )
    schema = "doc_id bigint, fp string"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(landing + "/*")
        q = (
            first_seen_stream(stream, "fp")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_or_raise(q)

    for i, parity in enumerate((0, 1)):
        batch = keep_first_by(
            docs.filter(F.col("doc_id") % 2 == parity),
            F.col("fp"),
            [F.col("doc_id")],
        )
        batch.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(landing, f"b{i}")
        )
        run_once()
    _FIRST_SEEN_DONE[key] = out
    return out


@query(
    "streaming_first_seen",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, {_WORDSET_FP_SQL} AS fp,
             row_number() OVER (
               PARTITION BY {_WORDSET_FP_SQL} ORDER BY doc_id % 2, doc_id
             ) AS rk
      FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, fp
    FROM ranked WHERE rk = 1
    ORDER BY doc_id
    """,
)
def streaming_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _first_seen_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "fp")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# streaming_stream_join — STREAM-STREAM event-time interval join under
# the hash gate (§2.11 depth): clicks ⋈ errors per user where the error
# lands within 1 hour after the click, both sides watermarked 10 min.
# The click stream lands entirely in run 1; the error stream lands in
# TWO batches split at the corpus time midpoint with the checkpoint
# carried across availableNow runs — at sf0.01, 15 of the 37 output
# pairs match a second-run error against click state buffered in the
# FIRST run's state store, so row/hash parity with the batch interval
# join proves cross-restart join-state correctness, not just the join
# predicate. Watermarks are real (10 min on both sides drives state
# eviction); each landing batch is one micro-batch, so no event is
# dropped as late and the exact batch answer is the correct output.
# --------------------------------------------------------------------------
_SJOIN_WINDOW_US = 3_600_000_000  # 1 hour
_STREAM_JOIN_DONE: dict[tuple[str, str], str] = {}


def _stream_join_out_dir(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_STREAM_JOIN_DONE, key[0])
    if key in _STREAM_JOIN_DONE:
        from data_ingestion_din_spark.operators.colocate import _dir_ok

        if _dir_ok(_STREAM_JOIN_DONE[key]):
            return _STREAM_JOIN_DONE[key]
        del _STREAM_JOIN_DONE[key]
    from data_ingestion_din_spark.operators.colocate import fresh_app_dir

    base = fresh_app_dir(spark, sf_dir, "spark_graft_sjoin")
    landing_c = os.path.join(base, "clicks")
    landing_e = os.path.join(base, "errors")
    ckpt = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    mid = lo + (hi - lo) // 2  # setup-stage scalar (layout prep, 1 row)
    clicks = ev.filter(F.col("event_type") == "click").drop("event_type")
    errors = ev.filter(F.col("event_type") == "error").drop("event_type")

    def run_once() -> None:
        schema = "event_id bigint, ts timestamp, user_id bigint"
        c = (
            spark.readStream.schema(schema)
            .parquet(landing_c + "/*")
            .withWatermark("ts", "10 minutes")
            .alias("c")
        )
        e = (
            spark.readStream.schema(schema)
            .parquet(landing_e + "/*")
            .withWatermark("ts", "10 minutes")
            .alias("e")
        )
        joined = c.join(
            e,
            F.expr(
                "c.user_id = e.user_id AND e.ts >= c.ts "
                "AND e.ts <= c.ts + interval 1 hour"
            ),
        ).select(
            F.col("c.event_id").alias("click_id"),
            F.col("e.event_id").alias("error_id"),
            F.col("c.user_id").alias("user_id"),
            F.unix_micros(F.col("c.ts")).alias("click_us"),
            F.unix_micros(F.col("e.ts")).alias("error_us"),
        )
        q = (
            joined.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_or_raise(q)

    clicks.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(landing_c, "b0")
    )
    errors.filter(F.unix_micros("ts") < mid).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(landing_e, "b0"))
    run_once()
    errors.filter(F.unix_micros("ts") >= mid).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(landing_e, "b1"))
    run_once()
    _STREAM_JOIN_DONE[key] = out
    return out


@query(
    "streaming_stream_join",
    oracle=f"""
    SELECT CAST(c.event_id AS BIGINT) AS click_id,
           CAST(e.event_id AS BIGINT) AS error_id,
           CAST(c.user_id AS BIGINT) AS user_id,
           CAST(epoch_us(c.ts) AS BIGINT) AS click_us,
           CAST(epoch_us(e.ts) AS BIGINT) AS error_us
    FROM events c JOIN events e
      ON c.event_type = 'click' AND e.event_type = 'error'
     AND e.user_id = c.user_id AND e.ts >= c.ts
     AND epoch_us(e.ts) <= epoch_us(c.ts) + {_SJOIN_WINDOW_US}
    ORDER BY click_id, error_id
    """,
)
def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _stream_join_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select(
            F.col("click_id").cast("bigint").alias("click_id"),
            F.col("error_id").cast("bigint").alias("error_id"),
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("click_us").cast("bigint").alias("click_us"),
            F.col("error_us").cast("bigint").alias("error_us"),
        )
        .orderBy("click_id", "error_id")
    )


# --------------------------------------------------------------------------
# streaming_session_windows — native session_window aggregation under
# the hash gate, the canonical MERGING stateful operator (§2.11): 30-min
# gap sessions per user, 30-min watermark, append mode. The landing is
# split at a timestamp chosen INSIDE the corpus's largest session, so
# that session's state must survive the checkpointed availableNow
# restart and MERGE with second-run events to produce one row — the
# batch answer (the lag/cumsum sessionization oracle) is only
# reproducible if cross-run session merging is exact. A single sentinel
# event (user_id = -1, far past the last real event) lands last to push
# the GLOBAL event-time watermark beyond every real session's close;
# the sentinel's own session stays unemitted in state and is excluded
# from the read-back.
# --------------------------------------------------------------------------
_SESSION_GAP = "30 minutes"
_SESSION_GAP_US = 1_800_000_000
_SESSION_WIN_DONE: dict[tuple[str, str], str] = {}


def _session_windows_out_dir(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SESSION_WIN_DONE, key[0])
    if key in _SESSION_WIN_DONE:
        from data_ingestion_din_spark.operators.colocate import _dir_ok

        if _dir_ok(_SESSION_WIN_DONE[key]):
            return _SESSION_WIN_DONE[key]
        del _SESSION_WIN_DONE[key]
    from pyspark.sql.window import Window as W

    from data_ingestion_din_spark.operators.colocate import fresh_app_dir

    base = fresh_app_dir(spark, sf_dir, "spark_graft_sesswin")
    landing = os.path.join(base, "landing")
    ckpt = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    # setup-stage scalars: the largest session's midpoint (split there so
    # one session provably spans the restart) and the corpus max ts
    w_ord = W.partitionBy("user_id").orderBy("ts")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w_ord))
    s = ev.withColumn(
        "brk",
        F.when(gap.isNull() | (gap > _SESSION_GAP_US), 1).otherwise(0),
    ).withColumn(
        "seq",
        F.sum("brk").over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    big = (
        s.groupBy("user_id", "seq")
        .agg(
            F.min(F.unix_micros("ts")).alias("st"),
            F.max(F.unix_micros("ts")).alias("en"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(F.desc("n"), "user_id", "st")
        .first()
    )
    split_us = (big["st"] + big["en"]) // 2
    max_us = ev.agg(F.max(F.unix_micros("ts"))).first()[0]

    def run_once() -> None:
        stream = (
            spark.readStream.schema("user_id bigint, ts timestamp, value double")
            .parquet(landing + "/*")
            .withWatermark("ts", _SESSION_GAP)
        )
        agg = (
            stream.groupBy(
                F.session_window("ts", _SESSION_GAP).alias("sw"), "user_id"
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(12,2)")).alias("tot"),
            )
            .select(
                "user_id",
                F.unix_micros(F.col("sw.start")).alias("start_us"),
                F.unix_micros(F.col("sw.end")).alias("end_us"),
                "n_events",
                "tot",
            )
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_or_raise(q)

    for i, frame in enumerate(
        (
            ev.filter(F.unix_micros("ts") < split_us),
            ev.filter(F.unix_micros("ts") >= split_us),
            spark.range(1).select(
                F.lit(-1).cast("bigint").alias("user_id"),
                F.timestamp_micros(
                    F.lit(max_us + 3 * _SESSION_GAP_US)
                ).alias("ts"),
                F.lit(0.0).alias("value"),
            ),
        )
    ):
        frame.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(landing, f"b{i}")
        )
        run_once()
    _SESSION_WIN_DONE[key] = out
    return out


@query(
    "streaming_session_windows",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts)
                       - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts)
                       > {_SESSION_GAP_US}
                  OR lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ),
    s AS (
      SELECT user_id, ts, value,
             sum(brk) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS seq
      FROM flagged
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
           CAST(max(epoch_us(ts)) + {_SESSION_GAP_US} AS BIGINT) AS end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           (CAST((sum(CAST(value AS DECIMAL(12,2)))) * 100 AS BIGINT)
              / 100.0) AS total_value
    FROM s
    GROUP BY user_id, seq
    ORDER BY user_id, start_us
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.plans._exact import dec_to_double

    out = _session_windows_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .filter(F.col("user_id") >= 0)  # sentinel never emits; defensive
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("start_us").cast("bigint").alias("start_us"),
            F.col("end_us").cast("bigint").alias("end_us"),
            F.col("n_events").cast("bigint").alias("n_events"),
            dec_to_double(F.col("tot"), 2).alias("total_value"),
        )
        .orderBy("user_id", "start_us")
    )


# --------------------------------------------------------------------------
# streaming_hll_registers — SKETCH MAINTENANCE as a streaming operator:
# the HLL registers of events_hll_distinct kept incrementally by a
# stateful running-max stream (streaming/stateful.running_max_stream),
# events landing in TWO batches split at the corpus time midpoint with
# the checkpoint carried across availableNow runs. Registers are
# per-(event_type, bucket) maxima — a monotone merge, so the stream's
# final emission per key must equal the batch register exactly; the
# oracle recomputes the batch sketch AND the estimate, proving the
# real-time distinct-count surface converges bit-for-bit to the batch
# one across a restart. State per key is one int; ≤ m rows per group
# regardless of stream length.
# --------------------------------------------------------------------------
_HLL_DONE: dict[tuple[str, str], str] = {}
_SHLL_M = 64
_SHLL_NUM = 0.709 * 64.0 * 64.0 * 4294967296.0


def _hll_register_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, bucket, rnk, ts) per distinct (type, user) — the same
    h64-derived bucket/rank expressions as events_hll_distinct."""
    from data_ingestion_din_spark.functions.hashing import h64

    ev = load_table(spark, sf_dir, "events")
    h = h64(F.concat(F.lit("hll:"), F.col("user_id").cast("string")))
    w = F.expr(f"h div {_SHLL_M}")
    return (
        ev.select("event_type", "ts", h.alias("h"))
        .select(
            "event_type",
            "ts",
            F.pmod(F.col("h"), F.lit(_SHLL_M)).cast("int").alias("bucket"),
            F.when(w == 0, F.lit(55))
            .otherwise(F.lit(55) - F.length(F.bin(w)))
            .cast("int")
            .alias("rnk"),
        )
    )


def _hll_out_dir(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_HLL_DONE, key[0])
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    if key in _HLL_DONE:
        if _dir_ok(_HLL_DONE[key]):
            return _HLL_DONE[key]
        del _HLL_DONE[key]  # staged output vanished; re-run
    from data_ingestion_din_spark.streaming.stateful import (
        running_max_stream,
    )

    base = fresh_app_dir(spark, sf_dir, "spark_graft_hll")
    landing = os.path.join(base, "landing")
    ckpt = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")

    rows = _hll_register_rows(spark, sf_dir)
    mid = rows.agg(
        F.expr("timestamp_micros(cast(avg(unix_micros(ts)) as bigint))")
    ).collect()[0][0]
    schema = "event_type string, bucket int, rnk int"

    def run_once() -> None:
        stream = spark.readStream.schema(schema).parquet(landing + "/*")
        q = (
            running_max_stream(stream, ["event_type", "bucket"], "rnk")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_or_raise(q)

    for i, pred in enumerate(
        (F.col("ts") <= F.lit(mid), F.col("ts") > F.lit(mid))
    ):
        rows.filter(pred).select(
            "event_type", "bucket", "rnk"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(landing, f"b{i}")
        )
        run_once()
    _HLL_DONE[key] = out
    return out


@query(
    "streaming_hll_registers",
    oracle=f"""
    WITH uh AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events
    ),
    br AS (
      SELECT event_type,
             h % {_SHLL_M} AS bucket,
             CASE WHEN h // {_SHLL_M} = 0 THEN 55
                  ELSE 55 - length(bin(h // {_SHLL_M})) END AS rnk
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
               + ({_SHLL_M} - count(*)) * 4294967296 AS s_scaled
      FROM reg GROUP BY event_type
    )
    SELECT event_type, n_buckets,
           CAST(s_scaled AS BIGINT) AS s_scaled,
           round({_SHLL_NUM!r} / CAST(s_scaled AS DOUBLE), 4)
             AS hll_estimate
    FROM s
    ORDER BY event_type
    """,
)
def streaming_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _hll_out_dir(spark, sf_dir)
    # final register per key = last (max) emission; the monotone stream
    # emits only increases, so max over emissions IS the final state
    reg = (
        spark.read.parquet(out)
        .groupBy("event_type", "bucket")
        .agg(F.max("rnk").alias("r"))
    )
    s = reg.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 32 - least(r, 32))"))
            + (F.lit(_SHLL_M) - F.count(F.lit(1))) * F.lit(4294967296)
        )
        .cast("bigint")
        .alias("s_scaled"),
    )
    return s.select(
        "event_type",
        "n_buckets",
        "s_scaled",
        F.round(F.lit(_SHLL_NUM) / F.col("s_scaled").cast("double"), 4).alias(
            "hll_estimate"
        ),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# streaming_dedup_watermark — the NATIVE dropDuplicatesWithinWatermark
# operator under the hash gate (the built-in sibling of the custom
# applyInPandasWithState first-seen dedup above): (user_id, event_type)
# events land in two checkpointed availableNow batches (event_id
# parity, each batch pre-reduced to one deterministic row per key so
# within-batch processing order cannot pick a winner), watermark delay
# 10 days over a 30-day fixture. Batch 2 therefore exercises every path
# the operator has: rows below the batch-1 watermark are DROPPED AS
# LATE, rows whose key has live batch-1 state (state expires at
# event-time + delay) are DROPPED AS DUPLICATES, and the rest are
# emitted — the oracle restates watermark arithmetic exactly
# (millisecond-truncated event times, Spark's watermark granularity).
# Parity proves the operator's cross-restart state AND its late/expiry
# frontier, bit-for-bit.
#
# Scale: state is one (key → expiry) entry bounded by the delay window,
# the exact shape RocksDB state stores hold at production fan-in.
# --------------------------------------------------------------------------
_DDW_DELAY_DAYS = 10
_DDW_DONE: dict[tuple[str, str], str] = {}


def _ddw_out_dir(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_DDW_DONE, key[0])
    if key in _DDW_DONE:
        from data_ingestion_din_spark.operators.colocate import _dir_ok

        if _dir_ok(_DDW_DONE[key]):
            return _DDW_DONE[key]
        del _DDW_DONE[key]
    from data_ingestion_din_spark.operators.colocate import fresh_app_dir

    base = fresh_app_dir(spark, sf_dir, "spark_graft_ddw")
    landing = os.path.join(base, "landing")
    ckpt = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")

    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    wk = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")

    def run_once() -> None:
        stream = spark.readStream.schema(
            "user_id bigint, event_type string, ts timestamp, event_id bigint"
        ).parquet(landing + "/*")
        q = (
            stream.withWatermark("ts", f"{_DDW_DELAY_DAYS} days")
            .dropDuplicatesWithinWatermark(["user_id", "event_type"])
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_or_raise(q)

    for i, parity in enumerate((0, 1)):
        batch = (
            ev.filter(F.col("event_id") % 2 == parity)
            .withColumn("rk", F.row_number().over(wk))
            .filter(F.col("rk") == 1)
            .drop("rk")
        )
        batch.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(landing, f"b{i}")
        )
        run_once()
    _DDW_DONE[key] = out
    return out


@query(
    "streaming_dedup_watermark",
    oracle=f"""
    WITH b AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
             event_id % 2 AS par,
             row_number() OVER (PARTITION BY user_id, event_type, event_id % 2
                                ORDER BY ts, event_id) AS rk
      FROM events
    ),
    d AS (SELECT * FROM b WHERE rk = 1),
    b1 AS (SELECT * FROM d WHERE par = 0),
    b2 AS (SELECT * FROM d WHERE par = 1),
    -- Spark tracks watermarks at millisecond granularity: wm after
    -- batch 1 = ms-truncated max event time minus the delay
    wm AS (
      SELECT (max(ts_us) // 1000 - {_DDW_DELAY_DAYS * 86_400_000}) * 1000
               AS wm_us
      FROM b1
    ),
    -- Boundary conventions pinned empirically against Spark 4.1.2
    -- (tests/test_streaming.py::test_ddw_boundary_conventions): a row
    -- exactly AT the watermark is dropped as late (keep iff ts > wm,
    -- strict), and state is evicted AT equality (live iff event_us +
    -- delay_us > wm, strict) computed from the UN-truncated event time
    -- (an event whose ms-truncated expiry equals the watermark but
    -- whose microsecond expiry exceeds it stays live). Because the
    -- watermark is always whole milliseconds and equality evicts, the
    -- microsecond comparison below is exact — indistinguishable from
    -- any ceil-to-ms variant.
    keep2 AS (
      SELECT b2.user_id, b2.event_type, b2.ts_us, b2.event_id
      FROM b2 CROSS JOIN wm
      LEFT JOIN b1 ON b1.user_id = b2.user_id
                  AND b1.event_type = b2.event_type
      WHERE b2.ts_us > wm.wm_us         -- not late (strict: wm row is late)
        AND (b1.user_id IS NULL          -- new key, or batch-1 state
             OR b1.ts_us + CAST({_DDW_DELAY_DAYS * 86_400_000_000} AS BIGINT)
                <= wm.wm_us)             -- already expired at batch end
    )
    SELECT user_id, event_type, ts_us, CAST(event_id AS BIGINT) AS event_id
    FROM (SELECT user_id, event_type, ts_us, event_id FROM b1
          UNION ALL SELECT * FROM keep2)
    ORDER BY user_id, event_type
    """,
)
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back the two-run dropDuplicatesWithinWatermark output. The
    oracle's late/expiry boundary conventions (strict > for not-late,
    <= for expired) are pinned by the boundary probe in
    tests/test_streaming.py::test_ddw_boundary_conventions, so parity
    holds even for fixtures with events exactly on a boundary."""
    out = _ddw_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
            F.col("event_id").cast("bigint").alias("event_id"),
        )
        .orderBy("user_id", "event_type")
    )


# --------------------------------------------------------------------------
# streaming_curation_funnel — the batch curation funnel
# (plans/text_pipeline.corpus_curation_funnel) run INCREMENTALLY, the
# way production ingest actually runs it: each checkpointed availableNow
# landing is scored and gated per batch, exact-deduped against the
# CUMULATIVE seen-fingerprint table (a duplicate of anything previously
# gated+deduped is dropped, even if the budget later cut the original),
# and budget-admitted against the CUMULATIVE per-language token
# consumption — greedy continuation, not a per-batch reset. State lives
# in the sink's own parquet tables (seen fps, per-lang consumed), the
# foreachBatch analog of the Delta/stateful pattern; restart recovery
# is exercised because the two landings run as two separate streams
# over one checkpoint.
#
# Conventions (restated exactly by the oracle): seen-fp state grows
# from the post-gate, post-dedup stage (pre-budget); within-batch
# dedup keeps min doc_id per fp; budget admission orders quality desc,
# doc_id asc per language and admits while cumulative tokens (including
# prior batches' consumption) stay <= the corpus budget.
#
# Scale: per batch this is one fp shuffle + a plain left_anti
# equi-join against the fp state and a per-lang window — the batch
# funnel's shape. The fp state grows with the CORPUS, not the batch,
# so it must never carry a broadcast hint (that would pin billions of
# rows into every executor at 100 TB); with no hint the anti-join
# shuffles only on fp and AQE may still pick broadcast while the state
# is genuinely small. Same rule as _minhash_index_processor below:
# no forced broadcast on any state-side join.
# --------------------------------------------------------------------------
_SCF_DONE: dict[tuple[str, str], str] = {}


def _funnel_processor(out: str, fp_state: str, lang_state: str):
    """Build the foreachBatch funnel processor over the given audit/state
    dirs. Module-level so the replay-idempotence test can drive it
    directly (same batch + same epoch twice must leave audit and state
    byte-identical — the exactly-once contract under foreachBatch's
    at-least-once delivery)."""
    from pyspark.sql.window import Window as W

    from data_ingestion_din_spark.functions.analysis import (
        fingerprint,
        lang_id,
        quality_score,
        tokens,
    )
    from data_ingestion_din_spark.plans.text_pipeline import _CUR_BUDGET

    def _plan(
        batch_df: DataFrame, epoch_id: int
    ) -> dict[str, DataFrame] | None:
        """Build this batch's output DataFrames (audit rows, new
        fingerprints, per-lang consumption increment) WITHOUT writing
        state — split from _process so tests can pin the per-batch
        physical plans (tests/test_plan_assertions.py).

        NOT a pure plan builder: it runs eager localCheckpoints (so the
        scored/deduped stages are computed once, not re-derived per
        consumer) and a bounded collect() of per-language consumption —
        it executes jobs, it just writes nothing. Returns None for an
        empty (checkpoint-recovery) batch, whose stage rows would
        otherwise stamp NULL batch_par into the audit."""
        if batch_df.isEmpty():
            return None
        toks = tokens(F.col("text"))
        scored = batch_df.select(
            "doc_id",
            (F.col("doc_id") % 2).cast("int").alias("batch_par"),
            fingerprint(F.col("text")).alias("fp"),
            F.size(toks).cast("bigint").alias("n_tokens"),
            lang_id(F.col("text"), toks).alias("lang_guess"),
            quality_score(F.col("text"), toks).alias("quality"),
        ).localCheckpoint(eager=True)
        gated = scored.filter(
            (F.col("quality") >= 0.5) & (F.col("lang_guess") != "unk")
        )
        within = (
            gated.withColumn(
                "rn",
                F.row_number().over(W.partitionBy("fp").orderBy("doc_id")),
            )
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        spark_l = batch_df.sparkSession
        # State layout is epoch-keyed for EXACTLY-ONCE under foreachBatch
        # replay (at-least-once delivery): every write below is an
        # idempotent overwrite of this epoch's own partition, and every
        # read filters to epochs STRICTLY BEFORE the current one — a
        # replayed batch neither double-counts its earlier failed
        # attempt's state nor anti-joins against its own fingerprints.
        def _prior_epochs(path: str, col: str):
            if not os.path.isdir(path):
                return None
            return (
                spark_l.read.option("basePath", path)
                .parquet(path)
                .filter(F.col("epoch") < epoch_id)
                .select(col)
            )

        # NO broadcast hint here: `seen` is the cumulative corpus-wide
        # fingerprint set (grows every epoch). A plain equi-anti-join
        # shuffles only on fp; AQE is free to broadcast while the state
        # is small but is never forced to once it isn't.
        seen = _prior_epochs(fp_state, "fp")
        if seen is not None:
            deduped = within.join(
                seen, "fp", "left_anti"
            ).localCheckpoint(eager=True)
        else:
            deduped = within.localCheckpoint(eager=True)
        if os.path.isdir(lang_state):
            consumed = {
                r["lang_guess"]: r["c"]
                for r in spark_l.read.option("basePath", lang_state)
                .parquet(lang_state)
                .filter(F.col("epoch") < epoch_id)
                .groupBy("lang_guess")
                .agg(F.sum("consumed").alias("c"))
                .collect()
            }
        else:
            consumed = {}
        cons_expr = F.coalesce(
            *(
                [
                    F.when(
                        F.col("lang_guess") == lg, F.lit(c).cast("bigint")
                    )
                    for lg, c in sorted(consumed.items())
                ]
                + [F.lit(0).cast("bigint")]
            )
        )
        budgeted = (
            deduped.withColumn(
                "cum_tokens",
                F.sum("n_tokens").over(
                    W.partitionBy("lang_guess")
                    .orderBy(F.desc("quality"), "doc_id")
                    .rowsBetween(W.unboundedPreceding, W.currentRow)
                )
                + cons_expr,
            )
            .filter(F.col("cum_tokens") <= _CUR_BUDGET)
            .localCheckpoint(eager=True)
        )

        # the landing batch is parity-homogeneous and never empty, so one
        # driver-side scalar labels every stage row (a later stage CAN be
        # empty — deriving the label from its own rows would emit NULL)
        par_val = scored.agg(F.min("batch_par")).first()[0]

        def stage(ord_: int, name: str, df: DataFrame) -> DataFrame:
            return df.groupBy().agg(
                F.lit(par_val).cast("int").alias("batch_par"),
                F.lit(ord_).cast("int").alias("stage_ord"),
                F.lit(name).alias("stage"),
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.coalesce(F.sum("n_tokens"), F.lit(0))
                .cast("bigint")
                .alias("n_tokens"),
            )

        audit = (
            stage(0, "input", scored)
            .unionByName(stage(1, "quality_lang_gate", gated))
            .unionByName(stage(2, "exact_dedup_incr", deduped))
            .unionByName(stage(3, "token_budget_incr", budgeted))
        )
        new_cons = sorted(
            (r["lang_guess"], r["t"])
            for r in budgeted.groupBy("lang_guess")
            .agg(F.sum("n_tokens").cast("bigint").alias("t"))
            .collect()
        )
        new_lang = spark_l.createDataFrame(
            new_cons, "lang_guess string, consumed bigint"
        )
        return {
            "audit": audit,
            "new_fps": deduped.select("fp"),
            "new_lang": new_lang,
        }

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        dfs = _plan(batch_df, epoch_id)
        # None = empty (checkpoint-recovery) batch — write nothing
        if dfs is None:
            return
        # all three writes are per-epoch overwrites (idempotent on
        # replay — a re-run of this epoch rewrites identical content):
        # the audit partition, this epoch's new fingerprints, and this
        # epoch's per-lang consumption INCREMENT (cumulative totals are
        # derived by summing prior epochs at read time, so a replay
        # cannot double-add)
        ep = f"epoch={epoch_id}"
        dfs["audit"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, ep)
        )
        dfs["new_fps"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(fp_state, ep)
        )
        dfs["new_lang"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(lang_state, ep)
        )

    _process.plan = _plan
    return _process


def _run_split_landings(
    spark: SparkSession, base: str, schema: str, halves, process
) -> None:
    """Write each split DataFrame as its own landing batch and drain it
    with a checkpointed availableNow run of ``foreachBatch(process)`` —
    the ONE multi-restart proof harness behind every incremental state
    sink (curation funnel, MinHash index, SCD2 maintainer, snapshot
    merger): a trigger/checkpoint fix lands once."""
    landing = os.path.join(base, "landing")
    ckpt = os.path.join(base, "ckpt")

    def run_once() -> None:
        stream = spark.readStream.schema(schema).parquet(landing + "/*")
        q = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_or_raise(q)

    for i, half in enumerate(halves):
        half.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(landing, f"b{i}")
        )
        run_once()


def _run_doc_parity_landings(
    spark: SparkSession, sf_dir: str, base: str, process
) -> None:
    """documents split by doc_id parity through _run_split_landings."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    _run_split_landings(
        spark,
        base,
        "doc_id bigint, text string",
        [docs.filter(F.col("doc_id") % 2 == p) for p in (0, 1)],
        process,
    )


def _scf_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SCF_DONE, key[0])
    if key in _SCF_DONE:
        if _dir_ok(_SCF_DONE[key]):
            return _SCF_DONE[key]
        del _SCF_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_scf")
    out = os.path.join(base, "out")
    _process = _funnel_processor(
        out, os.path.join(base, "state_fps"), os.path.join(base, "state_lang")
    )
    _run_doc_parity_landings(spark, sf_dir, base, _process)
    _SCF_DONE[key] = out
    return out


def _scf_oracle() -> str:
    from data_ingestion_din_spark.plans.text_pipeline import (
        _CUR_BUDGET,
        _STOP_LIST_SQL,
        _TOKS_SQL,
    )

    def funnel_stage(par: int, ord_: int, name: str, src: str) -> str:
        return (
            f"SELECT {par} AS batch_par, {ord_} AS stage_ord,"
            f" '{name}' AS stage,"
            f" CAST(count(*) AS BIGINT) AS n_docs,"
            f" CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens"
            f" FROM {src}"
        )

    stages = []
    for par in (0, 1):
        stages += [
            funnel_stage(par, 0, "input", f"(SELECT * FROM scored WHERE par = {par})"),
            funnel_stage(par, 1, "quality_lang_gate", f"(SELECT * FROM gated WHERE par = {par})"),
            funnel_stage(par, 2, "exact_dedup_incr", f"d{par}"),
            funnel_stage(par, 3, "token_budget_incr", f"b{par}"),
        ]
    union = " UNION ALL ".join(stages)
    return f"""
    WITH t AS (SELECT doc_id, text, doc_id % 2 AS par, {_TOKS_SQL} AS toks
               FROM documents),
    s AS (
      SELECT doc_id, par,
             len(toks) AS n_tok,
             len(list_filter(toks, x -> list_contains({_STOP_LIST_SQL}, x)))
               AS n_stop,
             length(regexp_replace(text, '[^A-Za-z0-9฀-๿]', '', 'g'))
               AS n_word,
             length(regexp_replace(text, '[^฀-๿]', '', 'g')) AS n_thai,
             length(text) AS n_chars,
             md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
      FROM t
    ),
    scored AS (
      SELECT doc_id, par, fp,
             CAST(n_tok AS BIGINT) AS n_tokens,
             CASE
               WHEN n_thai / greatest(n_chars, 1) > 0.3 THEN 'th'
               WHEN n_stop / greatest(n_tok, 1) > 0.02 THEN 'en'
               ELSE 'unk'
             END AS lang_guess,
             least(n_tok / 20.0, 1.0) * 0.4
               + (n_word / greatest(n_chars, 1)) * 0.3
               + least((n_stop / greatest(n_tok, 1)) / 0.1, 1.0) * 0.3
               AS quality
      FROM s
    ),
    gated AS (
      SELECT * FROM scored WHERE quality >= 0.5 AND lang_guess <> 'unk'
    ),
    d0 AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM gated WHERE par = 0
      ) WHERE rn = 1
    ),
    b0 AS (
      SELECT * FROM (
        SELECT doc_id, lang_guess, n_tokens,
               sum(n_tokens) OVER (
                 PARTITION BY lang_guess
                 ORDER BY quality DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM d0
      ) WHERE cum <= {_CUR_BUDGET}
    ),
    d1 AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM gated WHERE par = 1
      ) WHERE rn = 1 AND fp NOT IN (SELECT fp FROM d0)
    ),
    cons AS (
      SELECT lang_guess, sum(n_tokens) AS c FROM b0 GROUP BY lang_guess
    ),
    b1 AS (
      SELECT * FROM (
        SELECT d1.doc_id, d1.lang_guess, d1.n_tokens,
               sum(d1.n_tokens) OVER (
                 PARTITION BY d1.lang_guess
                 ORDER BY d1.quality DESC, d1.doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) + coalesce(cons.c, 0) AS cum
        FROM d1 LEFT JOIN cons ON cons.lang_guess = d1.lang_guess
      ) WHERE cum <= {_CUR_BUDGET}
    )
    SELECT CAST(batch_par AS INT) AS batch_par,
           CAST(stage_ord AS INT) AS stage_ord,
           stage, n_docs, n_tokens
    FROM ({union})
    ORDER BY batch_par, stage_ord
    """


@query("streaming_curation_funnel", oracle=_scf_oracle())
def streaming_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back the two-batch incremental funnel audit; the oracle
    re-walks both batch funnels with the same cumulative-dedup and
    budget-continuation conventions (see _scf_out_dir), so parity
    proves the foreachBatch state tables survived the checkpointed
    restart between landings."""
    out = _scf_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select("batch_par", "stage_ord", "stage", "n_docs", "n_tokens")
        .orderBy("batch_par", "stage_ord")
    )


# --------------------------------------------------------------------------
# streaming_minhash_index — NEAR-dup dedup at ingest, the MinHash
# sibling of the funnel's exact-fp dedup and the streaming twin of the
# batch dedup_incremental_batch: each checkpointed availableNow landing
# is signed (8-hash MinHash over 3-gram shingles), probed against the
# cumulative SIGNATURE index built by the prior landings (band-key
# equi-join, never all-pairs and never corpus-self-join), verified by
# signature agreement (>= 4 of 8 slots == estimated Jaccard >= 0.5 —
# the production index stores signatures, not texts, so the estimate IS
# the verification it can run), and every batch doc gets a dup verdict
# plus its signatures appended to the index. State is epoch-keyed
# parquet with idempotent overwrites / prior-epoch reads, the same
# exactly-once-under-replay layout as the curation funnel.
#
# Scale: per landing, cost is O(batch bands + matched index band rows);
# the index grows with the corpus but is touched only through the
# band_key equi-join — exactly how a nightly 100 TB ingest probes its
# materialized band index.
# --------------------------------------------------------------------------
_SMI_HASHES, _SMI_BANDS = 8, 4
_SMI_R = _SMI_HASHES // _SMI_BANDS
_SMI_MIN_AGREE = 4  # >= 4/8 slots == estimated jaccard >= 0.5
_SMI_DONE: dict[tuple[str, str], str] = {}


def _smi_band_keys():
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    F.lit(f"b{j}"),
                    *[
                        F.col(f"mh{j * _SMI_R + i}").cast("string")
                        for i in range(_SMI_R)
                    ],
                )
            )
            for j in range(_SMI_BANDS)
        ]
    )


def _minhash_index_processor(out: str, sig_state: str):
    """foreachBatch processor over (decisions, signature-index) dirs —
    module-level for the replay test, like _funnel_processor."""
    from pyspark.sql.window import Window as W

    from data_ingestion_din_spark.functions.analysis import (
        tokens,
        word_shingles,
    )
    from data_ingestion_din_spark.functions.hashing import with_minhash

    mh_cols = [f"mh{i}" for i in range(_SMI_HASHES)]

    def _plan(batch_df: DataFrame, epoch_id: int) -> dict[str, DataFrame]:
        """Build this batch's (decisions, new signatures) without
        writing — exposed for the plan-shape tests."""
        spark_l = batch_df.sparkSession
        sh_arr = F.array_distinct(
            word_shingles(tokens(F.col("text")), 3)
        )
        sh_base = batch_df.select("doc_id", sh_arr.alias("sh")).filter(
            F.size("sh") > 0
        )
        sigs = with_minhash(
            sh_base, F.col("sh"), _SMI_HASHES, keep=["doc_id"]
        ).localCheckpoint(eager=True)

        if os.path.isdir(sig_state):
            prior = (
                spark_l.read.option("basePath", sig_state)
                .parquet(sig_state)
                .filter(F.col("epoch") < epoch_id)
                .select("doc_id", *mh_cols)
            )
        else:
            prior = None

        if prior is not None:
            b_bands = sigs.select(
                F.col("doc_id").alias("batch_id"),
                F.explode(_smi_band_keys()).alias("band_key"),
            )
            p_bands = prior.select(
                F.col("doc_id").alias("corpus_id"),
                F.explode(_smi_band_keys()).alias("band_key"),
            )
            cand = (
                b_bands.join(p_bands, "band_key")
                .select("batch_id", "corpus_id")
                .distinct()
            )
            agree = sum(
                F.when(
                    F.col(f"a_mh{i}") == F.col(f"b_mh{i}"), 1
                ).otherwise(0)
                for i in range(_SMI_HASHES)
            )
            ver = (
                cand.join(
                    sigs.select(
                        F.col("doc_id").alias("batch_id"),
                        *[F.col(m).alias(f"a_{m}") for m in mh_cols],
                    ),
                    "batch_id",
                )
                .join(
                    prior.select(
                        F.col("doc_id").alias("corpus_id"),
                        *[F.col(m).alias(f"b_{m}") for m in mh_cols],
                    ),
                    "corpus_id",
                )
                .withColumn("n_agree", agree.cast("int"))
                .filter(F.col("n_agree") >= _SMI_MIN_AGREE)
            )
            best = (
                ver.withColumn(
                    "rk",
                    F.row_number().over(
                        W.partitionBy("batch_id").orderBy(
                            F.desc("n_agree"), "corpus_id"
                        )
                    ),
                )
                .filter(F.col("rk") == 1)
                .select("batch_id", "corpus_id", "n_agree")
            )
        else:
            best = spark_l.createDataFrame(
                [], "batch_id bigint, corpus_id bigint, n_agree int"
            )

        decisions = (
            batch_df.select("doc_id")
            .join(best, F.col("doc_id") == F.col("batch_id"), "left")
            .select(
                "doc_id",
                F.col("corpus_id").isNotNull().alias("is_dup"),
                F.col("corpus_id").cast("bigint").alias("matched_doc"),
                F.col("n_agree").cast("int").alias("n_agree"),
            )
        )
        return {
            "decisions": decisions,
            "new_sigs": sigs.select("doc_id", *mh_cols),
        }

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dfs = _plan(batch_df, epoch_id)
        ep = f"epoch={epoch_id}"
        dfs["decisions"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, ep)
        )
        dfs["new_sigs"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(sig_state, ep)
        )

    _process.plan = _plan
    return _process


def _smi_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SMI_DONE, key[0])
    if key in _SMI_DONE:
        if _dir_ok(_SMI_DONE[key]):
            return _SMI_DONE[key]
        del _SMI_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_smi")
    out = os.path.join(base, "out")
    _process = _minhash_index_processor(out, os.path.join(base, "sigs"))
    _run_doc_parity_landings(spark, sf_dir, base, _process)
    _SMI_DONE[key] = out
    return out


def _smi_oracle() -> str:
    from data_ingestion_din_spark.functions.hashing import (
        h32_sql,
        minhash_slot_sql,
    )

    # minhash_slot_sql already carries its "AS mh{i}" alias
    slots = ", ".join(minhash_slot_sql(i) for i in range(_SMI_HASHES))

    def band_sql(j: int) -> str:
        cols = " || ',' || ".join(
            f"CAST(mh{j * _SMI_R + i} AS VARCHAR)" for i in range(_SMI_R)
        )
        return f"md5('b{j}' || ',' || {cols})"

    bands_union = "\n      UNION ALL ".join(
        f"SELECT doc_id, {band_sql(j)} AS band_key FROM sig"
        for j in range(_SMI_BANDS)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)"
        for i in range(_SMI_HASHES)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    idx AS (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks),
    sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
      FROM idx
    ),
    shh AS (SELECT doc_id, {h32_sql("shingle")} AS hb FROM sh),
    sig AS (SELECT doc_id, {slots} FROM shh GROUP BY doc_id),
    bands AS ({bands_union}),
    cand AS (
      SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
      FROM bands a JOIN bands b
        ON a.band_key = b.band_key
       AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
    ),
    ver AS (
      SELECT c.batch_id, c.corpus_id, {agree} AS n_agree
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.batch_id
      JOIN sig sb ON sb.doc_id = c.corpus_id
      WHERE {agree} >= {_SMI_MIN_AGREE}
    ),
    best AS (
      SELECT batch_id, corpus_id, n_agree,
             row_number() OVER (
               PARTITION BY batch_id ORDER BY n_agree DESC, corpus_id
             ) AS rk
      FROM ver
    )
    SELECT d.doc_id,
           (b.corpus_id IS NOT NULL) AS is_dup,
           CAST(b.corpus_id AS BIGINT) AS matched_doc,
           CAST(b.n_agree AS INT) AS n_agree
    FROM documents d
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON b.batch_id = d.doc_id
    ORDER BY d.doc_id
    """


@query("streaming_minhash_index", oracle=_smi_oracle())
def streaming_minhash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back the two-landing near-dup verdicts; the oracle restates
    batch-2-vs-batch-1 band candidacy + signature-agreement verification
    (batch-1 docs are all clean — the index was empty), so hash parity
    proves the signature index survived the checkpointed restart."""
    out = _smi_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select("doc_id", "is_dup", "matched_doc", "n_agree")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# streaming_phash_index — NEAR-dup dedup at ingest for the MEDIA column,
# the pHash sibling of streaming_minhash_index (text ✓ r6; this closes
# the ingest-time dedup story across both modalities): each checkpointed
# availableNow landing's payloads are pHashed ONCE (the Arrow stage runs
# on the batch only, never re-hashing the corpus), probed against the
# cumulative 64-bit-band index built by prior landings via the
# (band_id, band_value) equi-join — never all-pairs, never a broadcast
# of the growing index — verified by total Hamming distance <= K over
# the four 16-bit bands (bit_count(xor), integer-exact), and each
# batch's bands are appended to the index. Best match per batch path is
# min Hamming (path tiebreak). State is epoch-keyed parquet with
# idempotent overwrites / prior-epoch-only reads — the same
# exactly-once-under-replay layout as the funnel and the MinHash index.
#
# Scale: per landing, cost is O(batch bands + matched index band rows);
# the index grows with the corpus but is touched only through the band
# equi-join (shuffle keyed by (band_id, 16-bit value)), exactly how a
# nightly media ingest probes its materialized fingerprint index.
# --------------------------------------------------------------------------
_SPI_DONE: dict[tuple[str, str], str] = {}


def _phash_index_processor(out: str, ph_state: str):
    """foreachBatch processor over (decisions, band-index) dirs —
    module-level for the replay-idempotence and plan-shape tests, like
    _funnel_processor / _minhash_index_processor."""
    from pyspark.sql.window import Window as W

    from data_ingestion_din_spark.plans.multimodal_queries import (
        _PH_K,
        media_frame,
    )
    from data_ingestion_din_spark.sources.binary import phash_media

    band_cols = ["b0", "b1", "b2", "b3"]

    def _plan(batch_df: DataFrame, epoch_id: int) -> dict[str, DataFrame]:
        """Build this batch's (decisions, new band hashes) without
        writing — exposed for the plan-shape tests."""
        spark_l = batch_df.sparkSession
        ph = (
            phash_media(media_frame(batch_df))
            .select("path", *band_cols)
            .localCheckpoint(eager=True)
        )

        if os.path.isdir(ph_state):
            prior = (
                spark_l.read.option("basePath", ph_state)
                .parquet(ph_state)
                .filter(F.col("epoch") < epoch_id)
                .select("path", *band_cols)
            )
        else:
            prior = None

        if prior is not None:
            def bands(df: DataFrame, name: str):
                return df.select(
                    F.col("path").alias(name),
                    F.posexplode(F.array(*band_cols)).alias("bid", "bv"),
                )

            # plain equi-join on (bid, bv): the index side grows with
            # the corpus, so — state-side-join rule — no broadcast hint
            cand = (
                bands(ph, "batch_path")
                .join(bands(prior, "corpus_path"), ["bid", "bv"])
                .select("batch_path", "corpus_path")
                .distinct()
            )
            ham = sum(
                F.bit_count(
                    F.col(f"a_{c}").bitwiseXOR(F.col(f"c_{c}"))
                )
                for c in band_cols
            )
            ver = (
                cand.join(
                    ph.select(
                        F.col("path").alias("batch_path"),
                        *[F.col(c).alias(f"a_{c}") for c in band_cols],
                    ),
                    "batch_path",
                )
                .join(
                    prior.select(
                        F.col("path").alias("corpus_path"),
                        *[F.col(c).alias(f"c_{c}") for c in band_cols],
                    ),
                    "corpus_path",
                )
                .withColumn("hamming", ham.cast("int"))
                .filter(F.col("hamming") <= _PH_K)
            )
            best = (
                ver.withColumn(
                    "rk",
                    F.row_number().over(
                        W.partitionBy("batch_path").orderBy(
                            "hamming", "corpus_path"
                        )
                    ),
                )
                .filter(F.col("rk") == 1)
                .select("batch_path", "corpus_path", "hamming")
            )
        else:
            best = spark_l.createDataFrame(
                [], "batch_path string, corpus_path string, hamming int"
            )

        decisions = (
            ph.select("path")
            .join(best, F.col("path") == F.col("batch_path"), "left")
            .select(
                "path",
                F.col("corpus_path").isNotNull().alias("is_dup"),
                F.col("corpus_path").alias("matched_path"),
                F.col("hamming").cast("int").alias("hamming"),
            )
        )
        return {"decisions": decisions, "new_hashes": ph}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dfs = _plan(batch_df, epoch_id)
        ep = f"epoch={epoch_id}"
        dfs["decisions"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, ep)
        )
        dfs["new_hashes"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(ph_state, ep)
        )

    _process.plan = _plan
    return _process


def _spi_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SPI_DONE, key[0])
    if key in _SPI_DONE:
        if _dir_ok(_SPI_DONE[key]):
            return _SPI_DONE[key]
        del _SPI_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_spi")
    out = os.path.join(base, "out")
    _process = _phash_index_processor(out, os.path.join(base, "phs"))
    _run_doc_parity_landings(spark, sf_dir, base, _process)
    _SPI_DONE[key] = out
    return out


def _spi_oracle() -> str:
    from data_ingestion_din_spark.plans.multimodal_queries import _PH_CTES

    # reuse the batch pHash CTE chain verbatim (m → cells → bits → ph →
    # bands → cand → pairs); band agreement and Hamming are symmetric,
    # so the (odd batch probes even corpus) verdicts are the pairs
    # restricted to odd→even direction. Even-parity docs landed first
    # against an empty index, so they are all clean (LEFT JOIN null).
    return f"""
    WITH {_PH_CTES},
    sym AS (
      SELECT path_a AS bp, path_b AS cp, hamming FROM pairs
      UNION ALL
      SELECT path_b AS bp, path_a AS cp, hamming FROM pairs
    ),
    par AS (SELECT path, doc_id % 2 AS pr FROM m),
    probe AS (
      SELECT s.bp, s.cp, s.hamming
      FROM sym s
      JOIN par a ON a.path = s.bp
      JOIN par b ON b.path = s.cp
      WHERE a.pr = 1 AND b.pr = 0
    ),
    best AS (
      SELECT bp, cp, hamming,
             row_number() OVER (
               PARTITION BY bp ORDER BY hamming, cp
             ) AS rk
      FROM probe
    )
    SELECT m.path,
           (b.cp IS NOT NULL) AS is_dup,
           b.cp AS matched_path,
           CAST(b.hamming AS INT) AS hamming
    FROM m
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON b.bp = m.path
    ORDER BY m.path
    """


@query("streaming_phash_index", oracle=_spi_oracle())
def streaming_phash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back the two-landing media near-dup verdicts; the oracle
    restates odd-batch-vs-even-corpus band candidacy + Hamming
    verification from the batch pHash CTEs, so hash parity proves the
    band index survived the checkpointed restart."""
    out = _spi_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select("path", "is_dup", "matched_path", "hamming")
        .orderBy("path")
    )


# --------------------------------------------------------------------------
# streaming_scd2_maintenance — incremental TYPE-2 DIMENSION MAINTENANCE,
# the streaming twin of events_scd2_intervals' batch history build and
# the warehouse MERGE pattern every CDC pipeline runs: the event stream
# lands in two time-split checkpointed availableNow batches, and each
# batch continues the dimension table instead of rebuilding it — the
# per-key OPEN version (valid_to IS NULL) is read from state and seeded
# into the batch's change detection as a zero-opens pseudo-event
# carrying its accumulated n_events and version number, so a batch that
# continues the same state EXTENDS the open version (no spurious
# version bump at the batch boundary) and a batch that changes state
# CLOSES it with the new version's valid_from.
#
# State is the emitted history itself, epoch-keyed like the funnel and
# the signature index (idempotent overwrites, prior-epoch reads,
# latest-epoch-wins per (user_id, version) at read time — closed rows
# are never rewritten; only the inherited open row is superseded).
#
# THE PROOF: because the landings are time-ordered, incremental
# maintenance must equal a from-scratch rebuild — the oracle IS
# events_scd2_intervals' oracle, verbatim. Hash parity means the
# incremental path produces the byte-identical dimension history the
# batch path would, across a checkpointed restart.
#
# Scale: per batch, one user_id shuffle for the windows + a broadcast-
# able open-rows seed join; history is touched only by the equi-join
# on (user_id, version) at read time.
# --------------------------------------------------------------------------
_SCD2S_DONE: dict[tuple[str, str], str] = {}


def _latest_epoch_rows(
    spark_l: SparkSession, out: str, keys: list[str], before_epoch=None
) -> DataFrame:
    """Current rows of an epoch-keyed incremental state dir: per key
    tuple, the row from the highest epoch (the one epoch-resolution
    rule for every incremental state sink — SCD2, snapshot — so tie
    handling / basePath semantics live once). ``before_epoch`` filters
    to epochs strictly before it (the replay-safe processor-side read);
    None reads all epochs (the query-side read)."""
    from pyspark.sql.window import Window as W

    hist = spark_l.read.option("basePath", out).parquet(out)
    if before_epoch is not None:
        hist = hist.filter(F.col("epoch") < before_epoch)
    return (
        hist.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy(*keys).orderBy(F.desc("epoch"))
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk", "epoch")
    )


def _scd2_processor(out: str):
    """foreachBatch SCD2 maintainer over the epoch-keyed history dir —
    module-level for the replay test, like the funnel/index processors."""
    from pyspark.sql.window import Window as W

    from data_ingestion_din_spark.functions.hashing import h64

    def _plan(batch_df: DataFrame, epoch_id: int) -> DataFrame:
        """Build this batch's history rows without writing — exposed
        for the plan-shape tests."""
        spark_l = batch_df.sparkSession
        ev = batch_df.filter(
            h64(F.concat(F.lit("scd:"), F.col("user_id").cast("string")))
            % 7
            == 0
        ).select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
        )
        cols = "user_id bigint, version int, state string, valid_from bigint, valid_to bigint, is_current int, n_events bigint"
        if os.path.isdir(out):
            latest = _latest_epoch_rows(
                spark_l, out, ["user_id", "version"], before_epoch=epoch_id
            )
            # seed ONLY keys present in this batch (review finding):
            # untouched users' open rows stay current via
            # latest-epoch-wins at read time, so re-emitting them here
            # would turn the incremental write into a per-batch
            # full-dimension rewrite — per-epoch output must stay
            # O(keys touched), like the type-1 twin below
            touched = ev.select("user_id").distinct()
            open_rows = latest.filter(F.col("valid_to").isNull()).join(
                touched, "user_id", "left_semi"
            )
        else:
            open_rows = spark_l.createDataFrame([], cols)

        pseudo = open_rows.select(
            "user_id",
            F.lit(-1).cast("bigint").alias("event_id"),
            F.col("state").alias("event_type"),
            F.col("valid_from").alias("ts_us"),
            F.col("n_events").alias("weight"),
            F.col("version").cast("int").alias("base"),
        )
        real = ev.select(
            "user_id",
            "event_id",
            "event_type",
            "ts_us",
            F.lit(1).cast("bigint").alias("weight"),
            F.lit(None).cast("int").alias("base"),
        )
        comb = pseudo.unionByName(real)
        wo = W.partitionBy("user_id").orderBy("ts_us", "event_id")
        chg = comb.withColumn(
            # the pseudo-event re-opens nothing: it IS the open version
            "opens",
            F.when(F.col("event_id") == -1, F.lit(0))
            .when(
                ~F.lag("event_type").over(wo).eqNullSafe(F.col("event_type")),
                F.lit(1),
            )
            .otherwise(F.lit(0)),
        ).withColumn(
            "base_k",
            F.coalesce(
                F.max("base").over(W.partitionBy("user_id")), F.lit(0)
            ),
        )
        ver = chg.withColumn(
            "version",
            (
                F.col("base_k")
                + F.sum("opens").over(wo.rowsBetween(W.unboundedPreceding, 0))
            ).cast("int"),
        )
        grp = ver.groupBy("user_id", "version").agg(
            F.first("event_type").alias("state"),
            F.min("ts_us").cast("bigint").alias("valid_from"),
            F.sum("weight").cast("bigint").alias("n_events"),
        )
        wv = W.partitionBy("user_id").orderBy("version")
        rows = grp.select(
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
        return rows

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _plan(batch_df, epoch_id).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"epoch={epoch_id}"))

    _process.plan = _plan
    return _process


def _scd2s_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SCD2S_DONE, key[0])
    if key in _SCD2S_DONE:
        if _dir_ok(_SCD2S_DONE[key]):
            return _SCD2S_DONE[key]
        del _SCD2S_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_scd2s")
    out = os.path.join(base, "out")

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    mid = lo + (hi - lo) // 2  # setup-stage scalar: time-split point
    _run_split_landings(
        spark,
        base,
        "user_id bigint, event_id bigint, event_type string, ts timestamp",
        [
            ev.filter(F.unix_micros("ts") <= mid),
            ev.filter(F.unix_micros("ts") > mid),
        ],
        _scd2_processor(out),
    )
    _SCD2S_DONE[key] = out
    return out


@query("streaming_scd2_maintenance", oracle_ref="events_scd2_intervals")
def streaming_scd2_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back the incrementally maintained SCD2 history
    (latest-epoch row per (user_id, version)); the oracle is the BATCH
    rebuild's SQL verbatim — time-ordered landings make incremental
    maintenance provably equal to a from-scratch build, and hash parity
    enforces it across the checkpointed restart."""
    out = _scd2s_out_dir(spark, sf_dir)
    latest = _latest_epoch_rows(spark, out, ["user_id", "version"]).select(
        "user_id",
        "version",
        "state",
        "valid_from",
        "valid_to",
        "is_current",
        "n_events",
    )
    return latest.orderBy("user_id", "version")


# --------------------------------------------------------------------------
# streaming_latest_snapshot — incremental TYPE-1 upsert compaction, the
# streaming twin of events_latest_snapshot (and the simpler sibling of
# streaming_scd2_maintenance's type-2): each checkpointed landing
# merges its per-key winners against the prior snapshot's rows FOR THE
# KEYS IT TOUCHES ONLY (left-semi on the batch's keys — the upsert
# delta; untouched keys' rows remain current via latest-epoch-wins at
# read time). Unlike the SCD2 twin this proof needs NO time ordering:
# argmax(ts, event_id) is associative-merge-able under any split, so
# the landings split by event_id parity and the oracle is STILL
# events_latest_snapshot's SQL verbatim.
#
# Scale: per batch one (user_id, event_type) shuffle for the batch
# winners + an equi-join against the delta history; the full snapshot
# is never rewritten per batch — the write is O(keys touched).
# --------------------------------------------------------------------------
_SNAP_DONE: dict[tuple[str, str], str] = {}


def _snapshot_processor(out: str):
    from pyspark.sql.window import Window as W

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        spark_l = batch_df.sparkSession
        b = batch_df.select(
            F.col("user_id").cast("bigint").alias("user_id"),
            "event_type",
            F.col("event_id").cast("bigint").alias("event_id"),
            F.unix_micros("ts").alias("ts_us"),
            "value",
        )
        if os.path.isdir(out):
            prior = _latest_epoch_rows(
                spark_l,
                out,
                ["user_id", "event_type"],
                before_epoch=epoch_id,
            )
            touched = b.select("user_id", "event_type").distinct()
            cand = b.unionByName(
                prior.join(touched, ["user_id", "event_type"], "left_semi")
            )
        else:
            cand = b
        wk = W.partitionBy("user_id", "event_type").orderBy(
            F.desc("ts_us"), F.desc("event_id")
        )
        winners = (
            cand.withColumn("rk", F.row_number().over(wk))
            .filter(F.col("rk") == 1)
            .drop("rk")
        )
        winners.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, f"epoch={epoch_id}")
        )

    return _process


def _snap_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SNAP_DONE, key[0])
    if key in _SNAP_DONE:
        if _dir_ok(_SNAP_DONE[key]):
            return _SNAP_DONE[key]
        del _SNAP_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_snap")
    out = os.path.join(base, "out")

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    )
    _run_split_landings(
        spark,
        base,
        "user_id bigint, event_id bigint, event_type string, "
        "ts timestamp, value double",
        [ev.filter(F.col("event_id") % 2 == p) for p in (0, 1)],
        _snapshot_processor(out),
    )
    _SNAP_DONE[key] = out
    return out


@query("streaming_latest_snapshot", oracle_ref="events_latest_snapshot")
def streaming_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back the incrementally merged snapshot (latest-epoch row per
    key); the oracle is the batch compaction's SQL verbatim — argmax
    merges associatively under any split, and hash parity enforces it
    across the checkpointed restart."""
    out = _snap_out_dir(spark, sf_dir)
    latest = _latest_epoch_rows(spark, out, ["user_id", "event_type"]).select(
        "user_id", "event_type", "event_id", "ts_us", "value"
    )
    return latest.orderBy("user_id", "event_type")


# --------------------------------------------------------------------------
# streaming_ivf_index — ANN index maintenance at ingest, the streaming
# twin of similarity_ivf_incremental and the third member of the
# at-ingest index family (text MinHash ✓ r6, media pHash ✓ r7, vectors
# here): the FIRST landing (empty state) trains the k=8 coarse
# quantizer on itself (the verified 2-iteration integer-exact Lloyd)
# and commits both its cell assignments and the frozen centroid matrix
# as epoch-keyed state; every later landing reads the centroids
# (bounded k×dims control data — the kmeans-literal rationale, NOT a
# corpus-growing table), routes its vectors with one argmin pass
# (assign_to_centroids: no join, no shuffle on the batch side), and
# appends its assignments. The oracle restates train-on-evens +
# route-odds-against-c1f in SQL (the _km_ctes machinery), so hash
# parity proves the centroid state survived the checkpointed restart
# and the incremental routing ≡ assigning against the same quantizer.
#
# Scale: per landing the cost is O(batch × k·dims) argmin work; the
# assignment state grows with the corpus but is append-only — nothing
# rescans or re-trains it.
# --------------------------------------------------------------------------
_SII_K = 8
_SII_DONE: dict[tuple[str, str], str] = {}


def _ivf_index_processor(out: str, cent_state: str, k: int = _SII_K):
    """foreachBatch processor over (assignments, centroid-state) dirs —
    module-level for the replay test, like the other index processors."""
    from data_ingestion_din_spark.functions.vectors import quantize
    from data_ingestion_din_spark.operators.similarity import (
        assign_to_centroids,
        kmeans_train,
    )

    def _plan(batch_df: DataFrame, epoch_id: int):
        """(assignments, centroid rows or None) for this batch, no
        writes — exposed for the plan-shape tests. Executes jobs when
        training (first landing) or reading the centroid state."""
        spark_l = batch_df.sparkSession
        if os.path.isdir(cent_state):
            prior = (
                spark_l.read.option("basePath", cent_state)
                .parquet(cent_state)
                .filter(F.col("epoch") < epoch_id)
            )
            rows = prior.orderBy("cluster").collect()
        else:
            rows = []
        if rows:
            cents = [list(r.qv) for r in rows]
            routed = assign_to_centroids(
                batch_df.select(
                    "vec_id", quantize(F.col("embedding")).alias("qv")
                ),
                cents,
            ).select("vec_id", "cluster")
            return {
                "assignments": routed.withColumn(
                    "incremental", F.lit(True)
                ),
                "new_cents": None,  # frozen — written once by training
            }
        assigned, cents = kmeans_train(batch_df, k=k, iters=2)
        cent_rows = spark_l.createDataFrame(
            [(c + 1, cents[c]) for c in range(len(cents))],
            "cluster int, qv array<bigint>",
        )
        return {
            "assignments": assigned.withColumn(
                "incremental", F.lit(False)
            ),
            "new_cents": cent_rows,
        }

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dfs = _plan(batch_df, epoch_id)
        ep = f"epoch={epoch_id}"
        dfs["assignments"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, ep)
        )
        if dfs["new_cents"] is not None:
            dfs["new_cents"].coalesce(1).write.mode("overwrite").parquet(
                os.path.join(cent_state, ep)
            )

    _process.plan = _plan
    return _process


def _sii_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SII_DONE, key[0])
    if key in _SII_DONE:
        if _dir_ok(_SII_DONE[key]):
            return _SII_DONE[key]
        del _SII_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_sii")
    out = os.path.join(base, "out")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    _run_split_landings(
        spark,
        base,
        "vec_id bigint, embedding array<float>",
        [emb.filter(F.col("vec_id") % 2 == p) for p in (0, 1)],
        _ivf_index_processor(out, os.path.join(base, "cents")),
    )
    _SII_DONE[key] = out
    return out


def _sii_oracle() -> str:
    from data_ingestion_din_spark.plans.similarity_queries import (
        _KM_DIST,
        _km_ctes,
    )

    return f"""
    WITH {_km_ctes("(SELECT * FROM embeddings WHERE vec_id % 2 = 0)")},
    batch AS (
      SELECT vec_id,
             list_transform(
               embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
             ) AS qv
      FROM embeddings WHERE vec_id % 2 = 1
    ),
    ab AS (
      SELECT q.vec_id, s.cluster
      FROM batch q CROSS JOIN c1f s
      QUALIFY row_number() OVER (
        PARTITION BY q.vec_id ORDER BY {_KM_DIST}, s.cluster) = 1
    )
    SELECT vec_id, CAST(cluster AS INT) AS cluster, FALSE AS incremental
    FROM a2
    UNION ALL
    SELECT vec_id, CAST(cluster AS INT) AS cluster, TRUE AS incremental
    FROM ab
    ORDER BY vec_id
    """


@query("streaming_ivf_index", oracle=_sii_oracle())
def streaming_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back both landings' cell assignments; the oracle restates
    train-on-landing-1 + route-landing-2-against-frozen-centroids, so
    parity proves the quantizer state survived the checkpointed restart
    and incremental routing matches the from-scratch assignment."""
    out = _sii_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select(
            "vec_id",
            F.col("cluster").cast("int").alias("cluster"),
            "incremental",
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# streaming_quality_gate — the model-based quality gate run AT INGEST
# with a FROZEN model, completing the frozen-artifact-at-ingest family
# (IVF quantizer ✓ streaming_ivf_index; the classifier here): the
# FIRST landing trains the vocabulary (top-K words by count in that
# landing, count desc / word asc — the doc_quality_classifier
# construction with hash-derived integer weights) and commits it as
# epoch-keyed state; later landings read the frozen vocab and score
# against it — production never retrains the gate per batch, so batch-2
# docs are scored by batch-1's vocabulary, and the oracle restates
# exactly that (train-on-evens, score-everyone-with-it).
#
# Scale: the vocab is top-K BY CONSTRUCTION → reading it back and
# broadcast-joining it is bounded at K rows regardless of corpus size
# (the legal broadcast class; the corpus-growing tables never get the
# hint). Per landing: one token shuffle for the per-doc sums.
# --------------------------------------------------------------------------
_SQG_K = 400
_SQG_DONE: dict[tuple[str, str], str] = {}


def _quality_gate_processor(out: str, vocab_state: str, k: int = _SQG_K):
    """foreachBatch processor over (verdicts, vocab-state) dirs —
    module-level for the replay test, like the other index processors."""
    from data_ingestion_din_spark.functions.analysis import tokens
    from data_ingestion_din_spark.functions.hashing import h64

    def _plan(batch_df: DataFrame, epoch_id: int):
        spark_l = batch_df.sparkSession
        tok = batch_df.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("w")
        )
        prior = None
        if os.path.isdir(vocab_state):
            prior = (
                spark_l.read.option("basePath", vocab_state)
                .parquet(vocab_state)
                .filter(F.col("epoch") < epoch_id)
                .select("w", "wt")
            )
        # train ONLY when no prior-epoch vocab exists — keyed on the
        # PRIOR-EPOCH rows, not directory existence, so a REPLAYED
        # training epoch (state dir present, no epochs before it)
        # retrains identically instead of scoring against an empty
        # vocab (the 1-row probe is bounded: the vocab is top-K)
        if prior is not None and prior.limit(1).count() > 0:
            vocab = prior
            new_vocab = None  # frozen — written once by the training epoch
        else:
            vocab = (
                tok.groupBy("w")
                .agg(F.count(F.lit(1)).alias("c"))
                .orderBy(F.desc("c"), "w")
                .limit(k)
                .select(
                    "w",
                    (h64(F.col("w")) % 201 - 100).cast("bigint").alias("wt"),
                )
                .localCheckpoint(eager=True)
            )
            new_vocab = vocab
        scored = tok.join(F.broadcast(vocab), "w", "left")
        verdicts = (
            scored.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_tok"),
                F.sum(F.when(F.col("wt").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("oov_tok"),
                F.coalesce(F.sum("wt"), F.lit(0))
                .cast("bigint")
                .alias("logit_sum"),
                F.when(F.coalesce(F.sum("wt"), F.lit(0)) >= 0, 1)
                .otherwise(0)
                .cast("int")
                .alias("passed"),
            )
        )
        return {"verdicts": verdicts, "new_vocab": new_vocab}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dfs = _plan(batch_df, epoch_id)
        ep = f"epoch={epoch_id}"
        dfs["verdicts"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, ep)
        )
        if dfs["new_vocab"] is not None:
            dfs["new_vocab"].coalesce(1).write.mode("overwrite").parquet(
                os.path.join(vocab_state, ep)
            )

    _process.plan = _plan
    return _process


def _sqg_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SQG_DONE, key[0])
    if key in _SQG_DONE:
        if _dir_ok(_SQG_DONE[key]):
            return _SQG_DONE[key]
        del _SQG_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_sqg")
    out = os.path.join(base, "out")
    _process = _quality_gate_processor(out, os.path.join(base, "vocab"))
    _run_doc_parity_landings(spark, sf_dir, base, _process)
    _SQG_DONE[key] = out
    return out


def _sqg_oracle() -> str:
    from data_ingestion_din_spark.functions.hashing import h64_sql

    wt = f"CAST({h64_sql('w')} % 201 - 100 AS BIGINT)"
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS w
      FROM documents
    ),
    vocab AS (
      SELECT w, {wt} AS wt
      FROM (
        SELECT w, count(*) AS c FROM tok WHERE doc_id % 2 = 0
        GROUP BY w ORDER BY c DESC, w LIMIT {_SQG_K}
      )
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tok,
           CAST(sum(CASE WHEN v.wt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS oov_tok,
           CAST(coalesce(sum(v.wt), 0) AS BIGINT) AS logit_sum,
           CAST(CASE WHEN coalesce(sum(v.wt), 0) >= 0 THEN 1 ELSE 0 END
                AS INT) AS passed
    FROM tok t LEFT JOIN vocab v USING (w)
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """


@query("streaming_quality_gate", oracle=_sqg_oracle())
def streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back both landings' verdicts; the oracle restates
    train-vocab-on-landing-1 (even doc_ids) + score-everyone-with-it,
    so hash parity proves the frozen vocabulary survived the
    checkpointed restart and batch 2 was scored by batch 1's model."""
    out = _sqg_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select("doc_id", "n_tok", "oov_tok", "logit_sum", "passed")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# streaming_substring_index — exact duplicated-SUBSTRING detection at
# ingest, closing the last dedup modality without an incremental twin
# (exact-fp ✓ funnel, MinHash ✓ r6, pHash ✓ r7, IVF/quality ✓ r8;
# substring was batch-only): each checkpointed availableNow landing is
# window-fingerprinted ONCE (the stride-1 W-token pass of
# operators/dedup.window_fingerprints — batch side only, never
# re-hashing the corpus), its windows are probed against the CUMULATIVE
# fingerprint index built by prior landings via a plain wfp equi-join
# (no broadcast — the index grows with the corpus, the forbidden
# class), matched windows merge into per-doc interval islands (the
# Lee et al. span shape), and the landing's distinct fingerprints are
# appended to the index. Per-doc verdicts (n_spans, dup_tokens) are
# epoch-keyed with idempotent overwrites / prior-epoch-only reads —
# the same exactly-once-under-replay layout as the sibling indexes.
#
# The oracle restates probe-odds-against-even-fingerprints in SQL
# (batch-1 docs are all zero — the index was empty), so hash parity
# proves the fingerprint index survived the checkpointed restart.
#
# Scale: per landing, cost is O(batch windows + matched index rows
# via the equi-join); only MATCHED instances reach the per-doc island
# window.
# --------------------------------------------------------------------------
_SSI_W = 20  # window length in tokens — same as the batch pass (_SSW)
_SSI_DONE: dict[tuple[str, str], str] = {}


def _substring_index_processor(out: str, wfp_state: str, w: int = _SSI_W):
    """foreachBatch processor over (verdicts, fingerprint-index) dirs —
    module-level for the replay test, like the other index processors."""
    from pyspark.sql.window import Window as W

    from data_ingestion_din_spark.operators.dedup import window_fingerprints

    def _plan(batch_df: DataFrame, epoch_id: int) -> dict[str, DataFrame]:
        spark_l = batch_df.sparkSession
        wins = window_fingerprints(batch_df, w).localCheckpoint(eager=True)
        prior = None
        if os.path.isdir(wfp_state):
            prior = (
                spark_l.read.option("basePath", wfp_state)
                .parquet(wfp_state)
                .filter(F.col("epoch") < epoch_id)
                .select("wfp")
            )
        if prior is not None:
            # plain equi-semi-join: existence in the prior index (the
            # semi join absorbs index duplicates — no distinct pass)
            matched = wins.join(prior, "wfp", "left_semi")
            dwin = W.partitionBy("doc_id").orderBy("start")
            flagged = matched.withColumn(
                "new_island",
                F.when(
                    F.col("start") - F.lag("start").over(dwin) <= w,
                    F.lit(0),
                ).otherwise(F.lit(1)),
            ).withColumn(
                "island",
                F.sum("new_island").over(
                    dwin.rowsBetween(W.unboundedPreceding, W.currentRow)
                ),
            )
            spans = flagged.groupBy("doc_id", "island").agg(
                F.min("start").alias("span_start"),
                (F.max("start") + F.lit(w - 1)).alias("span_end"),
            )
            per_doc = spans.groupBy("doc_id").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_spans"),
                F.sum(F.col("span_end") - F.col("span_start") + 1)
                .cast("bigint")
                .alias("dup_tokens"),
            )
        else:
            per_doc = spark_l.createDataFrame(
                [], "doc_id bigint, n_spans bigint, dup_tokens bigint"
            )
        verdicts = (
            batch_df.select("doc_id")
            .join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("n_spans"), F.lit(0))
                .cast("bigint")
                .alias("n_spans"),
                F.coalesce(F.col("dup_tokens"), F.lit(0))
                .cast("bigint")
                .alias("dup_tokens"),
            )
        )
        # distinct within the landing bounds index growth; cross-landing
        # duplicates are harmless (the probe is a semi-join)
        return {"verdicts": verdicts, "new_wfps": wins.select("wfp").distinct()}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dfs = _plan(batch_df, epoch_id)
        ep = f"epoch={epoch_id}"
        dfs["verdicts"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, ep)
        )
        dfs["new_wfps"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(wfp_state, ep)
        )

    _process.plan = _plan
    return _process


def _ssi_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SSI_DONE, key[0])
    if key in _SSI_DONE:
        if _dir_ok(_SSI_DONE[key]):
            return _SSI_DONE[key]
        del _SSI_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_ssi")
    out = os.path.join(base, "out")
    _process = _substring_index_processor(out, os.path.join(base, "wfps"))
    _run_doc_parity_landings(spark, sf_dir, base, _process)
    _SSI_DONE[key] = out
    return out


def _ssi_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    win AS (
      SELECT doc_id, u.w.s AS start, u.w.f AS wfp
      FROM toks,
      UNNEST([{{'s': i,
               'f': md5(array_to_string(t[i:i+{_SSI_W - 1}], ' '))}}
              FOR i IN range(1, greatest(len(t) - {_SSI_W} + 2, 1))]) AS u(w)
      WHERE len(t) >= {_SSI_W}
    ),
    priorw AS (SELECT DISTINCT wfp FROM win WHERE doc_id % 2 = 0),
    inst AS (
      SELECT doc_id, start FROM win
      WHERE doc_id % 2 = 1 AND wfp IN (SELECT wfp FROM priorw)
    ),
    flagged AS (
      SELECT doc_id, start,
             CASE WHEN start - lag(start) OVER w <= {_SSI_W}
                  THEN 0 ELSE 1 END AS new_island
      FROM inst
      WINDOW w AS (PARTITION BY doc_id ORDER BY start)
    ),
    islands AS (
      SELECT doc_id, start,
             sum(new_island) OVER (PARTITION BY doc_id ORDER BY start
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    spans AS (
      SELECT doc_id, min(start) AS s, max(start) + {_SSI_W - 1} AS e
      FROM islands GROUP BY doc_id, island
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
      FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY d.doc_id
    """


@query("streaming_substring_index", oracle=_ssi_oracle())
def streaming_substring_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back both landings' per-doc duplicated-span verdicts; the
    oracle restates batch-2-windows-vs-batch-1-fingerprint-index (batch-1
    docs are all zero — the index was empty), so hash parity proves the
    fingerprint index survived the checkpointed restart."""
    out = _ssi_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select("doc_id", "n_spans", "dup_tokens")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# streaming_dsir_gate — DSIR data selection run AT INGEST with a FROZEN
# model, completing the frozen-artifact-at-ingest family (classifier ✓
# r8, IVF quantizer ✓ r8, DSIR here): the FIRST landing trains the
# hashed-n-gram log-likelihood-ratio table on itself (the
# corpus_dsir_select construction — target sources vs the rest,
# Laplace-smoothed, octave-quantized to INTEGER log2) and commits it as
# epoch-keyed state; later landings read the frozen table and score
# against it — production scores incoming documents with yesterday's
# importance weights, it does not refit the target distribution per
# batch. The oracle restates train-on-evens + score-everyone-with-it.
#
# Scale: the ratio table is ≤B rows BY CONSTRUCTION (B = 512 hash
# buckets) plus one offset row — bounded control data, the legal
# broadcast class (plan-asserted REQUIRED, like the quality gate's
# vocab); the corpus-growing verdicts are append-only. Per landing: one
# gram-explode shuffle to (doc, bucket) counts.
# --------------------------------------------------------------------------
_SDG_DONE: dict[tuple[str, str], str] = {}


def _dsir_gate_processor(out: str, ratio_state: str):
    """foreachBatch processor over (verdicts, ratio-table-state) dirs —
    module-level for the replay test, like the other index processors."""
    from data_ingestion_din_spark.functions.analysis import tokens
    from data_ingestion_din_spark.functions.hashing import h64
    from data_ingestion_din_spark.plans.curation_queries import (
        _DSIR_B,
        _DSIR_TARGET,
    )

    def intlog2(c):
        return F.length(F.bin(c)).cast("bigint")

    def _plan(batch_df: DataFrame, epoch_id: int):
        spark_l = batch_df.sparkSession
        t = batch_df.select(
            "doc_id", "source", tokens(F.col("text")).alias("toks")
        ).filter(F.size("toks") >= 1)
        grams = t.select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "concat(toks, CASE WHEN size(toks) >= 2 THEN "
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> concat(toks[i - 1], ' ', toks[i])) "
                    "ELSE slice(toks, 1, 0) END)"
                )
            ).alias("g"),
        )
        db = (
            grams.select(
                "doc_id", "source", (h64(F.col("g")) % _DSIR_B).alias("bkt")
            )
            .groupBy("doc_id", "source", "bkt")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .localCheckpoint(eager=True)  # feeds training AND scoring
        )
        prior = None
        if os.path.isdir(ratio_state):
            prior = (
                spark_l.read.option("basePath", ratio_state)
                .parquet(ratio_state)
                .filter(F.col("epoch") < epoch_id)
                .select("bkt", "qlr")
            )
        # train ONLY when no prior-epoch table exists — keyed on the
        # PRIOR-EPOCH rows, not directory existence, so a REPLAYED
        # training epoch retrains identically (the quality-gate replay
        # trap; the 1-row probe is bounded: the table is ≤B+1 rows)
        if prior is not None and prior.limit(1).count() > 0:
            state = prior
            new_ratio = None  # frozen — written once by the training epoch
        else:
            is_tgt = F.col("source").isin(*_DSIR_TARGET)
            ball = (
                db.groupBy("bkt")
                .agg(
                    F.sum(F.when(is_tgt, F.col("n")).otherwise(F.lit(0)))
                    .cast("bigint")
                    .alias("t_n"),
                    F.sum(F.when(~is_tgt, F.col("n")).otherwise(F.lit(0)))
                    .cast("bigint")
                    .alias("r_n"),
                )
                .localCheckpoint(eager=True)  # feeds ratio rows AND totals
            )
            q = ball.filter(F.col("r_n") >= 1).select(
                "bkt",
                (intlog2(F.col("t_n") + 1) - intlog2(F.col("r_n") + 1))
                .cast("bigint")
                .alias("qlr"),
            )
            # the per-doc length offset is a SCALAR of the training
            # totals — stored as the bkt = -1 row of the same table
            # (h64 % B is non-negative, so -1 cannot collide) so the
            # frozen model is ONE artifact that cannot half-evict
            off = ball.agg(
                F.sum("t_n").cast("bigint").alias("t_tot"),
                F.sum("r_n").cast("bigint").alias("r_tot"),
            ).select(
                F.lit(-1).cast("bigint").alias("bkt"),
                (
                    intlog2(F.col("r_tot") + _DSIR_B)
                    - intlog2(F.col("t_tot") + _DSIR_B)
                )
                .cast("bigint")
                .alias("qlr"),
            )
            state = q.unionByName(off).localCheckpoint(eager=True)
            new_ratio = state
        ratio = state.filter(F.col("bkt") >= 0)
        offr = state.filter(F.col("bkt") == -1).select(
            F.col("qlr").alias("off")
        )
        w = (
            db.join(F.broadcast(ratio), "bkt", "left")
            .groupBy("doc_id")
            .agg(
                F.sum("n").cast("bigint").alias("n_grams"),
                F.sum(F.col("n") * F.coalesce(F.col("qlr"), F.lit(0)))
                .cast("bigint")
                .alias("feat_w"),
            )
        )
        scored = w.crossJoin(F.broadcast(offr)).select(
            "doc_id",
            "n_grams",
            (F.col("feat_w") + F.col("n_grams") * F.col("off"))
            .cast("bigint")
            .alias("weight"),
        )
        verdicts = (
            batch_df.select("doc_id")
            .join(scored, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("n_grams"), F.lit(0))
                .cast("bigint")
                .alias("n_grams"),
                F.coalesce(F.col("weight"), F.lit(0))
                .cast("bigint")
                .alias("weight"),
                (F.coalesce(F.col("weight"), F.lit(0)) >= 0).alias(
                    "selected"
                ),
            )
        )
        return {"verdicts": verdicts, "new_ratio": new_ratio}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dfs = _plan(batch_df, epoch_id)
        ep = f"epoch={epoch_id}"
        dfs["verdicts"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, ep)
        )
        if dfs["new_ratio"] is not None:
            dfs["new_ratio"].coalesce(1).write.mode("overwrite").parquet(
                os.path.join(ratio_state, ep)
            )

    _process.plan = _plan
    return _process


def _sdg_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SDG_DONE, key[0])
    if key in _SDG_DONE:
        if _dir_ok(_SDG_DONE[key]):
            return _SDG_DONE[key]
        del _SDG_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_sdg")
    out = os.path.join(base, "out")
    _process = _dsir_gate_processor(out, os.path.join(base, "ratio"))
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    _run_split_landings(
        spark,
        base,
        "doc_id bigint, source string, text string",
        [docs.filter(F.col("doc_id") % 2 == p) for p in (0, 1)],
        _process,
    )
    _SDG_DONE[key] = out
    return out


def _sdg_oracle() -> str:
    from data_ingestion_din_spark.functions.hashing import h64_sql
    from data_ingestion_din_spark.plans.curation_queries import (
        _DSIR_B,
        _DSIR_TGT_SQL,
        _TOKS_SQL,
    )

    def intlog2(x: str) -> str:
        return f"CAST(length(bin({x})) AS BIGINT)"

    return f"""
    WITH t AS (
      SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, source, g FROM t, unnest(toks) AS u(g)
      UNION ALL
      SELECT doc_id, source, toks[i] || ' ' || toks[i + 1] AS g
      FROM t, unnest(range(1, len(toks))) r(i)
      WHERE i < len(toks)
    ),
    db AS (
      SELECT doc_id, source,
             {h64_sql('g')} % {_DSIR_B} AS bkt,
             CAST(count(*) AS BIGINT) AS n
      FROM g GROUP BY doc_id, source, bkt
    ),
    ball AS (
      SELECT bkt,
             CAST(sum(CASE WHEN source IN {_DSIR_TGT_SQL}
                           THEN n ELSE 0 END) AS BIGINT) AS t_n,
             CAST(sum(CASE WHEN source NOT IN {_DSIR_TGT_SQL}
                           THEN n ELSE 0 END) AS BIGINT) AS r_n
      FROM db WHERE doc_id % 2 = 0 GROUP BY bkt
    ),
    tot AS (
      SELECT CAST(sum(t_n) AS BIGINT) AS t_tot,
             CAST(sum(r_n) AS BIGINT) AS r_tot
      FROM ball
    ),
    q AS (
      SELECT bkt,
             {intlog2('t_n + 1')} - {intlog2('r_n + 1')} AS qlr
      FROM ball WHERE r_n >= 1
    ),
    w AS (
      SELECT db.doc_id,
             CAST(sum(db.n) AS BIGINT) AS n_grams,
             CAST(sum(db.n * coalesce(q.qlr, 0)) AS BIGINT) AS feat_w
      FROM db LEFT JOIN q USING (bkt)
      GROUP BY db.doc_id
    ),
    sw AS (
      SELECT w.doc_id, w.n_grams,
             w.feat_w + w.n_grams *
               ({intlog2(f'tot.r_tot + {_DSIR_B}')}
                - {intlog2(f'tot.t_tot + {_DSIR_B}')}) AS weight
      FROM w, tot
    )
    SELECT d.doc_id,
           CAST(coalesce(sw.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(sw.weight, 0) AS BIGINT) AS weight,
           coalesce(sw.weight, 0) >= 0 AS selected
    FROM documents d LEFT JOIN sw USING (doc_id)
    ORDER BY d.doc_id
    """


@query("streaming_dsir_gate", oracle=_sdg_oracle())
def streaming_dsir_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back both landings' selection verdicts; the oracle restates
    train-ratio-table-on-landing-1 (even doc_ids) + score-everyone-with-
    it, so hash parity proves the frozen importance model survived the
    checkpointed restart and batch 2 was weighted by batch 1's model."""
    out = _sdg_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select("doc_id", "n_grams", "weight", "selected")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# streaming_ivfpq_index — the COMPOSED index maintained at ingest,
# the foreachBatch twin of similarity_ivfpq_incremental and the capstone
# of the at-ingest index family (MinHash ✓ pHash ✓ IVF ✓ quality ✓
# DSIR ✓ substring ✓; the IVF row froze only the coarse quantizer —
# a served IVFPQ index must freeze the PQ CODEBOOKS too): the FIRST
# landing trains both artifacts on itself (the verified integer-exact
# Lloyd + PQ machinery) and epoch-commits centroids AND codebooks;
# every later landing reads the two bounded states (k×dims +
# n_sub·k·d_sub ints — control data, the kmeans-literal rationale),
# routes with one argmin pass and encodes with another
# (pq_encode_qv) — zero joins, zero shuffles, zero retraining on the
# batch side. The appended rows are the index's posting-list entries
# (vec_id, cluster, m, code).
#
# Scale: per landing the cost is O(batch × (k·dims + n_sub·k·d_sub))
# argmin work; the posting lists grow append-only.
# --------------------------------------------------------------------------
_SIQ_DONE: dict[tuple[str, str], str] = {}


def _ivfpq_index_processor(
    out: str, cent_state: str, cb_state: str, k: int = _SII_K
):
    """foreachBatch processor over (postings, centroid-state,
    codebook-state) dirs — module-level for the replay test."""
    from data_ingestion_din_spark.functions.vectors import quantize
    from data_ingestion_din_spark.operators.similarity import (
        assign_to_centroids,
        kmeans_train,
        pq_assign,
        pq_encode_qv,
    )

    def _plan(batch_df: DataFrame, epoch_id: int):
        spark_l = batch_df.sparkSession
        crows, brows = [], []
        if os.path.isdir(cent_state):
            crows = (
                spark_l.read.option("basePath", cent_state)
                .parquet(cent_state)
                .filter(F.col("epoch") < epoch_id)
                .orderBy("cluster")
                .collect()
            )
        if os.path.isdir(cb_state):
            brows = (
                spark_l.read.option("basePath", cb_state)
                .parquet(cb_state)
                .filter(F.col("epoch") < epoch_id)
                .orderBy("m", "code")
                .collect()
            )
        if crows and brows:
            cents = [list(r.qv) for r in crows]
            n_sub = 1 + max(r.m for r in brows)
            kk = 1 + max(r.code for r in brows) - 1
            cb = [[None] * kk for _ in range(n_sub)]
            for r in brows:
                cb[r.m][r.code - 1] = list(r.sv)
            qv = batch_df.select(
                "vec_id", quantize(F.col("embedding")).alias("qv")
            )
            routed = assign_to_centroids(qv, cents).select(
                "vec_id", "cluster"
            )
            postings = (
                pq_encode_qv(qv, cb)
                .join(routed, "vec_id")
                .select(
                    "vec_id",
                    "cluster",
                    "m",
                    "code",
                    F.lit(True).alias("incremental"),
                )
            )
            return {
                "postings": postings,
                "new_cents": None,  # frozen — written by training only
                "new_cb": None,
            }
        assigned, cents = kmeans_train(batch_df, k=k, iters=2)
        codes, cb = pq_assign(batch_df, n_sub=4, k=4, iters=1)
        postings = codes.join(assigned, "vec_id").select(
            "vec_id", "cluster", "m", "code", F.lit(False).alias("incremental")
        )
        cent_rows = spark_l.createDataFrame(
            [(c + 1, cents[c]) for c in range(len(cents))],
            "cluster int, qv array<bigint>",
        )
        cb_rows = spark_l.createDataFrame(
            [
                (m, c + 1, cb[m][c])
                for m in range(len(cb))
                for c in range(len(cb[m]))
            ],
            "m int, code int, sv array<bigint>",
        )
        return {
            "postings": postings,
            "new_cents": cent_rows,
            "new_cb": cb_rows,
        }

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dfs = _plan(batch_df, epoch_id)
        ep = f"epoch={epoch_id}"
        dfs["postings"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, ep)
        )
        if dfs["new_cents"] is not None:
            dfs["new_cents"].coalesce(1).write.mode("overwrite").parquet(
                os.path.join(cent_state, ep)
            )
        if dfs["new_cb"] is not None:
            dfs["new_cb"].coalesce(1).write.mode("overwrite").parquet(
                os.path.join(cb_state, ep)
            )

    _process.plan = _plan
    return _process


def _siq_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SIQ_DONE, key[0])
    if key in _SIQ_DONE:
        if _dir_ok(_SIQ_DONE[key]):
            return _SIQ_DONE[key]
        del _SIQ_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_siq")
    out = os.path.join(base, "out")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    _run_split_landings(
        spark,
        base,
        "vec_id bigint, embedding array<float>",
        [emb.filter(F.col("vec_id") % 2 == p) for p in (0, 1)],
        _ivfpq_index_processor(
            out, os.path.join(base, "cents"), os.path.join(base, "cb")
        ),
    )
    _SIQ_DONE[key] = out
    return out


def _siq_oracle() -> str:
    from data_ingestion_din_spark.plans.similarity_queries import (
        _KM_DIST,
        _PQ_D,
        _PQ_DIST,
        _PQ_SUB,
        _km_ctes,
        _pq_ctes,
    )

    return f"""
    WITH {_km_ctes("(SELECT * FROM embeddings WHERE vec_id % 2 = 0)", p="km")},
    bq AS (
      SELECT vec_id,
             list_transform(
               embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
             ) AS qv
      FROM embeddings WHERE vec_id % 2 = 0
    ),
    {_pq_ctes(qsrc="bq")},
    bb AS (
      SELECT vec_id,
             list_transform(
               embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
             ) AS qv
      FROM embeddings WHERE vec_id % 2 = 1
    ),
    ab AS (
      SELECT q.vec_id, s.cluster
      FROM bb q CROSS JOIN kmc1f s
      QUALIFY row_number() OVER (
        PARTITION BY q.vec_id ORDER BY {_KM_DIST}, s.cluster) = 1
    ),
    bsub AS (
      SELECT vec_id, m,
             list_slice(qv, m * {_PQ_D} + 1, m * {_PQ_D} + {_PQ_D}) AS sv
      FROM bb, range(0, {_PQ_SUB}) t(m)
    ),
    bcodes AS (
      SELECT s.vec_id, s.m, c.code
      FROM bsub s JOIN c1f c ON c.m = s.m
      QUALIFY row_number() OVER (
        PARTITION BY s.vec_id, s.m ORDER BY {_PQ_DIST}, c.code) = 1
    )
    SELECT co.vec_id, CAST(a.cluster AS INT) AS cluster,
           CAST(co.m AS INT) AS m, CAST(co.code AS INT) AS code,
           FALSE AS incremental
    FROM codes co JOIN kma2 a ON a.vec_id = co.vec_id
    UNION ALL
    SELECT co.vec_id, CAST(a.cluster AS INT) AS cluster,
           CAST(co.m AS INT) AS m, CAST(co.code AS INT) AS code,
           TRUE AS incremental
    FROM bcodes co JOIN ab a ON a.vec_id = co.vec_id
    ORDER BY vec_id, m
    """


@query("streaming_ivfpq_index", oracle=_siq_oracle())
def streaming_ivfpq_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back both landings' posting-list entries; the oracle
    restates train-both-artifacts-on-landing-1 + route-and-encode-
    landing-2-against-the-frozen-states, so hash parity proves BOTH the
    quantizer and the codebooks survived the checkpointed restart."""
    out = _siq_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select(
            "vec_id",
            F.col("cluster").cast("int").alias("cluster"),
            F.col("m").cast("int").alias("m"),
            F.col("code").cast("int").alias("code"),
            "incremental",
        )
        .orderBy("vec_id", "m")
    )


# --------------------------------------------------------------------------
# streaming_ivfpq_serve — close the loop: serve a top-k query FROM the
# index streaming_ivfpq_index just maintained. The posting lists (the
# streamed epoch-keyed parquet), the frozen centroid state (routes the
# probe) and the frozen codebook state (builds the probe's ADC table)
# are all read back from the maintained artifacts — nothing is
# recomputed from the corpus except the final exact rerank over the
# ≤20-row shortlist. This is the contract an index maintainer must
# honor: the thing it appends to IS the thing production serves, and
# hash parity against the from-scratch oracle proves it.
#
# Scale: the probe touches ONE cell's posting rows (cluster =
# partition key at scale), scoring is integer lookups, and the only
# full-vector reads are the shortlist's.
# --------------------------------------------------------------------------
def _siq_serve_oracle() -> str:
    from data_ingestion_din_spark.functions.vectors import cosine_exact_sql
    from data_ingestion_din_spark.plans.similarity_queries import (
        _KM_DIST,
        _PQ_D,
        _PQ_DIST,
        _PQ_SUB,
        _km_ctes,
        _pq_ctes,
    )

    return f"""
    WITH {_km_ctes("(SELECT * FROM embeddings WHERE vec_id % 2 = 0)", p="km")},
    bq AS (
      SELECT vec_id,
             list_transform(
               embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
             ) AS qv
      FROM embeddings WHERE vec_id % 2 = 0
    ),
    {_pq_ctes(qsrc="bq")},
    bb AS (
      SELECT vec_id,
             list_transform(
               embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
             ) AS qv
      FROM embeddings WHERE vec_id % 2 = 1
    ),
    ab AS (
      SELECT q.vec_id, s.cluster
      FROM bb q CROSS JOIN kmc1f s
      QUALIFY row_number() OVER (
        PARTITION BY q.vec_id ORDER BY {_KM_DIST}, s.cluster) = 1
    ),
    bsub AS (
      SELECT vec_id, m,
             list_slice(qv, m * {_PQ_D} + 1, m * {_PQ_D} + {_PQ_D}) AS sv
      FROM bb, range(0, {_PQ_SUB}) t(m)
    ),
    bcodes AS (
      SELECT s.vec_id, s.m, c.code
      FROM bsub s JOIN c1f c ON c.m = s.m
      QUALIFY row_number() OVER (
        PARTITION BY s.vec_id, s.m ORDER BY {_PQ_DIST}, c.code) = 1
    ),
    allp AS (
      SELECT co.vec_id, a.cluster, co.m, co.code
      FROM codes co JOIN kma2 a ON a.vec_id = co.vec_id
      UNION ALL
      SELECT co.vec_id, a.cluster, co.m, co.code
      FROM bcodes co JOIN ab a ON a.vec_id = co.vec_id
    ),
    pc AS (SELECT cluster FROM kma2 WHERE vec_id = 0),
    sh AS (
      SELECT p.vec_id, CAST(sum(a.dpart) AS BIGINT) AS adc_dist
      FROM allp p
      JOIN adc a ON a.m = p.m AND a.code = p.code
      CROSS JOIN pc
      WHERE p.vec_id <> 0 AND p.cluster = pc.cluster
      GROUP BY p.vec_id
      ORDER BY adc_dist, p.vec_id
      LIMIT 20
    )
    SELECT e.vec_id, sh.adc_dist,
           {cosine_exact_sql('e.embedding', 'qq.embedding')} AS cos_sim
    FROM sh JOIN embeddings e ON e.vec_id = sh.vec_id
    CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) qq
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
    """


@query("streaming_ivfpq_serve", oracle=_siq_serve_oracle())
def streaming_ivfpq_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.vectors import (
        cosine_exact,
        quantize,
    )
    from data_ingestion_din_spark.plans.similarity_queries import _adc_expr

    out = _siq_out_dir(spark, sf_dir)
    base = os.path.dirname(out)
    # the two frozen artifacts, read back from the MAINTAINED state
    # (bounded control data: k×dims + n_sub·k·d_sub ints)
    crows = (
        spark.read.parquet(os.path.join(base, "cents"))
        .orderBy("cluster")
        .collect()
    )
    brows = (
        spark.read.parquet(os.path.join(base, "cb"))
        .orderBy("m", "code")
        .collect()
    )
    cents = [list(r.qv) for r in crows]
    n_sub = 1 + max(r.m for r in brows)
    cb = [[] for _ in range(n_sub)]
    for r in brows:
        cb[r.m].append(list(r.sv))
    emb = load_table(spark, sf_dir, "embeddings")
    q0 = (
        emb.filter(F.col("vec_id") == 0)
        .select(quantize(F.col("embedding")).alias("qv"))
        .collect()[0]
        .qv
    )
    pc = min(
        range(len(cents)),
        key=lambda c: (
            sum((int(q0[i]) - cents[c][i]) ** 2 for i in range(len(q0))),
            c,
        ),
    ) + 1
    dpart = _adc_expr(list(q0), cb)
    postings = spark.read.parquet(out).filter(
        (F.col("cluster") == pc) & (F.col("vec_id") != 0)
    )
    shortlist = (
        postings.select("vec_id", dpart.alias("dpart"))
        .groupBy("vec_id")
        .agg(F.sum("dpart").cast("bigint").alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(20)
    )
    probe_vec = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("q_embedding")
        )
    )
    return (
        shortlist.join(emb.select("vec_id", "embedding"), "vec_id")
        .crossJoin(probe_vec)
        .select(
            "vec_id",
            "adc_dist",
            cosine_exact(F.col("embedding"), F.col("q_embedding")).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# streaming_bpe_gate — the TOKENIZER run AT INGEST with a FROZEN merge
# table, completing the frozen-model-at-ingest family (classifier ✓
# streaming_quality_gate, IVF quantizer ✓ streaming_ivf_index, DSIR
# ratio table ✓ streaming_dsir_gate, IVFPQ ✓ streaming_ivfpq_index; the
# tokenizer was batch-only — corpus_bpe_train/_pipeline): the FIRST
# landing runs the Sennrich training loop on its own words (the
# corpus_bpe_train construction — vocab-sized pair counts, 1-row argmax
# per round) and epoch-commits the merge table; later landings read the
# frozen merges and ENCODE against them — production tokenizes every
# new shard with the released tokenizer, it never retrains per batch —
# and emit per-doc (n_words, n_subwords, n_chars) verdicts. The oracle
# restates train-on-evens (the unrolled _bpe_train_ctes with a parity
# WHERE) chained into encode-everyone (an e-chain applying the SAME
# _BPE_FOLD_SQL text per learned merge), so hash parity proves batch 2
# was tokenized by batch 1's merges across the checkpointed restart.
#
# Scale: the merge table is _BPE_TRAIN_STEPS rows BY CONSTRUCTION —
# reading it back and collecting it is iteration control data (the
# k-means-centroid class), and the merges are applied as fold literals,
# no join at all; per landing the cost is one vocab-sized shuffle plus
# the doc-word ↔ encoded-vocab equi-join (NO broadcast hint — the
# vocabulary grows with the corpus, the forbidden class).
# --------------------------------------------------------------------------
_SBG_DONE: dict[tuple[str, str], str] = {}


def _bpe_gate_processor(out: str, merges_state: str, steps: int = 4):
    """foreachBatch processor over (verdicts, merge-table-state) dirs —
    module-level for the replay test, like the other index processors."""
    from data_ingestion_din_spark.functions.analysis import tokens
    from data_ingestion_din_spark.plans.text_pipeline import bpe_merge_fold

    def _plan(batch_df: DataFrame, epoch_id: int):
        spark_l = batch_df.sparkSession
        wn = (
            batch_df.select(F.explode(tokens(F.col("text"))).alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).cast("bigint").alias("wn"))
        )
        cur = wn.withColumn(
            "toks",
            F.expr(
                "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
            ),
        ).localCheckpoint(eager=True)
        prior = None
        if os.path.isdir(merges_state):
            prior = (
                spark_l.read.option("basePath", merges_state)
                .parquet(merges_state)
                .filter(F.col("epoch") < epoch_id)
                .select("step", "lft", "rgt")
            )
        # train ONLY when no prior-epoch merge table exists — keyed on
        # the PRIOR-EPOCH rows, not directory existence, so a REPLAYED
        # training epoch retrains identically (the replay trap the
        # quality gate pinned); the read-back is ≤steps rows
        if prior is not None and prior.limit(1).count() > 0:
            frozen = sorted(prior.collect(), key=lambda r: r.step)
            new_merges = None  # frozen — written once by the training epoch
            for r in frozen:
                cur = cur.withColumn("toks", bpe_merge_fold(r.lft, r.rgt))
        else:
            learned = []
            for step in range(steps):
                prs = (
                    cur.filter(F.size("toks") >= 2)
                    .select(
                        "wn",
                        F.explode(
                            F.sequence(F.lit(1), F.size("toks") - 1)
                        ).alias("i"),
                        "toks",
                    )
                    .select(
                        F.element_at("toks", F.col("i")).alias("lft"),
                        F.element_at("toks", F.col("i") + 1).alias("rgt"),
                        "wn",
                    )
                )
                top = (
                    prs.groupBy("lft", "rgt")
                    .agg(F.sum("wn").cast("bigint").alias("n"))
                    .orderBy(F.desc("n"), "lft", "rgt")
                    .limit(1)
                    .collect()[0]  # 1-row argmax — iteration control data
                )
                learned.append((step, top.lft, top.rgt))
                cur = cur.withColumn(
                    "toks", bpe_merge_fold(top.lft, top.rgt)
                ).localCheckpoint(eager=True)
            new_merges = spark_l.createDataFrame(
                learned, "step int, lft string, rgt string"
            )
        enc = cur.select("w", F.size("toks").cast("bigint").alias("n_sub"))
        doc_w = batch_df.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("w")
        )
        verdicts = (
            doc_w.join(enc, "w")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_words"),
                F.sum("n_sub").cast("bigint").alias("n_subwords"),
                F.sum(F.length("w")).cast("bigint").alias("n_chars"),
            )
        )
        return {"verdicts": verdicts, "new_merges": new_merges}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dfs = _plan(batch_df, epoch_id)
        ep = f"epoch={epoch_id}"
        dfs["verdicts"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, ep)
        )
        if dfs["new_merges"] is not None:
            dfs["new_merges"].coalesce(1).write.mode("overwrite").parquet(
                os.path.join(merges_state, ep)
            )

    _process.plan = _plan
    return _process


def _sbg_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SBG_DONE, key[0])
    if key in _SBG_DONE:
        if _dir_ok(_SBG_DONE[key]):
            return _SBG_DONE[key]
        del _SBG_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_sbg")
    out = os.path.join(base, "out")
    _process = _bpe_gate_processor(out, os.path.join(base, "merges"))
    _run_doc_parity_landings(spark, sf_dir, base, _process)
    _SBG_DONE[key] = out
    return out


def _sbg_oracle() -> str:
    from data_ingestion_din_spark.plans.text_pipeline import (
        _BPE_FOLD_SQL,
        _BPE_TRAIN_STEPS,
        _TOKS_SQL,
        _bpe_train_ctes,
    )

    ctes, _ = _bpe_train_ctes(where="WHERE doc_id % 2 = 0")
    echain = []
    for r in range(_BPE_TRAIN_STEPS):
        echain.append(f"""e{r + 1} AS (
      SELECT t.w, {_BPE_FOLD_SQL} AS toks
      FROM e{r} t CROSS JOIN m{r} m
    )""")
    return f"""
    WITH {ctes},
    adoc AS (SELECT doc_id, unnest({_TOKS_SQL}) AS w FROM documents),
    dw AS (SELECT DISTINCT w FROM adoc),
    e0 AS (
      SELECT w, list_transform(range(1, length(w) + 1),
                               i -> substr(w, i, 1)) AS toks
      FROM dw
    ),
    {",".join(echain)}
    SELECT a.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(len(e.toks)) AS BIGINT) AS n_subwords,
           CAST(sum(length(a.w)) AS BIGINT) AS n_chars
    FROM adoc a JOIN e{_BPE_TRAIN_STEPS} e ON a.w = e.w
    GROUP BY a.doc_id
    ORDER BY a.doc_id
    """


@query("streaming_bpe_gate", oracle=_sbg_oracle())
def streaming_bpe_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back both landings' verdicts; the oracle restates
    train-merges-on-landing-1 (even doc_ids) + encode-everyone-with-them,
    so hash parity proves the frozen merge table survived the
    checkpointed restart and batch 2 was tokenized by batch 1's model."""
    out = _sbg_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select("doc_id", "n_words", "n_subwords", "n_chars")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# streaming_rollup_maintenance — INCREMENTAL VIEW MAINTENANCE for the
# additive rollup, the most common production continuous aggregate
# (events_hourly_rollup kept current under append): each time-split
# landing is aggregated to (hour, event_type) partials — one map-side-
# combined shuffle over the LANDING only, never rescanning history —
# and merged with the latest prior-epoch state by re-summing, then the
# full merged rollup is epoch-committed (idempotent overwrite,
# prior-epoch-only reads: the exactly-once-under-replay layout every
# state sink here uses). Counts and decimal sums are associative, so
# merged-partials == from-scratch — and the oracle IS the batch
# rollup's SQL verbatim (oracle_ref), making that equality the hash
# gate across the checkpointed restart.
#
# Scale: state is AGGREGATE-cardinality (hours × types — orders of
# magnitude below raw events), so the full-state epoch write is cheap
# relative to any landing; the landing-side cost is one partial
# aggregation of the batch. (When even the rollup is huge, the
# O(touched) variant — rewrite only hour-partitions the landing
# touches — is the training_shard_incremental pattern; the additive
# merge here is the semantics both share.)
# --------------------------------------------------------------------------
_SRM_DONE: dict[tuple[str, str], str] = {}


def _rollup_processor(state: str):
    """foreachBatch processor over the rollup-state dir — module-level
    for the replay test, like the other incremental state sinks."""

    def _plan(batch_df: DataFrame, epoch_id: int) -> DataFrame:
        spark_l = batch_df.sparkSession
        partials = batch_df.groupBy(
            F.window("ts", "1 hour").alias("h"), "event_type"
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("decimal(22,2)")
            .alias("total_value"),
        ).select(
            F.col("h.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        if os.path.isdir(state):
            prior = _latest_epoch_rows(
                spark_l,
                state,
                ["window_start", "event_type"],
                before_epoch=epoch_id,
            )
            partials = partials.unionByName(prior)
        return (
            partials.groupBy("window_start", "event_type")
            .agg(
                F.sum("n_events").cast("bigint").alias("n_events"),
                F.sum("total_value").cast("decimal(22,2)").alias("total_value"),
            )
        )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merged = _plan(batch_df, epoch_id)
        merged.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state, f"epoch={epoch_id}")
        )

    _process.plan = _plan
    return _process


def _srm_state_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SRM_DONE, key[0])
    if key in _SRM_DONE:
        if _dir_ok(_SRM_DONE[key]):
            return _SRM_DONE[key]
        del _SRM_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_srm")
    state = os.path.join(base, "state")

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    )
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    mid = lo + (hi - lo) // 2  # setup-stage scalar: time-split point
    _run_split_landings(
        spark,
        base,
        "event_type string, ts timestamp, value double",
        [
            ev.filter(F.unix_micros("ts") <= mid),
            ev.filter(F.unix_micros("ts") > mid),
        ],
        _rollup_processor(state),
    )
    _SRM_DONE[key] = state
    return state


@query("streaming_rollup_maintenance", oracle_ref="events_hourly_rollup")
def streaming_rollup_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back the incrementally maintained hourly rollup (latest-
    epoch row per (window_start, event_type)); the oracle is the BATCH
    rollup's SQL verbatim — additive merge makes incremental
    maintenance provably equal to a from-scratch aggregation, and hash
    parity enforces it across the checkpointed restart."""
    from data_ingestion_din_spark.plans._exact import dec_to_double

    state = _srm_state_dir(spark, sf_dir)
    cur = _latest_epoch_rows(spark, state, ["window_start", "event_type"])
    return cur.select(
        "window_start",
        "event_type",
        "n_events",
        dec_to_double(F.col("total_value"), 2).alias("total_value"),
    ).orderBy("window_start", "event_type")


# --------------------------------------------------------------------------
# streaming_decontam_gate — benchmark DECONTAMINATION at ingest, the
# frozen-model family's eval-overlap member (classifier ✓ r8, IVF ✓ r8,
# DSIR/BPE/IVFPQ ✓ r9; corpus_decontaminate was batch-only): the first
# landing freezes the benchmark's distinct word 8-gram shingle set (its
# doc_id % 14 == 0 slice — the fixture's stand-in for an eval suite,
# which is BOUNDED control data: benchmarks don't grow with the training
# corpus, so broadcasting the frozen set is the legal class, exactly
# like the quality gate's top-K vocab) and epoch-commits it; every
# landing's non-benchmark docs are shingled once and probed against the
# frozen set via a broadcast left-join, emitting per-doc
# (n_hits, contaminated) verdicts. Training is keyed on PRIOR-EPOCH
# ROWS, not directory existence (the replay trap — a replayed training
# epoch retrains identically). Epoch-keyed idempotent overwrites +
# prior-epoch-only reads give exactly-once under replay, proven in
# tests/test_streaming.py.
#
# The oracle restates freeze-on-%14-slice + probe-everyone in SQL, so
# hash parity proves the frozen shingle set survived the checkpointed
# restart and landing 2 was gated by landing 1's benchmark snapshot.
# --------------------------------------------------------------------------
_SDC_DONE: dict[tuple[str, str], str] = {}


def _decontam_gate_processor(out: str, shingle_state: str, n: int = 8):
    """foreachBatch processor over (verdicts, frozen-shingle-state) dirs
    — module-level for the replay test, like the sibling gates."""
    from data_ingestion_din_spark.functions.analysis import (
        tokens,
        word_shingles,
    )

    def _plan(batch_df: DataFrame, epoch_id: int):
        spark_l = batch_df.sparkSession
        sh = batch_df.select(
            "doc_id",
            F.explode_outer(
                F.array_distinct(word_shingles(tokens(F.col("text")), n))
            ).alias("shingle"),
        )
        prior = None
        if os.path.isdir(shingle_state):
            prior = (
                spark_l.read.option("basePath", shingle_state)
                .parquet(shingle_state)
                .filter(F.col("epoch") < epoch_id)
                .select("shingle")
            )
        if prior is not None and prior.limit(1).count() > 0:
            ev = prior
            new_state = None  # frozen — written once by the training epoch
        else:
            ev = (
                sh.filter(
                    (F.col("doc_id") % 14 == 0)
                    & F.col("shingle").isNotNull()
                )
                .select("shingle")
                .distinct()
                .localCheckpoint(eager=True)
            )
            new_state = ev
        probed = sh.filter(F.col("doc_id") % 14 != 0).join(
            F.broadcast(ev.withColumn("hit", F.lit(1))), "shingle", "left"
        )
        verdicts = (
            probed.groupBy("doc_id")
            .agg(
                F.coalesce(F.sum("hit"), F.lit(0))
                .cast("bigint")
                .alias("n_hits")
            )
            .withColumn(
                "contaminated", (F.col("n_hits") > 0).cast("int")
            )
        )
        return {"verdicts": verdicts, "new_state": new_state}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dfs = _plan(batch_df, epoch_id)
        ep = f"epoch={epoch_id}"
        dfs["verdicts"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, ep)
        )
        if dfs["new_state"] is not None:
            dfs["new_state"].coalesce(1).write.mode("overwrite").parquet(
                os.path.join(shingle_state, ep)
            )

    _process.plan = _plan
    return _process


def _sdc_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SDC_DONE, key[0])
    if key in _SDC_DONE:
        if _dir_ok(_SDC_DONE[key]):
            return _SDC_DONE[key]
        del _SDC_DONE[key]

    from data_ingestion_din_spark.plans.curation_queries import _DC_N

    base = fresh_app_dir(spark, sf_dir, "spark_graft_sdc")
    out = os.path.join(base, "out")
    # n keyed to the SAME constant the oracle interpolates — retuning
    # _DC_N moves both sides together
    _process = _decontam_gate_processor(
        out, os.path.join(base, "shingles"), n=_DC_N
    )
    _run_doc_parity_landings(spark, sf_dir, base, _process)
    _SDC_DONE[key] = out
    return out


def _sdc_oracle() -> str:
    from data_ingestion_din_spark.plans.curation_queries import (
        _DC_N,
        _DC_SHINGLE,
        _TOKS_SQL,
    )

    return f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    idx AS (
      SELECT doc_id, tk, unnest(range(1, len(tk) - {_DC_N - 2})) AS i
      FROM t WHERE len(tk) >= {_DC_N}
    ),
    sh AS (SELECT DISTINCT doc_id, {_DC_SHINGLE} AS shingle FROM idx),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 14 = 0),
    hits AS (
      SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_hits
      FROM sh s JOIN ev USING (shingle)
      GROUP BY s.doc_id
    )
    SELECT d.doc_id,
           coalesce(h.n_hits, 0) AS n_hits,
           CAST(CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END
                AS INT) AS contaminated
    FROM t d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % 14 <> 0
    ORDER BY d.doc_id
    """


@query("streaming_decontam_gate", oracle=_sdc_oracle())
def streaming_decontam_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back both landings' decontamination verdicts; the oracle
    restates freeze-benchmark-shingles-on-landing-1 + probe-everyone,
    so hash parity proves the frozen set survived the checkpointed
    restart and batch 2 was gated by batch 1's benchmark snapshot."""
    out = _sdc_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select("doc_id", "n_hits", "contaminated")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# streaming_semdedup_gate — SEMANTIC near-duplicate detection at ingest,
# the embedding-space member of the at-ingest dedup family (exact-fp ✓
# funnel, MinHash ✓ r6, pHash ✓ r7, substring ✓ r9; SemDeDup was
# batch-only): the first landing trains the k=8 coarse quantizer on
# itself (the verified integer-exact Lloyd) and freezes it; every
# landing routes its vectors against the frozen centroids
# (assign_to_centroids — k×dims literal, no join) and probes them
# against the CUMULATIVE per-cell member index via a plain CLUSTER
# equi-join — the index grows with the corpus, the forbidden broadcast
# class, so no hint anywhere (plan-asserted) — emitting per-vector
# verdicts (n_cand in-cell candidates, n_near above the cosine gate,
# is_dup). The landing's own vectors then append to the member index.
# This is exactly SemDeDup's cluster-then-compare shape (Abbas et al.
# 2023) run incrementally: cross-cell pairs are never compared — the
# documented recall trade the batch dedup_semantic_kmeans makes too.
#
# Exactness: the near gate is cos >= 0.4 evaluated as the INTEGER
# predicate dot > 0 AND 25*dot^2 >= 4*(a.a)(b.b) over vectors quantized
# at 1e3 — at that scale every product fits int64 (dims=64: dot <=
# 6.4e7, 25*dot^2 <= 1.1e17), so the verdict is bit-portable with no
# decimal/hugeint divergence risk; routing stays on the 1e6-quantized
# kmeans machinery. The oracle restates train-on-evens + route-odds +
# within-cell integer cosine in SQL, so hash parity proves the frozen
# quantizer AND the member index survived the checkpointed restart.
#
# Scale: per landing, O(batch × k·dims) routing + O(in-cell candidate
# pairs) dot products — candidate generation is cell-local everywhere.
# --------------------------------------------------------------------------
_SSD_DONE: dict[tuple[str, str], str] = {}


def _semdedup_gate_processor(
    out: str, cent_state: str, member_state: str, k: int = _SII_K
):
    """foreachBatch processor over (verdicts, frozen-centroids, member-
    index) dirs — module-level for the replay test, like the siblings."""
    from data_ingestion_din_spark.functions.vectors import (
        quant_dot,
        quantize,
        quantize_milli as q3,
    )
    from data_ingestion_din_spark.operators.similarity import (
        assign_to_centroids,
        kmeans_train,
    )

    def _plan(batch_df: DataFrame, epoch_id: int):
        spark_l = batch_df.sparkSession
        if os.path.isdir(cent_state):
            prior = (
                spark_l.read.option("basePath", cent_state)
                .parquet(cent_state)
                .filter(F.col("epoch") < epoch_id)
            )
            rows = prior.orderBy("cluster").collect()
        else:
            rows = []
        if rows:
            cents = [list(r.qv) for r in rows]
            routed = (
                assign_to_centroids(
                    batch_df.select(
                        "vec_id", quantize(F.col("embedding")).alias("qv")
                    ),
                    cents,
                )
                .select("vec_id", "cluster")
                .join(
                    batch_df.select(
                        "vec_id", q3(F.col("embedding")).alias("q3")
                    ),
                    "vec_id",
                )
            )
            new_cents = None  # frozen — written once by the training epoch
        else:
            assigned, cents = kmeans_train(batch_df, k=k, iters=2)
            routed = assigned.select("vec_id", "cluster").join(
                batch_df.select("vec_id", q3(F.col("embedding")).alias("q3")),
                "vec_id",
            )
            new_cents = spark_l.createDataFrame(
                [(c + 1, cents[c]) for c in range(len(cents))],
                "cluster int, qv array<bigint>",
            )
        routed = routed.localCheckpoint(eager=True)
        members = None
        if os.path.isdir(member_state):
            members = (
                spark_l.read.option("basePath", member_state)
                .parquet(member_state)
                .filter(F.col("epoch") < epoch_id)
                .select("cluster", F.col("q3").alias("m_q3"))
            )
        if members is not None and members.limit(1).count() > 0:
            # plain equi-join on the cell — the member index grows with
            # the corpus (the forbidden broadcast class, never hinted)
            hits = (
                routed.join(members, "cluster")
                .select(
                    "vec_id",
                    quant_dot(F.col("q3"), F.col("m_q3")).alias("dot"),
                    quant_dot(F.col("q3"), F.col("q3")).alias("aa"),
                    quant_dot(F.col("m_q3"), F.col("m_q3")).alias("bb"),
                )
                .groupBy("vec_id")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_cand"),
                    F.sum(
                        F.when(
                            (F.col("dot") > 0)
                            & (
                                25 * F.col("dot") * F.col("dot")
                                >= 4 * F.col("aa") * F.col("bb")
                            ),
                            1,
                        ).otherwise(0)
                    )
                    .cast("bigint")
                    .alias("n_near"),
                )
            )
            verdicts = (
                routed.select("vec_id", "cluster")
                .join(hits, "vec_id", "left")
                .select(
                    "vec_id",
                    "cluster",
                    F.coalesce("n_cand", F.lit(0))
                    .cast("bigint")
                    .alias("n_cand"),
                    F.coalesce("n_near", F.lit(0))
                    .cast("bigint")
                    .alias("n_near"),
                )
            )
        else:
            verdicts = routed.select(
                "vec_id",
                "cluster",
                F.lit(0).cast("bigint").alias("n_cand"),
                F.lit(0).cast("bigint").alias("n_near"),
            )
        verdicts = verdicts.withColumn(
            "is_dup", (F.col("n_near") > 0).cast("int")
        )
        return {
            "verdicts": verdicts,
            "new_members": routed.select("cluster", "q3"),
            "new_cents": new_cents,
        }

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dfs = _plan(batch_df, epoch_id)
        ep = f"epoch={epoch_id}"
        dfs["verdicts"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, ep)
        )
        dfs["new_members"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(member_state, ep)
        )
        if dfs["new_cents"] is not None:
            dfs["new_cents"].coalesce(1).write.mode("overwrite").parquet(
                os.path.join(cent_state, ep)
            )

    _process.plan = _plan
    return _process


def _ssd_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SSD_DONE, key[0])
    if key in _SSD_DONE:
        if _dir_ok(_SSD_DONE[key]):
            return _SSD_DONE[key]
        del _SSD_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_ssd")
    out = os.path.join(base, "out")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    _run_split_landings(
        spark,
        base,
        "vec_id bigint, embedding array<float>",
        [emb.filter(F.col("vec_id") % 2 == p) for p in (0, 1)],
        _semdedup_gate_processor(
            out, os.path.join(base, "cents"), os.path.join(base, "members")
        ),
    )
    _SSD_DONE[key] = out
    return out


def _ssd_oracle() -> str:
    from data_ingestion_din_spark.functions.vectors import (
        QUANT_MILLI_SQL as q3,
    )
    from data_ingestion_din_spark.plans.similarity_queries import (
        _KM_DIST,
        _km_ctes,
    )

    return f"""
    WITH {_km_ctes("(SELECT * FROM embeddings WHERE vec_id % 2 = 0)")},
    m AS (
      SELECT a2.vec_id, a2.cluster, {q3} AS q3
      FROM a2 JOIN embeddings e USING (vec_id)
    ),
    ob AS (
      SELECT vec_id,
             list_transform(
               embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
             ) AS qv,
             {q3} AS q3
      FROM embeddings WHERE vec_id % 2 = 1
    ),
    ab AS (
      SELECT q.vec_id, s.cluster, q.q3
      FROM ob q CROSS JOIN c1f s
      QUALIFY row_number() OVER (
        PARTITION BY q.vec_id ORDER BY {_KM_DIST}, s.cluster) = 1
    ),
    cand AS (
      SELECT b.vec_id,
             (SELECT sum(b.q3[i] * m.q3[i]) FROM range(1, 65) r(i)) AS dot,
             (SELECT sum(b.q3[i] * b.q3[i]) FROM range(1, 65) r(i)) AS aa,
             (SELECT sum(m.q3[i] * m.q3[i]) FROM range(1, 65) r(i)) AS bb
      FROM ab b JOIN m USING (cluster)
    ),
    agg AS (
      SELECT vec_id, CAST(count(*) AS BIGINT) AS n_cand,
             CAST(sum(CASE WHEN dot > 0 AND 25*dot*dot >= 4*aa*bb
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_near
      FROM cand GROUP BY vec_id
    )
    SELECT vec_id, CAST(cluster AS INT) AS cluster,
           CAST(0 AS BIGINT) AS n_cand, CAST(0 AS BIGINT) AS n_near,
           CAST(0 AS INT) AS is_dup
    FROM a2
    UNION ALL
    SELECT b.vec_id, CAST(b.cluster AS INT) AS cluster,
           coalesce(g.n_cand, 0) AS n_cand,
           coalesce(g.n_near, 0) AS n_near,
           CAST(CASE WHEN coalesce(g.n_near, 0) > 0 THEN 1 ELSE 0 END
                AS INT) AS is_dup
    FROM ab b LEFT JOIN agg g USING (vec_id)
    ORDER BY vec_id
    """


@query("streaming_semdedup_gate", oracle=_ssd_oracle())
def streaming_semdedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back both landings' semantic near-dup verdicts; the oracle
    restates train-on-landing-1 + route-landing-2 + within-cell integer
    cosine, so hash parity proves the frozen quantizer and the member
    index both survived the checkpointed restart."""
    out = _ssd_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select(
            "vec_id",
            F.col("cluster").cast("int").alias("cluster"),
            "n_cand",
            "n_near",
            "is_dup",
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# streaming_tmix_gate — TEMPERATURE-based language sampling at ingest,
# the mixture member of the frozen-policy family (quality ✓ r8, DSIR ✓
# r9, decontam/semantic ✓ r9): production fixes the language mix from a
# planning snapshot and applies it to everything that arrives after —
# retuning rates per batch would make the corpus composition drift with
# arrival order. The first landing computes per-language doc counts,
# n_min, and the T=2 integer micro-thresholds
# (floor(1e6·sqrt(n_min/n_l)) — corpus_temperature_mixture's exact
# recipe) and freezes them; every landing's docs get the salted
# Bernoulli verdict abs(h64('tmix:'||doc_id)) % 1e6 < threshold(lang).
# A language unseen by the planning snapshot has no rate — its docs are
# dropped (kept=0, the conservative production default; the oracle
# restates the same rule via coalesce(thr, 0)).
#
# Scale: the rate table is bounded by the language count (the legal
# broadcast class — hinted and plan-asserted REQUIRED); the per-doc
# verdict is a scan-local predicate. Train is keyed on PRIOR-EPOCH ROWS
# so a replayed training epoch retrains identically.
# --------------------------------------------------------------------------
_STG_DONE: dict[tuple[str, str], str] = {}


def _tmix_gate_processor(out: str, rate_state: str):
    """foreachBatch processor over (verdicts, frozen-rate-state) dirs —
    module-level for the replay test, like the sibling gates."""
    from data_ingestion_din_spark.functions.hashing import h64

    def _plan(batch_df: DataFrame, epoch_id: int):
        spark_l = batch_df.sparkSession
        prior = None
        if os.path.isdir(rate_state):
            prior = (
                spark_l.read.option("basePath", rate_state)
                .parquet(rate_state)
                .filter(F.col("epoch") < epoch_id)
                .select("lang", "threshold_micros")
            )
        if prior is not None and prior.limit(1).count() > 0:
            rates = prior
            new_rates = None  # frozen — written once by the training epoch
        else:
            counts = batch_df.groupBy("lang").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs")
            )
            n_min = counts.agg(F.min("n_docs").alias("n_min"))
            rates = (
                counts.crossJoin(F.broadcast(n_min))
                .select(
                    "lang",
                    F.floor(
                        F.lit(1000000.0)
                        * F.sqrt(
                            F.col("n_min").cast("double") / F.col("n_docs")
                        )
                    )
                    .cast("bigint")
                    .alias("threshold_micros"),
                )
                .localCheckpoint(eager=True)
            )
            new_rates = rates
        verdicts = (
            batch_df.select("doc_id", "lang")
            .join(F.broadcast(rates), "lang", "left")
            .select(
                "doc_id",
                "lang",
                F.when(
                    F.abs(
                        h64(
                            F.concat(
                                F.lit("tmix:"),
                                F.col("doc_id").cast("string"),
                            )
                        )
                    )
                    % 1000000
                    < F.coalesce("threshold_micros", F.lit(0)),
                    1,
                )
                .otherwise(0)
                .cast("int")
                .alias("kept"),
            )
        )
        return {"verdicts": verdicts, "new_rates": new_rates}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dfs = _plan(batch_df, epoch_id)
        ep = f"epoch={epoch_id}"
        dfs["verdicts"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, ep)
        )
        if dfs["new_rates"] is not None:
            dfs["new_rates"].coalesce(1).write.mode("overwrite").parquet(
                os.path.join(rate_state, ep)
            )

    _process.plan = _plan
    return _process


def _stg_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_STG_DONE, key[0])
    if key in _STG_DONE:
        if _dir_ok(_STG_DONE[key]):
            return _STG_DONE[key]
        del _STG_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_stg")
    out = os.path.join(base, "out")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    _run_split_landings(
        spark,
        base,
        "doc_id bigint, lang string",
        [docs.filter(F.col("doc_id") % 2 == p) for p in (0, 1)],
        _tmix_gate_processor(out, os.path.join(base, "rates")),
    )
    _STG_DONE[key] = out
    return out


def _stg_oracle() -> str:
    from data_ingestion_din_spark.functions.hashing import h64_sql

    return f"""
    WITH c AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents WHERE doc_id % 2 = 0 GROUP BY lang
    ),
    mn AS (SELECT min(n_docs) AS n_min FROM c),
    r AS (
      SELECT lang,
             CAST(floor(1000000.0 *
                        sqrt(CAST(n_min AS DOUBLE) / n_docs)) AS BIGINT)
               AS thr
      FROM c CROSS JOIN mn
    )
    SELECT d.doc_id, d.lang,
           CAST(CASE WHEN abs({h64_sql("'tmix:' || CAST(doc_id AS VARCHAR)")})
                        % 1000000 < coalesce(r.thr, 0)
                     THEN 1 ELSE 0 END AS INT) AS kept
    FROM documents d LEFT JOIN r USING (lang)
    ORDER BY d.doc_id
    """


@query("streaming_tmix_gate", oracle=_stg_oracle())
def streaming_tmix_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back both landings' sampling verdicts; the oracle restates
    plan-rates-on-landing-1 + gate-everyone-with-them, so hash parity
    proves the frozen rate table survived the checkpointed restart and
    batch 2 was sampled by batch 1's mixture plan."""
    out = _stg_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select("doc_id", "lang", "kept")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# streaming_profile_gate — SCHEMA-DRIFT monitoring at ingest, the
# aggregate member of the frozen-baseline family (the sibling gates
# freeze models/rates and emit per-DOC verdicts; this freezes the
# per-column PROFILE and emits per-landing audit rows — the "alert when
# a feed's null rate or cardinality shifts" monitor every production
# ingest runs). The first landing profiles itself (rows, nulls,
# distinct per column — dq_schema_drift's fused one-pass aggregation)
# and freezes the result as the baseline; every landing's profile is
# compared column-by-column against the frozen baseline with the same
# overflow-safe per-mille density rule (distinct <= rows keeps each
# density a bounded int — never a product of two corpus-sized counts).
# The baseline is column-count-sized — bounded control data, the legal
# broadcast class.
#
# The oracle restates profile-evens-as-baseline + profile-both-halves +
# compare in SQL, so hash parity proves the frozen profile survived
# the checkpointed restart and landing 2 was judged against landing
# 1's baseline.
# --------------------------------------------------------------------------
_SPG_DONE: dict[tuple[str, str], str] = {}
_SPG_COLS = ["lang", "source", "n_chars", "text"]


def _profile_gate_processor(out: str, baseline_state: str):
    """foreachBatch processor over (audit-rows, frozen-baseline) dirs —
    module-level for the replay test, like the sibling gates."""

    def _profile(batch_df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
        for c in _SPG_COLS:
            aggs.append(
                (F.count(F.lit(1)) - F.count(c))
                .cast("bigint")
                .alias(f"nulls_{c}")
            )
            aggs.append(F.countDistinct(c).cast("bigint").alias(f"nd_{c}"))
        fused = batch_df.agg(*aggs)
        return fused.select(
            F.inline(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("col"),
                            F.col("n_rows").alias("n_rows"),
                            F.col(f"nulls_{c}").alias("n_nulls"),
                            F.col(f"nd_{c}").alias("n_distinct"),
                        )
                        for c in _SPG_COLS
                    ]
                )
            )
        )

    def _plan(batch_df: DataFrame, epoch_id: int):
        spark_l = batch_df.sparkSession
        prof = _profile(batch_df).localCheckpoint(eager=True)
        prior = None
        if os.path.isdir(baseline_state):
            prior = (
                spark_l.read.option("basePath", baseline_state)
                .parquet(baseline_state)
                .filter(F.col("epoch") < epoch_id)
                .select(
                    "col",
                    F.col("n_rows").alias("b_rows"),
                    F.col("n_distinct").alias("b_distinct"),
                )
            )
        if prior is not None and prior.limit(1).count() > 0:
            baseline = prior
            new_baseline = None  # frozen — written once by epoch 0
        else:
            baseline = prof.select(
                "col",
                F.col("n_rows").alias("b_rows"),
                F.col("n_distinct").alias("b_distinct"),
            )
            new_baseline = prof
        dens = F.expr("n_distinct * 1000 DIV greatest(n_rows, 1)")
        b_dens = F.expr("b_distinct * 1000 DIV greatest(b_rows, 1)")
        audit = prof.join(F.broadcast(baseline), "col").select(
            "col",
            "n_rows",
            "n_nulls",
            "n_distinct",
            F.when((dens > 2 * b_dens) | (b_dens > 2 * dens), 1)
            .otherwise(0)
            .cast("int")
            .alias("drifted"),
        )
        return {"audit": audit, "new_baseline": new_baseline}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dfs = _plan(batch_df, epoch_id)
        ep = f"epoch={epoch_id}"
        dfs["audit"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, ep)
        )
        if dfs["new_baseline"] is not None:
            dfs["new_baseline"].coalesce(1).write.mode("overwrite").parquet(
                os.path.join(baseline_state, ep)
            )

    _process.plan = _plan
    return _process


def _spg_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SPG_DONE, key[0])
    if key in _SPG_DONE:
        if _dir_ok(_SPG_DONE[key]):
            return _SPG_DONE[key]
        del _SPG_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_spg")
    out = os.path.join(base, "out")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    _run_split_landings(
        spark,
        base,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
        [docs.filter(F.col("doc_id") % 2 == p) for p in (0, 1)],
        _profile_gate_processor(out, os.path.join(base, "baseline")),
    )
    _SPG_DONE[key] = out
    return out


def _spg_oracle() -> str:
    def half(name: str, pred: str) -> str:
        per_col = ",\n             ".join(
            f"CAST(count(*) - count({c}) AS BIGINT) AS nulls_{c},"
            f" CAST(count(DISTINCT {c}) AS BIGINT) AS nd_{c}"
            for c in _SPG_COLS
        )
        return f"""{name} AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             {per_col}
      FROM documents WHERE {pred}
    )"""

    def rows(src: str) -> str:
        return "\n      UNION ALL\n      ".join(
            f"SELECT '{c}' AS col, n_rows, nulls_{c} AS n_nulls,"
            f" nd_{c} AS n_distinct FROM {src}"
            for c in _SPG_COLS
        )

    return f"""
    WITH {half('e', 'doc_id % 2 = 0')},
    {half('o', 'doc_id % 2 = 1')},
    ep AS (
      {rows('e')}
    ),
    op AS (
      {rows('o')}
    ),
    judged AS (
      SELECT p.col, p.n_rows, p.n_nulls, p.n_distinct,
             CAST(CASE WHEN p.n_distinct * 1000 // greatest(p.n_rows, 1)
                          > 2 * (b.n_distinct * 1000 // greatest(b.n_rows, 1))
                        OR b.n_distinct * 1000 // greatest(b.n_rows, 1)
                          > 2 * (p.n_distinct * 1000 // greatest(p.n_rows, 1))
                       THEN 1 ELSE 0 END AS INT) AS drifted
      FROM op p JOIN ep b USING (col)
    )
    SELECT col, n_rows, n_nulls, n_distinct, CAST(0 AS INT) AS drifted
    FROM ep
    UNION ALL
    SELECT col, n_rows, n_nulls, n_distinct, drifted FROM judged
    ORDER BY n_rows, col
    """


@query("streaming_profile_gate", oracle=_spg_oracle())
def streaming_profile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back both landings' profile audit rows; the oracle restates
    freeze-epoch-0's-profile + judge-every-landing-against-it. The
    epoch-0 rows carry drifted=0 by definition (a baseline judged
    against itself). The hash gate sorts rows by ALL columns, so the
    presentation order only needs to be total for display: every
    column participates in the sort (equal-row-count halves would tie
    on (n_rows, col) alone)."""
    out = _spg_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select("col", "n_rows", "n_nulls", "n_distinct", "drifted")
        .orderBy("n_rows", "col", "n_distinct", "n_nulls", "drifted")
    )


# --------------------------------------------------------------------------
# streaming_ppl_gate — the PERPLEXITY filter at ingest, the frozen-model
# family's language-model member (classifier ✓ r8, DSIR ✓ r9, BPE ✓ r9,
# decontam/semdedup/tmix ✓ r9; doc_ngram_perplexity is batch-only): the
# first landing trains the integer-octave bigram LM on itself — pair
# counts, backoff unigram counts, and the total-token scalar committed
# as ONE epoch-keyed artifact (kind-discriminated rows: 'p' pairs /
# 'u' unigrams / 't' total — one table cannot half-evict, the DSIR
# bkt=-1 sentinel rationale) — and every later landing is scored
# against the frozen LM with Stupid-Backoff exactly as the batch query
# (q = intlog2(head_n+1)−intlog2(pair_n), backoff 1+intlog2(T+1)−
# intlog2(tok_n+1)), keep = ppl_milli <= cutoff. Training is keyed on
# PRIOR-EPOCH ROWS, not directory existence (the replay trap); verdicts
# and state are epoch-keyed idempotent overwrites with prior-epoch-only
# reads — exactly-once under replay, proven in tests/test_streaming.py.
#
# Scale: the frozen LM is vocabulary-sized (bigram long tail), NOT
# bounded control data — so the scoring joins are plain equi-joins with
# no broadcast hint (the growing/unbounded-state rule, plan-asserted);
# the only broadcast is the 1-row total-token scalar. The oracle
# restates train-on-even-docs + score-everyone, so hash parity proves
# the frozen LM survived the checkpointed restart and landing 2 was
# scored by landing 1's model.
# --------------------------------------------------------------------------
_SPPL_DONE: dict[tuple[str, str], str] = {}
_SPPL_KEEP = 4600  # milli-octaves/bigram; splits the fixture under the
# even-half LM (measured median 4574 overall / 4622 held-out)


def _ppl_gate_processor(out: str, lm_state: str):
    """foreachBatch processor over (verdicts, frozen-LM-state) dirs —
    module-level for the replay test, like the sibling gates."""
    from pyspark.sql.window import Window as W

    from data_ingestion_din_spark.functions.analysis import tokens

    intlog2 = lambda c: F.length(F.bin(c)).cast("bigint")  # noqa: E731

    def _plan(batch_df: DataFrame, epoch_id: int):
        spark_l = batch_df.sparkSession
        t0 = batch_df.select("doc_id", tokens(F.col("text")).alias("t"))
        t = t0.filter(F.size("t") >= 2)
        prs = t.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(t[i - 1] AS head, t[i] AS next))"
                )
            ).alias("p"),
        ).select("doc_id", "p.head", "p.next")
        prior = None
        if os.path.isdir(lm_state):
            prior = (
                spark_l.read.option("basePath", lm_state)
                .parquet(lm_state)
                .filter(F.col("epoch") < epoch_id)
                .select("kind", "k1", "k2", "cnt")
            )
        if prior is not None and prior.limit(1).count() > 0:
            state = prior
            new_state = None  # frozen — written once by the training epoch
        else:
            pc = prs.groupBy("head", "next").agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt")
            ).select(
                F.lit("p").alias("kind"),
                F.col("head").alias("k1"),
                F.col("next").alias("k2"),
                "cnt",
            )
            toks_all = t0.select(F.explode("t").alias("tok"))
            uc = toks_all.groupBy("tok").agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt")
            ).select(
                F.lit("u").alias("kind"),
                F.col("tok").alias("k1"),
                F.lit("").alias("k2"),
                "cnt",
            )
            totrow = toks_all.agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt")
            ).select(
                F.lit("t").alias("kind"),
                F.lit("").alias("k1"),
                F.lit("").alias("k2"),
                "cnt",
            )
            state = pc.unionByName(uc).unionByName(totrow).localCheckpoint(
                eager=True
            )
            new_state = state
        pairs = state.filter(F.col("kind") == "p").select(
            F.col("k1").alias("head"),
            F.col("k2").alias("next"),
            F.col("cnt").alias("pair_n"),
        )
        hn = pairs.withColumn(
            "head_n",
            F.sum("pair_n").over(W.partitionBy("head")).cast("bigint"),
        )
        uni = state.filter(F.col("kind") == "u").select(
            F.col("k1").alias("next"), F.col("cnt").alias("tok_n")
        )
        tot = state.filter(F.col("kind") == "t").select(
            F.col("cnt").alias("tt")
        )
        scored = (
            # frozen-LM joins: PLAIN HINT-FREE equi-joins (the LM is
            # vocabulary-sized, not bounded control data — the
            # growing-state rule); even the 1-row total-scalar attach
            # carries no hint (AQE broadcasts a 1-row side on its own)
            prs.join(hn, ["head", "next"], "left")
            .join(uni, "next", "left")
            .crossJoin(tot)
            .select(
                "doc_id",
                F.when(
                    F.col("pair_n").isNotNull(),
                    intlog2(F.col("head_n") + 1)
                    - intlog2(F.col("pair_n")),
                )
                .otherwise(
                    F.lit(1)
                    + intlog2(F.col("tt") + 1)
                    - intlog2(F.coalesce(F.col("tok_n"), F.lit(0)) + 1)
                )
                .alias("q"),
                F.when(F.col("pair_n").isNull(), 1).otherwise(0).alias(
                    "bo"
                ),
            )
        )
        perdoc = scored.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("bo").cast("bigint").alias("n_backoff"),
            F.sum("q").cast("bigint").alias("q_sum"),
        )
        verdicts = (
            batch_df.select("doc_id")
            .join(perdoc, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("n_bigrams"), F.lit(0))
                .cast("bigint")
                .alias("n_bigrams"),
                F.coalesce(F.col("n_backoff"), F.lit(0))
                .cast("bigint")
                .alias("n_backoff"),
                F.expr(
                    "coalesce(q_sum, 0) * 1000"
                    " DIV greatest(coalesce(n_bigrams, 0), 1)"
                )
                .cast("bigint")
                .alias("ppl_milli"),
            )
            .withColumn("keep", F.col("ppl_milli") <= _SPPL_KEEP)
        )
        return {"verdicts": verdicts, "new_state": new_state}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dfs = _plan(batch_df, epoch_id)
        ep = f"epoch={epoch_id}"
        dfs["verdicts"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, ep)
        )
        if dfs["new_state"] is not None:
            dfs["new_state"].coalesce(1).write.mode("overwrite").parquet(
                os.path.join(lm_state, ep)
            )

    _process.plan = _plan
    return _process


def _sppl_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SPPL_DONE, key[0])
    if key in _SPPL_DONE:
        if _dir_ok(_SPPL_DONE[key]):
            return _SPPL_DONE[key]
        del _SPPL_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_sppl")
    out = os.path.join(base, "out")
    _process = _ppl_gate_processor(out, os.path.join(base, "lm"))
    _run_doc_parity_landings(spark, sf_dir, base, _process)
    _SPPL_DONE[key] = out
    return out


def _sppl_oracle() -> str:
    from data_ingestion_din_spark.plans.text_pipeline import _TOKS_SQL

    return f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    prs AS (
      SELECT doc_id, t[i] AS head, t[i + 1] AS next
      FROM t, unnest(range(1, len(t))) r(i)
      WHERE i < len(t)
    ),
    pc AS (
      SELECT head, next, CAST(count(*) AS BIGINT) AS pair_n
      FROM prs WHERE doc_id % 2 = 0 GROUP BY head, next
    ),
    hn AS (
      SELECT *, CAST(sum(pair_n) OVER (PARTITION BY head) AS BIGINT)
                  AS head_n
      FROM pc
    ),
    trtok AS (
      SELECT unnest(t) AS tok FROM t WHERE doc_id % 2 = 0
    ),
    uc AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS tok_n FROM trtok GROUP BY tok
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM trtok),
    q AS (
      SELECT p.doc_id,
             CASE WHEN h.pair_n IS NOT NULL
               THEN CAST(length(bin(h.head_n + 1)) AS BIGINT)
                    - CAST(length(bin(h.pair_n)) AS BIGINT)
               ELSE 1 + CAST(length(bin(tot.tt + 1)) AS BIGINT)
                    - CAST(length(bin(coalesce(u.tok_n, 0) + 1)) AS BIGINT)
             END AS q,
             CASE WHEN h.pair_n IS NULL THEN 1 ELSE 0 END AS bo
      FROM prs p
      LEFT JOIN hn h ON h.head = p.head AND h.next = p.next
      LEFT JOIN uc u ON u.tok = p.next
      CROSS JOIN tot
    ),
    pd AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(bo) AS BIGINT) AS n_backoff,
             CAST(sum(q) AS BIGINT) AS q_sum
      FROM q GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(coalesce(pd.n_backoff, 0) AS BIGINT) AS n_backoff,
           CAST(coalesce(pd.q_sum, 0) * 1000
                // greatest(coalesce(pd.n_bigrams, 0), 1) AS BIGINT)
             AS ppl_milli,
           (coalesce(pd.q_sum, 0) * 1000
            // greatest(coalesce(pd.n_bigrams, 0), 1)) <= {_SPPL_KEEP}
             AS keep
    FROM documents d LEFT JOIN pd USING (doc_id)
    ORDER BY d.doc_id
    """


@query("streaming_ppl_gate", oracle=_sppl_oracle())
def streaming_ppl_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back both landings' perplexity verdicts; the oracle restates
    train-LM-on-landing-1 (even doc_ids) + score-everyone-with-it, so
    hash parity proves the frozen bigram LM survived the checkpointed
    restart and landing 2 was scored (and Stupid-Backoff'd) by landing
    1's model."""
    out = _sppl_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select("doc_id", "n_bigrams", "n_backoff", "ppl_milli", "keep")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# streaming_anomaly_gate — DATA-QUALITY SPIKE DETECTION at ingest over
# the incrementally maintained hourly count rollup, completing the
# dq-at-ingest family (profile drift ✓ r9, key skew ✓ r9; this is the
# volume-anomaly member): the processor maintains a (window_start,
# event_type) count rollup exactly like _rollup_processor (landing-only
# partials merged additively with the latest prior-epoch state), and —
# for every landing AFTER the first — judges each batch cell against
# the PRIOR epoch's per-type hour-count distribution with a z-score
# test in pure INTEGER arithmetic (no sqrt, no libm — the Σ-form
# variance):
#
#   z² > k²  ⟺  (n·x − Σx)² > k²·(n·Σx² − (Σx)²),   k = 2
#
# so the flag decision itself is hash-gated. Cells of types with fewer
# than 2 prior hours (variance undefined) and types unseen in the
# prior state are never flagged (coalesce FALSE — a cold type is new
# data, not a spike). Verdicts depend only on (batch, prior-epoch
# state), and both sinks are epoch-keyed idempotent overwrites with
# prior-epoch-only reads — replay-idempotent like every state sink
# here.
#
# Scale: state is aggregate-cardinality (hours × types); the per-type
# stats table is a types-sized aggregate OF that state joined to the
# batch partials hint-free (the growing-state rule — AQE may broadcast
# at runtime, nothing forces it). The oracle restates
# rollup-landing-1 → stats → judge-landing-2 in SQL, so hash parity
# proves the maintained state fed the judgment across the restart.
# --------------------------------------------------------------------------
_SAG_DONE: dict[tuple[str, str], str] = {}
_SAG_K = 2  # flag beyond k standard deviations


def _anomaly_gate_processor(out: str, state: str, k: int = _SAG_K):
    """foreachBatch processor over (verdicts, rollup-state) dirs —
    module-level for the replay test, like the sibling gates."""

    def _plan(batch_df: DataFrame, epoch_id: int):
        spark_l = batch_df.sparkSession
        partials = (
            batch_df.groupBy(
                F.window("ts", "1 hour").alias("h"), "event_type"
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
            .select(
                F.col("h.start").alias("window_start"),
                "event_type",
                "n_events",
            )
            .localCheckpoint(eager=True)  # feeds verdicts AND the merge
        )
        prior = None
        if os.path.isdir(state):
            prior = _latest_epoch_rows(
                spark_l,
                state,
                ["window_start", "event_type"],
                before_epoch=epoch_id,
            ).localCheckpoint(eager=True)  # feeds stats AND the merge
            # keyed on PRIOR-EPOCH ROWS, not directory existence: a
            # REPLAYED first epoch must still see "no prior" (the
            # replay trap every gate here guards; the probe is bounded
            # — state is aggregate-cardinality)
            if prior.limit(1).count() == 0:
                prior = None
        verdicts = None
        if prior is not None:
            stats = prior.groupBy("event_type").agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("n_events").cast("bigint").alias("sx"),
                F.sum(F.col("n_events") * F.col("n_events"))
                .cast("bigint")
                .alias("sxx"),
            )
            lhs = (
                F.col("n") * F.col("n_events") - F.col("sx")
            ) * (F.col("n") * F.col("n_events") - F.col("sx"))
            rhs = F.lit(k * k) * (
                F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
            )
            verdicts = (
                # per-type stats of the maintained state: hint-free join
                partials.join(stats, "event_type", "left")
                .select(
                    "window_start",
                    "event_type",
                    "n_events",
                    F.coalesce(lhs, F.lit(0)).cast("bigint").alias("z_lhs"),
                    F.coalesce(rhs, F.lit(0)).cast("bigint").alias("z_rhs"),
                    F.coalesce(
                        (F.col("n") >= 2) & (lhs > rhs), F.lit(False)
                    ).alias("anomalous"),
                )
            )
            merged_in = partials.unionByName(prior)
        else:
            merged_in = partials
        merged = merged_in.groupBy("window_start", "event_type").agg(
            F.sum("n_events").cast("bigint").alias("n_events")
        )
        return {"verdicts": verdicts, "new_state": merged}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dfs = _plan(batch_df, epoch_id)
        ep = f"epoch={epoch_id}"
        if dfs["verdicts"] is not None:
            dfs["verdicts"].coalesce(1).write.mode("overwrite").parquet(
                os.path.join(out, ep)
            )
        dfs["new_state"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state, ep)
        )

    _process.plan = _plan
    return _process


def _sag_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SAG_DONE, key[0])
    if key in _SAG_DONE:
        if _dir_ok(_SAG_DONE[key]):
            return _SAG_DONE[key]
        del _SAG_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_sag")
    out = os.path.join(base, "out")
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    mid = lo + (hi - lo) // 2  # setup-stage scalar: time-split point
    _run_split_landings(
        spark,
        base,
        "event_type string, ts timestamp",
        [
            ev.filter(F.unix_micros("ts") <= mid),
            ev.filter(F.unix_micros("ts") > mid),
        ],
        _anomaly_gate_processor(out, os.path.join(base, "state")),
    )
    _SAG_DONE[key] = out
    return out


def _sag_oracle() -> str:
    hr = "make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)"
    return f"""
    WITH b AS (
      SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
    ),
    m AS (SELECT lo + (hi - lo) // 2 AS mid FROM b),
    r1 AS (
      SELECT {hr} AS ws, event_type, CAST(count(*) AS BIGINT) AS x
      FROM events, m WHERE epoch_us(ts) <= m.mid GROUP BY 1, 2
    ),
    st AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM r1 GROUP BY event_type
    ),
    b2 AS (
      SELECT {hr} AS ws, event_type, CAST(count(*) AS BIGINT) AS x
      FROM events, m WHERE epoch_us(ts) > m.mid GROUP BY 1, 2
    )
    SELECT b2.ws AS window_start, b2.event_type, b2.x AS n_events,
           CAST(coalesce((s.n * b2.x - s.sx) * (s.n * b2.x - s.sx), 0)
                AS BIGINT) AS z_lhs,
           CAST(coalesce({_SAG_K * _SAG_K} * (s.n * s.sxx - s.sx * s.sx), 0)
                AS BIGINT) AS z_rhs,
           coalesce(s.n >= 2
                    AND (s.n * b2.x - s.sx) * (s.n * b2.x - s.sx)
                        > {_SAG_K * _SAG_K} * (s.n * s.sxx - s.sx * s.sx),
                    FALSE) AS anomalous
    FROM b2 LEFT JOIN st s USING (event_type)
    ORDER BY 1, 2
    """


@query("streaming_anomaly_gate", oracle=_sag_oracle())
def streaming_anomaly_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back landing 2's anomaly verdicts; the oracle restates
    rollup-landing-1 → per-type stats → judge-landing-2's-cells, so
    hash parity proves the maintained rollup state fed the integer
    z-score judgment across the checkpointed restart."""
    out = _sag_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select(
            "window_start",
            "event_type",
            "n_events",
            "z_lhs",
            "z_rhs",
            "anomalous",
        )
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# streaming_bloom_gate — the Bloom-filter decontamination gate at
# ingest, the SKETCH form of streaming_decontam_gate: where that gate
# broadcasts the benchmark's full shingle SET, this one freezes the
# corpus_bloom_decontaminate 512-word / 32,256-bit filter (k = 3
# seeded h64 positions, 63 usable bits per word — no sign-bit shifts)
# built from the first landing's benchmark slice (doc_id % 14 == 0)
# and epoch-commits the WORDS — a ≤512-row artifact independent of
# benchmark size, the shape that still broadcasts when the benchmark
# suite is 10⁸ shingles. Every landing's non-benchmark docs probe the
# frozen words (broadcast REQUIRED — bounded class) and emit
# (n_shingles, n_bloom_hits, flagged = hits ≥ 4) verdicts — the
# thresholded doc gate the batch query's measured t-sweep selected
# (any-hit flags 31× too many docs at the measured 2.75% per-shingle
# FPR). Training keyed on PRIOR-EPOCH ROWS (the replay trap);
# epoch-keyed idempotent overwrites; replay-proven.
#
# The oracle restates build-filter-on-the-%14-slice + probe-everyone,
# so hash parity proves the frozen words survived the checkpointed
# restart and landing 2 was gated by landing 1's filter — including
# every realized false positive, which the seeded hashes make exactly
# reproducible.
# --------------------------------------------------------------------------
_SBLM_DONE: dict[tuple[str, str], str] = {}
_SBLM_T = 4  # doc flag threshold (the batch query's measured knee)


def _bloom_gate_processor(out: str, word_state: str):
    """foreachBatch processor over (verdicts, frozen-words-state) dirs —
    module-level for the replay test, like the sibling gates."""
    from data_ingestion_din_spark.functions.analysis import (
        tokens,
        word_shingles,
    )
    from data_ingestion_din_spark.functions.hashing import h64
    from data_ingestion_din_spark.plans.curation_queries import (
        _BF_K,
        _BF_M,
        _BF_WBITS,
        _DC_N,
    )

    def _positions(df: DataFrame, keep: list[str]) -> DataFrame:
        pos = F.explode(
            F.array(
                *[
                    (h64(F.col("shingle"), seed=f"bl{j}:") % _BF_M)
                    for j in range(_BF_K)
                ]
            )
        ).alias("pos")
        return df.select(*keep, "shingle", pos)

    def _plan(batch_df: DataFrame, epoch_id: int):
        spark_l = batch_df.sparkSession
        sh = batch_df.select(
            "doc_id",
            F.explode_outer(
                F.array_distinct(
                    word_shingles(tokens(F.col("text")), _DC_N)
                )
            ).alias("shingle"),
        )
        prior = None
        if os.path.isdir(word_state):
            prior = (
                spark_l.read.option("basePath", word_state)
                .parquet(word_state)
                .filter(F.col("epoch") < epoch_id)
                .select("word", "bits")
            )
        if prior is not None and prior.limit(1).count() > 0:
            words = prior
            new_state = None  # frozen — written once by the training epoch
        else:
            words = (
                _positions(
                    sh.filter(
                        (F.col("doc_id") % 14 == 0)
                        & F.col("shingle").isNotNull()
                    )
                    .select("shingle")
                    .distinct(),
                    [],
                )
                .select(
                    (F.col("pos") / _BF_WBITS).cast("bigint").alias("word"),
                    F.expr(
                        "shiftleft(cast(1 as bigint),"
                        f" cast(pos % {_BF_WBITS} as int))"
                    ).alias("mask"),
                )
                .groupBy("word")
                .agg(F.bit_or("mask").alias("bits"))
                .localCheckpoint(eager=True)
            )
            new_state = words
        probe = sh.filter(
            (F.col("doc_id") % 14 != 0) & F.col("shingle").isNotNull()
        )
        tested = (
            _positions(probe, ["doc_id"])
            .withColumn("word", (F.col("pos") / _BF_WBITS).cast("bigint"))
            # the ≤512-word frozen filter: broadcast REQUIRED (bounded)
            .join(F.broadcast(words), "word", "left")
            .withColumn(
                "hit",
                F.coalesce(
                    F.expr(
                        f"shiftright(bits, cast(pos % {_BF_WBITS} as int))"
                        " & 1"
                    ),
                    F.lit(0),
                ),
            )
        )
        perdoc = (
            tested.groupBy("doc_id", "shingle")
            .agg(
                F.when(F.sum("hit") == _BF_K, 1)
                .otherwise(0)
                .alias("bloom_hit")
            )
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
                F.sum("bloom_hit").cast("bigint").alias("n_bloom_hits"),
            )
        )
        verdicts = (
            batch_df.filter(F.col("doc_id") % 14 != 0)
            .select("doc_id")
            .join(perdoc, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("n_shingles"), F.lit(0))
                .cast("bigint")
                .alias("n_shingles"),
                F.coalesce(F.col("n_bloom_hits"), F.lit(0))
                .cast("bigint")
                .alias("n_bloom_hits"),
            )
            .withColumn("flagged", F.col("n_bloom_hits") >= _SBLM_T)
        )
        return {"verdicts": verdicts, "new_state": new_state}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dfs = _plan(batch_df, epoch_id)
        ep = f"epoch={epoch_id}"
        dfs["verdicts"].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, ep)
        )
        if dfs["new_state"] is not None:
            dfs["new_state"].coalesce(1).write.mode("overwrite").parquet(
                os.path.join(word_state, ep)
            )

    _process.plan = _plan
    return _process


def _sblm_out_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SBLM_DONE, key[0])
    if key in _SBLM_DONE:
        if _dir_ok(_SBLM_DONE[key]):
            return _SBLM_DONE[key]
        del _SBLM_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_sblm")
    out = os.path.join(base, "out")
    _process = _bloom_gate_processor(out, os.path.join(base, "words"))
    _run_doc_parity_landings(spark, sf_dir, base, _process)
    _SBLM_DONE[key] = out
    return out


def _sblm_oracle() -> str:
    from data_ingestion_din_spark.plans.curation_queries import (
        _BF_K,
        _BF_WBITS,
        _DC_N,
        _DC_SHINGLE,
        _TOKS_SQL,
        _bf_probe_union_sql,
    )

    return f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    idx AS (
      SELECT doc_id, tk, unnest(range(1, len(tk) - {_DC_N - 2})) AS i
      FROM t WHERE len(tk) >= {_DC_N}
    ),
    sh AS (SELECT DISTINCT doc_id, {_DC_SHINGLE} AS shingle FROM idx),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 14 = 0),
    bpos AS (
      {_bf_probe_union_sql("ev", "shingle")}
    ),
    words AS MATERIALIZED (
      SELECT pos // {_BF_WBITS} AS word,
             bit_or(CAST(1 AS BIGINT) << (pos % {_BF_WBITS})) AS bits
      FROM bpos GROUP BY 1
    ),
    cor AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 14 <> 0),
    cp AS (
      {_bf_probe_union_sql("cor", "doc_id, shingle")}
    ),
    tested AS (
      SELECT c.doc_id, c.shingle,
             coalesce((w.bits >> (c.pos % {_BF_WBITS})) & 1, 0) AS hit
      FROM cp c LEFT JOIN words w ON w.word = c.pos // {_BF_WBITS}
    ),
    persh AS (
      SELECT doc_id, shingle,
             CASE WHEN sum(hit) = {_BF_K} THEN 1 ELSE 0 END AS bloom_hit
      FROM tested GROUP BY doc_id, shingle
    ),
    pd AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(bloom_hit) AS BIGINT) AS n_bloom_hits
      FROM persh GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(pd.n_shingles, 0) AS BIGINT) AS n_shingles,
           CAST(coalesce(pd.n_bloom_hits, 0) AS BIGINT) AS n_bloom_hits,
           coalesce(pd.n_bloom_hits, 0) >= {_SBLM_T} AS flagged
    FROM documents d LEFT JOIN pd USING (doc_id)
    WHERE d.doc_id % 14 <> 0
    ORDER BY d.doc_id
    """


@query("streaming_bloom_gate", oracle=_sblm_oracle())
def streaming_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back both landings' Bloom verdicts; the oracle restates
    build-the-512-word-filter-on-landing-1's-benchmark-slice +
    probe-everyone, so hash parity proves the frozen sketch survived
    the checkpointed restart — false positives included, exactly
    reproduced by the seeded hashes."""
    out = _sblm_out_dir(spark, sf_dir)
    return (
        spark.read.parquet(out)
        .select("doc_id", "n_shingles", "n_bloom_hits", "flagged")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# streaming_quantile_maintenance — the MERGEABLE QUANTILE SUMMARY at
# ingest, completing the sketch-at-ingest family (HLL registers ✓ r5,
# Bloom ✓ r10, CMS batch-side): each landing's doc lengths fold into
# an integer log2-binned histogram — bin = length(bin(n_chars + 1)),
# so bin b covers [2^(b−1)−1, 2^b−2] — whose counts are ADDITIVE, the
# property that makes histogram merge == from-scratch (the rollup
# maintenance argument applied to a distribution summary; this is the
# t-digest/KLL production role with a deterministic binning the hash
# gate can cover, where those sketches' randomized compactions could
# never pass). State is ≤ ~20 rows, epoch-committed after each
# additive merge with the latest prior state.
#
# The readback turns the maintained histogram into p50/p90/p99 upper
# bounds (first bin whose cumulative count reaches ceil(p·n/100)) and
# audits each against the EXACT percentile (the middle-rank recipe of
# corpus_length_percentiles) — in_bin proves the exact value landed
# inside the chosen bin, i.e. the maintained summary's error is
# bounded by the bin width by construction (a 2× relative bound for
# log2 bins), measured not assumed.
#
# Scale: per landing one map-side-combined ~20-bin aggregate; the
# exact side is the fixture-only audit column, sampled at production.
# --------------------------------------------------------------------------
_SQM_DONE: dict[tuple[str, str], str] = {}
_SQM_PCTS = (50, 90, 99)


def _quantile_processor(state: str):
    """foreachBatch additive histogram maintainer — module-level for
    the replay test, like the rollup maintainer it mirrors."""

    def _plan(batch_df: DataFrame, epoch_id: int) -> DataFrame:
        spark_l = batch_df.sparkSession
        partials = (
            batch_df.select(
                F.length(F.bin(F.col("n_chars") + 1)).cast("int").alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        if os.path.isdir(state):
            prior = _latest_epoch_rows(
                spark_l, state, ["bin"], before_epoch=epoch_id
            )
            partials = partials.unionByName(prior)
        return partials.groupBy("bin").agg(
            F.sum("cnt").cast("bigint").alias("cnt")
        )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merged = _plan(batch_df, epoch_id)
        merged.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state, f"epoch={epoch_id}")
        )

    _process.plan = _plan
    return _process


def _sqm_state_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SQM_DONE, key[0])
    if key in _SQM_DONE:
        if _dir_ok(_SQM_DONE[key]):
            return _SQM_DONE[key]
        del _SQM_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_sqm")
    state = os.path.join(base, "state")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    _run_split_landings(
        spark,
        base,
        "doc_id bigint, n_chars bigint",
        [docs.filter(F.col("doc_id") % 2 == p) for p in (0, 1)],
        _quantile_processor(state),
    )
    _SQM_DONE[key] = state
    return state


def _sqm_oracle() -> str:
    rows = []
    for p in _SQM_PCTS:
        rows.append(
            f"""SELECT {p} AS pct,
             (SELECT n FROM tot) AS n_docs,
             (SELECT (CAST(1 AS BIGINT) << bin) - 2 FROM cum
              WHERE cum >= greatest(1, CAST(ceil(
                (SELECT n FROM tot) * {p} / 100.0) AS BIGINT))
              ORDER BY bin LIMIT 1) AS approx_upper,
             (SELECT (CAST(1 AS BIGINT) << (bin - 1)) - 1 FROM cum
              WHERE cum >= greatest(1, CAST(ceil(
                (SELECT n FROM tot) * {p} / 100.0) AS BIGINT))
              ORDER BY bin LIMIT 1) AS approx_lo,
             (SELECT len FROM ranked
              WHERE rk = greatest(1, CAST(ceil(
                (SELECT n FROM tot) * {p} / 100.0) AS BIGINT))) AS exact_val"""
        )
    body = "\n      UNION ALL\n      ".join(rows)
    return f"""
    WITH h AS (
      SELECT CAST(length(bin(n_chars + 1)) AS INT) AS bin,
             CAST(count(*) AS BIGINT) AS cnt
      FROM documents GROUP BY 1
    ),
    cum AS (
      SELECT bin, CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum
      FROM h
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    ranked AS (
      SELECT CAST(n_chars AS BIGINT) AS len,
             row_number() OVER (ORDER BY n_chars, doc_id) AS rk
      FROM documents
    )
    SELECT CAST(pct AS INT) AS pct, n_docs,
           CAST(approx_upper AS BIGINT) AS approx_upper,
           CAST(approx_lo AS BIGINT) AS approx_lo,
           CAST(exact_val AS BIGINT) AS exact_val,
           exact_val BETWEEN approx_lo AND approx_upper AS in_bin
    FROM ({body})
    ORDER BY pct
    """


@query("streaming_quantile_maintenance", oracle=_sqm_oracle())
def streaming_quantile_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Read back the maintained histogram and serve percentiles from
    it; the oracle computes the identical histogram from the full
    table in one shot, so parity proves additive-merge == from-scratch
    AND pins every served quantile bound + its exact-side audit."""
    from pyspark.sql.window import Window as W

    state = _sqm_state_dir(spark, sf_dir)
    hist = _latest_epoch_rows(spark, state, ["bin"])
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(W.orderBy("bin").rowsBetween(
            W.unboundedPreceding, W.currentRow
        )).cast("bigint"),
    ).localCheckpoint(eager=True)  # ≤ ~20 rows: serves every pct row
    docs = load_table(spark, sf_dir, "documents")
    tot = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = docs.select(
        F.col("n_chars").cast("bigint").alias("len"),
        F.row_number()
        .over(W.orderBy("n_chars", "doc_id"))
        .alias("rk"),
    ).localCheckpoint(eager=False)
    out = None
    for p in _SQM_PCTS:
        target = F.greatest(
            F.lit(1), F.ceil(F.col("n") * p / 100.0).cast("bigint")
        )
        # first bin whose cumulative reaches the rank — 1-row control
        pick = (
            cum.crossJoin(F.broadcast(tot))
            .filter(F.col("cum") >= target)
            .orderBy("bin")
            .limit(1)
            .select(
                F.lit(p).cast("int").alias("pct"),
                F.col("n").alias("n_docs"),
                F.expr("shiftleft(cast(1 as bigint), bin) - 2")
                .cast("bigint")
                .alias("approx_upper"),
                F.expr("shiftleft(cast(1 as bigint), bin - 1) - 1")
                .cast("bigint")
                .alias("approx_lo"),
                target.alias("rk"),
            )
        )
        row = (
            pick.join(ranked, "rk")
            .select(
                "pct",
                "n_docs",
                "approx_upper",
                "approx_lo",
                F.col("len").alias("exact_val"),
                F.col("len")
                .between(F.col("approx_lo"), F.col("approx_upper"))
                .alias("in_bin"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("pct")


# --------------------------------------------------------------------------
# streaming_cms_maintenance — the Count-Min sketch MAINTAINED at
# ingest, closing the sketch-at-ingest family (HLL registers ✓ r5,
# Bloom ✓ r10, log2-quantile histogram ✓ r10): each landing's token
# occurrences fold into (row, bucket) counter partials against the
# same d=4 × w=256 seeded-hash grid as corpus_cms_heavy_hitters, and
# the maintainer merges them ADDITIVELY with the latest prior-epoch
# grid (counters are sums — the mergeability CMS is built on), epoch-
# committing the full ≤1024-row state. The readback serves the exact
# top-30 tokens' estimates FROM the maintained grid, and the oracle is
# the batch CMS query VERBATIM (oracle_ref) — additive merge makes
# incremental maintenance provably equal to the one-shot sketch, and
# hash parity enforces it across the checkpointed restart, collision
# structure and all.
#
# Scale: per landing one map-side-combined (row, bucket) aggregate of
# the batch; state is d·w rows regardless of corpus size — the point
# of CMS; the probe join broadcasts the grid.
# --------------------------------------------------------------------------
_SCM_DONE: dict[tuple[str, str], str] = {}


def _cms_processor(state: str):
    """foreachBatch additive CMS-grid maintainer — module-level for
    the replay test, like the rollup/histogram maintainers."""
    from data_ingestion_din_spark.functions.analysis import tokens
    from data_ingestion_din_spark.functions.hashing import h64
    from data_ingestion_din_spark.plans.analytic_ext import (
        _CMS_D,
        _CMS_W,
    )

    def _plan(batch_df: DataFrame, epoch_id: int) -> DataFrame:
        spark_l = batch_df.sparkSession
        partials = (
            batch_df.select(F.explode(tokens(F.col("text"))).alias("tok"))
            .select(
                "tok",
                F.explode(
                    F.array(*[F.lit(r) for r in range(_CMS_D)])
                ).alias("r"),
            )
            .select(
                "r",
                F.pmod(
                    h64(
                        F.concat(
                            F.lit("cms"),
                            F.col("r").cast("string"),
                            F.lit(":"),
                            F.col("tok"),
                        )
                    ),
                    F.lit(_CMS_W),
                ).alias("bucket"),
            )
            .groupBy("r", "bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("counter"))
        )
        if os.path.isdir(state):
            prior = _latest_epoch_rows(
                spark_l, state, ["r", "bucket"], before_epoch=epoch_id
            )
            partials = partials.unionByName(prior)
        return partials.groupBy("r", "bucket").agg(
            F.sum("counter").cast("bigint").alias("counter")
        )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merged = _plan(batch_df, epoch_id)
        merged.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state, f"epoch={epoch_id}")
        )

    _process.plan = _plan
    return _process


def _scm_state_dir(spark: SparkSession, sf_dir: str) -> str:
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    _evict_dead(_SCM_DONE, key[0])
    if key in _SCM_DONE:
        if _dir_ok(_SCM_DONE[key]):
            return _SCM_DONE[key]
        del _SCM_DONE[key]

    base = fresh_app_dir(spark, sf_dir, "spark_graft_scm")
    state = os.path.join(base, "state")
    _run_doc_parity_landings(spark, sf_dir, base, _cms_processor(state))
    _SCM_DONE[key] = state
    return state


@query("streaming_cms_maintenance", oracle_ref="corpus_cms_heavy_hitters")
def streaming_cms_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Serve the exact top-30 tokens' CMS estimates from the
    incrementally maintained grid; the oracle is the one-shot batch
    sketch verbatim — additive merge == from-scratch, hash-enforced
    across the checkpointed restart."""
    from data_ingestion_din_spark.functions.analysis import tokens
    from data_ingestion_din_spark.functions.hashing import h64
    from data_ingestion_din_spark.plans.analytic_ext import (
        _CMS_D,
        _CMS_TOPK,
        _CMS_W,
    )

    state = _scm_state_dir(spark, sf_dir)
    cms = _latest_epoch_rows(spark, state, ["r", "bucket"])
    docs = load_table(spark, sf_dir, "documents")
    exact = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    probe = exact.orderBy(F.desc("n"), "tok").limit(_CMS_TOPK)
    pcells = probe.select(
        "tok",
        "n",
        F.explode(F.array(*[F.lit(r) for r in range(_CMS_D)])).alias("r"),
    ).select(
        "tok",
        "n",
        "r",
        F.pmod(
            h64(
                F.concat(
                    F.lit("cms"),
                    F.col("r").cast("string"),
                    F.lit(":"),
                    F.col("tok"),
                )
            ),
            F.lit(_CMS_W),
        ).alias("bucket"),
    )
    est = (
        pcells.join(F.broadcast(cms), ["r", "bucket"])
        .groupBy("tok", "n")
        .agg(F.min("counter").cast("bigint").alias("cms_estimate"))
    )
    return est.select(
        "tok", F.col("n").alias("exact_count"), "cms_estimate"
    ).orderBy(F.desc("exact_count"), "tok")

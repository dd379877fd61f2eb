"""Shared scaffolding for the streaming query families (SURVEY.md §2.11).

The streaming surface is split per family — streaming_cdc (ingest /
event-time / table maintenance), streaming_indexes (incrementally
maintained search indexes), streaming_gates (frozen-artifact admission
gates), streaming_sketches (maintained sketch state + dq-at-ingest
judges) — after the flat 5.5k-line module's helper namespace caused a
silent prefix-shadowing bug (r10: a later ``_sbg_*`` definition replaced
the BPE gate's helper). This module holds the pieces every family
shares: cache eviction, the awaitTermination guard, the multi-restart
landing harness, and the epoch-keyed state reader.
tests/test_module_hygiene.py asserts helper prefixes stay unique per
module.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_din_spark.sources.tables import load_table

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



"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming surface at all (SURVEY.md §2.11); the one
stateful behavior it approximates — "skip documents already ingested" —
is a driver-side directory diff (scripts/run_ingestion.py). Here it is a
real incremental operator: a streaming first-seen filter whose state
lives in Spark's state store, keyed by content fingerprint.

Scale notes (100 TB posture):

- State is partitioned by the grouping key across the cluster's state
  store (RocksDB-backed in production) — no driver state, arbitrary key
  cardinality, and each micro-batch touches only the keys it contains.
- The stored value per key is a single boolean-sized row, NOT the row
  content — state size is O(distinct keys), the minimum any exact
  streaming dedup can hold. (Native ``dropDuplicates`` on a stream
  stores the full dedup columns; fingerprinting first keeps state
  narrow, the same trick as the batch fingerprint dedup U4.)
- Batch twin: ``operators.dedup.keep_first_by`` (same winner semantics
  when the stream is replayed as one batch in arrival order).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

# state: one marker int per fingerprint (smallest stable state row)
_STATE_SCHEMA = "seen INT"


def _first_seen_fn(
    key: tuple, pdfs: Iterable["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    """Emit rows for a fingerprint only if this is its first appearance
    across the life of the stream; within the first micro-batch, keep the
    single first row (stable arrival order within a group batch)."""
    if state.exists:
        return  # duplicate content: emit nothing, state already marks it
    state.update((1,))
    for pdf in pdfs:
        if len(pdf):
            yield pdf.head(1)
            return


def first_seen_stream(docs: DataFrame, key_col: str = "fp") -> DataFrame:
    """Streaming exact dedup: pass through only the FIRST row seen per
    ``key_col`` over the whole stream lifetime (state survives across
    micro-batches and restarts via the checkpoint).

    ``docs`` must already carry the dedup key column (use
    ``functions.analysis.fingerprint`` for content fingerprints) — the
    operator stays agnostic of how the key is derived.
    """
    out_schema = StructType(
        [f for f in docs.schema.fields]  # passthrough schema
    )
    return (
        docs.groupBy(key_col)
        .applyInPandasWithState(
            _first_seen_fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _make_running_max_fn(key_names: list[str], val_col: str):
    def fn(
        key: tuple, pdfs: Iterable["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        """Emit the key's new running max when this micro-batch raises
        it; emit nothing otherwise (monotone register semantics)."""
        import pandas as pd

        batch_max = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf[val_col].max())
                batch_max = m if batch_max is None else max(batch_max, m)
        if batch_max is None:
            return
        if state.exists and state.get[0] >= batch_max:
            return
        state.update((batch_max,))
        yield pd.DataFrame(
            [dict(zip(key_names, key)) | {val_col: batch_max}]
        )

    return fn


def running_max_stream(
    df: DataFrame, key_cols: list[str], val_col: str
) -> DataFrame:
    """Streaming monotone-register maintenance: per ``key_cols`` group,
    emit a row whenever the lifetime max of ``val_col`` increases — the
    incremental update pattern of register sketches (HLL registers are
    per-bucket maxima, so the last emission per key IS the batch
    register). State per key is ONE int; arbitrary key cardinality
    partitions across the state store like first_seen_stream."""
    import pyspark.sql.types as T

    out_schema = StructType(
        [df.schema[c] for c in key_cols]
        + [T.StructField(val_col, T.IntegerType())]
    )
    return df.groupBy(*key_cols).applyInPandasWithState(
        _make_running_max_fn(key_cols, val_col),
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

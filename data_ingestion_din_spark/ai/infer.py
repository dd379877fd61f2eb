"""Generic batched-inference stage: mapInPandas + per-partition client.

Replaces the reference's per-item synchronous calls (L1-L12, SURVEY.md
§2.10): one client init per partition (not per row), Arrow record batches
in and out, bounded batch size via Spark's own
``spark.sql.execution.arrow.maxRecordsPerBatch``. Retry/rate-limit policy
lives in the client, not in sleeps between rows.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


class NullModel:
    """Deterministic offline stand-in: echoes a hash-derived label so the
    full inference plumbing (batching, schema, per-partition init) runs
    byte-reproducibly with no network — the CI twin of the reference's
    rule fallbacks."""

    def __init__(self, labels: tuple[str, ...] = ("a", "b")):
        self.labels = labels

    def predict_batch(self, prompts: list[str]) -> list[str]:
        import hashlib

        return [
            self.labels[
                int.from_bytes(hashlib.md5(p.encode()).digest()[:2], "big")
                % len(self.labels)
            ]
            for p in prompts
        ]


def map_inference(
    df: DataFrame,
    input_col: str,
    output_col: str,
    make_client: Callable[[], object],
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Run ``client.predict_batch(list[str]) -> list[str]`` over
    ``input_col``, appending ``output_col``. The client is constructed
    once per partition (model load / auth token amortized — the Spark
    analog of the reference's module-level singletons,
    backend/services/embeddings.py:17,32-47)."""
    out_fields = [T.StructField(c, df.schema[c].dataType) for c in passthrough]
    out_fields.append(T.StructField(output_col, T.StringType()))
    schema = T.StructType(out_fields)
    cols = [*passthrough, input_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = make_client()  # once per partition
        for pdf in batches:
            preds = client.predict_batch(list(pdf[input_col]))
            out = pdf[list(passthrough)].copy()
            out[output_col] = preds
            yield out

    return df.select(*cols).mapInPandas(run, schema=schema)

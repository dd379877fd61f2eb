"""W5 — semantic chunk grouping: the reference's only genuinely
order-dependent stateful loop (backend/services/chunking.py:216-298).

Blocks accumulate into a chunk until a break: the block's section differs
from the previous block's, the block is an H1 heading, or adding it would
blow the running character budget (1200 chars, chunking.py:22). The
budget makes this NON-expressible as a plain window (the accumulator
resets at each break the accumulator itself decides) — so this is the one
place the engine drops to ``applyInPandas``: one Arrow batch per doc_id
group, plain pandas walk inside, content-addressed chunk ids out
(``{doc_id}::{md5[:8]}``, chunking.py:401-415).

Scale: partitioned by doc_id — thousands of docs per partition, each walk
O(blocks-per-doc); no driver state, no collect.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

CHUNK_CHAR_BUDGET = 1200

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("chunk_seq", T.IntegerType()),
        T.StructField("chunk_id", T.StringType()),
        T.StructField("section", T.StringType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("content_fp", T.StringType()),
    ]
)


def semantic_chunks(
    blocks: DataFrame, char_budget: int = CHUNK_CHAR_BUDGET
) -> DataFrame:
    """Group sectioned blocks (requires page, ord, content, section,
    heading_level) into chunks per document.

    Physical shape: repartition by doc_id + sortWithinPartitions, then ONE
    mapInPandas walk per partition that streams thousands of docs — not
    applyInPandas per doc group, whose per-group invocation + Arrow
    overhead dominated (measured 36 s → ~2 s at sf0.1 for the same walk).
    State (open chunk) is carried across Arrow batches inside the
    partition iterator, since a doc's rows can straddle batch boundaries.
    """
    from collections.abc import Iterator

    colnames = [f.name for f in CHUNK_SCHEMA]

    def walk_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = {
            "doc_id": None,
            "cur": [],
            "cur_section": None,
            "prev_section": None,
            "cum": 0,
            "seq": 0,
        }
        out: list[dict] = []

        def flush() -> None:
            if not state["cur"]:
                return
            state["seq"] += 1
            content = "\n".join(state["cur"])
            fp = hashlib.md5(content.encode("utf-8")).hexdigest()
            out.append(
                {
                    "doc_id": state["doc_id"],
                    "chunk_seq": state["seq"],
                    "chunk_id": f"{state['doc_id']}::{fp[:8]}",
                    "section": state["cur_section"],
                    "n_blocks": len(state["cur"]),
                    "n_chars": len(content),
                    "content_fp": fp,
                }
            )
            state["cur"], state["cum"] = [], 0

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                doc_id = str(row.doc_id)
                if doc_id != state["doc_id"]:
                    flush()
                    state.update(
                        doc_id=doc_id, seq=0, prev_section=None, cur_section=None
                    )
                section = row.section if isinstance(row.section, str) else None
                brk = bool(state["cur"]) and (
                    (section or "") != (state["prev_section"] or "")
                    or row.heading_level == "H1"
                    or state["cum"] + 1 + len(row.content) > char_budget
                )
                if brk:
                    flush()
                if not state["cur"]:
                    state["cur_section"] = section
                    state["cum"] = len(row.content)
                else:
                    state["cum"] += 1 + len(row.content)
                state["cur"].append(row.content)
                state["prev_section"] = section
            if len(out) >= 10_000:
                yield pd.DataFrame(out, columns=colnames)
                out = []
        flush()
        yield pd.DataFrame(out, columns=colnames)

    cols = ["doc_id", "page", "ord", "content", "section", "heading_level"]
    return (
        blocks.select(*cols)
        .repartition("doc_id")
        .sortWithinPartitions("doc_id", "page", "ord")
        .mapInPandas(walk_partition, schema=CHUNK_SCHEMA)
    )

"""Training-corpus curation operators beyond the reference's pipeline:
benchmark decontamination, PII redaction, repetition-based quality
signals, and deterministic stratified sampling.

The reference curates per-document at ingest time only (noise filters,
ingestion/pdf_parser.py; dedup, table_extractor.py:98-108); a pretraining
pipeline additionally curates at CORPUS level before training. These four
are the standard corpus-level passes, each expressed Spark-first:

- **Decontamination** (eval-set n-gram overlap): the corpus side explodes
  to (shingle, doc_id) and joins a broadcast eval-shingle set — at 100 TB
  the eval side (benchmarks) is tiny by construction, so the join is a
  map-side broadcast hash join over the corpus scan: no corpus shuffle at
  all. One groupBy(doc_id) counts hits.
- **PII redaction**: pure ``regexp_replace``/``regexp_extract_all``
  chains (RE2-compatible, no lookaround) — runs inside whole-stage
  codegen at scan speed; counts + redacted fingerprint per doc, narrow.
- **Repetition quality** (Gopher-style): duplicate-3-gram fraction,
  top-token dominance, mean token length — all higher-order array
  expressions per doc, shuffle-free; dominance is O(u·n) per doc over
  arrays, embarrassingly parallel.
- **Stratified sampling**: hash-gate ``h64('sample:'||doc_id) % 1000 <
  per-stratum rate`` — deterministic, reproducible, join-free and
  shuffle-free (vs ``ORDER BY rand()`` which is a full sort, or
  ``sample()`` which is irreproducible across engines); the shape used
  for domain-mixture weighting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_ingestion_din_spark.functions.analysis import tokens, word_shingles
from data_ingestion_din_spark.functions.hashing import h64
from data_ingestion_din_spark.sources.tables import scan_parallel

# RE2-compatible (Spark Java regex + DuckDB) — no lookaround, no
# backrefs. Order matters: URLs first (an email-like token inside a URL
# must redact as part of the URL), then emails, then phone numbers.
URL_RE = "https?://[^ ]+"
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "0[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}"

PII_STEPS: tuple[tuple[str, str], ...] = (
    (URL_RE, "[URL]"),
    (EMAIL_RE, "[EMAIL]"),
    (PHONE_RE, "[PHONE]"),
)


def redact_pii(col: Column) -> Column:
    """Redact URLs / emails / phone numbers with typed placeholders."""
    for pat, rep in PII_STEPS:
        col = F.regexp_replace(col, pat, rep)
    return col


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match counts (computed BEFORE redaction)."""
    return {
        "n_urls": F.size(F.regexp_extract_all(col, F.lit(URL_RE), F.lit(0))),
        "n_emails": F.size(
            F.regexp_extract_all(col, F.lit(EMAIL_RE), F.lit(0))
        ),
        "n_phones": F.size(
            F.regexp_extract_all(col, F.lit(PHONE_RE), F.lit(0))
        ),
    }


def decontaminate_hits(
    corpus: DataFrame, eval_docs: DataFrame, n: int = 8
) -> DataFrame:
    """Corpus docs sharing ≥1 word ``n``-gram with the eval set:
    (doc_id, n_hits = #distinct overlapping shingles). The caller
    anti-joins these ids to drop contaminated docs.

    eval shingles are distinct + broadcast (benchmarks are tiny relative
    to any training corpus); the corpus side is explode → broadcast-join
    → groupBy(doc_id): the only shuffle carries (doc_id, partial count).
    """
    sh = lambda df: df.select(  # noqa: E731
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col("text")), n))
        ).alias("shingle"),
    )
    eval_sh = sh(eval_docs).select("shingle").distinct()
    return (
        sh(scan_parallel(corpus))
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Gopher-style per-doc repetition/quality signals, shuffle-free:

    - ``dup_3gram_frac``: 1 − distinct/total word 3-grams (0 when the doc
      has <3 tokens);
    - ``top_tok_frac``: frequency of the most common token / n_tokens;
    - ``mean_tok_len``: mean token length.

    A doc is ``keep``-worthy when dup_3gram_frac ≤ 0.5 AND top_tok_frac
    ≤ 0.2 — repeated-boilerplate and keyword-stuffed docs fail.
    """
    toks = tokens(F.col("text"))
    base = scan_parallel(docs).select(
        "doc_id", toks.alias("tk"), word_shingles(toks, 3).alias("tri")
    )
    n_tok = F.size("tk")
    n_tri = F.size("tri")
    dup_frac = F.when(n_tri > 0, 1.0 - F.size(F.array_distinct("tri")) / n_tri
                      ).otherwise(F.lit(0.0))
    # mode frequency over the token array: count each distinct token's
    # occurrences with array HOFs (no explode, no shuffle)
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct("tk"),
            lambda t: F.size(F.filter(F.col("tk"), lambda x: x == t)),
        )
    )
    top_frac = F.when(
        n_tok > 0, top_cnt.cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    mean_len = F.when(
        n_tok > 0,
        F.aggregate(
            F.col("tk"), F.lit(0), lambda a, t: a + F.length(t)
        ).cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    return base.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        F.round(dup_frac, 6).alias("dup_3gram_frac"),
        F.round(top_frac, 6).alias("top_tok_frac"),
        F.round(mean_len, 6).alias("mean_tok_len"),
        ((dup_frac <= 0.5) & (top_frac <= 0.2)).alias("keep"),
    )


def stratified_sample_flag(
    stratum: Column, id_col: Column, rates_per_mille: dict[str, int],
    default_rate: int = 250, seed: str = "sample",
) -> Column:
    """Deterministic per-stratum inclusion flag:
    ``h64(seed || id) % 1000 < rate(stratum)``. Reproducible across
    engines and runs, join-free, and exact-in-expectation — the
    domain-mixture sampling shape (rate in ‰)."""
    rate = None
    for k, v in sorted(rates_per_mille.items()):
        cond = F.when(stratum == k, F.lit(v))
        rate = cond if rate is None else rate.when(stratum == k, F.lit(v))
    rate = rate.otherwise(F.lit(default_rate)) if rate is not None else F.lit(
        default_rate
    )
    return F.pmod(h64(F.concat(F.lit(seed + ":"), id_col.cast("string"))),
                  F.lit(1000)) < rate


PACK_SCHEMA = "lang string, seq_id int, n_docs bigint, total_tokens bigint"
PACK_SCHEMA_SHARDED = (
    "lang string, shard bigint, seq_id int, n_docs bigint, "
    "total_tokens bigint"
)


def pack_sequences(
    docs: DataFrame, budget: int = 1024, shard_col: str | None = None
) -> DataFrame:
    """Greedy sequence packing for pretraining batches: documents in
    doc_id order are packed per stratum into training sequences whose
    token counts fill (and never straddle) ``budget`` — a doc that would
    overflow starts the next sequence; an over-budget doc gets its own
    sequence. Returns one row per packed sequence
    (lang[, shard], seq_id, n_docs, total_tokens).

    The running budget RESETS at breaks the accumulator itself decides,
    so (like W5 semantic chunking) this is not a plain window: the
    engine's second ``mapInPandas`` walk — repartition by the walk key,
    sort within partitions, stream thousands of strata per partition
    with state carried across Arrow batches.

    ``shard_col`` is the production scale lever: packing per ``lang``
    alone bounds parallelism by stratum count (5 languages = 5 busy
    tasks no matter the cluster). Passing an integer shard column packs
    per ``(lang, shard)`` — parallelism tracks shard count, each shard
    packs independently (the walker key is the pair), and every doc is
    still packed exactly once (tests/test_curation.py asserts the
    per-stratum doc/token totals are invariant to shard count).
    """
    from collections.abc import Iterator

    import pandas as pd

    sharded = shard_col is not None
    if sharded:
        base = docs.select(
            "lang",
            F.col(shard_col).cast("bigint").alias("shard"),
            "doc_id",
            F.size(tokens(F.col("text"))).alias("n"),
        )
        keys, schema = ["lang", "shard"], PACK_SCHEMA_SHARDED
    else:
        base = docs.select(
            "lang", "doc_id", F.size(tokens(F.col("text"))).alias("n")
        )
        keys, schema = ["lang"], PACK_SCHEMA
    cols = keys + ["seq_id", "n_docs", "total_tokens"]

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = {"key": None, "seq": 0, "cum": 0, "docs": 0}
        out: list[dict] = []

        def flush() -> None:
            if state["docs"]:
                row = dict(zip(keys, state["key"]))
                row.update(
                    seq_id=state["seq"],
                    n_docs=state["docs"],
                    total_tokens=state["cum"],
                )
                out.append(row)
            state["cum"], state["docs"] = 0, 0

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                key = tuple(getattr(row, k) for k in keys)
                if key != state["key"]:
                    flush()
                    state.update(key=key, seq=0)
                n = int(row.n)
                if state["docs"] and state["cum"] + n > budget:
                    flush()
                if not state["docs"]:
                    state["seq"] += 1
                state["cum"] += n
                state["docs"] += 1
            if len(out) >= 10_000:
                yield pd.DataFrame(out, columns=cols)
                out = []
        flush()
        yield pd.DataFrame(out, columns=cols)

    return (
        base.repartition(*keys)
        .sortWithinPartitions(*keys, "doc_id")
        .mapInPandas(walk, schema=schema)
    )


BIN_PACK_SCHEMA = "grp bigint, bin_id int, n_items bigint, total_n bigint"
PACK_ASSIGN_SCHEMA = "grp bigint, item_id bigint, bin_id int"


def _pack_walk(
    base: DataFrame, order_cols: list, budget: int, per_item: bool
) -> DataFrame:
    """ONE next-fit state machine behind :func:`pack_bins` (per-bin
    totals) and :func:`pack_assign` (per-item assignment) — the budget
    rule (a bin never straddles; an over-budget item gets its own bin),
    the group reset, and the Arrow-batch chunking live exactly once so
    the compaction planner and the layout auditors can never
    desynchronize on packing semantics."""
    from collections.abc import Iterator

    import pandas as pd

    cols = (
        ["grp", "item_id", "bin_id"]
        if per_item
        else ["grp", "bin_id", "n_items", "total_n"]
    )
    schema = PACK_ASSIGN_SCHEMA if per_item else BIN_PACK_SCHEMA

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = {"key": None, "bin": 0, "cum": 0, "items": 0}
        out: list[tuple] = []

        def flush() -> None:
            if not per_item and state["items"]:
                out.append(
                    (state["key"], state["bin"], state["items"],
                     state["cum"])
                )
            state["cum"], state["items"] = 0, 0

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                if row.grp != state["key"]:
                    flush()
                    state.update(key=row.grp, bin=0)
                n = int(row.n)
                if state["items"] and state["cum"] + n > budget:
                    flush()
                if not state["items"]:
                    state["bin"] += 1
                state["cum"] += n
                state["items"] += 1
                if per_item:
                    out.append(
                        (row.grp, int(row.item_id), state["bin"])
                    )
            if len(out) >= 10_000:
                yield pd.DataFrame(out, columns=cols)
                out = []
        flush()
        yield pd.DataFrame(out, columns=cols)

    return (
        base.repartition("grp")
        .sortWithinPartitions("grp", *order_cols)
        .mapInPandas(walk, schema=schema)
    )


def pack_bins(base: DataFrame, order_cols: list, budget: int) -> DataFrame:
    """Generic next-fit bin packing: rows ``(grp, n, …)`` are streamed
    per ``grp`` in ``order_cols`` order and packed into bins that never
    straddle ``budget`` (an over-budget item gets its own bin) — the
    :func:`pack_sequences` walker generalized to caller-chosen grouping
    and ordering, for the layout/compaction planners (the ordering IS
    the strategy under test there, so it must be a parameter, not a
    baked-in ``doc_id``). One row per bin: (grp, bin_id, n_items,
    total_n).

    Scale: repartition on ``grp`` (parallelism = group count, the same
    shard lever as pack_sequences), sort within partitions, one
    mapInPandas pass with state carried across Arrow batches.
    """
    return _pack_walk(base, order_cols, budget, per_item=False)


def pack_assign(base: DataFrame, order_cols: list, budget: int) -> DataFrame:
    """:func:`pack_bins` emitting the per-ITEM assignment instead of
    per-bin totals — rows ``(grp, item_id, n, …)`` walked per ``grp``
    in ``order_cols`` order, one output row per item: (grp, item_id,
    bin_id). The layout auditors join this back to the items to compute
    per-bin statistics (min/max zone maps) declaratively."""
    return _pack_walk(base, order_cols, budget, per_item=True)

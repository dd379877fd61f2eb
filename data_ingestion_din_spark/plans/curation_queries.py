"""Corpus-curation queries (operators/curation.py) under the oracle gate:
benchmark decontamination, PII redaction, repetition quality, and
deterministic stratified sampling over the ``documents`` fixture.

Oracle notes: shingles join tokens with a single space on both sides;
hash gates use the portable md5-based ``h64``; PII fixtures are GENERATED
deterministically on both sides (the raw corpus contains no PII — the
same generate-then-operate pattern as the HTML-parse and clean-roundtrip
oracles), so the redaction chain's exact semantics are what parity
checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_din_spark.functions.hashing import h64_sql
from data_ingestion_din_spark.operators import curation as C
from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.sources.tables import load_table

_TOKS_SQL = "list_filter(string_split(text, ' '), x -> x <> '')"

# --------------------------------------------------------------------------
# corpus_decontaminate — eval-set 8-gram overlap: corpus docs sharing any
# 8-gram with the held-out eval slice (doc_id % 7 = 0 — the fixture's
# near-dups make this non-degenerate). At 100 TB: broadcast eval
# shingles, zero corpus shuffle before the (doc_id, count) groupBy.
# --------------------------------------------------------------------------
_DC_N = 8
_DC_SHINGLE = " || ' ' || ".join(f"tk[i+{j}]" for j in range(_DC_N))


@query(
    "corpus_decontaminate",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    idx AS (
      SELECT doc_id, tk, unnest(range(1, len(tk) - {_DC_N - 2})) AS i
      FROM t WHERE len(tk) >= {_DC_N}
    ),
    sh AS (SELECT DISTINCT doc_id, {_DC_SHINGLE} AS shingle FROM idx),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 7 = 0)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM sh
    WHERE doc_id % 7 <> 0 AND shingle IN (SELECT shingle FROM ev)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    return (
        C.decontaminate_hits(corpus, eval_docs, n=_DC_N)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# pii_redaction — URL/email/phone scrubbing. The fixture corpus has no
# PII, so a deterministic tail is appended per doc_id residue (generated
# IDENTICALLY in both engines) and the query must find and redact
# exactly it: counts + redacted fingerprint are hash-compared.
# --------------------------------------------------------------------------
_PII_TAIL_SQL = """CASE CAST(doc_id % 3 AS INT)
      WHEN 0 THEN ' Contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 08-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                  || '-4567 now.'
      WHEN 1 THEN ' See https://example.org/d/' || CAST(doc_id AS VARCHAR)
                  || ' for details.'
      ELSE '' END"""


def _pii_tail_spark() -> F.Column:
    d = F.col("doc_id")
    return (
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit(" Contact user"),
                d.cast("string"),
                F.lit("@example.com or 08-"),
                F.lpad((d % 1000).cast("string"), 3, "0"),
                F.lit("-4567 now."),
            ),
        )
        .when(
            d % 3 == 1,
            F.concat(
                F.lit(" See https://example.org/d/"),
                d.cast("string"),
                F.lit(" for details."),
            ),
        )
        .otherwise(F.lit(""))
    )


# DuckDB standard strings are backslash-literal (no escape processing),
# so regex patterns embed verbatim — only quotes need doubling.
def _pii_sql_chain(expr: str) -> str:
    for pat, rep in C.PII_STEPS:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{rep}', 'g')"
    return expr


_EMAIL_RE_SQL = C.EMAIL_RE.replace("'", "''")


@query(
    "pii_redaction",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text || {_PII_TAIL_SQL} AS ptext FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(ptext, '{C.URL_RE}')) AS BIGINT)
             AS n_urls,
           CAST(len(regexp_extract_all(ptext, '{_EMAIL_RE_SQL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(ptext, '{C.PHONE_RE}')) AS BIGINT)
             AS n_phones,
           md5({_pii_sql_chain('ptext')}) AS redacted_fp
    FROM t
    ORDER BY doc_id
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ptext = F.concat(F.col("text"), _pii_tail_spark())
    staged = docs.select("doc_id", ptext.alias("ptext"))
    counts = C.pii_counts(F.col("ptext"))
    return staged.select(
        "doc_id",
        counts["n_urls"].cast("bigint").alias("n_urls"),
        counts["n_emails"].cast("bigint").alias("n_emails"),
        counts["n_phones"].cast("bigint").alias("n_phones"),
        F.md5(C.redact_pii(F.col("ptext"))).alias("redacted_fp"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# doc_repetition_quality — Gopher-style repetition signals + keep flag.
# --------------------------------------------------------------------------
@query(
    "doc_repetition_quality",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    tri AS (
      SELECT doc_id, tk,
             CASE WHEN len(tk) < 3 THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END
               AS tri
      FROM t
    ),
    sig AS (
      SELECT doc_id,
             len(tk) AS n_tok,
             CASE WHEN len(tri) > 0
                  THEN 1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) / len(tri)
                  ELSE 0.0 END AS dup_frac,
             CASE WHEN len(tk) > 0
                  THEN CAST(list_max(list_transform(list_distinct(tk),
                       u -> len(list_filter(tk, x -> x = u)))) AS DOUBLE)
                       / len(tk)
                  ELSE 0.0 END AS top_frac,
             CASE WHEN len(tk) > 0
                  THEN CAST(list_sum(list_transform(tk, x -> length(x)))
                            AS DOUBLE) / len(tk)
                  ELSE 0.0 END AS mean_len
      FROM tri
    )
    SELECT doc_id,
           CAST(n_tok AS BIGINT) AS n_tokens,
           round(dup_frac, 6) AS dup_3gram_frac,
           round(top_frac, 6) AS top_tok_frac,
           round(mean_len, 6) AS mean_tok_len,
           (dup_frac <= 0.5 AND top_frac <= 0.2) AS keep
    FROM sig
    ORDER BY doc_id
    """,
)
def doc_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.repetition_signals(docs).orderBy("doc_id")


# --------------------------------------------------------------------------
# corpus_stratified_sample — deterministic hash-gated per-language
# sampling (domain-mixture weighting): en kept at 100‰, zh at 500‰,
# default 250‰. Output = per-stratum totals so the achieved rates are
# hash-checked, not just "it runs".
# --------------------------------------------------------------------------
_RATES = {"en": 100, "zh": 500}
_DEFAULT_RATE = 250
_GATE_H64 = h64_sql("'sample:' || CAST(doc_id AS VARCHAR)")
_GATE_SQL = (
    _GATE_H64
    + " % 1000 < CASE lang WHEN 'en' THEN 100 WHEN 'zh' THEN 500 ELSE 250 END"
)


@query(
    "corpus_stratified_sample",
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN {_GATE_SQL} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sampled
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    flag = C.stratified_sample_flag(
        F.col("lang"), F.col("doc_id"), _RATES, _DEFAULT_RATE
    )
    return (
        docs.withColumn("_in", flag)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("_in"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_sampled"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# corpus_pack_sequences — greedy per-language training-sequence packing
# (budget 1024 whitespace tokens). The accumulator resets at breaks it
# decides itself (not a plain window — W5's pattern), so Spark runs the
# mapInPandas walk and the oracle re-walks the same order with a
# RECURSIVE CTE carrying (seq, cum) — bit-exact packing parity.
# --------------------------------------------------------------------------
_PACK_BUDGET = 1024


@query(
    "corpus_pack_sequences",
    oracle=f"""
    WITH numbered AS MATERIALIZED (
      SELECT lang, doc_id, len({_TOKS_SQL}) AS n,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    ),
    walk AS (
      WITH RECURSIVE w AS (
        SELECT lang, rn, n, 1 AS seq, n AS cum
        FROM numbered WHERE rn = 1
        UNION ALL
        SELECT b.lang, b.rn, b.n,
               CASE WHEN w.cum + b.n > {_PACK_BUDGET}
                    THEN w.seq + 1 ELSE w.seq END,
               CASE WHEN w.cum + b.n > {_PACK_BUDGET}
                    THEN b.n ELSE w.cum + b.n END
        FROM w JOIN numbered b ON b.lang = w.lang AND b.rn = w.rn + 1
      )
      SELECT * FROM w
    )
    SELECT lang,
           CAST(seq AS INT) AS seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens
    FROM walk
    GROUP BY lang, seq
    ORDER BY lang, seq
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.pack_sequences(docs, budget=_PACK_BUDGET).orderBy(
        "lang", "seq_id"
    )


# Sharded variant — the PRODUCTION form: packing per (lang, shard)
# keeps parallelism proportional to shard count instead of language
# count (5 langs = 5 busy tasks at any cluster size without it). The
# walker key is the pair, every doc packs exactly once, and the oracle
# re-walks each (lang, shard) stream, so the scale-out form itself is
# hash-checked, not just unit-tested for total invariance.
_PACK_SHARDS = 4


@query(
    "corpus_pack_sequences_sharded",
    oracle=f"""
    WITH numbered AS MATERIALIZED (
      SELECT lang, doc_id % {_PACK_SHARDS} AS shard, doc_id,
             len({_TOKS_SQL}) AS n,
             row_number() OVER (PARTITION BY lang, doc_id % {_PACK_SHARDS}
                                ORDER BY doc_id) AS rn
      FROM documents
    ),
    walk AS (
      WITH RECURSIVE w AS (
        SELECT lang, shard, rn, n, 1 AS seq, n AS cum
        FROM numbered WHERE rn = 1
        UNION ALL
        SELECT b.lang, b.shard, b.rn, b.n,
               CASE WHEN w.cum + b.n > {_PACK_BUDGET}
                    THEN w.seq + 1 ELSE w.seq END,
               CASE WHEN w.cum + b.n > {_PACK_BUDGET}
                    THEN b.n ELSE w.cum + b.n END
        FROM w JOIN numbered b
          ON b.lang = w.lang AND b.shard = w.shard AND b.rn = w.rn + 1
      )
      SELECT * FROM w
    )
    SELECT lang, CAST(shard AS BIGINT) AS shard,
           CAST(seq AS INT) AS seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens
    FROM walk
    GROUP BY lang, shard, seq
    ORDER BY lang, shard, seq
    """,
)
def corpus_pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "shard", F.col("doc_id") % _PACK_SHARDS
    )
    return C.pack_sequences(
        docs, budget=_PACK_BUDGET, shard_col="shard"
    ).orderBy("lang", "shard", "seq_id")


# --------------------------------------------------------------------------
# corpus_lang_pruned_stats — the partition-pruning layout lever as a
# registered query: per-source stats for ONE language over the
# lang-partitioned corpus layout (operators/colocate.partitioned_documents).
# The lang predicate lands in the scan's PartitionFilters (asserted in
# tests/test_colocate.py), so non-English directories are never listed,
# let alone read — the scan-layout twin of the bucketed fact join. The
# oracle computes the identical answer from the raw table: layout must
# not change semantics.
# --------------------------------------------------------------------------
@query(
    "corpus_lang_pruned_stats",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM documents
    WHERE lang = 'en'
    GROUP BY source
    ORDER BY source
    """,
)
def corpus_lang_pruned_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.operators.colocate import (
        partitioned_documents,
    )

    path = partitioned_documents(spark, sf_dir)
    docs = spark.read.parquet(path).filter(F.col("lang") == "en")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# corpus_length_buckets — sequence-length bucketing for batch assembly:
# each doc goes to the smallest power-of-two bucket ≥ its token count
# (clamped to [32, 1024], over-long docs truncate to the cap), and the
# per-(lang, bucket) report carries the padding waste the bucket choice
# costs — the numbers a training-batch planner actually reads. Pure
# integer CASE arithmetic, one shuffle for the 2-key groupBy.
# --------------------------------------------------------------------------
_LB_SQL = """
      CASE WHEN n_tok_c <= 32 THEN 32 WHEN n_tok_c <= 64 THEN 64
           WHEN n_tok_c <= 128 THEN 128 WHEN n_tok_c <= 256 THEN 256
           WHEN n_tok_c <= 512 THEN 512 ELSE 1024 END
"""


@query(
    "corpus_length_buckets",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             least(len(list_filter(string_split(text, ' '), x -> x <> '')),
                   1024) AS n_tok_c
      FROM documents
    )
    SELECT lang, CAST({_LB_SQL} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok_c) AS BIGINT) AS total_tokens,
           CAST(sum({_LB_SQL} - n_tok_c) AS BIGINT) AS total_padding
    FROM t
    GROUP BY lang, bucket
    ORDER BY lang, bucket
    """,
)
def corpus_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.analysis import tokens

    docs = load_table(spark, sf_dir, "documents")
    n_tok_c = F.least(F.size(tokens(F.col("text"))), F.lit(1024))
    bucket = (
        F.when(F.col("n_tok_c") <= 32, 32)
        .when(F.col("n_tok_c") <= 64, 64)
        .when(F.col("n_tok_c") <= 128, 128)
        .when(F.col("n_tok_c") <= 256, 256)
        .when(F.col("n_tok_c") <= 512, 512)
        .otherwise(1024)
        .cast("bigint")
    )
    return (
        docs.select("lang", n_tok_c.alias("n_tok_c"))
        .select("lang", "n_tok_c", bucket.alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok_c").cast("bigint").alias("total_tokens"),
            F.sum(F.col("bucket") - F.col("n_tok_c"))
            .cast("bigint")
            .alias("total_padding"),
        )
        .orderBy("lang", "bucket")
    )


# --------------------------------------------------------------------------
# corpus_mixture_epochs — deterministic domain-mixture upsampling: each
# language stratum is repeated by a fixed epoch factor (the data-mixing
# step of pretraining recipes); every emitted instance gets a stable
# md5-derived shuffle key so downstream interleaving is reproducible
# run-to-run and engine-to-engine. The explode is a narrow per-row
# sequence — no shuffle until the final per-lang rollup; the min/max
# mix_key columns are the determinism checksum the hash gate pins.
# --------------------------------------------------------------------------
_EPOCHS = {"en": 1, "de": 2, "es": 2, "fr": 3, "zh": 3}
_EP_SQL = "CASE " + " ".join(
    f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(_EPOCHS.items())
) + " ELSE 1 END"


@query(
    "corpus_mixture_epochs",
    oracle=f"""
    WITH inst AS (
      SELECT lang, doc_id,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_tok,
             unnest(range(1, {_EP_SQL} + 1)) AS epoch
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_instances,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(min({h64_sql("'mix:' || CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)")}) AS BIGINT) AS min_mix_key,
           CAST(max({h64_sql("'mix:' || CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)")}) AS BIGINT) AS max_mix_key
    FROM inst
    GROUP BY lang
    ORDER BY lang
    """,
)
def corpus_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.analysis import tokens
    from data_ingestion_din_spark.functions.hashing import h64

    docs = load_table(spark, sf_dir, "documents")
    epochs = None
    for k, v in sorted(_EPOCHS.items()):
        cond = F.when(F.col("lang") == k, F.lit(v))
        epochs = cond if epochs is None else epochs.when(
            F.col("lang") == k, F.lit(v)
        )
    epochs = epochs.otherwise(F.lit(1))
    inst = docs.select(
        "lang",
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_tok"),
        F.explode(F.sequence(F.lit(1), epochs)).alias("epoch"),
    )
    mix_key = h64(
        F.concat(
            F.lit("mix:"),
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("epoch").cast("string"),
        )
    )
    return (
        inst.select("lang", "doc_id", "n_tok", mix_key.alias("mk"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_instances"),
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.min("mk").cast("bigint").alias("min_mix_key"),
            F.max("mk").cast("bigint").alias("max_mix_key"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# corpus_distinctive_terms — per-language distinctive vocabulary: a
# TF-IDF-shaped score kept integer-exact (score = tf · N_lang // df —
# no libm log, so both engines agree to the bit), top-10 per language
# by (score, term). Two aggregation levels + a window top-k: the
# "what does this stratum talk about" report every corpus audit runs.
# --------------------------------------------------------------------------
@query(
    "corpus_distinctive_terms",
    oracle="""
    WITH terms AS (
      SELECT lang, doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS term
      FROM documents
    ),
    stats AS (
      SELECT lang, term,
             CAST(count(*) AS BIGINT) AS tf,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM terms GROUP BY lang, term
    ),
    sizes AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang
    ),
    scored AS (
      SELECT s.lang, s.term, s.tf, s.df,
             (s.tf * z.n_docs) // s.df AS score,
             row_number() OVER (
               PARTITION BY s.lang
               ORDER BY (s.tf * z.n_docs) // s.df DESC, s.term
             ) AS rk
      FROM stats s JOIN sizes z ON z.lang = s.lang
    )
    SELECT lang, term, tf, df, CAST(score AS BIGINT) AS score
    FROM scored WHERE rk <= 10
    ORDER BY lang, score DESC, term
    """,
)
def corpus_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from data_ingestion_din_spark.functions.analysis import tokens

    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "lang", "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    stats = terms.groupBy("lang", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"),
        F.count_distinct("doc_id").cast("bigint").alias("df"),
    )
    sizes = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    scored = stats.join(F.broadcast(sizes), "lang").withColumn(
        "score", F.expr("(tf * n_docs) div df")
    )
    w = W.partitionBy("lang").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("lang", "term", "tf", "df", F.col("score").cast("bigint").alias("score"))
        .orderBy("lang", F.desc("score"), "term")
    )


# --------------------------------------------------------------------------
# corpus_train_val_split — deterministic hash-based 80/10/10 split with
# per-stratum accounting, the last step of every training-data pipeline:
# membership is a pure function of doc_id (reproducible across runs,
# engines and cluster sizes — never random()), and the output audits the
# split: docs + token mass per (lang, split). Join-free; one shuffle on
# the tiny (lang, split) key.
# --------------------------------------------------------------------------
_SPLIT_SEED = "split:"


@query(
    "corpus_train_val_split",
    oracle=f"""
    WITH t AS (
      SELECT lang, doc_id, len({_TOKS_SQL}) AS n,
             {h64_sql("CAST(doc_id AS VARCHAR)", _SPLIT_SEED)} % 100 AS b
      FROM documents
    ),
    s AS (
      SELECT lang,
             CASE WHEN b < 80 THEN 'train'
                  WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
             n
      FROM t
    )
    SELECT lang, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens
    FROM s
    GROUP BY lang, split
    ORDER BY lang, split
    """,
)
def corpus_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.analysis import tokens
    from data_ingestion_din_spark.functions.hashing import h64

    docs = load_table(spark, sf_dir, "documents")
    b = F.pmod(
        h64(F.col("doc_id").cast("string"), _SPLIT_SEED), F.lit(100)
    )
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return (
        docs.select(
            "lang",
            split.alias("split"),
            F.size(tokens(F.col("text"))).alias("n"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("total_tokens"),
        )
        .orderBy("lang", "split")
    )


# --------------------------------------------------------------------------
# training_shard_manifest — the shard EXPORT under the hash gate
# end-to-end (VERDICT r5 ask #7): write the corpus through
# sinks/shards.write_training_shards (hash-routed hive dirs, one
# parquet file per non-empty shard, explicit zero entries for empty
# ids), then verify the COMMITTED artifact, not the plan: the result
# joins the returned manifest with a re-read of the written files and
# reports per shard the manifest row count, file count, read-back doc
# count, token total, and an order-independent content fingerprint
# (bit_xor of the per-row 60-bit h64 — XOR is order-independent and
# CANNOT overflow at any row count; the earlier windowed-sum form was
# only safe to ~8M rows/shard before sum(bigint) overflowed, caught in
# review). The oracle computes all of it
# from the SOURCE table via the same shard_id arithmetic — parity
# proves the export wrote every row exactly once to the shard its key
# hashes to, with the manifest agreeing, i.e. the pipeline's terminal
# contract.
#
# Scale: the export is one n_shards-way hash repartition + write; the
# audit is one scan of the written files with a shard-local agg.
# --------------------------------------------------------------------------
_TSM_SHARDS = 8
_TSM_DONE: dict[tuple[str, str], tuple[str, list]] = {}


def _shard_export(spark: SparkSession, sf_dir: str) -> tuple[str, list]:
    """Run the shard export once per (app, sf_dir); returns (out_dir,
    manifest). Uses the shared staged-artifact scaffold
    (operators/colocate.fresh_app_dir) with cache revalidation."""
    from data_ingestion_din_spark.functions.analysis import tokens
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )
    from data_ingestion_din_spark.sinks.shards import write_training_shards

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _TSM_DONE:
        if _dir_ok(_TSM_DONE[key][0]):
            return _TSM_DONE[key]
        del _TSM_DONE[key]

    out = fresh_app_dir(spark, sf_dir, "spark_graft_shards")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(tokens(F.col("text"))).alias("n_tok")
    )
    manifest = write_training_shards(
        docs, "doc_id", out, n_shards=_TSM_SHARDS
    )
    _TSM_DONE[key] = (out, manifest)
    return _TSM_DONE[key]


_TSM_H = h64_sql(
    "'mfp:' || CAST(doc_id AS VARCHAR) || ':' || CAST(n_tok AS VARCHAR)"
)


@query(
    "training_shard_manifest",
    oracle=f"""
    WITH src AS (
      SELECT doc_id, len({_TOKS_SQL}) AS n_tok,
             {h64_sql("CAST(doc_id AS VARCHAR)", seed="shard:")}
               % {_TSM_SHARDS} AS shard
      FROM documents
    ),
    agg AS (
      SELECT shard,
             count(*) AS n,
             sum(n_tok) AS tt,
             bit_xor({_TSM_H}) AS fp
      FROM src GROUP BY shard
    )
    SELECT CAST(r.range AS INT) AS shard,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_rows_manifest,
           CAST(CASE WHEN a.n IS NULL THEN 0 ELSE 1 END AS INT) AS n_files,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_docs,
           CAST(coalesce(a.tt, 0) AS BIGINT) AS total_tokens,
           CAST(coalesce(a.fp, 0) AS BIGINT) AS content_fp
    FROM range({_TSM_SHARDS}) r LEFT JOIN agg a ON a.shard = r.range
    ORDER BY shard
    """,
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.hashing import h64

    out, manifest = _shard_export(spark, sf_dir)
    mdf = spark.createDataFrame(
        [(m["shard"], m["n_rows"], m["n_files"]) for m in manifest],
        "shard int, n_rows_manifest bigint, n_files int",
    )
    back = (
        spark.read.parquet(out)
        .select(
            "shard",
            "n_tok",
            h64(
                F.concat(
                    F.lit("mfp:"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("n_tok").cast("string"),
                )
            ).alias("fph"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.bit_xor("fph").cast("bigint").alias("content_fp"),
        )
    )
    return (
        mdf.join(back, "shard", "left")
        .select(
            F.col("shard").cast("int").alias("shard"),
            "n_rows_manifest",
            "n_files",
            F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce("total_tokens", F.lit(0))
            .cast("bigint")
            .alias("total_tokens"),
            F.coalesce("content_fp", F.lit(0))
            .cast("bigint")
            .alias("content_fp"),
        )
        .orderBy("shard")
    )


# --------------------------------------------------------------------------
# training_shard_incremental — shard STABILITY under an append (VERDICT
# r6 optional-depth #8): production re-exports after each curation
# batch, and the contract that makes that cheap is "only shards whose
# membership changed get rewritten; untouched shards stay byte-
# identical". The staged run proves it end to end:
#
#   1. export "yesterday's corpus" (doc_id % 97 != 0) through the
#      normal shard sink;
#   2. append the remaining ~1% (doc_id % 97 == 0): route the batch by
#      the same shard_id hash, read back ONLY the touched shards' prior
#      rows, and dynamic-partition-overwrite exactly those shard dirs
#      with prior ∪ batch — O(touched shards) writes, like the SCD2
#      maintainer's O(touched keys);
#   3. assert IN the staged function that every untouched shard's file
#      bytes are md5-identical pre/post and that exactly the touched
#      dirs were rewritten — a violated invariant fails the query (and
#      so the driver row), not just a unit test.
#
# THE PROOF: the oracle computes the post-append manifest from the FULL
# source table (same shard arithmetic as training_shard_manifest) plus
# the rewritten flag (shard contains an appended key) — hash parity
# therefore proves incremental re-export ≡ from-scratch export, with
# the rewrite set exactly the appended keys' shards.
#
# Scale: the append shuffles only the batch + the touched shards' prior
# rows (bounded by touched-shard size, not corpus size); the touched-id
# collect moves ≤ n_shards ints of control data.
# --------------------------------------------------------------------------
_TSI_DONE: dict[tuple[str, str], tuple[str, list]] = {}
_TSI_MOD = 97


def _tsi_export(spark: SparkSession, sf_dir: str) -> tuple[str, list]:
    """Initial export minus the append slice, then the incremental
    append pass; returns (out_dir, touched shard ids). Raises if an
    untouched shard's bytes changed or a touched shard was not
    rewritten."""
    import hashlib
    import os

    from data_ingestion_din_spark.functions.analysis import tokens
    from data_ingestion_din_spark.operators.colocate import (
        _dir_ok,
        fresh_app_dir,
    )
    from data_ingestion_din_spark.sinks.shards import (
        shard_id,
        write_training_shards,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _TSI_DONE:
        if _dir_ok(_TSI_DONE[key][0]):
            return _TSI_DONE[key]
        del _TSI_DONE[key]

    out = fresh_app_dir(spark, sf_dir, "spark_graft_shards_incr")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(tokens(F.col("text"))).alias("n_tok")
    )
    is_append = F.col("doc_id") % _TSI_MOD == 0
    write_training_shards(
        docs.filter(~is_append), "doc_id", out, n_shards=_TSM_SHARDS
    )

    def file_md5s() -> dict[str, str]:
        sums = {}
        for shard in range(_TSM_SHARDS):
            d = os.path.join(out, f"shard={shard}")
            if not os.path.isdir(d):
                continue
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    p = os.path.join(d, f)
                    with open(p, "rb") as fh:
                        sums[p] = hashlib.file_digest(fh, "md5").hexdigest()
        return sums

    pre = file_md5s()

    batch = docs.filter(is_append).withColumn(
        "shard", shard_id(F.col("doc_id").cast("string"), _TSM_SHARDS)
    )
    # ≤ n_shards ints of control data
    touched = sorted(
        r["shard"] for r in batch.select("shard").distinct().collect()
    )
    prior = (
        spark.read.parquet(out)
        .filter(F.col("shard").isin(touched))
        .select("doc_id", "lang", "n_tok", "shard")
        .localCheckpoint(eager=True)  # materialize BEFORE the overwrite
    )
    (
        prior.unionByName(batch.select("doc_id", "lang", "n_tok", "shard"))
        .repartition(_TSM_SHARDS, "shard")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard")
        .parquet(out)
    )

    post = file_md5s()
    touched_dirs = {f"shard={s}" + os.sep for s in touched}

    def is_touched(path: str) -> bool:
        return any(t in path for t in touched_dirs)

    for p, h in pre.items():
        if not is_touched(p) and post.get(p) != h:
            raise RuntimeError(f"untouched shard file rewritten: {p}")
    for p in pre:
        if is_touched(p) and p in post and post[p] == pre[p]:
            raise RuntimeError(f"touched shard file not rewritten: {p}")

    _TSI_DONE[key] = (out, touched)
    return _TSI_DONE[key]


@query(
    "training_shard_incremental",
    oracle=f"""
    WITH src AS (
      SELECT doc_id, len({_TOKS_SQL}) AS n_tok,
             {h64_sql("CAST(doc_id AS VARCHAR)", seed="shard:")}
               % {_TSM_SHARDS} AS shard,
             CASE WHEN doc_id % {_TSI_MOD} = 0 THEN 1 ELSE 0 END AS ap
      FROM documents
    ),
    agg AS (
      SELECT shard,
             count(*) AS n,
             sum(n_tok) AS tt,
             bit_xor({_TSM_H}) AS fp,
             max(ap) AS rw
      FROM src GROUP BY shard
    )
    SELECT CAST(r.range AS INT) AS shard,
           CAST(coalesce(a.rw, 0) AS INT) AS rewritten,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_docs,
           CAST(coalesce(a.tt, 0) AS BIGINT) AS total_tokens,
           CAST(coalesce(a.fp, 0) AS BIGINT) AS content_fp
    FROM range({_TSM_SHARDS}) r LEFT JOIN agg a ON a.shard = r.range
    ORDER BY shard
    """,
)
def training_shard_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.hashing import h64

    out, touched = _tsi_export(spark, sf_dir)
    back = (
        spark.read.parquet(out)
        .select(
            "shard",
            "n_tok",
            h64(
                F.concat(
                    F.lit("mfp:"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("n_tok").cast("string"),
                )
            ).alias("fph"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.bit_xor("fph").cast("bigint").alias("content_fp"),
        )
    )
    ids = spark.range(_TSM_SHARDS).select(F.col("id").cast("int").alias("shard"))
    return (
        ids.join(back, "shard", "left")
        .select(
            "shard",
            F.col("shard").isin(touched).cast("int").alias("rewritten"),
            F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce("total_tokens", F.lit(0))
            .cast("bigint")
            .alias("total_tokens"),
            F.coalesce("content_fp", F.lit(0))
            .cast("bigint")
            .alias("content_fp"),
        )
        .orderBy("shard")
    )


# --------------------------------------------------------------------------
# doc_quality_classifier — model-based quality scoring, the fasttext-style
# linear-classifier gate of a CCNet/GPT-3 curation pipeline (the missing
# sibling of the rule-based gates: quality_score, Gopher repetition). The
# distributed shape is the real thing — finite vocabulary with per-word
# weights, token explode, vocab join, per-doc weight sum, OOV counted and
# scored 0 — while the weights themselves are a deterministic stand-in
# (hash-derived integers in [-100, 100]; a trained model would ship its
# own table). Integer weights make the per-doc sum exact and associative,
# so both engines agree bit-for-bit (no float logit drift).
#
# Scale: the vocab is top-K BY CONSTRUCTION (K=400), so broadcasting it
# is bounded and correct at any corpus size — unlike corpus-growing state,
# which never gets a broadcast hint. One shuffle for the vocab counts,
# one for the per-doc sum.
# --------------------------------------------------------------------------
_QC_K = 400  # vocabulary size cap (count desc, word asc tiebreak)
_QC_W_SQL = f"CAST({h64_sql('w')} % 201 - 100 AS BIGINT)"


@query(
    "doc_quality_classifier",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS w FROM documents
    ),
    vocab AS (
      SELECT w, {_QC_W_SQL} AS wt
      FROM (
        SELECT w, count(*) AS c FROM tok GROUP BY w
        ORDER BY c DESC, w LIMIT {_QC_K}
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
    """,
)
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.analysis import tokens
    from data_ingestion_din_spark.functions.hashing import h64

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("w")
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(_QC_K)
        .select("w", (h64(F.col("w")) % 201 - 100).cast("bigint").alias("wt"))
    )
    # bounded-by-construction dimension: broadcast is correct here
    scored = tok.join(F.broadcast(vocab), "w", "left")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.sum(F.when(F.col("wt").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("oov_tok"),
            F.coalesce(F.sum("wt"), F.lit(0)).cast("bigint").alias("logit_sum"),
            F.when(F.coalesce(F.sum("wt"), F.lit(0)) >= 0, 1)
            .otherwise(0)
            .cast("int")
            .alias("passed"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# url_canonicalize — URL normalization + URL-level dup detection, the
# step CCNet/RefinedWeb run before any content pass (group the crawl by
# canonical URL; fetch variants of one page collapse). The raw corpus
# has no URL column, so a deterministic messy URL is GENERATED per
# doc_id residue IDENTICALLY in both engines (the pii_redaction
# pattern): https-with-default-port + WWW + utm params + fragment,
# http-with-:80, trailing-slash/case variants, and a www twin — the
# last two built from doc_id % 50 so distinct raw URLs genuinely
# collide after canonicalization. The full chain (functions/urls.py)
# is hash-compared per doc, plus the per-canonical dup-group size.
# --------------------------------------------------------------------------
_RAW_URL_SQL = """CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN 'HTTPS://WWW.Example' || CAST(doc_id % 3 AS VARCHAR)
                  || '.COM:443/Docs/' || CAST(doc_id AS VARCHAR)
                  || '/?utm_source=feed&ref=' || CAST(doc_id AS VARCHAR)
                  || '&utm_campaign=x#sec2'
      WHEN 1 THEN 'http://example' || CAST(doc_id % 3 AS VARCHAR)
                  || '.com:80/docs/' || CAST(doc_id AS VARCHAR)
                  || '?ref=' || CAST(doc_id AS VARCHAR)
      WHEN 2 THEN 'https://Example.com/shared/'
                  || CAST(doc_id % 50 AS VARCHAR) || '/'
      ELSE 'https://www.example.com/shared/'
                  || CAST(doc_id % 50 AS VARCHAR) || '#top'
      END"""


def _raw_url_spark() -> F.Column:
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    return (
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit("HTTPS://WWW.Example"), s(d % 3),
                F.lit(".COM:443/Docs/"), s(d),
                F.lit("/?utm_source=feed&ref="), s(d),
                F.lit("&utm_campaign=x#sec2"),
            ),
        )
        .when(
            d % 4 == 1,
            F.concat(
                F.lit("http://example"), s(d % 3),
                F.lit(".com:80/docs/"), s(d),
                F.lit("?ref="), s(d),
            ),
        )
        .when(
            d % 4 == 2,
            F.concat(
                F.lit("https://Example.com/shared/"), s(d % 50), F.lit("/")
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://www.example.com/shared/"), s(d % 50),
                F.lit("#top"),
            )
        )
    )


def _ucq_oracle() -> str:
    from data_ingestion_din_spark.functions.urls import canonical_url_sql

    canon = canonical_url_sql(_RAW_URL_SQL)
    return f"""
    WITH u AS (SELECT doc_id, {canon} AS canon FROM documents)
    SELECT doc_id, canon,
           CAST(count(*) OVER (PARTITION BY canon) AS BIGINT) AS n_same,
           (count(*) OVER (PARTITION BY canon)) > 1 AS dup_url
    FROM u
    ORDER BY doc_id
    """


@query("url_canonicalize", oracle=_ucq_oracle())
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from data_ingestion_din_spark.functions.urls import canonical_url

    docs = load_table(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id", canonical_url(_raw_url_spark()).alias("canon")
    )
    n_same = F.count(F.lit(1)).over(W.partitionBy("canon")).cast("bigint")
    return (
        u.select(
            "doc_id",
            "canon",
            n_same.alias("n_same"),
            (n_same > 1).alias("dup_url"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# corpus_snapshot_diff — dataset-version diff, the op a pipeline runs
# between corpus releases (what did this ingest change?): two snapshots
# are DERIVED deterministically from the fixture (v1 = docs except the
# %17 slice, plus a %13 slice whose text carries a v1 suffix; v2 = docs
# except the %11 slice), full-outer-joined on doc_id with content
# fingerprints compared — every doc is exactly added / removed /
# changed / unchanged, and the per-language counts are hash-gated.
# Fingerprint compare (not text compare) is the point: at 100 TB the
# diff joins two md5 columns, never two text columns.
# --------------------------------------------------------------------------
@query(
    "corpus_snapshot_diff",
    oracle="""
    WITH v1 AS (
      SELECT doc_id, lang,
             md5(text || CASE WHEN doc_id % 13 = 0 THEN ' (rev a)'
                              ELSE '' END) AS fp
      FROM documents WHERE doc_id % 17 <> 0
    ),
    v2 AS (
      SELECT doc_id, lang, md5(text) AS fp
      FROM documents WHERE doc_id % 11 <> 0
    ),
    d AS (
      SELECT coalesce(v2.doc_id, v1.doc_id) AS doc_id,
             coalesce(v2.lang, v1.lang) AS lang,
             CASE
               WHEN v1.doc_id IS NULL THEN 'added'
               WHEN v2.doc_id IS NULL THEN 'removed'
               WHEN v1.fp <> v2.fp THEN 'changed'
               ELSE 'unchanged'
             END AS status
      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    )
    SELECT lang, status, CAST(count(*) AS BIGINT) AS n_docs
    FROM d
    GROUP BY lang, status
    ORDER BY lang, status
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 17 != 0).select(
        "doc_id",
        "lang",
        F.md5(
            F.concat(
                F.col("text"),
                F.when(F.col("doc_id") % 13 == 0, " (rev a)").otherwise(""),
            )
        ).alias("fp"),
    )
    v2 = docs.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id", "lang", F.md5(F.col("text")).alias("fp")
    )
    a = v1.select(
        F.col("doc_id").alias("id1"),
        F.col("lang").alias("lang1"),
        F.col("fp").alias("fp1"),
    )
    b = v2.select(
        F.col("doc_id").alias("id2"),
        F.col("lang").alias("lang2"),
        F.col("fp").alias("fp2"),
    )
    d = a.join(b, a.id1 == b.id2, "full_outer").select(
        F.coalesce("lang2", "lang1").alias("lang"),
        F.when(F.col("id1").isNull(), "added")
        .when(F.col("id2").isNull(), "removed")
        .when(F.col("fp1") != F.col("fp2"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return (
        d.groupBy("lang", "status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("lang", "status")
    )


# --------------------------------------------------------------------------
# corpus_dsir_select — data selection via importance resampling (DSIR,
# Xie et al. 2023): score every raw-pool document by how much its hashed
# n-gram feature distribution looks like a TARGET domain rather than the
# raw pool itself, then keep the top-k. Features are hashed unigrams +
# bigrams (portable h64 % B buckets, B = 512); the per-bucket
# log-likelihood ratio is quantized to INTEGER log2 via length(bin(x))
# — the same exact-arithmetic recipe as retrieval_bm25's integer idf —
# so the weight is pure BIGINT math and bit-identical in the oracle
# (libm log() is the one primitive the parity gate cannot trust).
#
#   weight(d) = sum_b n_db * (intlog2(t_b + 1) - intlog2(r_b + 1))
#             + N_d * (intlog2(R + B) - intlog2(T + B))
#
# with intlog2(x) = floor(log2 x) + 1 = length(bin(x)), t_b/r_b the
# target/raw bucket totals and T/R their sums — the Laplace-smoothed
# bigram-LM ratio of the DSIR paper, octave-quantized. 100 TB story:
# one explode shuffle to (doc, bucket) counts, staged once
# (localCheckpoint) to feed both the B-row distribution tables and the
# per-doc weights; the ratio table is <= B rows and broadcast; top-k is
# TakeOrdered, never a full sort. Reference has no selection stage at
# all — this is the north-star curation family (SURVEY.md §6).
# --------------------------------------------------------------------------
_DSIR_B = 512
_DSIR_TARGET = ("src0", "src1")
_DSIR_TOPK = 50
_DSIR_TGT_SQL = "('src0', 'src1')"


@query(
    "corpus_dsir_select",
    oracle=f"""
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
      FROM db GROUP BY bkt
    ),
    tot AS (
      SELECT CAST(sum(t_n) AS BIGINT) AS t_tot,
             CAST(sum(r_n) AS BIGINT) AS r_tot
      FROM ball
    ),
    q AS (
      SELECT bkt,
             CAST(length(bin(t_n + 1)) AS BIGINT)
               - CAST(length(bin(r_n + 1)) AS BIGINT) AS qlr
      FROM ball WHERE r_n >= 1
    ),
    w AS (
      SELECT db.doc_id, db.source,
             CAST(sum(db.n) AS BIGINT) AS n_grams,
             CAST(sum(db.n * q.qlr) AS BIGINT) AS feat_w
      FROM db JOIN q USING (bkt)
      WHERE db.source NOT IN {_DSIR_TGT_SQL}
      GROUP BY db.doc_id, db.source
    ),
    sw AS (
      SELECT w.doc_id, w.source, w.n_grams,
             w.feat_w + w.n_grams *
               (CAST(length(bin(tot.r_tot + {_DSIR_B})) AS BIGINT)
                - CAST(length(bin(tot.t_tot + {_DSIR_B})) AS BIGINT))
               AS weight
      FROM w, tot
    )
    SELECT doc_id, source, n_grams, CAST(weight AS BIGINT) AS weight,
           CAST(row_number() OVER (ORDER BY weight DESC, doc_id) AS INT)
             AS rk
    FROM sw
    ORDER BY weight DESC, doc_id
    LIMIT {_DSIR_TOPK}
    """,
)
def corpus_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.analysis import tokens
    from data_ingestion_din_spark.functions.hashing import h64

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", tokens(F.col("text")).alias("toks")
    ).filter(F.size("toks") >= 1)
    # unigrams ++ bigrams in ONE generator expression so the explode
    # scans the corpus once; slice(toks, 1, 0) is the typed empty array
    # for single-token docs.
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
        .localCheckpoint(eager=True)  # feeds ball + per-doc weights
    )
    is_tgt = F.col("source").isin(*_DSIR_TARGET)
    ball = db.groupBy("bkt").agg(
        F.sum(F.when(is_tgt, F.col("n")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("t_n"),
        F.sum(F.when(~is_tgt, F.col("n")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("r_n"),
    )
    intlog2 = lambda c: F.length(F.bin(c)).cast("bigint")  # noqa: E731
    q = ball.filter(F.col("r_n") >= 1).select(
        "bkt",
        (intlog2(F.col("t_n") + 1) - intlog2(F.col("r_n") + 1)).alias(
            "qlr"
        ),
    )
    tot = ball.agg(
        F.sum("t_n").cast("bigint").alias("t_tot"),
        F.sum("r_n").cast("bigint").alias("r_tot"),
    )
    w = (
        db.filter(~is_tgt)
        .join(F.broadcast(q), "bkt")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("n").cast("bigint").alias("n_grams"),
            F.sum(F.col("n") * F.col("qlr")).cast("bigint").alias("feat_w"),
        )
    )
    sw = w.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "source",
        "n_grams",
        (
            F.col("feat_w")
            + F.col("n_grams")
            * (
                intlog2(F.col("r_tot") + _DSIR_B)
                - intlog2(F.col("t_tot") + _DSIR_B)
            )
        )
        .cast("bigint")
        .alias("weight"),
    )
    from data_ingestion_din_spark.operators.ranking import rank_topk

    # TakeOrdered top-k FIRST, then rank the <= k survivors — the global
    # row_number window only ever sees k rows (structural via rank_topk).
    return rank_topk(sw, _DSIR_TOPK, F.desc("weight"), "doc_id").orderBy(
        F.desc("weight"), "doc_id"
    )


# --------------------------------------------------------------------------
# corpus_temperature_mixture — TEMPERATURE-based language re-balancing,
# the standard multilingual pretraining mix (sample language l at a
# rate ∝ p_l^(1/T); T=2 → the √-share recipe of multilingual BERT /
# XLM): languages are DOWN-sampled toward equal-ish shares with the
# rarest language kept whole — rate_l = sqrt(n_min / n_l), so
# selected_l ≈ sqrt(n_min · n_l) ∝ sqrt(n_l). Every decision is
# hash-gatable: the per-lang rate is quantized to an INTEGER
# micro-threshold (floor(1e6·sqrt(n_min/n_l)) — one correctly-rounded
# sqrt and one double multiply, deterministic across engines), and a
# doc is kept iff abs(h64('tmix:'||doc_id)) % 1e6 clears its
# language's threshold — the same salted-hash Bernoulli used by the
# stratified sampler, reproducible run-to-run and engine-to-engine.
#
# Scale: one lang-count shuffle; the per-lang rate table is bounded by
# the language count (the legal broadcast class — plan-hinted); the
# per-doc keep test is a scan-local predicate, no shuffle.
# --------------------------------------------------------------------------
@query(
    "corpus_temperature_mixture",
    oracle=f"""
    WITH c AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang
    ),
    mn AS (SELECT min(n_docs) AS n_min FROM c),
    r AS (
      SELECT lang, n_docs,
             CAST(floor(1000000.0 *
                        sqrt(CAST(n_min AS DOUBLE) / n_docs)) AS BIGINT)
               AS threshold_micros
      FROM c CROSS JOIN mn
    ),
    s AS (
      SELECT d.lang, CAST(count(*) AS BIGINT) AS n_sel
      FROM documents d JOIN r ON d.lang = r.lang
      WHERE abs({h64_sql("'tmix:' || CAST(doc_id AS VARCHAR)")}) % 1000000
              < r.threshold_micros
      GROUP BY d.lang
    )
    SELECT r.lang, r.n_docs, r.threshold_micros,
           CAST(coalesce(s.n_sel, 0) AS BIGINT) AS n_selected
    FROM r LEFT JOIN s ON r.lang = s.lang
    ORDER BY r.lang
    """,
)
def corpus_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.hashing import h64

    docs = load_table(spark, sf_dir, "documents").select("lang", "doc_id")
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    rates = (
        counts.crossJoin(F.broadcast(n_min))
        .select(
            "lang",
            "n_docs",
            F.floor(
                F.lit(1000000.0)
                * F.sqrt(F.col("n_min").cast("double") / F.col("n_docs"))
            )
            .cast("bigint")
            .alias("threshold_micros"),
        )
    )
    kept = (
        docs.join(F.broadcast(rates.select("lang", "threshold_micros")), "lang")
        .filter(
            F.abs(
                h64(F.concat(F.lit("tmix:"), F.col("doc_id").cast("string")))
            )
            % 1000000
            < F.col("threshold_micros")
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sel"))
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            "n_docs",
            "threshold_micros",
            F.coalesce("n_sel", F.lit(0)).cast("bigint").alias("n_selected"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# corpus_eval_attribution — the INVERSE view of corpus_decontaminate:
# per eval-set document, how much of the training corpus leaks into it
# (distinct contaminating corpus docs + total shared-shingle
# instances). Decontamination answers "which corpus docs do I drop";
# this answers the question an eval owner asks next — "which of MY
# benchmark items are compromised, and how badly" — the per-item
# contamination report published with eval results.
#
# Scale: the eval side is benchmark-sized (bounded control data), so
# its (doc_id, shingle) pairs broadcast — the corpus side never
# shuffles before the per-eval-doc rollup, exactly the
# decontaminate_hits discipline with attribution kept.
# --------------------------------------------------------------------------
@query(
    "corpus_eval_attribution",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    idx AS (
      SELECT doc_id, tk, unnest(range(1, len(tk) - {_DC_N - 2})) AS i
      FROM t WHERE len(tk) >= {_DC_N}
    ),
    sh AS (SELECT DISTINCT doc_id, {_DC_SHINGLE} AS shingle FROM idx),
    ev AS (SELECT doc_id AS eval_id, shingle FROM sh WHERE doc_id % 7 = 0),
    hits AS (
      SELECT e.eval_id, s.doc_id,
             CAST(count(*) AS BIGINT) AS n_shingles
      FROM ev e JOIN sh s USING (shingle)
      WHERE s.doc_id % 7 <> 0
      GROUP BY e.eval_id, s.doc_id
    )
    SELECT e.eval_id,
           CAST(coalesce(count(h.doc_id), 0) AS BIGINT) AS n_corpus_docs,
           CAST(coalesce(sum(h.n_shingles), 0) AS BIGINT)
             AS n_shared_shingles
    FROM (SELECT DISTINCT eval_id FROM ev) e
    LEFT JOIN hits h USING (eval_id)
    GROUP BY e.eval_id
    ORDER BY e.eval_id
    """,
)
def corpus_eval_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.analysis import (
        tokens,
        word_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col("text")), _DC_N))
        ).alias("shingle"),
    )
    ev = sh.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    hits = (
        sh.filter(F.col("doc_id") % 7 != 0)
        .join(F.broadcast(ev), "shingle")
        .groupBy("eval_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shingles"))
    )
    eval_ids = ev.select("eval_id").distinct()
    return (
        eval_ids.join(hits, "eval_id", "left")
        .groupBy("eval_id")
        .agg(
            F.count("doc_id").cast("bigint").alias("n_corpus_docs"),
            F.coalesce(F.sum("n_shingles"), F.lit(0))
            .cast("bigint")
            .alias("n_shared_shingles"),
        )
        .orderBy("eval_id")
    )


# --------------------------------------------------------------------------
# corpus_bloom_decontaminate — decontamination through a BLOOM FILTER,
# the structure the exact-set gate (corpus_decontaminate broadcasts
# every benchmark shingle) graduates to at 100 TB: the benchmark's 8-gram
# set is folded into a 32,256-bit filter stored as 512 int64 words
# (k = 3 seeded h64 positions per shingle; 63 usable bits per word so no
# shift ever touches the sign bit — identical two's-complement-free
# arithmetic in both engines), and the corpus probes THAT — a ≤512-row
# broadcast (4 KB) instead of the full shingle set, with zero corpus-side
# shuffle before the per-doc rollup. The query audits the sketch against
# the exact membership truth on the same slice split (doc_id % 7):
# per corpus doc, distinct shingles, Bloom hits, exact hits, and the
# false-positive overcount — the integer columns ARE the measured FPR,
# so the probabilistic structure sits fully under the hash gate
# (deterministic seeded hashes; nothing is random at parity time).
#
# Measured (sf0.01): 3,783 benchmark shingles into 32,256 bits at k=3
# → theoretical per-shingle FPR ≈ (1−e^{−0.352})³ ≈ 2.6%, realized
# 530/19,276 = 2.75% — theory confirmed. The DOC-level lesson the row
# exists to teach: the any-hit flag inflates 283 flagged docs vs 9
# truly contaminated (a 46-shingle doc has a 72% chance of ≥1 FP at
# this rate), while a hit-count threshold recovers precision measured
# as t=2→155, t=3→76, t=4→37 (all 9 true kept), t=8→8 (drops the
# 4-hit true doc): contaminated_bloom_t4 is the production gate shape
# — threshold the sketch, size m to the probe volume, or both.
#
# Scale: filter build is one benchmark-sized shuffle (positions →
# bit_or per word); probing is corpus-scan → 512-row broadcast join →
# doc_id rollup. The exact-side audit columns are fixture-only truth —
# at production the Bloom verdict is the decision and the audit runs on
# a sampled slice, exactly like the recall audits.
# --------------------------------------------------------------------------
_BF_WORDS = 512
_BF_WBITS = 63  # bits used per int64 word — bit 63 (sign) never set
_BF_M = _BF_WORDS * _BF_WBITS
_BF_K = 3


def _bf_pos_sql(expr: str, j: int) -> str:
    return f"{h64_sql(expr, seed=f'bl{j}:')} % {_BF_M}"


def _bf_probe_union_sql(src: str, cols: str) -> str:
    """UNION ALL of the k seeded positions over ``src`` (DuckDB's
    range() lateral cannot parameterize the seed string)."""
    return "\n      UNION ALL ".join(
        f"SELECT {cols}, {_bf_pos_sql('shingle', j)} AS pos FROM {src}"
        for j in range(_BF_K)
    )


@query(
    "corpus_bloom_decontaminate",
    oracle=f"""
    WITH t AS (SELECT doc_id, {{toks}} AS tk FROM documents),
    idx AS (
      SELECT doc_id, tk, unnest(range(1, len(tk) - {_DC_N - 2})) AS i
      FROM t WHERE len(tk) >= {_DC_N}
    ),
    sh AS (SELECT DISTINCT doc_id, {_DC_SHINGLE} AS shingle FROM idx),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 7 = 0),
    bpos AS (
      {_bf_probe_union_sql("ev", "shingle")}
    ),
    words AS MATERIALIZED (
      SELECT pos // {_BF_WBITS} AS word,
             bit_or(CAST(1 AS BIGINT) << (pos % {_BF_WBITS})) AS bits
      FROM bpos GROUP BY 1
    ),
    cor AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 7 <> 0),
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
    ex AS (
      SELECT c.doc_id, c.shingle,
             CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END AS exact_hit
      FROM cor c LEFT JOIN ev e ON e.shingle = c.shingle
    )
    SELECT p.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(p.bloom_hit) AS BIGINT) AS bloom_hits,
           CAST(sum(x.exact_hit) AS BIGINT) AS exact_hits,
           CAST(sum(p.bloom_hit) - sum(x.exact_hit) AS BIGINT)
             AS false_positives,
           sum(p.bloom_hit) > 0 AS contaminated_bloom,
           sum(p.bloom_hit) >= 4 AS contaminated_bloom_t4,
           sum(x.exact_hit) > 0 AS contaminated_exact
    FROM persh p
    JOIN ex x ON x.doc_id = p.doc_id AND x.shingle = p.shingle
    GROUP BY p.doc_id
    ORDER BY p.doc_id
    """.format(toks=_TOKS_SQL),
)
def corpus_bloom_decontaminate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from data_ingestion_din_spark.functions.analysis import (
        tokens,
        word_shingles,
    )
    from data_ingestion_din_spark.functions.hashing import h64
    from data_ingestion_din_spark.sources.tables import scan_parallel

    docs = load_table(spark, sf_dir, "documents")
    sh = (
        scan_parallel(docs)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    word_shingles(tokens(F.col("text")), _DC_N)
                )
            ).alias("shingle"),
        )
        .localCheckpoint(eager=False)  # feeds filter build AND probe
    )
    ev = sh.filter(F.col("doc_id") % 7 == 0).select("shingle").distinct()

    def positions(df: DataFrame, keep: list[str]) -> DataFrame:
        pos = F.explode(
            F.array(
                *[
                    (h64(F.col("shingle"), seed=f"bl{j}:") % _BF_M)
                    for j in range(_BF_K)
                ]
            )
        ).alias("pos")
        return df.select(*keep, "shingle", pos)

    words = (
        positions(ev, [])
        .select(
            (F.col("pos") / _BF_WBITS).cast("bigint").alias("word"),
            F.expr(
                f"shiftleft(cast(1 as bigint), cast(pos % {_BF_WBITS} as int))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    cor = sh.filter(F.col("doc_id") % 7 != 0)
    tested = (
        positions(cor, ["doc_id"])
        .withColumn("word", (F.col("pos") / _BF_WBITS).cast("bigint"))
        # the ≤512-row filter is bounded control data: broadcast REQUIRED
        .join(F.broadcast(words), "word", "left")
        .withColumn(
            "hit",
            F.coalesce(
                F.expr(
                    f"shiftright(bits, cast(pos % {_BF_WBITS} as int)) & 1"
                ),
                F.lit(0),
            ),
        )
    )
    persh = tested.groupBy("doc_id", "shingle").agg(
        F.when(F.sum("hit") == _BF_K, 1).otherwise(0).alias("bloom_hit")
    )
    ex = cor.join(
        F.broadcast(ev.withColumn("e", F.lit(1))), "shingle", "left"
    ).select(
        "doc_id", "shingle", F.coalesce(F.col("e"), F.lit(0)).alias("exact_hit")
    )
    return (
        persh.join(ex, ["doc_id", "shingle"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum("bloom_hit").cast("bigint").alias("bloom_hits"),
            F.sum("exact_hit").cast("bigint").alias("exact_hits"),
            (F.sum("bloom_hit") - F.sum("exact_hit"))
            .cast("bigint")
            .alias("false_positives"),
            (F.sum("bloom_hit") > 0).alias("contaminated_bloom"),
            (F.sum("bloom_hit") >= 4).alias("contaminated_bloom_t4"),
            (F.sum("exact_hit") > 0).alias("contaminated_exact"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# doc_gopher_rules — the NAMED Gopher document-statistics battery (Rae
# et al. 2021, Table A1), the rule set every LLM curation stack ports,
# next to the repetition signals above (doc_repetition_quality covers
# Gopher's dup-fraction rules; this covers the document-shape rules).
# Per doc, the five metrics in exact integer per-mille plus one flag
# per published threshold and the conjunctive keep:
#
#   word count        50 ≤ n ≤ 100,000
#   mean word length  3 ≤ len ≤ 10      (milli-chars, exact division)
#   alpha-word share  ≥ 80% of words contain an alphabetic character
#   stop-word gate    ≥ 2 distinct of Gopher's 8 (the/be/to/of/and/
#                      that/have/with)
#   symbol-to-word    (# + …) ≤ 10% of words
#
# Measured on the fixture: the 50-word minimum splits the corpus
# (277/500 pass), word length (3708–5300 milli) and alpha share (1000)
# pass everywhere, and the stop-word gate FAILS corpus-wide — the
# synthetic vocabulary contains only 'the' of the 8 (max stop_hits =
# 1), so keep ≡ false. That is the published battery working as
# designed: Gopher's stop-word rule exists precisely to drop
# non-natural word-soup text, which this fixture is — kept at the
# published thresholds rather than re-tuned to wave the fixture
# through. The symbol rule is honestly all-pass (no #/… noise); every
# metric column is computed, not constant-folded, so the hash gate
# covers the arithmetic either way.
#
# Scale: one corpus scan, all built-in string/array expressions
# (word-char mass via length(replace(text,' ','')) — codegen, not an
# interpreted HOF fold), map-side trivially.
# --------------------------------------------------------------------------
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_STOPS_SQL = "[" + ", ".join(f"'{s}'" for s in _GOPHER_STOPS) + "]"


@query(
    "doc_gopher_rules",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents),
    s AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_wchars,
             CAST(len(list_filter(toks,
                    x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
               AS n_alpha,
             CAST(len(list_filter({_GOPHER_STOPS_SQL},
                    s -> list_contains(toks, s))) AS BIGINT) AS stop_hits,
             CAST(length(text) - length(replace(text, '#', ''))
                  + (length(text) - length(replace(text, '...', ''))) // 3
                  AS BIGINT) AS n_symbols
      FROM t
    ),
    m AS (
      SELECT doc_id, n_words, stop_hits,
             CAST(n_wchars * 1000 // greatest(n_words, 1) AS BIGINT)
               AS mean_wlen_milli,
             CAST(n_alpha * 1000 // greatest(n_words, 1) AS BIGINT)
               AS alpha_permille,
             CAST(n_symbols * 1000 // greatest(n_words, 1) AS BIGINT)
               AS symbol_permille
      FROM s
    )
    SELECT doc_id, n_words, mean_wlen_milli, alpha_permille, stop_hits,
           symbol_permille,
           CAST(n_words BETWEEN 50 AND 100000 AS INT) AS f_nwords,
           CAST(mean_wlen_milli BETWEEN 3000 AND 10000 AS INT) AS f_wlen,
           CAST(alpha_permille >= 800 AS INT) AS f_alpha,
           CAST(stop_hits >= 2 AS INT) AS f_stop,
           CAST(symbol_permille <= 100 AS INT) AS f_symbol,
           (n_words BETWEEN 50 AND 100000)
             AND (mean_wlen_milli BETWEEN 3000 AND 10000)
             AND alpha_permille >= 800 AND stop_hits >= 2
             AND symbol_permille <= 100 AS keep
    FROM m
    ORDER BY doc_id
    """,
)
def doc_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.analysis import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    stops = F.array(*[F.lit(s) for s in _GOPHER_STOPS])
    s = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_words"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        .cast("bigint")
        .alias("n_wchars"),
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
        .cast("bigint")
        .alias("n_alpha"),
        F.size(F.filter(stops, lambda w: F.array_contains(toks, w)))
        .cast("bigint")
        .alias("stop_hits"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))
            + (
                F.length("text")
                - F.length(
                    F.replace(F.col("text"), F.lit("..."), F.lit(""))
                )
            )
            / F.lit(3)
        )
        .cast("bigint")
        .alias("n_symbols"),
    )
    m = s.select(
        "doc_id",
        "n_words",
        "stop_hits",
        F.expr("n_wchars * 1000 DIV greatest(n_words, 1)")
        .cast("bigint")
        .alias("mean_wlen_milli"),
        F.expr("n_alpha * 1000 DIV greatest(n_words, 1)")
        .cast("bigint")
        .alias("alpha_permille"),
        F.expr("n_symbols * 1000 DIV greatest(n_words, 1)")
        .cast("bigint")
        .alias("symbol_permille"),
    )
    f_nwords = F.col("n_words").between(50, 100000)
    f_wlen = F.col("mean_wlen_milli").between(3000, 10000)
    f_alpha = F.col("alpha_permille") >= 800
    f_stop = F.col("stop_hits") >= 2
    f_symbol = F.col("symbol_permille") <= 100
    return m.select(
        "doc_id",
        "n_words",
        "mean_wlen_milli",
        "alpha_permille",
        "stop_hits",
        "symbol_permille",
        f_nwords.cast("int").alias("f_nwords"),
        f_wlen.cast("int").alias("f_wlen"),
        f_alpha.cast("int").alias("f_alpha"),
        f_stop.cast("int").alias("f_stop"),
        f_symbol.cast("int").alias("f_symbol"),
        (f_nwords & f_wlen & f_alpha & f_stop & f_symbol).alias("keep"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# corpus_compaction_ab — the small-files COMPACTION planner with the
# ordering strategy measured, not assumed. At 100 TB the recurring
# layout chore is rewriting many small files into ~target-sized ones
# (Delta OPTIMIZE / Iceberg rewrite_data_files); the planner is bin
# packing, and its one free knob is the order items are streamed into
# bins. Two arms over the same items (documents as files, byte size =
# length(text), 8 hash groups as the distributed planning unit):
#   arrival   — doc_id order (what a naive manifest walk does)
#   sizedesc  — size-descending (next-fit-decreasing, the classical
#               one-pass approximation of first-fit-decreasing)
# One row per planned output file: (strategy, grp, bin_id, n_items,
# bin_bytes, fill_permille) — the whole plan is hash-gated, so both
# the packing walk and the A/B are pinned.
#
# Measured (sf0.01, budget 1024 B): arrival plans 181 bins at mean
# fill 804‰; sizedesc plans 179 at 813‰ — NFD saves ~1% of output
# files here, the honestly small gain the theory predicts when every
# item is ≤40% of the budget (next-fit waste is bounded by the last
# item's size under either order). The strategy knob matters when
# file sizes approach the target; the planner measures rather than
# assumes it.
#
# Scale: the planner is pack_bins — repartition on grp (the shard
# lever: groups bound parallelism, not corpus size), one mapInPandas
# walk per arm. The plan is metadata-sized (one row per OUTPUT file);
# the data move it prescribes is the expensive part, not this query.
# --------------------------------------------------------------------------
_COMPACT_BUDGET = 1024
_COMPACT_GROUPS = 8


def _compact_walk_sql(src: str) -> str:
    return f"""(WITH RECURSIVE w AS (
        SELECT grp, rn, n, 1 AS bin, n AS cum FROM {src} WHERE rn = 1
        UNION ALL
        SELECT b.grp, b.rn, b.n,
               CASE WHEN w.cum + b.n > {_COMPACT_BUDGET}
                    THEN w.bin + 1 ELSE w.bin END,
               CASE WHEN w.cum + b.n > {_COMPACT_BUDGET}
                    THEN b.n ELSE w.cum + b.n END
        FROM w JOIN {src} b ON b.grp = w.grp AND b.rn = w.rn + 1
      )
      SELECT grp, bin, count(*) AS n_items, sum(n) AS bin_bytes
      FROM w GROUP BY grp, bin)"""


@query(
    "corpus_compaction_ab",
    oracle=f"""
    WITH items AS MATERIALIZED (
      SELECT doc_id % {_COMPACT_GROUPS} AS grp, doc_id,
             CAST(length(text) AS BIGINT) AS n
      FROM documents
    ),
    na AS MATERIALIZED (
      SELECT grp, n,
             row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
      FROM items
    ),
    nd AS MATERIALIZED (
      SELECT grp, n,
             row_number() OVER (PARTITION BY grp
                                ORDER BY n DESC, doc_id) AS rn
      FROM items
    ),
    agg AS (
      SELECT 'arrival' AS strategy, * FROM {_compact_walk_sql("na")}
      UNION ALL
      SELECT 'sizedesc' AS strategy, * FROM {_compact_walk_sql("nd")}
    )
    SELECT strategy, CAST(grp AS BIGINT) AS grp, CAST(bin AS INT) AS bin_id,
           CAST(n_items AS BIGINT) AS n_items,
           CAST(bin_bytes AS BIGINT) AS bin_bytes,
           CAST(bin_bytes * 1000 // {_COMPACT_BUDGET} AS BIGINT)
             AS fill_permille
    FROM agg
    ORDER BY strategy, grp, bin_id
    """,
)
def corpus_compaction_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        (F.col("doc_id") % _COMPACT_GROUPS).cast("bigint").alias("grp"),
        "doc_id",
        F.length("text").cast("bigint").alias("n"),
    )
    arms = []
    for strategy, order in (
        ("arrival", [F.col("doc_id")]),
        ("sizedesc", [F.col("n").desc(), F.col("doc_id")]),
    ):
        arms.append(
            C.pack_bins(base, order, _COMPACT_BUDGET).select(
                F.lit(strategy).alias("strategy"),
                "grp",
                "bin_id",
                "n_items",
                F.col("total_n").alias("bin_bytes"),
                F.expr(f"total_n * 1000 DIV {_COMPACT_BUDGET}")
                .cast("bigint")
                .alias("fill_permille"),
            )
        )
    return arms[0].unionByName(arms[1]).orderBy(
        "strategy", "grp", "bin_id"
    )


# --------------------------------------------------------------------------
# layout_zonemap_audit — WHY table layout is sorted: min/max zone maps
# (parquet row-group stats / Iceberg file metrics) prune a scan only
# when the layout CLUSTERS the predicate column. Same items and bins
# as corpus_compaction_ab (docs as files, 1024-byte bins, 8 planning
# groups), two physical orders — arrival (doc_id) and length-sorted —
# and three length-range predicates (narrow/medium/wide). Per
# (ordering, predicate), one hash-gated row: bins touched (a bin is
# scanned iff [min,max] overlaps the range), rows matching vs rows
# scanned, and the scan amplification — the number a table owner
# actually sizes sort keys by.
#
# Measured (sf0.01): sorting the predicate column cuts touched bins
# 265‰ → 44‰ (narrow), 674‰ → 178‰ (medium), 845‰ → 530‰ (wide) and
# scan amplification 7952‰ → 3714‰ / 3371‰ → 1398‰ / 1342‰ → 1075‰ —
# a 2-6× pruning lever from a sort, with the residual amplification
# set by per-group bin granularity (8 groups × ~4 docs/bin means even
# a perfectly clustered range spans ≥8 bins).
#
# Scale: the audit is metadata-sized (per-bin min/max is the zone
# map); pack_assign is the same one-pass walker as the planner. At
# 100 TB this decision — sort or don't before writing — is the
# difference between touching 3% and 100% of row groups.
# --------------------------------------------------------------------------
_ZM_PREDS = [("narrow", 100, 120), ("medium", 150, 250), ("wide", 80, 400)]


def _zm_walk_assign_sql(src: str) -> str:
    return f"""(WITH RECURSIVE w AS (
        SELECT grp, rn, n, doc_id, 1 AS bin, n AS cum FROM {src}
        WHERE rn = 1
        UNION ALL
        SELECT b.grp, b.rn, b.n, b.doc_id,
               CASE WHEN w.cum + b.n > {_COMPACT_BUDGET}
                    THEN w.bin + 1 ELSE w.bin END,
               CASE WHEN w.cum + b.n > {_COMPACT_BUDGET}
                    THEN b.n ELSE w.cum + b.n END
        FROM w JOIN {src} b ON b.grp = w.grp AND b.rn = w.rn + 1
      )
      SELECT grp, bin, min(n) AS mn, max(n) AS mx, count(*) AS n_docs,
             sum(n) AS n_bytes
      FROM w GROUP BY grp, bin)"""


@query(
    "layout_zonemap_audit",
    oracle=f"""
    WITH items AS MATERIALIZED (
      SELECT doc_id % {_COMPACT_GROUPS} AS grp, doc_id,
             CAST(length(text) AS BIGINT) AS n
      FROM documents
    ),
    na AS MATERIALIZED (
      SELECT grp, doc_id, n,
             row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
      FROM items
    ),
    ns AS MATERIALIZED (
      SELECT grp, doc_id, n,
             row_number() OVER (PARTITION BY grp
                                ORDER BY n, doc_id) AS rn
      FROM items
    ),
    za AS MATERIALIZED ({_zm_walk_assign_sql("na")}),
    zs AS MATERIALIZED ({_zm_walk_assign_sql("ns")}),
    zones AS (
      SELECT 'arrival' AS ordering, * FROM za
      UNION ALL
      SELECT 'sorted' AS ordering, * FROM zs
    ),
    preds AS (
      SELECT * FROM (VALUES
        {", ".join(f"('{nm}', {lo}, {hi})" for nm, lo, hi in _ZM_PREDS)}
      ) p(pred, lo, hi)
    ),
    match AS (
      SELECT p.pred, CAST(count(*) AS BIGINT) AS rows_matching
      FROM items i JOIN preds p ON i.n BETWEEN p.lo AND p.hi
      GROUP BY p.pred
    )
    SELECT z.ordering, p.pred,
           CAST(p.lo AS BIGINT) AS lo, CAST(p.hi AS BIGINT) AS hi,
           CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(CASE WHEN z.mx >= p.lo AND z.mn <= p.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS bins_touched,
           CAST(sum(CASE WHEN z.mx >= p.lo AND z.mn <= p.hi
                         THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
             AS touched_milli,
           any_value(m.rows_matching) AS rows_matching,
           CAST(sum(CASE WHEN z.mx >= p.lo AND z.mn <= p.hi
                         THEN z.n_docs ELSE 0 END) AS BIGINT)
             AS rows_scanned,
           CAST(sum(CASE WHEN z.mx >= p.lo AND z.mn <= p.hi
                         THEN z.n_docs ELSE 0 END) * 1000
                // greatest(any_value(m.rows_matching), 1) AS BIGINT)
             AS amplification_milli
    FROM zones z
    CROSS JOIN preds p
    JOIN match m ON m.pred = p.pred
    GROUP BY z.ordering, p.pred, p.lo, p.hi
    ORDER BY ordering, lo
    """,
)
def layout_zonemap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    items = docs.select(
        (F.col("doc_id") % _COMPACT_GROUPS).cast("bigint").alias("grp"),
        F.col("doc_id").cast("bigint").alias("item_id"),
        F.length("text").cast("bigint").alias("n"),
    ).localCheckpoint(eager=False)
    # rows_matching depends only on the predicate — count once per
    # predicate, not once per (ordering, predicate)
    matching = {
        pred: items.filter(F.col("n").between(lo, hi)).count()
        for pred, lo, hi in _ZM_PREDS
    }
    grid = None
    for ordering, order in (
        ("arrival", [F.col("item_id")]),
        ("sorted", [F.col("n"), F.col("item_id")]),
    ):
        zones = (
            C.pack_assign(items, order, _COMPACT_BUDGET)
            .join(items, ["grp", "item_id"])
            .groupBy("grp", "bin_id")
            .agg(
                F.min("n").alias("mn"),
                F.max("n").alias("mx"),
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            )
        )
        for pred, lo, hi in _ZM_PREDS:
            touched = (F.col("mx") >= lo) & (F.col("mn") <= hi)
            rows_matching = matching[pred]
            row = zones.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_bins"),
                F.sum(touched.cast("int")).cast("bigint").alias(
                    "bins_touched"
                ),
                F.sum(F.when(touched, F.col("n_docs")).otherwise(0))
                .cast("bigint")
                .alias("rows_scanned"),
            ).select(
                F.lit(ordering).alias("ordering"),
                F.lit(pred).alias("pred"),
                F.lit(lo).cast("bigint").alias("lo"),
                F.lit(hi).cast("bigint").alias("hi"),
                "n_bins",
                "bins_touched",
                F.expr("bins_touched * 1000 DIV n_bins")
                .cast("bigint")
                .alias("touched_milli"),
                F.lit(rows_matching).cast("bigint").alias("rows_matching"),
                "rows_scanned",
                F.expr(
                    f"rows_scanned * 1000 DIV greatest({rows_matching}, 1)"
                )
                .cast("bigint")
                .alias("amplification_milli"),
            )
            grid = row if grid is None else grid.unionByName(row)
    return grid.orderBy("ordering", "lo")


# --------------------------------------------------------------------------
# corpus_pack_split_ab — the OTHER sequence-packing discipline, A/B'd:
# corpus_pack_sequences never splits a document (sequences underfill;
# every doc stays contiguous), while GPT-style pretraining CONCATENATES
# the token stream and cuts at exact budget boundaries (zero waste;
# documents split across sequence borders and pay attention-boundary
# cost). One hash-gated row per mode over the same global doc_id-order
# token stream and the same 1024-token budget: sequences produced,
# fill, and the number of documents split — the waste-vs-splits trade
# as one relation.
#
# Measured (sf0.01): no-split packs 28 sequences at 947‰ fill; split
# packs 27 at 982‰ with 25 documents crossing a boundary — on short
# docs (mean ~54 tokens vs the 1024 budget) no-split wastes only 5%,
# so concatenation buys one sequence in twenty-eight at the cost of
# 25 attention-boundary splits; the trade flips as documents approach
# the budget length.
#
# Scale: the no-split arm is the pack_bins walker (one grp=0 stream —
# the deliberately UNsharded audit form; the sharded production form
# is corpus_pack_sequences_sharded); the split arm is pure window
# cumsum arithmetic (a boundary crossing is a comparison of
# floor-divided cumulative sums, no walker at all).
# --------------------------------------------------------------------------
@query(
    "corpus_pack_split_ab",
    oracle=f"""
    WITH items AS MATERIALIZED (
      SELECT CAST(0 AS BIGINT) AS grp, doc_id,
             CAST(len({_TOKS_SQL}) AS BIGINT) AS n
      FROM documents
    ),
    na AS MATERIALIZED (
      SELECT grp, n,
             row_number() OVER (ORDER BY doc_id) AS rn
      FROM items
    ),
    nosplit AS (
      SELECT CAST(count(*) AS BIGINT) AS n_seqs,
             CAST(sum(bin_bytes) AS BIGINT) AS total_tokens
      FROM {_compact_walk_sql("na")}
    ),
    cum AS (
      SELECT doc_id, n,
             sum(n) OVER (ORDER BY doc_id) AS c
      FROM items
    ),
    split AS (
      SELECT CAST((sum(n) + {_COMPACT_BUDGET} - 1)
                  // {_COMPACT_BUDGET} AS BIGINT) AS n_seqs,
             CAST(sum(n) AS BIGINT) AS total_tokens,
             CAST(sum(CASE WHEN (c - n) // {_COMPACT_BUDGET}
                             <> (c - 1) // {_COMPACT_BUDGET}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
      FROM cum
    )
    SELECT 'nosplit' AS mode, n_seqs, total_tokens,
           CAST(total_tokens * 1000
                // (n_seqs * {_COMPACT_BUDGET}) AS BIGINT)
             AS fill_permille,
           CAST(0 AS BIGINT) AS n_split_docs
    FROM nosplit
    UNION ALL
    SELECT 'split', n_seqs, total_tokens,
           CAST(total_tokens * 1000
                // (n_seqs * {_COMPACT_BUDGET}) AS BIGINT),
           n_split_docs
    FROM split
    ORDER BY mode
    """,
)
def corpus_pack_split_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from data_ingestion_din_spark.functions.analysis import tokens

    docs = load_table(spark, sf_dir, "documents")
    items = docs.select(
        F.lit(0).cast("bigint").alias("grp"),
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n"),
    )
    bins = C.pack_bins(items, [F.col("doc_id")], _COMPACT_BUDGET)
    nosplit = bins.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_seqs"),
        F.sum("total_n").cast("bigint").alias("total_tokens"),
    ).select(
        F.lit("nosplit").alias("mode"),
        "n_seqs",
        "total_tokens",
        F.expr(f"total_tokens * 1000 DIV (n_seqs * {_COMPACT_BUDGET})")
        .cast("bigint")
        .alias("fill_permille"),
        F.lit(0).cast("bigint").alias("n_split_docs"),
    )
    cum = items.select(
        "doc_id", "n", F.sum("n").over(W.orderBy("doc_id")).alias("c")
    )
    split = cum.agg(
        F.expr(
            f"CAST((sum(n) + {_COMPACT_BUDGET} - 1)"
            f" DIV {_COMPACT_BUDGET} AS BIGINT)"
        ).alias("n_seqs"),
        F.sum("n").cast("bigint").alias("total_tokens"),
        F.sum(
            F.when(
                F.expr(
                    f"(c - n) DIV {_COMPACT_BUDGET}"
                    f" <> (c - 1) DIV {_COMPACT_BUDGET}"
                ),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_split_docs"),
    ).select(
        F.lit("split").alias("mode"),
        "n_seqs",
        "total_tokens",
        F.expr(f"total_tokens * 1000 DIV (n_seqs * {_COMPACT_BUDGET})")
        .cast("bigint")
        .alias("fill_permille"),
        "n_split_docs",
    )
    return nosplit.unionByName(split).orderBy("mode")


# --------------------------------------------------------------------------
# corpus_doremi_step — one DoReMi domain-reweighting step (Xie et al.
# 2023): the mixture-weight UPDATE mechanism behind the static mixture
# queries (corpus_temperature_mixture picks weights from counts;
# DoReMi picks them from measured LEARNABILITY — upweight domains where
# a small proxy model lags a reference model, i.e. where there is
# headroom to learn). Deterministic integer twin of the published
# recipe, built entirely from machinery this repo already gates:
#
#   proxy LM  = the %4-quarter bigram Stupid-Backoff
#               (doc_ngram_perplexity's trainer, verbatim);
#   ref LM    = the same form trained on the %2 half (strictly more
#               data = the "better reference" role);
#   held-out  = doc_id % 4 IN (1, 3) — in NEITHER trainer;
#   excess_i  = max(0, proxy_nll_i − ref_nll_i) per domain (lang),
#               pooled per-gram NLL in milli-octaves (integer octave
#               arithmetic — the one-quantization lesson of
#               doc_lm_smoothing_ab applies: both NLLs use the same
#               length(bin(·)) recipe so the subtraction is fair);
#   update    = w ∝ w0 · (1000 + excess)  — the linearized
#               exp(η·excess) at η = 1 (excess ≈ 0.04-0.07 octave ≈
#               0.03-0.05 nat, so exp ≈ 1 + x to < 0.3% error: the
#               linearization IS the published step size, not a
#               weakening);
#   smoothing = (7·w1 + uniform) // 8 — DoReMi's uniform-mixing floor
#               with c = 1/8, integer-exact.
#
# w0 is the token-proportional baseline (the paper's initial domain
# weights). Measured (sf0.01): excess = de 36 / en 57 / es 62 / fr 71 /
# zh 45 milli-octaves — the update moves per-mille mass toward fr/es
# (hardest-to-learn domains) and away from de/zh; on this near-uniform
# synthetic corpus the shift is single-digit per-mille, which is the
# honest statement that DoReMi only re-weights hard when domains
# genuinely differ in learnability.
#
# Scale: two LM trainings (pair-key shuffles with map-side partials),
# held-out scoring joins on long-tail (head,next) keys — hint-free,
# NOT broadcastable — and the domain rollup is 5 rows; the weight
# arithmetic is driver-free (1-row totals attach via crossJoin, AQE
# broadcasts them on its own).
# --------------------------------------------------------------------------
_DRM_HELD = (1, 3)  # doc_id % 4 residues in neither trainer


def _doremi_oracle() -> str:
    def lm(p: str, mod: int) -> str:
        return f"""
    {p}pc AS (
      SELECT head, next, CAST(count(*) AS BIGINT) AS pair_n
      FROM prs WHERE doc_id % {mod} = 0 GROUP BY head, next
    ),
    {p}hn AS (
      SELECT *, CAST(sum(pair_n) OVER (PARTITION BY head) AS BIGINT)
                  AS head_n
      FROM {p}pc
    ),
    {p}trtok AS (
      SELECT unnest(t) AS tok FROM t WHERE doc_id % {mod} = 0
    ),
    {p}uc AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS tok_n
      FROM {p}trtok GROUP BY tok
    ),
    {p}tot AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM {p}trtok),
    {p}q AS (
      SELECT p.doc_id,
             CASE WHEN h.pair_n IS NOT NULL
               THEN CAST(length(bin(h.head_n + 1)) AS BIGINT)
                    - CAST(length(bin(h.pair_n)) AS BIGINT)
               ELSE 1 + CAST(length(bin(tot.tt + 1)) AS BIGINT)
                    - CAST(length(bin(coalesce(u.tok_n, 0) + 1))
                           AS BIGINT)
             END AS q
      FROM hprs p
      LEFT JOIN {p}hn h ON h.head = p.head AND h.next = p.next
      LEFT JOIN {p}uc u ON u.tok = p.next
      CROSS JOIN {p}tot tot
    )"""

    held = ", ".join(str(r) for r in _DRM_HELD)
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    prs AS (
      SELECT doc_id, t[i] AS head, t[i + 1] AS next
      FROM t, unnest(range(1, len(t))) r(i) WHERE i < len(t)
    ),
    hprs AS (SELECT * FROM prs WHERE doc_id % 4 IN ({held})),
    {lm('p_', 4)},
    {lm('r_', 2)},
    dl AS (SELECT doc_id, lang FROM documents),
    pp AS (
      SELECT dl.lang, count(DISTINCT q.doc_id) AS n_docs,
             count(*) AS n_grams, sum(q.q) AS q_sum
      FROM p_q q JOIN dl USING (doc_id) GROUP BY dl.lang
    ),
    rp AS (
      SELECT dl.lang, sum(q.q) AS q_sum
      FROM r_q q JOIN dl USING (doc_id) GROUP BY dl.lang
    ),
    ex AS (
      SELECT pp.lang, pp.n_docs, pp.n_grams,
             pp.q_sum * 1000 // pp.n_grams AS proxy_nll,
             rp.q_sum * 1000 // pp.n_grams AS ref_nll,
             greatest(pp.q_sum * 1000 // pp.n_grams
                      - rp.q_sum * 1000 // pp.n_grams, 0) AS excess
      FROM pp JOIN rp USING (lang)
    ),
    w0 AS (
      SELECT dl.lang, sum(len(t.t)) AS n_tok
      FROM t JOIN dl USING (doc_id) GROUP BY dl.lang
    ),
    w0n AS (
      SELECT lang,
             n_tok * 1000 // (SELECT sum(n_tok) FROM w0) AS w0_milli
      FROM w0
    ),
    mw AS (
      SELECT ex.*, w0n.w0_milli,
             w0n.w0_milli * (1000 + ex.excess) AS m
      FROM ex JOIN w0n USING (lang)
    ),
    fin AS (
      SELECT *, m * 1000 // (SELECT sum(m) FROM mw) AS w1_milli
      FROM mw
    )
    SELECT lang,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(proxy_nll AS BIGINT) AS proxy_nll_milli,
           CAST(ref_nll AS BIGINT) AS ref_nll_milli,
           CAST(excess AS BIGINT) AS excess_milli,
           CAST(w0_milli AS BIGINT) AS w0_milli,
           CAST(w1_milli AS BIGINT) AS w1_milli,
           CAST((7 * w1_milli + 1000 // (SELECT count(*) FROM fin)) // 8
                AS BIGINT) AS smoothed_milli
    FROM fin ORDER BY lang
    """


@query("corpus_doremi_step", oracle=_doremi_oracle())
def corpus_doremi_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from data_ingestion_din_spark.functions.analysis import tokens

    docs = load_table(spark, sf_dir, "documents")
    intlog2 = lambda c: F.length(F.bin(c)).cast("bigint")  # noqa: E731
    t0 = docs.select("doc_id", tokens(F.col("text")).alias("t"))
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
    held = prs.filter((F.col("doc_id") % 4).isin(*_DRM_HELD))

    def lm_scored(mod: int) -> DataFrame:
        train = prs.filter(F.col("doc_id") % mod == 0)
        pc = train.groupBy("head", "next").agg(
            F.count(F.lit(1)).cast("bigint").alias("pair_n")
        )
        hn = pc.withColumn(
            "head_n",
            F.sum("pair_n").over(W.partitionBy("head")).cast("bigint"),
        )
        trtok = t0.filter(F.col("doc_id") % mod == 0).select(
            F.explode("t").alias("tok")
        )
        uc = trtok.groupBy("tok").agg(
            F.count(F.lit(1)).cast("bigint").alias("tok_n")
        )
        tot = trtok.agg(F.count(F.lit(1)).cast("bigint").alias("tt"))
        return (
            held.join(hn, ["head", "next"], "left")
            .join(uc.withColumnRenamed("tok", "next"), "next", "left")
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
            )
        )

    dl = docs.select("doc_id", "lang")
    pp = (
        lm_scored(4)
        .join(dl, "doc_id")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum("q").cast("bigint").alias("pq_sum"),
        )
    )
    rp = (
        lm_scored(2)
        .join(dl, "doc_id")
        .groupBy("lang")
        .agg(F.sum("q").cast("bigint").alias("rq_sum"))
    )
    ex = (
        pp.join(rp, "lang")
        .select(
            "lang",
            "n_docs",
            "n_grams",
            F.expr("pq_sum * 1000 DIV n_grams").alias("proxy_nll"),
            F.expr("rq_sum * 1000 DIV n_grams").alias("ref_nll"),
            F.greatest(
                F.expr(
                    "pq_sum * 1000 DIV n_grams - rq_sum * 1000 DIV n_grams"
                ),
                F.lit(0).cast("bigint"),
            ).alias("excess"),
        )
    )
    w0 = (
        t0.join(dl, "doc_id")
        .groupBy("lang")
        .agg(F.sum(F.size("t")).cast("bigint").alias("n_tok"))
    )
    w0_tot = w0.agg(F.sum("n_tok").cast("bigint").alias("tok_tot"))
    w0n = w0.crossJoin(w0_tot).select(
        "lang", F.expr("n_tok * 1000 DIV tok_tot").alias("w0_milli")
    )
    mw = ex.join(w0n, "lang").withColumn(
        "m", F.col("w0_milli") * (F.lit(1000) + F.col("excess"))
    )
    totals = mw.agg(
        F.sum("m").cast("bigint").alias("m_tot"),
        F.count(F.lit(1)).cast("bigint").alias("n_dom"),
    )
    return (
        mw.crossJoin(totals)
        .select(
            "lang",
            "n_docs",
            "n_grams",
            F.col("proxy_nll").cast("bigint").alias("proxy_nll_milli"),
            F.col("ref_nll").cast("bigint").alias("ref_nll_milli"),
            F.col("excess").cast("bigint").alias("excess_milli"),
            F.col("w0_milli").cast("bigint").alias("w0_milli"),
            F.expr("m * 1000 DIV m_tot").cast("bigint").alias("w1_milli"),
            F.expr("(7 * (m * 1000 DIV m_tot) + 1000 DIV n_dom) DIV 8")
            .cast("bigint")
            .alias("smoothed_milli"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# corpus_decontam_n_grid — the N-GRAM LENGTH knob of eval-set
# decontamination measured: corpus_decontaminate fixed n=8 by fiat,
# but the published choices disagree (GPT-3 used 13-grams, Brown et
# al.'s appendix discusses 8; The Pile audits at 13; smaller n flags
# common phrases, larger n misses paraphrased leakage). One row per
# n ∈ {4, 8, 13}: distinct eval shingles, corpus docs flagged, flag
# rate in per-mille, total shared-shingle instances, and the median
# hits among flagged docs (exact middle-rank, the house percentile
# recipe) — the "what does each n actually catch" surface that turns
# the convention into this corpus's measurement.
#
# Measured (sf0.01): the grid separates flags by HIT DEPTH, not just
# count — n=4 flags 93 docs (217‰) at MEDIAN 1 shared shingle each
# (shallow chance collisions on the small vocabulary: exactly the
# noise small n admits), while n=8 and n=13 flag 9 and 8 docs at
# median 73/68 hits (the planted verbatim transplants, which survive
# even the GPT-3-length shingle). The n=8→13 drop of one doc is the
# paraphrase-miss risk the long convention accepts; the n=8 choice is
# thereby a measurement, not lore.
#
# Scale: same broadcast-eval-shingles + zero-corpus-shuffle posture as
# corpus_decontaminate; the three n share one tokenization scan.
# --------------------------------------------------------------------------
_DCG_NS = (4, 8, 13)


def _dc_grid_oracle() -> str:
    per_n = []
    for n in _DCG_NS:
        shingle = " || ' ' || ".join(f"tk[i+{j}]" for j in range(n))
        per_n.append(
            f"""SELECT {n} AS n,
             (SELECT CAST(count(DISTINCT {shingle}) AS BIGINT)
              FROM idx{n} WHERE doc_id % 7 = 0) AS n_eval_shingles,
             CAST(count(*) AS BIGINT) AS n_docs_flagged,
             CAST(count(*) * 1000 // (SELECT count(*) FROM t
                                      WHERE doc_id % 7 <> 0) AS BIGINT)
               AS flag_milli,
             CAST(sum(n_hits) AS BIGINT) AS n_hit_instances,
             CAST(max(CASE WHEN rk = greatest(1, (cnt + 1) // 2)
                      THEN n_hits END) AS BIGINT) AS median_hits
      FROM (
        SELECT doc_id, n_hits,
               row_number() OVER (ORDER BY n_hits, doc_id) AS rk,
               count(*) OVER () AS cnt
        FROM (
          SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_hits
          FROM (SELECT DISTINCT doc_id, {shingle} AS shingle
                FROM idx{n}) s
          WHERE s.doc_id % 7 <> 0
            AND s.shingle IN (
              SELECT DISTINCT {shingle} FROM idx{n} WHERE doc_id % 7 = 0)
          GROUP BY s.doc_id
        )
      )"""
        )
    idx_ctes = ",\n    ".join(
        f"""idx{n} AS (
      SELECT doc_id, tk, unnest(range(1, len(tk) - {n - 2})) AS i
      FROM t WHERE len(tk) >= {n}
    )"""
        for n in _DCG_NS
    )
    body = "\n      UNION ALL\n      ".join(per_n)
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    {idx_ctes}
    SELECT CAST(n AS INT) AS n, n_eval_shingles, n_docs_flagged,
           flag_milli, n_hit_instances, median_hits
    FROM ({body})
    ORDER BY n
    """


@query("corpus_decontam_n_grid", oracle=_dc_grid_oracle())
def corpus_decontam_n_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from data_ingestion_din_spark.functions.analysis import (
        tokens,
        word_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokens(F.col("text")).alias("tk")
    ).localCheckpoint(eager=False)
    n_corpus_docs = toks.filter(F.col("doc_id") % 7 != 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("nc")
    )
    grid = None
    for n in _DCG_NS:
        sh = toks.filter(F.size("tk") >= n).select(
            "doc_id",
            F.explode(
                F.array_distinct(word_shingles(F.col("tk"), n))
            ).alias("shingle"),
        )
        ev = (
            sh.filter(F.col("doc_id") % 7 == 0)
            .select("shingle")
            .distinct()
        )
        n_ev = ev.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval_shingles")
        )
        hits = (
            sh.filter(F.col("doc_id") % 7 != 0)
            .join(F.broadcast(ev), "shingle")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
        )
        ranked = hits.select(
            "n_hits",
            F.row_number().over(W.orderBy("n_hits", "doc_id")).alias("rk"),
            F.count(F.lit(1)).over(W.partitionBy()).alias("cnt"),
        )
        # aggregate (not filter) so an n that flags ZERO corpus docs
        # still yields one row with NULL median_hits — a filter here
        # made med empty and the crossJoin silently dropped that n's
        # grid row while the oracle kept it (r12 ADVICE fix)
        med = ranked.agg(
            F.max(
                F.when(
                    F.col("rk")
                    == F.greatest(F.lit(1), F.expr("(cnt + 1) DIV 2")),
                    F.col("n_hits"),
                )
            )
            .cast("bigint")
            .alias("median_hits")
        )
        agg = hits.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_flagged"),
            F.sum("n_hits").cast("bigint").alias("n_hit_instances"),
        )
        row = (
            agg.crossJoin(n_ev)
            .crossJoin(n_corpus_docs)
            .crossJoin(med)
            .select(
                F.lit(n).cast("int").alias("n"),
                "n_eval_shingles",
                "n_docs_flagged",
                F.expr("n_docs_flagged * 1000 DIV nc")
                .cast("bigint")
                .alias("flag_milli"),
                "n_hit_instances",
                "median_hits",
            )
        )
        grid = row if grid is None else grid.unionByName(row)
    return grid.orderBy("n")


# --------------------------------------------------------------------------
# doc_mattr_diversity — lexical diversity as a quality signal: plain
# type-token ratio (TTR) is length-biased (longer docs repeat more, so
# TTR falls with n and cannot be compared across lengths), which is
# why the curation literature uses MATTR (Covington & McFall 2010):
# the mean TTR over a sliding W-token window, length-invariant by
# construction. Sits next to doc_repetition_quality (which counts
# duplicate n-grams) as the vocabulary-side lens: word-soup with a
# tiny vocabulary scores low MATTR even when no n-gram repeats
# verbatim.
#
# Per doc: n_tok, global ttr_milli = 1000·distinct // n, and
# mattr_milli = 1000·Σ_k |distinct(window_k)| // (W_eff · n_windows)
# with W_eff = least(25, n) so sub-window docs degrade to plain TTR
# (one whole-doc window) instead of dropping out. The flag marks the
# low-diversity tail: the fixture's mattr distribution is 541-1000
# with median 688 and p25 659, so the 600 cutoff flags the genuine
# 14-doc tail (a 700 cutoff would flag 61% of the corpus — measured
# before shipping, which is how the threshold was chosen).
#
# Scale: pure per-row higher-order functions (slice + array_distinct
# inside one transform) — NO explode, NO shuffle until the final
# orderBy; the 100 TB plan is a map-only scan.
# --------------------------------------------------------------------------
_MATTR_W = 25
_MATTR_MIN = 600


@query(
    "doc_mattr_diversity",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(tk) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
             least({_MATTR_W}, len(tk)) AS w_eff,
             list_sum(list_transform(
               generate_series(0, len(tk) - least({_MATTR_W}, len(tk))),
               k -> len(list_distinct(
                 list_slice(tk, k + 1,
                            k + least({_MATTR_W}, len(tk)))))
             )) AS dsum,
             len(tk) - least({_MATTR_W}, len(tk)) + 1 AS n_win
      FROM t WHERE len(tk) >= 1
    )
    SELECT doc_id, n_tok,
           CAST(n_distinct * 1000 // n_tok AS BIGINT) AS ttr_milli,
           CAST(n_win AS BIGINT) AS n_windows,
           CAST(dsum * 1000 // (w_eff * n_win) AS BIGINT) AS mattr_milli,
           dsum * 1000 // (w_eff * n_win) < {_MATTR_MIN} AS low_diversity
    FROM m ORDER BY doc_id
    """,
)
def doc_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.analysis import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens(F.col("text")).alias("tk")).filter(
        F.size("tk") >= 1
    )
    w_eff = F.least(F.lit(_MATTR_W), F.size("tk"))
    m = t.select(
        "doc_id",
        F.size("tk").cast("bigint").alias("n_tok"),
        F.size(F.array_distinct("tk")).cast("bigint").alias("n_distinct"),
        w_eff.alias("w_eff"),
        F.expr(
            f"aggregate(transform("
            f"sequence(0, size(tk) - least({_MATTR_W}, size(tk))),"
            f" k -> size(array_distinct(slice(tk, k + 1,"
            f" least({_MATTR_W}, size(tk)))))),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("dsum"),
        (F.size("tk") - w_eff + 1).cast("bigint").alias("n_windows"),
    )
    return m.select(
        "doc_id",
        "n_tok",
        F.expr("n_distinct * 1000 DIV n_tok")
        .cast("bigint")
        .alias("ttr_milli"),
        "n_windows",
        F.expr("dsum * 1000 DIV (w_eff * n_windows)")
        .cast("bigint")
        .alias("mattr_milli"),
        (
            F.expr("dsum * 1000 DIV (w_eff * n_windows)") < _MATTR_MIN
        ).alias("low_diversity"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# corpus_ccnet_buckets — the CCNet SHARDING step itself (Wenzek et al.
# 2020 §4.3): after the perplexity filter scores every document, CCNet
# does not drop the tail — it splits each LANGUAGE into head / middle /
# tail tertiles by LM perplexity and ships them as separate shards (so
# a downstream mixture can sample quality deliberately). This query
# materializes that artifact: per-doc bigram Stupid-Backoff ppl (the
# doc_ngram_perplexity recipe, %4 trainer, integer octaves), per-lang
# tertile assignment by exact rank ((rk−1)·3 // n_lang over the
# deterministic (ppl, doc_id) order — head = most-fluent third), and
# one row per (lang, bucket): doc count, the bucket's ppl range (the
# shard boundaries a consumer needs), its token count and token share
# of the language in per-mille.
#
# Scale: the ppl chain is the documented pair-key-shuffle shape; the
# tertile rank is one window per lang; output is 3·n_langs rows.
# --------------------------------------------------------------------------


@query(
    "corpus_ccnet_buckets",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS_SQL} AS t FROM documents),
    prs AS (
      SELECT doc_id, t[i] AS head, t[i + 1] AS next
      FROM t, unnest(range(1, len(t))) r(i) WHERE i < len(t)
    ),
    pc AS (
      SELECT head, next, CAST(count(*) AS BIGINT) AS pair_n
      FROM prs WHERE doc_id % 4 = 0 GROUP BY head, next
    ),
    hn AS (
      SELECT *, CAST(sum(pair_n) OVER (PARTITION BY head) AS BIGINT)
                  AS head_n
      FROM pc
    ),
    trtok AS (SELECT unnest(t) AS tok FROM t WHERE doc_id % 4 = 0),
    uc AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS tok_n FROM trtok
      GROUP BY tok
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM trtok),
    q AS (
      SELECT p.doc_id,
             CASE WHEN h.pair_n IS NOT NULL
               THEN CAST(length(bin(h.head_n + 1)) AS BIGINT)
                    - CAST(length(bin(h.pair_n)) AS BIGINT)
               ELSE 1 + CAST(length(bin(tot.tt + 1)) AS BIGINT)
                    - CAST(length(bin(coalesce(u.tok_n, 0) + 1))
                           AS BIGINT)
             END AS q
      FROM prs p
      LEFT JOIN hn h ON h.head = p.head AND h.next = p.next
      LEFT JOIN uc u ON u.tok = p.next
      CROSS JOIN tot
    ),
    ppl AS (
      SELECT q.doc_id, t.lang, CAST(len(t.t) AS BIGINT) AS n_tok,
             CAST(sum(q.q) * 1000 // count(*) AS BIGINT) AS ppl_milli
      FROM q JOIN t ON t.doc_id = q.doc_id
      GROUP BY q.doc_id, t.lang, len(t.t)
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY lang ORDER BY ppl_milli, doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n_lang
      FROM ppl
    ),
    bucketed AS (
      SELECT lang,
             CASE (rk - 1) * 3 // n_lang
               WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
               ELSE 'tail' END AS bucket,
             ppl_milli, n_tok
      FROM ranked
    ),
    lt AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS lang_tok
           FROM bucketed GROUP BY lang)
    SELECT b.lang, b.bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(b.ppl_milli) AS BIGINT) AS ppl_lo,
           CAST(max(b.ppl_milli) AS BIGINT) AS ppl_hi,
           CAST(sum(b.n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(b.n_tok) * 1000 // any_value(lt.lang_tok) AS BIGINT)
             AS tok_share_milli
    FROM bucketed b JOIN lt ON lt.lang = b.lang
    GROUP BY b.lang, b.bucket
    ORDER BY b.lang, b.bucket
    """,
)
def corpus_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from data_ingestion_din_spark.functions.analysis import tokens

    docs = load_table(spark, sf_dir, "documents")
    intlog2 = lambda c: F.length(F.bin(c)).cast("bigint")  # noqa: E731
    t0 = docs.select("doc_id", "lang", tokens(F.col("text")).alias("t"))
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
    train = prs.filter(F.col("doc_id") % 4 == 0)
    pc = train.groupBy("head", "next").agg(
        F.count(F.lit(1)).cast("bigint").alias("pair_n")
    )
    hn = pc.withColumn(
        "head_n",
        F.sum("pair_n").over(W.partitionBy("head")).cast("bigint"),
    )
    trtok = t0.filter(F.col("doc_id") % 4 == 0).select(
        F.explode("t").alias("tok")
    )
    uc = trtok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tok_n")
    )
    tot = trtok.agg(F.count(F.lit(1)).cast("bigint").alias("tt"))
    scored = (
        prs.join(hn, ["head", "next"], "left")
        .join(uc.withColumnRenamed("tok", "next"), "next", "left")
        .crossJoin(tot)
        .select(
            "doc_id",
            F.when(
                F.col("pair_n").isNotNull(),
                intlog2(F.col("head_n") + 1) - intlog2(F.col("pair_n")),
            )
            .otherwise(
                F.lit(1)
                + intlog2(F.col("tt") + 1)
                - intlog2(F.coalesce(F.col("tok_n"), F.lit(0)) + 1)
            )
            .alias("q"),
        )
    )
    ppl = (
        scored.groupBy("doc_id")
        .agg(
            F.expr("CAST(sum(q) * 1000 DIV count(*) AS BIGINT)")
            .alias("ppl_milli")
        )
        .join(
            t0.select(
                "doc_id", "lang", F.size("t").cast("bigint").alias("n_tok")
            ),
            "doc_id",
        )
    )
    wl = W.partitionBy("lang").orderBy("ppl_milli", "doc_id")
    ranked = ppl.withColumn("rk", F.row_number().over(wl)).withColumn(
        "n_lang", F.count(F.lit(1)).over(W.partitionBy("lang"))
    )
    bucketed = ranked.withColumn(
        "bucket",
        F.expr(
            "CASE (rk - 1) * 3 DIV n_lang WHEN 0 THEN 'head'"
            " WHEN 1 THEN 'middle' ELSE 'tail' END"
        ),
    )
    lt = bucketed.groupBy("lang").agg(
        F.sum("n_tok").cast("bigint").alias("lang_tok")
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("ppl_milli").cast("bigint").alias("ppl_lo"),
            F.max("ppl_milli").cast("bigint").alias("ppl_hi"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .join(lt, "lang")
        .withColumn(
            "tok_share_milli",
            F.expr("n_tokens * 1000 DIV lang_tok").cast("bigint"),
        )
        .drop("lang_tok")
        .orderBy("lang", "bucket")
    )

"""Document text pipeline: cleaning, token stats, language ID, quality,
chunking, word frequency — over the ``documents`` fixture table.

These are the Spark-first restatement of the reference's text path
(clean → analyze → chunk; SURVEY.md §3.1) plus the training-data text
analysis the north star requires. Everything is a column expression; the
per-doc work needs no shuffle at all (narrow), the corpus-level word
frequency is one shuffle on the token.

Oracle note: tokenization is `string_split` + empty filter on both sides;
all ratios divide integers (deterministic doubles); fingerprints are md5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_din_spark.functions.analysis import (
    STOPWORDS,
    fingerprint,
    lang_id,
    quality_score,
    tokens,
)
from data_ingestion_din_spark.functions.hashing import h64_sql
from data_ingestion_din_spark.functions.text import clean_text, clean_text_sql
from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.sources.tables import load_table

_TOKS_SQL = "list_filter(string_split(text, ' '), x -> x <> '')"
_STOP_LIST_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


# --------------------------------------------------------------------------
# doc_token_stats — token counting + fingerprinting (north-star text
# analysis; reference A6 token-set math generalized). Pure array
# expressions: no explode, no shuffle.
# --------------------------------------------------------------------------
@query(
    "doc_token_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
             / CAST(len(toks) AS BIGINT) AS avg_token_len,
           md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
    FROM t
    ORDER BY doc_id
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Narrow array expressions, no explode: A/B-measured 5× faster than an
    # explode + groupBy formulation — the token-row shuffle costs far more
    # than four interpreted array passes over the same split() (per-doc
    # stats are embarrassingly parallel; keep them shuffle-free).
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique"),
        (sum_len.cast("double") / F.size(toks)).alias("avg_token_len"),
        fingerprint(F.col("text")).alias("fp"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# doc_language_quality — language ID + quality scoring (north-star text
# analysis; generalizes the reference's noise heuristics,
# ingestion/cleaner.py:62-84). Expression structure mirrors the oracle
# exactly so double arithmetic is bit-identical.
# --------------------------------------------------------------------------
@query(
    "doc_language_quality",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents),
    s AS (
      SELECT doc_id,
             len(toks) AS n_tok,
             len(list_filter(toks, x -> list_contains({_STOP_LIST_SQL}, x)))
               AS n_stop,
             length(regexp_replace(text, '[^A-Za-z0-9฀-๿]', '', 'g'))
               AS n_word,
             length(regexp_replace(text, '[^฀-๿]', '', 'g')) AS n_thai,
             length(text) AS n_chars
      FROM t
    )
    SELECT doc_id,
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
    ORDER BY doc_id
    """,
)
def doc_language_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        lang_id(F.col("text"), toks).alias("lang_guess"),
        quality_score(F.col("text"), toks).alias("quality"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# doc_clean_roundtrip — the unified clean_text chain (F1/F3, four
# duplicated implementations in the reference — SURVEY.md §2.9) proven on
# deliberately dirtied input: tab prefix, doubled spaces, trailing newline
# runs. Output is the cleaned-text fingerprint + length.
# --------------------------------------------------------------------------
_DIRTY_SQL = (
    "chr(9) || replace(text, ' ', '  ') || chr(10)||chr(10)||chr(10)||chr(10) || 'x'"
)


@query(
    "doc_clean_roundtrip",
    oracle=f"""
    SELECT doc_id,
           md5({clean_text_sql(_DIRTY_SQL)}) AS clean_fp,
           CAST(length({clean_text_sql(_DIRTY_SQL)}) AS BIGINT) AS clean_len
    FROM documents
    ORDER BY doc_id
    """,
)
def doc_clean_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.lit("\t"),
        F.regexp_replace(F.col("text"), " ", "  "),
        F.lit("\n\n\n\n"),
        F.lit("x"),
    )
    cleaned = clean_text(dirty, thai=False)
    return docs.select(
        "doc_id",
        F.md5(cleaned).alias("clean_fp"),
        F.length(cleaned).cast("bigint").alias("clean_len"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# doc_fixed_chunks — the minimum-slice chunker (SURVEY.md §7.2; simplified
# W5): fixed 50-token chunks, content-addressed chunk ids in the
# reference's `{doc_id}::{md5[:8]}` format
# (backend/services/chunking.py:401-415). sequence → explode keeps the
# token slicing JVM-side; no Python, no shuffle.
# --------------------------------------------------------------------------
@query(
    "doc_fixed_chunks",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
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
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(doc_id AS VARCHAR) || '::' || substr(md5(content), 1, 8)
             AS chunk_id,
           CAST(length(content) AS BIGINT) AS n_chars
    FROM c
    ORDER BY doc_id, chunk_idx
    """,
)
def doc_fixed_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    # greatest(…, 1): sequence(0, -1) would be a DESCENDING [0, -1] in
    # Spark, so a zero-token doc must still yield one (empty) chunk.
    n_chunks = F.greatest(
        F.ceil(F.size(toks) / F.lit(50.0)).cast("bigint"), F.lit(1)
    )
    exploded = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    content = F.concat_ws(
        " ",
        F.slice(F.col("toks"), (F.col("chunk_idx") * 50 + 1).cast("int"), F.lit(50)),
    )
    return (
        exploded.select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit("::"),
                F.substring(F.md5(content), 1, 8),
            ).alias("chunk_id"),
            F.length(content).cast("bigint").alias("n_chars"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# --------------------------------------------------------------------------
# corpus_word_freq — corpus-level top-50 word frequency (the one text op
# that genuinely shuffles; token-keyed, map-side partial agg first).
# --------------------------------------------------------------------------
@query(
    "corpus_word_freq",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS_SQL}) AS tok FROM documents)
    SELECT tok, CAST(count(*) AS BIGINT) AS cnt
    FROM tok
    GROUP BY tok
    ORDER BY cnt DESC, tok
    LIMIT 50
    """,
)
def corpus_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "tok")
        .limit(50)
    )


# --------------------------------------------------------------------------
# corpus_curation — the flagship training-data curation pipeline, composing
# the oracle-checked pieces end to end: quality gate → language filter →
# exact-fingerprint dedup (deterministic winner) → per-language token
# budget (highest-quality docs first). This is the query a 100 TB corpus
# actually runs before pretraining: narrow per-doc scoring (no shuffle),
# one hash shuffle for dedup, one per-language window for the budget —
# three shuffles total regardless of corpus size.
# --------------------------------------------------------------------------
_CUR_BUDGET = 50_000  # tokens per language


@query(
    "corpus_curation",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents),
    s AS (
      SELECT doc_id,
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
      SELECT doc_id, fp,
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
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM gated
      ) WHERE rn = 1
    ),
    budgeted AS (
      SELECT doc_id, lang_guess, quality, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY lang_guess
               ORDER BY quality DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tokens
      FROM deduped
    )
    SELECT doc_id, lang_guess, quality, n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM budgeted
    WHERE cum_tokens <= {_CUR_BUDGET}
    ORDER BY lang_guess, cum_tokens
    """,
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fp"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        lang_id(F.col("text"), toks).alias("lang_guess"),
        quality_score(F.col("text"), toks).alias("quality"),
    )
    gated = scored.filter(
        (F.col("quality") >= 0.5) & (F.col("lang_guess") != "unk")
    )
    w_dedup = W.partitionBy("fp").orderBy("doc_id")
    deduped = (
        gated.withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .drop("rn", "fp")
    )
    w_budget = (
        W.partitionBy("lang_guess")
        .orderBy(F.desc("quality"), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        deduped.withColumn(
            "cum_tokens", F.sum("n_tokens").over(w_budget).cast("bigint")
        )
        .filter(F.col("cum_tokens") <= _CUR_BUDGET)
        .orderBy("lang_guess", "cum_tokens")
    )


# --------------------------------------------------------------------------
# doc_bpe_token_stats — BPE-ish regex tokenization next to whitespace
# tokenization (the two token-count lenses a training pipeline budgets
# with). The pattern is the GPT-2 pre-tokenizer with its lookahead
# dropped (RE2 has no lookaround; Java honors the same leftmost-first
# alternation): contractions | space?letters | space?digits |
# space?punct-runs | whitespace runs. Pure regexp_extract_all — narrow,
# codegen, no shuffle.
# --------------------------------------------------------------------------
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"
_BPE_RE_SQL = _BPE_RE.replace("'", "''")


@query(
    "doc_bpe_token_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{_BPE_RE_SQL}')) AS n_bpe,
             len({_TOKS_SQL}) AS n_ws
      FROM documents
    )
    SELECT doc_id,
           CAST(n_bpe AS BIGINT) AS n_bpe_tokens,
           CAST(n_ws AS BIGINT) AS n_ws_tokens,
           round(CASE WHEN n_ws > 0 THEN CAST(n_bpe AS DOUBLE) / n_ws
                      ELSE 0.0 END, 6) AS bpe_per_word
    FROM t
    ORDER BY doc_id
    """,
)
def doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0)))
    n_ws = F.size(tokens(F.col("text")))
    return docs.select(
        "doc_id",
        n_bpe.cast("bigint").alias("n_bpe_tokens"),
        n_ws.cast("bigint").alias("n_ws_tokens"),
        F.round(
            F.when(n_ws > 0, n_bpe.cast("double") / n_ws).otherwise(0.0), 6
        ).alias("bpe_per_word"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# doc_rare_token_ratio — OOV-rate quality signal: the share of a doc's
# DISTINCT vocabulary that is rare corpus-wide (document frequency < 3).
# High ratios flag gibberish/OCR noise/boilerplate-free junk the way an
# LM-perplexity filter would, but with integer-exact corpus statistics
# (no libm log, so the oracle hash covers it bit-for-bit — the
# engine-native stand-in for the KenLM stage of CCNet-style pipelines).
#
# Scale: one shuffle on token for the document-frequency table, one
# token-key shuffle join back (the df side is the long tail — far too
# big to broadcast, this IS the scale shape), one doc_id rollup. The
# df table would be reused across quality passes at production
# (staged-table shape, like the entity cache).
# --------------------------------------------------------------------------
_RARE_DF = 3


@query(
    "doc_rare_token_ratio",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    dt AS (
      SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM t
    ),
    df AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY tok
    ),
    j AS (SELECT d.doc_id, f.df FROM dt d JOIN df f USING (tok))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(CASE WHEN df < {_RARE_DF} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rare,
           CAST(sum(CASE WHEN df < {_RARE_DF} THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS rare_ratio
    FROM j
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def doc_rare_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok"),
    )
    dfreq = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    j = dt.join(dfreq, "tok")
    rare = F.sum(F.when(F.col("df") < _RARE_DF, 1).otherwise(0))
    return (
        j.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            rare.cast("bigint").alias("n_rare"),
        )
        .select(
            "doc_id",
            "n_distinct",
            "n_rare",
            (F.col("n_rare").cast("double") / F.col("n_distinct")).alias(
                "rare_ratio"
            ),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# corpus_bigram_lm — n-gram LM count tables, the classic massive-corpus
# job (KenLM/CCNet training stage): bigram counts grouped by head
# token, conditional probability as exact-count ratio, top-3
# continuations per head for heads seen >= 50 times. One shuffle on the
# (head, next) pair (map-side partial counts do the heavy lifting),
# head totals via a window over the already-partitioned head — no
# second scan of the corpus. NB Spark array subscripts are 0-based vs
# DuckDB's 1-based: the twins index accordingly.
# --------------------------------------------------------------------------
_LM_MIN_HEAD = 50
_LM_TOPK = 3


@query(
    "corpus_bigram_lm",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    prs AS (
      SELECT t[i] AS head, t[i + 1] AS next
      FROM t, unnest(range(1, len(t))) r(i)
      WHERE i < len(t)
    ),
    pc AS (
      SELECT head, next, CAST(count(*) AS BIGINT) AS pair_n
      FROM prs GROUP BY head, next
    ),
    hn AS (
      SELECT *, CAST(sum(pair_n) OVER (PARTITION BY head) AS BIGINT)
                  AS head_n
      FROM pc
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY head ORDER BY pair_n DESC, next
             ) AS rk
      FROM hn WHERE head_n >= {_LM_MIN_HEAD}
    )
    SELECT head, next, pair_n, head_n,
           CAST(pair_n AS DOUBLE) / head_n AS cond_p,
           CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {_LM_TOPK}
    ORDER BY head, rk
    """,
)
def corpus_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as W

    # size >= 2 guard: sequence(1, size-1) DESCENDS for shorter docs
    # ([1,0,-1] for size 0) and ANSI array indexing would throw; the
    # oracle's WHERE i < len(t) is the same guard on the DuckDB side
    t = docs.select(tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 2
    )
    prs = t.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(t[i - 1] AS head, t[i] AS next))"
            )
        ).alias("p")
    ).select("p.head", "p.next")
    pc = prs.groupBy("head", "next").agg(
        F.count(F.lit(1)).cast("bigint").alias("pair_n")
    )
    hn = pc.withColumn(
        "head_n",
        F.sum("pair_n").over(W.partitionBy("head")).cast("bigint"),
    ).filter(F.col("head_n") >= _LM_MIN_HEAD)
    ranked = hn.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("head").orderBy(F.desc("pair_n"), "next")
        ),
    ).filter(F.col("rk") <= _LM_TOPK)
    return ranked.select(
        "head",
        "next",
        "pair_n",
        "head_n",
        (F.col("pair_n").cast("double") / F.col("head_n")).alias("cond_p"),
        F.col("rk").cast("int").alias("rk"),
    ).orderBy("head", "rk")


# --------------------------------------------------------------------------
# corpus_langid_confusion — n-gram-profile language ID (Cavnar-Trenkle
# shape), evaluated as a confusion matrix against the fixture's true
# lang labels: per-language profiles = top-50 char trigrams by document
# frequency; a doc's predicted language = argmax of |doc's distinct
# trigrams ∩ profile| (ties → lang asc, no-hit docs → 'none'). All
# counts integer-exact, so the trained profiles AND the per-doc argmax
# decisions are under the hash gate.
#
# Scale: one (lang, trigram) shuffle for profile training; profiles are
# k·|langs| rows → broadcast for scoring, so the corpus is scanned once
# more with no shuffle before the per-doc argmax on doc_id.
# --------------------------------------------------------------------------
_LID_K = 50
_LID_N = 3


@query(
    "corpus_langid_confusion",
    oracle=f"""
    WITH tri AS (
      SELECT DISTINCT doc_id, lang, substr(text, i, {_LID_N}) AS tg
      FROM documents, unnest(range(1, length(text) - {_LID_N - 2})) r(i)
      WHERE length(text) >= {_LID_N}
    ),
    df AS (
      SELECT lang, tg, CAST(count(*) AS BIGINT) AS n
      FROM tri GROUP BY lang, tg
    ),
    prof AS (
      SELECT lang AS plang, tg FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY lang ORDER BY n DESC, tg
               ) AS rk
        FROM df
      ) WHERE rk <= {_LID_K}
    ),
    hits AS (
      SELECT t.doc_id, t.lang, p.plang, CAST(count(*) AS BIGINT) AS hit
      FROM tri t JOIN prof p ON p.tg = t.tg
      GROUP BY t.doc_id, t.lang, p.plang
    ),
    pred AS (
      SELECT doc_id, lang, plang AS predicted FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY doc_id ORDER BY hit DESC, plang
               ) AS rk
        FROM hits
      ) WHERE rk = 1
    ),
    all_docs AS (
      SELECT d.doc_id, d.lang, coalesce(p.predicted, 'none') AS predicted
      FROM documents d LEFT JOIN pred p ON p.doc_id = d.doc_id
    )
    SELECT lang AS actual, predicted, CAST(count(*) AS BIGINT) AS n_docs
    FROM all_docs
    GROUP BY lang, predicted
    ORDER BY actual, predicted
    """,
)
def corpus_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    # Per-doc trigram dedup happens ARRAY-side (distinct before any
    # explode) so no corpus-sized DISTINCT shuffle ever runs; the doc
    # array table is staged once and feeds both branches. Scoring never
    # explodes at all: the 5-row profile table (one sorted trigram array
    # per language) broadcasts against the doc arrays and the overlap is
    # a JVM array_intersect — |docs|·|langs| narrow rows instead of a
    # corpus-sized hits shuffle. The distinct-trigram arrays are built
    # over ONE Arrow boundary (char n-gram generation is tokenizer-class
    # work): the transform(sequence)+array_distinct HOF chain this
    # replaces was interpreted per element and measured 3x slower
    # (1.9 s vs 0.65 s for the array stage at sf0.1); only the SET of
    # trigrams matters downstream (groupBy + array_intersect), so
    # first-occurrence order parity with array_distinct is incidental
    # (dict.fromkeys preserves it anyway).
    def _tg_batches(it):
        import pandas as pd

        for pdf in it:
            out = []
            for t in pdf["text"]:
                n = len(t)
                out.append(
                    list(
                        dict.fromkeys(
                            t[i : i + _LID_N] for i in range(n - _LID_N + 1)
                        )
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "lang": pdf["lang"], "tgs": out}
            )

    doc_tgs = (
        docs.filter(F.length("text") >= _LID_N)
        .select("doc_id", "lang", "text")
        .mapInPandas(_tg_batches, "doc_id long, lang string, tgs array<string>")
        .localCheckpoint(eager=False)
    )
    tri = doc_tgs.select("doc_id", "lang", F.explode("tgs").alias("tg"))
    df = tri.groupBy("lang", "tg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    prof = (
        df.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("lang").orderBy(F.desc("n"), "tg")
            ),
        )
        .filter(F.col("rk") <= _LID_K)
        .groupBy(F.col("lang").alias("plang"))
        .agg(F.array_sort(F.collect_list("tg")).alias("ptgs"))
    )
    hits = (
        doc_tgs.crossJoin(F.broadcast(prof))
        .select(
            "doc_id",
            "plang",
            F.size(F.array_intersect("tgs", "ptgs"))
            .cast("bigint")
            .alias("hit"),
        )
        .filter(F.col("hit") >= 1)
    )
    pred = (
        hits.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy(F.desc("hit"), "plang")
            ),
        )
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("plang").alias("predicted"))
    )
    all_docs = docs.select("doc_id", "lang").join(
        pred, "doc_id", "left"
    ).select(
        "lang", F.coalesce(F.col("predicted"), F.lit("none")).alias("predicted")
    )
    return (
        all_docs.groupBy(F.col("lang").alias("actual"), "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("actual", "predicted")
    )


# --------------------------------------------------------------------------
# corpus_curation_funnel — the operational audit next to corpus_curation:
# docs and token mass surviving each stage (input → quality/lang gate →
# exact dedup → per-language budget). Every production curation run
# ships this table to its operators; a silent stage collapse (gate too
# tight, dedup eating the corpus) shows here before training does. The
# scored frame is staged once; each stage is an aggregate branch over
# it (no corpus re-scan per stage).
# --------------------------------------------------------------------------
@query(
    "corpus_curation_funnel",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents),
    s AS (
      SELECT doc_id,
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
      SELECT doc_id, fp,
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
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM gated
      ) WHERE rn = 1
    ),
    budgeted AS (
      SELECT * FROM (
        SELECT doc_id, n_tokens,
               sum(n_tokens) OVER (
                 PARTITION BY lang_guess
                 ORDER BY quality DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_tokens
        FROM deduped
      ) WHERE cum_tokens <= {_CUR_BUDGET}
    )
    SELECT * FROM (
      SELECT 0 AS stage_ord, 'input' AS stage,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens
      FROM scored
      UNION ALL
      SELECT 1, 'quality_lang_gate', CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM gated
      UNION ALL
      SELECT 2, 'exact_dedup', CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM deduped
      UNION ALL
      SELECT 3, 'token_budget', CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM budgeted
    )
    ORDER BY stage_ord
    """,
)
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fp"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        lang_id(F.col("text"), toks).alias("lang_guess"),
        quality_score(F.col("text"), toks).alias("quality"),
    ).localCheckpoint(eager=False)
    gated = scored.filter(
        (F.col("quality") >= 0.5) & (F.col("lang_guess") != "unk")
    )
    deduped = (
        gated.withColumn(
            "rn", F.row_number().over(W.partitionBy("fp").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    budgeted = (
        deduped.withColumn(
            "cum_tokens",
            F.sum("n_tokens").over(
                W.partitionBy("lang_guess")
                .orderBy(F.desc("quality"), "doc_id")
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .filter(F.col("cum_tokens") <= _CUR_BUDGET)
    )

    def stage(ord_: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(ord_).alias("stage_ord"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0))
            .cast("bigint")
            .alias("n_tokens"),
        )

    return (
        stage(0, "input", scored)
        .unionByName(stage(1, "quality_lang_gate", gated))
        .unionByName(stage(2, "exact_dedup", deduped))
        .unionByName(stage(3, "token_budget", budgeted))
        .orderBy("stage_ord")
    )


# --------------------------------------------------------------------------
# doc_bigram_lm_score — per-document LM familiarity, the perplexity-
# bucketing quality signal (CCNet's KenLM stage) restated with integer-
# exact corpus statistics: each document's bigrams are scored by their
# corpus-wide frequency, rolled up to a per-doc average and a
# common-bigram ratio. No libm log — the two ratios are single divisions
# of exact integers, so the signal sits fully under the hash gate
# (doc_rare_token_ratio is the unigram lens; this is the bigram/fluency
# lens a perplexity filter approximates).
#
# Scale: one (head, next) shuffle for the corpus pair counts (map-side
# partials carry it), one pair-key shuffle join back (the count table is
# the bigram long tail — NOT broadcastable, honestly so), one doc_id
# rollup. At production the pair-count table is staged once and reused
# across quality passes, exactly like the df table in
# doc_rare_token_ratio.
# --------------------------------------------------------------------------
_LMS_COMMON = 5  # a bigram seen >= this often corpus-wide is "common"


@query(
    "doc_bigram_lm_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    prs AS (
      SELECT doc_id, t[i] AS head, t[i + 1] AS next
      FROM t, unnest(range(1, len(t))) r(i)
      WHERE i < len(t)
    ),
    pc AS (
      SELECT head, next, CAST(count(*) AS BIGINT) AS pair_n
      FROM prs GROUP BY head, next
    )
    SELECT p.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(c.pair_n) AS BIGINT) AS freq_sum,
           CAST(sum(c.pair_n) AS DOUBLE) / count(*) AS avg_pair_freq,
           CAST(sum(CASE WHEN c.pair_n >= {_LMS_COMMON} THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS common_ratio
    FROM prs p JOIN pc c ON p.head = c.head AND p.next = c.next
    GROUP BY p.doc_id
    ORDER BY p.doc_id
    """,
)
def doc_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # size >= 2 guard: sequence() descends for shorter docs (see
    # corpus_bigram_lm); the oracle's WHERE i < len(t) matches.
    t = docs.select(
        "doc_id", tokens(F.col("text")).alias("t")
    ).filter(F.size("t") >= 2)
    prs = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(t[i - 1] AS head, t[i] AS next))"
            )
        ).alias("p"),
    ).select("doc_id", "p.head", "p.next")
    pc = prs.groupBy("head", "next").agg(
        F.count(F.lit(1)).cast("bigint").alias("pair_n")
    )
    n = F.count(F.lit(1))
    return (
        prs.join(pc, ["head", "next"])
        .groupBy("doc_id")
        .agg(
            n.cast("bigint").alias("n_bigrams"),
            F.sum("pair_n").cast("bigint").alias("freq_sum"),
            (F.sum("pair_n").cast("double") / n).alias("avg_pair_freq"),
            (
                F.sum(
                    F.when(F.col("pair_n") >= _LMS_COMMON, 1).otherwise(0)
                ).cast("double")
                / n
            ).alias("common_ratio"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# corpus_bpe_merge_step — one step of BPE tokenizer TRAINING: the
# corpus-wide frequency of every adjacent character pair inside words
# (weighted by word frequency), ranked — the statistic whose argmax is
# the merge a BPE trainer commits each round (Sennrich et al. 2016;
# doc_bpe_token_stats applies a trained tokenizer, this trains one).
# Counts are integers end to end, so the merge DECISION itself is
# hash-checked.
#
# Scale: the pair counting runs over the DISTINCT-word table (one token
# shuffle, vocabulary-sized — orders of magnitude smaller than the
# corpus), then one (pair) shuffle of integer partials; top-k is a
# TakeOrdered, not a global sort.
# --------------------------------------------------------------------------
_BPE_TOPK = 20


@query(
    "corpus_bpe_merge_step",
    oracle=f"""
    WITH w AS (SELECT unnest({_TOKS_SQL}) AS w FROM documents),
    wn AS (SELECT w, count(*) AS wn FROM w GROUP BY w),
    p AS (
      SELECT substr(w, i, 2) AS pair, wn
      FROM wn, unnest(range(1, length(w))) r(i)
      WHERE length(w) >= 2 AND i < length(w)
    ),
    pc AS (SELECT pair, CAST(sum(wn) AS BIGINT) AS n FROM p GROUP BY pair),
    ranked AS (
      SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair) AS rk
      FROM pc
    )
    SELECT pair, n, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {_BPE_TOPK}
    ORDER BY rk
    """,
)
def corpus_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokens(F.col("text"))).alias("w"))
    wn = words.groupBy("w").agg(F.count(F.lit(1)).alias("wn"))
    pairs = (
        wn.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1), "
                    "i -> substr(w, i, 2))"
                )
            ).alias("pair"),
            "wn",
        )
    )
    pc = pairs.groupBy("pair").agg(F.sum("wn").cast("bigint").alias("n"))
    # top-k via TakeOrderedAndProject (per-task heaps) BEFORE the rank
    # window, so the single-partition window sees exactly k rows at any
    # corpus size (structural via rank_topk).
    from data_ingestion_din_spark.operators.ranking import rank_topk

    ranked = rank_topk(pc, _BPE_TOPK, F.desc("n"), F.asc("pair"))
    return ranked.select("pair", "n", "rk").orderBy("rk")


# --------------------------------------------------------------------------
# corpus_phrase_mining — collocation / phrase detection with the
# word2vec phrase score (Mikolov et al. 2013, §4): for each adjacent
# token pair, score = (pair_n − δ) · N / (head_n · next_n), where δ=5
# discounts rare pairs and N is the corpus token count; high scores mark
# pairs that co-occur far more than their unigram frequencies predict
# ("New York"-style units a tokenizer should fuse). Every count is an
# exact integer; the score is one double division of exact products
# (pair_n·N ≤ 1e6·1e9 and head_n·next_n ≤ 1e18 both fit BIGINT at any
# realistic corpus), so the mined phrase list is hash-gated.
#
# Scale: one (head, next) pair shuffle with map-side partials, unigram
# counts joined back on the token key (vocabulary long tail — the same
# honest non-broadcast shape as doc_rare_token_ratio), top-30 by
# TakeOrderedAndProject before the rank window.
# --------------------------------------------------------------------------
_PH_DELTA = 5
_PH_MIN = 10  # pair support floor: below this the score is noise
_PH_TOPK = 30


@query(
    "corpus_phrase_mining",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    prs AS (
      SELECT t[i] AS head, t[i + 1] AS next
      FROM t, unnest(range(1, len(t))) r(i)
      WHERE i < len(t)
    ),
    uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT unnest({_TOKS_SQL}) AS w FROM documents
      ) GROUP BY w
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM uni),
    pc AS (
      SELECT head, next, CAST(count(*) AS BIGINT) AS pair_n
      FROM prs GROUP BY head, next
    ),
    scored AS (
      SELECT p.head, p.next, p.pair_n, h.n AS head_n, x.n AS next_n,
             CAST((p.pair_n - {_PH_DELTA}) * t.big_n AS DOUBLE)
               / CAST(h.n * x.n AS DOUBLE) AS score
      FROM pc p
      JOIN uni h ON h.w = p.head
      JOIN uni x ON x.w = p.next
      CROSS JOIN tot t
      WHERE p.pair_n >= {_PH_MIN}
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY score DESC, head, next) AS rk
      FROM scored
    )
    SELECT head, next, pair_n, head_n, next_n, score, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {_PH_TOPK}
    ORDER BY rk
    """,
)
def corpus_phrase_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 2
    )
    prs = t.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(t[i - 1] AS head, t[i] AS next))"
            )
        ).alias("p")
    ).select("p.head", "p.next")
    uni = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = uni.agg(F.sum("n").cast("bigint").alias("big_n"))
    pc = (
        prs.groupBy("head", "next")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_n"))
        .filter(F.col("pair_n") >= _PH_MIN)
    )
    scored = (
        pc.join(uni.withColumnRenamed("w", "head").withColumnRenamed("n", "head_n"), "head")
        .join(uni.withColumnRenamed("w", "next").withColumnRenamed("n", "next_n"), "next")
        .crossJoin(F.broadcast(tot))
        .select(
            "head",
            "next",
            "pair_n",
            "head_n",
            "next_n",
            (
                ((F.col("pair_n") - _PH_DELTA) * F.col("big_n")).cast(
                    "double"
                )
                / (F.col("head_n") * F.col("next_n")).cast("double")
            ).alias("score"),
        )
    )
    from data_ingestion_din_spark.operators.ranking import rank_topk

    ranked = rank_topk(scored, _PH_TOPK, F.desc("score"), "head", "next")
    return ranked.select(
        "head", "next", "pair_n", "head_n", "next_n", "score", "rk"
    ).orderBy("rk")


# --------------------------------------------------------------------------
# corpus_textrank_keywords — TextRank keyword extraction (Mihalcea &
# Tarau 2004): weighted PageRank over the token co-occurrence graph
# (edges = adjacent-token pairs with support ≥ 5, symmetrized and
# weight-merged), THREE power iterations, top-20 tokens by final rank.
# The third iterative algorithm under the hash gate (after connected
# components and k-means): ranks are 1e6-scaled integers, each
# iteration is r' = 150000 + (85 · Σ_u (r(u)·w(u,v)) // S(u)) // 100
# (d = 0.85 damping; S(u) = node u's total edge weight; `//` truncates
# identically in both engines on non-negative operands), so every
# iteration — and the final keyword ranking — is bit-exact.
#
# Scale: the graph lives at VOCABULARY size, not corpus size (one
# (head, next) shuffle builds it); each iteration is one edge⋈rank
# equi-join + one dst-key integer aggregation — the standard
# Pregel-on-DataFrames step, with only the iteration COUNT controlled
# driver-side (no data through the driver). Edges are staged once
# (localCheckpoint) and reused by all iterations.
# --------------------------------------------------------------------------
_TR_EDGE_MIN = 5  # pair support floor for an edge
_TR_ITERS = 3
_TR_TOPK = 20
_TR_SCALE = 1_000_000
_TR_BASE = 150_000  # (1 − d)·scale, d = 0.85


def _tr_iter_sql(prev: str, cur: str) -> str:
    return f"""{cur} AS (
      SELECT e.dst AS token,
             {_TR_BASE} + (85 * sum((r.r * e.w) // s.s)) // 100 AS r
      FROM edges e
      JOIN {prev} r ON r.token = e.src
      JOIN s ON s.token = e.src
      GROUP BY e.dst
    )"""


@query(
    "corpus_textrank_keywords",
    oracle=f"""
    WITH t AS (SELECT {_TOKS_SQL} AS t FROM documents),
    prs AS (
      SELECT t[i] AS head, t[i + 1] AS next
      FROM t, unnest(range(1, len(t))) r(i)
      WHERE i < len(t)
    ),
    pc AS (
      SELECT head, next, CAST(count(*) AS BIGINT) AS pair_n
      FROM prs GROUP BY head, next
      HAVING count(*) >= {_TR_EDGE_MIN}
    ),
    edges AS (
      SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM (
        SELECT head AS src, next AS dst, pair_n AS w FROM pc
        UNION ALL
        SELECT next AS src, head AS dst, pair_n AS w FROM pc
      ) GROUP BY src, dst
    ),
    s AS (
      SELECT src AS token, CAST(sum(w) AS BIGINT) AS s
      FROM edges GROUP BY src
    ),
    r0 AS (SELECT token, CAST({_TR_SCALE} AS BIGINT) AS r FROM s),
    {_tr_iter_sql('r0', 'r1')},
    {_tr_iter_sql('r1', 'r2')},
    {_tr_iter_sql('r2', 'r3')},
    ranked AS (
      SELECT token, CAST(r AS BIGINT) AS rank_scaled,
             row_number() OVER (ORDER BY r DESC, token) AS rk
      FROM r3
    )
    SELECT token, rank_scaled, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {_TR_TOPK}
    ORDER BY rk
    """,
)
def corpus_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 2
    )
    prs = t.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(t[i - 1] AS head, t[i] AS next))"
            )
        ).alias("p")
    ).select("p.head", "p.next")
    pc = (
        prs.groupBy("head", "next")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_n"))
        .filter(F.col("pair_n") >= _TR_EDGE_MIN)
    )
    edges = (
        pc.select(
            F.col("head").alias("src"),
            F.col("next").alias("dst"),
            F.col("pair_n").alias("w"),
        )
        .unionAll(
            pc.select(
                F.col("next").alias("src"),
                F.col("head").alias("dst"),
                F.col("pair_n").alias("w"),
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").cast("bigint").alias("w"))
        .localCheckpoint(eager=True)  # staged: reused by every iteration
    )
    s = edges.groupBy("src").agg(F.sum("w").cast("bigint").alias("s"))
    src_side = edges.join(s, "src")  # (src, dst, w, s)
    r = s.select("src", F.lit(_TR_SCALE).cast("bigint").alias("r")).select(
        F.col("src").alias("token"), "r"
    )
    for _ in range(_TR_ITERS):
        r = (
            src_side.join(r, src_side.src == r.token)
            .select(
                F.col("dst"),
                F.expr("(r * w) div s").alias("contrib"),
            )
            .groupBy("dst")
            .agg(
                (
                    F.lit(_TR_BASE)
                    + F.expr("(85 * sum(contrib)) div 100")
                )
                .cast("bigint")
                .alias("r")
            )
            .select(F.col("dst").alias("token"), "r")
        )
    from data_ingestion_din_spark.operators.ranking import rank_topk

    ranked = rank_topk(r, _TR_TOPK, F.desc("r"), "token")
    return ranked.select(
        F.col("token"), F.col("r").alias("rank_scaled"), "rk"
    ).orderBy("rk")


# --------------------------------------------------------------------------
# corpus_bpe_encode — BPE tokenizer ENCODING at scan speed: apply a
# fixed ranked merge table (the artifact corpus_bpe_merge_step's
# training loop commits) to every word and report the resulting subword
# vocabulary. Each merge pass is a greedy left-to-right FOLD
# (aggregate / list_reduce): append each token, collapsing the tail
# when it forms the pass's (a,b) pair. The fold shape matters for cost,
# not just style: it references the previous pass's array exactly ONCE,
# so when either optimizer collapses the 8 chained projections the
# expression grows linearly — a neighbor-indexed transform references
# its input 3×, and inlining that chain explodes 3^8-fold (measured:
# 75 s/19 s per side vs 2 s/0.3 s for the fold). Later merges consume
# earlier outputs ((t,h) then (th,e)), which is exactly how a trained
# BPE vocabulary nests.
#
# Scale: encoding runs over the DISTINCT-word table (vocabulary-sized)
# and corpus counts attach by weight — the standard trick that makes
# tokenizer application O(vocab) instead of O(corpus); the corpus-wide
# rollup is one token shuffle of integer partials.
# --------------------------------------------------------------------------
_BPE_MERGES = (
    ("t", "h"),
    ("th", "e"),
    ("a", "n"),
    ("an", "d"),
    ("i", "n"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
)
_BPE_ENC_TOPK = 30


def _bpe_pass_spark(col: str, a: str, b: str) -> str:
    return _bpe_fused_pass_spark(col, ((a, b),))


def _bpe_fused_pass_spark(col: str, rules) -> str:
    """One left-to-right fold applying several merge rules in a single
    scan. Fusing sequential BPE passes into one scan is only valid when
    the rules cannot interact: every (tail, x) combination triggers at
    most one rule (the b-chars' tails are mutually exclusive) and the
    only cross-rule effects are intended left-side cascades ((t,h) then
    (th,e) — the merged token is already in the accumulator when the
    next char arrives, so a single scan sees it exactly like the next
    sequential pass would). The one genuine conflict in _BPE_MERGES is
    (e,r) vs (r,e): sequential order gives (e,r) a lookahead win on
    "rer" ([r, er]) that a single scan cannot reproduce ([re, r]), so
    (r,e) runs as its own second scan. Equivalence of the {1..7}+{8}
    grouping vs the 8 sequential passes is verified exhaustively up to
    length 7 over the interacting alphabet plus randomized strings in
    tests/test_properties.py (property: bpe fused == sequential).

    Cost: each fold pass is interpreted per-element with an O(len)
    array rebuild, so pass count is the dominant term — 8 chained
    passes measured 12.4 s steady at sf0.1; the 2-scan fusion removes
    6 of the 8 interpreted scans (PLANS.md r6).
    """
    whens = " ".join(
        f"WHEN try_element_at(acc, -1) = '{a}' AND x = '{b}'"
        f" THEN concat(slice(acc, 1, size(acc) - 1), array('{a}{b}'))"
        for a, b in rules
    )
    return (
        f"aggregate({col}, CAST(array() AS ARRAY<STRING>), (acc, x) -> CASE"
        f" {whens}"
        f" ELSE concat(acc, array(x)) END)"
    )


def _bpe_pass_duck(col: str, a: str, b: str) -> str:
    # DuckDB 1.0 list_reduce has no initial-accumulator form, so fold
    # over the list-of-singletons; acc[:-2] = all but last (inclusive
    # slice bounds). PRECONDITION: the input list is non-empty —
    # list_reduce errors on []; holds by construction because the fold
    # runs per distinct WORD and tokenization filters empty strings
    # (property-tested in tests/test_properties.py)
    return (
        f"list_reduce(list_transform({col}, t -> [t]), (acc, x) -> CASE"
        f" WHEN acc[-1] = '{a}' AND x[1] = '{b}'"
        f" THEN list_append(acc[:-2], '{a}{b}')"
        f" ELSE list_concat(acc, x) END)"
    )


def _bpe_chain(col: str, passes) -> str:
    expr = col
    for a, b in _BPE_MERGES:
        expr = passes(expr, a, b)
    return expr


@query(
    "corpus_bpe_encode",
    oracle=f"""
    WITH w AS (SELECT unnest({_TOKS_SQL}) AS w FROM documents),
    wn AS (SELECT w, CAST(count(*) AS BIGINT) AS wn FROM w GROUP BY w),
    chars AS (
      SELECT w, wn,
             list_transform(range(1, length(w) + 1),
                            i -> substr(w, i, 1)) AS c
      FROM wn
    ),
    enc AS (
      SELECT w, wn, {_bpe_chain('c', lambda c, a, b: _bpe_pass_duck(c, a, b))} AS toks
      FROM chars
    ),
    tok AS (
      SELECT unnest(toks) AS token, wn FROM enc
    )
    SELECT token,
           CAST(length(token) AS INT) AS token_len,
           CAST(count(*) AS BIGINT) AS n_word_slots,
           CAST(sum(wn) AS BIGINT) AS total_occurrences
    FROM tok
    GROUP BY token
    ORDER BY total_occurrences DESC, token
    LIMIT {_BPE_ENC_TOPK}
    """,
)
def corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokens(F.col("text"))).alias("w"))
    wn = words.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("wn"))
    # The merge chain runs per DISTINCT word over an Arrow boundary —
    # the canonical tokenizer-on-Spark shape (a vocab-sized mapInPandas,
    # not a per-corpus-token one). The plain sequential 8-pass encoder
    # in Python replaces the 2 fused interpreted-HOF scans (r6): the
    # fusion had already cut 12.4 s -> 3.5 s, but each remaining scan
    # still paid per-element lambda interpretation with an O(len) array
    # rebuild; batch-encoding the ~vocab rows in Python is ~1 s total
    # and needs NO interaction proof — it IS the oracle's sequential
    # chain. The fused-scan construction (+ its exhaustive equivalence
    # property tests) stays as corpus_bpe_merge_step's single-rule path
    # and the documented all-JVM alternative.
    def _encode_batches(it):
        import pandas as pd

        for pdf in it:
            out = []
            for w in pdf["w"]:
                toks = list(w)
                for a, b in _BPE_MERGES:
                    acc: list = []
                    for x in toks:
                        if acc and acc[-1] == a and x == b:
                            acc[-1] = a + b
                        else:
                            acc.append(x)
                    toks = acc
                out.append(toks)
            yield pd.DataFrame(
                {"toks": out, "wn": pdf["wn"].to_numpy()}
            )

    enc = wn.mapInPandas(_encode_batches, "toks array<string>, wn long")
    tok = enc.select(F.explode("toks").alias("token"), "wn")
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_word_slots"),
            F.sum("wn").cast("bigint").alias("total_occurrences"),
        )
        .select(
            "token",
            F.length("token").cast("int").alias("token_len"),
            "n_word_slots",
            "total_occurrences",
        )
        .orderBy(F.desc("total_occurrences"), "token")
        .limit(_BPE_ENC_TOPK)
    )


# --------------------------------------------------------------------------
# ingest_quarantine — PERMISSIVE-parse ingestion with a corrupt-record
# quarantine path, the source-level error handling a production feed
# needs (bad upstream serializers must not kill the batch, and silently
# dropping them is worse): a JSON document feed is derived from the
# fixture (1/7 of rows hash-truncated mid-object), parsed with a typed
# schema — Spark's from_json PERMISSIVE mode yields an all-NULL struct
# for unparseable input, detected via the always-present id field — and
# routed into per-partition parsed/quarantined accounting. The DuckDB
# oracle detects corruption with json_valid; the two detections agree
# only because from_json does NOT salvage fields from a record whose
# top level is truncated — i.e. spark.sql.json.enablePartialResults
# must not turn "id": N inside a truncated object into a non-NULL id.
# True on Spark 4.1.2 and pinned by
# tests/test_text_functions.py::test_from_json_truncated_record_yields_null_id
# so an upgrade that changes partial-results behavior fails loudly
# instead of silently breaking parity. The quarantine keeps the partition
# metadata (lang) that travels OUTSIDE the payload, which is what makes
# a quarantine table reprocessable.
#
# Scale: parse + route is pure scan-speed column work; the accounting is
# one small-cardinality groupBy.
# --------------------------------------------------------------------------
_QJ_H = h64_sql("'qjson:' || CAST(doc_id AS VARCHAR)")


@query(
    "ingest_quarantine",
    oracle=f"""
    WITH feed AS (
      SELECT doc_id, lang,
             '{{"id": ' || CAST(doc_id AS VARCHAR) || ', "lang": "' || lang
               || '", "n": ' || CAST(n_chars AS VARCHAR) || '}}' AS s0
      FROM documents
    ),
    fed AS (
      SELECT doc_id, lang,
             CASE WHEN {_QJ_H} % 7 = 0
                  THEN substr(s0, 1, length(s0) - 1) ELSE s0 END AS s
      FROM feed
    ),
    parsed AS (
      SELECT lang,
             CASE WHEN json_valid(s) THEN 1 ELSE 0 END AS ok,
             CASE WHEN json_valid(s)
                  THEN CAST(json_extract(s, '$.n') AS BIGINT) END AS n_payload
      FROM fed
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(ok) AS BIGINT) AS n_ok,
           CAST(count(*) - sum(ok) AS BIGINT) AS n_quarantined,
           CAST(sum(n_payload) AS BIGINT) AS sum_n_parsed
    FROM parsed
    GROUP BY lang
    ORDER BY lang
    """,
)
def ingest_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.hashing import h64

    docs = load_table(spark, sf_dir, "documents")
    s0 = F.concat(
        F.lit('{"id": '),
        F.col("doc_id").cast("string"),
        F.lit(', "lang": "'),
        F.col("lang"),
        F.lit('", "n": '),
        F.col("n_chars").cast("string"),
        F.lit("}"),
    )
    h = h64(F.concat(F.lit("qjson:"), F.col("doc_id").cast("string")))
    # build s0 as a real column first so the CASE can slice it
    fed = docs.select(
        "lang", s0.alias("s0"), h.alias("h")
    ).select(
        "lang",
        F.when(
            F.col("h") % 7 == 0,
            F.expr("substr(s0, 1, length(s0) - 1)"),
        )
        .otherwise(F.col("s0"))
        .alias("s"),
    )
    p = fed.select(
        "lang",
        F.from_json("s", "id bigint, lang string, n bigint").alias("p"),
    ).select(
        "lang",
        F.when(F.col("p.id").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("ok"),
        F.when(F.col("p.id").isNotNull(), F.col("p.n")).alias("n_payload"),
    )
    return (
        p.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum("ok").cast("bigint").alias("n_ok"),
            (F.count(F.lit(1)) - F.sum("ok")).cast("bigint").alias("n_quarantined"),
            F.sum("n_payload").cast("bigint").alias("sum_n_parsed"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# corpus_bigram_generate — greedy LM DECODING as relational operators,
# the serving half of corpus_bigram_lm's training half: seed with the
# corpus's most frequent token, then repeatedly take the argmax
# continuation from the bigram count table (ties broken
# lexicographically, so the whole trajectory is deterministic and
# hash-gated). Greedy decode loops are expected and preserved — that IS
# argmax decoding; each step is evidence the conditional table, not the
# sampler, drives the output.
#
# Scale: the bigram table is built once (one pair shuffle); each decode
# step is a 1-row broadcast probe + TakeOrderedAndProject(1) — serving
# cost is O(steps), independent of corpus size, the relational
# restatement of an LM inference step over count tables.
# --------------------------------------------------------------------------
_GEN_STEPS = 6


def _gen_oracle() -> str:
    ctes = [
        "t AS (SELECT doc_id, "
        + _TOKS_SQL
        + " AS t FROM documents)",
        """prs AS (
      SELECT t[i] AS head, t[i + 1] AS next
      FROM t, unnest(range(1, len(t))) r(i)
      WHERE i < len(t)
    )""",
        """pc AS (
      SELECT head, next, CAST(count(*) AS BIGINT) AS pair_n
      FROM prs GROUP BY head, next
    )""",
        """un AS (
      SELECT unnest(t) AS tok FROM t
    )""",
        """s0 AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM un
      GROUP BY tok ORDER BY cnt DESC, tok LIMIT 1
    )""",
    ]
    for i in range(1, _GEN_STEPS + 1):
        prev_tok = "tok" if i == 1 else "next"
        ctes.append(
            f"""s{i} AS (
      SELECT pc.next, pc.pair_n AS cnt
      FROM pc, s{i - 1} p WHERE pc.head = p.{prev_tok}
      ORDER BY pc.pair_n DESC, pc.next LIMIT 1
    )"""
        )
    selects = ["SELECT 0 AS step, tok AS token, cnt FROM s0"] + [
        f"SELECT {i} AS step, next AS token, cnt FROM s{i}"
        for i in range(1, _GEN_STEPS + 1)
    ]
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + "\n    SELECT CAST(step AS INT) AS step, token, cnt FROM ("
        + " UNION ALL ".join(selects)
        + ") ORDER BY step"
    )


def _decode_step(pc: DataFrame, cur: DataFrame, stage: bool = True) -> DataFrame:
    """One greedy decode step: broadcast the 1-row current token into an
    equi-join probe of the staged bigram table, take the argmax
    continuation (count desc, token asc). ``stage=False`` exposes the
    raw probe plan for the plan-assertion test
    (tests/test_plan_assertions.py pins broadcast + TakeOrderedAndProject(1),
    never a shuffle join on the bigram table)."""
    probe = cur.select(F.col("token").alias("cur_tok"))
    nxt = (
        pc.join(F.broadcast(probe), F.col("head") == F.col("cur_tok"))
        .orderBy(F.desc("pair_n"), "next")
        .limit(1)
        .select(F.col("next").alias("token"), F.col("pair_n").alias("cnt"))
    )
    # each step staged eagerly: 1 row, and without it every later step's
    # lineage re-inlines all earlier probes (O(steps²) plan)
    return nxt.localCheckpoint(eager=True) if stage else nxt


@query("corpus_bigram_generate", oracle=_gen_oracle())
def corpus_bigram_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 2
    )
    prs = t.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(t[i - 1] AS head, t[i] AS next))"
            )
        ).alias("p")
    ).select("p.head", "p.next")
    pc = prs.groupBy("head", "next").agg(
        F.count(F.lit(1)).cast("bigint").alias("pair_n")
    )
    # staged: probed once per decode step
    pc = pc.localCheckpoint(eager=True)
    un = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    seed = (
        un.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), "tok")
        .limit(1)
        .select(F.col("tok").alias("token"), "cnt")
        # staged: without this, every later step's lineage re-inlines the
        # corpus-wide seed aggregation (the union'd plan held 7 copies of
        # the token shuffle and 28 TakeOrderedAndProject branches —
        # O(steps²) probes); each step below is likewise staged so the
        # decode is genuinely O(steps) 1-row probes
        .localCheckpoint(eager=True)
    )
    steps = [seed.select(F.lit(0).alias("step"), "token", "cnt")]
    cur = seed
    for i in range(1, _GEN_STEPS + 1):
        nxt = _decode_step(pc, cur)
        steps.append(nxt.select(F.lit(i).alias("step"), "token", "cnt"))
        cur = nxt
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out.select(
        F.col("step").cast("int").alias("step"), "token", "cnt"
    ).orderBy("step")


# --------------------------------------------------------------------------
# corpus_bpe_train — BPE tokenizer TRAINING, the full loop (Sennrich et
# al. 2016): corpus_bpe_merge_step ranks ONE round's pair statistics;
# this runs _BPE_TRAIN_STEPS rounds end to end — count adjacent pairs
# over the current tokenization of the DISTINCT-word table (weighted by
# word frequency), commit the argmax pair (n desc, pair asc — the
# deterministic tie-break), apply the merge, repeat. The committed
# merge table (step, lft, rgt, n) is the trained tokenizer, and the
# oracle unrolls the same rounds in SQL (the kmeans_ctes pattern for
# iterative algorithms), so every DECISION in the loop is hash-checked,
# not just the final counts.
#
# Scale: all work is vocabulary-sized (the distinct-word table), not
# corpus-sized — one (lft, rgt) integer-partial shuffle per round, the
# argmax is a 1-row TakeOrdered collect (iteration control data, like
# the k-means centroids), and the merge application is a per-word fold
# with no shuffle; localCheckpoint truncates lineage each round.
# --------------------------------------------------------------------------
_BPE_TRAIN_STEPS = 4


# One merge pass as DuckDB SQL, applied to alias t's toks against alias
# m's 1-row (lft, rgt) pair — the text is shared VERBATIM by the train
# CTEs below and streaming_queries' frozen-tokenizer-gate oracle, so the
# two restatements of "apply a merge" can never drift apart.
_BPE_FOLD_SQL = """list_reduce(list_transform(t.toks, x -> [x]), (acc, x) -> CASE
               WHEN acc[-1] = m.lft AND x[1] = m.rgt
               THEN list_append(acc[:-2], acc[-1] || x[1])
               ELSE list_concat(acc, x) END)"""


def _bpe_train_ctes(where: str = "") -> tuple[str, str]:
    """(cte_chain, merge_rows_union): the unrolled-training CTEs ending
    at tok{_BPE_TRAIN_STEPS} — the distinct-word table encoded with the
    learned merges — plus the UNION ALL of the per-round argmax rows.
    Shared by the train oracle (reads the merge rows), the composed
    train→encode pipeline oracle (aggregates the final tokenization),
    and — with ``where`` restricting the training corpus — the
    streaming frozen-tokenizer gate's train-on-first-landing oracle."""
    ctes = [
        f"""w AS (SELECT unnest({_TOKS_SQL}) AS w FROM documents {where}),
    wn AS (SELECT w, CAST(count(*) AS BIGINT) AS wn FROM w GROUP BY w),
    tok0 AS (
      SELECT w, wn,
             list_transform(range(1, length(w) + 1),
                            i -> substr(w, i, 1)) AS toks
      FROM wn
    )"""
    ]
    sel = []
    for r in range(_BPE_TRAIN_STEPS):
        ctes.append(f"""pc{r} AS (
      SELECT toks[i] AS lft, toks[i + 1] AS rgt,
             CAST(sum(wn) AS BIGINT) AS n
      FROM tok{r}, unnest(range(1, len(toks))) u(i)
      GROUP BY 1, 2
    ),
    m{r} AS (
      SELECT lft, rgt, n FROM pc{r} ORDER BY n DESC, lft, rgt LIMIT 1
    ),
    tok{r + 1} AS (
      SELECT t.w, t.wn,
             {_BPE_FOLD_SQL} AS toks
      FROM tok{r} t CROSS JOIN m{r} m
    )""")
        sel.append(f"SELECT {r} AS step, lft, rgt, n FROM m{r}")
    return ",\n    ".join(ctes), " UNION ALL ".join(sel)


def _bpe_train_oracle() -> str:
    ctes, sel = _bpe_train_ctes()
    return (
        "WITH "
        + ctes
        + "\n    SELECT CAST(step AS INT) AS step, lft, rgt, n FROM ("
        + sel
        + ") ORDER BY step"
    )


def bpe_merge_fold(a: str, b: str) -> F.Column:
    """One BPE merge pass over the ``toks`` column — column-built fold
    (no SQL-literal embedding — tokens may contain quotes);
    try_element_at: empty accumulator yields NULL and falls through to
    the append branch. Shared by the batch train loop below and the
    streaming frozen-tokenizer gate (the Spark twin of _BPE_FOLD_SQL)."""
    a_l, b_l = F.lit(a), F.lit(b)
    return F.aggregate(
        F.col("toks"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == a_l) & (x == b_l),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(a_l, b_l)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


# The trained tokenizer — (merge table, final distinct-word
# tokenization) — is consumed by corpus_bpe_train AND the composed
# corpus_bpe_pipeline; staged as ONE pair under one key (the _KM8_STATE
# pattern) so neither query re-runs the 4-round Lloyd-style loop.
_BPE_TRAIN_STATE: dict[tuple[str, str], tuple[list, DataFrame]] = {}


def _bpe_train_run(
    spark: SparkSession, sf_dir: str
) -> tuple[list, DataFrame]:
    app = spark.sparkContext.applicationId
    for k in [k for k in _BPE_TRAIN_STATE if k[0] != app]:
        del _BPE_TRAIN_STATE[k]  # dead-context eviction
    key = (app, sf_dir)
    if key in _BPE_TRAIN_STATE:
        return _BPE_TRAIN_STATE[key]

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokens(F.col("text"))).alias("w"))
    wn = words.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("wn"))
    cur = wn.withColumn(
        "toks",
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
    ).localCheckpoint(eager=True)

    merges = []
    for step in range(_BPE_TRAIN_STEPS):
        prs = cur.filter(F.size("toks") >= 2).select(
            "wn",
            F.explode(F.sequence(F.lit(1), F.size("toks") - 1)).alias("i"),
            "toks",
        ).select(
            F.element_at("toks", F.col("i")).alias("lft"),
            F.element_at("toks", F.col("i") + 1).alias("rgt"),
            "wn",
        )
        top = (
            prs.groupBy("lft", "rgt")
            .agg(F.sum("wn").cast("bigint").alias("n"))
            .orderBy(F.desc("n"), "lft", "rgt")
            .limit(1)
            .collect()[0]  # 1-row argmax — iteration control data
        )
        merges.append((step, top.lft, top.rgt, top.n))
        cur = cur.withColumn(
            "toks", bpe_merge_fold(top.lft, top.rgt)
        ).localCheckpoint(eager=True)
    _BPE_TRAIN_STATE[key] = (merges, cur)
    return _BPE_TRAIN_STATE[key]


@query("corpus_bpe_train", oracle=_bpe_train_oracle())
def corpus_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = _bpe_train_run(spark, sf_dir)
    return spark.createDataFrame(
        merges, "step int, lft string, rgt string, n bigint"
    ).orderBy("step")


# --------------------------------------------------------------------------
# corpus_bpe_pipeline — train THEN encode under ONE gate, composing the
# two proven halves the way corpus_dedup_funnel composed the dedup
# passes: corpus_bpe_train proves the merge-selection loop,
# corpus_bpe_encode proves applying a FIXED merge table; this applies
# the merges the train loop JUST produced to the corpus and reports the
# resulting subword vocabulary. The oracle chains the unrolled train
# CTEs straight into the encode aggregation (tok{N} IS the distinct-
# word table encoded with the learned merges), so the hand-off — the
# part neither half checks — is what this row hash-gates.
#
# Scale: the composition adds ZERO recompute past the staged training
# run (the final tokenization is the loop's last checkpoint); the
# summary is one token shuffle of integer partials.
# --------------------------------------------------------------------------
_BPE_CTES, _ = _bpe_train_ctes()


@query(
    "corpus_bpe_pipeline",
    oracle=f"""
    WITH {_BPE_CTES},
    tok AS (
      SELECT unnest(toks) AS token, wn FROM tok{_BPE_TRAIN_STEPS}
    )
    SELECT token,
           CAST(length(token) AS INT) AS token_len,
           CAST(count(*) AS BIGINT) AS n_word_slots,
           CAST(sum(wn) AS BIGINT) AS total_occurrences
    FROM tok
    GROUP BY token
    ORDER BY total_occurrences DESC, token
    LIMIT {_BPE_ENC_TOPK}
    """,
)
def corpus_bpe_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, encoded = _bpe_train_run(spark, sf_dir)
    tok = encoded.select(F.explode("toks").alias("token"), "wn")
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_word_slots"),
            F.sum("wn").cast("bigint").alias("total_occurrences"),
        )
        .select(
            "token",
            F.length("token").cast("int").alias("token_len"),
            "n_word_slots",
            "total_occurrences",
        )
        .orderBy(F.desc("total_occurrences"), "token")
        .limit(_BPE_ENC_TOPK)
    )


# --------------------------------------------------------------------------
# corpus_bpe_fertility — tokenizer EVALUATION: fertility (subwords per
# word, the standard tokenizer-quality metric — a fertility near 1
# means the vocabulary covers the corpus; high fertility inflates
# sequence lengths and training cost) for the tokenizer
# corpus_bpe_train just induced, measured corpus-weighted AND
# vocabulary-weighted next to the character baseline it started from.
# All sums are exact integers (token counts × word frequencies); the
# two fertility ratios are single deterministic double divisions.
# Reuses the staged training run — the metric costs one vocab-sized
# aggregation, not a re-train.
# --------------------------------------------------------------------------
@query(
    "corpus_bpe_fertility",
    oracle=f"""
    WITH {_BPE_CTES}
    SELECT CAST(count(*) AS BIGINT) AS n_vocab,
           CAST(sum(wn) AS BIGINT) AS n_word_occurrences,
           CAST(sum(len(toks)) AS BIGINT) AS vocab_subwords,
           CAST(sum(wn * len(toks)) AS BIGINT) AS corpus_subwords,
           CAST(sum(wn * length(w)) AS BIGINT) AS corpus_chars,
           round(CAST(sum(wn * len(toks)) AS DOUBLE)
                 / CAST(sum(wn) AS DOUBLE), 6) AS fertility_corpus,
           round(CAST(sum(len(toks)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS fertility_vocab
    FROM tok{_BPE_TRAIN_STEPS}
    """,
)
def corpus_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, encoded = _bpe_train_run(spark, sf_dir)
    return encoded.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vocab"),
        F.sum("wn").cast("bigint").alias("n_word_occurrences"),
        F.sum(F.size("toks")).cast("bigint").alias("vocab_subwords"),
        F.sum(F.col("wn") * F.size("toks"))
        .cast("bigint")
        .alias("corpus_subwords"),
        F.sum(F.col("wn") * F.length("w"))
        .cast("bigint")
        .alias("corpus_chars"),
        F.round(
            F.sum(F.col("wn") * F.size("toks")).cast("double")
            / F.sum("wn").cast("double"),
            6,
        ).alias("fertility_corpus"),
        F.round(
            F.sum(F.size("toks")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("fertility_vocab"),
    )


# --------------------------------------------------------------------------
# corpus_zipf_fit — the rank-frequency Zipf audit every corpus report
# ships: top-100 words ranked by frequency, each carrying the exact
# integer product rank*cnt (constant under an ideal Zipf(1) law — the
# drift of this column IS the fit diagnostic) and the exact cumulative
# count, so head-heaviness (cum share of the top-k) reads off the
# integer columns without any float division. One token-keyed shuffle
# with map-side partial aggregation; the global rank window is safe
# because it sits above the 100-row TakeOrdered cut (rank_topk —
# structural, plan-asserted for every adopter).
# --------------------------------------------------------------------------
@query(
    "corpus_zipf_fit",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS_SQL}) AS tok FROM documents),
    freq AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS cnt
      FROM tok GROUP BY tok
      ORDER BY cnt DESC, tok LIMIT 100
    ),
    ranked AS (
      SELECT CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS INT) AS rk,
             tok, cnt
      FROM freq
    )
    SELECT rk, tok, cnt,
           CAST(rk * cnt AS BIGINT) AS rank_cnt_product,
           CAST(sum(cnt) OVER (ORDER BY rk) AS BIGINT) AS cum_cnt
    FROM ranked
    ORDER BY rk
    """,
)
def corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from data_ingestion_din_spark.operators.ranking import rank_topk

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    ranked = rank_topk(freq, 100, F.desc("cnt"), "tok", rk_col="rk")
    # both windows see only the 100 ranked rows (structural via rank_topk)
    return ranked.select(
        "rk",
        "tok",
        "cnt",
        (F.col("rk") * F.col("cnt")).cast("bigint").alias("rank_cnt_product"),
        F.sum("cnt").over(W.orderBy("rk")).cast("bigint").alias("cum_cnt"),
    ).orderBy("rk")


# --------------------------------------------------------------------------
# corpus_heaps_law — vocabulary growth vs corpus size (Heaps' law): docs
# are bucketed into 10 arrival slices (integer range-bucketing on doc_id
# from a 1-row min/max aggregate — the fixture's arrival order, no
# global window anywhere), each WORD is attributed to the slice of its
# FIRST occurrence (min bucket — one word-keyed shuffle, no per-prefix
# rescan), and the cumulative (tokens, distinct types) curve is read off
# a 10-row running sum. This is the O(corpus) formulation of a curve
# naively computed as 10 prefix-distinct scans; all columns are exact
# integers. At 100 TB the word-keyed min-bucket aggregate is the only
# corpus-sized shuffle; the window runs over 10 rows.
# --------------------------------------------------------------------------
@query(
    "corpus_heaps_law",
    oracle=f"""
    WITH span AS (
      SELECT min(doc_id) AS mn, max(doc_id) - min(doc_id) + 1 AS width
      FROM documents
    ),
    d AS (
      SELECT doc_id, {_TOKS_SQL} AS toks,
             CAST((doc_id - s.mn) * 10 // s.width AS INT) + 1 AS bucket
      FROM documents, span s
    ),
    tok AS (SELECT bucket, unnest(toks) AS tok FROM d),
    first_seen AS (
      SELECT tok, min(bucket) AS first_bucket FROM tok GROUP BY tok
    ),
    new_types AS (
      SELECT first_bucket AS bucket, CAST(count(*) AS BIGINT) AS new_types
      FROM first_seen GROUP BY first_bucket
    ),
    bucket_tokens AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens
      FROM tok GROUP BY bucket
    )
    SELECT b.bucket,
           b.n_tokens,
           coalesce(n.new_types, 0) AS new_types,
           CAST(sum(b.n_tokens) OVER (ORDER BY b.bucket) AS BIGINT)
             AS cum_tokens,
           CAST(sum(coalesce(n.new_types, 0)) OVER (ORDER BY b.bucket)
                AS BIGINT) AS cum_types
    FROM bucket_tokens b LEFT JOIN new_types n USING (bucket)
    ORDER BY b.bucket
    """,
)
def corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    # arrival slices via integer range-bucketing on doc_id from a 1-row
    # min/max aggregate (bounded control data, broadcast) — no global
    # window touches corpus-sized data anywhere in this query
    span = docs.agg(
        F.min("doc_id").alias("mn"),
        (F.max("doc_id") - F.min("doc_id") + 1).alias("width"),
    )
    d = (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .join(F.broadcast(span))
        .withColumn(
            "bucket",
            F.expr("CAST((doc_id - mn) * 10 DIV width AS INT) + 1"),
        )
    )
    # ONE corpus explode + one (tok, bucket) shuffle; the vocab-sized
    # count table is staged for its two consumers (first-occurrence
    # attribution + per-bucket token totals) so nothing rescans the
    # corpus twice
    g = (
        d.select("bucket", F.explode("toks").alias("tok"))
        .groupBy("tok", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    first_seen = g.groupBy("tok").agg(F.min("bucket").alias("bucket"))
    new_types = first_seen.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_types")
    )
    bucket_tokens = g.groupBy("bucket").agg(
        F.sum("c").cast("bigint").alias("n_tokens")
    )
    joined = bucket_tokens.join(new_types, "bucket", "left").select(
        "bucket",
        "n_tokens",
        F.coalesce("new_types", F.lit(0)).cast("bigint").alias("new_types"),
    )
    # 10-row running sums (window input is the 10 bucket rows)
    return joined.select(
        "bucket",
        "n_tokens",
        "new_types",
        F.sum("n_tokens").over(W.orderBy("bucket")).cast("bigint").alias("cum_tokens"),
        F.sum("new_types").over(W.orderBy("bucket")).cast("bigint").alias("cum_types"),
    ).orderBy("bucket")


# --------------------------------------------------------------------------
# doc_ngram_perplexity — the REAL CCNet/KenLM quality knob behind the
# doc_rare_token_ratio / doc_bigram_lm_score stand-ins: per-document
# length-normalized bigram negative-log-likelihood with Stupid-Backoff
# (Brants et al. 2007) to the unigram model, in INTEGER octave
# arithmetic (length(bin(x)) = floor(log2 x)+1 — the retrieval_bm25 /
# DSIR recipe) so every per-doc score and the keep/drop DECISION sit
# under the hash gate (libm log is the one primitive parity cannot
# trust). The LM trains on the doc_id%4==0 quarter and scores EVERYONE,
# so held-out docs genuinely exercise the backoff path (an LM trained on
# the full corpus has pair_n >= 1 for every scored bigram and the
# backoff branch would be dead code; the %2 half-trainer left only 7
# backoff bigrams on this fixture vs the quarter-trainer's 58 across
# 57 docs — measured, which is why the slice is %4):
#
#   q(h,x) = intlog2(head_n+1) - intlog2(pair_n)          seen bigram
#          = 1 + intlog2(T+1)  - intlog2(tok_n(x)+1)      backoff
#                (1 octave  ~= the Stupid-Backoff alpha=0.4 penalty)
#   ppl_milli(d) = 1000 * sum(q) DIV n_bigrams            keep <= cutoff
#
# Scale: one (head,next) shuffle trains the pair table (map-side
# partials), scoring is a pair-key shuffle join of corpus bigrams
# against it (the bigram long tail — NOT broadcastable, honestly so) +
# a vocab-key join for the backoff unigram, then one doc_id rollup; the
# trained tables are staged artifacts reused across quality passes at
# production, exactly like doc_rare_token_ratio's df table.
# --------------------------------------------------------------------------
_PPL_TRAIN_MOD = 4
_PPL_KEEP_MAX = 4650  # milli-octaves/bigram ~= fixture median: the keep
# decision splits the corpus instead of waving everyone through
# (measured ppl_milli range 4208..5061, median 4654 under the %4 LM)


@query(
    "doc_ngram_perplexity",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    prs AS (
      SELECT doc_id, t[i] AS head, t[i + 1] AS next
      FROM t, unnest(range(1, len(t))) r(i)
      WHERE i < len(t)
    ),
    pc AS (
      SELECT head, next, CAST(count(*) AS BIGINT) AS pair_n
      FROM prs WHERE doc_id % {_PPL_TRAIN_MOD} = 0 GROUP BY head, next
    ),
    hn AS (
      SELECT *, CAST(sum(pair_n) OVER (PARTITION BY head) AS BIGINT)
                  AS head_n
      FROM pc
    ),
    trtok AS (
      SELECT unnest(t) AS tok FROM t WHERE doc_id % {_PPL_TRAIN_MOD} = 0
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
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(bo) AS BIGINT) AS n_backoff,
           CAST(sum(q) AS BIGINT) AS q_sum,
           CAST(sum(q) * 1000 // count(*) AS BIGINT) AS ppl_milli,
           (sum(q) * 1000 // count(*)) <= {_PPL_KEEP_MAX} AS keep
    FROM q GROUP BY doc_id ORDER BY doc_id
    """,
)
def doc_ngram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    intlog2 = lambda c: F.length(F.bin(c)).cast("bigint")  # noqa: E731
    # size >= 2 guard for the bigram generator (sequence() descends for
    # shorter docs — see corpus_bigram_lm); unigram/total counts use the
    # UNFILTERED token stream (1-token train docs still count).
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
    train = prs.filter(F.col("doc_id") % _PPL_TRAIN_MOD == 0)
    pc = train.groupBy("head", "next").agg(
        F.count(F.lit(1)).cast("bigint").alias("pair_n")
    )
    hn = pc.withColumn(
        "head_n", F.sum("pair_n").over(W.partitionBy("head")).cast("bigint")
    )
    trtok = (
        t0.filter(F.col("doc_id") % _PPL_TRAIN_MOD == 0)
        .select(F.explode("t").alias("tok"))
    )
    uc = trtok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tok_n")
    )
    tot = trtok.agg(F.count(F.lit(1)).cast("bigint").alias("tt"))
    scored = (
        prs.join(hn, ["head", "next"], "left")
        .join(uc.withColumnRenamed("tok", "next"), "next", "left")
        # 1-row scalar attach, hint-free (AQE broadcasts it on its own;
        # the LM-side joins above must stay plain — vocabulary-sized)
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
            F.when(F.col("pair_n").isNull(), 1).otherwise(0).alias("bo"),
        )
    )
    n = F.count(F.lit(1))
    return (
        scored.groupBy("doc_id")
        .agg(
            n.cast("bigint").alias("n_bigrams"),
            F.sum("bo").cast("bigint").alias("n_backoff"),
            F.sum("q").cast("bigint").alias("q_sum"),
            F.expr("sum(q) * 1000 DIV count(*)")
            .cast("bigint")
            .alias("ppl_milli"),
            (F.expr("sum(q) * 1000 DIV count(*)") <= _PPL_KEEP_MAX).alias(
                "keep"
            ),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# doc_trigram_perplexity — one step from the bigram Stupid-Backoff above
# toward the 5-gram KenLM CCNet runs: an INTERPOLATED trigram LM
# (Jelinek-Mercer shape) in pure integer arithmetic. Component
# probabilities live in fixed point (p·2^S, S=30, exact integer
# division on both engines); the mixture is an integer-weighted sum
# with octave weights summing to 8, and the per-gram NLL is its octave
#
#   q = intlog2(8·2^S) − intlog2(λ3·p3 + λ2·p2 + λ1·p1)
#     = (S+4) − length(bin(mix))                    (mix ≥ 1: λ1 ≥ 1
#       and the add-one unigram keeps p1 ≥ 1 while T+1 ≤ 2^S)
#
# so scores and keep/drop decisions stay under the hash gate. Same %4
# trainer protocol as the bigram (train quarter, score everyone). The
# λ grid was MEASURED before shipping (doc_lm_interp_ab below): on this
# fixture held-out NLL is monotone TOWARD the bigram component —
# (4,2,2)=5889, (2,4,2)=5605, (1,5,2)=5510, pure-bigram (0,7,1)=5486
# milli-octaves/gram, all above Stupid-Backoff's 4683 — the %4 training
# quarter is too sparse for trigram contexts to pay (10,580 of 26,165
# scored trigrams hit a trained context at sf0.01). Production λ is
# (1,5,2), the best setting whose trigram component is alive; the A/B
# query keeps the whole surface gated rather than a hypothesis comment.
#
# Scale: one (h1,h2,x) shuffle trains the trigram table, scoring is
# corpus trigrams shuffle-joined against it plus the bigram/unigram
# tables (long-tail keys — NOT broadcastable, hint-free), one doc_id
# rollup; the 1-row total attaches via crossJoin like the bigram.
# 2^S fixed point caps exact counts at tri_n < 2^33 per key — fine for
# any training slice whose single most frequent trigram is < 8.5e9.
# --------------------------------------------------------------------------
_PPL3_S = 30
_PPL3_LAMBDAS = ((4, 2, 2), (2, 4, 2), (1, 5, 2), (0, 7, 1))  # sum = 8
_PPL3_L = (1, 5, 2)  # production: measured knee with a live trigram term
_PPL3_KEEP_MAX = 5470  # ~fixture median under the production lambda
# (range 4235..6300, median 5473 at (1,5,2)): the keep decision splits
# the corpus instead of waving everyone through, like _PPL_KEEP_MAX


def _ppl3_ctes() -> str:
    """Trigram/bigram/unigram component probabilities per scored trigram,
    fixed point p·2^S — the shared head of both queries below."""
    return f"""
    t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    tri AS (
      SELECT doc_id, t[i] AS h1, t[i+1] AS h2, t[i+2] AS x
      FROM t, unnest(range(1, len(t) - 1)) r(i) WHERE i + 2 <= len(t)
    ),
    tc AS (
      SELECT h1, h2, x, CAST(count(*) AS BIGINT) AS tri_n
      FROM tri WHERE doc_id % {_PPL_TRAIN_MOD} = 0 GROUP BY h1, h2, x
    ),
    ctx3 AS (
      SELECT h1, h2, CAST(sum(tri_n) AS BIGINT) AS ctx_n
      FROM tc GROUP BY h1, h2
    ),
    prs3 AS (
      SELECT doc_id, t[i] AS head, t[i + 1] AS next
      FROM t, unnest(range(1, len(t))) r(i) WHERE i < len(t)
    ),
    pc3 AS (
      SELECT head, next, CAST(count(*) AS BIGINT) AS pair_n
      FROM prs3 WHERE doc_id % {_PPL_TRAIN_MOD} = 0 GROUP BY head, next
    ),
    hn3 AS (
      SELECT *, CAST(sum(pair_n) OVER (PARTITION BY head) AS BIGINT)
                  AS head_n
      FROM pc3
    ),
    trtok3 AS (
      SELECT unnest(t) AS tok FROM t WHERE doc_id % {_PPL_TRAIN_MOD} = 0
    ),
    uc3 AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS tok_n FROM trtok3 GROUP BY tok
    ),
    tot3 AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM trtok3),
    comps AS (
      SELECT g.doc_id, g.h2, g.x,
        CASE WHEN c.tri_n IS NOT NULL
          THEN c.tri_n * {1 << _PPL3_S} // x3.ctx_n ELSE 0 END AS p3,
        CASE WHEN h.pair_n IS NOT NULL
          THEN h.pair_n * {1 << _PPL3_S} // h.head_n ELSE 0 END AS p2,
        (coalesce(u.tok_n, 0) + 1) * {1 << _PPL3_S} // (tot3.tt + 1) AS p1,
        CASE WHEN c.tri_n IS NOT NULL THEN 1 ELSE 0 END AS tri_hit,
        CASE WHEN h.pair_n IS NOT NULL THEN 1 ELSE 0 END AS bi_hit,
        h.pair_n AS pair_n, h.head_n AS head_n
      FROM tri g
      LEFT JOIN tc c ON c.h1 = g.h1 AND c.h2 = g.h2 AND c.x = g.x
      LEFT JOIN ctx3 x3 ON x3.h1 = g.h1 AND x3.h2 = g.h2
      LEFT JOIN hn3 h ON h.head = g.h2 AND h.next = g.x
      LEFT JOIN uc3 u ON u.tok = g.x
      CROSS JOIN tot3
    )"""


def _ppl3_q_sql(lams: tuple[int, int, int]) -> str:
    l3, l2, l1 = lams
    return (
        f"{_PPL3_S + 4} - length(bin({l3} * p3 + {l2} * p2 + {l1} * p1))"
    )


def _tri_comps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the ``comps`` CTE: per scored trigram, the fixed
    point component probabilities and hit flags."""
    docs = load_table(spark, sf_dir, "documents")
    t0 = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    t = t0.filter(F.size("t") >= 3)
    tri = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 2), "
                "i -> struct(t[i - 1] AS h1, t[i] AS h2, t[i + 1] AS x))"
            )
        ).alias("g"),
    ).select("doc_id", "g.h1", "g.h2", "g.x")
    train3 = tri.filter(F.col("doc_id") % _PPL_TRAIN_MOD == 0)
    tc = train3.groupBy("h1", "h2", "x").agg(
        F.count(F.lit(1)).cast("bigint").alias("tri_n")
    )
    ctx3 = tc.groupBy("h1", "h2").agg(
        F.sum("tri_n").cast("bigint").alias("ctx_n")
    )
    t2 = t0.filter(F.size("t") >= 2)
    prs = t2.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(t[i - 1] AS head, t[i] AS next))"
            )
        ).alias("p"),
    ).select("doc_id", "p.head", "p.next")
    pc = (
        prs.filter(F.col("doc_id") % _PPL_TRAIN_MOD == 0)
        .groupBy("head", "next")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_n"))
    )
    from pyspark.sql.window import Window as W

    hn = pc.withColumn(
        "head_n", F.sum("pair_n").over(W.partitionBy("head")).cast("bigint")
    )
    trtok = t0.filter(F.col("doc_id") % _PPL_TRAIN_MOD == 0).select(
        F.explode("t").alias("tok")
    )
    uc = trtok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tok_n")
    )
    tot = trtok.agg(F.count(F.lit(1)).cast("bigint").alias("tt"))
    two = F.lit(1 << _PPL3_S)
    return (
        tri.join(tc, ["h1", "h2", "x"], "left")
        .join(ctx3, ["h1", "h2"], "left")
        .join(
            hn.select(
                F.col("head").alias("h2"),
                F.col("next").alias("x"),
                "pair_n",
                "head_n",
            ),
            ["h2", "x"],
            "left",
        )
        .join(uc.withColumnRenamed("tok", "x"), "x", "left")
        .crossJoin(tot)  # 1-row scalar attach, hint-free (as the bigram)
        .select(
            "doc_id",
            "h2",
            "x",
            F.when(
                F.col("tri_n").isNotNull(),
                F.expr(f"tri_n * {1 << _PPL3_S} DIV ctx_n"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("p3"),
            F.when(
                F.col("pair_n").isNotNull(),
                F.expr(f"pair_n * {1 << _PPL3_S} DIV head_n"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("p2"),
            F.expr(
                f"(coalesce(tok_n, 0) + 1) * {1 << _PPL3_S} DIV (tt + 1)"
            )
            .cast("bigint")
            .alias("p1"),
            F.col("tri_n").isNotNull().cast("int").alias("tri_hit"),
            F.col("pair_n").isNotNull().cast("int").alias("bi_hit"),
            # raw bigram counts for the smoothing A/B's KN/backoff rows
            F.col("pair_n").cast("bigint").alias("pair_n"),
            F.col("head_n").cast("bigint").alias("head_n"),
        )
    )


def _ppl3_q_col(lams: tuple[int, int, int]):
    l3, l2, l1 = lams
    return F.lit(_PPL3_S + 4) - F.length(
        F.bin(
            F.lit(l3) * F.col("p3")
            + F.lit(l2) * F.col("p2")
            + F.lit(l1) * F.col("p1")
        )
    ).cast("bigint")


@query(
    "doc_trigram_perplexity",
    oracle=f"""
    WITH {_ppl3_ctes()}
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_trigrams,
           CAST(sum(tri_hit) AS BIGINT) AS n_tri_hit,
           CAST(sum(bi_hit) AS BIGINT) AS n_bi_hit,
           CAST(sum({_ppl3_q_sql(_PPL3_L)}) AS BIGINT) AS q_sum,
           CAST(sum({_ppl3_q_sql(_PPL3_L)}) * 1000 // count(*) AS BIGINT)
             AS ppl_milli,
           (sum({_ppl3_q_sql(_PPL3_L)}) * 1000 // count(*))
             <= {_PPL3_KEEP_MAX} AS keep
    FROM comps GROUP BY doc_id ORDER BY doc_id
    """,
)
def doc_trigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    comps = _tri_comps(spark, sf_dir).withColumn("q", _ppl3_q_col(_PPL3_L))
    return (
        comps.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
            F.sum("tri_hit").cast("bigint").alias("n_tri_hit"),
            F.sum("bi_hit").cast("bigint").alias("n_bi_hit"),
            F.sum("q").cast("bigint").alias("q_sum"),
            F.expr("sum(q) * 1000 DIV count(*)")
            .cast("bigint")
            .alias("ppl_milli"),
            (F.expr("sum(q) * 1000 DIV count(*)") <= _PPL3_KEEP_MAX).alias(
                "keep"
            ),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# doc_lm_interp_ab — the λ-GRID A/B for the interpolated trigram vs the
# bigram Stupid-Backoff, on HELD-OUT docs (doc_id%4 != 0 — the docs the
# %4 trainer never saw), one hash-gated row per λ: held-out per-gram
# NLL for the mixture, the bigram baseline on the same doc set, and the
# keep/drop deltas (trigram keep at _PPL3_KEEP_MAX vs the bigram gate
# at _PPL_KEEP_MAX; n_flip = docs the two gates disagree on). The
# measured surface is the honest headline: every mixture trails the
# backoff baseline on this fixture, monotonically in trigram weight —
# shipping the measurement instead of the assumption (the IVFPQ
# residual-crossover precedent).
# --------------------------------------------------------------------------
def _ab_oracle() -> str:
    lam_qs = ",\n           ".join(
        f"CAST(sum({_ppl3_q_sql(l)}) AS BIGINT) AS qs_{i},\n           "
        f"CAST(sum({_ppl3_q_sql(l)}) * 1000 // count(*) AS BIGINT)"
        f" AS ppl_{i}"
        for i, l in enumerate(_PPL3_LAMBDAS)
    )
    rows = "\n    UNION ALL\n".join(
        f"""
    SELECT {l[0]} AS l3, {l[1]} AS l2, {l[2]} AS l1,
           CAST(sum(qs_{i}) * 1000 // sum(n3) AS BIGINT) AS tri_nll_milli,
           CAST(sum(b.q_sum) * 1000 // sum(b.n_bigrams) AS BIGINT)
             AS bi_nll_milli,
           CAST(count(*) AS BIGINT) AS n_heldout,
           CAST(sum(CASE WHEN ppl_{i} <= {_PPL3_KEEP_MAX}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_tri,
           CAST(sum(CASE WHEN b.ppl_milli <= {_PPL_KEEP_MAX}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_bi,
           CAST(sum(CASE WHEN (ppl_{i} <= {_PPL3_KEEP_MAX})
                         <> (b.ppl_milli <= {_PPL_KEEP_MAX})
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_flip
    FROM per3 JOIN b USING (doc_id)
    WHERE doc_id % {_PPL_TRAIN_MOD} <> 0"""
        for i, l in enumerate(_PPL3_LAMBDAS)
    )
    return f"""
    WITH {_ppl3_ctes()},
    per3 AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n3,
           {lam_qs}
      FROM comps GROUP BY doc_id
    ),
    bq AS (
      SELECT p.doc_id,
             CASE WHEN h.pair_n IS NOT NULL
               THEN CAST(length(bin(h.head_n + 1)) AS BIGINT)
                    - CAST(length(bin(h.pair_n)) AS BIGINT)
               ELSE 1 + CAST(length(bin(tot3.tt + 1)) AS BIGINT)
                    - CAST(length(bin(coalesce(u.tok_n, 0) + 1)) AS BIGINT)
             END AS q
      FROM prs3 p
      LEFT JOIN hn3 h ON h.head = p.head AND h.next = p.next
      LEFT JOIN uc3 u ON u.tok = p.next
      CROSS JOIN tot3
    ),
    b AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(q) AS BIGINT) AS q_sum,
             CAST(sum(q) * 1000 // count(*) AS BIGINT) AS ppl_milli
      FROM bq GROUP BY doc_id
    )
    SELECT * FROM ({rows})
    ORDER BY l3 DESC, l2
    """


@query("doc_lm_interp_ab", oracle=_ab_oracle())
def doc_lm_interp_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    comps = _tri_comps(spark, sf_dir)
    for i, lams in enumerate(_PPL3_LAMBDAS):
        comps = comps.withColumn(f"q_{i}", _ppl3_q_col(lams))
    per3 = comps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n3"),
        *[
            c
            for i in range(len(_PPL3_LAMBDAS))
            for c in (
                F.sum(f"q_{i}").cast("bigint").alias(f"qs_{i}"),
                F.expr(f"sum(q_{i}) * 1000 DIV count(*)")
                .cast("bigint")
                .alias(f"ppl_{i}"),
            )
        ],
    )
    bi = doc_ngram_perplexity(spark, sf_dir).select(
        "doc_id", "n_bigrams", "q_sum", "ppl_milli"
    )
    joined = per3.join(
        bi.withColumnRenamed("q_sum", "bqs").withColumnRenamed(
            "ppl_milli", "bppl"
        ),
        "doc_id",
    ).filter(F.col("doc_id") % _PPL_TRAIN_MOD != 0)
    grid = None
    for i, (l3, l2, l1) in enumerate(_PPL3_LAMBDAS):
        keep_t = F.col(f"ppl_{i}") <= _PPL3_KEEP_MAX
        keep_b = F.col("bppl") <= _PPL_KEEP_MAX
        row = joined.agg(
            F.lit(l3).cast("int").alias("l3"),
            F.lit(l2).cast("int").alias("l2"),
            F.lit(l1).cast("int").alias("l1"),
            F.expr(f"sum(qs_{i}) * 1000 DIV sum(n3)")
            .cast("bigint")
            .alias("tri_nll_milli"),
            F.expr("sum(bqs) * 1000 DIV sum(n_bigrams)")
            .cast("bigint")
            .alias("bi_nll_milli"),
            F.count(F.lit(1)).cast("bigint").alias("n_heldout"),
            F.sum(keep_t.cast("int")).cast("bigint").alias("n_keep_tri"),
            F.sum(keep_b.cast("int")).cast("bigint").alias("n_keep_bi"),
            F.sum((keep_t != keep_b).cast("int"))
            .cast("bigint")
            .alias("n_flip"),
        )
        grid = row if grid is None else grid.unionByName(row)
    return grid.orderBy(F.desc("l3"), "l2")

# --------------------------------------------------------------------------
# doc_lm_smoothing_ab — the SMOOTHING A/B the interp grid above makes
# necessary: its bi_nll_milli baseline is the production gate's own
# difference-of-bitlengths score, whose double floor biases LOW by
# ~0.8 octave/gram vs the mixtures' single-floor fixed-point octave —
# cross-RECIPE NLLs are only comparable under ONE quantization. This
# query scores four smoothing recipes on the SAME gram stream (the
# trigram positions; bigram models condition on h2) under the SAME
# quantization q = (S+1) − length(bin(p·2^S)):
#
#   sb     Stupid-Backoff (p2 if the pair trained, else unigram/2)
#   jm_bi  Jelinek-Mercer bigram     (7·p2 + 1·p1) / 8
#   jm_tri Jelinek-Mercer trigram    (1·p3 + 5·p2 + 2·p1) / 8
#   kn     interpolated Kneser-Ney, absolute discount D=1:
#          (c(h,x)−1)+/c(h) + (N1+(h,·)/c(h)) · (N1+(·,x)+1)/(N1+(·,·)+1)
#          (continuation probability — THE production n-gram smoothing)
#
# Measured held-out (sf0.01, %4 trainer): jm_bi 5486 < jm_tri 5510 <
# sb 5517 ≈ kn 5518 — ONCE FAIRLY QUANTIZED, interpolation beats
# backoff (reversing the interp grid's apparent 4683-vs-5510 verdict,
# which was quantization bias), and KN's discount is a dead heat with
# backoff on a quarter-sized trainer (continuation mass needs more
# bigram types than 7k tokens provide). Keep/flip columns use one
# shared cutoff so gate deltas are recipe-only.
#
# Scale: the trigram component tables are shared with doc_trigram_
# perplexity; KN adds two head/next-keyed aggregates of the trained
# pair table (vocabulary-sized, hint-free) and a 1-row total.
# --------------------------------------------------------------------------
def _smooth_oracle() -> str:
    S = _PPL3_S
    two = 1 << S
    models = {
        "sb": f"""CASE WHEN c.bi_hit = 1 THEN c.p2
                 ELSE c.p1 // 2 END""",
        "jm_bi": "(7 * c.p2 + c.p1) // 8",
        "jm_tri": "(c.p3 + 5 * c.p2 + 2 * c.p1) // 8",
        "kn": f"""CASE WHEN hd.hn IS NOT NULL THEN
                   (CASE WHEN c.pair_n IS NOT NULL
                         THEN (c.pair_n - 1) * {two} // hd.hn
                         ELSE 0 END)
                   + (hd.n1p * {two} // hd.hn)
                     * (coalesce(k.cont_n, 0) + 1) // (ctot.ct + 1)
                 ELSE (coalesce(k.cont_n, 0) + 1) * {two} // (ctot.ct + 1)
                 END""",
    }
    per = ",\n      ".join(
        f"CAST(sum(CASE WHEN doc_id % {_PPL_TRAIN_MOD} <> 0 THEN q_{m}"
        f" ELSE 0 END) AS BIGINT) AS ho_{m},\n      "
        f"CAST(sum(q_{m}) * 1000 // count(*) AS BIGINT) AS ppl_{m}"
        for m in models
    )
    scored = ",\n        ".join(
        f"{S + 1} - length(bin(greatest(({expr}), 1))) AS q_{m}"
        for m, expr in models.items()
    )
    rows = "\n    UNION ALL\n".join(
        f"""
    SELECT '{m}' AS model,
           CAST(sum(ho_{m}) * 1000 // sum(ho_n) AS BIGINT)
             AS heldout_nll_milli,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN ppl_{m} <= {_PPL3_KEEP_MAX}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(sum(CASE WHEN (ppl_{m} <= {_PPL3_KEEP_MAX})
                         <> (ppl_sb <= {_PPL3_KEEP_MAX})
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_flip_vs_sb
    FROM per"""
        for m in models
    )
    return f"""
    WITH {_ppl3_ctes()},
    heads AS (
      SELECT head, CAST(sum(pair_n) AS BIGINT) AS hn,
             CAST(count(*) AS BIGINT) AS n1p
      FROM pc3 GROUP BY head
    ),
    cont AS (
      SELECT next, CAST(count(*) AS BIGINT) AS cont_n
      FROM pc3 GROUP BY next
    ),
    ctot AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM pc3),
    scored AS (
      SELECT c.doc_id,
        {scored}
      FROM comps c
      LEFT JOIN heads hd ON hd.head = c.h2
      LEFT JOIN cont k ON k.next = c.x
      CROSS JOIN ctot
    ),
    per AS (
      SELECT doc_id,
      CAST(CASE WHEN doc_id % {_PPL_TRAIN_MOD} <> 0 THEN count(*)
           ELSE 0 END AS BIGINT) AS ho_n,
      {per}
      FROM scored GROUP BY doc_id
    )
    SELECT * FROM ({rows})
    ORDER BY model
    """


@query("doc_lm_smoothing_ab", oracle=_smooth_oracle())
def doc_lm_smoothing_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    S = _PPL3_S
    two = 1 << S
    comps = _tri_comps(spark, sf_dir)
    # KN side tables off the trained pair table (vocabulary-sized)
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 2
    )
    pc = (
        t.filter(F.col("doc_id") % _PPL_TRAIN_MOD == 0)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(t[i - 1] AS head, t[i] AS next))"
                )
            ).alias("p")
        )
        .groupBy("p.head", "p.next")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pn"))
    )
    heads = pc.groupBy("head").agg(
        F.sum("pn").cast("bigint").alias("hn"),
        F.count(F.lit(1)).cast("bigint").alias("n1p"),
    )
    cont = pc.groupBy("next").agg(
        F.count(F.lit(1)).cast("bigint").alias("cont_n")
    )
    ctot = pc.agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    p_sb = F.when(F.col("bi_hit") == 1, F.col("p2")).otherwise(
        F.expr("p1 DIV 2")
    )
    p_jm_bi = F.expr("(7 * p2 + p1) DIV 8")
    p_jm_tri = F.expr("(p3 + 5 * p2 + 2 * p1) DIV 8")
    scored = (
        comps.join(heads.withColumnRenamed("head", "h2"), "h2", "left")
        .join(cont.withColumnRenamed("next", "x"), "x", "left")
        .crossJoin(ctot)  # 1-row scalar attach
    )
    qcol = lambda p: (  # noqa: E731
        F.lit(S + 1)
        - F.length(F.bin(F.greatest(p, F.lit(1)))).cast("bigint")
    )
    kn_seen = F.when(
        F.col("pair_n").isNotNull(),
        F.expr(f"(pair_n - 1) * {two} DIV hn"),
    ).otherwise(F.lit(0)) + F.expr(
        f"(n1p * {two} DIV hn) * (coalesce(cont_n, 0) + 1) DIV (ct + 1)"
    )
    kn_unseen = F.expr(f"(coalesce(cont_n, 0) + 1) * {two} DIV (ct + 1)")
    scored = scored.select(
        "doc_id",
        qcol(p_sb).alias("q_sb"),
        qcol(p_jm_bi).alias("q_jm_bi"),
        qcol(p_jm_tri).alias("q_jm_tri"),
        qcol(
            F.when(F.col("hn").isNotNull(), kn_seen).otherwise(kn_unseen)
        ).alias("q_kn"),
    )
    ho = F.col("doc_id") % _PPL_TRAIN_MOD != 0
    per = scored.groupBy("doc_id").agg(
        F.when(ho, F.count(F.lit(1)))
        .otherwise(0)
        .cast("bigint")
        .alias("ho_n"),
        *[
            c
            for m in ("sb", "jm_bi", "jm_tri", "kn")
            for c in (
                F.when(ho, F.sum(f"q_{m}"))
                .otherwise(0)
                .cast("bigint")
                .alias(f"ho_{m}"),
                F.expr(f"sum(q_{m}) * 1000 DIV count(*)")
                .cast("bigint")
                .alias(f"ppl_{m}"),
            )
        ],
    )
    grid = None
    for m in ("sb", "jm_bi", "jm_tri", "kn"):
        keep = F.col(f"ppl_{m}") <= _PPL3_KEEP_MAX
        keep_sb = F.col("ppl_sb") <= _PPL3_KEEP_MAX
        row = per.agg(
            F.lit(m).alias("model"),
            F.expr(f"sum(ho_{m}) * 1000 DIV sum(ho_n)")
            .cast("bigint")
            .alias("heldout_nll_milli"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(keep.cast("int")).cast("bigint").alias("n_keep"),
            F.sum((keep != keep_sb).cast("int"))
            .cast("bigint")
            .alias("n_flip_vs_sb"),
        )
        grid = row if grid is None else grid.unionByName(row)
    return grid.orderBy("model")


# --------------------------------------------------------------------------
# corpus_unigram_tokenize — the UNIGRAM-LM tokenizer (SentencePiece /
# Kudo 2018 shape) next to BPE: the tokenizer A/B every LLM data team
# runs. Candidate pieces are the corpus's substrings of length
# 1.._UNI_LMAX (8)
# over the distinct-word table, scored by occurrence frequency
# (wn-weighted); the vocabulary is the top-K pieces by (freq desc,
# piece asc) PLUS every single character (the coverage guarantee that
# makes Viterbi total), each carrying the INTEGER octave score
# intlog2(freq) = length(bin(freq)) — the retrieval_bm25/DSIR recipe,
# so the segmentation objective has no float anywhere (no EM: seed
# scores from frequencies, the standard initialization, kept frozen).
# Each word is segmented by Viterbi MINIMIZING the quantized negative
# log-likelihood — cost(piece) = NORM − score(piece) with NORM =
# intlog2(total piece mass), the octave twin of −log p(piece) =
# log(total) − log(freq):
#
#   obj(w) = Σ_pieces (64·cost(piece) + 1)
#
# — the "+1" makes the minimizer prefer FEWER pieces among equal-cost
# segmentations and packs (cost_sum, n_pieces) into ONE integer
# (n_pieces = obj mod 64, cost_sum = obj div 64 — exact while
# n_pieces < 64, guaranteed by the _UNI_WMAX word cap), so the
# per-word DECISION is a single hash-gated BIGINT with no tie
# ambiguity (min over ints is path-independent). A first draft
# MAXIMIZED Σ(64·score−1), which rewards splitting (every extra piece
# adds another large positive score term) and degenerated to
# characters — the sign matters: it is the per-piece normalizer that
# makes longer pieces pay. The oracle unrolls the dp over 1..WMAX
# as CTEs (the corpus_bpe_train unrolled-loop pattern); the Spark side
# runs the identical integer dp as a vocab-sized Arrow kernel
# (mapInPandas — the r8 playbook for tokenizer work) with the top-K
# vocabulary collected as a frozen artifact (the bounded broadcast
# class: k·4-char strings + one int each).
#
# Scale: everything is vocabulary-sized (distinct words), never
# corpus-sized — piece counting is one substring-explode shuffle of the
# word table, the dp touches each word once; applying the tokenizer to
# the corpus would be one words→pieces join, exactly like
# doc_bpe_token_stats.
# --------------------------------------------------------------------------
_UNI_WMAX = 8  # word-length cap (fixture max is 8 at every SF); words
# beyond the cap are excluded on BOTH sides — at production the tail
# above the cap falls back to character pieces
_UNI_LMAX = 8  # pieces long enough to hold whole frequent words
_UNI_VSIZE = 64


def _uni_ctes() -> str:
    """CTE chain documents → uwrd (capped distinct words) → uvocab
    (frozen score table) → udp1..udp{WMAX} → uni (per-word verdicts).
    Shared by the tokenize oracle and the fertility-comparison oracle."""
    ctes = [
        f"""uw0 AS (SELECT unnest({_TOKS_SQL}) AS w FROM documents),
    uwrd AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS wn FROM uw0
      WHERE length(w) <= {_UNI_WMAX} GROUP BY w
    ),
    usub AS (
      SELECT substr(w, i, l) AS piece, wn
      FROM uwrd,
           unnest(range(1, {_UNI_LMAX + 1})) t(l),
           unnest(range(1, length(w) - l + 2)) r(i)
      WHERE l <= length(w)
    ),
    upf AS MATERIALIZED (
      SELECT piece, CAST(sum(wn) AS BIGINT) AS pf FROM usub GROUP BY piece
    ),
    utop AS (
      SELECT piece, pf FROM upf ORDER BY pf DESC, piece LIMIT {_UNI_VSIZE}
    ),
    uvocab AS MATERIALIZED (
      SELECT piece, CAST(length(bin(pf)) AS BIGINT) AS score
      FROM (SELECT * FROM utop
            UNION
            SELECT piece, pf FROM upf WHERE length(piece) = 1)
    ),
    unorm AS MATERIALIZED (
      SELECT CAST(length(bin(sum(pf))) AS BIGINT) AS nrm FROM upf
    ),
    udp0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS obj FROM uwrd)"""
    ]
    for k in range(1, _UNI_WMAX + 1):
        branches = []
        for l in range(1, min(_UNI_LMAX, k) + 1):
            branches.append(
                f"""SELECT d.w, d.obj + 64 * (n.nrm - v.score) + 1 AS cand
        FROM udp{k - l} d
        JOIN uvocab v ON v.piece = substr(d.w, {k - l + 1}, {l})
        CROSS JOIN unorm n
        WHERE length(d.w) >= {k}"""
            )
        body = "\n        UNION ALL ".join(branches)
        ctes.append(
            f"""udp{k} AS MATERIALIZED (
      SELECT w, CAST(min(cand) AS BIGINT) AS obj FROM (
        {body}
      ) GROUP BY w
    )"""
        )
    fin = "\n      UNION ALL ".join(
        f"SELECT w, obj FROM udp{k} WHERE length(w) = {k}"
        for k in range(1, _UNI_WMAX + 1)
    )
    ctes.append(f"ufin AS (\n      {fin}\n    )")
    ctes.append(
        """uni AS (
      SELECT f.w, r.wn,
             CAST(f.obj % 64 AS INT) AS n_pieces,
             CAST(f.obj // 64 AS BIGINT) AS cost_sum,
             f.obj AS obj
      FROM ufin f JOIN uwrd r USING (w)
    )"""
    )
    return ",\n    ".join(ctes)


# (vocab dict, normalizer octave, per-word verdict DF) staged per
# (SparkContext, sf_dir) — consumed by corpus_unigram_tokenize,
# corpus_unigram_fertility, corpus_unigram_encode and the EM step.
_UNI_STATE: dict[tuple[str, str], tuple[dict, int, DataFrame]] = {}


def _uni_run(
    spark: SparkSession, sf_dir: str
) -> tuple[dict, int, DataFrame]:
    app = spark.sparkContext.applicationId
    for k in [k for k in _UNI_STATE if k[0] != app]:
        del _UNI_STATE[k]  # dead-context eviction
    key = (app, sf_dir)
    if key in _UNI_STATE:
        return _UNI_STATE[key]

    docs = load_table(spark, sf_dir, "documents")
    wrd = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") <= _UNI_WMAX)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wn"))
        # vocab-sized (bounded): one partition, one Arrow batch, one
        # Python worker — not 32 workers for 31 rows
        .coalesce(1)
        .localCheckpoint(eager=True)  # feeds piece counting AND the dp
    )
    sub = wrd.select(
        "wn",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, {_UNI_LMAX}), "
                "l -> CASE WHEN l <= length(w) THEN "
                "transform(sequence(1, length(w) - l + 1), "
                "i -> substring(w, i, l)) "
                "ELSE array() END))"
            )
        ).alias("piece"),
    )
    pf = sub.groupBy("piece").agg(F.sum("wn").cast("bigint").alias("pf"))
    top = pf.orderBy(F.desc("pf"), "piece").limit(_UNI_VSIZE)
    chars = pf.filter(F.length("piece") == 1)
    # frozen artifact: top-K pieces + the single-char closure — bounded
    # control data (the kmeans-centroid-literal class); nrm is the
    # octave of the total piece mass (the per-piece normalizer)
    vocab = {
        r.piece: r.pf.bit_length()  # == length(bin(pf)), exact
        for r in top.unionByName(chars).distinct().collect()
    }
    nrm = pf.agg(F.sum("pf")).collect()[0][0].bit_length()

    def _viterbi(batches):
        import pandas as pd

        for pdf in batches:
            out = {"w": [], "wn": [], "n_pieces": [], "cost_sum": [],
                   "obj": []}
            for w, wn in zip(pdf["w"], pdf["wn"]):
                n = len(w)
                dp = [0] + [None] * n
                for k in range(1, n + 1):
                    best = None
                    for l in range(1, min(_UNI_LMAX, k) + 1):
                        sc = vocab.get(w[k - l : k])
                        if sc is None or dp[k - l] is None:
                            continue
                        cand = dp[k - l] + 64 * (nrm - sc) + 1
                        if best is None or cand < best:
                            best = cand
                    dp[k] = best
                obj = dp[n]
                out["w"].append(w)
                out["wn"].append(int(wn))
                out["n_pieces"].append(obj % 64)
                out["cost_sum"].append(obj // 64)
                out["obj"].append(obj)
            yield pd.DataFrame(out)

    verdicts = wrd.mapInPandas(
        _viterbi,
        "w string, wn bigint, n_pieces int, cost_sum bigint, obj bigint",
    ).localCheckpoint(eager=True)
    _UNI_STATE[key] = (vocab, nrm, verdicts)
    return _UNI_STATE[key]


@query(
    "corpus_unigram_tokenize",
    oracle=f"""
    WITH {_uni_ctes()}
    SELECT w, wn, n_pieces, cost_sum, obj FROM uni ORDER BY w
    """,
)
def corpus_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, verdicts = _uni_run(spark, sf_dir)
    return verdicts.orderBy("w")


# --------------------------------------------------------------------------
# corpus_unigram_fertility — the tokenizer A/B row: unigram-LM vs BPE
# fertility on the identical (capped) word domain, corpus-weighted, in
# one hash-gated row — integer subword sums and two deterministic
# double divisions, joining the staged unigram verdicts against the
# staged BPE training run (neither tokenizer re-trains). Measured
# (sf0.01): fertility_uni 3.127 vs fertility_bpe 4.040 over 27,165
# word occurrences — the 4-round BPE has barely left the character
# baseline while the unigram vocabulary seats whole frequent words
# ('batch' = 1 piece) though its top-64 cutoff still splits some
# ('agg' loses the alphabetical tie at the pf cutoff and re-segments);
# the gap IS the A/B signal the row exists to measure.
# --------------------------------------------------------------------------
@query(
    "corpus_unigram_fertility",
    oracle=f"""
    WITH {_bpe_train_ctes()[0]},
    {_uni_ctes()}
    SELECT CAST(count(*) AS BIGINT) AS n_vocab_words,
           CAST(sum(u.wn) AS BIGINT) AS n_word_occurrences,
           CAST(sum(u.wn * u.n_pieces) AS BIGINT) AS uni_corpus_subwords,
           CAST(sum(u.wn * len(b.toks)) AS BIGINT) AS bpe_corpus_subwords,
           round(CAST(sum(u.wn * u.n_pieces) AS DOUBLE)
                 / CAST(sum(u.wn) AS DOUBLE), 6) AS fertility_uni,
           round(CAST(sum(u.wn * len(b.toks)) AS DOUBLE)
                 / CAST(sum(u.wn) AS DOUBLE), 6) AS fertility_bpe
    FROM uni u JOIN tok{_BPE_TRAIN_STEPS} b ON b.w = u.w
    """,
)
def corpus_unigram_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    _, _, uni = _uni_run(spark, sf_dir)
    _, bpe = _bpe_train_run(spark, sf_dir)
    j = uni.join(
        bpe.select("w", F.size("toks").alias("bpe_pieces")), "w"
    )
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vocab_words"),
        F.sum("wn").cast("bigint").alias("n_word_occurrences"),
        F.sum(F.col("wn") * F.col("n_pieces"))
        .cast("bigint")
        .alias("uni_corpus_subwords"),
        F.sum(F.col("wn") * F.col("bpe_pieces"))
        .cast("bigint")
        .alias("bpe_corpus_subwords"),
        F.round(
            F.sum(F.col("wn") * F.col("n_pieces")).cast("double")
            / F.sum("wn").cast("double"),
            6,
        ).alias("fertility_uni"),
        F.round(
            F.sum(F.col("wn") * F.col("bpe_pieces")).cast("double")
            / F.sum("wn").cast("double"),
            6,
        ).alias("fertility_bpe"),
    )


# --------------------------------------------------------------------------
# corpus_unigram_encode — the APPLY half of the unigram tokenizer
# (corpus_unigram_tokenize trains/segments the vocabulary; this encodes
# the CORPUS with it, the doc_bpe_token_stats lens for the unigram
# model): every document's whitespace words join the staged per-word
# Viterbi verdicts — a plain hint-free equi-join on the word (the
# verdict table is vocabulary-sized, the growing class) — and roll up
# to per-doc subword counts, total quantized NLL cost, and fertility.
# The per-doc total cost is the integer document NLL under the unigram
# LM — the same quantity doc_ngram_perplexity computes under the
# bigram LM, so the two quality lenses are directly comparable.
#
# Scale: one word-keyed join of the exploded corpus against the
# vocab-sized verdict table + one doc_id rollup — the
# doc_rare_token_ratio shape exactly.
# --------------------------------------------------------------------------
@query(
    "corpus_unigram_encode",
    oracle=f"""
    WITH {_uni_ctes()},
    dw AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS w FROM documents
    )
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(u.n_pieces) AS BIGINT) AS n_subwords,
           CAST(sum(u.cost_sum) AS BIGINT) AS total_cost,
           round(CAST(sum(u.n_pieces) AS DOUBLE) / count(*), 6)
             AS fertility
    FROM dw d JOIN uni u ON u.w = d.w
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """,
)
def corpus_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    _, _, verdicts = _uni_run(spark, sf_dir)
    dw = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("w")
    )
    n = F.count(F.lit(1))
    return (
        dw.join(verdicts.select("w", "n_pieces", "cost_sum"), "w")
        .groupBy("doc_id")
        .agg(
            n.cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_subwords"),
            F.sum("cost_sum").cast("bigint").alias("total_cost"),
            F.round(
                F.sum("n_pieces").cast("double") / n, 6
            ).alias("fertility"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# corpus_unigram_em_step — one full EM round of unigram-LM tokenizer
# TRAINING (the step SentencePiece actually iterates; the seed-scored
# corpus_unigram_tokenize is its initialization): E-step = Viterbi-
# segment every word under the current scores and count piece USAGE
# (wn-weighted; the Viterbi posterior approximation of the E-step, as
# in Kudo 2018 §3.2's practical variant); M-step = re-score pieces by
# intlog2(usage) with the normalizer rebuilt from total usage (pieces
# the segmenter never used fall out of the vocabulary — the prune
# step; single chars are floor-scored so coverage survives); then
# re-segment under the new scores. The output row compares round 0 vs
# round 1 — measured (sf0.01): vocabulary 65 → 42 (24 never-used
# pieces pruned + 1 coverage-floor char), corpus NLL cost 558,904 →
# 446,784 (−20%: the M-step concentrates mass on used pieces, the EM
# guarantee), fertility unchanged at 3.127 (the seed segmentation was
# already Viterbi-stable) — textbook EM behavior, hash-gated.
#
# Backtracking determinism: at each backward position, the SMALLEST
# piece length l whose dp predecessor explains the cell's objective is
# chosen — the same rule in the Arrow kernel and the oracle's unrolled
# backtrack CTEs, so the usage table (and hence the M-step and the
# whole round-1 segmentation) is bit-identical in both engines.
#
# Scale: everything stays vocabulary-sized (the E-step is one pass
# over the distinct-word table; usage is a piece-keyed aggregate of
# it; round 1 is a second pass) — the corpus is never touched.
# --------------------------------------------------------------------------
def _uni_segment(w: str, vocab: dict, nrm: int) -> tuple[int, list[str]]:
    """Viterbi obj + backtracked pieces under (vocab, nrm) — the one
    segmentation routine both EM kernels and (logically) the tokenize
    kernel implement; smallest-l backtrack tie-break."""
    n = len(w)
    dp = [0] + [None] * n
    for k in range(1, n + 1):
        best = None
        for l in range(1, min(_UNI_LMAX, k) + 1):
            sc = vocab.get(w[k - l : k])
            if sc is None or dp[k - l] is None:
                continue
            cand = dp[k - l] + 64 * (nrm - sc) + 1
            if best is None or cand < best:
                best = cand
        dp[k] = best
    pieces = []
    pos = n
    while pos > 0:
        for l in range(1, min(_UNI_LMAX, pos) + 1):
            piece = w[pos - l : pos]
            sc = vocab.get(piece)
            if sc is None or dp[pos - l] is None:
                continue
            if dp[pos - l] + 64 * (nrm - sc) + 1 == dp[pos]:
                pieces.append(piece)
                pos -= l
                break
    pieces.reverse()
    return dp[n], pieces


def _uni_usage_sql() -> str:
    """dpall → backtrack bk0..bk{WMAX} → ``usage`` CTE text: the
    wn-weighted piece-usage table of the round-0 Viterbi segmentation
    (smallest-l backtrack tie-break, matching the Arrow kernel) —
    shared by the EM-step and the prune oracles."""
    dpall = " UNION ALL ".join(
        f"SELECT w, {k} AS pos, obj FROM udp{k}"
        for k in range(0, _UNI_WMAX + 1)
    )
    bks = []
    for j in range(1, _UNI_WMAX + 1):
        bks.append(
            f"""bk{j} AS MATERIALIZED (
      SELECT w, piece, pos, obj FROM (
        SELECT b.w, substr(b.w, b.pos - l + 1, l) AS piece,
               b.pos - l AS pos, d.obj,
               row_number() OVER (PARTITION BY b.w ORDER BY l) AS rkb
        FROM bk{j - 1} b
        CROSS JOIN unnest(range(1, {_UNI_LMAX + 1})) t(l)
        JOIN uvocab v ON v.piece = substr(b.w, b.pos - l + 1, l)
        JOIN dpall d ON d.w = b.w AND d.pos = b.pos - l
        CROSS JOIN unorm n
        WHERE b.pos > 0 AND l <= b.pos
          AND d.obj + 64 * (n.nrm - v.score) + 1 = b.obj
      ) WHERE rkb = 1
    )"""
        )
    used = " UNION ALL ".join(
        f"SELECT w, piece FROM bk{j} WHERE piece IS NOT NULL"
        for j in range(1, _UNI_WMAX + 1)
    )
    return f"""dpall AS MATERIALIZED ({dpall}),
    bk0 AS MATERIALIZED (
      SELECT f.w, CAST(NULL AS VARCHAR) AS piece,
             length(f.w) AS pos, f.obj
      FROM ufin f
    ),
    {",".join(bks)},
    usage AS MATERIALIZED (
      SELECT u.piece, CAST(sum(r.wn) AS BIGINT) AS usage
      FROM ({used}) u JOIN uwrd r USING (w)
      GROUP BY u.piece
    )"""


def _uni_em_oracle() -> str:
    intlog2 = lambda x: f"CAST(length(bin({x})) AS BIGINT)"  # noqa: E731
    vdps = [
        "vdp0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS obj FROM uwrd)"
    ]
    for k in range(1, _UNI_WMAX + 1):
        branches = []
        for l in range(1, min(_UNI_LMAX, k) + 1):
            branches.append(
                f"""SELECT d.w, d.obj + 64 * (n.nrm - v.score) + 1 AS cand
        FROM vdp{k - l} d
        JOIN vocab2 v ON v.piece = substr(d.w, {k - l + 1}, {l})
        CROSS JOIN unorm2 n
        WHERE length(d.w) >= {k}"""
            )
        body = "\n        UNION ALL ".join(branches)
        vdps.append(
            f"""vdp{k} AS MATERIALIZED (
      SELECT w, CAST(min(cand) AS BIGINT) AS obj FROM (
        {body}
      ) GROUP BY w
    )"""
        )
    vfin = "\n      UNION ALL ".join(
        f"SELECT w, obj FROM vdp{k} WHERE length(w) = {k}"
        for k in range(1, _UNI_WMAX + 1)
    )
    return f"""
    WITH {_uni_ctes()},
    {_uni_usage_sql()},
    vocab2 AS MATERIALIZED (
      SELECT piece, {intlog2('usage')} AS score FROM usage
      UNION ALL
      SELECT v.piece, CAST(1 AS BIGINT) AS score
      FROM uvocab v
      WHERE length(v.piece) = 1
        AND v.piece NOT IN (SELECT piece FROM usage)
    ),
    unorm2 AS MATERIALIZED (
      SELECT {intlog2('sum(usage)')} AS nrm FROM usage
    ),
    {",".join(vdps)},
    vfinu AS (
      {vfin}
    ),
    uni2 AS (
      SELECT f.w, r.wn,
             CAST(f.obj % 64 AS INT) AS n_pieces,
             CAST(f.obj // 64 AS BIGINT) AS cost_sum
      FROM vfinu f JOIN uwrd r USING (w)
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM uvocab) AS n_vocab_r0,
      (SELECT CAST(count(*) AS BIGINT) FROM usage) AS n_pieces_used,
      (SELECT CAST(count(*) AS BIGINT) FROM vocab2) AS n_vocab_r1,
      (SELECT CAST(sum(wn * n_pieces) AS BIGINT) FROM uni)
        AS corpus_subwords_r0,
      (SELECT CAST(sum(wn * n_pieces) AS BIGINT) FROM uni2)
        AS corpus_subwords_r1,
      (SELECT CAST(sum(wn * cost_sum) AS BIGINT) FROM uni)
        AS corpus_cost_r0,
      (SELECT CAST(sum(wn * cost_sum) AS BIGINT) FROM uni2)
        AS corpus_cost_r1,
      round((SELECT CAST(sum(wn * n_pieces) AS DOUBLE) / sum(wn) FROM uni),
            6) AS fertility_r0,
      round((SELECT CAST(sum(wn * n_pieces) AS DOUBLE) / sum(wn) FROM uni2),
            6) AS fertility_r1
    """


@query("corpus_unigram_em_step", oracle=_uni_em_oracle())
def corpus_unigram_em_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    vocab, nrm, verdicts = _uni_run(spark, sf_dir)
    wrd = verdicts.select("w", "wn")

    def _pieces_kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"w": [], "wn": [], "piece": []}
            for w, wn in zip(pdf["w"], pdf["wn"]):
                _, pieces = _uni_segment(w, vocab, nrm)
                for p in pieces:
                    rows["w"].append(w)
                    rows["wn"].append(int(wn))
                    rows["piece"].append(p)
            yield pd.DataFrame(rows)

    used = wrd.mapInPandas(
        _pieces_kernel, "w string, wn bigint, piece string"
    )
    # M-step artifacts: piece usage (vocabulary-bounded — the frozen
    # control-data class) collected, re-scored, normalizer rebuilt
    usage = {
        r.piece: int(r.usage)
        for r in used.groupBy("piece")
        .agg(F.sum("wn").alias("usage"))
        .collect()
    }
    vocab2 = {p: u.bit_length() for p, u in usage.items()}
    for p, sc in vocab.items():
        if len(p) == 1 and p not in vocab2:
            vocab2[p] = 1  # coverage floor
    nrm2 = sum(usage.values()).bit_length()

    def _round1_kernel(batches):
        import pandas as pd

        for pdf in batches:
            out = {"w": [], "wn": [], "n_pieces": [], "cost_sum": []}
            for w, wn in zip(pdf["w"], pdf["wn"]):
                obj, pieces = _uni_segment(w, vocab2, nrm2)
                out["w"].append(w)
                out["wn"].append(int(wn))
                out["n_pieces"].append(obj % 64)
                out["cost_sum"].append(obj // 64)
            yield pd.DataFrame(out)

    uni2 = wrd.mapInPandas(
        _round1_kernel, "w string, wn bigint, n_pieces int, cost_sum bigint"
    )

    def agg_row(df: DataFrame, suffix: str) -> DataFrame:
        return df.agg(
            F.sum(F.col("wn") * F.col("n_pieces"))
            .cast("bigint")
            .alias(f"corpus_subwords_{suffix}"),
            F.sum(F.col("wn") * F.col("cost_sum"))
            .cast("bigint")
            .alias(f"corpus_cost_{suffix}"),
            F.round(
                F.sum(F.col("wn") * F.col("n_pieces")).cast("double")
                / F.sum("wn"),
                6,
            ).alias(f"fertility_{suffix}"),
        )
    # 1-row × 1-row audit assembly
    return (
        spark.createDataFrame(
            [(len(vocab), len(usage), len(vocab2))],
            "n_vocab_r0 bigint, n_pieces_used bigint, n_vocab_r1 bigint",
        )
        .crossJoin(agg_row(verdicts, "r0"))
        .crossJoin(agg_row(uni2, "r1"))
        .select(
            "n_vocab_r0",
            "n_pieces_used",
            "n_vocab_r1",
            "corpus_subwords_r0",
            "corpus_subwords_r1",
            "corpus_cost_r0",
            "corpus_cost_r1",
            "fertility_r0",
            "fertility_r1",
        )
    )


# --------------------------------------------------------------------------
# corpus_unigram_prune — the PRUNE step of unigram-LM training (Kudo
# 2018 §3.2 / SentencePiece's seed-shrinking loop; the EM step above
# drops pieces the segmenter never USES, this drops the least USEFUL
# of the used ones): for every used multi-char piece p, the loss delta
# if p were removed is approximated in place — each of p's usage(p)
# occurrences re-segments as p's own best Viterbi split under the
# remaining vocabulary (alt_obj, excluding only the exact piece p),
# versus keeping it whole (own_obj = its one-piece cost). The bottom
# quarter by usage·(alt_obj − own_obj) is marked pruned; single chars
# are protected (coverage). The WHOLE per-piece table — usage, both
# costs, delta, rank, verdict — is hash-gated, so the re-segmentation
# arithmetic and the ranking are pinned, not just the survivor list.
#
# Measured (sf0.01; 18 used multi-char pieces, 4 pruned): the pruned
# set is exactly the low-usage bigrams (ro/at/ta/ca, delta ≈113-121k),
# while whole-word pieces (join/batch/hash — expensive char-level alt
# splits) and the highest-usage bigrams (er/st/or, usage 2.7k) rank
# most protected — the objective separates "cheap to re-segment and
# rarely used" from both kinds of keeper, which is the behavior the
# prune step exists to have.
#
# Scale: vocabulary-sized end to end — the usage table is the
# EM-step's aggregate over distinct words; the alt-cost Viterbi runs
# over ≤64 strings of ≤8 chars (frozen-artifact control data).
# --------------------------------------------------------------------------
def _uni_prune_oracle() -> str:
    adps = [
        "adp0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS obj FROM apw)"
    ]
    for k in range(1, _UNI_LMAX + 1):
        branches = []
        for l in range(1, min(_UNI_LMAX, k) + 1):
            branches.append(
                f"""SELECT d.w, d.obj + 64 * (n.nrm - v.score) + 1 AS cand
        FROM adp{k - l} d
        JOIN uvocab v ON v.piece = substr(d.w, {k - l + 1}, {l})
                     AND v.piece <> d.w
        CROSS JOIN unorm n
        WHERE length(d.w) >= {k}"""
            )
        body = "\n        UNION ALL ".join(branches)
        adps.append(
            f"""adp{k} AS MATERIALIZED (
      SELECT w, CAST(min(cand) AS BIGINT) AS obj FROM (
        {body}
      ) GROUP BY w
    )"""
        )
    afin = "\n      UNION ALL ".join(
        f"SELECT w, obj FROM adp{k} WHERE length(w) = {k}"
        for k in range(2, _UNI_LMAX + 1)
    )
    return f"""
    WITH {_uni_ctes()},
    {_uni_usage_sql()},
    apw AS MATERIALIZED (
      SELECT piece AS w FROM usage WHERE length(piece) > 1
    ),
    {",".join(adps)},
    afin AS (
      {afin}
    ),
    pbase AS (
      SELECT u.piece, u.usage,
             64 * (n.nrm - v.score) + 1 AS own_obj,
             f.obj AS alt_obj
      FROM usage u
      JOIN uvocab v USING (piece)
      JOIN afin f ON f.w = u.piece
      CROSS JOIN unorm n
      WHERE length(u.piece) > 1
    ),
    ranked AS (
      SELECT piece, usage, own_obj, alt_obj,
             usage * (alt_obj - own_obj) AS loss_delta,
             row_number() OVER (
               ORDER BY usage * (alt_obj - own_obj), piece) AS rk,
             count(*) OVER () AS nm
      FROM pbase
    )
    SELECT piece, CAST(usage AS BIGINT) AS usage,
           CAST(own_obj AS BIGINT) AS own_obj,
           CAST(alt_obj AS BIGINT) AS alt_obj,
           CAST(loss_delta AS BIGINT) AS loss_delta,
           CAST(rk AS INT) AS rk,
           rk <= nm // 4 AS pruned
    FROM ranked
    ORDER BY rk
    """


@query("corpus_unigram_prune", oracle=_uni_prune_oracle())
def corpus_unigram_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    vocab, nrm, verdicts = _uni_run(spark, sf_dir)

    def _pieces_kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"wn": [], "piece": []}
            for w, wn in zip(pdf["w"], pdf["wn"]):
                _, pieces = _uni_segment(w, vocab, nrm)
                for p in pieces:
                    rows["wn"].append(int(wn))
                    rows["piece"].append(p)
            yield pd.DataFrame(rows)

    usage = {
        r.piece: int(r.usage)
        for r in verdicts.select("w", "wn")
        .mapInPandas(_pieces_kernel, "wn bigint, piece string")
        .groupBy("piece")
        .agg(F.sum("wn").alias("usage"))
        .collect()
    }
    rows = []
    for p, u in usage.items():
        if len(p) <= 1:
            continue
        own = 64 * (nrm - vocab[p]) + 1
        alt, _ = _uni_segment(p, {q: s for q, s in vocab.items() if q != p}, nrm)
        rows.append((p, u, own, alt, u * (alt - own)))
    rows.sort(key=lambda r: (r[4], r[0]))
    nm = len(rows)
    out = [
        (p, u, own, alt, delta, i + 1, (i + 1) <= nm // 4)
        for i, (p, u, own, alt, delta) in enumerate(rows)
    ]
    return spark.createDataFrame(
        out,
        "piece string, usage bigint, own_obj bigint, alt_obj bigint,"
        " loss_delta bigint, rk int, pruned boolean",
    ).orderBy("rk")

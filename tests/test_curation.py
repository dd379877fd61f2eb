"""Unit tests for operators/curation.py (the oracle gate covers the
registered queries; these pin operator-level edge semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_din_spark.operators.curation import (
    decontaminate_hits,
    redact_pii,
    repetition_signals,
    stratified_sample_flag,
)


def _one(spark, text):
    return (
        spark.range(1)
        .select(F.lit(text).alias("t"))
        .select(redact_pii(F.col("t")).alias("r"))
        .first()
        .r
    )


def test_redact_pii_order_and_kinds(spark):
    # email inside a URL is part of the URL match (URLs redact first)
    assert (
        _one(spark, "go to https://x.io/a@b.com?q=1 now")
        == "go to [URL] now"
    )
    assert _one(spark, "mail a.b+c@d-e.org!") == "mail [EMAIL]!"
    assert _one(spark, "call 081-234-5678.") == "call [PHONE]."
    assert _one(spark, "clean text stays") == "clean text stays"


def test_repetition_signals_flags_boilerplate(spark):
    rows = [
        (1, "spam spam spam spam spam spam spam spam"),  # dominance 1.0
        (2, "the quick brown fox jumps over a lazy dog today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert out[1].keep is False and out[1].top_tok_frac == 1.0
    assert out[2].keep is True and out[2].dup_3gram_frac == 0.0


def test_decontaminate_finds_planted_overlap(spark):
    shared = "one two three four five six seven eight"
    corpus = spark.createDataFrame(
        [(10, f"prefix {shared} suffix words here"),
         (11, "totally different content with no overlap at all ok")],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(99, f"held out {shared} benchmark")], "doc_id long, text string"
    )
    hits = {r.doc_id: r.n_hits for r in
            decontaminate_hits(corpus, eval_docs, n=8).collect()}
    assert 10 in hits and 11 not in hits


def test_stratified_flag_deterministic_and_stratified(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)],
        "doc_id long, lang string",
    )
    flag = stratified_sample_flag(
        F.col("lang"), F.col("doc_id"), {"en": 100, "zh": 500}
    )
    a = df.filter(flag).groupBy("lang").count().collect()
    b = df.filter(flag).groupBy("lang").count().collect()  # rerun: identical
    ra = {r.lang: r["count"] for r in a}
    assert ra == {r.lang: r["count"] for r in b}
    # 1000 docs per stratum at 10% vs 50%: rates must separate clearly
    assert 50 < ra["en"] < 200
    assert 400 < ra["zh"] < 600


def test_pack_sequences_sharding_invariants(spark):
    from data_ingestion_din_spark.operators.curation import pack_sequences
    from data_ingestion_din_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang", "text"
    )
    unsharded = pack_sequences(docs, budget=512)
    base_totals = {
        r.lang: (r.docs, r.toks)
        for r in unsharded.groupBy("lang")
        .agg(
            F.sum("n_docs").alias("docs"), F.sum("total_tokens").alias("toks")
        )
        .collect()
    }
    for n_shards in (1, 4):
        sharded = pack_sequences(
            docs.withColumn("shard", F.col("doc_id") % n_shards),
            budget=512,
            shard_col="shard",
        )
        # every doc packed exactly once whatever the shard count
        totals = {
            r.lang: (r.docs, r.toks)
            for r in sharded.groupBy("lang")
            .agg(
                F.sum("n_docs").alias("docs"),
                F.sum("total_tokens").alias("toks"),
            )
            .collect()
        }
        assert totals == base_totals
        # no multi-doc sequence straddles the budget
        assert (
            sharded.filter(
                (F.col("n_docs") > 1) & (F.col("total_tokens") > 512)
            ).count()
            == 0
        )
    # single-shard packing ≡ unsharded packing, row for row
    one = pack_sequences(
        docs.withColumn("shard", F.lit(0)), budget=512, shard_col="shard"
    ).drop("shard")
    assert one.exceptAll(unsharded).count() == 0
    assert unsharded.exceptAll(one).count() == 0


def test_dsir_select_matches_pure_python(spark):
    """corpus_dsir_select's quantized importance weight, re-derived by an
    independent pure-Python implementation over the same fixture."""
    import hashlib

    import pandas as pd

    from data_ingestion_din_spark.plans.curation_queries import (
        _DSIR_B,
        _DSIR_TARGET,
        _DSIR_TOPK,
        corpus_dsir_select,
    )

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet")

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def intlog2(x: int) -> int:
        return x.bit_length()

    db: dict[tuple[int, str, int], int] = {}
    for _, row in docs.iterrows():
        toks = [t for t in row.text.split(" ") if t]
        grams = toks + [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]
        for g in grams:
            k = (row.doc_id, row.source, h64(g) % _DSIR_B)
            db[k] = db.get(k, 0) + 1
    t_n: dict[int, int] = {}
    r_n: dict[int, int] = {}
    for (_, src, bkt), n in db.items():
        side = t_n if src in _DSIR_TARGET else r_n
        side[bkt] = side.get(bkt, 0) + n
    t_tot, r_tot = sum(t_n.values()), sum(r_n.values())
    const = intlog2(r_tot + _DSIR_B) - intlog2(t_tot + _DSIR_B)
    weights: dict[int, int] = {}
    for (doc_id, src, bkt), n in db.items():
        if src in _DSIR_TARGET:
            continue
        qlr = intlog2(t_n.get(bkt, 0) + 1) - intlog2(r_n[bkt] + 1)
        weights[doc_id] = weights.get(doc_id, 0) + n * (qlr + const)
    expect = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))
    expect = expect[:_DSIR_TOPK]

    got = [
        (r.doc_id, r.weight, r.rk)
        for r in corpus_dsir_select(spark, sf).collect()
    ]
    assert got == [
        (doc_id, w, i + 1) for i, (doc_id, w) in enumerate(expect)
    ]


def test_pack_bins_order_reset_and_overflow(spark):
    """The generic walker behind corpus_compaction_ab: bins never
    straddle the budget, an over-budget item gets its own bin, and the
    caller's ordering is honored (size-desc packs differently than
    arrival on the same items)."""
    from pyspark.sql import functions as F

    from data_ingestion_din_spark.operators.curation import pack_bins

    rows = [(0, i, n) for i, n in enumerate([60, 60, 100, 10, 120, 30])]
    base = spark.createDataFrame(rows, "grp bigint, doc_id int, n bigint")

    arrival = {
        (r.bin_id): (r.n_items, r.total_n)
        for r in pack_bins(base, [F.col("doc_id")], 100).collect()
    }
    # 60 | 60+10(? no: 60+60>100 → flush) — walk: [60], [60,? 60+100>100
    # → flush], [100 exactly? 100 > budget? == budget fits], ...
    # arrival: [60] [60] [100] [10,? +120>100 → [10]] [120] [30]
    assert arrival == {
        1: (1, 60),
        2: (1, 60),
        3: (1, 100),
        4: (1, 10),
        5: (1, 120),  # over-budget item = its own bin
        6: (1, 30),
    }
    sizedesc = {
        (r.bin_id): (r.n_items, r.total_n)
        for r in pack_bins(
            base, [F.col("n").desc(), F.col("doc_id")], 100
        ).collect()
    }
    # desc order 120,100,60,60,30,10: [120] [100] [60,? +60>100 → flush]
    # [60,30,10]
    assert sizedesc == {
        1: (1, 120),
        2: (1, 100),
        3: (1, 60),
        4: (3, 100),
    }

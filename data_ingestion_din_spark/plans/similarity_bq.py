"""Binary quantization (1-bit-per-dimension) vector search — the
extreme end of the compression axis the family already measures (SQ8 =
8 bits/dim, PQ = 2 bits/dim here, MRL = fewer dims): each vector
becomes ONE 64-bit code (sign of each dimension), 32× smaller than the
float vector, searched either symmetrically (Hamming distance between
codes — pure bit ops) or asymmetrically (the full-precision query
dotted against the candidate's signs — the Qdrant/pgvector serving
upgrade that costs nothing extra at query time), each with and without
the exact-rerank stage every production BQ deployment runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_din_spark.functions.vectors import quantize
from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.plans.similarity_queries import (
    _DIMS_UB,
    _SWEEP_N,
    _etop_staged,
    _recall_row,
)
from data_ingestion_din_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# similarity_bq_recall_grid — four hash-gated rows over the staged
# 20-probe exact truth:
#   ham@10      — Hamming top-10 of the codes (pure binary search);
#   ham@50+rr   — Hamming top-50 shortlist, exact cosine rerank;
#   asym@10     — top-10 by Σ qv_q[i]·sign(d[i]) (asymmetric dot);
#   asym@50+rr  — its rerank form.
# Bit 63 rides the BIGINT sign (two's complement weight −2^63, the
# simhash convention); Hamming = bit_count(xor), the asymmetric score
# reads each sign back out of the packed code — the CODE is the only
# index-side artifact either arm touches, as in production.
#
# Measured (sf0.01, 20-probe recall@10): ham 0.27 / asym 0.38 raw;
# with the C=50 exact rerank ham 0.66 / asym 0.84. Both production
# claims reproduce: the asymmetric upgrade is worth +110‰ raw and
# +180‰ reranked at zero extra index bytes, and rerank is the bigger
# lever (×2.2-2.4). On the family's recall-per-byte table BQ lands at
# 8 B/vector = 0.84 (reranked) between SQ8's 64 B = 1.000 and PQ's
# 2 B = 0.235 — the compression sweet spot the 2024 vector stores
# ship as their default.
#
# Scale: codes are 8 bytes/vector; both scorings are one corpus scan
# of bit arithmetic; the rerank touches C×20 exact cosines. The grid
# slots BQ into the family's recall-per-byte table next to SQ8 (64 B,
# 1.000) and PQ (2 B here, 0.235-at-C=20).
# --------------------------------------------------------------------------
_BQ_RERANK_C = 50


def _bq_code_sql(src: str) -> str:
    terms = []
    for b in range(64):
        w = (
            "(-9223372036854775807 - 1)"
            if b == 63
            else f"CAST({1 << b} AS BIGINT)"
        )
        terms.append(f"(CASE WHEN {src}[{b + 1}] > 0 THEN {w} ELSE 0 END)")
    return " + ".join(terms)


def _bq_oracle() -> str:
    from data_ingestion_din_spark.functions.vectors import cosine_exact_sql

    asym = (
        f"list_sum(list_transform(range(1, {_DIMS_UB}), i -> "
        "CASE WHEN ((c.code >> (i - 1)) & 1) = 1 OR (i = 64 AND c.code < 0)"
        " THEN p.qv[i] ELSE -p.qv[i] END))"
    )
    arms = []
    for arm, rankcte, c in (
        ("ham@10", "hrank", 10),
        ("ham@50+rr", "hrank", _BQ_RERANK_C),
        ("asym@10", "arank", 10),
        ("asym@50+rr", "arank", _BQ_RERANK_C),
    ):
        rr = "+rr" in arm
        tag = arm.replace("@", "_").replace("+", "_")
        if rr:
            arms.append(
                f"""it_{tag} AS MATERIALIZED (
      SELECT probe, vec_id FROM (
        SELECT s.probe, s.vec_id,
               row_number() OVER (
                 PARTITION BY s.probe
                 ORDER BY {cosine_exact_sql('e.embedding', 'pe.embedding')}
                          DESC, s.vec_id) AS rk2
        FROM (SELECT probe, vec_id FROM {rankcte}
              WHERE rk <= {c}) s
        JOIN embeddings e ON e.vec_id = s.vec_id
        JOIN embeddings pe ON pe.vec_id = s.probe
      ) WHERE rk2 <= 10
    )"""
            )
        else:
            arms.append(
                f"""it_{tag} AS MATERIALIZED (
      SELECT probe, vec_id FROM {rankcte} WHERE rk <= 10
    )"""
            )
    rows = []
    for arm in ("ham@10", "ham@50+rr", "asym@10", "asym@50+rr"):
        tag = arm.replace("@", "_").replace("+", "_")
        rows.append(
            f"""SELECT '{arm}' AS arm,
             (SELECT count(*) FROM etop) AS n_exact_total,
             (SELECT count(*) FROM it_{tag} i
              JOIN etop t ON t.probe = i.probe AND t.vec_id = i.vec_id)
               AS n_overlap_total"""
        )
    body = "\n      UNION ALL\n      ".join(rows)
    return f"""
    WITH gq AS MATERIALIZED (
      SELECT vec_id,
             list_transform(
               embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
             ) AS qv
      FROM embeddings
    ),
    codes AS MATERIALIZED (
      SELECT vec_id, CAST({_bq_code_sql('qv')} AS BIGINT) AS code
      FROM gq
    ),
    probes AS MATERIALIZED (
      SELECT g.vec_id AS probe, g.qv, c.code
      FROM gq g JOIN codes c USING (vec_id)
      WHERE g.vec_id < {_SWEEP_N}
    ),
    hrank AS MATERIALIZED (
      SELECT p.probe, c.vec_id,
             row_number() OVER (
               PARTITION BY p.probe
               ORDER BY bit_count(CAST(xor(p.code, c.code) AS BIT)),
                        c.vec_id) AS rk
      FROM probes p JOIN codes c ON c.vec_id <> p.probe
    ),
    arank AS MATERIALIZED (
      SELECT p.probe, c.vec_id,
             row_number() OVER (
               PARTITION BY p.probe
               ORDER BY {asym} DESC, c.vec_id) AS rk
      FROM probes p JOIN codes c ON c.vec_id <> p.probe
    ),
    ex AS (
      SELECT p.probe, e.vec_id,
             {cosine_exact_sql('e.embedding', 'pe.embedding')} AS cos
      FROM embeddings e
      CROSS JOIN (SELECT vec_id AS probe FROM embeddings
                  WHERE vec_id < {_SWEEP_N}) p
      JOIN embeddings pe ON pe.vec_id = p.probe
      WHERE e.vec_id <> p.probe
    ),
    etop AS MATERIALIZED (
      SELECT probe, vec_id FROM (
        SELECT probe, vec_id, row_number() OVER (
          PARTITION BY probe ORDER BY cos DESC, vec_id) AS rk
        FROM ex
      ) WHERE rk <= 10
    ),
    {",".join(arms)}
    SELECT arm,
           CAST({_SWEEP_N} AS BIGINT) AS n_probes,
           CAST(n_exact_total AS BIGINT) AS n_exact_total,
           CAST(n_overlap_total AS BIGINT) AS n_overlap_total,
           round(CAST(n_overlap_total AS DOUBLE) / n_exact_total, 6)
             AS mean_recall
    FROM ({body})
    ORDER BY arm
    """


@query("similarity_bq_recall_grid", oracle=_bq_oracle())
def similarity_bq_recall_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from data_ingestion_din_spark.functions.vectors import cosine_exact

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select("vec_id", quantize(F.col("embedding")).alias("qv"))

    def code_col() -> F.Column:
        acc = F.lit(0).cast("bigint")
        for b in range(64):
            w = (
                F.lit(-9223372036854775807 - 1)
                if b == 63
                else F.lit(1 << b).cast("bigint")
            )
            acc = acc + F.when(
                F.element_at("qv", b + 1) > 0, w
            ).otherwise(F.lit(0).cast("bigint"))
        return acc

    codes = qv.select(
        "vec_id", code_col().cast("bigint").alias("code")
    ).localCheckpoint(eager=True)
    probes = F.broadcast(
        qv.filter(F.col("vec_id") < _SWEEP_N)
        .join(codes, "vec_id")
        .select(
            F.col("vec_id").alias("probe"),
            F.col("qv").alias("pqv"),
            F.col("code").alias("pcode"),
        )
    )
    # the asymmetric score reads signs back out of the packed code —
    # +qv for a set bit, −qv otherwise (bit 63 = the BIGINT sign)
    asym = F.expr(
        "aggregate(sequence(1, 64), CAST(0 AS BIGINT), (acc, i) -> "
        "acc + CASE WHEN ((code >> (i - 1)) & 1) = 1"
        " OR (i = 64 AND code < 0)"
        " THEN element_at(pqv, i) ELSE -element_at(pqv, i) END)"
    )
    scored = (
        codes.crossJoin(probes)
        .filter(F.col("vec_id") != F.col("probe"))
        .select(
            "probe",
            "vec_id",
            F.bit_count(
                F.col("pcode").bitwiseXOR(F.col("code"))
            ).alias("ham"),
            asym.alias("adot"),
        )
        .localCheckpoint(eager=True)
    )
    wham = W.partitionBy("probe").orderBy("ham", "vec_id")
    wasym = W.partitionBy("probe").orderBy(F.desc("adot"), "vec_id")
    etop = _etop_staged(spark, sf_dir)
    pemb = F.broadcast(
        emb.filter(F.col("vec_id") < _SWEEP_N).select(
            F.col("vec_id").alias("probe"),
            F.col("embedding").alias("p_embedding"),
        )
    )
    wtop = W.partitionBy("probe").orderBy(F.desc("cos"), "vec_id")
    grid = None
    for arm, w, c in (
        ("ham@10", wham, 10),
        ("ham@50+rr", wham, _BQ_RERANK_C),
        ("asym@10", wasym, 10),
        ("asym@50+rr", wasym, _BQ_RERANK_C),
    ):
        sh = (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= c)
            .select("probe", "vec_id")
        )
        if "+rr" in arm:
            itop = (
                sh.join(emb.select("vec_id", "embedding"), "vec_id")
                .join(pemb, "probe")
                .select(
                    "probe",
                    "vec_id",
                    cosine_exact(
                        F.col("embedding"), F.col("p_embedding")
                    ).alias("cos"),
                )
                .withColumn("rk2", F.row_number().over(wtop))
                .filter(F.col("rk2") <= 10)
                .select("probe", "vec_id")
            )
        else:
            itop = sh
        row = _recall_row(etop, itop, F.lit(arm).alias("arm"))
        grid = row if grid is None else grid.unionByName(row)
    return grid.orderBy("arm")

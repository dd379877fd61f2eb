"""pipeline_e2e — the full ingest→index→serve lifecycle under ONE gate.

The reference's batch lifecycle (`scripts/run_all.py:27-73` chaining
ingestion → cleaning → enrichment, then `backend/scripts/ingest_doc.py:
128-186` chunking + indexing, then the `/ask` serve path
`backend/services/rag.py:492-653`) hands JSON files between stages; here
the whole chain is one lazy Spark DAG over stage tables, and every stage
contract is the SAME operator the standalone gates check:

  1. S10 scan        — ``documents`` parquet → derived ``text_blocks``
                       entity (sources/entities.py).
  2. W1–W4 blocks    — reading order, noise banding, page-median font,
                       heading detection, section propagation
                       (operators/blocks.py; gated by blocks_*).
  3. W5 chunking     — section/budget semantic chunk walk with
                       content-addressed chunk ids (operators/chunking.py;
                       gated by doc_semantic_chunks).
  4. U4 dedup        — md5-fingerprint dedup across the WHOLE chunk
                       corpus, lowest (doc_id, chunk_seq) wins
                       (first-match-wins priority, SURVEY.md §7.4.2;
                       gated standalone by dedup_exact).
  5. Embed + index   — unique chunks join the embedding table on
                       doc_id = vec_id (the L11 kernel is the container
                       boundary; the fixture embeddings ARE the
                       deterministic stand-in, as for the whole
                       similarity family). The joined relation is the
                       vector-index table (K3/K4: index = DataFrame).
  6. O3 serve        — exact-cosine top-10 chunks for probe vec_id=0
                       (gated standalone by similarity_topk).

The oracle chains each stage's EXISTING oracle verbatim: the text-block
CTEs + block-pipeline CTEs (plans/doc_blocks._PIPE_CTES), the recursive
chunk walk (plans/chunk_queries.CHUNK_CTES), a row_number dedup, the
embeddings join and the quantized-integer cosine — so a hash match here
proves the stage CONTRACTS compose, doc → chunk → index → serve, not
just that each stage works in isolation.

Output lineage coverage: ``chunk_id`` is content-addressed
(``{doc_id}::{md5(content)[:8]}``), so the hash covers every upstream
text transformation; ``n_chunks_total`` / ``n_chunks_unique`` pin the
corpus-wide chunk and dedup cardinalities onto every row.

Scale shape: one doc_id shuffle for the chunk walk (shared via an eager
localCheckpoint by the dedup window, the counts aggregate and the serve
join), one content_fp shuffle for the dedup window, one doc_id equi-join
against the embedding table, a 1-row broadcast probe, and a top-10
TakeOrderedAndProject — no corpus-sized collect, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from data_ingestion_din_spark.functions.vectors import (
    cosine_exact,
    cosine_exact_sql,
)
from data_ingestion_din_spark.operators.blocks import (
    detect_headings,
    flag_header_footer_noise,
    page_font_median,
    propagate_sections,
    reading_order,
)
from data_ingestion_din_spark.operators.chunking import semantic_chunks
from data_ingestion_din_spark.plans.chunk_queries import CHUNK_CTES
from data_ingestion_din_spark.plans.doc_blocks import _PIPE_CTES
from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.sources.entities import text_blocks
from data_ingestion_din_spark.sources.tables import load_table


@query(
    "pipeline_e2e",
    oracle=f"""{_PIPE_CTES},
    {CHUNK_CTES},
    chunk_rows AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
             CAST(chunk_seq AS INT) AS chunk_seq,
             doc_id || '::' || substr(md5(content), 1, 8) AS chunk_id,
             section,
             md5(content) AS content_fp
      FROM chunks
    ),
    uniq AS (
      SELECT doc_id, chunk_seq, chunk_id, section FROM (
        SELECT *,
               row_number() OVER (PARTITION BY content_fp
                                  ORDER BY doc_id, chunk_seq) AS rn
        FROM chunk_rows)
      WHERE rn = 1
    ),
    counts AS (
      SELECT CAST(count(*) AS BIGINT) AS n_chunks_total,
             CAST(count(DISTINCT content_fp) AS BIGINT) AS n_chunks_unique
      FROM chunk_rows
    ),
    served AS (
      SELECT u.chunk_id, u.doc_id, u.chunk_seq, u.section,
             {cosine_exact_sql('e.embedding', 'q.embedding')} AS score
      FROM uniq u
      JOIN embeddings e ON e.vec_id = u.doc_id,
           (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      WHERE u.doc_id <> 0
      ORDER BY score DESC, chunk_id, doc_id, chunk_seq
      LIMIT 10
    )
    SELECT CAST(row_number() OVER (ORDER BY score DESC, chunk_id,
                                   doc_id, chunk_seq) AS INT) AS rank,
           chunk_id, doc_id, chunk_seq, section, score,
           n_chunks_total, n_chunks_unique
    FROM served, counts
    ORDER BY rank
    """,
)
def pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stages 1-3: scan → block pipeline → semantic chunks (the exact
    # operator chain doc_semantic_chunks gates)
    b = reading_order(text_blocks(spark, sf_dir))
    b = flag_header_footer_noise(b)
    b = page_font_median(b)
    b = detect_headings(b)
    b = propagate_sections(b)
    chunk_rows = (
        semantic_chunks(b.filter(~F.col("noise")))
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("chunk_seq").cast("int").alias("chunk_seq"),
            "chunk_id",
            "section",
            "content_fp",
        )
        # three consumers below (dedup window, counts, serve join) —
        # stage the walk once instead of re-running it per consumer;
        # lazy: materializes inside the final action's first consumer
        .localCheckpoint(eager=False)
    )
    # stage 4: U4 fingerprint dedup, lowest (doc_id, chunk_seq) wins
    wd = W.partitionBy("content_fp").orderBy("doc_id", "chunk_seq")
    uniq = (
        chunk_rows.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select("doc_id", "chunk_seq", "chunk_id", "section")
    )
    counts = chunk_rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks_total"),
        F.countDistinct("content_fp").cast("bigint").alias("n_chunks_unique"),
    )
    # stage 5: embed join — the index table (K3/K4: index = DataFrame)
    emb = load_table(spark, sf_dir, "embeddings")
    probe = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("q_embedding"))
    )
    index = uniq.filter(F.col("doc_id") != 0).join(
        emb.select("vec_id", "embedding"),
        uniq["doc_id"] == emb["vec_id"],
    )
    # stage 6: O3 serve — exact-cosine top-10 against the broadcast probe
    served = (
        index.crossJoin(F.broadcast(probe))
        .select(
            "chunk_id",
            "doc_id",
            "chunk_seq",
            "section",
            cosine_exact(F.col("embedding"), F.col("q_embedding")).alias(
                "score"
            ),
        )
        .orderBy(F.desc("score"), "chunk_id", "doc_id", "chunk_seq")
        .limit(10)
    )
    wr = W.orderBy(F.desc("score"), "chunk_id", "doc_id", "chunk_seq")
    return (
        served.withColumn("rank", F.row_number().over(wr).cast("int"))
        .crossJoin(F.broadcast(counts))
        .select(
            "rank",
            "chunk_id",
            "doc_id",
            "chunk_seq",
            "section",
            "score",
            "n_chunks_total",
            "n_chunks_unique",
        )
        .orderBy("rank")
    )

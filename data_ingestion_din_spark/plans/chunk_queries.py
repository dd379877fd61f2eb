"""Semantic chunking query (W5) with a recursive-CTE oracle.

The running-char-budget break makes W5 the one operator that is not a
plain window (SURVEY.md §7.4.1) — Spark runs it as applyInPandas per doc;
DuckDB checks it with a RECURSIVE CTE that walks the same ordered blocks
carrying (group, cum) state. Recursion depth = max blocks per doc."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_din_spark.operators.blocks import (
    detect_headings,
    flag_header_footer_noise,
    page_font_median,
    propagate_sections,
    reading_order,
)
from data_ingestion_din_spark.operators.chunking import semantic_chunks
from data_ingestion_din_spark.plans.doc_blocks import _PIPE_CTES
from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.sources.entities import text_blocks


# Shared oracle CTE chain for the W5 walk (numbered -> walk -> chunks):
# factored out so composed pipelines (plans/pipeline_e2e.py) chain the
# SAME chunk derivation the standalone gate checks.
CHUNK_CTES = f"""numbered AS MATERIALIZED (
      SELECT doc_id, content, section, heading_level,
             row_number() OVER (PARTITION BY doc_id ORDER BY page, ord) AS rn
      FROM sectioned WHERE NOT noise
    ),
    walk AS (
      -- recursive walk carrying (chunk seq, running chars) per doc
      WITH RECURSIVE w AS (
        SELECT doc_id, rn, content, section,
               1 AS seq, length(content) AS cum
        FROM numbered WHERE rn = 1
        UNION ALL
        SELECT b.doc_id, b.rn, b.content, b.section,
               CASE WHEN coalesce(b.section, '') <> coalesce(w.section, '')
                         OR b.heading_level = 'H1'
                         OR w.cum + 1 + length(b.content) > 1200
                    THEN w.seq + 1 ELSE w.seq END,
               CASE WHEN coalesce(b.section, '') <> coalesce(w.section, '')
                         OR b.heading_level = 'H1'
                         OR w.cum + 1 + length(b.content) > 1200
                    THEN length(b.content)
                    ELSE w.cum + 1 + length(b.content) END
        FROM w JOIN numbered b
          ON b.doc_id = w.doc_id AND b.rn = w.rn + 1
      )
      SELECT * FROM w
    ),
    chunks AS (
      SELECT doc_id, seq AS chunk_seq,
             string_agg(content, chr(10) ORDER BY rn) AS content,
             min(section) AS section,
             CAST(count(*) AS INT) AS n_blocks
      FROM walk
      GROUP BY doc_id, seq
    )"""


@query(
    "doc_semantic_chunks",
    oracle=f"""{_PIPE_CTES},
    {CHUNK_CTES}
    SELECT doc_id,
           CAST(chunk_seq AS INT) AS chunk_seq,
           doc_id || '::' || substr(md5(content), 1, 8) AS chunk_id,
           section,
           n_blocks,
           CAST(length(content) AS INT) AS n_chars,
           md5(content) AS content_fp
    FROM chunks
    ORDER BY doc_id, chunk_seq
    """,
)
def doc_semantic_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 (backend/services/chunking.py:216-298): section-aware chunk
    grouping with a 1200-char budget; content-addressed chunk ids
    (chunking.py:401-415). The only pandas stage in the batch engine."""
    b = reading_order(text_blocks(spark, sf_dir))
    b = flag_header_footer_noise(b)
    b = page_font_median(b)
    b = detect_headings(b)
    b = propagate_sections(b)
    chunks = semantic_chunks(b.filter(~F.col("noise")))
    return chunks.select(
        "doc_id",
        "chunk_seq",
        "chunk_id",
        "section",
        "n_blocks",
        "n_chars",
        "content_fp",
    ).orderBy("doc_id", "chunk_seq")

"""Text-block pipeline queries (SURVEY.md §2.6 W1-W4, §2.3 F2, §2.5 A1)
over the derived ``text_blocks`` entity table (sources/entities.py).

Each query drives the operators in operators/blocks.py and carries a
DuckDB oracle that re-states the SAME dataflow in SQL window functions —
reading order, noise banding, exact page-median font, heading thresholds,
running-section propagation and the sessionized adjacent merge are all
checked value-for-value.

Scale notes: the whole pipeline is one hash shuffle on (doc_id[, page]) —
every window reuses the same partitioning; no driver state, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_din_spark.operators.blocks import (
    block_pipeline,
    detect_headings,
    flag_header_footer_noise,
    page_font_median,
    propagate_sections,
    reading_order,
)
from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.sources.entities import TEXT_BLOCKS_CTES, text_blocks

# Shared oracle CTE chain: geometry → ord/noise → median → headings →
# sections. Mirrors operators/blocks.py stage for stage.
_PIPE_CTES = f"""WITH {TEXT_BLOCKS_CTES},
b AS (
  SELECT doc_id, id, page, content, font_size, intent,
         x0, y0, x0 + 230 AS x1, y0 + 14 AS y1,
         row_number() OVER (PARTITION BY doc_id, page
                            ORDER BY floor(y0 / 12), x0, id) AS ord,
         (y0 + 14 < 0.07 * 842) OR (y0 > 0.93 * 842) AS noise
  FROM text_blocks
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY doc_id, page
                            ORDER BY font_size, id) AS _rn,
         count(*) OVER (PARTITION BY doc_id, page) AS _n
  FROM b
),
med AS (
  SELECT doc_id, page, avg(font_size) AS page_median_font
  FROM ranked
  WHERE _rn = floor((_n + 1) / 2) OR _rn = floor((_n + 2) / 2)
  GROUP BY doc_id, page
),
headed AS (
  SELECT b.*, med.page_median_font,
         CASE
           WHEN length(content) < 200
                AND NOT regexp_matches(content, '^[\\d\\s\\.,%-]+$')
                AND font_size / page_median_font > 1.2
           THEN CASE WHEN font_size / page_median_font > 1.5
                     THEN 'H1' ELSE 'H2' END
         END AS heading_level
  FROM b JOIN med USING (doc_id, page)
),
sectioned AS (
  SELECT *,
         last_value(CASE WHEN heading_level IS NOT NULL THEN content END
                    IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY page, ord
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS section
  FROM headed
)"""


@query(
    "blocks_reading_order",
    oracle=f"""{_PIPE_CTES}
    SELECT doc_id, id, page, CAST(ord AS BIGINT) AS ord, noise
    FROM b
    ORDER BY doc_id, page, ord
    """,
)
def blocks_reading_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 + F2: row-major reading order with 12 px line tolerance
    (2-column pages interleave) and header/footer noise banding."""
    b = flag_header_footer_noise(reading_order(text_blocks(spark, sf_dir)))
    return b.select(
        "doc_id",
        "id",
        "page",
        F.col("ord").cast("bigint").alias("ord"),
        "noise",
    ).orderBy("doc_id", "page", "ord")


@query(
    "blocks_sections",
    oracle=f"""{_PIPE_CTES}
    SELECT doc_id, id, heading_level, section, page_median_font
    FROM sectioned
    WHERE NOT noise
    ORDER BY doc_id, id
    """,
)
def blocks_sections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + W2 + W3: exact per-page median font, heading thresholds
    (1.2× / 1.5× median), running-section inheritance across pages."""
    b = reading_order(text_blocks(spark, sf_dir))
    b = flag_header_footer_noise(b)
    b = page_font_median(b)
    b = detect_headings(b)
    b = propagate_sections(b)
    return (
        b.filter(~F.col("noise"))
        .select("doc_id", "id", "heading_level", "section", "page_median_font")
        .orderBy("doc_id", "id")
    )


@query(
    "blocks_merged",
    oracle=f"""{_PIPE_CTES},
    kept AS (SELECT * FROM sectioned WHERE NOT noise),
    lagged AS (
      SELECT *,
             lag(section) OVER w AS prev_section,
             lag(y1) OVER w AS prev_y1,
             lag(font_size) OVER w AS prev_font
      FROM kept
      WINDOW w AS (PARTITION BY doc_id, page ORDER BY ord)
    ),
    flagged AS (
      SELECT *,
             (prev_section IS NULL OR section <> prev_section
              OR heading_level IS NOT NULL
              OR (y0 - prev_y1) < -5.0 OR (y0 - prev_y1) > 15.0
              OR abs(font_size - prev_font) >= 1.5) AS brk
      FROM lagged
    ),
    grouped AS (
      SELECT *,
             sum(CASE WHEN brk IS NULL OR brk THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id, page ORDER BY ord
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS merge_group
      FROM flagged
    )
    SELECT doc_id, page,
           min(id) AS id,
           CAST(count(*) AS BIGINT) AS n_merged,
           min(section) AS section,
           md5(string_agg(content, chr(10) ORDER BY ord)) AS content_fp,
           min(x0) AS x0, min(y0) AS y0, max(x1) AS x1, max(y1) AS y1,
           avg(font_size) AS avg_font,
           coalesce(array_to_string(
             list_sort(list_distinct(flatten(list(intent ORDER BY ord)))), ','
           ), '') AS intents
    FROM grouped
    GROUP BY doc_id, page, merge_group
    ORDER BY doc_id, page, id
    """,
)
def blocks_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 (full pipeline): sessionized adjacent-block merge — dense pages
    merge successive lines; headings, section changes, large gaps and font
    jumps break groups."""
    merged = block_pipeline(text_blocks(spark, sf_dir))
    return merged.select(
        "doc_id",
        "page",
        "id",
        F.col("n_merged").cast("bigint").alias("n_merged"),
        "section",
        F.md5(F.col("content")).alias("content_fp"),
        F.element_at("bbox", 1).alias("x0"),
        F.element_at("bbox", 2).alias("y0"),
        F.element_at("bbox", 3).alias("x1"),
        F.element_at("bbox", 4).alias("y1"),
        F.col("font_size").alias("avg_font"),
        F.array_join(F.array_sort(F.col("intent")), ",").alias("intents"),
    ).orderBy("doc_id", "page", "id")

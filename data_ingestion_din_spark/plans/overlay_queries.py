"""K8 — debug-overlay geometry (scripts/visualize_result.py:12-73).

The reference's last unported component draws per-page bounding-box
overlays onto rasterized PDF pages: text boxes in green (line width
0.5), table boxes in red (width 2, label ``TBL:<id>``), image boxes in
blue (width 2, label ``IMG:<id>``), each label inserted at
``(x0, y0 - 2)`` in font size 6 (visualize_result.py:13-26 draw_rects).

Engine restatement: the overlay GEOMETRY is a pure DataFrame — one row
per drawn rectangle carrying page, draw order (text under table under
image, the reference's layering at visualize_result.py:58-66),
rectangle corners, RGB color, line width, label text and label anchor.
Rasterizing those rows onto a PNG is the only part that needs an image
library and stays a documented container boundary exactly like
``decode_media`` (sources/binary.py); everything a renderer needs is in
the rows.

Layers:
- text: the ``text_blocks`` entity's real bbox (sources/entities.py
  geometry model); labels are the bare block id (the reference calls
  draw_rects with the default empty prefix for texts).
- table: ``table_blocks`` has no bbox fixture column, so the overlay
  derives one deterministically from the table id hash — same
  integer/md5 arithmetic recipe as every derived entity (FIXTURES.md
  §B), mirrored in the oracle.
- image: the fixture ships no per-page image entity; ~1/3 of
  (doc, page) slots get one hash-placed image box (the ``IMG:`` layer
  plumbing, exercised end-to-end).

Scale: three narrow scans unioned, zero joins, zero Python — the
overlay for a 100 TB corpus is a straight map over the entity tables
and partitions by whatever the entity tables partition by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_din_spark.functions.hashing import h64, h64_sql
from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.sources.entities import (
    TABLE_BLOCKS_CTES,
    TEXT_BLOCKS_CTES,
    table_blocks,
    text_blocks,
)
from data_ingestion_din_spark.sources.tables import load_table

# visualize_result.py:8-10 — (R, G, B) per layer, as CSS-ish names plus
# the exact float triple the reference passes to draw_rect.
LAYER_STYLE = {
    "text": ("green", 0.5, ""),
    "table": ("red", 2.0, "TBL:"),
    "image": ("blue", 2.0, "IMG:"),
}
LABEL_FONT_SIZE = 6.0


def _style_cols(kind: str, item_id, x0, y0, x1, y1):
    color, width, prefix = LAYER_STYLE[kind]
    label = F.concat(F.lit(prefix), item_id)
    return [
        F.lit(kind).alias("kind"),
        F.lit(["text", "table", "image"].index(kind)).alias("draw_order"),
        item_id.alias("item_id"),
        x0.cast("double").alias("x0"),
        y0.cast("double").alias("y0"),
        x1.cast("double").alias("x1"),
        y1.cast("double").alias("y1"),
        F.lit(color).alias("color"),
        F.lit(width).alias("line_width"),
        label.alias("label"),
        x0.cast("double").alias("label_x"),
        (y0 - 2).cast("double").alias("label_y"),
        F.lit(LABEL_FONT_SIZE).alias("label_font_size"),
    ]


_H_TBBOX = h64_sql("id || ':bbox'")
_H_IMG = h64_sql("doc_id || ':img' || CAST(page AS VARCHAR)")

_OVERLAY_COLS = (
    "doc_id, page, kind, draw_order, item_id, x0, y0, x1, y1, color, "
    "line_width, label, label_x, label_y, label_font_size"
)


@query(
    "overlay_boxes",
    oracle=f"""
    WITH {TEXT_BLOCKS_CTES}, {TABLE_BLOCKS_CTES},
    txt AS (
      SELECT doc_id, page, 'text' AS kind, 0 AS draw_order, id AS item_id,
             x0, y0, x0 + 230 AS x1, y0 + 14 AS y1,
             'green' AS color, 0.5 AS line_width, id AS label,
             x0 AS label_x, y0 - 2 AS label_y, 6.0 AS label_font_size
      FROM text_blocks
    ),
    tbl AS (
      SELECT doc_id, page, 'table' AS kind, 1 AS draw_order, id AS item_id,
             CAST(40 + ({_H_TBBOX}) % 5 * 90 AS DOUBLE) AS x0,
             CAST(300 + ({_H_TBBOX}) % 7 * 60 AS DOUBLE) AS y0,
             CAST(40 + ({_H_TBBOX}) % 5 * 90 + 320 AS DOUBLE) AS x1,
             CAST(300 + ({_H_TBBOX}) % 7 * 60 + 90 AS DOUBLE) AS y1,
             'red' AS color, 2.0 AS line_width, 'TBL:' || id AS label,
             CAST(40 + ({_H_TBBOX}) % 5 * 90 AS DOUBLE) AS label_x,
             CAST(300 + ({_H_TBBOX}) % 7 * 60 - 2 AS DOUBLE) AS label_y,
             6.0 AS label_font_size
      FROM table_blocks
    ),
    img_seed AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, unnest([1, 2]) AS page
      FROM documents
    ),
    img AS (
      SELECT doc_id, page, 'image' AS kind, 2 AS draw_order,
             'img_' || doc_id || '_' || CAST(page AS VARCHAR) AS item_id,
             CAST(120 + ({_H_IMG}) % 60 AS DOUBLE) AS x0,
             CAST(560 + ({_H_IMG}) % 50 AS DOUBLE) AS y0,
             CAST(120 + ({_H_IMG}) % 60 + 180 AS DOUBLE) AS x1,
             CAST(560 + ({_H_IMG}) % 50 + 120 AS DOUBLE) AS y1,
             'blue' AS color, 2.0 AS line_width,
             'IMG:img_' || doc_id || '_' || CAST(page AS VARCHAR) AS label,
             CAST(120 + ({_H_IMG}) % 60 AS DOUBLE) AS label_x,
             CAST(560 + ({_H_IMG}) % 50 - 2 AS DOUBLE) AS label_y,
             6.0 AS label_font_size
      FROM img_seed
      WHERE ({_H_IMG}) % 3 = 0
    ),
    overlay AS (
      SELECT {_OVERLAY_COLS} FROM txt
      UNION ALL SELECT {_OVERLAY_COLS} FROM tbl
      UNION ALL SELECT {_OVERLAY_COLS} FROM img
    )
    SELECT doc_id, CAST(page AS INT) AS page, kind,
           CAST(draw_order AS INT) AS draw_order, item_id,
           x0, y0, x1, y1, color,
           CAST(line_width AS DOUBLE) AS line_width, label,
           label_x, label_y,
           CAST(label_font_size AS DOUBLE) AS label_font_size
    FROM overlay
    ORDER BY doc_id, page, draw_order, item_id
    """,
)
def overlay_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8 geometry: every rectangle + label the reference's
    visualize_output draws, as rows; see module docstring."""
    tb = text_blocks(spark, sf_dir)
    txt = tb.select(
        "doc_id",
        "page",
        *_style_cols(
            "text",
            F.col("id"),
            F.col("bbox")[0],
            F.col("bbox")[1],
            F.col("bbox")[2],
            F.col("bbox")[3],
        ),
    )

    tbl_src = table_blocks(spark, sf_dir)
    th = h64(F.concat(F.col("id"), F.lit(":bbox")))
    tx0 = 40 + th % 5 * 90
    ty0 = 300 + th % 7 * 60
    tbl = tbl_src.select(
        "doc_id",
        "page",
        *_style_cols("table", F.col("id"), tx0, ty0, tx0 + 320, ty0 + 90),
    )

    img_seed = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").cast("string").alias("doc_id"))
        .select("doc_id", F.explode(F.array(F.lit(1), F.lit(2))).alias("page"))
    )
    ih = h64(
        F.concat(F.col("doc_id"), F.lit(":img"), F.col("page").cast("string"))
    )
    ix0 = 120 + ih % 60
    iy0 = 560 + ih % 50
    img = img_seed.filter(ih % 3 == 0).select(
        "doc_id",
        "page",
        *_style_cols(
            "image",
            F.concat(
                F.lit("img_"), F.col("doc_id"), F.lit("_"),
                F.col("page").cast("string"),
            ),
            ix0,
            iy0,
            ix0 + 180,
            iy0 + 120,
        ),
    )

    return (
        txt.unionByName(tbl)
        .unionByName(img)
        .select(
            "doc_id",
            F.col("page").cast("int").alias("page"),
            "kind",
            F.col("draw_order").cast("int").alias("draw_order"),
            "item_id",
            "x0", "y0", "x1", "y1",
            "color",
            "line_width",
            "label",
            "label_x", "label_y",
            "label_font_size",
        )
        .orderBy("doc_id", "page", "draw_order", "item_id")
    )

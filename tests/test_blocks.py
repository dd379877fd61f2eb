"""Block-pipeline operator tests on synthesized text_blocks fixtures
(FIXTURES.md B.1 edge cases: 2-column layouts, header/footer noise,
heading font outliers, mergeable runs, cross-page section carry)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestion_din_spark.operators import blocks as B

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("content", T.StringType()),
        T.StructField("bbox", T.ArrayType(T.DoubleType())),
        T.StructField("font_size", T.DoubleType()),
        T.StructField("intent", T.ArrayType(T.StringType())),
    ]
)


def _blocks(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_reading_order_two_columns(spark):
    # Same y-band, different x → left column first; 12px tolerance groups
    # lines (ingestion/pdf_parser.py:173-179).
    rows = [
        ("b1", "d", 1, "right top", [300.0, 100.0, 400.0, 110.0], 10.0, []),
        ("b2", "d", 1, "left top", [50.0, 103.0, 150.0, 113.0], 10.0, []),
        ("b3", "d", 1, "left lower", [50.0, 200.0, 150.0, 210.0], 10.0, []),
    ]
    out = B.reading_order(_blocks(spark, rows)).orderBy("ord").collect()
    assert [r.id for r in out] == ["b2", "b1", "b3"]


def test_header_footer_noise(spark):
    rows = [
        ("h", "d", 1, "running header", [0.0, 10.0, 100.0, 20.0], 8.0, []),
        ("m", "d", 1, "body", [0.0, 400.0, 100.0, 410.0], 10.0, []),
        ("f", "d", 1, "page 3", [0.0, 830.0, 100.0, 840.0], 8.0, []),
    ]
    out = {r.id: r.noise for r in B.flag_header_footer_noise(
        _blocks(spark, rows), page_height=842.0).collect()}
    assert out == {"h": True, "m": False, "f": True}


def test_heading_detection_and_section_propagation(spark):
    rows = [
        ("t1", "d", 1, "Chapter One", [0.0, 50.0, 100.0, 70.0], 20.0, []),
        ("t2", "d", 1, "body a", [0.0, 100.0, 100.0, 110.0], 10.0, []),
        ("t3", "d", 1, "Sub Part", [0.0, 150.0, 100.0, 163.0], 13.0, []),
        ("t4", "d", 1, "body b", [0.0, 200.0, 100.0, 210.0], 10.0, []),
        # page 2 has no heading: section must carry across pages (W3)
        ("t5", "d", 2, "body c page2", [0.0, 50.0, 100.0, 60.0], 10.0, []),
        # numeric-only big font is NOT a heading
        ("t6", "d", 1, "123.45", [0.0, 300.0, 100.0, 320.0], 22.0, []),
        # extra body blocks keep the page-1 font median at 10
        ("t7", "d", 1, "body d", [0.0, 250.0, 100.0, 260.0], 10.0, []),
        ("t8", "d", 1, "body e", [0.0, 270.0, 100.0, 280.0], 10.0, []),
    ]
    b = B.reading_order(_blocks(spark, rows))
    b = B.page_font_median(b)
    b = B.detect_headings(b)
    got = {r.id: r.heading_level for r in b.collect()}
    assert got["t1"] == "H1"       # 20 / 10 median > 1.5
    assert got["t3"] == "H2"       # 13 / 10 > 1.2, <= 1.5
    assert got["t2"] is None and got["t6"] is None
    sec = {r.id: r.section for r in B.propagate_sections(b).collect()}
    assert sec["t2"] == "Chapter One"
    assert sec["t4"] == "Sub Part"
    assert sec["t5"] == "Sub Part"  # carried across the page break


def test_merge_adjacent_blocks_orders_content(spark):
    rows = [
        ("a", "d", 1, "first", [0.0, 100.0, 100.0, 110.0], 10.0, ["how_to"]),
        ("b", "d", 1, "second", [0.0, 112.0, 100.0, 122.0], 10.0, ["spec"]),
        ("c", "d", 1, "far away", [0.0, 400.0, 100.0, 410.0], 10.0, []),
    ]
    b = B.reading_order(_blocks(spark, rows))
    b = b.withColumn("section", F.lit("S")).withColumn(
        "heading_level", F.lit(None).cast("string")
    )
    out = B.merge_adjacent_blocks(b).orderBy("id").collect()
    assert len(out) == 2
    merged = out[0]
    assert merged.content == "first\nsecond"
    assert merged.bbox == [0.0, 100.0, 100.0, 122.0]
    assert sorted(merged.intent) == ["how_to", "spec"]
    assert merged.n_merged == 2


def test_block_pipeline_end_to_end(spark):
    rows = [
        ("hdr", "d", 1, "noise hdr", [0.0, 5.0, 100.0, 15.0], 8.0, []),
        ("h1", "d", 1, "Title", [0.0, 60.0, 100.0, 80.0], 20.0, []),
        ("p1", "d", 1, "para one", [0.0, 100.0, 100.0, 110.0], 10.0, []),
        ("p2", "d", 1, "para two", [0.0, 112.0, 100.0, 122.0], 10.0, []),
    ]
    out = B.block_pipeline(_blocks(spark, rows)).collect()
    contents = sorted(r.content for r in out)
    assert contents == ["Title", "para one\npara two"]

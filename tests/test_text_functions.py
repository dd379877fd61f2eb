"""Unit tests for the text normalization expression library — golden
input/output pairs mirroring the reference semantics (SURVEY.md §2.9),
including Thai text."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_din_spark.functions.text import (
    clean_text,
    meaningful_text,
    normalize_section_title,
    parse_money,
    sanitize_doc_id,
    sanitize_html,
)


def _apply(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    return [r[0] for r in df.select(col_fn(F.col("x"))).collect()]


def test_clean_text_whitespace(spark):
    out = _apply(
        spark,
        clean_text,
        [
            "a   b\t\tc",
            "line1\n\n\n\n\nline2",
            "​zero width﻿",
            "  padded  ",
            "ctrl\x00char\x07here",
        ],
    )
    assert out[0] == "a b c"
    assert out[1] == "line1\n\nline2"
    assert out[2] == "zero width"
    assert out[3] == "padded"
    assert out[4] == "ctrl char here"


def test_clean_text_thai(spark):
    # Thai line-break joining (ingestion/table_extractor.py:72-83): a
    # newline between Thai chars is removed; dot leaders collapse.
    out = _apply(spark, clean_text, ["กอง\nทุน", "a\nb", "x......y"])
    assert out[0] == "กองทุน"
    assert out[1] == "a\nb"
    assert out[2] == "x...y"


def test_sanitize_doc_id(spark):
    # Reference: backend/main.py:48-68 — lowercase, ws→_, strip others.
    out = _apply(
        spark,
        sanitize_doc_id,
        ["My Doc 2024.pdf", "  UPPER  case ", "thai_ไทย_doc", "a@b#c"],
    )
    assert out[0] == "my_doc_2024pdf"
    assert out[1] == "upper_case"
    assert out[2] == "thai_ไทย_doc"
    assert out[3] == "abc"


def test_normalize_section_title(spark):
    # ingestion/pdf_parser.py:87-92.
    out = _apply(
        spark,
        normalize_section_title,
        ["1.2.3) Budget   Overview", "A. Annex", "plain title", "x" * 200],
    )
    assert out[0] == "Budget Overview"
    assert out[1] == "Annex"
    assert out[2] == "plain title"
    assert len(out[3]) == 150


def test_sanitize_html(spark):
    # backend/services/chunking.py:60-62,176-187.
    out = _apply(
        spark,
        sanitize_html,
        [
            "<b>ok</b><script>alert(1)</script>done",
            '<img onerror=alert(1) src="x">',
            '<a href="javascript:evil()">x</a>',
        ],
    )
    assert out[0] == "<b>ok</b>done"
    assert "onerror" not in out[1]
    assert "javascript:" not in out[2]


def test_parse_money(spark):
    # ingestion/semantic_enricher.py:504-518: commas, ฿/บาท, (x) → -x.
    out = _apply(
        spark,
        parse_money,
        ["1,234.56", "฿999", "12 345.00 บาท", "(250.75)", "garbage"],
    )
    assert [float(v) if v is not None else None for v in out] == [
        1234.56,
        999.0,
        12345.0,
        -250.75,
        None,
    ]


def test_meaningful_text(spark):
    # F1 predicate: ≥2 word chars incl. Thai (ingestion/pdf_parser.py:71).
    out = _apply(spark, lambda c: meaningful_text(c, 2), ["ab", "a", "--", "ไทย", "a-b"])
    assert out == [True, False, False, True, True]

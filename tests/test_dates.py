"""Unit pins for the multi-format/Buddhist-era date chain
(functions/dates.py) — the oracle round-trip covers the fixture; these
pin the edge semantics on crafted strings."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_din_spark.functions.dates import parse_date_any


def _parse(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    p = parse_date_any(F.col("s"))
    return [
        (r.kind, r.iso)
        for r in df.select(
            p.getField("kind").alias("kind"), p.getField("iso").alias("iso")
        ).collect()
    ]


def test_parse_date_any_formats_and_be(spark):
    out = _parse(
        spark,
        [
            "2024-03-15",        # ISO CE
            "2567-03-15",        # ISO Buddhist era → −543
            "15/3/2024",         # d/m/Y CE
            "15/03/2567",        # d/m/Y BE, zero-padded month
            "15 มี.ค. 2567",     # Thai month + BE year
            "1 ม.ค. 2024",       # Thai month + CE year (kept as-is)
            "Section 3",         # junk
            "",                  # empty
            "2024-13-40",        # ISO-shaped but out of domain
            "15 xxx 2567",       # unknown month token
        ],
    )
    assert out == [
        ("iso", "2024-03-15"),
        ("iso", "2024-03-15"),
        ("dmy", "2024-03-15"),
        ("dmy", "2024-03-15"),
        ("thai", "2024-03-15"),
        ("thai", "2024-01-01"),
        ("none", None),
        ("none", None),
        ("none", None),
        ("none", None),
    ]

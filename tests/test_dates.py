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


def test_calendar_invalid_dates_rejected_both_twins(spark):
    """Month-aware validity: Feb 30 / Apr 31 / non-leap Feb 29 must come
    back kind='none' on BOTH engines — Spark's non-ANSI make_date would
    return NULL for these while DuckDB's make_date raises, so letting
    them reach make_date is a cross-engine crash, not just a wrong row."""
    cases = [
        ("30/2/2567", ("none", None)),    # Feb 30 (BE year)
        ("2023-02-29", ("none", None)),   # non-leap Feb 29
        ("2024-02-29", ("iso", "2024-02-29")),  # leap Feb 29 valid
        ("31/4/2024", ("none", None)),    # Apr 31
        ("31/12/2024", ("dmy", "2024-12-31")),
        ("29 ก.พ. 2567", ("iso_or_none", None)),  # BE 2567 → CE 2024 leap
    ]
    # last case: CE 2024 IS a leap year → valid thai parse
    cases[-1] = ("29 ก.พ. 2567", ("thai", "2024-02-29"))
    out = _parse(spark, [c for c, _ in cases])
    assert out == [e for _, e in cases]

    # DuckDB twin agrees row-for-row (and, crucially, does not raise)
    import duckdb

    from data_ingestion_din_spark.functions.dates import parse_date_any_sql

    kind, iso = parse_date_any_sql("s")
    con = duckdb.connect()
    vals = ", ".join(f"('{c}')" for c, _ in cases)
    got = con.execute(
        f"SELECT {kind}, {iso} FROM (VALUES {vals}) t(s)"
    ).fetchall()
    assert [tuple(r) for r in got] == [e for _, e in cases]


def test_staged_matches_single_expression(spark):
    from data_ingestion_din_spark.functions.dates import parse_date_any_staged

    vals = [
        "2024-03-15", "30/2/2567", "2023-02-29", "2024-02-29",
        "31/4/2024", "15 มี.ค. 2567", "junk", "",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    staged = [
        (r.kind, r.iso)
        for r in parse_date_any_staged(df, "s", "kind", "iso").collect()
    ]
    assert staged == _parse(spark, vals)

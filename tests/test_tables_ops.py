"""Table-operator tests on synthesized table_blocks fixtures
(FIXTURES.md B.2 edge cases: ragged rows, empty columns, header-less
tables, embedded sub-table headers, camelot/vision conflicts, Thai bank
headers, low-trust aggregation refusal)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestion_din_spark.operators import tables_ops as TO

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("columns", T.ArrayType(T.StringType())),
        T.StructField("rows", T.ArrayType(T.ArrayType(T.StringType()))),
        T.StructField("source", T.StringType()),
        T.StructField("numeric_trust", T.StringType()),
    ]
)


def _tables(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_pad_and_prune(spark):
    t = _tables(
        spark,
        [
            (
                "t1", "d", 1,
                ["a", "b", ""],
                [["1", "2"], ["3", "4", ""], ["", "", ""]],
                "camelot", "high",
            )
        ],
    )
    out = TO.pad_and_prune(t).collect()[0]
    assert out.columns == ["a", "b"]          # empty col pruned
    assert out.rows == [["1", "2"], ["3", "4"]]  # padded then pruned; empty row dropped


def test_junk_filter(spark):
    t = _tables(
        spark,
        [
            ("ok", "d", 1, ["a", "b"], [["1", "2"], ["3", "4"]], "camelot", "high"),
            ("one_col", "d", 1, ["a"], [["1"], ["2"]], "camelot", "high"),
            ("one_row", "d", 1, ["a", "b"], [["1", "2"]], "camelot", "high"),
            ("empty", "d", 1, ["a", "b"], [["", ""], ["--", "!!"]], "camelot", "high"),
        ],
    )
    assert [r.id for r in TO.junk_filter(t).collect()] == ["ok"]


def test_elect_header_picks_most_meaningful_of_first_three(spark):
    t = _tables(
        spark,
        [
            (
                "t", "d", 1, ["", ""],
                [["", ""], ["Date", "Amount"], ["1/1", "10"], ["2/1", "20"]],
                "camelot", "high",
            )
        ],
    )
    out = TO.elect_header(t).collect()[0]
    assert out.columns == ["Date", "Amount"]
    assert out.rows == [["1/1", "10"], ["2/1", "20"]]


def test_promote_first_row_header(spark):
    t = _tables(
        spark,
        [("t", "d", 1, [], [["Name", "Value"], ["x", "1"]], "camelot", "high")],
    )
    out = TO.promote_first_row_header(t).collect()[0]
    assert out.columns == ["Name", "Value"]
    assert out.rows == [["x", "1"]]


def test_split_subtables(spark):
    t = _tables(
        spark,
        [
            (
                "t", "d", 1, ["c1", "c2"],
                [
                    ["Section A", ""],
                    ["1", "2"],
                    ["Section B", ""],
                    ["3", "4"],
                    ["5", "6"],
                ],
                "camelot", "high",
            )
        ],
    )
    out = {r.id: r.rows for r in TO.split_subtables(t).collect()}
    assert out == {
        "t_sub1": [["1", "2"]],
        "t_sub2": [["3", "4"], ["5", "6"]],
    }


def test_dedup_by_content_prefers_priority(spark):
    # Same row content, different headers (J2 edge: hash covers rows only);
    # camelot (priority 0) must win over vision (priority 1).
    t = _tables(
        spark,
        [
            ("v1", "d", 1, ["x", "y"], [["1", "2"]], "vision", "low"),
            ("c1", "d", 2, ["a", "b"], [["1", "2"]], "camelot", "high"),
        ],
    ).withColumn(
        "source_priority", F.when(F.col("source") == "camelot", 0).otherwise(1)
    )
    out = TO.dedup_by_content(t).collect()
    assert [r.id for r in out] == ["c1"]


def test_resolve_conflicts_anti_join(spark):
    t = _tables(
        spark,
        [
            ("c1", "d", 1, ["a"], [["1"]], "camelot", "high"),
            ("v1", "d", 1, ["a"], [["2"]], "vision", "low"),   # page has camelot → dropped
            ("v2", "d", 2, ["a"], [["3"]], "vision", "low"),   # no camelot on page 2 → kept
        ],
    )
    assert sorted(r.id for r in TO.resolve_conflicts(t).collect()) == ["c1", "v2"]


@pytest.fixture()
def bank_cells(spark):
    t = _tables(
        spark,
        [
            (
                "stmt", "d", 1,
                ["วันที่", "รายการ", "ถอนเงิน", "ฝากเงิน", "คงเหลือ"],
                [
                    ["1/1/67", "ค่าน้ำ", "1,500.00", "", "10,000.00"],
                    ["2/1/67", "เงินเดือน", "", "฿50,000", "60,000.00"],
                    ["3/1/67", "ถอน ATM", "(2,000.00)", "", "58,000.00"],
                ],
                "camelot", "high",
            ),
            (
                "vis", "d", 2,
                ["Date", "Amount"],
                [["x", "999"]],
                "vision", "low",
            ),
        ],
    )
    return TO.table_cells(t)


def test_canonical_headers_thai_english(bank_cells):
    canon = {
        (r.col_name, r.canon_name)
        for r in bank_cells.select("col_name", "canon_name").distinct().collect()
    }
    assert ("วันที่", "date") in canon
    assert ("ถอนเงิน", "amount_out") in canon
    assert ("ฝากเงิน", "amount_in") in canon
    assert ("คงเหลือ", "balance") in canon
    assert ("รายการ", "description") in canon


def test_compute_from_table_refuses_low_trust(bank_cells):
    out = TO.compute_from_table(bank_cells, "sum", "amount_out").collect()
    # vision table (low trust) excluded; (2,000.00) parses negative
    assert len(out) == 1
    assert out[0].table_id == "stmt"
    assert float(out[0].sum_amount_out) == 1500.0 - 2000.0


def test_extract_transactions(bank_cells):
    tx = TO.extract_transactions(bank_cells).orderBy("row_idx").collect()
    stmt = [r for r in tx if r.table_id == "stmt"]
    assert [r.date_raw for r in stmt] == ["1/1/67", "2/1/67", "3/1/67"]
    assert float(stmt[1].amount_in) == 50000.0
    assert float(stmt[2].amount_out) == -2000.0
    assert float(stmt[0].balance) == 10000.0

"""Validation constraint-query tests (FIXTURES.md B.4/B.7 edge cases)."""

from __future__ import annotations

from pyspark.sql import types as T

from data_ingestion_din_spark.operators import validate as V

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("file_name", T.StringType()),
        T.StructField("page_count", T.IntegerType()),
    ]
)

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("bbox", T.ArrayType(T.DoubleType())),
    ]
)


def test_validate_all_finds_each_issue_class(spark):
    meta = spark.createDataFrame(
        [
            ("d1", "a.pdf", 2),
            ("d2", "", 1),          # missing file_name
            ("d3", "c.pdf", 1),     # no text blocks
        ],
        META_SCHEMA,
    )
    blocks = spark.createDataFrame(
        [
            ("t1", "d1", 1, [0.0, 0.0, 1.0, 1.0]),
            ("t1", "d1", 1, [0.0, 0.0, 1.0, 1.0]),   # duplicate id
            ("t2", "d1", 5, [0.0, 0.0, 1.0]),         # page 5 > page_count 2; bad bbox
            ("t3", "d2", 1, None),
        ],
        BLOCK_SCHEMA,
    )
    issues = V.validate_all(meta, blocks).collect()
    codes = {(r.code, r.doc_id) for r in issues}
    assert ("MISSING_DOC_FIELDS", "d2") in codes
    assert ("PAGE_RANGE_MISMATCH", "d1") in codes
    assert ("NO_TEXT_BLOCKS", "d3") in codes
    assert ("DUPLICATE_TEXT_ID", "d1") in codes
    assert ("BAD_TEXT_BBOX", "d1") in codes
    # clean doc d1-block t3 produces nothing beyond the above
    assert all(r.level in ("error", "warning") for r in issues)


def test_ragged_table_rows(spark):
    tables = spark.createDataFrame(
        [
            ("tb1", "d1", ["a", "b"], [["1", "2"], ["only_one"]]),
            ("tb2", "d1", ["a", "b"], [["1", "2"]]),
        ],
        T.StructType(
            [
                T.StructField("id", T.StringType()),
                T.StructField("doc_id", T.StringType()),
                T.StructField("columns", T.ArrayType(T.StringType())),
                T.StructField(
                    "rows", T.ArrayType(T.ArrayType(T.StringType()))
                ),
            ]
        ),
    )
    out = V.ragged_table_rows(tables).collect()
    assert [r.entity_id for r in out] == ["tb1"]

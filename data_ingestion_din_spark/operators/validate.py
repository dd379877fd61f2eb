"""Validation as constraint queries: DataFrames in, ``issues`` DataFrame out.

The reference's validator (ingestion/validator.py) walks each document in
Python and emits issue dicts {level, code, message, context}
(ingestion/validator.py:29-40). Here each check is a constraint QUERY over
the block DataFrames — the issues table is itself data (SURVEY.md §5.1),
so validation distributes with the corpus and doubles as a test surface.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ISSUE_COLS = ("level", "code", "message", "doc_id", "entity_id")


def _issue(df: DataFrame, level: str, code: str, message, entity_id) -> DataFrame:
    return df.select(
        F.lit(level).alias("level"),
        F.lit(code).alias("code"),
        message.alias("message"),
        F.col("doc_id").cast("string").alias("doc_id"),
        entity_id.cast("string").alias("entity_id"),
    )


def missing_doc_fields(doc_meta: DataFrame) -> DataFrame:
    """ingestion/validator.py:91-107 — doc_id / file_name must be present."""
    bad = doc_meta.filter(
        F.col("doc_id").isNull()
        | (F.trim(F.col("doc_id")) == "")
        | F.col("file_name").isNull()
        | (F.trim(F.col("file_name")) == "")
    )
    return _issue(
        bad, "error", "MISSING_DOC_FIELDS",
        F.lit("doc_id or file_name missing"), F.col("doc_id"),
    )


def page_range_mismatch(doc_meta: DataFrame, blocks: DataFrame) -> DataFrame:
    """ingestion/validator.py:110-141 — observed block page range must fit
    the declared page_count (pages are 1-based)."""
    observed = blocks.groupBy("doc_id").agg(
        F.min("page").alias("min_page"), F.max("page").alias("max_page")
    )
    joined = doc_meta.join(observed, "doc_id", "left")
    bad = joined.filter(
        (F.col("max_page") > F.col("page_count")) | (F.col("min_page") < 1)
    )
    return _issue(
        bad, "warning", "PAGE_RANGE_MISMATCH",
        F.concat(
            F.lit("blocks span pages "), F.col("min_page"), F.lit(".."),
            F.col("max_page"), F.lit(" but page_count="), F.col("page_count"),
        ),
        F.col("doc_id"),
    )


def no_text_blocks(doc_meta: DataFrame, text_blocks: DataFrame) -> DataFrame:
    """ingestion/validator.py:144-151 — a document with zero text blocks."""
    bad = doc_meta.join(
        text_blocks.select("doc_id").distinct(), "doc_id", "left_anti"
    )
    return _issue(
        bad, "warning", "NO_TEXT_BLOCKS",
        F.lit("document has no text blocks"), F.col("doc_id"),
    )


def duplicate_ids(blocks: DataFrame, block_type: str) -> DataFrame:
    """ingestion/validator.py:153-199 — IDs appearing more than once per
    block type (A5: groupBy id → count > 1)."""
    dups = (
        blocks.groupBy("doc_id", "id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    return _issue(
        dups, "error", f"DUPLICATE_{block_type.upper()}_ID",
        F.concat(F.lit("id occurs "), F.col("n"), F.lit(" times")),
        F.col("id"),
    )


def ragged_table_rows(tables: DataFrame) -> DataFrame:
    """ingestion/validator.py:323-436 — rows whose length mismatches the
    header width."""
    bad = tables.filter(
        F.exists(F.col("rows"), lambda r: F.size(r) != F.size(F.col("columns")))
    )
    return _issue(
        bad, "warning", "RAGGED_TABLE_ROWS",
        F.lit("row length mismatches header width"), F.col("id"),
    )


def bad_bbox(blocks: DataFrame, block_type: str) -> DataFrame:
    """ingestion/validator.py:208-315 — bbox must have exactly 4 elements
    when present."""
    bad = blocks.filter(
        F.col("bbox").isNotNull() & (F.size("bbox") != 4)
    )
    return _issue(
        bad, "error", f"BAD_{block_type.upper()}_BBOX",
        F.concat(F.lit("bbox arity "), F.size("bbox")), F.col("id"),
    )


def validate_all(
    doc_meta: DataFrame,
    text_blocks: DataFrame,
    table_blocks: DataFrame | None = None,
) -> DataFrame:
    """The full constraint suite (ingestion/validator.py:511-524) — one
    unioned issues DataFrame."""
    checks = [
        missing_doc_fields(doc_meta),
        page_range_mismatch(doc_meta, text_blocks),
        no_text_blocks(doc_meta, text_blocks),
        duplicate_ids(text_blocks, "text"),
        bad_bbox(text_blocks, "text"),
    ]
    if table_blocks is not None:
        checks += [
            duplicate_ids(table_blocks, "table"),
            ragged_table_rows(table_blocks),
        ]
    return reduce(lambda a, b: a.unionByName(b), checks)

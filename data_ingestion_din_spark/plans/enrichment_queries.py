"""Enrichment queries: classification (L1+L2 rule path), intent scoring
(A8), entity extraction (A10), block-type detection (§2.9).

Deterministic markers are injected into a hash-chosen subset of fixture
docs/blocks so every branch of the cascades fires on real rows; both
engines derive the same augmented text, so the oracle checks the full
rule surface value-for-value."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_din_spark.ai.classify import (
    classify_documents,
    rule_classify_sql,
)
from data_ingestion_din_spark.functions.hashing import h64, h64_sql
from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.sources.entities import TEXT_BLOCKS_CTES, text_blocks
from data_ingestion_din_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# doc_classification — L1 rule cascade + L2 Q&A override
# --------------------------------------------------------------------------

_H_CLS = h64_sql("'cls:' || CAST(doc_id AS VARCHAR)")
_MARKERS = (
    " bank statement",
    " invoice total",
    " fiscal report งบประมาณ",
    " user manual",
    " ถาม: q1 ตอบ: a1",
    "",
)
_MARKER_SQL = (
    "CASE "
    + " ".join(
        f"WHEN {_H_CLS} % 6 = {i} THEN '{m}'" for i, m in enumerate(_MARKERS[:-1])
    )
    + " ELSE '' END"
)


@query(
    "doc_classification",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text || {_MARKER_SQL} AS aug FROM documents
    )
    SELECT doc_id, {rule_classify_sql("aug")} AS doc_class
    FROM t
    ORDER BY doc_id
    """,
)
def doc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 rule classification (document_classifier.py:87-183) with the L2
    Q&A regex override (run_ingestion.py:134-148) — native expressions;
    the LLM path plugs into ai.map_inference with the same contract."""
    docs = load_table(spark, sf_dir, "documents")
    h = h64(F.concat(F.lit("cls:"), F.col("doc_id").cast("string")))
    marker = F.lit("")
    for i, m in reversed(list(enumerate(_MARKERS[:-1]))):
        marker = F.when(h % 6 == i, F.lit(m)).otherwise(marker)
    aug = docs.select(
        "doc_id", F.concat(F.col("text"), marker).alias("text")
    )
    return classify_documents(aug).orderBy("doc_id")


# --------------------------------------------------------------------------
# doc_enrichment — A8 intent scoring + A10 entity extraction
# --------------------------------------------------------------------------

INTENT_KEYWORDS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("aggregation", ("agg", "group", "sum")),
    ("comparison", ("join", "merge")),
    ("lookup", ("table", "row", "key")),
    ("scan_perf", ("scan", "fast", "slow")),
)

_H_ENT = h64_sql("'ent:' || CAST(doc_id AS VARCHAR)")
_MONEY_RE = "(\\d+(?:,\\d{3})*(?:\\.\\d{2})?) ?(?:บาท|฿)"
_YEAR_RE = "ปี (\\d{4})"


def _intent_struct_sql() -> str:
    """Scored intents as a sorted array of 'score:name' strings (score
    desc via inverted-digit trick is avoided — sort on formatted key with
    9-score as printable order: use (9 - score) so lexicographic asc =
    score desc, then name asc)."""
    elems = ", ".join(
        "CASE WHEN "
        + " + ".join(
            f"(CASE WHEN contains(text, '{kw}') THEN 1 ELSE 0 END)" for kw in kws
        )
        + f" > 0 THEN CAST(9 - ("
        + " + ".join(
            f"(CASE WHEN contains(text, '{kw}') THEN 1 ELSE 0 END)" for kw in kws
        )
        + f") AS VARCHAR) || ':{name}' END"
        for name, kws in INTENT_KEYWORDS
    )
    return (
        f"list_sort(list_filter([{elems}], x -> x IS NOT NULL))"
    )


@query(
    "doc_enrichment",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN {_H_ENT} % 4 = 0
                  THEN text || ' ราคา 1,234.56 บาท ในปี 2567'
                  ELSE text END AS text
      FROM documents
    ),
    s AS (
      SELECT doc_id, {_intent_struct_sql()} AS intents,
             list_sort(list_distinct(
               regexp_extract_all(text, '{_MONEY_RE}', 1))) AS monies,
             list_sort(list_distinct(
               regexp_extract_all(text, '{_YEAR_RE}', 1))) AS years
      FROM t
    )
    SELECT doc_id,
           coalesce(array_to_string(list_slice(intents, 1, 5), ','), '')
             AS intents,
           coalesce(intents[1], 'none') AS primary_intent,
           coalesce(array_to_string(monies, ','), '') AS money_entities,
           coalesce(array_to_string(years, ','), '') AS year_entities
    FROM s
    ORDER BY doc_id
    """,
)
def doc_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 intent scoring (chunking.py:27-35,97-171: keyword-class hits,
    sorted desc, capped 5, deterministic tiebreak) + A10 entity
    extraction (chunking.py:134-148: distinct regex matches, sorted).
    Intents serialize as '9-score:name' so one lexicographic sort gives
    (score desc, name asc) identically in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    h = h64(F.concat(F.lit("ent:"), F.col("doc_id").cast("string")))
    text = F.when(
        h % 4 == 0,
        F.concat(F.col("text"), F.lit(" ราคา 1,234.56 บาท ในปี 2567")),
    ).otherwise(F.col("text"))
    t = docs.select("doc_id", text.alias("text"))

    scored = []
    for name, kws in INTENT_KEYWORDS:
        score = sum(
            [F.when(F.col("text").contains(k), 1).otherwise(0) for k in kws],
            F.lit(0),
        )
        scored.append(
            F.when(
                score > 0,
                F.concat((9 - score).cast("string"), F.lit(f":{name}")),
            )
        )
    intents = F.array_sort(
        F.filter(F.array(*scored), lambda x: x.isNotNull())
    )
    monies = F.array_sort(
        F.array_distinct(F.regexp_extract_all("text", F.lit(_MONEY_RE), 1))
    )
    years = F.array_sort(
        F.array_distinct(F.regexp_extract_all("text", F.lit(_YEAR_RE), 1))
    )
    return t.select(
        "doc_id",
        F.array_join(F.slice(intents, 1, 5), ",").alias("intents"),
        F.coalesce(F.get(intents, 0), F.lit("none")).alias(
            "primary_intent"
        ),
        F.array_join(monies, ",").alias("money_entities"),
        F.array_join(years, ",").alias("year_entities"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# block_type_detection — §2.9 prefix cascade over text blocks
# --------------------------------------------------------------------------

_H_BT = h64_sql("'bt:' || id || ':' || doc_id")


@query(
    "block_type_detection",
    oracle=f"""WITH {TEXT_BLOCKS_CTES},
    t AS (
      SELECT doc_id, id,
             CASE WHEN {_H_BT} % 7 = 0 THEN 'WARNING: ' || content
                  WHEN {_H_BT} % 7 = 1 THEN 'NOTE: ' || content
                  WHEN {_H_BT} % 7 = 2
                    THEN 'Step ' || CAST({_H_BT} % 9 AS VARCHAR) || ': ' || content
                  ELSE content END AS content
      FROM text_blocks
    )
    SELECT doc_id, id,
           CASE WHEN regexp_matches(content, '^(WARNING|คำเตือน)')
                  THEN 'warning'
                WHEN regexp_matches(content, '^(NOTE|หมายเหตุ)') THEN 'note'
                WHEN regexp_matches(content, '^(Step|ขั้นตอนที่) ?\\d') THEN 'step'
                ELSE 'normal' END AS block_type
    FROM t
    ORDER BY doc_id, id
    """,
)
def block_type_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-type prefix cascade (ingestion/pdf_parser.py:113-122:
    WARNING/NOTE/Step in Thai+English), over derived blocks with injected
    prefixes so every branch fires."""
    b = text_blocks(spark, sf_dir)
    h = h64(F.concat(F.lit("bt:"), F.col("id"), F.lit(":"), F.col("doc_id")))
    content = (
        F.when(h % 7 == 0, F.concat(F.lit("WARNING: "), F.col("content")))
        .when(h % 7 == 1, F.concat(F.lit("NOTE: "), F.col("content")))
        .when(
            h % 7 == 2,
            F.concat(
                F.lit("Step "),
                (h % 9).cast("string"),
                F.lit(": "),
                F.col("content"),
            ),
        )
        .otherwise(F.col("content"))
    )
    block_type = (
        F.when(content.rlike("^(WARNING|คำเตือน)"), "warning")
        .when(content.rlike("^(NOTE|หมายเหตุ)"), "note")
        .when(content.rlike("^(Step|ขั้นตอนที่) ?\\d"), "step")
        .otherwise("normal")
    )
    return b.select("doc_id", "id", block_type.alias("block_type")).orderBy(
        "doc_id", "id"
    )

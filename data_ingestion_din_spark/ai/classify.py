"""Document classification: rule cascade (native expressions) with the
model path behind map_inference.

The reference classifies with Qwen at temperature 0 over the first 4000
chars (ingestion/document_classifier.py:191-305) and falls back to a
filename+content keyword cascade (:87-183); a regex Q&A auto-detect
overrides the label afterwards (L2, backend/scripts/run_ingestion.py:
134-148). The rule path IS the deterministic engine surface; the LLM
path plugs into map_inference with the same label contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CLASS_LABELS: tuple[str, ...] = (
    "bank_statement",
    "invoice",
    "gov_financial_report",
    "manual",
    "qna",
    "general_doc",
)

# ordered keyword cascade — first match wins (document_classifier.py:87-183)
RULE_KEYWORDS: tuple[tuple[str, str], ...] = (
    ("bank statement", "bank_statement"),
    ("ธนาคาร", "bank_statement"),
    ("invoice", "invoice"),
    ("ใบแจ้งหนี้", "invoice"),
    ("fiscal report", "gov_financial_report"),
    ("งบประมาณ", "gov_financial_report"),
    ("manual", "manual"),
    ("คู่มือ", "manual"),
)


def rule_classify(text: Column) -> Column:
    """Keyword cascade + L2 Q&A override: a ถาม:/ตอบ: pair anywhere wins
    over the keyword label (run_ingestion.py:134-148 applies the override
    after classification)."""
    label = F.lit("general_doc")
    for needle, lab in reversed(RULE_KEYWORDS):
        label = F.when(F.lower(text).contains(needle), F.lit(lab)).otherwise(label)
    return F.when(
        text.contains("ถาม:") & text.contains("ตอบ:"), F.lit("qna")
    ).otherwise(label)


def rule_classify_sql(expr: str) -> str:
    """DuckDB oracle twin — same cascade, same override order."""
    whens = "\n".join(
        f"      WHEN contains(lower({expr}), '{needle}') THEN '{lab}'"
        for needle, lab in RULE_KEYWORDS
    )
    cascade = f"CASE\n{whens}\n      ELSE 'general_doc' END"
    return (
        f"CASE WHEN contains({expr}, 'ถาม:') AND contains({expr}, 'ตอบ:')"
        f" THEN 'qna' ELSE {cascade} END"
    )


def classify_documents(
    docs: DataFrame,
    text_col: str = "text",
    model=None,
    passthrough: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Rule path (model=None): pure expressions, zero Python. Model path:
    Arrow-batched map_inference over the first 4000 chars (the reference's
    prompt budget, document_classifier.py:52-63)."""
    if model is None:
        return docs.select(
            *passthrough, rule_classify(F.col(text_col)).alias("doc_class")
        )
    from data_ingestion_din_spark.ai.infer import map_inference

    prompted = docs.withColumn("_prompt", F.substring(F.col(text_col), 1, 4000))
    return map_inference(
        prompted, "_prompt", "doc_class", lambda: model, passthrough=passthrough
    )

"""K7 — evaluation report sink (backend/scripts/run_eval.py:166-250).

The reference's eval pipeline collects judge scores into pandas, computes
per-level averages + a total percentage + a grade, and renders an HTML
report. Engine restatement: the AGGREGATION is a DataFrame plan
(exact integer sum/count partials per level, double only in the final
avg/percentage division, the same 80/70/50 grade thresholds); only the
final render collects — a report is
a driver artifact by definition, and what is collected is the k-row
summary plus the capped detail rows, never the corpus.

Expected input schema (the reference's eval_data records):
``level string, question string, ground_truth string, answer string,
score_correctness int`` (extra columns pass through to the detail table).
"""

from __future__ import annotations

import html as _html
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# backend/scripts/run_eval.py:174-178
GRADES = [(80.0, "Excellent"), (70.0, "Good"), (50.0, "Fair")]


def eval_summary(eval_df: DataFrame) -> DataFrame:
    """One row per level plus an ``__all__`` row: n, avg score (of 5),
    percentage, grade. The partials are exact integer sum/count; only
    the final per-group avg/percentage divisions are double. One shuffle
    on the tiny level key. An EMPTY input yields the single ``__all__``
    row with n=0, avg/percentage 0.0, grade 'Poor' (the sum's NULL is
    coalesced so the report renderer never formats a None)."""
    base = eval_df.select(
        "level", F.col("score_correctness").cast("bigint").alias("s")
    )
    per = base.groupBy("level").agg(
        F.count(F.lit(1)).alias("n"), F.sum("s").alias("tot")
    )
    overall = base.agg(
        F.lit("__all__").alias("level"),
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("s"), F.lit(0)).alias("tot"),
    )
    avg = F.when(F.col("n") > 0, F.col("tot") / F.col("n")).otherwise(0.0)
    pct = avg / F.lit(5.0) * 100
    grade = (
        F.when(pct >= GRADES[0][0], GRADES[0][1])
        .when(pct >= GRADES[1][0], GRADES[1][1])
        .when(pct >= GRADES[2][0], GRADES[2][1])
        .otherwise("Poor")
    )
    return (
        per.unionByName(overall)
        .select(
            "level",
            F.col("n").cast("bigint").alias("n"),
            avg.alias("avg_score"),
            pct.alias("percentage"),
            grade.alias("grade"),
        )
        .orderBy("level")
    )


def write_eval_report(
    eval_df: DataFrame, out_dir: str, max_detail_rows: int = 1000
) -> dict:
    """Write ``summary.json`` + ``report.html`` under ``out_dir`` and
    return the summary dict. Collects the k-row summary and at most
    ``max_detail_rows`` detail rows (ordered by level, question)."""
    os.makedirs(out_dir, exist_ok=True)
    rows = {r["level"]: r.asDict() for r in eval_summary(eval_df).collect()}
    summary = {
        "levels": {k: v for k, v in rows.items() if k != "__all__"},
        "total": rows.get("__all__", {}),
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, ensure_ascii=False, indent=1, default=str)

    detail = (
        eval_df.select(
            "level", "question", "ground_truth", "answer",
            "score_correctness",
        )
        .orderBy("level", "question")
        .limit(max_detail_rows)
        .collect()
    )
    total = rows.get("__all__", {})
    body = "".join(
        "<tr class={lv}><td>{lv}</td><td>{q}</td><td>{gt}</td>"
        "<td>{a}</td><td class=s{s}>{s}</td></tr>".format(
            lv=_html.escape(str(r["level"])),
            q=_html.escape(str(r["question"])),
            gt=_html.escape(str(r["ground_truth"])),
            a=_html.escape(str(r["answer"])),
            s=int(r["score_correctness"]),
        )
        for r in detail
    )
    doc = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        "<title>RAG Evaluation Report</title></head><body>"
        f"<h1>RAG Evaluation Report</h1>"
        f"<h2>Total: {total.get('percentage') or 0:.2f}% "
        f"({total.get('grade') or 'n/a'})</h2>"
        "<table border=1><tr><th>Level</th><th>Question</th>"
        "<th>Ground truth</th><th>Answer</th><th>Score</th></tr>"
        f"{body}</table></body></html>"
    )
    with open(os.path.join(out_dir, "report.html"), "w") as f:
        f.write(doc)
    return summary

"""L12 — judge-scored evaluation pipeline under the oracle gate
(backend/scripts/run_eval.py:85-119,166-200).

The reference's eval loop: a golden Q/A set (3 difficulty levels) →
RAG answers → an LLM judge that returns JSON scores buried in chatter →
regex-JSON extraction with a 0/0 fallback → pandas groupby summary with
80/70/50 grade thresholds. The engine restatement keeps every stage a
DataFrame op:

1. **Golden set** — derived from the S13 ``qna_pairs`` extraction
   (plans/retrieval_queries.py): question + extracted answer as
   ground truth, hash-assigned Easy/Medium/Hard levels (the reference's
   three tiers), and a deterministic "system answer" per question
   spanning the four interesting agreement shapes (exact / superset /
   partial / miss) so the judge rule produces the full score range.
2. **Judge stage** — ai/infer.map_inference (per-partition client,
   Arrow batches) running ai/judge.JudgeNullModel: rule verdict wrapped
   in chatter, ~1/7 of replies carrying no JSON at all.
3. **Extraction** — JVM-side regex ``(?s)\\{.*\\}`` (the reference's
   re.DOTALL search, run_eval.py:108) + per-field regex pulls, with the
   0/0 + ``Judge Output Error (No JSON)`` fallback (run_eval.py:112).
4. **Summary** — sinks/report.eval_summary (K7): per-level + __all__
   n / avg / percentage / grade, run_eval.py:170-178 semantics.

The DuckDB oracle restates the judge's response STRING construction and
the extraction bit-for-bit, so the hash gate checks the whole pipeline
including the failure path — the judge kernel is the only swap point
for a real model client.

Scale: one Arrow boundary (the judge — at 100 TB that stage is
network-bound on the model endpoint, and per-partition clients are the
right amortization); everything else is whole-stage codegen over ~rows
= golden-set size, which is tiny by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_din_spark.ai.infer import map_inference
from data_ingestion_din_spark.ai.judge import (
    NO_JSON_REASON,
    NO_JSON_REPLY,
    PROMPT_SEP,
    JudgeNullModel,
)
from data_ingestion_din_spark.functions.hashing import h64, h64_sql
from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.plans.retrieval_queries import _H_QA, _qna_pairs
from data_ingestion_din_spark.sinks.report import eval_summary
from data_ingestion_din_spark.sources.tables import load_table


def _eval_set(docs: DataFrame) -> DataFrame:
    """(doc_id, level, question, ground_truth, answer): the golden set
    plus the simulated system answer (see module docstring §1)."""
    pairs = _qna_pairs(docs).select(
        "doc_id", "question", F.col("answer").alias("ground_truth")
    )
    lvl = h64(F.col("question"), "lvl:") % 3
    level = (
        F.when(lvl == 0, "Easy").when(lvl == 1, "Medium").otherwise("Hard")
    )
    va = h64(F.col("question"), "ans:") % 4
    gt = F.col("ground_truth")
    answer = (
        F.when(va == 0, gt)
        .when(va == 1, F.concat(F.lit("จากเอกสาร "), gt))
        .when(va == 2, F.element_at(F.split(gt, " "), 1))
        .otherwise(F.lit("ไม่พบข้อมูล"))
    )
    return pairs.select(
        "doc_id", level.alias("level"), "question", "ground_truth",
        answer.alias("answer"),
    )


def _int0(c) -> F.Column:
    # ANSI-safe: regexp_extract misses yield '' → NULL → 0
    return F.coalesce(F.nullif(c, F.lit("")).cast("int"), F.lit(0))


def judged_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden set → judge stage → extracted scores (one row per eval
    question). The judge runs through the generic inference boundary; the
    JSON pull-apart is JVM regex on the response column."""
    es = _eval_set(load_table(spark, sf_dir, "documents"))
    prompts = es.withColumn(
        "prompt",
        F.concat_ws(PROMPT_SEP, "question", "ground_truth", "answer"),
    )
    judged = map_inference(
        prompts,
        "prompt",
        "judge_response",
        JudgeNullModel,
        passthrough=("doc_id", "level", "question", "ground_truth", "answer"),
    )
    j = F.regexp_extract("judge_response", r"(?s)\{.*\}", 0)
    staged = judged.withColumn("j", j)
    reason = F.when(
        F.col("j") == "", F.lit(NO_JSON_REASON)
    ).otherwise(F.regexp_extract("j", r'"reason": "([^"]*)"', 1))
    return staged.select(
        "doc_id",
        "level",
        "question",
        "ground_truth",
        "answer",
        _int0(F.regexp_extract("j", r'"correctness": (\d+)', 1)).alias(
            "score_correctness"
        ),
        _int0(F.regexp_extract("j", r'"faithfulness": (\d+)', 1)).alias(
            "score_faithfulness"
        ),
        reason.alias("judge_reason"),
    )


# Shared oracle chain: golden set → response string → regex extraction.
_H_LVL = h64_sql("question", "lvl:")
_H_ANS = h64_sql("question", "ans:")
_H_FAIL = h64_sql("question", "judgefail:")

_EVAL_CTES = f"""
t AS (
  SELECT doc_id,
         CASE WHEN {_H_QA} % 3 = 0
              THEN text || ' ถาม: ' || string_split(text, ' ')[1]
                   || ' หรือไม่ ตอบ: ' || string_split(text, ' ')[-1] || ' ครับ'
              ELSE text END AS qtext
  FROM documents
),
pairs AS (
  SELECT doc_id,
         trim(regexp_extract(qtext, 'ถาม: (.*) ตอบ:', 1)) AS question,
         trim(regexp_extract(qtext, 'ตอบ: (.*)$', 1)) AS ground_truth
  FROM t
  WHERE contains(qtext, 'ถาม:') AND contains(qtext, 'ตอบ:')
),
es AS (
  SELECT doc_id, question, ground_truth,
         CASE {_H_LVL} % 3 WHEN 0 THEN 'Easy' WHEN 1 THEN 'Medium'
              ELSE 'Hard' END AS level,
         CASE {_H_ANS} % 4
              WHEN 0 THEN ground_truth
              WHEN 1 THEN 'จากเอกสาร ' || ground_truth
              WHEN 2 THEN string_split(ground_truth, ' ')[1]
              ELSE 'ไม่พบข้อมูล' END AS answer
  FROM pairs
),
v AS (
  SELECT *,
         CASE WHEN answer = ground_truth THEN 5
              WHEN contains(answer, ground_truth) THEN 4
              WHEN answer <> '' AND contains(ground_truth, answer) THEN 2
              ELSE 1 END AS rc,
         CASE WHEN answer = ground_truth THEN 'exact'
              WHEN contains(answer, ground_truth) THEN 'contains'
              WHEN answer <> '' AND contains(ground_truth, answer)
                THEN 'partial'
              ELSE 'mismatch' END AS rn
  FROM es
),
resp AS (
  SELECT doc_id, level, question, ground_truth, answer,
         CASE WHEN {_H_FAIL} % 7 = 0 THEN '{NO_JSON_REPLY}'
              ELSE 'Here is my verdict: {{"correctness": '
                   || CAST(rc AS VARCHAR) || ', "faithfulness": '
                   || CAST(CASE WHEN rc >= 4 THEN 5 ELSE 2 END AS VARCHAR)
                   || ', "reason": "rule: ' || rn
                   || '"}}. Hope this helps.' END AS judge_response
  FROM v
),
ext AS (
  SELECT *, regexp_extract(judge_response, '(?s)\\{{.*\\}}', 0) AS j
  FROM resp
),
scored AS (
  SELECT doc_id, level, question, ground_truth, answer,
         coalesce(CAST(nullif(
           regexp_extract(j, '"correctness": (\\d+)', 1), '') AS INT), 0)
           AS score_correctness,
         coalesce(CAST(nullif(
           regexp_extract(j, '"faithfulness": (\\d+)', 1), '') AS INT), 0)
           AS score_faithfulness,
         CASE WHEN j = '' THEN '{NO_JSON_REASON}'
              ELSE regexp_extract(j, '"reason": "([^"]*)"', 1) END
           AS judge_reason
  FROM ext
)"""


@query(
    "eval_judged_scores",
    oracle=f"""
    WITH {_EVAL_CTES}
    SELECT doc_id, level, question,
           CAST(score_correctness AS INT) AS score_correctness,
           CAST(score_faithfulness AS INT) AS score_faithfulness,
           judge_reason
    FROM scored
    ORDER BY doc_id
    """,
)
def eval_judged_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-question judge verdicts (the reference's eval_data records,
    run_eval.py:152-160) — including the regex-extraction failure rows."""
    return judged_eval(spark, sf_dir).select(
        "doc_id",
        "level",
        "question",
        "score_correctness",
        "score_faithfulness",
        "judge_reason",
    ).orderBy("doc_id")


@query(
    "eval_judged_summary",
    oracle=f"""
    WITH {_EVAL_CTES},
    summary AS (
      SELECT level, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(score_correctness) AS BIGINT) AS tot
      FROM scored GROUP BY level
      UNION ALL
      SELECT '__all__', CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(score_correctness), 0) AS BIGINT)
      FROM scored
    )
    SELECT level, n,
           CASE WHEN n > 0 THEN CAST(tot AS DOUBLE) / n ELSE 0.0 END
             AS avg_score,
           (CASE WHEN n > 0 THEN CAST(tot AS DOUBLE) / n ELSE 0.0 END)
             / 5.0 * 100 AS percentage,
           CASE WHEN (CASE WHEN n > 0 THEN CAST(tot AS DOUBLE) / n
                           ELSE 0.0 END) / 5.0 * 100 >= 80.0
                  THEN 'Excellent'
                WHEN (CASE WHEN n > 0 THEN CAST(tot AS DOUBLE) / n
                           ELSE 0.0 END) / 5.0 * 100 >= 70.0 THEN 'Good'
                WHEN (CASE WHEN n > 0 THEN CAST(tot AS DOUBLE) / n
                           ELSE 0.0 END) / 5.0 * 100 >= 50.0 THEN 'Fair'
                ELSE 'Poor' END AS grade
    FROM summary
    ORDER BY level
    """,
)
def eval_judged_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7∘L12: the judge pipeline feeding the eval-report aggregation
    (run_eval.py:170-178 / sinks/report.eval_summary) — per-level and
    overall score averages, percentage, 80/70/50 grade.

    The judged frame is STAGED (localCheckpoint) before the summary:
    eval_summary unions a per-level and an overall branch, and without
    staging each branch re-runs the judge inference — the one stage
    that is network-bound against a real model endpoint (the
    with_minhash staging mechanism; plan-asserted to one MapInPandas in
    tests/test_plan_assertions.py)."""
    return eval_summary(judged_eval(spark, sf_dir).localCheckpoint(eager=False))

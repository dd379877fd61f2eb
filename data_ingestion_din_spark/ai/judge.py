"""L12 — LLM-as-judge evaluation stage (backend/scripts/run_eval.py:85-119).

The reference scores each RAG answer with a judge model prompted to emit
``{"correctness": <int>, "faithfulness": <int>, "reason": ...}``, then
regex-extracts the JSON from whatever chatter surrounds it
(``re.search(r"\\{.*\\}", content, re.DOTALL)``, run_eval.py:108) and
falls back to 0/0 scores with reason ``Judge Output Error (No JSON)``
when no JSON is found (run_eval.py:112).

Engine restatement: the judge runs as a :func:`~data_ingestion_din_spark.
ai.infer.map_inference` stage (per-partition client, Arrow batches) and
the JSON extraction + scoring aggregation are JVM expressions
(plans/eval_queries.py). The network model is out of the container, so
the shipped client is :class:`JudgeNullModel` — a deterministic
rule-based verdict (answer-vs-ground-truth containment) whose response
STRING, including the surrounding chatter and the occasional
no-JSON failure, is reproduced bit-for-bit by the DuckDB oracle; a real
litellm-backed client drops into the same ``predict_batch`` contract.
"""

from __future__ import annotations

import hashlib

# Field separator used to pack (question, ground_truth, answer) into the
# single prompt column map_inference feeds the client.
PROMPT_SEP = "\x1f"

NO_JSON_REPLY = "ขออภัย ไม่สามารถตัดสินได้"
NO_JSON_REASON = "Judge Output Error (No JSON)"  # run_eval.py:112


def _h64(s: str) -> int:
    """Python twin of functions/hashing.h64 (60-bit md5 prefix)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def rule_verdict(ground_truth: str, answer: str) -> tuple[int, str]:
    """Deterministic correctness rule: exact match 5, answer contains the
    ground truth 4, answer is a non-empty substring of the ground truth
    (partial) 2, else 1. Pure string containment so the DuckDB oracle
    states the identical rule with ``contains``."""
    if answer == ground_truth:
        return 5, "exact"
    if ground_truth in answer:
        return 4, "contains"
    if answer and answer in ground_truth:
        return 2, "partial"
    return 1, "mismatch"


class JudgeNullModel:
    """Offline judge: rule verdict wrapped in LLM-ish chatter.

    ~1/7 of questions (hash-selected) get a reply with NO JSON at all,
    so the downstream regex-extraction failure path (score 0/0, the
    reference's ``Judge Output Error``) is exercised end-to-end."""

    def predict_batch(self, prompts: list[str]) -> list[str]:
        return [self._judge(p) for p in prompts]

    @staticmethod
    def _judge(prompt: str) -> str:
        question, ground_truth, answer = prompt.split(PROMPT_SEP, 2)
        if _h64("judgefail:" + question) % 7 == 0:
            return NO_JSON_REPLY
        corr, rule = rule_verdict(ground_truth, answer)
        faith = 5 if corr >= 4 else 2
        return (
            "Here is my verdict: "
            f'{{"correctness": {corr}, "faithfulness": {faith}, '
            f'"reason": "rule: {rule}"}}. Hope this helps.'
        )

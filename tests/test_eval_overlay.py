"""L12 judge pipeline + K8 overlay geometry (the last two SURVEY §2
components; oracle parity is covered by the registered queries, these
pin the operator-level semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_din_spark.ai.judge import (
    NO_JSON_REPLY,
    PROMPT_SEP,
    JudgeNullModel,
    rule_verdict,
)

SF = "/root/testdata/sf0.001"


def test_rule_verdict_branches():
    assert rule_verdict("a b", "a b") == (5, "exact")
    assert rule_verdict("a b", "x a b y") == (4, "contains")
    assert rule_verdict("a b c", "b") == (2, "partial")
    assert rule_verdict("a b", "z") == (1, "mismatch")
    assert rule_verdict("a b", "") == (1, "mismatch")


def test_judge_reply_shapes():
    m = JudgeNullModel()
    ok = m.predict_batch([f"q1{PROMPT_SEP}gt{PROMPT_SEP}gt"])[0]
    assert '"correctness": 5' in ok and '"faithfulness": 5' in ok
    assert ok.startswith("Here is my verdict: ")  # chatter around the JSON
    # deterministic: same prompt, same reply
    assert m.predict_batch([f"q1{PROMPT_SEP}gt{PROMPT_SEP}gt"])[0] == ok


def test_judged_eval_failure_path(spark):
    from data_ingestion_din_spark.plans.eval_queries import judged_eval

    rows = judged_eval(spark, SF).collect()
    assert rows, "eval set empty"
    fails = [r for r in rows if r.judge_reason == "Judge Output Error (No JSON)"]
    oks = [r for r in rows if r.score_correctness > 0]
    assert oks, "no successful verdicts"
    for r in fails:
        assert r.score_correctness == 0 and r.score_faithfulness == 0
    for r in oks:
        assert r.judge_reason.startswith("rule: ")
        assert 1 <= r.score_correctness <= 5


def test_judge_fail_rate_matches_hash(spark):
    """The no-JSON replies must be exactly the hash-selected questions —
    extraction never fails on a well-formed reply."""
    m = JudgeNullModel()
    got = m.predict_batch([f"q{i}{PROMPT_SEP}g{PROMPT_SEP}g" for i in range(50)])
    import hashlib

    expect_fail = [
        int(hashlib.md5(f"judgefail:q{i}".encode()).hexdigest()[:15], 16) % 7
        == 0
        for i in range(50)
    ]
    assert [g == NO_JSON_REPLY for g in got] == expect_fail
    assert any(expect_fail) and not all(expect_fail)


def test_overlay_styles(spark):
    from data_ingestion_din_spark.plans import QUERIES

    df = QUERIES["overlay_boxes"](spark, SF)
    styles = {
        (r.kind, r.color, r.line_width, r.draw_order)
        for r in df.select("kind", "color", "line_width", "draw_order")
        .distinct()
        .collect()
    }
    assert styles == {
        ("text", "green", 0.5, 0),
        ("table", "red", 2.0, 1),
        ("image", "blue", 2.0, 2),
    }
    bad = df.filter(
        (F.col("x1") <= F.col("x0"))
        | (F.col("y1") <= F.col("y0"))
        | (F.col("label_x") != F.col("x0"))
        | (F.col("label_y") != F.col("y0") - 2)  # draw_rects label anchor
        | (F.col("label_font_size") != 6.0)
    ).count()
    assert bad == 0
    # label prefixes per layer (visualize_result.py:58-66)
    assert (
        df.filter(
            (F.col("kind") == "table") & ~F.col("label").startswith("TBL:")
        ).count()
        == 0
    )
    assert (
        df.filter(
            (F.col("kind") == "image") & ~F.col("label").startswith("IMG:")
        ).count()
        == 0
    )

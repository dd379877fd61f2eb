"""streaming_ivf_rebalance contracts (VERDICT r13 ask #8): exactly-once
under replay, a real cell-local split under engineered churn, and the
no-full-corpus-retrain plan property (the split's member read carries a
cluster-pushed parquet filter instead of rescanning the assignment
state)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from data_ingestion_din_spark.plans.streaming_indexes import (
    _ivf_rebalance_processor,
)


def _vec(base: float) -> list[float]:
    return [float(base)] * 8


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, _vec(v)) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )


def _snapshot(spark, out, cents, mass):
    a = sorted(
        (r.vec_id, r.cluster, r.phase)
        for r in spark.read.option("basePath", out).parquet(out).collect()
    )
    c = sorted(
        (r.cluster, tuple(r.qv), r.retired)
        for r in spark.read.option("basePath", cents).parquet(cents).collect()
    )
    m = sorted(
        (r.cluster, r.mass)
        for r in spark.read.option("basePath", mass).parquet(mass).collect()
    )
    return a, c, m


def test_rebalance_split_and_replay_idempotent(spark, tmp_path):
    """Batch 2 floods one cell past the 1.15x-mean trigger; the
    oversized cell (and only it) splits into parent*10+{1,2}; replaying
    either epoch is a no-op on all three state dirs."""
    out = str(tmp_path / "out")
    cents = str(tmp_path / "cents")
    mass = str(tmp_path / "mass")
    process = _ivf_rebalance_processor(out, cents, mass, k=2)

    # two well-separated blobs; training on batch 0 gives one cell each
    b0 = _mk(spark, [(0, 0.0), (1, 0.001), (10, 5.0), (11, 5.001)])
    # batch 1 doubles blob A's cell mass (4 more members near 0) while
    # blob B gets nothing — cell A ends at 6/8 of the corpus, 1.5x mean
    b1 = _mk(spark, [(20, 0.002), (21, 0.003), (22, 0.004), (23, 0.005)])

    process(b0, 0)
    process(b1, 1)
    first = _snapshot(spark, out, cents, mass)
    process(b0, 0)
    process(b1, 1)
    assert _snapshot(spark, out, cents, mass) == first  # replay no-op

    latest = {}
    for vid, cl, ph in first[0]:
        latest[vid] = (cl, ph)  # rows sorted epoch-last wins not needed:
    # resolve latest per vec_id explicitly (epoch dirs read together)
    hist = (
        spark.read.option("basePath", out).parquet(out).collect()
    )
    by_vid = {}
    for r in hist:
        if r.vec_id not in by_vid or r.epoch > by_vid[r.vec_id].epoch:
            by_vid[r.vec_id] = r
    clusters = {v: (r.cluster, r.phase) for v, r in by_vid.items()}
    # blob A's cell split: all its members (original + flood) now sit in
    # fresh sub-cells parent*10+{1,2} with phase 'split'
    a_members = [0, 1, 20, 21, 22, 23]
    a_cells = {clusters[v][0] for v in a_members}
    assert all(clusters[v][1] == "split" for v in a_members)
    assert all(c >= 10 for c in a_cells) and len(a_cells) <= 2
    parent = {c // 10 for c in a_cells}
    assert len(parent) == 1
    # blob B untouched: original cell id, phase 'trained'
    assert clusters[10][1] == "trained" and clusters[11][1] == "trained"
    assert clusters[10][0] == clusters[11][0] and clusters[10][0] < 10
    # centroid state: parent retired, two live sub-cells
    retired = [c for c, _, r in first[1] if r]
    live = [c for c, _, r in first[1] if not r]
    assert retired == sorted(parent)
    assert sorted(c for c in live if c >= 10) == sorted(a_cells)
    # mass counters: bounded per-cell rows, latest epoch sums to corpus
    mass_latest = {}
    for r in spark.read.option("basePath", mass).parquet(mass).collect():
        key = r.cluster
        if key not in mass_latest or r.epoch > mass_latest[key][0]:
            mass_latest[key] = (r.epoch, r.mass)
    live_mass = {
        c: m for c, (e, m) in mass_latest.items() if e == 1
    }
    assert sum(live_mass.values()) == 8


def test_rebalance_split_reads_only_the_oversized_cell(spark, tmp_path):
    """The no-full-corpus-retrain property: the split's member read is
    the assignment state WITH a cluster equality filter pushed to the
    parquet scan — not a rescan-everything-then-train."""
    out = str(tmp_path / "out")
    cents = str(tmp_path / "cents")
    mass = str(tmp_path / "mass")
    process = _ivf_rebalance_processor(out, cents, mass, k=2)

    b0 = _mk(spark, [(0, 0.0), (1, 0.001), (10, 5.0), (11, 5.001)])
    b1 = _mk(spark, [(20, 0.002), (21, 0.003), (22, 0.004), (23, 0.005)])
    process(b0, 0)
    plan = process.plan(b1, 1)
    assert plan["split_cell"] is not None
    members = plan["members"]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        members.explain(mode="formatted")
    txt = buf.getvalue()
    assert "PushedFilters" in txt
    assert f"EqualTo(cluster,{plan['split_cell']})" in txt.replace(" ", "")
    # and the member set is exactly the oversized cell, not the corpus
    assert sorted(r.vec_id for r in members.collect()) == [
        0,
        1,
        20,
        21,
        22,
        23,
    ]


def test_rebalance_no_trigger_no_split(spark, tmp_path):
    """Balanced churn routes incrementally and never splits (no fresh
    centroid epoch, phases stay trained/incremental)."""
    out = str(tmp_path / "out")
    cents = str(tmp_path / "cents")
    mass = str(tmp_path / "mass")
    process = _ivf_rebalance_processor(out, cents, mass, k=2)

    b0 = _mk(spark, [(0, 0.0), (1, 0.001), (10, 5.0), (11, 5.001)])
    b1 = _mk(spark, [(20, 0.002), (21, 4.999)])  # one per cell: balanced
    process(b0, 0)
    process(b1, 1)
    phases = {
        r.vec_id: r.phase
        for r in spark.read.option("basePath", out).parquet(out).collect()
    }
    assert set(phases.values()) == {"trained", "incremental"}
    import os

    assert os.listdir(cents) == ["epoch=0"]  # no split epoch written

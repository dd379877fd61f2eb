"""Rotation invariant: never-driver-sampled queries must lead the priority.

The per-round correctness driver samples only a bounded (~50) head-first
window of ``__spark_entry__.queries()``.  Two rounds running, late-round
additions missed ``_DRIVER_PRIORITY`` and stayed never-sampled (r9:
similarity_ivfpq_residual_{multiprobe,mp_recall}; r10:
similarity_graph_insert, dq_t_closeness_audit).  This test makes the fix a
registration-time invariant instead of a per-round cleanup: every
registered query absent from every ``CORRECTNESS_r*.json`` must appear in
``_DRIVER_PRIORITY`` *before* any already-sampled name, so the next driver
window necessarily covers it first.
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entry_mod
from data_ingestion_din_spark.plans import QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sampled_names() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            data = json.load(fh)
        if isinstance(data, dict):
            names.update(data.keys())
    return names


def test_never_sampled_queries_lead_driver_priority():
    sampled = _sampled_names()
    assert sampled, "no CORRECTNESS_r*.json found next to the repo root"
    never = set(QUERIES) - sampled
    priority = entry_mod._DRIVER_PRIORITY
    missing = sorted(never - set(priority))
    assert not missing, (
        f"never-driver-sampled queries absent from _DRIVER_PRIORITY: {missing}; "
        "append them to the never-sampled head in __spark_entry__.py"
    )
    # Strict head ordering: every never-sampled name precedes every
    # already-sampled name, so a bounded head-first window reaches them.
    positions = {name: i for i, name in enumerate(priority)}
    last_never = max((positions[n] for n in never), default=-1)
    sampled_in_priority = [n for n in priority if n in sampled]
    first_sampled = min(
        (positions[n] for n in sampled_in_priority), default=len(priority)
    )
    assert last_never < first_sampled, (
        "never-sampled queries must all precede sampled ones in "
        f"_DRIVER_PRIORITY (last never-sampled at index {last_never}, "
        f"first sampled at {first_sampled})"
    )


def test_priority_names_are_registered_and_unique():
    priority = entry_mod._DRIVER_PRIORITY
    assert len(priority) == len(set(priority)), "duplicate names in _DRIVER_PRIORITY"
    unknown = sorted(set(priority) - set(QUERIES))
    assert not unknown, f"_DRIVER_PRIORITY names not in the registry: {unknown}"

"""Module-namespace hygiene lints (the r10 ``_sbg_*`` shadowing bug class).

Round 10's one real bug: the Bloom gate landed in the then-flat 5.5k-line
streaming module with helpers named ``_sbg_*`` — silently REDEFINING the
BPE gate's ``_sbg_out_dir`` (later def wins) and reusing its staged-dir
tag, so ``streaming_bpe_gate`` returned Bloom columns.  Python raises
nothing on module-level redefinition, and a single-query verify passed;
only the full sweep caught it.  These lints make both halves of that
failure impossible to reintroduce:

1. No module-level name in any plans/operators/functions/sources module
   is defined twice (def/class/assignment shadowing).
2. Every ``fresh_app_dir``/``app_dir_path`` staged-directory tag belongs
   to exactly one top-level function package-wide (two families sharing a
   tag would overwrite each other's session-staged artifacts).
"""

from __future__ import annotations

import ast
import collections
import glob
import os

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data_ingestion_din_spark",
)


def _module_files() -> list[str]:
    return sorted(glob.glob(os.path.join(PKG, "**", "*.py"), recursive=True))


def test_no_module_level_name_shadowing():
    offenders = {}
    for path in _module_files():
        with open(path) as fh:
            tree = ast.parse(fh.read())
        names: collections.Counter[str] = collections.Counter()
        for node in tree.body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                names[node.name] += 1
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        names[t.id] += 1
            elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name
            ):
                names[node.target.id] += 1
        dups = sorted(n for n, c in names.items() if c > 1)
        if dups:
            offenders[os.path.relpath(path, PKG)] = dups
    assert not offenders, (
        "module-level names defined more than once (later definition "
        f"silently shadows the earlier one): {offenders}"
    )


def test_staged_dir_tags_unique_per_function():
    tag_sites: dict[str, set[tuple[str, str]]] = collections.defaultdict(set)
    for path in _module_files():
        with open(path) as fh:
            tree = ast.parse(fh.read())
        rel = os.path.relpath(path, PKG)
        for fn in (n for n in tree.body if isinstance(n, ast.FunctionDef)):
            for node in ast.walk(fn):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Name)
                    and node.func.id in ("fresh_app_dir", "app_dir_path")
                    and len(node.args) >= 3
                    and isinstance(node.args[2], ast.Constant)
                ):
                    tag_sites[node.args[2].value].add((rel, fn.name))
    assert tag_sites, "no staged-dir tags found — scan is miswired"
    shared = {t: sorted(s) for t, s in tag_sites.items() if len(s) > 1}
    assert not shared, (
        "staged-dir tags used by more than one top-level function "
        f"(families would clobber each other's artifacts): {shared}"
    )


def test_streaming_split_stays_bounded():
    """The per-family split exists because one flat 5.5k-line module grew
    a shared helper namespace; keep the streaming family modules under
    2.5k lines (and every plans module under 3.6k — similarity_queries is
    the current 3.5k ceiling) so no module regrows it."""
    over = {}
    for path in sorted(glob.glob(os.path.join(PKG, "plans", "*.py"))):
        base = os.path.basename(path)
        n = sum(1 for _ in open(path))
        limit = 2500 if base.startswith("streaming_") else 3600
        if n > limit:
            over[base] = n
    assert not over, f"plans modules grew past the split threshold: {over}"

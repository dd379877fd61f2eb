"""Opt-in bench-regression guard (VERDICT r5 ask #8): per-query steady
budgets for the most expensive registered queries, pinned at ~1.5x the
round-5/6 steady measurements (sf0.1, local[32]). A plan regression —
dropped broadcast, un-staged re-execution, a new shuffle — fails HERE
instead of waiting a round for the driver bench to notice.

Skipped unless SPARK_GRAFT_BENCH_BUDGETS=1: the run needs the sf0.1
fixture, the full local core count, and an otherwise-idle machine
(budgets are wall-clock; a concurrent Spark session sharing the cores
inflates every number — observed 1.6 s -> 6 s under a parallel verify
sweep), and takes ~1 minute — it is a bench, not a unit test. Enable
with:

    SPARK_GRAFT_BENCH_BUDGETS=1 python -m pytest tests/test_bench_budgets.py -q
"""

from __future__ import annotations

import json
import os
import time

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DETAIL = os.path.join(_REPO, "BENCH_DETAIL.json")


def test_bench_detail_artifact_schema():
    """bench.py persists its full per-query record to BENCH_DETAIL.json
    (the driver keeps only the stdout tail, so this file is the
    cross-round per-query history). Not gated on the bench-budget env
    var — it validates the artifact whenever one exists."""
    if not os.path.exists(_DETAIL):
        pytest.skip("no BENCH_DETAIL.json yet — run bench.py first")
    with open(_DETAIL) as f:
        d = json.load(f)
    assert d["metric"] == "headline_queries_total_runtime"
    assert d["unit"] == "sec"
    for key in ("queries", "queries_cold", "queries_warm", "setup"):
        assert isinstance(d[key], dict) and d[key], key
        assert all(isinstance(v, (int, float)) for v in d[key].values())
    assert set(d["queries"]) == set(d["queries_cold"]) == set(d["queries_warm"])
    assert d["value"] == pytest.approx(sum(d["queries"].values()), abs=0.01)
    assert d["setup_total"] == pytest.approx(sum(d["setup"].values()), abs=0.01)


# Applied per-test (NOT module-wide pytestmark) so the artifact-schema
# check above runs in the normal suite.
_budget_gate = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_BENCH_BUDGETS") != "1",
    reason="bench budgets are opt-in (SPARK_GRAFT_BENCH_BUDGETS=1)",
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# name -> steady budget in seconds = ~1.5x the measured best-of-two at
# sf0.1 on local[32] (BENCH_r05 + the round-6 BPE fusion re-measure).
# The 10+ most expensive queries; everything else is well under 2 s and
# a regression there surfaces in the headline total.
BUDGETS = {
    "corpus_bpe_encode": 2.0,  # 0.9 s: vocab-sized Arrow-batch encoder
    # (was 3.5 after the r6 fusion, 12.4 before it)
    # r8 re-calibration: hybrid CC (driver union-find under the edge
    # cap), staged banded-pair/k-means artifacts, and the per-cluster
    # GEMM SemDeDup cut every CC/kmeans consumer 2-4x — budgets are
    # ~1.5-2x the new steady measurements
    "dedup_semantic_kmeans": 2.5,  # 1.2-1.4 s: staged kmeans + GEMM
    "corpus_langid_confusion": 5.5,  # 3.5 s
    "dedup_clusters": 2.2,  # 1.1 s steady (staged pairs + hybrid CC)
    "table_transactions_dated": 3.2,  # 2.1 s
    "dedup_cluster_size_hist": 2.4,  # 1.2 s
    "dedup_keep_best": 1.8,  # 0.9 s
    "doc_winnow_fingerprints": 2.9,  # 1.9 s
    "embedding_hard_negatives": 2.8,  # 1.8 s
    "doc_cdc_chunks": 2.6,  # 1.7 s
    "corpus_bigram_generate": 2.5,  # 1.6 s (staged 1-row probes)
    "media_phash_clusters": 2.6,  # 1.3 s (was 5.3: CC rounds -> one
    # collect under the cap; pairs+CC resolution is what remains)
    # r10 re-calibration (clean-host pin 171.3 s/196, median per-query
    # 1.05x of the r9 driver detail): budgets added for the queries
    # that now top BENCH_DETAIL.json — each ~1.8x its in-suite time
    # (in-suite numbers run high vs best-of-two steady).
    "similarity_ivfpq_k16_grid": 7.0,  # 4.0 s in-suite (4-cell grid)
    "dedup_simhash_near": 6.0,  # 3.5 s in-suite (r9 steady 3.1)
    "embedding_near_dup_lsh": 6.0,  # 3.2 s in-suite (noise canary)
    "html_tables_parse": 5.0,  # 2.8 s in-suite
    "salted_skew_join": 4.5,  # 2.4 s in-suite
    "corpus_dsir_select": 4.0,  # 2.2 s in-suite
    "ngram_jaccard_capped": 4.0,  # 2.2 s in-suite
    # r10 additions that top the new detail file (clean 168.1 s/216 run)
    "dedup_minhash_br_grid": 6.0,  # 3.45 s in-suite (the S-curve audit)
    "corpus_bloom_decontaminate": 4.5,  # 2.6 s in-suite
    # r11 additions (steady best-of-two on a settled host, ~1.8x)
    "dedup_substring_w_grid": 6.0,  # 3.4 s (three window-length passes)
    "doc_trigram_perplexity": 4.0,  # 2.1 s
    "doc_lm_interp_ab": 7.5,  # 4.2 s (trigram + bigram pipelines x 4 lambdas)
    "doc_lm_smoothing_ab": 6.0,  # 3.3 s (four recipes, one stream)
    "dq_k_anonymity_generalize": 3.0,  # 1.6 s (12-node lattice fan-out)
    "similarity_graph_nsw_grid": 2.0,  # 0.96 s (staged edge artifact)
    "streaming_stream_full_outer_join": 2.5,  # 0.56-0.69 s readback
    # (r13 re-pin: committed r12 run read 2.05 s under host noise)
    "similarity_graph_routed_insert": 3.0,  # 1.56 s (staged edges + walk)
    "similarity_graph_hnsw_entry": 2.5,  # 1.24 s (H-sweep off staged edges)
    "events_dynamic_gap_sessions": 2.5,  # 1.22 s
    "similarity_ivf_nlist_sweep": 6.5,  # 3.5 s (two fresh Lloyd trainings)
    "similarity_mrl_dim_grid": 3.0,  # 1.45 s (one pass, four prefixes)
    "doc_gopher_rules": 2.2,  # 1.13 s
    "similarity_ivfpq_rerank_sweep": 4.5,  # 2.3-2.6 s steady (one
    # checkpointed ADC pass shared by the four rerank depths)
    "similarity_graph_delete_repair": 5.5,  # 2.9-3.1 s steady (two
    # distributed bridge-repair builds + six driver walks off the
    # staged edge artifact)
    "events_anomaly_mad": 3.5,  # 1.8-2.3 s steady (two exact-median
    # window passes + the z-gate stats re-scan)
    "dq_completeness_hll_ab": 13.0,  # 7.3-9.0 s steady (the priced
    # column-profiling A/B: one 50-column hash stream per run feeding
    # exact countDistinct + two register rollups — the cost IS the
    # measurement, like its dq_completeness_matrix sibling)
    "doc_lm_5gram_ab": 3.5,  # 1.5-2.2 s steady off the staged
    # five-order component pass (doc_5gram_perplexity stages it)
    "similarity_graph_hnsw_layers": 2.5,  # ~1.0 s steady (driver
    # walks off the staged edge artifact + tiny L2 build)
    "dedup_simhash_band_grid": 4.0,  # 1.4-1.7 s steady on the bench
    # host (r12: truth + band counting moved into task-parallel
    # mapInPandas after the driver-side numpy form read 12-13 s on the
    # driver host vs 2.7 s on the builder host; warm-session cold
    # ~4.5 s, staged truth makes steady ~1.5 s)
    "similarity_filtered_ann": 6.0,  # 3.4-3.8 s steady (shared exact
    # pass + 12 small per-arm aggregates)
    "similarity_filtered_nprobe": 6.0,  # 3.1-3.7 s steady (truth pass
    # + four widened filtered cell scans)
    "similarity_bq_recall_grid": 5.5,  # 3.1-3.2 s steady (one scored
    # pass checkpointed, four rank/rerank arms)
    "retrieval_late_interaction": 5.5,  # 3.1-3.3 s steady (members x
    # 5-probe scan + centroid artifact build)
    "layout_zonemap_audit": 7.0,  # 3.4-4.6 s steady (two assignment
    # walks + six metadata aggregates)
    "layout_zorder_pruning": 5.0,  # 2.5-2.9 s steady (three global
    # rank windows + metadata aggregates)
    "layout_hilbert_vs_zorder": 5.0,  # 2.6-3.0 s steady (8-step
    # integer chain + two rank windows)
    "events_theta_set_ops": 5.0,  # 2.4-3.3 s steady (four sketch
    # builds + exact audit counts)
    "retrieval_prf_expansion": 8.0,  # 4.8-6.4 s steady on the r12
    # host (two BM25 passes + relational term mining; r12 converted
    # the full global ranks to rank_topk cuts — plan strictly lighter,
    # but the host reads 1.5-3x noisier than the r11 3.8-4.2 s pin)
    "similarity_rp_dim_grid": 9.0,  # 5.4-5.5 s steady (projection
    # groupBy + two checkpointed prefix-distance passes, 12 rank arms)
    "corpus_line_dedup": 3.0,  # 1.3-1.7 s steady (two shuffles:
    # line-hash frequency, per-doc rollup)
    "corpus_doremi_step": 5.5,  # 2.7-3.4 s steady (two LM trainings +
    # two held-out scoring joins, 5-row weight arithmetic)
    "events_hll_sliding_merge": 2.5,  # 1.3-1.5 s steady (daily register
    # build + 3x window fan-out merges)
    "similarity_graph_vamana_grid": 4.5,  # 2.3-2.5 s steady on the
    # staged edge artifact (prunes + 14 walks are driver-side control)
    "similarity_vamana_clustered_ab": 5.5,  # 2.9-3.1 s steady (one
    # guarded collect + numpy GEMM per space, walks driver-side)
    "streaming_line_dedup_gate": 1.0,  # 0.23-0.25 s steady readback
    # (landings staged once per session like the sibling gates)
    "retrieval_ql_dirichlet": 4.5,  # 2.9-3.4 s steady on the r12 host
    # (one tf shuffle; the BM25 rank relation is two-phase ranked and
    # the QL top-20 is a rank_topk cut since r12)
    "dq_benford_audit": 3.5,  # 1.6-2.1 s steady (three column scans,
    # 9-bucket rollups)
    "similarity_pq_subspace_ab": 9.0,  # 4.8-5.3 s steady (two Lloyd
    # PQ trainings; truth + probe tables are guarded control data)
    "streaming_watermark_lateness_grid": 2.5,  # 1.1-1.2 s steady
    # readback (nine availableNow landings staged once per session)
    "events_asof_tolerance_grid": 3.5,  # 1.9-2.2 s steady (one as-of
    # pass checkpointed, four tolerance aggregations)
    "events_gini_concentration": 3.0,  # 1.7-1.9 s steady (r12: the
    # Lorenz rank/prefix went range-partitioned two-phase — an extra
    # sampling job + broadcast join that COSTS ~1 s at sf0.1 and is
    # the whole point at 100 TB, where the old partition-less window
    # sorted every user onto one core)
    "corpus_cms_width_grid": 6.5,  # 2.2-3.9 s steady (one token scan
    # checkpointed, three width shuffles over the distinct vocabulary)
    "corpus_decontam_n_grid": 6.0,  # 3.5-3.7 s steady (three shingle
    # passes off one checkpointed tokenization, broadcast eval sides)
    "doc_mattr_diversity": 3.0,  # 1.9-2.0 s steady (map-only HOF scan)
    "similarity_kmeans_convergence": 12.0,  # 6.6-8.3 s steady (four
    # checkpointed assignment passes + three M-step collects — job
    # count, not data volume)
    "dq_order_consistency_audit": 4.0,  # 2.2-2.4 s steady (one
    # orderkey rollup + two audit joins)
    "events_markov_transitions": 2.5,  # 1.0-1.6 s steady (one lead
    # window + k^2 rollup; r13 re-pin from a 4-run idle probe — the
    # old 1.5 s pin sat on top of the 1.46 s idle steady)
    "events_session_gap_grid": 2.5,  # 1.1-1.3 s steady (one lag scan
    # checkpointed, four break-flag rollups)
    "events_cusum_changepoint": 7.0,  # 2.0-4.4 s steady (hourly rollup
    # + numbered checkpointed, one Arrow walk over 10x720 rows)
    "events_dispersion_audit": 1.5,  # 0.8-1.0 s steady (one hourly
    # rollup + 5-row stats)
    "streaming_cusum_gate": 1.0,  # 0.25 s steady readback (landings
    # staged once per session like the sibling gates)
    "ranked_prefix_ab": 4.0,  # 2.3-2.6 s steady (both window arms run
    # back-to-back: global-window rank + the two-phase range shuffle)
    "similarity_pq_aniso_ab": 10.0,  # 6.6-7.0 s steady (two 1-iter PQ
    # trainings + two ADC serves + the guarded exact-dot truth; the
    # deliberate A/B price, same class as the smoothing/subspace A/Bs)
    "corpus_ccnet_buckets": 3.5,  # 1.6-2.1 s steady (the ppl chain +
    # one per-lang rank window)
    "dedup_semdedup_eps_grid": 4.5,  # 2.9-3.1 s steady (r13: truth
    # GEMM moved off the driver to chunked mapInPandas tasks — the r12
    # driver-side numpy read 10.4 s on the idle driver host)
    "dq_completeness_matrix": 20.0,  # 11-14 s steady: the exact
    # per-column distinct counts ARE the cost (Spark expands one copy
    # per distinct aggregate) — the documented production substitution
    # is the maintained HLL registers; the nightly-profile role
    # tolerates the exact form at audit scale
}


@pytest.fixture(scope="module")
def bench_spark():
    from data_ingestion_din_spark.session import get_spark

    # full local core count — budgets are calibrated on local[32]
    yield get_spark("bench-budgets")


def _steady(spark, name: str) -> float:
    from data_ingestion_din_spark.plans import QUERIES

    def once() -> float:
        t0 = time.time()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    return min(once(), once())


@_budget_gate
@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_query_within_steady_budget(bench_spark, name):
    got = _steady(bench_spark, name)
    assert got <= BUDGETS[name], (
        f"{name}: steady {got:.2f}s exceeds budget {BUDGETS[name]}s "
        f"(~1.5x the calibrated best-of-two) — check the plan for a "
        f"regression before re-calibrating"
    )

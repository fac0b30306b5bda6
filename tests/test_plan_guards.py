"""Global physical-plan guards over the registered query surface.

A scale regression usually shows up in the PLAN long before it shows
up in a timing: a lost join condition plans a CartesianProduct, a
dropped broadcast hint turns a dim probe into a full shuffle. This
test walks every registered query's physical plan at sf0.001 (plan
construction only — nothing is collected) and trips on the markers
that are never acceptable at 100 TB.

BroadcastNestedLoopJoin is allowed ONLY for the known scalar-broadcast
patterns (a 1-row aggregate crossed into the fact side — O(n) work,
the standard decorrelated-scalar-subquery shape), each listed with its
reason. Any new appearance fails the build until justified here.
"""

from __future__ import annotations

import pytest

from meteo_etl_spark.plans import queries as Q

SF_SMALL = "/root/testdata/sf0.001"

#: side-effecting certification queries (write scratch Derby/atomic
#: tables when invoked) — their plan shape is covered by their pytest
#: e2e suites; excluded here to keep this test read-only.
SIDE_EFFECTING = {
    "jdbc_roundtrip_agg",
    "jdbc_upsert_agg",
    "q15_atomic_merge",
    "rollup_incremental_agg",
    "events_scd2_stream",  # drives a real streaming drain + scratch merges
    "events_stream_dedup",  # drives a real streaming dedup drain + scratch parquet sink
    "docs_classifier_incremental",  # lands scratch count partitions + an atomic model table per wave
    "sim_ann_serve_ivf",  # builds a scratch persisted IVF index then serves from it
    "sim_ann_serve_lsh",  # builds a scratch persisted tuned-LSH index then serves from it
    "sim_ann_serve_ivfpq",  # builds a scratch persisted IVF-PQ (codes-only) index then serves from it
    "sim_ann_serve_deleted",  # builds a scratch persisted index, tombstone-deletes, then serves
    "events_stream_kmv",  # drives a real streaming drain maintaining a scratch persisted KMV store
}

#: BroadcastNestedLoopJoin allowlist: 1-row (or k-row, k tiny and
#: data-independent) relation broadcast against the fact — linear work.
SCALAR_BROADCAST_OK = {
    "tpch_q11_value_share",  # share-of-total: 1-row global sum crossed in
    "tpch_q22_idle_balance",  # scalar avg(acctbal) subquery crossed in
    "sim_topk_cosine",  # the single query vector crossed into candidates
    "sim_ann_lsh",  # same query-vector pattern, LSH-bucketed candidates
    "sim_ann_ivf",  # same query-vector pattern, IVF-routed candidates
    "docs_mixture_plan",  # 1-row global token total crossed into per-source rows
    "docs_budget_waterfill",  # 1-row (budget, n) census + 1-row pivot level crossed into the O(sources) key table
    "docs_vocab_topp",  # 1-row global token-mass total crossed into the vocab head
    "dedup_semantic_bigk",  # 1-row packed centroid table (collect_list) crossed in for large-k argmin assignment
    "docs_dsir_weights",  # 1-row target/source feature totals crossed into the <=1024-row bucket weight table
    "sim_ann_recall",  # the 10-row (data-independent audit panel) query set crossed into the corpus scan
    "sim_ann_multiprobe",  # the single query vector crossed in; Hamming probe is a residual condition
    "docs_drift_report",  # 1-row (t_ref, t_cur) snapshot totals crossed into the |sources|-row share table
    "events_key_skew_report",  # 1-row (tot, nkeys) census totals crossed into the per-key count frame
    "emb_dim_corr",  # 1-row census count (the (-1,-1) moment row) crossed into the d(d-1)/2-row pair frame
    "sim_ann_recall_tuned",  # same 10-row audit panel as sim_ann_recall, tuned (8x6 h<=1) probe condition
    "sim_route_choice",  # same 10-row audit panel crossed in once; all three routes' counters fold into one aggregate
    "emb_pq_audit",  # same 10-row audit panel crossed into the PQ-encoded corpus once
    "emb_binary_quant_audit",  # same 10-row audit panel crossed into the sign-packed corpus once
    "emb_rp_audit",  # same 10-row audit panel crossed into the projected corpus once
    "docs_balanced_sample",  # 1-row min-class-count scalar crossed into the ranked frame
    "sim_filtered_topk",  # the single query vector crossed into the label-filtered candidates
    "sim_hard_negatives",  # the 5-row (data-independent anchor panel) crossed into one corpus scan
    "basket_rules",  # 1-row basket-count scalar crossed into the bounded rule table
    "emb_gram_census",  # 1-row census count (the (-1,-1) moment row) crossed into the d(d+1)/2-row covariance frame (emb_dim_corr's shape)
    "docs_bm25_topk",  # 1-row (total tokens, doc count) census crossed into the query-term tf rows for the dl/avgdl normalization
    "docs_hybrid_rrf",  # same BM25 1-row census cross (lexical arm) + the single query vector crossed into the corpus (semantic arm)
    "docs_hybrid_rrf_routed",  # same BM25 census cross + the 1-row probe-list relation broadcast into the IVF-routed candidates (sim_ann_ivf's shape)
    "docs_hybrid_route_cost",  # composes both hybrid queries' plans (their documented census/query-vector/probe-list broadcasts), nothing new
    "events_kll_merge_quantiles",  # 1-row merged-KLL aggregate crossed with the 1-row single-pass aggregate so both certification subtrees run in ONE job
    "events_kmv_user_overlap",  # pair panel: the ≤|event_types|-row key census self-joined on < (the oracle's n a JOIN n b shape) — sketch-bounded, never corpus-sized
}


#: Unpartitioned-WindowExec allowlist: frames whose GLOBAL window
#: provably runs over a BOUNDED relation (an aggregate of keys /
#: vocabulary / buckets — never the fact corpus). Everything else must
#: rank via a partitioned window, operators/ranking.global_row_number
#: / global_ntile, or operators/quantiles.exact_nearest_rank — a bare
#: Window.orderBy over corpus-sized input moves EVERY row to one task
#: (r13 verdict 'what's wrong' #2: emb_hygiene_audit shipped exactly
#: that and is fixed; this guard makes the regression structural).
GLOBAL_WINDOW_OK = {
    "docs_budget_waterfill",  # prefix sums over the O(sources) per-key weight table (bounded by the source census, not the corpus)
    "docs_vocab_topp",  # cumulative token-mass over the Heaps-bounded vocabulary head
    "docs_token_budget_sample",  # cumulative over the fixed 1024-bucket histogram (per-bucket window is partitioned; only the bucket rollup is global)
    "docs_hybrid_rrf",  # arm-rank windows over the two top-K-limited arm frames (K=30, data-independent constant — TakeOrderedAndProject feeds them, never the corpus)
    "docs_hybrid_rrf_routed",  # same bounded arm-rank windows (the semantic arm's rank runs over ann_ivf_topk's top-K frame)
    "docs_hybrid_route_cost",  # the same bounded arm windows plus position windows over the two 20-row FUSED frames (constant-size by construction)
}


def _depth(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-*("))


def has_single_partition_window(plan: str) -> bool:
    """True iff the plan contains a Window node whose required child
    distribution is Exchange SinglePartition — i.e. an unpartitioned
    window function that sorts its whole input on one task."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if not line.lstrip(" :+-*").startswith("Window"):
            continue
        d = _depth(line)
        for nxt in lines[i + 1:]:
            if not nxt.strip():
                break
            if _depth(nxt) <= d:
                break
            body = nxt.lstrip(" :+-*")
            if body.startswith("Exchange"):
                # the first exchange below the Window is its own input
                # requirement; anything deeper belongs to other ops
                if "SinglePartition" in body:
                    return True
                break
    return False


@pytest.mark.parametrize(
    "name", [n for n in Q.all_queries() if n not in SIDE_EFFECTING]
)
def test_no_unpartitioned_corpus_window(spark, name):
    spec = Q.get(name)
    df = spec.fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name in GLOBAL_WINDOW_OK:
        return  # documented bounded-frame global window
    assert not has_single_partition_window(plan), (
        f"{name} plans a Window over Exchange SinglePartition — the"
        " whole input sorts on ONE task at scale. Partition the"
        " window, or use operators/ranking.global_row_number /"
        " global_ntile / operators/quantiles.exact_nearest_rank; if"
        " the frame is provably bounded (keys/vocab/buckets, never"
        " the corpus), add it to GLOBAL_WINDOW_OK with the reason"
    )


#: Driver-side planning ceiling (r11 verdict order #3). Three rounds
#: running, a new operator shipped with a multi-second PER-CALL driver
#: analysis/codegen tree (r10: the ~7k-node ANN audit panel fold; r11:
#: the ~8k-node PQ encode literal) and was only caught in a bench
#: read. This bounds the analyze+optimize+physical-planning wall of
#: every registered query's RETURNED frame so the next constant-folded
#: literal monster fails CI instead. Measured baseline (r12, sf0.001,
#: uncontended local[32]): max 0.30 s (docs_classifier_chargram_skill),
#: p50 ~0.03 s — the ceiling is 5x the max; the historical offenders
#: measured 1.3-7 s. Construction-time jobs (iterative k-means/CC
#: collects) are deliberately OUTSIDE the timer: this guards planning
#: cost, which is what recurs.
PLAN_COST_CEILING_SEC = 1.5


@pytest.mark.parametrize(
    "name", [n for n in Q.all_queries() if n not in SIDE_EFFECTING]
)
def test_no_cartesian_and_no_unjustified_nested_loop(spark, name):
    import time

    spec = Q.get(name)
    df = spec.fn(spark, SF_SMALL)
    t0 = time.monotonic()
    plan = df._jdf.queryExecution().executedPlan().toString()
    planning_wall = time.monotonic() - t0
    assert planning_wall <= PLAN_COST_CEILING_SEC, (
        f"{name} spends {planning_wall:.2f}s in driver-side plan"
        " analysis/optimization (ceiling"
        f" {PLAN_COST_CEILING_SEC}s) — the constant-folded-literal"
        " expression-tree class; move the big side to an Arrow kernel"
        " or the tiny side driver-side (see"
        " functions/similarity._pq_reconstruct_arrow)"
    )
    assert "CartesianProduct" not in plan, (
        f"{name} plans a CartesianProduct — quadratic at scale"
    )
    if name not in SCALAR_BROADCAST_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a BroadcastNestedLoopJoin; if this is a"
            " deliberate 1-row scalar broadcast, add it to"
            " SCALAR_BROADCAST_OK with the reason"
        )

"""K-means trainer (functions/clustering) — convergence, determinism,
partition invariance, and the trained-centroid handoff to IVF routing.

The oracle parity of the full pipeline is covered by the driver-checked
`emb_kmeans` query (tests/test_queries.py parametrizes it vs DuckDB);
these tests pin the algorithmic properties the oracle can't express.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.functions import clustering as cl
from meteo_etl_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMALL, "embeddings")


def test_inertia_monotone_nonincreasing(spark, emb):
    """Lloyd's guarantee holds in the quantized arithmetic: each
    assignment+update step can't increase the exact integer inertia."""
    _, hist = cl.kmeans_fit(emb, k=cl.KMEANS_K, iters=4)
    assert len(hist) == 4
    assert all(a >= b for a, b in zip(hist, hist[1:])), hist


def test_deterministic_and_partition_invariant(spark, emb):
    """Same centroids regardless of input partitioning — integer sums
    are order-independent, so the layout can't leak into the result."""
    c1, h1 = cl.kmeans_fit(emb)
    c2, h2 = cl.kmeans_fit(emb.repartition(13))
    assert c1 == c2
    assert h1 == h2


def test_clusters_nonempty_and_cover_corpus(spark, emb):
    out = cl.kmeans_summary(emb).collect()
    assert [r.cluster for r in out] == list(range(1, cl.KMEANS_K + 1))
    assert sum(r.n for r in out) == emb.count()
    assert all(r.n > 0 for r in out)


def test_trained_centroids_route_ivf(spark, emb):
    """Trained centroids slot into argmax-dot routing: every vector
    lands in a valid list and the lists partition the corpus."""
    cents = cl.trained_ivf_centroids(emb)
    assert len(cents) == cl.KMEANS_K
    assert all(len(c) == len(cents[0]) for c in cents)
    from meteo_etl_spark.functions.similarity import dot

    v = F.col("embedding").cast("array<double>")
    dots = F.array(
        *[dot(v, F.array(*[F.lit(w) for w in c])) for c in cents]
    )
    lst = F.array_position(dots, F.array_max(dots))
    counts = (
        emb.select(lst.alias("lst"))
        .groupBy("lst")
        .count()
        .collect()
    )
    assert sum(r["count"] for r in counts) == emb.count()
    assert all(1 <= r.lst <= cl.KMEANS_K for r in counts)


def test_empty_cluster_keeps_previous_centroid(spark):
    """A cluster that attracts no points must carry its centroid
    forward (COALESCE arm of the update, mirrored in the oracle)."""
    # md5 seed order of ids 0,1,2 is 1,2,0 — so with duplicates at ids
    # 1 and 2 both seeds are identical, every point tie-breaks into
    # cluster 1, and cluster 2 goes empty: it must keep its seed.
    rows = [(0, [-0.5] * 4), (1, [0.5] * 4), (2, [0.5] * 4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # iter 1: all points tie into cluster 1 (identical seeds), cluster 2
    # is empty and must keep its seed centroid, not zero out.
    cents1, _ = cl.kmeans_fit(df, k=2, iters=1)
    assert cents1 == [[16] * 4, [50] * 4]  # floor((50+50-50)/3)=16; kept seed
    # iter 2: the kept centroid re-attracts the duplicates — Lloyd's
    # recovers the true clustering from the empty-cluster state.
    cents2, _ = cl.kmeans_fit(df, k=2, iters=2)
    assert cents2 == [[-50] * 4, [50] * 4]


# --- semantic dedup (SemDeDup): cluster-blocked cosine pruning -------------


def test_semantic_dedup_drops_exact_duplicate_lower_id_wins(spark, emb):
    """An exact copy of an existing vector (same embedding, higher id)
    lands in the same cluster with cosine 1 and must be dropped; its
    lower-id original decides for both."""
    some = emb.orderBy("vec_id").limit(1).collect()[0]
    dup = spark.createDataFrame(
        [(10_000, list(some.embedding), 0)], emb.schema
    )
    out = {r.vec_id: r for r in cl.semantic_dedup(emb.unionByName(dup)).collect()}
    assert not out[10_000].is_kept
    assert out[10_000].n_dup_lower >= 1
    assert out[10_000].cluster == out[some.vec_id].cluster


def test_semantic_dedup_block_diagonalization_is_complete(spark, emb):
    """Sub-blocking a cluster's pair space must not lose pairs: the
    1-block plan (plain within-cluster join) and the default blocked
    plan return identical keep-sets and dup counts."""
    a = sorted(map(tuple, cl.semantic_dedup(emb, blocks=1).collect()))
    b = sorted(map(tuple, cl.semantic_dedup(emb).collect()))
    assert a == b


def test_semantic_dedup_partition_invariant(spark, emb):
    """Integer arithmetic end-to-end: input layout cannot leak into
    the keep-set."""
    a = sorted(map(tuple, cl.semantic_dedup(emb).collect()))
    b = sorted(map(tuple, cl.semantic_dedup(emb.repartition(13)).collect()))
    assert a == b


# --- cluster-blocked k-NN graph --------------------------------------------


def test_knn_graph_invariants_and_block_completeness(spark, emb):
    """Adjacency-list contract: no self-edges, ranks contiguous from 1
    per source, cosine non-increasing along each source's ranks — and
    the blocked pair enumeration loses nothing vs the 1-block plan."""
    g = cl.knn_graph(emb).collect()
    by_src: dict[int, list] = {}
    for r in g:
        assert r.src != r.dst
        by_src.setdefault(r.src, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= cl.KNN_NEIGHBORS
        assert all(a.cos >= b.cos for a, b in zip(rs, rs[1:]))
    single = sorted(map(tuple, cl.knn_graph(emb, blocks=1).collect()))
    assert single == sorted(map(tuple, g))


def test_knn_graph_exact_duplicate_is_rank_one_both_ways(spark, emb):
    """An exact copy of a vector must be its original's rank-1
    neighbor (cos 1.0) and vice versa."""
    some = emb.orderBy("vec_id").limit(1).collect()[0]
    dup = spark.createDataFrame([(10_000, list(some.embedding), 0)], emb.schema)
    g = {
        (r.src, r.rank): r
        for r in cl.knn_graph(emb.unionByName(dup)).collect()
    }
    assert g[(some.vec_id, 1)].dst == 10_000 and g[(some.vec_id, 1)].cos == 1.0
    assert g[(10_000, 1)].dst == some.vec_id and g[(10_000, 1)].cos == 1.0


def test_literal_and_join_assignment_paths_agree(spark, emb):
    """The large-k 1-row-broadcast join assignment is value-identical
    (cluster AND dist2) to the literal-compiled path on the same
    trained centroids — the k > ASSIGN_LITERAL_MAX crossover changes
    the physical plan only."""
    q = emb.select(
        F.col("vec_id"), cl.quantize(F.col("embedding")).alias("qv")
    )
    cents, _ = cl.kmeans_fit(emb, k=8, iters=2)
    lit = cl.assign_clusters(q, cents, with_dist=True).select(
        "vec_id", "cluster", "dist2"
    )
    jn = cl._assign_clusters_join(q, cents, with_dist=True).select(
        "vec_id", "cluster", "dist2"
    )
    assert lit.exceptAll(jn).count() == 0
    assert jn.exceptAll(lit).count() == 0


def test_large_k_routes_to_join_path_and_trains(spark, emb):
    """k > ASSIGN_LITERAL_MAX trains end-to-end through the broadcast
    join path: every vector assigned, inertia non-increasing, and the
    executed plan carries the 1-row packed-centroid broadcast instead
    of a k-literal expression tree."""
    k = cl.ASSIGN_LITERAL_MAX + 36
    cents, hist = cl.kmeans_fit(emb, k=k, iters=2)
    assert len(cents) == k
    assert all(a >= b for a, b in zip(hist, hist[1:])), hist
    q = emb.select(
        F.col("vec_id"), cl.quantize(F.col("embedding")).alias("qv")
    )
    assigned = cl.assign_clusters(q, cents)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row centroid pack
    n = emb.count()
    assert assigned.filter(F.col("cluster").isNotNull()).count() == n
    assert assigned.filter(
        (F.col("cluster") >= 1) & (F.col("cluster") <= k)
    ).count() == n


def test_ivf_route_join_matches_literal_routing(spark, emb):
    """The packed-broadcast IVF router (large-k path) assigns every
    vector the SAME inverted list as the literal-compiled ivf_list_of
    on the default centroid set — and routes a trained large-k set the
    literal path cannot express."""
    from meteo_etl_spark.functions import similarity as sim

    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    lit = vecs.withColumn("lst", sim.ivf_list_of(F.col("v"))).select(
        "vec_id", "lst"
    )
    default_cents = [sim.ivf_centroid(k) for k in range(sim.IVF_LISTS)]
    jn = sim.ivf_route_join(vecs, default_cents).select("vec_id", "lst")
    assert lit.exceptAll(jn).count() == 0
    assert jn.exceptAll(lit).count() == 0

    # trained large-k set: every vector routed to a valid list
    trained = cl.trained_ivf_centroids(emb, k=cl.ASSIGN_LITERAL_MAX + 36, iters=1)
    routed = sim.ivf_route_join(vecs, trained)
    n = vecs.count()
    assert (
        routed.filter(
            (F.col("lst") >= 1) & (F.col("lst") <= len(trained))
        ).count()
        == n
    )


def test_arrow_assignment_matches_join_path_exactly(spark, emb):
    """The Arrow/numpy kernel is value-identical (cluster AND dist2,
    integer-exact) to the broadcast-join path on the same trained
    centroids — the k > ASSIGN_ARROW_MIN crossover changes only the
    physical execution of the O(k·dim) distance work."""
    q = emb.select(
        F.col("vec_id"), cl.quantize(F.col("embedding")).alias("qv")
    )
    cents, _ = cl.kmeans_fit(emb, k=8, iters=2)
    # pad with synthetic far-away centroids so ties/ordering get real
    # coverage beyond the 8 trained ones
    cents = cents + [[c + 7 * (j + 1) for c in cents[j % 8]] for j in range(92)]
    jn = cl._assign_clusters_join(q, cents, with_dist=True).select(
        "vec_id", "cluster", "dist2"
    )
    ar = cl._assign_clusters_arrow(q, cents, with_dist=True).select(
        "vec_id", "cluster", "dist2"
    )
    assert jn.exceptAll(ar).count() == 0
    assert ar.exceptAll(jn).count() == 0


def test_arrow_assignment_broadcasts_are_bounded(spark, emb):
    """Repeated Arrow-assignment passes must not accumulate centroid
    broadcasts without bound (each is ~25 MB at k=5e4): the live set
    is capped, the oldest unpersisted on overflow, and a frame whose
    broadcast was EVICTED still computes (unpersist drops executor
    copies only; the driver re-serves them on demand)."""
    cl.release_assignment_broadcasts()
    q = emb.select(
        F.col("vec_id"), cl.quantize(F.col("embedding")).alias("qv")
    )
    cents = [[(i + j) % 7 for j in range(64)] for i in range(4)]
    frames = [
        cl._assign_clusters_arrow(q, cents, with_dist=False)
        for _ in range(2 * cl.MAX_LIVE_ASSIGN_BROADCASTS)
    ]
    assert len(cl._LIVE_ASSIGN_BROADCASTS) == cl.MAX_LIVE_ASSIGN_BROADCASTS
    # frames[0]'s broadcast was evicted — it must still execute
    counts = {f.count() for f in frames}
    assert counts == {q.count()}
    assert cl.release_assignment_broadcasts() == cl.MAX_LIVE_ASSIGN_BROADCASTS
    assert not cl._LIVE_ASSIGN_BROADCASTS


def test_semdedup_scale_k5000_routes_to_arrow_and_stays_mapside(spark, emb):
    """k=5000 (real SemDeDup territory) must route through the Arrow
    kernel: plan shows MapInPandas over the corpus scan with NO
    exchange (assignment is a pure map — the corpus never shuffles)
    and no BroadcastNestedLoopJoin (the packed-join shape it replaces
    at this k), and it executes: every vector assigned a cluster in
    range with a nonnegative exact distance."""
    import numpy as np

    rng = np.random.default_rng(11)
    k = 5000
    cents = [[int(x) for x in np.floor(rng.standard_normal(64) * 100)] for _ in range(k)]
    q = emb.select(
        F.col("vec_id"), cl.quantize(F.col("embedding")).alias("qv")
    )
    assigned = cl.assign_clusters(q, cents, with_dist=True)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange" not in plan
    n = q.count()
    ok = assigned.filter(
        (F.col("cluster") >= 1)
        & (F.col("cluster") <= k)
        & (F.col("dist2") >= 0)
    ).count()
    assert ok == n


def test_arrow_assignment_guards_exactness_bound(spark, emb):
    """Components at/above ±2^20 would break float64 integer-exactness;
    both ends must refuse rather than round."""
    q = emb.select(
        F.col("vec_id"), cl.quantize(F.col("embedding")).alias("qv")
    )
    big = [[cl._ARROW_ABS_BOUND] * 64]
    with pytest.raises(ValueError, match="integer-exact"):
        cl._assign_clusters_arrow(q, big, with_dist=False)


def test_arrow_assignment_guards_dim_dependent_bound(spark, emb):
    """The exactness bound is 4*dim*M^2 <= 2^53, not per-component
    alone: dim 4096 at components just UNDER the +-2^20 cap must be
    refused driver-side (it would silently round), while the same dim
    at small components is fine."""
    q = emb.select(
        F.col("vec_id"), cl.quantize(F.col("embedding")).alias("qv")
    )
    near_cap = cl._ARROW_ABS_BOUND - 1
    with pytest.raises(ValueError, match="exactness bound"):
        cl._assign_clusters_arrow(q, [[near_cap] * 4096], with_dist=False)
    # dim 64 at the same magnitude passes the dim check (4*64*2^40 << 2^53)
    df = cl._assign_clusters_arrow(q, [[near_cap] * 64], with_dist=False)
    assert "cluster" in df.columns


def test_broadcast_cache_tolerates_dead_session_entries(spark, emb):
    """ADVICE r9: the live-broadcast deque is process-global, so an
    entry can outlive the SparkContext that made it. Eviction and
    release must skip such corpses (unpersist raising) instead of
    aborting the loop midway and stranding the remaining entries."""

    class _Dead:
        def unpersist(self, blocking):
            raise RuntimeError("SparkContext was shut down")

    cl.release_assignment_broadcasts()
    cl._LIVE_ASSIGN_BROADCASTS.append(_Dead())
    cl._LIVE_ASSIGN_BROADCASTS.append(_Dead())
    q = emb.select(
        F.col("vec_id"), cl.quantize(F.col("embedding")).alias("qv")
    )
    cents = [[(i + j) % 7 for j in range(64)] for i in range(4)]
    # eviction path: appending past the cap unpersists the dead
    # oldest entries without raising
    frames = [
        cl._assign_clusters_arrow(q, cents, with_dist=False)
        for _ in range(cl.MAX_LIVE_ASSIGN_BROADCASTS)
    ]
    assert len(cl._LIVE_ASSIGN_BROADCASTS) == cl.MAX_LIVE_ASSIGN_BROADCASTS
    assert frames[-1].count() == q.count()
    # release path: a fresh dead entry among live ones — the loop
    # drains everything, counting only real releases
    cl._LIVE_ASSIGN_BROADCASTS.appendleft(_Dead())
    released = cl.release_assignment_broadcasts()
    assert released == cl.MAX_LIVE_ASSIGN_BROADCASTS
    assert not cl._LIVE_ASSIGN_BROADCASTS


def test_unpersist_quiet_warns_on_live_context_failure_only():
    """r10 ADVICE: only the stopped-context corpse is silent; any
    other unpersist failure means executor copies may leak and must
    surface as a warning."""
    import warnings as w

    from meteo_etl_spark.functions.clustering import _unpersist_quiet

    class _Raises:
        def __init__(self, msg):
            self._msg = msg

        def unpersist(self, blocking):
            raise RuntimeError(self._msg)

    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        assert _unpersist_quiet(_Raises("SparkContext was shut down")) is False
    assert not caught, [str(c.message) for c in caught]

    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        assert _unpersist_quiet(_Raises("RPC timeout talking to executor")) is False
    assert len(caught) == 1 and "may leak" in str(caught[0].message), [
        str(c.message) for c in caught
    ]

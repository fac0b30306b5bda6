"""Connected components (operators/graph) — closure, isolation,
chain-depth convergence, and the non-convergence guard."""

from __future__ import annotations

import pytest

from meteo_etl_spark.operators.graph import component_summary, connected_components


def _cc(spark, nodes, edges, **kw):
    ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark.createDataFrame(edges or [(None, None)], "src long, dst long")
    if not edges:
        edf = edf.filter("src IS NOT NULL")
    out = connected_components(ndf, edf, **kw)
    return {r.node: r.component for r in out.collect()}


def test_transitive_closure_merges_chains(spark):
    # 1-2, 2-3 and 10-11: two components + singleton 99
    got = _cc(spark, [1, 2, 3, 10, 11, 99], [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_isolated_nodes_are_their_own_component(spark):
    got = _cc(spark, [5, 6], [])
    assert got == {5: 5, 6: 6}


def test_deep_chain_converges_and_direction_agnostic(spark):
    # a 12-node chain written high->low: min label must flow the full
    # length regardless of edge direction (propagation is symmetric).
    n = 12
    edges = [(i + 1, i) for i in range(1, n)]
    got = _cc(spark, list(range(1, n + 1)), edges)
    assert set(got.values()) == {1}


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [1, 2, 3, 4], [(1, 2), (2, 3), (3, 4)], max_iters=1)


def test_component_summary_sizes(spark):
    ndf = spark.createDataFrame([(n,) for n in [1, 2, 3, 7]], "node long")
    edf = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    cc = connected_components(ndf, edf)
    summ = {
        r.component: (r.size, r.is_singleton)
        for r in component_summary(cc).collect()
    }
    assert summ == {1: (3, False), 7: (1, True)}


def test_pagerank_hand_computed_and_partition_invariant(spark):
    """3 integer power iterations on a 4-node graph, checked against
    values computed by hand (floor division at every step); isolated
    nodes settle at the pure-teleport score; input layout is
    irrelevant."""
    from meteo_etl_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(1,), (2,), (3,), (4,)], "node long")
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1)], "src long, dst long"
    )
    got = {r.node: r.score for r in pagerank(nodes, edges).collect()}
    # iter1: s={1:1_000_000, 2:575_000, 3:575_000}
    # iter2: s={1:638_750, 2:575_000, 3:575_000}
    # iter3: 1 gets 85*575_000 -> 638_750; 2,3 get 85*(638_750 div 2)
    assert got == {1: 638_750, 2: 421_468, 3: 421_468, 4: 150_000}

    re = {
        r.node: r.score
        for r in pagerank(nodes.repartition(7), edges.repartition(5)).collect()
    }
    assert re == got


def test_triangle_count_correct_and_degree_orientation_bounds_fanout(spark):
    """Skew fixture: a hub star (degree 40, zero triangles) plus a
    K5 clique (10 triangles) plus one hub-clique bridge. The count
    must be exact, and the degree-ordered orientation must leave the
    hub with ~zero out-edges (its neighbors all rank lower), where
    id-ordering a mid-id hub would keep O(degree) out-edges and build
    O(degree^2) wedges."""
    from itertools import combinations

    from meteo_etl_spark.operators.graph import triangle_count

    hub = 500  # mid-range id: id-ordering would orient ~half outward
    star = [(min(hub, leaf), max(hub, leaf)) for leaf in range(40)] + [
        (min(hub, leaf), max(hub, leaf)) for leaf in range(960, 1000)
    ]
    clique = list(combinations([100, 200, 300, 400, 600], 2))
    bridge = [(100, 500)]
    edges = spark.createDataFrame(
        sorted(set(star + clique + bridge)), "u long, v long"
    )
    assert triangle_count(edges) == 10  # C(5,3) from K5; star adds none

    # orientation bound: hub degree 81, every neighbor has degree <= 5,
    # so ALL hub edges point INTO the hub -> hub out-degree 0
    deg = (
        edges.selectExpr("u as n")
        .unionAll(edges.selectExpr("v as n"))
        .groupBy("n")
        .count()
    )
    hub_deg = {r.n: r["count"] for r in deg.collect()}[hub]
    assert hub_deg == 81
    # id-ordered out-degree of the hub would be 40 (leaves 960..999
    # sort above 500); degree-ordering must give 0.
    from pyspark.sql import functions as F

    d = deg.withColumnRenamed("n", "node").withColumnRenamed("count", "deg")
    wd = (
        edges.join(d.selectExpr("node as u", "deg as du"), "u")
        .join(d.selectExpr("node as v", "deg as dv"), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    out_src = wd.select(F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"))
    hub_out = out_src.filter(F.col("src") == hub).count()
    id_ordered_hub_out = edges.filter(F.col("u") == hub).count()
    assert hub_out == 0
    assert id_ordered_hub_out == 40

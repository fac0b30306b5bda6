"""Property-based checks of the integer-exact operators against pure
Python reference implementations (the arithmetic is deterministic, so
a dict-and-loop replica must agree bit for bit on ANY input)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from meteo_etl_spark.operators.graph import (
    PAGERANK_DAMPING_PCT,
    PAGERANK_ITERS,
    PAGERANK_SCALE,
    pagerank,
)


def _pagerank_ref(nodes, edges, iters, scale, d):
    score = {n: scale for n in nodes}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    for _ in range(iters):
        insum = {n: 0 for n in nodes}
        for s, t in edges:
            insum[t] += score[s] // outdeg[s]
        score = {
            n: ((100 - d) * scale + d * insum[n]) // 100 for n in nodes
        }
    return score


graph_st = st.integers(min_value=2, max_value=7).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n - 1),
                st.integers(min_value=0, max_value=n - 1),
            ).filter(lambda e: e[0] != e[1]),
            min_size=0,
            max_size=12,
            unique=True,
        ),
    )
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(g=graph_st)
def test_pagerank_matches_python_reference(spark, g):
    n, edges = g
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], "node long")
    edges_df = (
        spark.createDataFrame(edges, "src long, dst long")
        if edges
        else spark.createDataFrame([], "src long, dst long")
    )
    got = {r.node: r.score for r in pagerank(nodes_df, edges_df).collect()}
    exp = _pagerank_ref(
        range(n), edges, PAGERANK_ITERS, PAGERANK_SCALE, PAGERANK_DAMPING_PCT
    )
    assert got == exp


doc_st = st.text(alphabet="ab c", min_size=1, max_size=30)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["s1", "s2", "s3"]), doc_st),
        min_size=1,
        max_size=12,
    )
)
def test_mixture_plan_matches_python_reference(spark, docs):
    from meteo_etl_spark.functions.sampling import mixture_plan

    df = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(docs)],
        "doc_id long, source string, text string",
    )
    got = {
        r.source: (r.n_docs, r.n_tokens, r.natural_share, r.target_share, r.sampling_rate)
        for r in mixture_plan(df).collect()
    }
    per: dict[str, list[int]] = {}
    for s, t in docs:
        n_tok = len(t.split(" "))  # same empty-token semantics as F.split
        d = per.setdefault(s, [0, 0])
        d[0] += 1
        d[1] += n_tok
    total = sum(v[1] for v in per.values())
    k = len(per)
    for s, (nd, nt) in per.items():
        g = got[s]
        assert g[0] == nd and g[1] == nt
        assert g[2] == round(nt / total, 6)
        assert g[3] == round(1.0 / k, 6)
        assert g[4] == round(total / (k * nt), 6)


def _triangles_ref(edges):
    es = {tuple(sorted(e)) for e in edges}
    nodes = {x for e in es for x in e}
    adj = {n: set() for n in nodes}
    for u, v in es:
        adj[u].add(v)
        adj[v].add(u)
    count = 0
    for u, v in es:
        count += len(adj[u] & adj[v])
    return count // 3  # each triangle counted once per edge


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ).filter(lambda e: e[0] != e[1]),
        min_size=0,
        max_size=20,
    )
)
def test_triangle_join_matches_python_reference(spark, edges):
    """The ordered 2-path + closing-edge join counts exactly the
    triangles a set-intersection reference finds, on any graph."""
    from pyspark.sql import functions as F

    canon = sorted({(min(e), max(e)) for e in edges})
    ed = (
        spark.createDataFrame(canon, "u long, v long")
        if canon
        else spark.createDataFrame([], "u long, v long")
    )
    e1 = ed.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = ed.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = ed.select(F.col("u").alias("a"), F.col("v").alias("c"))
    got = e1.join(e2, "b").join(e3, ["a", "c"]).count()
    assert got == _triangles_ref(edges)

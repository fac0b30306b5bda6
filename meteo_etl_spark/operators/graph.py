"""Connected components over a pair list — the dedup-cluster builder.

Near-dup detection (``functions/dedup``) emits PAIRS; a training-data
pipeline needs CLUSTERS: every document labeled with a canonical
representative so one keep-policy pass can drop the rest. That closure
is a connected-components problem, solved here as iterative min-label
propagation in pure DataFrame ops:

- each node starts labeled with itself;
- per iteration, every node takes the min of its own label and its
  neighbors' labels (one equi-join on the node key + one partial-agg
  min — both sides hash-partitioned on the same key, so Catalyst
  plans a single co-partitioned shuffle per round);
- the frontier is checkpointed each round (``localCheckpoint``) so
  lineage — and with it, plan size and recovery cost — stays O(1) in
  the number of iterations instead of O(iterations);
- convergence is detected engine-side (count of improvable labels),
  k·diameter rounds total.

Scale judgment: propagation converges in O(component diameter)
rounds. LSH near-dup components are shallow (pairs are mutually
similar documents — diameters of 1-3), so this is the right shape for
the dedup use case at 100 TB: ~3 co-partitioned shuffles of (node,
label) longs. For adversarial deep graphs (long chains), the
alternating large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond") converges in
O(log n) rounds with the same per-round plan; the per-round join
below is deliberately identical to its building block.

Reference: no graph surface exists in the reference ETL; this is part
of the mandated LLM-pipeline extension (SURVEY.md §2.4 dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 25,
) -> DataFrame:
    """Label every node with the smallest node id reachable from it.

    ``nodes`` carries one row per node (isolated nodes become their own
    component); ``edges`` is an undirected pair list. Returns
    ``(node, component)``.
    """
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionAll(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .persist()
    )
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("label")
    )
    try:
        for _ in range(max_iters):
            nbr = (
                sym.join(
                    labels.select(
                        F.col("node").alias("a"), F.col("label").alias("albl")
                    ),
                    "a",
                )
                .groupBy(F.col("b").alias("node"))
                .agg(F.min("albl").alias("nbr_min"))
            )
            # lazy checkpoint + count = ONE job per round: the count
            # action materializes the checkpoint it filters (eager=True
            # ran a separate materialization job first — same data,
            # same O(1) lineage, one fewer scheduler round trip)
            merged = (
                labels.join(nbr, "node", "left")
                .select(
                    "node",
                    "label",
                    F.coalesce("nbr_min", F.col("label")).alias("m"),
                )
                .localCheckpoint(eager=False)
            )
            improvable = merged.filter(F.col("m") < F.col("label")).count()
            labels = merged.select(
                "node", F.least("label", "m").alias("label")
            )
            if improvable == 0:
                return labels.select("node", F.col("label").alias("component"))
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(deep-chain graph — use the star-contraction variant)"
        )
    finally:
        sym.unpersist()


def component_summary(cc: DataFrame) -> DataFrame:
    """Per-component size + canonical representative (the min label is
    its own id). One partial-agg shuffle on the component key."""
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .withColumn("is_singleton", F.col("size") == 1)
    )


PAGERANK_SCALE = 1_000_000
PAGERANK_DAMPING_PCT = 85
PAGERANK_ITERS = 3


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = PAGERANK_ITERS,
    scale: int = PAGERANK_SCALE,
    damping_pct: int = PAGERANK_DAMPING_PCT,
) -> DataFrame:
    """Integer-arithmetic PageRank over a DIRECTED edge list —
    ``(node, score)`` after ``iters`` power iterations of
    ``score' = ((100 - d)·scale + d·Σ_in floor(score_src / outdeg_src))
    div 100`` (the per-node-teleport formulation, so scores need not
    sum to 1 and an isolated node settles at ``(100-d)%·scale``).

    Every operation is int64 (floor division for the per-edge
    contribution and the damping mix), so iterations are bit-exact and
    an oracle can replay them — the same exactness discipline as
    ``kmeans_fit``. Mass lost to flooring is bounded by outdeg per node
    per round: ranking-irrelevant, determinism-essential. Dangling
    nodes (no out-edges) leak their damped mass, the standard
    simplification; symmetrize the edge list if that matters.

    Scale shape per iteration: one join of edges to scores on the src
    key + one partial-agg sum shuffled on dst — both hash-partitioned
    on node ids, the same co-partitioned round as
    ``connected_components`` — with the frontier localCheckpoint'ed so
    lineage stays O(1) in iterations. At 100 TB-scale graphs this is
    k·iters co-partitioned shuffles of (node, long) rows.
    """
    out_deg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    base = nodes.select(F.col(node_col).alias("node"))
    scores = base.select("node", F.lit(scale).cast("long").alias("score"))
    src_edges = edges.select(
        F.col(src_col).alias("node"), F.col(dst_col).alias("dst")
    ).persist()
    teleport = (100 - damping_pct) * scale
    try:
        for _ in range(iters):
            contrib = (
                src_edges.join(scores, "node")
                .join(out_deg, "node")
                .select(
                    F.col("dst").alias("node"),
                    F.expr("score div outdeg").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("insum"))
            )
            scores = (
                base.join(contrib, "node", "left")
                .select(
                    "node",
                    F.expr(
                        f"CAST(({teleport} + {damping_pct}"
                        " * coalesce(insum, CAST(0 AS BIGINT)))"
                        " div 100 AS BIGINT)"
                    ).alias("score"),
                )
                .localCheckpoint(eager=True)
            )
        return scores
    finally:
        src_edges.unpersist()


def triangle_count(edges: DataFrame) -> int:
    """Exact triangle count over an undirected edge list via
    DEGREE-ORDERED orientation (``edges``: canonical ``u < v`` pairs,
    deduplicated).

    Every edge is re-pointed at its higher-(degree, id) endpoint, so a
    node's oriented out-degree is its count of HIGHER-ranked neighbors
    — bounded by O(sqrt(m)) on any graph (a node of degree d > sqrt(m)
    has fewer than sqrt(m) neighbors of even higher degree). The wedge
    join (pairs of out-edges sharing a source) therefore fans out
    quadratically in sqrt(m) per node instead of quadratically in raw
    degree: on a star/hub graph the id-ordered variant builds O(d²)
    2-paths at the hub while this builds O(1). Each triangle
    {a ≺ b ≺ c} (≺ = (degree, id) order) is counted exactly once as
    the wedge (a→b, a→c) closed by the oriented edge b→c. Two
    co-partitioned equi-joins on node keys; the count is
    orientation-invariant, so callers' oracles need no change.
    """
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # (degree, id) rank as one orderable long pair packed per endpoint
    with_deg = (
        edges.join(deg.withColumnRenamed("n", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("deg", "dv"), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oe = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddeg"),
    ).persist()
    try:
        e1 = oe.select(F.col("src").alias("a"), F.col("dst").alias("b"),
                       F.col("ddeg").alias("db"))
        e2 = oe.select(F.col("src").alias("a"), F.col("dst").alias("c"),
                       F.col("ddeg").alias("dc"))
        wedges = e1.join(e2, "a").filter(
            (F.col("db") < F.col("dc"))
            | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
        )
        closing = oe.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        return wedges.join(closing, ["b", "c"]).count()
    finally:
        oe.unpersist()

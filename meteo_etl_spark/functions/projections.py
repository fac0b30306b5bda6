"""Random projection (Johnson-Lindenstrauss) over an embedding column
— the DATA-INDEPENDENT dimensionality cut beside `functions/pca.py`'s
data-dependent one: a fixed ±1 Rademacher matrix (Achlioptas 2001)
shrinks dim 64 → 16 with distances preserved in expectation, no
training pass, no model to ship — the right tool when vectors arrive
faster than a PCA refit cycle (streaming crawls) or when the reduction
must be reproducible from a constant alone at every site of a
1000-executor job.

Architecture:

- The matrix is md5-seeded per (component, dimension) — the SAME
  convention as ``similarity.hyperplane`` — and enters BOTH engines as
  literal coefficient arrays, so the DuckDB oracle replays the exact
  projection. No RNG state anywhere.
- Projection is one codegen'd map: per output component, a sequential
  ``zip_with``/``aggregate`` fold of the vector against a literal
  array (IEEE-exact, same order both engines), scaled by 1/sqrt(K).
  K = 16 makes the scale EXACTLY 4.0, so even the scale division is
  FP-exact. No UDF, no shuffle — the projected frame is written in
  the same scan that reads the vectors.
- The audit (``rp_distortion_audit``) measures what JL promises:
  per panel query, the distribution of dist²(projected)/dist²(original)
  over all corpus pairs — snapped to integer micro-units BEFORE the
  group aggregate so the result is bit-identical on any partitioning
  (the emb_quant_audit discipline).

Reference parity: none — training-pipeline extension surface
(SURVEY.md §2.4). The registered ``emb_rp_audit`` query hash-checks
the full projection + audit against a DuckDB replay.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meteo_etl_spark.functions.lits import dlit
from meteo_etl_spark.functions.similarity import EMBEDDING_DIM, dot
from meteo_etl_spark.operators.parallelism import fan_out

#: default output dimensionality: 64 -> 16 (4x cut); sqrt(16) = 4.0 is
#: exactly representable, so the JL scale costs zero FP divergence.
RP_OUT_DIM = 16


def rp_plane(k: int, dim: int = EMBEDDING_DIM) -> list[float]:
    """Deterministic ±1 Rademacher row for output component ``k`` —
    md5-seeded per entry (the ``similarity.hyperplane`` convention).
    Shared with the oracle SQL generator: both engines see the same
    literal coefficients."""
    out = []
    for i in range(dim):
        h = hashlib.md5(f"rp{k}:{i}".encode()).hexdigest()
        out.append(1.0 if int(h[:2], 16) % 2 == 0 else -1.0)
    return out


def random_project(
    vcol: Column, out_dim: int = RP_OUT_DIM, dim: int = EMBEDDING_DIM
) -> Column:
    """array<double> JL projection: component k = dot(v, rp_plane(k))
    / sqrt(out_dim), each dot a sequential fold against a literal
    coefficient array — whole-stage codegen, no Python in the path."""
    scale = float(out_dim) ** 0.5
    # dlit: each plane literal in ONE py4j round trip (r15 — the
    # per-element F.lit form cost ~out_dim*dim round trips per call)
    return F.array(
        *[
            dot(vcol, dlit(rp_plane(k, dim))) / F.lit(scale)
            for k in range(out_dim)
        ]
    )


def _rp_project_py(
    vec: list[float], out_dim: int = RP_OUT_DIM, dim: int = EMBEDDING_DIM
) -> list[float]:
    """Driver-side twin of :func:`random_project` for collected panel
    rows — same left-fold order from 0.0, same literal coefficients,
    so the floats are bit-identical to the engine expression."""
    scale = float(out_dim) ** 0.5
    out = []
    for k in range(out_dim):
        plane = rp_plane(k, dim)
        acc = 0.0
        for i in range(min(dim, len(vec))):
            acc = acc + vec[i] * plane[i]
        out.append(acc / scale)
    return out


def rp_distortion_audit(
    emb: DataFrame,
    *,
    out_dim: int = RP_OUT_DIM,
    n_queries: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """JL distortion audit, one row per panel query (``qid, n_pairs,
    sum_ratio_u, min_ratio_u, max_ratio_u``): over every corpus pair
    (panel query x corpus vector), ratio = squared L2 distance in the
    projected space over the original space, snapped to integer
    micro-units per pair before the group aggregate (sums of integers
    are partition-invariant; min/max of integers trivially so). The
    mean ratio says whether the 4x-smaller vectors are usable for
    clustering/dedup blocking; min/max bound the worst pair — the
    go/no-go table before swapping full vectors for projections in a
    SemDeDup-style pipeline. Zero-distance pairs (exact duplicate
    vectors) are excluded: the ratio is undefined there, and both
    engines compute the identical fold so the exclusion is
    deterministic. Plan: corpus scan x broadcast panel, one grouped
    aggregate — no joins of corpus against corpus, no shuffle of
    vector data."""
    spark = emb.sparkSession

    def fold(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    def d2(a, b):
        return fold(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)))

    v = F.col(vec_col).cast("array<double>")
    base = fan_out(emb).select(
        F.col(id_col).alias("vec_id"),
        v.alias("v"),
        random_project(v, out_dim).alias("p"),
    )
    panel_rows = (
        fan_out(emb)
        .select(F.col(id_col).alias("vec_id"), v.alias("v"))
        .orderBy("vec_id")
        .limit(n_queries)
        .collect()
    )
    panel = spark.createDataFrame(
        [
            (
                int(r["vec_id"]),
                [float(x) for x in r["v"]],
                _rp_project_py(list(r["v"]), out_dim),
            )
            for r in panel_rows
        ],
        "qid long, qv array<double>, qp array<double>",
    )
    ratio = F.col("d2p") / F.col("d2v")
    u = F.floor(ratio * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    pairs = (
        base.join(F.broadcast(panel))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            d2(F.col("v"), F.col("qv")).alias("d2v"),
            d2(F.col("p"), F.col("qp")).alias("d2p"),
        )
        .where(F.col("d2v") > 0)
        .select("qid", u.alias("ratio_u"))
    )
    return (
        pairs.groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("ratio_u").cast("long").alias("sum_ratio_u"),
            F.min("ratio_u").alias("min_ratio_u"),
            F.max("ratio_u").alias("max_ratio_u"),
        )
        .orderBy("qid")
    )

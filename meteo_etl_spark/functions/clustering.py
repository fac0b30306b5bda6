"""K-means training over embedding columns — the IVF centroid trainer.

``sim_ann_ivf`` routes vectors to md5-seeded constant centroids; real
IVF indexes train those centroids with Lloyd's algorithm. This module
is that trainer, written as an iterative DataFrame program:

- **assignment** is a pure map with NO shuffle of the corpus, via one
  of two equivalent physical paths chosen on k: small k compiles the
  centroids into the plan as literal expressions (exactly how MLlib
  broadcasts cluster centers); large k (> ``ASSIGN_LITERAL_MAX``,
  where Catalyst's expression tree would blow up — literals cap out
  around 10³ centroids) packs the centroid table into ONE broadcast
  row (``collect_list`` of (cluster, cv) structs, built JVM-side) and
  reduces per vector with ``array_min`` over a ``transform`` — the
  1-row-broadcast scalar shape the plan guard allowlists, k bound only
  by broadcast size (k·dim longs: k=50 000, dim=64 ≈ 25 MB, the k the
  SemDeDup paper actually uses);
- **update** is one ``groupBy(cluster)`` with per-dimension partial
  aggregation — map-side combine reduces each task's contribution to
  k×(dim+1) longs before the single k-row shuffle;
- the driver collects k rows per iteration (k·dim integers — bounded
  state, not data) and feeds the next iteration's literals.

At 100 TB the per-iteration cost is therefore: one corpus scan + one
k-row shuffle. The trained centroids drop into ``ann_ivf_topk`` /
``build_lsh_index`` as the partition key without touching those plans.

Arithmetic is **integer-quantized** (components ``floor(x·QUANT)`` as
longs) so every distance, argmin, and centroid mean is exact and
summation-order-independent — the DuckDB oracle replays the identical
iterations bit-for-bit (floating-point means would differ in the last
ulp between engines and cascade through iterations; the quantized
variant is the cross-engine-verifiable form, and the FP variant at
scale uses the very same plan shape).

Reference parity: the reference has no clustering surface; this op
belongs to the mandated LLM-data-pipeline extension (SURVEY.md §2.4)
as the training half of the IVF similarity index.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meteo_etl_spark.functions.lits import ilit
from meteo_etl_spark.functions.similarity import EMBEDDING_DIM
from meteo_etl_spark.operators.parallelism import fan_out

#: quantization grid: component -> floor(x * QUANT) as a long. 100 keeps
#: every intermediate (sums over 1e6 rows, squared distances) far inside
#: int64 while preserving ~2 decimal digits of the unit-scale inputs.
QUANT = 100
KMEANS_K = 8
KMEANS_ITERS = 3
#: assignment-path crossover: up to this many centroids they compile
#: into the plan as literal distance expressions; above it, assignment
#: joins a 1-row broadcast of the packed centroid table instead (the
#: literal expression tree stops being free around 10²-10³ centroids,
#: and SemDeDup-scale k is 10⁴-10⁵).
ASSIGN_LITERAL_MAX = 64

#: second crossover: above this k, assignment leaves the JVM
#: expression interpreter for an Arrow-batched numpy kernel. Measured
#: (bench_evidence/R8_NEWOPS.md): the packed-broadcast join path costs
#: ~500 ns per row·centroid — higher-order-function lambdas are
#: interpreted per element, not codegen'd — which at SemDeDup-scale k
#: (10⁴-10⁵) is the difference between minutes and hours per corpus
#: pass. The numpy path does the identical integer math as one BLAS
#: matmul per Arrow batch (~1 ns per row·centroid, ~500× faster at
#: k=10⁴) and is EXACT: with components bounded by ±2²⁰ (quantize()
#: emits ±QUANT·|x|, orders of magnitude smaller) every intermediate
#: is an integer below 2⁵³, where float64 arithmetic is lossless —
#: both ends guard the bound and raise rather than round.
ASSIGN_ARROW_MIN = 1024
#: |component| bound under which the float64 kernel is integer-exact:
#: (a-b)² ≤ 4·2⁴⁰, summed over dim 64 → < 2⁴⁸ < 2⁵³.
_ARROW_ABS_BOUND = 1 << 20

#: live centroid-matrix broadcasts from _assign_clusters_arrow, oldest
#: first; beyond MAX_LIVE_ASSIGN_BROADCASTS the oldest is unpersisted
#: (executor copies dropped; the driver copy remains, so lazy frames
#: can still re-fetch). Call release_assignment_broadcasts() to drop
#: all executor copies eagerly.
from collections import deque as _deque

_LIVE_ASSIGN_BROADCASTS: "_deque" = _deque()
MAX_LIVE_ASSIGN_BROADCASTS = 2


def _unpersist_quiet(bc) -> bool:
    """Unpersist a broadcast, tolerating one whose SparkContext has
    since stopped (the deque is process-global, not session-scoped —
    an entry can outlive the session that made it; eviction and
    release must not abort midway on such a corpse). Returns True iff
    the broadcast was actually unpersisted.

    Only the stopped-context corpse is silent: any OTHER failure (a
    transient RPC error on a live context, say) means executor copies
    may genuinely leak, so it is surfaced as a warning instead of
    being misclassified as a corpse."""
    try:
        bc.unpersist(False)
        return True
    except Exception as exc:  # noqa: BLE001 — classified below
        msg = f"{type(exc).__name__}: {exc}"
        dead_signatures = (
            "SparkContext was shut down",
            "stopped SparkContext",
            "Cannot call methods on a stopped",
            "JVM view is gone",
            "Java gateway process",
            "Answer from Java side is empty",
            "Connection refused",
        )
        if not any(s in msg for s in dead_signatures):
            import warnings

            warnings.warn(
                "broadcast unpersist failed on what looks like a LIVE "
                f"SparkContext — executor copies may leak: {msg}",
                RuntimeWarning,
                stacklevel=2,
            )
        return False


def release_assignment_broadcasts() -> int:
    """Unpersist every live Arrow-assignment centroid broadcast
    (executor copies only — in-flight frames re-fetch from the
    driver). Entries from already-stopped sessions are dropped
    silently. Returns the number actually released."""
    n = 0
    while _LIVE_ASSIGN_BROADCASTS:
        if _unpersist_quiet(_LIVE_ASSIGN_BROADCASTS.popleft()):
            n += 1
    return n


def quantize(vec: Column) -> Column:
    """array<long> quantized view of an array<float/double> embedding."""
    return F.transform(
        vec.cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(QUANT))).cast("long"),
    )


def _sqdist(qv: Column, centroid: list[int]) -> Column:
    """Exact integer squared L2 distance to a literal centroid."""
    c = ilit([int(w) for w in centroid])
    return F.aggregate(
        F.zip_with(qv, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def assign_clusters(
    quantized: DataFrame,
    centroids: list[list[int]],
    *,
    with_dist: bool = False,
) -> DataFrame:
    """Add a 1-based ``cluster`` column (and, with ``with_dist``, the
    exact integer ``dist2`` to it): argmin squared distance, ties to
    the lowest cluster id (the oracle's ``ORDER BY dist, cluster``
    mirror). Three value-identical physical paths chosen on k (pinned
    equal by tests; none shuffles the corpus): small k compiles the
    centroids in as literals; ``ASSIGN_LITERAL_MAX`` < k <=
    ``ASSIGN_ARROW_MIN`` routes to the 1-row-broadcast join; larger k
    routes to the Arrow/numpy kernel (BLAS matmul per batch, ~500x
    the interpreted join path at k=10^4 — see ASSIGN_ARROW_MIN)."""
    if len(centroids) > ASSIGN_ARROW_MIN:
        return _assign_clusters_arrow(quantized, centroids, with_dist=with_dist)
    if len(centroids) > ASSIGN_LITERAL_MAX:
        return _assign_clusters_join(quantized, centroids, with_dist=with_dist)
    dists = F.array(*[_sqdist(F.col("qv"), c) for c in centroids])
    out = quantized.withColumn(
        "cluster", F.array_position(dists, F.array_min(dists)).cast("int")
    )
    if with_dist:
        out = out.withColumn("dist2", F.array_min(dists))
    return out


def _assign_clusters_join(
    quantized: DataFrame, centroids: list[list[int]], *, with_dist: bool
) -> DataFrame:
    """Large-k assignment: the centroid table is packed JVM-side into
    ONE row (``collect_list`` of (cluster, cv) structs), broadcast, and
    cross-joined in — the allowlisted 1-row scalar-broadcast shape —
    then each vector reduces with ``array_min`` over a ``transform``:
    min on struct<d, cluster> is (min dist, then min cluster id),
    identical tie order to the literal path. Cost per row is the
    inherent O(k·dim) distance work; nothing shuffles, and k is bound
    only by broadcast size (k·dim longs), not by Catalyst's expression
    tree."""
    spark = quantized.sparkSession
    cents = spark.createDataFrame(
        [(j + 1, [int(x) for x in c]) for j, c in enumerate(centroids)],
        "cluster int, cv array<long>",
    )
    packed = cents.agg(
        F.collect_list(F.struct(F.col("cluster"), F.col("cv"))).alias("_cents")
    )
    best = F.array_min(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("qv"), c["cv"], lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                ).alias("d"),
                c["cluster"].alias("cluster"),
            ),
        )
    )
    out = (
        quantized.join(F.broadcast(packed))
        .withColumn("_best", best)
        .withColumn("cluster", F.col("_best").getField("cluster"))
    )
    if with_dist:
        out = out.withColumn("dist2", F.col("_best").getField("d"))
    return out.drop("_cents", "_best")


def _assign_clusters_arrow(
    quantized: DataFrame, centroids: list[list[int]], *, with_dist: bool
) -> DataFrame:
    """SemDeDup-scale assignment (k > ``ASSIGN_ARROW_MIN``): the
    centroid matrix ships as ONE SparkContext broadcast (k·dim float64,
    ~5 MB at k=10⁴·d=64, ~25 MB at k=5·10⁴ — the SemDeDup paper's k)
    and each Arrow batch reduces with a numpy matmul:

        dist²(i, j) = |qᵢ|² − 2·qᵢ·cⱼ + |cⱼ|²   (one BLAS GEMM)

    argmin per row, first-minimum ties → lowest cluster id, exactly
    the join/literal paths' ``array_min(struct(d, cluster))`` order.
    The math is float64 but the RESULTS are exact integers: with
    4·dim·M² ≤ 2⁵³ for M = the largest |component| (checked —
    driver-side for centroids, per batch against the actual vector
    max; at quantize()'s ±2²⁰ component bound this admits dim ≤ 2048,
    and the typical QUANT·|x| ≈ ±200 admits dim ≈ 10⁷) every
    intermediate stays under 2⁵³ where float64 is lossless; both ends
    raise past the bound rather than round.
    mapInPandas preserves partitioning — still a pure map, nothing
    shuffles; per-row cost is the same inherent O(k·dim), executed at
    BLAS speed instead of expression-interpreter speed (~500× at
    k=10⁴, measured in bench_evidence/R8_NEWOPS.md)."""
    import numpy as np
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    C = np.asarray(centroids, dtype=np.float64)
    if C.ndim != 2:
        raise ValueError("centroids must be a k x dim matrix")
    if np.abs(C).max() >= float(_ARROW_ABS_BOUND):
        raise ValueError(
            f"centroid component exceeds ±{_ARROW_ABS_BOUND}: the float64 "
            "kernel would not be integer-exact — use _assign_clusters_join"
        )
    # the exactness bound is DIMENSION-dependent, not just per
    # component: dist² ≤ dim·(max|q|+max|c|)² ≤ 4·dim·M², and every
    # partial sum must stay under 2⁵³ for float64 to be lossless.
    # Fail fast on the centroid side here; the kernel re-checks with
    # the actual per-batch vector max (see _exactness_check).
    if 4.0 * C.shape[1] * float(np.abs(C).max() ** 2) > float(1 << 53):
        raise ValueError(
            f"dim {C.shape[1]} x centroid magnitude "
            f"{int(np.abs(C).max())} exceeds the float64 exactness "
            "bound (4*dim*M^2 > 2^53) — use _assign_clusters_join"
        )
    spark = quantized.sparkSession
    bc = spark.sparkContext.broadcast(C)
    # cap live centroid broadcasts (~25 MB each at k=5e4): repeated
    # assignment passes in one session (k-means loops, audits) would
    # otherwise accumulate executor+driver copies without bound.
    # unpersist(False) only drops executor copies — a still-lazy frame
    # that needs an evicted broadcast re-fetches it from the driver,
    # so eviction is a memory bound, never a correctness hazard.
    _LIVE_ASSIGN_BROADCASTS.append(bc)
    while len(_LIVE_ASSIGN_BROADCASTS) > MAX_LIVE_ASSIGN_BROADCASTS:
        _unpersist_quiet(_LIVE_ASSIGN_BROADCASTS.popleft())
    bound = float(_ARROW_ABS_BOUND)
    want_dist = with_dist

    fields = list(quantized.schema.fields) + [
        StructField("cluster", IntegerType(), False)
    ]
    if with_dist:
        fields.append(StructField("dist2", LongType(), False))
    out_schema = StructType(fields)

    # GEMM chunk over centroids: caps the per-batch distance matrix at
    # rows×4096 float64 (~100 MB at the 3-4k-row Arrow batches local
    # mode produces) regardless of k, so k=10⁴-10⁵ cannot blow worker
    # memory; the running argmin uses STRICT < while chunks scan
    # ascending cluster ids, preserving first-minimum tie order.
    chunk = 4096

    def kernel(batches):
        cm = bc.value
        cn = (cm * cm).sum(axis=1)  # |c|² per centroid
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.stack(pdf["qv"].to_numpy()).astype(np.float64)
            if np.abs(q).max() >= bound:
                raise ValueError(
                    f"vector component exceeds ±{int(bound)}: float64 "
                    "kernel would not be integer-exact for this input"
                )
            # _exactness_check: dist² ≤ 4·dim·max(|q|,|c|)² must stay
            # under 2⁵³ — the per-component bound alone is not enough
            # at high dim (e.g. dim 4096 near ±2²⁰ silently rounds)
            m = max(np.abs(q).max(), np.abs(cm).max())
            if 4.0 * q.shape[1] * float(m * m) > float(1 << 53):
                raise ValueError(
                    f"dim {q.shape[1]} x component magnitude {int(m)} "
                    "exceeds the float64 exactness bound "
                    "(4*dim*M^2 > 2^53) — use _assign_clusters_join"
                )
            qn = (q * q).sum(axis=1)[:, None]
            rows = np.arange(len(q))
            best_d = None
            best_j = None
            for s in range(0, len(cm), chunk):
                d2 = qn - 2.0 * (q @ cm[s : s + chunk].T) + cn[None, s : s + chunk]
                j = d2.argmin(axis=1)
                d = d2[rows, j]
                if best_d is None:
                    best_d, best_j = d, j + s
                else:
                    better = d < best_d
                    best_d = np.where(better, d, best_d)
                    best_j = np.where(better, j + s, best_j)
            pdf = pdf.copy()
            pdf["cluster"] = (best_j + 1).astype("int32")
            if want_dist:
                pdf["dist2"] = best_d.astype("int64")
            yield pdf

    return quantized.mapInPandas(kernel, out_schema)


def seed_centroids(quantized: DataFrame, k: int, id_col: str = "vec_id") -> list[list[int]]:
    """Deterministic k seeds: the k vectors first in md5(id) order — an
    unbiased, engine-agnostic shuffle both sides can replay. At scale
    this is a top-k (per-partition heaps), not a global sort."""
    rows = (
        quantized.select(
            F.md5(F.col(id_col).cast("string").cast("binary")).alias("h"),
            F.col(id_col).alias("i"),
            "qv",
        )
        .orderBy("h", "i")
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(rows)}")
    return [[int(x) for x in r.qv] for r in rows]


def kmeans_fit(
    emb: DataFrame,
    *,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[int]], list[int]]:
    """Lloyd's iterations; returns (centroids, inertia_history).

    Each update is ``groupBy(cluster).agg(count, sum(qv[d])…)`` — the
    per-dimension sums combine map-side, the shuffle carries k rows.
    An empty cluster keeps its previous centroid (the oracle COALESCEs
    identically). Inertia (exact integer Σ min-sqdist) is recorded per
    iteration for convergence tests.
    """
    q = fan_out(emb).select(
        F.col(id_col).alias("vec_id"), quantize(F.col(vec_col)).alias("qv")
    )
    q = q.persist()
    try:
        cents = seed_centroids(q, k)
        inertia: list[int] = []
        for _ in range(iters):
            assigned = assign_clusters(q, cents, with_dist=True)
            dim = len(cents[0])
            agg_cols = [F.count(F.lit(1)).alias("n")] + [
                F.sum(F.element_at("qv", d + 1)).alias(f"s{d}") for d in range(dim)
            ]
            stats = assigned.groupBy("cluster").agg(
                *agg_cols, F.sum("dist2").alias("inertia")
            )
            rows = {r["cluster"]: r for r in stats.collect()}
            inertia.append(sum(int(r["inertia"]) for r in rows.values()))
            new_cents = []
            for j in range(1, k + 1):
                r = rows.get(j)
                if r is None:
                    new_cents.append(cents[j - 1])  # empty cluster: keep
                else:
                    n = int(r["n"])
                    new_cents.append([int(r[f"s{d}"]) // n for d in range(dim)])
            cents = new_cents
        return cents, inertia
    finally:
        q.unpersist()


def kmeans_summary(
    emb: DataFrame,
    *,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster training summary (the oracle-checked surface):
    ``cluster, n, centroid_sum, centroid_norm2`` for the final
    assignment under the final centroids — scalar integer columns
    only (arrays crash the driver's canonicalizer)."""
    cents, _ = kmeans_fit(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    q = fan_out(emb).select(
        F.col(id_col).alias("vec_id"), quantize(F.col(vec_col)).alias("qv")
    )
    counts = (
        assign_clusters(q, cents)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = emb.sparkSession
    cstats = spark.createDataFrame(
        [
            (j + 1, sum(c), sum(x * x for x in c))
            for j, c in enumerate(cents)
        ],
        "cluster int, centroid_sum long, centroid_norm2 long",
    )
    return (
        counts.join(F.broadcast(cstats), "cluster")
        .select("cluster", "n", "centroid_sum", "centroid_norm2")
        .orderBy("cluster")
    )


def trained_ivf_centroids(
    emb: DataFrame, *, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> list[list[float]]:
    """Trained centroids de-quantized to unit scale — drop-in literals
    for ``ann_ivf_topk``-style routing (same plan, better lists)."""
    cents, _ = kmeans_fit(emb, k=k, iters=iters)
    return [[x / QUANT for x in c] for c in cents]


# --- semantic dedup: cluster-blocked cosine pruning (SemDeDup) -------------

#: integer cosine² threshold numerator: floor(tau² * 1e4). The dup test
#: "cos(a,b) >= tau" is evaluated EXACTLY in int64 as
#: 10000·dot² >= SEMANTIC_TAU_NUM·‖a‖²·‖b‖² (with dot > 0) over the
#: quantized vectors — no FP division, no sqrt, bit-identical across
#: engines. tau reuses dedup.COSINE_DUP_THRESHOLD (0.45 → 2025 exactly).
def _semantic_tau_num() -> int:
    from meteo_etl_spark.functions.dedup import COSINE_DUP_THRESHOLD

    return int(round(COSINE_DUP_THRESHOLD * COSINE_DUP_THRESHOLD * 10000))


#: sub-blocks per cluster for the within-cluster pair join: a cluster is
#: a natural skew key (a 100 TB corpus can put billions of vectors in
#: one cluster), so the pair space is additionally block-diagonalized —
#: join key (cluster, block-pair task), task memory stays bounded by
#: cluster_size/blocks regardless of cluster skew.
SEMANTIC_PAIR_BLOCKS = 4


def _idot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assigned_vectors(
    emb: DataFrame, *, k: int, iters: int, id_col: str, vec_col: str
) -> DataFrame:
    """(vec_id, cluster, qv, n2): trained-cluster assignment plus the
    quantized vector and its exact integer squared norm."""
    cents, _ = kmeans_fit(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    q = fan_out(emb).select(
        F.col(id_col).alias("vec_id"), quantize(F.col(vec_col)).alias("qv")
    )
    return assign_clusters(q, cents).select(
        "vec_id", "cluster", "qv", _idot(F.col("qv"), F.col("qv")).alias("n2")
    )


def _cluster_blocked_pairs(av: DataFrame, blocks: int) -> DataFrame:
    """Every unordered within-cluster pair exactly once:
    ``(id_lo, id_hi, d, n2p)`` with d the exact int64 dot product and
    n2p the (symmetric) product of squared norms.

    Identical block-pair enumeration to dedup.embedding_cosine_pairs,
    with the cluster id prepended to the join key: a row of block b is
    LEFT in tasks (b, j>=b) and RIGHT in tasks (i<=b, b), so the join
    is a shuffled equi-join on (cluster, task) — blocks·(blocks+1)/2
    bounded-memory tasks per cluster, never a cross join."""
    blk = F.pmod(F.xxhash64(F.col("vec_id").cast("string")), F.lit(blocks)).cast("int")
    sided = av.withColumn("blk", blk)

    def task_id(i: Column, j: Column) -> Column:
        return F.concat_ws(":", i.cast("string"), j.cast("string"))

    left = sided.select(
        F.col("cluster").alias("cl"),
        F.col("vec_id").alias("id_l"),
        F.col("qv").alias("qv_l"),
        F.col("n2").alias("n2_l"),
        F.col("blk").alias("blk_l"),
        F.explode(
            F.transform(
                F.sequence(F.col("blk"), F.lit(blocks - 1)),
                lambda j: task_id(F.col("blk"), j),
            )
        ).alias("task"),
    )
    right = sided.select(
        F.col("cluster").alias("cl"),
        F.col("vec_id").alias("id_r"),
        F.col("qv").alias("qv_r"),
        F.col("n2").alias("n2_r"),
        F.col("blk").alias("blk_r"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("blk")),
                lambda i: task_id(i, F.col("blk")),
            )
        ).alias("task"),
    )
    d = _idot(F.col("qv_l"), F.col("qv_r"))
    return (
        left.join(right, ["cl", "task"])
        .filter((F.col("blk_l") != F.col("blk_r")) | (F.col("id_l") < F.col("id_r")))
        .select(
            F.least("id_l", "id_r").alias("id_lo"),
            F.greatest("id_l", "id_r").alias("id_hi"),
            d.alias("d"),
            (F.col("n2_l") * F.col("n2_r")).alias("n2p"),
        )
    )


def semantic_dedup(
    emb: DataFrame,
    *,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    blocks: int = SEMANTIC_PAIR_BLOCKS,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means clusters
    as the BLOCKING key, then exact pairwise cosine only WITHIN each
    cluster; a vector is dropped when a lower-id vector in its cluster
    is a near-duplicate (cos >= tau). Returns one row per vector:
    ``(vec_id, cluster, n_dup_lower, is_kept)``.

    Scale shape: clustering reduces the pair space from O(n²) to
    Σ|cluster|² — the published method's entire point — and each
    cluster's pair space is further block-diagonalized (join key is
    (cluster, block-task), SEMANTIC_PAIR_BLOCKS sub-blocks) so one hot
    cluster can never exceed task memory. The join is a shuffled
    equi-join — never a cross join — and the keep-decision is one
    partial-agg count per vector. All arithmetic is integer-quantized
    (see kmeans_fit) so the DuckDB oracle replays it bit-for-bit.

    Reference parity: no reference counterpart; mandated LLM-pipeline
    extension (SURVEY.md §2.4) — the embedding-space twin of the
    MinHash text dedup.
    """
    av = _assigned_vectors(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    tau_num = _semantic_tau_num()
    pairs = _cluster_blocked_pairs(av, blocks).filter(
        (F.col("d") > 0)
        & (F.lit(10000) * F.col("d") * F.col("d") >= F.lit(tau_num) * F.col("n2p"))
    )
    dup = pairs.groupBy(F.col("id_hi").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("n_dup_lower")
    )
    return (
        av.join(dup, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cluster").cast("long").alias("cluster"),
            F.coalesce("n_dup_lower", F.lit(0)).cast("long").alias("n_dup_lower"),
            F.col("n_dup_lower").isNull().alias("is_kept"),
        )
        .orderBy("vec_id")
    )


def cluster_prototypes(
    emb: DataFrame,
    *,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per trained cluster, the representative vector nearest its
    centroid: ``(cluster, prototype_id, dist2, n)`` — the prototype
    selection step of dataset distillation / cluster inspection /
    centroid labeling (one human-readable exemplar per cluster).

    Scale shape: the per-vector distance to the k compiled-in centroid
    literals is one codegen'd map (no join), and the per-cluster argmin
    is a k-group aggregate — ONE shuffle whose reduce side carries one
    row per cluster (the window ranks inside k tiny groups). dist2 is
    the exact integer squared L2 in quantized space, ties to the lower
    id, so selection is deterministic and the oracle replays it."""
    from pyspark.sql import Window

    cents, _ = kmeans_fit(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    q = fan_out(emb).select(
        F.col(id_col).alias("vec_id"), quantize(F.col(vec_col)).alias("qv")
    )
    best = assign_clusters(q, cents, with_dist=True).select(
        "vec_id", "cluster", F.col("dist2").alias("dist")
    )
    w = Window.partitionBy("cluster").orderBy("dist", "vec_id")
    sizes = best.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
    return (
        best.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(sizes, "cluster")
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            F.col("vec_id").alias("prototype_id"),
            F.col("dist").alias("dist2"),
            "n",
        )
        .orderBy("cluster")
    )


KNN_NEIGHBORS = 5


def knn_graph(
    emb: DataFrame,
    *,
    k_neighbors: int = KNN_NEIGHBORS,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    blocks: int = SEMANTIC_PAIR_BLOCKS,
) -> DataFrame:
    """Cluster-blocked k-NN graph: each vector's top-``k_neighbors``
    cosine neighbors WITHIN its trained k-means cluster —
    ``(src, rank, dst, cos)``, the adjacency list graph-based curation
    (dedup clustering, diversity sampling, label propagation) starts
    from.

    Scale shape: the same Σ|cluster|² pair space as semantic_dedup
    (never all-pairs), enumerated once per unordered pair and exploded
    into both directions; top-k per source is a rank over the
    (src)-keyed window — per-partition sort, no global sort. Cosine is
    the exact integer dot over sqrt of the exact integer norm product,
    so ranking is deterministic across engines (IEEE sqrt/division are
    correctly rounded; ties break on dst id). A vector whose cluster
    has no other member yields no rows — the graph is honest about
    isolation rather than padding with cross-cluster guesses."""
    from pyspark.sql import Window

    av = _assigned_vectors(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    pairs = _cluster_blocked_pairs(av, blocks)
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_lo").alias("src"), F.col("id_hi").alias("dst")
                ),
                F.struct(
                    F.col("id_hi").alias("src"), F.col("id_lo").alias("dst")
                ),
            )
        ).alias("e"),
        (
            F.col("d").cast("double")
            / F.sqrt(F.col("n2p").cast("double"))
        ).alias("cos_raw"),
    ).select("e.src", "e.dst", "cos_raw")
    w = Window.partitionBy("src").orderBy(F.desc("cos_raw"), "dst")
    return (
        directed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select(
            "src",
            F.col("rank").cast("long").alias("rank"),
            "dst",
            F.round("cos_raw", 4).alias("cos"),
        )
        .orderBy("src", "rank")
    )

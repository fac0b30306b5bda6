"""Mergeable-sketch rollups: HLL distinct and KLL quantiles that
compose across partitions/days WITHOUT rescanning the fact table.

The 100 TB pattern: an exact COUNT(DISTINCT) or exact percentile over
a month re-shuffles the whole fact every time the window moves. A
sketch rollup stores one small binary per (day, key) — HLL registers
for distinct, a KLL summary for quantiles — and any coarser window
(month, quarter, all-time, ad-hoc day ranges) is answered by MERGING
the stored sketches: O(days·sketch_size) work, zero fact I/O. This is
the mechanism behind Druid/Pinot/BigQuery sketch columns, built here
on Spark 4's native Apache DataSketches functions
(``hll_sketch_agg``/``hll_union_agg``,
``kll_sketch_agg_double``/``kll_sketch_merge_double`` — JVM-side,
codegen'd, no UDFs).

Sketches are APPROXIMATE, so the module pairs every estimator with a
certifier that checks it against the exact answer and raises on
tolerance breach — the registered ``events_sketch_rollup`` query runs
that certification under the driver's correctness gate while its
RETURNED rows stay exact (SQL-oracle-expressible). Error model: HLL
relative error ≈ 1.04/√2^lgK (~1.6 % at the default lgK=12);
KLL rank error ≤ ~1.7 % at k=200 with probability 0.99.

Reference parity: the reference has no sketch surface; this extends
the approximate twins (``q3_approx_distinct``/``q5_approx_summary``,
single-shot approx aggregates) with the MERGEABLE form incremental
rollup maintenance needs (SURVEY.md §2.4 extension surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: HLL lgConfigK: 2^12 registers → ~1.6 % standard relative error.
HLL_LGK = 12
#: KLL k: ~1.7 % worst-case rank error at 99 % confidence.
KLL_K = 200


def sketch_rollup(
    df: DataFrame,
    keys: list[str | Column],
    distinct_col: str,
    value_col: str,
    *,
    lgk: int = HLL_LGK,
    kll_k: int = KLL_K,
) -> DataFrame:
    """One pass over the fact → per-key sketch row: an HLL sketch of
    ``distinct_col`` and a KLL doubles sketch of ``value_col`` (plus
    the exact row count, which is free). This is the stored rollup;
    everything coarser derives from it by merging."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(distinct_col, F.lit(lgk)).alias("hll_sk"),
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(kll_k)).alias(
            "kll_sk"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merged_distinct_estimate(rollup: DataFrame) -> int:
    """Distinct estimate over the UNION of all rollup rows' HLL
    sketches — O(rows·2^lgk) register maxes, no fact rescan.

    An empty rollup (an ad-hoc window that matched no rollup rows)
    returns 0: ``hll_union_agg`` over zero rows is the empty sketch,
    whose estimate is the honest "no data seen" answer."""
    est = rollup.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_sk", F.lit(True))).alias("est")
    ).collect()[0]["est"]
    if est is None:  # defensive: no engine version observed returns NULL
        raise ValueError("merged_distinct_estimate: empty rollup (no sketches)")
    return int(est)


def kll_merge_fold(list_col: str) -> Column:
    """Fold a ``collect_list`` of KLL sketches into one merged sketch.
    ``kll_sketch_merge_double`` is a BINARY scalar (no union aggregate
    exists for KLL), so the list is folded JVM-side with
    ``F.aggregate``. ``try_element_at`` keeps an EMPTY list a NULL
    (callers raise their own ValueError) instead of dying in ANSI
    element_at's INVALID_ARRAY_INDEX."""
    return F.aggregate(
        F.slice(F.col(list_col), 2, F.greatest(F.size(list_col) - 1, F.lit(0))),
        F.try_element_at(F.col(list_col), F.lit(1)),
        lambda acc, s: F.kll_sketch_merge_double(acc, s),
    )


def merged_quantiles(rollup: DataFrame, probs: list[float]) -> list[float]:
    """Quantile estimates at ``probs`` from the merge of all rollup
    rows' KLL sketches (rank-error-bounded, mergeable without loss of
    the guarantee). The rollup's sketches are collect_list'ed into one
    row (rows·~KB — bounded by the rollup cardinality, not the fact)
    and folded with :func:`kll_merge_fold`."""
    packed = rollup.agg(F.collect_list("kll_sk").alias("l"))
    row = packed.select(
        F.kll_sketch_get_quantile_double(
            kll_merge_fold("l"), F.array(*[F.lit(float(p)) for p in probs])
        ).alias("qs")
    ).collect()[0]["qs"]
    if row is None:
        raise ValueError("merged_quantiles: empty rollup (no sketches)")
    return [float(x) for x in row]


def merged_summary(
    rollup: DataFrame, probs: list[float]
) -> tuple[int, list[float]]:
    """The HLL union estimate AND the merged-KLL quantiles in ONE
    job: ``merged_distinct_estimate`` + ``merged_quantiles`` each run
    their own aggregate over the rollup; a moving-window consumer
    (or the certification query) usually wants both, and the rollup
    is small enough that the only real cost is per-job driver
    overhead — so fold the two into one action. Same semantics, same
    empty-rollup errors."""
    packed = rollup.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_sk", F.lit(True))).alias(
            "est"
        ),
        F.collect_list("kll_sk").alias("l"),
    )
    merged = F.aggregate(
        F.slice(F.col("l"), 2, F.greatest(F.size("l") - 1, F.lit(0))),
        F.try_element_at(F.col("l"), F.lit(1)),
        lambda acc, s: F.kll_sketch_merge_double(acc, s),
    )
    row = packed.select(
        "est",
        F.kll_sketch_get_quantile_double(
            merged, F.array(*[F.lit(float(p)) for p in probs])
        ).alias("qs"),
    ).collect()[0]
    if row["est"] is None or row["qs"] is None:
        raise ValueError("merged_summary: empty rollup (no sketches)")
    return int(row["est"]), [float(x) for x in row["qs"]]


def exact_rank_columns(
    value_col: str, estimates: list[float]
) -> list[Column]:
    """One aggregate column per estimate: the exact fraction of rows
    with ``value <= estimate``. Lets a caller certify EVERY quantile
    estimate (plus any other exact aggregates, e.g. a countDistinct)
    in a single fact scan instead of one scan per estimate."""
    return [
        (
            F.sum(
                F.when(
                    F.col(value_col).cast("double") <= float(est), 1
                ).otherwise(0)
            )
            / F.count(F.lit(1))
        ).alias(f"_rank_{i}")
        for i, est in enumerate(estimates)
    ]


def certify_quantile_rank_value(
    rank: float, target_rank: float, *, rank_tol: float, context: str
) -> None:
    """Pure checker for an already-computed exact rank (the one-scan
    path via :func:`exact_rank_columns`)."""
    if abs(float(rank) - target_rank) > rank_tol:
        raise RuntimeError(
            f"{context}: exact rank {float(rank):.4f}, "
            f"target {target_rank} ± {rank_tol}"
        )


def certify_distinct(
    est: int, exact: int, *, rel_tol: float, context: str
) -> None:
    """RuntimeError (not assert — survives ``python -O``) when a
    distinct estimate leaves the tolerance band."""
    if exact == 0:
        if est != 0:
            raise RuntimeError(f"{context}: est {est} for empty exact set")
        return
    err = abs(est - exact) / exact
    if err > rel_tol:
        raise RuntimeError(
            f"{context}: HLL estimate {est} vs exact {exact} "
            f"(rel err {err:.4f} > {rel_tol})"
        )


def certify_quantile_rank(
    df: DataFrame,
    value_col: str,
    estimate: float,
    target_rank: float,
    *,
    rank_tol: float,
    context: str,
) -> None:
    """Certify a quantile ESTIMATE by its exact rank: the fraction of
    rows ≤ estimate must sit within ``rank_tol`` of ``target_rank`` —
    the KLL guarantee is on rank, not value, so this is the honest
    check (value-space tolerance would be scale-dependent). One scan
    per call — certifying several estimates over one fact is cheaper
    through :func:`exact_rank_columns` + one combined aggregate."""
    [col] = exact_rank_columns(value_col, [estimate])
    r = df.agg(col.alias("rank")).collect()[0]["rank"]
    certify_quantile_rank_value(
        r,
        target_rank,
        rank_tol=rank_tol,
        context=f"{context}: estimate {estimate}",
    )


#: Count-min sketch shape. width=64 keeps the demonstration honest at
#: test scale — collisions are visible, so the one-sided overestimate
#: property actually exercises; production picks width ≈ e/ε for an
#: ε·N additive bound and depth ≈ ln(1/δ) for failure probability δ.
CMS_DEPTH = 4
CMS_WIDTH = 64


def _cms_probe(key: Column, d: int, width: int) -> Column:
    """Row-``d`` CMS bucket of a key: the shared 32-bit md5 idiom with
    a per-depth seed prefix (``cms<d>:``) — deterministic, identical
    in both engines, so the sketch itself is oracle-replayable."""
    from meteo_etl_spark.functions.sampling import hash_bucket

    return hash_bucket(
        F.concat(F.lit(f"cms{d}:"), key.cast("string")), width
    )


def cms_rollup(
    df: DataFrame,
    key_col: str | Column,
    *,
    group_keys: list[str] | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch of ``key_col`` frequencies AS A RELATION: one
    ``(group_keys…, d, bucket, cnt)`` row per non-empty counter cell,
    at most ``depth × width`` rows per group however large the key
    domain. The relational form is the point: cells MERGE by summing
    matching ``(d, bucket)`` — associative integers, so rollups built
    per day/partition compose into any coarser window with a plain
    groupBy-sum and zero fact I/O (the same maintenance contract as
    :func:`sketch_rollup`'s HLL/KLL blobs), the result is partition-
    invariant, and the DuckDB oracle replays it exactly (unlike opaque
    sketch binaries). Build cost: one explode to ``depth`` rows per
    fact row (map-side combine collapses them immediately) + one
    shuffle of ≤ depth·width·groups cells.

    Estimates are ONE-SIDED: a cell only ever over-counts (hash
    collisions add, never subtract), so ``est ≥ true`` always — the
    property :func:`cms_estimate`'s consumers rely on (e.g. a
    candidate filter that must never false-negative a heavy hitter)."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    gk = list(group_keys or [])
    probes = df.select(
        *gk,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_probe(key, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p"),
    )
    return (
        probes.select(*gk, F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
        .groupBy(*gk, "d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    candidates: DataFrame,
    key_col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-frequency estimates for a candidate key set: per key,
    ``min`` over the ``depth`` probed cells (a missing cell reads 0 —
    the key was never counted and nothing collided into that cell).
    Candidates are expected tiny (heavy-hitter shortlists, watchlist
    keys); the probe side is ``depth`` rows per candidate joined
    against the ≤ depth·width-cell sketch, never against the fact.
    ``depth``/``width`` must match the rollup's — same discipline as
    the ANN index shape sidecar, enforced here by the join simply
    finding no cells (reads 0) rather than silently wrong values only
    when widths disagree; pass the rollup's own constants.

    A GROUPED rollup (built with ``group_keys``) must be merged to
    plain ``(d, bucket, cnt)`` cells first — ``groupBy('d',
    'bucket').sum('cnt')``, the mergeable contract — because joining
    grouped cells here would take the min ACROSS groups and
    underestimate, breaking the one-sided guarantee; this raises
    loudly instead (r12 self-review)."""
    extra = set(cms.columns) - {"d", "bucket", "cnt"}
    if extra or set(cms.columns) != {"d", "bucket", "cnt"}:
        raise ValueError(
            "cms_estimate needs a merged (d, bucket, cnt) sketch; got "
            f"columns {sorted(cms.columns)} — merge a grouped rollup "
            "first: cms.groupBy('d', 'bucket').agg(sum('cnt')) "
            "(min over grouped cells would underestimate and break "
            "the one-sided guarantee)"
        )
    key = F.col(key_col)
    probes = candidates.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_probe(key, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(cms), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("n_cms"))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / theta) sketch — mergeable distinct sketches
# that also support SET OPERATIONS (union exactly, intersection via
# inclusion-exclusion), which HLL here does not expose: the union of
# two KMV relations is just their merged k smallest hashes, so
# "distinct users in type A AND type B" is answerable from per-type
# sketches alone. Estimator: with hv uniform on [0, 2^60), the k-th
# smallest hash at kth estimates n ≈ (k-1) * 2^60 / kth (Bar-Yossef
# et al. 2002); below k distinct values the sketch IS the set and the
# count is exact. md5-based hashing keeps the DuckDB oracle
# bit-identical (the hash_split idiom).
# ---------------------------------------------------------------------------

#: KMV size: 64 minima → ~1/sqrt(62) ≈ 13 % relative error. Production
#: sizes k into the hundreds; 64 keeps test-scale collisions honest.
KMV_K = 64

#: hash space: 15 md5 hex chars = 60 bits, positive in a signed 64-bit
#: lane on both engines.
KMV_SPACE = 1 << 60

#: prefilter slack: survivors threshold ~ slack*k/n of the space. The
#: probability that fewer than k of n uniform hashes land below
#: slack*k*SPACE/n is a Chernoff tail at e^{-Θ(k·slack)} — with
#: slack=8, k=64 it is astronomically small; the engine still
#: VALIDATES and raises rather than silently under-sketching.
KMV_SLACK = 8


def kmv_hash(col: Column) -> Column:
    """60-bit md5-derived hash, identical in Spark and DuckDB:
    ``conv(substring(md5(x),1,15),16,10)`` ==
    ``('0x' || substr(md5(x),1,15))::BIGINT``."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = KMV_K,
    slack: int = KMV_SLACK,
) -> DataFrame:
    """Per-key KMV sketch as a mergeable RELATION ``(key, hv)`` — the
    k smallest distinct hash values of ``value_col`` under each key.

    Scale shape: one map-combined distinct shuffle, one key-bounded
    count, then the k-min rank runs over a PREFILTERED survivor frame
    (hv below ~slack·k/n of the hash space — the uniform-hash bound),
    so the per-key window sorts O(slack·k) rows regardless of corpus
    size — never a per-key sort of all distinct values. The filter is
    validated engine-side (≥ min(n, k) survivors per key) and raises
    on the astronomically-unlikely miss instead of under-sketching."""
    # NULL values hash to NULL, which would sort ahead of every real
    # minimum and corrupt the sketch — distinct-count semantics ignore
    # NULL anyway (COUNT(DISTINCT x) does), so drop them at the scan.
    #
    # Job/pass discipline (r15 optimization): the eager validation used
    # to run the whole scan+distinct pipeline a second (and third) time
    # — one count() action over counts⋈scount, then every caller action
    # recomputed vals again. Now vals is cached once, the FINAL sketch
    # is materialized in the same first job (localCheckpoint — the
    # output is k x |keys| rows, panel-sized at any corpus scale), the
    # validation count reads the cache + the materialized sketch, and
    # the cache is dropped before returning. Net: one full pass over
    # the input instead of three, identical rows, identical eager
    # raise-on-miss semantics.
    vals = (
        df.select(
            F.col(key_col).alias("key"), kmv_hash(F.col(value_col)).alias("hv")
        )
        .filter(F.col("hv").isNotNull())
        .distinct()
        .cache()
    )
    try:
        counts = vals.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
        thr = F.when(F.col("n") <= k, F.lit(KMV_SPACE)).otherwise(
            F.least(
                F.lit(KMV_SPACE),
                (F.lit(float(slack * k * KMV_SPACE)) / F.col("n")).cast("long"),
            )
        )
        surv = vals.join(
            F.broadcast(counts.select("key", thr.alias("thr"), "n")), "key"
        ).filter(F.col("hv") < F.col("thr"))
        w = Window.partitionBy("key").orderBy("hv")
        sk = (
            surv.select("key", "hv")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(F.col("key"), "hv")
            .localCheckpoint()
        )
        # validate from the COUNTS side: a key whose survivors were all
        # filtered away has no sketch row at all and must still fail.
        # Post-rank counts are equivalent to the former pre-rank check:
        # survivors >= least(n, k)  <=>  min(survivors, k) >= least(n, k).
        scount = sk.groupBy("key").agg(F.count(F.lit(1)).alias("s"))
        bad = (
            counts.join(scount, "key", "left")
            .filter(
                F.coalesce(F.col("s"), F.lit(0)) < F.least(F.col("n"), F.lit(k))
            )
            .count()
        )
        if bad:
            raise RuntimeError(
                f"kmv_sketch: prefilter lost k-minima for {bad} key(s) — "
                f"raise slack above {slack} (p ~ e^-k per key; if this "
                "fires, inspect the hash column for non-uniformity)"
            )
    finally:
        vals.unpersist()
    return sk


def kmv_estimate(ns: Column, kth: Column, k: int = KMV_K) -> Column:
    """Distinct-count estimate from a sketch's (size, k-th minimum):
    exact below k, (k-1)·SPACE/kth at k — one correctly-rounded IEEE
    division over exact integers, snapped to BIGINT (bit-identical on
    any engine)."""
    return F.when(ns < k, ns.cast("long")).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(float(KMV_SPACE)) / kth.cast("double")
            + F.lit(0.5)
        ).cast("long")
    )


def kmv_merge_foreach_batch(
    spark,
    store_path: str,
    key_col: str,
    value_col: str,
    k: int = KMV_K,
):
    """``foreachBatch`` handler maintaining a persisted per-key KMV
    relation under a stream — the sketch-column maintenance pattern
    (Druid/BigQuery) for distinct counting with SET OPERATIONS over
    unbounded feeds. Idempotent by construction: the sketch is a set
    union + k-min, so an at-least-once redelivery merges to the same
    relation (no dedup bookkeeping needed — the property the
    events_stream_kmv query certifies).

    Scale shape: incoming rows hash map-side and are pre-filtered by
    the existing per-key k-th minimum (the classic KMV insert filter —
    once a key's sketch is full, only hashes BELOW its kth can change
    it, so a mature sketch admits ~k/n of the stream); the merge ranks
    ≤ k + admitted rows per key. The store itself is k x |keys| rows —
    panel-sized — and is rewritten atomically via collect +
    overwrite."""

    def handle(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession
        incoming = (
            batch_df.select(
                F.col(key_col).alias("key"),
                kmv_hash(F.col(value_col)).alias("hv"),
            )
            .filter(F.col("hv").isNotNull())
            .distinct()
        )
        # Probe store existence explicitly (Hadoop FS, works for any
        # scheme) so that ONLY "no store yet" takes the bootstrap path.
        # A transient/corrupt read error on an EXISTING store must
        # propagate — silently overwriting with the current batch would
        # discard all accumulated sketch history and break the lossless
        # maintenance contract events_stream_kmv certifies.
        jvm = sess._jvm
        hconf = sess._jsc.hadoopConfiguration()
        jpath = jvm.org.apache.hadoop.fs.Path(store_path)
        has_store = jpath.getFileSystem(hconf).exists(jpath)
        if has_store:
            existing = sess.read.parquet(store_path).select("key", "hv")
            gate = existing.groupBy("key").agg(
                F.count(F.lit(1)).alias("__n"), F.max("hv").alias("__kth")
            )
            incoming = (
                incoming.join(F.broadcast(gate), "key", "left")
                .filter(
                    F.col("__n").isNull()
                    | (F.col("__n") < k)
                    | (F.col("hv") < F.col("__kth"))
                )
                .select("key", "hv")
            )
            merged = existing.unionByName(incoming).distinct()
        else:
            merged = incoming
        w = Window.partitionBy("key").orderBy("hv")
        folded = (
            merged.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("key", "hv")
        )
        # schema follows the key column's actual type (string, long, …)
        # rather than a hardcoded literal — the merge logic above is
        # type-agnostic and the store must be too
        out_schema = folded.schema
        rows = folded.collect()  # panel-sized: <= k x |keys|
        sess.createDataFrame(rows, schema=out_schema).coalesce(
            1
        ).write.mode("overwrite").parquet(store_path)

    return handle

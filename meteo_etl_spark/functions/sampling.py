"""Deterministic hash-based sampling and dataset splitting.

A training-data pipeline needs REPRODUCIBLE sampling: the same row
must land in the same split on every run, on any cluster size, with
no coordination — which rules out ``rand()`` (per-task seeds) and
``df.sample`` (partition-layout dependent). The standard answer is a
content hash of a stable id: ``bucket = int(md5(id)[:4]) mod B``
gives every row a uniform, machine-independent bucket in [0, B), and
splits/samples are bucket-range predicates — pure map work, no
shuffle, trivially pushed into scans at 100 TB, and stable under
repartitioning, retries, and incremental appends.

md5 is used (not xxhash64) because the DuckDB oracle computes the
identical bucket: Spark ``conv(substring(md5(x),1,8),16,10)`` ==
DuckDB ``('0x' || substr(md5(x),1,8))::BIGINT``. 32 hash bits keep
the modulo bias negligible: 2**32 % 1000 = 296, so the heaviest
bucket is only ~2.3e-7 relatively more likely than the lightest
(16 bits had a 1.5% skew between buckets 0-535 and 536-999).

Reference parity: no reference counterpart (the reference has no
sampling surface); mandated by BASELINE.json's training-data scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: bucket granularity — permille resolution for split fractions.
HASH_BUCKETS = 1000


def hash_bucket(id_col: Column | str, buckets: int = HASH_BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, buckets) from a stable id.
    32 bits of md5 (8 hex chars): residual modulo bias is
    (2**32 % buckets) / 2**32 ≈ 7e-8 absolute for buckets=1000 —
    negligible for any split/sample fraction.

    .. versionchanged:: round 2
        Widened from 16 to 32 md5 bits (the 16-bit form had ~0.5%
        modulo bias at buckets=1000). This REASSIGNS essentially every
        id to a new bucket: splits/samples persisted under the 16-bit
        scheme do not reproduce under this function. No such artifacts
        exist in this repo (the change landed before any persisted
        split); if you have external ones, pin the old function rather
        than mixing schemes within one dataset."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
        % F.lit(buckets)
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float],
    *,
    bucket_col: str = "bucket",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a named split by bucket range.

    ``splits`` maps name -> fraction (must sum to 1.0 within permille
    resolution); ranges are allocated in insertion order, so
    ``{"train": .9, "val": .05, "test": .05}`` gives buckets
    [0,900) / [900,950) / [950,1000). Adding rows later never moves an
    existing row between splits."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")

    b = hash_bucket(id_col)
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    for name, frac in splits.items():
        acc += frac
        bounds.append((name, round(acc * HASH_BUCKETS)))
    if bounds[-1][1] != HASH_BUCKETS:
        raise ValueError("split fractions must resolve to whole permille buckets")

    expr = None
    for name, ub in bounds:
        cond = b < F.lit(ub)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(bucket_col, b).withColumn(split_col, expr)


def hash_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Deterministic ``fraction`` sample: keep rows whose bucket falls
    below ``fraction * HASH_BUCKETS``. Same rows every run; composable
    (a 10% sample of a 50% sample is the first 5% of buckets)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_bucket(id_col) < F.lit(round(fraction * HASH_BUCKETS)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling (e.g. language rebalancing):
    keep a row iff its hash bucket falls under its OWN stratum's
    fraction. Pure map like hash_sample — no shuffle, no coordination,
    reproducible under repartitioning/appends — but the threshold is a
    CASE over the stratum column, so each class is up/down-weighted
    independently (the standard corpus-mixing knob at 100 TB).

    The bucket is salted ('strat:' prefix) so composing with
    hash_split/hash_sample stays independent: otherwise a row's split
    assignment and its sample fate would be correlated through the
    same md5 bits."""
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0, 1], got {frac}")
    salted = F.concat(F.lit("strat:"), F.col(id_col).cast("string"))
    b = hash_bucket(salted)
    thr = None
    for name, frac in fractions.items():
        cond = F.col(stratum_col) == name
        permille = F.lit(round(frac * HASH_BUCKETS))
        thr = F.when(cond, permille) if thr is None else thr.when(cond, permille)
    thr = thr.otherwise(F.lit(round(default_fraction * HASH_BUCKETS)))
    return df.filter(b < thr)


def mixture_plan(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Data-mixing planner: per source, the token mass and the
    sampling-rate multiplier that rebalances the corpus to a UNIFORM
    target mixture — the "domain weights" table every multi-source
    training run starts from (rate > 1 means the source is upsampled /
    seen for multiple epochs, rate < 1 means downsampled).

    Output per source: ``(source, n_docs, n_tokens, natural_share,
    target_share, sampling_rate)`` with sampling_rate =
    target_share / natural_share. Feed the rate into ``hash_sample``
    (fraction = min(rate, 1)) for the downsampling side; upsampling is
    a repeat count for the data loader.

    Scale shape: one groupBy(source) aggregate over the corpus
    (token counts combine map-side), then the per-source shares join
    the 1-row global total as a broadcast scalar — the standard
    decorrelated-scalar shape, O(sources) rows after the single
    corpus-wide shuffle. All shares are exact-integer ratios rounded
    at 6 dp, so the plan is engine-reproducible.
    """
    per = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(text_col, " "))).cast("long").alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens").cast("double") / F.col("t"), 6).alias(
                "natural_share"
            ),
            F.round(F.lit(1.0) / F.col("k"), 6).alias("target_share"),
            F.round(
                F.col("t").cast("double") / (F.col("k") * F.col("n_tokens")), 6
            ).alias("sampling_rate"),
        )
        .orderBy("source")
    )


def waterfill_allocation(
    weights: DataFrame,
    key_col: str,
    weight_col: str,
    budget_frac_permille: int = 500,
) -> DataFrame:
    """Water-filling token-budget allocation across sources — the
    capped-mixture planner: given per-key masses ``w_k`` and a global
    budget ``B`` (``budget_frac_permille``/1000 of the total, integer
    DIV so both engines agree exactly), find the level λ with
    Σ min(w_k, λ) = B and allocate ``min(w_k, λ)`` — small sources
    keep their full mass, over-represented ones are capped at a
    COMMON level instead of a proportional haircut (the max-min fair
    allocation used in multi-source data recipes to stop one giant
    crawl from crowding out everything else; proportional scaling is
    ``mixture_plan``'s job).

    Closed form, no iteration: keys sorted ascending by (w, key);
    with prefix sums P_i, the candidate level at pivot i is
    λ_i = (B - P_{i-1}) / (n - i + 1), and the solution is λ at the
    FIRST i where λ_i <= w_i (every j < i ships whole, every j >= i
    is capped). If no pivot qualifies, B >= total and nothing is
    capped. Each λ_i is ONE correctly-rounded IEEE division of exact
    integers, so the level — and the allocation table — is
    bit-reproducible in any engine (the priority_sample determinism
    discipline).

    Output: ``(key, weight, alloc: double, capped: int)`` —
    Σ alloc = B exactly (up to the one division's rounding) when
    capping engaged.

    Scale shape: the window sort and prefix sums run over the KEY
    table (O(sources) rows — tiny next to the corpus aggregate that
    produced it); the two 1-row scalars (total/count, pivot level)
    broadcast into it — the decorrelated-scalar shape. Nothing
    touches the fact table here."""
    # Every weight reference is the SAME per-row long cast: a
    # fractional weight column would otherwise make the budget
    # (computed from the raw sum) silently disagree with the prefix
    # sums (computed from truncated rows) and break the documented
    # Σ alloc = B contract (r13 advice). Truncation-at-the-row is the
    # single normalization everywhere.
    wl = F.col(weight_col).cast("long")
    w = Window.orderBy(wl, key_col)
    ranked = weights.select(
        F.col(key_col).alias("key"),
        wl.alias("weight"),
        F.row_number().over(w).alias("rk"),
        F.coalesce(
            F.sum(wl).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("long")
        .alias("pfx"),
    )
    tot = weights.agg(
        F.expr(
            f"sum(CAST({weight_col} AS LONG))"
            f" * {int(budget_frac_permille)} DIV 1000"
        ).alias("budget"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    lam = (F.col("budget") - F.col("pfx")).cast("double") / (
        F.col("n") - F.col("rk") + F.lit(1)
    ).cast("double")
    staged = ranked.crossJoin(F.broadcast(tot)).select(
        "key", "weight", "rk", lam.alias("lam_i")
    )
    pivot = staged.filter(F.col("lam_i") <= F.col("weight")).agg(
        F.min("rk").alias("prk"),
        F.min_by("lam_i", "rk").alias("lvl"),
    )
    capped = F.col("prk").isNotNull() & (F.col("rk") >= F.col("prk"))
    return (
        staged.crossJoin(F.broadcast(pivot))
        .select(
            "key",
            "weight",
            F.when(capped, F.col("lvl"))
            .otherwise(F.col("weight").cast("double"))
            .alias("alloc"),
            capped.cast("int").alias("capped"),
        )
        .orderBy("key")
    )


def priority_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows via PRIORITY
    SAMPLING (Duffield, Lund & Thorup, JACM 2007): each row draws a
    reproducible uniform u ∈ (0, 1] from md5(id) and gets priority
    w / u; the k highest priorities win. Inclusion probability is
    min(1, w/τ) with τ the (k+1)-th priority — the estimator with
    minimal variance among threshold schemes.

    Determinism/parity: u = (md5-int + 1) / 2³² and the priority are
    each ONE correctly-rounded IEEE division, so the ranking — and the
    sample — is bit-identical in any engine replaying the same md5
    arithmetic (no rand(), no pow/log). Ties break on id.

    Scale shape: priority is a pure map; top-k is TakeOrdered
    (per-partition heaps, no global sort). Adds a ``priority`` column;
    weights must be positive."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 32))
    pri = F.col(weight_col).cast("double") / u
    return (
        df.withColumn("priority", pri)
        .orderBy(F.desc("priority"), F.col(id_col))
        .limit(k)
    )


#: default shard count for the epoch-shuffle demo surface; real runs
#: size this to (corpus bytes / target shard bytes).
EPOCH_SHARDS = 8


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    *,
    epoch: int,
    shards: int = EPOCH_SHARDS,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic per-epoch global shuffle for training-order
    serving: every row gets a ``(shard, pos)`` address that is a
    reproducible pseudorandom permutation of the corpus, re-drawn per
    epoch (hash of ``epoch || ':' || id``).

    The global training order is shard-major — (shard 0, pos 1..),
    (shard 1, pos 1..), … — which is exactly what a sharded data
    loader consumes. Crucially there is NO global sort: the plan is
    one hash shuffle into ``shards`` groups plus a per-shard window
    sort, so each reducer sorts corpus/shards rows; at 100 TB the
    writer pairs this with ``repartition(shards, shard)`` +
    ``sortWithinPartitions`` so every epoch manifest streams out
    without ever totally ordering the corpus. Same-epoch replays are
    bit-identical on any cluster size; no ``rand()`` anywhere."""
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    h = F.md5(
        F.concat_ws(
            ":", F.lit(int(epoch)).cast("string"), F.col(id_col).cast("string")
        )
    )
    shard = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(int(shards))
    from pyspark.sql import Window

    out = df.withColumn("__h", h).withColumn(shard_col, shard)
    w = Window.partitionBy(shard_col).orderBy(F.col("__h"), F.col(id_col))
    return out.withColumn(pos_col, F.row_number().over(w).cast("long")).drop("__h")


#: prefix-sum bucket fan-out for token_budget_sample — 2 hex chars of
#: the order key, so bucket order IS order-key order (fixed-width
#: lowercase hex sorts identically as string and as integer).
BUDGET_BUCKETS = 256


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    *,
    cum_col: str = "cum_tokens",
) -> DataFrame:
    """Keep documents — in deterministic md5(id) order — until a
    cumulative token budget is exhausted: the "give me exactly N
    training tokens, reproducibly" primitive every run-budgeted
    pretraining mix needs (priority_sample fixes a row COUNT, this
    fixes the TOKEN total the model actually consumes).

    Scale shape — a distributed prefix sum, never a global sort:

    1. bucket = first 2 md5 hex chars (256 buckets); bucket order is
       a prefix of the full order key, so (bucket, key) order == key
       order.
    2. per-bucket token totals: one map-side-combined aggregate to
       256 rows; a 256-row running sum (driver-scale window) yields
       each bucket's starting offset.
    3. offsets broadcast back; a per-bucket window running sum plus
       the offset gives every row its exact global cumulative
       position; rows with ``cum <= budget`` survive.

    At 100 TB the only data-sized exchange is the per-bucket window
    shuffle (each reducer sorts corpus/256 rows); raise
    BUDGET_BUCKETS to keep reducer slices bounded. Same answer on any
    cluster size — no rand(), no partition-layout dependence."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    from pyspark.sql import Window

    hh = F.md5(F.col(id_col).cast("string"))
    keyed = df.withColumn("__hh", hh).withColumn(
        "__b", F.conv(F.substring("__hh", 1, 2), 16, 10).cast("int")
    )
    totals = keyed.groupBy("__b").agg(
        F.sum(F.col(tokens_col).cast("long")).alias("__t")
    )
    # 256-row frame: the unpartitioned window is a deliberate
    # driver-scale step, NOT a corpus-wide single-reducer sort.
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__t").over(w_off), F.lit(0)).alias("__off")
    )
    w_run = (
        Window.partitionBy("__b")
        .orderBy(F.col("__hh"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        keyed.join(F.broadcast(offsets), "__b")
        .withColumn(
            cum_col,
            (F.sum(F.col(tokens_col).cast("long")).over(w_run) + F.col("__off")),
        )
        .filter(F.col(cum_col) <= F.lit(int(budget)))
        .drop("__b", "__hh", "__off")
    )

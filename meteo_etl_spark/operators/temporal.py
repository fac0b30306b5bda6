"""Temporal joins Spark lacks as built-ins: as-of join and band
(range) join, both expressed as shuffle-friendly compositions of
DataFrame ops — never a broadcast-nested-loop or per-key cross
product.

- **as-of join** — for each left row, the latest right row with
  ``right_ts <= left_ts`` in the same key group (backward direction,
  inclusive — the semantics of DuckDB/pandas ASOF). Implemented as
  union + window: tag both inputs, sort each key group by (ts, tag)
  with right rows first at equal timestamps, and carry the right
  columns forward with ``last(..., ignorenulls=True)``. ONE shuffle on
  the join key and a per-key sort — the same cost as any keyed window,
  with no range-condition blowup. At 100 TB this is the only shape
  that survives: the naive formulation (equi-join on key + range
  filter) materializes the per-key cross product first.

- **band join** — pairs (l, r) in the same key group with
  ``|l_ts - r_ts| <= tolerance``. Implemented by time-binning: left
  rows get bin ``floor(ts/w)``, right rows are replicated into bins
  {b-1, b, b+1} with ``w = tolerance``, and the range condition
  becomes an equi-join on (key, bin) + an exact filter. Replicating
  one side 3x buys equi-join keys fine enough to shuffle-partition —
  the standard distributed interval-join trick (vs. Spark's planner,
  which turns key-equality + range into an equi-join on the key alone
  and filters the per-key cross product; 5 distinct keys at 100 TB =
  5 giant skewed partitions).

Reference parity: the reference has no temporal joins (its only join
surface is the dashboard's single-table queries, dashboard/queries.py);
these extend the engine surface per BASELINE.json's 100 TB mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from meteo_etl_spark.functions.epoch import epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str],
    suffix: str = "_right",
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join: attach to each left row the most recent
    right row (``right_ts <= left_ts``, inclusive) within its ``on``
    key group.

    Output = left columns + ``right_ts + suffix`` + each of
    ``right_cols`` suffixed. ``how='left'`` keeps left rows with no
    prior right row (NULL right columns); ``'inner'`` drops them.
    Right timestamps must be unique per key group for deterministic
    results (last-sorted wins otherwise).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    # Tag and align the two sides on a shared schema: key cols, event
    # time, side marker, left payload, right payload (null on the
    # other side).
    lpay = [c for c in left.columns if c not in on and c != left_ts]
    matched_ts = right_ts + suffix
    carried = [matched_ts] + [c + suffix for c in right_cols]

    lside = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *lpay,
        F.lit(None).cast(right.schema[right_ts].dataType).alias(matched_ts),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c + suffix)
            for c in right_cols
        ],
    )
    rside = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        F.col(right_ts).alias(matched_ts),
        *[F.col(c).alias(c + suffix) for c in right_cols],
    )

    # Right rows sort BEFORE left rows at equal timestamps, so a left
    # row matches a right row with the exact same ts (inclusive <=).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lside.unionByName(rside).select(
        *on,
        "__ts",
        "__is_left",
        *lpay,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carried],
    )
    out = filled.filter(F.col("__is_left") == 1).select(
        *on, F.col("__ts").alias(left_ts), *lpay, *carried
    )
    if how == "inner":
        out = out.filter(F.col(matched_ts).isNotNull())
    return out


def band_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_sec: int,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """All pairs with ``|left_ts - right_ts| <= tolerance_sec`` within
    each ``on`` key group, via time-bin equi-join (bin width =
    tolerance, right side replicated into its bin ±1 — adjacency
    covers the whole band exactly).

    Output: key cols + every non-key column of each side under its
    prefix. The exact band predicate is applied AFTER the bin
    equi-join, so binning is pure pruning, never a semantics change.
    """
    w = int(tolerance_sec)
    if w <= 0:
        raise ValueError("tolerance_sec must be positive")

    lcols = [c for c in left.columns if c not in on]
    rcols = [c for c in right.columns if c not in on]

    lb = left.select(
        *on,
        *[F.col(c).alias(left_prefix + c) for c in lcols],
        F.floor(epoch_us(left_ts) / (w * 1_000_000)).alias("__bin"),
    )
    rb = right.select(
        *on,
        *[F.col(c).alias(right_prefix + c) for c in rcols],
        F.explode(
            F.array(
                *[
                    F.floor(epoch_us(right_ts) / (w * 1_000_000)) + F.lit(d)
                    for d in (-1, 0, 1)
                ]
            )
        ).alias("__bin"),
    )
    lts = epoch_us(left_prefix + left_ts)
    rts = epoch_us(right_prefix + right_ts)
    return (
        lb.join(rb, [*on, "__bin"])
        .filter(F.abs(lts - rts) <= w * 1_000_000)
        .drop("__bin")
    )


def resample_linear(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    *,
    bin_seconds: int = 3600,
    decimals: int = 3,
) -> DataFrame:
    """Regularize an irregular time series: bin, gap-fill, interpolate.

    The hypertable-style resample a sensor/metrics store runs
    constantly (the reference's meteo observations are exactly such a
    series — `etl/transform.py` normalizes to minute grain but leaves
    gaps where the upstream returned null). Three declarative stages:

    1. **bin**: events -> (group, epoch//bin_seconds) with the mean
       value per bin. Partial aggregation absorbs the fan-in map-side;
       ONE shuffle on the composite key. Means are exact-integer sums
       (2-decimal fixed point) divided once — order-independent, so
       the oracle matches bit-for-bit.
    2. **grid**: per group, `sequence(min_bin, max_bin)` exploded — a
       generate, no shuffle (the span aggregate is k rows).
    3. **fill**: left-join grid to bins (co-partitioned on the same
       key), then ONE window sort per group serves all four frame
       functions (prev/next observed bin + value via
       last/first IGNORE NULLS) and the linear interpolation
       `pv + (nv-pv) * (h-ph)/(nh-ph)` is a pure projection.

    At 100 TB the plan is: one keyed shuffle + one window sort per
    group — both on (group, bin), reusable across downstream rollups.
    Interior gaps always have observed neighbors (the grid spans
    min..max per group), so no extrapolation branch exists.
    """
    g = F.col(group_col)
    h = F.expr(f"unix_timestamp({ts_col}) div {bin_seconds}")
    e2 = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    bins = (
        df.groupBy(g.alias(group_col), h.alias("h"))
        .agg(
            # COUNT of the value itself (not COUNT(*)): rows with a NULL
            # value are excluded from the sum, so counting them in the
            # denominator would bias mixed null/non-null bins downward.
            (
                F.sum(e2).cast("double") / F.count(e2) / 100
            ).alias("a")
        )
    )
    span = bins.groupBy(group_col).agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = span.select(
        group_col, F.explode(F.sequence("h0", "h1")).alias("h")
    )
    j = grid.join(bins, [group_col, "h"], "left")
    wp = (
        Window.partitionBy(group_col)
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(group_col)
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("a").isNotNull(), F.col("h"))
    ph = F.last(obs_h, ignorenulls=True).over(wp)
    pv = F.last("a", ignorenulls=True).over(wp)
    nh = F.first(obs_h, ignorenulls=True).over(wf)
    nv = F.first("a", ignorenulls=True).over(wf)
    interp = pv + (nv - pv) * ((F.col("h") - ph).cast("double") / (nh - ph))
    filled = F.when(F.col("a").isNotNull(), F.col("a")).otherwise(interp)
    scale = 10 ** decimals
    return j.select(
        group_col,
        "h",
        (F.floor(filled * scale + F.lit(0.5)) / scale).alias("value"),
        F.col("a").isNull().alias("is_gap"),
    )

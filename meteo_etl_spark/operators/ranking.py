"""Distributed global ranking — row_number / ntile over a TOTAL order
without a single-partition sort.

``row_number().over(Window.orderBy(...))`` (no partitionBy) plans a
``Sort`` under ``Exchange SinglePartition``: Spark moves EVERY row to
one task to rank it — the textbook scale-killer (r13 verdict,
emb_hygiene_audit). This module computes the identical rank with
bounded per-task state, the classic range-partitioned-rank idiom:

1. one aggregate pass sketches ~``n_buckets`` boundary values of the
   FIRST order key (``approx_percentile`` — the sketch only *places*
   rows into buckets, it never affects the rank itself);
2. each row gets a bucket id by counting boundaries strictly below
   (above, for a descending key) its key — equal keys always share a
   bucket, so bucket boundaries respect the total order exactly;
3. a PARTITIONED window ranks rows inside each bucket (parallel,
   per-task state bounded by the largest bucket ≈ n/n_buckets plus
   the largest tie group);
4. bucket row-counts (≤ n_buckets rows, collected driver-side) turn
   into cumulative offsets, broadcast-joined back:
   ``global rank = bucket offset + local rank``.

Cost: 2 extra aggregate passes over the input (boundary sketch +
bucket counts) and one hash shuffle on the bucket id — every stage is
embarrassingly parallel. Skew bound: a single over-weight key value
lands its whole tie group in one bucket; the local sort is bounded by
that tie group, never by the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meteo_etl_spark.functions.lits import dlit, num_lit_array

#: default bucket fan-out for the range-partitioned rank. 64 buckets
#: over 32 local cores keeps every core busy; at cluster scale pass
#: ~2-4x the executor-core count.
DEFAULT_RANK_BUCKETS = 64


def _order_columns(order_by: list[tuple[str, str]]):
    cols = []
    for name, direction in order_by:
        d = direction.lower()
        if d not in ("asc", "desc"):
            raise ValueError(f"direction must be asc|desc, got {direction!r}")
        cols.append(F.col(name).asc() if d == "asc" else F.col(name).desc())
    return cols


def global_row_number(
    df: DataFrame,
    order_by: list[tuple[str, str]],
    *,
    rn_col: str = "rn",
    n_buckets: int = DEFAULT_RANK_BUCKETS,
    accuracy: int = 10_000,
    counts_out: dict | None = None,
) -> DataFrame:
    """``df`` plus a 1-based global ``row_number`` column over the
    total order ``order_by`` (list of ``(column, "asc"|"desc")``),
    computed without any single-partition sort.

    Requirements: the FIRST order column must be numeric (it is the
    bucketing key; remaining columns are tie-breakers and may be any
    orderable type). NULLs in the first key are routed to a dedicated
    bucket matching Spark's window null ordering — FIRST for ``asc``,
    LAST for ``desc`` — never silently mis-bucketed (a NULL key makes
    every boundary comparison NULL, so without the explicit route the
    row would land in bucket 0, wrong for ``desc``). The produced
    ranks are exactly those of
    ``row_number().over(Window.orderBy(...))`` — same values, same
    tie resolution — only the physical plan differs.

    ``counts_out``: optional dict the function fills with ``{"n":
    total_rows, "bucket_counts": {bucket: rows}}`` — the per-bucket
    census it already computes. Callers needing the table's row count
    (e.g. a max-rank probe, NTILE math) read it from here instead of
    paying a second full scan.
    """
    first_name, first_dir = order_by[0]
    key = F.col(first_name)

    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(
        F.approx_percentile(key, dlit(qs), F.lit(accuracy)).alias("bounds")
    ).collect()[0]
    bounds = sorted(set(row.bounds or []))  # dedup collapsed quantiles

    if bounds:
        arr = num_lit_array(bounds)
        cmp = (lambda b: key > b) if first_dir.lower() == "asc" else (lambda b: key < b)
        bucket = F.size(F.filter(arr, cmp)).cast("int")
    else:
        bucket = F.lit(0)
    # NULL first-key rows: Spark's asc window = NULLS FIRST → a bucket
    # strictly below every non-null bucket; desc = NULLS LAST → one
    # strictly above (non-null buckets top out at len(bounds)).
    null_bucket = -1 if first_dir.lower() == "asc" else len(bounds) + 1
    bucket = F.when(key.isNull(), F.lit(null_bucket)).otherwise(bucket)
    bucketed = df.withColumn("__rank_bkt", bucket)

    # Cumulative offsets from the tiny per-bucket census (≤ n_buckets
    # rows — collected driver-side so the offset table never plans its
    # own unpartitioned window).
    counts = {
        r["__rank_bkt"]: r["c"]
        for r in bucketed.groupBy("__rank_bkt").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    if counts_out is not None:
        counts_out["n"] = sum(counts.values())
        counts_out["bucket_counts"] = dict(counts)
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(b, o) for b, o in offsets.items()], schema="__rank_bkt int, __rank_off long"
    )

    w = Window.partitionBy("__rank_bkt").orderBy(*_order_columns(order_by))
    return (
        bucketed.join(F.broadcast(off_df), "__rank_bkt")
        .withColumn(
            rn_col, (F.row_number().over(w) + F.col("__rank_off")).cast("long")
        )
        .drop("__rank_bkt", "__rank_off")
    )


def ntile_from_rank(rn, n: int, n_tiles: int):
    """SQL ``NTILE(n_tiles)`` bucket from a 1-based global rank column
    and the total row count — exact remainder semantics: the first
    ``n mod n_tiles`` tiles hold ``n div n_tiles + 1`` rows each."""
    bs = n // n_tiles
    r = n % n_tiles
    fat_rows = r * (bs + 1)
    if bs == 0:
        # fewer rows than tiles: rank IS the tile
        return rn.cast("long")

    def idiv(num, d: int):
        # exact integer floor-division for non-negative longs: strip
        # the remainder first so the FP divide is a representable
        # integer ratio (bit-exact at any n, no last-ulp floor risk)
        return ((num - F.pmod(num, F.lit(d))) / F.lit(d)).cast("long")

    fat = idiv(rn - 1, bs + 1) + 1
    thin = F.lit(r) + idiv(rn - fat_rows - 1, bs) + 1
    return F.when(rn <= fat_rows, fat).otherwise(thin).cast("long")


def global_ntile(
    df: DataFrame,
    order_by: list[tuple[str, str]],
    n_tiles: int,
    *,
    tile_col: str,
    n: int | None = None,
    n_buckets: int = DEFAULT_RANK_BUCKETS,
) -> DataFrame:
    """``df`` plus an exact ``NTILE(n_tiles) OVER (ORDER BY ...)``
    column, computed via :func:`global_row_number` (no
    single-partition WindowExec). ``n`` may be passed when the caller
    already holds the row count; otherwise it is read from the rank
    route's own bucket census (no extra scan)."""
    tmp = f"__{tile_col}_rn"
    census: dict = {}
    ranked = global_row_number(
        df, order_by, rn_col=tmp, n_buckets=n_buckets, counts_out=census
    )
    if n is None:
        n = census["n"]
    if n == 0:
        return df.withColumn(tile_col, F.lit(None).cast("long"))
    return ranked.withColumn(
        tile_col, ntile_from_rank(F.col(tmp), n, n_tiles)
    ).drop(tmp)

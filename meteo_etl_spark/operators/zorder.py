"""Z-order (Morton-curve) file clustering for multi-column data skipping.

Parquet pruning works off per-file/row-group min-max stats: a scan can
skip a file only if the predicate column's range excludes it. Sorting
the table by ONE column makes that column prunable and leaves every
other column's per-file range as wide as the table — the classic
single-sort-key limitation. Interleaving the bits of several columns'
bucket numbers (the Z-/Morton curve) and range-partitioning on that
interleaved value gives every participating column a narrow range in
every file, so predicates on ANY of them prune — the same layout
optimization Delta's ``OPTIMIZE ZORDER BY`` and Iceberg's sort-order
rewrite apply, reduced here to first principles in plain DataFrame ops.

Plan shape: one min-max aggregate per z column (a scalar collect),
then ``repartitionByRange`` on the z-value (one range exchange using
Spark's sampled range partitioner) + ``sortWithinPartitions`` —
exactly the shuffle a plain sorted write costs; the clustering is
free beyond it. At 100 TB this runs per partition/compaction batch
(compose with ``operators/compact.py``), never as one global job.

Bucketing is uniform over the exact [min, max] span (data-independent
given the two scalars, so the layout is reproducible). Heavily skewed
columns concentrate in few buckets and prune less; swap the bucket
expression for quantile cut points (``operators/quantiles.py``) when
that matters — the interleave and write path are unchanged.

Reference parity: no reference counterpart (single Postgres table);
engine-side scale infrastructure, same family as bucketing.py and
compact.py (SURVEY.md §2.6 scale ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per column in the interleaved value. 8 bits = 256 buckets per
#: column; with k columns the z-value uses 8k bits, which must stay
#: under 64 to keep bit 63 (the int64 SIGN bit) clear — a set sign bit
#: would order the curve's top quadrant before everything else. At the
#: default 8 bits that allows up to 7 columns; ``zorder_values`` lowers
#: ``bits`` automatically for 8 columns (7 bits → 128 buckets, still
#: far finer than per-file granularity needs).
ZORDER_BITS = 8

Z_COL = "__z"


def _bucket(col: Column, mn: float, mx: float, bits: int) -> Column:
    """Uniform bucket id in [0, 2^bits) over the exact [mn, mx] span."""
    n = 1 << bits
    if mx == mn:
        return F.lit(0).cast("long")
    width = (mx - mn) / n
    raw = F.floor((col.cast("double") - F.lit(float(mn))) / F.lit(width))
    return F.least(F.lit(n - 1).cast("long"), F.greatest(F.lit(0).cast("long"), raw.cast("long")))


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton interleave: bit j of column c lands at j*k + (k-1-c), so
    all columns' high bits dominate together — disjoint positions, so
    the sum of shifted bits IS the bitwise OR."""
    k = len(buckets)
    z = F.lit(0).cast("long")
    for c, b in enumerate(buckets):
        for j in range(bits):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, j * k + (k - 1 - c))
    return z


def zorder_values(
    df: DataFrame, cols: list[str], *, bits: int = ZORDER_BITS
) -> DataFrame:
    """``df`` plus the ``__z`` Morton value over ``cols`` (2-8 numeric
    columns). One min-max aggregate per call feeds the bucket literals;
    the z computation itself is a pure codegen'd map."""
    if not 2 <= len(cols) <= 8:
        raise ValueError(f"zorder needs 2-8 columns, got {len(cols)}")
    # keep the interleaved value inside int64's non-negative range:
    # k*bits <= 63 (bit 63 is the sign bit — setting it would sort the
    # curve's top quadrant FIRST and split every range boundary file)
    bits = min(bits, 63 // len(cols))
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"mx{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    buckets = [
        _bucket(F.col(c), stats[f"mn{i}"], stats[f"mx{i}"], bits)
        for i, c in enumerate(cols)
    ]
    return df.withColumn(Z_COL, _interleave(buckets, bits))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    num_files: int,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as ``num_files`` z-clustered parquet files: range
    partition on the z-value (disjoint curve segments per file) + sort
    within, so every z column carries tight min-max stats in every
    file and predicates on any of them prune."""
    zdf = zorder_values(df, cols, bits=bits)
    (
        zdf.repartitionByRange(num_files, Z_COL)
        .sortWithinPartitions(Z_COL)
        .drop(Z_COL)
        .write.mode("overwrite")
        .parquet(path)
    )

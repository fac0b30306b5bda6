"""Column profiling — the data-quality census a pipeline runs before
trusting a new delivery (null rates, cardinalities) — as ONE scan.

All per-column aggregates are computed in a single ``agg``: Catalyst
plans the multi-distinct via Expand (row replicated once per distinct
aggregate) feeding one shuffled aggregation, so the input is read
once no matter how many columns are profiled. The wide 1-row result
is then unpivoted driver-free with an ``explode`` of per-column
structs.

Scale judgment: Expand multiplies shuffled rows by the distinct-agg
count — exact cardinalities on ALL columns of a 100 TB table is a
deliberate choice, not a default. ``exact=False`` swaps in
``approx_count_distinct`` (HLL), which collapses the whole profile to
one partial-aggregated pass with NO Expand and a few KB of sketch per
column — the 100 TB default; the exact form is the oracle-checkable
twin (same contract as q3_composite_distinct / q3_approx_distinct).

Reference: the reference trusts its Postgres schema + pydantic
validation (`etl/models.py`); a lake engine has no such gate, so the
profile IS the validation input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None, *, exact: bool = True) -> DataFrame:
    """Per-column ``(column, n, n_null, n_distinct)`` in one scan.

    ``n`` is the table row count (repeated per row for a self-contained
    report); ``n_distinct`` counts non-null distincts — exact when
    ``exact``, HLL otherwise.
    """
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("no columns to profile")
    nd = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"))
        aggs.append(nd(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__nn_{c}").alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return (
        wide.select(F.col("__n").alias("n"), F.explode(entries).alias("e"))
        .select("e.column", "n", "e.n_null", "e.n_distinct")
        .orderBy("column")
    )

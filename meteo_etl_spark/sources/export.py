"""Dataset export sinks: sharded JSONL and globally-ordered parquet.

A training-data pipeline's last mile is rarely parquet-in-place: it
ships (a) JSONL shards sized for downstream loaders and (b) exports
with a GLOBAL total order (curriculum schedules, binary-searchable
id ranges). Both are pure Spark write shapes:

- ``export_jsonl`` — round-robin repartition to a target shard count
  (or rows-per-shard), one JSON object per line. Shard count, not
  shard assignment, is the contract: readers must not assume row
  placement (hash_split is the deterministic-assignment tool).
- ``export_ordered`` — ``repartitionByRange`` + in-partition sort:
  file k holds keys strictly below file k+1 and every file is
  internally sorted, which is a global total order across the export
  at O(n log n/p) per partition — no single-reducer global sort. The
  range boundaries come from Spark's reservoir sampling of the key
  column (one extra pass, sampled, not a full scan).

Reference parity: no reference counterpart (its outputs are Postgres
rows); mandated by the training-data scope in BASELINE.md.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

#: default rows per JSONL shard when no shard count is given.
DEFAULT_ROWS_PER_SHARD = 100_000


def export_jsonl(
    df: DataFrame,
    path: str,
    *,
    num_shards: int | None = None,
    rows_per_shard: int = DEFAULT_ROWS_PER_SHARD,
) -> int:
    """Write ``df`` as JSONL shards; returns the shard count used.

    With no explicit ``num_shards`` the count is sized from a cheap
    ``df.count()`` (metadata-only for parquet inputs) over
    ``rows_per_shard``. Round-robin repartition gives near-uniform
    shard sizes regardless of input partitioning or skew."""
    if num_shards is None:
        num_shards = max(1, math.ceil(df.count() / rows_per_shard))
    df.repartition(num_shards).write.mode("overwrite").json(path)
    return num_shards


def export_ordered(
    df: DataFrame,
    path: str,
    order_cols: list[str],
    *,
    num_files: int,
) -> None:
    """Globally-ordered parquet export: range-partition on
    ``order_cols`` then sort within each partition — a total order
    across files without a single-reducer sort."""
    (
        df.repartitionByRange(num_files, *order_cols)
        .sortWithinPartitions(*order_cols)
        .write.mode("overwrite")
        .parquet(path)
    )

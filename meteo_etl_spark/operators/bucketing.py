"""Bucketed (pre-shuffled) table layout for co-located joins.

The biggest repeated cost in a 100 TB star schema is re-shuffling the
same fact table on the same join key query after query. Bucketing pays
that shuffle ONCE at write time: both sides are hash-partitioned into
the same number of buckets on the join key, so a later equi-join reads
bucket i against bucket i — no Exchange in the plan at all (verified
in tests/test_bucketing.py by asserting the join subtree is
Exchange-free).

Vanilla Spark requires a catalog table for bucket metadata
(``saveAsTable``); the ``path`` option keeps the data at an explicit
location so the layout outlives the in-memory catalog session —
re-registering is one ``CREATE TABLE ... USING parquet`` with the same
bucket spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    *,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) on the join key.

    Sorting within buckets additionally removes the join's Sort nodes
    (a bucketed+sorted sort-merge join is a pure streaming zip).
    """
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog —
    a plain path read would lose it and re-shuffle)."""
    return spark.table(table_name)

"""Schema evolution (schemas.py §6 policy): a v2 column-add merges in
without rewriting v1 partitions; v1 files stay byte-identical; both the
declared-schema read and the mergeSchema read fill the new column with
NULL on old rows. Reference counterpart: alembic migrations
(`alembic/versions/3967a578f902_*.py`) ALTERing the Postgres table —
a parquet lake evolves on read instead.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meteo_etl_spark.operators.upsert import merge_parquet
from meteo_etl_spark.schemas import validate_evolution


def _files(path):
    return {
        os.path.join(r, f): (os.path.getmtime(os.path.join(r, f)), os.path.getsize(os.path.join(r, f)))
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    }


def test_v2_column_add_without_old_partition_rewrite(spark, tmp_path):
    path = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-01", 20.0), (3, "2024-01-02", 30.0)],
        "k int, d string, v double",
    )
    merge_parquet(spark, path, v1, ["k"], partition_col="d")
    v1_files = _files(path)
    d1_files = {f: s for f, s in v1_files.items() if "d=2024-01-01" in f}
    assert d1_files

    # v2 batch: new nullable column, touches only partition 2024-01-02.
    v2 = spark.createDataFrame(
        [(3, "2024-01-02", 31.0, 0.5), (4, "2024-01-02", 40.0, 0.7)],
        "k int, d string, v double, humidity double",
    )
    stats = merge_parquet(spark, path, v2, ["k"], partition_col="d")
    assert (stats.updated, stats.inserted) == (1, 1)

    # old partition untouched: same files, same mtime+size.
    after = _files(path)
    assert {f: s for f, s in after.items() if "d=2024-01-01" in f} == d1_files

    # mergeSchema read: old rows NULL, new rows carry the value.
    got = {
        r.k: r.humidity
        for r in spark.read.option("mergeSchema", "true").parquet(path).collect()
    }
    assert got == {1: None, 2: None, 3: 0.5, 4: 0.7}

    # declared-schema (schema-on-read) path — the 100 TB read: no
    # footer union, same answer.
    v2_schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("humidity", T.DoubleType(), True),
        ]
    )
    got2 = {
        r.k: r.humidity
        for r in spark.read.schema(v2_schema).parquet(path).collect()
    }
    assert got2 == got


def test_v2_merge_updates_new_column_on_match(spark, tmp_path):
    """A later v2 merge over an OLD partition backfills the new column
    for matched rows while preserving unmatched target rows as NULL."""
    path = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-01", 20.0)], "k int, d string, v double"
    )
    merge_parquet(spark, path, v1, ["k"], partition_col="d")
    v2 = spark.createDataFrame(
        [(1, "2024-01-01", 11.0, 0.9)], "k int, d string, v double, humidity double"
    )
    merge_parquet(spark, path, v2, ["k"], partition_col="d")
    got = {
        (r.k): (r.v, r.humidity)
        for r in spark.read.option("mergeSchema", "true").parquet(path).collect()
    }
    assert got == {1: (11.0, 0.9), 2: (20.0, None)}


def test_validate_evolution_policy():
    v1 = T.StructType(
        [
            T.StructField("a", T.IntegerType(), False),
            T.StructField("b", T.FloatType(), True),
        ]
    )
    # add-nullable + widenings: legal
    v2 = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.DoubleType(), True),
            T.StructField("c", T.StringType(), True),
        ]
    )
    assert validate_evolution(v1, v2) == ["c"]

    with pytest.raises(ValueError, match="dropped"):
        validate_evolution(v1, T.StructType([v1.fields[0]]))
    with pytest.raises(ValueError, match="re-typed"):
        validate_evolution(
            v1,
            T.StructType(
                [T.StructField("a", T.StringType(), False), v1.fields[1]]
            ),
        )
    with pytest.raises(ValueError, match="must be nullable"):
        validate_evolution(
            v1,
            T.StructType(
                list(v1.fields) + [T.StructField("c", T.StringType(), False)]
            ),
        )
    with pytest.raises(ValueError, match="tightened"):
        validate_evolution(
            v1,
            T.StructType(
                [v1.fields[0], T.StructField("b", T.FloatType(), False)]
            ),
        )


def test_widened_declared_schema_reads_narrow_files(spark, tmp_path):
    """The policy's widening arm: files written int32/float read
    correctly under an int64/double declared schema (no rewrite)."""
    path = str(tmp_path / "t")
    spark.range(0, 5).select(
        F.col("id").cast("int").alias("a"), F.col("id").cast("float").alias("b")
    ).write.parquet(path)
    wide = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.DoubleType())]
    )
    got = spark.read.schema(wide).parquet(path)
    assert [f.dataType.simpleString() for f in got.schema.fields] == ["bigint", "double"]
    assert sorted((r.a, r.b) for r in got.collect()) == [(i, float(i)) for i in range(5)]

"""Readers for the driver-generated synthetic testdata (TESTDATA.md).

Parquet scans are the engine's default source: columnar, predicate
pushdown and column pruning reach the footer/row-group level for free
once queries are expressed declaratively.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meteo_etl_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: (applicationId, realpath, mtime_ns, size) -> reader DataFrame.
#: ``spark.read.parquet`` pays schema inference + relation resolution
#: (~30-60 ms of driver round trips) on EVERY call; the resulting
#: DataFrame is a lazy plan, so handing the same one back is
#: semantically identical — every action still scans the parquet
#: files. The stat-based key drops the memo entry the moment the
#: file/directory is rewritten (new mtime or size), preserving the
#: re-read-after-merge snapshot rule. No row data is ever memoized.
_READER_MEMO: dict[tuple[str, str, int, int], DataFrame] = {}


def _memo_key(
    spark: SparkSession, path: str
) -> tuple[str, str, int, int] | None:
    try:
        st = os.stat(path)
        return (
            spark.sparkContext.applicationId,
            os.path.realpath(path),
            st.st_mtime_ns,
            st.st_size,
        )
    except Exception:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}; expected one of {TESTDATA_TABLES}")
    key = _memo_key(spark, f"{sf_dir}/{name}.parquet")
    if key is not None and key in _READER_MEMO:
        return _READER_MEMO[key]
    df = _load_table_uncached(spark, sf_dir, name)
    if key is not None:
        _READER_MEMO[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The driver has shipped events.ts under two parquet encodings:
        #   * TIMESTAMP(NANOS) — the vectorized reader rejects it, so we
        #     read the raw int64 nanos and truncate to microseconds
        #     (exactly what DuckDB's TIMESTAMP does). Integer `div` —
        #     double division would lose precision above 2^53.
        #   * timestamp[us] with isAdjustedToUTC=false — Spark 4 infers
        #     TIMESTAMP_NTZ, which unix_millis/unix_micros reject. The
        #     session timezone is pinned UTC (session.py), so casting to
        #     TIMESTAMP is exact and matches the DuckDB oracle.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for the SQL surface)."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

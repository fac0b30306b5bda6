"""analyze_table / broadcast advisor: one-pass stats must be exact on
counts/widths, and the broadcast gate must fire on DECODED size."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from meteo_etl_spark.operators.stats import (
    TableStats,
    analyze_table,
    broadcast_if_safe,
    load_stats,
)


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    rows = [
        Row(k=i, name="x" * (10 if i % 2 == 0 else 30), v=float(i), tag=None if i < 5 else "t")
        for i in range(100)
    ]
    spark.createDataFrame(rows).write.parquet(path)
    return path


def test_analyze_counts_widths_nulls_ndv(spark, table):
    st = analyze_table(spark, table, ndv_columns=["k"])
    assert st.rows == 100
    assert st.columns["name"]["width"] == 20.0  # avg of 10/30
    assert st.columns["tag"]["nulls"] == 5
    assert st.columns["k"]["width"] == 8.0  # fixed long
    assert 90 <= st.columns["k"]["ndv"] <= 110  # HLL at 5% rsd
    # decoded estimate: 8 (k) + 20 (name) + 8 (v) + ~1 (tag avg len over non-null) per row
    assert st.decoded_bytes == pytest.approx(100 * (8 + 20 + 8 + 0.95), rel=0.01)
    assert st.file_bytes > 0
    # persisted and reloadable
    assert load_stats(table) == st


def test_broadcast_gate_uses_decoded_size(spark, table):
    st = analyze_table(spark, table)
    small = spark.read.parquet(table)
    fact = spark.range(1000).withColumnRenamed("id", "k")
    # decoded size is ~3.7 KB: safe under a 1 MB threshold -> hint applied
    j1 = fact.join(
        broadcast_if_safe(small, st, threshold_bytes=1 << 20), "k"
    )
    assert "BroadcastHashJoin" in j1._jdf.queryExecution().executedPlan().toString()
    # a threshold below the decoded size -> no hint from us
    capped = broadcast_if_safe(small, st, threshold_bytes=100)
    assert capped is small


def test_stats_on_atomic_table(spark, tmp_path):
    from meteo_etl_spark.operators.atomic import AtomicParquetTable

    path = str(tmp_path / "at")
    t = AtomicParquetTable(spark, path, partition_col="d")
    t.overwrite(
        spark.createDataFrame([Row(k=1, d="x"), Row(k=2, d="y")])
    )
    st = analyze_table(spark, path)
    assert st.rows == 2 and st.file_bytes > 0


def test_parse_bytes_units(spark, table):
    st = TableStats(rows=1, file_bytes=1, decoded_bytes=5 << 20, columns={})
    df = spark.read.parquet(table)
    # "10MB"-style session value paths through _parse_bytes
    assert broadcast_if_safe(df, st, threshold_bytes=None) is not None

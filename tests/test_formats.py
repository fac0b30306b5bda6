"""Format seam: exact round-trips per format on real tables, and the
loud rejections that keep the text formats honest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.sources.formats import (
    NATIVE_FORMATS,
    read_table_as,
    write_table_as,
)
from meteo_etl_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL


def _canon(df):
    cols = sorted(df.columns)
    return sorted((tuple(r) for r in df.select(*cols).collect()), key=repr)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_orders_roundtrip_exact(spark, tmp_path, fmt):
    """orders (dates, doubles, strings, longs) must survive every
    native format bit-for-bit, json/csv reading back under the pinned
    schema."""
    src = load_table(spark, SF_SMALL, "orders")
    path = str(tmp_path / fmt)
    write_table_as(src, path, fmt)
    back = read_table_as(spark, path, fmt, like=src)
    assert back.schema == src.schema
    assert _canon(back) == _canon(src)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json"])
def test_embeddings_array_roundtrip(spark, tmp_path, fmt):
    """array<float> survives the nested-capable formats exactly."""
    src = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / fmt)
    write_table_as(src, path, fmt)
    back = read_table_as(spark, path, fmt, like=src)
    assert back.schema == src.schema
    assert _canon(back) == _canon(src)


def test_csv_rejects_nested_columns_up_front(spark, tmp_path):
    src = load_table(spark, SF_SMALL, "embeddings")
    with pytest.raises(ValueError, match="nested/binary"):
        write_table_as(src, str(tmp_path / "x"), "csv")


def test_timestamps_and_nulls_roundtrip_in_text_formats(spark, tmp_path):
    """The lossy corners the option set exists for: sub-second
    timestamps, NULL vs empty string, quoted separators."""
    df = spark.createDataFrame(
        [
            (1, "2024-03-01 12:34:56.789123", "a,b\nc", None),
            (2, None, "", "x"),
        ],
        "id long, ts_s string, tricky string, maybe string",
    ).select("id", F.col("ts_s").cast("timestamp").alias("ts"), "tricky", "maybe")
    for fmt in ("json", "csv"):
        path = str(tmp_path / fmt)
        write_table_as(df, path, fmt)
        back = read_table_as(spark, path, fmt, like=df)
        assert _canon(back) == _canon(df), fmt


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """partition_by flows through to the shared directory layout, and
    a partition filter reaches the scan as PartitionFilters."""
    src = load_table(spark, SF_SMALL, "orders").withColumn(
        "stat", F.col("o_orderstatus")
    )
    path = str(tmp_path / "part")
    write_table_as(src, path, "orc", partition_by=["stat"])
    back = read_table_as(spark, path, "orc").where(F.col("stat") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "stat" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    exp = src.where(F.col("stat") == "F").count()
    assert back.count() == exp > 0


def test_schema_required_for_text_and_avro_is_gated(spark, tmp_path):
    src = load_table(spark, SF_SMALL, "region")
    write_table_as(src, str(tmp_path / "j"), "json")
    with pytest.raises(ValueError, match="no embedded schema"):
        read_table_as(spark, str(tmp_path / "j"), "json")
    with pytest.raises(ValueError, match="spark-avro"):
        write_table_as(src, str(tmp_path / "a"), "avro")
    with pytest.raises(ValueError, match="unknown format"):
        write_table_as(src, str(tmp_path / "x"), "feather")
    with pytest.raises(ValueError, match="not both"):
        read_table_as(
            spark, str(tmp_path / "j"), "json", schema=src.schema, like=src
        )
    assert set(NATIVE_FORMATS) == {"parquet", "orc", "json", "csv"}

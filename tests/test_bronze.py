"""Bronze lake + misc surfaces not covered elsewhere: batch payload
sink with date-partition pruning, schema'd payload scans, path
contract, is_finished predicate, SQL view registration, salted-join
kernel equivalence."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meteo_etl_spark.operators.skew import salted_join
from meteo_etl_spark.sources import bronze
from meteo_etl_spark.sources.testdata import register_views
from tests.conftest import SF_SMALL


def test_bronze_path_contract():
    now = datetime(2025, 3, 7, 4, 5, tzinfo=timezone.utc)
    p = bronze.bronze_path("/lake", "f-1", "meteo", now)
    assert p == "/lake/2025/03/07/meteo_f-1.json"  # zero-padded (T11)


def test_write_payloads_partition_pruning(spark, tmp_path):
    root = str(tmp_path / "bronze")
    schema = T.StructType(
        [
            T.StructField("v", T.LongType()),
            T.StructField("ingest_ts", T.TimestampType()),
        ]
    )
    rows = [
        (1, datetime(2025, 1, 1, 10)),
        (2, datetime(2025, 1, 2, 10)),
        (3, datetime(2025, 1, 2, 11)),
    ]
    bronze.write_payloads(spark.createDataFrame(rows, schema), root)

    df = spark.read.json(root)
    assert df.count() == 3
    one_day = df.filter((F.col("y") == 2025) & (F.col("m") == 1) & (F.col("d") == 2))
    assert one_day.count() == 2
    # the y/m/d filters must prune partitions, not scan-and-filter
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "isnotnull(d" in plan or "(d" in plan.split("PartitionFilters")[1][:200]


def test_read_payloads_declared_schema(spark, tmp_path, payload):
    path = bronze.save_payload(payload, "f-9", "meteo", str(tmp_path))
    from meteo_etl_spark.schemas import METEO_PAYLOAD_SCHEMA

    df = bronze.read_payloads(spark, path, METEO_PAYLOAD_SCHEMA)
    row = df.collect()[0]
    assert row.latitude == payload["latitude"]
    assert len(row.hourly.time) == len(payload["hourly"]["time"])


def test_is_finished_predicate(spark):
    from meteo_etl_spark.pipeline.control import is_finished

    df = spark.createDataFrame(
        [("a", "pending"), ("b", "error"), ("c", "success")], ["id", "status"]
    )
    got = {r.id: r.is_finished for r in is_finished(df).collect()}
    assert got == {"a": False, "b": True, "c": True}


def test_register_views_sql_surface(spark):
    register_views(spark, SF_SMALL)
    n = spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0].n
    assert n > 0
    joined = spark.sql(
        "SELECT COUNT(*) AS n FROM customer c JOIN nation nt ON c.c_nationkey = nt.n_nationkey"
    ).collect()[0].n
    assert joined > 0


def test_salted_join_equals_plain_join(spark):
    ev = spark.createDataFrame(
        [(i, f"k{i % 3}", float(i)) for i in range(100)], ["id", "k", "v"]
    )
    dim = spark.createDataFrame([(f"k{j}", j * 10) for j in range(3)], ["k", "w"])
    plain = sorted(
        (r.id, r.w) for r in ev.join(dim, "k").select("id", "w").collect()
    )
    salted = sorted(
        (r.id, r.w)
        for r in salted_join(ev, dim, "k", salt_src=F.col("id"))
        .select("id", "w")
        .collect()
    )
    assert plain == salted


def test_salted_join_rejects_dim_preserving_modes(spark):
    ev = spark.createDataFrame([(1, "k0", 1.0)], ["id", "k", "v"])
    dim = spark.createDataFrame([("k0", 0)], ["k", "w"])
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="dim-preserving"):
            salted_join(ev, dim, "k", salt_src=F.col("id"), how=how)
    # fact-preserving modes stay legal
    assert salted_join(ev, dim, "k", salt_src=F.col("id"), how="left").count() == 1

"""U1 merge semantics (reference `etl/load.py:35-57`): last-write-wins
on the natural key; id/created_at preserved; updated_at refreshed;
batch-internal dups collapse; partition-pruned rewrites."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from meteo_etl_spark.operators.normalize import normalize_meteo
from meteo_etl_spark.pipeline.warehouse import (
    OBS_PARTITION_COL,
    merge_observations,
    read_observations,
)
from meteo_etl_spark.schemas import METEO_PAYLOAD_SCHEMA, OBSERVATIONS_SCHEMA
from tests.conftest import N_HOURS, golden_payload


def _records(spark, **kw):
    df = spark.createDataFrame([golden_payload(**kw)], schema=METEO_PAYLOAD_SCHEMA)
    return normalize_meteo(df)


def test_initial_merge_inserts_all(spark, warehouse):
    stats = merge_observations(spark, warehouse, _records(spark), fetch_id="f1")
    assert (stats.inserted, stats.updated, stats.target_rows) == (N_HOURS, 0, N_HOURS)

    obs = read_observations(spark, warehouse)
    assert [f.name for f in obs.schema.fields] == [f.name for f in OBSERVATIONS_SCHEMA.fields]
    # P1: dropped-at-load columns are not persisted; timezone rides as NULL.
    assert "soil_temperature" not in obs.columns
    assert obs.filter(F.col("timezone").isNotNull()).count() == 0
    assert obs.filter(F.col("fetch_id") == "f1").count() == N_HOURS
    assert obs.select("id").distinct().count() == N_HOURS


def test_upsert_preserves_id_created_at_refreshes_measures(spark, warehouse):
    merge_observations(spark, warehouse, _records(spark), fetch_id="f1")
    before = {
        r["timestamp"]: r
        for r in read_observations(spark, warehouse).collect()
    }

    # Same locations/timestamps, different measures → pure update.
    shifted = _records(spark).withColumn("temperature", F.col("temperature") + 100.0)
    stats = merge_observations(spark, warehouse, shifted, fetch_id="f2")
    assert (stats.inserted, stats.updated, stats.target_rows) == (0, N_HOURS, N_HOURS)

    after = {r["timestamp"]: r for r in read_observations(spark, warehouse).collect()}
    assert set(after) == set(before)
    sample = next(iter(after))
    assert after[sample]["id"] == before[sample]["id"]
    assert after[sample]["created_at"] == before[sample]["created_at"]
    assert after[sample]["fetch_id"] == "f2"
    assert after[sample]["updated_at"] >= before[sample]["updated_at"]
    t_after, t_before = after[sample]["temperature"], before[sample]["temperature"]
    if t_before is not None:
        assert t_after == t_before + 100.0


def test_disjoint_keys_insert(spark, warehouse):
    merge_observations(spark, warehouse, _records(spark), fetch_id="f1")
    other = _records(spark, lat=48.1, lon=11.6)
    stats = merge_observations(spark, warehouse, other, fetch_id="f2")
    assert (stats.inserted, stats.updated, stats.target_rows) == (N_HOURS, 0, 2 * N_HOURS)


def test_batch_internal_dups_collapse(spark, warehouse):
    recs = _records(spark)
    doubled = recs.union(recs.withColumn("temperature", F.col("temperature") + 1.0))
    stats = merge_observations(spark, warehouse, doubled, fetch_id="f1")
    assert stats.target_rows == N_HOURS


def test_partition_layout_and_pruned_rewrite(spark, warehouse):
    merge_observations(spark, warehouse, _records(spark), fetch_id="f1")
    parts = sorted(
        p for p in os.listdir(warehouse.observations_path) if p.startswith(OBS_PARTITION_COL)
    )
    # 7-day payload → 7 daily partitions.
    assert len(parts) == 7

    # Touch only day 1; other partitions' files must be untouched.
    day1 = _records(spark).filter(F.to_date("timestamp") == "2025-12-01")
    mtimes_before = {
        p: os.path.getmtime(os.path.join(warehouse.observations_path, p)) for p in parts
    }
    merge_observations(spark, warehouse, day1.withColumn("temperature", F.lit(0.0)), "f2")
    obs = read_observations(spark, warehouse)
    assert obs.count() == N_HOURS
    assert obs.filter(F.col("fetch_id") == "f2").count() == 24
    untouched = [p for p in parts if p != f"{OBS_PARTITION_COL}=2025-12-01"]
    for p in untouched:
        assert os.path.getmtime(os.path.join(warehouse.observations_path, p)) == mtimes_before[p]


def test_merge_null_first_key_is_matched_not_dropped(spark, tmp_path):
    """eqNullSafe join implies NULL merge keys are legal: a row whose
    FIRST key column is NULL must still update on match (presence is
    tracked by constant markers, not isNotNull on the key)."""
    from meteo_etl_spark.operators.upsert import merge_parquet

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(None, "a", 1.0), (2, "b", 2.0)], "k int, sub string, v double"
    )
    merge_parquet(spark, path, base, ["k", "sub"])
    upd = spark.createDataFrame(
        [(None, "a", 10.0), (3, "c", 3.0)], "k int, sub string, v double"
    )
    stats = merge_parquet(spark, path, upd, ["k", "sub"])
    assert (stats.updated, stats.inserted) == (1, 1)
    rows = {
        (r.k, r.sub): r.v for r in spark.read.parquet(path).collect()
    }
    assert rows == {(None, "a"): 10.0, (2, "b"): 2.0, (3, "c"): 3.0}

"""Incremental rollup maintenance: partial recompute must equal the
full recompute, and must not touch unchanged state partitions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.operators.incremental import (
    incremental_rollup,
    read_rollup,
    RollupStats,
)


def _write_fact(spark, path, rows):
    df = spark.createDataFrame(rows, "d string, k string, v int")
    df.repartition(1).write.mode("overwrite").partitionBy("d").parquet(path)


def _build(df):
    return df.groupBy("d", "k").agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")
    )


def _snapshot(spark, state):
    return {
        (r["d"], r["k"]): (r["total"], r["n"])
        for r in read_rollup(spark, state).collect()
    }


def _state_files(state):
    out = {}
    data = os.path.join(state, "data")
    for root, _d, files in os.walk(data):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = os.stat(p).st_mtime_ns
    return out


def test_first_refresh_builds_everything_and_matches_full(spark, tmp_path):
    fact, state = str(tmp_path / "fact"), str(tmp_path / "state")
    _write_fact(
        spark,
        fact,
        [("d1", "a", 1), ("d1", "a", 2), ("d1", "b", 5), ("d2", "a", 7)],
    )
    stats = incremental_rollup(spark, fact, state, "d", _build)
    assert stats == RollupStats(recomputed=2, removed=0, unchanged=0)
    want = {
        (r["d"], r["k"]): (r["total"], r["n"])
        for r in _build(spark.read.parquet(fact)).collect()
    }
    assert _snapshot(spark, state) == want


def test_noop_refresh_recomputes_nothing_and_rewrites_nothing(spark, tmp_path):
    fact, state = str(tmp_path / "fact"), str(tmp_path / "state")
    _write_fact(spark, fact, [("d1", "a", 1), ("d2", "b", 2)])
    incremental_rollup(spark, fact, state, "d", _build)
    before = _state_files(state)
    stats = incremental_rollup(spark, fact, state, "d", _build)
    assert stats == RollupStats(recomputed=0, removed=0, unchanged=2)
    assert _state_files(state) == before  # byte-level: nothing rewritten


def test_appending_one_partition_recomputes_only_it(spark, tmp_path):
    fact, state = str(tmp_path / "fact"), str(tmp_path / "state")
    _write_fact(spark, fact, [("d1", "a", 1), ("d2", "a", 10)])
    incremental_rollup(spark, fact, state, "d", _build)
    before = _state_files(state)
    # append a file into d2 only (new file, d1 untouched)
    extra = spark.createDataFrame([("d2", "a", 5), ("d2", "b", 3)], "d string, k string, v int")
    extra.repartition(1).write.mode("append").partitionBy("d").parquet(fact)
    stats = incremental_rollup(spark, fact, state, "d", _build)
    assert stats == RollupStats(recomputed=1, removed=0, unchanged=1)
    got = _snapshot(spark, state)
    assert got[("d2", "a")] == (15, 2) and got[("d2", "b")] == (3, 1)
    assert got[("d1", "a")] == (1, 1)
    after = _state_files(state)
    untouched_d1 = {p: t for p, t in before.items() if "d=d1" in p}
    assert untouched_d1.items() <= after.items()  # d1 files byte-stable
    # full-recompute equivalence after the incremental step
    want = {
        (r["d"], r["k"]): (r["total"], r["n"])
        for r in _build(spark.read.parquet(fact)).collect()
    }
    assert got == want


def test_removed_fact_partition_leaves_the_rollup(spark, tmp_path):
    import shutil

    fact, state = str(tmp_path / "fact"), str(tmp_path / "state")
    _write_fact(spark, fact, [("d1", "a", 1), ("d2", "a", 2)])
    incremental_rollup(spark, fact, state, "d", _build)
    shutil.rmtree(os.path.join(fact, "d=d1"))
    stats = incremental_rollup(spark, fact, state, "d", _build)
    assert stats == RollupStats(recomputed=0, removed=1, unchanged=1)
    assert set(_snapshot(spark, state)) == {("d2", "a")}


def test_build_must_keep_partition_col(spark, tmp_path):
    fact, state = str(tmp_path / "fact"), str(tmp_path / "state")
    _write_fact(spark, fact, [("d1", "a", 1)])
    bad = lambda df: df.groupBy("k").agg(F.sum("v").alias("total"))  # noqa: E731
    with pytest.raises(ValueError, match="must group by"):
        incremental_rollup(spark, fact, state, "d", bad)


def test_unpartitioned_fact_rejected(spark, tmp_path):
    fact, state = str(tmp_path / "fact"), str(tmp_path / "state")
    spark.createDataFrame([("a", 1)], "k string, v int").write.parquet(fact)
    with pytest.raises(ValueError, match="hive-partitioned"):
        incremental_rollup(spark, fact, state, "d", _build)


def test_changed_partition_emptied_in_place_drops_stale_rollup(spark, tmp_path):
    """Regression (ADVICE r7): dynamic partition overwrite only rewrites
    partitions PRESENT in build() output, so a changed fact partition
    whose rebuild yields zero rows (directory remains, data emptied)
    used to leave the stale rollup partition behind."""
    fact, state = str(tmp_path / "fact"), str(tmp_path / "state")
    _write_fact(spark, fact, [("d1", "a", 1), ("d1", "b", 2), ("d2", "a", 7)])
    incremental_rollup(spark, fact, state, "d", _build)
    assert set(_snapshot(spark, state)) == {("d1", "a"), ("d1", "b"), ("d2", "a")}
    # empty d1 IN PLACE: the partition directory survives but now holds
    # only a zero-row parquet file (a filter-rewrite, not a drop)
    empty = spark.createDataFrame([], "k string, v int")
    empty.repartition(1).write.mode("overwrite").parquet(
        os.path.join(fact, "d=d1")
    )
    stats = incremental_rollup(spark, fact, state, "d", _build)
    assert stats.recomputed == 1 and stats.removed == 0
    assert set(_snapshot(spark, state)) == {("d2", "a")}
    # idempotent: a third refresh touches nothing
    again = incremental_rollup(spark, fact, state, "d", _build)
    assert again == RollupStats(recomputed=0, removed=0, unchanged=2)

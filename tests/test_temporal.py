"""Temporal join operators: as-of (backward, inclusive) and band join.

Semantics pinned here; engine-vs-engine agreement is covered by
test_queries.py (events_asof_join runs against DuckDB's native ASOF
JOIN, events_range_join against DuckDB's native range join — two
independent implementations of the same spec).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from meteo_etl_spark.operators.temporal import asof_join, band_join
from meteo_etl_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_asof_backward_inclusive_tie(spark):
    """A right row at EXACTLY the left timestamp matches (<=, the
    DuckDB/pandas convention), and the latest prior row wins."""
    left = _mk(
        spark,
        [(1, _ts("2024-01-01T10:00:00"), "a")],
        ["k", "ts", "payload"],
    )
    right = _mk(
        spark,
        [
            (1, _ts("2024-01-01T09:00:00"), 1.0),
            (1, _ts("2024-01-01T10:00:00"), 2.0),  # tie — must win
            (1, _ts("2024-01-01T11:00:00"), 3.0),  # future — excluded
        ],
        ["k", "ts", "v"],
    )
    got = asof_join(left, right, ["k"], right_cols=["v"]).collect()
    assert len(got) == 1
    assert got[0].v_right == 2.0
    assert got[0].ts_right == _ts("2024-01-01T10:00:00")


def test_asof_inner_drops_unmatched_left_keeps_with_how_left(spark):
    left = _mk(
        spark,
        [(1, _ts("2024-01-01T08:00:00"), "early"), (1, _ts("2024-01-01T12:00:00"), "late")],
        ["k", "ts", "payload"],
    )
    right = _mk(spark, [(1, _ts("2024-01-01T09:00:00"), 1.0)], ["k", "ts", "v"])

    inner = asof_join(left, right, ["k"], right_cols=["v"]).collect()
    assert [r.payload for r in inner] == ["late"]

    outer = asof_join(left, right, ["k"], right_cols=["v"], how="left")
    rows = {r.payload: r.v_right for r in outer.collect()}
    assert rows == {"early": None, "late": 1.0}


def test_asof_respects_key_groups(spark):
    """A right row from another key group must never match."""
    left = _mk(spark, [(1, _ts("2024-01-01T10:00:00"), "x")], ["k", "ts", "payload"])
    right = _mk(spark, [(2, _ts("2024-01-01T09:00:00"), 9.0)], ["k", "ts", "v"])
    assert asof_join(left, right, ["k"], right_cols=["v"]).count() == 0


def test_asof_matches_naive_subquery(spark):
    """Window implementation == per-row argmax over the naive range
    join, on real data (purchases vs clicks at sf0.001)."""
    ev = load_table(spark, SF, "events")
    left = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), "value"
    )
    naive = (
        left.join(right, ["user_id"])
        .filter(F.col("cts") <= F.col("ts"))
        .groupBy("user_id", "event_id", "ts")
        .agg(F.max("cts").alias("ts_right"))
    )
    got = asof_join(
        left, right.select("user_id", F.col("cts").alias("ts"), "value"),
        ["user_id"], right_cols=["value"],
    ).select("user_id", "event_id", "ts", "ts_right")
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0
    assert got.count() > 0


def test_band_join_matches_naive_range_join(spark):
    """Bin equi-join + exact filter == the naive range predicate, on
    real data, including the band edges (inclusive tolerance)."""
    ev = load_table(spark, SF, "events").select("event_id", "ts", "event_type")
    tol = 300
    naive = (
        ev.alias("a")
        .join(ev.alias("b"), "event_type")
        .filter(
            (F.abs(F.unix_micros("a.ts") - F.unix_micros("b.ts")) <= tol * 1_000_000)
            & (F.col("a.event_id") != F.col("b.event_id"))
        )
        .select(
            F.col("a.event_id").alias("l_event_id"),
            F.col("b.event_id").alias("r_event_id"),
        )
    )
    got = (
        band_join(ev, ev, ["event_type"], tolerance_sec=tol)
        .filter(F.col("l_event_id") != F.col("r_event_id"))
        .select("l_event_id", "r_event_id")
    )
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0
    assert got.count() > 0


def test_band_join_no_duplicate_pairs(spark):
    """Each qualifying pair appears exactly once (the 3-bin replication
    can never double-match a pair)."""
    ev = load_table(spark, SF, "events").select("event_id", "ts", "event_type")
    pairs = band_join(ev, ev, ["event_type"], tolerance_sec=60).select(
        "l_event_id", "r_event_id"
    )
    assert pairs.count() == pairs.distinct().count()

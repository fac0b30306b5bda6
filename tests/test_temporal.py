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


def test_resample_linear_handbuilt_series(spark):
    """3 observed hourly bins with a 2-bin gap: interior bins are the
    exact linear blend; observed bins pass through; no extrapolation
    beyond the observed span."""
    from meteo_etl_spark.operators.temporal import resample_linear

    rows = [
        # h=473352 (2024-01-01 00:xx): two events avg (10.00+11.00)/2
        (1, "2024-01-01 00:10:00", 10.0),
        (1, "2024-01-01 00:50:00", 11.0),
        # gap at 01:00 and 02:00
        (1, "2024-01-01 03:00:30", 4.5),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    out = resample_linear(df, "user_id", "ts", "value").orderBy("h").collect()
    assert len(out) == 4  # span is 4 bins; nothing outside it
    vals = [(r.value, r.is_gap) for r in out]
    # 10.5 -> (gap) 8.5 -> (gap) 6.5 -> 4.5 : exact thirds of the 6.0 drop
    assert vals == [(10.5, False), (8.5, True), (6.5, True), (4.5, False)]


def test_resample_linear_single_bin_group_has_no_gaps(spark):
    from meteo_etl_spark.operators.temporal import resample_linear

    df = spark.createDataFrame(
        [(7, "2024-02-01 10:30:00", 3.25)], "user_id long, ts string, value double"
    )
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    out = resample_linear(df, "user_id", "ts", "value").collect()
    assert len(out) == 1 and out[0].value == 3.25 and not out[0].is_gap

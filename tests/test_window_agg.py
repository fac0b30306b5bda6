"""events_window_agg frame semantics the oracle can't pin alone:
RANGE boundary inclusivity at exactly the window width, and the
running-sum invariants."""

from __future__ import annotations

import datetime as dt

from meteo_etl_spark.plans import queries as Q


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).write.parquet(f"{path}/events.parquet")


def test_range_frame_boundary_inclusive_at_exact_width(spark, tmp_path):
    """The trailing 1-hour frame is CLOSED on both ends: an event
    exactly 3600s older is inside; one microsecond older falls out."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 7, "a", 1.0, "{}"),
        # exactly 1h after e1: e1 is on the frame edge -> included
        (2, t0 + dt.timedelta(seconds=3600), 7, "a", 1.0, "{}"),
        # 1h + 1us after e1: e1 is just outside; e2 still inside
        (3, t0 + dt.timedelta(seconds=3600, microseconds=1), 7, "a", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        r.event_id: r
        for r in Q.get("events_window_agg").fn(spark, str(tmp_path)).collect()
    }
    assert out[1].hr_n == 1
    assert out[2].hr_n == 2  # e1 at exactly -3600s is included
    assert out[3].hr_n == 2  # e1 dropped, e2 (1us apart) retained
    # running sum is cumulative in (ts, event_id) order: qv=100 each
    assert [out[i].run_sum for i in (1, 2, 3)] == [100, 200, 300]


def test_running_sum_ends_at_user_total(spark, tmp_path):
    """Per user, the max running sum equals the user's total."""
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1 + (i % 2), "x", 2.5, "{}")
        for i in range(8)
    ]
    _write_events(spark, tmp_path, rows)
    df = Q.get("events_window_agg").fn(spark, str(tmp_path))
    rows_out = df.collect()
    per_user: dict[int, list] = {}
    for r in rows_out:
        per_user.setdefault(r.user_id, []).append(r)
    for uid, rs in per_user.items():
        assert max(x.run_sum for x in rs) == 250 * len(rs)

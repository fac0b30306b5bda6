"""applyInPandasWithState sessionizer: closed sessions emitted by the
stream must equal the batch sessionizer's non-final sessions (the final
per-user session stays open in state until the idle timeout)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import types as T

from meteo_etl_spark.streaming.stateful import SESSION_GAP_MS, sessionize_stream

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


@pytest.fixture()
def event_rows():
    base = datetime(2025, 6, 1, 0, 0, 0)
    gap = timedelta(milliseconds=SESSION_GAP_MS)
    rows = []
    # user 1: two sessions (3 events, big gap, 2 events) — first closes
    for d in (0, 1, 2):
        rows.append((1, base + timedelta(hours=d)))
    for d in (0, 1):
        rows.append((1, base + timedelta(hours=2) + gap + timedelta(hours=d + 1)))
    # user 2: one session — never closes in-stream
    rows.append((2, base))
    rows.append((2, base + timedelta(hours=5)))
    # user 3: three sessions — first two close
    for k in range(3):
        rows.append((3, base + k * (gap + timedelta(hours=1))))
    return rows


def test_stream_sessions_match_batch(spark, tmp_path, event_rows):
    src = str(tmp_path / "events")
    spark.createDataFrame(event_rows, EVENT_SCHEMA).write.json(src)

    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    q = (
        sessionize_stream(stream, idle_flush=False)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }

    # expected: user 1 first session (3 events over 2h), user 3 first two
    # (1 event each); final sessions stay open (not emitted).
    base = datetime(2025, 6, 1, 0, 0, 0)
    gap = timedelta(milliseconds=SESSION_GAP_MS)
    expected = {
        (1, base, base + timedelta(hours=2), 3),
        (3, base, base, 1),
        (3, base + gap + timedelta(hours=1), base + gap + timedelta(hours=1), 1),
    }
    assert got == expected

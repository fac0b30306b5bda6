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


# ---------------------------------------------------------------------------
# transformWithStateInPandas: sequence-gap detector
# ---------------------------------------------------------------------------

GAP_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
    ]
)

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class _FakeValueState:
    """In-memory ValueState twin (exists/get/update) for driving the
    processor logic without the streaming runtime."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state


def _drive(proc, user_id, ids):
    import pandas as pd

    out = list(
        proc.handleInputRows(
            (user_id,), iter([pd.DataFrame({"event_id": ids})]), None
        )
    )
    return [
        (int(r.user_id), int(r.gap_start), int(r.gap_end))
        for df in out
        for r in df.itertuples()
    ]


def test_sequence_gap_processor_logic_across_batches():
    """The ValueState carries the running max across calls: gaps are
    reported exactly once each — including one spanning the batch
    boundary — and redeliveries (ids <= max) never re-report."""
    from meteo_etl_spark.streaming.stateful import SequenceGapProcessor

    proc = SequenceGapProcessor()
    proc.init(_FakeHandle())
    # batch 1: 0,1,2,5 -> gap 3-4
    assert _drive(proc, 1, [0, 1, 2, 5]) == [(1, 3, 4)]
    # batch 2: 9,10 plus a redelivered 5 -> cross-batch gap 6-8 only
    assert _drive(proc, 1, [9, 10, 5]) == [(1, 6, 8)]
    # batch 3: pure redelivery -> nothing
    assert _drive(proc, 1, [9, 10]) == []
    # state carries forward: next id is contiguous -> nothing
    assert _drive(proc, 1, [11]) == []
    assert proc._max.get() == (11,)
    # a fresh key initializes without reporting a leading gap
    proc2 = SequenceGapProcessor()
    proc2.init(_FakeHandle())
    assert _drive(proc2, 2, [100, 103]) == [(2, 101, 102)]


def _have_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not _have_protobuf(),
    reason="transformWithStateInPandas's Python state-server protocol "
    "requires google.protobuf, which is not installed in this image "
    "(same environment-bound class as the real-Kafka e2e tests); the "
    "processor logic is covered by the fake-state unit test above and "
    "this e2e self-activates wherever protobuf exists",
)
def test_sequence_gaps_across_micro_batches(spark, tmp_path):
    """Gaps must be found exactly once each, INCLUDING gaps that span
    micro-batch boundaries (the running max lives in ValueState), and
    redelivered ids must never re-report. maxFilesPerTrigger=1 forces
    one micro-batch per wave file."""
    from meteo_etl_spark.streaming.stateful import sequence_gaps_stream

    src = tmp_path / "events"
    src.mkdir()
    # wave 1: user 1 ids 0,1,2,5 (gap 3-4); user 3 id 7
    spark.createDataFrame(
        [(1, 0), (1, 1), (1, 2), (1, 5), (3, 7)], GAP_EVENT_SCHEMA
    ).coalesce(1).write.json(str(src / "w1"))
    # wave 2: user 1 ids 9,10 (gap 6-8 SPANS the batch boundary) plus
    # a redelivery of id 5; user 2 first appears: 100,103 (gap 101-102)
    spark.createDataFrame(
        [(1, 9), (1, 10), (1, 5), (2, 100), (2, 103)], GAP_EVENT_SCHEMA
    ).coalesce(1).write.json(str(src / "w2"))
    # wave 3: pure redelivery of wave 2 — must emit NOTHING new
    spark.createDataFrame(
        [(1, 9), (1, 10), (2, 103)], GAP_EVENT_SCHEMA
    ).coalesce(1).write.json(str(src / "w3"))

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
    try:
        stream = (
            spark.readStream.schema(GAP_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src / "w*"))
        )
        q = (
            sequence_gaps_stream(stream)
            .writeStream.format("memory")
            .queryName("gaps_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.user_id, r.gap_start, r.gap_end)
            for r in spark.sql("SELECT * FROM gaps_out").collect()
        }
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
    assert got == {(1, 3, 4), (1, 6, 8), (2, 101, 102)}
    # exactly once: no duplicated rows either
    n = spark.sql("SELECT COUNT(*) AS n FROM gaps_out").collect()[0]["n"]
    assert n == 3

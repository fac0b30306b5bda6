"""Custom stateful streaming: gap-based sessionization with
``applyInPandasWithState`` (the operator Spark's built-ins can't
express — session windows with per-key custom state and timeout
emission).

Batch form: ``plans/llm_queries.events_sessionize`` (lag + running
sum — oracle-checked). This module is the streaming twin: per-user
state holds the open session (start, last_ts, n); an event extends it
when within ``gap_ms``, else the closed session is emitted and a new
one opens. ``GroupStateTimeout.ProcessingTimeTimeout`` flushes idle
sessions so state stays bounded (the 100 TB requirement: state size is
O(active users), not O(events)).

This is the engine's reference implementation of the prompt-level
extension point: (a) built-in ops where possible, (b) Arrow-batched
``applyInPandas*`` where semantics genuinely need custom state — the
Python here touches only per-user event batches, never row-at-a-time
across the stream.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:
    import pandas as pd

SESSION_GAP_MS = 86_400_000  # mirror of llm_queries.SESSION_GAP_MS

#: emitted closed sessions.
SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n", LongType()),
    ]
)

#: per-user open-session state: (start_us, end_us, n).
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    (user_id,) = key
    gap_us = SESSION_GAP_MS * 1000

    if state.hasTimedOut:
        # Idle user: flush the open session and drop the state.
        if state.exists:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n": [n],
                }
            )
        return

    ts_us = []
    for batch in batches:
        ts_us.extend(batch["ts"].astype("int64") // 1000)  # ns -> us
    ts_us.sort()

    cur = list(state.get) if state.exists else None
    closed: list[tuple[int, int, int]] = []
    for t in ts_us:
        if cur is None:
            cur = [t, t, 0]
        elif t - cur[1] > gap_us:
            closed.append(tuple(cur))
            cur = [t, t, 0]
        cur[1] = max(cur[1], t)
        cur[2] += 1

    if cur is not None:
        state.update(tuple(cur))
        try:
            state.setTimeoutDuration(60_000)  # flush after 60s idle
        except Exception:
            pass  # NoTimeout conf (deterministic availableNow drains)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _e, _n in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _s, e, _n in closed],
                "n": [n for _s, _e, n in closed],
            }
        )


def sessionize_stream(events: DataFrame, *, idle_flush: bool = True) -> DataFrame:
    """events(user_id, ts, ...) stream → closed-session rows.

    Output sessions appear when a later event closes them by gap; with
    ``idle_flush`` (production default) the processing-time timeout
    also flushes users idle for 60s, bounding state. Tests that drain
    with availableNow set ``idle_flush=False`` so emission is a pure
    function of the data (timeout firing is wall-clock dependent).
    Grouping shuffles once on user_id; state lives in the state store
    per partition.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_flush
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.x): per-key sequence-gap
# detection — the at-least-once pipeline's loss auditor. The operator
# needs a running per-key maximum that survives micro-batches AND
# append-mode emission of gap rows the moment a jump is observed;
# built-ins can't express it (a streaming window over event_id would
# buffer unboundedly), and the newer transformWithState API is the
# right home: typed ValueState, explicit TimeMode, RocksDB-backed
# state store. State is ONE long per key — bounded by key cardinality,
# never by stream length (the 100 TB requirement).
#
# Environment note: transformWithState's Python worker speaks a
# protobuf protocol to the JVM state server; this image has no
# google.protobuf, so the streaming e2e self-gates (tests/
# test_stateful.py skip reason) exactly like the real-Kafka tests.
# The processor logic itself is pure and unit-tested with a fake
# ValueState.
# ---------------------------------------------------------------------------

GAP_SCHEMA = "user_id long, gap_start long, gap_end long"


class SequenceGapProcessor(StatefulProcessor):
    """StatefulProcessor: per key, track the max sequence id ever seen
    and emit (gap_start, gap_end) for every jump — exactly once per
    gap, across micro-batch boundaries. Ids at or below the running
    max are at-least-once redeliveries and are ignored (never
    re-reported)."""

    def init(self, handle) -> None:
        self._max = handle.getValueState("max_id", "max_id long")

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        (user_id,) = key
        ids = sorted({int(x) for batch in rows for x in batch["event_id"]})
        prev = self._max.get()[0] if self._max.exists() else None
        gaps: list[tuple[int, int]] = []
        for i in ids:
            if prev is None:
                prev = i
                continue
            if i <= prev:  # redelivery
                continue
            if i > prev + 1:
                gaps.append((prev + 1, i - 1))
            prev = i
        if prev is not None:
            self._max.update((prev,))
        if gaps:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(gaps),
                    "gap_start": [s for s, _ in gaps],
                    "gap_end": [e for _, e in gaps],
                }
            )

    def handleExpiredTimer(self, key, timer_values, expired_timer_info):
        return iter(())

    def close(self) -> None:
        pass


def sequence_gaps_stream(
    events: DataFrame, *, key_col: str = "user_id", id_col: str = "event_id"
) -> DataFrame:
    """events stream → one row per detected sequence gap per key.

    Requires the RocksDB state store provider (transformWithState's
    contract): set ``spark.sql.streaming.stateStore.providerClass`` to
    ``...state.RocksDBStateStoreProvider`` on the session. Grouping
    shuffles once on the key; per-key state is a single long."""
    from pyspark.sql import functions as F

    proc = SequenceGapProcessor()
    return (
        events.select(
            F.col(key_col).cast("long").alias("user_id"),
            F.col(id_col).cast("long").alias("event_id"),
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=GAP_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )

"""Event-time windowed aggregation with watermarks (stretch surface).

The reference has NO windows/watermarks — late data is absorbed by the
idempotent keyed upsert (SURVEY.md §2.1 "absent streaming machinery").
This module adds the windowed layer a scaled deployment wants on top:
tumbling event-time rollups of the observation stream with bounded
state (the watermark ages out window state; without it, state grows
unboundedly at 100 TB ingest).

Semantics: aggregates are keyed on (event-time window, location);
events later than ``watermark_delay`` behind the stream's max event
time are dropped from the windowed rollup — while the silver MERGE
path still absorbs them row-wise, so the base table stays complete and
only the incremental rollup is bounded-late. That split (exact base
table + watermark-bounded rollup) is the standard lambda-free design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    *,
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup on a key: keep the first arrival of each
    key, drop re-deliveries that arrive within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state: a key is
    remembered only until the watermark passes its event time — the
    streaming twin of functions/dedup.exact_dedup, and the generic
    guard in front of any at-least-once source whose sink is NOT
    idempotent (when the sink is a keyed MERGE, as in consume.py, the
    merge itself absorbs duplicates and this operator is unnecessary).
    On a batch DataFrame it degrades to plain dropDuplicates.
    """
    if not events.isStreaming:
        return events.dropDuplicates(key_cols)
    return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def windowed_observation_stats(
    observations: DataFrame,
    *,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Tumbling per-location weather rollup over an observation stream
    (works identically on a batch DataFrame — Structured Streaming's
    unified semantics; the watermark only has effect on streams).

    Output: (window_start, window_end, latitude, longitude, n,
    avg_temperature, max_wind_speed, sum_precipitation).
    """
    df = observations
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(
            F.window(ts_col, window_duration).alias("w"),
            "latitude",
            "longitude",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("temperature"), 2).alias("avg_temperature"),
            F.max("wind_speed").alias("max_wind_speed"),
            F.round(F.sum("precipitation"), 2).alias("sum_precipitation"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "latitude",
            "longitude",
            "n",
            "avg_temperature",
            "max_wind_speed",
            "sum_precipitation",
        )
    )


def session_rollup(
    events: DataFrame,
    key_col: str = "user_id",
    *,
    ts_col: str = "ts",
    gap: str = "1 day",
    watermark_delay: str = "1 day",
) -> DataFrame:
    """Gap-based sessionization via the JVM-native ``session_window`` —
    the built-in, whole-stage-codegen path for the same semantics the
    engine also offers as a batch window query
    (plans/llm_queries.events_sessionize) and as a custom stateful
    operator (streaming/stateful.py, applyInPandasWithState).

    Prefer THIS form wherever its semantics fit: the session merge runs
    inside the JVM with bounded per-key state, no Python boundary, and
    identical code for batch and streaming frames (unified semantics;
    on streams the watermark both bounds state and closes sessions).

    Boundary: ``session_window`` merges an event into the running
    session when it lands **at or before** the current close
    (``last_ts + gap`` inclusive), i.e. a new session starts only when
    the inter-event gap strictly exceeds ``gap`` — the same split rule
    as the lag-based batch query (events_sessionize), verified in
    tests/test_session_window.py.

    Output: (key, session_start, session_end, n) where session_end is
    the last event's time + gap (the window close), matching Spark's
    session_window contract.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "first_ts",
            "last_ts",
            "n",
        )
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    *,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of ``events``
    joins the STATIC ``dim`` (broadcast — re-read per trigger if its
    source supports it, so slowly-changing dims refresh without a
    restart).

    The classic Kafka-consumer enrichment shape: stream-static joins
    are stateless (no watermark, no join state store) because the
    static side is fully available every trigger — the scale contract
    is only that ``dim`` stays broadcast-small. For stream-stream
    joins Spark requires watermarks on both sides; that is a different
    operator with real join state — ``interval_join_streams`` below.
    ``how`` must be stream-preserving (inner/left —
    right/full would need the unmatched static side emitted, which a
    stream cannot do)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"enrich_stream: how={how!r} is not stream-preserving (inner/left only)"
        )
    return events.join(F.broadcast(dim), on=on, how=how)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    ts_col: str = "ts",
    tolerance: str = "5 minutes",
    watermark_delay: str = "1 hour",
    how: str = "inner",
    right_suffix: str = "_r",
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join: rows of ``left`` and
    ``right`` with equal ``on`` keys whose event times lie within
    ``±tolerance`` of each other — the stateful join enrich_stream's
    docstring points to (correlating two live feeds: clicks×impressions,
    sensor×sensor, order×payment).

    Every ``right`` column is suffixed ``right_suffix`` (keys
    included), so both sides' payloads survive unambiguously; join keys
    and the time band are equated explicitly in the condition.

    State contract — the part that matters at 100 TB ingest: BOTH
    sides carry a watermark and the join condition bounds event-time
    distance, so Spark evicts join state older than
    ``watermark_delay + tolerance`` instead of buffering both streams
    forever; an unbounded stream-stream join is refused by the planner.
    Physically each micro-batch shuffles both sides on the join key
    into the same state-store partitioning — one co-partitioned
    exchange per side, no broadcast of either stream.

    ``how``: inner (emit on match, both states bounded) or left_outer
    (unmatched LEFT rows emit with NULL right side once the watermark
    closes their band — late-arriving matches after that are dropped,
    the documented outer-join semantics). Right/full-outer are rejected.

    Works identically on batch frames (watermarks are no-ops there) —
    the e2e test pins stream == batch on the same inputs.

    Reference parity: no reference counterpart (single-process poller);
    this is engine-side Structured Streaming surface (SURVEY.md §2.4).
    """
    if how not in ("inner", "left_outer", "leftouter"):
        raise ValueError(
            f"interval_join_streams: how={how!r} unsupported"
            " (inner/left_outer only — right/full would buffer the"
            " unmatched right side unboundedly)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    collisions = {c + right_suffix for c in right.columns} & set(left.columns)
    if collisions:
        raise ValueError(
            "interval_join_streams: suffixed right columns collide with"
            f" left columns {sorted(collisions)}; pass a different"
            f" right_suffix than {right_suffix!r}"
        )
    l = left.withWatermark(ts_col, watermark_delay) if left.isStreaming else left
    r = right.withWatermark(ts_col, watermark_delay) if right.isStreaming else right
    r = r.select([F.col(c).alias(c + right_suffix) for c in r.columns])
    rts = ts_col + right_suffix
    band = F.expr(f"INTERVAL {tolerance}")
    cond = (
        (F.col(rts) >= F.col(ts_col) - band)
        & (F.col(rts) <= F.col(ts_col) + band)
    )
    for k in keys:
        cond = (F.col(k) == F.col(k + right_suffix)) & cond
    return l.join(r, cond, how)

"""TIMESTAMP_NTZ robustness (round-3 regression).

The driver regenerated events.parquet as parquet ``timestamp[us]`` with
``isAdjustedToUTC=false``, which Spark 4 infers as TIMESTAMP_NTZ —
``unix_millis``/``unix_micros`` reject that type, which broke
sessionize/as-of/band in round 3. Two defenses, both pinned here:

1. ``sources/testdata.load_table`` normalizes events.ts to TIMESTAMP at
   load (exact: session tz is pinned UTC).
2. ``functions/epoch.epoch_ms/epoch_us`` cast defensively, so the
   temporal operators give correct answers even on a raw NTZ frame that
   bypassed load_table.

The oracle parity for these paths lives in test_queries.py; this file
pins the NTZ-specific type handling with a written-here NTZ fixture so
the regression can never silently return.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.functions.epoch import epoch_ms, epoch_us
from meteo_etl_spark.operators.temporal import asof_join, band_join
from meteo_etl_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ntz_parquet(tmp_path_factory):
    """A parquet file whose ts column Spark reads as TIMESTAMP_NTZ
    (timestamp[us], isAdjustedToUTC=false — the driver's encoding)."""
    path = str(tmp_path_factory.mktemp("ntz") / "events_ntz.parquet")
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = {
        "event_id": list(range(8)),
        "ts": [base + dt.timedelta(seconds=30 * i) for i in range(8)],
        "user_id": [1, 1, 1, 2, 2, 2, 1, 2],
        "value": [float(i) for i in range(8)],
    }
    table = pa.table(
        rows,
        schema=pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),  # no tz -> isAdjustedToUTC=false
                ("user_id", pa.int64()),
                ("value", pa.float64()),
            ]
        ),
    )
    pq.write_table(table, path)
    return path


def test_fixture_reads_as_ntz(spark, ntz_parquet):
    df = spark.read.parquet(ntz_parquet)
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"


def test_load_table_normalizes_events_ts_to_timestamp(spark):
    df = load_table(spark, SF, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_epoch_helpers_accept_ntz_and_match_utc_epoch(spark, ntz_parquet):
    df = spark.read.parquet(ntz_parquet)
    row = (
        df.filter(F.col("event_id") == 0)
        .select(epoch_ms("ts").alias("ms"), epoch_us("ts").alias("us"))
        .collect()[0]
    )
    # 2024-01-01T10:00:00 UTC (session tz pinned UTC -> exact)
    expect_s = int(dt.datetime(2024, 1, 1, 10, 0, 0, tzinfo=dt.timezone.utc).timestamp())
    assert row.ms == expect_s * 1000
    assert row.us == expect_s * 1_000_000


def test_epoch_helpers_identity_on_tz_timestamp(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 10, 0, 0),)], ["ts"]
    )  # plain TIMESTAMP
    assert dict(df.dtypes)["ts"] == "timestamp"
    row = df.select(epoch_ms("ts").alias("ms")).collect()[0]
    assert row.ms == int(dt.datetime(2024, 1, 1, 10, tzinfo=dt.timezone.utc).timestamp()) * 1000


def test_band_join_on_raw_ntz_frame(spark, ntz_parquet):
    """band_join on an NTZ frame (bypassing load_table) must not raise
    and must agree with the naive range join computed on epoch longs."""
    ev = spark.read.parquet(ntz_parquet)
    got = (
        band_join(ev, ev, ["user_id"], tolerance_sec=60)
        .select("user_id", "l_event_id", "r_event_id")
        .collect()
    )
    rows = ev.select("user_id", "event_id", epoch_us("ts").alias("us")).collect()
    naive = {
        (a.user_id, a.event_id, b.event_id)
        for a in rows
        for b in rows
        if a.user_id == b.user_id and abs(a.us - b.us) <= 60 * 1_000_000
    }
    assert {(r.user_id, r.l_event_id, r.r_event_id) for r in got} == naive


def test_asof_join_on_raw_ntz_frame(spark, ntz_parquet):
    """asof_join is window-based (no epoch call) but must also survive
    NTZ input end-to-end."""
    ev = spark.read.parquet(ntz_parquet)
    left = ev.filter(F.col("event_id") % 2 == 0).select("user_id", "ts", "event_id")
    right = ev.filter(F.col("event_id") % 2 == 1).select("user_id", "ts", "value")
    got = asof_join(left, right, ["user_id"], right_cols=["value"], how="left")
    assert got.count() == left.count()

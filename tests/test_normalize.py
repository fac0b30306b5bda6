"""Golden transform parity (reference `tests/etl/test_app.py:20-24`):
the normalized output must equal the expected records exactly —
count, values, null passthrough, half-even rounding, renames."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from meteo_etl_spark.operators.normalize import HOURLY_RENAMES, normalize_meteo
from meteo_etl_spark.schemas import METEO_PAYLOAD_SCHEMA, WEATHER_RECORD_SCHEMA
from tests.conftest import N_HOURS, golden_payload


def expected_records(payload: dict) -> list[dict]:
    """Reference `etl/models.py:72-90` reimplemented in plain Python."""
    hourly = payload["hourly"]
    out = []
    for i, t in enumerate(hourly["time"]):
        rec = {
            # Python round == half-even, exactly the reference behavior.
            "latitude": round(payload["latitude"], 1),
            "longitude": round(payload["longitude"], 1),
            "timestamp": datetime.fromisoformat(t),
        }
        for src, dst in HOURLY_RENAMES.items():
            if src == "time":
                continue
            rec[dst] = hourly[src][i]
        out.append(rec)
    return out


def test_normalize_matches_golden(spark, payload):
    df = spark.createDataFrame([payload], schema=METEO_PAYLOAD_SCHEMA)
    got = normalize_meteo(df)

    assert [f.name for f in got.schema.fields] == [f.name for f in WEATHER_RECORD_SCHEMA.fields]

    rows = [r.asDict() for r in got.orderBy("timestamp").collect()]
    exp = expected_records(payload)
    assert len(rows) == N_HOURS == len(exp)
    for got_row, exp_row in zip(rows, exp):
        assert got_row == exp_row


def test_rounding_is_half_even(spark):
    # 5.25 -> 5.2 under Python round (half-even); HALF_UP would give 5.3.
    p = golden_payload(lat=2.5, lon=5.25)
    df = spark.createDataFrame([p], schema=METEO_PAYLOAD_SCHEMA)
    row = normalize_meteo(df).select("latitude", "longitude").first()
    assert row.latitude == round(2.5, 1) == 2.5
    assert row.longitude == round(5.25, 1) == 5.2


def test_null_passthrough(spark, payload):
    df = spark.createDataFrame([payload], schema=METEO_PAYLOAD_SCHEMA)
    got = normalize_meteo(df)
    n_null = got.filter(F.col("temperature").isNull()).count()
    assert n_null == sum(1 for v in payload["hourly"]["temperature_2m"] if v is None)
    assert n_null > 0


def test_multiple_payloads_and_passthrough_cols(spark):
    """The unnest is a batch operator: many payload rows in one frame,
    extra columns (fetch_id) ride along."""
    p1, p2 = golden_payload(), golden_payload(lat=48.1, lon=11.6)
    df = spark.createDataFrame([p1, p2], schema=METEO_PAYLOAD_SCHEMA).withColumn(
        "fetch_id", F.expr("uuid()")
    )
    got = normalize_meteo(df)
    assert got.count() == 2 * N_HOURS
    assert "fetch_id" in got.columns
    assert got.select("latitude").distinct().count() == 2

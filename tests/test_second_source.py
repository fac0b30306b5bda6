"""The registry's second registered source (S2 generality).

The reference's source registry exists to host multiple sources
(`etl/sources.py:69-77`) but registers only Meteo. The engine registers
``metno`` — a row-oriented GeoJSON payload (array of per-instant
structs) with its own schema and normalize, the opposite layout of
Meteo's struct-of-arrays. These tests drive it through the BATCH
lifecycle and through a STREAMING consumer run with events from both
sources interleaved in one topic — which exercises the J3 reverse
lookup (`get_source_by_url`) with more than one registry entry.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.pipeline import batch, control
from meteo_etl_spark.pipeline.warehouse import read_observations
from meteo_etl_spark.streaming import consume, produce
from tests.conftest import N_HOURS, golden_payload

METNO_HOURS = 48


def metno_payload(lat: float = 59.91, lon: float = 10.75) -> dict:
    """Deterministic locationforecast-compact-shaped payload (public
    api.met.no format): GeoJSON point + properties.timeseries[]."""
    series = []
    for i in range(METNO_HOURS):
        day = 1 + i // 24
        hour = i % 24
        series.append(
            {
                "time": f"2025-12-{day:02d}T{hour:02d}:00:00Z",
                "data": {
                    "instant": {
                        "details": {
                            "air_temperature": round(5.0 + 3 * math.sin(i / 6.0), 2),
                            "wind_speed": round(8.0 + 2 * math.cos(i / 4.0), 2),
                            "wind_from_direction": float((i * 15) % 360),
                            "cloud_area_fraction": round((i * 7) % 100 / 1.0, 1),
                            "relative_humidity": 80.0,
                        }
                    },
                    # every 6th instant has no next_1_hours block (the
                    # real API omits it at the forecast tail)
                    **(
                        {}
                        if i % 6 == 5
                        else {
                            "next_1_hours": {
                                "details": {"precipitation_amount": round(i * 0.1, 1)}
                            }
                        }
                    ),
                },
            }
        )
    return {
        "type": "Feature",
        "geometry": {"type": "Point", "coordinates": [lon, lat, 10.0]},
        "properties": {"timeseries": series},
    }


@pytest.fixture()
def offline_sources(monkeypatch):
    """Both registered sources answer offline with their own payload
    shape — routed by the spec the Source instance is bound to."""
    from meteo_etl_spark.sources.registry import Source

    def fake_extract(self, **extra):
        # both sources speak the canonical param vocabulary; aliasing
        # to the provider's wire names happens in request_params
        maker = metno_payload if self.spec.name == "metno" else golden_payload
        return maker(
            lat=float(self.params["latitude"]), lon=float(self.params["longitude"])
        )

    monkeypatch.setattr(Source, "extract", fake_extract)


def test_metno_normalize_golden(spark):
    """Row-oriented unnest: one record per timeseries instant, GeoJSON
    [lon, lat] order honored, absent measures NULL, missing
    next_1_hours block -> NULL precipitation."""
    from meteo_etl_spark.schemas import METNO_PAYLOAD_SCHEMA, WEATHER_RECORD_SCHEMA
    from meteo_etl_spark.sources.registry import create_source

    src = create_source("metno", {"latitude": 59.91, "longitude": 10.75})
    # canonical params re-keyed to the provider's wire names (T10-ish
    # per-source param model as data)
    assert src.request_params() == {"lat": 59.91, "lon": 10.75}
    df = src.transform(src.payload_to_df(spark, metno_payload()))
    assert df.columns == [f.name for f in WEATHER_RECORD_SCHEMA.fields]
    rows = df.orderBy("timestamp").collect()
    assert len(rows) == METNO_HOURS
    first = rows[0]
    assert (first.latitude, first.longitude) == (59.9, 10.8)  # [lon,lat] flipped
    assert first.temperature == 5.0 and first.wind_direction == 0.0
    assert first.soil_temperature is None and first.soil_moisture is None
    assert rows[5].precipitation is None  # omitted next_1_hours block
    assert rows[6].precipitation == 0.6
    assert first.timestamp.hour == 0 and first.timestamp.day == 1
    # spec payload schema is what the bronze re-read will use
    assert src.spec.payload_schema == METNO_PAYLOAD_SCHEMA


def test_metno_batch_etl_lifecycle(spark, warehouse, offline_sources):
    """Full batch lifecycle (S11 -> extract -> normalize -> U1 merge ->
    S12) through the second source."""
    result = batch.run_etl(
        spark, warehouse, "metno", {"latitude": 59.91, "longitude": 10.75}
    )
    assert result.status == "success"
    meta = (
        control.read_fetch_metadata(spark, warehouse)
        .filter(F.col("id") == result.fetch_id)
        .collect()[0]
    )
    assert meta.status == "success"
    assert meta.request_url.startswith("https://api.met.no/")
    obs = read_observations(spark, warehouse).filter(
        F.col("fetch_id") == result.fetch_id
    )
    assert obs.count() == METNO_HOURS
    got = obs.orderBy("timestamp").collect()[0]
    assert (got.latitude, got.longitude) == (59.9, 10.8)
    assert got.temperature == 5.0
    assert got.timezone is None  # reference contract: never populated


def test_interleaved_sources_one_consumer_run(
    spark, warehouse, offline_sources, tmp_path
):
    """TWO sources' events interleaved in ONE topic, one consumer run:
    the per-batch source grouping resolves each event's spec via the
    J3 reverse lookup (now >1 registry entry), reads each group with
    ITS payload schema, and merges both into silver."""
    topic = str(tmp_path / "topic")
    fids = {}
    for name, params in (
        ("meteo", {"latitude": 3.06, "longitude": 5.25}),
        ("metno", {"latitude": 59.91, "longitude": 10.75}),
        ("meteo", {"latitude": 13.06, "longitude": 5.25}),
    ):
        r = batch.run_etl(
            spark, warehouse, name, params,
            fetch_job=batch.extract_and_save_to_disk,
        )
        fids.setdefault(name, []).append(r.fetch_id)
        produce.publish_finished_fetch(spark, warehouse, r.fetch_id, topic)

    stats = consume.ConsumeStats()
    consume.consume_fetch_events(
        spark, warehouse, topic, str(tmp_path / "ckpt"), stats=stats
    ).awaitTermination(120)

    assert stats.events == 3 and stats.poison == 0
    assert sorted(stats.sources) == ["meteo", "metno"]  # one merge per source group
    obs = read_observations(spark, warehouse)
    for fid in fids["meteo"]:
        assert obs.filter(F.col("fetch_id") == fid).count() == N_HOURS
    assert (
        obs.filter(F.col("fetch_id") == fids["metno"][0]).count() == METNO_HOURS
    )
    # distinct locations -> no cross-source key collisions swallowed rows
    assert obs.count() == 2 * N_HOURS + METNO_HOURS


def test_metno_normalize_edge_cases(spark):
    """Ragged/partial payloads degrade to NULL measures, never to job
    failure (the engine-wide nullable-measure contract): empty
    timeseries -> zero rows; missing instant details -> NULL measures;
    2-element coordinates (no altitude) still resolve [lon, lat]."""
    from meteo_etl_spark.schemas import METNO_PAYLOAD_SCHEMA
    from meteo_etl_spark.sources.registry import create_source

    src = create_source("metno", {"latitude": 1.0, "longitude": 2.0})

    empty = {
        "type": "Feature",
        "geometry": {"type": "Point", "coordinates": [2.0, 1.0]},
        "properties": {"timeseries": []},
    }
    assert src.transform(src.payload_to_df(spark, empty)).count() == 0

    bare = {
        "type": "Feature",
        "geometry": {"type": "Point", "coordinates": [2.0, 1.0]},
        "properties": {
            "timeseries": [{"time": "2025-12-01T00:00:00Z", "data": {}}]
        },
    }
    row = src.transform(src.payload_to_df(spark, bare)).collect()[0]
    assert (row.latitude, row.longitude) == (1.0, 2.0)
    assert row.timestamp is not None
    assert row.temperature is None and row.precipitation is None
    assert row.wind_speed is None and row.cloud_cover is None


def test_metno_timestamp_offset_variants(spark):
    """Zone handling: 'Z' and explicit-offset ISO instants both parse
    (offsets normalize to UTC); garbage time strings still fail loudly
    (pydantic-parity strictness, not silent NULL keys)."""
    from meteo_etl_spark.operators.normalize import normalize_metno
    from meteo_etl_spark.schemas import METNO_PAYLOAD_SCHEMA

    def p(time):
        return {
            "type": "Feature",
            "geometry": {"type": "Point", "coordinates": [2.0, 1.0]},
            "properties": {"timeseries": [{"time": time, "data": {}}]},
        }

    both = spark.createDataFrame(
        [p("2025-12-01T03:00:00Z"), p("2025-12-01T04:00:00+01:00")],
        schema=METNO_PAYLOAD_SCHEMA,
    )
    ts = sorted(str(r.timestamp) for r in normalize_metno(both).collect())
    assert ts == ["2025-12-01 03:00:00", "2025-12-01 03:00:00"]

    garbage = spark.createDataFrame([p("not-a-time")], schema=METNO_PAYLOAD_SCHEMA)
    with pytest.raises(Exception, match="CANNOT_PARSE_TIMESTAMP|not-a-time"):
        normalize_metno(garbage).collect()


def test_payload_to_df_coerces_json_integers(spark):
    """The live met.no API encodes whole numbers as JSON ints
    (altitude 3, temperature 5): payload_to_df must coerce them into
    the declared DoubleType fields like the bronze JSON re-read does,
    not reject them through the Python row verifier."""
    from meteo_etl_spark.sources.registry import create_source

    src = create_source("metno", {"latitude": 1.0, "longitude": 2.0})
    payload = {
        "type": "Feature",
        "geometry": {"type": "Point", "coordinates": [10, 59, 3]},  # all ints
        "properties": {
            "timeseries": [
                {
                    "time": "2025-12-01T00:00:00Z",
                    "data": {
                        "instant": {
                            "details": {"air_temperature": 5, "wind_speed": 3}
                        }
                    },
                }
            ]
        },
    }
    row = src.transform(src.payload_to_df(spark, payload)).collect()[0]
    assert (row.latitude, row.longitude) == (59.0, 10.0)
    assert row.temperature == 5.0 and row.wind_speed == 3.0

    # the meteo struct-of-arrays shape coerces too (int lat/long/measures)
    m = create_source("meteo", {"latitude": 1.0, "longitude": 2.0})
    from meteo_etl_spark.schemas import HOURLY_MEASURES

    mp = {
        "latitude": 3, "longitude": 5,
        "hourly": {
            "time": ["2025-12-01T00:00"],
            **{meas: [10] for meas in HOURLY_MEASURES},  # ints everywhere
        },
    }
    mrow = m.transform(m.payload_to_df(spark, mp)).collect()[0]
    assert (mrow.latitude, mrow.longitude, mrow.temperature) == (3.0, 5.0, 10.0)


def test_payload_to_df_shape_mismatch_raises_not_nulls(spark):
    """FAILFAST parsing: a payload whose shape contradicts the declared
    schema must raise (so the batch error taxonomy records a failure),
    never silently null the fields and report a 0-record success."""
    import pytest as _pytest

    from meteo_etl_spark.sources.registry import create_source

    src = create_source("metno", {"latitude": 1.0, "longitude": 2.0})
    bad = metno_payload()
    bad["properties"]["timeseries"] = {"not": "an array"}
    with _pytest.raises(Exception, match="FAILFAST|Malformed|malformed"):
        src.payload_to_df(spark, bad).collect()

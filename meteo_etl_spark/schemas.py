"""Single source of truth for every schema in the engine.

The reference keeps three parallel schema declarations manually in sync
(pydantic models, SQLAlchemy metadata + alembic, Avro .avsc — reference
`etl/models.py`, `etl/db.py:49-120`, `streaming/schemas/fetch_event.avsc`).
This engine declares each schema exactly once as a ``StructType`` and
derives everything else (JSON readers refuse inference, Avro JSON schema
string generated from the same fields).

See FIXTURES.md §1-5 for the field-by-field derivation with reference
file:line citations.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# 1. Raw API payload (bronze) — struct-of-arrays hourly block.
#    Reference: `etl/models.py:51-70` (MeteoPayload/RawMeteo); golden
#    fixture shape in FIXTURES.md §1. Measure arrays are element-nullable.
# ---------------------------------------------------------------------------

HOURLY_MEASURES = (
    "temperature_2m",
    "precipitation",
    "soil_temperature_18cm",
    "soil_moisture_9_to_27cm",
    "wind_speed_10m",
    "wind_direction_10m",
    "cloud_cover",
)

METEO_HOURLY_SCHEMA = T.StructType(
    [T.StructField("time", T.ArrayType(T.StringType(), containsNull=False), True)]
    + [
        T.StructField(m, T.ArrayType(T.DoubleType(), containsNull=True), True)
        for m in HOURLY_MEASURES
    ]
)

METEO_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("latitude", T.DoubleType(), False),
        T.StructField("longitude", T.DoubleType(), False),
        T.StructField("generationtime_ms", T.DoubleType(), True),
        T.StructField("utc_offset_seconds", T.LongType(), True),
        T.StructField("timezone", T.StringType(), True),
        T.StructField("timezone_abbreviation", T.StringType(), True),
        T.StructField("elevation", T.DoubleType(), True),
        T.StructField("hourly_units", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("hourly", METEO_HOURLY_SCHEMA, True),
    ]
)

# ---------------------------------------------------------------------------
# 1b. Second registered source: met.no-style locationforecast payload —
#     row-oriented GeoJSON (array of per-instant structs), the opposite
#     layout of Open-Meteo's struct-of-arrays. Field names follow the
#     public api.met.no locationforecast/2.0 compact format. Proves the
#     S2 registry generalizes beyond one payload shape (reference
#     `etl/sources.py:69-77` exists to host multiple sources).
# ---------------------------------------------------------------------------

_METNO_INSTANT_DETAILS = T.StructType(
    [
        T.StructField("air_temperature", T.DoubleType(), True),
        T.StructField("wind_speed", T.DoubleType(), True),
        T.StructField("wind_from_direction", T.DoubleType(), True),
        T.StructField("cloud_area_fraction", T.DoubleType(), True),
        T.StructField("relative_humidity", T.DoubleType(), True),
    ]
)

METNO_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType(), True),
        T.StructField(
            "geometry",
            T.StructType(
                [
                    T.StructField("type", T.StringType(), True),
                    # GeoJSON order: [longitude, latitude, altitude]
                    T.StructField(
                        "coordinates", T.ArrayType(T.DoubleType(), False), False
                    ),
                ]
            ),
            False,
        ),
        T.StructField(
            "properties",
            T.StructType(
                [
                    T.StructField(
                        "timeseries",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("time", T.StringType(), False),
                                    T.StructField(
                                        "data",
                                        T.StructType(
                                            [
                                                T.StructField(
                                                    "instant",
                                                    T.StructType(
                                                        [
                                                            T.StructField(
                                                                "details",
                                                                _METNO_INSTANT_DETAILS,
                                                                True,
                                                            )
                                                        ]
                                                    ),
                                                    True,
                                                ),
                                                T.StructField(
                                                    "next_1_hours",
                                                    T.StructType(
                                                        [
                                                            T.StructField(
                                                                "details",
                                                                T.StructType(
                                                                    [
                                                                        T.StructField(
                                                                            "precipitation_amount",
                                                                            T.DoubleType(),
                                                                            True,
                                                                        )
                                                                    ]
                                                                ),
                                                                True,
                                                            )
                                                        ]
                                                    ),
                                                    True,
                                                ),
                                            ]
                                        ),
                                        True,
                                    ),
                                ]
                            ),
                            False,
                        ),
                        False,
                    )
                ]
            ),
            False,
        ),
    ]
)

# ---------------------------------------------------------------------------
# 2. Normalized weather record — one row per hourly sample.
#    Reference: `etl/models.py:38-48` (WeatherRecord), produced by the
#    columnar unnest `etl/models.py:72-90`. FIXTURES.md §2.
# ---------------------------------------------------------------------------

WEATHER_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("latitude", T.DoubleType(), False),
        T.StructField("longitude", T.DoubleType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("temperature", T.DoubleType(), True),
        T.StructField("precipitation", T.DoubleType(), True),
        T.StructField("soil_temperature", T.DoubleType(), True),
        T.StructField("soil_moisture", T.DoubleType(), True),
        T.StructField("wind_speed", T.DoubleType(), True),
        T.StructField("wind_direction", T.DoubleType(), True),
        T.StructField("cloud_cover", T.DoubleType(), True),
    ]
)

# ---------------------------------------------------------------------------
# 3. Silver `weather_observations` table.
#    Reference: `etl/db.py:88-120`. Natural key (latitude, longitude,
#    timestamp) = unique constraint `u_loc_time` (`etl/db.py:118`).
#    Only 3 of the 7 record measures are persisted — soil_temperature,
#    soil_moisture, wind_direction, cloud_cover are dropped at load
#    (`etl/load.py:31-33`); `timezone` is never populated by any writer.
# ---------------------------------------------------------------------------

OBSERVATION_KEY = ("latitude", "longitude", "timestamp")

#: WeatherRecord fields that are NOT persisted to the silver table (P1,
#: reference `etl/load.py:31-43`).
DROPPED_AT_LOAD = ("soil_temperature", "soil_moisture", "wind_direction", "cloud_cover")

OBSERVATIONS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
        T.StructField("latitude", T.DoubleType(), False),
        T.StructField("longitude", T.DoubleType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("timezone", T.StringType(), True),
        T.StructField("temperature", T.DoubleType(), True),
        T.StructField("precipitation", T.DoubleType(), True),
        T.StructField("wind_speed", T.DoubleType(), True),
        T.StructField("fetch_id", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# 4. Control table `fetch_metadata` — job lifecycle.
#    Reference: `etl/db.py:49-85`; status machine `etl/db.py:34-46`;
#    finished_at gating `etl/load.py:104`. FIXTURES.md §4.
# ---------------------------------------------------------------------------

FETCH_STATUS_PENDING = "pending"
FETCH_STATUS_ERROR = "error"
FETCH_STATUS_SUCCESS = "success"
FETCH_STATUSES = (FETCH_STATUS_PENDING, FETCH_STATUS_ERROR, FETCH_STATUS_SUCCESS)
#: "finished" statuses gate `finished_at` (reference `etl/db.py:43-46`).
FINISHED_STATUSES = (FETCH_STATUS_ERROR, FETCH_STATUS_SUCCESS)

#: CHECK-constraint regexes (reference `etl/db.py:76-85`).
PAYLOAD_PATH_RE = r"^((https?|ftp|s3)://|/[^ ]+)"
REQUEST_URL_RE = r"^https?://"

FETCH_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("request_timestamp", T.TimestampType(), False),
        T.StructField("request_params", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("request_url", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("response_status", T.IntegerType(), True),
        T.StructField("error_data", T.StringType(), True),  # JSON text
        T.StructField("payload_path", T.StringType(), True),
        T.StructField("finished_at", T.TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# 5. FetchEvent — the streaming event (pointer-to-data + job metadata).
#    Reference: `streaming/schemas/fetch_event.avsc:1-26`,
#    `streaming/events.py:17-72`. `finished_at` is epoch-millis UTC
#    truncated to ms (`streaming/events.py:45-49`). Params values are a
#    string|double union on the wire; this engine stringifies them
#    (SURVEY.md §1.3).
# ---------------------------------------------------------------------------

FETCH_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("fetch_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("path", T.StringType(), True),
        T.StructField("params", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("finished_at", T.LongType(), False),  # timestamp-millis
    ]
)

#: Avro schema (JSON string) for `to_avro`/`from_avro`, mirroring
#: `streaming/schemas/fetch_event.avsc`. Used only when the spark-avro
#: datasource jar is on the classpath (see meteo_etl_spark.streaming.events).
FETCH_EVENT_AVRO_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "FetchEvent",
        "namespace": "meteo.streaming",
        "fields": [
            {"name": "fetch_id", "type": "string"},
            {"name": "source", "type": "string"},
            {
                "name": "status",
                "type": {
                    "type": "enum",
                    "name": "FetchStatus",
                    "symbols": ["pending", "error", "success"],
                },
            },
            {"name": "path", "type": ["null", "string"], "default": None},
            {"name": "params", "type": {"type": "map", "values": "string"}},
            {"name": "finished_at", "type": {"type": "long", "logicalType": "timestamp-millis"}},
        ],
    }
)

# ---------------------------------------------------------------------------
# 6. Schema evolution policy (reference: alembic migrations
#    `alembic/versions/3967a578f902_*.py`, `a1cbf11c1945_*.py` — the
#    reference ALTERs the Postgres table in place; a parquet lake
#    cannot, so evolution is schema-on-read):
#
#    - ADD a nullable column: legal. New files carry it; old partitions
#      are NEVER rewritten — they simply lack the column, and a read
#      with the current declared StructType (spark.read.schema(...))
#      fills it with NULL. ``mergeSchema=true`` gives the same result
#      by unioning file footers — use it for DISCOVERY/debug only: at
#      100 TB the footer merge is a full file-listing cost per query,
#      while the declared-schema read prices at zero.
#    - WIDEN a numeric column (int->long, float->double): legal on
#      write (new files use the wide type); reads must supply the wide
#      declared schema. Narrowing is never legal.
#    - DROP / RENAME / re-type: illegal in place — a rename is an add
#      (new name) plus a documented retirement of the old column; a
#      re-type is a new column. Physical removal happens only through
#      a full rewrite (compaction with a projection), never silently.
#
#    ``validate_evolution`` enforces this contract between two schema
#    versions; ``merge_parquet`` (operators/upsert.py) implements the
#    write side (new update columns are unioned into the output,
#    untouched partitions stay byte-identical).
# ---------------------------------------------------------------------------

#: legal (old, new) atomic type widenings.
_WIDENINGS = {
    ("integer", "long"),
    ("short", "integer"),
    ("short", "long"),
    ("byte", "short"),
    ("byte", "integer"),
    ("byte", "long"),
    ("float", "double"),
}


def validate_evolution(old: T.StructType, new: T.StructType) -> list[str]:
    """Check that ``new`` is a legal evolution of ``old``.

    Returns the list of added column names; raises ``ValueError`` on
    any illegal change (drop, rename, narrow/re-type, non-nullable
    add)."""
    old_fields = {f.name: f for f in old.fields}
    new_fields = {f.name: f for f in new.fields}

    dropped = [n for n in old_fields if n not in new_fields]
    if dropped:
        raise ValueError(
            f"illegal evolution: columns dropped {dropped} — retire via "
            "full rewrite, never in place"
        )
    for name, of in old_fields.items():
        nf = new_fields[name]
        if of.dataType != nf.dataType:
            pair = (of.dataType.typeName(), nf.dataType.typeName())
            if pair not in _WIDENINGS:
                raise ValueError(
                    f"illegal evolution: column {name!r} re-typed "
                    f"{of.dataType.simpleString()} -> {nf.dataType.simpleString()}"
                )
        if of.nullable and not nf.nullable:
            raise ValueError(
                f"illegal evolution: column {name!r} tightened to non-nullable"
            )
    added = [n for n in new_fields if n not in old_fields]
    for n in added:
        if not new_fields[n].nullable:
            raise ValueError(
                f"illegal evolution: added column {n!r} must be nullable "
                "(old partitions read it as NULL)"
            )
    return added


# ---------------------------------------------------------------------------
# 7. Driver star-schema testdata (read-only parquet; FIXTURES.md §6).
#    Parquet is self-describing — these names are the registry used by
#    sources.testdata.register_views and the oracle harness.
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

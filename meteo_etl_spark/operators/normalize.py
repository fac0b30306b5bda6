"""T1-T4: columnar unnest + renames + rounding + timestamp parse.

The reference's single most characteristic transform (SURVEY.md §1.3):
the API payload is **struct-of-arrays** (8 parallel arrays under
``hourly``), pivoted index-wise into one row per hourly sample
(reference `etl/models.py:72-90`, ``MeteoPayload.to_records``).

Spark-first expression: ``explode(arrays_zip(...))`` — a generate
operator inside whole-stage codegen; no Python executes per row. At
100 TB this runs as a narrow map stage (no shuffle): each payload row
expands to N record rows within its partition.

Semantics matched to the reference:

- lat/long rounded to 1 decimal with **half-even** rounding — Python's
  ``round`` (reference `etl/models.py:78-79`) → ``F.bround`` (T2).
- field renames `temperature_2m→temperature` etc. (T3, reference
  `etl/models.py:80-87`).
- `hourly.time` ISO-8601 minute strings → timestamps (T4, reference
  `etl/models.py:52`).
- nulls in measure arrays flow through untouched.
- arrays are zipped index-wise; the reference asserts equal lengths
  implicitly (pydantic would error on ragged input) while ``arrays_zip``
  pads the shorter arrays with null — ragged payloads surface as null
  measures rather than a job failure (documented deviation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: hourly array field → record column (T3; reference `etl/models.py:80-87`).
HOURLY_RENAMES = {
    "time": "timestamp",
    "temperature_2m": "temperature",
    "precipitation": "precipitation",
    "soil_temperature_18cm": "soil_temperature",
    "soil_moisture_9_to_27cm": "soil_moisture",
    "wind_speed_10m": "wind_speed",
    "wind_direction_10m": "wind_direction",
    "cloud_cover": "cloud_cover",
}

ISO_MINUTE_FORMAT = "yyyy-MM-dd'T'HH:mm"


def normalize_meteo(payloads: DataFrame) -> DataFrame:
    """Struct-of-arrays payload rows → one normalized record per sample.

    Input schema: ``schemas.METEO_PAYLOAD_SCHEMA`` (any number of payload
    rows — one per fetch). Output schema: ``schemas.WEATHER_RECORD_SCHEMA``
    plus any passthrough columns the caller attached (e.g. ``fetch_id``).
    """
    payload_cols = [c for c in payloads.columns if c not in ("latitude", "longitude", "hourly")]
    passthrough = [
        c
        for c in payload_cols
        if c
        not in (
            "generationtime_ms",
            "utc_offset_seconds",
            "timezone",
            "timezone_abbreviation",
            "elevation",
            "hourly_units",
        )
    ]

    zipped = F.arrays_zip(
        *[F.col(f"hourly.{src}").alias(src) for src in HOURLY_RENAMES]
    )
    exploded = payloads.select(
        F.bround("latitude", 1).alias("latitude"),
        F.bround("longitude", 1).alias("longitude"),
        *passthrough,
        F.explode(zipped).alias("h"),
    )
    return exploded.select(
        "latitude",
        "longitude",
        F.to_timestamp(F.col("h.time"), ISO_MINUTE_FORMAT).alias("timestamp"),
        *[
            F.col(f"h.{src}").alias(dst)
            for src, dst in HOURLY_RENAMES.items()
            if src != "time"
        ],
        *passthrough,
    )


#: ISO-8601 with zone designator (met.no timeseries: "...T03:00:00Z").
ISO_SECOND_ZONED_FORMAT = "yyyy-MM-dd'T'HH:mm:ssX"


def normalize_metno(payloads: DataFrame) -> DataFrame:
    """met.no locationforecast payload rows → normalized weather records.

    The second registered source's transform: the payload is
    row-oriented GeoJSON (``properties.timeseries`` is an array of
    per-instant structs — the OPPOSITE layout of Open-Meteo's
    struct-of-arrays), so the unnest is a plain ``explode`` of the
    struct array followed by nested-field projection; still one narrow
    generate stage, no Python per row. Output columns match
    ``WEATHER_RECORD_SCHEMA`` (measures the provider lacks — soil
    temperature/moisture — are NULL, the reference's nullable-measure
    contract); extra payload columns (e.g. ``fetch_id``) pass through.

    Reference parity: a second BaseSource subclass with its own
    payload model and transform (`etl/sources.py:29-90` template).
    GeoJSON coordinate order is [longitude, latitude, altitude].
    """
    passthrough = [
        c for c in payloads.columns if c not in ("type", "geometry", "properties")
    ]
    exploded = payloads.select(
        F.bround(F.element_at("geometry.coordinates", 2), 1).alias("latitude"),
        F.bround(F.element_at("geometry.coordinates", 1), 1).alias("longitude"),
        *passthrough,
        F.explode("properties.timeseries").alias("s"),
    )
    null_measure = F.lit(None).cast("double")
    return exploded.select(
        "latitude",
        "longitude",
        # met.no always emits "...T03:00:00Z"; the fallback parse covers
        # offset-bearing ISO variants ("+01:00") rather than degrading
        # a whole instant to a NULL merge key on a format drift. The
        # first branch must be try_ (ANSI to_timestamp THROWS on
        # unparsed trailing text, never reaching a coalesce fallback);
        # the final strict parse keeps garbage input failing loudly —
        # the pydantic-parity contract.
        F.coalesce(
            F.try_to_timestamp(F.col("s.time"), F.lit(ISO_SECOND_ZONED_FORMAT)),
            F.to_timestamp(F.col("s.time")),
        ).alias("timestamp"),
        F.col("s.data.instant.details.air_temperature").alias("temperature"),
        F.col("s.data.next_1_hours.details.precipitation_amount").alias(
            "precipitation"
        ),
        null_measure.alias("soil_temperature"),
        null_measure.alias("soil_moisture"),
        F.col("s.data.instant.details.wind_speed").alias("wind_speed"),
        F.col("s.data.instant.details.wind_from_direction").alias("wind_direction"),
        F.col("s.data.instant.details.cloud_area_fraction").alias("cloud_cover"),
        *passthrough,
    )

"""FetchEvent wire codecs (S5/S8, T5-T7).

The reference serializes ``FetchEvent`` with Confluent Avro
(`streaming/events.py:81-91`); this engine's canonical wire format is
JSON (`to_wire_json`/`parse_wire_json`) because the spark-avro
datasource jar is an external module not present in this image. The
Avro path (`to_avro_value`/`from_avro_value`) still works without it:
when the jar is absent the calls route to the engine's own
spec-conformant binary codec (``streaming.avro_codec``, Arrow-batched
``mapInPandas``, validated against the Java avro-core implementation);
with the jar they use the JVM ``from_avro``/``to_avro``. Both routes
include the Confluent wire-format header strip that vanilla
``from_avro`` lacks (5 bytes: magic 0x00 + 4-byte schema id —
SURVEY.md §2.1 S5 caveat).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meteo_etl_spark.schemas import FETCH_EVENT_AVRO_SCHEMA, FETCH_EVENT_SCHEMA

#: Event-time column truncation: Avro timestamp-millis precision
#: (T5, reference `streaming/events.py:45-49`).


def truncate_to_millis(ts: Column) -> Column:
    """Timestamp → epoch-millis long (microseconds truncated)."""
    return F.unix_millis(ts.cast("timestamp"))


def millis_to_timestamp(ms: Column) -> Column:
    return F.timestamp_millis(ms)


def events_from_control(control_df: DataFrame) -> DataFrame:
    """Control-table rows → FetchEvent rows (T6/T7, reference
    `streaming/events.py:51-72`): rename/projection + ms truncation.
    ``finished_at`` must be non-null (only finished rows are published
    — reference publishes after the lifecycle completes)."""
    return control_df.select(
        F.col("id").alias("fetch_id"),
        F.col("request_url").alias("source"),
        F.col("status"),
        F.col("payload_path").alias("path"),
        F.col("request_params").alias("params"),
        truncate_to_millis(F.col("finished_at")).alias("finished_at"),
    )


def to_wire_json(events: DataFrame) -> DataFrame:
    """Event rows → single ``value`` string column (the Kafka message
    value analogue; S8)."""
    return events.select(
        F.to_json(
            F.struct(*[F.col(f.name) for f in FETCH_EVENT_SCHEMA.fields])
        ).alias("value")
    )


def parse_wire_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """``value`` strings → (event struct, raw value). PERMISSIVE: a
    corrupt value yields a null ``event`` — callers route those to the
    dead-letter sink (ST3) instead of failing the stream."""
    return raw.select(
        F.from_json(F.col(value_col), FETCH_EVENT_SCHEMA).alias("event"),
        F.col(value_col).alias("raw_value"),
    )


# ---------------------------------------------------------------------------
# Avro path (gated on the spark-avro jar).
# ---------------------------------------------------------------------------


_AVRO_PROBE: bool | None = None


def avro_available() -> bool:
    """True only if the spark-avro datasource actually executes — the
    Python wrapper always imports; the JVM class may be absent (it is
    an external module), which only surfaces at evaluation time
    (AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE). So: probe with a
    one-row encode (cached per process — the classpath can't change)."""
    global _AVRO_PROBE
    if _AVRO_PROBE is not None:
        return _AVRO_PROBE
    _AVRO_PROBE = _avro_probe()
    return _AVRO_PROBE


def _avro_probe() -> bool:
    try:
        from pyspark.sql import SparkSession
        from pyspark.sql.avro.functions import to_avro

        spark = SparkSession.getActiveSession()
        if spark is None:
            return False
        probe = spark.range(1).select(
            F.struct(F.lit("x").alias("a")).alias("s")
        )
        probe.select(to_avro("s")).collect()
        return True
    except Exception:
        return False


def strip_confluent_header(value: Column) -> Column:
    """Drop the 5-byte Confluent wire-format prefix (magic byte +
    schema-id) so the remainder is plain Avro for ``from_avro``."""
    return F.expr("substring(value, 6, length(value) - 5)")


def to_avro_value(events: DataFrame) -> DataFrame:
    """Event rows → Avro-encoded ``value`` (header-free; a Schema
    Registry producer would prepend the 5-byte header). JVM
    ``to_avro`` when the datasource jar is present; the engine's own
    spec-conformant codec (Arrow-batched) otherwise."""
    if avro_available():
        from pyspark.sql.avro.functions import to_avro

        struct = F.struct(*[F.col(f.name) for f in FETCH_EVENT_SCHEMA.fields])
        return events.select(to_avro(struct, FETCH_EVENT_AVRO_SCHEMA).alias("value"))
    from meteo_etl_spark.streaming.avro_codec import encode_avro_values

    return encode_avro_values(events)


def from_avro_value(raw: DataFrame, *, confluent_header: bool = False) -> DataFrame:
    """Avro ``value`` bytes → event struct; PERMISSIVE either route —
    corrupt input yields a null event (dead-letter, ST3)."""
    if avro_available():
        from pyspark.sql.avro.functions import from_avro

        value = (
            strip_confluent_header(F.col("value")) if confluent_header else F.col("value")
        )
        return raw.select(
            from_avro(value, FETCH_EVENT_AVRO_SCHEMA, {"mode": "PERMISSIVE"}).alias("event"),
            F.col("value").alias("raw_value"),
        )
    from meteo_etl_spark.streaming.avro_codec import decode_avro_values

    return decode_avro_values(raw, confluent_header=confluent_header)

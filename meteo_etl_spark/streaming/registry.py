"""Confluent Schema Registry client + wire-format glue (driver-side).

The reference's event pipeline registers its Avro schema with a
Schema Registry and lets confluent-kafka's serializers prepend the
5-byte wire header (reference `streaming/events.py:81-91`:
``SchemaRegistryClient`` + ``AvroSerializer``). The engine already
handles the wire FORMAT (`events.strip_confluent_header`,
`avro_codec`); this module closes the remaining parity gap — the
registry PROTOCOL:

- ``SchemaRegistryClient``: register / fetch-by-id / latest-version
  over the public REST API (POST ``/subjects/{s}/versions``, GET
  ``/schemas/ids/{id}``, GET ``/subjects/{s}/versions/latest``), with
  an id→schema cache so a consumer resolves each schema id exactly
  once per process (the registry sees O(distinct ids) requests, not
  O(messages));
- ``subject_for_topic``: TopicNameStrategy (``{topic}-value``), the
  default subject naming the reference relies on;
- ``make_confluent_header`` / ``parse_confluent_header``: the 5-byte
  wire format (magic 0x00 + big-endian uint32 schema id) — driver-side
  twins of the JVM-side column helpers below;
- ``confluent_schema_id`` / ``with_confluent_header``: Column-level
  header read/write (pure substring/concat — codegen'd, no UDF), so a
  Kafka batch can be header-audited or produced registry-framed
  without any Python in the executor path.

Scale stance: registry traffic is control-plane (one HTTP call per
schema id per process); all per-message work stays JVM-side columns.
"""

from __future__ import annotations

import json
import struct
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meteo_etl_spark.errors import ExtractError

CONFLUENT_MAGIC = 0x00
HEADER_LEN = 5
_CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"


def subject_for_topic(topic: str, *, kind: str = "value") -> str:
    """TopicNameStrategy: ``{topic}-value`` / ``{topic}-key``."""
    if kind not in ("value", "key"):
        raise ValueError(f"subject kind {kind!r} must be 'value' or 'key'")
    return f"{topic}-{kind}"


def make_confluent_header(schema_id: int) -> bytes:
    """Magic byte + big-endian uint32 schema id."""
    if not 0 <= schema_id <= 0xFFFFFFFF:
        raise ValueError(f"schema id {schema_id} outside uint32")
    return struct.pack(">bI", CONFLUENT_MAGIC, schema_id)


def parse_confluent_header(value: bytes) -> tuple[int, bytes]:
    """(schema_id, payload) from a wire-framed message; ValueError on
    a short or non-magic frame (the dead-letter contract, ST3)."""
    if len(value) < HEADER_LEN:
        raise ValueError(f"frame too short for wire header: {len(value)} bytes")
    magic, schema_id = struct.unpack(">bI", value[:HEADER_LEN])
    if magic != CONFLUENT_MAGIC:
        raise ValueError(f"bad magic byte {magic} (want {CONFLUENT_MAGIC})")
    return schema_id, value[HEADER_LEN:]


def confluent_schema_id(value: Column) -> Column:
    """JVM-side schema-id read from a wire-framed binary column: NULL
    when the frame is short or the magic byte is wrong (so corrupt
    frames route to dead-letter, not to a decode attempt). Pure
    substring arithmetic — codegen'd, no UDF."""
    id_be = F.conv(F.hex(F.substring(value, 2, 4)), 16, 10).cast("long")
    magic = F.hex(F.substring(value, 1, 1))
    return F.when(
        (F.length(value) >= HEADER_LEN) & (magic == f"{CONFLUENT_MAGIC:02X}"),
        id_be,
    )


def with_confluent_header(values: DataFrame, schema_id: int) -> DataFrame:
    """Prepend the 5-byte wire header to a ``value: binary`` column —
    the producer-side frame (S8 with a registry). concat of a binary
    literal with the payload: codegen'd, no UDF."""
    header = F.lit(make_confluent_header(schema_id))
    return values.withColumn("value", F.concat(header, F.col("value")))


class SchemaRegistryClient:
    """Minimal Confluent Schema Registry REST client (driver-side).

    Holds an id→schema cache: ``get_schema`` hits the registry once
    per distinct id per process — the consumer-side contract the
    Confluent client implements (reference `streaming/events.py:81-91`
    constructs exactly this client + serializer pair)."""

    def __init__(self, url: str, *, timeout: float = 10.0) -> None:
        self.url = url.rstrip("/")
        self.timeout = timeout
        self._by_id: dict[int, str] = {}
        self._session = None

    # -- transport ---------------------------------------------------------

    def _http(self):
        if self._session is None:
            import requests

            self._session = requests.Session()
        return self._session

    def _request(self, method: str, path: str, body: dict | None = None) -> Any:
        import requests

        try:
            resp = self._http().request(
                method,
                self.url + path,
                data=None if body is None else json.dumps(body),
                headers={"Content-Type": _CONTENT_TYPE},
                timeout=self.timeout,
            )
        except requests.RequestException as exc:
            raise ExtractError(f"schema registry unreachable: {exc}") from exc
        if resp.status_code >= 400:
            raise ExtractError(
                f"{method} {path} returned {resp.status_code}: {resp.text[:200]}",
                status=resp.status_code,
            )
        return json.loads(resp.text)

    # -- protocol ----------------------------------------------------------

    def register(self, subject: str, schema_str: str) -> int:
        """Register (idempotently) a schema under ``subject``; returns
        the registry-global schema id used in the wire header."""
        out = self._request(
            "POST",
            f"/subjects/{subject}/versions",
            {"schema": schema_str, "schemaType": "AVRO"},
        )
        schema_id = int(out["id"])
        self._by_id.setdefault(schema_id, schema_str)
        return schema_id

    def get_schema(self, schema_id: int) -> str:
        """Schema string for a wire-header id (cached per process)."""
        hit = self._by_id.get(schema_id)
        if hit is not None:
            return hit
        out = self._request("GET", f"/schemas/ids/{schema_id}")
        schema = out["schema"]
        self._by_id[schema_id] = schema
        return schema

    def latest(self, subject: str) -> tuple[int, str]:
        """(id, schema) of the subject's latest registered version."""
        out = self._request("GET", f"/subjects/{subject}/versions/latest")
        schema_id, schema = int(out["id"]), out["schema"]
        self._by_id.setdefault(schema_id, schema)
        return schema_id, schema


# ---------------------------------------------------------------------------
# producer / consumer framing against a live registry (the reference's
# AvroSerializer / AvroDeserializer pair, engine-side)
# ---------------------------------------------------------------------------


def frame_events_for_topic(
    events: DataFrame, client: SchemaRegistryClient, topic: str
) -> tuple[int, DataFrame]:
    """Producer side (reference `streaming/events.py:93-104`
    `get_fetch_event_serializer`): register the FetchEvent schema
    under ``{topic}-value`` (idempotent) and return (schema_id, frames)
    where frames carry registry-framed ``value`` bytes — 5-byte header
    + Avro body. ONE registry call per produce job; all per-event work
    is the existing Avro encode + a JVM-side concat."""
    from meteo_etl_spark.schemas import FETCH_EVENT_AVRO_SCHEMA
    from meteo_etl_spark.streaming.events import to_avro_value

    schema_id = client.register(subject_for_topic(topic), FETCH_EVENT_AVRO_SCHEMA)
    return schema_id, with_confluent_header(to_avro_value(events), schema_id)


def decode_registry_frames(
    raw: DataFrame, client: SchemaRegistryClient, topic: str
) -> DataFrame:
    """Consumer side: resolve the topic's subject against the registry
    ONCE (driver-side, cached), then decode each frame's body only
    when its header id matches a registered version of the FetchEvent
    schema — frames with unknown ids, bad magic, or short headers keep
    a NULL event and flow to dead-letter (ST3), exactly the Confluent
    deserializer's contract. Column-level id check (codegen'd), Avro
    decode through the engine codec."""
    import json as _json

    from meteo_etl_spark.schemas import FETCH_EVENT_AVRO_SCHEMA
    from meteo_etl_spark.streaming.avro_codec import decode_avro_values

    sid, schema = client.latest(subject_for_topic(topic))
    if _json.loads(schema) != _json.loads(FETCH_EVENT_AVRO_SCHEMA):
        raise ValueError(
            f"registry subject {subject_for_topic(topic)!r} latest schema"
            f" (id {sid}) is not the FetchEvent schema this consumer reads"
        )
    known = raw.filter(confluent_schema_id(F.col("value")) == sid)
    unknown = raw.filter(
        confluent_schema_id(F.col("value")).isNull()
        | (confluent_schema_id(F.col("value")) != sid)
    )
    decoded = decode_avro_values(known, confluent_header=True)
    dead = unknown.select(
        F.lit(None).cast(decoded.schema["event"].dataType).alias("event"),
        F.col("value").alias("raw_value"),
    )
    return decoded.unionByName(dead)

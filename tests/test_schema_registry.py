"""Schema Registry client + Confluent wire format (S5/S8 registry
parity, reference `streaming/events.py:81-91`): register/fetch against
a live mocked REST server, id caching, and the header id <-> registry
id round-trip through the engine's own Avro codec and the JVM-side
column helpers."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from meteo_etl_spark.errors import ExtractError
from meteo_etl_spark.schemas import FETCH_EVENT_AVRO_SCHEMA
from meteo_etl_spark.streaming import registry as reg


class _FakeRegistry(BaseHTTPRequestHandler):
    """In-memory Confluent Schema Registry: subjects -> versions, a
    global id sequence, idempotent re-registration."""

    store: dict[str, list[tuple[int, str]]] = {}
    by_id: dict[int, str] = {}
    next_id = [7]  # registry-global, deliberately not starting at 1
    requests_seen: list[str] = []

    def log_message(self, *a):  # quiet
        pass

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        self.requests_seen.append(f"POST {self.path}")
        subject = self.path.split("/")[2]
        n = int(self.headers["Content-Length"])
        schema = json.loads(self.rfile.read(n))["schema"]
        versions = self.store.setdefault(subject, [])
        for sid, s in versions:
            if s == schema:  # idempotent re-register
                return self._json(200, {"id": sid})
        sid = self.next_id[0]
        self.next_id[0] += 1
        versions.append((sid, schema))
        self.by_id[sid] = schema
        self._json(200, {"id": sid})

    def do_GET(self):
        self.requests_seen.append(f"GET {self.path}")
        parts = self.path.strip("/").split("/")
        if parts[0] == "schemas":  # /schemas/ids/{id}
            sid = int(parts[2])
            if sid not in self.by_id:
                return self._json(404, {"error_code": 40403, "message": "not found"})
            return self._json(200, {"schema": self.by_id[sid]})
        # /subjects/{s}/versions/latest
        subject = parts[1]
        versions = self.store.get(subject)
        if not versions:
            return self._json(404, {"error_code": 40401, "message": "not found"})
        sid, schema = versions[-1]
        return self._json(
            200,
            {"id": sid, "schema": schema, "subject": subject, "version": len(versions)},
        )


@pytest.fixture()
def registry_url():
    _FakeRegistry.store = {}
    _FakeRegistry.by_id = {}
    _FakeRegistry.next_id = [7]
    _FakeRegistry.requests_seen = []
    srv = HTTPServer(("127.0.0.1", 0), _FakeRegistry)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}"
    finally:
        srv.shutdown()


def test_register_fetch_latest_and_cache(registry_url):
    client = reg.SchemaRegistryClient(registry_url)
    subject = reg.subject_for_topic("fetch-events")
    assert subject == "fetch-events-value"

    sid = client.register(subject, FETCH_EVENT_AVRO_SCHEMA)
    assert sid == 7
    # idempotent: same schema, same id; a changed schema gets a new id
    assert client.register(subject, FETCH_EVENT_AVRO_SCHEMA) == sid
    sid2 = client.register(subject, '{"type": "string"}')
    assert sid2 == sid + 1
    assert client.latest(subject) == (sid2, '{"type": "string"}')

    # id->schema cache: the fresh-client fetch hits HTTP once, then never
    reader = reg.SchemaRegistryClient(registry_url)
    before = len(_FakeRegistry.requests_seen)
    assert json.loads(reader.get_schema(sid)) == json.loads(FETCH_EVENT_AVRO_SCHEMA)
    assert reader.get_schema(sid) is not None
    assert reader.get_schema(sid) is not None
    after = [r for r in _FakeRegistry.requests_seen[before:] if "schemas/ids" in r]
    assert len(after) == 1

    missing = reg.SchemaRegistryClient(registry_url)
    with pytest.raises(ExtractError):
        missing.get_schema(99999)


def test_wire_header_roundtrip_driver_side():
    hdr = reg.make_confluent_header(7)
    assert hdr == b"\x00\x00\x00\x00\x07" and len(hdr) == reg.HEADER_LEN
    sid, payload = reg.parse_confluent_header(hdr + b"avro-bytes")
    assert (sid, payload) == (7, b"avro-bytes")
    with pytest.raises(ValueError, match="magic"):
        reg.parse_confluent_header(b"\x01\x00\x00\x00\x07rest")
    with pytest.raises(ValueError, match="short"):
        reg.parse_confluent_header(b"\x00\x00")
    with pytest.raises(ValueError):
        reg.make_confluent_header(-1)


def test_header_id_roundtrips_through_registry_and_spark(spark, registry_url):
    """The full producer->consumer id contract: register, frame a real
    Avro message with the returned id, read the id back JVM-side,
    resolve the schema from the registry, decode the payload."""
    from pyspark.sql import functions as F

    from meteo_etl_spark.streaming.avro_codec import (
        decode_avro_values,
        encode_fetch_event,
    )

    client = reg.SchemaRegistryClient(registry_url)
    sid = client.register(
        reg.subject_for_topic("fetch-events"), FETCH_EVENT_AVRO_SCHEMA
    )

    event = {
        "fetch_id": "f-1",
        "source": "open-meteo",
        "status": "success",
        "path": "/bronze/x",
        "params": {"lat": "52.5"},
        "finished_at": 1718000000000,
    }
    framed = reg.make_confluent_header(sid) + encode_fetch_event(event)
    df = spark.createDataFrame(
        [(framed,), (b"\x01junk",), (b"\x00\x00",)], "value binary"
    )

    ids = df.select(reg.confluent_schema_id(F.col("value")).alias("sid")).collect()
    assert [r.sid for r in ids] == [sid, None, None]

    # consumer resolves the header id to the registered schema...
    schema = reg.SchemaRegistryClient(registry_url).get_schema(sid)
    assert json.loads(schema) == json.loads(FETCH_EVENT_AVRO_SCHEMA)
    # ...and the stripped payload decodes to the produced event
    good = df.filter(reg.confluent_schema_id(F.col("value")).isNotNull())
    decoded = decode_avro_values(good, confluent_header=True).collect()
    assert len(decoded) == 1 and decoded[0].event.fetch_id == "f-1"

    # producer-side framing helper is byte-identical to the driver twin
    payload_df = spark.createDataFrame(
        [(encode_fetch_event(event),)], "value binary"
    )
    framed_jvm = reg.with_confluent_header(payload_df, sid).collect()[0].value
    assert bytes(framed_jvm) == framed


def test_registry_framed_produce_consume_round_trip(spark, registry_url):
    """The serializer/deserializer pair end-to-end: events framed for a
    topic through a live registry decode back through the same
    registry; frames with a foreign schema id dead-letter (null event)
    instead of decoding."""
    from meteo_etl_spark.schemas import FETCH_EVENT_SCHEMA

    client = reg.SchemaRegistryClient(registry_url)
    events = spark.createDataFrame(
        [
            ("a", "open-meteo", "success", "/p1", {"q": "1"}, 1718000000000),
            ("b", "met.no", "error", None, {}, 1718000001000),
        ],
        schema=FETCH_EVENT_SCHEMA,
    )
    sid, frames = reg.frame_events_for_topic(events, client, "fetch-events")
    collected = [bytes(r.value) for r in frames.collect()]
    assert all(v[:5] == reg.make_confluent_header(sid) for v in collected)

    # a foreign producer registers a different schema -> different id
    foreign_id = client.register("other-value", '{"type": "string"}')
    assert foreign_id != sid
    foreign = reg.make_confluent_header(foreign_id) + b"\x02x"

    raw = spark.createDataFrame([(v,) for v in collected] + [(foreign,)],
                                "value binary")
    out = reg.decode_registry_frames(
        raw, reg.SchemaRegistryClient(registry_url), "fetch-events"
    ).collect()
    got = {bytes(r.raw_value): r.event for r in out}
    assert got[foreign] is None  # unknown id -> dead-letter
    decoded_ids = sorted(
        e.fetch_id for v, e in got.items() if e is not None
    )
    assert decoded_ids == ["a", "b"]

    # consumer refuses a subject whose latest schema isn't FetchEvent
    with pytest.raises(ValueError, match="not the FetchEvent schema"):
        reg.decode_registry_frames(
            raw, reg.SchemaRegistryClient(registry_url), "other"
        )

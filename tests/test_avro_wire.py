"""S5/S8 Avro wire format on REAL Avro bytes, without the spark-avro
datasource: the engine codec (streaming/avro_codec.py) is validated
byte-for-byte against the reference Java implementation (avro-core
1.12, shipped inside pyspark's JVM) in both directions, then driven
end-to-end through Spark — encode, Confluent 5-byte header, JVM-side
strip, Arrow-batched decode, dead-letter on corrupt bytes.

Reference parity: `streaming/schemas/fetch_event.avsc`,
`streaming/events.py:81-95`, `streaming/consumer.py:19-24`.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.schemas import FETCH_EVENT_AVRO_SCHEMA, FETCH_EVENT_SCHEMA
from meteo_etl_spark.streaming.avro_codec import (
    decode_fetch_event,
    encode_fetch_event,
)
from meteo_etl_spark.streaming.events import from_avro_value, to_avro_value

EVENT = {
    "fetch_id": "f-123",
    "source": "https://api.example.com/v1/forecast",
    "status": "success",
    "path": "/data/bronze/2024-01-01/f-123.json",
    "params": {"latitude": "52.52", "longitude": "13.41"},
    "finished_at": 1704067200123,
}

EVENT_NULL_PATH = {**EVENT, "fetch_id": "f-456", "path": None, "params": {}}


def test_python_roundtrip():
    for ev in (EVENT, EVENT_NULL_PATH):
        assert decode_fetch_event(encode_fetch_event(ev)) == ev


def _java_schema(spark):
    return spark._jvm.org.apache.avro.Schema.Parser().parse(FETCH_EVENT_AVRO_SCHEMA)


def _java_encode(spark, ev) -> bytes:
    jvm = spark._jvm
    sch = _java_schema(spark)
    rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
    rec.put("fetch_id", ev["fetch_id"])
    rec.put("source", ev["source"])
    rec.put(
        "status",
        jvm.org.apache.avro.generic.GenericData.EnumSymbol(
            sch.getField("status").schema(), ev["status"]
        ),
    )
    rec.put("path", ev["path"])
    params = jvm.java.util.LinkedHashMap()
    for k, v in ev["params"].items():
        params.put(k, v)
    rec.put("params", params)
    rec.put("finished_at", ev["finished_at"])
    out = jvm.java.io.ByteArrayOutputStream()
    enc = jvm.org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, None)
    jvm.org.apache.avro.generic.GenericDatumWriter(sch).write(rec, enc)
    enc.flush()
    return bytes(out.toByteArray())


def _java_decode(spark, raw: bytes) -> dict:
    jvm = spark._jvm
    sch = _java_schema(spark)
    dec = jvm.org.apache.avro.io.DecoderFactory.get().binaryDecoder(
        bytearray(raw), None
    )
    rec = jvm.org.apache.avro.generic.GenericDatumReader(sch).read(None, dec)
    path = rec.get("path")
    params = {}
    it = rec.get("params").entrySet().iterator()
    while it.hasNext():
        e = it.next()
        params[str(e.getKey())] = str(e.getValue())
    return {
        "fetch_id": str(rec.get("fetch_id")),
        "source": str(rec.get("source")),
        "status": str(rec.get("status")),
        "path": None if path is None else str(path),
        "params": params,
        "finished_at": rec.get("finished_at"),
    }


def test_codec_matches_java_reference_both_directions(spark):
    for ev in (EVENT, EVENT_NULL_PATH):
        java_bytes = _java_encode(spark, ev)
        # Java-encoded bytes decode with the engine codec...
        assert decode_fetch_event(java_bytes) == ev
        # ...and engine-encoded bytes decode with Java. (Byte equality
        # also holds here: one map block, same field order.)
        py_bytes = encode_fetch_event(ev)
        assert _java_decode(spark, py_bytes) == ev
        assert py_bytes == java_bytes


def test_spark_e2e_confluent_header_strip_and_decode(spark):
    events = spark.createDataFrame(
        [tuple(ev[f.name] for f in FETCH_EVENT_SCHEMA.fields) for ev in (EVENT, EVENT_NULL_PATH)],
        schema=FETCH_EVENT_SCHEMA,
    )
    header = bytes([0x00, 0x00, 0x00, 0x00, 0x07])  # magic + schema id 7
    wire = to_avro_value(events).select(
        F.concat(F.lit(header), F.col("value")).alias("value")
    )
    decoded = from_avro_value(wire, confluent_header=True)
    rows = {r.event.fetch_id: r for r in decoded.collect()}
    assert set(rows) == {"f-123", "f-456"}
    for ev in (EVENT, EVENT_NULL_PATH):
        got = rows[ev["fetch_id"]].event.asDict(recursive=True)
        assert got == ev
        # raw_value retains the header (audit/dead-letter fidelity)
        assert bytes(rows[ev["fetch_id"]].raw_value)[:5] == header


def test_spark_decode_dead_letters_corrupt_bytes(spark):
    good = encode_fetch_event(EVENT)
    wire = spark.createDataFrame(
        [(good,), (b"\x02garbage-not-avro",)], "value binary"
    )
    decoded = from_avro_value(wire)
    got = {bytes(r.raw_value): r.event for r in decoded.collect()}
    assert got[good].fetch_id == EVENT["fetch_id"]
    assert got[b"\x02garbage-not-avro"] is None

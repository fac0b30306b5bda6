"""Pure-Python Avro binary codec for the ``FetchEvent`` wire record.

The spark-avro DATASOURCE (``from_avro``/``to_avro``) is an external
module and is not on this runtime's classpath, but the wire format
itself is a fixed, public spec (Avro 1.12 binary encoding: zigzag
varints, length-prefixed utf-8, union-by-index, map blocks). For one
known record schema a codec is ~80 lines, so the engine carries its
own and the S5/S8 surface works with or without the jar:

- ``encode_fetch_event`` / ``decode_fetch_event`` — driver-side
  single-record codec (fixtures, tests, control-plane rows);
- ``decode_avro_values`` — Arrow-batched ``mapInPandas`` decode of a
  ``value: binary`` column: the streaming wire path when the jar is
  absent (``events.from_avro_value`` routes here automatically). The
  per-batch Python cost is bounded by Kafka micro-batch size, and the
  moment the spark-avro jar is added the same call sites switch to
  the JVM ``from_avro`` with no schema change.

The byte format is validated in tests against the REFERENCE Java
implementation (avro-1.12 core, which pyspark ships) both directions:
Java-encoded bytes decode here; bytes encoded here decode in Java.

Reference parity: `streaming/schemas/fetch_event.avsc:1-26`,
`streaming/consumer.py:19-24` (Confluent 5-byte header strip),
`streaming/events.py:81-95`.
"""

from __future__ import annotations

import io
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meteo_etl_spark.schemas import FETCH_EVENT_SCHEMA, FETCH_STATUSES

# Field order is the Avro schema's field order (schemas.py
# FETCH_EVENT_AVRO_SCHEMA): fetch_id, source, status, path, params,
# finished_at.

# ---------------------------------------------------------------------------
# primitives (Avro 1.12 binary spec)
# ---------------------------------------------------------------------------


def _write_long(out: io.BytesIO, n: int) -> None:
    """zigzag + base-128 varint (little-endian 7-bit groups)."""
    n = (n << 1) ^ (n >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise ValueError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")
    return (acc >> 1) ^ -(acc & 1)


def _write_string(out: io.BytesIO, s: str) -> None:
    raw = s.encode("utf-8")
    _write_long(out, len(raw))
    out.write(raw)


def _read_string(buf: io.BytesIO) -> str:
    n = _read_long(buf)
    if n < 0:
        raise ValueError(f"negative string length {n}")
    # Bound against what is actually left: a corrupt varint can decode
    # to ~2**62, and buf.read(n) would raise OverflowError (not the
    # contracted ValueError) before the length-mismatch check runs.
    remaining = len(buf.getbuffer()) - buf.tell()
    if n > remaining:
        raise ValueError(f"string length {n} exceeds remaining {remaining} bytes")
    raw = buf.read(n)
    if len(raw) != n:
        raise ValueError("truncated string")
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError as exc:
        raise ValueError(f"invalid utf-8 string: {exc}") from None


# ---------------------------------------------------------------------------
# FetchEvent record
# ---------------------------------------------------------------------------


def encode_fetch_event(event: dict[str, Any]) -> bytes:
    """dict (FETCH_EVENT_SCHEMA field names) → Avro binary bytes."""
    out = io.BytesIO()
    _write_string(out, event["fetch_id"])
    _write_string(out, event["source"])
    out_status = event["status"]
    try:
        _write_long(out, FETCH_STATUSES.index(out_status))  # enum index
    except ValueError:
        raise ValueError(f"status {out_status!r} not in {FETCH_STATUSES}") from None
    path = event.get("path")
    if path is None:
        _write_long(out, 0)  # union branch: null
    else:
        _write_long(out, 1)  # union branch: string
        _write_string(out, path)
    params = event.get("params") or {}
    if params:
        _write_long(out, len(params))  # one block
        for k, v in params.items():
            _write_string(out, k)
            _write_string(out, v)
    _write_long(out, 0)  # map terminator
    _write_long(out, event["finished_at"])
    return out.getvalue()


def decode_fetch_event(value: bytes) -> dict[str, Any]:
    """Avro binary bytes → dict; raises ValueError on corrupt input."""
    buf = io.BytesIO(value)
    fetch_id = _read_string(buf)
    source = _read_string(buf)
    status_idx = _read_long(buf)
    if not 0 <= status_idx < len(FETCH_STATUSES):
        raise ValueError(f"enum index {status_idx} out of range")
    status = FETCH_STATUSES[status_idx]
    branch = _read_long(buf)
    if branch == 0:
        path = None
    elif branch == 1:
        path = _read_string(buf)
    else:
        raise ValueError(f"union branch {branch} out of range")
    params: dict[str, str] = {}
    while True:
        count = _read_long(buf)
        if count == 0:
            break
        if count < 0:  # block with byte-size prefix (legal writer variant)
            count = -count
            _read_long(buf)
        for _ in range(count):
            k = _read_string(buf)
            params[k] = _read_string(buf)
    finished_at = _read_long(buf)
    if buf.read(1):
        raise ValueError("trailing bytes after record")
    return {
        "fetch_id": fetch_id,
        "source": source,
        "status": status,
        "path": path,
        "params": params,
        "finished_at": finished_at,
    }


# ---------------------------------------------------------------------------
# DataFrame surface (jar-free S5 wire path)
# ---------------------------------------------------------------------------

_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("event", FETCH_EVENT_SCHEMA, True),
        T.StructField("raw_value", T.BinaryType(), True),
    ]
)


def decode_avro_values(raw: DataFrame, *, confluent_header: bool = False) -> DataFrame:
    """``value: binary`` → (event struct, raw value), Arrow-batched.

    PERMISSIVE like the JVM ``from_avro``: a corrupt value yields a
    null ``event`` so callers dead-letter it (ST3). The Confluent
    header strip runs JVM-side (a substring, codegen'd) BEFORE the
    Python stage so the Python batch only sees plain Avro."""
    payload = F.col("value")
    if confluent_header:
        from meteo_etl_spark.streaming.events import strip_confluent_header

        payload = strip_confluent_header(payload)
    stripped = raw.select(
        payload.alias("payload"), F.col("value").alias("raw_value")
    )

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            events = []
            for v in pdf["payload"]:
                try:
                    events.append(decode_fetch_event(bytes(v)))
                except Exception:
                    events.append(None)
            yield pd.DataFrame({"event": events, "raw_value": pdf["raw_value"]})

    return stripped.mapInPandas(decode, schema=_DECODED_SCHEMA)


def encode_avro_values(events: DataFrame) -> DataFrame:
    """Event rows → header-free Avro ``value`` bytes, Arrow-batched
    (jar-free S8 path; the JVM ``to_avro`` twin is byte-identical —
    validated against Java avro-core in tests)."""
    cols = [f.name for f in FETCH_EVENT_SCHEMA.fields]

    def encode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            vals = []
            for row in pdf.to_dict("records"):
                row["finished_at"] = int(row["finished_at"])
                vals.append(encode_fetch_event(row))
            yield pd.DataFrame({"value": vals})

    return events.select(*cols).mapInPandas(
        encode, schema=T.StructType([T.StructField("value", T.BinaryType())])
    )

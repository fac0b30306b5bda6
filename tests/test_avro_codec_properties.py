"""Property-based tests for the hand-rolled Avro binary codec
(streaming/avro_codec.py): round-trip identity over the full value
domain — unicode strings, empty/large maps, negative and 2^62-scale
longs, null/present union branches. Pure driver-side (no Spark
session), so hypothesis can run hundreds of examples cheaply."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from meteo_etl_spark.schemas import FETCH_STATUSES
from meteo_etl_spark.streaming.avro_codec import (
    decode_fetch_event,
    encode_fetch_event,
)

_text = st.text(min_size=0, max_size=200)

_event = st.fixed_dictionaries(
    {
        "fetch_id": _text,
        "source": _text,
        "status": st.sampled_from(FETCH_STATUSES),
        "path": st.one_of(st.none(), _text),
        "params": st.dictionaries(_text, _text, max_size=8),
        "finished_at": st.integers(min_value=-(2**62), max_value=2**62),
    }
)


@settings(max_examples=300, deadline=None)
@given(_event)
def test_roundtrip_identity(ev):
    assert decode_fetch_event(encode_fetch_event(ev)) == ev


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_corrupt_bytes_never_crash_harder_than_valueerror(raw):
    """Arbitrary bytes either decode to SOME event dict or raise
    ValueError/UnicodeDecodeError — never an unbounded allocation or a
    different exception class (the dead-letter contract)."""
    try:
        out = decode_fetch_event(raw)
    except (ValueError, UnicodeDecodeError):
        return
    assert set(out) == {"fetch_id", "source", "status", "path", "params", "finished_at"}


@settings(max_examples=100, deadline=None)
@given(_event)
def test_encoding_is_deterministic_and_prefix_free_on_status(ev):
    a = encode_fetch_event(ev)
    assert a == encode_fetch_event(ev)
    # flipping the status changes the bytes (enum index is encoded)
    other = {**ev, "status": FETCH_STATUSES[(FETCH_STATUSES.index(ev["status"]) + 1) % 3]}
    assert encode_fetch_event(other) != a

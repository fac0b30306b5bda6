"""Token-window chunking (packing.chunk_token_windows) — coverage and
overlap properties the oracle's hash equality can't articulate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.functions import packing as pk


def _chunks(spark, text, width=8, stride=6):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = pk.chunk_token_windows(df, width=width, stride=stride).collect()
    return sorted((r.chunk_id, r.n_tokens) for r in out)


def test_short_doc_is_single_full_chunk(spark):
    got = _chunks(spark, "a b c", width=8, stride=6)
    assert got == [(0, 3)]


def test_exact_width_doc_is_one_chunk(spark):
    got = _chunks(spark, " ".join("t%d" % i for i in range(8)), width=8, stride=6)
    assert got == [(0, 8)]


def test_long_doc_windows_cover_every_token_with_overlap(spark):
    n, width, stride = 20, 8, 6
    got = _chunks(spark, " ".join("t%d" % i for i in range(n)), width, stride)
    # chunk i spans tokens [i*stride, i*stride + len); union must cover [0, n)
    covered = set()
    for cid, ln in got:
        covered |= set(range(cid * stride, cid * stride + ln))
    assert covered == set(range(n))
    # ceil((20-8)/6)+1 = 3 chunks; the last one is the 2-token tail
    assert got == [(0, 8), (1, 8), (2, 8)]


def test_tail_shorter_than_width(spark):
    # 21 tokens: chunks at 0,6,12,18 -> last has 3 tokens
    got = _chunks(spark, " ".join("t%d" % i for i in range(21)), 8, 6)
    assert got == [(0, 8), (1, 8), (2, 8), (3, 3)]


def test_bad_stride_raises(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pk.chunk_token_windows(df, width=4, stride=5)


def test_chunk_hash_feeds_exact_dedup(spark):
    # identical windows from different docs share a hash
    df = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z"), (3, "x y q")],
        "doc_id long, text string",
    )
    out = pk.chunk_token_windows(df, width=4, stride=3).collect()
    hashes = {r.doc_id: r.chunk_hash for r in out}
    assert hashes[1] == hashes[2] != hashes[3]

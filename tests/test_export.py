"""Export sinks: JSONL shard sizing + round-trip, and the global
total order of the range-partitioned export (file k's keys all below
file k+1's, each file internally sorted — asserted on disk, plus the
rangepartitioning Exchange asserted in-plan)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from meteo_etl_spark.sources.export import export_jsonl, export_ordered
from tests.conftest import SF_SMALL


def _data_files(path, suffix):
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(suffix)
    )


def test_export_jsonl_roundtrip_and_shard_sizing(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = str(tmp_path / "shards")
    n = export_jsonl(docs, out, rows_per_shard=100)
    total = docs.count()
    assert n == -(-total // 100)
    files = _data_files(out, ".json")
    assert len(files) == n
    # near-uniform shards (round-robin): max/min within 2x
    sizes = [sum(1 for _ in open(f)) for f in files]
    assert max(sizes) <= 2 * max(1, min(sizes))
    back = spark.read.json(out)
    assert back.count() == total
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }
    # every line is a standalone JSON object
    first = json.loads(open(files[0]).readline())
    assert "doc_id" in first


def test_export_ordered_is_globally_sorted_across_files(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    out = str(tmp_path / "ordered")

    plan_df = orders.repartitionByRange(4, "o_orderkey")
    assert "rangepartitioning" in (
        plan_df._jdf.queryExecution().executedPlan().toString().lower()
    )

    export_ordered(orders, out, ["o_orderkey"], num_files=4)
    files = _data_files(out, ".parquet")
    assert len(files) == 4

    prev_max = None
    total = 0
    for f in files:  # part files sort lexically = range order
        keys = [r.o_orderkey for r in spark.read.parquet(f).collect()]
        assert keys == sorted(keys)  # in-file order
        if prev_max is not None and keys:
            assert keys[0] > prev_max  # cross-file order
        if keys:
            prev_max = keys[-1]
        total += len(keys)
    assert total == orders.count()

"""Driver-contract guards: __spark_entry__ surface shape, bench.py's
one-line JSON output, and error paths the driver would trip over."""

from __future__ import annotations

import json

import pytest


def test_entry_contract_shape(spark):
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) >= 30
    # every oracle key is a declared query; rows-only set is the
    # intentional approx twins only
    assert set(oracles) <= set(qs)
    assert set(qs) - set(oracles) == {"q3_approx_distinct", "q5_approx_summary"}
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and "SELECT" in sql.upper() for sql in oracles.values())

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "sum_qty" in df.columns


def test_bench_emits_contract_json(spark, monkeypatch, capsys):
    import bench

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    bench.main()
    out_lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    payload = json.loads(out_lines[-1])  # ONE JSON line
    assert set(payload) == {"metric", "value", "unit", "queries", "sf"}
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    assert len(payload["queries"]) >= 10
    assert all(v >= 0 for v in payload["queries"].values())


def test_publish_unfinished_fetch_raises(spark, warehouse):
    from meteo_etl_spark.errors import LoadError
    from meteo_etl_spark.pipeline import control
    from meteo_etl_spark.streaming.produce import publish_finished_fetch

    fetch_id = control.insert_fetch_metadata(
        spark, warehouse, "https://x.example.com/api"
    )
    with pytest.raises(LoadError, match="no finished"):
        publish_finished_fetch(spark, warehouse, fetch_id, str(warehouse.root) + "/t")

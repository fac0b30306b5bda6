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


def test_correctness_window_composition_is_pinned():
    """The driver hash-checks the FIRST 50 entries of queries(), so the
    window composition is part of the correctness contract. Pin the
    round-4 roster: an accidental registration-order change (imports,
    new @query placement) must fail HERE, not in the driver's ledger.
    Update this list deliberately when rotating (_DEFERRED ledger)."""
    import __spark_entry__ as e

    window = list(e.queries())[:50]
    must_be_in_window = {
        # NTZ-regression trio (restored in round 4)
        "events_sessionize", "events_asof_join", "events_range_join",
        # round-4 rotation readmissions
        "tpch_q2_min_price_supplier", "tpch_q7_nation_volume",
        "tpch_q10_returned_items", "tpch_q13_order_distribution",
        "docs_vocab_topk", "sim_topk_cosine", "corpus_clean",
        # round-5 rotation: the round-4 I/O layer gets its first driver
        # hash check...
        "events_profile", "jdbc_roundtrip_agg", "events_session_window",
        "q15_atomic_merge",
        # ...plus four TPC-H entries that had never been in-window
        "tpch_q11_value_share", "tpch_q15_top_supplier",
        "tpch_q16_supplier_cnt", "tpch_q6_forecast_revenue",
    }
    missing = must_be_in_window - set(window)
    assert not missing, f"window lost contract entries: {sorted(missing)}"
    assert len(window) == len(set(window)) == 50
    # every window entry must be oracle-checkable (hash-grade)
    oracles = e.oracle_sql()
    no_oracle = [n for n in window if n not in oracles]
    assert not no_oracle, f"window entries without oracle SQL: {no_oracle}"

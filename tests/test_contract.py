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
    # intentional non-SQL-expressible entries only: the approx twins,
    # the iterative BPE trainer (driver-side argmax loop), and the PCA
    # spectrum (driver-side eigendecomposition)
    assert set(oracles) <= set(qs)
    assert set(qs) - set(oracles) == {
        "q3_approx_distinct",
        "q5_approx_summary",
        "docs_bpe_merges",
        "emb_pca_variance",
    }
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
    round-7 roster: an accidental registration-order change (imports,
    new @query placement) must fail HERE, not in the driver's ledger.
    Update this list deliberately when rotating (_DEFERRED ledger)."""
    import __spark_entry__ as e

    window = list(e.queries())[:50]  # pinned roster: round-7 rotation
    must_be_in_window = {
        # round-7 rotation: the 26 round-6 newcomers take their first
        # driver hash check (completes at-least-once certification of
        # every pre-round-7 query)...
        "docs_unigram_freq", "dedup_semantic", "events_window_agg",
        "docs_fuzzy_decontaminate", "sim_knn_graph",
        "emb_cluster_prototypes", "docs_mixture_plan", "events_funnel",
        "events_retention", "events_pivot_daily", "events_unpivot_daily",
        "events_user_pagerank", "events_value_deciles",
        "events_user_paths", "events_hourly_full_outer",
        "docs_vocab_setops", "docs_vocab_topp", "events_ohlc",
        "events_anomaly_iqr", "events_interval_join", "basket_part_pairs",
        "events_percent_rank", "events_triangle_count",
        "events_sliding_window", "docs_constraint_audit",
        "orders_rfm_segments",
        # ...plus the round-7 newcomer exercising the large-k
        # broadcast-join centroid assignment
        "dedup_semantic_bigk",
        # round-5/6 holdovers kept for a second consecutive check
        "events_profile", "jdbc_roundtrip_agg", "events_session_window",
        "q15_atomic_merge", "jdbc_upsert_agg",
        "tpch_q21_waiting_supplier", "tpch_q9_product_profit",
        "tpch_q20_excess_supplier",
    }
    missing = must_be_in_window - set(window)
    assert not missing, f"window lost contract entries: {sorted(missing)}"
    assert len(window) == len(set(window)) == 50
    # every window entry must be oracle-checkable (hash-grade)
    oracles = e.oracle_sql()
    no_oracle = [n for n in window if n not in oracles]
    assert not no_oracle, f"window entries without oracle SQL: {no_oracle}"

"""Column profiling (operators/profile) — correctness of the census
and the plan contract of the exact vs HLL paths."""

from __future__ import annotations

import pytest

from meteo_etl_spark.operators.profile import profile


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "a", None), (2, "a", 1.5), (3, None, 1.5), (3, "b", None)],
        "id long, s string, v double",
    )


def test_profile_counts(spark, df):
    got = {r.column: (r.n, r.n_null, r.n_distinct) for r in profile(df).collect()}
    assert got == {
        "id": (4, 0, 3),
        "s": (4, 1, 2),
        "v": (4, 2, 1),
    }


def test_profile_column_subset(spark, df):
    got = profile(df, ["s"]).collect()
    assert [r.column for r in got] == ["s"]


def test_profile_empty_columns_raises(spark, df):
    with pytest.raises(ValueError):
        profile(df, [])


def test_exact_uses_one_scan_and_approx_drops_expand(spark, df):
    """Exact multi-distinct needs Expand (row replication per distinct
    agg); the 100 TB HLL path must plan WITHOUT Expand — one
    partial-aggregated pass, sketch-sized state."""
    exact_plan = profile(df)._jdf.queryExecution().executedPlan().toString()
    approx_plan = (
        profile(df, exact=False)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan
    # HLL estimates are exact at these cardinalities
    got = {r.column: r.n_distinct for r in profile(df, exact=False).collect()}
    assert got == {"id": 3, "s": 2, "v": 1}

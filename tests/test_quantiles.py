"""exact_percentiles: the bracket+refine distributed path must equal
the buffering exact aggregate (and therefore the DuckDB/pandas
linear-interpolation semantics the oracle checks elsewhere)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.operators.quantiles import exact_percentiles
from tests.conftest import SF_SMALL

QS = [0.01, 0.25, 0.5, 0.75, 0.99]


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")


def _reference(df, col, qs):
    row = df.agg(F.percentile(F.col(col), F.array(*[F.lit(q) for q in qs]))).collect()[0]
    return list(row[0])


def test_bracket_path_matches_exact(spark, lineitem):
    # max_slice far below the row count forces the distributed
    # bracket+refine path (the small-column shortcut is skipped).
    got = exact_percentiles(lineitem, "l_extendedprice", QS, max_slice=50)
    exp = _reference(lineitem, "l_extendedprice", QS)
    for g, e, q in zip(got, exp, QS):
        assert math.isclose(g, e, rel_tol=1e-12), (q, g, e)


def test_small_column_shortcut(spark, lineitem):
    got = exact_percentiles(lineitem, "l_extendedprice", QS)  # n < max_slice
    exp = _reference(lineitem, "l_extendedprice", QS)
    for g, e in zip(got, exp):
        assert math.isclose(g, e, rel_tol=1e-12)


def test_empty_column(spark):
    empty = spark.createDataFrame([], "x double")
    assert exact_percentiles(empty, "x", [0.5]) == [None]


def test_duplicate_heavy_column(spark, lineitem):
    """Low-cardinality column: brackets collapse onto repeated values —
    the slice logic must still find both order statistics."""
    got = exact_percentiles(lineitem, "l_quantity", QS, max_slice=2000)
    exp = _reference(lineitem, "l_quantity", QS)
    for g, e in zip(got, exp):
        assert math.isclose(g, e, rel_tol=1e-12)


def test_q5_routes_to_bracket_path_above_threshold(spark, monkeypatch):
    """Above the input-size threshold the q5 plan must carry NO
    percentile aggregate (quartiles arrive as literals from the
    bounded bracket+refine pass) and produce identical values."""
    from meteo_etl_spark.plans import queries as Q

    fn = Q.get("q5_summary_stats").fn
    fast = fn(spark, SF_SMALL).collect()

    monkeypatch.setenv("SPARK_GRAFT_PCT_BUFFER_MAX_BYTES", "0")
    routed_df = fn(spark, SF_SMALL)
    plan = routed_df._jdf.queryExecution().analyzed().toString().lower()
    assert "percentile" not in plan
    assert routed_df.collect() == fast


def test_describe_routes_to_bracket_path(spark, monkeypatch, tmp_path):
    from meteo_etl_spark.pipeline.warehouse import Warehouse
    from meteo_etl_spark.plans import analytics

    wh = Warehouse(str(tmp_path / "wh"))
    df = spark.range(0, 500).select(
        (F.col("id") % 97).cast("double").alias("temperature"),
        (F.col("id") % 13).cast("double").alias("precipitation"),
        (F.col("id") % 29).cast("double").alias("wind_speed"),
    )
    monkeypatch.setattr(analytics, "read_observations", lambda s, w: df)
    fast = {r.measure: r for r in analytics.describe_observations(spark, wh).collect()}
    monkeypatch.setenv("SPARK_GRAFT_PCT_BUFFER_MAX_BYTES", "0")
    routed = analytics.describe_observations(spark, wh)
    plan = routed._jdf.queryExecution().analyzed().toString().lower()
    assert "percentile" not in plan
    for r in routed.collect():
        f = fast[r.measure]
        for k in ("count", "mean", "std", "min", "p25", "p50", "p75", "max"):
            assert math.isclose(r[k], f[k], rel_tol=1e-12), (r.measure, k)


def test_nearest_rank_bracket_matches_sorted_truth(spark, lineitem):
    """exact_nearest_rank (bracket path forced) must return the exact
    order statistics a full sort would — the emb_hygiene_audit decile
    contract after the r13 single-partition-WindowExec fix."""
    from meteo_etl_spark.operators.quantiles import exact_nearest_rank

    vals = sorted(
        r.v for r in lineitem.select(
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("v")
        ).collect()
    )
    n = len(vals)
    ranks = [1] + [(d * n + 9) // 10 for d in range(1, 11)]
    ints = lineitem.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v")
    )
    got = exact_nearest_rank(ints, "v", ranks, max_slice=50)
    assert got == [vals[r - 1] for r in ranks]
    # passing a precomputed n must not change the answer
    assert exact_nearest_rank(ints, "v", ranks, n=n, max_slice=50) == got


def test_nearest_rank_small_column_and_duplicates(spark, lineitem):
    from meteo_etl_spark.operators.quantiles import exact_nearest_rank

    ints = lineitem.select(F.col("l_quantity").cast("long").alias("v"))
    vals = sorted(r.v for r in ints.collect())
    n = len(vals)
    ranks = [1, n // 2, n]
    # small-column shortcut (default max_slice) and the bracket path on
    # a duplicate-heavy column must agree with the sorted truth
    assert exact_nearest_rank(ints, "v", ranks) == [vals[r - 1] for r in ranks]
    assert exact_nearest_rank(ints, "v", ranks, max_slice=2000) == [
        vals[r - 1] for r in ranks
    ]


def test_nearest_rank_bounds_and_empty(spark):
    from meteo_etl_spark.operators.quantiles import exact_nearest_rank

    empty = spark.createDataFrame([], "x long")
    assert exact_nearest_rank(empty, "x", [1, 5]) == [None, None]
    one = spark.createDataFrame([(7,)], "x long")
    assert exact_nearest_rank(one, "x", [1]) == [7]
    with pytest.raises(ValueError, match="out of bounds"):
        exact_nearest_rank(one, "x", [2])


# ---------------------------------------------------------------------------
# exact_percentiles_intkey (r15 opt): histogram selection for integer
# keys must be BIT-identical to F.percentile — same double
# interpolation, zero tolerance.
# ---------------------------------------------------------------------------


def _intkey_reference(df, col, qs):
    row = df.agg(
        F.percentile(F.col(col), F.array(*[F.lit(q) for q in qs]))
    ).collect()[0]
    return list(row[0])


def test_intkey_bit_identical_on_pe4(spark, lineitem):
    """The q5 shape: cents*100 of l_extendedprice. == comparison —
    interpolation parity is exact, not approximate."""
    from meteo_etl_spark.operators.quantiles import exact_percentiles_intkey

    ints = lineitem.select(
        (F.round(F.col("l_extendedprice") * 100).cast("long") * 100).alias("pe4")
    )
    got = exact_percentiles_intkey(ints, "pe4", QS)
    assert got == _intkey_reference(ints, "pe4", QS)


def test_intkey_bit_identical_random_qs_and_negatives(spark):
    """Adversarial percentages (irrational positions) over a column
    spanning negatives — the driver-side interpolation must replay
    Spark's Percentile.getPercentile double arithmetic exactly."""
    import random

    from meteo_etl_spark.operators.quantiles import exact_percentiles_intkey

    rng = random.Random(0xC0FFEE)
    vals = [rng.randint(-(10**12), 10**12) for _ in range(5_000)] + [
        rng.randint(-5, 5) for _ in range(5_000)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    qs = [0.0, 1.0] + [rng.random() for _ in range(9)]
    got = exact_percentiles_intkey(df, "v", qs)
    assert got == _intkey_reference(df, "v", qs)


def test_intkey_duplicate_heavy_small_range(spark, lineitem):
    """l_quantity as integers: 50 distinct values — every cell width
    collapses to 1 on the first refinement."""
    from meteo_etl_spark.operators.quantiles import exact_percentiles_intkey

    ints = lineitem.select(F.col("l_quantity").cast("long").alias("q"))
    got = exact_percentiles_intkey(ints, "q", QS)
    assert got == _intkey_reference(ints, "q", QS)


def test_intkey_nulls_empty_and_dtype_contract(spark):
    from meteo_etl_spark.operators.quantiles import exact_percentiles_intkey

    empty = spark.createDataFrame([], "v bigint")
    assert exact_percentiles_intkey(empty, "v", [0.5]) == [None]
    nulls = spark.createDataFrame([(None,), (7,), (9,)], "v bigint")
    assert exact_percentiles_intkey(nulls, "v", [0.5]) == _intkey_reference(
        nulls, "v", [0.5]
    )
    dbl = spark.createDataFrame([(1.5,)], "v double")
    with pytest.raises(ValueError, match="integral column"):
        exact_percentiles_intkey(dbl, "v", [0.5])
    one = spark.createDataFrame([(42,)], "v bigint")
    with pytest.raises(ValueError, match=r"within \[0, 1\]"):
        exact_percentiles_intkey(one, "v", [1.5])


def test_intkey_tiny_buckets_forces_deep_refinement(spark):
    """n_buckets=2 forces ~log2(range) refinement levels — the range
    walk, below-count bookkeeping and singleton shortcut all exercise."""
    from meteo_etl_spark.operators.quantiles import exact_percentiles_intkey

    vals = [0, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 10**9, -(10**9)]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    got = exact_percentiles_intkey(df, "v", QS, n_buckets=2)
    assert got == _intkey_reference(df, "v", QS)

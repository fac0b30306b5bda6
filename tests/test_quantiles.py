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

"""Every declared query hash-matches the DuckDB oracle (the t2 gate,
run locally at sf0.001 for speed; the driver re-runs at sf0.01)."""

from __future__ import annotations

import pytest

from meteo_etl_spark.plans import queries
from tests.conftest import SF_SMALL
from tests.oracle import compare, duckdb_connection

SPECS = list(queries.all_queries().values())


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_connection(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spark, oracle_con, spec):
    df = spec.fn(spark, SF_SMALL)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only smoke for non-SQL-expressible ops
        return
    expected = oracle_con.execute(spec.oracle).df()
    compare(df, expected, name=spec.name)

"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (TPC-H-Q1-shaped pricing summary)
  on /root/testdata/sf0.001.
- ``queries()`` — one entry per implemented operator (SURVEY.md §2,
  declared in meteo_etl_spark.plans.queries).
- ``oracle_sql()`` — the DuckDB-equivalent SQL per query; omitted only
  for genuinely non-SQL-expressible ops (those get rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from meteo_etl_spark.plans import queries as _q

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.get("tpch_q1_pricing_summary").fn(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _q.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (same column aliases)."""
    return {
        name: spec.oracle
        for name, spec in _q.all_queries().items()
        if spec.oracle is not None
    }

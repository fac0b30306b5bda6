"""Constraint-audit operator unit guards (the oracle-checked surface
is the driver's `docs_constraint_audit` query; these pin the
programmatic-API edges the oracle can't express)."""

from __future__ import annotations

import pytest

from meteo_etl_spark.operators import constraints as C


def test_audit_reports_pass_and_fail(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "id long, s string"
    )
    rep = {
        r.constraint + ":" + r.column: (r.violations, r.passed)
        for r in C.audit(
            df, [C.not_null("id"), C.not_null("s"), C.unique("id")]
        ).collect()
    }
    assert rep["not_null:id"] == (0, True)
    assert rep["not_null:s"] == (1, False)
    assert rep["unique:id"] == (0, True)


def test_audit_empty_constraint_list_raises(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="at least one constraint"):
        C.audit(df, [])

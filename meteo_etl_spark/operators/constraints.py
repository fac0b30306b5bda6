"""Declarative data-quality constraint audit (Deequ/Great-Expectations
class): declare per-column expectations, get a one-pass audit report.

A training-data pipeline gates every ingest and every release on
constraint checks — completeness (non-null), uniqueness of keys,
value domains, ranges, row counts. The scale-correct execution is ONE
aggregate pass computing every constraint's violation count together
(map-side partials, a single reduce), never one job per constraint;
uniqueness folds into the same pass as ``count - count_distinct``.

Output: one row per constraint —
``(constraint, column, violations, passed)`` — the machine-readable
gate a release job asserts on.

Reference parity: the reference's only validation is per-row status
CHECKs (SURVEY.md P4/P5); this generalizes it to the declarative
audit surface the LLM-pipeline mandate needs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One expectation: ``name`` labels the rule, ``column`` the
    subject, ``violation`` a Column counting offending rows (built by
    the constructors below)."""

    name: str
    column: str
    violation: Column


def not_null(col: str) -> Constraint:
    return Constraint("not_null", col, F.count(F.when(F.col(col).isNull(), 1)))


def unique(col: str) -> Constraint:
    """Duplicate count: rows beyond the first per value (NULLs ignored
    by count_distinct on both engines)."""
    return Constraint(
        "unique",
        col,
        F.count(col) - F.countDistinct(col),
    )


def in_range(col: str, lo: float, hi: float) -> Constraint:
    return Constraint(
        f"in_range[{lo},{hi}]",
        col,
        F.count(F.when((F.col(col) < lo) | (F.col(col) > hi), 1)),
    )


def in_domain(col: str, values: list[str]) -> Constraint:
    return Constraint(
        "in_domain",
        col,
        F.count(F.when(~F.col(col).isin(values), 1)),
    )


def matches(col: str, pattern: str) -> Constraint:
    """Regex conformance (Java∩RE2 dialect, same discipline as the
    text operators)."""
    return Constraint(
        "matches",
        col,
        F.count(F.when(~F.col(col).rlike(pattern), 1)),
    )


def audit(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """One-pass audit: every constraint's violation count computed in
    a SINGLE aggregate (one scan, map-side partials — count_distinct
    adds its Expand inside the same job), then unpivoted to the
    per-constraint report. ``passed`` is violations == 0."""
    if not constraints:
        raise ValueError("audit needs at least one constraint")
    aggs = [
        c.violation.cast("long").alias(f"__c{i}")
        for i, c in enumerate(constraints)
    ]
    row = df.agg(*aggs)
    reports = None
    for i, c in enumerate(constraints):
        r = row.select(
            F.lit(c.name).alias("constraint"),
            F.lit(c.column).alias("column"),
            F.col(f"__c{i}").alias("violations"),
            (F.col(f"__c{i}") == 0).alias("passed"),
        )
        reports = r if reports is None else reports.unionByName(r)
    return reports.orderBy("column", "constraint")

"""CDC changelog application (operators/cdc.apply_changelog).

The upsert family's third verb: delete tombstones. Edge semantics
pinned here; the oracle-checked events_cdc_apply query certifies the
values at sf against DuckDB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.operators.cdc import apply_changelog


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, name string, v double",
    )


def _chg(spark, rows):
    return spark.createDataFrame(rows, "k int, name string, v double, op string, seq int")


def _apply(snap, chg):
    return apply_changelog(snap, chg, ["k"], [F.col("seq").desc()])


def test_update_insert_delete(spark):
    chg = _chg(
        spark,
        [
            (2, "b2", 21.0, "U", 1),  # update existing
            (4, "d", 40.0, "U", 1),  # insert new key
            (3, "c", 0.0, "D", 1),  # delete existing
            (9, "x", 0.0, "D", 1),  # delete unseen key: no-op
        ],
    )
    out = _apply(_snap(spark), chg).orderBy("k").collect()
    assert [(r.k, r.name, r.v) for r in out] == [
        (1, "a", 10.0),
        (2, "b2", 21.0),
        (4, "d", 40.0),
    ]


def test_last_verb_wins(spark):
    chg = _chg(
        spark,
        [
            (1, "a1", 11.0, "U", 1),
            (1, "a", 0.0, "D", 2),  # delete AFTER the update: key vanishes
            (2, "b", 0.0, "D", 1),
            (2, "b9", 29.0, "U", 2),  # re-insert AFTER the delete: key survives
        ],
    )
    out = _apply(_snap(spark), chg).orderBy("k").collect()
    assert [(r.k, r.name, r.v) for r in out] == [(2, "b9", 29.0), (3, "c", 30.0)]


def test_empty_changelog_is_identity(spark):
    chg = _chg(spark, [])
    out = _apply(_snap(spark), chg).orderBy("k").collect()
    assert [(r.k, r.name, r.v) for r in out] == [
        (1, "a", 10.0),
        (2, "b", 20.0),
        (3, "c", 30.0),
    ]


def test_missing_columns_rejected(spark):
    bad = spark.createDataFrame([(1, "U", 1)], "k int, op string, seq int")
    with pytest.raises(ValueError, match="missing columns"):
        apply_changelog(_snap(spark), bad, ["k"], [F.col("seq").desc()])


def test_idempotent_reapplication(spark):
    """Replaying the same changelog over the applied state is a no-op
    (at-least-once delivery safety, the ST2 discipline)."""
    chg = _chg(spark, [(2, "b2", 21.0, "U", 1), (3, "c", 0.0, "D", 1)])
    once = _apply(_snap(spark), chg)
    twice = _apply(once, chg)
    assert sorted((r.k, r.name, r.v) for r in twice.collect()) == sorted(
        (r.k, r.name, r.v) for r in once.collect()
    )

"""Mergeable-sketch rollups (functions/sketches): the merge property
(union of per-partition sketches ≡ single-pass sketch), error-bound
certification, and the certifier's failure mode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.functions import sketches as sk
from meteo_etl_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def ev(spark):
    return load_table(spark, SF_SMALL, "events")


def _day():
    return F.date_trunc("day", F.col("ts")).alias("day")


def test_hll_union_equals_single_pass_sketch(spark, ev):
    """Merging per-day HLL sketches must estimate the same distinct
    count as one sketch built over the whole corpus — the register
    state of a union of disjoint-slice sketches is identical to the
    single-pass state (per-register max), which is the property that
    makes stored sketch rollups answer ANY coarser window."""
    rollup = sk.sketch_rollup(ev, [_day()], "user_id", "value")
    merged = sk.merged_distinct_estimate(rollup)
    single = int(
        ev.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(sk.HLL_LGK))
            ).alias("e")
        ).collect()[0]["e"]
    )
    assert merged == single


def test_hll_estimate_within_tolerance_of_exact(spark, ev):
    rollup = sk.sketch_rollup(ev, [_day()], "user_id", "value")
    exact = int(ev.agg(F.countDistinct("user_id").alias("d")).collect()[0]["d"])
    sk.certify_distinct(
        sk.merged_distinct_estimate(rollup), exact, rel_tol=0.05, context="t"
    )


def test_kll_merged_quantiles_rank_certified(spark, ev):
    rollup = sk.sketch_rollup(ev, [_day()], "user_id", "value")
    probs = [0.1, 0.5, 0.9, 0.99]
    for p, est in zip(probs, sk.merged_quantiles(rollup, probs)):
        sk.certify_quantile_rank(
            ev, "value", est, p, rank_tol=0.02, context=f"p{p}"
        )


def test_kll_single_rollup_row_merges(spark, ev):
    """The F.aggregate fold must handle a 1-sketch list (empty slice
    tail) — the single-partition rollup edge."""
    rollup = sk.sketch_rollup(ev, [F.lit(1).alias("g")], "user_id", "value")
    qs = sk.merged_quantiles(rollup, [0.5])
    sk.certify_quantile_rank(ev, "value", qs[0], 0.5, rank_tol=0.02, context="p50")


def test_certifiers_raise_on_breach(spark, ev):
    with pytest.raises(RuntimeError, match="rel err"):
        sk.certify_distinct(200, 100, rel_tol=0.05, context="t")
    with pytest.raises(RuntimeError, match="exact rank"):
        # claim the minimum value is the median
        lo = ev.agg(F.min(F.col("value").cast("double")).alias("m")).collect()[0]["m"]
        sk.certify_quantile_rank(
            ev, "value", lo - 1.0, 0.5, rank_tol=0.02, context="t"
        )


def test_empty_rollup_raises_cleanly(spark, ev):
    from meteo_etl_spark.functions import sketches as sk

    empty = sk.sketch_rollup(
        ev.where("user_id IS NULL AND user_id IS NOT NULL"),
        ["user_id"],
        "user_id",
        "value",
    )
    # the empty HLL union is a real (empty) sketch: estimate 0
    assert sk.merged_distinct_estimate(empty) == 0
    # but there is no KLL sketch to fold, so quantiles must refuse
    with pytest.raises(ValueError, match="empty rollup"):
        sk.merged_quantiles(empty, [0.5])

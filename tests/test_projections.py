"""Random projection (JL): engine/twin parity and the distortion
guarantees the audit is supposed to measure."""

from __future__ import annotations

from pyspark.sql import functions as F

from meteo_etl_spark.functions import projections as rp
from meteo_etl_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL


def test_random_project_matches_python_twin(spark):
    """The engine-side fold and the driver-side twin must produce
    bit-identical doubles on every corpus row — the audit mixes the
    two (corpus projects engine-side, panel driver-side)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    v = F.col("embedding").cast("array<double>")
    rows = emb.select("vec_id", v.alias("v"), rp.random_project(v).alias("p")).collect()
    assert rows
    for r in rows:
        assert list(r["p"]) == rp._rp_project_py(list(r["v"])), r["vec_id"]


def test_rp_matrix_is_deterministic_and_balanced():
    """Same constants from every call site (the reproducibility the
    operator exists for) and no degenerate component: each ±1 row is
    roughly balanced and rows are not duplicated."""
    planes = [tuple(rp.rp_plane(k)) for k in range(rp.RP_OUT_DIM)]
    assert planes == [tuple(rp.rp_plane(k)) for k in range(rp.RP_OUT_DIM)]
    assert len(set(planes)) == rp.RP_OUT_DIM
    for p in planes:
        assert set(p) == {1.0, -1.0}
        assert abs(sum(p)) <= 24  # balanced well away from constant


def test_rp_audit_distortion_near_one_on_real_vectors(spark):
    """JL's promise on the testdata corpus: the mean squared-distance
    ratio sits near 1 and every pair stays within a moderate band —
    the numbers that certify 4x-smaller vectors for blocking. Also
    pins the audit's accounting: every non-query corpus vector
    contributes exactly one pair (no zero-distance dups here)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    audit = rp.rp_distortion_audit(emb, n_queries=5).collect()
    assert len(audit) == 5
    for r in audit:
        assert r["n_pairs"] == n - 1
        mean = r["sum_ratio_u"] / r["n_pairs"] / 1e6
        assert 0.8 < mean < 1.25, mean
        assert r["min_ratio_u"] > 100_000  # no pair collapses to ~0
        assert r["max_ratio_u"] < 4_000_000  # no pair explodes
        assert r["min_ratio_u"] <= r["max_ratio_u"]


def test_rp_audit_excludes_zero_distance_pairs(spark):
    """An exact duplicate of a panel vector is excluded (the ratio is
    undefined), not divided by zero into NaN/Inf."""
    emb = load_table(spark, SF_SMALL, "embeddings").limit(20)
    first = emb.orderBy("vec_id").limit(1).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    with_dup = emb.unionByName(first)
    audit = rp.rp_distortion_audit(with_dup, n_queries=1).collect()
    assert len(audit) == 1
    # 21 rows total, minus self, minus the duplicate-of-query pair
    assert audit[0]["n_pairs"] == 19

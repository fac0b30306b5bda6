"""PCA vs numpy reference on the collected data.

The distributed fit must reproduce numpy's full-precision PCA up to the
micro-unit snap of the sufficient statistics: eigenvalues to ~1e-4
relative, the spanned subspace exactly (basis vectors compared up to
sign via |cos| ~ 1), and projections consistent with the model's own
components."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.functions import pca


def _make_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        ["id", "embedding"],
    )


def _ref_cov_eig(X, k):
    Xc = X - X.mean(axis=0)
    cov = Xc.T @ Xc / (len(X) - 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    return vals[order], vecs[:, order]


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    # anisotropic: a few dominant directions so eigen-order is stable
    base = rng.normal(size=(300, 6)) * np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    rot, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    return np.round(base @ rot, 4)  # 4dp: exactly representable in micro-units


def test_fit_matches_numpy(spark, data):
    model = pca.pca_fit(_make_df(spark, data), k=4)
    ref_vals, ref_vecs = _ref_cov_eig(data, 4)
    got_vals = np.array(model.eigenvalues)
    assert np.allclose(got_vals, ref_vals, rtol=1e-3, atol=1e-6)
    # subspace match: each fitted component is +-1 * the numpy one
    for kidx in range(4):
        cos = abs(float(np.dot(model.components[kidx], ref_vecs[:, kidx])))
        assert cos > 0.9999, (kidx, cos)
    # deterministic sign: pivot coefficient positive
    for comp in model.components:
        v = np.array(comp)
        assert v[int(np.argmax(np.abs(v)))] > 0
    assert np.allclose(model.mean, data.mean(axis=0), atol=1e-5)


def test_explained_variance_ratio_descends(spark, data):
    model = pca.pca_fit(_make_df(spark, data), k=6)
    r = model.explained_variance_ratio
    assert all(a >= b for a, b in zip(r, r[1:]))
    assert abs(sum(r) - 1.0) < 1e-9  # k = d -> ratios sum to 1


def test_explained_variance_ratio_honest_when_k_lt_d(spark, data):
    """Ratios divide by the covariance TRACE (total variance), so with
    k < d they sum to the subspace's true coverage — NOT 1.0."""
    full = pca.pca_fit(_make_df(spark, data), k=6)
    part = pca.pca_fit(_make_df(spark, data), k=2)
    assert part.total_variance == pytest.approx(full.total_variance)
    expect = sum(full.eigenvalues[:2]) / full.total_variance
    got = sum(part.explained_variance_ratio)
    assert got == pytest.approx(expect)
    assert got < 0.999  # the fixture spreads variance over >2 directions


def test_project_matches_model_math(spark, data):
    df = _make_df(spark, data)
    model = pca.pca_fit(df, k=3)
    rows = pca.pca_project(df, model).orderBy("id").collect()
    W = np.array(model.components)  # k x d
    expect = (data - np.array(model.mean)) @ W.T
    got = np.array([list(r["pca"]) for r in rows])
    assert np.allclose(got, expect, atol=1e-6)


def test_projection_is_partitioning_invariant(spark, data):
    df1 = _make_df(spark, data).repartition(1)
    df7 = _make_df(spark, data).repartition(7)
    m1 = pca.pca_fit(df1, k=3)
    m7 = pca.pca_fit(df7, k=3)
    # integer sufficient statistics -> identical model bits
    assert m1 == m7
    p1 = {r["id"]: tuple(r["pca"]) for r in pca.pca_project(df1, m1).collect()}
    p7 = {r["id"]: tuple(r["pca"]) for r in pca.pca_project(df7, m7).collect()}
    assert p1 == p7  # sequential folds -> bit-identical per row


def test_fit_validations(spark):
    df = _make_df(spark, np.zeros((1, 3)))
    with pytest.raises(ValueError, match="at least 2"):
        pca.pca_fit(df, k=1)
    df2 = _make_df(spark, np.zeros((5, 3)))
    with pytest.raises(ValueError, match="k must be"):
        pca.pca_fit(df2, k=4)


def test_project_plan_is_udf_free(spark, data):
    df = _make_df(spark, data)
    model = pca.pca_fit(df, k=2)
    plan = (
        pca.pca_project(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pca_composes_with_kmeans_pipeline(spark, data):
    """SemDeDup's actual recipe: PCA-reduce, then cluster in the
    projected space — the composition must run end-to-end with the
    projected column as a drop-in embedding."""
    from meteo_etl_spark.functions import clustering as cl

    df = _make_df(spark, data)
    model = pca.pca_fit(df, k=3)
    proj = pca.pca_project(df, model).select(
        "id", F.col("pca").alias("embedding")
    )
    centroids, inertia = cl.kmeans_fit(proj, k=2, iters=3, id_col="id")
    assert len(centroids) == 2
    assert all(len(c) == 3 for c in centroids)  # centroids live in PCA space
    assert inertia == sorted(inertia, reverse=True)  # Lloyd's monotone descent

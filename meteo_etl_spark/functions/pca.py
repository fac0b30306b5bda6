"""Distributed PCA over an embedding column — the whitening/rotation
precursor of SemDeDup-style semantic pipelines (the paper's recipe
PCA-reduces embeddings before clustering) and the remedy when
``emb_dim_corr`` reports redundant dimensions.

Architecture (the only shape that scales to 100 TB of vectors):

1. **Sufficient statistics, one distributed pass**: per-dimension sums
   and the upper-triangle pairwise product census, all in INTEGER
   micro-units so the group sums are order-free (the same discipline as
   plans/llm_queries.emb_dim_corr, which is the oracle-checked twin of
   this pass). The census shuffles O(d^2) rows — independent of corpus
   size — because the aggregate combines map-side.
2. **Driver-side eigendecomposition**: the d x d covariance is
   vector-DIMENSION sized, not corpus sized (d=64 -> 2,080 census rows),
   so collecting it is a scalar-class collect (the k-means-centroid /
   exact-percentile-bracket discipline, see operators/quantiles.py).
   ``numpy.linalg.eigh`` on a 64x64 symmetric matrix is microseconds.
3. **Projection, one distributed pass**: each principal component is a
   literal coefficient array folded against the (mean-centered) vector
   with built-in ``zip_with``/``aggregate`` — no UDF, no shuffle; the
   projected frame is written in the same scan that reads the vectors.

Determinism: eigenvector SIGN is fixed by making each component's
largest-|coefficient| entry positive (eigh's sign is otherwise
arbitrary), so projections are reproducible across runs and hosts.
Near-degenerate eigenvalues can still permute between BLAS builds —
single-host determinism is what this pins, and tests assert subspace
(not basis) equality against numpy's reference PCA.

Reference parity: none — training-pipeline extension surface
(SURVEY.md §2.4); validated in tests/test_pca.py against numpy PCA of
the collected data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meteo_etl_spark.functions.lits import dlit

#: micro-unit snap used for the integer sufficient statistics.
_U = 1_000_000.0


@dataclass(frozen=True)
class PCAModel:
    """Fitted PCA: feature means, components (k x d, row-major),
    eigenvalues (descending), and the TOTAL variance (covariance
    trace) so ratios stay honest when k < d."""

    mean: tuple[float, ...]
    components: tuple[tuple[float, ...], ...]
    eigenvalues: tuple[float, ...]
    total_variance: float

    @property
    def explained_variance_ratio(self) -> tuple[float, ...]:
        """Each retained eigenvalue over the covariance TRACE (total
        variance across all d dimensions) — with k < d the ratios sum
        to the subspace's true coverage, not to a misleading 1.0."""
        if self.total_variance <= 0:
            return tuple(0.0 for _ in self.eigenvalues)
        return tuple(v / self.total_variance for v in self.eigenvalues)


def _micro(col: Column) -> Column:
    return F.transform(
        F.transform(col, lambda x: x.cast("double")),
        lambda x: F.floor(x * F.lit(_U) + F.lit(0.5)).cast("long"),
    )


def moment_census(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """The shared second-moment census: ONE corpus scan, ONE
    map-combined aggregate, O(d^2) shuffle rows regardless of corpus
    size. Output rows ``(i, j, sp)``:

    - ``0 <= i <= j < dim``: sum of ``xu[i] * xu[j]`` (pair products);
    - ``(i, -1)``: the marginal sum of ``xu[i]``;
    - ``(-1, -1)``: the row count —

    all riding the same exploded term array so the marginals cost no
    extra scan. Sums aggregate as ``decimal(38, 0)``: per-term products
    fit int64 comfortably (micro-unit values ~1e6 -> ~1e12 per term),
    but an int64 SUM would wrap silently near 9.2e18 — under ten
    million unit-scale vectors — whereas the decimal sum is exact to
    1e38 and raises rather than wraps. The DuckDB oracle twin
    (plans/llm_queries.emb_dim_corr) sums to HUGEINT, the same
    128-bit-exact contract."""
    base = df.select(_micro(F.col(vec_col)).alias("xu"))
    terms = F.expr(
        "concat("
        f"flatten(transform(sequence(0, {dim - 1}), i -> "
        f"transform(sequence(i, {dim - 1}), j -> "
        "struct(i AS i, j AS j, xu[i] * xu[j] AS p)))), "
        f"transform(sequence(0, {dim - 1}), i -> "
        "struct(i AS i, -1 AS j, xu[i] AS p)), "
        "array(struct(-1 AS i, -1 AS j, 1L AS p)))"
    )
    return (
        base.select(F.explode(terms).alias("t"))
        .select("t.i", "t.j", "t.p")
        .groupBy("i", "j")
        .agg(F.sum(F.col("p").cast("decimal(38,0)")).alias("sp"))
    )


def sufficient_stats(df: DataFrame, vec_col: str, dim: int):
    """One distributed pass -> (n, sums[d], gram upper triangle dict).

    Collects the dimension-sized :func:`moment_census` (d(d+1)/2 + d + 1
    rows — scalar-class, never corpus-sized) and splits it into exact
    Python integers."""
    rows = moment_census(df, vec_col, dim).collect()
    if not rows:
        raise ValueError("pca: empty input")
    n = 0
    sums = [0] * dim
    gram: dict[tuple[int, int], int] = {}
    for r in rows:
        i, j, sp = int(r["i"]), int(r["j"]), int(r["sp"])
        if i == -1:
            n = sp
        elif j == -1:
            sums[i] = sp
        else:
            gram[(i, j)] = sp
    return n, sums, gram


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 8) -> PCAModel:
    """Fit a k-component PCA; d is taken from the first row.

    The covariance is assembled from integer sufficient statistics
    (sample covariance, 1/(n-1)); eigendecomposition runs driver-side
    on the d x d matrix (dimension-sized, never corpus-sized)."""
    import numpy as np

    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("pca_fit: empty input")
    dim = int(first["d"])
    if k < 1 or k > dim:
        raise ValueError(f"pca_fit: k must be in [1, {dim}]")
    n, sums, gram = sufficient_stats(df, vec_col, dim)
    if n < 2:
        raise ValueError("pca_fit: needs at least 2 vectors")
    s = np.array(sums, dtype=np.float64)
    cov = np.empty((dim, dim), dtype=np.float64)
    for (i, j), sp in gram.items():
        c = (n * sp - sums[i] * sums[j]) / (n * (n - 1)) / (_U * _U)
        cov[i, j] = c
        cov[j, i] = c
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    eigs = []
    for idx in order:
        v = vecs[:, idx]
        # deterministic sign: largest-|coefficient| entry positive
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append(tuple(float(x) for x in v))
        eigs.append(float(max(vals[idx], 0.0)))
    mean = tuple(float(x) for x in (s / n / _U))
    return PCAModel(
        mean=mean,
        components=tuple(comps),
        eigenvalues=tuple(eigs),
        total_variance=float(max(np.trace(cov), 0.0)),
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append the k-dim projection of (x - mean) onto the components.

    Pure built-in column math: the mean and each component ship as
    literal arrays inside the plan (k*d doubles — bytes, not data), and
    every projection is one sequential ``zip_with`` + ``aggregate``
    fold per component. No UDF, no shuffle, one scan."""
    mean_lit = dlit(model.mean)
    centered = F.zip_with(
        F.transform(vec_col, lambda x: x.cast("double")),
        mean_lit,
        lambda x, m: x - m,
    )
    projections = []
    for comp in model.components:
        w = dlit(comp)
        projections.append(
            F.aggregate(
                F.zip_with(centered, w, lambda x, c: x * c),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return df.withColumn(out_col, F.array(*projections))

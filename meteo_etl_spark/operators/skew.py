"""Skew mitigation: salted joins (the manual fallback behind AQE).

The engine's first line of defense is AQE skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py). Salting is
the explicit fallback for cases AQE can't fix — e.g. a skewed key
feeding a non-splittable aggregation-after-join, or stream-static joins
where AQE doesn't apply:

- the FACT side gets a deterministic salt in ``[0, buckets)``;
- the DIM side is replicated once per salt value (``explode(sequence)``
  — a narrow generate, no shuffle);
- the join key becomes (key, salt), so one hot key's rows spread over
  ``buckets`` reducer partitions instead of one.

The result is provably identical to the unsalted join (each fact row
still meets exactly one copy of its dim row) — the oracle-checked
``skew_salted_join`` query states that equivalence against DuckDB.

At 100 TB, ``buckets`` is sized to the hottest key's row count divided
by the target partition size; salting only the hot keys (a two-branch
union of hot/cold) cuts the dim replication cost further.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    salt_src: Column,
    buckets: int = DEFAULT_BUCKETS,
    how: str = "inner",
    keep_salt: bool = False,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``key`` with salt-spread reducers.

    ``salt_src`` is any fact-side expression with per-row variance (a
    row id, an event id, even ``rand()`` if determinism is not needed);
    the salt is ``pmod(salt_src, buckets)``.

    ``keep_salt=True`` retains the ``__salt`` column so a downstream
    same-key aggregation can run two-level — partials on
    ``(key, __salt)`` (hot key stays spread), then a tiny final merge
    on ``key``. Without it, an agg right after the join re-concentrates
    the hot key on one reducer and undoes the salting.

    Only fact-preserving joins are legal: the dim side is replicated
    ``buckets``× before the join, so a dim-preserving mode
    (right/full outer) would emit every unmatched dim row once per
    salt copy instead of once.
    """
    fact_preserving = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower().replace(" ", "") not in fact_preserving:
        raise ValueError(
            f"salted_join: how={how!r} is dim-preserving; the replicated dim "
            f"side would duplicate unmatched dim rows {buckets}x. "
            "Use inner/left/left_semi/left_anti."
        )
    salted_fact = fact.withColumn("__salt", F.pmod(salt_src, F.lit(buckets)).cast("int"))
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = salted_fact.join(salted_dim, on=[key, "__salt"], how=how)
    return out if keep_salt else out.drop("__salt")

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


def test_cms_merges_by_sum_and_never_underestimates(spark, ev):
    """Count-min sketch (r12): (1) cells built per-slice and merged by
    groupBy-SUM equal the single-pass sketch exactly — the mergeable-
    rollup contract, plain associative integers; (2) estimates are
    ONE-SIDED: min-over-cells >= the true count for EVERY key (hash
    collisions only add); (3) the estimate never exceeds truth by more
    than the total mass that could collide (a loose sanity ceiling —
    the real bound is probabilistic eps*N)."""
    whole = sk.cms_rollup(ev, "user_id")

    # (1) merge-equality: two disjoint halves, cells summed
    lo = sk.cms_rollup(ev.where(F.col("event_id") % 2 == 0), "user_id")
    hi = sk.cms_rollup(ev.where(F.col("event_id") % 2 == 1), "user_id")
    merged = (
        lo.unionByName(hi)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    as_dict = lambda df: {  # noqa: E731
        (r["d"], r["bucket"]): r["cnt"] for r in df.collect()
    }
    assert as_dict(merged) == as_dict(whole)

    # (2) one-sided for EVERY key, not just heavy hitters
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    est = sk.cms_estimate(whole, exact.select("user_id"), "user_id")
    joined = exact.join(est, "user_id").collect()
    assert joined
    under = [r for r in joined if r["n_cms"] < r["n_exact"]]
    assert not under, under[:5]

    # (3) loose ceiling: overestimate bounded by the colliding mass
    total = ev.count()
    over = [r for r in joined if r["n_cms"] - r["n_exact"] > total]
    assert not over, over[:5]

    # an unseen key reads whatever collided into its cells — still
    # one-sided (>= its true count of 0) and never an error
    ghost = spark.createDataFrame([(10**12,)], "user_id long")
    g = sk.cms_estimate(whole, ghost, "user_id").collect()[0]
    assert g["n_cms"] >= 0


def test_cms_estimate_rejects_grouped_sketches(spark, ev):
    """r12 self-review: min over GROUPED cells underestimates (one
    cell per group matches the probe join), silently breaking the
    one-sided guarantee — a grouped rollup must be merged to plain
    (d, bucket, cnt) first, and passing it raw raises loudly."""
    grouped = sk.cms_rollup(
        ev.withColumn("day", _day()), "user_id", group_keys=["day"]
    )
    cand = ev.select("user_id").distinct().limit(3)
    with pytest.raises(ValueError, match="merged"):
        sk.cms_estimate(grouped, cand, "user_id")
    # the documented merge makes it usable — and equal to single-pass
    merged = (
        grouped.groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    whole = sk.cms_rollup(ev, "user_id")
    a = {r["user_id"]: r["n_cms"]
         for r in sk.cms_estimate(merged, cand, "user_id").collect()}
    b = {r["user_id"]: r["n_cms"]
         for r in sk.cms_estimate(whole, cand, "user_id").collect()}
    assert a == b


def test_kmv_sketch_properties(spark):
    """KMV invariants: the sketch IS the k smallest distinct hashes
    (prefilter changes nothing), unions are closed (merge+re-rank of
    two sketches == sketch of the concatenated input), the estimator
    is exact below k and within the ~1/sqrt(k) band above it, and the
    prefilter validation raises when sabotaged."""
    import pytest
    from pyspark.sql import functions as F

    from meteo_etl_spark.functions.sketches import (
        KMV_K,
        kmv_estimate,
        kmv_hash,
        kmv_sketch,
    )

    df = spark.range(0, 3000).select(
        F.when(F.col("id") % 3 == 0, "a").otherwise("b").alias("k"),
        (F.col("id") % 997).alias("v"),
    )
    sk = kmv_sketch(df, "k", "v")
    got = {
        r["key"]: r["hvs"]
        for r in sk.groupBy("key")
        .agg(F.sort_array(F.collect_list("hv")).alias("hvs"))
        .collect()
    }
    # ground truth: k smallest distinct hashes per key, no prefilter
    truth = {
        r["k"]: r["hvs"][:KMV_K]
        for r in df.select("k", kmv_hash(F.col("v")).alias("hv"))
        .distinct()
        .groupBy("k")
        .agg(F.sort_array(F.collect_list("hv")).alias("hvs"))
        .collect()
    }
    assert got == truth

    # estimator: exact below k; within 3/sqrt(k-2) above it (uniform
    # hashes; 3 sigma on the deterministic md5 draw for this data)
    per = sk.groupBy("key").agg(
        F.count(F.lit(1)).alias("ns"), F.max("hv").alias("kth")
    )
    ests = {
        r["key"]: r["e"]
        for r in per.select(
            "key", kmv_estimate(F.col("ns"), F.col("kth")).alias("e")
        ).collect()
    }
    exact = {
        r["k"]: r["n"]
        for r in df.select("k", "v").distinct().groupBy("k").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    for key, n in exact.items():
        if n < KMV_K:
            assert ests[key] == n
        else:
            assert abs(ests[key] - n) / n < 3 / (KMV_K - 2) ** 0.5, (
                key, ests[key], n,
            )

    # union closure: sketch(A ∪ B rows) == merge(sketch A, sketch B)
    both = kmv_sketch(
        df.withColumn("k", F.lit("ab")), "k", "v"
    ).select("hv")
    merged = (
        sk.select("hv").distinct().orderBy("hv").limit(KMV_K)
    )
    assert sorted(r.hv for r in both.collect()) == sorted(
        r.hv for r in merged.collect()
    )

    # small column: sketch holds the whole set
    tiny = spark.createDataFrame(
        [("x", i) for i in range(10)], "k string, v long"
    )
    assert kmv_sketch(tiny, "k", "v").count() == 10

    # sabotaged slack -> validation must raise, never under-sketch
    with pytest.raises(RuntimeError, match="k-minima"):
        kmv_sketch(df, "k", "v", slack=0)


def test_kmv_foreach_batch_store_semantics(spark, tmp_path):
    """kmv_merge_foreach_batch store contract (r14 advice): a MISSING
    store bootstraps; a CORRUPT existing store raises (never silently
    overwritten with just the current batch); a numeric key column
    persists with its real type (schema derived from the merge, not a
    hardcoded 'key string' literal)."""
    import pytest

    from meteo_etl_spark.functions.sketches import (
        kmv_merge_foreach_batch,
        kmv_sketch,
    )

    store = str(tmp_path / "store")
    handler = kmv_merge_foreach_batch(spark, store, "k", "v")
    df1 = spark.range(0, 400).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 211).alias("v")
    )
    handler(df1, 0)
    # numeric key column round-trips with its real type
    persisted = spark.read.parquet(store)
    assert dict(persisted.dtypes)["key"] == "bigint"

    # second wave incl. full redelivery of wave 1 -> merge must equal
    # the one-shot batch sketch of the union
    df2 = spark.range(300, 900).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 211).alias("v")
    )
    handler(df2.unionByName(df1), 1)
    maintained = spark.read.parquet(store).select("key", "hv")
    batch = kmv_sketch(df1.unionByName(df2), "k", "v")
    assert (
        maintained.exceptAll(batch).count() == 0
        and batch.exceptAll(maintained).count() == 0
    )

    # corrupt the existing store: the read error must PROPAGATE, and
    # the accumulated store must survive untouched
    import glob
    import os

    before = sorted(os.path.basename(p) for p in glob.glob(store + "/*.parquet"))
    for p in glob.glob(store + "/*.parquet"):
        with open(p, "wb") as f:
            f.write(b"not a parquet file")
    with pytest.raises(Exception):
        handler(df1, 2)
    after = sorted(os.path.basename(p) for p in glob.glob(store + "/*.parquet"))
    assert after == before, "a failed read must not rewrite the store"

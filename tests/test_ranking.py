"""operators/ranking: the distributed global rank/ntile must be
value-identical to the single-partition window functions they replace
— same ranks, same tie resolution, same NTILE remainder semantics —
on uniform, skewed, and tiny inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from meteo_etl_spark.operators.ranking import (
    global_ntile,
    global_row_number,
)


@pytest.fixture(scope="module")
def frames(spark):
    uniform = spark.range(0, 5000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 2654435761) % 9973).alias("v"),
    )
    # heavy ties: 40% of rows share v=0 — the whole tie group must land
    # in ONE bucket and still rank correctly via the tie-breaker
    skewed = spark.range(0, 5000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 5 < 2, F.lit(0))
        .otherwise((F.col("id") * 48271) % 997)
        .alias("v"),
    )
    return {"uniform": uniform, "skewed": skewed}


@pytest.mark.parametrize("shape", ["uniform", "skewed"])
@pytest.mark.parametrize("direction", ["asc", "desc"])
def test_global_row_number_matches_window(spark, frames, shape, direction):
    df = frames[shape]
    order = [("v", direction), ("k", "asc")]
    w = Window.orderBy(
        F.col("v").asc() if direction == "asc" else F.col("v").desc(),
        F.col("k").asc(),
    )
    exp = {
        r.k: r.rn
        for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
    }
    got = {
        r.k: r.rn
        for r in global_row_number(df, order, n_buckets=16).collect()
    }
    assert got == exp


def test_global_row_number_plan_has_no_single_partition_window(spark, frames):
    df = global_row_number(frames["uniform"], [("v", "asc"), ("k", "asc")])
    plan = df._jdf.queryExecution().executedPlan().toString()
    from tests.test_plan_guards import has_single_partition_window

    assert not has_single_partition_window(plan)


@pytest.mark.parametrize("n_rows", [5000, 4999, 7, 3])
def test_global_ntile_matches_ntile(spark, n_rows):
    df = spark.range(0, n_rows).select(
        F.col("id").alias("k"), ((F.col("id") * 7919) % 101).alias("v")
    )
    w = Window.orderBy("v", "k")
    exp = {
        r.k: r.t
        for r in df.select(
            "k", F.ntile(5).over(w).cast("long").alias("t")
        ).collect()
    }
    got = {
        r.k: r.t
        for r in global_ntile(
            df, [("v", "asc"), ("k", "asc")], 5, tile_col="t", n_buckets=8
        ).collect()
    }
    assert got == exp


def test_global_ntile_empty_and_bad_direction(spark):
    empty = spark.createDataFrame([], "k long, v long")
    out = global_ntile(empty, [("v", "asc")], 5, tile_col="t")
    assert out.collect() == []
    with pytest.raises(ValueError, match="asc|desc"):
        global_row_number(
            spark.range(3).select(F.col("id").alias("v")), [("v", "up")]
        ).collect()


@pytest.mark.parametrize("direction", ["asc", "desc"])
def test_global_row_number_null_first_key(spark, direction):
    """NULL first-key rows must rank exactly where the native window
    puts them (asc -> NULLS FIRST, desc -> NULLS LAST) — the r14
    advice: without an explicit route a NULL key lands in bucket 0,
    silently wrong for desc."""
    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 == 0, F.lit(None).cast("long"))
        .otherwise((F.col("id") * 48271) % 199)
        .alias("v"),
    )
    w = Window.orderBy(
        F.col("v").asc() if direction == "asc" else F.col("v").desc(),
        F.col("k").asc(),
    )
    exp = {
        r.k: r.rn
        for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
    }
    got = {
        r.k: r.rn
        for r in global_row_number(
            df, [("v", direction), ("k", "asc")], n_buckets=16
        ).collect()
    }
    assert got == exp


def test_global_row_number_counts_out_census(spark, frames):
    """counts_out must report the exact total row count and a bucket
    census that sums to it — the no-second-scan contract
    events_global_rank's max-rank probe relies on."""
    census = {}
    df = global_row_number(
        frames["uniform"], [("v", "asc"), ("k", "asc")],
        n_buckets=16, counts_out=census,
    )
    assert census["n"] == 5000
    assert sum(census["bucket_counts"].values()) == 5000
    assert df.filter(F.col("rn") == census["n"]).count() == 1


def test_skew_stress_bucket_ceiling(spark):
    """The documented skew bound, measured: with HALF the table on one
    key (the events_rank_skew_stress distribution), the whole tie
    group lands in exactly ONE bucket — per-task state is bounded by
    the largest tie group, as ranking.py claims — and every OTHER
    bucket stays sketch-sized (the n/n_buckets ballpark, generously
    slacked for approx_percentile error), never a second runaway."""
    n, n_buckets = 20_000, 64
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise((F.col("id") * 48271) % 9973)
        .alias("v"),
    )
    census = {}
    ranked = global_row_number(
        df, [("v", "asc"), ("k", "asc")], n_buckets=n_buckets,
        counts_out=census,
    )
    tie_rows = n // 2 + len([1 for i in range(1, n, 2) if (i * 48271) % 9973 == 0])
    counts = census["bucket_counts"]
    ceiling = max(counts.values())
    # (a) the tie group IS the biggest bucket, and nothing joined it:
    # key 0 sorts first, so it is bucket 0 exactly
    assert counts[0] == tie_rows == ceiling
    # (b) every other bucket is sketch-bounded: the non-tie half spread
    # over the remaining boundaries — 4x slack on the uniform share
    rest = sorted(c for b, c in counts.items() if b != 0)
    assert rest and rest[-1] <= 4 * max(1, (n - tie_rows) // (n_buckets - 1))
    # (c) and the ranks are still exactly the window's, ties and all
    w = Window.orderBy(F.col("v").asc(), F.col("k").asc())
    exp = {r.k: r.rn for r in df.select(
        "k", F.row_number().over(w).alias("rn")).collect()}
    got = {r.k: r.rn for r in ranked.collect()}
    assert got == exp
    # pinned measurement for the evidence note (printed, not asserted):
    print(f"SKEW_CEILING n={n} buckets={n_buckets} "
          f"tie_bucket={counts[0]} max_other={rest[-1]}")


@pytest.mark.parametrize(
    "qname", ["events_global_rank", "events_rank_skew_stress"]
)
def test_rank_queries_plan_with_exactly_two_driver_actions(
    spark, monkeypatch, qname
):
    """r14 verdict order #4, pinned: building the rank queries' plan
    costs exactly TWO driver actions — the boundary sketch collect and
    the bucket-census collect inside global_row_number — and never a
    separate count() scan for the max-rank probe (the census's n is
    reused via counts_out)."""
    # patch the CONCRETE class: pyspark.sql.DataFrame is the abstract
    # facade in Spark 4 and its methods are overridden by classic
    from pyspark.sql.classic.dataframe import DataFrame

    from meteo_etl_spark.plans import queries as Q

    calls = {"collect": 0, "count": 0}
    orig_collect = DataFrame.collect
    orig_count = DataFrame.count

    def counting_collect(self):
        calls["collect"] += 1
        return orig_collect(self)

    def counting_count(self):
        calls["count"] += 1
        return orig_count(self)

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    monkeypatch.setattr(DataFrame, "count", counting_count)
    Q.get(qname).fn(spark, "/root/testdata/sf0.001")
    assert calls["count"] == 0, "max-rank probe must reuse the census n"
    assert calls["collect"] == 2, calls

"""Bucketed co-located join: same-bucketed tables join WITHOUT any
Exchange (the pre-paid-shuffle contract), and results match the plain
join exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.operators.bucketing import read_bucketed, write_bucketed
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("buckets")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    write_bucketed(
        orders, "b_orders", str(root / "orders"),
        bucket_cols=["o_custkey"], sort_cols=["o_custkey"],
    )
    write_bucketed(
        customer, "b_customer", str(root / "customer"),
        bucket_cols=["c_custkey"], sort_cols=["c_custkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    o = read_bucketed(spark, "b_orders")
    c = read_bucketed(spark, "b_customer")
    # merge hint: at sf0.001 both sides fit the broadcast threshold,
    # which would hide the co-location; at scale SMJ is what you get.
    joined = o.hint("merge").join(c, o.o_custkey == c.c_custkey).groupBy(
        "c_mktsegment"
    ).agg(F.count(F.lit(1)).alias("n"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_part = plan.split("HashAggregate")[-1]  # below the final agg
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_part, f"join subtree still shuffles:\n{join_part}"


def test_bucketed_join_matches_plain_join(spark, bucketed):
    o = read_bucketed(spark, "b_orders")
    c = read_bucketed(spark, "b_customer")
    po = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    pc = spark.read.parquet(f"{SF_SMALL}/customer.parquet")

    def summarize(odf, cdf):
        return sorted(
            (r.c_mktsegment, r.n, r.sp)
            for r in odf.join(cdf, odf.o_custkey == cdf.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("sp"),
            )
            .collect()
        )

    assert summarize(o, c) == summarize(po, pc)

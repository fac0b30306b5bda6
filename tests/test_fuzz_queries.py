"""Randomized query corpus vs the DuckDB oracle (SQL-logic-test style;
the reference has nothing comparable — SURVEY.md §5).

Hypothesis draws small query shapes (filters → optional group-by →
aggregates → sort) and builds the SAME query twice: once as a Spark
DataFrame plan, once as SQL for DuckDB. Results must match exactly
(aggregate floats are rounded in-query on both sides, same as the
declared surface does)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from tests.oracle import compare, duckdb_connection

#: filterable columns: (name, duckdb literal formatter, sample values)
FILTERS = {
    "l_quantity": ("num", [1.0, 10.0, 25.0, 49.0]),
    "l_discount": ("num", [0.0, 0.02, 0.05, 0.08]),
    "l_returnflag": ("str", ["A", "N", "R"]),
    "l_linestatus": ("str", ["F", "O"]),
    "l_suppkey": ("num", [1, 5, 25, 77]),
}
OPS = ["<", "<=", ">", ">=", "=", "<>"]
GROUPS = ["l_returnflag", "l_linestatus", "l_shipdate"]
AGGS = {
    "cnt": ("COUNT(*)", lambda: F.count(F.lit(1))),
    "sum_qty": ("ROUND(SUM(l_quantity), 2)", lambda: F.round(F.sum("l_quantity"), 2)),
    "min_price": ("MIN(l_extendedprice)", lambda: F.min("l_extendedprice")),
    "max_disc": ("MAX(l_discount)", lambda: F.max("l_discount")),
    "avg_tax": ("ROUND(AVG(l_tax), 4)", lambda: F.round(F.avg("l_tax"), 4)),
}

filter_st = st.builds(
    lambda col, op, vi: (col, op, FILTERS[col][1][vi % len(FILTERS[col][1])]),
    st.sampled_from(sorted(FILTERS)),
    st.sampled_from(OPS),
    st.integers(min_value=0, max_value=3),
)

query_st = st.fixed_dictionaries(
    {
        "filters": st.lists(filter_st, min_size=0, max_size=3),
        "groups": st.lists(st.sampled_from(GROUPS), min_size=0, max_size=2, unique=True),
        "aggs": st.lists(st.sampled_from(sorted(AGGS)), min_size=1, max_size=3, unique=True),
    }
)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_connection(SF_SMALL)
    yield con
    con.close()


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")


def _lit_sql(kind: str, v) -> str:
    return f"'{v}'" if kind == "str" else repr(v)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=query_st)
def test_random_query_matches_oracle(spark, lineitem, oracle_con, q):
    df = lineitem
    where = []
    for col, op, v in q["filters"]:
        kind = FILTERS[col][0]
        where.append(f"l.{col} {op} {_lit_sql(kind, v)}")
        spark_op = {
            "<": "__lt__", "<=": "__le__", ">": "__gt__",
            ">=": "__ge__", "=": "__eq__", "<>": "__ne__",
        }[op]
        df = df.filter(getattr(F.col(col), spark_op)(v))

    agg_cols = [AGGS[a][1]().alias(a) for a in q["aggs"]]
    agg_sql = ", ".join(f"{AGGS[a][0]} AS {a}" for a in q["aggs"])

    if q["groups"]:
        df = df.groupBy(*q["groups"]).agg(*agg_cols).orderBy(*q["groups"])
        group_sql = ", ".join(q["groups"])
        sql = (
            f"SELECT {group_sql}, {agg_sql} FROM lineitem l"
            + (f" WHERE {' AND '.join(where)}" if where else "")
            + f" GROUP BY {group_sql} ORDER BY {group_sql}"
        )
    else:
        df = df.agg(*agg_cols)
        sql = (
            f"SELECT {agg_sql} FROM lineitem l"
            + (f" WHERE {' AND '.join(where)}" if where else "")
        )

    compare(df, oracle_con.execute(sql).fetchdf(), name=sql)


# ---------------------------------------------------------------------------
# Join shapes: orders ⋈ customer with random join type / filters / aggs.
# ---------------------------------------------------------------------------

JOIN_TYPES = ["inner", "left", "left_semi", "left_anti"]
CUST_FILTERS = [("c_acctbal", ">", 0.0), ("c_mktsegment", "=", "BUILDING"),
                ("c_nationkey", "<", 13), ("c_acctbal", "<=", 5000.0)]

join_st = st.fixed_dictionaries(
    {
        "how": st.sampled_from(JOIN_TYPES),
        "cust_filter": st.one_of(st.none(), st.sampled_from(CUST_FILTERS)),
        "status_filter": st.one_of(st.none(), st.sampled_from(["F", "O", "P"])),
    }
)


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_SMALL}/orders.parquet")


@pytest.fixture(scope="module")
def customer(spark):
    return spark.read.parquet(f"{SF_SMALL}/customer.parquet")


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=join_st)
def test_random_join_matches_oracle(spark, orders, customer, oracle_con, q):
    cust = customer
    cust_where = ""
    if q["cust_filter"] is not None:
        col, op, v = q["cust_filter"]
        lit = f"'{v}'" if isinstance(v, str) else repr(v)
        cust_where = f"WHERE {col} {op} {lit}"
        spark_op = {"<": "__lt__", "<=": "__le__", ">": "__gt__", "=": "__eq__"}[op]
        cust = cust.filter(getattr(F.col(col), spark_op)(v))

    ords = orders
    ord_where = ""
    if q["status_filter"] is not None:
        ord_where = f"WHERE o_orderstatus = '{q['status_filter']}'"
        ords = ords.filter(F.col("o_orderstatus") == q["status_filter"])

    joined = ords.join(cust, ords.o_custkey == cust.c_custkey, q["how"])
    df = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )

    semi = {"left_semi": "SEMI", "left_anti": "ANTI"}.get(q["how"])
    if semi:
        sql = f"""
            SELECT COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS sum_price
            FROM (SELECT * FROM orders {ord_where}) o
            {semi} JOIN (SELECT * FROM customer {cust_where}) c
              ON o.o_custkey = c.c_custkey"""
    else:
        how_sql = {"inner": "JOIN", "left": "LEFT JOIN"}[q["how"]]
        sql = f"""
            SELECT COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS sum_price
            FROM (SELECT * FROM orders {ord_where}) o
            {how_sql} (SELECT * FROM customer {cust_where}) c
              ON o.o_custkey = c.c_custkey"""
    compare(df, oracle_con.execute(sql).fetchdf(), name=sql)


# ---------------------------------------------------------------------------
# Window shapes: ranking/offset/frame aggregates with unique-key tiebreak.
# ---------------------------------------------------------------------------

WINDOW_PARTS = ["o_orderstatus", "o_orderpriority"]
WINDOW_FNS = {
    "rn": (
        "ROW_NUMBER() OVER w",
        lambda w: F.row_number().over(w),
    ),
    "rnk": (
        "RANK() OVER w",
        lambda w: F.rank().over(w),
    ),
    "prev_price": (
        "LAG(o_totalprice) OVER w",
        lambda w: F.lag("o_totalprice").over(w),
    ),
    "run_sum": (
        # integer running sum: exact in both engines regardless of the
        # window aggregator's internal summation order
        "SUM(o_orderkey) OVER (PARTITION BY __part ORDER BY __ord ROWS UNBOUNDED PRECEDING)",
        lambda w: F.sum("o_orderkey").over(
            w.rowsBetween(-9223372036854775808, 0)  # Window.unboundedPreceding
        ),
    ),
}

window_st = st.fixed_dictionaries(
    {
        "part": st.sampled_from(WINDOW_PARTS),
        "fns": st.lists(st.sampled_from(sorted(WINDOW_FNS)), min_size=1, max_size=3, unique=True),
        "desc": st.booleans(),
    }
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=window_st)
def test_random_window_matches_oracle(spark, orders, oracle_con, q):
    from pyspark.sql import Window

    order_sql = "o_orderdate DESC, o_orderkey DESC" if q["desc"] else "o_orderdate, o_orderkey"
    w = Window.partitionBy(q["part"]).orderBy(
        *([F.desc("o_orderdate"), F.desc("o_orderkey")] if q["desc"] else ["o_orderdate", "o_orderkey"])
    )
    df = orders.select(
        "o_orderkey",
        *[WINDOW_FNS[f][1](w).alias(f) for f in q["fns"]],
    ).orderBy("o_orderkey").limit(2000)

    fn_sql = ", ".join(
        WINDOW_FNS[f][0].replace("__part", q["part"]).replace("__ord", order_sql)
        + f" AS {f}"
        for f in q["fns"]
    )
    sql = f"""
        SELECT o_orderkey, {fn_sql}
        FROM orders
        WINDOW w AS (PARTITION BY {q['part']} ORDER BY {order_sql})
        ORDER BY o_orderkey LIMIT 2000"""
    compare(df, oracle_con.execute(sql).fetchdf(), name=sql)

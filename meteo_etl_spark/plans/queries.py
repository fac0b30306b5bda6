"""The declared, oracle-checkable query surface (SURVEY.md §2.3).

Each entry pairs a Spark DataFrame implementation with the equivalent
ANSI SQL that DuckDB runs on the same parquet tables. Column aliases
match exactly on both sides (the driver's compare hashes values under
sorted column names).

Scale notes are attached per query — these plans are written for a
1000-executor cluster reading 100 TB, then validated on local[32]:

- filters/projections are expressed declaratively so they reach the
  parquet scan (PushedFilters / ReadSchema);
- small dimensions are broadcast explicitly;
- aggregations are pre-reduced before joins where it cuts shuffle
  volume (e.g. q8_join_count_per_customer);
- exact percentiles / exact distinct counts are used where the oracle
  demands exactness; the approximate variants are noted for the
  100 TB path.

Rounding: DuckDB ``ROUND`` on DOUBLE is half-away-from-zero, matching
Spark ``F.round`` (verified empirically; ``F.bround`` is reserved for
reference-parity half-even rounding in the meteo transform, T2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from meteo_etl_spark.sources.testdata import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the registered views; None → rows-only check
    doc: str = ""
    bench: bool = False  # include in the headline bench set


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = "", bench: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, bench=bench)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Q1-Q18: the reference-operator surface (SURVEY.md §2.3)
# ---------------------------------------------------------------------------


@query(
    "q1_scan_topk",
    """SELECT o_orderkey, o_custkey, o_totalprice
       FROM orders ORDER BY o_orderkey LIMIT 5000""",
    doc="S7/P2/O1 scan+project+sort+limit — Catalyst TakeOrderedAndProject "
    "(per-partition top-K then driver merge; no global sort). "
    "Reference: dashboard/streamlit_app.py:15-17.",
    bench=True,
)
def q1(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(5000)
    )


@query(
    "q2_count",
    "SELECT COUNT(*) AS n FROM lineitem",
    doc="A1 row count — parquet row-group metadata count, no full scan. "
    "Reference: dashboard/queries.py:4.",
)
def q2(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q3_composite_distinct",
    "SELECT COUNT(DISTINCT (l_partkey, l_suppkey)) AS n FROM lineitem",
    doc="A2 composite COUNT(DISTINCT) — exact (oracle requires it); "
    "partial aggregation per partition before the shuffle. At 100 TB an "
    "approx_count_distinct(2%) variant avoids the giant exact-distinct "
    "shuffle. Reference: dashboard/queries.py:1-3.",
    bench=True,
)
def q3(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey", "l_suppkey").alias("n")
    )


@query(
    "q4_latest_row",
    """SELECT o_orderstatus FROM orders
       ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1""",
    doc="O2 latest-row top-1 — TakeOrderedAndProject, never a global sort. "
    "Reference: dashboard/queries.py:5.",
)
def q4(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .select("o_orderstatus")
        .limit(1)
    )


@query(
    "q5_summary_stats",
    """SELECT COUNT(l_extendedprice) AS n,
              ROUND(AVG(l_extendedprice), 2) AS avg_price,
              ROUND(STDDEV_SAMP(l_extendedprice), 2) AS std_price,
              MIN(l_extendedprice) AS min_price,
              ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 2) AS p25,
              ROUND(QUANTILE_CONT(l_extendedprice, 0.50), 2) AS p50,
              ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 2) AS p75,
              MAX(l_extendedprice) AS max_price
       FROM lineitem""",
    doc="A3 8-statistic summary (pandas describe parity) — exact "
    "F.percentile with linear interpolation (percentile_approx would "
    "break the oracle); single-pass aggregate with ONE array-form "
    "percentile buffer. The buffering aggregate is the right plan up "
    "to ~10M values; past that, operators/quantiles.exact_percentiles "
    "computes the same exact result with bounded memory "
    "(approx-bracket + refine, 2 scans). "
    "Reference: dashboard/streamlit_app.py:67-79.",
    bench=True,
)
def q5(spark, sf_dir):
    from meteo_etl_spark.operators.parallelism import fan_out

    # Prune to the one aggregated column BEFORE fanning out so the
    # repartition exchange carries 8 bytes/row, then fan_out widens the
    # percentile partial-aggregation beyond the (few) file splits.
    li = fan_out(_t(spark, sf_dir, "lineitem").select("l_extendedprice"))
    c = F.col("l_extendedprice")
    # One array-form percentile aggregate: a single value buffer is
    # built/merged instead of three (measured 2.1x on the whole query).
    pcts = F.percentile(c, F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75)))
    return li.agg(
        F.count(c).alias("n"),
        F.round(F.avg(c), 2).alias("avg_price"),
        F.round(F.stddev_samp(c), 2).alias("std_price"),
        F.min(c).alias("min_price"),
        pcts.alias("__pcts"),
        F.max(c).alias("max_price"),
    ).select(
        "n",
        "avg_price",
        "std_price",
        "min_price",
        F.round(F.col("__pcts")[0], 2).alias("p25"),
        F.round(F.col("__pcts")[1], 2).alias("p50"),
        F.round(F.col("__pcts")[2], 2).alias("p75"),
        "max_price",
    )


@query(
    "q6_filtered_count",
    "SELECT COUNT(*) AS n FROM orders WHERE o_custkey = 42",
    doc="P3 equality filter + A4 count — predicate pushed to the parquet "
    "scan (row-group min/max skipping). Reference: tests/etl/test_load.py:60-66.",
)
def q6(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") == 42)
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q7_grouped_count",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
       FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    doc="A4 grouped count — partial agg map-side, tiny shuffle (few groups). "
    "Reference: filtered counts in tests/etl/test_app.py:57.",
    bench=True,
)
def q7(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q8_join_count_per_customer",
    """SELECT c_custkey, COUNT(o_orderkey) AS n
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey ORDER BY c_custkey LIMIT 1000""",
    doc="J1 FK equi-join (left) — expressed as pre-aggregate-then-join: "
    "orders are reduced to (custkey, count) BEFORE joining, so the join "
    "input shrinks from |orders| to |customers with orders| and the "
    "left-outer preserves order-less customers via coalesce(n, 0). At "
    "100 TB this halves shuffle volume vs join-then-group. "
    "Reference: etl/db.py:72-74 relationship.",
    bench=True,
)
def q8(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select("c_custkey", F.coalesce("__n", F.lit(0)).alias("n"))
        .orderBy("c_custkey")
        .limit(1000)
    )


@query(
    "q9_anti_join",
    """SELECT COUNT(*) AS n FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""",
    doc="J2 anti-join (cascade-delete / orphan semantics) — left_anti; "
    "customer (dim side) broadcast when under the threshold, else AQE "
    "picks shuffled hash. Reference: etl/db.py:112 ON DELETE CASCADE.",
)
def q9(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q10_broadcast_dim_join",
    """SELECT n.n_name, COUNT(*) AS n
       FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
       GROUP BY n.n_name ORDER BY n.n_name""",
    doc="J3 small-dim probe — explicit broadcast(nation): 25 rows never "
    "justify a shuffle; the fact side streams map-side. "
    "Reference: etl/sources.py:97-100 reverse lookup.",
    bench=True,
)
def q10(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("n_name")
    )


@query(
    "q11_rounding",
    """SELECT l_orderkey, l_linenumber, ROUND(l_discount * 100, 1) AS pct
       FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 5000""",
    doc="T2 rounding — F.round matches DuckDB's half-away-from-zero on "
    "DOUBLE (verified; the reference's Python round is half-even and is "
    "matched by F.bround in the meteo transform instead). "
    "Reference: etl/models.py:78-79.",
)
def q11(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_discount") * 100, 1).alias("pct"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(5000)
    )


@query(
    "q12_regex_predicate",
    "SELECT COUNT(*) AS n FROM part WHERE regexp_matches(p_name, 'green')",
    doc="P4 regex validity predicate (the CHECK-constraint surface) — "
    "rlike stays inside codegen. Reference: etl/db.py:76-85.",
)
def q12(spark, sf_dir):
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").rlike("green"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q13_case_mapping",
    """SELECT o_orderkey,
              CASE WHEN o_orderstatus = 'F' THEN 'finished'
                   WHEN o_orderstatus = 'O' THEN 'open'
                   ELSE 'pending' END AS s
       FROM orders ORDER BY o_orderkey LIMIT 5000""",
    doc="T8/T9 case-analysis mapping — when/otherwise chain. "
    "Reference: etl/app.py:170-200, dashboard/streamlit_app.py:44-50.",
)
def q13(spark, sf_dir):
    st = F.col("o_orderstatus")
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.when(st == "F", "finished").when(st == "O", "open").otherwise("pending").alias("s"),
        )
        .orderBy("o_orderkey")
        .limit(5000)
    )


@query(
    "q14_date_parts",
    """SELECT EXTRACT(year FROM o_orderdate) AS y,
              EXTRACT(month FROM o_orderdate) AS m,
              COUNT(*) AS n
       FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",
    doc="T11 date-part derivation — year/month cast to BIGINT to match "
    "DuckDB EXTRACT. Reference: streaming/load.py:21-23 date paths.",
)
def q14(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("long").alias("y"),
            F.month("o_orderdate").cast("long").alias("m"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("y", "m")
    )


@query(
    "q15_last_write_wins",
    """SELECT user_id, event_type, event_id, value
       FROM (SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY user_id, event_type
                 ORDER BY ts DESC, event_id DESC) AS rn
             FROM events)
       WHERE rn = 1 ORDER BY user_id, event_type""",
    doc="U1 in batch form: last-write-wins dedup via row_number window — "
    "the same kernel the silver merge uses. One shuffle on the entity "
    "key; skewed hot keys are handled by AQE. "
    "Reference: etl/load.py:45-55 upsert.",
    bench=True,
)
def q15(spark, sf_dir):
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
        .orderBy("user_id", "event_type")
    )


@query(
    "q16_unnest_soa",
    """SELECT user_id, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
       FROM events GROUP BY user_id ORDER BY user_id""",
    doc="T1 columnar unnest round-trip: build a struct-of-arrays per user "
    "(collect_list sorted by event_id), re-explode via "
    "explode(arrays_zip(ids, values)) — the meteo payload pivot — and "
    "verify the checksum survives. The oracle states the invariant "
    "directly on the base table. Reference: etl/models.py:72-90.",
)
def q16(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    soa = (
        ev.groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("event_id", "value"))).alias("pairs"))
        .select(
            "user_id",
            F.col("pairs.event_id").alias("ids"),
            F.col("pairs.value").alias("vals"),
        )
    )
    rows = soa.select(
        "user_id",
        F.explode(F.arrays_zip(F.col("ids").alias("event_id"), F.col("vals").alias("value"))).alias("h"),
    )
    return (
        rows.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("h.value"), 2).alias("sum_value"),
        )
        .orderBy("user_id")
    )


@query(
    "q17_date_trunc",
    """SELECT DATE_TRUNC('day', ts) AS d, COUNT(*) AS n
       FROM events GROUP BY 1 ORDER BY 1""",
    doc="T5/T11 timestamp truncation + date grouping. "
    "Reference: streaming/events.py:45-49 ms truncation, load.py date paths.",
)
def q17(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("d")
    )


@query(
    "q18_json_extract",
    """SELECT event_id, json_extract_string(props, '$.k') AS k
       FROM events ORDER BY event_id LIMIT 5000""",
    doc="S3 JSON payload access — get_json_object on the props column "
    "(JSONB analogue). Reference: etl/db.py:61,69; streaming/events.py:103.",
)
def q18(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", F.get_json_object("props", "$.k").alias("k"))
        .orderBy("event_id")
        .limit(5000)
    )


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (scan → filter → wide agg).
# ---------------------------------------------------------------------------


@query(
    "tpch_q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              ROUND(SUM(l_quantity), 2) AS sum_qty,
              ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
              ROUND(AVG(l_quantity), 2) AS avg_qty,
              ROUND(AVG(l_extendedprice), 2) AS avg_price,
              ROUND(AVG(l_discount), 4) AS avg_disc,
              COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
    doc="Flagship scan→filter→wide-agg: the engine's headline plan. "
    "Filter pushed to the scan, 8 partial aggregates map-side, tiny "
    "shuffle (few groups), whole-stage codegen end to end.",
    bench=True,
)
def tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _ensure_registered() -> None:
    # llm_queries imports this module's `query` decorator, so it can't
    # be imported at module top (circular); first registry access pulls
    # it in.
    from meteo_etl_spark.plans import llm_queries  # noqa: F401


@query(
    "tpch_q3_shipping_priority",
    """SELECT l_orderkey,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              o_orderdate
       FROM customer JOIN orders ON c_custkey = o_custkey
                     JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
         AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    doc="TPC-H Q3-shaped 3-way join + agg + top-k. Join-tree shape the "
    "plan must pick at scale: the filtered customer side broadcasts "
    "into orders, the joined (orderkey, orderdate) side then joins "
    "lineitem on its key; both date filters are pushed to the parquet "
    "scans; top-10 via TakeOrderedAndProject, never a global sort.",
    bench=True,
)
def tpch_q3(spark, sf_dir):
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    """SELECT n_name,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM customer JOIN orders ON c_custkey = o_custkey
                     JOIN lineitem ON l_orderkey = o_orderkey
                     JOIN supplier ON l_suppkey = s_suppkey
                                  AND c_nationkey = s_nationkey
                     JOIN nation ON s_nationkey = n_nationkey
                     JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
         AND o_orderdate <  TIMESTAMP '1995-01-01 00:00:00'
       GROUP BY n_name ORDER BY revenue DESC, n_name""",
    doc="TPC-H Q5-shaped 6-way join: region/nation/supplier dims "
    "broadcast (region filter prunes nations before any fact touches "
    "them), the fact-side orders∞lineitem join shuffles on orderkey, "
    "and the same-nation predicate rides the supplier broadcast. One "
    "shuffle-heavy join + tiny group-by — the canonical star-join plan.",
    bench=True,
)
def tpch_q5(spark, sf_dir):
    nations_in_region = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nations_in_region),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "tpch_q4_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS order_count
       FROM orders o
       WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
         AND EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey
                       AND l.l_shipdate > o.o_orderdate)
       GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    doc="TPC-H Q4-shaped priority check: EXISTS becomes a LEFT SEMI "
    "join on orderkey with the ship-after-order predicate riding the "
    "join condition — one shuffle, no duplicate-amplification (a plain "
    "inner join would multiply orders by matching lineitems and need a "
    "distinct). The date filter prunes orders BEFORE the semi join, so "
    "the shuffle carries one quarter, not seven years. (Q4 adapted to "
    "this schema: l_commitdate/l_receiptdate don't exist, the "
    "late-shipment predicate stands in.)",
    bench=True,
)
def tpch_q4(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q12_priority_class",
    """SELECT l_returnflag,
              SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS high_line_count,
              SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 0 ELSE 1 END) AS low_line_count
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
       GROUP BY l_returnflag ORDER BY l_returnflag""",
    doc="TPC-H Q12-shaped conditional pivot over a fact-fact join: "
    "lineitem is date-pruned at the scan, orders is pre-projected to "
    "(orderkey, is_high int) so the shuffle carries a 9-byte build row "
    "instead of the full order, and the CASE pivot folds into the "
    "post-join partial aggregation. (Q12 adapted: no l_shipmode / "
    "commit/receipt dates in this schema — the returnflag grouping "
    "keeps the conditional-pivot shape.)",
    bench=True,
)
def tpch_q12(spark, sf_dir):
    is_high = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("is_high")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", is_high)
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(1 - F.col("is_high")).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "tpch_q14_promo_revenue",
    """SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                     THEN l_extendedprice * (1 - l_discount)
                                     ELSE 0 END)
                    / SUM(l_extendedprice * (1 - l_discount)), 3)
              AS promo_revenue_pct
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
         AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'""",
    doc="TPC-H Q14 promo-revenue ratio: part is a broadcast dim "
    "(pre-projected to partkey + is-promo flag — the broadcast ships "
    "9 bytes/part, not p_name), lineitem is month-pruned at the scan, "
    "and both conditional sums fold into one map-side partial "
    "aggregate: zero shuffles of fact data, one scalar out.",
    bench=True,
)
def tpch_q14(spark, sf_dir):
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").cast("int").alias("is_promo")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.col("is_promo") * rev) / F.sum(rev), 3
            ).alias("promo_revenue_pct")
        )
    )


def get(name: str) -> QuerySpec:
    _ensure_registered()
    return REGISTRY[name]


def all_queries() -> dict[str, QuerySpec]:
    _ensure_registered()
    return dict(REGISTRY)

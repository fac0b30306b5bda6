"""Dashboard analytics surface (SURVEY.md §3.3) over the warehouse.

The reference dashboard's whole query surface
(`dashboard/queries.py:1-5`, `dashboard/streamlit_app.py:14-87`) as
DataFrame functions: bounded scans, the three count tiles, the
8-statistic describe() summary, and the latest-job status label.
``collect()`` only ever touches <= 8-row aggregate results or the
LIMIT-bounded scans — nothing here pulls an unbounded table to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meteo_etl_spark.pipeline.control import read_fetch_metadata
from meteo_etl_spark.pipeline.warehouse import Warehouse, read_observations

#: dashboard scan bound (reference `dashboard/streamlit_app.py:16,23`).
SCAN_LIMIT = 5000

#: numeric observation columns summarized by describe() — the measures
#: the reference surfaces as metric tiles (`streamlit_app.py:70-79`).
SUMMARY_COLS = ("temperature", "precipitation", "wind_speed")


def load_observations(spark: SparkSession, wh: Warehouse) -> DataFrame:
    """O1: `SELECT * FROM weather_observations ORDER BY timestamp
    LIMIT 5000` (`streamlit_app.py:14-18`) — TakeOrderedAndProject."""
    return read_observations(spark, wh).orderBy("timestamp").limit(SCAN_LIMIT)


def load_metadata(spark: SparkSession, wh: Warehouse) -> DataFrame:
    """O1: metadata scan ordered by created_at (`streamlit_app.py:20-25`)."""
    return read_fetch_metadata(spark, wh).orderBy("created_at").limit(SCAN_LIMIT)


def get_counts(spark: SparkSession, wh: Warehouse) -> tuple[int, int, int]:
    """A1 + A2 tiles (`streamlit_app.py:28-38`, `queries.py:1-4`):
    (observations, metadata, distinct locations). The two observation
    aggregates run in ONE job — a single scan feeds count(*) and the
    composite count-distinct."""
    obs_row = (
        read_observations(spark, wh)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("longitude", "latitude").alias("locations"),
        )
        .collect()[0]
    )
    meta_count = read_fetch_metadata(spark, wh).count()
    return obs_row.n, meta_count, obs_row.locations


def describe_observations(spark: SparkSession, wh: Warehouse) -> DataFrame:
    """A3: the pandas ``describe()`` 8-statistic summary
    (`streamlit_app.py:67`), computed engine-side in one aggregate:
    count / mean / stddev_samp / min / exact quartiles (linear
    interpolation, percentile — NOT approx) / max per measure column.

    Output: one row per measure, columns (measure, count, mean, std,
    min, p25, p50, p75, max) — the transposed describe() frame.

    Percentile routing: below SPARK_GRAFT_PCT_BUFFER_MAX_BYTES of
    input the quartiles come from the one-pass ``F.percentile``
    buffer; above it (the 100 TB regime, where that buffer is an OOM
    on one reducer) each measure's quartiles are computed by the
    bounded-memory bracket+refine pass
    (operators/quantiles.exact_percentiles) and injected as literals —
    identical values either way."""
    from meteo_etl_spark.operators.quantiles import (
        buffering_percentile_safe,
        exact_percentiles,
    )

    obs = read_observations(spark, wh)
    buffer_safe = buffering_percentile_safe(obs.select(*SUMMARY_COLS))
    aggs = []
    for m in SUMMARY_COLS:
        c = F.col(m)
        if buffer_safe:
            pcts = F.percentile(c, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
        else:
            vals = exact_percentiles(obs.select(m), m, [0.25, 0.5, 0.75])
            pcts = F.array(*[F.lit(v) for v in vals])
        aggs.append(
            F.struct(
                F.lit(m).alias("measure"),
                F.count(c).alias("count"),
                F.avg(c).alias("mean"),
                F.stddev_samp(c).alias("std"),
                F.min(c).alias("min"),
                pcts[0].alias("p25"),
                pcts[1].alias("p50"),
                pcts[2].alias("p75"),
                F.max(c).alias("max"),
            ).alias(m)
        )
    row = obs.agg(*aggs)
    stacked = row.select(
        F.explode(F.array(*[F.col(m) for m in SUMMARY_COLS])).alias("s")
    )
    return stacked.select("s.*")


def mean_tiles(spark: SparkSession, wh: Warehouse) -> dict[str, float | None]:
    """The three metric tiles (`streamlit_app.py:70-79`): global mean
    temperature / wind_speed / precipitation rounded to 2 dp with
    half-even (pandas-display parity -> bround)."""
    rows = describe_observations(spark, wh).select(
        "measure", F.bround("mean", 2).alias("mean")
    ).collect()
    means = {r.measure: r.mean for r in rows}
    return {m: means.get(m) for m in SUMMARY_COLS}


def last_job_status(spark: SparkSession, wh: Warehouse) -> str | None:
    """O2 + T9 (`queries.py:5`, `streamlit_app.py:41-50`): latest status
    by created_at, rendered as an emoji-prefixed capitalized label.

    ``max_by`` replaces ORDER BY created_at DESC LIMIT 1 — a single
    aggregate, no sort. Note: the reference capitalizes BEFORE matching
    (`streamlit_app.py:43-44`), so its error/pending arms can never
    match and everything renders green — this engine implements the
    intended mapping and documents the deviation.
    """
    meta = read_fetch_metadata(spark, wh)
    rows = meta.agg(F.max_by("status", "created_at").alias("status")).collect()
    status = rows[0].status if rows else None
    if status is None:
        return None
    label = status.capitalize()
    return {"error": f"🔴 {label}", "pending": f"🟡 {label}"}.get(status, f"🟢 {label}")

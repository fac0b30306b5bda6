"""Distributed HTTP ingestion as a Spark 4 Python DataSource.

The reference fetches coordinates one at a time on the driver
(`etl/app.py:95-167` loops jobs; `etl/extract.py:17-84` does one GET).
That is correct for one payload but serializes a backfill: a thousand
coordinate/date fetches should fan out across the cluster. Spark 4's
Python DataSource API makes that idiomatic:

    spark.dataSource.register(MeteoHttpDataSource)
    df = (spark.read.format("meteo_http")
          .option("url", "https://archive-api.open-meteo.com/v1/archive")
          .option("jobs", json.dumps([{"latitude": 3.1, "longitude": 5.2},
                                      {"latitude": 8.0, "longitude": 1.4}]))
          .load())
    # df: one row per job — (latitude, longitude, payload, error)

One ``InputPartition`` per job: each EXECUTOR performs its own GET with
the engine's full retry/backoff policy (`sources/http.fetch_json` — 5
retries, backoff 0.5, Retry-After honored), so a backfill of N
coordinates runs min(N, cores) fetches concurrently, with per-task
retry isolation and speculative re-execution for free. Failures land in
the ``error`` column instead of killing the scan (per-row dead-letter,
matching the pipeline's T8 taxonomy) — callers split on
``error IS NULL``.

The payload lands as a raw JSON string: parsing into the typed struct
stays in ``from_json`` (JVM-side, Catalyst-optimizable), so the Python
boundary carries bytes, not work. Downstream is the existing bronze →
normalize → merge path.

Scale note: this is the INGESTION-edge operator; ergonomics cap out at
~1e4 fetch jobs per scan (one partition each). At 100 TB the bulk data
arrives via object storage/Kafka — but the fetch edge still exists
(backfills, reconciliation), and this makes it cluster-parallel instead
of a driver for-loop.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

#: DDL schema of the scan output.
SCHEMA_DDL = "latitude double, longitude double, payload string, error string"


class FetchJob(InputPartition):
    def __init__(self, index: int, params: dict):
        self.index = index
        self.params = params


class MeteoHttpDataSource(DataSource):
    """``format("meteo_http")`` — executor-parallel HTTP JSON fetch."""

    @classmethod
    def name(cls) -> str:
        return "meteo_http"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> "MeteoHttpReader":
        return MeteoHttpReader(self.options)


class MeteoHttpReader(DataSourceReader):
    def __init__(self, options: dict):
        self.url = options.get("url")
        if not self.url:
            raise ValueError("meteo_http requires .option('url', ...)")
        try:
            self.jobs = json.loads(options.get("jobs", "[]"))
        except json.JSONDecodeError as exc:
            raise ValueError(f"meteo_http .option('jobs') is not JSON: {exc}") from exc
        if not isinstance(self.jobs, list) or not self.jobs:
            raise ValueError("meteo_http requires .option('jobs', '[{...}, ...]')")
        self.static_params = json.loads(options.get("static_params", "{}"))
        self.user_agent = options.get("user_agent")
        self.timeout = float(options.get("timeout", "30"))

    def partitions(self) -> list[FetchJob]:
        # One partition per fetch job: the scheduler spreads them over
        # executors; per-task retry/speculation isolates slow upstreams.
        return [FetchJob(i, job) for i, job in enumerate(self.jobs)]

    def read(self, partition: FetchJob) -> Iterator[tuple]:
        # Runs ON THE EXECUTOR. Import inside: the module must not drag
        # driver-only state into the serialized reader.
        from meteo_etl_spark.errors import ExtractError
        from meteo_etl_spark.sources import http

        params = {**self.static_params, **partition.params}
        kwargs = {"timeout": self.timeout}
        if self.user_agent:
            kwargs["user_agent"] = self.user_agent
        lat = lon = float("nan")
        try:
            # Coordinate coercion is inside the dead-letter boundary: a
            # job with a null/non-numeric latitude must produce an error
            # ROW, not a task failure that kills the whole scan.
            lat = float(params.get("latitude", float("nan")))
            lon = float(params.get("longitude", float("nan")))
            payload = http.fetch_json(self.url, params, **kwargs)
            yield (lat, lon, json.dumps(payload), None)
        except (ExtractError, json.JSONDecodeError, TypeError, ValueError) as exc:
            # Per-row dead-letter: a failed coordinate must not kill a
            # thousand-job backfill scan (T8 error taxonomy).
            yield (lat, lon, None, f"{type(exc).__name__}: {exc}"[:1000])


def register(spark) -> None:
    spark.dataSource.register(MeteoHttpDataSource)

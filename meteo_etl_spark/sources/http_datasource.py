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

By default one ``InputPartition`` per job: each EXECUTOR performs its
own GET with the engine's full retry/backoff policy
(`sources/http.fetch_json` — 5 retries, backoff 0.5, Retry-After
honored), so a backfill of N coordinates runs min(N, cores) fetches
concurrently, with per-task retry isolation and speculative
re-execution for free. Failures land in the ``error`` column instead
of killing the scan (per-row dead-letter, matching the pipeline's T8
taxonomy) — callers split on ``error IS NULL``.

``.option("max_partitions", K)`` caps the partition count: jobs are
chunked ~evenly into at most K partitions and fetched sequentially
inside each task. One-partition-per-job scheduling overhead dominates
somewhere past ~1e4 jobs (task launch ≫ task work, and the scheduler
queues a task storm); chunking keeps a million-coordinate backfill at
a sane task count while per-JOB dead-letter semantics stay identical —
one failed fetch poisons neither its task nor its chunk-mates.

The payload lands as a raw JSON string: parsing into the typed struct
stays in ``from_json`` (JVM-side, Catalyst-optimizable), so the Python
boundary carries bytes, not work. Downstream is the existing bronze →
normalize → merge path.

Scale note: this is the INGESTION-edge operator. At 100 TB the bulk
data arrives via object storage/Kafka — but the fetch edge still
exists (backfills, reconciliation), and this makes it cluster-parallel
instead of a driver for-loop.
"""

from __future__ import annotations

import json
import math
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

#: DDL schema of the scan output.
SCHEMA_DDL = "latitude double, longitude double, payload string, error string"


class FetchJob(InputPartition):
    """One scan partition: a chunk of fetch jobs run sequentially
    inside a single task (chunk size 1 unless ``max_partitions``)."""

    def __init__(self, index: int, jobs: list[dict]):
        self.index = index
        self.jobs = jobs


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
        mp = options.get("max_partitions")
        self.max_partitions = int(mp) if mp is not None else None
        if self.max_partitions is not None and self.max_partitions < 1:
            raise ValueError("meteo_http max_partitions must be >= 1")

    def partitions(self) -> list[FetchJob]:
        # Default: one partition per fetch job — the scheduler spreads
        # them over executors; per-task retry/speculation isolates slow
        # upstreams. With max_partitions, contiguous ~even chunks keep
        # the task count bounded for very large backfills.
        if self.max_partitions is None or self.max_partitions >= len(self.jobs):
            return [FetchJob(i, [job]) for i, job in enumerate(self.jobs)]
        chunk = math.ceil(len(self.jobs) / self.max_partitions)
        return [
            FetchJob(i, self.jobs[lo:lo + chunk])
            for i, lo in enumerate(range(0, len(self.jobs), chunk))
        ]

    def read(self, partition: FetchJob) -> Iterator[tuple]:
        # Runs ON THE EXECUTOR. Import inside: the module must not drag
        # driver-only state into the serialized reader.
        from meteo_etl_spark.errors import ExtractError
        from meteo_etl_spark.sources import http

        kwargs = {"timeout": self.timeout}
        if self.user_agent:
            kwargs["user_agent"] = self.user_agent
        for job in partition.jobs:
            params = {**self.static_params, **job}
            lat = lon = float("nan")
            try:
                # Coercion inside the dead-letter boundary: a job with a
                # null/non-numeric latitude must produce an error ROW,
                # not a task failure that kills the whole scan.
                lat = float(params.get("latitude", float("nan")))
                lon = float(params.get("longitude", float("nan")))
                payload = http.fetch_json(self.url, params, **kwargs)
                yield (lat, lon, json.dumps(payload), None)
            except (ExtractError, json.JSONDecodeError, TypeError, ValueError) as exc:
                # Per-JOB dead-letter: a failed coordinate must kill
                # neither the scan nor its chunk-mates (T8 taxonomy).
                yield (lat, lon, None, f"{type(exc).__name__}: {exc}"[:1000])


def register(spark) -> None:
    spark.dataSource.register(MeteoHttpDataSource)

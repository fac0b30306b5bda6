"""The 3-step batch ETL lifecycle (reference `etl/app.py:95-167`).

1. Register: append a PENDING ``fetch_metadata`` row (txn #1).
2. Run the fetch job (pluggable strategy — reference `etl/app.py:84-104`):
   default = extract → normalize → merge into silver; streaming variant =
   extract → save raw payload to bronze (``extract_and_save_to_disk``,
   reference `streaming/load.py:32-39`).
3. Finalize: keyed control-table update with the error taxonomy
   (T8, reference `etl/app.py:170-200`): LoadError→200,
   ExtractError→upstream HTTP status, JSON decode→200, unexpected→500.

Like the reference, the three steps are separate transactions — a crash
between #1 and #3 leaves a PENDING row (no distributed atomicity; the
control table is the observability record of exactly that).
"""

from __future__ import annotations

import json
import traceback
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import SparkSession

from meteo_etl_spark.errors import ETLError, ExtractError, LoadError
from meteo_etl_spark.pipeline import control
from meteo_etl_spark.pipeline.warehouse import Warehouse, merge_observations
from meteo_etl_spark.schemas import FETCH_STATUS_ERROR, FETCH_STATUS_SUCCESS
from meteo_etl_spark.sources import bronze
from meteo_etl_spark.sources.registry import Source, create_source

#: fetch-job strategy: (spark, source, fetch_id, warehouse) -> (result, extra-update-fields)
FetchJob = Callable[[SparkSession, Source, str, Warehouse], tuple[Any, dict[str, Any]]]


@dataclass
class ETLResult:
    """Reference `etl/app.py:38-41`."""

    fetch_id: str
    status: str
    data: Any = None
    error: dict | None = field(default=None)


def extract_and_load(
    spark: SparkSession, source: Source, fetch_id: str, warehouse: Warehouse
) -> tuple[Any, dict[str, Any]]:
    """Default strategy (reference `etl/app.py:84-92`): extract →
    normalize → merge into silver."""
    payload = source.extract()
    records = source.transform(source.payload_to_df(spark, payload))
    stats = merge_observations(spark, warehouse, records, fetch_id=fetch_id)
    return stats, {"response_status": 200}


def extract_and_save_to_disk(
    spark: SparkSession, source: Source, fetch_id: str, warehouse: Warehouse
) -> tuple[Any, dict[str, Any]]:
    """Streaming-producer strategy (reference `streaming/load.py:32-39`):
    extract → land raw payload in bronze; transformation happens in the
    consumer."""
    payload = source.extract()
    path = bronze.save_payload(payload, fetch_id, source.spec.name, warehouse.bronze_dir)
    return path, {"response_status": 200, "payload_path": path}


def classify_error(exc: Exception) -> tuple[int, dict]:
    """T8 error→status-code mapping (reference `etl/app.py:170-200`)."""
    if isinstance(exc, LoadError):
        return 200, {"error": "load", "msg": str(exc)}
    if isinstance(exc, ExtractError):
        return exc.status or 500, {"error": "extract", "msg": str(exc)}
    if isinstance(exc, json.JSONDecodeError):
        return 200, {"error": "json", "msg": str(exc)}
    return 500, {"error": "unexpected", "msg": str(exc), "trace": traceback.format_exc(limit=3)}


def run_etl_many(
    spark: SparkSession,
    warehouse: Warehouse,
    jobs: list[tuple[str, dict[str, Any]]],
    raise_on_error: bool = True,
) -> list[ETLResult]:
    """Batch scale path: N fetch jobs, ONE normalize + ONE merge.

    The reference runs one fetch per process invocation; at scale the
    shape is: register all jobs, extract all payloads (driver-side
    HTTP, small), build ONE payload DataFrame carrying fetch_id, run
    the columnar unnest once, and land everything in a single MERGE —
    per-fetch jobs collapse from N merges (N partition rewrites) into
    one. Control rows are still per-fetch (observability parity);
    extract failures error their own row without failing the batch.

    All jobs must share one source's payload schema per call (group
    callers by source); mixed-source batches are run per group.
    """
    results: list[ETLResult] = []
    extracted: list[tuple[str, Source, dict]] = []
    for source_name, params in jobs:
        source = create_source(source_name, params)
        fetch_id = control.insert_fetch_metadata(
            spark, warehouse, source.url, source.request_params()
        )
        try:
            payload = source.extract()
        except Exception as exc:  # noqa: BLE001 — taxonomy handles every class
            status_code, error_data = classify_error(exc)
            control.update_fetch_metadata(
                spark, warehouse, fetch_id,
                status=FETCH_STATUS_ERROR,
                response_status=status_code, error_data=error_data,
            )
            if raise_on_error:
                raise ETLError(f"etl job failed: {exc}", fetch_id=fetch_id) from exc
            results.append(
                ETLResult(fetch_id=fetch_id, status=FETCH_STATUS_ERROR, error=error_data)
            )
            continue
        extracted.append((fetch_id, source, payload))

    if extracted:
        spec = extracted[0][1].spec
        import pyspark.sql.functions as F
        from pyspark.sql import types as T

        schema = T.StructType(
            list(spec.payload_schema.fields)
            + [T.StructField("fetch_id", T.StringType(), False)]
        )
        payload_df = spark.createDataFrame(
            [{**payload, "fetch_id": fid} for fid, _s, payload in extracted],
            schema=schema,
        )
        records = spec.normalize(payload_df)  # fetch_id passes through (T1)
        stats = merge_observations(spark, warehouse, records)
        for fetch_id, _source, _payload in extracted:
            control.update_fetch_metadata(
                spark, warehouse, fetch_id,
                status=FETCH_STATUS_SUCCESS, response_status=200,
            )
            results.append(
                ETLResult(fetch_id=fetch_id, status=FETCH_STATUS_SUCCESS, data=stats)
            )
    return results


def run_etl(
    spark: SparkSession,
    warehouse: Warehouse,
    source_name: str = "meteo",
    params: dict[str, Any] | None = None,
    fetch_job: FetchJob = extract_and_load,
    raise_on_error: bool = True,
) -> ETLResult:
    """Run one ETL job through the full lifecycle."""
    source = create_source(source_name, params)
    fetch_id = control.insert_fetch_metadata(
        spark, warehouse, source.url, source.request_params()
    )

    try:
        data, extra = fetch_job(spark, source, fetch_id, warehouse)
    except Exception as exc:  # noqa: BLE001 — taxonomy handles every class
        status_code, error_data = classify_error(exc)
        control.update_fetch_metadata(
            spark,
            warehouse,
            fetch_id,
            status=FETCH_STATUS_ERROR,
            response_status=status_code,
            error_data=error_data,
        )
        if raise_on_error:
            raise ETLError(f"etl job failed: {exc}", fetch_id=fetch_id) from exc
        return ETLResult(fetch_id=fetch_id, status=FETCH_STATUS_ERROR, error=error_data)

    control.update_fetch_metadata(
        spark,
        warehouse,
        fetch_id,
        status=FETCH_STATUS_SUCCESS,
        response_status=extra.get("response_status"),
        payload_path=extra.get("payload_path"),
    )
    return ETLResult(fetch_id=fetch_id, status=FETCH_STATUS_SUCCESS, data=data)

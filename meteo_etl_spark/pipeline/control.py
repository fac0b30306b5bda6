"""Control table: the ``fetch_metadata`` job lifecycle (S11/S12, P5).

Reference `etl/db.py:49-85` + `etl/load.py:67-117`: a PENDING row is
appended when a job starts; a keyed update finalizes it, setting
``finished_at`` only when the status is finished ({error, success} —
reference `etl/load.py:104`, `etl/db.py:43-46`).

The table is small (one row per fetch job) and unpartitioned; at scale
the same lifecycle runs against a Delta table with MERGE. Data-quality
regexes from the reference CHECK constraints (`etl/db.py:76-85`) are
validated at write time.
"""

from __future__ import annotations

import json
import re
import uuid
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meteo_etl_spark.errors import LoadError
from meteo_etl_spark.operators.atomic import is_atomic_table, read_table
from meteo_etl_spark.operators.upsert import merge_parquet, table_exists
from meteo_etl_spark.pipeline.warehouse import Warehouse
from meteo_etl_spark.schemas import (
    FETCH_METADATA_SCHEMA,
    FETCH_STATUS_PENDING,
    FETCH_STATUSES,
    FINISHED_STATUSES,
    PAYLOAD_PATH_RE,
    REQUEST_URL_RE,
)

_PAYLOAD_PATH_PAT = re.compile(PAYLOAD_PATH_RE)
_REQUEST_URL_PAT = re.compile(REQUEST_URL_RE)


def _utcnow() -> datetime:
    # Naive-UTC: the engine standardizes every control timestamp on UTC
    # (the reference mixes naive-local and UTC — SURVEY.md §7 watch list).
    return datetime.now(timezone.utc).replace(tzinfo=None)


def insert_fetch_metadata(
    spark: SparkSession,
    warehouse: Warehouse,
    request_url: str,
    request_params: dict[str, Any] | None = None,
) -> str:
    """Append one PENDING job row; returns the generated fetch_id (S11,
    reference `etl/load.py:67-85`)."""
    if not _REQUEST_URL_PAT.match(request_url):
        raise LoadError(f"request_url violates CHECK {REQUEST_URL_RE!r}: {request_url!r}")
    if warehouse.control_jdbc_url:
        from meteo_etl_spark.pipeline import control_jdbc

        return control_jdbc.insert_fetch_metadata(
            spark, warehouse.control_jdbc_url, request_url, request_params, _utcnow()
        )
    fetch_id = str(uuid.uuid4())
    now = _utcnow()
    row = {
        "id": fetch_id,
        "created_at": now,
        "request_timestamp": now,
        "request_params": {str(k): str(v) for k, v in (request_params or {}).items()},
        "request_url": request_url,
        "status": FETCH_STATUS_PENDING,
        "response_status": None,
        "error_data": None,
        "payload_path": None,
        "finished_at": None,
    }
    df = spark.createDataFrame([row], schema=FETCH_METADATA_SCHEMA)
    if warehouse.atomic or is_atomic_table(warehouse.control_path):
        # Atomic layout has no raw-append: a plain file drop would be
        # invisible to the manifest. The id is a fresh uuid, so this is
        # an insert-only merge; the control table is small (one row per
        # job), so the whole-table rewrite is trivial — the same
        # bargain the reference makes with a Postgres metadata table.
        merge_parquet(
            spark,
            warehouse.control_path,
            df,
            key_cols=["id"],
            atomic=True,
            atomic_options=warehouse.atomic_options,
        )
    else:
        df.write.mode("append").parquet(warehouse.control_path)
    return fetch_id


def update_fetch_metadata(
    spark: SparkSession,
    warehouse: Warehouse,
    fetch_id: str,
    *,
    status: str,
    response_status: int | None = None,
    error_data: dict | None = None,
    payload_path: str | None = None,
) -> str:
    """Keyed update of one job row (S12, reference `etl/load.py:88-117`).

    ``finished_at`` is set to now() only when ``status`` is finished
    (reference `etl/load.py:104`).
    """
    if status not in FETCH_STATUSES:
        raise LoadError(f"invalid status {status!r}; expected one of {FETCH_STATUSES}")
    if payload_path is not None and not _PAYLOAD_PATH_PAT.match(payload_path):
        raise LoadError(f"payload_path violates CHECK {PAYLOAD_PATH_RE!r}: {payload_path!r}")

    if warehouse.control_jdbc_url:
        from meteo_etl_spark.pipeline import control_jdbc

        return control_jdbc.update_fetch_metadata(
            spark,
            warehouse.control_jdbc_url,
            fetch_id,
            status=status,
            response_status=response_status,
            error_data=json.dumps(error_data) if error_data is not None else None,
            payload_path=payload_path,
            now=_utcnow(),
        )

    if not table_exists(spark, warehouse.control_path):
        raise LoadError(f"no fetch_metadata table at {warehouse.control_path!r}")
    existing = (
        read_table(spark, warehouse.control_path).filter(F.col("id") == fetch_id).count()
    )
    if existing == 0:
        raise LoadError(f"no fetch_metadata row with id={fetch_id!r}")

    now = _utcnow()
    row = {
        "id": fetch_id,
        "status": status,
        "response_status": response_status,
        "error_data": json.dumps(error_data) if error_data is not None else None,
        "payload_path": payload_path,
        "finished_at": now if status in FINISHED_STATUSES else None,
    }
    from pyspark.sql import types as T

    update_names = ["id", "status", "response_status", "error_data", "payload_path", "finished_at"]
    update_schema = T.StructType([FETCH_METADATA_SCHEMA[n] for n in update_names])
    updates = spark.createDataFrame([row], schema=update_schema)
    stats = merge_parquet(
        spark,
        warehouse.control_path,
        updates,
        key_cols=["id"],
        update_cols=["status", "response_status", "error_data", "payload_path"],
        # finished_at: only overwritten when the update finishes the row
        # (reference `etl/load.py:104` adds it to the SET list conditionally).
        matched_set={"finished_at": lambda t, u: F.coalesce(u["finished_at"], t["finished_at"])},
        atomic=warehouse.atomic,
        atomic_options=warehouse.atomic_options,
    )
    assert stats.updated == 1, f"expected exactly one updated row, got {stats}"
    return fetch_id


def read_fetch_metadata(spark: SparkSession, warehouse: Warehouse) -> DataFrame:
    if warehouse.control_jdbc_url:
        from meteo_etl_spark.pipeline import control_jdbc

        return control_jdbc.read_fetch_metadata(spark, warehouse.control_jdbc_url)
    if not table_exists(spark, warehouse.control_path):
        return spark.createDataFrame([], schema=FETCH_METADATA_SCHEMA)
    df = read_table(spark, warehouse.control_path)
    return df.select(*[f.name for f in FETCH_METADATA_SCHEMA.fields])


def is_finished(df: DataFrame) -> DataFrame:
    """P5: status-domain predicate surface (reference `etl/db.py:34-46`)."""
    return df.withColumn("is_finished", F.col("status").isin(*FINISHED_STATUSES))

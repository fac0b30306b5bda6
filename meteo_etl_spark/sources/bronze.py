"""Bronze data lake: date-partitioned raw payload files (S3/S6).

Mirrors the reference layout ``RAW_DATA_DIR/YYYY/MM/DD/{source}_{fetch_id}
.json`` (reference `streaming/load.py:19-29`, `streaming/config.py:28-29`).

Two write paths:

- ``save_payload`` — one payload dict from the driver-side extractor
  (the reference's exact behavior: one JSON file per fetch).
- ``write_payloads`` — a DataFrame of payloads written with
  ``partitionBy("y","m","d")``; this is the scale path (one job lands a
  whole batch of fetches; readers prune on the date partitions).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def bronze_path(root: str, fetch_id: str, source_name: str, now: datetime | None = None) -> str:
    """Derive the date-partitioned payload path (T11).

    Reference `streaming/load.py:21-23`: zero-padded ``YYYY/MM/DD``.
    """
    now = now or datetime.now(timezone.utc)
    return os.path.join(
        root, f"{now.year:04d}", f"{now.month:02d}", f"{now.day:02d}", f"{source_name}_{fetch_id}.json"
    )


def save_payload(
    payload: dict,
    fetch_id: str,
    source_name: str,
    root: str,
    now: datetime | None = None,
) -> str:
    """Write one raw payload JSON file; returns the path (S6)."""
    path = bronze_path(root, fetch_id, source_name, now)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(payload, f)
    return path


def read_payloads(
    spark: SparkSession, paths: str | list[str], schema: T.StructType
) -> DataFrame:
    """Scan raw payload JSON with a declared schema — inference refused
    (S3; reference `streaming/events.py:98-103`)."""
    return spark.read.schema(schema).json(paths)


def write_payloads(df: DataFrame, root: str, ts_col: str = "ingest_ts") -> None:
    """Batch bronze sink: date-partitioned append (S6, scale path).

    Readers prune on y/m/d; writers only ever append — bronze is
    immutable.
    """
    (
        df.withColumn("y", F.date_format(ts_col, "yyyy"))
        .withColumn("m", F.date_format(ts_col, "MM"))
        .withColumn("d", F.date_format(ts_col, "dd"))
        .write.mode("append")
        .partitionBy("y", "m", "d")
        .json(root)
    )

"""Table statistics for planning decisions: decoded-size estimation
and a safe-broadcast advisor.

The trap this exists for: Spark estimates a path-based relation's
``sizeInBytes`` from its FILES, and parquet files are compressed +
dictionary/RLE encoded — the decoded in-memory size a broadcast
actually materializes is routinely 3-10x larger (wide strings can be
worse). A dimension that looks comfortably under
``spark.sql.autoBroadcastJoinThreshold`` on disk can OOM the driver
when broadcast. The fix is the classic warehouse one (ANALYZE TABLE →
catalog stats; Spark's own CBO does exactly this for catalog tables,
which path tables don't get): collect row count + per-column decoded
widths in ONE aggregate pass, estimate the decoded size as
``rows x Σ avg column width``, persist next to the table, and gate
broadcast hints on THAT.

Scale shape: ``analyze_table`` is one scan with map-side partial
aggregation (avg lengths + null counts + optional HLL
``approx_count_distinct``; no Expand — approximate by default, the
100 TB posture; ``operators/profile.py`` is the exact-census twin).
The stats file is O(columns) bytes.

Reference parity: the reference leans on Postgres' own planner stats
(`etl/db.py` engine); a lake engine must collect its own.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATS_FILE = "_table_stats.json"

#: decoded per-value widths for fixed-width types (bytes, tungsten-ish).
_FIXED = {
    T.BooleanType: 1,
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 4,
    T.FloatType: 4,
    T.LongType: 8,
    T.DoubleType: 8,
    T.DateType: 4,
    T.TimestampType: 8,
    T.TimestampNTZType: 8,
}


@dataclass(frozen=True)
class TableStats:
    rows: int
    file_bytes: int
    decoded_bytes: int  # rows x Σ avg decoded column width
    columns: dict = field(default_factory=dict)  # name -> {width, nulls, [ndv]}

    def to_json(self) -> dict:
        return {
            "rows": self.rows,
            "file_bytes": self.file_bytes,
            "decoded_bytes": self.decoded_bytes,
            "columns": self.columns,
        }


def _width_expr(f: T.StructField):
    """Average decoded width of one column, as an aggregate Column (or
    a constant for fixed-width types)."""
    t = type(f.dataType)
    if t in _FIXED:
        return float(_FIXED[t])
    if t is T.DecimalType:
        return 16.0
    if t is T.StringType or t is T.BinaryType:
        return F.avg(F.coalesce(F.length(F.col(f.name)), F.lit(0)))
    if t is T.ArrayType:
        el = type(f.dataType.elementType)
        per = float(_FIXED.get(el, 16))
        return F.avg(
            F.coalesce(F.size(F.col(f.name)).cast("double"), F.lit(0.0))
        ) * F.lit(per)
    return 32.0  # struct/map fallback — conservative constant


def analyze_table(
    spark: SparkSession,
    path: str,
    *,
    ndv_columns: list[str] | None = None,
    rsd: float = 0.05,
) -> TableStats:
    """ONE-pass stats collection over the parquet table at ``path``
    (atomic or plain layout): row count, average decoded width and
    null count per column, optional HLL distinct counts for
    ``ndv_columns``. Persists ``_table_stats.json`` beside the data
    and returns the stats."""
    from meteo_etl_spark.operators.atomic import read_table

    df = read_table(spark, path)
    aggs: list = [F.count(F.lit(1)).alias("__rows")]
    const_width: dict[str, float] = {}
    for f in df.schema.fields:
        w = _width_expr(f)
        if isinstance(w, float):
            const_width[f.name] = w
        else:
            aggs.append(w.alias(f"__w_{f.name}"))
        aggs.append(
            F.count(F.when(F.col(f.name).isNull(), 1)).alias(f"__n_{f.name}")
        )
    for c in ndv_columns or []:
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"__d_{c}"))
    row = df.agg(*aggs).collect()[0].asDict()

    rows = row["__rows"]
    cols: dict = {}
    total_w = 0.0
    for f in df.schema.fields:
        w = const_width.get(f.name)
        if w is None:
            w = float(row[f"__w_{f.name}"] or 0.0)
        nulls = row[f"__n_{f.name}"]
        cols[f.name] = {"width": round(w, 2), "nulls": nulls}
        if f"__d_{f.name}" in row:
            cols[f.name]["ndv"] = row[f"__d_{f.name}"]
        total_w += w

    file_bytes = 0
    for root, _d, files in os.walk(path):
        file_bytes += sum(
            os.path.getsize(os.path.join(root, x))
            for x in files
            if x.endswith(".parquet")
        )
    stats = TableStats(
        rows=rows,
        file_bytes=file_bytes,
        decoded_bytes=int(rows * total_w),
        columns=cols,
    )
    tmp = os.path.join(path, STATS_FILE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(stats.to_json(), fh)
    os.replace(tmp, os.path.join(path, STATS_FILE))
    return stats


def load_stats(path: str) -> TableStats | None:
    p = os.path.join(path, STATS_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        d = json.load(fh)
    return TableStats(
        rows=d["rows"],
        file_bytes=d["file_bytes"],
        decoded_bytes=d["decoded_bytes"],
        columns=d["columns"],
    )


def broadcast_if_safe(
    df: DataFrame,
    stats: TableStats,
    *,
    threshold_bytes: int | None = None,
) -> DataFrame:
    """Broadcast-hint ``df`` only when its DECODED size fits the
    threshold (default: the session's autoBroadcastJoinThreshold).
    File-size-based thresholds say yes to compressed tables that
    explode on decode; this says yes only when the materialized
    broadcast actually fits."""
    if threshold_bytes is None:
        raw = df.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
        threshold_bytes = _parse_bytes(raw)
    if threshold_bytes >= 0 and stats.decoded_bytes <= threshold_bytes:
        return F.broadcast(df)
    return df


def _parse_bytes(v: str) -> int:
    """Spark size-conf grammar: bare bytes or k/m/g/t with optional b
    (e.g. ``10485760``, ``64m``, ``10MB``)."""
    v = v.strip().lower()
    for suf, m in (
        ("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30), ("tb", 1 << 40),
        ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40),
        ("b", 1),
    ):
        if v.endswith(suf):
            return int(float(v[: -len(suf)])) * m
    return int(v)

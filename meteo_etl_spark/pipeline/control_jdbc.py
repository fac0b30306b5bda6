"""Database-backed control table — the reference's own deployment.

The reference keeps ``fetch_metadata`` in Postgres (`etl/db.py:49-85`:
uuid PK, status CHECK, regex CHECKs; `etl/load.py:67-117`: INSERT
then keyed UPDATE with conditional ``finished_at``). The parquet
control table (pipeline/control.py) re-expresses that lifecycle on the
lake; this module keeps it in the database for deployments that retain
Postgres as the system of record (set ``Warehouse(control_jdbc_url=...)``
and every pipeline entry point routes here automatically).

Control traffic is one row per fetch job — driver-side prepared
statements are the right shape (a Spark job per single-row insert
would be pure overhead; the reference uses a SQLAlchemy session the
same way). The BULK paths stay cluster-parallel: observations land via
``upsert_jdbc`` (staged MERGE) and reads come back through Spark's
JDBC relation.

Schema parity with `etl/db.py:49-85`: primary key on ``id``, NOT NULL
on the always-present columns, an in-database CHECK on the status
domain, and LIKE CHECKs approximating the reference's regex CHECKs
(the exact regexes are enforced Python-side in pipeline/control.py
before any statement runs — same belt-and-braces as the reference,
which validates in pydantic AND the database). ``request_params`` is
stored as a JSON string and parsed back to ``map<string,string>`` on
read, so the read surface is schema-identical to the parquet store.
"""

from __future__ import annotations

import json
import uuid
from datetime import datetime
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meteo_etl_spark.errors import LoadError
from meteo_etl_spark.schemas import (
    FETCH_METADATA_SCHEMA,
    FETCH_STATUSES,
    FINISHED_STATUSES,
)
from meteo_etl_spark.sources.jdbc import (
    driver_connection,
    jdbc_table_columns,
    jdbc_table_exists,
    read_jdbc,
)

CONTROL_TABLE = "fetch_metadata"

_COLUMNS = [f.name for f in FETCH_METADATA_SCHEMA.fields]

#: per-column SQL types — the single source for CREATE and for the
#: additive ALTER path (evolution columns are added in nullable form;
#: existing rows read them back as NULL).
_COLUMN_TYPES = {
    "id": "VARCHAR(36)",
    "created_at": "TIMESTAMP",
    "request_timestamp": "TIMESTAMP",
    "request_params": "VARCHAR(4000)",
    "request_url": "VARCHAR(2048)",
    "status": "VARCHAR(16)",
    "response_status": "INTEGER",
    "error_data": "VARCHAR(4000)",
    "payload_path": "VARCHAR(1024)",
    "finished_at": "TIMESTAMP",
}

# adding a field to FETCH_METADATA_SCHEMA requires its SQL type here
# (both the CREATE and the additive ALTER path depend on it)
assert set(_COLUMN_TYPES) == set(_COLUMNS), (
    sorted(set(_COLUMNS) ^ set(_COLUMN_TYPES))
)


def _ddl() -> str:
    statuses = ", ".join(f"'{s}'" for s in FETCH_STATUSES)
    return (
        f"CREATE TABLE {CONTROL_TABLE} ("
        '"id" VARCHAR(36) NOT NULL PRIMARY KEY, '
        '"created_at" TIMESTAMP NOT NULL, '
        '"request_timestamp" TIMESTAMP NOT NULL, '
        '"request_params" VARCHAR(4000), '
        '"request_url" VARCHAR(2048) NOT NULL, '
        f'"status" VARCHAR(16) NOT NULL CHECK ("status" IN ({statuses})), '
        '"response_status" INTEGER, '
        '"error_data" VARCHAR(4000), '
        '"payload_path" VARCHAR(1024), '
        '"finished_at" TIMESTAMP, '
        # LIKE approximations of the reference's regex CHECKs
        # (etl/db.py:76-85); exact regexes run Python-side first.
        "CHECK (\"request_url\" LIKE 'http%://%')"
        ")"
    )


def _execute_prepared(
    spark: SparkSession, url: str, sql: str, binds: list[tuple[str, Any]]
) -> int:
    """Run one prepared statement with typed binds; returns the
    affected-row count. ``binds``: (kind, value) with kind in
    str|int|ts and None meaning SQL NULL of that kind."""
    jvm = spark.sparkContext._jvm
    types = jvm.java.sql.Types
    sql_type = {"str": types.VARCHAR, "int": types.INTEGER, "ts": types.TIMESTAMP}
    with driver_connection(spark, url) as conn:
        ps = conn.prepareStatement(sql)
        try:
            for i, (kind, v) in enumerate(binds, start=1):
                if v is None:
                    ps.setNull(i, sql_type[kind])
                elif kind == "str":
                    ps.setString(i, v)
                elif kind == "int":
                    ps.setInt(i, int(v))
                elif kind == "ts":
                    ps.setTimestamp(
                        i,
                        jvm.java.sql.Timestamp.valueOf(
                            v.strftime("%Y-%m-%d %H:%M:%S.%f")
                        ),
                    )
                else:
                    raise ValueError(f"unknown bind kind {kind!r}")
            return ps.executeUpdate()
        finally:
            ps.close()


#: URLs whose control table this process has already created/migrated —
#: ensure_control_table is called once per fetch registration (the
#: per-job hot path), and the schema cannot regress mid-process, so the
#: metadata probes are paid once per database, not per job.
_ENSURED_URLS: set[str] = set()


def ensure_control_table(spark: SparkSession, url: str) -> None:
    """Create the control table, or — when an older-shape table already
    exists — widen it additively (``ALTER TABLE .. ADD COLUMN`` per
    declared column it lacks, in nullable form so existing rows read
    back with NULLs). This is the database mirror of the parquet
    store's additive-only evolution policy (`schemas.validate_evolution`)
    and of the reference's migration discipline: its alembic revisions
    add nullable columns to the live table rather than rebuild it
    (e.g. `alembic/versions/3967a578f902_*.py` adds ``payload_path``).

    Idempotent and memoized per URL within the process."""
    if url in _ENSURED_URLS:
        return
    if not jdbc_table_exists(spark, url, CONTROL_TABLE):
        try:
            _execute_prepared(spark, url, _ddl(), [])
            _ENSURED_URLS.add(url)
            return  # freshly created — already the declared shape
        except Exception:
            # Lost a concurrent-create race: fine as long as it exists
            # now — but the winner may run OLDER code (mixed-version
            # rollout) and have created the pre-evolution shape, so
            # fall through to the widening pass instead of memoizing.
            if not jdbc_table_exists(spark, url, CONTROL_TABLE):
                raise
    existing = {c.lower() for c in jdbc_table_columns(spark, url, CONTROL_TABLE)}
    for c in _COLUMNS:
        if c.lower() in existing:
            continue
        try:
            _execute_prepared(
                spark,
                url,
                f'ALTER TABLE {CONTROL_TABLE} ADD COLUMN "{c}" {_COLUMN_TYPES[c]}',
                [],
            )
        except Exception:
            # concurrent migrator may have added it first
            now = {x.lower() for x in jdbc_table_columns(spark, url, CONTROL_TABLE)}
            if c.lower() not in now:
                raise
    _ENSURED_URLS.add(url)


def insert_fetch_metadata(
    spark: SparkSession,
    url: str,
    request_url: str,
    request_params: dict[str, Any] | None,
    now: datetime,
) -> str:
    """S11: append one PENDING row, return the generated id (the
    reference's INSERT .. RETURNING id, `etl/load.py:67-85`)."""
    ensure_control_table(spark, url)
    fetch_id = str(uuid.uuid4())
    params_json = json.dumps(
        {str(k): str(v) for k, v in (request_params or {}).items()}
    )
    cols = ", ".join(f'"{c}"' for c in _COLUMNS)
    marks = ", ".join("?" for _ in _COLUMNS)
    n = _execute_prepared(
        spark,
        url,
        f"INSERT INTO {CONTROL_TABLE} ({cols}) VALUES ({marks})",
        [
            ("str", fetch_id),
            ("ts", now),
            ("ts", now),
            ("str", params_json),
            ("str", request_url),
            ("str", "pending"),
            ("int", None),
            ("str", None),
            ("str", None),
            ("ts", None),
        ],
    )
    assert n == 1, f"control insert affected {n} rows"
    return fetch_id


def update_fetch_metadata(
    spark: SparkSession,
    url: str,
    fetch_id: str,
    *,
    status: str,
    response_status: int | None,
    error_data: str | None,
    payload_path: str | None,
    now: datetime,
) -> str:
    """S12: keyed single-row update; ``finished_at`` set only when the
    status is finished, otherwise the existing value is preserved
    (reference `etl/load.py:88-117`)."""
    finished_at = now if status in FINISHED_STATUSES else None
    n = _execute_prepared(
        spark,
        url,
        f"UPDATE {CONTROL_TABLE} SET "
        '"status" = ?, "response_status" = ?, "error_data" = ?, '
        '"payload_path" = ?, '
        '"finished_at" = COALESCE(CAST(? AS TIMESTAMP), "finished_at") '
        'WHERE "id" = ?',
        [
            ("str", status),
            ("int", response_status),
            ("str", error_data),
            ("str", payload_path),
            ("ts", finished_at),
            ("str", fetch_id),
        ],
    )
    if n == 0:
        raise LoadError(f"no fetch_metadata row with id={fetch_id!r}")
    assert n == 1, f"control update affected {n} rows"
    return fetch_id


def read_fetch_metadata(spark: SparkSession, url: str) -> DataFrame:
    """The control table as a DataFrame, schema-identical to the
    parquet store (request_params JSON parsed back to a map)."""
    if not jdbc_table_exists(spark, url, CONTROL_TABLE):
        return spark.createDataFrame([], schema=FETCH_METADATA_SCHEMA)
    df = read_jdbc(spark, url, CONTROL_TABLE)
    df = df.toDF(*[c.lower() for c in df.columns])
    df = df.withColumn(
        "request_params",
        F.from_json("request_params", "map<string,string>"),
    )
    return df.select(*_COLUMNS)

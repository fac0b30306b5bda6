"""JDBC source/sink — the reference's primary store is a SQL database.

Reference parity: the ETL writes to Postgres through SQLAlchemy
(`etl/db.py:117-126` engine/session, `etl/load.py:35-57` upsert) and the
dashboard reads it back with plain SQL (`dashboard/streamlit_app.py:14-25`).
A user porting meteo-etl hits "read my existing Postgres table" first;
this module is that door, built on Spark's built-in JDBC relation so
Catalyst still drives the scan:

- **predicate pushdown**: filters on the DataFrame become a WHERE clause
  in the remote query (`pushDownPredicate`, on by default) — the
  database does the filtering, Spark never sees dropped rows;
- **column pruning**: only selected columns appear in the remote SELECT;
- **parallel reads**: `partition_column` + bounds splits the table into
  `num_partitions` range-disjoint remote queries — the only way a
  1000-executor cluster reads a big table without serializing on one
  connection. Alternatively `predicates` gives explicit per-partition
  WHERE clauses (e.g. one per day) when the split key isn't numeric;
- **limit/aggregate pushdown**: Spark's JDBC V2 path can additionally
  push LIMIT and aggregates for known dialects (`pushDownLimit`,
  `pushDownAggregate`).

The sink mirrors `df.write.jdbc` with batched inserts for the
reference's append/replace surface. `upsert_jdbc` closes the
reference's `INSERT .. ON CONFLICT DO UPDATE` path
(`etl/load.py:35-55`) the scale-correct way: Spark's JDBC writer has
no upsert mode and row-at-a-time `executemany` from the driver would
serialize the cluster, so the batch is bulk-written to a staging
table (cluster-parallel inserts) and folded in with ONE database-side
`MERGE INTO` — a single atomic statement, the transactional equivalent
of the reference's ON-CONFLICT-inside-a-transaction.

Driver jars: the engine does not bundle database drivers (Postgres etc.
are deployment choices); `require_driver` probes the JVM for the class
and raises a clear error if absent. The test suite exercises the full
read/write path against embedded Apache Derby, whose driver ships with
Spark itself — so this module is e2e-tested in-image, not gated.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any

from pyspark.sql import DataFrame, SparkSession

#: Embedded Derby — ships in Spark's jars/ (derby-10.16); used by tests
#: and handy for local smoke runs: ``jdbc:derby:/tmp/mydb;create=true``.
DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
POSTGRES_DRIVER = "org.postgresql.Driver"


class JdbcDriverMissing(RuntimeError):
    """The requested JDBC driver class is not on the JVM classpath."""


def driver_available(spark: SparkSession, driver_class: str) -> bool:
    """Probe the JVM classpath for a JDBC driver class (capability
    gate, same pattern as the Kafka/Avro jar probes)."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(driver_class)
        return True
    except Exception:
        return False


def require_driver(spark: SparkSession, driver_class: str) -> None:
    if not driver_available(spark, driver_class):
        raise JdbcDriverMissing(
            f"JDBC driver {driver_class!r} is not on the Spark JVM classpath; "
            "add the driver jar via spark.jars / spark.jars.packages"
        )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: Any | None = None,
    upper_bound: Any | None = None,
    num_partitions: int | None = None,
    predicates: list[str] | None = None,
    fetchsize: int = 10_000,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a database table (or ``(SELECT ...) t`` subquery) as a
    DataFrame.

    Exactly one read topology applies:

    - neither ``partition_column`` nor ``predicates``: single-partition
      read (fine for dims; wrong for big facts);
    - ``partition_column`` + ``lower_bound``/``upper_bound`` +
      ``num_partitions``: range-split parallel read; bounds only shape
      the split, they do NOT filter rows;
    - ``predicates``: one remote query per entry, each with that WHERE
      clause — use for non-numeric split keys (one per day/tenant).
    """
    if predicates is not None and partition_column is not None:
        raise ValueError("pass either partition_column bounds or predicates, not both")
    if driver:
        require_driver(spark, driver)

    if predicates is not None:
        props = {"fetchsize": str(fetchsize), **(options or {})}
        if driver:
            props["driver"] = driver
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)

    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", fetchsize)
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", int(num_partitions))
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    driver: str | None = None,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    isolation_level: str | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Write a DataFrame to a database table.

    ``mode='append'`` inserts; ``'overwrite'`` truncates-or-drops then
    inserts (set ``options={'truncate': 'true'}`` to keep the schema).
    ``num_partitions`` caps concurrent connections — at cluster scale a
    thousand tasks opening a thousand inserts will fall over any
    database; coalesce to what the DB can absorb.
    """
    if driver:
        require_driver(df.sparkSession, driver)
    if num_partitions is not None:
        # coalesce never raises partition count, so this is a cheap
        # no-op when the plan already fits the connection budget (and
        # avoids materializing the RDD lineage just to count partitions)
        df = df.coalesce(num_partitions)

    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchsize)
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    if isolation_level:
        writer = writer.option("isolationLevel", isolation_level)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()


@contextmanager
def driver_connection(spark: SparkSession, url: str):
    """Driver-side JDBC connection via the JVM DriverManager (no Python
    DB driver needed), closed on exit. The ONE connection-lifecycle
    implementation — control_jdbc's prepared statements and atomic's
    JdbcLockIO route through here too, so a future timeout/retry fix
    lands once."""
    conn = spark.sparkContext._jvm.java.sql.DriverManager.getConnection(url)
    try:
        yield conn
    finally:
        conn.close()


def _execute_update(spark: SparkSession, url: str, sql: str) -> int:
    """Run one DDL/DML statement over a driver-side JDBC connection
    and return the affected-row count."""
    with driver_connection(spark, url) as conn:
        stmt = conn.createStatement()
        try:
            return stmt.executeUpdate(sql)
        finally:
            stmt.close()


def jdbc_row_count(spark: SparkSession, url: str, table: str) -> int:
    """COUNT(*) over a driver-side connection (accounting-sized
    metadata queries; bulk reads go through ``read_jdbc``)."""
    conn = spark.sparkContext._jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        try:
            rs = stmt.executeQuery(f"SELECT COUNT(*) FROM {table}")
            try:
                rs.next()
                return rs.getLong(1)
            finally:
                rs.close()
        finally:
            stmt.close()
    finally:
        conn.close()


def jdbc_table_exists(spark: SparkSession, url: str, table: str) -> bool:
    """Probe database metadata for ``table`` (exact, upper- and
    lower-case forms — unquoted DDL folds case per database).

    ``getTables`` treats its name argument as a LIKE pattern where
    ``_``/``%`` are wildcards — ``fetch_metadata`` would match a
    ``fetchXmetadata`` table and wrongly skip CREATE TABLE. Escaping
    with ``getSearchStringEscape`` is not portable (embedded Derby
    returns the empty string — no escape support), so instead the
    over-matching result set is compared LITERALLY against the
    probed name: the literal match is always in the LIKE result."""
    conn = spark.sparkContext._jvm.java.sql.DriverManager.getConnection(url)
    try:
        meta = conn.getMetaData()
        for name in (table, table.upper(), table.lower()):
            rs = meta.getTables(None, None, name, None)
            try:
                while rs.next():
                    if rs.getString(3) == name:  # col 3 = TABLE_NAME
                        return True
            finally:
                rs.close()
        return False
    finally:
        conn.close()


def _split_columns_spec(spec: str) -> list[str]:
    """Split a ``createTableColumnTypes``-style spec ("a VARCHAR(16),
    b DECIMAL(10,2)") on top-level commas only."""
    parts: list[str] = []
    depth, cur = 0, []
    for ch in spec:
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def create_table_ddl(
    table: str,
    schema,
    *,
    url: str,
    column_types: str | None = None,
) -> str:
    """Portable CREATE TABLE for a Spark schema (used to pre-create
    staging tables so Spark's JDBC writer only ever appends — its
    overwrite-mode existence probe propagates exceptions on dialects
    it doesn't know, e.g. DuckDB). ``column_types`` accepts the same
    ``createTableColumnTypes`` spec as Spark and wins per column.

    Strings default to CLOB on Derby (its dialect binds NULL strings
    with the CLOB type code — a VARCHAR column would reject them) and
    VARCHAR elsewhere; pin via ``column_types`` where that is wrong."""
    from pyspark.sql import types as T

    overrides: dict[str, str] = {}
    for part in _split_columns_spec(column_types or ""):
        name, _, ty = part.partition(" ")
        overrides[name.strip().strip('"')] = ty.strip()

    def sql_type(dt) -> str:
        if isinstance(dt, T.DecimalType):
            return f"DECIMAL({dt.precision},{dt.scale})"
        if isinstance(dt, T.StringType):
            return "CLOB" if url.startswith("jdbc:derby") else "VARCHAR"
        for cls, name in (
            (T.LongType, "BIGINT"),
            (T.IntegerType, "INTEGER"),
            (T.ShortType, "SMALLINT"),
            (T.ByteType, "SMALLINT"),
            (T.DoubleType, "DOUBLE"),
            (T.FloatType, "REAL"),
            (T.BooleanType, "BOOLEAN"),
            (T.TimestampNTZType, "TIMESTAMP"),
            (T.TimestampType, "TIMESTAMP"),
            (T.DateType, "DATE"),
            (T.BinaryType, "BLOB"),
        ):
            if isinstance(dt, cls):
                return name
        raise ValueError(
            f"no portable SQL type for {dt!r}; pin it via createTableColumnTypes"
        )

    cols = ", ".join(
        '"{}" {}'.format(
            f.name.replace('"', '""'), overrides.get(f.name) or sql_type(f.dataType)
        )
        for f in schema.fields
    )
    return f"CREATE TABLE {table} ({cols})"


def jdbc_table_columns(spark: SparkSession, url: str, table: str) -> list[str]:
    """Column names of ``table`` from database metadata (empty list if
    the table does not exist). Same literal-match discipline as
    ``jdbc_table_exists`` — ``getColumns`` patterns are LIKE patterns."""
    conn = spark.sparkContext._jvm.java.sql.DriverManager.getConnection(url)
    try:
        meta = conn.getMetaData()
        for name in (table, table.upper(), table.lower()):
            rs = meta.getColumns(None, None, name, None)
            cols: list[str] = []
            try:
                while rs.next():
                    if rs.getString(3) == name:  # TABLE_NAME literal
                        cols.append(rs.getString(4))  # COLUMN_NAME
            finally:
                rs.close()
            if cols:
                return cols
        return []
    finally:
        conn.close()


def merge_statement(
    table: str,
    staging: str,
    columns: list[str],
    keys: list[str],
    *,
    update_cols: list[str] | None = None,
    dialect: str = "merge",
) -> str:
    """The fold-staging-into-target statement, per SQL dialect.

    - ``"merge"`` (ANSI; Derby 10.11+, Postgres 15+, SQL Server,
      Oracle): one ``MERGE INTO .. WHEN MATCHED / WHEN NOT MATCHED``.
    - ``"on_conflict"`` (Postgres < 15, SQLite, CockroachDB — and the
      reference's own statement shape, `etl/load.py:35-55`):
      ``INSERT .. SELECT .. ON CONFLICT (keys) DO UPDATE SET c =
      EXCLUDED.c``; requires a unique index on the key columns (the
      reference's ``u_loc_time`` constraint, `etl/db.py:118`). With no
      update columns it degrades to ``DO NOTHING``.

    Identifiers: table names unquoted (database folds case, matching
    Spark's JDBC writer), column names quoted verbatim."""

    def q(c: str) -> str:
        return '"' + c.replace('"', '""') + '"'

    non_keys = (
        update_cols if update_cols is not None else [c for c in columns if c not in keys]
    )
    cols = ", ".join(q(c) for c in columns)
    if dialect == "merge":
        on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in keys)
        vals = ", ".join(f"s.{q(c)}" for c in columns)
        stmt = f"MERGE INTO {table} t USING {staging} s ON {on}"
        if non_keys:
            sets = ", ".join(f"{q(c)} = s.{q(c)}" for c in non_keys)
            stmt += f" WHEN MATCHED THEN UPDATE SET {sets}"
        return stmt + f" WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    if dialect == "on_conflict":
        key_list = ", ".join(q(k) for k in keys)
        stmt = (
            f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging} "
            f"ON CONFLICT ({key_list}) DO "
        )
        if non_keys:
            sets = ", ".join(f"{q(c)} = EXCLUDED.{q(c)}" for c in non_keys)
            return stmt + f"UPDATE SET {sets}"
        return stmt + "NOTHING"
    raise ValueError(f"unknown dialect {dialect!r} (merge|on_conflict)")


def upsert_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    *,
    update_cols: list[str] | None = None,
    dialect: str = "merge",
    driver: str | None = None,
    staging_table: str | None = None,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    options: dict[str, str] | None = None,
) -> int:
    """Keyed last-write upsert into a database table; returns the
    number of rows the MERGE touched.

    ``update_cols`` restricts WHEN MATCHED to a subset of the non-key
    columns (default: all of them). Columns outside the subset keep
    their target values on conflict while still being inserted for new
    keys — the reference's ``id``/``created_at`` preservation
    (`etl/load.py:45-55`: measures and ``fetch_id`` take EXCLUDED
    values, identity/creation stamps survive).

    Reference parity: `etl/load.py:35-55` (INSERT .. ON CONFLICT DO
    UPDATE inside a transaction). Protocol:

    1. pre-create the staging table from the batch's schema
       (``create_table_ddl``, honoring ``createTableColumnTypes``
       pins; a leftover staging from a crashed run is dropped first),
       then bulk-append ``df`` into it — cluster-parallel batched
       inserts, the only write shape that scales past one driver
       connection;
    2. if the target does not exist, create it from the staging
       table's shape (``CREATE TABLE .. AS SELECT .. WITH NO DATA``);
    3. fold staging into the target with ONE atomic database-side
       statement — ``MERGE INTO`` by default, or the Postgres-<15 /
       SQLite shape with ``dialect="on_conflict"`` (see
       ``merge_statement``) — then drop staging.

    The batch must be unique per key (dedupe upstream with the
    warehouse's last-write-wins rule): two source rows matching one
    target row is a MERGE cardinality violation in ANSI databases.
    Identifier handling matches Spark's JDBC writer: table names go
    into SQL unquoted (the database folds case), column names quoted
    verbatim.

    Type pinning (``options={'createTableColumnTypes': ...}``): pin a
    string column to VARCHAR only when its batch values are never
    NULL — Spark's Derby dialect binds NULL strings with the CLOB type
    code, which a VARCHAR column rejects (ERROR 22005). String KEY
    columns must be pinned (Derby cannot compare CLOBs in the ON
    clause) and must be non-null anyway; nullable free-text columns
    should stay unpinned.

    ``staging_table`` defaults to ``<table>_stg`` — deterministic, so
    a crashed run's leftover staging is overwritten by the next run
    (self-cleaning). **Concurrency contract: one writer per TARGET
    table at a time.** Two concurrent upserts into the SAME target
    share the default staging name — one overwrites the other's
    staged batch and the loser's cleanup can drop the winner's
    staging mid-merge. Concurrent upserts into *different* targets
    are fine (distinct default staging names); for same-target
    concurrency serialize upstream, exactly as the reference's
    per-fetch transaction does (`etl/load.py:35-57`)."""
    if not keys:
        raise ValueError("upsert_jdbc requires at least one key column")
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise ValueError(f"key columns not in DataFrame: {missing}")
    if update_cols is not None:
        bad = [c for c in update_cols if c not in df.columns or c in keys]
        if bad:
            raise ValueError(f"update_cols must be non-key DataFrame columns: {bad}")
    spark = df.sparkSession
    if driver:
        require_driver(spark, driver)

    staging = staging_table or f"{table}_stg"
    # Stage via append-into-a-pre-created table rather than Spark's
    # overwrite mode: the writer's own existence probe (SELECT 1 FROM
    # t) propagates on dialects Spark doesn't know (e.g. DuckDB), and
    # owning the staging DDL keeps pinned column types authoritative.
    # A leftover staging (crashed run) is DROPPED, not truncated — its
    # shape may not match this batch's schema.
    if jdbc_table_exists(spark, url, staging):
        _execute_update(spark, url, f"DROP TABLE {staging}")
    _execute_update(
        spark,
        url,
        create_table_ddl(
            staging,
            df.schema,
            url=url,
            column_types=(options or {}).get("createTableColumnTypes"),
        ),
    )
    write_jdbc(
        df,
        url,
        staging,
        mode="append",
        driver=driver,
        batchsize=batchsize,
        num_partitions=num_partitions,
        options=options,
    )

    try:
        if not jdbc_table_exists(spark, url, table):
            _execute_update(
                spark,
                url,
                f"CREATE TABLE {table} AS SELECT * FROM {staging} WITH NO DATA",
            )
            if dialect == "on_conflict":
                # ON CONFLICT arbitrates via a unique index; create it
                # with the table so first use works out of the box.
                key_list = ", ".join('"' + k.replace('"', '""') + '"' for k in keys)
                _execute_update(
                    spark,
                    url,
                    f"CREATE UNIQUE INDEX {table}_upsert_key ON {table} ({key_list})",
                )
        stmt = merge_statement(
            table,
            staging,
            df.columns,
            keys,
            update_cols=update_cols,
            dialect=dialect,
        )
        return _execute_update(spark, url, stmt)
    finally:
        try:
            _execute_update(spark, url, f"DROP TABLE {staging}")
        except Exception:
            pass  # leftover staging is overwritten by the next run

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

The sink mirrors `df.write.jdbc` with batched inserts. Upsert semantics
(ON CONFLICT) are NOT in the JDBC writer contract — that remains
`operators/upsert.merge_parquet` on the warehouse, or native MERGE run
via `executemany` on the database side; the writer here covers the
reference's append/replace surface.

Driver jars: the engine does not bundle database drivers (Postgres etc.
are deployment choices); `require_driver` probes the JVM for the class
and raises a clear error if absent. The test suite exercises the full
read/write path against embedded Apache Derby, whose driver ships with
Spark itself — so this module is e2e-tested in-image, not gated.
"""

from __future__ import annotations

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
    if num_partitions is not None and df.rdd.getNumPartitions() > num_partitions:
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

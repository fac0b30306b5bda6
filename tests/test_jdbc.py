"""JDBC source/sink e2e against embedded Apache Derby (whose driver
ships inside Spark's own jars/ — no install, no network).

Covers the reference's database surface end-to-end: write rows the way
`etl/load.py` lands them, read them back the way the dashboard does
(`dashboard/streamlit_app.py:14-25`), plus the scale topology options
(partitioned parallel read, per-predicate read) and pushdown behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from meteo_etl_spark.sources import jdbc

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    if not jdbc.driver_available(spark, jdbc.DERBY_DRIVER):
        pytest.skip(f"JDBC driver {jdbc.DERBY_DRIVER} not on JVM classpath")
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


@pytest.fixture(scope="module")
def seeded(spark, derby_url):
    """observations-shaped table written through the sink."""
    rows = [
        Row(id=i, lat=1.0 + i, lon=2.0 + i, temperature=float(10 + i), station=f"s{i % 3}")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows)
    # Derby maps StringType to CLOB, which it refuses to compare/group;
    # createTableColumnTypes pins a usable VARCHAR (the same option a
    # Postgres deployment uses for TEXT vs VARCHAR choices).
    jdbc.write_jdbc(
        df,
        derby_url,
        "observations",
        mode="overwrite",
        options={"createTableColumnTypes": "station VARCHAR(32)"},
    )
    return derby_url


def test_roundtrip_values(spark, seeded):
    got = jdbc.read_jdbc(spark, seeded, "observations")
    assert got.count() == 20
    back = {r.ID if hasattr(r, "ID") else r.id: r.TEMPERATURE if hasattr(r, "TEMPERATURE") else r.temperature
            for r in got.collect()}
    assert back[0] == 10.0 and back[19] == 29.0


def test_append_mode_adds_rows(spark, derby_url):
    df = spark.createDataFrame([Row(k=1, v="a")])
    jdbc.write_jdbc(df, derby_url, "appender", mode="overwrite")
    jdbc.write_jdbc(df, derby_url, "appender", mode="append")
    assert jdbc.read_jdbc(spark, derby_url, "appender").count() == 2


def test_partitioned_parallel_read(spark, seeded):
    got = jdbc.read_jdbc(
        spark,
        seeded,
        "observations",
        partition_column="id",
        lower_bound=0,
        upper_bound=20,
        num_partitions=4,
    )
    # bounds shape the split but never filter rows
    assert got.count() == 20
    assert got.rdd.getNumPartitions() == 4


def test_predicate_read_partitions_by_clause(spark, seeded):
    got = jdbc.read_jdbc(
        spark,
        seeded,
        "observations",
        # Spark's JDBC writer emits the table name unquoted (Derby
        # uppercases it) but quotes COLUMN names, so raw SQL fragments
        # (predicates / subqueries) must quote columns to match.
        predicates=['"station" = \'s0\'', '"station" = \'s1\'', '"station" = \'s2\''],
    )
    assert got.rdd.getNumPartitions() == 3
    assert got.count() == 20


def test_filter_pushdown_reaches_remote_query(spark, seeded):
    got = jdbc.read_jdbc(spark, seeded, "observations").filter(F.col("id") < 5)
    assert got.count() == 5
    plan = got._jdf.queryExecution().executedPlan().toString()
    # The JDBC relation advertises the pushed filter in the scan node.
    assert "PushedFilters" in plan
    assert "LessThan(id,5)" in plan or "LessThan(ID,5)" in plan


def test_subquery_table(spark, seeded):
    got = jdbc.read_jdbc(
        spark,
        seeded,
        '(SELECT "station", COUNT(*) AS n FROM observations GROUP BY "station") t',
    )
    assert {(r[0], r[1]) for r in got.collect()} == {("s0", 7), ("s1", 7), ("s2", 6)}


def test_bounds_mismatch_raises(spark, seeded):
    with pytest.raises(ValueError, match="partition_column requires"):
        jdbc.read_jdbc(spark, seeded, "observations", partition_column="id")
    with pytest.raises(ValueError, match="not both"):
        jdbc.read_jdbc(
            spark, seeded, "observations",
            partition_column="id", lower_bound=0, upper_bound=1, num_partitions=1,
            predicates=["1=1"],
        )


def test_missing_driver_raises_clear_error(spark, derby_url):
    with pytest.raises(jdbc.JdbcDriverMissing, match="not.a.real.Driver"):
        jdbc.read_jdbc(spark, derby_url, "observations", driver="not.a.real.Driver")


def test_write_caps_connections(spark, derby_url):
    df = spark.createDataFrame([Row(k=i) for i in range(100)]).repartition(16)
    jdbc.write_jdbc(df, derby_url, "capped", mode="overwrite", num_partitions=2)
    assert jdbc.read_jdbc(spark, derby_url, "capped").count() == 100


def _upsert_rows(spark, derby_url, table):
    return {
        (r[0], r[1], r[2])
        for r in jdbc.read_jdbc(
            spark, derby_url, f'(SELECT "k", "v", "tag" FROM {table}) t'
        ).collect()
    }


def test_upsert_creates_then_updates_and_inserts(spark, derby_url):
    """The reference's ON CONFLICT surface (etl/load.py:35-55) against a
    real database: first upsert creates+inserts, second updates matched
    keys and inserts new ones, all through one MERGE statement."""
    opts = {"createTableColumnTypes": "v VARCHAR(32), tag VARCHAR(8)"}
    base = spark.createDataFrame(
        [Row(k=i, v=f"v{i}", tag="old") for i in range(10)]
    )
    n = jdbc.upsert_jdbc(base, derby_url, "ups", ["k"], options=opts)
    assert n == 10
    assert _upsert_rows(spark, derby_url, "ups") == {
        (i, f"v{i}", "old") for i in range(10)
    }

    batch = spark.createDataFrame(
        [Row(k=i, v=f"V{i}", tag="new") for i in range(5, 15)]
    )
    n = jdbc.upsert_jdbc(batch, derby_url, "ups", ["k"], options=opts)
    assert n == 10  # 5 updates + 5 inserts
    assert _upsert_rows(spark, derby_url, "ups") == {
        (i, f"v{i}", "old") for i in range(5)
    } | {(i, f"V{i}", "new") for i in range(5, 15)}


def test_upsert_replay_is_idempotent(spark, derby_url):
    """Redelivering the same batch (at-least-once landing) converges to
    the same table state — the property the streaming sink relies on."""
    opts = {"createTableColumnTypes": "v VARCHAR(32), tag VARCHAR(8)"}
    batch = spark.createDataFrame([Row(k=i, v=f"r{i}", tag="t") for i in range(8)])
    jdbc.upsert_jdbc(batch, derby_url, "replay", ["k"], options=opts)
    before = _upsert_rows(spark, derby_url, "replay")
    jdbc.upsert_jdbc(batch, derby_url, "replay", ["k"], options=opts)
    assert _upsert_rows(spark, derby_url, "replay") == before
    # staging table is dropped after the merge
    assert not jdbc.jdbc_table_exists(spark, derby_url, "replay_stg")


def test_merge_statement_dialects():
    """SQL generation for both upsert dialects (the Derby e2e covers
    'merge' execution; 'on_conflict' is the reference's own statement
    shape, etl/load.py:35-55, runnable on Postgres < 15 / SQLite)."""
    cols, keys = ["k", "v", "t s"], ["k"]
    m = jdbc.merge_statement("tgt", "stg", cols, keys)
    assert m == (
        'MERGE INTO tgt t USING stg s ON t."k" = s."k"'
        ' WHEN MATCHED THEN UPDATE SET "v" = s."v", "t s" = s."t s"'
        ' WHEN NOT MATCHED THEN INSERT ("k", "v", "t s")'
        ' VALUES (s."k", s."v", s."t s")'
    )
    oc = jdbc.merge_statement("tgt", "stg", cols, keys, dialect="on_conflict")
    assert oc == (
        'INSERT INTO tgt ("k", "v", "t s") SELECT "k", "v", "t s" FROM stg'
        ' ON CONFLICT ("k") DO UPDATE SET "v" = EXCLUDED."v",'
        ' "t s" = EXCLUDED."t s"'
    )
    # update subset / no updatable columns
    sub = jdbc.merge_statement("tgt", "stg", cols, keys, update_cols=["v"])
    assert 'UPDATE SET "v" = s."v" WHEN' in sub and '"t s" = s."t s"' not in sub
    nothing = jdbc.merge_statement(
        "tgt", "stg", ["k"], ["k"], dialect="on_conflict"
    )
    assert nothing.endswith("DO NOTHING")
    with pytest.raises(ValueError, match="unknown dialect"):
        jdbc.merge_statement("t", "s", cols, keys, dialect="upsertish")


def test_upsert_composite_key_and_validation(spark, derby_url):
    opts = {"createTableColumnTypes": "a VARCHAR(8)"}
    df = spark.createDataFrame(
        [Row(a="x", b=1, val=1.0), Row(a="x", b=2, val=2.0)]
    )
    jdbc.upsert_jdbc(df, derby_url, "comp", ["a", "b"], options=opts)
    upd = spark.createDataFrame([Row(a="x", b=2, val=9.0)])
    jdbc.upsert_jdbc(upd, derby_url, "comp", ["a", "b"], options=opts)
    got = {
        (r[0], r[1], r[2])
        for r in jdbc.read_jdbc(
            spark, derby_url, '(SELECT "a", "b", "val" FROM comp) t'
        ).collect()
    }
    assert got == {("x", 1, 1.0), ("x", 2, 9.0)}
    with pytest.raises(ValueError, match="at least one key"):
        jdbc.upsert_jdbc(df, derby_url, "comp", [])
    with pytest.raises(ValueError, match="not in DataFrame"):
        jdbc.upsert_jdbc(df, derby_url, "comp", ["nope"])


def test_table_exists_is_literal_not_like_pattern(spark, derby_url):
    """DatabaseMetaData.getTables treats `_` as a single-char LIKE
    wildcard; the probe must escape it, or `fetch_metadata` would
    match a `fetchXmetadata` table and upsert/control DDL would skip
    CREATE TABLE against a table that does not exist."""
    df = spark.createDataFrame([Row(k=1)])
    jdbc.write_jdbc(df, derby_url, "probeXtable", mode="overwrite")
    assert jdbc.jdbc_table_exists(spark, derby_url, "probeXtable")
    # `_` in the probed name must NOT wildcard-match probeXtable
    assert not jdbc.jdbc_table_exists(spark, derby_url, "probe_table")
    jdbc.write_jdbc(df, derby_url, "probe_table", mode="overwrite")
    assert jdbc.jdbc_table_exists(spark, derby_url, "probe_table")


def test_create_table_ddl_types_and_overrides():
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("amt", T.DecimalType(10, 2)),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    ddl = jdbc.create_table_ddl(
        "t", schema, url="jdbc:derby:/x", column_types="v VARCHAR(16)"
    )
    assert ddl == (
        'CREATE TABLE t ("k" BIGINT, "v" VARCHAR(16), '
        '"amt" DECIMAL(10,2), "ts" TIMESTAMP)'
    )
    # Derby default for unpinned strings is CLOB (NULL-binding contract);
    # elsewhere VARCHAR
    assert '"v" CLOB' in jdbc.create_table_ddl("t", schema, url="jdbc:derby:/x")
    assert '"v" VARCHAR' in jdbc.create_table_ddl("t", schema, url="jdbc:duckdb:/x")
    # top-level comma split keeps DECIMAL(10,2) override intact
    ddl2 = jdbc.create_table_ddl(
        "t", schema, url="jdbc:derby:/x",
        column_types="amt DECIMAL(12,4), v VARCHAR(8)",
    )
    assert '"amt" DECIMAL(12,4)' in ddl2 and '"v" VARCHAR(8)' in ddl2
    with pytest.raises(ValueError, match="no portable SQL type"):
        jdbc.create_table_ddl(
            "t",
            T.StructType([T.StructField("m", T.MapType(T.StringType(), T.LongType()))]),
            url="jdbc:derby:/x",
        )


def test_upsert_survives_stale_staging_with_different_shape(spark, derby_url):
    """A crashed run's leftover staging table with a DIFFERENT schema
    must not poison the next upsert: staging is dropped and recreated
    from the current batch's shape."""
    jdbc.write_jdbc(
        spark.createDataFrame([Row(other=1.5)]), derby_url, "shape_stg",
        mode="overwrite",
    )  # stale leftover, wrong shape
    df = spark.createDataFrame([Row(k=1, v="a")])
    n = jdbc.upsert_jdbc(df, derby_url, "shape", ["k"])
    assert n == 1
    got = jdbc.read_jdbc(spark, derby_url, '(SELECT "k", "v" FROM shape) t').collect()
    assert [(r[0], r[1]) for r in got] == [(1, "a")]

"""Database-backed control table (pipeline/control_jdbc): the
reference's own fetch_metadata deployment — uuid PK, status CHECK,
INSERT-then-keyed-UPDATE lifecycle with conditional finished_at —
e2e against embedded Derby, including the all-database deployment
(control in the DB + silver observations in the DB)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.errors import LoadError
from meteo_etl_spark.pipeline import batch, control
from meteo_etl_spark.pipeline.warehouse import Warehouse
from meteo_etl_spark.schemas import FETCH_METADATA_SCHEMA
from meteo_etl_spark.sources import jdbc
from tests.conftest import N_HOURS, golden_payload


@pytest.fixture()
def offline_source(monkeypatch):
    from meteo_etl_spark.sources.registry import Source

    monkeypatch.setattr(Source, "extract", lambda self, **extra: golden_payload())


@pytest.fixture()
def db_warehouse(spark, tmp_path):
    if not jdbc.driver_available(spark, jdbc.DERBY_DRIVER):
        pytest.skip("Derby driver not on JVM classpath")
    url = f"jdbc:derby:{tmp_path}/ctl/db;create=true"
    return Warehouse(str(tmp_path / "wh"), control_jdbc_url=url)


def test_lifecycle_roundtrip_schema_identical_to_parquet_store(spark, db_warehouse):
    fid = control.insert_fetch_metadata(
        spark,
        db_warehouse,
        "https://api.example.com/v1/x",
        {"latitude": 3.06, "longitude": 5.25},
    )
    df = control.read_fetch_metadata(spark, db_warehouse)
    # read surface is schema-identical to the parquet control store
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in FETCH_METADATA_SCHEMA.fields
    ]
    row = df.filter(F.col("id") == fid).collect()[0]
    assert row.status == "pending"
    assert row.finished_at is None and row.created_at is not None
    assert row.request_params == {"latitude": "3.06", "longitude": "5.25"}

    control.update_fetch_metadata(
        spark,
        db_warehouse,
        fid,
        status="success",
        response_status=200,
        payload_path="/data/bronze/x.json",
    )
    row = (
        control.read_fetch_metadata(spark, db_warehouse)
        .filter(F.col("id") == fid)
        .collect()[0]
    )
    assert row.status == "success" and row.response_status == 200
    assert row.finished_at is not None  # finished status stamps it
    assert row.payload_path == "/data/bronze/x.json"


def test_update_unknown_id_and_validation_errors(spark, db_warehouse):
    control.insert_fetch_metadata(spark, db_warehouse, "https://api.example.com/y")
    with pytest.raises(LoadError, match="no fetch_metadata row"):
        control.update_fetch_metadata(
            spark, db_warehouse, "not-a-real-id", status="success"
        )
    with pytest.raises(LoadError, match="invalid status"):
        control.update_fetch_metadata(
            spark, db_warehouse, "whatever", status="exploded"
        )
    with pytest.raises(LoadError, match="request_url violates CHECK"):
        control.insert_fetch_metadata(spark, db_warehouse, "ftp://nope")


def test_database_enforces_status_domain(spark, db_warehouse):
    """The CHECK constraint lives in the database too (reference
    etl/db.py:76-85 belt-and-braces), not only in Python validation."""
    from meteo_etl_spark.pipeline import control_jdbc

    control.insert_fetch_metadata(spark, db_warehouse, "https://api.example.com/z")
    with pytest.raises(Exception, match="(?i)check"):
        control_jdbc._execute_prepared(
            spark,
            db_warehouse.control_jdbc_url,
            'UPDATE fetch_metadata SET "status" = \'bogus\'',
            [],
        )


def test_run_etl_with_database_control(spark, db_warehouse, offline_source):
    """Full batch ETL with the job lifecycle in the database: PENDING
    row at start, success + finished_at at the end, silver on the lake,
    and no parquet control directory ever written."""
    result = batch.run_etl(
        spark, db_warehouse, "meteo", {"latitude": 3.06, "longitude": 5.25}
    )
    row = (
        control.read_fetch_metadata(spark, db_warehouse)
        .filter(F.col("id") == result.fetch_id)
        .collect()[0]
    )
    assert row.status == "success" and row.finished_at is not None
    from meteo_etl_spark.pipeline.warehouse import read_observations

    assert (
        read_observations(spark, db_warehouse)
        .filter(F.col("fetch_id") == result.fetch_id)
        .count()
        == N_HOURS
    )
    assert not os.path.exists(db_warehouse.control_path)


def test_error_taxonomy_lands_in_database(spark, db_warehouse, monkeypatch):
    """T8: a failed extract finalizes the db row as error with the
    taxonomy payload (reference etl/app.py error path)."""
    from meteo_etl_spark.errors import ETLError, ExtractError
    from meteo_etl_spark.sources.registry import Source

    def boom(self, **extra):
        raise ExtractError("upstream 503", status=503)

    monkeypatch.setattr(Source, "extract", boom)
    with pytest.raises(ETLError, match="upstream 503"):
        batch.run_etl(spark, db_warehouse, "meteo", {"latitude": 1.0, "longitude": 2.0})
    rows = control.read_fetch_metadata(spark, db_warehouse).collect()
    assert len(rows) == 1
    assert rows[0].status == "error" and rows[0].finished_at is not None
    assert "503" in (rows[0].error_data or "")


def test_all_database_deployment_stream_e2e(
    spark, db_warehouse, offline_source, tmp_path
):
    """The complete keep-Postgres deployment: control lifecycle AND
    silver observations in the database; the lake carries only bronze
    payloads and the event topic."""
    from meteo_etl_spark.streaming import consume, produce

    topic = str(tmp_path / "topic")
    result = batch.run_etl(
        spark,
        db_warehouse,
        "meteo",
        {"latitude": 3.06, "longitude": 5.25},
        fetch_job=batch.extract_and_save_to_disk,
    )
    produce.publish_finished_fetch(spark, db_warehouse, result.fetch_id, topic)

    stats = consume.ConsumeStats()
    consume.consume_fetch_events(
        spark,
        db_warehouse,
        topic,
        str(tmp_path / "ckpt"),
        stats=stats,
        jdbc_sink=consume.JdbcSink(db_warehouse.control_jdbc_url),
    ).awaitTermination(120)

    assert stats.events == 1 and stats.merged_rows == N_HOURS
    obs = jdbc.read_jdbc(spark, db_warehouse.control_jdbc_url, "observations")
    assert obs.count() == N_HOURS
    assert not os.path.exists(db_warehouse.observations_path)
    assert not os.path.exists(db_warehouse.control_path)


def test_batch_etl_with_database_silver_and_dashboard(
    spark, tmp_path, offline_source, capsys
):
    """Warehouse(observations_jdbc_url=...): the BATCH merge lands in
    the database (MergeStats split from before/after counts), replay
    updates rather than duplicates, and the full dashboard surface —
    counts, describe, mean tiles, last status — reads back through the
    JDBC relation (reference dashboard/streamlit_app.py reads
    Postgres)."""
    if not jdbc.driver_available(spark, jdbc.DERBY_DRIVER):
        pytest.skip("Derby driver not on JVM classpath")
    url = f"jdbc:derby:{tmp_path}/alldb/db;create=true"
    wh = Warehouse(
        str(tmp_path / "wh"), control_jdbc_url=url, observations_jdbc_url=url
    )
    r1 = batch.run_etl(spark, wh, "meteo", {"latitude": 3.06, "longitude": 5.25})
    assert r1.status == "success"
    from meteo_etl_spark.pipeline.warehouse import read_observations

    obs = read_observations(spark, wh)
    assert obs.count() == N_HOURS
    assert not os.path.exists(wh.observations_path)

    # replay: same coordinates merge as updates, not duplicates
    r2 = batch.run_etl(spark, wh, "meteo", {"latitude": 3.06, "longitude": 5.25})
    assert r2.status == "success"
    assert read_observations(spark, wh).count() == N_HOURS

    from meteo_etl_spark import cli

    rc = cli.main(
        ["--warehouse", wh.root, "--control-jdbc-url", url,
         "--observations-jdbc-url", url, "dashboard"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert f"Observations recorded: {N_HOURS}" in out
    assert "Jobs recorded: 2" in out
    assert "Last status recorded: 🟢 Success" in out


def test_additive_schema_evolution_widens_old_table(spark, tmp_path, offline_source):
    """An old-shape fetch_metadata table (pre-``payload_path``/
    ``finished_at``/``error_data`` — the reference's pre-migration
    state, cf. alembic revision 3967a578f902 adding payload_path) is
    widened in place by ensure_control_table: missing columns are
    added nullable, old rows read back with NULLs, and the full new
    lifecycle runs against the widened table."""
    from meteo_etl_spark.pipeline import control_jdbc

    if not jdbc.driver_available(spark, jdbc.DERBY_DRIVER):
        pytest.skip("Derby driver not on JVM classpath")
    url = f"jdbc:derby:{tmp_path}/evo/db;create=true"

    # old-shape table + one legacy row, created by "previous code"
    jdbc._execute_update(
        spark,
        url,
        'CREATE TABLE fetch_metadata ('
        '"id" VARCHAR(36) NOT NULL PRIMARY KEY, '
        '"created_at" TIMESTAMP NOT NULL, '
        '"request_timestamp" TIMESTAMP NOT NULL, '
        '"request_params" VARCHAR(4000), '
        '"request_url" VARCHAR(2048) NOT NULL, '
        '"status" VARCHAR(16) NOT NULL)',
    )
    jdbc._execute_update(
        spark,
        url,
        "INSERT INTO fetch_metadata "
        '("id", "created_at", "request_timestamp", "request_params", '
        '"request_url", "status") VALUES '
        "('00000000-0000-0000-0000-000000000001', "
        "TIMESTAMP('2025-01-01 00:00:00'), TIMESTAMP('2025-01-01 00:00:00'), "
        "'{}', 'https://old.example/v1', 'success')",
    )

    # new code against the old table: widened, not rebuilt
    control_jdbc.ensure_control_table(spark, url)
    cols = {c.lower() for c in jdbc.jdbc_table_columns(spark, url, "FETCH_METADATA")}
    assert {"payload_path", "finished_at", "error_data", "response_status"} <= cols

    wh = Warehouse(str(tmp_path / "wh"), control_jdbc_url=url)
    rows = {r.id: r for r in control.read_fetch_metadata(spark, wh).collect()}
    legacy = rows["00000000-0000-0000-0000-000000000001"]
    assert legacy.status == "success"
    assert legacy.payload_path is None  # added column reads NULL
    assert legacy.finished_at is None and legacy.error_data is None

    # full new lifecycle on the widened table
    result = batch.run_etl(
        spark, wh, "meteo", {"latitude": 3.06, "longitude": 5.25}
    )
    assert result.status == "success"
    rows = {r.id: r for r in control.read_fetch_metadata(spark, wh).collect()}
    assert len(rows) == 2
    assert rows[result.fetch_id].finished_at is not None
    # idempotent: a second ensure adds nothing and changes nothing
    control_jdbc.ensure_control_table(spark, url)
    assert len(control.read_fetch_metadata(spark, wh).collect()) == 2


def test_lost_create_race_still_widens_old_shape_table(
    spark, tmp_path, monkeypatch
):
    """Mixed-version rollout: new code probes (absent), its CREATE
    loses the race to an old-version process that created the
    pre-evolution shape. The loser must fall through to the widening
    pass — not memoize-and-return — so the new columns exist before
    the first insert binds them."""
    from meteo_etl_spark.pipeline import control_jdbc

    if not jdbc.driver_available(spark, jdbc.DERBY_DRIVER):
        pytest.skip("Derby driver not on JVM classpath")
    url = f"jdbc:derby:{tmp_path}/race/db;create=true"

    # the "old-version rival" has already created the legacy shape
    jdbc._execute_update(
        spark,
        url,
        'CREATE TABLE fetch_metadata ('
        '"id" VARCHAR(36) NOT NULL PRIMARY KEY, '
        '"created_at" TIMESTAMP NOT NULL, '
        '"request_timestamp" TIMESTAMP NOT NULL, '
        '"request_params" VARCHAR(4000), '
        '"request_url" VARCHAR(2048) NOT NULL, '
        '"status" VARCHAR(16) NOT NULL)',
    )

    # first existence probe lies "absent" (the race window), later
    # probes tell the truth
    real_exists = control_jdbc.jdbc_table_exists
    calls = {"n": 0}

    def racy_exists(s, u, t):
        calls["n"] += 1
        if calls["n"] == 1:
            return False
        return real_exists(s, u, t)

    monkeypatch.setattr(control_jdbc, "jdbc_table_exists", racy_exists)
    control_jdbc._ENSURED_URLS.discard(url)
    control_jdbc.ensure_control_table(spark, url)

    cols = {c.lower() for c in jdbc.jdbc_table_columns(spark, url, "FETCH_METADATA")}
    assert {"payload_path", "finished_at", "error_data", "response_status"} <= cols


def test_non_additive_migration_rename_remap_and_check(spark, tmp_path):
    """The declared non-additive chain (reference alembic revisions
    a1cbf11c1945 + 4bcfdcf6e86a re-expressed): a legacy table with a
    ``raw_response_data`` column, free-text status values (mixed case,
    the pre-enum ``finished``) and a narrow ``request_url`` is — in ONE
    ensure_control_table call — renamed (data preserved), value-folded
    into the declared status domain, CHECK-enforced in-database, and
    retyped to VARCHAR(2048); a second ensure is a no-op (ledgered)."""
    from meteo_etl_spark.pipeline import control_jdbc

    if not jdbc.driver_available(spark, jdbc.DERBY_DRIVER):
        pytest.skip("Derby driver not on JVM classpath")
    url = f"jdbc:derby:{tmp_path}/mig/db;create=true"

    jdbc._execute_update(
        spark,
        url,
        'CREATE TABLE fetch_metadata ('
        '"id" VARCHAR(36) NOT NULL PRIMARY KEY, '
        '"created_at" TIMESTAMP NOT NULL, '
        '"request_timestamp" TIMESTAMP NOT NULL, '
        '"request_params" VARCHAR(4000), '
        '"request_url" VARCHAR(512) NOT NULL, '
        '"status" VARCHAR(16) NOT NULL, '
        '"raw_response_data" VARCHAR(4000))',
    )
    jdbc._execute_update(
        spark,
        url,
        "INSERT INTO fetch_metadata VALUES "
        "('00000000-0000-0000-0000-000000000001', "
        "TIMESTAMP('2025-01-01 00:00:00'), TIMESTAMP('2025-01-01 00:00:00'), "
        "'{}', 'https://old.example/v1', 'FINISHED', '{\"hourly\": {}}'), "
        "('00000000-0000-0000-0000-000000000002', "
        "TIMESTAMP('2025-01-02 00:00:00'), TIMESTAMP('2025-01-02 00:00:00'), "
        "'{}', 'https://old.example/v2', 'Pending', NULL)",
    )

    control_jdbc._ENSURED_URLS.discard(url)
    control_jdbc.ensure_control_table(spark, url)

    cols = {c.lower() for c in jdbc.jdbc_table_columns(spark, url, "FETCH_METADATA")}
    assert "raw_response_data" not in cols  # renamed, not added-beside
    assert "error_data" in cols
    meta = control_jdbc._column_meta(spark, url, "fetch_metadata")
    assert meta["request_url"] == ("VARCHAR", 2048)

    wh = Warehouse(str(tmp_path / "wh"), control_jdbc_url=url)
    rows = {r.id: r for r in control.read_fetch_metadata(spark, wh).collect()}
    legacy = rows["00000000-0000-0000-0000-000000000001"]
    assert legacy.error_data == '{"hourly": {}}'  # data survived the rename
    assert legacy.status == "success"  # finished -> success, case-folded
    assert legacy.request_url == "https://old.example/v1"  # retype kept data
    assert rows["00000000-0000-0000-0000-000000000002"].status == "pending"

    # the CHECK is enforced in-database on the migrated table
    with pytest.raises(Exception, match="(?i)check|constraint"):
        jdbc._execute_update(
            spark,
            url,
            "INSERT INTO fetch_metadata "
            '("id", "created_at", "request_timestamp", "request_url", "status") '
            "VALUES ('00000000-0000-0000-0000-00000000000f', "
            "TIMESTAMP('2025-01-03 00:00:00'), TIMESTAMP('2025-01-03 00:00:00'), "
            "'https://old.example/v3', 'bogus')",
        )

    # ledgered: both revisions recorded, re-ensure runs nothing new
    applied = control_jdbc._applied_revisions(spark, url)
    assert {rev for rev, _ in control_jdbc._MIGRATIONS} <= applied
    control_jdbc._ENSURED_URLS.discard(url)
    control_jdbc.ensure_control_table(spark, url)
    assert len(control.read_fetch_metadata(spark, wh).collect()) == 2

    # and the migrated table serves the full current lifecycle
    from datetime import datetime

    fid = control_jdbc.insert_fetch_metadata(
        spark, url, "https://new.example/v1", {"a": "1"}, datetime(2025, 2, 1)
    )
    control_jdbc.update_fetch_metadata(
        spark, url, fid, status="success", response_status=200,
        error_data=None, payload_path="/tmp/p", now=datetime(2025, 2, 1, 1),
    )
    rows = {r.id: r for r in control.read_fetch_metadata(spark, wh).collect()}
    assert rows[fid].finished_at is not None


def test_fresh_create_stamps_ledger_and_skips_migrations(spark, db_warehouse):
    """A table created by current code is already the post-migration
    shape: every declared revision is stamped at create time (alembic
    'stamp head'), so no migration DDL ever touches it."""
    from meteo_etl_spark.pipeline import control_jdbc

    url = db_warehouse.control_jdbc_url
    control_jdbc._ENSURED_URLS.discard(url)

    def boom(*a, **k):  # the fresh-create path must never reach here
        raise AssertionError("migration DDL ran on a fresh create")

    real = control_jdbc._run_migrations
    control_jdbc._run_migrations = boom
    try:
        control_jdbc.ensure_control_table(spark, url)
    finally:
        control_jdbc._run_migrations = real
    applied = control_jdbc._applied_revisions(spark, url)
    assert applied == {rev for rev, _ in control_jdbc._MIGRATIONS}

"""Live-database execution of the ``on_conflict`` upsert dialect.

``merge_statement(dialect="on_conflict")`` reproduces the reference's
own statement shape — ``INSERT .. ON CONFLICT (keys) DO UPDATE SET c =
EXCLUDED.c`` (`etl/load.py:35-55`) — but embedded Derby (the in-image
MERGE e2e database) does not speak ON CONFLICT, so unit tests alone
covered it until now. DuckDB does speak it (0.7+), and a DuckDB JDBC
driver jar rides along in this image's artifact cache; when present,
this suite boots a subprocess SparkSession with the jar on the driver
classpath and runs the full staged-upsert protocol (create /
update+insert / idempotent replay) against a live DuckDB database —
mirroring the Derby MERGE suite in tests/test_jdbc.py.

Gate: the test SKIPS with an explicit reason when no DuckDB jar is
found (same self-activating pattern as the Kafka e2e gate). The
subprocess is required because the driver jar must be on the JVM
classpath at launch for java.sql.DriverManager to register it.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_duckdb_jar() -> str | None:
    env = os.environ.get("SPARK_GRAFT_DUCKDB_JAR")
    if env and os.path.isfile(env):
        return env
    for root in (
        os.path.expanduser("~/.cache/coursier"),
        os.path.expanduser("~/.ivy2"),
        os.path.expanduser("~/.m2"),
    ):
        hits = glob.glob(os.path.join(root, "**", "duckdb_jdbc*.jar"), recursive=True)
        if hits:
            return sorted(hits)[-1]
    return None


DUCKDB_JAR = _find_duckdb_jar()

pytestmark = pytest.mark.skipif(
    DUCKDB_JAR is None,
    reason="no DuckDB JDBC driver jar found (set SPARK_GRAFT_DUCKDB_JAR to "
    "enable the on_conflict live e2e; the merge dialect is Derby-e2e'd in "
    "tests/test_jdbc.py)",
)

_DRIVER_SCRIPT = textwrap.dedent(
    """
    import sys

    repo, jar, db = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, repo)
    from pyspark.sql import Row, SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("on-conflict-e2e")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.jars", jar)
        .config("spark.driver.extraClassPath", jar)
        .getOrCreate()
    )
    url = f"jdbc:duckdb:{db}"
    from meteo_etl_spark.sources import jdbc

    assert jdbc.driver_available(spark, "org.duckdb.DuckDBDriver")

    # create: target does not exist -> CTAS WITH NO DATA + the unique
    # index ON CONFLICT arbitrates on, then the reference's statement
    base = spark.createDataFrame(
        [Row(k=1, v="a", tag="base"), Row(k=2, v="b", tag="base")]
    )
    n = jdbc.upsert_jdbc(base, url, "ups", ["k"], dialect="on_conflict")
    assert n == 2, n

    # update+insert in one batch; tag deliberately outside update_cols
    # so conflict rows keep their target tag (id/created_at parity)
    batch = spark.createDataFrame(
        [Row(k=2, v="B2", tag="new"), Row(k=3, v="c", tag="new")]
    )
    jdbc.upsert_jdbc(
        batch, url, "ups", ["k"], update_cols=["v"], dialect="on_conflict"
    )

    def rows():
        return {
            (r[0], r[1], r[2])
            for r in jdbc.read_jdbc(
                spark, url, '(SELECT "k", "v", "tag" FROM ups) t'
            ).collect()
        }

    expect = {(1, "a", "base"), (2, "B2", "base"), (3, "c", "new")}
    got = rows()
    assert got == expect, got

    # idempotent replay (the at-least-once redelivery contract)
    jdbc.upsert_jdbc(
        batch, url, "ups", ["k"], update_cols=["v"], dialect="on_conflict"
    )
    assert rows() == expect
    # staging cleaned up
    assert not jdbc.jdbc_table_exists(spark, url, "ups_stg")

    # the non-Derby LockIO path (TEXT body column — Postgres-class
    # dialects have no CLOB) against a live database
    from meteo_etl_spark.operators.atomic import JdbcLockIO

    lk = JdbcLockIO(spark, url)
    assert lk.put_if_absent("tbl#v1", '{"version": 1}')
    assert not lk.put_if_absent("tbl#v1", "loser")
    assert lk.get("tbl#v1") == '{"version": 1}'
    assert lk.get("tbl#v2") is None
    assert JdbcLockIO(spark, url).get("tbl#v1") == '{"version": 1}'  # table reused

    spark.stop()
    print("ON-CONFLICT-E2E-OK")
    """
)


def test_on_conflict_upsert_executes_against_live_duckdb(tmp_path):
    db = str(tmp_path / "oc.duckdb")
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER_SCRIPT, REPO, DUCKDB_JAR, db],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "ON-CONFLICT-E2E-OK" in proc.stdout

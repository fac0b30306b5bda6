"""The ALL-database deployment on a live ON CONFLICT database.

tests/test_control_jdbc.py proves the keep-Postgres deployment against
Derby with the ANSI MERGE dialect. This suite proves the same
deployment — control table, silver store, streaming sink, dashboard
reads — against a database that speaks the reference's OWN statement
(`INSERT .. ON CONFLICT DO UPDATE`, `etl/load.py:35-55`): DuckDB via
its JDBC driver, with ``Warehouse(jdbc_dialect="on_conflict")``.

Gate: skips with an explicit reason when no DuckDB jar is present
(same gate as tests/test_on_conflict_live.py). Runs in a subprocess so
the driver jar is on the JVM classpath at launch.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

from tests.test_on_conflict_live import DUCKDB_JAR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    DUCKDB_JAR is None,
    reason="no DuckDB JDBC driver jar found (the merge-dialect deployment "
    "is Derby-e2e'd in tests/test_control_jdbc.py)",
)

_SCRIPT = textwrap.dedent(
    """
    import sys

    repo, jar, workdir = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, repo)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("duckdb-deployment-e2e")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.jars", jar)
        .config("spark.driver.extraClassPath", jar)
        .getOrCreate()
    )
    url = f"jdbc:duckdb:{workdir}/deploy.duckdb"

    from meteo_etl_spark.pipeline import batch, control
    from meteo_etl_spark.pipeline.warehouse import Warehouse, read_observations
    from meteo_etl_spark.plans import analytics
    from meteo_etl_spark.sources.registry import Source
    from meteo_etl_spark.streaming import consume, produce
    from tests.conftest import N_HOURS, golden_payload

    Source.extract = lambda self, **extra: golden_payload(
        lat=float(self.params["latitude"]), lon=float(self.params["longitude"])
    )

    wh = Warehouse(
        root=f"{workdir}/wh",
        control_jdbc_url=url,
        observations_jdbc_url=url,
        jdbc_dialect="on_conflict",
    )

    # batch lifecycle: control row + silver merge, both in DuckDB via
    # the reference's own statement shape
    r1 = batch.run_etl(
        spark, wh, "meteo", {"latitude": 3.06, "longitude": 5.25}
    )
    assert r1.status == "success", r1
    obs = read_observations(spark, wh)
    assert obs.count() == N_HOURS
    # idempotent replay through the ON CONFLICT path
    r2 = batch.run_etl(
        spark, wh, "meteo", {"latitude": 3.06, "longitude": 5.25}
    )
    assert r2.status == "success"
    assert read_observations(spark, wh).count() == N_HOURS  # merged, not duped

    # streaming: bronze -> event -> consumer -> ON CONFLICT database sink
    r3 = batch.run_etl(
        spark, wh, "meteo", {"latitude": 13.06, "longitude": 5.25},
        fetch_job=batch.extract_and_save_to_disk,
    )
    topic = f"{workdir}/topic"
    produce.publish_finished_fetch(spark, wh, r3.fetch_id, topic)
    stats = consume.ConsumeStats()
    consume.consume_fetch_events(
        spark, wh, topic, f"{workdir}/ckpt", stats=stats,
        jdbc_sink=consume.JdbcSink(url, dialect="on_conflict"),
    ).awaitTermination(120)
    assert stats.events == 1 and stats.merged_rows == N_HOURS, stats
    assert read_observations(spark, wh).count() == 2 * N_HOURS

    # dashboard analytics straight off the database
    obs_n, meta_n, loc_n = analytics.get_counts(spark, wh)
    assert obs_n == 2 * N_HOURS and meta_n == 3 and loc_n == 2, (obs_n, meta_n, loc_n)
    assert analytics.last_job_status(spark, wh).endswith("Success")

    # control rows carry the full lifecycle in the database
    meta = control.read_fetch_metadata(spark, wh)
    assert meta.filter(F.col("finished_at").isNotNull()).count() == 3
    spark.stop()
    print("DUCKDB-DEPLOYMENT-OK")
    """
)


def test_all_database_deployment_on_conflict_duckdb(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, REPO, DUCKDB_JAR, str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "DUCKDB-DEPLOYMENT-OK" in proc.stdout

"""Spark 4 Python DataSource HTTP fan-out (sources/http_datasource):
a real scan against a live local HTTP server — one partition per fetch
job, executor-side GET, per-row dead-letter for failed coordinates.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.sources.http_datasource import MeteoHttpDataSource


@pytest.fixture()
def server():
    """Echoes the requested coordinates back in the payload so the test
    can prove each row came from its own HTTP request."""
    state = {"requests": [], "fail_for": set()}  # lat strings to 404

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            state["requests"].append(q)
            lat = q.get("latitude", ["?"])[0]
            if lat in state["fail_for"]:
                self.send_response(404)
                self.end_headers()
                self.wfile.write(b"no such grid point")
                return
            body = json.dumps({"echo_lat": lat, "hourly": {"n": 1}})
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body.encode())

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    state["url"] = f"http://127.0.0.1:{srv.server_address[1]}"
    yield state
    srv.shutdown()


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(MeteoHttpDataSource)
    return spark


JOBS = [{"latitude": 1.0, "longitude": 10.0}, {"latitude": 2.0, "longitude": 20.0},
        {"latitude": 3.0, "longitude": 30.0}]


def _scan(spark, url, jobs=None, **opts):
    reader = (
        spark.read.format("meteo_http")
        .option("url", url)
        .option("jobs", json.dumps(jobs or JOBS))
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_one_partition_per_job_each_fetched(registered, server):
    df = _scan(registered, server["url"])
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 3
    # every row's payload echoes ITS OWN coordinate -> one GET per job
    for r in rows:
        assert r.error is None
        assert json.loads(r.payload)["echo_lat"] == str(r.latitude)
    assert len(server["requests"]) == 3


def test_static_params_merged_into_every_request(registered, server):
    _scan(
        registered,
        server["url"],
        static_params=json.dumps({"hourly": "temperature_2m"}),
    ).collect()
    assert all(q.get("hourly") == ["temperature_2m"] for q in server["requests"])


def test_failed_job_dead_letters_instead_of_killing_scan(registered, server):
    server["fail_for"] = {"2.0"}
    df = _scan(registered, server["url"])
    ok = df.filter(F.col("error").isNull()).collect()
    bad = df.filter(F.col("error").isNotNull()).collect()
    assert {r.latitude for r in ok} == {1.0, 3.0}
    assert len(bad) == 1 and bad[0].latitude == 2.0
    assert "404" in bad[0].error


def test_option_validation():
    from meteo_etl_spark.sources.http_datasource import MeteoHttpReader

    with pytest.raises(ValueError, match="url"):
        MeteoHttpReader({})
    with pytest.raises(ValueError, match="jobs"):
        MeteoHttpReader({"url": "http://x"})
    with pytest.raises(ValueError, match="not JSON"):
        MeteoHttpReader({"url": "http://x", "jobs": "{bad"})
    with pytest.raises(ValueError, match="max_partitions"):
        MeteoHttpReader({"url": "http://x", "jobs": "[{}]", "max_partitions": "0"})


def test_max_partitions_chunks_jobs_with_dead_letter_preserved(registered, server):
    """100 jobs over 8 partitions: every job still fetched exactly once
    (sequentially within its chunk), failures still dead-letter per JOB
    — a bad coordinate poisons neither its task nor its chunk-mates."""
    jobs = [{"latitude": float(i), "longitude": float(10 * i)} for i in range(100)]
    server["fail_for"] = {"17.0", "42.0"}
    df = _scan(registered, server["url"], jobs=jobs, max_partitions="8")
    assert df.rdd.getNumPartitions() == 8
    rows = df.collect()
    assert len(rows) == 100
    assert len(server["requests"]) == 100
    ok = [r for r in rows if r.error is None]
    bad = [r for r in rows if r.error is not None]
    assert {r.latitude for r in bad} == {17.0, 42.0}
    assert all("404" in r.error for r in bad)
    # chunk-mates of the failed jobs still succeeded with THEIR payloads
    assert all(json.loads(r.payload)["echo_lat"] == str(r.latitude) for r in ok)


def test_max_partitions_above_job_count_degenerates_to_one_per_job(
    registered, server
):
    df = _scan(registered, server["url"], max_partitions="64")
    assert df.rdd.getNumPartitions() == len(JOBS)
    assert len(df.collect()) == len(JOBS)


def test_unparseable_coordinate_dead_letters_not_task_failure(registered, server):
    """A job with a null latitude must produce an error ROW (the float()
    coercion is inside the dead-letter boundary), not a crashed scan."""
    jobs = [{"latitude": 1.0, "longitude": 10.0},
            {"latitude": None, "longitude": 20.0}]
    df = _scan(registered, server["url"], jobs=jobs)
    rows = df.collect()
    assert len(rows) == 2
    bad = [r for r in rows if r.error is not None]
    assert len(bad) == 1 and "TypeError" in bad[0].error

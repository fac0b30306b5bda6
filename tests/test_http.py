"""S1 extractor against a real local HTTP server: success, retry on
503 (then success), typed error with upstream status, JSON error
passthrough, param + UA forwarding (reference `tests/etl/test_extract.py`)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from meteo_etl_spark.errors import ExtractError
from meteo_etl_spark.sources.http import fetch_json


@pytest.fixture()
def server():
    state = {"requests": [], "plan": []}  # plan: list of (status, body)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            state["requests"].append(
                {
                    "path": urlparse(self.path).path,
                    "query": parse_qs(urlparse(self.path).query),
                    "ua": self.headers.get("User-Agent"),
                }
            )
            status, body = (
                state["plan"].pop(0) if state["plan"] else (200, json.dumps({"ok": 1}))
            )
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body.encode())

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    state["url"] = f"http://127.0.0.1:{srv.server_address[1]}"
    yield state
    srv.shutdown()


def test_success_with_params_and_ua(server):
    out = fetch_json(
        server["url"] + "/v1/forecast",
        {"latitude": 3.06, "longitude": 5.25},
        user_agent="test-agent/9",
    )
    assert out == {"ok": 1}
    req = server["requests"][0]
    assert req["path"] == "/v1/forecast"
    assert req["query"]["latitude"] == ["3.06"]
    assert req["ua"] == "test-agent/9"


def test_retries_on_503_then_succeeds(server):
    server["plan"] = [(503, "slow down"), (503, "slow down"), (200, '{"ok": 2}')]
    out = fetch_json(server["url"], backoff=0.01)
    assert out == {"ok": 2}
    assert len(server["requests"]) == 3  # 2 retried failures + success


def test_non_retryable_status_raises_typed_error(server):
    server["plan"] = [(404, "nope")]
    with pytest.raises(ExtractError) as ei:
        fetch_json(server["url"])
    assert ei.value.status == 404
    assert len(server["requests"]) == 1  # 404 is not in the retry list


def test_retries_exhausted_raises(server):
    server["plan"] = [(503, "x")] * 10
    with pytest.raises(ExtractError):
        fetch_json(server["url"], retries=2, backoff=0.01)


def test_bad_json_passes_through(server):
    server["plan"] = [(200, "{not json")]
    with pytest.raises(json.JSONDecodeError):
        fetch_json(server["url"])


def test_etl_end_to_end_over_real_http(server, spark, warehouse):
    """The full lifecycle against a real HTTP boundary: two 503s, then
    the payload — retry absorbs the failures, normalize + merge land
    168 rows, control row finishes SUCCESS (the verify-skill drive)."""
    from pyspark.sql import functions as F

    from meteo_etl_spark.pipeline import batch, control
    from meteo_etl_spark.pipeline.warehouse import read_observations
    from meteo_etl_spark.schemas import METEO_PAYLOAD_SCHEMA
    from meteo_etl_spark.sources.registry import SourceSpec, register_source
    from meteo_etl_spark.operators.normalize import normalize_meteo
    from tests.conftest import N_HOURS, golden_payload

    server["plan"] = [
        (503, "busy"),
        (503, "busy"),
        (200, json.dumps(golden_payload())),
    ]
    register_source(
        SourceSpec(
            name="meteo-local",
            url=server["url"] + "/v1/forecast",
            static_params={},
            payload_schema=METEO_PAYLOAD_SCHEMA,
            normalize=normalize_meteo,
            required_params=("latitude", "longitude"),
        )
    )
    result = batch.run_etl(
        spark, warehouse, "meteo-local", {"latitude": 3.06, "longitude": 5.25}
    )
    assert result.status == "success"
    assert len(server["requests"]) == 3
    obs = read_observations(spark, warehouse)
    assert obs.filter(F.col("fetch_id") == result.fetch_id).count() == N_HOURS
    meta = control.read_fetch_metadata(spark, warehouse).collect()[0]
    assert meta.status == "success" and meta.response_status == 200

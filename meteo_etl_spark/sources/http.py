"""Driver-side HTTP JSON extraction with retry/backoff (S1).

Mirrors the reference extractor semantics (reference `etl/extract.py:
17-84`): GET with query params, 5 retries with backoff factor 0.5 on
{500, 502, 503, 504}, Retry-After honored, custom User-Agent, typed
``ExtractError`` carrying the HTTP status.

Spark stance: there is no native Spark HTTP source, and an API fetch is
a single small payload — this is legitimately driver-side work. The
fetched payload lands in bronze and everything after that point is
distributed. (At 100 TB the inputs arrive via object storage / Kafka,
not this path.)
"""

from __future__ import annotations

import json
from typing import Any

from meteo_etl_spark.errors import ExtractError

DEFAULT_RETRIES = 5
DEFAULT_BACKOFF = 0.5
RETRY_STATUSES = (500, 502, 503, 504)
DEFAULT_USER_AGENT = "meteo-etl-spark/0.1"


def fetch_json(
    url: str,
    params: dict[str, Any] | None = None,
    *,
    user_agent: str = DEFAULT_USER_AGENT,
    retries: int = DEFAULT_RETRIES,
    backoff: float = DEFAULT_BACKOFF,
    timeout: float = 30.0,
) -> dict:
    """GET ``url`` and parse the JSON body, with retry/backoff.

    Raises ``ExtractError`` (with upstream status when known) on HTTP
    failure, and ``json.JSONDecodeError`` passes through for the
    pipeline's error taxonomy (reference `etl/app.py:186-192`).
    """
    try:
        import requests
        from requests.adapters import HTTPAdapter
        from urllib3.util.retry import Retry
    except ImportError as exc:  # pragma: no cover - requests is bundled
        raise ExtractError(f"requests not available: {exc}") from exc

    session = requests.Session()
    retry = Retry(
        total=retries,
        backoff_factor=backoff,
        status_forcelist=list(RETRY_STATUSES),
        respect_retry_after_header=True,
        allowed_methods=["GET"],
    )
    adapter = HTTPAdapter(max_retries=retry)
    session.mount("http://", adapter)
    session.mount("https://", adapter)

    try:
        resp = session.get(
            url, params=params or {}, headers={"User-Agent": user_agent}, timeout=timeout
        )
    except requests.RequestException as exc:
        raise ExtractError(f"request failed: {exc}") from exc

    if resp.status_code >= 400:
        raise ExtractError(
            f"GET {url} returned {resp.status_code}", status=resp.status_code
        )
    return json.loads(resp.text)

"""Error taxonomy for the ETL pipeline.

Mirrors the reference's exception surface and its error→status-code
mapping (reference `etl/app.py:170-200`, `etl/extract.py:17-60`,
`etl/load.py`): LoadError→200, ExtractError→HTTP status,
json decode errors→200, anything else→500.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for engine errors."""


class ExtractError(EngineError):
    """HTTP extraction failed (reference `etl/extract.py` ExtractError).

    Carries the upstream HTTP status when known.
    """

    def __init__(self, message: str, status: int | None = None):
        super().__init__(message)
        self.status = status


class TransformError(EngineError):
    """Payload failed validation/normalization."""


class LoadError(EngineError):
    """Warehouse write (merge/append) failed (reference LoadError)."""


class ETLError(EngineError):
    """Job-level failure; carries the fetch_id for lineage
    (reference `etl/app.py:158-164`)."""

    def __init__(self, message: str, fetch_id: str | None = None):
        super().__init__(message)
        self.fetch_id = fetch_id

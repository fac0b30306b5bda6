"""Pluggable source registry (S2) — the template pattern, Spark-first.

Reference `etl/sources.py:29-101`: each source declares its URL, static
query params, a param validator, a payload model, and a transform. In
this engine a source is a ``SourceSpec`` whose ``normalize`` member is a
plain ``DataFrame -> DataFrame`` function built from native ops — the
extension point is declarative, so every registered source gets
Catalyst optimization for free.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from meteo_etl_spark import schemas
from meteo_etl_spark.errors import TransformError
from meteo_etl_spark.operators.normalize import normalize_meteo, normalize_metno
from meteo_etl_spark.sources import http


@dataclass(frozen=True)
class SourceSpec:
    """Declarative description of a fetchable source (reference
    `etl/sources.py:29-42`: BaseSource class attributes)."""

    name: str
    url: str
    static_params: dict[str, Any]
    payload_schema: T.StructType
    normalize: Callable[[DataFrame], DataFrame]
    required_params: tuple[str, ...] = ()
    user_agent: str = http.DEFAULT_USER_AGENT
    #: canonical param name → provider's wire name, applied when the
    #: request is built. Callers (CLI, pipeline) speak one canonical
    #: vocabulary (latitude/longitude); each source declares its own
    #: spelling — the reference's per-source param model
    #: (`etl/sources.py:41`, MeteoParams) as data instead of a class.
    param_aliases: dict[str, str] = field(default_factory=dict)


_REGISTRY: dict[str, SourceSpec] = {}


def register_source(spec: SourceSpec) -> SourceSpec:
    """Register a source under its name (reference `etl/sources.py:69-77`)."""
    _REGISTRY[spec.name] = spec
    return spec


@dataclass
class Source:
    """A spec bound to request params — performs extract/transform."""

    spec: SourceSpec
    params: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        missing = [k for k in self.spec.required_params if k not in self.params]
        if missing:
            raise TransformError(f"source {self.spec.name!r} missing params {missing}")

    @property
    def url(self) -> str:
        return self.spec.url

    def request_params(self, **extra: Any) -> dict[str, Any]:
        """static ∪ required ∪ extra params (reference
        `etl/sources.py:49-55`), re-keyed to the provider's wire names
        per the spec's ``param_aliases``."""
        merged = {**self.spec.static_params, **self.params, **extra}
        aliases = self.spec.param_aliases
        return {aliases.get(k, k): v for k, v in merged.items()}

    def extract(self, **extra: Any) -> dict:
        """Driver-side HTTP fetch (S1)."""
        return http.fetch_json(
            self.url, self.request_params(**extra), user_agent=self.spec.user_agent
        )

    def payload_to_df(self, spark: SparkSession, payload: dict) -> DataFrame:
        """One payload dict → single-row DataFrame with the declared schema.

        Routed through the JSON parser (``from_json``), not the Python
        row verifier: real APIs encode whole numbers as JSON ints
        (met.no altitude ``3``), which the strict verifier would reject
        against DoubleType while the JSON parser coerces — and it makes
        this path semantically identical to the bronze re-read
        (``spark.read.schema(...).json``), one parsing behavior
        everywhere.

        Parsed in FAILFAST mode: a payload whose SHAPE mismatches the
        schema (array where an object is declared, etc.) must raise —
        so the batch error taxonomy records a loud failure — not
        silently null the fields and mark the fetch 'success' with 0
        records, which PERMISSIVE (the default) would do."""
        import json as _json

        from pyspark.sql import functions as F

        raw = spark.createDataFrame(
            [(_json.dumps(payload),)], schema="payload string"
        )
        return raw.select(
            F.from_json(
                "payload", self.spec.payload_schema, {"mode": "FAILFAST"}
            ).alias("j")
        ).select("j.*")

    def transform(self, payload_df: DataFrame) -> DataFrame:
        """Normalize raw payload rows to records (T1-T4)."""
        return self.spec.normalize(payload_df)

    def extract_and_transform(self, spark: SparkSession, **extra: Any) -> DataFrame:
        """Fetch → validate → normalize (reference `etl/sources.py:64-66`)."""
        return self.transform(self.payload_to_df(spark, self.extract(**extra)))


def create_source(name: str, params: dict[str, Any] | None = None) -> Source:
    """Factory by registered name (reference `etl/sources.py:93-94`)."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown source {name!r}; registered: {sorted(_REGISTRY)}")
    return Source(_REGISTRY[name], dict(params or {}))


def get_source_by_url(url: str) -> SourceSpec:
    """Reverse lookup by static URL (J3; reference `etl/sources.py:97-100`).

    The registry is tiny (a dim table) — at query time the same lookup is
    expressed as a broadcast join against a sources dim DataFrame.
    """
    for spec in _REGISTRY.values():
        if spec.url == url:
            return spec
    raise KeyError(f"no source registered for url {url!r}")


# ---------------------------------------------------------------------------
# The Open-Meteo source (reference `etl/sources.py:80-90`).
# ---------------------------------------------------------------------------

METEO_SOURCE = register_source(
    SourceSpec(
        name="meteo",
        url="https://api.open-meteo.com/v1/forecast",
        static_params={"hourly": ",".join(schemas.HOURLY_MEASURES)},
        payload_schema=schemas.METEO_PAYLOAD_SCHEMA,
        normalize=normalize_meteo,
        required_params=("latitude", "longitude"),
    )
)

# ---------------------------------------------------------------------------
# Second registered source: met.no locationforecast (public
# api.met.no/weatherapi/locationforecast/2.0 compact format) — a
# row-oriented GeoJSON payload with its own schema and normalize,
# proving the registry template generalizes beyond one payload shape
# (the reference's registry exists for exactly this,
# `etl/sources.py:69-77`). met.no requires an identifying User-Agent.
# ---------------------------------------------------------------------------

METNO_SOURCE = register_source(
    SourceSpec(
        name="metno",
        url="https://api.met.no/weatherapi/locationforecast/2.0/compact",
        static_params={},
        payload_schema=schemas.METNO_PAYLOAD_SCHEMA,
        normalize=normalize_metno,
        required_params=("latitude", "longitude"),
        param_aliases={"latitude": "lat", "longitude": "lon"},
    )
)

"""Format-agnostic table I/O: one read/write seam over the file
formats a 100 TB lakehouse actually meets — parquet (the native
format everywhere else in this engine), ORC (the other columnar
standard; Spark bundles orc-core), JSON lines (interchange/bronze)
and CSV (ingest boundary). The Avro FILE format needs the external
``spark-avro`` datasource jar, which this image does not bundle —
requesting it raises a clear error naming the jar (same
environment-bound class as the real-Kafka socket path).

Why a seam instead of calling ``spark.read.<fmt>`` inline: the
row-oriented text formats are LOSSY without discipline — CSV has no
types (everything reads back string) and JSON widens floats/loses
binary. ``read_table_as``/``write_table_as`` pin the discipline in
one place:

- writes go through one ``DataFrameWriter`` path with per-format
  safety options (CSV: header + explicit null marker; JSON/CSV:
  ISO-8601 timestamps);
- reads REQUIRE an explicit schema for json/csv (``schema=`` or
  ``like=`` a reference frame) — inference is forbidden: at 100 TB
  schema inference is a full extra scan, and a sampled inference can
  silently widen/narrow types between runs.

Round-trip exactness is pinned per format in tests/test_formats.py
on the TPC-H tables (dates, decimals-as-doubles, strings, longs) and
the embeddings table (array<float> — supported by parquet/orc/json,
REJECTED up front for csv, which has no array syntax).

Reference parity: the reference's file surface is JSON bronze only
(`streaming/load.py:19-29`); the columnar formats are engine
extension surface (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: formats servable from the bundled jars.
NATIVE_FORMATS = ("parquet", "orc", "json", "csv")

#: per-format writer options that make the text formats round-trip
#: (timestamps as ISO-8601 instants; CSV needs a header and an
#: unambiguous null marker distinct from the empty string).
_WRITE_OPTS: dict[str, dict[str, str]] = {
    "csv": {
        "header": "true",
        "nullValue": "\\N",
        "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    },
    "json": {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"},
}

_READ_OPTS: dict[str, dict[str, str]] = {
    "csv": {
        "header": "true",
        "nullValue": "\\N",
        # the writer quotes embedded record separators; only multiLine
        # parses them back. Cost note: multiLine CSV files are NOT
        # byte-range splittable — one task per file. CSV is an ingest
        # boundary here, never the scale path (parquet/orc are); keep
        # ingest files modest or strip newlines upstream.
        "multiLine": "true",
        # distinguish written-"" from written-null (nullValue above)
        "emptyValue": "",
        "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    },
    "json": {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"},
}

#: types CSV cannot carry (no array/map/struct/binary syntax).
_CSV_FORBIDDEN = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)


def _check_format(fmt: str) -> str:
    f = fmt.lower()
    if f == "avro":
        raise ValueError(
            "the Avro FILE format needs the external spark-avro "
            "datasource jar (org.apache.spark:spark-avro_2.13), which "
            "is not bundled in this image — use the wire-level codec "
            "in streaming/avro_codec.py, or add the jar via "
            "spark.jars.packages"
        )
    if f not in NATIVE_FORMATS:
        raise ValueError(f"unknown format {fmt!r}; supported: {NATIVE_FORMATS}")
    return f


def _check_csv_schema(schema: T.StructType) -> None:
    bad = [
        f.name for f in schema.fields if isinstance(f.dataType, _CSV_FORBIDDEN)
    ]
    if bad:
        raise ValueError(
            f"csv cannot carry nested/binary columns {bad}; use "
            "parquet/orc (columnar) or json (nested-capable) instead"
        )


def write_table_as(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write ``df`` at ``path`` in ``fmt`` with the round-trip-safe
    option set; ``partition_by`` flows to the same directory layout
    every format shares. CSV rejects nested/binary schemas UP FRONT
    (a silent stringification would corrupt the round-trip)."""
    f = _check_format(fmt)
    if f == "csv":
        _check_csv_schema(df.schema)
    w = df.write.mode(mode).format(f)
    for k, v in {**_WRITE_OPTS.get(f, {}), **options}.items():
        w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table_as(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    *,
    schema: T.StructType | str | None = None,
    like: DataFrame | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` as ``fmt``. Self-describing formats (parquet,
    orc) carry their own schema; json/csv REQUIRE one — pass
    ``schema=`` (StructType or DDL string) or ``like=`` (borrow a
    reference frame's schema). Inference is deliberately not offered:
    it costs a full extra scan at scale and is run-to-run unstable."""
    f = _check_format(fmt)
    if like is not None:
        if schema is not None:
            raise ValueError("pass schema= or like=, not both")
        schema = like.schema
    if f in ("json", "csv") and schema is None:
        raise ValueError(
            f"{f} has no embedded schema — pass schema= or like= "
            "(inference is forbidden: full extra scan, unstable types)"
        )
    r = spark.read.format(f)
    for k, v in {**_READ_OPTS.get(f, {}), **options}.items():
        r = r.option(k, v)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)

"""NTZ-robust epoch extraction.

``F.unix_millis`` / ``F.unix_micros`` raise ``DATATYPE_MISMATCH`` on
TIMESTAMP_NTZ input (Spark 4 infers NTZ for parquet ``timestamp[us]``
with ``isAdjustedToUTC=false``). Every epoch extraction in the engine
routes through these helpers, which cast to TIMESTAMP first:

- on a TIMESTAMP column the cast is an identity and Catalyst's
  ``SimplifyCasts`` removes it — zero plan cost;
- on a TIMESTAMP_NTZ column the cast interprets the wall-clock in the
  session timezone, which the engine pins to UTC (session.py), so the
  result is exact and matches the DuckDB oracle (DuckDB TIMESTAMP is
  timezone-naive-as-UTC).

This keeps NTZ handling at the expression layer instead of requiring
every source to pre-normalize (sources/testdata.py still normalizes at
load so downstream schemas are stable, but a user handing the operators
an NTZ frame directly gets correct answers, not an AnalysisException).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _as_ts(col: ColumnOrName) -> Column:
    c = col if isinstance(col, Column) else F.col(col)
    return c.cast("timestamp")


def epoch_ms(col: ColumnOrName) -> Column:
    """Epoch milliseconds as LONG (microseconds truncated); NTZ-safe."""
    return F.unix_millis(_as_ts(col))


def epoch_us(col: ColumnOrName) -> Column:
    """Epoch microseconds as LONG; NTZ-safe."""
    return F.unix_micros(_as_ts(col))

"""DuckDB oracle comparator — mirrors the driver's t2 check:
row count + schema (column names) + order-insensitive values.

Default is STRICT bit-exact float comparison — the equivalent of the
driver's value hash, so queries the registry rotation defers out of
the driver's 50-entry window keep hash-grade coverage here (ADVICE r2).
Pass ``strict=False`` for the 1e-9-relative-tolerance mode (used only
by tests that compare against independently-derived expectations, not
by the query-ledger gate)."""

from __future__ import annotations

import math
import struct

import duckdb
import pandas as pd

from meteo_etl_spark.schemas import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            if getattr(col.dtype, "tz", None) is not None:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = col.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(col):
            df[c] = col.astype("float64")
        elif pd.api.types.is_integer_dtype(col):
            df[c] = col.astype("Int64")
        elif col.dtype == object:
            df[c] = col.where(col.notna(), None)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(
    spark_df, oracle_df: pd.DataFrame, *, name: str = "", strict: bool = True
) -> None:
    got = _canon(spark_df.toPandas())
    exp = _canon(oracle_df)

    assert list(got.columns) == list(exp.columns), (
        f"{name}: column mismatch: spark={list(got.columns)} oracle={list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: row count {len(got)} != {len(exp)}"

    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            ga, ea = g.astype("float64"), e.astype("float64")
            both_nan = ga.isna() & ea.isna()
            eq_fn = _bit_equal if strict else _isclose
            close = [
                bool(bn) or eq_fn(a, b)
                for a, b, bn in zip(ga.tolist(), ea.tolist(), both_nan.tolist())
            ]
            bad = [i for i, ok in enumerate(close) if not ok]
            assert not bad, (
                f"{name}: column {c!r} differs at rows {bad[:5]}: "
                f"spark={ga.iloc[bad[:5]].tolist()} oracle={ea.iloc[bad[:5]].tolist()}"
            )
        else:
            eq = g.fillna("\0<NA>") .eq(e.fillna("\0<NA>")) if g.dtype == object else g.eq(e) | (g.isna() & e.isna())
            bad = [i for i, ok in enumerate(eq.tolist()) if not ok]
            assert not bad, (
                f"{name}: column {c!r} differs at rows {bad[:5]}: "
                f"spark={g.iloc[bad[:5]].tolist()} oracle={e.iloc[bad[:5]].tolist()}"
            )


def _isclose(a: float, b: float) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        return (a is None or math.isnan(a)) and (b is None or math.isnan(b))
    return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)


def _bit_equal(a: float, b: float) -> bool:
    """The driver's value-hash equivalence: identical float64 bits
    (NaN==NaN, and -0.0 != 0.0 exactly as a hash would see them)."""
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        return (a is None or math.isnan(a)) and (b is None or math.isnan(b))
    return struct.pack("<d", a) == struct.pack("<d", b)

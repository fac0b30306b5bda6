"""Z-order clustering: per-file min-max stats must become narrow on
EVERY participating column (the data-skipping contract), with the row
set unchanged."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from meteo_etl_spark.operators.zorder import zorder_values, zorder_write
from meteo_etl_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL

N_FILES = 16


def _file_spans(path: str, cols: list[str]) -> dict[str, list[float]]:
    """Per parquet file, (max-min) span of each column from footer
    stats only — the exact information a pruning scan uses."""
    spans: dict[str, list[float]] = {c: [] for c in cols}
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        name_to_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(rg).column(name_to_idx[c]).statistics
                assert st is not None and st.has_min_max
                lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
        for c in cols:
            spans[c].append(float(hi[c]) - float(lo[c]))
    return spans


def test_zorder_narrows_minmax_on_both_columns(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "value"
    )
    total = {
        c: (
            ev.agg({c: "max"}).collect()[0][0]
            - ev.agg({c: "min"}).collect()[0][0]
        )
        for c in ("user_id", "value")
    }

    naive = str(tmp_path / "naive")
    ev.repartition(N_FILES).write.parquet(naive)
    zpath = str(tmp_path / "zorder")
    zorder_write(ev, zpath, ["user_id", "value"], num_files=N_FILES)

    naive_spans = _file_spans(naive, ["user_id", "value"])
    z_spans = _file_spans(zpath, ["user_id", "value"])

    for c in ("user_id", "value"):
        naive_mean = sum(naive_spans[c]) / len(naive_spans[c]) / total[c]
        z_mean = sum(z_spans[c]) / len(z_spans[c]) / total[c]
        # round-robin files span most of the table on every column
        # (sampling narrows small files a bit); 16 z-files cover ~1/16
        # of the curve -> roughly quarter-spans per column. Measured at
        # sf0.001: user_id 1.00 -> 0.19, value 0.65 -> 0.35.
        assert naive_mean > 0.6, (c, naive_mean)
        assert z_mean < 0.45, (c, z_mean)
        assert z_mean < naive_mean * 0.6, (c, z_mean, naive_mean)

    # clustering is a layout change only: identical row multiset
    a = sorted(map(tuple, spark.read.parquet(naive).collect()))
    b = sorted(map(tuple, spark.read.parquet(zpath).collect()))
    assert a == b


def test_zorder_values_bit_interleave_contract(spark):
    """Low buckets of both columns -> low z; flipping either column's
    top bucket moves z by its interleaved weight (col order encoded)."""
    df = spark.createDataFrame(
        [(0.0, 0.0), (255.0, 0.0), (0.0, 255.0), (255.0, 255.0)],
        "a double, b double",
    )
    # force min=0, max=255 via the data itself; bits=8 -> bucket==value
    out = {
        (r["a"], r["b"]): r["__z"]
        for r in zorder_values(df, ["a", "b"]).collect()
    }
    assert out[(0.0, 0.0)] == 0
    assert out[(255.0, 255.0)] == (1 << 16) - 1
    # column a owns the higher bit of each interleaved pair
    assert out[(255.0, 0.0)] == sum(1 << (2 * j + 1) for j in range(8))
    assert out[(0.0, 255.0)] == sum(1 << (2 * j) for j in range(8))


def test_zorder_rejects_bad_arity(spark):
    ev = load_table(spark, SF_SMALL, "events")
    with pytest.raises(ValueError, match="2-8 columns"):
        zorder_values(ev, ["value"])


def test_optimize_with_zorder_clusters_and_preserves_rows(spark, tmp_path):
    """compact_table(zorder_cols=...) both defragments AND clusters:
    fewer files, tight per-file stats on every z column, identical
    row multiset — OPTIMIZE ZORDER in one pass."""
    from meteo_etl_spark.operators.compact import compact_table

    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "frag")
    # fragment: 64 round-robin files
    ev.repartition(64).write.parquet(path)

    stats = compact_table(
        spark,
        path,
        target_file_bytes=4 * 1024,  # force several output files
        zorder_cols=["user_id", "value"],
    )
    assert stats.files_after < stats.files_before

    spans = _file_spans(path, ["user_id", "value"])
    n_out = len(spans["user_id"])
    assert n_out >= 4  # enough files for clustering to be observable
    for c in ("user_id", "value"):
        total = (
            ev.agg({c: "max"}).collect()[0][0]
            - ev.agg({c: "min"}).collect()[0][0]
        )
        mean_span = sum(spans[c]) / n_out / total
        assert mean_span < 0.6, (c, mean_span, n_out)

    a = sorted(map(tuple, ev.collect()))
    b = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert a == b


def test_zorder_eight_columns_stays_non_negative(spark):
    """8 columns auto-lower bits so the interleave never touches the
    int64 sign bit — the curve stays monotone end to end."""
    cols = [f"c{i}" for i in range(8)]
    rows = [tuple(float(v) for _ in cols) for v in (0.0, 63.0, 127.0)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols))
    zs = [r["__z"] for r in zorder_values(df, cols).collect()]
    assert all(z >= 0 for z in zs)
    assert sorted(zs) == zs or sorted(zs, reverse=True) == zs  # monotone per row order
    assert max(zs) < 1 << 63

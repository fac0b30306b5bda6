"""Property-based check of the merge kernel (exceeds the reference's
test rigor — SURVEY.md §5: no property tests exist there).

Model: a Python dict applying upsert batches in order, resolving
batch-internal duplicates by highest ``seq`` (last-write-wins — the
same rule merge_parquet applies via ``dedup_order``). After any
sequence of batches, the parquet table must equal the model exactly.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meteo_etl_spark.operators.upsert import merge_parquet

ROW = st.tuples(
    st.integers(min_value=0, max_value=6),   # key — small domain forces conflicts
    st.integers(min_value=-100, max_value=100),  # value
)
BATCH = st.lists(ROW, min_size=1, max_size=8)
BATCHES = st.lists(BATCH, min_size=1, max_size=4)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("seq", T.IntegerType()),
    ]
)


@pytest.fixture(scope="module")
def mspark():
    from meteo_etl_spark.session import get_spark

    return get_spark("merge-props", shuffle_partitions=4)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=BATCHES)
def test_merge_equals_dict_model(mspark, tmp_path_factory, batches):
    path = str(tmp_path_factory.mktemp("merge") / "t")

    model: dict[int, tuple[int, int]] = {}
    seq = 0
    for batch in batches:
        rows = []
        for k, v in batch:
            rows.append((k, v, seq))
            seq += 1
        df = mspark.createDataFrame(rows, schema=SCHEMA)
        merge_parquet(
            mspark,
            path,
            df,
            key_cols=["k"],
            dedup_order=[F.desc("seq")],
        )
        # model: within-batch last-write-wins by seq, then apply
        for k, v, s in rows:
            cur = model.get(k)
            if cur is None or s >= cur[1]:
                model[k] = (v, s)

    got = {
        r.k: (r.v, r.seq)
        for r in mspark.read.parquet(path).collect()
    }
    assert got == model


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=BATCH)
def test_merge_is_idempotent(mspark, tmp_path_factory, batch):
    """Re-merging the identical batch never changes the table (the
    ST2 effectively-exactly-once invariant)."""
    path = str(tmp_path_factory.mktemp("idem") / "t")
    rows = [(k, v, i) for i, (k, v) in enumerate(batch)]
    df = mspark.createDataFrame(rows, schema=SCHEMA)

    merge_parquet(mspark, path, df, key_cols=["k"], dedup_order=[F.desc("seq")])
    first = sorted((r.k, r.v, r.seq) for r in mspark.read.parquet(path).collect())
    merge_parquet(mspark, path, df, key_cols=["k"], dedup_order=[F.desc("seq")])
    second = sorted((r.k, r.v, r.seq) for r in mspark.read.parquet(path).collect())
    assert first == second

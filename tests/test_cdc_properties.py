"""Property-based check of the CDC kernel (same discipline as
test_merge_properties: a Python dict model replays the changelog
sequentially; after any sequence of batches the applied state must
equal the model exactly — for both the DataFrame kernel and the
parquet sink).

Model rule: within a batch, the change with the highest seq per key
wins (ties impossible — seq is the global emission index); 'D'
removes the key, any other verb upserts. Across batches, later
batches win (arrival order).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meteo_etl_spark.operators.cdc import apply_changelog, apply_changelog_parquet

CHANGE = st.tuples(
    st.integers(min_value=0, max_value=5),  # key — small domain forces conflicts
    st.integers(min_value=-50, max_value=50),  # value
    st.sampled_from(["U", "D", "I"]),  # verb (I behaves as upsert)
)
BATCH = st.lists(CHANGE, min_size=1, max_size=8)
BATCHES = st.lists(BATCH, min_size=1, max_size=3)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("op", T.StringType()),
        T.StructField("seq", T.IntegerType()),
    ]
)


@pytest.fixture(scope="module")
def mspark():
    from meteo_etl_spark.session import get_spark

    return get_spark("cdc-props", shuffle_partitions=4)


def _model_apply(state: dict, batch: list[tuple]) -> None:
    final: dict = {}
    for k, v, op, seq in batch:
        if k not in final or seq > final[k][2]:
            final[k] = (v, op, seq)
    for k, (v, op, _seq) in final.items():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v


def _with_seq(batch: list[tuple], start: int) -> list[tuple]:
    return [(k, v, op, start + i) for i, (k, v, op) in enumerate(batch)]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=BATCHES)
def test_dataframe_kernel_matches_model(mspark, batches):
    state: dict = {}
    snap = mspark.createDataFrame([], SCHEMA).select("k", "v")
    seq = 0
    for batch in batches:
        rows = _with_seq(batch, seq)
        seq += len(rows)
        _model_apply(state, rows)
        chg = mspark.createDataFrame(rows, SCHEMA)
        snap = apply_changelog(snap, chg, ["k"], [F.col("seq").desc()])
    got = {r.k: r.v for r in snap.collect()}
    assert got == state


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=BATCHES)
def test_parquet_sink_matches_model(mspark, batches, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cdcprop") / "t")
    state: dict = {}
    seq = 0
    for batch in batches:
        rows = _with_seq(batch, seq)
        seq += len(rows)
        _model_apply(state, rows)
        chg = mspark.createDataFrame(rows, SCHEMA)
        apply_changelog_parquet(mspark, path, chg, ["k"], [F.col("seq").desc()])
    import os

    if not os.path.isdir(path):  # every batch may have been all-deletes
        assert state == {}
        return
    got = {r.k: r.v for r in mspark.read.parquet(path).select("k", "v").collect()}
    assert got == state


# ---------------------------------------------------------------------------
# SCD Type-2 properties: vs a sequential model, and structural interval
# invariants (per-key chains partition the timeline; one current row per
# surviving key).
# ---------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=st.lists(CHANGE, min_size=1, max_size=14))
def test_scd2_matches_sequential_model(mspark, batch):
    from meteo_etl_spark.operators.cdc import scd2_history

    rows = _with_seq(batch, 0)  # seq doubles as the event time (unique)
    chg = mspark.createDataFrame(rows, SCHEMA)
    hist = scd2_history(chg, ["k"], "seq").collect()

    # model: replay per key in seq order
    per_key: dict = {}
    for k, v, op, seq in rows:
        per_key.setdefault(k, []).append((seq, op, v))
    want = set()
    for k, evs in per_key.items():
        evs.sort()
        for i, (seq, op, v) in enumerate(evs):
            if op == "D":
                continue
            nxt = evs[i + 1][0] if i + 1 < len(evs) else None
            want.add((k, seq, nxt, 1 if nxt is None else 0, v))
    got = {
        (r["k"], r["valid_from"], r["valid_to"], r["is_current"], r["v"])
        for r in hist
    }
    assert got == want

    # structural invariants
    by_key: dict = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    for k, rs in by_key.items():
        rs.sort(key=lambda r: r["valid_from"])
        assert sum(r["is_current"] for r in rs) <= 1
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] is not None
            assert a["valid_to"] <= b["valid_from"]  # never overlapping

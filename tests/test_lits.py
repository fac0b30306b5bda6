"""One-round-trip literal builders (functions/lits) + the r15 plan-
construction memos (fan_out partition probe, load_table reader memo).

The literal helpers must be BIT-IDENTICAL to the per-element F.lit
path — the engine's oracle hashes ride on them; the memos must never
change what a query computes (only how fast its plan is built) and
must drop stale entries when files are rewritten.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.functions.lits import (
    dlit,
    dlit2,
    ilit,
    ilit2,
    num_lit_array,
)

AWKWARD_DOUBLES = [
    0.0,
    -0.0,
    1.0,
    -1.5,
    0.1,
    2.0 / 3.0,
    1e-300,
    -1e300,
    5e-324,  # min subnormal
    1.7976931348623157e308,  # max double
    math.pi,
    123456789.123456789,
]

AWKWARD_INTS = [
    0,
    1,
    -1,
    2**31 - 1,
    -(2**31),
    2**31,  # first value that must promote to bigint
    -(2**31) - 1,
    2**63 - 1,
    -(2**63),
]


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_dlit_bit_identical(spark):
    got = _one(spark, dlit(AWKWARD_DOUBLES))
    ref = _one(spark, F.array(*[F.lit(float(x)) for x in AWKWARD_DOUBLES]))
    assert [x.hex() for x in got] == [x.hex() for x in ref]


def test_dlit_type_is_array_double(spark):
    df = spark.range(1).select(dlit([1.0, 2.5]).alias("v"))
    assert dict(df.dtypes)["v"] == "array<double>"


def test_dlit2_matrix_identical(spark):
    m = [AWKWARD_DOUBLES[:4], AWKWARD_DOUBLES[4:8]]
    got = _one(spark, dlit2(m))
    ref = _one(
        spark,
        F.array(*[F.array(*[F.lit(float(x)) for x in row]) for row in m]),
    )
    assert [[x.hex() for x in r] for r in got] == [
        [x.hex() for x in r] for r in ref
    ]


def test_dlit_rejects_nonfinite():
    with pytest.raises(ValueError):
        dlit([1.0, float("nan")])
    with pytest.raises(ValueError):
        dlit([float("inf")])


def test_ilit_matches_f_lit_promotion(spark):
    small = [x for x in AWKWARD_INTS if -(2**31) <= x <= 2**31 - 1]
    df = spark.range(1).select(
        ilit(small).alias("a"),
        F.array(*[F.lit(x) for x in small]).alias("b"),
        ilit(AWKWARD_INTS).alias("c"),
        F.array(*[F.lit(x) for x in AWKWARD_INTS]).alias("d"),
    )
    types = dict(df.dtypes)
    assert types["a"] == types["b"] == "array<int>"
    assert types["c"] == types["d"] == "array<bigint>"
    row = df.collect()[0]
    assert list(row["a"]) == list(row["b"])
    assert list(row["c"]) == list(row["d"])


def test_ilit2_matrix(spark):
    m = [[1, 2], [2**40, -5]]
    got = _one(spark, ilit2(m))
    ref = _one(spark, F.array(*[F.array(*[F.lit(x) for x in r]) for r in m]))
    assert [list(r) for r in got] == [list(r) for r in ref]


def test_num_lit_array_dispatch(spark):
    df = spark.range(1).select(
        num_lit_array([1, 2, 3]).alias("i"),
        num_lit_array([1.0, 2.0]).alias("d"),
        num_lit_array(["a", "b"]).alias("s"),
    )
    t = dict(df.dtypes)
    assert t["i"] == "array<int>"
    assert t["d"] == "array<double>"
    assert t["s"] == "array<string>"


def test_fan_out_memo_same_plan_same_answer(spark):
    from meteo_etl_spark.operators import parallelism as par

    df1 = spark.range(100).filter(F.col("id") > 3)
    df2 = spark.range(100).filter(F.col("id") > 3)
    out1 = par.fan_out(df1)
    out2 = par.fan_out(df2)  # memo hit — must make the same decision
    assert out1.rdd.getNumPartitions() == out2.rdd.getNumPartitions()
    assert sorted(r["id"] for r in out2.collect()) == list(range(4, 100))


def test_load_table_memo_invalidates_on_rewrite(spark, tmp_path):
    from meteo_etl_spark.sources import testdata as td

    sf_dir = str(tmp_path)
    p = os.path.join(sf_dir, "documents.parquet")
    spark.range(5).selectExpr(
        "cast(id as bigint) as doc_id", "'x' as text", "'s' as source"
    ).write.mode("overwrite").parquet(p)
    df1 = td.load_table(spark, sf_dir, "documents")
    assert df1.count() == 5
    # same files, same stat → memo returns the SAME reader
    assert td.load_table(spark, sf_dir, "documents") is df1
    # rewrite → stat changes → fresh reader sees the new data
    spark.range(7).selectExpr(
        "cast(id as bigint) as doc_id", "'y' as text", "'s' as source"
    ).write.mode("overwrite").parquet(p)
    df2 = td.load_table(spark, sf_dir, "documents")
    assert df2.count() == 7

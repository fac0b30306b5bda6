"""Deterministic epoch shuffle (functions/sampling.epoch_shuffle).

Contracts: bijective (every row gets exactly one (shard, pos), pos is
dense 1..n per shard), partition-layout independent, epoch-sensitive,
rand()-free. Values are oracle-certified by docs_epoch_shuffle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.functions.sampling import epoch_shuffle


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 500).withColumnRenamed("id", "doc_id")


def test_dense_positions_per_shard(spark, ids):
    out = epoch_shuffle(ids, "doc_id", epoch=1, shards=4)
    assert out.count() == 500
    per = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.countDistinct("pos").alias("d"),
    )
    for r in per.collect():
        assert (r.lo, r.hi, r.d) == (1, r.n, r.n)  # dense 1..n, no gaps/dups


def test_partition_layout_invariance(spark, ids):
    a = epoch_shuffle(ids.repartition(1), "doc_id", epoch=3, shards=4)
    b = epoch_shuffle(ids.repartition(17), "doc_id", epoch=3, shards=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_epochs_permute_differently(spark, ids):
    e1 = {r.doc_id: (r.shard, r.pos) for r in epoch_shuffle(ids, "doc_id", epoch=1).collect()}
    e2 = {r.doc_id: (r.shard, r.pos) for r in epoch_shuffle(ids, "doc_id", epoch=2).collect()}
    moved = sum(1 for k in e1 if e1[k] != e2[k])
    assert moved > 400  # essentially every row gets a new address


def test_replay_is_identical(spark, ids):
    a = epoch_shuffle(ids, "doc_id", epoch=5).collect()
    b = epoch_shuffle(ids, "doc_id", epoch=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bad_shards_rejected(spark, ids):
    with pytest.raises(ValueError, match="shards"):
        epoch_shuffle(ids, "doc_id", epoch=1, shards=0)

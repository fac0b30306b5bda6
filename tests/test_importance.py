"""DSIR importance scoring + priority sampling — algorithmic
properties the driver oracle can't express (the oracle parity itself
is covered by the parametrized `docs_dsir_weights` /
`docs_priority_sample` queries in test_queries)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.functions.importance import dsir_scores
from meteo_etl_spark.functions.sampling import priority_sample


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # target slice: "ml" domain vocabulary
    for i in range(20):
        rows.append((i, "model training data quality tokens", "tgt"))
    # target-like raw docs vs off-domain raw docs
    for i in range(20, 30):
        rows.append((i, "model training tokens and more tokens", "raw"))
    for i in range(30, 40):
        rows.append((i, "weather rain frost sunshine humidity", "raw"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_dsir_targetlike_docs_score_higher(spark, corpus):
    scores = {
        r.doc_id: r.score
        for r in dsir_scores(corpus, F.col("source") == "tgt").collect()
    }
    # only raw docs scored
    assert set(scores) == set(range(20, 40))
    targetlike = min(scores[i] / 1 for i in range(20, 30))
    offdomain = max(scores[i] for i in range(30, 40))
    assert targetlike > offdomain, (targetlike, offdomain)


def test_dsir_partition_invariant(spark, corpus):
    a = sorted(map(tuple, dsir_scores(corpus, F.col("source") == "tgt").collect()))
    b = sorted(
        map(
            tuple,
            dsir_scores(corpus.repartition(17), F.col("source") == "tgt").collect(),
        )
    )
    assert a == b


def test_priority_sample_deterministic_and_weight_biased(spark):
    df = spark.createDataFrame(
        [(i, 1 if i < 90 else 1000) for i in range(100)], "id long, w long"
    )
    s1 = sorted(r.id for r in priority_sample(df, "id", "w", 10).collect())
    s2 = sorted(
        r.id for r in priority_sample(df.repartition(13), "id", "w", 10).collect()
    )
    assert s1 == s2 and len(s1) == 10
    # the 10 heavy items (w=1000, ids 90..99) dominate any u draw by
    # construction unless a light item draws an extreme u; expect the
    # heavy block to be mostly selected
    heavy = [i for i in s1 if i >= 90]
    assert len(heavy) >= 8, s1

    with pytest.raises(ValueError):
        priority_sample(df, "id", "w", 0)

"""Substring-level dedup (functions/dedup.duplicate_span_cover and the
docs_dup_spans / docs_substring_dedup_rewrite query pair): excise every
non-canonical occurrence of a repeated W-token gram, keep the novel
remainder — the Spark-first form of Lee et al. 2022 suffix-array
substring dedup. Handcrafted corpora with known spans, within-doc
repeats, the canonical-keeper rule, and partitioning invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.functions import dedup as dd

W = 4  # small width so fixtures stay readable


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _covered(spark, rows, width=W):
    _, cov = dd.duplicate_span_cover(_docs(spark, rows), width=width)
    return {(r.doc_id, r.p) for r in cov.collect()}


def test_cross_doc_duplicate_span_excised_from_later_doc_only(spark):
    # docs share the 6-token run "a b c d e f" -> three duplicated
    # 4-grams; doc 0 holds every canonical occurrence, so ONLY doc 1's
    # positions are covered: its run spans tokens 2..7.
    rows = [
        (0, "a b c d e f x y"),
        (1, "p q a b c d e f"),
    ]
    assert _covered(spark, rows) == {(1, p) for p in range(2, 8)}


def test_within_doc_repeat_keeps_first_occurrence(spark):
    # the same 4-gram twice in ONE doc: the earlier position is
    # canonical, the later occurrence (tokens 5..8) is excised.
    rows = [(7, "a b c d z a b c d")]
    assert _covered(spark, rows) == {(7, p) for p in range(5, 9)}


def test_short_docs_and_unique_text_are_untouched(spark):
    rows = [
        (0, "a b c"),  # shorter than W: no grams at all
        (1, "u v w x y z"),  # unique text: no repeated gram
    ]
    assert _covered(spark, rows) == set()


def test_rewrite_reassembles_survivors_in_order(spark):
    rows = [
        (0, "a b c d e f x y"),
        (1, "p q a b c d e f"),
    ]
    base, covered = dd.duplicate_span_cover(_docs(spark, rows), width=W)
    tok = base.select("doc_id", F.posexplode("w").alias("p", "token"))
    keep = tok.join(covered, ["doc_id", "p"], "left_anti")
    rebuilt = {
        r.doc_id: r.txt
        for r in keep.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "token"))),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("txt")
        )
        .collect()
    }
    assert rebuilt == {0: "a b c d e f x y", 1: "p q"}


def test_cover_is_partitioning_invariant(spark):
    rows = [(i, f"s{i} t{i} a b c d e f u{i} v{i}") for i in range(20)]
    one = _covered(spark, rows)
    _, cov8 = dd.duplicate_span_cover(
        _docs(spark, rows).repartition(8, "doc_id"), width=W
    )
    assert {(r.doc_id, r.p) for r in cov8.collect()} == one
    # every doc shares the run "a b c d e f" at tokens 2..7; only the
    # doc holding the canonical occurrence (min doc_id = 0) survives
    assert one == {(i, p) for i in range(1, 20) for p in range(2, 8)}


@pytest.mark.parametrize("name", ["docs_dup_spans", "docs_substring_dedup_rewrite"])
def test_query_totals_are_consistent(spark, name):
    import __spark_entry__ as e

    df = e.queries()[name](spark, "/root/testdata/sf0.001").collect()
    assert len(df) > 0
    if name == "docs_dup_spans":
        # spans partition covered tokens: every covered doc has >= 1
        # span and covered >= W per span is NOT guaranteed after
        # overlap-merge, but covered > 0 <-> n_spans > 0 is
        for r in df:
            assert (r.covered_tokens > 0) == (r.n_spans > 0)
            assert 0 <= r.covered_tokens <= r.n_tokens
    else:
        for r in df:
            assert 0 <= r.n_removed <= r.n_tokens

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


def _boilerplate_corpus():
    # the 100 TB hazard fixture: ONE 4-gram ("hot0 hot1 hot2 hot3")
    # repeated across 30% of the corpus (12 of 40 docs, positions
    # 2..5), every other token unique per doc so no other gram
    # duplicates.
    rows = []
    for i in range(40):
        mid = "hot0 hot1 hot2 hot3" if i % 10 < 3 else f"m{i}a m{i}b m{i}c m{i}d"
        rows.append((i, f"u{i}a u{i}b {mid} u{i}c u{i}d"))
    hot_ids = [i for i in range(40) if i % 10 < 3]
    return rows, hot_ids


def test_hot_gram_cap_splits_boilerplate_to_broadcast_path(spark):
    # r8 verdict order #2: a boilerplate gram must NOT funnel every
    # occurrence into one task. The cap splits duplicated grams at
    # hot_min_count: hot grams join by broadcast, cold grams by hashed
    # probe whose per-key group is bounded by the cap.
    rows, hot_ids = _boilerplate_corpus()
    docs = _docs(spark, rows)

    # (a) the boilerplate gram is classified hot, and the cold side's
    # per-key fan-in is bounded by the cap (structural skew bound)
    grams = dd.gram_occurrences(
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .withColumn("n_tok", F.size("w")),
        width=W,
    )
    stats = dd.duplicated_gram_stats(grams)
    hot = stats.where(F.col("cnt") >= 10).collect()
    assert len(hot) == 1 and hot[0].cnt == len(hot_ids)
    assert stats.where(F.col("cnt") < 10).count() == 0

    # (b) semantics are split-invariant: capped result == all-cold
    # result == the handcrafted expectation (canonical = min doc_id)
    _, cov_capped = dd.duplicate_span_cover(docs, width=W, hot_min_count=10)
    got = {(r.doc_id, r.p) for r in cov_capped.collect()}
    _, cov_uncapped = dd.duplicate_span_cover(
        docs, width=W, hot_min_count=10**9
    )
    assert got == {(r.doc_id, r.p) for r in cov_uncapped.collect()}
    assert got == {(i, p) for i in hot_ids[1:] for p in range(2, 6)}

    # (c) plan: the hot branch is a BroadcastHashJoin and the
    # unsplittable per-gram row_number window is GONE
    plan = cov_capped._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_gram_stats_aggregate_combines_map_side(spark):
    # the cap's other half: the per-gram stats reach the reduce task
    # pre-combined (partial count/min per map task), never as raw
    # occurrence fan-in — assert the partial HashAggregate sits below
    # the gram-key exchange.
    rows, _ = _boilerplate_corpus()
    grams = dd.gram_occurrences(
        _docs(spark, rows)
        .select("doc_id", F.split("text", " ").alias("w"))
        .withColumn("n_tok", F.size("w")),
        width=W,
    )
    plan = (
        dd.duplicated_gram_stats(grams)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_count" in plan and "partial_min" in plan


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


def test_hot_broadcast_guard_escalates_threshold_not_results(spark):
    """ADVICE r9: the pigeonhole bound alone does not keep the hot
    side broadcast-small on adversarial corpora, so the split point
    escalates to ceil(total_occurrences / max_hot_grams) when the
    static cap can't prove the bound. The cover set is invariant to
    WHERE the split lands — only the join strategy moves — and the
    escalation announces itself."""
    import warnings as w

    rows = [
        (0, "a b c d e f x y"),
        (1, "p q a b c d e f"),
        (2, "a b c d z z z z"),
    ]
    baseline = _covered(spark, rows)
    # total_occ = 3 docs x 5 grams = 15; max_hot_grams=1 forces
    # effective_min = 15 >= any cnt -> everything stays on the hashed
    # path; max_hot_grams huge with hot_min_count=2 pushes every
    # duplicated gram to the broadcast path. Same answer both ways.
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        _, cov_esc = dd.duplicate_span_cover(
            _docs(spark, rows), width=W, hot_min_count=2, max_hot_grams=1
        )
        assert {(r.doc_id, r.p) for r in cov_esc.collect()} == baseline
    assert any("escalating the hot threshold" in str(c.message) for c in caught)
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        _, cov_bc = dd.duplicate_span_cover(
            _docs(spark, rows), width=W, hot_min_count=2
        )
        assert {(r.doc_id, r.p) for r in cov_bc.collect()} == baseline
    # 15 occurrences prove the bound: no escalation warning
    assert not any(
        "escalating the hot threshold" in str(c.message) for c in caught
    )


def test_hot_gram_parameter_validation(spark):
    """max_hot_grams < 1 and hot_min_count < 2 are contract errors,
    not ZeroDivisionError / silent no-bound configurations."""
    import pytest

    from meteo_etl_spark.functions.dedup import duplicate_span_cover

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_hot_grams"):
        duplicate_span_cover(docs, max_hot_grams=0)
    with pytest.raises(ValueError, match="hot_min_count"):
        duplicate_span_cover(docs, hot_min_count=1)


def test_precomputed_total_occurrences_keeps_call_lazy_and_exact(spark):
    """r10 ADVICE: duplicate_span_cover's broadcast-safety guard runs
    an eager 1-row aggregate at call time; callers that already know
    the corpus's gram-occurrence total pass it and the call stays
    fully lazy. Results must be identical either way."""
    from meteo_etl_spark.functions import dedup as dd

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l"),
            (2, "z y a b c d e f g h i x"),
            (3, "q r s t u v w q2 r2 s2 t2 u2"),
        ],
        "doc_id bigint, text string",
    )
    # exact total: sum over docs of max(n_tok - width + 1, 0)
    total = sum(max(len(t.split()) - dd.SUBSTR_W + 1, 0) for _, t in [
        (1, "a b c d e f g h i j k l"),
        (2, "z y a b c d e f g h i x"),
        (3, "q r s t u v w q2 r2 s2 t2 u2"),
    ])

    jobs_before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    base, covered = dd.duplicate_span_cover(docs, total_occurrences=total)
    jobs_after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    assert len(jobs_after) == len(jobs_before), "call must not run a job"

    _, covered_eager = dd.duplicate_span_cover(docs)
    got = sorted((r["doc_id"], r["p"]) for r in covered.collect())
    want = sorted((r["doc_id"], r["p"]) for r in covered_eager.collect())
    assert got == want and got, got


def test_nonpositive_precomputed_total_is_rejected(spark):
    """Self-review r11: total_occurrences <= 0 would silently disable
    the max_hot_grams broadcast bound (effective threshold degenerates
    to hot_min_count) — reject it like the sibling parameters."""
    import pytest

    from meteo_etl_spark.functions import dedup as dd

    docs = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="total_occurrences must be >= 1"):
        dd.duplicate_span_cover(docs, total_occurrences=0)
    with pytest.raises(ValueError, match="total_occurrences must be >= 1"):
        dd.excise_duplicate_spans(docs, total_occurrences=-5)

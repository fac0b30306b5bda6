"""Property tests (hypothesis) for the round-12 second-wave kernels:
Viterbi optimality by exhaustive enumeration, sign-bit packing
round-trips, unigram cost arithmetic, and SQ8 reconstruction bounds.
Pure-Python twins are exercised per-example; the Spark-side parity of
each twin is pinned separately on real data (tests/test_llm_ops.py,
test_projections.py, test_unigram.py)."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from meteo_etl_spark.functions import unigram as ug
from meteo_etl_spark.functions.similarity import _sign_words_py, SIGN_WORD_BITS


def _all_segmentations(word: str, pieces: set[str], max_len: int):
    if not word:
        yield []
        return
    for l in range(1, min(max_len, len(word)) + 1):
        head = word[:l]
        if head in pieces:
            for rest in _all_segmentations(word[l:], pieces, max_len):
                yield [head] + rest


@settings(max_examples=200, deadline=None)
@given(
    word=st.text(alphabet="abc", min_size=1, max_size=6),
    extra=st.lists(
        st.text(alphabet="abc", min_size=2, max_size=3), max_size=4
    ),
    costs=st.data(),
)
def test_viterbi_is_optimal_and_tie_breaks_longest_last(word, extra, costs):
    """Viterbi's cost equals the exhaustive minimum over ALL
    segmentations, the concatenation reproduces the word, and on
    cost ties the chosen path has the longest last piece among the
    minimal ones (the pinned deterministic rule)."""
    vocab = {c for c in "abc"} | {p for p in extra if p}
    cost = {
        p: costs.draw(st.integers(min_value=1, max_value=50), label=p)
        for p in vocab
    }
    seg = ug.viterbi_segment(word, cost, max_len=3)
    assert "".join(seg) == word
    got_cost = sum(cost[p] for p in seg)
    all_segs = list(_all_segmentations(word, vocab, 3))
    assert all_segs, "alphabet is in vocab, so at least one exists"
    best = min(sum(cost[p] for p in s) for s in all_segs)
    assert got_cost == best
    minimal = [s for s in all_segs if sum(cost[p] for p in s) == best]
    assert len(seg[-1]) == max(len(s[-1]) for s in minimal)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-10, max_value=10, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=64,
    )
)
def test_sign_words_pack_exactly(vec):
    """Every bit of the packed words equals the per-dim sign rule
    (x > 0), every word stays a positive signed-64 value, and the
    word count is ceil(dim/32)."""
    words = _sign_words_py(vec, dim=len(vec))
    assert len(words) == (len(vec) + SIGN_WORD_BITS - 1) // SIGN_WORD_BITS
    for w in words:
        assert 0 <= w < (1 << SIGN_WORD_BITS)
    for i, x in enumerate(vec):
        bit = (words[i // SIGN_WORD_BITS] >> (i % SIGN_WORD_BITS)) & 1
        assert bit == (1 if x > 0 else 0)


@settings(max_examples=100, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=3),
        st.integers(min_value=1, max_value=10_000),
        min_size=1,
        max_size=20,
    )
)
def test_piece_costs_formula_and_ordering(counts):
    """cost = round(-ln(freq/total)*1e6) exactly, and higher frequency
    never costs more."""
    costs = ug.piece_costs(counts)
    total = sum(counts.values())
    for p, c in counts.items():
        assert costs[p] == int(round(-math.log(c / total) * ug.COST_SCALE))
    by_freq = sorted(counts.items(), key=lambda pc: pc[1])
    for (p1, f1), (p2, f2) in zip(by_freq, by_freq[1:]):
        if f1 < f2:
            assert costs[p1] >= costs[p2]


def test_sq8_reconstruction_bound_on_hypothesis_corpus(spark):
    """For a hypothesis-style adversarial corpus (extremes, tiny
    ranges, negatives, a constant dim), every in-range reconstruction
    sits within half a quantization step of the input and every
    out-of-contract value clamps into [lo, hi]."""
    from pyspark.sql import functions as F

    from meteo_etl_spark.functions import similarity as sim

    rows = [
        (0, [0.0, -5.0, 1e-7, 3.25, 100.0, -100.0, 0.5, 2.0]),
        (1, [1.0, 5.0, -1e-7, 3.25, -100.0, 100.0, 0.4999, -2.0]),
        (2, [0.25, 0.0, 3e-8, 3.25, 0.0, 0.0, 0.5001, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    lo, hi = sim.sq8_train_ranges(emb, dim=8)
    got = emb.select(
        "vec_id",
        F.col("embedding").alias("v"),
        sim.sq8_dequantized(F.col("embedding"), lo, hi, dim=8).alias("dq"),
    ).collect()
    for r in got:
        for i, (x, y) in enumerate(zip(r["v"], r["dq"])):
            step = (hi[i] - lo[i]) / 255.0
            assert lo[i] - 1e-12 <= y <= hi[i] + 1e-12
            assert abs(x - y) <= step / 2 + 1e-9, (i, x, y, step)
    # out-of-contract batch clamps
    big = spark.createDataFrame(
        [(9, [1e6] * 8)], "vec_id long, embedding array<double>"
    )
    clamped = big.select(
        sim.sq8_dequantized(F.col("embedding"), lo, hi, dim=8).alias("dq")
    ).first()["dq"]
    for i, y in enumerate(clamped):
        assert abs(y - hi[i]) <= 1e-12


@settings(max_examples=300, deadline=None)
@given(
    weights=st.lists(
        st.integers(min_value=1, max_value=10**9), min_size=1, max_size=40
    ),
    frac=st.integers(min_value=1, max_value=1000),
)
def test_waterfill_closed_form_invariants(weights, frac):
    """The water-fill pivot math (sampling.waterfill_allocation's
    closed form, mirrored by tests/test_llm_ops._ref_waterfill and the
    docs_budget_waterfill oracle) must satisfy, for ANY weight set and
    budget fraction: 0 <= alloc_i <= w_i; every capped key shares ONE
    level; every uncapped key ships whole and sits at or under it; and
    the total allocation equals min(budget, total) up to fp rounding
    of the single division."""
    from tests.test_llm_ops import _ref_waterfill

    pairs = [(f"k{i:03d}", w) for i, w in enumerate(weights)]
    out, budget = _ref_waterfill(pairs, frac)
    total = sum(weights)
    by_key = dict(pairs)
    levels = {a for a, c in out.values() if c}
    assert len(levels) <= 1
    for k, (alloc, capped) in out.items():
        w = by_key[k]
        assert -1e-9 <= alloc <= w + 1e-9
        if capped:
            assert alloc == next(iter(levels))
        else:
            assert alloc == float(w)
            if levels:
                assert w <= next(iter(levels)) + 1e-9
    got = sum(a for a, _ in out.values())
    want = min(budget, total)
    # the only fp op is ONE correctly-rounded division replicated over
    # the capped keys: total error <= ~budget * 2^-52 * n_capped —
    # bound it by a relative tolerance well above that, far below any
    # allocation-sized discrepancy
    assert math.isclose(got, want, rel_tol=1e-11, abs_tol=1e-6)

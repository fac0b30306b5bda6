"""BPE trainer/encoder vs a pure-Python reference implementation.

The reference trainer below is the textbook Sennrich et al. algorithm
(word histogram -> repeatedly merge the most frequent adjacent pair,
ties broken lexicographically) — the same total order the Spark trainer
declares, so merge tables must match EXACTLY, element for element."""

from __future__ import annotations

import collections

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from meteo_etl_spark.functions import bpe


# ---------------------------------------------------------------------------
# pure-Python reference
# ---------------------------------------------------------------------------


def _ref_apply(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return tuple(out)


def _ref_train(words: list[str], n_merges: int) -> list[tuple[str, str, str, int]]:
    hist = collections.Counter(words)
    vocab = {tuple(w): f for w, f in hist.items()}
    merges = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # count DESC, then lexicographic (a, b) — the declared order
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, a + b, cnt))
        # rebuild with summed freqs (two words can collide post-merge)
        vocab = _sum_freqs(
            (_ref_apply(syms, a, b), f) for syms, f in vocab.items()
        )
    return merges


def _sum_freqs(items):
    out: dict = collections.defaultdict(int)
    for k, v in items:
        out[k] += v
    return out


def _ref_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    toks: list[str] = []
    for w in text.split(" "):
        if not w:
            continue
        syms = tuple(w)
        for a, b in merges:
            syms = _ref_apply(syms, a, b)
        toks.extend(syms)
    return toks


# ---------------------------------------------------------------------------
# unit semantics
# ---------------------------------------------------------------------------


def test_ref_apply_overlap_is_leftmost_first():
    assert _ref_apply(tuple("aaa"), "a", "a") == ("aa", "a")
    assert _ref_apply(tuple("aaaa"), "a", "a") == ("aa", "aa")
    # a freshly merged token never re-triggers the same merge
    assert _ref_apply(("ab", "b"), "a", "b") == ("ab", "b")


def test_apply_merge_matches_reference(spark):
    cases = ["aaa", "aaaa", "abab", "banana", "a", "", "bb", "aab"]
    df = spark.createDataFrame([(c,) for c in cases], ["w"])
    got = (
        df.select("w", bpe.apply_merge(bpe.chars("w"), "a", "a").alias("m"))
        .orderBy("w")
        .collect()
    )
    for row in got:
        assert tuple(row["m"]) == _ref_apply(tuple(row["w"]), "a", "a"), row["w"]


def test_train_matches_reference_on_fixed_corpus(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "wider wider new new",
    ]
    words = [w for t in texts for w in t.split(" ") if w]
    expect = _ref_train(words, 8)
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [
        (r["a"], r["b"], r["merged"], r["pair_count"])
        for r in bpe.bpe_train(df, 8).orderBy("rank").collect()
    ]
    assert got == expect


def test_train_early_stop_and_min_count(spark):
    df = spark.createDataFrame([("ab",)], ["text"])
    merges = bpe.bpe_train(df, 10).collect()
    assert len(merges) == 1  # after (a,b) -> ab there are no pairs left
    assert merges[0]["merged"] == "ab"
    none = bpe.bpe_train(df, 10, min_pair_count=2).collect()
    assert none == []


def test_encode_matches_reference(spark):
    texts = ["low lower lowest", "new newest news", ""]
    words = [w for t in texts for w in t.split(" ") if w]
    merges = [(m[0], m[1]) for m in _ref_train(words, 6)]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {
        r["text"]: list(r["bpe_tokens"])
        for r in bpe.bpe_encode(df, merges).collect()
    }
    for t in texts:
        assert got[t] == _ref_encode(t, merges), t


def test_train_is_partitioning_invariant(spark):
    texts = [f"tok{i % 7} tok{i % 3} shared shared" for i in range(40)]
    df1 = spark.createDataFrame([(t,) for t in texts], ["text"]).repartition(1)
    df8 = spark.createDataFrame([(t,) for t in texts], ["text"]).repartition(8)
    m1 = [tuple(r) for r in bpe.bpe_train(df1, 5).orderBy("rank").collect()]
    m8 = [tuple(r) for r in bpe.bpe_train(df8, 5).orderBy("rank").collect()]
    assert m1 == m8


@pytest.mark.parametrize("n", [1, 3])
@given(
    texts=st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=12), min_size=1, max_size=8
    )
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_train_property_vs_reference(spark, n, texts):
    words = [w for t in texts for w in t.split(" ") if w]
    expect = _ref_train(words, n)
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [
        (r["a"], r["b"], r["merged"], r["pair_count"])
        for r in bpe.bpe_train(df, n).orderBy("rank").collect()
    ]
    assert got == expect


def test_word_histogram_counts(spark):
    df = spark.createDataFrame([("a b a",), ("b  b",)], ["text"])
    got = {
        r["word"]: r["freq"] for r in bpe.word_histogram(df).collect()
    }
    assert got == {"a": 2, "b": 3}


@given(
    texts=st.lists(
        st.text(alphabet="abcd ", min_size=0, max_size=14), min_size=1, max_size=6
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_encode_property_vs_reference(spark, texts):
    """Encoding with corpus-trained merges matches the reference
    encoder on arbitrary corpora (incl. empty docs and odd spacing)."""
    words = [w for t in texts for w in t.split(" ") if w]
    merges = [(m[0], m[1]) for m in _ref_train(words, 4)]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [
        (r["text"], list(r["bpe_tokens"]))
        for r in bpe.bpe_encode(df, merges).collect()
    ]
    for text, toks in got:
        assert toks == _ref_encode(text, merges), (text, merges)


# --- the docs_bpe_merges_k4 oracle's merge-apply encoding ------------
# The SQL twin applies a merge as ONE replace() over a chr(31)-double-
# separated symbol string. This property pins the encoding's claim:
# replace on the encoded form == the greedy fold, for ANY symbol list
# and pair — including chained ([a,b,a,b]) and overlapping ([a,a,a])
# occurrences and multi-char (already-merged) symbols.

_S = "\x1f"


def _encode(syms) -> str:
    return _S * 2 + (_S * 2).join(syms) + _S * 2 if syms else _S * 2


def _decode(s: str) -> tuple[str, ...]:
    return tuple(x for x in s.split(_S * 2) if x != "")


def _replace_apply(syms, a: str, b: str):
    pat = _S + a + _S * 2 + b + _S
    rep = _S + a + b + _S
    return _decode(_encode(list(syms)).replace(pat, rep))


_sym = st.text(alphabet="ab☃x", min_size=1, max_size=3)


@given(
    syms=st.lists(_sym, min_size=0, max_size=12),
    a=_sym,
    b=_sym,
)
@settings(max_examples=300, deadline=None)
def test_separator_replace_equals_greedy_fold(syms, a, b):
    assert _replace_apply(tuple(syms), a, b) == _ref_apply(tuple(syms), a, b)


def test_separator_replace_matches_duckdb_replace():
    """And DuckDB's replace() agrees with Python str.replace on the
    encoded form (both leftmost, non-overlapping, no rescan) — the
    exact expression docs_bpe_merges_k4's oracle runs."""
    import duckdb

    cases = [
        (("a", "b", "a", "b"), "a", "b"),
        (("a", "a", "a"), "a", "a"),
        (("a", "a", "b"), "a", "b"),
        (("x", "a", "b", "b"), "a", "b"),
        (("ab", "b", "ab"), "ab", "b"),
    ]
    con = duckdb.connect()
    for syms, a, b in cases:
        enc = _encode(list(syms))
        got = con.execute(
            "SELECT replace(?, chr(31) || ? || repeat(chr(31), 2) || ? "
            "|| chr(31), chr(31) || ? || chr(31))",
            [enc, a, b, a + b],
        ).fetchone()[0]
        assert _decode(got) == _ref_apply(syms, a, b), (syms, a, b)

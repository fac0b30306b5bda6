"""Unigram-LM tokenizer trainer: hand-computed Viterbi cases, exact
equality against an independently written pure-Python trainer, and
partitioning invariance (the docs_bpe_merges certification model)."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from meteo_etl_spark.functions import unigram as ug
from meteo_etl_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL


def test_viterbi_hand_cases():
    # cheaper single piece wins
    assert ug.viterbi_segment("ab", {"a": 10, "b": 10, "ab": 15}) == ["ab"]
    # exact tie: prefer the LONGER last piece
    assert ug.viterbi_segment("ab", {"a": 10, "b": 10, "ab": 20}) == ["ab"]
    # tie resolved at an interior boundary: a+ab (15) vs a+a+b (15)
    # -> longer last piece
    assert ug.viterbi_segment("aab", {"a": 5, "b": 5, "ab": 10}) == ["a", "ab"]
    # missing multi-char pieces fall back to the alphabet
    assert ug.viterbi_segment("abc", {"a": 1, "b": 1, "c": 1}) == [
        "a",
        "b",
        "c",
    ]
    # max_len bounds candidate pieces
    assert ug.viterbi_segment(
        "aaaa", {"a": 1, "aaaa": 1}, max_len=2
    ) == ["a", "a", "a", "a"]


def _reference_train(texts, vocab_size, seed_size, em_iters, max_len):
    """Independent single-process trainer following the documented
    algorithm: seed substring counts, hard-EM with integer micro-nat
    costs, alphabet-preserving prune. Written with plain dict/Counter
    loops — no Spark, no shared code besides the Viterbi kernel
    (which has its own hand-computed pins above)."""
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[w] += 1
    seed = Counter()
    for w, n in words.items():
        for length in range(1, max_len + 1):
            for i in range(len(w) - length + 1):
                seed[w[i : i + length]] += n
    chars = {p: c for p, c in seed.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    counts = {**chars, **dict(multi)}
    alphabet = set(chars)

    def costs_of(cnts):
        total = sum(cnts.values())
        return {
            p: int(round(-math.log(c / total) * ug.COST_SCALE))
            for p, c in cnts.items()
        }

    for it in range(em_iters):
        costs = costs_of(counts)
        new = Counter()
        for w, n in words.items():
            for piece in ug.viterbi_segment(w, costs, max_len):
                new[piece] += n
        counts = dict(new)
        for ch in alphabet:
            counts.setdefault(ch, 1)
        if it == em_iters - 1:
            chars = {p: c for p, c in counts.items() if len(p) == 1}
            multi = sorted(
                ((p, c) for p, c in counts.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0]),
            )[: max(0, vocab_size - len(chars))]
            counts = {**chars, **dict(multi)}
    # post-prune re-segmentation (SentencePiece final-EM rule): freq
    # under the pruned vocab; unused pruned-in pieces floor at 1
    vocab = set(counts)
    costs = costs_of(counts)
    new = Counter()
    for w, n in words.items():
        for piece in ug.viterbi_segment(w, costs, max_len):
            new[piece] += n
    counts = dict(new)
    for p in vocab:
        counts.setdefault(p, 1)
    costs = costs_of(counts)
    return sorted(
        ((p, c, costs[p]) for p, c in counts.items()),
        key=lambda r: (-r[1], r[0]),
    )


def test_trainer_matches_reference_exactly_and_is_partition_invariant(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    want = _reference_train(
        texts,
        ug.VOCAB_SIZE,
        ug.SEED_SIZE,
        ug.EM_ITERS,
        ug.PIECE_MAX_LEN,
    )
    got = [
        (r["piece"], r["freq"], r["cost_u"])
        for r in ug.train_unigram_lm(docs).collect()
    ]
    assert got == want
    got7 = [
        (r["piece"], r["freq"], r["cost_u"])
        for r in ug.train_unigram_lm(docs.repartition(7)).collect()
    ]
    assert got7 == want


def test_encode_stats_reconcile_with_model(spark):
    """Per-doc piece counts and total costs must equal a driver-side
    re-segmentation under the same model; multi-word docs always have
    n_pieces >= n_words (every word is >= 1 piece)."""
    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    model = ug.train_unigram_lm(docs)
    costs = {r["piece"]: r["cost_u"] for r in model.collect()}
    out = {r["id"]: r for r in ug.unigram_encode(docs, model).collect()}
    for r in docs.select("doc_id", "text").collect():
        words = [w for w in r["text"].split(" ") if w]
        segs = [ug.viterbi_segment(w, costs) for w in words]
        row = out[r["doc_id"]]
        assert row["n_words"] == len(words)
        assert row["n_pieces"] == sum(len(s) for s in segs)
        assert row["total_cost_u"] == sum(costs[p] for s in segs for p in s)
        assert row["n_pieces"] >= row["n_words"]

"""Distributed unigram-LM tokenizer training (Kudo 2018 — the
SentencePiece algorithm; the other half of the real-world tokenizer
family beside ``functions/bpe.py``'s BPE): start from a large seed
vocabulary of candidate pieces, alternate Viterbi segmentation of the
word histogram against current piece costs with re-estimation of
piece frequencies from those segmentations (hard-EM), then prune to
the target vocabulary.

Architecture (the bpe.py two-level shape):

1. **One corpus scan** builds the word histogram — distinct words
   with frequencies (Heaps' law: orders of magnitude smaller than the
   corpus). Everything after operates on this table; the corpus is
   never rescanned.
2. **Seed**: all substrings up to ``PIECE_MAX_LEN`` of every distinct
   word, frequency-weighted (one explode + map-combined aggregate over
   the histogram), top ``seed_size`` by (weight DESC, piece ASC — a
   total order, partitioning-invariant) plus EVERY single character
   (the fallback alphabet that keeps all words segmentable).
3. **EM iteration**: piece costs are INTEGER micro-nats
   (round(-ln(freq/total) * 1e6)) computed driver-side from the
   vocab-sized count table (the bpe_train argmax-collect discipline);
   the cost dict broadcasts into an Arrow-batched ``mapInPandas``
   Viterbi over the word histogram (per-row DP — the genuinely
   non-expression kernel, Python only per distinct word, never per
   corpus token); re-estimated counts come back through one
   map-combined aggregate. Integer costs make every Viterbi decision
   exact — no FP tie ambiguity anywhere, so the result is bit-stable
   under any partitioning.
4. **Prune**: after the last iteration keep the top ``vocab_size``
   pieces by (count DESC, piece ASC), always retaining the alphabet.

Viterbi tie-break (pinned): equal path cost prefers the LONGER last
piece. Unreachable words cannot exist (alphabet always in vocab).

Reference parity: none — tokenizer surface is mandated extension
(SURVEY.md §2.4). Correctness is pinned by tests/test_unigram.py
against an independently written pure-Python trainer (exact equality
on the full model), plus hand-computed Viterbi cases and a
partitioning-invariance run; the registered ``docs_unigram_vocab``
query is rows-only by design (iterative, like docs_bpe_merges).
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meteo_etl_spark.functions.bpe import word_histogram

PIECE_MAX_LEN = 6
SEED_SIZE = 512
EM_ITERS = 2
VOCAB_SIZE = 128

#: integer cost scale: micro-nats.
COST_SCALE = 1_000_000

MODEL_SCHEMA = T.StructType(
    [
        T.StructField("piece", T.StringType(), False),
        T.StructField("freq", T.LongType(), False),
        T.StructField("cost_u", T.LongType(), False),
    ]
)

_SEG_SCHEMA = T.StructType(
    [
        T.StructField("piece", T.StringType(), False),
        T.StructField("cnt", T.LongType(), False),
    ]
)


def piece_costs(counts: dict[str, int]) -> dict[str, int]:
    """freq table -> integer micro-nat costs: round(-ln(freq/total)
    * 1e6). Driver-side Python on a vocab-sized dict — one place, so
    the engine and any reference implementation share the arithmetic
    by construction."""
    total = sum(counts.values())
    return {
        p: int(round(-math.log(c / total) * COST_SCALE))
        for p, c in counts.items()
    }


def viterbi_segment(
    word: str, costs: dict[str, int], max_len: int = PIECE_MAX_LEN
) -> list[str]:
    """Min-cost segmentation of ``word`` under integer piece costs.
    DP over end positions; candidate pieces are the last 1..max_len
    characters. Tie-break: equal cost prefers the LONGER last piece
    (deterministic, and biases toward fewer pieces). Assumes every
    single character is in ``costs`` (the trainer guarantees it)."""
    n = len(word)
    inf = float("inf")
    best: list[float] = [0.0] + [inf] * n
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        for l in range(1, min(max_len, j) + 1):
            c = costs.get(word[j - l : j])
            if c is None:
                continue
            cand = best[j - l] + c
            if cand < best[j] or (cand == best[j] and l > back[j]):
                best[j] = cand
                back[j] = l
    if best[n] == inf:  # pragma: no cover - alphabet guarantee
        raise ValueError(f"word {word!r} not segmentable under the vocab")
    out: list[str] = []
    j = n
    while j > 0:
        l = back[j]
        out.append(word[j - l : j])
        j -= l
    out.reverse()
    return out


def _seed_counts(words: DataFrame, seed_size: int, max_len: int) -> DataFrame:
    """(piece, cnt) seed table: every substring of length 1..max_len
    of every distinct word, weighted by word frequency; top
    ``seed_size`` multi-char pieces by (cnt DESC, piece ASC) UNION all
    single characters. One explode over the histogram."""
    subs = F.expr(
        f"""
        flatten(transform(sequence(1, {max_len}),
          l -> CASE WHEN l <= length(word) THEN
                 transform(sequence(1, length(word) - l + 1),
                           i -> substring(word, i, l))
               ELSE array() END))
        """
    )
    exploded = words.select(
        F.col("cnt"), F.explode(subs).alias("piece")
    )
    counts = exploded.groupBy("piece").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    chars = counts.where(F.length("piece") == 1)
    multi = (
        counts.where(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), "piece")
        .limit(seed_size)
    )
    return chars.unionByName(multi)


def _resegment_counts(
    words: DataFrame, costs: dict[str, int], max_len: int
) -> DataFrame:
    """(piece, cnt) from Viterbi-segmenting the word histogram under
    broadcast ``costs`` — Arrow-batched mapInPandas over DISTINCT
    words (Python per word type, never per corpus token), then one
    map-combined aggregate."""
    spark = words.sparkSession
    bc = spark.sparkContext.broadcast(costs)

    def seg(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        c = bc.value
        for batch in batches:
            out_p: list[str] = []
            out_n: list[int] = []
            for word, cnt in zip(batch["word"], batch["cnt"]):
                for piece in viterbi_segment(str(word), c, max_len):
                    out_p.append(piece)
                    out_n.append(int(cnt))
            yield pd.DataFrame({"piece": out_p, "cnt": out_n})

    return (
        words.mapInPandas(seg, _SEG_SCHEMA)
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def train_unigram_lm(
    docs: DataFrame,
    *,
    text_col: str = "text",
    vocab_size: int = VOCAB_SIZE,
    seed_size: int = SEED_SIZE,
    em_iters: int = EM_ITERS,
    max_len: int = PIECE_MAX_LEN,
) -> DataFrame:
    """Train and return the unigram-LM model as a DataFrame
    (piece, freq, cost_u) ordered by (freq DESC, piece) — freq is the
    piece's count in the final segmentation of the word histogram,
    cost_u its integer micro-nat cost under the final counts. The
    alphabet is always included; ``vocab_size`` bounds the rest."""
    spark = docs.sparkSession
    words = (
        word_histogram(docs, text_col=text_col)
        .select("word", F.col("freq").cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    counts = {
        r["piece"]: int(r["cnt"])
        for r in _seed_counts(words, seed_size, max_len).collect()
    }
    # the corpus alphabet (every observed character — present in the
    # seed by construction): kept in the model at a FLOOR count of 1
    # even when segmentation stops using a character, so any future
    # word over this alphabet stays segmentable (the SentencePiece
    # required-chars rule; without it unigram_encode would raise on
    # unseen words whose characters the EM "optimized away")
    alphabet = {p for p in counts if len(p) == 1}
    for it in range(em_iters):
        costs = piece_costs(counts)
        counts = {
            r["piece"]: int(r["cnt"])
            for r in _resegment_counts(words, costs, max_len).collect()
        }
        for ch in alphabet:
            counts.setdefault(ch, 1)
        # multi-char pieces the segmentation stopped using drop out
        if it == em_iters - 1:
            chars = {p: c for p, c in counts.items() if len(p) == 1}
            multi = sorted(
                ((p, c) for p, c in counts.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0]),
            )[: max(0, vocab_size - len(chars))]
            counts = {**chars, **dict(multi)}
    # One post-prune re-segmentation pass (the SentencePiece rule of
    # re-running EM after pruning): freq must describe segmentations
    # under the PRUNED vocab, not the pre-prune one in which
    # since-pruned pieces absorbed mass, so that freq and cost_u
    # describe the same vocabulary. The piece set stays fixed —
    # pruned-in pieces the final segmentation stops using keep a floor
    # count of 1 (the alphabet rule generalized) so the model stays
    # vocab-stable and every returned cost is defined.
    vocab = set(counts)
    costs = piece_costs(counts)
    counts = {
        r["piece"]: int(r["cnt"])
        for r in _resegment_counts(words, costs, max_len).collect()
    }
    for p in vocab:
        counts.setdefault(p, 1)
    costs = piece_costs(counts)
    rows = sorted(
        ((p, c, costs[p]) for p, c in counts.items()),
        key=lambda r: (-r[1], r[0]),
    )
    return spark.createDataFrame(rows, MODEL_SCHEMA)


def unigram_encode(
    docs: DataFrame,
    model: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = PIECE_MAX_LEN,
) -> DataFrame:
    """Tokenize documents with a trained model: (id, n_words,
    n_pieces, total_cost_u) per document — the compression/perplexity
    summary a tokenizer evaluation reads. The model collects to a
    vocab-sized dict and broadcasts; segmentation is per-document
    mapInPandas (the corpus-side pass, one scan)."""
    costs = {
        r["piece"]: int(r["cost_u"]) for r in model.collect()
    }
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(costs)
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("n_words", T.LongType(), False),
            T.StructField("n_pieces", T.LongType(), False),
            T.StructField("total_cost_u", T.LongType(), False),
        ]
    )

    def enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        c = bc.value
        for batch in batches:
            ids, nw, np_, tc = [], [], [], []
            for doc_id, text in zip(batch["id"], batch["text"]):
                words = [w for w in str(text).split(" ") if w]
                pieces = 0
                cost = 0
                for w in words:
                    seg = viterbi_segment(w, c, max_len)
                    pieces += len(seg)
                    cost += sum(c[p] for p in seg)
                ids.append(int(doc_id))
                nw.append(len(words))
                np_.append(pieces)
                tc.append(cost)
            yield pd.DataFrame(
                {"id": ids, "n_words": nw, "n_pieces": np_, "total_cost_u": tc}
            )

    return docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).mapInPandas(enc, out_schema)

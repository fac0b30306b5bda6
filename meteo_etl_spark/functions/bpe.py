"""Distributed BPE tokenizer training (Sennrich et al. 2016; the
GPT-2/HF-tokenizers recipe) — the tokenizer-prep step of a training-data
pipeline, run where the data already lives instead of funnelling the
corpus through a single-node trainer.

Architecture (the same two-level shape real BPE trainers use):

1. **One corpus scan** builds the word histogram — distinct words with
   frequencies. Everything after operates on this vocabulary table,
   which is orders of magnitude smaller than the corpus (Heaps' law),
   so 100 TB of text funnels into one map-combined aggregate and the
   iterations never touch the corpus again.
2. **Per merge step**: count adjacent symbol pairs weighted by word
   frequency (map-combined aggregate over the vocab table), pick the
   most frequent pair (count DESC, then lexicographic (a, b) — a total
   order, so the winner is partitioning-invariant), and rewrite every
   word's symbol array with the merge applied. The winning pair is ONE
   driver-side row (a scalar decision, the same discipline as the
   k-means centroid collect in functions/clustering.py); the rewrite is
   a pure built-in ``aggregate`` fold — no Python UDF anywhere.

Greedy merge semantics match the reference BPE exactly: scanning left
to right, a symbol merges with the PREVIOUS output symbol only when
that previous symbol is literally ``a`` — a freshly merged ``ab`` never
re-triggers the same (a, b) merge, and overlapping occurrences resolve
leftmost-first (``aaa`` under (a, a) -> [aa, a]).

Vocabulary lineage is truncated with ``localCheckpoint`` every
iteration (the graph-frontier discipline of operators/graph.py), so a
500-merge training run does not build a 500-deep plan.

Reference parity: none — the reference engine has no tokenizer
surface; this is part of the mandated training-pipeline extension
(SURVEY.md §2.4). Correctness is pinned by tests/test_bpe.py against a
pure-Python reference trainer, including property-based corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: merge-table schema returned by :func:`bpe_train`.
MERGES_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("a", T.StringType(), False),
        T.StructField("b", T.StringType(), False),
        T.StructField("merged", T.StringType(), False),
        T.StructField("pair_count", T.LongType(), False),
    ]
)


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace word histogram — the ONE corpus-wide scan.

    Returns ``(word, freq)``; the aggregate combines map-side, so the
    shuffle carries one row per distinct word per partition, never the
    corpus."""
    return (
        docs.select(
            F.explode(
                F.filter(F.split(text_col, " "), lambda x: F.length(x) > 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def chars(col: Column | str) -> Column:
    """String -> array of single-character symbols (initial BPE state)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, ""), lambda x: x != F.lit(""))


def pair_counts(vocab: DataFrame, syms_col: str = "syms") -> DataFrame:
    """Adjacent-pair counts over a symbol-array vocabulary, weighted by
    word frequency: ``(a, b, cnt)``.

    The pairing is ONE generate over an index sequence (narrow), and
    the count combines map-side — per merge step this is the only
    shuffle, carrying one row per distinct pair per partition."""
    pairs = vocab.filter(F.size(syms_col) >= 2).select(
        "freq",
        F.explode(
            F.expr(
                f"transform(sequence(0, size({syms_col}) - 2), "
                f"i -> struct({syms_col}[i] AS a, {syms_col}[i + 1] AS b))"
            )
        ).alias("p"),
    )
    return (
        pairs.select("freq", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def apply_merge(syms: Column, a: str, b: str) -> Column:
    """Rewrite a symbol array with merge ``(a, b) -> a||b`` applied
    greedily left-to-right — a pure built-in fold, no UDF.

    The fold appends each symbol unless the previous OUTPUT symbol is
    exactly ``a`` and the current one is ``b``, in which case the pair
    collapses in place; because the collapsed symbol is ``a||b`` (not
    ``a``), it cannot re-trigger the same merge, which is precisely the
    reference algorithm's non-overlapping leftmost-first semantics."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    *,
    text_col: str = "text",
    min_pair_count: int = 1,
) -> DataFrame:
    """Train ``n_merges`` BPE merges over a corpus; returns the merge
    table (MERGES_SCHEMA) ordered by rank.

    Stops early when no pair reaches ``min_pair_count``. The returned
    DataFrame is driver-built (k rows — the merge table IS the model
    and is vocabulary-sized by construction)."""
    if n_merges < 1:
        raise ValueError("bpe_train needs n_merges >= 1")
    spark = docs.sparkSession
    vocab = (
        word_histogram(docs, text_col)
        .select(chars("word").alias("syms"), "freq")
        .localCheckpoint()
    )
    records: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        records.append((rank, a, b, a + b, cnt))
        # Materialize the rewrite each step: bounded lineage, and the
        # next pair count runs over a flat cached vocab, not a
        # rank-deep expression chain. Rebinding drops the Python ref to
        # the superseded checkpoint; its blocks are released by the
        # ContextCleaner once the JVM side is collected (the same
        # retention behavior as the graph frontiers in operators/
        # graph.py) — storage holds O(1) LIVE vocab copies plus
        # whatever the cleaner hasn't gotten to yet, each vocab-sized,
        # never corpus-sized.
        vocab = vocab.select(
            apply_merge(F.col("syms"), a, b).alias("syms"), "freq"
        ).localCheckpoint()
    return spark.createDataFrame(records, MERGES_SCHEMA)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a trained merge list to a corpus: per whitespace word,
    split to characters and fold each merge in rank order; tokens are
    re-concatenated across words in document order.

    Expression depth grows with ``len(merges)`` (each merge is one
    fold), which is the right trade below a few hundred merges — the
    corpus is scanned ONCE with zero shuffles. For multi-thousand-merge
    production vocabularies, encode with a broadcast merge table inside
    an Arrow-batched ``mapInPandas`` instead (same output contract)."""
    word_syms = F.transform(
        F.filter(F.split(text_col, " "), lambda x: F.length(x) > 0),
        lambda w: F.filter(F.split(w, ""), lambda x: x != F.lit("")),
    )
    col = word_syms
    for a, b in merges:
        col = _transform_merge(col, a, b)
    return df.withColumn(out_col, F.flatten(col))


def _transform_merge(words_col: Column, a: str, b: str) -> Column:
    """apply_merge mapped over an array-of-symbol-arrays column."""
    return F.transform(words_col, lambda syms: apply_merge(syms, a, b))

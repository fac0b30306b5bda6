"""Sequence packing for training-batch assembly.

Packing concatenates documents into fixed-token-budget training
sequences. The greedy contiguous policy ("next doc goes after the
previous one; a new sequence starts every ``budget`` tokens of
cumulative length") is a pure prefix-sum: a doc's offset is the
cumulative token count of its predecessors, and its pack id is
``offset div budget``. That is one window aggregate — no driver loop,
no UDF — and it parallelizes by the partition column: packing is done
independently per shard (here per language; at 100 TB per
hash-bucket-of-corpus), so the window shuffle is many small sorted
groups, never a single global ordering.

Docs longer than the budget simply span packs (offset keeps growing)
— the downstream tokenizer splits them; the plan stays a map.

Reference parity: no reference counterpart; training-data scope
mandated by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: tokens per packed training sequence.
PACK_BUDGET = 256


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    part_col: str,
    budget: int = PACK_BUDGET,
) -> DataFrame:
    """Assign (offset, pack_id) per row: greedy contiguous packing in
    ``id_col`` order within each ``part_col`` shard."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    return df.withColumn("offset", offset).withColumn(
        "pack_id", F.expr(f"offset div {budget}")
    )


#: sliding-window chunking: window width / stride in tokens.
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def chunk_token_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
    keep_text: bool = False,
) -> DataFrame:
    """Overlapping token-window chunks — the other half of sequence
    assembly (packing concatenates short docs; chunking splits long
    ones into model-context-sized windows with overlap for continuity).

    Pure generate-side plan: tokenize once, compute the chunk count
    arithmetically, explode a ``sequence`` of chunk ids, and slice the
    cached token array per chunk — no shuffle at all; output size is
    ~n_tokens/stride rows per doc. Every chunk carries a content hash
    so downstream exact-dedup composes directly. ``keep_text=True``
    additionally carries the chunk's text (for rewrite-style consumers
    that reassemble documents); detection-only consumers should leave
    it off so the exchange ships hashes, not content.
    """
    if not (0 < stride <= width):
        raise ValueError(f"need 0 < stride <= width, got {stride}/{width}")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = (
        F.when(n <= width, F.lit(1).cast("long"))
        .otherwise(F.ceil((n - width) / F.lit(float(stride))) + 1)
    )
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_id"
            ),
        )
        .withColumn("__chunk", F.slice("__toks", F.col("chunk_id") * stride + 1, width))
        .select(
            id_col,
            "chunk_id",
            F.size("__chunk").cast("long").alias("n_tokens"),
            F.md5(F.array_join("__chunk", " ").cast("binary")).alias("chunk_hash"),
            *(
                [F.array_join("__chunk", " ").alias("chunk_text")]
                if keep_text
                else []
            ),
        )
    )

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

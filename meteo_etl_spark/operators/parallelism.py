"""Scan-parallelism repair for narrow inputs feeding wide work.

A parquet scan gets one task per file split; a small single-file table
therefore yields ONE task, and any expression-heavy map above it
(shingling, minhash, per-bit simhash folds, vector math) runs on one
core regardless of cluster size. ``fan_out`` inserts a round-robin
repartition ONLY when the scan is under-partitioned relative to the
session's parallelism — trading one tiny shuffle (the narrow input)
for full-width execution of the expensive map above it.

At 100 TB this is a no-op by construction: big tables arrive in
thousands of splits, so the partition check short-circuits and no
exchange is added. The helper exists precisely so the same query code
is right at both ends of the scale — it repairs the degenerate small
end without costing the big end anything.

Reference parity: the reference is single-process and has no notion of
scan parallelism (etl/transform.py runs pandas in one thread); this is
engine-side infrastructure with no reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: (applicationId, analyzed-plan semanticHash) -> observed partition
#: count. The probe below (``df.rdd.getNumPartitions``) forces full
#: physical planning — ~60-130 ms of driver time PER CALL under AQE —
#: while its answer is a pure function of the (session, plan) pair:
#: same files, same plan, same split math. Memoizing the probe makes
#: every re-construction of the same query free; the memo stores a
#: partition COUNT, never data, so no result ever crosses runs.
_NPART_MEMO: dict[tuple[str, int], int] = {}


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` round-robin to ``min_partitions`` (default:
    ``sparkContext.defaultParallelism``) iff it currently has fewer
    partitions; otherwise return it unchanged (no exchange added).

    Use below expression-heavy projections whose input may be a small
    single-split scan. Do NOT use above filters you want pushed into
    the scan — repartition first, filter after, blocks pushdown.
    """
    if df.isStreaming:
        return df
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        key = (
            spark.sparkContext.applicationId,
            df._jdf.queryExecution().analyzed().semanticHash(),
        )
    except Exception:  # non-classic DataFrame (connect) — probe direct
        key = None
    n = _NPART_MEMO.get(key) if key is not None else None
    if n is None:
        # .rdd builds the physical plan lazily (no job) to read its
        # partitioning; the memo amortizes that across invocations.
        n = df.rdd.getNumPartitions()
        if key is not None:
            _NPART_MEMO[key] = n
    if n >= target:
        return df
    return df.repartition(target)

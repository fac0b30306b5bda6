"""The end-to-end corpus curation pipeline — the round's operators
composed into the workflow a training-data release actually runs:

    1. exact dedup        (content digest, keep lowest id)
    2. near-dup removal   (MinHash-LSH candidates + exact Jaccard)
    3. quality gate       (native expression score >= threshold)
    4. decontamination    (exact shingle overlap AND fuzzy near-dup
                           against the held-out eval corpus)
    5. split assignment   (deterministic hash buckets)
    6. sequence packing   (greedy token packing within each split)
    7. delivery           (WebDataset tar shards of the train split)

Every stage is one of the independently oracle-checked operators from
``functions/*``; this module only wires them, tags each document with
its FIRST failing stage (an auditable drop ledger, the same contract
as the ``corpus_clean`` query), and materializes the outputs. One
corpus pass per stage family, no collect() of document data — the
driver sees only the per-reason counts.

Reference parity: no reference counterpart (the reference ships
weather rows to Postgres); this is the BASELINE.json training-data
mandate assembled end to end.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from meteo_etl_spark.functions import dedup as dd
from meteo_etl_spark.functions import text as tx
from meteo_etl_spark.functions.packing import PACK_BUDGET, pack_sequences
from meteo_etl_spark.functions.sampling import hash_split
from meteo_etl_spark.operators.parallelism import fan_out
from meteo_etl_spark.sources.export import export_webdataset

QUALITY_MIN = 0.3
CURATE_SHARDS = 4


@dataclass(frozen=True)
class CurateStats:
    reasons: dict[str, int]  # first-failing-stage counts, incl. "kept"
    splits: dict[str, int]  # kept docs per train/val/test split
    n_packs: int  # token packs over the kept train split
    shards: list[tuple[int, int, int]]  # webdataset (shard, n, bytes)


def drop_ledger(docs: DataFrame, eval_docs: DataFrame) -> DataFrame:
    """(doc_id, reason) for every training doc; reason is the FIRST
    failing stage ('exact_dup' | 'near_dup' | 'low_quality' |
    'contaminated' | 'kept'). The flag sets are id-sized (never carry
    text) but still O(corpus) rows — near-dup ids alone can be a large
    fraction of all docs — so they are NOT broadcast: the tagged ids
    union into one stage-priority aggregate and reach the corpus
    through a single shuffled join on doc_id (AQE still broadcasts the
    flag side when it is genuinely small).

    Does NOT cache: each stage re-scans the input (fine for ad-hoc
    use). ``curate_corpus`` caches the corpus around this call and
    unpersists when its actions complete — cache lifetime belongs to
    the caller that knows when the last action ran."""
    return _drop_ledger_on(fan_out(docs), eval_docs)


def _drop_ledger_on(docs: DataFrame, eval_docs: DataFrame) -> DataFrame:

    exact_w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact_dups = (
        docs.withColumn("rn", F.row_number().over(exact_w))
        .filter(F.col("rn") > 1)
        .select(F.col("doc_id").alias("dup_id"))
    )
    # No .distinct() on the flag sets: the min(pri) aggregate below
    # dedups all of them in its single shuffle.
    near_dups = dd.minhash_lsh_pairs(docs).select(F.col("doc_b").alias("near_id"))
    exact_con = (
        dd.decontaminate(docs, eval_docs)
        .filter(F.col("n_overlap") > 0)
        .select(F.col("id").alias("flag_id"))
    )
    fuzzy_con = (
        dd.fuzzy_decontaminate(docs, eval_docs)
        .filter("contaminated")
        .select(F.col("id").alias("flag_id"))
    )

    # Stage priority encodes "first failing stage": 1 exact_dup,
    # 2 near_dup, 4 contaminated (3 is the quality gate, computed from
    # the score, not a flag set). min(pri) over the union replaces the
    # three per-set distincts AND the three corpus joins with one
    # aggregate + ONE shuffled join — no O(corpus) broadcast anywhere.
    def tagged(ids: DataFrame, pri: int) -> DataFrame:
        return ids.toDF("doc_id").select("doc_id", F.lit(pri).alias("pri"))

    flags = (
        tagged(exact_dups, 1)
        .unionByName(tagged(near_dups, 2))
        .unionByName(tagged(exact_con, 4))
        .unionByName(tagged(fuzzy_con, 4))
        .groupBy("doc_id")
        .agg(F.min("pri").alias("pri"))
    )

    scored = docs.select("doc_id", tx.quality_score(F.col("text")).alias("score"))
    return scored.join(flags, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("pri") == 1, "exact_dup")
        .when(F.col("pri") == 2, "near_dup")
        .when(F.col("score") < QUALITY_MIN, "low_quality")
        .when(F.col("pri") == 4, "contaminated")
        .otherwise("kept")
        .alias("reason"),
    )


def curate_corpus(
    docs: DataFrame,
    eval_docs: DataFrame,
    out_dir: str,
    *,
    pack_budget: int = PACK_BUDGET,
    num_shards: int = CURATE_SHARDS,
) -> CurateStats:
    """Run the full curation pipeline; writes the train split as
    WebDataset shards under ``out_dir`` and returns the audit stats.

    The corpus is cached for the pipeline's multiple scans and
    unpersisted before returning — every output is an action inside
    this function, so nothing lazy outlives the cache."""
    cached = fan_out(docs).cache()
    try:
        ledger = _drop_ledger_on(cached, eval_docs)
        reasons = {
            r.reason: r.n
            for r in ledger.groupBy("reason")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

        # left_semi, not broadcast: the kept-id set is ~the whole corpus
        # (most docs survive), so forcing a broadcast would ship
        # O(corpus) ids to every executor; a semi join shuffles on
        # doc_id and AQE may still broadcast when genuinely small.
        kept = cached.join(
            ledger.filter(F.col("reason") == "kept").select("doc_id"),
            "doc_id",
            "left_semi",
        )
        split = hash_split(
            kept.select("doc_id"), "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
        ).select("doc_id", "split")
        splits = {
            r.split: r.n
            for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
        }

        train = kept.join(split.filter("split = 'train'"), "doc_id")
        packed = pack_sequences(
            train.select(
                "doc_id", tx.token_count(F.col("text")).alias("n_tokens"), "split"
            ),
            "doc_id",
            "n_tokens",
            "split",
            budget=pack_budget,
        )
        n_packs = packed.select("pack_id").distinct().count()

        shards = export_webdataset(
            train.select("doc_id", "text"),
            out_dir,
            key_col="doc_id",
            content_cols=["text"],
            num_shards=num_shards,
        )
        return CurateStats(
            reasons=reasons, splits=splits, n_packs=n_packs, shards=shards
        )
    finally:
        cached.unpersist()

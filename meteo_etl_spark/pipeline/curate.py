"""The end-to-end corpus curation pipeline — the round's operators
composed into the workflow a training-data release actually runs:

    1. exact dedup        (content digest, keep lowest id)
    2. near-dup removal   (MinHash-LSH candidates + exact Jaccard)
    2b. substring excision (OPTIONAL, ``substring_dedup=True``: Lee
                           et al. duplicated-span removal — REWRITES
                           surviving docs; a doc excised to nothing
                           drops with its own ledger reason)
    3. quality gate       (native expression score >= threshold,
                           scored on the rewritten text when 2b ran)
    3b. classifier filter (OPTIONAL, ``classifier_model=``: apply a
                           trained nearest-class-centroid model —
                           functions/classify — and drop documents
                           whose predicted class is not in
                           ``classifier_keep``; the FineWeb-style
                           learned-filter stage)
    4. decontamination    (exact shingle overlap AND fuzzy near-dup
                           against the held-out eval corpus, likewise
                           on the rewritten text)
    5. split assignment   (deterministic hash buckets)
    6. sequence packing   (greedy token packing within each split)
    7. delivery           (WebDataset tar shards of the train split
                           + DATACARD.json: the release's audit
                           record — config, per-reason drop counts,
                           splits, packing and shard stats — so a
                           shipped directory is self-describing)

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
#: one definition — the hash_split call AND the shipped DATACARD.json
#: config echo both read this, so the audit record cannot drift
SPLIT_FRACTIONS = {"train": 0.9, "val": 0.05, "test": 0.05}


@dataclass(frozen=True)
class CurateStats:
    reasons: dict[str, int]  # first-failing-stage counts, incl. "kept"
    splits: dict[str, int]  # kept docs per train/val/test split
    n_packs: int  # token packs over the kept train split
    shards: list[tuple[int, int, int]]  # webdataset (shard, n, bytes)
    n_tokens_excised: int = 0  # substring_dedup stage: tokens removed


def drop_ledger(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    rewritten: DataFrame | None = None,
    containment_dedup: bool = False,
    classifier_model: DataFrame | None = None,
    classifier_keep: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, reason) for every training doc; reason is the FIRST
    failing stage ('exact_dup' | 'near_dup' | 'contained_dup' |
    'substring_dup' | 'low_quality' | 'classifier_reject' |
    'contaminated' | 'kept').

    ``containment_dedup=True`` enables stage 2c (the asymmetric
    route, ``dedup.containment_pairs``): for each pair whose shingle
    containment passes the threshold, the SHORTER document drops as
    'contained_dup' (its content ships inside the container; ties
    keep the lower doc_id) — the small-doc-pasted-into-big case the
    symmetric near-dup stage is blind to.
    The flag sets are
    id-sized (never carry text) but still O(corpus) rows — near-dup
    ids alone can be a large fraction of all docs — so they are NOT
    broadcast: the tagged ids union into one stage-priority aggregate
    and reach the corpus through a single shuffled join on doc_id
    (AQE still broadcasts the flag side when it is genuinely small).

    ``rewritten`` is the substring-excision output
    (``dedup.excise_duplicate_spans``: doc_id, text, n_removed) when
    that stage is enabled: docs excised to nothing drop as
    'substring_dup', and the quality + contamination stages evaluate
    the REWRITTEN text (a doc is judged as it would ship).

    ``classifier_model`` (a ``functions/classify`` model frame:
    (cls, tok, freq_ppm)) enables the learned-filter stage: documents
    whose predicted class (on the shipped text form) is not in
    ``classifier_keep`` drop as 'classifier_reject' — after the
    quality gate, before decontamination. OOV predictions reject
    unless ``classify.OOV_LABEL`` is explicitly kept.

    Does NOT cache: each stage re-scans the input (fine for ad-hoc
    use). ``curate_corpus`` caches the corpus around this call and
    unpersists when its actions complete — cache lifetime belongs to
    the caller that knows when the last action ran."""
    return _drop_ledger_on(
        fan_out(docs),
        eval_docs,
        rewritten=rewritten,
        containment_dedup=containment_dedup,
        classifier_model=classifier_model,
        classifier_keep=classifier_keep,
    )


def _drop_ledger_on(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    rewritten: DataFrame | None = None,
    containment_dedup: bool = False,
    classifier_model: DataFrame | None = None,
    classifier_keep: tuple[str, ...] = (),
) -> DataFrame:
    if classifier_model is not None and not classifier_keep:
        raise ValueError("classifier_model requires a non-empty classifier_keep")

    exact_w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact_dups = (
        docs.withColumn("rn", F.row_number().over(exact_w))
        .filter(F.col("rn") > 1)
        .select(F.col("doc_id").alias("dup_id"))
    )
    # No .distinct() on the flag sets: the min(pri) aggregate below
    # dedups all of them in its single shuffle.
    near_dups = dd.minhash_lsh_pairs(docs).select(F.col("doc_b").alias("near_id"))
    # downstream stages judge the text that would SHIP: the rewritten
    # form when substring excision ran, the original otherwise
    judged = docs if rewritten is None else rewritten
    exact_con = (
        dd.decontaminate(judged, eval_docs)
        .filter(F.col("n_overlap") > 0)
        .select(F.col("id").alias("flag_id"))
    )
    fuzzy_con = (
        dd.fuzzy_decontaminate(judged, eval_docs)
        .filter("contaminated")
        .select(F.col("id").alias("flag_id"))
    )

    # Stage priority encodes "first failing stage": 1 exact_dup,
    # 2 near_dup, 3 contained_dup (optional 2c), 4 substring_dup
    # (excised to nothing), 5 classifier_reject, 6 contaminated (the
    # quality gate is computed from the score, not a flag set, and
    # the when-chain places it between 4 and 5). min(pri) over the
    # union replaces the per-set distincts AND the per-set corpus
    # joins with one aggregate + ONE shuffled join — no O(corpus)
    # broadcast anywhere.
    def tagged(ids: DataFrame, pri: int) -> DataFrame:
        return ids.toDF("doc_id").select("doc_id", F.lit(pri).alias("pri"))

    flag_sets = [
        tagged(exact_dups, 1),
        tagged(near_dups, 2),
        tagged(exact_con, 6),
        tagged(fuzzy_con, 6),
    ]
    if containment_dedup:
        # drop the CONTAINED side of each passing pair, ranked by
        # SHINGLE-SET size — the measure containment itself is
        # computed over (|A∩B| / min(|A|,|B|)) — not char length: a
        # doc with fewer characters can own the LARGER shingle set
        # (e.g. more distinct grams in less text), and the dropped doc
        # must be the set-theoretically contained one. On equal set
        # size keep the lower doc_id (the dedup_canonical keep-policy
        # convention).
        lens = dd._shingle_docs(docs, "doc_id", "text").select(
            F.col("id").alias("lid"), F.size("sh").alias("ln")
        )
        pairs = dd.containment_pairs(docs)
        contained = (
            pairs.join(
                lens.select(
                    F.col("lid").alias("doc_a"), F.col("ln").alias("len_a")
                ),
                "doc_a",
            )
            .join(
                lens.select(
                    F.col("lid").alias("doc_b"), F.col("ln").alias("len_b")
                ),
                "doc_b",
            )
            .select(
                F.when(F.col("len_a") < F.col("len_b"), F.col("doc_a"))
                .when(F.col("len_b") < F.col("len_a"), F.col("doc_b"))
                .otherwise(F.greatest("doc_a", "doc_b"))
                .alias("cont_id")
            )
        )
        flag_sets.append(tagged(contained, 3))
    if classifier_model is not None:
        from meteo_etl_spark.functions.classify import score_documents

        rejected = (
            score_documents(judged, classifier_model)
            .where(~F.col("pred_cls").isin(list(classifier_keep)))
            .select("doc_id")
        )
        flag_sets.append(tagged(rejected, 5))
    if rewritten is not None:
        # excised-to-NOTHING means tokens were actually removed: an
        # originally-empty document rebuilds to "" with n_removed == 0
        # and must NOT claim the substring_dup reason
        empty = rewritten.filter(
            (F.col("text") == "") & (F.col("n_removed") > 0)
        ).select("doc_id")
        flag_sets.append(tagged(empty, 4))
    flags = flag_sets[0]
    for fs in flag_sets[1:]:
        flags = flags.unionByName(fs)
    # ONE min(pri) aggregate covers every flag set (min is associative
    # — no second shuffle for the substring/classifier sets)
    flags = flags.groupBy("doc_id").agg(F.min("pri").alias("pri"))

    scored = judged.select(
        "doc_id", tx.quality_score(F.col("text")).alias("score")
    )
    return scored.join(flags, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("pri") == 1, "exact_dup")
        .when(F.col("pri") == 2, "near_dup")
        .when(F.col("pri") == 3, "contained_dup")
        .when(F.col("pri") == 4, "substring_dup")
        .when(F.col("score") < QUALITY_MIN, "low_quality")
        .when(F.col("pri") == 5, "classifier_reject")
        .when(F.col("pri") == 6, "contaminated")
        .otherwise("kept")
        .alias("reason"),
    )


def _write_data_card(out_dir: str, stats: CurateStats, *, config: dict) -> None:
    """Write ``DATACARD.json`` next to the shards: the release's audit
    record (config used, per-reason drop counts, splits, packing and
    shard stats). Deliberately timestamp-free — the card, like the
    tars (zeroed mtimes), is byte-reproducible from the same inputs,
    so a resumed or re-run export regenerates an identical release.
    Sorted keys; plain JSON a loader or auditor reads without Spark."""
    import json
    import os

    card = {
        "format": "meteo-etl-spark/datacard-v1",
        "config": config,
        "n_docs_in": int(sum(stats.reasons.values())),
        "reasons": {k: int(v) for k, v in sorted(stats.reasons.items())},
        "splits": {k: int(v) for k, v in sorted(stats.splits.items())},
        "n_packs": int(stats.n_packs),
        "n_tokens_excised": int(stats.n_tokens_excised),
        "shards": [
            {"shard": int(s), "n_samples": int(n), "n_bytes": int(b)}
            for s, n, b in stats.shards
        ],
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "DATACARD.json"), "w") as f:
        json.dump(card, f, indent=2, sort_keys=True)
        f.write("\n")


def curate_corpus(
    docs: DataFrame,
    eval_docs: DataFrame,
    out_dir: str,
    *,
    pack_budget: int = PACK_BUDGET,
    num_shards: int = CURATE_SHARDS,
    substring_dedup: bool = False,
    containment_dedup: bool = True,
    classifier_model: DataFrame | None = None,
    classifier_keep: tuple[str, ...] = (),
) -> CurateStats:
    """Run the full curation pipeline; writes the train split as
    WebDataset shards under ``out_dir`` and returns the audit stats.

    ``substring_dedup=True`` enables stage 2b (Lee et al. span
    excision, ``dedup.excise_duplicate_spans``): surviving documents
    are REWRITTEN — quality, decontamination, packing token counts
    and the shipped shards all see the excised text; docs excised to
    nothing drop with ledger reason 'substring_dup'; the total token
    count removed is reported as ``n_tokens_excised``.

    ``containment_dedup`` (stage 2c, asymmetric containment via
    ``dedup.containment_pairs``) defaults ON for the release
    pipeline — the r13 decision, backed by the sf0.1 audit
    (bench_evidence/R13_CURATE.md): 256 passing pairs, EVERY dropped
    side's own-set containment exactly 1.0 (zero false drops at the
    0.9 threshold), 244 contained docs the symmetric near-dup stage
    structurally cannot catch. The side with the smaller SHINGLE SET
    drops as 'contained_dup'. ``drop_ledger``'s own parameter stays
    default-off (it is the ad-hoc building block; registered queries
    pin their own flags), so flip it explicitly when reconciling a
    ledger against a curate_corpus run.

    ``classifier_model`` + ``classifier_keep`` enable stage 3b (the
    learned filter, functions/classify): documents whose predicted
    class on the shipped text form is not in ``classifier_keep`` drop
    as 'classifier_reject'. Train the model once with
    ``classify.train_token_centroids`` (and persist it — it is a
    DataFrame) and reuse it across curation runs; scoring adds one
    vocabulary join plus a per-document argmax shuffle, opt-in.

    The corpus (and, when 2b runs, the rewritten corpus — its
    excision joins would otherwise re-run per downstream stage) is
    cached for the pipeline's multiple scans and unpersisted before
    returning — every output is an action inside this function, so
    nothing lazy outlives the caches."""
    cached = fan_out(docs).cache()
    rewritten = None
    try:
        n_tokens_excised = 0
        if substring_dedup:
            rewritten = dd.excise_duplicate_spans(cached).cache()
            n_tokens_excised = int(
                rewritten.agg(F.sum("n_removed")).collect()[0][0] or 0
            )
        ledger = _drop_ledger_on(
            cached,
            eval_docs,
            rewritten=rewritten,
            containment_dedup=containment_dedup,
            classifier_model=classifier_model,
            classifier_keep=classifier_keep,
        )
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
        # Ship the text the ledger JUDGED: the rewritten corpus when
        # substring excision ran.
        ship = (
            cached
            if rewritten is None
            else rewritten.select("doc_id", "text")
        )
        kept = ship.join(
            ledger.filter(F.col("reason") == "kept").select("doc_id"),
            "doc_id",
            "left_semi",
        )
        split = hash_split(
            kept.select("doc_id"), "doc_id", dict(SPLIT_FRACTIONS)
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
        stats_out = CurateStats(
            reasons=reasons,
            splits=splits,
            n_packs=n_packs,
            shards=shards,
            n_tokens_excised=n_tokens_excised,
        )
        _write_data_card(
            out_dir,
            stats_out,
            config={
                "pack_budget": pack_budget,
                "num_shards": num_shards,
                "substring_dedup": substring_dedup,
                "containment_dedup": containment_dedup,
                "classifier_filter": classifier_model is not None,
                "classifier_keep": sorted(classifier_keep),
                "quality_min": QUALITY_MIN,
                "split_fractions": dict(SPLIT_FRACTIONS),
            },
        )
        return stats_out
    finally:
        cached.unpersist()
        if rewritten is not None:
            rewritten.unpersist()

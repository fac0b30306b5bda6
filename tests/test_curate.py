"""End-to-end curation pipeline: the independently-checked operators
composed, with an auditable drop ledger and a loader-readable output."""

from __future__ import annotations

import glob
import os
import tarfile

from pyspark.sql import functions as F

from meteo_etl_spark.pipeline.curate import curate_corpus, drop_ledger
from meteo_etl_spark.plans.llm_queries import DECON_EVAL_MOD
from meteo_etl_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL


def _split(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    is_eval = F.col("doc_id") % DECON_EVAL_MOD == 0
    return docs.filter(~is_eval), docs.filter(is_eval)


def test_drop_ledger_covers_corpus_and_agrees_with_operators(spark):
    """One row per doc; every doc flagged by the standalone operators
    is dropped for that (or an earlier) reason."""
    train, eval_docs = _split(spark)
    ledger = {r.doc_id: r.reason for r in drop_ledger(train, eval_docs).collect()}
    assert len(ledger) == train.count()

    from meteo_etl_spark.functions import dedup as dd

    fuzzy = {
        r.id for r in dd.fuzzy_decontaminate(train, eval_docs).collect()
        if r.contaminated
    }
    # contaminated docs are never kept (they may carry an earlier
    # dedup reason — first failing stage wins)
    assert all(ledger[d] != "kept" for d in fuzzy)
    near = {r.doc_b for r in dd.minhash_lsh_pairs(train).collect()}
    assert all(ledger[d] in ("exact_dup", "near_dup") for d in near)


def test_curate_corpus_end_to_end(spark, tmp_path):
    train, eval_docs = _split(spark)
    out = str(tmp_path / "release")
    stats = curate_corpus(train, eval_docs, out)

    n_in = train.count()
    assert sum(stats.reasons.values()) == n_in
    assert stats.reasons.get("kept", 0) > 0
    assert sum(stats.splits.values()) == stats.reasons["kept"]
    assert stats.n_packs >= 1

    # the shipped shards contain exactly the kept train docs
    shipped = set()
    for f in glob.glob(os.path.join(out, "shard-*.tar")):
        with tarfile.open(f) as tar:
            shipped |= {int(m.name.split(".")[0]) for m in tar.getmembers()}
    assert len(shipped) == stats.splits["train"]
    assert sum(n for _, n, _ in stats.shards) == stats.splits["train"]

    # no contaminated / duplicate doc ships
    ledger = {r.doc_id: r.reason for r in drop_ledger(train, eval_docs).collect()}
    assert all(ledger[d] == "kept" for d in shipped)


def test_curate_corpus_with_substring_stage(spark, tmp_path):
    """r8/r10 order: substring excision as an optional curation stage.
    A corpus with a known cross-doc boilerplate run: the stage rewrites
    survivors (shipped shards carry EXCISED text), fully-duplicated
    docs drop with their own ledger reason, n_tokens_excised
    reconciles with the standalone operator, and the default-off path
    is byte-identical to the pre-stage pipeline."""
    import tarfile as tf

    from meteo_etl_spark.functions import dedup as dd

    # doc 0 owns the canonical boilerplate; doc 1 repeats it VERBATIM
    # (drops at the earlier exact/near stage or excises to nothing);
    # doc 2 embeds it inside novel text (survives, rewritten); doc 3
    # is pure novel text; doc 4 is eval-side.
    boiler = " ".join(f"b{i}" for i in range(12))
    rows = [
        (0, boiler),
        (2, "alpha beta " + boiler + " gamma delta epsilon zeta"),
        (3, " ".join(f"n{i}" for i in range(24))),
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    eval_docs = spark.createDataFrame(
        [(100, " ".join(f"e{i}" for i in range(24)))],
        "doc_id long, text string",
    )
    out = str(tmp_path / "rel")
    stats = curate_corpus(
        train, eval_docs, out, num_shards=1, substring_dedup=True
    )
    assert sum(stats.reasons.values()) == 3
    # the operator's own answer is the reconciliation oracle
    op = {
        r["doc_id"]: r
        for r in dd.excise_duplicate_spans(train).collect()
    }
    assert stats.n_tokens_excised == sum(r["n_removed"] for r in op.values())
    assert stats.n_tokens_excised > 0
    # doc 2 ships WITHOUT the boilerplate tokens; doc 0 (canonical)
    # ships intact — read the tar back
    shipped = {}
    for f in glob.glob(os.path.join(out, "shard-*.tar")):
        with tf.open(f) as tar:
            for m in tar.getmembers():
                shipped[int(m.name.split(".")[0])] = (
                    tar.extractfile(m).read().decode()
                )
    for d, text in shipped.items():
        assert text == op[d]["text"], (d, text)
    if 2 in shipped:
        assert "b0" not in shipped[2] and "alpha" in shipped[2]
    if 0 in shipped:
        assert shipped[0] == boiler
    # default-off path: unchanged contract (no substring_dup reason)
    stats_off = curate_corpus(train, eval_docs, str(tmp_path / "off"), num_shards=1)
    assert "substring_dup" not in stats_off.reasons
    assert stats_off.n_tokens_excised == 0


def test_fully_excised_doc_drops_with_substring_reason(spark, tmp_path):
    """A doc whose every token sits in duplicated grams (but which is
    NOT an exact/near dup — different doc lengths defeat both) must
    drop as 'substring_dup', not ship as an empty string."""
    from meteo_etl_spark.pipeline.curate import drop_ledger
    from meteo_etl_spark.functions import dedup as dd

    boiler = " ".join(f"b{i}" for i in range(8))
    rows = [
        # doc 0: boilerplate + long novel tail (canonical occurrences)
        (0, boiler + " " + " ".join(f"n{i}" for i in range(40))),
        # doc 1: ONLY the boilerplate -> every position covered
        (1, boiler),
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    eval_docs = spark.createDataFrame(
        [(100, " ".join(f"e{i}" for i in range(24)))],
        "doc_id long, text string",
    )
    rewritten = dd.excise_duplicate_spans(train)
    led = {
        r.doc_id: r.reason
        for r in drop_ledger(train, eval_docs, rewritten=rewritten).collect()
    }
    assert led[1] == "substring_dup", led
    # doc 0 keeps its canonical occurrences: whatever the quality
    # heuristic says about the synthetic tokens, it is NOT excised
    assert led[0] != "substring_dup", led


def test_curate_corpus_with_classifier_filter(spark, tmp_path):
    """Stage 3b: a model trained on separable vocabularies rejects the
    out-of-keep class; rejected docs never ship; priority ordering
    holds (low_quality fires before classifier_reject)."""
    from meteo_etl_spark.functions.classify import train_token_centroids
    from meteo_etl_spark.pipeline.curate import QUALITY_MIN
    from meteo_etl_spark.functions import text as tx

    labeled = spark.createDataFrame(
        [
            (1, "alphaword betaword gammaword deltaword", "en"),
            (2, "unolargo doslargos treslargos cuatrolargo", "es"),
        ],
        "doc_id bigint, text string, lang string",
    )
    model = train_token_centroids(labeled, class_col="lang")

    # tokens are >= 8 chars so the mean-token-length term alone clears
    # the quality gate; per-doc suffix tokens kill near-dup shingles
    rows = []
    for i in range(30):
        rows.append(
            (i, f"alphaword betaword gammaword deltaword epsilonword{i} zetaword{i} etaword{i}")
        )
    for i in range(30, 40):
        rows.append(
            (i, f"unolargo doslargos treslargos cuatrolargo cincolargo{i} seislargo{i} sietelargo{i}")
        )
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    eval_docs = spark.createDataFrame(
        [(9999, "unrelated holdout corpus text")], "doc_id bigint, text string"
    )

    # sanity: the fixture clears the quality gate, so classifier_reject
    # is the first failing stage for the 'es' docs
    scores = docs.select(tx.quality_score(F.col("text")).alias("s")).collect()
    assert all(r.s >= QUALITY_MIN for r in scores)

    out = str(tmp_path / "release")
    stats = curate_corpus(
        docs, eval_docs, out, classifier_model=model, classifier_keep=("en",)
    )
    assert stats.reasons.get("classifier_reject", 0) == 10
    assert sum(stats.reasons.values()) == 40

    shipped = set()
    for f in glob.glob(os.path.join(out, "shard-*.tar")):
        with tarfile.open(f) as tar:
            shipped |= {int(m.name.split(".")[0]) for m in tar.getmembers()}
    assert shipped and all(d < 30 for d in shipped)


def test_classifier_filter_requires_keep_and_respects_priority(spark):
    """Empty keep-set with a model is a hard error; a doc that is both
    low-quality and classifier-rejected drops as low_quality (first
    failing stage), and one both rejected and contaminated drops as
    classifier_reject."""
    import pytest

    from meteo_etl_spark.functions.classify import train_token_centroids

    labeled = spark.createDataFrame(
        [
            (1, "goodword nicetext cleartext finetext", "en"),
            (
                2,
                "mal malisimo textogrande aquimismo claroverdad verdadero "
                "amigomio bienbueno grandioso",
                "es",
            ),
        ],
        "doc_id bigint, text string, lang string",
    )
    model = train_token_centroids(labeled, class_col="lang")
    docs = spark.createDataFrame(
        [
            # 'es'-vocab doc that ALSO fails the quality gate (short
            # repeated token => low mean-length and stopword terms)
            (1, "mal mal mal mal mal mal mal mal"),
            # 'es'-vocab doc that clears quality (long tokens) and is
            # ALSO contaminated (verbatim in eval)
            (
                2,
                "malisimo textogrande aquimismo claroverdad verdadero "
                "amigomio bienbueno grandioso",
            ),
        ],
        "doc_id bigint, text string",
    )
    eval_docs = spark.createDataFrame(
        [
            (
                9999,
                "malisimo textogrande aquimismo claroverdad verdadero "
                "amigomio bienbueno grandioso",
            )
        ],
        "doc_id bigint, text string",
    )

    with pytest.raises(ValueError, match="classifier_keep"):
        drop_ledger(docs, eval_docs, classifier_model=model).collect()

    ledger = {
        r.doc_id: r.reason
        for r in drop_ledger(
            docs, eval_docs, classifier_model=model, classifier_keep=("en",)
        ).collect()
    }
    assert ledger[1] == "low_quality"
    assert ledger[2] == "classifier_reject"


def test_data_card_matches_stats_and_is_reproducible(spark, tmp_path):
    """DATACARD.json ships with every release: counts mirror
    CurateStats exactly, the config echoes what ran, and re-running
    the same curation regenerates byte-identical bytes."""
    import json

    train, eval_docs = _split(spark)
    out = str(tmp_path / "release")
    stats = curate_corpus(train, eval_docs, out)
    card_path = os.path.join(out, "DATACARD.json")
    card = json.loads(open(card_path).read())

    assert card["format"] == "meteo-etl-spark/datacard-v1"
    assert card["reasons"] == stats.reasons
    assert card["splits"] == stats.splits
    assert card["n_packs"] == stats.n_packs
    assert card["n_docs_in"] == sum(stats.reasons.values())
    assert card["shards"] == [
        {"shard": s, "n_samples": n, "n_bytes": b} for s, n, b in stats.shards
    ]
    assert card["config"]["classifier_filter"] is False
    assert card["config"]["substring_dedup"] is False

    first = open(card_path, "rb").read()
    out2 = str(tmp_path / "release2")
    curate_corpus(train, eval_docs, out2)
    assert open(os.path.join(out2, "DATACARD.json"), "rb").read() == first


def test_originally_empty_doc_is_not_blamed_on_substring_stage(spark):
    """A doc whose ORIGINAL text is empty rebuilds to "" with
    n_removed == 0 — it must fall through to the quality gate
    ('low_quality'), not claim 'substring_dup'."""
    from meteo_etl_spark.functions import dedup as dd

    boiler = " ".join(f"b{i}" for i in range(8))
    train = spark.createDataFrame(
        [
            (0, boiler + " " + " ".join(f"n{i}" for i in range(40))),
            (1, boiler),  # genuinely excised to nothing
            (2, ""),  # empty from the start
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, " ".join(f"e{i}" for i in range(24)))],
        "doc_id long, text string",
    )
    rewritten = dd.excise_duplicate_spans(train)
    led = {
        r.doc_id: r.reason
        for r in drop_ledger(train, eval_docs, rewritten=rewritten).collect()
    }
    assert led[1] == "substring_dup", led
    assert led[2] == "low_quality", led


def test_containment_stage_drops_the_contained_side(spark, tmp_path):
    """Stage 2c off: the short-doc-inside-long pair survives symmetric
    dedup (J ~ len_a/len_b is tiny). On: the CONTAINED (shorter) doc
    drops as 'contained_dup', the container ships, and higher-priority
    stages still win (an exact dup of the short doc reads
    'exact_dup', never 'contained_dup')."""
    from meteo_etl_spark.pipeline.curate import drop_ledger

    base = [f"w{i}" for i in range(400)]
    short = " ".join(base[:40])
    long_doc = " ".join(base[:40] + [f"filler{i}" for i in range(300)])
    others = [
        (10 + k, " ".join(f"z{k}_{i}" for i in range(120))) for k in range(4)
    ]
    docs = spark.createDataFrame(
        [(1, short), (2, long_doc), (3, short)] + others,
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(900, "completely unrelated benchmark text")],
        "doc_id long, text string",
    )
    off = {
        r["doc_id"]: r["reason"]
        for r in drop_ledger(docs, eval_docs).collect()
    }
    assert "contained_dup" not in off.values()
    on = {
        r["doc_id"]: r["reason"]
        for r in drop_ledger(docs, eval_docs, containment_dedup=True).collect()
    }
    # doc 1 and doc 3 are exact duplicates of each other: doc 3 (the
    # later id) drops as exact_dup FIRST — priority beats containment
    assert on[3] == "exact_dup"
    # doc 1 is contained in doc 2 -> contained_dup; the container ships
    assert on[1] == "contained_dup"
    assert on[2] == "kept"


def test_curate_corpus_with_containment_stage(spark, tmp_path):
    """End-to-end: the contained doc never ships, the DATACARD records
    the stage flag and the 'contained_dup' reason count."""
    import json
    import os

    from meteo_etl_spark.pipeline.curate import curate_corpus

    base = [f"w{i}" for i in range(400)]
    short = " ".join(base[:40])
    long_doc = " ".join(base[:40] + [f"filler{i}" for i in range(300)])
    docs = spark.createDataFrame(
        [(1, short), (2, long_doc)]
        + [
            (10 + k, " ".join(f"z{k}_{i}" for i in range(120)))
            for k in range(6)
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(900, "completely unrelated benchmark text")],
        "doc_id long, text string",
    )
    out = str(tmp_path / "rel")
    stats = curate_corpus(
        docs, eval_docs, out, num_shards=1, containment_dedup=True
    )
    assert stats.reasons.get("contained_dup", 0) == 1
    card = json.load(open(os.path.join(out, "DATACARD.json")))
    assert card["config"]["containment_dedup"] is True
    assert card["reasons"]["contained_dup"] == 1

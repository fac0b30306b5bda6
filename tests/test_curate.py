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

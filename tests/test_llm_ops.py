"""Training-data ops: invariants the DuckDB oracles don't cover —
multimodal mapInPandas batch plumbing, LSH candidate losslessness,
fingerprint order-sensitivity."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.functions import dedup as dd
from meteo_etl_spark.functions import multimodal as mm
from meteo_etl_spark.functions import text as tx
from meteo_etl_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents")


def test_decode_media_matches_jvm_contract(spark, docs):
    """The Arrow-batched mapInPandas decode must equal the pure-JVM
    expression contract (fake_decode_cols) row for row."""
    src = mm.with_binary_payload(docs)
    decoded = mm.decode_media(src).select(
        "doc_id", "n_bytes", "width", "height", "frames"
    )
    contract = src.select(
        "doc_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        *[c.alias(n) for n, c in mm.fake_decode_cols(F.col("n_bytes")).items()],
    )
    assert decoded.exceptAll(contract).count() == 0
    assert contract.exceptAll(decoded).count() == 0


def test_decode_media_real_codec_raises(spark, docs):
    with pytest.raises(NotImplementedError, match="codec"):
        mm.decode_media(mm.with_binary_payload(docs), codec="jpeg")


def test_sample_frames_explodes_per_frame(spark, docs):
    decoded = mm.decode_media(mm.with_binary_payload(docs))
    total = decoded.agg(F.sum("frames")).collect()[0][0]
    assert mm.sample_frames(decoded).count() == total


def test_minhash_lsh_subset_of_exact(spark, docs):
    """LSH output is candidate-pruned exact Jaccard: it can only miss
    pairs (band collision failure), never invent or mis-score them."""
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(docs).collect()
    }
    lsh = {(r.doc_a, r.doc_b): r.jaccard for r in dd.minhash_lsh_pairs(docs).collect()}
    assert set(lsh) <= set(exact)
    assert all(lsh[k] == exact[k] for k in lsh)
    assert all(j >= dd.JACCARD_THRESHOLD - 5e-4 for j in lsh.values())


def test_simhash_banding_is_lossless(spark, docs):
    """Pigeonhole: every pair within max_hamming must survive the
    band-candidate pruning — verify against a full cross-join."""
    sims = dd.simhash_docs(docs)
    a, b = sims.alias("a"), sims.alias("b")
    hamming = F.expr(
        f"aggregate(sequence(1, {dd.SIMHASH_BITS}), 0, "
        "(acc, i) -> acc + if(substring(a.sim, i, 1) = substring(b.sim, i, 1), 0, 1))"
    )
    brute = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            hamming.alias("h"),
        )
        .filter(F.col("h") <= dd.SIMHASH_MAX_HAMMING)
        .collect()
    }
    banded = {(r.doc_a, r.doc_b) for r in dd.simhash_pairs(docs).collect()}
    assert banded == brute


def test_fingerprint_is_order_sensitive(spark):
    df = spark.createDataFrame(
        [("a b c",), ("c b a",), ("a b c",)], ["text"]
    ).select(tx.fingerprint(F.col("text")).alias("fp"))
    fps = [r.fp for r in df.collect()]
    assert fps[0] == fps[2] != fps[1]


def test_exact_dedup_doubled_corpus(spark, docs):
    out = dd.exact_dedup(docs.unionAll(docs), "text", "doc_id").collect()
    assert len(out) == docs.count()
    assert all(r.n_copies == 2 for r in out)


def test_ivf_index_matches_inline_ann(spark, tmp_path):
    """The persisted bucket-partitioned index must return exactly the
    inline ann_lsh_topk result, and the scan must be partition-pruned
    (PartitionFilters on table/bucket in the plan)."""
    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    idx = str(tmp_path / "lsh_index")
    sim.build_lsh_index(emb, idx)

    qv = emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    got = sim.query_lsh_index(spark, idx, qv, k=5, exclude_id=0)
    exp = sim.ann_lsh_topk(emb, query_id=0, k=5)
    assert [r.asDict() for r in got.collect()] == [r.asDict() for r in exp.collect()]

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the pruned scan must not read every partition
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), "partition filter list is empty"


def test_multimodal_pipeline_composes_with_similarity(spark, docs, tmp_path):
    """decode → embed → ANN composition: the multimodal fake embeddings
    flow through the real similarity stack (schema + batch plumbing are
    what's under test, not the fake features)."""
    from meteo_etl_spark.functions import similarity as sim

    emb = mm.embed_media(mm.with_binary_payload(docs)).withColumnRenamed(
        "doc_id", "vec_id"
    )
    assert dict(emb.dtypes)["embedding"] == "array<double>"
    row = emb.filter(F.col("vec_id") == 0).collect()[0]
    assert len(row.embedding) == mm.EMBED_DIM
    assert abs(sum(x * x for x in row.embedding) - 1.0) < 1e-9  # L2-normalized

    # brute-force top-k over the fake embeddings runs end to end
    got = sim.brute_force_topk(emb, query_id=0, k=3)
    rows = got.collect()
    assert len(rows) == 3
    assert all(-1.0 <= r.sim <= 1.0 for r in rows)
    # determinism: same pipeline, same result
    again = sim.brute_force_topk(
        mm.embed_media(mm.with_binary_payload(docs)).withColumnRenamed("doc_id", "vec_id"),
        query_id=0, k=3,
    ).collect()
    assert [r.asDict() for r in rows] == [r.asDict() for r in again]


def test_hash_split_deterministic_partition_invariant(spark, docs):
    """Split assignment is identical regardless of physical layout, and
    fractions land within permille tolerance of the request."""
    from meteo_etl_spark.functions.sampling import hash_split

    splits = {"train": 0.9, "val": 0.05, "test": 0.05}
    a = {r.doc_id: r.split for r in hash_split(docs, "doc_id", splits).collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(docs.repartition(7), "doc_id", splits).collect()
    }
    assert a == b
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    assert 0.85 < frac_train < 0.95


def test_hash_sample_is_subset_and_composable(spark, docs):
    from meteo_etl_spark.functions.sampling import hash_sample

    half = hash_sample(docs, "doc_id", 0.5)
    tenth_of_all = {r.doc_id for r in hash_sample(docs, "doc_id", 0.1).collect()}
    tenth_of_half = {r.doc_id for r in hash_sample(half, "doc_id", 0.1).collect()}
    assert tenth_of_half == tenth_of_all  # bucket ranges nest
    assert {r.doc_id for r in half.collect()} >= tenth_of_all


def test_stratified_sample_respects_per_stratum_thresholds(spark, docs):
    """Every kept row's salted bucket is under its own stratum's
    threshold, and the kept set is partition-layout invariant."""
    from meteo_etl_spark.functions.sampling import hash_bucket, stratified_sample

    fracs = {"en": 0.5, "zh": 0.8}
    kept = stratified_sample(
        docs.select("doc_id", "lang"), "doc_id", "lang", fracs, default_fraction=0.25
    )
    salted = F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))
    thr = (
        F.when(F.col("lang") == "en", 500)
        .when(F.col("lang") == "zh", 800)
        .otherwise(250)
    )
    assert kept.filter(hash_bucket(salted) >= thr).count() == 0
    again = stratified_sample(
        docs.select("doc_id", "lang").repartition(7),
        "doc_id", "lang", fracs, default_fraction=0.25,
    )
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_stratified_sample_rejects_bad_fraction(spark, docs):
    from meteo_etl_spark.functions.sampling import stratified_sample

    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(docs, "doc_id", "lang", {"en": 1.5})


def test_pack_sequences_prefix_sum_and_budget(spark, docs):
    """offset is the exact running token count of predecessors within
    the shard; pack boundaries fall every `budget` tokens; the first
    doc of every shard starts at offset 0, pack 0."""
    from meteo_etl_spark.functions.packing import pack_sequences

    d = docs.select("doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens"))
    packed = pack_sequences(d, "doc_id", "n_tokens", "lang", budget=100).collect()
    by_lang: dict[str, list] = {}
    for r in sorted(packed, key=lambda r: (r.lang, r.doc_id)):
        by_lang.setdefault(r.lang, []).append(r)
    for rows in by_lang.values():
        run = 0
        for r in rows:
            assert r.offset == run
            assert r.pack_id == run // 100
            run += r.n_tokens
        assert rows[0].offset == 0 and rows[0].pack_id == 0


def test_pii_scrub_redacts_all_patterns(spark):
    from meteo_etl_spark.functions.text import pii_count, pii_scrub

    df = spark.createDataFrame(
        [(1, "mail me at a.b+c@ex-1.org or +12345678 from 192.168.0.1 ok")],
        "id int, t string",
    )
    row = df.select(
        pii_scrub(F.col("t")).alias("s"),
        pii_count(F.col("t"), "email").alias("e"),
        pii_count(F.col("t"), "phone").alias("p"),
        pii_count(F.col("t"), "ipv4").alias("i"),
    ).collect()[0]
    assert row.s == "mail me at <EMAIL> or <PHONE> from <IP> ok"
    assert (row.e, row.p, row.i) == (1, 1, 1)


def test_ngrams_keeps_duplicates_and_short_doc_empty(spark):
    from meteo_etl_spark.functions.text import ngrams

    df = spark.createDataFrame([(1, "a b a b a b"), (2, "a b")], "id int, t string")
    out = {
        r.id: r.g
        for r in df.select("id", F.split("t", " ").alias("w"))
        .select("id", ngrams("w").alias("g"))
        .collect()
    }
    assert out[1] == ["a b a", "b a b", "a b a", "b a b"]
    assert out[2] == []


def test_ivf_assignment_in_range_and_query_probes_two_lists(spark):
    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    lst = emb.select(
        sim.ivf_list_of(F.col("embedding").cast("array<double>")).alias("lst")
    )
    bounds = lst.agg(F.min("lst"), F.max("lst")).collect()[0]
    assert 1 <= bounds[0] and bounds[1] <= sim.IVF_LISTS
    with pytest.raises(ValueError, match="nprobe"):
        sim.ann_ivf_topk(emb, query_id=0, nprobe=3)


def test_embedding_pairs_blocked_equals_cross_join_and_no_nested_loop(spark):
    """The blocked equi-join pair enumeration must (a) produce exactly
    the cross-join pair set and (b) plan as a shuffled equi-join —
    no BroadcastNestedLoopJoin / CartesianProduct anywhere."""
    from meteo_etl_spark.functions import dedup as dd
    from meteo_etl_spark.functions.similarity import dot, norm

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    got = dd.embedding_cosine_pairs(emb)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    v = F.col("embedding").cast("array<double>")
    sided = emb.select(F.col("vec_id").alias("id"), v.alias("v"), norm(v).alias("nrm"))
    a = sided.select(F.col("id").alias("ia"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = sided.select(F.col("id").alias("ib"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    naive = (
        a.join(b, F.col("ia") < F.col("ib"))
        .select("ia", "ib", (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("c"))
        .filter(F.col("c") >= dd.COSINE_DUP_THRESHOLD)
    )
    exp = {(r.ia, r.ib, round(r.c, 4)) for r in naive.collect()}
    assert {(r.vec_a, r.vec_b, r.cos) for r in got.collect()} == exp


def test_decontaminate_flags_overlap_and_short_docs_clean(spark):
    from meteo_etl_spark.functions.dedup import decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # shares 3-shingles with eval
            (2, "completely different text here now"),
            (3, "too short"),                    # < k tokens: trivially clean
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox leaps")], "doc_id long, text string"
    )
    got = {r.id: r.n_overlap for r in decontaminate(train, ev).collect()}
    # "the quick brown" and "quick brown fox" overlap; "brown fox jumps" doesn't.
    assert got[1] == 2
    assert got[2] == 0
    assert got[3] == 0


def test_incremental_minhash_matches_full_lsh_cross_pairs(spark, docs, tmp_path):
    """Probing a new batch against the persisted corpus index must
    find exactly the cross-corpus pairs the full LSH run finds, and
    the probe plan must not re-shingle the corpus."""
    from meteo_etl_spark.functions.dedup import (
        build_minhash_index,
        incremental_minhash_pairs,
        minhash_lsh_pairs,
    )

    corpus = docs.filter(F.col("doc_id") < 250)
    batch = docs.filter(F.col("doc_id") >= 250)
    idx = str(tmp_path / "mh_index")
    build_minhash_index(corpus, idx)

    got = {
        (r.corpus_id, r.new_id, r.jaccard)
        for r in incremental_minhash_pairs(spark, batch, idx).collect()
    }
    full = minhash_lsh_pairs(docs).collect()
    expected = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in full
        if r.doc_a < 250 <= r.doc_b
    }
    assert got == expected
    assert len(os.listdir(os.path.join(idx, "bands"))) >= 1


def test_fuzzy_decontaminate_flags_near_dup_and_reports_short_docs(spark):
    """An exact copy of an eval doc must be flagged (all LSH bands
    collide, Jaccard 1.0); an unrelated doc and a sub-k-token doc are
    clean — and every training doc gets a row either way."""
    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        (1, base.strip()),          # train: exact copy of the eval doc
        (2, "completely different text about spark shuffles and joins"),
        (3, "too short"),           # < SHINGLE_K tokens: trivially clean
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    eval_docs = spark.createDataFrame(
        [(100, base.strip())], "doc_id long, text string"
    )
    out = {r.id: r for r in dd.fuzzy_decontaminate(docs, eval_docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].contaminated and out[1].n_matches == 1
    assert out[1].max_jaccard == 1.0
    assert not out[2].contaminated and out[2].max_jaccard == 0.0
    assert not out[3].contaminated and out[3].n_matches == 0


def test_fuzzy_decontaminate_is_subset_of_exact_overlap(spark):
    """Cross-operator invariant: a doc flagged by FUZZY decontamination
    (near-dup of an eval doc) necessarily shares at least one shingle
    with the eval corpus, so the exact-overlap op must report
    n_overlap > 0 for every fuzzy-contaminated doc."""
    from meteo_etl_spark.plans import queries as Q
    from tests.conftest import SF_SMALL

    fuzzy = {
        r.doc_id
        for r in Q.get("docs_fuzzy_decontaminate").fn(spark, SF_SMALL).collect()
        if r.contaminated
    }
    exact = {
        r.doc_id: r.n_overlap
        for r in Q.get("docs_decontaminate").fn(spark, SF_SMALL).collect()
    }
    assert fuzzy, "fixture should produce at least one contaminated doc"
    assert all(exact[d] > 0 for d in fuzzy)


def test_incremental_lsh_index_equals_full_rebuild(spark, tmp_path):
    """Append-only index growth: build on the first half of the corpus,
    append the second half — queries must return exactly what a full
    one-shot build returns, and the incremental layout must keep the
    same (table, bucket) partitioning."""
    import os

    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    cut = 1000
    inc = str(tmp_path / "inc_index")
    full = str(tmp_path / "full_index")
    sim.build_lsh_index(emb.filter(F.col("vec_id") < cut), inc)
    sim.append_lsh_index(emb.filter(F.col("vec_id") >= cut), inc)
    sim.build_lsh_index(emb, full)

    qv = emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    got = sim.query_lsh_index(spark, inc, qv, k=5, exclude_id=0)
    exp = sim.query_lsh_index(spark, full, qv, k=5, exclude_id=0)
    assert [r.asDict() for r in got.collect()] == [r.asDict() for r in exp.collect()]

    # identical partition directory set (layout parity with a rebuild)
    def parts(p):
        out = set()
        for t in os.listdir(p):
            if t.startswith("table="):
                for b in os.listdir(os.path.join(p, t)):
                    if b.startswith("bucket="):
                        out.add((t, b))
        return out

    assert parts(inc) == parts(full)


def test_streaming_online_dedup(spark, tmp_path):
    """Online ingestion e2e: build the index on a seed corpus, then
    stream two micro-batches of crawled docs through
    dedup_stream_foreach_batch — corpus dups drop, batch-internal dups
    drop, novel docs land AND join the index so the NEXT batch dedups
    against them."""
    import json

    from meteo_etl_spark.functions.dedup import (
        build_minhash_index,
        dedup_stream_foreach_batch,
    )

    idx = str(tmp_path / "index")
    out = str(tmp_path / "corpus")
    src = tmp_path / "feed"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    t_seed = "the quick brown fox jumps over the lazy dog today"
    t_a = "large scale data pipelines need deterministic reproducible sampling everywhere"
    t_b = "structured streaming applies incremental computation over unbounded event tables"
    t_c = "catalyst optimizes declarative plans into efficient physical execution stages"

    seed = spark.createDataFrame([(1, t_seed)], "doc_id long, text string")
    build_minhash_index(seed, idx)
    seed.write.parquet(out)

    def emit(fname, rows):
        (src / fname).write_text(
            "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in rows)
        )

    stats: list = []

    def run():
        stream = spark.readStream.schema("doc_id long, text string").json(str(src))
        q = (
            stream.writeStream.foreachBatch(
                dedup_stream_foreach_batch(spark, idx, out, stats=stats)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    emit("b0.json", [(10, t_seed), (11, t_a), (12, t_a), (13, t_b)])
    run()
    assert stats[-1] == {
        "batch_id": 0, "n_in": 4, "n_batch_dup": 1, "n_corpus_dup": 1, "n_kept": 2,
    }

    emit("b1.json", [(20, t_a), (21, t_c)])  # 20 dups a doc indexed in batch 0
    run()
    assert stats[-1]["n_corpus_dup"] == 1 and stats[-1]["n_kept"] == 1

    kept = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept == [1, 11, 13, 21]


def test_multiprobe_index_matches_inline_and_prunes(spark, tmp_path):
    """query_lsh_index(max_hamming=1) returns exactly the inline
    multi-probe result, and the probe list is still a literal
    partition filter (pruned scan)."""
    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    idx = str(tmp_path / "lsh_index")
    sim.build_lsh_index(emb, idx)

    qv = emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    got = sim.query_lsh_index(spark, idx, qv, k=5, exclude_id=0, max_hamming=1)
    exp = sim.ann_multiprobe_topk(emb, query_id=0, k=5, max_hamming=1)
    assert [r.asDict() for r in got.collect()] == [r.asDict() for r in exp.collect()]

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), "partition filter list is empty"

    # multiprobe candidates strictly contain the single-probe set
    # (k large enough that neither list is cap-truncated)
    big = emb.count()
    single = sim.query_lsh_index(spark, idx, qv, k=big, exclude_id=0)
    multi = sim.query_lsh_index(spark, idx, qv, k=big, exclude_id=0, max_hamming=1)
    s_ids = {r.vec_id for r in single.collect()}
    m_ids = {r.vec_id for r in multi.collect()}
    assert s_ids <= m_ids and len(m_ids) > len(s_ids)


def test_token_budget_sample_prefix_exact_and_layout_invariant(spark, docs):
    """The distributed prefix sum must equal the naive global running
    sum (same keep set, same cumulative values) and must not depend on
    the input partition layout."""
    from meteo_etl_spark.functions.sampling import token_budget_sample

    d = docs.select("doc_id", tx.token_count(F.col("text")).alias("n_tok"))
    budget = 9_000
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in token_budget_sample(d, "doc_id", "n_tok", budget).collect()
    }
    # naive oracle: sort the whole frame by (md5, id) on the driver
    rows = d.withColumn("hh", F.md5(F.col("doc_id").cast("string"))).collect()
    rows.sort(key=lambda r: (r["hh"], r["doc_id"]))
    cum, want = 0, {}
    for r in rows:
        cum += r["n_tok"]
        if cum <= budget:
            want[r["doc_id"]] = cum
    assert got == want and got  # non-empty at this budget
    relaid = token_budget_sample(
        d.repartition(13), "doc_id", "n_tok", budget
    ).collect()
    assert {r["doc_id"]: r["cum_tokens"] for r in relaid} == want


def test_token_budget_sample_edges(spark, docs):
    from meteo_etl_spark.functions.sampling import token_budget_sample

    d = docs.select("doc_id", tx.token_count(F.col("text")).alias("n_tok"))
    assert token_budget_sample(d, "doc_id", "n_tok", 0).count() == 0
    total = d.agg(F.sum("n_tok")).collect()[0][0]
    assert token_budget_sample(d, "doc_id", "n_tok", total).count() == d.count()
    with pytest.raises(ValueError):
        token_budget_sample(d, "doc_id", "n_tok", -1)


def _ref_waterfill(pairs, frac_permille):
    """Independent driver-side water-fill: sort ascending, walk for
    the first pivot whose candidate level fits, cap everything from
    the pivot on. Same integer budget and single-division level as
    the operator."""
    total = sum(w for _, w in pairs)
    n = len(pairs)
    budget = total * frac_permille // 1000
    s = sorted(pairs, key=lambda kv: (kv[1], kv[0]))
    pfx, piv, lam = 0, None, None
    for i, (_, w) in enumerate(s, 1):
        cand = (budget - pfx) / (n - i + 1)
        if cand <= w:
            piv, lam = i, cand
            break
        pfx += w
    out = {}
    for i, (k, w) in enumerate(s, 1):
        if piv is not None and i >= piv:
            out[k] = (lam, 1)
        else:
            out[k] = (float(w), 0)
    return out, budget


def test_waterfill_matches_reference_and_conserves_budget(spark):
    from meteo_etl_spark.functions.sampling import waterfill_allocation

    pairs = [("a", 100), ("b", 7), ("c", 900), ("d", 250), ("e", 3)]
    df = spark.createDataFrame(pairs, "source string, n_tokens long")
    got = {
        r["key"]: (r["alloc"], r["capped"])
        for r in waterfill_allocation(df, "source", "n_tokens").collect()
    }
    want, budget = _ref_waterfill(pairs, 500)
    assert got == want
    # capping engaged: the allocation exhausts the budget exactly (one
    # IEEE division times an integer count — tolerance is ulp-level)
    assert abs(sum(a for a, _ in got.values()) - budget) < 1e-6
    # every capped source shares the SAME level; every uncapped one
    # ships whole and sits below the level
    levels = {a for a, c in got.values() if c}
    assert len(levels) == 1
    lam = levels.pop()
    for (alloc, capped), (_, w) in zip(
        (got[k] for k, _ in pairs), pairs
    ):
        if not capped:
            assert alloc == float(w) and w <= lam
    # partition invariance
    relaid = {
        r["key"]: (r["alloc"], r["capped"])
        for r in waterfill_allocation(
            df.repartition(7), "source", "n_tokens"
        ).collect()
    }
    assert relaid == got


def test_waterfill_fractional_weights_keep_budget_contract(spark):
    """r13 advice: a DOUBLE weight column must not desync the budget
    (raw sum) from the prefix sums (per-row casts) — both now run on
    the same per-row long truncation, so Σ alloc = B still holds and
    the result equals the integer-weight run on the truncated values."""
    from meteo_etl_spark.functions.sampling import waterfill_allocation

    frac = [("a", 100.9), ("b", 7.2), ("c", 900.5), ("d", 250.99), ("e", 3.1)]
    df = spark.createDataFrame(frac, "source string, n_tokens double")
    got = {
        r["key"]: (r["alloc"], r["capped"])
        for r in waterfill_allocation(df, "source", "n_tokens").collect()
    }
    want, budget = _ref_waterfill(
        [(k, int(v)) for k, v in frac], 500
    )
    assert got == want
    assert abs(sum(a for a, _ in got.values()) - budget) < 1e-6


def test_waterfill_edges(spark):
    from meteo_etl_spark.functions.sampling import waterfill_allocation

    # budget == total: every source ships its whole mass
    df = spark.createDataFrame(
        [("a", 10), ("b", 30)], "source string, n_tokens long"
    )
    full = {
        r["key"]: r["alloc"]
        for r in waterfill_allocation(
            df, "source", "n_tokens", budget_frac_permille=1000
        ).collect()
    }
    assert full == {"a": 10.0, "b": 30.0}
    # single source: capped at exactly the budget
    one = spark.createDataFrame([("x", 1000)], "source string, n_tokens long")
    row = waterfill_allocation(one, "source", "n_tokens").collect()[0]
    assert (row["alloc"], row["capped"]) == (500.0, 1)
    # equal weights: level is the common share, everyone capped at it
    eq = spark.createDataFrame(
        [("a", 100), ("b", 100), ("c", 100), ("d", 100)],
        "source string, n_tokens long",
    )
    rows = waterfill_allocation(eq, "source", "n_tokens").collect()
    assert all(r["alloc"] == 50.0 and r["capped"] == 1 for r in rows)


def test_chunk_keep_text_matches_hash_and_default_omits_text(spark, docs):
    from meteo_etl_spark.functions.packing import chunk_token_windows

    plain = chunk_token_windows(docs)
    assert "chunk_text" not in plain.columns
    with_text = chunk_token_windows(docs, keep_text=True).limit(200)
    bad = with_text.filter(
        F.md5(F.col("chunk_text").cast("binary")) != F.col("chunk_hash")
    ).count()
    assert bad == 0


def test_deep_lsh_recall_and_selectivity_on_clustered_corpus(spark):
    """On a corpus WITH neighbor structure (real-encoder-like:
    within-cluster cosine ~0.98) the deep-bucket LSH_DEEP_* shape
    (4x12, Hamming<=1) must deliver recall AND selectivity together —
    unlike the near-random testdata embeddings, where >=0.9 recall
    costs ~60% candidate fraction under any config (R8_NEWOPS.md).
    Pins that the cost there is a property of the corpus, not a defect
    of the machinery."""
    import numpy as np

    from meteo_etl_spark.functions import similarity as sim

    rng = np.random.default_rng(7)
    n_clusters, per, dim = 24, 25, sim.EMBEDDING_DIM
    centers = rng.standard_normal((n_clusters, dim))
    pts = np.repeat(centers, per, axis=0) + 0.15 * rng.standard_normal(
        (n_clusters * per, dim)
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(len(pts))],
        "vec_id long, embedding array<float>",
    )
    rec = sim.ann_recall(
        emb,
        n_queries=10,
        k=5,
        max_hamming=sim.LSH_DEEP_HAMMING,
        n_tables=sim.LSH_DEEP_TABLES,
        n_planes=sim.LSH_DEEP_PLANES,
    ).collect()
    mean_recall = sum(r["recall"] for r in rec) / len(rec)
    assert mean_recall >= 0.95, rec
    # candidate fraction, computed test-side from the SAME deterministic
    # hyperplanes: OR over tables of (Hamming <= h) bucket matches
    cand = np.zeros((len(pts), len(pts)), dtype=bool)
    for t in range(sim.LSH_DEEP_TABLES):
        planes = np.array(
            [sim.hyperplane(t, p) for p in range(sim.LSH_DEEP_PLANES)]
        )
        bits = (pts @ planes.T) > 0
        ham = (bits[:, None, :] != bits[None, :, :]).sum(axis=2)
        cand |= ham <= sim.LSH_DEEP_HAMMING
    np.fill_diagonal(cand, False)
    frac = cand.mean()
    assert frac < 0.08, f"clustered corpus should be selective, got {frac:.3f}"
    # the same tuned recall-first route used on the testdata corpus is
    # near-perfect here too (recall is never the deep shape's trade)
    rec2 = sim.ann_recall(
        emb,
        n_queries=10,
        k=5,
        max_hamming=sim.LSH_TUNED_HAMMING,
        n_tables=sim.LSH_TUNED_TABLES,
        n_planes=sim.LSH_TUNED_PLANES,
    ).collect()
    assert sum(r["recall"] for r in rec2) / len(rec2) >= 0.95, rec2


def _clustered_embeddings(spark, *, str_ids=False):
    """Real-encoder-like corpus (24 tight clusters) — the fixture the
    deep-bucket selectivity test above measures. ``str_ids`` remaps
    ids to non-dense strings to pin that the audit panel never
    assumes dense integers from 0."""
    import numpy as np

    from meteo_etl_spark.functions import similarity as sim

    rng = np.random.default_rng(7)
    n_clusters, per, dim = 24, 25, sim.EMBEDDING_DIM
    centers = rng.standard_normal((n_clusters, dim))
    pts = np.repeat(centers, per, axis=0) + 0.15 * rng.standard_normal(
        (n_clusters * per, dim)
    )
    if str_ids:
        rows = [(f"v{i * 7 + 3:05d}", [float(x) for x in pts[i]]) for i in range(len(pts))]
        return spark.createDataFrame(
            rows, "vec_id string, embedding array<float>"
        )
    return spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(len(pts))],
        "vec_id long, embedding array<float>",
    )


def test_route_choice_falls_back_to_ivf_on_unstructured_corpus(spark):
    """On the near-random testdata embeddings no sign-LSH shape is
    both accurate and selective (>=0.9 recall costs ~60% candidates —
    R8_NEWOPS.md grid) and IVF's 2/8-list probe admits ~25% > the 20%
    gate: NOTHING qualifies, so the decision table must certify the
    bounded-probe ivf FALLBACK as chosen."""
    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    rows = {r["route"]: r for r in sim.ann_route_decision_table(emb).collect()}
    assert set(rows) == set(sim.ANN_ROUTES)
    assert not any(r["qualifies"] for r in rows.values()), rows
    assert rows["ivf"]["chosen"] and not rows["lsh_deep"]["chosen"], rows
    assert not rows["lsh_tuned"]["chosen"], rows
    # evidence columns reconcile: recall/cand_frac derive from the
    # integer counters, pairs is corpus-wide and route-invariant
    pairs = {r["pairs"] for r in rows.values()}
    assert len(pairs) == 1 and pairs.pop() > 0


def test_route_choice_picks_deep_lsh_on_clustered_corpus(spark):
    """On a corpus WITH neighbor structure the deep-bucket shape
    delivers recall AND selectivity together (see the deep-LSH test
    above: recall ~0.998 at ~6% candidates), qualifies, and must WIN
    the decision — the audit's whole point: route choice is a
    per-corpus measurement, not a default."""
    from meteo_etl_spark.functions import similarity as sim

    emb = _clustered_embeddings(spark)
    rows = {r["route"]: r for r in sim.ann_route_decision_table(emb).collect()}
    deep = rows["lsh_deep"]
    assert deep["qualifies"] and deep["chosen"], rows
    assert sum(1 for r in rows.values() if r["chosen"]) == 1
    assert deep["recall"] >= 0.9 and deep["cand_frac"] <= 0.2, rows


def test_route_audit_handles_string_ids_and_tiny_corpora(spark):
    """ADVICE r9: the audit panel must not assume dense integer ids.
    String-keyed corpus → same decision as the integer-keyed twin;
    1-row corpus (every pair joined away) → honest zero counters and
    the ivf fallback, never a TypeError/ZeroDivision."""
    from meteo_etl_spark.functions import similarity as sim

    rows_str = {
        r["route"]: r
        for r in sim.ann_route_decision_table(
            _clustered_embeddings(spark, str_ids=True)
        ).collect()
    }
    assert rows_str["lsh_deep"]["chosen"], rows_str
    one = _clustered_embeddings(spark).limit(1)
    audit = sim.ann_route_audit(one)
    assert all(r["pairs"] == 0 and r["n_hit"] == 0 for r in audit)
    assert sim.choose_ann_route(audit) == "ivf"
    tiny = {r["route"]: r for r in sim.ann_route_decision_table(one).collect()}
    assert tiny["ivf"]["chosen"] and tiny["ivf"]["cand_frac"] == 0.0


def test_bucket_paths_are_bit_identical(spark):
    """The three bucket/probe implementations — engine expression
    (_bucket / ivf_list_of), Arrow kernel (_project_ann_arrow), and
    driver-side Python twins (_bucket_py / _ivf_probes_py) — must
    agree bit-for-bit on every vector, including sign decisions at
    exactly 0.0 (strict > 0 => '0' everywhere)."""
    import numpy as np
    from pyspark.sql import functions as F

    from meteo_etl_spark.functions import similarity as sim

    rng = np.random.default_rng(7)
    vecs = [
        [float(x) for x in rng.normal(size=sim.EMBEDDING_DIM)] for _ in range(50)
    ]
    # adversarial: the all-zero vector makes every projection exactly
    # 0.0 — strict '> 0' must yield all-'0' buckets on every path
    vecs.append([0.0] * sim.EMBEDDING_DIM)
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id bigint, embedding array<double>"
    )
    specs = [(f"bt{t}", t, sim.LSH_TUNED_PLANES) for t in range(sim.LSH_TUNED_TABLES)]

    v = F.col("embedding").cast("array<double>")
    expr = {
        r["vec_id"]: (
            [r[f"bt{t}"] for t in range(sim.LSH_TUNED_TABLES)],
            r["lst"],
        )
        for r in emb.select(
            "vec_id",
            *[sim._bucket(v, t, sim.LSH_TUNED_PLANES).alias(f"bt{t}")
              for t in range(sim.LSH_TUNED_TABLES)],
            sim.ivf_list_of(v).alias("lst"),
        ).collect()
    }
    arrow = {
        r["vec_id"]: (
            [r[f"bt{t}"] for t in range(sim.LSH_TUNED_TABLES)],
            r["lst"],
        )
        for r in sim._project_ann_arrow(
            emb,
            id_col="vec_id",
            vec_col="embedding",
            bucket_specs=specs,
            with_ivf="lst",
        ).collect()
    }
    assert expr == arrow
    for i, vec in enumerate(vecs):
        py_buckets = [
            sim._bucket_py(vec, t, sim.LSH_TUNED_PLANES)
            for t in range(sim.LSH_TUNED_TABLES)
        ]
        p1, _ = sim._ivf_probes_py(vec)
        assert (py_buckets, p1) == expr[i], f"vec {i}"
    zero = expr[len(vecs) - 1][0]
    assert all(set(b) == {"0"} for b in zero)


def test_route_choice_drives_persisted_serving_end_to_end(spark, tmp_path):
    """r10 verdict order #3: close the ANN loop. audit -> choose ->
    build the CHOSEN persisted index -> serve top-k from it with the
    scan partition-pruned (PartitionFilters asserted in-plan), on both
    pinned fixtures: the near-random corpus (ivf fallback, served from
    the lst-partitioned inverted file) and the clustered corpus
    (lsh_deep, served from the deep-shape bucket index)."""
    import re

    from meteo_etl_spark.functions import similarity as sim

    def serve(emb, expected_route, tag):
        route = sim.choose_ann_route(sim.ann_route_audit(emb))
        assert route == expected_route, route
        idx = str(tmp_path / f"idx_{tag}")
        sim.build_ann_index(route, emb, idx)
        row0 = emb.orderBy("vec_id").limit(1).collect()[0]
        qv = [float(x) for x in row0.embedding]
        # the ivf side serves at the PARITY depth here (the in-memory
        # twin below is the fixed two-probe route); the tuned default
        # stamped by the build is asserted separately
        if route == "ivf":
            meta = sim._read_ann_meta(spark, idx)
            assert meta["nprobe_default"] >= 1
            assert (
                meta["nprobe_tuning"]["min_recall_at_default"]
                >= sim.IVF_RECALL_TARGET
            )
        got = sim.query_ann_index(
            route, spark, idx, qv, k=5, exclude_id=row0.vec_id,
            nprobe=sim.IVF_NPROBE if route == "ivf" else None,
        )
        rows = got.collect()
        assert len(rows) == 5
        plan = got._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and m.group(1).strip(), (
            f"{route} serve is not partition-pruned:\n{plan}"
        )
        return rows

    # near-random corpus: nothing qualifies -> bounded-probe ivf; the
    # persisted serve must equal the in-memory ivf twin exactly
    emb_r = load_table(spark, SF_SMALL, "embeddings")
    rows_r = serve(emb_r, "ivf", "ivf")
    exp = sim.ann_ivf_topk(emb_r, query_id=0, k=5)
    assert [r.asDict() for r in rows_r] == [
        r.asDict() for r in exp.collect()
    ]

    # clustered corpus: deep LSH qualifies and wins; the deep-index
    # serve must recover the exact top-5 at high recall
    emb_c = _clustered_embeddings(spark)
    rows_c = serve(emb_c, "lsh_deep", "deep")
    truth = {
        r.vec_id
        for r in sim.brute_force_topk(emb_c, query_id=0, k=5).collect()
    }
    assert len({r.vec_id for r in rows_c} & truth) >= 4, (rows_c, truth)


def test_build_and_query_ann_index_reject_unknown_routes(spark, tmp_path):
    import pytest

    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    with pytest.raises(ValueError, match="unknown ANN route"):
        sim.build_ann_index("brute", emb, str(tmp_path / "x"))
    with pytest.raises(ValueError, match="unknown ANN route"):
        sim.query_ann_index("nope", spark, str(tmp_path / "x"), [0.0] * 8)


def test_ann_index_meta_guards_shape_mismatch(spark, tmp_path):
    """ADVICE r11: the persisted index carries its build shape in an
    _ann_meta.json sidecar; a query (or append) issued with a
    mismatched shape computes wrong buckets, so it must fail LOUDLY —
    only legacy indexes without the sidecar skip the check."""
    import os

    import pytest

    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    idx = str(tmp_path / "idx_tuned")
    sim.build_ann_index("lsh_tuned", emb, idx)
    qv = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0].embedding]

    # right shape serves; wrong shape (deep params vs tuned index) raises
    assert sim.query_ann_index("lsh_tuned", spark, idx, qv, k=3).count() == 3
    with pytest.raises(ValueError, match="different shape"):
        sim.query_ann_index("lsh_deep", spark, idx, qv, k=3)
    with pytest.raises(ValueError, match="different shape"):
        sim.query_lsh_index(spark, idx, qv, n_tables=2, n_planes=4)
    # an IVF query against an LSH index is a kind mismatch, same guard
    with pytest.raises(ValueError, match="different shape"):
        sim.query_ivf_index(spark, idx, qv)
    # a mismatched append fails BEFORE writing any wrongly-bucketed rows
    with pytest.raises(ValueError, match="different shape"):
        sim.append_lsh_index(
            emb.limit(1), idx, n_tables=2, n_planes=4
        )

    # IVF index: same discipline in the other direction
    ivf = str(tmp_path / "idx_ivf")
    sim.build_ann_index("ivf", emb, ivf)
    assert sim.query_ann_index("ivf", spark, ivf, qv, k=3).count() == 3
    with pytest.raises(ValueError, match="different shape"):
        sim.query_ann_index("lsh_tuned", spark, ivf, qv, k=3)

    # legacy index (no sidecar): validation skips, caller owns the shape
    os.unlink(os.path.join(idx, sim._ANN_META))
    assert (
        sim.query_ann_index("lsh_tuned", spark, idx, qv, k=3).count() == 3
    )
    # an append to a legacy index must NOT stamp a sidecar: the
    # append's parameters are an unverifiable claim about the original
    # build — stamping a wrong one would fail every correctly-shaped
    # query thereafter (r12 self-review)
    sim.append_lsh_index(
        spark.createDataFrame(
            [(999_999, qv)], "vec_id long, embedding array<double>"
        ),
        idx,
        n_tables=sim.LSH_TUNED_TABLES,
        n_planes=sim.LSH_TUNED_PLANES,
    )
    assert sim._read_ann_meta(spark, idx) is None


def test_trained_pq_codebook_honest_comparison(spark):
    """Per-subspace k-means PQ training (the faiss-standard path) is
    implemented, deterministic, and drop-in for pq_recall_table — and
    on the cosine metric it does NOT beat the sampled codebook on the
    clustered fixture (Lloyd's averaging shrinks reconstructions
    toward the subspace mean; sampled codes are near actual cluster
    members). Pin the measured direction so the docstring's honest
    negative result stays true-or-flagged."""
    from meteo_etl_spark.functions import similarity as sim

    emb = _clustered_embeddings(spark)
    kw = dict(n_sub=8, sub_dim=8, n_codes=32)
    sampled = sim.sampled_pq_codebook(emb, **kw)
    trained = sim.trained_pq_codebook(emb, iters=3, **kw)
    # deterministic: both builders reproduce exactly
    assert trained == sim.trained_pq_codebook(emb, iters=3, **kw)
    assert len(trained) == 8 and all(len(m) == 32 for m in trained)

    def adc(codes):
        rows = sim.pq_recall_table(
            emb, codes, n_queries=10, k=5, n_cand=50
        ).collect()
        return sum(r["n_hit_adc"] for r in rows), sum(
            r["n_hit_rerank"] for r in rows
        )

    s_adc, s_rr = adc(sampled)
    t_adc, t_rr = adc(trained)
    assert s_adc >= t_adc, (s_adc, t_adc)
    assert s_adc >= 45, s_adc  # sampled codes near cluster members
    # the exact re-rank recovers full recall under EITHER codebook on
    # structured data — the candidate-scan + re-rank shape is what
    # carries the serving path, not the raw ADC ranking
    assert s_rr == t_rr == 50, (s_rr, t_rr)


def test_ivfpq_index_mechanics_and_encode_parity(spark, tmp_path):
    """IVF-PQ serving mechanics (the result values are hash-certified
    by the sim_ann_serve_ivfpq oracle): codes-only storage, meta
    kind/shape guards in both directions, re-rank against the primary
    store, and bit-identical code ids from the expression and Arrow
    encoders."""
    import pytest
    from pyspark.sql import functions as F

    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    idx = str(tmp_path / "ivfpq")
    sim.build_ivfpq_index(emb, idx, n_sub=8, sub_dim=8, n_codes=32)

    # the index holds code ids and the routing key — never the vectors
    # (batch is the ingest-growth partition; the seed build is batch=0)
    stored = spark.read.parquet(idx)
    assert set(stored.columns) == {"vec_id", "codes", "lst", "batch"}
    n = stored.count()
    assert n == emb.count()
    meta = sim._read_ann_meta(spark, idx)
    assert meta["kind"] == "ivfpq" and len(meta["codebook"]) == 8

    qv = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0].embedding]
    got = sim.query_ivfpq_index(
        spark, idx, qv, emb, k=5, n_cand=50, exclude_id=0
    ).collect()
    assert len(got) == 5
    # exact re-rank from the primary store: with n_cand covering most
    # of the probed lists, the served top-1 matches brute force often;
    # assert the weaker, always-true contract — every served sim is a
    # genuine exact cosine of a real corpus vector (spot-check top-1)
    top1 = got[0]
    brute = {
        r.vec_id: r.sim
        for r in sim.brute_force_topk(emb, query_id=0, k=50).collect()
    }
    assert top1.vec_id in brute and brute[top1.vec_id] == top1.sim

    # kind guards, both directions
    with pytest.raises(ValueError, match="different shape"):
        sim.query_ivf_index(spark, idx, qv)
    ivf = str(tmp_path / "ivf")
    sim.build_ivf_index(emb, ivf)
    with pytest.raises(ValueError, match="no IVF-PQ index"):
        sim.query_ivfpq_index(spark, ivf, qv, emb)

    # the format is codebook-agnostic: a spherical (data-trained)
    # codebook builds and serves through the identical index/meta/query
    # path; a mis-shaped codebook fails loudly before writing
    emb_c = _clustered_embeddings(spark)
    sph = sim.spherical_pq_codebook(emb_c, n_sub=8, sub_dim=8, n_codes=32)
    idx_s = str(tmp_path / "ivfpq_sph")
    sim.build_ivfpq_index(
        emb_c, idx_s, n_sub=8, sub_dim=8, n_codes=32, codebook=sph
    )
    qv_c = [
        float(x)
        for x in emb_c.orderBy("vec_id").limit(1).collect()[0].embedding
    ]
    assert (
        sim.query_ivfpq_index(
            spark, idx_s, qv_c, emb_c, k=5, n_cand=50, exclude_id=0
        ).count()
        == 5
    )
    with pytest.raises(ValueError, match="codebook shape"):
        sim.build_ivfpq_index(
            emb_c, idx_s, n_sub=4, sub_dim=8, n_codes=32, codebook=sph
        )

    # expression and Arrow encoders agree on every code id
    codes = sim.sampled_pq_codebook(emb, n_sub=8, sub_dim=8, n_codes=32)
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    via_expr = {
        r["vec_id"]: list(r["c"])
        for r in base.select(
            "vec_id", sim.pq_encode(F.col("v"), codes).alias("c")
        ).collect()
    }
    via_arrow = {
        r["vec_id"]: list(r["codes"])
        for r in sim._pq_encode_arrow(base, codes).select(
            "vec_id", "codes"
        ).collect()
    }
    assert via_expr == via_arrow


def test_spherical_pq_codebook_flips_the_cosine_direction(spark):
    """r12 verdict order #4: the documented remedy for the r11 honest
    negative result. Spherical k-means (unit-norm centroids, integer-
    quantized member sums) removes the reconstruction-norm channel
    Lloyd's averaging corrupts: every reconstruction is a concat of
    unit chunks with identical norm sqrt(n_sub), so ADC cosine ranks
    purely by direction. On a CROSS-CLUSTER query panel (one query per
    cluster — the corpus-wide audit, not the lowest-id panel whose
    neighborhood the sampled codes memorize by construction) the
    direction flips: spherical > sampled AND spherical > Lloyd. All
    quantities here are deterministic (seeded fixture, integer member
    sums, first-min tie order), so the pin is exact."""
    from pyspark.sql import functions as F

    from meteo_etl_spark.functions import similarity as sim

    emb = _clustered_embeddings(spark)
    kw = dict(n_sub=8, sub_dim=8, n_codes=32)
    spherical = sim.spherical_pq_codebook(emb, iters=3, **kw)
    # deterministic: the builder reproduces exactly
    assert spherical == sim.spherical_pq_codebook(emb, iters=3, **kw)
    # every centroid is unit-norm -> every reconstruction norm is
    # exactly sqrt(n_sub): the property that makes ADC rank by
    # direction alone (and makes argmin-L2 encoding == argmax-dot)
    for m, cm in enumerate(spherical):
        assert len(cm) == 32
        for c in cm:
            assert abs(sum(x * x for x in c) - 1.0) < 1e-9, (m, c)

    # one query per cluster: ids 0, 25, ..., 225
    rows = (
        emb.filter(F.col("vec_id").isin([25 * j for j in range(10)]))
        .orderBy("vec_id")
        .collect()
    )
    panel = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in rows]

    def adc(codes):
        t = sim.pq_recall_table(
            emb, codes, n_queries=10, k=5, n_cand=50, panel_rows=panel
        ).collect()
        return sum(r["n_hit_adc"] for r in t), sum(r["n_hit_rerank"] for r in t)

    s_adc, s_rr = adc(sim.sampled_pq_codebook(emb, **kw))
    l_adc, l_rr = adc(sim.trained_pq_codebook(emb, iters=3, **kw))
    p_adc, p_rr = adc(spherical)
    assert p_adc > s_adc, (p_adc, s_adc)
    assert p_adc > l_adc, (p_adc, l_adc)
    # exact re-rank still recovers full recall under every codebook —
    # the candidate-scan + re-rank shape carries the serving path
    assert s_rr == l_rr == p_rr == 50, (s_rr, l_rr, p_rr)


def test_spherical_codebook_served_recall_beats_sampled(spark, tmp_path):
    """r12 verdict order #7: the spherical direction-flip must carry
    through the PERSISTED IVF-PQ serve path end-to-end, not just the
    in-memory pq_recall_table audit — build_ivfpq_index(codebook=
    spherical_pq_codebook(...)) then query_ivfpq_index, recall@5 on
    the cross-cluster panel >= the sampled codebook's through the
    identical index layout, routing, and re-rank. n_cand=10 keeps the
    ADC shortlist the bottleneck (at n_cand=50 exact re-rank recovers
    either codebook — measured 48/48), so the pin isolates codebook
    quality as served. Deterministic fixture + codebooks -> the
    measured gap (26 > 20 of 50) is exact."""
    from pyspark.sql import functions as F

    from meteo_etl_spark.functions import similarity as sim

    emb = _clustered_embeddings(spark)
    kw = dict(n_sub=8, sub_dim=8, n_codes=32)
    paths = {}
    for name, codes in (
        ("sampled", sim.sampled_pq_codebook(emb, **kw)),
        ("spherical", sim.spherical_pq_codebook(emb, iters=3, **kw)),
    ):
        paths[name] = str(tmp_path / name)
        sim.build_ivfpq_index(emb, paths[name], codebook=codes, **kw)

    panel = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.filter(
            F.col("vec_id").isin([25 * j for j in range(10)])
        )
        .orderBy("vec_id")
        .collect()
    ]
    hits = {}
    for name, path in paths.items():
        h = 0
        for qid, qv in panel:
            true5 = {
                r.vec_id
                for r in sim.brute_force_topk(emb, query_id=qid, k=5).collect()
            }
            got = {
                r.vec_id
                for r in sim.query_ivfpq_index(
                    spark, path, qv, emb, k=5, n_cand=10, exclude_id=qid
                ).collect()
            }
            h += len(true5 & got)
        hits[name] = h
    assert hits["spherical"] > hits["sampled"], hits
    assert hits["spherical"] >= 25, hits  # half the panel's 50 slots


def test_pq_reconstruct_paths_are_bit_identical(spark):
    """The Arrow PQ-encode kernel must reproduce the expression path
    BIT-exactly (same sequential IEEE fold order, same first-min tie
    order) — the same parity discipline as the ANN bucket kernel."""
    from pyspark.sql import functions as F

    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    codes = sim.sampled_pq_codebook(emb, n_sub=8, sub_dim=8, n_codes=32)
    v = F.col("embedding").cast("array<double>")
    base = emb.select(F.col("vec_id"), v.alias("v"))
    expr = base.select(
        "vec_id", sim.pq_reconstruct(F.col("v"), codes).alias("r")
    )
    arrow = sim._pq_reconstruct_arrow(base, codes).select("vec_id", "r")
    a = {r["vec_id"]: tuple(r["r"]) for r in expr.collect()}
    b = {r["vec_id"]: tuple(r["r"]) for r in arrow.collect()}
    assert a == b  # exact float equality, every vector
    # and the audit table itself is identical through either path
    got = sim.pq_recall_table(emb, codes, n_queries=5, k=5, n_cand=20)
    rows_arrow = [r.asDict() for r in got.collect()]
    sim_threshold = sim.PQ_ARROW_MIN_FOLDS
    try:
        sim.PQ_ARROW_MIN_FOLDS = 10**9  # force the expression path
        rows_expr = [
            r.asDict()
            for r in sim.pq_recall_table(
                emb, codes, n_queries=5, k=5, n_cand=20
            ).collect()
        ]
    finally:
        sim.PQ_ARROW_MIN_FOLDS = sim_threshold
    assert rows_arrow == rows_expr


def test_spherical_codebook_rejects_undersized_corpus(spark):
    """r12 self-review: fewer corpus vectors than n_codes must be a
    clear ValueError up front, not an IndexError mid-training."""
    import pytest

    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings").limit(20)
    with pytest.raises(ValueError, match="n_codes"):
        sim.spherical_pq_codebook(emb, n_sub=8, sub_dim=8, n_codes=32)


def test_trained_ivf_index_beats_fixed_centroids_on_clustered(spark, tmp_path):
    """build_ivf_index(centroids=trained_ivf_centroids(...)) — the
    sim_ann_ivf promise 'swap the centroid literals for k-means output
    without touching the plan'. On the clustered fixture, k-means
    centroids route same-cluster vectors into the same list, so an
    nprobe=2 query recovers (strictly) more of the exact top-5 than
    the fixed md5-seeded quantizer; the query probes the centroids
    STORED in the sidecar, stays partition-pruned, and a plain-ivf
    shape mismatch still fails loudly."""
    import re

    import pytest
    from pyspark.sql import functions as F

    from meteo_etl_spark.functions import similarity as sim
    from meteo_etl_spark.functions.clustering import trained_ivf_centroids

    emb = _clustered_embeddings(spark)
    fixed_idx = str(tmp_path / "ivf_fixed")
    trained_idx = str(tmp_path / "ivf_trained")
    sim.build_ivf_index(emb, fixed_idx)
    cents = trained_ivf_centroids(emb, k=24, iters=3)
    sim.build_ivf_index(emb, trained_idx, centroids=cents)
    meta = sim._read_ann_meta(spark, trained_idx)
    assert meta["n_lists"] == 24 and len(meta["centroids"]) == 24

    def recall(idx, qid):
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qid).collect()[0].embedding
        ]
        got = sim.query_ivf_index(spark, idx, qv, k=5, exclude_id=qid)
        plan = got._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and m.group(1).strip(), f"{idx} not partition-pruned"
        truth = {
            r.vec_id
            for r in sim.brute_force_topk(emb, query_id=qid, k=5).collect()
        }
        return len({r.vec_id for r in got.collect()} & truth)

    qids = [25 * j for j in range(8)]  # one query per cluster
    r_fixed = sum(recall(fixed_idx, q) for q in qids)
    r_trained = sum(recall(trained_idx, q) for q in qids)
    assert r_trained > r_fixed, (r_trained, r_fixed)
    assert r_trained >= 0.9 * 5 * len(qids), (r_trained, r_fixed)

    # kind/shape discipline still holds against the trained index
    with pytest.raises(ValueError, match="no IVF-PQ index"):
        sim.query_ivfpq_index(spark, trained_idx, [0.0] * 64, emb)


def test_lsh_streaming_ingest_is_redelivery_idempotent(spark, tmp_path):
    """Streaming ANN ingestion (r12): micro-batches land under
    batch=<id>/table/bucket with an up-front delete + append, so (1) a
    query over the grown index equals the same query over a one-shot
    batch build of the union, (2) an at-least-once REDELIVERY replaces
    its own partition subtree — identical results, no duplicated
    vectors — where plain append_lsh_index would double them, and (3)
    a later batch with a different shape fails loudly before writing."""
    import json

    import pytest
    from pyspark.sql import functions as F

    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    idx = str(tmp_path / "stream_idx")
    src = tmp_path / "feed"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    handler = sim.lsh_ingest_foreach_batch(spark, idx)

    waves = [
        emb.filter(F.col("vec_id") % 2 == w).select("vec_id", "embedding")
        for w in range(2)
    ]

    def emit(w):
        rows = waves[w].collect()
        (src / f"w{w}.json").write_text(
            "\n".join(
                json.dumps(
                    {"vec_id": r.vec_id, "embedding": [float(x) for x in r.embedding]}
                )
                for r in rows
            )
        )

    def run():
        stream = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).json(str(src))
        q = (
            stream.writeStream.foreachBatch(handler)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for w in range(2):
        emit(w)
        run()

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0].embedding]

    def topk(path):
        return [
            r.asDict()
            for r in sim.query_lsh_index(
                spark, path, qv, k=5, exclude_id=0
            ).collect()
        ]

    batch_idx = str(tmp_path / "batch_idx")
    sim.build_lsh_index(emb, batch_idx)
    got = topk(idx)
    assert got == topk(batch_idx)
    n_rows = spark.read.parquet(idx).count()
    assert n_rows == emb.count() * sim.LSH_TABLES

    # redelivery of wave 1 replaces its own subtree — nothing doubles
    handler(waves[1], 1)
    assert spark.read.parquet(idx).count() == n_rows
    assert topk(idx) == got

    # a wrong-shape later batch fails loudly before writing
    bad = sim.lsh_ingest_foreach_batch(
        spark, idx, n_tables=sim.LSH_TUNED_TABLES, n_planes=sim.LSH_TUNED_PLANES
    )
    with pytest.raises(ValueError, match="different shape"):
        bad(waves[0], 2)
    assert spark.read.parquet(idx).count() == n_rows


def test_compact_ann_index_folds_generations_and_serves_identically(
    spark, tmp_path
):
    """Generation compaction for the streaming-ingested inverted-file
    layout (the Delta-OPTIMIZE analogue): folding checkpoint-committed
    batch=<id> subtrees into a consolidated negative generation must
    (1) preserve row count and served top-k exactly, (2) leave the
    NEWEST real batch alone so a restarted stream's one legal
    redelivery stays idempotent, (3) fold prior consolidations on the
    next pass, and (4) recover from a crashed run (leftover plan +
    partial generation) by discarding the partial state."""
    import json as _json

    from pyspark.sql import functions as F

    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    idx = str(tmp_path / "cidx")
    handler = sim.lsh_ingest_foreach_batch(spark, idx)
    waves = [
        emb.filter(F.col("vec_id") % 3 == w).select("vec_id", "embedding")
        for w in range(3)
    ]
    for w in range(3):
        handler(waves[w], w)

    qv = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    ]

    def topk():
        return [
            r.asDict()
            for r in sim.query_lsh_index(
                spark, idx, qv, k=5, exclude_id=0
            ).collect()
        ]

    def batch_dirs():
        import os

        return sorted(
            int(d.split("=")[1])
            for d in os.listdir(idx)
            if d.startswith("batch=")
        )

    before, n_before = topk(), spark.read.parquet(idx).count()
    stats = sim.compact_ann_index(spark, idx)
    assert stats["folded"] == [0, 1] and stats["newgen"] == -1
    assert batch_dirs() == [-1, 2]
    assert spark.read.parquet(idx).count() == n_before
    assert topk() == before

    # the kept newest batch's redelivery contract survives compaction
    handler(waves[2], 2)
    assert spark.read.parquet(idx).count() == n_before
    assert topk() == before

    # a lone consolidation + newest real = nothing worth folding
    assert sim.compact_ann_index(spark, idx)["folded"] == []

    # grow with fresh ids, then a second pass folds the PRIOR
    # consolidation together with the now-committed batch 2
    shifted = emb.filter(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    handler(shifted, 3)
    n_grown = spark.read.parquet(idx).count()
    after_growth = topk()  # the growth legitimately changes the top-5
    stats2 = sim.compact_ann_index(spark, idx)
    assert stats2["folded"] == [-1, 2] and stats2["newgen"] == -2
    assert batch_dirs() == [-2, 3]
    assert spark.read.parquet(idx).count() == n_grown
    assert topk() == after_growth

    # crash recovery: a leftover plan + PARTIAL consolidated
    # generation (count mismatch) is discarded, then compaction
    # proceeds cleanly — no-op here since nothing is foldable
    partial = spark.read.parquet(f"{idx}/batch=3").limit(3)
    (
        partial.withColumn("batch", F.lit(-5))
        .write.mode("append")
        .partitionBy("batch", "table", "bucket")
        .parquet(idx)
    )
    (tmp_path / "cidx" / sim._COMPACT_PLAN).write_text(
        _json.dumps({"folded": [-2, 3], "newgen": -5, "n_rows": 10**9})
    )
    stats3 = sim.compact_ann_index(spark, idx)
    assert batch_dirs() == [-2, 3]  # partial -5 discarded, sources intact
    assert stats3["folded"] == []
    assert spark.read.parquet(idx).count() == n_grown
    assert topk() == after_growth


def test_emb_hygiene_gate_raises_on_poisoned_corpus(spark, tmp_path):
    """The emb_hygiene_audit index-readiness gate must RAISE on each
    of the three poison states (zero-norm, non-finite, wrong dim) —
    the negative paths the hash-green driver row can't exercise."""
    import pytest

    from meteo_etl_spark.functions import similarity as sim
    from meteo_etl_spark.plans import queries as Q

    emb = load_table(spark, SF_SMALL, "embeddings")
    fn = Q.get("emb_hygiene_audit").fn
    dim = sim.EMBEDDING_DIM
    cases = {
        "zero-norm": [(10**6, [0.0] * dim)],
        "non-finite": [(10**6, [float("nan")] + [1.0] * (dim - 1))],
        "wrong-dim": [(10**6, [1.0] * (dim - 3))],
    }
    for name, rows in cases.items():
        bad = emb.select("vec_id", "embedding").unionByName(
            spark.createDataFrame(
                rows, "vec_id long, embedding array<float>"
            )
        )
        out = str(tmp_path / name.replace("-", "_"))
        bad.write.parquet(f"{out}/embeddings.parquet")
        # reuse the real corpus for the other tables the loader may touch
        with pytest.raises(RuntimeError, match="index-readiness"):
            fn(spark, out).collect()


def test_ann_tombstone_delete_suppresses_and_compaction_applies(
    spark, tmp_path
):
    """delete_from_ann_index: a tombstoned vector stops being servable
    at the next query (anti-join on the candidate path, O(deletes)
    I/O); compact_ann_index physically drops tombstoned rows from the
    generations it folds but RETAINS the list, so the newest batch's
    legal redelivery cannot resurrect a deleted vector into served
    results. Also exercised through the IVF-PQ shortlist path."""
    from pyspark.sql import functions as F

    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    idx = str(tmp_path / "tidx")
    handler = sim.lsh_ingest_foreach_batch(spark, idx)
    waves = [
        emb.filter(F.col("vec_id") % 3 == w).select("vec_id", "embedding")
        for w in range(3)
    ]
    for w in range(3):
        handler(waves[w], w)

    qv = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    ]

    def topk(k=5):
        return [
            r.asDict()
            for r in sim.query_lsh_index(
                spark, idx, qv, k=k, exclude_id=0
            ).collect()
        ]

    before7 = topk(7)
    x = before7[0]["vec_id"]
    y = next(
        r["vec_id"] for r in before7 if r["vec_id"] % 3 == 2
    )  # lives in the kept newest batch
    assert sim.delete_from_ann_index(spark, idx, [x, y]) == 2
    want = [r for r in before7 if r["vec_id"] not in (x, y)][:5]
    assert topk() == want

    # compaction drops tombstoned rows from the FOLDED generations
    stats = sim.compact_ann_index(spark, idx)
    assert stats["folded"] == [0, 1]
    assert topk() == want
    gone = spark.read.parquet(idx).filter(
        F.col("vec_id").isin([x, y]) & (F.col("batch") < 0)
    )
    assert gone.count() == 0  # physically absent from the consolidation
    # the kept newest batch still holds y physically (legal —
    # suppression is the list's job until that batch is folded)
    if y % 3 == 2:
        held = spark.read.parquet(idx).filter(F.col("vec_id") == y).count()
        assert held == sim.LSH_TABLES

    # redelivery of the newest batch re-appends y's rows — served
    # results must STAY suppressed (the resurrection case)
    handler(waves[2], 2)
    assert topk() == want

    # the pushed-shortlist (IVF-PQ) path suppresses too
    pq = str(tmp_path / "tpq")
    sim.build_ivfpq_index(emb, pq)
    got = sim.query_ivfpq_index(
        spark, pq, qv, emb, k=5, n_cand=50, exclude_id=0
    ).collect()
    px = got[0]["vec_id"]
    sim.delete_from_ann_index(spark, pq, [px])
    after = sim.query_ivfpq_index(
        spark, pq, qv, emb, k=5, n_cand=50, exclude_id=0
    ).collect()
    assert px not in {r["vec_id"] for r in after} and len(after) == 5


def test_compact_single_batch_fold_applies_tombstones(spark, tmp_path):
    """r13 advice: with only ONE foldable generation, tombstoned rows
    must still be physically removed at the next ann-compact (the
    generation is rewritten with suppression applied); a CLEAN lone
    generation stays untouched (no rewrite churn); and a silently
    failed source delete must RAISE with the plan left in place — the
    recoverable state — never unlink the plan over a double-served
    batch."""
    from pyspark.sql import functions as F

    from meteo_etl_spark.functions import similarity as sim
    from meteo_etl_spark.operators import fsio

    emb = load_table(spark, SF_SMALL, "embeddings")
    idx = str(tmp_path / "sidx")
    handler = sim.lsh_ingest_foreach_batch(spark, idx)
    waves = [
        emb.filter(F.col("vec_id") % 3 == w).select("vec_id", "embedding")
        for w in range(3)
    ]
    for w in range(3):
        handler(waves[w], w)
    stats = sim.compact_ann_index(spark, idx)
    assert stats["folded"] == [0, 1]

    # lone clean consolidation: still nothing to do
    assert sim.compact_ann_index(spark, idx)["folded"] == []

    # tombstone a vector living in the folded generation (vec % 3 < 2)
    victim = int(
        spark.read.parquet(idx)
        .filter(F.col("batch") == -1)
        .agg(F.min("vec_id"))
        .collect()[0][0]
    )
    sim.delete_from_ann_index(spark, idx, [victim])
    stats2 = sim.compact_ann_index(spark, idx)
    assert stats2["folded"] == [-1]  # single-batch fold happened
    physically = (
        spark.read.parquet(idx)
        .filter((F.col("vec_id") == victim) & (F.col("batch") < 0))
        .count()
    )
    assert physically == 0
    # and the rewrite converges: next compact is a no-op again
    assert sim.compact_ann_index(spark, idx)["folded"] == []

    # failed source delete: plan must survive and the call must raise
    import json as _json
    import os

    real_rmtree = fsio.LocalIO.rmtree
    try:
        fsio.LocalIO.rmtree = lambda self, p: None  # silent failure
        sim.delete_from_ann_index(
            spark,
            idx,
            [
                int(
                    spark.read.parquet(idx)
                    .filter(F.col("batch") < 0)
                    .agg(F.min("vec_id"))
                    .collect()[0][0]
                )
            ],
        )
        with pytest.raises(RuntimeError, match="failed to delete"):
            sim.compact_ann_index(spark, idx)
        plan_file = os.path.join(idx, sim._COMPACT_PLAN)
        assert os.path.isfile(plan_file)  # recoverable plan-present state
        plan = _json.loads(open(plan_file).read())
    finally:
        fsio.LocalIO.rmtree = real_rmtree
    # recovery (real deletes restored) completes the crashed fold
    # idempotently: consolidated generation verified, sources removed
    before = (
        spark.read.parquet(idx).filter(~F.col("batch").isin(plan["folded"]))
    ).count()
    stats3 = sim.compact_ann_index(spark, idx)
    assert not os.path.isfile(plan_file)
    assert spark.read.parquet(idx).count() == before


def test_ivfpq_streaming_ingest_grows_exactly(spark, tmp_path):
    """IVF-PQ streaming growth: a seed build (lowest-id half) plus a
    streamed second half must serve IDENTICALLY to a one-shot build
    whose codebook is the same (the seed half contains the lowest ids,
    so the sampled codebook is literally identical) — the frozen-
    quantizer contract. Redelivery replaces its own subtree; ingesting
    into a non-ivfpq path raises; batch id 0 is refused."""
    import json

    import pytest
    from pyspark.sql import functions as F

    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    seed = emb.filter(F.col("vec_id") < n // 2)
    rest = emb.filter(F.col("vec_id") >= n // 2)

    idx = str(tmp_path / "ivfpq_stream")
    sim.build_ivfpq_index(seed, idx, n_sub=8, sub_dim=8, n_codes=32)

    src = tmp_path / "feed"
    src.mkdir()
    (src / "rest.json").write_text(
        "\n".join(
            json.dumps(
                {"vec_id": r.vec_id, "embedding": [float(x) for x in r.embedding]}
            )
            for r in rest.collect()
        )
    )
    handler = sim.ivfpq_ingest_foreach_batch(spark, idx)
    # the checkpointed stream starts after the seed build: feed one
    # placeholder-free run whose first batch id we shift to 1 by
    # driving the handler directly (streaming ids are monotonic from 0
    # on a fresh checkpoint — the guard exists exactly for that case)
    with pytest.raises(ValueError, match="batch id 0 is reserved"):
        handler(rest, 0)
    handler(rest, 1)

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0].embedding]
    got = [
        r.asDict()
        for r in sim.query_ivfpq_index(
            spark, idx, qv, emb, k=5, n_cand=50, exclude_id=0
        ).collect()
    ]
    # one-shot build over the FULL corpus with the SEED's codebook
    # (identical by construction: the seed holds the lowest ids)
    full_idx = str(tmp_path / "ivfpq_full")
    sim.build_ivfpq_index(
        emb,
        full_idx,
        n_sub=8,
        sub_dim=8,
        n_codes=32,
        codebook=sim.sampled_pq_codebook(seed, n_sub=8, sub_dim=8, n_codes=32),
    )
    want = [
        r.asDict()
        for r in sim.query_ivfpq_index(
            spark, full_idx, qv, emb, k=5, n_cand=50, exclude_id=0
        ).collect()
    ]
    assert got == want

    # redelivery replaces its own subtree — row count and results hold
    n_rows = spark.read.parquet(idx).count()
    assert n_rows == n
    handler(rest, 1)
    assert spark.read.parquet(idx).count() == n_rows
    assert [
        r.asDict()
        for r in sim.query_ivfpq_index(
            spark, idx, qv, emb, k=5, n_cand=50, exclude_id=0
        ).collect()
    ] == got

    # ingesting into a non-ivfpq index fails loudly
    lsh_idx = str(tmp_path / "lsh")
    sim.build_lsh_index(emb, lsh_idx)
    bad = sim.ivfpq_ingest_foreach_batch(spark, lsh_idx)
    with pytest.raises(ValueError, match="no IVF-PQ index"):
        bad(rest, 1)


# ---------------------------------------------------------------------------
# Binary (sign-bit) quantization + sign-band LSH (round 12)
# ---------------------------------------------------------------------------


def test_sign_bit_words_match_python_twin_and_unpacked_hamming(spark):
    """The packed-word expression must equal the driver-side Python
    twin on every corpus row, and packed XOR+popcount Hamming must
    equal the unpacked per-bit disagreement count — the two encodings
    the audit mixes (corpus packs engine-side, panel packs driver-side)
    can never diverge."""
    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    v = F.col("embedding").cast("array<double>")
    rows = emb.select(
        "vec_id", v.alias("v"), sim.sign_bit_words(v).alias("w")
    ).collect()
    for r in rows:
        assert list(r["w"]) == sim._sign_words_py(list(r["v"])), r["vec_id"]
    # packed hamming == unpacked bit-diff count, all corpus pairs vs
    # one pinned probe row
    probe = rows[0]
    got = (
        emb.select("vec_id", v.alias("v"))
        .select(
            "vec_id",
            sim.hamming_words(
                sim.sign_bit_words(F.col("v")),
                F.lit(probe["w"]).cast("array<long>"),
            ).alias("ham_packed"),
            F.aggregate(
                F.zip_with(
                    sim.sign_bits(F.col("v")),
                    F.lit(
                        [1 if x > 0 else 0 for x in probe["v"]]
                    ).cast("array<int>"),
                    lambda a, b: F.when(a != b, F.lit(1)).otherwise(F.lit(0)),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("ham_bits"),
        )
        .collect()
    )
    assert all(r["ham_packed"] == r["ham_bits"] for r in got)
    assert got[0]["ham_packed"] == 0  # self-distance


def test_binary_quant_rerank_dominates_and_recovers_on_clustered(spark):
    """Per panel row the exact re-rank can never do worse than the
    raw Hamming ranking (every truth item inside the shortlist
    outranks all non-truth candidates on s_exact), and on a corpus
    with real neighbor structure the 50-candidate re-rank recovers
    the exact top-5 completely — the audit numbers a deployment
    needs before trusting the 1-bit first pass."""
    from meteo_etl_spark.functions import similarity as sim

    emb = _clustered_embeddings(spark)
    audit = sim.binary_quant_audit(emb, n_queries=10, k=5, n_cand=50).collect()
    assert len(audit) == 10
    assert all(r["n_hit_rerank"] >= r["n_hit_ham"] for r in audit), audit
    total = sum(r["n_hit_rerank"] for r in audit)
    assert total == 50, f"clustered corpus should fully recover, got {total}/50"
    # and on the near-random testdata corpus the raw-Hamming ranking
    # honestly degrades (the number the registered query pins: 0.24)
    weak = sim.binary_quant_audit(
        load_table(spark, SF_SMALL, "embeddings"), n_queries=5, k=5, n_cand=50
    ).collect()
    assert sum(r["n_hit_ham"] for r in weak) < 25


def test_signband_pairs_subset_of_exact_with_high_recall_on_clustered(spark):
    """Sign-band candidates + exact verify must emit a SUBSET of the
    blocked-exact sweep at the same threshold (verification is the
    same kernel, candidates can only lose pairs), with banded-S-curve
    recall at near-dup thresholds — the sub-quadratic route is
    honest about what it trades."""
    emb = _clustered_embeddings(spark)
    t = 0.9
    exact = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in dd.embedding_cosine_pairs(emb, threshold=t).collect()
    }
    banded = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in dd.embedding_signband_pairs(emb, threshold=t).collect()
    }
    assert exact, "clustered fixture must contain near-dup pairs"
    assert set(banded) <= set(exact)
    for pair, cos in banded.items():
        assert cos == exact[pair]  # identical kernel + rounding
    recall = len(banded) / len(exact)
    assert recall >= 0.95, f"recall {recall:.3f} below the S-curve expectation"


def test_sq8_ranges_are_partition_invariant_and_audit_is_exact(spark):
    """Trained ranges equal the true per-dim min/max at any layout;
    the audit preserves cosine well on real vectors; degenerate
    (constant) dims reconstruct exactly; frozen ranges clamp
    out-of-contract batches instead of extrapolating."""
    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    lo, hi = sim.sq8_train_ranges(emb)
    lo2, hi2 = sim.sq8_train_ranges(emb.repartition(7))
    assert lo == lo2 and hi == hi2
    import numpy as np

    V = np.array([r["e"] for r in emb.select(F.col("embedding").cast("array<double>").alias("e")).collect()])
    assert lo == [float(x) for x in V.min(axis=0)]
    assert hi == [float(x) for x in V.max(axis=0)]

    audit = sim.sq8_audit(emb).collect()
    n = sum(r["n_vecs"] for r in audit)
    mean_cos = sum(r["sum_cos_u"] for r in audit) / n / 1e6
    assert mean_cos > 0.999, mean_cos

    # constant dim: every vector reconstructs that dim exactly
    cdf = emb.select(
        "label",
        F.concat(
            F.array(F.lit(3.25)),
            F.slice(F.col("embedding").cast("array<double>"), 2, 63),
        ).alias("embedding"),
    )
    clo, chi = sim.sq8_train_ranges(cdf)
    assert clo[0] == chi[0] == 3.25
    row = cdf.select(
        sim.sq8_dequantized(F.col("embedding"), clo, chi).alias("dq")
    ).first()
    assert row["dq"][0] == 3.25

    # frozen-contract audit: a batch outside the ranges clamps to the
    # dictionary edge (never extrapolates past hi)
    big = emb.limit(5).select(
        "label",
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x * 100.0
        ).alias("embedding"),
    )
    dq = big.select(
        sim.sq8_dequantized(F.col("embedding"), lo, hi).alias("dq")
    ).collect()
    eps = 1e-9
    for r in dq:
        for i, x in enumerate(r["dq"]):
            assert lo[i] - eps <= x <= hi[i] + eps


def test_containment_catches_what_jaccard_structurally_misses(spark):
    """A short document pasted inside a much longer one: containment
    must report it at ~1.0 while the Jaccard route (minhash bands +
    J >= 0.8 verify) reports nothing — the asymmetric blind spot this
    operator exists for. Also pins the verify: every reported pair
    really meets the threshold on exact shingle sets."""
    base = [f"w{i}" for i in range(400)]
    short = " ".join(base[:30])
    long_doc = " ".join(base[:30] + [f"filler{i}" for i in range(300)])
    other = " ".join(f"z{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(1, short), (2, long_doc), (3, other)], "doc_id long, text string"
    )
    cont = dd.containment_pairs(docs).collect()
    got = {(r["doc_a"], r["doc_b"]): r["containment"] for r in cont}
    assert (1, 2) in got and got[(1, 2)] >= 0.99, got
    jac = dd.minhash_lsh_pairs(docs).collect()
    assert not any(
        {r["doc_a"], r["doc_b"]} == {1, 2} for r in jac
    ), "J(short, long) ~ 0.09 must NOT pass the 0.8 Jaccard route"


def test_containment_rare_shingle_blocking_bounds_fanout(spark):
    """A shingle shared by MORE than df_max documents must not create
    candidates by itself: the posting-list bound is what keeps the
    self-join sub-quadratic on stop-shingle-heavy corpora."""
    # 15 docs sharing one identical 'header' sentence (df = 15 >
    # df_max = 10), each with a unique body — no rare shingle is
    # shared, so NO pairs may be reported despite the common header.
    header = " ".join(f"h{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (i, header + " " + " ".join(f"b{i}_{j}" for j in range(50)))
            for i in range(15)
        ],
        "doc_id long, text string",
    )
    assert dd.containment_pairs(docs).count() == 0
    # raising df_max re-admits the header postings and the pairs
    # appear (containment of the shared header region is small, so
    # verify at a low threshold to see the candidates themselves)
    readmitted = dd.containment_pairs(docs, threshold=0.1, df_max=20).count()
    assert readmitted == 15 * 14 / 2


def test_winnow_guarantee_and_positions(spark):
    """The winnowing guarantee: two documents sharing a token run of
    exactly k+w-1 tokens (and nothing else) MUST share at least one
    fingerprint. Positions must index a gram whose hash equals the
    fingerprint (span location works), and density stays well below
    the full gram count (the index-size win)."""
    k, w = dd.SHINGLE_K, dd.WINNOW_WINDOW
    run = " ".join(f"shared{i}" for i in range(k + w - 1))
    doc_a = " ".join(f"a{i}" for i in range(40)) + " " + run + " " + " ".join(
        f"a{i}" for i in range(40, 80)
    )
    doc_b = " ".join(f"b{i}" for i in range(60)) + " " + run
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string"
    )
    fps = {r["id"]: r["fp"] for r in dd.winnow_docs(docs).collect()}
    ha = {x["h"] for x in fps[1]}
    hb = {x["h"] for x in fps[2]}
    assert ha & hb, "guaranteed-horizon shared run must register"
    # positions locate the gram: recompute grams and check h == g[pos]
    from meteo_etl_spark.functions.dedup import (
        shingle_rolling_expr,
        token_hashes,
    )

    hashed = docs.select(
        "doc_id", F.split("text", " ").alias("tw")
    ).select("doc_id", token_hashes("tw").alias("gh"))
    grams = {
        r["doc_id"]: r["g"]
        for r in hashed.select(
            "doc_id",
            F.expr(
                "transform(sequence(1, size(gh) - {0}), i -> {1})".format(
                    k - 1, shingle_rolling_expr("gh", "i", k)
                )
            ).alias("g"),
        ).collect()
    }
    for doc_id, fp in fps.items():
        for entry in fp:
            assert grams[doc_id][entry["pos"] - 1] == entry["h"], entry
        assert len(fp) < 0.6 * len(grams[doc_id])
    # and the pair surfaces from the overlap operator (min_shared=1
    # here: ONE guaranteed fingerprint is the horizon's promise)
    pairs = dd.winnow_overlap_pairs(docs, min_shared=1).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(1, 2)]


def test_winnow_fingerprints_are_locally_stable(spark):
    """Edits OUTSIDE a region must not disturb the region's selected
    fingerprints (the locality property global MinHash lacks): rewrite
    the document head, keep the tail; tail fingerprints (by hash) are
    preserved."""
    tail = " ".join(f"t{i}" for i in range(50))
    v1 = " ".join(f"h{i}" for i in range(30)) + " " + tail
    v2 = " ".join(f"H{i}x" for i in range(30)) + " " + tail
    docs = spark.createDataFrame(
        [(1, v1), (2, v2)], "doc_id long, text string"
    )
    fps = {r["id"]: {x["h"] for x in r["fp"]} for r in dd.winnow_docs(docs).collect()}
    shared = fps[1] & fps[2]
    # the 50-token shared tail dwarfs the guarantee horizon: many
    # fingerprints survive the head rewrite
    assert len(shared) >= 10, len(shared)


def test_ivfsq8_serving_mechanics(spark, tmp_path):
    """Codes-only storage (no floats in the index), sidecar-frozen
    ranges, kind guards in both directions, and the serve path's
    exact-re-rank equals brute force when the probed lists cover the
    true neighbors."""
    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    idx = str(tmp_path / "sq8idx")
    sim.build_ivfsq8_index(emb, idx)
    stored = spark.read.parquet(idx)
    assert set(stored.columns) == {"vec_id", "codes", "lst", "batch"}
    row = stored.first()
    assert len(row["codes"]) == sim.EMBEDDING_DIM
    assert all(0 <= c <= 255 for c in row["codes"])

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = sim.query_ivfsq8_index(spark, idx, qv, emb, k=5, exclude_id=0).collect()
    assert len(got) == 5
    # wrong-kind guards both directions
    import pytest as _pt

    with _pt.raises(ValueError, match="no IVF-SQ8 index"):
        sim.query_ivfsq8_index(spark, str(tmp_path / "nope"), qv, emb)
    sim.build_ivf_index(emb, str(tmp_path / "flat"))
    with _pt.raises(ValueError, match="no IVF-SQ8 index"):
        sim.query_ivfsq8_index(spark, str(tmp_path / "flat"), qv, emb)
    with _pt.raises(ValueError):
        sim.query_ivfpq_index(spark, idx, qv, emb)

    # frozen-ranges build is bit-identical to the default (same
    # corpus => same trained contract), and an explicit foreign
    # contract changes codes but the serve still works end to end
    lo, hi = sim.sq8_train_ranges(emb)
    idx2 = str(tmp_path / "sq8idx2")
    sim.build_ivfsq8_index(emb, idx2, ranges=(lo, hi))
    a = sorted(
        (r["vec_id"], tuple(r["codes"])) for r in spark.read.parquet(idx).collect()
    )
    b = sorted(
        (r["vec_id"], tuple(r["codes"])) for r in spark.read.parquet(idx2).collect()
    )
    assert a == b


def test_ivfsq8_rerank_recovers_quantization_loss(spark):
    """On the clustered corpus the SQ8-decoded shortlist + exact
    re-rank recovers the exact in-probe top-k: quantization error must
    wash out once n_cand >> k (the audit's promise, served)."""
    import tempfile
    import shutil

    from meteo_etl_spark.functions import similarity as sim

    emb = _clustered_embeddings(spark)
    scratch = tempfile.mkdtemp(prefix="sq8srv_")
    try:
        idx = f"{scratch}/idx"
        sim.build_ivfsq8_index(emb, idx)
        hits = 0
        total = 0
        for qid in (0, 100, 300):
            row = emb.filter(F.col("vec_id") == qid).first()
            qv = [float(x) for x in row["embedding"]]
            served = [
                r["vec_id"]
                for r in sim.query_ivfsq8_index(
                    spark, idx, qv, emb, k=5, n_cand=100, exclude_id=qid,
                    nprobe=sim.IVF_NPROBE,  # the driver twin below probes at this fixed depth
                ).collect()
            ]
            # truth restricted to the same probed lists: rebuild the
            # probe set with the driver twin and brute-force inside it
            dots = [
                sim._dot_py(qv, sim.ivf_centroid(j))
                for j in range(sim.IVF_LISTS)
            ]
            order = sorted(range(sim.IVF_LISTS), key=lambda j: (-dots[j], j))
            probes = [j + 1 for j in order[: sim.IVF_NPROBE]]
            in_probe = (
                spark.read.parquet(idx)
                .filter(F.col("lst").isin(probes))
                .select("vec_id")
            )
            truth = [
                r["vec_id"]
                for r in sim.brute_force_topk(
                    emb.join(in_probe, "vec_id"), qid, k=5
                ).collect()
            ]
            hits += len(set(served) & set(truth))
            total += 5
        assert hits == total, (hits, total)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_ivfsq8_streaming_ingest_grows_exactly(spark, tmp_path):
    """IVF-SQ8 streaming growth under the frozen-range contract: seed
    build (lowest-id half) + ingested second half must serve
    IDENTICALLY to a one-shot build over the full corpus using the
    SEED's trained ranges. Redelivery replaces its own subtree;
    non-sq8 targets and batch id 0 are refused."""
    import pytest as _pt

    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    seed = emb.filter(F.col("vec_id") < n // 2)
    rest = emb.filter(F.col("vec_id") >= n // 2)

    idx = str(tmp_path / "sq8_stream")
    sim.build_ivfsq8_index(seed, idx)
    handler = sim.ivfsq8_ingest_foreach_batch(spark, idx)
    with _pt.raises(ValueError, match="batch id 0 is reserved"):
        handler(rest, 0)
    handler(rest, 1)

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = [
        r.asDict()
        for r in sim.query_ivfsq8_index(
            spark, idx, qv, emb, k=5, n_cand=50, exclude_id=0
        ).collect()
    ]
    full_idx = str(tmp_path / "sq8_full")
    sim.build_ivfsq8_index(emb, full_idx, ranges=sim.sq8_train_ranges(seed))
    want = [
        r.asDict()
        for r in sim.query_ivfsq8_index(
            spark, full_idx, qv, emb, k=5, n_cand=50, exclude_id=0
        ).collect()
    ]
    assert got == want

    n_rows = spark.read.parquet(idx).count()
    assert n_rows == n
    handler(rest, 1)  # redelivery
    assert spark.read.parquet(idx).count() == n_rows

    flat = str(tmp_path / "flat2")
    sim.build_ivf_index(emb, flat)
    bad = sim.ivfsq8_ingest_foreach_batch(spark, flat)
    with _pt.raises(ValueError, match="no IVF-SQ8 index"):
        bad(rest, 1)


def test_threshold_sweep_is_monotone_and_matches_single_threshold(spark):
    """Pair counts must be non-increasing in the threshold, and the
    0.8 row must equal the registered single-threshold route's count
    (same candidates, same verify)."""
    from meteo_etl_spark.plans import queries as Q

    rows = {
        round(r["t"], 2): r["n_pairs"]
        for r in Q.all_queries()["dedup_threshold_sweep"].fn(
            spark, SF_SMALL
        ).collect()
    }
    ts = sorted(rows)
    assert all(rows[a] >= rows[b] for a, b in zip(ts, ts[1:]))
    docs = load_table(spark, SF_SMALL, "documents")
    assert rows[0.8] == dd.minhash_lsh_pairs(docs).count()


def test_balanced_sample_equalizes_classes(spark):
    """Every class keeps exactly min-class-count docs, drawn from the
    class's own population, deterministically."""
    from meteo_etl_spark.plans import queries as Q

    docs = load_table(spark, SF_SMALL, "documents")
    true_counts = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_min = min(true_counts.values())
    out = Q.all_queries()["docs_balanced_sample"].fn(spark, SF_SMALL)
    got = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(got) == set(true_counts)
    assert all(v == n_min for v in got.values()), got
    # deterministic: a second run returns the identical id set
    a = {(r["lang"], r["doc_id"]) for r in out.collect()}
    b = {
        (r["lang"], r["doc_id"])
        for r in Q.all_queries()["docs_balanced_sample"].fn(spark, SF_SMALL).collect()
    }
    assert a == b


def test_ngram_diversity_reconciles_with_direct_counts(spark):
    """The census must agree with independently computed distinct
    counts for one source, and TTR must be <= 1e6 with bigram TTR
    >= unigram TTR (bigrams repeat less)."""
    from meteo_etl_spark.plans import queries as Q

    rows = Q.all_queries()["docs_ngram_diversity"].fn(spark, SF_SMALL).collect()
    assert rows
    docs = load_table(spark, SF_SMALL, "documents")
    src = rows[0]["source"]
    one = docs.where(F.col("source") == src)
    toks = one.select(F.explode(F.split("text", " ")).alias("t"))
    n_tok = toks.count()
    n_uni = toks.distinct().count()
    r0 = rows[0]
    assert (r0["n_tokens"], r0["n_uni"]) == (n_tok, n_uni)
    for r in rows:
        assert 0 < r["uni_ttr_ppm"] <= 1_000_000
        assert r["big_ttr_ppm"] >= r["uni_ttr_ppm"]


def test_langid_confusion_marginals_cover_corpus(spark):
    """Every document lands in exactly one confusion cell; the true
    marginals equal the label distribution; predictions stay in the
    detector's output domain (langs + 'und')."""
    from meteo_etl_spark.plans import queries as Q

    rows = Q.all_queries()["docs_langid_confusion"].fn(spark, SF_SMALL).collect()
    docs = load_table(spark, SF_SMALL, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    marg = {}
    for r in rows:
        marg[r["true_lang"]] = marg.get(r["true_lang"], 0) + r["n_docs"]
    truth = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert marg == truth
    assert {r["pred_lang"] for r in rows} <= set(tx.LANGS) | {"und"}


def test_source_overlap_reconciles_with_pair_route(spark):
    """Cell counts must sum to the certified pair route's total, with
    unordered source pairs (source_a <= source_b) and every pair
    counted exactly once."""
    from meteo_etl_spark.plans import queries as Q

    rows = Q.all_queries()["dedup_source_overlap"].fn(spark, SF_SMALL).collect()
    docs = load_table(spark, SF_SMALL, "documents")
    total = dd.minhash_lsh_pairs(docs).count()
    assert sum(r["n_pairs"] for r in rows) == total > 0
    assert all(r["source_a"] <= r["source_b"] for r in rows)


def test_tokenizer_compare_accounting(spark):
    """Both rows count the same corpus words; fertility is the half-up
    ppm of pieces/words and is >= 1e6 for both (a piece never spans
    words); the unigram row reconciles with a driver-side
    re-segmentation under the trained model."""
    from meteo_etl_spark.functions import unigram as ugm
    from meteo_etl_spark.plans import queries as Q

    rows = {
        r["tokenizer"]: r
        for r in Q.all_queries()["docs_tokenizer_compare"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(rows) == {"bpe", "unigram"}
    docs = load_table(spark, SF_SMALL, "documents")
    n_words = docs.select(
        F.sum(F.size(F.filter(F.split("text", " "), lambda x: F.length(x) > 0)))
    ).collect()[0][0]
    for r in rows.values():
        assert r["n_words"] == n_words
        assert r["n_pieces"] >= r["n_words"]
        exp = (2 * 1_000_000 * r["n_pieces"] + r["n_words"]) // (
            2 * r["n_words"]
        )
        assert r["fertility_ppm"] == exp >= 1_000_000
    model = ugm.train_unigram_lm(docs)
    costs = {r["piece"]: r["cost_u"] for r in model.collect()}
    total = 0
    for r in docs.select("text").collect():
        for w in r["text"].split(" "):
            if w:
                total += len(ugm.viterbi_segment(w, costs))
    assert rows["unigram"]["n_pieces"] == total


def test_ivf_operating_point_curve_and_degenerate(spark, tmp_path):
    """The build-time nprobe tuner (r14 verdict order #2): the curve's
    hit counts are nondecreasing in probe depth, full depth always
    reaches min-recall 1.0 (every list covered = exact top-k covered),
    the chosen default is the SMALLEST depth clearing the target, and
    the stamped index meta carries the evidence. A single-vector
    corpus (no neighbors to audit) must not crash the build: it serves
    at full depth with n_queries=0 recorded."""
    from meteo_etl_spark.functions import similarity as sim

    emb = load_table(spark, SF_SMALL, "embeddings")
    op = sim.ivf_operating_point(emb)
    assert op["n_queries"] >= 1 and op["k"] == 5
    npbs = sorted(op["curve"])
    assert npbs == list(range(1, sim.IVF_LISTS + 1))
    for a, b in zip(npbs, npbs[1:]):
        assert op["curve"][a]["min_hits"] <= op["curve"][b]["min_hits"]
        assert op["curve"][a]["sum_hits"] <= op["curve"][b]["sum_hits"]
    assert op["curve"][sim.IVF_LISTS]["min_recall"] == 1.0
    clearing = [
        n for n in npbs
        if op["curve"][n]["min_recall"] >= op["target_recall"]
    ]
    assert op["nprobe"] == (clearing[0] if clearing else sim.IVF_LISTS)
    assert op["min_recall_at_default"] == op["curve"][op["nprobe"]]["min_recall"]

    # stamped into the sidecar by the build, resolved at query time
    idx = str(tmp_path / "tuned_idx")
    sim.build_ivf_index(emb, idx)
    meta = sim._read_ann_meta(spark, idx)
    assert meta["nprobe_default"] == op["nprobe"]
    assert meta["nprobe_tuning"]["n_queries"] == op["n_queries"]

    one = emb.filter(F.col("vec_id") == 0)
    op1 = sim.ivf_operating_point(one)
    assert op1 == {
        "nprobe": sim.IVF_LISTS, "k": 5, "n_queries": 0,
        "target_recall": sim.IVF_RECALL_TARGET,
        "min_recall_at_default": 0.0, "curve": {},
    }
    idx1 = str(tmp_path / "one_idx")
    sim.build_ivf_index(one, idx1)  # must not raise
    assert sim._read_ann_meta(spark, idx1)["nprobe_default"] == sim.IVF_LISTS

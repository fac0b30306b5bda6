"""Model-based document classification: a nearest-class-centroid
token classifier, trained and applied entirely inside the engine.

The FineWeb/CCNet-style curation pipelines gate documents through a
LEARNED filter (fastText quality classifier, domain classifier) — a
model trained on labeled examples, then applied to the whole corpus.
This module provides that stage Spark-first: the model is a DataFrame
(one row per (class, token) with an integer ppm frequency), training
is one aggregation pass over the labeled split, and scoring is a
vocabulary-sized join plus one aggregation — no driver-side learning
loop, no Python UDFs, no model file.

Determinism discipline (same as docs_tfidf_topk / docs_unigram_freq):
everything is exact BIGINT arithmetic. The trained weight is
``freq_ppm = cnt * 1_000_000 div total`` (integral division — the ppm
quantization IS part of the model definition, like any quantized
classifier), a document's class score is ``sum(tf * freq_ppm)``, and
argmax resolves ties by lexicographically-smallest class via a
``row_number`` window — so Spark and the DuckDB oracle agree
bit-for-bit with no libm anywhere.

Scale notes (100 TB): training is a (class, tok) partial agg that
combines map-side; class totals are a classes-sized frame; the
scoring join is vocabulary-vs-tokens on ``tok`` (AQE broadcasts the
model at small scale; bucket both legs by tok via operators/bucketing
when the vocabulary itself is large); the per-(doc, class) agg and
the argmax window each shuffle once on doc_id. Scores stay in BIGINT:
a 1M-token document caps at 1e6 * 1e6 ppm = 1e12 per class. Documents
sharing no token with the training vocabulary are labeled ``(oov)``
explicitly (anti-join) rather than silently dropped.

Reference parity: no reference counterpart (the reference has no
model surface); mandated by BASELINE.json's training-data scope —
the classifier-filter stage every large corpus-curation pipeline runs.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meteo_etl_spark.functions.sampling import hash_split

#: ppm quantization of the trained per-class token frequencies —
#: integral, so both engines compute identical weights.
WEIGHT_PPM = 1_000_000

#: the predicted label for documents with zero training-vocabulary
#: overlap (no score is defined for them; they must not vanish).
OOV_LABEL = "(oov)"


#: default 1-in-N token-position marking rate for
#: :func:`inject_class_signal` (den=4 → 25% of positions carry
#: class-specific morphology, 75% stay shared vocabulary).
SIGNAL_DEN = 4


def inject_class_signal(
    docs: DataFrame,
    *,
    class_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    signal_den: int = SIGNAL_DEN,
) -> DataFrame:
    """Deterministic separable-corpus builder for classifier SKILL
    demonstrations: rewrite 1/``signal_den`` of each document's token
    positions to a class-marked morphological form
    (``tok`` → ``tok_<class>``), leaving the rest as shared
    vocabulary.

    Why this exists: the synthetic testdata's ``lang`` label is
    statistically INDEPENDENT of its text (verified per-token: every
    class draws from one shared distribution), so no classifier — and
    no feature engineering — can separate it; accuracy at chance is a
    property of the corpus, not the model (R10_CURATE.md documents
    this honestly). Real language ID separates because classes have
    class-conditional token forms (morphology, script, function
    words). This builder injects exactly that structure,
    deterministically, so the skill demonstration is reproducible and
    ORACLE-CHECKABLE: the marking decision is the repo's md5 idiom
    (32 md5 bits of ``doc_id:pos:token`` mod ``signal_den``), identical
    in Spark and DuckDB, no RNG.

    Plan: pure per-row map (split → transform → array_join) — no
    shuffle, scales like tokenization.
    """
    from meteo_etl_spark.functions.sampling import hash_bucket

    if signal_den < 1:
        raise ValueError(f"signal_den must be >= 1, got {signal_den}")
    w = F.split(F.col(text_col), " ")
    marked = F.transform(
        w,
        lambda t, i: F.when(
            # the shared 32-bit md5 bucket idiom (sampling.hash_bucket)
            # over doc_id:pos:token — one scheme repo-wide, one oracle
            # translation
            hash_bucket(
                F.concat_ws(
                    ":",
                    F.col(id_col).cast("string"),
                    i.cast("string"),
                    t,
                ),
                signal_den,
            )
            == 0,
            F.concat(t, F.lit("_"), F.col(class_col)),
        ).otherwise(t),
    )
    return docs.withColumn(text_col, F.array_join(marked, " "))


def train_token_centroids(
    train: DataFrame, *, class_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Train the classifier: one row per (class, token) with the
    integer ppm frequency of that token within the class's corpus.

    ``freq_ppm = cnt * WEIGHT_PPM div total_class_tokens`` — exact
    integral division; rare tokens in huge classes quantize to 0 and
    are kept (the row set is the class vocabulary, not the support).
    ONE scan of the training tokens: a (cls, tok) aggregation
    (combines map-side), then class totals as a second aggregate OVER
    THE COUNTS joined back broadcast. The totals aggregate consumes
    the (cls, tok) aggregate's shuffle output, and ReuseExchange
    shares that exchange between the two join legs — `.explain` shows
    ONE tokenize+count lineage feeding both — so training still scans
    the corpus once. A cls-partitioned window sum would instead force
    each class's ENTIRE vocabulary through a single task (a window
    partition is unsplittable): with a handful of classes the whole
    model build serializes onto ~k straggler tasks at 100 TB.
    """
    return model_from_counts(
        train_token_counts(train, class_col=class_col, text_col=text_col)
    )


def train_token_counts(
    train: DataFrame, *, class_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """The classifier's sufficient statistic: one (cls, tok, cnt) row
    per class-token pair. Counts are ASSOCIATIVE — summing the counts
    of any partition of the corpus equals counting the union — which
    is what makes incremental retraining exact
    (:func:`classifier_retrain_foreach_batch`). One map-combined
    aggregation pass."""
    toks = train.select(
        F.col(class_col).alias("cls"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    return toks.groupBy("cls", "tok").agg(F.count(F.lit(1)).alias("cnt"))


def model_from_counts(counts: DataFrame, *, token_col: str = "tok") -> DataFrame:
    """Derive the (cls, <token_col>, freq_ppm) model from
    (cls, <token_col>, cnt) rows — re-aggregating first, so count
    fragments from multiple training increments fold exactly before
    the ppm quantization (quantize-after-sum: ppm is taken once, over
    the true totals). The summed counts' exchange is shared with the
    totals aggregate via ReuseExchange (see
    :func:`train_token_centroids`). ``token_col`` parameterizes the
    feature column so the hashed-subword path
    (:func:`train_char_ngram_centroids`, ``feat``) derives through the
    SAME quantization code instead of a drifting copy (ADVICE r11)."""
    cnt = (
        counts.groupBy("cls", token_col)
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    totals = cnt.groupBy("cls").agg(F.sum("cnt").alias("_total"))
    return (
        cnt.join(F.broadcast(totals), "cls")
        .select(
            "cls",
            token_col,
            F.expr(f"(cnt * CAST({WEIGHT_PPM} AS BIGINT)) div _total").alias(
                "freq_ppm"
            ),
        )
    )


def save_model(model: DataFrame, path: str, *, tag: str = "latest") -> int:
    """Publish a trained model as a new version of an atomic parquet
    table and move ``tag`` to it (operators/atomic: all-or-nothing
    commit, time travel, tags). Returns the committed version.

    The model IS data — (cls, tok, freq_ppm) rows — so it gets the
    same lineage discipline as any other table: retraining publishes
    a NEW version and re-points the tag; a serving job pinned to
    ``tag="prod"`` flips atomically, and any historical filter run is
    reproducible by version number. Known caveat (documented on
    ``AtomicParquetTable.tag``): re-pointing a tag races an in-flight
    vacuum under the single-maintenance-writer discipline."""
    from meteo_etl_spark.operators.atomic import AtomicParquetTable

    t = AtomicParquetTable(model.sparkSession, path)
    t.overwrite(model)
    v = t.versions()[-1]
    t.tag(tag, v, replace=True)
    return v


def load_model(
    spark,
    path: str,
    *,
    tag: str | None = None,
    version: int | None = None,
) -> DataFrame:
    """Load a published model by tag or pinned version; with neither,
    the newest committed version — the read side of
    :func:`save_model`."""
    from meteo_etl_spark.operators.atomic import AtomicParquetTable

    return AtomicParquetTable(spark, path).read(version=version, tag=tag)


def _doc_class_scores(
    docs: DataFrame,
    model: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The ONE scoring kernel: (id, cls, score) with score =
    sum(tf * freq_ppm) over the document's tokens (exact BIGINT).
    Shared by :func:`score_documents` (argmax serving) and
    :func:`classifier_calibration` (confidence table) so the
    calibration can never certify a different classifier than the one
    that serves (the model_from_counts drift lesson, r12
    self-review)."""
    tf = (
        docs.select(
            id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok")
        )
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.join(model, "tok")
        .groupBy(id_col, "cls")
        .agg(F.sum(F.col("tf") * F.col("freq_ppm")).alias("score"))
    )


def score_documents(
    docs: DataFrame,
    model: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained model: (id, pred_cls, score) for every input
    document. score = sum(tf * freq_ppm) over the document's tokens
    (exact BIGINT); argmax breaks ties on the lexicographically
    smallest class. Documents with no vocabulary overlap get
    ``OOV_LABEL`` with score 0 — never dropped: one LEFT join from the
    id spine, coalescing the miss side (the former union(pred,
    anti-join) shape evaluated the whole train+score subtree twice —
    once for hits, once inside the anti-join; the outer join keeps a
    single evaluation and the same rows, assuming ids are unique as
    everywhere in this engine).
    """
    num = _doc_class_scores(docs, model, id_col=id_col, text_col=text_col)
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("cls").asc()
    )
    pred = (
        num.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(id_col, F.col("cls").alias("pred_cls"), "score")
    )
    return (
        docs.select(id_col)
        .join(pred, id_col, "left")
        .select(
            id_col,
            F.coalesce("pred_cls", F.lit(OOV_LABEL)).alias("pred_cls"),
            F.coalesce("score", F.lit(0).cast("long")).alias("score"),
        )
    )


def classifier_report(
    docs: DataFrame,
    *,
    class_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    train_frac: float = 0.8,
) -> DataFrame:
    """Per-class precision/recall over the held-out split, derived
    from the confusion matrix (the minimal sufficient statistic —
    k² rows, so the three derivations below are driver-cheap and the
    identical confusion subplan is shared via Spark's exchange reuse).

    Row domain = classes that OCCUR as true labels in the held-out
    split; predicted-only labels (e.g. ``OOV_LABEL``) contribute to
    the precision denominators but get no row. Ratios use the repo's
    half-up integer ppm idiom; precision is NULL when the class was
    never predicted (0/0 — both engines emit NULL, hash-stable).
    """
    return _report_from_confusion(
        classifier_confusion(
            docs,
            class_col=class_col,
            id_col=id_col,
            text_col=text_col,
            train_frac=train_frac,
        )
    )


def _report_from_confusion(conf: DataFrame) -> DataFrame:
    """Derive the per-class precision/recall table from a
    (true_cls, pred_cls, n_docs) confusion matrix — shared by the
    whole-token and hashed-subword report paths."""
    support = conf.groupBy(F.col("true_cls").alias("cls")).agg(
        F.sum("n_docs").alias("support")
    )
    pred_n = conf.groupBy(F.col("pred_cls").alias("cls")).agg(
        F.sum("n_docs").alias("pred_n")
    )
    tp = conf.where(F.col("true_cls") == F.col("pred_cls")).select(
        F.col("true_cls").alias("cls"), F.col("n_docs").alias("tp")
    )
    return (
        support.join(tp, "cls", "left")
        .join(pred_n, "cls", "left")
        .select(
            "cls",
            "support",
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            F.coalesce("pred_n", F.lit(0)).cast("long").alias("pred_n"),
            F.expr(
                "CASE WHEN coalesce(pred_n, 0) = 0 THEN NULL ELSE "
                "(2 * 1000000 * coalesce(tp, 0) + pred_n) div (2 * pred_n) "
                "END"
            ).alias("precision_ppm"),
            F.expr(
                "(2 * 1000000 * coalesce(tp, 0) + support) div (2 * support)"
            ).alias("recall_ppm"),
        )
    )


def classifier_stream_foreach_batch(
    spark,
    model_path: str,
    out_path: str,
    *,
    keep: tuple[str, ...],
    tag: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    stats: list | None = None,
):
    """``foreachBatch`` body applying the PUBLISHED classifier to a
    document stream — the online form of the curation stage 3b filter
    (twin of ``dedup.dedup_stream_foreach_batch``).

    The model is re-read from the atomic table at every micro-batch
    (a manifest read — cheap): a retrain that re-points ``tag`` rolls
    into the stream between micro-batches with no restart, and the
    flip is atomic. Kept documents (predicted class in ``keep``) land
    under ``out_path/batch=<id>``; the batch's partition directory is
    REMOVED up front on every (re)delivery, so a redelivery converges
    to exactly the current model's answer even when that answer is
    EMPTY (a dynamic-overwrite alone writes nothing for an empty
    frame and would leave the stale rows of the first attempt) —
    idempotent by layout, the same at-least-once→exactly-once
    argument as the warehouse sinks. The delete goes through
    ``operators/fsio.io_for`` (Hadoop FileSystem API for URI paths),
    NOT ``shutil`` — the idempotency argument depends on the delete
    actually happening on hdfs://-style stores, where a local rmtree
    would silently no-op. Pass a list as ``stats`` for per-batch
    accounting (the extra count jobs run only when asked)."""
    if not keep:
        raise ValueError("classifier_stream_foreach_batch requires a keep set")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        from meteo_etl_spark.operators.fsio import io_for

        io_for(out_path, spark).rmtree(
            f"{out_path.rstrip('/')}/batch={int(batch_id)}"
        )
        if batch_df.isEmpty():
            if stats is not None:
                stats.append(
                    {"batch_id": batch_id, "n_in": 0, "n_kept": 0, "n_rejected": 0}
                )
            return
        model = load_model(spark, model_path, tag=tag)
        scored = score_documents(
            batch_df, model, id_col=id_col, text_col=text_col
        )
        kept = batch_df.join(
            scored.where(F.col("pred_cls").isin(list(keep))).select(
                id_col, "pred_cls", "score"
            ),
            id_col,
        ).withColumn("batch", F.lit(int(batch_id)))
        if stats is None:
            (
                kept.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch")
                .parquet(out_path)
            )
            return
        kept = kept.cache()  # scored once: the write and counts share it
        try:
            (
                kept.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch")
                .parquet(out_path)
            )
            n_in = batch_df.count()
            n_kept = kept.count()
            stats.append(
                {
                    "batch_id": batch_id,
                    "n_in": n_in,
                    "n_kept": n_kept,
                    "n_rejected": n_in - n_kept,
                }
            )
        finally:
            kept.unpersist()

    return handle


def classifier_retrain_foreach_batch(
    spark,
    counts_path: str,
    model_path: str,
    *,
    class_col: str = "lang",
    text_col: str = "text",
    tag: str = "latest",
    stats: list | None = None,
):
    """``foreachBatch`` body maintaining the classifier INCREMENTALLY
    from a labeled document stream (r10 verdict order #4): each
    micro-batch lands its (cls, tok, cnt) count deltas, and the
    published model is re-derived from the accumulated counts — BIT-
    IDENTICAL to a full retrain on the union corpus, because counts
    are associative integers and the ppm quantization happens once,
    after the sum (:func:`model_from_counts`), never per increment.

    Idempotency: deltas land under ``counts_path/batch=<id>`` with an
    up-front FileSystem delete + dynamic partition overwrite — the
    same by-layout exactly-once argument as the streaming filter, so
    an at-least-once redelivery replaces its own partition instead of
    double-counting (a keyed read-modify-write ``old+delta`` upsert
    would NOT be redelivery-safe: the second delivery would add the
    delta twice). The model publish is an atomic versioned tag flip
    (:func:`save_model`): scoring jobs pinned to ``tag`` pick up each
    refresh between their own batches with no restart.

    Scale: the delta aggregate combines map-side within the batch;
    deriving the model reads only (cls, tok, cnt) rows — vocabulary-
    sized, not corpus-sized. When the batch-partition count grows,
    :func:`compact_token_counts` folds old partitions into a
    generation-tagged baseline (associativity again) behind a crash-
    safe watermark; this handler reads through the same watermark filter
    (:func:`read_token_counts`), so compaction needs no stream
    restart."""
    from meteo_etl_spark.operators.fsio import io_for

    io = io_for(counts_path, spark)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        upto = _compacted_upto(io, counts_path)
        if int(batch_id) <= upto and int(batch_id) != COMPACT_BASELINE:
            raise RuntimeError(
                f"batch {batch_id} was already compacted into the "
                f"baseline (watermark {upto}) — a compacted batch can "
                "never be redelivered under streaming's monotonic "
                "batch-id contract; compact with keep_last >= 1 so the "
                "newest (redeliverable) batch is never folded in"
            )
        io.rmtree(f"{counts_path.rstrip('/')}/batch={int(batch_id)}")
        if not batch_df.isEmpty():
            deltas = train_token_counts(
                batch_df, class_col=class_col, text_col=text_col
            ).withColumn("batch", F.lit(int(batch_id)))
            (
                deltas.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch")
                .parquet(counts_path)
            )
        # republish even when THIS batch was empty: a redelivered
        # now-empty batch just removed its stale partition above, so
        # the published model must converge to the remaining counts
        if not _counts_exist(io, counts_path):
            if stats is not None:
                stats.append({"batch_id": batch_id, "version": None})
            return
        model = model_from_counts(read_token_counts(spark, counts_path))
        v = save_model(model, model_path, tag=tag)
        if stats is not None:
            stats.append({"batch_id": batch_id, "version": v})

    return handle


#: virtual baseline of generation 0 (nothing compacted yet) — below
#: any real streaming batch id (Structured Streaming ids start at 0).
#: Generation g >= 1 lands its baseline at partition ``batch=-(g+1)``,
#: so every compaction writes a NEW partition and a crashed attempt is
#: replaced wholesale on re-run, never accumulated into (ADVICE r11
#: high: the old fixed ``batch=-1`` baseline committed BEFORE the
#: watermark flip, leaving a crash window where candidates were
#: counted twice — once in the merged baseline, once in their still-
#: live batch dirs — and a re-run folded them into the baseline again).
COMPACT_BASELINE = -1

#: legacy single-file watermark (pre-generation layout) — read as a
#: fallback so tables compacted under the old code keep working; the
#: first generation-tagged compaction deletes it.
_COMPACT_MARK = "_compacted_upto"

#: watermark directory: one ``gen-<k>`` JSON file per compaction
#: generation, each published with fsio.publish_exclusive (atomic
#: no-overwrite create with full content — the Delta-HDFSLogStore
#: commit scheme, NOT delete+rename, so a crash can never leave a
#: missing watermark; ADVICE r11 low). Readers resolve the max
#: generation; older files are conservative states awaiting GC.
_COMPACT_DIR = "_compaction"


def _gen_name(gen: int) -> str:
    return f"gen-{gen:012d}"


def _compaction_state(io, counts_path: str) -> tuple[int, int, int]:
    """``(upto, baseline_batch, generation)`` of the newest published
    compaction watermark. The baseline swap is atomic WITH the
    watermark: both live in one publish_exclusive'd JSON body, so
    reads flip from (old baseline, old upto) to (new, new) in a single
    namespace operation — there is no state in which the merged
    candidates and their still-live batch dirs are both visible.

    Only a MISSING watermark means "nothing compacted" (both IO
    backends normalize absent paths to FileNotFoundError); any other
    I/O fault propagates loudly — a transient read error must fail
    the caller, not silently admit redelivery of folded batches
    (ADVICE r11 medium). A corrupt body is a loud ValueError."""
    root = counts_path.rstrip("/")
    markdir = f"{root}/{_COMPACT_DIR}"
    try:
        names = io.listdir(markdir)
    except FileNotFoundError:
        names = []
    # ONLY exact `gen-<digits>` names are watermarks. publish_exclusive
    # stages `gen-<k>.tmp-<uuid>` in this same directory and a SIGKILL
    # can strand one — a stranded staging file must be invisible here
    # (the atomic.py convention: skip unparseable names), never a
    # "corrupt watermark" that bricks every read (r12 self-review #1);
    # _compaction_cleanup GCs strays.
    gens = [
        int(n[4:]) for n in names if n.startswith("gen-") and n[4:].isdigit()
    ]
    if gens:
        gen = max(gens)
        body = io.read_text(f"{markdir}/{_gen_name(gen)}")
        try:
            st = json.loads(body)
            return int(st["upto"]), int(st["baseline"]), int(st["generation"])
        except (ValueError, KeyError, TypeError):
            raise ValueError(
                f"corrupt compaction watermark body in "
                f"{markdir}/{_gen_name(gen)}: {body!r}"
            ) from None
    # legacy single-file watermark (pre-generation layout)
    try:
        raw = io.read_text(f"{root}/{_COMPACT_MARK}")
    except FileNotFoundError:
        return COMPACT_BASELINE, COMPACT_BASELINE, 0
    try:
        return int(raw), COMPACT_BASELINE, 0
    except ValueError:
        raise ValueError(
            f"corrupt legacy compaction watermark {root}/{_COMPACT_MARK}: "
            f"{raw!r}"
        ) from None


def _compacted_upto(io, counts_path: str) -> int:
    return _compaction_state(io, counts_path)[0]


def _publish_compaction_state(
    io, counts_path: str, *, upto: int, baseline: int, generation: int
) -> None:
    """Atomic watermark publish — the single commit point of a
    compaction. Split out so the crash-window test can fail exactly
    here and prove the re-run is exact."""
    root = counts_path.rstrip("/")
    markdir = f"{root}/{_COMPACT_DIR}"
    io.mkdirs(markdir)
    body = json.dumps(
        {"upto": int(upto), "baseline": int(baseline),
         "generation": int(generation)}
    )
    if not io.publish_exclusive(f"{markdir}/{_gen_name(generation)}", body):
        raise RuntimeError(
            f"compaction generation {generation} already published under "
            f"{markdir} — a concurrent compactor violated the single-"
            "maintenance-writer discipline"
        )


def _counts_exist(io, counts_path: str) -> bool:
    # URI-safe existence check (os.path-based upsert.table_exists is
    # always False on hdfs://-style paths): any batch=<id> partition
    # directory (baseline included) means there are counts.
    if not io.isdir(counts_path):
        return False
    return any(n.startswith("batch=") for n in io.listdir(counts_path))


def _landed_batch_ids(io, counts_path: str) -> list[int]:
    if not io.isdir(counts_path):
        return []
    out = []
    for n in io.listdir(counts_path):
        if n.startswith("batch="):
            try:
                out.append(int(n.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


def read_token_counts(spark, counts_path: str) -> DataFrame:
    """The (cls, tok, cnt) view of an incremental counts table,
    CORRECT AT ANY CRASH POINT of :func:`compact_token_counts`: the
    watermark names both the baseline generation AND the fold
    horizon in one atomically-published body, so reads see either
    (old baseline + all batches above the old horizon) or (new
    baseline + batches above the new horizon) — never a merged
    baseline together with the still-live directories it folded, and
    never a folded-but-undeleted directory (crash between watermark
    publish and cleanup). The filter is on the partition column —
    Catalyst prunes every stale directory's files out of the scan
    entirely."""
    from meteo_etl_spark.operators.fsio import io_for

    upto, baseline, _ = _compaction_state(
        io_for(counts_path, spark), counts_path
    )
    return (
        spark.read.parquet(counts_path)
        .where((F.col("batch") == baseline) | (F.col("batch") > upto))
        .select("cls", "tok", "cnt")
    )


def _compaction_cleanup(
    io, root: str, *, upto: int, baseline: int, generation: int
) -> None:
    """Remove everything the current watermark already excludes:
    folded batch dirs, superseded baseline partitions, the legacy
    single-file watermark, and older generation files. Safe at any
    crash point — reads never see any of these."""
    for i in _landed_batch_ids(io, root):
        if (0 <= i <= upto) or (i < 0 and i != baseline):
            io.rmtree(f"{root}/batch={i}")
    markdir = f"{root}/{_COMPACT_DIR}"
    if generation >= 1:
        try:
            names = [n for n in io.listdir(markdir) if n.startswith("gen-")]
        except FileNotFoundError:
            names = []
        for n in names:
            if n[4:].isdigit():
                if int(n[4:]) < generation:
                    io.unlink(f"{markdir}/{n}")
            elif ".tmp-" in n:
                # stranded publish_exclusive staging file (crash inside
                # a publish) — invisible to readers, GC'd here
                io.unlink(f"{markdir}/{n}")
        if io.isfile(f"{root}/{_COMPACT_MARK}"):
            io.unlink(f"{root}/{_COMPACT_MARK}")


def compact_token_counts(spark, counts_path: str, *, keep_last: int = 1) -> int:
    """Fold old count-delta partitions into a generation-tagged
    baseline (counts are associative, so the fold is exact) — the
    maintenance half of :func:`classifier_retrain_foreach_batch`,
    bounding the model-derive read at vocabulary-size + ``keep_last``
    partitions however long the stream runs.

    The newest ``keep_last`` batches are NEVER folded: under
    Structured Streaming's monotonic batch-id contract only the last
    uncommitted batch can be redelivered after a restart, and a
    redelivery must still find (and replace) its own partition.

    Crash safety, in commit order (the baseline swap is atomic WITH
    the watermark — ADVICE r11 high):

    1. the merged counts land under the NEXT generation's baseline
       partition ``batch=-(gen+1)`` — a partition no reader selects
       yet (the live watermark still names the old baseline and old
       horizon), so a crash before/during/after this write changes
       nothing a reader sees, and a re-run replaces the partition
       wholesale via dynamic partition overwrite instead of folding
       into an already-merged baseline;
    2. ONE watermark file ``_compaction/gen-<k>`` carrying
       ``{upto, baseline, generation}`` is published via
       ``publish_exclusive`` (atomic no-overwrite create with full
       content — never delete+rename, so no crash leaves a missing
       watermark; ADVICE r11 low). The instant it lands, reads flip
       to the new baseline AND stop seeing the folded batch dirs —
       there is no state where both are visible;
    3. cleanup deletes the folded directories, the superseded
       baseline partition and older generation files — a crash
       before this leaves stale data that reads already ignore and
       the next compaction re-deletes.

    Single-maintenance-writer discipline (same as atomic vacuum): one
    compactor at a time, and not concurrent with a foreachBatch
    refresh of the SAME table — a racing compactor fails loudly on
    the exclusive watermark publish.

    Returns the new watermark (highest batch id folded), or the old
    one when there is nothing to fold."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    from meteo_etl_spark.operators.fsio import io_for

    io = io_for(counts_path, spark)
    root = counts_path.rstrip("/")
    upto_old, base_old, gen_old = _compaction_state(io, counts_path)
    ids = [i for i in _landed_batch_ids(io, counts_path) if i >= 0]
    fresh = [i for i in ids if i > upto_old]
    candidates = fresh[:-keep_last] if len(fresh) > keep_last else []
    if not candidates:
        # finish an interrupted cleanup under the live watermark
        _compaction_cleanup(
            io, root, upto=upto_old, baseline=base_old, generation=gen_old
        )
        return upto_old
    new_upto = max(candidates)
    gen_new = gen_old + 1
    base_new = -(gen_new + 1)
    merged = (
        spark.read.parquet(counts_path)
        .where(
            (F.col("batch") == base_old)
            | F.col("batch").isin([int(i) for i in candidates])
        )
        .groupBy("cls", "tok")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .withColumn("batch", F.lit(base_new))
        .localCheckpoint(eager=True)  # sever lineage: we overwrite our input
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(counts_path)
    )
    _publish_compaction_state(
        io, counts_path, upto=new_upto, baseline=base_new, generation=gen_new
    )
    _compaction_cleanup(
        io, root, upto=new_upto, baseline=base_new, generation=gen_new
    )
    return new_upto


#: character n-gram width for the hashed-subword feature space
#: (fastText convention: tokens padded with boundary markers, so
#: "<to", "tok", "ok>" carry prefix/suffix morphology).
CHAR_NGRAM_N = 3

#: hashed-feature bucket count. A power of two divides 2^32 evenly,
#: so the 32-bit md5 bucket idiom has ZERO modulo bias here; the
#: model is at most (classes x 4096) rows regardless of vocabulary —
#: the bounded-feature-space property that makes subword models cheap
#: to broadcast at 100 TB.
CHAR_FEAT_BUCKETS = 4096


def _char_features(tok):
    """array<string> of boundary-padded character n-grams for one
    token: ``aa`` → ``['<aa', 'aa>']`` (positions 1..len(padded)-N+1;
    tokens shorter than N-2 chars yield one truncated gram, same in
    both engines — substr past the end returns what exists)."""
    padded = F.concat(F.lit("<"), tok, F.lit(">"))
    n_pos = F.greatest(
        F.length(padded) - (CHAR_NGRAM_N - 1), F.lit(1)
    )
    return F.transform(
        F.sequence(F.lit(1), n_pos),
        lambda i: padded.substr(i, F.lit(CHAR_NGRAM_N)),
    )


def train_char_ngram_counts(
    train: DataFrame, *, class_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """(cls, feat, cnt) sufficient statistic of the HASHED-SUBWORD
    classifier: every token expands to its boundary-padded character
    n-grams, each gram hashes into one of ``CHAR_FEAT_BUCKETS``
    feature ids (the shared 32-bit md5 idiom — oracle-identical), and
    the counts aggregate map-side. Same associativity property as
    :func:`train_token_counts`, so the incremental-retrain machinery
    applies unchanged."""
    from meteo_etl_spark.functions.sampling import hash_bucket

    toks = train.select(
        F.col(class_col).alias("cls"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    feats = toks.select(
        "cls", F.explode(_char_features(F.col("tok"))).alias("gram")
    )
    return (
        feats.select(
            "cls",
            hash_bucket(F.col("gram"), CHAR_FEAT_BUCKETS).alias("feat"),
        )
        .groupBy("cls", "feat")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_char_ngram_centroids(
    train: DataFrame, *, class_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """The hashed character-n-gram twin of
    :func:`train_token_centroids`: one (cls, feat, freq_ppm) row per
    class and feature bucket — fastText-shaped subword features, so
    the model scores tokens it has NEVER SEEN whenever they share
    character patterns (morphology, script, affixes) with the
    training classes, where the whole-token model can only answer
    ``(oov)``. Same one-pass training, same integer-ppm quantization,
    same ReuseExchange plan shape — literally the same derivation code
    (:func:`model_from_counts` with ``token_col="feat"``)."""
    return model_from_counts(
        train_char_ngram_counts(train, class_col=class_col, text_col=text_col),
        token_col="feat",
    )


def score_documents_chargram(
    docs: DataFrame,
    model: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a hashed-subword model: (id, pred_cls, score) per input
    document; score = sum(feature_tf * freq_ppm), argmax ties to the
    lexicographically smallest class — identical contract to
    :func:`score_documents`, but a document is ``(oov)`` only when it
    shares NO feature bucket with training (practically never: any
    character trigram the training corpus produced anywhere counts)."""
    from meteo_etl_spark.functions.sampling import hash_bucket

    toks = docs.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    tf = (
        toks.select(
            id_col, F.explode(_char_features(F.col("tok"))).alias("gram")
        )
        .select(
            id_col,
            hash_bucket(F.col("gram"), CHAR_FEAT_BUCKETS).alias("feat"),
        )
        .groupBy(id_col, "feat")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    num = (
        tf.join(model, "feat")
        .groupBy(id_col, "cls")
        .agg(F.sum(F.col("tf") * F.col("freq_ppm")).alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("cls").asc()
    )
    pred = (
        num.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(id_col, F.col("cls").alias("pred_cls"), "score")
    )
    # Same single-evaluation outer-join shape as score_documents: the
    # union(pred, anti-join) form computed the scoring subtree twice.
    return (
        docs.select(id_col)
        .join(pred, id_col, "left")
        .select(
            id_col,
            F.coalesce("pred_cls", F.lit(OOV_LABEL)).alias("pred_cls"),
            F.coalesce("score", F.lit(0).cast("long")).alias("score"),
        )
    )


def chargram_confusion(
    docs: DataFrame,
    *,
    class_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    train_frac: float = 0.8,
) -> DataFrame:
    """Hashed-subword twin of :func:`classifier_confusion`: same hash
    split, char-n-gram training, char-n-gram scoring, confusion
    matrix out."""
    test_frac = round(1.0 - train_frac, 9)
    split = hash_split(docs, id_col, {"train": train_frac, "test": test_frac})
    train = split.where(F.col("split") == "train")
    test = split.where(F.col("split") == "test")
    model = train_char_ngram_centroids(
        train, class_col=class_col, text_col=text_col
    )
    scored = score_documents_chargram(
        test, model, id_col=id_col, text_col=text_col
    )
    return (
        test.select(id_col, F.col(class_col).alias("true_cls"))
        .join(scored, id_col)
        .groupBy("true_cls", "pred_cls")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def chargram_report(
    docs: DataFrame,
    *,
    class_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    train_frac: float = 0.8,
) -> DataFrame:
    """Per-class precision/recall for the hashed-subword classifier —
    the same derivation as :func:`classifier_report`, over
    :func:`chargram_confusion`."""
    return _report_from_confusion(
        chargram_confusion(
            docs,
            class_col=class_col,
            id_col=id_col,
            text_col=text_col,
            train_frac=train_frac,
        )
    )


def classifier_confusion(
    docs: DataFrame,
    *,
    class_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    train_frac: float = 0.8,
) -> DataFrame:
    """End-to-end train/evaluate: hash-split the labeled corpus
    (reproducible, coordination-free — functions/sampling), train on
    the train split, score the held-out split, and return the
    confusion matrix (true_cls, pred_cls, n_docs) — integer-only.
    """
    test_frac = round(1.0 - train_frac, 9)
    split = hash_split(docs, id_col, {"train": train_frac, "test": test_frac})
    train = split.where(F.col("split") == "train")
    test = split.where(F.col("split") == "test")
    model = train_token_centroids(train, class_col=class_col, text_col=text_col)
    scored = score_documents(test, model, id_col=id_col, text_col=text_col)
    return (
        test.select(id_col, F.col(class_col).alias("true_cls"))
        .join(scored, id_col)
        .groupBy("true_cls", "pred_cls")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


#: calibration bins: conf_ppm in [0, 1e6] -> deciles 0..9 (capped);
#: bin -1 collects zero-overlap / zero-mass documents (no confidence
#: is defined there — reporting them in-band would poison decile 0).
CAL_BINS = 10


def classifier_calibration(
    docs: DataFrame,
    *,
    class_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    train_frac: float = 0.8,
) -> DataFrame:
    """Reliability (calibration) table for the token classifier — the
    standard eval artifact beside the confusion matrix: hash-split,
    train, score the held-out split, derive a per-document integer
    confidence conf_ppm = top_score * 1e6 div sum(scores) (the argmax
    class's share of total score mass), bucket into deciles, and
    report per bin: n_docs, n_correct, sum_conf_ppm, acc_ppm. A
    well-calibrated filter has acc_ppm tracking the bin's mean
    confidence — THE table a curation pipeline reads before trusting
    classifier scores as keep/drop thresholds (FineWeb-Edu style
    score-gating assumes it). Integer-exact end to end: confidence is
    one BIGINT division, bins are integer div, accuracy uses the
    repo's half-up ppm idiom — both engines agree bit-for-bit.
    Plan: same shape as classifier_confusion plus one doc_id-grouped
    aggregate; the bin table is <= 11 rows."""
    test_frac = round(1.0 - train_frac, 9)
    split = hash_split(docs, id_col, {"train": train_frac, "test": test_frac})
    train = split.where(F.col("split") == "train")
    test = split.where(F.col("split") == "test")
    model = train_token_centroids(train, class_col=class_col, text_col=text_col)
    num = _doc_class_scores(test, model, id_col=id_col, text_col=text_col)
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("cls").asc()
    )
    per_doc = (
        num.withColumn("rk", F.row_number().over(w))
        .groupBy(id_col)
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("cls"))).alias("pred_cls"),
            F.max(F.when(F.col("rk") == 1, F.col("score"))).alias("top_score"),
            F.sum("score").cast("long").alias("tot_score"),
        )
    )
    lab = test.select(id_col, F.col(class_col).alias("true_cls")).join(
        per_doc, id_col, "left"
    )
    has_mass = F.col("tot_score").isNotNull() & (F.col("tot_score") > 0)
    conf = F.expr("top_score * 1000000 div tot_score")
    bin_width = 1_000_000 // CAL_BINS
    binned = lab.select(
        F.when(~has_mass, F.lit(-1))
        .otherwise(
            F.expr(
                "least(top_score * 1000000 div tot_score, "
                f"{1_000_000 - 1}) div {bin_width}"
            )
        )
        .cast("long")
        .alias("bin"),
        F.when(
            F.col("pred_cls").isNotNull()
            & (F.col("pred_cls") == F.col("true_cls")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("correct"),
        F.when(~has_mass, F.lit(0).cast("long"))
        .otherwise(conf)
        .alias("conf_ppm"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("correct").cast("long").alias("n_correct"),
            F.sum("conf_ppm").cast("long").alias("sum_conf_ppm"),
        )
        .select(
            "bin",
            "n_docs",
            "n_correct",
            "sum_conf_ppm",
            F.expr(
                "(2 * 1000000 * n_correct + n_docs) div (2 * n_docs)"
            ).alias("acc_ppm"),
        )
        .orderBy("bin")
    )

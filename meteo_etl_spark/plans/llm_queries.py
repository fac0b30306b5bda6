"""Training-data pipeline query surface (SURVEY.md §2.4, BASELINE.json
north-star): dedup, similarity search, text analysis, multimodal.

Every oracle below is generated from the SAME constants (hash salts,
thresholds, LSH planes, stopword lists) as the Spark implementation in
``meteo_etl_spark/functions/*`` — both engines run the same
deterministic algorithm, so even the probabilistic-looking sketches
(MinHash-LSH, SimHash, hyperplane-LSH) hash-match exactly.

Floating-point parity: all vector math folds sequentially from 0.0 on
both sides (Spark ``aggregate``; DuckDB ``list_reduce(list_prepend(...))``)
so summation order — and therefore the last ulp — is identical.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from meteo_etl_spark.functions.epoch import epoch_ms, epoch_us
from meteo_etl_spark.functions.lits import dlit, ilit
from meteo_etl_spark.functions.classify import (
    CHAR_FEAT_BUCKETS as _CLS_CHAR_BUCKETS,
    SIGNAL_DEN as _CLS_SIGNAL_DEN,
)
from meteo_etl_spark.functions import clustering as cl
from meteo_etl_spark.functions import dedup as dd
from meteo_etl_spark.functions import multimodal as mm
from meteo_etl_spark.functions import packing as pk
from meteo_etl_spark.functions import similarity as sim
from meteo_etl_spark.functions import sketches as sk
from meteo_etl_spark.functions import text as tx
from meteo_etl_spark.operators.parallelism import fan_out
from meteo_etl_spark.plans.queries import query
from meteo_etl_spark.sources.testdata import load_table

# ---------------------------------------------------------------------------
# DuckDB SQL fragment generators (shared-constant mirrors of functions/*)
# ---------------------------------------------------------------------------

_DIM = sim.EMBEDDING_DIM


def _duck_dot(a: str, b: str) -> str:
    """Sequential left fold from 0.0 — same order as similarity.dot."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {_DIM + 1}), "
        f"i -> ({a})[i] * ({b})[i])), (acc, x) -> acc + x)"
    )


def _duck_plane(table: int, plane: int) -> str:
    vals = ", ".join(str(w) for w in sim.hyperplane(table, plane))
    return f"([{vals}]::DOUBLE[])"


def _duck_bucket(v: str, table: int, planes: int | None = None) -> str:
    bits = ", ".join(
        f"CASE WHEN {_duck_dot(v, _duck_plane(table, p))} > 0 THEN '1' ELSE '0' END"
        for p in range(planes if planes is not None else sim.LSH_PLANES)
    )
    return f"concat({bits})"


def _duck_hamming(a: str, b: str, bits: int = sim.LSH_PLANES) -> str:
    """Positional Hamming distance between two bit strings — mirrors
    similarity._hamming (``bits`` substring compares; defaults to the
    base LSH route's plane count). The ONLY definition — callers for
    the tuned route pass their own ``bits``."""
    terms = " + ".join(
        f"(CASE WHEN substr({a}, {p + 1}, 1) <> substr({b}, {p + 1}, 1) "
        "THEN 1 ELSE 0 END)"
        for p in range(bits)
    )
    return f"({terms})"


_K = dd.SHINGLE_K
# toks/sh CTEs shared by the shingle-based dedups (k = SHINGLE_K).
# The shingle rolling-combine arithmetic comes verbatim from
# dedup.shingle_rolling_expr (same constants, same parenthesization);
# only the list-indexing builtin is renamed for the DuckDB dialect.
_ROLL = dd.shingle_rolling_expr("v", "i").replace("element_at", "list_extract")
_DUCK_SHINGLES = f"""
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
hv AS (SELECT doc_id,
              list_transform(w, t -> ('0x' || substr(md5(t), 1, 7))::BIGINT) AS v
       FROM toks),
sh AS (SELECT doc_id,
              list_distinct(list_transform(range(1, len(v) - {_K - 2}),
                            i -> {_ROLL})) AS s
       FROM hv WHERE len(v) >= {_K}),
ex AS (SELECT doc_id, UNNEST(s) AS tok FROM sh),
cnt AS (SELECT doc_id, len(s) AS n FROM sh)
"""

_DUCK_JACCARD_TAIL = f"""
SELECT doc_a, doc_b,
       ROUND(CAST(c AS DOUBLE) / CAST(p.n + q.n - c AS DOUBLE), 3) AS jaccard
FROM common JOIN cnt p ON p.doc_id = doc_a JOIN cnt q ON q.doc_id = doc_b
WHERE CAST(c AS DOUBLE) / CAST(p.n + q.n - c AS DOUBLE) >= {dd.JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


def _duck_minhash_sig() -> str:
    """Integer minhashes over the integer shingle keys ``s`` (mirror
    of dedup.minhash_band_keys: hash h = min of (a_h*x + b_h) mod P,
    same md5-derived constants)."""
    mins = [
        f"list_min(list_transform(s, x -> (x * {a} + {b}) % {dd.MINHASH_PRIME}))"
        for a, b in dd.minhash_params()
    ]
    return f"[{', '.join(mins)}]"


# Shared by dedup_minhash_lsh and corpus_clean: shingle->int hashes,
# signatures, band keys, bucket-join candidates, intersect-verified
# common counts (mirror of dedup.minhash_lsh_pairs + _pair_jaccard's
# candidate path).
_DUCK_MINHASH_CTES = f"""
    sig AS (SELECT doc_id, {_duck_minhash_sig()} AS m FROM sh),
    bands AS (SELECT doc_id, b,
                     md5(m[2*b+1]::VARCHAR || '|' || m[2*b+2]::VARCHAR) AS key
              FROM sig, UNNEST(range(0, {dd.MINHASH_BANDS})) AS u(b)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, bb.doc_id AS doc_b
             FROM bands a JOIN bands bb
               ON a.b = bb.b AND a.key = bb.key AND a.doc_id < bb.doc_id),
    common AS (SELECT cd.doc_a, cd.doc_b, len(list_intersect(p.s, q.s)) AS c
               FROM cand cd
               JOIN sh p ON p.doc_id = cd.doc_a
               JOIN sh q ON q.doc_id = cd.doc_b)"""


def _duck_simhash_bits() -> str:
    exprs = ", ".join(
        "CASE WHEN CAST(list_sum(list_transform(h, x -> "
        f"CASE WHEN ascii(substr(x, {b}, 1)) >= 56 THEN 1 ELSE -1 END)) AS BIGINT) > 0 "
        "THEN '1' ELSE '0' END"
        for b in range(1, dd.SIMHASH_BITS + 1)
    )
    return f"concat({exprs})"


_STOP_HITS = {
    lang: "len(list_filter(string_split(text, ' '), t -> t IN ({})))".format(
        ", ".join(f"'{w}'" for w in words)
    )
    for lang, words in tx.STOPWORDS.items()
}


def _duck_lang_case() -> str:
    total = " + ".join(f"h_{lang}" for lang in tx.LANGS)
    whens = []
    for lang in tx.LANGS[:-1]:
        cond = " AND ".join(
            f"h_{lang} >= h_{other}" for other in tx.LANGS if other != lang
        )
        whens.append(f"WHEN {cond} THEN '{lang}'")
    return (
        f"CASE WHEN {total} = 0 THEN 'und' "
        + " ".join(whens)
        + f" ELSE '{tx.LANGS[-1]}' END"
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "text_token_stats",
    f"""SELECT doc_id,
              len(string_split(text, ' ')) AS n_tokens,
              len(regexp_extract_all(text, '{tx.BPE_PATTERN}')) AS n_bpe,
              ROUND((length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
                    / len(string_split(text, ' ')), 3) AS mean_token_len
       FROM documents ORDER BY doc_id""",
    doc="Token counting: whitespace tokens + BPE-ish regex pre-tokens + "
    "mean token length, all codegen'd expressions — the per-document "
    "stats a data-mix pipeline keys on. No shuffle (pure map).",
    bench=True,
)
def text_token_stats(spark, sf_dir):
    c = F.col("text")
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            tx.token_count(c).alias("n_tokens"),
            tx.bpe_token_count(c).alias("n_bpe"),
            F.round(tx.mean_token_len(c), 3).alias("mean_token_len"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_lang_id",
    f"""SELECT doc_id, {_duck_lang_case().replace('h_', '__h_')} AS lang_pred
       FROM (SELECT doc_id,
                    {', '.join(f'{expr} AS __h_{lang}' for lang, expr in _STOP_HITS.items())}
             FROM documents)
       ORDER BY doc_id""",
    doc="Language-ID: stopword-profile argmax with deterministic "
    "tie-break (n-gram heuristic family). Pure map; the profile table "
    "is a compile-time constant, not a join.",
)
def text_lang_id(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tx.lang_id(F.col("text")).alias("lang_pred"))
        .orderBy("doc_id")
    )


@query(
    "text_quality",
    """SELECT doc_id, score,
              score >= 0.5 AS keep
       FROM (SELECT doc_id,
                    CAST(floor((0.4 * least((__h * 1.0 / __n) * 5, 1.0)
                        + 0.3 * least(__n / 100.0, 1.0)
                        + 0.3 * least(((length(text) - (__n - 1)) * 1.0 / __n) / 8.0, 1.0))
                        * 10000.0 + 0.5) AS BIGINT) / 10000.0 AS score
             FROM (SELECT doc_id, text,
                          {hits} AS __h,
                          len(string_split(text, ' ')) AS __n
                   FROM documents))
       ORDER BY doc_id""".format(hits=_STOP_HITS["en"]),
    doc="Quality scoring: saturated blend of stopword density, length, "
    "and mean token length (Gopher/C4-style filters) + the keep flag "
    "a filtering pipeline would apply. Pure map.",
)
def text_quality(spark, sf_dir):
    score = tx.quality_score(F.col("text"))
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", score.alias("score"))
        .withColumn("keep", F.col("score") >= 0.5)
        .orderBy("doc_id")
    )


@query(
    "text_fingerprint",
    f"""SELECT doc_id,
              list_reduce(
                list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(text, ' '),
                                 t -> CAST(ascii(t) * 131 + length(t) AS BIGINT))),
                (acc, x) -> (acc * {tx.FP_BASE} + x) % {tx.FP_MOD}) AS fp
       FROM documents ORDER BY doc_id""",
    doc="Document fingerprinting: Karp-Rabin-style rolling hash over "
    "tokens (order-sensitive). Exact-dup detection joins on fp instead "
    "of the full text — constant-width shuffle keys at 100 TB.",
)
def text_fingerprint(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tx.fingerprint(F.col("text")).alias("fp"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    """SELECT md5(text) AS digest, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
       FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
       GROUP BY 1 ORDER BY keep_id""",
    doc="Exact dedup by content digest over a doubled corpus (the "
    "testdata has no planted exact dups, so the union provides them): "
    "hash-groupBy, map-side partial agg, one shuffle on the digest. "
    "The 100 TB workhorse — digest keys are 32 bytes regardless of "
    "document size.",
    bench=True,
)
def dedup_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        dd.exact_dedup(docs.unionAll(docs), "text", "doc_id")
        .orderBy("keep_id")
    )


@query(
    "dedup_ngram_jaccard",
    f"WITH {_DUCK_SHINGLES},"
    """common AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
                  FROM ex x JOIN ex y ON x.tok = y.tok AND x.doc_id < y.doc_id
                  GROUP BY 1, 2)"""
    f"{_DUCK_JACCARD_TAIL}",
    doc="N-gram (3-word shingle) Jaccard near-dup pairs via the "
    "shingle inverted index, over integer shingle keys (md5 token "
    "hashes + rolling combine — see functions/dedup; ~2^-31 collision "
    "odds, mirrored exactly by the oracle). Quadratic in co-shingled "
    "pairs — the exhaustive baseline the LSH variant is checked "
    "against. At 100 TB you'd cap shingle document-frequency first.",
)
def dedup_ngram_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(docs).orderBy("doc_a", "doc_b")


@query(
    "dedup_minhash_lsh",
    f"WITH {_DUCK_SHINGLES},{_DUCK_MINHASH_CTES}"
    f"{_DUCK_JACCARD_TAIL}",
    doc=f"MinHash({dd.MINHASH_HASHES} integer affine hashes over the "
    f"integer shingle keys) + LSH({dd.MINHASH_BANDS} bands × "
    f"{dd.MINHASH_HASHES // dd.MINHASH_BANDS} rows) candidates, "
    "exact-Jaccard verify (array_intersect) on candidates only — the "
    "sub-quadratic near-dup path. The oracle runs the same "
    "deterministic sketch, so the match is exact, not statistical.",
    bench=True,
)
def dedup_minhash_lsh(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_pairs(docs).orderBy("doc_a", "doc_b")


@query(
    "dedup_simhash",
    f"""WITH hs AS (SELECT doc_id,
                         list_transform(string_split(text, ' '), t -> md5(t)) AS h
                  FROM documents),
    sims AS (SELECT doc_id, {_duck_simhash_bits()} AS sim FROM hs),
    bands AS (SELECT doc_id, b,
                     substr(sim, b * {dd.SIMHASH_BITS // dd.SIMHASH_BANDS} + 1,
                            {dd.SIMHASH_BITS // dd.SIMHASH_BANDS}) AS key
              FROM sims, UNNEST(range(0, {dd.SIMHASH_BANDS})) AS u(b)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, bb.doc_id AS doc_b
             FROM bands a JOIN bands bb
               ON a.b = bb.b AND a.key = bb.key AND a.doc_id < bb.doc_id),
    pairs AS (SELECT doc_a, doc_b,
                     CAST(list_sum(list_transform(range(1, {dd.SIMHASH_BITS + 1}),
                          i -> CASE WHEN substr(sa.sim, i, 1) = substr(sb.sim, i, 1)
                                    THEN 0 ELSE 1 END)) AS INTEGER) AS hamming
              FROM cand JOIN sims sa ON sa.doc_id = doc_a
                        JOIN sims sb ON sb.doc_id = doc_b)
    SELECT doc_a, doc_b, hamming FROM pairs
    WHERE hamming <= {dd.SIMHASH_MAX_HAMMING} ORDER BY doc_a, doc_b""",
    doc=f"SimHash({dd.SIMHASH_BITS}-bit md5 votes) near-dup pairs with "
    f"Hamming <= {dd.SIMHASH_MAX_HAMMING}; candidates from "
    f"{dd.SIMHASH_BANDS} exact-match bit-band joins — lossless by "
    "pigeonhole (<= bands-1 diffs leave one band identical), so the "
    "banding is a pure pruning step, never a recall loss.",
)
def dedup_simhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash_pairs(docs).orderBy("doc_a", "doc_b")


@query(
    "dedup_embedding_cosine",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt({_duck_dot('v', 'v')}) AS nrm FROM v),
    p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 {_duck_dot('a.v', 'b.v')} / (a.nrm * b.nrm) AS cos_raw
          FROM n a JOIN n b ON a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, ROUND(cos_raw, 4) AS cos FROM p
    WHERE cos_raw >= {dd.COSINE_DUP_THRESHOLD} ORDER BY vec_a, vec_b""",
    doc="Embedding-cosine near-dup pairs (norms precomputed per vector, "
    "sequential-fold dot products). All-pairs is the oracle-checked "
    "baseline; the scale path routes through hyperplane buckets first "
    "(see sim_ann_lsh) exactly like MinHash-LSH prunes Jaccard.",
)
def dedup_embedding_cosine(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return dd.embedding_cosine_pairs(emb).orderBy("vec_a", "vec_b")


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@query(
    "sim_topk_cosine",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
    s AS (SELECT vec_id,
                 {_duck_dot('v', 'qv')} / (sqrt({_duck_dot('v', 'v')}) * sqrt({_duck_dot('qv', 'qv')})) AS sim_raw
          FROM v, q WHERE vec_id <> 0)
    SELECT vec_id, ROUND(sim_raw, 6) AS sim FROM s
    ORDER BY sim_raw DESC, vec_id LIMIT 10""",
    doc="Brute-force cosine top-k (k=10, query = vec_id 0): broadcast "
    "the query vector, one embarrassingly-parallel scan, "
    "TakeOrderedAndProject top-k (per-partition heaps, no global "
    "sort). The exactness baseline for ANN.",
    bench=True,
)
def sim_topk_cosine(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.brute_force_topk(emb, query_id=0, k=10)


@query(
    "emb_hygiene_audit",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v
             FROM embeddings),
    n AS (SELECT vec_id,
                 CAST(ROUND(sqrt({_duck_dot('v', 'v')}) * 1000000)
                      AS BIGINT) AS norm_u
          FROM v),
    r AS (SELECT norm_u,
                 ROW_NUMBER() OVER (ORDER BY norm_u, vec_id) AS rn,
                 COUNT(*) OVER () AS cnt
          FROM n)
    SELECT CAST(d AS BIGINT) AS decile,
           MAX(CASE WHEN rn = CASE WHEN d = 0 THEN 1
                                   ELSE (d * cnt + 9) // 10 END
                    THEN norm_u END) / 1000000.0 AS norm
    FROM r, UNNEST(range(0, 11)) AS g(d)
    GROUP BY d ORDER BY d""",
    doc="Embedding hygiene audit — the index-readiness gate run "
    "BEFORE any ANN build: the query RAISES in-query (RuntimeError) "
    "if ANY vector is non-finite, wrongly-sized, or zero-norm — the "
    "three states that silently poison cosine routing (NaN compares "
    "false everywhere, a zero vector divides to NaN at rank time, a "
    "short vector reads nulls under the band/subspace layouts the "
    "sign-band validator guards against) — and returns the exact "
    "nearest-rank norm deciles (min..max), the scale table that "
    "decides whether SQ8 ranges / int8 scales need retraining. "
    "Determinism: norms are the oracle-parity sequential fold, "
    "integer-microscaled before ranking (Type-1 nearest-rank, the "
    "events_value_percentiles discipline). Plan: ONE corpus scan for "
    "the three gate counters and the norm projection, then the "
    "bounded-memory bracket+refine rank pick "
    "(operators/quantiles.exact_nearest_rank — sketch locates, exact "
    "counts answer) over integer norms; the first cut ranked with a "
    "full-corpus ``row_number().over(Window.orderBy(...))``, which "
    "plans a single-partition WindowExec — one executor sorts every "
    "embedding row at 100 TB (r13 verdict 'what's wrong' #2). Now no "
    "global sort anywhere: every pass is a map+partial-aggregate job "
    "and only the 11-row decile table plus an O(slice) bracket ever "
    "leave the executors.",
    bench=True,
)
def emb_hygiene_audit(spark, sf_dir):
    from meteo_etl_spark.operators.quantiles import exact_nearest_rank

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    base = fan_out(emb).select("vec_id", v.alias("v"))
    gate = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.size("v") != sim.EMBEDDING_DIM).cast("int")
        ).alias("n_badsize"),
        F.sum(
            F.exists(
                "v", lambda x: x.isNaN() | (F.abs(x) == float("inf"))
            ).cast("int")
        ).alias("n_nonfinite"),
        F.sum((sim.dot(F.col("v"), F.col("v")) == 0.0).cast("int")).alias(
            "n_zero"
        ),
    ).collect()[0]
    if gate["n_badsize"] or gate["n_nonfinite"] or gate["n_zero"]:
        raise RuntimeError(
            "embedding corpus fails the index-readiness gate: "
            f"{gate['n_badsize']} wrong-dim, {gate['n_nonfinite']} "
            f"non-finite, {gate['n_zero']} zero-norm of {gate['n']}"
        )
    n = gate["n"]
    norms = base.select(
        F.round(sim.norm(F.col("v")) * 1000000).cast("long").alias("norm_u")
    )
    # Type-1 nearest-rank targets: decile 0 = min (rank 1), decile d =
    # rank ceil(d*n/10). Ties on norm_u need no vec_id tiebreak — equal
    # norm_u values are indistinguishable in the output.
    ranks = [1] + [(d * n + 9) // 10 for d in range(1, 11)]
    picked = exact_nearest_rank(norms, "norm_u", ranks, n=n)
    return spark.createDataFrame(
        [(d, u / 1000000.0) for d, u in zip(range(11), picked)],
        schema="decile long, norm double",
    ).orderBy("decile")


#: metadata predicate for the filtered-search demo and the panel size
#: for hard-negative mining (data-independent constants, like the
#: recall-audit panel).
_FILTERED_LABEL = 3
_HARDNEG_PANEL = 5
_HARDNEG_K = 3


@query(
    "sim_filtered_topk",
    f"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
             FROM embeddings),
    q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
    s AS (SELECT vec_id,
                 {_duck_dot('v', 'qv')} / (sqrt({_duck_dot('v', 'v')}) * sqrt({_duck_dot('qv', 'qv')})) AS sim_raw
          FROM v, q WHERE vec_id <> 0 AND label = {_FILTERED_LABEL})
    SELECT vec_id, ROUND(sim_raw, 6) AS sim FROM s
    ORDER BY sim_raw DESC, vec_id LIMIT 5""",
    doc="Metadata-FILTERED vector search (query = vec 0, candidates "
    f"restricted to label = {_FILTERED_LABEL}) — the filter+vector "
    "combination every retrieval store serves (tenant/language/"
    "source-scoped search). The predicate applies BEFORE any vector "
    "math: a plain column filter the scan pushes down "
    "(PushedFilters), so at 100 TB the kernel touches only the "
    "matching selectivity fraction — with a label-partitioned or "
    "bucketed layout it prunes to those files outright. Exactness "
    "baseline for a filtered ANN route; top-k is "
    "TakeOrderedAndProject.",
    bench=True,
)
def sim_filtered_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    corpus = fan_out(emb).select("vec_id", "label", v.alias("v"))
    q = corpus.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    return (
        corpus.filter(
            (F.col("vec_id") != 0) & (F.col("label") == _FILTERED_LABEL)
        )
        .join(F.broadcast(q))
        .select("vec_id", sim.cosine(F.col("v"), F.col("qv")).alias("sim_raw"))
        .orderBy(F.desc("sim_raw"), "vec_id")
        .limit(5)
        .select("vec_id", F.round("sim_raw", 6).alias("sim"))
    )


@query(
    "sim_hard_negatives",
    f"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
             FROM embeddings),
    p AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv
          FROM v WHERE vec_id < {_HARDNEG_PANEL}),
    s AS (SELECT p.query_id, v.vec_id,
                 {_duck_dot('v.v', 'p.qv')} / (sqrt({_duck_dot('v.v', 'v.v')}) * sqrt({_duck_dot('p.qv', 'p.qv')})) AS sim_raw
          FROM v, p
          WHERE v.vec_id <> p.query_id AND v.label <> p.qlabel),
    r AS (SELECT query_id, vec_id, sim_raw,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY sim_raw DESC, vec_id) AS rnk
          FROM s)
    SELECT query_id, CAST(rnk AS BIGINT) AS rnk, vec_id,
           ROUND(sim_raw, 6) AS sim
    FROM r WHERE rnk <= {_HARDNEG_K}
    ORDER BY query_id, rnk""",
    doc="Hard-negative mining (the contrastive-training batch "
    f"constructor): for each of {_HARDNEG_PANEL} anchor vectors, the "
    f"top-{_HARDNEG_K} most-similar vectors with a DIFFERENT label — "
    "the near-miss negatives that make an embedding model learn "
    "boundaries (random negatives are too easy; the highest-cosine "
    "wrong-label neighbors carry the gradient signal). Plan: the "
    "panel is a broadcast k-row relation crossed into one corpus "
    "scan (the recall-audit shape), label mismatch filters before "
    "ranking, and the per-anchor top-k is one window over "
    "panel-keyed partitions — at 100 TB the corpus is read once for "
    "the whole panel, and a real mining run swaps the brute-force "
    "scan for the IVF/LSH candidate route with the same rank stage.",
    bench=True,
)
def sim_hard_negatives(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    corpus = fan_out(emb).select("vec_id", "label", v.alias("v"))
    panel = corpus.filter(F.col("vec_id") < _HARDNEG_PANEL).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
    )
    scored = (
        corpus.join(F.broadcast(panel))
        .filter(
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("label") != F.col("qlabel"))
        )
        .select(
            "query_id",
            "vec_id",
            sim.cosine(F.col("v"), F.col("qv")).alias("sim_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_raw"), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _HARDNEG_K)
        .select(
            "query_id",
            F.col("rnk").cast("long").alias("rnk"),
            "vec_id",
            F.round("sim_raw", 6).alias("sim"),
        )
        .orderBy("query_id", "rnk")
    )


@query(
    "sim_ann_lsh",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id, v, {_duck_bucket('v', 0)} AS b0, {_duck_bucket('v', 1)} AS b1 FROM v),
    q AS (SELECT v AS qv, b0 AS qb0, b1 AS qb1 FROM c WHERE vec_id = 0),
    s AS (SELECT vec_id,
                 {_duck_dot('v', 'qv')} / (sqrt({_duck_dot('v', 'v')}) * sqrt({_duck_dot('qv', 'qv')})) AS sim_raw
          FROM c, q WHERE vec_id <> 0 AND (b0 = qb0 OR b1 = qb1))
    SELECT vec_id, ROUND(sim_raw, 6) AS sim FROM s
    ORDER BY sim_raw DESC, vec_id LIMIT 5""",
    doc=f"ANN top-k via random-hyperplane LSH ({sim.LSH_TABLES} tables × "
    f"{sim.LSH_PLANES} md5-seeded sign planes): bucket-routed candidates, "
    "exact cosine re-rank of candidates only. The bucket id is the "
    "IVF-style partition key at 100 TB — a query reads a handful of "
    "partitions, not the corpus.",
)
def sim_ann_lsh(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ann_lsh_topk(emb, query_id=0, k=5)


# ---------------------------------------------------------------------------
# Capstone: corpus cleaning — the composed training-data pipeline.
# ---------------------------------------------------------------------------


@query(
    "corpus_clean",
    f"""WITH {_DUCK_SHINGLES},{_DUCK_MINHASH_CTES},
    near AS (SELECT doc_b FROM common
             JOIN cnt p ON p.doc_id = doc_a JOIN cnt q ON q.doc_id = doc_b
             WHERE CAST(c AS DOUBLE) / CAST(p.n + q.n - c AS DOUBLE)
                   >= {dd.JACCARD_THRESHOLD}),
    exact_dup AS (SELECT doc_id FROM (
        SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY md5(text)
                                          ORDER BY doc_id) AS rn
        FROM documents) WHERE rn > 1),
    qual AS (SELECT doc_id,
                    CAST(floor((0.4 * least((__h * 1.0 / __n) * 5, 1.0)
                        + 0.3 * least(__n / 100.0, 1.0)
                        + 0.3 * least(((length(text) - (__n - 1)) * 1.0 / __n) / 8.0, 1.0))
                        * 10000.0 + 0.5) AS BIGINT) / 10000.0 AS score
             FROM (SELECT doc_id, text, {_STOP_HITS['en']} AS __h,
                          len(string_split(text, ' ')) AS __n
                   FROM documents))
    SELECT d.doc_id,
           CASE WHEN d.doc_id IN (SELECT doc_id FROM exact_dup) THEN 'exact_dup'
                WHEN d.doc_id IN (SELECT doc_b FROM near) THEN 'near_dup'
                WHEN q.score < 0.3 THEN 'low_quality'
                ELSE 'kept' END AS reason
    FROM documents d JOIN qual q ON q.doc_id = d.doc_id
    ORDER BY d.doc_id""",
    doc="The composed corpus-cleaning pipeline (the engine's capstone): "
    "exact dedup (content digest, keep lowest id) -> near-dup removal "
    "(3-shingle Jaccard >= 0.8, greedy keep-lowest-id) -> quality gate "
    "(score >= 0.3). One row per document with its keep/drop reason "
    "(first failing stage wins). The near-dup stage runs the "
    "sub-quadratic MinHash-LSH candidate path (the 100 TB shape); the "
    "oracle mirrors the same deterministic sketch, so the composed "
    "pipeline is still hash-checked end to end.",
    bench=True,
)
def corpus_clean(spark, sf_dir):
    # Fanned out BEFORE the cache so every consumer (exact-dup window,
    # minhash pipeline, quality scorer) reads a full-width cached input.
    docs = fan_out(load_table(spark, sf_dir, "documents")).cache()

    exact_w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact_dups = (
        docs.withColumn("rn", F.row_number().over(exact_w))
        .filter(F.col("rn") > 1)
        .select("doc_id")
    )
    near_dups = dd.minhash_lsh_pairs(docs).select(F.col("doc_b").alias("doc_id"))
    scored = docs.select("doc_id", tx.quality_score(F.col("text")).alias("score"))

    # The flag sets are id-sized but O(corpus) rows, so they are NOT
    # force-broadcast (same fix as pipeline/curate.drop_ledger): tagged
    # ids union into one min(stage-priority) aggregate — which also
    # dedups the near-dup multiset in the same shuffle — and reach the
    # corpus through ONE shuffled join on doc_id (AQE still broadcasts
    # when genuinely small).
    flags = (
        exact_dups.select("doc_id", F.lit(1).alias("pri"))
        .unionByName(near_dups.select("doc_id", F.lit(2).alias("pri")))
        .groupBy("doc_id")
        .agg(F.min("pri").alias("pri"))
    )
    return (
        scored.join(flags, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("pri") == 1, "exact_dup")
            .when(F.col("pri") == 2, "near_dup")
            .when(F.col("score") < 0.3, "low_quality")
            .otherwise("kept")
            .alias("reason"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Approximate scale-path variants (rows-only checks: sketch outputs are
# engine-specific, so no DuckDB hash-match is possible — the exact
# twins q3/q5 above carry the oracle).
# ---------------------------------------------------------------------------


@query(
    "q3_approx_distinct",
    None,
    doc="Scale path of q3: approx_count_distinct (HLL++, rsd 2%) — "
    "constant-size sketch per partition instead of the exact-distinct "
    "shuffle of every (partkey, suppkey) pair. At 100 TB the exact "
    "form shuffles billions of keys; this shuffles kilobytes. "
    "Rows-only check: HLL estimates are engine-specific.",
)
def q3_approx(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").agg(
        F.approx_count_distinct(
            F.concat_ws("|", "l_partkey", "l_suppkey"), rsd=0.02
        ).alias("n_approx")
    )


@query(
    "q5_approx_summary",
    None,
    doc="Scale path of q5: approx_percentile (KLL-ish quantile sketch, "
    "accuracy 10k) — bounded-memory partial aggregation instead of "
    "buffering every value on one reducer. For EXACT percentiles at "
    "scale, operators/quantiles.exact_percentiles brackets with this "
    "sketch then refines. Rows-only check: sketch outputs are "
    "engine-specific.",
)
def q5_approx(spark, sf_dir):
    c = F.col("l_extendedprice")
    # Scalar columns (not one array column) so downstream pandas-side
    # canonicalization can sort/hash the result.
    agg = load_table(spark, sf_dir, "lineitem").agg(
        F.count(c).alias("n"),
        F.approx_percentile(
            c, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(10000)
        ).alias("pcts_approx"),
    )
    return agg.select(
        "n",
        F.col("pcts_approx")[0].alias("p25_approx"),
        F.col("pcts_approx")[1].alias("p50_approx"),
        F.col("pcts_approx")[2].alias("p75_approx"),
    )


# ---------------------------------------------------------------------------
# Sessionization
# ---------------------------------------------------------------------------

#: gap that starts a new session (ms).
SESSION_GAP_MS = 86_400_000  # 1 day


@query(
    "events_sessionize",
    f"""WITH o AS (SELECT user_id, event_id, ts,
                        epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) AS gap_ms
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    m AS (SELECT user_id, event_id, ts,
                 CASE WHEN gap_ms IS NULL OR gap_ms > {SESSION_GAP_MS} THEN 1 ELSE 0 END AS is_new
          FROM o),
    s AS (SELECT user_id, ts,
                 CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM m)
    SELECT user_id, session_id, COUNT(*) AS n,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
    doc="Gap-based sessionization (1-day inactivity gap): lag + running "
    "sum over one (user_id, ts) window — session assignment reuses a "
    "single shuffle/sort, and the same partitioning carries into the "
    "per-session aggregate (no second shuffle on the prefix key). The "
    "streaming equivalent is session_window/applyInPandasWithState; "
    "this is the batch/backfill form.",
    bench=True,
)
def events_sessionize(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    gap = epoch_ms("ts") - epoch_ms(F.lag("ts").over(w))
    marked = ev.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > SESSION_GAP_MS), 1).otherwise(0),
    )
    sessions = marked.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


#: the closed event-type domain, compiled into the pivot so the output
#: schema is static (a pivot without explicit values scans twice to
#: discover the domain — never acceptable at 100 TB).
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "events_pivot_daily",
    f"""SELECT date_trunc('day', ts) AS d,
           {', '.join(f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS {t}" for t in EVENT_TYPES)}
    FROM events GROUP BY d ORDER BY d""",
    doc="PIVOT: the daily long-form event log turned into one wide row "
    "per day with a count column per event type — the crosstab shape "
    "dashboards and feature matrices want. The type domain is compiled "
    "in (explicit values list), so Spark plans ONE scan + ONE "
    "(day)-keyed aggregate with map-side partial pivot-counts; "
    "omitting the list would add a full domain-discovery scan, which "
    "this query refuses by construction. The oracle is the equivalent "
    "conditional aggregation.",
)
def events_pivot_daily(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("DAY", F.col("ts")).alias("d"), "event_type"
    )
    wide = ev.groupBy("d").pivot("event_type", list(EVENT_TYPES)).count()
    return wide.select(
        "d",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in EVENT_TYPES],
    ).orderBy("d")


@query(
    "events_unpivot_daily",
    f"""WITH w AS (SELECT date_trunc('day', ts) AS d,
           {', '.join(f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS {t}" for t in EVENT_TYPES)}
    FROM events GROUP BY d)
    SELECT d, event_type, n
    FROM w UNPIVOT (n FOR event_type IN ({', '.join(EVENT_TYPES)}))
    ORDER BY d, event_type""",
    doc="UNPIVOT (melt): the wide daily crosstab back to tidy long "
    "form (day, event_type, n) — the inverse reshape, exercising "
    "Spark's Unpivot/Expand operator (each input row fans to one row "
    "per value column inside the same stage; no shuffle beyond the "
    "upstream aggregate). Zero-count cells survive the round trip "
    "(explicit domain, coalesced counts), which a plain re-aggregation "
    "of the log would silently drop; both engines run their native "
    "UNPIVOT and must agree.",
)
def events_unpivot_daily(spark, sf_dir):
    wide = events_pivot_daily(spark, sf_dir)
    return (
        wide.unpivot(
            "d", list(EVENT_TYPES), variableColumnName="event_type", valueColumnName="n"
        )
        .orderBy("d", "event_type")
    )


@query(
    "events_funnel",
    """WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2
          FROM events e JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3
          FROM events e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id),
    u AS (SELECT user_id, 1 AS step FROM v
          UNION ALL SELECT user_id, 2 FROM c
          UNION ALL SELECT user_id, 3 FROM p)
    SELECT CAST(step AS BIGINT) AS step,
           CASE step WHEN 1 THEN 'view' WHEN 2 THEN 'click'
                     ELSE 'purchase' END AS step_name,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM u GROUP BY step ORDER BY step""",
    doc="Ordered funnel analysis (view -> click -> purchase): users "
    "counted at each step only if the step's FIRST qualifying event "
    "strictly follows their previous step's time — the sequencing "
    "product analytics means by 'funnel', not three independent "
    "counts. Plan: each stage is one user-keyed aggregate joined to "
    "the (shrinking) qualified-user set of the stage before — all "
    "three joins co-partition on user_id, so at 100 TB the funnel is "
    "three reuse-partitioned shuffles over a monotonically smaller "
    "frontier, never a re-scan per step pair.",
)
def events_funnel(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    u = (
        v.select("user_id", F.lit(1).alias("step"))
        .unionByName(c.select("user_id", F.lit(2).alias("step")))
        .unionByName(p.select("user_id", F.lit(3).alias("step")))
    )
    return (
        u.groupBy(F.col("step").cast("long").alias("step"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "step",
            F.when(F.col("step") == 1, "view")
            .when(F.col("step") == 2, "click")
            .otherwise("purchase")
            .alias("step_name"),
            "n_users",
        )
        .orderBy("step")
    )


@query(
    "events_retention",
    """WITH f AS (SELECT user_id, date_trunc('day', MIN(ts)) AS cohort
              FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events)
    SELECT f.cohort,
           CAST(date_diff('day', f.cohort, a.d) AS BIGINT) AS day_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY f.cohort, day_offset ORDER BY f.cohort, day_offset""",
    doc="Cohort retention matrix: users grouped by first-seen day, "
    "counted on each later day they return — the (cohort × day-offset) "
    "triangle every activation dashboard draws. Plan: the first-seen "
    "aggregate and the distinct (user, day) activity set both key on "
    "user_id, so the join is co-partitioned (one exchange reused), and "
    "the final (cohort, offset) aggregate is a second small shuffle "
    "whose output is bounded by days², independent of corpus size.",
)
def events_retention(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    f = ev.groupBy("user_id").agg(F.date_trunc("DAY", F.min("ts")).alias("cohort"))
    a = ev.select("user_id", F.date_trunc("DAY", F.col("ts")).alias("d")).distinct()
    return (
        a.join(f, "user_id")
        .select(
            "cohort",
            F.datediff(F.col("d").cast("date"), F.col("cohort").cast("date"))
            .cast("long")
            .alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort", "day_offset")
    )


#: cumulative corpus-mass cutoff for the nucleus vocabulary (per mille).
VOCAB_TOPP_PERMILLE = 950


@query(
    "docs_vocab_topp",
    f"""WITH tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf
               FROM (SELECT UNNEST(string_split(text, ' ')) AS tok
                     FROM documents) GROUP BY tok),
    tot AS (SELECT SUM(tf) AS t FROM tf),
    r AS (SELECT tok, tf,
                 SUM(tf) OVER (ORDER BY tf DESC, tok
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cum
          FROM tf)
    SELECT tok, tf, CAST(cum AS BIGINT) AS cum_tf
    FROM r, tot
    WHERE (cum - tf) * 1000 < {VOCAB_TOPP_PERMILLE} * t
    ORDER BY tf DESC, tok""",
    doc="Nucleus (top-p) vocabulary truncation: the smallest "
    "frequency-ranked token set covering 95% of corpus token mass — "
    "how a tokenizer's vocab/coverage cutoff is actually chosen "
    "(frequency-rank head, not a fixed top-k). The cutoff test is "
    "exact integer ((cum-tf)·1000 < 950·total: a token enters while "
    "the mass BEFORE it is still under the target, the standard "
    "nucleus rule). The running sum orders over the (small) distinct-"
    "token aggregate, not the corpus; the corpus-wide tf aggregate "
    "combines map-side and the global total is one scalar.",
)
def docs_vocab_topp(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        fan_out(docs)
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.orderBy(F.desc("tf"), "tok").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = tf.agg(F.sum("tf").cast("long").alias("t"))
    r = tf.withColumn("cum", F.sum("tf").over(w))
    return (
        r.crossJoin(F.broadcast(tot))
        .filter((F.col("cum") - F.col("tf")) * 1000 < VOCAB_TOPP_PERMILLE * F.col("t"))
        .select("tok", "tf", F.col("cum").cast("long").alias("cum_tf"))
        .orderBy(F.desc("tf"), "tok")
    )


#: fixed scoring anchor for orders_rfm_segments (after the last order
#: date in the synthetic corpus, 2001-08-01) — a literal, so no scalar-broadcast pass is needed and
#: recency is reproducible across runs.
RFM_ANCHOR = "2001-12-31"


@query(
    "orders_rfm_segments",
    f"""WITH per AS (SELECT o_custkey AS custkey,
                    CAST(date_diff('day', MAX(o_orderdate), DATE '{RFM_ANCHOR}')
                         AS BIGINT) AS recency_days,
                    CAST(COUNT(*) AS BIGINT) AS frequency,
                    CAST(floor(SUM(o_totalprice) * 100) AS BIGINT) AS monetary
             FROM orders GROUP BY o_custkey)
    SELECT custkey, recency_days, frequency, monetary,
           CAST(ntile(5) OVER (ORDER BY recency_days DESC, custkey) AS BIGINT)
             AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency, custkey) AS BIGINT)
             AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary, custkey) AS BIGINT)
             AS m_score
    FROM per ORDER BY custkey""",
    doc="RFM segmentation: per customer, recency (days before a fixed "
    "literal anchor — no scalar-broadcast pass), order frequency, and "
    "monetary total in cents, each scored into quintiles (higher = "
    "better: most-recent/most-frequent/highest-spend land in 5) — the "
    "canonical customer-value segmentation. One orders scan + one "
    "custkey aggregate; the quintile scores come from "
    "operators/ranking.global_ntile (bucket-by-boundary + partitioned "
    "local rank + broadcast offsets — exact NTILE semantics, "
    "deterministic tie order on custkey), so even a billion-customer "
    "dimension never plans the single-partition WindowExec a bare "
    "ntile().over(Window.orderBy(...)) would. The customer aggregate "
    "is localCheckpointed once and feeds all three scores' "
    "boundary/census/rank passes.",
)
def orders_rfm_segments(spark, sf_dir):
    from meteo_etl_spark.operators.ranking import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit(RFM_ANCHOR).cast("date"), F.max("o_orderdate").cast("date")
        )
        .cast("long")
        .alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.floor(F.sum("o_totalprice") * 100).cast("long").alias("monetary"),
    ).localCheckpoint()  # load-bearing: 3 scores x (sketch+census+rank)
    n = per.count()
    scored = global_ntile(
        per, [("recency_days", "desc"), ("custkey", "asc")], 5,
        tile_col="r_score", n=n,
    )
    scored = global_ntile(
        scored, [("frequency", "asc"), ("custkey", "asc")], 5,
        tile_col="f_score", n=n,
    )
    scored = global_ntile(
        scored, [("monetary", "asc"), ("custkey", "asc")], 5,
        tile_col="m_score", n=n,
    )
    return scored.select(
        "custkey", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score",
    ).orderBy("custkey")


@query(
    "events_global_rank",
    """WITH v AS (SELECT event_id,
                    CAST(ROUND(value * 100) AS BIGINT) AS v
             FROM events),
    r AS (SELECT event_id, v,
                 ROW_NUMBER() OVER (ORDER BY v, event_id) AS rn,
                 COUNT(*) OVER () AS n
          FROM v)
    SELECT rn, event_id, v FROM r
    WHERE rn % 97 = 0 OR rn = 1 OR rn = n
    ORDER BY rn""",
    doc="Global total-order rank over the FACT table, probed at every "
    "97th rank (plus min and max) — the distributed-rank "
    "certification row for operators/ranking.global_row_number: the "
    "oracle computes the same ranks with an engine-native "
    "ROW_NUMBER() OVER (ORDER BY ...) (DuckDB sorts in one process; "
    "that is the oracle's privilege, not the engine's), while the "
    "Spark side runs the boundary-sketch bucket route — the rank "
    "values must agree EXACTLY, ties and all, at every scale factor "
    "and shuffle layout. Plan: one approx_percentile boundary "
    "aggregate, one hash shuffle on the bucket id, a PARTITIONED "
    "per-bucket window, broadcast cumulative offsets — no "
    "single-partition WindowExec anywhere (the structural guard in "
    "test_plan_guards rejects one); per-task memory is one bucket's "
    "sort, ~n/64 plus the largest tie group, never the table.",
    bench=True,
)
def events_global_rank(spark, sf_dir):
    from meteo_etl_spark.operators.ranking import global_row_number

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    # the max-rank probe needs n — read it from the rank route's own
    # bucket census instead of paying a separate ev.count() scan
    census: dict = {}
    ranked = global_row_number(
        ev, [("v", "asc"), ("event_id", "asc")], counts_out=census
    )
    n = census["n"]
    return (
        ranked.filter(
            (F.col("rn") % 97 == 0) | (F.col("rn") == 1) | (F.col("rn") == n)
        )
        .select("rn", "event_id", "v")
        .orderBy("rn")
    )


@query(
    "events_rank_skew_stress",
    """WITH v AS (SELECT event_id,
                    CASE WHEN event_id % 2 = 0 THEN 0
                         ELSE CAST(ROUND(value * 100) AS BIGINT) END AS v
             FROM events),
    r AS (SELECT event_id, v,
                 ROW_NUMBER() OVER (ORDER BY v, event_id) AS rn,
                 COUNT(*) OVER () AS n
          FROM v)
    SELECT rn, event_id, v FROM r
    WHERE rn % 71 = 0 OR rn = 1 OR rn = n
    ORDER BY rn""",
    doc="The rank route under adversarial skew (r14 verdict order #6): "
    "HALF the fact table shares one key (every even event_id maps to "
    "v=0), so the whole 50% tie group lands in a single rank bucket — "
    "the worst case the boundary-sketch design documents ('per-task "
    "memory is one bucket's sort, bounded by the largest tie group'). "
    "The ranks must still agree EXACTLY with the oracle's native "
    "ROW_NUMBER, ties resolved by event_id, at every scale factor and "
    "shuffle layout; probes at every 71st rank plus min and max. The "
    "measured per-bucket ceiling for this distribution is certified "
    "by tests/test_ranking.py::test_skew_stress_bucket_ceiling "
    "(tie bucket = exactly the tie group, every other bucket "
    "sketch-bounded). Plan: identical to events_global_rank — "
    "boundary sketch, bucket hash shuffle, partitioned window, "
    "broadcast offsets; no single-partition sort.",
    bench=True,
)
def events_rank_skew_stress(spark, sf_dir):
    from meteo_etl_spark.operators.ranking import global_row_number

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 2 == 0, F.lit(0))
        .otherwise(F.round(F.col("value") * 100).cast("long"))
        .alias("v"),
    )
    census: dict = {}
    ranked = global_row_number(
        ev, [("v", "asc"), ("event_id", "asc")], counts_out=census
    )
    n = census["n"]
    return (
        ranked.filter(
            (F.col("rn") % 71 == 0) | (F.col("rn") == 1) | (F.col("rn") == n)
        )
        .select("rn", "event_id", "v")
        .orderBy("rn")
    )


@query(
    "docs_constraint_audit",
    """WITH a AS (SELECT
        CAST(COUNT(CASE WHEN doc_id IS NULL THEN 1 END) AS BIGINT) AS c0,
        CAST(COUNT(doc_id) - COUNT(DISTINCT doc_id) AS BIGINT) AS c1,
        CAST(COUNT(CASE WHEN text IS NULL THEN 1 END) AS BIGINT) AS c2,
        CAST(COUNT(CASE WHEN lang NOT IN ('en', 'de', 'fr', 'es') THEN 1 END)
             AS BIGINT) AS c3,
        CAST(COUNT(CASE WHEN n_chars < 0 OR n_chars > 100000 THEN 1 END)
             AS BIGINT) AS c4,
        CAST(COUNT(CASE WHEN NOT regexp_matches(source, '^src[0-9]+$') THEN 1 END)
             AS BIGINT) AS c5
      FROM documents)
    SELECT 'not_null' AS "constraint", 'doc_id' AS "column",
           c0 AS violations, c0 = 0 AS passed FROM a
    UNION ALL SELECT 'unique', 'doc_id', c1, c1 = 0 FROM a
    UNION ALL SELECT 'not_null', 'text', c2, c2 = 0 FROM a
    UNION ALL SELECT 'in_domain', 'lang', c3, c3 = 0 FROM a
    UNION ALL SELECT 'in_range[0,100000]', 'n_chars', c4, c4 = 0 FROM a
    UNION ALL SELECT 'matches', 'source', c5, c5 = 0 FROM a
    ORDER BY "column", "constraint" """,
    doc="Declarative constraint audit (Deequ/Great-Expectations class) "
    "over the corpus: key completeness + uniqueness, text "
    "completeness, language domain, char-count range, source-name "
    "regex — the release gate every training-data drop runs. ALL "
    "violation counts compute in ONE aggregate pass over one scan "
    "(operators/constraints.audit — map-side partials; uniqueness "
    "folds in as count - count_distinct), never a job per rule; the "
    "report unpivots driver-side from that single row.",
)
def docs_constraint_audit(spark, sf_dir):
    from meteo_etl_spark.operators import constraints as C

    docs = load_table(spark, sf_dir, "documents")
    return C.audit(
        docs,
        [
            C.not_null("doc_id"),
            C.unique("doc_id"),
            C.not_null("text"),
            C.in_domain("lang", ["en", "de", "fr", "es"]),
            C.in_range("n_chars", 0, 100_000),
            C.matches("source", "^src[0-9]+$"),
        ],
    )


#: sliding-window shape for events_sliding_window: 2 h windows every 1 h.
SLIDE_SIZE_US = 7_200_000_000
SLIDE_STEP_US = 3_600_000_000


@query(
    "events_sliding_window",
    f"""WITH e AS (SELECT event_type, epoch_us(ts) AS us,
                      CAST(floor(value * 100) AS BIGINT) AS qv
               FROM events),
    w AS (SELECT event_type, qv,
                 make_timestamp(((us // {SLIDE_STEP_US}) - i) * {SLIDE_STEP_US})
                   AS window_start
          FROM e, UNNEST(range(0, {SLIDE_SIZE_US // SLIDE_STEP_US})) AS u(i)
          WHERE ((us // {SLIDE_STEP_US}) - i) * {SLIDE_STEP_US} + {SLIDE_SIZE_US} > us)
    SELECT window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(qv) AS BIGINT) AS total
    FROM w GROUP BY window_start, event_type
    ORDER BY window_start, event_type""",
    doc="SLIDING event-time windows (2 h size, 1 h slide): each event "
    "lands in size/slide overlapping windows — the hopping-window "
    "aggregate shape (F.window with a slide) that tumbling rollups "
    "don't cover, and the same operator Structured Streaming runs "
    "with a watermark. Spark plans ONE Expand (×2 row replication) + "
    "one (window, type)-keyed aggregate with map-side partials; the "
    "oracle derives the identical window starts from integer epoch-µs "
    "arithmetic. Values in int64 cents so every window total is "
    "exact.",
)
def events_sliding_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "2 hours", "1 hour")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
        .orderBy("window_start", "event_type")
    )


#: minimum co-occurrence count for basket_part_pairs.
BASKET_MIN_SUPPORT = 2


@query(
    "basket_part_pairs",
    f"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY part_a, part_b HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
    ORDER BY support DESC, part_a, part_b""",
    doc="Market-basket pair mining: part pairs co-occurring in the "
    "same order at least twice — the pairwise co-occurrence core of "
    "frequent-itemset / association analysis. Support is the STANDARD "
    "distinct-basket count: (order, part) is deduplicated before the "
    "self-join, so an order holding the same part on two lineitems "
    "contributes each of its pairs once. The pair space is a "
    "SELF-EQUI-JOIN on the basket key with a < residual, and baskets "
    "are naturally bounded (<= 7 lineitems per TPC-H order), so the "
    "blow-up per order is <= 21 pairs — the join stays linear in "
    "lineitems at any corpus size and shuffle-partitions on the order "
    "key, never all-pairs over parts. Support counts combine "
    "map-side; the HAVING prunes the singleton tail before any sort.",
)
def basket_part_pairs(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= BASKET_MIN_SUPPORT)
        .orderBy(F.desc("support"), "part_a", "part_b")
    )


#: candidate watermark delays (seconds) audited by
#: events_watermark_audit — the grid a streaming deployment picks from.
_WM_DELAYS_SEC = (0, 60, 300, 900, 3600, 14400)


@query(
    "events_watermark_audit",
    f"""WITH r AS (SELECT event_type, epoch_us(ts) AS us,
                 MAX(epoch_us(ts)) OVER (PARTITION BY event_type
                     ORDER BY event_id
                     ROWS UNBOUNDED PRECEDING) AS frontier
          FROM events),
    l AS (SELECT frontier - us AS late_us FROM r),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM l),
    d AS (SELECT CAST(UNNEST(ARRAY{list(_WM_DELAYS_SEC)}) AS BIGINT)
                   AS delay_sec)
    SELECT d.delay_sec,
           CAST(SUM(CASE WHEN l.late_us > d.delay_sec * 1000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST((1000000 * SUM(CASE WHEN l.late_us > d.delay_sec * 1000000
                                    THEN 1 ELSE 0 END)) // MAX(n.total)
                AS BIGINT) AS dropped_ppm
    FROM d CROSS JOIN l CROSS JOIN n
    GROUP BY d.delay_sec ORDER BY d.delay_sec""",
    doc="Watermark-delay audit — the pick-the-delay table a streaming "
    "deployment reads BEFORE setting withWatermark (the third "
    "operating-curve sibling of sim_ivf_nprobe_curve and "
    "dedup_threshold_sweep): per candidate delay, how many events "
    "would arrive LATER than that delay behind the running per-type "
    "event-time frontier (arrival order = the monotone ingestion id) "
    "and be dropped from a windowed aggregate — state-bound budget vs "
    "completeness, quantified from the data instead of guessed. "
    "Lateness is exact integer microseconds; the drop fraction is "
    "integer ppm, so the oracle replays bit-for-bit. Plan: the "
    "frontier is one per-type ordered window (each partition bounded "
    "by its type's stream — no global single-partition sort), then "
    "one conditional aggregate over the delay grid (6x row expansion "
    "before map-side combine). In production this audit runs on a "
    "bounded recent window of the feed, not the full history.",
    bench=True,
)
def events_watermark_audit(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = ev.select(
        (F.max(epoch_us("ts")).over(w) - epoch_us("ts")).alias("late_us")
    )
    delays = F.explode(
        F.array(*[F.lit(int(d)).cast("long") for d in _WM_DELAYS_SEC])
    ).alias("delay_sec")
    # No separate count action (r13 verdict minor finding): after the
    # delay-grid explode, every delay group holds each event exactly
    # once, so the per-group row count IS the corpus total — the ppm
    # denominator folds into the same aggregate as the drop counter.
    return (
        late.select("late_us", delays)
        .groupBy("delay_sec")
        .agg(
            F.sum(
                (
                    F.col("late_us")
                    > F.col("delay_sec") * F.lit(1000000).cast("long")
                ).cast("int")
            )
            .cast("long")
            .alias("n_dropped"),
            F.count(F.lit(1)).alias("__total"),
        )
        .select(
            F.col("delay_sec").cast("long").alias("delay_sec"),
            "n_dropped",
            F.expr("(1000000 * n_dropped) div __total").alias("dropped_ppm"),
        )
        .orderBy("delay_sec")
    )


#: bounded rule-table head for basket_rules.
_BASKET_RULES_TOPK = 50


@query(
    "basket_rules",
    f"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nb
          FROM items),
    cnt AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
            FROM items GROUP BY l_partkey),
    p AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                 CAST(COUNT(*) AS BIGINT) AS sab
          FROM items a JOIN items b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY pa, pb HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}),
    r AS (SELECT pa AS antecedent, pb AS consequent, sab FROM p
          UNION ALL SELECT pb, pa, sab FROM p)
    SELECT antecedent, consequent, sab AS support,
           CAST((1000000 * sab) // ca.c AS BIGINT) AS confidence_ppm,
           CAST((1000000 * sab * n.nb) // (ca.c * cb.c) AS BIGINT)
             AS lift_ppm
    FROM r JOIN cnt ca ON ca.l_partkey = antecedent
           JOIN cnt cb ON cb.l_partkey = consequent
           CROSS JOIN n
    ORDER BY confidence_ppm DESC, lift_ppm DESC, antecedent, consequent
    LIMIT {_BASKET_RULES_TOPK}""",
    doc="Association rules over the basket pair census (the Agrawal "
    "et al. support/confidence/lift table on basket_part_pairs' "
    "distinct-basket pairs, both rule directions): confidence = "
    "P(consequent|antecedent) and lift = P(ab)/(P(a)P(b)) in exact "
    "integer ppm — BIGINT division only, both engines replay "
    "bit-for-bit (the docs_bigram_fluency determinism discipline). "
    "Plan: the basket self-join stays bounded by TPC-H's <= 7-line "
    "orders; item counts and the 1-row basket total broadcast into "
    "the rule table; total order (confidence DESC, lift DESC, pair) "
    "makes the top-k cut partitioning-invariant. The recommender/"
    "affinity table every retail-ish pipeline derives once the pair "
    "census exists.",
    bench=True,
)
def basket_rules(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    nb = li.agg(
        F.countDistinct("l_orderkey").cast("long").alias("nb")
    )
    cnt = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("sab"))
        .filter(F.col("sab") >= BASKET_MIN_SUPPORT)
    )
    rules = pairs.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        "sab",
    ).unionByName(
        pairs.select(
            F.col("pb").alias("antecedent"),
            F.col("pa").alias("consequent"),
            "sab",
        )
    )
    ca = cnt.select(
        F.col("l_partkey").alias("antecedent"), F.col("c").alias("c_a")
    )
    cb = cnt.select(
        F.col("l_partkey").alias("consequent"), F.col("c").alias("c_b")
    )
    return (
        rules.join(ca, "antecedent")
        .join(cb, "consequent")
        .crossJoin(F.broadcast(nb))
        .select(
            "antecedent",
            "consequent",
            F.col("sab").alias("support"),
            F.expr("(1000000 * sab) div c_a").alias("confidence_ppm"),
            F.expr("(1000000 * sab * nb) div (c_a * c_b)").alias(
                "lift_ppm"
            ),
        )
        .orderBy(
            F.desc("confidence_ppm"),
            F.desc("lift_ppm"),
            "antecedent",
            "consequent",
        )
        .limit(_BASKET_RULES_TOPK)
    )


@query(
    "events_percent_rank",
    """WITH r AS (SELECT event_type,
                     CAST(ROUND(value * 100) AS BIGINT) AS v,
                     percent_rank() OVER (PARTITION BY event_type
                                          ORDER BY value, event_id) AS pr,
                     cume_dist() OVER (PARTITION BY event_type
                                       ORDER BY value, event_id) AS cd
              FROM events)
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE pr >= 0.99) AS BIGINT) AS n_top1pct,
           CAST(COUNT(*) FILTER (WHERE cd <= 0.10) AS BIGINT) AS n_bottom10pct,
           MIN(CASE WHEN pr >= 0.99 THEN v END) AS top1pct_floor
    FROM r GROUP BY event_type ORDER BY event_type""",
    doc="percent_rank / cume_dist window class: per type, the top-1% "
    "(by relative rank) and bottom-10% (by cumulative distribution) "
    "population counts plus the top-percentile value floor — the "
    "relative-standing shapes SLO and score-normalization dashboards "
    "use, distinct from NTILE's equal-frequency buckets. Both "
    "functions are exact rank arithmetic ((rank-1)/(n-1), rank/n) on "
    "a deterministic (value, event_id) order, so the FP values are "
    "IEEE-identical across engines; one type-keyed shuffle feeds both "
    "windows and the final aggregate.",
)
def events_percent_rank(spark, sf_dir):
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.when(F.col("pr") >= 0.99, 1)).alias("n_top1pct"),
            F.count(F.when(F.col("cd") <= 0.10, 1)).alias("n_bottom10pct"),
            F.min(F.when(F.col("pr") >= 0.99, F.col("v"))).alias("top1pct_floor"),
        )
        .orderBy("event_type")
    )


#: view->purchase correlation band for events_interval_join (10 min, µs).
INTERVAL_JOIN_TOL_US = 600_000_000


@query(
    "events_interval_join",
    f"""SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'view') v
    JOIN (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND epoch_us(p.ts) >= epoch_us(v.ts) - {INTERVAL_JOIN_TOL_US}
     AND epoch_us(p.ts) <= epoch_us(v.ts) + {INTERVAL_JOIN_TOL_US}
    ORDER BY view_id, purchase_id""",
    doc="Keyed interval join: (view, purchase) pairs by the same user "
    "within ±10 minutes — driven through streaming/windows."
    "interval_join_streams, the SAME operator the watermarked "
    "stream-stream path runs (unified batch/stream semantics: "
    "watermarks no-op on batch frames, the join condition is "
    "identical). This registers the stream-stream join's semantics "
    "under the oracle hash check; its state-eviction behavior is "
    "pinned by the streaming e2e tests. Plan: both sides shuffle once "
    "on user_id into a co-partitioned join; the time band is a "
    "residual predicate on the equi-join, not a nested loop.",
)
def events_interval_join(spark, sf_dir):
    from meteo_etl_spark.streaming.windows import interval_join_streams

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    v = ev.filter(F.col("event_type") == "view").drop("event_type")
    p = ev.filter(F.col("event_type") == "purchase").drop("event_type")
    joined = interval_join_streams(
        v, p, "user_id", tolerance=f"{INTERVAL_JOIN_TOL_US // 1_000_000} seconds"
    )
    return (
        joined.select(
            F.col("event_id").alias("view_id"),
            F.col("event_id_r").alias("purchase_id"),
            "user_id",
        )
        .orderBy("view_id", "purchase_id")
    )


@query(
    "events_anomaly_iqr",
    """WITH r AS (SELECT event_type,
                     CAST(ROUND(value * 100) AS BIGINT) AS v,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                         ORDER BY CAST(ROUND(value * 100) AS BIGINT)) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM events),
    q AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
                 MAX(CASE WHEN rn = (n + 3) // 4 THEN v END) AS q1,
                 MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN v END) AS q3
          FROM r GROUP BY event_type)
    SELECT e.event_type, MIN(q.n) AS n, MIN(q.q1) AS q1, MIN(q.q3) AS q3,
           CAST(COUNT(*) FILTER (WHERE
                2 * CAST(ROUND(e.value * 100) AS BIGINT)
                    < 2 * q.q1 - 3 * (q.q3 - q.q1)
             OR 2 * CAST(ROUND(e.value * 100) AS BIGINT)
                    > 2 * q.q3 + 3 * (q.q3 - q.q1)) AS BIGINT) AS n_outliers
    FROM events e JOIN q ON q.event_type = e.event_type
    GROUP BY e.event_type ORDER BY e.event_type""",
    doc="Tukey-fence anomaly census: per event type, count values "
    "outside [q1 - 1.5·IQR, q3 + 1.5·IQR] — the standard statistical "
    "outlier filter, all-integer: nearest-rank (Type-1) quartiles in "
    "cents and a doubled fence test (2v vs 2q ± 3·IQR) so no FP "
    "enters the comparison on either engine. Plan: one type-keyed "
    "window pass yields the quartiles (5 rows), which BROADCAST back "
    "onto the events for a map-side flag count — the table is scanned "
    "twice but shuffled once, and never joined shuffle-to-shuffle on "
    "the 5-value skew key.",
)
def events_anomaly_iqr(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("v")
    wp = Window.partitionBy("event_type")
    r = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wp)
    )
    q = r.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(F.when(F.expr("rn = (n + 3) div 4"), F.col("v"))).alias("q1"),
        F.max(F.when(F.expr("rn = (3 * n + 3) div 4"), F.col("v"))).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (2 * F.col("v") < 2 * F.col("q1") - 3 * iqr) | (
        2 * F.col("v") > 2 * F.col("q3") + 3 * iqr
    )
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("n").alias("n"),
            F.min("q1").alias("q1"),
            F.min("q3").alias("q3"),
            F.count(F.when(is_out, 1)).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@query(
    "events_ohlc",
    """SELECT event_type, date_trunc('hour', ts) AS h,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(floor(arg_min(value, ts) * 100) AS BIGINT) AS open,
           CAST(floor(MAX(value) * 100) AS BIGINT) AS high,
           CAST(floor(MIN(value) * 100) AS BIGINT) AS low,
           CAST(floor(arg_max(value, ts) * 100) AS BIGINT) AS close
    FROM events GROUP BY event_type, h ORDER BY event_type, h""",
    doc="OHLC candles: per (type, hour) the opening value (at the "
    "earliest ts), high, low, and closing value (at the latest ts) — "
    "the time-series downsampling shape, exercising the min_by/max_by "
    "argument-aggregate class the rest of the surface doesn't. ONE "
    "grouped aggregate with map-side partials (min_by/max_by combine "
    "like min/max carrying a payload); values quantized to int64 "
    "cents. Timestamps are unique per (type, hour) slice in this "
    "schema, so the arg extremes are well-defined on both engines.",
)
def events_ohlc(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    h = F.date_trunc("HOUR", F.col("ts")).alias("h")
    q = lambda c: F.floor(c * 100).cast("long")  # noqa: E731
    return (
        ev.groupBy("event_type", h)
        .agg(
            F.count(F.lit(1)).alias("n"),
            q(F.min_by("value", "ts")).alias("open"),
            q(F.max("value")).alias("high"),
            q(F.min("value")).alias("low"),
            q(F.max_by("value", "ts")).alias("close"),
        )
        .orderBy("event_type", "h")
    )


@query(
    "events_hourly_full_outer",
    """WITH c AS (SELECT date_trunc('hour', ts) AS h,
                     CAST(COUNT(*) AS BIGINT) AS n_click
              FROM events WHERE event_type = 'click' GROUP BY h),
    p AS (SELECT date_trunc('hour', ts) AS h,
                 CAST(COUNT(*) AS BIGINT) AS n_purchase
          FROM events WHERE event_type = 'purchase' GROUP BY h)
    SELECT COALESCE(c.h, p.h) AS h, c.n_click, p.n_purchase
    FROM c FULL OUTER JOIN p ON c.h = p.h
    ORDER BY h""",
    doc="FULL OUTER join: hourly click and purchase series aligned on "
    "the hour, keeping hours where EITHER side is missing (NULL counts "
    "survive — the gap signal a coalesce-to-zero pivot would erase). "
    "The two inputs pre-aggregate to hour grain BEFORE the join, so "
    "the full-outer SortMergeJoin sees bounded series rows, never raw "
    "events; both aggregates and the join key on the same hour column "
    "share partitioning. Exercises the one outer-join shape (FullOuter "
    "SMJ) the rest of the surface doesn't.",
)
def events_hourly_full_outer(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    h = F.date_trunc("HOUR", F.col("ts")).alias("h")
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(h)
        .agg(F.count(F.lit(1)).alias("n_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(h)
        .agg(F.count(F.lit(1)).alias("n_purchase"))
    )
    return (
        c.join(p, "h", "full_outer")
        .select("h", "n_click", "n_purchase")
        .orderBy("h")
    )


@query(
    "docs_vocab_setops",
    """WITH a AS (SELECT DISTINCT UNNEST(string_split(text, ' ')) AS tok
              FROM documents WHERE source = 'src0'),
    b AS (SELECT DISTINCT UNNEST(string_split(text, ' ')) AS tok
          FROM documents WHERE source = 'src1')
    SELECT 'common' AS kind, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT tok FROM a INTERSECT SELECT tok FROM b)
    UNION ALL
    SELECT 'only_a', CAST(COUNT(*) AS BIGINT)
    FROM (SELECT tok FROM a EXCEPT SELECT tok FROM b)
    UNION ALL
    SELECT 'only_b', CAST(COUNT(*) AS BIGINT)
    FROM (SELECT tok FROM b EXCEPT SELECT tok FROM a)
    ORDER BY kind""",
    doc="Set operations: vocabulary overlap census between two sources "
    "— INTERSECT and EXCEPT DISTINCT over the per-source token sets "
    "(Spark's declared set-op nodes, planned as hash-aggregated "
    "semi/anti joins — not hand-rolled), all three counts in ONE lazy "
    "plan with no driver-side counting. The vocabulary comparison is "
    "the domain-shift smell test run before mixing corpora; each "
    "side's distinct-token aggregate runs BEFORE the set ops, so the "
    "joins see vocabularies, not token streams.",
)
def docs_vocab_setops(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")

    def vocab(src):
        return (
            docs.filter(F.col("source") == src)
            .select(F.explode(F.split("text", " ")).alias("tok"))
            .distinct()
        )

    a, b = vocab("src0"), vocab("src1")

    def census(kind, df):
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(kind).alias("kind"), "n"
        )

    return (
        census("common", a.intersect(b))
        .unionByName(census("only_a", a.subtract(b)))
        .unionByName(census("only_b", b.subtract(a)))
        .orderBy("kind")
    )


#: path length cap for events_user_paths — state per user is bounded
#: BEFORE any sequence is materialized.
PATH_MAX_EVENTS = 10


@query(
    "events_user_paths",
    f"""WITH r AS (SELECT user_id, event_type,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rn
               FROM events),
    s AS (SELECT user_id,
                 array_to_string(list(event_type ORDER BY rn), '>') AS path
          FROM r WHERE rn <= {PATH_MAX_EVENTS} GROUP BY user_id)
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM s GROUP BY path ORDER BY n_users DESC, path""",
    doc="Behavioral path assembly: each user's first 10 events ordered "
    "by (ts, event_id), concatenated into a path signature, then the "
    "population count per distinct path — the sequence-assembly shape "
    "that also turns event streams into training sequences. The cap "
    "is applied by a window rank BEFORE any list is materialized, so "
    "per-user aggregation state is bounded at 10 regardless of how "
    "hot a user is; rank, slice, and collect all reuse the single "
    "user-keyed shuffle (ordered collect is array_sort over (rn, "
    "type) structs — collect_list alone has no order guarantee).",
)
def events_user_paths(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    seqs = (
        ev.filter(F.col("rn") <= PATH_MAX_EVENTS)
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rn", "event_type"))
            ).alias("evs")
        )
        .select(
            F.concat_ws(
                ">", F.transform("evs", lambda e: e.event_type)
            ).alias("path")
        )
    )
    return (
        seqs.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
    )


@query(
    "events_value_deciles",
    """WITH t AS (SELECT event_type, event_id,
                     CAST(floor(value * 100) AS BIGINT) AS qv,
                     ntile(10) OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS decile
              FROM events)
    SELECT event_type, CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(qv) AS lo, MAX(qv) AS hi
    FROM t GROUP BY event_type, decile ORDER BY event_type, decile""",
    doc="NTILE decile bucketing: per event type, values split into 10 "
    "equal-frequency buckets with per-bucket count and bounds — the "
    "windowed quantile-bucket shape (score banding, outlier tiers) "
    "that complements the exact-percentile aggregates. Partitioned by "
    "event_type so the sort is per-partition after ONE type-keyed "
    "shuffle — never a global sort; ties are broken on event_id so "
    "bucket membership is deterministic, and bounds are int64 cents. "
    "Both engines' NTILE use the same remainder-to-front rule and "
    "must agree bucket for bucket.",
)
def events_value_deciles(spark, sf_dir):
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("qv"),
        F.ntile(10).over(w).alias("decile"),
    )
    return (
        ev.groupBy("event_type", F.col("decile").cast("long").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("qv").alias("lo"),
            F.max("qv").alias("hi"),
        )
        .orderBy("event_type", "decile")
    )


#: trailing time-window width for events_window_agg (1 hour, in µs —
#: epoch_us keys make the RANGE frame exact at full timestamp precision).
WINDOW_RANGE_US = 3_600_000_000


@query(
    "events_window_agg",
    f"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
                      CAST(floor(value * 100) AS BIGINT) AS qv
               FROM events)
    SELECT event_id, user_id,
           CAST(SUM(qv) OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS run_sum,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                          RANGE BETWEEN {WINDOW_RANGE_US} PRECEDING
                                    AND CURRENT ROW) AS hr_n,
           CAST(SUM(qv) OVER (PARTITION BY user_id ORDER BY us
                         RANGE BETWEEN {WINDOW_RANGE_US} PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS hr_sum
    FROM e ORDER BY event_id""",
    doc="Per-user running + trailing-hour window analytics: cumulative "
    "sum (ROWS frame, event_id tie-break) and 1-hour moving count/sum "
    "(RANGE frame over epoch-µs keys) in one pass — the WindowExec "
    "frame shapes the rollup/sessionize queries don't cover. Both "
    "frames share ONE (user_id)-keyed shuffle and ONE in-partition "
    "sort; frame evaluation is incremental (running accumulator / "
    "sliding two-pointer), never per-row rescans. Values quantized to "
    "int64 cents so every running sum is exact and order-independent "
    "across engines. At 100 TB this is one exchange over the natural "
    "key with bounded per-task state.",
)
def events_window_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    us = epoch_us("ts")
    qv = F.floor(F.col("value") * 100).cast("long")
    e = ev.select("event_id", "user_id", us.alias("us"), qv.alias("qv"))
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rng = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-WINDOW_RANGE_US, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum("qv").over(w_run).alias("run_sum"),
        F.count(F.lit(1)).over(w_rng).alias("hr_n"),
        F.sum("qv").over(w_rng).alias("hr_sum"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Dataset assembly: deterministic splits + multi-granularity rollups
# ---------------------------------------------------------------------------


@query(
    "docs_hash_split",
    """SELECT doc_id,
              ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000 AS bucket,
              CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000 < 900 THEN 'train'
                   WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000 < 950 THEN 'val'
                   ELSE 'test' END AS split
       FROM documents ORDER BY doc_id""",
    doc="Deterministic 90/5/5 train/val/test assignment by content-hash "
    "bucket (functions/sampling.hash_split): reproducible on any "
    "cluster size with no coordination — pure map, no shuffle, stable "
    "under repartitioning and incremental appends (rand()/df.sample "
    "are neither). The 100 TB sampling primitive.",
)
def docs_hash_split(spark, sf_dir):
    from meteo_etl_spark.functions.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return hash_split(
        docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
    ).orderBy("doc_id")


@query(
    "docs_mixture_plan",
    """WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                       CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                         AS n_tokens
                FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
                   CAST(COUNT(*) AS BIGINT) AS k FROM per)
    SELECT source, n_docs, n_tokens,
           ROUND(CAST(n_tokens AS DOUBLE) / t, 6) AS natural_share,
           ROUND(1.0 / k, 6) AS target_share,
           ROUND(CAST(t AS DOUBLE) / (k * n_tokens), 6) AS sampling_rate
    FROM per, tot ORDER BY source""",
    doc="Data-mixing planner: per-source token mass and the "
    "sampling-rate multiplier that rebalances the corpus to a uniform "
    "target mixture — the domain-weights table a multi-source training "
    "run starts from (rate > 1 = upsample/epochs, < 1 = downsample; "
    "feed min(rate,1) into hash_sample). Plan: ONE groupBy(source) "
    "aggregate (token counts combine map-side), then the per-source "
    "rows cross a 1-row broadcast global total — the standard "
    "decorrelated-scalar shape, O(sources) rows post-shuffle.",
)
def docs_mixture_plan(spark, sf_dir):
    from meteo_etl_spark.functions.sampling import mixture_plan

    docs = load_table(spark, sf_dir, "documents")
    return mixture_plan(fan_out(docs))


@query(
    "docs_budget_waterfill",
    """WITH per AS (SELECT source,
                       CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                         AS n_tokens
                FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_tokens) * 500 AS BIGINT) // 1000 AS budget,
                   CAST(COUNT(*) AS BIGINT) AS n FROM per),
    r AS (SELECT source, n_tokens,
                 ROW_NUMBER() OVER (ORDER BY n_tokens, source) AS rk,
                 CAST(COALESCE(SUM(n_tokens) OVER (
                     ORDER BY n_tokens, source
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS pfx
          FROM per),
    s AS (SELECT source, n_tokens, rk,
                 CAST(budget - pfx AS DOUBLE)
                   / CAST(n - rk + 1 AS DOUBLE) AS lam_i
          FROM r, tot),
    piv AS (SELECT MIN(rk) AS prk, MIN_BY(lam_i, rk) AS lvl
            FROM s WHERE lam_i <= n_tokens)
    SELECT s.source AS key, s.n_tokens AS weight,
           CASE WHEN (SELECT prk FROM piv) IS NOT NULL
                     AND s.rk >= (SELECT prk FROM piv)
                THEN (SELECT lvl FROM piv)
                ELSE CAST(s.n_tokens AS DOUBLE) END AS alloc,
           CASE WHEN (SELECT prk FROM piv) IS NOT NULL
                     AND s.rk >= (SELECT prk FROM piv)
                THEN 1 ELSE 0 END AS capped
    FROM s ORDER BY key""",
    doc="Water-filling token-budget allocation across sources "
    "(functions/sampling.waterfill_allocation) — the capped-mixture "
    "planner beside docs_mixture_plan's proportional one: with a "
    "budget of 500 permille of total tokens, find the level λ with "
    "Σ min(tokens_s, λ) = budget; small sources ship whole, "
    "over-represented ones cap at the COMMON level (max-min fair — "
    "the recipe rule that stops one giant crawl from crowding out "
    "everything else). Closed form via prefix sums over the sorted "
    "source table — no iteration; λ is one IEEE division of exact "
    "integers, so the allocation is bit-reproducible and the DuckDB "
    "oracle replays it exactly. Plan: one corpus groupBy(source) "
    "aggregate, then windows + two 1-row broadcast scalars over the "
    "O(sources) key table.",
    bench=True,
)
def docs_budget_waterfill(spark, sf_dir):
    from meteo_etl_spark.functions.sampling import waterfill_allocation

    docs = load_table(spark, sf_dir, "documents")
    per = (
        fan_out(docs)
        .groupBy("source")
        .agg(
            F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens")
        )
    )
    return waterfill_allocation(per, "source", "n_tokens")


@query(
    "events_rollup_multi",
    """SELECT CAST(ts AS DATE) AS d, event_type,
              COUNT(*) AS n,
              SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total_value
       FROM events
       GROUP BY GROUPING SETS ((CAST(ts AS DATE), event_type),
                               (CAST(ts AS DATE)), ())
       ORDER BY d NULLS FIRST, event_type NULLS FIRST""",
    doc="Hypertable-style multi-granularity rollup: (day, type), (day), "
    "and grand-total aggregates in ONE pass via GROUPING SETS — Spark "
    "plans a single scan + Expand + one aggregate shuffle instead of "
    "three scans. At 100 TB the finer grain feeds the coarser ones; "
    "Expand's 3x row multiplication is pre-aggregation and map-side "
    "combined.",
    bench=True,
)
def events_rollup_multi(spark, sf_dir):
    # date_trunc (timestamp @ midnight), not to_date: python date
    # objects vs the oracle's datetime64 would type-mismatch the hash.
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("d"), "event_type", "value"
    )
    return (
        ev.groupingSets([["d", "event_type"], ["d"], []], "d", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "total_value"
            ),
        )
        .orderBy(F.col("d").asc_nulls_first(), F.col("event_type").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# Temporal joins (operators/temporal.py)
# ---------------------------------------------------------------------------

#: band-join tolerance (seconds each side).
BAND_TOLERANCE_SEC = 60


@query(
    "events_asof_join",
    """WITH l AS (SELECT user_id, event_id, ts, value FROM events
                  WHERE event_type = 'purchase'),
    r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
    SELECT l.user_id, l.event_id, l.ts, l.value,
           r.ts AS ts_click, r.value AS value_click,
           epoch_us(l.ts) - epoch_us(r.ts) AS gap_us
    FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    ORDER BY l.event_id""",
    doc="As-of join: each purchase matched to the user's latest click "
    "at-or-before it. Spark side is operators/temporal.asof_join — "
    "union + keyed window (one shuffle, per-key sort, no range "
    "blowup); the oracle is DuckDB's NATIVE ASOF JOIN, so the two "
    "engines implement the semantics independently and must agree.",
    bench=True,
)
def events_asof_join(spark, sf_dir):
    from meteo_etl_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    j = asof_join(
        left, right, ["user_id"], right_cols=["value"], suffix="_click", how="inner"
    )
    return j.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        "ts_click",
        "value_click",
        (epoch_us("ts") - epoch_us("ts_click")).alias("gap_us"),
    ).orderBy("event_id")


@query(
    "events_range_join",
    f"""SELECT a.event_id, COUNT(*) AS n_nearby
    FROM events a JOIN events b
      ON a.event_type = b.event_type AND a.user_id <> b.user_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {BAND_TOLERANCE_SEC * 1_000_000}
    GROUP BY 1 ORDER BY 1""",
    doc=f"Band (range) join: per event, how many same-type events by "
    f"OTHER users landed within ±{BAND_TOLERANCE_SEC}s. Spark side is "
    "operators/temporal.band_join — time-bin equi-join (bin width = "
    "tolerance, one side replicated into bin ±1) + exact filter, which "
    "shuffle-partitions on (type, bin) instead of the 5-key skew "
    "Spark's planner would produce; the oracle is DuckDB's native "
    "range join (IEJoin family) — independent implementations must "
    "agree.",
    bench=True,
)
def events_range_join(spark, sf_dir):
    from meteo_etl_spark.operators.temporal import band_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    pairs = band_join(ev, ev, ["event_type"], tolerance_sec=BAND_TOLERANCE_SEC)
    return (
        pairs.filter(F.col("l_user_id") != F.col("r_user_id"))
        .groupBy(F.col("l_event_id").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("n_nearby"))
        .orderBy("event_id")
    )


def _duck_pagerank_sql() -> str:
    """Unrolled integer PageRank oracle: same co-activity edge list
    (band join), same floor-division contribution and damping mix as
    operators/graph.pagerank, iteration for iteration."""
    from meteo_etl_spark.operators.graph import (
        PAGERANK_DAMPING_PCT,
        PAGERANK_ITERS,
        PAGERANK_SCALE,
    )

    tol_us = BAND_TOLERANCE_SEC * 1_000_000
    teleport = (100 - PAGERANK_DAMPING_PCT) * PAGERANK_SCALE
    parts = [
        f"""ed AS (SELECT DISTINCT a.user_id AS src, b.user_id AS dst
      FROM events a JOIN events b
        ON a.event_type = b.event_type AND a.user_id <> b.user_id
       AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {tol_us})""",
        """outd AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS o
      FROM ed GROUP BY src)""",
        "nd AS (SELECT DISTINCT user_id FROM events)",
        f"""s0 AS (SELECT user_id, CAST({PAGERANK_SCALE} AS BIGINT) AS score
      FROM nd)""",
    ]
    for i in range(1, PAGERANK_ITERS + 1):
        parts.append(
            f"""c{i} AS (SELECT ed.dst AS user_id,
             SUM(s.score // o.o) AS insum
      FROM ed JOIN s{i - 1} s ON s.user_id = ed.src
              JOIN outd o ON o.src = ed.src
      GROUP BY ed.dst)"""
        )
        parts.append(
            f"""s{i} AS (SELECT nd.user_id,
             CAST(({teleport} + {PAGERANK_DAMPING_PCT}
                   * COALESCE(c.insum, 0)) // 100 AS BIGINT) AS score
      FROM nd LEFT JOIN c{i} c USING (user_id))"""
        )
    with_clause = ",\n    ".join(parts)
    return f"""WITH {with_clause}
    SELECT user_id, score FROM s{PAGERANK_ITERS} ORDER BY user_id"""


@query(
    "events_triangle_count",
    f"""WITH ed AS (SELECT DISTINCT
            LEAST(a.user_id, b.user_id) AS u, GREATEST(a.user_id, b.user_id) AS v
      FROM events a JOIN events b
        ON a.event_type = b.event_type AND a.user_id <> b.user_id
       AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {BAND_TOLERANCE_SEC * 1_000_000})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
           CAST((SELECT COUNT(*) FROM ed) AS BIGINT) AS n_edges
    FROM ed e1 JOIN ed e2 ON e2.u = e1.v
               JOIN ed e3 ON e3.u = e1.u AND e3.v = e2.v""",
    doc="Triangle counting over the user co-activity graph — the graph "
    "MOTIF class (clustering coefficient, community density) beyond "
    "reachability (connected components) and centrality (PageRank). "
    "Edges canonicalize to u < v once; counting runs DEGREE-ORDERED "
    "orientation (operators/graph.triangle_count): every edge points "
    "at its higher-(degree, id) endpoint, so oriented out-degree — and "
    "with it the wedge join's per-node fan-out — is O(sqrt(m)) on ANY "
    "graph, where the id-ordered variant blows up quadratically at "
    "hubs. Two co-partitioned equi-joins on node keys; the count is "
    "orientation-invariant, so the oracle is unchanged.",
)
def events_triangle_count(spark, sf_dir):
    from meteo_etl_spark.operators.graph import triangle_count
    from meteo_etl_spark.operators.temporal import band_join

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    pairs = band_join(ev, ev, ["event_type"], tolerance_sec=BAND_TOLERANCE_SEC)
    # The edge list feeds several consumers (degree pass + orientation
    # + count); cache it for the run and RELEASE it before returning —
    # the two results are scalars, so they are collected here and
    # returned as a literal frame (same driver-state contract as
    # emb_kmeans), leaving no lazy plan that would pin the cache.
    ed = (
        pairs.filter(F.col("l_user_id") != F.col("r_user_id"))
        .select(
            F.least("l_user_id", "r_user_id").alias("u"),
            F.greatest("l_user_id", "r_user_id").alias("v"),
        )
        .distinct()
        .persist()
    )
    try:
        n_tri = triangle_count(ed)
        n_edges = ed.count()
    finally:
        ed.unpersist()
    return spark.createDataFrame(
        [(n_tri, n_edges)], "n_triangles long, n_edges long"
    )


@query(
    "events_user_pagerank",
    _duck_pagerank_sql(),
    doc="Integer-arithmetic PageRank over the user co-activity graph "
    "(edge: same event type within ±60s, both directions): the second "
    "iterative graph algorithm after connected components, scoring "
    "user centrality for influence/anomaly triage. Edges come from "
    "the same time-bin equi-join as events_range_join (binning prunes, "
    "exact band filters); each power iteration is one src-keyed join "
    "+ one dst-keyed partial-agg sum — co-partitioned node-id "
    "shuffles, frontier localCheckpoint'ed so lineage stays O(1). "
    "Contributions use int64 floor division and the damping mix is "
    "integer, so all 3 iterations replay bit-for-bit in the oracle.",
)
def events_user_pagerank(spark, sf_dir):
    from meteo_etl_spark.operators.graph import pagerank
    from meteo_etl_spark.operators.temporal import band_join

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    pairs = band_join(ev, ev, ["event_type"], tolerance_sec=BAND_TOLERANCE_SEC)
    edges = (
        pairs.filter(F.col("l_user_id") != F.col("r_user_id"))
        .select(F.col("l_user_id").alias("src"), F.col("r_user_id").alias("dst"))
        .distinct()
    )
    nodes = ev.select(F.col("user_id").alias("node")).distinct()
    return (
        pagerank(nodes, edges)
        .select(F.col("node").alias("user_id"), "score")
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Skew mitigation
# ---------------------------------------------------------------------------


@query(
    "skew_salted_join",
    """SELECT e.event_type,
              COUNT(*) AS n,
              SUM(CAST(ROUND(e.value * 100) AS BIGINT)
                  * length(e.event_type)) / 100.0 AS weighted
       FROM events e
       JOIN (SELECT DISTINCT event_type FROM events) d
         ON e.event_type = d.event_type
       GROUP BY e.event_type ORDER BY e.event_type""",
    doc="Salted join (operators/skew.py): the fact side is salted with "
    "pmod(event_id, 8), the dim side replicated per salt, the join key "
    "becomes (event_type, salt) so a hot key spreads over 8 reducers. "
    "The oracle states the plain unsalted join — the query proves the "
    "rewrite is result-identical. shuffle_hash hint keeps the demo a "
    "real shuffle join (broadcast would hide the salting).",
)
def skew_salted_join(spark, sf_dir):
    from meteo_etl_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = ev.select("event_type").distinct().hint("shuffle_hash")
    joined = salted_join(ev, dim, "event_type", salt_src=F.col("event_id"))
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(
                    F.round(F.col("value") * 100).cast("long")
                    * F.length("event_type")
                )
                / 100.0
            ).alias("weighted"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


@query(
    "mm_decode_meta",
    """SELECT doc_id,
              octet_length(encode(text)) AS n_bytes,
              16 + octet_length(encode(text)) % 64 AS width,
              16 + (octet_length(encode(text)) // 7) % 64 AS height,
              1 + octet_length(encode(text)) % 5 AS frames,
              'fake' AS format
       FROM documents ORDER BY doc_id""",
    doc="Multimodal decode plumbing: binary payload column -> "
    "Arrow-batched mapInPandas decode stub (deterministic fake codec; "
    "real codecs aren't in this container) -> typed metadata rows. "
    "The oracle states the decode contract in SQL; the Spark side "
    "actually runs the mapInPandas path, so the hash check covers the "
    "UDF batch shape end to end.",
)
def mm_decode_meta(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with_payload = mm.with_binary_payload(docs)
    return (
        mm.decode_media(with_payload)
        .select("doc_id", "n_bytes", "width", "height", "frames", "format")
        .orderBy("doc_id")
    )


@query(
    "mm_frame_sample",
    """WITH m AS (SELECT doc_id,
                         1 + octet_length(encode(text)) % 5 AS frames
           FROM documents)
       SELECT doc_id, CAST(UNNEST(range(0, frames, 2)) AS BIGINT)
                AS frame_idx
       FROM m ORDER BY doc_id, frame_idx""",
    doc="Multimodal frame SAMPLING plumbing (the video half of the "
    "decode contract): mapInPandas decode stub -> native "
    "explode(sequence(0, frames-1, every)) — frame selection stays "
    "JVM-side (only frame DECODE would be Python), one row per kept "
    "frame index at every=2. The oracle restates the fake codec's "
    "frame count and the stride arithmetic in SQL, so the hash check "
    "covers decode -> explode end to end. At 100 TB the explode "
    "multiplies rows BEFORE any Python ever runs, so a downstream "
    "per-frame decode sees exactly the sampled fraction.",
    bench=True,
)
def mm_frame_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    decoded = mm.decode_media(mm.with_binary_payload(docs))
    return mm.sample_frames(decoded, every=2).orderBy("doc_id", "frame_idx")


@query(
    "mm_audio_chunks",
    f"""WITH m AS (SELECT doc_id,
                          octet_length(encode(text))
                            * {mm.AUDIO_SAMPLES_PER_BYTE} AS n_samples
           FROM documents)
       SELECT doc_id,
              CAST(g.i AS BIGINT) AS chunk_idx,
              CAST(g.i * {mm.AUDIO_HOP} AS BIGINT) AS start_sample,
              CAST(LEAST(g.i * {mm.AUDIO_HOP} + {mm.AUDIO_CHUNK}, n_samples)
                   AS BIGINT) AS end_sample
       FROM m, UNNEST(range(0, (n_samples - 1) // {mm.AUDIO_HOP} + 1))
                 AS g(i)
       ORDER BY doc_id, chunk_idx""",
    doc="Multimodal audio CHUNKING plumbing (the audio half of the "
    "sampling contract, sibling of mm_frame_sample's video half): "
    "decode stub -> native explode(sequence) framing at "
    f"window={mm.AUDIO_CHUNK}/hop={mm.AUDIO_HOP} samples "
    "(wav2vec-style overlapping windows, final chunk truncated at "
    "stream end) — chunk selection stays JVM-side integer "
    "arithmetic; only sample DECODE would be Python. The oracle "
    "restates the fake codec's sample count and the framing "
    "arithmetic in SQL, so the hash covers decode -> explode end to "
    "end. At 100 TB the fan-out happens before any Python runs and "
    "a per-chunk featurizer sees exactly the framed fraction.",
    bench=True,
)
def mm_audio_chunks(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    decoded = mm.decode_media(mm.with_binary_payload(docs))
    return mm.chunk_audio(decoded).orderBy("doc_id", "chunk_idx")


# ---------------------------------------------------------------------------
# Text repetition / PII scrubbing
# ---------------------------------------------------------------------------

_N = tx.REP_NGRAM


@query(
    "text_repetition",
    f"""SELECT doc_id, n_ngrams, n_distinct,
              CASE WHEN n_ngrams > 0 THEN
                CAST(floor(((n_ngrams - n_distinct) * 1.0 / n_ngrams)
                           * 10000.0 + 0.5) AS BIGINT) / 10000.0
              ELSE 0.0 END AS dup_frac
       FROM (SELECT doc_id,
                    CASE WHEN len(w) >= {_N} THEN len(w) - {_N - 1} ELSE 0 END
                      AS n_ngrams,
                    CASE WHEN len(w) >= {_N} THEN
                      len(list_distinct(list_transform(range(1, len(w) - {_N - 2}),
                          i -> array_to_string(w[i:i+{_N - 1}], ' '))))
                    ELSE 0 END AS n_distinct
             FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
       ORDER BY doc_id""",
    doc="Gopher-style repetition signal: fraction of duplicate word "
    f"{_N}-gram occurrences per document (1 - distinct/total). High "
    "dup_frac flags boilerplate/spam for the quality gate. Pure map "
    "(two array lambdas over pre-split tokens); integers feed the "
    "ratio, so both engines round identically.",
)
def text_repetition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    n_ngrams = F.when(F.size("w") >= _N, F.size("w") - (_N - 1)).otherwise(0)
    n_distinct = F.when(
        F.size("w") >= _N, F.size(F.array_distinct(tx.ngrams("w")))
    ).otherwise(0)
    stats = docs.select(
        "doc_id", n_ngrams.alias("n_ngrams"), n_distinct.alias("n_distinct")
    )
    dup = F.when(
        F.col("n_ngrams") > 0,
        tx.round_half_up(
            (F.col("n_ngrams") - F.col("n_distinct"))
            * F.lit(1.0)
            / F.col("n_ngrams"),
            4,
        ),
    ).otherwise(F.lit(0.0))
    return stats.withColumn("dup_frac", dup).orderBy("doc_id")


def _duck_pii_text() -> str:
    """The PII-augmented text column (deterministic fake PII appended
    to every 7th doc so the scrubber has real spans to hit)."""
    return (
        "CASE WHEN doc_id % 7 = 0 THEN text || ' contact doc' || doc_id "
        "|| '@example.com or +1415' || doc_id || ' at 10.0.' "
        "|| (doc_id % 256) || '.' || (doc_id % 100) ELSE text END"
    )


@query(
    "text_pii_scrub",
    f"""SELECT doc_id,
              len(regexp_extract_all(t, '{tx.PII_PATTERNS["email"][0]}')) AS n_email,
              len(regexp_extract_all(t, '{tx.PII_PATTERNS["phone"][0]}')) AS n_phone,
              len(regexp_extract_all(
                    regexp_replace(regexp_replace(t, '{tx.PII_PATTERNS["email"][0]}',
                                                  '<EMAIL>', 'g'),
                                   '{tx.PII_PATTERNS["phone"][0]}', '<PHONE>', 'g'),
                    '{tx.PII_PATTERNS["ipv4"][0]}')) AS n_ip,
              regexp_replace(regexp_replace(regexp_replace(t,
                  '{tx.PII_PATTERNS["email"][0]}', '<EMAIL>', 'g'),
                  '{tx.PII_PATTERNS["phone"][0]}', '<PHONE>', 'g'),
                  '{tx.PII_PATTERNS["ipv4"][0]}', '<IP>', 'g') AS scrubbed
       FROM (SELECT doc_id, {_duck_pii_text()} AS t FROM documents)
       ORDER BY doc_id""",
    doc="PII scrubbing: email/phone/IPv4 spans redacted by chained "
    "regexp_replace (patterns in the Java∩RE2 dialect so both engines "
    "match identical spans), with per-kind counts. Counts for email/"
    "phone are measured pre-scrub; the IP count runs after those "
    "replacements (same order as the scrub chain). Deterministic fake "
    "PII is appended to every 7th doc so the patterns actually fire. "
    "Pure map — at 100 TB this is the same shape as any C4-style "
    "cleanup pass.",
)
def text_pii_scrub(spark, sf_dir):
    pii = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact doc"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1415"),
            F.col("doc_id").cast("string"),
            F.lit(" at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            (F.col("doc_id") % 100).cast("string"),
        ),
    ).otherwise(F.col("text"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", pii.alias("t"))
    email_pat, _ = tx.PII_PATTERNS["email"]
    phone_pat, _ = tx.PII_PATTERNS["phone"]
    after_phone = F.regexp_replace(
        F.regexp_replace(F.col("t"), email_pat, "<EMAIL>"), phone_pat, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        tx.pii_count(F.col("t"), "email").cast("long").alias("n_email"),
        tx.pii_count(F.col("t"), "phone").cast("long").alias("n_phone"),
        F.regexp_count(after_phone, F.lit(tx.PII_PATTERNS["ipv4"][0]))
        .cast("long")
        .alias("n_ip"),
        tx.pii_scrub(F.col("t")).alias("scrubbed"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Dataset assembly: stratified sampling + sequence packing
# ---------------------------------------------------------------------------


@query(
    "docs_stratified_sample",
    """SELECT doc_id, lang
       FROM (SELECT doc_id, lang,
                    ('0x' || substr(md5('strat:' || doc_id::VARCHAR), 1, 8))::BIGINT
                      % 1000 AS b
             FROM documents)
       WHERE b < CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 800
                           ELSE 250 END
       ORDER BY doc_id""",
    doc="Corpus rebalancing: per-language deterministic hash sampling "
    "(en 50%, zh 80%, others 25%) — the standard mixing knob when "
    "assembling a training corpus. Pure map (salted md5 permille vs a "
    "CASE threshold over the stratum column): no shuffle, stable under "
    "repartitioning/appends, composable with hash_split because the "
    "salt decorrelates the two hashes.",
)
def docs_stratified_sample(spark, sf_dir):
    from meteo_etl_spark.functions.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5, "zh": 0.8}, default_fraction=0.25
    ).orderBy("doc_id")


@query(
    "docs_pack_sequences",
    """SELECT doc_id, lang, n_tokens, "offset", pack_id
       FROM (SELECT doc_id, lang,
                    len(string_split(text, ' ')) AS n_tokens,
                    CAST(COALESCE(SUM(len(string_split(text, ' ')))
                             OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING),
                             0) AS BIGINT) AS "offset",
                    CAST(COALESCE(SUM(len(string_split(text, ' ')))
                             OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING),
                             0) AS BIGINT) // 256 AS pack_id
             FROM documents)
       ORDER BY lang, doc_id""",
    doc="Training-sequence packing (functions/packing.pack_sequences): "
    "greedy contiguous fill — a doc's offset is the running token "
    "count of its predecessors within its language shard, its pack id "
    "is offset div 256. One window prefix-sum, no UDF/driver loop; "
    "shards pack independently, so at 100 TB the window runs per "
    "hash-bucket, never as one global sort.",
)
def docs_pack_sequences(spark, sf_dir):
    from meteo_etl_spark.functions.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", tx.token_count(F.col("text")).alias("n_tokens")
    )
    return pack_sequences(docs, "doc_id", "n_tokens", "lang").orderBy(
        "lang", "doc_id"
    )


# ---------------------------------------------------------------------------
# IVF ANN
# ---------------------------------------------------------------------------


def _duck_ivf_centroid(k: int) -> str:
    vals = ", ".join(repr(w) for w in sim.ivf_centroid(k))
    return f"([{vals}]::DOUBLE[])"


def _duck_ivf_dots(v: str) -> str:
    dots = ", ".join(_duck_dot(v, _duck_ivf_centroid(k)) for k in range(sim.IVF_LISTS))
    return f"[{dots}]"


@query(
    "sim_ivf_nprobe_curve",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id, v, {_duck_ivf_dots('v')} AS d FROM v),
    asn AS (SELECT vec_id, v, list_position(d, list_max(d)) AS lst, d
            FROM c),
    q AS (SELECT v AS qv, d AS qd FROM asn WHERE vec_id = 0),
    pr AS (SELECT j, ROW_NUMBER() OVER (ORDER BY qd[j] DESC, j) AS prank
           FROM q, UNNEST(range(1, {sim.IVF_LISTS + 1})) AS g(j)),
    s AS (SELECT a.vec_id,
                 {_duck_dot('a.v', 'qv')} / (sqrt({_duck_dot('a.v', 'a.v')}) * sqrt({_duck_dot('qv', 'qv')})) AS sim_raw
          FROM asn a, q WHERE a.vec_id <> 0),
    top5 AS (SELECT vec_id FROM s ORDER BY sim_raw DESC, vec_id LIMIT 5),
    ranked AS (SELECT a.vec_id, pr.prank
               FROM asn a JOIN pr ON pr.j = a.lst WHERE a.vec_id <> 0),
    tot AS (SELECT COUNT(*) AS t FROM ranked)
    SELECT n AS nprobe,
           CAST(COUNT(r.vec_id) AS BIGINT) AS n_cand,
           ROUND(CAST(COUNT(r.vec_id) AS DOUBLE) / MAX(tot.t), 4)
             AS cand_frac,
           CAST(SUM(CASE WHEN r.vec_id IN (SELECT vec_id FROM top5)
                         THEN 1 ELSE 0 END) AS BIGINT) AS top5_covered
    FROM UNNEST(range(1, {sim.IVF_LISTS + 1})) AS g(n)
    CROSS JOIN tot
    LEFT JOIN ranked r ON r.prank <= n
    GROUP BY n ORDER BY n""",
    doc="IVF serving-tuning curve: for every nprobe 1..8, the "
    "candidate count, the corpus fraction scanned, and how many of "
    "the exact top-5 are already reachable — THE operating table a "
    "serving deployment reads to pick nprobe (recall budget vs scan "
    "budget) before building the index, completing the route-audit "
    "family the way dedup_threshold_sweep completes the dedup "
    "verify: ONE assignment pass, every operating point derived from "
    "it. Plan: corpus list assignment is one scan; per-probe-rank "
    "counts collapse to <= IVF_LISTS rows before the cumulative "
    "8x8 expansion; the exact top-5 comes from the brute-force "
    "baseline scan. At 100 TB both passes are single scans and the "
    "curve itself is list-count-sized.",
    bench=True,
)
def sim_ivf_nprobe_curve(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    dots = [
        sim._dot_py(qv, sim.ivf_centroid(j)) for j in range(sim.IVF_LISTS)
    ]
    order = sorted(range(sim.IVF_LISTS), key=lambda j: (-dots[j], j))
    prank_of_list = {j + 1: r + 1 for r, j in enumerate(order)}

    v = F.col("embedding").cast("array<double>")
    base = fan_out(emb).select("vec_id", v.alias("v"))
    # ONE corpus scan computes BOTH per-row quantities (probe rank of
    # the row's argmax list via a literal rank array indexed by list
    # id — the argmax expression evaluates once, not once per branch —
    # and the exact cosine); the materialized 3-column projection then
    # feeds the top-5 pick and the per-rank census as cheap follow-on
    # jobs (first cut ran the argmax 8x inside a when-chain plus a
    # second full scan for brute force: 2.99 s -> this shape at sf0.1)
    prank_arr = ilit([prank_of_list[l] for l in range(1, sim.IVF_LISTS + 1)])
    qcol = dlit(qv)
    scored = (
        base.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.element_at(
                prank_arr, sim.ivf_list_of(F.col("v")).cast("int")
            ).alias("prank"),
            sim.cosine(F.col("v"), qcol).alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    top5 = {
        r["vec_id"]
        for r in scored.orderBy(F.desc("s"), "vec_id").limit(5).collect()
    }
    # the distributed work collapses to <= IVF_LISTS rows here; the
    # 8-point curve assembles from them (the audit-panel discipline)
    per_rank = {
        r["prank"]: (r["n"], r["hit"])
        for r in scored.groupBy("prank")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.col("vec_id").isin(list(top5)).cast("int")
            ).alias("hit"),
        )
        .collect()
    }
    total = sum(n for n, _ in per_rank.values())
    rows = []
    cum_n = cum_hit = 0
    for n in range(1, sim.IVF_LISTS + 1):
        dn, dh = per_rank.get(n, (0, 0))
        cum_n += dn
        cum_hit += dh
        rows.append((n, cum_n, cum_hit))
    curve = spark.createDataFrame(
        rows, "nprobe long, n_cand long, top5_covered long"
    )
    return curve.select(
        "nprobe",
        "n_cand",
        F.round(F.col("n_cand").cast("double") / F.lit(total), 4).alias(
            "cand_frac"
        ),
        "top5_covered",
    ).orderBy("nprobe")


@query(
    "sim_ann_operating_point",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id, v, {_duck_ivf_dots('v')} AS d FROM v),
    asn AS (SELECT vec_id, v, list_position(d, list_max(d)) AS lst, d FROM c),
    q AS (SELECT vec_id AS qid, v AS qv, d AS qd FROM asn
          ORDER BY vec_id LIMIT {sim.IVF_TUNE_PANEL}),
    pr AS (SELECT qid, j,
                  ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY qd[j] DESC, j) AS prank
           FROM q, UNNEST(range(1, {sim.IVF_LISTS + 1})) AS g(j)),
    s AS (SELECT q.qid, a.vec_id, a.lst,
                 {_duck_dot('a.v', 'q.qv')} / (sqrt({_duck_dot('a.v', 'a.v')}) * sqrt({_duck_dot('q.qv', 'q.qv')})) AS sim_raw
          FROM asn a, q WHERE a.vec_id <> q.qid),
    topk AS (SELECT qid, lst FROM (
               SELECT qid, lst,
                      ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY sim_raw DESC, vec_id) AS rn
               FROM s) WHERE rn <= 5),
    tp AS (SELECT t.qid, pr.prank
           FROM topk t JOIN pr ON pr.qid = t.qid AND pr.j = t.lst),
    hits AS (SELECT g.n AS nprobe, t.qid,
                    CAST(SUM(CASE WHEN t.prank <= g.n THEN 1 ELSE 0 END)
                         AS BIGINT) AS h
             FROM UNNEST(range(1, {sim.IVF_LISTS + 1})) AS g(n), tp t
             GROUP BY g.n, t.qid),
    curve AS (SELECT nprobe, CAST(MIN(h) AS BIGINT) AS min_hits,
                     CAST(SUM(h) AS BIGINT) AS sum_hits
              FROM hits GROUP BY nprobe),
    pick AS (SELECT COALESCE(MIN(nprobe), {sim.IVF_LISTS}) AS c
             FROM curve
             WHERE min_hits >= {math.ceil(sim.IVF_RECALL_TARGET * 5)})
    SELECT CAST(c.nprobe AS BIGINT) AS nprobe, c.min_hits, c.sum_hits,
           (c.nprobe = p.c) AS chosen
    FROM curve c CROSS JOIN pick p ORDER BY c.nprobe""",
    doc="The recall-justified serve-default certification (r14 "
    "verdict order #2): ivf_operating_point — the EXACT tuner every "
    "build_ivf*/ivfpq/ivfsq8 call runs to stamp nprobe_default into "
    "the index sidecar — replayed against a native-SQL oracle. Per "
    f"nprobe 1..{sim.IVF_LISTS}, the MIN and SUM of exact-top-5 "
    f"coverage hits over the {sim.IVF_TUNE_PANEL}-query audit panel "
    "(lowest vec_ids), and the chosen flag on the smallest depth "
    f"whose min-recall@5 clears {sim.IVF_RECALL_TARGET} (hits >= "
    f"{math.ceil(sim.IVF_RECALL_TARGET * 5)}/5 — integer arithmetic, "
    "hash-stable). This row set IS the evidence that a default-probe "
    "query cannot ship 1-in-5 of the true neighbors again: the "
    "stored default is derived from a measured curve, not a "
    "constant. Plan: ONE corpus scan assigns lists and scores the "
    "broadcast panel (the ann_recall shape), a per-query window "
    "keeps top-5 (panel-bounded state), and the curve assembles "
    "driver-side from panel*k probe ranks.",
    bench=True,
)
def sim_ann_operating_point(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    op = sim.ivf_operating_point(emb)
    rows = [
        (
            int(npb),
            int(e["min_hits"]),
            int(e["sum_hits"]),
            bool(npb == op["nprobe"]),
        )
        for npb, e in sorted(op["curve"].items())
    ]
    return spark.createDataFrame(
        rows, "nprobe long, min_hits long, sum_hits long, chosen boolean"
    ).orderBy("nprobe")


@query(
    "sim_ann_ivf",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id, v, {_duck_ivf_dots('v')} AS d FROM v),
    asn AS (SELECT vec_id, v, list_position(d, list_max(d)) AS lst, d FROM c),
    q0 AS (SELECT v AS qv, lst AS p1, d AS qd FROM asn WHERE vec_id = 0),
    q AS (SELECT qv, p1,
                 list_position(
                   list_transform(range(1, {sim.IVF_LISTS + 1}),
                     i -> CASE WHEN i = p1 THEN -1e18 ELSE qd[i] END),
                   list_max(
                     list_transform(range(1, {sim.IVF_LISTS + 1}),
                       i -> CASE WHEN i = p1 THEN -1e18 ELSE qd[i] END))) AS p2
          FROM q0),
    s AS (SELECT vec_id,
                 {_duck_dot('v', 'qv')} / (sqrt({_duck_dot('v', 'v')}) * sqrt({_duck_dot('qv', 'qv')})) AS sim_raw
          FROM asn, q WHERE vec_id <> 0 AND (lst = p1 OR lst = p2))
    SELECT vec_id, ROUND(sim_raw, 6) AS sim FROM s
    ORDER BY sim_raw DESC, vec_id LIMIT 5""",
    doc=f"ANN top-k via IVF coarse quantizer ({sim.IVF_LISTS} md5-seeded "
    f"centroids, nprobe={sim.IVF_NPROBE}): every vector keeps only its "
    "argmax-dot inverted-list id; the query probes its two best lists "
    "and re-ranks candidates with exact cosine. Complements sim_ann_lsh "
    "(data-independent sign buckets) with centroid routing — at 100 TB "
    "the list id is the partition key and a query reads nprobe "
    "partitions; swap the centroid literals for k-means output without "
    "touching the plan.",
)
def sim_ann_ivf(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ann_ivf_topk(emb, query_id=0, k=5)


@query(
    "sim_ann_serve_ivf",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id, v, {_duck_ivf_dots('v')} AS d FROM v),
    asn AS (SELECT vec_id, v, list_position(d, list_max(d)) AS lst, d FROM c),
    q0 AS (SELECT v AS qv, lst AS p1, d AS qd FROM asn WHERE vec_id = 0),
    q AS (SELECT qv, p1,
                 list_position(
                   list_transform(range(1, {sim.IVF_LISTS + 1}),
                     i -> CASE WHEN i = p1 THEN -1e18 ELSE qd[i] END),
                   list_max(
                     list_transform(range(1, {sim.IVF_LISTS + 1}),
                       i -> CASE WHEN i = p1 THEN -1e18 ELSE qd[i] END))) AS p2
          FROM q0),
    s AS (SELECT vec_id,
                 {_duck_dot('v', 'qv')} / (sqrt({_duck_dot('v', 'v')}) * sqrt({_duck_dot('qv', 'qv')})) AS sim_raw
          FROM asn, q WHERE vec_id <> 0 AND (lst = p1 OR lst = p2))
    SELECT vec_id, ROUND(sim_raw, 6) AS sim FROM s
    ORDER BY sim_raw DESC, vec_id LIMIT 5""",
    doc="PERSISTED-index ANN serving certification (r10 verdict order "
    "#3, the driver-checked twin of the audit->choose->build->serve "
    "pytest e2e): build_ann_index('ivf') lands the corpus as an "
    "lst=<k> inverted file in scratch, query_ann_index computes the "
    "query's nprobe probe lists DRIVER-side and serves top-5 from a "
    "scan of only those partitions — the query RAISES unless the "
    "executed plan carries non-empty PartitionFilters, so the pruning "
    "itself is inside the certified contract, not just the result. "
    "The oracle replays the whole route in SQL (same centroid "
    "literals, probe arithmetic and exact-cosine re-rank as "
    "sim_ann_ivf): a hash match proves persisted serving == in-memory "
    "routing. Side-effecting (scratch index, removed in-query).",
)
def sim_ann_serve_ivf(spark, sf_dir):
    import re
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    scratch = tempfile.mkdtemp(prefix="annserve_")
    try:
        sim.build_ann_index("ivf", emb, f"{scratch}/idx", tune_nprobe=False)  # query pins the parity depth
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        ]
        # nprobe pinned at the oracle-parity depth (the SQL replays the
        # p1/p2 two-probe arithmetic literally); the index's TUNED
        # default serves real traffic and is certified by
        # sim_ann_operating_point + the bench serve-recall artifact
        got = sim.query_ann_index(
            "ivf", spark, f"{scratch}/idx", qv, k=5, exclude_id=0,
            nprobe=sim.IVF_NPROBE,
        )
        plan = got._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        if not (m and m.group(1).strip()):
            raise RuntimeError(
                "persisted IVF serve is not partition-pruned:\n" + plan
            )
        return got.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# ---------------------------------------------------------------------------
# Benchmark decontamination + vocabulary statistics
# ---------------------------------------------------------------------------

#: every 50th doc stands in for the held-out eval/benchmark corpus.
DECON_EVAL_MOD = 50


@query(
    "docs_decontaminate",
    f"""WITH {_DUCK_SHINGLES},
    ev AS (SELECT DISTINCT tok FROM ex WHERE doc_id % {DECON_EVAL_MOD} = 0),
    tr AS (SELECT doc_id, tok FROM ex WHERE doc_id % {DECON_EVAL_MOD} <> 0),
    hits AS (SELECT doc_id, COUNT(*) AS n
             FROM tr JOIN ev USING (tok) GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_overlap,
           COALESCE(h.n, 0) = 0 AS clean
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % {DECON_EVAL_MOD} <> 0
    ORDER BY d.doc_id""",
    doc="Benchmark decontamination: flag training docs sharing any "
    "k-token shingle with the (deterministic doc_id%50) eval corpus — "
    "the step every training pipeline runs before a data release. "
    "Scale shape: the eval shingle-key set is tiny vs a 100 TB corpus, "
    "so it is BROADCAST and the overlap test is a map-side semi join "
    "on the exploded training shingles (no corpus shuffle; one "
    "partial-agg count per doc). Short docs (< k tokens) are "
    "trivially clean and still reported.",
)
def docs_decontaminate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % DECON_EVAL_MOD == 0
    res = dd.decontaminate(docs.filter(~is_eval), docs.filter(is_eval))
    return res.select(
        F.col("id").alias("doc_id"),
        "n_overlap",
        (F.col("n_overlap") == 0).alias("clean"),
    ).orderBy("doc_id")


@query(
    "docs_fuzzy_decontaminate",
    f"""WITH {_DUCK_SHINGLES},
    sig AS (SELECT doc_id, {_duck_minhash_sig()} AS m FROM sh),
    bands AS (SELECT doc_id, b,
                     md5(m[2*b+1]::VARCHAR || '|' || m[2*b+2]::VARCHAR) AS key
              FROM sig, UNNEST(range(0, {dd.MINHASH_BANDS})) AS u(b)),
    evb AS (SELECT doc_id AS eval_id, b, key FROM bands
            WHERE doc_id % {DECON_EVAL_MOD} = 0),
    trb AS (SELECT doc_id, b, key FROM bands
            WHERE doc_id % {DECON_EVAL_MOD} <> 0),
    cand AS (SELECT DISTINCT t.doc_id, e.eval_id
             FROM trb t JOIN evb e USING (b, key)),
    common AS (SELECT cd.doc_id, cd.eval_id,
                      len(list_intersect(p.s, q.s)) AS c,
                      p2.n + q2.n AS tot
               FROM cand cd JOIN sh p ON p.doc_id = cd.doc_id
                            JOIN sh q ON q.doc_id = cd.eval_id
                            JOIN cnt p2 ON p2.doc_id = cd.doc_id
                            JOIN cnt q2 ON q2.doc_id = cd.eval_id),
    hits AS (SELECT doc_id, COUNT(*) AS n_matches,
                    ROUND(MAX(CAST(c AS DOUBLE)/CAST(tot - c AS DOUBLE)), 3) AS mj
             FROM common
             WHERE CAST(c AS DOUBLE)/CAST(tot - c AS DOUBLE)
                     >= {dd.JACCARD_THRESHOLD}
             GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(h.n_matches, 0) AS BIGINT) AS n_matches,
           COALESCE(h.mj, 0.0) AS max_jaccard,
           h.n_matches IS NOT NULL AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % {DECON_EVAL_MOD} <> 0) d
    LEFT JOIN hits h USING (doc_id)
    ORDER BY d.doc_id""",
    doc="FUZZY benchmark decontamination: training docs that are "
    "near-duplicates (MinHash-LSH candidates + exact Jaccard >= 0.8) "
    "of any eval doc — catches paraphrased/lightly-edited leakage the "
    "exact-shingle docs_decontaminate misses; the step data releases "
    "run alongside it. Scale shape: the eval side is tiny vs a 100 TB "
    "corpus, so BOTH eval probes (band table, shingle sets) are "
    "broadcast — candidates come from a map-side (band,key) equi-join "
    "and the verify touches candidates only; the training corpus is "
    "shingled once, never shuffled.",
)
def docs_fuzzy_decontaminate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % DECON_EVAL_MOD == 0
    res = dd.fuzzy_decontaminate(docs.filter(~is_eval), docs.filter(is_eval))
    return res.select(
        F.col("id").alias("doc_id"), "n_matches", "max_jaccard", "contaminated"
    ).orderBy("doc_id")


@query(
    "docs_vocab_topk",
    """WITH t AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                  FROM documents)
       SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
       FROM t GROUP BY tok
       ORDER BY tf DESC, tok LIMIT 100""",
    doc="Vocabulary head: top-100 tokens by corpus term frequency with "
    "document frequency — the first pass of any tokenizer/vocab build. "
    "Plan: explode is a narrow generate; tf/df aggregate partially "
    "map-side (df via Expand on (tok, doc_id)); the final top-k is "
    "TakeOrderedAndProject over the (small) distinct-token set, no "
    "global sort. Hot tokens are the classic skew case — partial "
    "aggregation absorbs them before the single tok-keyed shuffle.",
    bench=True,
)
def docs_vocab_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs).select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), "tok")
        .limit(100)
    )


#: corpus/new-batch split point for the incremental-dedup query.
INCR_SPLIT_ID = 250


@query(
    "dedup_minhash_incremental",
    f"""WITH {_DUCK_SHINGLES},
    sig AS (SELECT doc_id, {_duck_minhash_sig()} AS m FROM sh),
    bands AS (SELECT doc_id, b,
                     md5(m[2*b+1]::VARCHAR || '|' || m[2*b+2]::VARCHAR) AS key
              FROM sig, UNNEST(range(0, {dd.MINHASH_BANDS})) AS u(b)),
    cand AS (SELECT DISTINCT a.doc_id AS corpus_id, bb.doc_id AS new_id
             FROM bands a JOIN bands bb ON a.b = bb.b AND a.key = bb.key
             WHERE a.doc_id < {INCR_SPLIT_ID} AND bb.doc_id >= {INCR_SPLIT_ID}),
    common AS (SELECT cd.corpus_id, cd.new_id,
                      len(list_intersect(p.s, q.s)) AS c
               FROM cand cd
               JOIN sh p ON p.doc_id = cd.corpus_id
               JOIN sh q ON q.doc_id = cd.new_id)
    SELECT corpus_id, new_id,
           ROUND(CAST(c AS DOUBLE) / CAST(p.n + q.n - c AS DOUBLE), 3) AS jaccard
    FROM common JOIN cnt p ON p.doc_id = corpus_id
                JOIN cnt q ON q.doc_id = new_id
    WHERE CAST(c AS DOUBLE) / CAST(p.n + q.n - c AS DOUBLE)
            >= {dd.JACCARD_THRESHOLD}
    ORDER BY corpus_id, new_id""",
    doc="Incremental near-dup: a NEW batch (doc_id >= 250) probed "
    "against the PERSISTED MinHash index of the existing corpus "
    "(functions/dedup.build_minhash_index — bands partitioned+keyed, "
    "shingle sets cached). The per-batch cost is shingling the batch "
    "plus one (band,key) equi-join against the index — the corpus is "
    "never re-shingled. This is how a 100 TB corpus takes daily crawl "
    "deliveries without quadratic re-dedup.",
)
def dedup_minhash_incremental(spark, sf_dir):
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < INCR_SPLIT_ID)
    batch = docs.filter(F.col("doc_id") >= INCR_SPLIT_ID)
    idx = tempfile.mkdtemp(prefix="mh_index_")
    dd.build_minhash_index(corpus, idx)
    return dd.incremental_minhash_pairs(spark, batch, idx).orderBy(
        "corpus_id", "new_id"
    )


# ---------------------------------------------------------------------------
# K-means training (the IVF centroid trainer) — iterative DataFrame program
# ---------------------------------------------------------------------------


def _duck_kmeans_parts(
    k: int = cl.KMEANS_K, iters: int = cl.KMEANS_ITERS
) -> list[str]:
    """Unrolled Lloyd's iterations in DuckDB — same seeds (md5 order),
    same integer-quantized arithmetic, same floor-mean update and
    empty-cluster COALESCE as functions/clustering.kmeans_fit, so the
    trained centroids and final assignment match bit-for-bit — for ANY
    k: the CROSS JOIN + row_number argmin here is k-generic, mirroring
    both of assign_clusters' physical paths (literal and 1-row
    broadcast). Returns the shared CTE list ending at ``af`` (final
    assignment) over ``q`` (quantized vectors) and ``c{iters}`` (final
    centroids); the kmeans and semantic-dedup oracles append their own
    tails."""
    dim, quant = sim.EMBEDDING_DIM, cl.QUANT
    sq = (
        f"list_sum([(q.qv[d]-c.c[d])*(q.qv[d]-c.c[d]) "
        f"FOR d IN generate_series(1, {dim})])"
    )
    parts = [
        f"q AS (SELECT vec_id, [CAST(floor(x * {quant}) AS BIGINT) "
        f"FOR x IN embedding::DOUBLE[]] AS qv FROM embeddings)",
        f"""c0 AS (SELECT cluster, qv AS c FROM (
              SELECT row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cluster,
                     qv
              FROM q) WHERE cluster <= {k})""",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""a{i} AS (SELECT vec_id, qv, cluster FROM (
              SELECT q.vec_id, q.qv, c.cluster,
                     row_number() OVER (PARTITION BY q.vec_id
                                        ORDER BY {sq}, c.cluster) AS rn
              FROM q CROSS JOIN c{i - 1} c) WHERE rn = 1)"""
        )
        parts.append(
            f"""u{i} AS (SELECT cluster, d,
                     CAST(floor(CAST(SUM(qv[d]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS s
              FROM a{i}, (SELECT UNNEST(generate_series(1, {dim})) AS d) dims
              GROUP BY cluster, d)"""
        )
        parts.append(
            f"""c{i} AS (SELECT cluster, COALESCE(n.c, p.c) AS c
              FROM c{i - 1} p LEFT JOIN (
                SELECT cluster, list(s ORDER BY d) AS c
                FROM u{i} GROUP BY cluster) n USING (cluster))"""
        )
    parts.append(
        f"""af AS (SELECT vec_id, cluster FROM (
          SELECT q.vec_id, c.cluster,
                 row_number() OVER (PARTITION BY q.vec_id
                                    ORDER BY {sq}, c.cluster) AS rn
          FROM q CROSS JOIN c{iters} c) WHERE rn = 1)"""
    )
    return parts


def _duck_kmeans_sql() -> str:
    parts = _duck_kmeans_parts()
    with_clause = ",\n    ".join(parts)
    return f"""WITH {with_clause}
    SELECT af.cluster,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(cs.centroid_sum) AS centroid_sum,
           MIN(cs.centroid_norm2) AS centroid_norm2
    FROM af JOIN (
      SELECT cluster, CAST(list_sum(c) AS BIGINT) AS centroid_sum,
             CAST(list_sum([x * x FOR x IN c]) AS BIGINT) AS centroid_norm2
      FROM c{cl.KMEANS_ITERS}) cs USING (cluster)
    GROUP BY af.cluster ORDER BY cluster"""


def _duck_semantic_dedup_sql(
    k: int = cl.KMEANS_K, iters: int = cl.KMEANS_ITERS
) -> str:
    """SemDeDup oracle: the shared kmeans CTEs (same trained centroids,
    same final assignment) plus the within-cluster integer cosine² dup
    test — 10000·dot² >= tau_num·n2a·n2b with dot > 0, evaluated in
    exact int64 like clustering.semantic_dedup."""
    dim = sim.EMBEDDING_DIM
    tau_num = cl._semantic_tau_num()
    parts = _duck_kmeans_parts(k, iters)
    idot = f"list_sum([a.qv[d]*b.qv[d] FOR d IN generate_series(1, {dim})])"
    parts.append(
        """av AS (SELECT af.vec_id, af.cluster, q.qv,
        list_sum([x*x FOR x IN q.qv]) AS n2
      FROM af JOIN q USING (vec_id))"""
    )
    parts.append(
        f"""dup AS (SELECT b.vec_id, COUNT(*) AS n_dup_lower
      FROM av a JOIN av b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE {idot} > 0
        AND 10000 * {idot} * {idot} >= {tau_num} * a.n2 * b.n2
      GROUP BY b.vec_id)"""
    )
    with_clause = ",\n    ".join(parts)
    return f"""WITH {with_clause}
    SELECT av.vec_id, CAST(av.cluster AS BIGINT) AS cluster,
           CAST(COALESCE(d.n_dup_lower, 0) AS BIGINT) AS n_dup_lower,
           d.vec_id IS NULL AS is_kept
    FROM av LEFT JOIN dup d USING (vec_id)
    ORDER BY av.vec_id"""


@query(
    "emb_kmeans",
    _duck_kmeans_sql(),
    doc=f"K-means training over the embedding corpus (k={cl.KMEANS_K}, "
    f"{cl.KMEANS_ITERS} Lloyd's iterations, integer-quantized exact "
    "arithmetic): the trainer behind sim_ann_ivf's centroids. Per "
    "iteration the Spark plan is ONE corpus map (k centroids compiled "
    "in as literals — MLlib-style broadcast state, no join) plus ONE "
    "k-row shuffle (per-dimension sums combine map-side), with k*dim "
    "longs collected to the driver between iterations — bounded state, "
    "not data. At 100 TB each iteration costs a scan + a k-row "
    "shuffle; the oracle replays identical unrolled iterations in SQL. "
    "Output: per-cluster size + integer centroid checksums (scalar "
    "columns; arrays crash the driver canonicalizer).",
)
def emb_kmeans(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return cl.kmeans_summary(emb).select(
        F.col("cluster").cast("long").alias("cluster"),
        "n",
        "centroid_sum",
        "centroid_norm2",
    )


@query(
    "dedup_semantic",
    _duck_semantic_dedup_sql(),
    doc="SemDeDup (arXiv:2303.09540): k-means clusters as the blocking "
    "key, exact pairwise cosine only WITHIN each cluster, drop vectors "
    "with a lower-id near-duplicate (cos >= 0.45). The published "
    "method's scale claim is the plan: clustering cuts the pair space "
    "from O(n²) to Σ|cluster|², and each cluster is further "
    "block-diagonalized (join key (cluster, block-task)) so a hot "
    "cluster — the natural skew key — never exceeds task memory. "
    "Shuffled equi-join, no cross join (plan-guard enforced); dup test "
    "in exact int64 (10000·dot² >= 2025·n2a·n2b), so the oracle "
    "replays the trained centroids AND the keep-set bit-for-bit.",
)
def dedup_semantic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return cl.semantic_dedup(emb)


#: big-k SemDeDup settings: k far above ASSIGN_LITERAL_MAX so the
#: driver-checked query exercises the 1-row-broadcast join assignment
#: (the 10⁴-10⁵-k scale path), yet k <= the sf0.01 corpus (500 vectors)
#: so seeding stays well-posed at the oracle's scale.
SEMANTIC_BIGK_K = 200
SEMANTIC_BIGK_ITERS = 2


@query(
    "dedup_semantic_bigk",
    _duck_semantic_dedup_sql(SEMANTIC_BIGK_K, SEMANTIC_BIGK_ITERS),
    doc=f"SemDeDup at large k (k={SEMANTIC_BIGK_K}): same algorithm as "
    "dedup_semantic but k is past the literal-expression crossover "
    f"(clustering.ASSIGN_LITERAL_MAX={cl.ASSIGN_LITERAL_MAX}), so "
    "assignment runs the scale path — the centroid table packed into "
    "ONE broadcast row and reduced per vector with array_min over a "
    "transform (no corpus shuffle, no Catalyst expression blow-up; k "
    "bound only by broadcast size, k=50k*dim=64 is ~25 MB — the k the "
    "SemDeDup paper uses). Published SemDeDup needs k~=50k-100k; the "
    "former literal-only assignment capped k near 10^3, which made the "
    "within-cluster pair space ~n^2/k quadratic in practice. The "
    "oracle replays the identical iterations (its CROSS JOIN argmin is "
    "k-generic), pinning both trained centroids and keep-set at k=200.",
)
def dedup_semantic_bigk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return cl.semantic_dedup(
        emb, k=SEMANTIC_BIGK_K, iters=SEMANTIC_BIGK_ITERS
    )


def _duck_knn_graph_sql() -> str:
    """k-NN-graph oracle: shared kmeans CTEs, within-cluster pairs
    enumerated once and mirrored into both directions, rank by the
    identical double cosine (int dot / sqrt of int norm product)."""
    dim = sim.EMBEDDING_DIM
    parts = _duck_kmeans_parts()
    idot = f"list_sum([a.qv[d]*b.qv[d] FOR d IN generate_series(1, {dim})])"
    parts.append(
        """av AS (SELECT af.vec_id, af.cluster, q.qv,
        list_sum([x*x FOR x IN q.qv]) AS n2
      FROM af JOIN q USING (vec_id))"""
    )
    parts.append(
        f"""pr AS (SELECT a.vec_id AS id_lo, b.vec_id AS id_hi,
             {idot} AS dt, a.n2 * b.n2 AS n2p
      FROM av a JOIN av b ON a.cluster = b.cluster AND a.vec_id < b.vec_id)"""
    )
    parts.append(
        """dir AS (SELECT id_lo AS src, id_hi AS dst, dt, n2p FROM pr
      UNION ALL SELECT id_hi, id_lo, dt, n2p FROM pr)"""
    )
    parts.append(
        """rk AS (SELECT src, dst,
             CAST(dt AS DOUBLE) / sqrt(CAST(n2p AS DOUBLE)) AS cos_raw,
             row_number() OVER (
               PARTITION BY src
               ORDER BY CAST(dt AS DOUBLE) / sqrt(CAST(n2p AS DOUBLE)) DESC,
                        dst) AS rank
      FROM dir)"""
    )
    with_clause = ",\n    ".join(parts)
    return f"""WITH {with_clause}
    SELECT src, CAST(rank AS BIGINT) AS rank, dst,
           ROUND(cos_raw, 4) AS cos
    FROM rk WHERE rank <= {cl.KNN_NEIGHBORS}
    ORDER BY src, rank"""


@query(
    "sim_knn_graph",
    _duck_knn_graph_sql(),
    doc="Cluster-blocked k-NN graph: each vector's top-5 cosine "
    "neighbors within its trained k-means cluster — the adjacency "
    "list graph-based curation (dedup clustering, diversity sampling, "
    "label propagation) starts from. Same Σ|cluster|² pair space as "
    "dedup_semantic (never all-pairs, block-diagonalized equi-join); "
    "pairs enumerated once, mirrored into both directions, top-k via "
    "one (src)-keyed window rank — per-partition sort, no global "
    "sort. Cosine = exact int64 dot / sqrt(exact int64 norm product): "
    "IEEE-identical in both engines, ties broken on dst id, so the "
    "whole adjacency list hash-matches.",
)
def sim_knn_graph(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return cl.knn_graph(emb)


def _duck_prototypes_sql() -> str:
    """Prototype-selection oracle: shared kmeans CTEs, per-vector best
    (cluster, dist) from the same integer distance, per-cluster argmin
    with the same (dist, vec_id) tie order."""
    k, iters, dim = cl.KMEANS_K, cl.KMEANS_ITERS, sim.EMBEDDING_DIM
    sq = (
        f"list_sum([(q.qv[d]-c.c[d])*(q.qv[d]-c.c[d]) "
        f"FOR d IN generate_series(1, {dim})])"
    )
    parts = _duck_kmeans_parts()
    parts.append(
        f"""best AS (SELECT vec_id, cluster, dist FROM (
          SELECT q.vec_id, c.cluster, {sq} AS dist,
                 row_number() OVER (PARTITION BY q.vec_id
                                    ORDER BY {sq}, c.cluster) AS rn
          FROM q CROSS JOIN c{iters} c) WHERE rn = 1)"""
    )
    parts.append(
        """med AS (SELECT cluster, vec_id, dist,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY dist, vec_id) AS mr
      FROM best)"""
    )
    with_clause = ",\n    ".join(parts)
    return f"""WITH {with_clause}
    SELECT CAST(m.cluster AS BIGINT) AS cluster,
           m.vec_id AS prototype_id, CAST(m.dist AS BIGINT) AS dist2,
           s.n
    FROM med m JOIN (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n
                     FROM best GROUP BY cluster) s USING (cluster)
    WHERE m.mr = 1 ORDER BY m.cluster"""


@query(
    "emb_cluster_prototypes",
    _duck_prototypes_sql(),
    doc="Prototype selection: per trained k-means cluster, the vector "
    "nearest its centroid (exact integer squared L2, ties to the "
    "lower id) plus the cluster size — one human-readable exemplar "
    "per cluster, the first step of dataset distillation and cluster "
    "labeling. Plan: distances to the k compiled-in centroid literals "
    "are one codegen'd map (no join); the per-cluster argmin windows "
    "inside k tiny groups after ONE cluster-keyed shuffle.",
)
def emb_cluster_prototypes(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return cl.cluster_prototypes(emb)


# ---------------------------------------------------------------------------
# Dedup clustering: near-dup pairs -> connected components
# ---------------------------------------------------------------------------


@query(
    "dedup_components",
    f"""WITH RECURSIVE {_DUCK_SHINGLES}, {_DUCK_MINHASH_CTES},
    pairs AS (SELECT doc_a, doc_b FROM common
              JOIN cnt p ON p.doc_id = doc_a
              JOIN cnt q ON q.doc_id = doc_b
              WHERE CAST(c AS DOUBLE) / CAST(p.n + q.n - c AS DOUBLE)
                      >= {dd.JACCARD_THRESHOLD}),
    e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
    walk(node, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.b, w.label FROM walk w JOIN e ON e.a = w.node)
    SELECT node AS doc_id, MIN(label) AS component,
           node = MIN(label) AS is_canonical
    FROM walk GROUP BY node ORDER BY doc_id""",
    doc="Dedup clustering: MinHash-LSH near-dup pairs closed into "
    "connected components (operators/graph.connected_components — "
    "iterative min-label propagation), labeling every document with "
    "its cluster's canonical representative so a keep-policy pass can "
    "drop the rest. Each round is ONE co-partitioned (node-keyed) "
    "shuffle with map-side min combine, frontier localCheckpoint'ed so "
    "lineage stays O(1); LSH components are shallow (diameter 1-3) so "
    "the closure costs ~3 rounds at any corpus size. The oracle is an "
    "INDEPENDENT implementation — DuckDB's recursive CTE fixpoint — "
    "over the same pair list.",
)
def dedup_components(spark, sf_dir):
    from meteo_etl_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs)
    cc = connected_components(
        docs.select("doc_id"),
        pairs,
        node_col="doc_id",
        src_col="doc_a",
        dst_col="doc_b",
    )
    return (
        cc.select(
            F.col("node").alias("doc_id"),
            "component",
            (F.col("node") == F.col("component")).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_cluster_sizes",
    f"""WITH RECURSIVE {_DUCK_SHINGLES}, {_DUCK_MINHASH_CTES},
    pairs AS (SELECT doc_a, doc_b FROM common
              JOIN cnt p ON p.doc_id = doc_a
              JOIN cnt q ON q.doc_id = doc_b
              WHERE CAST(c AS DOUBLE) / CAST(p.n + q.n - c AS DOUBLE)
                      >= {dd.JACCARD_THRESHOLD}),
    e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
    walk(node, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.b, w.label FROM walk w JOIN e ON e.a = w.node),
    comp AS (SELECT node AS doc_id, MIN(label) AS component
             FROM walk GROUP BY node),
    sizes AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS sz
              FROM comp GROUP BY component)
    SELECT sz AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(SUM(sz) - COUNT(*) AS BIGINT) AS n_would_drop
    FROM sizes GROUP BY sz ORDER BY sz""",
    doc="Near-dup cluster size histogram — the dedup OPERATING table "
    "read before committing a canonical-keep policy: how many "
    "duplicate clusters exist at each size, how many docs they hold, "
    "and how many a keep-one policy would drop (Σ n_would_drop = the "
    "corpus's total dedup yield; the size-1 row is the untouched "
    "singleton mass). Components come from the SAME bounded "
    "MinHash-LSH pair route as dedup_components/dedup_canonical (the "
    "banded candidate join, never all-pairs); the oracle replays them "
    "via DuckDB's recursive-CTE fixpoint. Plan: pairs -> ~3 "
    "node-keyed CC rounds -> two key-bounded aggregates; the "
    "histogram is at most |distinct sizes| rows — scale-free output "
    "from corpus-sized input.",
    bench=True,
)
def dedup_cluster_sizes(spark, sf_dir):
    from meteo_etl_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs)
    cc = connected_components(
        docs.select("doc_id"),
        pairs,
        node_col="doc_id",
        src_col="doc_a",
        dst_col="doc_b",
    )
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    return (
        sizes.groupBy("sz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_docs"),
            (F.sum("sz") - F.count(F.lit(1))).cast("long").alias(
                "n_would_drop"
            ),
        )
        .select(
            F.col("sz").alias("cluster_size"),
            "n_clusters",
            "n_docs",
            "n_would_drop",
        )
        .orderBy("cluster_size")
    )


@query(
    "docs_leakage_safe_split",
    f"""WITH RECURSIVE {_DUCK_SHINGLES}, {_DUCK_MINHASH_CTES},
    pairs AS (SELECT doc_a, doc_b FROM common
              JOIN cnt p ON p.doc_id = doc_a
              JOIN cnt q ON q.doc_id = doc_b
              WHERE CAST(c AS DOUBLE) / CAST(p.n + q.n - c AS DOUBLE)
                      >= {dd.JACCARD_THRESHOLD}),
    e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
    walk(node, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.b, w.label FROM walk w JOIN e ON e.a = w.node),
    comp AS (SELECT node AS doc_id, MIN(label) AS component
             FROM walk GROUP BY node),
    s AS (SELECT doc_id, component,
                 CASE WHEN ('0x' || substr(md5(component::VARCHAR), 1, 8))::BIGINT % 1000 < 900 THEN 'train'
                      WHEN ('0x' || substr(md5(component::VARCHAR), 1, 8))::BIGINT % 1000 < 950 THEN 'val'
                      ELSE 'test' END AS split
          FROM comp)
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT component) AS BIGINT) AS n_components
    FROM s GROUP BY split ORDER BY split""",
    doc="Leakage-safe train/val/test split: the 90/5/5 hash split "
    "keyed on the near-dup COMPONENT label instead of the doc id, so "
    "an entire duplicate cluster lands in ONE split and no near-dup "
    "pair can straddle train/test (per-doc hashing leaks: a trained "
    "model is evaluated on near-copies of its training docs — the "
    "benchmark-inflation bug decontamination chases after the fact, "
    "prevented here at assignment time). In-query certification: the "
    "straddling-pair count is asserted ZERO (RuntimeError otherwise). "
    "Returned rows are the per-split doc/component census; the oracle "
    "replays components via DuckDB's recursive-CTE fixpoint and the "
    "identical md5 permille arithmetic. Plan: the CC closure's ~3 "
    "node-keyed rounds (LSH components are shallow), then a pure-map "
    "split assignment — adding docs later never moves an existing "
    "cluster between splits (the incremental-append contract "
    "hash_split already gives per-doc).",
)
def docs_leakage_safe_split(spark, sf_dir):
    from meteo_etl_spark.functions.sampling import hash_split
    from meteo_etl_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    # checkpoint the candidate pairs ONCE: connected_components
    # consumes them iteratively AND the straddle guard re-joins them
    # afterwards — without this the full MinHash-LSH candidate
    # pipeline (shingle -> minhash -> band -> bucket-join) recomputes
    # from scratch for the guard (r13 advice; the `assigned`
    # checkpoint below only covers the CC output, not the pairs)
    pairs = dd.minhash_lsh_pairs(docs).localCheckpoint(eager=True)
    cc = connected_components(
        docs.select("doc_id"),
        pairs,
        node_col="doc_id",
        src_col="doc_a",
        dst_col="doc_b",
    ).select(F.col("node").alias("doc_id"), "component")
    assigned = hash_split(
        cc, "component", {"train": 0.9, "val": 0.05, "test": 0.05}
    ).select("doc_id", "component", "split")
    assigned = assigned.localCheckpoint(eager=True)  # CC is iterative;
    # sever lineage so the guard join and the census don't re-run it
    sa = assigned.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = assigned.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    straddle = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    if straddle:
        raise RuntimeError(
            f"leakage-safe split leaked: {straddle} near-dup pairs "
            "straddle splits"
        )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("component").cast("long").alias("n_components"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# Chunking + TF-IDF term scoring
# ---------------------------------------------------------------------------


@query(
    "docs_chunk_windows",
    f"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    n AS (SELECT doc_id, w, len(w) AS n FROM t),
    c AS (SELECT doc_id, w,
                 CASE WHEN n <= {pk.CHUNK_TOKENS} THEN 1
                      ELSE CAST(ceil((n - {pk.CHUNK_TOKENS}) / {float(pk.CHUNK_STRIDE)}) AS BIGINT) + 1
                 END AS n_chunks
          FROM n),
    x AS (SELECT doc_id, w, UNNEST(range(0, n_chunks)) AS chunk_id FROM c),
    s AS (SELECT doc_id, chunk_id,
                 w[chunk_id * {pk.CHUNK_STRIDE} + 1 :
                   chunk_id * {pk.CHUNK_STRIDE} + {pk.CHUNK_TOKENS}] AS ch
          FROM x)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(ch) AS BIGINT) AS n_tokens,
           md5(array_to_string(ch, ' ')) AS chunk_hash
    FROM s ORDER BY doc_id, chunk_id""",
    doc=f"Sliding token-window chunking (width {pk.CHUNK_TOKENS}, stride "
    f"{pk.CHUNK_STRIDE}): splits long documents into overlapping "
    "model-context-sized windows — the counterpart of sequence packing "
    "for docs LONGER than the context. Shuffle-free generate plan: "
    "tokenize once, explode an arithmetic sequence of chunk ids, slice "
    "the token array per chunk; each chunk carries an md5 content hash "
    "so exact-dedup composes downstream. At 100 TB this is a pure map "
    "whose output is ~n_tokens/stride rows per doc — no exchange.",
)
def docs_chunk_windows(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return pk.chunk_token_windows(fan_out(docs)).orderBy("doc_id", "chunk_id")


@query(
    "docs_tfidf_topk",
    """WITH t AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                  FROM documents),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY doc_id, tok),
    df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY tok),
    s AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
                 CAST(tf.tf AS DOUBLE) / (df.df + 1) AS sc
          FROM tf JOIN df USING (tok)),
    r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY sc DESC, tok) AS rank
          FROM s)
    SELECT doc_id, CAST(rank AS BIGINT) AS rank, tok AS term, tf, df,
           floor(sc * 1000000 + 0.5) / 1000000 AS score
    FROM r WHERE rank <= 5 ORDER BY doc_id, rank""",
    doc="Per-document top-5 characteristic terms by TF-IDF. The idf is "
    "the log-free monotone equivalent 1/(df+1): IEEE division is "
    "correctly rounded (bit-identical across engines) where ln() is "
    "not — same ranking, deterministic parity; half-up fixed-point "
    "rounding on output (engine ROUND diverges on exact binary ties). "
    "Plan: tf is a (doc,tok) partial agg; df a tok-keyed agg (hot-token "
    "skew absorbed map-side); the join is vocabulary-sized on tok; the "
    "top-k window shuffles once on doc_id. At 100 TB bucket both legs "
    "by tok to make the join exchange-free (operators/bucketing).",
    bench=True,
)
def docs_tfidf_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs).select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    sc = F.col("tf").cast("double") / (F.col("df") + 1)
    w = Window.partitionBy("doc_id").orderBy(F.desc("sc"), "tok")
    return (
        tf.join(dfreq, "tok")
        .withColumn("sc", sc)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select(
            "doc_id",
            "rank",
            F.col("tok").alias("term"),
            "tf",
            "df",
            (F.floor(F.col("sc") * 1000000 + F.lit(0.5)) / 1000000).alias("score"),
        )
        .orderBy("doc_id", "rank")
    )


#: BM25 retrieval constants: the Robertson k1/b defaults, a fixed
#: 3-term query panel (data-independent literals, the sim_ann_recall
#: panel discipline), and every fractional constant injected into BOTH
#: engines from the SAME Python float (repr round-trips the exact
#: double, so "1.2" can never parse to different bits).
_BM25_TERMS = ("join", "hash", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_K1P1 = _BM25_K1 + 1.0
_BM25_TOPK = 10


#: the BM25 oracle CTE chain ending in ``f(doc_id, n_terms, score_u)``
#: — shared verbatim by docs_bm25_topk and docs_hybrid_rrf so both
#: oracles replay the IDENTICAL correctly-rounded double chain.
_BM25_ORACLE_CORE = f"""WITH t AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                   FROM documents),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
           FROM t GROUP BY doc_id),
    g AS (SELECT CAST(SUM(dl) AS BIGINT) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS nd FROM dl),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM t WHERE tok IN {_BM25_TERMS!r}
           GROUP BY doc_id, tok),
    df AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM t WHERE tok IN {_BM25_TERMS!r} GROUP BY tok),
    s AS (SELECT tf.doc_id, tf.tok,
                 ((CAST(g.nd AS DOUBLE) + 1) / (CAST(df.df AS DOUBLE) + 1))
                 * ((CAST(tf.tf AS DOUBLE) * {_BM25_K1P1!r})
                    / (CAST(tf.tf AS DOUBLE)
                       + {_BM25_K1!r} * (1 - {_BM25_B!r}
                          + {_BM25_B!r} * (CAST(dl.dl AS DOUBLE)
                             / (CAST(g.tot AS DOUBLE)
                                / CAST(g.nd AS DOUBLE)))))) AS sc
          FROM tf JOIN dl USING (doc_id) CROSS JOIN g JOIN df USING (tok)),
    p AS (SELECT doc_id,
                 MAX(CASE WHEN tok = '{_BM25_TERMS[0]}' THEN sc END) AS s0,
                 MAX(CASE WHEN tok = '{_BM25_TERMS[1]}' THEN sc END) AS s1,
                 MAX(CASE WHEN tok = '{_BM25_TERMS[2]}' THEN sc END) AS s2,
                 CAST(COUNT(*) AS BIGINT) AS n_terms
          FROM s GROUP BY doc_id),
    f AS (SELECT doc_id, n_terms,
                 CAST(floor((COALESCE(s0, 0) + COALESCE(s1, 0)
                             + COALESCE(s2, 0)) * 1000000 + 0.5)
                      AS BIGINT) AS score_u
          FROM p)"""


@query(
    "docs_bm25_topk",
    f"""{_BM25_ORACLE_CORE}
    SELECT doc_id, n_terms, score_u / 1000000.0 AS score
    FROM f ORDER BY score_u DESC, doc_id LIMIT {_BM25_TOPK}""",
    doc="BM25 retrieval over the corpus for a fixed 3-term query "
    f"panel {_BM25_TERMS} — the production keyword-retrieval scorer "
    "beside docs_tfidf_topk's per-doc characteristic terms. Variant "
    "note (documented, deliberate): idf is the log-free rational "
    "(N+1)/(df+1) — IEEE division is correctly rounded on both "
    "engines where ln() is not; k1=1.2, b=0.75 with full "
    "length-normalization (dl/avgdl). Determinism: one fixed chain "
    "of correctly-rounded double ops per (doc, term); the per-doc "
    "SUM pivots the 3 terms into columns and adds them in literal "
    "order (a groupBy SUM over doubles would re-associate under "
    "partitioning); ranking keys on the 1e-6-snapped integer, ties "
    "on doc_id. Plan: tf prunes to the query terms BEFORE its "
    "aggregate (the scan's explode feeds a 3-term filter); df is a "
    "3-row broadcast; dl joins doc-keyed; the (tot, nd) census is a "
    "1-row broadcast cross — linear work and a TakeOrderedAndProject "
    "top-k, never a global sort.",
    bench=True,
)
def docs_bm25_topk(spark, sf_dir):
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("score_u"), "doc_id")
        .limit(_BM25_TOPK)
        .select(
            "doc_id",
            "n_terms",
            (F.col("score_u") / F.lit(1000000.0)).alias("score"),
        )
    )


def _bm25_scored(spark, sf_dir):
    """The shared BM25 scoring chain (doc_id, n_terms, score_u) for the
    fixed ``_BM25_TERMS`` panel — docs_bm25_topk's exact expression
    tree, factored so the hybrid-retrieval fusion reuses the identical
    correctly-rounded double chain (any drift would hash-split the two
    queries' oracles)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs).select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    g = dl.agg(
        F.sum("dl").alias("tot"), F.count(F.lit(1)).alias("nd")
    )
    qt = toks.filter(F.col("tok").isin(list(_BM25_TERMS)))
    tf = qt.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = qt.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df")
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    avgdl = dbl("tot") / dbl("nd")
    sc = ((dbl("nd") + F.lit(1.0)) / (dbl("df") + F.lit(1.0))) * (
        (dbl("tf") * F.lit(_BM25_K1P1))
        / (
            dbl("tf")
            + F.lit(_BM25_K1)
            * (F.lit(1.0) - F.lit(_BM25_B) + F.lit(_BM25_B) * (dbl("dl") / avgdl))
        )
    )
    scored = (
        tf.join(dl, "doc_id")
        .crossJoin(F.broadcast(g))
        .join(F.broadcast(dfreq), "tok")
        .select("doc_id", "tok", sc.alias("sc"))
    )
    pivoted = scored.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("tok") == t, F.col("sc"))).alias(f"s{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
        F.count(F.lit(1)).alias("n_terms"),
    )
    total = (
        F.coalesce(F.col("s0"), F.lit(0.0))
        + F.coalesce(F.col("s1"), F.lit(0.0))
        + F.coalesce(F.col("s2"), F.lit(0.0))
    )
    return pivoted.select(
        "doc_id",
        "n_terms",
        F.floor(total * F.lit(1000000) + F.lit(0.5))
        .cast("long")
        .alias("score_u"),
    )


#: reciprocal-rank-fusion constants: the standard RRF damping k=60
#: (Cormack et al. 2009), per-arm candidate depth, fused output size.
_RRF_K = 60
_RRF_ARM_K = 30
_RRF_TOPK = 20


@query(
    "docs_hybrid_rrf",
    f"""{_BM25_ORACLE_CORE},
    lex AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_u DESC,
                                              doc_id) AS lex_rank
            FROM (SELECT doc_id, score_u FROM f
                  ORDER BY score_u DESC, doc_id LIMIT {_RRF_ARM_K})),
    v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
    cs AS (SELECT vec_id,
                  {_duck_dot('v', 'qv')} / (sqrt({_duck_dot('v', 'v')}) * sqrt({_duck_dot('qv', 'qv')})) AS sim_raw
           FROM v, q WHERE vec_id <> 0),
    sem AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY sim_raw DESC,
                                              vec_id) AS sem_rank
            FROM (SELECT vec_id, sim_raw FROM cs
                  ORDER BY sim_raw DESC, vec_id LIMIT {_RRF_ARM_K})),
    u AS (SELECT COALESCE(l.doc_id, sm.vec_id) AS doc_id,
                 CAST(l.lex_rank AS BIGINT) AS lex_rank,
                 CAST(sm.sem_rank AS BIGINT) AS sem_rank,
                 CAST(floor((COALESCE(1.0 / ({_RRF_K} + l.lex_rank), 0)
                             + COALESCE(1.0 / ({_RRF_K} + sm.sem_rank), 0))
                            * 1000000000 + 0.5) AS BIGINT) AS rrf_u
          FROM lex l FULL OUTER JOIN sem sm ON l.doc_id = sm.vec_id)
    SELECT doc_id, lex_rank, sem_rank, rrf_u / 1000000000.0 AS rrf_score
    FROM u ORDER BY rrf_u DESC, doc_id LIMIT {_RRF_TOPK}""",
    doc="Hybrid retrieval with reciprocal-rank fusion — the standard "
    "two-arm retrieval stack of RAG and training-data curation "
    "(Cormack et al. 2009: RRF beats either arm alone and needs no "
    "score calibration because it consumes RANKS, not scores): the "
    f"BM25 lexical arm (docs_bm25_topk's exact scoring chain over the "
    f"{_BM25_TERMS} panel) and the embedding-cosine semantic arm "
    "(query = vec 0, the serve-smoke anchor) each contribute their "
    f"top-{_RRF_ARM_K}; a document's fused score is "
    f"sum(1/({_RRF_K}+rank)) over the arms it appears in, 1e-9-snapped "
    "for hash-stable ordering, doc_id ties. Plan: each arm ends in "
    "TakeOrderedAndProject (no global sort); the rank windows run "
    f"over the {_RRF_ARM_K}-row arm frames (bounded, allowlisted); "
    "fusion is a full-outer equi-join of two constant-size frames. At "
    "100 TB each arm is one linear scan + top-k — exactly how a real "
    "hybrid retriever composes (IVF/LSH can replace the brute arm "
    "with the same fusion stage).",
    bench=True,
)
def docs_hybrid_rrf(spark, sf_dir):
    lex_w = Window.orderBy(F.desc("score_u"), "doc_id")
    lex = (
        _bm25_scored(spark, sf_dir)
        .select("doc_id", "score_u")
        .orderBy(F.desc("score_u"), "doc_id")
        .limit(_RRF_ARM_K)
        .withColumn("lex_rank", F.row_number().over(lex_w).cast("long"))
    )
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    corpus = fan_out(emb).select("vec_id", v.alias("v"))
    q = corpus.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    sem_w = Window.orderBy(F.desc("sim_raw"), "vec_id")
    sem = (
        corpus.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select("vec_id", sim.cosine(F.col("v"), F.col("qv")).alias("sim_raw"))
        .orderBy(F.desc("sim_raw"), "vec_id")
        .limit(_RRF_ARM_K)
        .withColumn("sem_rank", F.row_number().over(sem_w).cast("long"))
    )
    return _rrf_fuse(lex, sem)


@query(
    "docs_hybrid_rrf_routed",
    f"""{_BM25_ORACLE_CORE},
    lex AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_u DESC,
                                              doc_id) AS lex_rank
            FROM (SELECT doc_id, score_u FROM f
                  ORDER BY score_u DESC, doc_id LIMIT {_RRF_ARM_K})),
    sv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sc2 AS (SELECT vec_id, v, {_duck_ivf_dots('v')} AS d FROM sv),
    sasn AS (SELECT vec_id, v, list_position(d, list_max(d)) AS lst, d
             FROM sc2),
    sq0 AS (SELECT v AS qv, lst AS p1, d AS qd FROM sasn WHERE vec_id = 0),
    sq AS (SELECT qv, p1,
                 list_position(
                   list_transform(range(1, {sim.IVF_LISTS + 1}),
                     i -> CASE WHEN i = p1 THEN -1e18 ELSE qd[i] END),
                   list_max(
                     list_transform(range(1, {sim.IVF_LISTS + 1}),
                       i -> CASE WHEN i = p1 THEN -1e18 ELSE qd[i] END))) AS p2
          FROM sq0),
    ss AS (SELECT vec_id,
                 {_duck_dot('v', 'qv')} / (sqrt({_duck_dot('v', 'v')}) * sqrt({_duck_dot('qv', 'qv')})) AS sim_raw
          FROM sasn, sq WHERE vec_id <> 0 AND (lst = p1 OR lst = p2)),
    sem AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY sim_raw DESC,
                                              vec_id) AS sem_rank
            FROM (SELECT vec_id, sim_raw FROM ss
                  ORDER BY sim_raw DESC, vec_id LIMIT {_RRF_ARM_K})),
    u AS (SELECT COALESCE(l.doc_id, sm.vec_id) AS doc_id,
                 CAST(l.lex_rank AS BIGINT) AS lex_rank,
                 CAST(sm.sem_rank AS BIGINT) AS sem_rank,
                 CAST(floor((COALESCE(1.0 / ({_RRF_K} + l.lex_rank), 0)
                             + COALESCE(1.0 / ({_RRF_K} + sm.sem_rank), 0))
                            * 1000000000 + 0.5) AS BIGINT) AS rrf_u
          FROM lex l FULL OUTER JOIN sem sm ON l.doc_id = sm.vec_id)
    SELECT doc_id, lex_rank, sem_rank, rrf_u / 1000000000.0 AS rrf_score
    FROM u ORDER BY rrf_u DESC, doc_id LIMIT {_RRF_TOPK}""",
    doc="docs_hybrid_rrf on the SCALE path: the semantic arm routes "
    f"through the IVF coarse quantizer ({sim.IVF_LISTS} lists, "
    f"nprobe={sim.IVF_NPROBE} — sim_ann_ivf's exact probe arithmetic) "
    "instead of a brute corpus scan, then fuses with the BM25 lexical "
    "arm by the same 1e-9-snapped reciprocal-rank formula. This is "
    "how a production hybrid retriever actually composes at 100 TB — "
    "the ANN candidate route feeds the fusion stage unchanged (the "
    "brute-arm twin docs_hybrid_rrf is the recall baseline; comparing "
    "the two result sets measures what IVF routing costs the FUSED "
    "list, not just the semantic arm). Plan: the semantic arm scans "
    "only the probed lists (partition-prunable when persisted), "
    "TakeOrderedAndProject top-30, bounded arm-rank windows, "
    "constant-size full-outer fusion.",
    bench=True,
)
def docs_hybrid_rrf_routed(spark, sf_dir):
    lex_w = Window.orderBy(F.desc("score_u"), "doc_id")
    lex = (
        _bm25_scored(spark, sf_dir)
        .select("doc_id", "score_u")
        .orderBy(F.desc("score_u"), "doc_id")
        .limit(_RRF_ARM_K)
        .withColumn("lex_rank", F.row_number().over(lex_w).cast("long"))
    )
    emb = load_table(spark, sf_dir, "embeddings")
    sem = sim.ann_ivf_topk(
        emb, query_id=0, k=_RRF_ARM_K, rank_col="sem_rank"
    ).select("vec_id", "sem_rank")
    return _rrf_fuse(lex, sem)


def _rrf_fuse(lex, sem):
    """The shared RRF fusion tail (docs_hybrid_rrf's exact expression
    chain over two ranked arm frames)."""
    rrf = F.floor(
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("sem_rank")), F.lit(0.0)
            )
        )
        * F.lit(1000000000)
        + F.lit(0.5)
    ).cast("long")
    return (
        lex.join(sem, lex["doc_id"] == sem["vec_id"], "full_outer")
        .select(
            F.coalesce(lex["doc_id"], sem["vec_id"]).alias("doc_id"),
            "lex_rank",
            "sem_rank",
            rrf.alias("rrf_u"),
        )
        .orderBy(F.desc("rrf_u"), "doc_id")
        .limit(_RRF_TOPK)
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            (F.col("rrf_u") / F.lit(1000000000.0)).alias("rrf_score"),
        )
    )


def _route_cost_oracle() -> str:
    """DuckDB replay of BOTH fused lists (brute + IVF-routed semantic
    arm over the shared BM25 lexical arm) compared head-to-head."""
    fuse = (
        "SELECT COALESCE(l.doc_id, sm.vec_id) AS doc_id, "
        f"CAST(floor((COALESCE(1.0 / ({_RRF_K} + l.lex_rank), 0) "
        f"+ COALESCE(1.0 / ({_RRF_K} + sm.sem_rank), 0)) "
        "* 1000000000 + 0.5) AS BIGINT) AS rrf_u "
        "FROM lex l FULL OUTER JOIN {sem} sm ON l.doc_id = sm.vec_id"
    )
    pos = (
        "SELECT doc_id, ROW_NUMBER() OVER (ORDER BY rrf_u DESC, doc_id)"
        " AS pos FROM (SELECT doc_id, rrf_u FROM {fused} "
        f"ORDER BY rrf_u DESC, doc_id LIMIT {_RRF_TOPK})"
    )
    return f"""{_BM25_ORACLE_CORE},
    lex AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_u DESC,
                                              doc_id) AS lex_rank
            FROM (SELECT doc_id, score_u FROM f
                  ORDER BY score_u DESC, doc_id LIMIT {_RRF_ARM_K})),
    v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
    cs AS (SELECT vec_id,
                  {_duck_dot('v', 'qv')} / (sqrt({_duck_dot('v', 'v')}) * sqrt({_duck_dot('qv', 'qv')})) AS sim_raw
           FROM v, q WHERE vec_id <> 0),
    bsem AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY sim_raw DESC,
                                               vec_id) AS sem_rank
             FROM (SELECT vec_id, sim_raw FROM cs
                   ORDER BY sim_raw DESC, vec_id LIMIT {_RRF_ARM_K})),
    rc2 AS (SELECT vec_id, v, {_duck_ivf_dots('v')} AS d FROM v),
    rasn AS (SELECT vec_id, v, list_position(d, list_max(d)) AS lst, d
             FROM rc2),
    rq0 AS (SELECT v AS qv, lst AS p1, d AS qd FROM rasn WHERE vec_id = 0),
    rq AS (SELECT qv, p1,
                 list_position(
                   list_transform(range(1, {sim.IVF_LISTS + 1}),
                     i -> CASE WHEN i = p1 THEN -1e18 ELSE qd[i] END),
                   list_max(
                     list_transform(range(1, {sim.IVF_LISTS + 1}),
                       i -> CASE WHEN i = p1 THEN -1e18 ELSE qd[i] END))) AS p2
          FROM rq0),
    rs AS (SELECT vec_id,
                 {_duck_dot('v', 'qv')} / (sqrt({_duck_dot('v', 'v')}) * sqrt({_duck_dot('qv', 'qv')})) AS sim_raw
          FROM rasn, rq WHERE vec_id <> 0 AND (lst = p1 OR lst = p2)),
    rsem AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY sim_raw DESC,
                                               vec_id) AS sem_rank
             FROM (SELECT vec_id, sim_raw FROM rs
                   ORDER BY sim_raw DESC, vec_id LIMIT {_RRF_ARM_K})),
    bu AS ({fuse.format(sem='bsem')}),
    ru AS ({fuse.format(sem='rsem')}),
    bp AS ({pos.format(fused='bu')}),
    rp AS ({pos.format(fused='ru')})
    SELECT CAST(SUM(CASE WHEN b.doc_id IS NOT NULL AND r.doc_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
           CAST(SUM(CASE WHEN b.doc_id IS NOT NULL AND r.doc_id IS NOT NULL
                         THEN ABS(b.pos - r.pos) ELSE 0 END)
                AS BIGINT) AS rank_displacement,
           CAST(SUM(CASE WHEN r.doc_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS only_brute,
           CAST(SUM(CASE WHEN b.doc_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS only_routed
    FROM bp b FULL OUTER JOIN rp r ON b.doc_id = r.doc_id"""


@query(
    "docs_hybrid_route_cost",
    _route_cost_oracle(),
    doc="The routing-cost audit the docs_hybrid_rrf_routed doc "
    "promises: BOTH fused top-20 lists — brute semantic arm vs the "
    "IVF-probed arm, over the shared BM25 lexical arm — compared "
    "head-to-head in one row: common members, summed rank "
    "displacement over the common set, and the members each side "
    "holds exclusively. This measures what the ANN route costs the "
    "FUSED retrieval result (the quantity a user deciding "
    "brute-vs-routed actually cares about), not just the semantic "
    "arm's recall. Plan: the two fused frames are the registered "
    "queries' own plans (constant-size by construction); positions "
    "are windows over the 20-row fused frames; the comparison is a "
    "full-outer join of two 20-row relations into one aggregate row.",
)
def docs_hybrid_route_cost(spark, sf_dir):
    pos_w = Window.orderBy(F.desc("rrf_score"), "doc_id")
    bp = (
        docs_hybrid_rrf(spark, sf_dir)
        .select("doc_id", "rrf_score")
        .withColumn("pos", F.row_number().over(pos_w))
    )
    rp = (
        docs_hybrid_rrf_routed(spark, sf_dir)
        .select("doc_id", "rrf_score")
        .withColumn("pos", F.row_number().over(pos_w))
    )
    both = F.col("b_doc").isNotNull() & F.col("r_doc").isNotNull()
    return (
        bp.select(
            F.col("doc_id").alias("b_doc"), F.col("pos").alias("b_pos")
        )
        .join(
            rp.select(
                F.col("doc_id").alias("r_doc"), F.col("pos").alias("r_pos")
            ),
            F.col("b_doc") == F.col("r_doc"),
            "full_outer",
        )
        .agg(
            F.sum(F.when(both, 1).otherwise(0)).cast("long").alias("n_common"),
            F.sum(
                F.when(both, F.abs(F.col("b_pos") - F.col("r_pos"))).otherwise(0)
            )
            .cast("long")
            .alias("rank_displacement"),
            F.sum(F.when(F.col("r_doc").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("only_brute"),
            F.sum(F.when(F.col("b_doc").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("only_routed"),
        )
    )


@query(
    "dedup_edit_distance",
    f"""WITH {_DUCK_SHINGLES}, {_DUCK_MINHASH_CTES}
    SELECT cd.doc_a, cd.doc_b,
           CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev,
           floor((1.0 - levenshtein(da.text, db.text) * 1.0
                        / greatest(length(da.text), length(db.text))) * 1000
                 + 0.5) / 1000 AS similarity
    FROM cand cd
    JOIN documents da ON da.doc_id = cd.doc_a
    JOIN documents db ON db.doc_id = cd.doc_b
    WHERE 1.0 - levenshtein(da.text, db.text) * 1.0
                / greatest(length(da.text), length(db.text))
            >= {dd.EDIT_RATIO_THRESHOLD}
    ORDER BY doc_a, doc_b""",
    doc="Near-dup pairs by normalized edit distance "
    f"(similarity 1 - lev/max_len >= {dd.EDIT_RATIO_THRESHOLD}), "
    "LSH-blocked: the O(len^2) Levenshtein DP — the sharpest verifier, "
    "catching in-place edits set-Jaccard misses — runs ONLY on banded-"
    "MinHash candidate pairs (one sub-quadratic equi-join), never "
    "all-pairs. Completes the dedup family: exact, Jaccard, MinHash, "
    "SimHash, embedding-cosine, edit-distance — one blocked candidate "
    "generator, interchangeable verifiers. Both engines run native "
    "levenshtein; the normalization is integer ops + one correctly-"
    "rounded division, so parity is exact.",
    bench=True,
)
def dedup_edit_distance(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dd.edit_distance_pairs(fan_out(docs)).orderBy("doc_a", "doc_b")


@query(
    "events_resample_gapfill",
    """WITH e AS (SELECT user_id, epoch_ms(ts) // 3600000 AS h,
                         CAST(floor(value * 100 + 0.5) AS BIGINT) AS e2
                  FROM events WHERE user_id < 10),
    b AS (SELECT user_id, h, CAST(SUM(e2) AS DOUBLE) / COUNT(e2) / 100 AS a
          FROM e GROUP BY user_id, h),
    span AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM b GROUP BY user_id),
    grid AS (SELECT user_id, UNNEST(generate_series(h0, h1)) AS h FROM span),
    j AS (SELECT g.user_id, g.h, b.a
          FROM grid g LEFT JOIN b USING (user_id, h)),
    w AS (SELECT user_id, h, a,
                 last_value(CASE WHEN a IS NOT NULL THEN h END IGNORE NULLS)
                   OVER win_p AS ph,
                 last_value(a IGNORE NULLS) OVER win_p AS pv,
                 first_value(CASE WHEN a IS NOT NULL THEN h END IGNORE NULLS)
                   OVER win_f AS nh,
                 first_value(a IGNORE NULLS) OVER win_f AS nv
          FROM j
          WINDOW win_p AS (PARTITION BY user_id ORDER BY h
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 win_f AS (PARTITION BY user_id ORDER BY h
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, h,
           floor((CASE WHEN a IS NOT NULL THEN a
                       ELSE pv + (nv - pv)
                            * (CAST(h - ph AS DOUBLE) / (nh - ph)) END)
                 * 1000 + 0.5) / 1000 AS value,
           a IS NULL AS is_gap
    FROM w ORDER BY user_id, h""",
    doc="Hypertable-style resample: irregular per-user event series -> "
    "regular hourly grid with per-bin means, gaps linearly "
    "interpolated from the surrounding observed bins "
    "(operators/temporal.resample_linear; the meteo observations the "
    "reference normalizes are exactly such a series, reference "
    "etl/transform.py). Plan: ONE composite-key shuffle for the bin "
    "means (exact fixed-point sums — order-independent parity), a "
    "generate for the grid, a co-partitioned left join, then a single "
    "window sort per group serving all four IGNORE-NULLS frame "
    "functions; interpolation is a pure projection. user_id < 10 "
    "keeps the demo grid ~7k rows; the operator is group-agnostic.",
    bench=True,
)
def events_resample_gapfill(spark, sf_dir):
    from meteo_etl_spark.operators.temporal import resample_linear

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    return resample_linear(ev, "user_id", "ts", "value").orderBy("user_id", "h")


@query(
    "events_profile",
    """SELECT 'event_id' AS "column", (SELECT COUNT(*) FROM events) AS n,
              COUNT(*) - COUNT(event_id) AS n_null,
              COUNT(DISTINCT event_id) AS n_distinct FROM events
       UNION ALL
       SELECT 'event_type', (SELECT COUNT(*) FROM events),
              COUNT(*) - COUNT(event_type), COUNT(DISTINCT event_type) FROM events
       UNION ALL
       SELECT 'props', (SELECT COUNT(*) FROM events),
              COUNT(*) - COUNT(props), COUNT(DISTINCT props) FROM events
       UNION ALL
       SELECT 'ts', (SELECT COUNT(*) FROM events),
              COUNT(*) - COUNT(ts), COUNT(DISTINCT ts) FROM events
       UNION ALL
       SELECT 'user_id', (SELECT COUNT(*) FROM events),
              COUNT(*) - COUNT(user_id), COUNT(DISTINCT user_id) FROM events
       UNION ALL
       SELECT 'value', (SELECT COUNT(*) FROM events),
              COUNT(*) - COUNT(value), COUNT(DISTINCT value) FROM events
       ORDER BY 1""",
    doc="Single-scan column census (operators/profile.profile): row "
    "count, null count, exact distinct cardinality for every column of "
    "events — the data-quality gate a lake pipeline runs on each "
    "delivery. Spark computes ALL columns in one agg (multi-distinct "
    "via Expand feeding one shuffle, then a driver-free explode "
    "unpivot); the oracle pays one scan per column instead — "
    "independent plan, same numbers. At 100 TB the exact=False twin "
    "replaces Expand with per-column HLL sketches (no row "
    "multiplication, KBs of state); the exact form is the "
    "oracle-checkable contract.",
)
def events_profile(spark, sf_dir):
    from meteo_etl_spark.operators.profile import profile

    ev = load_table(spark, sf_dir, "events")
    return profile(ev)


@query(
    "docs_unigram_freq",
    """WITH t AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                  FROM documents),
    t2 AS (SELECT doc_id, tok FROM t WHERE length(tok) > 0),
    vocab AS (SELECT tok, COUNT(*) AS cnt FROM t2 GROUP BY tok)
    SELECT t2.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(v.cnt) AS BIGINT) AS sum_freq,
           floor(CAST(SUM(v.cnt) AS DOUBLE) / COUNT(*) * 1000000 + 0.5)
             / 1000000 AS mean_tok_freq
    FROM t2 JOIN vocab v USING (tok)
    GROUP BY t2.doc_id ORDER BY t2.doc_id""",
    doc="Unigram-LM quality proxy (the CCNet-style filter signal): "
    "score each document by the mean corpus frequency of its tokens — "
    "documents dominated by rare/garbage tokens score low, "
    "natural-language documents high. Log-free on purpose: the "
    "monotone equivalent of mean log-probability is computed in exact "
    "integer space (SUM of corpus counts / token count) with one IEEE "
    "division at the end, so Spark and the oracle agree bit-for-bit "
    "where ln() would not (same determinism discipline as "
    "docs_tfidf_topk). Plan: tokenize is a narrow generate; the vocab "
    "agg combines map-side; the tok-keyed join is "
    "vocabulary-vs-tokens (AQE broadcasts the vocab side at small "
    "scale; bucket both legs by tok at 100 TB); the per-doc agg is "
    "one shuffle on doc_id. Composes with text_quality (surface "
    "ratios) as the frequency-based second axis of corpus filtering.",
)
def docs_unigram_freq(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        fan_out(docs)
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.length("tok") > 0)
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        toks.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("cnt").alias("sum_freq"),
            (
                F.floor(
                    F.sum("cnt").cast("double") / F.count(F.lit(1)) * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("mean_tok_freq"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Round 7: data-selection scoring + weighted sampling + grouping sets
# ---------------------------------------------------------------------------

#: DSIR target slice: two sources stand in for the target domain
#: (e.g. wiki+books in the paper's recipe).
DSIR_TARGET_SOURCES = ("src0", "src1")


def _duck_dsir_sql() -> str:
    from meteo_etl_spark.functions import importance as imp

    b = imp.DSIR_BUCKETS
    tgt = ", ".join(f"'{s}'" for s in DSIR_TARGET_SOURCES)
    return f"""WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS t
      FROM documents),
    feats AS (SELECT doc_id, source IN ({tgt}) AS tgt,
             ('0x' || substr(md5(u.f), 1, 8))::BIGINT % {b} AS bucket
      FROM tk, UNNEST(t || [t[i] || '_' || t[i+1]
                       FOR i IN generate_series(1, len(t) - 1)]) AS u(f)),
    bc AS (SELECT bucket,
             SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS t,
             SUM(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS s
      FROM feats GROUP BY bucket),
    tot AS (SELECT SUM(t) AS tt, SUM(s) AS ss FROM bc),
    w AS (SELECT bucket,
            CAST(FLOOR((CAST(t + 1 AS DOUBLE) / CAST(s + 1 AS DOUBLE))
                 * (CAST(ss + {b} AS DOUBLE) / CAST(tt + {b} AS DOUBLE))
                 * {float(imp.RATIO_SCALE)}) AS BIGINT) AS w
      FROM bc CROSS JOIN tot),
    pd AS (SELECT doc_id, bucket, COUNT(*) AS c
      FROM feats WHERE NOT tgt GROUP BY doc_id, bucket)
    SELECT pd.doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
           CAST(SUM(c * w.w) AS BIGINT) AS score
    FROM pd JOIN w USING (bucket)
    GROUP BY pd.doc_id ORDER BY doc_id"""


@query(
    "docs_dsir_weights",
    _duck_dsir_sql(),
    doc="DSIR-style data-selection scoring (arXiv:2302.03169): every "
    "non-target document scored by hashed-n-gram importance against "
    "the target slice (sources src0/src1) — the scorer behind "
    "importance-resampled pretraining mixtures. Features are word "
    "unigrams+bigrams md5-hashed into 1024 buckets; bucket weights "
    "are the add-one-smoothed target/source probability ratio "
    "quantized by single correctly-rounded IEEE ops (the log-ratio "
    "production form is the same plan with F.log in one expression); "
    "doc score is an exact int64 sum. Plan: one corpus explode, one "
    "bucket-keyed agg (<= 1024 rows, broadcast by construction), one "
    "1-row totals cross, one doc-keyed partial agg — no UDFs, no "
    "data-sized driver state, scales as two shuffles of (doc, bucket) "
    "pairs.",
)
def docs_dsir_weights(spark, sf_dir):
    from meteo_etl_spark.functions.importance import dsir_scores

    docs = load_table(spark, sf_dir, "documents")
    return dsir_scores(
        docs, F.col("source").isin(*DSIR_TARGET_SOURCES)
    ).orderBy("doc_id")


PRIORITY_SAMPLE_K = 50


@query(
    "docs_priority_sample",
    f"""WITH pr AS (SELECT doc_id, n_chars,
           CAST(n_chars AS DOUBLE)
             / ((CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                      AS DOUBLE) + 1.0) / 4294967296.0) AS priority
      FROM documents)
    SELECT doc_id, n_chars, ROUND(priority, 4) AS priority
    FROM pr ORDER BY priority DESC, doc_id LIMIT {PRIORITY_SAMPLE_K}""",
    doc="Deterministic weighted sampling via PRIORITY SAMPLING "
    "(Duffield-Lund-Thorup, JACM 2007): u ~ md5(doc_id) mapped to "
    "(0,1], priority = weight/u, top-k wins — inclusion probability "
    "min(1, w/tau), the minimal-variance threshold scheme. Both the "
    "uniform and the priority are single correctly-rounded IEEE "
    "divisions (no rand/pow/log), so the SAMPLE ITSELF is "
    "bit-identical across engines — reproducible weighted selection "
    "under repartitioning, the property corpus re-draws need. Plan: "
    "pure map + TakeOrderedAndProject (per-partition heaps, no "
    "global sort).",
)
def docs_priority_sample(spark, sf_dir):
    from meteo_etl_spark.functions.sampling import priority_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return priority_sample(docs, "doc_id", "n_chars", PRIORITY_SAMPLE_K).select(
        "doc_id", "n_chars", F.round("priority", 4).alias("priority")
    )


@query(
    "events_grouping_sets",
    """SELECT GROUPING(event_type, d) AS gid, event_type, d,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS total
    FROM (SELECT event_type, date_trunc('day', ts) AS d, value FROM events) e
    GROUP BY CUBE(event_type, d)
    ORDER BY gid, event_type, d""",
    doc="CUBE / GROUPING SETS census: per (type, day), per type, per "
    "day, and grand-total aggregates in ONE pass, disambiguated by "
    "the standard grouping-id bitmask — the multi-rollup shape BI "
    "layers push down. Spark plans a single Expand (each input row "
    "fans into its 4 grouping sets) above one shuffle — no "
    "re-aggregation of the base table per set; the oracle is DuckDB's "
    "native CUBE, so both engines' bitmask semantics are pinned "
    "against each other.",
)
def events_grouping_sets(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("d"), "value"
    )
    return (
        ev.cube("event_type", "d")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("total"),
        )
        .select("gid", "event_type", "d", "n", "total")
        .orderBy("gid", "event_type", "d")
    )


@query(
    "docs_datasheet",
    """WITH base AS (SELECT source, lang, n_chars, doc_id,
           len(string_split(text, ' ')) AS n_toks FROM documents),
    med AS (SELECT source, n_chars AS median_chars FROM (
        SELECT source, n_chars, doc_id,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM base) WHERE rn = (n + 1) // 2)
    SELECT b.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           MIN(m.median_chars) AS median_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM base b JOIN med m USING (source)
    GROUP BY b.source ORDER BY b.source""",
    doc="Corpus datasheet (Datasheets for Datasets, Gebru et al.): "
    "per-source doc/token totals, language breadth, and EXACT "
    "char-length min/median/max — the release-documentation table "
    "every training-data drop ships with. Median is nearest-rank "
    "(lower) over a deterministic (n_chars, doc_id) order — the "
    "events_value_percentiles integer idiom, not an approx sketch — "
    "so both engines agree bit-for-bit. Plan: ONE source-keyed "
    "shuffle shared by the ranking window, the count window and the "
    "final aggregate; token counts are a codegen'd split-size map. "
    "At 100 TB this is a single pass + one 20-row join.",
)
def docs_datasheet(spark, sf_dir):
    from pyspark.sql import Window

    base = load_table(spark, sf_dir, "documents").select(
        "source",
        "lang",
        "n_chars",
        "doc_id",
        F.size(F.split("text", " ")).alias("n_toks"),
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    cnt = Window.partitionBy("source")
    med = (
        base.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(cnt))
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("source", F.col("n_chars").alias("median_chars"))
    )
    return (
        base.join(med, "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("n_chars").alias("min_chars"),
            F.min("median_chars").alias("median_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round 7 late additions: epoch shuffle, canonical keep-policy, ANN recall
# ---------------------------------------------------------------------------


@query(
    "docs_epoch_shuffle",
    """WITH h AS (SELECT doc_id,
                         md5('1:' || CAST(doc_id AS VARCHAR)) AS hh
                  FROM documents),
       s AS (SELECT doc_id, hh,
                    ('0x' || substr(hh, 1, 8))::BIGINT % 8 AS shard
             FROM h)
       SELECT doc_id, shard,
              row_number() OVER (PARTITION BY shard
                                 ORDER BY hh, doc_id) AS pos
       FROM s ORDER BY shard, pos""",
    doc="Deterministic per-epoch training shuffle "
    "(functions/sampling.epoch_shuffle, epoch=1, 8 shards): every doc "
    "gets a (shard, pos) address that is a reproducible pseudorandom "
    "permutation, re-drawn per epoch from md5(epoch:doc_id). The "
    "shard-major order is what a sharded loader consumes; there is NO "
    "global sort — one hash shuffle into shards plus a per-shard "
    "window sort, so reducer memory is corpus/shards, and at 100 TB "
    "the writer streams each shard out with sortWithinPartitions. "
    "Same-epoch replays are bit-identical on any cluster size; no "
    "rand() anywhere (partition-layout-independent by construction).",
)
def docs_epoch_shuffle(spark, sf_dir):
    from meteo_etl_spark.functions.sampling import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return (
        epoch_shuffle(docs, "doc_id", epoch=1, shards=8)
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )


@query(
    "dedup_canonical",
    f"""WITH RECURSIVE {_DUCK_SHINGLES}, {_DUCK_MINHASH_CTES},
    pairs AS (SELECT doc_a, doc_b FROM common
              JOIN cnt p ON p.doc_id = doc_a
              JOIN cnt q ON q.doc_id = doc_b
              WHERE CAST(c AS DOUBLE) / CAST(p.n + q.n - c AS DOUBLE)
                      >= {dd.JACCARD_THRESHOLD}),
    e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
    walk(node, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.b, w.label FROM walk w JOIN e ON e.a = w.node),
    lab AS (SELECT node AS doc_id, MIN(label) AS component
            FROM walk GROUP BY node),
    ld AS (SELECT l.doc_id, l.component, length(d.text) AS len
           FROM lab l JOIN documents d USING (doc_id)),
    r AS (SELECT doc_id, component, len,
                 row_number() OVER (PARTITION BY component
                                    ORDER BY len DESC, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY component) AS n
          FROM ld)
    SELECT component, doc_id AS keep_doc_id, len AS kept_len,
           CAST(n AS BIGINT) AS n_docs
    FROM r WHERE rn = 1 ORDER BY component""",
    doc="Canonical-document selection — the keep-policy pass that "
    "turns dedup_components' cluster labels into an actual curated "
    "corpus: per near-dup cluster keep the LONGEST document (ties to "
    "the lowest id), the standard 'best representative' rule (longest "
    "doc usually carries the least-truncated text). Distinct from "
    "dedup_components' min-id canonical flag: selection here is "
    "content-aware, which is what curation actually ships. Plan: the "
    "CC closure's node-keyed rounds as before, then ONE "
    "component-keyed shuffle serves both the ranking window and the "
    "cluster-size count. Oracle: independent recursive-CTE fixpoint "
    "plus the same window rule.",
)
def dedup_canonical(spark, sf_dir):
    from pyspark.sql import Window

    from meteo_etl_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs)
    cc = connected_components(
        docs.select("doc_id"),
        pairs,
        node_col="doc_id",
        src_col="doc_a",
        dst_col="doc_b",
    )
    ld = cc.select(F.col("node").alias("doc_id"), "component").join(
        docs.select("doc_id", F.length("text").alias("len")), "doc_id"
    )
    w = Window.partitionBy("component").orderBy(F.desc("len"), F.asc("doc_id"))
    cnt = Window.partitionBy("component")
    return (
        ld.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(cnt))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("keep_doc_id"),
            F.col("len").alias("kept_len"),
            F.col("n").cast("long").alias("n_docs"),
        )
        .orderBy("component")
    )


@query(
    "sim_ann_recall",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id, v, {_duck_bucket('v', 0)} AS b0,
                 {_duck_bucket('v', 1)} AS b1 FROM v),
    q AS (SELECT vec_id AS qid, v AS qv, b0 AS qb0, b1 AS qb1
          FROM c WHERE vec_id < 10),
    s AS (SELECT q.qid, c.vec_id,
                 {_duck_dot('c.v', 'q.qv')}
                   / (sqrt({_duck_dot('c.v', 'c.v')})
                      * sqrt({_duck_dot('q.qv', 'q.qv')})) AS sim_raw,
                 (c.b0 = q.qb0 OR c.b1 = q.qb1) AS cand
          FROM c, q WHERE c.vec_id <> q.qid),
    truth AS (SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY sim_raw DESC, vec_id) AS rn
        FROM s) WHERE rn <= 5),
    approx AS (SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY sim_raw DESC, vec_id) AS rn
        FROM s WHERE cand) WHERE rn <= 5)
    SELECT t.qid AS query_id, COUNT(*) AS k, COUNT(a.vec_id) AS n_hit,
           ROUND(CAST(COUNT(a.vec_id) AS DOUBLE) / COUNT(*), 4) AS recall
    FROM truth t LEFT JOIN approx a ON a.qid = t.qid AND a.vec_id = t.vec_id
    GROUP BY t.qid ORDER BY query_id""",
    doc="ANN recall@5 audit (functions/similarity.ann_recall, 10 query "
    "vectors): the exact brute-force top-5 and the LSH "
    "candidate-restricted top-5 are ranked from ONE scored frame "
    "(cosine computed once per pair), then recall = |intersection|/5 "
    "per query. This is the evaluation harness a deployment runs "
    "BEFORE trusting bucket routing at 100 TB — the measured recall "
    "is the contract the sim_ann_lsh serving path is held to. One "
    "shuffle on the query id serves both rankings and the final "
    "aggregate; the query panel broadcasts.",
)
def sim_ann_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ann_recall(emb, n_queries=10, k=5)


# Recall-tuned LSH shape (round 8): constants shared with
# similarity.LSH_TUNED_* so the oracle regenerates if the config moves.
_TUNED_L = sim.LSH_TUNED_TABLES
_TUNED_P = sim.LSH_TUNED_PLANES
_TUNED_H = sim.LSH_TUNED_HAMMING
_TUNED_BUCKETS = ",\n                 ".join(
    f"{_duck_bucket('v', t, _TUNED_P)} AS b{t}" for t in range(_TUNED_L)
)
_TUNED_QB = ", ".join(f"b{t} AS qb{t}" for t in range(_TUNED_L))
_TUNED_CAND = " OR ".join(
    f"(({_duck_hamming(f'c.b{t}', f'q.qb{t}', _TUNED_P)}) <= {_TUNED_H})"
    for t in range(_TUNED_L)
)


@query(
    "sim_ann_recall_tuned",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id, v, {_TUNED_BUCKETS} FROM v),
    q AS (SELECT vec_id AS qid, v AS qv, {_TUNED_QB}
          FROM c WHERE vec_id < 10),
    s AS (SELECT q.qid, c.vec_id,
                 {_duck_dot('c.v', 'q.qv')}
                   / (sqrt({_duck_dot('c.v', 'c.v')})
                      * sqrt({_duck_dot('q.qv', 'q.qv')})) AS sim_raw,
                 ({_TUNED_CAND}) AS cand
          FROM c, q WHERE c.vec_id <> q.qid),
    truth AS (SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY sim_raw DESC, vec_id) AS rn
        FROM s) WHERE rn <= 5),
    approx AS (SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY sim_raw DESC, vec_id) AS rn
        FROM s WHERE cand) WHERE rn <= 5)
    SELECT t.qid AS query_id, COUNT(*) AS k, COUNT(a.vec_id) AS n_hit,
           ROUND(CAST(COUNT(a.vec_id) AS DOUBLE) / COUNT(*), 4) AS recall
    FROM truth t LEFT JOIN approx a ON a.qid = t.qid AND a.vec_id = t.vec_id
    GROUP BY t.qid ORDER BY query_id""",
    bench=True,
    doc=f"Recall-TUNED ANN audit ({_TUNED_L} tables x {_TUNED_P} "
    f"planes, Hamming<={_TUNED_H} multi-probe — similarity.LSH_TUNED_*"
    "): same one-scored-frame harness as sim_ann_recall, but over the "
    "configuration an exhaustive (L, P, h) sweep against exact top-5 "
    "picked to lift measured recall@5 from 0.76 (r7's 2x4 h=1 route) "
    "to 0.94 on the sf0.1 corpus (grid + wall costs in "
    "bench_evidence/R8_NEWOPS.md). The sweep also quantifies the "
    "honest price: this corpus's neighbors sit at ~68deg, so >=0.9 "
    "recall means ~60% candidate fraction here — intrinsic to ORing 8 "
    "shallow tables AND to the corpus (no config does better for "
    "less). Structured corpora get selectivity via DEEP buckets "
    "instead (LSH_DEEP_*: recall 0.998 at 6% candidates on the "
    "clustered-fixture pytest) — which is exactly why the audit must "
    "run per-corpus before the route is trusted at 100 TB.",
)
def sim_ann_recall_tuned(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ann_recall(
        emb,
        n_queries=10,
        k=5,
        max_hamming=_TUNED_H,
        n_tables=_TUNED_L,
        n_planes=_TUNED_P,
    )


@query(
    "sim_ann_serve_lsh",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id, v, {_TUNED_BUCKETS} FROM v),
    q AS (SELECT v AS qv, {_TUNED_QB} FROM c WHERE vec_id = 0),
    s AS (SELECT c.vec_id,
                 {_duck_dot('c.v', 'qv')}
                   / (sqrt({_duck_dot('c.v', 'c.v')})
                      * sqrt({_duck_dot('qv', 'qv')})) AS sim_raw
          FROM c, q WHERE c.vec_id <> 0 AND ({_TUNED_CAND}))
    SELECT vec_id, ROUND(sim_raw, 6) AS sim FROM s
    ORDER BY sim_raw DESC, vec_id LIMIT 5""",
    doc="PERSISTED-index LSH serving certification (r11 verdict order "
    "#2 — the lsh twin of sim_ann_serve_ivf, giving both serving "
    "routes the same certification class): build_ann_index("
    f"'lsh_tuned') lands the corpus as a {_TUNED_L}-table x "
    f"{_TUNED_P}-plane bucket-partitioned inverted file in scratch "
    "(shape recorded in the _ann_meta.json sidecar), query_ann_index "
    "computes the query's buckets and their Hamming<=1 probe lists "
    "DRIVER-side and serves top-5 from a scan of ONLY the probed "
    "(table, bucket) partitions — the query RAISES unless the "
    "executed plan carries non-empty PartitionFilters, so the pruning "
    "itself is inside the certified contract. The route is pinned to "
    "lsh_tuned because choose_ann_route on this near-random corpus "
    "correctly falls back to ivf (that decision is hash-certified by "
    "sim_route_choice; the clustered-corpus choose->lsh_deep arc is "
    "the pytest e2e) — this query certifies the persisted LSH serving "
    "path itself. The oracle replays the full route in SQL (same "
    "md5-seeded hyperplanes, bucket bits, Hamming probe gate and "
    "exact-cosine re-rank): a hash match proves persisted serving == "
    "in-memory routing. Side-effecting (scratch index, removed "
    "in-query). Reference extension-surface analogue: the dashboard "
    "read path (dashboard/streamlit_app.py:14-25).",
)
def sim_ann_serve_lsh(spark, sf_dir):
    import re
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    scratch = tempfile.mkdtemp(prefix="annservelsh_")
    try:
        sim.build_ann_index("lsh_tuned", emb, f"{scratch}/idx")
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        ]
        got = sim.query_ann_index(
            "lsh_tuned", spark, f"{scratch}/idx", qv, k=5, exclude_id=0
        )
        plan = got._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        if not (m and m.group(1).strip()):
            raise RuntimeError(
                "persisted LSH serve is not partition-pruned:\n" + plan
            )
        return got.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "sim_ann_serve_deleted",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id, v, {_TUNED_BUCKETS} FROM v),
    q AS (SELECT v AS qv, {_TUNED_QB} FROM c WHERE vec_id = 0),
    s AS (SELECT c.vec_id,
                 {_duck_dot('c.v', 'qv')}
                   / (sqrt({_duck_dot('c.v', 'c.v')})
                      * sqrt({_duck_dot('qv', 'qv')})) AS sim_raw
          FROM c, q WHERE c.vec_id <> 0 AND ({_TUNED_CAND})),
    r AS (SELECT vec_id, sim_raw,
                 ROW_NUMBER() OVER (ORDER BY sim_raw DESC, vec_id) AS rn
          FROM s)
    SELECT vec_id, ROUND(sim_raw, 6) AS sim FROM r WHERE rn > 2
    ORDER BY sim_raw DESC, vec_id LIMIT 5""",
    doc="Tombstone-delete serving certification: after "
    "delete_from_ann_index removes the persisted tuned-LSH index's "
    "served top-2 vectors, query_ann_index must serve EXACTLY the "
    "route's ranks 3-7 — the oracle replays the identical routing in "
    "SQL and skips the first two ranks, so a hash match proves the "
    "anti-join suppression path returns 'as if those vectors never "
    "existed' (no rank distortion, no candidate leakage) while the "
    "partition-pruned scan contract still holds (RAISES without "
    "PartitionFilters — tombstones must not break pruning). The "
    "takedown path a serving store needs at 100 TB: O(deletes) I/O, "
    "no index rewrite; physical removal deferred to "
    "compact_ann_index (pytest-pinned incl. the redelivery-"
    "resurrection case). Side-effecting (scratch index).",
)
def sim_ann_serve_deleted(spark, sf_dir):
    import re
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    scratch = tempfile.mkdtemp(prefix="annservedel_")
    try:
        sim.build_ann_index("lsh_tuned", emb, f"{scratch}/idx")
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        ]
        top2 = [
            r["vec_id"]
            for r in sim.query_ann_index(
                "lsh_tuned", spark, f"{scratch}/idx", qv, k=2, exclude_id=0
            ).collect()
        ]
        sim.delete_from_ann_index(spark, f"{scratch}/idx", top2)
        got = sim.query_ann_index(
            "lsh_tuned", spark, f"{scratch}/idx", qv, k=5, exclude_id=0
        )
        plan = got._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        if not (m and m.group(1).strip()):
            raise RuntimeError(
                "tombstoned LSH serve is not partition-pruned:\n" + plan
            )
        return got.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# Serving-route decision table (round 10): all three ANN routes
# audited from ONE scored frame, adjudicated by the integer
# thresholds in similarity.ANN_ROUTE_*. Constants shared with
# functions/similarity so the oracle regenerates if any route
# configuration or threshold moves.
_DEEP_L = sim.LSH_DEEP_TABLES
_DEEP_P = sim.LSH_DEEP_PLANES
_DEEP_H = sim.LSH_DEEP_HAMMING
_RC_K = 5
_RC_NQ = 10
_RC_TOTAL = _RC_K * _RC_NQ
_RC_BUCKETS = ",\n                 ".join(
    [f"{_duck_bucket('v', t, _TUNED_P)} AS bt{t}" for t in range(_TUNED_L)]
    + [f"{_duck_bucket('v', t, _DEEP_P)} AS bd{t}" for t in range(_DEEP_L)]
)
_RC_QB = ", ".join(
    [f"bt{t} AS qbt{t}" for t in range(_TUNED_L)]
    + [f"bd{t} AS qbd{t}" for t in range(_DEEP_L)]
)
_RC_CAND_TUNED = " OR ".join(
    f"(({_duck_hamming(f'c2.bt{t}', f'q.qbt{t}', _TUNED_P)}) <= {_TUNED_H})"
    for t in range(_TUNED_L)
)
_RC_CAND_DEEP = " OR ".join(
    f"(({_duck_hamming(f'c2.bd{t}', f'q.qbd{t}', _DEEP_P)}) <= {_DEEP_H})"
    for t in range(_DEEP_L)
)
_RC_MASKED = (
    f"list_transform(range(1, {sim.IVF_LISTS + 1}), "
    "i -> CASE WHEN i = lst THEN -1e18 ELSE d[i] END)"
)
# COALESCE mirrors the Spark side's honest-zeros contract: over an
# empty scored frame (empty/1-row corpus) SUM is NULL in SQL while
# ann_route_audit reports integer 0 — both engines must emit 0.
_RC_ROUTE_AGGS = ",\n               ".join(
    f"COALESCE(SUM(CASE WHEN cand_{r} THEN 1 ELSE 0 END), 0) AS cand_{r}_n,\n"
    f"               COALESCE(SUM(CASE WHEN rn_all <= {_RC_K} AND cand_{r} "
    f"AND crn_{r} <= {_RC_K} THEN 1 ELSE 0 END), 0) AS hit_{r}"
    for r in sim.ANN_ROUTES
)


@query(
    "sim_route_choice",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id, v, {_RC_BUCKETS},
                 {_duck_ivf_dots('v')} AS d FROM v),
    c2 AS (SELECT *, list_position(d, list_max(d)) AS lst FROM c),
    q AS (SELECT vec_id AS qid, v AS qv, {_RC_QB}, lst AS p1,
                 list_position({_RC_MASKED}, list_max({_RC_MASKED})) AS p2
          FROM c2 ORDER BY vec_id LIMIT {_RC_NQ}),
    s AS (SELECT q.qid, c2.vec_id,
                 {_duck_dot('c2.v', 'q.qv')}
                   / (sqrt({_duck_dot('c2.v', 'c2.v')})
                      * sqrt({_duck_dot('q.qv', 'q.qv')})) AS sim_raw,
                 (c2.lst = q.p1 OR c2.lst = q.p2) AS cand_ivf,
                 ({_RC_CAND_DEEP}) AS cand_lsh_deep,
                 ({_RC_CAND_TUNED}) AS cand_lsh_tuned
          FROM c2, q WHERE c2.vec_id <> q.qid),
    r AS (SELECT *,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY sim_raw DESC, vec_id) AS rn_all,
                 {', '.join(
                     f"SUM(CASE WHEN cand_{rt} THEN 1 ELSE 0 END) OVER ("
                     "PARTITION BY qid ORDER BY sim_raw DESC, vec_id "
                     f"ROWS UNBOUNDED PRECEDING) AS crn_{rt}"
                     for rt in sim.ANN_ROUTES
                 )}
          FROM s),
    agg AS (SELECT COUNT(*) AS pairs,
               {_RC_ROUTE_AGGS}
            FROM r),
    routes AS (
        SELECT 'ivf' AS route, hit_ivf AS n_hit, cand_ivf_n AS cand,
               pairs FROM agg
        UNION ALL
        SELECT 'lsh_deep', hit_lsh_deep, cand_lsh_deep_n, pairs FROM agg
        UNION ALL
        SELECT 'lsh_tuned', hit_lsh_tuned, cand_lsh_tuned_n, pairs FROM agg),
    qual AS (SELECT route, n_hit, cand, pairs,
                    (pairs > 0
                     AND n_hit * 100 >= {sim.ANN_ROUTE_RECALL_MIN_PCT} * {_RC_TOTAL}
                     AND cand * 100 <= {sim.ANN_ROUTE_FRAC_MAX_PCT} * pairs)
                      AS qualifies
             FROM routes)
    SELECT route,
           CAST(n_hit AS BIGINT) AS n_hit,
           CAST(cand AS BIGINT) AS cand,
           CAST(pairs AS BIGINT) AS pairs,
           ROUND(n_hit / {_RC_TOTAL}.0, 4) AS recall,
           CASE WHEN pairs > 0 THEN ROUND(cand * 1.0 / pairs, 4)
                ELSE 0.0 END AS cand_frac,
           qualifies,
           CASE WHEN SUM(CASE WHEN qualifies THEN 1 ELSE 0 END) OVER () = 0
                THEN route = 'ivf'
                ELSE qualifies AND row_number() OVER (
                       ORDER BY CASE WHEN qualifies THEN 0 ELSE 1 END,
                                cand * 1.0 / pairs, n_hit DESC, route) = 1
           END AS chosen
    FROM qual ORDER BY route""",
    doc="ANN serving-route decision table "
    "(functions/similarity.ann_route_decision_table): every route — "
    f"ivf ({sim.IVF_LISTS} lists, nprobe {sim.IVF_NPROBE}), lsh_deep "
    f"({_DEEP_L}x{_DEEP_P} h<={_DEEP_H}), lsh_tuned ({_TUNED_L}x"
    f"{_TUNED_P} h<={_TUNED_H}) — audited from ONE corpus x "
    "broadcast-panel scored frame (cosine once per pair, all three "
    "candidate predicates as columns, all counters folded into a "
    "single aggregate row = one action). A route qualifies iff "
    f"recall >= {sim.ANN_ROUTE_RECALL_MIN_PCT}% of exact top-{_RC_K} "
    f"AND candidate fraction <= {sim.ANN_ROUTE_FRAC_MAX_PCT}% "
    "(integer cross-multiplied — no float threshold equality); most "
    "selective qualifier wins, and when nothing qualifies the "
    "bounded-probe ivf fallback serves. On THIS near-random corpus "
    "no route qualifies (>=0.9 recall costs ~60% candidates under "
    "any sign-LSH shape — R8_NEWOPS.md grid), so the table certifies "
    "the fallback fires; the clustered-fixture pytest pins the "
    "opposite outcome (lsh_deep qualifies and wins). The decision an "
    "operator must see BEFORE trusting a route at 100 TB.",
)
def sim_route_choice(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ann_route_decision_table(emb, n_queries=_RC_NQ, k=_RC_K)


@query(
    "docs_contamination_report",
    f"""WITH {_DUCK_SHINGLES},
    ev AS (SELECT DISTINCT tok FROM ex WHERE doc_id % {DECON_EVAL_MOD} = 0),
    tr AS (SELECT doc_id, tok FROM ex WHERE doc_id % {DECON_EVAL_MOD} <> 0),
    hits AS (SELECT doc_id, COUNT(*) AS n
             FROM tr JOIN ev USING (tok) GROUP BY doc_id)
    SELECT d.source,
           COUNT(*) AS n_train,
           CAST(SUM(CASE WHEN COALESCE(h.n, 0) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           ROUND(CAST(SUM(CASE WHEN COALESCE(h.n, 0) > 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 4) AS rate
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % {DECON_EVAL_MOD} <> 0
    GROUP BY d.source ORDER BY d.source""",
    doc="Contamination rate report: the per-source release-gate table "
    "on top of docs_decontaminate — how many training docs per source "
    "share any k-shingle with the eval corpus, and the flagged "
    "fraction. This is the number a data release publishes (and gates "
    "on) next to its datasheet. Plan: the same broadcast eval-key "
    "semi-join (no corpus shuffle), one doc-keyed partial-agg count, "
    "then a co-keyed join back to the source column and a tiny "
    "per-source aggregate.",
)
def docs_contamination_report(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % DECON_EVAL_MOD == 0
    train = docs.filter(~is_eval)
    res = dd.decontaminate(train, docs.filter(is_eval))
    flagged = F.when(F.col("n_overlap") > 0, 1).otherwise(0)
    return (
        train.select("doc_id", "source")
        .join(res.select(F.col("id").alias("doc_id"), "n_overlap"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(flagged).cast("long").alias("n_flagged"),
            F.round(
                F.sum(flagged).cast("double") / F.count(F.lit(1)), 4
            ).alias("rate"),
        )
        .orderBy("source")
    )


@query(
    "dedup_lsh_recall",
    f"""WITH {_DUCK_SHINGLES}, {_DUCK_MINHASH_CTES},
    lsh AS (SELECT doc_a, doc_b FROM common
            JOIN cnt p ON p.doc_id = doc_a JOIN cnt q ON q.doc_id = doc_b
            WHERE CAST(c AS DOUBLE) / CAST(p.n + q.n - c AS DOUBLE)
                    >= {dd.JACCARD_THRESHOLD}),
    exact_common AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                            COUNT(*) AS c
                     FROM ex x JOIN ex y
                       ON x.tok = y.tok AND x.doc_id < y.doc_id
                     GROUP BY 1, 2),
    exact AS (SELECT doc_a, doc_b FROM exact_common
              JOIN cnt p ON p.doc_id = doc_a
              JOIN cnt q ON q.doc_id = doc_b
              WHERE CAST(c AS DOUBLE) / CAST(p.n + q.n - c AS DOUBLE)
                      >= {dd.JACCARD_THRESHOLD})
    SELECT COUNT(*) AS n_true, COUNT(l.doc_a) AS n_caught,
           ROUND(CAST(COUNT(l.doc_a) AS DOUBLE) / COUNT(*), 4) AS recall
    FROM exact e LEFT JOIN lsh l
      ON l.doc_a = e.doc_a AND l.doc_b = e.doc_b""",
    doc="MinHash-LSH recall audit (twin of sim_ann_recall for the "
    "dedup stack): the banded sketch's verified pair set against the "
    "exhaustive inverted-index ground truth at the same Jaccard "
    "threshold. The b=4/r=2 S-curve predicts ~98% catch probability "
    "at 0.8 — this query turns that prediction into a MEASURED "
    "per-corpus number, the release gate for trusting the "
    "sub-quadratic path at 100 TB (where the exhaustive baseline runs "
    "on a sampled slice only). Both pair pipelines share one shingle "
    "pass; the compare is a tiny pair-keyed left join.",
)
def dedup_lsh_recall(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = dd.ngram_jaccard_pairs(docs).select("doc_a", "doc_b")
    lsh = dd.minhash_lsh_pairs(docs).select(
        "doc_a", "doc_b", F.lit(1).alias("hit")
    )
    return exact.join(lsh, ["doc_a", "doc_b"], "left").agg(
        F.count(F.lit(1)).alias("n_true"),
        F.count("hit").alias("n_caught"),
        F.round(
            F.count("hit").cast("double") / F.count(F.lit(1)), 4
        ).alias("recall"),
    )


@query(
    "docs_packing_stats",
    f"""WITH f AS (SELECT doc_id, lang,
                   len(string_split(text, ' ')) AS n_tokens,
                   CAST(COALESCE(SUM(len(string_split(text, ' ')))
                            OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING),
                            0) AS BIGINT) AS off
            FROM documents)
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           (CAST(SUM(n_tokens) AS BIGINT) - 1) // {pk.PACK_BUDGET} + 1 AS n_packs,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE)
                 / (((CAST(SUM(n_tokens) AS BIGINT) - 1) // {pk.PACK_BUDGET} + 1)
                    * {pk.PACK_BUDGET}), 4) AS fill_rate,
           CAST(SUM(CASE WHEN off // {pk.PACK_BUDGET}
                          <> (off + n_tokens - 1) // {pk.PACK_BUDGET}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs
    FROM f GROUP BY lang ORDER BY lang""",
    doc="Packing-efficiency report over pack_sequences' contiguous "
    "layout: per language shard, the pack count, the fill rate (only "
    "the final pack is partial, so waste is bounded by one budget per "
    "shard) and — the number that matters for training quality — how "
    "many documents STRADDLE a pack boundary and thus get split "
    "attention. The knob this report drives: larger PACK_BUDGET "
    "lowers boundary crossings but raises tail waste. Plan: the same "
    "single per-shard window prefix-sum as docs_pack_sequences, then "
    "one tiny per-lang aggregate.",
)
def docs_packing_stats(spark, sf_dir):
    from meteo_etl_spark.functions.packing import PACK_BUDGET, pack_sequences

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", tx.token_count(F.col("text")).alias("n_tokens")
    )
    f = pack_sequences(docs, "doc_id", "n_tokens", "lang")
    b = F.lit(PACK_BUDGET)
    n_packs = (F.sum("n_tokens").cast("long") - 1) / b
    straddles = F.when(
        (F.col("offset") / b).cast("long")
        != ((F.col("offset") + F.col("n_tokens") - 1) / b).cast("long"),
        1,
    ).otherwise(0)
    return (
        f.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            (F.floor(n_packs) + 1).cast("long").alias("n_packs"),
            F.round(
                F.sum("n_tokens").cast("double")
                / ((F.floor(n_packs) + 1) * b).cast("double"),
                4,
            ).alias("fill_rate"),
            F.sum(straddles).cast("long").alias("n_boundary_docs"),
        )
        .orderBy("lang")
    )


@query(
    "sim_ann_multiprobe",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id, v, {_duck_bucket('v', 0)} AS b0,
                 {_duck_bucket('v', 1)} AS b1 FROM v),
    q AS (SELECT v AS qv, b0 AS qb0, b1 AS qb1 FROM c WHERE vec_id = 0),
    s AS (SELECT vec_id,
                 {_duck_dot('v', 'qv')}
                   / (sqrt({_duck_dot('v', 'v')})
                      * sqrt({_duck_dot('qv', 'qv')})) AS sim_raw
          FROM c, q
          WHERE vec_id <> 0
            AND ({_duck_hamming('c.b0', 'q.qb0')} <= 1
                 OR {_duck_hamming('c.b1', 'q.qb1')} <= 1))
    SELECT vec_id, ROUND(sim_raw, 6) AS sim FROM s
    ORDER BY sim_raw DESC, vec_id LIMIT 5""",
    doc="Multi-probe LSH ANN (Lv et al., VLDB'07; "
    "similarity.ann_multiprobe_topk): candidates from every bucket "
    "within ONE sign flip of the query's bucket in either table, "
    "exact cosine re-rank of candidates only — the recall lever "
    "sim_ann_recall's audit motivates, costing P+1 probes per table "
    "instead of extra tables/index space. The Hamming test is P "
    "codegen'd substring compares; with the bucket-partitioned "
    "persisted index the probe set is still a handful of partitions "
    "at 100 TB.",
)
def sim_ann_multiprobe(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ann_multiprobe_topk(emb, query_id=0, k=5)


@query(
    "events_ewma",
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
                         CAST(floor(value * 100) AS BIGINT) AS qv
                  FROM events),
       w AS (SELECT event_id, user_id,
                    list(qv) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id
                                   ROWS BETWEEN 15 PRECEDING
                                            AND CURRENT ROW) AS arr
             FROM e)
       SELECT event_id, user_id,
              ((CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), arr),
                                 (acc, x) -> acc * 0.5
                                             + CAST(x AS DOUBLE) * 0.5)
                     * 65536 AS BIGINT) * 10000 + 32768) // 65536)
                / 1000000.0 AS ewma
       FROM w ORDER BY event_id""",
    doc="Exponentially-weighted moving average per user (alpha=1/2, "
    "16-row trailing frame) — the smoothing pass a telemetry/meteo "
    "series runs before thresholding (reference domain: hourly "
    "observation smoothing). alpha=1/2 on purpose: every fold step is "
    "acc/2 + x/2 over integer cents, so all intermediates are DYADIC "
    "rationals — exact in binary floating point, bit-identical across "
    "engines and fold directions-free (the same discipline as the "
    "fixed-point money sums; a generic alpha^j would straddle ulps). "
    "Plan: ONE user-keyed shuffle serves the frame collect + fold "
    "(codegen'd higher-order aggregate, no UDF); the bounded 16-row "
    "frame caps per-row state, so reducer memory is O(group), not "
    "O(history) — the property that keeps it runnable on unbounded "
    "event history at 100 TB.",
)
def events_ewma(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    us = epoch_us("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us.asc(), F.col("event_id").asc())
        .rowsBetween(-15, 0)
    )
    arr = F.collect_list(F.floor(F.col("value") * 100).cast("long")).over(w)
    fold = F.aggregate(
        arr,
        F.lit(0.0),
        lambda acc, x: acc * F.lit(0.5) + x.cast("double") * F.lit(0.5),
    )
    # Exact rounding: the fold is a dyadic rational (granularity 2^-16
    # cents), so fold*65536 is an exactly-represented integer; the
    # 6-dp half-up round is then pure integer arithmetic (the same
    # (2S+n) div 2n idiom as the money sums) and ONE final IEEE
    # division — bit-identical across engines, where ROUND(fold/100,6)
    # would straddle the half-way ulp.
    e = (fold * F.lit(65536.0)).cast("long")
    ewma6 = F.floor((e * F.lit(10000) + F.lit(32768)) / F.lit(65536.0)).cast(
        "long"
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            (ewma6 / F.lit(1000000.0)).alias("ewma"),
        )
        .orderBy("event_id")
    )


@query(
    "docs_chunk_dup_ratio",
    f"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    n AS (SELECT doc_id, w, len(w) AS n FROM t),
    c AS (SELECT doc_id, w,
                 CASE WHEN n <= {pk.CHUNK_TOKENS} THEN 1
                      ELSE CAST(ceil((n - {pk.CHUNK_TOKENS}) / {float(pk.CHUNK_STRIDE)}) AS BIGINT) + 1
                 END AS n_chunks
          FROM n),
    x AS (SELECT doc_id, w, UNNEST(range(0, n_chunks)) AS chunk_id FROM c),
    s AS (SELECT doc_id, chunk_id,
                 md5(array_to_string(
                     w[chunk_id * {pk.CHUNK_STRIDE} + 1 :
                       chunk_id * {pk.CHUNK_STRIDE} + {pk.CHUNK_TOKENS}], ' '))
                   AS h
          FROM x),
    nd AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM s GROUP BY h)
    SELECT s.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN nd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_chunks,
           ROUND(CAST(SUM(CASE WHEN nd.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 4) AS shared_ratio
    FROM s JOIN nd USING (h)
    GROUP BY s.doc_id ORDER BY s.doc_id""",
    doc="Cross-document repeated-chunk ratio (RefinedWeb-style "
    "line/passage-level dedup signal on fixed token windows): per "
    "document, the fraction of its content chunks whose exact hash "
    "also appears in at least one OTHER document — the boilerplate / "
    "template-share detector that set-level MinHash misses (a doc can "
    "be 30% boilerplate yet Jaccard-far from everything). Composes "
    "docs_chunk_windows' shuffle-free chunker with one hash-keyed "
    "distinct-doc count and one doc-keyed aggregate; at 100 TB the "
    "hash agg is the only corpus-wide exchange and combines map-side.",
)
def docs_chunk_dup_ratio(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    ch = pk.chunk_token_windows(fan_out(docs)).select("doc_id", "chunk_hash")
    nd = ch.groupBy("chunk_hash").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    shared = F.when(F.col("nd") >= 2, 1).otherwise(0)
    return (
        ch.join(nd, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(shared).cast("long").alias("n_shared_chunks"),
            F.round(
                F.sum(shared).cast("double") / F.count(F.lit(1)), 4
            ).alias("shared_ratio"),
        )
        .orderBy("doc_id")
    )


#: within-source distinct-doc floor for a chunk hash to count as
#: boilerplate (a header/footer template repeats across MANY docs of
#: one source; 2 is just a duplicate pair).
_BOILERPLATE_MIN_DOCS = 3


@query(
    "docs_boilerplate_chunks",
    f"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w
             FROM documents),
    n AS (SELECT doc_id, source, w, len(w) AS n FROM t),
    c AS (SELECT doc_id, source, w,
                 CASE WHEN n <= {pk.CHUNK_TOKENS} THEN 1
                      ELSE CAST(ceil((n - {pk.CHUNK_TOKENS}) / {float(pk.CHUNK_STRIDE)}) AS BIGINT) + 1
                 END AS n_chunks
          FROM n),
    x AS (SELECT doc_id, source, w, UNNEST(range(0, n_chunks)) AS chunk_id
          FROM c),
    s AS (SELECT doc_id, source,
                 md5(array_to_string(
                     w[chunk_id * {pk.CHUNK_STRIDE} + 1 :
                       chunk_id * {pk.CHUNK_STRIDE} + {pk.CHUNK_TOKENS}], ' '))
                   AS h
          FROM x),
    ht AS (SELECT source, h, COUNT(DISTINCT doc_id) AS nd,
                  COUNT(*) AS nocc
           FROM s GROUP BY source, h),
    j AS (SELECT s.doc_id, s.source, s.h,
                 ht.nd >= {_BOILERPLATE_MIN_DOCS} AS tmpl
          FROM s JOIN ht USING (source, h)),
    d AS (SELECT source, COUNT(DISTINCT doc_id) AS n_docs FROM t
          GROUP BY source)
    SELECT j.source,
           CAST(MAX(d.n_docs) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT CASE WHEN j.tmpl THEN j.h END) AS BIGINT)
             AS n_template_hashes,
           ROUND(CAST(SUM(CASE WHEN j.tmpl THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 4) AS template_occ_ratio,
           CAST(COUNT(DISTINCT CASE WHEN j.tmpl THEN j.doc_id END)
                AS BIGINT) AS docs_affected
    FROM j JOIN d USING (source)
    GROUP BY j.source ORDER BY j.source""",
    doc="Per-source boilerplate detector — the template/header/footer "
    "census that drives a boilerplate-stripping decision: a chunk "
    f"hash repeating in >= {_BOILERPLATE_MIN_DOCS} DISTINCT docs of "
    "the SAME source is a template candidate (docs_chunk_dup_ratio's "
    "corpus-wide signal can't tell one source's template from "
    "cross-source plagiarism — the partition key is the semantics "
    "here). Output per source: template-hash count, the fraction of "
    "all chunk occurrences that are template, and the blast radius "
    "(docs carrying >= 1 template chunk). Composes the shuffle-free "
    "chunker with one (source, hash) aggregate — at 100 TB the "
    "hash agg combines map-side and the source partition bounds "
    "every group.",
    bench=True,
)
def docs_boilerplate_chunks(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    src = docs.select("doc_id", "source")
    ch = (
        pk.chunk_token_windows(fan_out(docs))
        .select("doc_id", "chunk_hash")
        .join(src, "doc_id")
    )
    ht = ch.groupBy("source", "chunk_hash").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    tmpl = F.col("nd") >= _BOILERPLATE_MIN_DOCS
    nd_docs = src.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return (
        ch.join(ht, ["source", "chunk_hash"])
        .groupBy("source")
        .agg(
            F.countDistinct(F.when(tmpl, F.col("chunk_hash")))
            .cast("long")
            .alias("n_template_hashes"),
            F.round(
                F.sum(tmpl.cast("int")).cast("double") / F.count(F.lit(1)), 4
            ).alias("template_occ_ratio"),
            F.countDistinct(F.when(tmpl, F.col("doc_id")))
            .cast("long")
            .alias("docs_affected"),
        )
        .join(nd_docs, "source")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            "n_template_hashes",
            "template_occ_ratio",
            "docs_affected",
        )
        .orderBy("source")
    )


@query(
    "docs_per_source_sample",
    """WITH h AS (SELECT doc_id, source,
                         md5(CAST(doc_id AS VARCHAR)) AS hh
                  FROM documents),
       r AS (SELECT doc_id, source,
                    row_number() OVER (PARTITION BY source
                                       ORDER BY hh, doc_id) AS rn
             FROM h)
       SELECT source, doc_id, CAST(rn AS BIGINT) AS rn
       FROM r WHERE rn <= 20 ORDER BY source, rn""",
    doc="Deterministic exact-k per-group sample (k=20 per source): the "
    "fixed-size eval/inspection panel each domain contributes — where "
    "stratified_sample keeps a FRACTION, this keeps an exact count, "
    "chosen by md5 order so the panel is stable under corpus growth "
    "reordering (a doc's rank only changes if earlier-hash docs "
    "arrive). Plan: one source-keyed shuffle, rank window, rn<=k "
    "filter — WindowGroupLimit pushes the top-k into the sort at "
    "scale, so no group ever materializes fully.",
)
def docs_per_source_sample(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    hh = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(hh.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 20)
        .select("source", "doc_id", "rn")
        .orderBy("source", "rn")
    )


@query(
    "docs_adaptive_quality_gate",
    """WITH q AS (SELECT doc_id, source,
                    CAST(floor((0.4 * least((__h * 1.0 / __n) * 5, 1.0)
                        + 0.3 * least(__n / 100.0, 1.0)
                        + 0.3 * least(((length(text) - (__n - 1)) * 1.0 / __n) / 8.0, 1.0))
                        * 10000.0 + 0.5) AS BIGINT) AS s4
             FROM (SELECT doc_id, source, text,
                          {hits} AS __h,
                          len(string_split(text, ' ')) AS __n
                   FROM documents)),
       r AS (SELECT doc_id, source, s4,
                    row_number() OVER (PARTITION BY source
                                       ORDER BY s4, doc_id) AS rn,
                    COUNT(*) OVER (PARTITION BY source) AS n
             FROM q)
       SELECT doc_id, source, s4 / 10000.0 AS score,
              rn * 5 > n AS keep
       FROM r ORDER BY doc_id""".format(hits=_STOP_HITS["en"]),
    doc="Adaptive per-source quality gate: instead of one global "
    "threshold (text_quality's 0.5 — which can wipe out a domain "
    "whose scores run low, e.g. code vs prose), each source drops its "
    "own bottom 20% by exact quality rank. The per-domain calibration "
    "step real curation runs before mixing. Exact integer rank "
    "arithmetic (rn·5 > n == rn/n > 0.2) — no percentile "
    "interpolation, engine-identical. Plan: the score is a pure map; "
    "ONE source-keyed shuffle serves the rank and count windows.",
)
def docs_adaptive_quality_gate(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    s4 = F.round(tx.quality_score(F.col("text")) * 10000).cast("long")
    base = docs.select("doc_id", "source", s4.alias("s4"))
    w = Window.partitionBy("source").orderBy(F.col("s4").asc(), F.col("doc_id").asc())
    cnt = Window.partitionBy("source")
    return (
        base.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(cnt))
        .select(
            "doc_id",
            "source",
            (F.col("s4") / F.lit(10000.0)).alias("score"),
            (F.col("rn") * 5 > F.col("n")).alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Round-7 second half: corpus governance (quality census, budget
# sampling, drift, chunk-level rewrite, quantization audit)
# ---------------------------------------------------------------------------

#: Gopher-style rule thresholds (Rae et al. 2021 table A1, adapted to
#: this corpus's scale: docs run ~10-120 whitespace tokens).
QR_MIN_TOKENS = 20
QR_MAX_TOKENS = 100
QR_MIN_MEAN_LEN = 3  # mean token length bounds, integer cross-multiplied
QR_MAX_MEAN_LEN = 6
_QR_STOPS = ", ".join(f"'{w}'" for w in tx.STOPWORDS["en"])


@query(
    "docs_quality_rules",
    f"""WITH t AS (SELECT doc_id, source, text,
                          str_split(text, ' ') AS w FROM documents),
    m AS (SELECT source,
                 len(w) AS n,
                 length(text) - (len(w) - 1) AS tok_chars,
                 len(list_distinct(w)) AS nd,
                 len(list_filter(w, x -> x IN ({_QR_STOPS}))) AS stops
          FROM t),
    r AS (SELECT source,
                 CASE WHEN n < {QR_MIN_TOKENS} OR n > {QR_MAX_TOKENS}
                      THEN 1 ELSE 0 END AS f_len,
                 CASE WHEN tok_chars < {QR_MIN_MEAN_LEN} * n
                        OR tok_chars > {QR_MAX_MEAN_LEN} * n
                      THEN 1 ELSE 0 END AS f_word,
                 CASE WHEN stops = 0 THEN 1 ELSE 0 END AS f_stop,
                 CASE WHEN 2 * nd < n THEN 1 ELSE 0 END AS f_rep
          FROM m)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(f_len) AS BIGINT) AS fail_len,
           CAST(SUM(f_word) AS BIGINT) AS fail_wordlen,
           CAST(SUM(f_stop) AS BIGINT) AS fail_stopword,
           CAST(SUM(f_rep) AS BIGINT) AS fail_repetition,
           CAST(SUM(CASE WHEN f_len + f_word + f_stop + f_rep = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
    FROM r GROUP BY source ORDER BY source""",
    doc="Gopher-style quality-rule census (Rae et al. 2021 §A1.1): per "
    "source, how many documents fail each heuristic filter — token "
    "count bounds, mean-word-length bounds, stopword presence, "
    "distinct-token repetition — and how many pass every rule. All "
    "thresholds compare in INTEGER space (cross-multiplied bounds), "
    "so the census is FP-free and bit-identical in any engine. Plan: "
    "one projection + one map-side-combined aggregate keyed on "
    "source — a single corpus scan, no joins; at 100 TB this is the "
    "cheapest possible shape (the same pass a real curation run "
    "piggybacks on its first read).",
    bench=True,
)
def docs_quality_rules(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = tx.tokens(F.col("text"))
    n = F.size(w)
    tok_chars = F.length("text") - (n - F.lit(1))
    nd = F.size(F.array_distinct(w))
    stops = tx.stopword_hits(F.col("text"), "en")
    f_len = (
        (n < QR_MIN_TOKENS) | (n > QR_MAX_TOKENS)
    ).cast("int")
    f_word = (
        (tok_chars < F.lit(QR_MIN_MEAN_LEN) * n)
        | (tok_chars > F.lit(QR_MAX_MEAN_LEN) * n)
    ).cast("int")
    f_stop = (stops == 0).cast("int")
    f_rep = (F.lit(2) * nd < n).cast("int")
    proj = fan_out(docs).select(
        "source",
        f_len.alias("f_len"),
        f_word.alias("f_word"),
        f_stop.alias("f_stop"),
        f_rep.alias("f_rep"),
    )
    return (
        proj.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("f_len").cast("long").alias("fail_len"),
            F.sum("f_word").cast("long").alias("fail_wordlen"),
            F.sum("f_stop").cast("long").alias("fail_stopword"),
            F.sum("f_rep").cast("long").alias("fail_repetition"),
            F.sum(
                (
                    F.col("f_len") + F.col("f_word") + F.col("f_stop")
                    + F.col("f_rep")
                    == 0
                ).cast("int")
            )
            .cast("long")
            .alias("pass_all"),
        )
        .orderBy("source")
    )


#: token budget for the budget-sampling demo query — roughly 40% of
#: the sf0.001 corpus, ~4% at sf0.01, so both scales exercise the cut.
TOKEN_BUDGET = 12_000


@query(
    "docs_token_budget_sample",
    f"""WITH h AS (SELECT doc_id,
                          len(str_split(text, ' ')) AS n,
                          md5(CAST(doc_id AS VARCHAR)) AS hh
                   FROM documents),
    c AS (SELECT doc_id,
                 SUM(n) OVER (ORDER BY hh, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
          FROM h)
    SELECT doc_id, CAST(cum AS BIGINT) AS cum_tokens
    FROM c WHERE cum <= {TOKEN_BUDGET} ORDER BY doc_id""",
    doc="Token-budget sampling: keep documents in deterministic "
    "md5(doc_id) order until a cumulative token budget "
    f"({TOKEN_BUDGET}) is exhausted — 'give me exactly N training "
    "tokens, reproducibly', the knob a budgeted pretraining mix "
    "actually turns (priority_sample fixes a row count; this fixes "
    "the token total the model consumes). The oracle is a global "
    "running sum; the Spark plan is a DISTRIBUTED PREFIX SUM "
    "(sampling.token_budget_sample): 256 order-prefix buckets, one "
    "map-combined per-bucket total, a 256-row offset window, then "
    "per-bucket running sums + broadcast offsets — no global sort, "
    "each reducer sorts corpus/256 rows at 100 TB.",
)
def docs_token_budget_sample(spark, sf_dir):
    import meteo_etl_spark.functions.sampling as sp

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tx.token_count(F.col("text")).alias("n_tok")
    )
    return (
        sp.token_budget_sample(docs, "doc_id", "n_tok", TOKEN_BUDGET)
        .select("doc_id", "cum_tokens")
        .orderBy("doc_id")
    )


@query(
    "docs_drift_report",
    """WITH half AS (SELECT source,
                            CASE WHEN doc_id % 2 = 0 THEN 'ref'
                                 ELSE 'cur' END AS snap
                     FROM documents),
    cnt AS (SELECT source,
                   SUM(CASE WHEN snap = 'ref' THEN 1 ELSE 0 END) AS n_ref,
                   SUM(CASE WHEN snap = 'cur' THEN 1 ELSE 0 END) AS n_cur
            FROM half GROUP BY source),
    tot AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM cnt),
    p AS (SELECT source, n_ref, n_cur,
                 CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE) AS p_ref,
                 CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE) AS p_cur
          FROM cnt, tot)
    SELECT source,
           CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cur AS BIGINT) AS n_cur,
           CAST(floor(p_ref * 1000000.0 + 0.5) AS BIGINT) AS p_ref_ppm,
           CAST(floor(p_cur * 1000000.0 + 0.5) AS BIGINT) AS p_cur_ppm,
           CASE WHEN n_ref = 0 THEN NULL
                ELSE CAST(floor(((p_cur - p_ref) * (p_cur - p_ref) / p_ref)
                          * 1000000.0 + 0.5) AS BIGINT)
           END AS drift_ppm
    FROM p ORDER BY source""",
    doc="Corpus drift report between two snapshots (doc_id parity "
    "stands in for crawl generations): per source, the share of the "
    "reference vs current corpus and a chi-square-style drift score "
    "(p_cur-p_ref)^2/p_ref — the 'did the mixture shift under me' "
    "gate run between crawl ingests. Deliberately avoids ln() (PSI's "
    "log term is libm-dependent across engines); chi-square uses "
    "only IEEE-exact ops, reported in integer ppm, NULL for sources "
    "absent from the reference half (new domains are a flag, not a "
    "division by zero). Plan: one "
    "conditional aggregate to |sources| rows, totals via a scalar "
    "cross join of a 1-row aggregate — the corpus is read ONCE.",
)
def docs_drift_report(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    is_ref = (F.col("doc_id") % 2 == 0).cast("int")
    cnt = docs.groupBy("source").agg(
        F.sum(is_ref).alias("n_ref"),
        F.sum(1 - is_ref).alias("n_cur"),
    )
    tot = cnt.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p_ref = F.col("n_ref").cast("double") / F.col("t_ref").cast("double")
    p_cur = F.col("n_cur").cast("double") / F.col("t_cur").cast("double")
    ppm = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("long")  # noqa: E731
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            ppm(p_ref).alias("p_ref_ppm"),
            ppm(p_cur).alias("p_cur_ppm"),
            F.when(
                F.col("n_ref") == 0, F.lit(None).cast("long")
            )
            .otherwise(ppm((p_cur - p_ref) * (p_cur - p_ref) / p_ref))
            .alias("drift_ppm"),
        )
        .orderBy("source")
    )


#: non-overlapping chunk width for the rewrite path — rewrite needs a
#: partition of the token stream (overlap would double-count tokens).
REWRITE_CHUNK = 32


@query(
    "docs_chunk_dedup_rewrite",
    f"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
    n AS (SELECT doc_id, w, len(w) AS n FROM t),
    c AS (SELECT doc_id, w,
                 CASE WHEN n <= {REWRITE_CHUNK} THEN 1
                      ELSE CAST(ceil((n - {REWRITE_CHUNK}) / {float(REWRITE_CHUNK)}) AS BIGINT) + 1
                 END AS n_chunks
          FROM n),
    x AS (SELECT doc_id, w, UNNEST(range(0, n_chunks)) AS chunk_id FROM c),
    s AS (SELECT doc_id, chunk_id,
                 array_to_string(w[chunk_id * {REWRITE_CHUNK} + 1 :
                                   chunk_id * {REWRITE_CHUNK} + {REWRITE_CHUNK}],
                                 ' ') AS ch
          FROM x),
    h AS (SELECT doc_id, chunk_id, ch, md5(ch) AS hh,
                 len(str_split(ch, ' ')) AS n_tokens
          FROM s),
    k AS (SELECT hh, MIN(doc_id) AS keeper FROM h GROUP BY hh),
    j AS (SELECT h.*, CASE WHEN k.keeper < h.doc_id THEN 1 ELSE 0 END AS dropped
          FROM h JOIN k USING (hh))
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(dropped) AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN dropped = 0 THEN n_tokens ELSE 0 END)
                AS BIGINT) AS kept_tokens,
           md5(COALESCE(string_agg(CASE WHEN dropped = 0 THEN ch END,
                                   ' ' ORDER BY chunk_id), '')) AS rebuilt_md5
    FROM j GROUP BY doc_id ORDER BY doc_id""",
    doc="Chunk-level dedup REWRITE (RefinedWeb/CCNet passage dedup as a "
    "transformation, not just a signal): partition every document "
    f"into non-overlapping {REWRITE_CHUNK}-token chunks, keep each "
    "repeated chunk only in its lowest-doc_id occurrence, and "
    "reassemble every document from its surviving chunks — the "
    "operation that strips shared boilerplate while keeping the "
    "novel remainder (doc-level dedup would either keep or kill the "
    "whole page). Returns per-doc chunk/drop/token counts plus an "
    "md5 of the rebuilt text so the full rewrite is hash-pinned. "
    "Plan: shuffle-free chunker, one hash-keyed min-aggregate, one "
    "hash join back, one doc-keyed aggregate whose only wide state "
    "is the doc's own kept chunks (collect_list bounded by doc "
    "length). At 100 TB both exchanges are content-hash/doc keyed "
    "and combine map-side; nothing is ever all-pairs.",
)
def docs_chunk_dedup_rewrite(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    ch = pk.chunk_token_windows(
        fan_out(docs), width=REWRITE_CHUNK, stride=REWRITE_CHUNK, keep_text=True
    )
    keeper = ch.groupBy("chunk_hash").agg(F.min("doc_id").alias("keeper"))
    j = ch.join(keeper, "chunk_hash").withColumn(
        "dropped", (F.col("keeper") < F.col("doc_id")).cast("int")
    )
    kept = F.col("dropped") == 0
    rebuilt = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(kept, F.struct("chunk_id", "chunk_text"))
                )
            ),
            lambda s: s["chunk_text"],
        ),
        " ",
    )
    return (
        j.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("dropped").cast("long").alias("n_dropped"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
            F.md5(rebuilt.cast("binary")).alias("rebuilt_md5"),
        )
        .orderBy("doc_id")
    )


#: shared oracle CTE prefix for the substring-dedup pair — the exact
#: DuckDB twin of functions/dedup.duplicate_span_cover (md5 gram keys,
#: BIGINT-encoded canonical occurrence, distinct covered positions).
_SUBSTR_COMMON = f"""
WITH t AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id,
             UNNEST(range(0, GREATEST(len(w) - {dd.SUBSTR_W} + 1, 0))) AS pos,
             w
      FROM t),
gr AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
              md5(array_to_string(w[pos+1 : pos+{dd.SUBSTR_W}], ' ')) AS hh
       FROM g),
rk AS (SELECT doc_id, pos,
              ROW_NUMBER() OVER (PARTITION BY hh ORDER BY doc_id, pos) AS rn
       FROM gr),
d AS (SELECT doc_id, pos FROM rk WHERE rn >= 2),
cov AS (SELECT DISTINCT doc_id, UNNEST(range(pos, pos + {dd.SUBSTR_W})) AS p
        FROM d)"""


@query(
    "docs_dup_spans",
    _SUBSTR_COMMON
    + """,
isl AS (SELECT doc_id, p,
               CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) = p - 1
                    THEN 0 ELSE 1 END AS brk
        FROM cov),
sp AS (SELECT doc_id, COUNT(*) AS covered,
              CAST(SUM(brk) AS BIGINT) AS n_spans
       FROM isl GROUP BY doc_id),
base AS (SELECT doc_id, len(w) AS n_tok FROM t)
SELECT b.doc_id,
       CAST(b.n_tok AS BIGINT) AS n_tokens,
       CAST(COALESCE(s.covered, 0) AS BIGINT) AS covered_tokens,
       CAST(COALESCE(s.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(floor(COALESCE(s.covered, 0) * 1000000.0 / b.n_tok + 0.5)
            AS BIGINT) AS cov_ppm
FROM base b LEFT JOIN sp s USING (doc_id) ORDER BY doc_id""",
    doc="Substring-level duplicate-SPAN census (the detection half of "
    "Lee et al. 2022 suffix-array dedup, Spark-first: see "
    "functions/dedup.duplicate_span_cover): every position covered "
    "by a non-canonical occurrence of a repeated "
    f"{dd.SUBSTR_W}-token gram is duplicated; runs of overlapping "
    "duplicated grams merge into SPANS via the gaps-and-islands "
    "window (lag + running sum), and each doc reports its span "
    "count and coverage ppm — the 'how much of my corpus is "
    "copy-pasted' census that decides whether span excision is "
    "worth a rewrite pass. Plan: O(total tokens) rows through two "
    "hash shuffles (md5 gram key, then (doc,pos)); the gram "
    "aggregate combines map-side; NEVER all-pairs and no global "
    "sort — the suffix array's job done by groupBy.",
    bench=True,
)
def docs_dup_spans(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base, covered = dd.duplicate_span_cover(docs)
    wspec = Window.partitionBy("doc_id").orderBy("p")
    brk = F.when(F.lag("p").over(wspec) == F.col("p") - 1, F.lit(0)).otherwise(
        F.lit(1)
    )
    sp = (
        covered.withColumn("brk", brk)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("covered"),
            F.sum("brk").cast("long").alias("n_spans"),
        )
    )
    cov_c = F.coalesce(F.col("covered"), F.lit(0)).cast("long")
    return (
        base.select("doc_id", "n_tok")
        .join(sp, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tok").cast("long").alias("n_tokens"),
            cov_c.alias("covered_tokens"),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
            F.floor(
                cov_c * F.lit(1000000.0) / F.col("n_tok") + F.lit(0.5)
            )
            .cast("long")
            .alias("cov_ppm"),
        )
        .orderBy("doc_id")
    )


@query(
    "docs_substring_dedup_rewrite",
    _SUBSTR_COMMON
    + """,
tokpos AS (SELECT doc_id, UNNEST(range(0, len(w))) AS p, w FROM t),
tok AS (SELECT doc_id, CAST(p AS BIGINT) AS p, w[p+1] AS token FROM tokpos),
keep AS (SELECT tok.doc_id, tok.p, tok.token
         FROM tok ANTI JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p),
base AS (SELECT doc_id, len(w) AS n_tok FROM t)
SELECT b.doc_id,
       CAST(b.n_tok AS BIGINT) AS n_tokens,
       CAST(b.n_tok - COUNT(k.token) AS BIGINT) AS n_removed,
       md5(COALESCE(string_agg(k.token, ' ' ORDER BY k.p), '')) AS rebuilt_md5
FROM base b LEFT JOIN keep k USING (doc_id)
GROUP BY b.doc_id, b.n_tok ORDER BY doc_id""",
    doc="Substring-level dedup REWRITE (the excision half of Lee et "
    "al. 2022: remove every duplicated span, keep the canonical "
    "occurrence): tokens at positions covered by non-canonical "
    f"repeated-{dd.SUBSTR_W}-gram occurrences are excised via one "
    "left_anti join on (doc, pos), and each document is reassembled "
    "from its surviving tokens in order — hash-pinned by an md5 of "
    "the rebuilt text, so the full transformation is certified, not "
    "just counted. Unlike doc- or chunk-level dedup this strips the "
    "copy-pasted passage and KEEPS the novel remainder at token "
    "granularity. Plan: the anti join and the rebuild aggregate are "
    "both (doc,pos)-keyed hash ops; per-doc state is bounded by doc "
    "length (the collect_list is the doc's own surviving tokens); "
    "no all-pairs, no global sort, scales like tokenization.",
    bench=True,
)
def docs_substring_dedup_rewrite(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = dd.excise_duplicate_spans(docs)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.md5(F.col("text").cast("binary")).alias("rebuilt_md5"),
    ).orderBy("doc_id")


def _duck_fold(terms: str) -> str:
    """Sequential left fold from 0.0 over per-index ``terms`` (use
    ``v[i]``-style element refs) — same order as Spark ``aggregate``."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {_DIM + 1}), "
        f"i -> {terms})), (acc, x) -> acc + x)"
    )


@query(
    "emb_quant_audit",
    f"""WITH v AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (SELECT label, v,
                 list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc
          FROM v),
    d AS (SELECT label, v, sc,
                 CASE WHEN sc = 0 THEN v
                      ELSE list_transform(v, x ->
                             floor(abs(x / sc) + 0.5) * sign(x) * sc)
                 END AS dq
          FROM s),
    e AS (SELECT label,
                 sqrt({_duck_fold('(v[i] - dq[i]) * (v[i] - dq[i])')}) AS err,
                 CASE WHEN sc = 0 THEN 1.0
                      ELSE {_duck_fold('v[i] * dq[i]')}
                           / (sqrt({_duck_fold('v[i] * v[i]')})
                              * sqrt({_duck_fold('dq[i] * dq[i]')}))
                 END AS cos
          FROM d)
    SELECT label,
           COUNT(*) AS n_vecs,
           CAST(SUM(CAST(floor(err * 1000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_err_u,
           CAST(SUM(CAST(floor(cos * 1000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cos_u
    FROM e GROUP BY label ORDER BY label""",
    doc="Int8 symmetric-quantization audit: per embedding, quantize "
    "with the per-vector scale max|x|/127 (round half away from "
    "zero, the onnx/faiss convention), dequantize, and measure the "
    "L2 reconstruction error and cosine preservation vs the fp "
    "original; report per-label counts and micro-unit sums — the "
    "go/no-go table for serving a 4x-smaller ANN index. FP parity "
    "discipline: every per-vector value is one chain of IEEE-exact "
    "ops + sequential folds, then SNAPPED TO INTEGER micro-units "
    "BEFORE the group sum (float sums across a group are "
    "order-dependent; integer sums are not), so the result is "
    "bit-identical on any partitioning. Plan: pure map + one "
    "map-combined aggregate to |labels| rows — no joins, no "
    "shuffle of vector data at 100 TB.",
    bench=True,
)
def emb_quant_audit(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")

    def fold(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    def dot(a, b):
        return fold(F.zip_with(a, b, lambda x, y: x * y))

    v = F.transform("embedding", lambda x: x.cast("double"))
    base = fan_out(emb).select("label", v.alias("v"))
    sc = F.array_max(F.transform("v", F.abs)) / F.lit(127.0)
    with_sc = base.withColumn("sc", sc)
    dq = F.when(F.col("sc") == 0, F.col("v")).otherwise(
        F.transform(
            "v",
            lambda x: F.floor(F.abs(x / F.col("sc")) + F.lit(0.5))
            * F.signum(x)
            * F.col("sc"),
        )
    )
    with_dq = with_sc.withColumn("dq", dq)
    err = F.sqrt(
        fold(F.zip_with("v", "dq", lambda x, y: (x - y) * (x - y)))
    )
    cos = F.when(F.col("sc") == 0, F.lit(1.0)).otherwise(
        dot(F.col("v"), F.col("dq"))
        / (
            F.sqrt(dot(F.col("v"), F.col("v")))
            * F.sqrt(dot(F.col("dq"), F.col("dq")))
        )
    )
    u = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("long")  # noqa: E731
    per_vec = with_dq.select(
        "label", u(err).alias("err_u"), u(cos).alias("cos_u")
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("err_u").cast("long").alias("sum_err_u"),
            F.sum("cos_u").cast("long").alias("sum_cos_u"),
        )
        .orderBy("label")
    )


#: product-quantization shape: 64-dim vectors -> PQ_M subspaces of
#: PQ_SUB dims, PQ_K codes per subspace (sampled codebook: the chunks
#: of the PQ_K lowest-id vectors). Code storage = PQ_M bytes/vector vs
#: 256 B fp32 (32x) or 64 B int8 (8x) — the memory lever beyond
#: emb_quant_audit's int8.
PQ_M = 8
PQ_SUB = 8
PQ_K = 32
PQ_PANEL = 10
PQ_TOPK = 5
PQ_CAND = 100


@query(
    "emb_pq_audit",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (SELECT row_number() OVER (ORDER BY vec_id) AS cid, v AS cv
           FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT {PQ_K})),
    ms AS (SELECT UNNEST(range(0, {PQ_M})) AS m),
    cbm AS (SELECT m, cid, cv[m*{PQ_SUB}+1 : m*{PQ_SUB}+{PQ_SUB}] AS cv
            FROM cb, ms),
    vm AS (SELECT vec_id, m, v[m*{PQ_SUB}+1 : m*{PQ_SUB}+{PQ_SUB}] AS ch
           FROM v, ms),
    dist AS (SELECT vm.vec_id, vm.m, cbm.cid,
                    list_reduce(list_prepend(0.0,
                      list_transform(range(1, {PQ_SUB + 1}),
                        i -> (ch[i] - cv[i]) * (ch[i] - cv[i]))),
                      (acc, x) -> acc + x) AS d
             FROM vm JOIN cbm USING (m)),
    enc AS (SELECT vec_id, m, cid FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                           ORDER BY d, cid) AS rk
              FROM dist) WHERE rk = 1),
    rec AS (SELECT e.vec_id, flatten(list(c.cv ORDER BY e.m)) AS r
            FROM enc e JOIN cbm c USING (m, cid) GROUP BY e.vec_id),
    q AS (SELECT vec_id AS qid, v AS qv FROM v ORDER BY vec_id
          LIMIT {PQ_PANEL}),
    pairs AS (SELECT q.qid, v.vec_id,
                     {_duck_fold('v[i] * qv[i]')}
                       / (sqrt({_duck_fold('v[i] * v[i]')})
                          * sqrt({_duck_fold('qv[i] * qv[i]')})) AS s_exact,
                     {_duck_fold('r[i] * qv[i]')}
                       / (sqrt({_duck_fold('r[i] * r[i]')})
                          * sqrt({_duck_fold('qv[i] * qv[i]')})) AS s_adc
              FROM q, v JOIN rec USING (vec_id)
              WHERE v.vec_id <> q.qid),
    rk AS (SELECT qid, vec_id, s_exact,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY s_exact DESC, vec_id) AS rk_e,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY s_adc DESC, vec_id) AS rk_a
           FROM pairs),
    rr AS (SELECT qid, vec_id, rk_e,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY s_exact DESC, vec_id) AS rk_rr
           FROM rk WHERE rk_a <= {PQ_CAND})
    SELECT q.qid,
           CAST({PQ_TOPK} AS BIGINT) AS k,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_hit_adc,
           CAST(coalesce(b.n, 0) AS BIGINT) AS n_hit_rerank
    FROM q
    LEFT JOIN (SELECT qid, COUNT(*) AS n FROM rk
               WHERE rk_e <= {PQ_TOPK} AND rk_a <= {PQ_TOPK}
               GROUP BY qid) a USING (qid)
    LEFT JOIN (SELECT qid, COUNT(*) AS n FROM rr
               WHERE rk_e <= {PQ_TOPK} AND rk_rr <= {PQ_TOPK}
               GROUP BY qid) b ON q.qid = b.qid
    ORDER BY qid""",
    doc="Product-quantization recall audit (r10 verdict order #6, "
    f"extending emb_quant_audit's int8): {PQ_M}x{PQ_SUB}-dim "
    f"subspaces, {PQ_K} codes each from a deterministic sampled "
    "codebook (the chunks of the lowest-id vectors; ties in the "
    "argmin encode break to the lowest code id in both engines) — "
    f"{PQ_M} bytes per vector, a 32x memory cut vs fp32 and the "
    "4-16x-beyond-int8 lever an ANN index needs at 100 TB. Per "
    "audit-panel query: n_hit_adc = truth top-k recovered by the raw "
    "ADC (asymmetric-distance, cosine against the PQ reconstruction) "
    f"ranking, and n_hit_rerank = truth recovered after the top-"
    f"{PQ_CAND} ADC candidates are RE-RANKED by exact cosine — the "
    "candidate-scan + exact-re-rank serving shape, certifying how "
    "much the re-rank recovers of what quantization loses. FP "
    "discipline: every score is one chain of sequential folds "
    "(IEEE-exact, both engines), rankings break ties on vec_id, and "
    "only integer counters aggregate. Plan: encode is a pure map "
    "over one broadcast codebook literal; the panel is 10 collected "
    "rows crossed in once (offline audit, not a serving path — the "
    "serving twin is query_ann_index's partition-pruned scan).",
    bench=True,
)
def emb_pq_audit(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.pq_audit_sampled(
        emb,
        n_sub=PQ_M,
        sub_dim=PQ_SUB,
        n_codes=PQ_K,
        n_queries=PQ_PANEL,
        k=PQ_TOPK,
        n_cand=PQ_CAND,
    )


# Shared PQ-encode CTEs (codebook -> per-subspace chunks -> argmin
# code ids), the exact text emb_pq_audit certifies — reused by the
# IVF-PQ serve oracle below.
_DUCK_PQ_ENC = f"""
    ms AS (SELECT UNNEST(range(0, {PQ_M})) AS m),
    cb AS (SELECT row_number() OVER (ORDER BY vec_id) AS cid, v AS cv
           FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT {PQ_K})),
    cbm AS (SELECT m, cid, cv[m*{PQ_SUB}+1 : m*{PQ_SUB}+{PQ_SUB}] AS cv
            FROM cb, ms),
    vm AS (SELECT vec_id, m, v[m*{PQ_SUB}+1 : m*{PQ_SUB}+{PQ_SUB}] AS ch
           FROM v, ms),
    dist AS (SELECT vm.vec_id, vm.m, cbm.cid,
                    list_reduce(list_prepend(0.0,
                      list_transform(range(1, {PQ_SUB + 1}),
                        i -> (ch[i] - cv[i]) * (ch[i] - cv[i]))),
                      (acc, x) -> acc + x) AS d
             FROM vm JOIN cbm USING (m)),
    enc AS (SELECT vec_id, m, cid FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                           ORDER BY d, cid) AS rk
              FROM dist) WHERE rk = 1)"""

_DUCK_SUB_FOLD = (
    "list_reduce(list_prepend(0.0, "
    f"list_transform(range(1, {PQ_SUB + 1}), i -> {{terms}})), "
    "(acc, x) -> acc + x)"
)


@query(
    "sim_ann_serve_ivfpq",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    {_DUCK_PQ_ENC},
    c AS (SELECT vec_id, v, {_duck_ivf_dots('v')} AS d FROM v),
    asn AS (SELECT vec_id, list_position(d, list_max(d)) AS lst, d FROM c),
    q0 AS (SELECT v.v AS qv, a.lst AS p1, a.d AS qd
           FROM v JOIN asn a USING (vec_id) WHERE vec_id = 0),
    q AS (SELECT qv, p1,
                 list_position(
                   list_transform(range(1, {sim.IVF_LISTS + 1}),
                     i -> CASE WHEN i = p1 THEN -1e18 ELSE qd[i] END),
                   list_max(
                     list_transform(range(1, {sim.IVF_LISTS + 1}),
                       i -> CASE WHEN i = p1 THEN -1e18 ELSE qd[i] END))) AS p2
          FROM q0),
    qm AS (SELECT m, qv[m*{PQ_SUB}+1 : m*{PQ_SUB}+{PQ_SUB}] AS qch
           FROM q, ms),
    lut AS (SELECT cbm.m, cbm.cid,
                   {_DUCK_SUB_FOLD.format(terms='cv[i] * qch[i]')} AS dq,
                   {_DUCK_SUB_FOLD.format(terms='cv[i] * cv[i]')} AS nn
            FROM cbm JOIN qm USING (m)),
    sc AS (SELECT e.vec_id,
                  list_reduce(list_prepend(0.0, list(l.dq ORDER BY e.m)),
                              (acc, x) -> acc + x) AS num,
                  list_reduce(list_prepend(0.0, list(l.nn ORDER BY e.m)),
                              (acc, x) -> acc + x) AS nrm2
           FROM enc e JOIN lut l ON l.m = e.m AND l.cid = e.cid
           GROUP BY e.vec_id),
    cand AS (SELECT s.vec_id,
                    s.num / (sqrt(s.nrm2)
                             * sqrt({_duck_fold('qv[i] * qv[i]')})) AS s_adc
             FROM sc s JOIN asn a ON a.vec_id = s.vec_id, q
             WHERE s.vec_id <> 0 AND (a.lst = q.p1 OR a.lst = q.p2)),
    short AS (SELECT vec_id FROM cand
              ORDER BY s_adc DESC, vec_id LIMIT {PQ_CAND}),
    rr AS (SELECT v.vec_id,
                  {_duck_dot('v', 'qv')}
                    / (sqrt({_duck_dot('v', 'v')})
                       * sqrt({_duck_dot('qv', 'qv')})) AS sim_raw
           FROM v JOIN short USING (vec_id), q)
    SELECT vec_id, ROUND(sim_raw, 6) AS sim FROM rr
    ORDER BY sim_raw DESC, vec_id LIMIT {PQ_TOPK}""",
    doc="IVF-PQ persisted serving certification (r12, composing the "
    "two certified halves into the faiss serving architecture — THE "
    f"memory lever at 100 TB): build_ivfpq_index lands (vec_id, "
    f"{PQ_M} PQ code ids) — NOT the float vectors — under lst=<k> "
    "IVF partitions with the deterministic sampled codebook in the "
    "_ann_meta.json sidecar; query_ivfpq_index computes the nprobe "
    "probe lists AND the per-query ADC lookup tables driver-side "
    f"({PQ_M}x{PQ_K} dots on constants), scores each candidate in the "
    f"pruned scan with 2x{PQ_M} literal lookups + a sequential fold "
    "(no per-row vector math — the index holds no vectors), exact-"
    f"re-ranks the top {PQ_CAND} ADC candidates against the PRIMARY "
    "store (the id shortlist is collected and PUSHED into the store "
    "scan as an isin filter — row-group skipping, not a full-scan "
    "join), and ships the exact top-5. The query RAISES unless the executed plan "
    "carries non-empty PartitionFilters. I/O at scale: nprobe "
    f"partitions of {PQ_M}-byte codes + {PQ_CAND} full vectors, vs "
    "terabytes of floats for a full-vector index. The oracle replays "
    "the ENTIRE route in SQL — sampled codebook, argmin encode, IVF "
    "probe arithmetic, LUT folds in subspace order, ADC shortlist, "
    "exact re-rank — so a hash match certifies the persisted index "
    "bit-for-bit. Side-effecting (scratch index, removed in-query).",
)
def sim_ann_serve_ivfpq(spark, sf_dir):
    import re
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    scratch = tempfile.mkdtemp(prefix="annserveivfpq_")
    try:
        sim.build_ivfpq_index(
            emb, f"{scratch}/idx", n_sub=PQ_M, sub_dim=PQ_SUB, n_codes=PQ_K,
            tune_nprobe=False,  # query pins the parity depth
        )
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        ]
        # query_ivfpq_index RAISES internally unless its candidate
        # scan is partition-pruned (the pruning contract moved into
        # the serve path itself — the ADC shortlist executes in-query,
        # so the returned frame is only the pushed-isin re-rank);
        # assert the re-rank scan carries the pushed id filter here
        got = sim.query_ivfpq_index(
            spark,
            f"{scratch}/idx",
            qv,
            emb,
            k=PQ_TOPK,
            n_cand=PQ_CAND,
            nprobe=sim.IVF_NPROBE,  # oracle-parity depth (SQL replays p1/p2)
            exclude_id=0,
        )
        plan = got._jdf.queryExecution().executedPlan().toString()
        if not re.search(r"PushedFilters: \[[^\]]*In\(vec_id", plan):
            raise RuntimeError(
                "IVF-PQ re-rank does not push the id shortlist into "
                "the primary-store scan:\n" + plan
            )
        return got.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "events_cms_topk",
    f"""WITH cells AS (
      SELECT d,
             ('0x' || substr(md5('cms' || d || ':' || user_id::VARCHAR), 1, 8))::BIGINT
               % {sk.CMS_WIDTH} AS bucket,
             COUNT(*) AS cnt
      FROM events, UNNEST(range(0, {sk.CMS_DEPTH})) AS u(d)
      GROUP BY 1, 2),
    exact AS (SELECT user_id, COUNT(*) AS n_exact FROM events
              GROUP BY user_id ORDER BY n_exact DESC, user_id LIMIT 5),
    probes AS (SELECT user_id, d,
                      ('0x' || substr(md5('cms' || d || ':' || user_id::VARCHAR), 1, 8))::BIGINT
                        % {sk.CMS_WIDTH} AS bucket
               FROM exact, UNNEST(range(0, {sk.CMS_DEPTH})) AS u(d)),
    est AS (SELECT user_id, MIN(COALESCE(c.cnt, 0)) AS n_cms
            FROM probes p LEFT JOIN cells c USING (d, bucket)
            GROUP BY user_id)
    SELECT e.user_id,
           CAST(e.n_exact AS BIGINT) AS n_exact,
           CAST(est.n_cms AS BIGINT) AS n_cms
    FROM exact e JOIN est USING (user_id)
    ORDER BY n_exact DESC, user_id""",
    doc="Count-min-sketch frequency table (sketches.cms_rollup/"
    f"cms_estimate, r12): a {sk.CMS_DEPTH}x{sk.CMS_WIDTH} CMS of "
    "user_id frequencies built AS A RELATION — one (d, bucket, cnt) "
    "row per non-empty counter cell, bounded at depth*width rows "
    "however large the key domain — then point estimates (min over "
    "the probed cells) for the exact top-5 heavy hitters, reported "
    "beside their true counts. The relational form is the point: "
    "cells merge across days/partitions by groupBy-SUM (associative "
    "integers — the mergeable-rollup contract of events_sketch_rollup "
    "without opaque binaries), estimates are one-sided (collisions "
    "only ADD, so n_cms >= n_exact always — pinned by pytest along "
    "with merge-equality), and the md5-seeded hashes make the whole "
    "sketch deterministic and oracle-replayable. width=64 keeps "
    "collisions visible at test scale; production sizes width ~ e/eps "
    "for an eps*N additive bound. Plan: one explode-to-depth map + "
    "one cell aggregate (map-side combined); the probe side is 20 "
    "rows joined against a broadcast 256-cell sketch — the fact is "
    "scanned once.",
    bench=True,
)
def events_cms_topk(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cms = sk.cms_rollup(ev, "user_id")
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), "user_id")
        .limit(5)
    )
    est = sk.cms_estimate(cms, exact.select("user_id"), "user_id")
    return (
        exact.join(est, "user_id")
        .select("user_id", F.col("n_exact").cast("long").alias("n_exact"), "n_cms")
        .orderBy(F.desc("n_exact"), "user_id")
    )


@query(
    "events_cms_merge_topk",
    f"""WITH daily AS (
      SELECT date_trunc('day', ts) AS day, d,
             ('0x' || substr(md5('cms' || d || ':' || user_id::VARCHAR), 1, 8))::BIGINT
               % {sk.CMS_WIDTH} AS bucket,
             COUNT(*) AS cnt
      FROM events, UNNEST(range(0, {sk.CMS_DEPTH})) AS u(d)
      GROUP BY 1, 2, 3),
    cells AS (SELECT d, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
              FROM daily GROUP BY d, bucket),
    exact AS (SELECT user_id, COUNT(*) AS n_exact FROM events
              GROUP BY user_id ORDER BY n_exact DESC, user_id LIMIT 5),
    probes AS (SELECT user_id, d,
                      ('0x' || substr(md5('cms' || d || ':' || user_id::VARCHAR), 1, 8))::BIGINT
                        % {sk.CMS_WIDTH} AS bucket
               FROM exact, UNNEST(range(0, {sk.CMS_DEPTH})) AS u(d)),
    est AS (SELECT user_id, MIN(COALESCE(c.cnt, 0)) AS n_cms
            FROM probes p LEFT JOIN cells c USING (d, bucket)
            GROUP BY user_id)
    SELECT e.user_id,
           CAST(e.n_exact AS BIGINT) AS n_exact,
           CAST(est.n_cms AS BIGINT) AS n_cms
    FROM exact e JOIN est USING (user_id)
    ORDER BY n_exact DESC, user_id""",
    doc="CMS MERGE certification — the maintenance contract of "
    "events_cms_topk under the driver's hash gate, the same twin "
    "relationship as events_scd2 / events_scd2_stream: the Spark side "
    "builds PER-DAY cell rollups (the stored daily form at 100 TB), "
    "merges them with one groupBy-SUM (associative integer cells — "
    "zero fact rescans), and estimates the exact top-5 heavy hitters "
    "from the MERGED sketch; the oracle replays the daily "
    "decomposition + merge in SQL. A hash match against the same "
    "estimates proves merged-daily == single-pass exactly — the "
    "property that lets any coarser window (month, ad-hoc ranges) be "
    "answered from stored daily cells. Plan: explode-to-depth map + "
    "two cell aggregates (day-keyed then merged, both map-side "
    "combined, both bounded at depth*width rows per group).",
)
def events_cms_merge_topk(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = sk.cms_rollup(
        ev.withColumn("day", F.date_trunc("day", "ts")),
        "user_id",
        group_keys=["day"],
    )
    cells = (
        daily.groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), "user_id")
        .limit(5)
    )
    est = sk.cms_estimate(cells, exact.select("user_id"), "user_id")
    return (
        exact.join(est, "user_id")
        .select("user_id", F.col("n_exact").cast("long").alias("n_exact"), "n_cms")
        .orderBy(F.desc("n_exact"), "user_id")
    )


@query(
    "events_key_skew_report",
    """WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
    t AS (SELECT SUM(n) AS tot, COUNT(*) AS nkeys FROM c)
    SELECT user_id,
           CAST(n AS BIGINT) AS n,
           CAST(floor(CAST(n AS DOUBLE) * 1000000.0 / CAST(tot AS DOUBLE)
                      + 0.5) AS BIGINT) AS share_ppm,
           CAST(floor(CAST(n AS DOUBLE) * CAST(nkeys AS DOUBLE) * 1000000.0
                      / CAST(tot AS DOUBLE) + 0.5) AS BIGINT) AS skew_x_ppm
    FROM c, t ORDER BY n DESC, user_id LIMIT 5""",
    doc="Join-key skew census: the top heavy keys of a prospective "
    "join/aggregation key with their share of all rows (ppm) and "
    "their skew multiple vs a uniform key (n x n_keys / total) — the "
    "measurement that decides BEFORE a 100 TB join whether to salt "
    "(operators/skew.salted_join), lean on AQE skew-join splitting, "
    "or isolate the hot keys. Plan: one map-combined count per key, a "
    "1-row totals broadcast crossed into the per-key frame, and "
    "TakeOrderedAndProject for the top-k — per-partition heaps, no "
    "global sort; the full key census never leaves the executors.",
)
def events_key_skew_report(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("nkeys")
    )
    share = F.floor(
        F.col("n").cast("double") * F.lit(1000000.0)
        / F.col("tot").cast("double")
        + F.lit(0.5)
    ).cast("long")
    skew_x = F.floor(
        F.col("n").cast("double")
        * F.col("nkeys").cast("double")
        * F.lit(1000000.0)
        / F.col("tot").cast("double")
        + F.lit(0.5)
    ).cast("long")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            share.alias("share_ppm"),
            skew_x.alias("skew_x_ppm"),
        )
        .orderBy(F.desc("n"), F.col("user_id"))
        .limit(5)
    )


@query(
    "docs_bigram_fluency",
    """WITH t AS (SELECT doc_id,
                 list_filter(string_split(text, ' '),
                             x -> length(x) > 0) AS t
          FROM documents),
    b AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
          FROM t, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
          WHERE len(t) >= 2),
    cb AS (SELECT w1, w2, COUNT(*) AS cb FROM b GROUP BY 1, 2),
    cu AS (SELECT tok, COUNT(*) AS cu
           FROM (SELECT UNNEST(t) AS tok FROM t) GROUP BY 1),
    p AS (SELECT doc_id, (1000000 * cb.cb) // cu.cu AS ppm
          FROM b JOIN cb USING (w1, w2) JOIN cu ON b.w1 = cu.tok)
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(ppm) AS BIGINT) AS sum_ppm,
           CAST((2 * SUM(ppm) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
             AS fluency_ppm
    FROM p GROUP BY doc_id ORDER BY doc_id""",
    doc="Bigram-LM fluency score (the conditional, word-ORDER-aware "
    "complement of docs_unigram_freq's frequency signal — the CCNet "
    "recipe scores with an n-gram LM precisely because unigram "
    "frequency cannot see scrambled or boilerplate-stitched text): "
    "each document scores the mean MLE transition probability "
    "P(w2|w1) = c(w1 w2)/c(w1) over its adjacent token pairs. "
    "Determinism discipline: probabilities live in integer ppm via "
    "BIGINT division ((1000000*c_bigram) div c_prefix — exact and "
    "identical in both engines, no libm log), and the per-doc mean "
    "rounds half-up in pure integer space ((2*sum+n) div (2n)). "
    "Plan: tokenize+pair is a narrow generate (transform over an "
    "index sequence, no self-join to form pairs); bigram and unigram "
    "count tables combine map-side; both count joins are "
    "vocabulary-vs-occurrences (AQE broadcasts the count side at "
    "small scale; bucket both legs by the gram key at 100 TB); one "
    "final shuffle on doc_id. Docs with <2 tokens have no transitions "
    "and are absent by construction in both engines.",
)
def docs_bigram_fluency(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toked = fan_out(docs).select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: F.length(x) > 0).alias("t"),
    )
    # Pair adjacent tokens with ONE generate over an index sequence —
    # never a positional self-join. The size>=2 guard keeps
    # sequence(0, size-2) from generating a descending range.
    pairs = (
        toked.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2), "
                    "i -> struct(t[i] AS w1, t[i + 1] AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    cb = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cu = (
        toked.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    scored = (
        pairs.join(cb, ["w1", "w2"])
        .join(cu, pairs["w1"] == cu["tok"])
        .select("doc_id", F.expr("(1000000 * cb) div cu").alias("ppm"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("ppm").cast("long").alias("sum_ppm"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_ppm",
            F.expr("(2 * sum_ppm + n_bigrams) div (2 * n_bigrams)").alias(
                "fluency_ppm"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "docs_ccnet_buckets",
    """WITH t AS (SELECT doc_id,
                 list_filter(string_split(text, ' '),
                             x -> length(x) > 0) AS t
          FROM documents),
    b AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
          FROM t, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
          WHERE len(t) >= 2),
    cb AS (SELECT w1, w2, COUNT(*) AS cb FROM b GROUP BY 1, 2),
    cu AS (SELECT tok, COUNT(*) AS cu
           FROM (SELECT UNNEST(t) AS tok FROM t) GROUP BY 1),
    p AS (SELECT doc_id, (1000000 * cb.cb) // cu.cu AS ppm
          FROM b JOIN cb USING (w1, w2) JOIN cu ON b.w1 = cu.tok),
    f AS (SELECT doc_id,
                 CAST((2 * SUM(ppm) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
                   AS fluency_ppm
          FROM p GROUP BY doc_id),
    d AS (SELECT doc_id, source,
                 len(list_filter(string_split(text, ' '),
                                 x -> length(x) > 0)) AS n_toks
          FROM documents),
    g AS (SELECT d.source, d.n_toks, f.fluency_ppm,
                 NTILE(3) OVER (PARTITION BY d.source
                                ORDER BY f.fluency_ppm DESC, d.doc_id)
                   AS tile
          FROM f JOIN d USING (doc_id))
    SELECT source,
           CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CAST(MIN(fluency_ppm) AS BIGINT) AS min_fluency_ppm,
           CAST(MAX(fluency_ppm) AS BIGINT) AS max_fluency_ppm,
           CAST((2 * SUM(fluency_ppm) + COUNT(*)) // (2 * COUNT(*))
                AS BIGINT) AS avg_fluency_ppm
    FROM g GROUP BY source, tile ORDER BY source, bucket""",
    doc="CCNet-style head/middle/tail bucketing (Wenzek et al. 2020): "
    "per SOURCE, documents rank by their LM score (docs_bigram_fluency"
    "'s integer-ppm bigram fluency — CCNet uses a KenLM perplexity; "
    "the bucketing mechanics are identical) and cut into tertiles via "
    "ntile(3) over the deterministic total order (fluency DESC, "
    "doc_id). Output is the operating table the CCNet recipe reads to "
    "keep head+middle and drop (or re-mine) the tail: per (source, "
    "bucket) doc/token mass and the fluency band (min/max/avg, "
    "half-up integer ppm — both engines replay the arithmetic "
    "exactly). Docs with <2 tokens have no LM transitions and are "
    "absent in both engines. Plan: the fluency derivation's two "
    "vocab-count joins, one doc_id shuffle, then ntile within source "
    "partitions (bounded by the largest source, not the corpus) and "
    "one final (source, tile) aggregate.",
    bench=True,
)
def docs_ccnet_buckets(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toked = fan_out(docs).select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: F.length(x) > 0).alias("t"),
    )
    pairs = (
        toked.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2), "
                    "i -> struct(t[i] AS w1, t[i + 1] AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    cb = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cu = (
        toked.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    fluency = (
        pairs.join(cb, ["w1", "w2"])
        .join(cu, pairs["w1"] == cu["tok"])
        .select("doc_id", F.expr("(1000000 * cb) div cu").alias("ppm"))
        .groupBy("doc_id")
        .agg(
            F.expr(
                "(2 * sum(ppm) + count(1)) div (2 * count(1))"
            ).alias("fluency_ppm")
        )
    )
    meta = docs.select(
        "doc_id",
        "source",
        F.size(
            F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
        ).alias("n_toks"),
    )
    tile = F.ntile(3).over(
        Window.partitionBy("source").orderBy(
            F.desc("fluency_ppm"), "doc_id"
        )
    )
    bucket = (
        F.when(F.col("tile") == 1, "head")
        .when(F.col("tile") == 2, "middle")
        .otherwise("tail")
    )
    return (
        fluency.join(meta, "doc_id")
        .select("source", "n_toks", "fluency_ppm", tile.alias("tile"))
        .groupBy("source", "tile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.min("fluency_ppm").cast("long").alias("min_fluency_ppm"),
            F.max("fluency_ppm").cast("long").alias("max_fluency_ppm"),
            F.expr(
                "(2 * sum(fluency_ppm) + count(1)) div (2 * count(1))"
            )
            .cast("long")
            .alias("avg_fluency_ppm"),
        )
        .select(
            "source",
            bucket.alias("bucket"),
            "n_docs",
            "n_tokens",
            "min_fluency_ppm",
            "max_fluency_ppm",
            "avg_fluency_ppm",
        )
        .orderBy("source", "bucket")
    )


_OUTLIER_TOPK = 3


@query(
    "emb_outliers",
    f"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
            FROM embeddings),
    u AS (SELECT vec_id, label,
                 list_transform(v, x ->
                   CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS xu
          FROM v),
    e AS (SELECT label, i AS pos, xu[i] AS x
          FROM u, UNNEST(generate_series(1, {_DIM})) AS g(i)),
    c AS (SELECT label, pos, CAST(SUM(x) AS BIGINT) AS su, COUNT(*) AS n
          FROM e GROUP BY 1, 2),
    cl AS (SELECT label, list(su ORDER BY pos) AS sums_u, MAX(n) AS n
           FROM c GROUP BY label),
    d AS (SELECT vec_id, v.label,
                 sqrt({_duck_fold(
                     '(v[i] - sums_u[i] / (1000000.0 * n))'
                     ' * (v[i] - sums_u[i] / (1000000.0 * n))'
                 )}) AS dist
          FROM v JOIN cl ON v.label = cl.label),
    r AS (SELECT label, vec_id,
                 CAST(floor(dist * 1000000.0 + 0.5) AS BIGINT) AS dist_u,
                 ROW_NUMBER() OVER (
                   PARTITION BY label
                   ORDER BY floor(dist * 1000000.0 + 0.5) DESC, vec_id
                 ) AS rk
          FROM d)
    SELECT label, vec_id, dist_u, rk FROM r WHERE rk <= {_OUTLIER_TOPK}
    ORDER BY label, rk""",
    doc="Per-label embedding outlier report (label-noise / mislabel "
    "hygiene — confident-learning's distance-to-class-centroid "
    "signal): the top-k vectors farthest from their OWN label's "
    "centroid. Determinism discipline: centroid element sums are "
    "snapped to integer micro-units BEFORE the group sum (float sums "
    "across a group are order-dependent; integer sums are not), the "
    "per-vector distance is one sequential fold with a single IEEE "
    "division per element (identical in both engines), and ranking "
    "keys on the integer-snapped distance with vec_id tie-break. "
    "Plan: the centroid pass posexplodes n*d micro-unit elements but "
    "combines map-side to |labels|*d partials, then collapses to ONE "
    "|labels|-row array frame that broadcasts back onto the vectors; "
    "one vector scan computes distances; top-k per label is a "
    "WindowGroupLimit (per-partition heaps), so no global sort and "
    "the vector payload never shuffles at 100 TB.",
)
def emb_outliers(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    base = fan_out(emb).select("vec_id", "label", v.alias("v"))
    xu = F.transform(
        "v", lambda x: F.floor(x * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    )
    cent = (
        base.select("label", F.posexplode(xu).alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.sum("x").alias("su"), F.count(F.lit(1)).alias("n"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "su"))),
                lambda s: s["su"],
            ).alias("sums_u"),
            F.max("n").alias("n"),
        )
    )
    joined = base.join(F.broadcast(cent), "label")
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                "v",
                "sums_u",
                lambda x, su: (
                    x - su / (F.lit(1000000.0) * F.col("n"))
                )
                * (x - su / (F.lit(1000000.0) * F.col("n"))),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    ranked = joined.select(
        "label",
        "vec_id",
        F.floor(dist * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias("dist_u"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("label").orderBy(F.desc("dist_u"), "vec_id")
        ),
    )
    return ranked.filter(F.col("rk") <= _OUTLIER_TOPK).orderBy("label", "rk")


#: adjacent-pair census top-k for docs_bpe_pairs.
_BPE_PAIR_TOPK = 20
#: merge budget for the docs_bpe_merges training run.
_BPE_N_MERGES = 8


@query(
    "docs_bpe_pairs",
    f"""WITH w AS (SELECT UNNEST(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS word
            FROM documents),
    h AS (SELECT word, COUNT(*) AS freq FROM w GROUP BY word),
    p AS (SELECT word[i] AS a, word[i + 1] AS b, freq
          FROM h, UNNEST(generate_series(1, length(word) - 1)) AS g(i)),
    c AS (SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt
          FROM p GROUP BY a, b)
    SELECT a, b, cnt FROM c
    ORDER BY cnt DESC, a, b LIMIT {_BPE_PAIR_TOPK}""",
    doc="BPE training, first iteration: the adjacent character-pair "
    "census over the word histogram — the exact pair table the first "
    "merge decision of functions/bpe.bpe_train reads, exposed as an "
    "oracle-checked query so the iterative trainer's per-step "
    "aggregate has a hash-pinned twin. Plan: ONE corpus scan builds "
    "the map-combined word histogram (Heaps' law: the vocab table is "
    "orders of magnitude smaller than the corpus); pairing is a "
    "narrow generate over an index sequence; the pair count combines "
    "map-side; top-k is TakeOrderedAndProject. Total order (count "
    "DESC, then (a, b)) makes the result partitioning-invariant.",
)
def docs_bpe_pairs(spark, sf_dir):
    from meteo_etl_spark.functions import bpe

    docs = load_table(spark, sf_dir, "documents")
    vocab = bpe.word_histogram(fan_out(docs)).select(
        bpe.chars("word").alias("syms"), "freq"
    )
    return (
        bpe.pair_counts(vocab)
        .orderBy(F.desc("cnt"), "a", "b")
        .limit(_BPE_PAIR_TOPK)
    )


@query(
    "docs_bpe_merges",
    None,  # iterative (driver-side argmax per step) — rows-only check;
    # exact-match correctness is pinned by tests/test_bpe.py against a
    # pure-Python reference trainer, incl. property-based corpora and a
    # partitioning-invariance case.
    doc="BPE tokenizer training end-to-end: 8 merges learned over the "
    "documents corpus (Sennrich et al. 2016), returned as the ranked "
    "merge table — the tokenizer-prep step of a training-data "
    "pipeline run where the data lives. Architecture: one corpus scan "
    "to the word histogram, then every iteration aggregates the "
    "VOCAB TABLE only (map-combined pair count + ONE scalar driver "
    "row for the argmax — the k-means-centroid discipline), applies "
    "the merge with a pure built-in fold (no UDF), and truncates "
    "lineage via localCheckpoint. At 100 TB the corpus is read "
    "exactly once; iteration cost is bound by distinct words.",
)
def docs_bpe_merges(spark, sf_dir):
    from meteo_etl_spark.functions import bpe

    docs = load_table(spark, sf_dir, "documents")
    return bpe.bpe_train(fan_out(docs), _BPE_N_MERGES)


#: unrolled merge budget for the hash-pinned docs_bpe_merges_k4 twin.
_BPE_K4 = 4


def _bpe_k4_oracle() -> str:
    """DuckDB replay of the first ``_BPE_K4`` BPE merge steps.

    The un-SQL-able part of BPE is the greedy leftmost-first
    non-overlapping merge apply. Trick: encode each word's symbol
    array as a ``chr(31)``-DOUBLE-separated string wrapped in
    separators (``␟␟h␟␟e␟␟y␟␟``); symbols never contain the
    separator, so the pattern ``␟a␟␟b␟`` matches exactly the
    adjacent symbol pairs (a, b) — one full boundary between a and b,
    half a boundary on each flank — and SQL ``replace()`` (leftmost,
    non-overlapping, no rescan of replaced output) applies the merge
    with PRECISELY apply_merge's greedy fold semantics: chained
    occurrences keep a spare separator on each side so ``[a,b,a,b]``
    collapses to ``[ab,ab]``, while ``[a,a,a]`` under (a,a) yields
    ``[aa,a]``. Each unrolled step is then census → total-order
    argmax → replace, all in SQL."""
    s1 = "chr(31)"
    s2 = "repeat(chr(31), 2)"
    parts = [
        f"""WITH w AS (SELECT UNNEST(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS word
            FROM documents),
    v0 AS (SELECT {s2} || regexp_replace(word, '(.)', '\\1' || {s2}, 'g')
                  AS s, COUNT(*) AS freq
           FROM w GROUP BY word)"""
    ]
    for i in range(_BPE_K4):
        parts.append(
            f"""sy{i} AS (SELECT list_filter(string_split(s, {s2}),
                                x -> x <> '') AS syms, freq FROM v{i}),
    p{i} AS (SELECT syms[j] AS a, syms[j + 1] AS b,
                    CAST(SUM(freq) AS BIGINT) AS cnt
             FROM sy{i}, UNNEST(generate_series(1, length(syms) - 1)) AS g(j)
             GROUP BY a, b),
    m{i} AS (SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1),
    v{i + 1} AS (SELECT replace(v.s,
                        {s1} || m.a || {s2} || m.b || {s1},
                        {s1} || m.a || m.b || {s1}) AS s, v.freq
             FROM v{i} v CROSS JOIN m{i} m)"""
        )
        # ORDER BY "rank" keeps the final projection deterministic
    selects = " UNION ALL ".join(
        f'SELECT CAST({i} AS INTEGER) AS "rank", a, b, a || b AS merged, '
        f"cnt AS pair_count FROM m{i}"
        for i in range(_BPE_K4)
    )
    return ",\n    ".join(parts) + f'\n    {selects} ORDER BY "rank"'


@query(
    "docs_bpe_merges_k4",
    _bpe_k4_oracle(),
    doc="The hash-pinned unrolled twin of docs_bpe_merges (r14 verdict "
    "order #5, the events_user_pagerank unrolling precedent): the "
    "first 4 merge decisions of the SAME trainer (functions/bpe."
    "bpe_train — word histogram, map-combined pair census, total-order "
    "argmax, greedy fold rewrite), replayed step-for-step by a "
    "native-SQL oracle whose merge-apply is a separator-encoded "
    "string replace with provably identical leftmost-first "
    "non-overlapping semantics. Turns the tokenizer trainer's first k "
    "steps from a rows-only check into a value-hash-certified one; "
    "the full 8-merge run stays covered by docs_bpe_merges + the "
    "pure-Python reference trainer in tests/test_bpe.py. Plan: "
    "identical to docs_bpe_merges at k=4 — one corpus scan, then "
    "vocab-table-only iterations.",
)
def docs_bpe_merges_k4(spark, sf_dir):
    from meteo_etl_spark.functions import bpe

    docs = load_table(spark, sf_dir, "documents")
    return bpe.bpe_train(fan_out(docs), _BPE_K4)


#: top-k most-correlated dimension pairs reported by emb_dim_corr.
_DIMCORR_TOPK = 20


@query(
    "emb_dim_corr",
    f"""WITH u AS (SELECT list_transform(embedding::DOUBLE[], x ->
                    CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS xu
            FROM embeddings),
    e AS (SELECT i, xu[i] AS x
          FROM u, UNNEST(generate_series(1, {_DIM})) AS g(i)),
    m AS (SELECT i, SUM(x) AS s, COUNT(*) AS n
          FROM e GROUP BY i),
    ps AS (SELECT i, j, SUM(xu[i] * xu[j]) AS sp
           FROM u,
                UNNEST(generate_series(1, {_DIM})) AS g(i),
                UNNEST(generate_series(i, {_DIM})) AS h(j)
           GROUP BY i, j),
    c AS (SELECT p.i, p.j,
                 (CAST(mi.n AS DOUBLE) * CAST(p.sp AS DOUBLE)
                  - CAST(mi.s AS DOUBLE) * CAST(mj.s AS DOUBLE))
                 / sqrt((CAST(mi.n AS DOUBLE) * CAST(di.sp AS DOUBLE)
                         - CAST(mi.s AS DOUBLE) * CAST(mi.s AS DOUBLE))
                        * (CAST(mi.n AS DOUBLE) * CAST(dj.sp AS DOUBLE)
                           - CAST(mj.s AS DOUBLE) * CAST(mj.s AS DOUBLE)))
                   AS corr
          FROM ps p
          JOIN m mi ON p.i = mi.i
          JOIN m mj ON p.j = mj.i
          JOIN ps di ON di.i = p.i AND di.j = p.i
          JOIN ps dj ON dj.i = p.j AND dj.j = p.j
          WHERE p.i < p.j)
    SELECT CAST(i - 1 AS INTEGER) AS dim_i,
           CAST(j - 1 AS INTEGER) AS dim_j,
           CAST(floor(corr * 1000000.0 + 0.5) AS BIGINT) AS corr_ppm
    FROM c
    ORDER BY abs(floor(corr * 1000000.0 + 0.5)) DESC, dim_i, dim_j
    LIMIT {_DIMCORR_TOPK}""",
    doc="Embedding-dimension redundancy audit (the PCA/whitening "
    "precursor): Pearson correlation between every dimension pair, "
    "top-k by |corr| — highly correlated dimensions are the signal "
    "that an index can drop/rotate dimensions before ANN serving. "
    "Determinism discipline: all sufficient statistics (per-dim sums, "
    "pairwise product sums) are INTEGER micro-unit sums — group-order "
    "free — and the correlation is one fixed chain of double ops over "
    "those integers, identical in both engines; ranking keys on the "
    "ppm-snapped value. Plan: pca.moment_census — the SAME census the "
    "PCA fit collects — scans the vectors ONCE (pair products, "
    "marginal sums, and the row count all ride one exploded term "
    "array into one map-combined aggregate, O(d^2) shuffle rows "
    "regardless of corpus size; sums are decimal(38,0) so they "
    "cannot wrap where an int64 SUM would near 10M unit-scale "
    "vectors — the oracle's HUGEINT mirrors this); the dimension-"
    "sized marginal/diagonal slices broadcast back onto the pair "
    "rows (identical census subtrees dedup via ReuseExchange); "
    "top-k is TakeOrderedAndProject.",
)
def emb_dim_corr(spark, sf_dir):
    from meteo_etl_spark.functions.pca import moment_census

    emb = load_table(spark, sf_dir, "embeddings")
    cens = moment_census(fan_out(emb), "embedding", _DIM)
    nrow = F.broadcast(
        cens.filter(F.col("i") == -1).select(F.col("sp").alias("n"))
    )
    marg = cens.filter((F.col("i") >= 0) & (F.col("j") == -1))
    diag = cens.filter((F.col("i") >= 0) & (F.col("i") == F.col("j")))
    stats = marg.select(F.col("i").alias("pos"), F.col("sp").alias("s")).join(
        diag.select(F.col("i").alias("pos"), F.col("sp").alias("ss")), "pos"
    )
    si = F.broadcast(stats.select(
        F.col("pos").alias("i"),
        F.col("s").alias("s_i"),
        F.col("ss").alias("ss_i"),
    ))
    sj = F.broadcast(stats.select(
        F.col("pos").alias("j"),
        F.col("s").alias("s_j"),
        F.col("ss").alias("ss_j"),
    ))
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    corr = (
        dbl("n") * dbl("sp") - dbl("s_i") * dbl("s_j")
    ) / F.sqrt(
        (dbl("n") * dbl("ss_i") - dbl("s_i") * dbl("s_i"))
        * (dbl("n") * dbl("ss_j") - dbl("s_j") * dbl("s_j"))
    )
    ppm = F.floor(corr * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return (
        cens.filter((F.col("i") >= 0) & (F.col("i") < F.col("j")))
        .join(si, "i")
        .join(sj, "j")
        .crossJoin(nrow)
        .select(
            F.col("i").cast("int").alias("dim_i"),
            F.col("j").cast("int").alias("dim_j"),
            ppm.alias("corr_ppm"),
        )
        .orderBy(F.abs(F.col("corr_ppm")).desc(), "dim_i", "dim_j")
        .limit(_DIMCORR_TOPK)
    )


@query(
    "emb_pca_variance",
    None,  # eigendecomposition is not SQL-expressible — rows-only check;
    # the distributed sufficient-statistics pass IS oracle-checked via
    # its twin emb_dim_corr, and tests/test_pca.py pins the fit against
    # numpy PCA (eigenvalues, subspace, sign policy, projections,
    # partitioning invariance of the integer statistics).
    doc="PCA spectrum of the embedding corpus: top-8 components' "
    "eigenvalues and explained-variance ratios (ppm) plus each "
    "component's dominant dimension — the whitening/rotation "
    "go-or-no-go that SemDeDup-style pipelines run before clustering, "
    "and the remedy emb_dim_corr's redundancy report calls for. "
    "Architecture: ONE distributed pass collects integer micro-unit "
    "sufficient statistics (O(d^2) shuffle, corpus-size independent); "
    "the d x d eigendecomposition is a driver-side scalar-class step "
    "(dimension-sized, the k-means-centroid discipline); nothing "
    "corpus-sized ever reaches the driver.",
)
def emb_pca_variance(spark, sf_dir):
    from meteo_etl_spark.functions import pca

    emb = load_table(spark, sf_dir, "embeddings")
    model = pca.pca_fit(fan_out(emb), "embedding", k=8)
    rows = []
    for i, (ev, r, comp) in enumerate(
        zip(model.eigenvalues, model.explained_variance_ratio, model.components)
    ):
        top_dim = max(range(len(comp)), key=lambda d: abs(comp[d]))
        rows.append((i, int(ev * 1_000_000 + 0.5), int(r * 1_000_000 + 0.5), top_dim))
    return spark.createDataFrame(
        rows, "component INT, eigval_u BIGINT, var_ratio_ppm BIGINT, top_dim INT"
    )


@query(
    "emb_gram_census",
    f"""WITH u AS (SELECT list_transform(embedding::DOUBLE[], x ->
                    CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS xu
            FROM embeddings),
    e AS (SELECT i, xu[i] AS x
          FROM u, UNNEST(generate_series(1, {_DIM})) AS g(i)),
    m AS (SELECT i, SUM(x) AS s FROM e GROUP BY i),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
    ps AS (SELECT i, j, SUM(xu[i] * xu[j]) AS sp
           FROM u,
                UNNEST(generate_series(1, {_DIM})) AS g(i),
                UNNEST(generate_series(i, {_DIM})) AS h(j)
           GROUP BY i, j)
    SELECT CAST(p.i - 1 AS INTEGER) AS dim_i,
           CAST(p.j - 1 AS INTEGER) AS dim_j,
           CAST(floor((CAST(nn.n AS DOUBLE) * CAST(p.sp AS DOUBLE)
                       - CAST(mi.s AS DOUBLE) * CAST(mj.s AS DOUBLE))
                      / (CAST(nn.n AS DOUBLE) * (CAST(nn.n AS DOUBLE) - 1.0))
                      / 1000000000000.0 * 1000000000.0 + 0.5)
                AS BIGINT) AS cov_e9
    FROM ps p
    JOIN m mi ON p.i = mi.i
    JOIN m mj ON p.j = mj.i
    CROSS JOIN nn
    ORDER BY dim_i, dim_j""",
    doc="The PCA pipeline's entire DISTRIBUTED stage as a hash-pinned "
    "table (r13 verdict order #7): the full sample-covariance upper "
    "triangle (d(d+1)/2 rows, 1e-9-snapped), assembled from the SAME "
    "pca.moment_census integer sufficient statistics emb_pca_variance "
    "feeds to the driver-side eigendecomposition — so everything "
    "before the non-SQL-expressible numpy.linalg.eigh now carries a "
    "DuckDB hash and only the eigensolve itself stays rows-only. "
    "Determinism: the census sums are order-free exact integers "
    "(decimal(38,0) / HUGEINT); the covariance is one fixed chain of "
    "correctly-rounded double ops over them, identical in both "
    "engines (the emb_dim_corr discipline). Plan: ONE corpus scan, "
    "one map-combined O(d^2) aggregate; the marginal/count rows "
    "broadcast back onto the dimension-sized pair frame — nothing "
    "corpus-sized shuffles or reaches the driver.",
    bench=True,
)
def emb_gram_census(spark, sf_dir):
    from meteo_etl_spark.functions.pca import moment_census

    emb = load_table(spark, sf_dir, "embeddings")
    cens = moment_census(fan_out(emb), "embedding", _DIM)
    nrow = F.broadcast(
        cens.filter(F.col("i") == -1).select(F.col("sp").alias("n"))
    )
    marg = cens.filter((F.col("i") >= 0) & (F.col("j") == -1))
    si = F.broadcast(
        marg.select(F.col("i").alias("i"), F.col("sp").alias("s_i"))
    )
    sj = F.broadcast(
        marg.select(F.col("i").alias("j"), F.col("sp").alias("s_j"))
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    cov_e9 = F.floor(
        (dbl("n") * dbl("sp") - dbl("s_i") * dbl("s_j"))
        / (dbl("n") * (dbl("n") - F.lit(1.0)))
        / F.lit(1000000000000.0)
        * F.lit(1000000000.0)
        + F.lit(0.5)
    ).cast("long")
    return (
        cens.filter((F.col("i") >= 0) & (F.col("j") >= 0))
        .join(si, "i")
        .join(sj, "j")
        .crossJoin(nrow)
        .select(
            F.col("i").cast("int").alias("dim_i"),
            F.col("j").cast("int").alias("dim_j"),
            cov_e9.alias("cov_e9"),
        )
        .orderBy("dim_i", "dim_j")
    )


@query(
    "events_anomaly_mad",
    """WITH v AS (SELECT event_type,
                    CAST(ROUND(value * 100) AS BIGINT) AS v
             FROM events),
    r1 AS (SELECT event_type, v,
                  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn,
                  COUNT(*) OVER (PARTITION BY event_type) AS n
           FROM v),
    med AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
                   MAX(CASE WHEN rn = (n + 1) // 2 THEN v END) AS med
            FROM r1 GROUP BY event_type),
    a AS (SELECT v.event_type, v.v, med.n, med.med,
                 abs(v.v - med.med) AS adev
          FROM v JOIN med ON v.event_type = med.event_type),
    r2 AS (SELECT event_type, n, med, adev,
                  ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY adev) AS rn
           FROM a),
    mad AS (SELECT event_type, MIN(n) AS n, MIN(med) AS med,
                   MAX(CASE WHEN rn = (n + 1) // 2 THEN adev END) AS mad
            FROM r2 GROUP BY event_type)
    SELECT a.event_type, MIN(mad.n) AS n, MIN(mad.med) AS med,
           MIN(mad.mad) AS mad,
           CAST(COUNT(*) FILTER (WHERE a.adev > 3 * mad.mad) AS BIGINT)
             AS n_outliers
    FROM a JOIN mad ON a.event_type = mad.event_type
    GROUP BY a.event_type ORDER BY a.event_type""",
    doc="MAD anomaly census (the ROBUST complement of "
    "events_anomaly_iqr's Tukey fences): per event type, the median, "
    "the median absolute deviation, and the count of values with "
    "|v - med| > 3 MAD — the modified-z-score filter that survives "
    "50% contamination where mean/stddev break down at <1%. "
    "All-integer: values in cents, nearest-rank (Type-1) medians via "
    "(n+1) div 2, and an integer fence test — no FP on either engine. "
    "Plan: TWO ranked window passes (values, then absolute "
    "deviations), each collapsing to a |types|-row frame that "
    "BROADCASTS back — the events table is scanned, never shuffled "
    "against itself; per-type rank windows are the same "
    "sort-within-type shape AQE handles at scale (salt the window by "
    "range-partitioning on (type, v) if one type dominates).",
)
def events_anomaly_mad(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    w1 = Window.partitionBy("event_type").orderBy("v")
    wp = Window.partitionBy("event_type")
    r1 = ev.withColumn("rn", F.row_number().over(w1)).withColumn(
        "n", F.count(F.lit(1)).over(wp)
    )
    med = r1.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(F.when(F.expr("rn = (n + 1) div 2"), F.col("v"))).alias("med"),
    )
    a = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("v") - F.col("med"))
    )
    w2 = Window.partitionBy("event_type").orderBy("adev")
    r2 = a.withColumn("rn", F.row_number().over(w2))
    mad = r2.groupBy("event_type").agg(
        F.min("n").alias("n"),
        F.min("med").alias("med"),
        F.max(F.when(F.expr("rn = (n + 1) div 2"), F.col("adev"))).alias("mad"),
    )
    return (
        a.drop("n", "med")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("n").alias("n"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.count(F.when(F.col("adev") > 3 * F.col("mad"), 1)).alias(
                "n_outliers"
            ),
        )
        .orderBy("event_type")
    )


#: reference-vocabulary size for the OOV-rate census.
_OOV_VOCAB_K = 256


@query(
    "docs_oov_rate",
    f"""WITH t AS (SELECT doc_id, tok
          FROM (SELECT doc_id,
                       UNNEST(list_filter(string_split(text, ' '),
                                          x -> length(x) > 0)) AS tok
                FROM documents)),
    v AS (SELECT tok FROM (SELECT tok, COUNT(*) AS c FROM t GROUP BY tok
                           ORDER BY c DESC, tok LIMIT {_OOV_VOCAB_K})),
    j AS (SELECT t.doc_id,
                 CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
          FROM t LEFT JOIN v USING (tok))
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           CAST((2 * 1000000 * SUM(oov) + COUNT(*)) // (2 * COUNT(*))
                AS BIGINT) AS oov_ppm
    FROM j GROUP BY doc_id ORDER BY doc_id""",
    doc="Vocabulary-coverage census: per document, the share of tokens "
    "(ppm) outside the corpus's own top-k vocabulary — the OOV-rate "
    "signal that sizes a tokenizer's vocab (every OOV token fragments "
    "into subwords, so high-OOV docs inflate token budgets) and flags "
    "vocabulary-mismatched sources before training. Deterministic "
    "vocab cut: (count DESC, token) is a total order, so the top-k set "
    "is identical on any partitioning and in both engines; the rate "
    "rounds half-up in pure integer space. Plan: one map-combined "
    "token count, a TakeOrderedAndProject top-k (per-partition heaps, "
    "k rows to the driver side of the plan — never the census), the "
    "k-row vocab BROADCAST left-joined onto the token stream, one "
    "shuffle on doc_id for the per-doc aggregate.",
)
def docs_oov_rate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs).select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
        ).alias("tok"),
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(_OOV_VOCAB_K)
        .select("tok", F.lit(1).alias("in_v"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("in_v").isNull(), 1)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.expr(
                "(2 * 1000000 * n_oov + n_tokens) div (2 * n_tokens)"
            ).alias("oov_ppm"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Model-based classification (functions/classify): the learned-filter stage
# ---------------------------------------------------------------------------


@query(
    "docs_classifier_confusion",
    """WITH s AS (SELECT doc_id, text, lang,
                  ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                    % 1000 AS b
           FROM documents),
    tr AS (SELECT lang AS cls, UNNEST(string_split(text, ' ')) AS tok
           FROM s WHERE b < 800),
    cnt AS (SELECT cls, tok, COUNT(*) AS cnt FROM tr GROUP BY cls, tok),
    tot AS (SELECT cls, CAST(SUM(cnt) AS BIGINT) AS total
            FROM cnt GROUP BY cls),
    model AS (SELECT cls, tok, cnt * 1000000 // total AS freq_ppm
              FROM cnt JOIN tot USING (cls)),
    te AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
           FROM s WHERE b >= 800),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM te GROUP BY doc_id, tok),
    num AS (SELECT doc_id, cls, CAST(SUM(tf * freq_ppm) AS BIGINT) AS score
            FROM tf JOIN model USING (tok) GROUP BY doc_id, cls),
    pred AS (SELECT doc_id, cls AS pred_cls FROM
               (SELECT *, row_number() OVER (PARTITION BY doc_id
                                             ORDER BY score DESC, cls) AS rk
                FROM num)
             WHERE rk = 1),
    labeled AS (SELECT s.doc_id, s.lang AS true_cls,
                       coalesce(p.pred_cls, '(oov)') AS pred_cls
                FROM s LEFT JOIN pred p USING (doc_id) WHERE s.b >= 800)
    SELECT true_cls, pred_cls, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM labeled GROUP BY true_cls, pred_cls
    ORDER BY true_cls, pred_cls""",
    doc="The learned-filter curation stage (FineWeb-Edu/CCNet style) "
    "run entirely inside the engine: hash-split the labeled corpus "
    "80/20, train a nearest-class-centroid token classifier on the "
    "train split (the model IS a DataFrame — one (class, token) row "
    "with an integer ppm weight, cnt*1e6 div total), score every "
    "held-out document as sum(tf * freq_ppm), argmax with a "
    "deterministic lexicographic tiebreak, and report the confusion "
    "matrix. Zero-overlap documents surface as '(oov)', never drop. "
    "Integer-exact end to end — ppm quantization is part of the model "
    "definition, so no libm and both engines agree bit-for-bit (same "
    "determinism discipline as docs_tfidf_topk). Plan: training is a "
    "map-combined (cls, tok) agg + classes-sized totals join; scoring "
    "joins vocabulary-vs-tokens on tok (AQE broadcasts the model at "
    "small scale; bucket both legs by tok at 100 TB); one shuffle on "
    "doc_id for the per-doc agg and one for the argmax window.",
    bench=True,
)
def docs_classifier_confusion(spark, sf_dir):
    from meteo_etl_spark.functions.classify import classifier_confusion

    docs = load_table(spark, sf_dir, "documents")
    return classifier_confusion(fan_out(docs), class_col="lang").orderBy(
        "true_cls", "pred_cls"
    )


@query(
    "docs_classifier_report",
    """WITH s AS (SELECT doc_id, text, lang,
                  ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                    % 1000 AS b
           FROM documents),
    tr AS (SELECT lang AS cls, UNNEST(string_split(text, ' ')) AS tok
           FROM s WHERE b < 800),
    cnt AS (SELECT cls, tok, COUNT(*) AS cnt FROM tr GROUP BY cls, tok),
    tot AS (SELECT cls, CAST(SUM(cnt) AS BIGINT) AS total
            FROM cnt GROUP BY cls),
    model AS (SELECT cls, tok, cnt * 1000000 // total AS freq_ppm
              FROM cnt JOIN tot USING (cls)),
    te AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
           FROM s WHERE b >= 800),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM te GROUP BY doc_id, tok),
    num AS (SELECT doc_id, cls, CAST(SUM(tf * freq_ppm) AS BIGINT) AS score
            FROM tf JOIN model USING (tok) GROUP BY doc_id, cls),
    pred AS (SELECT doc_id, cls AS pred_cls FROM
               (SELECT *, row_number() OVER (PARTITION BY doc_id
                                             ORDER BY score DESC, cls) AS rk
                FROM num)
             WHERE rk = 1),
    conf AS (SELECT s.lang AS true_cls,
                    coalesce(p.pred_cls, '(oov)') AS pred_cls,
                    CAST(COUNT(*) AS BIGINT) AS n_docs
             FROM s LEFT JOIN pred p USING (doc_id) WHERE s.b >= 800
             GROUP BY 1, 2),
    sup AS (SELECT true_cls AS cls, CAST(SUM(n_docs) AS BIGINT) AS support
            FROM conf GROUP BY 1),
    pn AS (SELECT pred_cls AS cls, CAST(SUM(n_docs) AS BIGINT) AS pred_n
           FROM conf GROUP BY 1),
    tp AS (SELECT true_cls AS cls, n_docs AS tp FROM conf
           WHERE true_cls = pred_cls)
    SELECT sup.cls, support,
           CAST(coalesce(tp, 0) AS BIGINT) AS tp,
           CAST(coalesce(pred_n, 0) AS BIGINT) AS pred_n,
           CASE WHEN coalesce(pred_n, 0) = 0 THEN NULL
                ELSE (2 * 1000000 * coalesce(tp, 0) + pred_n)
                       // (2 * pred_n) END AS precision_ppm,
           (2 * 1000000 * coalesce(tp, 0) + support)
             // (2 * support) AS recall_ppm
    FROM sup LEFT JOIN tp USING (cls) LEFT JOIN pn USING (cls)
    ORDER BY cls""",
    doc="Per-class precision/recall (half-up integer ppm) for the "
    "in-engine token classifier, derived from the confusion matrix — "
    "the k²-row minimal sufficient statistic, so the three "
    "derivations (support by true class, prediction counts by "
    "predicted class, true positives on the diagonal) are tiny aggs "
    "whose identical upstream subplan Spark shares via exchange "
    "reuse. Row domain = classes occurring as true labels in the "
    "held-out split; '(oov)' predictions inflate no class's "
    "precision denominator but its own (no row). Precision is NULL "
    "for never-predicted classes (0/0) — both engines agree. Same "
    "integer-exact discipline as docs_classifier_confusion.",
)
def docs_classifier_report(spark, sf_dir):
    from meteo_etl_spark.functions.classify import classifier_report

    docs = load_table(spark, sf_dir, "documents")
    return classifier_report(fan_out(docs), class_col="lang").orderBy("cls")


@query(
    "docs_classifier_skill",
    f"""WITH base AS (SELECT doc_id, lang, string_split(text, ' ') AS w
                FROM documents),
    tk AS (SELECT doc_id, lang, CAST(p AS BIGINT) AS p, w[p+1] AS token
           FROM (SELECT doc_id, lang, UNNEST(range(0, len(w))) AS p, w
                 FROM base)),
    mk AS (SELECT doc_id, lang, p,
                  CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || ':' ||
                                 p::VARCHAR || ':' || token), 1, 8))::BIGINT
                            % {_CLS_SIGNAL_DEN} = 0
                       THEN token || '_' || lang ELSE token END AS token
           FROM tk),
    docs2 AS (SELECT doc_id, lang,
                     string_agg(token, ' ' ORDER BY p) AS text
              FROM mk GROUP BY doc_id, lang),
    s AS (SELECT doc_id, text, lang,
                 ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                   % 1000 AS b
          FROM docs2),
    tr AS (SELECT lang AS cls, UNNEST(string_split(text, ' ')) AS tok
           FROM s WHERE b < 800),
    cnt AS (SELECT cls, tok, COUNT(*) AS cnt FROM tr GROUP BY cls, tok),
    tot AS (SELECT cls, CAST(SUM(cnt) AS BIGINT) AS total
            FROM cnt GROUP BY cls),
    model AS (SELECT cls, tok, cnt * 1000000 // total AS freq_ppm
              FROM cnt JOIN tot USING (cls)),
    te AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
           FROM s WHERE b >= 800),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM te GROUP BY doc_id, tok),
    num AS (SELECT doc_id, cls, CAST(SUM(tf * freq_ppm) AS BIGINT) AS score
            FROM tf JOIN model USING (tok) GROUP BY doc_id, cls),
    pred AS (SELECT doc_id, cls AS pred_cls FROM
               (SELECT *, row_number() OVER (PARTITION BY doc_id
                                             ORDER BY score DESC, cls) AS rk
                FROM num)
             WHERE rk = 1),
    conf AS (SELECT s.lang AS true_cls,
                    coalesce(p.pred_cls, '(oov)') AS pred_cls,
                    CAST(COUNT(*) AS BIGINT) AS n_docs
             FROM s LEFT JOIN pred p USING (doc_id) WHERE s.b >= 800
             GROUP BY 1, 2),
    sup AS (SELECT true_cls AS cls, CAST(SUM(n_docs) AS BIGINT) AS support
            FROM conf GROUP BY 1),
    pn AS (SELECT pred_cls AS cls, CAST(SUM(n_docs) AS BIGINT) AS pred_n
           FROM conf GROUP BY 1),
    tp AS (SELECT true_cls AS cls, n_docs AS tp FROM conf
           WHERE true_cls = pred_cls)
    SELECT sup.cls, support,
           CAST(coalesce(tp, 0) AS BIGINT) AS tp,
           CAST(coalesce(pred_n, 0) AS BIGINT) AS pred_n,
           CASE WHEN coalesce(pred_n, 0) = 0 THEN NULL
                ELSE (2 * 1000000 * coalesce(tp, 0) + pred_n)
                       // (2 * pred_n) END AS precision_ppm,
           (2 * 1000000 * coalesce(tp, 0) + support)
             // (2 * support) AS recall_ppm
    FROM sup LEFT JOIN tp USING (cls) LEFT JOIN pn USING (cls)
    ORDER BY cls""",
    doc="Classifier SKILL certification (r10 verdict order #2): the "
    "same train/score/report pipeline as docs_classifier_report, run "
    "on a corpus where the label is actually learnable. The synthetic "
    "testdata's lang label is statistically independent of its text "
    "(verified per-token), so accuracy at chance there is a property "
    "of the corpus, not the model; this query first injects "
    "class-conditional token morphology deterministically "
    "(classify.inject_class_signal: 32 md5 bits of doc_id:pos:token "
    f"mod SIGNAL_DEN={_CLS_SIGNAL_DEN} pick 1/{_CLS_SIGNAL_DEN} of "
    "positions, tok -> tok_<class> — the structure "
    "real language ID exploits), then trains on the 80% hash split "
    "and reports per-class precision/recall ppm on the held-out 20%. "
    "Measured macro recall ~0.97 at sf0.01 and sf0.1 (chance = 0.2 "
    "for 5 classes) — the learned filter SEPARATES when separation "
    "exists, with the exact same integer-ppm model the near-chance "
    "honest result used. Plan: injection is a pure map; the rest is "
    "the classifier plan (map-combined (cls,tok) agg, broadcast "
    "totals join-back, vocabulary join, one doc_id shuffle + argmax "
    "window).",
)
def docs_classifier_skill(spark, sf_dir):
    from meteo_etl_spark.functions.classify import (
        classifier_report,
        inject_class_signal,
    )

    docs = load_table(spark, sf_dir, "documents")
    sep = inject_class_signal(fan_out(docs), class_col="lang")
    return classifier_report(sep, class_col="lang").orderBy("cls")


@query(
    "docs_classifier_chargram_skill",
    f"""WITH base AS (SELECT doc_id, lang, string_split(text, ' ') AS w
                FROM documents),
    tk AS (SELECT doc_id, lang, CAST(p AS BIGINT) AS p, w[p+1] AS token
           FROM (SELECT doc_id, lang, UNNEST(range(0, len(w))) AS p, w
                 FROM base)),
    mk AS (SELECT doc_id, lang, p,
                  CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || ':' ||
                                 p::VARCHAR || ':' || token), 1, 8))::BIGINT
                            % {_CLS_SIGNAL_DEN} = 0
                       THEN token || '_' || lang ELSE token END AS token
           FROM tk),
    docs2 AS (SELECT doc_id, lang,
                     string_agg(token, ' ' ORDER BY p) AS text
              FROM mk GROUP BY doc_id, lang),
    s AS (SELECT doc_id, text, lang,
                 ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                   % 1000 AS b
          FROM docs2),
    trt AS (SELECT lang AS cls, UNNEST(string_split(text, ' ')) AS tok
            FROM s WHERE b < 800),
    trg AS (SELECT cls,
                   UNNEST(list_transform(
                     range(1, greatest(length('<' || tok || '>') - 2, 1) + 1),
                     i -> substr('<' || tok || '>', i, 3))) AS gram
            FROM trt),
    cnt AS (SELECT cls,
                   ('0x' || substr(md5(gram), 1, 8))::BIGINT
                     % {_CLS_CHAR_BUCKETS} AS feat,
                   COUNT(*) AS cnt
            FROM trg GROUP BY 1, 2),
    tot AS (SELECT cls, CAST(SUM(cnt) AS BIGINT) AS total
            FROM cnt GROUP BY cls),
    model AS (SELECT cls, feat, cnt * 1000000 // total AS freq_ppm
              FROM cnt JOIN tot USING (cls)),
    tet AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
            FROM s WHERE b >= 800),
    teg AS (SELECT doc_id,
                   UNNEST(list_transform(
                     range(1, greatest(length('<' || tok || '>') - 2, 1) + 1),
                     i -> substr('<' || tok || '>', i, 3))) AS gram
            FROM tet),
    tf AS (SELECT doc_id,
                  ('0x' || substr(md5(gram), 1, 8))::BIGINT
                    % {_CLS_CHAR_BUCKETS} AS feat,
                  COUNT(*) AS tf
           FROM teg GROUP BY 1, 2),
    num AS (SELECT doc_id, cls, CAST(SUM(tf * freq_ppm) AS BIGINT) AS score
            FROM tf JOIN model USING (feat) GROUP BY doc_id, cls),
    pred AS (SELECT doc_id, cls AS pred_cls FROM
               (SELECT *, row_number() OVER (PARTITION BY doc_id
                                             ORDER BY score DESC, cls) AS rk
                FROM num)
             WHERE rk = 1),
    conf AS (SELECT s.lang AS true_cls,
                    coalesce(p.pred_cls, '(oov)') AS pred_cls,
                    CAST(COUNT(*) AS BIGINT) AS n_docs
             FROM s LEFT JOIN pred p USING (doc_id) WHERE s.b >= 800
             GROUP BY 1, 2),
    sup AS (SELECT true_cls AS cls, CAST(SUM(n_docs) AS BIGINT) AS support
            FROM conf GROUP BY 1),
    pn AS (SELECT pred_cls AS cls, CAST(SUM(n_docs) AS BIGINT) AS pred_n
           FROM conf GROUP BY 1),
    tp AS (SELECT true_cls AS cls, n_docs AS tp FROM conf
           WHERE true_cls = pred_cls)
    SELECT sup.cls, support,
           CAST(coalesce(tp, 0) AS BIGINT) AS tp,
           CAST(coalesce(pred_n, 0) AS BIGINT) AS pred_n,
           CASE WHEN coalesce(pred_n, 0) = 0 THEN NULL
                ELSE (2 * 1000000 * coalesce(tp, 0) + pred_n)
                       // (2 * pred_n) END AS precision_ppm,
           (2 * 1000000 * coalesce(tp, 0) + support)
             // (2 * support) AS recall_ppm
    FROM sup LEFT JOIN tp USING (cls) LEFT JOIN pn USING (cls)
    ORDER BY cls""",
    doc="Hashed character-n-gram classifier skill (the r10 verdict's "
    "option (a), complementing docs_classifier_skill's separable "
    "corpus): every token expands to boundary-padded char trigrams "
    "('<aa', 'aa>'), each gram hashes into one of CHAR_FEAT_BUCKETS "
    "feature ids (32 md5 bits mod a power of two — ZERO modulo bias, "
    "oracle-identical), so the model is bounded at classes x 4096 "
    "rows REGARDLESS of vocabulary — the fastText subword trick that "
    "(1) broadcasts cheaply at 100 TB and (2) scores tokens never "
    "seen in training whenever they share character patterns. On the "
    "injected corpus the class morphology lives in suffixes, exactly "
    "what char-grams catch: macro recall 1.0 at sf0.01 (whole-token "
    "twin: 0.97). Same integer-ppm training, argmax and report "
    "derivation as the token path; plan adds one more explode "
    "(token->grams), everything else is shape-identical.",
)
def docs_classifier_chargram_skill(spark, sf_dir):
    from meteo_etl_spark.functions.classify import (
        chargram_report,
        inject_class_signal,
    )

    docs = load_table(spark, sf_dir, "documents")
    sep = inject_class_signal(fan_out(docs), class_col="lang")
    return chargram_report(sep, class_col="lang").orderBy("cls")


@query(
    "docs_classifier_incremental",
    """WITH tr AS (SELECT lang AS cls, UNNEST(string_split(text, ' ')) AS tok
           FROM documents),
    cnt AS (SELECT cls, tok, COUNT(*) AS cnt FROM tr GROUP BY cls, tok),
    tot AS (SELECT cls, CAST(SUM(cnt) AS BIGINT) AS total
            FROM cnt GROUP BY cls)
    SELECT cls, tok,
           CAST(cnt * 1000000 // total AS BIGINT) AS freq_ppm
    FROM cnt JOIN tot USING (cls)
    ORDER BY cls, tok""",
    doc="Incremental classifier retraining certification (r10 verdict "
    "order #4): the corpus streams in as three doc_id%3 waves through "
    "classify.classifier_retrain_foreach_batch — each wave lands its "
    "(cls, tok, cnt) count deltas under a batch=<id> partition "
    "(up-front FileSystem delete + dynamic overwrite: redelivery-"
    "idempotent by layout, never a read-modify-write double-count) "
    "and republishes the model from the SUMMED counts as a new atomic "
    "version with a tag flip. Wave 1 is then redelivered to prove the "
    "replay replaces its own partition. The returned model is the "
    "final published version; the oracle trains directly on the whole "
    "corpus in one pass — a hash match proves incremental == full "
    "retrain BIT-EXACTLY (counts are associative integers; the ppm "
    "quantization happens once, after the sum). Side-effecting "
    "(scratch counts + atomic model table, removed in-query); plan "
    "shape covered by the pytest e2e.",
)
def docs_classifier_incremental(spark, sf_dir):
    import shutil
    import tempfile

    from meteo_etl_spark.functions.classify import (
        classifier_retrain_foreach_batch,
        load_model,
    )

    docs = load_table(spark, sf_dir, "documents")
    scratch = tempfile.mkdtemp(prefix="clsinc_")
    try:
        handler = classifier_retrain_foreach_batch(
            spark, f"{scratch}/counts", f"{scratch}/model", tag="latest"
        )
        for wave in range(3):
            handler(docs.where(F.col("doc_id") % 3 == wave), wave)
        # at-least-once redelivery of the middle wave: must be a no-op
        handler(docs.where(F.col("doc_id") % 3 == 1), 1)
        return (
            load_model(spark, f"{scratch}/model", tag="latest")
            .orderBy("cls", "tok")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# ---------------------------------------------------------------------------
# Binary (sign-bit) quantization + sign-band LSH (round 12)
# ---------------------------------------------------------------------------

#: binary-quantization audit shape: panel of the 10 lowest-id vectors,
#: exact top-5 truth, Hamming shortlist of 50 before the exact re-rank.
BQ_PANEL = 10
BQ_TOPK = 5
BQ_CAND = 50


@query(
    "emb_binary_quant_audit",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v,
                 list_transform(v, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END)
                   AS bits
          FROM v),
    q AS (SELECT vec_id AS qid, v AS qv, bits AS qb FROM b
          ORDER BY vec_id LIMIT {BQ_PANEL}),
    pairs AS (SELECT q.qid, b.vec_id,
                     {_duck_fold('v[i] * qv[i]')}
                       / (sqrt({_duck_fold('v[i] * v[i]')})
                          * sqrt({_duck_fold('qv[i] * qv[i]')})) AS s_exact,
                     list_reduce(list_prepend(0,
                       list_transform(range(1, {_DIM + 1}),
                         i -> CASE WHEN bits[i] <> qb[i] THEN 1 ELSE 0 END)),
                       (acc, x) -> acc + x) AS ham
              FROM q, b WHERE b.vec_id <> q.qid),
    rk AS (SELECT qid, vec_id, s_exact,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY s_exact DESC, vec_id) AS rk_e,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY ham, vec_id) AS rk_h
           FROM pairs),
    rr AS (SELECT qid, rk_e,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY s_exact DESC, vec_id) AS rk_rr
           FROM rk WHERE rk_h <= {BQ_CAND})
    SELECT q.qid,
           CAST({BQ_TOPK} AS BIGINT) AS k,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_hit_ham,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n_hit_rerank
    FROM q
    LEFT JOIN (SELECT qid, COUNT(*) AS n FROM rk
               WHERE rk_e <= {BQ_TOPK} AND rk_h <= {BQ_TOPK}
               GROUP BY qid) a USING (qid)
    LEFT JOIN (SELECT qid, COUNT(*) AS n FROM rr
               WHERE rk_e <= {BQ_TOPK} AND rk_rr <= {BQ_TOPK}
               GROUP BY qid) c ON q.qid = c.qid
    ORDER BY qid""",
    doc="Binary-quantization recall audit — the memory FLOOR of the "
    "quantization family (1 bit/dim = 8 bytes/vector at dim 64: 32x "
    "below fp32, 8x below int8, beneath PQ's 8 bytes with zero "
    "codebook): per panel query, n_hit_ham = exact top-5 recovered "
    f"by ranking on Hamming distance over packed sign words alone "
    f"(integer XOR+popcount, no float math in the first pass), "
    f"n_hit_rerank = recovered after exact re-rank of the top-"
    f"{BQ_CAND} Hamming shortlist. Measured honestly on this corpus's "
    "weak neighbor structure: Hamming-only 0.24, re-rank 0.68 — the "
    "one-byte-per-8-dims scan is a SHORTLIST generator, never a "
    "ranker, and the audit is what tells you the required n_cand "
    "before trusting it at 100 TB. FP discipline: cosine truth folds "
    "sequentially (IEEE-exact both engines), Hamming is pure integer, "
    "rankings tie-break on vec_id, only integer counters aggregate. "
    "Plan: corpus scan x broadcast 10-row panel, two qid-window "
    "rankings — offline audit; the serving twin scans 2 longs/vector "
    "and fetches shortlist vectors by id (the IVF-PQ re-rank shape).",
    bench=True,
)
def emb_binary_quant_audit(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.binary_quant_audit(
        emb, n_queries=BQ_PANEL, k=BQ_TOPK, n_cand=BQ_CAND
    )


@query(
    "dedup_embedding_bitlsh",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v,
                 list_transform(v, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END)
                   AS bits
          FROM v),
    ms AS (SELECT UNNEST(range(0, {dd.EMB_SIGNBAND_BANDS})) AS band),
    bands AS (SELECT vec_id, band,
                     list_reduce(list_prepend(0,
                       list_transform(range(1, {dd.EMB_SIGNBAND_BITS + 1}),
                         i -> bits[band * {dd.EMB_SIGNBAND_BITS} + i]
                              * (1 << (i - 1)))),
                       (acc, x) -> acc + x) AS val
              FROM b, ms),
    cand AS (SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
             FROM bands a JOIN bands c USING (band, val)
             WHERE a.vec_id < c.vec_id),
    pairs AS (SELECT id_a, id_b,
                     {_duck_fold('va[i] * vb[i]')}
                       / (sqrt({_duck_fold('va[i] * va[i]')})
                          * sqrt({_duck_fold('vb[i] * vb[i]')})) AS cos_raw
              FROM cand
              JOIN (SELECT vec_id AS id_a, v AS va FROM v) USING (id_a)
              JOIN (SELECT vec_id AS id_b, v AS vb FROM v) USING (id_b))
    SELECT id_a AS vec_a, id_b AS vec_b, ROUND(cos_raw, 4) AS cos
    FROM pairs WHERE cos_raw >= {dd.EMB_SIGNBAND_THRESHOLD}
    ORDER BY vec_a, vec_b""",
    doc="Sign-band LSH near-dup pairs — the sub-quadratic candidate "
    "route dedup_embedding_cosine's docstring points to, now a "
    "certified operator: each vector's 64 sign bits split into "
    f"{dd.EMB_SIGNBAND_BANDS} byte-aligned bands of "
    f"{dd.EMB_SIGNBAND_BITS}; candidates agree on ALL bits of ANY "
    "band (ONE equi-join on (band, value) over tiny (id, band, value) "
    "rows — 3.1% of the pair space on an unstructured corpus, "
    "random-pair collision 8*2^-8); the exact cosine kernel then "
    "runs on candidates only, with vectors fetched by TWO id-joins, "
    "never replicated into the pair space. Banded S-curve recall "
    "1-(1-p^8)^8, p = 1-theta/pi: ~1.0 at near-dup cosine 0.9, an "
    "honestly-partial 0.22 at this corpus's forced 0.4 sweep (the "
    "blocked-exact operator remains the low-threshold tool; THIS is "
    "the 100 TB plan when the threshold is dedup-grade). No O(n^2) "
    "anywhere: shuffle is O(n*bands) + candidate-sized joins.",
    bench=True,
)
def dedup_embedding_bitlsh(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return dd.embedding_signband_pairs(emb).orderBy("vec_a", "vec_b")


# ---------------------------------------------------------------------------
# Random projection (Johnson-Lindenstrauss) audit (round 12)
# ---------------------------------------------------------------------------

RP_PANEL = 10


def _duck_rp_plane(k: int) -> str:
    from meteo_etl_spark.functions.projections import rp_plane

    vals = ", ".join(str(w) for w in rp_plane(k))
    return f"([{vals}]::DOUBLE[])"


def _duck_foldn(terms: str, n: int) -> str:
    """Sequential left fold from 0.0 over per-index ``terms`` with an
    explicit range bound (``_duck_fold``'s generalization for the
    projected space's smaller dimensionality)."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {n + 1}), "
        f"i -> {terms})), (acc, x) -> acc + x)"
    )


def _duck_rp_proj(v: str) -> str:
    from meteo_etl_spark.functions.projections import RP_OUT_DIM

    scale = float(RP_OUT_DIM) ** 0.5
    comps = ", ".join(
        f"{_duck_fold(f'({v})[i] * {_duck_rp_plane(k)}[i]')} / {scale}"
        for k in range(RP_OUT_DIM)
    )
    return f"[{comps}]"


def _rp_oracle() -> str:
    from meteo_etl_spark.functions.projections import RP_OUT_DIM

    return f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (SELECT vec_id, v, {_duck_rp_proj('v')} AS p FROM v),
    q AS (SELECT vec_id AS qid, v AS qv, p AS qp FROM p
          ORDER BY vec_id LIMIT {RP_PANEL}),
    pairs AS (SELECT q.qid,
                     {_duck_fold('(v[i] - qv[i]) * (v[i] - qv[i])')} AS d2v,
                     {_duck_foldn('(p[i] - qp[i]) * (p[i] - qp[i])', RP_OUT_DIM)} AS d2p
              FROM q, p WHERE p.vec_id <> q.qid),
    filt AS (SELECT qid,
                    CAST(floor(d2p / d2v * 1000000.0 + 0.5) AS BIGINT)
                      AS ratio_u
             FROM pairs WHERE d2v > 0)
    SELECT qid,
           COUNT(*) AS n_pairs,
           CAST(SUM(ratio_u) AS BIGINT) AS sum_ratio_u,
           MIN(ratio_u) AS min_ratio_u,
           MAX(ratio_u) AS max_ratio_u
    FROM filt GROUP BY qid ORDER BY qid"""


@query(
    "emb_rp_audit",
    _rp_oracle(),
    doc="Johnson-Lindenstrauss random-projection distortion audit — "
    "the DATA-INDEPENDENT dim cut beside PCA (emb_pca_variance): a "
    "fixed md5-seeded ±1 Rademacher matrix (Achlioptas 2001, the "
    "similarity.hyperplane convention — literal coefficients in BOTH "
    "engines, no RNG state) projects 64 -> 16 dims in one codegen'd "
    "map (16 sequential folds against literal arrays; sqrt(16)=4.0 "
    "makes even the JL scale FP-exact). Per panel query, the audit "
    "reports the distribution of dist2(projected)/dist2(original) "
    "over all corpus pairs — count, sum, min, max in integer "
    "micro-units (snapped per pair BEFORE the group aggregate: "
    "partition-invariant by construction). Mean near 1.0 certifies "
    "the 4x-smaller vectors for clustering/dedup blocking; min/max "
    "bound the worst pair. No training pass, no model table — the "
    "reduction reproduces from a constant at every executor, the "
    "property that matters when vectors arrive faster than a PCA "
    "refit (streaming crawls). Plan: corpus scan x broadcast 10-row "
    "panel (panel projected driver-side by the bit-identical twin), "
    "one grouped aggregate; no corpus-x-corpus join, no vector "
    "shuffle.",
    bench=True,
)
def emb_rp_audit(spark, sf_dir):
    from meteo_etl_spark.functions.projections import rp_distortion_audit

    emb = load_table(spark, sf_dir, "embeddings")
    return rp_distortion_audit(emb, n_queries=RP_PANEL)


from meteo_etl_spark.functions.classify import CAL_BINS as _CAL_BINS

_CAL_W = 1_000_000 // _CAL_BINS


@query(
    "docs_classifier_calibration",
    f"""WITH s AS (SELECT doc_id, text, lang,
                  ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                    % 1000 AS b
           FROM documents),
    tr AS (SELECT lang AS cls, UNNEST(string_split(text, ' ')) AS tok
           FROM s WHERE b < 800),
    cnt AS (SELECT cls, tok, COUNT(*) AS cnt FROM tr GROUP BY cls, tok),
    tot AS (SELECT cls, CAST(SUM(cnt) AS BIGINT) AS total
            FROM cnt GROUP BY cls),
    model AS (SELECT cls, tok, cnt * 1000000 // total AS freq_ppm
              FROM cnt JOIN tot USING (cls)),
    te AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
           FROM s WHERE b >= 800),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM te GROUP BY doc_id, tok),
    num AS (SELECT doc_id, cls, CAST(SUM(tf * freq_ppm) AS BIGINT) AS score
            FROM tf JOIN model USING (tok) GROUP BY doc_id, cls),
    rk AS (SELECT doc_id, cls, score,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, cls) AS rk
           FROM num),
    per AS (SELECT doc_id,
                   max(CASE WHEN rk = 1 THEN cls END) AS pred_cls,
                   max(CASE WHEN rk = 1 THEN score END) AS top_score,
                   CAST(SUM(score) AS BIGINT) AS tot_score
            FROM rk GROUP BY doc_id),
    lab AS (SELECT s.doc_id, s.lang AS true_cls,
                   p.pred_cls, p.top_score, p.tot_score
            FROM s LEFT JOIN per p USING (doc_id) WHERE s.b >= 800),
    bins AS (SELECT
               CASE WHEN tot_score IS NULL OR tot_score <= 0 THEN -1
                    ELSE least(top_score * 1000000 // tot_score,
                               {1_000_000 - 1})
                         // {_CAL_W} END AS bin,
               CASE WHEN pred_cls IS NOT NULL AND pred_cls = true_cls
                    THEN 1 ELSE 0 END AS correct,
               CASE WHEN tot_score IS NULL OR tot_score <= 0 THEN 0
                    ELSE top_score * 1000000 // tot_score END AS conf_ppm
             FROM lab)
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(correct) AS BIGINT) AS n_correct,
           CAST(SUM(conf_ppm) AS BIGINT) AS sum_conf_ppm,
           CAST((2 * 1000000 * SUM(correct) + COUNT(*)) // (2 * COUNT(*))
                AS BIGINT) AS acc_ppm
    FROM bins GROUP BY bin ORDER BY bin""",
    doc="Classifier reliability (calibration) table — the third "
    "artifact of the learned-filter family (confusion matrix -> "
    "precision/recall report -> THIS): per confidence decile of the "
    "held-out split, document count, correct count, summed confidence "
    "and half-up accuracy ppm. Confidence is the argmax class's share "
    "of total score mass (top_score * 1e6 div sum-of-scores — one "
    "BIGINT division, no softmax/libm, so both engines agree "
    "bit-for-bit); zero-overlap/zero-mass documents land in bin -1 "
    "rather than poisoning decile 0. A curation pipeline that "
    "score-gates documents (FineWeb-Edu style) reads THIS table "
    "before trusting any threshold: acc_ppm tracking mean confidence "
    "per bin is what makes a cutoff meaningful — and the table "
    "honestly shows that share-of-mass confidence concentrates near "
    "1/k with k classes of mostly-shared vocabulary (tiny margins "
    "win argmax), so a 0.9-style softmax cutoff would keep NOTHING "
    "here; the pinning test documents this geometry. Plan: the confusion "
    "query's train/score shape plus one doc_id-grouped aggregate; "
    "output <= 11 rows.",
    bench=True,
)
def docs_classifier_calibration(spark, sf_dir):
    from meteo_etl_spark.functions.classify import classifier_calibration

    docs = load_table(spark, sf_dir, "documents")
    return classifier_calibration(fan_out(docs), class_col="lang")


@query(
    "emb_sq8_audit",
    f"""WITH v AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
    ix AS (SELECT UNNEST(range(1, {_DIM + 1})) AS i),
    rg AS (SELECT i, MIN(v[i]) AS lo, MAX(v[i]) AS hi FROM v, ix GROUP BY i),
    ra AS (SELECT list(lo ORDER BY i) AS lo, list(hi ORDER BY i) AS hi
           FROM rg),
    d AS (SELECT label, v,
                 list_transform(range(1, {_DIM + 1}), i ->
                   CASE WHEN ra.hi[i] = ra.lo[i] THEN ra.lo[i]
                        ELSE ra.lo[i]
                             + least(greatest(floor((v[i] - ra.lo[i])
                                       / (ra.hi[i] - ra.lo[i]) * 255.0
                                       + 0.5), 0.0), 255.0)
                               * (ra.hi[i] - ra.lo[i]) / 255.0
                   END) AS dq
          FROM v, ra),
    e AS (SELECT label,
                 sqrt({_duck_fold('(v[i] - dq[i]) * (v[i] - dq[i])')}) AS err,
                 CASE WHEN sqrt({_duck_fold('v[i] * v[i]')})
                           * sqrt({_duck_fold('dq[i] * dq[i]')}) = 0 THEN 1.0
                      ELSE {_duck_fold('v[i] * dq[i]')}
                           / (sqrt({_duck_fold('v[i] * v[i]')})
                              * sqrt({_duck_fold('dq[i] * dq[i]')}))
                 END AS cos
          FROM d)
    SELECT label,
           COUNT(*) AS n_vecs,
           CAST(SUM(CAST(floor(err * 1000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_err_u,
           CAST(SUM(CAST(floor(cos * 1000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cos_u
    FROM e GROUP BY label ORDER BY label""",
    doc="Trained-range scalar quantization audit (faiss SQ8) — the "
    "fourth quantization family row beside per-vector int8 "
    "(emb_quant_audit), PQ (emb_pq_audit) and 1-bit sign codes "
    "(emb_binary_quant_audit): per-DIMENSION [lo, hi] ranges trained "
    "in ONE aggregate pass (min/max are order-invariant — identical "
    "at any partitioning; the collect is d-scalar-sized), then 8-bit "
    "codes against the fixed per-dim dictionary, reconstructed and "
    "measured with the same per-label integer micro-unit table as "
    "the int8 audit, so the two quantizers' numbers sit side by side "
    "directly. Unlike per-vector scales there is NO per-row "
    "metadata, and the frozen ranges are a quantizer CONTRACT later "
    "batches encode with (the frozen-quantizer streaming property "
    "the IVF-PQ ingest enforces; sq8_audit(ranges=) audits new "
    "batches against an existing contract). Plan: one d-wide min/max "
    "aggregate + one pure-map pass with literal range arrays + one "
    "map-combined group-by — no joins, no vector shuffle at 100 TB.",
    bench=True,
)
def emb_sq8_audit(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.sq8_audit(emb)


@query(
    "dedup_containment",
    f"""WITH {_DUCK_SHINGLES},
    dfc AS (SELECT tok, COUNT(*) AS dfc FROM ex GROUP BY tok),
    rare AS (SELECT ex.doc_id, ex.tok FROM ex JOIN dfc USING (tok)
             WHERE dfc BETWEEN 2 AND {dd.CONTAINMENT_DF_MAX}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM rare a JOIN rare b
               ON a.tok = b.tok AND a.doc_id < b.doc_id),
    v AS (SELECT cd.doc_a, cd.doc_b,
                 len(list_intersect(p.s, q.s)) AS c,
                 len(p.s) AS na, len(q.s) AS nb
          FROM cand cd
          JOIN sh p ON p.doc_id = cd.doc_a
          JOIN sh q ON q.doc_id = cd.doc_b)
    SELECT doc_a, doc_b,
           ROUND(CAST(c AS DOUBLE) / CAST(least(na, nb) AS DOUBLE), 3)
             AS containment
    FROM v
    WHERE CAST(c AS DOUBLE) / CAST(least(na, nb) AS DOUBLE)
          >= {dd.CONTAINMENT_THRESHOLD}
    ORDER BY doc_a, doc_b""",
    doc="Containment near-dup pairs — |A∩B|/min(|A|,|B|), the "
    "asymmetric measure Jaccard is blind to: a short document pasted "
    "into a long one scores J ≈ |A|/|B| ≈ 0 but containment ≈ 1, and "
    "MinHash bands (which estimate Jaccard) structurally CANNOT "
    "block for it — size-skewed pairs rarely collide. Blocking here "
    "is a rare-shingle inverted index: postings only for shingles "
    f"with document frequency in [2, {dd.CONTAINMENT_DF_MAX}], so "
    "each posting list fans out to at most df_max^2 pairs (bounded — "
    "no stop-shingle quadratic blowup) while a contained doc shares "
    "ALL its shingles with its container, so any one rare shingle "
    "collides the pair; missed only when every shared shingle is "
    "corpus-common, the documented df_max trade. Verification "
    "intersects cached shingle sets on candidates only. Plan: df "
    "census + posting self-join + two id-joins — equi-joins "
    "throughout, nothing all-pairs, the blocked-dedup scale shape.",
    bench=True,
)
def dedup_containment(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dd.containment_pairs(docs).orderBy("doc_a", "doc_b")


#: containment thresholds audited by dedup_containment_sweep — the
#: grid curate stage 2c's CONTAINMENT_THRESHOLD is picked from.
_CONTAIN_SWEEP = (0.5, 0.7, 0.8, 0.9, 0.95, 1.0)


@query(
    "dedup_containment_sweep",
    f"""WITH {_DUCK_SHINGLES},
    dfc AS (SELECT tok, COUNT(*) AS dfc FROM ex GROUP BY tok),
    rare AS (SELECT ex.doc_id, ex.tok FROM ex JOIN dfc USING (tok)
             WHERE dfc BETWEEN 2 AND {dd.CONTAINMENT_DF_MAX}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM rare a JOIN rare b
               ON a.tok = b.tok AND a.doc_id < b.doc_id),
    v AS (SELECT cd.doc_a, cd.doc_b,
                 ROUND(CAST(len(list_intersect(p.s, q.s)) AS DOUBLE)
                       / CAST(least(len(p.s), len(q.s)) AS DOUBLE), 3)
                   AS cont
          FROM cand cd
          JOIN sh p ON p.doc_id = cd.doc_a
          JOIN sh q ON q.doc_id = cd.doc_b),
    th AS (SELECT UNNEST([{', '.join(f'{t}::DOUBLE' for t in _CONTAIN_SWEEP)}]) AS t)
    SELECT t,
           CAST(SUM(CASE WHEN cont >= t THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pairs,
           CAST(COUNT(DISTINCT CASE WHEN cont >= t THEN doc_a END)
                + COUNT(DISTINCT CASE WHEN cont >= t THEN doc_b END)
                AS BIGINT) AS n_docs_touched
    FROM v, th GROUP BY t ORDER BY t""",
    doc="Containment operating-point sweep — the tuning table behind "
    "curate stage 2c's threshold (the dedup_threshold_sweep pattern "
    "applied to the asymmetric measure): from ONE rare-shingle "
    "candidate pass and ONE cached-set verify frame, the passing-pair "
    f"count and touched-doc census at every threshold in "
    f"{_CONTAIN_SWEEP} — choose the containment cut (and predict the "
    "drop volume) without re-running the posting join per candidate "
    "value. Honest scope: counts are over the df-bounded candidate "
    "set (pairs whose every shared shingle has df > df_max never "
    "block), the documented trade the R13_CURATE.md audit quantifies "
    "at 0.9. Plan: the dedup_containment shape plus a 6x explode and "
    "a 6-row aggregate.",
    bench=True,
)
def dedup_containment_sweep(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.containment_pairs(docs, threshold=0.0)
    ts = F.explode(
        F.array(*[F.lit(float(t)) for t in _CONTAIN_SWEEP])
    ).alias("t")
    hit = F.col("containment") >= F.col("t")
    return (
        pairs.select("doc_a", "doc_b", "containment", ts)
        .groupBy("t")
        .agg(
            F.sum(hit.cast("int")).cast("long").alias("n_pairs"),
            (
                F.countDistinct(F.when(hit, F.col("doc_a")))
                + F.countDistinct(F.when(hit, F.col("doc_b")))
            )
            .cast("long")
            .alias("n_docs_touched"),
        )
        .orderBy("t")
    )


@query(
    "docs_winnow_overlap",
    f"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
                      FROM documents),
    hv AS (SELECT doc_id,
                  list_transform(w, t -> ('0x' || substr(md5(t), 1, 7))::BIGINT)
                    AS v
           FROM toks WHERE len(w) >= {_K + dd.WINNOW_WINDOW - 1}),
    g AS (SELECT doc_id,
                 list_transform(range(1, len(v) - {_K - 2}), i -> {_ROLL}) AS g
          FROM hv),
    fh AS (SELECT doc_id,
                  list_distinct(list_transform(
                    range(1, len(g) - {dd.WINNOW_WINDOW - 2}),
                    j -> list_min(g[j:j+{dd.WINNOW_WINDOW - 1}]))) AS fh
           FROM g),
    ex AS (SELECT doc_id, UNNEST(fh) AS h FROM fh),
    dfc AS (SELECT h, COUNT(*) AS dfc FROM ex GROUP BY h),
    rare AS (SELECT ex.doc_id, ex.h FROM ex JOIN dfc USING (h)
             WHERE dfc BETWEEN 2 AND {dd.WINNOW_DF_MAX}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM rare a JOIN rare b
               ON a.h = b.h AND a.doc_id < b.doc_id),
    v AS (SELECT cd.doc_a, cd.doc_b,
                 len(list_intersect(p.fh, q.fh)) AS n_shared
          FROM cand cd
          JOIN fh p ON p.doc_id = cd.doc_a
          JOIN fh q ON q.doc_id = cd.doc_b)
    SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared
    FROM v WHERE n_shared >= {dd.WINNOW_MIN_SHARED}
    ORDER BY doc_a, doc_b""",
    doc="Winnowed-fingerprint partial-overlap pairs (Schleimer et al. "
    "2003 — the MOSS plagiarism-detector primitive): each window of "
    f"{dd.WINNOW_WINDOW} consecutive {_K}-gram rolling hashes "
    "contributes its MINIMUM as a fingerprint, giving the guarantee "
    "set-global sketches can't: any shared token run of length >= "
    f"{_K + dd.WINNOW_WINDOW - 1} registers at least one shared "
    "fingerprint, while density stays ~2/(w+1) of grams (~2.5x "
    "smaller inverted index than full shingles at that horizon). "
    "Pairs sharing >= "
    f"{dd.WINNOW_MIN_SHARED} distinct fingerprints are reported with "
    "their shared count — the locate-the-copied-passage complement "
    "of docs_dup_spans' excision path (the engine operator also "
    "carries per-fingerprint POSITIONS for span location; this "
    "certified view compares the hash sets). Blocking reuses the "
    f"df-bounded [2, {dd.WINNOW_DF_MAX}] rare-posting index "
    "(fan-out <= df_max^2 per posting); verification intersects "
    "cached fingerprint sets on candidates only. Plan: equi-joins "
    "throughout, nothing all-pairs.",
    bench=True,
)
def docs_winnow_overlap(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dd.winnow_overlap_pairs(docs).orderBy("doc_a", "doc_b")


SQ8_TOPK = 5
SQ8_CAND = 100


@query(
    "sim_ann_serve_ivfsq8",
    f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ix AS (SELECT UNNEST(range(1, {_DIM + 1})) AS i),
    rg AS (SELECT i, MIN(v[i]) AS lo, MAX(v[i]) AS hi FROM v, ix GROUP BY i),
    ra AS (SELECT list(lo ORDER BY i) AS lo, list(hi ORDER BY i) AS hi
           FROM rg),
    d AS (SELECT vec_id, v,
                 list_transform(range(1, {_DIM + 1}), i ->
                   CASE WHEN ra.hi[i] = ra.lo[i] THEN ra.lo[i]
                        ELSE ra.lo[i]
                             + least(greatest(floor((v[i] - ra.lo[i])
                                       / (ra.hi[i] - ra.lo[i]) * 255.0
                                       + 0.5), 0.0), 255.0)
                               * (ra.hi[i] - ra.lo[i]) / 255.0
                   END) AS dq
          FROM v, ra),
    c AS (SELECT vec_id, {_duck_ivf_dots('v')} AS dd FROM v),
    asn AS (SELECT vec_id, list_position(dd, list_max(dd)) AS lst, dd FROM c),
    q0 AS (SELECT v.v AS qv, a.lst AS p1, a.dd AS qd
           FROM v JOIN asn a USING (vec_id) WHERE vec_id = 0),
    q AS (SELECT qv, p1,
                 list_position(
                   list_transform(range(1, {sim.IVF_LISTS + 1}),
                     i -> CASE WHEN i = p1 THEN -1e18 ELSE qd[i] END),
                   list_max(
                     list_transform(range(1, {sim.IVF_LISTS + 1}),
                       i -> CASE WHEN i = p1 THEN -1e18 ELSE qd[i] END))) AS p2
          FROM q0),
    cand AS (SELECT d.vec_id,
                    {_duck_fold('dq[i] * qv[i]')}
                      / (sqrt({_duck_fold('dq[i] * dq[i]')})
                         * sqrt({_duck_fold('qv[i] * qv[i]')})) AS s_adc
             FROM d JOIN asn a ON a.vec_id = d.vec_id, q
             WHERE d.vec_id <> 0 AND (a.lst = q.p1 OR a.lst = q.p2)),
    short AS (SELECT vec_id FROM cand
              ORDER BY s_adc DESC, vec_id LIMIT {SQ8_CAND}),
    rr AS (SELECT v.vec_id,
                  {_duck_dot('v', 'qv')}
                    / (sqrt({_duck_dot('v', 'v')})
                       * sqrt({_duck_dot('qv', 'qv')})) AS sim_raw
           FROM v JOIN short USING (vec_id), q)
    SELECT vec_id, ROUND(sim_raw, 6) AS sim FROM rr
    ORDER BY sim_raw DESC, vec_id LIMIT {SQ8_TOPK}""",
    doc="IVF-SQ8 persisted serving certification — the third faiss "
    "index variant, completing the matrix: IVF-flat (full floats, "
    "sim_ann_serve_ivf) / IVF-PQ (8 B codes + codebook, "
    "sim_ann_serve_ivfpq) / THIS (dim bytes, NO codebook, one affine "
    "decode per dim): build_ivfsq8_index lands (vec_id, 64 8-bit "
    "codes) under lst=<k> IVF partitions with the trained per-dim "
    "ranges (emb_sq8_audit's quantizer) frozen in the _ann_meta.json "
    "sidecar; query_ivfsq8_index probes nprobe lists driver-side, "
    "decodes candidates IN the pruned scan from literal range arrays "
    "and scores cosine against the literal query, then exact-re-ranks "
    f"the top {SQ8_CAND} from the PRIMARY store through the shared "
    "pushed-isin path (PushedFilters In(vec_id...) asserted "
    "in-query; the serve RAISES unless the candidate scan carries "
    "non-empty PartitionFilters). I/O at scale: nprobe partitions of "
    "64-byte codes + 100 full vectors — 4x below IVF-flat with zero "
    "codebook maintenance; choose IVF-PQ when 8x more compression "
    "justifies codebook training. The oracle replays the ENTIRE "
    "route — range training, encode+decode fusion, probe arithmetic, "
    "quantized-cosine shortlist, exact re-rank. Side-effecting "
    "(scratch index, removed in-query).",
)
def sim_ann_serve_ivfsq8(spark, sf_dir):
    import re
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    scratch = tempfile.mkdtemp(prefix="annserveivfsq8_")
    try:
        sim.build_ivfsq8_index(emb, f"{scratch}/idx", tune_nprobe=False)  # query pins the parity depth
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        ]
        got = sim.query_ivfsq8_index(
            spark,
            f"{scratch}/idx",
            qv,
            emb,
            k=SQ8_TOPK,
            n_cand=SQ8_CAND,
            nprobe=sim.IVF_NPROBE,  # oracle-parity depth (SQL replays p1/p2)
            exclude_id=0,
        )
        plan = got._jdf.queryExecution().executedPlan().toString()
        if not re.search(r"PushedFilters: \[[^\]]*In\(vec_id", plan):
            raise RuntimeError(
                "IVF-SQ8 re-rank does not push the id shortlist into "
                "the primary-store scan:\n" + plan
            )
        return got.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# ---------------------------------------------------------------------------
# Corpus diversity, dedup operating points, balanced sampling (round 12)
# ---------------------------------------------------------------------------

SWEEP_THRESHOLDS = (0.5, 0.7, 0.8, 0.9)


@query(
    "dedup_threshold_sweep",
    f"""WITH {_DUCK_SHINGLES},
    {_DUCK_MINHASH_CTES},
    jac AS (SELECT CAST(c AS DOUBLE) / CAST(p.n + q.n - c AS DOUBLE) AS j
            FROM common
            JOIN cnt p ON p.doc_id = doc_a
            JOIN cnt q ON q.doc_id = doc_b),
    th AS (SELECT UNNEST([{', '.join(f'{t}::DOUBLE' for t in SWEEP_THRESHOLDS)}]) AS t)
    SELECT t,
           CAST(SUM(CASE WHEN j >= t THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs
    FROM jac, th GROUP BY t ORDER BY t""",
    doc="Dedup operating-point sweep: from ONE banded-MinHash "
    "candidate pass and ONE exact-Jaccard verify frame, the pair "
    "count at every candidate verify threshold "
    f"{SWEEP_THRESHOLDS} — the table you read to CHOOSE the dedup "
    "threshold before committing a corpus rewrite, without re-running "
    "the expensive candidate join per candidate threshold (the "
    "Jaccard score is computed once; thresholds are a conditional "
    "aggregate over an exploded literal). Honest scope: counts are "
    "over the banded candidate set (bands tuned for the 0.8 "
    "S-curve), so low thresholds undercount by the bands' recall "
    "there — this is the VERIFIER's operating curve for a fixed "
    "index, the quantity that actually governs the rewrite; "
    "dedup_lsh_recall audits the band recall itself. Plan: the "
    "dedup_minhash_lsh shape plus a 4x explode and a 4-row "
    "aggregate.",
    bench=True,
)
def dedup_threshold_sweep(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sh_docs = dd._shingle_docs(docs, "doc_id", "text").cache()
    cand = dd.minhash_candidates(sh_docs)
    jac = dd._pair_jaccard(sh_docs, cand).select(
        F.col("jaccard_raw").alias("j")
    )
    return (
        jac.select(
            F.explode(
                F.array(*[F.lit(float(t)) for t in SWEEP_THRESHOLDS])
            ).alias("t"),
            "j",
        )
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("j") >= F.col("t"), 1).otherwise(0))
            .cast("long")
            .alias("n_pairs")
        )
        .orderBy("t")
    )


@query(
    "docs_ngram_diversity",
    """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS w
                     FROM documents),
    uni AS (SELECT source, COUNT(*) AS n_tokens,
                   COUNT(DISTINCT tok) AS n_uni
            FROM (SELECT source, UNNEST(w) AS tok FROM toks)
            GROUP BY source),
    big AS (SELECT source, COUNT(*) AS n_bigrams,
                   COUNT(DISTINCT bg) AS n_big
            FROM (SELECT source,
                         UNNEST(list_transform(range(1, len(w)),
                                i -> w[i] || ' ' || w[i+1])) AS bg
                  FROM toks)
            GROUP BY source),
    nd AS (SELECT source, COUNT(*) AS n_docs FROM toks GROUP BY source)
    SELECT nd.source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_uni AS BIGINT) AS n_uni,
           CAST(n_big AS BIGINT) AS n_big,
           CAST((2 * 1000000 * n_uni + n_tokens) // (2 * n_tokens)
                AS BIGINT) AS uni_ttr_ppm,
           CAST((2 * 1000000 * n_big + n_bigrams) // (2 * n_bigrams)
                AS BIGINT) AS big_ttr_ppm
    FROM nd JOIN uni USING (source) JOIN big USING (source)
    ORDER BY source""",
    doc="Per-source n-gram diversity census — the metric a synthetic-"
    "data pipeline tracks round over round (model-generated corpora "
    "collapse in type-token ratio long before they collapse in "
    "quality scores): per source, document/token counts, distinct "
    "unigrams and bigrams, and half-up TTR ppm for both orders. "
    "Exact distinct counts (the oracle demands them; swap "
    "approx_count_distinct at 100 TB where a 2% bound suffices and "
    "the shuffle matters). Plan: two explode+distinct aggregates "
    "joined on the |sources|-row key — map-side combined, no "
    "all-pairs anything.",
    bench=True,
)
def docs_ngram_diversity(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs).select(
        "doc_id", "source", F.split("text", " ").alias("w")
    )
    uni = (
        toks.select("source", F.explode("w").alias("tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("tok").alias("n_uni"),
        )
    )
    bigrams = F.expr(
        "transform(sequence(1, size(w) - 1), i -> "
        "concat(element_at(w, i), ' ', element_at(w, i + 1)))"
    )
    big = (
        toks.select("source", F.explode(bigrams).alias("bg"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.countDistinct("bg").alias("n_big"),
        )
    )
    nd = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        nd.join(uni, "source")
        .join(big, "source")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_uni").cast("long").alias("n_uni"),
            F.col("n_big").cast("long").alias("n_big"),
            F.expr(
                "(2 * 1000000 * n_uni + n_tokens) div (2 * n_tokens)"
            ).alias("uni_ttr_ppm"),
            F.expr(
                "(2 * 1000000 * n_big + n_bigrams) div (2 * n_bigrams)"
            ).alias("big_ttr_ppm"),
        )
        .orderBy("source")
    )


#: fine-grained deterministic order for balanced downsampling.
BALANCE_ORDER_BUCKETS = 1_000_000


@query(
    "docs_balanced_sample",
    f"""WITH r AS (SELECT doc_id, lang,
                  row_number() OVER (
                    PARTITION BY lang
                    ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                             % {BALANCE_ORDER_BUCKETS},
                             doc_id) AS rk
           FROM documents),
    m AS (SELECT MIN(cnt) AS n_min FROM
            (SELECT COUNT(*) AS cnt FROM documents GROUP BY lang))
    SELECT doc_id, lang FROM r, m WHERE rk <= m.n_min
    ORDER BY lang, doc_id""",
    doc="Class-balanced downsampling — the classifier-training prep "
    "step: per language, keep exactly n_min documents (the smallest "
    "class's count), chosen by deterministic hash rank (32 md5 bits "
    "then doc_id — reproducible, coordination-free, and unbiased "
    "w.r.t. any corpus ordering, unlike LIMIT per class which keeps "
    "whatever the scan happened to read first). Every class lands "
    "equal-sized, so downstream per-class metrics (confusion, "
    "calibration) are comparable without reweighting. Plan: one "
    "|classes|-row count aggregate crossed in as a 1-row scalar "
    "(broadcast), one rank window per class partition — no data "
    "shuffled beyond the rank.",
    bench=True,
)
def docs_balanced_sample(spark, sf_dir):
    from meteo_etl_spark.functions.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        hash_bucket("doc_id", BALANCE_ORDER_BUCKETS), "doc_id"
    )
    r = docs.select(
        "doc_id", "lang", F.row_number().over(w).alias("rk")
    )
    m = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.min("cnt").alias("n_min"))
    )
    return (
        r.join(F.broadcast(m))
        .where(F.col("rk") <= F.col("n_min"))
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    )


@query(
    "docs_langid_confusion",
    f"""WITH pred AS (
      SELECT doc_id, lang AS true_lang,
             {_duck_lang_case().replace('h_', '__h_')} AS pred_lang
      FROM (SELECT doc_id, lang,
                   {', '.join(f'{expr} AS __h_{lang}' for lang, expr in _STOP_HITS.items())}
            FROM documents))
    SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY true_lang, pred_lang
    ORDER BY true_lang, pred_lang""",
    doc="Language-ID confusion census — the honesty table for the "
    "heuristic detector: text_lang_id's stopword-profile argmax "
    "scored against the corpus's labeled lang column, one "
    "(true, pred, n_docs) row per cell. A routing pipeline that "
    "branches per detected language (per-language quality rules, "
    "tokenizers, stopword lists) reads THIS before trusting the "
    "detector — per-language error rates fall straight out of the "
    "marginals, and 'und' (no stopword hits) shows up as its own "
    "column instead of silently polluting a language bucket. Plan: "
    "pure-map detection + one map-combined (true, pred) aggregate — "
    "|langs|^2-bounded output, no joins.",
    bench=True,
)
def docs_langid_confusion(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        fan_out(docs)
        .select(
            F.col("lang").alias("true_lang"),
            tx.lang_id(F.col("text")).alias("pred_lang"),
        )
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


@query(
    "dedup_source_overlap",
    f"""WITH {_DUCK_SHINGLES},
    {_DUCK_MINHASH_CTES},
    pairs AS (SELECT doc_a, doc_b
              FROM common JOIN cnt p ON p.doc_id = doc_a
                          JOIN cnt q ON q.doc_id = doc_b
              WHERE CAST(c AS DOUBLE) / CAST(p.n + q.n - c AS DOUBLE)
                    >= {dd.JACCARD_THRESHOLD}),
    lab AS (SELECT pr.doc_a, pr.doc_b,
                   least(da.source, db.source) AS source_a,
                   greatest(da.source, db.source) AS source_b
            FROM pairs pr
            JOIN documents da ON da.doc_id = pr.doc_a
            JOIN documents db ON db.doc_id = pr.doc_b)
    SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM lab GROUP BY source_a, source_b
    ORDER BY source_a, source_b""",
    doc="Cross-source near-dup overlap matrix: the verified MinHash "
    "pair set (dedup_minhash_lsh's exact route) rolled up by the "
    "UNORDERED source pair of each duplicate — 'how much of source A "
    "is already in source B', the table a mixture planner "
    "(docs_mixture_plan) needs BEFORE weighting sources: double-"
    "counting mass between two crawls inflates both weights, and the "
    "diagonal (within-source duplication) says which source needs "
    "dedup before mixing at all. Sources are ordered per pair "
    "(least/greatest) so each unordered pair lands in exactly one "
    "cell. Plan: the certified pair route + two doc_id-keyed label "
    "joins + one |sources|^2-bounded aggregate.",
    bench=True,
)
def dedup_source_overlap(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    la = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    lb = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    return (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


@query(
    "docs_unigram_vocab",
    None,  # iterative (hard-EM with driver-side cost re-estimation) —
    # rows-only check, like docs_bpe_merges; exact-model correctness is
    # pinned by tests/test_unigram.py against an independently written
    # pure-Python trainer (bit-equal model incl. integer costs), plus
    # hand-computed Viterbi pins and a partitioning-invariance run.
    doc="Unigram-LM tokenizer training end-to-end (Kudo 2018 — the "
    "SentencePiece algorithm, completing the real-world tokenizer "
    "family beside docs_bpe_merges' BPE): seed substring vocabulary "
    "from ONE corpus scan's word histogram, hard-EM alternating "
    "Arrow-batched Viterbi segmentation of the DISTINCT-word table "
    "(Python per word type, never per corpus token; the cost dict is "
    "a vocab-sized broadcast) with map-combined count re-estimation, "
    "then an alphabet-preserving prune. Costs are INTEGER micro-nats "
    "computed driver-side from vocab-sized count tables, so every "
    "Viterbi decision is exact and the model is bit-stable under any "
    "partitioning — certified by the reference-twin pytest rather "
    "than a SQL oracle (EM is not SQL-expressible). Returns the "
    "model table (piece, freq, cost_u) ordered by (freq DESC, "
    "piece). Plan: the corpus funnels through one histogram "
    "aggregate; every EM pass touches only Heaps-law-sized tables.",
)
def docs_unigram_vocab(spark, sf_dir):
    from meteo_etl_spark.functions.unigram import train_unigram_lm

    docs = load_table(spark, sf_dir, "documents")
    return train_unigram_lm(docs)


from meteo_etl_spark.functions.unigram import PIECE_MAX_LEN as _UG_MAX_LEN
from meteo_etl_spark.functions.unigram import SEED_SIZE as _UG_SEED


@query(
    "docs_unigram_seed_vocab",
    f"""WITH w AS (SELECT UNNEST(list_filter(string_split(text, ' '),
                               x -> length(x) > 0)) AS word
            FROM documents),
    h AS (SELECT word, COUNT(*) AS freq FROM w GROUP BY word),
    s AS (SELECT substring(word, i, l) AS piece, freq
          FROM h,
          UNNEST(generate_series(1, {_UG_MAX_LEN})) AS gl(l),
          UNNEST(generate_series(1, length(word) - l + 1)) AS gi(i)),
    c AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
          FROM s GROUP BY piece),
    chars AS (SELECT piece, cnt FROM c WHERE length(piece) = 1),
    multi AS (SELECT piece, cnt FROM c WHERE length(piece) > 1
              ORDER BY cnt DESC, piece LIMIT {_UG_SEED})
    SELECT piece, cnt FROM chars
    UNION ALL SELECT piece, cnt FROM multi
    ORDER BY cnt DESC, piece""",
    doc="Unigram-LM trainer, stage 1 as a hash-pinned table (r12 "
    "verdict order #3 — shrink the rows-only set): the seed "
    "substring-vocabulary census docs_unigram_vocab's hard-EM starts "
    "from — every substring of length 1..PIECE_MAX_LEN of every "
    "distinct word weighted by word frequency, the full alphabet plus "
    "the top SEED_SIZE multi-char pieces by (cnt DESC, piece). "
    "Fully SQL-expressible (the docs_bpe_pairs pattern: the iterative "
    "trainer stays rows-only, its first-stage aggregate carries a "
    "DuckDB hash). Plan: ONE corpus scan to the map-combined word "
    "histogram (Heaps' law), then a narrow substring explode over the "
    "vocab table only — corpus bytes are never re-read; the "
    "(cnt DESC, piece) total order makes the seed cut and the result "
    "partitioning-invariant.",
    bench=True,
)
def docs_unigram_seed_vocab(spark, sf_dir):
    from meteo_etl_spark.functions import unigram as ug
    from meteo_etl_spark.functions.bpe import word_histogram

    docs = load_table(spark, sf_dir, "documents")
    words = word_histogram(fan_out(docs)).select(
        "word", F.col("freq").cast("long").alias("cnt")
    )
    return ug._seed_counts(words, ug.SEED_SIZE, ug.PIECE_MAX_LEN).orderBy(
        F.desc("cnt"), "piece"
    )


@query(
    "docs_tokenizer_compare",
    None,  # both trainers are iterative (BPE merge loop / unigram
    # hard-EM) — rows-only, like their individual queries; each
    # trainer's exactness is pinned by its own reference-twin suite
    # (tests/test_bpe.py, tests/test_unigram.py), and this table's
    # accounting is pinned by tests/test_llm_ops.py.
    doc="Tokenizer family comparison — BPE (docs_bpe_merges' 8-merge "
    "model) vs unigram-LM (docs_unigram_vocab's hard-EM model) "
    "fertility on the SAME corpus: per tokenizer, corpus word count, "
    "total emitted pieces, and pieces-per-word in half-up ppm — THE "
    "table that picks a tokenizer for a training run (lower fertility "
    "= fewer sequence positions per document = cheaper training at "
    "equal context). Both encoders run at the word-HISTOGRAM level "
    "(pieces per distinct word x frequency — the corpus funnels "
    "through one scan, the comparison never re-tokenizes the corpus "
    "per tokenizer). Plan: two vocab-sized trainers + one histogram "
    "pass each + a 2-row aggregate.",
)
def docs_tokenizer_compare(spark, sf_dir):
    from meteo_etl_spark.functions import bpe
    from meteo_etl_spark.functions import unigram as ug

    docs = load_table(spark, sf_dir, "documents")
    words = (
        bpe.word_histogram(fan_out(docs))
        .select("word", F.col("freq").cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    word_docs = words.select(F.col("word").alias("text"), "cnt")

    merges = [
        (r["a"], r["b"])
        for r in bpe.bpe_train(fan_out(docs), _BPE_N_MERGES).collect()
    ]
    bpe_pieces = (
        bpe.bpe_encode(word_docs, merges)
        .select(
            (F.size("bpe_tokens") * F.col("cnt")).alias("p"),
            F.col("cnt").alias("w"),
        )
        .agg(
            F.sum("w").cast("long").alias("n_words"),
            F.sum("p").cast("long").alias("n_pieces"),
        )
        .select(F.lit("bpe").alias("tokenizer"), "n_words", "n_pieces")
    )
    model = ug.train_unigram_lm(docs)
    costs = {r["piece"]: int(r["cost_u"]) for r in model.collect()}
    bc = spark.sparkContext.broadcast(costs)

    def seg_len(batches):
        import pandas as pd

        c = bc.value
        for batch in batches:
            out = []
            for word, cnt in zip(batch["word"], batch["cnt"]):
                out.append(
                    (len(ug.viterbi_segment(str(word), c)), int(cnt))
                )
            yield pd.DataFrame(out, columns=["n", "cnt"])

    ug_pieces = (
        words.mapInPandas(seg_len, "n long, cnt long")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("n") * F.col("cnt")).cast("long").alias("n_pieces"),
        )
        .select(F.lit("unigram").alias("tokenizer"), "n_words", "n_pieces")
    )
    return (
        bpe_pieces.unionByName(ug_pieces)
        .select(
            "tokenizer",
            "n_words",
            "n_pieces",
            F.expr(
                "(2 * 1000000 * n_pieces + n_words) div (2 * n_words)"
            ).alias("fertility_ppm"),
        )
        .orderBy("tokenizer")
    )

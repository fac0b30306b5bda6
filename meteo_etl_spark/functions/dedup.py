"""Deduplication kernels for training-data pipelines.

Four families, in increasing sophistication (SURVEY.md §2.4):

- **exact** — hash-groupBy on the content hash; one shuffle on the
  digest, map-side partial agg. The 100 TB workhorse.
- **n-gram Jaccard** — word-shingle inverted index: explode distinct
  shingles, self-equi-join on the shingle, count common per pair.
  Scale note: at 100 TB you cap the index by dropping shingles whose
  document frequency exceeds a bound (they generate O(df²) pairs and
  carry no signal); not applied here because the oracle must see the
  exact result.
- **MinHash + LSH** — integer minhash signatures over integer
  shingles, banded into bucket keys; candidate pairs share ≥1 band
  bucket; candidates are then verified with the Jaccard over the same
  shingle sets (array_intersect on the cached sets — no explode/
  groupBy shuffle in the verify). The bucket join replaces the
  all-pairs shingle join — the classic sub-quadratic near-dup path.

Shingles are INTEGERS end to end: each token is hashed once
(md5→28-bit int) and a k-window rolling combine mod MINHASH_PRIME
yields the shingle key — no per-shingle string building, no
per-shingle md5, and set intersections compare 8-byte longs
(measured ~2x on the shingle stage vs string shingles at sf0.1).
Shingle identity is therefore hash identity: two distinct word
windows collide with probability ~2^-31 (~1e-5 per document pair
union) — the standard trade in production near-dup pipelines, and
the DuckDB oracle mirrors the exact same arithmetic, so results
still hash-match bit for bit.
- **SimHash** — per-token md5 bit votes folded into a B-bit sign
  vector; Hamming-band candidates (hamming ≤ max_h over ``bands``
  bands guarantees ≥1 identical band by pigeonhole — candidate
  generation is therefore lossless, not probabilistic).

Everything is JVM-side expression work (higher-order array functions
inside whole-stage codegen); md5 is used as the hash family because it
is bit-identical in the DuckDB oracle. Production swaps in xxhash64.

Reference parity: extends the reference's only dedup-like kernel — the
keyed last-write-wins upsert (`etl/load.py:45-55`, SURVEY.md U1) — to
content-defined duplicate keys.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meteo_etl_spark.operators.parallelism import fan_out

# Shared with the DuckDB oracle generators (plans/llm_queries.py).
SHINGLE_K = 3
MINHASH_HASHES = 8
MINHASH_BANDS = 4  # rows per band = MINHASH_HASHES // MINHASH_BANDS = 2
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1; (P-1)*2^28 < 2^63, ANSI-safe
JACCARD_THRESHOLD = 0.8
SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # 8 bits per band
SIMHASH_MAX_HAMMING = 3  # <= bands - 1 keeps candidate generation lossless
COSINE_DUP_THRESHOLD = 0.45


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup by content digest: one row per distinct text, the
    smallest id wins, copy count retained. Single shuffle on md5."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("digest"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


#: radix for the rolling combine of 28-bit token hashes; one
#: (h*BASE + v) step stays under 2^59 before each mod, BIGINT-safe in
#: both engines.
SHINGLE_BASE = 1 << 28


def token_hashes(tokens_col: str) -> Column:
    """One 28-bit integer per token: the first 7 hex chars of its md5.

    Takes a token-array column NAME, not text: inlining ``split()``
    here would re-execute it inside every lambda iteration (measured
    18x slower at sf0.1) — callers project the split once (see
    ``_shingle_docs``). Both engines share the conversion (Spark
    ``conv(_,16,10)``, DuckDB ``('0x'||_)::BIGINT``)."""
    return F.expr(
        f"transform({tokens_col}, "
        "t -> cast(conv(substring(md5(t), 1, 7), 16, 10) as bigint))"
    )


def shingle_rolling_expr(vals: str, i: str, k: int = SHINGLE_K) -> str:
    """The k-token rolling-combine expression (engine-portable SQL):
    ``(((v[i]*B + v[i+1]) % P)*B + v[i+2]) % P`` for k=3. Shared
    verbatim with the oracle generator so both engines run identical
    arithmetic."""
    acc = f"element_at({vals}, {i})"
    for j in range(1, k):
        acc = (
            f"(({acc}) * {SHINGLE_BASE} + element_at({vals}, {i}+{j}))"
            f" % {MINHASH_PRIME}"
        )
    return acc


def shingles(hashes_col: str, k: int = SHINGLE_K) -> Column:
    """Distinct k-window shingle KEYS (integers) from a pre-hashed
    token array (see ``token_hashes``): a k-window rolling combine mod
    MINHASH_PRIME. Docs with fewer than k tokens get an empty set.
    Takes the hash array column NAME so the md5 pass is a separate,
    once-materialized projection — inlining it here would re-hash
    every token per window."""
    roll = shingle_rolling_expr(hashes_col, "i", k)
    return F.expr(
        f"""
        CASE WHEN size({hashes_col}) >= {k} THEN
          array_distinct(transform(
            sequence(1, size({hashes_col}) - {k - 1}),
            i -> {roll}))
        ELSE array() END
        """
    )


def _shingle_docs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sh: array<bigint>) with non-empty distinct shingle-key sets.

    The input is fanned out first: the hash+shingle lambdas are the
    expensive part, and a single-split scan would otherwise run them
    on one core (measured 2.4x on the whole LSH pipeline at sf0.1;
    no-op when the scan already has enough splits). Token hashes are
    materialized as their own projection so the rolling combine
    references a computed array, never re-hashing per window.

    The short-doc filter is stated on the RAW token count, before any
    hashing (equivalent: a doc has a shingle iff it has >= k tokens).
    Filtering on ``size(sh) > 0`` instead is a 10x trap: Catalyst
    pushes the filter below the projections and inlines the whole
    hash+window pipeline into the predicate, where every element_at
    re-runs the full token-hash transform — O(tokens^2) md5 calls per
    document (measured 43s vs 4s for the LSH query at sf0.1)."""
    keep = fan_out(docs.filter(F.size(F.split(text_col, " ")) >= SHINGLE_K))
    toks = keep.select(F.col(id_col).alias("id"), F.split(text_col, " ").alias("w"))
    hashed = toks.select("id", token_hashes("w").alias("w_h"))
    return hashed.select("id", shingles("w_h").alias("sh"))


def _pair_jaccard(sh_docs: DataFrame, candidates: DataFrame | None) -> DataFrame:
    """Exact Jaccard per doc pair from the shingle inverted index.
    ``candidates`` (doc_a, doc_b) restricts the pair space (LSH path);
    None means all co-shingled pairs (exact path)."""
    if candidates is None:
        ex = sh_docs.select("id", F.explode("sh").alias("s"))
        sizes = sh_docs.select("id", F.size("sh").alias("n"))
        x = ex.alias("x")
        y = ex.alias("y")
        common = (
            x.join(y, (F.col("x.s") == F.col("y.s")) & (F.col("x.id") < F.col("y.id")))
            .groupBy(F.col("x.id").alias("doc_a"), F.col("y.id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
    else:
        # Probe only candidate pairs: pull each side's cached shingle
        # SET and intersect the two arrays directly — the intersection
        # count is exact and needs no explode/groupBy shuffle; the only
        # shuffles left are the two joins, and their build side is the
        # (small) candidate set, not the corpus.
        sa = sh_docs.select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a"))
        sb = sh_docs.select(F.col("id").alias("doc_b"), F.col("sh").alias("sh_b"))
        return (
            candidates.join(sa, "doc_a")
            .join(sb, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                F.size(F.array_intersect("sh_a", "sh_b")).alias("c"),
                F.size("sh_a").alias("na"),
                F.size("sh_b").alias("nb"),
            )
            .select(
                "doc_a",
                "doc_b",
                (
                    F.col("c").cast("double")
                    / (F.col("na") + F.col("nb") - F.col("c")).cast("double")
                ).alias("jaccard_raw"),
            )
        )

    na = sizes.withColumnRenamed("id", "doc_a").withColumnRenamed("n", "na")
    nb = sizes.withColumnRenamed("id", "doc_b").withColumnRenamed("n", "nb")
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("c").cast("double")
                / (F.col("na") + F.col("nb") - F.col("c")).cast("double")
            ).alias("jaccard_raw"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """All document pairs with shingle-set Jaccard >= threshold
    (exhaustive, via the inverted index). The shingle sets are cached
    once and shared by the pair-generation and verify stages —
    uncached, the explode side and both size joins would each
    recompute the hash+shingle pipeline."""
    sh_docs = _shingle_docs(docs, id_col, text_col).cache()
    return (
        _pair_jaccard(sh_docs, None)
        .filter(F.col("jaccard_raw") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard_raw", 3).alias("jaccard"))
    )


def minhash_params() -> list[tuple[int, int]]:
    """(a, b) per hash function for the affine family
    ``h(x) = (a*x + b) mod MINHASH_PRIME`` — md5-derived constants so
    the DuckDB oracle generator emits the identical literals."""
    out = []
    for h in range(MINHASH_HASHES):
        d = hashlib.md5(f"minhash:{h}".encode()).hexdigest()
        a = (int(d[:8], 16) % (MINHASH_PRIME - 1)) + 1  # nonzero
        b = int(d[8:16], 16) % MINHASH_PRIME
        out.append((a, b))
    return out


def minhash_band_keys(vals_col: str = "sh") -> list[Column]:
    """One md5 bucket key per LSH band over integer minhashes.

    Hash h of a document is ``min over shingle keys of (a_h*x + b_h)
    mod P`` — a multiply-add-mod per element, so the whole signature is
    k array folds of 64-bit arithmetic over the materialized shingle
    keys (a < P < 2^31 and x < 2^31, so a*x < 2^62: BIGINT-safe in
    both engines). The affine functions are pairwise independent
    enough for banding; any S-curve widening is irrelevant because
    candidates are verified with the true Jaccard anyway."""
    rows = MINHASH_HASHES // MINHASH_BANDS

    def affine_min(a: int, b: int) -> Column:
        return F.array_min(
            F.transform(
                F.col(vals_col),
                lambda x: (x * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME),
            )
        )

    mins = [affine_min(a, b) for a, b in minhash_params()]
    keys = []
    for b in range(MINHASH_BANDS):
        parts: list[Column] = []
        for r in range(rows):
            if r:
                parts.append(F.lit("|"))
            parts.append(mins[b * rows + r].cast("string"))
        keys.append(F.md5(F.concat(*parts)).alias(f"band{b}"))
    return keys


def _melted_bands(sh_docs: DataFrame) -> DataFrame:
    """(id, band, key) — one row per document per LSH band."""
    bands = sh_docs.select("id", *minhash_band_keys("sh"))
    return bands.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("key"))
                for b in range(MINHASH_BANDS)
            ])
        ).alias("bk"),
    ).select("id", "bk.band", "bk.key")


def minhash_candidates(sh_docs: DataFrame) -> DataFrame:
    """Banded-MinHash candidate pairs ``(doc_a, doc_b)``, ``a < b`` —
    ONE equi-join on (band, bucket-key), sub-quadratic. Shared by every
    verify strategy (Jaccard, edit distance): candidate generation is
    the scale-critical half; the verifier only sees ~|corpus|·fp_rate
    pairs."""
    melted = _melted_bands(sh_docs)

    a = melted.alias("a")
    b = melted.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Near-dup pairs via MinHash-LSH candidates + exact-Jaccard verify.

    Candidate generation is one equi-join on (band, bucket-key) —
    sub-quadratic; verification touches candidates only. With b=4
    bands of r=2 rows, the S-curve midpoint is (1/4)^(1/2) = 0.5, so
    pairs at the 0.8 threshold are caught with P ≈ 1-(1-0.8²)⁴ ≈ 0.98
    per sketch — and the hash family is deterministic, so the
    oracle (same pipeline in SQL) matches exactly.
    """
    sh_docs = _shingle_docs(docs, id_col, text_col).cache()
    candidates = minhash_candidates(sh_docs)
    return (
        _pair_jaccard(sh_docs, candidates)
        .filter(F.col("jaccard_raw") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard_raw", 3).alias("jaccard"))
    )


#: winnowing (Schleimer et al. 2003, the MOSS fingerprinter): window
#: of WINNOW_WINDOW consecutive k-gram hashes -> keep each window's
#: minimum. GUARANTEE: any shared token run of length >=
#: SHINGLE_K + WINNOW_WINDOW - 1 produces at least one shared
#: fingerprint; expected density ~ 2/(WINNOW_WINDOW+1) of grams.
WINNOW_WINDOW = 4
WINNOW_DF_MAX = 10
WINNOW_MIN_SHARED = 2


def winnow_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = SHINGLE_K,
    w: int = WINNOW_WINDOW,
) -> DataFrame:
    """(id, fp: array<struct<h,pos>>) winnowed fingerprints per doc —
    the POSITION-AWARE local fingerprint the set-global shingle/
    MinHash family lacks: each window of ``w`` consecutive k-gram
    hashes contributes its minimum (ties select the rightmost
    occurrence — min over struct(h, -pos)), so fingerprints are
    locally stable under edits elsewhere in the document and a match
    of length >= k+w-1 tokens ALWAYS shares one. ``pos`` is the gram
    index — enough to locate the matched span for excision/review.

    Same materialization discipline as ``_shingle_docs``: token
    hashes and the positional gram array are separate projections so
    the per-window slice arithmetic references computed arrays (the
    documented inlining trap would otherwise re-hash per window)."""
    keep = fan_out(
        docs.filter(F.size(F.split(text_col, " ")) >= k + w - 1)
    )
    toks = keep.select(
        F.col(id_col).alias("id"), F.split(text_col, " ").alias("tw")
    )
    hashed = toks.select("id", token_hashes("tw").alias("w_h"))
    roll = shingle_rolling_expr("w_h", "i", k)
    grams = hashed.select(
        "id",
        F.expr(
            f"transform(sequence(1, size(w_h) - {k - 1}), i -> {roll})"
        ).alias("g"),
    )
    fp = F.expr(
        f"""
        array_distinct(transform(
          sequence(1, size(g) - {w - 1}),
          j -> named_struct(
            'h', array_min(slice(g, j, {w})),
            'pos', j + {w}
                   - array_position(reverse(slice(g, j, {w})),
                                    array_min(slice(g, j, {w}))))))
        """
    )
    return grams.select("id", fp.alias("fp"))


def winnow_overlap_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = WINNOW_MIN_SHARED,
    df_max: int = WINNOW_DF_MAX,
) -> DataFrame:
    """Partial-overlap pairs by shared winnowed fingerprints — the
    plagiarism-detector shape: (doc_a, doc_b, n_shared) where
    n_shared counts DISTINCT shared fingerprint hashes. The winnowing
    guarantee (a shared passage of >= k+w-1 tokens always contributes
    >= 1 shared fingerprint) carries end-to-end ONLY at
    ``min_shared=1`` and within the blocking bound: the default
    ``min_shared=2`` is a precision filter that deliberately drops
    pairs sharing exactly the one guaranteed fingerprint, and a pair
    whose every shared fingerprint has document frequency > df_max is
    never blocked together. Callers that need the full MOSS-style
    guarantee horizon pass ``min_shared=1`` (and raise ``df_max``);
    the defaults trade that recall tail for a candidate set that stays
    df_max^2-bounded per posting. Blocking reuses the containment
    route's df-bounded inverted index; verification intersects the
    cached per-doc fingerprint-hash sets on candidates only.
    Winnowing's sparsity (~2/(w+1) of grams) makes this index ~2.5x
    smaller than the full shingle index at the same horizon."""
    # cache() is load-bearing, not an optimization: the fingerprint
    # expression is THREE stacked array-lambda projections (token
    # hashes -> positional grams -> window minima), and pulling an
    # explode/join lineage through them lets projection collapse
    # inline each level into every reference site — the shingles()
    # inlining trap compounded per level (measured: sf0.001 hangs).
    # One materialization evaluates the fingerprints once; every
    # downstream branch (df census, postings, verify fetches) reads
    # the cached rows. Same discipline as minhash_lsh_pairs' sh_docs.
    fps = (
        winnow_docs(docs, id_col, text_col)
        .select(
            "id",
            F.array_distinct(
                F.transform("fp", lambda x: x.getField("h"))
            ).alias("fh"),
        )
        .cache()
    )
    ex = fps.select("id", F.explode("fh").alias("h"))
    rare_keys = (
        ex.groupBy("h")
        .agg(F.count(F.lit(1)).alias("dfc"))
        .where((F.col("dfc") >= 2) & (F.col("dfc") <= df_max))
        .select("h")
    )
    rare = ex.join(rare_keys, "h")
    cand = _bounded_posting_pairs(rare, "h")
    fa = fps.select(F.col("id").alias("doc_a"), F.col("fh").alias("fh_a"))
    fb = fps.select(F.col("id").alias("doc_b"), F.col("fh").alias("fh_b"))
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("fh_a", "fh_b")).cast("long").alias(
                "n_shared"
            ),
        )
        .filter(F.col("n_shared") >= min_shared)
    )


#: containment verify threshold and the document-frequency ceiling for
#: the rare-shingle blocking index (a posting list of df docs yields
#: <= df^2 candidate pairs — bounding df bounds the fan-out).
CONTAINMENT_THRESHOLD = 0.9
CONTAINMENT_DF_MAX = 10


def _bounded_posting_pairs(rare: DataFrame, key: str) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) from an ALREADY
    df-bounded posting frame ``(id, key)`` — every two postings of a
    key pair up.

    One grouped collect + pair expansion replaces the posting
    self-join (r15 optimization: one exchange instead of the
    join's two + the same distinct, and no join-sort of the posting
    frame). Scale-safe because it runs strictly AFTER the df census
    has discarded hot keys: ``collect_set`` holds <= df_max ids per
    key by construction (the census+join stays the first pass exactly
    so no stop-key's postings are ever aggregated or shuffled here),
    and the expanded pair array is <= df_max^2/2 elements."""
    return (
        rare.groupBy(key)
        .agg(F.collect_set("id").alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, x -> "
                    "transform(filter(ids, y -> x < y), "
                    "y -> named_struct('doc_a', x, 'doc_b', y))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = CONTAINMENT_THRESHOLD,
    df_max: int = CONTAINMENT_DF_MAX,
) -> DataFrame:
    """Near-dup pairs by shingle CONTAINMENT — |A∩B| / min(|A|, |B|)
    — the asymmetric measure symmetric Jaccard is blind to: a short
    document pasted inside a much longer one scores J ≈ |A|/|B| ≈ 0
    but containment ≈ 1. The complement of `minhash_lsh_pairs` in the
    dedup family (MinHash estimates Jaccard, so its bands CANNOT
    block for containment — size-skewed pairs rarely collide).

    Blocking: a RARE-shingle inverted index — only shingles with
    document frequency in [2, df_max] emit postings, so each posting
    list yields at most df_max^2 candidate pairs (bounded fan-out; no
    stop-shingle quadratic blowup), while a contained document shares
    ALL its shingles with its container, so any of its rare shingles
    suffices to collide the pair. Missed only when every shared
    shingle is common (df > df_max) — raise df_max to trade cost for
    that tail. Verification intersects the two cached shingle SETS on
    candidates only (the `_pair_jaccard` candidate path discipline).
    Shuffles: one df census, one posting self-join, two id-joins —
    all equi-joins, nothing all-pairs."""
    # cache() the shingle sets (the minhash_lsh_pairs discipline):
    # the df census, the posting join, and BOTH verify fetches read
    # this frame — uncached, each branch re-runs the full hash+window
    # pipeline (measured 79 s vs ~3 s at sf0.1).
    sh_docs = _shingle_docs(docs, id_col, text_col).cache()
    ex = sh_docs.select("id", F.explode("sh").alias("s"))
    rare_keys = (
        ex.groupBy("s")
        .agg(F.count(F.lit(1)).alias("dfc"))
        .where((F.col("dfc") >= 2) & (F.col("dfc") <= df_max))
        .select("s")
    )
    rare = ex.join(rare_keys, "s")
    cand = _bounded_posting_pairs(rare, "s")
    sa = sh_docs.select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh_docs.select(F.col("id").alias("doc_b"), F.col("sh").alias("sh_b"))
    cont = F.col("c").cast("double") / F.least("na", "nb").cast("double")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("c"),
            F.size("sh_a").alias("na"),
            F.size("sh_b").alias("nb"),
        )
        .select("doc_a", "doc_b", cont.alias("containment_raw"))
        .filter(F.col("containment_raw") >= threshold)
        .select(
            "doc_a",
            "doc_b",
            F.round("containment_raw", 3).alias("containment"),
        )
    )


EDIT_RATIO_THRESHOLD = 0.9


def edit_distance_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_ratio: float = EDIT_RATIO_THRESHOLD,
) -> DataFrame:
    """Near-dup pairs by normalized edit distance, LSH-blocked.

    Levenshtein is the sharpest near-dup verifier (it sees token-order
    and small in-place edits that set-based Jaccard misses) but its DP
    is O(len_a·len_b) per pair — unusable all-pairs. Blocking with the
    same banded-MinHash equi-join as ``minhash_lsh_pairs`` confines the
    DP to candidate pairs only, so the expensive kernel runs on
    ~|corpus|·fp_rate rows, never n². similarity = 1 - lev/max(len):
    integer ops + one correctly-rounded IEEE division, so the DuckDB
    oracle (native levenshtein) matches bit-for-bit.
    """
    sh_docs = _shingle_docs(docs, id_col, text_col)
    cand = minhash_candidates(sh_docs)
    ta = docs.select(F.col(id_col).alias("doc_a"), F.col(text_col).alias("ta"))
    tb = docs.select(F.col(id_col).alias("doc_b"), F.col(text_col).alias("tb"))

    # Two exact prunes keep the DP kernel off pairs that cannot pass:
    # 1. length band — lev >= |len_a - len_b|, so ratio >= min_ratio
    #    REQUIRES |len_a - len_b| <= (1-min_ratio)·max(len). A pure
    #    length comparison, applied before the kernel.
    # 2. banded kernel — levenshtein(l, r, k) runs the O(n·k) banded
    #    algorithm and returns -1 once the distance provably exceeds k.
    #    The bound must dominate every per-pair bound to stay exact:
    #    k = (1-min_ratio)·(max corpus length). Surviving pairs have
    #    lev <= their per-pair bound < k, so their distance is exact;
    #    -1 rows are exactly the pairs the ratio filter would drop.
    #    (Scalar max-length fetch: one aggregate row, not a collect of
    #    data.)
    la, lb = F.length("ta"), F.length("tb")
    max_len = docs.agg(F.max(F.length(text_col))).collect()[0][0] or 0
    k_band = int((1.0 - min_ratio) * max_len) + 1
    ratio = F.lit(1.0) - (F.col("lev") * F.lit(1.0)) / F.greatest(
        F.length("ta"), F.length("tb")
    )
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .filter(F.abs(la - lb) <= (F.lit(1.0) - F.lit(min_ratio)) * F.greatest(la, lb))
        .select(
            "doc_a",
            "doc_b",
            "ta",
            "tb",
            F.levenshtein("ta", "tb", k_band).cast("long").alias("lev"),
        )
        .filter(F.col("lev") >= 0)
        .select("doc_a", "doc_b", "lev", ratio.alias("ratio_raw"))
        .filter(F.col("ratio_raw") >= min_ratio)
        .select(
            "doc_a",
            "doc_b",
            "lev",
            (F.floor(F.col("ratio_raw") * 1000 + F.lit(0.5)) / 1000).alias("similarity"),
        )
    )


def simhash_from_hashes(hashes_col: str, bits: int = SIMHASH_BITS) -> Column:
    """B-bit SimHash as a '0'/'1' string over a pre-hashed token column
    (array of md5 hex strings): hex char b of each token hash votes bit
    b up when its high nibble bit is set (hex >= '8', i.e. ascii >= 56
    covers '8','9','a'-'f'); bit = 1 iff the vote sum is positive.

    Takes token *hashes*, not text: each of the B bit expressions folds
    over the array, so an inlined ``transform(split(...), md5)`` would
    be re-executed B times per row (see shingles() for the same
    pitfall). String form keeps the oracle portable; production packs
    into a BIGINT."""
    bit_exprs = ", ".join(
        f"if(aggregate({hashes_col}, 0, (a, h) -> a + if(ascii(substring(h, {b}, 1)) >= 56, 1, -1)) > 0, '1', '0')"
        for b in range(1, bits + 1)
    )
    return F.expr(f"concat({bit_exprs})")


def simhash_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, sim) — tokens are split+md5-hashed once in a projection,
    then the B bit-folds run over the materialized hash array."""
    hashed = fan_out(docs).select(
        F.col(id_col).alias("id"),
        F.transform(F.split(text_col, " "), F.md5).alias("hs"),
    )
    return hashed.select("id", simhash_from_hashes("hs").alias("sim"))


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = SIMHASH_MAX_HAMMING,
) -> DataFrame:
    """Document pairs with SimHash Hamming distance <= max_hamming.

    Candidates come from exact-match joins on ``SIMHASH_BANDS`` bit
    bands: any pair within max_hamming <= bands-1 differs in at most
    bands-1 bands, so at least one band matches exactly (pigeonhole) —
    candidate generation is lossless, and the verify step just computes
    the true distance."""
    width = SIMHASH_BITS // SIMHASH_BANDS
    sims = simhash_docs(docs, id_col, text_col).cache()
    melted = sims.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.substring("sim", b * width + 1, width).alias("key"),
                )
                for b in range(SIMHASH_BANDS)
            ])
        ).alias("bk"),
    ).select("id", "bk.band", "bk.key")

    a = melted.alias("a")
    b = melted.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )
    sa = sims.select(F.col("id").alias("doc_a"), F.col("sim").alias("sim_a"))
    sb = sims.select(F.col("id").alias("doc_b"), F.col("sim").alias("sim_b"))
    hamming = F.expr(
        f"aggregate(sequence(1, {SIMHASH_BITS}), 0, "
        "(a, i) -> a + if(substring(sim_a, i, 1) = substring(sim_b, i, 1), 0, 1))"
    )
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


#: block count for the pair-space equi-join; at 100 TB size this so
#: one block of vectors fits a task's memory (replication cost is
#: O(n * blocks) shuffle rows).
EMBEDDING_PAIR_BLOCKS = 8


def embedding_cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = COSINE_DUP_THRESHOLD,
    blocks: int = EMBEDDING_PAIR_BLOCKS,
) -> DataFrame:
    """Embedding near-dup pairs: cosine >= threshold, exact over all
    pairs.

    The pair space is enumerated by a BLOCKED EQUI-JOIN, never a
    nested-loop cross join: each vector lands in block
    ``pmod(xxhash64(id), blocks)``; covering every block pair
    (i, j), i <= j replicates a row once per task its block joins
    (O(n·blocks) shuffle rows), and the join itself is a shuffled
    equi-join on the task id — blocks·(blocks+1)/2 independent tasks,
    bounded task memory, no corpus broadcast. Identical pairs to a
    cross join (complete and deterministic), but the plan survives a
    corpus that does not fit one executor.

    The O(n²) *compute* is inherent to an exact low-threshold sweep
    (0.45 cosine ≈ 63° — sign-LSH recall there is ~35%/table, so
    bucketing cannot be exact). For high-threshold dedup (>= ~0.9)
    use the sub-quadratic candidate routes instead:
    similarity.ann_lsh_topk / ann_ivf_topk / build_lsh_index.

    Norms are computed once per vector before replication."""
    from meteo_etl_spark.functions.similarity import dot, norm

    v = F.col(vec_col).cast("array<double>")
    blk = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(blocks)).cast("int")
    sided = fan_out(emb).select(
        F.col(id_col).alias("id"), v.alias("v"), norm(v).alias("nrm"), blk.alias("blk")
    )

    def task_id(i: Column, j: Column) -> Column:
        return F.concat_ws(":", i.cast("string"), j.cast("string"))

    # Row of block b participates as LEFT in tasks (b, j), j >= b and
    # as RIGHT in tasks (i, b), i <= b.
    left = sided.select(
        F.col("id").alias("id_l"),
        F.col("v").alias("v_l"),
        F.col("nrm").alias("nrm_l"),
        F.col("blk").alias("blk_l"),
        F.explode(
            F.transform(
                F.sequence(F.col("blk"), F.lit(blocks - 1)),
                lambda j: task_id(F.col("blk"), j),
            )
        ).alias("task"),
    )
    right = sided.select(
        F.col("id").alias("id_r"),
        F.col("v").alias("v_r"),
        F.col("nrm").alias("nrm_r"),
        F.col("blk").alias("blk_r"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("blk")),
                lambda i: task_id(i, F.col("blk")),
            )
        ).alias("task"),
    )

    sim = dot(F.col("v_l"), F.col("v_r")) / (F.col("nrm_l") * F.col("nrm_r"))
    return (
        left.join(right, "task")
        # same-block task (i,i): order ids to emit each pair once and
        # never self-pairs; cross-block tasks pair each row exactly once.
        .filter((F.col("blk_l") != F.col("blk_r")) | (F.col("id_l") < F.col("id_r")))
        .select(
            F.least("id_l", "id_r").alias("vec_a"),
            F.greatest("id_l", "id_r").alias("vec_b"),
            sim.alias("cos_raw"),
        )
        .filter(F.col("cos_raw") >= threshold)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cos"))
    )


#: sign-band LSH shape: 8 bands of 8 consecutive sign bits (the full
#: 64-dim sign code, byte-aligned). Random-pair collision per band is
#: 2^-8, so the candidate fraction on an unstructured corpus is
#: ~1-(1-2^-8)^8 = 3.1% of all pairs — the sub-quadratic regime.
EMB_SIGNBAND_BANDS = 8
EMB_SIGNBAND_BITS = 8
EMB_SIGNBAND_THRESHOLD = 0.4


def embedding_signband_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = EMB_SIGNBAND_THRESHOLD,
    n_bands: int = EMB_SIGNBAND_BANDS,
    band_bits: int = EMB_SIGNBAND_BITS,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs via sign-band LSH candidates + exact
    cosine verify — the SUB-QUADRATIC route `embedding_cosine_pairs`'s
    docstring points to: candidates are pairs agreeing on ALL
    ``band_bits`` sign bits of ANY band (one equi-join on
    (band, band_value), exactly `simhash_pairs`'s banding applied to
    the embedding's sign code instead of the text SimHash), and the
    exact cosine kernel runs on candidates only.

    Recall is the banded S-curve 1-(1-p^bits)^bands with p =
    1 - theta/pi per bit: ~1.0 at cosine 0.9 (p=.90), 0.22 at the 0.4
    sweep this corpus's weak neighbor structure forces — use the
    blocked-exact sweep when the threshold is that low, and THIS
    route when near-dup-grade thresholds (>= ~0.9) make bucketing
    sound. The shuffle is O(n*bands) tiny (id, band, value) rows plus
    two id-joins for the verify fetch; vectors are never replicated
    into the pair space and no all-pairs structure exists anywhere.

    Same output shape as `embedding_cosine_pairs` (vec_a, vec_b,
    cos); the registered `dedup_embedding_bitlsh` query hash-checks
    the full route against a DuckDB replay.

    ``dim`` (default: the corpus-wide ``EMBEDDING_DIM``) guards the
    band layout: the code reads sign bits at positions 1..
    n_bands*band_bits, so a vector shorter than that would silently
    quantize missing dims to 0 (element_at null) and dims beyond band
    coverage are ignored — band coverage exceeding ``dim`` raises
    instead of degrading recall silently (the build_ivfsq8_index
    range-validation rule)."""
    from meteo_etl_spark.functions.similarity import EMBEDDING_DIM, dot, norm

    if dim is None:
        dim = EMBEDDING_DIM
    if n_bands * band_bits > dim:
        raise ValueError(
            f"sign-band layout {n_bands}x{band_bits} covers "
            f"{n_bands * band_bits} dims but vectors have {dim} — "
            "bits beyond the vector would silently quantize to 0; "
            "shrink n_bands/band_bits or pass the true dim"
        )

    v = F.col(vec_col).cast("array<double>")
    base = fan_out(emb).select(
        F.col(id_col).alias("id"), v.alias("v"), norm(v).alias("nrm")
    )

    def band_val(b: int) -> Column:
        acc = None
        for i in range(band_bits):
            bit = F.when(
                F.element_at(F.col("v"), b * band_bits + i + 1) > 0,
                F.lit(1 << i),
            ).otherwise(F.lit(0))
            acc = bit if acc is None else acc + bit
        return acc

    bands = base.select(
        "id",
        F.posexplode(F.array(*[band_val(b) for b in range(n_bands)])).alias(
            "band", "val"
        ),
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = base.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    vb = base.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            F.col("id_a").alias("vec_a"),
            F.col("id_b").alias("vec_b"),
            sim.alias("cos_raw"),
        )
        .filter(F.col("cos_raw") >= threshold)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cos"))
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: per training doc, the number of
    distinct k-token shingles it shares with the eval corpus.

    (id, n_overlap) for EVERY row of ``docs`` — short documents
    (< SHINGLE_K tokens, no shingles) are trivially clean. Filter
    ``n_overlap == 0`` to keep the untainted set.

    Scale shape: the eval side is tiny next to a 100 TB corpus, so its
    distinct shingle-key set is BROADCAST and the overlap test is a
    map-side semi join on the exploded training shingles — no shuffle
    of the corpus, one partial-agg count per doc (shingle sets are
    already distinct per doc, so plain count == distinct count).
    """
    train_sh = _shingle_docs(docs, id_col, text_col)
    eval_keys = (
        _shingle_docs(eval_docs, id_col, text_col)
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    hits = (
        train_sh.select("id", F.explode("sh").alias("s"))
        .join(F.broadcast(eval_keys), "s", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(hits, "id", "left").select(
        "id", F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap")
    )


def fuzzy_decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Fuzzy benchmark decontamination: flag training docs that are
    NEAR-duplicates (Jaccard >= threshold) of any eval doc — catches
    paraphrased/lightly-edited benchmark leakage that the exact-shingle
    ``decontaminate`` misses.

    Per training doc: ``(id, n_matches, max_jaccard, contaminated)``
    over EVERY row of ``docs`` (clean docs report 0 matches).

    Scale shape: the eval corpus is tiny next to a 100 TB training
    corpus, so BOTH eval probes are broadcast — candidate generation is
    a map-side (band, key) equi-join against the eval band table, and
    the Jaccard verify joins each candidate to the broadcast eval
    shingle sets; the training corpus is shingled once and never
    shuffled. Candidates are ~|corpus|·bands·collision_rate rows; the
    exact verify touches only those.
    """
    train_sh = _shingle_docs(docs, id_col, text_col)
    eval_sh = _shingle_docs(eval_docs, id_col, text_col)
    evb = _melted_bands(eval_sh).select(
        F.col("id").alias("eval_id"), "band", "key"
    )
    cand = (
        _melted_bands(train_sh)
        .join(F.broadcast(evb), ["band", "key"])
        .select("id", "eval_id")
        .distinct()
    )
    sa = train_sh.select("id", F.col("sh").alias("sh_a"))
    sb = eval_sh.select(F.col("id").alias("eval_id"), F.col("sh").alias("sh_b"))
    c = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = c.cast("double") / (
        F.size("sh_a") + F.size("sh_b") - c
    ).cast("double")
    hits = (
        cand.join(sa, "id")
        .join(F.broadcast(sb), "eval_id")
        .select("id", jac.alias("jaccard_raw"))
        .filter(F.col("jaccard_raw") >= threshold)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.round(F.max("jaccard_raw"), 3).alias("max_jaccard"),
        )
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(hits, "id", "left").select(
        "id",
        F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
        F.coalesce("max_jaccard", F.lit(0.0)).alias("max_jaccard"),
        F.col("n_matches").isNotNull().alias("contaminated"),
    )


# --- incremental near-dup: new batch vs persisted corpus index -------------


def build_minhash_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the corpus's MinHash-LSH index for incremental dedup.

    Two co-located tables under ``path``:

    - ``bands/``  — (id, band, key), partitioned by band and clustered
      (sortWithinPartitions) on key: the probe join's build side, with
      tight parquet row-group stats on the bucket key;
    - ``shingles/`` — (id, sh), the cached shingle sets for exact
      verification of candidates.

    At 100 TB this is the pattern that makes per-batch dedup
    incremental: the index is written once per corpus revision, and a
    new-batch probe touches only matching (band, key) row groups
    instead of re-shingling the whole corpus per batch.
    """
    sh_docs = _shingle_docs(docs, id_col, text_col).cache()
    bands = sh_docs.select("id", *minhash_band_keys("sh"))
    melted = bands.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("key"))
                for b in range(MINHASH_BANDS)
            ])
        ).alias("bk"),
    ).select("id", "bk.band", "bk.key")
    (
        melted.repartition("band")
        .sortWithinPartitions("key")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(f"{path}/bands")
    )
    sh_docs.write.mode("overwrite").parquet(f"{path}/shingles")
    sh_docs.unpersist()


def incremental_minhash_pairs(
    spark,
    new_docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Near-dup pairs (corpus_id, new_id, jaccard) between a NEW batch
    and the persisted corpus index — no corpus re-shingling.

    The probe is an equi-join on (band, key) against the bands table;
    candidates are verified exactly via array_intersect of the cached
    corpus shingle sets with the batch's. Batch-internal duplicates
    are minhash_lsh_pairs' job — this reports cross pairs only.
    """
    new_sh = _shingle_docs(new_docs, id_col, text_col).cache()
    new_bands = new_sh.select("id", *minhash_band_keys("sh"))
    new_melted = new_bands.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("key"))
                for b in range(MINHASH_BANDS)
            ])
        ).alias("bk"),
    ).select(F.col("id").alias("new_id"), "bk.band", "bk.key")

    idx = spark.read.parquet(f"{index_path}/bands")
    candidates = (
        idx.join(new_melted, ["band", "key"])
        .select(F.col("id").alias("corpus_id"), "new_id")
        .distinct()
    )

    corpus_sh = spark.read.parquet(f"{index_path}/shingles").select(
        F.col("id").alias("corpus_id"), F.col("sh").alias("sh_a")
    )
    batch_sh = new_sh.select(F.col("id").alias("new_id"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        candidates.join(corpus_sh, "corpus_id")
        .join(batch_sh, "new_id")
        .select("corpus_id", "new_id", jac.alias("jaccard_raw"))
        .filter(F.col("jaccard_raw") >= threshold)
        .select("corpus_id", "new_id", F.round("jaccard_raw", 3).alias("jaccard"))
    )


def append_minhash_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incremental growth of the persisted MinHash index: shingle and
    band ONLY the new docs and append under the same layout
    (``bands/`` partitioned by band, ``shingles/``). The corpus is
    never re-shingled; ids must be new (the index has no replace verb
    — rebuild for mutation-heavy corpora)."""
    sh_docs = _shingle_docs(docs, id_col, text_col).cache()
    bands = sh_docs.select("id", *minhash_band_keys("sh"))
    melted = bands.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("key"))
                for b in range(MINHASH_BANDS)
            ])
        ).alias("bk"),
    ).select("id", "bk.band", "bk.key")
    (
        melted.repartition("band")
        .sortWithinPartitions("key")
        .write.mode("append")
        .partitionBy("band")
        .parquet(f"{path}/bands")
    )
    sh_docs.write.mode("append").parquet(f"{path}/shingles")
    sh_docs.unpersist()


def online_dedup_batch(
    spark,
    batch: DataFrame,
    index_path: str,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
) -> dict:
    """One round of ONLINE near-dup ingestion (the daily-crawl loop):

    1. batch-internal near-dups via minhash_lsh_pairs (greedy
       keep-lowest-id: the higher id of each pair drops);
    2. survivors probe the persisted corpus index — candidates from
       the (band, key) equi-join only, no corpus re-shingle; any match
       drops the new doc (the corpus always wins cross-batch);
    3. novel docs append to ``out_path`` AND their signatures append
       to the index, so the NEXT batch dedups against them too.

    Returns ``{"n_in", "n_batch_dup", "n_corpus_dup", "n_kept"}``.
    Exactly-once on the corpus table comes from the caller's
    checkpointing (foreachBatch redelivery re-runs step 2, where the
    now-indexed docs self-match and drop — idempotent by construction
    at threshold <= 1.0 self-similarity)."""
    batch = batch.cache()
    n_in = batch.count()
    if n_in == 0:
        return {"n_in": 0, "n_batch_dup": 0, "n_corpus_dup": 0, "n_kept": 0}

    internal = minhash_lsh_pairs(batch, id_col, text_col, threshold)
    batch_dups = internal.select(F.col("doc_b").alias(id_col)).distinct()
    n_batch_dup = batch_dups.count()
    stage1 = batch.join(batch_dups, id_col, "left_anti").cache()

    import os

    if os.path.isdir(f"{index_path}/bands"):
        cross = incremental_minhash_pairs(
            spark, stage1, index_path, id_col, text_col, threshold
        )
        corpus_dups = cross.select(F.col("new_id").alias(id_col)).distinct()
        n_corpus_dup = corpus_dups.count()
        novel = stage1.join(corpus_dups, id_col, "left_anti").cache()
    else:
        n_corpus_dup = 0
        novel = stage1

    n_kept = novel.count()
    if n_kept:
        novel.write.mode("append").parquet(out_path)
        if os.path.isdir(f"{index_path}/bands"):
            append_minhash_index(novel, index_path, id_col, text_col)
        else:
            build_minhash_index(novel, index_path, id_col, text_col)
    # Long-running streams call this per micro-batch: release every
    # cache pinned this round so executor storage stays O(batch).
    if novel is not stage1:
        novel.unpersist()
    stage1.unpersist()
    batch.unpersist()
    return {
        "n_in": n_in,
        "n_batch_dup": n_batch_dup,
        "n_corpus_dup": n_corpus_dup,
        "n_kept": n_kept,
    }


def dedup_stream_foreach_batch(
    spark,
    index_path: str,
    out_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
    stats: list | None = None,
):
    """``foreachBatch`` body wrapping :func:`online_dedup_batch` — the
    streaming ingestion shape: each micro-batch of crawled docs is
    near-dup-filtered against itself and the ever-growing corpus
    index, and only novel docs land. Pass a list as ``stats`` to
    collect the per-batch accounting dicts."""

    def handle(batch_df, batch_id: int) -> None:
        s = online_dedup_batch(
            spark, batch_df, index_path, out_path, id_col, text_col, threshold
        )
        if stats is not None:
            stats.append({"batch_id": batch_id, **s})

    return handle


#: gram width for substring-level dedup (reference point: Lee et al.
#: 2022, "Deduplicating Training Data Makes Language Models Better",
#: which excises duplicated substrings of >= 50 tokens via a suffix
#: array; the synthetic corpus here has ~54-token docs, so the
#: certified width is 8 — the MECHANISM is width-independent).
SUBSTR_W = 8

#: a gram whose corpus-wide occurrence count reaches this takes the
#: broadcast (hot) path in duplicate_span_cover instead of the hashed
#: probe join — the skew cap for boilerplate grams. Below it, a key's
#: probe group fits any reducer (4096 rows x ~50 B ≈ 200 KB). The
#: number of distinct grams that can EXCEED it is bounded by
#: total_gram_occurrences / HOT_GRAM_MIN (pigeonhole) — which is NOT
#: intrinsically broadcast-small: at 10^13 occurrences an adversarial
#: corpus packed with distinct just-over-threshold grams pigeonholes
#: to billions of hot rows. duplicate_span_cover therefore ESCALATES
#: the effective threshold to ceil(total_occurrences/MAX_HOT_GRAMS)
#: whenever the static cap cannot prove the broadcast bound, trading
#: a larger (but still capped) hashed-probe fan-in for a provably
#: bounded hot side.
HOT_GRAM_MIN = 4096

#: hard row ceiling for the hot-gram broadcast (~2M rows x ~60 B ≈
#: 128 MB — comfortably under driver/executor broadcast limits). The
#: escalation above guarantees the hot side never exceeds it.
MAX_HOT_GRAMS = 1 << 21


def gram_occurrences(
    base: DataFrame,
    *,
    width: int = SUBSTR_W,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pos, hh) for every ``width``-token gram occurrence: one
    Generate over the tokenized docs (no shuffle), gram keyed by
    ``md5`` — a fixed 32-byte shuffle key regardless of gram length.
    ``base`` is the tokenized frame from :func:`duplicate_span_cover`
    (columns ``id_col, w, n_tok``)."""
    pos_seq = F.when(
        F.col("n_tok") >= width,
        F.sequence(F.lit(0), (F.col("n_tok") - width).cast("int")),
    ).otherwise(F.expr("cast(array() as array<int>)"))
    return base.select(
        id_col, "w", F.explode(pos_seq).alias("pos")
    ).select(
        id_col,
        F.col("pos").cast("long").alias("pos"),
        F.md5(
            F.array_join(F.slice("w", F.col("pos") + 1, width), " ")
        ).alias("hh"),
    )


def duplicated_gram_stats(
    grams: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """Per DUPLICATED gram (count >= 2): ``(hh, cnt, canon)`` where
    ``canon`` is the canonical occurrence — the (id, pos)-least one.
    One ``groupBy`` whose ``count``/``min(struct)`` both combine
    map-side, so a boilerplate gram repeated across a large corpus
    share reaches the reduce task as at most one partial row per map
    task — this aggregate is where the hot-gram cap lives, replacing
    the unsplittable per-gram ``row_number()`` window the r7/r8
    formulation used."""
    return (
        grams.groupBy("hh")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("canon"),
        )
        .where(F.col("cnt") >= 2)
    )


def duplicate_span_cover(
    docs: DataFrame,
    *,
    width: int = SUBSTR_W,
    id_col: str = "doc_id",
    text_col: str = "text",
    hot_min_count: int = HOT_GRAM_MIN,
    max_hot_grams: int = MAX_HOT_GRAMS,
    total_occurrences: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Substring-level duplicate detection: token positions covered by
    NON-CANONICAL occurrences of any ``width``-token gram that appears
    more than once in the corpus (across documents or within one).

    The Spark-first re-expression of suffix-array substring dedup
    (Lee et al. 2022): instead of one global suffix array (a single
    O(corpus) sort no executor can hold), slide a width-token window
    over every document (one Generate, no shuffle), key each gram by
    ``md5`` (fixed 32-byte shuffle key regardless of gram length),
    then reduce each gram to ``(cnt, canonical occurrence)`` with ONE
    map-side-combinable aggregate (:func:`duplicated_gram_stats`) —
    the (id, pos)-least occurrence is canonical, every other
    occurrence of a duplicated gram is a duplicate ("duplicated, stop
    counting": rank beyond 1 is irrelevant since every non-canonical
    occurrence is excised anyway). Each duplicate occurrence marks its
    ``width`` positions; overlapping marks from a run of duplicated
    grams collapse via one distinct. The pair space is never
    materialized: cost is O(total tokens) rows through hash shuffles
    only — never all-pairs, no sort of the full corpus, and ids stay
    ``(doc_id, pos)`` pairs end to end — no packed-BIGINT encoding to
    overflow on 63-bit doc ids.

    Skew (the 100 TB hazard this formulation exists for): a
    boilerplate gram repeated across a large corpus share is harmless
    in the aggregate (partial ``count``/``min`` collapse it map-side
    to one row per map task) but would still flood one reducer on the
    occurrence→canonical PROBE join — so the duplicated-gram table is
    split at an EFFECTIVE threshold: grams below it probe through the
    hashed join (per-key group bounded by the threshold), grams at or
    above it join by BROADCAST. The hot side's row count is bounded by
    total_gram_occurrences / threshold (pigeonhole) — a bound that the
    static ``hot_min_count`` alone cannot keep broadcast-safe on an
    adversarial corpus (billions of distinct just-over-threshold
    grams at 10^13 occurrences), so the effective threshold is
    ``max(hot_min_count, ceil(total_occurrences / max_hot_grams))``:
    the broadcast provably never exceeds ``max_hot_grams`` rows
    (~128 MB at the default), and when escalation fires the cost
    surfaces honestly as a larger (still capped) hashed-probe fan-in
    plus a ``UserWarning``. The guard is FREE: the gram-occurrence
    frame is materialized once anyway (lazy ``localCheckpoint``,
    MEMORY_AND_DISK — the census and both probe joins all read it;
    uncheckpointed, one rewrite plan re-ran the tokenize+md5 Generate
    3x, measured r15), and its row count IS the occurrence total the
    pigeonhole bound needs, so counting the checkpoint doubles as its
    fill job — no separate guard pass. No reduce task ever receives a
    hot gram's occurrence fan-in. The earlier window formulation
    (``row_number()`` per gram) had no such split point — a window
    partition cannot be divided. Checkpoint blocks are per-invocation
    state only — dropped with the DataFrames, never a cross-run
    cache.

    Returns ``(base, covered)``: ``base`` = one row per doc with its
    token array ``w`` and token count ``n_tok``; ``covered`` = the
    distinct ``(id_col, p)`` duplicated positions.

    ``width`` trades recall for shuffle volume exactly as the stride
    parameter does in chunk-level dedup. True 50-token-minimum
    Lee-style spans come from running at width=50: any duplicated
    substring of length >= 50 contains a duplicated 50-gram, so
    coverage is identical on the shared positions.
    """
    if max_hot_grams < 1:
        raise ValueError(
            f"max_hot_grams must be >= 1, got {max_hot_grams} — it is "
            "the broadcast row bound the escalation divides by (there "
            "is no 'disable the hot side' value; set hot_min_count "
            "high to keep grams on the hashed-probe path)"
        )
    if hot_min_count < 2:
        raise ValueError(
            f"hot_min_count must be >= 2, got {hot_min_count} — a gram "
            "seen once is never a duplicate, so a lower threshold "
            "would route unique grams into the hot broadcast"
        )
    w = F.split(F.col(text_col), " ")
    # Materialize the tokenized frame ONCE (lazy local checkpoint):
    # the guard aggregate, the gram lineage, the caller's posexplode
    # and the final per-doc join all consume `base` — uncheckpointed,
    # each consumer re-scans the parquet and re-splits every document
    # (6 scan+tokenize passes in one rewrite plan, measured). The
    # checkpoint stores MEMORY_AND_DISK blocks sized by the tokenized
    # corpus — the standard materialize-what-every-branch-reads trade
    # (guide §5); it is per-invocation state, never a cross-run cache.
    base = (
        fan_out(docs)
        .select(F.col(id_col), w.alias("w"), F.size(w).alias("n_tok"))
    )
    # Materialize the gram occurrences once (lazy localCheckpoint,
    # MEMORY_AND_DISK): the duplicated-gram aggregate and BOTH probe
    # branches (cold hashed join + hot broadcast join) read `grams` —
    # uncheckpointed, the tokenize+md5-gram Generate ran 3x per plan
    # (measured r15: rewrite noop 4.75 -> 2.87 s at sf0.1). The blocks
    # hold the same (id, pos, hh) bytes the gram shuffle already
    # carries, stored once instead of recomputed per branch;
    # per-invocation state only, never a cross-run cache. (The
    # tokenized `base` frame is deliberately NOT checkpointed: its
    # consumers prune columns and a parquet re-scan + split is cheaper
    # than storing every token array — measured slower when tried.)
    grams = gram_occurrences(base, width=width, id_col=id_col).localCheckpoint(
        eager=False
    )
    # broadcast-safety guard: the hot side holds at most
    # total_occurrences / threshold rows (pigeonhole), so raise the
    # threshold until that bound fits max_hot_grams. The total IS the
    # gram-occurrence row count (one row per occurrence, by
    # construction == Σ max(n_tok - width + 1, 0)), so counting the
    # checkpointed frame doubles as its materialization — the guard
    # costs no extra pass at all. NOTE this makes the call EAGER (a
    # Spark job runs here, not at the downstream action) — the bench
    # harness times fn()+collect() together so the guard job is
    # attributed to the query's wall; callers that already know the
    # corpus's gram-occurrence total (a curation driver re-running
    # stages over one profiled corpus) pass it as
    # ``total_occurrences`` and the call stays fully lazy.
    if total_occurrences is not None:
        if int(total_occurrences) <= 0:
            raise ValueError(
                f"total_occurrences must be >= 1, got {total_occurrences} "
                "— a zero/negative total disables the max_hot_grams "
                "broadcast bound entirely (a stale or wrong-corpus "
                "value is the likely cause; omit the parameter to have "
                "it measured)"
            )
        total_occ = int(total_occurrences)
    else:
        total_occ = grams.count()
    effective_min = max(hot_min_count, -(-total_occ // max_hot_grams))
    if effective_min > hot_min_count:
        import warnings

        warnings.warn(
            f"duplicate_span_cover: {total_occ} gram occurrences "
            f"cannot prove a <= {max_hot_grams}-row hot broadcast at "
            f"hot_min_count={hot_min_count}; escalating the hot "
            f"threshold to {effective_min} (hashed-probe fan-in cap "
            "rises accordingly). Raise max_hot_grams if the driver "
            "can take a larger broadcast.",
            UserWarning,
            stacklevel=2,
        )
    stats = duplicated_gram_stats(grams, id_col=id_col)
    not_canon = (F.col(id_col) != F.col("canon")[id_col]) | (
        F.col("pos") != F.col("canon")["pos"]
    )
    cold = stats.where(F.col("cnt") < effective_min).select("hh", "canon")
    hot = stats.where(F.col("cnt") >= effective_min).select("hh", "canon")
    dup_occ = (
        grams.join(cold, "hh")
        .where(not_canon)
        .select(id_col, "pos")
        .unionByName(
            grams.join(F.broadcast(hot), "hh")
            .where(not_canon)
            .select(id_col, "pos")
        )
    )
    covered = dup_occ.select(
        id_col,
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + width - 1)
        ).alias("p"),
    ).distinct()
    return base, covered


def excise_duplicate_spans(
    docs: DataFrame,
    *,
    width: int = SUBSTR_W,
    id_col: str = "doc_id",
    text_col: str = "text",
    hot_min_count: int = HOT_GRAM_MIN,
    max_hot_grams: int = MAX_HOT_GRAMS,
    total_occurrences: int | None = None,
) -> DataFrame:
    """Excision half of Lee et al. substring dedup: remove every
    token position :func:`duplicate_span_cover` marks and reassemble
    each document's SURVIVING tokens in original order. One row per
    input doc: ``(id_col, text_col [rewritten, '' when fully
    excised], n_tokens [original], n_removed)``.

    Shared kernel of the ``docs_substring_dedup_rewrite`` registered
    query and the optional ``substring_dedup`` curation stage
    (pipeline/curate.py). Plan shape: the cover's hashed/broadcast
    probe joins, one posexplode, one anti join on (id, position), one
    per-doc ``collect_list`` re-assembly — order restored by
    ``array_sort`` on the position key, never a global sort."""
    base, covered = duplicate_span_cover(
        docs,
        width=width,
        id_col=id_col,
        text_col=text_col,
        hot_min_count=hot_min_count,
        max_hot_grams=max_hot_grams,
        total_occurrences=total_occurrences,
    )
    tok = base.select(
        id_col, F.posexplode("w").alias("p", "token")
    ).select(id_col, F.col("p").cast("long").alias("p"), "token")
    keep = tok.join(covered, [id_col, "p"], "left_anti")
    rebuilt = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("p", "token"))),
            lambda s: s["token"],
        ),
        " ",
    )
    kept = keep.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"), rebuilt.alias("rebuilt")
    )
    return (
        base.select(id_col, "n_tok")
        .join(kept, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("rebuilt"), F.lit("")).alias(text_col),
            F.col("n_tok").cast("long").alias("n_tokens"),
            (F.col("n_tok") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )

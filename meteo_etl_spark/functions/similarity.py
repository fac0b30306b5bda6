"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk`` — exact cosine top-k: broadcast the (tiny)
  query vector, one codegen'd pass over the corpus, top-k via
  TakeOrderedAndProject (per-partition heaps, no global sort). The
  correctness baseline and, at 100 TB, still the right plan when the
  query set is small: the scan is embarrassingly parallel.
- ``ann_lsh_topk`` — random-hyperplane (sign) LSH: L hash tables of
  P hyperplanes each; a vector's bucket per table is the P-bit sign
  pattern of its projections. Candidates = corpus vectors sharing the
  query's bucket in ANY table (OR across tables raises recall), then
  exact cosine re-rank of the candidates only. This is the scale
  path — the per-table bucket can be a partition/cluster key so a
  query touches a handful of partitions instead of the full corpus
  (IVF-style routing).

Hyperplanes are deterministic (md5-seeded ±1 weights) so the DuckDB
oracle — the same pipeline in SQL — matches bit-for-bit. All vector
math is JVM-side higher-order functions over array<double>; no Python
in the hot path.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from meteo_etl_spark.functions.lits import dlit, dlit2
from meteo_etl_spark.operators.parallelism import fan_out

try:  # the Arrow projection kernel is optional — expression fallback
    import numpy as _np  # noqa: F401

    _HAVE_NUMPY = True
except Exception:  # pragma: no cover
    _HAVE_NUMPY = False

# Shared with the oracle generators in plans/llm_queries.py.
EMBEDDING_DIM = 64
LSH_TABLES = 2
LSH_PLANES = 4  # bits per table; 2^4 = 16 buckets/table

# Recall-tuned configuration (round 8). Chosen from an exhaustive
# (L, P, h) sweep against exact top-5 on the sf0.1 corpus (2000
# vectors, top-5 neighbor cosine ~0.37 → per-bit collision ~0.62; see
# bench_evidence/R8_NEWOPS.md for the full grid): 8 tables x 6 planes
# at Hamming<=1 measures recall@5 = 0.94 vs 0.76 for the r7
# (2, 4, h=1) route. Honest cost note: the ~60% candidate fraction
# this config admits is intrinsic to ORing 8 shallow tables (a RANDOM
# pair passes one table's Hamming<=1 gate with prob 7/64, so 1 -
# (57/64)^8 ~= 0.60) — and on this corpus's weak neighbor structure
# (~68 deg) no sign-LSH config reaches 0.9 recall for less. Corpora
# WITH neighbor structure (real text encoders) should instead use
# DEEP buckets, where selectivity and recall coexist: the clustered
# fixture in tests/test_llm_ops.py measures L=4, P=12, h=1 at recall
# 0.998 with a 6% candidate fraction (2/3 of it genuine same-cluster
# pairs). The audit machinery is the point: measure recall AND
# candidate fraction on YOUR corpus before trusting a route.
LSH_TUNED_TABLES = 8
LSH_TUNED_PLANES = 6
LSH_TUNED_HAMMING = 1

# Deep-bucket shape for structured corpora (see note above).
LSH_DEEP_TABLES = 4
LSH_DEEP_PLANES = 12
LSH_DEEP_HAMMING = 1


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order —
    the DuckDB oracle folds in the same order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane(table: int, plane: int, dim: int = EMBEDDING_DIM) -> list[float]:
    """Deterministic ±1 hyperplane weights, md5-seeded per component.
    Shared with the oracle SQL generator — both engines see the same
    literal planes."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"plane{table}:{plane}:{d}".encode()).hexdigest()
        out.append(1.0 if int(h[:2], 16) % 2 == 0 else -1.0)
    return out


def _bucket(v: Column, table: int, planes: int = LSH_PLANES) -> Column:
    """P-bit sign-pattern bucket id of vector ``v`` in hash table
    ``table`` ('1' iff the projection is strictly positive).

    One ``transform`` over a single list-of-lists plane literal, NOT
    P inlined dot expressions: Catalyst constant-folds the literal to
    one node, so the expression tree (and the task binary, and the
    driver's analysis/codegen time) stays O(1) in P and dim — the
    r9-audited route queries carried ~27k literal nodes and ~1 MiB
    task binaries in the inlined form, a pure driver-side fixed cost
    at any data scale. Per-row arithmetic and bit order are identical
    (sequential fold per plane, in plane order), so every persisted
    index layout and oracle hash is unchanged."""
    # dlit2: the same Literal node in ONE py4j round trip instead of
    # planes*dim (r15 — construction cost, not plan shape)
    planes_lit = dlit2([hyperplane(table, p) for p in range(planes)])
    return F.array_join(
        F.transform(
            planes_lit,
            lambda pl: F.when(dot(v, pl) > 0, F.lit("1")).otherwise(F.lit("0")),
        ),
        "",
    )


#: use the Arrow projection kernel when a corpus-side projection
#: computes at least this many plane/centroid dots per row — below
#: it, the pure-expression path is simpler and the interpreter
#: overhead is negligible (the serving-index builds at L·P = 8 dots
#: stay pure JVM; the tuned/deep audits at 48-104 dots vectorize).
BUCKET_ARROW_MIN_DOTS = 32


def _project_ann_arrow(
    emb: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    bucket_specs: list[tuple[str, int, int]],
    with_ivf: str | None,
) -> DataFrame:
    """Arrow/numpy twin of the expression-path ANN projection: from
    (id, vec) rows, produce (vec_id, v, <bucket cols...>[, ivf list])
    with BIT-IDENTICAL results to ``_bucket`` / ``ivf_list_of``.

    Exactness is by construction, not tolerance: the kernel folds the
    dot products in the SAME sequential element order as the Spark
    ``aggregate`` (one vectorized ``acc = acc + v[:, d] * W[d, :]``
    step per dimension, from 0.0 — each row/plane cell performs the
    identical IEEE-754 add/mul sequence, so even sign decisions at
    the last ulp agree), the bucket bit is the same strict ``> 0``,
    and the IVF argmax is first-maximum (``np.argmax``) exactly like
    ``array_position(d, array_max(d))``. Parity is pinned by test
    against the expression path.

    Why it exists: per-row bucket projection over L·P planes runs at
    expression-interpreter speed JVM-side (higher-order functions are
    not codegen'd) — the tuned/deep audit's ~100 dots per row
    dominate its wall clock; one numpy pass per Arrow batch does the
    same flops at BLAS-adjacent speed. mapInPandas preserves
    partitioning — still a pure map, nothing shuffles. Trade-off the
    caller must respect: filters do NOT push below a Python map, so
    ONLY project the big corpus side here; tiny filtered sides (query
    panels) should stay on the expression path above their scans."""
    import numpy as np

    planes_np = {
        name: np.asarray(
            [hyperplane(t, p) for p in range(n_planes)], dtype=np.float64
        ).T  # (dim, P)
        for name, t, n_planes in bucket_specs
    }
    cents_np = (
        np.asarray(
            [ivf_centroid(j) for j in range(IVF_LISTS)], dtype=np.float64
        ).T
        if with_ivf
        else None
    )

    id_type = dict(
        (f.name, f.dataType.simpleString()) for f in emb.schema.fields
    )[id_col]
    out_schema = f"vec_id {id_type}, v array<double>"
    for name, _, _ in bucket_specs:
        out_schema += f", {name} string"
    if with_ivf:
        out_schema += f", {with_ivf} bigint"

    def _seq_dots(V: "np.ndarray", W: "np.ndarray") -> "np.ndarray":
        # sequential left fold from 0.0, one dim at a time — the
        # exact order of functions.similarity.dot on both engines
        acc = np.zeros((V.shape[0], W.shape[1]), dtype=np.float64)
        for d in range(W.shape[0]):
            acc = acc + V[:, d, None] * W[None, d, :]
        return acc

    def project(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]],
                dtype=np.float64,
            )
            out = {
                "vec_id": pdf[id_col],
                "v": list(V),
            }
            for name, _, _ in bucket_specs:
                signs = _seq_dots(V, planes_np[name]) > 0.0
                bits = np.where(signs, "1", "0")
                out[name] = ["".join(row) for row in bits]
            if with_ivf:
                dots = _seq_dots(V, cents_np)
                out[with_ivf] = (np.argmax(dots, axis=1) + 1).astype("int64")
            yield pd.DataFrame(out)

    return emb.mapInPandas(project, schema=out_schema)


def _dot_py(a: list[float], b: list[float]) -> float:
    """Driver-side twin of :func:`dot`: sequential left fold from 0.0
    in element order — Python floats ARE IEEE-754 doubles, so every
    intermediate is bit-identical to the engine fold."""
    s = 0.0
    for x, y in zip(a, b):
        s = s + x * y
    return s


def _bucket_py(vec: list[float], table: int, planes: int = LSH_PLANES) -> str:
    """Driver-side twin of :func:`_bucket` (same planes, same fold,
    same strict ``> 0``). For QUERY-PANEL sides: a panel is a handful
    of rows, and building the L·P·dim bucket expression tree for it
    costs seconds of per-call driver analysis/codegen — computing the
    few bucket strings in Python is exact and free."""
    return "".join(
        "1" if _dot_py(vec, hyperplane(table, p)) > 0 else "0"
        for p in range(planes)
    )


def _ivf_probes_py(vec: list[float]) -> tuple[int, int]:
    """Driver-side twin of the (p1, p2) IVF probe pair: p1 = 1-based
    first-max centroid dot (``array_position(d, array_max(d))``),
    p2 = first-max after masking p1 with -1e18 — identical tie order
    to the engine path."""
    dots = [_dot_py(vec, ivf_centroid(j)) for j in range(IVF_LISTS)]
    p1 = dots.index(max(dots)) + 1
    masked = [(-1e18 if j + 1 == p1 else d) for j, d in enumerate(dots)]
    p2 = masked.index(max(masked)) + 1
    return p1, p2


def brute_force_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors of the vector with id ``query_id``."""
    v = F.col(vec_col).cast("array<double>")
    corpus = fan_out(emb).select(F.col(id_col).alias("vec_id"), v.alias("v"))
    q = corpus.filter(F.col("vec_id") == query_id).select(F.col("v").alias("qv"))
    return (
        corpus.filter(F.col("vec_id") != query_id)
        .join(F.broadcast(q))
        .select("vec_id", cosine(F.col("v"), F.col("qv")).alias("sim_raw"))
        .orderBy(F.desc("sim_raw"), "vec_id")
        .limit(k)
        .select("vec_id", F.round("sim_raw", 6).alias("sim"))
    )


#: shape-metadata sidecar inside every persisted ANN index (leading
#: underscore: Spark's parquet reader ignores it, like _SUCCESS). A
#: query issued with a mismatched shape (e.g. an lsh_tuned query
#: against an lsh_deep index) would compute WRONG buckets and silently
#: return wrong/empty neighbors — the meta check fails it loudly
#: instead (ADVICE r11).
_ANN_META = "_ann_meta.json"


def _write_ann_meta(spark, path: str, meta: dict) -> None:
    from meteo_etl_spark.operators.fsio import io_for

    io = io_for(path, spark)
    io.mkdirs(path.rstrip("/"))  # streaming ingest stamps meta first
    io.replace(f"{path.rstrip('/')}/{_ANN_META}", json.dumps(meta))


def _read_ann_meta(spark, path: str) -> dict | None:
    """The persisted index's shape metadata, or None for a legacy
    index built before the sidecar existed (validation is then
    skipped — the caller owns the shape, as before)."""
    from meteo_etl_spark.operators.fsio import io_for

    try:
        return json.loads(
            io_for(path, spark).read_text(f"{path.rstrip('/')}/{_ANN_META}")
        )
    except FileNotFoundError:
        return None


def _check_ann_meta(spark, path: str, want: dict, *, meta: dict | None = None) -> None:
    """Fail loudly when the persisted index's shape disagrees with the
    caller's parameters on any key the caller states. Pass ``meta``
    when the sidecar is already in hand (the ivfpq serve path reads it
    once for the codebook) to avoid a second driver-side read."""
    if meta is None:
        meta = _read_ann_meta(spark, path)
    if meta is None:
        return
    bad = {
        k: (meta.get(k), v) for k, v in want.items() if meta.get(k) != v
    }
    if bad:
        raise ValueError(
            f"ANN index at {path} was built with a different shape: "
            + ", ".join(
                f"{k}: index has {got!r}, query expects {exp!r}"
                for k, (got, exp) in sorted(bad.items())
            )
            + " — querying across shapes computes wrong buckets; "
            "rebuild the index or use its build parameters"
        )


def _lsh_rows(
    emb: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_tables: int,
    n_planes: int,
) -> DataFrame:
    """(vec_id, v, table, bucket) index rows from ONE corpus scan:
    every table's bucket projects in a single pass (the Arrow kernel
    above the dot threshold — the pinned bit-exact twin of
    ``_bucket``), then one Generate explodes the table dimension.
    Shared by build and append so their layouts can never diverge."""
    specs = [(f"b{t}", t, n_planes) for t in range(n_tables)]
    if n_tables * n_planes >= BUCKET_ARROW_MIN_DOTS and _HAVE_NUMPY:
        corpus = _project_ann_arrow(
            fan_out(emb),
            id_col=id_col,
            vec_col=vec_col,
            bucket_specs=specs,
            with_ivf=None,
        )
    else:
        v = F.col(vec_col).cast("array<double>")
        corpus = fan_out(emb).select(
            F.col(id_col).alias("vec_id"),
            v.alias("v"),
            *[_bucket(v, t, n_planes).alias(f"b{t}") for t in range(n_tables)],
        )
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    F.col(f"b{t}").alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
    )
    return corpus.select("vec_id", "v", pairs.alias("p")).select(
        "vec_id",
        "v",
        F.col("p.table").alias("table"),
        F.col("p.bucket").alias("bucket"),
    )


def build_lsh_index(
    emb: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = LSH_TABLES,
    n_planes: int = LSH_PLANES,
) -> None:
    """Persist the corpus bucket-partitioned (IVF-style inverted file).

    Each vector is written once per hash table under
    ``table=<t>/bucket=<sign-pattern>`` — at 100 TB this is the layout
    that turns ANN from a full-corpus scan into a partition-pruned read
    of a handful of buckets (the partition filter is visible in the
    query plan; see ``query_lsh_index``). Rebuild cost is one narrow
    pass over the corpus per table. ``n_tables``/``n_planes`` pick the
    LSH shape — the audited ``lsh_tuned``/``lsh_deep`` routes persist
    with their own parameters (``build_ann_index``); the shape lands
    in the ``_ann_meta.json`` sidecar so a query issued with the
    wrong parameters fails loudly instead of silently computing wrong
    buckets.

    Build plan (r12): ONE corpus scan projects every table's bucket
    (Arrow kernel above the dot threshold — the pinned bit-exact
    twin), one Generate explodes to (table, bucket) rows, and one
    repartition on the partition keys gives each (table, bucket)
    directory a single file — the previous n_tables-way union scanned
    the corpus per table and wrote a file per task per directory
    (tuned shape: 8 scans, up to tasks×8×2^6 files)."""
    df = _lsh_rows(
        emb, id_col=id_col, vec_col=vec_col,
        n_tables=n_tables, n_planes=n_planes,
    )
    (
        df.repartition("table", "bucket")
        .write.mode("overwrite")
        .partitionBy("table", "bucket")
        .parquet(path)
    )
    _write_ann_meta(
        emb.sparkSession,
        path,
        {"kind": "lsh", "n_tables": n_tables, "n_planes": n_planes},
    )


def append_lsh_index(
    emb: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = LSH_TABLES,
    n_planes: int = LSH_PLANES,
) -> None:
    """Incremental growth of the persisted LSH index: bucket ONLY the
    new vectors and append them under their (table, bucket) partitions.

    The daily-crawl shape (twin of ``dedup.build_minhash_index``): the
    existing corpus is never re-read or re-bucketed — each increment
    costs one narrow pass over the new vectors per table, and the
    partition layout stays query-identical to a full rebuild (pinned
    by test). Append-only contract: ids must be NEW. An update/delete
    would have to find the row's OLD buckets (sign patterns of the old
    vector) to touch the right partitions — keep a vec_id→bucket
    sidecar or rebuild the index for mutation-heavy corpora. An
    append with a shape different from the index's ``_ann_meta.json``
    would land vectors in buckets no same-shape query probes — it
    fails loudly before writing. Same single-scan explode build plan
    as :func:`build_lsh_index`."""
    spark = emb.sparkSession
    _check_ann_meta(
        spark, path, {"kind": "lsh", "n_tables": n_tables, "n_planes": n_planes}
    )
    df = _lsh_rows(
        emb, id_col=id_col, vec_col=vec_col,
        n_tables=n_tables, n_planes=n_planes,
    )
    (
        df.repartition("table", "bucket")
        .write.mode("append")
        .partitionBy("table", "bucket")
        .parquet(path)
    )
    # A legacy index (no sidecar) deliberately STAYS sidecar-less: the
    # append's parameters are a claim about the ORIGINAL build this
    # code cannot verify, and stamping them would convert a one-batch
    # wrong-shape append into "every correctly-shaped query now fails
    # the meta check" (r12 self-review). Rebuild to gain the sidecar.


def lsh_ingest_foreach_batch(
    spark,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = LSH_TABLES,
    n_planes: int = LSH_PLANES,
    stats: list | None = None,
):
    """``foreachBatch`` body for STREAMING ANN-index ingestion — the
    daily-crawl shape under at-least-once delivery: each micro-batch's
    vectors bucket once (:func:`_lsh_rows` — the same single-scan
    kernel as the batch build) and land under
    ``batch=<id>/table=<t>/bucket=<b>`` with an up-front FileSystem
    delete of ``batch=<id>`` + append — the by-layout exactly-once
    argument of the classifier count deltas: a redelivered batch
    replaces its OWN partition subtree instead of duplicating vectors
    (plain ``append_lsh_index`` in a foreachBatch would double every
    redelivered vector). The first batch stamps the shape sidecar;
    every later batch (and every query) validates against it.

    ``batch`` is the OUTERMOST partition key so the redelivery delete
    is one rmtree; queries filter on (table, bucket) only, and
    partition pruning on a key subset works regardless of nesting —
    the probed scan reads every batch's matching buckets, which is the
    point (the index grows, queries see the union). Append-only ids,
    as with :func:`append_lsh_index`."""
    from meteo_etl_spark.operators.fsio import io_for

    io = io_for(path, spark)
    want = {"kind": "lsh", "n_tables": n_tables, "n_planes": n_planes}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        meta = _read_ann_meta(spark, path)
        if meta is None:
            _write_ann_meta(spark, path, want)
        else:
            _check_ann_meta(spark, path, want, meta=meta)
        io.rmtree(f"{path.rstrip('/')}/batch={int(batch_id)}")
        if batch_df.isEmpty():
            if stats is not None:
                stats.append({"batch_id": batch_id, "n_rows": 0})
            return
        rows = _lsh_rows(
            batch_df,
            id_col=id_col,
            vec_col=vec_col,
            n_tables=n_tables,
            n_planes=n_planes,
        ).withColumn("batch", F.lit(int(batch_id)))
        (
            rows.repartition("table", "bucket")
            .write.mode("append")
            .partitionBy("batch", "table", "bucket")
            .parquet(path)
        )
        if stats is not None:
            stats.append({"batch_id": batch_id, "n_rows": batch_df.count()})

    return handle


def query_lsh_index(
    spark,
    path: str,
    query_vec: list[float],
    *,
    k: int = 5,
    exclude_id: int | None = None,
    max_hamming: int = 0,
    n_tables: int = LSH_TABLES,
    n_planes: int = LSH_PLANES,
) -> DataFrame:
    """Top-k over the persisted IVF index: compute the query's bucket
    per table driver-side (P·dim flops on a constant), then scan ONLY
    the matching (table, bucket) partitions — Catalyst turns the
    bucket equality into PartitionFilters, so I/O is proportional to
    the candidate set, not the corpus.

    ``max_hamming`` > 0 multi-probes: the probe list per table becomes
    every bucket within that many sign flips (computed driver-side —
    still a LITERAL bucket IN-list, still partition-pruned; h<=1 reads
    P+1 partitions per table instead of 1 and buys the recall
    ann_multiprobe_topk measures).

    Shape safety: when the index carries ``_ann_meta.json`` (every
    index built since the sidecar landed), a query whose
    ``n_tables``/``n_planes`` disagree with the build parameters
    raises instead of silently probing wrong buckets."""
    _check_ann_meta(
        spark, path, {"kind": "lsh", "n_tables": n_tables, "n_planes": n_planes}
    )
    qv = [float(x) for x in query_vec]

    def bucket_of(table: int) -> str:
        bits = []
        for p in range(n_planes):
            plane = hyperplane(table, p)
            s = 0.0
            for a, b in zip(qv, plane):
                s += a * b
            bits.append("1" if s > 0 else "0")
        return "".join(bits)

    def probes_of(table: int) -> list[str]:
        base = bucket_of(table)
        out = {base}
        frontier = {base}
        for _ in range(max_hamming):
            nxt = set()
            for b in frontier:
                for p in range(n_planes):
                    nxt.add(b[:p] + ("0" if b[p] == "1" else "1") + b[p + 1:])
            out |= nxt
            frontier = nxt
        return sorted(out)

    df = spark.read.parquet(path)
    match_any = None
    for t in range(n_tables):
        m = (F.col("table") == t) & (F.col("bucket").isin(probes_of(t)))
        match_any = m if match_any is None else match_any | m
    cand = df.filter(match_any)
    if exclude_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_id)
    cand = _suppress_tombstones(spark, path, cand)
    qcol = dlit(qv)
    # a vector in both tables' matching buckets appears twice — dedup
    cand = cand.select("vec_id", "v").dropDuplicates(["vec_id"])
    return (
        cand.select("vec_id", cosine(F.col("v"), qcol).alias("sim_raw"))
        .orderBy(F.desc("sim_raw"), "vec_id")
        .limit(k)
        .select("vec_id", F.round("sim_raw", 6).alias("sim"))
    )


def ann_lsh_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket routing, exact cosine
    re-rank within candidates (vectors sharing the query's bucket in
    any of the L tables)."""
    v = F.col(vec_col).cast("array<double>")
    corpus = fan_out(emb).select(
        F.col(id_col).alias("vec_id"),
        v.alias("v"),
        *[_bucket(v, t).alias(f"b{t}") for t in range(LSH_TABLES)],
    )
    q = corpus.filter(F.col("vec_id") == query_id).select(
        F.col("v").alias("qv"),
        *[F.col(f"b{t}").alias(f"qb{t}") for t in range(LSH_TABLES)],
    )
    match_any = None
    for t in range(LSH_TABLES):
        m = F.col(f"b{t}") == F.col(f"qb{t}")
        match_any = m if match_any is None else match_any | m
    return (
        corpus.filter(F.col("vec_id") != query_id)
        .join(F.broadcast(q), on=match_any)
        .select("vec_id", cosine(F.col("v"), F.col("qv")).alias("sim_raw"))
        .orderBy(F.desc("sim_raw"), "vec_id")
        .limit(k)
        .select("vec_id", F.round("sim_raw", 6).alias("sim"))
    )


# --- IVF (coarse-quantizer) ANN --------------------------------------------
# Unlike the sign-LSH buckets above (data-independent bit patterns), an
# IVF index routes by NEAREST CENTROID: the corpus is inverted on
# argmax-dot(centroid, v), and a query probes only the `nprobe` lists
# whose centroids score highest against it. Real systems k-means the
# centroids; here they are md5-seeded constants so the DuckDB oracle
# (same literals, same fold order) verifies the routing end to end —
# the Spark plan is identical either way, only the literals change.

IVF_LISTS = 8
IVF_NPROBE = 2

#: serving-quality bar for the TUNED default probe depth: the smallest
#: nprobe whose MINIMUM recall@k over the build-time audit panel clears
#: this is stored in the index meta and becomes the query-time default
#: (r14 verdict order #2 — a fixed nprobe=2 shipped recall@5 = 0.2 on
#: the bench corpus; a route that is fast by skipping 80 % of true
#: neighbors is not a legitimate speed win).
IVF_RECALL_TARGET = 0.8
IVF_TUNE_PANEL = 8


def ivf_centroid(k: int, dim: int = EMBEDDING_DIM) -> list[float]:
    """Deterministic centroid k: per-component values in [-1, 1)
    derived from md5 — shared literal-for-literal with the oracle."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"ivf{k}:{d}".encode()).hexdigest()
        out.append(int(h[:2], 16) / 128.0 - 1.0)
    return out


def _centroid_dots(v: Column) -> Column:
    """array<double> of dot(v, centroid_k) for all IVF_LISTS centroids
    (sequential folds — deterministic, oracle-mirrored). One
    ``transform`` over a single constant-folded centroid literal —
    same O(1)-expression-size rationale as ``_bucket``."""
    cents_lit = dlit2([ivf_centroid(k) for k in range(IVF_LISTS)])
    return F.transform(cents_lit, lambda c: dot(v, c))


def ivf_list_of(v: Column) -> Column:
    """1-based inverted-list id: argmax-dot centroid (first max wins —
    array_position finds the first occurrence, as does the oracle's
    list_position)."""
    d = _centroid_dots(v)
    return F.array_position(d, F.array_max(d))


def ivf_route_join(
    vecs: DataFrame,
    centroids: list[list[float]],
    *,
    vec_col: str = "v",
    out_col: str = "lst",
) -> DataFrame:
    """Large-k IVF routing: add the 1-based inverted-list id by
    argmax-dot against a TRAINED centroid set (e.g.
    ``clustering.trained_ivf_centroids(k=...)``) shipped as ONE
    broadcast row — the same packed-centroid idiom as
    ``clustering._assign_clusters_join``, because literal-compiled
    routing (``ivf_list_of``) caps the list count near 10³ while real
    IVF indexes carve 10⁴-10⁵ lists. argmax is ``array_min`` over
    struct(-dot, list): min of the negated dot = max dot, ties to the
    lowest list id — the exact tie order of the literal path (verified
    equivalent in tests). Pure map per row after the 1-row broadcast;
    nothing shuffles."""
    spark = vecs.sparkSession
    cents = spark.createDataFrame(
        [(j + 1, [float(x) for x in c]) for j, c in enumerate(centroids)],
        "lst int, cv array<double>",
    )
    packed = cents.agg(
        F.collect_list(F.struct(F.col("lst"), F.col("cv"))).alias("_cents")
    )
    best = F.array_min(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                (dot(F.col(vec_col), c["cv"]) * F.lit(-1.0)).alias("nd"),
                c["lst"].alias("lst"),
            ),
        )
    )
    return (
        vecs.join(F.broadcast(packed))
        .withColumn(out_col, best.getField("lst").cast("long"))
        .drop("_cents")
    )


def ann_ivf_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 5,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rank_col: str | None = None,
) -> DataFrame:
    """Top-k via IVF routing: corpus rows keep only their inverted-list
    id (one pass, broadcastable state: the centroid literals); the
    query's best `nprobe` lists are computed from the same dots array
    (second-best = argmax after masking the winner — index arithmetic
    both engines express identically); candidates = vectors in any
    probed list, re-ranked by exact cosine. At 100 TB `ivf_list_of`
    becomes the partition key (exactly like build_lsh_index) and a
    query reads nprobe partitions instead of the corpus."""
    if nprobe != 2:
        raise ValueError("oracle parity is defined for nprobe=2")
    v = F.col(vec_col).cast("array<double>")
    corpus = fan_out(emb).select(
        F.col(id_col).alias("vec_id"), v.alias("v"), ivf_list_of(v).alias("lst")
    )
    dots = _centroid_dots(F.col("v"))
    masked = F.transform(
        F.sequence(F.lit(1), F.lit(IVF_LISTS)),
        lambda i: F.when(i == F.col("p1"), F.lit(-1e18)).otherwise(
            F.element_at(dots, i)
        ),
    )
    q = (
        emb.filter(F.col(id_col) == query_id)
        .select(v.alias("v"))
        .withColumn("p1", ivf_list_of(F.col("v")))
        .withColumn("m", masked)
        .select(
            F.col("v").alias("qv"),
            "p1",
            F.array_position(F.col("m"), F.array_max("m")).alias("p2"),
        )
    )
    top = (
        corpus.filter(F.col("vec_id") != query_id)
        .join(
            F.broadcast(q),
            on=(F.col("lst") == F.col("p1")) | (F.col("lst") == F.col("p2")),
        )
        .select("vec_id", cosine(F.col("v"), F.col("qv")).alias("sim_raw"))
        .orderBy(F.desc("sim_raw"), "vec_id")
        .limit(k)
    )
    if rank_col is not None:
        # rank over the k-row top frame (bounded — k is a caller
        # constant, never the corpus): the consumer-side position for
        # fusion stages like docs_hybrid_rrf_routed
        top = top.withColumn(
            rank_col,
            F.row_number()
            .over(Window.orderBy(F.desc("sim_raw"), "vec_id"))
            .cast("long"),
        )
    return top.select(
        "vec_id",
        F.round("sim_raw", 6).alias("sim"),
        *([rank_col] if rank_col is not None else []),
    )


def _tuned_nprobe_meta(
    emb: DataFrame,
    *,
    centroids: list[list[float]] | None,
    id_col: str,
    vec_col: str,
) -> dict:
    """Meta-sidecar fragment recording the recall-justified default
    probe depth (:func:`ivf_operating_point`) — shared by every
    IVF-family build so the tuned default and its evidence always
    travel WITH the index."""
    op = ivf_operating_point(
        emb, centroids=centroids, id_col=id_col, vec_col=vec_col
    )
    return {
        "nprobe_default": op["nprobe"],
        "nprobe_tuning": {
            "target_recall": op["target_recall"],
            "k": op["k"],
            "n_queries": op["n_queries"],
            "min_recall_at_default": op["min_recall_at_default"],
        },
    }


def _resolve_nprobe(nprobe: int | None, meta: dict | None) -> int:
    """The serve-time probe depth: an explicit caller value wins; else
    the index's tuned ``nprobe_default`` (recall-justified at build
    time); else the legacy pinned constant (pre-tuning indexes)."""
    if nprobe is not None:
        return int(nprobe)
    if meta is not None and "nprobe_default" in meta:
        return int(meta["nprobe_default"])
    return IVF_NPROBE


def build_ivf_index(
    emb: DataFrame,
    path: str,
    *,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tune_nprobe: bool = True,
) -> None:
    """Persist the corpus as an IVF inverted file: one pass routes
    every vector to its argmax-dot centroid list and lands it under
    ``lst=<k>`` — the partition layout that makes an nprobe query a
    pruned read of nprobe directories instead of a corpus scan (the
    serving half of the ``ivf`` route ``choose_ann_route`` falls back
    to). Twin of ``build_lsh_index``; each vector is written ONCE
    (lists partition the corpus, unlike LSH tables which replicate it
    n_tables times).

    ``centroids=None`` routes with the fixed md5-seeded literals
    (``ivf_list_of`` — the oracle-replayable default). Pass TRAINED
    centroids (``clustering.trained_ivf_centroids`` output) for
    data-adaptive lists — the r8 ``sim_ann_ivf`` promise ("swap the
    centroid literals for k-means output without touching the plan"):
    routing goes through ``ivf_route_join`` (broadcast packed
    centroids, same argmax/tie order), the centroids land in the meta
    sidecar, and ``query_ivf_index`` probes with THEM — build and
    query can never disagree on the quantizer."""
    v = F.col(vec_col).cast("array<double>")
    base = fan_out(emb).select(F.col(id_col).alias("vec_id"), v.alias("v"))
    if centroids is None:
        corpus = base.withColumn("lst", ivf_list_of(F.col("v")))
        meta = {"kind": "ivf", "n_lists": IVF_LISTS}
    else:
        corpus = ivf_route_join(base, centroids, vec_col="v", out_col="lst")
        meta = {
            "kind": "ivf",
            "n_lists": len(centroids),
            "centroids": [[float(x) for x in c] for c in centroids],
        }
    if tune_nprobe:
        meta.update(
            _tuned_nprobe_meta(
                emb, centroids=centroids, id_col=id_col, vec_col=vec_col
            )
        )
    corpus.write.mode("overwrite").partitionBy("lst").parquet(path)
    _write_ann_meta(emb.sparkSession, path, meta)


def query_ivf_index(
    spark,
    path: str,
    query_vec: list[float],
    *,
    k: int = 5,
    nprobe: int | None = None,
    exclude_id: int | None = None,
) -> DataFrame:
    """Top-k over the persisted IVF index: the query's best ``nprobe``
    centroid lists are computed DRIVER-side (IVF_LISTS·dim flops on a
    constant — same tie order as ``_ivf_probes_py``: descending dot,
    first-max wins), then ONLY those ``lst=`` partitions are scanned —
    the ``lst IN (...)`` literal becomes PartitionFilters in the plan,
    so I/O is proportional to the probed lists, not the corpus.
    Candidates re-rank by exact cosine. The ``_ann_meta.json``
    sidecar (when present) must agree this is an IVF index — and for
    a TRAINED index (built with ``centroids=``), the probes are
    computed against the centroids STORED in the sidecar, so the
    query routes with exactly the quantizer the build used (same
    first-max/lowest-list tie order as ``ivf_route_join``).

    ``nprobe=None`` (the default) serves at the index's TUNED depth —
    the smallest nprobe whose min-recall@k over the build-time audit
    panel cleared ``IVF_RECALL_TARGET`` (stored in the sidecar as
    ``nprobe_default``); an explicit value overrides it (e.g. the
    oracle-parity queries pin nprobe=2)."""
    meta = _read_ann_meta(spark, path)
    nprobe = _resolve_nprobe(nprobe, meta)
    cents = None
    if meta is not None and "centroids" in meta:
        _check_ann_meta(spark, path, {"kind": "ivf"}, meta=meta)
        cents = meta["centroids"]
    else:
        _check_ann_meta(
            spark, path, {"kind": "ivf", "n_lists": IVF_LISTS}, meta=meta
        )
        cents = [ivf_centroid(j) for j in range(IVF_LISTS)]
    qv = [float(x) for x in query_vec]
    dots = [_dot_py(qv, c) for c in cents]
    order = sorted(range(len(cents)), key=lambda j: (-dots[j], j))
    probes = [j + 1 for j in order[:nprobe]]

    cand = spark.read.parquet(path).filter(F.col("lst").isin(probes))
    if exclude_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_id)
    cand = _suppress_tombstones(spark, path, cand)
    qcol = dlit(qv)
    return (
        cand.select("vec_id", cosine(F.col("v"), qcol).alias("sim_raw"))
        .orderBy(F.desc("sim_raw"), "vec_id")
        .limit(k)
        .select("vec_id", F.round("sim_raw", 6).alias("sim"))
    )


def ivf_operating_point(
    emb: DataFrame,
    *,
    target_recall: float = IVF_RECALL_TARGET,
    n_queries: int = IVF_TUNE_PANEL,
    k: int = 5,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Measured IVF operating point: the smallest ``nprobe`` whose
    MINIMUM recall@``k`` over an ``n_queries`` audit panel (the
    lowest-id vectors — deterministic, includes the serving smoke
    query) reaches ``target_recall``, plus the full coverage curve.

    This is the per-index twin of the ``sim_ivf_nprobe_curve``
    operating table: list coverage of the exact top-k IS recall for
    the IVF-flat route (exact cosine re-ranks every covered
    candidate) and an upper bound for the codes-only routes. The
    min-over-panel criterion is deliberately conservative: a MEAN
    target lets individual queries ship far below the bar.

    Plan: ONE corpus scan assigns lists and scores the broadcast
    query panel (``n_queries`` cosines per row — audit-sized, the
    ``ann_recall`` shape); a per-query window keeps the exact top-k
    (panel-bounded state), and the ``n_queries × k`` (probe-rank,
    query) pairs collapse driver-side into the ≤ ``n_lists``-point
    curve. At 100 TB this is one pass over the corpus at build time —
    the price of never shipping an untested default."""
    n_lists = len(centroids) if centroids is not None else IVF_LISTS
    cents = (
        [list(map(float, c)) for c in centroids]
        if centroids is not None
        else [ivf_centroid(j) for j in range(IVF_LISTS)]
    )
    v = F.col(vec_col).cast("array<double>")
    base = fan_out(emb).select(F.col(id_col).alias("vec_id"), v.alias("v"))
    if centroids is None:
        corpus = base.withColumn("lst", ivf_list_of(F.col("v")))
    else:
        corpus = ivf_route_join(base, cents, vec_col="v", out_col="lst")

    panel_rows = (
        base.orderBy("vec_id").limit(n_queries).collect()
    )  # audit-panel-sized collect
    if not panel_rows:
        raise ValueError("ivf_operating_point: empty corpus")
    panel = []
    for r in panel_rows:
        qv = [float(x) for x in r["v"]]
        dots = [_dot_py(qv, c) for c in cents]
        order = sorted(range(n_lists), key=lambda j: (-dots[j], j))
        prank_of_list = [0] * n_lists
        for rank, j in enumerate(order):
            prank_of_list[j] = rank + 1
        panel.append((int(r["vec_id"]), qv, prank_of_list))
    spark = emb.sparkSession
    panel_df = spark.createDataFrame(
        panel, "qid long, qv array<double>, prank_arr array<int>"
    )

    w = Window.partitionBy("qid").orderBy(F.desc("s"), "vec_id")
    topk = (
        corpus.join(F.broadcast(panel_df), on=F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.element_at(F.col("prank_arr"), F.col("lst").cast("int")).alias(
                "prank"
            ),
            cosine(F.col("v"), F.col("qv")).alias("s"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "prank")
        .collect()  # n_queries × k rows
    )
    by_q: dict[int, list[int]] = {}
    for r in topk:
        by_q.setdefault(r["qid"], []).append(r["prank"])
    if not by_q:
        # degenerate corpus (a single vector has no neighbors to
        # audit): serve at FULL probe depth — the conservative default
        # that can never under-recall — with the emptiness recorded
        return {
            "nprobe": n_lists,
            "k": k,
            "n_queries": 0,
            "target_recall": target_recall,
            "min_recall_at_default": 0.0,
            "curve": {},
        }
    curve = {}
    chosen = n_lists
    for npb in range(1, n_lists + 1):
        hits = [
            sum(1 for p in pranks if p <= npb) for pranks in by_q.values()
        ]
        rec = [h / float(len(p)) for h, p in zip(hits, by_q.values())]
        curve[npb] = {
            "min_recall": round(min(rec), 4),
            "mean_recall": round(sum(rec) / len(rec), 4),
            # integer twins of the recalls — the hash-stable form the
            # sim_ann_operating_point oracle certifies
            "min_hits": min(hits),
            "sum_hits": sum(hits),
        }
        if curve[npb]["min_recall"] >= target_recall and chosen == n_lists:
            chosen = npb
    return {
        "nprobe": chosen,
        "k": k,
        "n_queries": len(by_q),
        "target_recall": target_recall,
        "min_recall_at_default": curve[chosen]["min_recall"],
        "curve": curve,
    }


def _codes_from_rows(
    rows, *, n_sub: int, sub_dim: int
) -> list[list[list[float]]]:
    """Reshape collected ``(…, v)`` rows into ``codes[m][c]`` (the
    per-subspace chunk of row ``c``) — the ONE reshape shared by
    :func:`sampled_pq_codebook`, :func:`pq_audit_sampled` and the
    spherical trainer's seeding, so the layouts can never drift
    (ADVICE r11)."""
    return [
        [
            [float(x) for x in r["v"][m * sub_dim : (m + 1) * sub_dim]]
            for r in rows
        ]
        for m in range(n_sub)
    ]


def sampled_pq_codebook(
    emb: DataFrame,
    *,
    n_sub: int,
    sub_dim: int,
    n_codes: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebook by deterministic sampling: the
    per-subspace chunks of the ``n_codes`` lowest-id vectors (one tiny
    ordered-limit collect). ``codes[m][c]`` is the ``sub_dim``-float
    code ``c`` of subspace ``m``. The zero-training baseline the
    ``emb_pq_audit`` oracle replays in SQL."""
    v = F.col(vec_col).cast("array<double>")
    rows = (
        fan_out(emb)
        .select(F.col(id_col).alias("vec_id"), v.alias("v"))
        .orderBy("vec_id")
        .limit(n_codes)
        .collect()
    )
    return _codes_from_rows(rows, n_sub=n_sub, sub_dim=sub_dim)


def trained_pq_codebook(
    emb: DataFrame,
    *,
    n_sub: int,
    sub_dim: int,
    n_codes: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebook by per-subspace k-means (the
    faiss-standard training path): each ``sub_dim``-wide chunk of the
    corpus is its own k-means problem (``clustering.kmeans_fit`` —
    integer-quantized Lloyd's, deterministic seeding, bounded k·dim
    driver state). Cost: ``n_sub × iters`` bounded-state passes —
    offline index-build work. Returned shape is drop-in for
    :func:`pq_recall_table`.

    HONEST MEASURED RESULT (r11, pinned by
    ``test_llm_ops.test_trained_pq_codebook_honest_comparison``): for
    the COSINE metric this audit ranks by, L2-trained codes do NOT
    beat :func:`sampled_pq_codebook` on either fixture — clustered
    corpus: sampled ADC recall@5 1.00 vs trained 0.28 (sampled codes
    ARE near cluster members, while Lloyd's averaging shrinks
    reconstructions toward the subspace mean, distorting norms and
    directions); near-random sf0.1: sampled 0.26 vs trained 0.16-0.20
    across 3-10 iterations, re-rank recall statistically identical.
    The standard remedy for inner-product/cosine PQ — spherical
    k-means — is :func:`spherical_pq_codebook` (r12): on a
    cross-cluster query panel it flips the direction (spherical >
    sampled > Lloyd, pinned by
    ``test_spherical_pq_codebook_flips_the_cosine_direction``); the
    lowest-id panel remains a memorization special case the sampled
    codebook wins by construction (codes ARE the panel's own cluster
    members)."""
    from meteo_etl_spark.functions.clustering import QUANT, kmeans_fit

    v = F.col(vec_col).cast("array<double>")
    base = fan_out(emb).select(F.col(id_col).alias("vec_id"), v.alias("v"))
    out = []
    for m in range(n_sub):
        chunk = base.select(
            "vec_id", F.slice(F.col("v"), m * sub_dim + 1, sub_dim).alias("ch")
        )
        cents, _ = kmeans_fit(
            chunk, k=n_codes, iters=iters, id_col="vec_id", vec_col="ch"
        )
        out.append([[x / QUANT for x in c] for c in cents])
    return out


def _unit(vec: list[float]) -> list[float] | None:
    n2 = sum(x * x for x in vec)
    if n2 <= 0.0:
        return None
    n = n2 ** 0.5
    return [x / n for x in vec]


def spherical_pq_codebook(
    emb: DataFrame,
    *,
    n_sub: int,
    sub_dim: int,
    n_codes: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebook by per-subspace SPHERICAL
    k-means — the documented remedy for the r11 honest result that
    L2-trained (Lloyd) codes lose the COSINE ranking to the sampled
    baseline (r12 verdict order #4).

    Why Lloyd loses on cosine: averaging shrinks each centroid toward
    its subspace mean, so different vectors' reconstructions shrink by
    different amounts and the reconstruction NORM becomes a ranking
    signal it never was. Spherical k-means removes the norm channel
    entirely: every centroid is L2-normalized after each update, so
    every reconstruction is a concat of ``n_sub`` unit chunks with the
    IDENTICAL norm ``sqrt(n_sub)`` — ADC cosine then ranks purely by
    direction. Assignment needs no new encoder: for unit-norm codes
    argmin-L2 IS argmax-dot (:func:`_pq_best_code`), so the trained
    codebook is drop-in for :func:`pq_reconstruct` /
    :func:`_pq_reconstruct_arrow` / :func:`pq_recall_table` with their
    bit-exactness properties untouched.

    Determinism at any partitioning: member sums are accumulated over
    the INTEGER-quantized chunks (``floor(x·QUANT)`` — the
    clustering-module discipline), so the shuffle's combine order
    cannot perturb the mean direction; normalization happens once,
    driver-side, on the exact integer sums. Seeding is the sampled
    codebook (lowest-id chunks), normalized — training can only
    refine the baseline it is compared against. Empty clusters keep
    their previous centroid; a zero-norm mean (impossible for real
    encoders, possible for padded dims) keeps the previous centroid
    too. Cost: ``n_sub × iters`` bounded-state passes, k·dim driver
    state — same offline index-build envelope as
    :func:`trained_pq_codebook`."""
    from meteo_etl_spark.functions.clustering import QUANT, quantize

    v = F.col(vec_col).cast("array<double>")
    base = fan_out(emb).select(F.col(id_col).alias("vec_id"), v.alias("v"))
    base = base.persist()
    try:
        seed_rows = base.orderBy("vec_id").limit(n_codes).collect()
        if len(seed_rows) < n_codes:
            raise ValueError(
                f"spherical_pq_codebook needs >= n_codes ({n_codes}) "
                f"vectors to seed; corpus has {len(seed_rows)} — lower "
                "n_codes (sampled_pq_codebook degrades to a shorter "
                "codebook instead, if that is acceptable)"
            )
        seeds = _codes_from_rows(seed_rows, n_sub=n_sub, sub_dim=sub_dim)
        out = []
        for m in range(n_sub):
            chunk = base.select(
                F.slice(F.col("v"), m * sub_dim + 1, sub_dim).alias("ch")
            )
            cents = [_unit(c) or list(c) for c in seeds[m]]
            for _ in range(iters):
                lit = dlit2(cents)
                stats = (
                    chunk.select(
                        _pq_best_code(F.col("ch"), lit).alias("code"),
                        quantize(F.col("ch")).alias("qch"),
                    )
                    .groupBy("code")
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        *[
                            F.sum(F.element_at("qch", d + 1)).alias(f"s{d}")
                            for d in range(sub_dim)
                        ],
                    )
                )
                rows = {int(r["code"]): r for r in stats.collect()}
                new_cents = []
                for j in range(n_codes):
                    r = rows.get(j)
                    if r is None:
                        new_cents.append(cents[j])  # empty cluster: keep
                        continue
                    n = int(r["n"]) * QUANT
                    mean = [int(r[f"s{d}"]) / n for d in range(sub_dim)]
                    new_cents.append(_unit(mean) or cents[j])
                cents = new_cents
            out.append(cents)
        return out
    finally:
        base.unpersist()


def _pq_best_code(ch: Column, codes_lit: Column) -> Column:
    """0-based argmin-squared-L2 code id of chunk ``ch`` over a code
    literal (struct-min: ties → lowest code id — the tie order both
    engines and the Arrow kernel share). For UNIT-NORM codes,
    ``argmin |ch-c|² = argmin (|ch|² - 2·ch·c + 1) = argmax ch·c`` —
    the property that lets :func:`spherical_pq_codebook` reuse the
    existing L2 encoder unchanged for cosine workloads."""

    def fold(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    best = F.array_min(
        F.transform(
            codes_lit,
            lambda c, i: F.struct(
                fold(
                    F.zip_with(ch, c, lambda x, y: (x - y) * (x - y))
                ).alias("d"),
                i.alias("i"),
            ),
        )
    )
    return best.getField("i")


def pq_reconstruct(vcol: Column, codes: list[list[list[float]]]) -> Column:
    """PQ-encode-then-reconstruct as ONE expression: per subspace,
    argmin-L2 over that subspace's code literal (ties → lowest code
    id — both engines), concat the chosen codes back into a full
    vector. Pure map over a constant codebook literal; at 100 TB the
    stored form is the ``n_sub`` small code IDS (this reconstruction
    runs at scan time from the broadcast codebook)."""
    n_sub = len(codes)
    sub_dim = len(codes[0][0])
    parts = []
    for m in range(n_sub):
        lit = dlit2(codes[m])
        ch = F.slice(vcol, m * sub_dim + 1, sub_dim)
        parts.append(F.element_at(lit, _pq_best_code(ch, lit) + 1))
    return F.concat(*parts)


#: route PQ encoding through the Arrow kernel when the codebook folds
#: (n_sub × n_codes) reach this size — below it the literal expression
#: tree is small enough that per-call driver planning stays cheap.
PQ_ARROW_MIN_FOLDS = 64


def _pq_reconstruct_arrow(
    df: DataFrame,
    codes: list[list[list[float]]],
    *,
    vec_col: str = "v",
    out_col: str = "r",
) -> DataFrame:
    """Arrow/numpy twin of :func:`pq_reconstruct` with BIT-IDENTICAL
    output: per subspace, the squared-L2 fold accumulates one
    dimension at a time from 0.0 (``acc = acc + diff*diff`` — the
    exact IEEE sequence of the expression fold), and ``np.argmin`` is
    first-minimum, matching the struct-min's lowest-code-id tie
    order. Parity pinned by
    ``test_llm_ops.test_pq_reconstruct_paths_are_bit_identical``.

    Why it exists (same driver-cost profile as the r10 ANN audit
    fix): the literal encode tree is ~n_sub·n_codes·sub_dim·4 nodes
    (~8k at the default 8×32×8) and costs ~1.3 s of per-call driver
    analysis/codegen while EXECUTION is ~0.1 s; the kernel keeps the
    plan a single MapInPandas node. Pure map — nothing shuffles; only
    the big corpus side goes through here (filters do not push below
    a Python map)."""
    import numpy as np

    n_sub = len(codes)
    sub_dim = len(codes[0][0])
    codes_np = [np.asarray(cm, dtype=np.float64) for cm in codes]
    in_schema = df.schema
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in in_schema)
        + f", {out_col} array<double>"
    )

    def rebuild(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]],
                dtype=np.float64,
            )
            R = np.empty_like(V)
            for m in range(n_sub):
                C = codes_np[m]  # (K, sub_dim)
                ch = V[:, m * sub_dim : (m + 1) * sub_dim]
                acc = np.zeros((ch.shape[0], C.shape[0]), dtype=np.float64)
                for d in range(sub_dim):
                    diff = ch[:, d, None] - C[None, :, d]
                    acc = acc + diff * diff
                R[:, m * sub_dim : (m + 1) * sub_dim] = C[
                    np.argmin(acc, axis=1)
                ]
            out = {f.name: pdf[f.name] for f in in_schema}
            out[out_col] = list(R)
            yield pd.DataFrame(out)

    return df.mapInPandas(rebuild, schema=out_schema)


def pq_audit_sampled(
    emb: DataFrame,
    *,
    n_sub: int,
    sub_dim: int,
    n_codes: int,
    n_queries: int = 10,
    k: int = 5,
    n_cand: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sampled-codebook PQ recall audit with ONE ordered-limit collect
    feeding both the codebook and the (prefix) query panel — the
    single-job discipline the bench-flagged ``emb_pq_audit`` query is
    held to."""
    if n_queries > n_codes:
        raise ValueError(
            f"n_queries ({n_queries}) must be <= n_codes ({n_codes}) "
            "for the one-collect prefix-panel path; call "
            "sampled_pq_codebook + pq_recall_table separately otherwise"
        )
    v = F.col(vec_col).cast("array<double>")
    rows = (
        fan_out(emb)
        .select(F.col(id_col).alias("vec_id"), v.alias("v"))
        .orderBy("vec_id")
        .limit(n_codes)
        .collect()
    )
    codes = _codes_from_rows(rows, n_sub=n_sub, sub_dim=sub_dim)
    return pq_recall_table(
        emb,
        codes,
        n_queries=n_queries,
        k=k,
        n_cand=n_cand,
        id_col=id_col,
        vec_col=vec_col,
        panel_rows=[
            (r["vec_id"], [float(x) for x in r["v"]])
            for r in rows[:n_queries]
        ],
    )


def pq_recall_table(
    emb: DataFrame,
    codes: list[list[list[float]]],
    *,
    n_queries: int = 10,
    k: int = 5,
    n_cand: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    panel_rows: list[tuple] | None = None,
) -> DataFrame:
    """The PQ recall audit as a reusable operator (one row per panel
    query: ``qid, k, n_hit_adc, n_hit_rerank``): raw-ADC top-k recall
    and recall after exact re-rank of the top-``n_cand`` ADC
    candidates, against the exact-cosine truth. Works with either
    codebook builder; the registered ``emb_pq_audit`` query pins the
    sampled baseline against its DuckDB replay, and the trained
    codebook's lift is pinned by pytest. ``panel_rows`` (pre-collected
    ``(id, vec)`` pairs) skips the panel's own top-k job when the
    caller already holds the rows."""
    spark = emb.sparkSession

    def fold(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    def cos(a, b):
        return fold(F.zip_with(a, b, lambda x, y: x * y)) / (
            F.sqrt(fold(F.zip_with(a, a, lambda x, y: x * y)))
            * F.sqrt(fold(F.zip_with(b, b, lambda x, y: x * y)))
        )

    v = F.col(vec_col).cast("array<double>")
    base = fan_out(emb).select(F.col(id_col).alias("vec_id"), v.alias("v"))
    if panel_rows is None:
        panel_rows = [
            (r["vec_id"], [float(x) for x in r["v"]])
            for r in base.orderBy("vec_id").limit(n_queries).collect()
        ]
    panel = spark.createDataFrame(
        [(int(i), [float(x) for x in vec]) for i, vec in panel_rows],
        "qid long, qv array<double>",
    )
    if len(codes) * len(codes[0]) >= PQ_ARROW_MIN_FOLDS and _HAVE_NUMPY:
        enc = _pq_reconstruct_arrow(base, codes, vec_col="v", out_col="r")
    else:
        enc = base.select(
            "vec_id", "v", pq_reconstruct(F.col("v"), codes).alias("r")
        )
    pairs = (
        enc.join(F.broadcast(panel))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            cos(F.col("v"), F.col("qv")).alias("s_exact"),
            cos(F.col("r"), F.col("qv")).alias("s_adc"),
        )
    )
    from pyspark.sql import Window

    w_e = Window.partitionBy("qid").orderBy(F.desc("s_exact"), "vec_id")
    w_a = Window.partitionBy("qid").orderBy(F.desc("s_adc"), "vec_id")
    rk = pairs.select(
        "qid",
        "vec_id",
        "s_exact",
        F.row_number().over(w_e).alias("rk_e"),
        F.row_number().over(w_a).alias("rk_a"),
    )
    rr = rk.where(F.col("rk_a") <= n_cand).select(
        "qid",
        "rk_e",
        F.row_number().over(w_e).alias("rk_rr"),
    )
    hits_adc = (
        rk.where((F.col("rk_e") <= k) & (F.col("rk_a") <= k))
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    hits_rr = (
        rr.where((F.col("rk_e") <= k) & (F.col("rk_rr") <= k))
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_r"))
    )
    return (
        panel.select("qid")
        .join(hits_adc, "qid", "left")
        .join(hits_rr, "qid", "left")
        .select(
            "qid",
            F.lit(k).cast("long").alias("k"),
            F.coalesce("n_a", F.lit(0)).cast("long").alias("n_hit_adc"),
            F.coalesce("n_r", F.lit(0)).cast("long").alias("n_hit_rerank"),
        )
        .orderBy("qid")
    )


def pq_encode(vcol: Column, codes: list[list[list[float]]]) -> Column:
    """PQ-encode a vector to its ``n_sub`` code IDS (array<int>) — the
    stored form of a quantized index entry (``n_sub`` small ints per
    vector instead of the full float vector). Same argmin/tie order as
    :func:`pq_reconstruct` (they share :func:`_pq_best_code`)."""
    n_sub = len(codes)
    sub_dim = len(codes[0][0])
    ids = []
    for m in range(n_sub):
        ch = F.slice(vcol, m * sub_dim + 1, sub_dim)
        ids.append(_pq_best_code(ch, dlit2(codes[m])).cast("int"))
    return F.array(*ids)


def _pq_encode_arrow(
    df: DataFrame,
    codes: list[list[list[float]]],
    *,
    vec_col: str = "v",
    out_col: str = "codes",
) -> DataFrame:
    """Arrow twin of :func:`pq_encode` with BIT-IDENTICAL code ids:
    the same sequential squared-L2 fold per dimension from 0.0 and
    ``np.argmin`` first-minimum tie order as
    :func:`_pq_reconstruct_arrow` — it just emits the argmin INDEX
    instead of gathering the code vector. Used by
    :func:`build_ivfpq_index` above the same fold threshold as the
    reconstruction kernel (the encode literal tree is the r11 driver-
    cost offender; the kernel keeps the build plan one MapInPandas)."""
    import numpy as np

    n_sub = len(codes)
    sub_dim = len(codes[0][0])
    codes_np = [np.asarray(cm, dtype=np.float64) for cm in codes]
    in_schema = df.schema
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in in_schema)
        + f", {out_col} array<int>"
    )

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]],
                dtype=np.float64,
            )
            ids = np.empty((V.shape[0], n_sub), dtype=np.int32)
            for m in range(n_sub):
                C = codes_np[m]
                ch = V[:, m * sub_dim : (m + 1) * sub_dim]
                acc = np.zeros((ch.shape[0], C.shape[0]), dtype=np.float64)
                for d in range(sub_dim):
                    diff = ch[:, d, None] - C[None, :, d]
                    acc = acc + diff * diff
                ids[:, m] = np.argmin(acc, axis=1)
            out = {f.name: pdf[f.name] for f in in_schema}
            out[out_col] = list(ids)
            yield pd.DataFrame(out)

    return df.mapInPandas(encode, schema=out_schema)


def build_ivfpq_index(
    emb: DataFrame,
    path: str,
    *,
    n_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 32,
    codebook: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tune_nprobe: bool = True,
) -> None:
    """Persist the corpus as an IVF-PQ inverted file — the faiss
    serving architecture and THE memory lever at 100 TB: each entry
    stores ``(vec_id, codes)`` where ``codes`` is the vector's
    ``n_sub`` PQ code ids (conceptually ``n_sub`` bytes vs 256 B fp32;
    the full float vector is NOT in the index — exact re-rank fetches
    it from the primary store by id). Entries land under their
    argmax-dot IVF list (``lst=<k>`` partitions, same routing as
    :func:`build_ivf_index`), the deterministic sampled codebook rides
    in the ``_ann_meta.json`` sidecar, and a query is a partition-
    pruned scan of ``nprobe`` lists scoring candidates from two tiny
    per-query lookup tables (:func:`query_ivfpq_index`).

    Encode goes through the Arrow kernel above the same fold threshold
    as the audit path (:func:`_pq_encode_arrow` — bit-exact, pinned).
    The default codebook is sampled (lowest-id chunks) so the DuckDB
    oracle of ``sim_ann_serve_ivfpq`` replays the ENTIRE index
    deterministically in SQL; pass ``codebook=`` (e.g.
    :func:`spherical_pq_codebook` output) for cosine-heavy corpora —
    the index format, meta sidecar and query path are identical."""
    codes = (
        codebook
        if codebook is not None
        else sampled_pq_codebook(
            emb, n_sub=n_sub, sub_dim=sub_dim, n_codes=n_codes,
            id_col=id_col, vec_col=vec_col,
        )
    )
    if len(codes) != n_sub or any(len(cm) != n_codes for cm in codes) or any(
        len(c) != sub_dim for cm in codes for c in cm
    ):
        raise ValueError(
            f"codebook shape {len(codes)}x"
            f"{len(codes[0]) if codes else 0} does not match "
            f"n_sub={n_sub}, n_codes={n_codes}, sub_dim={sub_dim}"
        )
    v = F.col(vec_col).cast("array<double>")
    base = fan_out(emb).select(
        F.col(id_col).alias("vec_id"),
        v.alias("v"),
        ivf_list_of(v).alias("lst"),
    )
    enc = _ivfpq_encode(base, codes, n_sub=n_sub, n_codes=n_codes)
    (
        enc.select("vec_id", "codes", "lst")
        .withColumn("batch", F.lit(0))
        .write.mode("overwrite")
        .partitionBy("batch", "lst")
        .parquet(path)
    )
    meta = {
        "kind": "ivfpq",
        "n_lists": IVF_LISTS,
        "n_sub": n_sub,
        "sub_dim": sub_dim,
        "n_codes": n_codes,
        "codebook": codes,
    }
    if tune_nprobe:
        meta.update(
            _tuned_nprobe_meta(
                emb, centroids=None, id_col=id_col, vec_col=vec_col
            )
        )
    _write_ann_meta(emb.sparkSession, path, meta)


def _ivfpq_encode(
    base: DataFrame,
    codes: list[list[list[float]]],
    *,
    n_sub: int,
    n_codes: int,
) -> DataFrame:
    """(vec_id, v, lst, codes) for (vec_id, v, lst) rows — the shared
    encode step of the batch build and the streaming ingest (Arrow
    kernel above the fold threshold, bit-exact either way)."""
    if n_sub * n_codes >= PQ_ARROW_MIN_FOLDS and _HAVE_NUMPY:
        return _pq_encode_arrow(base, codes, vec_col="v", out_col="codes")
    return base.withColumn("codes", pq_encode(F.col("v"), codes))


def ivfpq_ingest_foreach_batch(
    spark,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: list | None = None,
):
    """``foreachBatch`` body growing a persisted IVF-PQ index under
    at-least-once delivery — the codes-only twin of
    :func:`lsh_ingest_foreach_batch`. The index MUST already exist
    (:func:`build_ivfpq_index` on a seed corpus): the frozen quantizer
    — the codebook in the meta sidecar plus the fixed IVF routing —
    is what makes incremental growth exact, since every batch encodes
    with the SAME codebook the queries' ADC lookup tables are built
    from (re-sampling a codebook per batch would silently change what
    stored code ids MEAN). Each micro-batch lands under
    ``batch=<id>/lst=<k>`` via up-front delete + append — redelivery
    replaces its own subtree, never duplicates. Append-only ids."""
    def encode(batch_df: DataFrame, meta: dict) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        base = fan_out(batch_df).select(
            F.col(id_col).alias("vec_id"),
            v.alias("v"),
            ivf_list_of(v).alias("lst"),
        )
        return _ivfpq_encode(
            base,
            meta["codebook"],
            n_sub=int(meta["n_sub"]),
            n_codes=int(meta["n_codes"]),
        ).select("vec_id", "codes", "lst")

    return _codes_ingest_foreach_batch(
        spark,
        path,
        kind="ivfpq",
        kind_label="IVF-PQ",
        builder_name="build_ivfpq_index",
        contract="codebook",
        encode=encode,
        stats=stats,
    )


def _codes_ingest_foreach_batch(
    spark,
    path: str,
    *,
    kind: str,
    kind_label: str,
    builder_name: str,
    contract: str,
    encode,
    stats: list | None,
):
    """Shared ``foreachBatch`` scaffold for the codes-only inverted
    files (IVF-PQ, IVF-SQ8): meta-kind guard, the batch-0 seed
    collision guard, up-front redelivery delete, empty-batch stats,
    and the ``batch=<id>/lst=<k>`` append. ``encode(batch_df, meta)``
    supplies the per-kind (vec_id, codes, lst) frame — the ONLY part
    that differs between kinds, so a fix to the redelivery mechanics
    lands everywhere at once (r12 self-review)."""
    from meteo_etl_spark.operators.fsio import io_for

    io = io_for(path, spark)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        meta = _read_ann_meta(spark, path)
        if meta is None or meta.get("kind") != kind:
            raise ValueError(
                f"no {kind_label} index at {path} — {builder_name} a seed "
                f"corpus first; the stored {contract} is the contract "
                "every ingested batch must encode with"
            )
        if int(batch_id) == 0:
            raise ValueError(
                "batch id 0 is reserved for the seed build partition; "
                "start the ingest stream against a fresh checkpoint "
                "AFTER the seed build (ids from a checkpointed stream "
                "are monotonic, so only a stream that predates the "
                "build can collide)"
            )
        io.rmtree(f"{path.rstrip('/')}/batch={int(batch_id)}")
        if batch_df.isEmpty():
            if stats is not None:
                stats.append({"batch_id": batch_id, "n_rows": 0})
            return
        (
            encode(batch_df, meta)
            .withColumn("batch", F.lit(int(batch_id)))
            .write.mode("append")
            .partitionBy("batch", "lst")
            .parquet(path)
        )
        if stats is not None:
            stats.append({"batch_id": batch_id, "n_rows": batch_df.count()})

    return handle


def query_ivfpq_index(
    spark,
    path: str,
    query_vec: list[float],
    emb_full: DataFrame,
    *,
    k: int = 5,
    n_cand: int = 100,
    nprobe: int | None = None,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve top-k from an IVF-PQ index: probe lists and the per-query
    ADC LOOKUP TABLES are computed driver-side (``n_sub × n_codes``
    dot products on constants — the classic ADC trick), the pruned
    scan scores each candidate with ``2·n_sub`` literal lookups and a
    sequential fold (NO per-row vector math — the index doesn't even
    contain vectors), the top ``n_cand`` ADC candidate IDS are
    collected (one tiny driver list) and PUSHED into the primary-store
    scan (``emb_full``) as an ``isin`` filter — PushedFilters and
    row-group skipping, where a join would read the whole store and
    discard post-scan — then exact cosine re-ranks them and the
    exact top-k ships. I/O: ``nprobe`` partitions of ``n_sub``-byte
    codes + ``n_cand`` full vectors — at 100 TB this is the difference
    between scanning terabytes of floats and megabytes of codes.

    FP discipline (oracle parity): LUT entries are driver-side Python
    folds (:func:`_dot_py` — IEEE doubles, engine fold order), the
    candidate score folds LUT entries sequentially in subspace order
    from 0.0, and ADC ties break on vec_id — every value bit-matches
    the DuckDB replay in ``sim_ann_serve_ivfpq``'s oracle."""
    import math

    meta = _read_ann_meta(spark, path)
    if meta is None or meta.get("kind") != "ivfpq":
        raise ValueError(
            f"no IVF-PQ index at {path} (meta: "
            f"{None if meta is None else meta.get('kind')!r})"
        )
    _check_ann_meta(
        spark, path, {"kind": "ivfpq", "n_lists": IVF_LISTS}, meta=meta
    )
    nprobe = _resolve_nprobe(nprobe, meta)
    codes = meta["codebook"]
    n_sub = int(meta["n_sub"])
    sub_dim = int(meta["sub_dim"])

    qv = [float(x) for x in query_vec]
    dots = [_dot_py(qv, ivf_centroid(j)) for j in range(IVF_LISTS)]
    order = sorted(range(IVF_LISTS), key=lambda j: (-dots[j], j))
    probes = [j + 1 for j in order[:nprobe]]
    # per-query ADC lookup tables: dot(code, q_chunk) and |code|² per
    # (subspace, code id) — n_sub·n_codes scalars on constants
    lut_dot = [
        [_dot_py(c, qv[m * sub_dim : (m + 1) * sub_dim]) for c in codes[m]]
        for m in range(n_sub)
    ]
    lut_nrm = [[_dot_py(c, c) for c in codes[m]] for m in range(n_sub)]
    q_norm = math.sqrt(_dot_py(qv, qv))

    cand = spark.read.parquet(path).filter(F.col("lst").isin(probes))
    if exclude_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_id)
    cand = _suppress_tombstones(spark, path, cand)

    def lut_fold(lut):
        table = dlit2(lut)
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(n_sub - 1)),
            F.lit(0.0),
            lambda acc, m: acc
            + F.element_at(
                F.element_at(table, m + 1),
                F.element_at(F.col("codes"), m + 1) + 1,
            ),
        )

    adc = cand.select(
        "vec_id",
        (
            lut_fold(lut_dot)
            / (F.sqrt(lut_fold(lut_nrm)) * F.lit(q_norm))
        ).alias("s_adc"),
    )
    return _pruned_shortlist_rerank(
        adc,
        emb_full,
        qv,
        k=k,
        n_cand=n_cand,
        id_col=id_col,
        vec_col=vec_col,
        what="IVF-PQ",
    )


def _pruned_shortlist_rerank(
    adc: DataFrame,
    emb_full: DataFrame,
    qv: list[float],
    *,
    k: int,
    n_cand: int,
    id_col: str,
    vec_col: str,
    what: str,
) -> DataFrame:
    """Shared tail of every codes-only serve path (IVF-PQ, IVF-SQ8):
    top-``n_cand`` by approximate score from the pruned index scan,
    then exact re-rank against the PRIMARY store with the id
    shortlist PUSHED into its scan.

    Partition pruning is a CONTRACT of these serve paths, enforced on
    every call (the shortlist collect below executes the plan, so a
    caller could no longer inspect it afterwards): refuse to serve
    from an unpruned candidate scan. The collected shortlist is
    n_cand ids pushed as an isin filter (PushedFilters → row-group
    skipping) — re-rank I/O really is n_cand vectors, not a full scan
    a join would only discard post-read (r12 self-review)."""
    import re

    shortlist = adc.orderBy(F.desc("s_adc"), "vec_id").limit(n_cand)
    plan = shortlist._jdf.queryExecution().executedPlan().toString()
    hit = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    if not (hit and hit.group(1).strip()):
        raise RuntimeError(
            f"{what} candidate scan is not partition-pruned:\n" + plan
        )
    short = [r["vec_id"] for r in shortlist.collect()]
    v = F.col(vec_col).cast("array<double>")
    full = (
        fan_out(emb_full.filter(F.col(id_col).isin(short)))
        .select(F.col(id_col).alias("vec_id"), v.alias("v"))
    )
    qcol = dlit(qv)
    return (
        full.select("vec_id", cosine(F.col("v"), qcol).alias("sim_raw"))
        .orderBy(F.desc("sim_raw"), "vec_id")
        .limit(k)
        .select("vec_id", F.round("sim_raw", 6).alias("sim"))
    )


#: the audited serving routes and their persisted-index parameters —
#: what `build_ann_index`/`query_ann_index` dispatch on. The brute
#: route needs no index (it IS the exact scan).
ANN_ROUTE_PARAMS = {
    "ivf": {},
    "lsh_tuned": {
        "n_tables": LSH_TUNED_TABLES,
        "n_planes": LSH_TUNED_PLANES,
        "max_hamming": LSH_TUNED_HAMMING,
    },
    "lsh_deep": {
        "n_tables": LSH_DEEP_TABLES,
        "n_planes": LSH_DEEP_PLANES,
        "max_hamming": LSH_DEEP_HAMMING,
    },
}


def build_ann_index(
    route: str,
    emb: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tune_nprobe: bool = True,
) -> None:
    """Build the persisted index FOR a chosen route — the missing arc
    that closes the audit loop (r10 verdict order #3):
    ``ann_route_audit`` measures, ``choose_ann_route`` decides, THIS
    materializes the decision, and ``query_ann_index`` serves from
    it. The route string is exactly what ``choose_ann_route``
    returns; each route's index parameters are pinned in
    ``ANN_ROUTE_PARAMS`` so build and query can never disagree on
    shape."""
    if route not in ANN_ROUTE_PARAMS:
        raise ValueError(
            f"unknown ANN route {route!r}; expected one of "
            f"{sorted(ANN_ROUTE_PARAMS)}"
        )
    if route == "ivf":
        build_ivf_index(
            emb, path, id_col=id_col, vec_col=vec_col,
            tune_nprobe=tune_nprobe,
        )
    else:
        p = ANN_ROUTE_PARAMS[route]
        build_lsh_index(
            emb,
            path,
            id_col=id_col,
            vec_col=vec_col,
            n_tables=p["n_tables"],
            n_planes=p["n_planes"],
        )


def query_ann_index(
    route: str,
    spark,
    path: str,
    query_vec: list[float],
    *,
    k: int = 5,
    exclude_id: int | None = None,
    nprobe: int | None = None,
) -> DataFrame:
    """Serve top-k from the persisted index built by
    :func:`build_ann_index` for the same route: partition-pruned scan
    of the probed lists/buckets, exact-cosine re-rank — the plan
    carries PartitionFilters either way (asserted by the serving
    e2e tests). ``nprobe`` applies to the ivf route only (None =
    the index's tuned default); LSH routes probe by bucket."""
    if route not in ANN_ROUTE_PARAMS:
        raise ValueError(
            f"unknown ANN route {route!r}; expected one of "
            f"{sorted(ANN_ROUTE_PARAMS)}"
        )
    if route == "ivf":
        return query_ivf_index(
            spark, path, query_vec, k=k, exclude_id=exclude_id,
            nprobe=nprobe,
        )
    p = ANN_ROUTE_PARAMS[route]
    return query_lsh_index(
        spark,
        path,
        query_vec,
        k=k,
        exclude_id=exclude_id,
        max_hamming=p["max_hamming"],
        n_tables=p["n_tables"],
        n_planes=p["n_planes"],
    )


def ann_recall(
    emb: DataFrame,
    *,
    n_queries: int = 10,
    k: int = 5,
    max_hamming: int = 0,
    n_tables: int = LSH_TABLES,
    n_planes: int = LSH_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the LSH candidate route against exact brute force,
    one row per query vector (ids < ``n_queries``).

    The evaluation harness every ANN deployment needs BEFORE trusting
    bucket routing at scale: both the exact ranking and the
    candidate-restricted ranking are computed from ONE scored frame
    (corpus x broadcast query panel, cosine once per pair), so truth
    and approximation can never diverge on scoring. One shuffle on the
    query id serves both row_number rankings and the final aggregate.
    Cost is n_queries exact scans — an offline audit run on a sample,
    not a serving path. ``max_hamming`` > 0 audits the multi-probe
    route (``ann_multiprobe_topk``) instead of exact-bucket routing;
    ``n_tables``/``n_planes`` audit alternative index shapes (e.g. the
    recall-tuned ``LSH_TUNED_*`` configuration) without rebuilding
    anything — buckets are recomputed from the deterministic
    hyperplanes."""
    v = F.col(vec_col).cast("array<double>")
    specs = [(f"b{t}", t, n_planes) for t in range(n_tables)]
    if n_tables * n_planes >= BUCKET_ARROW_MIN_DOTS and _HAVE_NUMPY:
        # heavy audit shapes (e.g. the tuned 8x6 config) project at
        # Arrow speed; the bit-exact twin of the expression below
        corpus = _project_ann_arrow(
            fan_out(emb),
            id_col=id_col,
            vec_col=vec_col,
            bucket_specs=specs,
            with_ivf=None,
        )
    else:
        corpus = fan_out(emb).select(
            F.col(id_col).alias("vec_id"),
            v.alias("v"),
            *[_bucket(v, t, n_planes).alias(f"b{t}") for t in range(n_tables)],
        )
    # the panel is n_queries rows: collect its vectors and compute
    # the buckets driver-side (bit-identical Python twins) — building
    # the L·P·dim expression tree for a 10-row side costs seconds of
    # per-call driver analysis/codegen for zero data-side benefit
    panel_rows = (
        emb.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("vec_id"), v.alias("v"))
        .collect()
    )
    id_type = dict(
        (f.name, f.dataType.simpleString()) for f in emb.schema.fields
    )[id_col]
    q_schema = f"qid {id_type}, qv array<double>, " + ", ".join(
        f"qb{t} string" for t in range(n_tables)
    )
    q = emb.sparkSession.createDataFrame(
        [
            (
                r["vec_id"],
                list(r["v"]),
                *[
                    _bucket_py(list(r["v"]), t, n_planes)
                    for t in range(n_tables)
                ],
            )
            for r in panel_rows
        ],
        q_schema,
    )
    match_any = None
    for t in range(n_tables):
        m = (
            (F.col(f"b{t}") == F.col(f"qb{t}"))
            if max_hamming == 0
            else (
                _hamming(F.col(f"b{t}"), F.col(f"qb{t}"), n_planes)
                <= max_hamming
            )
        )
        match_any = m if match_any is None else match_any | m
    scored = (
        corpus.join(F.broadcast(q), on=F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            cosine(F.col("v"), F.col("qv")).alias("sim_raw"),
            match_any.alias("cand"),
        )
    )
    from pyspark.sql import Window

    wq = Window.partitionBy("qid").orderBy(F.desc("sim_raw"), "vec_id")
    truth = (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id")
    )
    approx = (
        scored.filter(F.col("cand"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", F.lit(1).alias("hit"))
    )
    return (
        truth.join(approx, ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.count("hit").alias("n_hit"),
        )
        .select(
            F.col("qid").alias("query_id"),
            "k",
            "n_hit",
            F.round(F.col("n_hit").cast("double") / F.col("k"), 4).alias("recall"),
        )
        .orderBy("query_id")
    )


def _hamming(a: Column, b: Column, bits: int = LSH_PLANES) -> Column:
    """Positional Hamming distance between two P-char bit strings —
    P codegen'd substring compares, no UDF."""
    terms = [
        F.when(
            F.substring(a, p + 1, 1) != F.substring(b, p + 1, 1), 1
        ).otherwise(0)
        for p in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def ann_multiprobe_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 5,
    *,
    max_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al., VLDB'07): candidates come from
    every bucket within ``max_hamming`` sign flips of the query's
    bucket in ANY table, then exact cosine re-rank.

    The recall lever that costs no extra tables or index space: a
    near-neighbor that lands one sign flip away (a projection near the
    hyperplane) is recovered by probing the adjacent buckets —
    P+1 probes per table at h<=1 instead of 1, multiplying the
    candidate set ~(P+1)x and the measured recall with it (see
    sim_ann_recall / R7_NEWOPS.md: the single-probe config audits
    poorly on this corpus). At 100 TB with the bucket-partitioned
    index the probe set is still a handful of partitions."""
    v = F.col(vec_col).cast("array<double>")
    corpus = fan_out(emb).select(
        F.col(id_col).alias("vec_id"),
        v.alias("v"),
        *[_bucket(v, t).alias(f"b{t}") for t in range(LSH_TABLES)],
    )
    q = corpus.filter(F.col("vec_id") == query_id).select(
        F.col("v").alias("qv"),
        *[F.col(f"b{t}").alias(f"qb{t}") for t in range(LSH_TABLES)],
    )
    match_any = None
    for t in range(LSH_TABLES):
        m = _hamming(F.col(f"b{t}"), F.col(f"qb{t}")) <= max_hamming
        match_any = m if match_any is None else match_any | m
    return (
        corpus.filter(F.col("vec_id") != query_id)
        .join(F.broadcast(q), on=match_any)
        .select("vec_id", cosine(F.col("v"), F.col("qv")).alias("sim_raw"))
        .orderBy(F.desc("sim_raw"), "vec_id")
        .limit(k)
        .select("vec_id", F.round("sim_raw", 6).alias("sim"))
    )


# --- serving-route selection ------------------------------------------------

#: decision thresholds for choose_ann_route, as INTEGER percents so
#: both engines compare exact integers (no float threshold ==).
#: recall >= 90% of exact top-k AND candidate fraction <= 20% of the
#: corpus — a route that misses either is not fit to serve.
ANN_ROUTE_RECALL_MIN_PCT = 90
ANN_ROUTE_FRAC_MAX_PCT = 20

#: the serving routes the audit adjudicates. IVF doubles as the
#: FALLBACK when nothing qualifies: its probe cost is structurally
#: bounded (nprobe / nlists of the corpus per query — and at real
#: scale nlists is 10^4-10^5 trained centroids, not the 8 demo
#: literals here), so an unstructured corpus where no sign-LSH shape
#: is both accurate and selective serves via centroid routing rather
#: than defaulting to a 0.6-candidate-fraction LSH scan.
ANN_ROUTES = ("ivf", "lsh_deep", "lsh_tuned")


def ann_route_audit(
    emb: DataFrame,
    *,
    n_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[dict]:
    """Audit EVERY serving route on one corpus: per route, exact
    integer counters ``n_hit`` (truth top-k members the route's
    candidate-restricted top-k recovers, summed over the query
    panel), ``cand`` (candidate pairs admitted) and ``pairs`` (all
    scored pairs) — the recall-vs-selectivity evidence
    ``choose_ann_route`` adjudicates.

    One scored frame serves all three routes (corpus x broadcast
    query panel, cosine once per pair, every route's candidate
    predicate as a column), so routes can never diverge on scoring;
    every route's truth-hit, candidate and pair counters fold into
    ONE aggregate row over that frame — a single action, a single
    (qid)-keyed shuffle, no per-route rescans. The query panel is
    the n_queries LOWEST ids (any id type — dense integers are not
    assumed): its (id, vec) rows are COLLECTED (one tiny top-k job)
    and its buckets/probes computed driver-side via the bit-exact
    Python twins (``_bucket_py`` / ``_ivf_probes_py``), so the
    ~100-dot corpus projection runs exactly once (Arrow kernel) and
    no n-thousand-node panel expression tree ever reaches the
    analyzer. Offline audit cost — n_queries exact scans — NOT a
    serving path."""
    from pyspark.sql import Window

    v = F.col(vec_col).cast("array<double>")
    specs = [
        (f"bt{t}", t, LSH_TUNED_PLANES) for t in range(LSH_TUNED_TABLES)
    ] + [(f"bd{t}", t, LSH_DEEP_PLANES) for t in range(LSH_DEEP_TABLES)]
    n_dots = sum(p for _, _, p in specs) + IVF_LISTS
    if n_dots >= BUCKET_ARROW_MIN_DOTS and _HAVE_NUMPY:
        # ~104 dots per corpus row: Arrow kernel (bit-exact twin)
        corpus = _project_ann_arrow(
            fan_out(emb),
            id_col=id_col,
            vec_col=vec_col,
            bucket_specs=specs,
            with_ivf="lst",
        )
    else:  # pragma: no cover — numpy is baked into this environment
        corpus = fan_out(emb).select(
            F.col(id_col).alias("vec_id"),
            v.alias("v"),
            *[_bucket(v, t, p).alias(name) for name, t, p in specs],
            ivf_list_of(v).alias("lst"),
        )
    # The panel is n_queries rows — its buckets/probes are computed
    # DRIVER-SIDE from the collected vectors (bit-identical Python
    # twins of the engine folds). Building the ~100-dot expression
    # tree for a 10-row side costs seconds of per-call driver
    # analysis/codegen and nothing at all in data terms; collecting
    # n_queries (id, vec) rows is one tiny job.
    panel_rows = (
        fan_out(emb)
        .select(F.col(id_col).alias("vec_id"), v.alias("v"))
        .orderBy("vec_id")
        .limit(n_queries)
        .collect()
    )
    id_type = dict(
        (f.name, f.dataType.simpleString()) for f in emb.schema.fields
    )[id_col]
    q_schema = (
        f"qid {id_type}, qv array<double>, "
        + ", ".join(f"qbt{t} string" for t in range(LSH_TUNED_TABLES))
        + ", "
        + ", ".join(f"qbd{t} string" for t in range(LSH_DEEP_TABLES))
        + ", p1 bigint, p2 bigint"
    )
    q_data = []
    for r in panel_rows:
        vec = list(r["v"])
        p1, p2 = _ivf_probes_py(vec)
        q_data.append(
            (
                r["vec_id"],
                vec,
                *[_bucket_py(vec, t, LSH_TUNED_PLANES) for t in range(LSH_TUNED_TABLES)],
                *[_bucket_py(vec, t, LSH_DEEP_PLANES) for t in range(LSH_DEEP_TABLES)],
                p1,
                p2,
            )
        )
    q = emb.sparkSession.createDataFrame(q_data, q_schema)

    def any_match(prefix: str, n_tables: int, planes: int, h: int):
        out = None
        for t in range(n_tables):
            m = _hamming(F.col(f"{prefix}{t}"), F.col(f"q{prefix}{t}"), planes) <= h
            out = m if out is None else out | m
        return out

    scored = corpus.join(
        F.broadcast(q), on=F.col("vec_id") != F.col("qid")
    ).select(
        "qid",
        "vec_id",
        cosine(F.col("v"), F.col("qv")).alias("sim_raw"),
        any_match(
            "bt", LSH_TUNED_TABLES, LSH_TUNED_PLANES, LSH_TUNED_HAMMING
        ).alias("cand_lsh_tuned"),
        any_match(
            "bd", LSH_DEEP_TABLES, LSH_DEEP_PLANES, LSH_DEEP_HAMMING
        ).alias("cand_lsh_deep"),
        ((F.col("lst") == F.col("p1")) | (F.col("lst") == F.col("p2"))).alias(
            "cand_ivf"
        ),
    )
    # One (qid)-keyed window ranks ALL pairs; a route's
    # candidate-restricted rank is the running count of its candidate
    # flag under the same total order (for a candidate row, the
    # cumulative sum IS its rank among candidates). Truth membership
    # (global rank <= k) and per-route approx membership (candidate
    # AND candidate-rank <= k) then reduce in one aggregate row —
    # ONE collect for the whole audit.
    wq = Window.partitionBy("qid").orderBy(F.desc("sim_raw"), "vec_id")
    cum = wq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = scored.select(
        "*",
        F.row_number().over(wq).alias("rn_all"),
        *[
            F.sum(F.col(f"cand_{r}").cast("long")).over(cum).alias(f"crn_{r}")
            for r in ANN_ROUTES
        ],
    )
    row = ranked.agg(
        F.count(F.lit(1)).alias("pairs"),
        *[
            F.sum(F.col(f"cand_{r}").cast("long")).alias(f"cand_{r}")
            for r in ANN_ROUTES
        ],
        *[
            F.sum(
                (
                    (F.col("rn_all") <= k)
                    & F.col(f"cand_{r}")
                    & (F.col(f"crn_{r}") <= k)
                ).cast("long")
            ).alias(f"hit_{r}")
            for r in ANN_ROUTES
        ],
    ).collect()[0]
    # an empty corpus (or 1-row corpus: panel joins away every pair)
    # yields NULL sums — report honest zeros, never raise.
    return [
        {
            "route": route,
            "n_hit": int(row[f"hit_{route}"] or 0),
            "cand": int(row[f"cand_{route}"] or 0),
            "pairs": int(row["pairs"] or 0),
            "k": k,
            "n_queries": n_queries,
        }
        for route in ANN_ROUTES
    ]


def _route_qualifies(r: dict, recall_min_pct: int, frac_max_pct: int) -> bool:
    total = r["k"] * r["n_queries"]
    return (
        r["pairs"] > 0  # a route cannot qualify on zero evidence
        and r["n_hit"] * 100 >= recall_min_pct * total
        and r["cand"] * 100 <= frac_max_pct * r["pairs"]
    )


def choose_ann_route(
    audit: list[dict],
    *,
    recall_min_pct: int = ANN_ROUTE_RECALL_MIN_PCT,
    frac_max_pct: int = ANN_ROUTE_FRAC_MAX_PCT,
) -> str:
    """Pick the serving route from :func:`ann_route_audit` evidence:
    among routes meeting BOTH thresholds (exact integer
    cross-multiplied comparisons — no float threshold equality),
    the most selective wins (lowest candidate fraction, ties to
    higher recall then route name); if NO route is both accurate and
    selective, serve via ``ivf`` — the bounded-probe fallback — so
    100 TB serving never silently defaults to an unselective LSH
    scan on an unstructured corpus."""
    qualifying = [
        r for r in audit if _route_qualifies(r, recall_min_pct, frac_max_pct)
    ]
    if not qualifying:
        return "ivf"
    return min(
        qualifying,
        key=lambda r: (r["cand"] / r["pairs"], -r["n_hit"], r["route"]),
    )["route"]


def ann_route_decision_table(
    emb: DataFrame,
    *,
    n_queries: int = 10,
    k: int = 5,
    recall_min_pct: int = ANN_ROUTE_RECALL_MIN_PCT,
    frac_max_pct: int = ANN_ROUTE_FRAC_MAX_PCT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The audit + decision as one certifiable table: one row per
    route with its exact integer evidence (n_hit, cand, pairs), the
    derived recall / candidate fraction, qualification under the
    integer thresholds, and the single chosen row. This is the
    artifact a deployment reviews before trusting a route at scale;
    the registered ``sim_route_choice`` query (plans/llm_queries.py)
    hash-checks this table against a DuckDB replay of the full
    audit + decision. Ratio columns round ENGINE-side (``F.round``,
    HALF_UP — same scheme as the oracle's ``ROUND``); a zero-pair
    audit reports cand_frac 0.0 rather than dividing."""
    audit = ann_route_audit(
        emb, n_queries=n_queries, k=k, id_col=id_col, vec_col=vec_col
    )
    chosen = choose_ann_route(
        audit, recall_min_pct=recall_min_pct, frac_max_pct=frac_max_pct
    )
    spark = emb.sparkSession
    rows = [
        (
            r["route"],
            r["n_hit"],
            r["cand"],
            r["pairs"],
            _route_qualifies(r, recall_min_pct, frac_max_pct),
            r["route"] == chosen,
        )
        for r in sorted(audit, key=lambda x: x["route"])
    ]
    return (
        spark.createDataFrame(
            rows,
            "route string, n_hit long, cand long, pairs long, "
            "qualifies boolean, chosen boolean",
        )
        .select(
            "route",
            "n_hit",
            "cand",
            "pairs",
            F.round(F.col("n_hit") / F.lit(k * n_queries), 4).alias("recall"),
            F.when(
                F.col("pairs") > 0, F.round(F.col("cand") / F.col("pairs"), 4)
            )
            .otherwise(F.lit(0.0))
            .alias("cand_frac"),
            "qualifies",
            "chosen",
        )
        .orderBy("route")
    )


# ---------------------------------------------------------------------------
# Binary (sign-bit) quantization — the memory floor of the quantization
# family: 1 bit per dimension (dim/8 bytes/vector) below int8's
# dim bytes (emb_quant_audit) and PQ's n_sub bytes (pq_audit_sampled).
# Distance between codes is Hamming = popcount(XOR) over packed words,
# an integer kernel with no float math at all — the cheapest possible
# shortlist scan at 100 TB, always followed by an exact re-rank fetch
# of the shortlist's full vectors (the same candidate-scan +
# exact-re-rank serving shape query_ivfpq_index certifies).
# Reference parity: the reference stores full float payloads
# (etl/db.py:117-120 natural-key rows); the quantization family is
# pipeline-mandate surface, not reference surface.
# ---------------------------------------------------------------------------

SIGN_WORD_BITS = 32  # packed word width; 32 keeps every word positive
#: in a signed 64-bit lane on BOTH engines (bit 63 never set), so the
#: packed form is portable to any BIGINT store.


def sign_bits(vcol: Column, dim: int = EMBEDDING_DIM) -> Column:
    """array<int> of 0/1 sign bits: bit i = 1 iff v[i] > 0 (ties at
    exactly 0.0 quantize to 0 — same rule as the LSH bucket sign in
    ``_bucket``, so both binary families share one sign convention)."""
    return F.transform(
        vcol, lambda x: F.when(x > 0, F.lit(1)).otherwise(F.lit(0))
    )


def sign_bit_words(vcol: Column, dim: int = EMBEDDING_DIM) -> Column:
    """Pack the sign bits into array<long> little-endian 32-bit words:
    word w bit i (value 2^i) holds dimension w*32+i. A 64-dim vector
    is TWO longs — 16 bytes against 256 fp32 bytes, a 16x cut. The
    chain-of-adds per word stays whole-stage-codegen (no UDF)."""
    n_words = (dim + SIGN_WORD_BITS - 1) // SIGN_WORD_BITS
    words = []
    for w in range(n_words):
        acc = None
        for i in range(min(SIGN_WORD_BITS, dim - w * SIGN_WORD_BITS)):
            bit = F.when(
                F.element_at(vcol, w * SIGN_WORD_BITS + i + 1) > 0,
                F.lit(1 << i).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            acc = bit if acc is None else acc + bit
        words.append(acc)
    return F.array(*words)


def _sign_words_py(vec: list[float], dim: int = EMBEDDING_DIM) -> list[int]:
    """Driver-side twin of :func:`sign_bit_words` for collected panel
    rows (same > 0 rule, same little-endian packing)."""
    n_words = (dim + SIGN_WORD_BITS - 1) // SIGN_WORD_BITS
    out = [0] * n_words
    for idx in range(min(dim, len(vec))):
        if vec[idx] > 0:
            out[idx // SIGN_WORD_BITS] |= 1 << (idx % SIGN_WORD_BITS)
    return out


def hamming_words(a: Column, b: Column) -> Column:
    """Hamming distance between two packed sign-bit arrays:
    sum(bit_count(xor)) per word — pure integer ops, identical on any
    engine with 64-bit lanes (DuckDB replays it as a per-bit fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def binary_quant_audit(
    emb: DataFrame,
    *,
    n_queries: int = 10,
    k: int = 5,
    n_cand: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-quantization recall audit, one row per panel query
    (``qid, k, n_hit_ham, n_hit_rerank``): how much of the exact
    cosine top-k survives (a) ranking by Hamming distance over the
    1-bit codes alone and (b) exact re-rank of the top-``n_cand``
    Hamming shortlist — the go/no-go table before serving a
    32x-smaller first-pass index. Mirrors ``pq_recall_table``'s
    discipline: one scored frame feeds both rankings (truth and
    approximation can never diverge on scoring), ties break on
    vec_id, only integer counters aggregate. The panel is the
    ``n_queries`` lowest-id vectors, collected once; its packed words
    are computed driver-side by the bit-identical Python twin. Plan:
    corpus scan x broadcast panel, two window rankings on qid — an
    offline audit (the serving path would scan packed words only and
    fetch shortlist vectors by id, exactly the IVF-PQ re-rank shape)."""
    spark = emb.sparkSession

    def fold(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    def cos(a, b):
        return fold(F.zip_with(a, b, lambda x, y: x * y)) / (
            F.sqrt(fold(F.zip_with(a, a, lambda x, y: x * y)))
            * F.sqrt(fold(F.zip_with(b, b, lambda x, y: x * y)))
        )

    v = F.col(vec_col).cast("array<double>")
    base = fan_out(emb).select(
        F.col(id_col).alias("vec_id"),
        v.alias("v"),
        sign_bit_words(v).alias("w"),
    )
    panel_rows = (
        fan_out(emb)
        .select(F.col(id_col).alias("vec_id"), v.alias("v"))
        .orderBy("vec_id")
        .limit(n_queries)
        .collect()
    )
    panel = spark.createDataFrame(
        [
            (
                int(r["vec_id"]),
                [float(x) for x in r["v"]],
                _sign_words_py(list(r["v"])),
            )
            for r in panel_rows
        ],
        "qid long, qv array<double>, qw array<long>",
    )
    pairs = (
        base.join(F.broadcast(panel))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            cos(F.col("v"), F.col("qv")).alias("s_exact"),
            hamming_words(F.col("w"), F.col("qw")).alias("ham"),
        )
    )
    from pyspark.sql import Window

    w_e = Window.partitionBy("qid").orderBy(F.desc("s_exact"), "vec_id")
    w_h = Window.partitionBy("qid").orderBy("ham", "vec_id")
    rk = pairs.select(
        "qid",
        "vec_id",
        "s_exact",
        F.row_number().over(w_e).alias("rk_e"),
        F.row_number().over(w_h).alias("rk_h"),
    )
    rr = rk.where(F.col("rk_h") <= n_cand).select(
        "qid", "rk_e", F.row_number().over(w_e).alias("rk_rr")
    )
    hits_ham = (
        rk.where((F.col("rk_e") <= k) & (F.col("rk_h") <= k))
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_h"))
    )
    hits_rr = (
        rr.where((F.col("rk_e") <= k) & (F.col("rk_rr") <= k))
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_r"))
    )
    return (
        panel.select("qid")
        .join(hits_ham, "qid", "left")
        .join(hits_rr, "qid", "left")
        .select(
            "qid",
            F.lit(k).cast("long").alias("k"),
            F.coalesce("n_h", F.lit(0)).cast("long").alias("n_hit_ham"),
            F.coalesce("n_r", F.lit(0)).cast("long").alias("n_hit_rerank"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# Trained-range scalar quantization (faiss ScalarQuantizer / SQ8):
# per-DIMENSION [lo, hi] ranges trained on the corpus, 8-bit codes
# against a fixed per-dim dictionary. Differs from emb_quant_audit's
# per-VECTOR max-abs int8 (no per-row scale to store, and the frozen
# ranges are a quantizer CONTRACT later batches encode with — the
# same frozen-quantizer streaming property ivfpq_ingest enforces) and
# from PQ (no codebook training, byte-per-dim instead of
# byte-per-subspace).
# ---------------------------------------------------------------------------

SQ8_LEVELS = 255


def sq8_train_ranges(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = EMBEDDING_DIM,
) -> tuple[list[float], list[float]]:
    """One aggregate pass -> per-dimension (lo, hi) range lists. The
    collect is d-row-sized (the codebook/centroid discipline), and
    min/max of doubles are order-invariant, so the trained ranges are
    identical at any partitioning.

    Shape (r15): posexplode + groupBy(dim) instead of a 2·dim-column
    aggregate — the 128-AggregateExpression plan cost ~1.3 s of pure
    driver analysis/planning PER CALL (construction-bound, guide §1);
    the exploded form is a constant-size plan and the same min/max
    values. The shuffle is dim keys wide — trivially key-bounded."""
    v = F.col(vec_col).cast("array<double>")
    rows = (
        emb.select(F.posexplode(v).alias("i", "x"))
        .groupBy("i")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    )
    by_dim = {int(r["i"]): r for r in rows}
    missing = [i for i in range(dim) if i not in by_dim]
    if missing:
        raise ValueError(
            f"sq8_train_ranges: no values observed for dims {missing[:5]}"
            f"{'…' if len(missing) > 5 else ''} (corpus empty or vectors "
            f"shorter than dim={dim})"
        )
    lo = [float(by_dim[i]["lo"]) for i in range(dim)]
    hi = [float(by_dim[i]["hi"]) for i in range(dim)]
    return lo, hi


def sq8_dequantized(
    vcol: Column,
    lo: list[float],
    hi: list[float],
    *,
    dim: int = EMBEDDING_DIM,
) -> Column:
    """Quantize-then-dequantize against the frozen ranges — BY
    COMPOSITION of the index codec (:func:`sq8_codes` then
    :func:`sq8_decode`), so the audit measures exactly the
    reconstruction an IVF-SQ8 index serves. In particular a
    degenerate dim (hi == lo) reconstructs to lo — the dictionary's
    only value — even when a frozen-contract audit feeds a batch
    whose value there differs (the served index would return lo, so
    the audit must charge that error too; r12 self-review)."""
    return sq8_decode(sq8_codes(vcol, lo, hi, dim=dim), lo, hi, dim=dim)


def sq8_audit(
    emb: DataFrame,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = EMBEDDING_DIM,
    ranges: tuple[list[float], list[float]] | None = None,
) -> DataFrame:
    """Trained-range SQ8 reconstruction audit, same table shape and
    integer discipline as the per-vector int8 audit (per label:
    n_vecs, summed L2 error and cosine preservation in micro-units,
    snapped per vector BEFORE the group sum): the side-by-side row
    that says whether per-dim frozen ranges beat per-vector scales on
    YOUR corpus before an index commits to either. ``ranges`` accepts
    pre-trained (lo, hi) — the frozen-quantizer path for auditing new
    batches against an existing contract."""
    lo, hi = ranges if ranges is not None else sq8_train_ranges(
        emb, vec_col=vec_col, dim=dim
    )

    def fold(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    def dot2(a, b):
        return fold(F.zip_with(a, b, lambda x, y: x * y))

    v = F.col(vec_col).cast("array<double>")
    base = fan_out(emb).select(
        F.col(label_col).alias("label"),
        v.alias("v"),
        sq8_dequantized(v, lo, hi, dim=dim).alias("dq"),
    )
    err = F.sqrt(fold(F.zip_with("v", "dq", lambda x, y: (x - y) * (x - y))))
    denom = F.sqrt(dot2(F.col("v"), F.col("v"))) * F.sqrt(
        dot2(F.col("dq"), F.col("dq"))
    )
    cos = F.when(denom == 0, F.lit(1.0)).otherwise(
        dot2(F.col("v"), F.col("dq")) / denom
    )
    u = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("long")  # noqa: E731
    return (
        base.select("label", u(err).alias("err_u"), u(cos).alias("cos_u"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("err_u").cast("long").alias("sum_err_u"),
            F.sum("cos_u").cast("long").alias("sum_cos_u"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# IVF-SQ8 persisted serving: the third faiss index variant beside
# IVF-flat (build_ivf_index) and IVF-PQ (build_ivfpq_index). Entries
# store (vec_id, dim 8-bit codes against the trained per-dim ranges of
# sq8_train_ranges) — dim bytes/vector (4x below fp32) with NO
# codebook and a decode that is one affine op per dim, sitting between
# IVF-flat (full recall, full floats) and IVF-PQ (n_sub bytes,
# codebook-dependent) on the memory/accuracy curve. The frozen ranges
# ride in the meta sidecar: the same quantizer CONTRACT discipline as
# the IVF-PQ codebook — build and query can never disagree.
# ---------------------------------------------------------------------------


def sq8_codes(
    vcol: Column,
    lo: list[float],
    hi: list[float],
    *,
    dim: int = EMBEDDING_DIM,
) -> Column:
    """array<int> SQ8 codes against frozen ranges: clamp(round((x-lo)
    /(hi-lo)*255), 0, 255); degenerate dims (hi == lo) encode 0 (the
    decode returns lo there, which IS the stored value). Identical
    textual arithmetic to :func:`sq8_dequantized`'s encode half."""
    lo_l = dlit(lo)
    hi_l = dlit(hi)

    def enc(i: Column) -> Column:
        x = F.element_at(vcol, i)
        a = F.element_at(lo_l, i)
        b = F.element_at(hi_l, i)
        code = F.least(
            F.greatest(
                F.floor((x - a) / (b - a) * F.lit(255.0) + F.lit(0.5)),
                F.lit(0.0),
            ),
            F.lit(255.0),
        )
        return F.when(b == a, F.lit(0.0)).otherwise(code).cast("int")

    return F.transform(
        F.sequence(F.lit(1), F.lit(dim)), lambda i: enc(i.cast("int"))
    )


def sq8_decode(
    codes_col: Column,
    lo: list[float],
    hi: list[float],
    *,
    dim: int = EMBEDDING_DIM,
) -> Column:
    """array<double> reconstruction from stored codes: lo + code *
    (hi-lo)/255; degenerate dims return lo. The index-side decode —
    unlike :func:`sq8_dequantized` it never sees the original vector."""
    lo_l = dlit(lo)
    hi_l = dlit(hi)

    def dec(i: Column) -> Column:
        a = F.element_at(lo_l, i)
        b = F.element_at(hi_l, i)
        c = F.element_at(codes_col, i).cast("double")
        return F.when(b == a, a).otherwise(a + c * (b - a) / F.lit(255.0))

    return F.transform(
        F.sequence(F.lit(1), F.lit(dim)), lambda i: dec(i.cast("int"))
    )


def build_ivfsq8_index(
    emb: DataFrame,
    path: str,
    *,
    ranges: tuple[list[float], list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBEDDING_DIM,
    tune_nprobe: bool = True,
) -> None:
    """Persist the corpus as an IVF-SQ8 inverted file: (vec_id, dim
    8-bit codes) under argmax-dot ``lst=<k>`` partitions (the
    build_ivf_index routing), trained per-dim ranges in the
    ``_ann_meta.json`` sidecar. ``ranges=`` accepts a pre-trained
    contract (the frozen-quantizer streaming property); default
    trains on this corpus in one order-invariant aggregate pass."""
    lo, hi = ranges if ranges is not None else sq8_train_ranges(
        emb, vec_col=vec_col, dim=dim
    )
    if len(lo) != dim or len(hi) != dim:
        raise ValueError(
            f"ranges of length {len(lo)}/{len(hi)} do not match dim={dim}"
        )
    v = F.col(vec_col).cast("array<double>")
    base = fan_out(emb).select(
        F.col(id_col).alias("vec_id"),
        sq8_codes(v, lo, hi, dim=dim).alias("codes"),
        ivf_list_of(v).alias("lst"),
    )
    (
        base.withColumn("batch", F.lit(0))
        .write.mode("overwrite")
        .partitionBy("batch", "lst")
        .parquet(path)
    )
    meta = {
        "kind": "ivfsq8",
        "n_lists": IVF_LISTS,
        "dim": dim,
        "lo": lo,
        "hi": hi,
    }
    if tune_nprobe:
        meta.update(
            _tuned_nprobe_meta(
                emb, centroids=None, id_col=id_col, vec_col=vec_col
            )
        )
    _write_ann_meta(emb.sparkSession, path, meta)


def query_ivfsq8_index(
    spark,
    path: str,
    query_vec: list[float],
    emb_full: DataFrame,
    *,
    k: int = 5,
    n_cand: int = 100,
    nprobe: int | None = None,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve top-k from an IVF-SQ8 index: nprobe probe lists computed
    driver-side (stored-quantizer arithmetic), the pruned scan decodes
    each candidate's codes with the SIDEcar ranges (one affine op per
    dim on literals — no codebook join, no stored vectors) and scores
    cosine against the literal query, then the top ``n_cand``
    shortlist is exact-re-ranked from the PRIMARY store via the
    pushed-isin path shared with IVF-PQ. I/O at scale: nprobe
    partitions of dim-byte codes + n_cand full vectors. RAISES unless
    the candidate scan is partition-pruned (the serve contract)."""
    meta = _read_ann_meta(spark, path)
    if meta is None or meta.get("kind") != "ivfsq8":
        raise ValueError(
            f"no IVF-SQ8 index at {path} (meta: "
            f"{None if meta is None else meta.get('kind')!r})"
        )
    _check_ann_meta(
        spark, path, {"kind": "ivfsq8", "n_lists": IVF_LISTS}, meta=meta
    )
    nprobe = _resolve_nprobe(nprobe, meta)
    lo = [float(x) for x in meta["lo"]]
    hi = [float(x) for x in meta["hi"]]
    dim = int(meta["dim"])

    qv = [float(x) for x in query_vec]
    dots = [_dot_py(qv, ivf_centroid(j)) for j in range(IVF_LISTS)]
    order = sorted(range(IVF_LISTS), key=lambda j: (-dots[j], j))
    probes = [j + 1 for j in order[:nprobe]]

    cand = spark.read.parquet(path).filter(F.col("lst").isin(probes))
    if exclude_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_id)
    cand = _suppress_tombstones(spark, path, cand)
    qcol = dlit(qv)
    dq = sq8_decode(F.col("codes"), lo, hi, dim=dim)
    adc = cand.select("vec_id", cosine(dq, qcol).alias("s_adc"))
    return _pruned_shortlist_rerank(
        adc,
        emb_full,
        qv,
        k=k,
        n_cand=n_cand,
        id_col=id_col,
        vec_col=vec_col,
        what="IVF-SQ8",
    )


def ivfsq8_ingest_foreach_batch(
    spark,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: list | None = None,
):
    """``foreachBatch`` body growing a persisted IVF-SQ8 index under
    at-least-once delivery — every index kind now has the same
    streaming growth path (LSH, IVF-PQ, IVF-SQ8). The index MUST
    already exist (:func:`build_ivfsq8_index` on a seed corpus): the
    frozen per-dim ranges in the sidecar are the quantizer contract
    every batch encodes with — retraining ranges per batch would
    silently change what stored codes MEAN (out-of-range arrivals
    clamp to the dictionary edge, exactly what ``sq8_audit(ranges=)``
    measures before you trust the contract on new data). Each
    micro-batch lands under ``batch=<id>/lst=<k>`` via up-front
    delete + append — redelivery replaces its own subtree."""
    def encode(batch_df: DataFrame, meta: dict) -> DataFrame:
        lo = [float(x) for x in meta["lo"]]
        hi = [float(x) for x in meta["hi"]]
        dim = int(meta["dim"])
        v = F.col(vec_col).cast("array<double>")
        return fan_out(batch_df).select(
            F.col(id_col).alias("vec_id"),
            sq8_codes(v, lo, hi, dim=dim).alias("codes"),
            ivf_list_of(v).alias("lst"),
        )

    return _codes_ingest_foreach_batch(
        spark,
        path,
        kind="ivfsq8",
        kind_label="IVF-SQ8",
        builder_name="build_ivfsq8_index",
        contract="ranges",
        encode=encode,
        stats=stats,
    )


#: crash-recovery plan sidecar for compact_ann_index — underscore
#: prefix keeps Spark's parquet reader from treating it as data.
_COMPACT_PLAN = "_compact_plan.json"


def compact_ann_index(spark, path: str) -> dict:
    """Fold a streaming-ingested ANN index's ``batch=<id>`` generations
    into one consolidated generation — the maintenance job that stops
    the daily-crawl ingestion layout from accumulating thousands of
    tiny per-batch partition subtrees (at 100 TB, file listing and
    task scheduling start to dominate the probed read long before
    data volume does; the Delta OPTIMIZE / Iceberg rewrite analogue
    for the inverted-file layout).

    Contract (the ``atomic.vacuum`` single-maintenance-writer rule):
    run at a stream-quiescent point — the ingest query stopped or
    checkpoint-committed past every batch being folded. The NEWEST
    real batch is always left alone: it is the only batch a restarted
    stream can legally redeliver (its commit may be missing from the
    checkpoint), and its ``rmtree + append`` idempotency must keep
    working — folding it would turn that redelivery into duplicates.
    Earlier batches are checkpoint-committed and can never replay.

    Crash atomicity — the classifier count-compaction generation
    discipline in miniature:

    1. recovery: a leftover plan sidecar means a prior run crashed —
       if the consolidated generation is complete (row count matches
       the plan) the deletes are finished idempotently, otherwise the
       partial generation is discarded; either way the index is
       consistent before new work starts;
    2. the plan (folded ids, target generation, expected rows) is
       published EXCLUSIVELY (a second concurrent compactor fails
       here, not halfway through deletes);
    3. folded rows land under ``batch=<newgen>`` (negative ids —
       never collide with Structured Streaming's non-negative batch
       ids; successive compactions fold prior consolidations too);
    4. the copy is verified by count BEFORE any source delete;
    5. sources are deleted, then the plan is removed.

    A crash between any two steps lands in a state recovery
    recognizes. Queries are layout-agnostic (partition pruning on the
    inner keys scans every generation's matching subtrees), so served
    results are identical before and after — pinned by pytest.

    Returns ``{"folded": [...], "newgen": int, "n_rows": int}``
    (``folded`` empty = nothing to do)."""
    from meteo_etl_spark.operators.fsio import io_for

    io = io_for(path, spark)
    root = path.rstrip("/")
    plan_path = f"{root}/{_COMPACT_PLAN}"

    def batch_ids() -> list[int]:
        out = []
        for name in io.listdir(root):
            if name.startswith("batch="):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    # 1. recovery
    if io.isfile(plan_path):
        plan = json.loads(io.read_text(plan_path))
        gen_dir = f"{root}/batch={int(plan['newgen'])}"
        done = False
        if io.isdir(gen_dir):
            try:
                n = spark.read.parquet(gen_dir).count()
                done = n == int(plan["n_rows"])
            except Exception:
                done = False
        if done:
            _rmtree_verified(io, [f"{root}/batch={int(b)}" for b in plan["folded"]], plan_path)
        else:
            _rmtree_verified(io, [gen_dir], plan_path)
        io.unlink(plan_path)

    ids = batch_ids()
    reals = [b for b in ids if b >= 0]
    keep_max = max(reals) if reals else None
    fold = [b for b in ids if b != keep_max]
    if not fold:
        return {"folded": [], "newgen": 0, "n_rows": 0}
    newgen = min(0, min(ids)) - 1

    df = spark.read.parquet(root).filter(F.col("batch").isin(fold))
    # tombstoned vectors are physically dropped from the folded
    # generations here (the deferred-delete half of
    # delete_from_ann_index's contract); the tombstone LIST stays —
    # the kept newest batch may still hold deleted rows, and its
    # legal redelivery would re-append them
    df = _suppress_tombstones(spark, root, df)
    n_rows = df.count()
    if len(fold) == 1:
        # A lone foldable generation is still rewritten when it holds
        # tombstoned rows (the delete_from_ann_index promise: physical
        # removal at the next compact, even with nothing to merge) —
        # but a clean lone generation is left alone, otherwise every
        # compact would rewrite the previous compact's output forever.
        n_raw = spark.read.parquet(f"{root}/batch={int(fold[0])}").count()
        if n_raw == n_rows:
            return {"folded": [], "newgen": 0, "n_rows": 0}
    # 2. exclusive plan publish — the single-writer guard
    ok = io.publish_exclusive(
        plan_path,
        json.dumps({"folded": fold, "newgen": newgen, "n_rows": n_rows}),
    )
    if not ok:
        raise RuntimeError(
            f"compact_ann_index: a compaction plan already exists at "
            f"{plan_path} — another compactor is active or crashed; "
            "re-invoke to run recovery"
        )
    inner = [c for c in df.columns if c != "batch"]
    part_keys = [
        k for k in ("table", "bucket", "lst") if k in df.columns
    ]
    # 3. consolidated generation (append-mode write of ONLY the new
    # batch dir; existing dirs untouched)
    (
        df.select(*inner)
        .withColumn("batch", F.lit(int(newgen)))
        .repartition(*part_keys)
        .write.mode("append")
        .partitionBy("batch", *part_keys)
        .parquet(root)
    )
    # 4. verify before destroying anything
    n_new = spark.read.parquet(f"{root}/batch={newgen}").count()
    if n_new != n_rows:
        raise RuntimeError(
            f"compact_ann_index: consolidated generation has {n_new} "
            f"rows, expected {n_rows} — plan left in place for "
            "recovery; sources untouched"
        )
    # 5. delete sources (each delete VERIFIED — a silently failed
    # rmtree would leave a batch served twice with no plan left to
    # repair it), then the plan
    _rmtree_verified(io, [f"{root}/batch={int(b)}" for b in fold], plan_path)
    io.unlink(plan_path)
    return {"folded": fold, "newgen": newgen, "n_rows": n_rows}


def _rmtree_verified(io, dirs: list, plan_path: str) -> None:
    """Remove each directory and ASSERT it is gone, raising BEFORE the
    caller can unlink the compaction plan. LocalIO.rmtree is
    shutil.rmtree(ignore_errors=True): a permissions failure is
    silent, and unlinking the plan after one would strand the index
    with BOTH the consolidated generation and the un-deleted source
    batch on disk — rows served twice, and no sidecar left for
    recovery to repair it. Raising here keeps the index in the
    recoverable plan-present state (re-invoking runs recovery, which
    retries these same verified deletes)."""
    for d in dirs:
        io.rmtree(d)
        if io.isdir(d):
            raise RuntimeError(
                f"compact_ann_index: failed to delete {d} — plan left "
                f"at {plan_path}; index is in the recoverable "
                "plan-present state (fix permissions and re-invoke)"
            )


#: tombstone subdirectory for deleted vector ids — the underscore
#: prefix keeps Spark's partition discovery from reading it as data.
_TOMBSTONES = "_tombstones"


def delete_from_ann_index(spark, path: str, ids) -> int:
    """Tombstone-delete vectors from a persisted ANN index — the
    takedown/right-to-erasure path a 100 TB serving store needs
    without rewriting terabytes of inverted file: deleted ids land as
    an append-only parquet list under ``_tombstones/`` and every
    query path anti-joins candidates against it before ranking, so a
    deleted vector stops being servable at the NEXT query (O(deletes)
    I/O, not O(index)).

    Physical removal is deferred to :func:`compact_ann_index`, which
    drops tombstoned rows from the generations it folds. The
    tombstone LIST itself is retained even then: a restarted stream's
    legal redelivery of the newest batch re-appends that batch's
    original rows — including deleted ones — and only the list keeps
    them suppressed (delete-then-resurrect is exactly the bug
    at-least-once delivery would otherwise cause). A full rebuild of
    the index from a corrected corpus is the only operation that
    clears it.

    ``ids`` is a list of vector ids or a single-column DataFrame.
    Returns the number of tombstones appended (duplicates are
    harmless — suppression is a semi-join)."""
    from meteo_etl_spark.operators.fsio import io_for

    io = io_for(path, spark)
    root = path.rstrip("/")
    if not io.isdir(root):
        raise ValueError(f"no ANN index at {path}")
    if isinstance(ids, DataFrame):
        df = ids.select(F.col(ids.columns[0]).alias("vec_id"))
    else:
        ids = list(ids)
        if not ids:
            return 0
        df = spark.createDataFrame([(i,) for i in ids], ["vec_id"])
    n = df.count()
    df.coalesce(1).write.mode("append").parquet(f"{root}/{_TOMBSTONES}")
    return n


def _suppress_tombstones(spark, path: str, cand: DataFrame) -> DataFrame:
    """Anti-join candidates against the index's tombstone list (no-op
    when none exist). The list is deletion-sized — AQE broadcasts it;
    no hint so a pathological giant list still degrades to a shuffle
    instead of an OOM."""
    from meteo_etl_spark.operators.fsio import io_for

    tomb = f"{path.rstrip('/')}/{_TOMBSTONES}"
    if not io_for(path, spark).isdir(tomb):
        return cand
    ts = spark.read.parquet(tomb).select("vec_id").dropDuplicates()
    return cand.join(ts, "vec_id", "left_anti")

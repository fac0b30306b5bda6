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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meteo_etl_spark.operators.parallelism import fan_out

# Shared with the oracle generators in plans/llm_queries.py.
EMBEDDING_DIM = 64
LSH_TABLES = 2
LSH_PLANES = 4  # bits per table; 2^4 = 16 buckets/table


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


def _bucket(v: Column, table: int) -> Column:
    """P-bit sign-pattern bucket id of vector ``v`` in hash table
    ``table`` ('1' iff the projection is strictly positive)."""
    bits = []
    for p in range(LSH_PLANES):
        plane = F.array(*[F.lit(w) for w in hyperplane(table, p)])
        bits.append(F.when(dot(v, plane) > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


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


def build_lsh_index(
    emb: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the corpus bucket-partitioned (IVF-style inverted file).

    Each vector is written once per hash table under
    ``table=<t>/bucket=<sign-pattern>`` — at 100 TB this is the layout
    that turns ANN from a full-corpus scan into a partition-pruned read
    of a handful of buckets (the partition filter is visible in the
    query plan; see ``query_lsh_index``). Rebuild cost is one narrow
    pass over the corpus per table.
    """
    v = F.col(vec_col).cast("array<double>")
    corpus = fan_out(emb).select(F.col(id_col).alias("vec_id"), v.alias("v"))
    tables = [
        corpus.select(
            "vec_id", "v", F.lit(t).alias("table"), _bucket(F.col("v"), t).alias("bucket")
        )
        for t in range(LSH_TABLES)
    ]
    df = tables[0]
    for t in tables[1:]:
        df = df.unionAll(t)
    df.write.mode("overwrite").partitionBy("table", "bucket").parquet(path)


def query_lsh_index(
    spark,
    path: str,
    query_vec: list[float],
    *,
    k: int = 5,
    exclude_id: int | None = None,
) -> DataFrame:
    """Top-k over the persisted IVF index: compute the query's bucket
    per table driver-side (P·dim flops on a constant), then scan ONLY
    the matching (table, bucket) partitions — Catalyst turns the
    bucket equality into PartitionFilters, so I/O is proportional to
    the candidate set, not the corpus."""
    qv = [float(x) for x in query_vec]

    def bucket_of(table: int) -> str:
        bits = []
        for p in range(LSH_PLANES):
            plane = hyperplane(table, p)
            s = 0.0
            for a, b in zip(qv, plane):
                s += a * b
            bits.append("1" if s > 0 else "0")
        return "".join(bits)

    df = spark.read.parquet(path)
    match_any = None
    for t in range(LSH_TABLES):
        m = (F.col("table") == t) & (F.col("bucket") == bucket_of(t))
        match_any = m if match_any is None else match_any | m
    cand = df.filter(match_any)
    if exclude_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_id)
    qcol = F.array(*[F.lit(x) for x in qv])
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

"""Hashed n-gram importance weights for data selection (DSIR-style).

DSIR (Xie et al. 2023, arXiv:2302.03169) selects pretraining data by
importance weight under hashed n-gram features: score each raw
document by how target-like its feature counts are, then sample
proportionally. This module is that scorer as a pure DataFrame
program:

- **features**: word unigrams + adjacent bigrams, hashed into
  ``DSIR_BUCKETS`` buckets via the engine's cross-engine md5→int
  idiom (same tokens, same hash, same buckets in the DuckDB oracle);
- **bucket weights**: the quantized probability ratio
  ``floor(((t_f+1)/(s_f+1)) · ((S+B)/(T+B)) · RATIO_SCALE)`` with
  t/s the target/source bucket counts and T/S their totals
  (add-one smoothing, exactly the paper's estimator with the ratio
  kept LINEAR instead of log so every step is a single
  correctly-rounded IEEE op — division, multiplication, floor — and
  the oracle replays it bit-for-bit; the log-ratio form at
  production scale is the same plan with ``F.log`` in the weight
  expression);
- **document score**: Σ count(f, doc) · w_f — int64 partial-agg sums,
  order-independent.

Scale shape: one explode of the corpus into (doc, bucket) pairs, one
bucket-keyed aggregate for the weight table (≤ DSIR_BUCKETS rows —
broadcastable by construction), one 1-row totals broadcast, and one
doc-keyed partial-agg sum. No Python UDFs, no collect of data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hashed feature space (the paper uses 10^4; 2^10 keeps the oracle's
#: bucket table human-inspectable while exercising identical collisions)
DSIR_BUCKETS = 1024
#: fixed-point scale of the quantized probability ratio
RATIO_SCALE = 1000


def hashed_ngram_features(text_col: Column) -> Column:
    """array<long> of feature-bucket ids: word unigrams + adjacent
    bigrams (joined with '_'), each md5-hashed into DSIR_BUCKETS."""
    toks = F.split(text_col, " ")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws("_", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(toks, bigrams)
    return F.transform(
        feats,
        lambda t: F.pmod(
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
            F.lit(DSIR_BUCKETS),
        ),
    )


def dsir_scores(
    docs: DataFrame,
    is_target: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document importance score against the ``is_target`` slice:
    ``(doc_id, n_feats, score)`` where score = Σ c_f · w_f (int64).
    Higher = more target-like. One corpus explode, one bucket agg,
    one doc agg."""
    feats = docs.select(
        F.col(id_col).alias("doc_id"),
        is_target.alias("tgt"),
        F.explode(hashed_ngram_features(F.col(text_col))).alias("bucket"),
    )
    bc = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("tgt"), 1).otherwise(0)).alias("t"),
        F.sum(F.when(~F.col("tgt"), 1).otherwise(0)).alias("s"),
    )
    totals = bc.agg(
        F.sum("t").alias("tt"), F.sum("s").alias("ss")
    )  # 1 row, crossed in (scalar-broadcast shape)
    b = float(DSIR_BUCKETS)
    weights = bc.join(F.broadcast(totals)).select(
        "bucket",
        F.floor(
            ((F.col("t") + 1).cast("double") / (F.col("s") + 1).cast("double"))
            * (
                (F.col("ss") + b).cast("double")
                / (F.col("tt") + b).cast("double")
            )
            * F.lit(float(RATIO_SCALE))
        )
        .cast("long")
        .alias("w"),
    )
    # weight table is <= DSIR_BUCKETS rows by construction: broadcast
    per_doc = feats.filter(~F.col("tgt")).groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_doc.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.sum(F.col("c") * F.col("w")).cast("long").alias("score"),
        )
    )

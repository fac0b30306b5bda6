"""ANN serving-path benchmark: build + query walls for every persisted
index type at a chosen scale factor.

    python tools/bench_serve.py [--sf-dir /root/testdata/sf0.1]

Build runs once per index; the query runs twice and reports both walls
(second = warm codegen — the serving steady state). Queries return
top-5 with exact re-rank; IVF-PQ uses n_cand=100. Emits one markdown
table.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from meteo_etl_spark.functions import similarity as sim
    from meteo_etl_spark.functions.clustering import trained_ivf_centroids
    from meteo_etl_spark.session import get_spark
    from meteo_etl_spark.sources.testdata import load_table

    spark = get_spark("bench-serve")
    emb = load_table(spark, args.sf_dir, "embeddings")
    n = emb.count()
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0].embedding]
    scratch = tempfile.mkdtemp(prefix="bench_serve_")

    def timed(fn):
        t0 = time.monotonic()
        out = fn()
        return time.monotonic() - t0, out

    specs = [
        (
            "lsh (2x4)",
            lambda p: sim.build_lsh_index(emb, p),
            lambda p: sim.query_lsh_index(spark, p, qv, k=5, exclude_id=0),
        ),
        (
            "lsh_tuned (8x6 h<=1)",
            lambda p: sim.build_ann_index("lsh_tuned", emb, p),
            lambda p: sim.query_ann_index("lsh_tuned", spark, p, qv, k=5, exclude_id=0),
        ),
        (
            "ivf fixed (8 lists, nprobe 2)",
            lambda p: sim.build_ivf_index(emb, p),
            lambda p: sim.query_ivf_index(spark, p, qv, k=5, exclude_id=0),
        ),
        (
            "ivf trained (8 lists, nprobe 2)",
            lambda p: sim.build_ivf_index(
                emb, p, centroids=trained_ivf_centroids(emb, k=8, iters=3)
            ),
            lambda p: sim.query_ivf_index(spark, p, qv, k=5, exclude_id=0),
        ),
        (
            "ivfpq (8 lists, 8x32 codes, n_cand 100)",
            lambda p: sim.build_ivfpq_index(emb, p),
            lambda p: sim.query_ivfpq_index(
                spark, p, qv, emb, k=5, n_cand=100, exclude_id=0
            ),
        ),
        (
            "ivfsq8 (8 lists, 64 B codes, n_cand 100)",
            lambda p: sim.build_ivfsq8_index(emb, p),
            lambda p: sim.query_ivfsq8_index(
                spark, p, qv, emb, k=5, n_cand=100, exclude_id=0
            ),
        ),
    ]

    lines = [
        f"corpus: {args.sf_dir} — {n} vectors, dim {sim.EMBEDDING_DIM}",
        "",
        "| index | build (s) | query cold (s) | query warm (s) | index rows |",
        "|---|---|---|---|---|",
    ]
    try:
        for name, build, query in specs:
            p = os.path.join(scratch, name.split(" ")[0] + str(len(lines)))
            b, _ = timed(lambda: build(p))
            c1, df = timed(lambda: query(p).collect())
            c2, _ = timed(lambda: query(p).collect())
            rows = spark.read.parquet(p).count()
            lines.append(
                f"| {name} | {b:.2f} | {c1:.2f} | {c2:.2f} | {rows} |"
            )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Replay the driver's correctness gate locally.

Runs registered queries against the DuckDB oracle at a chosen scale
factor and prints one JSON line of results — the same comparison the
per-round CORRECTNESS check performs (rows-only for oracle-less
entries).

    python tools/verify_window.py                  # 50-entry driver window, sf0.01
    python tools/verify_window.py --all            # every registered query
    python tools/verify_window.py --names q1_scan_topk dedup_semantic
    python tools/verify_window.py --sf-dir /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true", help="check every query, not just the window")
    ap.add_argument("--names", nargs="*", help="explicit query names to check")
    ap.add_argument(
        "--shuffle-partitions",
        type=int,
        default=8,
        help="spark.sql.shuffle.partitions for the replay session — vary it "
        "(e.g. 3 vs 8 vs 32) to certify every query's result is "
        "partitioning-invariant, not just correct at one layout",
    )
    args = ap.parse_args()

    from meteo_etl_spark.plans import queries as Q
    from meteo_etl_spark.session import get_spark
    from tests.oracle import compare, duckdb_connection

    all_q = Q.all_queries()
    if args.names:
        names = args.names
    elif args.all:
        names = list(all_q)
    else:
        deferred = set(Q._DEFERRED)
        names = [n for n in all_q if n not in deferred][:50]

    spark = get_spark("verify-window", shuffle_partitions=args.shuffle_partitions)
    con = duckdb_connection(args.sf_dir)
    results: dict[str, str] = {}
    t0 = time.time()
    for name in names:
        spec = all_q[name]
        try:
            if spec.oracle is None:
                assert spec.fn(spark, args.sf_dir).count() >= 0
                results[name] = "rows_only_ok"
            else:
                compare(spec.fn(spark, args.sf_dir), con.execute(spec.oracle).df(), name=name)
                results[name] = "ok"
        except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
            results[name] = f"FAIL: {str(e)[:200]}"
    n_bad = sum(1 for v in results.values() if v.startswith("FAIL"))
    print(
        json.dumps(
            {
                "checked": len(names),
                "failed": n_bad,
                "wall_sec": round(time.time() - t0, 1),
                "sf_dir": args.sf_dir,
                "failures": {k: v for k, v in results.items() if v.startswith("FAIL")},
            }
        )
    )
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())

"""Per-query total-CPU measurement (r16, guide §1).

Wall time alone hides the quantity a contended/quota'd host multiplies:
the TOTAL CPU a query burns across all local[N] threads. For each
named bench query this times collect() runs (bench methodology) and
reads the local-mode JVM's /proc/<pid>/stat utime+stime around each
run, reporting both wall and cpu seconds (min-wall run's cpu).

Run:  python tools/cpu_measure.py --names emb_gram_census ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meteo_etl_spark.plans import queries as Q  # noqa: E402
from meteo_etl_spark.session import get_spark  # noqa: E402

_TICK = os.sysconf("SC_CLK_TCK")


def _jvm_pid() -> int:
    """The py4j gateway JVM is the single java child of this process."""
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            if parts[3] == str(me) and "java" in parts[1]:
                return int(pid)
        except OSError:
            continue
    raise RuntimeError("no java child found")


def _cpu_sec(pid: int) -> float:
    with open(f"/proc/{pid}/stat") as f:
        parts = f.read().split()
    return (int(parts[13]) + int(parts[14])) / _TICK


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", nargs="*")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("cpu-measure")
    jpid = _jvm_pid()

    allq = Q.all_queries()
    names = args.names or [n for n, s in allq.items() if s.bench]
    warm = allq.get("q7_grouped_count") or allq[names[0]]
    warm.fn(spark, sf_dir).collect()

    tot_w = tot_c = 0.0
    for name in names:
        spec = allq[name]
        spark.sparkContext.setJobDescription(f"cpu:{name}")
        try:
            best_w, best_c = float("inf"), float("inf")
            for _ in range(args.runs):
                spark.catalog.clearCache()
                c0 = _cpu_sec(jpid)
                t0 = time.perf_counter()
                spec.fn(spark, sf_dir).collect()
                w = time.perf_counter() - t0
                c = _cpu_sec(jpid) - c0
                if w < best_w:
                    best_w, best_c = w, c
            tot_w += best_w
            tot_c += best_c
            print(
                json.dumps(
                    {
                        "name": name,
                        "wall_sec": round(best_w, 3),
                        "cpu_sec": round(best_c, 3),
                        "ratio": round(best_c / best_w, 1) if best_w else 0,
                    }
                ),
                flush=True,
            )
        except Exception as exc:
            print(json.dumps({"name": name, "error": str(exc)[:200]}), flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {"total_wall": round(tot_w, 2), "total_cpu": round(tot_c, 2)}
        )
    )


if __name__ == "__main__":
    main()

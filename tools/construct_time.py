"""Time PYTHON-SIDE PLAN CONSTRUCTION per bench query (guide §1).

Calls each query's builder fn (no action — the DataFrame is built and
discarded) and reports seconds per query, sorted descending. This
isolates the py4j round-trip cost of expression construction from
execution; the bench pays construction + execution serially.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meteo_etl_spark.plans import queries as Q  # noqa: E402
from meteo_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or None
    spark = get_spark("construct-time")
    allq = Q.all_queries()
    roster = names or [n for n, s in allq.items() if s.bench]
    # warmup: first construction pays module/JVM init
    allq[roster[0]].fn(spark, sf_dir)
    rows = []
    for name in roster:
        t0 = time.perf_counter()
        allq[name].fn(spark, sf_dir)
        rows.append((round(time.perf_counter() - t0, 4), name))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    for sec, name in rows:
        print(json.dumps({"name": name, "construct_sec": sec}))
    print(json.dumps({"total_construct_sec": round(total, 4), "n": len(rows)}))


if __name__ == "__main__":
    main()

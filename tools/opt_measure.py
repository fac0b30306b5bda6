"""Optimization-round measurement harness (guide §1).

For each named bench query (default: every bench-flagged query):

- dumps ``.explain("formatted")`` to ``plans/r15/<name>_<tag>.txt``
- times N collect() runs (bench methodology: clearCache between runs,
  min reported) and, separately, N noop-sink runs (guide §1.4) so the
  computation is timed without the row-to-driver serialization
- counts Spark jobs per execution (DAGScheduler job-id delta) and
  Exchange / ReusedExchange / BatchEvalPython nodes in the plan

Prints one JSON line per query and a total. Run:
    python tools/opt_measure.py --tag before
    python tools/opt_measure.py --tag after --names dedup_containment
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meteo_etl_spark.plans import queries as Q  # noqa: E402
from meteo_etl_spark.session import get_spark  # noqa: E402


def _job_count(spark) -> int:
    # next job id is a monotone counter; the delta across an action is
    # the number of Spark jobs it submitted.
    nid = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    return nid if isinstance(nid, int) else nid.get()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--noop", action="store_true", help="also time noop-sink runs")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-measure")
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
    os.makedirs(plans_dir, exist_ok=True)

    allq = Q.all_queries()
    names = args.names or [n for n, s in allq.items() if s.bench]

    # warmup (bench discipline)
    warm = allq.get("q7_grouped_count") or allq[names[0]]
    warm.fn(spark, sf_dir).collect()

    total = 0.0
    out_rows = []
    for name in names:
        spec = allq[name]
        spark.sparkContext.setJobDescription(f"opt:{name}")
        try:
            df = spec.fn(spark, sf_dir)
            jqe = df._jdf.queryExecution()
            plan = jqe.explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            if not args.no_plans:
                with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                    f.write(plan)
            n_ex = len(re.findall(r"\bExchange\b", plan))
            n_reuse = len(re.findall(r"ReusedExchange", plan))
            n_py = len(re.findall(r"(Batch|Arrow)EvalPython|MapInArrow|MapInPandas", plan))
            best = float("inf")
            jobs = -1
            for _ in range(max(args.runs, 0)):
                spark.catalog.clearCache()
                j0 = _job_count(spark)
                t0 = time.perf_counter()
                spec.fn(spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                jobs = _job_count(spark) - j0
                best = min(best, dt)
            noop_best = None
            if args.noop:
                noop_best = float("inf")
                for _ in range(args.runs):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    spec.fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    noop_best = min(noop_best, time.perf_counter() - t0)
                noop_best = round(noop_best, 4)
            if args.runs <= 0:
                best = 0.0
            total += best
            row = {
                "name": name,
                "best_sec": round(best, 4),
                "jobs": jobs,
                "exchanges": n_ex - n_reuse,
                "reused_exchanges": n_reuse,
                "python_nodes": n_py,
            }
            if noop_best is not None:
                row["noop_sec"] = noop_best
            out_rows.append(row)
            print(json.dumps(row), flush=True)
        except Exception as exc:  # keep the sweep alive
            print(json.dumps({"name": name, "error": str(exc)[:300]}), flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({"tag": args.tag, "total_sec": round(total, 4), "n": len(out_rows)}))


if __name__ == "__main__":
    main()

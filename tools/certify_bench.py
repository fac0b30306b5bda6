"""Summarize the end-of-round bench runs into CERTIFIED_RUNS.json.

The per-round driver records ONE bench.py reading; a single reading on
a shared host sits inside a ±25-30% noise floor (BENCH_NOISE.md), so
every round ends with 3+ certified runs under the protocol. This tool
folds those run files into ``bench_evidence/CERTIFIED_RUNS.json`` —
median/min/max totals plus provenance — which bench.py embeds into its
output so the recorded artifact carries its own noise context.

Usage: python tools/certify_bench.py --round r12 \
           bench_evidence/BENCH_r12_final_run*.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", required=True, help="round tag, e.g. r12")
    ap.add_argument("runs", nargs="+", help="bench run JSON files")
    args = ap.parse_args()

    totals = []
    sf = None
    n_queries = None
    for path in args.runs:
        with open(path) as f:
            run = json.loads(f.read().strip().splitlines()[-1])
        # a run with failed queries sums only the survivors — its
        # artificially low total must never be certified as noise-floor
        # context (r12 self-review)
        if run.get("errors"):
            print(
                f"refusing to certify {path}: run has errors "
                f"{sorted(run['errors'])}",
                file=sys.stderr,
            )
            return 1
        if sf is not None and run.get("sf") != sf:
            print(
                f"refusing to certify {path}: sf {run.get('sf')} != {sf} "
                "of earlier runs",
                file=sys.stderr,
            )
            return 1
        if n_queries is not None and len(run.get("queries", {})) != n_queries:
            print(
                f"refusing to certify {path}: roster size "
                f"{len(run.get('queries', {}))} != {n_queries} of earlier "
                "runs",
                file=sys.stderr,
            )
            return 1
        totals.append(float(run["value"]))
        sf = run.get("sf", sf)
        n_queries = len(run.get("queries", {}))
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.strip()
    out = {
        "round": args.round,
        "commit": commit,
        "sf": sf,
        "roster_size": n_queries,
        "n_runs": len(totals),
        "totals_sec": sorted(round(t, 2) for t in totals),
        "median_total_sec": round(statistics.median(totals), 2),
        "min_total_sec": round(min(totals), 2),
        "max_total_sec": round(max(totals), 2),
        "runs": [os.path.basename(p) for p in args.runs],
    }
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_evidence",
        "CERTIFIED_RUNS.json",
    )
    with open(dest, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
        f.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

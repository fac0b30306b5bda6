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
    serve_walls: dict[str, list[float]] = {}
    serve_recalls: dict[str, list[float]] = {}
    for path in args.runs:
        # bench.py emits the headline as the LAST stdout line and the
        # per-query detail (queries / serve_recall / errors) as its own
        # PRECEDING line (r13 verdict order #1: the final line must stay
        # roster-independent under the driver's 2000-char tail capture).
        # Merge them here; single-line legacy run files still parse.
        objs = []
        with open(path) as f:
            for line in f.read().strip().splitlines():
                if line.strip():
                    try:
                        objs.append(json.loads(line))
                    except ValueError:
                        pass
        run = objs[-1]
        detail = next(
            (o for o in objs if "queries" in o and "metric" not in o), {}
        )
        queries = run.get("queries", detail.get("queries", {}))
        errors = run.get("errors", detail.get("errors", {}))
        # a run with failed queries sums only the survivors — its
        # artificially low total must never be certified as noise-floor
        # context (r12 self-review)
        if errors:
            print(
                f"refusing to certify {path}: run has errors "
                f"{sorted(errors)}",
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
        if n_queries is not None and len(queries) != n_queries:
            print(
                f"refusing to certify {path}: roster size "
                f"{len(queries)} != {n_queries} of earlier "
                "runs",
                file=sys.stderr,
            )
            return 1
        totals.append(float(run["value"]))
        sf = run.get("sf", sf)
        n_queries = len(queries)
        # serve rows carry wall AND served recall@5 (r13 verdict order
        # #5): an index change that trades recall for speed must show
        # in this one artifact
        for name, rec in detail.get("serve_recall", {}).items():
            serve_recalls.setdefault(name, []).append(float(rec))
            if name in queries:
                serve_walls.setdefault(name, []).append(float(queries[name]))
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
    if serve_recalls:
        # a serve_recall entry with NO matching timing row means the
        # query errored after recall was recorded — refuse to certify
        # rather than fabricate a 0.0-second wall (r14 advice)
        unwalled = sorted(set(serve_recalls) - set(serve_walls))
        if unwalled:
            print(
                "refusing to certify: serve_recall entries without any "
                f"timing row: {unwalled}",
                file=sys.stderr,
            )
            return 1
        out["serve"] = {
            name: {
                "wall_sec_best": round(min(serve_walls[name]), 4),
                "wall_sec_median": round(
                    statistics.median(serve_walls[name]), 4
                ),
                "recall_at_5": round(min(recs), 4),
                "recall_runs": sorted(round(r, 4) for r in recs),
            }
            for name, recs in sorted(serve_recalls.items())
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

"""tools/certify_bench refusal paths: the certification artifact must
never carry fabricated numbers (r14 advice: a serve_recall entry with
no timing row used to certify a 0.0-second wall)."""

from __future__ import annotations

import json
import sys


def _write_run(path, queries, serve_recall=None, errors=None, sf=0.1):
    detail = {"queries": queries}
    if serve_recall is not None:
        detail["serve_recall"] = serve_recall
    if errors is not None:
        detail["errors"] = errors
    headline = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(queries.values()), 4),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(queries),
        "n_errors": len(errors or {}),
        "queries_path": "x.json",
    }
    with open(path, "w") as f:
        f.write(json.dumps(detail) + "\n" + json.dumps(headline) + "\n")


def _run_main(argv, monkeypatch):
    import tools.certify_bench as cb

    monkeypatch.setattr(sys, "argv", ["certify_bench.py"] + argv)
    return cb.main()


def test_refuses_serve_recall_without_wall(tmp_path, monkeypatch, capsys):
    run = tmp_path / "run1.json"
    _write_run(
        run,
        {"q_a": 1.0},
        serve_recall={"serve_lsh_tuned": 1.0},  # no q named serve_lsh_tuned
    )
    rc = _run_main(["--round", "rT", str(run)], monkeypatch)
    assert rc == 1
    assert "serve_recall entries without any timing row" in capsys.readouterr().err


def test_refuses_runs_with_errors(tmp_path, monkeypatch, capsys):
    run = tmp_path / "run1.json"
    _write_run(run, {"q_a": 1.0}, errors={"q_b": "boom"})
    rc = _run_main(["--round", "rT", str(run)], monkeypatch)
    assert rc == 1
    assert "has errors" in capsys.readouterr().err


def test_refuses_mismatched_sf(tmp_path, monkeypatch, capsys):
    r1, r2 = tmp_path / "r1.json", tmp_path / "r2.json"
    _write_run(r1, {"q_a": 1.0}, sf=0.1)
    _write_run(r2, {"q_a": 1.0}, sf=0.01)
    rc = _run_main(["--round", "rT", str(r1), str(r2)], monkeypatch)
    assert rc == 1
    assert "sf" in capsys.readouterr().err

"""Unit tests for tools/bench_diff.py (pure python — no Spark).

The tool is the round-over-round regression gate (VERDICT r7 #2), so its
thresholds and noise demotion are behavior worth pinning: a flag must
require ratio AND absolute delta, and a flag whose delta sits inside the
query's own run1/run2 spread must demote to NOISY (measurement can't
resolve it), never fail the gate.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "bench_diff",
    os.path.join(os.path.dirname(__file__), "..", "tools", "bench_diff.py"),
)
bench_diff = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_diff)


def _file(tmp_path, name, run1, run2, load1=0.5):
    best = {k: min(run1[k], run2[k]) for k in run2}
    payload = {
        "queries": run2,
        "queries_run1": run1,
        "queries_best_of_2": best,
        "total_best_of_2": round(sum(best.values()), 3),
        "n_queries": len(run2),
        "load_context": {
            "loadavg_before": [load1, 0, 0],
            "runnable_procs_before": 1,
            "host_busy": False,
        },
    }
    p = tmp_path / name
    p.write_text(json.dumps(payload))
    return str(p)


def _run(capsys, old, new):
    argv = sys.argv
    sys.argv = ["bench_diff.py", old, new]
    try:
        rc = bench_diff.main()
    finally:
        sys.argv = argv
    return rc, capsys.readouterr().out


def test_real_regression_fails_gate(tmp_path, capsys):
    old = _file(tmp_path, "old.json", {"q": 1.0}, {"q": 1.0})
    new = _file(tmp_path, "new.json", {"q": 2.0}, {"q": 2.1})
    rc, out = _run(capsys, old, new)
    assert rc == 1
    assert "REGRESSION q:" in out


def test_small_absolute_delta_never_flags(tmp_path, capsys):
    # x2 ratio but only 0.2s absolute: multiplicative jitter on a tiny
    # query, not a regression
    old = _file(tmp_path, "old.json", {"q": 0.2}, {"q": 0.2})
    new = _file(tmp_path, "new.json", {"q": 0.4}, {"q": 0.4})
    rc, out = _run(capsys, old, new)
    assert rc == 0
    assert "REGRESSION" not in out


def test_noise_floor_demotes_to_noisy(tmp_path, capsys):
    # new file's own run1/run2 disagree by MORE than the flagged delta:
    # the measurement cannot resolve the difference -> NOISY, exit 0
    old = _file(tmp_path, "old.json", {"q": 1.0}, {"q": 1.0})
    new = _file(tmp_path, "new.json", {"q": 4.0}, {"q": 1.8})
    rc, out = _run(capsys, old, new)
    assert rc == 0
    assert "NOISY" in out and "REGRESSION" not in out


def test_improvement_reported_not_failed(tmp_path, capsys):
    old = _file(tmp_path, "old.json", {"q": 2.0}, {"q": 2.0})
    new = _file(tmp_path, "new.json", {"q": 1.0}, {"q": 1.0})
    rc, out = _run(capsys, old, new)
    assert rc == 0
    assert "improved" in out


def test_added_and_dropped_queries_listed(tmp_path, capsys):
    old = _file(tmp_path, "old.json", {"a": 1.0, "b": 1.0}, {"a": 1.0, "b": 1.0})
    new = _file(tmp_path, "new.json", {"a": 1.0, "c": 1.0}, {"a": 1.0, "c": 1.0})
    rc, out = _run(capsys, old, new)
    assert rc == 0
    assert "dropped from new: ['b']" in out
    assert "new queries: ['c']" in out

"""Unit tests for the bench regression tripwire (tools/bench_gate.py)
— pure python, no Spark session."""

from __future__ import annotations

import importlib.util
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location(
    "bench_gate", REPO / "tools" / "bench_gate.py"
)
bench_gate = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench_gate)


def _write(tmp_path, name, queries, suite):
    p = tmp_path / name
    p.write_text(json.dumps({"value": suite, "queries": queries}))
    return str(p)


def _run(new, old):
    return subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_gate.py"), new, old],
        capture_output=True,
        text=True,
    )


def test_gate_passes_within_budget(tmp_path):
    old = _write(tmp_path, "old.json", {"q1": 1.0, "q2": 0.5}, 1.5)
    new = _write(tmp_path, "new.json", {"q1": 1.1, "q2": 0.55}, 1.65)
    r = _run(new, old)
    assert r.returncode == 0, r.stdout


def test_gate_fails_on_regression(tmp_path):
    old = _write(tmp_path, "old.json", {"q1": 1.0}, 1.0)
    new = _write(tmp_path, "new.json", {"q1": 1.5}, 1.5)
    r = _run(new, old)
    assert r.returncode == 1
    assert "REGRESSED" in r.stdout and "q1" in r.stdout


def test_gate_absolute_floor_absorbs_subsecond_jitter(tmp_path):
    # 90 ms -> 150 ms is +67% but only +60 ms: under the 0.1 s floor
    old = _write(tmp_path, "old.json", {"q5": 0.09}, 0.09)
    new = _write(tmp_path, "new.json", {"q5": 0.15}, 0.15)
    r = _run(new, old)
    assert r.returncode == 0, r.stdout


def test_gate_accepts_driver_wrapper_format(tmp_path):
    # BENCH_r{N}.json nests the line under "parsed"
    p = tmp_path / "wrapped.json"
    p.write_text(
        json.dumps({"parsed": {"value": 1.0, "queries": {"q1": 1.0}}})
    )
    new = _write(tmp_path, "new.json", {"q1": 1.05}, 1.05)
    r = _run(new, str(p))
    assert r.returncode == 0, r.stdout


def test_gate_new_query_passes_with_note(tmp_path):
    old = _write(tmp_path, "old.json", {"q1": 1.0}, 1.0)
    new = _write(tmp_path, "new.json", {"q1": 1.0, "q_new": 9.0}, 10.0)
    r = _run(new, old)
    # q_new has no baseline -> note, not failure; but the suite total
    # regressed beyond budget+floor -> gate fails on "suite"
    assert "NEW" in r.stdout and r.returncode == 1
    assert "suite" in r.stdout


def test_latest_recorded_picks_highest_round():
    p = bench_gate.latest_recorded()
    assert p is not None and p.name.startswith("BENCH_r")

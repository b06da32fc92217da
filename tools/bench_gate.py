"""Bench regression tripwire: compare a fresh bench.py JSON line to
the previous round's recorded BENCH_r{N}.json and fail if any query
regressed beyond budget — so a perf regression is caught in-repo
before the driver's own BENCH run records it.

Usage:
    python bench.py 2>/dev/null | tail -1 > /tmp/bench_now.json
    python tools/bench_gate.py /tmp/bench_now.json            # vs latest BENCH_r*.json
    python tools/bench_gate.py new.json old.json [--budget 0.2]

Budget semantics: a query fails when new > old * (1 + budget) AND
new - old > ABS_FLOOR (0.1 s) — sub-second queries jitter by tens of
milliseconds run-to-run, so a pure ratio gate on a 0.09 s query
would cry wolf; the absolute floor keeps the gate meaningful where
the time is meaningful. New queries (no old number) pass with a
note. The suite total gets the same combined check.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ABS_FLOOR = 0.1  # seconds


def load_bench(path: Path) -> dict:
    """Accept either bench.py's raw JSON line or the driver's
    BENCH_r{N}.json wrapper (which nests it under 'parsed')."""
    obj = json.loads(path.read_text())
    return obj.get("parsed", obj)


def latest_recorded() -> Path | None:
    cands = sorted(
        REPO.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    return cands[-1] if cands else None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("new")
    ap.add_argument("old", nargs="?")
    ap.add_argument("--budget", type=float, default=0.2)
    args = ap.parse_args()

    new = load_bench(Path(args.new))
    old_path = Path(args.old) if args.old else latest_recorded()
    if old_path is None:
        print("bench_gate: no previous BENCH_r*.json — nothing to gate")
        return 0
    old = load_bench(old_path)

    failures = []
    rows = list(new.get("queries", {}).items())
    rows.append(("suite", new.get("value")))
    old_q = dict(old.get("queries", {}))
    old_q["suite"] = old.get("value")
    for name, t_new in rows:
        t_old = old_q.get(name)
        if t_old is None:
            print(f"  NEW  {name}: {t_new:.3f}s (no previous number)")
            continue
        lim = t_old * (1 + args.budget)
        regressed = t_new > lim and (t_new - t_old) > ABS_FLOOR
        mark = "FAIL" if regressed else ("warn" if t_new > lim else "ok  ")
        print(
            f"  {mark} {name}: {t_new:.3f}s vs {t_old:.3f}s"
            f" (budget {lim:.3f}s)"
        )
        if regressed:
            failures.append(name)

    ref = old_path.name if args.old is None else args.old
    if failures:
        print(f"bench_gate: REGRESSED vs {ref}: {failures}")
        return 1
    print(f"bench_gate: green vs {ref} (budget +{args.budget:.0%}, floor {ABS_FLOOR}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""One-command verification: every gate the driver or judge runs,
in dependency order, with a summary line per gate.

    python tools/verify_all.py            # full (~30 min)
    python tools/verify_all.py --quick    # check + dtype + driver-sim (~10 min)

Gates:
  1. tools/check.py       — every key vs its DuckDB oracle (sf0.01)
  2. tools/dtype_sweep.py — lazy schema vs oracle dtype families
  3. driver simulation    — __spark_entry__.entry() on a bare session
  4. pytest tests/        — unit/property/plan/streaming suites
  5. tools/scale_smoke.py — heavy keys at sf0.1 vs ceilings
  6. bench.py             — warm suite timings (prints the JSON line)
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(name: str, cmd: list[str], quiet_tail: int = 3) -> bool:
    t0 = time.time()
    p = subprocess.run(
        cmd, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    dt = time.time() - t0
    ok = p.returncode == 0
    tail = "\n".join(p.stdout.strip().splitlines()[-quiet_tail:])
    print(f"[{'PASS' if ok else 'FAIL'}] {name} ({dt:.0f}s)")
    print("       " + tail.replace("\n", "\n       "))
    return ok


DRIVER_SIM = """
import sys; sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
import __spark_entry__ as e
rows = e.entry(spark).collect()
qs, os_ = e.queries(), e.oracle_sql()
assert set(os_) <= set(qs)
print(f"entry: {{len(rows)}} rows; {{len(qs)}} queries; {{len(os_)}} oracles")
spark.stop()
"""


def main() -> int:
    quick = "--quick" in sys.argv
    ok = True
    ok &= run("check.py (oracle mirror)", [sys.executable, "tools/check.py"], 1)
    ok &= run("dtype_sweep", [sys.executable, "tools/dtype_sweep.py"], 1)
    ok &= run(
        "driver simulation",
        [sys.executable, "-c", DRIVER_SIM.format(repo=str(REPO))],
        1,
    )
    if not quick:
        ok &= run("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"], 2)
        ok &= run("scale_smoke", [sys.executable, "tools/scale_smoke.py"], 1)
        # bench + regression tripwire in one invocation: capture the
        # JSON line bench.py prints, then gate it against the last
        # recorded BENCH_r*.json (±20% per query, 0.1 s floor).
        import subprocess as _sp

        t0 = time.time()
        bench_out = _sp.run(
            [sys.executable, "bench.py"], cwd=REPO, stdout=_sp.PIPE,
            stderr=_sp.DEVNULL, text=True,
        ).stdout.strip().splitlines()
        if bench_out and bench_out[-1].startswith("{"):
            print(f"[PASS] bench ({time.time() - t0:.0f}s)")
            print("       " + bench_out[-1])
            tmp = REPO / ".bench_now.json"
            tmp.write_text(bench_out[-1])
            ok &= run(
                "bench_gate (±20% vs last round)",
                [sys.executable, "tools/bench_gate.py", str(tmp)],
                3,
            )
            tmp.unlink(missing_ok=True)
        else:
            print(f"[FAIL] bench ({time.time() - t0:.0f}s) — no JSON line")
            ok = False
    print("ALL GREEN" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

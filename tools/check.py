"""Local mirror of the driver's t2 correctness gate.

Runs every registered query on Spark and its DuckDB oracle over the
same parquet fixtures, then compares row count, column names, and
order-insensitive exact values. Strictly harsher than any sane
value-hash, so green here should mean green in CORRECTNESS_r{N}.json.

Usage:
    python tools/check.py [--sf /root/testdata/sf0.01] [key ...]
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from dags_spark.registry import all_specs  # noqa: E402
from dags_spark.session import get_spark  # noqa: E402
from dags_spark.testing import compare, duck_connect  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    specs = all_specs()
    keys = args.keys or list(specs)
    unknown = [k for k in keys if k not in specs]
    if unknown:
        print(f"unknown keys: {unknown}")
        return 2

    spark = get_spark("dags_spark-check")
    con = duck_connect(args.sf)
    n_pass = n_fail = 0
    rows_pending: list[str] = []
    for k in keys:
        spec = specs[k]
        t0 = time.time()
        try:
            spark_pdf = spec.fn(spark, args.sf).toPandas()
        except Exception:
            print(f"FAIL {k}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if spec.check == "rows" or spec.oracle is None:
            rows_pending.append(k)
            print(f"ROWS {k}: {len(spark_pdf)} rows ({time.time()-t0:.2f}s)")
            continue
        try:
            duck_pdf = con.execute(spec.oracle).df()
        except Exception:
            print(f"FAIL {k}: duckdb raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL {k} ({time.time()-t0:.2f}s)")
            for p in problems:
                print(f"    {p}")
        else:
            n_pass += 1
            print(f"PASS {k}: {len(spark_pdf)} rows ({time.time()-t0:.2f}s)")
    # Rows-checked keys are only as strong as their paired property
    # tests (VERDICT r7 directive #7): run those pytest node ids in
    # THIS session and stamp the per-key verdict, so the weaker check
    # class cannot silently regress while the sweep stays green.
    if rows_pending:
        import subprocess  # noqa: PLC0415

        node_ids = sorted(
            {t for k in rows_pending for t in specs[k].prop_tests}
        )
        res = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "--no-header", *node_ids],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        ok = res.returncode == 0
        for k in rows_pending:
            verdict = "prop-tests passed" if ok else "PROP-TESTS FAILED"
            print(f"ROWS {k}: [{'ok' if ok else 'FAIL'}: {verdict}:"
                  f" {', '.join(specs[k].prop_tests)}]")
            if ok:
                n_pass += 1
            else:
                n_fail += 1
        if not ok:
            print(res.stdout[-4000:])
    print(f"\n{n_pass} passed, {n_fail} failed, {len(keys)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

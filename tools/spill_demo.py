"""Spill-resilience demonstration (VERDICT r9 directive #2).

At 100 TB every shuffle spills; the sandbox had never exercised that
path. This tool runs the two exchange-heaviest TPC-H shapes (q2 star
join, q8 returns) on the sf100 standard layout with the local JVM heap
deliberately capped, so the sort-merge joins and aggregates MUST spill
to disk, then proves:

  1. the queries still complete (graceful spill, no OOM);
  2. results stay EXACTLY equal to the DuckDB oracle (the same
     value-compare as tools/check.py — spilling changes where bytes
     live, never what they are);
  3. how much was spilled (memory/disk bytes from the status REST API,
     summed over stages) and the wall-time degradation vs the uncapped
     BENCH_SF100 numbers.

Usage:  python tools/spill_demo.py [--tier 100] [--mem 4g] [--reps 2]

The capped heap must be set before the JVM starts, so this tool owns
its session (it will refuse to run if one exists).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = {
    "q2_star_join": "join_star_multiway",
    "q8_tpch_q10": "tpch_q10_returns",
}


def rest_spill_totals(ui_port: int) -> dict:
    """Sum spill/shuffle counters over all completed stages."""
    base = f"http://localhost:{ui_port}/api/v1/applications"
    apps = json.loads(urllib.request.urlopen(base, timeout=10).read())
    app_id = apps[0]["id"]
    stages = json.loads(
        urllib.request.urlopen(f"{base}/{app_id}/stages", timeout=10).read()
    )
    tot = {"memoryBytesSpilled": 0, "diskBytesSpilled": 0,
           "shuffleWriteBytes": 0}
    for st in stages:
        for k in tot:
            tot[k] += st.get(k, 0)
    return tot


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", type=int, default=100, choices=(10, 100))
    ap.add_argument("--mem", default="4g")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from bench_sf1 import TIERS  # same tier paths as the bench tool

    out_dir = TIERS[args.tier][0]
    if not (Path(out_dir) / "_COMPLETE").exists():
        print(f"tier data missing: {out_dir} (run bench_sf1 --tier first)")
        return 2

    import os

    import duckdb
    from pyspark.sql import SparkSession

    ui_port = 4049
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("dags_spark-spill-demo")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", args.mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.port", str(ui_port))
        .config("spark.sql.shuffle.partitions",
                {10: "32", 100: "128"}[args.tier])
        .config("spark.sql.files.maxPartitionBytes",
                {10: "4m", 100: "256m"}[args.tier])
        .config("spark.sql.adaptive.enabled", "false")
        .getOrCreate()
    )

    from dags_spark.registry import all_specs
    from dags_spark.testing import TABLES, compare

    specs = all_specs()
    con = duckdb.connect()
    for t_ in TABLES:
        p = f"{out_dir}/{t_}.parquet"
        glob = "/*.parquet" if Path(p).is_dir() else ""
        con.execute(
            f"CREATE OR REPLACE VIEW {t_} AS SELECT * FROM"
            f" read_parquet('{p}{glob}')"
        )

    results = []
    for label, key in QUERIES.items():
        spec = specs[key]
        spark.sparkContext.setJobDescription(f"spill-demo {label}")
        before = rest_spill_totals(ui_port)

        def once() -> float:
            t0 = time.time()
            spec.fn(spark, out_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.time() - t0

        once()
        wall = round(min(once() for _ in range(args.reps)), 3)
        after = rest_spill_totals(ui_port)
        spilled = {k: after[k] - before[k] for k in after}

        # exact value compare vs the DuckDB oracle (check.py semantics)
        spark_pdf = spec.fn(spark, out_dir).toPandas()
        duck_pdf = con.execute(spec.oracle).fetchdf()
        ok, msg = compare(spark_pdf, duck_pdf)
        results.append(
            {
                "query": label,
                "heap": args.mem,
                "wall_s": wall,
                "memory_spilled_gb": round(
                    spilled["memoryBytesSpilled"] / 1024**3, 2
                ),
                "disk_spilled_gb": round(
                    spilled["diskBytesSpilled"] / 1024**3, 2
                ),
                "oracle_match": bool(ok),
                "note": "" if ok else msg,
            }
        )
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"spill_demo": results}))
    return 0 if all(r["oracle_match"] for r in results) else 1


if __name__ == "__main__":
    sys.exit(main())

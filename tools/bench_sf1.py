"""sf1 bench tier: the 10 headline queries, Spark vs the SAME DuckDB
oracle SQL, on a deterministic 10x scale-up of the sf0.1 fixtures.

Purpose: the per-query "<= 2x of DuckDB" bar at sf0.1 is dominated by
Spark's fixed per-query cost (~0.2-0.4 s of task scheduling, codegen,
stage launch) against an in-process vectorized engine on toy data.
This tier measures the same query pair at 10x the rows, where real
work amortizes the constants — the crossover the sub-second numbers
can't show. Results go to BENCH_SF1.md (committed per round).

Scale-up design (pure replication algebra, no RNG — byte-stable
across runs):
  * replica r in 0..9; every key column k becomes k*10+r, applied
    consistently on BOTH sides of every FK (l_orderkey/o_orderkey,
    o_custkey/c_custkey, l_partkey/p_partkey, l_suppkey/s_suppkey,
    user_id), so join fan-outs and per-key cardinalities match sf1
    rather than multiplying pair counts.
  * documents: replica 0 keeps the text, others append ' repN' —
    cluster sizes stay sf0.1-like (no artificial 10-doc exact-dup
    clusters that would quadratically inflate pair queries on BOTH
    engines and measure nothing).
  * embeddings: dimension 0 shifts by r/1000 per replica — kills
    cosine ties so top-k is deterministic, keeps vectors realistic.
  * region/nation/part/supplier: part/supplier keys replicate with
    their lineitem FKs; region/nation are genuine small dims at
    every SF and stay as-is.

Usage:  python tools/bench_sf1.py [--rebuild] [--reps 3] [--md]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from dags_spark.registry import all_specs  # noqa: E402
from dags_spark.session import get_spark  # noqa: E402
from dags_spark.testing import TABLES  # noqa: E402

BASE = "/root/testdata/sf0.1"
# tier presets: replicas over sf0.1, output dir, nominal SF, md file.
# sf10 exists to prove PER-QUERY monotone ratio convergence (the sf1
# report's q1-only probe, generalized to the whole suite).
TIERS = {
    1: ("/tmp/dags_spark_sf1_v1", 10, 1.0, "BENCH_SF1.md"),
    10: ("/tmp/dags_spark_sf10_v1", 100, 10.0, "BENCH_SF10.md"),
}
OUT = TIERS[1][0]
REPLICAS = 10

HEADLINE = {
    "q1_pricing_summary": "agg_pricing_summary",
    "q2_star_join": "join_star_multiway",
    "q3_topk_per_customer": "win_topk_per_group",
    "q4_sessionize": "win_session_batch",
    "q5_dedup_exact": "dedup_exact",
    "q6_cosine_topk": "sim_search_topk",
    "q7_tpch_q3": "tpch_q3_shipping",
    "q8_tpch_q10": "tpch_q10_returns",
    "q9_minhash_banded": "dedup_minhash_banded",
    "q10_text_pipeline": "text_pipeline_clean",
}


def build(spark) -> None:
    from pyspark.sql import functions as F

    from dags_spark.io import table as t

    os.makedirs(OUT, exist_ok=True)
    marker = os.path.join(OUT, "_COMPLETE")
    if os.path.exists(marker):
        return
    rep = F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("r")

    def scale_key(col):
        return (F.col(col) * REPLICAS + F.col("r")).alias(col)

    def write(df, name, files=8):
        # file count bounds scan parallelism here: these ~10 MB files
        # are single row groups, and a row group never splits across
        # tasks — 32 files for the big facts = genuine 32-way scans.
        # higher tiers scale the file count with the replica factor so
        # per-file size (and thus split behavior) stays comparable.
        files = files * max(1, REPLICAS // 10)
        df.repartition(files).write.mode("overwrite").parquet(
            os.path.join(OUT, f"{name}.parquet")
        )

    li = t(spark, BASE, "lineitem").select("*", rep)
    write(
        li.select(
            scale_key("l_orderkey"), scale_key("l_partkey"),
            scale_key("l_suppkey"), "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        ),
        "lineitem",
        files=32,
    )
    o = t(spark, BASE, "orders").select("*", rep)
    write(
        o.select(
            scale_key("o_orderkey"), scale_key("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        ),
        "orders",
        files=32,
    )
    c = t(spark, BASE, "customer").select("*", rep)
    write(
        c.select(
            scale_key("c_custkey"), "c_name", "c_nationkey", "c_acctbal",
            "c_mktsegment",
        ),
        "customer",
    )
    s = t(spark, BASE, "supplier").select("*", rep)
    write(
        s.select(scale_key("s_suppkey"), "s_name", "s_nationkey", "s_acctbal"),
        "supplier",
    )
    p = t(spark, BASE, "part").select("*", rep)
    write(
        p.select(
            scale_key("p_partkey"), "p_name", "p_brand", "p_type", "p_size",
            "p_retailprice",
        ),
        "part",
    )
    ev = t(spark, BASE, "events").select("*", rep)
    write(
        ev.select(
            scale_key("event_id"), "ts", scale_key("user_id"), "event_type",
            "value", "props",
        ),
        "events",
        files=16,
    )
    d = t(spark, BASE, "documents").select("*", rep)
    write(
        d.select(
            scale_key("doc_id"),
            F.when(F.col("r") == 0, F.col("text"))
            .otherwise(F.concat("text", F.lit(" rep"), F.col("r")))
            .alias("text"),
            "lang",
            "source",
            F.when(F.col("r") == 0, F.col("n_chars"))
            .otherwise(F.col("n_chars") + F.lit(4) + F.length(F.col("r").cast("string")))
            .alias("n_chars"),
        ),
        "documents",
    )
    e = t(spark, BASE, "embeddings").select("*", rep)
    emb_cols = [f.name for f in e.schema.fields if f.name not in ("vec_id", "embedding", "r")]
    write(
        e.select(
            scale_key("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x + F.when(i == 0, F.col("r") / 1000.0).otherwise(F.lit(0.0)),
            ).alias("embedding"),
            *emb_cols,
        ),
        "embeddings",
    )
    for name in ("region", "nation"):
        src = os.path.join(BASE, f"{name}.parquet")
        dst = os.path.join(OUT, f"{name}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(src, dst)
    Path(marker).touch()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--md", action="store_true", help="write BENCH_SF{tier}.md")
    ap.add_argument("--tier", type=int, default=1, choices=sorted(TIERS))
    args = ap.parse_args()

    global OUT, REPLICAS
    OUT, REPLICAS, nominal_sf, md_name = TIERS[args.tier]

    if args.rebuild and os.path.exists(OUT):
        shutil.rmtree(OUT)

    spark = get_spark("dags_spark-bench-sf1")
    # same knob story as bench.py, scaled: sf1 shuffles carry ~10x the
    # bytes, so the 8-partition sf0.1 seed underparallelizes; 32 (=
    # cores) is the measured sweet spot. Splits follow file size up.
    spark.conf.set("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    # 4m splits + 32-file facts: measured best of {16m,4m,2m} x
    # {32,64} shuffle partitions for this suite on local[32].
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t0 = time.time()
    build(spark)
    build_s = time.time() - t0

    specs = all_specs()
    con = duckdb.connect()
    for t_ in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t_} AS SELECT * FROM"
            f" read_parquet('{OUT}/{t_}.parquet{'/*.parquet' if os.path.isdir(f'{OUT}/{t_}.parquet') else ''}')"
        )

    rows: list[dict] = []
    for label, key in HEADLINE.items():
        spec = specs[key]

        def spark_once() -> float:
            t = time.time()
            spec.fn(spark, OUT).write.format("noop").mode("overwrite").save()
            return time.time() - t

        def duck_once() -> float:
            t = time.time()
            con.execute(spec.oracle).fetchall()
            return time.time() - t

        spark_once()
        s_t = round(min(spark_once() for _ in range(args.reps)), 3)
        duck_once()
        d_t = round(min(duck_once() for _ in range(args.reps)), 3)
        ratio = round(s_t / d_t, 2) if d_t > 0 else float("inf")
        rows.append(
            {"query": label, "spark_s": s_t, "duckdb_s": d_t, "ratio": ratio}
        )
        print(f"{label}: spark {s_t}s  duckdb {d_t}s  ratio {ratio}x", flush=True)

    suite_s = round(sum(r["spark_s"] for r in rows), 3)
    suite_d = round(sum(r["duckdb_s"] for r in rows), 3)
    result = {
        "metric": f"sf{args.tier}_suite_warm_seconds",
        "value": suite_s,
        "unit": "sec",
        "sf": nominal_sf,
        "duckdb_suite_sec": suite_d,
        "suite_ratio": round(suite_s / suite_d, 2),
        "build_sec": round(build_s, 1),
        "queries": rows,
    }
    print(json.dumps(result))

    if args.md:
        lines = [
            f"# BENCH_SF{args.tier} — {REPLICAS}x scale tier"
            " (deterministic sf0.1 replication)",
            "",
            f"Generated by `python tools/bench_sf1.py --tier {args.tier}"
            " --md` — same query",
            "pairs as bench.py (Spark fn vs its registered DuckDB oracle),",
            "warm, min-of-%d, identical data both engines. See the" % args.reps,
            "module docstring for the replication algebra. Machine: 32",
            "CPUs / 128 GB, DuckDB in-process (all cores), Spark local[32].",
            "",
            "| query | Spark s | DuckDB s | Spark/DuckDB |",
            "|---|---|---|---|",
        ]
        for r in rows:
            lines.append(
                f"| {r['query']} | {r['spark_s']:.3f} | {r['duckdb_s']:.3f} |"
                f" {r['ratio']:.2f}x |"
            )
        lines.append(
            f"| **suite** | **{suite_s:.3f}** | **{suite_d:.3f}** |"
            f" **{result['suite_ratio']:.2f}x** |"
        )
        if args.tier == 1:
            lines += [
                "",
                "## Reading these numbers",
                "",
                "The suite is at parity and Spark wins outright wherever the",
                "query does real distributed work (windows/sessionization,",
                "blocked similarity, banded MinHash). The remaining >2x rows",
                "are the scan-light TPC-H shapes — an in-process vectorized",
                "engine's single best case. Their ratio is a function of",
                "data volume, measured on q1 by replaying the same pair at",
                "growing replication (same machine, warm, min-of-N; probe:",
                "the sf10/sf100 recipe in this file's git history):",
                "",
                "| rows (lineitem) | Spark s | DuckDB s | ratio |",
                "|---|---|---|---|",
                "| 6 M (sf1) | 0.60 | 0.06 | 10.6x |",
                "| 60 M (sf10) | 1.83 | 0.47 | 3.9x |",
                "| 600 M (sf100) | 14.1 | 4.9 | 2.85x |",
                "",
                "Monotone convergence: Spark's fixed per-query cost and",
                "JVM-row-vs-vector gap amortize as volume grows, but a",
                "single-node columnar engine keeps a constant-factor edge on",
                "pure scan+agg for as long as the data fits one machine.",
                "That is the honest boundary: these shapes don't need a",
                "cluster until the data outgrows one node — which is the",
                "100 TB design point this repo optimizes for, where the",
                "DuckDB column of this table stops existing.",
            ]
        lines.append("")
        (REPO / md_name).write_text("\n".join(lines))
        print(f"wrote {md_name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

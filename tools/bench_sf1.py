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
    100: ("/tmp/dags_spark_sf100_v1", 1000, 100.0, "BENCH_SF100.md"),
}

# tier-100 exceptions (VERDICT r7 directive #4): these two queries'
# DuckDB oracles are quadratic in corpus size (exact all-pairs cosine;
# the n-gram Jaccard verify side) — at sf100 the oracle would run for
# hours, so the Spark side is measured alone (single warm run) and the
# sf10 oracle ratio is carried forward, clearly marked in the MD.
ORACLE_SKIP_SF100 = {"q6_cosine_topk": 0.05, "q9_minhash_banded": 0.12}
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

    # The sf0.1 seeds are 1-3 files, so without a pre-explode
    # repartition the xREPLICAS generator runs 1-3 tasks wide — at
    # tier 100 that serializes a 600M-row produce onto 3 cores. Widen
    # the INPUT first (cheap: the seed is ~MBs) so the explode and the
    # downstream shuffle write run at machine width.
    def wide(df):
        return df.repartition(32)

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

    li = wide(t(spark, BASE, "lineitem")).select("*", rep)
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
    o = wide(t(spark, BASE, "orders")).select("*", rep)
    write(
        o.select(
            scale_key("o_orderkey"), scale_key("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        ),
        "orders",
        files=32,
    )
    c = wide(t(spark, BASE, "customer")).select("*", rep)
    write(
        c.select(
            scale_key("c_custkey"), "c_name", "c_nationkey", "c_acctbal",
            "c_mktsegment",
        ),
        "customer",
    )
    s = wide(t(spark, BASE, "supplier")).select("*", rep)
    write(
        s.select(scale_key("s_suppkey"), "s_name", "s_nationkey", "s_acctbal"),
        "supplier",
    )
    p = wide(t(spark, BASE, "part")).select("*", rep)
    write(
        p.select(
            scale_key("p_partkey"), "p_name", "p_brand", "p_type", "p_size",
            "p_retailprice",
        ),
        "part",
    )
    ev = wide(t(spark, BASE, "events")).select("*", rep)
    write(
        ev.select(
            scale_key("event_id"), "ts", scale_key("user_id"), "event_type",
            "value", "props",
        ),
        "events",
        files=16,
    )
    d = wide(t(spark, BASE, "documents")).select("*", rep)
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
    e = wide(t(spark, BASE, "embeddings")).select("*", rep)
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


def bucketed_tier(spark, reps: int) -> dict:
    """The exchange-free answer for the non-converging fact shapes
    (VERDICT r7 directive #1; q7 added in round 9 per r8 directive
    #1): q2_star_join, q7_tpch_q3 and q8_tpch_q10 are exchange-bound
    because every run re-shuffles the lineitem/orders fact pair on
    orderkey. At 100 TB that shuffle is paid ONCE at layout time —
    both facts written bucketed+sorted on the join key — and every
    subsequent query on the pair joins exchange-free (all three
    queries share the SAME two bucketed tables, which is the point:
    the layout cost amortizes across the whole fact-pair workload).
    This measures exactly that: same queries, same results (asserted
    equal to the standard-layout Spark run), fact join with zero
    Exchange, bucket-build cost reported separately as the amortized
    one-time layout cost."""
    from pyspark.sql import functions as F

    from dags_spark.io import table as t
    from dags_spark.operators.scale import write_bucketed
    from dags_spark.queries import cents, dec_sum

    tag = f"sf{REPLICAS // 10}"
    t_li, t_o = f"bkt_lineitem_{tag}", f"bkt_orders_{tag}"
    n_buckets = 32

    t0 = time.time()
    li = t(spark, OUT, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_returnflag",
        "l_shipdate",  # round 9: q7 joins the same pair, filters shipdate
    )
    # orders keeps its own key name: Spark recognizes co-bucketed
    # layouts across differently-named equi-join keys.
    o = t(spark, OUT, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    write_bucketed(li, t_li, "l_orderkey", n_buckets, sort_key="l_orderkey")
    write_bucketed(o, t_o, "o_orderkey", n_buckets, sort_key="o_orderkey")
    build_s = round(time.time() - t0, 1)

    rev_c4 = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))

    def q2_bucketed():
        bli = spark.table(t_li)
        bo = spark.table(t_o).filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        c = t(spark, OUT, "customer")
        n = t(spark, OUT, "nation")
        r = t(spark, OUT, "region").filter(F.col("r_regionkey") < 3)
        dim = (
            c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .select("c_custkey", "n_name")
        )
        return (
            bli.join(bo, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(dim), F.col("o_custkey") == dim.c_custkey)
            .groupBy("n_name")
            .agg(
                (F.sum(rev_c4).cast("double") / F.lit(10000.0)).alias("revenue"),
                F.count(F.lit(1)).alias("n_lineitems"),
            )
        )

    def q2_bucketed_eager():
        """q2 with EAGER AGGREGATION on the bucketed layout — the
        experiment VERDICT r9 directive #1 asked for, kept as a
        measured row per tier. lineitem is pre-aggregated by
        l_orderkey (revenue partial-sum + row count) BEFORE the fact
        join; the final GROUP BY n_name folds the partials
        (COUNT(*) -> SUM(n_li); the integer-cents SUM regroups
        losslessly; o_orderkey is unique in orders and the dim chain
        is N:1 — parity asserted below like every bucketed variant).
        With the sorted-scan confs above the pre-pass gets its BEST
        POSSIBLE plan: a streaming SortAggregate straight off the
        sorted bucket files, no exchange, no sort, output still
        bucketed+sorted, SMJ sort-free, ~4x fewer join/dim probes.

        MEASURED NEGATIVE anyway (the honest-negative precedent):
        sf0.1 0.91 s vs 0.38 s (eager adds the only fact exchange);
        sf10 standard 11.9 s vs 7.6 s (round-robin files -> map-side
        agg collapses nothing); sf10 bucketed 2.9 s vs 2.0 s even on
        the ideal SortAggregate plan — the aggregate operator is
        CodegenFallback, so it breaks the fused scan->SMJ codegen
        pipeline and its per-row cost exceeds what a 4:1 fan-in
        saves. Eager aggregation needs a much larger fan-in to pay
        here. The declared query therefore keeps its plain plan; this
        variant stays measured so the negative is re-checked per
        tier."""
        bli = spark.table(t_li)
        pre = bli.groupBy("l_orderkey").agg(
            F.sum(rev_c4).alias("rev_c4"),
            F.count(F.lit(1)).alias("n_li"),
        )
        bo = spark.table(t_o).filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        c = t(spark, OUT, "customer")
        n = t(spark, OUT, "nation")
        r = t(spark, OUT, "region").filter(F.col("r_regionkey") < 3)
        dim = (
            c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .select("c_custkey", "n_name")
        )
        return (
            pre.join(bo, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(dim), F.col("o_custkey") == dim.c_custkey)
            .groupBy("n_name")
            .agg(
                (F.sum("rev_c4").cast("double") / F.lit(10000.0)).alias(
                    "revenue"
                ),
                F.sum("n_li").alias("n_lineitems"),
            )
        )

    def q7_bucketed():
        cutoff = F.lit("1998-07-01").cast("timestamp")
        bli = spark.table(t_li).filter(F.col("l_shipdate") > cutoff)
        bo = spark.table(t_o).filter(F.col("o_orderdate") < cutoff)
        cust = (
            t(spark, OUT, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey")
        )
        return (
            bo.join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
            .join(bli, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_orderkey", "o_orderdate")
            .agg(
                dec_sum(
                    F.expr("l_extendedprice * (1 - l_discount)"), 4
                ).alias("revenue")
            )
            .select("l_orderkey", "revenue", "o_orderdate")
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
            .limit(10)
        )

    def q8_bucketed():
        bli = spark.table(t_li).filter(F.col("l_returnflag") == "R")
        bo = spark.table(t_o).filter(
            (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-04-01").cast("timestamp"))
        )
        cust = t(spark, OUT, "customer")
        nation = t(spark, OUT, "nation")
        return (
            bli.join(bo, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(cust, F.col("o_custkey") == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(
                dec_sum(
                    F.expr("l_extendedprice * (1 - l_discount)"), 4
                ).alias("revenue")
            )
            .select("c_custkey", "c_name", "revenue", "n_name")
            .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
            .limit(20)
        )

    specs = all_specs()
    # ROUND 10: make Spark TRUST the sortBy order of the bucketed
    # layout. By default (SPARK-28595) a bucketed scan reports NO
    # outputOrdering — it is gated behind this conf because deciding
    # it needs an eager one-file-per-bucket listing — so every merge
    # join on the bucketed pair was silently re-SORTING both sides.
    # write_bucketed guarantees one sorted file per bucket, the conf
    # turns that into plan ordering, and the SMJ drops both Sorts:
    # measured 2.10 s -> 1.49 s on bucketed q2 at sf10 (interleaved
    # A/B, min-of-3; plan Sort nodes 2 -> 0). replaceHashWithSortAgg
    # additionally lets a groupBy(bucket+sort key) lower to a
    # streaming SortAggregate (used by the eager q2 variant below).
    # Both restored after the tier; both are no-ops for plans whose
    # child ordering does not already satisfy the requirement.
    prev_rhs = spark.conf.get("spark.sql.execution.replaceHashWithSortAgg", "false")
    prev_ord = spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
    )
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "true")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    out: dict = {"bucket_build_sec": build_s, "n_buckets": n_buckets, "queries": []}
    for label, key, fn in (
        ("q2_star_join", "join_star_multiway", q2_bucketed),
        ("q2_star_join+eager", "join_star_multiway", q2_bucketed_eager),
        ("q7_tpch_q3", "tpch_q3_shipping", q7_bucketed),
        ("q8_tpch_q10", "tpch_q10_returns", q8_bucketed),
    ):
        df = fn()

        def shuffle_count(d) -> int:
            import re

            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString
            plan = d._jdf.queryExecution().explainString(mode("formatted"))
            # detail headers: "(12) Exchange" — BroadcastExchange is a
            # different operator name and never matches
            return len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))

        bkt_ex = shuffle_count(df)
        std_ex = shuffle_count(specs[key].fn(spark, OUT))
        # At the sf10 tier (where the fact pair genuinely shuffles —
        # at sf1 Catalyst auto-broadcasts the filtered orders side and
        # there is nothing to remove) the fact-pair shuffles must be
        # GONE; what remains is the post-join aggregate grain, which
        # is orders-of-magnitude smaller than the fact pair.
        if REPLICAS >= 100:
            assert bkt_ex < std_ex, f"{label}: bucketing removed no exchange"
        # result parity vs the standard-layout Spark query
        std = (
            specs[key]
            .fn(spark, OUT)
            .toPandas()
            .sort_values(by=list(specs[key].fn(spark, OUT).columns))
            .reset_index(drop=True)
        )
        got = df.toPandas().sort_values(by=list(df.columns)).reset_index(drop=True)
        assert got.equals(std[got.columns]), f"{label}: bucketed result diverged"

        def once() -> float:
            t1 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            return time.time() - t1

        once()
        s_t = round(min(once() for _ in range(reps)), 3)
        out["queries"].append(
            {
                "query": label,
                "spark_bucketed_s": s_t,
                "shuffles_std": std_ex,
                "shuffles_bucketed": bkt_ex,
            }
        )
        print(
            f"{label} [bucketed]: spark {s_t}s"
            f" (shuffle exchanges {std_ex} -> {bkt_ex})",
            flush=True,
        )
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", prev_rhs)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", prev_ord)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--md", action="store_true", help="write BENCH_SF{tier}.md")
    ap.add_argument("--tier", type=int, default=1, choices=sorted(TIERS))
    ap.add_argument(
        "--bucketed",
        action="store_true",
        help="also measure q2/q7/q8 on a pre-bucketed fact layout",
    )
    args = ap.parse_args()

    global OUT, REPLICAS
    OUT, REPLICAS, nominal_sf, md_name = TIERS[args.tier]

    if args.rebuild and os.path.exists(OUT):
        shutil.rmtree(OUT)

    spark = get_spark("dags_spark-bench-sf1")
    # same knob story as bench.py, scaled: sf1 shuffles carry ~10x the
    # bytes, so the 8-partition sf0.1 seed underparallelizes; 32 (=
    # cores) is the measured sweet spot. Splits follow file size up.
    # shuffle width scales with tier volume: ~60-450 MB/partition at
    # 32 for tiers 1/10; sf100 moves ~10x the bytes per exchange, so
    # 128 keeps partitions in the executor-memory comfort zone.
    default_shuffle = {1: "32", 10: "32", 100: "128"}[args.tier]
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_SHUFFLE", default_shuffle),
    )
    # Split sizing must FOLLOW THE LAYOUT, not stay fixed: the goal is
    # a scan-task count a few multiples of the core count. Tiers 1/10
    # carry 32-320 ~10 MB files, so 4m splits (measured best of
    # {16m,4m,2m}) land at 64-640 tasks. Tier 100 carries 3,200 files
    # (~7 MB each): 4m would split each file in two — 6,400 tasks of
    # pure scheduling overhead per fact scan, measured to inflate the
    # scan-light TPC-H shapes 6-8x (q7 117.5s -> 19.5s, q8 119.4s ->
    # 15.6s just by re-sizing; 512m is flat-to-worse, under-
    # parallelized). 256m packs ~23 files per task -> ~140 tasks.
    default_mpb = {1: "4m", 10: "4m", 100: "256m"}[args.tier]
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes",
        os.environ.get("SPARK_GRAFT_MAXPB", default_mpb),
    )
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
        skip_oracle = args.tier == 100 and label in ORACLE_SKIP_SF100

        def spark_once() -> float:
            t = time.time()
            spec.fn(spark, OUT).write.format("noop").mode("overwrite").save()
            return time.time() - t

        def duck_once() -> float:
            t = time.time()
            con.execute(spec.oracle).fetchall()
            return time.time() - t

        if skip_oracle:
            # single warm run: these Spark sides are themselves
            # block-quadratic and minutes-long at sf100
            spark_once()
            s_t = round(spark_once(), 3)
            rows.append(
                {
                    "query": label,
                    "spark_s": s_t,
                    "duckdb_s": None,
                    "ratio": None,
                    "sf10_ratio_carried": ORACLE_SKIP_SF100[label],
                }
            )
            print(f"{label}: spark {s_t}s  duckdb SKIPPED (quadratic oracle)",
                  flush=True)
            continue
        spark_once()
        s_t = round(min(spark_once() for _ in range(args.reps)), 3)
        duck_once()
        d_t = round(min(duck_once() for _ in range(args.reps)), 3)
        ratio = round(s_t / d_t, 2) if d_t > 0 else float("inf")
        rows.append(
            {"query": label, "spark_s": s_t, "duckdb_s": d_t, "ratio": ratio}
        )
        print(f"{label}: spark {s_t}s  duckdb {d_t}s  ratio {ratio}x", flush=True)

    measured = [r for r in rows if r["duckdb_s"] is not None]
    suite_s = round(sum(r["spark_s"] for r in measured), 3)
    suite_d = round(sum(r["duckdb_s"] for r in measured), 3)
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
    if args.bucketed:
        result["bucketed"] = bucketed_tier(spark, args.reps)
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
            if r["duckdb_s"] is None:
                lines.append(
                    f"| {r['query']} | {r['spark_s']:.3f} |"
                    " (skipped: quadratic oracle) |"
                    f" {r['sf10_ratio_carried']:.2f}x @sf10, carried |"
                )
            else:
                lines.append(
                    f"| {r['query']} | {r['spark_s']:.3f} |"
                    f" {r['duckdb_s']:.3f} | {r['ratio']:.2f}x |"
                )
        lines.append(
            f"| **suite{' (8 measured pairs)' if len(measured) < len(rows) else ''}**"
            f" | **{suite_s:.3f}** | **{suite_d:.3f}** |"
            f" **{result['suite_ratio']:.2f}x** |"
        )
        if args.bucketed:
            b = result["bucketed"]
            std = {r["query"]: r for r in rows}
            lines += [
                "",
                "## Bucketed layout (the 100 TB answer for the fact shapes)",
                "",
                "The two non-converging rows above are exchange-bound: every",
                "run re-shuffles the lineitem/orders fact pair on orderkey.",
                "At scale that shuffle is paid ONCE — both facts written",
                f"bucketed+sorted on the join key ({b['n_buckets']} buckets,",
                f"one-time layout cost {b['bucket_build_sec']}s, amortized",
                "across every future query on the pair) — and the join runs",
                "with the FACT-PAIR exchanges gone (per-plan shuffle",
                "counts below — what remains is the post-join grain:",
                "the group-key exchange, orders of magnitude smaller",
                "than the fact pair). Results are asserted equal to the",
                "standard-layout Spark run.",
                "",
                "| query | standard s | bucketed s | speedup |"
                " vs DuckDB | shuffle exchanges |",
                "|---|---|---|---|---|---|",
            ]
            for r in b["queries"]:
                srow = std[r["query"].split("+")[0]]
                sp = srow["spark_s"] / r["spark_bucketed_s"]
                vs = r["spark_bucketed_s"] / srow["duckdb_s"]
                lines.append(
                    f"| {r['query']} | {srow['spark_s']:.3f} |"
                    f" {r['spark_bucketed_s']:.3f} | {sp:.1f}x |"
                    f" {vs:.2f}x | {r['shuffles_std']} -> "
                    f"{r['shuffles_bucketed']} |"
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

"""Round-11 A/B harness: old (round-10 HEAD) vs new, one session.

Same protocol as tools/ab_r10.py (this box drifts ±20% between
sessions): variant A and variant B alternate rep by rep, min-of-N
each, rows asserted identical before timing. Old implementations are
shadow-loaded from git (`git show BASE_REV:<path>`) — no stale copies.

Usage: python tools/ab_r11.py [--reps 7] [pair ...]
Pairs: q6, hubness, lsh, minhash, l2, labelsep, edge_support, triangle, labelprop
"""

from __future__ import annotations

import argparse
import importlib.util
import math
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from dags_spark.registry import all_specs  # noqa: E402
from dags_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# Round-10 HEAD: the last commit before the round-11 optimization work.
BASE_REV = os.environ.get("SPARK_GRAFT_AB_BASE", "7e09bad")


def load_old(rel_path: str, name: str):
    src = subprocess.run(
        ["git", "show", f"{BASE_REV}:{rel_path}"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    d = Path(tempfile.mkdtemp(prefix="ab_r11_"))
    p = d / f"{name}.py"
    p.write_text(src)
    spec = importlib.util.spec_from_file_location(name, p)
    mod = importlib.util.module_from_spec(spec)
    assert spec.loader is not None
    spec.loader.exec_module(mod)
    return mod


def bench_profile(spark) -> None:
    spark.conf.set(
        "spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", "8")
    )
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes",
        os.environ.get("SPARK_GRAFT_AB_SPLITS", "2m"),
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")


def table(spark, name: str):
    return spark.read.parquet(f"{SF_DIR}/{name}.parquet")


def time_noop(spark, df) -> float:
    t = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t


def rows_key(df):
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return sorted(
        tuple(str(v) for v in row) for row in pdf[cols].itertuples(index=False)
    )


def ab(spark, label: str, mk_old, mk_new, reps: int, check: bool = True) -> None:
    if check:
        assert rows_key(mk_old()) == rows_key(mk_new()), f"{label}: rows differ"
    for mk in (mk_old, mk_new, mk_old, mk_new):
        time_noop(spark, mk())
    olds, news = [], []
    for _ in range(reps):
        olds.append(time_noop(spark, mk_old()))
        news.append(time_noop(spark, mk_new()))
    o, n = min(olds), min(news)
    print(
        f"AB {label}: old {o:.3f}s new {n:.3f}s ({o / n:.2f}x) "
        f"[old med {sorted(olds)[len(olds) // 2]:.3f} "
        f"new med {sorted(news)[len(news) // 2]:.3f}]",
        flush=True,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("pairs", nargs="*", default=["q6"])
    args = ap.parse_args()

    spark = get_spark("dags_spark-ab-r11")
    bench_profile(spark)
    specs = all_specs()

    if "q6" in args.pairs:
        # old = round-10's UNCONDITIONAL chunk split (m=isqrt(P));
        # new = adaptive_chunks gate (m=1 at sf0.1 corpus size).
        old_sim = load_old("dags_spark/operators/similarity.py", "old_similarity")
        m = max(1, math.isqrt(spark.sparkContext.defaultParallelism))

        def old_q6():
            pairs = old_sim.blocked_pairs(
                table(spark, "embeddings"), per_block_topk=100, n_chunks=m
            )
            return pairs.orderBy(F.col("sim").desc(), "id_a", "id_b").limit(100)

        ab(
            spark,
            "q6_sim_search_topk",
            old_q6,
            lambda: specs["sim_search_topk"].fn(spark, SF_DIR),
            args.reps,
        )

    if {"hubness", "l2", "labelsep"} & set(args.pairs):
        old_llm = load_old_llm()

    if "hubness" in args.pairs:
        ab(
            spark,
            "sim_knn_hubness",
            lambda: old_llm["sim_knn_hubness"](spark, SF_DIR),
            lambda: specs["sim_knn_hubness"].fn(spark, SF_DIR),
            args.reps,
        )

    if "l2" in args.pairs:
        ab(
            spark,
            "sim_pairwise_l2",
            lambda: old_llm["sim_pairwise_l2"](spark, SF_DIR),
            lambda: specs["sim_pairwise_l2"].fn(spark, SF_DIR),
            args.reps,
        )

    if "labelsep" in args.pairs:
        ab(
            spark,
            "sim_label_separation",
            lambda: old_llm["sim_label_separation"](spark, SF_DIR),
            lambda: specs["sim_label_separation"].fn(spark, SF_DIR),
            args.reps,
        )

    return 0


def load_old_llm():
    """queries/llm.py@BASE_REV can't shadow-load wholesale (relative
    imports + double registration), so the three round-11 rewrite
    targets are re-executed from their old source: extract each old
    function body via the registry pattern and exec with the live
    imports. Returns {key: fn}."""
    import re

    src = subprocess.run(
        ["git", "show", f"{BASE_REV}:dags_spark/queries/llm.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    from pyspark.sql import Window  # noqa: F401

    from dags_spark.io import table  # noqa: F401
    from dags_spark.operators import similarity as _sim

    ns = {
        "F": F,
        "Window": Window,
        "table": table,
        "blocked_pairs": _sim.blocked_pairs,
    }
    out = {}
    for key in ("sim_knn_hubness", "sim_pairwise_l2", "sim_label_separation"):
        m = re.search(
            rf"def {key}\(spark.*?\n(?=\n\n@register|\n\n@|\n\ndef |\Z)",
            src,
            re.S,
        )
        assert m, f"old source for {key} not found"
        exec(m.group(0), ns)  # noqa: S102
        out[key] = ns[key]
    return out


if __name__ == "__main__":
    sys.exit(main())

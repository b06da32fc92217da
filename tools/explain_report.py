"""Regenerate PLANS.md: the formatted physical plan of every bench
query at sf0.1, as reviewable evidence of the scale properties the
docstrings claim (pushdown reaching the scan, broadcasts where dims
are small, no stray exchanges). Run after any plan-affecting change:

    python tools/explain_report.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from dags_spark.registry import all_specs  # noqa: E402
from dags_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"

BENCH = {
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


def main() -> None:
    spark = get_spark("explain-report")
    # Mirror the bench profile so the dumped plans are the ones the
    # driver actually times (bench.py sets the same three knobs).
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    specs = all_specs()
    out = [
        "# PLANS — bench-query physical plans (generated)",
        "",
        "Regenerate with `python tools/explain_report.py`. Session",
        "mirrors the bench profile (8 shuffle partitions, 2 MB splits,",
        "AQE off — see bench.py for why). Read for: PushedFilters and",
        "ReadSchema on every scan, BroadcastHashJoin on dim sides,",
        "exchange counts matching the docstrings' shuffle budgets.",
        "",
    ]
    def fmt(key: str) -> str:
        df = specs[key].fn(spark, SF_DIR)
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    for bench_name, key in BENCH.items():
        out += [f"## {bench_name} ({key})", "", "```", fmt(key).rstrip(), "```", ""]

    tpch = sorted(k for k in specs if k.startswith("tpch_"))
    out += [
        "# TPC-H composite plans",
        "",
        "The full composite suite (SURVEY §2.14) at the same profile —",
        "evidence that every shape keeps its broadcast dims, pushed",
        "filters, and decorrelated semi/anti joins.",
        "",
    ]
    for key in tpch:
        out += [f"## {key}", "", "```", fmt(key).rstrip(), "```", ""]

    iterative = [
        "iter_reachability_bfs",
        "iter_pagerank",
        "sql_recursive_cte",
        "embedding_pca_power",
    ]
    out += [
        "# Iterative / linear-algebra plans",
        "",
        "The unrolled-iteration family: every round is join+agg on the",
        "node key (ReusedExchange where rounds share partitioning);",
        "scalar renorm/teleport terms are 1-row broadcasts, never",
        "corpus-scale exchanges; the recursive CTE shows Spark 4's",
        "native UnionLoop execution.",
        "",
    ]
    for key in iterative:
        out += [f"## {key}", "", "```", fmt(key).rstrip(), "```", ""]
    n = len(BENCH) + len(tpch) + len(iterative)
    (REPO / "PLANS.md").write_text("\n".join(out))
    print(f"wrote {REPO / 'PLANS.md'} ({n} plans)")


if __name__ == "__main__":
    main()

"""Scale smoke: run the heaviest keys at sf0.1 (10x the correctness
SF) and fail on wall-time ceilings.

Correctness runs at sf0.01 where a quadratic candidate generator or a
skew-collapsed partition still finishes instantly; this harness is the
regression net for the SCALE properties the docstrings claim. Ceilings
are deliberately loose (~5-10x the measured healthy time on idle
local[32]) — they only trip on complexity-class regressions (all-pairs
fallback, lost pushdown, single-partition funnel), not noise.

Usage:  python tools/scale_smoke.py [--sf DIR]
Exit 0 = all within ceiling.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from dags_spark.registry import all_specs  # noqa: E402
from dags_spark.session import get_spark  # noqa: E402

# key -> ceiling seconds at sf0.1 on local[32] (healthy ~1/5 of this).
HEAVY = {
    "dedup_ngram_jaccard": 60,
    "dedup_winnow_substring": 60,
    "dedup_connected_components": 120,
    "dedup_minhash_banded": 45,
    "dedup_fuzzy_minhash": 60,
    "dedup_simhash_pairs": 45,
    "dedup_embedding_components": 90,
    "sim_knn_per_query": 45,
    "sim_ann_lsh_topk": 60,
    "join_band_binned": 30,
    "pack_sequences_greedy": 30,
    "join_interval_overlap": 45,
    "text_tfidf": 45,
    "graph_incremental_upsert": 60,
    # round-3 additions (healthy 0.5-6.5 s at sf0.1)
    "text_perplexity_proxy": 45,
    "sim_centroid_outliers": 20,
    "join_asof_nearest": 20,
    "dedup_url_canonical": 15,
    "tpch_q5_local_supplier": 15,
    "tpch_q18_large_orders": 15,
    # prefix-blocked candidates: 256 pairs / max cluster 4 at sf0.1
    "dedup_levenshtein_verify": 15,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("dags_spark-scale-smoke")
    specs = all_specs()
    failed = []
    for key, ceiling in HEAVY.items():
        t0 = time.time()
        try:
            df = specs[key].fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            ok = dt <= ceiling
        except Exception as ex:  # noqa: BLE001
            dt = time.time() - t0
            ok = False
            print(f"ERROR {key}: {str(ex)[:120]}", flush=True)
        status = "OK  " if ok else "SLOW"
        print(f"{status} {key}: {dt:.1f}s (ceiling {ceiling}s)", flush=True)
        if not ok:
            failed.append(key)
    print(f"\n{len(HEAVY) - len(failed)} ok, {len(failed)} over ceiling")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

"""Scale smoke: run the heaviest keys at sf0.1 (10x the correctness
SF) and fail on wall-time ceilings.

Correctness runs at sf0.01 where a quadratic candidate generator or a
skew-collapsed partition still finishes instantly; this harness is the
regression net for the SCALE properties the docstrings claim. Ceilings
are deliberately loose (~5-10x the measured healthy time on idle
local[32]) — they only trip on complexity-class regressions (all-pairs
fallback, lost pushdown, single-partition funnel), not noise.

Usage:  python tools/scale_smoke.py [--sf DIR] [--stress]

--stress additionally builds (once, cached under /tmp) a deterministic
~20x perturbation of documents/embeddings/events on top of sf0.1 and
runs the blocked/bucketed heavy family against it: every document gets
20 near-duplicate replicas (so prefix/minhash/ngram cluster sizes grow
20x — a direct attack on the hot-bucket and stop-gram ceilings),
embeddings get 20 jittered copies (40k vectors through LSH/IVF), and
events replicate 20x onto the SAME user ids (2M rows, 20x hotter
session keys). Ceilings at this tier prove the df/hot-bucket guards
are structural, not fixture-tuned. Exit 0 = all within ceiling.
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
    # round-6 attribution/finance family (healthy 1.5-3 s at sf0.1)
    "attribution_position_based": 20,
    "attribution_time_decay": 20,
    "agg_price_volume_mix": 20,
    "stats_levene_bf": 25,
    "stats_cramers_v": 15,
    "graph_link_prediction": 45,
    "feat_kmeans_lloyd": 25,
    "ts_dtw_distance": 20,
    "multimodal_png_decode": 25,
    "train_curriculum_buckets": 15,
    "win_elo_rating": 20,
    "sim_label_separation": 30,
    "text_edit_distance_bands": 30,
    # prefix-blocked candidates: 256 pairs / max cluster 4 at sf0.1
    "dedup_levenshtein_verify": 15,
    # round-4 additions (healthy 0.7-11 s at sf0.1)
    "ts_gapfill_locf": 45,
    "stream_stream_join": 60,
    "merge_scd2": 15,
    "multimodal_image_meta": 20,
    "dedup_normalized_exact": 20,
    # round-4 session-2 additions (healthy 1-8 s at sf0.1)
    "sim_matryoshka_overlap": 45,
    "sim_ann_pq_topk": 60,
    "sim_ann_ivfpq_topk": 60,
    "iter_reachability_bfs": 30,
    "dedup_ngram_containment": 60,
    "ts_resample_interp": 45,
    "dq_mad_outliers": 30,
    "multimodal_resize_bmp": 30,
    "multimodal_video_y4m": 30,
    "tpch_q21_waiting_supplier": 30,
    # round-4 session-3 additions (healthy 2-3 s at sf0.1)
    "iter_pagerank": 30,
    "text_collocations_pmi": 30,
    "sql_recursive_cte": 30,
    "embedding_pca_power": 45,
    # round-4 session-3, second wave (healthy 1-10 s at sf0.1)
    "stats_bootstrap_ci": 45,
    "win_ewma_bounded": 30,
    "dq_corpus_drift_jsd": 45,
    "dedup_eval_banding_pr": 90,
    "text_bpe_apply": 45,
    "join_scd2_pointintime": 30,
    "ts_anomaly_exact": 30,
    "dq_completeness_profile": 30,
    "pipeline_trainprep_end2end": 60,
    # round-5 additions (healthy 0.4-6 s at sf0.1, measured)
    "win_session_paths": 45,
    "multimodal_video_scene_cut": 20,
    "multimodal_wav_features": 15,
    "multimodal_phash_dedup": 15,
    "dedup_cross_source_matrix": 15,
    "dedup_exact_sharded": 15,
    "ts_cusum_changepoint": 15,
    "ts_autocorrelation": 15,
    "win_rfm_segmentation": 15,
    # round-5 session-3 additions (healthy 1-8 s at sf0.1, measured)
    "iter_kcore_peel": 45,
    "stream_dedup_within_watermark": 30,
    # round-5 session-2 additions (healthy 0.3-6 s at sf0.1, measured)
    "text_dedup_paragraphs": 45,
    "join_geo_bucket": 20,
    "join_geo_neighbor_probe": 20,
    "multimodal_bmp_histogram": 20,
    "iter_sssp_bellman_ford": 20,
    "agg_count_min_sketch": 15,
    "agg_bounce_rate_daily": 15,
    "win_drawdown_max": 15,
    # round-6 additions (healthy 0.7-4.6 s at sf0.1, measured on a
    # vmstat-quiet host; multiLine CSV is single-task BY DESIGN —
    # the ceiling guards the documented cost, not a regression-free
    # fantasy)
    "iter_triangle_count": 30,
    "source_csv_multiline_quoted": 30,
    "iter_label_propagation": 30,
    "graph_schema_evolution": 15,
    "fn_geohash_decode": 15,
    "table_format_snapshot_diff": 15,
    "table_format_merge": 15,
    "text_keyword_rake": 15,
    "join_geo_point_in_polygon": 15,
    # round-6 second wave (healthy 1-2.4 s at sf0.1, measured)
    "table_format_delete": 15,
    "text_contamination_check": 15,
    "tpch_q4_order_priority": 15,
    # round-6 wave 5 (1.1-2.0 s warm at sf0.1, measured)
    "rank_ndcg_at_k": 15,
    # round-6 wave 7 (0.8-1.8 s at sf0.1; the Holt fold is
    # calendar-bounded so its cost is flat across SF)
    "ts_holt_linear": 15,
    "fn_business_days": 15,
    # round-6 wave 8 (~3 s cold at sf0.1, Arrow kernel)
    "multimodal_mulaw_decode": 15,
    # round-6 wave 9 (1.6-3.4 s at sf0.1; kendall's per-segment pair
    # join is quadratic-within-block — grows ~100x per SF decade)
    "fn_hilbert_key": 15,
    "stats_kendall_tau": 60,
    # round-6 wave 10 (1.4 s warm at sf0.1; queries x corpus scan)
    "sim_mmr_diversify": 45,
    # basket-blocked pair join, sum(basket^2) work (4.5 s at sf0.1)
    "agg_market_basket_lift": 45,
    # round-6 wave 11 (2-2.4 s at sf0.1)
    "agg_geo_harmonic_mean": 15,
    "win_interval_coalesce": 20,
    "text_compression_ratio": 20,
    # round-6 wave 12 (writes + vocab-sized iterations; 1-9 s)
    "table_format_schema_evolution": 30,
    "scan_file_skipping_stats": 30,
    "text_bpe_train": 30,
    # round-6 wave 13 (0.2-2.6 s at sf0.1; CDC key runs a multi-batch
    # stream + tablelog commits inside fn())
    "win_rolling_regression": 20,
    "stream_cdc_to_table": 30,
    # round-6 wave 14 (1.3-3.3 s at sf0.1; 8 unrolled max-plus joins)
    "multimodal_gif_frames": 20,
    "iter_critical_path": 30,
    # round-6 wave 15 (1.2-1.8 s at sf0.1; label-blocked fold pairs)
    "sim_knn_hubness": 45,
    "dq_calendar_gaps": 20,
    # round-6 wave 16 (0.7-3.4 s at sf0.1; gz write inside fn())
    "win_skyline_pareto": 20,
    "sink_csv_gzip_roundtrip": 20,
    # round-6 wave 17 (2-4.3 s at sf0.1)
    "text_kneser_ney_bigram": 30,
    "iter_hits_scores": 20,
    # round-6 wave 18 (2.6 s at sf0.1)
    "agg_revenue_new_vs_returning": 20,
    # round-6 wave 19 (cold 5.6 / 2.7 / 6.6 s at sf0.1)
    "stats_mann_whitney_u": 25,
    "stats_ks_2sample": 15,
    "text_ngram_novelty": 35,
    # round-6 wave 20 (1.5-2.3 s warm at sf0.1)
    "table_format_vacuum": 20,
    "multimodal_tga_decode": 15,
    "train_contrastive_pairs": 15,
    # round-6 wave 21 (1.4-2.5 s warm at sf0.1)
    "stats_tost_equivalence": 15,
    "stats_mann_kendall_trend": 15,
    "rank_recall_hitrate": 15,
    # round-6 wave 22 (2.1 s warm at sf0.1)
    "agg_cumulative_reach": 15,
    # round-6 wave 23 (1.3-2.4 s warm at sf0.1)
    "stats_cuped_adjustment": 15,
    "win_peak_concurrency": 20,
    # round-6 wave 24 (1.2-3.2 s warm at sf0.1)
    "multimodal_qoi_decode": 20,
    "stats_sen_slope": 15,
    # round-6 wave 25 (3.0 s warm at sf0.1)
    "merge_golden_record": 20,
    # round-6 wave 26 (1.5-1.8 s warm at sf0.1; ORC write in fn())
    "source_orc_pushdown": 15,
    "agg_interpurchase_time": 15,
    # round-6 wave 28 (1.1-2.6 s warm at sf0.1)
    "sample_importance_weights": 15,
    "pack_shards_balanced": 15,
    # round-6 wave 29 (2.2-3.3 s warm at sf0.1)
    "multimodal_tiff_endian": 20,
    "agg_retention_half_life": 15,
    # round-6 wave 30 (1.4-2.6 s warm at sf0.1)
    "text_homoglyph_scrub": 15,
    "agg_abc_xyz_classification": 15,
    # round-6 wave 31 (6.9 s warm at sf0.1 — 6 md5s per fact row)
    "join_bloom_prefilter_checked": 35,
    # round-6 wave 32 (2.4 s warm at sf0.1)
    "stats_wilson_interval": 15,
    # round-6 wave 33-34 (1.5-3.0 s warm at sf0.1)
    "fn_web_mercator_tile": 15,
    "agg_same_store_sales": 15,
    "stats_aa_test_srm": 15,
    # round-6 wave 35 (1.9-2.7 s warm at sf0.1)
    "ts_naive_forecast_error": 15,
    "agg_price_index_laspeyres": 15,
}


# Stress tier (~20x documents/embeddings/events): ceilings are looser
# in proportion to the data, but still trip on a complexity-class
# regression (e.g. an unguarded hot bucket goes quadratic: 20x cluster
# size = 400x pair count, far beyond any ceiling below).
STRESS_REPLICAS = 20
STRESS = {
    "dedup_minhash_banded": 240,
    "dedup_fuzzy_minhash": 300,
    "dedup_simhash_pairs": 240,
    "dedup_ngram_jaccard": 300,
    "dedup_prefix_cluster": 120,
    "dedup_connected_components": 420,
    "sim_ann_lsh_topk": 300,
    "sim_ann_ivf_topk": 300,
    "text_tfidf": 120,
    "pack_sequences_greedy": 120,
    "stream_tumbling": 90,
    "stream_session": 120,
    "stream_dedup_keys": 120,
    "stream_topk_per_window": 120,
    "stream_stream_join": 240,
    "ts_gapfill_locf": 120,
    "dedup_normalized_exact": 120,
    # round-4 session-2: PQ/matryoshka ride 20x embeddings (40k
    # vectors through per-block kernels), containment rides the 20x
    # near-dup documents (direct attack on the stop-gram ceiling).
    "sim_ann_pq_topk": 300,
    "sim_ann_ivfpq_topk": 300,
    "sim_matryoshka_overlap": 300,
    "dedup_ngram_containment": 300,
    # round-4 session-3: PMI rides the 20x documents (bigram agg is
    # corpus-sized; an unbroadcast unigram join would blow this).
    "text_collocations_pmi": 240,
    # round-5: session paths ride 2M events on 20x-hot user keys (an
    # unguarded per-user path explosion would go quadratic); sharded
    # dedup + cross-source matrix ride 20x near-dup documents; PCA
    # rides 20x embeddings (the d^2 self-join must stay linear in
    # |V|, and the DECIMAL matvec lane absorbs the n^2 growth).
    "win_session_paths": 180,
    "dedup_exact_sharded": 120,
    "dedup_cross_source_matrix": 180,
    "embedding_pca_power": 240,
    # round-5 session-2: paragraph scrub + boilerplate ride the 20x
    # near-dup documents (fragment df counts grow 20x — the broadcast
    # list must stay small); bounce rate and drawdown ride 2M events
    # on 20x-hot user keys (one window partition each).
    "text_dedup_paragraphs": 240,
    "text_boilerplate_lines": 120,
    "agg_bounce_rate_daily": 120,
    "win_drawdown_max": 120,
}


def build_stress_dir(base_sf: str) -> str:
    """Materialize the deterministic ~20x perturbed tier under /tmp
    (cached across runs; rebuilt only if the marker file is absent).
    Unperturbed tables are symlinked so every registry key can run
    against the directory unchanged."""
    import os

    out = "/tmp/dags_spark_stress_v2"  # v2: n_chars suffix-length fix
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)

    spark = get_spark("dags_spark-stress-build")
    from pyspark.sql import functions as F

    from dags_spark.io import table as t

    reps = F.explode(F.sequence(F.lit(0), F.lit(STRESS_REPLICAS - 1))).alias("r")

    docs = t(spark, base_sf, "documents").select("*", reps)
    # replica 0 keeps the original text; others append a small suffix
    # -> every cluster key (prefix, shingles, simhash bands) sees ~20x
    # membership, exactly the hot-bucket regime the guards must bound.
    docs = docs.select(
        (F.col("doc_id") * STRESS_REPLICAS + F.col("r")).alias("doc_id"),
        F.when(F.col("r") == 0, F.col("text"))
        .otherwise(F.concat("text", F.lit(" rep"), F.col("r")))
        .alias("text"),
        "lang",
        "source",
        (
            F.col("n_chars")
            + F.when(F.col("r") == 0, 0).otherwise(
                # ' rep' + digits(r): keeps n_chars == length(text)
                4 + F.length(F.col("r").cast("string"))
            )
        ).alias("n_chars"),
    )
    docs.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    emb = t(spark, base_sf, "embeddings").select("*", reps)
    # jitter one dimension per replica (deterministic, tiny) so the
    # copies are near-identical -> dense LSH/IVF buckets.
    emb = emb.select(
        (F.col("vec_id") * STRESS_REPLICAS + F.col("r")).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (
                x + F.when(i == F.col("r") % 64, F.col("r") / F.lit(1000.0)).otherwise(0.0)
            ).cast("float"),
        ).alias("embedding"),
        "label",
    )
    emb.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))

    ev = t(spark, base_sf, "events").select("*", reps)
    # same user ids on purpose: 20x hotter session/window keys.
    ev = ev.select(
        (F.col("event_id") * STRESS_REPLICAS + F.col("r")).alias("event_id"),
        (F.col("ts") + F.make_interval(secs=F.col("r"))).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    ev.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))

    for name in (
        "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    ):
        link = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(base_sf, f"{name}.parquet"), link)

    with open(marker, "w") as fh:
        fh.write("ok\n")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--stress", action="store_true")
    args = ap.parse_args()

    spark = get_spark("dags_spark-scale-smoke")
    specs = all_specs()
    plan = dict(HEAVY)
    sf_for = {k: args.sf for k in plan}
    if args.stress:
        stress_dir = build_stress_dir(args.sf)
        for k, ceil in STRESS.items():
            plan[f"stress:{k}"] = ceil
            sf_for[f"stress:{k}"] = stress_dir
    failed = []
    for key, ceiling in plan.items():
        spec_name = key.removeprefix("stress:")
        t0 = time.time()
        try:
            df = specs[spec_name].fn(spark, sf_for[key])
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
    print(f"\n{len(plan) - len(failed)} ok, {len(failed)} over ceiling")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

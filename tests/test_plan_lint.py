"""Whole-surface plan-lint sweep: every registered batch query's
physical plan must be free of scale anti-patterns (cartesian joins,
single-partition exchanges, row-wise Python UDFs) except where the
key's semantics REQUIRE the construct — those are allowlisted here,
each with the reason. A refactor that silently degrades any plan
fails this test, not the cluster."""

from __future__ import annotations

import pytest

from dags_spark.plans import lint_plan
from dags_spark.registry import all_specs

# key -> allowed finding codes, with the reason the construct is fine.
ALLOWED = {
    # -- cartesian: GRID-sized crosses the linter cannot prove --
    # The linter proves bounded build sides structurally via
    # _bounded_rows (round 8, generalizing the r7 scalar-subquery
    # rule): literal Range spines, LocalTableScans, literal limits
    # (TakeOrdered/GlobalLimit), 1-row global aggregates, and their
    # products/unions through row-preserving nodes — so k-offset
    # spines, bootstrap picks, and replica dims no longer need
    # waivers. What remains below crosses a relation bounded by
    # CONSTRUCTION but genuinely not by plan structure — collapsed
    # calendar grids (<=366 rows/yr: cardinality follows the DATA's
    # date span), per-type series pairs, decile/contingency grids —
    # or is a genuine cross (join_cross's semantics,
    # point-in-polygon candidate pairs, MMR's pairwise diversity,
    # DTW's series-pair grid). The fact side never re-shuffles.
    "agg_histogram_percentile": {"cartesian", "single-partition-exchange"},
    "attribution_shapley": {"cartesian"},
    "dq_rules_as_data": {"cartesian"},
    "fn_levenshtein_threshold": {"cartesian"},
    "join_cross": {"cartesian"},
    "join_geo_point_in_polygon": {"cartesian"},
    "join_lerp_curve": {"cartesian", "single-partition-exchange"},
    "sample_block_bootstrap": {"cartesian", "single-partition-exchange"},
    "sim_mmr_diversify": {"cartesian"},
    "stats_mann_kendall_trend": {"cartesian"},
    "stats_sen_slope": {"cartesian"},
    "text_heaps_law": {"cartesian"},
    "ts_croston_intermittent": {"cartesian"},
    "ts_dtw_distance": {"cartesian"},
    "ts_hurst_rs": {"cartesian"},
    "ts_periodogram_dominant": {"single-partition-exchange"},
    # 
    # -- single-partition-exchange: bounded-grain funnels --
    # Exchanges whose input is bounded by CONSTRUCTION but not
    # provably 1-row from the plan (those are now structurally
    # cleared): global windows/folds over collapsed calendar grids
    # (<=366 rows/yr), decile/quantile grids (<=100 rows), per-bucket
    # offset tables from the two-pass global_rank/global_cumsum
    # rewrite (rows = shuffle-partition count), sequential model
    # folds (Holt/Weibull/KM — model-sized input reduced in one
    # task), and contract-bearing small sorted outputs.
    "agg_abc_classification": {"single-partition-exchange"},
    "agg_equidepth_bins": {"single-partition-exchange"},
    "agg_gini_revenue": {"single-partition-exchange"},
    "agg_hhi_by_year": {"single-partition-exchange"},
    "agg_lorenz_deciles": {"single-partition-exchange"},
    "agg_pareto_customers": {"single-partition-exchange"},
    "agg_var_expected_shortfall": {"single-partition-exchange"},
    "dq_distribution_psi": {"single-partition-exchange"},
    "dq_id_density_audit": {"single-partition-exchange"},
    "dq_join_key_skew": {"single-partition-exchange"},
    "dq_row_count_anomaly": {"single-partition-exchange"},
    "feat_woe_iv": {"single-partition-exchange"},
    "funnel_time_to_convert": {"single-partition-exchange"},
    "pack_sequences_greedy": {"single-partition-exchange"},
    "pack_shards_balanced": {"single-partition-exchange"},
    "rank_lift_chart_deciles": {"single-partition-exchange"},
    "sim_rank_fusion_rrf": {"single-partition-exchange"},
    "sort_multi": {"single-partition-exchange"},
    "sort_nulls_last": {"single-partition-exchange"},
    "stats_auc_exact": {"single-partition-exchange"},
    "stats_bh_fdr": {"single-partition-exchange"},
    "stats_cohens_kappa": {"single-partition-exchange"},
    "stats_durbin_watson": {"single-partition-exchange"},
    "stats_ks_2sample": {"single-partition-exchange"},
    "stats_mann_whitney_u": {"single-partition-exchange"},
    "stats_runs_test": {"single-partition-exchange"},
    "stats_survival_km": {"single-partition-exchange"},
    "stats_weibull_fit": {"single-partition-exchange"},
    "train_curriculum_buckets": {"single-partition-exchange"},
    "ts_autocorrelation": {"single-partition-exchange"},
    "ts_holt_linear": {"single-partition-exchange"},
    "ts_holt_winters_seasonal": {"single-partition-exchange"},
    "ts_naive_forecast_error": {"single-partition-exchange"},
    "ts_seasonal_decompose": {"single-partition-exchange"},
    "ts_seasonal_strength": {"single-partition-exchange"},
    "ts_walkforward_ols": {"single-partition-exchange"},
    "ts_week_over_week": {"single-partition-exchange"},
    "win_bollinger_breakout": {"single-partition-exchange"},
    "win_peak_concurrency": {"single-partition-exchange"},
    "win_percent_of_total": {"single-partition-exchange"},
    "win_range_interval_frame": {"single-partition-exchange"},
    "win_record_highs": {"single-partition-exchange"},
    "win_rfm_segmentation": {"single-partition-exchange"},
    "win_rolling_beta": {"single-partition-exchange"},
    "win_spc_western_electric": {"single-partition-exchange"},
    "win_topn_ties_dense": {"single-partition-exchange"},
    # 
    # -- global-sort: ORDER BY is the key's output contract --
    # Sorted final output is the declared semantics (TPC-H answer
    # ordering, ranked fusion/sampling lists); the sort runs on the
    # post-aggregate grain, orders of magnitude below the fact scan.
    "agg_hll_sketch_union": {"global-sort"},
    "agg_regr_linear": {"global-sort"},
    "sample_temperature_mix": {"global-sort"},
    "sim_matryoshka_overlap": {"global-sort"},
    "tpch_q13_order_counts": {"global-sort"},
    "tpch_q22_sales_opportunity": {"global-sort"},
    "tpch_q5_local_supplier": {"global-sort"},
    "tpch_q7_volume_shipping": {"global-sort"},
    "tpch_q8_market_share": {"global-sort"},
    # 
    # -- unpruned-partition-scan: whole-layout maintenance reads --
    # These keys' PURPOSE is reading every partition (file-metadata
    # inventory, dynamic-overwrite verification read-back, the custom
    # stream source's full-directory snapshot).
    "scan_file_metadata": {"unpruned-partition-scan"},
    "sink_partition_overwrite_dynamic": {"unpruned-partition-scan"},
    "source_python_datasource_stream": {"unpruned-partition-scan"},
    # 
    # -- rowwise-python-udf: API-coverage keys --
    # The four keys whose purpose IS the row-wise Python UDF/UDTF
    # API surface; everything else is linter-banned from it.
    "udf_python_scalar": {"rowwise-python-udf"},
    "udtf_analyze_polymorphic": {"rowwise-python-udf"},
    "udtf_partition_by": {"rowwise-python-udf"},
    "udtf_python": {"rowwise-python-udf"},
}


def _batch_specs():
    return [
        (name, spec)
        for name, spec in all_specs().items()
        if spec.module != "streaming"
    ]


@pytest.mark.slow
def test_every_batch_plan_is_lint_clean(spark, sf_dir):
    """Also enforces: hash-checked keys emit only atomic columns —
    the external driver's canonicalizer cannot sort/hash array/map/
    struct/binary cells (the round-1 agg_collect_sorted failure);
    serialize with array_join/concat_ws instead."""
    from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

    violations = {}
    for name, spec in _batch_specs():
        df = spec.fn(spark, sf_dir)
        findings = lint_plan(df)
        bad = [
            (f.code, f.node)
            for f in findings
            if f.code not in ALLOWED.get(name, set())
        ]
        if spec.check == "hash":
            bad += [
                ("non-atomic-column", f.name)
                for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType, BinaryType))
            ]
        if bad:
            violations[name] = bad
    assert not violations, f"plan lint violations: {violations}"


def test_lint_catches_cartesian_and_single_partition(spark, sf_dir):
    """Linter self-test on deliberately bad plans. The bad inputs
    must be DATA-SCALE-DEPENDENT (parquet scans): literal Range
    crosses are now structurally proven bounded and stay clean —
    pinned by the companion assertions."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dags_spark.io import table

    cust = table(spark, sf_dir, "customer").select("c_custkey")
    ords = table(spark, sf_dir, "orders").select("o_orderkey")
    codes = {f.code for f in lint_plan(cust.crossJoin(ords))}
    assert "cartesian" in codes

    w = Window.orderBy("c_custkey")
    ranked = cust.withColumn("rn", F.row_number().over(w))
    codes = {f.code for f in lint_plan(ranked)}
    assert "single-partition-exchange" in codes

    # bounded-by-literals shapes are proven, not waived:
    a = spark.range(10)
    b = spark.range(12).withColumnRenamed("id", "id2")
    assert lint_plan(cust.crossJoin(b)) == []            # literal spine
    assert lint_plan(a.crossJoin(b)) == []               # grid x grid
    ranked_spine = b.withColumn(
        "rn", F.row_number().over(Window.orderBy("id2"))
    )
    assert lint_plan(ranked_spine) == []                 # bounded funnel
    # an UNBOUNDED range (beyond the 65536 proof threshold) still trips
    big = spark.range(200_000).withColumnRenamed("id", "id3")
    assert "cartesian" in {f.code for f in lint_plan(cust.crossJoin(big))}


def test_lint_catches_dim_shuffle_join_and_unpruned_scan(spark, sf_dir, tmp_path):
    """Self-test for the round-5 codes: a nation scan feeding a
    SortMergeJoin trips dim-shuffle-join (and stays clean when
    broadcast); a partitioned read without a partition predicate
    trips unpruned-partition-scan (and stays clean when pruned)."""
    from pyspark.sql import functions as F

    from dags_spark.io import table

    cust = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        smj = cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        assert "dim-shuffle-join" in {f.code for f in lint_plan(smj)}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    bhj = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    assert "dim-shuffle-join" not in {f.code for f in lint_plan(bhj)}

    d = str(tmp_path / "t")
    spark.range(100).select("id", (F.col("id") % 5).alias("p")).write.partitionBy(
        "p"
    ).parquet(d)
    unpruned = spark.read.parquet(d).filter(F.col("id") > 50)
    assert "unpruned-partition-scan" in {f.code for f in lint_plan(unpruned)}
    pruned = spark.read.parquet(d).filter(F.col("p") == 3)
    assert "unpruned-partition-scan" not in {f.code for f in lint_plan(pruned)}


def test_global_rank_matches_single_window(spark):
    """Two-phase global_rank == naive global window, including
    desc order, nulls-last, and duplicate sort values."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dags_spark.operators.scale import global_rank

    rows = [(i, (i * 37) % 11 if i % 7 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, v long")
    order = [F.col("v").desc_nulls_last(), F.col("k").asc()]
    naive = {
        r.k: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    for nparts in (1, 5, 64):
        got = {
            r.k: r.rank
            for r in global_rank(df, order, n_partitions=nparts).collect()
        }
        assert got == naive, f"n_partitions={nparts}"


def test_lint_readschema_whole_name_match(spark, tmp_path):
    """Round-6 ADVICE regression: a partition column ('year') whose
    name+':' appears as a suffix of a data column ('o_year') in
    ReadSchema must still be detected as a partition column — the
    matcher parses whole struct field names, not substrings."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "suffix")
    (
        spark.range(100)
        .select(
            "id",
            (F.col("id") % 4 + 2020).alias("o_year"),
            (F.col("id") % 3 + 1994).alias("year"),
        )
        .write.partitionBy("year")
        .parquet(d)
    )
    unpruned = spark.read.parquet(d).filter(F.col("id") > 50)
    assert "unpruned-partition-scan" in {f.code for f in lint_plan(unpruned)}
    pruned = spark.read.parquet(d).filter(F.col("year") == 1994)
    assert "unpruned-partition-scan" not in {f.code for f in lint_plan(pruned)}

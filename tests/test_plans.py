"""Plan-quality regression tests: the physical plans the 100 TB
design point depends on — parquet filter pushdown, column pruning,
broadcast dimension joins, top-k via TakeOrderedAndProject, and no
cartesian fallback on anchored theta joins. A refactor that silently
loses one of these properties fails here long before it shows up as
a production-scale regression."""

from __future__ import annotations

from dags_spark.registry import all_specs


def _formatted_plan(spark, key, sf_dir) -> str:
    df = all_specs()[key].fn(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString
    return df._jdf.queryExecution().explainString(mode("formatted"))


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    plan = _formatted_plan(spark, "scan_parquet_pushdown", sf_dir)
    assert "GreaterThanOrEqual(l_shipdate" in plan, "shipdate range not pushed"
    assert "LessThan(l_shipdate" in plan


def test_column_pruning_q1(spark, sf_dir):
    plan = _formatted_plan(spark, "agg_pricing_summary", sf_dir)
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    # Q1 needs exactly 7 lineitem columns; pruning must drop the rest.
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_tax",
                "l_returnflag", "l_linestatus", "l_shipdate"):
        assert col in read
    for col in ("l_orderkey", "l_partkey", "l_comment", "l_shipmode"):
        assert col not in read, f"{col} not pruned from scan"


def test_partial_final_hash_aggregate(spark, sf_dir):
    plan = _formatted_plan(spark, "agg_pricing_summary", sf_dir)
    assert plan.count("HashAggregate") >= 2, "expected partial+final hash agg"


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = _formatted_plan(spark, "join_star_multiway", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # transitive filter inference: region filter reaches the nation scan
    assert "LessThan(n_regionkey,3)" in plan.replace(" ", "")


def test_star_join_broadcast_hint_is_conditional(spark, sf_dir, monkeypatch):
    """Past the broadcast ceiling the star join must DEGRADE to a
    shuffle join on o_custkey, not force an OOM-bound broadcast:
    forcing the row threshold to 0 has to remove the dim's
    BroadcastHashJoin from the plan (VERDICT r7 directive #2)."""
    def dim_join_op(plan: str) -> str:
        # formatted explain: operator header line, then "Left keys
        # [1]: [o_custkey#..]" in the same blank-line-separated block
        for block in plan.split("\n\n"):
            if "keys" in block and "o_custkey" in block and "c_custkey" in block:
                return block.splitlines()[0]
        raise AssertionError("dim join block missing from plan")

    # default threshold: the pruned dim rides a broadcast
    plan = _formatted_plan(spark, "join_star_multiway", sf_dir)
    assert "BroadcastHashJoin" in dim_join_op(plan)

    # forced-low threshold: same query must DEGRADE to a shuffle join
    monkeypatch.setenv("DAGS_SPARK_STAR_BCAST_MAX_ROWS", "0")
    plan = _formatted_plan(spark, "join_star_multiway", sf_dir)
    assert "CartesianProduct" not in plan
    op = dim_join_op(plan)
    assert "BroadcastHashJoin" not in op, (
        f"broadcast hint must not survive a forced-low threshold: {op}"
    )
    assert "SortMergeJoin" in op or "ShuffledHashJoin" in op


def test_theta_join_keeps_equi_anchor(spark, sf_dir):
    plan = _formatted_plan(spark, "join_theta_range", sf_dir)
    assert "CartesianProduct" not in plan, "theta join fell back to cartesian"


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _formatted_plan(spark, "topk_global", sf_dir)
    assert "TakeOrderedAndProject" in plan, "orderBy+limit not fused to top-k"


def test_tpch_q3_plan_shape(spark, sf_dir):
    plan = _formatted_plan(spark, "tpch_q3_shipping", sf_dir)
    assert "BroadcastHashJoin" in plan, "customer filter dim not broadcast"
    assert "TakeOrderedAndProject" in plan, "top-10 not fused"
    assert "CartesianProduct" not in plan
    # both date filters must reach the parquet scans
    flat = plan.replace(" ", "")
    assert "LessThan(o_orderdate" in flat
    assert "GreaterThan(l_shipdate" in flat


def test_scalar_subquery_broadcasts(spark, sf_dir):
    plan = _formatted_plan(spark, "subquery_scalar_agg", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, (
        "1-row global aggregate should broadcast, not shuffle"
    )
    assert "SortMergeJoin" not in plan


def test_graph_pipeline_fuses_nodes(spark, sf_dir):
    """Cross-node optimization: the filter declared in graph node 1
    must be pushed into the parquet scan of the single fused plan."""
    plan = _formatted_plan(spark, "graph_pipeline_revenue", sf_dir)
    assert "GreaterThanOrEqual(l_shipdate" in plan.replace(" ", "")


def test_unpivot_is_single_pass(spark, sf_dir):
    plan = _formatted_plan(spark, "unpivot_long", sf_dir)
    assert "Expand" in plan, "unpivot should expand rows, not union scans"
    assert plan.count("Location: InMemoryFileIndex") == 1, "unpivot re-scanned the table"


def test_minhash_band_join_no_cartesian(spark, sf_dir):
    plan = _formatted_plan(spark, "dedup_minhash_banded", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, "band join must be equi-join"


def test_exact_dedup_shuffles_fingerprint_not_text(spark, sf_dir):
    """The dedup exchange must carry (md5, id) only — at 100 TB the
    text column never crosses the wire."""
    plan = _formatted_plan(spark, "dedup_exact", sf_dir)
    lines = plan.splitlines()
    # the Exchange detail block: its Input [...] line lists shuffled cols
    starts = [i for i, l in enumerate(lines) if l.startswith("(") and "Exchange" in l]
    assert starts, "no Exchange block found"
    inputs = [
        l
        for i in starts
        for l in lines[i : i + 4]
        if l.strip().startswith("Input")
    ]
    assert inputs and all("text#" not in l for l in inputs), (
        "raw text column reached the shuffle"
    )
    assert any("content_md5" in l for l in inputs)


def test_hash_sample_is_scan_level(spark, sf_dir):
    """Deterministic sampling must evaluate in the scan stage: no
    Exchange anywhere in the plan."""
    plan = _formatted_plan(spark, "sample_hash_mod", sf_dir)
    assert "Exchange" not in plan, "hash sample introduced a shuffle"


def test_winnow_pairs_plan_prunes_hot_fps_broadcast(spark, sf_dir):
    """The winnowing df ceiling must be a broadcast LEFT ANTI join (the
    hot-fingerprint list is tiny by construction) and the pair join an
    equi-join — no cartesian fallback anywhere."""
    plan = _formatted_plan(spark, "dedup_winnow_substring", sf_dir)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_ngram_jaccard_plan_prunes_hot_grams_broadcast(spark, sf_dir):
    plan = _formatted_plan(spark, "dedup_ngram_jaccard", sf_dir)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_text_pipeline_single_wide_exchange(spark, sf_dir):
    """The fused cleaning pipeline should shuffle exactly twice (dedup
    + final agg) — no self-join of the corpus with its scored
    projection. Round 10: the dedup is a min_by hash aggregate, so the
    plan must carry NO window and NO sort, and the text column must
    not survive into any Exchange (only the md5/struct proxy does)."""
    import re

    plan = _formatted_plan(spark, "text_pipeline_clean", sf_dir)
    assert "Join" not in plan, "corpus self-join crept back into the pipeline"
    assert "Window" not in plan, "window dedup crept back (sorts + full-text shuffle)"
    assert not re.search(r"\bSort \(\d+\)", plan), "sort crept into the pipeline"
    # both exchanges ship proxies, never the raw text column
    for m in re.finditer(r"\(\d+\) Exchange\b[^(]*Input \[\d+\]: \[([^\]]*)\]", plan):
        assert "text#" not in m.group(1), f"text crossed an exchange: {m.group(1)}"


def test_vocab_topk_aggregates_before_window(spark, sf_dir):
    """Top-k over the vocab must hash-aggregate (map-side combinable)
    before the single-partition ranking window."""
    plan = _formatted_plan(spark, "text_vocab_topk", sf_dir)
    assert plan.count("HashAggregate") >= 2


def test_split_and_mix_are_scan_level(spark, sf_dir):
    """Split assignment and source mixing are pure per-row functions of
    the key: no Exchange may appear anywhere in either plan."""
    for key in ("split_assign_hash", "mix_sources_weighted"):
        plan = _formatted_plan(spark, key, sf_dir)
        assert "Exchange" not in plan, f"{key} introduced a shuffle"


def test_decontaminate_broadcasts_benchmark_grams(spark, sf_dir):
    """The benchmark gram set must broadcast (eval sets are tiny); the
    corpus side must never cartesian."""
    plan = _formatted_plan(spark, "decontaminate_ngram", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_pack_sequences_broadcasts_bucket_offsets(spark, sf_dir):
    """The two-phase cumsum's offset table joins back via broadcast;
    the only unpartitioned window runs over the tiny per-bucket
    aggregate, not the raw rows (exactly one 'Window' over the
    one-row-per-bucket side)."""
    plan = _formatted_plan(spark, "pack_sequences_greedy", sf_dir)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_band_join_is_equi_not_nested_loop(spark, sf_dir):
    """The binned band join must plan as a hash equi-join on the bin
    id — the naive BroadcastNestedLoopJoin is the scale failure the
    operator exists to avoid."""
    plan = _formatted_plan(spark, "join_band_binned", sf_dir)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan


def test_hypertable_rollup_single_raw_shuffle(spark, sf_dir):
    """The day level re-aggregates hourly partials: after AQE the
    hourly exchange is REUSED, so the raw table is scanned and
    shuffled exactly once."""
    df = all_specs()["agg_hypertable_rollup"].fn(spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "ReusedExchange" in final, "day level re-scanned the raw table"


def test_prefix_cluster_and_token_budget_single_exchange(spark, sf_dir):
    """Prefix clustering is one hash-agg on md5(prefix); token-budget
    sampling is one per-source window — each exactly one shuffle."""
    for key in ("dedup_prefix_cluster", "sample_token_budget"):
        plan = _formatted_plan(spark, key, sf_dir)
        assert plan.count("Exchange") <= 2, f"{key} shuffled more than planned"
        assert "Join" not in plan, f"{key} grew an unexpected join"


def test_tpch_q5_broadcast_dim_chain(spark, sf_dir):
    """Q5's region->nation->supplier chain and the supplier join must
    all broadcast; the only shuffled join is lineitem-orders."""
    plan = _formatted_plan(spark, "tpch_q5_local_supplier", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_q18_threshold_list_broadcasts(spark, sf_dir):
    """Q18's HAVING survivors (rare) must broadcast back onto
    lineitem, never shuffle the fact side for the semi filter."""
    plan = _formatted_plan(spark, "tpch_q18_large_orders", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_centroid_outliers_broadcasts_centroids(spark, sf_dir):
    """Label centroids (label-count rows) broadcast back for the
    scan-local distance fold; no vector-carrying shuffle besides the
    posexplode aggregation."""
    plan = _formatted_plan(spark, "sim_centroid_outliers", sf_dir)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_perplexity_tf_broadcasts(spark, sf_dir):
    """The unigram tf table (vocab-sized) must broadcast onto the
    exploded token stream."""
    plan = _formatted_plan(spark, "text_perplexity_proxy", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_k_anonymity_cohorts_broadcast(spark, sf_dir):
    """The cohort table (quasi-identifier-domain sized) must broadcast
    back onto the customer scan."""
    plan = _formatted_plan(spark, "dq_k_anonymity", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_partitioned_sink_readback_prunes_partitions(spark, sf_dir, tmp_path):
    """A year-filtered read over the hive-partitioned sink layout must
    prune at the directory level: PartitionFilters carries the
    predicate and the data filter list stays empty."""
    import os

    from pyspark.sql import functions as F

    from dags_spark.io import table as t

    out = os.path.join(str(tmp_path), "orders_by_year")
    t(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    ).write.partitionBy("o_year").parquet(out)
    back = spark.read.parquet(out).filter(F.col("o_year") == 1997)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    start = plan.index("PartitionFilters: [")
    assert "1997" in plan[start : start + 200], "year predicate not in PartitionFilters"


def test_dynamic_partition_pruning_on_partitioned_sink(spark, sf_dir, tmp_path):
    """A join whose partition-key values only become known at runtime
    (filtered dim side) must trigger dynamic partition pruning on the
    hive-partitioned fact — the mechanism that keeps a 100 TB
    partitioned fact from full-scanning under dim-filtered joins."""
    import os

    from pyspark.sql import functions as F

    from dags_spark.io import table as t

    out = os.path.join(str(tmp_path), "orders_by_year_dpp")
    t(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    ).write.partitionBy("o_year").parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [(1997, "focus"), (1998, "other")], "y INT, tag STRING"
    ).filter(F.col("tag") == "focus")
    j = fact.join(dim, fact.o_year == dim.y).groupBy("o_year").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "DPP subquery absent from scan"


def test_aqe_skew_join_engages_on_synthetic_skew(spark):
    """The tune() profile keeps AQE on (bench.py alone disables it);
    pin that a genuinely skewed shuffle join actually ENGAGES the AQE
    skew-join splitter at runtime — the mechanism the 100 TB design
    leans on for organic key skew (salting covers the known-hot-key
    case; AQE covers the discovered-at-runtime case)."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        # force a sort-merge join and make the skew thresholds small
        # enough that local-mode data sizes trip them
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

        # one hot key holding ~97% of the left side
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") < 290_000, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 2_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        # global agg on top: a per-key aggregate would REQUIRE the
        # join's hash partitioning and legally veto the skew split
        # (splitting duplicates right-side rows across sub-partitions)
        joined = left.join(right, "k").agg(F.sum("v").alias("s"))
        # collect() drives THIS Dataset's QueryExecution to its final
        # adaptive plan (a write.save() would execute a fresh copy and
        # leave this one isFinalPlan=false)
        joined.collect()
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, f"AQE skew join did not engage:\n{final[:2000]}"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_tpch_q6_is_pure_scan_agg(spark, sf_dir):
    plan = _formatted_plan(spark, "tpch_q6_forecast", sf_dir)
    assert "Join" not in plan, "Q6 must be scan+agg only"
    # all three predicates reach the parquet scan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity" in plan
    # exactly one exchange: the 1-row final aggregate (count nodes in
    # the tree section only — the detail section repeats each header)
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1


def test_tpch_q19_single_scan_disjunction(spark, sf_dir):
    plan = _formatted_plan(spark, "tpch_q19_disjunctive", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # ONE lineitem + ONE part scan — no union-of-three-scans rewrite
    # (tree section only; the detail section repeats each header)
    assert plan.split("\n\n")[0].count("Scan parquet") == 2
    # the OR of quantity bands is pushed into the lineitem scan
    assert "Or(Or(And(GreaterThanOrEqual(l_quantity" in plan.replace(" ", "")


def test_tpch_q21_decorrelates_to_semi_anti(spark, sf_dir):
    plan = _formatted_plan(spark, "tpch_q21_waiting_supplier", sf_dir)
    assert "LeftSemi" in plan, "EXISTS must decorrelate to a semi join"
    assert "LeftAnti" in plan, "NOT EXISTS must decorrelate to an anti join"
    assert "CartesianProduct" not in plan


def test_tpch_q8_broadcasts_all_dims(spark, sf_dir):
    plan = _formatted_plan(spark, "tpch_q8_market_share", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 3, "part/supp/cust-nation dims must broadcast"
    assert "CartesianProduct" not in plan


def test_matryoshka_rankings_prune_mapside(spark, sf_dir):
    plan = _formatted_plan(spark, "sim_matryoshka_overlap", sf_dir)
    # both top-3 rankings must engage WindowGroupLimit before their
    # qid exchange (map-side top-k pruning, 2 limits per ranking:
    # partial + final)
    assert plan.count("WindowGroupLimit") >= 4
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_injects_on_shuffle_join(spark, sf_dir):
    """When a shuffle join's build side carries a selective filter,
    Catalyst's InjectRuntimeFilter must add a might_contain() bloom
    pre-filter on the probe-side SCAN — the automatic scan-reduction
    that makes selective fact⋈dim shuffle joins viable at 100 TB
    (rows failing the filter never enter the exchange). At fixture
    scale every dim broadcasts (so the rule is dormant in the bench
    plans); this test disables broadcast and lowers the size
    thresholds to pin that the rule still ENGAGES when the join does
    shuffle — a conf/refactor that silently kills it fails here."""
    from dags_spark.io import table
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = table(spark, sf_dir, "lineitem")
        o = table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected"
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_analyze_table_stats_feed_cbo(spark, sf_dir, tmp_path):
    """ANALYZE TABLE statistics must reach the optimizer: after
    COMPUTE STATISTICS, the optimized plan's cost model sees the
    exact row count (not a size-based guess) — the wiring CBO join
    reordering and broadcast decisions depend on at 100 TB (a silent
    stats regression reverts every join to size heuristics)."""
    from dags_spark.io import table

    # warehouse dir is a static conf — the session fixture already
    # points it at a temp dir (session.get_spark), so just write.
    table(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable(
        "nation_stats_probe"
    )
    try:
        spark.sql(
            "ANALYZE TABLE nation_stats_probe COMPUTE STATISTICS"
        )
        prev = spark.conf.get("spark.sql.cbo.enabled")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            df = spark.table("nation_stats_probe")
            stats = df._jdf.queryExecution().optimizedPlan().stats()
            assert stats.rowCount().isDefined(), "ANALYZE row count not visible to CBO"
            assert stats.rowCount().get() == df.count()
        finally:
            spark.conf.set("spark.sql.cbo.enabled", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_stats_probe")


def test_jdbc_read_is_partitioned_pruned_and_pushes_filters(spark, sf_dir):
    """The Derby JDBC read path (source_jdbc): the extract must be
    issued as numPartitions range-bounded queries, column pruning
    must reach the generated SQL (nation never ships n_name), and a
    predicate added above the whole join+agg must push down into the
    remote query on BOTH sides (transitively inferred onto nation
    via the join key) — the three properties that make a warehouse
    extract parallel and minimal at scale."""
    from pyspark.sql import functions as F

    df = all_specs()["source_jdbc"].fn(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString
    plan = df._jdf.queryExecution().explainString(mode("formatted"))
    assert "JDBCRelation(region) [numPartitions=2]" in plan
    assert "JDBCRelation(nation) [numPartitions=2]" in plan
    # pruning is visible in the exact SQL sent to the remote engine
    assert '"n_nationkey","n_regionkey" FROM nation' in plan
    assert "n_name" not in plan, "nation scan ships an unused column"

    plan2 = (
        df.filter(F.col("r_regionkey") < 3)
        ._jdf.queryExecution()
        .explainString(mode("formatted"))
    )
    assert "LessThan(r_regionkey,3)" in plan2, "filter not pushed to region"
    assert "LessThan(n_regionkey,3)" in plan2, (
        "filter not transitively pushed through the join to nation"
    )


def test_partitioned_sink_readback_prunes_directories(spark, sf_dir):
    """sink_parquet_partitioned: the hive-layout read-back carries a
    PartitionFilters entry on o_year, so pre-1995 directories are
    never opened — the property the unpruned-partition-scan lint
    code enforces across the registry."""
    plan = _formatted_plan(spark, "sink_parquet_partitioned", sf_dir)
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "o_year" in pf and "1995" in pf, pf


def test_dynamic_partition_pruning_in_plan(spark, sf_dir):
    """join_dynamic_partition_pruning: the fact scan must carry a
    dynamicpruning expression on the partition column (runtime
    directory pruning driven by the dim side) — plus the statically
    inferred bound that Catalyst derives through the join."""
    plan = _formatted_plan(spark, "join_dynamic_partition_pruning", sf_dir)
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "dynamicpruning" in pf, pf
    assert "o_year" in pf


def test_tpch_q4_plans_left_semi(spark, sf_dir):
    """Q4's correlated EXISTS must plan as a LEFT SEMI join (one
    match suffices), with the quarterly filter pushed to the orders
    scan — an inner join here would double-count multi-line orders."""
    plan = _formatted_plan(spark, "tpch_q4_order_priority", sf_dir)
    assert "LeftSemi" in plan or "left_semi" in plan.lower()
    flat = plan.replace(" ", "")
    assert "GreaterThanOrEqual(o_orderdate" in flat
    assert "CartesianProduct" not in plan


def test_eager_agg_joins_supplier_rows_not_fact_rows(spark, sf_dir):
    """agg_before_join_rewrite's dims must broadcast and the join
    input must be the PRE-AGGREGATED per-suppkey table — the plan
    shows a HashAggregate BELOW the broadcast joins and no
    SortMergeJoin anywhere."""
    plan = _formatted_plan(spark, "agg_before_join_rewrite", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # partial agg must appear before (deeper than) the first join
    first_join = plan.index("BroadcastHashJoin")
    assert "HashAggregate" in plan[first_join:], "final agg missing"
    assert "HashAggregate" in plan[:first_join] or plan.count("HashAggregate") >= 3, (
        "per-suppkey pre-aggregate not below the join"
    )


def test_contamination_shingle_join_no_cartesian(spark, sf_dir):
    """text_contamination_check must join benchmark and corpus
    shingles by equality (hash/broadcast join), never all-pairs."""
    plan = _formatted_plan(spark, "text_contamination_check", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_join_merge_hint_forces_sort_merge(spark, sf_dir):
    """The MERGE hint must survive analysis + AQE: the physical plan
    joins by SortMergeJoin and never falls back to broadcast or
    shuffled-hash (the point of the hint on TBxTB joins)."""
    from dags_spark.registry import all_specs

    df = all_specs()["join_merge_hint"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" not in plan

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
    # round-6 late additions — every entry below is either (a) a
    # model/grid-sized relation (1-row moments, 3 centroids, 10
    # series pairs, 7-origin triangle, 25-cell contingency) broadcast
    # or reduced in one task BY CONSTRUCTION, or (b) Catalyst's
    # scalar-subquery broadcast-cross shape over such a relation —
    # the fact-table side never funnels through a single partition.
    "stats_cramers_v": {"cartesian", "single-partition-exchange"},
    "stats_anova_oneway": {"single-partition-exchange"},
    "stats_levene_bf": {"single-partition-exchange"},
    "stats_ols_multiple": {"single-partition-exchange"},
    "stats_granger_lagged": {"single-partition-exchange"},
    "stats_weibull_fit": {"single-partition-exchange"},
    "stats_cochran_armitage": {"single-partition-exchange"},
    # chain ladder: the 6-factor 1-row relation broadcast-crosses the
    # 7-row triangle; the factor reduce is one task over 7 rows.
    "agg_chain_ladder_reserve": {"cartesian", "single-partition-exchange"},
    # k-means: the 1-row wide centroid pivot broadcast-crosses the
    # point stream each iteration (the shuffle-free assignment is the
    # point of the key); centroid updates reduce k=3 rows.
    "feat_kmeans_lloyd": {"cartesian", "single-partition-exchange"},
    # DTW: 5 per-type series rows cross to 10 pairs via a broadcast
    # nested-loop on t1 < t2 — the pair grid is the product.
    "ts_dtw_distance": {"cartesian"},
    # curriculum: the global token cumsum now RUNS as the two-pass
    # rewrite (global_rank + global_cumsum); residues are the 1-row
    # token total broadcast-cross (scalar-subquery shape) and the
    # offset-table reduces — model-sized, agg_global class.
    "train_curriculum_buckets": {"cartesian", "single-partition-exchange"},
    # link prediction: the md5 spine crosses a 3-row replica literal
    # and 1-row count (same synthesis as iter_triangle_count's
    # allowlisted shape); degree/deg-join reduces are grid-sized.
    "graph_link_prediction": {"cartesian", "single-partition-exchange"},
    # JB is a 1-row global moment aggregate; runs/DW window a 30-day
    # grid (collapsed daily grain) and broadcast-cross 1-row
    # median/fit rows — scalar-subquery shape.
    "stats_jarque_bera": {"single-partition-exchange"},
    "stats_runs_test": {"cartesian", "single-partition-exchange"},
    "stats_durbin_watson": {"cartesian", "single-partition-exchange"},
    # Holt-Winters: the fold input is the 30-day collapsed grid
    # (t-numbering window + single collect) — the model-sized
    # sequential primitive, same class as ts_holt_linear.
    "ts_holt_winters_seasonal": {"single-partition-exchange"},
    # Markov stationary: 1-row matrix pivot (grid of 25 transition
    # probabilities) folded 20 steps; Croston crosses the 25-brand
    # dim with a 365-literal spine (both model-sized relations).
    "iter_markov_stationary": {"single-partition-exchange"},
    # croston additionally reduces the 25-brand fold input in one
    # task (model-sized after the spine collapse)
    "ts_croston_intermittent": {"cartesian", "single-partition-exchange"},
    # shrinkage: 1-row prior broadcast-crossed into the 25-group
    # grid; bootstrap: 1200-literal pick spine range-joined to the
    # 30-day grid, 200-row rank window — all model-sized.
    "stats_beta_binomial_shrinkage": {"cartesian", "single-partition-exchange"},
    "sample_block_bootstrap": {"cartesian", "single-partition-exchange"},
    # growth accounting crosses the 1-row max-week bound; its churn
    # anti-join reduces the user-week grid (collapsed grain) in one
    # exchange. Lift chart's decile assignment now RUNS on the
    # two-pass global_rank; residues are the 1-row total cross
    # (scalar-subquery shape) and the 10-row decile-grid window —
    # model-sized, agg_global class.
    "win_growth_accounting": {"cartesian", "single-partition-exchange"},
    "rank_lift_chart_deciles": {"cartesian", "single-partition-exchange"},
    # ALS emits a literal 1-row result after model-sized driver
    # folds; SPC crosses the 1-row sigma limits into the 30-day
    # grid and windows that grid.
    "iter_als_rank1": {"single-partition-exchange"},
    "win_spc_western_electric": {"cartesian", "single-partition-exchange"},
    # Shapley reduces data to a 16-cell mask grid then broadcast-
    # crosses it; capture-recapture joins three 1-row scalar counts.
    "attribution_shapley": {"cartesian", "single-partition-exchange"},
    "stats_capture_recapture": {"cartesian", "single-partition-exchange"},
    # repeat curve crosses the 10-literal k spine + 1-row total;
    # BOM's UnionLoop anchor reduces 3 root rows in one task.
    "agg_repeat_purchase_curve": {"cartesian", "single-partition-exchange"},
    "sql_bom_rollup": {"cartesian", "single-partition-exchange"},
    # tile smoothing crosses the tile GRID with the 9-offset
    # literal spine — grid-sized replication by design
    "geo_tile_neighbor_smooth": {"cartesian"},
    # hurst crosses the 30-day grid with a 3-literal size spine and
    # windows (size, block) grids; coverage crosses a 1-row total.
    "ts_hurst_rs": {"cartesian", "single-partition-exchange"},
    "agg_catalog_coverage": {"cartesian", "single-partition-exchange"},
    # walk-forward: prefix-moment window over the 30-day grid,
    # 3-literal cutoff spine broadcast back.
    "ts_walkforward_ols": {"cartesian", "single-partition-exchange"},
    # alpha-beta filter folds the 30-day collapsed grid, same class
    # as ts_holt_winters_seasonal.
    "ts_alpha_beta_filter": {"single-partition-exchange"},
    # dwell crosses 1-row totals (scalar-subquery shape); kappa's
    # median rank now RUNS on the two-pass global_rank — residues
    # are the 1-row count/median broadcast-crosses and offset-table
    # reduces, model-sized, agg_global class.
    "win_dwell_time_by_state": {"cartesian", "single-partition-exchange"},
    "stats_cohens_kappa": {"cartesian", "single-partition-exchange"},
    # VaR crosses the 1-row rank-5%/n row into the 29-delta grid;
    # odds ratio / McNemar are 1-row cell aggregates.
    "agg_var_expected_shortfall": {"cartesian", "single-partition-exchange"},
    "stats_odds_ratio": {"single-partition-exchange"},
    "stats_mcnemar_paired": {"single-partition-exchange"},
    # record highs window the 30-day collapsed daily grid globally
    "win_record_highs": {"single-partition-exchange"},
    # lerp curve: the 24-knot segment window is a calendar-sized
    # global order; segments broadcast into the probe RANGE-join,
    # which Spark plans as a broadcast nested-loop — correct here
    # because the build side is the calendar-sized curve.
    "join_lerp_curve": {"cartesian", "single-partition-exchange"},
    # ECE/burstiness cross 1-row totals; burstiness's top-20 vocab
    # is a global LIMIT (single final task over partial top-ks).
    "stats_calibration_ece": {"cartesian", "single-partition-exchange"},
    "text_burstiness": {"cartesian", "single-partition-exchange"},
    "agg_rfm_migration_matrix": {"single-partition-exchange"},
    "stats_breusch_pagan": {"cartesian", "single-partition-exchange"},
    # rolling beta windows the 30-day collapsed daily grid globally
    "win_rolling_beta": {"single-partition-exchange"},
    # token bucket folds per-user arrays; the fold input reduce is
    # the grouped-collect, same class as croston.
    "win_token_bucket_throttle": {"single-partition-exchange"},
    # lorenz NTILEs per-customer revenue on one global rank (same
    # class as the lift chart); entropy rate crosses 1-row totals.
    "agg_lorenz_deciles": {"cartesian", "single-partition-exchange"},
    "stats_markov_entropy_rate": {"cartesian", "single-partition-exchange"},
    # analytic PCA / paired t / Feistel audit are 1-row aggregates;
    # Heaps crosses the 5-checkpoint literal spine + 1-row fit.
    "stats_pca_2x2_analytic": {"single-partition-exchange"},
    "stats_paired_ttest": {"single-partition-exchange"},
    "fn_feistel_permutation": {"single-partition-exchange"},
    "text_heaps_law": {"cartesian", "single-partition-exchange"},
    # edge support shares iter_triangle_count's allowlisted spine
    # synthesis (3-row replica literal + 1-row count cross).
    "graph_edge_support": {"cartesian", "single-partition-exchange"},
    # seasonal strength windows the 30-day grid; id audit's LAG over
    # the global id order IS the audit (per-partition at scale).
    "ts_seasonal_strength": {"cartesian", "single-partition-exchange"},
    "dq_id_density_audit": {"cartesian", "single-partition-exchange"},
    # G/Poisson/HHI/blocking: 1-row totals and grid windows only.
    "stats_g_test": {"cartesian", "single-partition-exchange"},
    "stats_poisson_rate_test": {"single-partition-exchange"},
    "agg_hhi_by_year": {"single-partition-exchange"},
    "dedup_phonetic_blocking": {"cartesian", "single-partition-exchange"},
    # dispersion's quartiles rank per brand (25 partitions) but the
    # stats are grid aggs — no global construct; entry only if lint
    # flags it (it should not).
    # semantics ARE cartesian
    "join_cross": {"cartesian"},
    # salted join replicates the right side against a broadcast
    # n_salts-row literal table — a bounded, by-design cross product
    # (that replication is the skew defense itself).
    "join_salted_checked": {"cartesian"},
    # 1-row global aggregate broadcast-crossed into the fact side —
    # Catalyst's own scalar-subquery plan; the single partition holds
    # exactly one row.
    "text_tfidf": {"cartesian", "single-partition-exchange"},
    "subquery_scalar_agg": {"cartesian", "single-partition-exchange"},
    "subquery_correlated_agg": {"single-partition-exchange"},
    # global 1-row aggregates: the final stage reduces a handful of
    # partial rows in one task by definition.
    "agg_global": {"single-partition-exchange"},
    "dq_rules_summary": {"single-partition-exchange"},
    "dq_fd_check": {"single-partition-exchange"},
    "funnel_two_step": {"single-partition-exchange"},
    "sink_sized_files": {"single-partition-exchange"},
    # the tiny per-bucket/per-partition offset table (one row per
    # bucket) is cumsum'd alone — that IS the two-phase rewrite; and
    # for the sort keys the range-partitioned distributed sort is the
    # intentional product (sorted output), not a smell.
    "pack_sequences_greedy": {"single-partition-exchange"},
    "sort_multi": {"single-partition-exchange", "global-sort"},
    "sort_nulls_last": {"single-partition-exchange", "global-sort"},
    # composes global_rank + global_cumsum + a 1-row broadcast total:
    # the tiny offset tables and the scalar cross are each components'
    # by-design constructs (see the entries above).
    "agg_pareto_customers": {
        "single-partition-exchange",
        "global-sort",
        "cartesian",
    },
    # these keys exist to cover the row-wise Python UDF/UDTF API and
    # are documented as not-a-pattern.
    "udf_python_scalar": {"rowwise-python-udf"},
    "udtf_python": {"rowwise-python-udf"},
    "udtf_analyze_polymorphic": {"rowwise-python-udf"},
    # 1-row corpus-total broadcast-crossed into the token stream —
    # the same scalar-subquery shape as text_tfidf above.
    "text_perplexity_proxy": {"cartesian", "single-partition-exchange"},
    "text_bm25_score": {"cartesian", "single-partition-exchange"},
    # 1-row digit-total broadcast-crossed into the 9-group digit agg —
    # the same scalar-subquery shape (round 4).
    "dq_benford": {"cartesian", "single-partition-exchange"},
    # 1-row global (min_day, max_day) bounds broadcast-crossed into
    # the user spine before sequence() — scalar-subquery shape again.
    "ts_gapfill_locf": {"cartesian", "single-partition-exchange"},
    # final ORDER BY over a nation-count-sized aggregate (5 rows at
    # any SF): sorted output is the query's product, and the sort
    # input is dim-table sized by construction.
    "tpch_q5_local_supplier": {"global-sort"},
    # the ALL row unions 5 per-type sketches into one task by
    # definition; output ordering over 6 rows is the product.
    "agg_hll_sketch_union": {"single-partition-exchange", "global-sort"},
    # 1-row global aggregates (the query's entire output), same class
    # as agg_global above (round 4 TPC-H shapes).
    "tpch_q6_forecast": {"single-partition-exchange"},
    "tpch_q14_promo_share": {"single-partition-exchange"},
    "tpch_q17_small_quantity": {"single-partition-exchange"},
    "tpch_q19_disjunctive": {"single-partition-exchange"},
    # canonical TPC-H ORDER BY over a group-count-sized aggregate
    # (directions x years / years / count-of-counts buckets / country
    # codes / return flags — dozens of rows at any SF): sorted output
    # is the query's product, sort input is tiny by construction.
    "tpch_q7_volume_shipping": {"global-sort"},
    "tpch_q8_market_share": {"global-sort"},
    "tpch_q13_order_counts": {"global-sort"},
    "agg_regr_linear": {"global-sort"},
    # scalar-subquery broadcast (1-row positive-balance average) +
    # 7-row country-code output sort — both by-design constructs.
    "tpch_q22_sales_opportunity": {
        "cartesian",
        "single-partition-exchange",
        "global-sort",
    },
    # 1-row broadcast scalars crossed into the plan (node-count N for
    # the derived edge set / the mixture total) — the subquery_scalar
    # shape; BFS repeats it once per unrolled level.
    "iter_reachability_bfs": {"cartesian", "single-partition-exchange"},
    "sample_temperature_mix": {
        "cartesian",
        "single-partition-exchange",
        "global-sort",
    },
    # 1-row global (min_day, max_day) bounds broadcast into the spine
    # — same shape as ts_gapfill_locf above.
    "ts_resample_interp": {"cartesian", "single-partition-exchange"},
    # 10-label summary output sort — dim-sized product ordering.
    "sim_matryoshka_overlap": {"global-sort"},
    # four (n_child, n_orphans) 1-row aggregates crossed into the
    # report rows — the scalar-subquery shape, once per FK relation.
    "dq_referential_orphans": {"cartesian", "single-partition-exchange"},
    # 1-row max-timestamp aggregate broadcast into the decay term —
    # the scalar-subquery shape again.
    "agg_decayed_sum": {"cartesian", "single-partition-exchange"},
    # 1-row node-count broadcast into the derived edge set plus one
    # teleport-term scalar cross per unrolled power-iteration round —
    # the same shape iter_reachability_bfs carries per BFS level.
    "iter_pagerank": {"cartesian", "single-partition-exchange"},
    # 1-row unigram/bigram corpus totals broadcast-crossed into the
    # match-sized PMI join — the text_tfidf scalar-subquery shape.
    "text_collocations_pmi": {"cartesian", "single-partition-exchange"},
    # 1-row scalars crossed into constant-size tables: vector count n
    # into the 4096-row scatter matrix, then one max-abs renorm
    # scalar per power-iteration round — each the subquery_scalar
    # shape over d- or d^2-row inputs, never corpus-scale.
    "embedding_pca_power": {"cartesian", "single-partition-exchange"},
    # the sketch is ONE global aggregate by definition (its whole
    # point: constant-size associative state reduced to one value) —
    # the same class as agg_global.
    "agg_approx_topk_exact": {"single-partition-exchange"},
    # whole-table profile / experiment readout: the entire result IS
    # one global aggregate row (agg_global class).
    "dq_completeness_profile": {"single-partition-exchange"},
    "stats_ab_ttest": {"single-partition-exchange"},
    # 1-row contingency total broadcast-crossed into the 15-cell grid
    # — scalar-subquery shape over a grid-sized input.
    "stats_chi_square": {"cartesian", "single-partition-exchange"},
    # composes global_rank (range sort + tiny offset table — the
    # agg_pareto_customers constructs) into a final 1-row aggregate.
    "agg_gini_revenue": {"single-partition-exchange"},
    # 1-row corpus token total broadcast-crossed into the per-source
    # term table — the text_tfidf scalar-subquery shape.
    "dq_corpus_drift_jsd": {"cartesian", "single-partition-exchange"},
    # three 1-row count aggregates (candidates / truth / overlap)
    # crossed into the single report row — scalar-subquery shape.
    "dedup_eval_banding_pr": {"cartesian", "single-partition-exchange"},
    # the 32-replica literal broadcasts into the fan-out (bounded
    # by-design cross), and the 32-row replica-mean ranking + 1-row
    # CI scalars are constant-size — agg_global class.
    "stats_bootstrap_ci": {"cartesian", "single-partition-exchange"},
    # 1-row contingency total crossed into the grid, MI reduced to
    # one report row — same class as stats_chi_square.
    "stats_mutual_information": {"cartesian", "single-partition-exchange"},
    # score-group grid (domain-sized) cumsum + 1-row final readout —
    # the grid window is bounded by the score domain, not the corpus.
    "stats_auc_exact": {"single-partition-exchange"},
    # 1-row subject total crossed into the duration grid; the KM
    # running product runs on the grid (<= max-duration rows).
    "stats_survival_km": {"cartesian", "single-partition-exchange"},
    # 4-cell grid reduced to the single estimate row — agg_global
    # class (the corpus-scale work is the conditional hash-agg).
    "stats_diff_in_diff": {"single-partition-exchange"},
    # 1-row horizon broadcast + bare NTILE windows over the per-user
    # table (docstring: swap for global_rank at scale — the quintile
    # contract is the key's point, the fixture size keeps it direct).
    "win_rfm_segmentation": {"cartesian", "single-partition-exchange"},
    # five moment sums reduced to one readout row — agg_global class.
    "stats_ratio_delta_method": {"single-partition-exchange"},
    # the table signature IS one associative 3-value reduction —
    # agg_global class.
    "dq_table_checksum": {"single-partition-exchange"},
    # the 5-row rule table broadcast-crosses the scan BY DESIGN —
    # rules-as-data cross-apply; cost scales with |rules|, not rows².
    "dq_rules_as_data": {"cartesian"},
    # the day grid is calendar-sized (~31 rows): its global sort and
    # per-lag 1-row moment reductions are grid work, not corpus work.
    "ts_autocorrelation": {"single-partition-exchange", "global-sort"},
    # 1-row overall-mean broadcast crossed into the 7-row dow grid —
    # scalar-subquery shape.
    "agg_weekday_seasonal_index": {"cartesian", "single-partition-exchange"},
    # global_rank's range sort + tiny offset table (the
    # agg_pareto_customers constructs) + a 1-row count crossed into
    # the 8-row bin grid.
    "agg_equidepth_bins": {
        "cartesian",
        "single-partition-exchange",
        "global-sort",
    },
    # the 1-row cursor (last key of the previous page) broadcast
    # into the scan filter — scalar-subquery shape.
    "sort_keyset_pagination": {"cartesian"},
    # the bbox prefilter is a RANGE join against a 12-row broadcast
    # polygon table -> BroadcastNestedLoopJoin by design: the "scan
    # side" streams once, the loop side is a handful of KB. The
    # linter's cartesian code keys on the operator name, but this IS
    # the scalable point-in-polygon plan.
    "join_geo_point_in_polygon": {"cartesian"},
    # the week grid is calendar-sized (a handful of rows): its LAG
    # window is grid work, not corpus work.
    "ts_week_over_week": {"single-partition-exchange"},
    # the concentration index IS one global reduction (agg_global
    # class); the corpus work is the customer-keyed rollup.
    "agg_revenue_hhi": {"single-partition-exchange"},
    # the per-part cumsum states the two-phase global_cumsum
    # contract as a window at fixture scale (agg_pareto_customers
    # pins the two-phase machinery itself).
    "agg_abc_classification": {"single-partition-exchange", "global-sort"},
    # _metadata.file_name is a HIDDEN metadata column: it appears in
    # the scan Output but never in ReadSchema, which is also the
    # linter's partition-column signature — and reading per-file
    # metadata for EVERY file is this key's purpose.
    "scan_file_metadata": {"unpruned-partition-scan"},
    # the stream read-back aggregates across every __batch_id
    # partition BY DESIGN (the sink wrote them; the check sums them).
    "source_python_datasource_stream": {"unpruned-partition-scan"},
    # three 1-row step-count aggregates crossed into the single
    # funnel report row — the scalar-subquery shape (agg_global
    # class), once per funnel step.
    "funnel_ordered_3step": {"cartesian", "single-partition-exchange"},
    # 1-row corpus totals broadcast into the per-user conversion
    # flag, then a 2-row variant pivot reduced to the single report
    # row — scalar-subquery + agg_global shapes.
    "stats_proportion_ztest": {"cartesian", "single-partition-exchange"},
    # 1-row min-class-count cap broadcast into the per-class rank —
    # scalar-subquery shape.
    "sample_class_balanced": {"cartesian", "single-partition-exchange"},
    # 1-row node-count broadcast into the derived edge set, once per
    # unrolled relaxation round — the iter_reachability_bfs shape.
    "iter_sssp_bellman_ford": {"cartesian", "single-partition-exchange"},
    # the ~40-row log2-bucket grid: its cumulative window and the
    # 3-row percentile probe (theta join on the cumulative curve)
    # are grid work; the corpus only flows through one hash-agg.
    "agg_histogram_percentile": {"cartesian", "single-partition-exchange"},
    # 1-row global watermark broadcast-crossed into the per-feed
    # maxima — scalar-subquery shape.
    "dq_freshness_sla": {"cartesian", "single-partition-exchange"},
    # the trailing-interval window runs over the calendar day grid
    # (~2.4k rows at any SF — grid work, ts_week_over_week class).
    "win_range_interval_frame": {"single-partition-exchange"},
    # the key's PURPOSE is the PARTITION BY table-argument UDTF API
    # (same allowlist class as udtf_python).
    "udtf_partition_by": {"rowwise-python-udf"},
    # two 1-row COUNT(*) variants unioned into the 2-row report —
    # agg_global class.
    "join_null_aware_anti": {"single-partition-exchange"},
    # 1-row nation-total / quarter-max broadcast scalars crossed into
    # the per-part / per-supplier tables — the spec's own scalar
    # subqueries, computed once (the whole point of the rewrite).
    "tpch_q11_important_stock": {"cartesian", "single-partition-exchange"},
    "tpch_q15_top_supplier": {"cartesian", "single-partition-exchange"},
    # 1-row era totals crossed into the ~40-row bucket grid, PSI
    # reduced to one report row — stats_chi_square class.
    "dq_distribution_psi": {"cartesian", "single-partition-exchange"},
    # global dense/row ranking over the per-customer AGGREGATE (not
    # the corpus); two-phase global_rank applies at larger scale
    # (the win_rfm_segmentation note).
    "win_topn_ties_dense": {"single-partition-exchange"},
    # the cohort-total window runs over a dim-sized 1-in-50 customer
    # slice by construction; docstring prescribes the scalar-agg
    # cross for corpus-scale cohorts.
    "win_percent_of_total": {"single-partition-exchange"},
    # nation x nation theta pairs (25x25, dim-sized by construction)
    # — the bounded-levenshtein API demo; real fuzzy verify at scale
    # runs on BLOCKED candidates (dedup_levenshtein_verify).
    "fn_levenshtein_threshold": {"cartesian"},
    # 1-row node-count broadcast into the derived edge set — the
    # iter_reachability_bfs shape, once per unrolled peel round.
    "iter_kcore_peel": {"cartesian", "single-partition-exchange"},
    # three 1-row per-version aggregates unioned into the 3-row
    # history report — agg_global class.
    "table_format_time_travel": {"single-partition-exchange"},
    # 1-row node-count + 3-row salt spine broadcasts into the edge
    # derivation, and the 1-row triangle/edge totals cross — the
    # derived-graph scalar shapes (iter_reachability_bfs class).
    "iter_triangle_count": {"cartesian", "single-partition-exchange"},
    # same derived-graph scalar shapes: 1-row node count + salt spine
    # broadcast into the md5 edge derivation (the per-round label
    # joins themselves are node-keyed equi-joins, never cartesian).
    "iter_label_propagation": {"cartesian", "single-partition-exchange"},
    # the decomposition runs on the calendar DAY GRID (a few thousand
    # rows): its centered 7-day window is grid work, not corpus work
    # (ts_week_over_week class); the corpus agg before it is keyed.
    "ts_seasonal_decompose": {"single-partition-exchange"},
    # 1-row rows_after/value_after aggregate broadcast-crossed into
    # the 2-row status rollup — the scalar-subquery shape.
    "table_format_delete": {"cartesian", "single-partition-exchange"},
    # 1-row leakage-count aggregate broadcast-crossed into the 3-row
    # split report — the scalar-subquery shape.
    "split_leakage_safe": {"cartesian", "single-partition-exchange"},
    # the read-back aggregates EVERY partition on purpose: proving
    # dynamic overwrite preserved the untouched years requires
    # scanning them (the write mode under test, not a query smell).
    "sink_partition_overwrite_dynamic": {"unpruned-partition-scan"},
    # converter-count percentile rank (grid-sized by construction)
    # plus the 1-row p50/p90 broadcast-crossed into the histogram —
    # the funnel_ordered_3step scalar shapes.
    "funnel_time_to_convert": {"cartesian", "single-partition-exchange"},
    # each source ranking is ONE global window by definition (a rank
    # over the whole candidate list); at scale the inputs are each
    # system's pre-cut top-N, so the single partition holds N rows —
    # the sort_multi class.
    "sim_rank_fusion_rrf": {"single-partition-exchange"},
    # three 1-row aggregates (member count, bits-set count, probe
    # summary) crossJoin'd into one summary row — the scalar-subquery
    # shape; each single-partition exchange reduces <= a handful of
    # partial rows.
    "dq_bloom_membership": {"cartesian", "single-partition-exchange"},
    # the days-sized aggregated series fans out against a broadcast
    # 13-row period table (bounded by-design cross), and the final
    # rank window orders 13 spectral rows in one task.
    "ts_periodogram_dominant": {"cartesian", "single-partition-exchange"},
    # the global-mean fallback is a broadcast 1-row scalar subquery
    # (cartesian by shape); its single-partition exchange reduces
    # 32 partial rows to the 1-row global.
    "feat_target_encode_loo": {"cartesian", "single-partition-exchange"},
    # totals are a broadcast 1-row scalar subquery, and the decile
    # NTILE runs over the already-aggregated per-customer table
    # (|customers| rows, not the fact table) in one task — the fit
    # side of fit/apply; at larger corpora the swap is equidepth
    # bins from approx quantiles (agg_equidepth_bins).
    "feat_woe_iv": {"cartesian", "single-partition-exchange"},
    # the Holt fold is inherently sequential and runs over the
    # model-sized daily series (~2.4k rows, calendar-bounded and
    # independent of fact-table size) collected into one task; the
    # distributed work (daily revenue agg) shuffles normally first.
    "ts_holt_linear": {"single-partition-exchange"},
    # node-count scalar subquery broadcast into the edge map (the
    # iter_reachability_bfs shape) plus the 1-row moments reduce.
    "stats_assortativity_degree": {"cartesian", "single-partition-exchange"},
    # the global rank window runs over KEY-COUNT rows (the already-
    # aggregated per-key sizes, not the fact table) — the profiler
    # reduces to one summary row by design.
    "dq_join_key_skew": {"single-partition-exchange"},
    # the relevance stage broadcasts the (tiny) query set against the
    # corpus on a non-equi predicate (vec_id <>) — the deliberate
    # brute-force scan of the sim_knn family; the greedy re-rank then
    # runs on the pooled shortlist only.
    "sim_mmr_diversify": {"cartesian"},
    # the basket-count denominator is a broadcast 1-row scalar
    # subquery (cartesian by shape; its exchange reduces 32 partials)
    "agg_market_basket_lift": {"cartesian", "single-partition-exchange"},
    # six 1-row table-profile aggregates unioned — each exchange
    # reduces 32 partial rows to the single summary row per column.
    "dq_uniqueness_profile": {"single-partition-exchange"},
    # the allocation denominator is a broadcast 1-row scalar
    # subquery over the 5-row fit table.
    "sample_neyman_stratified": {"cartesian", "single-partition-exchange"},
    # the bigram-type total is a broadcast 1-row scalar subquery over
    # the model-sized LM stats.
    "text_kneser_ney_bigram": {"cartesian", "single-partition-exchange"},
    # node-count scalar subquery broadcast into the edge map, once
    # per unrolled HITS half-step — the iter_pagerank shape.
    "iter_hits_scores": {"cartesian", "single-partition-exchange"},
    # rank cumsum over the DOMAIN-SIZED value histogram (50 quantity
    # levels at any SF) — the stats_auc_exact grid shape; the fact
    # scan itself reduces map-side into the grid first.
    "stats_mann_whitney_u": {"single-partition-exchange"},
    # ECDF cumsum over the distinct-value grid plus a broadcast
    # 1-row (n1, n2) totals cross — grid window + scalar subquery.
    "stats_ks_2sample": {"cartesian", "single-partition-exchange"},
    # BH step-up runs on the 25-row per-brand p-value table (brand
    # domain-sized); pooled-rate totals are a 1-row broadcast cross.
    "stats_bh_fdr": {"cartesian", "single-partition-exchange"},
    # rolling median / sigma bands run on the CALENDAR-sized daily
    # grid (~2.2k rows at any fact scale) after a map-side reduce —
    # the agg_bounce_rate_daily grid-window shape.
    "dq_row_count_anomaly": {"single-partition-exchange"},
    "win_bollinger_breakout": {"single-partition-exchange"},
    # S / tie-term / n are three 1-row global aggregates over the
    # MONTH grid broadcast-crossed together; the month-grid pairwise
    # join itself is an inequality join on ~80 grid rows.
    "stats_mann_kendall_trend": {"cartesian", "single-partition-exchange"},
    # the CUPED moments reduce to ONE global row by definition
    # (agg_global class).
    "stats_cuped_adjustment": {"single-partition-exchange"},
    # the sweep-line running sum is a global ordered cumsum over the
    # session-boundary table — the docstring pins the two-phase
    # per-day rewrite as the 100 TB path (pack_sequences_greedy
    # demonstrates the construction).
    "win_peak_concurrency": {"single-partition-exchange"},
    # month-count scalar + the pair-median 1-row reduce crossed
    # together; the pair join is the Mann-Kendall month-grid shape.
    "stats_sen_slope": {"cartesian", "single-partition-exchange"},
    # global size-desc rank (the round-robin packing IS a global
    # order) + a 1-row grand-total broadcast cross — the
    # agg_pareto_customers constructs.
    "pack_shards_balanced": {"cartesian", "single-partition-exchange"},
    # 1-row cohort-size and 1-row fitted-slope scalars broadcast into
    # the calendar-sized curve — the scalar-subquery shape, twice.
    "agg_retention_half_life": {"cartesian", "single-partition-exchange"},
    # the 3-row epoch table broadcast-crossed into the corpus IS the
    # fan-out (one permutation per epoch) — a bounded by-design cross
    # like join_salted_checked.
    "train_epoch_shuffle": {"cartesian"},
    # the certificate (5 counters over the whole probe table) is one
    # global aggregate row by definition — agg_global class.
    "join_bloom_prefilter_checked": {"single-partition-exchange"},
    # each relation's profile is a 1-row global reduce of its per-key
    # fan-out table — agg_global class, once per relation.
    "dq_join_fanout_profile": {"single-partition-exchange"},
    # the whole A/A readout is ONE global row by definition
    # (agg_global class — the same shape as stats_ab_ttest).
    "stats_aa_test_srm": {"single-partition-exchange"},
    # two LAGs over the calendar-sized month grid + a 1-row backtest
    # reduce — the grid-window shape.
    "ts_naive_forecast_error": {"single-partition-exchange"},
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


def test_lint_catches_cartesian_and_single_partition(spark):
    """Linter self-test on deliberately bad plans."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    codes = {f.code for f in lint_plan(a.crossJoin(b))}
    assert "cartesian" in codes

    w = Window.orderBy("id")
    ranked = a.withColumn("rn", F.row_number().over(w))
    codes = {f.code for f in lint_plan(ranked)}
    assert "single-partition-exchange" in codes


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

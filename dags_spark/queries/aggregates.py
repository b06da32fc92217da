"""SURVEY §2.4 — aggregations.

All double aggregates use the exact-DECIMAL-sum pattern (see
queries/__init__) so Spark and the DuckDB oracle agree bit-for-bit.
Plans are single-pass hash aggregates: Spark runs partial (map-side)
+ final HashAggregateExec automatically, so at 100 TB each of these is
one shuffle on the group keys with map-side combine — the plan you
want. Dimension-sized inputs broadcast in the join-based ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import SQL_CENTS, SQL_DEC_AVG, SQL_DEC_SUM, cents, dec_avg, dec_sum, table
from ..registry import register

# ---------------------------------------------------------------- Q1

# Exact product sums in scaled-integer space: price, discount, and tax
# are exact 2-decimal values, so  price_c * (100 - disc_c)  (scale 4)
# and  ... * (100 + tax_c)  (scale 6) are exact BIGINTs; one double
# division at the end matches the oracle bit-for-bit.
_SQL_P = SQL_CENTS("l_extendedprice")
_SQL_D = SQL_CENTS("l_discount")
_SQL_T = SQL_CENTS("l_tax")
SQL_REVENUE_SUM = f"CAST(SUM({_SQL_P} * (100 - {_SQL_D})) AS DOUBLE) / 10000.0"
_SQL_CHARGE_SUM = (
    f"CAST(SUM({_SQL_P} * (100 - {_SQL_D}) * (100 + {_SQL_T})) AS DOUBLE) / 1000000.0"
)


def revenue_sum() -> F.Column:
    """SUM(l_extendedprice * (1 - l_discount)) — exact, via cents."""
    return (
        F.sum(cents("l_extendedprice") * (F.lit(100) - cents("l_discount")))
        .cast("double")
        / F.lit(10000.0)
    )


def _charge_sum() -> F.Column:
    return (
        F.sum(
            cents("l_extendedprice")
            * (F.lit(100) - cents("l_discount"))
            * (F.lit(100) + cents("l_tax"))
        ).cast("double")
        / F.lit(1000000.0)
    )


_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {SQL_DEC_SUM('l_quantity')} AS sum_qty,
  {SQL_DEC_SUM('l_extendedprice')} AS sum_base_price,
  {SQL_REVENUE_SUM} AS sum_disc_price,
  {_SQL_CHARGE_SUM} AS sum_charge,
  {SQL_DEC_AVG('l_quantity')} AS avg_qty,
  {SQL_DEC_AVG('l_extendedprice')} AS avg_price,
  {SQL_DEC_AVG('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("agg_pricing_summary", oracle=_Q1_ORACLE, tags=("flagship", "bench"))
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary over lineitem.

    Scan -> filter (pushed to parquet) -> 2-phase hash agg on 2 keys;
    all money math in exact scaled-BIGINT space (integer codegen, no
    decimal ops in the hot loop).
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            revenue_sum().alias("sum_disc_price"),
            _charge_sum().alias("sum_charge"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_extendedprice").alias("avg_price"),
            dec_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_global",
    oracle=f"""
SELECT
  {SQL_REVENUE_SUM} AS total_revenue,
  {SQL_DEC_SUM('l_quantity')} AS total_qty,
  COUNT(*) AS n_rows
FROM lineitem
""",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate: single global hash-agg, no shuffle of data
    rows (partials reduce to one row per partition)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        revenue_sum().alias("total_revenue"),
        dec_sum("l_quantity").alias("total_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_count_distinct",
    oracle="""
SELECT n_name, COUNT(DISTINCT c_custkey) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group; nation dim broadcasts."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.countDistinct("c_custkey").alias("n_customers"))
    )


@register(
    "agg_multi_distinct",
    oracle="""
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_custs,
       COUNT(DISTINCT o_orderpriority) AS n_prios
FROM orders GROUP BY o_orderstatus
""",
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two COUNT(DISTINCT)s -> Catalyst Expand-node rewrite, still one
    shuffle pass."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderpriority").alias("n_prios"),
    )


@register("agg_approx_count_distinct", oracle=None, check="rows", prop_tests=("tests/test_operators.py::test_approx_count_distinct_tolerance",))
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct orderkeys per status (approximate by design ->
    rows-only check; property test asserts +-5% vs exact)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orderkeys")
    )


@register(
    "agg_rollup",
    oracle=f"""
SELECT r_name, n_name,
       {SQL_DEC_SUM('c_acctbal')} AS sum_acctbal,
       COUNT(*) AS n_rows
FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region -> nation -> grand total)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        dec_sum("c_acctbal").alias("sum_acctbal"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_cube",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {SQL_DEC_SUM('l_quantity')} AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus)."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dec_sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
SELECT c_mktsegment, n_name,
       GROUPING(c_mktsegment) AS g_seg,
       GROUPING(n_name) AS g_nat,
       {SQL_DEC_SUM('c_acctbal')} AS sum_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS incl. grouping() marker columns."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).createOrReplaceTempView(
        "_gs_cust_nat"
    )
    return spark.sql(
        f"""
        SELECT c_mktsegment, n_name,
               CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
               CAST(GROUPING(n_name) AS INT) AS g_nat,
               {SQL_DEC_SUM('c_acctbal')} AS sum_acctbal
        FROM _gs_cust_nat
        GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
        """
    )


@register(
    "agg_having",
    oracle=f"""
SELECT n_name,
       {SQL_REVENUE_SUM} AS revenue
FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
HAVING SUM({_SQL_P} * (100 - {_SQL_D})) > 500000000000
""",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING) — threshold compared in exact
    scale-4 integer space (50000000 * 10^4)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    rev_c4 = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev_c4).alias("_rev_c4"))
    )
    return agg.filter(F.col("_rev_c4") > 500000000000).select(
        "n_name", (F.col("_rev_c4").cast("double") / F.lit(10000.0)).alias("revenue")
    )


@register(
    "agg_filtered",
    oracle=f"""
SELECT o_orderstatus,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
       CAST(SUM({SQL_CENTS('o_totalprice')}) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) / 100.0 AS urgent_value,
       COUNT(*) AS n_total
FROM orders GROUP BY o_orderstatus
""",
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER / count_if pattern)."""
    o = table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return o.groupBy("o_orderstatus").agg(
        F.count_if(urgent).alias("n_urgent"),
        (F.sum(F.when(urgent, cents("o_totalprice"))).cast("double") / F.lit(100.0))
        .alias("urgent_value"),
        F.count(F.lit(1)).alias("n_total"),
    )


# Manual moment formulas: both engines do the same double ops on
# exact scaled-integer sums -> bit-identical stddev/variance/corr.
_SQL_BAL = SQL_CENTS("c_acctbal")
_STATS_ORACLE = f"""
WITH m AS (
  SELECT c_mktsegment,
         COUNT(*) AS n,
         CAST(SUM({_SQL_BAL}) AS DOUBLE) / 100.0 AS s1,
         CAST(SUM({_SQL_BAL} * {_SQL_BAL}) AS DOUBLE) / 10000.0 AS s2
  FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment,
       s1 / n AS avg_bal,
       SQRT((s2 - s1 * s1 / n) / (n - 1)) AS std_bal,
       (s2 - s1 * s1 / n) / (n - 1) AS var_bal
FROM m
"""


@register("agg_stats", oracle=_STATS_ORACLE)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg/stddev_samp/var_samp via exact scaled-integer moments
    (identical double arithmetic both engines -> hash-stable)."""
    c = table(spark, sf_dir, "customer")
    bal_c = cents("c_acctbal")
    m = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(bal_c).cast("double") / F.lit(100.0)).alias("s1"),
        (F.sum(bal_c * bal_c).cast("double") / F.lit(10000.0)).alias("s2"),
    )
    n = F.col("n")
    s1 = F.col("s1")
    s2 = F.col("s2")
    var = (s2 - s1 * s1 / n) / (n - F.lit(1))
    return m.select(
        "c_mktsegment",
        (s1 / n).alias("avg_bal"),
        F.sqrt(var).alias("std_bal"),
        var.alias("var_bal"),
    )


@register(
    "agg_percentile_exact",
    oracle="""
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90_price
FROM orders GROUP BY o_orderstatus
""",
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (median, p90) per status."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
    )


@register("agg_approx_quantile", oracle=None, check="rows", prop_tests=("tests/test_operators.py::test_approx_quantile_tolerance",))
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx p50/p90 (approximate by design -> rows check)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("o_totalprice", 0.9, 10000).alias("p90_approx"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
SELECT n_name, string_agg(s_name, '|' ORDER BY s_name) AS suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per nation: deterministic sorted list of supplier names.

    The list aggregation is exercised via sort_array(collect_list(...))
    but serialized to one '|'-joined scalar: array-typed result columns
    are not hashable by every downstream canonicalizer (pandas sort dies
    on ndarray cells), and the scalar form is bit-identical across
    engines anyway.
    """
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("s_name")), "|").alias(
                "suppliers"
            )
        )
    )


# Tie-break acctbal ties deterministically: acctbal is an exact
# 2-decimal double, so round(bal*100) is an exact integer; compose it
# with the unique custkey into one orderable BIGINT both engines
# compute identically.
_BY_KEY = "CAST(ROUND(c_acctbal * 100) AS BIGINT) * 100000000 + c_custkey"


@register(
    "agg_min_max_by",
    oracle=f"""
SELECT c_mktsegment,
       arg_max(c_name, {_BY_KEY}) AS richest_customer,
       arg_min(c_name, {_BY_KEY}) AS poorest_customer,
       MAX(c_acctbal) AS max_bal,
       MIN(c_acctbal) AS min_bal
FROM customer GROUP BY c_mktsegment
""",
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by with a deterministic composite ordering key."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.expr(f"max_by(c_name, {_BY_KEY})").alias("richest_customer"),
        F.expr(f"min_by(c_name, {_BY_KEY})").alias("poorest_customer"),
        F.max("c_acctbal").alias("max_bal"),
        F.min("c_acctbal").alias("min_bal"),
    )


# corr via exact scaled-integer moments: qty and price are exact
# 2-decimal values, so every sum below is an exact BIGINT; the final
# correlation is a fixed-order double expression both engines evaluate
# identically (rounded 6dp for hash stability).
_CORR_ORACLE = f"""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM({SQL_CENTS('l_quantity')}) AS DOUBLE) / 100.0 AS sx,
         CAST(SUM({SQL_CENTS('l_extendedprice')}) AS DOUBLE) / 100.0 AS sy,
         CAST(SUM({SQL_CENTS('l_quantity')} * {SQL_CENTS('l_quantity')}) AS DOUBLE) / 10000.0 AS sxx,
         CAST(SUM({SQL_CENTS('l_extendedprice')} * {SQL_CENTS('l_extendedprice')}) AS DOUBLE) / 10000.0 AS syy,
         CAST(SUM({SQL_CENTS('l_quantity')} * {SQL_CENTS('l_extendedprice')}) AS DOUBLE) / 10000.0 AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       ROUND((sxy - sx * sy / n) / (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n)), 6)
         AS corr_qty_price
FROM m
"""


@register("agg_corr", oracle=_CORR_ORACLE)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson corr(l_quantity, l_extendedprice) per returnflag via
    exact integer moments (one hash-agg pass, no second scan)."""
    li = table(spark, sf_dir, "lineitem")
    qx = cents("l_quantity")
    py = cents("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(qx).cast("double") / F.lit(100.0)).alias("sx"),
        (F.sum(py).cast("double") / F.lit(100.0)).alias("sy"),
        (F.sum(qx * qx).cast("double") / F.lit(10000.0)).alias("sxx"),
        (F.sum(py * py).cast("double") / F.lit(10000.0)).alias("syy"),
        (F.sum(qx * py).cast("double") / F.lit(10000.0)).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    corr = (sxy - sx * sy / n) / (
        F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)
    )
    return m.select("l_returnflag", F.round(corr, 6).alias("corr_qty_price"))


# Pinned higher-moment formulas — ONE SQL text evaluated by both
# engines, so the double arithmetic parses to the same AST and rounds
# identically (the agg_corr trick extended to moments 3 and 4).
_MOMENT_SUMS_SPARK = "CAST(l_quantity AS BIGINT)"
_MU = "(CAST(s1 AS DOUBLE)/n)"
_M2 = f"(CAST(s2 AS DOUBLE)/n - {_MU}*{_MU})"
_M3 = f"(CAST(s3 AS DOUBLE)/n - 3*{_MU}*(CAST(s2 AS DOUBLE)/n) + 2*{_MU}*{_MU}*{_MU})"
_M4 = (
    f"(CAST(s4 AS DOUBLE)/n - 4*{_MU}*(CAST(s3 AS DOUBLE)/n)"
    f" + 6*{_MU}*{_MU}*(CAST(s2 AS DOUBLE)/n) - 3*{_MU}*{_MU}*{_MU}*{_MU})"
)
_SKEW_EXPR = f"ROUND({_M3} / POW({_M2}, 1.5), 6)"
_KURT_EXPR = f"ROUND({_M4} / ({_M2}*{_M2}) - 3, 6)"


@register(
    "agg_higher_moments",
    oracle=f"""
WITH s AS (
  SELECT l_returnflag,
         SUM(CAST(l_quantity AS BIGINT)) AS s1,
         SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s2,
         SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s3,
         SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s4,
         COUNT(*) AS n
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, {_SKEW_EXPR} AS skew_pop, {_KURT_EXPR} AS kurt_excess
FROM s
""",
)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of l_quantity per
    returnflag, from EXACT integer moment sums (q <= 50, so q^4 sums
    stay far inside BIGINT even at fixture x10^6 row counts; beyond
    that pre-aggregate per partition or widen to DECIMAL(38)).

    Built-in skewness/kurtosis differ across engines (bias
    corrections), so the formula is pinned as shared SQL text — both
    engines parse the same AST and every double op rounds
    identically. One hash-agg pass, map-side combinable.
    """
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    s = li.groupBy("l_returnflag").agg(
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
        F.count(F.lit(1)).alias("n"),
    )
    return s.selectExpr(
        "l_returnflag",
        f"{_SKEW_EXPR} AS skew_pop",
        f"{_KURT_EXPR} AS kurt_excess",
    )


@register(
    "agg_mode_deterministic",
    oracle="""
SELECT o_orderstatus, o_orderpriority AS modal_priority, n
FROM (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY COUNT(*) DESC, o_orderpriority ASC) AS rn
  FROM orders GROUP BY o_orderstatus, o_orderpriority
) WHERE rn = 1
""",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE: the most frequent priority per order
    status, ties broken lexicographically (engine `mode()` built-ins
    leave ties undefined — this spelling pins them). Hash-agg on the
    tiny (status, priority) grid, then a window over that grid only —
    the raw table never feeds the window."""
    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("modal_priority"),
            "n",
        )
    )


@register("agg_hll_sketch_union", oracle=None, check="rows", prop_tests=("tests/test_operators.py::test_hll_sketch_estimates_within_5pct",))
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch surface (approximate by design -> rows check; the
    pytest pins estimates within 5% of exact): per-event-type distinct
    users via `hll_sketch_agg`, plus an 'ALL' row whose sketch is the
    `hll_union_agg` MERGE of the per-type sketches — the mergeability
    that makes sketches the 100 TB answer for distinct-counting: map
    partials union associatively, no re-scan for rollups (vs exact
    COUNT DISTINCT whose shuffle carries every key). Estimates round-
    trip through the binary sketch column exactly as a warehouse
    rollup table would store them."""
    ev = table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    all_row = per_type.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"), "sk"
    )
    return (
        per_type.unionByName(all_row)
        .select(
            "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
        )
        .orderBy("event_type")
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
""",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmaps (round 4) — the scalable
    alternative between COUNT(DISTINCT) (shuffles every key) and HLL
    (approximate): user ids are bucketed with bitmap_bucket_number,
    each (event_type, bucket) builds a fixed-size bitmap with
    bitmap_construct_agg (map-side partials merge by OR — associative
    like a sketch, but exact), and the final count is the SUM of
    per-bucket bitmap_count. The shuffle carries (groups x buckets)
    bitmaps of <=4KB instead of every distinct key — at 100 TB with
    10^9 users that is ~30k bitmaps per group vs 10^9 shuffled longs.
    The oracle recomputes with plain COUNT(DISTINCT), so the bitmap
    path must be exactly right."""
    ev = table(spark, sf_dir, "events")
    per_bucket = (
        ev.select("event_type", F.col("user_id").alias("uid"))
        .groupBy(
            "event_type", F.expr("bitmap_bucket_number(uid)").alias("bkt")
        )
        .agg(
            F.expr(
                "bitmap_count(bitmap_construct_agg(bitmap_bit_position(uid)))"
            ).alias("cnt")
        )
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum("cnt").alias("n_users")
    )


@register(
    "agg_weighted_avg",
    oracle=f"""
SELECT l_returnflag,
       ROUND(CAST(SUM({SQL_CENTS('l_discount')} * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / 100.0 / SUM(CAST(l_quantity AS BIGINT)), 6) AS wavg_discount,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average discount per return flag (round 4):
    the weighted mean every mixture/pricing rollup needs, computed as
    exact integer sums (discount cents x quantity) divided once at
    the end — order-free under any shuffle, unlike a naive
    SUM(d*q)/SUM(q) on doubles whose partials re-associate. One
    map-side-combinable hash-agg."""
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(cents("l_discount") * q).cast("double")
            / F.lit(100.0)
            / F.sum(q),
            6,
        ).alias("wavg_discount"),
        F.sum(q).alias("total_qty"),
    )


@register(
    "agg_regr_linear",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)
                  * CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)
                  * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_lines,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND(((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) / 100.0,
             6) AS intercept,
       ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s
ORDER BY l_returnflag
""",
)
def agg_regr_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares linear fit of extendedprice on quantity per
    return flag (slope / intercept / R²) — the regression aggregate
    family (REGR_SLOPE etc.) computed from exact integer moment sums.

    Spark's native regr_* (and DuckDB's) accumulate double partials
    whose value depends on shuffle order, so they can't pass an exact
    cross-engine hash. Instead the five moments (Σx, Σy, Σx², Σxy,
    Σy²) accumulate as exact BIGINTs over integer cents — one
    map-side-combinable hash-agg, order-free — and the closed-form
    slope/intercept/R² arithmetic runs on bit-identical doubles with
    the same operation tree on both engines (x and y share the 100×
    scale, so the slope is scale-free and the intercept divides it
    out). Moment magnitudes: Σ(xy-cents) ≲ 5e10/row → int64 holds
    ~2e8 rows per group; past that, pre-aggregate per partition or
    widen to DECIMAL(38) partials."""
    li = table(spark, sf_dir, "lineitem")
    x = cents("l_quantity")
    y = cents("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n_lines"),
        F.round(slope, 6).alias("slope"),
        F.round(((sy - slope * sx) / n) / F.lit(100.0), 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    ).orderBy("l_returnflag")


@register(
    "agg_decayed_sum",
    oracle="""
WITH mx AS (SELECT MAX(ts) AS tmax FROM events),
t AS (
  SELECT user_id,
         CAST(FLOOR(ROUND(
           CAST(ROUND(value * 100, 0) AS BIGINT)
             * pow(0.9, date_diff('day', ts, tmax)), 9) * 1000) AS BIGINT)
           AS term_milli
  FROM events, mx
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(term_milli) AS BIGINT) AS decayed_milli
FROM t GROUP BY user_id
""",
)
def agg_decayed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed engagement score per user: each event contributes
    value * 0.9^age_days (age relative to the corpus max timestamp) —
    the exponential-recency feature behind churn/engagement models,
    equivalent to the EWMA recursion but computed as an
    order-independent SUM instead of an inherently sequential scan.

    Determinism under shuffle AND cross-engine: the decay term is
    quantized PER ROW (9 guard digits against libm pow drift, then
    milli-units) BEFORE the integer sum — quantizing after a double
    sum would depend on accumulation order. The 1-row max-timestamp
    aggregate broadcasts (scalar-subquery shape); everything else is
    one map-side-combinable hash-agg."""
    ev = table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("tmax"))
    term = F.floor(
        F.round(
            cents("value") * F.pow(F.lit(0.9), F.datediff("tmax", "ts")), 9
        )
        * 1000
    ).cast("bigint")
    return (
        ev.crossJoin(F.broadcast(mx))
        .select("user_id", term.alias("term_milli"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("term_milli").cast("bigint").alias("decayed_milli"),
        )
    )


@register(
    "agg_approx_topk_exact",
    oracle="""
SELECT o_orderpriority AS item,
       CAST(COUNT(*) AS BIGINT) AS est_count,
       CAST(COUNT(*) AS BIGINT) AS exact_count,
       TRUE AS sketch_exact
FROM orders GROUP BY o_orderpriority
""",
    tags=("sketch", "agg"),
)
def agg_approx_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`approx_top_k` (Spark 4 space-saving/frequent-items sketch) in
    its EXACTNESS REGIME, which is what makes it hash-checkable: a
    space-saving sketch whose capacity (maxItemsTracked=100) exceeds
    the item domain (5 priorities) never evicts, so every tracked
    count is exact — the property that lets one sketch config serve
    both small-domain exact rollups and large-domain heavy-hitter
    estimates. The sketch result is exploded, re-joined against the
    exact GROUP BY, and each row emits (est, exact, est==exact): the
    hash proves equality row-for-row, while the sketch's own tie
    ordering (engine-arbitrary) is erased by the re-sort. At 100 TB
    the sketch aggregates with constant state per partition and
    merges associatively — the same mergeability contract as
    agg_hll_sketch_union, but for WHO the heavy keys are, not how
    many distinct. Oracle: the exact counts with the flag pinned
    true."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_topk_src")
    est = spark.sql(
        """
SELECT t.item AS item, t.count AS est_count
FROM (
  SELECT explode(approx_top_k(o_orderpriority, 5, 100)) AS t
  FROM orders_topk_src
)
"""
    )
    exact = o.groupBy(F.col("o_orderpriority").alias("item")).agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    return est.join(exact, "item").select(
        "item",
        "est_count",
        "exact_count",
        (F.col("est_count") == F.col("exact_count")).alias("sketch_exact"),
    )


# Shared Welch formula text (identical in both engines: same literal
# expression tree => bit-identical doubles before the final ROUND).
_WELCH = """
ROUND((s1 / n1 - s2 / n2) / 100.0, 6) AS mean_diff,
ROUND(
  ((s1 / n1 - s2 / n2) / 100.0)
  / sqrt(
      ((q1 - s1 * s1 / n1) / (n1 - 1) / 10000.0) / n1
      + ((q2 - s2 * s2 / n2) / (n2 - 1) / 10000.0) / n2
    ),
  6) AS t_stat,
ROUND(
  pow(((q1 - s1 * s1 / n1) / (n1 - 1) / 10000.0) / n1
      + ((q2 - s2 * s2 / n2) / (n2 - 1) / 10000.0) / n2, 2)
  / (pow(((q1 - s1 * s1 / n1) / (n1 - 1) / 10000.0) / n1, 2) / (n1 - 1)
     + pow(((q2 - s2 * s2 / n2) / (n2 - 1) / 10000.0) / n2, 2) / (n2 - 1)),
  3) AS welch_df
"""


@register(
    "stats_ab_ttest",
    oracle=f"""
WITH m AS (
  SELECT
    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
    CAST(SUM(CASE WHEN user_id % 2 = 0
             THEN CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END)
         AS DOUBLE) AS s1,
    CAST(SUM(CASE WHEN user_id % 2 = 1
             THEN CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END)
         AS DOUBLE) AS s2,
    CAST(SUM(CASE WHEN user_id % 2 = 0
             THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                  * CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END)
         AS DOUBLE) AS q1,
    CAST(SUM(CASE WHEN user_id % 2 = 1
             THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                  * CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END)
         AS DOUBLE) AS q2
  FROM events WHERE event_type = 'purchase'
)
SELECT CAST(n1 AS BIGINT) AS n_control, CAST(n2 AS BIGINT) AS n_treat,
       {_WELCH}
FROM m
""",
    tags=("stats", "agg"),
)
def stats_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test — the A/B experiment-evaluation
    primitive (unequal variances, the safe default): purchase values
    split into control/treatment by user parity, t statistic and
    Welch-Satterthwaite df computed from SIX exact integer sums
    (counts, cent sums, squared-cent sums) in ONE
    map-side-combinable pass. The double formula tree is pinned as
    shared SQL text evaluated identically by both engines (the
    agg_higher_moments pattern), so the 6-dp rounded statistics are
    engine-exact. At 100 TB: one scan, one 1-row agg — the entire
    experiment readout costs a filter + agg, and per-metric variants
    just add more conditional sums to the same pass."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    v = cents("value")
    ctl, trt = F.col("user_id") % 2 == 0, F.col("user_id") % 2 == 1
    m = ev.agg(
        F.sum(F.when(ctl, 1).otherwise(0)).cast("double").alias("n1"),
        F.sum(F.when(trt, 1).otherwise(0)).cast("double").alias("n2"),
        F.sum(F.when(ctl, v).otherwise(0)).cast("double").alias("s1"),
        F.sum(F.when(trt, v).otherwise(0)).cast("double").alias("s2"),
        F.sum(F.when(ctl, v * v).otherwise(0)).cast("double").alias("q1"),
        F.sum(F.when(trt, v * v).otherwise(0)).cast("double").alias("q2"),
    )
    return m.selectExpr(
        "CAST(n1 AS BIGINT) AS n_control",
        "CAST(n2 AS BIGINT) AS n_treat",
        *[e.strip() for e in _split_select_exprs(_WELCH)],
    )


def _split_select_exprs(block: str) -> list[str]:
    """Split a shared multi-expression SQL block on top-level commas
    (commas inside parentheses stay put) so selectExpr gets one
    string per output column — keeping ONE formula text for both
    engines. Tracks paren depth ONLY: blocks containing string
    literals are rejected up front (a comma or paren inside quotes
    would mis-split silently)."""
    if "'" in block or '"' in block:
        raise ValueError(
            "_split_select_exprs: block contains a quote; string "
            "literals are not supported by the depth-only splitter"
        )
    out, depth, cur = [], 0, []
    for ch in block:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur))
    return out


@register(
    "stats_chi_square",
    oracle="""
WITH obs AS (
  SELECT o_orderstatus AS r, o_orderpriority AS c,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY o_orderstatus, o_orderpriority
),
margins AS (
  SELECT r, CAST(SUM(n) AS BIGINT) AS rn FROM obs GROUP BY r
),
colm AS (
  SELECT c, CAST(SUM(n) AS BIGINT) AS cn FROM obs GROUP BY c
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM obs)
SELECT obs.r, obs.c, obs.n,
       ROUND(CAST(rn AS DOUBLE) * cn / t, 6) AS expected,
       ROUND(pow(n - CAST(rn AS DOUBLE) * cn / t, 2)
             / (CAST(rn AS DOUBLE) * cn / t), 6) AS chi2_term
FROM obs
JOIN margins ON margins.r = obs.r
JOIN colm ON colm.c = obs.c
CROSS JOIN tot
""",
    tags=("stats", "agg"),
)
def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen over the (order status, order
    priority) contingency table — the categorical-association test
    behind segmentation checks and drift monitors. Observed counts
    are exact BIGINTs from one hash-agg; row/column margins are
    grid-sized re-aggregates of those partials (never a second
    scan); expected = rn*cn/t and each cell's (obs-exp)^2/exp run
    the same double expression tree in both engines, rounded 6dp.
    Emitting per-cell terms (not just the total) keeps the result a
    table the analyst actually reads — which cell drives the
    dependence — and the total is SUM(chi2_term) away. Shuffle
    footprint: the 15-cell grid; the margins broadcast."""
    o = table(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderstatus").alias("r"),
        F.col("o_orderpriority").alias("c"),
    ).agg(F.count(F.lit(1)).alias("n"))
    margins = obs.groupBy("r").agg(F.sum("n").alias("rn"))
    colm = obs.groupBy("c").agg(F.sum("n").alias("cn"))
    tot = obs.agg(F.sum("n").alias("t"))
    exp = F.col("rn").cast("double") * F.col("cn") / F.col("t")
    return (
        obs.join(F.broadcast(margins), "r")
        .join(F.broadcast(colm), "c")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "c",
            "n",
            F.round(exp, 6).alias("expected"),
            F.round(
                F.pow(F.col("n") - exp, 2) / exp, 6
            ).alias("chi2_term"),
        )
    )


@register(
    "agg_percentile_disc",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY CAST(ROUND(o_totalprice * 100, 0) AS BIGINT),
                                     o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority,
       CAST(MAX(n) AS BIGINT) AS n_orders,
       CAST(MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                     THEN cents END) AS BIGINT) AS p50_cents,
       CAST(MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                     THEN cents END) AS BIGINT) AS p90_cents
FROM ranked GROUP BY o_orderpriority
""",
    tags=("agg", "stats"),
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles (type-1 / lower order statistic: the
    smallest actual value with rank >= ceil(p*n)) — the quantile that
    returns a value that EXISTS in the data, which continuous
    interpolation (agg_percentile_exact) does not guarantee; the
    right choice when the percentile must be joinable back to a real
    row (a real order, a real latency trace). Engines disagree on
    their built-in quantile_disc tie/interpolation fine print, so
    BOTH sides state the definition explicitly: row_number over
    (value, unique key) picked at ceil(p*n) — no built-in, no
    ambiguity, exact integer cents. One window + one agg on the same
    partitioning."""
    o = table(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    w = Window.partitionBy("o_orderpriority").orderBy(
        c.asc(), F.col("o_orderkey").asc()
    )
    wn = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        c.alias("cents"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
            F.col("cents"),
        )
    ).cast("bigint")
    return ranked.groupBy("o_orderpriority").agg(
        F.max("n").cast("bigint").alias("n_orders"),
        pick(0.5).alias("p50_cents"),
        pick(0.9).alias("p90_cents"),
    )


# Shared hash->Poisson(1) weight fragment (identical SQL text in both
# engines). First md5 byte of (event_id, replica) -> inverse-CDF
# lookup with fixed integer cutoffs (e^-1*256=94.18 -> 94, etc.): a
# byte-resolution Poisson approximation, deterministic by
# construction — the scalable bootstrap has NO RNG state.
_BOOT_BYTE = (
    "(instr('0123456789abcdef', substr(md5(CAST(event_id AS STRING) || ':' "
    "|| CAST(b AS STRING)), 1, 1)) - 1) * 16 + "
    "(instr('0123456789abcdef', substr(md5(CAST(event_id AS STRING) || ':' "
    "|| CAST(b AS STRING)), 2, 1)) - 1)"
)
_BOOT_W = (
    f"CASE WHEN ({_BOOT_BYTE}) < 94 THEN 0 "
    f"WHEN ({_BOOT_BYTE}) < 188 THEN 1 "
    f"WHEN ({_BOOT_BYTE}) < 235 THEN 2 "
    f"WHEN ({_BOOT_BYTE}) < 251 THEN 3 ELSE 4 END"
)


@register(
    "stats_bootstrap_ci",
    oracle=f"""
WITH f AS (
  SELECT event_id, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
reps AS (
  SELECT f.event_id, f.cents, b.b, {_BOOT_W} AS w
  FROM f CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) b
),
means AS (
  -- HAVING guards the degenerate all-zero-weight replica (its mean
  -- would otherwise go NULL and silently shift the rank-2/rank-31
  -- order statistics); both engines drop such a replica identically.
  SELECT b, CAST(SUM(w * cents) AS DOUBLE) / SUM(w) / 100.0 AS m
  FROM reps GROUP BY b HAVING SUM(w) > 0
),
ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS rn FROM means
),
pt AS (
  SELECT CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0 AS est,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM f
)
SELECT n_rows, CAST(32 AS BIGINT) AS n_replicas,
       ROUND(est, 6) AS point_est,
       ROUND((SELECT m FROM ranked WHERE rn = 2), 6) AS ci_lo,
       ROUND((SELECT m FROM ranked WHERE rn = 31), 6) AS ci_hi
FROM pt
""",
    tags=("stats", "agg"),
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-SEEDED Poisson bootstrap confidence interval for the mean
    purchase value — the scalable bootstrap: classical resampling
    needs n draws per replica with shared RNG state; the Poisson(1)
    approximation gives every (row, replica) an independent weight
    from a PURE HASH of (key, replica-id), so all 32 replicas
    compute in ONE pass over an exploded fan-out with zero
    coordination, and every engine/retry/backfill reproduces the
    identical interval. Weights come from the first md5 byte through
    fixed integer inverse-CDF cutoffs (shared SQL fragment text —
    byte-resolution Poisson, documented approximation). Replica
    means are exact-integer ratios; the 2nd/31st order statistics of
    32 means give the ~90% interval (rank ties broken by replica
    id). Cost: B× the scan — the known bootstrap price; B rides a
    broadcast literal, not a shuffle."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", cents("value").alias("cents"))
    )
    reps = (
        ev.crossJoin(F.broadcast(spark.range(32).select(F.col("id").alias("b"))))
        .selectExpr("event_id", "cents", "b", f"{_BOOT_W} AS w")
    )
    # filter sum(w) > 0 mirrors the oracle's HAVING: a replica whose
    # hash-derived weights were all zero would otherwise yield a NULL
    # mean and silently shift the rank-2/31 order statistics (engines
    # also disagree on NULL sort order, so the guard is a correctness
    # fence, not just hygiene).
    means = (
        reps.groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("wc"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select("b", (F.col("wc").cast("double") / F.col("sw") / 100.0).alias("m"))
    )
    ranked = means.select(
        "m",
        F.row_number()
        .over(Window.orderBy(F.col("m").asc(), F.col("b").asc()))
        .alias("rn"),
    )
    pt = ev.agg(
        (F.sum("cents").cast("double") / F.count(F.lit(1)) / 100.0).alias("est"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    lo = ranked.filter(F.col("rn") == 2).select(F.round("m", 6).alias("ci_lo"))
    hi = ranked.filter(F.col("rn") == 31).select(F.round("m", 6).alias("ci_hi"))
    return (
        pt.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n_rows",
            F.lit(32).cast("bigint").alias("n_replicas"),
            F.round("est", 6).alias("point_est"),
            "ci_lo",
            "ci_hi",
        )
    )


@register(
    "stats_mutual_information",
    oracle="""
WITH obs AS (
  SELECT o_orderstatus AS r, o_orderpriority AS c,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY o_orderstatus, o_orderpriority
),
margins AS (SELECT r, CAST(SUM(n) AS BIGINT) AS rn FROM obs GROUP BY r),
colm AS (SELECT c, CAST(SUM(n) AS BIGINT) AS cn FROM obs GROUP BY c),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM obs),
terms AS (
  SELECT CAST(FLOOR(ROUND(
           (CAST(n AS DOUBLE) / t)
           * LN((CAST(n AS DOUBLE) * t) / (CAST(rn AS DOUBLE) * cn))
         , 12) * 1000000000) AS BIGINT) AS term_nano
  FROM obs
  JOIN margins ON margins.r = obs.r
  JOIN colm ON colm.c = obs.c
  CROSS JOIN tot
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(term_nano) AS BIGINT) AS mi_nano
FROM terms
""",
    tags=("stats", "agg"),
)
def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(status; priority) — the information-
    theoretic companion of stats_chi_square on the same contingency
    grid (chi-square answers 'is there dependence', MI answers 'how
    many nats does one column tell you about the other' — the
    feature-selection ranking metric). Each cell contributes
    p·ln(p/(px·py)), computed as ONE ln of exact-integer products
    (n·t / rn·cn — the PMI trick from text_collocations_pmi applied
    to categorical columns), guard-rounded and quantized to
    nano-nats before the BIGINT sum. Grid-sized work after one
    hash-agg pass; margins re-aggregate the grid, never the table."""
    o = table(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderstatus").alias("r"),
        F.col("o_orderpriority").alias("c"),
    ).agg(F.count(F.lit(1)).alias("n"))
    margins = obs.groupBy("r").agg(F.sum("n").alias("rn"))
    colm = obs.groupBy("c").agg(F.sum("n").alias("cn"))
    tot = obs.agg(F.sum("n").alias("t"))
    term = F.floor(
        F.round(
            (F.col("n").cast("double") / F.col("t"))
            * F.log(
                (F.col("n").cast("double") * F.col("t"))
                / (F.col("rn").cast("double") * F.col("cn"))
            ),
            12,
        )
        * 1_000_000_000
    ).cast("bigint")
    return (
        obs.join(F.broadcast(margins), "r")
        .join(F.broadcast(colm), "c")
        .crossJoin(F.broadcast(tot))
        .select(term.alias("term_nano"))
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("term_nano").alias("mi_nano"),
        )
    )


@register(
    "stats_diff_in_diff",
    oracle="""
WITH cells AS (
  SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treated,
         CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END
           AS post,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
grid AS (
  SELECT treated, post,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s
  FROM cells GROUP BY treated, post
),
wide AS (
  SELECT
    MAX(CASE WHEN treated = 1 AND post = 1 THEN CAST(s AS DOUBLE) / n END)
      AS t_post,
    MAX(CASE WHEN treated = 1 AND post = 0 THEN CAST(s AS DOUBLE) / n END)
      AS t_pre,
    MAX(CASE WHEN treated = 0 AND post = 1 THEN CAST(s AS DOUBLE) / n END)
      AS c_post,
    MAX(CASE WHEN treated = 0 AND post = 0 THEN CAST(s AS DOUBLE) / n END)
      AS c_pre,
    CAST(SUM(n) AS BIGINT) AS n_rows
  FROM grid
)
SELECT n_rows,
       ROUND(t_post / 100.0, 6) AS treat_post_mean,
       ROUND(t_pre / 100.0, 6) AS treat_pre_mean,
       ROUND(c_post / 100.0, 6) AS ctrl_post_mean,
       ROUND(c_pre / 100.0, 6) AS ctrl_pre_mean,
       ROUND(((t_post - t_pre) - (c_post - c_pre)) / 100.0, 6) AS did_estimate
FROM wide
""",
    tags=("stats", "agg"),
)
def stats_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES estimator — the workhorse causal
    readout when randomization isn't available (feature rollouts by
    cohort, market-level launches): the treatment effect is the
    treated group's pre→post change MINUS the control group's
    (which absorbs seasonality and shared shocks). Four cell means
    from ONE conditional hash-agg pass (exact integer cent sums;
    treated = user parity, post = a pinned calendar cutoff mid-way
    through the fixture window), the estimate a pinned double
    expression rounded 6dp — same formula text both engines. Pair
    with stats_ab_ttest's variance machinery for the standard error
    at scale; the point estimate here is one scan + one 4-row grid."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cells = ev.select(
        F.when(F.col("user_id") % 2 == 1, 1).otherwise(0).alias("treated"),
        F.when(
            F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("post"),
        cents("value").alias("cents"),
    )
    grid = cells.groupBy("treated", "post").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    mean_of = lambda t, p: F.max(  # noqa: E731
        F.when(
            (F.col("treated") == t) & (F.col("post") == p),
            F.col("s").cast("double") / F.col("n"),
        )
    )
    wide = grid.agg(
        mean_of(1, 1).alias("t_post"),
        mean_of(1, 0).alias("t_pre"),
        mean_of(0, 1).alias("c_post"),
        mean_of(0, 0).alias("c_pre"),
        F.sum("n").alias("n_rows"),
    )
    return wide.select(
        "n_rows",
        F.round(F.col("t_post") / 100.0, 6).alias("treat_post_mean"),
        F.round(F.col("t_pre") / 100.0, 6).alias("treat_pre_mean"),
        F.round(F.col("c_post") / 100.0, 6).alias("ctrl_post_mean"),
        F.round(F.col("c_pre") / 100.0, 6).alias("ctrl_pre_mean"),
        F.round(
            (
                (F.col("t_post") - F.col("t_pre"))
                - (F.col("c_post") - F.col("c_pre"))
            )
            / 100.0,
            6,
        ).alias("did_estimate"),
    )


# Delta-method SE for a ratio-of-sums metric, pinned as shared SQL
# text (see _WELCH): var(X̄/Ȳ) ≈ (1/(n·ȳ²))·(s_x² − 2r·s_xy + r²·s_y²)
# with r = x̄/ȳ, all moments from exact integer sums.
_DELTA = """
ROUND((sx / sy), 6) AS ratio,
ROUND(
  sqrt(GREATEST(
    ((qx - sx * sx / n) / (n - 1)
     - 2 * (sx / sy) * ((pxy - sx * sy / n) / (n - 1))
     + (sx / sy) * (sx / sy) * ((qy - sy * sy / n) / (n - 1))
    ) / (n * (sy / n) * (sy / n)), 0.0)),
  6) AS ratio_se
"""


@register(
    "stats_ratio_delta_method",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * x) AS DOUBLE) AS qx,
         CAST(SUM(y * y) AS DOUBLE) AS qy,
         CAST(SUM(x * y) AS DOUBLE) AS pxy
  FROM per_user
)
SELECT CAST(n AS BIGINT) AS n_users,
       {_DELTA}
FROM m
""",
    tags=("stats", "agg"),
)
def stats_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO-METRIC standard error by the delta method — the
    experimentation-platform workhorse for per-user ratio metrics
    (purchase rate = Σx/Σy): user-level observations are the
    independence unit (a per-event binomial SE would be wrong —
    events within a user correlate), and the delta method expands
    var(x̄/ȳ) from the five exact user-level moment sums (Σx, Σy,
    Σx², Σy², Σxy) computed in ONE pass after the per-user rollup.
    The variance expression is pinned as shared SQL text (the
    _WELCH pattern) so both engines evaluate the identical double
    tree, 6dp; GREATEST(...,0) guards the sqrt against negative
    float dust. This is the SE that pairs with stats_ab_ttest for
    ratio metrics at 100 TB: one user-keyed agg + one 1-row agg."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("x"),
        F.count(F.lit(1)).alias("y"),
    )
    m = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("qx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("qy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("pxy"),
    )
    return m.selectExpr(
        "CAST(n AS BIGINT) AS n_users",
        *[e.strip() for e in _split_select_exprs(_DELTA)],
    )


@register(
    "agg_weighted_median",
    oracle="""
WITH v AS (
  SELECT l_returnflag,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS price_c,
         CAST(l_quantity AS BIGINT) AS w,
         l_orderkey, l_linenumber
  FROM lineitem
),
cum AS (
  SELECT l_returnflag, price_c, w,
         CAST(SUM(w) OVER (PARTITION BY l_returnflag
                ORDER BY price_c, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cw,
         CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
  FROM v
),
hit AS (
  SELECT l_returnflag, price_c, tw,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY cw, price_c) AS rk
  FROM cum WHERE 2 * cw >= tw
)
SELECT l_returnflag, CAST(tw AS BIGINT) AS total_weight,
       CAST(price_c AS BIGINT) AS weighted_median_cents
FROM hit WHERE rk = 1
""",
    tags=("agg", "stats"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median — the quantity-weighted 'typical price' where
    the plain median (agg_percentile_exact) treats a 1-unit and a
    50-unit line identically: the smallest price whose cumulative
    quantity reaches half the total, decided by the EXACT integer
    inequality 2·cum >= total (no per-group weight division, no
    float boundary — the ts_anomaly_exact trick applied to order
    statistics). The cumsum orders by (price, unique keys) so equal
    prices accumulate deterministically; the first qualifying row
    per group is the answer. One window + one rank over the same
    (returnflag) partitioning — at 100 TB this is the two-exchange
    sibling of the weighted average (agg_weighted_avg), and the
    partition-local window replaces a full sort of raw prices."""
    li = table(spark, sf_dir, "lineitem")
    v = li.select(
        "l_returnflag",
        cents("l_extendedprice").alias("price_c"),
        F.col("l_quantity").cast("bigint").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    wo = Window.partitionBy("l_returnflag").orderBy(
        "price_c", "l_orderkey", "l_linenumber"
    )
    wa = Window.partitionBy("l_returnflag")
    cum = v.select(
        "l_returnflag",
        "price_c",
        F.sum("w")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cw"),
        F.sum("w").over(wa).alias("tw"),
    )
    hit = cum.filter(2 * F.col("cw") >= F.col("tw")).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("l_returnflag").orderBy("cw", "price_c")
        ),
    )
    return hit.filter(F.col("rk") == 1).select(
        "l_returnflag",
        F.col("tw").alias("total_weight"),
        F.col("price_c").alias("weighted_median_cents"),
    )


@register(
    "agg_count_min_sketch",
    oracle="""
WITH pairs AS (
  SELECT 0 AS d, (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cms0'), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cms0'), 2, 1)) - 1) AS bucket FROM events
  UNION ALL
  SELECT 1 AS d, (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cms1'), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cms1'), 2, 1)) - 1) AS bucket FROM events
  UNION ALL
  SELECT 2 AS d, (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cms2'), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cms2'), 2, 1)) - 1) AS bucket FROM events
  UNION ALL
  SELECT 3 AS d, (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cms3'), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cms3'), 2, 1)) - 1) AS bucket FROM events
),
counters AS (
  SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM pairs GROUP BY d, bucket
),
exact AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM events GROUP BY user_id
),
qb AS (
  SELECT user_id, exact_n, 0 AS d, (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cms0'), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cms0'), 2, 1)) - 1) AS bucket FROM exact
  UNION ALL
  SELECT user_id, exact_n, 1 AS d, (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cms1'), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cms1'), 2, 1)) - 1) AS bucket FROM exact
  UNION ALL
  SELECT user_id, exact_n, 2 AS d, (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cms2'), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cms2'), 2, 1)) - 1) AS bucket FROM exact
  UNION ALL
  SELECT user_id, exact_n, 3 AS d, (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cms3'), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING) || ':cms3'), 2, 1)) - 1) AS bucket FROM exact
),
est AS (
  SELECT user_id, exact_n, MIN(c) AS cms_est
  FROM qb JOIN counters USING (d, bucket)
  GROUP BY user_id, exact_n
)
SELECT user_id, exact_n, cms_est, cms_est - exact_n AS overcount
FROM est ORDER BY exact_n DESC, user_id LIMIT 20
""",
    tags=("agg", "sketch"),
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH built and queried entirely in SQL — the
    mergeable frequency sketch for streams whose key space outgrows
    a hash-agg: depth 4 x width 256 integer counters, each row
    incrementing one bucket per depth (bucket = a deterministic md5
    byte of (key, depth) — no RNG, identical SQL text both engines),
    estimate = MIN over depths of the hit counters. The sketch is a
    CRDT: counters add across shards/windows (same (min, +) algebra
    dedup_exact_sharded pins for dedup), its size is CONSTANT (1024
    cells) regardless of stream length, and the one-sided error
    guarantee (estimate >= truth, overcount <= eN with prob 1-1/2^d)
    is visible in the checked output as `overcount >= 0`. Emitted:
    the top-20 hottest keys with exact vs sketch counts — the
    heavy-hitter readout a 100 TB event firehose can afford when the
    exact per-key table cannot fit anywhere. One explode pass +
    constant-size broadcast join; tests/test_property.py pins the
    error bound on every key, not just the top-20."""
    from ..operators.trainprep import MD5_BYTE

    ev = table(spark, sf_dir, "events")

    def bucket(d: int):
        return F.expr(
            MD5_BYTE(f"CAST(user_id AS STRING) || ':cms{d}'".format(d=d))
        )

    depth_cols = F.array(
        *[
            F.struct(F.lit(d).alias("d"), bucket(d).alias("bucket"))
            for d in range(4)
        ]
    )
    counters = (
        ev.select(F.explode(depth_cols).alias("p"))
        .select("p.d", "p.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    qb = exact.select(
        "user_id", "exact_n", F.explode(depth_cols).alias("p")
    ).select("user_id", "exact_n", "p.d", "p.bucket")
    est = (
        qb.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").alias("cms_est"))
    )
    return (
        est.select(
            "user_id",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy(F.col("exact_n").desc(), F.col("user_id").asc())
        .limit(20)
    )


@register(
    "stats_proportion_ztest",
    oracle="""
WITH counts AS (
  SELECT user_id,
         CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
           AS n_purch
  FROM events GROUP BY user_id
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users_all,
         CAST(SUM(n_purch) AS BIGINT) AS n_purch_all
  FROM counts
),
assign AS (
  -- converted = strictly above-MEAN purchaser (exact integer
  -- comparison c*U > T, no float mean) so the proportion is interior
  -- at every SF; all-converted fixtures made p_pool=1 and the pooled
  -- variance zero
  SELECT c.user_id, c.user_id % 2 AS variant,
         CASE WHEN c.n_purch * t.n_users_all > t.n_purch_all
              THEN 1 END AS converted
  FROM counts c CROSS JOIN tot t
),
cells AS (
  SELECT variant,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(COUNT(converted) AS BIGINT) AS n_converted
  FROM assign GROUP BY variant
),
w AS (
  SELECT
    MAX(CASE WHEN variant = 0 THEN n_users END) AS n0,
    MAX(CASE WHEN variant = 0 THEN n_converted END) AS c0,
    MAX(CASE WHEN variant = 1 THEN n_users END) AS n1,
    MAX(CASE WHEN variant = 1 THEN n_converted END) AS c1
  FROM cells
)
SELECT n0, c0, n1, c1,
       ROUND(CAST(c0 AS DOUBLE) / n0, 6) AS p0,
       ROUND(CAST(c1 AS DOUBLE) / n1, 6) AS p1,
       ROUND(
         (CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
         / NULLIF(sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                * (1.0 / n0 + 1.0 / n1)), 0.0), 6) AS z_score
FROM w
""",
    tags=("stats", "agg"),
)
def stats_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-PROPORTION Z-TEST on conversion — the A/B readout for
    binary outcomes (stats_ab_ttest's sibling for rates rather than
    means): variant = user_id parity (the deterministic assignment
    split_assign_hash generalizes), conversion = the user purchased
    at least once, z = (p0-p1)/sqrt(p_pool(1-p_pool)(1/n0+1/n1)).
    Every input to the float expression is an EXACT integer count
    (distinct-user cells via one user-keyed agg + left join), the
    pooled-variance formula is evaluated in one pinned expression
    tree on both engines, and ROUND 6 absorbs ulp drift — the
    fn_math contract applied to inference. Corpus-scale work is two
    user-keyed aggregates sharing their shuffle; the final pivot is
    a 2-row reduction (agg_global class)."""
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purch")
    )
    tot = counts.agg(
        F.count(F.lit(1)).alias("n_users_all"),
        F.sum("n_purch").alias("n_purch_all"),
    )
    # converted = strictly above-MEAN purchaser, compared in exact
    # integers (c*U > T) — interior proportions at every SF (an
    # everyone-converts definition makes the pooled variance zero)
    assign = counts.crossJoin(F.broadcast(tot)).select(
        "user_id",
        (F.col("user_id") % 2).alias("variant"),
        F.when(
            F.col("n_purch") * F.col("n_users_all") > F.col("n_purch_all"), 1
        ).alias("converted"),
    )
    cells = assign.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("converted").alias("n_converted"),
    )
    w = cells.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    return w.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(p0, 6).alias("p0"),
        F.round(p1, 6).alias("p1"),
        F.round(
            (p0 - p1)
            / F.nullif(
                F.sqrt(
                    pp * (F.lit(1.0) - pp)
                    * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("z_score"),
    )


@register(
    "agg_grouping_id",
    oracle="""
SELECT CASE WHEN GROUPING(o_orderstatus) = 1 AND GROUPING(o_orderpriority) = 1
            THEN 3
            WHEN GROUPING(o_orderpriority) = 1 THEN 1
            WHEN GROUPING(o_orderstatus) = 1 THEN 2
            ELSE 0 END AS gid,
       COALESCE(o_orderstatus, '<all>') AS o_orderstatus,
       COALESCE(o_orderpriority, '<all>') AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("agg",),
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() / grouping_id() disambiguation for CUBE rollups —
    the metadata that makes multi-level aggregates machine-readable:
    a NULL group key is ambiguous (real NULL vs 'all values'
    subtotal); grouping bits say which. Emitted gid = grouping_id(
    status, priority) (bit per key, status = high bit), with the
    COALESCE'd display keys and counts. The oracle derives the same
    id from per-column GROUPING() flags (DuckDB's GROUPING_ID arg
    order differs — deriving from the bits pins the SEMANTIC, not
    the engine's encoding). One CUBE hash-agg, 4 grouping sets in
    one pass — the agg_cube key's row expansion with its metadata
    made explicit."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        # grouping_id() must be computed IN the aggregate (it reads
        # the grouping-set bitmask, which no longer exists after)
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "gid",
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias(
                "o_orderpriority"
            ),
            "n_orders",
        )
    )


@register(
    "agg_listagg",
    oracle="""
SELECT n_regionkey,
       string_agg(n_name, '|' ORDER BY n_name) AS names_asc,
       string_agg(CASE WHEN n_nationkey % 2 = 0 THEN n_name END, '|'
                  ORDER BY n_name) AS even_names
FROM nation GROUP BY n_regionkey
""",
    tags=("agg",),
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI `LISTAGG ... WITHIN GROUP (ORDER BY ...)` (new in Spark
    4): ordered string aggregation as a FIRST-CLASS aggregate — the
    standard spelling of what agg_string_agg builds from
    collect_list + array_sort + array_join. The WITHIN GROUP order
    is part of the aggregate itself (deterministic under any
    shuffle order — exactly the property raw collect_list lacks),
    and NULLs are skipped per the standard (the even_names column
    pins that: odd-key names vanish, no empty separators). DuckDB's
    ordered string_agg is the oracle twin. One hash-agg; dictionary
    data (region->nations) so output is dim-sized."""
    table(spark, sf_dir, "nation").createOrReplaceTempView("_listagg_nation")
    return spark.sql(
        """
        SELECT n_regionkey,
               listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name)
                 AS names_asc,
               listagg(CASE WHEN n_nationkey % 2 = 0 THEN n_name END, '|')
                 WITHIN GROUP (ORDER BY n_name) AS even_names
        FROM _listagg_nation GROUP BY n_regionkey
        """
    )


@register(
    "stats_spearman_rank",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
           AS spend
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT c.c_mktsegment AS seg, c.c_custkey, c.c_acctbal, s.spend
  FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey
),
rk AS (
  SELECT seg,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY c_acctbal, c_custkey)
           AS rx,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY spend, c_custkey)
           AS ry
  FROM j
)
SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2,
       ROUND(1.0 - 6.0 * SUM((rx - ry) * (rx - ry))
                   / (CAST(COUNT(*) AS DOUBLE) *
                      (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE) - 1.0)),
             6) AS spearman_rho
FROM rk GROUP BY seg
""",
)
def stats_spearman_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per market segment between a
    customer's account balance and their lifetime spend — the robust
    (monotone-invariant) alternative to Pearson `corr` that survives
    the heavy-tailed distributions real revenue data has. Ranks are
    ROW_NUMBER with the customer key as tie-break (a pinned total
    order, so both engines assign identical ranks even on equal
    values), spend is an exact DECIMAL-cents sum, and rho comes from
    the classic 1 - 6*sum(d^2)/(n(n^2-1)) identity — sum(d^2) is a
    pure BIGINT aggregate (order-free), so the only float math is
    the one final expression, mirrored verbatim in the oracle.
    Scale: one agg shuffle by customer + two windows sharing one
    partition-by-segment exchange; no collect, no corr-state."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    spend = o.groupBy("o_custkey").agg(dec_sum("o_totalprice").alias("spend"))
    j = c.join(spend, c.c_custkey == spend.o_custkey).select(
        F.col("c_mktsegment").alias("seg"), "c_custkey", "c_acctbal", "spend"
    )
    w_x = Window.partitionBy("seg").orderBy("c_acctbal", "c_custkey")
    w_y = Window.partitionBy("seg").orderBy("spend", "c_custkey")
    rk = j.select(
        "seg",
        F.row_number().over(w_x).alias("rx"),
        F.row_number().over(w_y).alias("ry"),
    )
    d2 = (F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))
    agg = rk.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"), F.sum(d2).cast("bigint").alias("sum_d2")
    )
    n_d = F.col("n").cast("double")
    return agg.select(
        "seg",
        "n",
        "sum_d2",
        F.round(
            F.lit(1.0) - 6.0 * F.col("sum_d2") / (n_d * (n_d * n_d - 1.0)), 6
        ).alias("spearman_rho"),
    )


@register(
    "agg_trimmed_winsorized",
    oracle="""
WITH ranked AS (
  SELECT l_returnflag AS rf, l_extendedprice AS price,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS price_c,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey, l_linenumber)
           AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice DESC, l_orderkey DESC,
                                     l_linenumber DESC) AS rn_d,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
),
kd AS (SELECT *, n // 10 AS k FROM ranked),
bounds AS (
  SELECT rf,
         MAX(n) AS n, MAX(k) AS k,
         MAX(CASE WHEN rn_a = k + 1 THEN price_c END) AS lo_c,
         MAX(CASE WHEN rn_d = k + 1 THEN price_c END) AS hi_c,
         SUM(CASE WHEN rn_a > k AND rn_d > k THEN price_c ELSE 0 END)
           AS trim_sum_c
  FROM kd GROUP BY rf
),
wins AS (
  SELECT kd.rf,
         SUM(LEAST(GREATEST(kd.price_c, b.lo_c), b.hi_c)) AS win_sum_c
  FROM kd JOIN bounds b ON kd.rf = b.rf
  GROUP BY kd.rf
)
SELECT b.rf, CAST(b.n AS BIGINT) AS n, CAST(b.k AS BIGINT) AS k,
       CAST(b.lo_c AS DOUBLE) / 100.0 AS p_lo,
       CAST(b.hi_c AS DOUBLE) / 100.0 AS p_hi,
       ROUND(CAST(b.trim_sum_c AS DOUBLE) / 100.0 / (b.n - 2 * b.k), 4)
         AS trimmed_mean,
       ROUND(CAST(w.win_sum_c AS DOUBLE) / 100.0 / b.n, 4) AS winsorized_mean
FROM bounds b JOIN wins w ON b.rf = w.rf
""",
)
def agg_trimmed_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust means by ORDER STATISTICS: the 10%-trimmed mean (drop
    the k = floor(n/10) smallest and largest rows) and the
    winsorized mean (clamp them to the surviving extremes) of
    extended price per return flag. Rank-based trimming — never
    float quantile bounds — so membership of every row is pure
    integer logic on a pinned total order (price, orderkey,
    linenumber) and the whole computation is exact: prices live as
    DECIMAL cents, both means divide an exact BIGINT sum once at the
    end. Scale note: per-key sort windows over 3 giant groups is the
    exactness path; at 100 TB the documented swap is approx-quantile
    bounds + a filter (agg_approx_quantile), trading the sort for a
    sketch. The winsorize pass re-joins the 3-row bounds table
    broadcast-style, so the fact table streams through twice at
    most."""
    li = table(spark, sf_dir, "lineitem")
    w_a = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    w_d = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").desc(),
        F.col("l_linenumber").desc(),
    )
    w_n = Window.partitionBy("l_returnflag")
    kd = li.select(
        F.col("l_returnflag").alias("rf"),
        cents("l_extendedprice").alias("price_c"),
        F.row_number().over(w_a).alias("rn_a"),
        F.row_number().over(w_d).alias("rn_d"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    ).withColumn("k", F.expr("n DIV 10"))
    bounds = kd.groupBy("rf").agg(
        F.max("n").alias("n"),
        F.max("k").alias("k"),
        F.max(F.when(F.col("rn_a") == F.col("k") + 1, F.col("price_c"))).alias(
            "lo_c"
        ),
        F.max(F.when(F.col("rn_d") == F.col("k") + 1, F.col("price_c"))).alias(
            "hi_c"
        ),
        F.sum(
            F.when(
                (F.col("rn_a") > F.col("k")) & (F.col("rn_d") > F.col("k")),
                F.col("price_c"),
            ).otherwise(F.lit(0))
        ).alias("trim_sum_c"),
    )
    wins = (
        kd.join(F.broadcast(bounds.select("rf", "lo_c", "hi_c")), "rf")
        .groupBy("rf")
        .agg(
            F.sum(
                F.least(F.greatest(F.col("price_c"), F.col("lo_c")), F.col("hi_c"))
            ).alias("win_sum_c")
        )
    )
    return bounds.join(wins, "rf").select(
        "rf",
        F.col("n").cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("k"),
        (F.col("lo_c").cast("double") / 100.0).alias("p_lo"),
        (F.col("hi_c").cast("double") / 100.0).alias("p_hi"),
        F.round(
            F.col("trim_sum_c").cast("double")
            / 100.0
            / (F.col("n") - 2 * F.col("k")),
            4,
        ).alias("trimmed_mean"),
        F.round(F.col("win_sum_c").cast("double") / 100.0 / F.col("n"), 4).alias(
            "winsorized_mean"
        ),
    )


@register(
    "stats_kendall_tau",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS spend_c
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT c.c_mktsegment AS seg, c.c_custkey,
         CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) AS bal_c, s.spend_c
  FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey
),
rk AS (
  SELECT seg, c_custkey,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY bal_c, c_custkey) AS rx,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY spend_c, c_custkey) AS ry
  FROM j
),
pairs AS (
  SELECT a.seg,
         CASE WHEN (a.rx - b.rx) * (a.ry - b.ry) > 0 THEN 1 ELSE 0 END AS conc
  FROM rk a JOIN rk b
    ON a.seg = b.seg AND a.c_custkey < b.c_custkey
)
SELECT seg,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(conc) AS BIGINT) AS concordant,
       CAST(COUNT(*) - SUM(conc) AS BIGINT) AS discordant,
       ROUND((CAST(SUM(conc) AS DOUBLE) - (COUNT(*) - SUM(conc)))
             / COUNT(*), 6) AS kendall_tau
FROM pairs GROUP BY seg
""",
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL'S TAU per market segment over the same (balance,
    spend) pairs as stats_spearman_rank — the pair-concordance rank
    correlation (more robust to outlier ranks than Spearman, the
    standard for small-n agreement). Ranks come from a pinned total
    order (no ties by construction), so concordance is pure integer
    sign logic; tau = (C - D) / n_pairs is the single float op,
    mirrored verbatim. Scale: the O(n^2) pair join is BLOCKED per
    segment key (a self-equi-join on seg — one co-partitioned
    shuffle, never a global cross); the documented big-n swap is the
    O(n log n) merge-sort inversion count over the rank permutation,
    sharded by segment."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    spend = o.groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).alias("spend_c")
    )
    j = c.join(spend, c.c_custkey == spend.o_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        "c_custkey",
        cents("c_acctbal").alias("bal_c"),
        "spend_c",
    )
    w_x = Window.partitionBy("seg").orderBy("bal_c", "c_custkey")
    w_y = Window.partitionBy("seg").orderBy("spend_c", "c_custkey")
    rk = j.select(
        "seg",
        "c_custkey",
        F.row_number().over(w_x).alias("rx"),
        F.row_number().over(w_y).alias("ry"),
    )
    b = rk.select(
        F.col("seg").alias("b_seg"),
        F.col("c_custkey").alias("b_key"),
        F.col("rx").alias("b_rx"),
        F.col("ry").alias("b_ry"),
    )
    pairs = rk.join(
        b,
        (F.col("seg") == F.col("b_seg")) & (F.col("c_custkey") < F.col("b_key")),
    ).select(
        "seg",
        F.when(
            (F.col("rx") - F.col("b_rx")) * (F.col("ry") - F.col("b_ry")) > 0, 1
        )
        .otherwise(0)
        .alias("conc"),
    )
    agg = pairs.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("conc").cast("bigint").alias("concordant"),
    )
    return agg.select(
        "seg",
        "n_pairs",
        "concordant",
        (F.col("n_pairs") - F.col("concordant")).cast("bigint").alias("discordant"),
        F.round(
            (
                F.col("concordant").cast("double")
                - (F.col("n_pairs") - F.col("concordant"))
            )
            / F.col("n_pairs"),
            6,
        ).alias("kendall_tau"),
    )


@register(
    "agg_geo_harmonic_mean",
    oracle="""
WITH t AS (
  SELECT l_returnflag AS rf,
         CAST(ROUND(LN(l_extendedprice) * 1000000000, 0) AS BIGINT) AS ln_q,
         CAST(ROUND(1000000000000.0 / l_extendedprice, 0) AS BIGINT) AS inv_q
  FROM lineitem
)
SELECT rf, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(EXP(CAST(SUM(ln_q) AS DOUBLE) / 1000000000.0 / COUNT(*)), 4)
         AS geo_mean,
       ROUND(CAST(COUNT(*) AS DOUBLE) * 1000000000000.0 / SUM(inv_q), 4)
         AS harmonic_mean
FROM t GROUP BY rf
""",
)
def agg_geo_harmonic_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOMETRIC and HARMONIC means per return flag — the two
    Pythagorean means the suite lacked (geometric: the right average
    for ratios/growth factors; harmonic: for rates). Both are
    sums of transforms, so both get the repo's quantized-BIGINT
    treatment: ln(x) and 1/x are computed per row (identical IEEE
    inputs on both engines), quantized to integer lanes (1e9 / 1e12
    scales), and summed order-free; EXP and the final divisions run
    once per 3-row output. Scan-local transform + one partial+final
    hash agg — the agg_pricing_summary shape."""
    li = table(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_returnflag").alias("rf"),
        F.round(F.log("l_extendedprice") * 1000000000, 0)
        .cast("bigint")
        .alias("ln_q"),
        F.round(F.lit(1000000000000.0) / F.col("l_extendedprice"), 0)
        .cast("bigint")
        .alias("inv_q"),
    )
    return t.groupBy("rf").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(
            F.exp(
                F.sum("ln_q").cast("double") / 1000000000.0 / F.count(F.lit(1))
            ),
            4,
        ).alias("geo_mean"),
        F.round(
            F.count(F.lit(1)).cast("double")
            * 1000000000000.0
            / F.sum("inv_q"),
            4,
        ).alias("harmonic_mean"),
    )


@register(
    "ts_yoy_cagr",
    oracle="""
WITH yearly AS (
  SELECT c.c_mktsegment AS seg,
         CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
           / 100.0 AS rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY seg, yr
),
g AS (
  SELECT seg, yr, rev,
         LAG(rev) OVER (PARTITION BY seg ORDER BY yr) AS prev_rev
  FROM yearly
)
SELECT seg,
       CAST(COUNT(*) AS BIGINT) AS n_years,
       CAST(MIN(yr) AS BIGINT) AS first_yr,
       CAST(MAX(yr) AS BIGINT) AS last_yr,
       ROUND(CAST(SUM(CASE WHEN prev_rev IS NOT NULL THEN
               CAST(ROUND((rev / prev_rev - 1.0) * 1000000000, 0) AS BIGINT)
             ELSE 0 END) AS DOUBLE)
             / 1000000000.0 / (COUNT(*) - 1), 6) AS avg_yoy_growth,
       ROUND(POW(MAX(CASE WHEN yr_rank = 'last' THEN rev END) /
                 MAX(CASE WHEN yr_rank = 'first' THEN rev END),
                 1.0 / (MAX(yr) - MIN(yr))) - 1.0, 6) AS cagr
FROM (
  SELECT *, CASE WHEN yr = MIN(yr) OVER (PARTITION BY seg) THEN 'first'
                 WHEN yr = MAX(yr) OVER (PARTITION BY seg) THEN 'last'
            END AS yr_rank
  FROM g
)
GROUP BY seg
""",
)
def ts_yoy_cagr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROWTH ACCOUNTING per segment: average year-over-year growth
    (each ratio quantized to a BIGINT lane before the order-free
    sum) and CAGR — the compound rate (last/first)^(1/years) - 1
    every revenue review quotes. Yearly revenue is an exact
    DECIMAL-cents sum; first/last years come from min/max windows
    (pinned, no sort ambiguity); POW runs once per 5-row output.
    One fact-table agg + one tiny window over segment-year rows."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    yearly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(dec_sum("o_totalprice").alias("rev"))
    )
    w = Window.partitionBy("seg").orderBy("yr")
    w_seg = Window.partitionBy("seg")
    g = yearly.select(
        "seg",
        "yr",
        "rev",
        F.lag("rev").over(w).alias("prev_rev"),
        F.when(F.col("yr") == F.min("yr").over(w_seg), "first")
        .when(F.col("yr") == F.max("yr").over(w_seg), "last")
        .alias("yr_rank"),
    )
    growth_q = F.when(
        F.col("prev_rev").isNotNull(),
        F.round((F.col("rev") / F.col("prev_rev") - 1.0) * 1000000000, 0).cast(
            "bigint"
        ),
    ).otherwise(F.lit(0))
    return g.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_years"),
        F.min("yr").alias("first_yr"),
        F.max("yr").alias("last_yr"),
        F.round(
            F.sum(growth_q).cast("double")
            / 1000000000.0
            / (F.count(F.lit(1)) - 1),
            6,
        ).alias("avg_yoy_growth"),
        F.round(
            F.pow(
                F.max(F.when(F.col("yr_rank") == "last", F.col("rev")))
                / F.max(F.when(F.col("yr_rank") == "first", F.col("rev"))),
                1.0 / (F.max("yr") - F.min("yr")),
            )
            - 1.0,
            6,
        ).alias("cagr"),
    )


@register(
    "stats_price_elasticity",
    oracle="""
WITH t AS (
  SELECT p.p_brand AS brand,
         CAST(ROUND(LN(l.l_extendedprice / l.l_quantity) * 1000000000, 0)
              AS BIGINT) AS lx_q,
         CAST(ROUND(LN(l.l_quantity) * 1000000000, 0) AS BIGINT) AS ly_q
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND((CAST(COUNT(*) AS DOUBLE) * SUM(CAST(lx_q AS DOUBLE) / 1000000000.0
                                             * (CAST(ly_q AS DOUBLE) / 1000000000.0))
              - (CAST(SUM(lx_q) AS DOUBLE) / 1000000000.0)
                * (CAST(SUM(ly_q) AS DOUBLE) / 1000000000.0))
             / (CAST(COUNT(*) AS DOUBLE) * SUM((CAST(lx_q AS DOUBLE) / 1000000000.0)
                                               * (CAST(lx_q AS DOUBLE) / 1000000000.0))
                - (CAST(SUM(lx_q) AS DOUBLE) / 1000000000.0)
                  * (CAST(SUM(lx_q) AS DOUBLE) / 1000000000.0)), 6)
         AS elasticity
FROM t GROUP BY brand
""",
)
def stats_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE ELASTICITY OF DEMAND per brand — the log-log OLS slope
    d ln(qty)/d ln(unit price), the econometric readout pricing
    teams actually fit. Unit price and quantity pass through LN
    once per row and are QUANTIZED to BIGINT lanes (identical IEEE
    inputs on both engines, so the lanes agree bit-for-bit); the
    cross/spread moments then accumulate as sums of exact lane
    products (each product reconstructed in double identically on
    both sides — the lanes pin the inputs, the moment sums inherit
    determinism because every summand is identical), and the slope
    is one closed-form expression at 6dp. One join + one hash agg;
    25-row output. Note the moment sums here are double sums of
    identical summands — commutative-addition drift is absorbed by
    the 6dp round, and the lane quantization is what guarantees the
    summands themselves can never differ."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    t = li.join(p, li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.round(
            F.log(F.col("l_extendedprice") / F.col("l_quantity")) * 1000000000, 0
        )
        .cast("bigint")
        .alias("lx_q"),
        F.round(F.log("l_quantity") * 1000000000, 0).cast("bigint").alias("ly_q"),
    )
    lx = F.col("lx_q").cast("double") / 1000000000.0
    ly = F.col("ly_q").cast("double") / 1000000000.0
    agg = t.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(lx * ly).alias("sxy"),
        F.sum("lx_q").alias("sx_q"),
        F.sum("ly_q").alias("sy_q"),
        F.sum(lx * lx).alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx_q").cast("double") / 1000000000.0
    sy_d = F.col("sy_q").cast("double") / 1000000000.0
    return agg.select(
        "brand",
        "n",
        F.round(
            (n_d * F.col("sxy") - sx_d * sy_d) / (n_d * F.col("sxx") - sx_d * sx_d),
            6,
        ).alias("elasticity"),
    )


@register(
    "stats_mann_whitney_u",
    oracle="""
WITH f AS (
  SELECT CAST(l_quantity AS BIGINT) AS q, l_returnflag AS fl
  FROM lineitem WHERE l_returnflag IN ('R', 'A')
),
hist AS (
  SELECT q,
         SUM(CASE WHEN fl = 'R' THEN 1 ELSE 0 END) AS n1_v,
         SUM(CASE WHEN fl = 'A' THEN 1 ELSE 0 END) AS n2_v
  FROM f GROUP BY q
),
cum AS (
  SELECT n1_v, n2_v, n1_v + n2_v AS t_v,
         COALESCE(SUM(n1_v + n2_v) OVER (
           ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_t
  FROM hist
),
lanes AS (
  SELECT CAST(SUM(n1_v) AS BIGINT) AS n1,
         CAST(SUM(n2_v) AS BIGINT) AS n2,
         CAST(SUM(n1_v * (2 * cum_t + t_v + 1)) AS BIGINT) AS r1_2,
         CAST(SUM(t_v * t_v * t_v - t_v) AS BIGINT) AS tie_sum
  FROM cum
)
SELECT n1, n2,
       CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
       ROUND(
         CAST(r1_2 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
         / (2.0 * SQRT(
             CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
             * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                - CAST(tie_sum AS DOUBLE)
                  / (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1.0)))
           )),
         6
       ) AS z_stat
FROM lanes
""",
)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U rank-sum test (tie-corrected normal
    approximation) — the nonparametric two-sample location test an
    experimentation platform reaches for when distributions are
    skewed and a t-test's normality assumption fails: here, do
    returned ('R') and accepted ('A') line items differ in quantity?
    The naive formulation ranks every row globally (a full sort and
    an order-dependent tie mess); the scalable identity works on the
    VALUE HISTOGRAM instead: with t_v rows tied at value v and
    cum_t rows below it, every group-1 row at v has average rank
    cum_t + (t_v+1)/2, so 2*R1 = sum n1_v*(2*cum_t + t_v + 1) stays
    exact integer arithmetic on a domain-sized grid (50 quantity
    levels regardless of row count). The tie-corrected variance
    sigma^2 = n1*n2/12 * ((n+1) - sum(t^3-t)/(n(n-1))) comes from the
    same grid. One fact-scan hash-agg -> exclusive grid cumsum (round
    8: on the two-pass global_cumsum, so even a value DOMAIN that
    grows with the corpus never funnels the grid through one task)
    -> 1-row reduce; at 100 TB only the histogram shuffles."""
    from ..operators.trainprep import global_cumsum  # noqa: PLC0415

    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
    )
    hist = li.groupBy(
        F.col("l_quantity").cast("bigint").alias("q")
    ).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n1_v"),
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0)).alias("n2_v"),
    )
    hist = hist.withColumn("t_v", F.col("n1_v") + F.col("n2_v"))
    cum = global_cumsum(hist, "q", "t_v", 8, out_col="cum_t")
    lanes = cum.agg(
        F.sum("n1_v").cast("bigint").alias("n1"),
        F.sum("n2_v").cast("bigint").alias("n2"),
        F.sum(
            F.col("n1_v") * (2 * F.col("cum_t") + F.col("t_v") + 1)
        )
        .cast("bigint")
        .alias("r1_2"),
        F.sum(F.col("t_v") * F.col("t_v") * F.col("t_v") - F.col("t_v"))
        .cast("bigint")
        .alias("tie_sum"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    n_d = (n1 + n2).cast("double")
    var = (
        n1.cast("double") * n2.cast("double") / 12.0
        * ((n_d + 1.0) - F.col("tie_sum").cast("double") / (n_d * (n_d - 1.0)))
    )
    return lanes.select(
        "n1",
        "n2",
        ((F.col("r1_2") - n1 * (n1 + 1)).cast("double") / 2.0).alias("u1"),
        F.round(
            (F.col("r1_2") - n1 * (n1 + 1) - n1 * n2).cast("double")
            / (2.0 * F.sqrt(var)),
            6,
        ).alias("z_stat"),
    )


@register(
    "stats_ks_2sample",
    oracle="""
WITH f AS (
  SELECT value, event_type FROM events
  WHERE event_type IN ('purchase', 'click')
),
hist AS (
  SELECT value,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n1_v,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n2_v
  FROM f GROUP BY value
),
cum AS (
  SELECT SUM(n1_v) OVER (
           ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS c1,
         SUM(n2_v) OVER (
           ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS c2
  FROM hist
),
tot AS (
  SELECT CAST(SUM(n1_v) AS BIGINT) AS n1, CAST(SUM(n2_v) AS BIGINT) AS n2
  FROM hist
)
SELECT n1, n2,
       CAST(MAX(ABS(c1 * n2 - c2 * n1)) AS BIGINT) AS d_num,
       ROUND(CAST(MAX(ABS(c1 * n2 - c2 * n1)) AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS d_stat
FROM cum CROSS JOIN tot
GROUP BY n1, n2
""",
)
def stats_ks_2sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SAMPLE KOLMOGOROV-SMIRNOV D statistic — the standard
    "did the distribution shift?" test between purchase and click
    event values, computed EXACTLY as a rational number: at each
    pooled distinct value the ECDF gap |F1 - F2| equals
    |c1*n2 - c2*n1| / (n1*n2), so the max runs entirely in BIGINT
    integer arithmetic (no float ECDFs to drift) with one double
    division at the end. Distinct-value histogram -> cumulative grid
    sums (round 8: both ECDF lanes run on the two-pass global_cumsum
    — the distinct-value grid grows with the corpus for continuous
    values, so the former single-partition window was this key's one
    scale hole; inclusive = exclusive + own row) -> 1-row broadcast
    of totals crossed in -> exact max. The same grid pattern as the
    AUC and Mann-Whitney keys: at 100 TB only distinct values
    shuffle, and a production variant would pre-bin values to a
    bounded grid (the statistic is then exact on the binned
    distribution)."""
    from ..operators.trainprep import global_cumsum  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    hist = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n1_v"
        ),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "n2_v"
        ),
    )
    cum = global_cumsum(hist, "value", "n1_v", 16, out_col="e1")
    cum = global_cumsum(cum, "value", "n2_v", 16, out_col="e2")
    cum = cum.select(
        (F.col("e1") + F.col("n1_v")).alias("c1"),
        (F.col("e2") + F.col("n2_v")).alias("c2"),
    )
    tot = hist.agg(
        F.sum("n1_v").cast("bigint").alias("n1"),
        F.sum("n2_v").cast("bigint").alias("n2"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    gap = F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
    return j.groupBy("n1", "n2").agg(
        F.max(gap).cast("bigint").alias("d_num"),
        F.round(
            F.max(gap).cast("double")
            / (F.col("n1").cast("double") * F.col("n2").cast("double")),
            6,
        ).alias("d_stat"),
    )


@register(
    "stats_cohens_d",
    oracle="""
WITH seg AS (
  SELECT r.r_name AS region,
         c.c_mktsegment AS seg,
         CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) AS bal_c
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
),
lanes AS (
  SELECT region,
         CAST(SUM(CASE WHEN seg = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN seg = 'AUTOMOBILE' THEN bal_c ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN seg = 'AUTOMOBILE' THEN bal_c * bal_c ELSE 0 END) AS BIGINT) AS ss1,
         CAST(SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN seg = 'BUILDING' THEN bal_c ELSE 0 END) AS BIGINT) AS s2,
         CAST(SUM(CASE WHEN seg = 'BUILDING' THEN bal_c * bal_c ELSE 0 END) AS BIGINT) AS ss2
  FROM seg GROUP BY region
)
SELECT region, n1, n2,
       ROUND(
         (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
          - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
         / SQRT(
             ((CAST(ss1 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
              + (CAST(ss2 AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
             / CAST(n1 + n2 - 2 AS DOUBLE)
           ),
         6
       ) AS cohens_d
FROM lanes
WHERE n1 >= 2 AND n2 >= 2
""",
)
def stats_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S d EFFECT SIZE per region — the standardized mean
    difference (pooled-SD form) that turns an A/B readout from
    "p < 0.05" into "how big is the effect": here, AUTOMOBILE vs
    BUILDING segment account balances. All moments accumulate as
    EXACT integer cents lanes (sum, sum-of-squares as BIGINT in one
    conditional hash-agg pass), so the double reconstruction
    (mean1 - mean2) / sqrt(pooled within-group variance) is the same
    closed-form expression on identical inputs on both engines.
    Dimension joins broadcast; one partial+final hash agg on region;
    the only caveat at extreme scale is the BIGINT cents^2 lane
    (~9e18 overflow at ~10^6 x current per-group mass — swap to the
    DECIMAL(38,0) lane pattern from embedding_pca_power then)."""
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
    )
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    seg = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.col("c_mktsegment").alias("seg"),
            cents("c_acctbal").alias("bal_c"),
        )
    )
    is1 = F.col("seg") == "AUTOMOBILE"
    bal = F.col("bal_c")
    lanes = seg.groupBy("region").agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(is1, bal).otherwise(0)).cast("bigint").alias("s1"),
        F.sum(F.when(is1, bal * bal).otherwise(0)).cast("bigint").alias("ss1"),
        F.sum(F.when(~is1, 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(~is1, bal).otherwise(0)).cast("bigint").alias("s2"),
        F.sum(F.when(~is1, bal * bal).otherwise(0)).cast("bigint").alias("ss2"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    ss_within = (F.col("ss1").cast("double") - s1d * s1d / n1d) + (
        F.col("ss2").cast("double") - s2d * s2d / n2d
    )
    pooled_var = ss_within / (F.col("n1") + F.col("n2") - 2).cast("double")
    return lanes.filter((F.col("n1") >= 2) & (F.col("n2") >= 2)).select(
        "region",
        "n1",
        "n2",
        F.round((s1d / n1d - s2d / n2d) / F.sqrt(pooled_var), 6).alias(
            "cohens_d"
        ),
    )


# Shared Abramowitz-Stegun 7.1.26 rational tail for the standard
# normal CDF: both engines evaluate the IDENTICAL polynomial-in-t
# times exp(-z^2/2)/sqrt(2*pi), so the only transcendental is EXP;
# the resulting two-sided p is quantized to a 1e-12 lane before any
# ordering/compare (same discipline as the LN-based keys).
_SQL_NORM_P2 = (
    "2.0 * (EXP(-(ABS({z}) * ABS({z})) / 2.0) * 0.3989422804014327)"
    " * ((1.0 / (1.0 + 0.2316419 * ABS({z})))"
    " * (0.319381530 + (1.0 / (1.0 + 0.2316419 * ABS({z})))"
    " * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * ABS({z})))"
    " * (1.781477937 + (1.0 / (1.0 + 0.2316419 * ABS({z})))"
    " * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * ABS({z})))"
    " * 1.330274429)))))"
)


def _norm_p2(z: F.Column) -> F.Column:
    """Two-sided normal p-value, A&S 7.1.26 — mirrors _SQL_NORM_P2
    term-for-term (same association order) so both engines produce
    bit-identical doubles from the same z."""
    x = F.abs(z)
    t = 1.0 / (1.0 + 0.2316419 * x)
    pdf = F.exp(-(x * x) / 2.0) * 0.3989422804014327
    poly = t * (
        0.319381530
        + t
        * (
            -0.356563782
            + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))
        )
    )
    return 2.0 * pdf * poly


@register(
    "stats_bh_fdr",
    oracle="""
WITH j AS (
  SELECT p.p_brand AS brand,
         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS is_ret
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
per AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM(is_ret) AS BIGINT) AS x_b
  FROM j GROUP BY brand
),
tot AS (
  SELECT CAST(SUM(n_b) AS BIGINT) AS n_tot, CAST(SUM(x_b) AS BIGINT) AS x_tot
  FROM per
),
z AS (
  SELECT brand, n_b, x_b,
         (CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)
          - CAST(x_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
         / SQRT((CAST(x_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
                * (1.0 - CAST(x_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
                / CAST(n_b AS DOUBLE)) AS zv
  FROM per CROSS JOIN tot
),
pq AS (
  SELECT brand, n_b, x_b, zv,
         CAST(ROUND((__P2__) * 1000000000000.0, 0) AS BIGINT) AS p_q
  FROM z
),
ranked AS (
  SELECT brand, n_b, x_b, zv, p_q,
         (CAST(p_q AS DOUBLE) / 1000000000000.0)
         * CAST(COUNT(*) OVER () AS DOUBLE)
         / CAST(ROW_NUMBER() OVER (ORDER BY p_q, brand) AS DOUBLE) AS raw
  FROM pq
),
adj AS (
  SELECT brand, n_b, x_b, zv, p_q,
         MIN(raw) OVER (ORDER BY p_q, brand
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p_adj_raw
  FROM ranked
)
SELECT brand, n_b, x_b, ROUND(zv, 6) AS z_stat, p_q,
       ROUND(LEAST(p_adj_raw, 1.0), 9) AS p_adj,
       LEAST(p_adj_raw, 1.0) <= 0.05 AS reject
FROM adj
""".replace("__P2__", _SQL_NORM_P2.format(z="zv")),
)
def stats_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENJAMINI-HOCHBERG FDR correction over a family of per-brand
    two-proportion z-tests (brand return rate vs the pooled rate) —
    the multiple-testing control every metrics platform needs the
    moment it tests 25 brands at once (at alpha=.05, ~1.25 false
    positives are expected uncorrected). Counts are exact integers;
    z is one closed-form double; the two-sided p-value uses the
    shared Abramowitz-Stegun normal-CDF polynomial (identical
    term order on both engines) and is QUANTIZED to a 1e-12 BIGINT
    lane before any ordering, so the BH sort key (p_q, brand) is
    deterministic. The step-up adjusted p is the reverse running
    min of p*(m/rank) over the hypothesis family — and round 9 runs
    the whole ladder on the two-pass machinery (global_rank for the
    BH rank, global_running_min in DESCENDING order for the step-up
    suffix min, a broadcast 1-row family count for m), so even a
    family whose size grows with the catalog (per-SKU tests, not 25
    brands) never funnels through one task: the last
    single-partition-exchange waiver cleared by real rewrite.
    Rejections at q=.05."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_ret"),
    )
    per = j.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("is_ret").cast("bigint").alias("x_b"),
    )
    tot = per.agg(
        F.sum("n_b").cast("bigint").alias("n_tot"),
        F.sum("x_b").cast("bigint").alias("x_tot"),
    )
    z = per.crossJoin(F.broadcast(tot))
    p0 = F.col("x_tot").cast("double") / F.col("n_tot").cast("double")
    zv = (
        F.col("x_b").cast("double") / F.col("n_b").cast("double") - p0
    ) / F.sqrt(p0 * (1.0 - p0) / F.col("n_b").cast("double"))
    pq = z.select(
        "brand",
        "n_b",
        "x_b",
        zv.alias("zv"),
        F.round(_norm_p2(zv) * 1000000000000.0, 0).cast("bigint").alias("p_q"),
    )
    from ..operators.scale import global_rank, global_running_min  # noqa: PLC0415

    m_tot = pq.agg(F.count(F.lit(1)).cast("bigint").alias("__m"))
    ranked = (
        global_rank(
            pq, [F.col("p_q").asc(), F.col("brand").asc()], rank_col="__rnk"
        )
        .crossJoin(F.broadcast(m_tot))
        .withColumn(
            "raw",
            (F.col("p_q").cast("double") / 1000000000000.0)
            * F.col("__m").cast("double")
            / F.col("__rnk").cast("double"),
        )
        .drop("__rnk", "__m")
    )
    # BH step-up: suffix min in (p_q, brand) order == running min in
    # the REVERSE order — two-pass, never a single-partition window.
    adj = global_running_min(
        ranked,
        [F.col("p_q").desc(), F.col("brand").desc()],
        "raw",
        out_col="p_adj_raw",
    ).drop("raw")
    return adj.select(
        "brand",
        "n_b",
        "x_b",
        F.round("zv", 6).alias("z_stat"),
        "p_q",
        F.round(F.least(F.col("p_adj_raw"), F.lit(1.0)), 9).alias("p_adj"),
        (F.least(F.col("p_adj_raw"), F.lit(1.0)) <= 0.05).alias("reject"),
    )


# One-sided upper-tail survival P(Z >= z) for a possibly-negative z,
# built from the same A&S 7.1.26 tail: for z >= 0 the tail formula
# applies directly; for z < 0 it is 1 - tail(|z|). Shared by the
# TOST key; same quantize-after-EXP discipline as _SQL_NORM_P2.
_SQL_NORM_TAIL = (
    "CASE WHEN ({z}) >= 0.0 THEN " + _SQL_NORM_P2 + " / 2.0"
    " ELSE 1.0 - (" + _SQL_NORM_P2 + " / 2.0) END"
)


def _norm_tail(z: F.Column) -> F.Column:
    """P(Z >= z), mirroring _SQL_NORM_TAIL term-for-term."""
    half = _norm_p2(z) / 2.0
    return F.when(z >= 0.0, half).otherwise(1.0 - half)


@register(
    "stats_tost_equivalence",
    oracle="""
WITH seg AS (
  SELECT r.r_name AS region,
         c.c_mktsegment AS seg,
         CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) AS bal_c
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
),
lanes AS (
  SELECT region,
         CAST(SUM(CASE WHEN seg = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN seg = 'AUTOMOBILE' THEN bal_c ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN seg = 'AUTOMOBILE' THEN bal_c * bal_c ELSE 0 END) AS BIGINT) AS ss1,
         CAST(SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN seg = 'BUILDING' THEN bal_c ELSE 0 END) AS BIGINT) AS s2,
         CAST(SUM(CASE WHEN seg = 'BUILDING' THEN bal_c * bal_c ELSE 0 END) AS BIGINT) AS ss2
  FROM seg GROUP BY region
),
z AS (
  SELECT region, n1, n2,
         (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
          - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) AS diff_c,
         SQRT(((CAST(ss1 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
               + (CAST(ss2 AS DOUBLE)
                  - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
              / CAST(n1 + n2 - 2 AS DOUBLE)
              * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))) AS se_c
  FROM lanes WHERE n1 >= 2 AND n2 >= 2
),
pq AS (
  SELECT region, n1, n2, diff_c,
         CAST(ROUND((__TAIL_LOW__) * 1000000000000.0, 0) AS BIGINT) AS p_low_q,
         CAST(ROUND((__TAIL_UP__) * 1000000000000.0, 0) AS BIGINT) AS p_up_q
  FROM z
)
SELECT region, n1, n2,
       ROUND(diff_c / 100.0, 4) AS mean_diff,
       GREATEST(p_low_q, p_up_q) AS p_tost_q,
       GREATEST(p_low_q, p_up_q) <= 50000000000 AS equivalent
FROM pq
""".replace(
        "__TAIL_LOW__",
        _SQL_NORM_TAIL.replace("{z}", "((diff_c + 20000.0) / se_c)").format(
            z="((diff_c + 20000.0) / se_c)"
        ),
    ).replace(
        "__TAIL_UP__",
        _SQL_NORM_TAIL.replace("{z}", "((20000.0 - diff_c) / se_c)").format(
            z="((20000.0 - diff_c) / se_c)"
        ),
    ),
)
def stats_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST EQUIVALENCE TEST (two one-sided tests) per region — the
    test a migration/neutral-change review actually needs: not "is
    there a difference?" but "can we CONFIRM the difference is
    inside +/-$200?" — absence of significance is NOT evidence of
    equivalence, TOST is. Reuses the exact integer moment lanes of
    the Cohen's-d key for the mean difference and pooled SE, pushes
    both one-sided z's through the shared A&S normal tail (identical
    polynomial on both engines), QUANTIZES each p to a 1e-12 lane,
    and declares equivalence when max(p_lower, p_upper) <= .05 —
    computed entirely on the lanes, so the verdict bit is engine-
    exact. One conditional hash-agg on region; dims broadcast."""
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
    )
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    seg = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.col("c_mktsegment").alias("seg"),
            cents("c_acctbal").alias("bal_c"),
        )
    )
    is1 = F.col("seg") == "AUTOMOBILE"
    bal = F.col("bal_c")
    lanes = seg.groupBy("region").agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(is1, bal).otherwise(0)).cast("bigint").alias("s1"),
        F.sum(F.when(is1, bal * bal).otherwise(0)).cast("bigint").alias("ss1"),
        F.sum(F.when(~is1, 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(~is1, bal).otherwise(0)).cast("bigint").alias("s2"),
        F.sum(F.when(~is1, bal * bal).otherwise(0)).cast("bigint").alias("ss2"),
    ).filter((F.col("n1") >= 2) & (F.col("n2") >= 2))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    diff_c = s1d / n1d - s2d / n2d
    se_c = F.sqrt(
        (
            (F.col("ss1").cast("double") - s1d * s1d / n1d)
            + (F.col("ss2").cast("double") - s2d * s2d / n2d)
        )
        / (F.col("n1") + F.col("n2") - 2).cast("double")
        * (1.0 / n1d + 1.0 / n2d)
    )
    z = lanes.select(
        "region", "n1", "n2", diff_c.alias("diff_c"), se_c.alias("se_c")
    )
    p_low_q = (
        F.round(
            _norm_tail((F.col("diff_c") + 20000.0) / F.col("se_c"))
            * 1000000000000.0,
            0,
        )
        .cast("bigint")
    )
    p_up_q = (
        F.round(
            _norm_tail((20000.0 - F.col("diff_c")) / F.col("se_c"))
            * 1000000000000.0,
            0,
        )
        .cast("bigint")
    )
    pq = z.select(
        "region",
        "n1",
        "n2",
        "diff_c",
        p_low_q.alias("p_low_q"),
        p_up_q.alias("p_up_q"),
    )
    p_tost = F.greatest(F.col("p_low_q"), F.col("p_up_q"))
    return pq.select(
        "region",
        "n1",
        "n2",
        F.round(F.col("diff_c") / 100.0, 4).alias("mean_diff"),
        p_tost.alias("p_tost_q"),
        (p_tost <= 50000000000).alias("equivalent"),
    )


@register(
    "stats_mann_kendall_trend",
    oracle="""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY m
),
pairs AS (
  SELECT CASE WHEN b.rev_c > a.rev_c THEN 1
              WHEN b.rev_c < a.rev_c THEN -1 ELSE 0 END AS sgn
  FROM monthly a JOIN monthly b ON a.m < b.m
),
ties AS (
  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
  FROM (SELECT COUNT(*) AS t FROM monthly GROUP BY rev_c HAVING COUNT(*) > 1)
),
lanes AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM monthly) AS n,
         (SELECT CAST(SUM(sgn) AS BIGINT) FROM pairs) AS s_stat,
         (SELECT tie_term FROM ties) AS tie_term
)
SELECT n, s_stat,
       ROUND(
         CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
              WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
              ELSE 0.0 END
         / SQRT(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18.0),
         6
       ) AS z_stat
FROM lanes
""",
)
def stats_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-KENDALL TREND TEST on monthly revenue — the standard
    nonparametric "is this series monotonically trending?" test for
    metrics dashboards (no linearity or normality assumed; robust
    to outliers because only SIGNS of pairwise differences count).
    S = sum over month pairs i<j of sign(x_j - x_i) is integer-exact
    from cents-lane monthly totals; the tie-corrected variance
    [n(n-1)(2n+5) - sum t(t-1)(2t+5)]/18 and the continuity-
    corrected z are one closed-form double at the end. The pairwise
    self-join is over the MONTH grid (~80 rows -> ~3k pairs at any
    fact scale — this is why Mann-Kendall is affordable distributed:
    the fact scan reduces map-side to the calendar grid first, and
    O(grid^2) is a constant). Output: n, S, z."""
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.sum(cents("o_totalprice")).cast("bigint").alias("rev_c"))
    a = monthly.select(F.col("m").alias("m_a"), F.col("rev_c").alias("x_a"))
    b = monthly.select(F.col("m").alias("m_b"), F.col("rev_c").alias("x_b"))
    pairs = a.join(b, F.col("m_a") < F.col("m_b"))
    sgn = (
        F.when(F.col("x_b") > F.col("x_a"), 1)
        .when(F.col("x_b") < F.col("x_a"), -1)
        .otherwise(0)
    )
    s_df = pairs.agg(F.sum(sgn).cast("bigint").alias("s_stat"))
    n_df = monthly.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tie_df = (
        monthly.groupBy("rev_c")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    lanes = n_df.crossJoin(F.broadcast(s_df)).crossJoin(F.broadcast(tie_df))
    n, s = F.col("n"), F.col("s_stat")
    num = (
        F.when(s > 0, (s - 1).cast("double"))
        .when(s < 0, (s + 1).cast("double"))
        .otherwise(F.lit(0.0))
    )
    var18 = (
        n * (n - 1) * (2 * n + 5) - F.col("tie_term")
    ).cast("double") / 18.0
    return lanes.select(
        "n", "s_stat", F.round(num / F.sqrt(var18), 6).alias("z_stat")
    )


@register(
    "stats_cuped_adjustment",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN date_part('day', ts) <= 15
                  THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x_c,
         CAST(SUM(CASE WHEN date_part('day', ts) > 15
                  THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y_c
  FROM events GROUP BY user_id
),
lanes AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x_c) AS BIGINT) AS sx,
         CAST(SUM(y_c) AS BIGINT) AS sy,
         CAST(SUM(x_c * x_c) AS BIGINT) AS sxx,
         CAST(SUM(y_c * y_c) AS BIGINT) AS syy,
         CAST(SUM(x_c * y_c) AS BIGINT) AS sxy
  FROM per_user
)
SELECT n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS theta,
       ROUND(1.0
             - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
               / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS adjusted_variance_ratio
FROM lanes
""",
)
def stats_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED VARIANCE REDUCTION — the experimentation-platform
    technique (Deng et al., WSDM'13 — public) that shrinks an A/B
    metric's variance using pre-experiment data: with X = each
    user's PRE-period spend (days 1-15) and Y = the experiment
    metric (days 16-30), the adjusted metric Y' = Y - theta*(X - Xbar)
    with theta = cov(X,Y)/var(X) keeps the same mean but variance
    var(Y)*(1 - rho^2) — the single highest-leverage sensitivity win
    an experiment platform ships. Both theta and the variance ratio
    1 - rho^2 are closed forms over five EXACT integer moment lanes
    (cents sums / sum-squares / cross products per user, then one
    global reduce) — no per-user doubles anywhere, so both engines
    agree bit-for-bit. One fact scan, one user hash-agg, one 1-row
    reduce; at 100 TB the lanes ride the same DECIMAL(38,0) upgrade
    path as embedding_pca_power."""
    e = table(spark, sf_dir, "events")
    pre = F.dayofmonth("ts") <= 15
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(pre, cents("value")).otherwise(0)).cast("bigint").alias("x_c"),
        F.sum(F.when(~pre, cents("value")).otherwise(0))
        .cast("bigint")
        .alias("y_c"),
    )
    x, y = F.col("x_c"), F.col("y_c")
    lanes = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).cast("bigint").alias("sx"),
        F.sum(y).cast("bigint").alias("sy"),
        F.sum(x * x).cast("bigint").alias("sxx"),
        F.sum(y * y).cast("bigint").alias("syy"),
        F.sum(x * y).cast("bigint").alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    cov_n = n_d * F.col("sxy").cast("double") - sx_d * sy_d
    varx_n = n_d * F.col("sxx").cast("double") - sx_d * sx_d
    vary_n = n_d * F.col("syy").cast("double") - sy_d * sy_d
    return lanes.select(
        "n",
        F.round(cov_n / varx_n, 6).alias("theta"),
        F.round(1.0 - (cov_n * cov_n) / (varx_n * vary_n), 6).alias(
            "adjusted_variance_ratio"
        ),
    )


@register(
    "stats_sen_slope",
    oracle="""
WITH monthly AS (
  SELECT (date_part('year', o_orderdate) - 1995) * 12
           + date_part('month', o_orderdate) - 1 AS m_idx,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY m_idx
),
slopes AS (
  SELECT CAST(ROUND(CAST(b.rev_c - a.rev_c AS DOUBLE) * 1000000.0
                    / CAST(b.m_idx - a.m_idx AS DOUBLE), 0) AS BIGINT)
           AS slope_q
  FROM monthly a JOIN monthly b ON a.m_idx < b.m_idx
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM monthly) AS n_months,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(MEDIAN(slope_q) / 1000000.0 / 100.0, 6) AS sen_slope
FROM slopes
""",
)
def stats_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEN'S SLOPE (Theil-Sen estimator) on monthly revenue — the
    robust trend MAGNITUDE that pairs with the Mann-Kendall trend
    TEST (same grid, same robustness argument: the median of all
    pairwise slopes has a 29.3% breakdown point where OLS has 0%).
    Each pairwise slope is quantized to a 1e-6 cents/month BIGINT
    lane (one ROUND of an exact-integer ratio — identical on both
    engines), and the estimator is the exact interpolated median
    over the pair lanes. The pair join is over the MONTH grid
    (~80 rows -> ~3.2k pairs at any fact scale) — the same
    domain-sized O(grid^2) constant that makes Mann-Kendall
    affordable distributed. Output in dollars/month at 6dp."""
    o = table(spark, sf_dir, "orders")
    m_idx = (
        (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    )
    monthly = o.groupBy(m_idx.alias("m_idx")).agg(
        F.sum(cents("o_totalprice")).cast("bigint").alias("rev_c")
    )
    a = monthly.select(F.col("m_idx").alias("i"), F.col("rev_c").alias("x_i"))
    b = monthly.select(F.col("m_idx").alias("j"), F.col("rev_c").alias("x_j"))
    slopes = a.join(b, F.col("i") < F.col("j")).select(
        F.round(
            (F.col("x_j") - F.col("x_i")).cast("double")
            * 1000000.0
            / (F.col("j") - F.col("i")).cast("double"),
            0,
        )
        .cast("bigint")
        .alias("slope_q")
    )
    n_months = monthly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months")
    )
    agg = slopes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(
            F.expr("percentile(slope_q, 0.5)") / 1000000.0 / 100.0, 6
        ).alias("sen_slope"),
    )
    return n_months.crossJoin(F.broadcast(agg)).select(
        "n_months", "n_pairs", "sen_slope"
    )


@register(
    "sql_group_by_all",
    oracle="""
SELECT date_part('year', o_orderdate) AS order_year,
       o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
         / 100.0 AS revenue
FROM orders
GROUP BY ALL
""",
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — the SQL-surface convenience (Spark 3.4+ and
    DuckDB both parse it) where the grouping set is inferred as
    every non-aggregate select item: the analyst shorthand that
    removes the classic copy-the-select-list-into-GROUP-BY error
    class. Registered through spark.sql() so the key pins the
    PARSER behavior, not a DataFrame translation; the plan is the
    ordinary partial+final hash aggregate (grouping inference is
    purely syntactic). Exact-cents revenue, same as every money
    aggregate in the repo."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gba")
    return spark.sql(
        """
        SELECT year(o_orderdate) AS order_year,
               o_orderstatus AS status,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    AS DOUBLE) / 100.0 AS revenue
        FROM orders_gba
        GROUP BY ALL
        """
    )


@register(
    "stats_wilson_interval",
    oracle="""
WITH per AS (
  SELECT p.p_brand AS brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY brand
)
SELECT brand, n, x,
       ROUND(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 6) AS naive_rate,
       ROUND((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
              + 3.8415882352801855 / (2.0 * CAST(n AS DOUBLE))
              - 1.959963984540054 * SQRT(
                  (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                  * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                  / CAST(n AS DOUBLE)
                  + 3.8415882352801855
                    / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             / (1.0 + 3.8415882352801855 / CAST(n AS DOUBLE)), 6)
         AS wilson_lower
FROM per
""",
)
def stats_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WILSON SCORE LOWER BOUND per brand — the proportion interval
    that fixes the two classic ranking bugs of the naive rate: a
    1/1 = 100% item outranking a 98/100, and normal-approximation
    intervals escaping [0,1] at small n. Ranking by the Wilson
    lower bound (the "how good is it at worst, given the evidence"
    estimate — the Reddit/best-comment formula) is the standard
    fix. Counts are exact integers; the bound is one closed-form
    double per brand with the z=1.96 constants pinned as literals
    (z and z^2) so both engines evaluate the IDENTICAL expression —
    no transcendentals at all, just SQRT. One broadcast dim join +
    one hash agg; brand-sized output."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    per = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
        )
    )
    n_d = F.col("n").cast("double")
    ph = F.col("x").cast("double") / n_d
    z = 1.959963984540054
    z2 = 3.8415882352801855
    wilson = (
        ph
        + z2 / (2.0 * n_d)
        - z * F.sqrt(ph * (1.0 - ph) / n_d + z2 / (4.0 * n_d * n_d))
    ) / (1.0 + z2 / n_d)
    return per.select(
        "brand",
        "n",
        "x",
        F.round(ph, 6).alias("naive_rate"),
        F.round(wilson, 6).alias("wilson_lower"),
    )


@register(
    "dq_join_fanout_profile",
    oracle="""
WITH fan AS (
  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS fanout
  FROM orders GROUP BY k
),
li_fan AS (
  SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS fanout
  FROM lineitem GROUP BY k
),
profile AS (
  SELECT 'customer->orders' AS relation,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(fanout) AS BIGINT) AS n_rows,
         CAST(MAX(fanout) AS BIGINT) AS max_fanout,
         ROUND(CAST(SUM(fanout) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           AS mean_fanout,
         CAST(SUM(CASE WHEN fanout > 10 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_keys_over_10
  FROM fan
  UNION ALL
  SELECT 'orders->lineitem',
         CAST(COUNT(*) AS BIGINT), CAST(SUM(fanout) AS BIGINT),
         CAST(MAX(fanout) AS BIGINT),
         ROUND(CAST(SUM(fanout) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6),
         CAST(SUM(CASE WHEN fanout > 10 THEN 1 ELSE 0 END) AS BIGINT)
  FROM li_fan
)
SELECT * FROM profile
""",
)
def dq_join_fanout_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN FAN-OUT PROFILER — the pre-join safety report that
    answers "will this join AMPLIFY my rows?" before the cluster
    finds out the hard way: for each FK relation, the distribution
    of per-key match counts (mean = the row multiplication factor
    the join will apply, max = the hottest key, keys-over-threshold
    = how concentrated the amplification is). The skew profiler's
    complement: skew kills a shuffle's balance, fan-out kills its
    OUTPUT SIZE — a 1:N join with mean fan-out 4 quadruples the
    downstream pipeline, and the profile says so from two cheap
    map-side-combined hash-aggs over the FK columns alone (column-
    pruned scans, no join executed at all)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")

    def profile(df, key, name):
        fan = df.groupBy(F.col(key).alias("k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("fanout")
        )
        return fan.agg(
            F.lit(name).alias("relation"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("fanout").cast("bigint").alias("n_rows"),
            F.max("fanout").cast("bigint").alias("max_fanout"),
            F.round(
                F.sum("fanout").cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_fanout"),
            F.sum(F.when(F.col("fanout") > 10, 1).otherwise(0))
            .cast("bigint")
            .alias("n_keys_over_10"),
        )

    return profile(o, "o_custkey", "customer->orders").unionByName(
        profile(li, "l_orderkey", "orders->lineitem")
    )


@register(
    "stats_aa_test_srm",
    oracle="""
WITH assigned AS (
  SELECT user_id,
         CASE WHEN (instr('0123456789abcdef',
                          substr(md5(CAST(user_id AS VARCHAR) || ':aa'), 1, 1))
                    - 1) < 8 THEN 'A1' ELSE 'A2' END AS bucket,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS v_c
  FROM events
),
per_user AS (
  SELECT bucket, user_id,
         CAST(COUNT(*) AS BIGINT) AS n_ev,
         CAST(SUM(v_c) AS BIGINT) AS sv
  FROM assigned GROUP BY bucket, user_id
),
lanes AS (
  SELECT bucket,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(n_ev) AS BIGINT) AS n_events,
         CAST(SUM(sv) AS BIGINT) AS s,
         CAST(SUM(sv * sv) AS BIGINT) AS ss
  FROM per_user GROUP BY bucket
),
wide AS (
  SELECT MAX(CASE WHEN bucket = 'A1' THEN n_users END) AS n1,
         MAX(CASE WHEN bucket = 'A2' THEN n_users END) AS n2,
         MAX(CASE WHEN bucket = 'A1' THEN n_events END) AS e1,
         MAX(CASE WHEN bucket = 'A2' THEN n_events END) AS e2,
         MAX(CASE WHEN bucket = 'A1' THEN s END) AS s1,
         MAX(CASE WHEN bucket = 'A2' THEN s END) AS s2,
         MAX(CASE WHEN bucket = 'A1' THEN ss END) AS ss1,
         MAX(CASE WHEN bucket = 'A2' THEN ss END) AS ss2
  FROM lanes
)
SELECT n1, n2, e1, e2,
       ROUND((CAST(n1 AS DOUBLE) - CAST(n1 + n2 AS DOUBLE) / 2.0)
             * (CAST(n1 AS DOUBLE) - CAST(n1 + n2 AS DOUBLE) / 2.0)
             / (CAST(n1 + n2 AS DOUBLE) / 2.0) * 2.0, 6) AS srm_chi2,
       ROUND((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             / SQRT(
                 (CAST(ss1 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                    / CAST(n1 AS DOUBLE)) / CAST(n1 AS DOUBLE)
                   / CAST(n1 AS DOUBLE)
                 + (CAST(ss2 AS DOUBLE)
                    - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                      / CAST(n2 AS DOUBLE)) / CAST(n2 AS DOUBLE)
                     / CAST(n2 AS DOUBLE)), 6) AS metric_z,
       (CAST(n1 AS DOUBLE) - CAST(n1 + n2 AS DOUBLE) / 2.0)
         * (CAST(n1 AS DOUBLE) - CAST(n1 + n2 AS DOUBLE) / 2.0)
         / (CAST(n1 + n2 AS DOUBLE) / 2.0) * 2.0 <= 10.83 AS srm_pass,
       ABS((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
            - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
           / SQRT(
               (CAST(ss1 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                  / CAST(n1 AS DOUBLE)) / CAST(n1 AS DOUBLE)
                 / CAST(n1 AS DOUBLE)
               + (CAST(ss2 AS DOUBLE)
                  - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                    / CAST(n2 AS DOUBLE)) / CAST(n2 AS DOUBLE)
                   / CAST(n2 AS DOUBLE))) <= 3.29 AS metric_pass
FROM wide
""",
)
def stats_aa_test_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/A TEST + SAMPLE-RATIO-MISMATCH check — the experimentation
    platform's SELF-test, run before anyone trusts an A/B readout:
    hash users into two buckets that SHOULD be identical, then (1)
    SRM: a chi-square on the 50/50 user split (the single most
    common silent corrupter of experiments — a biased assignment
    path shows up here first), and (2) metric balance: a Welch-style
    z on per-user spend between buckets. Both gates use loose
    p~0.001 thresholds (chi2 <= 10.83, |z| <= 3.29) pinned as
    literals — an A/A platform alarm must be rare by design. All
    moments are exact integer lanes (user counts, cents sums,
    sums-of-squares of PER-USER totals — clustered at the
    randomization unit, the subtlety naive A/B math gets wrong);
    the closed forms are the only doubles. Assignment is the same
    salted-md5 bucket hash every split key uses — reproducible, no
    RNG."""
    e = table(spark, sf_dir, "events")
    bucket = F.when(
        F.expr(
            "instr('0123456789abcdef',"
            " substr(md5(CAST(user_id AS STRING) || ':aa'), 1, 1)) - 1"
        )
        < 8,
        "A1",
    ).otherwise("A2")
    assigned = e.select(
        "user_id", bucket.alias("bucket"), cents("value").alias("v_c")
    )
    per_user = assigned.groupBy("bucket", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
        F.sum("v_c").cast("bigint").alias("sv"),
    )
    lanes = per_user.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("n_ev").cast("bigint").alias("n_events"),
        F.sum("sv").cast("bigint").alias("s"),
        F.sum(F.col("sv") * F.col("sv")).cast("bigint").alias("ss"),
    )

    def pick(col, b):
        return F.max(F.when(F.col("bucket") == b, F.col(col)))

    wide = lanes.agg(
        pick("n_users", "A1").alias("n1"),
        pick("n_users", "A2").alias("n2"),
        pick("n_events", "A1").alias("e1"),
        pick("n_events", "A2").alias("e2"),
        pick("s", "A1").alias("s1"),
        pick("s", "A2").alias("s2"),
        pick("ss", "A1").alias("ss1"),
        pick("ss", "A2").alias("ss2"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    half = (F.col("n1") + F.col("n2")).cast("double") / 2.0
    chi2 = (n1d - half) * (n1d - half) / half * 2.0
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    var1 = (F.col("ss1").cast("double") - s1d * s1d / n1d) / n1d / n1d
    var2 = (F.col("ss2").cast("double") - s2d * s2d / n2d) / n2d / n2d
    zv = (s1d / n1d - s2d / n2d) / F.sqrt(var1 + var2)
    return wide.select(
        "n1",
        "n2",
        "e1",
        "e2",
        F.round(chi2, 6).alias("srm_chi2"),
        F.round(zv, 6).alias("metric_z"),
        (chi2 <= 10.83).alias("srm_pass"),
        (F.abs(zv) <= 3.29).alias("metric_pass"),
    )


@register(
    "agg_price_index_laspeyres",
    oracle="""
WITH per AS (
  SELECT l_partkey AS pk,
         date_part('year', l_shipdate) AS y,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS spend_c,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY pk, y
),
base AS (SELECT pk, spend_c, qty FROM per WHERE y = 1995),
pairs AS (
  SELECT p.y,
         b.qty AS q0, b.spend_c AS s0_c,
         p.qty AS qt, p.spend_c AS st_c
  FROM per p JOIN base b ON p.pk = b.pk
  WHERE p.y > 1995
),
idx AS (
  SELECT y,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         SUM(CAST(st_c AS DOUBLE) / CAST(qt AS DOUBLE) * CAST(q0 AS DOUBLE))
           AS lasp_num,
         SUM(CAST(s0_c AS DOUBLE) / CAST(q0 AS DOUBLE) * CAST(q0 AS DOUBLE))
           AS lasp_den,
         SUM(CAST(st_c AS DOUBLE) / CAST(qt AS DOUBLE) * CAST(qt AS DOUBLE))
           AS paas_num,
         SUM(CAST(s0_c AS DOUBLE) / CAST(q0 AS DOUBLE) * CAST(qt AS DOUBLE))
           AS paas_den
  FROM pairs GROUP BY y
)
SELECT y AS year, n_parts,
       ROUND(CAST(ROUND(lasp_num, 0) AS DOUBLE)
             / CAST(ROUND(lasp_den, 0) AS DOUBLE), 6) AS laspeyres,
       ROUND(CAST(ROUND(paas_num, 0) AS DOUBLE)
             / CAST(ROUND(paas_den, 0) AS DOUBLE), 6) AS paasche
FROM idx
""",
)
def agg_price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LASPEYRES + PAASCHE PRICE INDICES vs a 1995 base year — the
    two canonical basket price indices (Laspeyres weights by BASE-
    year quantities: "what does the old basket cost now?"; Paasche
    by CURRENT quantities), the econ-statistics counterpart to the
    per-brand elasticity key. Per (part, year) the average unit
    price is an exact ratio of cents-spend over integer quantity;
    each index is a weighted sum of those ratios over parts present
    in both years. The summands are exact-lane ratios reconstructed
    identically on both engines, and the sums are rounded to the
    integer cent BEFORE the final division (quantize-then-divide),
    absorbing any last-ulp accumulation-order drift. Two hash-aggs
    + one part-keyed self-join (co-partitioned); year-grid output."""
    li = table(spark, sf_dir, "lineitem")
    per = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.year("l_shipdate").alias("y"),
    ).agg(
        F.sum(cents("l_extendedprice")).cast("bigint").alias("spend_c"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"),
    )
    base = per.filter(F.col("y") == 1995).select(
        "pk", F.col("spend_c").alias("s0_c"), F.col("qty").alias("q0")
    )
    cur = per.filter(F.col("y") > 1995)
    pairs = cur.join(base, "pk")
    p_t = F.col("spend_c").cast("double") / F.col("qty").cast("double")
    p_0 = F.col("s0_c").cast("double") / F.col("q0").cast("double")
    q0d = F.col("q0").cast("double")
    qtd = F.col("qty").cast("double")
    idx = pairs.groupBy("y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(p_t * q0d).alias("lasp_num"),
        F.sum(p_0 * q0d).alias("lasp_den"),
        F.sum(p_t * qtd).alias("paas_num"),
        F.sum(p_0 * qtd).alias("paas_den"),
    )
    return idx.select(
        F.col("y").alias("year"),
        "n_parts",
        F.round(
            F.round(F.col("lasp_num"), 0) / F.round(F.col("lasp_den"), 0), 6
        ).alias("laspeyres"),
        F.round(
            F.round(F.col("paas_num"), 0) / F.round(F.col("paas_den"), 0), 6
        ).alias("paasche"),
    )


@register(
    "agg_price_volume_mix",
    oracle="""
WITH per AS (
  SELECT p.p_brand AS brand, l.l_partkey AS pk,
         date_part('year', l.l_shipdate) AS y,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
           AS BIGINT) AS spend_c,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE date_part('year', l.l_shipdate) IN (1998, 1999)
  GROUP BY brand, pk, y
),
wide AS (
  SELECT brand, pk,
         CAST(MAX(CASE WHEN y = 1998 THEN spend_c END) AS BIGINT) AS s0,
         CAST(MAX(CASE WHEN y = 1998 THEN qty END) AS BIGINT) AS q0,
         CAST(MAX(CASE WHEN y = 1999 THEN spend_c END) AS BIGINT) AS s1,
         CAST(MAX(CASE WHEN y = 1999 THEN qty END) AS BIGINT) AS q1
  FROM per GROUP BY brand, pk
),
base AS (
  SELECT brand,
         CAST(ROUND(CAST(CAST(SUM(s0) AS BIGINT) * 1000000 AS DOUBLE)
                    / CAST(SUM(q0) AS BIGINT), 0) AS BIGINT) AS p0avg_micro
  FROM wide WHERE s0 IS NOT NULL AND s1 IS NOT NULL GROUP BY brand
),
eff AS (
  SELECT w.brand,
         CASE WHEN s0 IS NOT NULL AND s1 IS NOT NULL THEN 1 ELSE 0 END
           AS is_common,
         CASE WHEN s0 IS NULL THEN 1 ELSE 0 END AS is_new,
         CASE WHEN s1 IS NULL THEN 1 ELSE 0 END AS is_dropped,
         COALESCE(s0, 0) AS s0z, COALESCE(s1, 0) AS s1z,
         CASE WHEN s0 IS NOT NULL AND s1 IS NOT NULL
              THEN s1 * 1000000
                   - CAST(ROUND(CAST(s0 * 1000000 AS DOUBLE) * q1 / q0, 0)
                          AS BIGINT)
              ELSE 0 END AS price_micro,
         CASE WHEN s0 IS NOT NULL AND s1 IS NOT NULL
              THEN (q1 - q0) * b.p0avg_micro ELSE 0 END AS vol_micro,
         CASE WHEN s0 IS NOT NULL AND s1 IS NOT NULL
              THEN CAST(ROUND(CAST(s0 * 1000000 AS DOUBLE) * (q1 - q0) / q0,
                              0) AS BIGINT)
                   - (q1 - q0) * b.p0avg_micro
              ELSE 0 END AS mix_micro
  FROM wide w LEFT JOIN base b ON w.brand = b.brand
)
SELECT brand,
       CAST(SUM(is_common) AS BIGINT) AS n_common,
       CAST(SUM(is_new) AS BIGINT) AS n_new,
       CAST(SUM(is_dropped) AS BIGINT) AS n_dropped,
       CAST(SUM(s0z) AS BIGINT) AS rev0_c,
       CAST(SUM(s1z) AS BIGINT) AS rev1_c,
       CAST(SUM(s1z) - SUM(s0z) AS BIGINT) AS delta_c,
       CAST(SUM(CASE WHEN is_new = 1 THEN s1z ELSE 0 END) AS BIGINT)
         AS new_rev_c,
       CAST(SUM(CASE WHEN is_dropped = 1 THEN s0z ELSE 0 END) AS BIGINT)
         AS dropped_rev_c,
       CAST(SUM(price_micro) AS BIGINT) AS price_eff_micro,
       CAST(SUM(vol_micro) AS BIGINT) AS volume_eff_micro,
       CAST(SUM(mix_micro) AS BIGINT) AS mix_eff_micro
FROM eff GROUP BY brand
""",
    tags=("lineitem", "part", "finance"),
)
def agg_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE-VOLUME-MIX REVENUE BRIDGE — the FP&A standard for
    explaining a revenue change between two periods (1998 -> 1999,
    per brand): for parts sold in BOTH years, the delta decomposes
    into a PRICE effect (unit-price change at current volume,
    s1 - s0*q1/q0), a VOLUME effect (quantity change at the brand's
    base-year average price), and a MIX effect (quantity shift
    toward cheaper/dearer parts: the residual of repricing the
    quantity change at the part's own base price vs the brand
    average); parts new in 1999 / discontinued after 1998 report as
    separate new/dropped revenue lanes, so the bridge ties out to
    the total delta. All money stays in exact integer lanes: spend
    and quantity aggregate as exact BIGINTs, the brand base price
    quantizes once to integer micro-cents-per-unit, and every
    per-part effect is a single deterministic double division
    rounded to integer micro-cents BEFORE the brand sum — no
    accumulation-order drift. Plan: one dim join (part broadcasts),
    two hash-aggs, one brand-keyed broadcast join back."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate").isin(1998, 1999)
    )
    pt = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per = (
        li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("l_partkey").alias("pk"),
            F.year("l_shipdate").alias("y"),
        )
        .agg(
            F.sum(cents("l_extendedprice")).cast("bigint").alias("spend_c"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"),
        )
    )
    wide = per.groupBy("brand", "pk").agg(
        F.max(F.when(F.col("y") == 1998, F.col("spend_c"))).alias("s0"),
        F.max(F.when(F.col("y") == 1998, F.col("qty"))).alias("q0"),
        F.max(F.when(F.col("y") == 1999, F.col("spend_c"))).alias("s1"),
        F.max(F.when(F.col("y") == 1999, F.col("qty"))).alias("q1"),
    )
    common = F.col("s0").isNotNull() & F.col("s1").isNotNull()
    base = (
        wide.filter(common)
        .groupBy("brand")
        .agg(
            F.round(
                (F.sum("s0").cast("bigint") * 1000000).cast("double")
                / F.sum("q0").cast("bigint"),
                0,
            )
            .cast("bigint")
            .alias("p0avg_micro")
        )
    )
    eff = wide.join(F.broadcast(base), "brand", "left").select(
        "brand",
        F.when(common, 1).otherwise(0).alias("is_common"),
        F.when(F.col("s0").isNull(), 1).otherwise(0).alias("is_new"),
        F.when(F.col("s1").isNull(), 1).otherwise(0).alias("is_dropped"),
        F.coalesce("s0", F.lit(0)).alias("s0z"),
        F.coalesce("s1", F.lit(0)).alias("s1z"),
        F.when(
            common,
            F.col("s1") * 1000000
            - F.round(
                (F.col("s0") * 1000000).cast("double")
                * F.col("q1")
                / F.col("q0"),
                0,
            ).cast("bigint"),
        )
        .otherwise(0)
        .alias("price_micro"),
        F.when(common, (F.col("q1") - F.col("q0")) * F.col("p0avg_micro"))
        .otherwise(0)
        .alias("vol_micro"),
        F.when(
            common,
            F.round(
                (F.col("s0") * 1000000).cast("double")
                * (F.col("q1") - F.col("q0"))
                / F.col("q0"),
                0,
            ).cast("bigint")
            - (F.col("q1") - F.col("q0")) * F.col("p0avg_micro"),
        )
        .otherwise(0)
        .alias("mix_micro"),
    )
    return eff.groupBy("brand").agg(
        F.sum("is_common").cast("bigint").alias("n_common"),
        F.sum("is_new").cast("bigint").alias("n_new"),
        F.sum("is_dropped").cast("bigint").alias("n_dropped"),
        F.sum("s0z").cast("bigint").alias("rev0_c"),
        F.sum("s1z").cast("bigint").alias("rev1_c"),
        (F.sum("s1z") - F.sum("s0z")).cast("bigint").alias("delta_c"),
        F.sum(F.when(F.col("is_new") == 1, F.col("s1z")).otherwise(0))
        .cast("bigint")
        .alias("new_rev_c"),
        F.sum(F.when(F.col("is_dropped") == 1, F.col("s0z")).otherwise(0))
        .cast("bigint")
        .alias("dropped_rev_c"),
        F.sum("price_micro").cast("bigint").alias("price_eff_micro"),
        F.sum("vol_micro").cast("bigint").alias("volume_eff_micro"),
        F.sum("mix_micro").cast("bigint").alias("mix_eff_micro"),
    )


@register(
    "stats_cramers_v",
    oracle="""
WITH obs AS (
  SELECT c.c_mktsegment AS seg, r.r_name AS reg,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer c
  JOIN nation nt ON c.c_nationkey = nt.n_nationkey
  JOIN region r ON nt.n_regionkey = r.r_regionkey
  GROUP BY seg, reg
),
m AS (
  SELECT seg, CAST(SUM(n) AS BIGINT) AS rn FROM obs GROUP BY seg
),
cm AS (
  SELECT reg, CAST(SUM(n) AS BIGINT) AS cn FROM obs GROUP BY reg
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM obs),
terms AS (
  SELECT CAST(ROUND(pow(obs.n - CAST(rn AS DOUBLE) * cn / t, 2)
                    / (CAST(rn AS DOUBLE) * cn / t) * 1000000000, 0)
              AS BIGINT) AS term_nano
  FROM obs
  JOIN m ON m.seg = obs.seg
  JOIN cm ON cm.reg = obs.reg
  CROSS JOIN tot
)
SELECT (SELECT t FROM tot) AS n,
       CAST(5 AS BIGINT) AS n_rows,
       CAST(5 AS BIGINT) AS n_cols,
       ROUND(CAST(SUM(term_nano) AS BIGINT) / 1000000000.0, 6) AS chi2,
       ROUND(sqrt(CAST(SUM(term_nano) AS BIGINT) / 1000000000.0
                  / ((SELECT t FROM tot) * 4.0)), 6) AS cramers_v
FROM terms
""",
    tags=("stats", "agg"),
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMÉR'S V — the [0,1]-normalized effect size for categorical
    association (chi-square alone grows with n; V = sqrt(chi2 /
    (n*(min(r,c)-1))) is comparable across table sizes), here over
    the (market segment x region) contingency of customers. The
    chi-square total is a SUM of per-cell doubles, so each cell's
    term is quantized to integer nano-units BEFORE the sum (the
    repo's standard exact-accumulation lane) — the 25-cell grid then
    sums order-independently on both engines. Margins broadcast;
    the dims (nation, region) broadcast into the fact scan."""
    c = table(spark, sf_dir, "customer")
    nt = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    obs = (
        c.join(F.broadcast(nt), c["c_nationkey"] == nt["n_nationkey"])
        .join(F.broadcast(r), nt["n_regionkey"] == r["r_regionkey"])
        .groupBy(
            F.col("c_mktsegment").alias("seg"), F.col("r_name").alias("reg")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = obs.groupBy("seg").agg(F.sum("n").alias("rn"))
    cm = obs.groupBy("reg").agg(F.sum("n").alias("cn"))
    tot = obs.agg(F.sum("n").alias("t"))
    e = F.col("rn").cast("double") * F.col("cn") / F.col("t")
    terms = (
        obs.join(F.broadcast(m), "seg")
        .join(F.broadcast(cm), "reg")
        .crossJoin(F.broadcast(tot))
        .select(
            "t",
            F.round(F.pow(F.col("n") - e, 2) / e * 1000000000, 0)
            .cast("bigint")
            .alias("term_nano"),
        )
    )
    agg = terms.groupBy("t").agg(
        F.sum("term_nano").cast("bigint").alias("nano")
    )
    chi2 = F.col("nano") / 1000000000.0
    return agg.select(
        F.col("t").alias("n"),
        F.lit(5).cast("bigint").alias("n_rows"),
        F.lit(5).cast("bigint").alias("n_cols"),
        F.round(chi2, 6).alias("chi2"),
        F.round(F.sqrt(chi2 / (F.col("t") * 4.0)), 6).alias("cramers_v"),
    )


# Shared SQL fragments for the one-way ANOVA on 5 priority groups —
# the SAME text parses in Spark (selectExpr) and DuckDB, so both
# engines execute an identical double expression tree (the
# agg_higher_moments pattern).  t1 = sum_g s_g^2/n_g in fixed
# left-assoc order; group square sums stay exact (HUGEINT / DECIMAL38)
# until one final cast.
_ANOVA_T1 = (
    "CAST(s1 AS DOUBLE)*s1/n1 + CAST(s2 AS DOUBLE)*s2/n2 "
    "+ CAST(s3 AS DOUBLE)*s3/n3 + CAST(s4 AS DOUBLE)*s4/n4 "
    "+ CAST(s5 AS DOUBLE)*s5/n5"
)
_ANOVA_F = (
    "ROUND(((t1 - CAST(st AS DOUBLE)*st/nt) / 4.0)"
    " / ((c2 - t1) / (nt - 5)), 6)"
)
_ANOVA_ETA = (
    "ROUND((t1 - CAST(st AS DOUBLE)*st/nt)"
    " / (c2 - CAST(st AS DOUBLE)*st/nt), 6)"
)


@register(
    "stats_anova_oneway",
    oracle=f"""
WITH g AS (
  SELECT substr(o_orderpriority, 1, 1) AS gk,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS s_g,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
             * CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS c2_g
  FROM orders GROUP BY gk
),
w AS (
  SELECT MAX(CASE WHEN gk = '1' THEN n_g END) AS n1,
         MAX(CASE WHEN gk = '2' THEN n_g END) AS n2,
         MAX(CASE WHEN gk = '3' THEN n_g END) AS n3,
         MAX(CASE WHEN gk = '4' THEN n_g END) AS n4,
         MAX(CASE WHEN gk = '5' THEN n_g END) AS n5,
         MAX(CASE WHEN gk = '1' THEN s_g END) AS s1,
         MAX(CASE WHEN gk = '2' THEN s_g END) AS s2,
         MAX(CASE WHEN gk = '3' THEN s_g END) AS s3,
         MAX(CASE WHEN gk = '4' THEN s_g END) AS s4,
         MAX(CASE WHEN gk = '5' THEN s_g END) AS s5,
         CAST(SUM(n_g) AS BIGINT) AS nt,
         CAST(SUM(s_g) AS BIGINT) AS st,
         CAST(SUM(c2_g) AS DOUBLE) AS c2
  FROM g
),
t AS (SELECT *, {_ANOVA_T1} AS t1 FROM w)
SELECT nt AS n, CAST(5 AS BIGINT) AS k,
       {_ANOVA_F} AS f_stat,
       {_ANOVA_ETA} AS eta_sq
FROM t
""",
    tags=("stats", "agg"),
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-WAY ANOVA F — does mean order value differ across the five
    order priorities? SSB/SSW from the classic moment identities
    (sum_g s_g^2/n_g - S^2/N and Sum(x^2) - sum_g s_g^2/n_g), with
    every input an EXACT integer: per-group cent-sums are BIGINTs,
    the global square-sum stays DECIMAL(38)/HUGEINT through both
    aggregation levels and casts to double exactly once. The five
    groups pivot to ONE wide row, so the 5-term t1 sum is a fixed
    left-associated expression tree — shared as literal SQL text
    between Spark selectExpr and the DuckDB oracle (the
    agg_higher_moments determinism pattern), immune to accumulation
    order. Two grid-sized hash-aggs; nothing shuffles twice."""
    o = table(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    g = o.groupBy(F.substring("o_orderpriority", 1, 1).alias("gk")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(c).cast("bigint").alias("s_g"),
        F.sum((c * c).cast("decimal(38,0)")).alias("c2_g"),
    )

    def pick(col, k):
        return F.max(F.when(F.col("gk") == k, F.col(col)))

    w = g.agg(
        *[pick("n_g", str(i)).alias(f"n{i}") for i in range(1, 6)],
        *[pick("s_g", str(i)).alias(f"s{i}") for i in range(1, 6)],
        F.sum("n_g").cast("bigint").alias("nt"),
        F.sum("s_g").cast("bigint").alias("st"),
        F.sum("c2_g").cast("double").alias("c2"),
    )
    t = w.selectExpr("*", f"{_ANOVA_T1} AS t1")
    return t.selectExpr(
        "nt AS n",
        "CAST(5 AS BIGINT) AS k",
        f"{_ANOVA_F} AS f_stat",
        f"{_ANOVA_ETA} AS eta_sq",
    )


# Brown–Forsythe over the 3 returnflag groups — same shared-SQL-text
# determinism as _ANOVA_*: fixed 3-term tree, exact integer inputs.
_BF_T1 = (
    "CAST(za AS DOUBLE)*za/na + CAST(zn AS DOUBLE)*zn/nn "
    "+ CAST(zr AS DOUBLE)*zr/nr"
)
_BF_W = (
    "ROUND(((t1 - CAST(zt AS DOUBLE)*zt/nt) / 2.0)"
    " / ((z2 - t1) / (nt - 3)), 6)"
)


@register(
    "stats_levene_bf",
    oracle=f"""
WITH x AS (
  SELECT l_returnflag AS fl,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS c,
         ROW_NUMBER() OVER (
           PARTITION BY l_returnflag
           ORDER BY CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT),
                    l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
),
med AS (
  SELECT fl, CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN c END) AS BIGINT)
           AS med_c
  FROM x GROUP BY fl
),
z AS (
  SELECT x.fl, ABS(x.c - med.med_c) AS z
  FROM x JOIN med ON x.fl = med.fl
),
g AS (
  SELECT fl,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(z) AS BIGINT) AS s_g,
         SUM(z * z) AS z2_g
  FROM z GROUP BY fl
),
w AS (
  SELECT MAX(CASE WHEN g.fl = 'A' THEN n_g END) AS na,
         MAX(CASE WHEN g.fl = 'N' THEN n_g END) AS nn,
         MAX(CASE WHEN g.fl = 'R' THEN n_g END) AS nr,
         MAX(CASE WHEN g.fl = 'A' THEN s_g END) AS za,
         MAX(CASE WHEN g.fl = 'N' THEN s_g END) AS zn,
         MAX(CASE WHEN g.fl = 'R' THEN s_g END) AS zr,
         MAX(CASE WHEN g.fl = 'A' THEN med_c END) AS med_a,
         MAX(CASE WHEN g.fl = 'N' THEN med_c END) AS med_n,
         MAX(CASE WHEN g.fl = 'R' THEN med_c END) AS med_r,
         CAST(SUM(n_g) AS BIGINT) AS nt,
         CAST(SUM(s_g) AS BIGINT) AS zt,
         CAST(SUM(z2_g) AS DOUBLE) AS z2
  FROM g JOIN med ON g.fl = med.fl
),
t AS (SELECT *, {_BF_T1} AS t1 FROM w)
SELECT nt AS n, CAST(3 AS BIGINT) AS k,
       med_a, med_n, med_r,
       {_BF_W} AS w_stat
FROM t
""",
    tags=("stats", "agg", "window"),
)
def stats_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEVENE'S TEST, BROWN–FORSYTHE VARIANT — homogeneity of
    variance across the three returnflag populations of
    l_extendedprice, the gate check before trusting a pooled-variance
    t-test/ANOVA. BF replaces the group mean with the group MEDIAN
    (robust to the heavy right tail prices have), pinned here as the
    explicit LOWER median — the order statistic at rank (n+1)//2
    under a total order with unique tie-breakers — so both engines
    select the identical element. The absolute deviations z are then
    exact integer cents, and the test statistic is literally one-way
    ANOVA on z: same exact moment lanes (BIGINT z-sums, HUGEINT /
    DECIMAL38 z^2-sums), same pivot-to-one-row fixed expression tree
    shared as SQL text. Cost: one window sort per flag (3-way), one
    broadcast join of the 3 medians back, two grid aggs."""
    li = table(spark, sf_dir, "lineitem")
    c = cents("l_extendedprice")
    x = li.select(
        F.col("l_returnflag").alias("fl"),
        c.alias("c"),
        "l_orderkey",
        "l_linenumber",
    )
    wnd = Window.partitionBy("fl").orderBy("c", "l_orderkey", "l_linenumber")
    x = x.withColumn("rn", F.row_number().over(wnd)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("fl"))
    )
    med = x.groupBy("fl").agg(
        F.max(
            F.when(
                F.col("rn") == F.expr("(n + 1) div 2"), F.col("c")
            )
        )
        .cast("bigint")
        .alias("med_c")
    )
    z = x.join(F.broadcast(med), "fl").select(
        "fl", F.abs(F.col("c") - F.col("med_c")).alias("z")
    )
    g = z.groupBy("fl").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("z").cast("bigint").alias("s_g"),
        F.sum((F.col("z") * F.col("z")).cast("decimal(38,0)")).alias("z2_g"),
    )

    def pick(col, k):
        return F.max(F.when(F.col("fl") == k, F.col(col)))

    w = g.join(F.broadcast(med), "fl").agg(
        pick("n_g", "A").alias("na"),
        pick("n_g", "N").alias("nn"),
        pick("n_g", "R").alias("nr"),
        pick("s_g", "A").alias("za"),
        pick("s_g", "N").alias("zn"),
        pick("s_g", "R").alias("zr"),
        pick("med_c", "A").alias("med_a"),
        pick("med_c", "N").alias("med_n"),
        pick("med_c", "R").alias("med_r"),
        F.sum("n_g").cast("bigint").alias("nt"),
        F.sum("s_g").cast("bigint").alias("zt"),
        F.sum("z2_g").cast("double").alias("z2"),
    )
    t = w.selectExpr("*", f"{_BF_T1} AS t1")
    return t.selectExpr(
        "nt AS n",
        "CAST(3 AS BIGINT) AS k",
        "med_a",
        "med_n",
        "med_r",
        f"{_BF_W} AS w_stat",
    )


# 3x3 Cramer's-rule determinants for two-regressor OLS, shared as SQL
# text so Spark and DuckDB execute the identical double tree.  Inputs
# are the exact integer moment columns cast to double once each.
_OLS_D = (
    "nd*(x11*x22 - x12*x12) - sx1*(sx1*x22 - x12*sx2)"
    " + sx2*(sx1*x12 - x11*sx2)"
)
_OLS_D0 = (
    "syd*(x11*x22 - x12*x12) - sx1*(x1y*x22 - x12*x2y)"
    " + sx2*(x1y*x12 - x11*x2y)"
)
_OLS_D1 = (
    "nd*(x1y*x22 - x12*x2y) - syd*(sx1*x22 - x12*sx2)"
    " + sx2*(sx1*x2y - x1y*sx2)"
)
_OLS_D2 = (
    "nd*(x11*x2y - x1y*x12) - sx1*(sx1*x2y - x1y*sx2)"
    " + syd*(sx1*x12 - x11*sx2)"
)


@register(
    "stats_ols_multiple",
    oracle=f"""
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS isx1,
         CAST(SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS BIGINT)
           AS isx2,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
           AS BIGINT) AS ix11,
         CAST(SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)
                  * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS BIGINT)
           AS ix22,
         CAST(SUM(CAST(l_quantity AS BIGINT)
                  * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS BIGINT)
           AS ix12,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS isy,
         CAST(SUM(CAST(l_quantity AS BIGINT)
                  * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
           AS BIGINT) AS ix1y,
         CAST(SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)
                  * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
           AS BIGINT) AS ix2y,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
           AS DOUBLE) AS syy
  FROM lineitem
),
c AS (
  SELECT n, syy,
         CAST(n AS DOUBLE) AS nd,
         CAST(isx1 AS DOUBLE) AS sx1, CAST(isx2 AS DOUBLE) AS sx2,
         CAST(ix11 AS DOUBLE) AS x11, CAST(ix22 AS DOUBLE) AS x22,
         CAST(ix12 AS DOUBLE) AS x12,
         CAST(isy AS DOUBLE) AS syd,
         CAST(ix1y AS DOUBLE) AS x1y, CAST(ix2y AS DOUBLE) AS x2y
  FROM m
),
d AS (
  SELECT *, {_OLS_D} AS det, {_OLS_D0} AS det0, {_OLS_D1} AS det1,
         {_OLS_D2} AS det2
  FROM c
),
b AS (
  SELECT *, det0/det AS b0, det1/det AS b1, det2/det AS b2 FROM d
)
SELECT n,
       ROUND(b0, 6) AS b0_cents,
       ROUND(b1, 6) AS b1_cents_per_qty,
       ROUND(b2, 6) AS b2_cents_per_disc_c,
       ROUND(1.0 - (syy - b0*syd - b1*x1y - b2*x2y)
                   / (syy - syd*syd/nd), 6) AS r2
FROM b
""",
    tags=("stats", "agg"),
)
def stats_ols_multiple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIPLE LINEAR REGRESSION (two regressors + intercept) by the
    NORMAL EQUATIONS, solved in closed form with Cramer's rule —
    price_cents ~ quantity + discount_cents over all of lineitem.
    This is the distributed-OLS pattern that needs exactly ONE
    map-side-combinable pass: nine sufficient moments (all exact
    BIGINTs; the y^2 sum rides the DECIMAL38/HUGEINT lane), then the
    3x3 determinants and coefficients are O(1) driver-side
    arithmetic on one wide row — shared as literal SQL text so both
    engines run the identical double tree (the agg_higher_moments
    pattern). R^2 from the same moments; no second scan, no
    gradient iterations, no collect of anything but one row."""
    li = table(spark, sf_dir, "lineitem")
    x1 = F.col("l_quantity").cast("bigint")
    x2 = cents("l_discount")
    y = cents("l_extendedprice")
    m = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x1).cast("bigint").alias("isx1"),
        F.sum(x2).cast("bigint").alias("isx2"),
        F.sum(x1 * x1).cast("bigint").alias("ix11"),
        F.sum(x2 * x2).cast("bigint").alias("ix22"),
        F.sum(x1 * x2).cast("bigint").alias("ix12"),
        F.sum(y).cast("bigint").alias("isy"),
        F.sum(x1 * y).cast("bigint").alias("ix1y"),
        F.sum(x2 * y).cast("bigint").alias("ix2y"),
        F.sum((y * y).cast("decimal(38,0)")).cast("double").alias("syy"),
    )
    c = m.selectExpr(
        "n",
        "syy",
        "CAST(n AS DOUBLE) AS nd",
        "CAST(isx1 AS DOUBLE) AS sx1",
        "CAST(isx2 AS DOUBLE) AS sx2",
        "CAST(ix11 AS DOUBLE) AS x11",
        "CAST(ix22 AS DOUBLE) AS x22",
        "CAST(ix12 AS DOUBLE) AS x12",
        "CAST(isy AS DOUBLE) AS syd",
        "CAST(ix1y AS DOUBLE) AS x1y",
        "CAST(ix2y AS DOUBLE) AS x2y",
    )
    d = c.selectExpr(
        "*",
        f"{_OLS_D} AS det",
        f"{_OLS_D0} AS det0",
        f"{_OLS_D1} AS det1",
        f"{_OLS_D2} AS det2",
    )
    b = d.selectExpr("*", "det0/det AS b0", "det1/det AS b1", "det2/det AS b2")
    return b.selectExpr(
        "n",
        "ROUND(b0, 6) AS b0_cents",
        "ROUND(b1, 6) AS b1_cents_per_qty",
        "ROUND(b2, 6) AS b2_cents_per_disc_c",
        "ROUND(1.0 - (syy - b0*syd - b1*x1y - b2*x2y)"
        " / (syy - syd*syd/nd), 6) AS r2",
    )


@register(
    "stats_granger_lagged",
    oracle=f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS buy_c,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           AS BIGINT) AS views
  FROM events GROUP BY day
),
lagged AS (
  SELECT cur.buy_c AS yv, prv.buy_c AS l1, prv.views AS l2
  FROM daily cur
  JOIN daily prv ON prv.day = cur.day - INTERVAL 1 DAY
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(l1) AS BIGINT) AS isx1,
         CAST(SUM(l2) AS BIGINT) AS isx2,
         CAST(SUM(l1 * l1) AS BIGINT) AS ix11,
         CAST(SUM(l2 * l2) AS BIGINT) AS ix22,
         CAST(SUM(l1 * l2) AS BIGINT) AS ix12,
         CAST(SUM(yv) AS BIGINT) AS isy,
         CAST(SUM(l1 * yv) AS BIGINT) AS ix1y,
         CAST(SUM(l2 * yv) AS BIGINT) AS ix2y,
         CAST(SUM(yv * yv) AS DOUBLE) AS syy
  FROM lagged
),
c AS (
  SELECT n, syy,
         CAST(n AS DOUBLE) AS nd,
         CAST(isx1 AS DOUBLE) AS sx1, CAST(isx2 AS DOUBLE) AS sx2,
         CAST(ix11 AS DOUBLE) AS x11, CAST(ix22 AS DOUBLE) AS x22,
         CAST(ix12 AS DOUBLE) AS x12,
         CAST(isy AS DOUBLE) AS syd,
         CAST(ix1y AS DOUBLE) AS x1y, CAST(ix2y AS DOUBLE) AS x2y
  FROM m
),
d AS (
  SELECT *, {_OLS_D} AS det, {_OLS_D0} AS det0, {_OLS_D1} AS det1,
         {_OLS_D2} AS det2,
         (nd*x1y - sx1*syd) / (nd*x11 - sx1*sx1) AS br
  FROM c
),
b AS (
  SELECT *, det0/det AS b0, det1/det AS b1, det2/det AS b2,
         (syd - br*sx1) / nd AS ar
  FROM d
),
sse AS (
  SELECT *,
         syy - b0*syd - b1*x1y - b2*x2y AS sse_f,
         syy - ar*syd - br*x1y AS sse_r,
         syy - syd*syd/nd AS sst
  FROM b
)
SELECT n,
       ROUND(1.0 - sse_r/sst, 6) AS r2_restricted,
       ROUND(1.0 - sse_f/sst, 6) AS r2_full,
       ROUND(b2, 6) AS lag_views_coef,
       ROUND((sse_r - sse_f) / (sse_f / (nd - 3.0)), 6) AS f_granger
FROM sse
""",
    tags=("stats", "events", "timeseries"),
)
def stats_granger_lagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRANGER-STYLE LAGGED-REGRESSION SCREEN — does yesterday's VIEW
    traffic predict today's PURCHASE revenue beyond revenue's own
    lag? The bivariate Granger test in its nested-OLS form:
    restricted model y_t ~ y_(t-1), full model y_t ~ y_(t-1) +
    views_(t-1); the incremental F = ((SSE_r - SSE_f)/1) /
    (SSE_f/(n-3)) is the causality statistic. Both fits are closed-
    form on ONE moment pass over the lag-joined daily grid (the
    stats_ols_multiple Cramer fragments are reused verbatim, so both
    engines execute the identical double tree); the lag join is a
    grid-sized self-join on day. Daily sums are exact cents/counts,
    so every moment is an exact BIGINT."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", cents("value")).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("buy_c"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("views"),
    )
    cur = daily.select(
        F.col("day"), F.col("buy_c").alias("yv")
    )
    prv = daily.select(
        (F.col("day") + F.expr("INTERVAL 1 DAY")).alias("day"),
        F.col("buy_c").alias("l1"),
        F.col("views").alias("l2"),
    )
    lagged = cur.join(prv, "day").select("yv", "l1", "l2")
    m = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("l1").cast("bigint").alias("isx1"),
        F.sum("l2").cast("bigint").alias("isx2"),
        F.sum(F.col("l1") * F.col("l1")).cast("bigint").alias("ix11"),
        F.sum(F.col("l2") * F.col("l2")).cast("bigint").alias("ix22"),
        F.sum(F.col("l1") * F.col("l2")).cast("bigint").alias("ix12"),
        F.sum("yv").cast("bigint").alias("isy"),
        F.sum(F.col("l1") * F.col("yv")).cast("bigint").alias("ix1y"),
        F.sum(F.col("l2") * F.col("yv")).cast("bigint").alias("ix2y"),
        F.sum((F.col("yv") * F.col("yv")).cast("decimal(38,0)"))
        .cast("double")
        .alias("syy"),
    )
    c = m.selectExpr(
        "n",
        "syy",
        "CAST(n AS DOUBLE) AS nd",
        "CAST(isx1 AS DOUBLE) AS sx1",
        "CAST(isx2 AS DOUBLE) AS sx2",
        "CAST(ix11 AS DOUBLE) AS x11",
        "CAST(ix22 AS DOUBLE) AS x22",
        "CAST(ix12 AS DOUBLE) AS x12",
        "CAST(isy AS DOUBLE) AS syd",
        "CAST(ix1y AS DOUBLE) AS x1y",
        "CAST(ix2y AS DOUBLE) AS x2y",
    )
    d = c.selectExpr(
        "*",
        f"{_OLS_D} AS det",
        f"{_OLS_D0} AS det0",
        f"{_OLS_D1} AS det1",
        f"{_OLS_D2} AS det2",
        "(nd*x1y - sx1*syd) / (nd*x11 - sx1*sx1) AS br",
    )
    b = d.selectExpr(
        "*",
        "det0/det AS b0",
        "det1/det AS b1",
        "det2/det AS b2",
        "(syd - br*sx1) / nd AS ar",
    )
    sse = b.selectExpr(
        "*",
        "syy - b0*syd - b1*x1y - b2*x2y AS sse_f",
        "syy - ar*syd - br*x1y AS sse_r",
        "syy - syd*syd/nd AS sst",
    )
    return sse.selectExpr(
        "n",
        "ROUND(1.0 - sse_r/sst, 6) AS r2_restricted",
        "ROUND(1.0 - sse_f/sst, 6) AS r2_full",
        "ROUND(b2, 6) AS lag_views_coef",
        "ROUND((sse_r - sse_f) / (sse_f / (nd - 3.0)), 6) AS f_granger",
    )


@register(
    "stats_weibull_fit",
    oracle="""
WITH dur AS (
  SELECT o_custkey,
         date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) + 1 AS t
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT t,
         ROW_NUMBER() OVER (ORDER BY t, o_custkey) AS i,
         COUNT(*) OVER () AS n
  FROM dur
),
pts AS (
  SELECT CAST(FLOOR(ROUND(ln(CAST(t AS DOUBLE)), 9) * 1000000) AS BIGINT)
           AS xm,
         CAST(FLOOR(ROUND(ln(-ln(1.0 - CAST(i AS DOUBLE) / (n + 1))), 9)
                    * 1000000) AS BIGINT) AS ym
  FROM ranked
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xm) AS DOUBLE) AS sx, CAST(SUM(ym) AS DOUBLE) AS sy,
         CAST(SUM(xm * ym) AS DOUBLE) AS sxy,
         CAST(SUM(xm * xm) AS DOUBLE) AS sxx,
         CAST(SUM(ym * ym) AS DOUBLE) AS syy
  FROM pts
),
fit AS (
  SELECT n,
         (n*sxy - sx*sy) / (n*sxx - sx*sx) AS k,
         sx, sy, sxy, sxx, syy
  FROM m
)
SELECT n,
       ROUND(k, 6) AS shape_k,
       ROUND(exp(-((sy - k*sx) / n / 1000000.0) / k), 6) AS scale_lambda,
       ROUND((n*sxy - sx*sy) * (n*sxy - sx*sy)
             / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
FROM fit
""",
    tags=("stats", "agg", "window"),
)
def stats_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIBULL SHAPE/SCALE FIT by the probability-plot method — the
    reliability-engineering standard: customer engagement spans
    (first-to-last order, days) ranked with median-rank plotting
    positions S_i = 1 - i/(n+1), then ln(-ln S) regressed on ln t;
    the slope IS the Weibull shape k (k<1 infant-mortality churn,
    k>1 wear-out) and exp(-intercept/k) the scale lambda. The two
    libm logs are quantized PER POINT to exact micro-units before
    the moment sums (the agg_decayed_sum lane), so the regression
    inputs are exact integers and the closed-form slope/intercept/r2
    are single deterministic double trees. One duration hash-agg,
    one pinned-order rank — round 8 on the two-pass global_rank with
    the plotting-position count n as a broadcast 1-row aggregate, so
    the customer-grain duration table never funnels through one task
    — one moment pass. Lint-clean with no waiver."""
    from ..operators.scale import global_rank  # noqa: PLC0415

    o = table(spark, sf_dir, "orders")
    dur = o.groupBy("o_custkey").agg(
        (F.datediff(F.max("o_orderdate"), F.min("o_orderdate")) + 1).alias("t")
    )
    ncnt = dur.agg(F.count(F.lit(1)).alias("n"))
    ranked = global_rank(
        dur, [F.col("t").asc(), F.col("o_custkey").asc()], rank_col="i"
    ).crossJoin(F.broadcast(ncnt))
    pts = ranked.select(
        F.floor(F.round(F.log(F.col("t").cast("double")), 9) * 1000000)
        .cast("bigint")
        .alias("xm"),
        F.floor(
            F.round(
                F.log(-F.log(1.0 - F.col("i").cast("double") / (F.col("n") + 1))),
                9,
            )
            * 1000000
        )
        .cast("bigint")
        .alias("ym"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xm").cast("double").alias("sx"),
        F.sum("ym").cast("double").alias("sy"),
        F.sum(F.col("xm") * F.col("ym")).cast("double").alias("sxy"),
        F.sum(F.col("xm") * F.col("xm")).cast("double").alias("sxx"),
        F.sum(F.col("ym") * F.col("ym")).cast("double").alias("syy"),
    )
    fit = m.selectExpr(
        "n", "(n*sxy - sx*sy) / (n*sxx - sx*sx) AS k",
        "sx", "sy", "sxy", "sxx", "syy",
    )
    return fit.selectExpr(
        "n",
        "ROUND(k, 6) AS shape_k",
        "ROUND(exp(-((sy - k*sx) / n / 1000000.0) / k), 6) AS scale_lambda",
        "ROUND((n*sxy - sx*sy) * (n*sxy - sx*sy)"
        " / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2",
    )


def _chain_ladder_ultimate_sql() -> str:
    """Ultimate-loss CASE over the fixed 1995..2001 origin grid:
    each origin's latest cumulative column times the product of its
    remaining development factors — one literal expression tree,
    shared by both engines."""
    arms = []
    for origin in range(1995, 2002):
        latest = 2001 - origin
        factors = "".join(f" * f{j}" for j in range(latest, 6))
        arms.append(
            f"WHEN {origin} THEN CAST(c{latest} AS DOUBLE){factors}"
        )
    return "CASE origin " + " ".join(arms) + " END"


def _chain_ladder_latest_sql() -> str:
    arms = [
        f"WHEN {origin} THEN c{2001 - origin}" for origin in range(1995, 2002)
    ]
    return "CASE origin " + " ".join(arms) + " END"


@register(
    "agg_chain_ladder_reserve",
    oracle=f"""
WITH cells AS (
  SELECT date_part('year', o.o_orderdate) AS origin,
         date_part('year', l.l_shipdate) - date_part('year', o.o_orderdate)
           AS dev,
         CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT) AS c
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate >= o.o_orderdate
),
tri AS (
  SELECT origin,
         {', '.join(f"CAST(SUM(CASE WHEN dev <= {j} THEN c ELSE 0 END) AS BIGINT) AS c{j}" for j in range(7))}
  FROM cells GROUP BY origin
),
fac AS (
  SELECT
    {', '.join(f"CAST(SUM(CASE WHEN origin <= {2000 - j} THEN c{j + 1} ELSE 0 END) AS DOUBLE) / CAST(SUM(CASE WHEN origin <= {2000 - j} THEN c{j} ELSE 0 END) AS DOUBLE) AS f{j}" for j in range(6))}
  FROM tri
),
u AS (
  SELECT origin,
         {_chain_ladder_latest_sql()} AS latest_c,
         {_chain_ladder_ultimate_sql()} AS ultimate_d
  FROM tri CROSS JOIN fac
)
SELECT origin,
       CAST(latest_c AS BIGINT) AS latest_cum_c,
       CAST(ROUND(ultimate_d, 0) AS BIGINT) AS ultimate_c,
       CAST(ROUND(ultimate_d, 0) AS BIGINT) - latest_c AS reserve_c
FROM u
""",
    tags=("lineitem", "orders", "finance"),
)
def agg_chain_ladder_reserve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAIN-LADDER RESERVING — the actuarial standard for
    run-off/development triangles, structurally identical to any
    delayed-completion pipeline (claims, returns, late-arriving
    conversions): bookings by ORIGIN year develop across DEV years
    (ship year - order year), the data edge right-censors recent
    origins into a triangle, and volume-weighted development factors
    f_j = sum C_(i,j+1) / sum C_(i,j) (over origins that observed
    both columns) project each origin's latest cumulative to
    ultimate; reserve = ultimate - latest. The triangle pivots to
    one exact-BIGINT wide row per origin, factors reduce to ONE
    broadcast row, and the ultimate is a literal CASE expression
    tree over the fixed origin grid shared with the oracle — every
    double op deterministic. One fact join (orders co-keyed), two
    grid hash-aggs, a broadcast back: the 100 TB plan is the same
    shape with the triangle still grid-sized."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    cells = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.year("o_orderdate").alias("origin"),
            (F.year("l_shipdate") - F.year("o_orderdate")).alias("dev"),
            cents("l_extendedprice").alias("c"),
        )
    )
    tri = cells.groupBy("origin").agg(
        *[
            F.sum(F.when(F.col("dev") <= j, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias(f"c{j}")
            for j in range(7)
        ]
    )
    fac = tri.agg(
        *[
            (
                F.sum(
                    F.when(F.col("origin") <= 2000 - j, F.col(f"c{j + 1}")).otherwise(0)
                ).cast("double")
                / F.sum(
                    F.when(F.col("origin") <= 2000 - j, F.col(f"c{j}")).otherwise(0)
                ).cast("double")
            ).alias(f"f{j}")
            for j in range(6)
        ]
    )
    u = tri.crossJoin(F.broadcast(fac)).selectExpr(
        "origin",
        f"{_chain_ladder_latest_sql()} AS latest_c",
        f"{_chain_ladder_ultimate_sql()} AS ultimate_d",
    )
    return u.selectExpr(
        "origin",
        "CAST(latest_c AS BIGINT) AS latest_cum_c",
        "CAST(ROUND(ultimate_d, 0) AS BIGINT) AS ultimate_c",
        "CAST(ROUND(ultimate_d, 0) AS BIGINT) - latest_c AS reserve_c",
    )


@register(
    "stats_cochran_armitage",
    oracle="""
WITH t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
           AS BIGINT) AS x,
         CAST(SUM(CAST(substr(o_orderpriority, 1, 1) AS INT)) AS BIGINT)
           AS sn,
         CAST(SUM(CAST(substr(o_orderpriority, 1, 1) AS INT)
                  * CAST(substr(o_orderpriority, 1, 1) AS INT)) AS BIGINT)
           AS ssn,
         CAST(SUM(CASE WHEN o_orderstatus = 'F'
                       THEN CAST(substr(o_orderpriority, 1, 1) AS INT)
                       ELSE 0 END) AS BIGINT) AS sx
  FROM orders
)
SELECT n, x,
       ROUND((CAST(sx AS DOUBLE) - CAST(x AS DOUBLE)/n*sn)
             / sqrt(CAST(x AS DOUBLE)/n * (1.0 - CAST(x AS DOUBLE)/n)
                    * (ssn - CAST(sn AS DOUBLE)*sn/n)), 6) AS z_trend,
       ROUND(pow((CAST(sx AS DOUBLE) - CAST(x AS DOUBLE)/n*sn), 2)
             / (CAST(x AS DOUBLE)/n * (1.0 - CAST(x AS DOUBLE)/n)
                * (ssn - CAST(sn AS DOUBLE)*sn/n)), 6) AS chi2_trend
FROM t
""",
    tags=("stats", "agg"),
)
def stats_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COCHRAN–ARMITAGE TREND TEST — is the fulfilled-rate
    MONOTONICALLY ordered across the 1..5 priority ladder? The
    ordinal upgrade of the chi-square independence screen: scores
    s_i = priority digit, T = sum s*x - p*sum s, Var = p(1-p)
    (sum s^2 - (sum s)^2/n), z = T/sqrt(Var) — sensitive to trend
    where chi-square only sees 'different'. Every sufficient
    statistic (n, successes, score sums, score-success cross sum)
    is an exact BIGINT from ONE map-side-combinable pass — no
    pivot, no second scan — and the z/chi2 are single shared double
    trees."""
    o = table(spark, sf_dir, "orders")
    s = F.expr("CAST(substr(o_orderpriority, 1, 1) AS INT)")
    fulfilled = F.col("o_orderstatus") == "F"
    t = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(fulfilled, 1).otherwise(0)).cast("bigint").alias("x"),
        F.sum(s).cast("bigint").alias("sn"),
        F.sum(s * s).cast("bigint").alias("ssn"),
        F.sum(F.when(fulfilled, s).otherwise(0)).cast("bigint").alias("sx"),
    )
    return t.selectExpr(
        "n",
        "x",
        "ROUND((CAST(sx AS DOUBLE) - CAST(x AS DOUBLE)/n*sn)"
        " / sqrt(CAST(x AS DOUBLE)/n * (1.0 - CAST(x AS DOUBLE)/n)"
        " * (ssn - CAST(sn AS DOUBLE)*sn/n)), 6) AS z_trend",
        "ROUND(pow((CAST(sx AS DOUBLE) - CAST(x AS DOUBLE)/n*sn), 2)"
        " / (CAST(x AS DOUBLE)/n * (1.0 - CAST(x AS DOUBLE)/n)"
        " * (ssn - CAST(sn AS DOUBLE)*sn/n)), 6) AS chi2_trend",
    )


_JB_EXPR = (
    f"ROUND(n / 6.0 * (POW({_M3} / POW({_M2}, 1.5), 2)"
    f" + POW({_M4} / ({_M2}*{_M2}) - 3, 2) / 4.0), 6)"
)


@register(
    "stats_jarque_bera",
    oracle=f"""
WITH s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS s1,
         SUM(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS s2,
         SUM(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
             * CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS s3,
         SUM(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
             * CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
             * CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS s4
  FROM orders
)
SELECT n,
       {_SKEW_EXPR} AS skew_pop,
       {_KURT_EXPR} AS kurt_excess,
       {_JB_EXPR} AS jarque_bera
FROM s
""",
    tags=("stats", "agg"),
)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JARQUE–BERA NORMALITY TEST — the moment-based screen (JB =
    n/6*(S^2 + K^2/4), asymptotically chi2_2 under normality) every
    residual-diagnostics pass starts with, here on order values.
    Reuses the pinned higher-moment SQL fragments verbatim (so skew,
    excess kurtosis, and JB are one shared AST on both engines) with
    the raw power sums upgraded to the exact wide-integer lane:
    cents^4 reaches ~1e31, which BIGINT cannot hold but DECIMAL(38)
    (Spark) / HUGEINT (DuckDB) carry exactly through both
    aggregation levels — one final cast to double each. One
    map-side-combinable pass, one output row."""
    o = table(spark, sf_dir, "orders")
    q = cents("o_totalprice")
    qd = q.cast("decimal(38,0)")
    s = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(q).cast("bigint").alias("s1"),
        F.sum(qd * q).alias("s2"),
        F.sum(qd * q * q).alias("s3"),
        F.sum(qd * q * q * q).alias("s4"),
    )
    return s.selectExpr(
        "n",
        f"{_SKEW_EXPR} AS skew_pop",
        f"{_KURT_EXPR} AS kurt_excess",
        f"{_JB_EXPR} AS jarque_bera",
    )


@register(
    "stats_runs_test",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY day
),
ranked AS (
  SELECT day, c,
         ROW_NUMBER() OVER (ORDER BY c, day) AS rn,
         COUNT(*) OVER () AS nn
  FROM daily
),
med AS (
  SELECT CAST(MAX(CASE WHEN rn = (nn + 1) // 2 THEN c END) AS BIGINT)
    AS med_c
  FROM ranked
),
signs AS (
  SELECT day, CASE WHEN c > med_c THEN 1 ELSE 0 END AS s
  FROM daily CROSS JOIN med
  WHERE c <> med_c
),
seq AS (
  SELECT s, LAG(s) OVER (ORDER BY day) AS prev_s FROM signs
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(s) AS BIGINT) AS n1,
         CAST(SUM(1 - s) AS BIGINT) AS n2,
         CAST(1 + SUM(CASE WHEN prev_s IS NOT NULL AND s <> prev_s
                           THEN 1 ELSE 0 END) AS BIGINT) AS r
  FROM seq
)
SELECT n, n1, n2, r,
       ROUND((r - (2.0*n1*n2/n + 1.0))
             / sqrt(2.0*n1*n2*(2.0*n1*n2 - n) / (CAST(n AS DOUBLE)*n*(n-1))),
             6) AS z_runs
FROM agg
""",
    tags=("stats", "events", "timeseries"),
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD–WOLFOWITZ RUNS TEST — is the daily-revenue series random
    around its median, or does it trend/oscillate? Signs above the
    (lower, tie-pinned) median form a binary sequence; R = observed
    runs vs E[R] = 2*n1*n2/n + 1 gives the z statistic (too FEW runs
    = momentum/trend, too MANY = mean-reversion — the cheap
    pre-check before fitting any AR model). Ties at the median drop,
    per the classical prescription. Counts and the run total are
    exact integers off one LAG over the 30-day grid; the z is one
    shared double tree. Daily agg is the only data-sized shuffle."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(cents("value")).cast("bigint").alias("c")
    )
    ranked = daily.select(
        "day",
        "c",
        F.row_number().over(Window.orderBy("c", "day")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nn"),
    )
    med = ranked.agg(
        F.max(
            F.when(F.col("rn") == F.expr("(nn + 1) div 2"), F.col("c"))
        )
        .cast("bigint")
        .alias("med_c")
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("c") != F.col("med_c"))
        .select("day", F.when(F.col("c") > F.col("med_c"), 1).otherwise(0).alias("s"))
    )
    seq = signs.select("s", F.lag("s").over(Window.orderBy("day")).alias("prev_s"))
    agg = seq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("s").cast("bigint").alias("n1"),
        F.sum(1 - F.col("s")).cast("bigint").alias("n2"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev_s").isNotNull()
                    & (F.col("s") != F.col("prev_s")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("r"),
    )
    return agg.selectExpr(
        "n",
        "n1",
        "n2",
        "r",
        "ROUND((r - (2.0*n1*n2/n + 1.0))"
        " / sqrt(2.0*n1*n2*(2.0*n1*n2 - n) / (CAST(n AS DOUBLE)*n*(n-1))),"
        " 6) AS z_runs",
    )


@register(
    "stats_durbin_watson",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY day
),
idx AS (
  SELECT y, date_diff('day', (SELECT MIN(day) FROM daily), day) AS t
  FROM daily
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS st,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(t * t) AS BIGINT) AS stt,
         CAST(SUM(t * y) AS BIGINT) AS sty
  FROM idx
),
fit AS (
  SELECT (n*CAST(sty AS DOUBLE) - CAST(st AS DOUBLE)*sy)
           / (n*CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)*st) AS b,
         n, st, sy, stt, sty
  FROM m
),
resid AS (
  SELECT i.t,
         CAST(FLOOR(ROUND(i.y - ((f.sy - f.b*f.st)/f.n) - f.b*i.t, 6)
                    * 1000) AS BIGINT) AS e_m
  FROM idx i CROSS JOIN fit f
),
seq AS (
  SELECT e_m, LAG(e_m) OVER (ORDER BY t) AS prev_e FROM resid
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CASE WHEN prev_e IS NULL THEN CAST(0 AS HUGEINT)
                           ELSE CAST(e_m - prev_e AS HUGEINT)
                                * (e_m - prev_e) END) AS DOUBLE)
             / CAST(SUM(CAST(e_m AS HUGEINT) * e_m) AS DOUBLE), 6) AS dw
FROM seq
""",
    tags=("stats", "events", "timeseries"),
)
def stats_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DURBIN–WATSON — first-order autocorrelation of the residuals
    of the daily-revenue linear trend (DW ~ 2 means uncorrelated,
    -> 0 positive momentum, -> 4 alternation): the canonical
    post-regression diagnostic, and the reason the Granger key's
    OLS standard errors can't be trusted blindly. The trend fits
    closed-form from exact integer moments; residuals quantize PER
    DAY to milli-cent integers (the standard lane) so the DW
    numerator/denominator square-sums ride the HUGEINT/DECIMAL38
    exact lane and the final ratio is ONE double division. One
    daily hash-agg, one 30-row grid window."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(cents("value")).cast("bigint").alias("y")
    )
    mn = daily.agg(F.min("day").alias("min_day"))
    idx = daily.crossJoin(F.broadcast(mn)).select(
        "y", F.datediff("day", "min_day").cast("bigint").alias("t")
    )
    m = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("stt"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("sty"),
    )
    fit = m.selectExpr(
        "(n*CAST(sty AS DOUBLE) - CAST(st AS DOUBLE)*sy)"
        " / (n*CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)*st) AS b",
        "n",
        "st",
        "sy",
    )
    resid = idx.crossJoin(F.broadcast(fit)).select(
        "t",
        F.floor(
            F.round(
                F.col("y")
                - ((F.col("sy") - F.col("b") * F.col("st")) / F.col("n"))
                - F.col("b") * F.col("t"),
                6,
            )
            * 1000
        )
        .cast("bigint")
        .alias("e_m"),
    )
    seq = resid.select(
        "e_m", F.lag("e_m").over(Window.orderBy("t")).alias("prev_e")
    )
    diff2 = F.when(
        F.col("prev_e").isNull(), F.lit(0).cast("decimal(38,0)")
    ).otherwise(
        ((F.col("e_m") - F.col("prev_e")).cast("decimal(38,0)"))
        * (F.col("e_m") - F.col("prev_e"))
    )
    return seq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(
            F.sum(diff2).cast("double")
            / F.sum(F.col("e_m").cast("decimal(38,0)") * F.col("e_m")).cast(
                "double"
            ),
            6,
        ).alias("dw"),
    )


@register(
    "agg_mrr_bridge",
    oracle="""
WITH per AS (
  SELECT o_custkey AS ck, date_part('year', o_orderdate) AS y,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY ck, y
),
years AS (SELECT unnest(generate_series(1996, 2000)) AS y),
pairs AS (
  SELECT yr.y,
         COALESCE(cur.rev_c, 0) AS cur_c,
         COALESCE(prv.rev_c, 0) AS prv_c
  FROM years yr
  JOIN (SELECT DISTINCT ck FROM per) c ON TRUE
  LEFT JOIN per cur ON cur.ck = c.ck AND cur.y = yr.y
  LEFT JOIN per prv ON prv.ck = c.ck AND prv.y = yr.y - 1
  WHERE COALESCE(cur.rev_c, 0) > 0 OR COALESCE(prv.rev_c, 0) > 0
)
SELECT y AS year,
       CAST(SUM(CASE WHEN prv_c = 0 THEN cur_c ELSE 0 END) AS BIGINT)
         AS new_c,
       CAST(SUM(CASE WHEN prv_c > 0 AND cur_c > prv_c
                     THEN cur_c - prv_c ELSE 0 END) AS BIGINT)
         AS expansion_c,
       CAST(SUM(CASE WHEN cur_c > 0 AND prv_c > cur_c
                     THEN prv_c - cur_c ELSE 0 END) AS BIGINT)
         AS contraction_c,
       CAST(SUM(CASE WHEN cur_c = 0 THEN prv_c ELSE 0 END) AS BIGINT)
         AS churned_c,
       CAST(SUM(cur_c) - SUM(prv_c) AS BIGINT) AS delta_c
FROM pairs GROUP BY y
""",
    tags=("orders", "finance"),
)
def agg_mrr_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURRING-REVENUE BRIDGE — the SaaS board-deck decomposition
    of each year's revenue change into NEW (customer had nothing
    last period), EXPANSION (grew), CONTRACTION (shrank but stayed),
    and CHURNED (went to zero): new + expansion - contraction -
    churned = delta ties out EXACTLY because every lane is the same
    exact integer cents partitioned by sign and zero-ness — the
    additive counterpart to agg_net_revenue_retention's ratios.
    Customer-year revenue is one hash-agg; the year-pair alignment
    is a self-join on (customer, year-1) pruned to customers active
    in either endpoint. At 100 TB both sides of the self-join are
    co-partitioned on the customer key — one shuffle, reused."""
    o = table(spark, sf_dir, "orders")
    per = o.groupBy(
        F.col("o_custkey").alias("ck"), F.year("o_orderdate").alias("y")
    ).agg(F.sum(cents("o_totalprice")).cast("bigint").alias("rev_c"))
    cur = per.select("ck", "y", F.col("rev_c").alias("cur_c"))
    prv = per.select("ck", (F.col("y") + 1).alias("y"), F.col("rev_c").alias("prv_c"))
    pairs = (
        cur.join(prv, ["ck", "y"], "full_outer")
        .filter((F.col("y") >= 1996) & (F.col("y") <= 2000))
        .select(
            "y",
            F.coalesce("cur_c", F.lit(0)).alias("cur_c"),
            F.coalesce("prv_c", F.lit(0)).alias("prv_c"),
        )
        .filter((F.col("cur_c") > 0) | (F.col("prv_c") > 0))
    )
    return pairs.groupBy(F.col("y").alias("year")).agg(
        F.sum(F.when(F.col("prv_c") == 0, F.col("cur_c")).otherwise(0))
        .cast("bigint")
        .alias("new_c"),
        F.sum(
            F.when(
                (F.col("prv_c") > 0) & (F.col("cur_c") > F.col("prv_c")),
                F.col("cur_c") - F.col("prv_c"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("expansion_c"),
        F.sum(
            F.when(
                (F.col("cur_c") > 0) & (F.col("prv_c") > F.col("cur_c")),
                F.col("prv_c") - F.col("cur_c"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("contraction_c"),
        F.sum(F.when(F.col("cur_c") == 0, F.col("prv_c")).otherwise(0))
        .cast("bigint")
        .alias("churned_c"),
        (F.sum("cur_c") - F.sum("prv_c")).cast("bigint").alias("delta_c"),
    )


@register(
    "stats_capture_recapture",
    oracle="""
WITH w1 AS (
  SELECT DISTINCT user_id FROM events
  WHERE ts < TIMESTAMP '2024-01-08'
),
w2 AS (
  SELECT DISTINCT user_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
),
c AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM w1) AS n1,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM w2) AS n2,
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM w1 JOIN w2 USING (user_id)) AS m
)
SELECT n1, n2, m,
       ROUND((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 6) AS chapman_n_hat,
       ROUND(CAST(n1 AS DOUBLE) * n2 / m, 6) AS lincoln_petersen_n_hat,
       ROUND(sqrt((n1 + 1.0) * (n2 + 1.0) * (n1 - m) * (n2 - m)
                  / ((m + 1.0) * (m + 1.0) * (m + 2.0))), 6) AS se_hat
FROM c
""",
    tags=("stats", "events"),
)
def stats_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPTURE-RECAPTURE POPULATION ESTIMATE — the ecology method
    that data engineering quietly reuses to size unobserved
    populations (total users when logging is sampled, true dedup
    cardinality from two imperfect match passes): mark week-1
    actives, recapture in week 2, and N-hat = n1*n2/m
    (Lincoln-Petersen) with the Chapman small-sample correction
    (n1+1)(n2+1)/(m+1) - 1 and its standard error. Three distinct
    scans reduce to three scalar subqueries joined in one row; all
    inputs exact BIGINTs, one shared double tree. The fixture's
    dense users make m large (low SE) — the estimator is exercised,
    not stressed."""
    ev = table(spark, sf_dir, "events")
    w1 = (
        ev.filter(F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
        .select("user_id")
        .distinct()
    )
    w2 = (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-08").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-15").cast("timestamp"))
        )
        .select("user_id")
        .distinct()
    )
    n1 = w1.agg(F.count(F.lit(1)).cast("bigint").alias("n1"))
    n2 = w2.agg(F.count(F.lit(1)).cast("bigint").alias("n2"))
    m = w1.join(w2, "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )
    c = n1.crossJoin(F.broadcast(n2)).crossJoin(F.broadcast(m))
    return c.selectExpr(
        "n1",
        "n2",
        "m",
        "ROUND((n1 + CAST(1 AS DOUBLE)) * (n2 + CAST(1 AS DOUBLE))"
        " / (m + CAST(1 AS DOUBLE)) - CAST(1 AS DOUBLE), 6)"
        " AS chapman_n_hat",
        "ROUND(CAST(n1 AS DOUBLE) * n2 / m, 6) AS lincoln_petersen_n_hat",
        "ROUND(sqrt((n1 + CAST(1 AS DOUBLE)) * (n2 + CAST(1 AS DOUBLE))"
        " * (n1 - m) * (n2 - m)"
        " / ((m + CAST(1 AS DOUBLE)) * (m + CAST(1 AS DOUBLE))"
        " * (m + CAST(2 AS DOUBLE)))), 6) AS se_hat",
    )


@register(
    "agg_catalog_coverage",
    oracle="""
WITH sold AS (
  SELECT l_partkey AS pk, CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY pk
),
banded AS (
  SELECT p.p_partkey,
         CASE WHEN s.pk IS NULL THEN 'never_sold'
              WHEN s.n_lines <= 20 THEN 'tail_le_20'
              WHEN s.n_lines <= 30 THEN 'mid_21_30'
              WHEN s.n_lines <= 40 THEN 'upper_31_40'
              ELSE 'head_41_plus' END AS band,
         COALESCE(s.n_lines, 0) AS n_lines,
         COALESCE(s.qty, 0) AS qty
  FROM part p LEFT JOIN sold s ON p.p_partkey = s.pk
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts FROM part)
SELECT band,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT n_parts FROM tot), 6)
         AS share_of_catalog,
       CAST(SUM(n_lines) AS BIGINT) AS n_lines,
       CAST(SUM(qty) AS BIGINT) AS total_qty
FROM banded GROUP BY band
""",
    tags=("part", "lineitem", "agg"),
)
def agg_catalog_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CATALOG COVERAGE — the assortment/recsys health table: every
    part banded by how often it ever sold (never / tail / mid /
    upper / head — thresholds bracket the fixture's ~30 lines/part
    so every band does real work), with catalog share and demand
    mass per band. The
    'never_sold' band only exists because the CATALOG side drives
    the join (part LEFT JOIN sales) — the classic inventory-
    coverage trap inverted; a recommender trained on sales alone
    cannot even see that band. One sales hash-agg, one dim-driven
    left join (part broadcasts at test SF; co-keyed at 100 TB),
    one 5-band grid agg."""
    li = table(spark, sf_dir, "lineitem")
    pt = table(spark, sf_dir, "part")
    sold = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"),
    )
    band = (
        F.when(F.col("pk").isNull(), "never_sold")
        .when(F.col("n_lines") <= 20, "tail_le_20")
        .when(F.col("n_lines") <= 30, "mid_21_30")
        .when(F.col("n_lines") <= 40, "upper_31_40")
        .otherwise("head_41_plus")
    )
    banded = pt.join(sold, pt["p_partkey"] == sold["pk"], "left").select(
        band.alias("band"),
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.coalesce("qty", F.lit(0)).alias("qty"),
    )
    tot = pt.agg(F.count(F.lit(1)).cast("bigint").alias("n_parts_tot"))
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("n_lines").cast("bigint").alias("n_lines"),
            F.sum("qty").cast("bigint").alias("total_qty"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "band",
            "n_parts",
            F.round(
                F.col("n_parts").cast("double") / F.col("n_parts_tot"), 6
            ).alias("share_of_catalog"),
            "n_lines",
            "total_qty",
        )
    )


@register(
    "stats_mcnemar_paired",
    oracle="""
WITH y97 AS (
  SELECT DISTINCT o_custkey AS ck FROM orders
  WHERE date_part('year', o_orderdate) = 1997
),
y98 AS (
  SELECT DISTINCT o_custkey AS ck FROM orders
  WHERE date_part('year', o_orderdate) = 1998
),
paired AS (
  SELECT c.c_custkey,
         CASE WHEN a.ck IS NOT NULL THEN 1 ELSE 0 END AS in97,
         CASE WHEN b.ck IS NOT NULL THEN 1 ELSE 0 END AS in98
  FROM customer c
  LEFT JOIN y97 a ON c.c_custkey = a.ck
  LEFT JOIN y98 b ON c.c_custkey = b.ck
),
cells AS (
  SELECT CAST(SUM(in97 * in98) AS BIGINT) AS both_active,
         CAST(SUM(in97 * (1 - in98)) AS BIGINT) AS b_lost,
         CAST(SUM((1 - in97) * in98) AS BIGINT) AS c_gained,
         CAST(SUM((1 - in97) * (1 - in98)) AS BIGINT) AS neither
  FROM paired
)
SELECT both_active, b_lost, c_gained, neither,
       ROUND(pow(b_lost - CAST(c_gained AS DOUBLE), 2)
             / (b_lost + CAST(c_gained AS DOUBLE)), 6) AS mcnemar_chi2,
       ROUND((b_lost - CAST(c_gained AS DOUBLE))
             / sqrt(b_lost + CAST(c_gained AS DOUBLE)), 6) AS z
FROM cells
""",
    tags=("stats", "orders", "customer"),
)
def stats_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNEMAR'S TEST — the PAIRED version of the two-proportion
    test (the unpaired z-test double-counts the stable customers):
    did activity change between 1997 and 1998, judged ONLY on the
    discordant pairs — customers active in '97 but not '98 (b)
    versus the reverse (c); chi2 = (b-c)^2/(b+c). This is the right
    test for before/after comparisons on the SAME population —
    churn vs reactivation asymmetry in one number. Two distinct
    scans and two dim-keyed left joins produce exact 2x2 cell
    counts; the statistic is one shared double tree."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    y97 = (
        o.filter(F.year("o_orderdate") == 1997)
        .select(F.col("o_custkey").alias("ck97"))
        .distinct()
    )
    y98 = (
        o.filter(F.year("o_orderdate") == 1998)
        .select(F.col("o_custkey").alias("ck98"))
        .distinct()
    )
    paired = (
        c.join(y97, c["c_custkey"] == y97["ck97"], "left")
        .join(y98, c["c_custkey"] == y98["ck98"], "left")
        .select(
            F.when(F.col("ck97").isNotNull(), 1).otherwise(0).alias("in97"),
            F.when(F.col("ck98").isNotNull(), 1).otherwise(0).alias("in98"),
        )
    )
    cells = paired.agg(
        F.sum(F.col("in97") * F.col("in98")).cast("bigint").alias("both_active"),
        F.sum(F.col("in97") * (1 - F.col("in98"))).cast("bigint").alias("b_lost"),
        F.sum((1 - F.col("in97")) * F.col("in98"))
        .cast("bigint")
        .alias("c_gained"),
        F.sum((1 - F.col("in97")) * (1 - F.col("in98")))
        .cast("bigint")
        .alias("neither"),
    )
    return cells.selectExpr(
        "both_active",
        "b_lost",
        "c_gained",
        "neither",
        "ROUND(pow(b_lost - CAST(c_gained AS DOUBLE), 2)"
        " / (b_lost + CAST(c_gained AS DOUBLE)), 6) AS mcnemar_chi2",
        "ROUND((b_lost - CAST(c_gained AS DOUBLE))"
        " / sqrt(b_lost + CAST(c_gained AS DOUBLE)), 6) AS z",
    )


@register(
    "stats_cohens_kappa",
    oracle="""
WITH med AS (
  SELECT CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS BIGINT)
    AS med_c
  FROM (
    SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
           ROW_NUMBER() OVER (ORDER BY CAST(ROUND(o_totalprice * 100, 0)
                                             AS BIGINT), o_orderkey) AS rn,
           COUNT(*) OVER () AS n
    FROM orders
  )
),
rated AS (
  SELECT CASE WHEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                   > (SELECT med_c FROM med) THEN 1 ELSE 0 END AS r1,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS r2
  FROM orders
),
cells AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(r1 * r2) AS BIGINT) AS a,
         CAST(SUM(r1 * (1 - r2)) AS BIGINT) AS b,
         CAST(SUM((1 - r1) * r2) AS BIGINT) AS c,
         CAST(SUM((1 - r1) * (1 - r2)) AS BIGINT) AS d
  FROM rated
)
SELECT n, a, b, c, d,
       ROUND((CAST(a + d AS DOUBLE) / n
              - (CAST(a + b AS DOUBLE) * (a + c)
                 + CAST(c + d AS DOUBLE) * (b + d)) / (CAST(n AS DOUBLE) * n))
             / (1.0 - (CAST(a + b AS DOUBLE) * (a + c)
                       + CAST(c + d AS DOUBLE) * (b + d))
                      / (CAST(n AS DOUBLE) * n)), 6) AS kappa,
       ROUND(CAST(a + d AS DOUBLE) / n, 6) AS raw_agreement
FROM cells
""",
    tags=("stats", "orders"),
)
def stats_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S KAPPA — agreement between two labelers CORRECTED FOR
    CHANCE (raw agreement flatters whenever the base rates are
    lopsided — the standard gotcha when judging LLM-judge vs human
    labels): here two deterministic 'raters' of every order
    (above-median value vs fulfilled status), kappa = (p_o - p_e) /
    (1 - p_e) with p_e from the raters' marginals. The 2x2 cells
    are one exact-count pass after a tie-pinned lower-median split;
    kappa is one shared double tree. The labeler-QC companion to
    the krippendorff-free eval family (auc, lift, MAP).

    The median's global rank comes from the two-phase global_rank
    operator (range-partition + local rank + tiny offset table) —
    never a single-partition window over the orders; the 1-row count
    broadcast-crosses back in the scalar-subquery shape."""
    from ..operators.scale import global_rank

    o = table(spark, sf_dir, "orders")
    cents_c = cents("o_totalprice")
    ranked = global_rank(
        o.select(cents_c.alias("cents"), "o_orderkey"),
        [F.col("cents").asc(), F.col("o_orderkey").asc()],
        rank_col="rn",
    )
    ntot = ranked.agg(F.count(F.lit(1)).alias("n"))
    med = (
        ranked.crossJoin(F.broadcast(ntot))
        .agg(
            F.max(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("cents"))
            )
            .cast("bigint")
            .alias("med_c")
        )
    )
    rated = o.crossJoin(F.broadcast(med)).select(
        F.when(cents("o_totalprice") > F.col("med_c"), 1)
        .otherwise(0)
        .alias("r1"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("r2"),
    )
    cells = rated.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("r1") * F.col("r2")).cast("bigint").alias("a"),
        F.sum(F.col("r1") * (1 - F.col("r2"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("r1")) * F.col("r2")).cast("bigint").alias("c"),
        F.sum((1 - F.col("r1")) * (1 - F.col("r2"))).cast("bigint").alias("d"),
    )
    return cells.selectExpr(
        "n",
        "a",
        "b",
        "c",
        "d",
        "ROUND((CAST(a + d AS DOUBLE) / n"
        " - (CAST(a + b AS DOUBLE) * (a + c)"
        " + CAST(c + d AS DOUBLE) * (b + d)) / (CAST(n AS DOUBLE) * n))"
        " / (1.0 - (CAST(a + b AS DOUBLE) * (a + c)"
        " + CAST(c + d AS DOUBLE) * (b + d))"
        " / (CAST(n AS DOUBLE) * n)), 6) AS kappa",
        "ROUND(CAST(a + d AS DOUBLE) / n, 6) AS raw_agreement",
    )


@register(
    "agg_var_expected_shortfall",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY day
),
chg AS (
  SELECT day, c - LAG(c) OVER (ORDER BY day) AS delta
  FROM daily
),
ranked AS (
  SELECT delta,
         ROW_NUMBER() OVER (ORDER BY delta, day) AS rn,
         COUNT(*) OVER () AS n
  FROM chg WHERE delta IS NOT NULL
),
var AS (
  SELECT CAST(MAX(CASE WHEN rn = CAST(CEIL(0.05 * n) AS BIGINT)
                       THEN delta END) AS BIGINT) AS var95,
         CAST(MAX(n) AS BIGINT) AS n
  FROM ranked
)
SELECT v.n,
       v.var95 AS var95_c,
       CAST(COUNT(*) AS BIGINT) AS n_tail,
       CAST(SUM(r.delta) AS BIGINT) AS tail_sum_c,
       ROUND(CAST(SUM(r.delta) AS DOUBLE) / COUNT(*), 6) AS es95_c
FROM ranked r CROSS JOIN var v
WHERE r.delta <= v.var95
GROUP BY v.n, v.var95
""",
    tags=("stats", "events", "finance"),
)
def agg_var_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HISTORICAL VALUE-AT-RISK + EXPECTED SHORTFALL — the risk
    pair on day-over-day revenue changes: VaR95 is the explicit
    type-1 order statistic at rank ceil(0.05*n) of the deltas (an
    ACTUAL observed loss, no interpolation), and ES95 — the measure
    Basel replaced VaR with, because VaR says nothing about how bad
    the tail IS — averages every delta at or below it. Deltas are
    exact integer cents off one LAG; ES is a ratio of exact tail
    sums. One pinned rank over the 29-delta grid."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(cents("value")).cast("bigint").alias("c")
    )
    chg = daily.select(
        "day", (F.col("c") - F.lag("c").over(Window.orderBy("day"))).alias("delta")
    ).filter(F.col("delta").isNotNull())
    ranked = chg.select(
        "delta",
        F.row_number().over(Window.orderBy("delta", "day")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    var = ranked.agg(
        F.max(
            F.when(
                F.col("rn") == F.expr("CAST(CEIL(0.05 * n) AS BIGINT)"),
                F.col("delta"),
            )
        )
        .cast("bigint")
        .alias("var95"),
        F.max("n").cast("bigint").alias("n_tot"),
    )
    tail = ranked.drop("n").crossJoin(F.broadcast(var)).filter(
        F.col("delta") <= F.col("var95")
    )
    return tail.groupBy(
        F.col("n_tot").alias("n"), F.col("var95").alias("var95_c")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tail"),
        F.sum("delta").cast("bigint").alias("tail_sum_c"),
        F.round(F.sum("delta").cast("double") / F.count(F.lit(1)), 6).alias(
            "es95_c"
        ),
    ).select("n", "var95_c", "n_tail", "tail_sum_c", "es95_c")


@register(
    "stats_odds_ratio",
    oracle="""
WITH flagged AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS exposed,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS outcome
  FROM orders
),
cells AS (
  SELECT CAST(SUM(exposed * outcome) AS BIGINT) AS a,
         CAST(SUM(exposed * (1 - outcome)) AS BIGINT) AS b,
         CAST(SUM((1 - exposed) * outcome) AS BIGINT) AS c,
         CAST(SUM((1 - exposed) * (1 - outcome)) AS BIGINT) AS d
  FROM flagged
)
SELECT a, b, c, d,
       ROUND(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)
         AS odds_ratio,
       ROUND(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                 - 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
         AS ci95_lo,
       ROUND(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                 + 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
         AS ci95_hi
FROM cells
""",
    tags=("stats", "orders"),
)
def stats_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ODDS RATIO with the WOOLF LOG-INTERVAL — epidemiology's 2x2
    effect measure (and logistic regression's exponentiated
    coefficient): odds of fulfillment for high-priority vs
    low-priority orders, OR = ad/bc, with the 95% CI from the
    log-OR's delta-method variance 1/a + 1/b + 1/c + 1/d. Exact
    cell counts from one conditional-sum pass; OR and both bounds
    are single shared double trees (the z constant is pinned as a
    literal, so there is no inverse-normal to disagree on). An
    interval excluding 1 is the significance read-out."""
    o = table(spark, sf_dir, "orders")
    flagged = o.select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("exposed"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("outcome"),
    )
    cells = flagged.agg(
        F.sum(F.col("exposed") * F.col("outcome")).cast("bigint").alias("a"),
        F.sum(F.col("exposed") * (1 - F.col("outcome")))
        .cast("bigint")
        .alias("b"),
        F.sum((1 - F.col("exposed")) * F.col("outcome"))
        .cast("bigint")
        .alias("c"),
        F.sum((1 - F.col("exposed")) * (1 - F.col("outcome")))
        .cast("bigint")
        .alias("d"),
    )
    return cells.selectExpr(
        "a",
        "b",
        "c",
        "d",
        "ROUND(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)"
        " AS odds_ratio",
        "ROUND(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))"
        " - 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6) AS ci95_lo",
        "ROUND(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))"
        " + 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6) AS ci95_hi",
    )


@register(
    "agg_price_dispersion",
    oracle="""
WITH x AS (
  SELECT p.p_brand AS brand,
         CAST(ROUND(l.l_extendedprice / l.l_quantity * 100, 0) AS BIGINT)
           AS unit_c,
         l.l_orderkey, l.l_linenumber
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
ranked AS (
  SELECT brand, unit_c,
         ROW_NUMBER() OVER (PARTITION BY brand
                            ORDER BY unit_c, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY brand) AS n
  FROM x
),
quart AS (
  SELECT brand,
         CAST(MAX(CASE WHEN rn = (n + 3) // 4 THEN unit_c END) AS BIGINT)
           AS q1_c,
         CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN unit_c END) AS BIGINT)
           AS med_c,
         CAST(MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN unit_c END)
           AS BIGINT) AS q3_c
  FROM ranked GROUP BY brand
),
mom AS (
  SELECT brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(unit_c) AS BIGINT) AS s,
         SUM(CAST(unit_c AS HUGEINT) * unit_c) AS ss
  FROM x GROUP BY brand
)
SELECT m.brand, m.n,
       ROUND(CAST(m.s AS DOUBLE) / m.n, 6) AS mean_unit_c,
       q.med_c,
       ROUND(sqrt(CAST(m.ss AS DOUBLE)/m.n
                  - (CAST(m.s AS DOUBLE)/m.n)*(CAST(m.s AS DOUBLE)/m.n))
             / (CAST(m.s AS DOUBLE)/m.n), 6) AS cv,
       ROUND(CAST(q.q3_c - q.q1_c AS DOUBLE) / q.med_c, 6)
         AS iqr_over_median
FROM mom m JOIN quart q ON m.brand = q.brand
""",
    tags=("agg", "lineitem", "part", "finance"),
)
def agg_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE DISPERSION — the 'law of one price' violation measure
    economists track per market (here per brand): the coefficient
    of variation (sigma over mean, from exact HUGEINT/DECIMAL38
    moment sums) next to the robust IQR-over-median (quartiles as
    tie-pinned lower order statistics at ranks (n+3)//4 and
    (3n+3)//4) — reporting BOTH is the point, since a single fat
    outlier inflates CV while the quartile ratio holds still. Unit
    prices quantize to integer cents once at the source. One window
    rank + two brand-grid aggs."""
    li = table(spark, sf_dir, "lineitem")
    pt = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    x = li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"]).select(
        F.col("p_brand").alias("brand"),
        F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100, 0)
        .cast("bigint")
        .alias("unit_c"),
        "l_orderkey",
        "l_linenumber",
    )
    wb = Window.partitionBy("brand").orderBy(
        "unit_c", "l_orderkey", "l_linenumber"
    )
    ranked = x.select(
        "brand",
        "unit_c",
        F.row_number().over(wb).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("brand")).alias("n"),
    )
    quart = ranked.groupBy("brand").agg(
        F.max(F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("unit_c")))
        .cast("bigint")
        .alias("q1_c"),
        F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("unit_c")))
        .cast("bigint")
        .alias("med_c"),
        F.max(
            F.when(F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("unit_c"))
        )
        .cast("bigint")
        .alias("q3_c"),
    )
    mom = x.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("unit_c").cast("bigint").alias("s"),
        F.sum((F.col("unit_c") * F.col("unit_c")).cast("decimal(38,0)")).alias(
            "ss"
        ),
    )
    mean = F.col("s").cast("double") / F.col("n")
    return mom.join(quart, "brand").select(
        "brand",
        "n",
        F.round(mean, 6).alias("mean_unit_c"),
        "med_c",
        F.round(
            F.sqrt(F.col("ss").cast("double") / F.col("n") - mean * mean)
            / mean,
            6,
        ).alias("cv"),
        F.round(
            (F.col("q3_c") - F.col("q1_c")).cast("double") / F.col("med_c"), 6
        ).alias("iqr_over_median"),
    )


@register(
    "agg_rfm_migration_matrix",
    oracle="""
WITH fy AS (
  SELECT o_custkey AS ck, date_part('year', o_orderdate) AS y,
         CAST(COUNT(*) AS BIGINT) AS f
  FROM orders WHERE date_part('year', o_orderdate) IN (1997, 1998)
  GROUP BY ck, y
),
seg AS (
  SELECT ck, y,
         CASE WHEN f >= 3 THEN 'heavy' WHEN f = 2 THEN 'medium'
              ELSE 'light' END AS s
  FROM fy
),
mat AS (
  SELECT COALESCE(a.s, '<inactive>') AS seg_1997,
         COALESCE(b.s, '<inactive>') AS seg_1998,
         COALESCE(a.ck, b.ck) AS ck
  FROM (SELECT * FROM seg WHERE y = 1997) a
  FULL JOIN (SELECT * FROM seg WHERE y = 1998) b ON a.ck = b.ck
),
rowtot AS (
  SELECT seg_1997, CAST(COUNT(*) AS BIGINT) AS rt FROM mat GROUP BY seg_1997
)
SELECT m.seg_1997, m.seg_1998,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(COUNT(*) AS DOUBLE) / r.rt, 6) AS row_share
FROM mat m JOIN rowtot r ON m.seg_1997 = r.seg_1997
GROUP BY m.seg_1997, m.seg_1998, r.rt
""",
    tags=("orders", "agg", "growth"),
)
def agg_rfm_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEGMENT MIGRATION MATRIX — the year-over-year customer-value
    transition table (the CRM counterpart of the Markov-transition
    key): frequency segments per year (heavy/medium/light by order
    count, '<inactive>' for absent years via a FULL join so both
    churn INTO inactive and acquisition OUT of it are cells, not
    blind spots), cross-tabulated 1997 -> 1998 with row-conditional
    shares. Exact counts; one co-keyed self-join of the per-year
    segment relation; grid-sized output the retention team reads
    directly."""
    o = table(spark, sf_dir, "orders")
    fy = (
        o.filter(F.year("o_orderdate").isin(1997, 1998))
        .groupBy(
            F.col("o_custkey").alias("ck"), F.year("o_orderdate").alias("y")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    seg = fy.select(
        "ck",
        "y",
        F.when(F.col("f") >= 3, "heavy")
        .when(F.col("f") == 2, "medium")
        .otherwise("light")
        .alias("s"),
    )
    a = seg.filter(F.col("y") == 1997).select(
        F.col("ck").alias("ck_a"), F.col("s").alias("s_a")
    )
    b = seg.filter(F.col("y") == 1998).select(
        F.col("ck").alias("ck_b"), F.col("s").alias("s_b")
    )
    mat = a.join(b, a["ck_a"] == b["ck_b"], "full").select(
        F.coalesce("s_a", F.lit("<inactive>")).alias("seg_1997"),
        F.coalesce("s_b", F.lit("<inactive>")).alias("seg_1998"),
    )
    rowtot = mat.groupBy("seg_1997").agg(
        F.count(F.lit(1)).cast("bigint").alias("rt")
    )
    return (
        mat.groupBy("seg_1997", "seg_1998")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .join(F.broadcast(rowtot), "seg_1997")
        .select(
            "seg_1997",
            "seg_1998",
            "n_customers",
            F.round(F.col("n_customers").cast("double") / F.col("rt"), 6).alias(
                "row_share"
            ),
        )
    )


@register(
    "stats_calibration_ece",
    oracle="""
WITH scored AS (
  SELECT CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS p_pct,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem
),
binned AS (
  SELECT p_pct AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS pos,
         CAST(SUM(p_pct) AS BIGINT) AS sum_p_pct
  FROM scored GROUP BY bin
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM binned)
SELECT bin,
       n,
       ROUND(CAST(sum_p_pct AS DOUBLE) / n / 100.0, 6) AS mean_predicted,
       ROUND(CAST(pos AS DOUBLE) / n, 6) AS observed_rate,
       ROUND(abs(CAST(sum_p_pct AS DOUBLE) / n / 100.0
                 - CAST(pos AS DOUBLE) / n), 6) AS bin_gap,
       ROUND(abs(CAST(sum_p_pct AS DOUBLE) / n / 100.0
                 - CAST(pos AS DOUBLE) / n)
             * n / (SELECT nt FROM tot), 6) AS ece_contribution
FROM binned
""",
    tags=("stats", "lineitem", "eval"),
)
def stats_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALIBRATION / EXPECTED CALIBRATION ERROR — the reliability
    diagram as a table: a surrogate probability (discount as a
    0-10% 'return propensity' score) bins by predicted value, and
    each bin reports mean prediction vs observed rate plus its
    n-weighted |gap| contribution — sum the last column and you
    have ECE, the number that catches models whose AUC is fine but
    whose probabilities lie (the metric LLM-judge and risk-score
    consumers actually need). All counts exact; ratios are single
    double divisions; the 11-bin grid is the only window-free
    output."""
    li = table(spark, sf_dir, "lineitem")
    scored = li.select(
        cents("l_discount").alias("p_pct"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    binned = scored.groupBy(F.col("p_pct").alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
        F.sum("p_pct").cast("bigint").alias("sum_p_pct"),
    )
    tot = binned.agg(F.sum("n").cast("bigint").alias("nt"))
    mean_p = F.col("sum_p_pct").cast("double") / F.col("n") / 100.0
    obs = F.col("pos").cast("double") / F.col("n")
    return binned.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        F.round(mean_p, 6).alias("mean_predicted"),
        F.round(obs, 6).alias("observed_rate"),
        F.round(F.abs(mean_p - obs), 6).alias("bin_gap"),
        F.round(F.abs(mean_p - obs) * F.col("n") / F.col("nt"), 6).alias(
            "ece_contribution"
        ),
    )


@register(
    "stats_breusch_pagan",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY day
),
idx AS (
  SELECT y, date_diff('day', (SELECT MIN(day) FROM daily), day) AS t
  FROM daily
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(t * t) AS BIGINT) AS stt, CAST(SUM(t * y) AS BIGINT) AS sty
  FROM idx
),
fit AS (
  SELECT n, st, sy,
         (n*CAST(sty AS DOUBLE) - CAST(st AS DOUBLE)*sy)
           / (n*CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)*st) AS b
  FROM m
),
resid AS (
  SELECT i.t,
         CAST(FLOOR(ROUND(i.y - ((f.sy - f.b*f.st)/f.n) - f.b*i.t, 6))
           AS BIGINT) AS e_m
  FROM idx i CROSS JOIN fit f
),
aux AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS st,
         CAST(SUM(t * t) AS BIGINT) AS stt,
         CAST(SUM(CAST(e_m AS HUGEINT) * e_m) AS DOUBLE) AS sg,
         CAST(SUM(t * CAST(e_m AS HUGEINT) * e_m) AS DOUBLE) AS stg,
         CAST(SUM(CAST(e_m AS HUGEINT) * e_m
                  * CAST(e_m AS HUGEINT) * e_m) AS DOUBLE) AS sgg
  FROM resid
)
SELECT n,
       ROUND(pow(n*stg - CAST(st AS DOUBLE)*sg, 2)
             / ((n*CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)*st)
                * (n*sgg - sg*sg)), 6) AS r2_aux,
       ROUND(n * pow(n*stg - CAST(st AS DOUBLE)*sg, 2)
             / ((n*CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)*st)
                * (n*sgg - sg*sg)), 6) AS lm_stat
FROM aux
""",
    tags=("stats", "events", "timeseries"),
)
def stats_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BREUSCH–PAGAN HETEROSCEDASTICITY TEST (Koenker LM form) —
    does the daily-trend residual VARIANCE itself trend? The
    auxiliary regression of squared residuals on time needs only
    moments again: LM = n * R^2_aux, chi2_1 under homoscedasticity
    — the diagnostic that tells you whether the Granger/OLS keys'
    standard errors can be trusted, completing the battery next to
    Durbin-Watson (serial correlation) and Jarque-Bera (normality).
    Residuals quantize to WHOLE cents (coarser than DW's milli-cent
    lane on purpose: the auxiliary regression needs the residuals'
    FOURTH power, and cents keep e^4 sums ~1e26 — twelve orders of
    magnitude inside the HUGEINT/DECIMAL38 ceiling even at 100x
    scale); R^2_aux is one shared double tree."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(cents("value")).cast("bigint").alias("y")
    )
    mn = daily.agg(F.min("day").alias("min_day"))
    idx = daily.crossJoin(F.broadcast(mn)).select(
        "y", F.datediff("day", "min_day").cast("bigint").alias("t")
    )
    m = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("stt"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("sty"),
    )
    fit = m.selectExpr(
        "n",
        "st",
        "sy",
        "(n*CAST(sty AS DOUBLE) - CAST(st AS DOUBLE)*sy)"
        " / (n*CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)*st) AS b",
    )
    resid = idx.crossJoin(F.broadcast(fit)).select(
        "t",
        F.floor(
            F.round(
                F.col("y")
                - ((F.col("sy") - F.col("b") * F.col("st")) / F.col("n"))
                - F.col("b") * F.col("t"),
                6,
            )
        )
        .cast("bigint")
        .alias("e_m"),
    )
    e2 = (F.col("e_m") * F.col("e_m")).cast("decimal(38,0)")
    aux = resid.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("stt"),
        F.sum(e2).cast("double").alias("sg"),
        F.sum(e2 * F.col("t")).cast("double").alias("stg"),
        F.sum(e2 * e2).cast("double").alias("sgg"),
    )
    return aux.selectExpr(
        "n",
        "ROUND(pow(n*stg - CAST(st AS DOUBLE)*sg, 2)"
        " / ((n*CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)*st)"
        " * (n*sgg - sg*sg)), 6) AS r2_aux",
        "ROUND(n * pow(n*stg - CAST(st AS DOUBLE)*sg, 2)"
        " / ((n*CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)*st)"
        " * (n*sgg - sg*sg)), 6) AS lm_stat",
    )


@register(
    "agg_lorenz_deciles",
    oracle="""
WITH per AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT rev_c,
         NTILE(10) OVER (ORDER BY rev_c, o_custkey) AS decile
  FROM per
),
per_d AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(rev_c) AS BIGINT) AS rev_c
  FROM ranked GROUP BY decile
),
tot AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS t FROM per_d)
SELECT decile, n_customers, rev_c,
       ROUND(CAST(rev_c AS DOUBLE) / (SELECT t FROM tot), 6)
         AS share_of_revenue,
       ROUND(CAST(SUM(rev_c) OVER (ORDER BY decile) AS DOUBLE)
             / (SELECT t FROM tot), 6) AS cum_share
FROM per_d
""",
    tags=("orders", "agg", "finance"),
)
def agg_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LORENZ CURVE BY DECILE — revenue concentration as the table
    the Gini coefficient integrates (agg_gini_revenue gives the
    area; this gives the SHAPE — 'the top decile is 18% of revenue'
    is an actionable sentence, 0.12 is not): customers rank by
    revenue into tie-pinned NTILE deciles, each reporting its share
    and the running cumulative share (the Lorenz ordinate). Exact
    cent sums; two ratios per row. Round 8: the decile assignment
    RUNS on the two-pass global_ntile operator (exact NTILE
    remainder arithmetic over global_rank — bit-identical to
    NTILE(10) at any scale), so no customer-grain relation funnels
    through one task; the one remaining funnel is the 10-row decile
    grid itself."""
    from ..operators.scale import global_ntile  # noqa: PLC0415

    o = table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).cast("bigint").alias("rev_c")
    )
    ranked = global_ntile(
        per,
        [F.col("rev_c").asc(), F.col("o_custkey").asc()],
        10,
        out_col="decile",
    ).select("rev_c", "decile")
    per_d = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("rev_c").cast("bigint").alias("rev_c"),
    )
    tot = per_d.agg(F.sum("rev_c").cast("bigint").alias("t"))
    return per_d.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n_customers",
        "rev_c",
        F.round(F.col("rev_c").cast("double") / F.col("t"), 6).alias(
            "share_of_revenue"
        ),
        F.round(
            F.sum("rev_c").over(Window.orderBy("decile")).cast("double")
            / F.col("t"),
            6,
        ).alias("cum_share"),
    )


@register(
    "stats_markov_entropy_rate",
    oracle="""
WITH ev AS (
  SELECT event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
),
counts AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
  FROM ev WHERE dst IS NOT NULL GROUP BY src, dst
),
rowtot AS (
  SELECT src, CAST(SUM(n) AS BIGINT) AS rt FROM counts GROUP BY src
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts),
terms AS (
  SELECT c.src, c.dst,
         CAST(FLOOR(ROUND(
           -(CAST(c.n AS DOUBLE) / (SELECT t FROM tot))
             * ln(CAST(c.n AS DOUBLE) / r.rt) / ln(2.0), 12)
           * 1000000000) AS BIGINT) AS term_nano
  FROM counts c JOIN rowtot r ON c.src = r.src
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(CAST(SUM(term_nano) AS BIGINT) / 1000000000.0, 6)
         AS entropy_rate_bits,
       ROUND(ln(5.0) / ln(2.0), 6) AS max_entropy_bits
FROM terms
""",
    tags=("stats", "events"),
)
def stats_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENTROPY RATE of the event-type Markov chain — how
    unpredictable is the NEXT action given the current one, in bits
    per step: H = -sum_ij pi_i p_ij log2 p_ij with the stationary
    weight estimated empirically (each transition contributes its
    corpus frequency, so pi_i p_ij = n_ij / N exactly). Against the
    log2(5) ceiling this is the behavioral-predictability number —
    the gap IS the signal a next-action model can exploit (and the
    information-theoretic sibling of iter_markov_stationary, which
    extracts the same chain's equilibrium instead). Per-cell terms
    quantize to nano-bits before the 25-cell sum; counts are exact
    from one LEAD + one hash-agg."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    rowtot = counts.groupBy("src").agg(F.sum("n").cast("bigint").alias("rt"))
    tot = counts.agg(F.sum("n").cast("bigint").alias("t"))
    terms = (
        counts.join(F.broadcast(rowtot), "src")
        .crossJoin(F.broadcast(tot))
        .select(
            F.floor(
                F.round(
                    -(F.col("n").cast("double") / F.col("t"))
                    * F.log(F.col("n").cast("double") / F.col("rt"))
                    / F.log(F.lit(2.0)),
                    12,
                )
                * 1000000000
            )
            .cast("bigint")
            .alias("term_nano")
        )
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.round(F.sum("term_nano").cast("bigint") / 1000000000.0, 6).alias(
            "entropy_rate_bits"
        ),
        F.round(F.log(F.lit(5.0)) / F.log(F.lit(2.0)), 6).alias(
            "max_entropy_bits"
        ),
    )


@register(
    "stats_pca_2x2_analytic",
    oracle="""
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS sy,
         CAST(SUM(CAST(p_size AS BIGINT) * CAST(p_size AS BIGINT))
           AS BIGINT) AS sxx,
         CAST(SUM(CAST(p_size AS BIGINT)
                  * CAST(ROUND(p_retailprice * 100, 0) AS BIGINT))
           AS BIGINT) AS sxy,
         SUM(CAST(CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)) AS syy
  FROM part
),
cov AS (
  SELECT n,
         CAST(sxx AS DOUBLE)/n - (CAST(sx AS DOUBLE)/n)*(CAST(sx AS DOUBLE)/n)
           AS a,
         CAST(sxy AS DOUBLE)/n - (CAST(sx AS DOUBLE)/n)*(CAST(sy AS DOUBLE)/n)
           AS b,
         CAST(syy AS DOUBLE)/n - (CAST(sy AS DOUBLE)/n)*(CAST(sy AS DOUBLE)/n)
           AS d
  FROM m
)
SELECT n,
       ROUND((a + d)/2.0 + sqrt(pow((a - d)/2.0, 2) + b*b), 6) AS lambda1,
       ROUND((a + d)/2.0 - sqrt(pow((a - d)/2.0, 2) + b*b), 6) AS lambda2,
       ROUND(((a + d)/2.0 + sqrt(pow((a - d)/2.0, 2) + b*b)) / (a + d), 6)
         AS explained_ratio,
       ROUND(atan2(2.0*b, a - d) / 2.0, 6) AS rotation_rad
FROM cov
""",
    tags=("stats", "part", "featureeng"),
)
def stats_pca_2x2_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x2 PCA IN CLOSED FORM — the analytic eigendecomposition of
    the (size, price) covariance: lambda = (a+d)/2 +-
    sqrt(((a-d)/2)^2 + b^2), rotation = atan2(2b, a-d)/2 — the
    exact counterpart of embedding_pca_power's ITERATIVE top
    component, useful whenever the feature pair is known and the
    eigenproblem should cost one expression, not a loop. Covariance
    entries come from exact integer moment sums (price^2 on the
    HUGEINT/DECIMAL38 lane); eigenvalues, explained-variance ratio,
    and the principal angle are one shared double tree. One
    map-side-combinable pass."""
    pt = table(spark, sf_dir, "part")
    x = F.col("p_size").cast("bigint")
    y = cents("p_retailprice")
    m = pt.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).cast("bigint").alias("sx"),
        F.sum(y).cast("bigint").alias("sy"),
        F.sum(x * x).cast("bigint").alias("sxx"),
        F.sum(x * y).cast("bigint").alias("sxy"),
        F.sum((y * y).cast("decimal(38,0)")).alias("syy"),
    )
    cov = m.selectExpr(
        "n",
        "CAST(sxx AS DOUBLE)/n"
        " - (CAST(sx AS DOUBLE)/n)*(CAST(sx AS DOUBLE)/n) AS a",
        "CAST(sxy AS DOUBLE)/n"
        " - (CAST(sx AS DOUBLE)/n)*(CAST(sy AS DOUBLE)/n) AS b",
        "CAST(syy AS DOUBLE)/n"
        " - (CAST(sy AS DOUBLE)/n)*(CAST(sy AS DOUBLE)/n) AS d",
    )
    return cov.selectExpr(
        "n",
        "ROUND((a + d)/2.0 + sqrt(pow((a - d)/2.0, 2) + b*b), 6) AS lambda1",
        "ROUND((a + d)/2.0 - sqrt(pow((a - d)/2.0, 2) + b*b), 6) AS lambda2",
        "ROUND(((a + d)/2.0 + sqrt(pow((a - d)/2.0, 2) + b*b)) / (a + d), 6)"
        " AS explained_ratio",
        "ROUND(atan2(2.0*b, a - d) / 2.0, 6) AS rotation_rad",
    )


@register(
    "stats_paired_ttest",
    oracle="""
WITH per AS (
  SELECT o_custkey AS ck, date_part('year', o_orderdate) AS y,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders WHERE date_part('year', o_orderdate) IN (1997, 1998)
  GROUP BY ck, y
),
pairs AS (
  SELECT a.rev_c - b.rev_c AS d
  FROM (SELECT ck, rev_c FROM per WHERE y = 1998) a
  JOIN (SELECT ck, rev_c FROM per WHERE y = 1997) b ON a.ck = b.ck
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d) AS BIGINT) AS s,
         SUM(CAST(d AS HUGEINT) * d) AS ss
  FROM pairs
)
SELECT n,
       ROUND(CAST(s AS DOUBLE) / n, 6) AS mean_diff_c,
       ROUND((CAST(s AS DOUBLE) / n)
             / sqrt((CAST(ss AS DOUBLE)/(n - 1)
                     - CAST(s AS DOUBLE)*s/n/(n - 1)) / n), 6) AS t_stat
FROM m
""",
    tags=("stats", "orders"),
)
def stats_paired_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIRED t-TEST — did the SAME customers spend more in 1998
    than 1997? The within-subject design that the Welch key
    (stats_ab_ttest) cannot replace: pairing differences out each
    customer's own level, so between-customer variance — usually
    the dominant term — never enters the denominator. The test is
    a one-sample t on exact integer cent differences; the moment
    sums ride the HUGEINT/DECIMAL38 lane and t = mean_d /
    sqrt(s^2_d / n) is one shared double tree. One co-keyed
    self-join, one pass."""
    o = table(spark, sf_dir, "orders")
    per = (
        o.filter(F.year("o_orderdate").isin(1997, 1998))
        .groupBy(
            F.col("o_custkey").alias("ck"), F.year("o_orderdate").alias("y")
        )
        .agg(F.sum(cents("o_totalprice")).cast("bigint").alias("rev_c"))
    )
    a = per.filter(F.col("y") == 1998).select(
        "ck", F.col("rev_c").alias("r98")
    )
    b = per.filter(F.col("y") == 1997).select(
        "ck", F.col("rev_c").alias("r97")
    )
    pairs = a.join(b, "ck").select((F.col("r98") - F.col("r97")).alias("d"))
    m = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d").cast("bigint").alias("s"),
        F.sum((F.col("d") * F.col("d")).cast("decimal(38,0)")).alias("ss"),
    )
    return m.selectExpr(
        "n",
        "ROUND(CAST(s AS DOUBLE) / n, 6) AS mean_diff_c",
        "ROUND((CAST(s AS DOUBLE) / n)"
        " / sqrt((CAST(ss AS DOUBLE)/(n - 1)"
        " - CAST(s AS DOUBLE)*s/n/(n - 1)) / n), 6) AS t_stat",
    )


@register(
    "stats_g_test",
    oracle="""
WITH obs AS (
  SELECT o_orderstatus AS r, o_orderpriority AS c,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY r, c
),
margins AS (SELECT r, CAST(SUM(n) AS BIGINT) AS rn FROM obs GROUP BY r),
colm AS (SELECT c, CAST(SUM(n) AS BIGINT) AS cn FROM obs GROUP BY c),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM obs),
terms AS (
  SELECT CAST(FLOOR(ROUND(
           2.0 * obs.n * ln(CAST(obs.n AS DOUBLE)
                            / (CAST(rn AS DOUBLE) * cn / t)), 9)
           * 1000000) AS BIGINT) AS term_micro
  FROM obs
  JOIN margins ON margins.r = obs.r
  JOIN colm ON colm.c = obs.c
  CROSS JOIN tot
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(CAST(SUM(term_micro) AS BIGINT) / 1000000.0, 6) AS g_stat
FROM terms
""",
    tags=("stats", "agg"),
)
def stats_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-TEST (likelihood-ratio chi-square) — G = 2 sum O ln(O/E)
    over the same (status x priority) contingency as
    stats_chi_square: asymptotically the same chi2_2df reference but
    ADDITIVE over table partitions (G of a merged table decomposes
    exactly into within + between components, which Pearson's X^2
    does not) — the property that makes it the right statistic for
    hierarchical/drill-down independence testing. Per-cell terms
    quantize to micro-units before the sum (libm ln lane); margins
    broadcast."""
    o = table(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderstatus").alias("r"),
        F.col("o_orderpriority").alias("c"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    margins = obs.groupBy("r").agg(F.sum("n").cast("bigint").alias("rn"))
    colm = obs.groupBy("c").agg(F.sum("n").cast("bigint").alias("cn"))
    tot = obs.agg(F.sum("n").cast("bigint").alias("t"))
    e = F.col("rn").cast("double") * F.col("cn") / F.col("t")
    terms = (
        obs.join(F.broadcast(margins), "r")
        .join(F.broadcast(colm), "c")
        .crossJoin(F.broadcast(tot))
        .select(
            F.floor(
                F.round(
                    2.0 * F.col("n") * F.log(F.col("n").cast("double") / e), 9
                )
                * 1000000
            )
            .cast("bigint")
            .alias("term_micro")
        )
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.round(F.sum("term_micro").cast("bigint") / 1000000.0, 6).alias(
            "g_stat"
        ),
    )


@register(
    "stats_poisson_rate_test",
    oracle="""
WITH w AS (
  SELECT CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END)
         AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END)
         AS BIGINT) AS n2,
         14.0 AS d1,
         CAST(date_diff('day', TIMESTAMP '2024-01-15',
                        MAX(ts) + INTERVAL 1 DAY) AS DOUBLE) AS d2
  FROM events WHERE event_type = 'error'
)
SELECT n1, n2,
       ROUND(n1 / d1, 6) AS rate1_per_day,
       ROUND(n2 / d2, 6) AS rate2_per_day,
       ROUND((n2 / d2) / (n1 / d1), 6) AS rate_ratio,
       ROUND(ln((n2 / d2) / (n1 / d1))
             / sqrt(1.0/n1 + 1.0/n2), 6) AS z_lnrr
FROM w
""",
    tags=("stats", "events"),
)
def stats_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SAMPLE POISSON RATE TEST — did the ERROR rate change
    between the first two weeks and the rest of the month? Counts
    over exposure windows, the rate ratio, and the log-rate-ratio z
    with variance 1/n1 + 1/n2 (the delta-method form SRE burn-rate
    alerting uses; the count-data sibling of the proportion z-test).
    Exposures are exact day spans (the second window's span comes
    from the data edge, not an assumption); everything is one
    conditional-sum pass and one shared double tree."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    )
    cut = F.lit("2024-01-15").cast("timestamp")
    w = ev.agg(
        F.sum(F.when(F.col("ts") < cut, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("ts") >= cut, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        F.lit(14.0).alias("d1"),
        (
            F.datediff(
                F.date_add(F.max("ts").cast("date"), 1),
                cut.cast("date"),
            )
        )
        .cast("double")
        .alias("d2"),
    )
    return w.selectExpr(
        "n1",
        "n2",
        "ROUND(n1 / d1, 6) AS rate1_per_day",
        "ROUND(n2 / d2, 6) AS rate2_per_day",
        "ROUND((n2 / d2) / (n1 / d1), 6) AS rate_ratio",
        "ROUND(ln((n2 / d2) / (n1 / d1))"
        " / sqrt(1.0/n1 + 1.0/n2), 6) AS z_lnrr",
    )


@register(
    "agg_hhi_by_year",
    oracle="""
WITH share AS (
  SELECT date_part('year', l.l_shipdate) AS y, l.l_suppkey AS sk,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
           AS BIGINT) AS rev_c
  FROM lineitem l GROUP BY y, sk
),
tot AS (SELECT y, CAST(SUM(rev_c) AS BIGINT) AS t FROM share GROUP BY y),
hhi AS (
  SELECT s.y,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(SUM(CAST(ROUND(
           pow(CAST(s.rev_c AS DOUBLE) / t.t, 2) * 100000000 * 10000, 0)
           AS BIGINT)) AS BIGINT) AS hhi_q
  FROM share s JOIN tot t ON s.y = t.y
  GROUP BY s.y
)
SELECT y AS year, n_suppliers,
       ROUND(hhi_q / 10000.0, 6) AS hhi,
       ROUND(hhi_q / 10000.0
             - LAG(hhi_q / 10000.0) OVER (ORDER BY y), 6) AS hhi_delta
FROM hhi
""",
    tags=("agg", "lineitem", "finance"),
)
def agg_hhi_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HHI CONCENTRATION TREND — the Herfindahl index (sum of
    squared market shares, x10^8 points convention) per shipment
    year with its year-over-year delta: agg_revenue_hhi answers
    'how concentrated', this answers the antitrust/vendor-risk
    question 'is concentration RISING'. Per-(year, supplier) revenue
    is exact cents; each squared share quantizes to 1e-4 HHI points
    before the year sum (the standard lane), and the delta is one
    LAG over the 7-year grid. Two hash-aggs + one co-keyed join."""
    li = table(spark, sf_dir, "lineitem")
    share = li.groupBy(
        F.year("l_shipdate").alias("y"), F.col("l_suppkey").alias("sk")
    ).agg(F.sum(cents("l_extendedprice")).cast("bigint").alias("rev_c"))
    tot = share.groupBy("y").agg(F.sum("rev_c").cast("bigint").alias("t"))
    hhi = (
        share.join(F.broadcast(tot), "y")
        .groupBy("y")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.sum(
                F.round(
                    F.pow(F.col("rev_c").cast("double") / F.col("t"), 2)
                    * 100000000
                    * 10000,
                    0,
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("hhi_q"),
        )
    )
    return hhi.select(
        F.col("y").alias("year"),
        "n_suppliers",
        F.round(F.col("hhi_q") / 10000.0, 6).alias("hhi"),
        F.round(
            F.col("hhi_q") / 10000.0
            - F.lag(F.col("hhi_q") / 10000.0).over(Window.orderBy("y")),
            6,
        ).alias("hhi_delta"),
    )


_KMV_K = 128

_KMV_FRAC_SQL = """
  (SELECT SUM(
     (CASE WHEN c BETWEEN '0' AND '9' THEN ascii(c) - 48
           ELSE ascii(c) - 87 END)
     * POWER(16, 13 - g.i)::DOUBLE)
   FROM (SELECT UNNEST(range(1, 14)) AS i) g,
        LATERAL (SELECT substr({kth}, g.i::INT, 1) AS c) cc
  ) / POWER(16, 13)::DOUBLE
"""


@register(
    "agg_kmv_distinct_intersect",
    oracle=f"""
WITH base AS (
  SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS y,
         md5(CAST(o_custkey AS VARCHAR)) AS h
  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
),
ranked AS (
  SELECT y, h, ROW_NUMBER() OVER (PARTITION BY y ORDER BY h) AS r
  FROM base
),
kept AS (SELECT y, h FROM ranked WHERE r <= {_KMV_K}),
per AS (
  SELECT y, CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(h) AS kth
  FROM kept GROUP BY y
),
per_est AS (
  SELECT y, n_kept,
         CASE WHEN n_kept < {_KMV_K} THEN CAST(n_kept AS BIGINT)
              ELSE CAST(ROUND(({_KMV_K} - 1)
                   / ({_KMV_FRAC_SQL.format(kth='per.kth')}), 0) AS BIGINT)
         END AS est
  FROM per
),
uni AS (
  SELECT h FROM (SELECT DISTINCT h FROM base) u ORDER BY h
  LIMIT {_KMV_K}
),
uni_stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(h) AS kth,
         CAST(SUM(CASE WHEN a.ha IS NOT NULL AND b.hb IS NOT NULL
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_both
  FROM uni
  LEFT JOIN (SELECT h AS ha FROM base WHERE y = 1995) a ON uni.h = a.ha
  LEFT JOIN (SELECT h AS hb FROM base WHERE y = 1996) b ON uni.h = b.hb
),
uni_est AS (
  SELECT n_kept, n_both,
         CASE WHEN n_kept < {_KMV_K} THEN n_kept
              ELSE CAST(ROUND(({_KMV_K} - 1)
                   / ({_KMV_FRAC_SQL.format(kth='uni_stats.kth')}), 0)
                   AS BIGINT)
         END AS union_est
  FROM uni_stats
),
ex AS (
  SELECT
    CAST(COUNT(DISTINCT CASE WHEN y = 1995 THEN h END) AS BIGINT) AS n95,
    CAST(COUNT(DISTINCT CASE WHEN y = 1996 THEN h END) AS BIGINT) AS n96
  FROM base
)
SELECT
  (SELECT est FROM per_est WHERE y = 1995) AS est_1995,
  (SELECT est FROM per_est WHERE y = 1996) AS est_1996,
  u.union_est,
  CAST(ROUND(u.n_both * 1.0 / u.n_kept * u.union_est, 0) AS BIGINT)
    AS intersect_est,
  ROUND(u.n_both * 1.0 / u.n_kept, 6) AS jaccard_est,
  ex.n95 AS exact_1995, ex.n96 AS exact_1996
FROM uni_est u CROSS JOIN ex
""",
    tags=("agg", "sketch"),
)
def agg_kmv_distinct_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) DISTINCT SKETCH with set INTERSECTION —
    the capability HyperLogLog fundamentally lacks (HLL unions are
    lossless, HLL intersections via inclusion-exclusion blow up):
    keep the k smallest hash values per set; the k-th smallest,
    viewed as a uniform draw in (0,1), estimates the distinct count
    as (k-1)/U_k, and because a KMV sketch IS a uniform sample of
    the hash space, the union sketch's overlap fraction estimates
    Jaccard directly — intersection = jaccard x union_est (the
    theta-sketch trick). Sets here are 1995 vs 1996 order customers
    (genuine repeat-customer overlap). Every step is DETERMINISTIC
    and cross-engine exact — md5 strings order identically in both
    engines, the 13-hex-digit fraction is 52 bits (exact in a
    double), so unlike HLL/approx keys this sketch HASH-CHECKS
    against the oracle bit-for-bit, exact distincts included for
    reference. At 100 TB: per-set k-smallest is a per-group
    TakeOrdered (never a global sort), sketches are k-sized and
    broadcastable, and merges are associative — the same
    shard-then-merge story as dedup_exact_sharded."""
    k = _KMV_K
    o = table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    base = o.select(
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.md5(F.col("o_custkey").cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("y").orderBy("h")
    kept = base.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= k
    )
    frac = (
        F.conv(F.substring("kth", 1, 13), 16, 10).cast("double")
        / float(16**13)
    )
    per = (
        kept.groupBy("y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"),
             F.max("h").alias("kth"))
        .select(
            "y",
            F.when(F.col("n_kept") < k, F.col("n_kept"))
            .otherwise(F.round((k - 1) / frac, 0).cast("bigint"))
            .alias("est"),
        )
    )
    uni = base.select("h").distinct().orderBy("h").limit(k)
    # Membership via semi-joins keyed on the k union hashes: the
    # k-row sketch is the BROADCAST side and the corpus-grain
    # per-year sets STREAM past it (round 9 fix — the old shape
    # broadcast the full per-year hash sets, which grow with the
    # corpus, inverting the sketch's own scale story). base is
    # distinct on (y, h), so each hits side is <= k unique hashes
    # and the final intersection join is tiny x tiny.
    a_hits = (
        base.filter(F.col("y") == 1995)
        .join(F.broadcast(uni), "h", "left_semi")
        .select("h")
    )
    b_hits = (
        base.filter(F.col("y") == 1996)
        .join(F.broadcast(uni), "h", "left_semi")
        .select("h")
    )
    nboth = a_hits.join(F.broadcast(b_hits), "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_both")
    )
    uni_stats = uni.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.max("h").alias("kth"),
    ).crossJoin(F.broadcast(nboth))
    uni_est = uni_stats.select(
        "n_kept",
        "n_both",
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(F.round((k - 1) / frac, 0).cast("bigint"))
        .alias("union_est"),
    )
    ex = base.agg(
        F.countDistinct(F.when(F.col("y") == 1995, F.col("h"))).cast(
            "bigint"
        ).alias("exact_1995"),
        F.countDistinct(F.when(F.col("y") == 1996, F.col("h"))).cast(
            "bigint"
        ).alias("exact_1996"),
    )
    est95 = per.filter(F.col("y") == 1995).select(
        F.col("est").alias("est_1995")
    )
    est96 = per.filter(F.col("y") == 1996).select(
        F.col("est").alias("est_1996")
    )
    return (
        est95.crossJoin(F.broadcast(est96))
        .crossJoin(F.broadcast(uni_est))
        .crossJoin(F.broadcast(ex))
        .select(
            "est_1995",
            "est_1996",
            "union_est",
            F.round(
                F.col("n_both") * 1.0 / F.col("n_kept") * F.col("union_est"),
                0,
            )
            .cast("bigint")
            .alias("intersect_est"),
            F.round(F.col("n_both") * 1.0 / F.col("n_kept"), 6).alias(
                "jaccard_est"
            ),
            "exact_1995",
            "exact_1996",
        )
    )


# ---------------------------------------------------------- round 9
# Nonparametric / exact-test family: Kruskal-Wallis (K-group rank
# test on the value histogram), Fisher's exact 2x2, Friedman's
# within-block rank test, and the Murphy decomposition of the Brier
# score. All follow the house grid-lane discipline: corpus-scale
# work is one hash aggregate; the statistic folds over a bounded
# grid with exact-integer (or quantized-lane) arithmetic so both
# engines agree bit-for-bit.


@register(
    "stats_kruskal_wallis",
    oracle="""
WITH hist AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS na_v,
         SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS nn_v,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS nr_v
  FROM lineitem GROUP BY q
),
cum AS (
  SELECT na_v, nn_v, nr_v, na_v + nn_v + nr_v AS t_v,
         COALESCE(SUM(na_v + nn_v + nr_v) OVER (
           ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_t
  FROM hist
),
lanes AS (
  SELECT CAST(SUM(na_v) AS BIGINT) AS n_a,
         CAST(SUM(nn_v) AS BIGINT) AS n_n,
         CAST(SUM(nr_v) AS BIGINT) AS n_r,
         CAST(SUM(na_v * (2 * cum_t + t_v + 1)) AS BIGINT) AS r2_a,
         CAST(SUM(nn_v * (2 * cum_t + t_v + 1)) AS BIGINT) AS r2_n,
         CAST(SUM(nr_v * (2 * cum_t + t_v + 1)) AS BIGINT) AS r2_r,
         CAST(SUM(t_v * t_v * t_v - t_v) AS BIGINT) AS tie_sum
  FROM cum
),
h AS (
  SELECT n_a, n_n, n_r,
         CAST(n_a + n_n + n_r AS DOUBLE) AS nd,
         (CAST(r2_a AS DOUBLE) * CAST(r2_a AS DOUBLE) / (4.0 * n_a)
          + CAST(r2_n AS DOUBLE) * CAST(r2_n AS DOUBLE) / (4.0 * n_n)
          + CAST(r2_r AS DOUBLE) * CAST(r2_r AS DOUBLE) / (4.0 * n_r)
         ) AS ssq,
         CAST(tie_sum AS DOUBLE) AS tie_d
  FROM lanes
)
SELECT n_a, n_n, n_r,
       ROUND(12.0 / (nd * (nd + 1.0)) * ssq - 3.0 * (nd + 1.0), 6) AS h_stat,
       ROUND((12.0 / (nd * (nd + 1.0)) * ssq - 3.0 * (nd + 1.0))
             / (1.0 - tie_d / (nd * nd * nd - nd)), 6) AS h_adj
FROM h
""",
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL-WALLIS H — the K-group generalization of the
    Mann-Whitney rank test (one-way ANOVA on ranks): do the three
    return-flag populations (A/N/R) differ in quantity location,
    with no normality assumption? Same scalable identity as
    stats_mann_whitney_u: never rank rows globally — work on the
    VALUE HISTOGRAM, where every group-g row at value v has average
    rank cum_t + (t_v+1)/2, so the DOUBLED rank sum 2*R_g =
    sum n_gv*(2*cum_t + t_v + 1) is exact BIGINT arithmetic over a
    domain-sized grid (50 quantity levels regardless of corpus).
    H = 12/(N(N+1)) * sum_g R_g^2/n_g - 3(N+1), tie-corrected by
    C = 1 - sum(t^3-t)/(N^3-N); both fold on ONE result row from
    exact integer lanes (tie cubes stay exact through t ~ 2.1e6
    rows per grid value; beyond that swap the lane to DECIMAL).
    Scale: one fact-scan hash-agg -> two-pass grid cumsum
    (global_cumsum, no single-task window) -> 1-row reduce."""
    from ..operators.trainprep import global_cumsum  # noqa: PLC0415

    li = table(spark, sf_dir, "lineitem")
    hist = li.groupBy(
        F.col("l_quantity").cast("bigint").alias("q")
    ).agg(
        *[
            F.sum(F.when(F.col("l_returnflag") == fl, 1).otherwise(0)).alias(c)
            for fl, c in (("A", "na_v"), ("N", "nn_v"), ("R", "nr_v"))
        ]
    )
    hist = hist.withColumn(
        "t_v", F.col("na_v") + F.col("nn_v") + F.col("nr_v")
    )
    cum = global_cumsum(hist, "q", "t_v", 8, out_col="cum_t")
    rank_w = 2 * F.col("cum_t") + F.col("t_v") + 1
    lanes = cum.agg(
        F.sum("na_v").cast("bigint").alias("n_a"),
        F.sum("nn_v").cast("bigint").alias("n_n"),
        F.sum("nr_v").cast("bigint").alias("n_r"),
        F.sum(F.col("na_v") * rank_w).cast("bigint").alias("r2_a"),
        F.sum(F.col("nn_v") * rank_w).cast("bigint").alias("r2_n"),
        F.sum(F.col("nr_v") * rank_w).cast("bigint").alias("r2_r"),
        F.sum(F.col("t_v") * F.col("t_v") * F.col("t_v") - F.col("t_v"))
        .cast("bigint")
        .alias("tie_sum"),
    )
    nd = (F.col("n_a") + F.col("n_n") + F.col("n_r")).cast("double")
    ssq = (
        F.col("r2_a").cast("double") * F.col("r2_a").cast("double")
        / (4.0 * F.col("n_a"))
        + F.col("r2_n").cast("double") * F.col("r2_n").cast("double")
        / (4.0 * F.col("n_n"))
        + F.col("r2_r").cast("double") * F.col("r2_r").cast("double")
        / (4.0 * F.col("n_r"))
    )
    h = 12.0 / (nd * (nd + 1.0)) * ssq - 3.0 * (nd + 1.0)
    corr = 1.0 - F.col("tie_sum").cast("double") / (nd * nd * nd - nd)
    return lanes.select(
        "n_a",
        "n_n",
        "n_r",
        F.round(h, 6).alias("h_stat"),
        F.round(h / corr, 6).alias("h_adj"),
    )


def _sql_lnfact(e: str) -> str:
    """ln(m!) as ONE expression string valid in BOTH Spark SQL and
    DuckDB — exact-literal table for m <= 20 (CPython lgamma values,
    parsed to the identical double by both engines), Stirling series
    (m+1/2)ln m - m + ln(2*pi)/2 + 1/12m - 1/360m^3 + 1/1260m^5 above
    (absolute error < 4e-13 at m=21, shrinking as m grows). Sharing
    the TEXT is the determinism argument: both engines evaluate the
    same double-op sequence on the same exact-integer inputs."""
    import math  # noqa: PLC0415

    tbl = " ".join(
        f"WHEN {k} THEN {float(math.lgamma(k + 1))!r}" for k in range(21)
    )
    m = f"CAST({e} AS DOUBLE)"
    stirling = (
        f"(({m} + 0.5) * LN({m}) - {m} + 0.9189385332046727"
        f" + 1.0/(12.0*{m}) - 1.0/(360.0*{m}*{m}*{m})"
        f" + 1.0/(1260.0*{m}*{m}*{m}*{m}*{m}))"
    )
    return f"(CASE {e} {tbl} ELSE {stirling} END)"


def _sql_lnchoose(n: str, k: str) -> str:
    """ln C(n,k) from the shared ln-factorial text."""
    return (
        f"({_sql_lnfact(n)} - {_sql_lnfact(k)}"
        f" - {_sql_lnfact(f'({n}) - ({k})')})"
    )


# lnP(k) of the hypergeometric cell count, then nano-quantized:
# identical text evaluated by Spark's F.expr and DuckDB.
_FISHER_LNP = (
    f"({_sql_lnchoose('r1', 'kk')}"
    f" + {_sql_lnchoose('(n - r1)', '(c1 - kk)')}"
    f" - {_sql_lnchoose('n', 'c1')})"
)
_FISHER_LANE = (
    f"CAST(FLOOR(ROUND({_FISHER_LNP}, 12) * 1000000000.0) AS BIGINT)"
)


@register(
    "stats_fisher_exact",
    oracle=f"""
WITH m AS (
  SELECT CAST(SUM(CASE WHEN p_size <= 10 AND p_type LIKE 'PROMO%'
                       THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN p_size <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS r1,
         CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM part
),
grid AS (
  SELECT m.a, m.r1, m.c1, m.n, gs.kk
  FROM m, (SELECT UNNEST(generate_series(0, (SELECT LEAST(r1, c1) FROM m)))
           AS kk) gs
  WHERE gs.kk >= m.r1 + m.c1 - m.n
),
lanes AS (
  SELECT a, r1, c1, n, kk, {_FISHER_LANE} AS lnp_q
  FROM grid
),
obs AS (
  SELECT lnp_q AS obs_q FROM lanes WHERE kk = a
)
SELECT MAX(a) AS a, MAX(r1) AS r1, MAX(c1) AS c1, MAX(n) AS n,
       ROUND(CAST(SUM(CASE WHEN lnp_q <= (SELECT obs_q FROM obs) + 1
                  THEN CAST(ROUND(EXP(CAST(lnp_q AS DOUBLE) / 1000000000.0)
                            * 1000000000000.0, 0) AS BIGINT)
                  ELSE 0 END) AS DOUBLE) / 1000000000000.0, 9) AS p_two
FROM lanes
""",
)
def stats_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FISHER'S EXACT TEST on the 2x2 table (small part: p_size<=10)
    x (promo type: p_type LIKE 'PROMO%') — the exact independence
    test for contingency tables whose margins are too small for the
    chi-square approximation (stats_chi_square / stats_g_test are
    the large-count path; Fisher's whole point is the regime where
    they fail). Two-sided p = sum of hypergeometric P(k) over every
    table at least as extreme as the observed one (P(k) <= P(a),
    with one nano-lane of slack mirroring the standard (1+1e-7)
    tolerance). Engine-exactness: ln C(n,k) comes from ONE shared
    expression text (_sql_lnfact — exact literal table to 20!,
    Stirling series above, < 4e-13 absolute) evaluated by F.expr and
    DuckDB alike; each lnP is guard-rounded and nano-quantized to
    BIGINT before the extremeness comparison, each included term's
    probability pico-quantized before the order-free exact-integer
    sum. Scale: the margins fold in one hash-agg over the fact; the
    enumeration grid is the SMALLER MARGIN (min(r1,c1)+1 terms) —
    by construction the regime where the exact test is the right
    tool; corpus-scale margins belong to the z/chi-square keys."""
    p = table(spark, sf_dir, "part")
    m = p.agg(
        F.sum(
            F.when(
                (F.col("p_size") <= 10) & F.col("p_type").like("PROMO%"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(F.col("p_size") <= 10, 1).otherwise(0))
        .cast("bigint")
        .alias("r1"),
        F.sum(F.when(F.col("p_type").like("PROMO%"), 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    grid = m.select(
        "a",
        "r1",
        "c1",
        "n",
        F.explode(
            F.sequence(
                F.greatest(F.lit(0).cast("bigint"), F.col("r1") + F.col("c1") - F.col("n")),
                F.least(F.col("r1"), F.col("c1")),
            )
        ).alias("kk"),
    )
    lanes = grid.select(
        "a", "r1", "c1", "n", "kk", F.expr(_FISHER_LANE).alias("lnp_q")
    )
    # obs as a GLOBAL AGG (not filter-then-select): provably 1 row,
    # so the broadcast cross join below is lint-clean by structure.
    obs = lanes.agg(
        F.max(F.when(F.col("kk") == F.col("a"), F.col("lnp_q"))).alias("obs_q")
    )
    return (
        lanes.crossJoin(F.broadcast(obs))
        .agg(
            F.max("a").alias("a"),
            F.max("r1").alias("r1"),
            F.max("c1").alias("c1"),
            F.max("n").alias("n"),
            F.round(
                F.sum(
                    F.when(
                        F.col("lnp_q") <= F.col("obs_q") + 1,
                        F.round(
                            F.exp(F.col("lnp_q").cast("double") / 1e9)
                            * 1e12,
                            0,
                        ).cast("bigint"),
                    ).otherwise(F.lit(0).cast("bigint"))
                ).cast("double")
                / 1e12,
                9,
            ).alias("p_two"),
        )
    )


@register(
    "stats_friedman_test",
    oracle="""
WITH cell AS (
  SELECT date_trunc('month', o_orderdate) AS blk, o_orderpriority AS trt,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS val_c
  FROM orders GROUP BY blk, trt
),
full_blk AS (
  SELECT blk FROM cell GROUP BY blk HAVING COUNT(*) = 5
),
ranked AS (
  SELECT c.blk, c.trt,
         2 * RANK() OVER (PARTITION BY c.blk ORDER BY c.val_c)
           + COUNT(*) OVER (PARTITION BY c.blk, c.val_c) - 1 AS r2
  FROM cell c JOIN full_blk b ON c.blk = b.blk
),
per_trt AS (
  SELECT trt, CAST(SUM(r2) AS BIGINT) AS r2_sum,
         CAST(COUNT(*) AS BIGINT) AS n_blocks
  FROM ranked GROUP BY trt
),
ties AS (
  SELECT CAST(COALESCE(SUM(tc * tc * tc - tc), 0) AS BIGINT) AS tie_sum
  FROM (SELECT COUNT(*) AS tc FROM ranked r
        JOIN cell c ON r.blk = c.blk AND r.trt = c.trt
        GROUP BY c.blk, c.val_c) g
),
lanes AS (
  SELECT CAST(MAX(n_blocks) AS DOUBLE) AS nb,
         SUM(CAST(r2_sum AS DOUBLE) * CAST(r2_sum AS DOUBLE) / 4.0) AS ssq,
         (SELECT CAST(tie_sum AS DOUBLE) FROM ties) AS tie_d
  FROM per_trt
)
SELECT CAST(nb AS BIGINT) AS n_blocks, CAST(5 AS INT) AS k_treat,
       ROUND(12.0 / (nb * 5.0 * 6.0) * ssq - 3.0 * nb * 6.0, 6) AS q_stat,
       ROUND((12.0 / (nb * 5.0 * 6.0) * ssq - 3.0 * nb * 6.0)
             / (1.0 - tie_d / (nb * 5.0 * 24.0)), 6) AS q_adj
FROM lanes
""",
)
def stats_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRIEDMAN TEST — the nonparametric repeated-measures ANOVA: do
    the 5 order priorities differ in average order value, judged
    WITHIN each month-block so secular price drift cancels (the
    blocked design a t-test family can't give you)? One observation
    per (month, priority) cell — the exact cents-lane average, so
    both engines rank the identical doubles — then ranks 1..5 within
    each complete block (average-rank tie handling via the doubled
    lane 2r = 2*RANK + tiecount - 1, exact integers), and
    Q = 12/(nk(k+1)) * sum_j Rbar_j^2 - 3n(k+1) with the tie
    correction 1 - sum(t^3-t)/(nk(k^2-1)). The o_orderpriority
    domain is exactly 5 values (FIXTURES.md), so incomplete blocks
    (HAVING count = 5) are excluded identically on both sides.
    Scale: the only corpus-grain work is the (month, priority) cell
    aggregate — one shuffle with map-side combine; everything after
    runs on the calendar-grain grid (months x 5)."""
    o = table(spark, sf_dir, "orders")
    cell = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("blk"),
        F.col("o_orderpriority").alias("trt"),
    ).agg(
        (
            F.sum(cents("o_totalprice")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("val_c")
    )
    full_blk = cell.groupBy("blk").agg(F.count(F.lit(1)).alias("nc")).filter(
        F.col("nc") == 5
    ).select("blk")
    c = cell.join(F.broadcast(full_blk), "blk")
    w_rank = Window.partitionBy("blk").orderBy("val_c")
    w_tie = Window.partitionBy("blk", "val_c")
    ranked = c.select(
        "blk",
        "trt",
        "val_c",
        (2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1).alias(
            "r2"
        ),
    )
    per_trt = ranked.groupBy("trt").agg(
        F.sum("r2").cast("bigint").alias("r2_sum"),
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
    )
    ties = (
        ranked.groupBy("blk", "val_c")
        .agg(F.count(F.lit(1)).alias("tc"))
        .agg(
            F.coalesce(
                F.sum(F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc")),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_sum")
        )
    )
    lanes = per_trt.agg(
        F.max("n_blocks").cast("double").alias("nb"),
        F.sum(
            F.col("r2_sum").cast("double") * F.col("r2_sum").cast("double") / 4.0
        ).alias("ssq"),
    ).crossJoin(F.broadcast(ties.select(F.col("tie_sum").cast("double").alias("tie_d"))))
    q = 12.0 / (F.col("nb") * 5.0 * 6.0) * F.col("ssq") - 3.0 * F.col("nb") * 6.0
    return lanes.select(
        F.col("nb").cast("bigint").alias("n_blocks"),
        F.lit(5).cast("int").alias("k_treat"),
        F.round(q, 6).alias("q_stat"),
        F.round(
            q / (1.0 - F.col("tie_d") / (F.col("nb") * 5.0 * 24.0)), 6
        ).alias("q_adj"),
    )


@register(
    "stats_brier_decomposition",
    oracle="""
WITH lab AS (
  SELECT EXTRACT(hour FROM ts) AS hb,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_train
  FROM events
),
trn AS (
  SELECT hb, CAST(COUNT(*) AS BIGINT) AS nt,
         CAST(SUM(y) AS BIGINT) AS st
  FROM lab WHERE is_train = 1 GROUP BY hb
),
gtrn AS (
  SELECT CAST(SUM(nt) AS BIGINT) AS ntot, CAST(SUM(st) AS BIGINT) AS stot
  FROM trn
),
ev AS (
  SELECT hb, CAST(COUNT(*) AS BIGINT) AS n_k,
         CAST(SUM(y) AS BIGINT) AS s_k
  FROM lab WHERE is_train = 0 GROUP BY hb
),
gev AS (
  SELECT CAST(SUM(n_k) AS BIGINT) AS n_all, CAST(SUM(s_k) AS BIGINT) AS s_all
  FROM ev
),
terms AS (
  SELECT e.n_k, e.s_k,
         COALESCE(CAST(t.st AS DOUBLE) / CAST(t.nt AS DOUBLE),
                  CAST(g.stot AS DOUBLE) / CAST(g.ntot AS DOUBLE)) AS p_hat,
         CAST(e.s_k AS DOUBLE) / CAST(e.n_k AS DOUBLE) AS y_bar_k,
         CAST(v.s_all AS DOUBLE) / CAST(v.n_all AS DOUBLE) AS y_bar,
         v.n_all
  FROM ev e LEFT JOIN trn t ON e.hb = t.hb
  CROSS JOIN gtrn g CROSS JOIN gev v
),
lanes AS (
  SELECT MAX(n_all) AS n_eval,
         MAX(y_bar) AS y_bar,
         CAST(SUM(CAST(FLOOR(ROUND(n_k * p_hat * p_hat
                  - 2.0 * p_hat * s_k + s_k, 12) * 1000000000.0)
                  AS BIGINT)) AS BIGINT) AS brier_q,
         CAST(SUM(CAST(FLOOR(ROUND(n_k * (p_hat - y_bar_k)
                  * (p_hat - y_bar_k), 12) * 1000000000.0)
                  AS BIGINT)) AS BIGINT) AS rel_q,
         CAST(SUM(CAST(FLOOR(ROUND(n_k * (y_bar_k - y_bar)
                  * (y_bar_k - y_bar), 12) * 1000000000.0)
                  AS BIGINT)) AS BIGINT) AS res_q
  FROM terms
)
SELECT n_eval,
       ROUND(CAST(brier_q AS DOUBLE) / 1000000000.0 / n_eval, 6) AS brier,
       ROUND(CAST(rel_q AS DOUBLE) / 1000000000.0 / n_eval, 6) AS reliability,
       ROUND(CAST(res_q AS DOUBLE) / 1000000000.0 / n_eval, 6) AS resolution,
       ROUND(y_bar * (1.0 - y_bar), 6) AS uncertainty
FROM lanes
""",
)
def stats_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRIER SCORE + MURPHY DECOMPOSITION — the standard calibration
    audit for a probabilistic classifier: Brier = REL - RES + UNC,
    where reliability measures calibration error, resolution the
    forecaster's discrimination, uncertainty the base-rate entropy.
    The forecaster here is the honest temporal-split baseline: the
    per-hour-of-day purchase rate FIT ON THE FIRST 15 DAYS scores
    the rest of the month (resubstitution would force REL = 0 and
    grade nothing; stats_calibration_ece bins the same idea by
    predicted prob). All inputs are exact integer lanes (n_k, s_k
    per hour bucket); the per-bucket double terms are guard-rounded
    and nano-quantized before the order-free exact sum, so both
    engines agree bit-for-bit. Scale: two hash-aggs onto the
    24-bucket calendar grid + one broadcast of two 1-row totals —
    at 100 TB only the label scan is corpus-grain."""
    ev = table(spark, sf_dir, "events")
    lab = ev.select(
        F.hour("ts").alias("hb"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 1)
        .otherwise(0)
        .alias("is_train"),
    )
    trn = (
        lab.filter(F.col("is_train") == 1)
        .groupBy("hb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nt"),
            F.sum("y").cast("bigint").alias("st"),
        )
    )
    gtrn = trn.agg(
        F.sum("nt").cast("bigint").alias("ntot"),
        F.sum("st").cast("bigint").alias("stot"),
    )
    evl = (
        lab.filter(F.col("is_train") == 0)
        .groupBy("hb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_k"),
            F.sum("y").cast("bigint").alias("s_k"),
        )
    )
    gev = evl.agg(
        F.sum("n_k").cast("bigint").alias("n_all"),
        F.sum("s_k").cast("bigint").alias("s_all"),
    )
    terms = (
        evl.join(F.broadcast(trn.withColumnRenamed("hb", "thb")),
                 F.col("hb") == F.col("thb"), "left")
        .crossJoin(F.broadcast(gtrn))
        .crossJoin(F.broadcast(gev))
        .select(
            "n_k",
            "s_k",
            F.coalesce(
                F.col("st").cast("double") / F.col("nt").cast("double"),
                F.col("stot").cast("double") / F.col("ntot").cast("double"),
            ).alias("p_hat"),
            (F.col("s_k").cast("double") / F.col("n_k").cast("double")).alias(
                "y_bar_k"
            ),
            (F.col("s_all").cast("double") / F.col("n_all").cast("double")).alias(
                "y_bar"
            ),
            "n_all",
        )
    )

    def lane(expr):
        return (
            F.sum(F.floor(F.round(expr, 12) * 1e9).cast("bigint"))
            .cast("bigint")
        )

    lanes = terms.agg(
        F.max("n_all").alias("n_eval"),
        F.max("y_bar").alias("y_bar"),
        lane(
            F.col("n_k") * F.col("p_hat") * F.col("p_hat")
            - 2.0 * F.col("p_hat") * F.col("s_k")
            + F.col("s_k")
        ).alias("brier_q"),
        lane(
            F.col("n_k")
            * (F.col("p_hat") - F.col("y_bar_k"))
            * (F.col("p_hat") - F.col("y_bar_k"))
        ).alias("rel_q"),
        lane(
            F.col("n_k")
            * (F.col("y_bar_k") - F.col("y_bar"))
            * (F.col("y_bar_k") - F.col("y_bar"))
        ).alias("res_q"),
    )
    return lanes.select(
        "n_eval",
        F.round(F.col("brier_q").cast("double") / 1e9 / F.col("n_eval"), 6).alias(
            "brier"
        ),
        F.round(F.col("rel_q").cast("double") / 1e9 / F.col("n_eval"), 6).alias(
            "reliability"
        ),
        F.round(F.col("res_q").cast("double") / 1e9 / F.col("n_eval"), 6).alias(
            "resolution"
        ),
        F.round(F.col("y_bar") * (1.0 - F.col("y_bar")), 6).alias("uncertainty"),
    )


@register(
    "obs_apdex_score",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN value <= 50.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_satisfied,
       CAST(SUM(CASE WHEN value > 50.0 AND value <= 200.0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_tolerating,
       ROUND((CAST(SUM(CASE WHEN value <= 50.0 THEN 1 ELSE 0 END) AS DOUBLE)
              + CAST(SUM(CASE WHEN value > 50.0 AND value <= 200.0
                         THEN 1 ELSE 0 END) AS DOUBLE) / 2.0)
             / CAST(COUNT(*) AS DOUBLE), 6) AS apdex
FROM events GROUP BY event_type
""",
)
def obs_apdex_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APDEX (Application Performance Index, Apdex Alliance spec) —
    the industry-standard user-satisfaction fold for latency-like
    measures: score = (satisfied + tolerating/2) / total with the
    tolerating band at (T, 4T], here T = 50 on events.value, graded
    per event_type. Exact integer threshold counts; the score is one
    double division rounded at 6dp. Scale: a single partial+final
    hash-agg on a 5-value key — the monitoring fold you run over
    every span/request record at 100 TB without a second shuffle."""
    ev = table(spark, sf_dir, "events")
    sat = F.sum(F.when(F.col("value") <= 50.0, 1).otherwise(0))
    tol = F.sum(
        F.when((F.col("value") > 50.0) & (F.col("value") <= 200.0), 1).otherwise(0)
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        sat.cast("bigint").alias("n_satisfied"),
        tol.cast("bigint").alias("n_tolerating"),
        F.round(
            (sat.cast("double") + tol.cast("double") / 2.0)
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("apdex"),
    )


# Prometheus-style le-bucket upper bounds for obs_histogram_quantile
# (literal, shared by both engines; +Inf handled as the terminal arm).
_PROM_LE = [5.0, 10.0, 25.0, 50.0, 100.0, 250.0, 500.0]


@register(
    "obs_histogram_quantile",
    oracle=f"""
WITH bucketed AS (
  SELECT event_type,
         CASE {' '.join(f"WHEN value <= {b!r} THEN {i}" for i, b in enumerate(_PROM_LE))}
              ELSE {len(_PROM_LE)} END AS bkt
  FROM events
),
counts AS (
  SELECT event_type, bkt, CAST(COUNT(*) AS BIGINT) AS c
  FROM bucketed GROUP BY event_type, bkt
),
cum AS (
  SELECT event_type, bkt, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bkt
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
         SUM(c) OVER (PARTITION BY event_type) AS n_tot
  FROM counts
),
hit AS (
  SELECT event_type, bkt, c, cum_c - c AS cum_prev, n_tot,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bkt) AS rn
  FROM cum
  WHERE CAST(cum_c AS DOUBLE) >= 0.95 * CAST(n_tot AS DOUBLE)
),
bounds AS (
  SELECT event_type, bkt, c, cum_prev, n_tot,
         CASE bkt WHEN 0 THEN 0.0
              {' '.join(f"WHEN {i + 1} THEN {b!r}" for i, b in enumerate(_PROM_LE[:-1]))}
              WHEN {len(_PROM_LE)} THEN {_PROM_LE[-1]!r} ELSE 0.0 END AS lo,
         CASE bkt {' '.join(f"WHEN {i} THEN {b!r}" for i, b in enumerate(_PROM_LE))}
              ELSE {_PROM_LE[-1]!r} END AS hi
  FROM hit WHERE rn = 1
)
SELECT event_type, CAST(n_tot AS BIGINT) AS n_total, bkt AS bucket_idx,
       ROUND(CASE WHEN bkt = {len(_PROM_LE)} THEN hi
            ELSE lo + (hi - lo) * (0.95 * CAST(n_tot AS DOUBLE) - cum_prev)
                 / CAST(c AS DOUBLE) END, 6) AS p95_est
FROM bounds
""",
)
def obs_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROMETHEUS histogram_quantile(0.95, ...) — the quantile
    estimator every SRE dashboard runs: pre-bucketed cumulative
    ('le') histograms with LINEAR INTERPOLATION inside the first
    bucket whose cumulative count crosses q*N (and the PromQL
    convention of returning the upper bound for the +Inf bucket).
    The le grid is a 7-entry literal shared by both engines, so
    bucketing, the per-series cumulative walk, and the crossing
    bucket are exact integer decisions; only the final interpolation
    is float, rounded at 6dp. This is the DDSketch/t-digest
    alternative when the histogram layout is FIXED at write time —
    the aggregation is a pure counter add, mergeable across any
    shard topology. Scale: one hash-agg onto (type x 8 literal
    buckets), then windows over that bounded grid."""
    ev = table(spark, sf_dir, "events")
    bkt = F.lit(len(_PROM_LE))
    for i, b in reversed(list(enumerate(_PROM_LE))):
        bkt = F.when(F.col("value") <= b, F.lit(i)).otherwise(bkt)
    counts = ev.select("event_type", bkt.alias("bkt")).groupBy(
        "event_type", "bkt"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = counts.select(
        "event_type",
        "bkt",
        "c",
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(w_all).alias("n_tot"),
    )
    w_rn = Window.partitionBy("event_type").orderBy("bkt")
    hit = (
        cum.filter(
            F.col("cum_c").cast("double") >= 0.95 * F.col("n_tot").cast("double")
        )
        .withColumn("rn", F.row_number().over(w_rn))
        .filter(F.col("rn") == 1)
        .withColumn("cum_prev", F.col("cum_c") - F.col("c"))
    )
    lo = F.lit(0.0)
    for i, b in enumerate(_PROM_LE[:-1]):
        lo = F.when(F.col("bkt") == i + 1, F.lit(b)).otherwise(lo)
    lo = F.when(F.col("bkt") == len(_PROM_LE), F.lit(_PROM_LE[-1])).otherwise(lo)
    hi = F.lit(_PROM_LE[-1])
    for i, b in reversed(list(enumerate(_PROM_LE))):
        hi = F.when(F.col("bkt") == i, F.lit(b)).otherwise(hi)
    est = F.when(F.col("bkt") == len(_PROM_LE), hi).otherwise(
        lo
        + (hi - lo)
        * (0.95 * F.col("n_tot").cast("double") - F.col("cum_prev"))
        / F.col("c").cast("double")
    )
    return hit.select(
        "event_type",
        F.col("n_tot").cast("bigint").alias("n_total"),
        F.col("bkt").alias("bucket_idx"),
        F.round(est, 6).alias("p95_est"),
    )


@register(
    "agg_ddsketch_quantile",
    oracle="""
WITH params AS (
  SELECT LN(1.01 / 0.99) AS lg, 1.01 / 0.99 AS gamma
),
bkt AS (
  SELECT GREATEST(0, LEAST(3000,
           CAST(CEIL(ROUND(LN(o_totalprice) / (SELECT lg FROM params), 9))
                AS BIGINT))) AS b
  FROM orders
),
counts AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM bkt GROUP BY b
),
cum AS (
  SELECT b, c,
         SUM(c) OVER (ORDER BY b
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
         SUM(c) OVER () AS n_tot
  FROM counts
),
qs AS (
  SELECT UNNEST([0.5, 0.9, 0.99]) AS qq
),
hit AS (
  SELECT qs.qq, cum.b, cum.n_tot,
         ROW_NUMBER() OVER (PARTITION BY qs.qq ORDER BY cum.b) AS rn
  FROM qs JOIN cum
    ON CAST(cum.cum_c AS DOUBLE)
       >= CAST(FLOOR(qs.qq * (cum.n_tot - 1)) + 1 AS DOUBLE)
)
SELECT qq AS q, CAST(n_tot AS BIGINT) AS n_total, b AS bucket_idx,
       ROUND(2.0 * EXP(CAST(b AS DOUBLE) * (SELECT lg FROM params))
             / ((SELECT gamma FROM params) + 1.0), 2) AS est
FROM hit WHERE rn = 1
""",
)
def agg_ddsketch_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSKETCH (Masson, Rim & Lee, VLDB 2019) — the
    relative-error quantile sketch: bucket i = ceil(ln x / ln gamma)
    with gamma = (1+a)/(1-a), a = 1%, guarantees every returned
    quantile is within 1% RELATIVE error of the true value — the
    property HLL-style rank sketches lack and exact percentiles pay
    a global sort for. The sketch IS the bucket-count map: pure
    counter adds, mergeable across any shard topology, at most
    ~3000 buckets over o_totalprice's entire dynamic range (the
    literal clamp also makes the grid provably bounded). Estimates
    2*gamma^i/(gamma+1) for q in {0.5, 0.9, 0.99} at rank
    floor(q*(n-1))+1. Engine-exactness: the log-bucket index is
    guard-rounded (9dp) before ceil so both engines land identical
    integer buckets; counts and the cumulative walk are exact
    integers; the only float output is the estimate, rounded at
    2dp. Scale: one hash-agg onto the bounded log grid — at 100 TB
    the quantile costs one shuffle of <= 3001 rows."""
    import math  # noqa: PLC0415

    lg = math.log(1.01 / 0.99)
    gamma = 1.01 / 0.99
    o = table(spark, sf_dir, "orders")
    b = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(
            F.lit(3000).cast("bigint"),
            F.ceil(F.round(F.log(F.col("o_totalprice")) / F.lit(lg), 9)).cast(
                "bigint"
            ),
        ),
    )
    counts = o.select(b.alias("b")).groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w_cum = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = counts.select(
        "b",
        "c",
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(w_all).alias("n_tot"),
    )
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("qq")
    )
    hit = (
        qs.join(
            cum,
            F.col("cum_c").cast("double")
            >= (F.floor(F.col("qq") * (F.col("n_tot") - 1)) + 1).cast("double"),
        )
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("qq").orderBy("b")),
        )
        .filter(F.col("rn") == 1)
    )
    est = 2.0 * F.exp(F.col("b").cast("double") * F.lit(lg)) / F.lit(gamma + 1.0)
    return hit.select(
        F.col("qq").alias("q"),
        F.col("n_tot").cast("bigint").alias("n_total"),
        F.col("b").alias("bucket_idx"),
        F.round(est, 2).alias("est"),
    )


@register(
    "stats_mcc_f1_confusion",
    oracle="""
WITH lab AS (
  SELECT EXTRACT(hour FROM ts) AS hb,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_train
  FROM events
),
trn AS (
  SELECT hb, CAST(COUNT(*) AS BIGINT) AS nt, CAST(SUM(y) AS BIGINT) AS st
  FROM lab WHERE is_train = 1 GROUP BY hb
),
gtrn AS (
  SELECT CAST(SUM(nt) AS BIGINT) AS ntot, CAST(SUM(st) AS BIGINT) AS stot
  FROM trn
),
scored AS (
  SELECT e.y,
         CASE WHEN COALESCE(CAST(t.st AS DOUBLE) / CAST(t.nt AS DOUBLE),
                            CAST(g.stot AS DOUBLE) / CAST(g.ntot AS DOUBLE))
                   >= CAST(g.stot AS DOUBLE) / CAST(g.ntot AS DOUBLE)
              THEN 1 ELSE 0 END AS yhat
  FROM lab e LEFT JOIN trn t ON e.hb = t.hb
  CROSS JOIN gtrn g
  WHERE e.is_train = 0
),
cm AS (
  SELECT CAST(SUM(y * yhat) AS BIGINT) AS tp,
         CAST(SUM((1 - y) * yhat) AS BIGINT) AS fp,
         CAST(SUM(y * (1 - yhat)) AS BIGINT) AS fn,
         CAST(SUM((1 - y) * (1 - yhat)) AS BIGINT) AS tn
  FROM scored
)
SELECT tp, fp, fn, tn,
       ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision_pos,
       ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall_pos,
       ROUND(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1,
       ROUND((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
             / SQRT((CAST(tp AS DOUBLE) + fp) * (CAST(tp AS DOUBLE) + fn)
                    * (CAST(tn AS DOUBLE) + fp) * (CAST(tn AS DOUBLE) + fn)),
             6) AS mcc
FROM cm
""",
)
def stats_mcc_f1_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONFUSION MATRIX + F1 + MATTHEWS CORRELATION for the same
    honest temporal-split classifier stats_brier_decomposition
    grades probabilistically: predict 'purchase' when the bucket's
    TRAIN-period rate clears the global train base rate, evaluate on
    the held-out second half-month. MCC is the metric that stays
    honest under class imbalance (purchases are a minority class
    here — accuracy would look great predicting all-zero; F1 ignores
    TN; MCC = (TP*TN - FP*FN)/sqrt((TP+FP)(TP+FN)(TN+FP)(TN+FN))
    uses all four cells). The four cells are exact integer lanes
    from one hash-agg; every derived metric is a single double
    expression on the 1-row result, rounded at 6dp. Scale: the
    score join is a 24-row broadcast onto the label scan — one
    corpus-grain pass, no shuffle beyond the global fold."""
    ev = table(spark, sf_dir, "events")
    lab = ev.select(
        F.hour("ts").alias("hb"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 1)
        .otherwise(0)
        .alias("is_train"),
    )
    trn = (
        lab.filter(F.col("is_train") == 1)
        .groupBy("hb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nt"),
            F.sum("y").cast("bigint").alias("st"),
        )
    )
    gtrn = trn.agg(
        F.sum("nt").cast("bigint").alias("ntot"),
        F.sum("st").cast("bigint").alias("stot"),
    )
    base = F.col("stot").cast("double") / F.col("ntot").cast("double")
    p_hat = F.coalesce(
        F.col("st").cast("double") / F.col("nt").cast("double"), base
    )
    scored = (
        lab.filter(F.col("is_train") == 0)
        .join(F.broadcast(trn.withColumnRenamed("hb", "thb")),
              F.col("hb") == F.col("thb"), "left")
        .crossJoin(F.broadcast(gtrn))
        .select(
            "y", F.when(p_hat >= base, 1).otherwise(0).alias("yhat")
        )
    )
    cm = scored.agg(
        F.sum(F.col("y") * F.col("yhat")).cast("bigint").alias("tp"),
        F.sum((1 - F.col("y")) * F.col("yhat")).cast("bigint").alias("fp"),
        F.sum(F.col("y") * (1 - F.col("yhat"))).cast("bigint").alias("fn"),
        F.sum((1 - F.col("y")) * (1 - F.col("yhat"))).cast("bigint").alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c).cast("double") for c in ("tp", "fp", "fn", "tn"))
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(tp / (tp + fp), 6).alias("precision_pos"),
        F.round(tp / (tp + fn), 6).alias("recall_pos"),
        F.round(2.0 * tp / (2.0 * tp + fp + fn), 6).alias("f1"),
        F.round(
            (tp * tn - fp * fn)
            / F.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)),
            6,
        ).alias("mcc"),
    )


@register(
    "eval_pass_at_k",
    oracle="""
WITH s AS (
  SELECT o_custkey % 500 AS problem_id,
         COUNT(*) AS n,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS c
  FROM orders GROUP BY problem_id
  HAVING COUNT(*) >= 5
)
SELECT CAST(problem_id AS BIGINT) AS problem_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(c AS BIGINT) AS n_correct,
       ROUND(CASE WHEN n - c < 5 THEN 1.0 ELSE
         1.0 - (CAST(n - c AS DOUBLE) / n)
             * (CAST(n - c - 1 AS DOUBLE) / (n - 1))
             * (CAST(n - c - 2 AS DOUBLE) / (n - 2))
             * (CAST(n - c - 3 AS DOUBLE) / (n - 3))
             * (CAST(n - c - 4 AS DOUBLE) / (n - 4)) END, 9) AS pass_at_5
FROM s
""",
    tags=("stats", "llm"),
)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PASS@K — the unbiased estimator behind every code-gen eval
    (HumanEval/MBPP reporting): given n sampled completions per
    problem of which c pass the tests, pass@k = 1 - C(n-c,k)/C(n,k),
    the probability that a random size-k subset contains at least
    one passing sample. Computed in the numerically safe PRODUCT
    form prod_{i=0..k-1} (n-c-i)/(n-i) — the binomial-ratio form
    overflows integer arithmetic the moment n grows with the corpus
    (C(3e6, 5) >> 2^63), while each product factor stays in [0,1]
    at ANY n, so the same expression is exact-enough at sf0.01 and
    at 100 TB. k=5 is unrolled as five literal factors: a fixed
    evaluation order both engines execute identically (no
    order-sensitive SUM of logs). Problems with n < k are excluded
    (the estimator is undefined there); n-c < k short-circuits to
    1.0 before any zero/negative factor. Scale: one partial+final
    hash aggregate on the problem key, then per-row closed-form
    math — no second shuffle, no window."""
    o = table(spark, sf_dir, "orders")
    s = (
        o.groupBy((F.col("o_custkey") % 500).cast("bigint").alias("problem_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
                "c"
            ),
        )
        .filter(F.col("n") >= 5)
    )
    n, c = F.col("n"), F.col("c")
    prod = (
        ((n - c).cast("double") / n)
        * ((n - c - 1).cast("double") / (n - 1))
        * ((n - c - 2).cast("double") / (n - 2))
        * ((n - c - 3).cast("double") / (n - 3))
        * ((n - c - 4).cast("double") / (n - 4))
    )
    return s.select(
        "problem_id",
        n.cast("bigint").alias("n_samples"),
        c.cast("bigint").alias("n_correct"),
        F.round(
            F.when(n - c < 5, F.lit(1.0)).otherwise(F.lit(1.0) - prod), 9
        ).alias("pass_at_5"),
    )


@register(
    "stats_pinball_loss",
    oracle="""
WITH train AS (
  SELECT l_returnflag,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT),
                                     l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem WHERE l_orderkey % 2 = 1
),
q AS (
  SELECT l_returnflag,
         MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN cents END) AS q50,
         MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN cents END) AS q90
  FROM train GROUP BY l_returnflag
),
test AS (
  SELECT l_returnflag, CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem WHERE l_orderkey % 2 = 0
)
SELECT t.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(MAX(q50) AS BIGINT) AS q50_cents,
       CAST(MAX(q90) AS BIGINT) AS q90_cents,
       ROUND(AVG(GREATEST(0.5 * (t.cents - q50), (0.5 - 1.0) * (t.cents - q50)))
             / 100.0, 6) AS pinball_50,
       ROUND(AVG(GREATEST(0.9 * (t.cents - q90), (0.9 - 1.0) * (t.cents - q90)))
             / 100.0, 6) AS pinball_90
FROM test t JOIN q ON t.l_returnflag = q.l_returnflag
GROUP BY t.l_returnflag
""",
    tags=("stats",),
)
def stats_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PINBALL (QUANTILE) LOSS — the proper scoring rule for
    quantile forecasts (M5-uncertainty metric, SLA-latency
    forecasting): loss_tau(y, q) = max(tau*(y-q), (tau-1)*(y-q)),
    minimized in expectation exactly when q is the true
    tau-quantile. A per-returnflag forecast is FIT on the odd-orderkey
    half (exact discrete P50/P90 via the deterministic
    (cents, orderkey, linenumber) rank — same total order both
    engines) and SCORED on the even half: train/test by key parity
    is leakage-free and reproducible at any scale. Money stays in
    exact BIGINT cents through ranking; the loss averages in DOUBLE
    and rounds. Scale: one window per half on the 3-flag partition
    key, one broadcastable 3-row quantile table joined back to the
    test stream — the fact scan never re-shuffles."""
    li = table(spark, sf_dir, "lineitem")
    cts = cents("l_extendedprice")
    train = li.filter(F.col("l_orderkey") % 2 == 1).select(
        "l_returnflag", cts.alias("cents"), "l_orderkey", "l_linenumber"
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    ranked = train.select(
        "l_returnflag",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    q = ranked.groupBy("l_returnflag").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.5 * F.col("n")).cast("bigint"),
                F.col("cents"),
            )
        ).alias("q50"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.9 * F.col("n")).cast("bigint"),
                F.col("cents"),
            )
        ).alias("q90"),
    )
    test = li.filter(F.col("l_orderkey") % 2 == 0).select(
        "l_returnflag", cts.alias("cents")
    )
    j = test.join(F.broadcast(q), "l_returnflag")
    d50 = F.col("cents") - F.col("q50")
    d90 = F.col("cents") - F.col("q90")
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.max("q50").cast("bigint").alias("q50_cents"),
        F.max("q90").cast("bigint").alias("q90_cents"),
        F.round(
            F.avg(F.greatest(0.5 * d50, (0.5 - 1.0) * d50)) / 100.0, 6
        ).alias("pinball_50"),
        F.round(
            F.avg(F.greatest(0.9 * d90, (0.9 - 1.0) * d90)) / 100.0, 6
        ).alias("pinball_90"),
    )


@register(
    "stats_isotonic_pava",
    oracle="""
WITH bins AS (
  SELECT o_orderkey % 20 AS b,
         CAST(COUNT(*) AS BIGINT) AS w,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
           AS x
  FROM orders GROUP BY b
),
cums AS (
  SELECT b, w, x,
         SUM(x) OVER (ORDER BY b) AS cx,
         SUM(w) OVER (ORDER BY b) AS cw
  FROM bins
),
pre AS (
  SELECT b, w, x, cx, cw, cx - x AS px, cw - w AS pw FROM cums
),
grid AS (
  SELECT t1.range AS i, t2.range AS j, t3.range AS k
  FROM range(20) t1, range(20) t2, range(20) t3
  WHERE t2.range <= t1.range AND t1.range <= t3.range
),
means AS (
  SELECT g.i, g.j,
         (CAST(ck.cx AS DOUBLE) - pj.px) / (ck.cw - pj.pw) AS m
  FROM grid g
  JOIN pre pj ON pj.b = g.j
  JOIN pre ck ON ck.b = g.k
),
inner_min AS (
  SELECT i, j, MIN(m) AS mn FROM means GROUP BY i, j
),
fit AS (
  SELECT i, MAX(mn) AS f FROM inner_min GROUP BY i
)
SELECT CAST(fit.i AS BIGINT) AS bin,
       b.w AS n,
       ROUND(CAST(b.x AS DOUBLE) / b.w, 9) AS y_raw,
       ROUND(fit.f, 9) AS y_iso
FROM fit JOIN bins b ON b.b = fit.i
""",
    tags=("stats",),
)
def stats_isotonic_pava(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISOTONIC REGRESSION (PAVA) — the calibration fit behind
    reliability curves and monotone score->probability mappings:
    the least-squares NON-DECREASING step function through the
    per-bin outcome rates. Instead of the sequential
    pool-adjacent-violators loop (inherently serial, hostile to a
    distributed engine), the fit uses the exact MINIMAX identity
    f_i = max_{j<=i} min_{k>=i} mean(y_j..y_k) — every PAVA
    textbook's closed form — over the B=20 score-bin grid: the
    (j,i,k) index grid is a LITERAL bounded lattice (1,540 rows at
    B=20, data-independent) built by sequential sequence-explodes,
    and the weighted range means come from exclusive/inclusive
    prefix sums of exact BIGINT bin counts, so both engines
    evaluate the identical finite min/max lattice — min/max are
    order-insensitive, no FP-accumulation-order hazard. Scale: ONE
    partial+final aggregate over the fact scan compresses the
    corpus to 20 rows; everything after is constant work. The
    output is provably monotone (pytest-asserted)."""
    o = table(spark, sf_dir, "orders")
    bins = o.groupBy((F.col("o_orderkey") % 20).alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("w"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    pre = bins.select(
        "b",
        "w",
        "x",
        F.sum("x").over(wc).alias("cx"),
        F.sum("w").over(wc).alias("cw"),
    ).select(
        "b",
        "w",
        "x",
        "cx",
        "cw",
        (F.col("cx") - F.col("x")).alias("px"),
        (F.col("cw") - F.col("w")).alias("pw"),
    )
    grid = (
        spark.range(1)
        .select(F.explode(F.sequence(F.lit(0), F.lit(19))).alias("i"))
        .select(
            "i", F.explode(F.sequence(F.lit(0), F.col("i"))).alias("j")
        )
        .select(
            "i",
            "j",
            F.explode(F.sequence(F.col("i"), F.lit(19))).alias("k"),
        )
    )
    means = (
        grid.join(
            F.broadcast(pre.select(F.col("b").alias("j"), "px", "pw")), "j"
        )
        .join(
            F.broadcast(
                pre.select(F.col("b").alias("k"), "cx", "cw")
            ),
            "k",
        )
        .select(
            "i",
            "j",
            (
                (F.col("cx").cast("double") - F.col("px"))
                / (F.col("cw") - F.col("pw"))
            ).alias("m"),
        )
    )
    fit = (
        means.groupBy("i", "j")
        .agg(F.min("m").alias("mn"))
        .groupBy("i")
        .agg(F.max("mn").alias("f"))
    )
    return fit.join(
        F.broadcast(bins.select(F.col("b").alias("i"), "w", "x")), "i"
    ).select(
        F.col("i").cast("bigint").alias("bin"),
        F.col("w").alias("n"),
        F.round(F.col("x").cast("double") / F.col("w"), 9).alias("y_raw"),
        F.round("f", 9).alias("y_iso"),
    )


@register(
    "stats_benjamini_yekutieli",
    oracle="""
WITH seg AS (
  SELECT o_custkey % 25 AS segment,
         CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT)
           AS x_b
  FROM orders GROUP BY segment
),
tot AS (
  SELECT CAST(SUM(n_b) AS BIGINT) AS n_tot, CAST(SUM(x_b) AS BIGINT) AS x_tot
  FROM seg
),
z AS (
  SELECT segment, n_b, x_b,
         (CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)
          - CAST(x_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
         / SQRT((CAST(x_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
                * (1.0 - CAST(x_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
                / CAST(n_b AS DOUBLE)) AS zv
  FROM seg CROSS JOIN tot
),
pq AS (
  SELECT segment, n_b, x_b, zv,
         CAST(ROUND((__P2__) * 1000000000000.0, 0) AS BIGINT) AS p_q
  FROM z
),
ranked AS (
  SELECT segment, n_b, x_b, zv, p_q,
         ROW_NUMBER() OVER (ORDER BY p_q, segment) AS rnk,
         COUNT(*) OVER () AS m
  FROM pq
),
cm AS (SELECT SUM(1.0 / rnk) AS c_m FROM ranked),
raw AS (
  SELECT segment, n_b, x_b, zv, p_q,
         (CAST(p_q AS DOUBLE) / 1000000000000.0)
         * CAST(m AS DOUBLE) * (SELECT c_m FROM cm)
         / CAST(rnk AS DOUBLE) AS raw
  FROM ranked
),
adj AS (
  SELECT segment, n_b, x_b, zv, p_q,
         MIN(raw) OVER (ORDER BY p_q, segment
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p_adj_raw
  FROM raw
)
SELECT CAST(segment AS BIGINT) AS segment, n_b, x_b,
       ROUND(zv, 6) AS z_stat, p_q,
       ROUND(LEAST(p_adj_raw, 1.0), 9) AS p_adj,
       LEAST(p_adj_raw, 1.0) <= 0.05 AS reject
FROM adj
""".replace("__P2__", _SQL_NORM_P2.format(z="zv")),
    tags=("stats",),
)
def stats_benjamini_yekutieli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENJAMINI-YEKUTIELI FDR correction — the BH step-up under
    ARBITRARY dependence (Benjamini & Yekutieli 2001): when the
    per-segment tests share customers/seasonality and independence
    cannot be argued, the BH threshold is inflated by the harmonic
    factor c(m) = sum_{i=1..m} 1/i, giving p_adj = p * m * c(m) /
    rank followed by the same suffix min. The harmonic factor is
    computed DISTRIBUTIVELY with no loop: after the two-pass
    global_rank the ranks are exactly 1..m, so c(m) = SUM(1/rank)
    over the family — one 1-row aggregate, broadcast back. The
    whole ladder reuses the bh_fdr two-pass machinery (global_rank
    + descending global_running_min), so a family that grows with
    the catalog never funnels through one task. P-values are
    quantized to a 1e-12 BIGINT lane before ordering (deterministic
    sort key both engines)."""
    o = table(spark, sf_dir, "orders")
    seg = o.groupBy((F.col("o_custkey") % 25).alias("segment")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0))
        .cast("bigint")
        .alias("x_b"),
    )
    tot = seg.agg(
        F.sum("n_b").cast("bigint").alias("n_tot"),
        F.sum("x_b").cast("bigint").alias("x_tot"),
    )
    z = seg.crossJoin(F.broadcast(tot))
    p0 = F.col("x_tot").cast("double") / F.col("n_tot").cast("double")
    zv = (
        F.col("x_b").cast("double") / F.col("n_b").cast("double") - p0
    ) / F.sqrt(p0 * (1.0 - p0) / F.col("n_b").cast("double"))
    pq = z.select(
        "segment",
        "n_b",
        "x_b",
        zv.alias("zv"),
        F.round(_norm_p2(zv) * 1000000000000.0, 0).cast("bigint").alias("p_q"),
    )
    from ..operators.scale import global_rank, global_running_min  # noqa: PLC0415

    ranked = global_rank(
        pq, [F.col("p_q").asc(), F.col("segment").asc()], rank_col="__rnk"
    )
    consts = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("__m"),
        F.sum(F.lit(1.0) / F.col("__rnk")).alias("__cm"),
    )
    raw = (
        ranked.crossJoin(F.broadcast(consts))
        .withColumn(
            "raw",
            (F.col("p_q").cast("double") / 1000000000000.0)
            * F.col("__m").cast("double")
            * F.col("__cm")
            / F.col("__rnk").cast("double"),
        )
        .drop("__rnk", "__m", "__cm")
    )
    adj = global_running_min(
        raw,
        [F.col("p_q").desc(), F.col("segment").desc()],
        "raw",
        out_col="p_adj_raw",
    ).drop("raw")
    return adj.select(
        F.col("segment").cast("bigint").alias("segment"),
        "n_b",
        "x_b",
        F.round("zv", 6).alias("z_stat"),
        "p_q",
        F.round(F.least(F.col("p_adj_raw"), F.lit(1.0)), 9).alias("p_adj"),
        (F.least(F.col("p_adj_raw"), F.lit(1.0)) <= 0.05).alias("reject"),
    )


@register(
    "stats_negative_binomial_fit",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, c.c_mktsegment,
         CAST(COUNT(o.o_orderkey) AS BIGINT) AS k
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_mktsegment
),
mom AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_cust,
         CAST(SUM(k) AS BIGINT) AS sk,
         CAST(SUM(k * k) AS BIGINT) AS skk
  FROM per_cust GROUP BY c_mktsegment
)
SELECT c_mktsegment, n_cust,
       ROUND(CAST(sk AS DOUBLE) / n_cust, 6) AS mean_k,
       ROUND(CAST(skk AS DOUBLE) / n_cust
             - (CAST(sk AS DOUBLE) / n_cust) * (CAST(sk AS DOUBLE) / n_cust),
             6) AS var_k,
       ROUND(CASE WHEN CAST(skk AS DOUBLE) / n_cust
                       - POWER(CAST(sk AS DOUBLE) / n_cust, 2)
                       > CAST(sk AS DOUBLE) / n_cust
             THEN POWER(CAST(sk AS DOUBLE) / n_cust, 2)
                  / (CAST(skk AS DOUBLE) / n_cust
                     - POWER(CAST(sk AS DOUBLE) / n_cust, 2)
                     - CAST(sk AS DOUBLE) / n_cust)
             END, 6) AS nb_r,
       ROUND(CASE WHEN CAST(skk AS DOUBLE) / n_cust
                       - POWER(CAST(sk AS DOUBLE) / n_cust, 2)
                       > CAST(sk AS DOUBLE) / n_cust
             THEN (CAST(sk AS DOUBLE) / n_cust)
                  / (CAST(skk AS DOUBLE) / n_cust
                     - POWER(CAST(sk AS DOUBLE) / n_cust, 2))
             END, 6) AS nb_p,
       CAST(skk AS DOUBLE) / n_cust - POWER(CAST(sk AS DOUBLE) / n_cust, 2)
         > CAST(sk AS DOUBLE) / n_cust AS overdispersed
FROM mom
""",
    tags=("stats",),
)
def stats_negative_binomial_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEGATIVE-BINOMIAL FIT by method of moments — the standard
    model for OVERDISPERSED counts (orders per customer, events per
    user, defects per unit) where Poisson's mean=variance assumption
    fails: NB(r, p) with r = m^2/(v - m) and p = m/v from the
    sample mean m and (population) variance v.
    Customers with ZERO orders are kept through the LEFT join — the
    zero class drives the dispersion estimate, and dropping it is
    the classic silent bias. Moments come from exact BIGINT
    sum/sum-of-squares per segment (one partial+final aggregate
    after a customer-grain count), so both engines compute v from
    the identical integers; the overdispersion guard (v > m) nulls
    the fit where Poisson already suffices instead of emitting a
    negative r. Scale: join partitioned on custkey, two hash
    aggregates, 5-row output."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").cast("bigint").alias("k"))
    )
    mom = per.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cust"),
        F.sum("k").cast("bigint").alias("sk"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("skk"),
    )
    m = F.col("sk").cast("double") / F.col("n_cust")
    v = F.col("skk").cast("double") / F.col("n_cust") - m * m
    over = v > m
    return mom.select(
        "c_mktsegment",
        "n_cust",
        F.round(m, 6).alias("mean_k"),
        F.round(v, 6).alias("var_k"),
        F.round(F.when(over, m * m / (v - m)), 6).alias("nb_r"),
        F.round(F.when(over, m / v), 6).alias("nb_p"),
        over.alias("overdispersed"),
    )


@register(
    "stats_power_analysis_2prop",
    oracle="""
WITH arms AS (
  SELECT o_custkey % 20 AS segment,
         CASE WHEN o_orderkey % 2 = 0 THEN 'control' ELSE 'treat' END AS arm,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
           AS x
  FROM orders GROUP BY segment, arm
),
wide AS (
  SELECT segment,
         MAX(CASE WHEN arm = 'control' THEN CAST(x AS DOUBLE) / n END) AS p1,
         MAX(CASE WHEN arm = 'control' THEN n END) AS n1,
         MAX(CASE WHEN arm = 'treat' THEN CAST(x AS DOUBLE) / n END) AS p2,
         MAX(CASE WHEN arm = 'treat' THEN n END) AS n2
  FROM arms GROUP BY segment
)
SELECT CAST(segment AS BIGINT) AS segment,
       CAST(n1 AS BIGINT) AS n_control, CAST(n2 AS BIGINT) AS n_treat,
       ROUND(p1, 6) AS p_control, ROUND(p2, 6) AS p_treat,
       ROUND(p2 - p1, 6) AS effect_abs,
       CASE WHEN ABS(p2 - p1) > 1e-12 THEN
         CAST(CEIL(POWER(1.959964 + 0.841621, 2)
              * (p1 * (1.0 - p1) + p2 * (1.0 - p2))
              / POWER(p2 - p1, 2)) AS BIGINT)
       END AS n_required_per_arm,
       CASE WHEN ABS(p2 - p1) > 1e-12 THEN
         CEIL(POWER(1.959964 + 0.841621, 2)
              * (p1 * (1.0 - p1) + p2 * (1.0 - p2))
              / POWER(p2 - p1, 2)) <= LEAST(n1, n2)
       ELSE FALSE END AS adequately_powered
FROM wide
""",
    tags=("stats",),
)
def stats_power_analysis_2prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POWER ANALYSIS for a two-proportion test — the experiment-
    planning calculation every A/B platform runs BEFORE launch and
    every meta-analysis runs after: given the observed control/
    treatment rates per segment, the required sample size per arm
    for 80% power at two-sided alpha=0.05 is n = (z_{a/2} + z_b)^2 *
    (p1 q1 + p2 q2) / (p2 - p1)^2 (Fleiss). The normal quantiles
    are PINNED LITERALS (1.959964, 0.841621) — the fixed
    (alpha, power) design point every power table publishes — so no
    inverse-CDF polynomial can disagree between engines; the
    adequately_powered flag then compares requirement to the arms'
    actual sizes, the exact 'can this segment support a read-out?'
    gate. One aggregate to the (segment, arm) grain, a 2-row pivot
    per segment, per-row closed form: nothing here scales with the
    fact beyond the first aggregate."""
    o = table(spark, sf_dir, "orders")
    arms = o.groupBy(
        (F.col("o_custkey") % 20).alias("segment"),
        F.when(F.col("o_orderkey") % 2 == 0, "control")
        .otherwise("treat")
        .alias("arm"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    wide = arms.groupBy("segment").agg(
        F.max(
            F.when(
                F.col("arm") == "control",
                F.col("x").cast("double") / F.col("n"),
            )
        ).alias("p1"),
        F.max(F.when(F.col("arm") == "control", F.col("n"))).alias("n1"),
        F.max(
            F.when(
                F.col("arm") == "treat",
                F.col("x").cast("double") / F.col("n"),
            )
        ).alias("p2"),
        F.max(F.when(F.col("arm") == "treat", F.col("n"))).alias("n2"),
    )
    p1, p2 = F.col("p1"), F.col("p2")
    req = F.ceil(
        F.pow(F.lit(1.959964 + 0.841621), 2)
        * (p1 * (1.0 - p1) + p2 * (1.0 - p2))
        / F.pow(p2 - p1, 2)
    )
    nonzero = F.abs(p2 - p1) > 1e-12
    return wide.select(
        F.col("segment").cast("bigint").alias("segment"),
        F.col("n1").cast("bigint").alias("n_control"),
        F.col("n2").cast("bigint").alias("n_treat"),
        F.round(p1, 6).alias("p_control"),
        F.round(p2, 6).alias("p_treat"),
        F.round(p2 - p1, 6).alias("effect_abs"),
        F.when(nonzero, req.cast("bigint")).alias("n_required_per_arm"),
        F.when(nonzero, req <= F.least(F.col("n1"), F.col("n2")))
        .otherwise(F.lit(False))
        .alias("adequately_powered"),
    )


@register(
    "stats_gumbel_max_fit",
    oracle="""
WITH daily_max AS (
  SELECT o_orderpriority,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
         CAST(MAX(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS mx
  FROM orders GROUP BY o_orderpriority, d
),
mom AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         SUM(CAST(mx AS DOUBLE)) / COUNT(*) / 100.0 AS m,
         (SUM(CAST(mx AS DOUBLE) * mx) / COUNT(*)
          - POWER(SUM(CAST(mx AS DOUBLE)) / COUNT(*), 2)) / 10000.0 AS v
  FROM daily_max GROUP BY o_orderpriority
)
SELECT o_orderpriority, n_days,
       ROUND(m, 6) AS mean_max,
       ROUND(SQRT(6.0 * v) / PI(), 6) AS beta,
       ROUND(m - 0.5772156649015329 * SQRT(6.0 * v) / PI(), 6) AS mu,
       ROUND(m - 0.5772156649015329 * SQRT(6.0 * v) / PI()
             - SQRT(6.0 * v) / PI() * LN(-LN(0.99)), 6)
         AS return_level_p99
FROM mom
""",
    tags=("stats",),
)
def stats_gumbel_max_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GUMBEL (EV-I) FIT of block maxima — extreme-value theory's
    answer to 'how big is the 1-in-100-day spike?': the Fisher-
    Tippett limit says daily MAXIMA converge to a Gumbel, fit here
    by method of moments (beta = sqrt(6 v)/pi, mu = mean -
    gamma_EulerMascheroni * beta — the constant pinned as an exact
    literal) from the per-(priority, day) maxima of order totals;
    the p99 return level mu - beta*ln(-ln(0.99)) is the capacity-
    planning number SRE/risk teams actually quote. Two cascaded
    hash aggregates — fact scan -> (priority, day) max (the
    block-maxima reduce, map-side combinable) -> per-priority
    moments on the bounded day grain — no window, no sort; money
    exact in BIGINT cents through both reductions, moments in
    DOUBLE only at the 5-row tail."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority",
        F.unix_date(F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("d"),
    ).agg(F.max(cents("o_totalprice")).cast("bigint").alias("mx"))
    n = F.count(F.lit(1))
    m = F.sum(F.col("mx").cast("double")) / n / 100.0
    v = (
        F.sum(F.col("mx").cast("double") * F.col("mx")) / n
        - F.pow(F.sum(F.col("mx").cast("double")) / n, 2)
    ) / 10000.0
    mom = daily.groupBy("o_orderpriority").agg(
        n.cast("bigint").alias("n_days"),
        m.alias("m"),
        v.alias("v"),
    )
    import math  # noqa: PLC0415

    gamma = 0.5772156649015329
    beta = F.sqrt(6.0 * F.col("v")) / math.pi
    mu = F.col("m") - gamma * beta
    return mom.select(
        "o_orderpriority",
        "n_days",
        F.round("m", 6).alias("mean_max"),
        F.round(beta, 6).alias("beta"),
        F.round(mu, 6).alias("mu"),
        F.round(mu - beta * F.log(-F.log(F.lit(0.99))), 6).alias(
            "return_level_p99"
        ),
    )

"""SURVEY §2.14 — composite analytic queries (TPC-H shapes).

End-to-end workloads combining selective dim filters, multiway joins,
aggregation, and deterministic top-k — the shapes a user of the
engine actually runs, exercising the full Catalyst pipeline in one
plan (broadcast dim joins, partial+final hash aggregation,
TakeOrderedAndProject).

Adapted to the fixture schemas: orders has no o_shippriority and
lineitem no l_receiptdate (FIXTURES.md), so the grouping/filter
columns are trimmed accordingly. Revenue sums use exact scale-4 cents
(price and discount are 2-decimal doubles), and every top-k order is
tie-broken by a unique key so both engines select the same row set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import SQL_DEC_SUM, dec_sum, table
from ..registry import register

_REV = "l_extendedprice * (1 - l_discount)"
_CUTOFF = "1998-07-01"


@register(
    "tpch_q3_shipping",
    oracle=f"""
SELECT l_orderkey,
       {SQL_DEC_SUM(_REV, 4)} AS revenue,
       o_orderdate
FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_CUTOFF}'
  AND l_shipdate > TIMESTAMP '{_CUTOFF}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 10 highest-revenue unshipped BUILDING orders.

    Plan: customer filter broadcasts into orders, the orders slice
    joins lineitem on its key, one hash-agg, then
    TakeOrderedAndProject (no global sort materialization). The
    revenue double comes from an exact cents sum, so DESC order and
    the top-10 cut agree across engines; ties break on l_orderkey.
    """
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dec_sum(F.expr(_REV), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q10_returns",
    oracle=f"""
SELECT c_custkey, c_name, {SQL_DEC_SUM(_REV, 4)} AS revenue, n_name
FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1998-01-01'
  AND o_orderdate < TIMESTAMP '1998-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns
    in 1998Q1.

    Fact-first join order (lineitem filtered on returnflag drives),
    nation broadcasts, customer joins on its key; single hash-agg on
    the composite customer key; deterministic top-20 via exact cents
    revenue + custkey tie-break.
    """
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dec_sum(F.expr(_REV), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q5_local_supplier",
    oracle=f"""
SELECT n_name, {SQL_DEC_SUM(_REV, 4)} AS revenue
FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 1997 revenue by nation where the supplier is
    local to the customer (c_nationkey = s_nationkey), restricted to
    one region.

    Plan: region -> nation is a two-level broadcast chain into
    supplier; the fact side (lineitem x filtered orders) shuffles once
    on the order key; the local-supplier predicate rides the supplier
    join as a second equi-condition, so Catalyst keeps it a hash join
    (no theta-join blowup). Output is nation-count sized — the final
    sort is trivial. At 100 TB the only big exchange is
    lineitem-orders; everything else is broadcast."""
    region = (
        table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    nation = table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    cust = table(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dec_sum(F.expr(_REV), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "tpch_q18_large_orders",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem GROUP BY l_orderkey
  HAVING {SQL_DEC_SUM("l_quantity", 2)} > 250.0
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {SQL_DEC_SUM("l_quantity", 2)} AS total_qty
FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  JOIN big ON o_orderkey = big.l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose orders exceed a total-quantity
    threshold (large-volume buyers), top-100 by order price.

    Plan: the HAVING subquery is a first hash-agg over lineitem keyed
    on l_orderkey; its survivors (rare) semi-filter the fact join. The
    second agg reuses the same l_orderkey partitioning, so AQE can
    plan the big-orders join without a new shuffle of lineitem; the
    threshold list is tiny and broadcasts. Exact cents quantity sums
    keep the > threshold cut and the final ordering engine-identical
    (ties broken on o_orderkey)."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dec_sum("l_quantity", 2).alias("q"))
        .filter(F.col("q") > 250.0)
        .select("l_orderkey")
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        li.join(F.broadcast(big), "l_orderkey")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dec_sum("l_quantity", 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )

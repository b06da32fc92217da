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

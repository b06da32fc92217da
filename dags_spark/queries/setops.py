"""SURVEY §2.7 — set operations.

`set_union_all` mirrors the reference's `accumulator` stdlib
component (append-only accumulation of new blocks [K]); UNION ALL in
Spark is a zero-shuffle plan concatenation — exactly what block
accumulation should compile to at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import table
from ..registry import register


@register(
    "set_union_all",
    oracle="""
SELECT event_id, user_id, event_type, value FROM events
WHERE ts < TIMESTAMP '2024-01-08'
UNION ALL
SELECT event_id, user_id, event_type, value FROM events
WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-12'
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping slices appended with duplicates kept (accumulator
    semantics): unionByName, no shuffle."""
    ev = table(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "value"]
    a = ev.filter(F.col("ts") < F.lit("2024-01-08").cast("timestamp")).select(*cols)
    b = ev.filter(
        (F.col("ts") >= F.lit("2024-01-05").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-12").cast("timestamp"))
    ).select(*cols)
    return a.unionByName(b)


@register(
    "set_union_distinct",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct union of two overlapping customer slices."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_mktsegment")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_mktsegment")
    return a.union(b).distinct()


@register(
    "set_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with both open and finished orders."""
    o = table(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.intersect(fin)


@register(
    "set_except",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with open but no finished orders (distinct EXCEPT)."""
    o = table(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.subtract(fin)  # subtract == EXCEPT (distinct)


@register(
    "set_union_byname_missing",
    oracle="""
SELECT c_custkey AS entity_key, c_mktsegment AS segment, c_acctbal AS acctbal
FROM customer WHERE c_acctbal > 9000
UNION ALL BY NAME
SELECT s_suppkey AS entity_key, s_acctbal AS acctbal
FROM supplier WHERE s_acctbal > 9000
""",
)
def set_union_byname_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two entity slices with different column
    sets appended by NAME, absent columns null-filled — the
    accumulator semantics when upstream schemas drift (reference
    schemas had loose implements/inherits relations)."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(
            F.col("c_custkey").alias("entity_key"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_acctbal").alias("acctbal"),
        )
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(
            F.col("s_suppkey").alias("entity_key"),
            F.col("s_acctbal").alias("acctbal"),
        )
    )
    return c.unionByName(s, allowMissingColumns=True)


@register(
    "set_bag_ops",
    oracle="""
WITH a AS (SELECT l_suppkey % 100 AS k FROM lineitem WHERE l_returnflag = 'R'),
b AS (SELECT l_suppkey % 100 AS k FROM lineitem WHERE l_linestatus = 'F')
SELECT 'except_all' AS op, k, COUNT(*) AS n
FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY k
UNION ALL
SELECT 'intersect_all', k, COUNT(*)
FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY k
""",
)
def set_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG (multiset) set operations — `exceptAll` / `intersectAll`
    keep multiplicities (count-difference / count-min per value),
    unlike the distinct §2.7 variants: the semantics behind 'how many
    rows did stage B drop'. Both plan as one hash-agg of per-side
    counts + a generate — no sort, no distinct shuffle of raw rows.
    Output is re-aggregated per key so the check is order-free."""
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(
        (F.col("l_suppkey") % 100).alias("k")
    )
    b = li.filter(F.col("l_linestatus") == "F").select(
        (F.col("l_suppkey") % 100).alias("k")
    )
    ex = (
        a.exceptAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "k", "n")
    )
    ix = (
        a.intersectAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "k", "n")
    )
    return ex.unionByName(ix)

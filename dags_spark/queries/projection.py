"""SURVEY §2.2 — projection / filter / distinct.

All narrow transformations: no shuffle (except distinct), filters and
projections reach the parquet scan via Catalyst pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import cents, table
from ..registry import register


@register(
    "project_rename_cast",
    oracle="""
SELECT l_orderkey AS order_key,
       l_linenumber AS line_no,
       CAST(l_quantity AS INTEGER) AS qty_int,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str
FROM lineitem
""",
)
def project_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select + rename + cast (int truncation and decimal rendering)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_extendedprice").cast("decimal(12,2)").cast("string").alias("price_str"),
    )


@register(
    "project_computed",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(ROUND((l_extendedprice) * 100, 0) AS BIGINT) * (100 - CAST(ROUND((l_discount) * 100, 0) AS BIGINT)) AS DOUBLE) / 10000.0 AS disc_price,
       CAST(l_quantity * 2 AS DOUBLE) AS double_qty
FROM lineitem
""",
)
def project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived arithmetic columns (exact decimal product -> double)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            (cents("l_extendedprice") * (F.lit(100) - cents("l_discount")))
            .cast("double")
            / F.lit(10000.0)
        ).alias("disc_price"),
        (F.col("l_quantity") * 2).cast("double").alias("double_qty"),
    )


@register(
    "filter_conjunction",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def filter_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped conjunctive filter — all four predicates push
    down to the parquet scan."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_shipdate")


@register(
    "filter_in_like",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_type
FROM part
WHERE p_type IN ('ECONOMY', 'PROMO', 'STANDARD') AND p_name LIKE '%bolt%'
""",
)
def filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + LIKE pattern filters."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").isin("ECONOMY", "PROMO", "STANDARD")
        & F.col("p_name").like("%bolt%")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@register(
    "filter_null_semantics",
    oracle="""
SELECT o_orderkey,
       NULLIF(o_orderstatus, 'P') AS status_np,
       (NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM 'O') AS nullsafe_is_o,
       (NULLIF(o_orderstatus, 'P') IS NULL) AS is_p,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_filled
FROM orders
""",
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality + IS NULL + COALESCE over a column made
    nullable with NULLIF (fixtures themselves contain no NULLs)."""
    o = table(spark, sf_dir, "orders")
    status_np = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        status_np.alias("status_np"),
        status_np.eqNullSafe(F.lit("O")).alias("nullsafe_is_o"),
        status_np.isNull().alias("is_p"),
        F.coalesce(status_np, F.lit("PENDING")).alias("status_filled"),
    )


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT — hash-aggregate on all columns (partial+final,
    so the shuffle carries only unique pairs)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@register(
    "fn_na_handling",
    oracle="""
WITH src AS (
  SELECT c_custkey,
         NULLIF(c_mktsegment, 'MACHINERY') AS seg,
         CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END AS bal
  FROM customer
),
filled AS (
  SELECT c_custkey,
         COALESCE(seg, 'UNKNOWN') AS seg,
         COALESCE(bal, 0.0) AS bal,
         (seg IS NOT NULL AND bal IS NOT NULL) AS was_complete
  FROM src
)
SELECT c_custkey,
       CASE WHEN seg = 'BUILDING' THEN 'CONSTRUCTION' ELSE seg END AS seg,
       bal, was_complete
FROM filled
""",
)
def fn_na_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `df.na` missing-data API as a checked surface: `na.fill`
    with per-column defaults, `na.replace` for value recoding, and a
    completeness flag computed BEFORE filling (the audit column a
    pipeline keeps so imputation stays distinguishable from observed
    data — silently filled rows are a classic training-data bug).
    NULLs are derived in-query (segment via NULLIF, balance on key
    parity) since the fixture is complete. na.drop is exercised in
    the complement: was_complete marks exactly the rows it would
    keep. Scan-local; the oracle states the same semantics with
    COALESCE/CASE."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg"),
        F.when(F.col("c_custkey") % 5 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    flagged = c.withColumn(
        "was_complete", F.col("seg").isNotNull() & F.col("bal").isNotNull()
    )
    filled = flagged.na.fill({"seg": "UNKNOWN", "bal": 0.0})
    return filled.na.replace("BUILDING", "CONSTRUCTION", subset=["seg"])

"""SURVEY §2.6 — sorts / limits / top-k.

The value-hash is order-insensitive, so ordering queries materialize
their order as a rank column (deterministic via unique tie-break
keys). Top-k uses Spark's TakeOrderedAndProjectExec (per-partition
heap + driver merge — no global sort, the right plan at 100 TB).
Global ranks use the two-phase global_rank operator
(operators/scale.py): range-partition + parallel in-partition ranks +
broadcast partition offsets — never `Window.orderBy()`'s
single-partition funnel (tests/test_plan_lint.py enforces this
surface-wide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import table
from ..operators.scale import global_rank
from ..registry import register


@register(
    "sort_multi",
    oracle="""
SELECT o_orderkey,
       ROW_NUMBER() OVER (ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC) AS sort_rank
FROM orders
""",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort (priority ASC, totalprice DESC) materialized as a
    rank column with a unique tie-break — via the two-phase global_rank
    operator (operators/scale.py): range-partition + parallel in-partition
    ranks + broadcast offsets, never a single-partition window."""
    o = table(spark, sf_dir, "orders")
    return global_rank(
        o.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        [
            F.col("o_orderpriority").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        ],
        rank_col="sort_rank",
    ).select("o_orderkey", "sort_rank")


@register(
    "sort_nulls_last",
    oracle="""
SELECT o_orderkey,
       ROW_NUMBER() OVER (ORDER BY NULLIF(o_orderpriority, '3-MEDIUM') ASC NULLS LAST, o_orderkey ASC) AS null_rank
FROM orders
""",
)
def sort_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS LAST ordering over a column made nullable via NULLIF,
    ranked scalably via global_rank (see sort_multi)."""
    o = table(spark, sf_dir, "orders")
    nullable = F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
    return global_rank(
        o.select("o_orderkey", nullable.alias("__np")),
        [F.col("__np").asc_nulls_last(), F.col("o_orderkey").asc()],
        rank_col="null_rank",
    ).select("o_orderkey", "null_rank")


@register(
    "topk_global",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
""",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 by price -> TakeOrderedAndProject (heap per
    partition, merge on driver; never a full sort)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(20)
    )


@register(
    "limit_offset",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_orderkey
LIMIT 20 OFFSET 40
""",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pagination over a unique sort key (rows 41-60)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderkey").select("o_orderkey", "o_totalprice").offset(40).limit(20)
    )


@register(
    "sort_keyset_pagination",
    oracle="""
WITH page AS (
  SELECT o_orderkey, o_totalprice, o_orderdate
  FROM orders
  WHERE o_orderkey > (
    SELECT MAX(o_orderkey) FROM (
      SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 40
    )
  )
  ORDER BY o_orderkey LIMIT 20
)
SELECT o_orderkey, o_totalprice, o_orderdate FROM page
""",
)
def sort_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYSET pagination — the scalable replacement for OFFSET
    (limit_offset shows the API; this shows why production cursors
    don't use it): page N via OFFSET scans and discards N·20 rows
    every request, while the keyset form `WHERE key > last_seen
    ORDER BY key LIMIT 20` is a pushed-down range predicate — the
    scan SKIPS to the cursor via parquet min/max stats and reads one
    page's worth, the same work for page 3 or page 3 million. The
    key computes page 3 both ways implicitly: the cursor (max key of
    the first 40 rows) is derived in-query, and the result must
    equal rows 41–60 of the key order — proving cursor pagination
    returns exactly the page OFFSET would, without OFFSET's
    O(pages-scanned) cost."""
    o = table(spark, sf_dir, "orders")
    cursor = (
        o.select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(40)
        .agg(F.max("o_orderkey").alias("last_seen"))
    )
    return (
        o.crossJoin(F.broadcast(cursor))
        .filter(F.col("o_orderkey") > F.col("last_seen"))
        .orderBy("o_orderkey")
        .limit(20)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@register(
    "sample_reservoir_hash",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM (
  SELECT o_orderkey, o_totalprice,
         md5(CAST(o_orderkey AS VARCHAR) || ':resv1') AS hk
  FROM orders
)
ORDER BY hk LIMIT 50
""",
    tags=("sample", "sort"),
)
def sample_reservoir_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC exactly-k uniform sample — the distributed
    replacement for reservoir sampling: rank every row by a salted
    key hash and keep the global k smallest. Same statistical
    guarantee as a reservoir (md5 is uniform over keys, the salt
    picks the draw), but with properties a sequential reservoir
    cannot give at scale: embarrassingly parallel (per-partition
    top-k then merge — Spark plans it as TakeOrderedAndProject, no
    global sort, no state), identical across engines/retries/
    backfills, and EXPANDABLE (k'>k keeps the first k — the sample
    is a prefix of a fixed permutation, so growing the sample never
    resamples). Changing the salt string is a fresh independent
    draw. The classic hash-reservoir trick every training-data
    pipeline needs for eval splits and debugging subsets."""
    o = table(spark, sf_dir, "orders")
    hk = F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":resv1")))
    return (
        o.select("o_orderkey", "o_totalprice", hk.alias("hk"))
        .orderBy("hk")
        .limit(50)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "win_topn_ties_dense",
    oracle="""
WITH spend AS (
  -- rank on spend QUANTIZED to 100k-dollar bands so boundary ties
  -- genuinely exist at fixture scale (the semantics under test)
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT)) // 100000 AS BIGINT)
           AS spend_band
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, spend_band,
         DENSE_RANK() OVER (ORDER BY spend_band DESC) AS dr,
         ROW_NUMBER() OVER (ORDER BY spend_band DESC, o_custkey) AS rn
  FROM spend
)
SELECT o_custkey, spend_band,
       CAST(dr AS BIGINT) AS dense_rank_pos,
       CAST(rn AS BIGINT) AS row_number_pos
FROM ranked WHERE dr <= 3
""",
    tags=("sort", "window"),
)
def win_topn_ties_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-N WITH TIES (dense-rank cut): keep every customer in the
    top 3 spend BANDS (100k-dollar quantization so boundary ties
    genuinely exist at fixture scale) — the 'WITH TIES' semantics a
    row_number cut silently violates (it drops arbitrary members of
    the boundary tie group; leaderboards and quota cutoffs are wrong
    exactly there).
    Emitting BOTH ranks makes the divergence part of the checked
    output: row_number_pos can exceed 3 while dense_rank_pos <= 3 —
    the rows a naive top-k loses. Spend agg is corpus work (one
    hash-agg). Round 8, the scale rewrite is real instead of argued:
    dense_rank<=3 needs only the top-3 DISTINCT bands — a
    TakeOrdered(3) on the band-distinct relation, broadcast back as
    a semi-filter that carries its own dense position — and because
    the kept rows form a PREFIX of the (band desc, custkey) total
    order, row_number over them equals the global row_number; it
    runs on the two-pass global_rank. No customer-grain relation
    ever funnels through one task."""
    from ..operators.scale import global_rank  # noqa: PLC0415

    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.expr(
            "CAST(SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT)) div 100000"
            " AS BIGINT)"
        ).alias("spend_band")
    )
    top3 = (
        spend.select("spend_band")
        .distinct()
        .orderBy(F.col("spend_band").desc())
        .limit(3)
        .withColumn(
            "dense_rank_pos",
            F.row_number()
            .over(Window.orderBy(F.col("spend_band").desc()))
            .cast("bigint"),
        )
    )
    kept = spend.join(F.broadcast(top3), "spend_band")
    ranked = global_rank(
        kept,
        [F.col("spend_band").desc(), F.col("o_custkey").asc()],
        rank_col="row_number_pos",
    )
    return ranked.select(
        "o_custkey",
        "spend_band",
        "dense_rank_pos",
        F.col("row_number_pos").cast("bigint").alias("row_number_pos"),
    )

"""SURVEY §2.11 widening — feature-engineering operators.

The "fit a tiny model on the corpus, broadcast it, apply row-wise"
family every training pipeline needs between raw tables and a
trainer: leakage-safe target encoding, weight-of-evidence binning,
top-N one-hot vocabularies, and robust (median/IQR) scaling.

Determinism: every quantile/bin/vocab is rank-based over a pinned
total order (value, unique key) — no float bounds, no RNG — and all
money/balance arithmetic runs in exact DECIMAL cents until one final
division (registry rules 2 and 3).

Scale notes (100 TB design point):
- every "fit" output is model-sized (a vocab, 10 bins, 4 quantile
  ranks per group) and re-enters the plan as a broadcast join — the
  fact table streams through map-side, one shuffle for the fit agg;
- leave-one-out encoding needs NO per-row second pass: the category
  aggregate joins back broadcast and the row subtracts itself
  algebraically ((sum - y)/(n - 1)) — the standard trick that makes
  LOO schedulable at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import cents, table
from ..registry import register


@register(
    "feat_target_encode_loo",
    oracle="""
WITH cat AS (
  SELECT o_orderpriority AS pri,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS sum_c,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY o_orderpriority
),
g_all AS (
  SELECT SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS gsum_c,
         CAST(COUNT(*) AS BIGINT) AS gn
  FROM orders
)
SELECT o.o_orderkey, o.o_orderpriority AS pri,
       ROUND(CASE WHEN c.n > 1
                  THEN CAST(c.sum_c - CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)
                            AS DOUBLE) / 100.0 / (c.n - 1)
                  ELSE CAST(g.gsum_c AS DOUBLE) / 100.0 / g.gn
             END, 4) AS loo_enc
FROM orders o
JOIN cat c ON o.o_orderpriority = c.pri
CROSS JOIN g_all g
""",
)
def feat_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out TARGET ENCODING of a categorical column — the
    leakage-safe way to turn a category into a number: each row gets
    the mean target of its category computed WITHOUT itself, so the
    encoding never memorizes the row's own label. The whole LOO is
    algebraic — (category_sum - own_y) / (n - 1) — so one aggregate
    pass + one broadcast join replaces the naive per-row re-
    aggregation; singleton categories fall back to the global mean
    (the standard prior). Sums stay in exact DECIMAL cents; the one
    division per row is mirrored verbatim in the oracle."""
    o = table(spark, sf_dir, "orders")
    cat = o.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.sum(cents("o_totalprice")).alias("sum_c"),
        F.count(F.lit(1)).alias("n"),
    )
    glob = o.agg(
        F.sum(cents("o_totalprice")).alias("gsum_c"),
        F.count(F.lit(1)).alias("gn"),
    )
    loo = (
        F.when(
            F.col("n") > 1,
            (F.col("sum_c") - cents("o_totalprice")).cast("double")
            / 100.0
            / (F.col("n") - 1),
        )
        .otherwise(F.col("gsum_c").cast("double") / 100.0 / F.col("gn"))
    )
    return (
        o.join(F.broadcast(cat), o.o_orderpriority == cat.pri)
        .crossJoin(F.broadcast(glob))
        .select(
            "o_orderkey",
            F.col("o_orderpriority").alias("pri"),
            F.round(loo, 4).alias("loo_enc"),
        )
    )


@register(
    "feat_woe_iv",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, c.c_acctbal,
         CASE WHEN COUNT(o.o_orderkey) >= 10 THEN 1 ELSE 0 END AS good
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey, c.c_acctbal
),
binned AS (
  SELECT good,
         NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS bin
  FROM per_cust
),
tot AS (
  SELECT SUM(good) AS g_tot, SUM(1 - good) AS b_tot FROM binned
),
bins AS (
  SELECT bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(good) AS BIGINT) AS n_good,
         CAST(SUM(1 - good) AS BIGINT) AS n_bad
  FROM binned GROUP BY bin
)
SELECT b.bin, b.n, b.n_good, b.n_bad,
       ROUND(LN(((b.n_good + 0.5) / (t.g_tot + 5.0)) /
                ((b.n_bad + 0.5) / (t.b_tot + 5.0))), 6) AS woe,
       ROUND(((b.n_good + 0.5) / (t.g_tot + 5.0) -
              (b.n_bad + 0.5) / (t.b_tot + 5.0)) *
             LN(((b.n_good + 0.5) / (t.g_tot + 5.0)) /
                ((b.n_bad + 0.5) / (t.b_tot + 5.0))), 6) AS iv_term
FROM bins b CROSS JOIN tot t
""",
)
def feat_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHT OF EVIDENCE + INFORMATION VALUE per decile bin — the
    credit-scoring / feature-selection standard: bin a continuous
    feature (account balance, rank-based NTILE(10) over a pinned
    total order), score each bin's separation of a binary target
    (active customer: >= 10 lifetime orders) as ln(good%/bad%), and
    emit the per-bin IV contribution. Laplace +0.5 smoothing (with
    the matching +5 = 0.5*bins on the totals) keeps all-good/all-bad
    bins finite — pinned identically in both engines. The only
    transcendental is one LN per 10-row output, rounded 6dp. Scale:
    the per-customer agg shards by key; the binning is a single
    window over customer-count rows (already aggregated — small),
    and the totals broadcast."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.when(F.count("o_orderkey") >= 10, 1).otherwise(0).alias("good")
        )
    )
    binned = per_cust.select(
        "good",
        F.ntile(10).over(Window.orderBy("c_acctbal", "c_custkey")).alias("bin"),
    )
    tot = binned.agg(
        F.sum("good").alias("g_tot"), F.sum(1 - F.col("good")).alias("b_tot")
    )
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("good").cast("bigint").alias("n_good"),
        F.sum(1 - F.col("good")).cast("bigint").alias("n_bad"),
    )
    g_pct = (F.col("n_good") + 0.5) / (F.col("g_tot") + 5.0)
    b_pct = (F.col("n_bad") + 0.5) / (F.col("b_tot") + 5.0)
    woe = F.log(g_pct / b_pct)
    return bins.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        "n_good",
        "n_bad",
        F.round(woe, 6).alias("woe"),
        F.round((g_pct - b_pct) * woe, 6).alias("iv_term"),
    )


@register(
    "feat_onehot_topn",
    oracle="""
WITH vocab AS (
  SELECT p_type, vr FROM (
    SELECT p_type,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, p_type) AS vr
    FROM part GROUP BY p_type
  ) WHERE vr <= 5
)
SELECT p.p_partkey, p.p_type,
       CAST(COALESCE(v.vr, 0) AS BIGINT) AS vocab_rank,
       CASE WHEN v.vr = 1 THEN 1 ELSE 0 END AS f1,
       CASE WHEN v.vr = 2 THEN 1 ELSE 0 END AS f2,
       CASE WHEN v.vr = 3 THEN 1 ELSE 0 END AS f3,
       CASE WHEN v.vr = 4 THEN 1 ELSE 0 END AS f4,
       CASE WHEN v.vr = 5 THEN 1 ELSE 0 END AS f5,
       CASE WHEN v.vr IS NULL THEN 1 ELSE 0 END AS f_other
FROM part p LEFT JOIN vocab v ON p.p_type = v.p_type
""",
)
def feat_onehot_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-HOT ENCODING with a top-N vocabulary — the fit/apply
    pattern behind every categorical feature at scale: fit = the 5
    most frequent part types (frequency desc, name as tie-break — a
    pinned vocab, not a hash), apply = indicator columns plus the
    catch-all `other` bucket for tail categories. The vocab is
    model-sized and broadcast; the fact table streams through one
    map-side LEFT join — no shuffle of the encoded rows, the shape
    that holds when the table is 100 TB and the vocab is 5 rows."""
    p = table(spark, sf_dir, "part")
    vocab = (
        p.groupBy("p_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "p_type",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "p_type"))
            .alias("vr"),
        )
        .filter(F.col("vr") <= 5)
    )
    j = p.join(
        F.broadcast(vocab.withColumnRenamed("p_type", "v_type")),
        p.p_type == F.col("v_type"),
        "left",
    )
    cols = [
        F.when(F.col("vr") == i, 1).otherwise(0).alias(f"f{i}") for i in range(1, 6)
    ]
    return j.select(
        "p_partkey",
        "p_type",
        F.coalesce(F.col("vr"), F.lit(0)).cast("bigint").alias("vocab_rank"),
        *cols,
        F.when(F.col("vr").isNull(), 1).otherwise(0).alias("f_other"),
    )


@register(
    "feat_robust_scale",
    oracle="""
WITH ranked AS (
  SELECT c_mktsegment AS seg, c_custkey,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_c,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal, c_custkey) AS r,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM customer
),
q AS (
  SELECT seg,
         MAX(CASE WHEN r = GREATEST((n + 1) // 4, 1) THEN bal_c END) AS q1_c,
         MAX(CASE WHEN r = (n + 1) // 2 THEN bal_c END) AS med_c,
         MAX(CASE WHEN r = (3 * (n + 1)) // 4 THEN bal_c END) AS q3_c
  FROM ranked GROUP BY seg
)
SELECT rk.c_custkey, rk.seg,
       CAST(rk.bal_c AS DOUBLE) / 100.0 AS acctbal,
       CAST(q.med_c AS DOUBLE) / 100.0 AS seg_median,
       ROUND(CAST(rk.bal_c - q.med_c AS DOUBLE) / (q.q3_c - q.q1_c), 6)
         AS scaled
FROM ranked rk JOIN q ON rk.seg = q.seg
""",
)
def feat_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST SCALING — (x - median) / IQR per segment, the outlier-
    immune cousin of z-scoring (mean/std both break on heavy tails).
    The quartiles are RANK-BASED over a pinned total order (rank
    (n+1) DIV 2 etc. in exact cents), never interpolated floats, so
    bin math is integer end-to-end and the single scaling division
    is the only float op, rounded 6dp. Scale: one window sort per
    segment key computes ranks, the 3-quantile fit table (rows =
    segments) joins back broadcast, and every row scales map-side."""
    c = table(spark, sf_dir, "customer")
    # bal_c is an order-preserving image of c_acctbal (exact cents)
    w_r = Window.partitionBy("seg").orderBy("bal_c", "c_custkey")
    w_n = Window.partitionBy("seg")
    ranked = c.select(
        F.col("c_mktsegment").alias("seg"),
        "c_custkey",
        cents("c_acctbal").alias("bal_c"),
    ).select(
        "seg",
        "c_custkey",
        "bal_c",
        F.row_number().over(w_r).alias("r"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    q = ranked.groupBy("seg").agg(
        F.max(
            F.when(
                F.col("r") == F.greatest(F.expr("(n + 1) DIV 4"), F.lit(1)),
                F.col("bal_c"),
            )
        ).alias("q1_c"),
        F.max(F.when(F.col("r") == F.expr("(n + 1) DIV 2"), F.col("bal_c"))).alias(
            "med_c"
        ),
        F.max(
            F.when(F.col("r") == F.expr("(3 * (n + 1)) DIV 4"), F.col("bal_c"))
        ).alias("q3_c"),
    )
    return ranked.join(F.broadcast(q), "seg").select(
        "c_custkey",
        "seg",
        (F.col("bal_c").cast("double") / 100.0).alias("acctbal"),
        (F.col("med_c").cast("double") / 100.0).alias("seg_median"),
        F.round(
            (F.col("bal_c") - F.col("med_c")).cast("double")
            / (F.col("q3_c") - F.col("q1_c")),
            6,
        ).alias("scaled"),
    )

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
    the per-customer agg shards by key; the decile binning (round 8)
    runs on the two-pass global_ntile operator (exact NTILE
    remainder arithmetic over global_rank — bit-identical to
    NTILE(10), no customer-grain single-partition window) and the
    totals broadcast. Lint-clean with no waiver."""
    from ..operators.scale import global_ntile  # noqa: PLC0415

    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.when(F.count("o_orderkey") >= 10, 1).otherwise(0).alias("good")
        )
    )
    binned = global_ntile(
        per_cust,
        [F.col("c_acctbal").asc(), F.col("c_custkey").asc()],
        10,
        out_col="bin",
    ).select("good", "bin")
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


@register(
    "feat_kmeans_lloyd",
    oracle="""
WITH pts AS (
  SELECT p_partkey AS pid,
         CAST(p_size AS BIGINT) * 200 AS x,
         CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) - 90000 AS y
  FROM part
),
init AS (
  SELECT * FROM (VALUES (0, 2000, 2000), (1, 5000, 5000), (2, 8000, 8000))
    AS t(cid, cx, cy)
),
d1 AS (
  SELECT pid, x, y, cid,
         (x - cx) * (x - cx) + (y - cy) * (y - cy) AS dist,
         ROW_NUMBER() OVER (PARTITION BY pid
                            ORDER BY (x - cx) * (x - cx)
                                     + (y - cy) * (y - cy), cid) AS rn
  FROM pts CROSS JOIN init
),
a1 AS (SELECT pid, x, y, cid FROM d1 WHERE rn = 1),
m1 AS (
  SELECT cid,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM a1 GROUP BY cid
),
c1 AS (
  SELECT i.cid,
         COALESCE(CAST(m.sx AS DOUBLE) / m.n, i.cx) AS cx,
         COALESCE(CAST(m.sy AS DOUBLE) / m.n, i.cy) AS cy
  FROM init i LEFT JOIN m1 m ON i.cid = m.cid
),
d2 AS (
  SELECT pid, x, y, cid, cx, cy,
         ROW_NUMBER() OVER (PARTITION BY pid
                            ORDER BY (x - cx) * (x - cx)
                                     + (y - cy) * (y - cy), cid) AS rn
  FROM pts CROSS JOIN c1
),
a2 AS (SELECT pid, x, y, cid FROM d2 WHERE rn = 1),
m2 AS (
  SELECT cid,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM a2 GROUP BY cid
),
c2 AS (
  SELECT c1.cid,
         COALESCE(CAST(m.sx AS DOUBLE) / m.n, c1.cx) AS cx,
         COALESCE(CAST(m.sy AS DOUBLE) / m.n, c1.cy) AS cy,
         COALESCE(m.n, 0) AS n
  FROM c1 LEFT JOIN m2 m ON c1.cid = m.cid
)
SELECT c2.cid AS cluster_id,
       CAST(c2.n AS BIGINT) AS n_points,
       ROUND(c2.cx, 6) AS centroid_x,
       ROUND(c2.cy, 6) AS centroid_y,
       CAST(COALESCE(SUM(CAST(ROUND((a.x - c2.cx) * (a.x - c2.cx)
                                    + (a.y - c2.cy) * (a.y - c2.cy), 0)
                              AS BIGINT)), 0) AS BIGINT) AS inertia
FROM c2 LEFT JOIN a2 a ON a.cid = c2.cid
GROUP BY c2.cid, c2.n, c2.cx, c2.cy
""",
    tags=("featureeng", "iterative"),
)
def feat_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-MEANS, TWO UNROLLED LLOYD ITERATIONS — the canonical
    distributed clustering step as pure DataFrame algebra: assign
    each point to its nearest of k=3 FIXED init centroids (exact
    integer squared distances; ties break to the lowest cluster id),
    recompute centroids as exact-integer-sum ratios, reassign, and
    recompute once more. Points are (p_size*200, retail cents -
    90000) so both axes share scale as exact ints. Every assignment
    is a broadcast join of the 3-row centroid relation against the
    point stream + one arg-min — NO collect, no driver loop over
    points; at 100 TB each iteration costs one broadcast pass + one
    k-row hash-agg (this is exactly how MLlib's k-means schedules).
    Empty clusters keep their previous centroid (COALESCE lane).
    Inertia quantizes each point's final squared distance to the
    nearest integer BEFORE the cluster sum, so no double
    accumulation-order drift. Deterministic end-to-end: fixed init,
    exact first assignment, identical IEEE trees for the second."""
    pt = table(spark, sf_dir, "part")
    pts = pt.select(
        F.col("p_partkey").alias("pid"),
        (F.col("p_size").cast("bigint") * 200).alias("x"),
        (cents("p_retailprice") - 90000).alias("y"),
    )
    init = spark.createDataFrame(
        [(0, 2000.0, 2000.0), (1, 5000.0, 5000.0), (2, 8000.0, 8000.0)],
        "cid int, cx double, cy double",
    )

    def assign(points: DataFrame, cents_df: DataFrame) -> DataFrame:
        # Pivot the k=3 centroids to ONE wide row and broadcast it:
        # assignment becomes a pure projection (3 inline distances +
        # a when-chain argmin with ties to the lowest cid) — zero
        # shuffle per Lloyd iteration, fully whole-stage-codegen.
        def pick(col, k):
            return F.max(F.when(F.col("cid") == k, F.col(col)))

        wide = cents_df.agg(
            *[pick("cx", k).alias(f"cx{k}") for k in range(3)],
            *[pick("cy", k).alias(f"cy{k}") for k in range(3)],
        )

        def dist(k):
            return (F.col("x") - F.col(f"cx{k}")) * (
                F.col("x") - F.col(f"cx{k}")
            ) + (F.col("y") - F.col(f"cy{k}")) * (F.col("y") - F.col(f"cy{k}"))

        d0, d1, d2 = dist(0), dist(1), dist(2)
        cid = (
            F.when((d0 <= d1) & (d0 <= d2), 0)
            .when(d1 <= d2, 1)
            .otherwise(2)
        )
        return points.crossJoin(F.broadcast(wide)).select(
            "pid", "x", "y", cid.cast("int").alias("cid")
        )

    def update(assigned: DataFrame, prev: DataFrame) -> DataFrame:
        m = assigned.groupBy("cid").agg(
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        return prev.select("cid", "cx", "cy").join(m, "cid", "left").select(
            "cid",
            F.coalesce(F.col("sx").cast("double") / F.col("n"), F.col("cx")).alias(
                "cx"
            ),
            F.coalesce(F.col("sy").cast("double") / F.col("n"), F.col("cy")).alias(
                "cy"
            ),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        )

    a1 = assign(pts, init)
    c1 = update(a1, init)
    a2 = assign(pts, c1.select("cid", "cx", "cy"))
    c2 = update(a2, c1)
    d_final = (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx")) + (
        F.col("y") - F.col("cy")
    ) * (F.col("y") - F.col("cy"))
    joined = c2.join(a2, "cid", "left").withColumn(
        "pt_inertia", F.round(d_final, 0).cast("bigint")
    )
    return joined.groupBy("cid", "n", "cx", "cy").agg(
        F.coalesce(F.sum("pt_inertia"), F.lit(0)).cast("bigint").alias("inertia")
    ).select(
        F.col("cid").alias("cluster_id"),
        F.col("n").alias("n_points"),
        F.round("cx", 6).alias("centroid_x"),
        F.round("cy", 6).alias("centroid_y"),
        "inertia",
    )

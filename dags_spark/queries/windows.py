"""SURVEY §2.5 — window functions.

Determinism: every ORDER BY that feeds row_number/ntile/frames
includes a unique tie-break key. rank/dense_rank/percent_rank/
cume_dist are computed over the *value* ordering alone — they are
tie-stable by definition, and keeping ties makes them genuinely
different from row_number.

Scale: all windows partition by a real key (status/user/customer), so
each is one hash shuffle + per-partition sort; no global single-
partition windows except the §2.6 rank queries that document it.
Window sums over DECIMAL keep prefix sums exact cross-engine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import cents, dec_sum, table
from ..registry import register


@register(
    "win_ranking",
    oracle="""
SELECT o_orderkey,
       ROW_NUMBER()   OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rn,
       RANK()         OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS rnk,
       DENSE_RANK()   OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS drnk,
       NTILE(4)       OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
       PERCENT_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS prnk
FROM orders
""",
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-function family over one partitioned ordering."""
    o = table(spark, sf_dir, "orders")
    w_unique = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_value = Window.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_orderkey",
        F.row_number().over(w_unique).alias("rn"),
        F.rank().over(w_value).alias("rnk"),
        F.dense_rank().over(w_value).alias("drnk"),
        F.ntile(4).over(w_unique).alias("quartile"),
        F.percent_rank().over(w_value).alias("prnk"),
    )


@register(
    "win_lag_lead",
    oracle="""
SELECT event_id,
       LAG(value)  OVER w AS prev_value,
       LEAD(value) OVER w AS next_value,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user previous/next values and inter-event gap (exact µs)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_micros("ts")
    return ev.select(
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (ep - F.lag(ep).over(w)).alias("gap_us"),
    )


@register(
    "win_running_sum",
    oracle="""
SELECT o_orderkey,
       CAST(SUM(CAST(ROUND((o_totalprice) * 100, 0) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS cum_spend
FROM orders
""",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer (exact decimal prefix sums)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        (F.sum(cents("o_totalprice")).over(w).cast("double") / F.lit(100.0))
        .alias("cum_spend"),
    )


@register(
    "win_moving_avg",
    oracle="""
SELECT o_orderkey,
       CAST(SUM(CAST(ROUND((o_totalprice) * 100, 0) AS BIGINT)) OVER w AS DOUBLE) / 100.0
         / COUNT(*) OVER w AS ma7_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average as exact-frame-sum / frame-count."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        (
            F.sum(cents("o_totalprice")).over(w).cast("double") / F.lit(100.0)
            / F.count(F.lit(1)).over(w)
        ).alias("ma7_price"),
    )


@register(
    "win_range_frame",
    oracle="""
SELECT event_id,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_1h_value
FROM events
""",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on exact epoch-µs: per-user trailing-1h value sum.
    Tie-stable by construction (equal timestamps share one frame)."""
    ev = table(spark, sf_dir, "events").withColumn("ep_us", F.unix_micros("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ep_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        F.sum(F.col("value").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_1h_value"),
    )


@register(
    "win_first_last",
    oracle="""
SELECT o_orderkey,
       FIRST_VALUE(o_orderdate) OVER w AS first_order_date,
       LAST_VALUE(o_orderdate)  OVER w AS last_order_date
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last order date per customer alongside every row
    (full-extent frame so last() is the true partition max)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        F.first("o_orderdate").over(w).alias("first_order_date"),
        F.last("o_orderdate").over(w).alias("last_order_date"),
    )


@register(
    "win_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn AS order_rank
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the reference's dedupe/top-pattern:
    row_number over the natural key's ordering, then filter."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("order_rank", F.row_number().over(w))
        .filter(F.col("order_rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "order_rank")
    )


@register(
    "win_cume_dist",
    oracle="""
SELECT s_suppkey,
       CUME_DIST() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal) AS bal_cume
FROM supplier
""",
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist of suppliers by account balance within nation."""
    s = table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal")
    return s.select("s_suppkey", F.cume_dist().over(w).alias("bal_cume"))


@register(
    "win_session_batch",
    oracle="""
WITH o AS (
  SELECT user_id, epoch_us(ts) AS eu,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pe
  FROM events
),
f AS (
  SELECT user_id, eu,
         CASE WHEN pe IS NULL OR eu - pe >= 1800000000 THEN 1 ELSE 0 END AS new_s
  FROM o
),
g AS (
  SELECT user_id, eu,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY eu
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM f
)
SELECT user_id, make_timestamp(MIN(eu)) AS session_start,
       COUNT(*) AS n_events, MAX(eu) - MIN(eu) AS span_us
FROM g GROUP BY user_id, sid
""",
)
def win_session_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via the native session_window aggregate
    (the streaming twin is stream_session; the oracle is the classic
    gaps-and-islands rewrite). One shuffle on user_id; the session
    merge happens inside the aggregate — at 100 TB this beats the
    window-function rewrite, which needs a full sort per user
    partition plus two more window passes."""
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    return agg.select(
        "user_id",
        F.col("first_ts").alias("session_start"),
        "n_events",
        (F.unix_micros("last_ts") - F.unix_micros("first_ts")).alias("span_us"),
    )


@register(
    "win_nth_value",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       nth_value(o_totalprice, 3) OVER (
         PARTITION BY o_orderstatus
         ORDER BY o_totalprice DESC, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS third_highest
FROM orders
""",
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over the full frame: every order sees its status
    group's 3rd-highest price (tie-broken on orderkey)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.nth_value("o_totalprice", 3).over(w).alias("third_highest"),
    )


@register(
    "funnel_two_step",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS first_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS first_purchase
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= v.first_view
  GROUP BY e.user_id
)
SELECT COUNT(*) AS n_viewed,
       COUNT(p.user_id) AS n_converted,
       CAST(SUM(CASE WHEN epoch_us(p.first_purchase) - epoch_us(v.first_view)
                     <= 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_1h
FROM v LEFT JOIN p ON v.user_id = p.user_id
""",
    tags=("funnel", "events"),
)
def funnel_two_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel (view -> purchase): users with a view, users
    whose first at-or-after purchase converts, and conversions within
    1 h — the event-analytics staple. Two hash-aggs + one join, all
    keyed on user_id so the shuffles share partitioning; time math in
    exact integer microseconds."""
    ev = table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    j = v.join(p, "user_id", "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_viewed"),
        F.count("first_purchase").alias("n_converted"),
        F.sum(
            F.when(
                F.unix_micros("first_purchase") - F.unix_micros("first_view")
                <= 3_600_000_000,
                1,
            ).otherwise(0)
        ).alias("n_converted_1h"),
    )


@register(
    "agg_retention_cohort",
    oracle="""
WITH firstseen AS (
  SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         date_diff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset
  FROM events e JOIN firstseen f ON e.user_id = f.user_id
)
SELECT cohort_day, day_offset, COUNT(*) AS n_active_users
FROM activity
WHERE day_offset <= 7
GROUP BY cohort_day, day_offset
""",
    tags=("retention", "events"),
)
def agg_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohorts: users grouped by first-seen day, counted on
    each subsequent active day (offset 0-7) — the DAU-retention
    triangle. first-seen agg + join + distinct + agg, every shuffle on
    user_id or the small (cohort, offset) grid; integer day math via
    datediff on date_trunc'd days, identical in both engines."""
    ev = table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(
                F.date_trunc("day", "ts").cast("date"),
                F.col("cohort_day").cast("date"),
            ).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@register(
    "win_streak_islands",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS day_no
  FROM events
),
islands AS (
  SELECT user_id, day_no,
         day_no - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_no) AS island
  FROM days
),
streaks AS (
  SELECT user_id, island, COUNT(*) AS streak_len, MIN(day_no) AS streak_start
  FROM islands GROUP BY user_id, island
)
SELECT user_id, MAX(streak_len) AS longest_streak,
       MIN(streak_start) AS first_day_no,
       COUNT(*) AS n_streaks
FROM streaks GROUP BY user_id
""",
    tags=("window", "islands"),
)
def win_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-active-day streak per
    user (the canonical day_no - row_number() island key — constant
    within each unbroken run). Distinct user-day grid, one window
    partitioned by user, two hash-aggs — every shuffle on user_id, so
    at scale the window and aggs share one exchange. Day numbers are
    integer date_diffs from a pinned epoch, identical cross-engine."""
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("day_no"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_no")
    islands = days.withColumn(
        "island", F.col("day_no") - F.row_number().over(w)
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len"), F.min("day_no").alias("streak_start")
    )
    return streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak"),
        F.min("streak_start").alias("first_day_no"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


@register(
    "win_sequence_gaps",
    oracle="""
SELECT user_id, event_id, next_id, next_id - event_id - 1 AS missing
FROM (
  SELECT user_id, event_id,
         LEAD(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS next_id
  FROM events
) WHERE next_id - event_id > 1000
""",
    tags=("window", "dq"),
)
def win_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap detection (the islands inverse, a data-quality
    staple): per-user consecutive event_id pairs whose id distance
    exceeds a threshold — lost-events audit. One window on the
    natural partition key; integer arithmetic only."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return (
        ev.select("user_id", "event_id", F.lead("event_id").over(w).alias("next_id"))
        .filter(F.col("next_id") - F.col("event_id") > 1000)
        .withColumn("missing", F.col("next_id") - F.col("event_id") - 1)
    )


@register(
    "win_ntile_deciles",
    oracle="""
SELECT c_custkey, c_mktsegment,
       NTILE(10) OVER (PARTITION BY c_mktsegment
                       ORDER BY c_acctbal DESC, c_custkey) AS decile,
       ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC), 6) AS pct_rank
FROM customer
""",
    tags=("window",),
)
def win_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth bucketing per segment: account-balance deciles
    (NTILE) plus the continuous percent_rank. NTILE's bucket cut
    depends on row order, so the ORDER BY carries the unique
    c_custkey tie-break; percent_rank is computed over the value
    ordering alone (tie-stable). One window shuffle on the segment
    key."""
    cust = table(spark, sf_dir, "customer")
    w_tied = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_val = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(10).over(w_tied).alias("decile"),
        F.round(F.percent_rank().over(w_val), 6).alias("pct_rank"),
    )


@register(
    "win_rolling_median",
    oracle="""
SELECT event_id, user_id,
       ROUND(MEDIAN(value_cents) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
       ), 6) AS med5_cents
FROM (SELECT event_id, user_id, ts,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS value_cents
      FROM events)
""",
    tags=("window", "time"),
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median of the last 5 event values per user — the
    robust-smoothing twin of win_moving_avg (medians shrug off the
    spikes an avg chases). Exact `percentile` over a 5-row frame on
    integer cents: both engines interpolate the even-count midpoint
    in double, identically, and the frame is unambiguous via the
    (ts, event_id) tie-break. One window shuffle on user_id; the
    per-frame sort cost is bounded by the constant frame width."""
    ev = table(spark, sf_dir, "events").withColumn("value_cents", cents("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.expr("percentile(value_cents, 0.5)").over(w), 6).alias(
            "med5_cents"
        ),
    )


@register(
    "attribution_last_touch",
    oracle="""
SELECT event_id AS purchase_id, user_id, touch_type, touch_id
FROM (
  SELECT event_id, user_id, event_type,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER w AS touch_type,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_id END
                    IGNORE NULLS) OVER w AS touch_id
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
) WHERE event_type = 'purchase'
""",
    tags=("window", "events", "funnel"),
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent preceding non-purchase event (type + id). The carry-forward
    is `last(..., ignorenulls)` over an UNBOUNDED..1 PRECEDING frame —
    the classic conditional fill-down — with (ts, event_id) making the
    frame deterministic. One window shuffle on user_id; the purchase
    filter happens after the window so the frame sees every touch."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    touch_id = F.when(F.col("event_type") != "purchase", F.col("event_id"))
    return (
        ev.select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "event_type",
            F.last(touch, ignorenulls=True).over(w).alias("touch_type"),
            F.last(touch_id, ignorenulls=True).over(w).alias("touch_id"),
        )
        .filter(F.col("event_type") == "purchase")
        .drop("event_type")
    )


@register(
    "win_distinct_running",
    oracle="""
SELECT event_id, user_id,
       CAST(COUNT(DISTINCT event_type) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_types_seen
FROM events
""",
    tags=("window",),
)
def win_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per user (how many event types has this
    user touched so far) — Spark windows reject COUNT(DISTINCT), so
    the engine-idiomatic rewrite is size(collect_set()) over the same
    frame: the set state is event-type-domain bounded, so the frame
    carry stays O(|domain|) per row at any scale. The oracle runs the
    native COUNT(DISTINCT) OVER, proving the rewrite exact."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).cast("long").alias(
            "n_types_seen"
        ),
    )


@register(
    "win_session_native",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id,
         -- strict >, not >=: Spark's session_window MERGES an event
         -- arriving EXACTLY gap after the previous one (verified
         -- empirically — tests/test_operators.py pins it), so only a
         -- strictly-exceeded gap starts a new session.
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
""",
)
def win_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization through Spark's NATIVE session_window
    aggregate (round 4) — the same gap-merge semantics the streaming
    path uses, here as a single groupBy: window start = first event,
    end = last event + 30min gap. One shuffle on (user, session);
    session assembly happens inside the aggregate, no self-join and
    no window-function pass. The oracle derives identical sessions
    with the classic LAG/run-sum island construction, so the native
    aggregate's merge rules are pinned against first principles
    (win_session_batch covers the manual construction on the Spark
    side; this key covers the built-in)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "ts_anomaly_exact",
    oracle="""
WITH v AS (
  SELECT user_id, event_id, ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events
),
win AS (
  SELECT user_id, event_id, ts, c,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(c) OVER w AS BIGINT) AS s,
         CAST(SUM(c * c) OVER w AS BIGINT) AS q
  FROM v
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, c AS value_cents, n AS n_baseline,
       ((n * c - s) * (n * c - s)) * (n - 1) > 9 * n * (n * q - s * s)
         AS is_anomaly
FROM win WHERE n >= 5
""",
    tags=("timeseries", "dq", "window"),
)
def ts_anomaly_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flag with the BOUNDARY DECIDED IN
    EXACT INTEGER ARITHMETIC — the trap in every naive z-score
    monitor is that |x-mean| > 3*stddev computes mean/stddev in
    doubles, and a boundary row can flip across engines, retries, or
    agg orders. Clearing denominators turns the cut into a pure
    int64 comparison:  (n*x - S)^2 * (n-1) > 9 * n * (n*Q - S^2)
    (S, Q = sum, sum-of-squares of the trailing-10 baseline frame,
    self-excluded via ROWS 9 PRECEDING..1 PRECEDING so the tested
    point can't inflate its own baseline). No sqrt, no division, no
    guard digits — the flag itself is hash-exact. One window over
    one (user_id) exchange; rows with under 5 baseline points are
    withheld (cold-start rule). Overflow envelope: cents <= 1e5, so
    the worst term (n*x-S)^2*(n-1) <= ~9e12 — int64-safe by six
    orders."""
    ev = table(spark, sf_dir, "events")
    c = cents("value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, -1)
    )
    win = ev.select(
        "user_id",
        "event_id",
        "ts",
        c.alias("c"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(c).over(w).alias("s"),
        F.sum(c * c).over(w).alias("q"),
    )
    n, s, q, x = F.col("n"), F.col("s"), F.col("q"), F.col("c")
    return win.filter(n >= 5).select(
        "user_id",
        "event_id",
        x.alias("value_cents"),
        n.alias("n_baseline"),
        (
            ((n * x - s) * (n * x - s)) * (n - 1) > 9 * n * (n * q - s * s)
        ).alias("is_anomaly"),
    )


# EWMA weights alpha=1/4 over the last 8 points, cleared to integers:
# alpha*(1-alpha)^k = 3^k / 4^(k+1); over common denominator 4^8 the
# k-th coefficient is 3^k * 4^(7-k) — exact int64 arithmetic.
_EWMA_COEF = [3**k * 4 ** (7 - k) for k in range(8)]


@register(
    "win_ewma_bounded",
    oracle=f"""
WITH v AS (
  SELECT user_id, event_id, ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events
),
lagged AS (
  SELECT user_id, event_id, c,
         {", ".join(
             f"LAG(c, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
             f" AS l{k}" for k in range(8)
         )}
  FROM v
)
SELECT user_id, event_id,
       CAST({" + ".join(
           f"COALESCE(l{k} * {c}, 0)" for k, c in enumerate(_EWMA_COEF)
       )} AS BIGINT) AS ewma_num,
       CAST({" + ".join(
           f"CASE WHEN l{k} IS NULL THEN 0 ELSE {c} END"
           for k, c in enumerate(_EWMA_COEF)
       )} AS BIGINT) AS weight_sum
FROM lagged
""",
    tags=("timeseries", "window"),
)
def win_ewma_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded exponentially-weighted moving average (alpha=1/4, last
    8 points) per user — the recency-weighted smoother behind
    engagement scores and monitoring baselines. True EWMA is a
    recurrence no window function expresses; the bounded form is a
    fixed dot product with geometric weights, and clearing
    denominators (coefficient_k = 3^k * 4^(7-k) over 4^8) turns the
    whole thing into EXACT int64 arithmetic: the emitted numerator
    and present-weight sum are integers, hash-exact, and the
    consumer's ewma = num/(weight_sum*100) is one division away.
    Truncation at 8 lags bounds the tail at (3/4)^8 ~ 10% of mass
    (normalizing by the present-weight sum removes even that bias at
    sequence starts). Plan: 8 LAGs share ONE (user_id) window sort —
    a single exchange, no self-joins."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = cents("value")
    # two-step select: F.lag("c") must reference an existing column,
    # not a lateral alias from the same projection
    lagged = (
        ev.select("user_id", "event_id", "ts", c.alias("c"))
        .select(
            "user_id",
            "event_id",
            "c",
            *[F.lag("c", k).over(w).alias(f"l{k}") for k in range(8)],
        )
    )
    num = sum(
        (
            F.coalesce(F.col(f"l{k}") * coef, F.lit(0))
            for k, coef in enumerate(_EWMA_COEF)
        ),
        F.lit(0),
    )
    wsum = sum(
        (
            F.when(F.col(f"l{k}").isNull(), 0).otherwise(coef)
            for k, coef in enumerate(_EWMA_COEF)
        ),
        F.lit(0),
    )
    return lagged.select(
        "user_id",
        "event_id",
        num.cast("bigint").alias("ewma_num"),
        wsum.cast("bigint").alias("weight_sum"),
    )


@register(
    "stats_survival_km",
    oracle="""
WITH u AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS t0,
         CAST(MAX(ts) AS DATE) AS tlast,
         CAST(MIN(CASE WHEN event_type = 'error' THEN ts END) AS DATE)
           AS terr
  FROM events GROUP BY user_id
),
subj AS (
  SELECT date_diff('day', t0, COALESCE(terr, tlast)) AS dur,
         CASE WHEN terr IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM u
),
bydur AS (
  SELECT dur,
         CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(observed) AS BIGINT) AS d
  FROM subj GROUP BY dur
),
risk AS (
  SELECT dur, d,
         CAST((SELECT COUNT(*) FROM subj)
              - COALESCE(SUM(n_total) OVER (ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_risk
  FROM bydur
),
terms AS (
  SELECT dur, d, n_risk,
         CAST(FLOOR(ROUND(LN(1.0 - CAST(d AS DOUBLE) / n_risk), 12)
                    * 1000000000) AS BIGINT) AS ln_nano
  FROM risk WHERE d > 0 AND d < n_risk
)
SELECT dur, d AS n_events, n_risk,
       CAST(SUM(ln_nano) OVER (ORDER BY dur
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS surv_lnsum_nano
FROM terms
""",
    tags=("stats", "timeseries"),
)
def stats_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival estimator for TIME-TO-FIRST-ERROR per
    user — the censoring-correct reliability/churn curve
    (agg_retention_cohort counts activity grids; KM handles subjects
    whose event hasn't happened yet: users with no error are
    censored at their last activity day, contributing risk-time
    without an event — the construction is live even though this
    fixture happens to observe every subject). S(t) = prod(1 - d/n)
    is a product of rationals — engine-exact via the house ln-sum
    rewrite: each factor's ln guard-rounded and nano-quantized to
    BIGINT, the running SUM over event times exact under any order;
    consumers exp() the final column. The terminal time where d ==
    n_risk (S hits exactly 0, ln undefined) is excluded by
    definition. Risk sets come from one duration-grid cumsum (grid
    <= max-duration rows — the global window is grid-sized); the
    only corpus-scale work is the per-user span aggregate, one
    shuffle on user_id."""
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("t0"),
        F.max("ts").cast("date").alias("tlast"),
        F.min(
            F.when(F.col("event_type") == "error", F.col("ts"))
        )
        .cast("date")
        .alias("terr"),
    )
    subj = u.select(
        F.datediff(F.coalesce("terr", "tlast"), F.col("t0")).alias("dur"),
        F.when(F.col("terr").isNotNull(), 1).otherwise(0).alias("observed"),
    )
    bydur = subj.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("observed").alias("d"),
    )
    total = subj.agg(F.count(F.lit(1)).alias("n_all"))
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        bydur.crossJoin(F.broadcast(total))
        .select(
            "dur",
            "d",
            (
                F.col("n_all")
                - F.coalesce(F.sum("n_total").over(w_prev), F.lit(0))
            ).alias("n_risk"),
        )
        .filter((F.col("d") > 0) & (F.col("d") < F.col("n_risk")))
    )
    terms = risk.select(
        "dur",
        "d",
        "n_risk",
        F.floor(
            F.round(
                F.log(1.0 - F.col("d").cast("double") / F.col("n_risk")), 12
            )
            * 1_000_000_000
        )
        .cast("bigint")
        .alias("ln_nano"),
    )
    w_run = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return terms.select(
        "dur",
        F.col("d").alias("n_events"),
        "n_risk",
        F.sum("ln_nano").over(w_run).cast("bigint").alias("surv_lnsum_nano"),
    )


@register(
    "win_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type, event_type AS next_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
tot AS (
  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_total
  FROM trans GROUP BY prev_type
)
SELECT trans.prev_type, next_type, n, row_total,
       ROUND(CAST(n AS DOUBLE) / row_total, 6) AS p
FROM trans JOIN tot ON tot.prev_type = trans.prev_type
""",
    tags=("window", "behavior"),
)
def win_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov TRANSITION MATRIX over user event
    sequences — the behavioral model behind next-action prediction,
    funnel leak diagnosis ('where do users go after an error'), and
    session simulation: one LAG over the (user_id) ordering pairs
    each event with its predecessor, a hash-agg counts the
    (prev -> next) grid (event-type-domain², tiny), and row
    normalization turns counts into transition probabilities (exact
    integer counts, one pinned division 6dp). Cross-user boundaries
    never pair (the LAG partitions by user). One window + one
    grid agg — the corpus-scale work is the single user_id
    exchange the window already needs."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = trans.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return trans.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        "row_total",
        F.round(F.col("n").cast("double") / F.col("row_total"), 6).alias("p"),
    )


@register(
    "agg_cohort_ltv",
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
),
rev AS (
  SELECT f.cohort_day,
         date_diff('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS DATE))
           AS age_days,
         CAST(SUM(CAST(ROUND(e.value * 100, 0) AS BIGINT)) AS BIGINT)
           AS day_cents
  FROM events e JOIN first_seen f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
),
sized AS (
  SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_users
  FROM first_seen GROUP BY cohort_day
)
SELECT CAST(rev.cohort_day AS TIMESTAMP) AS cohort_day,
       age_days, cohort_users,
       CAST(SUM(day_cents) OVER (PARTITION BY rev.cohort_day ORDER BY age_days
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_cents,
       ROUND(CAST(SUM(day_cents) OVER (PARTITION BY rev.cohort_day
                ORDER BY age_days
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) / cohort_users / 100.0, 6) AS ltv_per_user
FROM rev JOIN sized ON sized.cohort_day = rev.cohort_day
""",
    tags=("agg", "behavior"),
)
def agg_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LIFETIME-VALUE curves — the revenue companion of the
    retention triangle (agg_retention_cohort counts who comes back;
    this accumulates what they SPEND): users cohort by first-seen
    day, purchase revenue buckets into (cohort, age-in-days) cells
    with exact integer cents, and a per-cohort running sum over age
    yields the cumulative LTV curve, normalized per cohort user
    (one pinned division, 6dp). Plan: first-seen agg + revenue agg
    share the user_id partitioning (one exchange family), the
    cumsum window runs per cohort over <=31 age rows — grid-sized.
    The curve's final points answer 'what is a day-N user worth',
    the number acquisition spend is budgeted against."""
    ev = table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts").cast("date")).alias("cohort_day")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(
                F.date_trunc("day", "ts").cast("date"), F.col("cohort_day")
            ).alias("age_days"),
        )
        .agg(F.sum(cents("value")).alias("day_cents"))
    )
    sized = first_seen.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("age_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("day_cents").over(w)
    return rev.join(F.broadcast(sized), "cohort_day").select(
        F.col("cohort_day").cast("timestamp").alias("cohort_day"),
        "age_days",
        "cohort_users",
        cum.cast("bigint").alias("cum_cents"),
        F.round(
            cum.cast("double") / F.col("cohort_users") / 100.0, 6
        ).alias("ltv_per_user"),
    )


@register(
    "win_rfm_segmentation",
    oracle="""
WITH horizon AS (SELECT CAST(MAX(ts) AS DATE) AS hmax FROM events),
rfm AS (
  SELECT user_id,
         date_diff('day', CAST(MAX(ts) AS DATE), (SELECT hmax FROM horizon))
           AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
),
scored AS (
  SELECT user_id, recency_days, frequency, monetary_cents,
         NTILE(5) OVER (ORDER BY recency_days ASC, user_id) AS r_score,
         NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS f_score,
         NTILE(5) OVER (ORDER BY monetary_cents DESC, user_id) AS m_score
  FROM rfm
)
SELECT user_id, recency_days, frequency, monetary_cents,
       CAST(r_score AS INTEGER) AS r_score,
       CAST(f_score AS INTEGER) AS f_score,
       CAST(m_score AS INTEGER) AS m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS rfm_cell
FROM scored
""",
    tags=("window", "behavior"),
)
def win_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION — the classic customer-value grid (recency /
    frequency / monetary quintiles, '111' = best everything): one
    purchase aggregate per user computes all three dimensions
    (recency vs a 1-row horizon broadcast, exact cent sums), then
    three NTILE(5) rankings with unique tie-breaks stamp the
    quintile scores and the concatenated cell label. Round 8: each
    NTILE(5) runs on the two-phase global_ntile operator (exact
    remainder arithmetic over global_rank, bit-identical to NTILE)
    instead of a |users|-sized single-partition window — three
    parallel rankings joined back on user_id; scores 1..5 are the
    marketing-facing contract, not the raw ranks. Deterministic by
    rule 3 (user_id tie-breaks). Lint-clean with no waiver."""
    from ..operators.scale import global_ntile  # noqa: PLC0415

    all_ev = table(spark, sf_dir, "events")
    ev = all_ev.filter(F.col("event_type") == "purchase")
    # horizon = max over ALL events (matching the oracle): recency is
    # measured against the observation end, not the last purchase —
    # a horizon day with no purchases must not shift every score.
    horizon = all_ev.agg(F.max("ts").cast("date").alias("hmax"))
    rfm = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").cast("date").alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(cents("value")).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.datediff("hmax", "last_day").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    r5 = global_ntile(
        rfm.select("user_id", "recency_days"),
        [F.col("recency_days").asc(), F.col("user_id").asc()],
        5,
        out_col="r_score",
    ).select("user_id", "r_score")
    f5 = global_ntile(
        rfm.select("user_id", "frequency"),
        [F.col("frequency").desc(), F.col("user_id").asc()],
        5,
        out_col="f_score",
    ).select("user_id", "f_score")
    m5 = global_ntile(
        rfm.select("user_id", "monetary_cents"),
        [F.col("monetary_cents").desc(), F.col("user_id").asc()],
        5,
        out_col="m_score",
    ).select("user_id", "m_score")
    scored = rfm.join(r5, "user_id").join(f5, "user_id").join(m5, "user_id")
    return scored.select(
        "*",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("rfm_cell"),
    )


@register(
    "ts_cusum_changepoint",
    oracle="""
WITH v AS (
  SELECT user_id, event_id, ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events
),
stats AS (
  SELECT user_id, event_id, c,
         CAST(SUM(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS prefix,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS t,
         CAST(SUM(c) OVER (PARTITION BY user_id) AS BIGINT) AS total,
         CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
  FROM v
),
cusum AS (
  -- HUGEINT lane: n*prefix grows as n^2 per user series (prefix is
  -- itself O(n*cents)), which outgrows int64 for ~1e7-event users;
  -- 128-bit keeps the statistic exact, final CAST stays BIGINT and
  -- errors loudly if a peak ever exceeds it.
  SELECT user_id, event_id, t, n,
         CAST(n AS HUGEINT) * prefix - CAST(t AS HUGEINT) * total AS c_scaled
  FROM stats WHERE n >= 20
),
peak AS (
  SELECT user_id, event_id, t, n, c_scaled,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ABS(c_scaled) DESC, t ASC) AS rk
  FROM cusum
)
SELECT user_id, CAST(t AS BIGINT) AS change_at, n AS n_points,
       CAST(c_scaled AS BIGINT) AS cusum_scaled
FROM peak WHERE rk = 1
""",
    tags=("timeseries", "dq", "window"),
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per user — the LEVEL-SHIFT screen
    that complements the point-outlier flag (ts_anomaly_exact
    catches spikes; CUSUM catches a series whose mean moved): the
    classic statistic max_t |Σ_{i<=t}(x_i − x̄)| peaks at the shift
    location. Clearing the mean's denominator keeps it EXACT int64:
    C_t·n = n·prefix_t − t·total (prefix/total/count from windows
    sharing ONE user_id sort), so both the argmax position and the
    peak magnitude are hash-exact — no float mean, no tie ambiguity
    (equal |C| resolves to the earliest t). Users under 20 points
    are withheld (cold-start). Overflow: n·prefix is O(n²·cents) per
    user series, so the statistic runs in a 128-bit lane
    (DECIMAL(38,0) / HUGEINT — exact to ~1e7-event users even at
    cents 1e5) and only the final peak casts back to BIGINT,
    failing loudly under ANSI rather than wrapping. Emitted
    per user: the most likely change location and its scaled CUSUM
    peak — the triage list a monitoring pipeline pages on."""
    ev = table(spark, sf_dir, "events")
    c = cents("value")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wa = Window.partitionBy("user_id")
    stats = ev.select(
        "user_id",
        "event_id",
        c.alias("c"),
        F.sum(c)
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("prefix"),
        F.row_number().over(wo).cast("bigint").alias("t"),
        F.sum(c).over(wa).alias("total"),
        F.count(F.lit(1)).over(wa).alias("n"),
    ).filter(F.col("n") >= 20)
    cusum = stats.select(
        "user_id",
        "event_id",
        "t",
        "n",
        # DECIMAL(38,0) lane mirrors the oracle's HUGEINT: n*prefix is
        # O(n^2 * cents) per user series and outgrows int64 around
        # ~1e7 events/user; the final output cast back to BIGINT
        # errors loudly under ANSI rather than wrapping.
        (
            F.col("n").cast("decimal(38,0)") * F.col("prefix")
            - F.col("t").cast("decimal(38,0)") * F.col("total")
        ).alias("c_scaled"),
    )
    rk = F.row_number().over(
        Window.partitionBy("user_id").orderBy(
            F.abs("c_scaled").desc(), F.col("t").asc()
        )
    )
    return (
        cusum.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("t").alias("change_at"),
            F.col("n").alias("n_points"),
            F.col("c_scaled").cast("bigint").alias("cusum_scaled"),
        )
    )


@register(
    "ts_autocorrelation",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
),
seq AS (
  SELECT c,
         LAG(c, 1) OVER (ORDER BY day) AS l1,
         LAG(c, 2) OVER (ORDER BY day) AS l2,
         LAG(c, 3) OVER (ORDER BY day) AS l3
  FROM daily
)
SELECT k, n_pairs, ROUND(
  (n_pairs * sxy - sx * sy)
  / sqrt((n_pairs * qx - sx * sx) * (n_pairs * qy - sy * sy)), 6) AS acf
FROM (
  SELECT 1 AS k, CAST(COUNT(l1) AS DOUBLE) AS n_pairs,
         CAST(SUM(CASE WHEN l1 IS NOT NULL THEN c END) AS DOUBLE) AS sx,
         CAST(SUM(l1) AS DOUBLE) AS sy,
         CAST(SUM(CASE WHEN l1 IS NOT NULL THEN c * c END) AS DOUBLE) AS qx,
         CAST(SUM(l1 * l1) AS DOUBLE) AS qy,
         CAST(SUM(c * l1) AS DOUBLE) AS sxy
  FROM seq
  UNION ALL
  SELECT 2, CAST(COUNT(l2) AS DOUBLE),
         CAST(SUM(CASE WHEN l2 IS NOT NULL THEN c END) AS DOUBLE),
         CAST(SUM(l2) AS DOUBLE),
         CAST(SUM(CASE WHEN l2 IS NOT NULL THEN c * c END) AS DOUBLE),
         CAST(SUM(l2 * l2) AS DOUBLE),
         CAST(SUM(c * l2) AS DOUBLE)
  FROM seq
  UNION ALL
  SELECT 3, CAST(COUNT(l3) AS DOUBLE),
         CAST(SUM(CASE WHEN l3 IS NOT NULL THEN c END) AS DOUBLE),
         CAST(SUM(l3) AS DOUBLE),
         CAST(SUM(CASE WHEN l3 IS NOT NULL THEN c * c END) AS DOUBLE),
         CAST(SUM(l3 * l3) AS DOUBLE),
         CAST(SUM(c * l3) AS DOUBLE)
  FROM seq
) m
""",
    tags=("timeseries", "stats"),
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample AUTOCORRELATION of the daily revenue series at lags
    1–3 — the first diagnostic of any forecasting effort (is
    tomorrow like today? is there structure to model at all?):
    daily totals are exact BIGINT cents, each lag pairs via LAG over
    ONE day-ordered window (the day grid is calendar-sized — the
    global sort is ~31 rows), and each lag's Pearson correlation
    comes from exact integer moment sums with the single pinned
    double expression both engines share (the agg_corr pattern
    applied to lagged pairs). Pairwise-complete convention: lag-k
    loses its first k pairs, and the x-moments are restricted to
    rows where the lag EXISTS (proper pairwise sums, not padded).
    ONE wide agg carries all three lags' moments (18 columns) and a
    struct-array explode emits the report rows — one scan, one
    day-grid sort, no per-lag recompute."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(cents("value")).alias("c"))
    w = Window.orderBy("day")
    seq = daily.select(
        "c",
        F.lag("c", 1).over(w).alias("l1"),
        F.lag("c", 2).over(w).alias("l2"),
        F.lag("c", 3).over(w).alias("l3"),
    )
    # ONE wide agg computes all 18 moment columns (three lag-k
    # moment sets share the single scan + single day-grid sort), then
    # a literal struct array explodes to the 3 report rows — the
    # dq_completeness_profile pattern; a per-lag agg-union would
    # recompute the corpus rollup three times.
    aggs = []
    for k in (1, 2, 3):
        lk = F.col(f"l{k}")
        x = F.when(lk.isNotNull(), F.col("c"))
        aggs += [
            F.count(lk).cast("double").alias(f"n{k}"),
            F.sum(x).cast("double").alias(f"sx{k}"),
            F.sum(lk).cast("double").alias(f"sy{k}"),
            F.sum(x * x).cast("double").alias(f"qx{k}"),
            F.sum(lk * lk).cast("double").alias(f"qy{k}"),
            F.sum(F.col("c") * lk).cast("double").alias(f"sxy{k}"),
        ]
    wide = seq.agg(*aggs)
    rows = [
        F.struct(
            F.lit(k).alias("k"),
            F.col(f"n{k}").alias("n_pairs"),
            F.col(f"sx{k}").alias("sx"),
            F.col(f"sy{k}").alias("sy"),
            F.col(f"qx{k}").alias("qx"),
            F.col(f"qy{k}").alias("qy"),
            F.col(f"sxy{k}").alias("sxy"),
        )
        for k in (1, 2, 3)
    ]
    m = wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
    acf = (
        F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / F.sqrt(
        (F.col("n_pairs") * F.col("qx") - F.col("sx") * F.col("sx"))
        * (F.col("n_pairs") * F.col("qy") - F.col("sy") * F.col("sy"))
    )
    return m.select("k", "n_pairs", F.round(acf, 6).alias("acf"))


@register(
    "agg_weekday_seasonal_index",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(date_part('isodow', ts) AS INTEGER) AS dow,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
per_dow AS (
  SELECT dow,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(c) AS BIGINT) AS dow_cents
  FROM daily GROUP BY dow
),
overall AS (
  SELECT CAST(SUM(c) AS BIGINT) AS tot_cents,
         CAST(COUNT(*) AS BIGINT) AS tot_days
  FROM daily
)
SELECT dow, n_days, dow_cents,
       ROUND((CAST(dow_cents AS DOUBLE) / n_days)
             / (CAST(tot_cents AS DOUBLE) / tot_days), 6) AS seasonal_index
FROM per_dow CROSS JOIN overall
""",
    tags=("timeseries", "agg"),
)
def agg_weekday_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday SEASONAL INDEX — mean daily revenue per ISO weekday
    over the overall daily mean (1.0 = typical day): the
    seasonality profile that pairs with ts_autocorrelation (ACF
    says structure exists; the index says WHICH days carry it) and
    the divisor a seasonal-naive forecast or anomaly baseline
    normalizes by. Daily totals are exact cents; both means reduce
    to one double ratio each, pinned and rounded 6dp; the ISO dow
    convention matches fn_datetime's pin (Spark weekday()+1 ==
    DuckDB isodow). One calendar-grid agg cascade — the only
    corpus-scale pass is the daily rollup."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        (F.weekday("ts") + 1).alias("dow"),
    ).agg(F.sum(cents("value")).alias("c"))
    per_dow = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("c").alias("dow_cents")
    )
    # overall totals re-aggregate the 7-row grid, never the table
    # (the stats_chi_square margins convention)
    overall = per_dow.agg(
        F.sum("dow_cents").alias("tot_cents"),
        F.sum("n_days").alias("tot_days"),
    )
    return per_dow.crossJoin(F.broadcast(overall)).select(
        "dow",
        "n_days",
        "dow_cents",
        F.round(
            (F.col("dow_cents").cast("double") / F.col("n_days"))
            / (F.col("tot_cents").cast("double") / F.col("tot_days")),
            6,
        ).alias("seasonal_index"),
    )


@register(
    "win_session_paths",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
               OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
  FROM flagged
),
paths AS (
  SELECT user_id, sess_no,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS full_path,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM sessions GROUP BY user_id, sess_no
),
prefixed AS (
  SELECT CASE WHEN n_events > 5
              THEN array_to_string(string_split(full_path, '>')[1:5], '>')
                   || '>...'
              ELSE full_path END AS path,
         n_events
  FROM paths
)
SELECT path,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events
FROM prefixed GROUP BY path
""",
    tags=("window", "behavior"),
)
def win_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION PATH analysis — the Sankey/user-flow input (which
    journeys actually happen, at what volume): sessions form by the
    classic 30-minute-gap island construction (one user_id window —
    the same machinery win_session_batch checks), each session
    serializes its ordered event-type path (long sessions truncate
    to a 5-step prefix + '...', keeping path cardinality bounded —
    the practical fix for path explosion), and the corpus aggregates
    (path, sessions, events). Within-session ORDER is pinned in the
    plan: events collect as (ts, event_id, type) structs and
    sort_array orders them before the join — never relying on
    collect_list's undocumented ordering. Two windows share one
    user_id exchange; the path agg shuffles path strings (bounded at
    5 steps), not events."""
    ev = table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(wo).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wo))
                > 1_800_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "sess_no",
        F.sum("new_session").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = sessions.groupBy("user_id", "sess_no").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda e: e.event_type,
            ),
            ">",
        ).alias("full_path"),
        F.count(F.lit(1)).alias("n_events"),
    )
    prefixed = paths.select(
        F.when(
            F.col("n_events") > 5,
            F.concat(
                F.array_join(
                    F.slice(F.split("full_path", ">"), 1, 5), ">"
                ),
                F.lit(">..."),
            ),
        )
        .otherwise(F.col("full_path"))
        .alias("path"),
        "n_events",
    )
    return prefixed.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )


@register(
    "ts_week_over_week",
    oracle="""
WITH weekly AS (
  SELECT date_trunc('week', ts) AS week_start,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS c,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
),
lagged AS (
  SELECT week_start, c, n,
         LAG(c) OVER (ORDER BY week_start) AS prev_c
  FROM weekly
)
SELECT CAST(week_start AS TIMESTAMP) AS week_start, c AS revenue_cents, n,
       CAST(prev_c AS BIGINT) AS prev_cents,
       CASE WHEN prev_c IS NULL THEN NULL
            ELSE ROUND((CAST(c AS DOUBLE) - prev_c) / prev_c, 6)
       END AS wow_growth
FROM lagged
""",
    tags=("timeseries", "agg"),
)
def ts_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week GROWTH — the first line of every revenue
    dashboard, done hash-exactly: ISO-week purchase revenue in exact
    cents, one LAG over the week grid (calendar-sized), growth as
    one pinned division rounded 6dp with the first week NULL (no
    prior — NULL, not zero: a 0% first week would read as 'flat').
    Both engines' date_trunc('week') is ISO-Monday-aligned. The
    corpus-scale work is the weekly rollup; everything after runs on
    a handful of rows."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    weekly = ev.groupBy(
        F.date_trunc("week", "ts").alias("week_start")
    ).agg(
        F.sum(cents("value")).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.orderBy("week_start")
    lagged = weekly.withColumn("prev_c", F.lag("c").over(w))
    return lagged.select(
        F.col("week_start").cast("timestamp").alias("week_start"),
        F.col("c").alias("revenue_cents"),
        "n",
        F.col("prev_c").cast("bigint").alias("prev_cents"),
        F.when(
            F.col("prev_c").isNotNull(),
            F.round(
                (F.col("c").cast("double") - F.col("prev_c"))
                / F.col("prev_c"),
                6,
            ),
        ).alias("wow_growth"),
    )


@register(
    "funnel_ordered_3step",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_step1_view,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_step2_click,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_step3_purchase
""",
    tags=("funnel", "events"),
)
def funnel_ordered_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED three-step funnel (view -> click -> purchase, each step
    STRICTLY after the previous step's first completion): the k-step
    generalization of funnel_two_step, built as a chain of per-user
    min-aggregates — each step is one hash-agg + one user_id-keyed
    join, so all shuffles share the user_id partitioning and the
    funnel costs k passes over an already-partitioned stream, never
    a per-user sort or a cross of step events. Strict `>` ordering
    means a click at the exact first-view instant does not count
    (documented contract; `>=` is funnel_two_step's). At 100 TB each
    step's aggregate is map-side combinable and the user spine only
    shrinks — the classic funnel shape that stays linear."""
    ev = table(spark, sf_dir, "events")

    def first_after(etype: str, prev, prev_col: str, out: str):
        base = ev.filter(F.col("event_type") == etype)
        if prev is None:
            return base.groupBy("user_id").agg(F.min("ts").alias(out))
        return (
            base.join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_col))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out))
        )

    v = first_after("view", None, "", "t1")
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c, "t2", "t3")
    n1 = v.agg(F.count(F.lit(1)).alias("n_step1_view"))
    n2 = c.agg(F.count(F.lit(1)).alias("n_step2_click"))
    n3 = p.agg(F.count(F.lit(1)).alias("n_step3_purchase"))
    return n1.crossJoin(F.broadcast(n2)).crossJoin(F.broadcast(n3))


@register(
    "win_time_weighted_avg",
    oracle="""
WITH s AS (
  SELECT user_id, event_id, ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
iv AS (
  SELECT user_id, cents, epoch_us(nxt) - epoch_us(ts) AS gap_us
  FROM s WHERE nxt IS NOT NULL
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT) * gap_us) AS DOUBLE)
             / CAST(SUM(gap_us) AS DOUBLE) / 100.0, 6) AS twa_value
FROM iv GROUP BY user_id HAVING SUM(gap_us) > 0
""",
    tags=("timeseries", "window"),
)
def win_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED average value per user (TWAP): each event's value
    holds until the user's next event, weighted by the exact
    microsecond duration — the correct average for irregularly
    sampled series (a plain AVG over-weights bursts; TWAP is what
    pricing, billing, and sensor pipelines mean by 'average level').
    Arithmetic is exact to the end: integer cents x integer
    microseconds accumulate in a 128-bit lane (DECIMAL(38,0) /
    HUGEINT — cents*gap_us peaks ~1e18 per interval, sums beyond
    int64 for long-lived users), one double division at the very
    end, rounded 6dp. Users whose gaps are all zero-width are
    withheld (HAVING, both engines). ONE user_id window + one
    user_id hash-agg — shuffle shared, no driver work."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        cents("value").alias("cents"),
        F.unix_micros("ts").alias("us"),
        F.unix_micros(F.lead("ts").over(w)).alias("nxt_us"),
    ).filter(F.col("nxt_us").isNotNull())
    iv = s.select(
        "user_id",
        "cents",
        (F.col("nxt_us") - F.col("us")).alias("gap_us"),
    )
    return (
        iv.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(F.col("cents").cast("decimal(38,0)") * F.col("gap_us")).alias("wsum"),
            F.sum("gap_us").alias("gsum"),
        )
        .filter(F.col("gsum") > 0)
        .select(
            "user_id",
            "n_intervals",
            F.round(
                F.col("wsum").cast("double") / F.col("gsum").cast("double") / 100.0, 6
            ).alias("twa_value"),
        )
    )


@register(
    "win_drawdown_max",
    oracle="""
WITH eq AS (
  SELECT user_id, event_id,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS equity,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS t
  FROM events
),
dd AS (
  SELECT user_id, event_id, t, equity,
         CAST(MAX(equity) OVER (PARTITION BY user_id ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) - equity AS drawdown
  FROM eq
),
pk AS (
  SELECT user_id, t, drawdown,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY drawdown DESC, t ASC) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
  FROM dd
)
SELECT user_id, CAST(drawdown AS BIGINT) AS max_drawdown_cents,
       t AS trough_at, n AS n_points
FROM pk WHERE rk = 1 AND n >= 20
""",
    tags=("timeseries", "window"),
)
def win_drawdown_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMUM DRAWDOWN per user series — the risk metric for any
    cumulative curve (P&L, token budget burn-down, error budget):
    equity = running cents sum, drawdown_t = running-max(equity) -
    equity_t, answer = the peak drawdown and WHERE it troughed
    (earliest t on ties). All three windows share ONE user_id sort —
    Catalyst plans a single exchange + sort and evaluates the
    running sum, running max, and row number in the same window
    stage, which is the whole trick: a metric that reads like three
    passes costs one. Exact integer cents end-to-end (running sums
    are order-pinned by (ts, event_id)); short series (<20 points)
    withheld as cold-start, same contract as ts_cusum_changepoint."""
    ev = table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    eq = ev.select(
        "user_id",
        F.sum(cents("value")).over(run).alias("equity"),
        F.row_number().over(wo).cast("bigint").alias("t"),
    )
    wt = Window.partitionBy("user_id").orderBy("t")
    dd = eq.select(
        "user_id",
        "t",
        (
            F.max("equity").over(
                wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col("equity")
        ).alias("drawdown"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
    )
    rk = F.row_number().over(
        Window.partitionBy("user_id").orderBy(
            F.col("drawdown").desc(), F.col("t").asc()
        )
    )
    return (
        dd.withColumn("rk", rk)
        .filter((F.col("rk") == 1) & (F.col("n") >= 20))
        .select(
            "user_id",
            F.col("drawdown").cast("bigint").alias("max_drawdown_cents"),
            F.col("t").alias("trough_at"),
            F.col("n").alias("n_points"),
        )
    )


@register(
    "agg_bounce_rate_daily",
    oracle="""
WITH s AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id))
              > 1800000000 OR LAG(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
sess AS (
  -- event_id in the cumsum ORDER BY: with tied ts within a user the
  -- session numbering must pin the same total order both engines use.
  SELECT user_id, ts,
         CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS session_no
  FROM s
),
per AS (
  SELECT user_id, session_no,
         MIN(date_trunc('day', ts)) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM sess GROUP BY user_id, session_no
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS bounce_rate
FROM per GROUP BY day
""",
    tags=("events", "window"),
)
def agg_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAILY BOUNCE RATE — the product-analytics KPI built on the
    session machinery (win_session_batch's 30-min-gap sessionize):
    a bounce is a single-event session; the rate rolls up per the
    session's START day (MIN ts date — a session spanning midnight
    counts once, where it began). The lag/cumsum sessionization and
    the per-session rollup share ONE user_id exchange; the daily
    rollup is a second small shuffle on the day key. Ratio computed
    from exact integer counts, rounded 6dp. The KPI every
    engagement dashboard refreshes hourly at any scale — and the
    shape (window -> two hash-aggs) is exactly what survives it."""
    ev = table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_us = F.unix_micros(F.lag("ts").over(wo))
    is_start = F.when(
        lag_us.isNull() | (F.unix_micros("ts") - lag_us > 1_800_000_000), 1
    ).otherwise(0)
    sess = ev.select(
        "user_id",
        "ts",
        F.sum(is_start)
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("session_no"),
    )
    per = sess.groupBy("user_id", "session_no").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("day"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounce = F.when(F.col("n_events") == 1, 1).otherwise(0)
    return per.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(bounce).alias("n_bounces"),
        F.round(
            F.sum(bounce).cast("double") / F.count(F.lit(1)), 6
        ).alias("bounce_rate"),
    )


@register(
    "win_calendar_mtd_ytd",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(month(o_orderdate) AS BIGINT) AS mo,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS day_cents,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1, 2, 3
)
SELECT day, n_orders, day_cents,
       CAST(SUM(day_cents) OVER (PARTITION BY yr, mo ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS mtd_cents,
       CAST(SUM(day_cents) OVER (PARTITION BY yr ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS ytd_cents
FROM daily
""",
    tags=("timeseries", "window"),
)
def win_calendar_mtd_ytd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MONTH-TO-DATE / YEAR-TO-DATE running revenue — the BI staple
    that turns a daily rollup into dashboard lines: one corpus-scale
    hash-agg to the DAY grain (map-side combinable — the only pass
    that sees the data), then two running windows OVER THE CALENDAR
    GRID (~hundreds of rows at any SF: grid work, not corpus work —
    the ts_week_over_week argument). Exact integer cents; the MTD
    and YTD windows differ only in partition key so they share the
    grid's single exchange. At 100 TB the day-grain pre-aggregate is
    the load-bearing move: running windows directly over raw orders
    would sort the corpus; over the grid they sort a year of days."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
    ).agg(
        F.sum(cents("o_totalprice")).alias("day_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return daily.select(
        "day",
        "n_orders",
        "day_cents",
        F.sum("day_cents")
        .over(Window.partitionBy("yr", "mo").orderBy("day").rowsBetween(
            Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("mtd_cents"),
        F.sum("day_cents")
        .over(Window.partitionBy("yr").orderBy("day").rowsBetween(
            Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("ytd_cents"),
    )


@register(
    "win_range_interval_frame",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS day_cents
  FROM orders GROUP BY 1
)
SELECT day, day_cents,
       CAST(SUM(day_cents) OVER (ORDER BY day
            RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
         AS BIGINT) AS trailing_7d_cents,
       CAST(COUNT(*) OVER (ORDER BY day
            RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
         AS BIGINT) AS days_present_7d
FROM daily
""",
    tags=("timeseries", "window"),
)
def win_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-INTERVAL window frame (RANGE BETWEEN INTERVAL ... DAYS
    PRECEDING): the trailing-7-calendar-day revenue sum over the day
    grid — the frame that a ROWS window gets WRONG whenever days are
    missing (ROWS 6 PRECEDING spans 7 rows; RANGE INTERVAL spans 7
    calendar days regardless of gaps, and days_present_7d exposes
    exactly where they differ). Spark's rangeBetween over a
    timestamp ordering requires the interval literal path (window
    frame bounds as a calendar interval) — API surface the numeric
    win_range_frame key cannot cover. Corpus work is the one
    day-grain hash-agg; the interval window runs on the calendar
    grid (ts_week_over_week argument). Exact integer cents."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum(cents("o_totalprice")).alias("day_cents")
    )
    daily.createOrReplaceTempView("dags_daily_rev")
    # the INTERVAL frame bound is SQL-only surface (DataFrame
    # rangeBetween takes numeric offsets); same text both engines.
    return spark.sql(
        """
        SELECT day, day_cents,
               CAST(SUM(day_cents) OVER (ORDER BY day
                    RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS trailing_7d_cents,
               COUNT(*) OVER (ORDER BY day
                    RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
                 AS days_present_7d
        FROM dags_daily_rev
        """
    )


@register(
    "win_ignore_nulls_fill",
    oracle="""
WITH base AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_type = 'purchase'
              THEN CAST(ROUND(value * 100, 0) AS BIGINT) END AS purch_cents
  FROM events
)
SELECT user_id, event_id,
       purch_cents,
       LAST_VALUE(purch_cents IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_cents
FROM base
""",
    tags=("window",),
)
def win_ignore_nulls_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window semantics — forward-fill as ONE window
    expression: every event carries the user's most recent purchase
    amount (NULL until their first purchase). This is the idiomatic
    Spark spelling of LOCF (`last_value(x) IGNORE NULLS` over a
    running frame) — ts_gapfill_locf builds the same semantic for a
    resampled grid with a two-step max_by construction; this key
    pins the native modifier itself, which DataFrame code reaches
    via `F.last(col, ignorenulls=True)`. One user-keyed window sort;
    the fill never leaves the partition, so at 100 TB the cost is
    the sessionize exchange, nothing more."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purch = F.when(
        F.col("event_type") == "purchase", cents("value")
    ).alias("purch_cents")
    return (
        ev.select("user_id", "event_id", "ts", purch)
        .withColumn(
            "last_purchase_cents",
            F.last("purch_cents", ignorenulls=True).over(w),
        )
        .drop("ts")
    )


@register(
    "win_percent_of_total",
    oracle="""
WITH c AS (
  SELECT o_orderkey, o_custkey,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE o_custkey % 50 = 0
)
SELECT o_orderkey, o_custkey, cents,
       ROUND(CAST(cents AS DOUBLE)
             / SUM(cents) OVER (PARTITION BY o_custkey), 6)
         AS pct_of_customer,
       ROUND(CAST(cents AS DOUBLE) / SUM(cents) OVER (), 6)
         AS pct_of_cohort
FROM c
""",
    tags=("window",),
)
def win_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT-OF-TOTAL at two grains in one pass: each order's share
    of its customer's spend (partitioned window total) AND of the
    whole cohort (unpartitioned window total) — the contribution
    ratio every revenue breakdown and mix-shift report needs.
    Numerators and denominators are exact integer cents; one double
    division per ratio, 6dp. The per-customer window shuffles once
    on the key; the cohort total is (round 8) a 1-row scalar
    aggregate BROADCAST-CROSSED into the stream —
    subquery_scalar_agg's shape, which the linter proves bounded —
    instead of an unpartitioned window that would funnel every row
    through one task. Same values, same hash, strictly better plan
    at any scale."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    c = o.select("o_orderkey", "o_custkey", cents("o_totalprice").alias("cents"))
    wc = Window.partitionBy("o_custkey")
    tot = c.agg(F.sum("cents").alias("cohort_cents"))
    return c.crossJoin(F.broadcast(tot)).select(
        "o_orderkey",
        "o_custkey",
        "cents",
        F.round(
            F.col("cents").cast("double") / F.sum("cents").over(wc), 6
        ).alias("pct_of_customer"),
        F.round(
            F.col("cents").cast("double") / F.col("cohort_cents"), 6
        ).alias("pct_of_cohort"),
    )


@register(
    "ts_seasonal_decompose",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS day_cents
  FROM orders GROUP BY 1
),
tr AS (
  SELECT day, day_cents,
         CAST(date_part('isodow', day) AS INTEGER) AS dow,
         CASE WHEN COUNT(*) OVER w = 7
              THEN CAST(SUM(day_cents) OVER w AS BIGINT) END AS trend_cents7
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT *, 7 * day_cents - trend_cents7 AS det_x7 FROM tr
),
seas AS (
  SELECT dow,
         CAST(SUM(det_x7) AS BIGINT) AS sum_det_x7,
         CAST(COUNT(det_x7) AS BIGINT) AS n_det
  FROM det WHERE det_x7 IS NOT NULL GROUP BY dow
)
SELECT d.day, d.day_cents, d.dow,
       ROUND(CAST(d.trend_cents7 AS DOUBLE) / 700.0, 6) AS trend,
       ROUND(CAST(s.sum_det_x7 AS DOUBLE) / (700.0 * s.n_det), 6) AS seasonal,
       ROUND(CAST(d.det_x7 AS DOUBLE) / 700.0
             - CAST(s.sum_det_x7 AS DOUBLE) / (700.0 * s.n_det), 6)
         AS residual
FROM det d JOIN seas s USING (dow)
""",
    tags=("timeseries", "window"),
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADDITIVE SEASONAL DECOMPOSITION (STL-lite) of the daily
    revenue series: trend = centered 7-day moving average (NULL
    unless the window is FULL — a half window at the series edges
    would fabricate trend), seasonal = per-ISO-dow mean of the
    detrended series, residual = value - trend - seasonal. The
    forecasting / anomaly-baseline decomposition, built entirely
    from exact integers: the detrended series is kept as
    7*cents - sum7_cents (exact BIGINT — no float accumulates
    across rows, the order-free quantization rule), and every
    /700.0 division happens once per OUTPUT cell, so both engines
    emit bit-identical doubles. Corpus work is one day-grain
    hash-agg; the decomposition runs on the tiny calendar grid
    (one window sort + one 7-row dow agg + a broadcast-sized join)
    — at 100 TB this is the ts_week_over_week grid argument:
    day-grain first, then calendar math on the grid, in dollars
    units (cents/100: the /700.0 = /7 days /100 cents)."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum(cents("o_totalprice")).alias("day_cents")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "day_cents",
        (F.weekday("day") + 1).cast("int").alias("dow"),
        F.when(
            F.count(F.lit(1)).over(w) == 7, F.sum("day_cents").over(w)
        ).alias("trend_cents7"),
    )
    det = tr.withColumn(
        "det_x7", 7 * F.col("day_cents") - F.col("trend_cents7")
    )
    seas = (
        det.filter(F.col("det_x7").isNotNull())
        .groupBy("dow")
        .agg(
            F.sum("det_x7").alias("sum_det_x7"),
            F.count("det_x7").alias("n_det"),
        )
    )
    seasonal = F.col("sum_det_x7").cast("double") / (700.0 * F.col("n_det"))
    return det.join(F.broadcast(seas), "dow").select(
        "day",
        "day_cents",
        "dow",
        F.round(F.col("trend_cents7").cast("double") / 700.0, 6).alias("trend"),
        F.round(seasonal, 6).alias("seasonal"),
        F.round(
            F.col("det_x7").cast("double") / 700.0 - seasonal, 6
        ).alias("residual"),
    )


@register(
    "win_attribution_last_touch",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
tagged AS (
  SELECT *,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_type
  FROM ev
)
SELECT COALESCE(touch_type, '<organic>') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(cents) AS BIGINT) AS attributed_cents
FROM tagged WHERE event_type = 'purchase'
GROUP BY COALESCE(touch_type, '<organic>')
""",
    tags=("events", "window"),
)
def win_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH REVENUE ATTRIBUTION — the marketing-analytics
    staple: each purchase credits the user's most recent PRECEDING
    non-purchase event type (the 'touch'); purchases with no prior
    touch fall to '<organic>'. One expression does it: LAST_VALUE
    IGNORE NULLS over a frame ending at 1 PRECEDING — the frame
    bound is the attribution rule (CURRENT ROW would let a purchase
    attribute to itself), and the CASE-to-NULL turns other
    purchases transparent so back-to-back purchases attribute
    through to the real touch. Revenue stays exact integer cents.
    One user-keyed window sort, then a channel-sized hash-agg — at
    100 TB the cost is the sessionize exchange, nothing more."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", cents("value").alias("cents")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("touch_type", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("touch_type", F.lit("<organic>")).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("attributed_cents"),
        )
    )


@register(
    "funnel_time_to_convert",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS first_purchase
  FROM events GROUP BY user_id
),
conv AS (
  SELECT user_id, first_purchase - first_view AS latency_us
  FROM firsts
  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
    AND first_purchase >= first_view
),
bucketed AS (
  SELECT LEAST(CAST(latency_us // 86400000000 AS BIGINT), 13) AS day_bucket,
         latency_us
  FROM conv
),
ranked AS (
  SELECT latency_us,
         ROW_NUMBER() OVER (ORDER BY latency_us) AS rn,
         COUNT(*) OVER () AS n
  FROM conv
),
pct AS (
  SELECT CAST(MIN(CASE WHEN rn >= CAST(CEIL(0.5 * n) AS BIGINT)
                       THEN latency_us END) AS BIGINT) AS p50_us_global,
         CAST(MIN(CASE WHEN rn >= CAST(CEIL(0.9 * n) AS BIGINT)
                       THEN latency_us END) AS BIGINT) AS p90_us_global
  FROM ranked
)
SELECT day_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(latency_us) AS BIGINT) AS min_us,
       CAST(MAX(latency_us) AS BIGINT) AS max_us,
       (SELECT p50_us_global FROM pct) AS p50_us_global,
       (SELECT p90_us_global FROM pct) AS p90_us_global
FROM bucketed GROUP BY day_bucket
""",
    tags=("events", "funnel"),
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-CONVERT distribution — the funnel's latency half:
    per user, first view -> first purchase latency (converters only,
    purchase at-or-after view), reported as a capped per-day
    histogram with exact-microsecond min/max per bucket plus global
    DISCRETE p50/p90 stated as the explicit type-1 order statistic
    (smallest value with rank >= ceil(p*n) — actual data values,
    exact integers, no approx function, no interpolated float; the
    ns fixture timestamps are compared at us on both engines). Two conditional
    MIN's in ONE hash-agg pass per user — no window, no self-join
    (the two-pass 'first event of each type' anti-pattern); the
    histogram and the 1-row percentiles are grid-sized follow-ups.
    At 100 TB: one user-keyed exchange; the order statistic (round 8)
    runs on the two-pass global_rank over the converter relation —
    converter-count rows grow with the user base, so the former
    single-partition rank window was this key's one scale hole —
    and everything after is broadcast-scale."""
    from ..operators.scale import global_rank  # noqa: PLC0415

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("us"))).alias(
            "first_purchase"
        ),
    )
    conv = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        "user_id",
        (F.col("first_purchase") - F.col("first_view")).alias("latency_us"),
    )
    # explicit type-1 discrete percentile (the agg_percentile_disc
    # definition: smallest value with rank >= ceil(p*n)) — engines'
    # built-in disc quantiles disagree on fine print, and approx
    # functions are banned from hash keys. The rank is two-pass
    # (user_id tie-break pins the total order; equal latencies get
    # contiguous ranks either way, so the order statistic's VALUE is
    # tie-break-independent) and n is a broadcast 1-row count.
    ncnt = conv.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = global_rank(
        conv,
        [F.col("latency_us").asc(), F.col("user_id").asc()],
        rank_col="rn",
    ).crossJoin(F.broadcast(ncnt))
    pct = ranked.agg(
        F.min(
            F.when(
                F.col("rn") >= F.ceil(0.5 * F.col("n")).cast("bigint"),
                F.col("latency_us"),
            )
        ).cast("bigint").alias("p50_us_global"),
        F.min(
            F.when(
                F.col("rn") >= F.ceil(0.9 * F.col("n")).cast("bigint"),
                F.col("latency_us"),
            )
        ).cast("bigint").alias("p90_us_global"),
    )
    bucketed = conv.select(
        F.least(
            (F.col("latency_us") / F.lit(86400000000)).cast("bigint"), F.lit(13)
        ).alias("day_bucket"),
        "latency_us",
    )
    return (
        bucketed.groupBy("day_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("latency_us").alias("min_us"),
            F.max("latency_us").alias("max_us"),
        )
        .crossJoin(F.broadcast(pct))
    )


@register(
    "agg_cohort_ltv_curve",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
),
cohorts AS (
  SELECT user_id,
         CAST(year(first_ts) * 12 + month(first_ts) AS BIGINT) AS cohort_m,
         date_trunc('month', first_ts) AS cohort_month
  FROM firsts
),
sizes AS (
  SELECT cohort_m, cohort_month, CAST(COUNT(*) AS BIGINT) AS cohort_users
  FROM cohorts GROUP BY cohort_m, cohort_month
),
purch AS (
  SELECT c.cohort_m,
         CAST(year(e.ts) * 12 + month(e.ts) AS BIGINT) - c.cohort_m
           AS month_index,
         CAST(ROUND(e.value * 100, 0) AS BIGINT) AS cents
  FROM events e JOIN cohorts c USING (user_id)
  WHERE e.event_type = 'purchase'
),
cell AS (
  SELECT cohort_m, month_index,
         CAST(SUM(cents) AS BIGINT) AS rev_cents
  FROM purch GROUP BY cohort_m, month_index
),
curve AS (
  SELECT cohort_m, month_index, rev_cents,
         CAST(SUM(rev_cents) OVER (PARTITION BY cohort_m ORDER BY month_index
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cents
  FROM cell
)
SELECT s.cohort_month, cv.month_index, cv.rev_cents, cv.cum_cents,
       s.cohort_users,
       ROUND(CAST(cv.cum_cents AS DOUBLE) / 100.0 / s.cohort_users, 6)
         AS ltv_per_user
FROM curve cv JOIN sizes s USING (cohort_m)
""",
    tags=("events", "window"),
)
def agg_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT LTV CURVE — the growth-analytics staple: users cohort
    by FIRST-EVENT month, purchase revenue lands in integer
    months-since-signup cells (month arithmetic as year*12+month —
    exact integers, no date interval fine print), each cohort's
    running cumulative revenue divides by its FIXED cohort size for
    LTV-per-user at every age. Composition: one user-keyed first-
    event agg, one broadcast-sized cohort join back to purchases,
    a (cohort, age)-cell hash-agg, and a cumsum window over the
    tiny cohort-age grid. The corpus shuffles twice (user agg, cell
    agg) — both map-side combinable; the window runs on dozens of
    rows. Exact cents everywhere; the single division is one
    output-cell op."""
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    cohorts = firsts.select(
        "user_id",
        (F.year("first_ts") * 12 + F.month("first_ts"))
        .cast("bigint")
        .alias("cohort_m"),
        F.date_trunc("month", "first_ts").alias("cohort_month"),
    )
    sizes = cohorts.groupBy("cohort_m", "cohort_month").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .join(cohorts.select("user_id", "cohort_m"), "user_id")
        .select(
            "cohort_m",
            (
                (F.year("ts") * 12 + F.month("ts")).cast("bigint")
                - F.col("cohort_m")
            ).alias("month_index"),
            cents("value").alias("cents"),
        )
    )
    cell = purch.groupBy("cohort_m", "month_index").agg(
        F.sum("cents").alias("rev_cents")
    )
    wc = (
        Window.partitionBy("cohort_m")
        .orderBy("month_index")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = cell.withColumn("cum_cents", F.sum("rev_cents").over(wc))
    return curve.join(F.broadcast(sizes), "cohort_m").select(
        "cohort_month",
        "month_index",
        "rev_cents",
        "cum_cents",
        "cohort_users",
        F.round(
            F.col("cum_cents").cast("double") / 100.0 / F.col("cohort_users"), 6
        ).alias("ltv_per_user"),
    )


# ---------------------------------------------------------------------------
# Round-6 wave 4: CEP-style sequence patterns + spectral period detection.


@register(
    "cep_pattern_match",
    oracle="""
WITH o AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS eu,
         substr(event_type, 1, 1) AS sym,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS pe
  FROM events
),
f AS (
  SELECT *, CASE WHEN pe IS NULL OR eu - pe >= 21600000000
                 THEN 1 ELSE 0 END AS new_s
  FROM o
),
g AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY eu, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS sid
  FROM f
),
s AS (
  SELECT user_id, make_timestamp(MIN(eu)) AS session_start,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         string_agg(sym, '' ORDER BY eu, event_id) AS seq
  FROM g GROUP BY user_id, sid
)
SELECT user_id, session_start, n_events, seq,
       regexp_matches(seq, 'v.*c.*p') AS matched,
       CAST(length(seq) - length(replace(seq, 'p', '')) AS BIGINT)
         AS n_purchases
FROM s
WHERE regexp_matches(seq, 'v.*c.*p') OR n_events >= 8
""",
)
def cep_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPLEX EVENT PROCESSING pattern match — the MATCH_RECOGNIZE /
    Flink-CEP shape (SQL:2016 row-pattern recognition, which Spark
    lacks as syntax) rebuilt Spark-first: sessionize with the NATIVE
    session_window aggregate, lay each session's events out as an
    ordered symbol string via LISTAGG ... WITHIN GROUP (one character
    per event — deterministic under any shuffle order), then run the
    pattern as a regex over the string ('v.*c.*p' = view, later a
    click, later a purchase, anything between). This is the classic
    scalable CEP rewrite: the automaton runs per-session on a bounded
    string instead of per-event with cross-row state, so the whole
    operator is ONE shuffle (the session agg) plus scan-local regex —
    at 100 TB the pattern matcher costs the same as the
    sessionization everyone already pays for. The oracle re-derives
    sessions with the gaps-and-islands rewrite and DuckDB's ordered
    string_agg + regexp_matches. Output keeps matched sessions plus
    all long sessions (>= 8 events) so the hash pins negatives too."""
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_cep_events")
    return spark.sql(
        """
        WITH s AS (
          SELECT user_id, MIN(ts) AS session_start,
                 COUNT(*) AS n_events,
                 listagg(substr(event_type, 1, 1), '')
                   WITHIN GROUP (ORDER BY ts, event_id) AS seq
          FROM _cep_events
          GROUP BY session_window(ts, '6 hours'), user_id
        )
        SELECT user_id, session_start, n_events, seq,
               seq RLIKE 'v.*c.*p' AS matched,
               CAST(length(seq) - length(replace(seq, 'p', '')) AS BIGINT)
                 AS n_purchases
        FROM s
        WHERE seq RLIKE 'v.*c.*p' OR n_events >= 8
        """
    )


@register(
    "ts_periodogram_dominant",
    oracle="""
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01',
                   CAST(date_trunc('day', o_orderdate) AS DATE)) AS t,
         CAST(ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    / 1000.0, 0) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
periods AS (SELECT unnest(generate_series(2, 14)) AS p),
terms AS (
  SELECT p.p,
         CAST(ROUND(d.x * cos(2 * pi() * d.t / p.p), 0) AS BIGINT) AS tc,
         CAST(ROUND(d.x * sin(2 * pi() * d.t / p.p), 0) AS BIGINT) AS ts
  FROM daily d, periods p
),
spec AS (
  SELECT p, CAST(SUM(tc) AS BIGINT) AS c_u, CAST(SUM(ts) AS BIGINT) AS s_u
  FROM terms GROUP BY p
)
SELECT p, c_u, s_u,
       CAST(c_u * c_u + s_u * s_u AS BIGINT) AS power_u,
       CAST(ROW_NUMBER() OVER (ORDER BY c_u * c_u + s_u * s_u DESC, p)
            AS BIGINT) AS power_rank
FROM spec
""",
)
def ts_periodogram_dominant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERIODOGRAM over the daily-revenue series — the DFT power
    |sum_t x_t e^(-2pi*i*t/p)|^2 evaluated at candidate periods
    p = 2..14 days, the spectral way to FIND seasonality rather than
    assume it (ts_seasonal_decompose takes the period as given; this
    key is how you'd discover the weekly cycle in the first place —
    power_rank 1 at p=7 on retail-shaped data). Determinism recipe:
    the series is exact daily cents scaled to integer thousandths,
    each cos/sin term is quantized to an integer BEFORE the sum
    (order-free; the <=2-ulp libm spread on cos cannot move a round
    boundary at this magnitude), and power is integer c^2+s^2 with
    headroom proved: |c_u| <= 2400 days * 1e6 -> power < 2^63.

    Scale: the day-grain agg is the only real shuffle (map-side
    partials); the 13-period fan-out multiplies a series that is
    already days-sized (~10^4 rows for 30 years), so the spectral
    stage is broadcast-scale regardless of corpus size. Computing K
    candidate periods in ONE pass over the aggregated series is the
    point — never K scans of the fact table."""
    daily = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.date_trunc("day", "o_orderdate").cast("date"),
                F.lit("1992-01-01").cast("date"),
            ).alias("t")
        )
        .agg(
            F.round(F.sum(cents("o_totalprice")) / 1000.0, 0)
            .cast("bigint")
            .alias("x")
        )
    )
    periods = spark.range(2, 15).select(F.col("id").alias("p"))
    two_pi = 2.0 * 3.141592653589793
    ang = F.lit(two_pi) * F.col("t") / F.col("p")
    terms = daily.crossJoin(F.broadcast(periods)).select(
        "p",
        F.round(F.col("x") * F.cos(ang), 0).cast("bigint").alias("tc"),
        F.round(F.col("x") * F.sin(ang), 0).cast("bigint").alias("ts"),
    )
    spec = terms.groupBy("p").agg(
        F.sum("tc").alias("c_u"), F.sum("ts").alias("s_u")
    )
    power = F.col("c_u") * F.col("c_u") + F.col("s_u") * F.col("s_u")
    return spec.select(
        "p",
        "c_u",
        "s_u",
        power.cast("bigint").alias("power_u"),
        F.row_number()
        .over(Window.orderBy(power.desc(), "p"))
        .cast("bigint")
        .alias("power_rank"),
    )


# NDCG@10 discount table, pinned as integers: round(1e6 / log2(pos+1))
# for pos 1..10. Integer weights keep every DCG term in exact BIGINT
# arithmetic — no engine ever evaluates a log, so the sum is
# order-free and bit-identical cross-engine by construction.
_NDCG_DISC_Q = [
    1000000, 630930, 500000, 430677, 386853,
    356207, 333333, 315465, 301030, 289065,
]
_NDCG_DISC_SQL = (
    "CASE pos "
    + " ".join(f"WHEN {p + 1} THEN {d}" for p, d in enumerate(_NDCG_DISC_Q))
    + " END"
)


@register(
    "rank_ndcg_at_k",
    oracle=f"""
WITH rel AS (
  SELECT l_orderkey AS okey, CAST(COUNT(*) AS BIGINT) AS rel
  FROM lineitem GROUP BY l_orderkey
),
ranked AS (
  SELECT o.o_custkey, r.rel,
         ROW_NUMBER() OVER (PARTITION BY o.o_custkey
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS pos,
         ROW_NUMBER() OVER (PARTITION BY o.o_custkey
                            ORDER BY r.rel DESC, o.o_orderkey) AS ideal_pos
  FROM orders o JOIN rel r ON o.o_orderkey = r.okey
),
dcg AS (
  SELECT o_custkey,
         SUM(CASE WHEN pos <= 10
                  THEN ((1::BIGINT << rel) - 1) * ({_NDCG_DISC_SQL})
                  ELSE 0 END) AS dcg_q,
         SUM(CASE WHEN ideal_pos <= 10
                  THEN ((1::BIGINT << rel) - 1) *
                       (CASE ideal_pos {" ".join(f"WHEN {p + 1} THEN {d}" for p, d in enumerate(_NDCG_DISC_Q))} END)
                  ELSE 0 END) AS idcg_q
  FROM ranked GROUP BY o_custkey
)
SELECT o_custkey AS user_key, CAST(dcg_q AS BIGINT) AS dcg_q,
       CAST(idcg_q AS BIGINT) AS idcg_q,
       ROUND(CAST(dcg_q AS DOUBLE) / idcg_q, 6) AS ndcg10
FROM dcg
""",
)
def rank_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 — THE graded ranking-quality metric for search /
    retrieval / recsys eval, over a deterministic surrogate task:
    the 'system ranking' of each customer's orders is by totalprice
    (tie: orderkey), the graded relevance is the order's lineitem
    count, and the ideal ranking re-sorts by relevance. Gain is the
    standard (2^rel - 1); the position discount 1/log2(pos+1) is
    pinned as a 6-digit integer weight table so every DCG term is
    exact BIGINT arithmetic (gain is a bit-shift, the weight a
    literal): the per-user sum is order-free, and NDCG = dcg/idcg is
    the only float op, rounded at 6dp. Scale: two row_number windows
    sharing one hash partition by user, then one partial+final agg —
    the per-user state is top-10-sized, so 100 TB of rankings shard
    cleanly by user key."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    rel = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.count(F.lit(1)).alias("rel")
    )
    j = o.join(rel, o.o_orderkey == rel.okey)
    w_sys = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_ideal = Window.partitionBy("o_custkey").orderBy(
        F.col("rel").desc(), F.col("o_orderkey")
    )
    gain = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(rel AS INT))") - 1

    def disc(pos_col):
        c = F.lit(0).cast("bigint")
        for p, d in enumerate(_NDCG_DISC_Q):
            c = F.when(pos_col == p + 1, F.lit(d).cast("bigint")).otherwise(c)
        return c

    ranked = j.select(
        "o_custkey",
        F.row_number().over(w_sys).alias("pos"),
        F.row_number().over(w_ideal).alias("ideal_pos"),
        gain.alias("gain"),
    )
    agg = ranked.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.col("pos") <= 10, F.col("gain") * disc(F.col("pos"))).otherwise(
                F.lit(0)
            )
        ).alias("dcg_q"),
        F.sum(
            F.when(
                F.col("ideal_pos") <= 10, F.col("gain") * disc(F.col("ideal_pos"))
            ).otherwise(F.lit(0))
        ).alias("idcg_q"),
    )
    return agg.select(
        F.col("o_custkey").alias("user_key"),
        F.col("dcg_q").cast("bigint").alias("dcg_q"),
        F.col("idcg_q").cast("bigint").alias("idcg_q"),
        F.round(F.col("dcg_q").cast("double") / F.col("idcg_q"), 6).alias("ndcg10"),
    )


@register(
    "rank_map_mrr",
    oracle="""
WITH ranked AS (
  SELECT o_custkey,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS rel,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS pos
  FROM orders
),
scored AS (
  SELECT o_custkey, rel, pos,
         SUM(rel) OVER (PARTITION BY o_custkey ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_rel
  FROM ranked
)
SELECT o_custkey AS user_key,
       CAST(SUM(rel) AS BIGINT) AS n_rel,
       ROUND(CAST(SUM(CASE WHEN rel = 1
                           THEN (cum_rel * 1000000000) // pos
                           ELSE 0 END) AS DOUBLE)
             / (1000000000.0 * SUM(rel)), 6) AS ap,
       ROUND(CAST(1000000000 // MIN(CASE WHEN rel = 1 THEN pos END)
                  AS DOUBLE) / 1000000000.0, 6) AS rr
FROM scored
GROUP BY o_custkey
HAVING SUM(rel) > 0
""",
)
def rank_map_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average Precision + Reciprocal Rank per user — the binary-
    relevance twins of NDCG (their corpus means are MAP and MRR).
    Surrogate task: ranking by totalprice, an order is 'relevant'
    iff finalized (status F). Every precision@pos term is quantized
    to an exact BIGINT via integer floor-division (cum_rel*1e9 DIV
    pos) before summing, so the aggregate is order-free and the only
    float ops are the two final divisions, rounded 6dp identically
    on both engines. Users with zero relevant rows are excluded (AP
    is undefined there) by the same HAVING on both sides. Scale: one
    window + one agg sharded by user key, constant state per row."""
    o = table(spark, sf_dir, "orders")
    w_pos = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    ranked = o.select(
        "o_custkey",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("rel"),
        F.row_number().over(w_pos).alias("pos"),
    )
    w_cum = (
        Window.partitionBy("o_custkey")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = ranked.withColumn("cum_rel", F.sum("rel").over(w_cum))
    agg = (
        scored.groupBy("o_custkey")
        .agg(
            F.sum("rel").cast("bigint").alias("n_rel"),
            F.sum(
                F.when(
                    F.col("rel") == 1,
                    F.expr("CAST(cum_rel AS BIGINT) * 1000000000 DIV pos"),
                ).otherwise(F.lit(0))
            ).alias("ap_q"),
            F.min(F.when(F.col("rel") == 1, F.col("pos"))).alias("first_pos"),
        )
        .filter(F.col("n_rel") > 0)
    )
    return agg.select(
        F.col("o_custkey").alias("user_key"),
        "n_rel",
        F.round(
            F.col("ap_q").cast("double") / (1000000000.0 * F.col("n_rel")), 6
        ).alias("ap"),
        F.round(
            F.expr("CAST(1000000000 DIV first_pos AS DOUBLE)") / 1000000000.0, 6
        ).alias("rr"),
    )


@register(
    "ts_holt_linear",
    oracle="""
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
           AS rev
  FROM orders GROUP BY 1
),
-- MATERIALIZED: without it the recursive step re-evaluates the
-- windowed series every iteration (O(n^2) scans, ~27 s at sf0.1)
y AS MATERIALIZED (
  SELECT day, rev,
         CAST(ROW_NUMBER() OVER (ORDER BY day) AS INTEGER) AS t
  FROM daily
),
h AS (
  SELECT CAST(2 AS INTEGER) AS t, y2.rev AS level, y2.rev - y1.rev AS trend
  FROM y y1 JOIN y y2 ON y1.t = 1 AND y2.t = 2
  UNION ALL
  SELECT CAST(h.t + 1 AS INTEGER),
         0.5 * y.rev + 0.5 * (h.level + h.trend),
         0.5 * ((0.5 * y.rev + 0.5 * (h.level + h.trend)) - h.level)
           + 0.5 * h.trend
  FROM h JOIN y ON y.t = h.t + 1
)
SELECT y.day, h.t,
       ROUND(h.level, 6) AS level,
       ROUND(h.trend, 6) AS trend,
       ROUND(h.level + h.trend, 6) AS forecast_next
FROM h JOIN y ON y.t = h.t
""",
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT'S LINEAR-TREND exponential smoothing over the daily
    revenue series — the classic two-state forecaster (level +
    trend) that EWMA alone can't express. The recurrence is
    inherently sequential, so each engine runs it as the sequential
    primitive it actually has: the oracle as a RECURSIVE CTE, Spark
    as one `aggregate` (fold) higher-order function over the sorted
    day array — both evaluate the identical IEEE expression chain
    (alpha = beta = 0.5, dyadic so every smoothing step is an exact
    halving) in the identical pinned order, making the states
    bit-identical without any quantization. Scale: the distributed
    part (daily aggregation of the fact table) shuffles once; the
    fold runs over the model-sized aggregated series (bounded by
    the calendar, ~2.4k days, independent of fact-table size) in one
    task — the 'reduce to a model, iterate on the model' shape."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        dec_sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("day")
    y = daily.select(
        F.row_number().over(w).cast("int").alias("t"), "day", "rev"
    )
    arr = y.agg(
        F.sort_array(F.collect_list(F.struct("t", "day", "rev"))).alias("ys")
    )
    out_t = (
        "array<struct<t:int,day:timestamp,level:double,trend:double>>"
    )
    acc_t = f"struct<n:int,y1:double,level:double,trend:double,out:{out_t}>"
    init = F.expr(
        f"CAST(struct(0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),"
        f" CAST(0.0 AS DOUBLE), array()) AS {acc_t})"
    )

    def step(acc, e):
        new_l = 0.5 * e.rev + 0.5 * (acc.level + acc.trend)
        new_b = 0.5 * (new_l - acc.level) + 0.5 * acc.trend
        lvl2 = e.rev
        trd2 = e.rev - acc.y1
        return (
            F.when(
                acc.n == 0,
                F.struct(
                    F.lit(1).alias("n"),
                    e.rev.alias("y1"),
                    F.lit(0.0).alias("level"),
                    F.lit(0.0).alias("trend"),
                    acc.out.alias("out"),
                ),
            )
            .when(
                acc.n == 1,
                F.struct(
                    F.lit(2).alias("n"),
                    acc.y1.alias("y1"),
                    lvl2.alias("level"),
                    trd2.alias("trend"),
                    F.concat(
                        acc.out,
                        F.array(
                            F.struct(
                                e.t.alias("t"),
                                e.day.alias("day"),
                                lvl2.alias("level"),
                                trd2.alias("trend"),
                            )
                        ),
                    ).alias("out"),
                ),
            )
            .otherwise(
                F.struct(
                    (acc.n + 1).alias("n"),
                    acc.y1.alias("y1"),
                    new_l.alias("level"),
                    new_b.alias("trend"),
                    F.concat(
                        acc.out,
                        F.array(
                            F.struct(
                                e.t.alias("t"),
                                e.day.alias("day"),
                                new_l.alias("level"),
                                new_b.alias("trend"),
                            )
                        ),
                    ).alias("out"),
                )
            )
        )

    folded = arr.select(
        F.aggregate(F.col("ys"), init, step, lambda a: a.out).alias("out")
    )
    ex = folded.select(F.explode("out").alias("e"))
    return ex.select(
        F.col("e.day").alias("day"),
        F.col("e.t").alias("t"),
        F.round("e.level", 6).alias("level"),
        F.round("e.trend", 6).alias("trend"),
        F.round(F.col("e.level") + F.col("e.trend"), 6).alias("forecast_next"),
    )


@register(
    "agg_churn_monthly",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT o_custkey, date_trunc('month', o_orderdate) AS m
  FROM orders
),
act AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS n_active FROM pairs GROUP BY m),
firsts AS (SELECT o_custkey, MIN(m) AS fm FROM pairs GROUP BY o_custkey),
news AS (SELECT fm AS m, CAST(COUNT(*) AS BIGINT) AS n_new FROM firsts GROUP BY fm),
ret AS (
  SELECT p.m,
         CAST(SUM(CASE WHEN q.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_retained
  FROM pairs p
  LEFT JOIN pairs q
    ON q.o_custkey = p.o_custkey AND q.m = p.m - INTERVAL 1 MONTH
  GROUP BY p.m
),
chn AS (
  SELECT p.m + INTERVAL 1 MONTH AS m,
         CAST(SUM(CASE WHEN q.o_custkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_churned
  FROM pairs p
  LEFT JOIN pairs q
    ON q.o_custkey = p.o_custkey AND q.m = p.m + INTERVAL 1 MONTH
  GROUP BY p.m + INTERVAL 1 MONTH
)
SELECT a.m AS month_start, a.n_active,
       COALESCE(n.n_new, 0) AS n_new,
       r.n_retained,
       COALESCE(c.n_churned, 0) AS n_churned
FROM act a
LEFT JOIN news n ON a.m = n.m
LEFT JOIN ret r ON a.m = r.m
LEFT JOIN chn c ON a.m = c.m
""",
)
def agg_churn_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MONTHLY CHURN ACCOUNTING — the four ledger numbers every
    subscription/engagement dashboard runs on: actives, new (first
    month ever), retained (also active the prior month), churned
    (active the prior month, gone this month — attributed to the
    month they left). Presence is a distinct (customer, month) pair;
    retention/churn are month-shifted self-equi-joins on that pair
    set (customer + month key, so co-partitioned — one shuffle
    each), never a window over the whole history. Calendar months
    with orders only; all counts exact BIGINTs."""
    o = table(spark, sf_dir, "orders")
    pairs = o.select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("m")
    ).distinct()
    act = pairs.groupBy("m").agg(F.count(F.lit(1)).alias("n_active"))
    news = (
        pairs.groupBy("o_custkey")
        .agg(F.min("m").alias("fm"))
        .groupBy(F.col("fm").alias("m"))
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    q = pairs.select(
        F.col("o_custkey").alias("q_cust"), F.col("m").alias("q_m")
    )
    ret = (
        pairs.join(
            q,
            (F.col("q_cust") == F.col("o_custkey"))
            & (F.col("q_m") == F.col("m") - F.expr("INTERVAL 1 MONTH")),
            "left",
        )
        .groupBy("m")
        .agg(
            F.sum(F.when(F.col("q_cust").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_retained")
        )
    )
    chn = (
        pairs.join(
            q,
            (F.col("q_cust") == F.col("o_custkey"))
            & (F.col("q_m") == F.col("m") + F.expr("INTERVAL 1 MONTH")),
            "left",
        )
        .groupBy((F.col("m") + F.expr("INTERVAL 1 MONTH")).alias("m"))
        .agg(
            F.sum(F.when(F.col("q_cust").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_churned")
        )
    )
    return (
        act.join(news, "m", "left")
        .join(ret, "m", "left")
        .join(chn, "m", "left")
        .select(
            F.col("m").alias("month_start"),
            "n_active",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            "n_retained",
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
    )


@register(
    "win_fifo_allocation",
    oracle="""
WITH pool AS (
  SELECT o_custkey,
         (SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) * 8) // 10
           AS pool_c
  FROM orders GROUP BY o_custkey
),
inv AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS amt_c,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cum_before_c
  FROM orders
)
SELECT i.o_orderkey, i.o_custkey, i.o_orderdate,
       CAST(i.amt_c AS DOUBLE) / 100.0 AS invoice_amt,
       CAST(LEAST(GREATEST(p.pool_c - i.cum_before_c, 0), i.amt_c) AS BIGINT)
         AS alloc_c,
       CASE
         WHEN p.pool_c - i.cum_before_c >= i.amt_c THEN 'paid'
         WHEN p.pool_c - i.cum_before_c > 0 THEN 'partial'
         ELSE 'unpaid'
       END AS status
FROM inv i JOIN pool p ON i.o_custkey = p.o_custkey
""",
)
def win_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO PAYMENT ALLOCATION — the receivables-ledger operator:
    apply each customer's payment pool (here 80% of lifetime
    invoiced, floor-divided in cents) against their invoices in
    strict date order, marking each invoice paid / partial / unpaid
    with the exact allocated amount. The classic formulation is a
    sequential scan; the closed form used here —
    alloc = clamp(pool - cumsum_before, 0, amount) — turns it into
    ONE window cumsum + a broadcast of the per-customer pool, fully
    parallel across customers and exact in BIGINT cents (no
    iteration, no state). Ordering pinned by (date, orderkey)."""
    o = table(spark, sf_dir, "orders")
    pool = o.groupBy("o_custkey").agg(
        F.expr(
            "(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) * 8) DIV 10"
        ).alias("pool_c")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    inv = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        cents("o_totalprice").alias("amt_c"),
    ).withColumn(
        "cum_before_c", F.sum("amt_c").over(w) - F.col("amt_c")
    )
    remaining = F.col("pool_c") - F.col("cum_before_c")
    return inv.join(pool, "o_custkey").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (F.col("amt_c").cast("double") / 100.0).alias("invoice_amt"),
        F.least(F.greatest(remaining, F.lit(0)), F.col("amt_c"))
        .cast("bigint")
        .alias("alloc_c"),
        F.when(remaining >= F.col("amt_c"), "paid")
        .when(remaining > 0, "partial")
        .otherwise("unpaid")
        .alias("status"),
    )


@register(
    "win_interval_coalesce",
    oracle="""
WITH iv AS (
  SELECT l_suppkey AS k,
         date_trunc('day', l_shipdate) AS s,
         date_trunc('day', l_shipdate)
           + CAST(l_quantity AS INTEGER) * INTERVAL 1 DAY AS e,
         l_orderkey, l_linenumber
  FROM lineitem
),
marked AS (
  SELECT k, s, e,
         CASE WHEN s > MAX(e) OVER (
                PARTITION BY k ORDER BY s, e, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT k, s, e,
         SUM(new_island) OVER (
           PARTITION BY k ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
)
SELECT k, CAST(island AS BIGINT) AS island,
       MIN(s) AS span_start, MAX(e) AS span_end,
       CAST(COUNT(*) AS BIGINT) AS n_intervals
FROM islands GROUP BY k, island
""",
)
def win_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL COALESCING — merge overlapping/touching time spans
    per key into maximal covered spans (the continuous-time sibling
    of win_streak_islands' integer gaps-and-islands): each lineitem
    occupies [shipdate, shipdate + quantity days), and a supplier's
    overlapping occupations merge. The classic single-pass sweep is
    a running MAX(end) window — an interval starts a new island iff
    its start exceeds every previous end — then a cumsum of starts
    numbers the islands; both engines run the identical
    timestamp-ordered windows (order pinned by (s, e, orderkey,
    linenumber)). One shuffle by key + per-key sort; no self-join,
    no explode-per-day."""
    li = table(spark, sf_dir, "lineitem")
    iv = li.select(
        F.col("l_suppkey").alias("k"),
        F.date_trunc("day", "l_shipdate").alias("s"),
        (
            F.date_trunc("day", "l_shipdate")
            + F.col("l_quantity").cast("int") * F.expr("INTERVAL 1 DAY")
        ).alias("e"),
        "l_orderkey",
        "l_linenumber",
    )
    w_prev = (
        Window.partitionBy("k")
        .orderBy("s", "e", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.select(
        "k",
        "s",
        "e",
        F.when(F.col("s") > F.max("e").over(w_prev), 1).otherwise(0).alias(
            "new_island"
        ),
    )
    w_cum = (
        Window.partitionBy("k")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = marked.withColumn("island", F.sum("new_island").over(w_cum))
    return islands.groupBy("k", F.col("island").cast("bigint").alias("island")).agg(
        F.min("s").alias("span_start"),
        F.max("e").alias("span_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
    )


@register(
    "win_rolling_regression",
    oracle="""
WITH daily AS (
  SELECT c.c_mktsegment AS seg,
         date_trunc('day', o.o_orderdate) AS day,
         CAST(date_diff('day', TIMESTAMP '1995-01-01',
                        date_trunc('day', o.o_orderdate)) AS BIGINT) AS x,
         SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY seg, day
),
w AS (
  SELECT seg, day,
         COUNT(*) OVER win AS n,
         SUM(x) OVER win AS sx, SUM(y) OVER win AS sy,
         SUM(x * y) OVER win AS sxy, SUM(x * x) OVER win AS sxx,
         SUM(y * y) OVER win AS syy,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY day) AS rn
  FROM daily
  WINDOW win AS (PARTITION BY seg ORDER BY day
                 ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
)
SELECT seg, day,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / 100.0, 6)
         AS slope_per_day,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) *
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
              (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS r2
FROM w WHERE rn >= 28
""",
)
def win_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING OLS — the trailing-28-day regression slope (revenue
    trend in currency/day) and R^2 per segment, the quant-analytics
    window EWMA can't replace (EWMA smooths level; this fits a
    LINE). All five regression moments are BIGINT window sums over
    exact cents and integer day indices — order-free and exact —
    and the closed-form slope/R^2 expressions run per output row
    with division order mirrored verbatim. One agg shuffle to
    segment-days, one window sort per segment; emitted only from
    row 28 on (full windows, so every engine sees the same n)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.date_trunc("day", "o_orderdate").alias("day"),
        )
        .agg(F.sum(cents("o_totalprice")).alias("y"))
        .withColumn(
            "x",
            F.datediff(
                F.col("day"), F.lit("1995-01-01").cast("timestamp")
            ).cast("bigint"),
        )
    )
    win = (
        Window.partitionBy("seg").orderBy("day").rowsBetween(-27, Window.currentRow)
    )
    w_rn = Window.partitionBy("seg").orderBy("day")
    w = daily.select(
        "seg",
        "day",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("x").over(win).alias("sx"),
        F.sum("y").over(win).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(win).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(win).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(win).alias("syy"),
        F.row_number().over(w_rn).alias("rn"),
    ).filter(F.col("rn") >= 28)
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    cov = n_d * F.col("sxy") - sx_d * F.col("sy")
    varx = n_d * F.col("sxx") - sx_d * F.col("sx")
    vary = n_d * F.col("syy") - sy_d * F.col("sy")
    return w.select(
        "seg",
        "day",
        F.round(cov / varx / 100.0, 6).alias("slope_per_day"),
        F.round(cov * cov / (varx * vary), 6).alias("r2"),
    )


@register(
    "dq_calendar_gaps",
    oracle="""
WITH daily AS (
  SELECT c.c_mktsegment AS seg, date_trunc('day', o.o_orderdate) AS day
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY seg, day
),
bounds AS (
  SELECT seg, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY seg
),
calendar AS (
  SELECT b.seg, unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS day
  FROM bounds b
)
SELECT c.seg, c.day AS missing_day,
       CAST(date_part('isodow', c.day) AS BIGINT) AS iso_dow
FROM calendar c
LEFT JOIN daily d ON d.seg = c.seg AND d.day = c.day
WHERE d.day IS NULL
""",
)
def dq_calendar_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALENDAR-GAP DETECTION — which days inside a segment's active
    range have NO orders at all (the freshness/completeness question
    'did the feed skip a day?' that row counts can't answer). The
    expected calendar is generated per segment from its own min/max
    via `sequence` (never a hand-maintained dims table) and
    anti-joined against observed days; the ISO weekday of each gap
    ships with it (weekend gaps are expected, weekday gaps are
    incidents). Observed days are one agg; the calendar explode is
    bounds-sized (segments x days — calendar-bounded, independent
    of fact rows); the anti-join shuffles on (seg, day)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.date_trunc("day", "o_orderdate").alias("day"),
        )
        .agg(F.lit(1).alias("one"))
        .select("seg", "day")
    )
    bounds = daily.groupBy("seg").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    calendar = bounds.select(
        "seg",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    return calendar.join(daily, ["seg", "day"], "left_anti").select(
        "seg",
        F.col("day").alias("missing_day"),
        (F.weekday("missing_day") + 1).cast("bigint").alias("iso_dow"),
    )


@register(
    "win_skyline_pareto",
    oracle="""
WITH pts AS (
  SELECT o_orderkey, o_orderpriority AS pri,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_c,
         date_trunc('day', o_orderdate) AS day
  FROM orders
),
scored AS (
  SELECT *,
         MIN(day) OVER (PARTITION BY pri ORDER BY price_c
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_day_cheaper,
         MIN(day) OVER (PARTITION BY pri, price_c) AS best_day_same_price
  FROM pts
)
SELECT o_orderkey, pri,
       CAST(price_c AS DOUBLE) / 100.0 AS price, day
FROM scored
WHERE (best_day_cheaper IS NULL OR day < best_day_cheaper)
  AND day = best_day_same_price
""",
)
def win_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (PARETO FRONTIER) — the multi-objective 'best
    trade-offs' query: per priority class, the orders not DOMINATED
    on (price, date) — no other order is both cheaper-or-equal and
    earlier-or-equal with one strict. The classic O(n log n) sweep
    becomes two windows: a RANGE frame keyed on price exposes the
    best date among all STRICTLY cheaper points (value-range frames,
    not row frames — ties on price must not see each other), and a
    per-(pri, price) min settles equal-price ties. A point survives
    iff it beats every cheaper point's date and is its own price
    level's earliest. One shuffle per priority class; no self-join,
    no quadratic dominance test."""
    o = table(spark, sf_dir, "orders")
    pts = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("pri"),
        cents("o_totalprice").alias("price_c"),
        F.date_trunc("day", "o_orderdate").alias("day"),
    )
    w_cheaper = (
        Window.partitionBy("pri")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("pri", "price_c")
    scored = pts.select(
        "o_orderkey",
        "pri",
        "price_c",
        "day",
        F.min("day").over(w_cheaper).alias("best_day_cheaper"),
        F.min("day").over(w_same).alias("best_day_same_price"),
    )
    return scored.filter(
        (
            F.col("best_day_cheaper").isNull()
            | (F.col("day") < F.col("best_day_cheaper"))
        )
        & (F.col("day") == F.col("best_day_same_price"))
    ).select(
        "o_orderkey",
        "pri",
        (F.col("price_c").cast("double") / 100.0).alias("price"),
        "day",
    )


@register(
    "agg_revenue_new_vs_returning",
    oracle="""
WITH firsts AS (
  SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS fm
  FROM orders GROUP BY o_custkey
)
SELECT date_trunc('month', o.o_orderdate) AS month_start,
       CAST(SUM(CASE WHEN date_trunc('month', o.o_orderdate) = f.fm
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_new_orders,
       CAST(SUM(CASE WHEN date_trunc('month', o.o_orderdate) <> f.fm
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_returning_orders,
       CAST(SUM(CASE WHEN date_trunc('month', o.o_orderdate) = f.fm
                THEN CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)
                ELSE 0 END) AS DOUBLE) / 100.0 AS new_revenue,
       CAST(SUM(CASE WHEN date_trunc('month', o.o_orderdate) <> f.fm
                THEN CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)
                ELSE 0 END) AS DOUBLE) / 100.0 AS returning_revenue
FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
GROUP BY month_start
""",
)
def agg_revenue_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW vs RETURNING revenue split per month — the growth-
    accounting twin of agg_churn_monthly: how much of each month's
    revenue comes from customers in their FIRST month versus repeat
    business (the ratio every acquisition-vs-retention debate runs
    on). First-month assignment is one per-customer MIN agg joined
    back on the customer key (co-partitioned with the fact scan's
    own grouping); all four measures are conditional exact-cents
    sums in ONE partial+final hash agg — no second fact pass."""
    o = table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("fm")
    )
    j = o.join(firsts, "o_custkey").withColumn(
        "m", F.date_trunc("month", "o_orderdate")
    )
    is_new = F.col("m") == F.col("fm")
    return j.groupBy(F.col("m").alias("month_start")).agg(
        F.sum(F.when(is_new, 1).otherwise(0)).cast("bigint").alias("n_new_orders"),
        F.sum(F.when(~is_new, 1).otherwise(0))
        .cast("bigint")
        .alias("n_returning_orders"),
        (
            F.sum(F.when(is_new, cents("o_totalprice")).otherwise(0)).cast("double")
            / 100.0
        ).alias("new_revenue"),
        (
            F.sum(F.when(~is_new, cents("o_totalprice")).otherwise(0)).cast(
                "double"
            )
            / 100.0
        ).alias("returning_revenue"),
    )


@register(
    "win_bollinger_breakout",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY day
),
lanes AS (
  -- 128-bit ss lane (HUGEINT / Spark DECIMAL(38,0)): daily rev_c is
  -- ~1e9 cents at sf0.1 already, so the 7-day sum of BIGINT squares
  -- brushes the int64 edge (7 * (1e9)^2 ~ 7e18 of 9.2e18) and
  -- overflows one decade later; the wide lane keeps the exact-sigma
  -- contract to ~1e14-cent days. Identical doubles after the cast.
  SELECT day, rev_c,
         CAST(SUM(rev_c) OVER w AS BIGINT) AS s_c,
         SUM(CAST(rev_c AS HUGEINT) * rev_c) OVER w AS ss_c,
         COUNT(*) OVER w AS n_w
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
),
bands AS (
  SELECT day, rev_c, n_w,
         CAST(s_c AS DOUBLE) / CAST(n_w AS DOUBLE) AS mean_c,
         SQRT((CAST(ss_c AS DOUBLE)
               - CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE) / CAST(n_w AS DOUBLE))
              / CAST(n_w - 1 AS DOUBLE)) AS sd_c
  FROM lanes WHERE n_w = 7
)
SELECT day,
       CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
       ROUND((mean_c - 2.0 * sd_c) / 100.0, 4) AS lower_band,
       ROUND((mean_c + 2.0 * sd_c) / 100.0, 4) AS upper_band,
       CAST(rev_c AS DOUBLE) > mean_c + 2.0 * sd_c
         OR CAST(rev_c AS DOUBLE) < mean_c - 2.0 * sd_c AS is_breakout
FROM bands
""",
)
def win_bollinger_breakout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOLLINGER BAND BREAKOUTS on daily revenue — the rolling
    mean +/- 2-sigma envelope that flags days whose revenue moved
    beyond recent volatility (the time-series twin of the static
    MAD outlier key: the threshold ADAPTS to the local regime). The
    trap in every distributed rolling-sigma is STDDEV over a frame
    of doubles — a shuffle-order-dependent sum. Here the daily
    revenue is an exact cents BIGINT, the frame keeps exact SUM and
    SUM-OF-SQUARES integer lanes, and sigma is reconstructed in one
    closed-form double per row — bit-identical on both engines, no
    accumulation order anywhere. Frame = 7 days including today
    (emitted only when full, so every band has identical support).
    Fact scan reduces map-side into the calendar grid; the window
    runs on ~2.2k grid rows however large the scan."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(F.sum(cents("o_totalprice")).cast("bigint").alias("rev_c"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    lanes = daily.select(
        "day",
        "rev_c",
        F.sum("rev_c").over(w).cast("bigint").alias("s_c"),
        # 128-bit ss lane (DECIMAL(38,0) == oracle HUGEINT): BIGINT
        # squares overflow the 7-day frame one decade above sf0.1 —
        # see the oracle comment; the double it feeds is unchanged.
        F.sum(F.col("rev_c").cast("decimal(38,0)") * F.col("rev_c"))
        .over(w)
        .alias("ss_c"),
        F.count(F.lit(1)).over(w).alias("n_w"),
    )
    n_d = F.col("n_w").cast("double")
    s_d = F.col("s_c").cast("double")
    mean_c = s_d / n_d
    sd_c = F.sqrt(
        (F.col("ss_c").cast("double") - s_d * s_d / n_d)
        / (F.col("n_w") - 1).cast("double")
    )
    bands = lanes.filter(F.col("n_w") == 7).select(
        "day",
        (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
        F.round((mean_c - 2.0 * sd_c) / 100.0, 4).alias("lower_band"),
        F.round((mean_c + 2.0 * sd_c) / 100.0, 4).alias("upper_band"),
        (
            (F.col("rev_c").cast("double") > mean_c + 2.0 * sd_c)
            | (F.col("rev_c").cast("double") < mean_c - 2.0 * sd_c)
        ).alias("is_breakout"),
    )
    return bands


@register(
    "rank_recall_hitrate",
    oracle="""
WITH rel AS (
  SELECT l_orderkey AS okey, CAST(COUNT(*) AS BIGINT) AS rel
  FROM lineitem GROUP BY l_orderkey
),
ranked AS (
  SELECT o.o_custkey, r.rel,
         ROW_NUMBER() OVER (PARTITION BY o.o_custkey
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS pos
  FROM orders o JOIN rel r ON o.o_orderkey = r.okey
),
agg AS (
  SELECT o_custkey,
         CAST(SUM(CASE WHEN rel >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
         CAST(SUM(CASE WHEN rel >= 4 AND pos <= 10 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_rel_top10
  FROM ranked GROUP BY o_custkey
)
SELECT o_custkey AS user_key, n_rel, n_rel_top10,
       ROUND(CAST(n_rel_top10 AS DOUBLE) / CAST(n_rel AS DOUBLE), 6)
         AS recall10,
       n_rel_top10 > 0 AS hit10
FROM agg WHERE n_rel > 0
""",
)
def rank_recall_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECALL@10 + HIT-RATE@10 — the binary-relevance ranking
    metrics that complete the eval family next to NDCG@10 (graded)
    and MAP/MRR (rank-position): recall answers "what share of the
    relevant items did the top-10 surface?", hit-rate answers "did
    the user see ANY relevant item?" — the recsys KPI pair. Same
    deterministic surrogate task as rank_ndcg_at_k (system ranking
    by totalprice, relevance = lineitem count, binarized at >= 4).
    Everything is integer counting in one window + one hash-agg
    partitioned by user; the single division is the final recall.
    Users with no relevant item are withheld (recall undefined),
    not zero-filled — the honest denominator."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    rel = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.count(F.lit(1)).alias("rel")
    )
    j = o.join(rel, o.o_orderkey == rel.okey)
    w_sys = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    ranked = j.select(
        "o_custkey", "rel", F.row_number().over(w_sys).alias("pos")
    )
    is_rel = F.col("rel") >= 4
    agg = ranked.groupBy("o_custkey").agg(
        F.sum(F.when(is_rel, 1).otherwise(0)).cast("bigint").alias("n_rel"),
        F.sum(F.when(is_rel & (F.col("pos") <= 10), 1).otherwise(0))
        .cast("bigint")
        .alias("n_rel_top10"),
    )
    return agg.filter(F.col("n_rel") > 0).select(
        F.col("o_custkey").alias("user_key"),
        "n_rel",
        "n_rel_top10",
        F.round(
            F.col("n_rel_top10").cast("double") / F.col("n_rel").cast("double"),
            6,
        ).alias("recall10"),
        (F.col("n_rel_top10") > 0).alias("hit10"),
    )


@register(
    "agg_cumulative_reach",
    oracle="""
WITH firsts AS (
  SELECT event_type, user_id, MIN(date_trunc('day', ts)) AS first_day
  FROM events GROUP BY event_type, user_id
),
daily_new AS (
  SELECT event_type, first_day AS day,
         CAST(COUNT(*) AS BIGINT) AS n_new_users
  FROM firsts GROUP BY event_type, first_day
)
SELECT event_type, day, n_new_users,
       CAST(SUM(n_new_users) OVER (
         PARTITION BY event_type ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cumulative_reach
FROM daily_new
""",
)
def agg_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATIVE REACH per action type — distinct users who have
    ever performed each action, up to each day (the adoption curve
    of every feature at once),
    the growth-team headline ("total accounts touched") that naive
    SQL computes with a COUNT(DISTINCT) per day over an expanding
    window (quadratic re-scans: day N re-reads N days of events).
    The scalable identity: a user enters a type's cumulative count
    exactly ONCE, at their first day doing it — so one MIN per
    (type, user), one count per (type, day), and a running sum over
    the per-type DAY grid give the same curves with a single fact
    scan and shuffles on (type, user) then (type, day). The grid
    window is calendar x type sized at any fact scale."""
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("event_type", "user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("first_day")
    )
    daily_new = firsts.groupBy(
        "event_type", F.col("first_day").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_new_users"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily_new.select(
        "event_type",
        "day",
        "n_new_users",
        F.sum("n_new_users").over(w).cast("bigint").alias("cumulative_reach"),
    )


@register(
    "agg_stickiness_dau_wau",
    oracle="""
WITH dau AS (
  SELECT date_trunc('week', ts) AS week_start,
         date_trunc('day', ts) AS day,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM events GROUP BY week_start, day
),
wau AS (
  SELECT date_trunc('week', ts) AS week_start,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM events GROUP BY week_start
),
davg AS (
  SELECT week_start,
         CAST(SUM(dau) AS BIGINT) AS dau_sum,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM dau GROUP BY week_start
)
SELECT d.week_start, d.dau_sum, d.n_days, w.wau,
       ROUND(CAST(d.dau_sum AS DOUBLE) / CAST(d.n_days AS DOUBLE)
             / CAST(w.wau AS DOUBLE), 6) AS stickiness
FROM davg d JOIN wau w ON d.week_start = w.week_start
""",
)
def agg_stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU STICKINESS per week — the engagement ratio product
    teams live by (average daily actives over weekly actives:
    1.0 = everyone active every day, ~0.14 = weekly-only; the
    fixture's event stream spans one month, so the weekly grain is
    the informative one — at month grain swap 'week' for 'month'
    unchanged).
    Two distinct-count aggregations at different grains over ONE
    fact scan — both shuffle on (time bucket, user) first (Spark
    plans count-distinct as a two-phase expand + agg, so partial
    dedup happens map-side), then a month-grid equi-join merges the
    grains. Exact integer lanes until the final pinned division.
    At 100 TB swap the exact distinct for the HLL-sketch key's
    union algebra unchanged — the grain-merge identities hold."""
    e = table(spark, sf_dir, "events")
    dau = e.groupBy(
        F.date_trunc("week", "ts").alias("week_start"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.countDistinct("user_id").cast("bigint").alias("dau"))
    wau = e.groupBy(
        F.date_trunc("week", "ts").alias("week_start")
    ).agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    davg = dau.groupBy("week_start").agg(
        F.sum("dau").cast("bigint").alias("dau_sum"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    j = davg.join(wau, "week_start")
    return j.select(
        "week_start",
        "dau_sum",
        "n_days",
        "wau",
        F.round(
            F.col("dau_sum").cast("double")
            / F.col("n_days").cast("double")
            / F.col("wau").cast("double"),
            6,
        ).alias("stickiness"),
    )


@register(
    "fn_fiscal_445",
    oracle="""
WITH fis AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_c,
         date_diff('day', DATE '1992-02-03', CAST(o_orderdate AS DATE))
           AS d
  FROM orders
),
mapped AS (
  SELECT price_c,
         d // 364 AS fiscal_year,
         (d % 364) // 91 + 1 AS fiscal_quarter,
         CASE WHEN ((d % 364) % 91) // 7 < 4 THEN 1
              WHEN ((d % 364) % 91) // 7 < 8 THEN 2
              ELSE 3 END AS fiscal_period,
         (d % 364) // 7 + 1 AS fiscal_week
  FROM fis
)
SELECT fiscal_year, fiscal_quarter, fiscal_period,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(fiscal_week) AS BIGINT) AS first_week,
       CAST(MAX(fiscal_week) AS BIGINT) AS last_week,
       CAST(SUM(price_c) AS DOUBLE) / 100.0 AS revenue
FROM mapped
GROUP BY fiscal_year, fiscal_quarter, fiscal_period
""",
)
def fn_fiscal_445(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-4-5 FISCAL CALENDAR rollup — retail/finance reporting does
    not close books on Gregorian months: a 52-week fiscal year
    splits into four 13-week quarters of 4+4+5-week periods, so
    every period has a whole number of weeks and same-weekday
    comparability (the reason the calendar exists). The mapping is
    pure integer arithmetic on days since the fiscal epoch (a
    Monday, 1992-02-03): year = d/364, week-in-year = (d%364)/7,
    quarter = 13-week blocks, period = the 4/4/5 split of the
    13-week quarter — no calendar table to join, identical integer
    ops on both engines (floor division; the 53rd-week leap
    adjustment real calendars add is a documented simplification).
    Revenue stays in exact cents; one map-side projection + one
    hash agg."""
    o = table(spark, sf_dir, "orders")
    d = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1992-02-03").cast("date")
    ).cast("bigint")
    diy = d % 364
    wiq = (diy % 91) / F.lit(7)
    mapped = o.select(
        cents("o_totalprice").alias("price_c"),
        F.floor(d / 364).alias("fiscal_year"),
        (F.floor(diy / 91) + 1).alias("fiscal_quarter"),
        F.when(F.floor(wiq) < 4, 1)
        .when(F.floor(wiq) < 8, 2)
        .otherwise(3)
        .alias("fiscal_period"),
        (F.floor(diy / 7) + 1).alias("fiscal_week"),
    )
    return mapped.groupBy(
        "fiscal_year", "fiscal_quarter", "fiscal_period"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.min("fiscal_week").cast("bigint").alias("first_week"),
        F.max("fiscal_week").cast("bigint").alias("last_week"),
        (F.sum("price_c").cast("double") / 100.0).alias("revenue"),
    )


@register(
    "win_peak_concurrency",
    oracle="""
WITH ev AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
sess AS (
  SELECT user_id, ts,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
  FROM ev
),
intervals AS (
  SELECT user_id, MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM sess GROUP BY user_id, sess_no
),
bounds AS (
  SELECT s_start AS ts, 1 AS delta, user_id FROM intervals
  UNION ALL
  SELECT s_end AS ts, -1 AS delta, user_id FROM intervals
),
running AS (
  SELECT ts, SUM(delta) OVER (ORDER BY ts, delta, user_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
  FROM bounds
)
SELECT date_trunc('day', ts) AS day,
       CAST(MAX(live) AS BIGINT) AS peak_concurrency
FROM running GROUP BY day
""",
)
def win_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK CONCURRENCY per day — the capacity-planning number
    ("how many sessions were live AT ONCE?") that no per-bucket
    count can answer (a session spanning two buckets is live in
    both): the classic SWEEP LINE. Sessions come from the 30-minute
    gap rule (the win_session_batch construction), each emits a
    (+1 at start, -1 at end) boundary row, and the running sum over
    boundaries ordered by (ts, delta, user_id) — delta before user
    so a session ENDING at an instant frees its slot before one
    starting at the same instant takes it (end-exclusive
    convention, pinned identically in both engines) — is the live
    count; MAX per day reads the peaks. The boundary table is
    2 rows/session (~fact/5 here); round 8 the sweep RUNS on the
    two-phase global_running_sum (range-partition the boundaries,
    accumulate each span in parallel, carry the opening balance
    forward via the partition-count offset table) instead of
    arguing it would — exact concurrency with no boundary-grain
    single-partition window. Lint-clean with no waiver."""
    from ..operators.scale import global_running_sum  # noqa: PLC0415

    e = table(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w_u)
    ev = e.select(
        "user_id",
        "ts",
        F.when(
            prev.isNull()
            | (
                F.col("ts").cast("double") - prev.cast("double") > 1800.0
            ),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    sess = ev.select(
        "user_id",
        "ts",
        F.sum("is_start")
        .over(w_u.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sess_no"),
    )
    intervals = sess.groupBy("user_id", "sess_no").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    bounds = intervals.select(
        F.col("s_start").alias("ts"), F.lit(1).alias("delta"), "user_id"
    ).unionByName(
        intervals.select(
            F.col("s_end").alias("ts"), F.lit(-1).alias("delta"), "user_id"
        )
    )
    running = global_running_sum(
        bounds,
        [F.col("ts").asc(), F.col("delta").asc(), F.col("user_id").asc()],
        "delta",
        out_col="live",
    ).select("ts", "live")
    return running.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(F.max("live").cast("bigint").alias("peak_concurrency"))


@register(
    "agg_interpurchase_time",
    oracle="""
WITH gaps AS (
  SELECT c.c_mktsegment AS segment,
         date_diff('day',
           LAG(CAST(o.o_orderdate AS DATE)) OVER (
             PARTITION BY o.o_custkey
             ORDER BY o.o_orderdate, o.o_orderkey),
           CAST(o.o_orderdate AS DATE)) AS gap_days
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(AVG(CAST(gap_days AS DOUBLE)), 6) AS mean_days,
       ROUND(MEDIAN(gap_days), 6) AS median_days,
       CAST(MAX(gap_days) AS BIGINT) AS max_days
FROM gaps WHERE gap_days IS NOT NULL
GROUP BY segment
""",
)
def agg_interpurchase_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERPURCHASE TIME (IPT) distribution per segment — the
    retention metric retail forecasting runs on ("how many days
    between a customer's consecutive orders?"), the input to
    replenishment reminders and churn-risk windows (a customer at
    3x their median IPT is lapsing). One LAG per customer ordered
    by (date, orderkey) — the tiebreak pins equal-date orders to a
    total order so both engines pair the same consecutive rows —
    then exact integer day gaps aggregate per segment: mean as an
    exact integer-sum division, median as the interpolated exact
    percentile BOTH engines compute identically on integer inputs.
    Shuffles: one hash partition by customer for the window, one
    partial+final agg on segment. Dimension join broadcasts."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    gaps = j.select(
        F.col("c_mktsegment").alias("segment"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return gaps.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.round(F.avg(F.col("gap_days").cast("double")), 6).alias("mean_days"),
        F.round(F.expr("percentile(gap_days, 0.5)"), 6).alias("median_days"),
        F.max("gap_days").cast("bigint").alias("max_days"),
    )


@register(
    "agg_retention_half_life",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(date_trunc('day', ts)) AS d0 FROM events
  GROUP BY user_id
),
cohort AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM firsts),
active AS (
  SELECT date_diff('day', f.d0, date_trunc('day', e.ts)) AS k,
         CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
  FROM events e JOIN firsts f ON e.user_id = f.user_id
  GROUP BY k
),
curve AS (
  SELECT k, n_active,
         CAST(ROUND(LN(CAST(n_active AS DOUBLE) / CAST(n_users AS DOUBLE))
                    * 1000000000, 0) AS BIGINT) AS lr_q
  FROM active CROSS JOIN cohort WHERE k >= 1
),
fit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(k) AS BIGINT) AS sk,
         CAST(SUM(k * k) AS BIGINT) AS skk,
         CAST(SUM(lr_q) AS BIGINT) AS sl,
         CAST(SUM(k * lr_q) AS BIGINT) AS skl
  FROM curve
),
slope AS (
  SELECT (CAST(m AS DOUBLE) * CAST(skl AS DOUBLE)
          - CAST(sk AS DOUBLE) * CAST(sl AS DOUBLE))
         / (CAST(m AS DOUBLE) * CAST(skk AS DOUBLE)
            - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE))
         / 1000000000.0 AS b
  FROM fit
)
SELECT c.k, c.n_active,
       ROUND(CAST(c.lr_q AS DOUBLE) / 1000000000.0, 6) AS ln_rate,
       ROUND(s.b, 9) AS decay_slope,
       ROUND(-0.6931471805599453 / s.b, 4) AS half_life_days
FROM curve c CROSS JOIN slope s
""",
)
def agg_retention_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETENTION HALF-LIFE — fit ln(retention rate) ~ days-since-
    first-seen and read off t(1/2) = -ln2/slope: the single number
    growth teams quote ("engagement halves every N days") and the
    exponential-decay summary that turns a 30-point retention curve
    into a comparable scalar across products/cohorts. rate(k) =
    distinct active users at offset k over the cohort size (exact
    integer counts); each ln(rate) is quantized to a 1e-9 BIGINT
    lane (identical IEEE input on both engines), and the OLS slope
    is a closed form over five exact lane sums — the
    stats_price_elasticity discipline applied to the time axis. One
    user hash-agg + one offset hash-agg + a 30-row fit; the curve
    grid is calendar-sized at any fact scale."""
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("d0")
    )
    cohort = firsts.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    j = e.join(firsts, "user_id")
    active = j.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.col("d0")).alias("k")
    ).agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    curve = (
        active.crossJoin(F.broadcast(cohort))
        .filter(F.col("k") >= 1)
        .select(
            "k",
            "n_active",
            F.round(
                F.log(
                    F.col("n_active").cast("double")
                    / F.col("n_users").cast("double")
                )
                * 1000000000,
                0,
            )
            .cast("bigint")
            .alias("lr_q"),
        )
    )
    fit = curve.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("k").cast("bigint").alias("sk"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("skk"),
        F.sum("lr_q").cast("bigint").alias("sl"),
        F.sum(F.col("k") * F.col("lr_q")).cast("bigint").alias("skl"),
    )
    m_d = F.col("m").cast("double")
    b = (
        (m_d * F.col("skl").cast("double")
         - F.col("sk").cast("double") * F.col("sl").cast("double"))
        / (m_d * F.col("skk").cast("double")
           - F.col("sk").cast("double") * F.col("sk").cast("double"))
        / 1000000000.0
    )
    slope = fit.select(b.alias("b"))
    return curve.crossJoin(F.broadcast(slope)).select(
        "k",
        "n_active",
        F.round(F.col("lr_q").cast("double") / 1000000000.0, 6).alias(
            "ln_rate"
        ),
        F.round(F.col("b"), 9).alias("decay_slope"),
        F.round(F.lit(-0.6931471805599453) / F.col("b"), 4).alias(
            "half_life_days"
        ),
    )


@register(
    "agg_same_store_sales",
    oracle="""
WITH yearly AS (
  SELECT o_custkey AS k,
         date_part('year', o_orderdate) AS y,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY k, y
),
paired AS (
  SELECT cur.y AS year,
         CAST(COUNT(*) AS BIGINT) AS n_comparable_customers,
         CAST(SUM(cur.rev_c) AS BIGINT) AS rev_cur_c,
         CAST(SUM(prv.rev_c) AS BIGINT) AS rev_prev_c
  FROM yearly cur JOIN yearly prv
    ON cur.k = prv.k AND cur.y = prv.y + 1
  GROUP BY cur.y
)
SELECT year, n_comparable_customers,
       CAST(rev_cur_c AS DOUBLE) / 100.0 AS comparable_revenue,
       CAST(rev_prev_c AS DOUBLE) / 100.0 AS prior_year_revenue,
       ROUND(CAST(rev_cur_c AS DOUBLE) / CAST(rev_prev_c AS DOUBLE) - 1.0, 6)
         AS same_store_growth
FROM paired
""",
)
def agg_same_store_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAME-STORE (COMPARABLE) SALES growth — the retail/finance
    metric that separates ORGANIC growth from acquisition: total
    YoY revenue growth conflates "existing customers spend more"
    with "we added customers"; comparable growth restricts both
    years to customers transacting in BOTH (the retail analyst's
    'comp base'), which is the number earnings reports actually
    quote. One (customer, year) cents hash-agg, then a self
    equi-join on (customer, adjacent year) — co-partitioned on the
    customer key, so the join reuses the aggregation's own
    partitioning — and a year-grid reduce. Exact cents end to end;
    the single division is the growth rate."""
    o = table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        F.col("o_custkey").alias("k"),
        F.year("o_orderdate").alias("y"),
    ).agg(F.sum(cents("o_totalprice")).cast("bigint").alias("rev_c"))
    cur = yearly.select("k", F.col("y").alias("year"), F.col("rev_c").alias("rc"))
    prv = yearly.select("k", (F.col("y") + 1).alias("year"), F.col("rev_c").alias("rp"))
    paired = cur.join(prv, ["k", "year"]).groupBy("year").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_comparable_customers"),
        F.sum("rc").cast("bigint").alias("rev_cur_c"),
        F.sum("rp").cast("bigint").alias("rev_prev_c"),
    )
    return paired.select(
        "year",
        "n_comparable_customers",
        (F.col("rev_cur_c").cast("double") / 100.0).alias("comparable_revenue"),
        (F.col("rev_prev_c").cast("double") / 100.0).alias("prior_year_revenue"),
        F.round(
            F.col("rev_cur_c").cast("double") / F.col("rev_prev_c").cast("double")
            - 1.0,
            6,
        ).alias("same_store_growth"),
    )


@register(
    "ts_naive_forecast_error",
    oracle="""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY m
),
lagged AS (
  SELECT m, rev_c,
         LAG(rev_c, 1) OVER (ORDER BY m) AS prev_1,
         LAG(rev_c, 12) OVER (ORDER BY m) AS prev_12
  FROM monthly
),
scored AS (
  SELECT rev_c, prev_1, prev_12,
         ABS(rev_c - prev_1) AS ae_naive,
         ABS(rev_c - prev_12) AS ae_seasonal
  FROM lagged WHERE prev_1 IS NOT NULL AND prev_12 IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
       CAST(SUM(ae_naive) AS DOUBLE) / 100.0 / COUNT(*) AS mae_naive,
       CAST(SUM(ae_seasonal) AS DOUBLE) / 100.0 / COUNT(*) AS mae_seasonal,
       ROUND(CAST(SUM(ae_seasonal) AS DOUBLE)
             / CAST(SUM(ae_naive) AS DOUBLE), 6) AS seasonal_vs_naive,
       CAST(SUM(ae_seasonal) AS BIGINT) < CAST(SUM(ae_naive) AS BIGINT)
         AS seasonality_helps
FROM scored
""",
)
def ts_naive_forecast_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORECAST BASELINE BACKTEST — the sanity bar every demand
    model must clear before shipping: on the monthly revenue
    series, score the two no-model baselines — last-value naive
    (forecast m = actual m-1) and seasonal naive (forecast m =
    actual m-12) — by mean absolute error over the months where
    both are defined (identical support, so the comparison is
    fair). The ratio seasonal/naive < 1 answers "does this series
    even HAVE usable yearly seasonality?" — the question to settle
    before fitting anything. Errors are exact cents integers
    (|a - b| of BIGINT lanes; MAE's division is the only double),
    computed with two LAGs over the calendar-sized month grid after
    a map-side fact reduce."""
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.sum(cents("o_totalprice")).cast("bigint").alias("rev_c"))
    w = Window.orderBy("m")
    lagged = monthly.select(
        "rev_c",
        F.lag("rev_c", 1).over(w).alias("prev_1"),
        F.lag("rev_c", 12).over(w).alias("prev_12"),
    ).filter(F.col("prev_1").isNotNull() & F.col("prev_12").isNotNull())
    ae_n = F.abs(F.col("rev_c") - F.col("prev_1"))
    ae_s = F.abs(F.col("rev_c") - F.col("prev_12"))
    return lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        (F.sum(ae_n).cast("double") / 100.0 / F.count(F.lit(1))).alias(
            "mae_naive"
        ),
        (F.sum(ae_s).cast("double") / 100.0 / F.count(F.lit(1))).alias(
            "mae_seasonal"
        ),
        F.round(
            F.sum(ae_s).cast("double") / F.sum(ae_n).cast("double"), 6
        ).alias("seasonal_vs_naive"),
        (
            F.sum(ae_s).cast("bigint") < F.sum(ae_n).cast("bigint")
        ).alias("seasonality_helps"),
    )


@register(
    "agg_net_revenue_retention",
    oracle="""
WITH yearly AS (
  SELECT o_custkey AS k,
         date_part('year', o_orderdate) AS y,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY k, y
),
paired AS (
  SELECT prv.y + 1 AS year,
         prv.rev_c AS prev_c,
         COALESCE(cur.rev_c, 0) AS cur_c
  FROM yearly prv LEFT JOIN yearly cur
    ON cur.k = prv.k AND cur.y = prv.y + 1
  WHERE prv.y + 1 <= 2001
),
agg AS (
  SELECT year,
         CAST(COUNT(*) AS BIGINT) AS n_cohort,
         CAST(SUM(CASE WHEN cur_c = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_churned,
         CAST(SUM(prev_c) AS BIGINT) AS prev_rev_c,
         CAST(SUM(cur_c) AS BIGINT) AS cur_rev_c,
         CAST(SUM(LEAST(cur_c, prev_c)) AS BIGINT) AS retained_rev_c
  FROM paired GROUP BY year
)
SELECT year, n_cohort, n_churned,
       ROUND(CAST(cur_rev_c AS DOUBLE) / CAST(prev_rev_c AS DOUBLE), 6)
         AS nrr,
       ROUND(CAST(retained_rev_c AS DOUBLE) / CAST(prev_rev_c AS DOUBLE), 6)
         AS grr
FROM agg
""",
)
def agg_net_revenue_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NET + GROSS REVENUE RETENTION (NRR/GRR) — the SaaS-board
    metric pair the same-store key does NOT give you: fix the
    cohort at everyone who paid in year y, then NRR = their year
    y+1 revenue over their year y revenue (expansion can push it
    over 100%; churned customers stay in the DENOMINATOR at zero —
    the subtlety that silently inflates naive retention queries
    which inner-join the two years), and GRR caps each customer at
    their prior spend (pure retention, expansion excluded, so GRR
    <= NRR always). One (customer, year) cents agg + a LEFT
    self-join on the customer key (co-partitioned) + a year-grid
    reduce; exact cents everywhere, two pinned divisions."""
    o = table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        F.col("o_custkey").alias("k"),
        F.year("o_orderdate").alias("y"),
    ).agg(F.sum(cents("o_totalprice")).cast("bigint").alias("rev_c"))
    prv = yearly.select(
        "k", (F.col("y") + 1).alias("year"), F.col("rev_c").alias("prev_c")
    ).filter(F.col("year") <= 2001)
    cur = yearly.select(
        "k", F.col("y").alias("year"), F.col("rev_c").alias("cur_raw")
    )
    paired = prv.join(cur, ["k", "year"], "left").select(
        "year",
        "prev_c",
        F.coalesce(F.col("cur_raw"), F.lit(0)).alias("cur_c"),
    )
    agg = paired.groupBy("year").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cohort"),
        F.sum(F.when(F.col("cur_c") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_churned"),
        F.sum("prev_c").cast("bigint").alias("prev_rev_c"),
        F.sum("cur_c").cast("bigint").alias("cur_rev_c"),
        F.sum(F.least(F.col("cur_c"), F.col("prev_c")))
        .cast("bigint")
        .alias("retained_rev_c"),
    )
    return agg.select(
        "year",
        "n_cohort",
        "n_churned",
        F.round(
            F.col("cur_rev_c").cast("double") / F.col("prev_rev_c").cast("double"),
            6,
        ).alias("nrr"),
        F.round(
            F.col("retained_rev_c").cast("double")
            / F.col("prev_rev_c").cast("double"),
            6,
        ).alias("grr"),
    )


@register(
    "attribution_position_based",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conv
  FROM events
),
p AS (
  SELECT user_id, conv AS conv_id, cents AS pcents
  FROM ev WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, conv + 1 AS grp, event_type, ts, event_id
  FROM ev WHERE event_type <> 'purchase'
),
j AS (
  SELECT p.user_id, p.conv_id, p.pcents,
         t.event_type AS channel, t.ts AS tts, t.event_id AS tid
  FROM p LEFT JOIN t ON p.user_id = t.user_id AND p.conv_id = t.grp
),
ranked AS (
  SELECT *,
         CAST(COUNT(tid) OVER (PARTITION BY user_id, conv_id) AS BIGINT)
           AS cnt,
         ROW_NUMBER() OVER (PARTITION BY user_id, conv_id
                            ORDER BY tts, tid) AS rn
  FROM j
),
weighted AS (
  SELECT COALESCE(channel, '<organic>') AS channel,
         pcents,
         CASE WHEN cnt <= 1 THEN 1
              WHEN cnt = 2 THEN 1
              WHEN rn = 1 OR rn = cnt THEN 2
              ELSE 1 END AS wnum,
         CASE WHEN cnt <= 1 THEN 1
              WHEN cnt = 2 THEN 2
              WHEN rn = 1 OR rn = cnt THEN 5
              ELSE 5 * (cnt - 2) END AS wden
  FROM ranked
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(CAST(ROUND(CAST(pcents * 1000000 * wnum AS DOUBLE) / wden, 0)
                     AS BIGINT)) AS BIGINT) AS attributed_microcents,
       CAST(SUM(CAST(ROUND(1000000.0 * wnum / wden, 0) AS BIGINT))
         AS BIGINT) AS weight_micro_sum
FROM weighted GROUP BY channel
""",
    tags=("events", "window", "attribution"),
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITION-BASED (U-SHAPED 40/20/40) MULTI-TOUCH ATTRIBUTION —
    the standard middle ground between last-touch and linear: each
    purchase's credit splits 40% to the FIRST touch on its path, 40%
    to the LAST, and 20% evenly across the middle. The path is the
    run of non-purchase events since the user's previous purchase
    (running purchase-count sessionization — one window), joined
    touch-rows-to-purchase on the path id. Weights stay RATIONAL
    (num/den integer columns; 1-touch paths get 1/1, 2-touch 1/2
    each) and credit is quantized per touch to exact integer
    micro-cents BEFORE the channel sum, so no double accumulation
    order can drift. Touchless purchases credit '<organic>' in
    full. At 100 TB: one user-keyed window sort, one co-partitioned
    self-join on (user, path), one channel-sized hash-agg."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", cents("value").alias("cents")
    )
    wconv = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = ev.withColumn(
        "conv",
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(
            wconv
        ),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("conv").alias("conv_id"), F.col("cents").alias("pcents")
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        (F.col("conv") + 1).alias("grp"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("tts"),
        F.col("event_id").alias("tid"),
    )
    p, t = p.alias("p"), t.alias("t")
    j = p.join(
        t,
        (F.col("p.user_id") == F.col("t.user_id"))
        & (F.col("p.conv_id") == F.col("t.grp")),
        "left",
    ).select(F.col("p.user_id"), "conv_id", "pcents", "channel", "tts", "tid")
    wpart = Window.partitionBy("user_id", "conv_id")
    ranked = j.withColumn(
        "cnt", F.count("tid").over(wpart).cast("bigint")
    ).withColumn("rn", F.row_number().over(wpart.orderBy("tts", "tid")))
    is_end = (F.col("rn") == 1) | (F.col("rn") == F.col("cnt"))
    wnum = (
        F.when(F.col("cnt") <= 1, 1)
        .when(F.col("cnt") == 2, 1)
        .when(is_end, 2)
        .otherwise(1)
    )
    wden = (
        F.when(F.col("cnt") <= 1, 1)
        .when(F.col("cnt") == 2, 2)
        .when(is_end, 5)
        .otherwise(5 * (F.col("cnt") - 2))
    )
    weighted = ranked.select(
        F.coalesce("channel", F.lit("<organic>")).alias("channel"),
        F.round(
            (F.col("pcents") * 1000000 * wnum).cast("double") / wden, 0
        )
        .cast("bigint")
        .alias("micro"),
        F.round(F.lit(1000000.0) * wnum / wden, 0)
        .cast("bigint")
        .alias("wmicro"),
    )
    return weighted.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.sum("micro").cast("bigint").alias("attributed_microcents"),
        F.sum("wmicro").cast("bigint").alias("weight_micro_sum"),
    )


@register(
    "attribution_time_decay",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conv
  FROM events
),
p AS (
  SELECT user_id, conv AS conv_id, cents AS pcents, epoch_us(ts) AS pus
  FROM ev WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, conv + 1 AS grp, event_type, epoch_us(ts) AS tus, event_id
  FROM ev WHERE event_type <> 'purchase'
),
j AS (
  SELECT p.user_id, p.conv_id, p.pcents,
         t.event_type AS channel,
         CASE WHEN t.event_id IS NULL THEN NULL
              ELSE CAST(FLOOR(ROUND(
                     pow(2.0, -(CAST(p.pus - t.tus AS DOUBLE)
                                / 604800000000.0)), 12)
                     * 1000000000) AS BIGINT) END AS w_nano
  FROM p LEFT JOIN t ON p.user_id = t.user_id AND p.conv_id = t.grp
),
summed AS (
  SELECT *,
         SUM(w_nano) OVER (PARTITION BY user_id, conv_id) AS sum_nano
  FROM j
)
SELECT COALESCE(channel, '<organic>') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(CASE WHEN w_nano IS NULL THEN pcents * 1000000
                     ELSE CAST(ROUND(CAST(pcents * w_nano AS DOUBLE)
                                     * 1000000.0 / sum_nano, 0) AS BIGINT)
                END) AS BIGINT) AS attributed_microcents
FROM summed GROUP BY COALESCE(channel, '<organic>')
""",
    tags=("events", "window", "attribution"),
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-DECAY MULTI-TOUCH ATTRIBUTION — each touch on a
    purchase's path earns weight 2^(-age/half_life) with a 7-day
    half-life (a touch a week before the purchase counts half as
    much as one at conversion), normalized within the path so every
    purchase distributes exactly its own revenue. The libm pow()
    term is quantized PER TOUCH to integer nano-weights (12 guard
    digits, the agg_decayed_sum lane) before the path-sum, so the
    normalizing denominator is an exact integer on both engines and
    each touch's share is one deterministic double division. Same
    join geometry as position-based: window sessionize, path join,
    channel hash-agg."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", cents("value").alias("cents")
    )
    wconv = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = ev.withColumn(
        "conv",
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(
            wconv
        ),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("conv").alias("conv_id"),
        F.col("cents").alias("pcents"),
        F.unix_micros("ts").alias("pus"),
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        (F.col("conv") + 1).alias("grp"),
        F.col("event_type").alias("channel"),
        F.unix_micros("ts").alias("tus"),
        F.col("event_id").alias("tid"),
    )
    w_nano = F.when(
        F.col("tid").isNotNull(),
        F.floor(
            F.round(
                F.pow(
                    F.lit(2.0),
                    -(
                        (F.col("pus") - F.col("tus")).cast("double")
                        / F.lit(604800000000.0)
                    ),
                ),
                12,
            )
            * 1000000000
        ).cast("bigint"),
    )
    p, t = p.alias("p"), t.alias("t")
    j = p.join(
        t,
        (F.col("p.user_id") == F.col("t.user_id"))
        & (F.col("p.conv_id") == F.col("t.grp")),
        "left",
    ).select(
        F.col("p.user_id"), "conv_id", "pcents", "channel", w_nano.alias("w_nano")
    )
    summed = j.withColumn(
        "sum_nano", F.sum("w_nano").over(Window.partitionBy("user_id", "conv_id"))
    )
    share = F.when(
        F.col("w_nano").isNull(), F.col("pcents") * 1000000
    ).otherwise(
        F.round(
            (F.col("pcents") * F.col("w_nano")).cast("double")
            * 1000000.0
            / F.col("sum_nano"),
            0,
        ).cast("bigint")
    )
    return (
        summed.select(
            F.coalesce("channel", F.lit("<organic>")).alias("channel"),
            share.alias("micro"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum("micro").cast("bigint").alias("attributed_microcents"),
        )
    )


@register("ts_dtw_distance", oracle=None, check="rows", prop_tests=("tests/test_stats_round6.py::test_dtw_matches_bruteforce",))
def ts_dtw_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC TIME WARPING distance between every pair of the five
    per-event-type daily-revenue series — the alignment-tolerant
    series distance (shifted-but-similar series score close, unlike
    pointwise L1/L2) behind time-series clustering and
    nearest-pattern search. Genuinely non-SQL-expressible: the DP
    recurrence dp[i][j] = |a_i-b_j| + min(dp[i-1][j], dp[i][j-1],
    dp[i-1][j-1]) is inherently sequential in both dimensions, so
    this is the repo's canonical applyInPandas shape — series
    collect to SORTED arrays per key (30 points each, cents-exact
    ints), the 5x5 upper triangle cross-joins to 10 pair rows, and a
    vectorized numpy DP runs per row inside one Arrow batch. Exact
    integer costs -> bit-stable distances; tests/test_stats_round6
    re-derives the DP brute-force in pure Python. At 100 TB the
    daily pre-aggregation is the only data-sized shuffle; the DP
    runs on model-sized (n_keys^2) rows."""
    from pyspark.sql.types import LongType

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.sum(cents("value")).cast("bigint").alias("v"))
    series = daily.groupBy("et").agg(
        F.sort_array(F.collect_list(F.struct("day", "v"))).alias("pts")
    ).select(
        "et",
        F.expr("transform(pts, p -> p.v)").alias("vals"),
        F.size("pts").alias("n"),
    )
    a = series.select(
        F.col("et").alias("t1"), F.col("vals").alias("va"), F.col("n").alias("n1")
    )
    b = series.select(
        F.col("et").alias("t2"), F.col("vals").alias("vb"), F.col("n").alias("n2")
    )
    pairs = a.join(F.broadcast(b), F.col("t1") < F.col("t2"))

    @F.pandas_udf(LongType())
    def dtw(va: pd.Series, vb: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for xs, ys in zip(va, vb):
            x = np.asarray(xs, dtype=np.int64)
            y = np.asarray(ys, dtype=np.int64)
            m, n = len(x), len(y)
            # cost row-sweep: dp holds row i; exact int64 throughout.
            inf = np.int64(2**62)
            prev = np.full(n + 1, inf, dtype=np.int64)
            prev[0] = 0
            for i in range(1, m + 1):
                cur = np.full(n + 1, inf, dtype=np.int64)
                cost = np.abs(x[i - 1] - y)
                for j in range(1, n + 1):
                    cur[j] = cost[j - 1] + min(
                        prev[j], cur[j - 1], prev[j - 1]
                    )
                prev = cur
            out.append(int(prev[n]))
        return pd.Series(out)

    return pairs.select(
        "t1",
        "t2",
        "n1",
        "n2",
        dtw("va", "vb").alias("dtw_cents"),
    ).select(
        "t1",
        "t2",
        "n1",
        "n2",
        "dtw_cents",
        F.round(
            F.col("dtw_cents").cast("double") / (F.col("n1") + F.col("n2")), 6
        ).alias("dtw_per_step"),
    )


@register("win_elo_rating", oracle=None, check="rows", prop_tests=("tests/test_stats_round6.py::test_elo_matches_pure_python_replay",))
def win_elo_rating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ELO RATINGS over purchase 'matches' — the canonical
    INHERENTLY-SEQUENTIAL stateful fold that no window frame can
    express (each update depends on BOTH players' full histories):
    within a league (user_id % 5), consecutive purchase events by
    different users form a match won by the larger basket (ties to
    the earlier event), and ratings evolve by the standard logistic
    update r += K*(s - 1/(1+10^((r_opp-r)/400))), K=32, start 1000.
    The fold runs per league inside applyInPandas — parallel ACROSS
    leagues, sequential WITHIN, which is exactly how a 100 TB
    engine schedules grouped state (same shape as
    applyInPandasWithState, minus the streaming runtime). Ratings
    round to 6dp; tests/test_stats_round6.py replays the fold in
    pure Python and matches exactly."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 5).alias("league"),
        "user_id",
        "ts",
        "event_id",
        cents("value").alias("cents"),
    )
    schema = StructType(
        [
            StructField("league", LongType()),
            StructField("user_id", LongType()),
            StructField("n_matches", LongType()),
            StructField("rating", DoubleType()),
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        league = int(pdf["league"].iloc[0])
        ratings: dict[int, float] = {}
        counts: dict[int, int] = {}
        prev = None
        for row in pdf.itertuples(index=False):
            cur = (int(row.user_id), int(row.cents))
            if prev is not None and prev[0] != cur[0]:
                ra = ratings.setdefault(prev[0], 1000.0)
                rb = ratings.setdefault(cur[0], 1000.0)
                # winner: larger basket; tie -> the earlier (prev)
                sa = 1.0 if prev[1] >= cur[1] else 0.0
                ea = 1.0 / (1.0 + 10.0 ** ((rb - ra) / 400.0))
                ratings[prev[0]] = ra + 32.0 * (sa - ea)
                ratings[cur[0]] = rb + 32.0 * ((1.0 - sa) - (1.0 - ea))
                counts[prev[0]] = counts.get(prev[0], 0) + 1
                counts[cur[0]] = counts.get(cur[0], 0) + 1
            prev = cur
        rows = [
            (league, u, counts.get(u, 0), round(r, 6))
            for u, r in sorted(ratings.items())
        ]
        return pd.DataFrame(
            rows, columns=["league", "user_id", "n_matches", "rating"]
        )

    return p.groupBy("league").applyInPandas(fold, schema)


@register(
    "win_groups_frame_emulated",
    oracle="""
WITH per_group AS (
  SELECT l_returnflag AS fl,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS gsum_own
  FROM lineitem GROUP BY fl, qty
)
SELECT fl, qty, n_rows,
       CAST(SUM(gsum_own) OVER (
         PARTITION BY fl ORDER BY qty
         ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS groups_sum
FROM per_group
""",
    tags=("window", "lineitem"),
)
def win_groups_frame_emulated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS WINDOW FRAME, EMULATED — the SQL:2011 frame unit that
    NEITHER engine implements (Spark has no GROUPS mode; DuckDB
    parses it but raises 'not implemented yet'): a rolling sum over
    VALUE GROUPS (all peers of the previous, current, and next
    distinct l_quantity) per returnflag. The emulation is the
    standard rewrite, applied identically on both sides: collapse
    rows to one row per (partition, value) with its group sum —
    dense_rank's domain — then a plain ROWS frame over the collapsed
    relation IS the GROUPS frame by construction (one collapsed row
    per value group), and rows re-expand by joining back (here the
    output stays at the collapsed grain, grid-sized). Teaches the
    general lesson: a missing frame unit is a pre-aggregation away.
    Exact integer cents; one partition window over a 150-row grid
    after one hash-agg — the 600k-row fact never sorts."""
    li = table(spark, sf_dir, "lineitem")
    per_group = li.groupBy(
        F.col("l_returnflag").alias("fl"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(cents("l_extendedprice")).cast("bigint").alias("gsum_own"),
    )
    w = (
        Window.partitionBy("fl")
        .orderBy("qty")
        .rowsBetween(-1, 1)
    )
    return per_group.select(
        "fl",
        "qty",
        "n_rows",
        F.sum("gsum_own").over(w).cast("bigint").alias("groups_sum"),
    )


@register(
    "cep_absence_detection",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id, ts, event_type,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_us
  FROM events
),
purchases AS (
  SELECT user_id, event_id, ts, next_us,
         CASE WHEN next_us IS NULL THEN 'silent_forever'
              WHEN next_us - epoch_us(ts) > 259200000000
                THEN 'silent_3d'
              ELSE 'followed' END AS outcome
  FROM ev WHERE event_type = 'purchase'
)
SELECT outcome,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(MIN(event_id) AS BIGINT) AS first_event_id
FROM purchases GROUP BY outcome
""",
    tags=("events", "window", "cep"),
)
def cep_absence_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABSENCE DETECTION — the complex-event-processing pattern that
    trips most engines because it matches on events that DON'T
    happen: purchases followed by SILENCE (no activity from that
    user within 3 days, or ever again). In batch the non-event
    materializes as one LEAD over the user timeline — the gap to the
    next event IS the absence — with the data edge (no next event)
    kept as its own 'silent_forever' outcome rather than conflated
    with a long gap. In streaming the same semantics need an event-
    time timer (applyInPandasWithState registers a 3-day timeout per
    purchase); this batch formulation is its replay-exact oracle.
    One user-keyed window sort, one 3-row hash-agg."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tagged = ev.withColumn("next_us", F.lead(F.unix_micros("ts")).over(w))
    outcome = (
        F.when(F.col("next_us").isNull(), "silent_forever")
        .when(
            F.col("next_us") - F.unix_micros("ts") > 259200000000,
            "silent_3d",
        )
        .otherwise("followed")
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .select("event_id", outcome.alias("outcome"))
        .groupBy("outcome")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.min("event_id").cast("bigint").alias("first_event_id"),
        )
    )


def _hw_sql_new_level() -> str:
    # level' = 0.5*(y - s[idx]) + 0.5*(level + trend); idx 1-based
    return "0.5 * (y.c - h.s[((y.t - 1) % 7) + 1]) + 0.5 * (h.level + h.trend)"


def _hw_sql_seasonal_list() -> str:
    lvl = _hw_sql_new_level()
    elems = []
    for j in range(1, 8):
        elems.append(
            f"CASE WHEN ((y.t - 1) % 7) + 1 = {j}"
            f" THEN 0.5 * (y.c - ({lvl})) + 0.5 * h.s[{j}]"
            f" ELSE h.s[{j}] END"
        )
    return "list_value(" + ", ".join(elems) + ")"


@register(
    "ts_holt_winters_seasonal",
    oracle=f"""
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT date_trunc('day', ts) AS day,
         CAST(CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS DOUBLE) AS c
  FROM events GROUP BY day
),
y AS MATERIALIZED (
  SELECT day, c, CAST(ROW_NUMBER() OVER (ORDER BY day) AS INTEGER) AS t
  FROM daily
),
init AS (
  SELECT CAST(SUM(c) AS DOUBLE) / 7.0 AS level0,
         (MAX(CASE WHEN t = 7 THEN c END)
          - MAX(CASE WHEN t = 1 THEN c END)) / 6.0 AS trend0,
         list_value(
           {', '.join(f"MAX(CASE WHEN t = {j} THEN c END) - CAST(SUM(c) AS DOUBLE) / 7.0" for j in range(1, 8))}
         ) AS s0
  FROM y WHERE t <= 7
),
h AS (
  SELECT CAST(7 AS INTEGER) AS t,
         level0 AS level, trend0 AS trend, s0 AS s,
         CAST(NULL AS DOUBLE) AS fitted
  FROM init
  UNION ALL
  SELECT CAST(y.t AS INTEGER),
         {_hw_sql_new_level()},
         0.5 * (({_hw_sql_new_level()}) - h.level) + 0.5 * h.trend,
         {_hw_sql_seasonal_list()},
         h.level + h.trend + h.s[((y.t - 1) % 7) + 1]
  FROM h JOIN y ON y.t = h.t + 1
)
SELECT y.day, h.t,
       ROUND(h.fitted, 6) AS fitted_c,
       ROUND(h.level, 6) AS level_c,
       ROUND(h.trend, 6) AS trend_c
FROM h JOIN y ON y.t = h.t
WHERE h.t > 7
""",
    tags=("timeseries", "events", "iterative"),
)
def ts_holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT–WINTERS TRIPLE EXPONENTIAL SMOOTHING (additive, weekly
    period 7) over daily event revenue — level + trend + seasonal
    state, THE classical seasonal forecaster. Like ts_holt_linear,
    each engine runs the inherently-sequential recurrence as its
    native sequential primitive — the oracle as a RECURSIVE CTE
    carrying the 7-slot seasonal LIST through the recursion, Spark
    as ONE `aggregate` fold over the sorted day array carrying the
    same struct(level, trend, s[7]) — and all three smoothing
    constants are 0.5 (dyadic), so every update is an exact IEEE
    halving chain and the states match bit-for-bit with NO
    quantization. Init is pinned and peek-free: level = week-1 mean,
    trend = (y7-y1)/6, s_j = y_j - level. The fitted value
    (level+trend+seasonal BEFORE seeing the day) is the one-step
    forecast, so fitted-vs-actual is an honest backtest. Scale: one
    daily hash-agg shuffles; the fold runs on the calendar-sized
    model in one task."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(cents("value")).cast("bigint").cast("double").alias("c")
    )
    y = daily.select(
        F.row_number().over(Window.orderBy("day")).cast("int").alias("t"),
        "day",
        "c",
    )
    arr = y.agg(
        F.sort_array(F.collect_list(F.struct("t", "day", "c"))).alias("ys")
    )
    out_t = (
        "array<struct<t:int,day:timestamp,fitted:double,"
        "level:double,trend:double>>"
    )
    acc_t = (
        "struct<n:int,buf:array<double>,level:double,trend:double,"
        f"s:array<double>,out:{out_t}>"
    )
    init = F.expr(
        f"CAST(struct(0, CAST(array() AS array<double>), CAST(0.0 AS DOUBLE),"
        f" CAST(0.0 AS DOUBLE), CAST(array() AS array<double>), array())"
        f" AS {acc_t})"
    )

    def step(acc, e):
        # phase 1: buffer the first week
        buffered = F.struct(
            (acc.n + 1).alias("n"),
            F.concat(acc.buf, F.array(e.c)).alias("buf"),
            acc.level.alias("level"),
            acc.trend.alias("trend"),
            acc.s.alias("s"),
            acc.out.alias("out"),
        )
        # phase 2: 7th value arrives -> pinned init
        full = F.concat(acc.buf, F.array(e.c))
        lvl0 = F.aggregate(
            full, F.lit(0.0), lambda a, x: a + x
        ) / F.lit(7.0)
        trd0 = (F.element_at(full, 7) - F.element_at(full, 1)) / F.lit(6.0)
        s0 = F.transform(full, lambda v: v - lvl0)
        initialized = F.struct(
            (acc.n + 1).alias("n"),
            full.alias("buf"),
            lvl0.alias("level"),
            trd0.alias("trend"),
            s0.alias("s"),
            acc.out.alias("out"),
        )
        # phase 3: smoothing update (t >= 8); idx is 0-based here
        idx = (e.t - 1) % 7
        s_at = F.element_at(acc.s, idx + 1)
        fitted = acc.level + acc.trend + s_at
        new_l = 0.5 * (e.c - s_at) + 0.5 * (acc.level + acc.trend)
        new_b = 0.5 * (new_l - acc.level) + 0.5 * acc.trend
        new_s = F.transform(
            acc.s,
            lambda v, i: F.when(i == idx, 0.5 * (e.c - new_l) + 0.5 * v).otherwise(
                v
            ),
        )
        stepped = F.struct(
            (acc.n + 1).alias("n"),
            acc.buf.alias("buf"),
            new_l.alias("level"),
            new_b.alias("trend"),
            new_s.alias("s"),
            F.concat(
                acc.out,
                F.array(
                    F.struct(
                        e.t.alias("t"),
                        e.day.alias("day"),
                        fitted.alias("fitted"),
                        new_l.alias("level"),
                        new_b.alias("trend"),
                    )
                ),
            ).alias("out"),
        )
        return (
            F.when(acc.n < 6, buffered)
            .when(acc.n == 6, initialized)
            .otherwise(stepped)
        )

    folded = arr.select(
        F.aggregate(F.col("ys"), init, step).getField("out").alias("out")
    )
    return folded.select(F.explode("out").alias("o")).select(
        F.col("o.day").alias("day"),
        F.col("o.t").alias("t"),
        F.round("o.fitted", 6).alias("fitted_c"),
        F.round("o.level", 6).alias("level_c"),
        F.round("o.trend", 6).alias("trend_c"),
    )


_MARKOV_TYPES = ["click", "error", "purchase", "signup", "view"]


def _markov_component_sql(j: int) -> str:
    """v'_j = sum_i v[i] * p[i][j] as a FIXED left-assoc 5-term sum —
    the literal tree both engines must share. p is the flattened
    5x5 row-stochastic list (row-major, 1-based)."""
    terms = [f"h.v[{i + 1}] * h.p[{i * 5 + j + 1}]" for i in range(5)]
    return " + ".join(terms)


@register(
    "iter_markov_stationary",
    oracle="""
WITH RECURSIVE ev AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
counts AS (
  SELECT event_type AS src, next_type AS dst,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ev WHERE next_type IS NOT NULL
  GROUP BY src, dst
),
rowtot AS (
  SELECT src, CAST(SUM(n) AS BIGINT) AS tot FROM counts GROUP BY src
),
-- NOTE: anchor literals are CAST to DOUBLE explicitly — DuckDB
-- types a bare 0.2 as DECIMAL(2,1) and the recursive UNION ALL
-- then coerces every iterate back to one decimal digit, silently
-- freezing the recursion at its start vector (probed this round).
pm AS (
  SELECT COALESCE(MAX(CASE WHEN src = 'click' AND dst = 'click' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p00,
         COALESCE(MAX(CASE WHEN src = 'click' AND dst = 'error' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p01,
         COALESCE(MAX(CASE WHEN src = 'click' AND dst = 'purchase' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p02,
         COALESCE(MAX(CASE WHEN src = 'click' AND dst = 'signup' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p03,
         COALESCE(MAX(CASE WHEN src = 'click' AND dst = 'view' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p04,
         COALESCE(MAX(CASE WHEN src = 'error' AND dst = 'click' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p10,
         COALESCE(MAX(CASE WHEN src = 'error' AND dst = 'error' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p11,
         COALESCE(MAX(CASE WHEN src = 'error' AND dst = 'purchase' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p12,
         COALESCE(MAX(CASE WHEN src = 'error' AND dst = 'signup' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p13,
         COALESCE(MAX(CASE WHEN src = 'error' AND dst = 'view' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p14,
         COALESCE(MAX(CASE WHEN src = 'purchase' AND dst = 'click' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p20,
         COALESCE(MAX(CASE WHEN src = 'purchase' AND dst = 'error' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p21,
         COALESCE(MAX(CASE WHEN src = 'purchase' AND dst = 'purchase' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p22,
         COALESCE(MAX(CASE WHEN src = 'purchase' AND dst = 'signup' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p23,
         COALESCE(MAX(CASE WHEN src = 'purchase' AND dst = 'view' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p24,
         COALESCE(MAX(CASE WHEN src = 'signup' AND dst = 'click' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p30,
         COALESCE(MAX(CASE WHEN src = 'signup' AND dst = 'error' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p31,
         COALESCE(MAX(CASE WHEN src = 'signup' AND dst = 'purchase' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p32,
         COALESCE(MAX(CASE WHEN src = 'signup' AND dst = 'signup' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p33,
         COALESCE(MAX(CASE WHEN src = 'signup' AND dst = 'view' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p34,
         COALESCE(MAX(CASE WHEN src = 'view' AND dst = 'click' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p40,
         COALESCE(MAX(CASE WHEN src = 'view' AND dst = 'error' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p41,
         COALESCE(MAX(CASE WHEN src = 'view' AND dst = 'purchase' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p42,
         COALESCE(MAX(CASE WHEN src = 'view' AND dst = 'signup' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p43,
         COALESCE(MAX(CASE WHEN src = 'view' AND dst = 'view' THEN CAST(n AS DOUBLE) / tot END), 0.0) AS p44
  FROM counts JOIN rowtot USING (src)
),
h AS (
  SELECT 0 AS k, CAST(0.2 AS DOUBLE) AS v0, CAST(0.2 AS DOUBLE) AS v1, CAST(0.2 AS DOUBLE) AS v2, CAST(0.2 AS DOUBLE) AS v3, CAST(0.2 AS DOUBLE) AS v4, pm.*
  FROM pm
  UNION ALL
  SELECT k + 1,
         h.v0 * h.p00 + h.v1 * h.p10 + h.v2 * h.p20 + h.v3 * h.p30 + h.v4 * h.p40,
         h.v0 * h.p01 + h.v1 * h.p11 + h.v2 * h.p21 + h.v3 * h.p31 + h.v4 * h.p41,
         h.v0 * h.p02 + h.v1 * h.p12 + h.v2 * h.p22 + h.v3 * h.p32 + h.v4 * h.p42,
         h.v0 * h.p03 + h.v1 * h.p13 + h.v2 * h.p23 + h.v3 * h.p33 + h.v4 * h.p43,
         h.v0 * h.p04 + h.v1 * h.p14 + h.v2 * h.p24 + h.v3 * h.p34 + h.v4 * h.p44,
         p00, p01, p02, p03, p04, p10, p11, p12, p13, p14, p20, p21, p22, p23, p24, p30, p31, p32, p33, p34, p40, p41, p42, p43, p44
  FROM h WHERE k < 20
)
SELECT ROUND(v0, 6) AS pi_click, ROUND(v1, 6) AS pi_error, ROUND(v2, 6) AS pi_purchase, ROUND(v3, 6) AS pi_signup, ROUND(v4, 6) AS pi_view,
       CAST(20 AS BIGINT) AS n_iterations
FROM h WHERE k = 20
""",
    tags=("iterative", "events"),
)
def iter_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATIONARY DISTRIBUTION of the event-type Markov chain by
    POWER ITERATION — the steady-state 'where do user journeys
    spend their time' vector behind Markov attribution and
    PageRank-class analytics. The 5x5 transition matrix estimates
    as exact-count ratios (one LEAD + two hash-aggs); the iteration
    v <- vP runs 20 steps on the MODEL, not the data: the oracle as
    a recursive CTE carrying the flattened row-major matrix and the
    5-vector as lists, Spark as one aggregate() fold over a literal
    20-step array — and each component is the SAME literal
    left-associated 5-term sum, so the vectors agree bit-for-bit
    with no quantization. The 100 TB lesson in one key: reduce the
    corpus to sufficient statistics once, iterate driver-free on
    the grid."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("src"), F.col("next_type").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    rowtot = pairs.groupBy("src").agg(F.sum("n").cast("bigint").alias("tot"))
    joined = pairs.join(F.broadcast(rowtot), "src")
    pm = joined.agg(
        F.array(
            *[
                F.coalesce(
                    F.max(
                        F.when(
                            (F.col("src") == s) & (F.col("dst") == d),
                            F.col("n").cast("double") / F.col("tot"),
                        )
                    ),
                    F.lit(0.0),
                )
                for s in _MARKOV_TYPES
                for d in _MARKOV_TYPES
            ]
        ).alias("p")
    )
    acc_t = "struct<v:array<double>,p:array<double>>"
    init = F.expr(
        f"CAST(struct(array(0.2D, 0.2D, 0.2D, 0.2D, 0.2D), p) AS {acc_t})"
    )

    def step(acc, _):
        comps = []
        for j in range(5):
            c = None
            for i in range(5):
                term = F.element_at(acc.v, i + 1) * F.element_at(
                    acc.p, i * 5 + j + 1
                )
                c = term if c is None else c + term
            comps.append(c)
        return F.struct(F.array(*comps).alias("v"), acc.p.alias("p"))

    folded = pm.select(
        F.aggregate(
            F.expr("sequence(1, 20)"),
            init,
            step,
        )
        .getField("v")
        .alias("v")
    )
    return folded.select(
        *[
            F.round(F.element_at("v", j + 1), 6).alias(f"pi_{t}")
            for j, t in enumerate(_MARKOV_TYPES)
        ],
        F.lit(20).cast("bigint").alias("n_iterations"),
    )


@register(
    "ts_croston_intermittent",
    oracle="""
WITH RECURSIVE demand AS (
  SELECT p.p_brand AS brand,
         date_diff('day', DATE '1998-01-01', CAST(l.l_shipdate AS DATE)) + 1
           AS t,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS d
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
    AND l.l_shipdate < TIMESTAMP '1999-01-01'
  GROUP BY brand, t
),
brands AS (SELECT DISTINCT p_brand AS brand FROM part),
spine AS MATERIALIZED (
  SELECT b.brand, gs.t, COALESCE(d.d, 0) AS d
  FROM brands b
  CROSS JOIN (SELECT unnest(generate_series(1, 365)) AS t) gs
  LEFT JOIN demand d ON d.brand = b.brand AND d.t = gs.t
),
h AS (
  SELECT brand, 0 AS t, 0 AS seen,
         CAST(0 AS DOUBLE) AS z, CAST(0 AS DOUBLE) AS q,
         0 AS last_t, CAST(0 AS BIGINT) AS nd, CAST(0 AS BIGINT) AS sq
  FROM brands
  UNION ALL
  SELECT h.brand, y.t,
         CASE WHEN y.d > 0 THEN 1 ELSE h.seen END,
         CASE WHEN y.d = 0 THEN h.z
              WHEN h.seen = 0 THEN CAST(y.d AS DOUBLE)
              ELSE 0.5 * h.z + 0.5 * y.d END,
         CASE WHEN y.d = 0 THEN h.q
              WHEN h.seen = 0 THEN CAST(y.t - h.last_t AS DOUBLE)
              ELSE 0.5 * h.q + 0.5 * (y.t - h.last_t) END,
         CASE WHEN y.d = 0 THEN h.last_t ELSE y.t END,
         h.nd + CASE WHEN y.d > 0 THEN 1 ELSE 0 END,
         h.sq + y.d
  FROM h JOIN spine y ON y.brand = h.brand AND y.t = h.t + 1
)
SELECT brand,
       CAST(nd AS BIGINT) AS n_demand_days,
       CAST(sq AS BIGINT) AS total_qty,
       ROUND(z, 6) AS z_size,
       ROUND(q, 6) AS q_interval,
       ROUND(z / q, 6) AS croston_rate
FROM h WHERE t = 365
""",
    tags=("timeseries", "iterative", "lineitem"),
)
def ts_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSTON'S METHOD — the standard forecaster for INTERMITTENT
    demand (spare parts, long-tail SKUs) where plain exponential
    smoothing biases toward zero: smooth the nonzero demand SIZES
    (z) and the INTERVALS between demand days (q) separately, each
    with dyadic alpha=0.5, and forecast z/q units per day. Per-brand
    daily 1998 demand on a dense 365-day spine (zero days are what
    make the method exist); the sequential fold runs per brand —
    PARALLEL across the 25 brand groups, sequential within — as one
    aggregate() over each brand's sorted (day, demand) array, while
    the oracle drives the identical recurrence as a recursive CTE
    keyed by (brand, t). Demand sizes/intervals are exact integers,
    every smoothing step an exact IEEE halving: states match
    bit-for-bit. The grouped-fold shape is the 100 TB story: reduce
    facts to per-key model series, then fold keys independently."""
    li = table(spark, sf_dir, "lineitem")
    pt = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    demand = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            (
                F.datediff(
                    F.col("l_shipdate").cast("date"), F.lit("1998-01-01").cast("date")
                )
                + 1
            ).alias("t"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("d"))
    )
    brands = pt.select(F.col("p_brand").alias("brand")).distinct()
    spine = (
        brands.crossJoin(
            F.broadcast(
                table(spark, sf_dir, "region")
                .limit(1)
                .select(F.explode(F.sequence(F.lit(1), F.lit(365))).alias("t"))
            )
        )
        .join(demand, ["brand", "t"], "left")
        .select("brand", "t", F.coalesce("d", F.lit(0)).cast("bigint").alias("d"))
    )
    arr = spine.groupBy("brand").agg(
        F.sort_array(F.collect_list(F.struct("t", "d"))).alias("ys")
    )
    acc_t = (
        "struct<seen:int,z:double,q:double,last_t:int,nd:bigint,sq:bigint>"
    )
    init = F.expr(
        f"CAST(struct(0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), 0,"
        f" CAST(0 AS BIGINT), CAST(0 AS BIGINT)) AS {acc_t})"
    )

    def step(acc, e):
        nonzero = e.d > 0
        z = (
            F.when(~nonzero, acc.z)
            .when(acc.seen == 0, e.d.cast("double"))
            .otherwise(0.5 * acc.z + 0.5 * e.d)
        )
        q = (
            F.when(~nonzero, acc.q)
            .when(acc.seen == 0, (e.t - acc.last_t).cast("double"))
            .otherwise(0.5 * acc.q + 0.5 * (e.t - acc.last_t))
        )
        return F.struct(
            F.when(nonzero, 1).otherwise(acc.seen).alias("seen"),
            z.alias("z"),
            q.alias("q"),
            F.when(nonzero, e.t).otherwise(acc.last_t).cast("int").alias("last_t"),
            (acc.nd + F.when(nonzero, 1).otherwise(0)).alias("nd"),
            (acc.sq + e.d).alias("sq"),
        )

    folded = arr.select(
        "brand", F.aggregate(F.col("ys"), init, step).alias("st")
    )
    return folded.select(
        "brand",
        F.col("st.nd").cast("bigint").alias("n_demand_days"),
        F.col("st.sq").cast("bigint").alias("total_qty"),
        F.round("st.z", 6).alias("z_size"),
        F.round("st.q", 6).alias("q_interval"),
        F.round(F.col("st.z") / F.col("st.q"), 6).alias("croston_rate"),
    )


@register(
    "win_growth_accounting",
    oracle="""
WITH uw AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS wk
  FROM events
),
tagged AS (
  SELECT user_id, wk,
         MIN(wk) OVER (PARTITION BY user_id) AS first_wk,
         LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk
  FROM uw
),
staged AS (
  SELECT wk,
         CASE WHEN wk = first_wk THEN 'new'
              WHEN wk - prev_wk = 1 THEN 'retained'
              ELSE 'resurrected' END AS stage,
         user_id
  FROM tagged
),
churn AS (
  SELECT wk + 1 AS wk, 'churned' AS stage, user_id
  FROM tagged t
  WHERE NOT EXISTS (SELECT 1 FROM uw u
                    WHERE u.user_id = t.user_id AND u.wk = t.wk + 1)
    AND wk + 1 <= (SELECT MAX(wk) FROM uw)
),
allrows AS (
  SELECT wk, stage, user_id FROM staged
  UNION ALL
  SELECT wk, stage, user_id FROM churn
)
SELECT wk AS week, stage,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(user_id) AS BIGINT) AS sample_user
FROM allrows GROUP BY week, stage
""",
    tags=("events", "window", "growth"),
)
def win_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROWTH ACCOUNTING — the startup-metrics decomposition of
    weekly active users into NEW (first-ever week), RETAINED (also
    active the previous week), RESURRECTED (returning after a gap),
    and CHURNED (active week w, silent week w+1, attributed to
    w+1): new + retained + resurrected - churned reconciles WAU
    week over week, which is why growth teams trust this table over
    any single retention number. One distinct user-week grid, one
    user-keyed window (MIN + LAG in the same sort), and churn as an
    anti-join of the grid against itself shifted one week — all
    grid-sized after the initial distinct. The final-week edge is
    excluded from churn (silence after the data edge is censoring,
    not churn — the KM lesson applied to growth)."""
    ev = table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        (
            F.floor(
                F.datediff(
                    F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
                )
                / 7
            )
        ).cast("bigint").alias("wk"),
    ).distinct()
    w = Window.partitionBy("user_id")
    tagged = uw.select(
        "user_id",
        "wk",
        F.min("wk").over(w).alias("first_wk"),
        F.lag("wk").over(w.orderBy("wk")).alias("prev_wk"),
    )
    staged = tagged.select(
        "wk",
        F.when(F.col("wk") == F.col("first_wk"), "new")
        .when(F.col("wk") - F.col("prev_wk") == 1, "retained")
        .otherwise("resurrected")
        .alias("stage"),
        "user_id",
    )
    mx = uw.agg(F.max("wk").alias("max_wk"))
    nxt = uw.select(
        "user_id", (F.col("wk") - 1).alias("wk")
    )
    churn = (
        tagged.join(nxt, ["user_id", "wk"], "left_anti")
        .crossJoin(F.broadcast(mx))
        .filter(F.col("wk") + 1 <= F.col("max_wk"))
        .select((F.col("wk") + 1).alias("wk"), F.lit("churned").alias("stage"), "user_id")
    )
    allrows = staged.unionByName(churn)
    return allrows.groupBy(F.col("wk").alias("week"), "stage").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.min("user_id").cast("bigint").alias("sample_user"),
    )


@register(
    "win_spc_western_electric",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY day
),
lim AS (
  SELECT CAST(SUM(c) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(c AS HUGEINT) * c) AS ss
  FROM daily
),
z AS (
  SELECT day, c,
         (c - CAST(s AS DOUBLE)/n)
           / sqrt(CAST(ss AS DOUBLE)/n
                  - (CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n)) AS zv
  FROM daily CROSS JOIN lim
),
flags AS (
  SELECT day, c, zv,
         CASE WHEN abs(zv) > 3.0 THEN 1 ELSE 0 END AS beyond3,
         SUM(CASE WHEN zv > 2.0 THEN 1 ELSE 0 END)
           OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
           AS hi2_of3,
         SUM(CASE WHEN zv < -2.0 THEN 1 ELSE 0 END)
           OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
           AS lo2_of3,
         SUM(CASE WHEN zv > 1.0 THEN 1 ELSE 0 END)
           OVER (ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
           AS hi4_of5,
         SUM(CASE WHEN zv < -1.0 THEN 1 ELSE 0 END)
           OVER (ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
           AS lo4_of5,
         SUM(CASE WHEN zv > 0.0 THEN 1 ELSE 0 END)
           OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
           AS hi8,
         SUM(CASE WHEN zv < 0.0 THEN 1 ELSE 0 END)
           OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
           AS lo8,
         ROW_NUMBER() OVER (ORDER BY day) AS rn
  FROM z
)
SELECT day, c, ROUND(zv, 6) AS z_score,
       beyond3 = 1 AS rule1_beyond_3s,
       (rn >= 3 AND (hi2_of3 >= 2 OR lo2_of3 >= 2)) AS rule2_2of3_beyond_2s,
       (rn >= 5 AND (hi4_of5 >= 4 OR lo4_of5 >= 4)) AS rule3_4of5_beyond_1s,
       (rn >= 8 AND (hi8 = 8 OR lo8 = 8)) AS rule4_8_same_side
FROM flags
""",
    tags=("events", "window", "dq"),
)
def win_spc_western_electric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPC CONTROL CHART with the WESTERN ELECTRIC RULES — the
    process-monitoring classic (manufacturing, SRE burn rates,
    pipeline volumes): daily revenue z-scored against the series'
    own center line and sigma, then the four WE run-rules flag
    per day: (1) one point beyond 3 sigma, (2) 2-of-3 beyond 2
    sigma same side, (3) 4-of-5 beyond 1 sigma same side, (4) 8
    consecutive on one side. Each rule is one bounded ROWS-frame
    count — run-rules ARE window queries, which is the point of the
    key. Sigma comes from exact HUGEINT/DECIMAL38 moment sums; the
    z and every comparison run the same shared double tree; early
    rows where a rule's lookback is not yet full report FALSE (rn
    guard) rather than firing on partial windows."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(cents("value")).cast("bigint").alias("c")
    )
    lim = daily.agg(
        F.sum("c").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).alias("ss"),
    )
    z = daily.crossJoin(F.broadcast(lim)).selectExpr(
        "day",
        "c",
        "(c - CAST(s AS DOUBLE)/n)"
        " / sqrt(CAST(ss AS DOUBLE)/n"
        " - (CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n)) AS zv",
    )
    wd = Window.orderBy("day")

    def lastn(cond, k):
        return F.sum(F.when(cond, 1).otherwise(0)).over(
            wd.rowsBetween(-(k - 1), 0)
        )

    flags = z.select(
        "day",
        "c",
        "zv",
        (F.abs(F.col("zv")) > 3.0).alias("beyond3"),
        lastn(F.col("zv") > 2.0, 3).alias("hi2_of3"),
        lastn(F.col("zv") < -2.0, 3).alias("lo2_of3"),
        lastn(F.col("zv") > 1.0, 5).alias("hi4_of5"),
        lastn(F.col("zv") < -1.0, 5).alias("lo4_of5"),
        lastn(F.col("zv") > 0.0, 8).alias("hi8"),
        lastn(F.col("zv") < 0.0, 8).alias("lo8"),
        F.row_number().over(wd).alias("rn"),
    )
    return flags.select(
        "day",
        "c",
        F.round("zv", 6).alias("z_score"),
        F.col("beyond3").alias("rule1_beyond_3s"),
        (
            (F.col("rn") >= 3)
            & ((F.col("hi2_of3") >= 2) | (F.col("lo2_of3") >= 2))
        ).alias("rule2_2of3_beyond_2s"),
        (
            (F.col("rn") >= 5)
            & ((F.col("hi4_of5") >= 4) | (F.col("lo4_of5") >= 4))
        ).alias("rule3_4of5_beyond_1s"),
        (
            (F.col("rn") >= 8) & ((F.col("hi8") == 8) | (F.col("lo8") == 8))
        ).alias("rule4_8_same_side"),
    )


_SHAP_CHANNELS = ["click", "error", "signup", "view"]
# |S|! * (n-1-|S|)! for n=4 channels, scaled Shapley weights (x 4! = 24)
_SHAP_W = {0: 6, 1: 2, 2: 2, 3: 6}


def _shap_sql() -> str:
    """Exact Shapley attribution over the 4 non-purchase channels as
    literal SQL: paths reduce to 4-bit masks with conversion counts;
    for each channel c, phi_c * 24 = sum over subsets S not
    containing c of w(|S|) * (v(S + c) - v(S)), v(S) = conversions
    whose path-mask is a subset of S. Fully enumerated: 16 subsets,
    integer weights, exact BIGINT arithmetic end-to-end."""
    terms = {c: [] for c in range(4)}
    for c in range(4):
        cbit = 1 << c
        for s in range(16):
            if s & cbit:
                continue
            w = _SHAP_W[bin(s).count("1")]
            terms[c].append(f"{w} * (v{s | cbit} - v{s})")
    sel = []
    for c, ch in enumerate(_SHAP_CHANNELS):
        expr = " + ".join(terms[c])
        sel.append(f"CAST({expr} AS BIGINT) AS phi24_{ch}")
    return ", ".join(sel)


@register(
    "attribution_shapley",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conv
  FROM events
),
p AS (
  SELECT user_id, conv AS conv_id FROM ev WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, conv + 1 AS grp,
         CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
              WHEN 'signup' THEN 4 ELSE 8 END AS bit
  FROM ev WHERE event_type <> 'purchase'
),
paths AS (
  SELECT p.user_id, p.conv_id,
         CAST(COALESCE(bit_or(t.bit), 0) AS BIGINT) AS mask
  FROM p LEFT JOIN t ON p.user_id = t.user_id AND p.conv_id = t.grp
  GROUP BY p.user_id, p.conv_id
),
mc AS (
  SELECT mask, CAST(COUNT(*) AS BIGINT) AS n_conv
  FROM paths WHERE mask > 0 GROUP BY mask
),
subsets AS (SELECT unnest(generate_series(0, 15)) AS s),
vs AS (
  SELECT s,
         CAST(COALESCE(SUM(CASE WHEN (mc.mask & s) = mc.mask
                                THEN mc.n_conv END), 0) AS BIGINT) AS v
  FROM subsets LEFT JOIN mc ON TRUE
  GROUP BY s
),
wide AS (
  SELECT {', '.join(f"MAX(CASE WHEN s = {s} THEN v END) AS v{s}" for s in range(16))}
  FROM vs
)
SELECT {_shap_sql()},
       v15 AS total_attributed_conversions
FROM wide
""",
    tags=("events", "attribution"),
)
def attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHAPLEY-VALUE ATTRIBUTION — the game-theoretic gold standard
    (each channel's credit is its average marginal contribution over
    all orderings of the channel coalition), computed EXACTLY, not
    sampled: conversion paths (touch types since the previous
    purchase) reduce to 4-bit channel masks with counts, the
    characteristic function v(S) = conversions reachable with
    channel set S is a 16-subset containment rollup of that
    mask-count grid, and each phi is the closed Shapley sum with
    integer weights scaled by 4! = 24 — exact BIGINT arithmetic
    end-to-end, no permutation sampling. Efficiency holds by
    construction: sum(phi) = v(full set). The pattern that matters
    at 100 TB: the DATA reduces once to a 16-cell grid; the
    exponential-in-channels part runs on the grid."""
    ev = table(spark, sf_dir, "events")
    wconv = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = ev.withColumn(
        "conv",
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(
            wconv
        ),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("conv").alias("conv_id")
    )
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 4)
        .otherwise(8)
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", (F.col("conv") + 1).alias("grp"), bit.alias("bit")
    )
    p, t = p.alias("p"), t.alias("t")
    paths = (
        p.join(
            t,
            (F.col("p.user_id") == F.col("t.user_id"))
            & (F.col("p.conv_id") == F.col("t.grp")),
            "left",
        )
        .groupBy(F.col("p.user_id"), "conv_id")
        .agg(
            F.coalesce(F.expr("bit_or(bit)"), F.lit(0))
            .cast("bigint")
            .alias("mask")
        )
    )
    mc = (
        paths.filter(F.col("mask") > 0)
        .groupBy("mask")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_conv"))
    )
    subsets = spark.range(16).select(F.col("id").cast("bigint").alias("s"))
    vs = (
        subsets.join(F.broadcast(mc), F.expr("(mask & s) = mask"), "left")
        .groupBy("s")
        .agg(F.coalesce(F.sum("n_conv"), F.lit(0)).cast("bigint").alias("v"))
    )
    wide = vs.agg(
        *[
            F.max(F.when(F.col("s") == s, F.col("v"))).alias(f"v{s}")
            for s in range(16)
        ]
    )
    return wide.selectExpr(
        *_shap_sql().split(", "),
        "v15 AS total_attributed_conversions",
    )


@register(
    "ts_hurst_rs",
    oracle="""
WITH daily AS (
  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) + 1 AS t,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY t
),
spine AS (
  SELECT s.n, d.t, d.c, (d.t - 1) // s.n AS blk
  FROM daily d
  CROSS JOIN (SELECT unnest(list_value(5, 10, 15)) AS n) s
  WHERE d.t <= 30
),
dev AS (
  SELECT n, blk, t, c,
         SUM(c) OVER (PARTITION BY n, blk ORDER BY t) AS cum,
         SUM(c) OVER (PARTITION BY n, blk) AS s_blk,
         SUM(CAST(c AS HUGEINT) * c) OVER (PARTITION BY n, blk) AS ss_blk,
         ROW_NUMBER() OVER (PARTITION BY n, blk ORDER BY t) AS k
  FROM spine
),
y AS (
  SELECT n, blk,
         MAX(cum - k * (CAST(s_blk AS DOUBLE) / n))
           - MIN(cum - k * (CAST(s_blk AS DOUBLE) / n)) AS r,
         sqrt(CAST(MAX(ss_blk) AS DOUBLE) / n
              - (CAST(MAX(s_blk) AS DOUBLE) / n)
                * (CAST(MAX(s_blk) AS DOUBLE) / n)) AS sd
  FROM dev GROUP BY n, blk
),
rs AS (
  SELECT n,
         CAST(SUM(CAST(ROUND(r / sd * 1000000000, 0) AS BIGINT)) AS BIGINT)
           AS rs_nano,
         CAST(COUNT(*) AS BIGINT) AS n_blocks
  FROM y GROUP BY n
),
wide AS (
  SELECT MAX(CASE WHEN n = 5 THEN rs_nano END)
           / (MAX(CASE WHEN n = 5 THEN n_blocks END)
              * CAST(1000000000 AS DOUBLE)) AS rs5,
         MAX(CASE WHEN n = 10 THEN rs_nano END)
           / (MAX(CASE WHEN n = 10 THEN n_blocks END)
              * CAST(1000000000 AS DOUBLE)) AS rs10,
         MAX(CASE WHEN n = 15 THEN rs_nano END)
           / (MAX(CASE WHEN n = 15 THEN n_blocks END)
              * CAST(1000000000 AS DOUBLE)) AS rs15
  FROM rs
),
fit AS (
  SELECT rs5, rs10, rs15,
         ln(CAST(5 AS DOUBLE)) AS x1, ln(CAST(10 AS DOUBLE)) AS x2,
         ln(CAST(15 AS DOUBLE)) AS x3,
         ln(rs5) AS y1, ln(rs10) AS y2, ln(rs15) AS y3
  FROM wide
)
SELECT ROUND(rs5, 6) AS rs_n5,
       ROUND(rs10, 6) AS rs_n10,
       ROUND(rs15, 6) AS rs_n15,
       ROUND((3.0*(x1*y1 + x2*y2 + x3*y3) - (x1 + x2 + x3)*(y1 + y2 + y3))
             / (3.0*(x1*x1 + x2*x2 + x3*x3)
                - (x1 + x2 + x3)*(x1 + x2 + x3)), 6) AS hurst_h
FROM fit
""",
    tags=("timeseries", "events", "stats"),
)
def ts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HURST EXPONENT by RESCALED-RANGE (R/S) ANALYSIS — the
    long-memory diagnostic (H ~ 0.5 random walk, > 0.5 trending,
    < 0.5 mean-reverting) that complements the runs test and DW:
    the 30-day revenue series splits into complete blocks of 5 /
    10 / 15 days; per block R = range of cumulative deviations from
    the block mean, S = population sigma, and H is the log-log
    slope of mean R/S against block size. Per-block R/S quantizes
    to nano-units before the per-size mean (the standard lane);
    the 3-point regression is a FIXED literal tree on the pivoted
    wide row, so no data-dependent accumulation exists anywhere.
    Cumulative deviations are one window cumsum per (size, block) —
    grid-sized work after the daily agg."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        (
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            + 1
        ).alias("t")
    ).agg(F.sum(cents("value")).cast("bigint").alias("c"))
    sizes = spark.createDataFrame([(5,), (10,), (15,)], "n int")
    spine = (
        daily.filter(F.col("t") <= 30)
        .crossJoin(F.broadcast(sizes))
        .select("n", "t", "c", F.expr("(t - 1) div n").alias("blk"))
    )
    wpart = Window.partitionBy("n", "blk")
    dev = spine.select(
        "n",
        "blk",
        "c",
        F.sum("c").over(wpart.orderBy("t")).alias("cum"),
        F.sum("c").over(wpart).alias("s_blk"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)"))
        .over(wpart)
        .alias("ss_blk"),
        F.row_number().over(wpart.orderBy("t")).alias("k"),
    )
    ydev = F.col("cum") - F.col("k") * (
        F.col("s_blk").cast("double") / F.col("n")
    )
    y = dev.groupBy("n", "blk").agg(
        (F.max(ydev) - F.min(ydev)).alias("r"),
        F.sqrt(
            F.max("ss_blk").cast("double") / F.col("n")
            - (F.max("s_blk").cast("double") / F.col("n"))
            * (F.max("s_blk").cast("double") / F.col("n"))
        ).alias("sd"),
    )
    rs = y.groupBy("n").agg(
        F.sum(
            F.round(F.col("r") / F.col("sd") * 1000000000, 0).cast("bigint")
        )
        .cast("bigint")
        .alias("rs_nano"),
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
    )

    def pick(n):
        return F.max(F.when(F.col("n") == n, F.col("rs_nano"))) / (
            F.max(F.when(F.col("n") == n, F.col("n_blocks")))
            * F.lit(1000000000.0)
        )

    wide = rs.agg(
        pick(5).alias("rs5"), pick(10).alias("rs10"), pick(15).alias("rs15")
    )
    fit = wide.selectExpr(
        "rs5",
        "rs10",
        "rs15",
        "ln(CAST(5 AS DOUBLE)) AS x1",
        "ln(CAST(10 AS DOUBLE)) AS x2",
        "ln(CAST(15 AS DOUBLE)) AS x3",
        "ln(rs5) AS y1",
        "ln(rs10) AS y2",
        "ln(rs15) AS y3",
    )
    return fit.selectExpr(
        "ROUND(rs5, 6) AS rs_n5",
        "ROUND(rs10, 6) AS rs_n10",
        "ROUND(rs15, 6) AS rs_n15",
        "ROUND((3.0*(x1*y1 + x2*y2 + x3*y3)"
        " - (x1 + x2 + x3)*(y1 + y2 + y3))"
        " / (3.0*(x1*x1 + x2*x2 + x3*x3)"
        " - (x1 + x2 + x3)*(x1 + x2 + x3)), 6) AS hurst_h",
    )


@register(
    "win_vwap_rolling",
    oracle="""
WITH trades AS (
  SELECT p.p_brand AS brand,
         date_trunc('day', l.l_shipdate) AS day,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
           AS BIGINT) AS pq_c,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-04-01'
  GROUP BY brand, day
),
win AS (
  SELECT brand, day, pq_c, q,
         CAST(SUM(pq_c) OVER (PARTITION BY brand ORDER BY day
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
           AS BIGINT) AS pq7,
         CAST(SUM(q) OVER (PARTITION BY brand ORDER BY day
                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
           AS BIGINT) AS q7,
         CAST(SUM(pq_c) OVER (PARTITION BY brand ORDER BY day)
           AS BIGINT) AS pq_cum,
         CAST(SUM(q) OVER (PARTITION BY brand ORDER BY day)
           AS BIGINT) AS q_cum
  FROM trades
)
SELECT brand, day,
       ROUND(CAST(pq_c AS DOUBLE) / q, 6) AS day_vwap_c,
       ROUND(CAST(pq7 AS DOUBLE) / q7, 6) AS vwap7_c,
       ROUND(CAST(pq_cum AS DOUBLE) / q_cum, 6) AS vwap_cum_c
FROM win
""",
    tags=("window", "lineitem", "finance"),
)
def win_vwap_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VWAP — volume-weighted average price, the trading/pricing
    benchmark that a plain moving average of prices gets WRONG
    (heavy-volume days must weigh more): per brand and day over
    1998-Q1, the day's VWAP, the trailing-7-row VWAP, and the
    cumulative (anchored) VWAP — each a RATIO OF WINDOWED SUMS, the
    pattern that makes weighted averages composable under windows
    (sum the numerator and denominator separately, divide once;
    never average the averages). Both running sums are exact
    BIGINTs; each output is one double division. One fact join +
    day-grain hash-agg shuffles; the windows run on the brand-day
    grid."""
    li = table(spark, sf_dir, "lineitem")
    pt = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    trades = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
        )
        .join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_trunc("day", "l_shipdate").alias("day"),
        )
        .agg(
            F.sum(cents("l_extendedprice")).cast("bigint").alias("pq_c"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"),
        )
    )
    wb = Window.partitionBy("brand").orderBy("day")
    win = trades.select(
        "brand",
        "day",
        "pq_c",
        "q",
        F.sum("pq_c").over(wb.rowsBetween(-6, 0)).cast("bigint").alias("pq7"),
        F.sum("q").over(wb.rowsBetween(-6, 0)).cast("bigint").alias("q7"),
        F.sum("pq_c").over(wb).cast("bigint").alias("pq_cum"),
        F.sum("q").over(wb).cast("bigint").alias("q_cum"),
    )
    return win.select(
        "brand",
        "day",
        F.round(F.col("pq_c").cast("double") / F.col("q"), 6).alias(
            "day_vwap_c"
        ),
        F.round(F.col("pq7").cast("double") / F.col("q7"), 6).alias("vwap7_c"),
        F.round(F.col("pq_cum").cast("double") / F.col("q_cum"), 6).alias(
            "vwap_cum_c"
        ),
    )


@register(
    "ts_walkforward_ols",
    oracle="""
WITH daily AS (
  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) + 1 AS t,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY t
),
pref AS (
  SELECT t, y,
         CAST(SUM(t) OVER (ORDER BY t) AS BIGINT) AS st,
         CAST(SUM(y) OVER (ORDER BY t) AS BIGINT) AS sy,
         CAST(SUM(t * t) OVER (ORDER BY t) AS BIGINT) AS stt,
         CAST(SUM(t * y) OVER (ORDER BY t) AS BIGINT) AS sty,
         CAST(ROW_NUMBER() OVER (ORDER BY t) AS BIGINT) AS n
  FROM daily
),
cuts AS (SELECT unnest(list_value(15, 20, 25)) AS cutoff),
fits AS (
  SELECT c.cutoff, p.n, p.st, p.sy, p.stt, p.sty,
         (p.n*CAST(p.sty AS DOUBLE) - CAST(p.st AS DOUBLE)*p.sy)
           / (p.n*CAST(p.stt AS DOUBLE) - CAST(p.st AS DOUBLE)*p.st) AS b
  FROM cuts c JOIN pref p ON p.t = c.cutoff
),
preds AS (
  SELECT f.cutoff, f.b,
         (CAST(f.sy AS DOUBLE) - f.b*f.st) / f.n AS a,
         d.y AS actual
  FROM fits f JOIN daily d ON d.t = f.cutoff + 1
)
SELECT cutoff,
       ROUND(b, 6) AS slope_c_per_day,
       ROUND(a + b*(cutoff + 1), 6) AS forecast_c,
       CAST(actual AS BIGINT) AS actual_c,
       ROUND(abs(a + b*(cutoff + 1) - actual), 6) AS abs_error_c
FROM preds
""",
    tags=("timeseries", "events", "stats"),
)
def ts_walkforward_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALK-FORWARD BACKTEST of a linear trend — the honest way to
    evaluate a forecaster (fit ONLY on data before each cutoff,
    predict the next day, score against the actual): refits at
    cutoffs 15/20/25 come FREE from prefix moments — running sums
    of (t, y, t^2, t*y) in one window pass make every expanding-
    window OLS a O(1) lookup at its cutoff row, the trick that
    turns N refits from N scans into one. Exact integer prefix
    sums; slope/intercept/forecast are single shared double trees
    per cutoff. Completes the forecasting family's eval loop next
    to ts_naive_forecast_error's fixed-origin baselines."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        (
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            + 1
        ).alias("t")
    ).agg(F.sum(cents("value")).cast("bigint").alias("y"))
    wt = Window.orderBy("t")
    pref = daily.select(
        "t",
        "y",
        F.sum("t").over(wt).cast("bigint").alias("st"),
        F.sum("y").over(wt).cast("bigint").alias("sy"),
        F.sum(F.col("t") * F.col("t")).over(wt).cast("bigint").alias("stt"),
        F.sum(F.col("t") * F.col("y")).over(wt).cast("bigint").alias("sty"),
        F.row_number().over(wt).cast("bigint").alias("n"),
    )
    cuts = spark.createDataFrame([(15,), (20,), (25,)], "cutoff bigint")
    fits = cuts.join(
        F.broadcast(pref), pref["t"] == cuts["cutoff"]
    ).selectExpr(
        "cutoff",
        "n",
        "st",
        "sy",
        "stt",
        "sty",
        "(n*CAST(sty AS DOUBLE) - CAST(st AS DOUBLE)*sy)"
        " / (n*CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)*st) AS b",
    )
    nxt = daily.select(
        (F.col("t") - 1).alias("cutoff"), F.col("y").alias("actual")
    )
    preds = fits.join(nxt, "cutoff").selectExpr(
        "cutoff",
        "b",
        "(CAST(sy AS DOUBLE) - b*st) / n AS a",
        "actual",
    )
    return preds.selectExpr(
        "cutoff",
        "ROUND(b, 6) AS slope_c_per_day",
        "ROUND(a + b*(cutoff + 1), 6) AS forecast_c",
        "CAST(actual AS BIGINT) AS actual_c",
        "ROUND(abs(a + b*(cutoff + 1) - actual), 6) AS abs_error_c",
    )


@register(
    "ts_alpha_beta_filter",
    oracle="""
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) + 1 AS t,
         CAST(CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS DOUBLE) AS y
  FROM events GROUP BY t
),
h AS (
  SELECT 1 AS t, y AS x, CAST(0 AS DOUBLE) AS v,
         CAST(NULL AS DOUBLE) AS resid
  FROM daily WHERE t = 1
  UNION ALL
  SELECT d.t,
         (h.x + h.v) + 0.5 * (d.y - (h.x + h.v)),
         h.v + 0.25 * (d.y - (h.x + h.v)),
         d.y - (h.x + h.v)
  FROM h JOIN daily d ON d.t = h.t + 1
)
SELECT t,
       ROUND(x, 6) AS level_c,
       ROUND(v, 6) AS velocity_c,
       ROUND(resid, 6) AS innovation_c
FROM h WHERE t > 1
""",
    tags=("timeseries", "events", "iterative"),
)
def ts_alpha_beta_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALPHA-BETA (g-h) FILTER — the steady-state Kalman filter for
    a constant-velocity state, the tracking-and-telemetry workhorse
    when you cannot afford covariance updates: predict x' = x + v,
    measure the innovation r = y - x', correct x += alpha*r,
    v += beta*r. Gains are DYADIC (alpha = 1/2, beta = 1/4), so
    like the Holt/Croston folds every update is an exact IEEE
    halving chain — the Spark aggregate() fold and the DuckDB
    recursive CTE agree bit-for-bit, no quantization. Emits the
    per-day level, velocity, and innovation (the residual stream an
    anomaly monitor would alarm on). One daily hash-agg; the fold
    runs on the 30-day model."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        (
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            + 1
        ).alias("t")
    ).agg(F.sum(cents("value")).cast("bigint").cast("double").alias("y"))
    arr = daily.agg(
        F.sort_array(F.collect_list(F.struct("t", "y"))).alias("ys")
    )
    out_t = "array<struct<t:bigint,x:double,v:double,resid:double>>"
    acc_t = f"struct<n:int,x:double,v:double,out:{out_t}>"
    init = F.expr(
        f"CAST(struct(0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), array())"
        f" AS {acc_t})"
    )

    def step(acc, e):
        first = F.struct(
            F.lit(1).alias("n"),
            e.y.alias("x"),
            F.lit(0.0).alias("v"),
            acc.out.alias("out"),
        )
        pred = acc.x + acc.v
        resid = e.y - pred
        new_x = pred + 0.5 * resid
        new_v = acc.v + 0.25 * resid
        stepped = F.struct(
            (acc.n + 1).alias("n"),
            new_x.alias("x"),
            new_v.alias("v"),
            F.concat(
                acc.out,
                F.array(
                    F.struct(
                        e.t.alias("t"),
                        new_x.alias("x"),
                        new_v.alias("v"),
                        resid.alias("resid"),
                    )
                ),
            ).alias("out"),
        )
        return F.when(acc.n == 0, first).otherwise(stepped)

    folded = arr.select(
        F.aggregate(F.col("ys"), init, step).getField("out").alias("out")
    )
    return folded.select(F.explode("out").alias("o")).select(
        F.col("o.t").alias("t"),
        F.round("o.x", 6).alias("level_c"),
        F.round("o.v", 6).alias("velocity_c"),
        F.round("o.resid", 6).alias("innovation_c"),
    )


@register(
    "win_record_highs",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY day
),
runmax AS (
  SELECT day, c,
         MAX(c) OVER (ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max,
         ROW_NUMBER() OVER (ORDER BY day) AS rn
  FROM daily
),
records AS (
  SELECT day, c, rn,
         CASE WHEN prev_max IS NULL OR c > prev_max THEN 1 ELSE 0 END
           AS is_record
  FROM runmax
),
gaps AS (
  SELECT day, c, rn, is_record,
         rn - LAG(rn) OVER (ORDER BY day) AS days_since_prev_record
  FROM records WHERE is_record = 1
)
SELECT day, c AS revenue_c, rn AS day_number,
       COALESCE(days_since_prev_record, 0) AS days_since_prev_record
FROM gaps
""",
    tags=("events", "window", "timeseries"),
)
def win_record_highs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECORD HIGHS — 'best day ever' analytics: the days that set a
    new all-time revenue record and the spacing between successive
    records (under a random i.i.d. series the k-th record waits
    ~e times longer than the (k-1)-th — stretching record gaps are
    themselves a stationarity signal). A record is one comparison
    against the running max over a frame ending at 1 PRECEDING
    (CURRENT ROW would make every day trivially a record — the
    same frame-bound lesson as last-touch attribution); gaps are a
    LAG over the filtered record rows. Exact integer cents
    end-to-end on the 30-day grid."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(cents("value")).cast("bigint").alias("c")
    )
    wd = Window.orderBy("day")
    runmax = daily.select(
        "day",
        "c",
        F.max("c")
        .over(wd.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_max"),
        F.row_number().over(wd).alias("rn"),
    )
    records = runmax.filter(
        F.col("prev_max").isNull() | (F.col("c") > F.col("prev_max"))
    )
    gaps = records.select(
        "day",
        "c",
        "rn",
        (F.col("rn") - F.lag("rn").over(Window.orderBy("day"))).alias(
            "days_since_prev_record"
        ),
    )
    return gaps.select(
        "day",
        F.col("c").alias("revenue_c"),
        F.col("rn").alias("day_number"),
        F.coalesce("days_since_prev_record", F.lit(0)).alias(
            "days_since_prev_record"
        ),
    )


@register(
    "win_dwell_time_by_state",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS eu, event_id,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_eu
  FROM events
),
spans AS (
  SELECT event_type, next_eu - eu AS dwell_us
  FROM ev WHERE next_eu IS NOT NULL
),
tot AS (SELECT CAST(SUM(dwell_us) AS BIGINT) AS t FROM spans)
SELECT event_type AS state,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(dwell_us) AS BIGINT) AS dwell_us,
       ROUND(CAST(SUM(dwell_us) AS DOUBLE) / (SELECT t FROM tot), 6)
         AS share_of_time,
       CAST(SUM(dwell_us) // COUNT(*) AS BIGINT) AS mean_dwell_us
FROM spans GROUP BY event_type
""",
    tags=("events", "window"),
)
def win_dwell_time_by_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DWELL TIME BY STATE — the screen-time decomposition: each
    event OWNS the interval until the user's next event, so summing
    owned intervals per event type answers 'where does user time
    actually go' (counting events answers only 'what do users
    click', and the two rankings routinely disagree). Final spans
    are censored and dropped, same reasoning as the growth-
    accounting edge. One LEAD per user timeline, one type-grid agg;
    exact integer microseconds, mean dwell as exact integer
    division."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    spans = (
        ev.select(
            "event_type",
            F.unix_micros("ts").alias("eu"),
            F.lead(F.unix_micros("ts")).over(w).alias("next_eu"),
        )
        .filter(F.col("next_eu").isNotNull())
        .select("event_type", (F.col("next_eu") - F.col("eu")).alias("dwell_us"))
    )
    tot = spans.agg(F.sum("dwell_us").cast("bigint").alias("t"))
    return (
        spans.groupBy(F.col("event_type").alias("state"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum("dwell_us").cast("bigint").alias("dwell_us"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "state",
            "n_spans",
            "dwell_us",
            F.round(F.col("dwell_us").cast("double") / F.col("t"), 6).alias(
                "share_of_time"
            ),
            F.expr("dwell_us div n_spans").cast("bigint").alias(
                "mean_dwell_us"
            ),
        )
    )


@register(
    "funnel_window_clickhouse",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS eu, event_id FROM events
),
firsts AS (
  SELECT user_id, MIN(eu) AS t_view
  FROM ev WHERE event_type = 'view' GROUP BY user_id
),
l2 AS (
  SELECT f.user_id, f.t_view, MIN(e.eu) AS t_click
  FROM firsts f JOIN ev e ON e.user_id = f.user_id
  WHERE e.event_type = 'click' AND e.eu > f.t_view
    AND e.eu <= f.t_view + 86400000000
  GROUP BY f.user_id, f.t_view
),
l3 AS (
  SELECT c.user_id, MIN(e.eu) AS t_buy
  FROM l2 c JOIN ev e ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.eu > c.t_click
    AND e.eu <= c.t_view + 86400000000
  GROUP BY c.user_id
),
levels AS (
  SELECT f.user_id,
         CASE WHEN l3.user_id IS NOT NULL THEN 3
              WHEN l2.user_id IS NOT NULL THEN 2
              ELSE 1 END AS level
  FROM firsts f
  LEFT JOIN l2 ON f.user_id = l2.user_id
  LEFT JOIN l3 ON f.user_id = l3.user_id
)
SELECT level,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(user_id) AS BIGINT) AS sample_user
FROM levels GROUP BY level
""",
    tags=("events", "funnel", "window"),
)
def funnel_window_clickhouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOWED FUNNEL (the ClickHouse windowFunnel semantic) —
    view -> click -> purchase where EVERY later stage must land
    within 24h OF THE FIRST stage (not of the previous one — the
    difference between 'converted within a day' and a chain of
    slow hops; funnel_ordered_3step is the unwindowed cousin) and
    stages must be strictly ordered in time. Each level is one
    conditional-MIN semi-join anchored on the previous level's
    timestamp — levels build left-to-right exactly like the
    engine's own sequenceMatch state machine, and every timestamp
    comparison is exact integer microseconds. Per-level user counts
    out; user-keyed joins co-partition at 100 TB."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("eu")
    )
    day_us = 86400000000
    firsts = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("eu").alias("t_view"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("eu").alias("ceu")
    )
    l2 = (
        firsts.join(clicks, firsts["user_id"] == clicks["cu"])
        .filter(
            (F.col("ceu") > F.col("t_view"))
            & (F.col("ceu") <= F.col("t_view") + day_us)
        )
        .groupBy("user_id", "t_view")
        .agg(F.min("ceu").alias("t_click"))
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("bu"), F.col("eu").alias("beu")
    )
    l3 = (
        l2.join(buys, l2["user_id"] == buys["bu"])
        .filter(
            (F.col("beu") > F.col("t_click"))
            & (F.col("beu") <= F.col("t_view") + day_us)
        )
        .groupBy("user_id")
        .agg(F.min("beu").alias("t_buy"))
    )
    levels = (
        firsts.join(
            l2.select("user_id", F.lit(1).alias("has2")), "user_id", "left"
        )
        .join(l3.select("user_id", F.lit(1).alias("has3")), "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("has3").isNotNull(), 3)
            .when(F.col("has2").isNotNull(), 2)
            .otherwise(1)
            .alias("level"),
        )
    )
    return levels.groupBy("level").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.min("user_id").cast("bigint").alias("sample_user"),
    )


@register(
    "win_rolling_beta",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS buy_c,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           AS BIGINT) AS views
  FROM events GROUP BY day
),
win AS (
  SELECT day, buy_c, views,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(views) OVER w AS BIGINT) AS sx,
         CAST(SUM(buy_c) OVER w AS BIGINT) AS sy,
         CAST(SUM(views * views) OVER w AS BIGINT) AS sxx,
         CAST(SUM(views * buy_c) OVER w AS BIGINT) AS sxy
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT day, n,
       ROUND((n*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy)
             / (n*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx), 6)
         AS beta_cents_per_view
FROM win WHERE n = 14
""",
    tags=("events", "window", "timeseries"),
)
def win_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING BETA — the time-varying sensitivity of purchase
    revenue to view traffic over a trailing 14-day window, the
    windowed cousin of the Granger key's static coefficient (a
    drifting beta IS regime change — exactly what the static fit
    hides). The whole regression rides WINDOWED EXACT-INT MOMENT
    SUMS (n, sum x, sum y, sum x^2, sum xy over the frame) — the
    same separately-windowed-numerators discipline as VWAP, lifted
    from ratios to regression; one double tree per day at the end.
    Partial head windows are excluded (n = 14 guard) rather than
    reported as noisy fits."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", cents("value")).otherwise(0)
        )
        .cast("bigint")
        .alias("buy_c"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("views"),
    )
    w = Window.orderBy("day").rowsBetween(-13, 0)
    win = daily.select(
        "day",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("views").over(w).cast("bigint").alias("sx"),
        F.sum("buy_c").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("views") * F.col("views")).over(w).cast("bigint").alias("sxx"),
        F.sum(F.col("views") * F.col("buy_c")).over(w).cast("bigint").alias("sxy"),
    ).filter(F.col("n") == 14)
    return win.selectExpr(
        "day",
        "n",
        "ROUND((n*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy)"
        " / (n*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx), 6)"
        " AS beta_cents_per_view",
    )


@register(
    "win_token_bucket_throttle",
    oracle="""
WITH RECURSIVE ev AS MATERIALIZED (
  SELECT user_id, epoch_us(ts) AS eu, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS seq,
         COUNT(*) OVER (PARTITION BY user_id) AS n_ev
  FROM events
),
h AS (
  SELECT user_id, 0 AS seq, CAST(5.0 AS DOUBLE) AS tokens,
         CAST(0 AS BIGINT) AS admitted, CAST(0 AS BIGINT) AS last_eu,
         CAST(0 AS INTEGER) AS started
  FROM (SELECT DISTINCT user_id FROM ev)
  UNION ALL
  SELECT h.user_id, e.seq,
         CASE WHEN h.started = 0 THEN
                CASE WHEN 5.0 >= 1.0 THEN 4.0 ELSE 5.0 END
              ELSE
                CASE WHEN LEAST(5.0, h.tokens
                                + CAST(e.eu - h.last_eu AS DOUBLE)
                                  / 2000000.0) >= 1.0
                     THEN LEAST(5.0, h.tokens
                                + CAST(e.eu - h.last_eu AS DOUBLE)
                                  / 2000000.0) - 1.0
                     ELSE LEAST(5.0, h.tokens
                                + CAST(e.eu - h.last_eu AS DOUBLE)
                                  / 2000000.0) END
         END,
         h.admitted + CASE WHEN h.started = 0 THEN 1
              WHEN LEAST(5.0, h.tokens
                         + CAST(e.eu - h.last_eu AS DOUBLE)
                           / 2000000.0) >= 1.0 THEN 1 ELSE 0 END,
         e.eu,
         1
  FROM h JOIN ev e ON e.user_id = h.user_id AND e.seq = h.seq + 1
)
SELECT h.user_id,
       CAST(e.n_ev AS BIGINT) AS n_events,
       h.admitted AS n_admitted,
       CAST(e.n_ev - h.admitted AS BIGINT) AS n_dropped,
       ROUND(h.tokens, 6) AS final_tokens
FROM h JOIN (SELECT DISTINCT user_id, n_ev FROM ev) e
  ON h.user_id = e.user_id AND h.seq = e.n_ev
""",
    tags=("events", "window", "iterative", "cep"),
)
def win_token_bucket_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-BUCKET RATE LIMITER, REPLAYED — the ops/CEP primitive
    (API quotas, alert debouncing) as an offline audit: per user,
    a bucket of capacity 5 refilling at 1 token per 2 seconds
    admits an event if a full token is available (consuming it) and
    drops it otherwise. The refill uses exact integer microsecond
    gaps over ONE double division per step, and both engines replay
    the identical sequential tree — Spark as an aggregate() fold
    over each user's sorted event array (PARALLEL across the 150
    users, the grouped-fold shape shared with Croston/Elo), the
    oracle as a per-user recursive CTE — so admit/drop decisions
    and the fractional final balance match bit-for-bit. At 100 TB
    this is applyInPandasWithState's batch replay twin."""
    ev = table(spark, sf_dir, "events")
    arr = (
        ev.select("user_id", F.unix_micros("ts").alias("eu"), "event_id")
        .groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("eu", "event_id"))
            ).alias("ys")
        )
    )
    acc_t = (
        "struct<started:int,tokens:double,admitted:bigint,last_eu:bigint>"
    )
    init = F.expr(
        f"CAST(struct(0, CAST(5.0 AS DOUBLE), CAST(0 AS BIGINT),"
        f" CAST(0 AS BIGINT)) AS {acc_t})"
    )

    def step(acc, e):
        refilled = F.least(
            F.lit(5.0),
            acc.tokens + (e.eu - acc.last_eu).cast("double") / F.lit(2000000.0),
        )
        first = F.struct(
            F.lit(1).alias("started"),
            F.lit(4.0).alias("tokens"),
            (acc.admitted + 1).alias("admitted"),
            e.eu.alias("last_eu"),
        )
        admit = F.struct(
            F.lit(1).alias("started"),
            (refilled - 1.0).alias("tokens"),
            (acc.admitted + 1).alias("admitted"),
            e.eu.alias("last_eu"),
        )
        drop = F.struct(
            F.lit(1).alias("started"),
            refilled.alias("tokens"),
            acc.admitted.alias("admitted"),
            e.eu.alias("last_eu"),
        )
        return (
            F.when(acc.started == 0, first)
            .when(refilled >= 1.0, admit)
            .otherwise(drop)
        )

    folded = arr.select(
        "user_id",
        F.size("ys").cast("bigint").alias("n_events"),
        F.aggregate(F.col("ys"), init, step).alias("st"),
    )
    return folded.select(
        "user_id",
        "n_events",
        F.col("st.admitted").cast("bigint").alias("n_admitted"),
        (F.col("n_events") - F.col("st.admitted"))
        .cast("bigint")
        .alias("n_dropped"),
        F.round("st.tokens", 6).alias("final_tokens"),
    )


@register(
    "win_frame_exclude_emulated",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, user_id % 5 AS grp,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY day, grp
)
SELECT grp, day, c,
       CAST(SUM(c) OVER (PARTITION BY grp ORDER BY day
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                         EXCLUDE CURRENT ROW) AS BIGINT) AS peer_sum,
       ROUND(CAST(SUM(c) OVER (PARTITION BY grp ORDER BY day
                               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                               EXCLUDE CURRENT ROW) AS DOUBLE)
             / (COUNT(*) OVER (PARTITION BY grp ORDER BY day
                               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                - 1), 6) AS peer_mean,
       ROUND(c - CAST(SUM(c) OVER (PARTITION BY grp ORDER BY day
                                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                                   EXCLUDE CURRENT ROW) AS DOUBLE)
                 / (COUNT(*) OVER (PARTITION BY grp ORDER BY day
                                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                    - 1), 6) AS deviation_from_peers
FROM daily
""",
    tags=("window", "events"),
)
def win_frame_exclude_emulated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE CURRENT ROW WINDOW FRAME, EMULATED — the SQL:2011
    frame exclusion Spark lacks (DuckDB's oracle runs the NATIVE
    `EXCLUDE CURRENT ROW`), and the construct leave-one-out
    statistics actually need: each day's revenue compared to the
    mean of its +-3-day PEERS, self excluded — include yourself and
    every anomaly score is biased toward normal by exactly the
    anomaly. The emulation is one subtraction: full-frame sum minus
    the current row (and count minus one) — same algebra as the LOO
    target-encoding key, applied to frames. Exact integer windowed
    sums; one partitioned sort over the grp x day grid."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        (F.col("user_id") % 5).alias("grp"),
    ).agg(F.sum(cents("value")).cast("bigint").alias("c"))
    w = Window.partitionBy("grp").orderBy("day").rowsBetween(-3, 3)
    full_sum = F.sum("c").over(w)
    full_cnt = F.count(F.lit(1)).over(w)
    peer_sum = (full_sum - F.col("c")).cast("bigint")
    peer_mean = peer_sum.cast("double") / (full_cnt - 1)
    return daily.select(
        "grp",
        "day",
        "c",
        peer_sum.alias("peer_sum"),
        F.round(peer_mean, 6).alias("peer_mean"),
        F.round(F.col("c") - peer_mean, 6).alias("deviation_from_peers"),
    )


@register(
    "ts_seasonal_strength",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY day
),
tr AS (
  SELECT day, y,
         CASE WHEN COUNT(*) OVER w = 7
              THEN CAST(SUM(y) OVER w AS DOUBLE) / 7.0 END AS trend,
         isodow(day) AS dow
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT day, dow, y - trend AS detr FROM tr WHERE trend IS NOT NULL
),
sea AS (
  SELECT dow,
         CAST(SUM(CAST(FLOOR(ROUND(detr, 6) * 1000) AS BIGINT)) AS BIGINT)
           AS s_milli,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM det GROUP BY dow
),
comp AS (
  SELECT d.day,
         CAST(FLOOR(ROUND(d.detr, 6) * 1000) AS BIGINT) AS detr_m,
         CAST(FLOOR(ROUND(CAST(s.s_milli AS DOUBLE) / s.n, 6)) AS BIGINT)
           AS seas_m
  FROM det d JOIN sea s ON d.dow = s.dow
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(detr_m - seas_m) AS BIGINT) AS sr,
         SUM(CAST(detr_m - seas_m AS HUGEINT) * (detr_m - seas_m)) AS srr,
         CAST(SUM(detr_m) AS BIGINT) AS sd,
         SUM(CAST(detr_m AS HUGEINT) * detr_m) AS sdd
  FROM comp
)
SELECT n,
       ROUND(GREATEST(CAST(0 AS DOUBLE),
             1.0 - (CAST(srr AS DOUBLE)/n - (CAST(sr AS DOUBLE)/n)
                                            *(CAST(sr AS DOUBLE)/n))
                   / (CAST(sdd AS DOUBLE)/n - (CAST(sd AS DOUBLE)/n)
                                              *(CAST(sd AS DOUBLE)/n))), 6)
         AS seasonal_strength
FROM mom
""",
    tags=("timeseries", "events", "stats"),
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL STRENGTH (the STL diagnostic F_s = max(0, 1 -
    Var(remainder)/Var(detrended))) — ONE number for 'is the weekly
    pattern real', the gate before fitting Holt-Winters at all
    (F_s ~ 0 on this fixture's synthetic events is itself the
    finding). Trend is a centered 7-day mean with FULL-window guard
    (partial edges drop rather than bias), weekday effects are
    means of the milli-quantized detrended series, and both
    variances come from exact integer moment sums of the same
    quantized lanes — the decomposition algebra of
    ts_seasonal_decompose collapsed to its quality score. One
    window pass + two grid aggs."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(cents("value")).cast("bigint").alias("y")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "y",
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.sum("y").over(w).cast("double") / 7.0,
        ).alias("trend"),
        F.dayofweek("day").alias("dow_raw"),
    ).withColumn(
        "dow", F.expr("CASE WHEN dow_raw = 1 THEN 7 ELSE dow_raw - 1 END")
    )
    det = tr.filter(F.col("trend").isNotNull()).select(
        "day", "dow", (F.col("y") - F.col("trend")).alias("detr")
    )
    sea = det.groupBy("dow").agg(
        F.sum(F.floor(F.round(F.col("detr"), 6) * 1000).cast("bigint"))
        .cast("bigint")
        .alias("s_milli"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    comp = det.join(F.broadcast(sea), "dow").select(
        F.floor(F.round(F.col("detr"), 6) * 1000).cast("bigint").alias("detr_m"),
        F.floor(
            F.round(F.col("s_milli").cast("double") / F.col("n"), 6)
        )
        .cast("bigint")
        .alias("seas_m"),
    )
    r = F.col("detr_m") - F.col("seas_m")
    mom = comp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(r).cast("bigint").alias("sr"),
        F.sum((r * r).cast("decimal(38,0)")).alias("srr"),
        F.sum("detr_m").cast("bigint").alias("sd"),
        F.sum((F.col("detr_m") * F.col("detr_m")).cast("decimal(38,0)")).alias(
            "sdd"
        ),
    )
    return mom.selectExpr(
        "n",
        "ROUND(GREATEST(CAST(0 AS DOUBLE),"
        " 1.0 - (CAST(srr AS DOUBLE)/n - (CAST(sr AS DOUBLE)/n)"
        "*(CAST(sr AS DOUBLE)/n))"
        " / (CAST(sdd AS DOUBLE)/n - (CAST(sd AS DOUBLE)/n)"
        "*(CAST(sd AS DOUBLE)/n))), 6) AS seasonal_strength",
    )


# ---------------------------------------------------------- round 9

@register(
    "stats_logrank_test",
    oracle="""
WITH firstev AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
u AS (
  SELECT e.user_id, CAST(MIN(e.ts) AS DATE) AS t0,
         CAST(MAX(e.ts) AS DATE) AS tlast,
         CAST(MIN(CASE WHEN e.event_type = 'error' THEN e.ts END) AS DATE)
           AS terr,
         MAX(CASE WHEN f.event_type = 'click' THEN 1 ELSE 0 END) AS g1
  FROM events e JOIN firstev f ON e.user_id = f.user_id AND f.rn = 1
  GROUP BY e.user_id
),
subj AS (
  SELECT date_diff('day', t0, COALESCE(terr, tlast)) AS dur,
         CASE WHEN terr IS NOT NULL THEN 1 ELSE 0 END AS observed, g1
  FROM u
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
         CAST(SUM(g1) AS BIGINT) AS n1_all
  FROM subj
),
bydur AS (
  SELECT dur, CAST(COUNT(*) AS BIGINT) AS rem,
         CAST(SUM(g1) AS BIGINT) AS rem1,
         CAST(SUM(observed) AS BIGINT) AS d,
         CAST(SUM(observed * g1) AS BIGINT) AS d1
  FROM subj GROUP BY dur
),
risk AS (
  SELECT dur, d, d1,
         (SELECT n_all FROM tot)
           - COALESCE(SUM(rem) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_t,
         (SELECT n1_all FROM tot)
           - COALESCE(SUM(rem1) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1_t
  FROM bydur
),
terms AS (
  SELECT d, d1,
         CAST(FLOOR(ROUND(CAST(d AS DOUBLE) * n1_t / n_t, 12)
                    * 1000000000.0) AS BIGINT) AS e_q,
         CAST(FLOOR(ROUND(CAST(d AS DOUBLE) * (CAST(n1_t AS DOUBLE) / n_t)
                    * (1.0 - CAST(n1_t AS DOUBLE) / n_t)
                    * (CAST(n_t - d AS DOUBLE) / (CAST(n_t AS DOUBLE) - 1.0)),
                    12) * 1000000000.0) AS BIGINT) AS v_q
  FROM risk WHERE d >= 1 AND n_t >= 2
),
lanes AS (
  SELECT CAST(SUM(d1) AS BIGINT) AS o1,
         CAST(SUM(e_q) AS BIGINT) AS e1_q,
         CAST(SUM(v_q) AS BIGINT) AS v_q
  FROM terms
)
SELECT (SELECT n1_all FROM tot) AS n1_subjects,
       (SELECT n_all FROM tot) AS n_subjects,
       o1,
       ROUND(CAST(e1_q AS DOUBLE) / 1000000000.0, 6) AS e1,
       ROUND((CAST(o1 AS DOUBLE) - CAST(e1_q AS DOUBLE) / 1000000000.0)
             * (CAST(o1 AS DOUBLE) - CAST(e1_q AS DOUBLE) / 1000000000.0)
             / (CAST(v_q AS DOUBLE) / 1000000000.0), 6) AS chi2
FROM lanes
""",
    tags=("stats", "timeseries"),
)
def stats_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG-RANK (Mantel-Cox) TEST — the censoring-correct two-group
    survival comparison that completes stats_survival_km: does
    time-to-first-error differ between users whose FIRST event was a
    click and everyone else? At each distinct event time the
    observed group-1 deaths d1_t are compared with the
    hypergeometric expectation E1_t = d_t * n1_t/n_t and variance
    V_t = d_t (n1_t/n_t)(1-n1_t/n_t)(n_t-d_t)/(n_t-1); chi2 =
    (O1-E1)^2/V ~ chi2(1) under H0. Risk sets n_t, n1_t come from
    TWO exclusive cumsums over the same day-grid window (grid <=
    max-duration rows — the same bounded day-index fold
    stats_survival_km uses); each per-time E and V term is
    guard-rounded and nano-quantized before the order-free exact
    sum. Scale: per-user span aggregate (one shuffle on user_id) +
    a broadcast 1-row total; only the grid walks the window."""
    ev = table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (
        ev.select(
            "user_id",
            "event_type",
            F.row_number().over(w_first).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g1"),
        )
    )
    u = (
        ev.groupBy("user_id")
        .agg(
            F.min("ts").cast("date").alias("t0"),
            F.max("ts").cast("date").alias("tlast"),
            F.min(F.when(F.col("event_type") == "error", F.col("ts")))
            .cast("date")
            .alias("terr"),
        )
        .join(first, "user_id")
    )
    subj = u.select(
        F.datediff(F.coalesce("terr", "tlast"), F.col("t0")).alias("dur"),
        F.when(F.col("terr").isNotNull(), 1).otherwise(0).alias("observed"),
        "g1",
    )
    tot = subj.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum("g1").cast("bigint").alias("n1_all"),
    )
    bydur = subj.groupBy("dur").agg(
        F.count(F.lit(1)).cast("bigint").alias("rem"),
        F.sum("g1").cast("bigint").alias("rem1"),
        F.sum("observed").cast("bigint").alias("d"),
        F.sum(F.col("observed") * F.col("g1")).cast("bigint").alias("d1"),
    )
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        bydur.crossJoin(F.broadcast(tot))
        .select(
            "dur",
            "d",
            "d1",
            "n_all",
            "n1_all",
            (
                F.col("n_all")
                - F.coalesce(F.sum("rem").over(w_prev), F.lit(0))
            ).alias("n_t"),
            (
                F.col("n1_all")
                - F.coalesce(F.sum("rem1").over(w_prev), F.lit(0))
            ).alias("n1_t"),
        )
        .filter((F.col("d") >= 1) & (F.col("n_t") >= 2))
    )
    frac = F.col("n1_t").cast("double") / F.col("n_t")
    e_term = F.col("d").cast("double") * F.col("n1_t") / F.col("n_t")
    v_term = (
        F.col("d").cast("double")
        * frac
        * (1.0 - frac)
        * ((F.col("n_t") - F.col("d")).cast("double")
           / (F.col("n_t").cast("double") - 1.0))
    )
    # subject totals ride in via the 1-row broadcast `tot`, NOT as
    # MAX over the (d>=1 AND n_t>=2)-filtered risk rows: if that
    # filter ever leaves zero rows the MAXes would go NULL while the
    # oracle's scalar subqueries still return the real counts
    # (ADVICE r9 #6 — the stats_fisher_exact pattern).
    lanes = risk.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum(F.floor(F.round(e_term, 12) * 1e9).cast("bigint"))
        .cast("bigint")
        .alias("e1_q"),
        F.sum(F.floor(F.round(v_term, 12) * 1e9).cast("bigint"))
        .cast("bigint")
        .alias("v_q"),
    ).crossJoin(F.broadcast(tot))
    diff = F.col("o1").cast("double") - F.col("e1_q").cast("double") / 1e9
    return lanes.select(
        F.col("n1_all").alias("n1_subjects"),
        F.col("n_all").alias("n_subjects"),
        "o1",
        F.round(F.col("e1_q").cast("double") / 1e9, 6).alias("e1"),
        F.round(diff * diff / (F.col("v_q").cast("double") / 1e9), 6).alias(
            "chi2"
        ),
    )


# ERR@10 rank-r scale factors: 16^(10-r) * (2520/r) — the common
# denominator 16^10 * 2520 clears every 1/16^r and 1/r exactly, so
# each cascade term is a BIGINT (max ~2.6e15, sum ~3e16: safe).
_ERR_MUL = {
    r: (16 ** (10 - r)) * (2520 // r) for r in range(1, 11)
}
_ERR_DENOM = float((16 ** 10) * 2520)
_ERR_MUL_SQL = (
    "CASE pos "
    + " ".join(f"WHEN {r} THEN CAST({m} AS BIGINT)" for r, m in _ERR_MUL.items())
    + " END"
)


@register(
    "rank_err_cascade",
    oracle=f"""
WITH rel AS (
  SELECT l_orderkey AS okey,
         LEAST(CAST(COUNT(*) AS BIGINT), 4) AS rel
  FROM lineitem GROUP BY okey
),
ranked AS (
  SELECT o.o_custkey,
         ((1::BIGINT << r.rel) - 1) AS g,
         ROW_NUMBER() OVER (PARTITION BY o.o_custkey
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS pos
  FROM orders o JOIN rel r ON o.o_orderkey = r.okey
),
cascade AS (
  SELECT o_custkey, g, pos,
         CAST(COALESCE(PRODUCT(16 - g) OVER (
           PARTITION BY o_custkey ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 1.0) AS BIGINT) AS num_prev
  FROM ranked WHERE pos <= 10
)
SELECT o_custkey AS user_key,
       CAST(COUNT(*) AS BIGINT) AS n_ranked,
       CAST(SUM(g * num_prev * ({_ERR_MUL_SQL})) AS BIGINT) AS err_q,
       ROUND(CAST(SUM(g * num_prev * ({_ERR_MUL_SQL})) AS DOUBLE)
             / {_ERR_DENOM!r}, 9) AS err10
FROM cascade GROUP BY o_custkey
""",
)
def rank_err_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPECTED RECIPROCAL RANK (ERR@10) — the cascade-model ranking
    metric (Chapelle et al., CIKM 2009): a user scans down the list
    and stops at position r with probability R_r * prod_{i<r}(1-R_i),
    contributing 1/r; unlike NDCG's position discount, a highly
    relevant hit ABSORBS attention and devalues everything below it.
    Same deterministic surrogate task as rank_ndcg_at_k (system
    ranking by o_totalprice, graded relevance = lineitem count capped
    at 4, R = (2^rel - 1)/16). Exactness: with R's denominator pinned
    at 16 and depth at 10, every term is a RATIONAL with denominator
    16^r * r — multiplying by 16^(10-r) * (2520/r) (a 10-entry
    literal table shared by both engines) clears all of them, so
    ERR's numerator is an exact BIGINT sum; the cascade product
    prod(16-g_i) is a windowed PRODUCT over <= 9 small integers
    (max 15^9 ~ 3.8e10 — exact in the double accumulator on both
    engines, cast back to BIGINT). Scale: one row_number window and
    one product window sharing the same user-key partition, then a
    partial+final agg — per-user state is top-10-sized, so 100 TB of
    rankings shard cleanly."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    rel = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.least(F.count(F.lit(1)).cast("bigint"), F.lit(4).cast("bigint")).alias(
            "rel"
        )
    )
    j = o.join(rel, o.o_orderkey == rel.okey)
    w_sys = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    gain = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(rel AS INT))") - 1
    ranked = j.select(
        "o_custkey",
        gain.alias("g"),
        F.row_number().over(w_sys).alias("pos"),
    ).filter(F.col("pos") <= 10)
    w_casc = (
        Window.partitionBy("o_custkey")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cascade = ranked.select(
        "o_custkey",
        "g",
        "pos",
        F.coalesce(F.product(16 - F.col("g")).over(w_casc), F.lit(1.0))
        .cast("bigint")
        .alias("num_prev"),
    )
    mul = F.lit(0).cast("bigint")
    for r, m in _ERR_MUL.items():
        mul = F.when(F.col("pos") == r, F.lit(m).cast("bigint")).otherwise(mul)
    err_q = F.sum(F.col("g") * F.col("num_prev") * mul).cast("bigint")
    return cascade.groupBy(F.col("o_custkey").alias("user_key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ranked"),
        err_q.alias("err_q"),
        F.round(err_q.cast("double") / F.lit(_ERR_DENOM), 9).alias("err10"),
    )


@register(
    "win_max_subarray_kadane",
    oracle="""
WITH cell AS (
  SELECT p.p_brand AS brand, date_trunc('month', o.o_orderdate) AS m,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                  * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT)))
              AS BIGINT) AS rev_c
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY brand, m
),
scaled AS (
  SELECT brand, m, rev_c,
         CAST(COUNT(*) OVER (PARTITION BY brand) AS BIGINT) AS nm,
         rev_c * CAST(COUNT(*) OVER (PARTITION BY brand) AS BIGINT)
           - CAST(SUM(rev_c) OVER (PARTITION BY brand) AS BIGINT) AS v
  FROM cell
),
pfx0 AS (
  SELECT brand, m, nm,
         SUM(v) OVER (PARTITION BY brand ORDER BY m
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx
  FROM scaled
),
pfx AS (
  SELECT brand, m, nm, pfx,
         COALESCE(MIN(pfx) OVER (PARTITION BY brand ORDER BY m
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS min_prev
  FROM pfx0
),
best AS (
  SELECT brand, m, nm,
         pfx - LEAST(CAST(0 AS BIGINT), min_prev) AS run_v,
         ROW_NUMBER() OVER (PARTITION BY brand
           ORDER BY pfx - LEAST(CAST(0 AS BIGINT), min_prev) DESC, m) AS rn
  FROM pfx
)
SELECT brand, CAST(nm AS BIGINT) AS n_months,
       ROUND(CAST(run_v AS DOUBLE) / CAST(nm AS DOUBLE) / 10000.0, 6)
         AS best_run_sum,
       m AS best_end_month
FROM best WHERE rn = 1
""",
)
def win_max_subarray_kadane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMUM-SUBARRAY (Kadane's problem) per brand — 'which
    consecutive month run beat the brand's own average hardest?':
    the classic O(n) DP, re-expressed for a distributed engine as
    PURE PREFIX ALGEBRA: max over t of (prefix_t - min(0,
    min_{t'<t} prefix_t')) equals the best subarray sum, so two
    per-brand window passes (running sum, running min of it)
    replace the sequential fold — no recursion, no UDF. Values are
    the brand's monthly revenue CENTERED on its own mean, kept
    exact by scaling through the month count: v = rev_c*nm - tot_c
    is an exact BIGINT (envelope: |v| < nm * tot_c ~ 1e17 at
    sf100-month grain — inside int64), and the single double
    division happens only in the output. End month breaks ties.
    Scale: one fact aggregate onto (brand x month) cells, then
    brand-partitioned windows over calendar-grain rows."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part")
    rev = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    cell = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_trunc("month", F.col("o_orderdate")).alias("m"),
        )
        .agg(F.sum(rev).cast("bigint").alias("rev_c"))
    )
    w_brand = Window.partitionBy("brand")
    scaled = cell.select(
        "brand",
        "m",
        F.count(F.lit(1)).over(w_brand).cast("bigint").alias("nm"),
        (
            F.col("rev_c") * F.count(F.lit(1)).over(w_brand).cast("bigint")
            - F.sum("rev_c").over(w_brand).cast("bigint")
        ).alias("v"),
    )
    w_run = (
        Window.partitionBy("brand")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pfx = scaled.select(
        "brand", "m", "nm", F.sum("v").over(w_run).alias("pfx")
    )
    w_prev = (
        Window.partitionBy("brand")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pfx = pfx.withColumn(
        "min_prev", F.coalesce(F.min("pfx").over(w_prev), F.lit(0).cast("bigint"))
    )
    run_v = F.col("pfx") - F.least(F.lit(0).cast("bigint"), F.col("min_prev"))
    w_best = Window.partitionBy("brand").orderBy(
        run_v.desc(), F.col("m").asc()
    )
    best = pfx.select(
        "brand",
        "m",
        "nm",
        run_v.alias("run_v"),
        F.row_number().over(w_best).alias("rn"),
    ).filter(F.col("rn") == 1)
    return best.select(
        "brand",
        F.col("nm").cast("bigint").alias("n_months"),
        F.round(
            F.col("run_v").cast("double") / F.col("nm").cast("double") / 10000.0,
            6,
        ).alias("best_run_sum"),
        F.col("m").alias("best_end_month"),
    )


@register(
    "obs_error_budget_burn",
    oracle="""
WITH hourly AS (
  SELECT event_type AS service, date_trunc('hour', ts) AS hb,
         CAST(FLOOR(epoch(date_trunc('hour', ts)) / 3600.0) AS BIGINT) AS hidx,
         CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN value > 250.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_err
  FROM events GROUP BY service, hb, hidx
),
rolled AS (
  SELECT service, hb, n_total, n_err,
         SUM(n_total) OVER (PARTITION BY service ORDER BY hidx
           RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS tot6,
         SUM(n_err) OVER (PARTITION BY service ORDER BY hidx
           RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS err6
  FROM hourly
)
SELECT service, hb, n_total, n_err,
       ROUND(CAST(n_err AS DOUBLE) / CAST(n_total AS DOUBLE) / 0.05, 6)
         AS burn_1h,
       ROUND(CAST(err6 AS DOUBLE) / CAST(tot6 AS DOUBLE) / 0.05, 6) AS burn_6h,
       (CAST(n_err AS DOUBLE) / CAST(n_total AS DOUBLE) / 0.05 > 14.4
        AND CAST(err6 AS DOUBLE) / CAST(tot6 AS DOUBLE) / 0.05 > 6.0) AS page
FROM rolled
""",
)
def obs_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO ERROR-BUDGET BURN RATE with multiwindow alerting (the
    Google SRE Workbook ch.5 policy): for a 95% latency SLO
    (value <= 250 is in-SLO) the budget is 5%, burn =
    violation_rate / budget, and a page fires only when BOTH the
    fast window (1h, threshold 14.4 = exhausting a 30d budget in
    ~2d) and the slow window (6h, threshold 6) burn hot — the
    two-window AND is what kills flapping alerts. Burn is evaluated
    PER SERVICE (event_type), which is both the real production
    shape (an SLO belongs to a service) and the scale shape: the
    rolling 6h side is a RANGE frame over the epoch-hour index
    partitioned by service, so traffic gaps are handled by time and
    no window ever crosses service shards. Counts are exact
    integers; the burn ratios are single double divisions rounded
    at 6dp. Scale: one hash-agg onto (service x hour), then a
    service-partitioned window — 100 TB of request logs never
    funnels through one task."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.col("event_type").alias("service"),
        F.date_trunc("hour", F.col("ts")).alias("hb"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(F.when(F.col("value") > 250.0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_err"),
    ).withColumn(
        "hidx",
        F.floor(F.unix_timestamp("hb").cast("double") / 3600.0).cast("bigint"),
    )
    w6 = Window.partitionBy("service").orderBy("hidx").rangeBetween(-5, 0)
    rolled = hourly.select(
        "service",
        "hb",
        "n_total",
        "n_err",
        F.sum("n_total").over(w6).alias("tot6"),
        F.sum("n_err").over(w6).alias("err6"),
    )
    burn1 = F.col("n_err").cast("double") / F.col("n_total").cast("double") / 0.05
    burn6 = F.col("err6").cast("double") / F.col("tot6").cast("double") / 0.05
    return rolled.select(
        "service",
        "hb",
        "n_total",
        "n_err",
        F.round(burn1, 6).alias("burn_1h"),
        F.round(burn6, 6).alias("burn_6h"),
        ((burn1 > 14.4) & (burn6 > 6.0)).alias("page"),
    )


@register(
    "win_ulcer_index",
    oracle="""
WITH cell AS (
  SELECT p.p_brand AS brand, date_trunc('month', o.o_orderdate) AS m,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                  * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT)))
              AS BIGINT) AS rev_c
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY brand, m
),
dd AS (
  SELECT brand, m, rev_c,
         MAX(rev_c) OVER (PARTITION BY brand ORDER BY m
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_c
  FROM cell
),
lanes AS (
  SELECT brand,
         CAST(COUNT(*) AS BIGINT) AS n_months,
         CAST(SUM(CAST(FLOOR(ROUND(
           (100.0 * CAST(peak_c - rev_c AS DOUBLE) / CAST(peak_c AS DOUBLE))
           * (100.0 * CAST(peak_c - rev_c AS DOUBLE) / CAST(peak_c AS DOUBLE)),
           12) * 1000000000.0) AS BIGINT)) AS BIGINT) AS dd2_q,
         ROUND(MAX(100.0 * CAST(peak_c - rev_c AS DOUBLE)
                   / CAST(peak_c AS DOUBLE)), 6) AS max_drawdown_pct
  FROM dd GROUP BY brand
)
SELECT brand, n_months,
       ROUND(SQRT(CAST(dd2_q AS DOUBLE) / 1000000000.0
                  / CAST(n_months AS DOUBLE)), 6) AS ulcer_index,
       max_drawdown_pct
FROM lanes
""",
)
def win_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ULCER INDEX (Martin & McCann) per brand — the downside-risk
    measure win_drawdown_max can't give you: UI = sqrt(mean of
    squared percentage drawdowns from the running peak), so it
    weights both DEPTH and DURATION of underwater stretches (a
    brand that dips 30% for six months hurts more than a one-month
    spike of the same depth — max-drawdown sees them as equal).
    Monthly revenue in exact cents lanes; the running peak is an
    exact BIGINT window max; each squared-drawdown double term is
    guard-rounded and nano-quantized before the order-free exact
    sum, sqrt and rounding only at the output. Scale: one fact
    aggregate onto (brand x month) cells, then a brand-partitioned
    window over calendar-grain rows."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part")
    rev = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    cell = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_trunc("month", F.col("o_orderdate")).alias("m"),
        )
        .agg(F.sum(rev).cast("bigint").alias("rev_c"))
    )
    w_peak = (
        Window.partitionBy("brand")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = cell.select(
        "brand",
        "rev_c",
        F.max("rev_c").over(w_peak).alias("peak_c"),
    )
    dd_pct = (
        100.0
        * (F.col("peak_c") - F.col("rev_c")).cast("double")
        / F.col("peak_c").cast("double")
    )
    lanes = dd.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.sum(F.floor(F.round(dd_pct * dd_pct, 12) * 1e9).cast("bigint"))
        .cast("bigint")
        .alias("dd2_q"),
        F.round(F.max(dd_pct), 6).alias("max_drawdown_pct"),
    )
    return lanes.select(
        "brand",
        "n_months",
        F.round(
            F.sqrt(
                F.col("dd2_q").cast("double")
                / 1e9
                / F.col("n_months").cast("double")
            ),
            6,
        ).alias("ulcer_index"),
        "max_drawdown_pct",
    )


@register(
    "ts_matrix_profile_motif",
    oracle="""
WITH wk AS (
  SELECT date_trunc('week', o_orderdate) AS w,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY w
),
idx AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY w) - 1 AS i FROM wk
),
subseq AS (
  SELECT a0.i,
         [a0.cnt, a1.cnt, a2.cnt, a3.cnt] AS v
  FROM idx a0
  JOIN idx a1 ON a1.i = a0.i + 1
  JOIN idx a2 ON a2.i = a0.i + 2
  JOIN idx a3 ON a3.i = a0.i + 3
),
pairs AS (
  SELECT a.i AS i, b.i AS j,
         CAST((a.v[1]-b.v[1])*(a.v[1]-b.v[1]) + (a.v[2]-b.v[2])*(a.v[2]-b.v[2])
            + (a.v[3]-b.v[3])*(a.v[3]-b.v[3]) + (a.v[4]-b.v[4])*(a.v[4]-b.v[4])
            AS BIGINT) AS dist2
  FROM subseq a JOIN subseq b ON b.i >= a.i + 4
),
ranked AS (
  SELECT i, j, dist2,
         ROW_NUMBER() OVER (ORDER BY dist2, i, j) AS rn
  FROM pairs
)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, dist2,
       CAST(rn AS BIGINT) AS motif_rank
FROM ranked WHERE rn <= 5
""",
    tags=("timeseries",),
)
def ts_matrix_profile_motif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRIX-PROFILE MOTIF DISCOVERY (Yeh et al., ICDM 2016 — the
    MP's top-k motif query): find the most similar pair of
    non-overlapping length-4 subsequences in the weekly order-count
    series, i.e. the recurring demand shape. The profile is
    all-pairs subsequence distance with the trivial-match EXCLUSION
    ZONE (j >= i+4, so a window never matches its own overlap);
    distances are UN-normalized Euclidean on exact integer counts —
    every dist2 is an exact BIGINT, the ranking is total (tie:
    i, j), and no float enters at all. The subsequence table is
    built by 3 self-equi-joins on the week index (a shifted-key
    join, NOT a window collect — each join is a broadcast-size
    calendar-grain relation). The pair grid is quadratic BY
    CONTRACT (the matrix profile is defined over all pairs) on the
    calendar-grain axis: ~350 weeks -> 60k pairs at any corpus
    volume, because adding rows fattens the counts, not the grid.
    Scale: one corpus-grain hash-agg to weeks; everything after is
    grid-sized."""
    o = table(spark, sf_dir, "orders")
    wk = o.groupBy(F.date_trunc("week", F.col("o_orderdate")).alias("w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    idx = wk.select(
        "cnt", (F.row_number().over(Window.orderBy("w")) - 1).alias("i")
    )
    a0 = idx.select(F.col("i"), F.col("cnt").alias("c0"))
    sub = a0
    for t in (1, 2, 3):
        nxt = idx.select(
            (F.col("i") - t).alias(f"i{t}"), F.col("cnt").alias(f"c{t}")
        )
        sub = sub.join(nxt, sub.i == F.col(f"i{t}")).drop(f"i{t}")
    a = sub.select(
        F.col("i").alias("ai"), *[F.col(f"c{t}").alias(f"a{t}") for t in range(4)]
    )
    b = sub.select(
        F.col("i").alias("bi"), *[F.col(f"c{t}").alias(f"b{t}") for t in range(4)]
    )
    d2 = sum(
        (F.col(f"a{t}") - F.col(f"b{t}")) * (F.col(f"a{t}") - F.col(f"b{t}"))
        for t in range(4)
    )
    pairs = a.join(b, F.col("bi") >= F.col("ai") + 4).select(
        F.col("ai").alias("i"),
        F.col("bi").alias("j"),
        d2.cast("bigint").alias("dist2"),
    )
    # top-5 via sort+limit (TakeOrderedAndProject — no global window
    # over the pair grid); the rank label is a window over 5 rows.
    top = pairs.orderBy("dist2", "i", "j").limit(5)
    return top.select(
        F.col("i").cast("bigint").alias("i"),
        F.col("j").cast("bigint").alias("j"),
        "dist2",
        F.row_number()
        .over(Window.orderBy("dist2", "i", "j"))
        .cast("bigint")
        .alias("motif_rank"),
    )


@register(
    "ts_ohlc_bars",
    oracle="""
WITH t AS (
  SELECT l_partkey % 50 AS symbol,
         CAST(strftime(l_shipdate, '%Y-%m') AS VARCHAR) AS bar_month,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS px,
         CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           * 10000000000000
           + l_orderkey * 10 + l_linenumber AS ord,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
)
SELECT CAST(symbol AS BIGINT) AS symbol, bar_month,
       CAST(arg_min(px, ord) AS BIGINT) AS open_c,
       CAST(MAX(px) AS BIGINT) AS high_c,
       CAST(MIN(px) AS BIGINT) AS low_c,
       CAST(arg_max(px, ord) AS BIGINT) AS close_c,
       CAST(SUM(qty) AS BIGINT) AS volume,
       CAST(COUNT(*) AS BIGINT) AS n_trades
FROM t GROUP BY symbol, bar_month
""",
    tags=("timeseries",),
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC CANDLESTICK RESAMPLE — the tick->bar downsample every
    market-data / metrics store runs (kdb xbar, InfluxDB aggregate
    windows, TimescaleDB time_bucket + first/last): per (symbol,
    month), the OPEN (first price in event order), HIGH, LOW, CLOSE
    (last price), volume and trade count. First/last are NOT
    order-by-value aggregates — they need the EVENT-TIME total
    order, expressed engine-portably as min_by/max_by over a
    deterministic BIGINT ordinal (shipdate-days * 1e13 + orderkey*10
    + linenumber: unique per line, collision-free to sf100's 6e9
    keys). This is the shape that REPLACES a per-symbol window sort
    at scale: one partial+final hash aggregate — min_by/max_by
    combine associatively on partials, so 100 TB of ticks reduce
    map-side without ever materializing a sorted window. Money in
    exact BIGINT cents."""
    li = table(spark, sf_dir, "lineitem")
    t = li.select(
        (F.col("l_partkey") % 50).cast("bigint").alias("symbol"),
        F.date_format("l_shipdate", "yyyy-MM").alias("bar_month"),
        cents("l_extendedprice").alias("px"),
        (
            F.unix_date(F.col("l_shipdate").cast("date")).cast("bigint")
            * F.lit(10000000000000).cast("bigint")
            + F.col("l_orderkey") * 10
            + F.col("l_linenumber")
        ).alias("ord"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    return t.groupBy("symbol", "bar_month").agg(
        F.min_by("px", "ord").cast("bigint").alias("open_c"),
        F.max("px").cast("bigint").alias("high_c"),
        F.min("px").cast("bigint").alias("low_c"),
        F.max_by("px", "ord").cast("bigint").alias("close_c"),
        F.sum("qty").cast("bigint").alias("volume"),
        F.count(F.lit(1)).cast("bigint").alias("n_trades"),
    )


@register(
    "ts_theta_method",
    oracle="""
WITH m AS (
  SELECT l_returnflag AS flag,
         CAST(date_part('year', l_shipdate) * 12
              + date_part('month', l_shipdate) AS BIGINT) AS ym,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY flag, ym
),
idx AS (
  SELECT flag, ym, CAST(cents AS DOUBLE) / 100.0 AS x,
         ym - MIN(ym) OVER (PARTITION BY flag) + 1 AS t
  FROM m
),
ols AS (
  SELECT flag,
         CAST(COUNT(*) AS BIGINT) AS n_pts,
         CAST(MAX(t) AS BIGINT) AS t_max,
         (SUM(t * x) - SUM(t) * SUM(x) / COUNT(*))
           / (SUM(t * t) - SUM(t) * SUM(t) / COUNT(*)) AS b,
         SUM(x) / COUNT(*)
           - (SUM(t * x) - SUM(t) * SUM(x) / COUNT(*))
             / (SUM(t * t) - SUM(t) * SUM(t) / COUNT(*))
             * SUM(t) / COUNT(*) AS a
  FROM idx GROUP BY flag
),
theta AS (
  SELECT i.flag, i.t, o.t_max, o.a, o.b, o.n_pts,
         2.0 * i.x - (o.a + o.b * i.t) AS y
  FROM idx i JOIN ols o ON o.flag = i.flag
),
ses AS (
  SELECT flag,
         SUM(CASE WHEN t = 1 THEN power(0.5, t_max - 1) * y
                  ELSE 0.5 * power(0.5, t_max - t) * y END) AS s
  FROM theta GROUP BY flag
)
SELECT o.flag, o.n_pts,
       ROUND(o.a, 6) AS trend_a,
       ROUND(o.b, 6) AS trend_b,
       ROUND(s.s, 6) AS ses_theta,
       ROUND(0.5 * s.s + 0.5 * (o.a + o.b * (o.t_max + 1)), 6)
         AS forecast_1
FROM ols o JOIN ses s ON s.flag = o.flag
""",
    tags=("timeseries",),
)
def ts_theta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THETA-METHOD FORECAST (Assimakopoulos & Nikolopoulos 2000) —
    the M3-competition-winning decomposition: split the series into
    theta-lines, here the classic pair theta=0 (the OLS linear
    trend, pure long-run signal) and theta=2 (2x - trend, the
    curvature-doubled residual line), forecast the first by
    extrapolation and the second by SES, and average. The SES
    recursion is flattened to its CLOSED FORM — s_T =
    sum_i w_i y_i with w_i = alpha(1-alpha)^(T-i) (the t=1 term
    keeps the (1-alpha)^(T-1) seed weight) — and alpha is pinned at
    0.5 so every weight is an EXACT dyadic power: multiplying a
    double by 2^-k is lossless, leaving only the order-insensitive
    final SUM, rounded at 1e-6 on both engines. Time is a monthly
    grain (year*12+month, gap-tolerant month distance, not row
    position). Scale: the fact scan collapses to (flag, month) in
    one partial+final aggregate (~84 points per flag at ANY corpus
    size); OLS moments and the SES sum are second-stage aggregates
    on that bounded grain — no per-row window over the fact."""
    li = table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        (
            F.year(F.col("l_shipdate").cast("date")) * 12
            + F.month(F.col("l_shipdate").cast("date"))
        )
        .cast("bigint")
        .alias("ym"),
    ).agg(dec_sum(cents("l_extendedprice")).alias("cents"))
    wmin = Window.partitionBy("flag")
    idx = m.select(
        "flag",
        (F.col("cents").cast("double") / 100.0).alias("x"),
        (F.col("ym") - F.min("ym").over(wmin) + 1).alias("t"),
    )
    t, x = F.col("t"), F.col("x")
    n = F.count(F.lit(1))
    b_num = F.sum(t * x) - F.sum(t) * F.sum(x) / n
    b_den = F.sum(t * t) - F.sum(t) * F.sum(t) / n
    ols = idx.groupBy("flag").agg(
        n.cast("bigint").alias("n_pts"),
        F.max("t").cast("bigint").alias("t_max"),
        (b_num / b_den).alias("b"),
        (F.sum(x) / n - (b_num / b_den) * F.sum(t) / n).alias("a"),
    )
    theta = idx.join(F.broadcast(ols), "flag").select(
        "flag",
        "t",
        "t_max",
        (2.0 * x - (F.col("a") + F.col("b") * t)).alias("y"),
    )
    ses = theta.groupBy("flag").agg(
        F.sum(
            F.when(
                t == 1,
                F.pow(F.lit(0.5), F.col("t_max") - 1) * F.col("y"),
            ).otherwise(
                0.5 * F.pow(F.lit(0.5), F.col("t_max") - t) * F.col("y")
            )
        ).alias("s")
    )
    return ols.join(ses, "flag").select(
        "flag",
        "n_pts",
        F.round("a", 6).alias("trend_a"),
        F.round("b", 6).alias("trend_b"),
        F.round("s", 6).alias("ses_theta"),
        F.round(
            0.5 * F.col("s")
            + 0.5 * (F.col("a") + F.col("b") * (F.col("t_max") + 1)),
            6,
        ).alias("forecast_1"),
    )

"""As-of join — a composed operator Spark has no native strategy for.

Implementation: union-tag + running `last(ignorenulls)` window.
Left and right rows are unioned with a tag, sorted within each key
partition by (ts, tag) — right rows sort before left rows at equal
timestamps so the match condition is `right.ts <= left.ts` — and each
left row picks up the most recent right payload via
``last(..., ignorenulls=True)`` over an unbounded-preceding frame.

Scale: this is ONE shuffle (hash partition by key) + ONE sort — the
same cost as a single sort-merge join, with no post-join explosion.
The naive alternative (range join + row_number) shuffles both sides
AND materializes every candidate pair before pruning; on 100 TB of
events that intermediate is quadratic in events-per-key. The union
approach is linear and AQE-friendly. Isolated here so a future custom
physical strategy could replace it without touching call sites.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: dict[str, str],
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the payload of the closest right row
    within the ``on`` keys: the latest with ``right_ts <= left_ts``
    (direction="backward", default) or the earliest with
    ``right_ts >= left_ts`` (direction="forward" — same plan, the
    scan order is just reversed).

    right_payload maps right column -> output alias (aliases must not
    collide with left columns). ``tiebreak``: a right column that makes
    (on, right_ts, tiebreak) unique, so equal-timestamp right rows
    resolve deterministically (highest tiebreak wins).
    """
    lhs = left.withColumn(_TAG, F.lit(1)).withColumn("__asof_ts", F.col(left_ts))
    rhs = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_TAG),
        *[F.col(src).alias(dst) for src, dst in right_payload.items()],
    )
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(lhs.dtypes)[c]))
    for c in rhs.columns:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None).cast(dict(rhs.dtypes)[c]))

    ts_order = (
        F.col("__asof_ts").asc() if direction == "backward" else F.col("__asof_ts").desc()
    )
    order: list[Column] = [ts_order, F.col(_TAG).asc()]
    if tiebreak is not None:
        # among right rows at the same ts, the highest tiebreak wins
        order.append(F.col(right_payload.get(tiebreak, tiebreak)).asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lhs.unionByName(rhs.select(*lhs.columns))
    for dst in right_payload.values():
        merged = merged.withColumn(dst, F.last(dst, ignorenulls=True).over(w))
    return merged.filter(F.col(_TAG) == 1).drop(_TAG, "__asof_ts")

"""Hypertable-style hierarchical time rollup (continuous-aggregate
cascade).

The reference concept: a time-partitioned event table ("hypertable")
with pre-aggregated rollups at several grains (hour -> day -> ...).
The scale-critical property is that the raw table is scanned ONCE, at
the finest grain; every coarser grain re-aggregates the previous
grain's partials, which are orders of magnitude smaller. At 100 TB
the hourly aggregate of an events table is ~10^4-10^6 rows — the
day/week cascade above it is driver-trivial, so total cost is one
scan + one shuffle on (finest_bucket, keys) + negligible follow-ups.

Only algebraic aggregates participate (count, sum, min, max — things
whose partials re-aggregate exactly). That restriction is what makes
the cascade exact: sum-of-hourly-sums == daily sum, bit-for-bit when
sums are integer (use the cents helpers for money doubles).

Spark mapping: ``date_trunc(grain, ts)`` + groupBy per level; the
levels are UNION ALLed with a ``grain`` label column (same shape as a
GROUPING SETS result, but each coarser set is computed from the finer
one instead of from the raw scan — GROUPING SETS re-expands the raw
rows per set, this cascade does not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hierarchical_rollup"]

# grain name -> re-aggregation of the partial columns produced by the
# finest-level aggregation (all algebraic).
_REAGG = {
    "n": lambda c: F.sum(c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}


def hierarchical_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
    grains: list[str],
) -> DataFrame:
    """Cascaded time rollup.

    ``measures`` maps output column -> (kind, input expr) where kind is
    one of n/sum/min/max ("n" ignores the expr and counts rows).
    ``grains`` is finest-first, e.g. ``["hour", "day"]`` — each must be
    a valid ``date_trunc`` unit, and each coarser grain is derived from
    the level before it, never from ``df``.

    Output: one row per (grain, bucket, *keys) with a ``grain`` string
    column and ``bucket`` timestamp column, all grains unioned.
    """
    if not grains:
        raise ValueError("need at least one grain")

    finest = grains[0]
    base_aggs = []
    for out, (kind, expr) in measures.items():
        if kind == "n":
            base_aggs.append(F.count(F.lit(1)).alias(out))
        elif kind in ("sum", "min", "max"):
            base_aggs.append(getattr(F, kind)(F.expr(expr)).alias(out))
        else:
            raise ValueError(f"non-algebraic measure kind: {kind}")

    level = (
        df.withColumn("bucket", F.date_trunc(finest, F.col(ts_col)))
        .groupBy("bucket", *keys)
        .agg(*base_aggs)
    )

    out_cols = ["grain", "bucket", *keys, *measures.keys()]
    levels = [level.withColumn("grain", F.lit(finest)).select(*out_cols)]

    for grain in grains[1:]:
        reaggs = [
            _REAGG[kind](F.col(out)).alias(out)
            for out, (kind, _) in measures.items()
        ]
        level = (
            level.withColumn("bucket", F.date_trunc(grain, F.col("bucket")))
            .groupBy("bucket", *keys)
            .agg(*reaggs)
        )
        levels.append(level.withColumn("grain", F.lit(grain)).select(*out_cols))

    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out

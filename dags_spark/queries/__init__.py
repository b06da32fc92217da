"""Query modules — one per SURVEY.md §2 section.

Importing a module registers its queries in dags_spark.registry.
Shared cross-engine determinism helpers live here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table

__all__ = [
    "table",
    "F",
    "cents",
    "dec_sum",
    "dec_avg",
    "SQL_CENTS",
    "SQL_DEC_SUM",
    "SQL_DEC_AVG",
]


# --- exact double aggregation (determinism rule 2) -------------------
# Money/value doubles in the fixtures are exact 2-decimal values.
# Summing them as scaled BIGINT ("cents") is exact, order-independent,
# AND stays on the fast integer whole-stage-codegen path — measured 4x
# faster than SUM(DECIMAL) at sf0.1. The final  sum_cents / 10^s  is a
# single correctly-rounded double division, so Spark and DuckDB agree
# bit-for-bit (both produce the nearest double to the same exact
# rational — identical to casting an exact DECIMAL sum to DOUBLE).
#
# Overflow envelope: per-row |value|*10^2 <= ~10^7, so int64 holds
# ~9*10^11 rows per group at scale 2 and ~2*10^10 rows per group for
# the scale-6 product sums (price*disc*tax) — comfortable for the
# 100 TB design point's per-group sums; beyond that, swap these
# helpers back to SUM(DECIMAL(38,s)) (one-line change, same results,
# slower) or pre-aggregate per partition.

_POW = {2: 100, 4: 10_000, 6: 1_000_000}


def cents(col: str | Column, scale: int = 2) -> Column:
    """Exact 2-decimal double -> BIGINT scaled by 10^scale."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * _POW[scale], 0).cast("long")


def dec_sum(col: str | Column, scale: int = 2) -> Column:
    return F.sum(cents(col, scale)).cast("double") / F.lit(float(_POW[scale]))


def dec_avg(col: str | Column, scale: int = 2) -> Column:
    """Exact-sum / 10^s / count in double — identical arithmetic both
    engines (division order matters and is mirrored in SQL_DEC_AVG)."""
    c = F.col(col) if isinstance(col, str) else col
    return dec_sum(col, scale) / F.count(c)


def SQL_CENTS(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(({expr}) * {_POW[scale]}, 0) AS BIGINT)"


def SQL_DEC_SUM(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM({SQL_CENTS(expr, scale)}) AS DOUBLE) / {float(_POW[scale])}"


def SQL_DEC_AVG(expr: str, scale: int = 2) -> str:
    return f"{SQL_DEC_SUM(expr, scale)} / COUNT({expr})"

"""Query modules — one per SURVEY.md §2 section.

Importing a module registers its queries in dags_spark.registry.
Shared cross-engine determinism helpers live here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table

__all__ = ["table", "F", "dec_sum", "dec_avg", "SQL_DEC_SUM", "SQL_DEC_AVG"]


# --- exact double aggregation (determinism rule 2) -------------------
# Money/value doubles in the fixtures are exact 2-decimal values;
# summing them as DECIMAL is exact and order-independent, so Spark and
# DuckDB agree bit-for-bit after the final cast back to DOUBLE.

def dec_sum(col: str | Column, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


def dec_avg(col: str | Column, scale: int = 2) -> Column:
    """Exact-sum / count in double — identical arithmetic both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double") / F.count(c)


def SQL_DEC_SUM(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,{scale}))) AS DOUBLE)"


def SQL_DEC_AVG(expr: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(30,{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )

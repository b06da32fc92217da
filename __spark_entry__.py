"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`dags_spark.registry` — every operator from
SURVEY.md §2 registers a Spark implementation and (for hash-checked
keys) a DuckDB oracle there. See dags_spark/queries/*.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from dags_spark import registry as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001.

    Routed through the registry wrapper so the session is tuned (UTC,
    Arrow, AQE) exactly as in the correctness path."""
    return _registry.queries()["agg_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per hash-checked key (rows-only keys omitted)."""
    return _registry.oracle_sql()

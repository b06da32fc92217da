"""Query registry — the single source of truth behind __spark_entry__.

Every operator from SURVEY.md §2 registers here with:
  - a Spark implementation ``fn(spark, sf_dir) -> DataFrame``
  - (for hash-checked keys) the equivalent DuckDB oracle SQL
  - a check type: "hash" (DuckDB value-hash must match) or "rows"
    (non-SQL-expressible / approximate by design).

Cross-engine determinism rules (SURVEY §2 preamble, FIXTURES.md):
  1. no approx functions in hash keys;
  2. money/value doubles are exact 2-decimal values -> aggregate them
     as DECIMAL (exact, order-independent) and CAST the result to
     DOUBLE at the end, identically on both sides;
  3. break window/top-k ties with a unique key;
  4. alias every computed column identically on both sides;
  5. events.ts is ns in parquet -> both engines operate at microsecond
     precision (Spark truncates, DuckDB TIMESTAMP is us);
  6. ISO day-of-week convention on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

# queries/ modules to import for registration side effects.
_QUERY_MODULES = [
    "scans",
    "projection",
    "joins",
    "aggregates",
    "windows",
    "sorts",
    "setops",
    "functions",
    "streaming",
    "udfs",
    "llm",
    "textops",
    "relational_ext",
    "composites",
    "graphq",
]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL (None -> rows-only check)
    check: str  # "hash" | "rows"
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str,
    oracle: str | None = None,
    check: str = "hash",
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    if check == "hash" and oracle is None:
        raise ValueError(f"{name}: hash check requires oracle SQL")

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query key: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from .session import tune

            tune(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = QuerySpec(name, wrapped, oracle, check, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


def _load_all() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(f"dags_spark.queries.{mod}")


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }

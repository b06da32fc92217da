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
    "featureeng",
    "geo",
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
    # pytest node ids proving a rows-checked key's semantics (the
    # stronger check the weak rows gate leans on); REQUIRED for
    # check="rows" so tools/check.py can run them in the same sweep
    # session (VERDICT r7 directive #7).
    prop_tests: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str,
    oracle: str | None = None,
    check: str = "hash",
    doc: str = "",
    tags: tuple[str, ...] = (),
    prop_tests: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    if check == "hash" and oracle is None:
        raise ValueError(f"{name}: hash check requires oracle SQL")
    if check == "rows" and not prop_tests:
        raise ValueError(
            f"{name}: rows check requires paired pytest node ids"
            " (prop_tests=) proving the semantics"
        )

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
            prop_tests,
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

# Keys needing fresh driver evidence: key -> first round whose green
# entry counts. Two uses: (a) prior-round FAILURES (fixed this round —
# re-check first), (b) keys whose output CHANGED this round, making
# older green entries stale. Self-retiring: once CORRECTNESS_r{N>=round}
# records the key green, it drops to tier 2 and frees its slot.
# (r03: zero failures; entries below are round-4 additions/changes
# that VERDICT r03 explicitly asked to see driver-green this round.)
_RECHECK_FIRST: dict[str, int] = {
    "source_jdbc": 4,
}


def _driver_verified() -> dict[str, int]:
    """Map of key -> latest round with hard driver evidence on record.

    Hash keys count once a CORRECTNESS file records hash_match; rows-only
    keys can never hash-match, so for them a recorded rows_match (the
    driver's weaker by-design check) is the strongest evidence possible
    and retires the key from the never-checked tier.
    """
    import glob
    import json
    import os
    import re

    verified = {name: 1 for name in _DRIVER_VERIFIED}
    rows_only = {
        name for name, spec in _REGISTRY.items() if spec.check != "hash"
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                data = json.load(fh)
            for key, rec in data.items():
                if not isinstance(rec, dict):
                    continue
                if rec.get("hash_match") or (
                    key in rows_only and rec.get("rows_match")
                ):
                    verified[key] = max(verified.get(key, 0), rnd)
        except (OSError, ValueError):
            continue
    return verified


def _order_key(spec: QuerySpec, idx: int, verified: dict[str, int]) -> tuple:
    """Sort key implementing the check-budget ordering.

    Round-4 policy (VERDICT r03 "What's wrong" #1): every key with NO
    driver evidence ranks ahead of every already-evidenced key, so a
    finite per-round budget rotates coverage instead of re-proving the
    same keys. Previously streaming/rows-only keys sat in permanent
    last tiers and after three 50-key rounds had never been checked.

    tier 0: keys whose evidence is stale — prior-round failures now
            fixed, or outputs changed this round (_RECHECK_FIRST);
    tier 1: never-evidenced keys, sub-ranked:
              0 = streaming (the only §2 surface with zero driver
                  evidence after 3 rounds — guaranteed inside a
                  50-key budget, VERDICT r03 defect #1),
              1 = rows-only (cheap, and the ONLY evidence these
                  approximate/stateful keys can ever earn — r01
                  logged them err:no_oracle, so a green rows entry
                  closes the last non-green union slots; ~10 keys,
                  still inside the budget after streaming),
              2 = hash, non-streaming (module priority — LLM first;
                  the unproven tail rolls to the next round, where
                  this same ordering puts it in front);
    tier 2: keys the driver already verified in any past round.
    """
    green = verified.get(spec.name, 0)
    if green < _RECHECK_FIRST.get(spec.name, 0):
        tier, sub = 0, 0
    elif green > 0:
        tier, sub = 2, 0
    elif spec.module == "streaming":
        tier, sub = 1, 0
    elif spec.check != "hash":
        tier, sub = 1, 1
    else:
        tier, sub = 1, 2
    try:
        mod_rank = _MODULE_PRIORITY.index(spec.module)
    except ValueError:
        mod_rank = len(_MODULE_PRIORITY)
    return (tier, sub, mod_rank, idx)


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

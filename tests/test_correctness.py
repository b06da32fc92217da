"""Per-operator correctness: every registered query vs its DuckDB
oracle at the test SF — the same comparison the driver's t2 gate runs
at sf0.01 (tools/check.py mirrors it there; this keeps pytest fast).
"""

from __future__ import annotations

import pytest

from dags_spark.registry import all_specs
from dags_spark.testing import compare

SPECS = all_specs()
SLOW_KEYS = {"dedup_fuzzy_minhash"}

HASH_KEYS = sorted(k for k, s in SPECS.items() if s.oracle and k not in SLOW_KEYS)
ROWS_KEYS = sorted(k for k, s in SPECS.items() if not s.oracle and k not in SLOW_KEYS)


@pytest.mark.parametrize("key", HASH_KEYS)
def test_hash_query_matches_oracle(key, spark, duck, sf_dir):
    spec = SPECS[key]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(spec.oracle).df()
    problems = compare(spark_pdf, duck_pdf)
    assert not problems, f"{key}: {problems}"


@pytest.mark.parametrize("key", ROWS_KEYS)
def test_rows_query_runs(key, spark, sf_dir):
    spec = SPECS[key]
    pdf = spec.fn(spark, sf_dir).toPandas()
    assert len(pdf) >= 0


def test_hash_queries_are_deterministic(spark, duck, sf_dir):
    """Determinism spot-check: run a representative mix twice ->
    identical values (guards against accidental order-dependence)."""
    for key in ["agg_pricing_summary", "win_ranking", "sim_search_topk", "text_tfidf"]:
        spec = SPECS[key]
        a = spec.fn(spark, sf_dir).toPandas()
        b = spec.fn(spark, sf_dir).toPandas()
        assert not compare(a, b), f"{key} not deterministic"


@pytest.mark.slow
@pytest.mark.parametrize("key", HASH_KEYS)
def test_every_hash_key_is_deterministic(key, spark, sf_dir):
    """Full determinism sweep: every hash-checked key run twice in one
    session must return identical values — the cheapest insurance
    against value-hash flakes when an external harness re-runs a key
    (tie-breaks, partial-agg fold order, partition-dependent limits)."""
    spec = SPECS[key]
    a = spec.fn(spark, sf_dir).toPandas()
    b = spec.fn(spark, sf_dir).toPandas()
    assert not compare(a, b), f"{key} not deterministic across runs"


def test_every_hash_key_has_matching_aliases(spark, duck, sf_dir):
    """Column names must match between Spark and oracle (driver sorts
    columns by name before hashing)."""
    for key in HASH_KEYS:
        spec = SPECS[key]
        duck_cols = sorted(
            duck.execute(f"SELECT * FROM ({spec.oracle}) LIMIT 0").df().columns
        )
        spark_cols = sorted(spec.fn(spark, sf_dir).columns)
        assert spark_cols == duck_cols, f"{key}: {spark_cols} != {duck_cols}"

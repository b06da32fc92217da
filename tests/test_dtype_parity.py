"""Schema-family parity sweep: for every hash key, the Spark result
schema (lazy analysis — no execution) must agree with the DuckDB
oracle's pandas dtypes on numeric family (int vs float vs bool vs
timestamp). DuckDB returns HUGEINT for integer SUMs (pandas float64)
and TINYINT for sign(); Spark returns int64 — values compare equal
element-wise but the driver's value-hash differs, which is exactly how
the round-2 hash mismatches happened. This test makes the class
unrepresentable: a new key with an un-CAST integer aggregate fails
here in seconds, not in the next round's CORRECTNESS file."""

from __future__ import annotations

import pytest

from dags_spark.registry import all_specs


def _family(t: str) -> str:
    t = t.lower()
    if "int" in t and "interval" not in t:
        return "int"
    if any(x in t for x in ("float", "double", "decimal")):
        return "float"
    if "bool" in t:
        return "bool"
    if any(x in t for x in ("timestamp", "datetime")):
        return "ts"
    if "date" in t:
        return "date"
    return "other"


@pytest.mark.slow
def test_hash_key_dtype_families_match_oracle(spark, duck, sf_dir):
    problems = []
    for name, spec in all_specs().items():
        if spec.check != "hash" or spec.oracle is None:
            continue
        if spec.module == "streaming":
            continue  # running the stream just for a schema is wasteful
        s_schema = {
            f.name: f.dataType.simpleString()
            for f in spec.fn(spark, sf_dir).schema.fields
        }
        d = duck.execute(f"SELECT * FROM ({spec.oracle}) LIMIT 0").df()
        d_schema = {c: str(t) for c, t in d.dtypes.items()}
        if sorted(s_schema) != sorted(d_schema):
            problems.append((name, "columns", sorted(s_schema), sorted(d_schema)))
            continue
        for c in s_schema:
            sf_, df_ = _family(s_schema[c]), _family(d_schema[c])
            if "other" in (sf_, df_):
                continue
            if sf_ != df_:
                problems.append((name, c, s_schema[c], d_schema[c]))
    assert not problems, f"dtype-family drift: {problems}"


def test_nested_family_signatures():
    """Round-6 directive 8: the family guard recurses into nested
    values — an int-list vs float-list (the HUGEINT drift class
    inside an array) must flag even though 123 == 123.0."""
    import numpy as np
    import pandas as pd

    from dags_spark.testing import _family_sig, compare

    assert _family_sig([1, 2, 3]) == "list<int>"
    assert _family_sig([1.0, 2.0]) == "list<float>"
    assert _family_sig({"a": 1, "b": "x"}) == "struct{a:int,b:str}"
    assert _family_sig(np.array([1, 2])) == "list<int>"
    assert _family_sig([]) == "list<>"
    assert _family_sig(None) is None

    a = pd.DataFrame({"k": [1, 2], "v": [[1, 2], [3]]})
    b_ok = pd.DataFrame({"k": [1, 2], "v": [[1, 2], [3]]})
    b_bad = pd.DataFrame({"k": [1, 2], "v": [[1.0, 2.0], [3.0]]})
    assert compare(a, b_ok) == []
    probs = compare(a, b_bad)
    assert probs and "nested dtype family differs" in probs[0]


def test_sweep_type_sig_parsers():
    """spark_sig/duck_sig normalize both engines' nested type texts
    to one signature language."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from dtype_sweep import duck_sig, spark_sig

    assert spark_sig("array<bigint>") == duck_sig("BIGINT[]") == "list<int>"
    assert (
        spark_sig("map<string,bigint>")
        == duck_sig("MAP(VARCHAR, BIGINT)")
        == "map<str,int>"
    )
    assert (
        spark_sig("struct<a:int,b:string>")
        == duck_sig("STRUCT(a INTEGER, b VARCHAR)")
        == "struct{a:int,b:str}"
    )
    assert spark_sig("array<struct<x:double,y:array<bigint>>>") == duck_sig(
        "STRUCT(x DOUBLE, y BIGINT[])[]"
    )
    # the HUGEINT drift class flags, nested or not
    assert duck_sig("HUGEINT") == "float" != spark_sig("bigint")
    assert duck_sig("HUGEINT[]") == "list<float>" != spark_sig("array<bigint>")
    # DATE/TIMESTAMP unify (pandas datetime64 either way)
    assert spark_sig("timestamp") == duck_sig("DATE")

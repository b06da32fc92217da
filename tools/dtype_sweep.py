"""One-shot audit: for every hash key, compare the Spark result schema
(lazy analysis, no execution) against the DuckDB oracle's pandas dtypes.
A family mismatch (int vs float) means the driver's value-hash sees
`123` on one side and `123.0` on the other — guaranteed hash_match:false
even when the values are numerically identical (DuckDB SUM(BIGINT)
returns HUGEINT, which lands in pandas as float64).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from dags_spark.registry import all_specs  # noqa: E402
from dags_spark.session import get_spark  # noqa: E402
from dags_spark.testing import duck_connect  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def _split_top(s: str, open_: str, close: str) -> list[str]:
    """Split on top-level commas, respecting nesting of open/close."""
    parts, depth, tok = [], 0, []
    for ch in s:
        if ch == "," and depth == 0:
            parts.append("".join(tok).strip())
            tok = []
        else:
            depth += ch in open_
            depth -= ch in close
            tok.append(ch)
    if tok:
        parts.append("".join(tok).strip())
    return parts


def _scalar_family(t: str) -> str:
    t = t.lower()
    if "int" in t and "interval" not in t:  # covers u*/hugeint too
        return "int"
    if any(x in t for x in ("float", "double", "decimal", "real")):
        return "float"
    if "bool" in t:
        return "bool"
    if any(x in t for x in ("timestamp", "datetime", "date")):
        # DATE and TIMESTAMP unify: pandas materializes DuckDB DATE as
        # datetime64, same as Spark timestamps, so the driver's hash
        # sees one family (the date_trunc convention keys are green).
        return "ts"
    if any(x in t for x in ("varchar", "string", "char", "text")):
        return "str"
    return "other"


def spark_sig(t: str) -> str:
    """Normalized recursive family signature of a Spark simpleString
    type: array<bigint> -> list<int>, struct<a:int,b:string> ->
    struct{a:int,b:str}, map<string,bigint> -> map<str,int>."""
    t = t.strip()
    if t.startswith("array<") and t.endswith(">"):
        return f"list<{spark_sig(t[6:-1])}>"
    if t.startswith("map<") and t.endswith(">"):
        k, v = _split_top(t[4:-1], "<(", ">)")
        return f"map<{spark_sig(k)},{spark_sig(v)}>"
    if t.startswith("struct<") and t.endswith(">"):
        fields = []
        for f in _split_top(t[7:-1], "<(", ">)"):
            name, ft = f.split(":", 1)
            fields.append(f"{name.strip()}:{spark_sig(ft)}")
        return "struct{" + ",".join(fields) + "}"
    return _scalar_family(t)


def duck_sig(t: str) -> str:
    """Same normalization for a DuckDB DESCRIBE column_type:
    BIGINT[] -> list<int>, STRUCT(a BIGINT, b VARCHAR) ->
    struct{a:int,b:str}, MAP(VARCHAR, BIGINT) -> map<str,int>.
    HUGEINT maps to the FLOAT family on purpose: pandas has no
    int128, so .df() materializes it as float64 — exactly the
    SUM(BIGINT) drift class this sweep exists to flag (the fix is
    CASTing the oracle aggregate to BIGINT, not relabeling)."""
    t = t.strip()
    if t.upper() == "HUGEINT":
        return "float"
    if t.endswith("[]"):
        return f"list<{duck_sig(t[:-2])}>"
    up = t.upper()
    if up.startswith("MAP(") and t.endswith(")"):
        k, v = _split_top(t[4:-1], "<(", ">)")
        return f"map<{duck_sig(k)},{duck_sig(v)}>"
    if up.startswith("STRUCT(") and t.endswith(")"):
        fields = []
        for f in _split_top(t[7:-1], "<(", ">)"):
            name, ft = f.split(" ", 1) if '"' not in f else (
                f[1 : f.index('"', 1)],
                f[f.index('"', 1) + 1 :],
            )
            fields.append(f'{name.strip(chr(34))}:{duck_sig(ft)}')
        return "struct{" + ",".join(fields) + "}"
    return _scalar_family(t)


def main() -> int:
    spark = get_spark("dtype-sweep")
    con = duck_connect(SF)
    bad = 0
    for name, spec in all_specs().items():
        if spec.check != "hash" or spec.oracle is None:
            continue
        try:
            s_schema = {f.name: f.dataType.simpleString() for f in spec.fn(spark, SF).schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"SPARK-ERR {name}: {e}")
            bad += 1
            continue
        try:
            d = con.execute(
                f"DESCRIBE SELECT * FROM ({spec.oracle}) LIMIT 0"
            ).fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"DUCK-ERR {name}: {e}")
            bad += 1
            continue
        d_schema = {row[0]: row[1] for row in d}
        if sorted(s_schema) != sorted(d_schema):
            print(f"COLS {name}: spark={sorted(s_schema)} duck={sorted(d_schema)}")
            bad += 1
            continue
        for c in s_schema:
            sf_, df_ = spark_sig(s_schema[c]), duck_sig(d_schema[c])
            # "other" on either side = a type outside the family map;
            # nested signatures (list/struct/map) compare structurally
            if "other" in (sf_, df_):
                continue
            if sf_ != df_:
                print(f"DTYPE {name}.{c}: spark={s_schema[c]} duck={d_schema[c]}")
                bad += 1
    print(f"\n{bad} problems")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

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


def family(t: str) -> str:
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
            d = con.execute(f"SELECT * FROM ({spec.oracle}) LIMIT 0").df()
        except Exception as e:  # noqa: BLE001
            print(f"DUCK-ERR {name}: {e}")
            bad += 1
            continue
        d_schema = {c: str(t) for c, t in d.dtypes.items()}
        if sorted(s_schema) != sorted(d_schema):
            print(f"COLS {name}: spark={sorted(s_schema)} duck={sorted(d_schema)}")
            bad += 1
            continue
        for c in s_schema:
            sf_, df_ = family(s_schema[c]), family(d_schema[c])
            # pandas object columns (strings/arrays) are fine either way
            if df_ == "other" or sf_ == "other":
                continue
            if sf_ != df_:
                print(f"DTYPE {name}.{c}: spark={s_schema[c]} duck={d_schema[c]}")
                bad += 1
    print(f"\n{bad} problems")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

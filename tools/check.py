"""Local mirror of the driver's t2 correctness gate.

Runs every registered query on Spark and its DuckDB oracle over the
same parquet fixtures, then compares: row count, column names, and
order-insensitive values (exact after canonicalization). Strictly
harsher than any sane value-hash, so green here should mean green in
CORRECTNESS_r{N}.json.

Usage:
    python tools/check.py [--sf /root/testdata/sf0.01] [key ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
import traceback
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from dags_spark import TABLES  # noqa: E402
from dags_spark.registry import all_specs  # noqa: E402
from dags_spark.session import get_spark  # noqa: E402


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize a result frame: sorted column order, µs timestamps,
    lists->tuples, NaN->None sentinel strings for stable sorting."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.dt.tz_localize(None) if getattr(s.dt, "tz", None) is not None else s
            s = s.astype("datetime64[us]")
        elif s.dtype == object:
            s = s.map(_canon_cell)
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            s = s.astype("bool")
        out[c] = s
    return pd.DataFrame(out)


def _canon_cell(v):
    if isinstance(v, (list, np.ndarray)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, np.generic):
        return v.item()
    return v


def sort_rows(df: pd.DataFrame) -> pd.DataFrame:
    key = df.apply(lambda row: tuple(repr(x) for x in row), axis=1) if len(df) else None
    if key is None:
        return df
    return df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    a, b = canon(spark_pdf), canon(duck_pdf)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return problems
    a, b = sort_rows(a), sort_rows(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            neq = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
        else:
            neq = np.array([x != y for x, y in zip(av, bv)])
        if neq.any():
            i = int(np.argmax(neq))
            problems.append(
                f"column {c}: {int(neq.sum())}/{len(a)} values differ; "
                f"first at sorted row {i}: spark={av[i]!r} duck={bv[i]!r}"
            )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    specs = all_specs()
    keys = args.keys or list(specs)
    unknown = [k for k in keys if k not in specs]
    if unknown:
        print(f"unknown keys: {unknown}")
        return 2

    spark = get_spark("dags_spark-check")
    con = duck_connect(args.sf)
    n_pass = n_fail = 0
    for k in keys:
        spec = specs[k]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf)
            spark_pdf = sdf.toPandas()
        except Exception:
            print(f"FAIL {k}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if spec.check == "rows" or spec.oracle is None:
            status = "ok" if len(spark_pdf) >= 0 else "??"
            print(f"ROWS {k}: {len(spark_pdf)} rows [{status}] ({time.time()-t0:.2f}s)")
            n_pass += 1
            continue
        try:
            duck_pdf = con.execute(spec.oracle).df()
        except Exception:
            print(f"FAIL {k}: duckdb raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL {k} ({time.time()-t0:.2f}s)")
            for p in problems:
                print(f"    {p}")
        else:
            n_pass += 1
            print(f"PASS {k}: {len(spark_pdf)} rows ({time.time()-t0:.2f}s)")
    print(f"\n{n_pass} passed, {n_fail} failed, {len(keys)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

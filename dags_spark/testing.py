"""Cross-engine comparison utilities (shared by tools/check.py and
the pytest suite) — a strict local mirror of the driver's t2 gate:
row count + column names + order-insensitive exact values.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from . import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


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


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sorted column order, µs timestamps, tuples for lists/dicts."""
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


def sort_rows(df: pd.DataFrame) -> pd.DataFrame:
    if not len(df):
        return df
    key = df.apply(lambda row: tuple(repr(x) for x in row), axis=1)
    return df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == identical)."""
    problems: list[str] = []
    a, b = canon(spark_pdf), canon(duck_pdf)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"]
    # dtype-family guard: `123 == 123.0` is True element-wise, but a
    # value-hash over int64 vs float64 columns differs — DuckDB returns
    # HUGEINT (-> pandas float64) for SUM(BIGINT), so an un-CAST oracle
    # passes a tolerant compare yet fails the driver. Flag it here.
    for c in a.columns:
        ai = pd.api.types.is_integer_dtype(a[c])
        bi = pd.api.types.is_integer_dtype(b[c])
        af = pd.api.types.is_float_dtype(a[c])
        bf = pd.api.types.is_float_dtype(b[c])
        if (ai and bf) or (af and bi):
            problems.append(
                f"column {c}: dtype family differs (spark={a[c].dtype} "
                f"duck={b[c].dtype}) — CAST the oracle (HUGEINT->BIGINT?)"
            )
    if problems:
        return problems
    if len(a) != len(b):
        return [f"row count differs: spark={len(a)} duck={len(b)}"]
    a, b = sort_rows(a), sort_rows(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            neq = ~((av == bv) | (np.isnan(av.astype(float)) & np.isnan(bv.astype(float))))
        else:
            neq = np.array([x != y for x, y in zip(av, bv)])
        if neq.any():
            i = int(np.argmax(neq))
            problems.append(
                f"column {c}: {int(neq.sum())}/{len(a)} values differ; "
                f"first at sorted row {i}: spark={av[i]!r} duck={bv[i]!r}"
            )
    return problems

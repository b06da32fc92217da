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


def _family_sig(v) -> str | None:
    """Structural dtype-family signature of one VALUE, recursing into
    lists/structs/maps — the nested extension of the scalar family
    guard below (VERDICT r5 directive 8): a DuckDB list whose
    elements came back HUGEINT->float inside an object cell passes an
    element-wise == against Spark's ints (123 == 123.0), but the
    driver's value-hash serializes them differently. None = null
    (excluded from signatures)."""
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, decimal.Decimal):
        return "float"
    if isinstance(v, str):
        return "str"
    if isinstance(v, dict):
        return (
            "struct{"
            + ",".join(f"{k}:{_family_sig(x)}" for k, x in sorted(v.items()))
            + "}"
        )
    if hasattr(v, "asDict"):  # pyspark Row
        return _family_sig(v.asDict())
    if isinstance(v, (pd.Timestamp, np.datetime64, datetime.datetime)):
        return "ts"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, (list, tuple, np.ndarray)):
        inner = sorted({s for x in v if (s := _family_sig(x)) is not None})
        return "list<" + "|".join(inner) + ">"
    return "other"


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
    # nested extension of the same guard: object columns (lists,
    # structs, maps) compare their STRUCTURAL family signatures.
    for c in a.columns:
        if spark_pdf[c].dtype == object and duck_pdf[c].dtype == object:
            sa = {s for v in spark_pdf[c] if (s := _family_sig(v)) is not None}
            sb = {s for v in duck_pdf[c] if (s := _family_sig(v)) is not None}
            if sa != sb:
                problems.append(
                    f"column {c}: nested dtype family differs"
                    f" (spark={sorted(sa)} duck={sorted(sb)})"
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

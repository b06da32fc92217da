"""Fixture IO: load the driver-generated parquet tables.

Tables (TESTDATA.md / FIXTURES.md): region nation customer supplier
part orders lineitem events documents embeddings, one parquet file per
table under ``{sf_dir}/``.

At 100 TB each ``table(...)`` call is a plain ``spark.read.parquet``
over a (partitioned) directory — Catalyst handles column pruning and
predicate pushdown into the scan, so operators must never force
materialization here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# (session id, sf_dir, name) -> lazy scan DataFrame. A DataFrame is an
# immutable logical plan, so handing the same object to every caller is
# safe — and saves the ~100 ms per call that spark.read.parquet spends
# on file listing + py4j roundtrips (a star join re-built per bench rep
# paid that 5x). Fixture dirs are read-only, so the cached schema can
# never go stale within a session.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table: {name}")
    app_id = spark.sparkContext.applicationId
    # Evict entries of dead sessions: stale applicationIds pin py4j
    # references and plans forever in long-lived processes that cycle
    # Spark sessions (test harnesses do).
    stale = [k for k in _TABLE_CACHE if k[0] != app_id]
    for k in stale:
        del _TABLE_CACHE[k]
    key = (app_id, sf_dir, name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        path = os.path.join(sf_dir, f"{name}.parquet")
        df = (
            _read_events(spark, path)
            if name == "events"
            else spark.read.parquet(path)
        )
        _TABLE_CACHE[key] = df
    return df


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """Normalize events.ts to a microsecond TimestampType (LTZ, session
    zone pinned to UTC) whatever the fixture generation wrote:

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so read
      as raw int64 ns (legacy conf) and convert with *integer*
      division — ns epoch values exceed 2^53, so float division would
      corrupt the low digits. DuckDB's ns->us conversion floors
      identically.
    - TIMESTAMP(MICROS) (isAdjustedToUTC either way): reads natively
      as TimestampType or TimestampNTZType; cast NTZ -> LTZ, which is
      value-identical under the UTC session zone and keeps every
      downstream operator on one timestamp class.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # The NTZ->LTZ cast below is value-preserving only under a UTC
    # session zone; pin it here so table() is correct even for callers
    # that built their own session without tune(). Session-wide
    # mutation — warn loudly when it actually changes an explicit
    # non-UTC zone, so pipeline authors relying on another zone for
    # timestamp rendering elsewhere see the repin instead of silently
    # shifted behavior (documented on the api.py facade too).
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    _utc_equivalents = {
        "UTC", "Etc/UTC", "Z", "GMT", "Etc/GMT", "GMT0", "Etc/GMT0",
        "Etc/GMT+0", "Etc/GMT-0", "Greenwich", "Universal", "Zulu",
        "UCT", "Etc/UCT", "Etc/Universal", "Etc/Zulu", "+00:00", "-00:00",
    }
    if prev_tz not in _utc_equivalents:
        import warnings

        warnings.warn(
            f"dags_spark reading 'events' repins spark.sql.session.timeZone "
            f"from {prev_tz!r} to 'UTC' for the whole session (the events "
            f"NTZ->LTZ normalization is only value-preserving under UTC)",
            stacklevel=3,
        )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Session-wide side effect, deliberate: nanosAsLong must be set at
    # analysis time for this scan, and the resulting plan is cached in
    # _TABLE_CACHE for the session's lifetime, so restoring the conf
    # after the read would leave a cached plan that re-resolves under
    # the wrong setting. Fixture tables are the only TIMESTAMP(NANOS)
    # parquet this engine reads; any external source needing NANOS
    # semantics must set the conf itself.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if not isinstance(ts_type, T.TimestampType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql paths)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def register_python_datasource(spark: SparkSession, source_cls) -> None:
    """Register a Python DataSource, tolerating ONLY the
    already-registered duplicate (same session, second key run): any
    other registration failure propagates instead of resurfacing
    later as a confusing "format not found" at read time. Matching on
    the duplicate condition, not the source name — a real failure
    message can also contain the name."""
    try:
        spark.dataSource.register(source_cls)
    except Exception as e:
        msg = str(e).upper()
        if "ALREADY" not in msg and "EXISTS" not in msg:
            raise

"""Streaming semantics tests: watermark-gated window finalization and
exactly-once incremental file processing.

Empirical note (Spark 4.1, verified during development): late input
rows are NOT filtered from streaming aggregations — watermark
dropping is best-effort (the docs guarantee only that on-time data is
never dropped). What IS guaranteed, and what we assert: in append
mode a window emits exactly when the watermark passes its end, so
(a) every finalized window appears exactly once with exact counts,
(b) the still-open trailing window is absent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dags_spark.io import table
from dags_spark.registry import all_specs

SPECS = all_specs()


def test_watermark_finalizes_windows_append_mode(spark, sf_dir):
    out = SPECS["stream_watermark_late"].fn(spark, sf_dir).toPandas()
    got = dict(
        zip(out["day_start"].dt.strftime("%Y-%m-%d"), out["n_events"].astype(int))
    )
    ev = table(spark, sf_dir, "events")
    truth = {
        r.day: r.n
        for r in ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    last_day = max(truth)
    # the trailing window is still open when the stream ends -> absent
    assert last_day not in got
    # each finalized window emitted exactly once with exact counts —
    # including the "late" days delivered in arrival batch 2
    expected = {d: n for d, n in truth.items() if d != last_day}
    assert got == expected
    # no duplicate window rows (append emitted each window once)
    assert len(out) == len(set(out["day_start"]))


def test_incremental_ledger_processes_each_row_once(spark, sf_dir):
    out = SPECS["stream_incremental_ledger"].fn(spark, sf_dir).collect()[0]
    n_events = table(spark, sf_dir, "events").count()
    assert out.n_rows_processed == n_events
    assert out.n_distinct_events == n_events


def test_stateful_running_state_spans_batches(spark, sf_dir):
    """applyInPandasWithState must accumulate across the two staged
    micro-batches: final per-user counts equal the batch GROUP BY."""
    from dags_spark.registry import all_specs
    from dags_spark.io import table
    from pyspark.sql import functions as F

    out = all_specs()["stream_stateful_running"].fn(spark, sf_dir)
    got = {r.user_id: (r.n_events, r.max_value) for r in out.collect()}
    want = {
        r.user_id: (r.n, r.mx)
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert got == want


def test_foreachbatch_sink_idempotent_on_replay(spark, sf_dir, tmp_path):
    """ADVICE r1: foreachBatch is at-least-once — replaying the same
    source through a FRESH checkpoint (same batch ids) must REPLACE
    the per-batch partitions, not duplicate rows."""
    import tempfile

    from dags_spark.streaming.runner import run_foreach_batch_parquet

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    ).coalesce(1).write.parquet(src)

    def stream():
        return (
            spark.readStream.schema("n_nationkey BIGINT, n_name STRING")
            .parquet(src)
        )

    run_foreach_batch_parquet(
        stream(), out, ckpt=tempfile.mkdtemp(prefix="ckpt1_")
    )
    n1 = spark.read.parquet(out).count()
    # fresh checkpoint -> Spark replays batch 0 over the same files
    run_foreach_batch_parquet(
        stream(), out, ckpt=tempfile.mkdtemp(prefix="ckpt2_")
    )
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 == 25, f"replay duplicated rows: {n1} -> {n2}"


def test_tws_gating_matches_environment():
    """stream_stateful_tws self-activates with protobuf: registered
    iff google.protobuf imports (here it normally doesn't, so the key
    must be absent rather than registered-and-broken)."""
    from dags_spark.queries.streaming import tws_available
    from dags_spark.registry import all_specs

    assert tws_available() == ("stream_stateful_tws" in all_specs())

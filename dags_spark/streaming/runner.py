"""Bounded Structured-Streaming harness.

The `events` fixture doubles as a bounded stream: we stage it as
microsecond-timestamp parquet in a temp dir (the raw fixture is
TIMESTAMP(NANOS), which the streaming parquet source rejects), build
a ``readStream`` over that directory, run the query with an
``availableNow`` trigger into a memory sink, and hand back the final
table as a batch DataFrame.

This mirrors production exactly: swap the temp dir for an object-store
path and ``availableNow`` for a continuous trigger and every query
below runs unchanged on a live feed; watermarks + state-store
semantics are identical. Checkpoints are per-run temp dirs — state
never leaks between runs.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)

_STAGED: dict[tuple[str, str], str] = {}


def stage_events(spark: SparkSession, sf_dir: str, split: str = "single") -> str:
    """Write events as µs-timestamp parquet into a temp dir.

    split="single": one directory, one logical batch.
    split="two": part1/ holds 2024-01-03..14, part2/ holds the rest
    (including pre-01-03 "late" rows) — for watermark / incremental
    tests that need multiple arrival batches.
    Staged dirs are memoized per (sf_dir, split) within the process.
    """
    key = (sf_dir, split)
    if key in _STAGED and os.path.isdir(_STAGED[key]):
        return _STAGED[key]
    base = tempfile.mkdtemp(prefix=f"dags_spark_stream_{split}_")
    ev = table(spark, sf_dir, "events")
    if split == "single":
        ev.coalesce(1).write.mode("overwrite").parquet(os.path.join(base, "in"))
    else:
        lo = F.lit("2024-01-03").cast("timestamp")
        hi = F.lit("2024-01-15").cast("timestamp")
        on_time = ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        rest = ev.filter((F.col("ts") < lo) | (F.col("ts") >= hi))
        on_time.coalesce(1).write.mode("overwrite").parquet(os.path.join(base, "part1"))
        rest.coalesce(1).write.mode("overwrite").parquet(os.path.join(base, "part2"))
    _STAGED[key] = base
    return base


def events_stream(
    spark: SparkSession, in_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over staged events; max_files_per_trigger=1
    forces one micro-batch per staged file (multi-batch state tests)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(in_dir)


def run_to_memory(sdf: DataFrame, output_mode: str) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a
    memory sink; return the final table."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="dags_spark_ckpt_")
    writer = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
    )
    q = writer.start()
    q.awaitTermination()
    return sdf.sparkSession.table(name)


def run_foreach_batch_parquet(
    sdf: DataFrame,
    out_dir: str,
    ckpt: str | None = None,
    output_mode: str | None = None,
) -> None:
    """Write each micro-batch to a parquet sink via foreachBatch,
    idempotently per batch_id.

    A stable checkpoint dir makes re-runs incremental: already-
    processed source files are skipped — the reference library's
    'process only unseen blocks' semantic, supplied by Spark's own
    file-source tracking.

    foreachBatch is at-least-once: after a failure/restart Spark can
    redeliver a batch_id that was already written. Partitioning the
    sink by batch_id and overwriting ONLY that partition (dynamic
    partition overwrite) makes redelivery replace rather than
    duplicate — the standard exactly-once-sink recipe for foreachBatch.
    """
    ckpt = ckpt or tempfile.mkdtemp(prefix="dags_spark_ckpt_")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("__batch_id", F.lit(batch_id))
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .partitionBy("__batch_id")
            .parquet(out_dir)
        )

    writer = sdf.writeStream.foreachBatch(write_batch)
    if output_mode is not None:
        # "update" lets a stateful aggregation emit its changed rows
        # per micro-batch (append would require a watermark close).
        writer = writer.outputMode(output_mode)
    q = (
        writer.trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()

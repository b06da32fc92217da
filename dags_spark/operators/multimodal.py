"""Multimodal columns: opaque binary payloads + typed metadata.

The engine treats images/audio/video as ``BinaryType`` columns with a
typed metadata struct alongside ({format, n_bytes, ...}); decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` transforms so payload bytes stream through Python in
columnar batches (never row-at-a-time, never collected).

The image/audio codec libraries (PIL, torchvision, ffmpeg, ...) are
NOT in this container, so the codec step is stubbed: each operator
documents its real signature, gates the import, and (for tests)
offers a deterministic fake decode whose features are pure functions
of the bytes — the Spark-side plumbing (schema, batching, partition
behavior) is real and hash-checked against a DuckDB oracle.

Scale: mapInPandas preserves partitioning (no shuffle); decoding is
embarrassingly parallel. For 100 TB of media you would store payloads
in parquet binary columns (or object-store pointers for >100 MB
blobs), repartition by size histogram so Arrow batches stay ~64 MB,
and keep `spark.sql.execution.arrow.maxRecordsPerBatch` tuned down
for wide payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id BIGINT, format STRING, n_bytes BIGINT, first_byte INT, content_md5 STRING"
)


def attach_binary(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Fixture adapter: materialize a binary payload column + typed
    metadata struct from document text (the fixtures carry no real
    media; payload bytes are the UTF-8 encoding)."""
    content = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col),
        content.alias("content"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.octet_length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_features(binary_df: DataFrame, fake: bool = True) -> DataFrame:
    """Per-payload feature extraction via mapInPandas.

    Real implementation would be::

        from PIL import Image          # not available in this container
        img = Image.open(io.BytesIO(buf)); feats = (img.width, img.height, ...)

    With ``fake=True`` features are deterministic byte-level functions
    (length, first byte, md5) so the full Arrow path is testable.
    """
    if not fake:
        try:
            import PIL  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "real image decode requires PIL, which is not installed; "
                "use fake=True to exercise the pipeline"
            ) from e

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": [m["format"] for m in pdf["meta"]],
                    "n_bytes": content.map(len).astype("int64"),
                    "first_byte": content.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "content_md5": content.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return binary_df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_images(binary_df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB: image resize (PIL absent). Real shape: mapInPandas
    emitting the re-encoded payload with updated meta."""
    raise NotImplementedError(
        "image resize requires PIL; pipeline shape: "
        "binary_df.mapInPandas(resize_batch, 'doc_id BIGINT, content BINARY, meta STRUCT<...>')"
    )


def sample_frames(binary_df: DataFrame, every_n: int) -> DataFrame:
    """STUB: video frame sampling (ffmpeg absent). Real shape: one
    input row -> many frame rows via mapInPandas generator."""
    raise NotImplementedError(
        "frame sampling requires ffmpeg bindings; pipeline shape: "
        "mapInPandas yielding one row per sampled frame (doc_id, frame_idx, content)"
    )

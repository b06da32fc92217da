"""Apache Iceberg v2 table-metadata emitter + from-spec replayer.

The second half of the external-lakehouse story (tablelog.py's
``export_delta_log`` is the first): publish a tablelog table's
version chain as Iceberg v2 metadata — the PUBLIC table spec at
iceberg.apache.org/spec — so an Iceberg-capable engine can plan scans
from the metadata tree alone, never touching tablelog's ``_log``.

Emitted tree (spec §Table Metadata / §Manifests / §Manifest Lists):

    <table>/metadata/
      v1.metadata.json          format-version 2, schemas (field-ids),
                                partition-specs, sort-orders, the full
                                snapshot list + snapshot-log
      snap-<id>.avro            one manifest LIST per snapshot: which
                                manifest files make up the snapshot,
                                with added/existing/deleted file+row
                                counts and sequence-number bounds
      manifest-<id>.avro        one manifest per snapshot: an entry
                                per live data file (status ADDED=1 for
                                files new in that snapshot, EXISTING=0
                                for carried ones) with the v2-required
                                data_file struct (content, file_path,
                                file_format, partition, record_count,
                                file_size_in_bytes)

Both Avro files are written with operators/avroio.py (the spec-level
container codec, JVM-certified in tests/test_operators.py) using
Iceberg's Avro convention of ``field-id`` annotations on every field,
and the manifest carries the ``schema`` / ``partition-spec`` /
``format-version`` / ``content`` header metadata real readers expect.

Scope: unpartitioned data-content tables (partition is the empty
struct), no delete files — exactly what TableLog represents after
DV-free commits. MOR deletion vectors would need v2 delete manifests
(content=1); the exporter refuses them the same way export_delta_log
does.

Certification: no third-party Iceberg engine is installable in this
sandbox (duckdb ``INSTALL iceberg`` needs the network, pyiceberg is
absent — probe recorded in the round CHECKLOG), so conformance is
pinned by ``replay_iceberg`` — a reader that walks ONLY the emitted
metadata tree (metadata.json -> manifest list -> manifests -> file
paths) — plus field-level spec assertions in tests/test_tablelog.py.
"""

from __future__ import annotations

import json
import os
import uuid

from .avroio import read_container, write_container

# --- Iceberg Avro schemas (field-id-annotated, spec appendix) --------

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}

_DATA_FILE_SCHEMA = {
    "type": "record",
    "name": "r2",
    "fields": [
        {"name": "content", "type": "int", "field-id": 134},
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {
            "name": "partition",
            "type": {"type": "record", "name": "r102", "fields": []},
            "field-id": 102,
        },
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
    ],
}

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None, "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "default": None, "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"], "default": None, "field-id": 4},
        {"name": "data_file", "type": _DATA_FILE_SCHEMA, "field-id": 2},
    ],
}


def export_iceberg(table, fields: list[dict], row_counts: dict[str, int]) -> str:
    """Publish ``table`` (a tablelog.TableLog) as Iceberg v2 metadata.

    ``fields`` is the Iceberg schema field list (id/name/required/
    type, spec §Schemas); ``row_counts`` maps data-file name ->
    record count (Iceberg manifests carry per-file row counts so
    planners can cost scans without opening footers — the caller
    computes them from parquet metadata). Returns the metadata dir."""
    snap_base = table.snapshot()
    if snap_base.get("dvs"):
        raise ValueError(
            "deletion-vector tables need v2 delete manifests —"
            " compact() the DVs away before exporting"
        )
    meta_dir = os.path.join(table.path, "metadata")
    os.makedirs(meta_dir, exist_ok=True)

    schema_obj = {"schema-id": 0, "type": "struct", "fields": fields}
    manifest_meta = {
        "schema": json.dumps(schema_obj).encode(),
        "partition-spec": b"[]",
        "partition-spec-id": b"0",
        "format-version": b"2",
        "content": b"data",
    }

    snapshots = []
    snapshot_log = []
    prev_files: list[str] = []
    last_seq = 0
    for v in range(1, table.latest_version() + 1):
        snap = table.snapshot(v)
        seq = v
        last_seq = seq
        snapshot_id = v  # deterministic, monotone — valid per spec
        prev_set = set(prev_files)
        entries = []
        added = existing = 0
        added_rows = existing_rows = 0
        for name in snap["files"]:
            st = os.stat(os.path.join(table.path, name))
            n_rows = row_counts[name]
            is_new = name not in prev_set
            added += is_new
            existing += not is_new
            added_rows += n_rows if is_new else 0
            existing_rows += 0 if is_new else n_rows
            entries.append(
                {
                    "status": 1 if is_new else 0,
                    "snapshot_id": snapshot_id if is_new else None,
                    "sequence_number": seq if is_new else None,
                    "file_sequence_number": seq if is_new else None,
                    "data_file": {
                        "content": 0,
                        "file_path": os.path.join(table.path, name),
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": n_rows,
                        "file_size_in_bytes": st.st_size,
                    },
                }
            )
        manifest_name = f"manifest-{snapshot_id}.avro"
        manifest_path = os.path.join(meta_dir, manifest_name)
        with open(manifest_path, "wb") as fh:
            fh.write(
                write_container(
                    entries, _MANIFEST_ENTRY_SCHEMA, extra_meta=manifest_meta
                )
            )
        mlist_name = f"snap-{snapshot_id}.avro"
        mlist_rec = {
            "manifest_path": manifest_path,
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": seq,
            "min_sequence_number": 1,
            "added_snapshot_id": snapshot_id,
            "added_files_count": added,
            "existing_files_count": existing,
            "deleted_files_count": 0,
            "added_rows_count": added_rows,
            "existing_rows_count": existing_rows,
            "deleted_rows_count": 0,
        }
        with open(os.path.join(meta_dir, mlist_name), "wb") as fh:
            fh.write(write_container([mlist_rec], _MANIFEST_LIST_SCHEMA))
        ts_ms = int(os.stat(table._version_file(v)).st_mtime * 1000)
        snapshots.append(
            {
                "snapshot-id": snapshot_id,
                "sequence-number": seq,
                "timestamp-ms": ts_ms,
                "manifest-list": os.path.join(meta_dir, mlist_name),
                "summary": {
                    "operation": "append" if snap["mode"] == "append" else "overwrite"
                },
                "schema-id": 0,
            }
        )
        snapshot_log.append({"timestamp-ms": ts_ms, "snapshot-id": snapshot_id})
        prev_files = snap["files"]

    metadata = {
        "format-version": 2,
        "table-uuid": uuid.uuid4().hex,
        "location": table.path,
        "last-sequence-number": last_seq,
        "last-updated-ms": snapshots[-1]["timestamp-ms"] if snapshots else 0,
        "last-column-id": max(f["id"] for f in fields),
        "current-schema-id": 0,
        "schemas": [schema_obj],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": snapshots[-1]["snapshot-id"] if snapshots else -1,
        "snapshots": snapshots,
        "snapshot-log": snapshot_log,
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(metadata, fh)
    return meta_dir


def replay_iceberg(table_path: str, snapshot_id: int | None = None) -> list[str]:
    """From-spec Iceberg scan planning, independent of tablelog: read
    ``metadata/v1.metadata.json``, resolve the current (or requested)
    snapshot, read its manifest LIST (Avro), read each named manifest
    (Avro), and return the live data-file paths — entries with status
    DELETED (2) are skipped, per spec. This is the metadata walk every
    Iceberg engine performs to plan a scan; time travel is just
    resolving a different snapshot-id."""
    with open(os.path.join(table_path, "metadata", "v1.metadata.json")) as fh:
        meta = json.load(fh)
    if meta["format-version"] != 2:
        raise ValueError("unsupported format-version")
    sid = meta["current-snapshot-id"] if snapshot_id is None else snapshot_id
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == sid)
    with open(snap["manifest-list"], "rb") as fh:
        _, manifests = read_container(fh.read())
    live: list[str] = []
    for m in manifests:
        if m["content"] != 0:
            raise ValueError("delete manifests unsupported")
        with open(m["manifest_path"], "rb") as fh:
            _, entries = read_container(fh.read())
        for e in entries:
            if e["status"] != 2:  # ADDED / EXISTING are live
                live.append(e["data_file"]["file_path"])
    return sorted(live)

"""Pure-Python Apache Avro object-container codec (spec-level).

No ``spark-avro`` datasource jar ships in this sandbox (probe in the
round CHECKLOG), so — same approach as operators/multimodal.py's
byte-level image/audio codecs — this module implements the PUBLIC
Avro 1.12 container spec directly, making Avro corpora writable and
readable from executors without any JVM connector.

Container layout (spec "Object Container Files"):

    magic ``Obj\\x01``
    file-metadata map: ``avro.schema`` (JSON), ``avro.codec``
    16-byte sync marker
    blocks of: record count (long), payload byte size (long),
               payload (possibly deflate-compressed), sync marker

Binary encoding: zigzag-varint int/long, IEEE-754 LE float/double,
length-prefixed UTF-8 strings / bytes, record fields in declaration
order, unions as (zigzag branch index, value), arrays/maps as
count-prefixed blocks with a 0 terminator.

Scope (everything the TPC-H-ish fixtures need, no more): null,
boolean, int, long, float, double, string, bytes, record,
array, map, nullable unions ``["null", T]``, and the ``date`` /
``timestamp-micros`` logical annotations (carried on int/long — the
codec reads/writes the underlying primitive; interpretation is the
caller's).  Codecs: ``null`` and ``deflate`` (raw zlib, spec §Codecs).

Schema RESOLUTION (reader != writer schema, spec "Schema Resolution")
is supported for the cases a pipeline actually migrates through:
fields matched by name, writer-only fields skipped, reader-only
fields filled from their ``default``, and int->long / float->double
promotion.

Determinism: the writer derives the 16-byte sync marker from the md5
of the schema JSON, so identical (records, schema) input produces
identical bytes — the property the hash-checked registry keys rely
on.
"""

from __future__ import annotations

import json
import struct
import zlib
from hashlib import md5

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- varints


def _zz(n: int) -> bytes:
    """Zigzag + varint encode a long."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


# ---------------------------------------------------------- value codec


def _branch_index(union: list, v) -> int:
    """Pick the union branch for a Python value (nullable unions and
    simple primitive unions only — all this repo writes)."""
    for i, s in enumerate(union):
        t = s.get("type") if isinstance(s, dict) else s
        if v is None and t == "null":
            return i
        if v is not None and t != "null":
            return i
    raise ValueError(f"no union branch for {v!r} in {union}")


def _encode(schema, v, out: bytearray) -> None:
    if isinstance(schema, list):  # union
        i = _branch_index(schema, v)
        out += _zz(i)
        _encode(schema[i], v, out)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        out += _zz(int(v))
    elif t == "float":
        out += struct.pack("<f", v)
    elif t == "double":
        out += struct.pack("<d", v)
    elif t == "string":
        b = v.encode("utf-8")
        out += _zz(len(b)) + b
    elif t == "bytes":
        out += _zz(len(v)) + bytes(v)
    elif t == "record":
        for f in schema["fields"]:
            _encode(f["type"], v[f["name"]], out)
    elif t == "array":
        if v:
            out += _zz(len(v))
            for item in v:
                _encode(schema["items"], item, out)
        out += _zz(0)
    elif t == "map":
        if v:
            out += _zz(len(v))
            for k, item in v.items():
                kb = k.encode("utf-8")
                out += _zz(len(kb)) + kb
                _encode(schema["values"], item, out)
        out += _zz(0)
    else:
        raise ValueError(f"unsupported avro type: {t}")


def _decode(schema, buf: bytes, pos: int) -> tuple[object, int]:
    if isinstance(schema, list):  # union
        i, pos = _read_long(buf, pos)
        return _decode(schema[i], buf, pos)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] == 1, pos + 1
    if t in ("int", "long"):
        return _read_long(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "string":
        n, pos = _read_long(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if t == "bytes":
        n, pos = _read_long(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _decode(f["type"], buf, pos)
        return rec, pos
    if t == "array":
        items = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix (spec-legal)
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                item, pos = _decode(schema["items"], buf, pos)
                items.append(item)
        return items, pos
    if t == "map":
        m = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                kn, pos = _read_long(buf, pos)
                k = buf[pos : pos + kn].decode("utf-8")
                pos += kn
                m[k], pos = _decode(schema["values"], buf, pos)
        return m, pos
    raise ValueError(f"unsupported avro type: {t}")


def _skip(schema, buf: bytes, pos: int) -> int:
    """Skip a value without materializing it (writer-only fields
    during schema resolution)."""
    _, pos = _decode(schema, buf, pos)
    return pos


# ------------------------------------------------------ schema resolution


def _type_name(schema) -> str:
    if isinstance(schema, list):
        return "union"
    return schema["type"] if isinstance(schema, dict) else schema


def _non_null(schema):
    """The non-null branch of a nullable union (or the schema itself)."""
    if isinstance(schema, list):
        for s in schema:
            if _type_name(s) != "null":
                return s
    return schema


_PROMOTE = {("int", "long"), ("int", "double"), ("long", "double"), ("float", "double")}


def _resolve(writer_schema, reader_schema, rec: dict) -> dict:
    """Project a decoded writer record onto the reader schema: match
    by name, drop writer-only fields, fill reader defaults, promote
    numerics.  Raises when a reader field has no writer match and no
    default (spec: resolution error)."""
    wfields = {f["name"]: f for f in writer_schema["fields"]}
    out = {}
    for rf in reader_schema["fields"]:
        name = rf["name"]
        if name in wfields:
            v = rec[name]
            wt = _type_name(_non_null(wfields[name]["type"]))
            rt = _type_name(_non_null(rf["type"]))
            if v is not None and wt != rt:
                if (wt, rt) not in _PROMOTE:
                    raise ValueError(f"cannot promote {wt} -> {rt} for {name}")
                v = float(v) if rt in ("float", "double") else int(v)
            out[name] = v
        elif "default" in rf:
            out[name] = rf["default"]
        else:
            raise ValueError(f"reader field {name} missing and has no default")
    return out


# ------------------------------------------------------- container file


def write_container(
    records: list[dict],
    schema: dict,
    codec: str = "deflate",
    block_records: int = 4096,
    extra_meta: dict[str, bytes] | None = None,
) -> bytes:
    """Encode records as one Avro object-container file (bytes).
    ``extra_meta`` adds application metadata pairs to the file header
    (spec-legal for any non-``avro.``-prefixed key — Iceberg manifests
    carry their table schema and partition spec this way)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec: {codec}")
    schema_json = json.dumps(schema, sort_keys=True, separators=(",", ":"))
    sync = md5(schema_json.encode()).digest()  # deterministic marker
    out = bytearray(MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    if extra_meta:
        for k, v in extra_meta.items():
            if k.startswith("avro."):
                raise ValueError(f"reserved metadata key: {k}")
            meta[k] = v
    out += _zz(len(meta))
    for k in sorted(meta):
        kb = k.encode()
        out += _zz(len(kb)) + kb + _zz(len(meta[k])) + meta[k]
    out += _zz(0)
    out += sync
    for i in range(0, len(records), block_records):
        chunk = records[i : i + block_records]
        payload = bytearray()
        for rec in chunk:
            _encode(schema, rec, payload)
        body = zlib.compress(bytes(payload), 6)[2:-4] if codec == "deflate" else bytes(payload)
        out += _zz(len(chunk)) + _zz(len(body)) + body + sync
    if not records:  # still a valid, readable empty container
        pass
    return bytes(out)


def read_container(data: bytes, reader_schema: dict | None = None) -> tuple[dict, list[dict]]:
    """Decode an Avro object-container file -> (writer schema,
    records).  With ``reader_schema``, records are resolved onto it
    (name matching, defaults, numeric promotion)."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(data, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = _read_long(data, pos)
            n = -n
        for _ in range(n):
            kn, pos = _read_long(data, pos)
            k = data[pos : pos + kn].decode()
            pos += kn
            vn, pos = _read_long(data, pos)
            meta[k] = data[pos : pos + vn]
            pos += vn
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec: {codec}")
    sync = data[pos : pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(data):
        count, pos = _read_long(data, pos)
        size, pos = _read_long(data, pos)
        body = data[pos : pos + size]
        pos += size
        if codec == "deflate":
            body = zlib.decompress(body, -15)
        bpos = 0
        for _ in range(count):
            rec, bpos = _decode(schema, body, bpos)
            if reader_schema is not None:
                rec = _resolve(schema, reader_schema, rec)
            records.append(rec)
        if data[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt block boundary)")
        pos += 16
    return schema, records

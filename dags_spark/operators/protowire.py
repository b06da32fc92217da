"""Protocol Buffers wire format, implemented from the public spec.

No protobuf runtime ships in this sandbox (`google.protobuf` is
absent — probe refreshed round 8), and Spark's own protobuf module
needs the spark-protobuf jar + descriptor files. The WIRE FORMAT
itself, though, is a public, stable, ~one-page spec
(https://protobuf.dev/programming-guides/encoding/): a message is a
concatenation of (tag, value) pairs where tag = (field_number << 3)
| wire_type, and only four wire types matter:

    0  VARINT   int32/int64/uint/bool/enum (LEB128, LSB-first,
                7 bits per byte, MSB = continuation)
    1  I64      fixed64/sfixed64/double (little-endian)
    2  LEN      string/bytes/embedded message (varint length prefix)
    5  I32      fixed32/sfixed32/float (little-endian)

sint fields zigzag-encode first (n -> (n << 1) ^ (n >> 63)) so small
negatives stay small. Unknown fields are SKIPPED by wire type — that
single rule is protobuf's whole schema-evolution story, and the test
suite certifies it (a v2 writer's extra fields are invisible to a v1
reader). Decoding is schema-driven: the caller supplies
{field_number: (name, kind)} and gets dicts back.

The STREAM framing used by the source key is the de-facto standard
"delimited" convention (java's writeDelimitedTo / parseDelimitedFrom):
each message is prefixed by its varint byte length, so a shard is
just back-to-back length-delimited messages — splittable at file
granularity, streamable within a file.

Certified in tests/test_protowire.py against the spec's own golden
vectors (field 1 = varint 150 <=> `08 96 01`, field 2 = "testing"
<=> `12 07 74 65 73 74 69 6e 67`) plus zigzag/roundtrip/unknown-field
properties. Kinds: int64, sint64, bool, double, float, string, bytes.
"""

from __future__ import annotations

import struct

_WIRE_VARINT = 0
_WIRE_I64 = 1
_WIRE_LEN = 2
_WIRE_I32 = 5

_KIND_WIRE = {
    "int64": _WIRE_VARINT,
    "sint64": _WIRE_VARINT,
    "bool": _WIRE_VARINT,
    "double": _WIRE_I64,
    "float": _WIRE_I32,
    "string": _WIRE_LEN,
    "bytes": _WIRE_LEN,
}

_MASK64 = (1 << 64) - 1


def encode_varint(n: int) -> bytes:
    """LEB128: 7 bits per byte, LSB-first, MSB set = more bytes.
    Negative int64 values encode as their 64-bit two's complement
    (always 10 bytes), per spec."""
    if n < 0:
        n &= _MASK64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Returns (value, new_pos). Raises ValueError on truncation or
    a varint longer than the spec's 10-byte maximum."""
    result = 0
    shift = 0
    start = pos
    while True:
        if pos >= len(buf):
            raise ValueError("varint: truncated")
        if pos - start >= 10:
            raise ValueError("varint: longer than 10 bytes")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result & _MASK64, pos
        shift += 7


def zigzag(n: int) -> int:
    return ((n << 1) ^ (n >> 63)) & _MASK64


def unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def encode_record(rec: dict, schema: dict[int, tuple[str, str]]) -> bytes:
    """Encode one message. ``schema`` maps field_number -> (name,
    kind). A None value (or a name missing from ``rec``) is simply
    not emitted — proto3 field-presence semantics."""
    out = bytearray()
    for fno in sorted(schema):
        name, kind = schema[fno]
        v = rec.get(name)
        if v is None:
            continue
        wire = _KIND_WIRE[kind]
        out += encode_varint((fno << 3) | wire)
        if kind == "int64":
            out += encode_varint(int(v))
        elif kind == "sint64":
            out += encode_varint(zigzag(int(v)))
        elif kind == "bool":
            out += encode_varint(1 if v else 0)
        elif kind == "double":
            out += struct.pack("<d", float(v))
        elif kind == "float":
            out += struct.pack("<f", float(v))
        else:  # string / bytes
            data = v.encode("utf-8") if kind == "string" else bytes(v)
            out += encode_varint(len(data))
            out += data
    return bytes(out)


def _skip_field(buf: bytes, pos: int, wire: int) -> int:
    """Advance past an unknown field's value — the spec's
    schema-evolution rule (new fields are invisible to old readers)."""
    if wire == _WIRE_VARINT:
        _, pos = decode_varint(buf, pos)
        return pos
    if wire == _WIRE_I64:
        return pos + 8
    if wire == _WIRE_LEN:
        n, pos = decode_varint(buf, pos)
        return pos + n
    if wire == _WIRE_I32:
        return pos + 4
    raise ValueError(f"unsupported wire type {wire}")


def decode_record(buf: bytes, schema: dict[int, tuple[str, str]]) -> dict:
    """Decode one message against ``schema``; unknown field numbers
    are skipped by wire type, missing fields come back as None."""
    rec: dict = {name: None for name, _ in schema.values()}
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = decode_varint(buf, pos)
        fno, wire = tag >> 3, tag & 7
        if fno == 0:
            raise ValueError("field number 0 is reserved")
        spec = schema.get(fno)
        if spec is None:
            pos = _skip_field(buf, pos, wire)
            continue
        name, kind = spec
        if _KIND_WIRE[kind] != wire:
            raise ValueError(
                f"field {fno} ({name}): wire type {wire}, expected "
                f"{_KIND_WIRE[kind]}"
            )
        if wire == _WIRE_VARINT:
            v, pos = decode_varint(buf, pos)
            if kind == "sint64":
                rec[name] = unzigzag(v)
            elif kind == "bool":
                rec[name] = bool(v)
            else:
                rec[name] = _to_signed64(v)
        elif wire == _WIRE_I64:
            if pos + 8 > n:
                raise ValueError("fixed64: truncated")
            rec[name] = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif wire == _WIRE_I32:
            if pos + 4 > n:
                raise ValueError("fixed32: truncated")
            rec[name] = struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        else:  # LEN
            ln, pos = decode_varint(buf, pos)
            if pos + ln > n:
                raise ValueError("length-delimited: truncated")
            data = buf[pos : pos + ln]
            pos += ln
            rec[name] = data.decode("utf-8") if kind == "string" else data
    if pos != n:
        raise ValueError("message: trailing garbage")
    return rec


def write_delimited(records: list[dict], schema: dict) -> bytes:
    """Length-delimited stream: varint(len) + message, repeated."""
    out = bytearray()
    for rec in records:
        msg = encode_record(rec, schema)
        out += encode_varint(len(msg))
        out += msg
    return bytes(out)


def read_delimited(buf: bytes, schema: dict) -> list[dict]:
    recs = []
    pos = 0
    while pos < len(buf):
        ln, pos = decode_varint(buf, pos)
        if pos + ln > len(buf):
            raise ValueError("delimited stream: truncated message")
        recs.append(decode_record(buf[pos : pos + ln], schema))
        pos += ln
    return recs

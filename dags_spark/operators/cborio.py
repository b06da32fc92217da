"""CBOR (RFC 8949) encoder/decoder for the record subset a data
pipeline exchanges: unsigned/negative integers, UTF-8 text strings,
arrays, and maps — implemented from the public spec.

CBOR completes this engine's varint-family coverage with the THIRD
length-encoding scheme: protobuf is LSB-first LEB128
(operators/protowire.py), SMF is MSB-first 7-bit groups
(operators/midi.py), and CBOR heads carry a 5-bit "additional info"
field that either IS the value (< 24) or selects a 1/2/4/8-byte
big-endian follow-on (24/25/26/27). A decoder that only handles the
immediate form passes small fixtures and corrupts real data — the
fixtures here force the 1-, 2- and 4-byte forms.

Major types used (RFC 8949 §3.1): 0 unsigned int, 1 negative int
(value = -1 - n), 3 text string, 4 array, 5 map. Parsers follow the
house loud-typed-failure contract: ValueError on any truncation or
unsupported head, never IndexError.
"""

from __future__ import annotations


def _head(major: int, n: int) -> bytes:
    if n < 0:
        raise ValueError("CBOR: head length must be non-negative")
    if n < 24:
        return bytes([(major << 5) | n])
    for ai, size in ((24, 1), (25, 2), (26, 4), (27, 8)):
        if n < 1 << (8 * size):
            return bytes([(major << 5) | ai]) + n.to_bytes(size, "big")
    raise ValueError("CBOR: length too large")


def encode_item(obj) -> bytes:
    """Encode int / str / list / dict (deterministic: map keys are
    emitted in insertion order — callers build ordered dicts)."""
    if isinstance(obj, bool):
        raise ValueError("CBOR: bool not in the supported subset")
    if isinstance(obj, int):
        if obj >= 0:
            return _head(0, obj)
        return _head(1, -1 - obj)
    if isinstance(obj, str):
        b = obj.encode("utf-8")
        return _head(3, len(b)) + b
    if isinstance(obj, list):
        return _head(4, len(obj)) + b"".join(encode_item(x) for x in obj)
    if isinstance(obj, dict):
        out = _head(5, len(obj))
        for k, v in obj.items():
            out += encode_item(k) + encode_item(v)
        return out
    raise ValueError(f"CBOR: unsupported type {type(obj).__name__}")


def _read_head(data: bytes, p: int) -> tuple[int, int, int]:
    if p >= len(data):
        raise ValueError("CBOR: truncated head")
    major, ai = data[p] >> 5, data[p] & 0x1F
    p += 1
    if ai < 24:
        return major, ai, p
    size = {24: 1, 25: 2, 26: 4, 27: 8}.get(ai)
    if size is None:
        raise ValueError(f"CBOR: unsupported additional info {ai}")
    if p + size > len(data):
        raise ValueError("CBOR: truncated head argument")
    return major, int.from_bytes(data[p : p + size], "big"), p + size


def decode_item(data: bytes, p: int = 0):
    """Decode one item at offset p; returns (value, next_offset)."""
    major, n, p = _read_head(data, p)
    if major == 0:
        return n, p
    if major == 1:
        return -1 - n, p
    if major == 3:
        if p + n > len(data):
            raise ValueError("CBOR: truncated text string")
        try:
            return data[p : p + n].decode("utf-8"), p + n
        except UnicodeDecodeError as exc:
            raise ValueError("CBOR: invalid UTF-8 text") from exc
    if major == 4:
        out = []
        for _ in range(n):
            v, p = decode_item(data, p)
            out.append(v)
        return out, p
    if major == 5:
        m = {}
        for _ in range(n):
            k, p = decode_item(data, p)
            v, p = decode_item(data, p)
            m[k] = v
        return m, p
    raise ValueError(f"CBOR: unsupported major type {major}")


def decode_sequence(data: bytes) -> list:
    """Decode a CBOR Sequence (RFC 8742: items laid end-to-end with
    no framing — the newline-less NDJSON of CBOR)."""
    out = []
    p = 0
    while p < len(data):
        v, p = decode_item(data, p)
        out.append(v)
    return out

"""Minimal ASN.1 DER (X.690) encoder/walker, from the specification:
TLV structure with definite lengths — short form (< 0x80) and long
form (0x81/0x82 length-of-length). Covers the primitives a
certificate-inventory pipeline touches: INTEGER (0x02), UTF8String
(0x0C), OCTET STRING (0x04), SEQUENCE (0x30).

Used by queries.scans.source_pem_asn1: records are DER-encoded
executor-side, PEM-armored (RFC 7468 base64 between BEGIN/END
lines), written as a text source, read back, de-armored with
Spark's unbase64 and walked with these functions. Loud typed
failures on truncation (the round-8 ADVICE discipline: every index
is bounds-checked and raises ValueError, never IndexError).
"""

from __future__ import annotations


def _enc_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    if n < 0x100:
        return bytes([0x81, n])
    if n < 0x10000:
        return bytes([0x82, n >> 8, n & 0xFF])
    raise ValueError("DER: length beyond 2-byte long form")


def der_integer(v: int) -> bytes:
    if v < 0:
        raise ValueError("DER: only non-negative INTEGERs supported")
    body = b"\x00" if v == 0 else v.to_bytes((v.bit_length() + 8) // 8, "big")
    # minimal two's-complement: strip a redundant leading zero unless
    # needed as sign byte
    while len(body) > 1 and body[0] == 0 and body[1] < 0x80:
        body = body[1:]
    return b"\x02" + _enc_len(len(body)) + body


def der_utf8(s: str) -> bytes:
    b = s.encode("utf-8")
    return b"\x0c" + _enc_len(len(b)) + b


def der_octets(b: bytes) -> bytes:
    return b"\x04" + _enc_len(len(b)) + b


def der_sequence(*members: bytes) -> bytes:
    body = b"".join(members)
    return b"\x30" + _enc_len(len(body)) + body


def _read_tlv(buf: bytes, p: int) -> tuple[int, int, int]:
    """Return (tag, content_offset, content_len); raise ValueError on
    any truncation or non-minimal/indefinite length."""
    if p >= len(buf):
        raise ValueError("DER: truncated at tag")
    tag = buf[p]
    p += 1
    if p >= len(buf):
        raise ValueError("DER: truncated at length")
    first = buf[p]
    p += 1
    if first < 0x80:
        length = first
    elif first in (0x81, 0x82):
        nbytes = first & 0x7F
        if p + nbytes > len(buf):
            raise ValueError("DER: truncated long-form length")
        length = int.from_bytes(buf[p : p + nbytes], "big")
        # DER minimal-length rule: long form is only legal when the
        # value does not fit the shorter encoding (0x81 needs >= 0x80,
        # 0x82 needs >= 0x100) — enforce what the docstring promises.
        if length < (0x80 if first == 0x81 else 0x100):
            raise ValueError(
                f"DER: non-minimal long-form length {length} after {first:#x}"
            )
        p += nbytes
    else:
        raise ValueError(f"DER: unsupported length octet {first:#x}")
    if p + length > len(buf):
        raise ValueError("DER: content overruns buffer")
    return tag, p, length


def parse_record(buf: bytes) -> dict:
    """Walk the pipeline's record shape:
    SEQUENCE { INTEGER serial, UTF8String subject, OCTET STRING payload }.
    Returns dict(serial, subject, payload_len, total_len)."""
    tag, off, length = _read_tlv(buf, 0)
    if tag != 0x30:
        raise ValueError(f"DER: expected SEQUENCE, got tag {tag:#x}")
    end = off + length
    p = off
    tag, coff, clen = _read_tlv(buf, p)
    if tag != 0x02:
        raise ValueError("DER: expected INTEGER serial")
    serial = int.from_bytes(buf[coff : coff + clen], "big")
    p = coff + clen
    tag, coff, clen = _read_tlv(buf, p)
    if tag != 0x0C:
        raise ValueError("DER: expected UTF8String subject")
    subject = buf[coff : coff + clen].decode("utf-8")
    p = coff + clen
    tag, coff, clen = _read_tlv(buf, p)
    if tag != 0x04:
        raise ValueError("DER: expected OCTET STRING payload")
    payload_len = clen
    p = coff + clen
    if p != end:
        raise ValueError("DER: trailing bytes inside SEQUENCE")
    return {
        "serial": serial,
        "subject": subject,
        "payload_len": payload_len,
        "total_len": end,
    }

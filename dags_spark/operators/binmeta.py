"""Small binary-metadata containers, built and parsed from their
public specs: ICO (icon directories), ID3v2 (tag frames with
SYNCSAFE integers), and AIFF (IFF chunks with the 80-bit IEEE 754
extended-precision sample rate).

Each format earns its place with a spec trap the arithmetic oracles
can certify:

- ICO stores a 256-pixel dimension as byte 0 (ICONDIRENTRY width /
  height are u8 with 0 meaning 256) — a parser that reads the byte
  naively under-reports the largest icons.
- ID3v2 sizes are SYNCSAFE: 4 bytes of 7 bits each, MSB always 0, so
  tag/frame sizes never contain a 0xFF byte that could alias an MPEG
  frame sync. Reading them as plain big-endian u32 works for sizes
  <= 127 and silently corrupts beyond — the fixture forces multi-byte
  sizes so that bug cannot pass.
- AIFF's COMM chunk carries the sample rate as an 80-bit extended
  float (1 sign + 15 exponent + 64 mantissa bits, explicit integer
  bit) — the only mainstream container that does; both encode and
  decode are implemented from the IEEE 754 layout and must
  round-trip common audio rates bit-exactly.

All functions are pure bytes -> dict / dict -> bytes; the Spark side
runs them inside Arrow kernels (one file per row), and every parser
follows the house loud-typed-failure contract (ValueError on any
corruption, never IndexError/struct.error).
"""

from __future__ import annotations

import struct

# --- ICO --------------------------------------------------------------


def build_ico(entries: list[tuple[int, int, int, int]]) -> bytes:
    """ICONDIR + ICONDIRENTRY table + opaque payloads. Entries are
    (width, height, bpp, payload_len); width/height of 256 are
    encoded as byte 0 per spec. Payload bytes are a deterministic
    fill — the directory walk is what is under test."""
    if not entries:
        raise ValueError("ICO: at least one image required")
    out = bytearray(struct.pack("<HHH", 0, 1, len(entries)))
    offset = 6 + 16 * len(entries)
    payloads = bytearray()
    for w, h, bpp, n in entries:
        if not (1 <= w <= 256 and 1 <= h <= 256):
            raise ValueError("ICO: dimensions must be in [1, 256]")
        out += struct.pack(
            "<BBBBHHII",
            w % 256,  # 256 -> 0 per spec
            h % 256,
            0,
            0,
            1,
            bpp,
            n,
            offset,
        )
        payloads += bytes((i * 7 + n) % 251 for i in range(n))
        offset += n
    return bytes(out) + bytes(payloads)


def parse_ico(data: bytes) -> dict:
    """Walk the icon directory; returns n_images, max dimensions
    (0-means-256 applied), total payload bytes, distinct bpp."""
    if len(data) < 6:
        raise ValueError("ICO: truncated header")
    reserved, ico_type, count = struct.unpack("<HHH", data[:6])
    if reserved != 0 or ico_type != 1:
        raise ValueError("ICO: bad header (reserved/type)")
    if count == 0:
        raise ValueError("ICO: empty directory")
    if 6 + 16 * count > len(data):
        raise ValueError("ICO: truncated directory")
    max_w = max_h = 0
    total = 0
    bpps = set()
    for i in range(count):
        off = 6 + 16 * i
        w, h, _cc, _rsv, _planes, bpp, nbytes, img_off = struct.unpack(
            "<BBBBHHII", data[off : off + 16]
        )
        w = w or 256  # the 0-means-256 rule
        h = h or 256
        if img_off + nbytes > len(data):
            raise ValueError("ICO: payload out of bounds")
        max_w, max_h = max(max_w, w), max(max_h, h)
        total += nbytes
        bpps.add(bpp)
    return {
        "n_images": count,
        "max_width": max_w,
        "max_height": max_h,
        "payload_bytes": total,
        "distinct_bpp": len(bpps),
    }


# --- ID3v2 ------------------------------------------------------------


def _syncsafe_encode(n: int) -> bytes:
    if n < 0 or n >= 1 << 28:
        raise ValueError("syncsafe: out of range")
    return bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))


def _syncsafe_decode(b: bytes) -> int:
    if len(b) != 4:
        raise ValueError("syncsafe: need 4 bytes")
    if any(x & 0x80 for x in b):
        raise ValueError("syncsafe: MSB set")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def build_id3v2(frames: list[tuple[str, bytes]]) -> bytes:
    """ID3v2.4 tag: 10-byte header with a SYNCSAFE total size, then
    frames of (4-char id, syncsafe size, 2 flag bytes, payload)."""
    body = bytearray()
    for fid, payload in frames:
        if len(fid) != 4 or not fid.isascii():
            raise ValueError("ID3: frame id must be 4 ASCII chars")
        body += fid.encode("ascii")
        body += _syncsafe_encode(len(payload))
        body += b"\x00\x00"
        body += payload
    return b"ID3\x04\x00\x00" + _syncsafe_encode(len(body)) + bytes(body)


def parse_id3v2(data: bytes) -> dict:
    """Walk the tag; returns version, frame count/ids, payload byte
    sum, and the UTF-8 text of any T*** text frames."""
    if data[:3] != b"ID3":
        raise ValueError("ID3: bad magic")
    if len(data) < 10:
        raise ValueError("ID3: truncated header")
    ver_major, _rev, flags = data[3], data[4], data[5]
    if flags & 0x80:
        raise ValueError("ID3: unsynchronisation unsupported")
    size = _syncsafe_decode(data[6:10])
    if 10 + size > len(data):
        raise ValueError("ID3: truncated tag body")
    body = data[10 : 10 + size]
    p = 0
    n_frames = 0
    payload_bytes = 0
    texts: dict[str, str] = {}
    while p + 10 <= len(body):
        fid = body[p : p + 4]
        if fid == b"\x00\x00\x00\x00":  # padding
            break
        flen = _syncsafe_decode(body[p + 4 : p + 8])
        p += 10
        if p + flen > len(body):
            raise ValueError("ID3: truncated frame")
        payload = body[p : p + flen]
        p += flen
        n_frames += 1
        payload_bytes += flen
        if fid[:1] == b"T" and flen >= 1 and payload[0] == 0x03:
            try:
                texts[fid.decode("ascii")] = payload[1:].decode("utf-8")
            except UnicodeDecodeError as exc:
                raise ValueError("ID3: invalid UTF-8 text frame") from exc
    return {
        "version": ver_major,
        "n_frames": n_frames,
        "payload_bytes": payload_bytes,
        "texts": texts,
    }


# --- AIFF -------------------------------------------------------------


def _f80_encode(x: float) -> bytes:
    """IEEE 754 extended (80-bit, m68k layout): sign+15-bit biased
    exponent, 64-bit mantissa with EXPLICIT integer bit. Exact for
    every positive value representable in a double (audio rates
    are)."""
    if x <= 0:
        raise ValueError("f80: positive values only")
    import math

    mant, exp = math.frexp(x)  # x = mant * 2**exp, mant in [0.5, 1)
    # shift mantissa into a 64-bit integer with the integer bit set
    m64 = int(mant * (1 << 64))
    e = exp - 1 + 16383
    if not (0 < e < 0x7FFF):
        raise ValueError("f80: exponent out of range")
    return struct.pack(">H", e) + m64.to_bytes(8, "big")


def _f80_decode(b: bytes) -> float:
    if len(b) != 10:
        raise ValueError("f80: need 10 bytes")
    (e,) = struct.unpack(">H", b[:2])
    if e & 0x8000:
        raise ValueError("f80: negative sample rate")
    m64 = int.from_bytes(b[2:10], "big")
    if m64 == 0:
        return 0.0
    return m64 * 2.0 ** (e - 16383 - 63)


def build_aiff(
    channels: int, frames: int, sample_size: int, rate: float
) -> bytes:
    """FORM/AIFF with a COMM chunk (the 80-bit rate) and an SSND
    chunk holding a deterministic fill of the right length."""
    comm = (
        b"COMM"
        + struct.pack(">I", 18)
        + struct.pack(">HIH", channels, frames, sample_size)
        + _f80_encode(rate)
    )
    data_len = frames * channels * (sample_size // 8)
    ssnd = (
        b"SSND"
        + struct.pack(">I", 8 + data_len)
        + struct.pack(">II", 0, 0)
        + bytes((i * 13 + 7) % 256 for i in range(data_len))
    )
    body = b"AIFF" + comm + ssnd
    return b"FORM" + struct.pack(">I", len(body)) + body


def parse_aiff(data: bytes) -> dict:
    """IFF chunk walk; returns COMM fields with the sample rate
    decoded from the 80-bit extended float, plus SSND byte length.
    Chunks are padded to even offsets per the IFF spec."""
    if data[:4] != b"FORM" or len(data) < 12:
        raise ValueError("AIFF: bad FORM header")
    (form_len,) = struct.unpack(">I", data[4:8])
    if 8 + form_len > len(data):
        raise ValueError("AIFF: truncated FORM")
    if data[8:12] != b"AIFF":
        raise ValueError("AIFF: not an AIFF form")
    p = 12
    out: dict = {}
    while p + 8 <= 8 + form_len:
        cid = data[p : p + 4]
        (clen,) = struct.unpack(">I", data[p + 4 : p + 8])
        body = data[p + 8 : p + 8 + clen]
        if len(body) != clen:
            raise ValueError("AIFF: truncated chunk")
        if cid == b"COMM":
            if clen != 18:
                raise ValueError("AIFF: COMM length != 18")
            ch, fr, ss = struct.unpack(">HIH", body[:8])
            out.update(
                channels=ch,
                sample_frames=fr,
                sample_size=ss,
                sample_rate=_f80_decode(body[8:18]),
            )
        elif cid == b"SSND":
            out["ssnd_bytes"] = clen - 8
        p += 8 + clen + (clen & 1)  # IFF even padding
    if "channels" not in out:
        raise ValueError("AIFF: no COMM chunk")
    return out

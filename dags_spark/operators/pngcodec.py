"""PNG pixel codec, pure Python + stdlib zlib (W3C PNG spec, 3rd ed.).

Completes the image-format pixel matrix: BMP (resize kernel), GIF
(real LZW), JPEG (from-spec baseline DCT) — and now PNG, the last
format whose pixel path sat behind the absent-PIL probe. PNG needs
no codec library at all: its only compression layer is DEFLATE,
which ships in the Python stdlib (``zlib``), so both directions are
implementable from the spec alone.

Writer (``encode_png_pixels``): 8-bit greyscale (colour type 0),
truecolor RGB (2) and RGBA (6); per-scanline filter selection across
ALL FIVE spec filter types (None/Sub/Up/Average/Paeth, spec §9) so a
conforming decoder must implement the full filter algebra to read
our files; CRC-32 on every chunk; the IDAT stream is deliberately
split across two chunks to pin multi-IDAT concatenation on the read
side (spec §5.6: chunk boundaries carry no semantics).

Reader (``decode_png_pixels``): signature + IHDR validation, chunk
CRC verification, consecutive multi-IDAT concatenation, inflate,
scanline unfilter with the spec's Paeth predictor tie-breaking
order (§9.4). Failures are LOUD AND TYPED (``ValueError``), same
contract as the sibling codecs: bad signature, chunk CRC mismatch,
truncation, non-8-bit depth, palette/interlace (rejected explicitly,
not skipped), filter bytes outside 0..4, and pixel-payload length
drift after inflate.

Certification (tests/test_operators.py): PNG is lossless, so parity
with the JVM's ``javax.imageio`` PNG reader is BIT-EXACT in both
directions — ImageIO must reproduce every pixel of our files, and
files ImageIO writes must decode through us pixel-identically.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
# colour type -> samples per pixel (8-bit depth only; palette (3) and
# the 16-bit depths are rejected, not silently misread).
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor, spec §9.4 — the <=-ordering of the three
    distance comparisons is normative (a wins ties, then b)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    if ftype == 0:
        return row
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"png: filter type {ftype} out of range")
        out[i] = (x - pred) & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, flt: bytes, prev: bytes, bpp: int) -> bytes:
    if ftype == 0:
        return flt
    if ftype not in (1, 2, 3, 4):
        raise ValueError(f"png: filter type {ftype} out of range")
    out = bytearray(len(flt))
    for i, x in enumerate(flt):
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            pred = _paeth(a, b, c)
        out[i] = (x + pred) & 0xFF
    return bytes(out)


def encode_png_pixels(
    width: int,
    height: int,
    rows: list,
    color_type: int = 2,
    filters: list | None = None,
) -> bytes:
    """Encode ``rows`` (one ``bytes``-like of ``width * channels``
    samples per scanline) as a PNG. ``filters`` picks the per-row
    filter type; the default ``y % 5`` cycles through all five spec
    filters so every written image exercises the full algebra."""
    if color_type not in _CHANNELS:
        raise ValueError(f"png: unsupported colour type {color_type}")
    ch = _CHANNELS[color_type]
    if len(rows) != height:
        raise ValueError("png: row count != height")
    if filters is None:
        filters = [y % 5 for y in range(height)]
    raw = bytearray()
    prev = bytes(width * ch)
    for y in range(height):
        row = bytes(rows[y])
        if len(row) != width * ch:
            raise ValueError(f"png: scanline {y} is {len(row)} bytes,"
                             f" want {width * ch}")
        f = int(filters[y])
        raw.append(f)
        raw += _filter_row(f, row, prev, ch)
        prev = row
    idat = zlib.compress(bytes(raw), 9)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    mid = max(1, len(idat) // 2)  # two IDATs: boundaries carry no meaning
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat[:mid])
        + _chunk(b"IDAT", idat[mid:])
        + _chunk(b"IEND", b"")
    )


def decode_png_pixels(data: bytes) -> dict:
    """Decode a PNG into ``{"width", "height", "color_type",
    "rows"}`` where rows are raw 8-bit sample bytes per scanline.
    Strict: every chunk CRC is verified, IDATs must be consecutive
    (spec §5.6), palette/interlace/16-bit are rejected loudly."""
    if data[:8] != _SIG:
        raise ValueError("png: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    idat_done = False
    seen_end = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("png: truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("png: truncated chunk body")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: CRC mismatch in {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            if ihdr is not None:
                raise ValueError("png: duplicate IHDR")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            if idat_done:
                raise ValueError("png: non-consecutive IDAT chunks")
            idat += body
        elif tag == b"PLTE":
            raise ValueError("png: palette images unsupported")
        elif tag == b"IEND":
            seen_end = True
            break
        else:
            # ancillary chunks (tEXt, gAMA, ...) are skippable by
            # definition; critical unknown chunks are not.
            if not tag[0] & 0x20:
                raise ValueError(f"png: unknown critical chunk {tag!r}")
        if idat and tag != b"IDAT":
            idat_done = True
    if ihdr is None:
        raise ValueError("png: missing IHDR")
    if not seen_end:
        raise ValueError("png: missing IEND")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"png: bit depth {depth} unsupported (8 only)")
    if color_type not in _CHANNELS:
        raise ValueError(f"png: colour type {color_type} unsupported")
    if comp != 0 or filt != 0:
        raise ValueError("png: unknown compression/filter method")
    if interlace != 0:
        raise ValueError("png: Adam7 interlace unsupported")
    ch = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # corrupt DEFLATE stream
        raise ValueError(f"png: IDAT inflate failed: {e}") from None
    stride = 1 + width * ch
    if len(raw) != stride * height:
        raise ValueError(
            f"png: pixel payload is {len(raw)} bytes, want {stride * height}"
        )
    rows = []
    prev = bytes(width * ch)
    for y in range(height):
        line = raw[y * stride : (y + 1) * stride]
        row = _unfilter_row(line[0], line[1:], prev, ch)
        rows.append(row)
        prev = row
    return {
        "width": width,
        "height": height,
        "color_type": color_type,
        "rows": rows,
    }

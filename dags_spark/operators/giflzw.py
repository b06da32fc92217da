"""GIF89a pixel codec with real LZW, pure Python (GIF spec App. F).

Upgrades the GIF story from container walking (multimodal.py
walk_gif — block grammar, no decompression) to actual PIXELS: a
from-spec LZW encoder/decoder (variable-width codes packed LSB-first
into 255-byte sub-blocks, clear/EOI codes, dictionary growth to 4096
with clear-reset, the cScSc just-added-code case) plus a full GIF89a
writer/reader for paletted multi-frame images.

Certification (tests/test_operators.py): the JVM's javax.imageio
decodes our files and the palette-mapped RGB must match our own
decode EXACTLY — LZW is lossless, so unlike the JPEG bound this
parity is bit-for-bit. Both directions of the LZW layer are also
pinned by an encode->decode identity on adversarial index streams
(single color runs that exercise the cScSc case and dictionary
overflow clears).
"""

from __future__ import annotations


def lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF-variant LZW: emits CLEAR first, resets the dictionary at
    4096 codes, ends with EOI; codes packed LSB-first."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> tuple[dict, int, int]:
        return {(i,): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    put(clear, width)
    prefix: tuple[int, ...] = ()
    for sym in indices:
        cand = prefix + (sym,)
        if cand in table:
            prefix = cand
            continue
        put(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code > 4095:
            put(clear, width)
            table, next_code, width = fresh()
        prefix = (sym,)
    if prefix:
        put(table[prefix], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """Inverse of lzw_encode (any spec-conforming stream)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def get(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    def fresh() -> tuple[dict, int, int]:
        return {i: (i,) for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    while True:
        code = get(width)
        if code == clear:
            table, next_code, width = fresh()
            prev = None
            continue
        if code == eoi:
            return out
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)  # the cScSc case
        else:
            raise ValueError(f"invalid LZW code {code}")
        out.extend(entry)
        if prev is not None and next_code <= 4095:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif_pixels(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    frames: list[list[int]],
) -> bytes:
    """Full valid GIF89a: global color table (padded to a power of
    two), one graphic-control + image-descriptor + LZW block chain
    per frame, trailer."""
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    table_n = 1 << bits
    min_code = max(2, bits)
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])
    for i in range(table_n):
        r, g, b = palette[i] if i < n else (0, 0, 0)
        out += bytes([r, g, b])
    for idx in frames:
        assert len(idx) == width * height
        out += bytes([0x21, 0xF9, 0x04, 0x00, 0x0A, 0x00, 0x00, 0x00])
        out += b"\x2c" + bytes(4)
        out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
        out += bytes([0x00])  # no local table, not interlaced
        out += bytes([min_code])
        out += _subblocks(lzw_encode(idx, min_code))
    out += b"\x3b"
    return bytes(out)


def decode_gif_pixels(buf: bytes) -> dict:
    """Parse + LZW-decode a (non-interlaced, global-table) GIF ->
    {width, height, palette, frames: [index list per frame]}."""
    if buf[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    width = int.from_bytes(buf[6:8], "little")
    height = int.from_bytes(buf[8:10], "little")
    packed = buf[10]
    pos = 13
    palette: list[tuple[int, int, int]] = []
    if packed & 0x80:
        table_n = 2 << (packed & 0x07)
        for i in range(table_n):
            palette.append((buf[pos], buf[pos + 1], buf[pos + 2]))
            pos += 3
    frames: list[list[int]] = []
    while True:
        if pos >= len(buf):
            raise ValueError("missing trailer")
        b = buf[pos]
        pos += 1
        if b == 0x3B:
            return {
                "width": width,
                "height": height,
                "palette": palette,
                "frames": frames,
            }
        if b == 0x21:  # extension
            pos += 1
            while buf[pos]:
                pos += 1 + buf[pos]
            pos += 1
        elif b == 0x2C:
            fw = int.from_bytes(buf[pos + 4 : pos + 6], "little")
            fh = int.from_bytes(buf[pos + 6 : pos + 8], "little")
            fpacked = buf[pos + 8]
            pos += 9
            if fpacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if fpacked & 0x80:
                # Loud failure like the interlace check: decoding these
                # indices against the global palette would be silently
                # wrong (ADVICE r7).
                raise ValueError("local color table unsupported")
            min_code = buf[pos]
            pos += 1
            data = bytearray()
            while True:
                if pos >= len(buf):
                    raise ValueError("truncated sub-block chain")
                n = buf[pos]
                if not n:
                    break
                if pos + 1 + n > len(buf):
                    raise ValueError("truncated sub-block chain")
                data += buf[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = lzw_decode(bytes(data), min_code)
            if len(idx) != fw * fh:
                raise ValueError(
                    f"frame decoded {len(idx)} pixels, descriptor says {fw * fh}"
                )
            frames.append(idx)
        else:
            raise ValueError(f"unknown block introducer 0x{b:02X} at {pos - 1}")

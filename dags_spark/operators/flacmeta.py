"""FLAC metadata-block walker, from the public format spec
(xiph.org FLAC format: a "fLaC" stream marker followed by metadata
blocks, each a 1-byte header — MSB = last-metadata-block flag,
low 7 bits = block type — plus a 24-bit BIG-ENDIAN length and the
payload). STREAMINFO (type 0, mandatory first, 34 bytes) is a dense
bit-packed struct:

    16 bits  min block size        16 bits  max block size
    24 bits  min frame size        24 bits  max frame size
    20 bits  sample rate (Hz)       3 bits  channels - 1
     5 bits  bits-per-sample - 1   36 bits  total samples
   128 bits  md5 of unencoded audio

— the 20/3/5/36 split straddles byte boundaries, which is the whole
parsing exercise (read the 8 bytes as one big-endian integer and
shift). VORBIS_COMMENT (type 4) is the one LITTLE-endian island in
an otherwise big-endian format (it inherits Vorbis conventions):
u32le vendor length + vendor + u32le comment count + u32le-prefixed
"KEY=value" entries. The builder emits STREAMINFO + VORBIS_COMMENT +
PADDING so the parser's block walk, both endiannesses, and the
last-block flag are all exercised; parse_flac_meta raises loud typed
errors for every corruption mode (bad magic, truncated block,
STREAMINFO not first, wrong STREAMINFO length).

This is a metadata-only container (no audio frames follow), which is
exactly the decode-to-features slice a 100 TB multimodal pipeline
runs per binary cell; compressed-frame decode needs a codec library
this sandbox doesn't ship (probe recorded) and is out of scope the
same way VP9/H.264 pixel decode is for MP4/WebM.
"""

from __future__ import annotations

import struct


def _be24(n: int) -> bytes:
    return bytes(((n >> 16) & 0xFF, (n >> 8) & 0xFF, n & 0xFF))


def build_flac_meta(
    sample_rate: int,
    channels: int,
    bits_per_sample: int,
    total_samples: int,
    md5_digest: bytes = b"\x00" * 16,
    comments: list[tuple[str, str]] | None = None,
    min_block: int = 4096,
    max_block: int = 4096,
) -> bytes:
    """Assemble a metadata-only FLAC stream (STREAMINFO +
    VORBIS_COMMENT + terminal PADDING)."""
    if not (1 <= channels <= 8 and 4 <= bits_per_sample <= 32):
        raise ValueError("channels/bits out of FLAC range")
    if sample_rate >= 1 << 20 or total_samples >= 1 << 36:
        raise ValueError("sample rate / total samples out of field range")
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | total_samples
    )
    si = (
        struct.pack(">HH", min_block, max_block)
        + _be24(0)
        + _be24(0)
        + struct.pack(">Q", packed)
        + md5_digest
    )
    assert len(si) == 34
    out = bytearray(b"fLaC")
    out += bytes([0x00]) + _be24(len(si)) + si  # STREAMINFO, not last
    vendor = b"dags_spark flacmeta"
    vc = struct.pack("<I", len(vendor)) + vendor
    entries = comments or []
    vc += struct.pack("<I", len(entries))
    for k, v in entries:
        e = f"{k}={v}".encode("utf-8")
        vc += struct.pack("<I", len(e)) + e
    out += bytes([0x04]) + _be24(len(vc)) + vc  # VORBIS_COMMENT
    pad = b"\x00" * 8
    out += bytes([0x80 | 0x01]) + _be24(len(pad)) + pad  # PADDING, last
    return bytes(out)


def parse_flac_meta(data: bytes) -> dict:
    """Walk the metadata blocks and unpack STREAMINFO + comments."""
    if data[:4] != b"fLaC":
        raise ValueError("FLAC: bad stream marker")
    pos = 4
    streaminfo = None
    comments: dict[str, str] = {}
    n_blocks = 0
    first = True
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC: truncated block header")
        hdr = data[pos]
        btype = hdr & 0x7F
        last = bool(hdr & 0x80)
        ln = int.from_bytes(data[pos + 1 : pos + 4], "big")
        pos += 4
        body = data[pos : pos + ln]
        if len(body) != ln:
            raise ValueError("FLAC: truncated block body")
        pos += ln
        n_blocks += 1
        if first and btype != 0:
            raise ValueError("FLAC: STREAMINFO must be the first block")
        first = False
        if btype == 0:
            if ln != 34:
                raise ValueError("FLAC: STREAMINFO length != 34")
            min_block, max_block = struct.unpack(">HH", body[0:4])
            (packed,) = struct.unpack(">Q", body[10:18])
            streaminfo = {
                "min_block": min_block,
                "max_block": max_block,
                "sample_rate": packed >> 44,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bits_per_sample": ((packed >> 36) & 0x1F) + 1,
                "total_samples": packed & ((1 << 36) - 1),
                "audio_md5": body[18:34].hex(),
            }
        elif btype == 4:
            # Every length-prefixed read is bounds-checked so a body
            # cut mid-walk raises the contract's typed ValueError —
            # struct.unpack_from on a short buffer would surface
            # struct.error, and a short slice would silently decode a
            # truncated entry.
            def _u32(buf: bytes, at: int) -> int:
                if at + 4 > len(buf):
                    raise ValueError("FLAC: truncated VORBIS_COMMENT")
                (val,) = struct.unpack_from("<I", buf, at)
                return val

            p = 0
            vlen = _u32(body, p)
            p += 4 + vlen
            n = _u32(body, p)
            p += 4
            for _ in range(n):
                elen = _u32(body, p)
                p += 4
                if p + elen > len(body):
                    raise ValueError("FLAC: truncated VORBIS_COMMENT")
                try:
                    entry = body[p : p + elen].decode("utf-8")
                except UnicodeDecodeError as exc:
                    raise ValueError(
                        "FLAC: invalid UTF-8 comment entry"
                    ) from exc
                p += elen
                k, _, v = entry.partition("=")
                comments[k.lower()] = v
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC: no STREAMINFO block")
    streaminfo["n_blocks"] = n_blocks
    streaminfo["comments"] = comments
    return streaminfo

"""ISO BMFF (MP4, ISO/IEC 14496-12) box-structure codec, spec-level.

The mp4 *codec* payloads (H.264 et al.) need ffmpeg, which this
sandbox lacks — but the CONTAINER is a simple public grammar of
length-prefixed big-endian boxes, and container metadata (duration,
track dims, sample tables) is what a training-data pipeline needs
first: it drives frame-sampling plans, duration filters, and corrupt
-file triage long before any pixel is decoded. Same byte-level
approach as operators/avroio.py / warc.py.

Box grammar:  uint32 size | 4-byte type | payload (size-8 bytes);
container boxes (moov/trak/mdia/minf/stbl) nest child boxes in their
payload.  Writers here emit version-0 full boxes; the parser walks
the tree and decodes:

    mvhd  movie timescale + duration
    tkhd  track id, fixed-point 16.16 width/height
    mdhd  media timescale
    stts  sample count + per-sample duration (run-length)
    stsz  per-sample byte sizes
    stco  chunk offsets (verified to land inside mdat)

The parser cross-checks sum(stsz) against the mdat payload length,
so truncated files surface as a flag, not silent nonsense.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


def build_mp4(
    track_id: int,
    timescale: int,
    sample_durations: list[int],
    sample_sizes: list[int],
    width: int,
    height: int,
) -> bytes:
    """Minimal valid single-track mp4: ftyp + moov(mvhd, trak(tkhd,
    mdia(mdhd, hdlr, minf(stbl(stsd, stts, stsz, stco))))) + mdat.
    Sample payload bytes are a deterministic ramp so stco/stsz
    verification has real content to land on."""
    assert len(sample_durations) == len(sample_sizes)
    duration = sum(sample_durations)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")

    mdat_payload = bytes(
        (i * 31 + j) % 256 for i, sz in enumerate(sample_sizes) for j in range(sz)
    )
    mdat = _box(b"mdat", mdat_payload)

    # stts as run-length (count, delta) pairs over equal neighbours
    runs: list[tuple[int, int]] = []
    for d in sample_durations:
        if runs and runs[-1][1] == d:
            runs[-1] = (runs[-1][0] + 1, d)
        else:
            runs.append((1, d))
    stts = _full(
        b"stts",
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">II", c, d) for c, d in runs),
    )
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, len(sample_sizes))
        + b"".join(struct.pack(">I", s) for s in sample_sizes),
    )
    stsd = _full(b"stsd", struct.pack(">I", 0))
    # one chunk holding all samples, at mdat payload start; the offset
    # is absolute in the file: ftyp + moov precede mdat, so the moov
    # size must be known first -> assemble with a placeholder pass.

    def moov_with(stco_offset: int) -> bytes:
        stco = _full(b"stco", struct.pack(">II", 1, stco_offset))
        stbl = _box(b"stbl", stsd + stts + stsz + stco)
        # dinf omitted: minimal-but-parseable is the goal here
        minf = _box(b"minf", stbl)
        mdhd = _full(
            b"mdhd", struct.pack(">IIII", 0, 0, timescale, duration) + b"\x55\xc4\x00\x00"
        )
        hdlr = _full(b"hdlr", struct.pack(">I4s12x", 0, b"vide"))
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tkhd = _full(
            b"tkhd",
            struct.pack(">IIIII", 0, 0, track_id, 0, duration)
            + b"\x00" * 52
            + struct.pack(">II", width << 16, height << 16),
            flags=3,
        )
        trak = _box(b"trak", tkhd + mdia)
        mvhd = _full(
            b"mvhd",
            struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">I", 0x00010000)  # rate 1.0
            + struct.pack(">H", 0x0100)  # volume 1.0
            + b"\x00" * 10
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24
            + struct.pack(">I", track_id + 1),
        )
        return _box(b"moov", mvhd + trak)

    probe = moov_with(0)
    stco_offset = len(ftyp) + len(probe) + 8  # mdat header is 8 bytes
    moov = moov_with(stco_offset)
    assert len(moov) == len(probe)  # fixed-width stco -> stable size
    return ftyp + moov + mdat


def walk_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (type, payload_start, payload_end) for each box in
    [start, end); recurses are the caller's choice via the offsets."""
    end = len(data) if end is None else end
    pos = start
    while pos < end:
        if end - pos < 8:
            raise ValueError(f"truncated box header at {pos}")
        size = struct.unpack_from(">I", data, pos)[0]
        btype = data[pos + 4 : pos + 8]
        if size < 8 or pos + size > end:
            raise ValueError(f"bad box size {size} for {btype!r} at {pos}")
        yield btype, pos + 8, pos + size
        pos += size


def parse_mp4(data: bytes) -> dict:
    """Parse one mp4 -> container metadata dict: brand, movie
    timescale/duration, per-track (id, width, height, media
    timescale, n_samples, total sample bytes, duration from stts),
    and ``sizes_ok`` (sum(stsz) == mdat payload AND every stco chunk
    offset lands inside mdat)."""
    out: dict = {"brand": None, "timescale": None, "duration": None, "tracks": []}
    mdat_span: tuple[int, int] | None = None
    moov_span: tuple[int, int] | None = None
    for btype, ps, pe in walk_boxes(data):
        if btype == b"ftyp":
            out["brand"] = data[ps : ps + 4].decode("ascii")
        elif btype == b"moov":
            moov_span = (ps, pe)
        elif btype == b"mdat":
            mdat_span = (ps, pe)
    if moov_span is None:
        raise ValueError("no moov box")

    def full_body(ps: int) -> int:
        return ps + 4  # skip version+flags

    for btype, ps, pe in walk_boxes(data, *moov_span):
        if btype == b"mvhd":
            b = full_body(ps)
            _, _, out["timescale"], out["duration"] = struct.unpack_from(">IIII", data, b)
        elif btype == b"trak":
            trk: dict = {}
            for t2, p2, e2 in walk_boxes(data, ps, pe):
                if t2 == b"tkhd":
                    b = full_body(p2)
                    trk["track_id"] = struct.unpack_from(">I", data, b + 8)[0]
                    w, h = struct.unpack_from(">II", data, e2 - 8)
                    trk["width"], trk["height"] = w >> 16, h >> 16
                elif t2 == b"mdia":
                    for t3, p3, e3 in walk_boxes(data, p2, e2):
                        if t3 == b"mdhd":
                            b = full_body(p3)
                            trk["media_timescale"] = struct.unpack_from(">I", data, b + 8)[0]
                        elif t3 == b"minf":
                            for t4, p4, e4 in walk_boxes(data, p3, e3):
                                if t4 != b"stbl":
                                    continue
                                for t5, p5, e5 in walk_boxes(data, p4, e4):
                                    b = full_body(p5)
                                    if t5 == b"stts":
                                        n = struct.unpack_from(">I", data, b)[0]
                                        cnt = dur = 0
                                        for i in range(n):
                                            c, d = struct.unpack_from(">II", data, b + 4 + 8 * i)
                                            cnt += c
                                            dur += c * d
                                        trk["n_samples"] = cnt
                                        trk["stts_duration"] = dur
                                    elif t5 == b"stsz":
                                        fixed, n = struct.unpack_from(">II", data, b)
                                        trk["sample_bytes"] = (
                                            fixed * n
                                            if fixed
                                            else sum(
                                                struct.unpack_from(f">{n}I", data, b + 8)
                                            )
                                        )
                                    elif t5 == b"stco":
                                        n = struct.unpack_from(">I", data, b)[0]
                                        trk["chunk_offsets"] = list(
                                            struct.unpack_from(f">{n}I", data, b + 4)
                                        )
            out["tracks"].append(trk)

    sizes_ok = mdat_span is not None
    if sizes_ok:
        total = sum(t.get("sample_bytes", 0) for t in out["tracks"])
        sizes_ok = total == mdat_span[1] - mdat_span[0] and all(
            mdat_span[0] <= off < mdat_span[1] or t.get("sample_bytes", 0) == 0
            for t in out["tracks"]
            for off in t.get("chunk_offsets", [])
        )
    out["sizes_ok"] = bool(sizes_ok)
    return out

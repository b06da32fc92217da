"""EBML / Matroska / WebM container codec, spec-level (RFC 8794).

Companion to operators/isobmff.py: WebM is the other mainstream
video container in crawl corpora, and like mp4 its CONTAINER layer —
duration, track dims, codec ids, cluster/block layout — is a simple
public grammar needing no codec library. EBML is a binary XML:
every element is

    VINT id   (1-4 bytes; the leading-1 length marker is KEPT,
               so ids compare as their full byte value)
    VINT size (1-8 bytes; the leading-1 marker is STRIPPED)
    payload   (master elements nest child elements)

Writers emit minimal-length VINTs; the parser is tolerant of any
legal VINT width and rejects truncated payloads rather than
misparsing. Unsigned ints are big-endian minimal-length; floats are
4- or 8-byte IEEE big-endian; strings are UTF-8.

Element ids used here (Matroska registry, all public):
EBML 0x1A45DFA3 (DocType 0x4282), Segment 0x18538067,
Info 0x1549A966 (TimestampScale 0x2AD7B1, Duration 0x4489),
Tracks 0x1654AE6B (TrackEntry 0xAE: TrackNumber 0xD7, TrackType
0x83, CodecID 0x86, Video 0xE0: PixelWidth 0xB0, PixelHeight 0xBA),
Cluster 0x1F43B675 (Timestamp 0xE7, SimpleBlock 0xA3).
"""

from __future__ import annotations

import struct

EBML_ID = 0x1A45DFA3
SEGMENT = 0x18538067
INFO = 0x1549A966
TRACKS = 0x1654AE6B
CLUSTER = 0x1F43B675
_MASTERS = {EBML_ID, SEGMENT, INFO, TRACKS, CLUSTER, 0xAE, 0xE0}


def _vint_size(value: int) -> bytes:
    """Encode a size VINT (leading-1 marker stripped from value)."""
    for width in range(1, 9):
        if value < (1 << (7 * width)) - 1:
            out = value | (1 << (7 * width))
            return out.to_bytes(width, "big")
    raise ValueError("size too large")


def _vint_id(eid: int) -> bytes:
    """Element ids are stored verbatim (marker included)."""
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _uint(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def el(eid: int, payload: bytes) -> bytes:
    return _vint_id(eid) + _vint_size(len(payload)) + payload


def build_webm(
    track_number: int,
    codec_id: str,
    width: int,
    height: int,
    timescale_ns: int,
    duration_ticks: float,
    cluster_block_sizes: list[list[int]],
) -> bytes:
    """Minimal valid WebM: EBML header + Segment(Info, Tracks,
    Cluster*). Each cluster holds SimpleBlocks with deterministic
    ramp payloads so block accounting has real bytes to verify."""
    header = el(
        EBML_ID,
        el(0x4286, _uint(1))  # EBMLVersion
        + el(0x42F7, _uint(1))  # EBMLReadVersion
        + el(0x42F2, _uint(4))  # EBMLMaxIDLength
        + el(0x42F3, _uint(8))  # EBMLMaxSizeLength
        + el(0x4282, b"webm")  # DocType
        + el(0x4287, _uint(2))  # DocTypeVersion
        + el(0x4285, _uint(2)),  # DocTypeReadVersion
    )
    info = el(
        INFO,
        el(0x2AD7B1, _uint(timescale_ns))
        + el(0x4489, struct.pack(">d", duration_ticks)),
    )
    video = el(0xE0, el(0xB0, _uint(width)) + el(0xBA, _uint(height)))
    track = el(
        0xAE,
        el(0xD7, _uint(track_number))
        + el(0x83, _uint(1))  # TrackType video
        + el(0x86, codec_id.encode("ascii"))
        + video,
    )
    tracks = el(TRACKS, track)
    clusters = b""
    for ci, sizes in enumerate(cluster_block_sizes):
        blocks = b""
        for bi, sz in enumerate(sizes):
            # SimpleBlock: track VINT, s16 rel timestamp, flags, data
            payload = (
                _vint_size(track_number)
                + struct.pack(">hB", bi * 33, 0x80)  # keyframe flag
                + bytes((ci * 29 + bi * 7 + j) % 256 for j in range(sz))
            )
            blocks += el(0xA3, payload)
        clusters += el(CLUSTER, el(0xE7, _uint(ci * 1000)) + blocks)
    return header + el(SEGMENT, info + tracks + clusters)


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    first = data[pos]
    if first == 0:
        raise ValueError(f"invalid VINT at {pos}")
    width = 8 - first.bit_length() + 1
    raw = int.from_bytes(data[pos : pos + width], "big")
    if not keep_marker:
        raw -= 1 << (7 * width)
    return raw, pos + width


def walk_ebml(data: bytes, start: int = 0, end: int | None = None):
    """Yield (element id, payload_start, payload_end)."""
    end = len(data) if end is None else end
    pos = start
    while pos < end:
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos, keep_marker=False)
        if pos + size > end:
            raise ValueError(f"truncated element 0x{eid:X} at {pos}")
        yield eid, pos, pos + size
        pos += size


def parse_webm(data: bytes) -> dict:
    """Parse WebM container metadata: doc_type, timescale_ns,
    duration_ticks, per-track (number, codec, width, height),
    n_clusters, n_blocks, block payload byte total (SimpleBlock data
    net of its track/timestamp/flags header)."""
    out: dict = {
        "doc_type": None,
        "timescale_ns": None,
        "duration_ticks": None,
        "tracks": [],
        "n_clusters": 0,
        "n_blocks": 0,
        "block_bytes": 0,
    }

    def u(ps: int, pe: int) -> int:
        return int.from_bytes(data[ps:pe], "big")

    for eid, ps, pe in walk_ebml(data):
        if eid == EBML_ID:
            for e2, p2, e2e in walk_ebml(data, ps, pe):
                if e2 == 0x4282:
                    out["doc_type"] = data[p2:e2e].decode("ascii")
        elif eid == SEGMENT:
            for e2, p2, e2e in walk_ebml(data, ps, pe):
                if e2 == INFO:
                    for e3, p3, e3e in walk_ebml(data, p2, e2e):
                        if e3 == 0x2AD7B1:
                            out["timescale_ns"] = u(p3, e3e)
                        elif e3 == 0x4489:
                            out["duration_ticks"] = (
                                struct.unpack(">d", data[p3:e3e])[0]
                                if e3e - p3 == 8
                                else struct.unpack(">f", data[p3:e3e])[0]
                            )
                elif e2 == TRACKS:
                    for e3, p3, e3e in walk_ebml(data, p2, e2e):
                        if e3 != 0xAE:
                            continue
                        trk: dict = {}
                        for e4, p4, e4e in walk_ebml(data, p3, e3e):
                            if e4 == 0xD7:
                                trk["number"] = u(p4, e4e)
                            elif e4 == 0x86:
                                trk["codec"] = data[p4:e4e].decode("ascii")
                            elif e4 == 0xE0:
                                for e5, p5, e5e in walk_ebml(data, p4, e4e):
                                    if e5 == 0xB0:
                                        trk["width"] = u(p5, e5e)
                                    elif e5 == 0xBA:
                                        trk["height"] = u(p5, e5e)
                        out["tracks"].append(trk)
                elif e2 == CLUSTER:
                    out["n_clusters"] += 1
                    for e3, p3, e3e in walk_ebml(data, p2, e2e):
                        if e3 != 0xA3:
                            continue
                        out["n_blocks"] += 1
                        _, hdr = _read_vint(data, p3, keep_marker=False)
                        out["block_bytes"] += e3e - (hdr + 3)
    return out

"""pcap (libpcap capture file) reader/writer, implemented FROM THE
PUBLIC SPEC (the de-facto libpcap format, documented as
draft-ietf-opsawg-pcap / the tcpdump.org file-format page).

Layout:
  global header (24 bytes):
    magic  0xa1b2c3d4  — microsecond timestamps, writer's byte order
           0xd4c3b2a1  — the same file read on an opposite-endian
                         machine: EVERY header field must be swapped
    version major/minor (2.4), thiszone, sigfigs, snaplen, linktype
  per-packet record header (16 bytes):
    ts_sec, ts_usec, incl_len (captured), orig_len (on the wire)
  followed by incl_len bytes of packet data.

The endianness dance is the whole point of implementing this one
from spec: the magic number doubles as a byte-order mark, so a
correct reader detects '\\xd4\\xc3\\xb2\\xa1' and swaps — a reader
that assumes little-endian silently produces garbage timestamps and
lengths on big-endian captures. Truncation (a record header whose
incl_len runs past EOF, or a partial header) raises a typed
ValueError — the loud-failure contract shared by every from-spec
codec in this repo (midi, flacmeta, cborio, protowire).
"""

from __future__ import annotations

import struct

MAGIC_US = 0xA1B2C3D4
_GH = "IHHiIII"  # magic, vmaj, vmin, thiszone, sigfigs, snaplen, linktype
_RH = "IIII"  # ts_sec, ts_usec, incl_len, orig_len


def write_pcap(
    packets: list[tuple[int, int, bytes]],
    *,
    big_endian: bool = False,
    snaplen: int = 65535,
    linktype: int = 147,  # DLT_USER0: private payloads, no L2 framing
) -> bytes:
    """Serialize (ts_sec, ts_usec, payload) triples as one capture."""
    bo = ">" if big_endian else "<"
    out = bytearray(
        struct.pack(bo + _GH, MAGIC_US, 2, 4, 0, 0, snaplen, linktype)
    )
    for ts_sec, ts_usec, payload in packets:
        if not 0 <= ts_sec < 2**32:
            raise ValueError(f"pcap: ts_sec out of uint32 range: {ts_sec}")
        if not 0 <= ts_usec < 1_000_000:
            raise ValueError(f"pcap: ts_usec out of range: {ts_usec}")
        data = payload[:snaplen]
        out += struct.pack(
            bo + _RH, ts_sec, ts_usec, len(data), len(payload)
        )
        out += data
    return bytes(out)


def read_pcap(blob: bytes) -> dict:
    """Parse one capture; returns {'big_endian', 'snaplen',
    'linktype', 'packets': [(ts_sec, ts_usec, orig_len, payload)]}.
    Raises ValueError on a bad magic or any truncation."""
    if len(blob) < 24:
        raise ValueError("pcap: truncated global header")
    magic_le = struct.unpack("<I", blob[:4])[0]
    if magic_le == MAGIC_US:
        bo = "<"
    elif struct.unpack(">I", blob[:4])[0] == MAGIC_US:
        bo = ">"
    else:
        raise ValueError(f"pcap: bad magic 0x{magic_le:08x}")
    magic, vmaj, vmin, _tz, _sf, snaplen, linktype = struct.unpack(
        bo + _GH, blob[:24]
    )
    if (vmaj, vmin) != (2, 4):
        raise ValueError(f"pcap: unsupported version {vmaj}.{vmin}")
    packets = []
    p = 24
    while p < len(blob):
        if p + 16 > len(blob):
            raise ValueError("pcap: truncated record header")
        ts_sec, ts_usec, incl, orig = struct.unpack(bo + _RH, blob[p : p + 16])
        p += 16
        if p + incl > len(blob):
            raise ValueError("pcap: truncated packet data")
        if incl > snaplen:
            raise ValueError(f"pcap: incl_len {incl} exceeds snaplen")
        packets.append((ts_sec, ts_usec, orig, blob[p : p + incl]))
        p += incl
    return {
        "big_endian": bo == ">",
        "snaplen": snaplen,
        "linktype": linktype,
        "packets": packets,
    }

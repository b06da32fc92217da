"""Standard MIDI File (SMF) builder + parser, from the public spec.

MIDI is the remaining *audio-adjacent* container this engine's
multimodal column family hadn't covered: a pure-metadata music
interchange format (MMA "Standard MIDI Files 1.0" spec), trivially
small per file, and a nice spec workout because it uses the OTHER
variable-length integer: SMF's VLQ is big-endian 7-bit groups with
the continuation bit on every byte but the LAST — exactly the
mirror image of protobuf's LSB-first LEB128 (operators/protowire.py).
Getting both right, bit-exactly, in one codebase is the point.

File shape:
    header chunk  "MThd" + be32 length(=6) + be16 format
                  + be16 ntrks + be16 division (ticks/quarter)
    track chunk   "MTrk" + be32 length + events
    event         VLQ delta-time, then:
                    0x9c pp vv   note-on,  channel c, pitch, velocity
                    0x8c pp vv   note-off
                    0xFF tt ln.. meta (End of Track = FF 2F 00)
                    0xF0/0xF7 ln.. sysex (VLQ length, skipped)
    running status: a data byte (<0x80) where a status byte is
                  expected reuses the previous channel status — the
                  spec's compression trick and the classic parser
                  trap; build_smf deliberately emits it for every
                  second note so the parser path is always exercised.
    note-on with velocity 0 is a note-off by convention; the parser
    counts it as such.

parse_smf returns per-file metadata (format, ntrks, division, note
count, distinct pitches/channels, total ticks, pitch sum) — the
decode-to-features shape a 100 TB multimodal pipeline runs inside an
Arrow kernel, one file per row.
"""

from __future__ import annotations

import struct


def encode_vlq(n: int) -> bytes:
    """SMF variable-length quantity: 7-bit groups, MSB-first,
    continuation bit set on all but the last byte. Max 4 bytes
    (0x0FFFFFFF) per spec."""
    if n < 0 or n > 0x0FFFFFFF:
        raise ValueError("VLQ out of range")
    groups = [n & 0x7F]
    n >>= 7
    while n:
        groups.append((n & 0x7F) | 0x80)
        n >>= 7
    return bytes(reversed(groups))


def decode_vlq(buf: bytes, pos: int) -> tuple[int, int]:
    val = 0
    for i in range(4):
        if pos >= len(buf):
            raise ValueError("VLQ: truncated")
        b = buf[pos]
        pos += 1
        val = (val << 7) | (b & 0x7F)
        if not (b & 0x80):
            return val, pos
    raise ValueError("VLQ: longer than 4 bytes")


def build_smf(
    notes: list[tuple[int, int, int, int]], division: int = 480
) -> bytes:
    """Single-track (format 0) SMF from (delta, channel, pitch,
    velocity) tuples. Each note becomes note-on at its delta then
    note-off one tick later; every second note-off rides RUNNING
    STATUS off the preceding note-off status byte so parsers must
    implement the rule to read our own files back."""
    ev = bytearray()
    for i, (delta, ch, pitch, vel) in enumerate(notes):
        if not (0 <= ch < 16 and 0 <= pitch < 128 and 0 <= vel < 128):
            raise ValueError("note out of range")
        on = 0x90 | ch
        ev += encode_vlq(delta)
        ev.append(on)
        ev += bytes((pitch, vel))
        off = 0x80 | ch
        ev += encode_vlq(1)
        ev.append(off)
        ev += bytes((pitch, 0x40))
        # exercise running status: repeat the note-off (same status
        # byte elided) at delta 0 on odd notes
        if i % 2 == 1:
            ev += encode_vlq(0)
            ev += bytes((pitch, 0x40))
    ev += encode_vlq(0)
    ev += b"\xff\x2f\x00"  # End of Track
    head = b"MThd" + struct.pack(">IHHH", 6, 0, 1, division)
    return head + b"MTrk" + struct.pack(">I", len(ev)) + bytes(ev)


def parse_smf(data: bytes) -> dict:
    """Parse an SMF byte string into metadata. Raises ValueError
    loudly on every corruption mode (bad magic, truncated chunk,
    orphan data byte with no running status, bad VLQ) — the house
    loud-and-typed failure contract."""
    if data[:4] != b"MThd":
        raise ValueError("SMF: bad header magic")
    if len(data) < 14:
        raise ValueError("SMF: truncated header")
    (hlen, fmt, ntrks, division) = struct.unpack(">IHHH", data[4:14])
    if hlen != 6:
        raise ValueError("SMF: header length != 6")
    if division & 0x8000:
        raise ValueError("SMF: SMPTE division unsupported")
    pos = 8 + hlen
    note_on = 0
    pitches: set[int] = set()
    channels: set[int] = set()
    total_ticks = 0
    pitch_sum = 0
    for _ in range(ntrks):
        if data[pos : pos + 4] != b"MTrk":
            raise ValueError("SMF: bad track magic")
        if pos + 8 > len(data):
            raise ValueError("SMF: truncated track header")
        (tlen,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        track = data[pos + 8 : pos + 8 + tlen]
        if len(track) != tlen:
            raise ValueError("SMF: truncated track")
        pos += 8 + tlen
        p = 0
        status = None
        ticks = 0
        while p < len(track):
            delta, p = decode_vlq(track, p)
            ticks += delta
            # Every indexed access below is bounds-checked first so a
            # track cut mid-event raises the contract's typed
            # ValueError, never a bare IndexError (a truncation right
            # after the delta VLQ lands here with p == len(track)).
            if p >= len(track):
                raise ValueError("SMF: truncated event")
            b = track[p]
            if b == 0xFF:  # meta event
                if p + 2 > len(track):
                    raise ValueError("SMF: truncated event")
                mtype = track[p + 1]
                ln, p2 = decode_vlq(track, p + 2)
                if p2 + ln > len(track):
                    raise ValueError("SMF: truncated event")
                p = p2 + ln
                if mtype == 0x2F:
                    break
                continue
            if b in (0xF0, 0xF7):  # sysex: VLQ length, skip
                ln, p2 = decode_vlq(track, p + 1)
                if p2 + ln > len(track):
                    raise ValueError("SMF: truncated event")
                p = p2 + ln
                status = None  # sysex cancels running status
                continue
            if b & 0x80:
                status = b
                p += 1
            elif status is None:
                raise ValueError("SMF: data byte with no running status")
            kind = status & 0xF0
            ch = status & 0x0F
            if kind in (0x80, 0x90, 0xA0, 0xB0, 0xE0):
                if p + 2 > len(track):
                    raise ValueError("SMF: truncated event")
                d1, d2 = track[p], track[p + 1]
                p += 2
            elif kind in (0xC0, 0xD0):
                if p + 1 > len(track):
                    raise ValueError("SMF: truncated event")
                d1, d2 = track[p], 0
                p += 1
            else:
                raise ValueError(f"SMF: unsupported status {status:#x}")
            if kind == 0x90 and d2 > 0:
                note_on += 1
                pitches.add(d1)
                channels.add(ch)
                pitch_sum += d1
        total_ticks = max(total_ticks, ticks)
    return {
        "format": fmt,
        "ntrks": ntrks,
        "division": division,
        "note_on_count": note_on,
        "distinct_pitches": len(pitches),
        "distinct_channels": len(channels),
        "total_ticks": total_ticks,
        "pitch_sum": pitch_sum,
    }

"""IMA/DVI ADPCM audio codec, pure Python (IMA Digital Audio Focus
Group algorithm; WAVE container framing per the public Microsoft
multimedia registration of wFormatTag 0x0011).

Extends the audio matrix beyond companding (mulaw) and raw PCM (WAV
walk) to an actual COMPRESSED, STATEFUL codec: 16-bit samples become
4-bit codes against an adaptive step-size predictor — 4x smaller,
with per-block re-sync headers so a reader can seek block-wise (the
property that matters at scale: blocks decode independently, so a
100 TB audio corpus splits at block boundaries).

Core (``ima_encode``/``ima_decode``): the standard 89-entry step
table and 16-entry index-adaptation table, sign-magnitude nibbles,
predictor clamped to int16, index clamped to [0, 88] — byte-for-byte
the algorithm in CPython's ``audioop.lin2adpcm``/``adpcm2lin`` (its C
implementation is the certification reference in
tests/test_operators.py: our nibble stream and its output stream
must be IDENTICAL, both directions).

Container (``encode_wav_adpcm``/``decode_wav_adpcm``): real RIFF
WAVE, wFormatTag 0x0011, mono, block-framed — each block opens with
a 4-byte state header (exact int16 predictor sample + step index),
then two 4-bit codes per byte, LOW nibble first (WAV framing; note
audioop's raw stream packs high-first — the tests pin both
framings). Loud typed failures: non-RIFF, missing fmt, wrong format
tag, bad block length, step index out of range.
"""

from __future__ import annotations

import struct

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _decode_nibble(nib: int, pred: int, index: int) -> tuple[int, int, int]:
    step = STEP_TABLE[index]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = _clamp16(pred - diff if nib & 8 else pred + diff)
    index = min(88, max(0, index + INDEX_TABLE[nib]))
    return pred, index, diff


def ima_encode(
    samples: list[int], pred: int = 0, index: int = 0
) -> tuple[list[int], int, int]:
    """Encode 16-bit samples to 4-bit IMA codes from the given
    predictor state; returns (nibbles, pred, index) so callers can
    chain blocks or compare against audioop's implicit (0, 0) start."""
    nibbles = []
    for s in samples:
        step = STEP_TABLE[index]
        delta = s - pred
        nib = 8 if delta < 0 else 0
        if delta < 0:
            delta = -delta
        if delta >= step:
            nib |= 4
            delta -= step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            nib |= 1
        pred, index, _ = _decode_nibble(nib, pred, index)
        nibbles.append(nib)
    return nibbles, pred, index


def ima_decode(
    nibbles: list[int], pred: int = 0, index: int = 0
) -> tuple[list[int], int, int]:
    """Decode 4-bit IMA codes to 16-bit samples from the given state."""
    out = []
    for nib in nibbles:
        if not 0 <= nib <= 15:
            raise ValueError(f"adpcm: code {nib} out of range")
        pred, index, _ = _decode_nibble(nib, pred, index)
        out.append(pred)
    return out, pred, index


def pack_nibbles(nibbles: list[int], low_first: bool = True) -> bytes:
    """Pack two 4-bit codes per byte. WAV IMA framing is low-first;
    audioop's raw stream is high-first."""
    if len(nibbles) % 2:
        nibbles = nibbles + [0]
    out = bytearray()
    for i in range(0, len(nibbles), 2):
        a, b = nibbles[i], nibbles[i + 1]
        out.append((a | (b << 4)) if low_first else ((a << 4) | b))
    return bytes(out)


def unpack_nibbles(buf: bytes, low_first: bool = True) -> list[int]:
    out = []
    for byte in buf:
        lo, hi = byte & 0x0F, byte >> 4
        out += [lo, hi] if low_first else [hi, lo]
    return out


def encode_wav_adpcm(
    samples: list[int], sample_rate: int, samples_per_block: int = 505
) -> bytes:
    """Mono IMA-ADPCM WAV: each block = 4-byte header (exact int16
    first sample + step index) + (samples_per_block - 1) codes packed
    low-first. The encoder state carries ACROSS blocks (the step
    index keeps adapting) while each header re-syncs the predictor
    exactly — the standard seekable-block layout."""
    if samples_per_block % 2 != 1:
        raise ValueError("adpcm: samples_per_block must be odd"
                         " (header holds sample 0, codes pair up)")
    block_bytes = 4 + (samples_per_block - 1) // 2
    blocks = []
    index = 0
    for start in range(0, len(samples), samples_per_block):
        chunk = samples[start : start + samples_per_block]
        pred = _clamp16(chunk[0])
        header = struct.pack("<hBB", pred, index, 0)
        nibbles, pred, index = ima_encode(chunk[1:], pred, index)
        body = pack_nibbles(nibbles, low_first=True)
        body += b"\x00" * (block_bytes - 4 - len(body))  # final short block
        blocks.append(header + body)
    data = b"".join(blocks)
    byte_rate = (sample_rate * block_bytes + samples_per_block - 1) // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH",
        0x0011, 1, sample_rate, byte_rate, block_bytes, 4,
        2, samples_per_block,  # cbSize=2, wSamplesPerBlock
    )
    fact = struct.pack("<I", len(samples))
    return (
        b"RIFF"
        + struct.pack("<I", 4 + (8 + len(fmt)) + (8 + len(fact)) + (8 + len(data)))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav_adpcm(buf: bytes) -> dict:
    """Decode a mono IMA-ADPCM WAV -> {"sample_rate", "n_samples",
    "samples_per_block", "samples"}. Strict RIFF walk (chunk order
    free, 2-byte alignment), wFormatTag must be 0x0011, block headers
    validated (step index <= 88), trailing pad codes of the final
    short block dropped via the fact-chunk sample count."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("adpcm: not a RIFF/WAVE stream")
    pos, fmt, data, n_total = 12, None, None, None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("adpcm: truncated chunk")
        if tag == b"fmt ":
            fmt = body
        elif tag == b"fact":
            (n_total,) = struct.unpack_from("<I", body)
        elif tag == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise ValueError("adpcm: missing fmt/data chunk")
    tag16, chans, rate, _br, block_bytes, bits = struct.unpack_from("<HHIIHH", fmt)
    if tag16 != 0x0011:
        raise ValueError(f"adpcm: format tag 0x{tag16:04x}, want 0x0011")
    if chans != 1 or bits != 4:
        raise ValueError("adpcm: only mono 4-bit streams supported")
    if len(fmt) < 20:
        raise ValueError("adpcm: fmt missing wSamplesPerBlock extension")
    (spb,) = struct.unpack_from("<H", fmt, 18)
    if block_bytes != 4 + (spb - 1) // 2:
        raise ValueError("adpcm: block align inconsistent with"
                         " samples-per-block")
    samples: list[int] = []
    for start in range(0, len(data), block_bytes):
        block = data[start : start + block_bytes]
        if len(block) < 4:
            raise ValueError("adpcm: short block header")
        pred, index, _rsv = struct.unpack_from("<hBB", block)
        if index > 88:
            raise ValueError(f"adpcm: step index {index} out of range")
        samples.append(pred)
        decoded, _, _ = ima_decode(
            unpack_nibbles(block[4:], low_first=True), pred, index
        )
        samples += decoded
    if n_total is not None:
        if n_total > len(samples):
            raise ValueError("adpcm: fact count exceeds decoded samples")
        samples = samples[:n_total]
    return {
        "sample_rate": rate,
        "n_samples": len(samples),
        "samples_per_block": spb,
        "samples": samples,
    }

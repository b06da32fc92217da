"""Baseline sequential JPEG codec (ITU-T T.81), pure Python + numpy.

Closes the one compressed-image pixel path the multimodal family
still stubbed (PIL/ffmpeg absent; QOI/PNG/BMP/TGA/PPM/TIFF already
decode byte-level): a from-spec ENCODER and DECODER for baseline
DCT JPEG — SOI/APP0/DQT/SOF0/DHT/SOS/EOI markers, Annex K
quantization + Huffman tables (the public defaults every libjpeg
build ships), 4:4:4 YCbCr (no subsampling ambiguity), magnitude
category entropy coding with 0xFF byte stuffing, 8x8 float DCT-II.

Certification (tests/test_operators.py): files we encode are decoded
by the JVM's javax.imageio and must agree with OUR decoder within a
small per-sample bound (measured max 2 on 4:4:4 — T.81 does not
mandate a bit-exact IDCT, so independent implementations legally
differ by rounding); files ImageIO encodes (4:2:0) decode through us
within a looser bound dominated by the chroma-upsampling filter
choice. Both directions, so neither half is
self-consistent-but-wrong.

Decode output for GIVEN bytes is deterministic (float64 IEEE matrix
IDCT, fixed rounding), which is what the hash-checked registry key
relies on.
"""

from __future__ import annotations

import math
import struct

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

_C = np.zeros((8, 8))
for _u in range(8):
    _a = math.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _a * math.cos((2 * _x + 1) * _u * math.pi / 16)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _scale_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base table."""
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * s + 50) // 100, 1, 255).astype(np.int32)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(ln, c): s for s, (c, ln) in _build_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            b = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.put(0x7F, 8 - self._n)  # pad with 1s


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if not self._n:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise ValueError(f"marker 0xFF{nxt:02X} inside entropy data")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category coding: value -> (size, amplitude)."""
    if v == 0:
        return 0, 0
    size = v.bit_length() if v > 0 else (-v).bit_length()
    amp = v if v > 0 else v + (1 << size) - 1
    return size, amp


def _extend(amp: int, size: int) -> int:
    if size == 0:
        return 0
    return amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1


def encode_jpeg_pixels(rgb: np.ndarray, quality: int = 85) -> bytes:
    """Encode an HxWx3 uint8 array as baseline 4:4:4 JFIF."""
    h, w = rgb.shape[:2]
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]
    qts = [_scale_qt(QT_LUM, quality), _scale_qt(QT_CHROM, quality)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in enumerate(qts):
        zz = bytes(int(qt.flat[ZIGZAG[i]]) for i in range(64))
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid in range(3):
        out += struct.pack(">BBB", cid + 1, 0x11, 0 if cid == 0 else 1)
    for cls, tid, (bits, vals) in (
        (0, 0, HUFF_DC_LUM), (1, 0, HUFF_AC_LUM),
        (0, 1, HUFF_DC_CHROM), (1, 1, HUFF_AC_CHROM),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid in range(3):
        t = 0 if cid == 0 else 1
        out += struct.pack(">BB", cid + 1, (t << 4) | t)
    out += b"\x00\x3f\x00"

    dc_codes = [_build_codes(*HUFF_DC_LUM), _build_codes(*HUFF_DC_CHROM)]
    ac_codes = [_build_codes(*HUFF_AC_LUM), _build_codes(*HUFF_AC_CHROM)]
    bw = _BitWriter()
    pred = [0, 0, 0]
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    padded = []
    for p in planes:
        pp = np.empty(((bh * 8), (bwid * 8)))
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1 : h, :]  # edge replicate
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp - 128.0)
    for by in range(bh):
        for bx in range(bwid):
            for ci in range(3):
                t = 0 if ci == 0 else 1
                blk = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _fdct(blk)
                q = np.round(coef / qts[t]).astype(np.int64)
                zz = [int(q.flat[ZIGZAG[i]]) for i in range(64)]
                diff = zz[0] - pred[ci]
                pred[ci] = zz[0]
                size, amp = _magnitude(diff)
                c, ln = dc_codes[t][size]
                bw.put(c, ln)
                if size:
                    bw.put(amp, size)
                run = 0
                for k in range(1, 64):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = ac_codes[t][0xF0]
                        bw.put(c, ln)
                        run -= 16
                    size, amp = _magnitude(zz[k])
                    c, ln = ac_codes[t][(run << 4) | size]
                    bw.put(c, ln)
                    bw.put(amp, size)
                    run = 0
                if run:
                    c, ln = ac_codes[t][0x00]  # EOB
                    bw.put(c, ln)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg_pixels(data: bytes) -> np.ndarray:
    """Decode baseline sequential JFIF -> HxWx3 uint8 (4:4:4 or
    grayscale; subsampled chroma is upsampled by sample repeat)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = 0
    scan_comps: list[dict] = []
    entropy_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        seg_len = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:
            s = 0
            while s < len(seg):
                prec, tid = seg[s] >> 4, seg[s] & 0xF
                n = 64 * (2 if prec else 1)
                raw = seg[s + 1 : s + 1 + n]
                vals = (
                    struct.unpack(f">{64}H", raw) if prec else list(raw)
                )
                qt = np.zeros(64, dtype=np.int32)
                for i in range(64):
                    qt[ZIGZAG[i]] = vals[i]
                qts[tid] = qt.reshape(8, 8)
                s += 1 + n
        elif marker == 0xC0 or marker == 0xC1:
            _, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for i in range(nc):
                cid, samp, qtid = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append(
                    {"id": cid, "hs": samp >> 4, "vs": samp & 0xF, "qt": qtid}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"non-baseline SOF 0x{marker:02X} unsupported")
        elif marker == 0xC4:
            s = 0
            while s < len(seg):
                cls, tid = seg[s] >> 4, seg[s] & 0xF
                bits = list(seg[s + 1 : s + 17])
                n = sum(bits)
                vals = list(seg[s + 17 : s + 17 + n])
                huff[(cls, tid)] = _build_decode(bits, vals)
                s += 17 + n
        elif marker == 0xDA:
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid, tabs = struct.unpack_from(">BB", seg, 1 + 2 * i)
                comp = next(c for c in comps if c["id"] == cid)
                scan_comps.append(
                    {**comp, "dc": tabs >> 4, "ac": tabs & 0xF}
                )
            entropy_start = pos + seg_len
            break
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        pos += seg_len
    if entropy_start is None or not scan_comps:
        raise ValueError("no scan found")

    hmax = max(c["hs"] for c in scan_comps)
    vmax = max(c["vs"] for c in scan_comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    br = _BitReader(data[entropy_start:])

    planes = []
    for c in scan_comps:
        pw, ph = mcux * 8 * c["hs"], mcuy * 8 * c["vs"]
        planes.append(np.zeros((ph, pw)))
    pred = [0] * len(scan_comps)

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")

    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(scan_comps):
                for v in range(c["vs"]):
                    for hh in range(c["hs"]):
                        dc_tab = huff[(0, c["dc"])]
                        ac_tab = huff[(1, c["ac"])]
                        size = read_symbol(dc_tab)
                        diff = _extend(br.bits(size), size)
                        pred[ci] += diff
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = read_symbol(ac_tab)
                            run, size = rs >> 4, rs & 0xF
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        for i in range(64):
                            coef[ZIGZAG[i]] = zz[i]
                        blk = _idct(coef.reshape(8, 8) * qts[c["qt"]]) + 128.0
                        y0 = (my * c["vs"] + v) * 8
                        x0 = (mx * c["hs"] + hh) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk

    up = []
    for ci, c in enumerate(scan_comps):
        p = planes[ci]
        if c["hs"] != hmax or c["vs"] != vmax:
            p = np.repeat(
                np.repeat(p, vmax // c["vs"], axis=0), hmax // c["hs"], axis=1
            )
        up.append(p[:h, :w])
    if len(up) == 1:
        y = np.clip(np.round(up[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    y, cb, cr = up[0], up[1] - 128.0, up[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


def pattern_rgb(width: int, height: int, seed: int) -> np.ndarray:
    """Deterministic smooth test pattern (gradients + sinusoid) —
    smooth content keeps baseline-JPEG error small and stable, so a
    fixed tolerance certifies the whole pipeline."""
    xx, yy = np.meshgrid(np.arange(width), np.arange(height))
    r = (xx * 255 // max(1, width - 1)).astype(np.float64)
    g = (yy * 255 // max(1, height - 1)).astype(np.float64)
    b = 128 + 96 * np.sin((xx + yy + seed) / 9.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)

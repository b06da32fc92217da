"""Multimodal columns: opaque binary payloads + typed metadata.

The engine treats images/audio/video as ``BinaryType`` columns with a
typed metadata struct alongside ({format, n_bytes, ...}); decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` transforms so payload bytes stream through Python in
columnar batches (never row-at-a-time, never collected).

The image/audio codec libraries (PIL, torchvision, ffmpeg, ...) are
NOT in this container. Pixel-level work (resize, frame-sample) is
stubbed behind import probes, but image METADATA is implemented for
real: PNG/BMP/GIF/JPEG carry width/height in fixed header fields, so
sniff_image parses them in pure Python and encode_* build minimal
structurally-valid payloads (correct CRC32s, segment walks) to test
against. The Spark-side plumbing (schema, Arrow batching, partition
behavior) is real and hash-checked against a DuckDB oracle.

Scale: mapInPandas preserves partitioning (no shuffle); decoding is
embarrassingly parallel. For 100 TB of media you would store payloads
in parquet binary columns (or object-store pointers for >100 MB
blobs), repartition by size histogram so Arrow batches stay ~64 MB,
and keep `spark.sql.execution.arrow.maxRecordsPerBatch` tuned down
for wide payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id BIGINT, format STRING, n_bytes BIGINT, first_byte INT, content_md5 STRING"
)


def attach_binary(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Fixture adapter: materialize a binary payload column + typed
    metadata struct from document text (the fixtures carry no real
    media; payload bytes are the UTF-8 encoding)."""
    content = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col),
        content.alias("content"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.octet_length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_features(binary_df: DataFrame, fake: bool = True) -> DataFrame:
    """Per-payload feature extraction via mapInPandas.

    Real implementation would be::

        from PIL import Image          # not available in this container
        img = Image.open(io.BytesIO(buf)); feats = (img.width, img.height, ...)

    With ``fake=True`` features are deterministic byte-level functions
    (length, first byte, md5) so the full Arrow path is testable.
    """
    if not fake:
        try:
            import PIL  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "real image decode requires PIL, which is not installed; "
                "use fake=True to exercise the pipeline"
            ) from e

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": [m["format"] for m in pdf["meta"]],
                    "n_bytes": content.map(len).astype("int64"),
                    "first_byte": content.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "content_md5": content.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return binary_df.mapInPandas(batches, schema=FEATURE_SCHEMA)


# --- Real (library-free) image header codecs -------------------------
#
# The container has no PIL/ffmpeg, but image METADATA needs no codec:
# PNG/BMP/GIF/JPEG all carry width/height in fixed header fields.
# encode_* build minimal structurally-valid payloads (correct CRCs,
# segment lengths); sniff_image walks the real container format.


def encode_png(width: int, height: int) -> bytes:
    """Minimal valid 8-bit grayscale PNG: IHDR + one zlib IDAT of
    zero scanlines + IEND, each chunk with a correct CRC32."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + b"\x00" * width) * height  # filter byte + pixels
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _bmp_file(width: int, height: int, rows_topdown: list[bytes]) -> bytes:
    """Assemble a 24-bit BMP from unpadded top-down pixel rows (w*3
    bytes each): pads rows to 4 bytes, flips to the format's bottom-up
    order, and writes BITMAPFILEHEADER + BITMAPINFOHEADER — the ONE
    place the header/padding layout lives (three encoders share it)."""
    import struct

    pad = b"\x00" * ((4 - (width * 3) % 4) % 4)
    pixels = b"".join(row + pad for row in reversed(rows_topdown))
    off = 14 + 40
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    head = b"BM" + struct.pack("<IHHI", off + len(pixels), 0, 0, off)
    return head + info + pixels


def encode_bmp(width: int, height: int) -> bytes:
    """Minimal 24-bit BMP: zeroed pixel rows."""
    return _bmp_file(width, height, [b"\x00" * (width * 3)] * height)


def encode_gif(width: int, height: int) -> bytes:
    """Minimal GIF89a: header + logical screen descriptor + trailer."""
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00\x3b"


def encode_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG header stream: SOI + APP0(JFIF) + DQT stub + SOF0
    carrying the dimensions + EOI. Decoders of the FRAME HEADER (which
    is all metadata extraction needs) must skip the leading variable-
    length segments to reach SOF0 — exactly what sniff_image does."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # SOF0..15 minus DHT/JPG/DAC


def sniff_image(buf: bytes) -> tuple[str, int, int]:
    """Parse (format, width, height) from real container headers —
    PNG IHDR, BMP BITMAPINFOHEADER, GIF screen descriptor, JPEG SOFn —
    in pure Python (no codec library). Returns ('unknown', -1, -1)
    for unrecognized or truncated payloads; never raises."""
    import struct

    try:
        if buf[:8] == b"\x89PNG\r\n\x1a\n" and buf[12:16] == b"IHDR":
            w, h = struct.unpack(">II", buf[16:24])
            return "png", w, h
        if buf[:2] == b"BM" and len(buf) >= 26:
            w, h = struct.unpack("<ii", buf[18:26])
            return "bmp", w, abs(h)  # negative height = top-down rows
        if buf[:6] in (b"GIF87a", b"GIF89a") and len(buf) >= 10:
            w, h = struct.unpack("<HH", buf[6:10])
            return "gif", w, h
        if buf[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(buf):
                if buf[i] != 0xFF:
                    break
                marker = buf[i + 1]
                if marker in _JPEG_SOF_MARKERS:
                    h, w = struct.unpack(">HH", buf[i + 5 : i + 9])
                    return "jpeg", w, h
                if marker == 0xD9:  # EOI before any SOF
                    break
                seg_len = struct.unpack(">H", buf[i + 2 : i + 4])[0]
                i += 2 + seg_len
    except (struct.error, IndexError):
        pass
    return "unknown", -1, -1


IMAGE_META_SCHEMA = "doc_id BIGINT, format STRING, width INT, height INT"


def image_meta(binary_df: DataFrame) -> DataFrame:
    """Real image-metadata extraction over a binary payload column:
    Arrow-batched mapInPandas running sniff_image per payload —
    (format, width, height) without any codec library. Input needs
    (doc_id, content); partitioning is preserved (no shuffle)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = pdf["content"].map(sniff_image)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": meta.map(lambda m: m[0]),
                    "width": meta.map(lambda m: m[1]).astype("int32"),
                    "height": meta.map(lambda m: m[2]).astype("int32"),
                }
            )

    return binary_df.mapInPandas(batches, schema=IMAGE_META_SCHEMA)


_ENCODERS = (encode_png, encode_bmp, encode_gif, encode_jpeg)


def attach_fake_images(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: build a structurally-valid image payload per
    row — format cycles png/bmp/gif/jpeg by id % 4, dimensions are
    (1 + id % 31, 1 + id % 23) so an oracle can recompute them
    arithmetically. Encoding runs distributed in mapInPandas (the
    generator and parser share only the container-format spec)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "content": [
                        _ENCODERS[i % 4](1 + i % 31, 1 + i % 23)
                        for i in ids
                    ],
                }
            )

    return docs.select(id_col).mapInPandas(
        batches, schema="doc_id BIGINT, content BINARY"
    )


def resize_images(binary_df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB kept only as the generic compressed-format resize entry
    point: every image pixel path is now REAL from-spec — PNG
    (decode_png_pixels below), baseline JPEG (operators/jpegcodec.py,
    ImageIO-certified, under the multimodal_jpeg_roundtrip hash
    check), GIF with real LZW (operators/giflzw.py, bit-exact vs the
    JVM GIF reader, under multimodal_gif_lzw_decode), and the
    uncompressed path resize_bmp_nearest under multimodal_resize_bmp.
    Real shape for a compressed-variant resize: decode with the
    matching codec above, resample, re-encode in mapInPandas emitting
    the payload with updated meta."""
    raise NotImplementedError(
        "compressed-format resize requires PIL; BMP resize is implemented "
        "(resize_bmp_nearest); pipeline shape: "
        "binary_df.mapInPandas(resize_batch, 'doc_id BIGINT, content BINARY, meta STRUCT<...>')"
    )


def sample_frames(binary_df: DataFrame, every_n: int) -> DataFrame:
    """STUB for COMPRESSED-codec frame decode: mp4/webm PIXEL data
    needs ffmpeg (absent). The mp4 CONTAINER layer is REAL from-spec
    (operators/isobmff.py: box walk, stts/stsz/stco sample tables —
    everything a frame-sampling PLAN needs, under the hash check by
    multimodal_mp4_meta), and the uncompressed path is REAL: see
    sample_y4m_frames below (pure-Python YUV4MPEG2 stream walk),
    driven end-to-end under the hash check by the multimodal_video_y4m
    key. Real shape for codec variants: mapInPandas yielding one row
    per sampled frame (doc_id, frame_idx, content)."""
    raise NotImplementedError(
        "compressed-container frame sampling requires ffmpeg; Y4M sampling "
        "is implemented (sample_y4m_frames); pipeline shape: "
        "mapInPandas yielding one row per sampled frame (doc_id, frame_idx, content)"
    )


def encode_bmp_pattern(width: int, height: int) -> bytes:
    """24-bit BMP with a deterministic per-pixel pattern (in IMAGE
    coordinates, y=0 at the top): B=(x*7+y*13)%256, G=(x*11+y*3)%256,
    R=(x*5+y*17)%256. The closed-form pattern lets an oracle
    recompute any derived statistic (including after resampling)
    arithmetically — real pixel work, checkable without a codec."""
    rows = [
        bytes(
            v
            for x in range(width)
            for v in (
                (x * 7 + y * 13) % 256,
                (x * 11 + y * 3) % 256,
                (x * 5 + y * 17) % 256,
            )
        )
        for y in range(height)
    ]
    return _bmp_file(width, height, rows)


def decode_bmp_pixels(buf: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Pure-Python 24-bit BMP decode -> (width, height, rows of
    (B, G, R) tuples in image coordinates, y=0 top)."""
    import struct

    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", buf, 10)[0]
    width, height = struct.unpack_from("<ii", buf, 18)[0:2]
    bpp = struct.unpack_from("<H", buf, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    row_len = width * 3
    stride = row_len + (4 - row_len % 4) % 4
    img = []
    for y in range(height):
        r = height - 1 - y  # image row y lives at file row height-1-y
        base = off + r * stride
        row = [
            tuple(buf[base + 3 * x : base + 3 * x + 3]) for x in range(width)
        ]
        img.append(row)
    return width, height, img


def resize_bmp_nearest(buf: bytes, out_w: int, out_h: int) -> bytes:
    """REAL image resize without any codec library: decode the 24-bit
    BMP, nearest-neighbor resample (src = floor(dst * in/out) — the
    standard forward mapping), re-encode a valid BMP. Runs per row
    inside the mapInPandas batch kernel; the compressed-format
    variants still require PIL and keep their stub."""
    in_w, in_h, img = decode_bmp_pixels(buf)
    rows = [
        bytes(
            v
            for x in range(out_w)
            for v in img[(y * in_h) // out_h][(x * in_w) // out_w]
        )
        for y in range(out_h)
    ]
    return _bmp_file(out_w, out_h, rows)


def encode_wav_pattern(n_samples: int, sample_rate: int) -> bytes:
    """Minimal valid 16-bit mono PCM WAV whose samples follow the
    closed form s_i = ((i * 2654435761) % 65536) - 32768 — a real
    RIFF container (audio's uncompressed format, like BMP for images)
    whose derived statistics an oracle can recompute arithmetically."""
    import struct

    data = b"".join(
        struct.pack("<h", ((i * 2654435761) % 65536) - 32768)
        for i in range(n_samples)
    )
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def parse_wav(buf: bytes) -> tuple[int, int, int, list[int]]:
    """Pure-Python PCM WAV parse -> (sample_rate, n_channels,
    bits_per_sample, samples). Walks RIFF chunks (fmt / data) the way
    a real reader must — no assumption about chunk order."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, chans, bits, data = 12, None, None, None, b""
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            _fmt, chans, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body)
        elif tag == b"data":
            data = body  # decode AFTER the walk: fmt may follow data
        pos += 8 + size + (size % 2)  # RIFF chunks are 2-byte aligned
    if rate is None:
        raise ValueError("missing fmt chunk")
    if bits != 16:
        raise ValueError(f"unsupported bits {bits}")
    samples = [
        struct.unpack_from("<h", data, 2 * i)[0] for i in range(len(data) // 2)
    ]
    return rate, chans, bits, samples


def encode_y4m_pattern(width: int, height: int, n_frames: int) -> bytes:
    """Minimal YUV4MPEG2 (uncompressed video) stream, 4:2:0: header +
    FRAME-delimited raw planes. Luma follows the closed form
    Y(f, x, y) = (x*3 + y*5 + f*7) % 256; chroma planes are flat 128.
    Width/height must be even (4:2:0 subsampling)."""
    out = [f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420\n".encode()]
    uv = bytes([128]) * ((width // 2) * (height // 2))
    for f in range(n_frames):
        y_plane = bytes(
            (x * 3 + y * 5 + f * 7) % 256
            for y in range(height)
            for x in range(width)
        )
        out.append(b"FRAME\n" + y_plane + uv + uv)
    return b"".join(out)


def sample_y4m_frames(buf: bytes, every_n: int) -> list[tuple[int, int, int, int]]:
    """REAL video frame sampling without ffmpeg, for the uncompressed
    Y4M container: parse the stream header, walk FRAME records, keep
    every n-th frame, and return (frame_idx, width, height,
    y_checksum) per kept frame (checksum = sum of luma bytes). The
    compressed-container variant (mp4/webm) still requires ffmpeg
    and keeps its stub in sample_frames."""
    header_end = buf.index(b"\n")
    header = buf[:header_end].decode()
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a Y4M stream")
    params = dict(
        (p[0], p[1:]) for p in header.split()[1:] if p and p[0] in "WHFIAC"
    )
    width, height = int(params["W"]), int(params["H"])
    y_len = width * height
    uv_len = (width // 2) * (height // 2)
    frame_len = y_len + 2 * uv_len
    pos, idx, kept = header_end + 1, 0, []
    while pos < len(buf):
        if buf[pos : pos + 6] != b"FRAME\n":
            raise ValueError(f"bad FRAME marker at {pos}")
        pos += 6
        if idx % every_n == 0:
            kept.append(
                (idx, width, height, sum(buf[pos : pos + y_len]))
            )
        pos += frame_len
        idx += 1
    return kept


def y4m_luma_planes(buf: bytes) -> list[tuple[int, int, int, bytes]]:
    """Decode EVERY frame's raw luma plane from a Y4M stream:
    (frame_idx, width, height, y_plane bytes). The plane-level sibling
    of sample_y4m_frames (which reduces to checksums) — consumers
    that compare frames (scene cuts, motion estimates) need the
    actual pixels."""
    header_end = buf.index(b"\n")
    header = buf[:header_end].decode()
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a Y4M stream")
    params = dict(
        (p[0], p[1:]) for p in header.split()[1:] if p and p[0] in "WHFIAC"
    )
    width, height = int(params["W"]), int(params["H"])
    y_len = width * height
    uv_len = (width // 2) * (height // 2)
    frame_len = y_len + 2 * uv_len
    pos, idx, out = header_end + 1, 0, []
    while pos < len(buf):
        if buf[pos : pos + 6] != b"FRAME\n":
            raise ValueError(f"bad FRAME marker at {pos}")
        pos += 6
        out.append((idx, width, height, buf[pos : pos + y_len]))
        pos += frame_len
        idx += 1
    return out


def encode_y4m_scenes(
    width: int, height: int, n_frames: int, cut_every: int
) -> bytes:
    """Y4M stream with SCENE structure: luma is constant within a
    scene (static shot) and jumps at scene boundaries — Y(f, x, y) =
    (x*3 + y*5 + (f // cut_every) * 91) % 256. The shot-cut content
    model scene-cut detection needs (encode_y4m_pattern's smooth
    per-frame drift never produces a cut)."""
    out = [f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420\n".encode()]
    uv = bytes([128]) * ((width // 2) * (height // 2))
    for f in range(n_frames):
        scene = f // cut_every
        y_plane = bytes(
            (x * 3 + y * 5 + scene * 91) % 256
            for y in range(height)
            for x in range(width)
        )
        out.append(b"FRAME\n" + y_plane + uv + uv)
    return b"".join(out)


def encode_ppm_pattern(width: int, height: int) -> bytes:
    """Binary PPM (netpbm P6) with a deterministic per-pixel pattern:
    R=(x*3+y*7)%256, G=(x*13+y)%256, B=(x+y*11)%256. The header
    includes a comment line on purpose — a PPM reader that skips only
    the magic line mis-reads half the corpus (netpbm comments may
    appear anywhere in the header), so the fixture forces a real
    tokenizer."""
    header = f"P6\n# synthetic fixture {width}x{height}\n{width} {height}\n255\n"
    body = bytes(
        v
        for y in range(height)
        for x in range(width)
        for v in ((x * 3 + y * 7) % 256, (x * 13 + y) % 256, (x + y * 11) % 256)
    )
    return header.encode("ascii") + body


def decode_ppm(buf: bytes) -> tuple[int, int, int, bytes]:
    """Pure-Python P6 PPM decode -> (width, height, maxval, raw RGB
    bytes). Implements the real netpbm header grammar: whitespace-
    separated tokens, '#' comments running to end-of-line allowed
    between any tokens, single whitespace byte after maxval, then
    raw samples."""
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        if pos >= len(buf):
            raise ValueError("truncated PPM header")
        c = buf[pos : pos + 1]
        if c == b"#":
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            start = pos
            while buf[pos : pos + 1].isdigit():
                pos += 1
            tokens.append(int(buf[start:pos]))
        else:
            raise ValueError(f"bad header byte {c!r} at {pos}")
    if not buf[pos : pos + 1].isspace():
        raise ValueError("missing single whitespace after maxval")
    pos += 1
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    need = width * height * 3
    body = buf[pos : pos + need]
    if len(body) != need:
        raise ValueError(f"pixel payload {len(body)} != {need}")
    return width, height, maxval, body


def encode_gif_frames(doc_id: int) -> bytes:
    """GIF89a container with 1 + doc_id % 7 frames. Each frame is a
    Graphic Control Extension + Image Descriptor + one LZW data
    sub-block of ((doc_id + i*31) % 200 + 1) filler bytes. The
    global color table flag is SET (2-entry table), so a walker that
    skips only the 13 header bytes desyncs immediately — same
    design rule as the PPM comment line: the fixture forces the real
    grammar."""
    out = [b"GIF89a"]
    # logical screen: 8x8, GCT flag set, 2-entry table
    out.append((8).to_bytes(2, "little") + (8).to_bytes(2, "little"))
    out.append(bytes([0x80, 0x00, 0x00]))  # packed(GCT, size 0), bg, aspect
    out.append(bytes(6))  # 2-entry global color table (2 * 3 bytes)
    n_frames = 1 + doc_id % 7
    for i in range(n_frames):
        # graphic control extension: introducer, label, size, 4 data, term
        out.append(bytes([0x21, 0xF9, 0x04, 0x00, 0x0A, 0x00, 0x00, 0x00]))
        # image descriptor: separator + 9 bytes (no local color table)
        out.append(b"\x2c" + bytes(8) + bytes([0x00]))
        out.append(bytes([0x02]))  # LZW minimum code size
        payload = (doc_id + i * 31) % 200 + 1
        out.append(bytes([payload]) + bytes(payload))  # one sub-block
        out.append(b"\x00")  # block terminator
    out.append(b"\x3b")  # trailer
    return b"".join(out)


def walk_gif(buf: bytes) -> tuple[int, int, int, int]:
    """Structural GIF walk -> (width, height, n_frames, data_bytes).
    Parses the real block grammar: header + logical screen
    descriptor, global color table when flagged, extension blocks
    (label + sub-block chain), image descriptors (+ optional local
    color table) with their LZW sub-block chains, trailer. No LZW
    decode — pixel decompression is the documented codec gate — but
    every block boundary is honored, so a malformed container fails
    loudly instead of producing garbage stats."""
    if buf[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    w = int.from_bytes(buf[6:8], "little")
    h = int.from_bytes(buf[8:10], "little")
    packed = buf[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    frames = 0
    data_bytes = 0

    def skip_subblocks(p: int) -> tuple[int, int]:
        total = 0
        while True:
            if p >= len(buf):
                raise ValueError("truncated sub-block chain")
            n = buf[p]
            p += 1
            if n == 0:
                return p, total
            total += n
            p += n

    while True:
        if pos >= len(buf):
            raise ValueError("missing trailer")
        b = buf[pos]
        pos += 1
        if b == 0x3B:  # trailer
            return w, h, frames, data_bytes
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            pos, _ = skip_subblocks(pos)
        elif b == 0x2C:  # image descriptor
            desc = buf[pos : pos + 9]
            pos += 9
            if desc[8] & 0x80:
                pos += 3 * (2 << (desc[8] & 0x07))
            pos += 1  # LZW minimum code size
            pos, n = skip_subblocks(pos)
            frames += 1
            data_bytes += n
        else:
            raise ValueError(f"unknown block 0x{b:02x} at {pos - 1}")


def encode_tga_pattern(width: int, height: int) -> bytes:
    """24-bit uncompressed true-color TGA (image type 2) with a
    deterministic per-pixel pattern distinct from the BMP one:
    B=(x*3+y*19)%256, G=(x*13+y*5)%256, R=(x*9+y*11)%256. Written
    TOP-DOWN (descriptor bit 5 set) with no row padding — the two
    container details that differ from BMP (bottom-up, 4-byte row
    stride), so a decoder that silently assumes BMP conventions
    produces wrong rows and fails the arithmetic oracle."""
    import struct

    header = struct.pack(
        "<BBBHHBHHHHBB",
        0,  # id length
        0,  # no color map
        2,  # uncompressed true-color
        0,  # color map first entry
        0,  # color map length
        0,  # color map entry size
        0,  # x-origin
        0,  # y-origin
        width,
        height,
        24,  # bits per pixel
        0x20,  # descriptor: top-to-bottom row order
    )
    body = bytes(
        v
        for y in range(height)
        for x in range(width)
        for v in (
            (x * 3 + y * 19) % 256,
            (x * 13 + y * 5) % 256,
            (x * 9 + y * 11) % 256,
        )
    )
    return header + body


def decode_tga_pixels(
    buf: bytes,
) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Pure-Python 24-bit TGA decode -> (width, height, rows of
    (B, G, R) in image coordinates, y=0 top). Honors descriptor
    bit 5 (top-down vs bottom-up) and the id-field length; rejects
    color-mapped/RLE types loudly rather than misreading them."""
    import struct

    id_len, cmap_type, img_type = buf[0], buf[1], buf[2]
    if cmap_type != 0 or img_type != 2:
        raise ValueError(f"unsupported TGA (cmap={cmap_type}, type={img_type})")
    width, height = struct.unpack_from("<HH", buf, 12)
    bpp = buf[16]
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    top_down = bool(buf[17] & 0x20)
    off = 18 + id_len
    row_len = width * 3
    img = []
    for y in range(height):
        r = y if top_down else height - 1 - y
        base = off + r * row_len
        img.append(
            [tuple(buf[base + 3 * x : base + 3 * x + 3]) for x in range(width)]
        )
    return width, height, img


def encode_qoi_pattern(width: int, height: int) -> bytes:
    """QOI ("Quite OK Image", public-domain spec, qoiformat.org)
    encoder for the deterministic block pattern
    R=(x//3*5+y*17)%256, G=(x//3*11+y*3)%256, B=(x//3*7+y*13)%256
    (3-wide blocks so RUN chunks actually occur). QOI is a REAL
    compressed codec — run-length, a 64-slot seen-pixel index, and
    2-/8-bit delta chunks — implementable exactly from the one-page
    spec with no library, which is what makes a genuinely
    compressed-format decode testable in this sandbox."""
    import struct

    out = bytearray(b"qoif")
    out += struct.pack(">IIBB", width, height, 3, 0)
    index = [(0, 0, 0, 255)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    for y in range(height):
        for x in range(width):
            px = (
                (x // 3 * 5 + y * 17) % 256,
                (x // 3 * 11 + y * 3) % 256,
                (x // 3 * 7 + y * 13) % 256,
                255,
            )
            if px == prev:
                run += 1
                if run == 62:
                    out.append(0xC0 | (run - 1))
                    run = 0
            else:
                if run:
                    out.append(0xC0 | (run - 1))
                    run = 0
                h = (px[0] * 3 + px[1] * 5 + px[2] * 7 + px[3] * 11) % 64
                if index[h] == px:
                    out.append(h)
                else:
                    index[h] = px
                    dr = (px[0] - prev[0]) % 256
                    dg = (px[1] - prev[1]) % 256
                    db = (px[2] - prev[2]) % 256
                    # map to signed
                    sr = dr - 256 if dr > 127 else dr
                    sg = dg - 256 if dg > 127 else dg
                    sb = db - 256 if db > 127 else db
                    if -2 <= sr <= 1 and -2 <= sg <= 1 and -2 <= sb <= 1:
                        out.append(0x40 | ((sr + 2) << 4) | ((sg + 2) << 2) | (sb + 2))
                    elif (
                        -32 <= sg <= 31
                        and -8 <= (sr - sg) <= 7
                        and -8 <= (sb - sg) <= 7
                    ):
                        out.append(0x80 | (sg + 32))
                        out.append(((sr - sg + 8) << 4) | (sb - sg + 8))
                    else:
                        out += bytes((0xFE, px[0], px[1], px[2]))
            prev = px
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def decode_qoi_pixels(
    buf: bytes,
) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Pure-Python QOI decode -> (width, height, flat [(R, G, B)]).
    Implements all five op chunks (RGB, RGBA, INDEX, DIFF, LUMA,
    RUN) per the public spec; loud failure on a bad magic."""
    import struct

    if buf[:4] != b"qoif":
        raise ValueError("not a QOI stream")
    width, height, channels, _cs = struct.unpack_from(">IIBB", buf, 4)
    pos = 14
    index = [(0, 0, 0, 255)] * 64
    px = (0, 0, 0, 255)
    out: list[tuple[int, int, int]] = []
    n = width * height
    while len(out) < n:
        b0 = buf[pos]
        pos += 1
        if b0 == 0xFE:  # RGB
            px = (buf[pos], buf[pos + 1], buf[pos + 2], px[3])
            pos += 3
        elif b0 == 0xFF:  # RGBA
            px = (buf[pos], buf[pos + 1], buf[pos + 2], buf[pos + 3])
            pos += 4
        elif b0 >> 6 == 0:  # INDEX
            px = index[b0 & 0x3F]
        elif b0 >> 6 == 1:  # DIFF
            px = (
                (px[0] + ((b0 >> 4) & 3) - 2) % 256,
                (px[1] + ((b0 >> 2) & 3) - 2) % 256,
                (px[2] + (b0 & 3) - 2) % 256,
                px[3],
            )
        elif b0 >> 6 == 2:  # LUMA
            dg = (b0 & 0x3F) - 32
            b1 = buf[pos]
            pos += 1
            px = (
                (px[0] + dg + ((b1 >> 4) & 0xF) - 8) % 256,
                (px[1] + dg) % 256,
                (px[2] + dg + (b1 & 0xF) - 8) % 256,
                px[3],
            )
        else:  # RUN
            run = (b0 & 0x3F) + 1
            out.extend([px[:3]] * run)
            index[(px[0] * 3 + px[1] * 5 + px[2] * 7 + px[3] * 11) % 64] = px
            continue
        index[(px[0] * 3 + px[1] * 5 + px[2] * 7 + px[3] * 11) % 64] = px
        out.append(px[:3])
    return width, height, out[:n]


def encode_tiff_header(width: int, height: int, big_endian: bool) -> bytes:
    """Minimal baseline-TIFF header: byte-order mark (II little /
    MM big), magic 42, one IFD with ImageWidth(256),
    ImageLength(257), BitsPerSample(258), SamplesPerPixel(277) —
    every multi-byte field honoring the declared byte order. TIFF is
    the container where ENDIANNESS is data, which is exactly the
    parsing edge this fixture exists to pin."""
    import struct

    bo = ">" if big_endian else "<"
    out = bytearray(b"MM" if big_endian else b"II")
    out += struct.pack(bo + "H", 42)
    out += struct.pack(bo + "I", 8)  # IFD starts right after header
    entries = [
        (256, 3, 1, width),
        (257, 3, 1, height),
        (258, 3, 1, 8),
        (277, 3, 1, 3),
    ]
    out += struct.pack(bo + "H", len(entries))
    for tag, typ, cnt, val in entries:
        # SHORT values live left-justified in the 4-byte value slot
        # IN FILE BYTE ORDER (first two bytes either way).
        out += struct.pack(bo + "HHI", tag, typ, cnt)
        out += struct.pack(bo + "H", val) + b"\x00\x00"
    out += struct.pack(bo + "I", 0)  # no next IFD
    return bytes(out)


def decode_tiff_tags(buf: bytes) -> dict:
    """Endianness-aware TIFF IFD walk -> {tag: value}. Rejects a bad
    byte-order mark or magic loudly. Handles SHORT (3) and LONG (4)
    inline values, honoring that a SHORT sits in the first two bytes
    of the value slot IN FILE BYTE ORDER — the classic bug in naive
    parsers that always read little-endian."""
    import struct

    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    if struct.unpack_from(bo + "H", buf, 2)[0] != 42:
        raise ValueError("bad TIFF magic")
    ifd = struct.unpack_from(bo + "I", buf, 4)[0]
    n = struct.unpack_from(bo + "H", buf, ifd)[0]
    tags = {}
    for i in range(n):
        off = ifd + 2 + 12 * i
        tag, typ, _cnt = struct.unpack_from(bo + "HHI", buf, off)
        if typ == 3:
            tags[tag] = struct.unpack_from(bo + "H", buf, off + 8)[0]
        elif typ == 4:
            tags[tag] = struct.unpack_from(bo + "I", buf, off + 8)[0]
    return tags


def encode_png_pattern(width: int, height: int, seed: int) -> bytes:
    """Minimal-but-REAL PNG encoder (8-bit RGB, color type 2) for the
    deterministic pattern R=(seed*7+x*3+y*11)%256,
    G=(seed*13+x*5+y*2)%256, B=(seed*3+x*9+y*7)%256. Each scanline
    is filtered with type y%5 — None/Sub/Up/Average/Paeth — so a
    decoder must implement ALL FIVE filter reconstructions, then the
    filtered stream is zlib-compressed into one IDAT chunk with real
    CRC-32s. Pure stdlib (zlib, struct): this exercises an actual
    DEFLATE-compressed container, the format 90% of web images ship
    in."""
    import struct
    import zlib

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    def px(x: int, y: int) -> tuple[int, int, int]:
        return (
            (seed * 7 + x * 3 + y * 11) % 256,
            (seed * 13 + x * 5 + y * 2) % 256,
            (seed * 3 + x * 9 + y * 7) % 256,
        )

    def paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    raw = bytearray()
    prev_row = bytes(3 * width)
    for y in range(height):
        row = bytearray()
        for x in range(width):
            row += bytes(px(x, y))
        ft = y % 5
        raw.append(ft)
        filt = bytearray()
        for i in range(len(row)):
            a = row[i - 3] if i >= 3 else 0
            b = prev_row[i]
            c = prev_row[i - 3] if i >= 3 else 0
            if ft == 0:
                v = row[i]
            elif ft == 1:
                v = (row[i] - a) % 256
            elif ft == 2:
                v = (row[i] - b) % 256
            elif ft == 3:
                v = (row[i] - (a + b) // 2) % 256
            else:
                v = (row[i] - paeth(a, b, c)) % 256
            filt.append(v)
        raw += filt
        prev_row = bytes(row)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def decode_png_pixels(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Full PNG decode for 8-bit RGB: chunk walk with CRC-32
    verification, zlib inflate of the concatenated IDAT stream, and
    per-scanline reverse filtering (None/Sub/Up/Average/Paeth per
    the PNG spec's reconstruction functions). Raises on any CRC or
    structure violation — a decoder that silently accepts corrupt
    containers is worse than none."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("bad PNG signature")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = 3 * width

    def paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    pixels: list[tuple[int, int, int]] = []
    prev = bytearray(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        for i in range(stride):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ft == 1:
                line[i] = (line[i] + a) % 256
            elif ft == 2:
                line[i] = (line[i] + b) % 256
            elif ft == 3:
                line[i] = (line[i] + (a + b) // 2) % 256
            elif ft == 4:
                line[i] = (line[i] + paeth(a, b, c)) % 256
        for x in range(width):
            pixels.append((line[3 * x], line[3 * x + 1], line[3 * x + 2]))
        prev = line
    return width, height, pixels


def encode_srt_pattern(seed: int) -> str:
    """Deterministic SubRip (SRT) subtitle document: n = 3 + seed%8
    cues; cue i (0-based) starts at i*4000 + (seed*37 + i*13) % 2000
    ms, lasts 800 + (seed*11 + i*7) % 2400 ms, and carries a text
    line of 10 + (seed + i*3) % 30 'x' characters. Cue starts are
    strictly increasing but a long cue CAN overlap the next one —
    real subtitle QC work for the parser."""

    def tc(ms: int) -> str:
        h, rem = divmod(ms, 3600000)
        m, rem = divmod(rem, 60000)
        s, milli = divmod(rem, 1000)
        return f"{h:02d}:{m:02d}:{s:02d},{milli:03d}"

    n = 3 + seed % 8
    blocks = []
    for i in range(n):
        start = i * 4000 + (seed * 37 + i * 13) % 2000
        dur = 800 + (seed * 11 + i * 7) % 2400
        text = "x" * (10 + (seed + i * 3) % 30)
        blocks.append(f"{i + 1}\n{tc(start)} --> {tc(start + dur)}\n{text}")
    return "\n\n".join(blocks) + "\n"


def parse_srt(doc: str) -> list[tuple[int, int, int, str]]:
    """Parse SRT text into (index, start_ms, end_ms, text) cues with
    strict validation: sequential indices, 'HH:MM:SS,mmm --> ...'
    timecodes, end > start. Raises ValueError on malformed input."""
    import re

    tc = re.compile(
        r"^(\d{2}):(\d{2}):(\d{2}),(\d{3}) --> "
        r"(\d{2}):(\d{2}):(\d{2}),(\d{3})$"
    )
    cues = []
    for block in doc.strip().split("\n\n"):
        lines = block.split("\n")
        if len(lines) < 3:
            raise ValueError(f"short cue block: {block!r}")
        idx = int(lines[0])
        m = tc.match(lines[1])
        if not m:
            raise ValueError(f"bad timecode line: {lines[1]!r}")
        g = [int(x) for x in m.groups()]
        start = ((g[0] * 60 + g[1]) * 60 + g[2]) * 1000 + g[3]
        end = ((g[4] * 60 + g[5]) * 60 + g[6]) * 1000 + g[7]
        if end <= start:
            raise ValueError(f"non-positive cue duration in block {idx}")
        if idx != len(cues) + 1:
            raise ValueError(f"non-sequential cue index {idx}")
        cues.append((idx, start, end, "\n".join(lines[2:])))
    return cues

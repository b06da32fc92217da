"""Spec certification for the from-scratch protobuf wire format
(operators/protowire.py) and the SMF MIDI codec (operators/midi.py).

The protobuf golden vectors are the encoding guide's own examples
(https://protobuf.dev/programming-guides/encoding/): a message with
field 1 = varint 150 is exactly `08 96 01`, and field 2 = "testing"
is exactly `12 07 74 65 73 74 69 6e 67`. Everything else is
round-trip + evolution properties (unknown-field skip is the entire
proto schema-evolution contract) and loud-failure modes.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dags_spark.operators.midi import (
    build_smf,
    decode_vlq,
    encode_vlq,
    parse_smf,
)
from dags_spark.operators.protowire import (
    decode_record,
    decode_varint,
    encode_record,
    encode_varint,
    read_delimited,
    unzigzag,
    write_delimited,
    zigzag,
)

SCHEMA = {
    1: ("a", "int64"),
    2: ("s", "string"),
    3: ("d", "double"),
    4: ("f", "float"),
    5: ("z", "sint64"),
    6: ("bb", "bytes"),
    7: ("ok", "bool"),
}


def test_spec_golden_vectors():
    # the encoding guide's canonical examples, byte for byte
    assert encode_record({"a": 150}, {1: ("a", "int64")}) == bytes.fromhex(
        "089601"
    )
    assert (
        encode_record({"b": "testing"}, {2: ("b", "string")})
        == b"\x12\x07testing"
    )
    # varint edge values
    assert encode_varint(0) == b"\x00"
    assert encode_varint(127) == b"\x7f"
    assert encode_varint(128) == b"\x80\x01"
    assert encode_varint(300) == b"\xac\x02"  # spec's 300 example
    # negative int64 is 10 bytes of two's complement
    assert len(encode_varint(-1)) == 10
    v, _ = decode_varint(encode_varint(-1), 0)
    assert v == (1 << 64) - 1


def test_zigzag_spec_table():
    # the spec's zigzag table: 0->0, -1->1, 1->2, -2->3, ...
    for n, z in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4), (-3, 5)]:
        assert zigzag(n) == z
        assert unzigzag(z) == n
    assert zigzag(2**63 - 1) == (1 << 64) - 2
    assert unzigzag(zigzag(-(2**63))) == -(2**63)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.text(max_size=40),
    st.floats(allow_nan=False, allow_infinity=False),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.binary(max_size=40),
    st.booleans(),
)
def test_record_roundtrip_property(a, s, d, z, bb, ok):
    rec = {"a": a, "s": s, "d": d, "f": None, "z": z, "bb": bb, "ok": ok}
    back = decode_record(encode_record(rec, SCHEMA), SCHEMA)
    assert back["a"] == a and back["s"] == s and back["z"] == z
    assert back["bb"] == bb and back["ok"] is ok and back["f"] is None
    assert back["d"] == d or (math.isnan(d) and math.isnan(back["d"]))


def test_unknown_field_skip_is_schema_evolution():
    """A v1 reader sees exactly its own fields from a v2 writer's
    bytes, regardless of the new fields' wire types."""
    rec = {"a": 42, "s": "x", "d": 1.5, "f": 2.0, "z": -9, "bb": b"\x00",
           "ok": True}
    enc = encode_record(rec, SCHEMA)
    v1 = {1: ("a", "int64"), 5: ("z", "sint64")}
    assert decode_record(enc, v1) == {"a": 42, "z": -9}


def test_delimited_stream_roundtrip_and_truncation():
    recs = [{"a": i, "s": f"r{i}" * (i % 5), "d": i / 7, "f": None,
             "z": -i, "bb": bytes([i % 256]), "ok": bool(i % 2)}
            for i in range(50)]
    buf = write_delimited(recs, SCHEMA)
    back = read_delimited(buf, SCHEMA)
    assert [r["a"] for r in back] == list(range(50))
    with pytest.raises(ValueError):
        read_delimited(buf[:-1], SCHEMA)


def test_decode_failures_are_loud_and_typed():
    with pytest.raises(ValueError):
        decode_varint(b"\x80" * 11, 0)  # > 10-byte varint
    with pytest.raises(ValueError):
        decode_varint(b"\x80", 0)  # truncated
    with pytest.raises(ValueError):
        decode_record(b"\x00\x01", {1: ("a", "int64")})  # field number 0
    with pytest.raises(ValueError):
        # declared int64 arriving as length-delimited: wire mismatch
        decode_record(b"\x0a\x01x", {1: ("a", "int64")})
    with pytest.raises(ValueError):
        decode_record(b"\x12\x05ab", {2: ("s", "string")})  # short LEN


# ---------------------------------------------------------------- MIDI


def test_midi_vlq_spec_vectors():
    # SMF spec's VLQ examples (big-endian 7-bit groups)
    for n, b in [
        (0x00, b"\x00"),
        (0x40, b"\x40"),
        (0x7F, b"\x7f"),
        (0x80, b"\x81\x00"),
        (0x2000, b"\xc0\x00"),
        (0x3FFF, b"\xff\x7f"),
        (0x4000, b"\x81\x80\x00"),
        (0x0FFFFFFF, b"\xff\xff\xff\x7f"),
    ]:
        assert encode_vlq(n) == b
        v, _ = decode_vlq(b, 0)
        assert v == n


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 1000),
            st.integers(0, 15),
            st.integers(0, 127),
            st.integers(1, 127),
        ),
        min_size=1,
        max_size=32,
    )
)
def test_midi_roundtrip_property(notes):
    meta = parse_smf(build_smf(notes))
    assert meta["note_on_count"] == len(notes)
    assert meta["distinct_pitches"] == len({p for _, _, p, _ in notes})
    assert meta["distinct_channels"] == len({c for _, c, _, _ in notes})
    assert meta["pitch_sum"] == sum(p for _, _, p, _ in notes)
    # every note-on is followed by a note-off one tick later
    assert meta["total_ticks"] == sum(d for d, _, _, _ in notes) + len(notes)


def test_midi_running_status_is_exercised():
    """build_smf emits status-less repeated note-offs for odd notes:
    a parser without the running-status rule cannot read our files."""
    smf = build_smf([(5, 0, 60, 100), (5, 1, 62, 100)])
    # the second note's extra note-off rides running status: the
    # sequence ...81 3e 40 00 3e 40... has a delta then a DATA byte
    meta = parse_smf(smf)
    assert meta["note_on_count"] == 2


def test_midi_loud_failures():
    smf = build_smf([(1, 0, 60, 64)])
    with pytest.raises(ValueError):
        parse_smf(b"XXXX" + smf[4:])  # bad magic
    with pytest.raises(ValueError):
        parse_smf(smf[:20])  # truncated track
    # orphan data byte with no running status
    bad = bytearray(smf)
    # find the first status byte (0x90) after the MTrk header and
    # replace it with a data byte
    idx = bad.index(0x90, 22)
    bad[idx] = 0x40
    with pytest.raises(ValueError):
        parse_smf(bytes(bad))


# ---------------------------------------------------------------- FLAC


def test_flac_streaminfo_bit_packing():
    from dags_spark.operators.flacmeta import build_flac_meta, parse_flac_meta

    blob = build_flac_meta(
        sample_rate=44100,
        channels=2,
        bits_per_sample=16,
        total_samples=(1 << 36) - 1,
        comments=[("TITLE", "x"), ("ARTIST", "y")],
    )
    m = parse_flac_meta(blob)
    assert m["sample_rate"] == 44100
    assert m["channels"] == 2 and m["bits_per_sample"] == 16
    assert m["total_samples"] == (1 << 36) - 1  # field-width edge
    assert m["n_blocks"] == 3
    assert m["comments"] == {"title": "x", "artist": "y"}


def test_flac_loud_failures():
    import pytest

    from dags_spark.operators.flacmeta import build_flac_meta, parse_flac_meta

    blob = build_flac_meta(8000, 1, 16, 1000)
    with pytest.raises(ValueError, match="stream marker"):
        parse_flac_meta(b"fLaX" + blob[4:])
    with pytest.raises(ValueError, match="truncated"):
        parse_flac_meta(blob[:20])
    # STREAMINFO must be first: swap in a padding block header
    bad = bytearray(blob)
    bad[4] = 0x01  # type 1 (PADDING) where STREAMINFO must be
    with pytest.raises(ValueError, match="first block"):
        parse_flac_meta(bytes(bad))
    with pytest.raises(ValueError, match="out of FLAC range"):
        build_flac_meta(8000, 9, 16, 1000)
    with pytest.raises(ValueError, match="field range"):
        build_flac_meta(1 << 20, 1, 16, 1000)


def test_ico_directory_walk_and_256_rule():
    import pytest

    from dags_spark.operators.binmeta import build_ico, parse_ico

    m = parse_ico(build_ico([(256, 128, 32, 40), (16, 16, 8, 10)]))
    assert m == {
        "n_images": 2,
        "max_width": 256,  # stored as byte 0 per spec
        "max_height": 128,
        "payload_bytes": 50,
        "distinct_bpp": 2,
    }
    blob = build_ico([(32, 32, 4, 20)])
    with pytest.raises(ValueError, match="truncated"):
        parse_ico(blob[:4])
    with pytest.raises(ValueError, match="truncated directory"):
        parse_ico(blob[:10])
    with pytest.raises(ValueError, match="out of bounds"):
        parse_ico(blob[:-5])
    with pytest.raises(ValueError, match="bad header"):
        parse_ico(b"\x00\x00\x02\x00" + blob[4:])  # type 2 = CUR


def test_id3_syncsafe_and_frame_walk():
    import pytest

    from dags_spark.operators.binmeta import (
        _syncsafe_decode,
        _syncsafe_encode,
        build_id3v2,
        parse_id3v2,
    )

    for n in (0, 1, 127, 128, 300, 2**21, 2**28 - 1):
        enc = _syncsafe_encode(n)
        assert not any(b & 0x80 for b in enc)  # the no-0xFF guarantee
        assert _syncsafe_decode(enc) == n
    # the plain-big-endian confusion: 200 encodes as 00 00 01 48, a
    # naive u32 read of which is 328
    assert _syncsafe_encode(200) == bytes([0, 0, 1, 0x48])

    tag = build_id3v2([("TIT2", b"\x03hello"), ("COMM", b"\x00" * 200)])
    t = parse_id3v2(tag)
    assert t["n_frames"] == 2
    assert t["texts"] == {"TIT2": "hello"}
    assert t["payload_bytes"] == 206
    with pytest.raises(ValueError, match="bad magic"):
        parse_id3v2(b"XD3" + tag[3:])
    with pytest.raises(ValueError, match="truncated"):
        parse_id3v2(tag[:30])
    with pytest.raises(ValueError, match="MSB set"):
        _syncsafe_decode(bytes([0x80, 0, 0, 0]))


def test_aiff_f80_roundtrip_and_chunk_walk():
    import pytest

    from dags_spark.operators.binmeta import (
        _f80_decode,
        _f80_encode,
        build_aiff,
        parse_aiff,
    )

    for r in (8000.0, 11025.0, 16000.0, 22050.0, 44100.0, 48000.0,
              96000.0, 192000.0, 44100.5):
        assert _f80_decode(_f80_encode(r)) == r
    a = parse_aiff(build_aiff(2, 37, 16, 44100.0))
    assert a == {
        "channels": 2,
        "sample_frames": 37,
        "sample_size": 16,
        "sample_rate": 44100.0,
        "ssnd_bytes": 148,
    }
    # odd-length SSND exercises the IFF even-padding rule
    b = parse_aiff(build_aiff(1, 3, 8, 8000.0))
    assert b["ssnd_bytes"] == 3
    blob = build_aiff(1, 4, 8, 8000.0)
    with pytest.raises(ValueError, match="bad FORM"):
        parse_aiff(b"FARM" + blob[4:])
    with pytest.raises(ValueError, match="truncated"):
        parse_aiff(blob[:-3])  # FORM length check fires first
    with pytest.raises(ValueError, match="truncated chunk"):
        # keep the FORM length consistent but cut the final chunk body
        cut = bytearray(blob[:-3])
        cut[4:8] = (len(cut) - 8).to_bytes(4, "big")
        parse_aiff(bytes(cut))


def test_cbor_roundtrip_and_truncation():
    import pytest

    from dags_spark.operators.cborio import (
        decode_item,
        decode_sequence,
        encode_item,
    )

    # all three multi-byte head forms + immediate
    for n in (0, 23, 24, 255, 256, 65535, 65536, 2**32 - 1, 2**32):
        assert decode_item(encode_item(n)) == (n, len(encode_item(n)))
        assert decode_item(encode_item(-n - 1))[0] == -n - 1
    # RFC 8949 golden bytes: 500 = 0x19 0x01 0xF4; -500 = 0x39 0x01 0xF3
    assert encode_item(500) == bytes([0x19, 0x01, 0xF4])
    assert encode_item(-500) == bytes([0x39, 0x01, 0xF3])
    assert encode_item("a") == bytes([0x61, ord("a")])

    recs = [
        {"id": i, "neg": -(i + 1), "name": "s" * (i % 40) + str(i),
         "tags": [i % 3, i * 1000]}
        for i in range(0, 300, 7)
    ]
    blob = b"".join(encode_item(r) for r in recs)
    assert decode_sequence(blob) == recs
    for cut in (1, 5, len(blob) - 1):
        with pytest.raises(ValueError):
            decode_sequence(blob[:cut])
    with pytest.raises(ValueError, match="unsupported additional"):
        decode_sequence(bytes([0x1F]))  # ai=31 (indefinite) not in subset
    with pytest.raises(ValueError, match="unsupported type"):
        encode_item(1.5)

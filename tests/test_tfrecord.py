"""TFRecord container + tf.train.Example codec (sources/tfrecord.py):
CRC32C against the RFC 3720 test vectors, framing round trips, the
strict/lenient reader split, record_index bounds, protobuf wire-format
round trips incl. unknown-field skipping and unpacked repeated scalars,
and hostile-input errors."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gfw_pixetl_spark.sources.tfrecord import (
    crc32c, decode_example, encode_example, iter_tfrecord, masked_crc,
    record_index, scan_tfrecord, write_tfrecord,
)


def test_crc32c_rfc3720_vectors():
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E
    assert crc32c(bytes(range(31, -1, -1))) == 0x113FDB5C
    assert crc32c(b"123456789") == 0xE3069283
    # chaining: crc of the whole equals crc of the tail seeded with the
    # crc of the head
    blob = bytes(range(256)) * 3
    assert crc32c(blob) == crc32c(blob[100:], crc32c(blob[:100]))
    assert masked_crc(b"") == (((crc32c(b"") >> 15) | (crc32c(b"") << 17))
                               + 0xA282EAD8) & 0xFFFFFFFF


def test_framing_roundtrip_and_index():
    recs = [b"hello", b"", b"x" * 5000, bytes(range(256))]
    blob = write_tfrecord(recs)
    assert list(iter_tfrecord(blob)) == recs
    idx = record_index(blob)
    assert [s for _, s in idx] == [16 + len(r) for r in recs]
    assert idx[0][0] == 0
    assert idx[-1][0] + idx[-1][1] == len(blob)
    # each indexed span is independently iterable (the ranged-GET shape)
    for (o, s), want in zip(idx, recs):
        assert list(iter_tfrecord(blob[o:o + s])) == [want]


def test_strict_reader_raises_on_damage():
    blob = write_tfrecord([b"abcdef", b"ghijkl"])
    for cut in (3, 11, 14, len(blob) - 2):
        with pytest.raises(ValueError):
            list(iter_tfrecord(blob[:cut]))
    flipped = bytearray(blob)
    flipped[13] ^= 0x01  # payload byte
    with pytest.raises(ValueError, match="data CRC"):
        list(iter_tfrecord(bytes(flipped)))
    flipped = bytearray(blob)
    flipped[0] ^= 0x01  # length byte
    with pytest.raises(ValueError, match="length CRC"):
        list(iter_tfrecord(bytes(flipped)))


def test_lenient_scan_skip_and_count():
    recs = [f"record number {i}".encode() * (i + 1) for i in range(6)]
    blob = write_tfrecord(recs)
    idx = record_index(blob)

    # payload flip: that record lost, framing resync is exact
    dam = bytearray(blob)
    dam[idx[2][0] + 13] ^= 0xFF
    got, c = scan_tfrecord(bytes(dam))
    assert got == recs[:2] + recs[3:]
    assert c["bad_records"] == 1 and c["junk_bytes"] == idx[2][1]

    # garbage BETWEEN records: byte-slide resync finds the next header
    o = idx[3][0]
    injected = blob[:o] + b"\x00GARBAGE!\x00" + blob[o:]
    got, c = scan_tfrecord(injected)
    assert got == recs
    assert c["junk_bytes"] == 10 and c["bad_records"] == 1

    # tail truncation: remaining bytes counted as junk
    cut = idx[4][0] + 5
    got, c = scan_tfrecord(blob[:cut])
    assert got == recs[:4]
    assert c["junk_bytes"] == 5 and c["bad_records"] == 1

    # clean shard: zero counters
    got, c = scan_tfrecord(blob)
    assert got == recs and c["bad_records"] == 0 and c["junk_bytes"] == 0


def test_example_roundtrip_all_kinds():
    ex = encode_example({
        "text": [b"abc", "déf"],
        "ids": [0, 1, -5, 2**62, -(2**62)],
        "emb": [1.5, -2.25, 0.0],
    })
    d = decode_example(ex)
    assert d["text"] == [b"abc", "déf".encode("utf-8")]
    assert d["ids"] == [0, 1, -5, 2**62, -(2**62)]
    assert d["emb"] == [1.5, -2.25, 0.0]
    # deterministic encoding: same dict -> same bytes, any insert order
    ex2 = encode_example({
        "emb": [1.5, -2.25, 0.0],
        "ids": [0, 1, -5, 2**62, -(2**62)],
        "text": [b"abc", "déf"],
    })
    assert ex == ex2


def test_example_unknown_fields_and_unpacked_scalars():
    # hand-build: Features(1){ entry{ key="n", value=Feature{
    #   int64_list(3) = Int64List{ UNPACKED value(1)=7, value(1)=8 }}}}
    # plus an unknown field 9 (varint) inside Feature — must be skipped
    int64_list = bytes([0x08, 0x07, 0x08, 0x08])          # two unpacked
    feature = bytes([0x48, 0x63]) + bytes([0x1A, len(int64_list)]) \
        + int64_list                                       # field9 + f3
    entry = bytes([0x0A, 0x01]) + b"n" \
        + bytes([0x12, len(feature)]) + feature
    feats = bytes([0x0A, len(entry)]) + entry
    ex = bytes([0x0A, len(feats)]) + feats
    assert decode_example(ex) == {"n": [7, 8]}
    # unpacked floats (wire type 5)
    flist = struct.pack("<B", 0x0D) + struct.pack("<f", 2.5)
    feature = bytes([0x12, len(flist)]) + flist
    entry = bytes([0x0A, 0x01]) + b"f" + bytes([0x12, len(feature)]) \
        + feature
    feats = bytes([0x0A, len(entry)]) + entry
    ex = bytes([0x0A, len(feats)]) + feats
    assert decode_example(ex) == {"f": [2.5]}


def test_encoder_rejects_bad_features():
    with pytest.raises(ValueError, match="empty"):
        encode_example({"x": []})
    with pytest.raises(ValueError, match="list"):
        encode_example({"x": 3})
    with pytest.raises(ValueError, match="bool"):
        encode_example({"x": [True]})


def test_truncated_example_raises():
    ex = encode_example({"ids": [1, 2, 3]})
    for cut in range(1, len(ex)):
        try:
            decode_example(ex[:cut])
        except ValueError:
            pass  # either a clean partial decode or a clean error


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(max_size=300), max_size=8),
       st.integers(0, 2**32 - 1))
def test_property_framing_single_corruption_survival(recs, seed):
    """Flipping ONE byte anywhere costs at most the record containing
    it — every other record survives the lenient scan."""
    blob = write_tfrecord(recs)
    if not blob:
        return
    pos = seed % len(blob)
    dam = bytearray(blob)
    dam[pos] ^= 1 + (seed >> 8) % 255
    got, c = scan_tfrecord(bytes(dam))
    # the multiset of surviving records is a sub-multiset of the input
    pool = list(recs)
    for r in got:
        assert r in pool
        pool.remove(r)
    assert len(got) >= len(recs) - 1
    assert c["bad_records"] <= 1 + c["junk_bytes"] // 12


@settings(max_examples=30, deadline=None)
@given(st.dictionaries(
    st.text(min_size=1, max_size=8),
    st.one_of(
        st.lists(st.binary(max_size=50), min_size=1, max_size=5),
        st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1,
                 max_size=6),
    ),
    max_size=5))
def test_property_example_roundtrip(features):
    got = decode_example(encode_example(features))
    want = {k: ([x if isinstance(x, bytes) else x for x in v])
            for k, v in features.items()}
    assert got == want

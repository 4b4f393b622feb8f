"""AVI (RIFF) container codec tests — sources/avi.py.

The container is ours both directions, so round trips must be byte-exact
and the idx1 base ambiguity (movi-relative per spec vs absolute file
offsets, the common historical deviation) must both resolve.
"""

from __future__ import annotations

import struct

import pytest

from gfw_pixetl_spark.sources.avi import encode_avi, frame_ranges, parse_avi

FRAMES = [b"\xff\xd8" + bytes(range(n)) + b"\xff\xd9" for n in (3, 10, 7, 1)]


def _slices(data, ranges):
    return [data[s:e] for s, e in ranges]


def test_round_trip_relative_index():
    data = encode_avi(FRAMES, width=16, height=16, fps=25)
    meta = parse_avi(data)
    assert _slices(data, meta["streams"][0]) == FRAMES
    assert (meta["width"], meta["height"]) == (16, 16)
    assert meta["n_frames"] == len(FRAMES)
    assert meta["handler"] == "MJPG"
    assert (meta["fps_num"], meta["fps_den"]) == (25, 1)


def test_round_trip_absolute_index():
    data = encode_avi(FRAMES, 8, 8, absolute_index=True)
    assert _slices(data, frame_ranges(data)) == FRAMES


def test_movi_walk_without_index():
    data = encode_avi(FRAMES, 8, 8, write_index=False)
    assert _slices(data, frame_ranges(data)) == FRAMES


def test_odd_size_frames_word_aligned():
    frames = [b"a", b"bc", b"def"]
    data = encode_avi(frames, 4, 4)
    assert _slices(data, frame_ranges(data)) == frames
    # chunk headers must stay word-aligned despite odd frame sizes
    for start, _end in frame_ranges(data):
        assert (start - 8) % 2 == 0


def test_rec_list_grouping():
    """Chunks inside a LIST('rec ') group (the interleave hint layout)
    are found by the movi walk."""
    base = encode_avi(FRAMES[:2], 4, 4, write_index=False)
    # rebuild: wrap each 00dc chunk in its own rec list
    meta = parse_avi(base)
    chunks = b""
    for s, e in meta["streams"][0]:
        body = base[s:e]
        ck = b"00dc" + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) % 2 else b"")
        chunks += b"LIST" + struct.pack("<I", 4 + len(ck)) + b"rec " + ck
    movi = b"LIST" + struct.pack("<I", 4 + len(chunks)) + b"movi" + chunks
    hdrl_end = base.index(b"LISTmovi"[:4], 12)  # keep original hdrl
    # find movi list start in the original
    pos = 12
    while base[pos:pos + 4] != b"LIST" or base[pos + 8:pos + 12] != b"movi":
        (sz,) = struct.unpack("<I", base[pos + 4:pos + 8])
        pos += 8 + sz + (sz % 2)
    body = base[12:pos] + movi
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
    assert _slices(data, frame_ranges(data)) == FRAMES[:2]
    assert hdrl_end  # silence lint: computed for clarity


def test_truncated_raises():
    data = encode_avi(FRAMES, 4, 4)
    with pytest.raises(ValueError):
        parse_avi(data[: len(data) // 2])
    with pytest.raises(ValueError):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_bad_idx1_base_raises():
    data = bytearray(encode_avi(FRAMES, 4, 4))
    idx = data.rindex(b"idx1")
    # corrupt the first entry's offset so neither base convention lands
    # on a chunk header
    struct.pack_into("<I", data, idx + 16, 0xDEAD)
    with pytest.raises(ValueError):
        parse_avi(bytes(data))


def test_empty_frames_rejected():
    with pytest.raises(ValueError):
        encode_avi([], 4, 4)


def test_audio_stream_numbering():
    """A second stream's chunks ('01wb') partition by stream number."""
    base = encode_avi(FRAMES[:2], 4, 4, write_index=False)
    pos = 12
    while base[pos:pos + 4] != b"LIST" or base[pos + 8:pos + 12] != b"movi":
        (sz,) = struct.unpack("<I", base[pos + 4:pos + 8])
        pos += 8 + sz + (sz % 2)
    (movi_sz,) = struct.unpack("<I", base[pos + 4:pos + 8])
    movi_body = base[pos + 8:pos + 8 + movi_sz]
    audio = b"01wb" + struct.pack("<I", 4) + b"\x01\x02\x03\x04"
    movi_body += audio
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = base[12:pos] + movi
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
    meta = parse_avi(data)
    assert _slices(data, meta["streams"][0]) == FRAMES[:2]
    assert _slices(data, meta["streams"][1]) == [b"\x01\x02\x03\x04"]


def test_avi_payload_decodes_via_jpeg():
    """avi_payload frames decode through the real JPEG path to the
    DC-exact digest construction."""
    import hashlib

    from gfw_pixetl_spark.functions.multimodal import (
        _video_index, avi_payload, decode_image,
    )

    payload = avi_payload("hello world", n_frames=4)
    index = _video_index(payload)
    assert len(index) == 4
    s, e = index[2]
    img = decode_image(payload[s:e])
    digest = hashlib.md5(b"hello world:2").digest()
    assert img.shape == (16, 16, 1)
    assert int(img[0, 0, 0]) == digest[0]
    assert int(img[0, 8, 0]) == digest[1]
    assert int(img[8, 0, 0]) == digest[2]
    assert int(img[8, 8, 0]) == digest[3]


def test_ranged_reader_skips_junk_padding():
    """The classic VfW layout inserts JUNK alignment chunks between
    hdrl/movi and movi/idx1; the ranged reader must skip them like the
    full parse does (round-7 review finding)."""
    import io

    from gfw_pixetl_spark.sources.avi import RangedAviReader

    base = encode_avi(FRAMES, 8, 8)
    # splice JUNK before movi and before idx1
    pos = 12
    while base[pos:pos + 4] != b"LIST" or base[pos + 8:pos + 12] != b"movi":
        (sz,) = struct.unpack("<I", base[pos + 4:pos + 8])
        pos += 8 + sz + (sz % 2)
    (movi_sz,) = struct.unpack("<I", base[pos + 4:pos + 8])
    movi_end = pos + 8 + movi_sz + (movi_sz % 2)
    junk = b"JUNK" + struct.pack("<I", 6) + b"\0" * 6
    data = base[12:pos] + junk + base[pos:movi_end] + junk \
        + base[movi_end:]
    data = b"RIFF" + struct.pack("<I", 4 + len(data)) + b"AVI " + data
    r = RangedAviReader(io.BytesIO(data), len(data))
    rng = r.frame_ranges()
    assert [data[s:e] for s, e in rng] == FRAMES
    assert rng == frame_ranges(data)  # full parse agrees

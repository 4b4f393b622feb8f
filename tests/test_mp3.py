"""MP3 container audit (sources/mp3.py): frame-header walk with the
real bitrate/samplerate tables, ID3v1/v2 round trips, junk resync,
layer/version variants hand-built from the spec tables."""

from __future__ import annotations

import struct

import pytest

from gfw_pixetl_spark.sources.mp3 import (
    BITRATES_V1_L3, SAMPLERATES_V1, audit_mp3, frame_header,
    frame_length, parse_id3v1, parse_id3v2, write_id3v1, write_id3v2,
    write_mp3,
)


def test_cbr_audit_exact():
    blob = write_mp3([(9, 0, 0)] * 50,
                     id3v2={"TIT2": "Song", "TPE1": "Band"},
                     id3v1=write_id3v1(title="Song", year="1999"))
    a = audit_mp3(blob)
    assert a["n_frames"] == 50
    assert a["samples"] == 50 * 1152
    assert a["samplerate"] == 44100
    assert a["layout"] == "cbr"
    assert a["bitrates_kbps"] == [BITRATES_V1_L3[9]]
    assert a["junk_bytes"] == 0
    assert a["id3v2"]["TIT2"] == "Song"
    assert a["id3v1"]["title"] == "Song" and a["id3v1"]["year"] == "1999"
    assert a["duration_sec"] == pytest.approx(50 * 1152 / 44100)


def test_vbr_layout_and_padding_lengths():
    specs = [((k % 14) + 1, 1, k % 2) for k in range(28)]
    a = audit_mp3(write_mp3(specs))
    assert a["n_frames"] == 28
    assert a["layout"] == "vbr"
    assert a["bitrates_kbps"] == sorted(set(BITRATES_V1_L3[1:]))
    # padding-aware frame length: +1 byte when the pad bit is set
    assert frame_length(9, 1, 1) == frame_length(9, 1, 0) + 1


def test_junk_resync_and_empty():
    blob = write_mp3([(5, 2, 0)] * 3)
    dirty = b"\x00JUNK\x00" + blob[:len(blob) // 2] \
        + b"\xffgarbage" + blob[len(blob) // 2:]
    a = audit_mp3(dirty)
    # all intact frames found despite the junk (resync is byte-wise)
    assert a["n_frames"] >= 3
    assert a["junk_bytes"] > 0
    assert audit_mp3(b"not audio at all")["layout"] == "none"


def test_id3v2_v4_syncsafe_and_utf16():
    # hand-build an ID3v2.4 tag with a UTF-16 title
    payload = b"\x01" + "Träck".encode("utf-16")
    body = (b"TIT2" + bytes(((len(payload) >> s) & 0x7F)
                            for s in (21, 14, 7, 0))
            + b"\x00\x00" + payload)
    tag = b"ID3\x04\x00\x00" + bytes(((len(body) >> s) & 0x7F)
                                     for s in (21, 14, 7, 0)) + body
    frames, end = parse_id3v2(tag)
    assert frames["TIT2"] == "Träck"
    assert end == len(tag)
    assert parse_id3v2(b"no tag here") == ({}, 0)
    assert parse_id3v1(b"x" * 127) == {}


def test_mpeg2_layer3_and_layer1_framing():
    """Hand-built MPEG-2 L3 and MPEG-1 L1 headers walk with the right
    frame lengths and samples-per-frame."""
    # MPEG-2 (version bits 10), Layer III: 24000 Hz idx 1, 64 kbps idx 8
    h2 = bytes([0xFF, 0xF3, (8 << 4) | (1 << 2), 0x40])
    flen2 = 72000 * 64 // 24000  # 216
    blob = (h2 + bytes(flen2 - 4)) * 4
    a = audit_mp3(blob)
    assert a["n_frames"] == 4 and a["samples"] == 4 * 576
    assert a["samplerate"] == 24000
    # MPEG-1 Layer I (layer bits 11): 384 samples, x4 slot length
    h1 = bytes([0xFF, 0xFF, (9 << 4) | (0 << 2), 0x40])
    flen1 = (12000 * 288 // 44100) * 4
    a = audit_mp3((h1 + bytes(flen1 - 4)) * 3)
    assert a["n_frames"] == 3 and a["samples"] == 3 * 384


def test_writer_rejects_bad_indices():
    with pytest.raises(ValueError, match="index"):
        frame_header(0, 0)
    with pytest.raises(ValueError, match="index"):
        frame_header(15, 0)
    with pytest.raises(ValueError, match="index"):
        frame_header(5, 3)


def test_mpeg2_layer2_is_junk_not_mismeasured():
    """ADVICE r6: MPEG-2 Layer I/II headers must not be measured with
    the Layer III formula (mis-measure -> cascading junk resyncs)."""
    # MPEG-2 (version bits 10 -> b1 0xF5 has layer bits 10 = Layer II)
    h22 = bytes([0xFF, 0xF5, (8 << 4) | (1 << 2), 0x40])
    a = audit_mp3((h22 + bytes(200)) * 3)
    assert a["n_frames"] == 0
    assert a["junk_bytes"] == 3 * 204
    # MPEG-2 Layer I (layer bits 11 -> b1 0xF7): also junk in the audit
    h21 = bytes([0xFF, 0xF7, (8 << 4) | (1 << 2), 0x40])
    assert audit_mp3(h21 + bytes(100))["n_frames"] == 0
    # sanity: MPEG-2 Layer III still parses
    h23 = bytes([0xFF, 0xF3, (8 << 4) | (1 << 2), 0x40])
    flen = 72000 * 64 // 24000
    assert audit_mp3((h23 + bytes(flen - 4)) * 2)["n_frames"] == 2


def test_id3v2_corrupt_size_clamped():
    """ADVICE r6: a corrupt syncsafe size larger than the buffer is
    clamped — parse never reports tag bytes beyond EOF."""
    tag = b"ID3\x04\x00\x00" + b"\x7f\x7f\x7f\x7f" + b"TIT2"
    frames, end = parse_id3v2(tag)
    assert end == len(tag)
    a = audit_mp3(tag)
    assert a["n_frames"] == 0 and a["layout"] == "none"

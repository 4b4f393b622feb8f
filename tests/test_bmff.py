"""ISO-BMFF (mp4) sample-table parser + writer (sources/bmff.py):
round trips, 32/64-bit chunk offsets, multi-run stsc, truncated-box
errors, and the Spark frame-sampling path over real mp4 payloads."""

import hashlib
import struct

import numpy as np
import pytest

from gfw_pixetl_spark.sources.bmff import (
    encode_mp4, extract_samples, find_boxes, iter_boxes, parse_mdhd_timescale,
    sample_ranges,
)


def _frames(n, base=b"frame"):
    return [base + bytes([i]) * (3 + (i % 5)) for i in range(n)]


def test_roundtrip_single_chunk():
    frames = _frames(8)
    mp4 = encode_mp4(frames, width=4, height=4)
    tab = sample_ranges(mp4)
    assert tab["format"] == "png "
    assert (tab["width"], tab["height"]) == (4, 4)
    assert tab["timescale"] == 1000
    assert [mp4[o:o + s] for o, s, _ in tab["samples"]] == frames
    # dts = k * sample_delta from the stts run
    assert [d for _, _, d in tab["samples"]] == [40 * k for k in range(8)]


def test_roundtrip_multi_run_stsc():
    """Chunk plan 3,3,2,1,1 -> stsc runs (1,3),(3,2),(4,1): the run-to-
    next-first_chunk expansion must reassemble every sample range."""
    frames = _frames(10)
    mp4 = encode_mp4(frames, chunk_plan=[3, 3, 2, 1, 1])
    tab = sample_ranges(mp4)
    assert [mp4[o:o + s] for o, s, _ in tab["samples"]] == frames
    # the stsc box really is run-length (3 runs, not 5 entries)
    stbl = find_boxes(mp4, [b"moov", b"trak", b"mdia", b"minf", b"stbl"])
    boxes = {f: (bs, be) for f, bs, be in iter_boxes(mp4, *stbl[0])}
    (n_runs,) = struct.unpack(
        ">I", mp4[boxes[b"stsc"][0] + 4:boxes[b"stsc"][0] + 8])
    assert n_runs == 3


def test_co64_forced_and_auto():
    frames = _frames(5)
    mp4 = encode_mp4(frames, force_co64=True)
    stbl = find_boxes(mp4, [b"moov", b"trak", b"mdia", b"minf", b"stbl"])
    names = {f for f, _, _ in iter_boxes(mp4, *stbl[0])}
    assert b"co64" in names and b"stco" not in names
    tab = sample_ranges(mp4)
    assert [mp4[o:o + s] for o, s, _ in tab["samples"]] == frames


def test_constant_size_stsz_compacts():
    frames = [b"x" * 16] * 6
    mp4 = encode_mp4(frames)
    stbl = find_boxes(mp4, [b"moov", b"trak", b"mdia", b"minf", b"stbl"])
    boxes = {f: (bs, be) for f, bs, be in iter_boxes(mp4, *stbl[0])}
    bs, be = boxes[b"stsz"]
    const, count = struct.unpack(">II", mp4[bs + 4:bs + 12])
    assert (const, count) == (16, 6) and be - bs == 12  # no size array
    assert [mp4[o:o + s] for o, s, _ in sample_ranges(mp4)["samples"]] \
        == frames


def test_mdhd_version1_timescale():
    """Version-1 mdhd carries u64 times; timescale sits at +16 past the
    FullBox header."""
    body = struct.pack(">QQIQ", 0, 0, 90000, 0) + struct.pack(">HH",
                                                              0x55C4, 0)
    box = struct.pack(">I4sB3s", 8 + 4 + len(body), b"mdhd", 1,
                      b"\x00\x00\x00") + body
    assert parse_mdhd_timescale(box, 8) == 90000


def test_truncated_boxes_raise():
    frames = _frames(4)
    mp4 = encode_mp4(frames)
    # cut mid-moov: the box walk must refuse, not mis-slice
    with pytest.raises(ValueError, match="overruns|truncated"):
        sample_ranges(mp4[:-10])
    # header shorter than 8 bytes at top level
    with pytest.raises(ValueError, match="truncated box header"):
        list(iter_boxes(mp4 + b"\x00\x00\x00\x20ab"))
    # box claiming size < header
    bad = struct.pack(">I4s", 4, b"free")
    with pytest.raises(ValueError, match="size 4 < header"):
        list(iter_boxes(bad))
    # non-BMFF input
    with pytest.raises(ValueError, match="ftyp"):
        sample_ranges(b"GPXV" + b"\x00" * 64)


def test_extract_samples_clips_out_of_range():
    frames = _frames(6)
    mp4 = encode_mp4(frames, chunk_plan=[4, 2])
    got = extract_samples(mp4, [0, 3, 5, 17])
    assert [i for i, _ in got] == [0, 3, 5]
    assert all(b == frames[i] for i, b in got)


def test_chunk_plan_must_cover_frames():
    with pytest.raises(ValueError, match="chunk_plan"):
        encode_mp4(_frames(5), chunk_plan=[2, 2])


def test_mp4_payload_digest_pixels():
    """mp4_payload is a spec-valid container whose frame k decodes to
    md5(text:k) digest pixels — the oracle construction q360 replays."""
    from gfw_pixetl_spark.functions.multimodal import (
        decode_image, mp4_payload,
    )

    p = mp4_payload("abc", n_frames=24)
    assert p[4:8] == b"ftyp"
    tab = sample_ranges(p)
    assert len(tab["samples"]) == 24
    # multi-run stsc cycle 5,4,3 -> 6 chunks of [5,4,3,5,4,3]
    for k in (0, 7, 23):
        off, size, _ = tab["samples"][k]
        img = decode_image(p[off:off + size])
        dig = hashlib.md5(f"abc:{k}".encode()).digest()
        assert img.shape[:2] == (4, 4)
        assert img[0, 0, 0] == dig[0] and img[3, 3, 0] == dig[15]


def test_sample_frames_over_bmff(spark):
    """The Spark kernel sniffs ftyp and routes through the real sample
    table; sampled frames decode to the digest pixels."""
    from gfw_pixetl_spark.functions.multimodal import (
        decode_pixel_probe, mp4_payload, sample_frames,
    )

    df = spark.createDataFrame(
        [(1, mp4_payload("hello")), (2, mp4_payload("world"))],
        "doc_id long, payload binary",
    )
    out = sample_frames(df, every_nth=10, n_frames=3)
    probed = decode_pixel_probe(
        out, [(0, 0), (3, 3)], id_cols=("doc_id", "frame_idx"))
    rows = {(r.doc_id, r.frame_idx): (r.p00, r.p33)
            for r in probed.collect()}
    assert set(rows) == {(1, 0), (1, 10), (1, 20),
                         (2, 0), (2, 10), (2, 20)}
    for (doc, fi), (p00, p33) in rows.items():
        text = "hello" if doc == 1 else "world"
        dig = hashlib.md5(f"{text}:{fi}".encode()).digest()
        assert (p00, p33) == (dig[0], dig[15])


def test_writer_is_parseable_box_tree():
    """Every box the writer emits frames correctly at top level."""
    mp4 = encode_mp4(_frames(3))
    names = [f for f, _, _ in iter_boxes(mp4)]
    assert names == [b"ftyp", b"mdat", b"moov"]
    # size==0 (to-end-of-file) final box parses too
    patched = bytearray(mp4)
    moov_at = len(mp4) - (len(mp4) - mp4.rindex(b"moov") + 4)
    struct.pack_into(">I", patched, moov_at, 0)
    names = [f for f, _, _ in iter_boxes(bytes(patched))]
    assert names == [b"ftyp", b"mdat", b"moov"]
    assert sample_ranges(bytes(patched))["samples"]


def test_multitrack_audio_video():
    """Two-track file: the handler selector routes to the right stbl,
    both sample tables round-trip, the audio mdhd timescale carries the
    rate, and the AudioSampleEntry format is exposed."""
    from gfw_pixetl_spark.sources.bmff import encode_mp4_tracks

    video = [b"VF%02d" % i for i in range(4)]
    audio = [struct.pack("<h", 100 * i - 200) for i in range(8)]
    mp4 = encode_mp4_tracks([
        {"samples": video, "handler": b"vide", "fourcc": "png ",
         "width": 4, "height": 4, "chunk_plan": [2, 2]},
        {"samples": audio, "handler": b"soun", "fourcc": "sowt",
         "sample_rate": 8000, "timescale": 8000, "sample_delta": 1,
         "chunk_plan": [3, 3, 2]},
    ])
    v = sample_ranges(mp4, b"vide")
    a = sample_ranges(mp4, b"soun")
    assert [mp4[o:o + s] for o, s, _ in v["samples"]] == video
    assert [mp4[o:o + s] for o, s, _ in a["samples"]] == audio
    assert a["timescale"] == 8000 and a["format"] == "sowt"
    assert [d for _, _, d in a["samples"]] == list(range(8))
    with pytest.raises(ValueError, match="no b'meta' track"):
        sample_ranges(mp4, b"meta")


def test_av_payload_audio_matches_wav_pcm():
    """q364's contract: the mp4 sound track carries the exact PCM the
    pcm16 WAV oracle replays."""
    from gfw_pixetl_spark.functions.multimodal import av_payload, wav_payload
    from gfw_pixetl_spark.sources.bmff import sample_ranges
    from gfw_pixetl_spark.sources.wav import decode_wav

    for text in ("hello", "abc"):
        p = av_payload(text)
        tab = sample_ranges(p, b"soun")
        pcm = [struct.unpack("<h", p[o:o + s])[0]
               for o, s, _ in tab["samples"]]
        wav_s, _ = decode_wav(wav_payload(text, codec="pcm16"))
        assert pcm == [int(x) for x in wav_s[:, 0]]
        # the video track still decodes to digest pixels
        vt = sample_ranges(p, b"vide")
        assert len(vt["samples"]) == 4


def test_zero_samples_per_chunk_raises_not_hangs():
    """ADVICE r5: a malformed stsc run with samples_per_chunk == 0 must
    raise (spec requires >= 1) — the expansion loop used to spin forever
    growing per_chunk unbounded on such input."""
    frames = _frames(4)
    mp4 = bytearray(encode_mp4(frames))
    i = bytes(mp4).index(b"stsc")
    # fourcc at i; ver/flags [i+4,i+8); count [i+8,i+12);
    # entry0 = first_chunk [i+12,i+16), samples_per_chunk [i+16,i+20)
    mp4[i + 16:i + 20] = struct.pack(">I", 0)
    with pytest.raises(ValueError, match="samples_per_chunk"):
        sample_ranges(bytes(mp4))


def test_non_increasing_first_chunk_raises():
    frames = _frames(4)
    mp4 = bytearray(encode_mp4(frames))
    i = bytes(mp4).index(b"stsc")
    mp4[i + 12:i + 16] = struct.pack(">I", 0)  # first_chunk must start at 1
    with pytest.raises(ValueError, match="first_chunk"):
        sample_ranges(bytes(mp4))

"""Pure-Python AVI (RIFF) container codec — the video-container analog
of ``sources/bmff.py``: walk the container's own index to byte ranges so
frame extraction is ranged-GET work, never a full-file decode.

The format is public (Microsoft's AVI RIFF File Reference / the 1992
Video for Windows spec; OpenDML AVI v2 extensions are out of scope):

    RIFF('AVI '
      LIST('hdrl'
        'avih' MainAVIHeader
        LIST('strl' 'strh' AVIStreamHeader, 'strf' BITMAPINFOHEADER))
      LIST('movi' '00dc' <frame bytes> ...)
      'idx1' AVIOLDINDEX entries)

MJPEG ('MJPG') is the classic codec carried this way: each '00dc' chunk
is a standalone baseline JFIF, so the existing ``sources/jpeg.py``
decoder handles the payload and this module only does container work.

The historical idx1 base ambiguity is handled the way real players do:
the spec says offsets are relative to the 'movi' fourcc, but many muxers
wrote absolute file offsets — the reader probes the first entry under
both interpretations and picks the one that lands on a chunk header.

The reference shells video work out to GDAL-adjacent tooling and has no
container path of its own; this module exists for the multimodal
training-data surface (frame sampling at corpus scale), same rationale
as sources/bmff.py.
"""

from __future__ import annotations

import struct

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def encode_avi(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 30,
    fourcc: bytes = b"MJPG",
    write_index: bool = True,
    absolute_index: bool = False,
) -> bytes:
    """Mux independent frame payloads into a spec-valid single-stream AVI.

    ``absolute_index=True`` emits idx1 offsets as absolute file offsets
    (the common historical deviation) so the reader's base probe has a
    real fixture to chew on.
    """
    if not frames:
        raise ValueError("AVI needs at least one frame")
    max_size = max(len(f) for f in frames)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,            # dwMicroSecPerFrame
        max_size * fps,              # dwMaxBytesPerSec
        0,                           # dwPaddingGranularity
        _AVIF_HASINDEX if write_index else 0,
        len(frames),                 # dwTotalFrames
        0,                           # dwInitialFrames
        1,                           # dwStreams
        max_size,                    # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,                  # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", fourcc,
        0, 0, 0,                     # dwFlags, wPriority, wLanguage
        0,                           # dwInitialFrames
        1, fps,                      # dwScale / dwRate = frame rate
        0, len(frames),              # dwStart, dwLength
        max_size,                    # dwSuggestedBufferSize
        0xFFFFFFFF,                  # dwQuality (default)
        0,                           # dwSampleSize (0: one sample/chunk)
        0, 0, width, height,         # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, fourcc,
        width * height * 3, 0, 0, 0, 0,
    )

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) % 2 else b"")

    def lst(tag: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", tag + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)

    movi_body = b"movi"
    rel_offsets = []  # offset of each chunk header relative to 'movi'
    for f in frames:
        rel_offsets.append(len(movi_body))
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)

    # idx1 offsets: relative to the 'movi' fourcc by spec, or absolute
    # file offsets in the deviant layout. Absolute needs the movi list's
    # final file position: RIFF header (12) + hdrl + movi header (8).
    movi_fourcc_pos = 12 + len(hdrl) + 8
    idx_entries = b""
    for rel, f in zip(rel_offsets, frames):
        off = (movi_fourcc_pos + rel) if absolute_index else rel
        idx_entries += struct.pack(
            "<4sIII", b"00dc", _AVIIF_KEYFRAME, off, len(f))
    idx1 = chunk(b"idx1", idx_entries) if write_index else b""

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(data: bytes) -> dict:
    """Parse an AVI container -> header metadata + per-stream byte ranges.

    Returns ``{"width", "height", "fps_num", "fps_den", "n_frames",
    "handler", "streams": {stream_no: [(start, end), ...]}}`` where each
    (start, end) spans the frame DATA (chunk header excluded) in absolute
    file offsets. Prefers the idx1 index when present (that is the
    ranged-GET path: header + index reads only); falls back to a movi
    chunk walk otherwise.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if 8 + riff_size > len(data):
        raise ValueError("truncated AVI: RIFF size exceeds payload")

    meta: dict = {"width": 0, "height": 0, "fps_num": 0, "fps_den": 1,
                  "n_frames": 0, "handler": "", "streams": {}}
    movi_pos = None          # absolute offset of the 'movi' fourcc
    movi_end = None
    idx1_body = None

    pos = 12
    end = 8 + riff_size
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body_start = pos + 8
        if body_start + size > end:
            raise ValueError(f"truncated AVI chunk {tag!r}")
        if tag == b"LIST":
            ltype = data[body_start:body_start + 4]
            if ltype == b"hdrl":
                _parse_hdrl(data, body_start + 4, body_start + size, meta)
            elif ltype == b"movi":
                movi_pos, movi_end = body_start, body_start + size
        elif tag == b"idx1":
            idx1_body = data[body_start:body_start + size]
        pos = body_start + size + (size % 2)

    if movi_pos is None:
        raise ValueError("AVI without a movi list")

    if idx1_body is not None:
        meta["streams"] = _ranges_from_idx1(data, idx1_body, movi_pos)
    else:
        meta["streams"] = _ranges_from_movi(data, movi_pos, movi_end)
    return meta


def _parse_hdrl(data: bytes, pos: int, end: int, meta: dict) -> None:
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if tag == b"avih":
            vals = struct.unpack("<14I", body[:56])
            meta["n_frames"] = vals[4]
            meta["width"], meta["height"] = vals[8], vals[9]
        elif tag == b"LIST" and body[:4] == b"strl":
            sub, sub_end = pos + 12, pos + 8 + size
            while sub + 8 <= sub_end:
                stag = data[sub:sub + 4]
                (ssize,) = struct.unpack("<I", data[sub + 4:sub + 8])
                if stag == b"strh":
                    sh = data[sub + 8:sub + 8 + ssize]
                    if sh[:4] == b"vids":
                        meta["handler"] = sh[4:8].decode("latin-1")
                        scale, rate = struct.unpack("<II", sh[20:28])
                        meta["fps_num"], meta["fps_den"] = rate, max(scale, 1)
                sub += 8 + ssize + (ssize % 2)
        pos += 8 + size + (size % 2)


def _stream_no(ckid: bytes) -> int | None:
    """'00dc' -> 0; non-data chunk ids (rec lists, junk) -> None."""
    if ckid[2:4] not in (b"dc", b"db", b"wb"):
        return None
    try:
        return int(ckid[:2])
    except ValueError:
        return None


def _ranges_from_idx1(data: bytes, idx: bytes, movi_pos: int) -> dict:
    n = len(idx) // 16
    if n == 0:
        return {}
    # Base probe: spec-relative (movi fourcc) vs absolute file offsets.
    ckid0, _fl, off0, _sz = struct.unpack("<4sIII", idx[:16])
    base = movi_pos
    if data[movi_pos + off0:movi_pos + off0 + 4] != ckid0:
        if data[off0:off0 + 4] == ckid0:
            base = 0
        else:
            raise ValueError("idx1 offsets resolve to no chunk header "
                             "under either base convention")
    streams: dict[int, list[tuple[int, int]]] = {}
    for i in range(n):
        ckid, _flags, off, size = struct.unpack(
            "<4sIII", idx[16 * i:16 * i + 16])
        sno = _stream_no(ckid)
        if sno is None:
            continue
        start = base + off + 8
        if start + size > len(data):
            raise ValueError("idx1 entry exceeds payload")
        streams.setdefault(sno, []).append((start, start + size))
    return streams


def _ranges_from_movi(data: bytes, movi_pos: int, movi_end: int) -> dict:
    streams: dict[int, list[tuple[int, int]]] = {}
    pos = movi_pos + 4
    while pos + 8 <= movi_end:
        ckid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if pos + 8 + size > movi_end:
            raise ValueError("truncated movi chunk")
        if ckid == b"LIST":  # 'rec ' grouping: recurse into the list body
            sub = _ranges_from_movi(data, pos + 8, pos + 8 + size)
            for sno, rng in sub.items():
                streams.setdefault(sno, []).extend(rng)
        else:
            sno = _stream_no(ckid)
            if sno is not None:
                streams.setdefault(sno, []).append((pos + 8, pos + 8 + size))
        pos += 8 + size + (size % 2)
    return streams


def frame_ranges(data: bytes, stream: int = 0) -> list[tuple[int, int]]:
    """Byte ranges of stream ``stream``'s frames — the sampling hook."""
    return parse_avi(data)["streams"].get(stream, [])


class RangedAviReader:
    """Index-only AVI access over a seekable file object — the ranged-
    GET path: resolve frame byte ranges by reading ONLY the RIFF
    header, the hdrl region, the idx1 index at the tail, and one
    4-byte base probe; then fetch sampled frames by range. Tracks
    ``bytes_read`` so at-size runs can assert the IO fraction
    (``scale_stress_video``: a 3-of-N frame sample must touch a few
    percent of the file, exactly what a 1000-executor cluster pays
    against an object store)."""

    def __init__(self, f, file_size: int):
        self.f = f
        self.size = file_size
        self.bytes_read = 0

    def _read_at(self, pos: int, n: int) -> bytes:
        self.f.seek(pos)
        out = self.f.read(n)
        self.bytes_read += len(out)
        return out

    def frame_ranges(self, stream: int = 0) -> list[tuple[int, int]]:
        head = self._read_at(0, 12)
        if head[:4] != b"RIFF" or head[8:12] != b"AVI ":
            raise ValueError("not a RIFF/AVI stream")
        # walk top-level chunk headers (12 bytes each) until the movi
        # LIST: skips JUNK alignment padding and other non-movi chunks
        # (the classic VfW CD-ROM-aligned layout) without reading their
        # bodies
        pos = 12
        while True:
            mh = self._read_at(pos, 12)
            if len(mh) < 12:
                raise ValueError("AVI: no movi list before EOF")
            (size,) = struct.unpack("<I", mh[4:8])
            if mh[:4] == b"LIST" and mh[8:12] == b"movi":
                break
            pos += 8 + size + (size % 2)
        movi_pos = pos + 8
        (movi_size,) = struct.unpack("<I", mh[4:8])
        idx_at = movi_pos + movi_size + (movi_size % 2)
        while True:  # skip any padding between movi and idx1 too
            ih = self._read_at(idx_at, 8)
            if len(ih) < 8:
                raise ValueError("AVI: no idx1 after movi (ranged "
                                 "path needs the index)")
            if ih[:4] == b"idx1":
                break
            (skip,) = struct.unpack("<I", ih[4:8])
            idx_at += 8 + skip + (skip % 2)
        (idx_size,) = struct.unpack("<I", ih[4:8])
        idx = self._read_at(idx_at + 8, idx_size)
        # base probe: one 4-byte ranged read
        ckid0, _f, off0, _s = struct.unpack("<4sIII", idx[:16])
        base = movi_pos
        if self._read_at(movi_pos + off0, 4) != ckid0:
            if self._read_at(off0, 4) == ckid0:
                base = 0
            else:
                raise ValueError("idx1 offsets resolve under neither "
                                 "base convention")
        out = []
        for i in range(0, len(idx) - 15, 16):
            ckid, _flags, off, size = struct.unpack(
                "<4sIII", idx[i:i + 16])
            sno = _stream_no(ckid)
            if sno == stream:
                start = base + off + 8
                if start + size > self.size:
                    raise ValueError("idx1 entry exceeds file")
                out.append((start, start + size))
        return out

    def read_frame(self, rng: tuple[int, int]) -> bytes:
        return self._read_at(rng[0], rng[1] - rng[0])

"""ISO Base Media File Format (MP4) sample-table parsing + a minimal
spec-valid writer — pure Python over the PUBLIC ISO/IEC 14496-12 spec.

A multimodal corpus's video column is .mp4: frame extraction at scale is
NOT "decode the video", it is a byte-range lookup against the container's
sample tables — exactly the shape S3 ranged-GETs want. This module does
the real `moov/trak/mdia/minf/stbl` walk:

* box framing (§4.2): u32 size + fourcc; size==1 -> u64 largesize;
  size==0 -> box extends to end of file; FullBox version+flags,
* `stsd` sample description (codec fourcc + VisualSampleEntry w/h §12.1.3),
* `stts` decoding-time deltas (run-length (count, delta) pairs §8.6.1.2),
* `stsc` sample-to-chunk (run-length (first_chunk, samples_per_chunk)
  table whose runs extend to the next first_chunk §8.7.4),
* `stsz` sample sizes (constant or per-sample §8.7.3),
* `stco`/`co64` chunk offsets (32/64-bit file-absolute §8.7.5),
* `mdhd` timescale (version 0 and 1 layouts §8.4.2).

`sample_ranges` composes these into [(offset, size, dts)] per sample —
the only thing a frame sampler needs; codec payload decode stays with
the per-format codecs (PNG/JPEG real, H.264 honestly gated).

`encode_mp4` writes a minimal ftyp+mdat+moov file (moov after mdat so
chunk offsets never depend on moov's size) with a caller-controlled
chunk plan, so tests exercise multi-run stsc and forced co64 layouts.

Reference parity: gfw_pixetl has no video path (GDAL rasters only);
this extends the engine's multimodal family (SURVEY §2 LLM-pipeline
operators) the way `sources/jpeg.py` extends images.
"""

from __future__ import annotations

import struct

# container boxes whose payload is a sequence of child boxes
_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"dinf",
    b"mvex", b"moof", b"traf", b"udta",
}


def iter_boxes(buf: bytes, start: int = 0, end: int | None = None):
    """Yield (fourcc, body_start, body_end) for each box in
    buf[start:end], validating framing — truncated or undersized boxes
    raise ValueError instead of yielding garbage ranges."""
    end = len(buf) if end is None else end
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(
                f"truncated box header at {pos} (need 8, have {end - pos})")
        size, fourcc = struct.unpack(">I4s", buf[pos:pos + 8])
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError(f"truncated largesize box at {pos}")
            (size,) = struct.unpack(">Q", buf[pos + 8:pos + 16])
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < hdr:
            raise ValueError(f"box {fourcc!r} size {size} < header {hdr}")
        if pos + size > end:
            raise ValueError(
                f"box {fourcc!r} overruns scope: {pos}+{size} > {end}")
        yield fourcc, pos + hdr, pos + size
        pos += size


def find_boxes(buf: bytes, path: list[bytes], start: int = 0,
               end: int | None = None) -> list[tuple[int, int]]:
    """All (body_start, body_end) ranges matching the box path, walking
    container boxes recursively (e.g. [b'moov', b'trak'] -> one range
    per track)."""
    scopes = [(start, len(buf) if end is None else end)]
    for depth, want in enumerate(path):
        hits = []
        for s, e in scopes:
            for fourcc, bs, be in iter_boxes(buf, s, e):
                if fourcc == want:
                    hits.append((bs, be))
        scopes = hits
        if not scopes:
            return []
    return scopes


def _fullbox(buf: bytes, start: int) -> tuple[int, int]:
    """(version, body offset past version+flags)."""
    return buf[start], start + 4


def parse_stsd(buf: bytes, bs: int, be: int) -> list[dict]:
    """Sample descriptions: [{'format', 'width', 'height'}] — width and
    height from the VisualSampleEntry layout (§12.1.3: 8-byte SampleEntry
    prefix, then 16 bytes of pre_defined/reserved, then u16 w, u16 h)."""
    _v, p = _fullbox(buf, bs)
    (n,) = struct.unpack(">I", buf[p:p + 4])
    p += 4
    out = []
    for _ in range(n):
        if p + 8 > be:
            raise ValueError("truncated stsd entry")
        size, fmt = struct.unpack(">I4s", buf[p:p + 8])
        if size < 16 or p + size > be:
            raise ValueError("bad stsd entry size")
        entry = {"format": fmt.decode("latin-1"), "width": None,
                 "height": None, "extra": b""}
        if size >= 8 + 28:  # enough bytes for the visual w/h fields
            w, h = struct.unpack(">HH", buf[p + 32:p + 36])
            if w and h:
                entry["width"], entry["height"] = w, h
        if size > 8 + 78:
            # child boxes after the fixed VisualSampleEntry layout —
            # codec configuration records (avcC, hvcC, esds) live here
            entry["extra"] = buf[p + 8 + 78:p + size]
        out.append(entry)
        p += size
    return out


def parse_stts(buf: bytes, bs: int, be: int) -> list[tuple[int, int]]:
    _v, p = _fullbox(buf, bs)
    (n,) = struct.unpack(">I", buf[p:p + 4])
    p += 4
    if p + 8 * n > be:
        raise ValueError("truncated stts")
    return [struct.unpack(">II", buf[p + 8 * i:p + 8 * i + 8])
            for i in range(n)]


def parse_stsc(buf: bytes, bs: int, be: int) -> list[tuple[int, int, int]]:
    _v, p = _fullbox(buf, bs)
    (n,) = struct.unpack(">I", buf[p:p + 4])
    p += 4
    if p + 12 * n > be:
        raise ValueError("truncated stsc")
    entries = [struct.unpack(">III", buf[p + 12 * i:p + 12 * i + 12])
               for i in range(n)]
    # ISO 14496-12 8.7.4: first_chunk starts at 1 and is strictly
    # increasing; samples_per_chunk >= 1. A zero samples_per_chunk
    # would make the run expansion loop forever (take=0 never
    # decrements remaining) — malformed tables must raise, not hang.
    prev_first = 0
    for first, spc, _sdi in entries:
        if spc < 1:
            raise ValueError("stsc samples_per_chunk must be >= 1")
        if first <= prev_first:
            raise ValueError("stsc first_chunk must be strictly increasing")
        prev_first = first
    return entries


def parse_stsz(buf: bytes, bs: int, be: int) -> list[int]:
    _v, p = _fullbox(buf, bs)
    const_size, count = struct.unpack(">II", buf[p:p + 8])
    p += 8
    if const_size:
        return [const_size] * count
    if p + 4 * count > be:
        raise ValueError("truncated stsz")
    return list(struct.unpack(f">{count}I", buf[p:p + 4 * count]))


def parse_stco(buf: bytes, bs: int, be: int, wide: bool) -> list[int]:
    """stco (u32) or co64 (u64) chunk offsets, file-absolute."""
    _v, p = _fullbox(buf, bs)
    (n,) = struct.unpack(">I", buf[p:p + 4])
    p += 4
    width = 8 if wide else 4
    if p + width * n > be:
        raise ValueError("truncated chunk-offset table")
    fmt = ">%d%s" % (n, "Q" if wide else "I")
    return list(struct.unpack(fmt, buf[p:p + width * n]))


def parse_mdhd_timescale(buf: bytes, bs: int) -> int:
    """mdhd timescale: version 1 uses u64 creation/modification times
    (timescale at +20), version 0 u32 (timescale at +12)."""
    version, p = _fullbox(buf, bs)
    off = 16 if version == 1 else 8
    (ts,) = struct.unpack(">I", buf[p + off:p + off + 4])
    return ts


def _handler_type(buf: bytes, mdia_bs: int, mdia_be: int) -> bytes:
    for fourcc, bs, be in iter_boxes(buf, mdia_bs, mdia_be):
        if fourcc == b"hdlr":
            return buf[bs + 8:bs + 12]  # FullBox(4) + pre_defined(4)
    return b""


def sample_ranges(payload: bytes, handler: bytes = b"vide") -> dict:
    """The full sample-table walk for the first track whose hdlr matches
    ``handler``: returns {'format', 'width', 'height', 'timescale',
    'samples': [(offset, size, dts)]} with one entry per sample.

    Offsets come from stco/co64 + the running sum of same-chunk sample
    sizes; dts from the stts run-length expansion. This is exactly the
    index a ranged-GET frame sampler needs — O(frames picked) bytes read
    from a container of any size.
    """
    if payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (no ftyp)")
    for trak_bs, trak_be in find_boxes(payload, [b"moov", b"trak"]):
        mdia = find_boxes(payload, [b"mdia"], trak_bs, trak_be)
        if not mdia:
            continue
        mdia_bs, mdia_be = mdia[0]
        if _handler_type(payload, mdia_bs, mdia_be) != handler:
            continue
        stbl = find_boxes(payload, [b"minf", b"stbl"], mdia_bs, mdia_be)
        if not stbl:
            continue
        stbl_bs, stbl_be = stbl[0]
        boxes = {f: (bs, be)
                 for f, bs, be in iter_boxes(payload, stbl_bs, stbl_be)}
        for need in (b"stsd", b"stts", b"stsc", b"stsz"):
            if need not in boxes:
                raise ValueError(f"stbl missing {need!r}")
        if b"stco" in boxes:
            chunk_offs = parse_stco(payload, *boxes[b"stco"], wide=False)
        elif b"co64" in boxes:
            chunk_offs = parse_stco(payload, *boxes[b"co64"], wide=True)
        else:
            raise ValueError("stbl missing stco/co64")
        descs = parse_stsd(payload, *boxes[b"stsd"])
        sizes = parse_stsz(payload, *boxes[b"stsz"])
        stsc = parse_stsc(payload, *boxes[b"stsc"])
        stts = parse_stts(payload, *boxes[b"stts"])

        # expand stsc: run r covers chunks [first_chunk_r, first_chunk_{r+1})
        per_chunk: list[int] = []
        remaining = len(sizes)
        for r, (first, spc, _sdi) in enumerate(stsc):
            last = stsc[r + 1][0] if r + 1 < len(stsc) else None
            c = first
            while remaining > 0 and (last is None or c < last):
                take = min(spc, remaining)
                per_chunk.append(take)
                remaining -= take
                c += 1
            if remaining == 0:
                break
        if remaining:
            raise ValueError(
                f"stsc covers too few samples ({remaining} unassigned)")

        # expand stts into per-sample dts
        dts, t = [], 0
        for count, delta in stts:
            for _ in range(count):
                dts.append(t)
                t += delta
        if len(dts) < len(sizes):
            raise ValueError("stts covers fewer samples than stsz")

        samples, si = [], 0
        for ci, nsamp in enumerate(per_chunk):
            if ci >= len(chunk_offs):
                raise ValueError("more chunks than chunk offsets")
            off = chunk_offs[ci]
            for _ in range(nsamp):
                samples.append((off, sizes[si], dts[si]))
                off += sizes[si]
                si += 1

        ts = 0
        for f, bs, _be in iter_boxes(payload, mdia_bs, mdia_be):
            if f == b"mdhd":
                ts = parse_mdhd_timescale(payload, bs)
        d0 = descs[0] if descs else {"format": "", "width": None,
                                     "height": None, "extra": b""}
        sync = None
        if b"stss" in boxes:
            sbs, sbe = boxes[b"stss"]
            _v, p = _fullbox(payload, sbs)
            (ns,) = struct.unpack(">I", payload[p:p + 4])
            if p + 4 + 4 * ns > sbe:
                raise ValueError("truncated stss")
            sync = list(struct.unpack(f">{ns}I",
                                      payload[p + 4:p + 4 + 4 * ns]))
        return {"format": d0["format"], "width": d0["width"],
                "height": d0["height"], "timescale": ts,
                "samples": samples, "entry_extra": d0.get("extra", b""),
                "sync_samples": sync}
    raise ValueError(f"no {handler!r} track found")


# ---------------------------------------------------------------------------
# Writer: minimal spec-valid single-track file. moov AFTER mdat, so
# chunk offsets are known before moov is sized (the standard non-
# faststart layout); chunk_plan controls stsc shape; force_co64 writes
# the 64-bit offset table regardless of magnitude.
# ---------------------------------------------------------------------------

def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), fourcc) + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version,
                                    flags.to_bytes(3, "big")) + body)


def _rle_chunks(chunk_plan: list[int]) -> list[tuple[int, int, int]]:
    """chunk_plan [n0, n1, ...] -> compact stsc runs
    (first_chunk, samples_per_chunk, sample_description_index)."""
    runs = []
    for i, n in enumerate(chunk_plan):
        if not runs or runs[-1][1] != n:
            runs.append((i + 1, n, 1))
    return runs


def _build_stbl(fourcc: str, handler: bytes, sizes: list[int],
                chunk_plan: list[int], chunk_offs: list[int],
                sample_delta: int, width: int, height: int,
                force_co64: bool, sample_rate: int,
                entry_extra: bytes = b"",
                sync_samples: list[int] | None = None) -> bytes:
    n = len(sizes)
    if handler == b"vide":
        entry = (
            b"\x00" * 6 + struct.pack(">H", 1)          # SampleEntry
            + struct.pack(">HH", 0, 0) + b"\x00" * 12   # pre_defined/resv
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + struct.pack(">I", 0) + struct.pack(">H", 1)
            + b"\x00" * 32                               # compressorname
            + struct.pack(">Hh", 24, -1)                 # depth, pre_def
            + entry_extra                  # codec config boxes (avcC...)
        )
    else:  # AudioSampleEntry (§12.2.3): mono 16-bit PCM description
        entry = (
            b"\x00" * 6 + struct.pack(">H", 1)           # SampleEntry
            + b"\x00" * 8                                # reserved[2] u32
            + struct.pack(">HHHH", 1, 16, 0, 0)          # ch, bits, pre, r
            + struct.pack(">I", sample_rate << 16)       # rate, 16.16
        )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1)
                 + _box(fourcc.encode("latin-1"), entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, sample_delta))
    runs = _rle_chunks(chunk_plan)
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(runs))
                 + b"".join(struct.pack(">III", *r) for r in runs))
    const = sizes[0] if len(set(sizes)) == 1 else 0
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", const, n)
                 + (b"" if const else struct.pack(f">{n}I", *sizes)))
    if force_co64 or (chunk_offs and max(chunk_offs) > 0xFFFFFFFF):
        co = _full(b"co64", 0, 0, struct.pack(">I", len(chunk_offs))
                   + struct.pack(f">{len(chunk_offs)}Q", *chunk_offs))
    else:
        co = _full(b"stco", 0, 0, struct.pack(">I", len(chunk_offs))
                   + struct.pack(f">{len(chunk_offs)}I", *chunk_offs))
    stss = b""
    if sync_samples is not None:
        # sync-sample box (§8.6.2): 1-based sample numbers of keyframes;
        # absence of the box means every sample is sync
        stss = _full(b"stss", 0, 0, struct.pack(">I", len(sync_samples))
                     + struct.pack(f">{len(sync_samples)}I",
                                   *sync_samples))
    return _box(b"stbl", stsd + stts + stsc + stsz + co + stss)


_MATRIX = struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0,
                      0, 0, 0x40000000)


def _build_trak(track_id: int, handler: bytes, fourcc: str,
                sizes: list[int], chunk_plan: list[int],
                chunk_offs: list[int], timescale: int, sample_delta: int,
                width: int, height: int, force_co64: bool,
                sample_rate: int, entry_extra: bytes = b"",
                sync_samples: list[int] | None = None) -> bytes:
    n = len(sizes)
    duration = n * sample_delta
    stbl = _build_stbl(fourcc, handler, sizes, chunk_plan, chunk_offs,
                       sample_delta, width, height, force_co64,
                       sample_rate, entry_extra, sync_samples)
    if handler == b"vide":
        mhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        name = b"VideoHandler\x00"
    else:
        mhd = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
        name = b"SoundHandler\x00"
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                 + _full(b"url ", 0, 1, b""))  # self-contained
    minf = _box(b"minf", mhd + _box(b"dinf", dref) + stbl)
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0))  # lang 'und'
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + handler
                 + b"\x00" * 12 + name)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, track_id, 0, duration) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0x0100 if handler == b"soun" else 0,
                      0) + _MATRIX
        + struct.pack(">II", width << 16, height << 16))
    return _box(b"trak", tkhd + mdia)


def encode_mp4_tracks(tracks: list[dict],
                      force_co64: bool = False) -> bytes:
    """Write a multi-track ISO-BMFF file. Each track dict:
    {'samples': [bytes], 'handler': b'vide'|b'soun', 'fourcc': str,
     'timescale': int, 'sample_delta': int, 'chunk_plan': [int] | None,
     'width'/'height' (visual), 'sample_rate' (audio)}.
    mdat carries each track's samples contiguously in track order;
    every sample table is written per the public spec, so
    ``sample_ranges(payload, handler)`` round-trips each track.
    """
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                + b"isom" + b"iso2")
    mdat_body = b"".join(s for t in tracks for s in t["samples"])
    mdat = _box(b"mdat", mdat_body)

    base = len(ftyp) + 8
    traks = []
    max_dur = 0
    mv_timescale = tracks[0].get("timescale", 1000) if tracks else 1000
    for ti, t in enumerate(tracks):
        samples = t["samples"]
        sizes = [len(s) for s in samples]
        plan = t.get("chunk_plan") or [len(samples)]
        if sum(plan) != len(samples):
            raise ValueError("chunk_plan must cover every sample")
        chunk_offs, si = [], 0
        for nsamp in plan:
            chunk_offs.append(base + sum(sizes[:si]))
            si += nsamp
        base += sum(sizes)
        delta = t.get("sample_delta", 40)
        traks.append(_build_trak(
            ti + 1, t.get("handler", b"vide"), t.get("fourcc", "png "),
            sizes, plan, chunk_offs, t.get("timescale", 1000), delta,
            t.get("width", 0), t.get("height", 0), force_co64,
            t.get("sample_rate", 8000), t.get("entry_extra", b""),
            t.get("sync_samples")))
        max_dur = max(max_dur, len(samples) * delta)

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, mv_timescale, max_dur)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0) + b"\x00" * 8
        + _MATRIX + b"\x00" * 24 + struct.pack(">I", len(tracks) + 1))
    moov = _box(b"moov", mvhd + b"".join(traks))
    return ftyp + mdat + moov


def encode_mp4(
    frames: list[bytes],
    fourcc: str = "png ",
    width: int = 0,
    height: int = 0,
    timescale: int = 1000,
    sample_delta: int = 40,
    chunk_plan: list[int] | None = None,
    force_co64: bool = False,
) -> bytes:
    """Write frames as one video track of a minimal ISO-BMFF file.

    ``chunk_plan`` groups samples into chunks (default: one chunk);
    ``force_co64`` emits the 64-bit chunk-offset box. Every table the
    parser reads (stsd/stts/stsc/stsz/stco|co64, mdhd, hdlr) is written
    per the public spec, so encode->sample_ranges round-trips exactly.
    """
    return encode_mp4_tracks([{
        "samples": list(frames), "handler": b"vide", "fourcc": fourcc,
        "timescale": timescale, "sample_delta": sample_delta,
        "chunk_plan": chunk_plan, "width": width, "height": height,
    }], force_co64=force_co64)


def extract_samples(payload: bytes, indices: list[int],
                    handler: bytes = b"vide") -> list[tuple[int, bytes]]:
    """(sample_index, bytes) for each requested sample, slicing via the
    sample table — O(requested) bytes touched, never a full decode."""
    tab = sample_ranges(payload, handler)
    out = []
    for i in indices:
        if i >= len(tab["samples"]):
            continue
        off, size, _dts = tab["samples"][i]
        if off + size > len(payload):
            raise ValueError(f"sample {i} range beyond file end")
        out.append((i, payload[off:off + size]))
    return out

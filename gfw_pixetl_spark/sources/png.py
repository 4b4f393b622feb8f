"""Pure-Python PNG codec — the image-decode leaf of the multimodal
family, real instead of stubbed (same move as the GeoTIFF codec in
``sources/geotiff.py``: the container format is public, so implement it
from the spec rather than gating on PIL).

Scope: the PNG core from the W3C spec (RFC 2083 / ISO 15948) that a
training-data pipeline actually hits — 8/16-bit grayscale, gray+alpha,
RGB, RGBA, all five scanline filters (None/Sub/Up/Average/Paeth),
single IDAT-or-split streams, CRC-validated chunks. Interlacing
(Adam7) and palette images are rejected with a clear error; JPEG and
friends remain codec-gated in ``functions/multimodal.py``.

Kernels call these per payload inside Arrow-batched ``mapInPandas`` —
decode cost parallelizes with the rows, nothing here touches Spark.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> channels
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def _chunk(tag: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(tag + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)


def encode_png(
    arr: np.ndarray, *, filter_type: int = 1, level: int = 6
) -> bytes:
    """Encode (h, w) or (h, w, channels) uint8/uint16 to PNG bytes.

    ``filter_type`` applies one filter to every scanline (0=None 1=Sub
    2=Up 3=Average 4=Paeth) — exercising real filter paths on decode.
    """
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")
    if arr.dtype == np.uint8:
        depth = 8
    elif arr.dtype == np.uint16:
        depth = 16
    else:
        raise ValueError(f"unsupported dtype {arr.dtype} (uint8/uint16)")
    bpp = ch * depth // 8  # bytes per pixel
    raw_rows = arr.astype(">u2" if depth == 16 else "u1").tobytes()
    stride = w * bpp
    rows = [raw_rows[r * stride:(r + 1) * stride] for r in range(h)]

    out = bytearray()
    prev = bytes(stride)
    for row in rows:
        cur = np.frombuffer(row, dtype=np.uint8).astype(np.int16)
        up = np.frombuffer(prev, dtype=np.uint8).astype(np.int16)
        left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.int16), up[:-bpp]])
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = cur - left
        elif filter_type == 2:
            enc = cur - up
        elif filter_type == 3:
            enc = cur - (left + up) // 2
        elif filter_type == 4:
            p = left + up - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, up, ul))
            enc = cur - pred
        else:
            raise ValueError(f"bad filter {filter_type}")
        out.append(filter_type)
        out.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = row

    ihdr = struct.pack(">IIBBBBB", w, h, depth, _COLOR_TYPE[ch], 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(out), level))
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to (h, w, channels) uint8/uint16."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = depth = ctype = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if interlace:
                raise ValueError("Adam7 interlace not supported")
            if ctype == 3:
                raise ValueError("palette PNG not supported")
            if comp or filt:
                raise ValueError("non-standard compression/filter method")
            if depth not in (8, 16):
                raise ValueError(f"bit depth {depth} not supported")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[ctype]
    bpp = ch * depth // 8
    stride = width * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length mismatch")

    out = np.empty(height * stride, dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for r in range(height):
        ft = raw[r * (stride + 1)]
        cur = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=r * (stride + 1) + 1).astype(np.int16)
        if ft == 0:
            rec = cur
        elif ft == 1:
            rec = cur.copy()
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
        elif ft == 2:
            rec = (cur + prev) & 0xFF
        elif ft == 3:
            rec = cur.copy()
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + (left + prev[i]) // 2) & 0xFF
        elif ft == 4:
            rec = cur.copy()
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (
                    b if pb <= pc else c)
                rec[i] = (rec[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter byte {ft}")
        out[r * stride:(r + 1) * stride] = rec.astype(np.uint8)
        prev = rec
    if depth == 16:
        img = out.view(">u2").astype(np.uint16).reshape(height, width, ch)
    else:
        img = out.reshape(height, width, ch)
    return img

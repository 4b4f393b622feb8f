"""Pure-Python GeoTIFF / Cloud-Optimized GeoTIFF codec (S4 read leaf +
S8 write leaf, SURVEY §2.1) — no rasterio/GDAL required.

The reference writes tiled DEFLATE GeoTIFFs through rasterio
(``gfw_pixetl/tiles/utils/window_utils.py:20-59``, profile
``gfw_pixetl/tiles/tile.py:54-97``) and reads windows from COGs over HTTP
range requests. This module re-implements the *container format* itself
from the public TIFF 6.0 / BigTIFF / GeoTIFF 1.1 specifications so the
engine's tile sink emits real ``.tif`` files and the window reader does
true partial reads (it decompresses only the tiles intersecting the
requested window — the property that makes COG reads cheap at 100 TB).

Scope (documented deltas from GDAL):
* Writer: classic little-endian TIFF, auto-switching to BigTIFF
  (magic 43, 8-byte offsets) when the payload approaches the classic
  4 GiB offset bound (or on request) — a 40000² multiband float tile
  needs it; tiled layout, DEFLATE (zlib) / LZW /
  PackBits / uncompressed, optional predictor=2 (horizontal
  differencing), planar configuration SEPARATE for multiband,
  nearest/average overviews in COG IFD order (full-res IFD first, every
  IFD before any tile payload), sub-byte NBITS bit-packing (1-7 bits,
  rows byte-aligned MSB-first like GDAL's NBITS option).
* Reader: classic + BigTIFF, little/big endian, tiled or stripped,
  DEFLATE/LZW/PackBits/none, predictor 1/2, planar 1/2, sub-byte
  BitsPerSample, windowed + boundless reads.

The byte layout follows the public specs only; no GDAL code consulted.
"""

from __future__ import annotations

import io
import os
import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

# --- TIFF tag ids -----------------------------------------------------------
T_NEW_SUBFILE_TYPE = 254
T_IMAGE_WIDTH = 256
T_IMAGE_LENGTH = 257
T_BITS_PER_SAMPLE = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_STRIP_OFFSETS = 273
T_SAMPLES_PER_PIXEL = 277
T_ROWS_PER_STRIP = 278
T_STRIP_BYTE_COUNTS = 279
T_PLANAR_CONFIG = 284
T_PREDICTOR = 317
T_TILE_WIDTH = 322
T_TILE_LENGTH = 323
T_TILE_OFFSETS = 324
T_TILE_BYTE_COUNTS = 325
T_COLOR_MAP = 320
T_SAMPLE_FORMAT = 339
T_MODEL_PIXEL_SCALE = 33550
T_MODEL_TIEPOINT = 33922
T_GEO_KEY_DIRECTORY = 34735
T_GDAL_METADATA = 42112
T_GDAL_NODATA = 42113

# field types
FT_BYTE, FT_ASCII, FT_SHORT, FT_LONG, FT_RATIONAL = 1, 2, 3, 4, 5
FT_SBYTE, FT_UNDEF, FT_SSHORT, FT_SLONG, FT_SRATIONAL = 6, 7, 8, 9, 10
FT_FLOAT, FT_DOUBLE, FT_LONG8, FT_SLONG8, FT_IFD8 = 11, 12, 16, 17, 18

_FT_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
            10: 8, 11: 4, 12: 8, 16: 8, 17: 8, 18: 8}
_FT_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
           12: "d", 16: "Q", 17: "q", 18: "Q"}

COMPRESS_NONE = 1
COMPRESS_CCITTFAX4 = 4  # ITU-T T.6 (Group 4 MMR), 1-bit only
COMPRESS_LZW = 5
COMPRESS_DEFLATE = 8  # Adobe deflate (zlib); code 32946 read as alias
COMPRESS_PACKBITS = 32773


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first codes, ClearCode 256,
    EOI 257, 9->12 bit widths with the early-change increment."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf, nbits = 0, 0

    def emit(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((bitbuf >> nbits) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(CLEAR, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # early change: widen one code early (TIFF quirk)
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    width = 9
    bitbuf, nbits = 0, 0
    pos = 0
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (bitbuf >> nbits) & ((1 << width) - 1)
        if code == EOI:
            return bytes(out)
        if code == CLEAR:
            reset()
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        out.extend(entry)
        prev = entry
        # the decoder's table lags the encoder by one entry, so with the
        # TIFF early-change rule it widens at 2^w - 2 (one before the
        # encoder's 2^w - 1)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1


def _packbits_encode(data: bytes) -> bytes:
    """PackBits RLE (TIFF 6.0 §9): runs >=3 as (257-n, byte), literals
    in chunks of <=128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run & 0xFF)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out.append(i - lit_start - 1)
        out.extend(data[lit_start:i])
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:
            out.extend(data[i:i + h + 1])
            i += h + 1
        elif h > 128:
            out.extend(bytes([data[i]]) * (257 - h))
            i += 1
        # h == 128: no-op per spec
    return bytes(out)

_PHOTOMETRIC = {"MINISWHITE": 0, "MINISBLACK": 1, "RGB": 2, "PALETTE": 3}
_PHOTOMETRIC_INV = {v: k for k, v in _PHOTOMETRIC.items()}

# numpy dtype -> (bits, sample_format)
_DTYPE_TO_TIFF = {
    "uint8": (8, 1), "int8": (8, 2), "uint16": (16, 1), "int16": (16, 2),
    "uint32": (32, 1), "int32": (32, 2), "uint64": (64, 1),
    "int64": (64, 2), "float16": (16, 3), "float32": (32, 3),
    "float64": (64, 3),
}
_TIFF_TO_DTYPE = {(b, f): d for d, (b, f) in _DTYPE_TO_TIFF.items()}

# EPSG codes the grid catalog emits (grids/__init__.py): geographic 4326,
# projected web-mercator 3857, plus analytic UTM zones (functions/warp.py).
_GEOGRAPHIC_EPSG = {4326}


def _epsg_of(crs: str | int) -> int:
    if isinstance(crs, int):
        return crs
    s = str(crs).upper().replace("EPSG:", "").strip()
    return int(s)


def _geokeys(epsg: int) -> list[int]:
    """GeoKeyDirectory (GeoTIFF 1.1 §7.1): version header + sorted keys."""
    if epsg in _GEOGRAPHIC_EPSG:
        keys = [(1024, 0, 1, 2), (1025, 0, 1, 1), (2048, 0, 1, epsg)]
    else:
        keys = [(1024, 0, 1, 1), (1025, 0, 1, 1), (3072, 0, 1, epsg)]
    out = [1, 1, 0, len(keys)]
    for k in keys:
        out.extend(k)
    return out


def _predict2_encode(tile: np.ndarray) -> np.ndarray:
    out = tile.copy()
    # horizontal differencing per row (TIFF 6.0 §14) in wraparound
    # integer arithmetic
    out[:, 1:] = (tile[:, 1:].astype(np.int64)
                  - tile[:, :-1].astype(np.int64)).astype(tile.dtype)
    return out


def _pack_rows(tile: np.ndarray, nbits: int) -> bytes:
    """Bit-pack a uint8 tile at nbits/sample, each row padded to a byte
    boundary MSB-first (TIFF 6.0 §"Compression", baseline packing)."""
    rows, cols = tile.shape
    shifts = np.arange(nbits - 1, -1, -1)
    bits = ((tile[:, :, None] >> shifts) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(rows, cols * nbits), axis=1).tobytes()


def _unpack_rows(raw: bytes, rows: int, cols: int, nbits: int) -> np.ndarray:
    stride = (cols * nbits + 7) // 8
    arr = np.frombuffer(raw, dtype=np.uint8, count=rows * stride)
    bits = np.unpackbits(arr.reshape(rows, stride), axis=1)[:, :cols * nbits]
    groups = bits.reshape(rows, cols, nbits)
    weights = (1 << np.arange(nbits - 1, -1, -1)).astype(np.uint8)
    return (groups * weights).sum(axis=2).astype(np.uint8)


def _predict2_decode(tile: np.ndarray) -> np.ndarray:
    # cumulative sum per row undoes the differencing; accumulating IN
    # the sample dtype wraps modulo 2**bits natively, which is exactly
    # the inverse of the wraparound subtraction — and works for 64-bit
    # samples where an int64 accumulator would overflow
    return np.add.accumulate(tile, axis=1, dtype=tile.dtype)


@dataclass
class _IFDPlan:
    """One image (full-res or overview) scheduled for writing."""

    arrays: list[np.ndarray]  # per band, (rows, cols)
    subfile_type: int
    tiles: list[bytes] = field(default_factory=list)  # band-major order


def _downsample(band: np.ndarray, method: str, nodata) -> np.ndarray:
    rows, cols = band.shape
    r2, c2 = (rows + 1) // 2, (cols + 1) // 2
    if method == "nearest":
        return band[::2, ::2]
    # nodata-aware 2x2 block average, computed in row stripes so the
    # float64 working set stays bounded on production-size (40000^2)
    # tiles instead of a whole-band float64 copy
    out = np.empty((r2, c2), dtype=band.dtype)
    stripe = 2048  # source rows per pass (even)
    fill = 0.0 if nodata is None else nodata
    nodata_is_nan = isinstance(nodata, float) and np.isnan(nodata)
    for s0 in range(0, rows, stripe):
        s1 = min(s0 + stripe, rows)
        sr2 = (s1 - s0 + 1) // 2
        pr = sr2 * 2 - (s1 - s0)
        pc = c2 * 2 - cols
        pad = np.pad(band[s0:s1].astype("float64"),
                     ((0, pr), (0, pc)), mode="edge")
        blocks = pad.reshape(sr2, 2, c2, 2)
        if nodata is None or nodata_is_nan:
            valid = ~np.isnan(blocks) if band.dtype.kind == "f" \
                else np.ones_like(blocks, dtype=bool)
        else:
            valid = blocks != nodata
        cnt = valid.sum(axis=(1, 3))
        tot = np.where(valid, blocks, 0.0).sum(axis=(1, 3))
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = tot / np.maximum(cnt, 1)
        res = np.where(cnt > 0, mean, fill)
        if band.dtype.kind in "ui":
            res = np.rint(res)
        out[s0 // 2:s0 // 2 + sr2] = res.astype(band.dtype)
    return out


def write_cog(
    path: str,
    data: np.ndarray,
    *,
    transform: tuple[float, float, float, float],
    crs: str | int = "EPSG:4326",
    nodata: float | int | None = None,
    blockxsize: int = 256,
    blockysize: int | None = None,
    compress: str = "DEFLATE",
    predictor: int = 1,
    photometric: str | None = None,
    overviews: bool = True,
    overview_resampling: str = "nearest",
    nbits: int | None = None,
    metadata: dict[str, str] | None = None,
    zlevel: int = 6,
    bigtiff: bool | None = None,
    colormap: dict[int, tuple[int, int, int]] | None = None,
) -> dict:
    """Write ``data`` (bands, rows, cols) as a tiled (CO)GeoTIFF.

    ``transform`` is ``(origin_x, xres, origin_y, yres)`` with yres > 0
    meaning north-up rows (matches the engine's grid model). Returns the
    written profile dict (same shape the npz sink used, so callers and
    the manifest are unchanged). COG layout: every IFD + tag payload is
    written before the first tile byte, full-res IFD first.

    Compression: DEFLATE / LZW / PACKBITS / NONE for any dtype, plus
    CCITTFAX4 (ITU-T T.6 Group-4 fax, ``sources/ccitt.py``) for
    NBITS=1 boolean layers — the scheme the reference's data-type table
    assigns to boolean (``gfw_pixetl/data_type.py:122-124``).
    Unrecognized names fall back to NONE and the profile reports what
    was actually written.
    """
    if data.ndim == 2:
        data = data[None, ...]
    bands, rows, cols = data.shape
    dt = str(data.dtype)
    if dt == "bool":
        data = data.astype("uint8")
        dt = "uint8"
    if dt not in _DTYPE_TO_TIFF:
        raise ValueError(f"unsupported dtype for GeoTIFF: {dt}")
    bits, sfmt = _DTYPE_TO_TIFF[dt]
    # sub-byte NBITS (1-7): store bit-packed like GDAL's NBITS creation
    # option (BitsPerSample = nbits, rows byte-aligned, MSB-first)
    pack_bits = None
    if nbits is not None and 1 <= nbits <= 7:
        if dt != "uint8":
            raise ValueError("NBITS 1-7 requires uint8 data")
        if predictor == 2:
            raise ValueError("predictor=2 is incompatible with NBITS<8")
        if int(data.max(initial=0)) >= (1 << nbits):
            raise ValueError(
                f"data exceeds NBITS={nbits} range (max {(1 << nbits) - 1})")
        pack_bits = nbits
        bits = nbits
    blockysize = blockysize or blockxsize
    # TIFF 6.0 requires tile dims % 16 == 0; round small/odd requests up
    # (edge padding already handles partial tiles)
    blockxsize = max(16, -(-blockxsize // 16) * 16)
    blockysize = max(16, -(-blockysize // 16) * 16)
    comp_code = {
        "DEFLATE": COMPRESS_DEFLATE, "LZW": COMPRESS_LZW,
        "PACKBITS": COMPRESS_PACKBITS, "CCITTFAX4": COMPRESS_CCITTFAX4,
    }.get(compress.upper(), COMPRESS_NONE)
    if comp_code == COMPRESS_CCITTFAX4:
        if pack_bits != 1 or bands != 1:
            raise ValueError(
                "CCITTFAX4 requires NBITS=1 single-band data "
                "(reference gfw_pixetl/data_type.py:122-124)")
    if predictor == 2 and data.dtype.kind == "f":
        raise ValueError("predictor=2 is integer-only (use 1 for floats)")
    ox, sx, oy, sy = transform
    epsg = _epsg_of(crs)

    phot = _PHOTOMETRIC.get(photometric.upper(), 1) if photometric else (
        _PHOTOMETRIC["RGB"] if bands == 3 and dt == "uint8"
        else _PHOTOMETRIC["MINISBLACK"])
    if colormap is not None:
        # paletted output (TIFF 6.0 §ColorMap, tag 320): the symbology
        # rendering the reference DECLARES (models/pydantic.py:20-33,
        # symbology.colormap) but never writes; 8-bit single band,
        # 16-bit palette channels via the v*257 = v<<8|v convention
        if bands != 1 or dt != "uint8":
            raise ValueError("colormap requires single-band uint8 data")
        bad = [k for k in colormap
               if not 0 <= int(k) < (1 << bits)]
        if bad:
            raise ValueError(f"colormap keys out of range: {bad[:5]}")
        phot = _PHOTOMETRIC["PALETTE"]
    elif photometric and phot == _PHOTOMETRIC["PALETTE"]:
        raise ValueError("photometric=PALETTE requires a colormap")

    # -- build pyramid ------------------------------------------------------
    plans = [_IFDPlan([data[b] for b in range(bands)], 0)]
    if overviews:
        cur = plans[0].arrays
        while max(cur[0].shape) > max(blockxsize, blockysize):
            cur = [_downsample(a, overview_resampling, nodata) for a in cur]
            plans.append(_IFDPlan(cur, 1))
            if max(cur[0].shape) <= 1:
                break

    # -- compress tiles -----------------------------------------------------
    for plan in plans:
        h, w = plan.arrays[0].shape
        tr, tc = -(-h // blockysize), -(-w // blockxsize)
        for band_arr in plan.arrays:  # planar SEPARATE: band-major
            for ti in range(tr):
                for tj in range(tc):
                    tile = np.zeros((blockysize, blockxsize),
                                    dtype=band_arr.dtype)
                    sub = band_arr[ti * blockysize:(ti + 1) * blockysize,
                                   tj * blockxsize:(tj + 1) * blockxsize]
                    tile[:sub.shape[0], :sub.shape[1]] = sub
                    if predictor == 2:
                        tile = _predict2_encode(tile)
                    if comp_code == COMPRESS_CCITTFAX4:
                        from .ccitt import g4_encode

                        # fax codes black runs; sample->black depends on
                        # the photometric (MINISWHITE: 1 = black)
                        raw = g4_encode(
                            (tile != 0) if phot == 0 else (tile == 0))
                        plan.tiles.append(raw)
                        continue
                    if pack_bits is not None:
                        raw = _pack_rows(tile, pack_bits)
                    else:
                        raw = tile.astype(
                            tile.dtype.newbyteorder("<")).tobytes()
                    if comp_code == COMPRESS_DEFLATE:
                        raw = zlib.compress(raw, zlevel)
                    elif comp_code == COMPRESS_LZW:
                        raw = _lzw_encode(raw)
                    elif comp_code == COMPRESS_PACKBITS:
                        raw = _packbits_encode(raw)
                    plan.tiles.append(raw)

    # -- serialize ----------------------------------------------------------
    # Entries per IFD; values > 4 bytes go to an external block placed
    # right after its IFD. Two passes: size everything, then emit.
    def build_entries(plan: _IFDPlan, tile_offsets: list[int]):
        h, w = plan.arrays[0].shape
        ent = [
            (T_NEW_SUBFILE_TYPE, FT_LONG, [plan.subfile_type]),
            (T_IMAGE_WIDTH, FT_LONG, [w]),
            (T_IMAGE_LENGTH, FT_LONG, [h]),
            (T_BITS_PER_SAMPLE, FT_SHORT, [bits] * bands),
            (T_COMPRESSION, FT_SHORT, [comp_code]),
            (T_PHOTOMETRIC, FT_SHORT, [phot]),
            (T_SAMPLES_PER_PIXEL, FT_SHORT, [bands]),
            (T_PLANAR_CONFIG, FT_SHORT, [2 if bands > 1 else 1]),
            (T_PREDICTOR, FT_SHORT, [predictor]),
            (T_TILE_WIDTH, FT_SHORT, [blockxsize]),
            (T_TILE_LENGTH, FT_SHORT, [blockysize]),
            (T_TILE_OFFSETS, off_ftype, tile_offsets),
            (T_TILE_BYTE_COUNTS, FT_LONG, [len(t) for t in plan.tiles]),
            (T_SAMPLE_FORMAT, FT_SHORT, [sfmt] * bands),
        ]
        if colormap is not None:
            n_pal = 1 << bits
            pal = [0] * (3 * n_pal)
            for k, (r, g, b) in colormap.items():
                pal[int(k)] = int(r) * 257
                pal[n_pal + int(k)] = int(g) * 257
                pal[2 * n_pal + int(k)] = int(b) * 257
            ent.append((T_COLOR_MAP, FT_SHORT, pal))
        if plan.subfile_type == 0:  # geo tags on the full-res IFD
            ent.append((T_MODEL_PIXEL_SCALE, FT_DOUBLE, [sx, abs(sy), 0.0]))
            ent.append((T_MODEL_TIEPOINT, FT_DOUBLE,
                        [0.0, 0.0, 0.0, ox, oy, 0.0]))
            ent.append((T_GEO_KEY_DIRECTORY, FT_SHORT, _geokeys(epsg)))
            items = dict(metadata or {})
            if nbits is not None:
                items["NBITS"] = str(nbits)
            if items:
                from xml.sax.saxutils import escape, quoteattr

                body = "".join(
                    f"  <Item name={quoteattr(str(k))}>"
                    f"{escape(str(v))}</Item>\n"
                    for k, v in sorted(items.items()))
                xml = f"<GDALMetadata>\n{body}</GDALMetadata>\n\x00"
                ent.append((T_GDAL_METADATA, FT_ASCII, xml))
            if nodata is not None:
                ent.append((T_GDAL_NODATA, FT_ASCII, f"{nodata}\x00"))
        ent.sort(key=lambda e: e[0])
        return ent

    # classic vs BigTIFF: auto-switch when the payload approaches the
    # 4 GiB classic offset bound (a 40000^2 multiband float tile can),
    # or honor an explicit request
    payload_bytes = sum(
        (len(t) + 1) // 2 * 2 for plan in plans for t in plan.tiles)
    big = bigtiff if bigtiff is not None else (
        payload_bytes > (1 << 32) - (1 << 25))
    off_ftype = FT_LONG8 if big else FT_LONG
    inline = 8 if big else 4
    entry_sz = 20 if big else 12
    cnt_sz, nxt_sz = (8, 8) if big else (2, 4)
    hdr = 16 if big else 8
    off_fmt = "Q" if big else "I"
    cnt_fmt = "Q" if big else "H"

    def entry_extra(ftype: int, values) -> int:
        n = len(values)
        sz = _FT_SIZE[ftype] * n
        return (sz + 1) // 2 * 2 if sz > inline else 0

    # sizing pass (tile offsets unknown but their count is)
    pos = hdr
    ifd_pos, extra_pos = [], []
    for plan in plans:
        ent = build_entries(plan, [0] * len(plan.tiles))
        ifd_sz = cnt_sz + entry_sz * len(ent) + nxt_sz
        ifd_pos.append(pos)
        extra_pos.append(pos + ifd_sz)
        pos += ifd_sz + sum(entry_extra(ft, v) for _, ft, v in ent)
    data_start = (pos + 1) // 2 * 2

    # assign tile offsets sequentially after the metadata region
    tile_off: list[list[int]] = []
    cur = data_start
    for plan in plans:
        offs = []
        for t in plan.tiles:
            offs.append(cur)
            cur += (len(t) + 1) // 2 * 2  # word-align each tile
        tile_off.append(offs)

    # stream directly to the tmp file — buffering the whole image in
    # memory first would double the peak footprint of a multi-GiB
    # BigTIFF tile for no benefit (offsets are precomputed above)
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as buf:
        if big:
            buf.write(struct.pack("<2sHHHQ", b"II", 43, 8, 0, ifd_pos[0]))
        else:
            buf.write(struct.pack("<2sHI", b"II", 42, ifd_pos[0]))
        for i, plan in enumerate(plans):
            ent = build_entries(plan, tile_off[i])
            assert buf.tell() == ifd_pos[i]
            buf.write(struct.pack(f"<{cnt_fmt}", len(ent)))
            ext_cursor = extra_pos[i]
            ext_chunks = []
            for tag, ft, values in ent:
                if ft == FT_ASCII:
                    payload = values.encode("ascii")
                    n = len(payload)
                else:
                    payload = struct.pack(
                        f"<{len(values)}{_FT_FMT[ft]}", *values)
                    n = len(values)
                if len(payload) <= inline:
                    buf.write(struct.pack(f"<HH{off_fmt}", tag, ft, n))
                    buf.write(payload.ljust(inline, b"\x00"))
                else:
                    buf.write(struct.pack(
                        f"<HH{off_fmt}{off_fmt}", tag, ft, n, ext_cursor))
                    pad = payload.ljust(
                        (len(payload) + 1) // 2 * 2, b"\x00")
                    ext_chunks.append(pad)
                    ext_cursor += len(pad)
            next_ifd = ifd_pos[i + 1] if i + 1 < len(plans) else 0
            buf.write(struct.pack(f"<{off_fmt}", next_ifd))
            for c in ext_chunks:
                buf.write(c)
        buf.write(b"\x00" * (data_start - buf.tell()))
        for i, plan in enumerate(plans):
            for j, t in enumerate(plan.tiles):
                assert buf.tell() == tile_off[i][j]
                buf.write(t.ljust((len(t) + 1) // 2 * 2, b"\x00"))
    os.replace(tmp, path)  # atomic publish, safe under task retry

    profile = {
        "dtype": dt, "count": bands, "nodata": nodata,
        "blockxsize": blockxsize, "blockysize": blockysize,
        "compress": {COMPRESS_DEFLATE: "DEFLATE", COMPRESS_LZW: "LZW",
                     COMPRESS_CCITTFAX4: "CCITTFAX4",
                     COMPRESS_PACKBITS: "PACKBITS"}.get(comp_code, "NONE"),
        "crs": f"EPSG:{epsg}", "tiled": True, "width": cols, "height": rows,
        "driver": "GTiff", "overviews": len(plans) - 1,
        "photometric": _PHOTOMETRIC_INV[phot],
    }
    if nbits is not None:
        profile["nbits"] = nbits
    return profile


# --------------------------------------------------------------------------
# Reader
# --------------------------------------------------------------------------

@dataclass
class _Level:
    width: int
    height: int
    tile_w: int
    tile_h: int
    offsets: list[int]
    counts: list[int]
    tiled: bool
    subfile_type: int


@dataclass
class GeoTiff:
    """Parsed GeoTIFF with windowed (tile-granular) reads.

    ``read_window`` touches only the tiles intersecting the window — on a
    range-request filesystem this is the COG partial-read property.
    """

    path: str
    width: int
    height: int
    count: int
    dtype: str
    nodata: float | None
    transform: tuple[float, float, float, float]  # ox, sx, oy, sy (n-up)
    crs: str
    compression: int
    predictor: int
    planar: int
    photometric: int
    colormap: dict[int, tuple[int, int, int]] | None
    nbits: int | None
    levels: list[_Level]
    metadata: dict[str, str] = field(default_factory=dict)
    bits_per_sample: int = 8
    _endian: str = "<"
    # optional factory returning a seekable file-like for pixel reads;
    # None = local open(path). object_store.open_cog wires a ranged-GET
    # reader here so read_window works straight off S3/GCS objects.
    opener: object = None

    def _open_pixels(self):
        if self.opener is not None:
            return self.opener()
        return open(self.path, "rb")

    # -- parsing -----------------------------------------------------------
    @classmethod
    def open(cls, path: str) -> "GeoTiff":
        with open(path, "rb") as f:
            return cls.from_file(f, path)

    @classmethod
    def from_bytes(cls, buf: bytes, path: str = "<memory>") -> "GeoTiff":
        """Parse header+IFDs from an in-memory prefix of the file — the
        ranged-GET path (a COG keeps all metadata at the head, so a small
        prefix suffices; ``read_window`` then needs the real ``path``)."""
        return cls.from_file(io.BytesIO(buf), path)

    @classmethod
    def from_file(cls, f, path: str) -> "GeoTiff":
        head = f.read(8)
        if head[:2] == b"II":
            en = "<"
        elif head[:2] == b"MM":
            en = ">"
        else:
            raise ValueError(f"not a TIFF: {path}")
        magic = struct.unpack(en + "H", head[2:4])[0]
        if magic == 42:
            big = False
            first = struct.unpack(en + "I", head[4:8])[0]
        elif magic == 43:
            big = True
            off_sz, _ = struct.unpack(en + "HH", head[4:8])
            if off_sz != 8:
                raise ValueError("bad BigTIFF offset size")
            first = struct.unpack(en + "Q", f.read(8))[0]
        else:
            raise ValueError(f"bad TIFF magic {magic}")

        ifds = []
        nxt = first
        while nxt:
            f.seek(nxt)
            tags, nxt = cls._read_ifd(f, en, big)
            ifds.append(tags)
            if len(ifds) > 64:
                raise ValueError("IFD chain too long")

        main = ifds[0]
        bits = main[T_BITS_PER_SAMPLE][0] if T_BITS_PER_SAMPLE in main else 1
        sfmt = main.get(T_SAMPLE_FORMAT, [1])[0]
        store_bits = max(8, bits) if bits < 8 else bits
        dtype = _TIFF_TO_DTYPE.get((store_bits, sfmt))
        if dtype is None:
            raise ValueError(f"unsupported sample type bits={bits} fmt={sfmt}")
        count = main.get(T_SAMPLES_PER_PIXEL, [1])[0]

        scale = main.get(T_MODEL_PIXEL_SCALE)
        tie = main.get(T_MODEL_TIEPOINT)
        if scale and tie:
            sx, sy = scale[0], scale[1]
            ox = tie[3] - tie[0] * sx
            oy = tie[4] + tie[1] * sy
            transform = (ox, sx, oy, sy)
        else:
            transform = (0.0, 1.0, 0.0, 1.0)

        crs = "EPSG:0"
        gk = main.get(T_GEO_KEY_DIRECTORY)
        if gk:
            nkeys = gk[3]
            for i in range(nkeys):
                kid, loc, cnt_, val = gk[4 + 4 * i:8 + 4 * i]
                if kid in (2048, 3072) and loc == 0:
                    crs = f"EPSG:{val}"

        nodata = None
        nd = main.get(T_GDAL_NODATA)
        if nd:
            s = nd.rstrip("\x00").strip()
            if s and s.lower() != "none":
                nodata = float(s)
        nbits = None
        metadata: dict[str, str] = {}
        meta = main.get(T_GDAL_METADATA)
        if meta:
            import re
            from xml.sax.saxutils import unescape

            for m in re.finditer(
                    r'<Item name="([^"]+)"[^>]*>([^<]*)</Item>', meta):
                metadata[unescape(m.group(1))] = unescape(m.group(2))
            if metadata.get("NBITS", "").isdigit():
                nbits = int(metadata["NBITS"])
        if bits < 8:
            nbits = bits

        levels = []
        for tags in ifds:
            w = tags[T_IMAGE_WIDTH][0]
            h = tags[T_IMAGE_LENGTH][0]
            if T_TILE_OFFSETS in tags:
                lv = _Level(w, h, tags[T_TILE_WIDTH][0],
                            tags[T_TILE_LENGTH][0],
                            list(tags[T_TILE_OFFSETS]),
                            list(tags[T_TILE_BYTE_COUNTS]), True,
                            tags.get(T_NEW_SUBFILE_TYPE, [0])[0])
            else:
                rps = tags.get(T_ROWS_PER_STRIP, [h])[0]
                lv = _Level(w, h, w, rps,
                            list(tags[T_STRIP_OFFSETS]),
                            list(tags[T_STRIP_BYTE_COUNTS]), False,
                            tags.get(T_NEW_SUBFILE_TYPE, [0])[0])
            levels.append(lv)
        levels.sort(key=lambda l: -l.width)

        comp = main.get(T_COMPRESSION, [1])[0]
        if comp == 32946:
            comp = COMPRESS_DEFLATE
        if comp not in (COMPRESS_NONE, COMPRESS_DEFLATE, COMPRESS_LZW,
                        COMPRESS_PACKBITS, COMPRESS_CCITTFAX4):
            raise ValueError(f"unsupported compression {comp}")
        return cls(
            path=path, width=main[T_IMAGE_WIDTH][0],
            height=main[T_IMAGE_LENGTH][0], count=count, dtype=dtype,
            nodata=nodata, transform=transform, crs=crs, compression=comp,
            predictor=main.get(T_PREDICTOR, [1])[0],
            planar=main.get(T_PLANAR_CONFIG, [1])[0],
            photometric=main.get(T_PHOTOMETRIC, [1])[0],
            colormap=GeoTiff._decode_colormap(main.get(T_COLOR_MAP)),
            nbits=nbits, levels=levels, metadata=metadata,
            bits_per_sample=bits, _endian=en,
        )

    @staticmethod
    def _decode_colormap(vals) -> dict[int, tuple[int, int, int]] | None:
        """Tag 320 -> {index: (r8, g8, b8)}: three channel-major runs of
        2^bits 16-bit values; only non-black entries are kept (the
        writer zero-fills unmapped indices)."""
        if not vals:
            return None
        n = len(vals) // 3
        out = {}
        for i in range(n):
            r, g, b = vals[i], vals[n + i], vals[2 * n + i]
            if r or g or b:
                out[i] = (r >> 8, g >> 8, b >> 8)
        return out

    @staticmethod
    def _read_ifd(f, en: str, big: bool):
        if big:
            n = struct.unpack(en + "Q", f.read(8))[0]
            esz, osz = 20, 8
        else:
            n = struct.unpack(en + "H", f.read(2))[0]
            esz, osz = 12, 4
        raw = f.read(n * esz)
        nxt = struct.unpack(en + ("Q" if big else "I"), f.read(osz))[0]
        tags = {}
        inline = 8 if big else 4
        deferred = []
        for i in range(n):
            e = raw[i * esz:(i + 1) * esz]
            tag, ft = struct.unpack(en + "HH", e[:4])
            cnt = struct.unpack(en + ("Q" if big else "I"),
                                e[4:4 + osz])[0]
            vsz = _FT_SIZE.get(ft, 1) * cnt
            vbytes = e[4 + osz:4 + osz + inline]
            if vsz <= inline:
                tags[tag] = GeoTiff._decode(vbytes[:vsz], ft, cnt, en)
            else:
                off = struct.unpack(en + ("Q" if big else "I"),
                                    vbytes[:osz])[0]
                deferred.append((tag, ft, cnt, off, vsz))
        for tag, ft, cnt, off, vsz in deferred:
            pos = f.tell()
            f.seek(off)
            tags[tag] = GeoTiff._decode(f.read(vsz), ft, cnt, en)
            f.seek(pos)
        return tags, nxt

    @staticmethod
    def _decode(b: bytes, ft: int, cnt: int, en: str):
        if ft == FT_ASCII:
            return b.decode("ascii", errors="replace")
        if ft in (FT_RATIONAL, FT_SRATIONAL):
            c = "I" if ft == FT_RATIONAL else "i"
            vals = struct.unpack(en + f"{2*cnt}{c}", b)
            return [vals[2*i] / max(vals[2*i+1], 1) for i in range(cnt)]
        fmt = _FT_FMT.get(ft)
        if fmt is None:
            return b
        return list(struct.unpack(en + f"{cnt}{fmt}", b))

    # -- reads -------------------------------------------------------------
    def _read_block(self, f, level: _Level, idx: int) -> np.ndarray:
        """Decode one tile/strip to ``(rows, tile_w, samples_in_block)``.

        Planar SEPARATE blocks hold one sample; chunky blocks interleave
        all samples per pixel (TIFF 6.0 §15); predictor-2 differencing
        runs per sample channel within each row."""
        f.seek(level.offsets[idx])
        raw = f.read(level.counts[idx])
        if self.compression == COMPRESS_CCITTFAX4:
            from .ccitt import g4_decode

            if self.planar == 1 and self.count > 1:
                raise ValueError("CCITTFAX4 is single-sample only")
            bw = level.tile_w
            if level.tiled:
                bh = level.tile_h
            else:  # strips are sequential row bands
                bh = min(level.tile_h, level.height - idx * level.tile_h)
            black = g4_decode(raw, bw, bh)
            vals = (black == (self.photometric == 0)).astype(self.dtype)
            return vals.reshape(bh, bw, 1)
        if self.compression == COMPRESS_DEFLATE:
            raw = zlib.decompress(raw)
        elif self.compression == COMPRESS_LZW:
            raw = _lzw_decode(raw)
        elif self.compression == COMPRESS_PACKBITS:
            raw = _packbits_decode(raw, 1 << 62)
        spb = self.count if self.planar == 1 else 1
        bw = level.tile_w
        if self.bits_per_sample < 8:
            stride = (bw * spb * self.bits_per_sample + 7) // 8
            bh = level.tile_h if level.tiled else len(raw) // stride
            arr = _unpack_rows(raw, bh, bw * spb, self.bits_per_sample)
            return arr.reshape(bh, bw, spb).astype(self.dtype)
        arr = np.frombuffer(raw, dtype=np.dtype(self.dtype).newbyteorder(
            self._endian))
        bh = level.tile_h if level.tiled else len(arr) // (bw * spb)
        arr = arr[:bh * bw * spb].reshape(bh, bw, spb).copy()
        if self.predictor == 2:
            for s in range(spb):
                arr[..., s] = _predict2_decode(np.ascontiguousarray(
                    arr[..., s]))
        return arr.astype(self.dtype)

    def read_window(
        self,
        col_off: int,
        row_off: int,
        width: int,
        height: int,
        *,
        level_idx: int = 0,
        boundless: bool = True,
        masked: bool = True,
    ):
        """Read ``(bands, height, width)`` at pixel window; decompresses
        only intersecting tiles. Out-of-image area is nodata-masked when
        ``boundless`` (contract of ``window_utils.py:88-133``)."""
        level = self.levels[level_idx]
        fill = self.nodata if self.nodata is not None else 0
        out = np.full((self.count, height, width), fill,
                      dtype=self.dtype)
        touched = np.zeros((height, width), dtype=bool)

        c0, c1 = max(col_off, 0), min(col_off + width, level.width)
        r0, r1 = max(row_off, 0), min(row_off + height, level.height)
        if c1 > c0 and r1 > r0:
            tj0, tj1 = c0 // level.tile_w, (c1 - 1) // level.tile_w
            ti0, ti1 = r0 // level.tile_h, (r1 - 1) // level.tile_h
            ncols_t = -(-level.width // level.tile_w)
            nrows_t = -(-level.height // level.tile_h)
            per_band = ncols_t * nrows_t
            with self._open_pixels() as f:
                for ti in range(ti0, ti1 + 1):
                    for tj in range(tj0, tj1 + 1):
                        bx0, by0 = tj * level.tile_w, ti * level.tile_h
                        sc0, sc1 = max(c0, bx0), min(c1, bx0 + level.tile_w)
                        sr0, sr1 = max(r0, by0), min(r1, by0 + level.tile_h)
                        chunky = self.planar == 1 and self.count > 1
                        if chunky:
                            block3 = self._read_block(
                                f, level, ti * ncols_t + tj)
                        for b in range(self.count):
                            if chunky:
                                block = block3[..., b]
                            else:
                                block = self._read_block(
                                    f, level,
                                    b * per_band + ti * ncols_t + tj
                                    if self.planar == 2
                                    else ti * ncols_t + tj)[..., 0]
                            out[b, sr0 - row_off:sr1 - row_off,
                                sc0 - col_off:sc1 - col_off] = block[
                                sr0 - by0:sr1 - by0, sc0 - bx0:sc1 - bx0]
                        touched[sr0 - row_off:sr1 - row_off,
                                sc0 - col_off:sc1 - col_off] = True
        if not boundless and not touched.all():
            raise ValueError("window exceeds image; pass boundless=True")
        if not masked:
            return out
        mask = np.broadcast_to(~touched, out.shape).copy()
        if self.nodata is not None:
            mask |= out == np.asarray(fill, dtype=self.dtype)
        return np.ma.MaskedArray(out, mask=mask)

    def window_from_bounds(
        self, bounds: tuple[float, float, float, float]
    ) -> tuple[int, int, int, int]:
        """(col_off, row_off, width, height) of ``bounds`` on the full-res
        grid (north-up)."""
        ox, sx, oy, sy = self.transform
        left, bottom, right, top = bounds
        c0 = int(round((left - ox) / sx))
        r0 = int(round((oy - top) / sy))
        w = int(round((right - left) / sx))
        h = int(round((top - bottom) / sy))
        return c0, r0, w, h

    def read_bounds(self, bounds, *, masked: bool = True):
        c0, r0, w, h = self.window_from_bounds(bounds)
        return self.read_window(c0, r0, w, h, masked=masked)

    def pick_level(self, decimation: float) -> int:
        """Index of the coarsest pyramid level whose decimation factor
        (full-res width / level width) does not exceed ``decimation`` —
        GDAL's RasterIO overview-selection rule. A zoomed-out query then
        decompresses 1/factor^2 of the bytes instead of reading full
        res and throwing pixels away."""
        best = 0
        for idx, lv in enumerate(self.levels):
            f = self.width / lv.width
            if f <= decimation + 1e-9:
                if f > self.width / self.levels[best].width:
                    best = idx
        return best

    def read_decimated(
        self,
        bounds: tuple[float, float, float, float],
        out_width: int,
        out_height: int,
        *,
        masked: bool = True,
    ):
        """Read ``bounds`` at a reduced resolution ``(out_height,
        out_width)``: picks the best overview level, windows it, and
        nearest-maps to the output grid (rasterio's ``out_shape``
        semantics). The overview pyramid makes low-zoom access O(output)
        instead of O(source) — the read-side reason COGs carry
        overviews at all."""
        c0, r0, w, h = self.window_from_bounds(bounds)
        if w <= 0 or h <= 0:
            raise ValueError("empty window")
        level_idx = self.pick_level(min(w / out_width, h / out_height))
        lv = self.levels[level_idx]
        f = self.width / lv.width
        lc0, lr0 = int(round(c0 / f)), int(round(r0 / f))
        lw = max(1, int(round(w / f)))
        lh = max(1, int(round(h / f)))
        arr = self.read_window(lc0, lr0, lw, lh, level_idx=level_idx,
                               masked=masked)
        ci = ((np.arange(out_width) + 0.5) * lw / out_width).astype(int)
        ri = ((np.arange(out_height) + 0.5) * lh / out_height).astype(int)
        ci, ri = np.minimum(ci, lw - 1), np.minimum(ri, lh - 1)
        return arr[:, ri][:, :, ci]

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        ox, sx, oy, sy = self.transform
        return (ox, oy - sy * self.height, ox + sx * self.width, oy)

    @property
    def profile(self) -> dict:
        lv = self.levels[0]
        return {
            "dtype": self.dtype, "count": self.count, "nodata": self.nodata,
            "blockxsize": lv.tile_w, "blockysize": lv.tile_h,
            "compress": {COMPRESS_DEFLATE: "DEFLATE", COMPRESS_LZW: "LZW",
                     COMPRESS_CCITTFAX4: "CCITTFAX4",
                         COMPRESS_PACKBITS: "PACKBITS"}.get(
                self.compression, "NONE"),
            "crs": self.crs, "tiled": lv.tiled,
            "width": self.width, "height": self.height, "driver": "GTiff",
            "overviews": sum(1 for l in self.levels if l.subfile_type == 1),
            "photometric": _PHOTOMETRIC_INV.get(self.photometric,
                                                "MINISBLACK"),
            **({"colormap": self.colormap} if self.colormap else {}),
        }


def build_overviews(
    path: str, resampling: str = "nearest", out_path: str | None = None
) -> dict:
    """gdaladdo analog: rewrite a GeoTIFF with a reduced-resolution
    pyramid in COG order. The tile sink writes flat files (matching the
    reference, which never runs gdaladdo); serving stacks that want
    zoom-out reads run this as a post-pass — one bounded task per tile,
    trivially parallel over the tile manifest."""
    tif = GeoTiff.open(path)
    data = tif.read_window(0, 0, tif.width, tif.height, masked=False)
    prof = tif.profile
    return write_cog(
        out_path or path, data,
        transform=tif.transform, crs=tif.crs, nodata=tif.nodata,
        blockxsize=prof["blockxsize"], blockysize=prof["blockysize"],
        compress=prof["compress"], predictor=tif.predictor,
        photometric=prof["photometric"], nbits=tif.nbits,
        metadata=tif.metadata or None,
        overviews=True, overview_resampling=resampling,
    )


def read_tile(path: str) -> tuple[np.ndarray, dict]:
    """Load a whole tile ``(bands, rows, cols)`` + its profile dict —
    the one-call counterpart of the sink's ``write_cog`` (test + user
    convenience; windowed access should use ``GeoTiff.read_window``)."""
    t = GeoTiff.open(path)
    data = t.read_window(0, 0, t.width, t.height, masked=False)
    return data, t.profile


def validate_cog(path: str) -> list[str]:
    """Check COG structural rules (cogeo spec): every IFD and tag payload
    precedes every tile byte; full-res IFD first; overviews sorted
    descending. Returns a list of violations (empty = valid)."""
    errs = []
    tif = GeoTiff.open(path)
    if tif.levels[0].subfile_type != 0:
        errs.append("first IFD is not the full-resolution image")
    widths = [l.width for l in tif.levels]
    if widths != sorted(widths, reverse=True):
        errs.append("overviews not sorted by descending size")
    min_tile = min(min(l.offsets) for l in tif.levels if l.offsets)
    # re-walk the raw IFD region — including every entry's OUT-OF-LINE
    # value block (offset arrays, geokeys, doubles), which must also
    # precede tile data for a head-prefix range read to suffice
    with open(path, "rb") as f:
        head = f.read(8)
        en = "<" if head[:2] == b"II" else ">"
        magic = struct.unpack(en + "H", head[2:4])[0]
        big = magic == 43
        if big:
            first = struct.unpack(en + "Q", f.read(8))[0]
            cnt_sz, entry_sz, nxt_sz, inline = 8, 20, 8, 8
            cfmt, ofmt = "Q", "Q"
            max_meta = 16
        else:
            first = struct.unpack(en + "I", head[4:8])[0]
            cnt_sz, entry_sz, nxt_sz, inline = 2, 12, 4, 4
            cfmt, ofmt = "H", "I"
            max_meta = 8
        nxt = first
        while nxt:
            f.seek(nxt)
            n = struct.unpack(en + cfmt, f.read(cnt_sz))[0]
            entries = f.read(n * entry_sz)
            max_meta = max(max_meta, nxt + cnt_sz + n * entry_sz + nxt_sz)
            fsz = 8 if big else 4
            ffmt = "Q" if big else "I"
            for i in range(n):
                e = entries[i * entry_sz:(i + 1) * entry_sz]
                ft = struct.unpack(en + "H", e[2:4])[0]
                cnt = struct.unpack(en + ffmt, e[4:4 + fsz])[0]
                vsz = _FT_SIZE.get(ft, 1) * cnt
                if vsz > inline:
                    off = struct.unpack(
                        en + ffmt, e[4 + fsz:4 + 2 * fsz])[0]
                    max_meta = max(max_meta, off + vsz)
            f.seek(nxt + cnt_sz + n * entry_sz)
            nxt = struct.unpack(en + ofmt, f.read(nxt_sz))[0]
    if max_meta > min_tile:
        errs.append(
            f"IFD metadata (ends {max_meta}) interleaves tile data "
            f"(starts {min_tile})")
    return errs

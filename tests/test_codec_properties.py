"""Property-based invariants (hypothesis) for the pure-Python codecs
and projections — randomized shapes/dtypes/filters beyond the
example-based suites."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gfw_pixetl_spark.functions.warp import latlng_to_utm, utm_to_latlng
from gfw_pixetl_spark.sources.geotiff import GeoTiff, write_cog
from gfw_pixetl_spark.sources.png import decode_png, encode_png

_SETTINGS = dict(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def _images(draw, max_side=96, dtypes=("uint8", "uint16")):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    ch = draw(st.sampled_from([1, 2, 3, 4]))
    dt = draw(st.sampled_from(dtypes))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, np.iinfo(dt).max + 1,
                        size=(h, w, ch)).astype(dt)


@given(img=_images(), ft=st.integers(0, 4))
@settings(**_SETTINGS)
def test_png_roundtrip_property(img, ft):
    np.testing.assert_array_equal(
        decode_png(encode_png(img, filter_type=ft)), img)


@st.composite
def _rasters(draw):
    bands = draw(st.integers(1, 3))
    rows = draw(st.integers(1, 120))
    cols = draw(st.integers(1, 120))
    dt = draw(st.sampled_from(
        ["uint8", "int16", "uint16", "int32", "float32", "float64"]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 100, size=(bands, rows, cols)).astype(dt)
    return a


@given(data=_rasters(), predictor=st.sampled_from([1, 2]),
       blockxsize=st.sampled_from([16, 48, 128]))
@settings(**_SETTINGS)
def test_geotiff_roundtrip_property(tmp_path_factory, data, predictor,
                                    blockxsize):
    if data.dtype.kind == "f":
        predictor = 1
    path = str(tmp_path_factory.mktemp("prop") / "t.tif")
    write_cog(path, data, transform=(0.0, 0.5, 50.0, 0.5), nodata=None,
              blockxsize=blockxsize, predictor=predictor, overviews=False)
    t = GeoTiff.open(path)
    got = t.read_window(0, 0, t.width, t.height, masked=False)
    np.testing.assert_array_equal(got, data)


@given(data=_rasters(), seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_geotiff_window_equals_slice_property(tmp_path_factory, data, seed):
    rng = np.random.default_rng(seed)
    path = str(tmp_path_factory.mktemp("win") / "t.tif")
    write_cog(path, data, transform=(0.0, 0.5, 50.0, 0.5), nodata=None,
              blockxsize=16, overviews=False)
    t = GeoTiff.open(path)
    _, rows, cols = data.shape
    c0 = int(rng.integers(0, cols))
    r0 = int(rng.integers(0, rows))
    w = int(rng.integers(1, cols - c0 + 1))
    h = int(rng.integers(1, rows - r0 + 1))
    got = t.read_window(c0, r0, w, h, masked=False)
    np.testing.assert_array_equal(got, data[:, r0:r0 + h, c0:c0 + w])


@given(
    lat=st.floats(-80.0, 80.0, allow_nan=False),
    dlon=st.floats(-2.9, 2.9, allow_nan=False),
    zone=st.integers(1, 60),
    north=st.booleans(),
)
@settings(**_SETTINGS)
def test_utm_roundtrip_property(lat, dlon, zone, north):
    epsg = (32600 if north else 32700) + zone
    lon = -183.0 + 6.0 * zone + dlon
    x, y = latlng_to_utm(lon, lat, epsg)
    blon, blat = utm_to_latlng(x, y, epsg)
    assert abs(blat - lat) < 1e-9
    assert abs((blon - lon + 180.0) % 360.0 - 180.0) < 1e-9


@given(data=_rasters(), seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_geotiff_reader_survives_truncation(tmp_path_factory, data, seed):
    """Robustness: truncated files must raise a clean error (ValueError /
    struct.error / zlib.error / EOF-ish), never hang or crash the
    interpreter — the failure mode a 1000-executor scan can tolerate."""
    import struct as _struct
    import zlib as _zlib

    rng = np.random.default_rng(seed)
    path = str(tmp_path_factory.mktemp("tr") / "t.tif")
    write_cog(path, data, transform=(0.0, 0.5, 50.0, 0.5), nodata=None,
              blockxsize=16, overviews=False)
    blob = open(path, "rb").read()
    cut = int(rng.integers(1, len(blob)))
    trunc = str(tmp_path_factory.mktemp("tr2") / "trunc.tif")
    open(trunc, "wb").write(blob[:cut])
    try:
        t = GeoTiff.open(trunc)
        t.read_window(0, 0, t.width, t.height)
    except (ValueError, _struct.error, _zlib.error, IndexError, KeyError,
            EOFError, OSError):
        pass  # clean, typed failure


@given(img=_images(max_side=24), seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_png_reader_survives_corruption(img, seed):
    import struct as _struct
    import zlib as _zlib

    rng = np.random.default_rng(seed)
    blob = bytearray(encode_png(img.astype("uint8")
                                if img.dtype != np.uint8 else img))
    pos = int(rng.integers(8, len(blob)))
    blob[pos] ^= int(rng.integers(1, 256))
    try:
        decode_png(bytes(blob))
    except (ValueError, _struct.error, _zlib.error, IndexError, KeyError,
            EOFError):
        pass  # CRC or structure check caught it


# --- CCITT G4 (sources/ccitt.py) -------------------------------------------

@st.composite
def _bitmaps(draw):
    h = draw(st.integers(1, 64))
    w = draw(st.integers(1, 300))
    density = draw(st.sampled_from([0.02, 0.2, 0.5, 0.8, 0.98]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.random((h, w)) < density


@given(bm=_bitmaps())
@settings(**_SETTINGS)
def test_g4_roundtrip_property(bm):
    from gfw_pixetl_spark.sources.ccitt import g4_decode, g4_encode

    np.testing.assert_array_equal(
        g4_decode(g4_encode(bm), bm.shape[1], bm.shape[0]), bm)


# --- baseline JPEG (sources/jpeg.py) ---------------------------------------

@st.composite
def _block_images(draw):
    """Images constant per 8x8 block: decode must be EXACT."""
    bh = draw(st.integers(1, 6))
    bw = draw(st.integers(1, 6))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, (bh, bw), dtype=np.uint8)
    return np.repeat(np.repeat(blocks, 8, 0), 8, 1)


@given(img=_block_images())
@settings(**_SETTINGS)
def test_jpeg_dc_only_exact_property(img):
    from gfw_pixetl_spark.sources.jpeg import decode_jpeg, encode_jpeg

    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg(img))[:, :, 0], img)


@given(
    h=st.integers(1, 40), w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
@settings(**_SETTINGS)
def test_jpeg_unit_quant_near_lossless_property(h, w, seed):
    from gfw_pixetl_spark.sources.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img))[:, :, 0]
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


# --- warp kernels (functions/warp.py) --------------------------------------

@given(
    method=st.sampled_from(
        ["bilinear", "cubic", "lanczos", "cubic_spline", "gauss"]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(**_SETTINGS)
def test_kernels_partition_of_unity_property(method, seed):
    """Den-normalized sampling preserves constants for EVERY kernel at
    arbitrary fractional positions (flat-field invariance)."""
    from gfw_pixetl_spark.functions.warp import sample_grid

    rng = np.random.default_rng(seed)
    c = float(rng.uniform(-1000, 1000))
    src = np.ma.MaskedArray(np.full((12, 12), c),
                            mask=np.zeros((12, 12), bool))
    fx = rng.uniform(3.0, 8.0, (3, 3))
    fy = rng.uniform(3.0, 8.0, (3, 3))
    out = sample_grid(src, fx, fy, method)
    np.testing.assert_allclose(out, c, rtol=1e-12, atol=1e-9)


@given(seed=st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_smoothing_kernels_stay_in_hull_property(seed):
    """cubic_spline and gauss have non-negative weights: outputs lie in
    [src.min(), src.max()] (no ringing/overshoot, unlike Keys/Lanczos)."""
    from gfw_pixetl_spark.functions.warp import sample_grid

    rng = np.random.default_rng(seed)
    src = np.ma.MaskedArray(rng.uniform(0, 255, (10, 10)),
                            mask=np.zeros((10, 10), bool))
    fx = rng.uniform(2.0, 7.0, (4, 4))
    fy = rng.uniform(2.0, 7.0, (4, 4))
    for method in ("cubic_spline", "gauss"):
        out = sample_grid(src, fx, fy, method)
        assert float(out.min()) >= float(src.min()) - 1e-9
        assert float(out.max()) <= float(src.max()) + 1e-9


# ---------------------------------------------------------------------------
# round-6 codecs: zstd (vs libzstd), GIF LZW, NTv2, WARC damage
# ---------------------------------------------------------------------------


@st.composite
def _byte_buffers(draw, max_len=8000):
    kind = draw(st.integers(0, 3))
    seed = draw(st.integers(0, 2**31 - 1))
    n = draw(st.integers(0, max_len))
    rng = np.random.default_rng(seed)
    if kind == 0:   # incompressible
        return rng.integers(0, 256, n).astype(np.uint8).tobytes()
    if kind == 1:   # long repeats
        unit = rng.integers(0, 256, max(1, n // 50 + 1)).astype(
            np.uint8).tobytes()
        return (unit * (n // max(1, len(unit)) + 1))[:n]
    if kind == 2:   # tiny alphabet (Huffman + sequences)
        return rng.integers(97, 101, n).astype(np.uint8).tobytes()
    return bytes(n)  # all zeros (RLE blocks)


@given(raw=_byte_buffers(), level=st.sampled_from([1, 3, 9, 19]))
@settings(**_SETTINGS)
def test_zstd_decode_matches_libzstd_property(raw, level):
    import pyarrow as pa

    from gfw_pixetl_spark.sources.zstd import decompress

    assert decompress(bytes(pa.Codec("zstd", level).compress(raw))) == raw


@given(data=st.data())
@settings(**_SETTINGS)
def test_gif_lzw_roundtrip_property(data):
    from gfw_pixetl_spark.sources.gif import lzw_decode, lzw_encode

    mcs = data.draw(st.integers(2, 8))
    n = data.draw(st.integers(1, 12000))
    seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 1 << mcs, n).astype(np.uint8)
    assert np.array_equal(lzw_decode(lzw_encode(idx, mcs), mcs, n), idx)


@given(data=st.data())
@settings(**_SETTINGS)
def test_gif_container_roundtrip_property(data):
    from gfw_pixetl_spark.sources.gif import decode_gif, encode_gif

    h = data.draw(st.integers(1, 48))
    w = data.draw(st.integers(1, 48))
    depth = data.draw(st.sampled_from([2, 4, 16, 64]))
    inter = data.draw(st.booleans())
    seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    px = rng.integers(0, depth, (h, w)).astype(np.uint8)
    pal = rng.integers(0, 256, (depth, 3)).astype(np.uint8)
    d = decode_gif(encode_gif(
        [{"pixels": px, "left": 0, "top": 0}], pal, interlace=inter))
    np.testing.assert_array_equal(d["frames"][0]["pixels"], px)
    np.testing.assert_array_equal(d["frames"][0]["palette"], pal)


@given(data=st.data())
@settings(**_SETTINGS)
def test_ntv2_interior_points_bounded_property(data):
    """Shift application stays within the node-value hull (bilinear
    interpolation cannot extrapolate) for random grids and points."""
    from gfw_pixetl_spark.sources.ntv2 import apply_shift, parse_gsb, write_gsb

    seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    lat_shift = rng.uniform(-5, 5, (11, 11))
    lon_shift = rng.uniform(-5, 5, (11, 11))
    g = dict(name="G", parent="NONE",
             s_lat=20 * 3600, n_lat=30 * 3600,
             e_long=60 * 3600, w_long=70 * 3600,
             lat_inc=3600, long_inc=3600,
             lat_shift=lat_shift, lon_shift=lon_shift)
    grids = parse_gsb(write_gsb([g]))
    n = data.draw(st.integers(1, 40))
    lat = rng.uniform(20.01, 29.99, n)
    lon = -rng.uniform(60.01, 69.99, n)
    la2, lo2, nm = apply_shift(grids, lat, lon)
    assert (nm == "G").all()
    dlat_sec = (la2 - lat) * 3600
    dlon_sec = (lon - lo2) * 3600
    lo32, hi32 = (np.float32(lat_shift.min()), np.float32(lat_shift.max()))
    assert (dlat_sec >= lo32 - 1e-6).all() and (dlat_sec <= hi32 + 1e-6).all()
    assert (dlon_sec >= np.float32(lon_shift.min()) - 1e-6).all()
    assert (dlon_sec <= np.float32(lon_shift.max()) + 1e-6).all()


@given(data=st.data())
@settings(**_SETTINGS)
def test_scan_warc_survives_any_single_corruption_property(data):
    from gfw_pixetl_spark.sources.warc import (
        http_response_bytes, scan_warc, write_warc,
    )

    recs = [{"uri": f"http://e.com/{i}",
             "payload": http_response_bytes(f"b{i}".encode() * 9)}
            for i in range(6)]
    a = write_warc(recs, gzip_members=data.draw(st.booleans()))
    b = bytearray(a)
    off = data.draw(st.integers(0, len(b) - 2))
    op = data.draw(st.integers(0, 2))
    if op == 0:
        b[off] ^= 1 << data.draw(st.integers(0, 7))
    elif op == 1:
        del b[off:off + data.draw(st.integers(1, 25))]
    else:
        b[off:off] = bytes(data.draw(st.integers(1, 12)))
    out, counters = scan_warc(bytes(b))  # must never raise
    assert counters["n_records"] == len(out) <= 7

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

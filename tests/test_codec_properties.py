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

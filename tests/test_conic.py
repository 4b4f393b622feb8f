"""Conic / equal-area projections (functions/conic.py): exact
false-origin anchors, round-trip closure, and the defining differential
properties — unit scale on LCC standard parallels, unit area distortion
for Albers/LAEA — checked numerically, so correctness doesn't rest on
remembered coordinates."""

from __future__ import annotations

import numpy as np
import pytest

from gfw_pixetl_spark.functions import conic as C

H = 1e-6  # degrees, for finite differences


def _forward(code):
    if code in C.LCC_PARAMS:
        return lambda lng, lat: C.latlng_to_lcc(lng, lat, code)
    if code in C.ALBERS_PARAMS:
        return lambda lng, lat: C.latlng_to_albers(lng, lat, code)
    return lambda lng, lat: C.latlng_to_laea(lng, lat, code)


def _inverse(code):
    if code in C.LCC_PARAMS:
        return lambda x, y: C.lcc_to_latlng(x, y, code)
    if code in C.ALBERS_PARAMS:
        return lambda x, y: C.albers_to_latlng(x, y, code)
    return lambda x, y: C.laea_to_latlng(x, y, code)


def _origin(code):
    if code in C.LCC_PARAMS:
        ell, lat1, lat2, lat0, lon0, fe, fn = C.LCC_PARAMS[code]
    elif code in C.ALBERS_PARAMS:
        ell, lat1, lat2, lat0, lon0, fe, fn = C.ALBERS_PARAMS[code]
    else:
        ell, lat0, lon0, fe, fn = C.LAEA_PARAMS[code]
    return lat0, lon0, fe, fn


ALL_CODES = sorted(C.LCC_PARAMS) + sorted(C.ALBERS_PARAMS) + sorted(
    C.LAEA_PARAMS)


@pytest.mark.parametrize("code", ALL_CODES)
def test_false_origin_is_exact(code):
    lat0, lon0, fe, fn = _origin(code)
    x, y = _forward(code)(np.array([lon0]), np.array([lat0]))
    assert abs(x[0] - fe) < 1e-6 and abs(y[0] - fn) < 1e-6


@pytest.mark.parametrize("code", ALL_CODES)
def test_round_trip(code):
    lat0, lon0, fe, fn = _origin(code)
    rng = np.random.default_rng(code)
    lats = lat0 + rng.uniform(-8, 8, 200)
    lngs = lon0 + rng.uniform(-15, 15, 200)
    x, y = _forward(code)(lngs, lats)
    lng2, lat2 = _inverse(code)(x, y)
    assert np.max(np.abs(lng2 - lngs)) < 1e-9
    assert np.max(np.abs(lat2 - lats)) < 1e-9


def _jacobian(fwd, lng, lat):
    """d(x,y)/d(lng,lat) in meters-per-radian via central differences."""
    x0, y0 = fwd(np.array([lng - H]), np.array([lat]))
    x1, y1 = fwd(np.array([lng + H]), np.array([lat]))
    x2, y2 = fwd(np.array([lng]), np.array([lat - H]))
    x3, y3 = fwd(np.array([lng]), np.array([lat + H]))
    d = np.radians(2 * H)
    return np.array([[(x1[0] - x0[0]) / d, (x3[0] - x2[0]) / d],
                     [(y1[0] - y0[0]) / d, (y3[0] - y2[0]) / d]])


def _ellipsoid_scales(ell, lat):
    a, rf = C._ELLIPSOIDS[ell]
    f = 1 / rf
    e2 = f * (2 - f)
    phi = np.radians(lat)
    w = np.sqrt(1 - e2 * np.sin(phi) ** 2)
    nu = a / w            # prime-vertical radius
    rho = a * (1 - e2) / w**3  # meridional radius
    return nu * np.cos(phi), rho  # meters/radian along parallel, meridian


@pytest.mark.parametrize("code", sorted(C.LCC_PARAMS))
def test_lcc_unit_scale_on_standard_parallels(code):
    ell, lat1, lat2, lat0, lon0, fe, fn = C.LCC_PARAMS[code]
    fwd = _forward(code)
    for lat in (lat1, lat2):
        jac = _jacobian(fwd, lon0 + 2.0, lat)
        par, mer = _ellipsoid_scales(ell, lat)
        k_par = np.hypot(jac[0, 0], jac[1, 0]) / par
        k_mer = np.hypot(jac[0, 1], jac[1, 1]) / mer
        assert abs(k_par - 1) < 1e-7   # conformal: k == h == 1 at parallels
        assert abs(k_mer - 1) < 1e-7
    # and > 1 away from them (scale grows off the parallels)
    jac = _jacobian(fwd, lon0, (lat1 + lat2) / 2)
    par, _ = _ellipsoid_scales(ell, (lat1 + lat2) / 2)
    assert np.hypot(jac[0, 0], jac[1, 0]) / par < 1.0  # between: k < 1


@pytest.mark.parametrize("code", sorted(C.ALBERS_PARAMS) + sorted(
    C.LAEA_PARAMS))
def test_equal_area_property(code):
    if code in C.ALBERS_PARAMS:
        ell, lat1, lat2, lat0, lon0, fe, fn = C.ALBERS_PARAMS[code]
        probe_lats = [lat1, lat2, (lat1 + lat2) / 2, lat0 + 1.0]
    else:
        ell, lat0, lon0, fe, fn = C.LAEA_PARAMS[code]
        probe_lats = [lat0, lat0 - 10, lat0 + 6]
    fwd = _forward(code)
    for lat in probe_lats:
        for dlng in (0.0, 5.0, -12.0):
            jac = _jacobian(fwd, lon0 + dlng, lat)
            par, mer = _ellipsoid_scales(ell, lat)
            det = abs(np.linalg.det(jac)) / (par * mer)
            assert abs(det - 1) < 1e-6  # area distortion == 1 everywhere


def test_lambert93_sanity_window():
    # Paris: the one remembered anchor, held loosely (the exact value is
    # property-tested above; this guards against axis/sign mixups only)
    x, y = C.latlng_to_lcc(np.array([2.3522]), np.array([48.8566]), 2154)
    assert 600_000 < x[0] < 700_000
    assert 6_820_000 < y[0] < 6_900_000


def test_conus_albers_sanity_window():
    # Denver
    x, y = C.latlng_to_albers(np.array([-104.99]), np.array([39.74]), 5070)
    assert -1_000_000 < x[0] < -600_000
    assert 1_700_000 < y[0] < 2_100_000


def test_laea_europe_sanity_window():
    # Berlin sits ~east-north-east of the 52N/10E origin
    x, y = C.latlng_to_laea(np.array([13.405]), np.array([52.52]), 3035)
    assert 4_500_000 < x[0] < 4_700_000
    assert 3_250_000 < y[0] < 3_350_000


def test_warp_dispatch_includes_conic():
    from gfw_pixetl_spark.functions.warp import _from_geographic, \
        _to_geographic

    lng = np.array([4.0, 8.0])
    lat = np.array([47.0, 49.0])
    for crs in ("EPSG:2154", "EPSG:5070", "EPSG:3035", "EPSG:3347",
                "EPSG:3577"):
        x, y = _from_geographic(lng, lat, crs)
        lng2, lat2 = _to_geographic(x, y, crs)
        assert np.max(np.abs(lng2 - lng)) < 1e-9
        assert np.max(np.abs(lat2 - lat)) < 1e-9
    # EPSG:27700 moved from unsupported to the TM hub in round 8
    # (functions/tmerc.py); a genuinely unsupported CRS still gates
    with pytest.raises(NotImplementedError):
        _to_geographic(lng, lat, "EPSG:2056")  # Swiss oblique Mercator


def test_warpreader_e2e_lambert93():
    """4326 synthetic source -> EPSG:2154 destination window: every
    destination pixel's nearest-neighbor source cell must match the
    analytic inverse mapping (the polar-stereo e2e pattern)."""
    from gfw_pixetl_spark.functions.warp import WarpReader
    from gfw_pixetl_spark.sources.raster import SyntheticReader

    src = SyntheticReader(xres=0.01, yres=0.01, mask_value=None)
    warp = WarpReader(
        inner=src, src_xres=0.01, src_yres=0.01,
        src_crs="EPSG:4326", dst_crs="EPSG:2154", method="nearest",
    )
    x0, y0 = C.latlng_to_lcc(np.array([2.3]), np.array([48.9]), 2154)
    x0, y0 = float(x0[0]), float(y0[0])
    bounds = (x0, y0 - 8000.0, x0 + 8000.0, y0)
    out = warp([], bounds, (20, 20), 1)
    xs = x0 + (np.arange(20) + 0.5) * 400.0
    ys = y0 - (np.arange(20) + 0.5) * 400.0
    gx, gy = np.meshgrid(xs, ys)
    lng, lat = C.lcc_to_latlng(gx, gy, 2154)
    col = np.rint((lng - (-180.0)) / 0.01 - 0.5).astype("int64")
    row = np.rint((90.0 - lat) / 0.01 - 0.5).astype("int64")
    np.testing.assert_array_equal(np.ma.getdata(out)[0], (row + col) % 16)

"""Analytic WGS84 UTM transforms (C4 arbitrary-CRS gap closure).

Checks are chosen to be independent of the implementation:
* quarter-meridian length against a numerically integrated meridian arc
  (the series' rectifying radius must reproduce the ellipse integral);
* the published CN Tower UTM sample (zone 17N) within survey tolerance;
* structural identities (false easting on the central meridian, southern
  false northing, zone symmetry);
* forward/inverse roundtrip to sub-micrometer over the zone's width;
* WarpReader end-to-end across a 4326 -> UTM warp.
"""

from __future__ import annotations

import numpy as np
import pytest

from gfw_pixetl_spark.functions.warp import (
    WarpReader,
    _A_BAR,
    latlng_to_utm,
    utm_to_latlng,
    utm_zone_epsg,
)
from gfw_pixetl_spark.sources.raster import SyntheticReader

A = 6378137.0
F = 1 / 298.257223563
E2 = F * (2 - F)


def meridian_arc(phi_deg: float) -> float:
    """Independent meridian distance: numerically integrate
    a(1-e^2)/(1-e^2 sin^2 t)^(3/2) dt with fine Simpson steps."""
    phi = np.radians(phi_deg)
    t = np.linspace(0.0, phi, 20001)
    integrand = A * (1 - E2) / (1 - E2 * np.sin(t) ** 2) ** 1.5
    return float(np.trapz(integrand, t))


def test_quarter_meridian():
    # rectifying radius: A_bar * pi/2 must equal the pole-to-equator arc
    assert abs(_A_BAR * np.pi / 2 - meridian_arc(90.0)) < 1e-3


def test_central_meridian_northing_matches_arc():
    # on the central meridian x = 500000 and y = k0 * meridian arc
    for lat in (0.0, 23.5, 40.0, 66.5, 80.0):
        x, y = latlng_to_utm(-3.0, lat, 32630)  # zone 30N, CM = -3
        assert abs(x - 500000.0) < 1e-6
        assert abs(y - 0.9996 * meridian_arc(lat)) < 1e-3


def test_cn_tower_published_sample():
    # CN Tower (43.642567N, 79.387139W) -> UTM 17N ~ (630084 E, 4833439 N)
    x, y = latlng_to_utm(-79.387139, 43.642567, 32617)
    assert abs(x - 630084.0) < 2.0
    assert abs(y - 4833439.0) < 2.0


def test_southern_hemisphere_false_northing():
    xn, yn = latlng_to_utm(-3.0, 10.0, 32630)
    xs, ys = latlng_to_utm(-3.0, -10.0, 32730)
    assert abs(xn - xs) < 1e-6
    assert abs((10000000.0 - ys) - yn) < 1e-6


def test_zone_symmetry():
    # same offset from each zone's CM must give identical coordinates
    x1, y1 = latlng_to_utm(1.5, 45.0, 32631)   # CM 3, offset -1.5
    x2, y2 = latlng_to_utm(7.5, 45.0, 32632)   # CM 9, offset -1.5
    assert abs(x1 - x2) < 1e-9 and abs(y1 - y2) < 1e-9


def test_roundtrip_grid():
    lngs = np.linspace(-3.0 - 2.9, -3.0 + 2.9, 31)  # zone 30 width
    lats = np.linspace(-79.0, 79.0, 41)
    glng, glat = np.meshgrid(lngs, lats)
    x, y = latlng_to_utm(glng, glat, 32630)
    blng, blat = utm_to_latlng(x, y, 32630)
    assert np.max(np.abs(blng - glng)) < 1e-9   # ~0.1 um
    assert np.max(np.abs(blat - glat)) < 1e-9


def test_scale_factor_on_cm():
    # d(northing)/d(arc) on the CM is exactly k0
    _, y1 = latlng_to_utm(-3.0, 44.9995, 32630)
    _, y2 = latlng_to_utm(-3.0, 45.0005, 32630)
    arc = meridian_arc(45.0005) - meridian_arc(44.9995)
    assert abs((y2 - y1) / arc - 0.9996) < 1e-9


def test_utm_zone_epsg():
    assert utm_zone_epsg(17, True) == 32617
    assert utm_zone_epsg(30, False) == 32730
    with pytest.raises(ValueError):
        utm_zone_epsg(0, True)


def test_warp_reader_4326_to_utm():
    """Destination window in UTM meters over a lat/lng synthetic source:
    nearest warp must equal direct sampling at the inverse-projected
    centers."""
    src = SyntheticReader(xres=0.001, yres=0.001, mask_value=None)
    warp = WarpReader(
        inner=src, src_xres=0.001, src_yres=0.001,
        src_crs="EPSG:4326", dst_crs="EPSG:32630", method="nearest",
    )
    # a 4 km x 4 km window near (44N, 3W): zone 30 CM
    x0, y0 = latlng_to_utm(-3.02, 44.02, 32630)
    x0, y0 = float(x0), float(y0)
    bounds = (x0, y0 - 4000.0, x0 + 4000.0, y0)
    out = warp([], bounds, (40, 40), 1)
    assert out.shape == (1, 40, 40)
    # golden: inverse-project each destination center, sample directly
    xs = x0 + (np.arange(40) + 0.5) * 100.0
    ys = y0 - (np.arange(40) + 0.5) * 100.0
    gx, gy = np.meshgrid(xs, ys)
    lng, lat = utm_to_latlng(gx, gy, 32630)
    col = np.rint((lng - (-180.0)) / 0.001 - 0.5).astype("int64")
    row = np.rint((90.0 - lat) / 0.001 - 0.5).astype("int64")
    expected = (row + col) % 16
    np.testing.assert_array_equal(np.ma.getdata(out)[0], expected)


def test_utm_to_mercator_chain():
    """UTM -> 3857 composes through the geographic hub."""
    from gfw_pixetl_spark.functions.warp import _project

    x, y = latlng_to_utm(-79.387139, 43.642567, 32617)
    mx, my = _project(
        np.array([x]), np.array([y]), "EPSG:3857", "EPSG:32617")
    # compare with direct 4326 -> 3857
    from gfw_pixetl_spark.functions.warp import latlng_to_mercator

    ex, ey = latlng_to_mercator(
        np.array([-79.387139]), np.array([43.642567]))
    assert abs(mx[0] - ex[0]) < 1e-6 and abs(my[0] - ey[0]) < 1e-6


# ---- polar stereographic (EPSG:3413 / EPSG:3031) -------------------------

def test_polar_pole_maps_to_origin():
    from gfw_pixetl_spark.functions.warp import latlng_to_polar

    x, y = latlng_to_polar(123.0, 90.0, 3413)
    assert abs(x) < 1e-6 and abs(y) < 1e-6
    x, y = latlng_to_polar(-7.0, -90.0, 3031)
    assert abs(x) < 1e-6 and abs(y) < 1e-6


def test_polar_true_scale_parallel_radius():
    """At the standard parallel the projection is true-scale, so the
    mapped distance from the pole equals the ellipsoid's parallel-circle
    radius there — an implementation-independent identity."""
    from gfw_pixetl_spark.functions.warp import latlng_to_polar

    # EPSG:3413: lat_ts 70N, lon0 -45 -> (70N, -45) lands on -y axis
    x, y = latlng_to_polar(-45.0, 70.0, 3413)
    r_parallel = A * np.cos(np.radians(70.0)) / np.sqrt(
        1 - E2 * np.sin(np.radians(70.0)) ** 2)
    assert abs(x) < 1e-6
    assert abs(-y - r_parallel) < 1e-3
    # EPSG:3031: lat_ts 71S, lon0 0 -> (71S, 0) on +y... check radius only
    x, y = latlng_to_polar(0.0, -71.0, 3031)
    r71 = A * np.cos(np.radians(71.0)) / np.sqrt(
        1 - E2 * np.sin(np.radians(71.0)) ** 2)
    assert abs(np.hypot(x, y) - r71) < 1e-3


def test_polar_roundtrip():
    from gfw_pixetl_spark.functions.warp import (
        latlng_to_polar,
        polar_to_latlng,
    )

    lngs = np.linspace(-179.0, 179.0, 37)
    lats = np.linspace(55.0, 89.5, 20)
    glng, glat = np.meshgrid(lngs, lats)
    x, y = latlng_to_polar(glng, glat, 3413)
    blng, blat = polar_to_latlng(x, y, 3413)
    dl = (blng - glng + 180.0) % 360.0 - 180.0
    assert np.max(np.abs(dl)) < 1e-9
    assert np.max(np.abs(blat - glat)) < 1e-9
    xs, ys = latlng_to_polar(glng, -glat, 3031)
    blng2, blat2 = polar_to_latlng(xs, ys, 3031)
    dl2 = (blng2 - glng + 180.0) % 360.0 - 180.0
    assert np.max(np.abs(dl2)) < 1e-9
    assert np.max(np.abs(blat2 + glat)) < 1e-9


def test_polar_known_hemisphere_orientation():
    from gfw_pixetl_spark.functions.warp import latlng_to_polar

    # north grid: lon0 -45 -> Greenwich meridian (lon 0) lies at +45 deg
    # from -y axis, i.e. x > 0, y < 0
    x, y = latlng_to_polar(0.0, 75.0, 3413)
    assert x > 0 and y < 0


def test_polar_warp_reader_chain():
    """4326 source -> EPSG:3413 destination window via WarpReader."""
    from gfw_pixetl_spark.functions.warp import (
        WarpReader,
        latlng_to_polar,
        polar_to_latlng,
    )
    from gfw_pixetl_spark.sources.raster import SyntheticReader

    src = SyntheticReader(xres=0.01, yres=0.01, mask_value=None)
    warp = WarpReader(
        inner=src, src_xres=0.01, src_yres=0.01,
        src_crs="EPSG:4326", dst_crs="EPSG:3413", method="nearest",
    )
    x0, y0 = latlng_to_polar(-44.0, 80.0, 3413)
    x0, y0 = float(x0), float(y0)
    bounds = (x0, y0 - 8000.0, x0 + 8000.0, y0)
    out = warp([], bounds, (20, 20), 1)
    xs = x0 + (np.arange(20) + 0.5) * 400.0
    ys = y0 - (np.arange(20) + 0.5) * 400.0
    gx, gy = np.meshgrid(xs, ys)
    lng, lat = polar_to_latlng(gx, gy, 3413)
    col = np.rint((lng - (-180.0)) / 0.01 - 0.5).astype("int64")
    row = np.rint((90.0 - lat) / 0.01 - 0.5).astype("int64")
    np.testing.assert_array_equal(np.ma.getdata(out)[0], (row + col) % 16)


# ---- Universal Polar Stereographic (EPSG:32661 / 32761, variant A) --------

def test_ups_pole_maps_to_false_origin():
    from gfw_pixetl_spark.functions.warp import latlng_to_polar

    x, y = latlng_to_polar(np.array([33.0]), np.array([90.0]), 32661)
    assert abs(x[0] - 2_000_000.0) < 1e-6 and abs(y[0] - 2_000_000.0) < 1e-6
    x, y = latlng_to_polar(np.array([0.0]), np.array([-90.0]), 32761)
    assert abs(x[0] - 2_000_000.0) < 1e-6 and abs(y[0] - 2_000_000.0) < 1e-6


def test_ups_scale_at_pole_is_k0():
    """Variant A's defining property: scale at the pole = 0.994 (the UPS
    constant). Measured as rho / meridian-arc for a point 0.0001 deg off
    the pole."""
    from gfw_pixetl_spark.functions.warp import (
        _E2, _WGS84_A, latlng_to_polar,
    )

    x, y = latlng_to_polar(np.array([0.0]), np.array([89.9999]), 32661)
    rho = float(np.hypot(x[0] - 2e6, y[0] - 2e6))
    dphi = np.radians(0.0001)
    m = _WGS84_A * (1 - _E2) / (1 - _E2) ** 1.5 * dphi
    assert abs(rho / m - 0.994) < 1e-7


def test_ups_roundtrip_and_axis_symmetry():
    from gfw_pixetl_spark.functions.warp import (
        latlng_to_polar, polar_to_latlng,
    )

    rng = np.random.default_rng(4)
    lng = rng.uniform(-180, 180, 100)
    lat = rng.uniform(60, 89.99, 100)
    for epsg, la in ((32661, lat), (32761, -lat)):
        x, y = latlng_to_polar(lng, la, epsg)
        lng2, lat2 = polar_to_latlng(x, y, epsg)
        np.testing.assert_allclose(
            np.mod(lng2 - lng + 180, 360) - 180, 0, atol=1e-9)
        np.testing.assert_allclose(lat2, la, atol=1e-9)
    # north: 0E meridian is the -y axis, 90E the +x axis
    x, y = latlng_to_polar(np.array([0.0, 90.0]), np.array([84.0, 84.0]),
                           32661)
    assert abs(x[0] - 2e6) < 1e-6 and y[0] < 2e6
    assert abs(y[1] - 2e6) < 1e-6 and x[1] > 2e6


def test_ups_warp_hub_roundtrip():
    """UPS participates in the geographic hub like every other CRS."""
    from gfw_pixetl_spark.functions.warp import _from_geographic, _to_geographic

    lng = np.array([-30.0, 45.0, 170.0])
    lat = np.array([75.0, 82.0, 66.0])
    x, y = _from_geographic(lng, lat, "EPSG:32661")
    lng2, lat2 = _to_geographic(x, y, "EPSG:32661")
    np.testing.assert_allclose(lng2, lng, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)

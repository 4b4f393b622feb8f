"""General transverse Mercator + datum chain (functions/tmerc.py,
functions/datum.py, functions/projstring.py).

Reference parity target: any CRS rasterio/PROJ would accept for the
grids the reference instantiates (gfw_pixetl/grids/grid_factory.py:
14-26 builds grids from CRS strings; tiles/raster_src_tile.py:188-210
warps through them). Anchors are published values: the Ordnance Survey
worked example from "A guide to coordinate systems in Great Britain"
(projection of OSGB36 geodetic coordinates to National Grid, quoted to
the millimeter) and bit-consistency against the independently
anchor-tested WGS84 UTM specialization in functions/warp.py.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gfw_pixetl_spark.functions import warp
from gfw_pixetl_spark.functions.datum import (
    ecef_to_geodetic,
    from_wgs84_geodetic,
    geodetic_to_ecef,
    helmert,
    to_wgs84_geodetic,
)
from gfw_pixetl_spark.functions.projstring import parse_proj
from gfw_pixetl_spark.functions.tmerc import (
    TM_PARAMS,
    TMDef,
    tm_forward,
    tm_inverse,
)

OSGB = TM_PARAMS[27700]


def test_os_worked_example():
    """OS guide worked example: OSGB36 geodetic -> National Grid.

    lat 52deg 39' 27.2531" N, lon 1deg 43' 4.5177" E
    => E 651409.903, N 313177.270 (published to the mm).
    """
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    e, n = tm_forward(lon, lat, OSGB)
    assert abs(e - 651409.903) < 2e-3
    assert abs(n - 313177.270) < 2e-3


def test_general_tm_matches_utm_specialization_bitexact():
    """At UTM parameters the general series must reproduce warp.py's
    WGS84-only specialization exactly (same coefficients, same order of
    operations)."""
    lngs = np.linspace(9.01, 14.99, 23)
    lats = np.linspace(-79.0, 84.0, 23)
    tm = TMDef("WGS84", 0.0, 9.0, 0.9996, 500000.0, 0.0)
    x1, y1 = tm_forward(lngs, lats, tm)
    x2, y2 = warp.latlng_to_utm(lngs, lats, 32632)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    tms = TMDef("WGS84", 0.0, 9.0, 0.9996, 500000.0, 10000000.0)
    x3, y3 = tm_forward(lngs, -np.abs(lats), tms)
    x4, y4 = warp.latlng_to_utm(lngs, -np.abs(lats), 32732)
    np.testing.assert_array_equal(x3, x4)
    np.testing.assert_array_equal(y3, y4)


def test_lat0_shifts_northing_by_rectifying_arc():
    """FN + k0*A*(xi - xi0): at lat0 itself, on the central meridian,
    the northing must equal FN exactly and easting FE exactly."""
    e, n = tm_forward(np.array([-2.0]), np.array([49.0]), OSGB)
    assert abs(e[0] - 400000.0) < 1e-9
    assert abs(n[0] - (-100000.0)) < 1e-9


@pytest.mark.parametrize("code,lng,lat", [
    (27700, -4.2, 55.9),   # Scotland
    (2180, 21.0, 52.2),    # Warsaw
    (2193, 174.8, -41.3),  # Wellington
])
def test_tm_roundtrip(code, lng, lat):
    tm = TM_PARAMS[code]
    x, y = tm_forward(np.array([lng]), np.array([lat]), tm)
    lo, la = tm_inverse(x, y, tm)
    assert abs(lo[0] - lng) < 1e-11
    assert abs(la[0] - lat) < 1e-11


def test_ecef_roundtrip_exact():
    lngs = np.linspace(-179.0, 179.0, 31)
    lats = np.linspace(-89.0, 89.0, 31)
    x, y, z = geodetic_to_ecef(lngs, lats, "airy")
    lo, la, h = ecef_to_geodetic(x, y, z, "airy")
    np.testing.assert_allclose(lo, lngs, atol=1e-12)
    np.testing.assert_allclose(la, lats, atol=1e-12)
    np.testing.assert_allclose(h, 0.0, atol=1e-7)


def test_helmert_exact_inverse():
    """The reverse transform is the exact linear inverse, not the
    negated-parameter approximation: ECEF round trip closes to nm."""
    p = OSGB.towgs84
    x = np.array([3980000.0, 3875000.0])
    y = np.array([-12000.0, 116000.0])
    z = np.array([4970000.0, 5048000.0])
    x2, y2, z2 = helmert(*helmert(x, y, z, p), p, inverse=True)
    np.testing.assert_allclose(x2, x, atol=1e-8)
    np.testing.assert_allclose(y2, y, atol=1e-8)
    np.testing.assert_allclose(z2, z, atol=1e-8)


def test_osgb36_shift_magnitude():
    """Public fact: OSGB36 and WGS84 graticules differ by roughly
    50-180 m over Great Britain (the famous ~120 m Greenwich offset)."""
    lng, lat = np.array([-0.0015]), np.array([51.478])
    lo, la = from_wgs84_geodetic(lng, lat, "airy", OSGB.towgs84)
    d = np.hypot((lo - lng) * 111320 * np.cos(np.radians(lat)),
                 (la - lat) * 111320)
    assert 50.0 < d[0] < 180.0


def test_datum_bridge_roundtrip_mm():
    """2-D datum crossing drops ellipsoidal height, so the round trip
    closes only to the h*rotation/scale cross-term — single-digit mm
    for OSGB36 (exactly PROJ's 2-D behavior)."""
    lngs = np.linspace(-7.0, 1.9, 9)
    lats = np.linspace(49.9, 60.8, 9)
    lo, la = to_wgs84_geodetic(
        *from_wgs84_geodetic(lngs, lats, "airy", OSGB.towgs84),
        "airy", OSGB.towgs84)
    assert np.max(np.abs(lo - lngs)) * 111320 < 0.005
    assert np.max(np.abs(la - lats)) * 111320 < 0.005


# --- proj-string front door ------------------------------------------------

CANON_27700 = (
    "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
    "+y_0=-100000 +ellps=airy "
    "+towgs84=446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894 "
    "+units=m +no_defs"
)


@pytest.mark.parametrize("ps,epsg", [
    (CANON_27700, "EPSG:27700"),
    ("+proj=utm +zone=30 +ellps=WGS84", "EPSG:32630"),
    ("+proj=utm +zone=59 +south +ellps=WGS84", "EPSG:32759"),
    ("+proj=webmerc +a=6378137 +b=6378137", "EPSG:3857"),
    ("+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=44 +lat_2=49 +x_0=700000 "
     "+y_0=6600000 +ellps=GRS80 +units=m", "EPSG:2154"),
    ("+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 "
     "+ellps=GRS80", "EPSG:5070"),
    ("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
     "+ellps=GRS80", "EPSG:3035"),
])
def test_projstring_matches_epsg_route(ps, epsg):
    lngs = np.array([-5.5, -2.0, 1.4, 9.0])
    lats = np.array([40.2, 47.0, 52.5, 59.9])
    if "south" in ps:
        lats = -lats
    x1, y1 = warp._from_geographic(lngs, lats, ps)
    x2, y2 = warp._from_geographic(lngs, lats, epsg)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    lo1, la1 = warp._to_geographic(x1, y1, ps)
    lo2, la2 = warp._to_geographic(x1, y1, epsg)
    np.testing.assert_array_equal(lo1, lo2)
    np.testing.assert_array_equal(la1, la2)


def test_projstring_longlat_identity_and_datum():
    lngs, lats = np.array([1.5]), np.array([52.0])
    lo, la = warp._from_geographic(lngs, lats, "+proj=longlat +ellps=WGS84")
    assert lo[0] == 1.5 and la[0] == 52.0
    # longlat on OSGB36 = pure datum transform
    lo2, la2 = warp._from_geographic(
        lngs, lats, "+proj=longlat +datum=OSGB36")
    lo3, la3 = from_wgs84_geodetic(lngs, lats, "airy", OSGB.towgs84)
    np.testing.assert_array_equal(lo2, lo3)
    np.testing.assert_array_equal(la2, la3)


def test_projstring_zero_towgs84_is_identity_bridge():
    lngs, lats = np.array([19.0]), np.array([52.0])
    x1, y1 = warp._from_geographic(
        lngs, lats,
        "+proj=tmerc +lon_0=19 +k=0.9993 +x_0=500000 +y_0=-5300000 "
        "+ellps=GRS80 +towgs84=0,0,0,0,0,0,0")
    x2, y2 = warp._from_geographic(lngs, lats, "EPSG:2180")
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)


@pytest.mark.parametrize("bad,msg", [
    ("+proj=robin", "robin"),
    ("+proj=tmerc +weird=1", "not supported"),
    ("+proj=merc +ellps=WGS84", "ellipsoidal Mercator"),
    ("+proj=lcc +lat_1=44 +ellps=GRS80", "2SP"),
    ("+proj=utm +zone=61 +ellps=WGS84", "out of range"),
])
def test_projstring_gates(bad, msg):
    with pytest.raises(NotImplementedError, match=msg):
        x = np.array([0.0])
        warp._from_geographic(x, x, bad)


@settings(max_examples=40, deadline=None)
@given(
    lng=st.floats(-6.9, 1.9),
    lat=st.floats(50.0, 60.7),
)
def test_hypothesis_bng_roundtrip(lng, lat):
    """Full EPSG:27700 chain round trip (projection + datum) closes to
    a centimeter anywhere over Great Britain."""
    x, y = warp._from_geographic(np.array([lng]), np.array([lat]),
                                 "EPSG:27700")
    lo, la = warp._to_geographic(x, y, "EPSG:27700")
    assert abs(lo[0] - lng) * 111320 < 0.01
    assert abs(la[0] - lat) * 111320 < 0.01


@settings(max_examples=40, deadline=None)
@given(
    lng=st.floats(-179.0, 179.0),
    lat=st.floats(-85.0, 85.0),
    h=st.floats(-1000.0, 9000.0),
)
def test_hypothesis_ecef_roundtrip_with_height(lng, lat, h):
    x, y, z = geodetic_to_ecef(np.array([lng]), np.array([lat]),
                               "GRS80", h=h)
    lo, la, h2 = ecef_to_geodetic(x, y, z, "GRS80")
    assert abs(lo[0] - lng) < 1e-11
    assert abs(la[0] - lat) < 1e-11
    assert abs(h2[0] - h) < 1e-6

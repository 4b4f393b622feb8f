"""Vincenty inverse (functions/geodesic.py) + the stere proj-string
route. Anchor: the published GDA technical-manual / Vincenty test line
(Flinders Peak -> Buninyong on GRS80: s = 54 972.271 m, forward
azimuth 306d 52' 05.37", reverse 127d 10' 25.07")."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gfw_pixetl_spark.functions import warp
from gfw_pixetl_spark.functions.geodesic import vincenty_inverse

FP = (-(37 + 57 / 60 + 3.72030 / 3600), 144 + 25 / 60 + 29.52440 / 3600)
BU = (-(37 + 39 / 60 + 10.15610 / 3600), 143 + 55 / 60 + 35.38390 / 3600)


def test_published_test_line():
    s, azf, azr = vincenty_inverse(
        np.array([FP[1]]), np.array([FP[0]]),
        np.array([BU[1]]), np.array([BU[0]]), "GRS80")
    assert abs(s[0] - 54972.271) < 1e-3
    assert abs(azf[0] - (306 + 52 / 60 + 5.37 / 3600)) < 1e-4
    assert abs(azr[0] - (127 + 10 / 60 + 25.07 / 3600)) < 1e-4


def test_swap_symmetry():
    s1, a1, r1 = vincenty_inverse(
        np.array([FP[1]]), np.array([FP[0]]),
        np.array([BU[1]]), np.array([BU[0]]), "GRS80")
    s2, a2, r2 = vincenty_inverse(
        np.array([BU[1]]), np.array([BU[0]]),
        np.array([FP[1]]), np.array([FP[0]]), "GRS80")
    assert abs(s1[0] - s2[0]) < 1e-6
    assert abs(a2[0] - r1[0]) < 1e-9
    assert abs(r2[0] - a1[0]) < 1e-9


def test_antipodal_gate():
    with pytest.raises(ValueError, match="antipodal"):
        vincenty_inverse(np.array([0.0]), np.array([0.0]),
                         np.array([179.6]), np.array([0.4]))


def test_meridian_arc_against_tm_rectifying_radius():
    """Along a meridian the geodesic is the meridian arc; one degree of
    arc at the equator on WGS84 is 110 574.4 m (public value)."""
    s, azf, _ = vincenty_inverse(np.array([12.0]), np.array([0.0]),
                                 np.array([12.0]), np.array([1.0]))
    assert abs(s[0] - 110574.4) < 0.5
    assert abs(azf[0] - 0.0) < 1e-9


def test_equatorial_arc():
    """Along the equator the geodesic is an a-radius circle arc:
    1 degree = a * pi/180 = 111 319.49 m on WGS84."""
    s, azf, _ = vincenty_inverse(np.array([10.0]), np.array([0.0]),
                                 np.array([11.0]), np.array([0.0]))
    assert abs(s[0] - 6378137.0 * np.pi / 180.0) < 1e-3
    assert abs(azf[0] - 90.0) < 1e-9


@settings(max_examples=50, deadline=None)
@given(
    lat1=st.floats(-60, 60), lon1=st.floats(-179, 179),
    dlat=st.floats(0.01, 2.0), dlon=st.floats(0.01, 2.0),
)
def test_hypothesis_triangle_and_haversine_agreement(lat1, lon1, dlat,
                                                     dlon):
    """Geodesic distance within [0.2%, 0.6%] of the spherical haversine
    (the flattening bound) and positive for distinct points."""
    lat2, lon2 = lat1 + dlat, lon1 + dlon
    s, _, _ = vincenty_inverse(np.array([lon1]), np.array([lat1]),
                               np.array([lon2]), np.array([lat2]))
    r = 6371008.8  # mean radius
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dphi, dlam = np.radians(lat2 - lat1), np.radians(lon2 - lon1)
    h = 2 * r * np.arcsin(np.sqrt(
        np.sin(dphi / 2) ** 2
        + np.cos(p1) * np.cos(p2) * np.sin(dlam / 2) ** 2))
    assert s[0] > 0
    assert abs(s[0] - h) / s[0] < 0.006


@pytest.mark.parametrize("ps,epsg", [
    ("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +ellps=WGS84",
     "EPSG:3413"),
    ("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +ellps=WGS84",
     "EPSG:3031"),
    ("+proj=stere +lat_0=90 +k=0.994 +x_0=2000000 +y_0=2000000 "
     "+ellps=WGS84", "EPSG:32661"),
])
def test_stere_projstring_matches_epsg(ps, epsg):
    sign = -1.0 if "lat_0=-90" in ps else 1.0
    lngs = np.array([-150.0, -45.0, 10.0])
    lats = sign * np.array([70.0, 75.0, 85.0])
    x1, y1 = warp._from_geographic(lngs, lats, ps)
    x2, y2 = warp._from_geographic(lngs, lats, epsg)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    lo1, la1 = warp._to_geographic(x1, y1, ps)
    lo2, la2 = warp._to_geographic(x1, y1, epsg)
    np.testing.assert_array_equal(lo1, lo2)
    np.testing.assert_array_equal(la1, la2)


def test_stere_oblique_gate():
    with pytest.raises(NotImplementedError, match="polar"):
        warp._from_geographic(np.array([0.0]), np.array([50.0]),
                              "+proj=stere +lat_0=52 +ellps=WGS84")


# --- direct problem ---------------------------------------------------------

def test_direct_closes_published_line():
    from gfw_pixetl_spark.functions.geodesic import vincenty_direct

    s, azf, azr = vincenty_inverse(
        np.array([FP[1]]), np.array([FP[0]]),
        np.array([BU[1]]), np.array([BU[0]]), "GRS80")
    lo2, la2, back = vincenty_direct(
        np.array([FP[1]]), np.array([FP[0]]), azf, s, "GRS80")
    assert abs(lo2[0] - BU[1]) * 111320 < 1e-6
    assert abs(la2[0] - BU[0]) * 111320 < 1e-6
    assert abs(back[0] - azr[0]) < 1e-9


@settings(max_examples=60, deadline=None)
@given(
    lat=st.floats(-70, 70), lon=st.floats(-179, 179),
    az=st.floats(0, 360), dist=st.floats(10.0, 2e6),
)
def test_hypothesis_direct_inverse_roundtrip(lat, lon, az, dist):
    from gfw_pixetl_spark.functions.geodesic import vincenty_direct

    lo2, la2, _ = vincenty_direct(np.array([lon]), np.array([lat]),
                                  np.array([az]), np.array([dist]))
    s, a, _ = vincenty_inverse(np.array([lon]), np.array([lat]),
                               lo2, la2)
    assert abs(s[0] - dist) < 1e-4
    assert min(abs(a[0] - az), 360 - abs(a[0] - az)) < 1e-7

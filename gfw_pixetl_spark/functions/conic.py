"""Conic and equal-area projections, ellipsoidal closed forms.

Extends the analytic CRS hub in :mod:`functions.warp` with the three
families continental raster products actually ship in:

* Lambert Conformal Conic 2SP — EPSG:2154 (RGF93 / Lambert-93)
* Albers Equal-Area Conic 2SP — EPSG:5070 (NAD83 / Conus Albers)
* Lambert Azimuthal Equal-Area — EPSG:3035 (ETRS89 / LAEA Europe)

All formulas are public: Snyder, "Map Projections — A Working Manual"
(USGS Professional Paper 1395, 1987): LCC pp. 104-110 (eq. 14-15/15-*),
Albers pp. 98-103 (eq. 14-*), LAEA pp. 182-190 (eq. 24-*, 3-16/3-18).
The reference engine gets these from PROJ via rasterio
(gfw_pixetl/tiles/raster_src_tile.py:188-210); this runtime has no
PROJ, so the same math is re-derived here and property-tested (exact
false-origin anchors, unit scale on the standard parallels, unit area
distortion for the equal-area pair, round-trip closure).

NAD83/ETRS89 use GRS80; RGF93 likewise. The datum shift between WGS84
and those frames is centimetric — ignored, as PROJ itself does for the
default ballpark transform — but the ELLIPSOID difference is honored
(GRS80 flattening differs from WGS84 in the 11th digit).
"""

from __future__ import annotations

import numpy as np

# (a, 1/f) — public defining constants
_ELLIPSOIDS = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
}


def _ab_e(ell) -> tuple[float, float, float]:
    """(a, e^2, e) from a name here, the datum registry, or an (a, 1/f)
    pair — the proj-string front door (functions/projstring.py) passes
    pairs through for ellipsoids outside the named set."""
    if isinstance(ell, str):
        if ell in _ELLIPSOIDS:
            a, rf = _ELLIPSOIDS[ell]
        else:
            from .datum import ELLIPSOIDS

            a, rf = ELLIPSOIDS[ell]
    else:
        a, rf = ell
    if rf == float("inf"):
        raise NotImplementedError(
            "conic projections need an ellipsoid, not a sphere")
    f = 1.0 / rf
    e2 = f * (2.0 - f)
    return a, e2, np.sqrt(e2)


# EPSG registry entries (public): (ellipsoid, lat1, lat2, lat0, lon0,
# false_e, false_n). lat1/lat2 = standard parallels (LCC/Albers).
LCC_PARAMS = {
    2154: ("GRS80", 44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0),
    3347: ("GRS80", 49.0, 77.0, 63.390675, -91.866667, 6200000.0,
           3000000.0),  # NAD83 / Statistics Canada Lambert
}
ALBERS_PARAMS = {
    5070: ("GRS80", 29.5, 45.5, 23.0, -96.0, 0.0, 0.0),
    3577: ("GRS80", -18.0, -36.0, 0.0, 132.0, 0.0, 0.0),  # GDA94 Australia
}
# LAEA: (ellipsoid, lat0, lon0, false_e, false_n)
LAEA_PARAMS = {
    3035: ("GRS80", 52.0, 10.0, 4321000.0, 3210000.0),
}


def _m(phi, e2):
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1 - e2 * s * s)


def _t(phi, e):
    s = np.sin(phi)
    return np.tan(np.pi / 4 - phi / 2) / ((1 - e * s) / (1 + e * s)) ** (e / 2)


def _q(phi, e, e2):
    s = np.sin(phi)
    return (1 - e2) * (s / (1 - e2 * s * s)
                       - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))


def _phi_from_t(t, e):
    """Conformal-latitude inversion by fixed point (Snyder 7-9)."""
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):
        s = np.sin(phi)
        phi_new = np.pi / 2 - 2 * np.arctan(
            t * ((1 - e * s) / (1 + e * s)) ** (e / 2))
        if np.all(np.abs(phi_new - phi) < 1e-14):
            return phi_new
        phi = phi_new
    return phi


def _phi_from_q(q, e, e2):
    """Authalic-latitude inversion by Newton steps (Snyder 3-16)."""
    phi = np.arcsin(np.clip(q / 2, -1, 1))
    for _ in range(10):
        s = np.sin(phi)
        denom = (1 - e2 * s * s) ** 2 / (2 * np.cos(phi) + 1e-300)
        delta = denom * (q / (1 - e2) - s / (1 - e2 * s * s)
                         + (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))
        phi = phi + delta
        if np.all(np.abs(delta) < 1e-14):
            break
    return phi


# --- Lambert Conformal Conic, 2 standard parallels -----------------------

def _lcc_setup(crs):
    """crs: EPSG code in LCC_PARAMS, or the param tuple itself."""
    ell, lat1, lat2, lat0, lon0, fe, fn = (
        LCC_PARAMS[crs] if isinstance(crs, int) else crs)
    a, e2, e = _ab_e(ell)
    p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))
    m1, m2 = _m(p1, e2), _m(p2, e2)
    t1, t2, t0 = _t(p1, e), _t(p2, e), _t(p0, e)
    n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    big_f = m1 / (n * t1 ** n)
    rho0 = a * big_f * t0 ** n
    return a, e, n, big_f, rho0, np.radians(lon0), fe, fn


def latlng_to_lcc(lng, lat, crs):
    a, e, n, big_f, rho0, lam0, fe, fn = _lcc_setup(crs)
    phi = np.radians(np.asarray(lat, dtype="float64"))
    lam = np.radians(np.asarray(lng, dtype="float64")) - lam0
    lam = (lam + np.pi) % (2 * np.pi) - np.pi
    rho = a * big_f * _t(phi, e) ** n
    theta = n * lam
    return fe + rho * np.sin(theta), fn + rho0 - rho * np.cos(theta)


def lcc_to_latlng(x, y, crs):
    a, e, n, big_f, rho0, lam0, fe, fn = _lcc_setup(crs)
    dx = np.asarray(x, dtype="float64") - fe
    dy = rho0 - (np.asarray(y, dtype="float64") - fn)
    rho = np.sign(n) * np.hypot(dx, dy)
    theta = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
    t = (rho / (a * big_f)) ** (1 / n)
    phi = _phi_from_t(t, e)
    return np.degrees(theta / n + lam0), np.degrees(phi)


# --- Albers Equal-Area Conic, 2 standard parallels -----------------------

def _albers_setup(crs):
    """crs: EPSG code in ALBERS_PARAMS, or the param tuple itself."""
    ell, lat1, lat2, lat0, lon0, fe, fn = (
        ALBERS_PARAMS[crs] if isinstance(crs, int) else crs)
    a, e2, e = _ab_e(ell)
    p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))
    m1, m2 = _m(p1, e2), _m(p2, e2)
    q1, q2, q0 = _q(p1, e, e2), _q(p2, e, e2), _q(p0, e, e2)
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    big_c = m1 * m1 + n * q1
    rho0 = a * np.sqrt(big_c - n * q0) / n
    return a, e, e2, n, big_c, rho0, np.radians(lon0), fe, fn


def latlng_to_albers(lng, lat, crs):
    a, e, e2, n, big_c, rho0, lam0, fe, fn = _albers_setup(crs)
    phi = np.radians(np.asarray(lat, dtype="float64"))
    lam = np.radians(np.asarray(lng, dtype="float64")) - lam0
    lam = (lam + np.pi) % (2 * np.pi) - np.pi
    rho = a * np.sqrt(big_c - n * _q(phi, e, e2)) / n
    theta = n * lam
    return fe + rho * np.sin(theta), fn + rho0 - rho * np.cos(theta)


def albers_to_latlng(x, y, crs):
    a, e, e2, n, big_c, rho0, lam0, fe, fn = _albers_setup(crs)
    dx = np.asarray(x, dtype="float64") - fe
    dy = rho0 - (np.asarray(y, dtype="float64") - fn)
    rho = np.sign(n) * np.hypot(dx, dy)
    theta = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
    q = (big_c - (rho * n / a) ** 2) / n
    phi = _phi_from_q(q, e, e2)
    return np.degrees(theta / n + lam0), np.degrees(phi)


# --- Lambert Azimuthal Equal-Area (oblique, ellipsoidal) ------------------

def _laea_setup(crs):
    """crs: EPSG code in LAEA_PARAMS, or the param tuple itself."""
    ell, lat0, lon0, fe, fn = (
        LAEA_PARAMS[crs] if isinstance(crs, int) else crs)
    a, e2, e = _ab_e(ell)
    p0 = np.radians(lat0)
    qp = _q(np.pi / 2, e, e2)
    q0 = _q(p0, e, e2)
    beta0 = np.arcsin(q0 / qp)
    rq = a * np.sqrt(qp / 2)
    d = a * _m(p0, e2) / (rq * np.cos(beta0))
    return a, e, e2, qp, beta0, rq, d, np.radians(lon0), fe, fn


def latlng_to_laea(lng, lat, crs):
    a, e, e2, qp, beta0, rq, d, lam0, fe, fn = _laea_setup(crs)
    phi = np.radians(np.asarray(lat, dtype="float64"))
    lam = np.radians(np.asarray(lng, dtype="float64")) - lam0
    lam = (lam + np.pi) % (2 * np.pi) - np.pi
    beta = np.arcsin(np.clip(_q(phi, e, e2) / qp, -1, 1))
    b = rq * np.sqrt(2 / (1 + np.sin(beta0) * np.sin(beta)
                          + np.cos(beta0) * np.cos(beta) * np.cos(lam)))
    x = fe + b * d * np.cos(beta) * np.sin(lam)
    y = fn + (b / d) * (np.cos(beta0) * np.sin(beta)
                        - np.sin(beta0) * np.cos(beta) * np.cos(lam))
    return x, y


def laea_to_latlng(x, y, crs):
    a, e, e2, qp, beta0, rq, d, lam0, fe, fn = _laea_setup(crs)
    dx = (np.asarray(x, dtype="float64") - fe) / d
    dy = (np.asarray(y, dtype="float64") - fn) * d
    rho = np.hypot(dx, dy)
    ce = 2 * np.arcsin(np.clip(rho / (2 * rq), -1, 1))
    with np.errstate(invalid="ignore", divide="ignore"):
        beta = np.arcsin(np.clip(
            np.cos(ce) * np.sin(beta0)
            + np.where(rho > 0, dy * np.sin(ce) * np.cos(beta0) / rho, 0.0),
            -1, 1))
        lam = np.arctan2(
            dx * np.sin(ce),
            rho * np.cos(beta0) * np.cos(ce)
            - dy * np.sin(beta0) * np.sin(ce))
    lam = np.where(rho == 0, 0.0, lam)
    beta = np.where(rho == 0, beta0, beta)
    phi = _phi_from_q(qp * np.sin(beta), e, e2)
    return np.degrees(lam + lam0), np.degrees(phi)

"""Datum primitives: ellipsoid registry, geodetic<->ECEF, 7-parameter
Helmert (position-vector convention, EPSG method 9606).

The reference engine inherits datum handling from PROJ via rasterio
(``gfw_pixetl/tiles/raster_src_tile.py:188-210``); this runtime has no
PROJ, so the public closed forms are implemented here and chained by
:mod:`functions.warp`'s geographic hub: a CRS on a non-WGS84 datum
projects on its OWN ellipsoid and crosses to the hub through
geodetic -> ECEF -> Helmert -> geodetic. Grid-based shifts (NTv2) live
in :mod:`sources.ntv2`; this module is the parametric fallback PROJ
calls ``+towgs84``.

All formulas are public:

* geodetic<->ECEF: standard geodesy (e.g. Hofmann-Wellenhof, "GPS
  Theory and Practice"); the inverse iterates the classic fixed point
  on latitude (converges at rate ~e^2 per round).
* Helmert position-vector: X' = T + (1 + s*1e-6) * R(rx,ry,rz) * X with
  the small-angle rotation matrix [[1,-rz,ry],[rz,1,-rx],[-ry,rx,1]]
  (rotations in radians). The EPSG "coordinate-frame" convention only
  flips the rotation signs; published parameter sets name which one
  they use — everything stored here is position-vector, the PROJ
  ``+towgs84`` convention.
* The REVERSE transform is the exact linear inverse (3x3 matrix
  inverse of (1+ds)R), not the negated-parameter approximation, so a
  round trip closes to machine precision.

Ellipsoid defining constants and the OSGB36 ``towgs84`` set are public
registry values (EPSG / the PROJ ellps table / OS "A guide to
coordinate systems in Great Britain").
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

# name -> (a meters, 1/f) — the PROJ +ellps registry subset this hub uses
ELLIPSOIDS: dict[str, tuple[float, float]] = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "airy": (6377563.396, 299.3249646),
    "mod_airy": (6377340.189, 299.3249646),
    "intl": (6378388.0, 297.0),
    "clrk66": (6378206.4, 294.9786982),
    "bessel": (6377397.155, 299.1528128),
    "krass": (6378245.0, 298.3),
    "WGS72": (6378135.0, 298.26),
}

# datum -> position-vector params LOCAL -> WGS84, PROJ +towgs84 order:
# (tx, ty, tz [m], rx, ry, rz [arcsec], s [ppm]).
TOWGS84: dict[str, tuple[float, ...]] = {
    # OSGB36 -> WGS84 (OS guide table 6.1 reversed = PROJ's EPSG:27700)
    "OSGB36": (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421,
               -20.4894),
}

_ARCSEC = np.pi / (180.0 * 3600.0)


def resolve_ellipsoid(ell) -> tuple[float, float]:
    """(a, f) from a registry name or an (a, 1/f) pair."""
    if isinstance(ell, str):
        try:
            a, rf = ELLIPSOIDS[ell]
        except KeyError:
            raise NotImplementedError(
                f"unknown ellipsoid {ell!r}: known {sorted(ELLIPSOIDS)}"
            ) from None
    else:
        a, rf = ell
    return float(a), 1.0 / float(rf)


def geodetic_to_ecef(lng, lat, ell, h=0.0):
    """Geodetic degrees (+ optional ellipsoidal height) -> ECEF meters."""
    a, f = resolve_ellipsoid(ell)
    e2 = f * (2.0 - f)
    phi = np.radians(np.asarray(lat, dtype="float64"))
    lam = np.radians(np.asarray(lng, dtype="float64"))
    s, c = np.sin(phi), np.cos(phi)
    nu = a / np.sqrt(1.0 - e2 * s * s)
    x = (nu + h) * c * np.cos(lam)
    y = (nu + h) * c * np.sin(lam)
    z = (nu * (1.0 - e2) + h) * s
    return x, y, z


def ecef_to_geodetic(x, y, z, ell):
    """ECEF meters -> geodetic degrees (lng, lat) + height meters.

    Fixed-point iteration on latitude; 30 rounds is far past double
    convergence for |s| <= 1 (rate ~ e^2 ~ 6.7e-3 per round).
    """
    a, f = resolve_ellipsoid(ell)
    e2 = f * (2.0 - f)
    x = np.asarray(x, dtype="float64")
    y = np.asarray(y, dtype="float64")
    z = np.asarray(z, dtype="float64")
    p = np.hypot(x, y)
    lam = np.arctan2(y, x)
    phi = np.arctan2(z, p * (1.0 - e2))
    nu = a
    for _ in range(30):
        s = np.sin(phi)
        nu = a / np.sqrt(1.0 - e2 * s * s)
        phi_new = np.arctan2(z + e2 * nu * s, p)
        if np.all(np.abs(phi_new - phi) < 1e-16):
            phi = phi_new
            break
        phi = phi_new
    s, c = np.sin(phi), np.cos(phi)
    # height from the dominant component (robust near the poles)
    h = np.where(np.abs(c) > 1e-8, p / np.where(c == 0, 1, c) - nu,
                 z / np.where(s == 0, 1, s) - nu * (1.0 - e2))
    return np.degrees(lam), np.degrees(phi), h


@lru_cache(maxsize=32)
def _helmert_matrices(params: tuple[float, ...]):
    tx, ty, tz, rx, ry, rz, s_ppm = params
    rx, ry, rz = rx * _ARCSEC, ry * _ARCSEC, rz * _ARCSEC
    m = (1.0 + s_ppm * 1e-6) * np.array([
        [1.0, -rz, ry],
        [rz, 1.0, -rx],
        [-ry, rx, 1.0],
    ])
    t = np.array([tx, ty, tz])
    return m, np.linalg.inv(m), t


def helmert(x, y, z, params, inverse: bool = False):
    """Apply (or exactly un-apply) a position-vector Helmert transform."""
    m, m_inv, t = _helmert_matrices(tuple(float(p) for p in params))
    v = np.stack([np.asarray(x, dtype="float64").ravel(),
                  np.asarray(y, dtype="float64").ravel(),
                  np.asarray(z, dtype="float64").ravel()])
    if inverse:
        out = m_inv @ (v - t[:, None])
    else:
        out = m @ v + t[:, None]
    shape = np.asarray(x, dtype="float64").shape
    return (out[0].reshape(shape), out[1].reshape(shape),
            out[2].reshape(shape))


def is_null_shift(params) -> bool:
    return params is None or all(float(p) == 0.0 for p in params)


def to_wgs84_geodetic(lng, lat, ell, towgs84):
    """Local-datum geodetic -> WGS84 geodetic (h=0 on the local
    ellipsoid; the height the round trip re-derives is absorbed, which
    is exactly what 2-D CRS transforms do)."""
    if is_null_shift(towgs84):
        return lng, lat
    x, y, z = geodetic_to_ecef(lng, lat, ell)
    x, y, z = helmert(x, y, z, towgs84)
    lng2, lat2, _h = ecef_to_geodetic(x, y, z, "WGS84")
    return lng2, lat2


def from_wgs84_geodetic(lng, lat, ell, towgs84):
    """WGS84 geodetic -> local-datum geodetic (exact inverse path)."""
    if is_null_shift(towgs84):
        return lng, lat
    x, y, z = geodetic_to_ecef(lng, lat, "WGS84")
    x, y, z = helmert(x, y, z, towgs84, inverse=True)
    lng2, lat2, _h = ecef_to_geodetic(x, y, z, ell)
    return lng2, lat2

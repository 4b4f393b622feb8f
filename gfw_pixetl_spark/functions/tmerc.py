"""General transverse Mercator — any ellipsoid, central meridian, scale,
false origin, latitude of natural origin — via the Karney-Krüger series.

:mod:`functions.warp` carries the WGS84-only UTM specialization of the
same series (Krüger 1912 rearranged by Karney, "Transverse Mercator
with an accuracy of a few nanometers", J. Geod. 2011, arXiv:1002.1417).
This module re-derives the coefficients per ellipsoid (4th order in the
third flattening n — truncation O(A*n^5) < 1e-7 m for every registry
ellipsoid) so national grids the reference engine inherits from PROJ
(``gfw_pixetl/tiles/raster_src_tile.py:188-210``) resolve analytically:

* EPSG:27700 — OSGB36 / British National Grid (Airy 1830, lat0 49N,
  k0 0.9996012717, FE 400000, FN -100000, Helmert datum shift)
* EPSG:2180  — ETRS89 / Poland CS92 (GRS80, lon0 19E, k0 0.9993)
* EPSG:2193  — NZGD2000 / NZTM2000 (GRS80, lon0 173E)

A nonzero latitude-of-origin subtracts the rectifying ordinate of lat0
(the series evaluated on the central meridian) from the northing —
Karney §5 / EPSG guidance note 7-2. Datum crossing to the WGS84 hub is
delegated to :mod:`functions.datum`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from .datum import resolve_ellipsoid


@dataclass(frozen=True)
class TMDef:
    """One transverse-Mercator CRS: ellipsoid + Snyder/EPSG parameters.

    ``ell`` is an ellipsoid registry name or an (a, 1/f) pair;
    ``towgs84`` the position-vector Helmert set LOCAL -> WGS84 (None or
    all-zero = the datum IS the hub datum).
    """

    ell: object
    lat0: float
    lon0: float
    k0: float
    fe: float
    fn: float
    towgs84: tuple[float, ...] | None = None


# EPSG registry entries (public parameter sets)
TM_PARAMS: dict[int, TMDef] = {
    27700: TMDef("airy", 49.0, -2.0, 0.9996012717, 400000.0, -100000.0,
                 (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421,
                  -20.4894)),
    2180: TMDef("GRS80", 0.0, 19.0, 0.9993, 500000.0, -5300000.0),
    2193: TMDef("GRS80", 0.0, 173.0, 0.9996, 1600000.0, 10000000.0),
}


@lru_cache(maxsize=32)
def tm_coefficients(a: float, f: float):
    """(A_bar, alpha[4], beta[4], e, e2) for the Karney-Krüger series."""
    n = f / (2.0 - f)
    e2 = f * (2.0 - f)
    a_bar = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
    alpha = (
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440,
        61 * n**3 / 240 - 103 * n**4 / 140,
        49561 * n**4 / 161280,
    )
    beta = (
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360,
        n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440,
        17 * n**3 / 480 - 37 * n**4 / 840,
        4397 * n**4 / 161280,
    )
    return a_bar, alpha, beta, np.sqrt(e2), e2


def _xi_eta(phi, lam, e, alpha):
    """Gauss-Schreiber (xi', eta') -> Krüger (xi, eta), vectorized."""
    tau = np.tan(phi)
    sigma = np.sinh(e * np.arctanh(e * tau / np.sqrt(1 + tau**2)))
    taup = tau * np.sqrt(1 + sigma**2) - sigma * np.sqrt(1 + tau**2)
    xi_p = np.arctan2(taup, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(taup**2 + np.cos(lam) ** 2))
    xi, eta = xi_p.copy(), eta_p.copy()
    for j, c in enumerate(alpha, start=1):
        xi += c * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += c * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return xi, eta


@lru_cache(maxsize=64)
def _xi0(a: float, f: float, lat0: float) -> float:
    """Rectifying ordinate of the latitude of origin (central meridian)."""
    if lat0 == 0.0:
        return 0.0
    _, alpha, _, e, _ = tm_coefficients(a, f)
    xi, _eta = _xi_eta(np.radians(np.float64(lat0)), np.float64(0.0),
                       e, alpha)
    return float(xi)


def tm_forward(lng, lat, tm: TMDef):
    """Geodetic degrees ON THE CRS DATUM -> easting/northing meters."""
    a, f = resolve_ellipsoid(tm.ell)
    a_bar, alpha, _beta, e, _e2 = tm_coefficients(a, f)
    phi = np.radians(np.asarray(lat, dtype="float64"))
    lam = np.radians(np.asarray(lng, dtype="float64") - tm.lon0)
    lam = (lam + np.pi) % (2 * np.pi) - np.pi
    xi, eta = _xi_eta(phi, lam, e, alpha)
    x = tm.fe + tm.k0 * a_bar * eta
    y = tm.fn + tm.k0 * a_bar * (xi - _xi0(a, f, tm.lat0))
    return x, y


def tm_inverse(x, y, tm: TMDef):
    """Easting/northing meters -> geodetic degrees ON THE CRS DATUM."""
    a, f = resolve_ellipsoid(tm.ell)
    a_bar, _alpha, beta, e, e2 = tm_coefficients(a, f)
    eta = (np.asarray(x, dtype="float64") - tm.fe) / (tm.k0 * a_bar)
    xi = ((np.asarray(y, dtype="float64") - tm.fn) / (tm.k0 * a_bar)
          + _xi0(a, f, tm.lat0))
    xi_p, eta_p = xi.copy(), eta.copy()
    for j, c in enumerate(beta, start=1):
        xi_p -= c * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= c * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    taup = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # Newton-iterate conformal tau' back to geodetic tau (Karney eq. 19-21)
    tau = taup / np.sqrt(1 - e2)
    for _ in range(6):
        sigma = np.sinh(e * np.arctanh(e * tau / np.sqrt(1 + tau**2)))
        taup_i = tau * np.sqrt(1 + sigma**2) - sigma * np.sqrt(1 + tau**2)
        dtau = ((taup - taup_i) * (1 + (1 - e2) * tau**2)
                / ((1 - e2) * np.sqrt((1 + taup_i**2) * (1 + tau**2))))
        tau = tau + dtau
        if np.all(np.abs(dtau) < 1e-14):
            break
    lat = np.degrees(np.arctan(tau))
    lng = np.degrees(lam) + tm.lon0
    return lng, lat

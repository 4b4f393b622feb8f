"""Ellipsoidal geodesics: Vincenty inverse (distance + azimuths).

Spatial curation at corpus scale needs true ground distances — dedup
radii, capture-to-capture displacement, store-locator joins — and the
spherical haversine is ~0.5% wrong, which at 100 km is half a
kilometer. Vincenty's inverse method (T. Vincenty, "Direct and inverse
solutions of geodesics on the ellipsoid with application of nested
equations", Survey Review XXIII(176), 1975 — public) is accurate to
~0.5 mm on the ellipsoid everywhere except near-antipodal pairs, where
the lambda iteration is known not to converge (callers get a clear
error, not a wrong number; the reference engine has no geodesic path
at all, so this is extension surface, anchored on the published
GDA/Vincenty test line Flinders Peak -> Buninyong).

Vectorized over numpy arrays; a fixed 30-round iteration (convergence
rate ~f per round, so double precision plateaus by ~10) keeps the
kernel branch-free and lets the DuckDB oracle replay the SAME fixed
point with a recursive CTE (q438).
"""

from __future__ import annotations

import numpy as np

from .datum import resolve_ellipsoid


def vincenty_inverse(lng1, lat1, lng2, lat2, ell="WGS84",
                     iterations: int = 30):
    """(distance_m, fwd_azimuth_deg, rev_azimuth_deg), vectorized.

    Azimuths are clockwise from north in [0, 360). Near-antipodal
    pairs (lambda > pi after iteration) raise ValueError — Vincenty's
    documented non-convergence region.
    """
    a, f = resolve_ellipsoid(ell)
    b = a * (1.0 - f)
    phi1 = np.radians(np.asarray(lat1, dtype="float64"))
    phi2 = np.radians(np.asarray(lat2, dtype="float64"))
    big_l = np.radians(np.asarray(lng2, dtype="float64")
                       - np.asarray(lng1, dtype="float64"))
    u1 = np.arctan((1.0 - f) * np.tan(phi1))
    u2 = np.arctan((1.0 - f) * np.tan(phi2))
    su1, cu1 = np.sin(u1), np.cos(u1)
    su2, cu2 = np.sin(u2), np.cos(u2)

    lam = big_l.copy()
    sin_s = cos_s = sigma = sin_a = cos2a = cos2sm = np.zeros_like(lam)
    lam_prev = lam
    for _ in range(iterations):
        sl, cl = np.sin(lam), np.cos(lam)
        sin_s = np.sqrt((cu2 * sl) ** 2 + (cu1 * su2 - su1 * cu2 * cl) ** 2)
        cos_s = su1 * su2 + cu1 * cu2 * cl
        sigma = np.arctan2(sin_s, cos_s)
        with np.errstate(invalid="ignore", divide="ignore"):
            sin_a = np.where(sin_s != 0, cu1 * cu2 * sl / sin_s, 0.0)
        cos2a = 1.0 - sin_a * sin_a
        with np.errstate(invalid="ignore", divide="ignore"):
            cos2sm = np.where(cos2a != 0,
                              cos_s - 2.0 * su1 * su2 / cos2a, 0.0)
        c = f / 16.0 * cos2a * (4.0 + f * (4.0 - 3.0 * cos2a))
        lam_prev = lam
        lam = big_l + (1.0 - c) * f * sin_a * (
            sigma + c * sin_s * (
                cos2sm + c * cos_s * (-1.0 + 2.0 * cos2sm * cos2sm)))
        if np.array_equal(lam, lam_prev):
            # exact fixed point across the whole batch: a further round
            # would recompute every quantity from the identical lambda,
            # so breaking here is bit-for-bit identical to running all
            # `iterations` rounds (typical convergence: 4-7 rounds —
            # the remaining ~25 were pure recomputation). NaNs compare
            # unequal, so any non-finite lane keeps iterating as before.
            break
    # non-convergence shows as lambda still MOVING after the fixed
    # rounds (near-antipodal oscillation), not as |lambda| > pi
    if np.any(np.abs(lam - lam_prev) > 1e-11):
        raise ValueError(
            "vincenty_inverse: near-antipodal pair — the lambda "
            "iteration does not converge there (Vincenty 1975 §4)")

    u_sq = cos2a * (a * a - b * b) / (b * b)
    big_a = 1.0 + u_sq / 16384.0 * (
        4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq)))
    big_b = u_sq / 1024.0 * (
        256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))
    d_sigma = big_b * sin_s * (
        cos2sm + big_b / 4.0 * (
            cos_s * (-1.0 + 2.0 * cos2sm ** 2)
            - big_b / 6.0 * cos2sm * (-3.0 + 4.0 * sin_s ** 2)
            * (-3.0 + 4.0 * cos2sm ** 2)))
    s = b * big_a * (sigma - d_sigma)

    sl, cl = np.sin(lam), np.cos(lam)
    az_f = np.degrees(np.arctan2(cu2 * sl, cu1 * su2 - su1 * cu2 * cl))
    # back azimuth: the bearing FROM point 2 TO point 1 (Vincenty's
    # alpha2 is the forward line's azimuth AT point 2; surveys quote
    # the reverse sight, alpha2 +- 180 — the GDA test line convention)
    az_r = 180.0 + np.degrees(
        np.arctan2(cu1 * sl, -su1 * cu2 + cu1 * su2 * cl))
    return s, az_f % 360.0, az_r % 360.0


def vincenty_direct(lng1, lat1, azimuth_deg, distance_m, ell="WGS84",
                    iterations: int = 30):
    """Destination (lng2, lat2, back_azimuth_deg) from a start point, a
    forward azimuth and a ground distance — Vincenty's direct solution
    (1975, eq. 1-11), vectorized. The direct problem always converges
    (the sigma iteration is a contraction for s < half the perimeter),
    so no gate is needed. ``direct(inverse(P1, P2)) == P2`` closes to
    sub-millimeter; tests assert it on the published GDA line."""
    a, f = resolve_ellipsoid(ell)
    b = a * (1.0 - f)
    phi1 = np.radians(np.asarray(lat1, dtype="float64"))
    alpha1 = np.radians(np.asarray(azimuth_deg, dtype="float64"))
    s = np.asarray(distance_m, dtype="float64")
    tan_u1 = (1.0 - f) * np.tan(phi1)
    cu1 = 1.0 / np.sqrt(1.0 + tan_u1 * tan_u1)
    su1 = tan_u1 * cu1
    sigma1 = np.arctan2(tan_u1, np.cos(alpha1))
    sin_a = cu1 * np.sin(alpha1)
    cos2a = 1.0 - sin_a * sin_a
    u_sq = cos2a * (a * a - b * b) / (b * b)
    big_a = 1.0 + u_sq / 16384.0 * (
        4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq)))
    big_b = u_sq / 1024.0 * (
        256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))

    sigma = s / (b * big_a)
    cos2sm = np.cos(2.0 * sigma1 + sigma)
    for _ in range(iterations):
        cos2sm = np.cos(2.0 * sigma1 + sigma)
        d_sigma = big_b * np.sin(sigma) * (
            cos2sm + big_b / 4.0 * (
                np.cos(sigma) * (-1.0 + 2.0 * cos2sm * cos2sm)
                - big_b / 6.0 * cos2sm
                * (-3.0 + 4.0 * np.sin(sigma) ** 2)
                * (-3.0 + 4.0 * cos2sm * cos2sm)))
        sigma = s / (b * big_a) + d_sigma

    ss, cs = np.sin(sigma), np.cos(sigma)
    ca1 = np.cos(alpha1)
    phi2 = np.arctan2(
        su1 * cs + cu1 * ss * ca1,
        (1.0 - f) * np.sqrt(
            sin_a * sin_a + (su1 * ss - cu1 * cs * ca1) ** 2))
    lam = np.arctan2(ss * np.sin(alpha1), cu1 * cs - su1 * ss * ca1)
    c = f / 16.0 * cos2a * (4.0 + f * (4.0 - 3.0 * cos2a))
    big_l = lam - (1.0 - c) * f * sin_a * (
        sigma + c * ss * (cos2sm + c * cs
                          * (-1.0 + 2.0 * cos2sm * cos2sm)))
    lng2 = np.asarray(lng1, dtype="float64") + np.degrees(big_l)
    # back azimuth: bearing FROM the destination TO the start (the
    # inverse solution's convention)
    az_back = 180.0 + np.degrees(
        np.arctan2(sin_a, -(su1 * ss - cu1 * cs * ca1)))
    return lng2, np.degrees(phi2), az_back % 360.0

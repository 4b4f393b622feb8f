"""PROJ-string front door for the analytic CRS hub.

The reference engine accepts any CRS rasterio/PROJ can parse
(``gfw_pixetl/grids/grid_factory.py:14-26`` instantiates grids from
CRS strings; ``tiles/raster_src_tile.py:188-210`` warps through them).
This runtime has no PROJ, so this module parses the PROJ-string
*syntax* (public: proj.org "Projections" docs) and lowers each
supported ``+proj=`` family onto the analytic implementations already
in the hub:

========== =======================================================
+proj=     lowered to
========== =======================================================
longlat    geographic passthrough (+ optional Helmert datum bridge)
utm        general transverse Mercator (functions/tmerc.py)
tmerc      general transverse Mercator (functions/tmerc.py)
merc /     spherical web-Mercator (functions/warp.py) — gated to the
webmerc    +a=+b sphere PROJ itself uses for EPSG:3857
lcc        Lambert conformal conic 2SP (functions/conic.py)
aea        Albers equal-area 2SP (functions/conic.py)
laea       Lambert azimuthal equal-area (functions/conic.py)
========== =======================================================

Datum handling: ``+ellps`` / ``+a``+``+rf``/``+b`` pick the ellipsoid,
``+towgs84`` (3 or 7 comma-separated values, position-vector) or
``+datum`` chain the CRS onto the WGS84 hub through
:mod:`functions.datum`. Unsupported families/parameters raise
``NotImplementedError`` with the supported list — never a silent
wrong answer.
"""

from __future__ import annotations

from dataclasses import dataclass

from .datum import TOWGS84, from_wgs84_geodetic, to_wgs84_geodetic
from .tmerc import TMDef, tm_forward, tm_inverse

_DATUMS = {
    "WGS84": ("WGS84", None),
    "OSGB36": ("airy", TOWGS84["OSGB36"]),
}

_HANDLED = {
    "proj", "zone", "south", "north", "lat_0", "lon_0", "lat_1", "lat_2",
    "lat_ts", "k", "k_0", "x_0", "y_0", "ellps", "a", "b", "rf", "f",
    "datum", "towgs84", "units", "no_defs", "type", "wktext",
}


@dataclass(frozen=True)
class CRSSpec:
    family: str          # longlat | tmerc | merc_sph | lcc | aea | laea
    payload: object      # TMDef | conic param tuple | None
    ell: object          # ellipsoid name or (a, 1/f)
    towgs84: tuple[float, ...] | None


def _parse_kv(s: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for tok in s.split():
        if not tok.startswith("+"):
            raise NotImplementedError(
                f"proj-string token {tok!r}: expected '+key[=value]'")
        body = tok[1:]
        k, _, v = body.partition("=")
        out[k] = v
    return out


def _ellipsoid(kv: dict[str, str]):
    if "datum" in kv:
        try:
            return _DATUMS[kv["datum"]]
        except KeyError:
            raise NotImplementedError(
                f"+datum={kv['datum']}: known {sorted(_DATUMS)}") from None
    tow = None
    if "towgs84" in kv:
        vals = tuple(float(x) for x in kv["towgs84"].split(","))
        if len(vals) == 3:
            vals = vals + (0.0, 0.0, 0.0, 0.0)
        if len(vals) != 7:
            raise NotImplementedError(
                "+towgs84 needs 3 or 7 comma-separated values")
        tow = vals
    if "a" in kv:
        a = float(kv["a"])
        if "rf" in kv:
            return (a, float(kv["rf"])), tow
        if "b" in kv:
            b = float(kv["b"])
            if b == a:  # sphere — the web-Mercator datum
                return (a, float("inf")), tow
            return (a, a / (a - b)), tow
        return (a, float("inf")), tow
    return kv.get("ellps", "WGS84"), tow


def parse_proj(s: str) -> CRSSpec:
    kv = _parse_kv(s)
    unknown = set(kv) - _HANDLED
    if unknown:
        raise NotImplementedError(
            f"proj-string parameters not supported: {sorted(unknown)}")
    proj = kv.get("proj")
    ell, tow = _ellipsoid(kv)

    def f(key: str, default: float) -> float:
        return float(kv.get(key) or default)

    k0 = float(kv.get("k") or kv.get("k_0") or 1.0)
    if proj == "longlat":
        return CRSSpec("longlat", None, ell, tow)
    if proj == "utm":
        zone = int(kv["zone"])
        if not 1 <= zone <= 60:
            raise NotImplementedError(f"+zone={zone} out of range 1..60")
        tm = TMDef(ell, 0.0, zone * 6.0 - 183.0, 0.9996, 500000.0,
                   10000000.0 if "south" in kv else 0.0, tow)
        return CRSSpec("tmerc", tm, ell, tow)
    if proj == "tmerc":
        tm = TMDef(ell, f("lat_0", 0.0), f("lon_0", 0.0), k0,
                   f("x_0", 0.0), f("y_0", 0.0), tow)
        return CRSSpec("tmerc", tm, ell, tow)
    if proj in ("merc", "webmerc"):
        if isinstance(ell, tuple):
            a, frac = ell
        else:
            from .datum import resolve_ellipsoid

            a, fl = resolve_ellipsoid(ell)
            frac = 1.0 / fl
        if proj == "merc" and frac != float("inf"):
            raise NotImplementedError(
                "+proj=merc: only the +a=+b sphere (web Mercator) is "
                "supported; ellipsoidal Mercator is not in the hub")
        if a != 6378137.0:
            raise NotImplementedError(
                "+proj=webmerc: only the WGS84 sphere a=6378137 is "
                "supported")
        return CRSSpec("merc_sph", None, ell, tow)
    if proj == "lcc":
        if "lat_2" not in kv:
            raise NotImplementedError(
                "+proj=lcc: only the 2SP form (+lat_1 +lat_2) is supported")
        params = (ell, f("lat_1", 0.0), f("lat_2", 0.0), f("lat_0", 0.0),
                  f("lon_0", 0.0), f("x_0", 0.0), f("y_0", 0.0))
        return CRSSpec("lcc", params, ell, tow)
    if proj == "aea":
        params = (ell, f("lat_1", 0.0), f("lat_2", 0.0), f("lat_0", 0.0),
                  f("lon_0", 0.0), f("x_0", 0.0), f("y_0", 0.0))
        return CRSSpec("aea", params, ell, tow)
    if proj == "laea":
        params = (ell, f("lat_0", 0.0), f("lon_0", 0.0), f("x_0", 0.0),
                  f("y_0", 0.0))
        return CRSSpec("laea", params, ell, tow)
    if proj == "stere":
        # polar variants only (lat_0 = +-90), the hub's anchored code
        # path: variant B via +lat_ts, variant A via +k/+k_0
        lat0 = f("lat_0", 90.0)
        if abs(lat0) != 90.0:
            raise NotImplementedError(
                "+proj=stere: only polar (lat_0=+-90) is supported")
        if ell not in ("WGS84",) and not (
                isinstance(ell, tuple) and ell[0] == 6378137.0):
            raise NotImplementedError(
                "+proj=stere: the polar hub is WGS84-only")
        north = lat0 > 0
        lat_ts = float(kv["lat_ts"]) if "lat_ts" in kv else None
        params = (lat_ts if lat_ts is not None else None,
                  f("lon_0", 0.0), north,
                  k0 if lat_ts is None else None,
                  f("x_0", 0.0), f("y_0", 0.0))
        return CRSSpec("stere", params, ell, tow)
    raise NotImplementedError(
        f"+proj={proj}: supported families are longlat, utm, tmerc, "
        "merc/webmerc, lcc, aea, laea, stere (polar)")


def spec_to_geographic(xs, ys, spec: CRSSpec):
    """Projected coords on the spec's datum -> WGS84 (lng, lat)."""
    from . import conic
    from .warp import mercator_to_latlng

    if spec.family == "longlat":
        lng, lat = xs, ys
    elif spec.family == "tmerc":
        lng, lat = tm_inverse(xs, ys, spec.payload)
    elif spec.family == "merc_sph":
        return mercator_to_latlng(xs, ys)  # sphere: no datum bridge
    elif spec.family == "lcc":
        lng, lat = conic.lcc_to_latlng(xs, ys, spec.payload)
    elif spec.family == "aea":
        lng, lat = conic.albers_to_latlng(xs, ys, spec.payload)
    elif spec.family == "laea":
        lng, lat = conic.laea_to_latlng(xs, ys, spec.payload)
    elif spec.family == "stere":
        from .warp import polar_to_latlng

        lng, lat = polar_to_latlng(xs, ys, spec.payload)
    else:  # pragma: no cover - parse_proj gates families
        raise NotImplementedError(spec.family)
    return to_wgs84_geodetic(lng, lat, spec.ell, spec.towgs84)


def spec_from_geographic(lng, lat, spec: CRSSpec):
    """WGS84 (lng, lat) -> projected coords on the spec's datum."""
    from . import conic
    from .warp import latlng_to_mercator

    if spec.family == "merc_sph":
        return latlng_to_mercator(lng, lat)
    lng, lat = from_wgs84_geodetic(lng, lat, spec.ell, spec.towgs84)
    if spec.family == "longlat":
        return lng, lat
    if spec.family == "tmerc":
        return tm_forward(lng, lat, spec.payload)
    if spec.family == "lcc":
        return conic.latlng_to_lcc(lng, lat, spec.payload)
    if spec.family == "aea":
        return conic.latlng_to_albers(lng, lat, spec.payload)
    if spec.family == "laea":
        return conic.latlng_to_laea(lng, lat, spec.payload)
    if spec.family == "stere":
        from .warp import latlng_to_polar

        return latlng_to_polar(lng, lat, spec.payload)
    raise NotImplementedError(spec.family)  # pragma: no cover

"""Polygon rasterization kernel: gdal_rasterize semantics in NumPy.

Replicates the burn rule of ``gdal_rasterize`` as invoked by the reference
(``gfw_pixetl/tiles/vector_src_tile.py:158-212``): ALL_TOUCHED is off, so
a pixel is burned iff its CENTER is inside the polygon (even-odd rule,
GDALRasterizeGeometries' default). Features are burned sequentially in
caller-supplied order — the last painted wins per pixel (the ORDER BY
tie-break semantic, ``vector_src_tile.py:67-74``); ``add`` mode
accumulates 1 per covering feature (``-burn 1 -add``,
``vector_src_tile.py:166-167``).

Pure NumPy, no GDAL/shapely: one scanline pass per polygon over the rows
its bbox spans. Vectorized across each scanline's edge crossings.
"""

from __future__ import annotations

import numpy as np

Ring = list  # list of (x, y) pairs; first ring = shell, rest = holes


def _edges(ring) -> np.ndarray:
    """(n, 4) array of segments (x0, y0, x1, y1), closing the ring.

    Accepts lists of pairs or Arrow-style object arrays of arrays.
    """
    pts = np.array([[float(p[0]), float(p[1])] for p in ring], dtype="float64")
    if not np.array_equal(pts[0], pts[-1]):
        pts = np.vstack([pts, pts[0]])
    return np.column_stack([pts[:-1], pts[1:]])


def polygon_mask(
    rings: list[Ring],
    transform: tuple[float, float, float, float],
    shape: tuple[int, int],
) -> np.ndarray:
    """Boolean coverage mask for one polygon (shell + holes).

    ``transform`` = (origin_x, origin_y, xres, yres) with origin at the
    TOP-LEFT corner and yres > 0 meaning rows go downward (north-up).
    Pixel center (r, c) = (origin_x + (c + .5) * xres,
                           origin_y - (r + .5) * yres).
    Even-odd rule: count edge crossings of the horizontal ray to the left
    of the pixel center; odd = inside. Holes flip parity naturally.
    """
    ox, oy, xres, yres = transform
    rows, cols = shape
    out = np.zeros((rows, cols), dtype=bool)
    all_edges = np.vstack([_edges(r) for r in rings])
    x0, y0, x1, y1 = all_edges.T
    ymin = np.minimum(y0, y1)
    ymax = np.maximum(y0, y1)

    # rows whose centers the polygon can reach
    gy_min = float(ymin.min())
    gy_max = float(ymax.max())
    r_first = max(0, int(np.floor((oy - gy_max) / yres - 0.5 + 1e-12)))
    r_last = min(rows - 1, int(np.ceil((oy - gy_min) / yres - 0.5 - 1e-12)))

    for r in range(r_first, r_last + 1):
        cy = oy - (r + 0.5) * yres
        # edges crossing the scanline: half-open rule [ymin, ymax) excludes
        # double-counting shared vertices
        active = (ymin <= cy) & (cy < ymax)
        if not active.any():
            continue
        ax0, ay0, ax1, ay1 = (v[active] for v in (x0, y0, x1, y1))
        t = (cy - ay0) / (ay1 - ay0)
        xs = np.sort(ax0 + t * (ax1 - ax0))
        # crossings pair up into inside intervals [xs[0],xs[1]), ...
        for i in range(0, len(xs) - 1, 2):
            lo, hi = xs[i], xs[i + 1]
            c_first = int(np.ceil((lo - ox) / xres - 0.5 - 1e-12))
            c_last = int(np.floor((hi - ox) / xres - 0.5 + 1e-12))
            # center strictly inside [lo, hi): center = ox + (c+.5)*xres
            while c_first <= c_last and ox + (c_first + 0.5) * xres < lo:
                c_first += 1
            while c_last >= c_first and ox + (c_last + 0.5) * xres >= hi:
                c_last -= 1
            if c_last >= c_first:
                out[r, max(0, c_first):min(cols, c_last + 1)] = True
    return out


def rasterize(
    features: list[tuple[float, list[Ring]]],
    transform: tuple[float, float, float, float],
    shape: tuple[int, int],
    method: str = "value",
    fill: float = 0.0,
    dtype: str = "float64",
) -> np.ndarray:
    """Burn ordered features into a tile array.

    ``method='value'``: sequential burn, last feature wins per pixel
    (callers pre-sort by the ORDER BY field). ``method='count'``: each
    feature adds 1 to covered pixels.
    """
    out = np.full(shape, fill, dtype=dtype)
    for value, rings in features:
        mask = polygon_mask(rings, transform, shape)
        if method == "count":
            out[mask] += 1
        else:
            out[mask] = value
    return out


def rasterize_keyed(
    features: list[tuple[float, int, list[Ring]]],
    transform: tuple[float, float, float, float],
    shape: tuple[int, int],
    fill: float = 0.0,
    dtype: str = "float64",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Last-wins burn that ALSO records per pixel the winning feature's
    sort key ``(value, feature_id)`` — the salted-skew building block.

    ``features`` = pre-sorted ``(value, feature_id, rings)`` in paint
    order. Because last-wins under a total order is an argmax, partial
    burns over disjoint feature subsets merge exactly by comparing keys
    (:func:`merge_keyed`) — the commutative reformulation that lets a
    pathological window (millions of features) split across tasks.
    Returns ``(burned, key_value, key_fid)``; ``key_fid == -1`` marks
    pixels no feature covered.
    """
    out = np.full(shape, fill, dtype=dtype)
    kv = np.zeros(shape, dtype="float64")
    kf = np.full(shape, -1, dtype="int64")
    for value, fid, rings in features:
        mask = polygon_mask(rings, transform, shape)
        out[mask] = value
        kv[mask] = value
        kf[mask] = fid
    return out, kv, kf


def merge_keyed(
    partials: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    shape: tuple[int, int],
    fill: float = 0.0,
    dtype: str = "float64",
    descending: bool = False,
) -> np.ndarray:
    """Merge keyed partial burns: per pixel, the partial whose key is
    maximal in paint order wins (value asc/desc, feature_id asc — the
    reference's ``ORDER BY {field}`` + sequential paint, commutatively).
    """
    out = np.full(shape, fill, dtype=dtype)
    kv = np.zeros(shape, dtype="float64")
    kf = np.full(shape, -1, dtype="int64")
    for v, pkv, pkf in partials:
        covered = pkf >= 0
        if descending:
            better = (pkv < kv) | ((pkv == kv) & (pkf > kf))
        else:
            better = (pkv > kv) | ((pkv == kv) & (pkf > kf))
        take = covered & ((kf < 0) | better)
        out[take] = v[take]
        kv[take] = pkv[take]
        kf[take] = pkf[take]
    return out

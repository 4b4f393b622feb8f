"""Exact polygon geometry without shapely (G2/G3/G4, ROADMAP gap 3).

The reference leans on external geometry engines for its three set ops:
feature-to-tile clipping happens in PostGIS (``ST_Intersection``,
``gfw_pixetl/tiles/vector_src_tile.py:44-63``), footprint union happens
in shapely (``unary_union``, ``gfw_pixetl/utils/geometry.py:41-48``),
and areas are implicit. Neither PostGIS nor shapely exists in this
engine's runtime, but it never needs the general case: every clip
region the engine produces is an axis-aligned rectangle (tiles,
windows, bboxes), and every footprint is a rectangle too. For that
restricted domain all three ops have exact, dependency-free forms:

- **Clip** (G3): Sutherland–Hodgman against the four half-planes of a
  box. Correct for arbitrary — including non-convex — subject
  polygons, because the *clip* region is convex; NumPy per ring.
  Holes clip independently: ``hole ⊆ outer`` implies
  ``hole ∩ box ⊆ outer ∩ box``, so signed-area semantics survive.
- **Area** (shoelace): a JVM-side column expression over the
  engine-native ``array<array<array<double>>>`` ring encoding —
  whole-stage-codegen'd, no Python in the hot path.
- **Union area** (G4): rectilinear union via coordinate compression —
  a declarative DataFrame plan (distinct edges → interval grid →
  coverage semi-join → sum), no sweep-line state, no geometry lib.

Scale notes: the clip kernel is a narrow per-row map (no shuffle); the
shoelace area is pure codegen; the union-area plan shuffles only the
O(n) distinct coordinates (broadcast back), and its cell/rect coverage
join is an interval join that AQE handles like the tile⋈file range
join (G1). HOF lambdas below bind arrays as *arguments* (zip_with /
slice), never capture computed arrays in lambda bodies — interpreted
HOFs re-evaluate captured expressions per element.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "clip_ring_to_box",
    "clip_polygon_to_box",
    "clip_to_box_udf",
    "clip_ring_to_convex",
    "clip_polygon_to_convex",
    "ear_clip_triangulate",
    "clip_polygon_to_polygon",
    "clip_to_polygon_udf",
    "pieces_area_col",
    "ring_signed_area",
    "polygon_signed_area",
    "signed_area_col",
    "area_col",
    "point_in_polygon_col",
    "rect_union_area",
]


# ---------------------------------------------------------------------------
# NumPy kernels (used inside pandas UDFs / the rasterize path)
# ---------------------------------------------------------------------------

def _clip_halfplane(pts: np.ndarray, inside: np.ndarray,
                    axis: int, bound: float) -> np.ndarray:
    """One Sutherland–Hodgman pass against the line ``coord[axis] ==
    bound``; ``inside`` flags the vertices to keep."""
    n = len(pts)
    if n == 0:
        return pts
    out: list[np.ndarray] = []
    prev = pts[-1]
    prev_in = inside[-1]
    for i in range(n):
        cur = pts[i]
        cur_in = inside[i]
        if cur_in:
            if not prev_in:
                out.append(_intersect(prev, cur, axis, bound))
            out.append(cur)
        elif prev_in:
            out.append(_intersect(prev, cur, axis, bound))
        prev, prev_in = cur, cur_in
    return np.array(out, dtype=np.float64) if out else np.empty((0, 2))


def _intersect(p: np.ndarray, q: np.ndarray, axis: int, bound: float) -> np.ndarray:
    """Point where segment p→q crosses the line ``coord[axis] == bound``."""
    t = (bound - p[axis]) / (q[axis] - p[axis])
    return p + t * (q - p)


def clip_ring_to_box(ring: np.ndarray, left: float, bottom: float,
                     right: float, top: float) -> np.ndarray:
    """Clip one ring (``(n, 2)`` float array, open — no repeated closing
    point) to an axis-aligned box. Returns the clipped ring, possibly
    empty. Winding (and hence signed area sign) is preserved."""
    try:
        pts = np.asarray(ring, dtype=np.float64)
    except ValueError:
        # Arrow hands list<list<double>> in as an object array of
        # per-point arrays; stack explicitly
        pts = np.stack([np.asarray(p, dtype=np.float64) for p in ring])
    if pts.ndim != 2 or len(pts) == 0:
        return np.empty((0, 2))
    if len(pts) > 1 and (pts[0] == pts[-1]).all():
        pts = pts[:-1]  # accept closed rings too
    for axis, bound, keep_le in (
        (0, left, False), (0, right, True), (1, bottom, False), (1, top, True),
    ):
        if len(pts) == 0:
            break
        coord = pts[:, axis]
        inside = coord <= bound if keep_le else coord >= bound
        pts = _clip_halfplane(pts, inside, axis, bound)
    return pts


def clip_polygon_to_box(rings, left: float, bottom: float,
                        right: float, top: float) -> list[np.ndarray]:
    """Clip every ring of a polygon independently (valid because the box
    is convex — see module docstring). Empty rings are dropped; an empty
    list means no intersection."""
    out = []
    for ring in rings:
        clipped = clip_ring_to_box(np.asarray(ring), left, bottom, right, top)
        if len(clipped) >= 3:
            out.append(clipped)
    return out


def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area of one open ring: positive CCW, negative CW."""
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) < 3:
        return 0.0
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def polygon_signed_area(rings) -> float:
    """Sum of ring signed areas. With the usual convention (outer CCW,
    holes CW) this is the polygon's area; ``abs`` gives winding-agnostic
    area for hole-free polygons."""
    return float(sum(ring_signed_area(r) for r in rings))


def clip_to_box_udf(left: float, bottom: float, right: float, top: float):
    """Pandas-UDF factory: clip the engine-native geometry column
    (``array<array<array<double>>>``) to a fixed box — the engine-side
    analog of the reference's per-tile ``ST_Intersection`` pushdown
    (``tiles/vector_src_tile.py:44-63``) for features already in
    Parquet. Narrow Arrow-batched map, no shuffle."""

    @F.pandas_udf("array<array<array<double>>>")
    def _clip(geoms: pd.Series) -> pd.Series:
        return geoms.apply(
            lambda rings: [
                r.tolist()
                for r in clip_polygon_to_box(rings, left, bottom, right, top)
            ]
        )

    return _clip


# ---------------------------------------------------------------------------
# General polygon ∩ polygon (G3 closed: non-rectangular AOIs)
#
# The reference gets arbitrary-AOI clipping from PostGIS ST_Intersection
# (``gfw_pixetl/tiles/vector_src_tile.py:44-63``) / shapely
# (``utils/utils.py:187-225``). Dependency-free strategy here:
#   1. ear-clip triangulate the AOI once on the driver (AOIs are small
#      constants — a query region, not data);
#   2. Sutherland–Hodgman each subject polygon against each triangle
#      (convex clip ⇒ S–H is exact for arbitrary, even non-convex,
#      subjects) inside the Arrow-batched kernel;
#   3. the pieces are interior-disjoint by construction, so their areas
#      ADD — union/area semantics need no boolean-ops engine.
# This avoids the degenerate-intersection minefield of Greiner–Hormann
# while staying exact for simple (hole-free) AOIs of any shape.
# ---------------------------------------------------------------------------

def clip_ring_to_convex(ring, clip_pts: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman against an arbitrary convex clip polygon.

    ``clip_pts``: ``(k, 2)`` CCW convex ring (open). Generalizes
    ``clip_ring_to_box`` from axis-aligned half-planes to arbitrary edge
    half-planes: a point p is inside edge (a, b) iff
    ``cross(b - a, p - a) >= 0`` for CCW winding.
    """
    try:
        pts = np.asarray(ring, dtype=np.float64)
    except ValueError:
        pts = np.stack([np.asarray(p, dtype=np.float64) for p in ring])
    if pts.ndim != 2 or len(pts) == 0:
        return np.empty((0, 2))
    if len(pts) > 1 and (pts[0] == pts[-1]).all():
        pts = pts[:-1]
    clip_pts = np.asarray(clip_pts, dtype=np.float64)
    k = len(clip_pts)
    for e in range(k):
        if len(pts) == 0:
            break
        a, b = clip_pts[e], clip_pts[(e + 1) % k]
        ex, ey = b[0] - a[0], b[1] - a[1]
        out: list = []
        prev = pts[-1]
        prev_in = ex * (prev[1] - a[1]) - ey * (prev[0] - a[0]) >= 0
        for i in range(len(pts)):
            cur = pts[i]
            cur_in = ex * (cur[1] - a[1]) - ey * (cur[0] - a[0]) >= 0
            if cur_in != prev_in:
                # segment crosses the edge line: solve for t on prev→cur
                dx, dy = cur[0] - prev[0], cur[1] - prev[1]
                denom = ex * dy - ey * dx
                t = (ey * (prev[0] - a[0]) - ex * (prev[1] - a[1])) / denom
                out.append(prev + t * (cur - prev))
            if cur_in:
                out.append(cur)
            prev, prev_in = cur, cur_in
        pts = (
            np.array(out, dtype=np.float64) if out else np.empty((0, 2))
        )
    return pts


def clip_polygon_to_convex(rings, clip_pts) -> list[np.ndarray]:
    """Clip every ring independently against a convex region (valid for
    the same reason as the box case: the clip region is convex)."""
    out = []
    for ring in rings:
        clipped = clip_ring_to_convex(ring, clip_pts)
        if len(clipped) >= 3:
            out.append(clipped)
    return out


def ear_clip_triangulate(ring) -> list[np.ndarray]:
    """Ear-clipping triangulation of a simple (non-self-intersecting,
    hole-free) polygon ring. O(n^2) — intended for small driver-side AOI
    constants, not data-scale geometry. Returns ``(3, 2)`` arrays whose
    areas sum to the polygon area."""
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) > 1 and (pts[0] == pts[-1]).all():
        pts = pts[:-1]
    if len(pts) < 3:
        return []
    if ring_signed_area(pts) < 0:  # normalize to CCW
        pts = pts[::-1]
    idx = list(range(len(pts)))
    tris: list[np.ndarray] = []

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    guard = 0
    while len(idx) > 3 and guard < 10000:
        guard += 1
        n = len(idx)
        for ii in range(n):
            i0, i1, i2 = idx[ii - 1], idx[ii], idx[(ii + 1) % n]
            a, b, c = pts[i0], pts[i1], pts[i2]
            if cross(a, b, c) <= 0:  # reflex or degenerate corner
                continue
            # ear test: no other vertex inside OR on the boundary of
            # triangle abc (boundary counts — a reflex vertex exactly on
            # the ear's diagonal would make the diagonal cross the
            # polygon interior and the triangulation overlap)
            ok = True
            for jj in idx:
                if jj in (i0, i1, i2):
                    continue
                p = pts[jj]
                if any((p == v).all() for v in (a, b, c)):
                    continue  # duplicate coordinate, not a blocker
                if (
                    cross(a, b, p) >= 0
                    and cross(b, c, p) >= 0
                    and cross(c, a, p) >= 0
                ):
                    ok = False
                    break
            if ok:
                tris.append(np.array([a, b, c]))
                del idx[ii]
                break
        else:
            # No ear found: the ring is degenerate or self-intersecting.
            # Tolerate ONLY zero-area leftovers (collinear runs); a
            # partial triangulation with remaining area would silently
            # undercount every downstream clip, so fail loudly instead.
            leftover = abs(ring_signed_area(pts[idx]))
            if leftover > 1e-12 * max(1.0, abs(ring_signed_area(pts))):
                raise ValueError(
                    f"ear clipping stalled with {len(idx)} vertices and "
                    f"area {leftover:g} untriangulated — is the AOI ring "
                    "simple (non-self-intersecting)?"
                )
            break
    if guard >= 10000 and len(idx) > 3:
        raise ValueError(
            f"ear clipping exceeded the iteration guard with {len(idx)} "
            "vertices remaining — AOI too large or degenerate"
        )
    if len(idx) == 3:
        tris.append(np.array([pts[idx[0]], pts[idx[1]], pts[idx[2]]]))
    return tris


def clip_polygon_to_polygon(rings, aoi_ring) -> list[list[np.ndarray]]:
    """General clip: subject polygon (arbitrary rings) ∩ simple AOI
    polygon. Returns a list of clipped *pieces* (each a ring list), one
    per AOI triangle with non-empty intersection. Pieces are
    interior-disjoint, so ``sum(polygon_signed_area(p))`` is the exact
    intersection area (outer-CCW/holes-CW subjects)."""
    pieces = []
    for tri in ear_clip_triangulate(aoi_ring):
        clipped = clip_polygon_to_convex(rings, tri)
        if clipped:
            pieces.append(clipped)
    return pieces


def clip_to_polygon_udf(aoi_ring):
    """Pandas-UDF factory: general AOI clip over the engine-native
    geometry column. Emits multipolygon pieces
    (``array<array<array<array<double>>>>``); the AOI triangulation is
    computed once at plan time and closed over (broadcast with the
    serialized UDF). Narrow map, no shuffle."""
    tris = [t.tolist() for t in ear_clip_triangulate(aoi_ring)]

    @F.pandas_udf("array<array<array<array<double>>>>")
    def _clip(geoms: pd.Series) -> pd.Series:
        tri_arrs = [np.asarray(t) for t in tris]

        def one(rings):
            pieces = []
            for tri in tri_arrs:
                clipped = clip_polygon_to_convex(rings, tri)
                if clipped:
                    pieces.append([r.tolist() for r in clipped])
            return pieces

        return geoms.apply(one)

    return _clip


def pieces_area_col(pieces: Column) -> Column:
    """Total area of disjoint multipolygon pieces (the
    ``clip_to_polygon_udf`` output) — JVM-side shoelace per piece,
    summed. Signed per piece so hole rings subtract, |.| per piece so
    winding of the piece itself doesn't matter."""
    per_piece = F.transform(pieces, lambda p: F.abs(signed_area_col(p)))
    return F.aggregate(per_piece, F.lit(0.0), lambda acc, x: acc + x)


# ---------------------------------------------------------------------------
# JVM-side shoelace (column expression — stays in whole-stage codegen)
# ---------------------------------------------------------------------------

def _ring_signed_area_col(ring: Column) -> Column:
    # rotate-by-one as a slice/concat *argument* to zip_with (never
    # capture the rotated array inside the lambda body — interpreted
    # HOFs would rebuild it per element)
    rot = F.concat(F.slice(ring, 2, F.size(ring) - 1), F.slice(ring, 1, 1))
    cross = F.zip_with(ring, rot, lambda p, q: p[0] * q[1] - q[0] * p[1])
    return F.aggregate(cross, F.lit(0.0), lambda acc, x: acc + x) / 2


def signed_area_col(geom: Column) -> Column:
    """Shoelace signed area of ``array<array<array<double>>>`` geometry
    (sum over rings). Pure column math — no UDF, no shuffle."""
    areas = F.transform(geom, _ring_signed_area_col)
    return F.aggregate(areas, F.lit(0.0), lambda acc, x: acc + x)


def area_col(geom: Column) -> Column:
    """Winding-agnostic absolute area (hole-free polygons, or
    consistently wound outer-CCW/holes-CW polygons)."""
    return F.abs(signed_area_col(geom))


def point_in_polygon_col(px: Column, py: Column, geom: Column) -> Column:
    """Even-odd (crossing-number) point-in-polygon test as a pure column
    expression — works for arbitrary non-convex polygons, and holes fall
    out naturally (a point inside a hole crosses an even total).

    The per-edge lambda only captures the two scalar point columns (px,
    py) — cheap per-row references, not recomputed arrays — and the
    rotated ring binds as a zip_with *argument*, so the interpreted-HOF
    re-evaluation trap doesn't apply. A horizontal edge fails the
    straddle test, and SQL's ``false AND null = false`` absorbs the
    0/0-division NaN its slope term would produce.

    This is the scale path for zonal statistics: broadcast the zone
    table, PIP-filter the pixel stream map-side (whole-stage codegen),
    aggregate per zone — the pixel side never shuffles until the final
    per-zone combine.
    """

    def ring_crossings(ring: Column) -> Column:
        rot = F.concat(F.slice(ring, 2, F.size(ring) - 1), F.slice(ring, 1, 1))
        hits = F.zip_with(
            ring, rot,
            lambda p, q: (
                ((p[1] > py) != (q[1] > py))
                & (px < (q[0] - p[0]) * (py - p[1]) / (q[1] - p[1]) + p[0])
            ).cast("int"),
        )
        return F.aggregate(hits, F.lit(0), lambda acc, x: acc + x)

    total = F.aggregate(
        F.transform(geom, ring_crossings), F.lit(0), lambda acc, x: acc + x
    )
    return total % 2 == 1


# ---------------------------------------------------------------------------
# Rectilinear union area (G4 exact, declarative)
# ---------------------------------------------------------------------------

def rect_union_area(rects: DataFrame, left: str = "left", bottom: str = "bottom",
                    right: str = "right", top: str = "top") -> DataFrame:
    """Exact area of the union of axis-aligned rectangles — the measure
    the reference gets from ``unary_union`` over tile footprints
    (``utils/geometry.py:41-48``), computed relationally:

    1. distinct x edges → consecutive-pair intervals (lead window);
       same for y — the coordinate-compressed grid;
    2. cell ⋈ rect on containment (a cell is covered iff its
       midpoint-free interval lies inside some rect — intervals never
       straddle an edge by construction);
    3. distinct covered cells → sum of cell areas.

    Returns a 1-row DataFrame ``[union_area double]``. The edge tables
    are O(#rects) and broadcast; the coverage join is the only shuffle.
    """
    r = rects.select(
        F.col(left).cast("double").alias("l"),
        F.col(bottom).cast("double").alias("b"),
        F.col(right).cast("double").alias("r"),
        F.col(top).cast("double").alias("t"),
    ).filter((F.col("l") < F.col("r")) & (F.col("b") < F.col("t")))

    from pyspark.sql import Window

    wx = Window.orderBy("x")
    xs = (
        r.select(F.col("l").alias("x")).union(r.select(F.col("r")))
        .distinct()
        .select("x", F.lead("x").over(wx).alias("x2"))
        .filter(F.col("x2").isNotNull())
    )
    wy = Window.orderBy("y")
    ys = (
        r.select(F.col("b").alias("y")).union(r.select(F.col("t")))
        .distinct()
        .select("y", F.lead("y").over(wy).alias("y2"))
        .filter(F.col("y2").isNotNull())
    )
    cells = F.broadcast(xs).crossJoin(F.broadcast(ys))
    # non-equi semi-join: broadcast the rects (O(n), same order as the
    # edge tables) so the cell side streams through a nested-loop probe
    # instead of shuffling the O(n^2) cell grid
    covered = (
        cells.join(
            F.broadcast(r),
            (F.col("x") >= F.col("l")) & (F.col("x2") <= F.col("r"))
            & (F.col("y") >= F.col("b")) & (F.col("y2") <= F.col("t")),
            "leftsemi",
        )
    )
    return covered.agg(
        F.coalesce(
            F.sum((F.col("x2") - F.col("x")) * (F.col("y2") - F.col("y"))),
            F.lit(0.0),
        ).alias("union_area")
    )

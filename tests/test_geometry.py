"""Exact-geometry kernels (functions/geometry.py): Sutherland–Hodgman
clip, shoelace area (NumPy + JVM column twin), rectilinear union.

The harness oracles (q76-q78) only cover closed-form-able inputs
(triangles, rectangles); these tests pin the general cases — non-convex
rings, holes, degenerate touches — against hand-computed values.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gfw_pixetl_spark.functions.geometry import (
    area_col,
    clip_polygon_to_box,
    clip_ring_to_box,
    polygon_signed_area,
    rect_union_area,
    ring_signed_area,
    signed_area_col,
)

SQ = [[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]]  # CCW, area 4
L = [[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]]  # CCW, area 3


def test_shoelace_signs_and_closed_ring():
    assert ring_signed_area(np.array(SQ)) == 4.0
    assert ring_signed_area(np.array(SQ[::-1])) == -4.0  # CW negative
    closed = np.array(SQ + [SQ[0]])
    assert ring_signed_area(clip_ring_to_box(closed, -1, -1, 3, 3)) == 4.0


def test_clip_nonconvex_L():
    # L ∩ [0.5,3]×[0.5,3] = [0.5,2]×[0.5,1] ∪ [0.5,1]×[1,2] → 1.25
    c = clip_ring_to_box(np.array(L, float), 0.5, 0.5, 3, 3)
    assert ring_signed_area(c) == pytest.approx(1.25)


def test_clip_preserves_winding():
    c = clip_ring_to_box(np.array(L[::-1], float), 0.5, 0.5, 3, 3)
    assert ring_signed_area(c) == pytest.approx(-1.25)


def test_clip_polygon_with_hole():
    outer = [[0, 0], [4, 0], [4, 4], [0, 4]]
    hole = [[1, 1], [1, 2], [2, 2], [2, 1]]  # CW (subtracts)
    assert polygon_signed_area([outer, hole]) == 15.0
    cl = clip_polygon_to_box([outer, hole], 0, 0, 2, 4)
    assert polygon_signed_area(cl) == pytest.approx(7.0)  # 8 - 1


def test_clip_disjoint_and_touching():
    outer = [[0, 0], [4, 0], [4, 4], [0, 4]]
    assert clip_polygon_to_box([outer], 10, 10, 12, 12) == []
    # sharing only an edge → zero-area sliver or nothing
    assert polygon_signed_area(
        clip_polygon_to_box([outer], 4, 0, 8, 4)
    ) == pytest.approx(0.0)


def test_clip_fully_inside_identity():
    c = clip_ring_to_box(np.array(SQ, float), -10, -10, 10, 10)
    assert ring_signed_area(c) == 4.0


def test_signed_area_col_matches_numpy(spark):
    rows = [
        (1, [SQ]),
        (2, [[list(map(float, p)) for p in L]]),
        (3, [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]],
             [[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0]]]),
    ]
    df = spark.createDataFrame(
        rows, "id int, geom array<array<array<double>>>"
    )
    got = {
        r.id: r.a
        for r in df.select(
            "id", signed_area_col(F.col("geom")).alias("a")
        ).collect()
    }
    assert got[1] == 4.0
    assert got[2] == 3.0
    assert got[3] == 15.0
    # abs twin
    neg = spark.createDataFrame(
        [(1, [[list(map(float, p)) for p in SQ[::-1]]])],
        "id int, geom array<array<array<double>>>",
    )
    assert neg.select(area_col(F.col("geom")).alias("a")).first().a == 4.0


def test_rect_union_area(spark):
    # two overlapping squares + one disjoint: 4 + 4 - 1 + 1 = 8
    rects = spark.createDataFrame(
        [
            (0.0, 0.0, 2.0, 2.0),
            (1.0, 1.0, 3.0, 3.0),
            (10.0, 10.0, 11.0, 11.0),
            (5.0, 5.0, 5.0, 9.0),  # degenerate, ignored
        ],
        "left double, bottom double, right double, top double",
    )
    assert rect_union_area(rects).first().union_area == 8.0


def test_rect_union_area_empty(spark):
    rects = spark.createDataFrame(
        [], "left double, bottom double, right double, top double"
    )
    assert rect_union_area(rects).first().union_area == 0.0


def test_point_in_polygon_col_nonconvex_and_hole(spark):
    from gfw_pixetl_spark.functions.geometry import point_in_polygon_col
    from pyspark.sql import functions as F

    L_GEOM = [[list(map(float, p)) for p in L]]
    HOLED = [
        [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]],
        [[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0]],
    ]
    rows = [
        (1.5, 0.5, L_GEOM, True),    # lower arm of the L
        (1.5, 1.5, L_GEOM, False),   # notch of the L
        (0.5, 1.5, L_GEOM, True),    # upper arm
        (3.0, 3.0, HOLED, True),     # inside outer
        (1.5, 1.5, HOLED, False),    # inside the hole
        (5.0, 5.0, HOLED, False),    # outside
    ]
    df = spark.createDataFrame(
        rows, "x double, y double, geom array<array<array<double>>>, want boolean"
    )
    got = df.select(
        point_in_polygon_col(F.col("x"), F.col("y"), F.col("geom")).alias("p"),
        "want",
    ).collect()
    assert all(r.p == r.want for r in got)


# ---------------------------------------------------------------------------
# General polygon ∩ polygon (triangulated-AOI clip)
# ---------------------------------------------------------------------------

from gfw_pixetl_spark.functions.geometry import (  # noqa: E402
    clip_polygon_to_convex,
    clip_polygon_to_polygon,
    clip_ring_to_convex,
    clip_to_polygon_udf,
    ear_clip_triangulate,
    pieces_area_col,
)


def _pieces_area(pieces):
    return sum(abs(polygon_signed_area(p)) for p in pieces)


def test_convex_clip_matches_box_clip():
    # a box expressed as a convex clip ring reproduces the box kernel
    box_ring = np.array([[0.5, 0.5], [3.0, 0.5], [3.0, 3.0], [0.5, 3.0]])
    a = clip_ring_to_box(np.array(L, float), 0.5, 0.5, 3, 3)
    b = clip_ring_to_convex(np.array(L, float), box_ring)
    assert ring_signed_area(a) == pytest.approx(ring_signed_area(b))


def test_convex_clip_triangle_region():
    # SQ (area 4) ∩ triangle {(0,0),(2,0),(0,2)} = that triangle, area 2
    tri = np.array([[0.0, 0.0], [2.0, 0.0], [0.0, 2.0]])
    c = clip_ring_to_convex(np.array(SQ, float), tri)
    assert ring_signed_area(c) == pytest.approx(2.0)


def test_ear_clip_areas_sum():
    for ring in (SQ, L, [[0, 0], [4, 0], [4, 3], [2, 1], [0, 3]]):
        tris = ear_clip_triangulate(np.array(ring, float))
        total = sum(ring_signed_area(t) for t in tris)
        assert total == pytest.approx(ring_signed_area(np.array(ring, float)))
        assert all(ring_signed_area(t) > 0 for t in tris)


def test_general_clip_nonconvex_aoi():
    # AOI = L (non-convex, area 3); subject = unit square at (0.5, 0.5).
    # Intersection: the square minus the quadrant above/right of (1,1)
    # → 1 - 0.25 = 0.75
    subject = [[[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5]]]
    pieces = clip_polygon_to_polygon(subject, np.array(L, float))
    assert _pieces_area(pieces) == pytest.approx(0.75)


def test_general_clip_with_hole_subject():
    # subject = SQ with a 1x1 hole at the center ([0.5,1.5]^2), clipped
    # by the half-square triangle {(0,0),(2,0),(2,2)}: area = (4-1)/2
    hole = [[0.5, 0.5], [0.5, 1.5], [1.5, 1.5], [1.5, 0.5]]  # CW
    tri = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0]])
    pieces = clip_polygon_to_polygon([SQ, hole], tri)
    total = sum(polygon_signed_area(p) for p in pieces)
    assert total == pytest.approx(1.5)


def test_general_clip_disjoint():
    subject = [[[10.0, 10.0], [11.0, 10.0], [11.0, 11.0], [10.0, 11.0]]]
    pieces = clip_polygon_to_polygon(subject, np.array(L, float))
    assert _pieces_area(pieces) == pytest.approx(0.0)


def test_clip_to_polygon_udf_roundtrip(spark):
    rows = [
        ([[[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5]]],),
        ([[[10.0, 10.0], [11.0, 10.0], [11.0, 11.0], [10.0, 11.0]]],),
    ]
    df = spark.createDataFrame(rows, "geom array<array<array<double>>>")
    aoi = np.array(L, float)
    out = df.select(
        pieces_area_col(clip_to_polygon_udf(aoi)(F.col("geom"))).alias("a")
    ).collect()
    assert out[0].a == pytest.approx(0.75)
    assert out[1].a == pytest.approx(0.0)


def test_ear_clip_collinear_leftover_tolerated():
    """The loud-fail path tolerates zero-area leftovers (collinear
    runs) — a straight-line 'ring' returns no triangles, no raise."""
    from gfw_pixetl_spark.functions.geometry import ear_clip_triangulate

    line = [[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0], [0.0, 0.0]]
    assert ear_clip_triangulate(line) == []

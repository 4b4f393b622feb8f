"""Property-based invariants (hypothesis) for the deterministic kernels:
grid math, bucket math, rasterization vs a naive point-in-polygon
reference. These guard the bit-stability requirements of SURVEY §7.4
(alignment, deterministic tie-breaks) across the whole input space, not
just the reference's fixed vectors."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gfw_pixetl_spark.functions.rasterize_kernel import polygon_mask
from gfw_pixetl_spark.grids import LatLngGrid, WebMercatorGrid
from gfw_pixetl_spark.operators.stats import bucket_expr  # noqa: F401 (api)

GRIDS = [LatLngGrid(10, 160), LatLngGrid(8, 160), LatLngGrid(90, 1008)]


@settings(max_examples=200, deadline=None)
@given(
    gi=st.integers(0, len(GRIDS) - 1),
    # subnormals excluded: x/width underflows to -0.0 for |x| < ~1e-323,
    # flipping floor() to the adjacent lattice line (the reference's float
    # math does the same; it is a measure-zero boundary artifact)
    x=st.floats(-179.999, 179.999, allow_subnormal=False),
    y=st.floats(-79.999, 79.999, allow_subnormal=False),
)
def test_point_falls_inside_its_tile(gi, x, y):
    g = GRIDS[gi]
    tid = g.xy_to_tile_id(x, y)
    bb = g.get_tile_bounds(tid)
    # the reference's origin snap assigns boundary points to the tile
    # whose interior is below/right of the lattice line, so membership is
    # half-open on both axes with a top-left bias
    assert bb.left <= x <= bb.right
    assert bb.bottom <= y <= bb.top
    assert bb.right - bb.left == g.width


@settings(max_examples=100, deadline=None)
@given(
    zoom=st.integers(8, 14),
    r=st.integers(0, 15),
    c=st.integers(0, 15),
)
def test_wm_tiles_partition_exactly(zoom, r, c):
    g = WebMercatorGrid(zoom)
    side = int(g.nb_tiles ** 0.5)
    r, c = r % side, c % side
    bb = g.get_tile_bounds(f"{r:03d}R_{c:03d}C")
    # adjacent tiles share edges bit-for-bit (no float drift)
    if c + 1 < side:
        right = g.get_tile_bounds(f"{r:03d}R_{c + 1:03d}C")
        assert bb.right == right.left
    if r + 1 < side:
        below = g.get_tile_bounds(f"{r + 1:03d}R_{c:03d}C")
        assert bb.bottom == below.top


def _naive_mask(rings, transform, shape):
    """Reference implementation: per-pixel even-odd ray cast."""
    ox, oy, xres, yres = transform
    rows, cols = shape
    out = np.zeros(shape, dtype=bool)
    segs = []
    for ring in rings:
        pts = list(ring)
        if pts[0] != pts[-1]:
            pts.append(pts[0])
        segs += list(zip(pts[:-1], pts[1:]))
    for r in range(rows):
        cy = oy - (r + 0.5) * yres
        for c in range(cols):
            cx = ox + (c + 0.5) * xres
            inside = False
            for (x0, y0), (x1, y1) in segs:
                if (min(y0, y1) <= cy < max(y0, y1)):
                    xx = x0 + (cy - y0) / (y1 - y0) * (x1 - x0)
                    if cx >= xx:
                        continue
                    inside = not inside
            if inside:
                out[r, c] = True
    return out


coord = st.floats(0.0, 8.0).map(lambda v: round(v, 2))


@settings(max_examples=60, deadline=None)
@given(
    x0=coord, y0=coord, w=st.floats(0.3, 6.0), h=st.floats(0.3, 6.0),
)
def test_rasterize_matches_naive_for_rects(x0, y0, w, h):
    rings = [[(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h),
              (x0, y0)]]
    T = (0.0, 8.0, 1.0, 1.0)
    got = polygon_mask(rings, T, (8, 8))
    want = _naive_mask(rings, T, (8, 8))
    np.testing.assert_array_equal(got, want)


@settings(max_examples=40, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.floats(0.2, 7.8), st.floats(0.2, 7.8)),
        min_size=3, max_size=6,
    )
)
def test_rasterize_matches_naive_for_convex_hulls(pts):
    # build a star-sorted simple polygon around the centroid
    cx = sum(p[0] for p in pts) / len(pts)
    cy = sum(p[1] for p in pts) / len(pts)
    ordered = sorted(pts, key=lambda p: np.arctan2(p[1] - cy, p[0] - cx))
    ring = [tuple(map(lambda v: round(v, 3), p)) for p in ordered]
    ring.append(ring[0])
    T = (0.0, 8.0, 1.0, 1.0)
    got = polygon_mask([ring], T, (8, 8))
    want = _naive_mask([ring], T, (8, 8))
    np.testing.assert_array_equal(got, want)


@settings(max_examples=100, deadline=None)
@given(
    method=st.sampled_from(["bilinear", "cubic", "lanczos"]),
    const=st.floats(-100, 100, allow_subnormal=False),
    fx=st.floats(1.0, 6.0, allow_subnormal=False),
    fy=st.floats(1.0, 5.0, allow_subnormal=False),
)
def test_warp_kernels_partition_of_unity(method, const, fx, fy):
    """A constant field resamples to the same constant under every
    interpolating kernel at any fractional position (weight
    renormalization => partition of unity holds even near edges)."""
    from gfw_pixetl_spark.functions.warp import sample_grid

    src = np.ma.MaskedArray(
        np.full((7, 8), const, dtype="float64"), mask=np.zeros((7, 8), bool)
    )
    out = sample_grid(
        src, np.array([[fx]]), np.array([[fy]]), method
    )
    assert not out.mask[0, 0]
    np.testing.assert_allclose(out[0, 0], const, atol=1e-9 * max(1, abs(const)))


@settings(max_examples=100, deadline=None)
@given(
    a=st.floats(-5, 5, allow_subnormal=False),
    b=st.floats(-5, 5, allow_subnormal=False),
    c=st.floats(-50, 50, allow_subnormal=False),
    fx=st.floats(2.0, 6.0, allow_subnormal=False),
    fy=st.floats(2.0, 5.0, allow_subnormal=False),
    method=st.sampled_from(["bilinear", "cubic"]),
)
def test_warp_kernels_linear_precision(a, b, c, fx, fy, method):
    """Bilinear and Keys cubic reproduce affine fields exactly away from
    the clamped border."""
    from gfw_pixetl_spark.functions.warp import sample_grid

    jj, ii = np.meshgrid(np.arange(9.0), np.arange(8.0))
    src = np.ma.MaskedArray(a * jj + b * ii + c, mask=np.zeros((8, 9), bool))
    out = sample_grid(src, np.array([[fx]]), np.array([[fy]]), method)
    np.testing.assert_allclose(
        out[0, 0], a * fx + b * fy + c, atol=1e-7
    )


# --- geometry kernel invariants (functions/geometry.py) -------------------

from gfw_pixetl_spark.functions.geometry import (  # noqa: E402
    clip_ring_to_box, ring_signed_area,
)


def _star_ring(jitters, radii) -> np.ndarray:
    """Star-shaped polygon around the origin — always simple, which is
    Sutherland–Hodgman's precondition (hypothesis immediately finds the
    bowtie counterexamples if vertices are drawn freely, and even
    sorted-angle vertices self-intersect once an angular gap exceeds π —
    so angles are equally spaced with sub-half-slot jitter, bounding
    every gap below π for n ≥ 4)."""
    n = len(jitters)
    slot = 2 * np.pi / n
    a = np.arange(n) * slot + np.asarray(jitters, dtype=np.float64) * (
        0.4 * slot
    )
    r = np.asarray(radii[:n], dtype=np.float64)
    return np.stack([r * np.cos(a), r * np.sin(a)], axis=1)


@settings(max_examples=300, deadline=None)
@given(
    jitters=st.lists(
        st.floats(-1, 1, allow_subnormal=False),
        min_size=4, max_size=12,
    ),
    radii=st.lists(
        st.floats(0.1, 50, allow_subnormal=False), min_size=12, max_size=12
    ),
    box=st.tuples(
        st.floats(-40, 20, allow_subnormal=False),
        st.floats(-40, 20, allow_subnormal=False),
        st.floats(1e-6, 60, allow_subnormal=False),
        st.floats(1e-6, 60, allow_subnormal=False),
    ),
)
def test_clip_area_bounds_and_idempotence(jitters, radii, box):
    """|clip(ring)| <= min(|ring|, |box|) up to fp rounding, and clipping
    twice equals clipping once (the clipped ring lies in the box)."""
    ring = _star_ring(jitters, radii)
    left, bottom, w, h = box
    right, top = left + w, bottom + h
    a_ring = abs(ring_signed_area(ring))
    c = clip_ring_to_box(ring, left, bottom, right, top)
    a_clip = abs(ring_signed_area(c))
    eps = 1e-7 * max(1.0, a_ring, w * h)
    assert a_clip <= a_ring + eps
    assert a_clip <= w * h + eps
    c2 = clip_ring_to_box(c, left, bottom, right, top) if len(c) else c
    a_clip2 = abs(ring_signed_area(c2)) if len(c2) else 0.0
    assert abs(a_clip2 - a_clip) <= eps


@settings(max_examples=300, deadline=None)
@given(
    jitters=st.lists(
        st.floats(-1, 1, allow_subnormal=False),
        min_size=4, max_size=10,
    ),
    radii=st.lists(
        st.floats(0.1, 5, allow_subnormal=False), min_size=10, max_size=10
    ),
)
def test_clip_to_containing_box_preserves_area(jitters, radii):
    ring = _star_ring(jitters, radii)
    c = clip_ring_to_box(ring, -100, -100, 100, 100)
    assert abs(ring_signed_area(c) - ring_signed_area(ring)) <= 1e-9


# -- chunking invariants (pure-python replicas of the codegen'd exprs) ----

def _chunk_starts(n: int, size: int = 200, overlap: int = 40) -> list[int]:
    import math

    stride = size - overlap
    k = max(1, math.ceil((n - overlap) / stride))
    return [i * stride for i in range(k)]


@settings(max_examples=300, deadline=None)
@given(n=st.integers(0, 2000))
def test_fixed_stride_chunks_cover_whole_text(n):
    starts = _chunk_starts(n)
    # full coverage: union of [s, s+200) covers [0, n)
    covered = 0
    for s in starts:
        assert s <= covered  # no gap
        covered = max(covered, min(s + 200, max(n, 0)))
    assert covered >= n
    # no fully-redundant chunk: every chunk past the first adds content
    for prev, cur in zip(starts, starts[1:]):
        assert cur > prev and cur < n or (n <= 40)


def _cdc_bounds(text: str) -> list[int]:
    B, W, M = 31, 8, 64
    out = []
    for i in range(W, len(text) + 1):
        h = sum(ord(text[i - 1 - k]) * B**k for k in range(W))
        if h % M == 0:
            out.append(i)
    return out


@settings(max_examples=150, deadline=None)
@given(
    s=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
              min_size=20, max_size=300),
    pos=st.integers(0, 19),
    ins=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                min_size=1, max_size=5),
)
def test_cdc_boundaries_are_edit_local(s, pos, ins):
    """The CDC property: an insertion at ``pos`` leaves boundaries more
    than a window past the edit unchanged (shifted by the insert length)."""
    before = _cdc_bounds(s)
    after = _cdc_bounds(s[:pos] + ins + s[pos:])
    w = 8
    tail_before = [b for b in before if b >= pos + w]
    tail_after = [b - len(ins) for b in after if b - len(ins) >= pos + w]
    assert tail_before == tail_after


def test_cdc_python_replica_matches_spark(spark):
    from gfw_pixetl_spark.functions.text import cdc_boundaries

    texts = ["the quick brown fox jumps over the lazy dog " * 3,
             "aaaaaaaaaaaaaaaaaaaaaaaa", "key agg row scan slow fast"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {}
    for r in cdc_boundaries(df).collect():
        got.setdefault(r.doc_id, []).append(r.boundary_pos)
    for i, t in enumerate(texts):
        assert sorted(got.get(i, [])) == _cdc_bounds(t)

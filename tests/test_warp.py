"""Warp kernel tests: projection math, interpolation exactness, nodata
weight renormalization, and the warped end-to-end pipeline (C4 — the
engine twin of the reference's WarpedVRT path,
gfw_pixetl/tiles/raster_src_tile.py:141-186)."""

from __future__ import annotations

import numpy as np
import pytest

from gfw_pixetl_spark.functions.warp import (
    WarpReader, latlng_to_mercator, mercator_to_latlng, sample_grid,
)
from gfw_pixetl_spark.sources.raster import SyntheticReader, WindowReader
from gfw_pixetl_spark.sources.geotiff import read_tile


class RampReader(WindowReader):
    """value = a*col_index + b*row_index on a fixed lattice — linear in
    world coords, so bilinear and cubic must reproduce it exactly."""

    def __init__(self, xres, yres, a=2.0, b=3.0, ox=-180.0, oy=90.0):
        self.xres, self.yres, self.a, self.b = xres, yres, a, b
        self.ox, self.oy = ox, oy

    def __call__(self, uris, bounds, shape, band_count):
        left, bottom, right, top = bounds
        rows, cols = shape
        c0 = int(round((left - self.ox) / self.xres))
        r0 = int(round((self.oy - top) / self.yres))
        jj, ii = np.meshgrid(
            np.arange(c0, c0 + cols), np.arange(r0, r0 + rows)
        )
        vals = self.a * jj + self.b * ii
        return np.ma.MaskedArray(
            np.stack([vals] * band_count).astype("float64"),
            mask=np.zeros((band_count, rows, cols), dtype=bool),
        )


def test_mercator_roundtrip():
    rng = np.random.default_rng(3)
    lng = rng.uniform(-179, 179, 50)
    lat = rng.uniform(-84, 84, 50)
    x, y = latlng_to_mercator(lng, lat)
    lng2, lat2 = mercator_to_latlng(x, y)
    np.testing.assert_allclose(lng2, lng, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # known anchor: origin maps to origin
    x0, y0 = latlng_to_mercator(np.array([0.0]), np.array([0.0]))
    assert abs(x0[0]) < 1e-9 and abs(y0[0]) < 1e-9


@pytest.mark.parametrize("method", ["nearest", "bilinear", "cubic", "lanczos"])
def test_sample_identity_on_centers(method):
    """Sampling exactly at source pixel centers returns source values."""
    src = np.ma.MaskedArray(
        np.arange(48, dtype="float64").reshape(6, 8),
        mask=np.zeros((6, 8), bool),
    )
    fy, fx = np.meshgrid(np.arange(2.0, 4.0), np.arange(3.0, 6.0),
                         indexing="ij")
    out = sample_grid(src, fx, fy, method)
    np.testing.assert_allclose(out, src[2:4, 3:6], atol=1e-9)


@pytest.mark.parametrize("method", ["bilinear", "cubic"])
def test_sample_linear_exact_at_half_pixels(method):
    """Bilinear and Keys cubic have linear precision: a linear field is
    reproduced exactly at arbitrary fractional positions."""
    jj, ii = np.meshgrid(np.arange(10.0), np.arange(9.0))
    src = np.ma.MaskedArray(2 * jj + 5 * ii, mask=np.zeros((9, 10), bool))
    rng = np.random.default_rng(5)
    fx = rng.uniform(2.0, 7.0, (4, 4))
    fy = rng.uniform(2.0, 6.0, (4, 4))
    out = sample_grid(src, fx, fy, method)
    np.testing.assert_allclose(out, 2 * fx + 5 * fy, atol=1e-9)


def test_sample_nodata_renormalizes_and_masks():
    src = np.ma.MaskedArray(
        np.ones((4, 4), dtype="float64") * 7.0,
        mask=np.zeros((4, 4), bool),
    )
    src.mask[1, 1] = True
    # sampling between (1,1) and neighbors: masked tap's weight drops,
    # remaining taps still average to 7
    out = sample_grid(src, np.array([[1.4]]), np.array([[1.2]]), "bilinear")
    assert not out.mask[0, 0]
    np.testing.assert_allclose(out[0, 0], 7.0, atol=1e-9)
    # fully masked neighborhood -> masked result
    src.mask[:, :] = True
    out2 = sample_grid(src, np.array([[1.5]]), np.array([[1.5]]), "bilinear")
    assert bool(out2.mask[0, 0])


def test_warp_reader_latlng_identity_crs():
    """Same-CRS warp at matching resolution == plain windowed read."""
    inner = RampReader(xres=0.1, yres=0.1)
    warp = WarpReader(
        inner=inner, src_xres=0.1, src_yres=0.1,
        src_crs="EPSG:4326", dst_crs="EPSG:4326", method="bilinear",
    )
    bounds = (0.0, 0.0, 2.0, 2.0)
    direct = inner([], bounds, (20, 20), 1)
    warped = warp([], bounds, (20, 20), 1)
    np.testing.assert_allclose(warped[0], direct[0], atol=1e-9)


def test_warp_reader_wm_from_latlng_matches_analytic():
    """WM destination over a lat/lng linear ramp: each output pixel must
    equal the ramp evaluated at the inverse-projected center."""
    xres = yres = 0.5
    inner = RampReader(xres=xres, yres=yres, a=1.0, b=4.0)
    warp = WarpReader(
        inner=inner, src_xres=xres, src_yres=yres,
        src_crs="EPSG:4326", dst_crs="EPSG:3857", method="bilinear",
    )
    xm0, ym1 = latlng_to_mercator(np.array([10.0]), np.array([20.0]))
    xm1, ym0 = latlng_to_mercator(np.array([30.0]), np.array([40.0]))
    bounds = (xm0[0], ym1[0], xm1[0], ym0[0])
    rows = cols = 32
    out = warp([], bounds, (rows, cols), 1)[0]
    dx = (bounds[2] - bounds[0]) / cols
    dy = (bounds[3] - bounds[1]) / rows
    xs = bounds[0] + (np.arange(cols) + 0.5) * dx
    ys = bounds[3] - (np.arange(rows) + 0.5) * dy
    gx, gy = np.meshgrid(xs, ys)
    lng, lat = mercator_to_latlng(gx, gy)
    fx = (lng - (-180.0)) / xres - 0.5
    fy = (90.0 - lat) / yres - 0.5
    np.testing.assert_allclose(np.asarray(out), 1.0 * fx + 4.0 * fy,
                               atol=1e-7)


def test_warp_pipeline_end_to_end(spark, tmp_path):
    """RasterPipe on a WebMercator grid fed by a lat/lng synthetic source
    through WarpReader(nearest): output equals the synthetic value at
    each inverse-projected pixel center."""
    import json

    from gfw_pixetl_spark.grids import WebMercatorGrid
    from gfw_pixetl_spark.plans import raster_pipe as rp
    from tests.test_raster_pipe import make_layer

    grid = WebMercatorGrid(1)  # single 512x512 tile, 256-px blocks
    src = SyntheticReader(xres=0.5, yres=0.5, mask_value=None)
    warp = WarpReader(
        inner=src, src_xres=0.5, src_yres=0.5,
        src_crs="EPSG:4326", dst_crs="EPSG:3857", method="nearest",
    )
    pipe = rp.RasterPipe(
        layer=make_layer(grid="zoom_1", calc=None, data_type="float64",
                         no_data=None),
        reader=warp, work_dir=str(tmp_path), grid=grid,
    )
    b = grid.bounds
    files = [{"uri": "memory://w", "band": 1, "left": b.left,
              "bottom": b.bottom, "right": b.right, "top": b.top}]
    rows = {r.tile_id: r for r in pipe.run(spark, files).collect()}
    [r] = rows.values()
    assert r.status == "processed"
    arr, profile = read_tile(r.out_path)
    data = arr[0]
    assert profile["crs"] == "EPSG:3857"
    assert data.shape == (512, 512)
    # verify a scattered sample of pixels against the analytic value
    xs = b.left + (np.arange(512) + 0.5) * grid.xres
    ys = b.top - (np.arange(512) + 0.5) * grid.yres
    for rr, cc in [(0, 0), (100, 37), (255, 256), (500, 11), (511, 511)]:
        lng, lat = mercator_to_latlng(np.array([xs[cc]]), np.array([ys[rr]]))
        ci = int(np.rint((lng[0] + 180.0) / 0.5 - 0.5))
        ri = int(np.rint((90.0 - lat[0]) / 0.5 - 0.5))
        assert data[rr, cc] == (ri + ci) % 16


@pytest.mark.parametrize("method", ["cubic_spline", "gauss"])
def test_smoothing_kernels_preserve_flat_fields(method):
    """cubic_spline and gauss are smoothing (non-interpolating) kernels;
    den-normalization must still preserve a constant field exactly."""
    src = np.ma.MaskedArray(
        np.full((8, 8), 42.0), mask=np.zeros((8, 8), bool)
    )
    rng = np.random.default_rng(7)
    fx = rng.uniform(2.0, 5.0, (3, 3))
    fy = rng.uniform(2.0, 5.0, (3, 3))
    out = sample_grid(src, fx, fy, method)
    np.testing.assert_allclose(out, 42.0, atol=1e-12)


def test_cubic_spline_linear_precision():
    """B-splines partition unity and reproduce linear polynomials:
    sum_k B3(x-k)*k == x, so a linear ramp survives the smoothing."""
    jj, ii = np.meshgrid(np.arange(12.0), np.arange(11.0))
    src = np.ma.MaskedArray(3 * jj + 2 * ii, mask=np.zeros((11, 12), bool))
    rng = np.random.default_rng(11)
    fx = rng.uniform(2.0, 9.0, (4, 4))
    fy = rng.uniform(2.0, 8.0, (4, 4))
    out = sample_grid(src, fx, fy, "cubic_spline")
    np.testing.assert_allclose(out, 3 * fx + 2 * fy, atol=1e-9)


def test_cubic_spline_known_weights_at_half_pixel():
    """At a half-pixel offset the 4 taps weigh (1, 23, 23, 1)/48."""
    col = np.ma.MaskedArray(
        np.tile(np.array([0.0, 10.0, 20.0, 30.0]), (4, 1)).T,
        mask=np.zeros((4, 4), bool),
    )
    out = sample_grid(col, np.array([[1.0]]), np.array([[1.5]]), "cubic_spline")
    expected = (1 * 0.0 + 23 * 10.0 + 23 * 20.0 + 1 * 30.0) / 48.0
    np.testing.assert_allclose(out[0, 0], expected, atol=1e-12)


def test_gauss_symmetric_midpoint_and_monotone():
    """Truncated Gaussian is even, so the midpoint of a linear ramp is
    exact; elsewhere the result stays within the neighborhood hull."""
    jj, _ = np.meshgrid(np.arange(10.0), np.arange(10.0))
    src = np.ma.MaskedArray(jj.copy(), mask=np.zeros((10, 10), bool))
    out = sample_grid(src, np.array([[4.5]]), np.array([[5.0]]), "gauss")
    np.testing.assert_allclose(out[0, 0], 4.5, atol=1e-12)
    out2 = sample_grid(src, np.array([[4.25]]), np.array([[5.0]]), "gauss")
    assert 3.0 < out2[0, 0] < 6.0


def test_every_interpolating_enum_value_dispatches():
    """Every interpolating method the models enum accepts must have a
    kernel (r2 verdict #3: gauss/cubic_spline used to fail here)."""
    from gfw_pixetl_spark.functions.warp import INTERPOLATING_METHODS
    from gfw_pixetl_spark.operators.resample import AGG_METHODS
    from gfw_pixetl_spark.models import RESAMPLING_METHODS

    src = np.ma.MaskedArray(np.ones((6, 6)), mask=np.zeros((6, 6), bool))
    for m in INTERPOLATING_METHODS:
        out = sample_grid(src, np.array([[2.5]]), np.array([[2.5]]), m)
        np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-12)
    covered = set(INTERPOLATING_METHODS) | set(AGG_METHODS) | {"mode"}
    missing = [m for m in RESAMPLING_METHODS if m not in covered]
    assert not missing, f"enum values without a kernel: {missing}"

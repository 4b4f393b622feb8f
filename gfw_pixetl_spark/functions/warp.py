"""General warp: reproject + interpolating resample in pure NumPy (C4).

The reference delegates warping to rasterio/GDAL WarpedVRT
(``gfw_pixetl/tiles/raster_src_tile.py:141-186``, resampling kernels
``gfw_pixetl/resampling.py:9-25``). The aggregating kernels (average,
mode, ...) are already Spark aggregations (operators/resample.py); this
module supplies the *interpolating* kernels — nearest, bilinear, cubic,
lanczos — and the EPSG:4326 ↔ EPSG:3857 coordinate math, which is
analytic (spherical Mercator, public formulas), so no GDAL/proj is
needed for the grid catalog this engine ships.

Execution model: :class:`WarpReader` is a :class:`WindowReader` adapter —
it inverse-projects the DESTINATION window's pixel centers into the
source CRS, reads the minimal covering source window through the inner
reader, and convolves. It therefore composes with the unchanged
``RasterPipe``: the per-window kernel stays a small, bounded Arrow batch
regardless of tile size, and reprojection cost parallelizes with the
windows (SURVEY §3.1 scale notes apply verbatim).

Nodata: masked source pixels get kernel weight 0 and the remaining
weights renormalize (GDAL's behavior for masked sources); a destination
pixel with zero total weight is masked.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..sources.raster import WindowReader

R_MAJOR = 6378137.0  # WGS84 spherical-Mercator radius


def latlng_to_mercator(lng: np.ndarray, lat: np.ndarray):
    x = np.radians(np.asarray(lng, dtype="float64")) * R_MAJOR
    y = R_MAJOR * np.log(np.tan(np.pi / 4 + np.radians(
        np.asarray(lat, dtype="float64")) / 2))
    return x, y


def mercator_to_latlng(x: np.ndarray, y: np.ndarray):
    lng = np.degrees(np.asarray(x, dtype="float64") / R_MAJOR)
    lat = np.degrees(
        2 * np.arctan(np.exp(np.asarray(y, dtype="float64") / R_MAJOR))
        - np.pi / 2
    )
    return lng, lat


def _kernel_bilinear(t: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(t))


def _kernel_cubic(t: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic convolution (a = -0.5, GDAL's default cubic)."""
    at = np.abs(t)
    w = np.where(
        at < 1,
        (a + 2) * at**3 - (a + 3) * at**2 + 1,
        np.where(at < 2, a * (at**3 - 5 * at**2 + 8 * at - 4), 0.0),
    )
    return w


def _kernel_lanczos(t: np.ndarray, a: int = 3) -> np.ndarray:
    at = np.abs(t)
    return np.where(at < a, np.sinc(t) * np.sinc(t / a), 0.0)


# method -> (kernel fn, support radius in source pixels)
KERNELS = {
    "bilinear": (_kernel_bilinear, 1),
    "cubic": (_kernel_cubic, 2),
    "lanczos": (_kernel_lanczos, 3),
}
INTERPOLATING_METHODS = ("nearest", *KERNELS)


def sample_grid(
    src: np.ma.MaskedArray,
    fx: np.ndarray,
    fy: np.ndarray,
    method: str = "bilinear",
) -> np.ma.MaskedArray:
    """Sample a 2-D source grid at fractional pixel coords (fx, fy).

    ``fx``/``fy`` are arrays of destination-shaped fractional source
    indices (pixel-center convention: integer value = exactly on a source
    pixel center). Vectorized gather-accumulate over the kernel's
    support; out-of-window taps clamp to the edge (their weight still
    counts — the caller pads the window so real taps exist).
    """
    data = np.ma.getdata(src).astype("float64")
    invalid = np.ma.getmaskarray(src)
    h, w = data.shape
    if method == "nearest":
        ix = np.clip(np.rint(fx).astype("int64"), 0, w - 1)
        iy = np.clip(np.rint(fy).astype("int64"), 0, h - 1)
        return np.ma.MaskedArray(data[iy, ix], mask=invalid[iy, ix])
    kernel, radius = KERNELS[method]
    x0 = np.floor(fx).astype("int64")
    y0 = np.floor(fy).astype("int64")
    num = np.zeros(fx.shape, dtype="float64")
    den = np.zeros(fx.shape, dtype="float64")
    for dy in range(1 - radius, radius + 1):
        iy = np.clip(y0 + dy, 0, h - 1)
        wy = kernel(fy - (y0 + dy))
        for dx in range(1 - radius, radius + 1):
            ix = np.clip(x0 + dx, 0, w - 1)
            wgt = wy * kernel(fx - (x0 + dx))
            wgt = np.where(invalid[iy, ix], 0.0, wgt)
            num += wgt * np.where(invalid[iy, ix], 0.0, data[iy, ix])
            den += wgt
    out = np.divide(num, den, out=np.zeros_like(num), where=den != 0)
    return np.ma.MaskedArray(out, mask=(den == 0))


def _project(xs, ys, src_crs: str, dst_crs: str):
    """Transform coords FROM dst_crs TO src_crs (inverse direction)."""
    s, d = src_crs.upper(), dst_crs.upper()
    if s == d:
        return xs, ys
    if s == "EPSG:4326" and d == "EPSG:3857":
        return mercator_to_latlng(xs, ys)
    if s == "EPSG:3857" and d == "EPSG:4326":
        return latlng_to_mercator(xs, ys)
    raise NotImplementedError(
        f"warp {d} -> {s}: only EPSG:4326 <-> EPSG:3857 is analytic; "
        "other CRS pairs need pyproj/rasterio (not in this runtime)"
    )


@dataclass
class WarpReader(WindowReader):
    """WindowReader adapter: destination-CRS windows over a source-CRS
    reader, with interpolating resample — rasterio's WarpedVRT re-expressed
    so the tile pipeline needs no changes (pass a WebMercator grid and a
    lat/lng source, or vice versa).

    ``src_xres``/``src_yres``/origin describe the source pixel lattice in
    the SOURCE CRS (north-up, origin at top-left).
    """

    inner: WindowReader
    src_xres: float
    src_yres: float
    src_origin_x: float = -180.0
    src_origin_y: float = 90.0
    src_crs: str = "EPSG:4326"
    dst_crs: str = "EPSG:3857"
    method: str = "bilinear"
    pad: int = field(init=False, default=0)

    def __post_init__(self) -> None:
        if self.method not in INTERPOLATING_METHODS:
            raise ValueError(
                f"method must be one of {INTERPOLATING_METHODS}"
            )
        self.pad = 1 if self.method == "nearest" else KERNELS.get(
            self.method, (None, 1)
        )[1]

    def __call__(self, uris, bounds, shape, band_count):
        left, bottom, right, top = bounds
        rows, cols = shape
        dxres = (right - left) / cols
        dyres = (top - bottom) / rows
        xs = left + (np.arange(cols) + 0.5) * dxres
        ys = top - (np.arange(rows) + 0.5) * dyres
        gx, gy = np.meshgrid(xs, ys)
        sx, sy = _project(gx, gy, self.src_crs, self.dst_crs)
        # fractional source pixel indices (center convention)
        fx = (sx - self.src_origin_x) / self.src_xres - 0.5
        fy = (self.src_origin_y - sy) / self.src_yres - 0.5
        x_lo = int(np.floor(fx.min())) - self.pad
        x_hi = int(np.ceil(fx.max())) + self.pad + 1
        y_lo = int(np.floor(fy.min())) - self.pad
        y_hi = int(np.ceil(fy.max())) + self.pad + 1
        src_bounds = (
            self.src_origin_x + x_lo * self.src_xres,
            self.src_origin_y - y_hi * self.src_yres,
            self.src_origin_x + x_hi * self.src_xres,
            self.src_origin_y - y_lo * self.src_yres,
        )
        src = self.inner(
            uris, src_bounds, (y_hi - y_lo, x_hi - x_lo), band_count
        )
        out = np.ma.stack([
            sample_grid(src[b], fx - x_lo, fy - y_lo, self.method)
            for b in range(band_count)
        ])
        return out

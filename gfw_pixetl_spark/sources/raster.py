"""Window readers: the S4 custom-source kernel (SURVEY §2.1).

The reference reads reprojected/resampled windows from a GDAL VRT mosaic
(``gfw_pixetl/tiles/utils/window_utils.py:88-133``). In the Spark engine a
reader is a plain picklable callable invoked inside ``mapInPandas`` on the
executors: ``reader(uris, bounds, shape, band_count) -> np.ma.MaskedArray``
of shape ``(bands, rows, cols)`` with mask == nodata.

* ``GeoTIFFReader`` wraps rasterio when available. The image libraries are
  not shipped in this container, so the construction path is a
  clearly-marked stub: it raises ``NotImplementedError`` unless rasterio
  imports. The Spark-side plumbing (schema, partitioning, batch shape) is
  identical for every reader and is what the tests exercise.
* ``SyntheticReader`` generates a deterministic array from pixel
  coordinates — the test double standing in for raster IO, same contract.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


class WindowReader:
    """Reader protocol: subclass and implement __call__."""

    def __call__(
        self,
        uris: list[str],
        bounds: tuple[float, float, float, float],
        shape: tuple[int, int],
        band_count: int,
    ) -> np.ma.MaskedArray:
        raise NotImplementedError


@dataclass
class SyntheticReader(WindowReader):
    """Deterministic pixel function: value = (floor(x_idx) + floor(y_idx))
    % modulus, masked where value == mask_value. Pixel indices derive from
    world coordinates so overlapping windows agree bit-for-bit (the
    alignment property C5 tests rely on)."""

    xres: float
    yres: float
    origin_x: float = -180.0
    origin_y: float = 90.0
    modulus: int = 16
    mask_value: int | None = 0

    def __call__(self, uris, bounds, shape, band_count):
        left, bottom, right, top = bounds
        rows, cols = shape
        col0 = int(round((left - self.origin_x) / self.xres))
        row0 = int(round((self.origin_y - top) / self.yres))
        jj, ii = np.meshgrid(
            np.arange(col0, col0 + cols), np.arange(row0, row0 + rows)
        )
        base = (ii + jj) % self.modulus
        stack = np.stack([(base + b) % self.modulus for b in range(band_count)])
        if self.mask_value is None:
            mask = np.zeros_like(stack, dtype=bool)
        else:
            mask = stack == self.mask_value
        return np.ma.MaskedArray(stack.astype("int64"), mask=mask)


class GeoTIFFReader(WindowReader):
    """Rasterio-backed windowed read (STUB when rasterio is absent).

    Mirrors ``read_window``'s contract (``window_utils.py:88-133``):
    reproject+resample the source mosaic into the destination window grid,
    pad to exact shape, mask nodata. Requires rasterio — unavailable in
    this environment, so instantiation raises with a clear marker.
    """

    def __init__(self, src_nodata=None, resampling: str = "nearest") -> None:
        try:
            import rasterio  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "GeoTIFFReader requires rasterio, which is not installed in "
                "this environment. Use SyntheticReader for tests; the Spark "
                "plumbing is reader-agnostic."
            ) from e
        self.src_nodata = src_nodata
        self.resampling = resampling

    def __call__(self, uris, bounds, shape, band_count):  # pragma: no cover
        import rasterio
        from rasterio.merge import merge
        from rasterio.windows import from_bounds

        rows, cols = shape
        out = np.ma.masked_all((band_count, rows, cols), dtype="float64")
        # first-non-null by file order — the VRT mosaic semantic (S5,
        # gfw_pixetl/utils/gdal.py:31-49)
        for uri in uris:
            with rasterio.open(uri) as src:
                win = from_bounds(*bounds, transform=src.transform)
                data = src.read(
                    indexes=list(range(1, band_count + 1)),
                    window=win, boundless=True, masked=True,
                    out_shape=(band_count, rows, cols),
                )
                out = np.ma.where(np.ma.getmaskarray(out), data, out)
        return out

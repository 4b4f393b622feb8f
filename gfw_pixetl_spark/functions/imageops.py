"""Pure-NumPy image resampling: exact area (box-coverage) and bilinear
(half-pixel-center, edge-clamped) resizes over decoded pixel arrays.

Both kernels are expressed as separable weight-matrix products
(``out = W_rows @ img @ W_cols.T``), so a (h, w[, c]) array resizes in two
BLAS-shaped multiplies with no Python pixel loops — the per-batch cost
inside the Arrow ``mapInPandas`` image kernels stays vectorized.

Reference parity: the reference delegates raster resampling to GDAL
(``/root/reference/gfw_pixetl/settings/gdal.py`` resampling enum); this
module is the image-column analog of ``functions/warp.py``'s grid kernels,
kept separate because image payloads are plain pixel grids with no
geotransform.

Conventions (documented contract, tested in tests/test_imageops.py):

- ``bilinear``: output pixel i samples source coordinate
  ``(i + 0.5) * in/out - 0.5`` (half-pixel centers — the OpenCV
  ``INTER_LINEAR`` / TF ``half_pixel_centers=True`` convention), two-tap
  linear weights, clamped at the edges.
- ``area``: output pixel i averages the source interval
  ``[i * in/out, (i+1) * in/out)`` with exact fractional coverage
  weights (OpenCV ``INTER_AREA`` for downscale); on integer upscale the
  coverage degenerates to pixel replication.
- Results are float64; ``quantize_u8`` rounds half-to-even (IEEE /
  ``np.rint``) and clips to [0, 255].
"""

from __future__ import annotations

import numpy as np

__all__ = ["resize_array", "quantize_u8", "area_weights", "bilinear_weights"]


def area_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic coverage matrix for exact box-filter
    resampling: W[i, j] = |[i*s, (i+1)*s) ∩ [j, j+1)| / s, s = n_in/n_out."""
    s = n_in / n_out
    w = np.zeros((n_out, n_in))
    for i in range(n_out):
        lo, hi = i * s, (i + 1) * s
        j0, j1 = int(np.floor(lo)), int(np.ceil(hi))
        for j in range(j0, min(j1, n_in)):
            w[i, j] = max(0.0, min(hi, j + 1) - max(lo, j)) / s
    return w


def bilinear_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) two-tap linear interpolation matrix with half-pixel
    centers and edge clamp."""
    w = np.zeros((n_out, n_in))
    src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    lo = np.clip(np.floor(src).astype(int), 0, n_in - 1)
    hi = np.clip(lo + 1, 0, n_in - 1)
    frac = np.clip(src - np.floor(src), 0.0, 1.0)
    frac[src < 0] = 0.0
    for i in range(n_out):
        w[i, lo[i]] += 1.0 - frac[i]
        w[i, hi[i]] += frac[i]
    return w


_WEIGHTS = {"area": area_weights, "bilinear": bilinear_weights}


def resize_array(
    img: np.ndarray, out_h: int, out_w: int, method: str = "area"
) -> np.ndarray:
    """Resize (h, w) or (h, w, c) to (out_h, out_w[, c]); float64 output."""
    if method not in _WEIGHTS:
        raise ValueError(f"unknown resize method {method!r} "
                         f"(supported: {sorted(_WEIGHTS)})")
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, _c = img.shape
    wr = _WEIGHTS[method](h, out_h)
    wc = _WEIGHTS[method](w, out_w)
    # (out_h, h) @ (h, w, c) along axis 0, then (out_w, w) along axis 1
    out = np.tensordot(wr, img.astype(np.float64), axes=(1, 0))
    out = np.tensordot(wc, out, axes=(1, 1)).transpose(1, 0, 2)
    return out[:, :, 0] if squeeze else out


def quantize_u8(arr: np.ndarray) -> np.ndarray:
    """Round half-to-even (np.rint) and clip to uint8 range."""
    return np.clip(np.rint(arr), 0, 255).astype(np.uint8)

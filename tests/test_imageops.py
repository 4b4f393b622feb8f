"""Exact-resample kernels: weight-matrix properties vs a naive per-pixel
reference implementation, plus the dyadic-exactness facts q50's SQL
oracle depends on."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gfw_pixetl_spark.functions.imageops import (
    area_weights, bilinear_weights, quantize_u8, resize_array,
)

DIMS = st.integers(min_value=1, max_value=17)


@given(DIMS, DIMS)
@settings(max_examples=60, deadline=None)
def test_weights_row_stochastic(n_in, n_out):
    for f in (area_weights, bilinear_weights):
        w = f(n_in, n_out)
        assert w.shape == (n_out, n_in)
        assert np.allclose(w.sum(axis=1), 1.0)
        assert (w >= 0).all()


@given(DIMS, DIMS, DIMS, st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_constant_image_invariant(h, w, out, seed):
    val = float(np.random.RandomState(seed).randint(0, 256))
    img = np.full((h, w), val)
    for m in ("area", "bilinear"):
        assert np.allclose(resize_array(img, out, out, m), val)


def _naive_bilinear(img, oh, ow):
    h, w = img.shape
    out = np.zeros((oh, ow))
    for i in range(oh):
        for j in range(ow):
            sy = (i + 0.5) * h / oh - 0.5
            sx = (j + 0.5) * w / ow - 0.5
            y0 = min(max(int(np.floor(sy)), 0), h - 1)
            x0 = min(max(int(np.floor(sx)), 0), w - 1)
            y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
            fy = 0.0 if sy < 0 else min(sy - np.floor(sy), 1.0)
            fx = 0.0 if sx < 0 else min(sx - np.floor(sx), 1.0)
            out[i, j] = ((1 - fy) * ((1 - fx) * img[y0, x0]
                                     + fx * img[y0, x1])
                         + fy * ((1 - fx) * img[y1, x0]
                                 + fx * img[y1, x1]))
    return out


def _naive_area(img, oh, ow):
    h, w = img.shape
    out = np.zeros((oh, ow))
    sy, sx = h / oh, w / ow
    for i in range(oh):
        for j in range(ow):
            acc = 0.0
            for y in range(int(np.floor(i * sy)),
                           min(int(np.ceil((i + 1) * sy)), h)):
                for x in range(int(np.floor(j * sx)),
                               min(int(np.ceil((j + 1) * sx)), w)):
                    cy = max(0.0, min((i + 1) * sy, y + 1) - max(i * sy, y))
                    cx = max(0.0, min((j + 1) * sx, x + 1) - max(j * sx, x))
                    acc += cy * cx * img[y, x]
            out[i, j] = acc / (sy * sx)
    return out


@given(DIMS, DIMS, DIMS, DIMS, st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_matches_naive_reference(h, w, oh, ow, seed):
    img = np.random.RandomState(seed).randint(0, 256, (h, w)).astype(float)
    assert np.allclose(resize_array(img, oh, ow, "bilinear"),
                       _naive_bilinear(img, oh, ow))
    assert np.allclose(resize_array(img, oh, ow, "area"),
                       _naive_area(img, oh, ow))


def test_area_integer_downscale_is_block_mean():
    img = np.arange(64, dtype=float).reshape(8, 8)
    got = resize_array(img, 2, 2, "area")
    want = img.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3).reshape(
        2, 2, 16).mean(axis=2)
    assert np.array_equal(got, want)  # bitwise: dyadic weights


def test_q50_dyadic_chain_is_exact():
    """The exact fact q50's oracle rests on: JPEG blocks -> area 16->2
    gives the block values bit-exactly; bilinear 2->4 mixes them with
    9/3/3/1 sixteenths bit-exactly."""
    d = [37, 250, 5, 129]
    img = np.repeat(np.repeat(np.array(d, float).reshape(2, 2), 8, 0), 8, 1)
    small = resize_array(img, 2, 2, "area")
    assert np.array_equal(small, np.array(d, float).reshape(2, 2))
    up = resize_array(small, 4, 4, "bilinear")
    assert up[0, 0] == d[0] and up[3, 3] == d[3]
    assert up[1, 1] == (9 * d[0] + 3 * d[1] + 3 * d[2] + d[3]) / 16.0
    assert up[2, 1] == (3 * d[0] + d[1] + 9 * d[2] + 3 * d[3]) / 16.0


def test_quantize_half_to_even():
    assert list(quantize_u8(np.array([0.5, 1.5, 2.5, 3.5, -1.0, 300.0]))) \
        == [0, 2, 2, 4, 0, 255]


def test_multichannel_and_bad_method():
    rgb = np.random.RandomState(0).randint(0, 256, (6, 5, 3)).astype(float)
    out = resize_array(rgb, 3, 2, "area")
    assert out.shape == (3, 2, 3)
    for c in range(3):
        assert np.allclose(out[:, :, c],
                           resize_array(rgb[:, :, c], 3, 2, "area"))
    with pytest.raises(ValueError):
        resize_array(rgb, 2, 2, "lanczos9")

"""Multimodal binary-column plumbing: schema, batch shape, determinism."""

from __future__ import annotations

import hashlib

from gfw_pixetl_spark.functions.multimodal import (
    extract_image_meta, fake_payload, resize_images, sample_frames,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello"), (2, "world")], "doc_id long, text string"
    )


def _payloads(spark):
    return spark.createDataFrame(
        [(1, fake_payload("hello")), (2, fake_payload("world"))],
        "doc_id long, payload binary",
    )


def test_extract_image_meta_deterministic(spark):
    out = {r.doc_id: r for r in extract_image_meta(_docs(spark)).collect()}
    h = hashlib.md5(b"hello").digest()
    assert out[1].width == h[0] and out[1].height == h[1]
    assert out[1].channels == h[2] % 4 + 1
    assert out[1].n_bytes == 16
    # stable across runs
    again = {r.doc_id: r for r in extract_image_meta(_docs(spark)).collect()}
    assert out[1] == again[1]


def test_resize_images_contract(spark):
    out = resize_images(_payloads(spark), target=(32, 16)).collect()
    assert {r.doc_id for r in out} == {1, 2}
    assert all((r.width, r.height) == (32, 16) for r in out)
    assert all(isinstance(r.payload, (bytes, bytearray)) for r in out)
    # payload depends on target size (distinct kernels distinguishable)
    other = resize_images(_payloads(spark), target=(64, 64)).collect()
    assert out[0].payload != [r for r in other if r.doc_id == out[0].doc_id][0].payload


def test_sample_frames_fanout(spark):
    out = sample_frames(_payloads(spark), every_nth=5, n_frames=4).collect()
    assert len(out) == 2 * 4
    idxs = sorted({r.frame_idx for r in out})
    assert idxs == [0, 5, 10, 15]
    # frames are distinct per index
    d1 = [r.payload for r in out if r.doc_id == 1]
    assert len(set(d1)) == 4

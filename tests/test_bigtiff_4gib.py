"""BigTIFF >4 GiB writer proof (marked slow): the auto-switch to
magic-43 / 8-byte offsets is exercised by a payload that actually
crosses the classic 4 GiB offset bound, and a windowed read-back from
beyond the boundary decodes bit-exactly.

The source array is a broadcast column pattern (row % 251), so the
virtual 4.4 GB image costs ~65 KB of real memory on the way in; the
writer streams tiles to disk. Uncompressed layout is what forces file
offsets past 2^32 without burning CPU on compressing noise."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from gfw_pixetl_spark.sources.geotiff import GeoTiff, write_cog

pytestmark = pytest.mark.slow

N = 66560          # 130 * 512 px; N^2 bytes = 4.43e9 > 4 GiB
BLOCK = 512


def test_bigtiff_auto_switch_and_read_past_4gib(tmp_path):
    path = str(tmp_path / "big.tif")
    col = (np.arange(N, dtype=np.int64) % 251).astype(np.uint8)
    data = np.broadcast_to(col[:, None], (N, N))  # virtual 4.4 GB

    write_cog(
        path, data[None, ...],
        transform=(0.0, 10.0 / N, 10.0, 10.0 / N),
        crs="EPSG:4326", nodata=None, blockxsize=BLOCK,
        compress="NONE", overviews=False,
        # bigtiff NOT forced: the payload must trip the auto-switch
    )
    size = os.path.getsize(path)
    assert size > (1 << 32), f"file only {size} bytes"

    with open(path, "rb") as f:
        head = f.read(16)
    order, magic = struct.unpack("<2sH", head[:4])
    assert order == b"II" and magic == 43  # BigTIFF
    offsize, zero = struct.unpack("<HH", head[4:8])
    assert (offsize, zero) == (8, 0)

    tif = GeoTiff.open(path)
    assert (tif.width, tif.height) == (N, N)
    level = tif.levels[0]
    # the last tiles genuinely live beyond the 4 GiB boundary
    assert max(level.offsets) + max(level.counts) \
        >= size - BLOCK * BLOCK
    assert max(level.offsets) > (1 << 32)

    # windowed read-back across the boundary: bottom-right corner window
    win = tif.read_window(N - 700, N - 600, 700, 600, masked=False)
    want = np.broadcast_to(col[N - 600:, None], (600, 700))
    assert np.array_equal(win[0], want)

    # and a window spanning a tile seam in the >4 GiB region
    r0, c0 = N - BLOCK - 50, N - BLOCK - 50
    win = tif.read_window(c0, r0, 100, 100, masked=False)
    want = np.broadcast_to(col[r0:r0 + 100, None], (100, 100))
    assert np.array_equal(win[0], want)


def test_bigtiff_explicit_small_roundtrip(tmp_path):
    """Forced bigtiff=True on a small payload: same reader path, cheap
    coverage of the 8-byte IFD framing without the 4 GiB cost."""
    path = str(tmp_path / "small_big.tif")
    data = (np.arange(256 * 256, dtype=np.int64) % 199).astype(
        np.uint8).reshape(256, 256)
    write_cog(
        path, data[None, ...],
        transform=(0.0, 10.0 / 256, 10.0, 10.0 / 256),
        crs="EPSG:4326", nodata=0, blockxsize=128,
        compress="DEFLATE", overviews=False, bigtiff=True,
    )
    with open(path, "rb") as f:
        assert struct.unpack("<2sH", f.read(4)) == (b"II", 43)
    tif = GeoTiff.open(path)
    win = tif.read_window(0, 0, 256, 256, masked=False)
    assert np.array_equal(win[0], data)

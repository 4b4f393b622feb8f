"""File-level metadata + stats sidecar (reference get_metadata /
gdalinfo -stats parity, ``utils/gdal.py:170-238``; sidecar upload
contract ``tiles/tile.py:143-172``)."""

from __future__ import annotations

import re

import numpy as np

from gfw_pixetl_spark.sources.geotiff import write_cog
from gfw_pixetl_spark.sources.raster_meta import (
    band_histogram,
    band_stats,
    get_metadata,
    write_stats_sidecar,
)

TRANSFORM = (10.0, 0.5, 20.0, 0.5)


def test_band_stats_excludes_nodata():
    arr = np.array([[0, 2, 4], [0, 6, 8]], dtype="uint8")
    s = band_stats(arr, nodata=0)
    assert s == {"min": 2.0, "max": 8.0, "mean": 5.0,
                 "std_dev": float(np.std([2, 4, 6, 8]))}
    assert band_stats(np.zeros((2, 2), dtype="uint8"), nodata=0) is None


def test_band_histogram_gdalinfo_convention():
    arr = np.arange(256, dtype="uint8").reshape(16, 16)
    h = band_histogram(arr, nodata=None)
    # integer data: 256 buckets over [min-0.5, max+0.5] -> one per value
    assert h["count"] == 256 and h["min"] == -0.5 and h["max"] == 255.5
    assert h["buckets"] == [1] * 256


def test_get_metadata_from_cog(tmp_path):
    rng = np.random.default_rng(11)
    data = rng.integers(1, 50, size=(2, 64, 96)).astype("int16")
    path = str(tmp_path / "m.tif")
    write_cog(path, data, transform=TRANSFORM, crs="EPSG:4326", nodata=0,
              blockxsize=64, overviews=False)
    md = get_metadata(path, compute_stats=True, compute_histogram=True)
    assert md["width"] == 96 and md["height"] == 64
    assert md["extent"] == (10.0, 20.0 - 0.5 * 64, 10.0 + 0.5 * 96, 20.0)
    assert md["pixelxsize"] == 0.5 and md["crs"] == "EPSG:4326"
    assert md["compression"] == "DEFLATE" and md["driver"] == "GTiff"
    assert len(md["bands"]) == 2
    for b in range(2):
        band = md["bands"][b]
        assert band["data_type"] == "int16"
        assert band["stats"]["min"] == float(data[b].min())
        assert band["stats"]["max"] == float(data[b].max())
        assert abs(band["stats"]["mean"] - data[b].mean()) < 1e-9
        assert sum(band["histogram"]["buckets"]) == 64 * 96


def test_stats_sidecar_pam_roundtrip(tmp_path):
    data = np.array([[[1, 2], [3, 4]]], dtype="uint8")
    path = str(tmp_path / "s.tif")
    write_cog(path, data, transform=TRANSFORM, nodata=None,
              overviews=False)
    md = get_metadata(path, compute_stats=True, compute_histogram=True)
    sidecar = write_stats_sidecar(path, md)
    assert sidecar == path + ".aux.xml"
    xml = open(sidecar).read()
    mins = dict(re.findall(r'<MDI key="([A-Z_]+)">([^<]+)</MDI>', xml))
    assert float(mins["STATISTICS_MINIMUM"]) == 1.0
    assert float(mins["STATISTICS_MAXIMUM"]) == 4.0
    assert float(mins["STATISTICS_MEAN"]) == 2.5
    assert "<HistCounts>" in xml and "<BucketCount>256</BucketCount>" in xml


def test_sidecar_skipped_when_empty(tmp_path):
    data = np.zeros((1, 2, 2), dtype="uint8")
    path = str(tmp_path / "e.tif")
    write_cog(path, data, transform=TRANSFORM, nodata=0, overviews=False)
    md = get_metadata(path, compute_stats=True)
    assert write_stats_sidecar(path, md) is None


def test_pipe_writes_sidecar_when_requested(spark, tmp_path):
    import os

    from gfw_pixetl_spark.grids import LatLngGrid
    from gfw_pixetl_spark.models import LayerModel
    from gfw_pixetl_spark.plans import raster_pipe as rp
    from gfw_pixetl_spark.sources.raster import SyntheticReader

    grid = LatLngGrid(10, 160)
    layer = LayerModel(
        dataset="st_ds", version="v1", source_type="raster",
        pixel_meaning="value", data_type="uint8", grid="10/40000",
        calc="A", no_data=0, source_uri=["memory://synthetic"],
        compute_stats=True, compute_histogram=True,
    )
    pipe = rp.RasterPipe(
        layer=layer, reader=SyntheticReader(xres=grid.xres, yres=grid.yres),
        work_dir=str(tmp_path), grid=grid,
    )
    files = [{"uri": "m://a", "band": 1,
              "left": 0.0, "bottom": 0.0, "right": 10.0, "top": 10.0}]
    rows = pipe.run(spark, files, subset=["10N_000E"]).collect()
    assert rows[0].status == "processed"
    assert os.path.isfile(rows[0].out_path + ".aux.xml")


def test_nan_excluded_with_finite_nodata():
    """Review regression: NaN pixels must not poison stats when nodata
    is a finite sentinel."""
    arr = np.array([[1.0, np.nan], [3.0, -9999.0]], dtype="float32")
    s = band_stats(arr, nodata=-9999.0)
    assert s == {"min": 1.0, "max": 3.0, "mean": 2.0,
                 "std_dev": 1.0}
    h = band_histogram(arr, nodata=-9999.0)
    assert sum(h["buckets"]) == 2

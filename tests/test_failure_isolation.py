"""Per-tile error isolation (F10): a failing window marks its tile
failed — other tiles keep processing, nothing is written for the failed
tile, the exit code reflects the failure."""

from __future__ import annotations

import numpy as np

from gfw_pixetl_spark.grids import LatLngGrid
from gfw_pixetl_spark.plans import raster_pipe as rp
from gfw_pixetl_spark.plans.report import exit_code, should_upload_manifest
from gfw_pixetl_spark.sources.raster import SyntheticReader
from gfw_pixetl_spark.sources.geotiff import read_tile
from tests.test_raster_pipe import make_layer


class ExplodingReader(SyntheticReader):
    """Fails on tiles west of Greenwich; reads normally elsewhere."""

    def __call__(self, uris, bounds, shape, band_count):
        if bounds[0] < 0:
            raise IOError("synthetic read failure")
        return super().__call__(uris, bounds, shape, band_count)


def test_failed_tile_isolates(spark, tmp_path):
    grid = LatLngGrid(10, 160)
    pipe = rp.RasterPipe(
        layer=make_layer(),
        reader=ExplodingReader(xres=grid.xres, yres=grid.yres),
        work_dir=str(tmp_path),
        grid=grid,
    )
    files = [{"uri": "m://a", "band": 1,
              "left": -10.0, "bottom": 0.0, "right": 10.0, "top": 10.0}]
    status = pipe.run(spark, files, subset=["10N_000E", "10N_010W"])
    rows = {r.tile_id: r for r in status.collect()}
    assert rows["10N_000E"].status == "processed"
    assert rows["10N_010W"].status.startswith("failed - OSError")
    assert rows["10N_010W"].out_path is None
    # the good tile's output is intact
    data, _ = read_tile(rows["10N_000E"].out_path)
    assert data.shape == (1, 160, 160)
    assert exit_code(status) == 1
    assert not should_upload_manifest(status)

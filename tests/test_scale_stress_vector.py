"""At-size golden run of the VECTOR pipe (marked slow): ~105 MB of
feature coordinates (16,384 sawtooth rectangles) through
fetch -> window fan-out -> salted two-phase burn -> merge -> write,
asserting window-granular payloads, Arrow batch bounds, and an exact
closed-form comparison of all 16.7M output pixels."""

from __future__ import annotations

import numpy as np
import pytest

from gfw_pixetl_spark.harness import scale_stress_vector as sv

pytestmark = pytest.mark.slow


def test_vector_scale_stress_golden(spark, tmp_path):
    facts = sv.run(spark, str(tmp_path), n_salts=4)

    # the fixture really is at size
    assert facts["coord_bytes"] >= 100 * 2**20
    assert facts["n_features"] == 16384

    # every planned window produced exactly one payload (the lattice
    # covers the tile, so no window is empty)
    assert facts["n_windows"] == facts["windows_planned"] == 64

    # window granularity: one 512^2 uint16 window per payload, never
    # the 32 MB tile
    assert facts["max_window_payload"] <= facts["window_px"] ** 2 * 2 + 4096

    # Arrow batches at the write exchange stay bounded
    cap = 128 * 1024 * 1024 + facts["max_window_payload"]
    assert 0 < facts["max_batch_bytes"] <= cap

    # golden: all pixels equal the closed-form winner
    assert facts["statuses"] == {sv.TILE_ID: "processed"}
    assert sv.verify_outputs(facts) == []


def test_vector_stress_salted_equals_sequential(spark, tmp_path):
    """The salted two-phase burn is bit-exact vs the sequential burn on
    a thin slice of the same lattice (sequential at full size would
    double the suite's cost for no extra coverage)."""
    from pyspark.sql import functions as F

    from gfw_pixetl_spark.grids import LatLngGrid
    from gfw_pixetl_spark.models import LayerModel
    from gfw_pixetl_spark.plans.vector_pipe import VectorPipe
    from gfw_pixetl_spark.sources.geotiff import read_tile

    feats = sv.make_features(spark).filter(
        (F.col("feature_id") % 128 < 8) & (F.col("feature_id") < 1024)
    ).localCheckpoint()
    grid = LatLngGrid(sv.GRID_WIDTH_DEG, sv.GRID_COLS)
    layer = LayerModel(
        dataset="stress_vec_eq", version="v1", source_type="vector",
        pixel_meaning="value", data_type="uint16", grid="10/40000",
        rasterize_method="value", order="asc", no_data=0,
    )
    outs = []
    for salts, sub in ((1, "seq"), (4, "salted")):
        pipe = VectorPipe(layer=layer, work_dir=f"{tmp_path}/{sub}",
                          grid=grid, n_salts=salts)
        st = {r.tile_id: r for r in
              pipe.run(spark, feats, subset=[sv.TILE_ID]).collect()}
        outs.append(read_tile(st[sv.TILE_ID].out_path)[0])
    assert np.array_equal(outs[0], outs[1])

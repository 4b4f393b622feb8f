"""At-size golden run of the raster pipe (marked slow): 268 MB source
COG through seed -> prune -> window -> calc -> write with the production
GeoTIFFReader, asserting the SCALING.md claims that the tiny fixtures
cannot exercise — window-granular payloads, Arrow byte capping, and
bit-exact 2x2-tile output."""

from __future__ import annotations

import pytest

from gfw_pixetl_spark.harness import scale_stress as ss

pytestmark = pytest.mark.slow


def test_scale_stress_golden(spark, tmp_path):
    facts = ss.run(spark, str(tmp_path))

    # every planned window produced exactly one payload row
    assert facts["n_windows"] == facts["windows_planned"] == 256

    # window granularity: the largest single payload is ONE 1024x1024
    # uint8 window (+ npy header), never a whole 67 MB tile
    assert facts["max_window_payload"] <= facts["window_px"] ** 2 + 4096

    # producer-side Arrow guard: no batch downstream of the transform
    # kernel exceeds the 128 MB yield cap plus one window
    cap = 128 * 1024 * 1024 + facts["max_window_payload"]
    assert 0 < facts["max_batch_bytes"] <= cap

    # all four tiles processed and bit-exact against the closed form
    assert set(facts["statuses"]) == set(ss.TILE_IDS)
    assert all(s == "processed" for s in facts["statuses"].values())
    assert ss.verify_outputs(facts) == []

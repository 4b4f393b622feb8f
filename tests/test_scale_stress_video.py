"""At-size video-modality stress golden (slow): ~100+ MB of real
AVI/MJPEG, ranged frame sampling through the container's own index,
full JPEG decode, closed-form pixel verification, IO-fraction bound."""

from __future__ import annotations

import tempfile

import pytest

from gfw_pixetl_spark.harness import scale_stress_video


@pytest.mark.slow
def test_scale_stress_video(spark):
    facts = scale_stress_video.run(spark, tempfile.mkdtemp())
    problems = scale_stress_video.verify_outputs(facts)
    assert not problems, problems
    # sampling must be cheap relative to generation (decode of 3
    # frames vs encode of 100): wall-clock sanity, not a flaky bound
    assert facts["sec_sample"] < facts["sec_generate"]

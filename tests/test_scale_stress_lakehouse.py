"""At-size lakehouse-log stress (harness/scale_stress_lakehouse.py):
~115 MB through the Delta interop — 14 commits, a checkpoint cut at
v10, a partition DELETE, checkpointed-HEAD planning with log-only
pruning, v0 time travel — all against closed-form goldens. Slow."""

from __future__ import annotations

import tempfile

import pytest

from gfw_pixetl_spark.harness import scale_stress_lakehouse as m


@pytest.mark.slow
def test_lakehouse_stress_golden(spark):
    facts = m.run(spark, tempfile.mkdtemp())
    problems = m.verify_outputs(facts)
    assert not problems, problems
    assert facts["data_bytes"] >= 100 * 2**20
    assert facts["checkpoint_version"] == 10
    assert facts["pruned_files"] == 20

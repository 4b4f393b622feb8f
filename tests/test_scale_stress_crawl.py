"""At-size golden run of the COMPOSED crawl-curation pipeline (marked
slow): >=100 MB of WARC shards through ingest -> HTML extract ->
language ID -> quality gate -> blocklist suffix join -> in-batch
minhash dedup -> bucketed signature-store probe -> snapshot append,
with an exact closed-form survivor set."""

from __future__ import annotations

import numpy as np
import pytest

from gfw_pixetl_spark.harness import scale_stress_crawl as sc

pytestmark = pytest.mark.slow


def test_crawl_scale_stress_golden(spark, tmp_path):
    facts = sc.run(spark, str(tmp_path))

    # the fixture really is at size and every record was ingested
    assert facts["warc_bytes_uncompressed"] >= 100 * 2**20
    assert facts["n_ingested"] == sc.N_DOCS
    assert facts["n_shards"] == sc.N_SHARDS

    # closed-form golden: survivor count, id-sum checksum, per-wave
    # store contents — verify_outputs re-derives all of them
    assert sc.verify_outputs(facts) == []

    mask = sc.expected_survivors()
    assert facts["snapshot_rows"] == int(mask.sum())
    assert facts["snapshot_id_sum"] == int(
        np.arange(sc.N_DOCS)[mask].sum())
    # both gates and both dedup paths actually fired: every class is
    # non-trivially populated
    ids = np.arange(sc.N_DOCS)
    assert 0 < int(mask.sum()) < sc.N_DOCS
    assert facts["store_docs_wave_a"] == int(
        (mask & (ids < sc.WAVE)).sum())
    assert facts["store_appended_wave_b"] == int(
        (mask & (ids >= sc.WAVE)).sum())

    # Arrow producer batches stay bounded (no shard-sized batch)
    assert facts["max_batch_bytes"] < 64 * 2**20


def test_expected_survivors_closed_form_classes():
    """The modular classes that define the golden are each non-empty
    and mutually consistent (fast sanity, not marked slow in spirit —
    pure numpy)."""
    mask = sc.expected_survivors()
    i = np.arange(sc.N_DOCS)
    # a dropped in-wave dup: source and dup both clean
    dup = (i % 4 == 1)
    src_clean = np.concatenate([[False], mask[:-1]])
    assert not np.any(mask & dup & src_clean)
    # blocklisted hosts never survive
    assert not np.any(mask & ((i % sc.N_HOSTS) % 10 == 7))

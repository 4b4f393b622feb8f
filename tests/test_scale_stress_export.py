"""At-size trainer-export golden (harness/scale_stress_export.py):
>=100 MB of TFRecord shards written and leniently re-ingested with
exact closed-form accounting, plus the .jsonl.zst leg through the
in-tree zstd compressor. Slow — one full run."""

from __future__ import annotations

import pytest


@pytest.mark.slow
def test_scale_stress_export_golden(spark, tmp_path):
    from gfw_pixetl_spark.harness import scale_stress_export as m

    facts = m.run(spark, str(tmp_path))
    problems = m.verify_outputs(facts)
    assert problems == [], problems
    assert facts["export_bytes"] >= 100 << 20
    # the zstd leg really compressed (Huffman + sequences both bite on
    # the token grid)
    assert facts["zstd_comp_bytes"] < 0.4 * facts["zstd_raw_bytes"]


def test_verify_outputs_catches_drift():
    from gfw_pixetl_spark.harness import scale_stress_export as m

    good = {
        "n_shards": m.N_SHARDS, "gen_n_records": m.N_DOCS,
        "gen_n_index": m.N_DOCS, "n_main": m.N_DOCS,
        "n_tail": m.N_SHARDS, "bad_records": m.N_SHARDS,
        "junk_bytes": 4 * m.N_SHARDS,
        "id_sum": m.N_DOCS * (m.N_DOCS - 1) // 2,
        "byte_sum": m.N_DOCS * m.BODY_LEN,
        "zstd_n": (m.N_DOCS + 2) // 3,
        "zstd_id_sum": 3 * ((m.N_DOCS + 2) // 3 - 1)
        * ((m.N_DOCS + 2) // 3) // 2,
        "export_bytes": 121 << 20, "zstd_raw_bytes": 100,
        "zstd_comp_bytes": 30, "max_shard_bytes": 4 << 20,
    }
    assert m.verify_outputs(dict(good)) == []
    bad = dict(good)
    bad["id_sum"] += 1  # one lost/duplicated record must be caught
    assert any("id_sum" in p for p in m.verify_outputs(bad))
    bad = dict(good)
    bad["junk_bytes"] = 0  # damage accounting must be exact
    assert any("junk_bytes" in p for p in m.verify_outputs(bad))

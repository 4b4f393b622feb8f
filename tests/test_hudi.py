"""Hudi copy-on-write interop (sources/hudi.py): timeline state
machine, file-group/file-slice snapshot planning, time travel,
preserved-commit-time incremental pull, and replacecommit overwrite
semantics — the third lakehouse format next to Delta and Iceberg."""

import pandas as pd
import pytest

from gfw_pixetl_spark.sources import hudi as H


@pytest.fixture()
def cow_table(tmp_path):
    d = str(tmp_path / "tbl")
    H.create_table(d, "t1", partition_field="seg", record_key_field="k")
    t1, t2 = H.instant_time(1), H.instant_time(2)
    p_a = pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]})
    p_b = pd.DataFrame({"k": [4, 5], "v": [40, 50]})
    fids = H.commit_pandas(d, t1, {"seg=a": p_a, "seg=b": p_b},
                           key_col="k")
    # upsert seg=a: only k=2 changes; copied rows keep t1 (spec)
    p_a2 = pd.DataFrame({"k": [1, 2, 3], "v": [10, 999, 30]})
    H.commit_pandas(d, t2, {"seg=a": p_a2},
                    file_ids={"seg=a": fids["seg=a"]}, key_col="k",
                    row_commit_ts={"seg=a": pd.Series([t1, t2, t1])})
    return d, fids, t1, t2


def test_properties_roundtrip(tmp_path):
    d = str(tmp_path / "t")
    H.create_table(d, "nm", partition_field="p", record_key_field="k")
    props = H.read_properties(d)
    assert props["hoodie.table.type"] == "COPY_ON_WRITE"
    assert props["hoodie.table.name"] == "nm"
    assert props["hoodie.table.partition.fields"] == "p"


def test_timeline_state_machine(cow_table):
    d, _, t1, t2 = cow_table
    tl = H.timeline(d)
    per_ts = {}
    for inst in tl:
        per_ts.setdefault(inst["ts"], []).append(inst["state"])
    assert sorted(per_ts[t1]) == ["completed", "inflight", "requested"]
    assert sorted(per_ts[t2]) == ["completed", "inflight", "requested"]


def test_snapshot_latest_slice_per_group(cow_table):
    d, fids, t1, t2 = cow_table
    snap = H.snapshot_slices(d)
    assert len(snap) == 2
    by_part = {s["partition"]: s for s in snap}
    assert by_part["seg=a"]["commit_ts"] == t2
    assert by_part["seg=b"]["commit_ts"] == t1
    assert by_part["seg=a"]["file_id"] == fids["seg=a"]
    # time travel: ceiling below t2 picks t1's slice for both groups
    old = {s["partition"]: s["commit_ts"]
           for s in H.snapshot_slices(d, as_of=t1)}
    assert old == {"seg=a": t1, "seg=b": t1}


def test_inflight_commit_invisible(cow_table):
    d, _, t1, t2 = cow_table
    t3 = H.instant_time(3)
    H.begin_commit(d, t3)  # never completed
    assert {s["commit_ts"] for s in H.snapshot_slices(d)} == {t1, t2}


def test_snapshot_read_and_time_travel(spark, cow_table):
    d, _, t1, _ = cow_table
    rows = [(r.k, r.v) for r in H.read_hudi(spark, d).orderBy("k").collect()]
    assert rows == [(1, 10), (2, 999), (3, 30), (4, 40), (5, 50)]
    old = [(r.k, r.v)
           for r in H.read_hudi(spark, d, as_of=t1).orderBy("k").collect()]
    assert old == [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50)]
    meta = H.read_hudi(spark, d, drop_meta=False)
    for c in ("_hoodie_commit_time", "_hoodie_record_key",
              "_hoodie_partition_path"):
        assert c in meta.columns


def test_incremental_exact_change_capture(spark, cow_table):
    d, _, t1, t2 = cow_table
    inc = H.read_hudi_incremental(spark, d, begin=t1)
    rows = [(r.k, r.v) for r in inc.select("k", "v").collect()]
    # only the row t2 actually changed — copied rows keep t1 and are
    # filtered out even though the whole slice was rewritten
    assert rows == [(2, 999)]
    with pytest.raises(ValueError):
        H.read_hudi_incremental(spark, d, begin=t2)


def test_replacecommit_overwrites_group(spark, cow_table):
    d, fids, _, _ = cow_table
    t3 = H.instant_time(3)
    H.commit_pandas(d, t3, {"seg=b": pd.DataFrame({"k": [6], "v": [60]})},
                    key_col="k", replaced_file_ids=[fids["seg=b"]])
    rows = [(r.k, r.v) for r in H.read_hudi(spark, d).orderBy("k").collect()]
    assert rows == [(1, 10), (2, 999), (3, 30), (6, 60)]
    assert len(H.snapshot_slices(d)) == 2


def test_empty_snapshot_raises(spark, tmp_path):
    d = str(tmp_path / "e")
    H.create_table(d, "e")
    with pytest.raises(ValueError):
        H.read_hudi(spark, d)

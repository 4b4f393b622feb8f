"""Iceberg format-v2 interop (sources/iceberg.py): metadata JSON tree,
Avro manifest lists + manifests (written/read by the in-tree Avro
codec), snapshot isolation, time travel, manifest-level and file-level
partition pruning, delete-by-dropping-manifests."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from gfw_pixetl_spark.sources.avro import iter_container
from gfw_pixetl_spark.sources.iceberg import IcebergTable

SCHEMA = [("doc_id", "long"), ("n_chars", "long"), ("lang", "string")]


def _table(tmp_path) -> IcebergTable:
    return IcebergTable(str(tmp_path / "tbl"), SCHEMA, ["lang"])


def _files(lang, n, base):
    return [{"path": f"data/{lang}-{i}.parquet",
             "partition": {"lang": lang}, "record_count": n,
             "size": 1000 + i} for i in range(base, base + 2)]


def test_commit_plan_and_time_travel(tmp_path):
    t = _table(tmp_path)
    s1 = t.commit(_files("en", 10, 0) + _files("de", 5, 0))
    s2 = t.commit(_files("fr", 7, 0))

    head = t.plan()
    assert head["snapshot_id"] == s2
    assert len(head["files"]) == 6
    assert head["manifests_total"] == 2   # one per commit, carried

    old = t.plan(snapshot_id=s1)
    assert len(old["files"]) == 4
    assert {f["partition"]["lang"] for f in old["files"]} == {
        "en", "de"}


def test_delete_by_dropping_manifests(tmp_path):
    t = _table(tmp_path)
    s1 = t.commit(_files("en", 10, 0))
    t.commit(_files("de", 5, 0))
    meta = t._current_metadata()
    # drop the de manifest: carry only manifests whose files are en
    rows = t._manifest_rows(meta, meta["current-snapshot-id"])
    keep = []
    for m in rows:
        entries = list(iter_container(
            (Path(t.dir) / m["manifest_path"]).read_bytes()))
        if all(e["data_file"]["partition"]["lang"] == "en"
               for e in entries):
            keep.append(m["manifest_path"])
    s3 = t.commit([], operation="delete", carry_manifests=keep)
    head = t.plan()
    assert head["snapshot_id"] == s3
    assert {f["partition"]["lang"] for f in head["files"]} == {"en"}
    # the deleted partition is still visible via time travel
    assert {f["partition"]["lang"]
            for f in t.plan(snapshot_id=s1)["files"]} == {"en"}


def test_manifest_level_pruning(tmp_path):
    t = _table(tmp_path)
    t.commit(_files("aa", 1, 0))
    t.commit(_files("zz", 1, 0))
    plan = t.plan(partition_filter={"lang": "aa"})
    assert plan["manifests_total"] == 2
    assert plan["manifests_scanned"] == 1    # zz manifest never opened
    assert len(plan["files"]) == 2
    assert all(f["partition"]["lang"] == "aa" for f in plan["files"])


def test_file_level_pruning_within_manifest(tmp_path):
    t = _table(tmp_path)
    t.commit(_files("en", 1, 0) + _files("de", 1, 0))
    plan = t.plan(partition_filter={"lang": "de"})
    assert plan["manifests_scanned"] == 1
    assert {f["file_path"] for f in plan["files"]} == {
        "data/de-0.parquet", "data/de-1.parquet"}


def test_metadata_shape_is_v2(tmp_path):
    t = _table(tmp_path)
    t.commit(_files("en", 3, 0))
    mdir = Path(t.dir) / "metadata"
    v = int((mdir / "version-hint.text").read_text())
    meta = json.loads((mdir / f"v{v}.metadata.json").read_text())
    assert meta["format-version"] == 2
    fields = meta["schemas"][0]["fields"]
    assert [f["id"] for f in fields] == [1, 2, 3]
    spec = meta["partition-specs"][0]["fields"][0]
    assert spec["transform"] == "identity"
    assert spec["source-id"] == 3            # lang is the 3rd column
    assert spec["field-id"] == 1000
    assert meta["snapshots"][0]["summary"]["operation"] == "append"
    # manifest list is a REAL Avro container with the spec's counters
    snap = meta["snapshots"][0]
    rows = list(iter_container(
        (Path(t.dir) / snap["manifest-list"]).read_bytes()))
    assert rows[0]["added_files_count"] == 2
    assert rows[0]["added_rows_count"] == 6
    assert rows[0]["partitions"][0]["lower_bound"] == b"en"


def test_plan_missing_table_raises(tmp_path):
    with pytest.raises(ValueError):
        IcebergTable(str(tmp_path / "nope")).plan()


# --------------------------------------------------------------------------
# v2 delete files (merge-on-read)
# --------------------------------------------------------------------------


def _pq_write(path, cols):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table(cols), path)
    import os

    return os.path.getsize(path)


def test_delete_files_plan_separation(tmp_path):
    import os

    t = _table(tmp_path)
    os.makedirs(t.dir + "/data")
    size = _pq_write(t.dir + "/data/d0.parquet",
                     {"doc_id": [1, 2], "n_chars": [5, 6],
                      "lang": ["en", "en"]})
    t.commit([{"path": "data/d0.parquet", "partition": {"lang": "en"},
               "record_count": 2, "size": size}])
    dsize = _pq_write(t.dir + "/data/eq.parquet", {"doc_id": [2]})
    t.commit([{"path": "data/eq.parquet", "partition": {"lang": None},
               "record_count": 1, "size": dsize, "content": 2,
               "equality_ids": [1]}], operation="delete")
    plan = t.plan()
    assert len(plan["files"]) == 1
    assert len(plan["deletes"]) == 1
    d = plan["deletes"][0]
    assert d["content"] == 2 and d["equality_ids"] == [1]
    assert d["sequence_number"] == 2
    # delete files survive a partition filter (they may apply anywhere)
    plan_en = t.plan(partition_filter={"lang": "en"})
    assert len(plan_en["deletes"]) == 1


def test_merge_on_read_sequence_rules(tmp_path, spark):
    import os

    t = _table(tmp_path)
    os.makedirs(t.dir + "/data")

    def data_file(name, ids, lang):
        size = _pq_write(t.dir + "/" + name, {
            "doc_id": ids, "n_chars": [len(str(i)) for i in ids],
            "lang": [lang] * len(ids)})
        return {"path": name, "partition": {"lang": lang},
                "record_count": len(ids), "size": size}

    from gfw_pixetl_spark.sources.iceberg import read_iceberg

    t.commit([data_file("data/en.parquet", list(range(10)), "en")])
    t.commit([data_file("data/de.parquet", list(range(10, 15)), "de")])
    dsize = _pq_write(t.dir + "/data/eq.parquet", {"doc_id": [3, 12]})
    t.commit([{"path": "data/eq.parquet", "partition": {"lang": None},
               "record_count": 2, "size": dsize, "content": 2,
               "equality_ids": [1]}], operation="delete")
    t.commit([data_file("data/en2.parquet", [3], "en")])  # re-insert
    psize = _pq_write(t.dir + "/data/pos.parquet", {
        "file_path": ["data/en.parquet"] * 2, "pos": [0, 1]})
    t.commit([{"path": "data/pos.parquet", "partition": {"lang": None},
               "record_count": 2, "size": psize, "content": 1}],
             operation="delete")

    got = sorted(r["doc_id"]
                 for r in read_iceberg(spark, t.dir).collect())
    # 0,1 positionally deleted; 12 equality-deleted; 3 deleted then
    # RE-INSERTED at a later sequence, so it survives
    assert got == [2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14]
    # time travel to before any delete sees everything
    before = sorted(r["doc_id"] for r in read_iceberg(
        spark, t.dir, snapshot_id=2).collect())
    assert before == list(range(15))
    # partition filter composes with delete application
    en = sorted(r["doc_id"] for r in read_iceberg(
        spark, t.dir, partition_filter={"lang": "en"}).collect())
    assert en == [2, 3, 4, 5, 6, 7, 8, 9]


def test_rename_schema_evolution(spark, tmp_path):
    """Metadata-only rename by field id: files from before and after
    the rename reconcile through the schemas-history name mapping."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gfw_pixetl_spark.sources.iceberg import (
        IcebergTable,
        read_iceberg,
    )

    d = str(tmp_path / "t")
    import os

    os.makedirs(f"{d}/data", exist_ok=True)
    t = IcebergTable(d, [("k", "long"), ("v", "double")], [])
    old = pd.DataFrame({"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
    pq.write_table(pa.Table.from_pandas(old), f"{d}/data/a.parquet")
    t.commit([{"path": "data/a.parquet", "partition": {},
               "record_count": 3,
               "size": os.path.getsize(f"{d}/data/a.parquet")}])
    sid = t.update_schema({"v": "value"})
    assert sid == 1
    new = pd.DataFrame({"k": [4, 5], "value": [4.0, 5.0]})
    pq.write_table(pa.Table.from_pandas(new), f"{d}/data/b.parquet")
    t.commit([{"path": "data/b.parquet", "partition": {},
               "record_count": 2,
               "size": os.path.getsize(f"{d}/data/b.parquet")}])

    got = {(r.k, r.value) for r in read_iceberg(spark, d).collect()}
    assert got == {(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0), (5, 5.0)}
    # unknown column refused; repeated rename chains resolve
    import pytest as _pytest

    with _pytest.raises(KeyError):
        t.update_schema({"nope": "x"})
    t.update_schema({"value": "val2"})
    got2 = {(r.k, r.val2) for r in read_iceberg(spark, d).collect()}
    assert len(got2) == 5

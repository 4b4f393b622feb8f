"""Delta Lake log interop (sources/deltalog.py): commit/replay
semantics from the public protocol spec — last-writer-wins per path,
remove tombstones, resurrection, checkpoint + O(delta) replay, time
travel, log-only pruning, O_EXCL commit atomicity."""

from __future__ import annotations

import json
import os

import pytest

from gfw_pixetl_spark.sources.deltalog import (
    add_action, delta_commit, delta_metadata, delta_snapshot,
    prune_adds, remove_action, write_checkpoint,
)

META = delta_metadata(
    [("doc_id", "long"), ("n_chars", "long"), ("lang", "string")],
    ["lang"])


def _add(path, lang, n, lo, hi):
    return {"add": add_action(path, {"lang": lang}, size=1000,
                              num_records=n,
                              min_values={"doc_id": lo},
                              max_values={"doc_id": hi})}


def test_commit_replay_and_time_travel(tmp_path):
    t = str(tmp_path / "tbl")
    delta_commit(t, 0, [{"metaData": META},
                        _add("f0.parquet", "en", 10, 0, 9),
                        _add("f1.parquet", "de", 5, 10, 14)])
    delta_commit(t, 1, [{"remove": remove_action("f1.parquet")}])
    delta_commit(t, 2, [_add("f1.parquet", "de", 7, 10, 16)])

    head = delta_snapshot(t)
    assert head["version"] == 2
    assert set(head["adds"]) == {"f0.parquet", "f1.parquet"}
    # resurrection carries the NEW action
    stats = json.loads(head["adds"]["f1.parquet"]["stats"])
    assert stats["numRecords"] == 7

    v1 = delta_snapshot(t, version=1)
    assert set(v1["adds"]) == {"f0.parquet"}
    v0 = delta_snapshot(t, version=0)
    assert set(v0["adds"]) == {"f0.parquet", "f1.parquet"}
    assert json.loads(
        v0["adds"]["f1.parquet"]["stats"])["numRecords"] == 5


def test_commit_is_atomic_o_excl(tmp_path):
    t = str(tmp_path / "tbl")
    delta_commit(t, 0, [{"metaData": META}])
    with pytest.raises(FileExistsError):
        delta_commit(t, 0, [{"metaData": META}])


def test_checkpoint_replay_is_o_delta(tmp_path):
    t = str(tmp_path / "tbl")
    delta_commit(t, 0, [{"metaData": META},
                        _add("f0.parquet", "en", 10, 0, 9)])
    delta_commit(t, 1, [_add("f1.parquet", "de", 5, 10, 14)])
    write_checkpoint(t, 1)
    delta_commit(t, 2, [{"remove": remove_action("f0.parquet")}])

    # snapshot must start from the checkpoint: deleting the
    # pre-checkpoint commit files proves replay never touches them
    os.remove(os.path.join(t, "_delta_log", f"{0:020d}.json"))
    head = delta_snapshot(t)
    assert set(head["adds"]) == {"f1.parquet"}
    assert head["metadata"]["partitionColumns"] == ["lang"]


def test_checkpoint_respects_requested_version(tmp_path):
    t = str(tmp_path / "tbl")
    delta_commit(t, 0, [{"metaData": META},
                        _add("f0.parquet", "en", 10, 0, 9)])
    delta_commit(t, 1, [{"remove": remove_action("f0.parquet")}])
    write_checkpoint(t, 1)
    # time travel BELOW the checkpoint must ignore it
    v0 = delta_snapshot(t, version=0)
    assert set(v0["adds"]) == {"f0.parquet"}


def test_prune_on_partition_and_stats(tmp_path):
    t = str(tmp_path / "tbl")
    delta_commit(t, 0, [{"metaData": META},
                        _add("f0.parquet", "en", 10, 0, 9),
                        _add("f1.parquet", "de", 5, 10, 14),
                        _add("f2.parquet", "en", 5, 100, 120)])
    state = delta_snapshot(t)
    en = prune_adds(state, partition_filter={"lang": "en"})
    assert {a["path"] for a in en} == {"f0.parquet", "f2.parquet"}
    # stats range pruning: doc_id in [50, 200] -> only f2 survives
    hits = prune_adds(state, partition_filter={"lang": "en"},
                      column_ranges={"doc_id": (50, 200)})
    assert [a["path"] for a in hits] == ["f2.parquet"]
    # disjoint range -> nothing
    assert prune_adds(state, column_ranges={"doc_id": (500, 900)}) == []


def test_unknown_version_and_missing_log(tmp_path):
    t = str(tmp_path / "tbl")
    with pytest.raises(ValueError):
        delta_snapshot(t)
    delta_commit(t, 0, [{"metaData": META}])
    with pytest.raises(ValueError):
        delta_snapshot(t, version=7)


def test_future_reader_protocol_rejected(tmp_path):
    t = str(tmp_path / "tbl")
    delta_commit(t, 0, [{"protocol": {"minReaderVersion": 3,
                                      "minWriterVersion": 7}},
                        {"metaData": META}])
    with pytest.raises(ValueError):
        delta_snapshot(t)


def test_unpartitioned_checkpoint_roundtrip(tmp_path):
    """Review finding: an unpartitioned table's empty partitionValues
    inferred a zero-field struct that parquet cannot write — the
    auto-checkpoint at v10 crashed the writer."""
    t = str(tmp_path / "tbl")
    meta = delta_metadata([("doc_id", "long")], [])
    delta_commit(t, 0, [{"metaData": meta},
                        {"add": add_action("f0.parquet", {}, 10, 3)}])
    write_checkpoint(t, 0)
    delta_commit(t, 1, [{"add": add_action("f1.parquet", {}, 10, 4)}])
    head = delta_snapshot(t)
    assert set(head["adds"]) == {"f0.parquet", "f1.parquet"}
    assert head["adds"]["f0.parquet"]["partitionValues"] == {}


def test_time_travel_below_newest_checkpoint_uses_older_one(tmp_path):
    """Review finding: _last_checkpoint newer than the requested
    version forced a full-history replay even when an older
    checkpoint file was on disk."""
    import os

    t = str(tmp_path / "tbl")
    delta_commit(t, 0, [{"metaData": META},
                        _add("f0.parquet", "en", 1, 0, 9)])
    delta_commit(t, 1, [_add("f1.parquet", "de", 1, 0, 9)])
    write_checkpoint(t, 1)
    delta_commit(t, 2, [_add("f2.parquet", "es", 1, 0, 9)])
    delta_commit(t, 3, [{"remove": remove_action("f0.parquet")}])
    write_checkpoint(t, 3)
    # deleting the pre-v1 commit proves the v1 checkpoint is used for
    # the version=2 read even though _last_checkpoint points at v3
    os.remove(os.path.join(t, "_delta_log", f"{0:020d}.json"))
    v2 = delta_snapshot(t, version=2)
    assert set(v2["adds"]) == {"f0.parquet", "f1.parquet", "f2.parquet"}


def test_read_delta_partition_literals_are_typed(tmp_path, spark):
    """Review finding: partition columns came back as strings
    regardless of the declared schema type."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "tbl")
    os.makedirs(t)
    pq.write_table(pa.table({"doc_id": pa.array([1, 2], pa.int64())}),
                   os.path.join(t, "f0.parquet"))
    meta = delta_metadata([("doc_id", "long"), ("year", "integer")],
                          ["year"])
    delta_commit(t, 0, [{"metaData": meta},
                        {"add": add_action("f0.parquet",
                                           {"year": 2024}, 10, 2)}])
    from gfw_pixetl_spark.sources.deltalog import read_delta

    df = read_delta(spark, t)
    assert dict(df.dtypes)["year"] == "int"
    assert df.filter(df.year == 2024).count() == 2

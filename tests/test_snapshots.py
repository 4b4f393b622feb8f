"""Snapshot-versioned parquet tables (sources/snapshots.py): manifest
commits, time travel, incremental diff, and the create-exclusive race
protocol."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from gfw_pixetl_spark.sources.snapshots import (
    diff_files,
    latest_version,
    read_diff,
    read_manifest,
    read_snapshot,
    snapshot_append,
)


@pytest.fixture(scope="module")
def spark():
    from gfw_pixetl_spark.session import get_spark

    s = get_spark("test-snapshots")
    s.sparkContext.setLogLevel("ERROR")
    return s


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).selectExpr(
        "id", f"'{tag}' AS tag", "id * 2 AS v")


def test_append_time_travel_and_diff(spark, tmp_path):
    d = str(tmp_path / "tbl")
    assert latest_version(d) == 0
    v1 = snapshot_append(_df(spark, 0, 10, "a"), d)
    v2 = snapshot_append(_df(spark, 10, 25, "b"), d)
    assert (v1, v2) == (1, 2)
    assert latest_version(d) == 2
    # time travel: v1 sees only the first commit
    assert read_snapshot(spark, d, 1).count() == 10
    assert read_snapshot(spark, d).count() == 25
    # incremental: exactly the second commit's rows
    inc = read_diff(spark, d, 1, 2)
    assert inc.count() == 15
    assert inc.agg({"id": "min"}).first()[0] == 10
    # manifests carry lineage
    m2 = read_manifest(d, 2)
    assert m2["parent"] == 1 and m2["added_rows"] == 15
    assert set(m2["files"]) >= set(read_manifest(d, 1)["files"])


def test_old_snapshots_survive_later_appends(spark, tmp_path):
    d = str(tmp_path / "tbl2")
    snapshot_append(_df(spark, 0, 5, "a"), d)
    first = read_snapshot(spark, d, 1).orderBy("id").collect()
    snapshot_append(_df(spark, 5, 9, "b"), d)
    snapshot_append(_df(spark, 9, 11, "c"), d)
    again = read_snapshot(spark, d, 1).orderBy("id").collect()
    assert first == again  # immutable history
    assert read_snapshot(spark, d, 3).count() == 11


def test_commit_race_loser_retries_with_new_parent(spark, tmp_path):
    """Simulate losing the O_EXCL race: pre-create the version file the
    writer is about to claim; the commit must retry on top of it and
    land as the NEXT version, chaining its files."""
    d = str(tmp_path / "tbl3")
    snapshot_append(_df(spark, 0, 4, "a"), d)
    # an interloping commit appears between staging and manifest write
    interloper = {
        "version": 2, "parent": 1, "operation": "append",
        "files": read_manifest(d, 1)["files"], "added_files": [],
        "added_rows": 0,
    }
    with open(os.path.join(d, "_snapshots", "v2.json"), "w") as f:
        json.dump(interloper, f)
    v = snapshot_append(_df(spark, 4, 7, "b"), d)
    assert v == 3
    m3 = read_manifest(d, 3)
    assert m3["parent"] == 2
    assert read_snapshot(spark, d, 3).count() == 7


def test_diff_from_empty_is_full_table(spark, tmp_path):
    d = str(tmp_path / "tbl4")
    snapshot_append(_df(spark, 0, 6, "a"), d)
    assert len(diff_files(d, 0, 1)) == len(read_manifest(d, 1)["files"])
    assert read_diff(spark, d, 0, 1).count() == 6


def test_compaction_preserves_rows_and_history(spark, tmp_path):
    from gfw_pixetl_spark.sources.snapshots import snapshot_compact

    d = str(tmp_path / "tbl5")
    snapshot_append(_df(spark, 0, 7, "a").repartition(4), d)
    snapshot_append(_df(spark, 7, 12, "b").repartition(4), d)
    files_before = len(read_manifest(d, 2)["files"])
    v = snapshot_compact(spark, d, target_files=2)
    assert v == 3
    m3 = read_manifest(d, 3)
    assert m3["operation"] == "compact"
    assert len(m3["files"]) == 2 < files_before
    # head rows identical, history untouched
    head = {r["id"] for r in read_snapshot(spark, d, 3).collect()}
    assert head == set(range(12))
    assert read_snapshot(spark, d, 1).count() == 7
    assert read_snapshot(spark, d, 2).count() == 12


def test_equality_delete_sequence_semantics(spark, tmp_path):
    """Delete suppresses only lower-sequence data files; re-inserted
    keys reappear; pre-delete versions time-travel unchanged."""
    from gfw_pixetl_spark.sources.snapshots import (
        read_snapshot, snapshot_append, snapshot_delete,
    )

    d = str(tmp_path / "tab")
    df = spark.createDataFrame(
        [(i, f"u{i}") for i in range(20)], "id long, name string")
    snapshot_append(df.filter("id % 2 = 0"), d)
    v2 = snapshot_append(df.filter("id % 2 = 1"), d)
    keys = spark.createDataFrame([(3,), (4,), (5,)], "id long")
    v3 = snapshot_delete(keys, d, ["id"])
    v4 = snapshot_append(df.filter("id in (3, 5)"), d)

    def ids(v):
        return sorted(r.id for r in read_snapshot(spark, d, v).collect())

    assert ids(v2) == list(range(20))
    assert ids(v3) == [i for i in range(20) if i not in (3, 4, 5)]
    assert ids(v4) == sorted(
        [i for i in range(20) if i not in (3, 4, 5)] + [3, 5])
    # time travel to the pre-delete version is untouched after all that
    assert ids(v2) == list(range(20))


def test_compaction_purges_deletes(spark, tmp_path):
    """Compaction reads through the delete filter: the new manifest has
    no delete entries and the suppressed rows are physically gone."""
    from gfw_pixetl_spark.sources.snapshots import (
        read_manifest, read_snapshot, snapshot_append, snapshot_compact,
        snapshot_delete,
    )

    d = str(tmp_path / "tab")
    df = spark.createDataFrame([(i,) for i in range(10)], "id long")
    snapshot_append(df, d)
    snapshot_delete(spark.createDataFrame([(7,)], "id long"), d, ["id"])
    v = snapshot_compact(spark, d, target_files=1)
    m = read_manifest(d, v)
    assert m["deletes"] == [] and len(m["files"]) == 1
    got = sorted(r.id for r in read_snapshot(spark, d, v).collect())
    assert got == [i for i in range(10) if i != 7]


def test_delete_plan_broadcasts_keys(spark, tmp_path):
    """The merge-on-read join must broadcast the delete-key side — the
    table-scale side never reshuffles."""
    from gfw_pixetl_spark.sources.snapshots import (
        read_snapshot, snapshot_append, snapshot_delete,
    )

    d = str(tmp_path / "tab")
    df = spark.createDataFrame([(i,) for i in range(50)], "id long")
    snapshot_append(df, d)
    snapshot_delete(spark.createDataFrame([(1,)], "id long"), d, ["id"])
    plan = read_snapshot(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_zone_map_pruning(spark, tmp_path):
    """Manifest min/max stats prune provably-empty files; results equal
    the unpruned read + filter; files without stats are kept."""
    from gfw_pixetl_spark.sources.snapshots import (
        prune_files, read_manifest, read_snapshot, snapshot_append,
    )

    d = str(tmp_path / "tab")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(400)], "id long, v long")
    for lo in (0, 100, 200, 300):
        snapshot_append(
            df.filter(f"id >= {lo} and id < {lo + 100}").coalesce(1),
            d, stats_cols=["id"])
    m = read_manifest(d, 4)
    assert len(m["files"]) == 4 and len(m["stats"]) == 4
    kept = prune_files(m, "id", 120, 180)
    assert len(kept) == 1
    got = sorted(r.id for r in
                 read_snapshot(spark, d, between=("id", 120, 180))
                 .collect())
    assert got == list(range(120, 181))
    # stats-less manifests never prune (safety)
    m_nostats = dict(m, stats={})
    assert len(prune_files(m_nostats, "id", 120, 180)) == 4


def test_zone_map_survives_compaction_and_deletes(spark, tmp_path):
    from gfw_pixetl_spark.sources.snapshots import (
        read_manifest, read_snapshot, snapshot_append, snapshot_compact,
        snapshot_delete,
    )

    d = str(tmp_path / "tab")
    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    snapshot_append(df.filter("id < 50").coalesce(1), d,
                    stats_cols=["id"])
    snapshot_append(df.filter("id >= 50").coalesce(1), d,
                    stats_cols=["id"])
    snapshot_delete(spark.createDataFrame([(7,), (77,)], "id long"),
                    d, ["id"])
    # pruned read composes with merge-on-read deletes
    got = sorted(r.id for r in
                 read_snapshot(spark, d, between=("id", 0, 20)).collect())
    assert got == [i for i in range(21) if i != 7]
    v = snapshot_compact(spark, d, target_files=2)
    m = read_manifest(d, v)
    assert m["stats"] and all("id" in s for s in m["stats"].values())


def test_streaming_sink_exactly_once(spark, tmp_path):
    """Re-delivered micro-batches are no-ops: the batch_id rides in the
    manifest, so a crash-replay append never double-counts."""
    from gfw_pixetl_spark.sources.snapshots import read_snapshot
    from gfw_pixetl_spark.streaming.snapshot_sink import SnapshotTableSink

    d = str(tmp_path / "tab")
    sink = SnapshotTableSink(d, str(tmp_path / "ckpt"), stats_cols=["id"])
    b0 = spark.createDataFrame([(1,), (2,)], "id long")
    b1 = spark.createDataFrame([(3,)], "id long")
    sink.process_batch(b0, 0)
    sink.process_batch(b1, 1)
    sink.process_batch(b0, 0)  # crash replay of batch 0
    sink.process_batch(b1, 1)  # and of batch 1
    got = sorted(r.id for r in read_snapshot(spark, d).collect())
    assert got == [1, 2, 3]
    assert sink.committed_batch_ids() == {0, 1}


def test_streaming_sink_available_now(spark, tmp_path):
    """End-to-end: a real readStream drains into snapshot commits via
    foreachBatch; the table equals the batch read."""
    from gfw_pixetl_spark.sources.snapshots import read_snapshot
    from gfw_pixetl_spark.streaming.snapshot_sink import SnapshotTableSink

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, i * 2) for i in range(30)], "id long, v long"
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    sink = SnapshotTableSink(str(tmp_path / "tab"),
                             str(tmp_path / "ckpt"))
    sink.run_available_now(stream)
    got = sorted(r.id for r in
                 read_snapshot(spark, str(tmp_path / "tab")).collect())
    assert got == list(range(30))
    # a second availableNow run with the same checkpoint adds nothing
    sink.run_available_now(
        spark.readStream.schema(schema).parquet(src))
    got = sorted(r.id for r in
                 read_snapshot(spark, str(tmp_path / "tab")).collect())
    assert got == list(range(30))


def test_vacuum_drops_history_below_horizon(spark, tmp_path):
    import os

    import pytest as _pytest

    from gfw_pixetl_spark.sources.snapshots import (
        read_snapshot, snapshot_append, snapshot_compact, snapshot_vacuum,
    )

    d = str(tmp_path / "tab")
    df = spark.createDataFrame([(i,) for i in range(20)], "id long")
    snapshot_append(df.filter("id < 10").coalesce(1), d)
    snapshot_append(df.filter("id >= 10").coalesce(1), d)
    snapshot_compact(spark, d, target_files=1)  # v3 references 1 file
    n_before = len(os.listdir(os.path.join(d, "data")))
    out = snapshot_vacuum(d, keep_last=1, min_age_seconds=0)
    assert out["horizon"] == 3 and out["removed_manifests"] == 2
    assert len(os.listdir(os.path.join(d, "data"))) \
        == n_before - out["removed_data_files"]
    # head still reads perfectly
    got = sorted(r.id for r in read_snapshot(spark, d).collect())
    assert got == list(range(20))
    # time travel below the horizon is gone, explicitly
    with _pytest.raises(FileNotFoundError):
        read_snapshot(spark, d, 1).collect()


def test_vacuum_retention_window_spares_inflight_commits(spark, tmp_path):
    """The min_age guard: a file staged by an in-flight commit (moved
    into data/ BEFORE the manifest O_EXCL) and an active _stage_ dir
    are unreferenced *right now* but young — a default-window vacuum
    must leave them alone, so a racing writer's commit never ends up
    referencing deleted files."""
    import os

    from gfw_pixetl_spark.sources.snapshots import (
        snapshot_append, snapshot_vacuum,
    )

    d = str(tmp_path / "tab")
    df = spark.createDataFrame([(i,) for i in range(10)], "id long")
    snapshot_append(df.coalesce(1), d)
    # simulate a racing writer mid-_stage_files: data file moved in,
    # manifest not yet committed
    orphan = os.path.join(d, "data", "deadbeef-part-inflight.parquet")
    with open(orphan, "wb") as f:
        f.write(b"PAR1stub")
    stage = os.path.join(d, "_stage_inflight")
    os.makedirs(stage)
    out = snapshot_vacuum(d, keep_last=1)  # default 1h window
    assert out["removed_data_files"] == 0
    assert out["removed_stage_dirs"] == 0
    assert os.path.exists(orphan) and os.path.isdir(stage)
    # an aged-out orphan IS collected
    old = __import__("time").time() - 7200
    os.utime(orphan, (old, old))
    os.utime(stage, (old, old))
    out = snapshot_vacuum(d, keep_last=1)
    assert out["removed_data_files"] == 1
    assert out["removed_stage_dirs"] == 1
    assert not os.path.exists(orphan) and not os.path.isdir(stage)


def test_streaming_sink_idempotent_across_vacuum(spark, tmp_path):
    """max_batch_id rides in every manifest (carried forward like
    seqs), so vacuuming the manifests that recorded old batch_ids
    cannot resurrect a replayed batch."""
    from gfw_pixetl_spark.sources.snapshots import (
        read_snapshot, snapshot_compact, snapshot_vacuum,
    )
    from gfw_pixetl_spark.streaming.snapshot_sink import SnapshotTableSink

    d = str(tmp_path / "tab")
    sink = SnapshotTableSink(d, str(tmp_path / "ckpt"))
    b0 = spark.createDataFrame([(1,), (2,)], "id long")
    b1 = spark.createDataFrame([(3,)], "id long")
    sink.process_batch(b0, 0)   # v1
    sink.process_batch(b1, 1)   # v2
    snapshot_compact(spark, d, target_files=1)  # v3: no batch_id of its own
    snapshot_vacuum(d, keep_last=1, min_age_seconds=0)  # drops v1, v2
    assert sink.batch_high_water_mark() == 1  # survived in v3's manifest
    sink.process_batch(b0, 0)  # replay after vacuum: must be a no-op
    sink.process_batch(b1, 1)
    got = sorted(r.id for r in read_snapshot(spark, d).collect())
    assert got == [1, 2, 3]


def test_partition_spec_evolution_prunes_both_layouts(spark, tmp_path):
    """Two partition specs live in one table: files keep the spec they
    were written under, prune_files applies each file's own transform,
    and time travel below the spec change prunes under the old spec."""
    from gfw_pixetl_spark.sources.snapshots import (
        prune_files, read_manifest, read_snapshot, snapshot_append,
    )

    d = str(tmp_path / "tab")
    df = spark.createDataFrame([(i, i * 2) for i in range(400)],
                               "id long, v long")
    snapshot_append(df.filter("id < 200"), d,
                    partition_spec={"col": "id", "transform": "truncate",
                                    "param": 100})
    snapshot_append(df.filter("id >= 200"), d,
                    partition_spec={"col": "id", "transform": "truncate",
                                    "param": 50})
    m2 = read_manifest(d, 2)
    assert len(m2["specs"]) == 2  # evolution, not rewrite
    assert len(m2["files"]) == 2 + 4
    # per-file spec application: [120, 260] needs 1 coarse + 2 fine files
    kept = prune_files(m2, "id", 120, 260)
    assert len(kept) == 3
    got = sorted(r.id for r in read_snapshot(
        spark, d, between=("id", 120, 260)).collect())
    assert got == list(range(120, 261))
    # time travel to v1: only the coarse spec exists
    m1 = read_manifest(d, 1)
    assert len(m1["specs"]) == 1 and len(m1["files"]) == 2
    assert len(prune_files(m1, "id", 120, 260)) == 1
    got = sorted(r.id for r in read_snapshot(
        spark, d, version=1, between=("id", 120, 260)).collect())
    assert got == list(range(120, 200))
    # identical re-used spec does NOT mint a third id
    snapshot_append(df.filter("id < 10"), d,
                    partition_spec={"col": "id", "transform": "truncate",
                                    "param": 50})
    assert len(read_manifest(d, 3)["specs"]) == 2


def test_partition_spec_survives_delete_and_compact(spark, tmp_path):
    """Spec metadata rides through delete commits (files unchanged) and
    is trimmed at compaction (rewritten files are unpartitioned)."""
    from gfw_pixetl_spark.sources.snapshots import (
        prune_files, read_manifest, read_snapshot, snapshot_append,
        snapshot_compact, snapshot_delete,
    )

    d = str(tmp_path / "tab")
    df = spark.createDataFrame([(i,) for i in range(200)], "id long")
    snapshot_append(df, d, partition_spec={
        "col": "id", "transform": "truncate", "param": 100})
    snapshot_delete(spark.createDataFrame([(7,)], "id long"), d, ["id"])
    m = read_manifest(d, 2)
    assert m["specs"] and len(m["file_parts"]) == 2
    assert len(prune_files(m, "id", 0, 50)) == 1  # pruning still works
    got = sorted(r.id for r in read_snapshot(
        spark, d, between=("id", 0, 50)).collect())
    assert got == [i for i in range(51) if i != 7]
    v = snapshot_compact(spark, d, target_files=1)
    m = read_manifest(d, v)
    # rewritten files carry no partition entries; history (specs) stays
    assert m.get("file_parts", {}) == {}
    assert sorted(r.id for r in read_snapshot(spark, d).collect()) \
        == [i for i in range(200) if i != 7]


def test_identity_partition_spec(spark, tmp_path):
    from gfw_pixetl_spark.sources.snapshots import (
        prune_files, read_manifest, read_snapshot, snapshot_append,
    )

    d = str(tmp_path / "tab")
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(90)], "id long, grp long")
    snapshot_append(df, d, partition_spec={"col": "grp",
                                           "transform": "identity"})
    m = read_manifest(d, 1)
    assert len(m["files"]) == 3
    assert len(prune_files(m, "grp", 1, 1)) == 1
    got = sorted(r.id for r in read_snapshot(
        spark, d, between=("grp", 1, 1)).collect())
    assert got == [i for i in range(90) if i % 3 == 1]


def test_tags_pin_versions_through_vacuum(spark, tmp_path):
    import pytest as _pytest

    from gfw_pixetl_spark.sources.snapshots import (
        drop_tag, list_tags, read_snapshot, snapshot_append,
        snapshot_compact, snapshot_tag, snapshot_vacuum,
    )

    d = str(tmp_path / "tab")
    df = spark.createDataFrame([(i,) for i in range(40)], "id long")
    snapshot_append(df.filter("id < 20"), d)        # v1
    snapshot_tag(d, "baseline")
    snapshot_append(df.filter("id >= 20"), d)       # v2
    snapshot_compact(spark, d, target_files=1)      # v3
    assert list_tags(d) == {"baseline": 1}
    # a tag is immutable
    with _pytest.raises(FileExistsError):
        snapshot_tag(d, "baseline", 2)
    out = snapshot_vacuum(d, keep_last=1, min_age_seconds=0)
    assert out["removed_manifests"] == 1  # v2 only; v1 pinned by tag
    got = sorted(r.id for r in read_snapshot(spark, d,
                                             ref="baseline").collect())
    assert got == list(range(20))
    got = sorted(r.id for r in read_snapshot(spark, d).collect())
    assert got == list(range(40))
    with _pytest.raises(KeyError, match="unknown ref"):
        read_snapshot(spark, d, ref="nope")
    # dropping the tag releases the pin on the next vacuum
    drop_tag(d, "baseline")
    snapshot_vacuum(d, keep_last=1, min_age_seconds=0)
    with _pytest.raises(FileNotFoundError):
        read_snapshot(spark, d, 1).collect()


def test_dynamic_partition_overwrite(spark, tmp_path):
    from gfw_pixetl_spark.sources.snapshots import (
        read_changes, read_manifest, read_snapshot, snapshot_append,
        snapshot_overwrite_partitions,
    )

    d = str(tmp_path / "tab")
    spec = {"col": "id", "transform": "truncate", "param": 10}
    df = spark.createDataFrame([(i, i) for i in range(30)],
                               "id long, v long")
    snapshot_append(df, d, partition_spec=spec)  # 3 files: 0, 10, 20
    rebuilt = df.filter("id >= 10 and id < 20").withColumn(
        "v", F.col("v") + 100)
    snapshot_overwrite_partitions(rebuilt, d, spec)
    m = read_manifest(d, 2)
    assert m["replaced_files"] == 1 and len(m["files"]) == 3
    got = {r.id: r.v for r in read_snapshot(spark, d).collect()}
    assert all(got[i] == (i + 100 if 10 <= i < 20 else i)
               for i in range(30))
    # time travel sees the pre-overwrite rows
    got1 = {r.id: r.v for r in read_snapshot(spark, d, 1).collect()}
    assert all(got1[i] == i for i in range(30))
    # change feed: replaced rows as deletes, new rows as inserts
    ch = read_changes(spark, d, 1, 2).collect()
    dels = sorted(r.id for r in ch if r._change_type == "delete")
    ins = sorted(r.id for r in ch if r._change_type == "insert")
    assert dels == list(range(10, 20)) and ins == list(range(10, 20))
    # a different spec never replaces the other spec's files
    other = df.filter("id < 5").withColumn("v", F.lit(0).cast("long"))
    snapshot_overwrite_partitions(
        other, d, {"col": "id", "transform": "truncate", "param": 5})
    m3 = read_manifest(d, 3)
    assert m3["replaced_files"] == 0  # spec mismatch: append-like
    got = {r.id: r.v for r in read_snapshot(spark, d).collect()}
    # both the old and new rows for id<5 are present (no replacement)
    assert sorted(r.id for r in read_snapshot(spark, d).collect()
                  ).count(3) == 2


def test_change_data_feed_order_and_compact_silence(spark, tmp_path):
    from gfw_pixetl_spark.sources.snapshots import (
        read_changes, snapshot_append, snapshot_compact, snapshot_delete,
    )

    d = str(tmp_path / "tab")
    df = spark.createDataFrame(
        [(i, f"u{i}") for i in range(10)], "id long, name string")
    snapshot_append(df.filter("id < 5"), d)          # v1
    snapshot_append(df.filter("id >= 5"), d)         # v2
    snapshot_delete(spark.createDataFrame([(2,), (7,)], "id long"),
                    d, ["id"])                        # v3
    snapshot_compact(spark, d, target_files=1)       # v4: silent
    ch = read_changes(spark, d, 0, 4).collect()
    by = {}
    for r in ch:
        by.setdefault((r._commit_version, r._change_type), []).append(r.id)
    assert sorted(by[(1, "insert")]) == [0, 1, 2, 3, 4]
    assert sorted(by[(2, "insert")]) == [5, 6, 7, 8, 9]
    # the delete emits the ACTUAL rows (with their payload columns)
    assert sorted(by[(3, "delete")]) == [2, 7]
    deleted = [r for r in ch if r._change_type == "delete"]
    assert {r.name for r in deleted} == {"u2", "u7"}
    assert not any(v == 4 for v, _ in by)  # compaction is silent


def test_schema_evolution_merge(spark, tmp_path):
    from gfw_pixetl_spark.sources.snapshots import (
        read_snapshot, snapshot_append,
    )

    d = str(tmp_path / "tab")
    snapshot_append(spark.createDataFrame([(1,)], "id long"), d)
    snapshot_append(
        spark.createDataFrame([(2, "fr")], "id long, lang string"), d)
    got = {r.id: r for r in
           read_snapshot(spark, d, merge_schema=True).collect()}
    assert got[1].lang is None and got[2].lang == "fr"


def test_change_feed_consumer_cursor(spark, tmp_path):
    from gfw_pixetl_spark.sources.snapshots import (
        snapshot_append, snapshot_delete,
    )
    from gfw_pixetl_spark.streaming.snapshot_sink import ChangeFeedConsumer

    d = str(tmp_path / "tab")
    cur = str(tmp_path / "cursor")
    df = spark.createDataFrame([(i,) for i in range(6)], "id long")
    snapshot_append(df.filter("id < 3"), d)
    c = ChangeFeedConsumer(d, cur)
    ch, head = c.poll(spark)
    assert sorted(r.id for r in ch.collect()) == [0, 1, 2]
    c.commit(head)
    assert c.poll(spark) == (None, head)  # drained
    snapshot_append(df.filter("id >= 3"), d)
    snapshot_delete(spark.createDataFrame([(1,)], "id long"), d, ["id"])
    ch, head2 = c.poll(spark)
    rows = [(r._commit_version, r._change_type, r.id)
            for r in ch.collect()]
    assert sorted(rows) == [(2, "insert", 3), (2, "insert", 4),
                            (2, "insert", 5), (3, "delete", 1)]
    c.commit(head2)
    # crash before commit would re-read: position persists across objects
    assert ChangeFeedConsumer(d, cur).position() == head2


def test_merge_upsert_delete_atomic(spark, tmp_path):
    from gfw_pixetl_spark.sources.snapshots import snapshot_merge

    d = str(tmp_path / "merge")
    v1 = snapshot_append(_df(spark, 0, 10, "base"), d)
    # UPDATE ids 0-2 (v -> 999), INSERT ids 100-101, DELETE ids 8-9
    src = spark.createDataFrame(
        [(0, "upd", 999), (1, "upd", 999), (2, "upd", 999),
         (100, "new", 1), (101, "new", 1),
         (8, "del", 0), (9, "del", 0)],
        "id long, tag string, v long",
    )
    v2 = snapshot_merge(src, d, ["id"], delete_condition="tag = 'del'")
    assert (v1, v2) == (1, 2)  # one commit for all three arms

    rows = {r.id: (r.tag, r.v)
            for r in read_snapshot(spark, d, 2).collect()}
    assert set(rows) == {0, 1, 2, 3, 4, 5, 6, 7, 100, 101}
    for i in (0, 1, 2):
        assert rows[i] == ("upd", 999)       # matched -> updated
    for i in (3, 4, 5, 6, 7):
        assert rows[i] == ("base", i * 2)    # untouched
    for i in (100, 101):
        assert rows[i] == ("new", 1)         # not matched -> inserted

    # pre-merge version is untouched by the merge (time travel)
    pre = {r.id for r in read_snapshot(spark, d, 1).collect()}
    assert pre == set(range(10))


def test_merge_then_remerge_same_key_wins_latest(spark, tmp_path):
    from gfw_pixetl_spark.sources.snapshots import snapshot_merge

    d = str(tmp_path / "merge2")
    snapshot_append(_df(spark, 0, 4, "base"), d)
    one = spark.createDataFrame([(1, "m1", 10)], "id long, tag string, v long")
    two = spark.createDataFrame([(1, "m2", 20)], "id long, tag string, v long")
    snapshot_merge(one, d, ["id"])
    snapshot_merge(two, d, ["id"])
    rows = {r.id: (r.tag, r.v) for r in read_snapshot(spark, d).collect()}
    assert rows[1] == ("m2", 20)  # the later merge's delete governs m1's file
    assert rows[0] == ("base", 0)


def test_two_streaming_sinks_independent_marks(spark, tmp_path):
    """ADVICE r5: two streaming queries (separate checkpoints, batch ids
    both restarting at 0) appending to one table must not filter each
    other — the replay mark is keyed by sink identity (txn_app_id), not
    a global high-water mark."""
    from gfw_pixetl_spark.sources.snapshots import read_snapshot
    from gfw_pixetl_spark.streaming.snapshot_sink import SnapshotTableSink

    d = str(tmp_path / "tab")
    a = SnapshotTableSink(d, str(tmp_path / "ckpt_a"))
    b = SnapshotTableSink(d, str(tmp_path / "ckpt_b"))
    a.process_batch(spark.createDataFrame([(1,), (2,)], "id long"), 0)
    a.process_batch(spark.createDataFrame([(3,)], "id long"), 1)
    # sink B starts fresh at batch 0 — must NOT be skipped as a replay
    b.process_batch(spark.createDataFrame([(10,)], "id long"), 0)
    b.process_batch(spark.createDataFrame([(11,)], "id long"), 1)
    # replays on both sinks stay no-ops
    a.process_batch(spark.createDataFrame([(1,), (2,)], "id long"), 0)
    b.process_batch(spark.createDataFrame([(10,)], "id long"), 0)
    got = sorted(r.id for r in read_snapshot(spark, d).collect())
    assert got == [1, 2, 3, 10, 11]
    assert a.batch_high_water_mark() == 1
    assert b.batch_high_water_mark() == 1
    assert a.committed_batch_ids() == {0, 1}


def test_two_sinks_marks_survive_compaction(spark, tmp_path):
    """batch_hwms carries forward through commits that have no batch_id
    of their own (compaction), per sink."""
    from gfw_pixetl_spark.sources.snapshots import (
        read_snapshot, snapshot_compact,
    )
    from gfw_pixetl_spark.streaming.snapshot_sink import SnapshotTableSink

    d = str(tmp_path / "tab")
    a = SnapshotTableSink(d, str(tmp_path / "ckpt_a"))
    b = SnapshotTableSink(d, str(tmp_path / "ckpt_b"))
    a.process_batch(spark.createDataFrame([(1,)], "id long"), 0)
    b.process_batch(spark.createDataFrame([(2,)], "id long"), 0)
    snapshot_compact(spark, d, target_files=1)
    assert a.batch_high_water_mark() == 0
    assert b.batch_high_water_mark() == 0
    a.process_batch(spark.createDataFrame([(1,)], "id long"), 0)  # replay
    got = sorted(r.id for r in read_snapshot(spark, d).collect())
    assert got == [1, 2]


def test_decimal_partition_values_never_misprune(spark, tmp_path):
    """ADVICE r5: identity-partition values of DECIMAL columns must not
    round-trip through float — a non-float-representable decimal at a
    range boundary could then be 'provably' excluded, silently pruning
    live rows. Decimals are recorded as strings; the typed comparison
    in _part_excludes raises TypeError and the file is KEPT."""
    from decimal import Decimal

    from gfw_pixetl_spark.sources.snapshots import (
        prune_files, read_manifest, snapshot_append,
    )

    d = str(tmp_path / "tab")
    df = spark.createDataFrame(
        [(Decimal("0.10"),), (Decimal("0.30"),)],
        "price decimal(10,2)",
    )
    snapshot_append(df, d, partition_spec={"col": "price"})
    m = read_manifest(d, 1)
    vals = set(m["file_parts"].values())
    assert all(isinstance(v, str) for v in vals)  # exact text, not float
    # a range query at the exact boundary keeps every file it might need
    kept = prune_files(m, "price", 0.10, 0.10)
    files_with_010 = [f for f, v in m["file_parts"].items()
                      if v.rstrip("0").rstrip(".") in ("0.1",)]
    assert set(files_with_010) <= set(kept)


def test_pre_upgrade_untagged_writer_resumes_after_new_sink(spark, tmp_path):
    """ADVICE r6: a pre-upgrade (untagged) writer that resumes after a
    different new-identity sink has committed once must not see -1 from
    batch_hwms (which lacks its app_id) and re-append already-committed
    batches — the untagged-commit scan is the fallback."""
    from gfw_pixetl_spark.sources.snapshots import (
        read_snapshot, snapshot_append,
    )
    from gfw_pixetl_spark.streaming.snapshot_sink import SnapshotTableSink

    d = str(tmp_path / "tab")
    # pre-upgrade commits: batch_id recorded, NO txn_app_id
    snapshot_append(spark.createDataFrame([(1,)], "id long"), d,
                    extra={"batch_id": 0})
    snapshot_append(spark.createDataFrame([(2,)], "id long"), d,
                    extra={"batch_id": 1})
    # a new-identity sink commits once -> HEAD manifest gains batch_hwms
    # (on a table with untagged history the legacy max_batch_id governs
    # the new sink too — single-writer-by-contract — so its first
    # accepted batch id must exceed the legacy mark)
    other = SnapshotTableSink(d, str(tmp_path / "ckpt_other"))
    other.process_batch(spark.createDataFrame([(10,)], "id long"), 5)
    # the pre-upgrade writer resumes, now upgraded to a tagged identity
    legacy = SnapshotTableSink(d, str(tmp_path / "ckpt_legacy"))
    assert legacy.batch_high_water_mark() == 1  # untagged history, not -1
    legacy.process_batch(spark.createDataFrame([(1,)], "id long"), 0)
    legacy.process_batch(spark.createDataFrame([(2,)], "id long"), 1)
    legacy.process_batch(spark.createDataFrame([(3,)], "id long"), 2)
    got = sorted(r.id for r in read_snapshot(spark, d).collect())
    assert got == [1, 2, 3, 10]  # replays were no-ops, batch 2 landed
    # and the fresh-identity sink still starts at -1 on a tagged table
    fresh = SnapshotTableSink(d, str(tmp_path / "ckpt_fresh"))
    assert fresh.batch_high_water_mark() == 1  # untagged commits count

"""Snapshot-versioned parquet tables: manifest-based commits, time
travel, and incremental diffs — the Iceberg/Delta mechanics a 100 TB
store needs, in a dependency-free layout.

The reference's closest analog is the tiles.geojson manifest the prep
job merges (``gfw_pixetl/pixetl.py`` target-exists skip +
``prep`` manifest writes); this module generalizes that idea to the
table level the way modern lakehouse formats do:

* ``<table>/data/<uuid>-part-*.parquet`` — immutable data files; a
  writer NEVER mutates or deletes another commit's files.
* ``<table>/_snapshots/v<N>.json`` — the manifest: the complete file
  list visible at version N plus lineage (parent, files added, row
  counts). Readers plan from the manifest, so a snapshot read of a
  100k-file table opens ONE json before touching data, and old
  versions stay readable forever (time travel).
* Commit protocol: the manifest is written with ``O_CREAT | O_EXCL`` —
  creation IS the commit (same trick as Delta's transaction log). Two
  racing writers produce two version files; exactly one wins each
  version number and the loser retries against the new parent, so
  appends serialize without a lock server.

Incremental consumption (``diff_files``) is the CDC shape: the files
added between two snapshots, read directly — no full-table scan to
find "what's new", which is what keeps a downstream incremental job
O(delta) instead of O(table).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_SNAP_DIR = "_snapshots"


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _SNAP_DIR, f"v{version}.json")


def latest_version(table_dir: str) -> int:
    """Highest committed version (0 = empty table, no snapshots)."""
    d = os.path.join(table_dir, _SNAP_DIR)
    if not os.path.isdir(d):
        return 0
    versions = [
        int(f[1:-5]) for f in os.listdir(d)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions, default=0)


def read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def snapshot_append(
    df: DataFrame, table_dir: str, max_retries: int = 10
) -> int:
    """Append ``df`` as a new snapshot; returns the committed version.

    Data files are written once under a unique prefix (they are dead
    weight, not corruption, if the commit loses every retry); the
    manifest create-exclusive is the atomic commit point.
    """
    data_dir = os.path.join(table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(os.path.join(table_dir, _SNAP_DIR), exist_ok=True)
    stage = os.path.join(table_dir, f"_stage_{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(stage)
    added = []
    for name in sorted(os.listdir(stage)):
        if not name.endswith(".parquet"):
            continue
        dst = f"{uuid.uuid4().hex[:12]}-{name}"
        os.rename(os.path.join(stage, name),
                  os.path.join(data_dir, dst))
        added.append(os.path.join("data", dst))
    for leftover in os.listdir(stage):
        os.remove(os.path.join(stage, leftover))
    os.rmdir(stage)

    n_rows = df.count()
    for _ in range(max_retries):
        parent = latest_version(table_dir)
        files = (read_manifest(table_dir, parent)["files"]
                 if parent else [])
        manifest = {
            "version": parent + 1,
            "parent": parent,
            "operation": "append",
            "files": files + added,
            "added_files": added,
            "added_rows": n_rows,
        }
        path = _manifest_path(table_dir, parent + 1)
        try:
            fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            continue  # lost the race: re-read the new parent and retry
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        return parent + 1
    raise RuntimeError(f"snapshot commit lost {max_retries} races")


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the table as of ``version`` (default: latest). Planning cost
    is one manifest, regardless of table size."""
    v = latest_version(table_dir) if version is None else version
    files = [os.path.join(table_dir, f)
             for f in read_manifest(table_dir, v)["files"]]
    return spark.read.parquet(*files)


def diff_files(table_dir: str, v_from: int, v_to: int) -> list[str]:
    """Data files added in (v_from, v_to] — the incremental-read set."""
    base = set(read_manifest(table_dir, v_from)["files"]) if v_from \
        else set()
    return [
        os.path.join(table_dir, f)
        for f in read_manifest(table_dir, v_to)["files"]
        if f not in base
    ]


def read_diff(
    spark: SparkSession, table_dir: str, v_from: int, v_to: int
) -> DataFrame:
    files = diff_files(table_dir, v_from, v_to)
    return spark.read.parquet(*files)


def snapshot_compact(
    spark: SparkSession, table_dir: str, target_files: int = 2,
    max_retries: int = 10,
) -> int:
    """Rewrite the latest snapshot's data into ``target_files`` files
    and commit it as a new version (operation = 'compact').

    Row-preserving by construction: the new manifest's file list is the
    compacted set, old files stay on disk so every prior version keeps
    time-traveling. This is the small-files maintenance op a streaming
    ingest needs — readers of HEAD stop paying per-file open costs
    while history stays intact. Same O_EXCL commit protocol as append.
    """
    parent = latest_version(table_dir)
    df = read_snapshot(spark, table_dir, parent).repartition(target_files)
    data_dir = os.path.join(table_dir, "data")
    stage = os.path.join(table_dir, f"_stage_{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(stage)
    added = []
    for name in sorted(os.listdir(stage)):
        if not name.endswith(".parquet"):
            continue
        dst = f"{uuid.uuid4().hex[:12]}-{name}"
        os.rename(os.path.join(stage, name), os.path.join(data_dir, dst))
        added.append(os.path.join("data", dst))
    for leftover in os.listdir(stage):
        os.remove(os.path.join(stage, leftover))
    os.rmdir(stage)

    n_rows = df.count()
    for _ in range(max_retries):
        parent = latest_version(table_dir)
        manifest = {
            "version": parent + 1,
            "parent": parent,
            "operation": "compact",
            "files": added,
            "added_files": added,
            "added_rows": n_rows,
        }
        path = _manifest_path(table_dir, parent + 1)
        try:
            fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            continue
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        return parent + 1
    raise RuntimeError(f"compact commit lost {max_retries} races")

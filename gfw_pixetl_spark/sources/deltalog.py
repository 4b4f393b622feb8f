"""Delta Lake transaction-log interop (the delta.io PROTOCOL.md log
layout): read and write `_delta_log/` tables without any Delta
runtime — the lakehouse format a large share of training corpora are
actually stored in.

Layout implemented from the public protocol spec:

* versioned commits ``_delta_log/{version:020d}.json`` — one JSON
  action per line: ``protocol`` / ``metaData`` / ``add`` / ``remove``
  / ``commitInfo``,
* ``add`` actions carry ``partitionValues`` (partition columns live in
  the LOG, not in the data files) and a JSON ``stats`` blob with
  numRecords + per-column min/max,
* ``remove`` actions are tombstones; log replay is last-writer-wins
  per path (an ``add`` after a ``remove`` resurrects the path),
* parquet checkpoints ``{version:020d}.checkpoint.parquet`` holding
  the replayed state as one row per action with nested ``add`` /
  ``metaData`` / ``protocol`` structs, advertised by
  ``_last_checkpoint`` — readers start from the newest checkpoint at
  or below the requested version and replay only the JSON commits
  after it (O(delta), never O(history)),
* time travel: any historical version reconstructs from the same
  replay.

Scale shape: planning reads ONE checkpoint + a handful of JSON
commits regardless of table size; file pruning happens on the log's
``partitionValues`` and ``stats`` before a single data byte is
touched.  The Spark read groups surviving files by partition tuple
and attaches partition columns as literals — Catalyst sees an ordinary
parquet scan per group with the pruned file list.

The reference engine has no table format at all (it writes loose COG
tiles + a manifest, `/root/reference/gfw_pixetl/pixetl.py`); this
module is interop for the corpus-side pipeline, next to the in-house
snapshot tables (`sources/snapshots.py`).
"""
from __future__ import annotations

import json
import os
from pathlib import Path

PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}
_CHECKPOINT_INTERVAL = 10


def _log_dir(table_dir: str) -> Path:
    d = Path(table_dir) / "_delta_log"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _commit_path(table_dir: str, version: int) -> Path:
    return _log_dir(table_dir) / f"{version:020d}.json"


def delta_metadata(schema_fields: list[tuple[str, str]],
                   partition_columns: list[str],
                   table_id: str = "00000000-0000-0000-0000-000000000000",
                   ) -> dict:
    """A ``metaData`` action; ``schema_fields`` are (name, spark_type)
    for the FULL schema including partition columns."""
    schema = {
        "type": "struct",
        "fields": [{"name": n, "type": t, "nullable": True,
                    "metadata": {}} for n, t in schema_fields],
    }
    return {
        "id": table_id,
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps(schema, separators=(",", ":")),
        "partitionColumns": list(partition_columns),
        "configuration": {},
        "createdTime": 0,
    }


def add_action(path: str, partition_values: dict, size: int,
               num_records: int, min_values: dict | None = None,
               max_values: dict | None = None) -> dict:
    stats = {"numRecords": num_records,
             "minValues": min_values or {},
             "maxValues": max_values or {}}
    return {"path": path,
            "partitionValues": {k: str(v) for k, v in
                                partition_values.items()},
            "size": int(size),
            "modificationTime": 0,
            "dataChange": True,
            "stats": json.dumps(stats, separators=(",", ":"))}


def remove_action(path: str) -> dict:
    return {"path": path, "deletionTimestamp": 0, "dataChange": True}


def delta_commit(table_dir: str, version: int, actions: list[dict],
                 operation: str = "WRITE") -> None:
    """Write one commit atomically (O_EXCL create is the commit, the
    same protocol the in-house snapshot tables use).  ``actions`` are
    {"add": ...} / {"remove": ...} / {"metaData": ...} dicts."""
    lines = [json.dumps({"commitInfo": {"timestamp": 0,
                                        "operation": operation}},
                        separators=(",", ":"))]
    if version == 0 and not any("protocol" in a for a in actions):
        lines.append(json.dumps({"protocol": PROTOCOL},
                                separators=(",", ":")))
    lines.extend(json.dumps(a, separators=(",", ":")) for a in actions)
    path = _commit_path(table_dir, version)
    fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    with os.fdopen(fd, "w") as f:
        f.write("\n".join(lines) + "\n")
    if version and version % _CHECKPOINT_INTERVAL == 0:
        write_checkpoint(table_dir, version)


def _replay(adds: dict, meta: list, commit_lines) -> None:
    for line in commit_lines:
        if not line.strip():
            continue
        action = json.loads(line)
        if "add" in action:
            adds[action["add"]["path"]] = action["add"]
        elif "remove" in action:
            adds.pop(action["remove"]["path"], None)
        elif "metaData" in action:
            meta[0] = action["metaData"]
        elif "protocol" in action:
            p = action["protocol"]
            if p.get("minReaderVersion", 1) > 2:
                raise ValueError(
                    f"delta: reader version {p['minReaderVersion']} "
                    "not supported")


def write_checkpoint(table_dir: str, version: int) -> None:
    """Replayed state at ``version`` as a checkpoint parquet (nested
    add/metaData/protocol struct columns, one action per row) +
    ``_last_checkpoint``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    state = delta_snapshot(table_dir, version=version,
                           allow_checkpoint=False)
    # parquet cannot hold empty structs; the empty map fields
    # (format.options, configuration, and an unpartitioned table's
    # partitionValues) are dropped here and restored on load
    meta = {k: v for k, v in state["metadata"].items()
            if k != "configuration"}
    meta["format"] = {"provider": state["metadata"]["format"]
                      ["provider"]}
    rows = [{"add": None, "metaData": None, "protocol": PROTOCOL},
            {"add": None, "metaData": meta, "protocol": None}]
    for a in state["adds"].values():
        a = dict(a)
        if not a.get("partitionValues"):
            a.pop("partitionValues", None)
        rows.append({"add": a, "metaData": None, "protocol": None})
    table = pa.Table.from_pylist(rows)
    out = _log_dir(table_dir) / f"{version:020d}.checkpoint.parquet"
    pq.write_table(table, out)
    last = {"version": version, "size": len(rows)}
    (_log_dir(table_dir) / "_last_checkpoint").write_text(
        json.dumps(last, separators=(",", ":")))


def _list_versions(table_dir: str) -> list[int]:
    d = _log_dir(table_dir)
    out = []
    for name in os.listdir(d):
        if name.endswith(".json") and name[:-5].isdigit():
            out.append(int(name[:-5]))
    return sorted(out)


def delta_snapshot(table_dir: str, version: int | None = None,
                   allow_checkpoint: bool = True) -> dict:
    """Active state at ``version`` (default: latest): ``adds`` (path ->
    add action), ``metadata``, ``version``.  Starts from the newest
    eligible checkpoint, then replays only the commits after it."""
    versions = _list_versions(table_dir)
    if not versions:
        raise ValueError(f"delta: no commits under {table_dir}")
    head = versions[-1] if version is None else version
    if head not in versions:
        raise ValueError(f"delta: version {head} does not exist")

    adds: dict[str, dict] = {}
    meta: list = [None]
    start = 0
    if allow_checkpoint:
        # newest checkpoint AT OR BELOW the requested version — a
        # historical read must not fall back to full-history replay
        # just because _last_checkpoint is newer than it
        cps = sorted(int(n.split(".")[0]) for n in
                     os.listdir(_log_dir(table_dir))
                     if n.endswith(".checkpoint.parquet"))
        eligible = [v for v in cps if v <= head]
        if eligible:
            cp_version = eligible[-1]
            _load_checkpoint(table_dir, cp_version, adds, meta)
            start = cp_version + 1
    for v in versions:
        if start <= v <= head:
            _replay(adds, meta,
                    _commit_path(table_dir, v).read_text().splitlines())
    if meta[0] is None:
        raise ValueError("delta: no metaData action in log")
    return {"adds": adds, "metadata": meta[0], "version": head}


def _load_checkpoint(table_dir: str, version: int, adds: dict,
                     meta: list) -> None:
    import pyarrow.parquet as pq

    path = _log_dir(table_dir) / f"{version:020d}.checkpoint.parquet"
    for row in pq.read_table(path).to_pylist():
        if row.get("add"):
            a = dict(row["add"])
            a.setdefault("partitionValues", {})
            adds[a["path"]] = a
        elif row.get("metaData"):
            m = dict(row["metaData"])
            m.setdefault("configuration", {})
            m["format"] = {"provider": m["format"]["provider"],
                           "options": {}}
            meta[0] = m


def prune_adds(state: dict, partition_filter: dict | None = None,
               column_ranges: dict | None = None) -> list[dict]:
    """Log-only pruning: keep adds matching the partition-value
    equality filter and whose stats min/max ranges intersect
    ``column_ranges`` ({col: (lo, hi)}).  No data file is opened."""
    out = []
    for a in state["adds"].values():
        pv = a.get("partitionValues") or {}
        if partition_filter and any(pv.get(k) != str(v) for k, v
                                    in partition_filter.items()):
            continue
        if column_ranges:
            stats = json.loads(a.get("stats") or "{}")
            mins, maxs = stats.get("minValues", {}), stats.get(
                "maxValues", {})
            skip = False
            for col, (lo, hi) in column_ranges.items():
                if col in mins and mins[col] > hi:
                    skip = True
                if col in maxs and maxs[col] < lo:
                    skip = True
            if skip:
                continue
        out.append(a)
    return out


def read_delta(spark, table_dir: str, version: int | None = None,
               partition_filter: dict | None = None):
    """DataFrame over the active files of a Delta table: replay the
    log, prune on log metadata, group surviving files by partition
    tuple, read each group as plain parquet and attach the partition
    columns as literals (they are not in the data files, per the
    protocol)."""
    from functools import reduce

    from pyspark.sql import functions as F

    state = delta_snapshot(table_dir, version=version)
    part_cols = state["metadata"]["partitionColumns"]
    # partition values live in the log as strings; the declared
    # schema gives each its real type back
    schema_types = {f["name"]: f["type"] for f in json.loads(
        state["metadata"]["schemaString"])["fields"]}
    adds = prune_adds(state, partition_filter=partition_filter)
    if not adds:
        raise ValueError("delta: no files survive pruning")
    groups: dict[tuple, list[str]] = {}
    for a in adds:
        key = tuple(a["partitionValues"].get(c) for c in part_cols)
        groups.setdefault(key, []).append(
            os.path.join(table_dir, a["path"]))
    legs = []
    for key, paths in sorted(groups.items(),
                             key=lambda kv: tuple(
                                 "" if v is None else v
                                 for v in kv[0])):
        df = spark.read.parquet(*sorted(paths))
        for col, val in zip(part_cols, key):
            typ = schema_types.get(col, "string")
            df = df.withColumn(col, F.lit(val).cast(typ))
        legs.append(df)
    return reduce(lambda x, y: x.unionByName(y), legs)

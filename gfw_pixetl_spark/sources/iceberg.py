"""Apache Iceberg table interop (the iceberg.apache.org format-v2
spec): write and read the metadata tree — versioned metadata JSON,
Avro manifest lists, Avro manifest files — without any Iceberg
runtime.  Together with ``deltalog.py`` this covers both lakehouse
formats large training corpora are stored in.

Implemented from the public spec:

* ``metadata/v{N}.metadata.json`` (format-version 2): table uuid,
  field-id'd schemas, partition specs with identity transforms,
  snapshots (snapshot-id, sequence-number, manifest-list, summary),
  current-snapshot-id, snapshot-log, plus ``version-hint.text`` for
  latest-version discovery,
* manifest lists: one Avro record per manifest — path/length/spec-id,
  sequence numbers, added/existing/deleted file+row counts, and the
  per-partition-field summaries (contains_null + lower/upper bounds)
  readers prune whole manifests with,
* all paths are stored TABLE-RELATIVE (a documented deviation from
  the spec's absolute URIs — it makes tables relocatable, which the
  fingerprint-keyed derived-dir cache requires and several production
  engines also support),
* manifest files: Avro ``manifest_entry`` records — status
  (EXISTING/ADDED/DELETED), snapshot id, sequence numbers, and the
  nested ``data_file`` struct (content, path, format, partition
  struct, record count, size),
* snapshot isolation by construction: every snapshot references a
  COMPLETE manifest set, so time travel is "read the old snapshot's
  manifest list" — no log replay at all (the structural difference
  from Delta, which this repo also implements).

Scale shape: planning touches the metadata JSON (KBs), the manifest
list (one row per manifest), and only the manifests whose partition
summaries intersect the filter — the two-level prune that keeps
planning O(manifests-hit), not O(files), on a billion-file table.
The actual data files are ordinary parquet read by Spark with the
pruned file list.

All Avro here is written and read by the in-tree pure-Python codec
(``sources/avro.py``), so the manifest bytes are real Avro object
containers, not a bespoke sidecar.
"""
from __future__ import annotations

import json
import os
import uuid as _uuid
from pathlib import Path

from .avro import iter_container, write_container

EXISTING, ADDED, DELETED = 0, 1, 2

_PARTITION_SUMMARY_SCHEMA = {
    "type": "record", "name": "r508", "fields": [
        {"name": "contains_null", "type": "boolean"},
        {"name": "lower_bound", "type": ["null", "bytes"]},
        {"name": "upper_bound", "type": ["null", "bytes"]},
    ],
}

_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
        {"name": "existing_rows_count", "type": "long"},
        {"name": "deleted_rows_count", "type": "long"},
        {"name": "partitions",
         "type": {"type": "array", "items": _PARTITION_SUMMARY_SCHEMA}},
    ],
}


def _manifest_entry_schema(partition_fields: list[str]) -> dict:
    part = {"type": "record", "name": "r102", "fields": [
        {"name": f, "type": ["null", "string"]}
        for f in partition_fields]}
    data_file = {"type": "record", "name": "r2", "fields": [
        {"name": "content", "type": "int"},
        {"name": "file_path", "type": "string"},
        {"name": "file_format", "type": "string"},
        {"name": "partition", "type": part},
        {"name": "record_count", "type": "long"},
        {"name": "file_size_in_bytes", "type": "long"},
        {"name": "equality_ids",
         "type": ["null", {"type": "array", "items": "int"}]},
    ]}
    return {"type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"]},
        {"name": "file_sequence_number", "type": ["null", "long"]},
        {"name": "data_file", "type": data_file},
    ]}


def _meta_dir(table_dir: str) -> Path:
    d = Path(table_dir) / "metadata"
    d.mkdir(parents=True, exist_ok=True)
    return d


class IcebergTable:
    """Writer/reader for one format-v2 table rooted at ``table_dir``.

    ``schema_fields`` are (name, iceberg_type) for the full schema;
    ``partition_fields`` name the identity-transform partition source
    columns (which, per Iceberg, REMAIN in the data files — unlike
    Delta)."""

    def __init__(self, table_dir: str,
                 schema_fields: list[tuple[str, str]] | None = None,
                 partition_fields: list[str] | None = None) -> None:
        self.dir = str(table_dir)
        self.schema_fields = schema_fields
        self.partition_fields = partition_fields or []

    # ---------------- write side ----------------

    def _current_metadata(self) -> dict | None:
        hint = _meta_dir(self.dir) / "version-hint.text"
        if not hint.exists():
            return None
        v = int(hint.read_text().strip())
        return json.loads(
            (_meta_dir(self.dir) / f"v{v}.metadata.json").read_text())

    def commit(self, data_files: list[dict], operation: str = "append",
               carry_manifests: list[str] | None = None) -> int:
        """Create a new snapshot: write one manifest holding
        ``data_files`` ({path, partition: {col: val}, record_count,
        size, and optionally content: 1 (positional delete file) or
        2 (equality delete file, with equality_ids)}), a manifest
        list referencing it plus every ``carry_manifests`` path
        (default: all manifests of the current snapshot), and the
        next metadata JSON.  Returns the new snapshot id.  A
        manifest holding delete files is marked content=1 in the
        manifest list, per the spec.  Dropping whole manifests (carry
        only the survivors, pass no new files) is the other delete
        form."""
        meta = self._current_metadata()
        if meta is None:
            if self.schema_fields is None:
                raise ValueError("iceberg: new table needs a schema")
            version = 1
            seq = 1
            snap_id = 1
            snapshots = []
            prev_manifests = []
        else:
            version = meta["_version"] + 1
            seq = meta["last-sequence-number"] + 1
            snap_id = meta["current-snapshot-id"] + 1
            snapshots = meta["snapshots"]
            prev_manifests = self._manifest_rows(
                meta, meta["current-snapshot-id"])
            self.partition_fields = [
                f["name"] for f in
                meta["partition-specs"][0]["fields"]]
            cur = next(sc for sc in meta["schemas"]
                       if sc["schema-id"] == meta["current-schema-id"])
            self.schema_fields = [
                (f["name"], f["type"]) for f in cur["fields"]]

        mdir = _meta_dir(self.dir)
        rows = []
        if data_files:
            entry_schema = _manifest_entry_schema(self.partition_fields)
            entries = [{
                "status": ADDED,
                "snapshot_id": snap_id,
                "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {
                    "content": int(f.get("content", 0)),
                    "file_path": f["path"],
                    "file_format": "PARQUET",
                    "partition": {k: (str(v) if v is not None
                                      else None) for k, v in
                                  f.get("partition", {}).items()},
                    "record_count": int(f["record_count"]),
                    "file_size_in_bytes": int(f["size"]),
                    "equality_ids": (list(f["equality_ids"])
                                     if f.get("equality_ids")
                                     else None),
                },
            } for f in data_files]
            mrel = f"metadata/manifest-{snap_id}-{seq}.avro"
            blob = write_container(entries, entry_schema)
            (Path(self.dir) / mrel).write_bytes(blob)
            parts = []
            for c in self.partition_fields:
                vals = [f.get("partition", {}).get(c)
                        for f in data_files]
                non_null = sorted(str(v) for v in vals
                                  if v is not None)
                parts.append({
                    "contains_null": any(v is None for v in vals),
                    "lower": non_null[0].encode() if non_null
                    else None,
                    "upper": non_null[-1].encode() if non_null
                    else None,
                })
            is_delete_manifest = any(f.get("content", 0) != 0
                                     for f in data_files)
            rows.append({
                "manifest_path": mrel,
                "manifest_length": len(blob),
                "partition_spec_id": 0,
                "content": 1 if is_delete_manifest else 0,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snap_id,
                "added_files_count": len(entries),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": sum(e["data_file"]["record_count"]
                                        for e in entries),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "partitions": [
                    {"contains_null": p["contains_null"],
                     "lower_bound": p["lower"],
                     "upper_bound": p["upper"]}
                    for p in parts],
            })
        if carry_manifests is None:
            rows.extend(prev_manifests)
        else:
            rows.extend(m for m in prev_manifests
                        if m["manifest_path"] in set(carry_manifests))

        mlist_rel = f"metadata/snap-{snap_id}.avro"
        (Path(self.dir) / mlist_rel).write_bytes(
            write_container(rows, _MANIFEST_LIST_SCHEMA))

        snapshots = snapshots + [{
            "snapshot-id": snap_id,
            "sequence-number": seq,
            "timestamp-ms": 0,
            "manifest-list": mlist_rel,
            "summary": {"operation": operation},
            "schema-id": 0,
        }]
        new_meta = {
            "format-version": 2,
            "table-uuid": (meta or {}).get(
                "table-uuid",
                str(_uuid.uuid5(_uuid.NAMESPACE_URL, self.dir))),
            "location": self.dir,
            "last-sequence-number": seq,
            "last-updated-ms": 0,
            "last-column-id": len(self.schema_fields),
            # schema evolution is metadata-only: carry the full
            # schemas history forward (update_schema appends to it)
            "schemas": (meta["schemas"] if meta else [{
                "schema-id": 0, "type": "struct",
                "fields": [{"id": i + 1, "name": n, "required": False,
                            "type": t} for i, (n, t) in
                           enumerate(self.schema_fields)],
            }]),
            "current-schema-id": (meta["current-schema-id"]
                                  if meta else 0),
            "partition-specs": (meta["partition-specs"] if meta else [{
                "spec-id": 0,
                "fields": [{"source-id":
                            [n for n, _ in self.schema_fields]
                            .index(c) + 1,
                            "field-id": 1000 + i, "name": c,
                            "transform": "identity"}
                           for i, c in
                           enumerate(self.partition_fields)],
            }]),
            "default-spec-id": 0,
            "snapshots": snapshots,
            "current-snapshot-id": snap_id,
            "snapshot-log": [{"timestamp-ms": 0,
                              "snapshot-id": s["snapshot-id"]}
                             for s in snapshots],
            "_version": version,
        }
        tmp = mdir / f"v{version}.metadata.json.tmp"
        tmp.write_text(json.dumps(new_meta, indent=1))
        os.rename(tmp, mdir / f"v{version}.metadata.json")
        (mdir / "version-hint.text").write_text(str(version))
        return snap_id

    def update_schema(self, renames: dict[str, str]) -> int:
        """Metadata-only schema evolution: RENAME columns by stable
        field id (the Iceberg contract — no data file is touched).
        Appends a new schema to the history and makes it current;
        files written before keep their old column names and are
        reconciled at read time via the schemas-history name mapping
        (the spec's fallback when parquet field ids are absent).
        Returns the new schema id."""
        meta = self._current_metadata()
        if meta is None:
            raise ValueError(f"iceberg: no table at {self.dir}")
        cur = next(sc for sc in meta["schemas"]
                   if sc["schema-id"] == meta["current-schema-id"])
        unknown = set(renames) - {f["name"] for f in cur["fields"]}
        if unknown:
            raise KeyError(f"iceberg: no such columns {sorted(unknown)}")
        new_id = max(sc["schema-id"] for sc in meta["schemas"]) + 1
        new_schema = {
            "schema-id": new_id, "type": "struct",
            "fields": [{**f, "name": renames.get(f["name"], f["name"])}
                       for f in cur["fields"]],
        }
        meta["schemas"] = meta["schemas"] + [new_schema]
        meta["current-schema-id"] = new_id
        version = meta["_version"] + 1
        meta["_version"] = version
        mdir = _meta_dir(self.dir)
        tmp = mdir / f"v{version}.metadata.json.tmp"
        tmp.write_text(json.dumps(meta, indent=1))
        os.rename(tmp, mdir / f"v{version}.metadata.json")
        (mdir / "version-hint.text").write_text(str(version))
        self.schema_fields = [(f["name"], f["type"])
                              for f in new_schema["fields"]]
        return new_id

    # ---------------- read side ----------------

    def _manifest_rows(self, meta: dict, snapshot_id: int) -> list[dict]:
        snap = next(s for s in meta["snapshots"]
                    if s["snapshot-id"] == snapshot_id)
        return [dict(r) for r in iter_container(
            (Path(self.dir) / snap["manifest-list"]).read_bytes())]

    def plan(self, snapshot_id: int | None = None,
             partition_filter: dict | None = None) -> dict:
        """Two-level pruned file plan: ``files`` (live data-file
        dicts), ``manifests_total``, ``manifests_scanned``.  A
        manifest is skipped entirely when its partition summaries
        exclude the filter; surviving manifests are opened and their
        entries filtered on exact partition values."""
        meta = self._current_metadata()
        if meta is None:
            raise ValueError(f"iceberg: no table at {self.dir}")
        sid = (meta["current-snapshot-id"] if snapshot_id is None
               else snapshot_id)
        part_fields = [f["name"] for f in
                       meta["partition-specs"][0]["fields"]]
        rows = self._manifest_rows(meta, sid)
        files = []
        deletes = []
        scanned = 0
        for m in rows:
            if partition_filter and m["content"] == 0:
                skip = False
                for i, c in enumerate(part_fields):
                    if c in partition_filter and i < len(
                            m["partitions"]):
                        s = m["partitions"][i]
                        v = str(partition_filter[c]).encode()
                        if ((s["lower_bound"] is not None
                             and v < s["lower_bound"]) or
                                (s["upper_bound"] is not None
                                 and v > s["upper_bound"])):
                            skip = True
                if skip:
                    continue
            scanned += 1
            for e in iter_container(
                    (Path(self.dir) / m["manifest_path"])
                    .read_bytes()):
                if e["status"] == DELETED:
                    continue
                df = e["data_file"]
                if df["content"] != 0:
                    deletes.append({**df,
                                    "sequence_number":
                                    e["sequence_number"]})
                    continue
                pv = df["partition"]
                if partition_filter and any(
                        pv.get(k) != (str(v) if v is not None
                                      else None)
                        for k, v in partition_filter.items()):
                    continue
                files.append({**df, "sequence_number":
                              e["sequence_number"]})
        return {"files": files, "deletes": deletes,
                "manifests_total": len(rows),
                "manifests_scanned": scanned, "snapshot_id": sid,
                "partition_fields": part_fields,
                "schema_fields": [(f["name"], f["id"]) for f in
                                  next(sc for sc in meta["schemas"]
                                       if sc["schema-id"] ==
                                       meta["current-schema-id"])
                                  ["fields"]],
                "schemas": meta["schemas"],
                "current_schema_id": meta["current-schema-id"]}


def read_iceberg(spark, table_dir: str, snapshot_id: int | None = None,
                 partition_filter: dict | None = None):
    """DataFrame over the live rows of one snapshot: a plain
    multi-path parquet read of the pruned data-file list (identity
    partition columns live IN the files, per the spec), with v2
    MERGE-ON-READ delete application when the snapshot carries delete
    files — equality deletes anti-join rows of data files with
    data_seq < delete_seq on the key columns; positional deletes
    anti-join (file, row position) for data_seq <= delete_seq, the
    row position coming from the parquet scan's own
    ``_metadata.row_index``."""
    from pyspark.sql import functions as F

    plan = IcebergTable(table_dir).plan(snapshot_id=snapshot_id,
                                        partition_filter=partition_filter)
    if not plan["files"]:
        raise ValueError("iceberg: no files survive pruning")
    paths = sorted(os.path.join(table_dir, f["file_path"])
                   for f in plan["files"])
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    # schemas-history name mapping: a field id's historical names all
    # funnel into its CURRENT name (rename-safe reads — files written
    # under any prior schema reconcile without rewrite)
    if len(plan.get("schemas", [])) > 1:
        hist: dict[int, list[str]] = {}
        for sc in sorted(plan["schemas"], key=lambda x: x["schema-id"]):
            for f in sc["fields"]:
                names = hist.setdefault(f["id"], [])
                if f["name"] not in names:
                    names.append(f["name"])
        cols = []
        for name, fid in plan["schema_fields"]:
            cands = [n for n in reversed(hist[fid])
                     if n in df.columns]
            if not cands:
                continue
            expr = F.coalesce(*[F.col(c) for c in cands])                 if len(cands) > 1 else F.col(cands[0])
            cols.append(expr.alias(name))
        df = df.select(*cols)
    if not plan["deletes"]:
        return df

    data_cols = df.columns
    # row identity for delete application: the file's basename is
    # unique within the table (writer-controlled), the row index
    # comes from the scan itself
    base = df.select(
        "*",
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)
         .alias("_file"),
        F.col("_metadata.row_index").alias("_pos"))
    seq_rows = [(f["file_path"].rsplit("/", 1)[-1],
                 int(f["sequence_number"])) for f in plan["files"]]
    seq_df = spark.createDataFrame(seq_rows, "_file string, _seq long")
    base = base.join(F.broadcast(seq_df), "_file")

    id_to_name = {fid: name for name, fid in plan["schema_fields"]}
    for d in plan["deletes"]:
        dpath = os.path.join(table_dir, d["file_path"])
        dseq = int(d["sequence_number"])
        if d["content"] == 2:          # equality delete
            keys = [id_to_name[i] for i in (d["equality_ids"] or [])]
            dels = spark.read.parquet(dpath).select(
                *[F.col(k).alias(f"_d_{k}") for k in keys])
            cond = F.lit(True)
            for k in keys:
                cond = cond & (F.col(k) == F.col(f"_d_{k}"))
            base = base.join(
                F.broadcast(dels.withColumn("_d_seq", F.lit(dseq))),
                cond & (F.col("_seq") < F.col("_d_seq")), "left_anti")
        else:                          # positional delete
            dels = (spark.read.parquet(dpath)
                    .select(F.element_at(F.split("file_path", "/"), -1)
                            .alias("_d_file"),
                            F.col("pos").alias("_d_pos")))
            base = base.join(
                F.broadcast(dels.withColumn("_d_seq", F.lit(dseq))),
                (F.col("_file") == F.col("_d_file")) &
                (F.col("_pos") == F.col("_d_pos")) &
                (F.col("_seq") <= F.col("_d_seq")), "left_anti")
    return base.select(*data_cols)

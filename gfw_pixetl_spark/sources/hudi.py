"""Apache Hudi copy-on-write table interop (the hudi.apache.org
table-format spec): write and read the ``.hoodie`` timeline and
file-group/file-slice layout without any Hudi runtime. Together with
``deltalog.py`` (log replay) and ``iceberg.py`` (snapshot manifest
sets) this covers all three mainstream lakehouse table formats —
Hudi's structural novelty being the FILE GROUP: a stable ``fileId``
whose base file is atomically superseded by each commit that touches
it, so a snapshot is "latest file slice per group" and an update
never tombstones at the row level.

Implemented from the public spec:

* ``.hoodie/hoodie.properties`` — java-properties table descriptor
  (name, ``hoodie.table.type=COPY_ON_WRITE``, partition fields),
* the timeline state machine: each instant passes through
  ``{ts}.commit.requested`` -> ``{ts}.commit.inflight`` ->
  ``{ts}.commit`` (completed), instant times being
  ``yyyyMMddHHmmssSSS`` strings whose lexical order IS the temporal
  order,
* completed-commit JSON metadata: ``partitionToWriteStats`` with one
  write-stat per written base file (fileId, path, prevCommit,
  numWrites/numInserts/numUpdateWrites, totalWriteBytes) — enough to
  plan every query below from the TIMELINE ALONE, never a recursive
  directory listing,
* base-file naming ``{fileId}_{writeToken}_{instantTime}.parquet``
  inside partition directories, and the five ``_hoodie_*`` meta
  columns (commit time, seqno, record key, partition path, file
  name) every Hudi base file carries,
* snapshot isolation: latest completed file slice per file group at
  or below the requested instant (time travel = same walk with an
  earlier ceiling); inflight/requested instants are invisible,
* incremental pull: commits in ``(begin, end]`` expose exactly the
  file slices they wrote, and ``_hoodie_commit_time`` row filtering
  recovers per-row change capture from a COW rewrite.

Scale shape: planning reads the timeline dir (one small JSON per
commit) and selects file slices in O(file groups touched) — on a
billion-file table the snapshot plan never stats a data file, and an
incremental pull is O(slices written in the window). The chosen
files are handed to Spark as an ordinary pruned parquet scan.

The reference engine has no table format at all (loose COG tiles +
a manifest, ``/root/reference/gfw_pixetl/pixetl.py``).
"""
from __future__ import annotations

import json
import os
import uuid as _uuid
from pathlib import Path

COMMIT = "commit"
REPLACE = "replacecommit"
_META_COLS = ["_hoodie_commit_time", "_hoodie_commit_seqno",
              "_hoodie_record_key", "_hoodie_partition_path",
              "_hoodie_file_name"]


def _hoodie_dir(table_dir: str) -> Path:
    d = Path(table_dir) / ".hoodie"
    d.mkdir(parents=True, exist_ok=True)
    return d


def instant_time(i: int) -> str:
    """Deterministic spec-shaped instant time (yyyyMMddHHmmssSSS).

    Real writers stamp wall clock; only the lexical ORDER is
    contractual, so tests and derived fixtures use a fixed epoch plus
    a counter to stay reproducible.
    """
    return f"202601010000{i:02d}000"


def create_table(table_dir: str, name: str,
                 partition_field: str | None = None,
                 record_key_field: str = "") -> None:
    props = {
        "hoodie.table.name": name,
        "hoodie.table.type": "COPY_ON_WRITE",
        "hoodie.table.version": "6",
        "hoodie.timeline.layout.version": "1",
        "hoodie.table.recordkey.fields": record_key_field,
        "hoodie.table.partition.fields": partition_field or "",
    }
    with open(_hoodie_dir(table_dir) / "hoodie.properties", "w") as f:
        f.write("#Updated at 0\n")
        for k, v in props.items():
            f.write(f"{k}={v}\n")


def read_properties(table_dir: str) -> dict[str, str]:
    props: dict[str, str] = {}
    with open(Path(table_dir) / ".hoodie" / "hoodie.properties") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            props[k] = v
    return props


def base_file_name(file_id: str, ts: str, write_token: str = "0-1-1"
                   ) -> str:
    return f"{file_id}_{write_token}_{ts}.parquet"


def new_file_id() -> str:
    return str(_uuid.uuid4())


def begin_commit(table_dir: str, ts: str, action: str = COMMIT) -> None:
    """Requested -> inflight, the first two timeline states."""
    d = _hoodie_dir(table_dir)
    (d / f"{ts}.{action}.requested").write_bytes(b"{}")
    (d / f"{ts}.{action}.inflight").write_bytes(b"{}")


def complete_commit(table_dir: str, ts: str,
                    partition_stats: dict[str, list[dict]],
                    action: str = COMMIT,
                    extra: dict | None = None) -> None:
    """Write the completed-instant JSON; the commit becomes visible
    atomically with this single file create (the Hudi contract)."""
    meta = {
        "partitionToWriteStats": partition_stats,
        "compacted": False,
        "operationType": "UPSERT",
        "extraMetadata": extra or {},
    }
    d = _hoodie_dir(table_dir)
    tmp = d / f".{ts}.{action}.tmp"
    tmp.write_text(json.dumps(meta, indent=2))
    os.rename(tmp, d / f"{ts}.{action}")


def write_stat(file_id: str, path: str, prev_commit: str,
               num_writes: int, num_inserts: int = 0,
               num_updates: int = 0, size: int = 0) -> dict:
    return {
        "fileId": file_id, "path": path, "prevCommit": prev_commit,
        "numWrites": num_writes, "numDeletes": 0,
        "numUpdateWrites": num_updates, "numInserts": num_inserts,
        "totalWriteBytes": size, "fileSizeInBytes": size,
    }


def timeline(table_dir: str) -> list[dict]:
    """Parse the timeline dir into ordered instants with states."""
    out: list[dict] = []
    for name in sorted(os.listdir(Path(table_dir) / ".hoodie")):
        parts = name.split(".")
        if not parts[0].isdigit():
            continue
        ts, action = parts[0], parts[1]
        state = parts[2] if len(parts) > 2 else "completed"
        out.append({"ts": ts, "action": action, "state": state,
                    "file": name})
    return out


def completed_commits(table_dir: str, as_of: str | None = None
                      ) -> list[dict]:
    """Completed commit/replacecommit instants (with metadata) at or
    below ``as_of``, in timeline order."""
    out = []
    for inst in timeline(table_dir):
        if inst["state"] != "completed":
            continue
        if inst["action"] not in (COMMIT, REPLACE):
            continue
        if as_of is not None and inst["ts"] > as_of:
            continue
        meta = json.loads(
            (Path(table_dir) / ".hoodie" / inst["file"]).read_text())
        out.append({**inst, "meta": meta})
    return out


def snapshot_slices(table_dir: str, as_of: str | None = None
                    ) -> list[dict]:
    """Latest completed file slice per file group — the COW snapshot
    plan, O(timeline) + O(file groups), zero directory listing.

    Replacecommits supersede the file groups they list in
    ``extraMetadata.replacedFileIds`` (insert-overwrite semantics).
    """
    slices: dict[str, dict] = {}
    for c in completed_commits(table_dir, as_of):
        if c["action"] == REPLACE:
            for fid in c["meta"]["extraMetadata"].get(
                    "replacedFileIds", []):
                slices.pop(fid, None)
        for part, stats in c["meta"]["partitionToWriteStats"].items():
            for st in stats:
                slices[st["fileId"]] = {
                    "file_id": st["fileId"], "partition": part,
                    "path": st["path"], "commit_ts": c["ts"],
                    "num_writes": st["numWrites"],
                }
    return sorted(slices.values(), key=lambda s: s["path"])


def incremental_slices(table_dir: str, begin: str, end: str | None = None
                       ) -> list[dict]:
    """File slices written by commits in ``(begin, end]`` — the
    incremental-pull plan."""
    out = []
    for c in completed_commits(table_dir, end):
        if c["ts"] <= begin:
            continue
        for part, stats in c["meta"]["partitionToWriteStats"].items():
            for st in stats:
                out.append({"file_id": st["fileId"], "partition": part,
                            "path": st["path"], "commit_ts": c["ts"]})
    return sorted(out, key=lambda s: s["path"])


def read_hudi(spark, table_dir: str, as_of: str | None = None,
              drop_meta: bool = True):
    """Snapshot (or time-travel) read as an ordinary pruned parquet
    scan over the selected file slices."""
    paths = [os.path.join(table_dir, s["path"])
             for s in snapshot_slices(table_dir, as_of)]
    if not paths:
        raise ValueError("hudi: empty snapshot")
    df = spark.read.parquet(*paths)
    if drop_meta:
        df = df.drop(*_META_COLS)
    return df


def read_hudi_incremental(spark, table_dir: str, begin: str,
                          end: str | None = None):
    """Incremental pull: rows whose ``_hoodie_commit_time`` lies in
    ``(begin, end]``, read from only the slices those commits wrote.
    A COW rewrite copies unchanged rows into the new slice, so the
    row filter on the preserved commit time recovers exact change
    capture."""
    from pyspark.sql import functions as F

    slices = incremental_slices(table_dir, begin, end)
    if not slices:
        raise ValueError("hudi: empty incremental window")
    df = spark.read.parquet(
        *[os.path.join(table_dir, s["path"]) for s in slices])
    df = df.filter(F.col("_hoodie_commit_time") > begin)
    if end is not None:
        df = df.filter(F.col("_hoodie_commit_time") <= end)
    return df


# --------------------------------------------------------------------------
# Writer-side helper: commit a set of pandas partitions as base files
# --------------------------------------------------------------------------

def commit_pandas(table_dir: str, ts: str,
                  partitions: dict[str, "object"],
                  file_ids: dict[str, str] | None = None,
                  key_col: str | None = None,
                  replaced_file_ids: list[str] | None = None,
                  row_commit_ts: dict[str, "object"] | None = None
                  ) -> dict:
    """Write one base file per partition from pandas frames, with the
    spec's ``_hoodie_*`` meta columns, through the full timeline state
    machine. ``file_ids`` pins file-group ids for UPSERT slices
    (same fileId = supersedes the prior slice); omitted ids mean new
    file groups (INSERT). ``row_commit_ts`` supplies per-row
    ``_hoodie_commit_time`` values for upsert rewrites — the spec
    behavior is that rows merely COPIED into the new slice keep their
    original commit time while updated/inserted rows get ``ts``;
    incremental pull's row filter depends on exactly this. Returns
    {partition: file_id}."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    action = REPLACE if replaced_file_ids else COMMIT
    begin_commit(table_dir, ts, action)
    stats: dict[str, list[dict]] = {}
    assigned: dict[str, str] = {}
    for part, pdf in partitions.items():
        fid = (file_ids or {}).get(part) or new_file_id()
        assigned[part] = fid
        fname = base_file_name(fid, ts)
        rel = os.path.join(part, fname) if part else fname
        abs_path = Path(table_dir) / rel
        abs_path.parent.mkdir(parents=True, exist_ok=True)
        pdf = pdf.reset_index(drop=True)
        n = len(pdf)
        keys = (pdf[key_col].astype(str) if key_col
                else pdf.index.astype(str))
        meta_pdf = pdf.copy()
        meta_pdf.insert(0, "_hoodie_file_name", fname)
        meta_pdf.insert(0, "_hoodie_partition_path", part)
        meta_pdf.insert(0, "_hoodie_record_key", keys)
        meta_pdf.insert(0, "_hoodie_commit_seqno",
                        [f"{ts}_0_{i}" for i in range(n)])
        rts = (row_commit_ts or {}).get(part)
        meta_pdf.insert(
            0, "_hoodie_commit_time",
            ts if rts is None else list(map(str, rts)))
        pq.write_table(pa.Table.from_pandas(meta_pdf, preserve_index=False),
                       str(abs_path))
        prev = "null"
        stats.setdefault(part, []).append(write_stat(
            fid, rel, prev, n, num_inserts=n,
            size=os.path.getsize(abs_path)))
    extra = ({"replacedFileIds": replaced_file_ids}
             if replaced_file_ids else None)
    complete_commit(table_dir, ts, stats, action, extra)
    return assigned

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

Row-level deletes (``snapshot_delete``) are merge-on-read equality
deletes with Iceberg's sequence-number semantics: a delete file is a
parquet of key values committed like any snapshot, and it suppresses
matching rows ONLY in data files with a lower commit sequence — so a
key re-inserted after the delete is visible again, and every pre-delete
version still time-travels to the un-deleted data. ``snapshot_compact``
physically purges suppressed rows (it reads through the delete filter),
which is the GDPR-erasure two-step: logical delete now, physical erase
at the next maintenance window.
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


def _stage_files(df: DataFrame, table_dir: str) -> list[str]:
    """Write ``df`` once into data/ under unique names; returns the
    relative paths. Staged files are dead weight, not corruption, if
    the commit loses every retry."""
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
    return added


def _stage_files_partitioned(
    df: DataFrame, table_dir: str, spec: dict,
) -> list[tuple[str, object]]:
    """Stage ``df`` split by the partition transform of ``spec``
    ({'col', 'transform': 'identity'|'truncate', 'param'}): one
    Hive-style ``_pval=<v>`` directory per transform value, files moved
    into data/ with their value recorded. Returns [(rel_path, value)].

    The single-writer repartition keeps one file per partition value —
    at fleet scale you would ``repartition(n, '_pval')`` instead; the
    manifest contract (file -> value) is identical either way.
    """
    from pyspark.sql import functions as F

    col, t = spec["col"], spec.get("transform", "identity")
    if t == "identity":
        pval = F.col(col)
    elif t == "truncate":
        w = int(spec.get("param") or 1)
        pval = (F.floor(F.col(col) / w) * w).cast("long")
    else:
        raise ValueError(f"unsupported partition transform {t!r}")

    data_dir = os.path.join(table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(os.path.join(table_dir, _SNAP_DIR), exist_ok=True)
    stage = os.path.join(table_dir, f"_stage_{uuid.uuid4().hex[:12]}")
    (df.withColumn("_pval", pval).repartition(1)
       .write.mode("overwrite").partitionBy("_pval").parquet(stage))

    # parse values back from the Hive dir names: unescape %XX, map the
    # NULL sentinel to None (a file prune must never compare against
    # it), and coerce by the SOURCE COLUMN's type — never by guessing
    # from the string shape (a string column of numeric-looking values
    # must stay a string or range pruning compares across types).
    from urllib.parse import unquote

    kind = df.schema[col].dataType.typeName()
    if t == "truncate" or kind in ("byte", "short", "integer", "long"):
        caster = int
    elif kind in ("float", "double"):
        caster = float
    else:
        # str — including DECIMAL columns: round-tripping a decimal
        # through float can shift a value at a range boundary and make
        # ``_part_excludes`` "provably" drop a live file. As a string
        # the comparison raises TypeError and the file is KEPT (pruning
        # may only ever skip provably-empty reads, never change results).
        caster = str

    def parse_value(raw: str):
        raw = unquote(raw)
        if raw == "__HIVE_DEFAULT_PARTITION__":
            return None
        return caster(raw)

    added: list[tuple[str, object]] = []
    for dname in sorted(os.listdir(stage)):
        pdir = os.path.join(stage, dname)
        if not (dname.startswith("_pval=") and os.path.isdir(pdir)):
            continue
        value = parse_value(dname.split("=", 1)[1])
        for name in sorted(os.listdir(pdir)):
            if not name.endswith(".parquet"):
                continue
            dst = f"{uuid.uuid4().hex[:12]}-{name}"
            os.rename(os.path.join(pdir, name),
                      os.path.join(data_dir, dst))
            added.append((os.path.join("data", dst), value))
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    return added


def _file_stats(table_dir: str, rel_paths: list[str],
                stats_cols: list[str]) -> dict:
    """Per-file min/max of ``stats_cols`` straight from the parquet
    footers (no data read) — the manifest-level zone map that lets a
    reader prune files before touching bytes, the Iceberg/Delta
    data-skipping move. JSON-serializable values only."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for rel in rel_paths:
        md = pq.ParquetFile(os.path.join(table_dir, rel)).metadata
        names = {md.schema.column(i).name: i
                 for i in range(md.num_columns)}
        per_col: dict[str, list] = {}
        for col in stats_cols:
            if col not in names:
                continue
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[col]).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is not None and isinstance(lo, (int, float, str)):
                per_col[col] = [lo, hi]
        out[rel] = per_col
    return out


def _part_excludes(spec: dict, value, col: str, lo, hi) -> bool:
    """True iff a file with partition ``value`` under ``spec`` provably
    contains no rows with spec['col']==col in [lo, hi]. Any type
    mismatch between the recorded value and the query bounds keeps the
    file (pruning may only ever skip provably-empty reads)."""
    if spec.get("col") != col or value is None:
        return False
    t = spec.get("transform", "identity")
    try:
        if t == "identity":
            return value < lo or value > hi
        if t == "truncate":  # file covers [value, value + param)
            w = spec.get("param") or 1
            return value > hi or value + w <= lo
    except TypeError:
        return False
    return False  # bucket/unknown transforms never range-prune


def prune_files(manifest: dict, col: str, lo, hi) -> list[str]:
    """Data files of ``manifest`` that can contain col values in
    [lo, hi]: files are dropped when EITHER their recorded [min, max]
    zone map misses the range OR their partition value (under the
    partition spec they were written with — specs may differ per file
    after spec evolution, Iceberg-style) provably excludes it. Files
    without stats or partition info are kept (pruning is never allowed
    to change results, only to skip provably-empty reads)."""
    stats = manifest.get("stats", {})
    specs = manifest.get("specs", {})
    file_specs = manifest.get("file_specs", {})
    file_parts = manifest.get("file_parts", {})
    keep = []
    for f in manifest["files"]:
        rng = stats.get(f, {}).get(col)
        if rng is not None and (rng[1] < lo or rng[0] > hi):
            continue
        spec = specs.get(str(file_specs.get(f)))
        if spec is not None and _part_excludes(
                spec, file_parts.get(f), col, lo, hi):
            continue
        keep.append(f)
    return keep


def _commit(table_dir: str, build_manifest, max_retries: int) -> int:
    """O_EXCL commit loop: ``build_manifest(parent, parent_manifest)``
    returns the manifest dict for version ``parent + 1``; on a lost race
    the builder is re-invoked against the new parent."""
    for _ in range(max_retries):
        parent = latest_version(table_dir)
        pm = read_manifest(table_dir, parent) if parent else {}
        manifest = build_manifest(parent, pm)
        manifest["version"] = parent + 1
        manifest["parent"] = parent
        # Carry the streaming batch-id high-water mark forward through
        # EVERY commit (append/delete/merge/compact), like seqs — so
        # vacuuming old manifests can never erase the idempotence record
        # the streaming sink depends on (Delta txnVersion semantics).
        hwm = [x for x in (pm.get("max_batch_id"),
                           manifest.get("batch_id"),
                           manifest.get("max_batch_id")) if x is not None]
        if hwm:
            manifest["max_batch_id"] = max(int(x) for x in hwm)
        # Per-writer marks (Delta's txnAppId/txnVersion): the global
        # max_batch_id above cannot distinguish two streaming queries
        # (separate checkpoints, batch ids both restarting at 0)
        # appending to the same table — one would see the other's mark
        # and silently skip every batch. ``batch_hwms`` keys the mark
        # by the committing sink's identity so each stream only ever
        # compares against ITS OWN high-water mark.
        hwms = dict(pm.get("batch_hwms") or {})
        hwms.update(manifest.get("batch_hwms") or {})
        app = manifest.get("txn_app_id")
        if app is not None and manifest.get("batch_id") is not None:
            b = int(manifest["batch_id"])
            hwms[str(app)] = max(b, int(hwms.get(str(app), -1)))
        if hwms:
            manifest["batch_hwms"] = hwms
        # Partition-spec metadata also rides forward through commits
        # whose builders don't manage it (delete/merge/compact):
        # specs are table history; per-file entries are trimmed to the
        # files this manifest still lists (a compact's rewritten files
        # are unpartitioned unless its builder says otherwise).
        if "specs" not in manifest and pm.get("specs"):
            manifest["specs"] = pm["specs"]
        live = set(manifest.get("files", []))
        for k in ("file_specs", "file_parts"):
            if k not in manifest and pm.get(k):
                trimmed = {f: v for f, v in pm[k].items() if f in live}
                if trimmed:
                    manifest[k] = trimmed
        path = _manifest_path(table_dir, parent + 1)
        try:
            fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            continue  # lost the race: re-read the new parent and retry
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        return parent + 1
    raise RuntimeError(f"snapshot commit lost {max_retries} races")


def snapshot_append(
    df: DataFrame, table_dir: str, max_retries: int = 10,
    stats_cols: list[str] | None = None,
    extra: dict | None = None,
    partition_spec: dict | None = None,
) -> int:
    """Append ``df`` as a new snapshot; returns the committed version.
    The manifest create-exclusive is the atomic commit point.
    ``stats_cols`` records per-file min/max zone maps in the manifest
    (from the parquet footers, no extra data pass) so readers can
    prune files by predicate (``read_snapshot(between=...)``/q238).

    ``partition_spec`` ({'col', 'transform': 'identity'|'truncate',
    'param'}) writes the append PARTITIONED by the transform value and
    records (spec, value) per file — Iceberg-style partition-spec
    EVOLUTION: each append may use a different spec, every file keeps
    the spec it was written under, and ``prune_files`` applies each
    file's own spec, so layouts from before and after a spec change
    prune correctly in the same table (q363)."""
    if partition_spec is not None:
        pairs = _stage_files_partitioned(df, table_dir, partition_spec)
        added = [f for f, _ in pairs]
        parts = {f: v for f, v in pairs}
    else:
        added = _stage_files(df, table_dir)
        parts = {}
    n_rows = df.count()
    stats = _file_stats(table_dir, added, stats_cols) if stats_cols else {}

    def build(parent: int, pm: dict) -> dict:
        seqs = dict(pm.get("seqs", {}))
        seqs.update({f: parent + 1 for f in added})
        out = {
            "operation": "append",
            "files": pm.get("files", []) + added,
            "seqs": seqs,
            "deletes": pm.get("deletes", []),
            "stats": {**pm.get("stats", {}), **stats},
            "added_files": added,
            "added_rows": n_rows,
            "specs": dict(pm.get("specs", {})),
            "file_specs": dict(pm.get("file_specs", {})),
            "file_parts": dict(pm.get("file_parts", {})),
            **(extra or {}),
        }
        if partition_spec is not None:
            want = {
                "col": partition_spec["col"],
                "transform": partition_spec.get("transform", "identity"),
                "param": partition_spec.get("param"),
            }
            sid = next((k for k, v in out["specs"].items() if v == want),
                       None)
            if sid is None:  # new spec: evolution, old files untouched
                sid = str(1 + max((int(k) for k in out["specs"]),
                                  default=0))
                out["specs"][sid] = want
            out["file_specs"].update({f: sid for f in added})
            out["file_parts"].update(parts)
        return out

    return _commit(table_dir, build, max_retries)


def snapshot_delete(
    keys_df: DataFrame, table_dir: str, key_cols: list[str],
    max_retries: int = 10,
) -> int:
    """Commit a merge-on-read EQUALITY DELETE: every row of the current
    and future snapshots whose ``key_cols`` match a row of ``keys_df``
    is suppressed at read time — but only in data files committed
    BEFORE this delete (Iceberg sequence-number semantics), so a key
    re-appended later is visible again. Physical bytes are untouched:
    older versions still time-travel to the pre-delete rows, and
    ``snapshot_compact`` performs the physical purge."""
    delete_files = _stage_files(
        keys_df.select(*key_cols).distinct().coalesce(1), table_dir)
    n_keys = keys_df.select(*key_cols).distinct().count()

    def build(parent: int, pm: dict) -> dict:
        deletes = list(pm.get("deletes", []))
        deletes += [{"path": f, "seq": parent + 1, "keys": list(key_cols)}
                    for f in delete_files]
        return {
            "operation": "delete",
            "files": pm.get("files", []),
            "seqs": pm.get("seqs", {}),
            "deletes": deletes,
            "stats": pm.get("stats", {}),
            "added_files": [],
            "added_rows": 0,
            "deleted_keys": n_keys,
        }

    return _commit(table_dir, build, max_retries)


def snapshot_overwrite_partitions(
    df: DataFrame, table_dir: str, partition_spec: dict,
    max_retries: int = 10,
) -> int:
    """Iceberg-style DYNAMIC PARTITION OVERWRITE in one atomic commit:
    stage ``df`` partitioned by ``partition_spec``; the new manifest
    drops every parent file whose recorded partition value — under an
    IDENTICAL spec — is among the incoming values, and adds the new
    files. Partitions the incoming data does not touch are untouched;
    files written under a different spec are never replaced (their
    value ranges are not comparable), matching Iceberg's
    overwrite-by-expression safety. Old files stay on disk, so every
    prior version still time-travels to the pre-overwrite rows.

    This is the nightly-rebuild op: recompute one day/shard and swap
    it in without rewriting the table or blocking readers (q367).
    """
    pairs = _stage_files_partitioned(df, table_dir, partition_spec)
    added = [f for f, _ in pairs]
    parts = dict(pairs)
    incoming = {v for _, v in pairs}
    n_rows = df.count()
    want = {
        "col": partition_spec["col"],
        "transform": partition_spec.get("transform", "identity"),
        "param": partition_spec.get("param"),
    }

    def build(parent: int, pm: dict) -> dict:
        specs = dict(pm.get("specs", {}))
        sid = next((k for k, v in specs.items() if v == want), None)
        if sid is None:
            sid = str(1 + max((int(k) for k in specs), default=0))
            specs[sid] = want
        file_specs = dict(pm.get("file_specs", {}))
        file_parts = dict(pm.get("file_parts", {}))
        replaced = {
            f for f in pm.get("files", [])
            if file_specs.get(f) == sid and file_parts.get(f) in incoming
        }
        kept = [f for f in pm.get("files", []) if f not in replaced]
        seqs = {f: s for f, s in pm.get("seqs", {}).items()
                if f in set(kept)}
        seqs.update({f: parent + 1 for f in added})
        file_specs = {f: s for f, s in file_specs.items() if f in set(kept)}
        file_parts = {f: v for f, v in file_parts.items() if f in set(kept)}
        file_specs.update({f: sid for f in added})
        file_parts.update(parts)
        return {
            "operation": "overwrite",
            "files": kept + added,
            "seqs": seqs,
            "deletes": pm.get("deletes", []),
            "stats": {k: v for k, v in pm.get("stats", {}).items()
                      if k in set(kept)},
            "added_files": added,
            "added_rows": n_rows,
            "replaced_files": len(replaced),
            "replaced_paths": sorted(replaced),
            "specs": specs,
            "file_specs": file_specs,
            "file_parts": file_parts,
        }

    return _commit(table_dir, build, max_retries)


def snapshot_merge(
    source: DataFrame, table_dir: str, key_cols: list[str],
    delete_condition=None, max_retries: int = 10,
) -> int:
    """MERGE INTO (upsert) as ONE atomic commit — the Delta/Iceberg
    ``MERGE`` shape on this format, composed from the existing
    merge-on-read primitives:

    - every source key becomes an equality delete (suppressing the
      target's old row if one exists — a key absent from the target
      makes the delete a harmless no-op, exactly NOT MATCHED),
    - source rows NOT matching ``delete_condition`` are appended as new
      data files (matched keys -> UPDATE, new keys -> INSERT),
    - rows matching ``delete_condition`` contribute only their delete
      key (WHEN MATCHED AND cond THEN DELETE).

    Both the delete file and the data files carry sequence number
    ``parent + 1``: the reader's strict ``delete.seq > data.seq`` rule
    means the delete governs every pre-merge file but never the rows
    this same commit appends — which is why one manifest write is
    enough for atomicity (readers see all of the merge or none of it).
    Scale shape: the delete-key set broadcasts; the table side is never
    reshuffled, and the merge writes O(source), not O(table).
    (Reference analogue: gfw_pixetl overwrites whole tiles; row-level
    merge is the lakehouse extension of its incremental skip, S10/F5.)
    """
    from pyspark.sql import functions as F

    if delete_condition is not None:
        cond = (F.expr(delete_condition)
                if isinstance(delete_condition, str) else delete_condition)
        upserts = source.filter(~cond)
    else:
        upserts = source
    delete_files = _stage_files(
        source.select(*key_cols).distinct().coalesce(1), table_dir)
    added = _stage_files(upserts, table_dir)
    n_rows = upserts.count()
    n_keys = source.select(*key_cols).distinct().count()

    def build(parent: int, pm: dict) -> dict:
        seq = parent + 1
        seqs = dict(pm.get("seqs", {}))
        seqs.update({f: seq for f in added})
        deletes = list(pm.get("deletes", []))
        deletes += [{"path": f, "seq": seq, "keys": list(key_cols)}
                    for f in delete_files]
        return {
            "operation": "merge",
            "files": pm.get("files", []) + added,
            "seqs": seqs,
            "deletes": deletes,
            "stats": pm.get("stats", {}),
            "added_files": added,
            "added_rows": n_rows,
            "merged_keys": n_keys,
        }

    return _commit(table_dir, build, max_retries)


def snapshot_tag(table_dir: str, name: str,
                 version: int | None = None) -> int:
    """Create an IMMUTABLE named ref (Iceberg tag) pointing at
    ``version`` (default: current head). O_EXCL create — a tag can
    never be moved or silently overwritten; re-tagging a name raises.
    Tagged versions are exempt from ``snapshot_vacuum``'s retention
    horizon: the manifest and every file it references stay alive for
    as long as the tag exists, which is how a quarterly-audit or
    model-training-input pin survives routine GC."""
    v = latest_version(table_dir) if version is None else int(version)
    if not os.path.exists(_manifest_path(table_dir, v)):
        raise FileNotFoundError(f"no snapshot v{v} to tag")
    refs = os.path.join(table_dir, "_refs")
    os.makedirs(refs, exist_ok=True)
    if "/" in name or name.startswith("."):
        raise ValueError(f"bad tag name {name!r}")
    fd = os.open(os.path.join(refs, f"{name}.json"),
                 os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    with os.fdopen(fd, "w") as f:
        json.dump({"version": v, "type": "tag"}, f)
    return v


def list_tags(table_dir: str) -> dict[str, int]:
    refs = os.path.join(table_dir, "_refs")
    if not os.path.isdir(refs):
        return {}
    out = {}
    for fn in os.listdir(refs):
        if fn.endswith(".json"):
            with open(os.path.join(refs, fn)) as f:
                out[fn[:-5]] = int(json.load(f)["version"])
    return out


def drop_tag(table_dir: str, name: str) -> None:
    os.remove(os.path.join(table_dir, "_refs", f"{name}.json"))


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None,
    between: tuple | None = None,
    merge_schema: bool = False,
    ref: str | None = None,
) -> DataFrame:
    """Read the table as of ``version`` (default: latest). Planning cost
    is one manifest, regardless of table size.

    ``between=(col, lo, hi)`` prunes data files via the manifest zone
    maps before any bytes are read AND applies the residual row filter,
    so the result is exactly the predicate's rows while provably-empty
    files are never opened (the file-skipping half of every lakehouse
    read path; q238 value-checks it and asserts the skip count).

    Equality deletes apply merge-on-read: data files are grouped by
    commit sequence, the (small) delete-key set is broadcast, and one
    LEFT ANTI join with the condition ``keys match AND delete.seq >
    data.seq`` suppresses exactly the rows each delete file governs —
    the table-scale side never reshuffles."""
    from pyspark.sql import functions as F

    if ref is not None:
        if version is not None:
            raise ValueError("pass version OR ref, not both")
        tags = list_tags(table_dir)
        if ref not in tags:
            raise KeyError(f"unknown ref {ref!r}; tags: {sorted(tags)}")
        version = tags[ref]
    v = latest_version(table_dir) if version is None else version
    m = read_manifest(table_dir, v)
    if between is not None:
        col, lo, hi = between
        m = dict(m, files=prune_files(m, col, lo, hi))

    def residual(df: DataFrame) -> DataFrame:
        if between is None:
            return df
        col, lo, hi = between
        return df.filter(F.col(col).between(lo, hi))

    # schema evolution: appends may add columns over the table's life;
    # merge_schema unions footer schemas (absent columns read as NULL),
    # the Spark-native answer — pay the per-file footer read only when
    # asked, exactly like spark.read.option("mergeSchema")
    reader = spark.read.option("mergeSchema", "true") if merge_schema \
        else spark.read

    deletes = m.get("deletes", [])
    if not deletes:
        files = [os.path.join(table_dir, f) for f in m["files"]]
        return residual(reader.parquet(*files))

    key_sets = {tuple(d["keys"]) for d in deletes}
    if len(key_sets) != 1:
        raise ValueError(f"mixed delete key sets unsupported: {key_sets}")
    keys = list(key_sets.pop())

    seqs = m.get("seqs", {})
    by_seq: dict[int, list[str]] = {}
    for f in m["files"]:
        by_seq.setdefault(int(seqs.get(f, 0)), []).append(
            os.path.join(table_dir, f))
    data = None
    for s, group in sorted(by_seq.items()):
        part = reader.parquet(*group).withColumn("_seq", F.lit(s))
        data = part if data is None else data.unionByName(
            part, allowMissingColumns=merge_schema)

    dels = None
    for d in deletes:
        part = spark.read.parquet(
            os.path.join(table_dir, d["path"])
        ).withColumn("_dseq", F.lit(int(d["seq"])))
        dels = part if dels is None else dels.unionByName(part)
    dels = dels.select(
        *[F.col(k).alias(f"_dk_{k}") for k in keys], "_dseq")

    cond = F.col("_dseq") > F.col("_seq")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_dk_{k}"))
    return residual(
        data.join(F.broadcast(dels), cond, "left_anti").drop("_seq"))


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

    Compaction reads THROUGH the delete filter, so any pending equality
    deletes are physically purged and the new manifest carries none —
    the erasure half of the GDPR two-step started by ``snapshot_delete``.
    """
    parent = latest_version(table_dir)
    df = read_snapshot(spark, table_dir, parent).repartition(target_files)
    added = _stage_files(df, table_dir)
    n_rows = df.count()

    def build(parent: int, pm: dict) -> dict:
        # carry the zone-map contract forward: recompute stats for the
        # rewritten files over whatever columns the parent tracked
        cols = sorted({c for per in pm.get("stats", {}).values()
                       for c in per})
        return {
            "operation": "compact",
            "files": added,
            "seqs": {f: parent + 1 for f in added},
            "deletes": [],
            "stats": _file_stats(table_dir, added, cols) if cols else {},
            "added_files": added,
            "added_rows": n_rows,
        }

    return _commit(table_dir, build, max_retries)


def read_changes(
    spark: SparkSession, table_dir: str, v_from: int, v_to: int
) -> DataFrame:
    """Change data feed over (v_from, v_to] — the Delta CDF shape:
    every commit contributes its logical row changes tagged with
    ``_change_type`` ('insert' | 'delete') and ``_commit_version``.

    * append commits emit the rows of their added files (an O(delta)
      file read, never a table scan);
    * delete commits emit the ACTUAL deleted rows — the pre-delete
      snapshot semi-joined with the (broadcast) delete keys, which is
      exactly the set the delete suppressed under sequence semantics;
    * compaction commits emit nothing (no logical change).

    Downstream incremental consumers (index maintainers, aggregate
    views, replication) apply inserts/deletes in commit order.
    """
    from pyspark.sql import functions as F

    out = None
    for v in range(v_from + 1, v_to + 1):
        m = read_manifest(table_dir, v)
        op = m.get("operation")
        if op == "append":
            part = spark.read.parquet(
                *[os.path.join(table_dir, f) for f in m["added_files"]]
            ).withColumn("_change_type", F.lit("insert"))
        elif op == "overwrite":
            # replaced partitions: their old rows are logical deletes,
            # the new files are inserts — both O(partition), read from
            # the still-on-disk immutable files
            ins = spark.read.parquet(
                *[os.path.join(table_dir, f) for f in m["added_files"]]
            ).withColumn("_change_type", F.lit("insert"))
            dropped = m.get("replaced_paths", [])
            if dropped:
                dels_part = spark.read.parquet(
                    *[os.path.join(table_dir, f) for f in dropped]
                ).withColumn("_change_type", F.lit("delete"))
                part = dels_part.unionByName(ins)
            else:
                part = ins
        elif op == "delete":
            new_deletes = [d for d in m.get("deletes", [])
                           if d["seq"] == v]
            keys = None
            key_cols = None
            for d in new_deletes:
                part_k = spark.read.parquet(
                    os.path.join(table_dir, d["path"]))
                key_cols = d["keys"]
                keys = part_k if keys is None else keys.unionByName(part_k)
            if keys is None:
                continue
            part = read_snapshot(spark, table_dir, v - 1).join(
                F.broadcast(keys.distinct()), on=key_cols, how="left_semi"
            ).withColumn("_change_type", F.lit("delete"))
        else:  # compact: physical rewrite, no logical change
            continue
        part = part.withColumn("_commit_version", F.lit(v))
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError(f"no logical changes in ({v_from}, {v_to}]")
    return out


def snapshot_vacuum(table_dir: str, keep_last: int = 3,
                    min_age_seconds: float = 3600.0) -> dict:
    """Garbage-collect the table: drop manifests older than the last
    ``keep_last`` versions and every data/delete file no retained
    manifest references, plus any orphaned ``_stage_*`` staging dirs.

    This is the Delta ``VACUUM`` trade stated explicitly: time travel
    below the retention horizon is GONE after this runs (those
    manifests are removed, so the versions are no longer addressable);
    everything at or above the horizon is untouched. Returns counts.

    ``min_age_seconds`` is the concurrent-writer safety window (Delta's
    retention check): ``_stage_files`` moves data files into data/
    BEFORE the O_EXCL manifest commit, so a file that is unreferenced
    *right now* may belong to an in-flight commit. Only unreferenced
    files and stage dirs whose mtime is older than the window are
    removed; a vacuum can therefore never delete the files of a commit
    racing within the window. Pass 0 only when the caller guarantees
    no concurrent writers (tests, single-writer maintenance).
    """
    import shutil
    import time

    cutoff = time.time() - max(0.0, float(min_age_seconds))

    def _old_enough(path: str) -> bool:
        try:
            return os.path.getmtime(path) <= cutoff
        except OSError:
            return False  # vanished mid-scan: another process owns it

    head = latest_version(table_dir)
    horizon = max(1, head - keep_last + 1)
    # tagged versions are pinned: their manifests and files outlive the
    # horizon for as long as the tag exists (Iceberg ref retention)
    pinned = set(list_tags(table_dir).values())
    retained = set(range(horizon, head + 1)) | pinned
    referenced: set[str] = set()
    for v in retained:
        m = read_manifest(table_dir, v)
        referenced.update(m["files"])
        referenced.update(d["path"] for d in m.get("deletes", []))

    removed_files = 0
    data_dir = os.path.join(table_dir, "data")
    if os.path.isdir(data_dir):
        for name in os.listdir(data_dir):
            rel = os.path.join("data", name)
            full = os.path.join(data_dir, name)
            if rel not in referenced and _old_enough(full):
                os.remove(full)
                removed_files += 1

    removed_manifests = 0
    for v in range(1, horizon):
        if v in pinned:
            continue
        p = _manifest_path(table_dir, v)
        if os.path.exists(p):
            os.remove(p)
            removed_manifests += 1

    removed_stages = 0
    for name in os.listdir(table_dir):
        full = os.path.join(table_dir, name)
        if name.startswith("_stage_") and _old_enough(full):
            shutil.rmtree(full, ignore_errors=True)
            removed_stages += 1

    return {
        "head": head,
        "horizon": horizon,
        "removed_data_files": removed_files,
        "removed_manifests": removed_manifests,
        "removed_stage_dirs": removed_stages,
    }

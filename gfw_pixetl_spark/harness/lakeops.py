"""Lakehouse harness queries: snapshot tables, time travel, CDF,
compaction, partition overwrite, schema evolution, tile-store versions.

Split out of the former textops.py (round 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, register
from .textstats import q167

# --------------------------------------------------------------------------
# q179 — streaming chunk-level dedup: documents stream in (availableNow
# drain), explode through the SAME fixed-stride chunker as q167
# (stateless on a stream), and only never-seen chunk digests survive the
# state store — the incremental corpus-prep pipeline. Oracle = batch
# distinct over the q167 chunk set.
# --------------------------------------------------------------------------
@register(
    "q179_stream_chunk_dedup",
    oracle="""
    WITH ch AS (
      SELECT doc_id, text,
             unnest(range(0, GREATEST(
               CAST(ceil((length(text) - 40) / 160.0) AS BIGINT), 1)))
               AS chunk_id
      FROM documents
    )
    SELECT DISTINCT
           md5(substring(text, CAST(chunk_id * 160 + 1 AS INT), 200))
             AS digest,
           CAST(length(substring(text, CAST(chunk_id * 160 + 1 AS INT),
                                 200)) AS BIGINT) AS chunk_len
    FROM ch
    """,
)
def q179(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import run_stream_chunk_dedup_once

    return run_stream_chunk_dedup_once(spark, f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# q184 — schema-evolution read: the corpus directory holds files written
# by TWO pipeline versions (v1: doc_id+lang; v2 adds source).
# mergeSchema unions the footers; v1 rows surface source as NULL. The
# per-(lang, version) tally proves the evolved read matches what a
# never-evolved store would say — the contract a long-lived 100 TB
# store depends on. Files are (re)written per sf_dir into a keyed tmp
# dir, so the oracle replays from the documents table analytically
# (v1 = doc_id % 2 == 0).
# --------------------------------------------------------------------------
def _source_fingerprint(sf_dir: str) -> str:
    """Content fingerprint of the source documents.parquet (path, size,
    mtime of every data file) — regenerated testdata changes the
    fingerprint, so derived-dataset caches can never serve stale."""
    import hashlib as _hl
    import os

    p = os.path.join(sf_dir, "documents.parquet")
    paths = [p]
    if os.path.isdir(p):
        paths = sorted(
            os.path.join(r, f) for r, _, fs in os.walk(p) for f in fs)
    parts = []
    for q in paths:
        st = os.stat(q)
        parts.append(f"{q}|{st.st_size}|{st.st_mtime_ns}")
    return _hl.md5("\n".join(parts).encode()).hexdigest()[:12]


def _derived_dir(sf_dir: str, tag: str, build) -> str:
    """Cache a derived dataset under a fingerprint-keyed tmp dir.

    ``build(tmp_path)`` writes into a unique scratch dir which is then
    atomically renamed into place — a concurrent builder loses the
    rename race harmlessly (its scratch is discarded), and a stale
    cache is impossible because the source fingerprint is in the key
    (r2 advice on the old non-atomic ``_built`` marker scheme).
    """
    import os
    import shutil
    import tempfile
    import uuid

    key = sf_dir.strip("/").replace("/", "_")
    fp = _source_fingerprint(sf_dir)
    d = os.path.join(tempfile.gettempdir(), f"gfw_{tag}_{key}_{fp}")
    if os.path.isdir(d):
        return d
    tmp = f"{d}.build.{uuid.uuid4().hex[:8]}"
    build(tmp)
    try:
        os.rename(tmp, d)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return d


def _evolved_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        docs = load(spark, sf_dir, "documents")
        v1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
        v2 = docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", "lang", "source")
        v1.coalesce(1).write.mode("overwrite").parquet(d)
        v2.coalesce(1).write.mode("append").parquet(d)

    return _derived_dir(sf_dir, "evolved", build)


@register(
    "q184_schema_evolution",
    oracle="""
    SELECT lang,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_v1_rows,
           CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_v2_rows,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_v1_null_source,
           CAST(COUNT(DISTINCT CASE WHEN doc_id % 2 = 1 THEN source END)
                AS BIGINT) AS n_sources
    FROM documents GROUP BY lang
    """,
)
def q184(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.textfiles import read_evolved_parquet

    # version is derived from doc_id % 2 on BOTH sides (the writer's
    # discriminator, r2 advice); n_v1_null_source separately asserts the
    # mergeSchema contract that every v1 row surfaces source as NULL —
    # in the oracle that count IS n_v1_rows, so a v1 row with a non-NULL
    # source (or a dropped NULL) hash-mismatches.
    v1 = F.col("doc_id") % 2 == 0
    df = read_evolved_parquet(spark, _evolved_dir(spark, sf_dir))
    return df.groupBy("lang").agg(
        F.sum(F.when(v1, 1).otherwise(0))
        .cast("bigint").alias("n_v1_rows"),
        F.sum(F.when(~v1, 1).otherwise(0))
        .cast("bigint").alias("n_v2_rows"),
        F.sum(F.when(v1 & F.col("source").isNull(), 1).otherwise(0))
        .cast("bigint").alias("n_v1_null_source"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    )


# --------------------------------------------------------------------------
# q217/q218 — snapshot-versioned table (sources/snapshots.py): manifest
# commits, time travel, incremental diff. The harness table commits
# v1 = even docs then appends v2 = odd docs; q217 reads BOTH versions
# via their manifests (time travel) and q218 reads only the files added
# in (v1, v2] (the O(delta) incremental-consumption path). Oracles
# replay from doc_id parity.
# --------------------------------------------------------------------------
def _snapshot_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.snapshots import snapshot_append

        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars")
        v1 = snapshot_append(docs.filter(F.col("doc_id") % 2 == 0), d)
        v2 = snapshot_append(docs.filter(F.col("doc_id") % 2 == 1), d)
        assert (v1, v2) == (1, 2), (v1, v2)

    return _derived_dir(sf_dir, "snaptab", build)


@register(
    "q217_snapshot_time_travel",
    oracle="""
    SELECT 1 AS version, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents WHERE doc_id % 2 = 0 GROUP BY lang
    UNION ALL
    SELECT 2 AS version, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def q217(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    d = _snapshot_table(spark, sf_dir)
    v1 = read_snapshot(spark, d, 1).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    ).select(F.lit(1).alias("version"), "lang", "n_docs")
    v2 = read_snapshot(spark, d, 2).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    ).select(F.lit(2).alias("version"), "lang", "n_docs")
    return v1.unionAll(v2)


# --------------------------------------------------------------------------
# q233 — snapshot DELETE + sequence semantics (sources/snapshots.py):
# merge-on-read equality deletes with Iceberg sequence numbers. The
# harness table appends even docs (v1) + odd docs (v2), commits a
# delete of doc_id % 10 IN (3, 4) (v3), then RE-APPENDS the % 10 = 3
# docs (v4). Reading v2/v3/v4 proves: pre-delete time travel intact,
# the delete suppresses only older-sequence files, and re-inserted
# keys are visible again. Scale shape: the delete-key set broadcasts
# into one LEFT ANTI join; the table side never reshuffles.
# --------------------------------------------------------------------------
def _deleted_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.snapshots import snapshot_append, snapshot_delete

        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars")
        snapshot_append(docs.filter(F.col("doc_id") % 2 == 0), d)
        snapshot_append(docs.filter(F.col("doc_id") % 2 == 1), d)
        v3 = snapshot_delete(
            docs.filter((F.col("doc_id") % 10).isin(3, 4))
                .select("doc_id"), d, ["doc_id"])
        v4 = snapshot_append(docs.filter(F.col("doc_id") % 10 == 3), d)
        assert (v3, v4) == (3, 4), (v3, v4)

    return _derived_dir(sf_dir, "snapdelete", build)


@register(
    "q233_snapshot_delete",
    oracle="""
    SELECT 2 AS version, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents
    UNION ALL
    SELECT 3, CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT)
    FROM documents WHERE doc_id % 10 NOT IN (3, 4)
    UNION ALL
    SELECT 4, CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT)
    FROM (
      SELECT doc_id FROM documents WHERE doc_id % 10 NOT IN (3, 4)
      UNION ALL
      SELECT doc_id FROM documents WHERE doc_id % 10 = 3
    )
    """,
)
def q233(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    d = _deleted_table(spark, sf_dir)
    out = None
    for v in (2, 3, 4):
        part = read_snapshot(spark, d, v).agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        ).select(F.lit(v).alias("version"), "n_docs", "id_sum")
        out = part if out is None else out.unionAll(part)
    return out


# --------------------------------------------------------------------------
# q238 — manifest zone-map DATA SKIPPING (sources/snapshots.py): each
# append records per-file doc_id min/max from the parquet footers; a
# ranged read prunes provably-empty files BEFORE any bytes are read and
# applies the residual row filter. The harness table is four
# range-disjoint files; the [120, 180] scan must open exactly one. The
# skip counts ride in the result as value-checked constants — the q200
# n_files==1 move applied to the lakehouse layer.
# --------------------------------------------------------------------------
def _zonemap_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.snapshots import snapshot_append

        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        for lo in (0, 100, 200, 300):
            cond = (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 100)                 if lo < 300 else (F.col("doc_id") >= lo)
            snapshot_append(docs.filter(cond).coalesce(1), d,
                            stats_cols=["doc_id"])

    return _derived_dir(sf_dir, "snapzonemap", build)


@register(
    "q238_snapshot_skipping",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(4 AS INT) AS n_files_total,
           CAST(1 AS INT) AS n_files_scanned
    FROM documents WHERE doc_id BETWEEN 120 AND 180
    """,
)
def q238(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import (
        latest_version, prune_files, read_manifest, read_snapshot,
    )

    d = _zonemap_table(spark, sf_dir)
    m = read_manifest(d, latest_version(d))
    scanned = len(prune_files(m, "doc_id", 120, 180))
    return read_snapshot(
        spark, d, between=("doc_id", 120, 180)
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.lit(len(m["files"])).cast("int").alias("n_files_total"),
        F.lit(scanned).cast("int").alias("n_files_scanned"),
    )


# --------------------------------------------------------------------------
# q363 — PARTITION-SPEC EVOLUTION (Iceberg spec-v2 behavior): v1 of the
# table is written partitioned by truncate[100] on doc_id (spec 1,
# 2 files: [0,100) and [100,200)); v2 appends docs [200,400) under a
# FINER spec, truncate[50] (spec 2, 4 files) — no rewrite of v1's
# layout. prune_files applies EACH FILE'S OWN spec, so a [120, 260]
# scan at HEAD opens exactly 1 spec-1 file + 2 spec-2 files (3 of 6),
# and time-traveling to v1 opens 1 of 2 under the old spec alone. The
# scanned-file counts ride in the result as value-checked constants
# (the q238 move) and the row aggregates prove pruning never dropped a
# live row: over-pruning breaks n_docs/id_sum, under-pruning breaks
# n_files_scanned.
# --------------------------------------------------------------------------
def _spec_evolution_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.snapshots import snapshot_append

        docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
        snapshot_append(
            docs.filter(F.col("doc_id") < 200), d,
            partition_spec={"col": "doc_id", "transform": "truncate",
                            "param": 100})
        snapshot_append(
            docs.filter((F.col("doc_id") >= 200)
                        & (F.col("doc_id") < 400)), d,
            partition_spec={"col": "doc_id", "transform": "truncate",
                            "param": 50})

    return _derived_dir(sf_dir, "snapspecevo", build)


@register(
    "q363_spec_evolution",
    oracle="""
    SELECT 2 AS snapshot_version,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(6 AS INT) AS n_files_total,
           CAST(3 AS INT) AS n_files_scanned
    FROM documents WHERE doc_id BETWEEN 120 AND 260
    UNION ALL
    SELECT 1, CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT),
           CAST(2 AS INT), CAST(1 AS INT)
    FROM documents WHERE doc_id BETWEEN 120 AND 199
    ORDER BY snapshot_version DESC
    """,
)
def q363(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import (
        prune_files, read_manifest, read_snapshot,
    )

    d = _spec_evolution_table(spark, sf_dir)
    out = None
    for v in (2, 1):
        m = read_manifest(d, v)
        scanned = len(prune_files(m, "doc_id", 120, 260))
        agg = read_snapshot(
            spark, d, version=v, between=("doc_id", 120, 260)
        ).agg(
            F.lit(v).cast("int").alias("snapshot_version"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
            F.lit(len(m["files"])).cast("int").alias("n_files_total"),
            F.lit(scanned).cast("int").alias("n_files_scanned"),
        ).select("snapshot_version", "n_docs", "id_sum",
                 "n_files_total", "n_files_scanned")
        out = agg if out is None else out.unionByName(agg)
    return out


# --------------------------------------------------------------------------
# q367 — DYNAMIC PARTITION OVERWRITE (Iceberg overwrite semantics):
# v1 writes docs <300 partitioned truncate[100] (3 files); v2
# recomputes ONLY the [100, 200) partition with shifted n_chars and
# swaps it in atomically — untouched partitions keep their v1 files
# (and seqs), time travel to v1 sees the original rows, and the change
# feed emits the replaced partition's old rows as deletes + the new
# rows as inserts. The per-version char sums and file counts are the
# value-checked proof that exactly one partition changed.
# --------------------------------------------------------------------------
def _overwrite_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.snapshots import (
            snapshot_append, snapshot_overwrite_partitions,
        )

        spec = {"col": "doc_id", "transform": "truncate", "param": 100}
        docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
        snapshot_append(docs.filter(F.col("doc_id") < 300), d,
                        partition_spec=spec)                        # v1
        rebuilt = docs.filter(
            (F.col("doc_id") >= 100) & (F.col("doc_id") < 200)
        ).withColumn("n_chars", F.col("n_chars") + 1000)
        snapshot_overwrite_partitions(rebuilt, d, spec)             # v2

    return _derived_dir(sf_dir, "snapoverwrite", build)


@register(
    "q367_partition_overwrite",
    oracle="""
    SELECT 2 AS version, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id BETWEEN 100 AND 199
                         THEN n_chars + 1000 ELSE n_chars END)
                AS BIGINT) AS chars_sum,
           CAST(3 AS INT) AS n_files
    FROM documents WHERE doc_id < 300
    UNION ALL
    SELECT 1, CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT),
           CAST(3 AS INT)
    FROM documents WHERE doc_id < 300
    ORDER BY version DESC
    """,
)
def q367(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_manifest, read_snapshot

    d = _overwrite_table(spark, sf_dir)
    out = None
    for v in (2, 1):
        m = read_manifest(d, v)
        agg = read_snapshot(spark, d, version=v).agg(
            F.lit(v).cast("int").alias("version"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars_sum"),
            F.lit(len(m["files"])).cast("int").alias("n_files"),
        ).select("version", "n_docs", "chars_sum", "n_files")
        out = agg if out is None else out.unionByName(agg)
    return out


# --------------------------------------------------------------------------
# q365 — snapshot TAGS (Iceberg named refs): v1 is tagged 'baseline',
# v2 appends more docs, v3 compacts, then a keep_last=1 vacuum runs.
# The tag PINS v1 through the vacuum — its manifest and files survive
# while the untagged v2 manifest is collected — so reading by ref
# returns exactly the tagged-version rows and the head keeps reading
# the full table. Manifest-on-disk count rides as a value-checked
# constant (2 = tagged v1 + head v3). This is the audit/training-input
# pin a production table needs: routine GC can never erase a named
# snapshot.
# --------------------------------------------------------------------------
def _tagged_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.snapshots import (
            snapshot_append, snapshot_compact, snapshot_tag,
            snapshot_vacuum,
        )

        docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
        snapshot_append(docs.filter(F.col("doc_id") < 200), d)      # v1
        snapshot_tag(d, "baseline")                                 # -> v1
        snapshot_append(docs.filter(
            (F.col("doc_id") >= 200) & (F.col("doc_id") < 400)), d)  # v2
        snapshot_compact(spark, d, target_files=1)                  # v3
        snapshot_vacuum(d, keep_last=1, min_age_seconds=0)

    return _derived_dir(sf_dir, "snaptags", build)


@register(
    "q365_snapshot_tags",
    oracle="""
    SELECT 'baseline' AS ref, 1 AS version,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(2 AS INT) AS n_manifests
    FROM documents WHERE doc_id < 200
    UNION ALL
    SELECT 'head', 3, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT), CAST(2 AS INT)
    FROM documents WHERE doc_id < 400
    ORDER BY ref
    """,
)
def q365(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    from ..sources.snapshots import latest_version, read_snapshot

    d = _tagged_table(spark, sf_dir)
    n_manifests = len([f for f in _os.listdir(_os.path.join(
        d, "_snapshots")) if f.endswith(".json")])
    out = None
    for ref, ver in (("baseline", 1), ("head", latest_version(d))):
        df = read_snapshot(spark, d, ref="baseline") if ref == "baseline" \
            else read_snapshot(spark, d)
        agg = df.agg(
            F.lit(ref).alias("ref"),
            F.lit(ver).cast("int").alias("version"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
            F.lit(n_manifests).cast("int").alias("n_manifests"),
        ).select("ref", "version", "n_docs", "id_sum", "n_manifests")
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("ref")


# --------------------------------------------------------------------------
# q240 — snapshot CHANGE DATA FEED (read_changes): the q233 table's
# commit history replayed as tagged row changes — v2's insert of the
# odd docs, v3's delete emitting the ACTUAL suppressed rows
# (pre-delete snapshot semi-joined with the broadcast keys), v4's
# re-insert. Compactions are silent. This is the O(delta) feed an
# incremental index/aggregate maintainer consumes instead of rescanning
# the table.
# --------------------------------------------------------------------------
@register(
    "q240_snapshot_cdf",
    oracle="""
    SELECT 2 AS commit_version, 'insert' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents WHERE doc_id % 2 = 1
    UNION ALL
    SELECT 3, 'delete', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT)
    FROM documents WHERE doc_id % 10 IN (3, 4)
    UNION ALL
    SELECT 4, 'insert', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT)
    FROM documents WHERE doc_id % 10 = 3
    """,
)
def q240(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_changes

    d = _deleted_table(spark, sf_dir)
    return read_changes(spark, d, 1, 4).groupBy(
        F.col("_commit_version").alias("commit_version"),
        F.col("_change_type").alias("change_type"),
    ).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
    )


# --------------------------------------------------------------------------
# q241 — TILE-STORE VERSIONING: the reference's incremental workflow
# (seed -> prune -> skip-existing, F5) executed against the snapshot
# table format. Run 1 commits the tiles intersecting footprint A as
# table v1 (the production broadcast-semi-join prune); run 2 prunes for
# A ∪ B, anti-joins against the v1 SNAPSHOT READ (target-exists on the
# manifest, no object-store listing), and commits only the new tiles as
# v2. The query emits (version, tile_id); the oracle replays the grid
# intersection closed-form. read_diff(v1, v2) = exactly run 2's output
# — the O(delta) consumer contract.
# --------------------------------------------------------------------------
_Q241_FP_A = (0.0, 0.0, 25.0, 15.0)
_Q241_FP_B = (-30.0, -20.0, 5.0, 5.0)


def _tilestore_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..grids import LatLngGrid
        from ..plans import raster_pipe as rp
        from ..sources.snapshots import read_snapshot, snapshot_append

        grid = LatLngGrid(10, 160)
        tiles = rp.seed_tiles(spark, grid)

        def pruned(fps):
            cat = rp.file_catalog(spark, [
                {"uri": f"memory://f{i}", "band": 1,
                 "left": lo, "bottom": b, "right": r, "top": t}
                for i, (lo, b, r, t) in enumerate(fps)
            ])
            return rp.prune_tiles(tiles, cat).select("tile_id")

        v1 = snapshot_append(pruned([_Q241_FP_A]), d)
        existing = read_snapshot(spark, d, v1)
        fresh = pruned([_Q241_FP_A, _Q241_FP_B]).join(
            existing, "tile_id", "left_anti")
        v2 = snapshot_append(fresh, d)
        assert (v1, v2) == (1, 2)

    return _derived_dir(sf_dir, "tilestore", build)


def _q241_intersects(fp) -> str:
    lo, b, r, t = fp
    return (f"(tile_left < {r} AND tile_right > {lo} "
            f"AND tile_bottom < {t} AND tile_top > {b})")


@register(
    "q241_tile_store_versions",
    oracle=f"""
    WITH g AS (
      SELECT
        CONCAT(
          lpad(CAST(abs(-80 + CAST(i // 36 AS INT) * 10 + 10) AS VARCHAR),
               2, '0'),
          CASE WHEN -80 + CAST(i // 36 AS INT) * 10 + 10 >= 0
               THEN 'N' ELSE 'S' END,
          '_',
          lpad(CAST(abs(-180 + CAST(i % 36 AS INT) * 10) AS VARCHAR),
               3, '0'),
          CASE WHEN -180 + CAST(i % 36 AS INT) * 10 >= 0
               THEN 'E' ELSE 'W' END
        ) AS tile_id,
        -180 + CAST(i % 36 AS INT) * 10 AS tile_left,
        -80 + CAST(i // 36 AS INT) * 10 AS tile_bottom,
        -180 + CAST(i % 36 AS INT) * 10 + 10 AS tile_right,
        -80 + CAST(i // 36 AS INT) * 10 + 10 AS tile_top
      FROM range(648) t(i)
    )
    SELECT 1 AS version, tile_id FROM g
    WHERE {_q241_intersects(_Q241_FP_A)}
    UNION ALL
    SELECT 2, tile_id FROM g
    WHERE {_q241_intersects(_Q241_FP_B)}
      AND NOT {_q241_intersects(_Q241_FP_A)}
    """,
)
def q241(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_diff, read_snapshot

    d = _tilestore_table(spark, sf_dir)
    v1 = read_snapshot(spark, d, 1).select(
        F.lit(1).alias("version"), "tile_id")
    delta = read_diff(spark, d, 1, 2).select(
        F.lit(2).alias("version"), "tile_id")
    return v1.unionAll(delta)


@register(
    "q218_snapshot_incremental",
    oracle="""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_new,
           CAST(SUM(n_chars) AS BIGINT) AS new_chars
    FROM documents WHERE doc_id % 2 = 1 GROUP BY source
    """,
)
def q218(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_diff

    d = _snapshot_table(spark, sf_dir)
    return read_diff(spark, d, 1, 2).groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_new"),
        F.sum("n_chars").cast("bigint").alias("new_chars"),
    )


# --------------------------------------------------------------------------
# q224 — snapshot COMPACTION: rewrite the table head into exactly 2
# files as a new version; prior versions keep time-traveling over the
# old files. The query reads the compacted head — identical rows to v2
# by contract — and reports the (designed, deterministic) file count
# from the manifest, proving maintenance ops preserve data.
# --------------------------------------------------------------------------
def _compacted_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.snapshots import snapshot_append, snapshot_compact

        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars")
        snapshot_append(docs.filter(F.col("doc_id") % 2 == 0), d)
        snapshot_append(docs.filter(F.col("doc_id") % 2 == 1), d)
        v = snapshot_compact(spark, d, target_files=2)
        assert v == 3, v

    return _derived_dir(sf_dir, "snapcompact", build)


@register(
    "q224_snapshot_compaction",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(2 AS BIGINT) AS n_files
    FROM documents GROUP BY lang
    """,
)
def q224(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_manifest, read_snapshot

    d = _compacted_table(spark, sf_dir)
    n_files = len(read_manifest(d, 3)["files"])
    return read_snapshot(spark, d, 3).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.lit(n_files).cast("bigint").alias("n_files"),
    )


# --------------------------------------------------------------------------
# q254 — snapshot MERGE INTO (sources/snapshots.py::snapshot_merge):
# the Delta/Iceberg upsert shape as ONE atomic commit — source keys
# become an equality delete and non-delete source rows become new data
# files, both at sequence parent+1, so the reader's strict
# delete.seq > data.seq rule applies the delete to every pre-merge
# file but never to the rows the same commit appends. The harness
# merge UPDATEs doc_id%10==1 (n_chars += 1000), INSERTs new keys
# (doc_id + 1,000,000 for %10==2, n_chars=77), and DELETEs %10==3 via
# the matched-delete condition. Reading v1 and v2 proves pre-merge
# time travel is intact and all three MERGE arms landed atomically.
# --------------------------------------------------------------------------
def _merged_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.snapshots import snapshot_append, snapshot_merge

        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        v1 = snapshot_append(docs, d)
        updates = docs.filter(F.col("doc_id") % 10 == 1).withColumn(
            "n_chars", F.col("n_chars") + 1000)
        inserts = docs.filter(F.col("doc_id") % 10 == 2).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "lang",
            F.lit(77).cast("long").alias("n_chars"))
        deletes = docs.filter(F.col("doc_id") % 10 == 3)
        source = updates.unionByName(inserts).unionByName(deletes)
        v2 = snapshot_merge(source, d, ["doc_id"],
                            delete_condition="doc_id % 10 = 3")
        assert (v1, v2) == (1, 2), (v1, v2)

    return _derived_dir(sf_dir, "snapmerge", build)


@register(
    "q254_snapshot_merge",
    oracle="""
    SELECT 1 AS version, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sum
    FROM documents GROUP BY lang
    UNION ALL
    SELECT 2, lang, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT), CAST(SUM(n_chars) AS BIGINT)
    FROM (
      SELECT doc_id, lang, n_chars FROM documents
      WHERE doc_id % 10 NOT IN (1, 3)
      UNION ALL
      SELECT doc_id, lang, n_chars + 1000 FROM documents
      WHERE doc_id % 10 = 1
      UNION ALL
      SELECT doc_id + 1000000, lang, 77 FROM documents
      WHERE doc_id % 10 = 2
    ) GROUP BY lang
    """,
)
def q254(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    d = _merged_table(spark, sf_dir)
    out = None
    for v in (1, 2):
        part = read_snapshot(spark, d, v).groupBy("lang").agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
            F.sum("n_chars").cast("bigint").alias("chars_sum"),
        ).select(F.lit(v).alias("version"), "lang", "n_docs", "id_sum",
                 "chars_sum")
        out = part if out is None else out.unionAll(part)
    return out


# --------------------------------------------------------------------------
# q421 — DELTA LAKE LOG INTEROP (sources/deltalog.py, the delta.io
# protocol layout): the corpus is written ONCE as a lang-partitioned
# Delta table — data files hold (doc_id, text, n_chars) only, the
# partition column lives in the log's add-action partitionValues, per
# the protocol. The history then exercises the replay semantics a
# real lakehouse reader needs: v1 DELETEs the 'de' partition, a
# parquet CHECKPOINT is cut at v1 (+_last_checkpoint), and v2
# RESURRECTS the even-doc_id 'de' file — so the HEAD read must start
# from the checkpoint, replay only v2 (O(delta), asserted by the unit
# suite), and apply last-writer-wins per path; the v0 read must time-
# travel BELOW the checkpoint. Planning is log-only; partition columns
# attach as literals per file group.
# --------------------------------------------------------------------------
DELTA_SCHEMA = ("lang string, n_head long, n_v0 long, chars_head long, "
                "files_en int")


def _delta_table_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os as _os

        from ..sources.deltalog import (
            add_action, delta_commit, delta_metadata, remove_action,
            write_checkpoint,
        )

        _os.makedirs(d, exist_ok=True)
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "text", "n_chars", "lang")

        def writer(batches):
            import pandas as pd
            import pyarrow as _pa
            import pyarrow.parquet as _pq

            # a partition arrives as many Arrow batches; each (lang,
            # shard) file must be written once, so concatenate first
            pdfs = [b for b in batches if not b.empty]
            if pdfs:
                pdf = pd.concat(pdfs, ignore_index=True)
                facts = {k: [] for k in ("path", "lang", "shard",
                                         "size", "n", "lo", "hi")}
                for (lang, shard), grp in pdf.groupby(
                        ["lang", "shard"]):
                    grp = grp.sort_values("doc_id")
                    rel = f"part-{lang}-{int(shard)}.parquet"
                    tbl = _pa.Table.from_pandas(
                        grp[["doc_id", "text", "n_chars"]],
                        preserve_index=False)
                    _pq.write_table(tbl, _os.path.join(d, rel))
                    facts["path"].append(rel)
                    facts["lang"].append(lang)
                    facts["shard"].append(int(shard))
                    facts["size"].append(
                        _os.path.getsize(_os.path.join(d, rel)))
                    facts["n"].append(len(grp))
                    facts["lo"].append(int(grp["doc_id"].min()))
                    facts["hi"].append(int(grp["doc_id"].max()))
                yield pd.DataFrame(facts)

        facts = (docs.withColumn("shard", (F.col("doc_id") % 2)
                                 .cast("int"))
                 .repartition("lang", "shard")
                 .mapInPandas(writer, "path string, lang string, "
                              "shard int, size long, n long, lo long, "
                              "hi long")
                 .collect())   # bounded: one row per (lang, shard)

        meta = delta_metadata(
            [("doc_id", "long"), ("text", "string"),
             ("n_chars", "long"), ("lang", "string")], ["lang"])
        adds = [{"add": add_action(
            r["path"], {"lang": r["lang"]}, r["size"], r["n"],
            {"doc_id": r["lo"]}, {"doc_id": r["hi"]})} for r in
            sorted(facts, key=lambda r: r["path"])]
        delta_commit(d, 0, [{"metaData": meta}] + adds)
        de_paths = sorted(r["path"] for r in facts
                          if r["lang"] == "de")
        delta_commit(d, 1, [{"remove": remove_action(p)}
                            for p in de_paths], operation="DELETE")
        write_checkpoint(d, 1)
        resurrect = [{"add": a["add"]} for a in adds
                     if a["add"]["path"] == f"part-de-0.parquet"]
        delta_commit(d, 2, resurrect, operation="WRITE")

    return _derived_dir(sf_dir, "deltatbl", build)


@register(
    "q421_delta_log",
    oracle="""
    SELECT lang,
           CAST(SUM(CASE WHEN lang <> 'de' OR doc_id % 2 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_head,
           CAST(COUNT(*) AS BIGINT) AS n_v0,
           CAST(SUM(CASE WHEN lang <> 'de' OR doc_id % 2 = 0
                         THEN n_chars ELSE 0 END) AS BIGINT)
               AS chars_head,
           CAST(2 AS INT) AS files_en
    FROM documents GROUP BY lang
    """,
)
def q421(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.deltalog import (
        delta_snapshot, prune_adds, read_delta,
    )

    d = _delta_table_dir(spark, sf_dir)
    head = read_delta(spark, d).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_head"),
        F.sum("n_chars").cast("bigint").alias("chars_head"))
    v0 = read_delta(spark, d, version=0).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_v0"))
    # log-only partition pruning: the 'en' leg plans exactly 2 files
    files_en = len(prune_adds(delta_snapshot(d),
                              partition_filter={"lang": "en"}))
    return (v0.join(head, "lang", "left")
            .select("lang",
                    F.coalesce("n_head", F.lit(0)).alias("n_head"),
                    "n_v0",
                    F.coalesce("chars_head", F.lit(0))
                     .alias("chars_head"),
                    F.lit(files_en).cast("int").alias("files_en")))


# --------------------------------------------------------------------------
# q422 — ICEBERG FORMAT-V2 INTEROP (sources/iceberg.py): the second
# lakehouse format, structurally different from Delta — every snapshot
# references a COMPLETE manifest set (no log replay; time travel =
# read the old snapshot's manifest list), manifests are REAL Avro
# object containers written by the in-tree codec, and planning prunes
# at TWO levels (manifest partition summaries skip whole manifests
# before any file entry is read). History: snap1 = en+de+es+fr+zh
# appends (one manifest per commit wave), snap2 DELETEs 'de' by
# carrying only the surviving manifests, snap3 appends a replacement
# de file (even doc_ids). Identity partition columns stay IN the
# parquet files per the spec, so the Spark read is a plain pruned
# multi-path scan.
# --------------------------------------------------------------------------
ICE_SCHEMA = ("lang string, n_head long, n_snap1 long, "
              "chars_head long, manifests_scanned_en int")


def _iceberg_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os as _os

        from ..sources.iceberg import IcebergTable

        _os.makedirs(_os.path.join(d, "data"), exist_ok=True)
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "text", "n_chars", "lang")

        def writer(batches):
            import pandas as pd
            import pyarrow as _pa
            import pyarrow.parquet as _pq

            pdfs = [b for b in batches if not b.empty]
            if pdfs:
                pdf = pd.concat(pdfs, ignore_index=True)
                facts = {k: [] for k in ("path", "lang", "shard",
                                         "size", "n")}
                for (lang, shard), grp in pdf.groupby(
                        ["lang", "shard"]):
                    grp = grp.sort_values("doc_id")
                    rel = f"data/{lang}-{int(shard)}.parquet"
                    tbl = _pa.Table.from_pandas(
                        grp[["doc_id", "text", "n_chars", "lang"]],
                        preserve_index=False)
                    _pq.write_table(tbl, _os.path.join(d, rel))
                    facts["path"].append(rel)
                    facts["size"].append(
                        _os.path.getsize(_os.path.join(d, rel)))
                    facts["lang"].append(lang)
                    facts["shard"].append(int(shard))
                    facts["n"].append(len(grp))
                yield pd.DataFrame(facts)

        facts = (docs.withColumn("shard", (F.col("doc_id") % 2)
                                 .cast("int"))
                 .repartition("lang", "shard")
                 .mapInPandas(writer, "path string, lang string, "
                              "shard int, size long, n long")
                 .collect())   # bounded: one row per (lang, shard)

        table = IcebergTable(
            d, [("doc_id", "long"), ("text", "string"),
                ("n_chars", "long"), ("lang", "string")], ["lang"])
        # one manifest per lang (commit waves), ordered for determinism
        langs = sorted({r["lang"] for r in facts})
        for lang in langs:
            table.commit([{
                "path": r["path"], "partition": {"lang": r["lang"]},
                "record_count": r["n"], "size": r["size"],
            } for r in sorted(facts, key=lambda r: r["path"])
                if r["lang"] == lang])
        # snap N+1: DELETE 'de' by carrying only surviving manifests
        meta = table._current_metadata()
        rows = table._manifest_rows(meta, meta["current-snapshot-id"])
        keep = [m["manifest_path"] for m in rows
                if m["partitions"][0]["lower_bound"] != b"de"]
        table.commit([], operation="delete", carry_manifests=keep)
        # snap N+2: append the replacement de shard (even doc_ids)
        de0 = [r for r in facts
               if r["lang"] == "de" and r["shard"] == 0]
        table.commit([{
            "path": r["path"], "partition": {"lang": "de"},
            "record_count": r["n"], "size": r["size"],
        } for r in de0])

    return _derived_dir(sf_dir, "icebergtbl", build)


@register(
    "q422_iceberg_interop",
    oracle="""
    SELECT lang,
           CAST(SUM(CASE WHEN lang <> 'de' OR doc_id % 2 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_head,
           CAST(COUNT(*) AS BIGINT) AS n_snap1,
           CAST(SUM(CASE WHEN lang <> 'de' OR doc_id % 2 = 0
                         THEN n_chars ELSE 0 END) AS BIGINT)
               AS chars_head,
           CAST(1 AS INT) AS manifests_scanned_en
    FROM documents GROUP BY lang
    """,
)
def q422(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.iceberg import IcebergTable, read_iceberg

    d = _iceberg_dir(spark, sf_dir)
    table = IcebergTable(d)
    meta = table._current_metadata()
    n_langs = len(meta["snapshots"]) - 2   # one append per lang
    snap_full = meta["snapshots"][n_langs - 1]["snapshot-id"]

    head = read_iceberg(spark, d).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_head"),
        F.sum("n_chars").cast("bigint").alias("chars_head"))
    full = read_iceberg(spark, d, snapshot_id=snap_full).groupBy(
        "lang").agg(F.count("*").cast("bigint").alias("n_snap1"))
    # manifest-level pruning: the en filter must open exactly ONE
    # manifest out of the full set
    en_plan = table.plan(partition_filter={"lang": "en"})
    return (full.join(head, "lang", "left")
            .select("lang",
                    F.coalesce("n_head", F.lit(0)).alias("n_head"),
                    "n_snap1",
                    F.coalesce("chars_head", F.lit(0))
                     .alias("chars_head"),
                    F.lit(en_plan["manifests_scanned"]).cast("int")
                     .alias("manifests_scanned_en")))


# --------------------------------------------------------------------------
# q426 — DELTA OPTIMIZE / CLUSTERING (the small-file + data-layout op):
# the table starts WORST-CASE clustered — 8 files by doc_id % 8, so
# every file's (min, max) doc_id stats span the whole id range and a
# range filter prunes NOTHING (files_before_hit = number of residues
# present in the probed range, replayed analytically by the oracle).
# OPTIMIZE rewrites the same rows into 8 doc_id-clustered files in ONE
# commit (8 removes + 8 adds, atomic for readers); afterwards the same
# filter's stats-range prune plans EXACTLY ONE file. The read-back of
# the optimized table under the filter must agree with the corpus
# (count + id sum) — proving the rewrite moved bytes, not just stats.
# This is delta OPTIMIZE/ZORDER's scaling contract: pruning power is a
# function of LAYOUT, and the log records enough (per-file min/max) to
# plan it without opening a file.
# --------------------------------------------------------------------------
DOPT_SCHEMA = ("n_total long, n_hit long, sum_hit long, "
               "files_before_hit int, files_after_hit int, "
               "total_files int")


def _deltaz_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import math as _math
        import os as _os

        from ..sources.deltalog import (
            add_action, delta_commit, delta_metadata, remove_action,
        )

        _os.makedirs(d, exist_ok=True)
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "n_chars")

        def writer(col):
            def _w(batches):
                import pandas as pd
                import pyarrow as _pa
                import pyarrow.parquet as _pq

                pdfs = [b for b in batches if not b.empty]
                if pdfs:
                    pdf = pd.concat(pdfs, ignore_index=True)
                    facts = {k: [] for k in ("path", "size", "n",
                                             "lo", "hi")}
                    for key, grp in pdf.groupby(col):
                        grp = grp.sort_values("doc_id")
                        rel = f"{col}-{int(key)}.parquet"
                        _pq.write_table(_pa.Table.from_pandas(
                            grp[["doc_id", "n_chars"]],
                            preserve_index=False),
                            _os.path.join(d, rel))
                        facts["path"].append(rel)
                        facts["size"].append(_os.path.getsize(
                            _os.path.join(d, rel)))
                        facts["n"].append(len(grp))
                        facts["lo"].append(int(grp["doc_id"].min()))
                        facts["hi"].append(int(grp["doc_id"].max()))
                    yield pd.DataFrame(facts)
            return _w

        fact_schema = "path string, size long, n long, lo long, hi long"
        # v0: worst-case layout, 8 files by residue
        v0 = (docs.withColumn("res", (F.col("doc_id") % 8).cast("int"))
              .repartition("res")
              .mapInPandas(writer("res"), fact_schema).collect())
        meta = delta_metadata(
            [("doc_id", "long"), ("n_chars", "long")], [])
        delta_commit(d, 0, [{"metaData": meta}] + [
            {"add": add_action(r["path"], {}, r["size"], r["n"],
                               {"doc_id": r["lo"]},
                               {"doc_id": r["hi"]})}
            for r in sorted(v0, key=lambda r: r["path"])])

        # OPTIMIZE: rewrite into 8 doc_id-clustered chunks, the exact
        # ceil(n/8) chunking the oracle replays
        n = docs.count()
        c = _math.ceil(n / 8)
        # ceil-exact chunking so the oracle can replay the boundaries;
        # a production OPTIMIZE would repartitionByRange instead of a
        # global row_number (this runs once, in the one-time layout
        # job, not in the read path)
        w = Window.orderBy("doc_id")
        chunked = docs.withColumn(
            "chunk", ((F.row_number().over(w) - 1) / c)
            .cast("int"))
        v1 = (chunked.repartition("chunk")
              .mapInPandas(writer("chunk"), fact_schema).collect())
        delta_commit(d, 1, [
            {"remove": remove_action(r["path"])} for r in v0] + [
            {"add": add_action(r["path"], {}, r["size"], r["n"],
                               {"doc_id": r["lo"]},
                               {"doc_id": r["hi"]})}
            for r in sorted(v1, key=lambda r: r["path"])],
            operation="OPTIMIZE")

    return _derived_dir(sf_dir, "deltaz", build)


@register(
    "q426_delta_optimize",
    oracle="""
    WITH ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY doc_id) AS rn,
             COUNT(*) OVER () AS n
      FROM documents
    ), c1 AS (
      SELECT doc_id, n FROM ranked
      WHERE rn <= CAST(ceil(n / 8.0) AS BIGINT)
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS n_hit,
           CAST(SUM(doc_id) AS BIGINT) AS sum_hit,
           CAST(COUNT(DISTINCT doc_id % 8) AS INT) AS files_before_hit,
           CAST(1 AS INT) AS files_after_hit,
           CAST(8 AS INT) AS total_files
    FROM c1
    """,
)
def q426(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json

    from ..sources.deltalog import (
        delta_snapshot, prune_adds, read_delta,
    )

    d = _deltaz_dir(spark, sf_dir)
    head = delta_snapshot(d)
    v0 = delta_snapshot(d, version=0)
    # the probe range = the first optimized chunk's exact id span
    chunk1 = min(head["adds"].values(),
                 key=lambda a: json.loads(a["stats"])["minValues"]
                 ["doc_id"])
    st = json.loads(chunk1["stats"])
    lo, hi = st["minValues"]["doc_id"], st["maxValues"]["doc_id"]
    before = len(prune_adds(v0, column_ranges={"doc_id": (lo, hi)}))
    after = len(prune_adds(head, column_ranges={"doc_id": (lo, hi)}))
    hit = (read_delta(spark, d)
           .filter((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)))
    total = read_delta(spark, d).count()
    return hit.agg(
        F.lit(total).cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("n_hit"),
        F.sum("doc_id").cast("bigint").alias("sum_hit"),
        F.lit(before).cast("int").alias("files_before_hit"),
        F.lit(after).cast("int").alias("files_after_hit"),
        F.lit(len(head["adds"])).cast("int").alias("total_files"))


# --------------------------------------------------------------------------
# q427 — ICEBERG V2 DELETE FILES (merge-on-read): the row-level delete
# machinery real Iceberg tables use. History: per-lang appends (seq
# 1-5), a GLOBAL EQUALITY delete file removing every doc_id % 10 == 3
# key (seq 6), a re-insert of the % 20 == 3 half of those keys (seq 7
# — they must SURVIVE, because equality deletes only apply to data
# files with data_seq < delete_seq), and a POSITIONAL delete file
# removing the first 5 row positions of the even-en data file (seq 8;
# row positions come from the parquet scan's own _metadata.row_index).
# The oracle replays the survivor set analytically: a sequence-rule
# bug, a mis-applied position, or a partition/delete interaction error
# all change the per-lang counts and id sums.
# --------------------------------------------------------------------------
IMOR_SCHEMA = ("lang string, n_docs long, id_sum long, chars_sum long")


def _iceberg_mor_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os as _os

        from ..sources.iceberg import IcebergTable

        _os.makedirs(_os.path.join(d, "data"), exist_ok=True)
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "n_chars", "lang")

        def writer(tag):
            def _w(batches):
                import pandas as pd
                import pyarrow as _pa
                import pyarrow.parquet as _pq

                pdfs = [b for b in batches if not b.empty]
                if pdfs:
                    pdf = pd.concat(pdfs, ignore_index=True)
                    facts = {k: [] for k in ("path", "lang", "size",
                                             "n")}
                    for (lang, shard), grp in pdf.groupby(
                            ["lang", "shard"]):
                        grp = grp.sort_values("doc_id")
                        rel = f"data/{tag}-{lang}-{int(shard)}.parquet"
                        _pq.write_table(_pa.Table.from_pandas(
                            grp[["doc_id", "n_chars", "lang"]],
                            preserve_index=False),
                            _os.path.join(d, rel))
                        facts["path"].append(rel)
                        facts["lang"].append(lang)
                        facts["size"].append(_os.path.getsize(
                            _os.path.join(d, rel)))
                        facts["n"].append(len(grp))
                    yield pd.DataFrame(facts)
            return _w

        fact_schema = "path string, lang string, size long, n long"
        base = (docs.withColumn("shard", (F.col("doc_id") % 2)
                                .cast("int"))
                .repartition("lang", "shard")
                .mapInPandas(writer("b"), fact_schema).collect())
        table = IcebergTable(
            d, [("doc_id", "long"), ("n_chars", "long"),
                ("lang", "string")], ["lang"])
        for lang in sorted({r["lang"] for r in base}):   # seq 1..5
            table.commit([{
                "path": r["path"], "partition": {"lang": r["lang"]},
                "record_count": r["n"], "size": r["size"],
            } for r in sorted(base, key=lambda r: r["path"])
                if r["lang"] == lang])

        # seq 6: GLOBAL equality delete of doc_id % 10 == 3
        def del_writer(batches):
            import pandas as pd
            import pyarrow as _pa
            import pyarrow.parquet as _pq

            pdfs = [b for b in batches if not b.empty]
            if pdfs:
                pdf = pd.concat(pdfs, ignore_index=True).sort_values(
                    "doc_id")
                rel = "data/eq-delete.parquet"
                _pq.write_table(_pa.Table.from_pandas(
                    pdf[["doc_id"]], preserve_index=False),
                    _os.path.join(d, rel))
                yield pd.DataFrame({
                    "path": [rel],
                    "size": [_os.path.getsize(_os.path.join(d, rel))],
                    "n": [len(pdf)]})

        eq = (docs.filter(F.col("doc_id") % 10 == 3).select("doc_id")
              .repartition(1)
              .mapInPandas(del_writer, "path string, size long, n long")
              .collect())[0]
        table.commit([{"path": eq["path"], "partition": {"lang": None},
                       "record_count": eq["n"], "size": eq["size"],
                       "content": 2, "equality_ids": [1]}],
                     operation="delete")

        # seq 7: re-insert the % 20 == 3 half — these must survive
        re_rows = (docs.filter(F.col("doc_id") % 20 == 3)
                   .withColumn("shard", F.lit(9))
                   .repartition("lang")
                   .mapInPandas(writer("r"), fact_schema).collect())
        table.commit([{
            "path": r["path"], "partition": {"lang": r["lang"]},
            "record_count": r["n"], "size": r["size"],
        } for r in sorted(re_rows, key=lambda r: r["path"])])

        # seq 8: positional delete of the first 5 rows of the even-en
        # base file (its rows are doc_id-sorted by construction)
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        rel = "data/pos-delete.parquet"
        _pq.write_table(_pa.table({
            "file_path": _pa.array(["data/b-en-0.parquet"] * 5),
            "pos": _pa.array(list(range(5)), _pa.int64())}),
            _os.path.join(d, rel))
        table.commit([{"path": rel, "partition": {"lang": None},
                       "record_count": 5,
                       "size": _os.path.getsize(_os.path.join(d, rel)),
                       "content": 1}], operation="delete")

    return _derived_dir(sf_dir, "icebergmor", build)


@register(
    "q427_iceberg_mor_deletes",
    oracle="""
    WITH en5 AS (
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn
        FROM documents WHERE lang = 'en' AND doc_id % 2 = 0)
      WHERE rn <= 5
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sum
    FROM documents
    WHERE NOT (doc_id % 10 = 3 AND doc_id % 20 <> 3)
      AND doc_id NOT IN (SELECT doc_id FROM en5)
    GROUP BY lang
    """,
)
def q427(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.iceberg import read_iceberg

    d = _iceberg_mor_dir(spark, sf_dir)
    return read_iceberg(spark, d).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.sum("n_chars").cast("bigint").alias("chars_sum"))



# --------------------------------------------------------------------------
# q451 — HUDI COPY-ON-WRITE SNAPSHOT (sources/hudi.py): the third
# lakehouse table format next to Delta (q218/q421, log replay) and
# Iceberg (q422/q427, manifest sets) — Hudi's structure is the FILE
# GROUP whose base file each commit atomically supersedes. The
# fixture commits orders partitioned by priority (t1 = bulk insert),
# then UPSERTS two partitions (t2: +100 on every 10th order key,
# whole-slice COW rewrite). The snapshot plan comes from the TIMELINE
# ALONE (no directory listing), must pick exactly one slice per file
# group — t2's for the touched partitions, t1's elsewhere — and the
# decoded rows must reproduce the update. The plan's chosen commit
# per partition is emitted alongside the aggregates so a wrong slice
# selection fails the hash even when row counts agree.
# --------------------------------------------------------------------------
_HUDI_TOUCHED = ("1-URGENT", "2-HIGH")


def _hudi_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import pyarrow.parquet as pq

        from ..sources import hudi as H

        tbl = pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice",
                     "o_orderpriority"])
        pdf = tbl.to_pandas().sort_values("o_orderkey")
        H.create_table(d, "orders_cow", partition_field="o_orderpriority",
                       record_key_field="o_orderkey")
        t1, t2 = H.instant_time(1), H.instant_time(2)
        parts = {f"prio={p}": g.drop(columns=[])
                 for p, g in pdf.groupby("o_orderpriority", sort=True)}
        fids = H.commit_pandas(d, t1, parts, key_col="o_orderkey")
        # t2: COW upsert of the touched partitions — +100 on every
        # 10th key; copied rows keep t1 as their commit time (spec)
        upserts = {}
        row_ts = {}
        for p in _HUDI_TOUCHED:
            part = f"prio={p}"
            g = parts[part].copy()
            hit = g["o_orderkey"] % 10 == 0
            g.loc[hit, "o_totalprice"] = g.loc[hit, "o_totalprice"] + 100
            upserts[part] = g
            row_ts[part] = hit.map({True: t2, False: t1})
        H.commit_pandas(d, t2, upserts,
                        file_ids={f"prio={p}": fids[f"prio={p}"]
                                  for p in _HUDI_TOUCHED},
                        key_col="o_orderkey", row_commit_ts=row_ts)

    return _derived_dir(sf_dir, "hudicow", build)


_Q451_ORACLE = f"""
    SELECT o_orderpriority,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN '{{t2}}' ELSE '{{t1}}' END AS slice_commit,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           round(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                               AND o_orderkey % 10 = 0
                          THEN o_totalprice + 100
                          ELSE o_totalprice END), 2) + 0.0 AS sum_price
    FROM orders GROUP BY 1
"""


@register("q451_hudi_snapshot", oracle=_Q451_ORACLE.format(
    t1="20260101000001000", t2="20260101000002000"))
def q451(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import hudi as H

    d = _hudi_dir(spark, sf_dir)
    # timeline-only plan: commit chosen per partition (no file stat)
    plan = {s["partition"].split("=", 1)[1]: s["commit_ts"]
            for s in H.snapshot_slices(d)}
    plan_df = spark.createDataFrame(
        list(plan.items()), "o_orderpriority string, slice_commit string")
    rows = H.read_hudi(spark, d)
    return (rows.groupBy("o_orderpriority").agg(
                F.count("*").alias("n"),
                F.sum("o_orderkey").alias("sum_key"),
                (F.round(F.sum("o_totalprice"), 2) + 0.0)
                .alias("sum_price"))
            .join(F.broadcast(plan_df), "o_orderpriority")
            .select("o_orderpriority", "slice_commit", "n", "sum_key",
                    "sum_price"))


# --------------------------------------------------------------------------
# q452 — HUDI TIME TRAVEL + INCREMENTAL PULL: the same table read
# three ways — 'asof' at t1 (pre-update values, the old slices), and
# 'incr' over (t1, t2] (only the rows t2 actually CHANGED: the COW
# rewrite copies unchanged rows with their t1 commit time preserved,
# so the `_hoodie_commit_time > t1` row filter on the rewritten
# slices recovers exact change capture — the spec contract
# incremental consumers rely on). A wrong preserved-commit-time, a
# wrong slice window, or a leaked unchanged row all break the hash.
# --------------------------------------------------------------------------
_Q452_ORACLE = """
    SELECT 'asof' AS mode, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           round(SUM(o_totalprice), 2) + 0.0 AS sum_price
    FROM orders GROUP BY 2
    UNION ALL
    SELECT 'incr', o_orderpriority,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(o_orderkey) AS BIGINT),
           round(SUM(o_totalprice + 100), 2) + 0.0
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderkey % 10 = 0
    GROUP BY 2
"""


@register("q452_hudi_incremental", oracle=_Q452_ORACLE)
def q452(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import hudi as H

    d = _hudi_dir(spark, sf_dir)
    t1 = H.instant_time(1)
    asof = (H.read_hudi(spark, d, as_of=t1)
            .groupBy("o_orderpriority").agg(
                F.count("*").alias("n"),
                F.sum("o_orderkey").alias("sum_key"),
                (F.round(F.sum("o_totalprice"), 2) + 0.0)
                .alias("sum_price"))
            .withColumn("mode", F.lit("asof")))
    incr = (H.read_hudi_incremental(spark, d, begin=t1)
            .groupBy("o_orderpriority").agg(
                F.count("*").alias("n"),
                F.sum("o_orderkey").alias("sum_key"),
                (F.round(F.sum("o_totalprice"), 2) + 0.0)
                .alias("sum_price"))
            .withColumn("mode", F.lit("incr")))
    return asof.unionByName(incr).select(
        "mode", "o_orderpriority", "n", "sum_key", "sum_price")


# --------------------------------------------------------------------------
# q460 — LAKEHOUSE TRIO, ONE TRUTH: the same customer slice committed
# to all three table formats in-tree — Delta (partition values in the
# LOG, attached as literals on read), Iceberg format-v2 (identity
# partition columns IN the files, manifest-set snapshots), Hudi COW
# (file groups under .hoodie timeline) — then read back through each
# format's own planner and aggregated per (format, segment). The
# three result thirds must be identical to each other AND to the
# parquet oracle: any divergence in log replay, manifest planning, or
# slice selection shows up as a hash break. This is the portability
# statement a migrating 100 TB shop actually needs.
# --------------------------------------------------------------------------
def _trio_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os as _os

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        from ..sources import hudi as H
        from ..sources.deltalog import (
            add_action, delta_commit, delta_metadata,
        )
        from ..sources.iceberg import IcebergTable

        cust = (load(spark, sf_dir, "customer")
                .select("c_custkey", "c_mktsegment", "c_acctbal")
                .toPandas().sort_values("c_custkey"))
        # bounded: customer is the smallest fact-adjacent table; the
        # build is a one-time fixture write (same driver-side shape as
        # the q421/q422 builders)
        segs = sorted(cust["c_mktsegment"].unique())

        ddir, idir, hdir = (f"{d}/delta", f"{d}/iceberg", f"{d}/hudi")
        for sub in (ddir, idir):
            _os.makedirs(sub, exist_ok=True)

        # --- Delta: partition col lives in the LOG, not the file
        adds = []
        for seg in segs:
            grp = cust[cust["c_mktsegment"] == seg]
            rel = f"part-{seg}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(grp[["c_custkey", "c_acctbal"]],
                                      preserve_index=False),
                f"{ddir}/{rel}")
            adds.append({"add": add_action(
                rel, {"c_mktsegment": seg},
                _os.path.getsize(f"{ddir}/{rel}"), len(grp),
                {"c_custkey": int(grp["c_custkey"].min())},
                {"c_custkey": int(grp["c_custkey"].max())})})
        meta = delta_metadata(
            [("c_custkey", "long"), ("c_acctbal", "double"),
             ("c_mktsegment", "string")], ["c_mktsegment"])
        delta_commit(ddir, 0, [{"metaData": meta}] + adds)

        # --- Iceberg: identity partition col IN the files
        files = []
        for seg in segs:
            grp = cust[cust["c_mktsegment"] == seg]
            rel = f"data/{seg}.parquet"
            _os.makedirs(f"{idir}/data", exist_ok=True)
            _pq.write_table(
                _pa.Table.from_pandas(grp, preserve_index=False),
                f"{idir}/{rel}")
            files.append({"path": rel,
                          "partition": {"c_mktsegment": seg},
                          "record_count": len(grp),
                          "size": _os.path.getsize(f"{idir}/{rel}")})
        IcebergTable(idir, [("c_custkey", "long"),
                            ("c_acctbal", "double"),
                            ("c_mktsegment", "string")],
                     ["c_mktsegment"]).commit(files)

        # --- Hudi COW: file groups under the timeline
        H.create_table(hdir, "cust_cow", partition_field="c_mktsegment",
                       record_key_field="c_custkey")
        H.commit_pandas(
            hdir, H.instant_time(1),
            {f"seg={seg}": cust[cust["c_mktsegment"] == seg]
             for seg in segs},
            key_col="c_custkey")

    return _derived_dir(sf_dir, "lake3", build)


@register(
    "q460_lakehouse_trio",
    oracle="""
    SELECT f.fmt, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
           CAST(round(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2)
                AS DOUBLE) + 0.0 AS sum_bal
    FROM customer
    CROSS JOIN (SELECT unnest(ARRAY['delta', 'hudi', 'iceberg'])
                AS fmt) f
    GROUP BY f.fmt, c_mktsegment
    """,
)
def q460(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.deltalog import read_delta
    from ..sources.hudi import read_hudi
    from ..sources.iceberg import read_iceberg

    d = _trio_dir(spark, sf_dir)
    parts = []
    for fmt, df in (
            ("delta", read_delta(spark, f"{d}/delta")),
            ("iceberg", read_iceberg(spark, f"{d}/iceberg")),
            ("hudi", read_hudi(spark, f"{d}/hudi"))):
        parts.append(df.select(
            F.lit(fmt).alias("fmt"), "c_mktsegment", "c_custkey",
            "c_acctbal"))
    allf = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return allf.groupBy("fmt", "c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum("c_custkey").alias("sum_key"),
        (F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
         .cast("double") + 0.0).alias("sum_bal"))


# --------------------------------------------------------------------------
# q464 — ICEBERG RENAME-SAFE SCHEMA EVOLUTION: THE feature field ids
# exist for — columns are renamed in METADATA ONLY (update_schema
# appends a new schema keeping every field's id) and no data file is
# rewritten. The fixture commits odd-custkey files under the v0 names
# (c_acctbal / c_mktsegment), renames both columns, then commits
# even-custkey files under the NEW names — a mixed table. The read
# must reconcile both generations through the schemas-history name
# mapping (coalesce old-name/new-name per field id over a
# schema-merged scan) and aggregate under the CURRENT names; a broken
# mapping loses half the rows or nulls a column, breaking the hash.
# --------------------------------------------------------------------------
def _renamed_iceberg_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os as _os

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        from ..sources.iceberg import IcebergTable

        cust = (load(spark, sf_dir, "customer")
                .select("c_custkey", "c_mktsegment", "c_acctbal")
                .toPandas().sort_values("c_custkey"))
        # bounded one-time fixture write (q422-builder shape)
        _os.makedirs(f"{d}/data", exist_ok=True)
        table = IcebergTable(
            d, [("c_custkey", "long"), ("c_mktsegment", "string"),
                ("c_acctbal", "double")], [])

        def write_files(pdf, tag):
            files = []
            for half in (0, 1):
                grp = pdf[pdf["c_custkey"] % 2 == half]
                rel = f"data/{tag}-{half}.parquet"
                _pq.write_table(
                    _pa.Table.from_pandas(grp, preserve_index=False),
                    f"{d}/{rel}")
                files.append({"path": rel, "partition": {},
                              "record_count": len(grp),
                              "size": _os.path.getsize(f"{d}/{rel}")})
            return files

        odd = cust[cust["c_custkey"] % 3 != 0]
        table.commit(write_files(odd, "v0"))
        table.update_schema({"c_acctbal": "account_balance",
                             "c_mktsegment": "segment"})
        new = (cust[cust["c_custkey"] % 3 == 0]
               .rename(columns={"c_acctbal": "account_balance",
                                "c_mktsegment": "segment"}))
        table.commit(write_files(new, "v1"))

    return _derived_dir(sf_dir, "icerename", build)


@register(
    "q464_iceberg_rename",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
           CAST(round(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2)
                AS DOUBLE) + 0.0 AS sum_bal
    FROM customer GROUP BY 1
    """,
)
def q464(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.iceberg import read_iceberg

    d = _renamed_iceberg_dir(spark, sf_dir)
    df = read_iceberg(spark, d)
    return df.groupBy("segment").agg(
        F.count("*").alias("n"),
        F.sum("c_custkey").alias("sum_key"),
        (F.round(F.sum(F.col("account_balance").cast("decimal(18,2)")),
                 2).cast("double") + 0.0).alias("sum_bal"))

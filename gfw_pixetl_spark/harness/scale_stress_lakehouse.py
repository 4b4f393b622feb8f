"""Lakehouse-log scale-stress golden run: the Delta interop at size —

    ~115 MB of incompressible document payloads -> 64 partitioned
    parquet files written executor-side -> Delta commit v0 -> 12
    append commits + a parquet CHECKPOINT cut at v10 -> a partition
    DELETE at v13 -> checkpointed HEAD read with log-only partition +
    stats pruning -> time travel to v0

Every fact is closed-form: ids are dense, bodies are fixed-width
md5-chain binaries (incompressible, so parquet size tracks raw size),
appends add exactly ``APPEND_ROWS`` ids per commit at known offsets,
and the delete removes one known partition.  ``verify_outputs``
checks byte volume, the checkpoint version, file counts before/after
pruning, and exact count/id-sum equalities for the pruned HEAD read,
the deleted partition, and the v0 time travel.
``tests/test_scale_stress_lakehouse.py`` asserts these (marked slow);
``bench.py`` records wall time (``scale_stress_lakehouse`` entry,
golden flag).

Scale shape being proven: HEAD planning reads ONE checkpoint + 3 JSON
commits no matter how many files the table holds, and the partition +
stats prune selects 8/72 files before a single data byte is read.
"""
from __future__ import annotations

import json
import math
import os
import time

_SCALE = int(__import__("os").environ.get("SPARK_GRAFT_STRESS_SCALE", "1"))
N_DOCS = 400_000 * _SCALE
N_PARTS = 8
CHUNKS_PER_PART = 8          # 64 base files
BODY_BLOCKS = 18             # 18 x 16-byte md5 blocks = 288 B/doc
N_APPENDS = 12               # commits v1..v12 (checkpoint cut at v10)
APPEND_ROWS = 1_000
DELETED_PART = f"p{N_PARTS - 1}"


def make_body(i: int) -> bytes:
    import hashlib

    out = bytearray()
    h = hashlib.md5(f"doc:{i}".encode()).digest()
    for _ in range(BODY_BLOCKS):
        out += h
        h = hashlib.md5(h).digest()
    return bytes(out)


def _write_files(spark, table_dir: str, ids_df, tag: str):
    """One parquet file per (partition, chunk) group; returns the
    bounded per-file facts for the commit."""
    import pandas as pd
    from pyspark.sql import functions as F

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        # one partition arrives as MANY Arrow batches; a (part, chunk)
        # group must be written once, so concatenate first
        pdfs = [b for b in batches if not b.empty]
        if pdfs:
            pdf = pd.concat(pdfs, ignore_index=True)
            facts = {k: [] for k in ("path", "part", "size", "n",
                                     "lo", "hi")}
            for (part, chunk), grp in pdf.groupby(["part", "chunk"]):
                ids = sorted(int(x) for x in grp["id"])
                rel = f"{tag}-{part}-{int(chunk)}.parquet"
                tbl = pa.table({
                    "doc_id": pa.array(ids, pa.int64()),
                    "body": pa.array([make_body(i) for i in ids],
                                     pa.binary()),
                    "n_blocks": pa.array([BODY_BLOCKS] * len(ids),
                                         pa.int32()),
                })
                pq.write_table(tbl, os.path.join(table_dir, rel))
                facts["path"].append(rel)
                facts["part"].append(part)
                facts["size"].append(os.path.getsize(
                    os.path.join(table_dir, rel)))
                facts["n"].append(len(ids))
                facts["lo"].append(ids[0])
                facts["hi"].append(ids[-1])
            yield pd.DataFrame(facts)

    work = (ids_df
            .withColumn("part", F.concat(
                F.lit("p"), (F.col("id") % N_PARTS).cast("string")))
            .withColumn("chunk", (F.col("id") / (N_DOCS // 8) % 100)
                        .cast("int")))
    return (work.repartition("part", "chunk")
            .mapInPandas(kernel, "path string, part string, size long,"
                         " n long, lo long, hi long")
            .collect())


def run(spark, work_dir: str) -> dict:
    from pyspark.sql import functions as F

    from ..sources.deltalog import (
        add_action, delta_commit, delta_metadata, delta_snapshot,
        prune_adds, read_delta, remove_action,
    )

    t0 = time.perf_counter()
    table_dir = os.path.join(work_dir, "tbl")
    os.makedirs(table_dir, exist_ok=True)

    # ---- v0: the base table, 64 partitioned files written at size
    base = _write_files(spark, table_dir, spark.range(N_DOCS), "base")
    meta = delta_metadata(
        [("doc_id", "long"), ("body", "binary"),
         ("n_blocks", "integer"), ("part", "string")], ["part"])
    delta_commit(table_dir, 0, [{"metaData": meta}] + [
        {"add": add_action(r["path"], {"part": r["part"]}, r["size"],
                           r["n"], {"doc_id": r["lo"]},
                           {"doc_id": r["hi"]})}
        for r in sorted(base, key=lambda r: r["path"])])

    # ---- v1..v12: append churn (checkpoint auto-cut at v10)
    for c in range(1, N_APPENDS + 1):
        lo = N_DOCS + (c - 1) * APPEND_ROWS
        rows = _write_files(
            spark, table_dir,
            spark.range(lo, lo + APPEND_ROWS), f"a{c:02d}")
        delta_commit(table_dir, c, [
            {"add": add_action(r["path"], {"part": r["part"]},
                               r["size"], r["n"], {"doc_id": r["lo"]},
                               {"doc_id": r["hi"]})}
            for r in sorted(rows, key=lambda r: r["path"])])

    # ---- v13: DELETE one partition (tombstones only, no data IO)
    head_before = delta_snapshot(table_dir)
    doomed = [a["path"] for a in head_before["adds"].values()
              if a["partitionValues"]["part"] == DELETED_PART]
    delta_commit(table_dir, N_APPENDS + 1,
                 [{"remove": remove_action(p)} for p in sorted(doomed)],
                 operation="DELETE")
    sec_write = time.perf_counter() - t0

    # ---- reads: checkpointed HEAD plan + pruned scan + time travel
    t1 = time.perf_counter()
    head = delta_snapshot(table_dir)
    probe_part = "p3"
    pruned = prune_adds(head, partition_filter={"part": probe_part})
    hit = read_delta(spark, table_dir,
                     partition_filter={"part": probe_part})
    agg = hit.agg(F.count("*").alias("n"),
                  F.sum("doc_id").alias("s")).collect()[0]
    deleted_now = prune_adds(head,
                             partition_filter={"part": DELETED_PART})
    v0_state = delta_snapshot(table_dir, version=0)
    v0_n = read_delta(spark, table_dir, version=0).count()
    sec_read = time.perf_counter() - t1

    lc = json.loads((os.path.join(table_dir, "_delta_log",
                                  "_last_checkpoint") and
                     open(os.path.join(table_dir, "_delta_log",
                                       "_last_checkpoint")).read()))
    return {
        "sec_full_pipeline": round(time.perf_counter() - t0, 3),
        "sec_write": round(sec_write, 3),
        "sec_read": round(sec_read, 3),
        "data_bytes": sum(r["size"] for r in base),
        "n_base_files": len(base),
        "head_version": head["version"],
        "checkpoint_version": lc["version"],
        "head_files": len(head["adds"]),
        "pruned_files": len(pruned),
        "probe_part": probe_part,
        "probe_n": int(agg["n"]),
        "probe_sum": int(agg["s"]),
        "deleted_part_files": len(deleted_now),
        "v0_files": len(v0_state["adds"]),
        "v0_rows": int(v0_n),
    }


def _expected_part_stats(part_idx: int) -> tuple[int, int]:
    """(count, id sum) of partition p{part_idx} at HEAD, closed form:
    base ids i < N_DOCS with i % N_PARTS == part_idx, plus every
    append id with the same residue."""
    n = 0
    s = 0
    base_n = N_DOCS // N_PARTS
    n += base_n
    # sum of part_idx, part_idx + 8, ... (base_n terms)
    s += base_n * part_idx + N_PARTS * (base_n - 1) * base_n // 2
    for c in range(1, N_APPENDS + 1):
        lo = N_DOCS + (c - 1) * APPEND_ROWS
        ids = [i for i in range(lo, lo + APPEND_ROWS)
               if i % N_PARTS == part_idx]
        n += len(ids)
        s += sum(ids)
    return n, s


def verify_outputs(facts: dict) -> list[str]:
    problems = []

    def check(cond: bool, msg: str) -> None:
        if not cond:
            problems.append(msg)

    check(facts["data_bytes"] >= 100 * 2**20,
          f"base data below 100 MB: {facts['data_bytes']}")
    check(facts["n_base_files"] == N_PARTS * CHUNKS_PER_PART,
          f"base file count {facts['n_base_files']}")
    check(facts["head_version"] == N_APPENDS + 1,
          f"head version {facts['head_version']}")
    check(facts["checkpoint_version"] == 10,
          f"checkpoint at {facts['checkpoint_version']}, wanted 10")
    # head files: base minus deleted partition plus appends that do
    # not belong to the deleted partition
    append_files = 0
    deleted_append_files = 0
    for c in range(1, N_APPENDS + 1):
        lo = N_DOCS + (c - 1) * APPEND_ROWS
        parts = {i % N_PARTS for i in range(lo, lo + APPEND_ROWS)}
        append_files += len(parts)
        if (N_PARTS - 1) in parts:
            deleted_append_files += 1
    expected_head = (N_PARTS - 1) * CHUNKS_PER_PART + (
        append_files - deleted_append_files)
    check(facts["head_files"] == expected_head,
          f"head files {facts['head_files']} != {expected_head}")
    check(facts["deleted_part_files"] == 0,
          f"deleted partition still plans "
          f"{facts['deleted_part_files']} files")
    check(facts["v0_files"] == N_PARTS * CHUNKS_PER_PART,
          f"v0 files {facts['v0_files']}")
    check(facts["v0_rows"] == N_DOCS,
          f"v0 rows {facts['v0_rows']} != {N_DOCS}")
    exp_pruned = CHUNKS_PER_PART + sum(
        1 for c in range(1, N_APPENDS + 1)
        if 3 in {i % N_PARTS for i in range(
            N_DOCS + (c - 1) * APPEND_ROWS,
            N_DOCS + c * APPEND_ROWS)})
    check(facts["pruned_files"] == exp_pruned,
          f"pruned files {facts['pruned_files']} != {exp_pruned}")
    exp_n, exp_s = _expected_part_stats(3)
    check(facts["probe_n"] == exp_n,
          f"probe count {facts['probe_n']} != {exp_n}")
    check(facts["probe_sum"] == exp_s,
          f"probe id sum {facts['probe_sum']} != {exp_s}")
    return problems

"""WebDataset-style tar shard sink + source for training-data export.

The de-facto loader format for large-scale LLM/multimodal training
(webdataset/tarp tooling; also consumed by torchdata and NeMo) is plain
POSIX tar shards where each sample is a group of files sharing a key
stem: ``000123.txt``, ``000123.json``, ``000123.png``. This module
writes a DataFrame into such shards and reads them back — stdlib
``tarfile`` only, no webdataset dependency.

Execution model (the part that must survive 100 TB):
* **Shard assignment is a column**, not a collect: rows hash/modulo (or
  any caller-supplied expression) into ``n_shards`` buckets, then ONE
  shuffle groups each shard onto one writer task (same single-writer-
  per-tile invariant as the COG sink). Shard size is controlled by
  shard count, the knob WebDataset tooling expects (~1 GB/shard in
  production).
* **Writers stream**: each task appends samples to its tar and never
  holds more than one sample in memory beyond the Arrow batch.
* **Reads parallelize by shard**: the catalog of shard paths fans out
  via ``mapInPandas``; each task untars one shard sequentially — tar
  has no random access, which is exactly why the format shards.
* Sample order inside a shard is made deterministic (sorted by key) so
  re-runs produce byte-identical shards — reproducible exports.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WRITE_SCHEMA = "shard_id int, path string, n_samples long, n_bytes long"
READ_SCHEMA = "shard string, key string, suffix string, payload binary"


def write_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    key_col: str = "doc_id",
    columns: dict[str, str] | None = None,
    prefix: str = "shard",
    shard_expr=None,
) -> DataFrame:
    """Write ``df`` into ``n_shards`` tar shards under ``out_dir``.

    ``columns`` maps DataFrame columns to file suffixes, e.g.
    ``{"text": "txt", "meta": "json", "payload": "png"}``; string
    columns are UTF-8 encoded, binary columns pass through. Returns one
    status row per shard (same contract shape as the tile sink).
    """
    columns = columns or {"text": "txt"}
    for c in [key_col, *columns]:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")
    # default: uniform hash sharding; callers may pass any expression
    # (e.g. doc_id % n for replayable assignment, or a curriculum bucket)
    shard = shard_expr if shard_expr is not None else (
        (F.xxhash64(F.col(key_col)) % n_shards + n_shards) % n_shards
    )
    shard = shard.cast("int")
    cols = list(columns)
    suffixes = [columns[c] for c in cols]

    def writer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # rows arrive repartitioned by shard and sorted by (shard, key),
        # so each shard is a contiguous run across the Arrow batches —
        # the writer holds ONE open tar and one batch at a time, never a
        # whole shard (applyInPandas would materialize the full group)
        os.makedirs(out_dir, exist_ok=True)
        cur_sid = None
        tar = tmp = path = None
        n_samples = n_bytes = 0
        done = []

        def close():
            nonlocal tar
            if tar is not None:
                tar.close()
                os.replace(tmp, path)  # atomic publish
                done.append((cur_sid, path, n_samples, n_bytes))
                tar = None

        for pdf in batches:
            for r in pdf.itertuples(index=False):
                sid = int(r.shard_id)
                if sid != cur_sid:
                    close()
                    cur_sid = sid
                    path = os.path.join(
                        out_dir, f"{prefix}-{sid:06d}.tar")
                    tmp = f"{path}.tmp{os.getpid()}"
                    tar = tarfile.open(tmp, "w")
                    n_samples = n_bytes = 0
                key = getattr(r, key_col)
                for c, suf in zip(cols, suffixes):
                    v = getattr(r, c)
                    if v is None:
                        continue
                    data = v if isinstance(v, (bytes, bytearray)) \
                        else str(v).encode("utf-8")
                    info = tarfile.TarInfo(name=f"{key}.{suf}")
                    info.size = len(data)
                    info.mtime = 0  # reproducible bytes
                    tar.addfile(info, io.BytesIO(bytes(data)))
                    n_bytes += len(data)
                n_samples += 1
        close()
        if done:
            yield pd.DataFrame(
                done,
                columns=["shard_id", "path", "n_samples", "n_bytes"],
            )

    return (
        df.select(key_col, *cols, shard.alias("shard_id"))
        .repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", key_col)
        .mapInPandas(writer, WRITE_SCHEMA)
    )


def read_shards(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Read tar shards back as (shard, key, suffix, payload) rows — one
    task per shard, streamed sequentially through ``tarfile``."""
    catalog = spark.createDataFrame(
        spark.sparkContext.parallelize([(p,) for p in paths],
                                       max(1, len(paths))),
        "path string",
    )

    def reader(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                shards, keys, sufs, payloads = [], [], [], []
                with tarfile.open(p, "r") as tar:
                    for m in tar:
                        if not m.isfile():
                            continue
                        stem, _, suf = m.name.rpartition(".")
                        shards.append(os.path.basename(p))
                        keys.append(stem)
                        sufs.append(suf)
                        payloads.append(tar.extractfile(m).read())
                yield pd.DataFrame({
                    "shard": shards, "key": keys, "suffix": sufs,
                    "payload": payloads,
                })

    return catalog.mapInPandas(reader, READ_SCHEMA)

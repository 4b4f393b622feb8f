"""Size-targeted parquet writing — the small-file answer for 100 TB
stores.

A tile/document store appended by many incremental jobs decays into
millions of KB-scale files; every later scan then pays one object-store
round-trip per file. The reference never faces this (one COG per tile
forever, ``gfw_pixetl/tiles/tile.py:54-97``), but a Spark engine
emitting parquet does. Compaction here is declarative: estimate bytes
per row from a driver-side sample, choose the file count that lands
near ``target_mb``, and route rows with ``repartition`` (hash, default)
or ``repartitionByRange`` (when a sort key should cluster files for
min/max skipping). ``maxRecordsPerFile`` is set as a hard cap so a bad
estimate degrades to more files, never to a 10 GB file.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def estimate_row_bytes(df: DataFrame, sample_rows: int = 1000) -> float:
    """Serialized-parquet bytes per row, estimated from an uncompressed
    in-memory sample (driver-side, bounded by ``sample_rows``).
    Compression is workload-dependent; the default assumes ~2:1 — the
    cap in :func:`compact_to_files` absorbs the error."""
    sample = df.limit(sample_rows).toPandas()
    if len(sample) == 0:
        return 1.0
    raw = float(sample.memory_usage(index=False, deep=True).sum())
    return max(1.0, raw / len(sample) / 2.0)


def compact_to_files(
    df: DataFrame,
    path: str,
    target_mb: int = 128,
    range_key: str | None = None,
    sample_rows: int = 1000,
    mode: str = "overwrite",
) -> int:
    """Write ``df`` as parquet in files of ~``target_mb``. Returns the
    chosen file count. With ``range_key``, files are range-clustered on
    that column so parquet min/max stats prune later scans (the
    query-side payoff of compaction, not just fewer objects)."""
    row_bytes = estimate_row_bytes(df, sample_rows)
    total = df.count()
    target = target_mb * 1024 * 1024
    n_files = max(1, math.ceil(total * row_bytes / target))
    rows_cap = max(1, int(target / row_bytes) * 2)
    routed = (
        df.repartitionByRange(n_files, range_key)
        if range_key is not None
        else df.repartition(n_files)
    )
    (
        routed.write.mode(mode)
        .option("maxRecordsPerFile", rows_cap)
        .parquet(path)
    )
    return n_files


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...],
    target_mb: int = 128,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet layout (``path/col=value/...``) with the
    same size-targeted file discipline inside each partition.

    Partition columns become directory structure, so a filter on them
    prunes at PLANNING time (``PartitionFilters`` in the scan — zero
    object-store reads for pruned partitions), strictly stronger than
    row-group min/max skipping. Choose low-cardinality columns only: a
    high-cardinality partition key recreates the small-file problem as
    a small-DIRECTORY problem.
    """
    row_bytes = estimate_row_bytes(df)
    rows_cap = max(1, int(target_mb * 1024 * 1024 / row_bytes) * 2)
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", rows_cap)
        .partitionBy(*partition_cols)
        .parquet(path)
    )

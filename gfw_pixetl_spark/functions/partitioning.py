"""Parallelism guards for compute-dense map stages.

Spark sizes scan partitions by BYTES (spark.sql.files.maxPartitionBytes),
which is the right call for IO-bound scans but undersizes CPU-bound ones:
a 1 MB parquet file of embeddings costs milliseconds to read and seconds
to push through an interpreted higher-order-function cosine, yet arrives
as a single partition and pins one core. The same plan over warehouse-
scale inputs (thousands of splits) parallelizes fine — the pathology is
specifically small-input / expensive-row stages.

``ensure_min_partitions`` round-robin repartitions ONLY when the plan's
current parallelism is below the session's shuffle width, so sprinkling
it on compute-bound operators is free at scale (no-op) and removes the
single-core cliff on small inputs. The added exchange is a round-robin
of the raw rows — for the operators that use this (cosine re-rank,
centroid scoring, signature folds) that is orders of magnitude cheaper
than the compute it unlocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def shuffle_width(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))


def ensure_min_partitions(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition iff current parallelism < ``min_parts`` (default: the
    session shuffle width). Explicit numPartitions pins the count so AQE
    does not re-coalesce the exchange back to one partition."""
    target = min_parts or shuffle_width(df)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)

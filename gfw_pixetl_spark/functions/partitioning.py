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


def morton_key(x, y, bits: int = 16):
    """Z-order (Morton) key: bit-interleave of two grid indices, as a
    pure column expression (unrolled shifts — whole-stage codegen, and
    the identical arithmetic replays in any SQL engine).

    Sorting or range-bucketing tiles by this key is the data-layout
    lever for spatial stores at scale: neighbors in 2-D land in the
    same file/byte-range, so a bbox query touches O(result) objects
    instead of striding the whole store. (The same trick parquet
    min/max skipping and Delta/Iceberg Z-ORDER clustering rely on.)
    """
    from pyspark.sql import functions as F

    k = F.lit(0).cast("bigint")
    for b in range(bits):
        k = (
            k
            + F.shiftright(x, b).bitwiseAND(1).cast("bigint")
            * (2 ** (2 * b))
            + F.shiftright(y, b).bitwiseAND(1).cast("bigint")
            * (2 ** (2 * b + 1))
        )
    return k


def morton_key_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`morton_key` (same unrolled arithmetic)."""
    terms = []
    for b in range(bits):
        terms.append(
            f"((({x_expr}) >> {b}) & 1) * {2 ** (2 * b)}"
            f" + ((({y_expr}) >> {b}) & 1) * {2 ** (2 * b + 1)}"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"

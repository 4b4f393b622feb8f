"""Resampling aggregations (SURVEY §2.3 C4 / §2.5 A3).

The reference resamples via rasterio kernels
(``gfw_pixetl/resampling.py:9-25``). On an aligned grid, downsampling is a
pure ``groupBy(target_pixel).agg(...)`` — a map-side-combinable hash
aggregation that scales linearly and shuffles only the (small) aggregated
state. Each method below maps one rasterio kernel to a built-in Spark
aggregate so the hot path stays inside whole-stage codegen (no Python).

``mode`` is implemented deterministically (smallest value among the most
frequent) because tie-breaking must not depend on partitioning.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Aggregating kernels (downsample path). Interpolating kernels (bilinear,
# cubic, lanczos, ...) are not expressible as per-group aggregates and stay
# in the pandas-UDF warp kernel (gfw_pixetl_spark.plans.pipe).
AGG_METHODS: dict[str, Callable[[str], Column]] = {
    "average": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "sum": lambda c: F.sum(c),
    "med": lambda c: F.percentile(F.col(c), F.lit(0.5)),
    "q1": lambda c: F.percentile(F.col(c), F.lit(0.25)),
    "q3": lambda c: F.percentile(F.col(c), F.lit(0.75)),
    "rms": lambda c: F.sqrt(F.avg(F.col(c) * F.col(c))),
    "first": lambda c: F.min(c),  # deterministic stand-in for 'nearest'
}


def downsample(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    method: str,
    out_col: str = "value",
) -> DataFrame:
    """Aligned-grid downsample: one aggregate per target pixel/group."""
    if method == "mode":
        return mode_downsample(df, keys, value_col, out_col)
    agg = AGG_METHODS[method](value_col).alias(out_col)
    return df.groupBy(*keys).agg(agg)


def mode_downsample(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    out_col: str = "value",
) -> DataFrame:
    """Deterministic mode: most frequent value, ties -> smallest value.

    Two hash aggregations (both map-side combinable) instead of a window
    over raw rows, so state is bounded by distinct values per group —
    the shape that survives 100 TB.
    """
    counts = df.groupBy(*keys, value_col).agg(F.count("*").alias("_cnt"))
    w = Window.partitionBy(*keys).orderBy(
        F.col("_cnt").desc(), F.col(value_col).asc()
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*keys, F.col(value_col).alias(out_col))
    )

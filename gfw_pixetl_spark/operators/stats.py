"""Band statistics and histograms (SURVEY §2.5 A4/A5/A6).

The reference shells out to ``gdalinfo -stats -mm`` / ``-hist``
(``gfw_pixetl/utils/gdal.py:170-238``). Here they are single-pass hash
aggregations: min/max/mean/stddev are one partial-aggregable pass, and the
histogram is a ``groupBy(bucket)`` over a computed bucket column — both
map-side combinable, no Python in the loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def band_stats(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    nodata=None,
) -> DataFrame:
    """min/max/mean/std_dev per band/group, nodata-filtered (A4).

    Mirrors the stats block of the manifest metadata
    (``gfw_pixetl/models/pydantic.py:88-93``).
    """
    if nodata is not None:
        df = df.filter(F.col(value_col) != F.lit(nodata))
    aggs = [
        F.min(value_col).alias("min"),
        F.max(value_col).alias("max"),
        F.avg(value_col).alias("mean"),
        F.stddev_pop(value_col).alias("std_dev"),
        F.count(value_col).alias("count"),
    ]
    return df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)


def bucket_expr(value_col: str, lo: float, hi: float, n_buckets: int) -> Column:
    """Fixed-bound bucket index in [0, n_buckets-1]; hi is inclusive in the
    last bucket (gdalinfo -hist convention)."""
    width = (hi - lo) / n_buckets
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1)).cast("int")


def histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Bucketed histogram (A5): one shuffle of at most n_buckets rows/group."""
    b = bucket_expr(value_col, lo, hi, n_buckets)
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, b.alias("bucket"))
        .agg(F.count("*").alias("count"))
    )


def validity_counts(
    df: DataFrame, valid: Column, group_cols: Sequence[str]
) -> DataFrame:
    """Valid-vs-total tallies (A6) driving empty-block skipping (F8/F9)."""
    return df.groupBy(*group_cols).agg(
        F.sum(F.when(valid, 1).otherwise(0)).alias("valid_count"),
        F.count("*").alias("total_count"),
    )

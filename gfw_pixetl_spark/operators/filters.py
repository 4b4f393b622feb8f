"""Tile-pruning filters (SURVEY §2.2) as DataFrame operations.

The reference prunes its tile set through a chain of filters
(``gfw_pixetl/pipes/pipe.py:30-46``): subset (F2), source-intersects
(F3/F4), target-exists (F5). Relationally these are a predicate, a
semi-join, and an anti-join. All three leave Catalyst free to push the
predicate to the scan and broadcast the (small) probe side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def subset_filter(df: DataFrame, col: str, subset: Sequence) -> DataFrame:
    """F2: keep rows whose key is in the user subset
    (``gfw_pixetl/pipes/pipe.py:77-88``). isin compiles to an In predicate
    that parquet scans push down."""
    return df.filter(F.col(col).isin(list(subset)))


def semi_join(left: DataFrame, right: DataFrame, on: Column) -> DataFrame:
    """F3/F4: source-intersects as an EXISTS semi-join
    (``gfw_pixetl/pipes/raster_pipe.py:59-69``). Spark broadcasts the small
    side automatically under AQE; no data from `right` is materialized."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Column) -> DataFrame:
    """F5: target-exists incremental skip as NOT EXISTS
    (``gfw_pixetl/pipes/pipe.py:90-109``)."""
    return left.join(right, on, "left_anti")


def range_join(
    facts: DataFrame,
    buckets: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """G1-shaped broadcast theta/range join: fact value in [lo, hi).

    The reference's tile-to-file-footprint intersection
    (``gfw_pixetl/tiles/raster_src_tile.py:56-59``) is this shape — a tiny
    dimension of intervals joined by overlap. Broadcasting the bucket side
    makes it a map-only operation (no shuffle of the fact table).
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(buckets), cond, "inner")

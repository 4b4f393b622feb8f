"""Rasterize-as-aggregation (SURVEY §2.5 A1/A2, §2.6 W1).

The reference burns vector features into pixels with ``gdal_rasterize``
(``gfw_pixetl/tiles/vector_src_tile.py:158-212``); features are painted in
``ORDER BY field asc|desc`` order so the *last painted wins* per pixel.
That ordered-paint semantic is a ``max_by`` over a deterministic paint rank —
a commutative aggregate, safe under any partitioning, one shuffle on the
pixel key. Count mode (``-burn 1 -add``) is a plain ``groupBy().count()``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ordered_paint(
    df: DataFrame,
    pixel_cols: Sequence[str],
    value_col: str,
    order_cols: Sequence[Column],
    out_col: str = "value",
) -> DataFrame:
    """Last-wins paint: for each pixel keep the value of the feature that
    sorts last under ``order_cols`` (the reference's ORDER BY ... +
    sequential-burn tie-break, made partition-independent).

    Implemented as ``max_by(value, struct(order_cols))`` — a single hash
    aggregation with map-side combine, not a window over raw rows, so it
    scales to billions of (pixel, candidate) pairs.
    """
    rank = F.struct(*order_cols)
    return df.groupBy(*pixel_cols).agg(
        F.max_by(F.col(value_col), rank).alias(out_col)
    )


def paint_count(
    df: DataFrame, pixel_cols: Sequence[str], out_col: str = "value"
) -> DataFrame:
    """Count mode: pixel value = number of features covering it (A2)."""
    return df.groupBy(*pixel_cols).agg(F.count("*").alias(out_col))

"""Rasterize-as-explode harness query (SURVEY §2.9 "UDTF-like"):
geometry -> set of covered pixels, then ordered paint — the fully
relational expression of gdal_rasterize for axis-aligned features.

Pixel-center rule with unit pixels and integer rectangle bounds
degenerates to exact integer ranges, so DuckDB can replay it with
generate_series: covered cols = [x0, x1), rows = [y0, y1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rasterize import ordered_paint
from . import load, register


@register(
    "q48_rasterize_explode",
    oracle="""
    WITH feats AS (
      SELECT s_suppkey AS fid,
             CAST(s_suppkey AS DOUBLE) AS value,
             s_suppkey % 40 AS x0, s_suppkey % 40 + 1 + s_suppkey % 3 AS x1,
             s_suppkey % 30 AS y0, s_suppkey % 30 + 1 + s_suppkey % 2 AS y1
      FROM supplier
    ), xpix AS (
      SELECT value, fid, y0, y1,
             unnest(generate_series(x0, x1 - 1)) AS px
      FROM feats
    ), pixels AS (
      SELECT value, fid, px,
             unnest(generate_series(y0, y1 - 1)) AS py
      FROM xpix
    )
    SELECT px, py, value FROM (
      SELECT px, py, value,
             row_number() OVER (PARTITION BY px, py
                                ORDER BY value DESC, fid DESC) AS rn
      FROM pixels
    ) WHERE rn = 1
    """,
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    feats = s.select(
        F.col("s_suppkey").alias("fid"),
        F.col("s_suppkey").cast("double").alias("value"),
        (F.col("s_suppkey") % 40).alias("x0"),
        (F.col("s_suppkey") % 40 + 1 + F.col("s_suppkey") % 3).alias("x1"),
        (F.col("s_suppkey") % 30).alias("y0"),
        (F.col("s_suppkey") % 30 + 1 + F.col("s_suppkey") % 2).alias("y1"),
    )
    pixels = (
        feats
        .select(
            "fid", "value", "y0", "y1",
            F.explode(F.sequence(F.col("x0"), F.col("x1") - 1)).alias("px"),
        )
        .select(
            "fid", "value", "px",
            F.explode(F.sequence(F.col("y0"), F.col("y1") - 1)).alias("py"),
        )
    )
    return ordered_paint(
        pixels, ["px", "py"], "value",
        [F.col("value"), F.col("fid")], out_col="value",
    )

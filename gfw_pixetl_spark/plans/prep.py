"""Prep manifest job (SURVEY §2.1 S11): build tiles.geojson/extent.geojson
from a source-file listing, optionally merged with an existing manifest.

The reference CLI (``gfw_pixetl/pixetl_prep.py:18-100``) lists bucket
objects, fetches each GeoTIFF's bounds, and uploads the manifest;
``--merge_existing`` unions with the manifest already at the destination.
Here the listing is a DataFrame (one row per file with its footprint) and
the merge is ``unionByName`` + ``dropDuplicates`` on the file name — the
relational twin of the reference's dict-merge
(``pixetl_prep.py:39-53``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CATALOG_SCHEMA = (
    "name string, left double, bottom double, right double, top double"
)


def manifest_features_df(spark: SparkSession, manifest: dict) -> DataFrame:
    """Existing tiles.geojson -> catalog rows (S1 manifest scan).

    Footprints are polygon rings; bounds are their envelope — exact for
    the rectangular footprints the engine writes.
    """
    rows = []
    for feat in manifest.get("features", []):
        ring = feat["geometry"]["coordinates"][0]
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        rows.append((
            feat["properties"]["name"],
            float(min(xs)), float(min(ys)), float(max(xs)), float(max(ys)),
        ))
    return spark.createDataFrame(rows, CATALOG_SCHEMA)


def build_manifest(
    catalog: DataFrame,
    existing: DataFrame | None = None,
) -> dict:
    """Catalog (+ optional existing manifest catalog) -> manifest dict.

    One small aggregation for the extent; the feature list is a collect of
    file-level metadata (thousands of rows, not pixels).
    """
    merged = catalog
    if existing is not None:
        merged = catalog.unionByName(existing).dropDuplicates(["name"])
    ext = merged.agg(
        F.min("left").alias("l"), F.min("bottom").alias("b"),
        F.max("right").alias("r"), F.max("top").alias("t"),
        F.count("*").alias("n"),
    ).collect()[0]
    feats = [
        {
            "type": "Feature",
            "geometry": {
                "type": "Polygon",
                "coordinates": [[
                    [r.left, r.bottom], [r.right, r.bottom],
                    [r.right, r.top], [r.left, r.top], [r.left, r.bottom],
                ]],
            },
            "properties": {"name": r.name},
        }
        for r in merged.orderBy("name").collect()
    ]
    extent = None
    if ext.n:
        extent = {
            "type": "Feature",
            "geometry": {
                "type": "Polygon",
                "coordinates": [[
                    [ext.l, ext.b], [ext.r, ext.b], [ext.r, ext.t],
                    [ext.l, ext.t], [ext.l, ext.b],
                ]],
            },
            "properties": {},
        }
    return {
        "tiles": {"type": "FeatureCollection", "features": feats},
        "extent": extent,
    }

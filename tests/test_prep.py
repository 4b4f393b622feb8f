"""Prep manifest job (S11): catalog -> manifest, merge_existing union."""

from __future__ import annotations

from gfw_pixetl_spark.plans.prep import (
    CATALOG_SCHEMA, build_manifest, manifest_features_df,
)


def test_build_manifest_and_merge(spark):
    cat = spark.createDataFrame(
        [("a.tif", 0.0, 0.0, 10.0, 10.0), ("b.tif", 10.0, 0.0, 20.0, 10.0)],
        CATALOG_SCHEMA,
    )
    m = build_manifest(cat)
    names = [f["properties"]["name"] for f in m["tiles"]["features"]]
    assert names == ["a.tif", "b.tif"]
    assert m["extent"]["geometry"]["coordinates"][0][0] == [0.0, 0.0]
    assert m["extent"]["geometry"]["coordinates"][0][2] == [20.0, 10.0]

    # round-trip the manifest back to a catalog and merge with a new file
    # plus a duplicate of an existing one (merge dedups by name)
    existing = manifest_features_df(spark, m["tiles"])
    new = spark.createDataFrame(
        [("b.tif", 10.0, 0.0, 20.0, 10.0), ("c.tif", 20.0, 0.0, 30.0, 10.0)],
        CATALOG_SCHEMA,
    )
    merged = build_manifest(new, existing=existing)
    names = [f["properties"]["name"] for f in merged["tiles"]["features"]]
    assert names == ["a.tif", "b.tif", "c.tif"]
    assert merged["extent"]["geometry"]["coordinates"][0][2] == [30.0, 10.0]


def test_empty_catalog(spark):
    cat = spark.createDataFrame([], CATALOG_SCHEMA)
    m = build_manifest(cat)
    assert m["tiles"]["features"] == []
    assert m["extent"] is None

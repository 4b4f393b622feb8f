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


def test_prep_cli_roundtrip(tmp_path, spark):
    """The prep CLI writes tiles.geojson + extent.geojson, and
    --merge-existing unions by file name like the reference's
    --merge_existing (pixetl_prep.py:39-53)."""
    import json

    from gfw_pixetl_spark.prep_cli import main

    catalog = [
        {"name": "a.tif", "left": 0, "bottom": 0, "right": 10, "top": 10},
        {"name": "b.tif", "left": 10, "bottom": 0, "right": 20, "top": 10},
    ]
    cat_path = tmp_path / "catalog.json"
    cat_path.write_text(json.dumps(catalog))
    out1 = tmp_path / "out1"
    assert main([str(cat_path), str(out1)]) == 0
    tiles = json.loads((out1 / "tiles.geojson").read_text())
    assert len(tiles["features"]) == 2
    extent = json.loads((out1 / "extent.geojson").read_text())
    ring = extent["geometry"]["coordinates"][0]
    assert [0.0, 0.0] in [list(map(float, p)) for p in ring]
    assert [20.0, 10.0] in [list(map(float, p)) for p in ring]

    # merge: one overlapping name (deduped) + one new
    catalog2 = [
        {"name": "b.tif", "left": 10, "bottom": 0, "right": 20, "top": 10},
        {"name": "c.tif", "left": 20, "bottom": 0, "right": 30, "top": 10},
    ]
    cat2 = tmp_path / "catalog2.json"
    cat2.write_text(json.dumps(catalog2))
    out2 = tmp_path / "out2"
    assert main(
        [str(cat2), str(out2), "--merge-existing", str(out1 / "tiles.geojson")]
    ) == 0
    tiles2 = json.loads((out2 / "tiles.geojson").read_text())
    assert sorted(
        f["properties"]["name"] for f in tiles2["features"]
    ) == ["a.tif", "b.tif", "c.tif"]


def test_prep_cli_empty_catalog_fails(tmp_path):
    import json

    from gfw_pixetl_spark.prep_cli import main

    cat = tmp_path / "empty.json"
    cat.write_text(json.dumps([]))
    assert main([str(cat), str(tmp_path / "out")]) == 1

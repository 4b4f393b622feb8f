"""Prep CLI — the engine twin of the reference's second entry point,
``pixetl_prep`` (``gfw_pixetl/pixetl_prep.py:18-100``): build
tiles.geojson + extent.geojson from a source-file catalog, optionally
merged with an existing manifest.

The reference lists bucket objects and fetches GeoTIFF headers; in this
environment the listing arrives as a catalog JSON (one {name, left,
bottom, right, top} per file — the output of any lister). Cloud listing
and rasterio header fetch plug into the same catalog schema when their
libraries are present.

Usage:
    python -m gfw_pixetl_spark.prep_cli CATALOG_JSON OUT_DIR \
        [--merge-existing TILES_GEOJSON]

Writes OUT_DIR/tiles.geojson and OUT_DIR/extent.geojson; exits 1 on an
empty catalog with no existing manifest (nothing to publish).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from .plans.prep import CATALOG_SCHEMA, build_manifest, manifest_features_df
from .session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gfw_pixetl_spark.prep_cli")
    p.add_argument("catalog_json", help="JSON list of "
                   "{name,left,bottom,right,top} file entries")
    p.add_argument("out_dir")
    p.add_argument("--merge-existing", default=None,
                   help="path to an existing tiles.geojson to union "
                        "(dedup on file name, like --merge_existing)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    entries = json.loads(Path(args.catalog_json).read_text())
    spark = get_spark("pixetl-prep")
    catalog = spark.createDataFrame(
        [
            (e["name"], float(e["left"]), float(e["bottom"]),
             float(e["right"]), float(e["top"]))
            for e in entries
        ],
        CATALOG_SCHEMA,
    )
    existing = None
    if args.merge_existing:
        manifest = json.loads(Path(args.merge_existing).read_text())
        existing = manifest_features_df(spark, manifest)
    result = build_manifest(catalog, existing=existing)
    if not result["tiles"]["features"]:
        print("prep: empty catalog and no existing manifest", file=sys.stderr)
        return 1
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "tiles.geojson").write_text(json.dumps(result["tiles"], indent=2))
    if result["extent"] is not None:
        (out / "extent.geojson").write_text(
            json.dumps(result["extent"], indent=2)
        )
    print(f"prep: {len(result['tiles']['features'])} features -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""CLI front door — the engine twin of the reference's ``pixetl`` command
(``gfw_pixetl/pixetl.py:25-107``): parse the layer JSON, pick the pipe,
run it on a SparkSession, report tallies, exit with the reference's code
policy (137 / 1 / 0).

Usage:
    python -m gfw_pixetl_spark.cli -d DATASET -v VERSION \
        [--subset TILE_ID ...] [--overwrite] [--work-dir DIR] \
        [--features PARQUET] [--files JSON] LAYER_JSON

Raster layers read their source catalog from ``--files`` (a JSON list of
{uri, band, left, bottom, right, top}); the GeoTIFF reader engages when
rasterio is present, else the CLI refuses with the stub message. Vector
layers read features from ``--features`` (parquet with feature_id, value,
geom columns, geom = array<array<array<double>>> rings).

No click dependency: stdlib argparse, same surface.
"""

from __future__ import annotations

import argparse
import json
import sys

from .models import layer_from_json
from .plans.report import exit_code, status_tallies
from .session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gfw_pixetl_spark")
    p.add_argument("-d", "--dataset", required=True)
    p.add_argument("-v", "--version", required=True)
    p.add_argument("--subset", action="append", default=None)
    p.add_argument("-o", "--overwrite", action="store_true", default=False)
    p.add_argument("--work-dir", default="/tmp/gfw_pixetl_spark")
    p.add_argument("--files", default=None,
                   help="raster source catalog JSON (list of file dicts)")
    p.add_argument("--features", default=None,
                   help="vector features parquet path")
    p.add_argument("--existing", action="append", default=None,
                   help="tile ids already present at destination "
                        "(skipped unless --overwrite)")
    p.add_argument("--n-salts", type=int, default=1,
                   help="vector layers: split each window's burn across N "
                        "salt shards (skew mitigation; output identical)")
    p.add_argument("layer_json")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    layer_dict = json.loads(args.layer_json)
    layer_dict.update({"dataset": args.dataset, "version": args.version})
    layer = layer_from_json(layer_dict)

    spark = get_spark(f"pixetl-{layer.dataset}-{layer.version}")
    if layer.source_type == "raster":
        from .plans.raster_pipe import RasterPipe
        from .sources.raster import GeoTIFFReader

        files = json.loads(args.files) if args.files else []
        if not files:
            raise ValueError("raster layers need --files (source catalog)")
        pipe = RasterPipe(
            layer=layer, reader=GeoTIFFReader(), work_dir=args.work_dir
        )
        existing = None if args.overwrite else args.existing
        statuses = pipe.run(
            spark, files, subset=args.subset, existing_tile_ids=existing
        )
    else:
        from .plans.vector_pipe import VectorPipe

        if not args.features:
            raise ValueError("vector layers need --features (parquet path)")
        features = spark.read.parquet(args.features)
        pipe = VectorPipe(layer=layer, work_dir=args.work_dir,
                          n_salts=args.n_salts)
        statuses = pipe.run(spark, features, subset=args.subset)

    statuses = statuses.cache()
    tallies = status_tallies(statuses)
    for bucket, n in tallies.items():
        print(f"{n} tiles {bucket}", file=sys.stderr)
    return exit_code(statuses)


if __name__ == "__main__":
    raise SystemExit(main())

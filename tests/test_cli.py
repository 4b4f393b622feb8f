"""CLI front door: argument surface, layer validation, vector e2e run."""

from __future__ import annotations

import json

import numpy as np
import pytest

from gfw_pixetl_spark.cli import build_parser, main
from gfw_pixetl_spark.plans.vector_pipe import GEOM_TYPE
from gfw_pixetl_spark.sources.geotiff import read_tile


def test_parser_surface():
    args = build_parser().parse_args([
        "-d", "ds", "-v", "v1", "--subset", "10N_000E", "--overwrite",
        '{"source_type": "vector"}',
    ])
    assert args.dataset == "ds" and args.version == "v1"
    assert args.subset == ["10N_000E"] and args.overwrite


def test_cli_rejects_bad_layer():
    with pytest.raises(ValueError):
        main([
            "-d", "ds", "-v", "not-a-version",
            json.dumps({
                "source_type": "vector", "pixel_meaning": "x",
                "data_type": "uint8", "grid": "10/40000",
            }),
        ])


def test_cli_raster_requires_files():
    with pytest.raises(ValueError, match="--files"):
        main([
            "-d", "ds", "-v", "v1",
            json.dumps({
                "source_type": "raster", "pixel_meaning": "x",
                "data_type": "uint8", "grid": "10/40000",
                "source_uri": ["s3://b/t.tif"],
            }),
        ])


def test_cli_vector_end_to_end(spark, tmp_path):
    # NOTE: cli's get_spark reuses the session fixture's JVM (getOrCreate)
    feats = spark.createDataFrame(
        [(1, 5.0,
          [[[1.0, 1.0], [9.0, 1.0], [9.0, 9.0], [1.0, 9.0], [1.0, 1.0]]])],
        f"feature_id long, value double, geom {GEOM_TYPE}",
    )
    fpath = str(tmp_path / "feats.parquet")
    feats.write.parquet(fpath)
    # grid 1/4000 tile 09N_001E spans lon 1..2, lat 8..9 — strictly inside
    # the feature square, so the whole tile burns to 5
    code = main([
        "-d", "ds", "-v", "v1", "--subset", "09N_001E",
        "--work-dir", str(tmp_path),
        "--features", fpath,
        json.dumps({
            "source_type": "vector", "pixel_meaning": "cls",
            "data_type": "uint8", "grid": "1/4000", "no_data": 0,
        }),
    ])
    assert code == 0
    out = tmp_path / "ds/v1/raster/epsg-4326/1/4000/cls/geotiff/09N_001E.tif"
    assert out.exists()
    data, _ = read_tile(out)
    assert data.shape == (1, 4000, 4000)
    assert data.min() == 5 and data.max() == 5


def test_sql_cli_list(capsys):
    from gfw_pixetl_spark.sql_cli import main

    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "q01_pricing_summary" in out and "q194_materialized_raster" in out


def test_sql_cli_registry_query(capsys):
    from gfw_pixetl_spark.sql_cli import main
    from tests.conftest import SF_SMOKE

    assert main(["--query", "q18_sort_limit", "--sf-dir", SF_SMOKE,
                 "--format", "csv"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) > 1 and "," in out[0]


def test_sql_cli_adhoc_sql(capsys):
    from gfw_pixetl_spark.sql_cli import main
    from tests.conftest import SF_SMOKE

    assert main(["--sql",
                 "SELECT COUNT(*) AS n, COUNT(DISTINCT n_nationkey) AS d "
                 "FROM nation",
                 "--sf-dir", SF_SMOKE, "--format", "json"]) == 0
    import json

    row = json.loads(capsys.readouterr().out.strip())
    assert row["n"] == 25 and row["d"] == 25


def test_sql_cli_unknown_query():
    from gfw_pixetl_spark.sql_cli import main

    assert main(["--query", "q999_nope"]) == 2


def test_sql_cli_raster_view(capsys, tmp_path):
    import numpy as np

    from gfw_pixetl_spark.sources.geotiff import write_cog
    from gfw_pixetl_spark.sql_cli import main
    from tests.conftest import SF_SMOKE

    p = str(tmp_path / "r.tif")
    v = (np.arange(64, dtype=np.uint8).reshape(8, 8) + 1)
    write_cog(p, v[None], transform=(0.0, 1.0, 8.0, 1.0), overviews=False)
    assert main(["--sql",
                 "SELECT CAST(SUM(value) AS BIGINT) AS s, COUNT(*) AS n "
                 "FROM pixels",
                 "--sf-dir", SF_SMOKE, "--rasters", p,
                 "--format", "json"]) == 0
    import json

    row = json.loads(capsys.readouterr().out.strip())
    assert row["n"] == 64 and row["s"] == int(v.sum())

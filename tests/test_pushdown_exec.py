"""Execute the generated PostGIS pushdown SQL verbatim (S6/F4) against
DuckDB + the ST_* polyfill (sources/pg_polyfill.py), asserting parity
with the engine's local clip path — the strongest pushdown validation
available without a live database (the reference uses dockerized
PostGIS, docker-compose.test.yml:1-70)."""

from __future__ import annotations

import json

import duckdb
import numpy as np
import pytest

from gfw_pixetl_spark.functions.geometry import (
    clip_polygon_to_box,
    polygon_signed_area,
)
from gfw_pixetl_spark.grids import BoundingBox
from gfw_pixetl_spark.sources.pg_polyfill import register_postgis_polyfill
from gfw_pixetl_spark.sources.vector import (
    exists_probe_sql,
    fetch_tile_sql,
)

TILE = BoundingBox(left=0.0, bottom=0.0, right=10.0, top=10.0)

FEATURES = [
    # (gid, value, polygon ring) — crossing, inside, and outside cases
    (1, 7, [[-2.0, 2.0], [4.0, 2.0], [4.0, 6.0], [-2.0, 6.0], [-2.0, 2.0]]),
    (2, 3, [[5.0, 5.0], [8.0, 5.0], [8.0, 9.0], [5.0, 9.0], [5.0, 5.0]]),
    (3, 9, [[12.0, 12.0], [15.0, 12.0], [15.0, 15.0], [12.0, 15.0],
            [12.0, 12.0]]),
    (4, 5, [[8.0, -3.0], [14.0, -3.0], [14.0, 4.0], [8.0, 4.0],
            [8.0, -3.0]]),
]


@pytest.fixture()
def con():
    c = duckdb.connect()
    register_postgis_polyfill(c)
    c.execute("CREATE SCHEMA gfw")
    c.execute(
        "CREATE TABLE gfw.features (gid INT, value INT, geom VARCHAR)")
    for gid, val, ring in FEATURES:
        c.execute(
            "INSERT INTO gfw.features VALUES (?, ?, ?)",
            [gid, val,
             json.dumps({"type": "Polygon", "coordinates": [ring]})],
        )
    return c


def test_exists_probe_runs_verbatim(con):
    sql = exists_probe_sql("gfw", "features", TILE)
    assert con.execute(sql).fetchall() == [(1,)]
    empty_tile = BoundingBox(left=100.0, bottom=100.0, right=110.0,
                             top=110.0)
    assert con.execute(
        exists_probe_sql("gfw", "features", empty_tile)).fetchall() == []


def test_fetch_tile_sql_matches_local_clip(con):
    sql = fetch_tile_sql("gfw", "features", TILE, field="value",
                         order="desc")
    rows = con.execute(sql).fetchall()
    # features 1, 2, 4 intersect the tile; 3 is fully outside
    assert [r[0] for r in rows] == [7, 5, 3]
    for value, geom in rows:
        ring = next(r for g, v, r in FEATURES if v == value)
        expected = clip_polygon_to_box(
            [np.asarray(ring)], TILE.left, TILE.bottom, TILE.right,
            TILE.top)
        got = json.loads(geom)["coordinates"]
        exp_area = abs(polygon_signed_area(expected))
        got_area = abs(polygon_signed_area(
            [np.asarray(r) for r in got]))
        assert abs(exp_area - got_area) < 1e-9
        # clipped geometry lies inside the tile
        pts = np.vstack(got)
        assert (pts[:, 0] >= TILE.left - 1e-9).all()
        assert (pts[:, 0] <= TILE.right + 1e-9).all()


def test_calc_projection_executes(con):
    sql = fetch_tile_sql("gfw", "features", TILE, field="value",
                         calc="value * 10 + gid")
    rows = con.execute(sql).fetchall()
    got = sorted(r[0] for r in rows)
    assert got == sorted([7 * 10 + 1, 3 * 10 + 2, 5 * 10 + 4])


def test_multipart_subject_yields_multipolygon(con):
    """Review regression: two disjoint clipped parts must serialize as
    MultiPolygon (a 2-ring Polygon would read ring 2 as a hole)."""
    two_part = {
        "type": "MultiPolygon",
        "coordinates": [
            [[[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0], [1.0, 1.0]]],
            [[[6.0, 6.0], [8.0, 6.0], [8.0, 8.0], [6.0, 8.0], [6.0, 6.0]]],
        ],
    }
    con.execute("INSERT INTO gfw.features VALUES (9, 1, ?)",
                [json.dumps(two_part)])
    sql = fetch_tile_sql("gfw", "features", TILE, field="value")
    rows = [r for r in con.execute(sql).fetchall() if r[0] == 1]
    [geom] = [g for v, g in rows]
    parsed = json.loads(geom)
    assert parsed["type"] == "MultiPolygon"
    assert len(parsed["coordinates"]) == 2

"""S6 final hop: the gfw_pg_tiles Spark 4 Python DataSource scanning a
live PostgreSQL 15 server through Spark's own source API (no JDBC jar).

Covers what tests/test_pg_live.py (raw psql) cannot: partition planning
(one input partition per tile envelope), the probe-then-fetch
short-circuit for empty tiles, ORDER BY arrival order through the scan,
and value-exact clip parity via the end-to-end DataFrame.

Reference parity target: gfw_pixetl/tiles/vector_src_tile.py:87-156.
"""

from __future__ import annotations

import json

import pytest

from gfw_pixetl_spark.sources import pg_datasource, pg_server
from gfw_pixetl_spark.sources.pg_datasource import PgTilesReader


@pytest.fixture(scope="module")
def srv():
    if not pg_server.available():
        pytest.skip("postgres server binaries not available")
    s = pg_server.ensure_server()
    pg_server.run_sql(s["sock"],
                      "CREATE TABLE IF NOT EXISTS gfw.ds_feats "
                      "(gid INT, val float8, geom jsonb)")
    pg_server.run_sql(s["sock"], "TRUNCATE gfw.ds_feats")
    # two rects in [0,10)^2, one crossing into [10,20), none beyond x=20
    feats = [
        (1, 5.0, [[1.0, 1.0], [4.0, 1.0], [4.0, 3.0], [1.0, 3.0],
                  [1.0, 1.0]]),
        (2, 2.0, [[6.0, 6.0], [9.0, 6.0], [9.0, 9.0], [6.0, 9.0],
                  [6.0, 6.0]]),
        (3, 9.0, [[8.0, 2.0], [14.0, 2.0], [14.0, 5.0], [8.0, 5.0],
                  [8.0, 2.0]]),
    ]
    for gid, val, ring in feats:
        gj = json.dumps({"type": "Polygon", "coordinates": [ring]})
        pg_server.run_sql(
            s["sock"],
            f"INSERT INTO gfw.ds_feats VALUES ({gid}, {val}, "
            f"'{gj}'::jsonb)")
    return s


TILES = [
    {"tile_id": "t00", "left": 0.0, "bottom": 0.0, "right": 10.0,
     "top": 10.0},
    {"tile_id": "t01", "left": 10.0, "bottom": 0.0, "right": 20.0,
     "top": 10.0},
    {"tile_id": "t02", "left": 20.0, "bottom": 0.0, "right": 30.0,
     "top": 10.0},
]


def _options(srv, **kw):
    o = {"sock": srv["sock"], "port": srv["port"], "schema": "gfw",
         "table": "ds_feats", "field": "val", "order": "asc",
         "tiles": json.dumps(TILES)}
    o.update(kw)
    return o


def test_partition_per_tile(srv):
    reader = PgTilesReader(_options(srv))
    parts = reader.partitions()
    assert [p.tile_id for p in parts] == ["t00", "t01", "t02"]
    assert (parts[1].left, parts[1].top) == (10.0, 10.0)


def test_probe_skips_empty_tile(srv):
    reader = PgTilesReader(_options(srv))
    parts = reader.partitions()
    assert list(reader.read(parts[2])) == []  # t02: probe only, no fetch


def test_fetch_order_and_clip(srv):
    reader = PgTilesReader(_options(srv))
    parts = reader.partitions()
    rows = list(reader.read(parts[0]))
    assert [r[1] for r in rows] == [2.0, 5.0, 9.0]  # ORDER BY val asc
    # feature 3 is clipped to the t00 envelope: x capped at 10
    clip = json.loads(rows[2][2])
    xs = [p[0] for p in clip["coordinates"][0]]
    assert max(xs) == 10.0 and min(xs) == 8.0
    # t01 sees only the crossing feature, clipped from x=10
    rows01 = list(reader.read(parts[1]))
    assert [r[1] for r in rows01] == [9.0]
    xs01 = [p[0] for p in json.loads(rows01[0][2])["coordinates"][0]]
    assert min(xs01) == 10.0 and max(xs01) == 14.0


def test_calc_projection(srv):
    reader = PgTilesReader(_options(srv, calc="val * 10"))
    rows = list(reader.read(reader.partitions()[0]))
    assert [r[1] for r in rows] == [20.0, 50.0, 90.0]


def test_end_to_end_dataframe(srv, spark):
    pg_datasource.register(spark)
    df = (
        spark.read.format(pg_datasource.FORMAT_NAME)
        .options(**_options(srv))
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    got = sorted((r.tile_id, r.val) for r in df.collect())
    assert got == [("t00", 2.0), ("t00", 5.0), ("t00", 9.0),
                   ("t01", 9.0)]

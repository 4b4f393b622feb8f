"""Execute the generated PostGIS pushdown SQL VERBATIM on a live
PostgreSQL 15 server (S6/F4 live leg).

The fixture initdb's a throwaway cluster under an unprivileged uid
(postgres refuses root), listens on a unix socket only, registers the
PL/pgSQL ST_* polyfill (sources/pg_live.py — semantics replayed
operation-for-operation from functions/geometry.py), loads the same
feature set as tests/test_pushdown_exec.py, and runs the exact SQL text
from sources/vector.py through psql. Assertions mirror the DuckDB leg
and additionally demand IEEE-exact coordinate equality with the local
clip path. Skips cleanly when server binaries are unavailable.

Reference parity target: gfw_pixetl/tiles/vector_src_tile.py:87-156
(probe + fetch SQL), validated there against dockerized PostGIS
(docker-compose.test.yml:1-70).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import tempfile

import numpy as np
import pytest

from gfw_pixetl_spark.functions.geometry import clip_polygon_to_box
from gfw_pixetl_spark.grids import BoundingBox
from gfw_pixetl_spark.sources.pg_live import POLYFILL_DDL
from gfw_pixetl_spark.sources.vector import (
    exists_probe_sql,
    fetch_tile_sql,
)

TILE = BoundingBox(left=0.0, bottom=0.0, right=10.0, top=10.0)

# same cases as test_pushdown_exec: crossing, inside, outside x2
FEATURES = [
    (1, 7, [[-2.0, 2.0], [4.0, 2.0], [4.0, 6.0], [-2.0, 6.0], [-2.0, 2.0]]),
    (2, 3, [[5.0, 5.0], [8.0, 5.0], [8.0, 9.0], [5.0, 9.0], [5.0, 5.0]]),
    (3, 9, [[12.0, 12.0], [15.0, 12.0], [15.0, 15.0], [12.0, 15.0],
            [12.0, 12.0]]),
    (4, 5, [[8.0, -3.0], [14.0, -3.0], [14.0, 4.0], [8.0, 4.0],
            [8.0, -3.0]]),
]

_PORT = "54329"
_UID = "1000"


def _have_postgres() -> bool:
    return all(shutil.which(b) for b in ("initdb", "pg_ctl", "psql",
                                         "setpriv"))


def _as_unpriv(base: list[str], home: str) -> list[str]:
    if os.geteuid() != 0:
        return base
    return ["setpriv", f"--reuid={_UID}", f"--regid={_UID}",
            "--clear-groups", "env", f"HOME={home}"] + base


@pytest.fixture(scope="module")
def pg():
    if not _have_postgres():
        pytest.skip("postgres server binaries not available")
    # not tmp_path_factory: pytest's root-owned 0700 parents are not
    # traversable by the unprivileged uid the server must run as
    d = tempfile.mkdtemp(prefix="gfw_pglive_", dir="/tmp")
    data, sock = os.path.join(d, "data"), os.path.join(d, "sock")
    os.makedirs(data)
    os.makedirs(sock)
    if os.geteuid() == 0:
        subprocess.run(["chown", "-R", f"{_UID}:{_UID}", d], check=True)
    subprocess.run(
        _as_unpriv(["initdb", "-D", data, "-U", "gfw", "--no-sync",
                    "-A", "trust"], d),
        check=True, capture_output=True)
    subprocess.run(
        _as_unpriv(["pg_ctl", "-D", data, "-l", os.path.join(d, "log"),
                    "-o", f"-k {sock} -p {_PORT} -c listen_addresses=''",
                    "-w", "start"], d),
        check=True, capture_output=True)
    try:
        run_sql = _make_runner(sock)
        run_sql(POLYFILL_DDL)
        run_sql("CREATE SCHEMA gfw")
        run_sql("CREATE TABLE gfw.features "
                "(gid INT, value INT, geom jsonb)")
        for gid, val, ring in FEATURES:
            gj = json.dumps({"type": "Polygon", "coordinates": [ring]})
            run_sql(f"INSERT INTO gfw.features VALUES ({gid}, {val}, "
                    f"'{gj}'::jsonb)")
        yield run_sql
    finally:
        subprocess.run(
            _as_unpriv(["pg_ctl", "-D", data, "-m", "immediate",
                        "stop"], d),
            capture_output=True)
        shutil.rmtree(d, ignore_errors=True)


def _make_runner(sock: str):
    def run_sql(sql: str) -> list[list[str]]:
        """Run SQL through psql; rows come back as 0x1f-separated
        fields (never appears in the data)."""
        out = subprocess.run(
            ["psql", "-h", sock, "-p", _PORT, "-U", "gfw",
             "-d", "postgres", "-v", "ON_ERROR_STOP=1",
             "-X", "-qAt", "-F", "\x1f", "-c", sql],
            check=True, capture_output=True, text=True)
        return [line.split("\x1f")
                for line in out.stdout.splitlines() if line]

    return run_sql


def _local_clip(ring):
    return clip_polygon_to_box(
        [np.asarray(ring, dtype="float64")],
        TILE.left, TILE.bottom, TILE.right, TILE.top)


def test_exists_probe_runs_verbatim_on_postgres(pg):
    assert pg(exists_probe_sql("gfw", "features", TILE)) == [["1"]]
    empty = BoundingBox(left=100.0, bottom=100.0, right=110.0, top=110.0)
    assert pg(exists_probe_sql("gfw", "features", empty)) == []


def test_fetch_tile_sql_matches_local_clip_exactly(pg):
    """The fetch SQL (projection + clip + spatial WHERE + ORDER BY)
    executes verbatim; every returned geometry is IEEE-identical to the
    engine's local Sutherland-Hodgman clip."""
    rows = pg(fetch_tile_sql("gfw", "features", TILE, "value",
                             order="asc"))
    # features 1, 2 and 4 intersect the tile (3 is fully outside);
    # ordered by value per the paint-order clause
    assert [int(r[0]) for r in rows] == [3, 5, 7]
    by_value = {v: ring for _, v, ring in FEATURES}
    for val_s, geom_s in rows:
        got = json.loads(geom_s)
        expect = _local_clip(by_value[int(val_s)])
        assert got["type"] == "Polygon"
        assert len(got["coordinates"]) == len(expect) == 1
        np.testing.assert_array_equal(
            np.asarray(got["coordinates"][0], dtype="float64"),
            expect[0])


def test_fetch_order_desc_and_calc_projection(pg):
    rows = pg(fetch_tile_sql("gfw", "features", TILE, "value",
                             calc="value * 10", order="desc"))
    assert [int(r[0]) for r in rows] == [70, 50, 30]


def test_crossing_feature_is_clipped_not_dropped(pg):
    """Feature 1 crosses the tile edge: the returned polygon must be
    the clipped 0..4 x 2..6 rectangle, area 16 not 24."""
    rows = pg(fetch_tile_sql("gfw", "features", TILE, "value"))
    geoms = {int(v): json.loads(g) for v, g in rows}
    ring = np.asarray(geoms[7]["coordinates"][0], dtype="float64")
    xs, ys = ring[:, 0], ring[:, 1]
    area = 0.5 * abs(float(np.sum(
        xs * np.roll(ys, -1) - np.roll(xs, -1) * ys)))
    assert area == 16.0
    assert xs.min() == 0.0  # clipped at the tile boundary


def test_geometrycollection_fallout_branch_parses(pg):
    """The CASE/ST_CollectionExtract fallout inside the projection is
    exercised (and the helper really reports types)."""
    assert pg("SELECT st_geometrytype('{\"type\": \"Polygon\", "
              "\"coordinates\": []}'::jsonb)") == [["ST_Polygon"]]

"""Spark 4 Python DataSource for the S6 vector scan — the last hop of
the reference's PostGIS tile fetch, executed through Spark's own source
API without a JDBC jar.

Reference behavior matched (``gfw_pixetl/tiles/vector_src_tile.py``):

* one *input partition per tile envelope* (the reference fans tile
  fetches across Dask workers; here each Spark task owns one tile),
* per-tile existence probe first (``vector_src_tile.py:87-114`` —
  ``SELECT 1 ... LIMIT 1``), skipping the fetch for empty tiles,
* the pushdown fetch SQL from ``sources/vector.py`` VERBATIM: calc
  projection, envelope clip with the CollectionExtract fallout, ORDER BY
  paint order — all evaluated inside PostgreSQL, Spark sees only the
  projected rows (``vector_src_tile.py:122-156``).

Connection contract: executors reach PostgreSQL through psql. Locally
(this container, tests, the harness query) that is a unix socket booted
by ``pg_server.ensure_server()``; on a real cluster the ``host``/
``port`` options point at the PostGIS service instead — the read path is
identical. Rows travel as (tile_id, field value, GeoJSON text), the same
wire shape the JDBC reader would ingest.

Scale notes: partitions = tiles, so parallelism tracks the tile grid
(thousands of tiles -> thousands of independent range-restricted PG
scans, the reference's own fan-out). No driver-side data path: the
driver only plans envelopes; feature rows never pass through it.
"""

from __future__ import annotations

import json
import subprocess
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..grids import BoundingBox
from .vector import exists_probe_sql, fetch_tile_sql

FORMAT_NAME = "gfw_pg_tiles"
SCHEMA = "tile_id STRING, val DOUBLE, geom STRING"


@dataclass
class TilePartition(InputPartition):
    tile_id: str
    left: float
    bottom: float
    right: float
    top: float


def _psql(options: dict, sql: str) -> list[list[str]]:
    host = options.get("host") or options["sock"]
    port = options.get("port", "54331")
    args = ["psql", "-h", host, "-p", str(port),
            "-U", options.get("user", "gfw"),
            "-d", options.get("dbname", "postgres"),
            "-v", "ON_ERROR_STOP=1", "-X", "-qAt", "-F", "\x1f",
            "-c", sql]
    out = subprocess.run(args, check=True, capture_output=True, text=True)
    return [ln.split("\x1f") for ln in out.stdout.splitlines() if ln]


class PgTilesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.tiles = json.loads(options["tiles"])

    def partitions(self):
        return [
            TilePartition(t["tile_id"], float(t["left"]), float(t["bottom"]),
                          float(t["right"]), float(t["top"]))
            for t in self.tiles
        ]

    def read(self, part: TilePartition):
        o = self.options
        bounds = BoundingBox(left=part.left, bottom=part.bottom,
                             right=part.right, top=part.top)
        schema, table = o["schema"], o["table"]
        # probe-then-fetch, the reference's flow: empty tiles cost one
        # LIMIT-1 index-able probe, not a full scan + empty transfer
        if not _psql(o, exists_probe_sql(schema, table, bounds)):
            return
        sql = fetch_tile_sql(
            schema, table, bounds, o["field"],
            calc=o.get("calc") or None, order=o.get("order") or None,
        )
        for row in _psql(o, sql):
            yield (part.tile_id, float(row[0]), row[1])


class PgTilesDataSource(DataSource):
    """``spark.read.format("gfw_pg_tiles")`` — options: sock|host, port,
    user, dbname, schema, table, field, calc?, order?, tiles (JSON list
    of {tile_id, left, bottom, right, top})."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> PgTilesReader:
        return PgTilesReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(PgTilesDataSource)

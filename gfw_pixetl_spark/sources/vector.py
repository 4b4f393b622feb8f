"""PostGIS vector source: pushdown SQL generation + JDBC scan (S6/F4).

Spark's JDBC source pushes comparison predicates but NOT spatial
functions, so — exactly like the reference
(``gfw_pixetl/tiles/vector_src_tile.py:122-156``) — we generate the
PostGIS SQL ourselves and hand it to the JDBC reader as a subquery
(``dbtable=(...) t``). The three generated shapes mirror the reference:

* existence probe (F4): ``SELECT 1 ... WHERE ST_Intersects(...) LIMIT 1``
  (``vector_src_tile.py:87-114``)
* per-tile fetch: ``SELECT {calc} AS {field}, <clip> AS geom ...
  ORDER BY {field} asc|desc`` (``vector_src_tile.py:122-156``)
* GeometryCollection cleanup: ``st_collectionextract(..., 3)`` keeps
  polygons only (``vector_src_tile.py:57-64``)

Validation layers: SQL generation is unit-tested; the generated text
executes VERBATIM against DuckDB + an ST_* polyfill
(``pg_polyfill.py``, ``tests/test_pushdown_exec.py``) AND against a
live PostgreSQL 15 server with PL/pgSQL ST_* functions
(``pg_live.py``, ``tests/test_pg_live.py`` — real grammar, quoting,
type mapping, IEEE-exact clip parity). Only the JDBC driver itself is
environment-gated (no driver jar in this container); the JDBC execution
path is exercised when a jdbc_url is supplied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..grids import BoundingBox

GEOMETRY_COLUMN = "geom"


def envelope_sql(bounds: BoundingBox, srid: int = 4326) -> str:
    return (
        f"ST_MakeEnvelope({bounds.left}, {bounds.bottom}, "
        f"{bounds.right}, {bounds.top}, {srid})"
    )


def intersect_filter_sql(bounds: BoundingBox) -> str:
    """F4 spatial predicate, pushed verbatim into PostGIS."""
    return f"ST_Intersects({GEOMETRY_COLUMN}, {envelope_sql(bounds)})"


def intersection_geom_sql(bounds: BoundingBox) -> str:
    """Clip to the tile envelope; GeometryCollection fallout reduced to
    polygons (st_collectionextract type 3)."""
    inter = f"ST_Intersection({GEOMETRY_COLUMN}, {envelope_sql(bounds)})"
    return (
        f"CASE WHEN ST_GeometryType({inter}) = 'ST_GeometryCollection' "
        f"THEN ST_CollectionExtract({inter}, 3) ELSE {inter} END"
    )


def exists_probe_sql(schema: str, table: str, bounds: BoundingBox) -> str:
    """Tile-has-features probe; LIMIT 1 makes PostGIS stop at first hit."""
    return (
        f"SELECT 1 FROM {schema}.{table} "
        f"WHERE {intersect_filter_sql(bounds)} LIMIT 1"
    )


def fetch_tile_sql(
    schema: str,
    table: str,
    bounds: BoundingBox,
    field: str,
    calc: str | None = None,
    order: str | None = None,
) -> str:
    """Per-tile feature fetch with the calc projection and paint order.

    ``calc`` is arbitrary PostGIS SQL computing the burn value (C2);
    defaults to the raw field. ORDER BY drives last-wins rasterization.
    """
    value_expr = calc or field
    order_clause = ""
    if order in ("asc", "desc"):
        order_clause = f" ORDER BY {field} {order}"
    return (
        f"SELECT {value_expr} AS {field}, "
        f"{intersection_geom_sql(bounds)} AS {GEOMETRY_COLUMN} "
        f"FROM {schema}.{table} "
        f"WHERE {intersect_filter_sql(bounds)}{order_clause}"
    )


def read_tile_features(
    spark: SparkSession,
    jdbc_url: str,
    schema: str,
    table: str,
    bounds: BoundingBox,
    field: str,
    calc: str | None = None,
    order: str | None = None,
    properties: dict | None = None,
) -> DataFrame:
    """JDBC scan of one tile's features with full pushdown: the generated
    SQL runs inside PostGIS; Spark sees only the projected rows."""
    sql = fetch_tile_sql(schema, table, bounds, field, calc, order)
    reader = (
        spark.read.format("jdbc")
        .option("url", jdbc_url)
        .option("dbtable", f"({sql}) AS t")
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()

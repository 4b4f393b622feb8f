"""Execute the generated PostGIS pushdown SQL (sources/vector.py) for
real — against DuckDB with the ST_* functions polyfilled as Python UDFs
backed by the engine's own geometry kernels.

The reference validates its vector SQL against a dockerized PostGIS
(``docker-compose.test.yml:1-70``); no database server exists in this
container. What CAN be validated without one: that the SQL text the
engine pushes down — envelope construction, intersects filter, clip
projection, collection fallout, ORDER BY paint order, LIMIT probe —
executes VERBATIM on a SQL engine and produces exactly what the local
clip path computes. DuckDB runs the query; the five ST_* functions it
needs are registered as scalar UDFs whose semantics come from
``functions/geometry.py`` (Sutherland–Hodgman box clip, shoelace area).
Geometries travel as GeoJSON text, the same wire shape the JDBC reader
ingests (``vector_pipe.py`` parses GeoJSON features).

This is NOT a live-PostGIS integration test — it is the strongest
executable check available here: the generated SQL is not just string-
asserted but actually planned, filtered, and projected by a SQL engine.
"""

from __future__ import annotations

import json

import numpy as np

from ..functions.geometry import (
    clip_polygon_to_box,
    polygon_signed_area,
)


def _parse(geojson: str) -> list[np.ndarray]:
    g = json.loads(geojson)
    if g["type"] == "Polygon":
        return [np.asarray(r, dtype="float64") for r in g["coordinates"]]
    if g["type"] == "MultiPolygon":
        return [
            np.asarray(r, dtype="float64")
            for poly in g["coordinates"] for r in poly
        ]
    raise ValueError(f"unsupported geometry type {g['type']}")


def _dump(rings: list[np.ndarray]) -> str:
    """Serialize clipped rings. Box-clipping each input ring yields
    independent OUTER rings, so two-plus rings must be a MultiPolygon —
    a single Polygon would make RFC 7946 consumers read ring 2+ as
    holes of ring 1."""
    if not rings:
        return json.dumps({"type": "Polygon", "coordinates": []})
    if len(rings) == 1:
        return json.dumps({
            "type": "Polygon",
            "coordinates": [np.asarray(rings[0]).tolist()],
        })
    return json.dumps({
        "type": "MultiPolygon",
        "coordinates": [[np.asarray(r).tolist()] for r in rings],
    })


def _envelope_box(geojson: str) -> tuple[float, float, float, float]:
    rings = _parse(geojson)
    pts = np.vstack(rings)
    return (float(pts[:, 0].min()), float(pts[:, 1].min()),
            float(pts[:, 0].max()), float(pts[:, 1].max()))


def register_postgis_polyfill(con) -> None:
    """Register ST_MakeEnvelope / ST_Intersects / ST_Intersection /
    ST_GeometryType / ST_CollectionExtract on a DuckDB connection, with
    semantics from the engine's geometry kernels."""
    from duckdb.typing import BOOLEAN, DOUBLE, INTEGER, VARCHAR

    def st_makeenvelope(left, bottom, right, top, srid):
        ring = [[left, bottom], [right, bottom], [right, top],
                [left, top], [left, bottom]]
        return json.dumps({"type": "Polygon", "coordinates": [ring]})

    def st_intersects(a: str, b: str) -> bool:
        # b is an envelope in every query the engine generates; clip a
        # to it and test for remaining area (PostGIS counts boundary
        # touches too — the engine's tile grids never share boundaries
        # with features at exact float equality, matching F4's use).
        # Per-ring |area| sum, not |sum|: opposite-winding disjoint
        # outer rings must not cancel to a false negative.
        l, bo, r, t = _envelope_box(b)
        clipped = clip_polygon_to_box(_parse(a), l, bo, r, t)
        from ..functions.geometry import ring_signed_area

        return any(abs(ring_signed_area(rg)) > 0.0 for rg in clipped)

    def st_intersection(a: str, b: str) -> str:
        l, bo, r, t = _envelope_box(b)
        return _dump(clip_polygon_to_box(_parse(a), l, bo, r, t))

    def st_geometrytype(g: str) -> str:
        return "ST_" + json.loads(g)["type"]

    def st_collectionextract(g: str, gtype: int) -> str:
        return g  # box clips never produce GeometryCollections

    con.create_function(
        "ST_MakeEnvelope", st_makeenvelope,
        [DOUBLE, DOUBLE, DOUBLE, DOUBLE, INTEGER], VARCHAR)
    con.create_function(
        "ST_Intersects", st_intersects, [VARCHAR, VARCHAR], BOOLEAN)
    con.create_function(
        "ST_Intersection", st_intersection, [VARCHAR, VARCHAR], VARCHAR)
    con.create_function(
        "ST_GeometryType", st_geometrytype, [VARCHAR], VARCHAR)
    con.create_function(
        "ST_CollectionExtract", st_collectionextract,
        [VARCHAR, INTEGER], VARCHAR)

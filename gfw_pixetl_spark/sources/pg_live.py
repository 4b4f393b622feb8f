"""Live-PostgreSQL leg of the vector pushdown validation (S6/F4).

The reference validates its vector SQL against dockerized PostGIS
(``docker-compose.test.yml:1-70``). This container ships a real
PostgreSQL 15 server (no PostGIS extension, no JDBC driver), so the
strongest live check available is: start a throwaway cluster, register
the five ST_* functions the generated SQL uses as PL/pgSQL functions
whose geometry semantics mirror the engine's own kernels
(``functions/geometry.py`` Sutherland–Hodgman box clip, shoelace area),
and execute the EXACT SQL text from ``sources/vector.py`` through psql.

That proves the pushdown SQL on genuine PostgreSQL grammar — envelope
construction, spatial WHERE, clip projection with the CASE /
CollectionExtract fallout, ORDER BY paint order, LIMIT probe,
identifier quoting, float literal round-trips — one dialect up from the
DuckDB polyfill (``pg_polyfill.py``). Geometries travel as jsonb
GeoJSON, the same wire shape the JDBC reader ingests. Only the JDBC
driver itself (absent here) remains untested.

The PL/pgSQL clip replays ``clip_ring_to_box`` operation-for-operation
(same 4-edge order, same ``p + t*(q - p)`` interpolation in float8), so
results are IEEE-identical to the local path, not merely close.

Server management (initdb/pg_ctl under an unprivileged uid, unix socket
only) lives in ``tests/test_pg_live.py``; this module is just the DDL.
"""

from __future__ import annotations

# One PL/pgSQL Sutherland–Hodgman ring clip + the five ST_* entry points
# the generated SQL references (vector.py:31-84). Geometry = jsonb
# GeoJSON. Ring convention matches functions/geometry.py: open rings,
# closed input accepted (closing point dropped), <3-point results
# discarded, 1 ring -> Polygon, 2+ -> MultiPolygon (pg_polyfill._dump).
POLYFILL_DDL = r"""
CREATE OR REPLACE FUNCTION _gfw_clip_ring(
    ring jsonb, lft float8, bot float8, rgt float8, tp float8)
RETURNS jsonb LANGUAGE plpgsql IMMUTABLE AS $fn$
DECLARE
  xs float8[] := '{}'; ys float8[] := '{}';
  nxs float8[]; nys float8[];
  n int; i int; pass int;
  use_x boolean; bound float8; keep_le boolean;
  px float8; py float8; cx float8; cy float8;
  pc float8; cc float8;
  pin boolean; cin boolean; t float8;
  coords jsonb := '[]'::jsonb;
BEGIN
  FOR i IN 0 .. jsonb_array_length(ring) - 1 LOOP
    xs := xs || (ring->i->>0)::float8;
    ys := ys || (ring->i->>1)::float8;
  END LOOP;
  n := coalesce(array_length(xs, 1), 0);
  IF n > 1 AND xs[1] = xs[n] AND ys[1] = ys[n] THEN
    xs := xs[1:n-1]; ys := ys[1:n-1]; n := n - 1;
  END IF;
  -- edge order matches clip_ring_to_box: left, right, bottom, top
  FOR pass IN 1..4 LOOP
    EXIT WHEN n = 0;
    CASE pass
      WHEN 1 THEN use_x := true;  bound := lft; keep_le := false;
      WHEN 2 THEN use_x := true;  bound := rgt; keep_le := true;
      WHEN 3 THEN use_x := false; bound := bot; keep_le := false;
      WHEN 4 THEN use_x := false; bound := tp;  keep_le := true;
    END CASE;
    nxs := '{}'; nys := '{}';
    px := xs[n]; py := ys[n];
    pc := CASE WHEN use_x THEN px ELSE py END;
    pin := CASE WHEN keep_le THEN pc <= bound ELSE pc >= bound END;
    FOR i IN 1..n LOOP
      cx := xs[i]; cy := ys[i];
      cc := CASE WHEN use_x THEN cx ELSE cy END;
      cin := CASE WHEN keep_le THEN cc <= bound ELSE cc >= bound END;
      IF cin THEN
        IF NOT pin THEN
          t := (bound - pc) / (cc - pc);
          nxs := nxs || (px + t * (cx - px));
          nys := nys || (py + t * (cy - py));
        END IF;
        nxs := nxs || cx; nys := nys || cy;
      ELSIF pin THEN
        t := (bound - pc) / (cc - pc);
        nxs := nxs || (px + t * (cx - px));
        nys := nys || (py + t * (cy - py));
      END IF;
      px := cx; py := cy; pc := cc; pin := cin;
    END LOOP;
    xs := nxs; ys := nys;
    n := coalesce(array_length(xs, 1), 0);
  END LOOP;
  IF n < 3 THEN RETURN '[]'::jsonb; END IF;
  FOR i IN 1..n LOOP
    coords := coords
      || jsonb_build_array(jsonb_build_array(xs[i], ys[i]));
  END LOOP;
  RETURN coords;
END $fn$;

CREATE OR REPLACE FUNCTION _gfw_rings(g jsonb)
RETURNS SETOF jsonb LANGUAGE sql IMMUTABLE AS $fn$
  SELECT jsonb_array_elements(g->'coordinates')
  WHERE g->>'type' = 'Polygon'
  UNION ALL
  SELECT jsonb_array_elements(poly)
  FROM jsonb_array_elements(g->'coordinates') AS poly
  WHERE g->>'type' = 'MultiPolygon'
$fn$;

CREATE OR REPLACE FUNCTION _gfw_bbox(g jsonb)
RETURNS float8[] LANGUAGE sql IMMUTABLE AS $fn$
  SELECT array[min((pt->>0)::float8), min((pt->>1)::float8),
               max((pt->>0)::float8), max((pt->>1)::float8)]
  FROM _gfw_rings(g) AS r, jsonb_array_elements(r) AS pt
$fn$;

CREATE OR REPLACE FUNCTION _gfw_ring_area(ring jsonb)
RETURNS float8 LANGUAGE sql IMMUTABLE AS $fn$
  -- shoelace over the open ring (wraps via modulo), 0 for < 3 points
  SELECT CASE WHEN jsonb_array_length(ring) < 3 THEN 0.0
         ELSE 0.5 * sum(
           (ring->i->>0)::float8
             * (ring->((i + 1) % jsonb_array_length(ring))->>1)::float8
           - (ring->((i + 1) % jsonb_array_length(ring))->>0)::float8
             * (ring->i->>1)::float8)
         END
  FROM generate_series(0, greatest(jsonb_array_length(ring) - 1, 0)) AS i
$fn$;

CREATE OR REPLACE FUNCTION st_makeenvelope(
    l float8, b float8, r float8, t float8, srid int)
RETURNS jsonb LANGUAGE sql IMMUTABLE AS $fn$
  SELECT jsonb_build_object('type', 'Polygon', 'coordinates',
    jsonb_build_array(jsonb_build_array(
      jsonb_build_array(l, b), jsonb_build_array(r, b),
      jsonb_build_array(r, t), jsonb_build_array(l, t),
      jsonb_build_array(l, b))))
$fn$;

CREATE OR REPLACE FUNCTION st_intersection(a jsonb, env jsonb)
RETURNS jsonb LANGUAGE plpgsql IMMUTABLE AS $fn$
DECLARE
  bb float8[];
  kept jsonb[] := '{}';
  r jsonb; c jsonb;
BEGIN
  bb := _gfw_bbox(env);
  FOR r IN SELECT * FROM _gfw_rings(a) LOOP
    c := _gfw_clip_ring(r, bb[1], bb[2], bb[3], bb[4]);
    IF jsonb_array_length(c) >= 3 THEN kept := kept || c; END IF;
  END LOOP;
  IF coalesce(array_length(kept, 1), 0) = 0 THEN
    RETURN jsonb_build_object('type', 'Polygon',
                              'coordinates', '[]'::jsonb);
  ELSIF array_length(kept, 1) = 1 THEN
    RETURN jsonb_build_object('type', 'Polygon', 'coordinates',
                              jsonb_build_array(kept[1]));
  ELSE
    RETURN jsonb_build_object('type', 'MultiPolygon', 'coordinates',
      (SELECT jsonb_agg(jsonb_build_array(k)) FROM unnest(kept) AS k));
  END IF;
END $fn$;

CREATE OR REPLACE FUNCTION st_intersects(a jsonb, env jsonb)
RETURNS boolean LANGUAGE sql IMMUTABLE AS $fn$
  -- per-ring |area| sum of the clip result (pg_polyfill semantics):
  -- any surviving ring with positive area means intersection
  SELECT coalesce(bool_or(abs(_gfw_ring_area(r)) > 0.0), false)
  FROM _gfw_rings(st_intersection(a, env)) AS r
$fn$;

CREATE OR REPLACE FUNCTION st_geometrytype(g jsonb)
RETURNS text LANGUAGE sql IMMUTABLE AS $fn$
  SELECT 'ST_' || (g->>'type')
$fn$;

CREATE OR REPLACE FUNCTION st_collectionextract(g jsonb, gtype int)
RETURNS jsonb LANGUAGE sql IMMUTABLE AS $fn$
  SELECT g  -- box clips never produce GeometryCollections
$fn$;
"""

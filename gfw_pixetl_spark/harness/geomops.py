"""Exact-geometry harness queries (G2/G3/G4 beyond bboxes).

The general operators (Sutherland–Hodgman clip, shoelace area,
rectilinear union) are exercised on polygon inputs *derived
deterministically from the TPC-H tables*, chosen so the DuckDB oracle
has a closed form: triangles (shoelace has a 3-point closed form),
rectangles (box∩box area is interval math). The Spark side always runs
the GENERAL operator — the oracle only gets to be closed-form because
of the input shape, so value-parity checks the general kernel.
Non-convex/holed inputs are covered by unit tests
(``tests/test_geometry.py``) since no SQL closed form exists for them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geometry as G
from ..functions.hashing import md5_int64_sql
from . import load, register


def _triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic triangle per order: integer coords from modular
    arithmetic on the key (exact in double)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey")
    k = F.col("o_orderkey")
    d = lambda e: e.cast("double")  # noqa: E731
    return o.select(
        "o_orderkey",
        F.array(F.array(
            F.array(d(k % 97), d(k % 89)),
            F.array(d(k % 97 + 1 + k % 7), d(k % 89 + k % 5)),
            F.array(d(k % 97 + k % 11), d(k % 89 + 2 + k % 13)),
        )).alias("geom"),
    )


def _rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic rectangle per sampled customer (sampled so the
    oracle's O(n^2) compressed grid stays small at sf0.01)."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    k = F.col("c_custkey")
    return (
        c.filter(k % 37 == 0)
        .select(
            "c_custkey",
            (k % 100).cast("double").alias("l"),
            ((k / F.lit(7)).cast("long") % 100).cast("double").alias("b"),
            (k % 100 + 1 + k % 13).cast("double").alias("r"),
            ((k / F.lit(7)).cast("long") % 100 + 1 + k % 17)
            .cast("double").alias("t"),
        )
    )


_RECT_SQL = """
  SELECT c_custkey,
         CAST(c_custkey % 100 AS DOUBLE) AS l,
         CAST((c_custkey // 7) % 100 AS DOUBLE) AS b,
         CAST(c_custkey % 100 + 1 + c_custkey % 13 AS DOUBLE) AS r,
         CAST((c_custkey // 7) % 100 + 1 + c_custkey % 17 AS DOUBLE) AS t
  FROM customer WHERE c_custkey % 37 = 0
"""


# --------------------------------------------------------------------------
# q76 — shoelace polygon area (general JVM-side operator; triangle
# closed-form oracle)
# --------------------------------------------------------------------------
@register(
    "q76_polygon_area",
    oracle="""
    SELECT o_orderkey,
           abs( (x1*(y2-y3) + x2*(y3-y1) + x3*(y1-y2)) ) / 2.0 AS tri_area
    FROM (
      SELECT o_orderkey,
             CAST(o_orderkey % 97 AS DOUBLE) AS x1,
             CAST(o_orderkey % 89 AS DOUBLE) AS y1,
             CAST(o_orderkey % 97 + 1 + o_orderkey % 7 AS DOUBLE) AS x2,
             CAST(o_orderkey % 89 + o_orderkey % 5 AS DOUBLE) AS y2,
             CAST(o_orderkey % 97 + o_orderkey % 11 AS DOUBLE) AS x3,
             CAST(o_orderkey % 89 + 2 + o_orderkey % 13 AS DOUBLE) AS y3
      FROM orders
    )
    """,
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    tris = _triangles(spark, sf_dir)
    return tris.select(
        "o_orderkey", G.area_col(F.col("geom")).alias("tri_area")
    )


# --------------------------------------------------------------------------
# q77 — Sutherland–Hodgman clip to a box (general kernel on rectangle
# inputs; interval-math oracle). Spark runs polygon clip + shoelace —
# never the closed form.
# --------------------------------------------------------------------------
_BOX = (25.0, 25.0, 75.0, 75.0)


@register(
    "q77_clip_area",
    oracle=f"""
    SELECT c_custkey, ix * iy AS clip_area FROM (
      SELECT c_custkey,
             greatest(0, least(r, {_BOX[2]}) - greatest(l, {_BOX[0]})) AS ix,
             greatest(0, least(t, {_BOX[3]}) - greatest(b, {_BOX[1]})) AS iy
      FROM ({_RECT_SQL})
    ) WHERE ix * iy > 0
    """,
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    rects = _rects(spark, sf_dir)
    geom = F.array(F.array(
        F.array("l", "b"), F.array("r", "b"),
        F.array("r", "t"), F.array("l", "t"),
    ))
    clipped = rects.select(
        "c_custkey", G.clip_to_box_udf(*_BOX)(geom).alias("cgeom")
    )
    return (
        clipped.select(
            "c_custkey", G.area_col(F.col("cgeom")).alias("clip_area")
        )
        .filter(F.col("clip_area") > 0)
    )


# --------------------------------------------------------------------------
# q78 — rectilinear union area (G4 exact): declarative coordinate
# compression on both sides — but Spark runs the general operator while
# the oracle spells the same math inline.
# --------------------------------------------------------------------------
@register(
    "q78_rect_union_area",
    oracle=f"""
    WITH rects AS ({_RECT_SQL}),
    xs AS (
      SELECT x, lead(x) OVER (ORDER BY x) AS x2 FROM (
        SELECT DISTINCT x FROM (
          SELECT l AS x FROM rects UNION SELECT r FROM rects)
      )
    ),
    ys AS (
      SELECT y, lead(y) OVER (ORDER BY y) AS y2 FROM (
        SELECT DISTINCT y FROM (
          SELECT b AS y FROM rects UNION SELECT t FROM rects)
      )
    ),
    covered AS (
      SELECT DISTINCT x, x2, y, y2
      FROM xs, ys, rects
      WHERE x2 IS NOT NULL AND y2 IS NOT NULL
        AND x >= l AND x2 <= r AND y >= b AND y2 <= t
    )
    SELECT COALESCE(SUM((x2 - x) * (y2 - y)), 0.0) AS union_area FROM covered
    """,
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.rect_union_area(_rects(spark, sf_dir), "l", "b", "r", "t")


# --------------------------------------------------------------------------
# q83 — zonal statistics: aggregate a pixel grid per vector zone, the
# raster⋈vector op at the heart of the reference's domain, run in
# reverse (pixels→zones instead of features→pixels). Spark runs the
# GENERAL crossing-number point-in-polygon (non-convex-safe column
# math) against a broadcast zone table; the oracle gets a closed form
# only because the zones are rectangles. Pixel centers sit on
# half-integers and zone edges on integers, so no boundary ambiguity.
# --------------------------------------------------------------------------
@register(
    "q83_zonal_stats",
    oracle=f"""
    WITH px AS (
      SELECT range // 100 AS i, range % 100 AS j FROM range(10000)
    ), pix AS (
      SELECT CAST(j AS DOUBLE) + 0.5 AS x, CAST(i AS DOUBLE) + 0.5 AS y,
             (i * 31 + j * 17) % 100 AS val
      FROM px
    )
    SELECT c_custkey,
           COUNT(*) AS n_px,
           CAST(SUM(val) AS BIGINT) AS sum_val,
           MIN(val) AS min_val,
           MAX(val) AS max_val
    FROM pix JOIN ({_RECT_SQL}) z
      ON pix.x > z.l AND pix.x < z.r AND pix.y > z.b AND pix.y < z.t
    GROUP BY 1
    """,
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    px = spark.range(10000).select(
        (F.col("id") / 100).cast("long").alias("i"),
        (F.col("id") % 100).alias("j"),
    ).select(
        (F.col("j").cast("double") + 0.5).alias("x"),
        (F.col("i").cast("double") + 0.5).alias("y"),
        ((F.col("i") * 31 + F.col("j") * 17) % 100).alias("val"),
    )
    zones = _rects(spark, sf_dir).select(
        "c_custkey", "l", "b", "r", "t",
        F.array(F.array(
            F.array("l", "b"), F.array("r", "b"),
            F.array("r", "t"), F.array("l", "t"),
        )).alias("geom"),
    )
    inside = G.point_in_polygon_col(F.col("x"), F.col("y"), F.col("geom"))
    return (
        px.crossJoin(F.broadcast(zones))
        # bbox prefilter keeps the codegen'd PIP off pixels no zone can
        # claim (at scale this is the partition-pruning analog)
        .filter(
            (F.col("x") > F.col("l")) & (F.col("x") < F.col("r"))
            & (F.col("y") > F.col("b")) & (F.col("y") < F.col("t"))
        )
        .filter(inside)
        .groupBy("c_custkey")
        .agg(
            F.count("*").alias("n_px"),
            F.sum("val").alias("sum_val"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
    )


# --------------------------------------------------------------------------
# q149 — general polygon ∩ polygon clip (G3 closed): a NON-convex
# L-shaped AOI clipped by the triangulate-then-Sutherland–Hodgman kernel
# (functions/geometry.py clip_to_polygon_udf). The reference gets this
# from PostGIS ST_Intersection (tiles/vector_src_tile.py:44-63). Spark
# runs the general operator (ear-clip AOI → per-triangle convex clip →
# disjoint-piece shoelace sum); the oracle exploits the rectangle
# subjects + the AOI's disjoint two-box decomposition — closed interval
# math, while the engine path never sees a box.
# --------------------------------------------------------------------------
_AOI_L = [
    [0.0, 0.0], [60.0, 0.0], [60.0, 60.0],
    [30.0, 60.0], [30.0, 110.0], [0.0, 110.0],
]
# disjoint decomposition used ONLY by the oracle
_AOI_BOXES = ((0.0, 0.0, 60.0, 60.0), (0.0, 60.0, 30.0, 110.0))


@register(
    "q149_polygon_clip",
    oracle=f"""
    SELECT c_custkey, a1 + a2 AS clip_area FROM (
      SELECT c_custkey,
             greatest(0, least(r, {_AOI_BOXES[0][2]}) - greatest(l, {_AOI_BOXES[0][0]}))
               * greatest(0, least(t, {_AOI_BOXES[0][3]}) - greatest(b, {_AOI_BOXES[0][1]}))
               AS a1,
             greatest(0, least(r, {_AOI_BOXES[1][2]}) - greatest(l, {_AOI_BOXES[1][0]}))
               * greatest(0, least(t, {_AOI_BOXES[1][3]}) - greatest(b, {_AOI_BOXES[1][1]}))
               AS a2
      FROM ({_RECT_SQL})
    ) WHERE a1 + a2 > 0
    """,
)
def q149(spark: SparkSession, sf_dir: str) -> DataFrame:
    rects = _rects(spark, sf_dir)
    geom = F.array(F.array(
        F.array("l", "b"), F.array("r", "b"),
        F.array("r", "t"), F.array("l", "t"),
    ))
    pieces = G.clip_to_polygon_udf(_AOI_L)(geom)
    return (
        rects.select(
            "c_custkey", G.pieces_area_col(pieces).alias("clip_area")
        )
        .filter(F.col("clip_area") > 0)
    )


# --------------------------------------------------------------------------
# q294 — NEAREST-NEIGHBOR SPATIAL JOIN (grid-binned): each customer
# point finds its nearest supplier point within radius R. Engine:
# cell = coord div R, suppliers EXPLODED to their 9 neighbor cells,
# candidates meet in a plain equi-join on the cell key (the q250
# distance-transform binning — linear in points, never all-pairs),
# exact INTEGER squared distances, argmin via min_by struct with
# (d2, suppkey) total order. The oracle computes the same nearest by
# BRUTE FORCE cross join — an INDEPENDENT mechanism: the binning is
# complete for radius R (a disc of radius R from any point in a cell
# lies inside the 3x3 neighborhood), so any pruning bug shows as a
# value mismatch. Customers with no supplier within R surface with
# NULLs through the left join.
# --------------------------------------------------------------------------
_NN_R = 250
_NN_CX = "CAST((c_custkey * 13) % 1000 AS BIGINT)"
_NN_CY = "CAST((c_custkey * 29) % 1000 AS BIGINT)"
_NN_SX = "CAST((s_suppkey * 17) % 1000 AS BIGINT)"
_NN_SY = "CAST((s_suppkey * 31) % 1000 AS BIGINT)"


@register(
    "q294_nn_spatial_join",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, {_NN_CX} AS cx, {_NN_CY} AS cy FROM customer
    ), s AS (
      SELECT s_suppkey, {_NN_SX} AS sx, {_NN_SY} AS sy FROM supplier
    ), cand AS (
      SELECT c.c_custkey, s.s_suppkey,
             (c.cx - s.sx) * (c.cx - s.sx)
             + (c.cy - s.sy) * (c.cy - s.sy) AS d2
      FROM c, s
      WHERE (c.cx - s.sx) * (c.cx - s.sx)
            + (c.cy - s.sy) * (c.cy - s.sy) <= {_NN_R * _NN_R}
    ), best AS (
      SELECT c_custkey, s_suppkey, d2,
             row_number() OVER (PARTITION BY c_custkey
                                ORDER BY d2 ASC, s_suppkey ASC) AS rk
      FROM cand
    )
    SELECT c.c_custkey,
           CAST(b.s_suppkey AS BIGINT) AS nearest_suppkey,
           CAST(b.d2 AS BIGINT) AS d2
    FROM c LEFT JOIN (SELECT * FROM best WHERE rk = 1) b
      USING (c_custkey)
    ORDER BY c.c_custkey
    """,
)
def q294(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _NN_R
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 13) % 1000).cast("bigint").alias("cx"),
        ((F.col("c_custkey") * 29) % 1000).cast("bigint").alias("cy"))
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 17) % 1000).cast("bigint").alias("sx"),
        ((F.col("s_suppkey") * 31) % 1000).cast("bigint").alias("sy"))
    # suppliers fan out to the 9 neighbor cells; customers key by their
    # own cell — candidates meet in a hash join on the cell id
    off = spark.range(-1, 2).select(F.col("id").alias("dx"))
    off2 = off.crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("dy")))
    s9 = (
        supp.crossJoin(F.broadcast(off2))
        .select(
            "s_suppkey", "sx", "sy",
            (F.floor(F.col("sx") / r) + F.col("dx")).alias("gx"),
            (F.floor(F.col("sy") / r) + F.col("dy")).alias("gy"))
    )
    ckey = cust.select(
        "c_custkey", "cx", "cy",
        F.floor(F.col("cx") / r).alias("gx"),
        F.floor(F.col("cy") / r).alias("gy"))
    d2 = ((F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx"))
          + (F.col("cy") - F.col("sy")) * (F.col("cy") - F.col("sy")))
    best = (
        ckey.join(s9, ["gx", "gy"])
        .select("c_custkey", "s_suppkey", d2.alias("d2"))
        .filter(F.col("d2") <= r * r)
        .groupBy("c_custkey")
        .agg(F.min(F.struct("d2", "s_suppkey")).alias("b"))
        .select("c_custkey", F.col("b.s_suppkey").alias("nearest_suppkey"),
                F.col("b.d2").alias("d2"))
    )
    return (
        cust.select("c_custkey")
        .join(best, "c_custkey", "left")
        .select("c_custkey",
                F.col("nearest_suppkey").cast("bigint"),
                F.col("d2").cast("bigint"))
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# q331 — GRID-BASED DBSCAN (Ester et al. 1996, composed entirely from
# the repo's scale primitives): md5-scattered points, eps chosen
# density-adaptively (eps^2 = 636620 // n keeps the expected
# neighborhood ~2 points at every scale), neighbor pairs meet in the
# q294 grid-binned equi-join (cell side = floor(eps)+1 > eps, so the
# 3x3 neighborhood provably covers the disc — never points x points),
# core = count >= 4 including self, clusters = the dedup stack's
# pointer-jumping component resolver over core-core edges, border
# points attach to their MIN core neighbor's cluster, the rest is
# noise. The oracle recomputes everything BRUTE-FORCE (n^2 distance
# join + recursive min-label closure) — fully independent mechanisms;
# only the integer eps^2 threshold is shared.
# --------------------------------------------------------------------------
_DB_MINPTS = 4


@register(
    "q331_dbscan",
    oracle=f"""
    WITH RECURSIVE p AS (
      SELECT c_custkey AS id,
             {md5_int64_sql("CAST(c_custkey AS VARCHAR) || 'x'")} % 1000
               AS x,
             {md5_int64_sql("CAST(c_custkey AS VARCHAR) || 'y'")} % 1000
               AS y
      FROM customer WHERE c_custkey % 4 = 0
    ), eps AS (
      SELECT 636620 // COUNT(*) AS e2 FROM p
    ), pairs AS MATERIALIZED (
      SELECT a.id AS ia, b.id AS ib
      FROM p a, p b, eps
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= e2
    ), deg AS (
      SELECT ia AS id, COUNT(*) AS nn FROM pairs GROUP BY ia
    ), core AS (
      SELECT id FROM deg WHERE nn >= {_DB_MINPTS}
    ), ce AS MATERIALIZED (
      SELECT ia, ib FROM pairs
      JOIN core a ON pairs.ia = a.id JOIN core b ON pairs.ib = b.id
      WHERE ia <> ib
    ), reach AS (
      SELECT id, id AS r FROM core
      UNION
      SELECT w.id, e.ib FROM reach w JOIN ce e ON e.ia = w.r
    ), comp AS (
      SELECT id, MIN(r) AS cluster FROM reach GROUP BY id
    ), border AS (
      SELECT pr.ia AS id, MIN(c.cluster) AS cluster
      FROM pairs pr
      JOIN comp c ON c.id = pr.ib
      WHERE pr.ia NOT IN (SELECT id FROM core) AND pr.ia <> pr.ib
      GROUP BY pr.ia
    ), labelled AS (
      SELECT cluster, 1 AS is_core FROM comp
      UNION ALL SELECT cluster, 0 FROM border
    ), clusters AS (
      SELECT cluster, SUM(is_core) AS n_core,
             SUM(1 - is_core) AS n_border
      FROM labelled GROUP BY cluster
    ), noise AS (
      SELECT CAST(-1 AS BIGINT) AS cluster, CAST(0 AS BIGINT) AS n_core,
             COUNT(*) AS n_border
      FROM p WHERE id NOT IN (SELECT id FROM comp)
                AND id NOT IN (SELECT id FROM border)
    )
    SELECT CAST(cluster AS BIGINT) AS cluster,
           CAST(n_core AS BIGINT) AS n_core,
           CAST(n_border AS BIGINT) AS n_border
    FROM clusters
    UNION ALL SELECT cluster, n_core, n_border FROM noise
    ORDER BY cluster
    """,
)
def q331(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.dedup import connected_components
    from ..functions.hashing import md5_int64

    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 4 == 0)
    p = cust.select(
        F.col("c_custkey").alias("id"),
        (md5_int64(F.concat(F.col("c_custkey").cast("string"),
                            F.lit("x"))) % 1000).alias("x"),
        (md5_int64(F.concat(F.col("c_custkey").cast("string"),
                            F.lit("y"))) % 1000).alias("y"))
    eps = p.agg((F.lit(636620) / F.count("*")).cast("bigint").alias("e2"))
    p = p.crossJoin(F.broadcast(eps))
    # cell side strictly > eps radius => the 3x3 neighborhood covers
    # the disc (the q294 completeness argument)
    s = (F.floor(F.sqrt(F.col("e2"))) + 1).cast("bigint")
    off = spark.range(-1, 2).select(F.col("id").alias("dx")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("dy")))
    left = p.select(F.col("id").alias("ia"), F.col("x").alias("xa"),
                    F.col("y").alias("ya"), "e2",
                    F.floor(F.col("x") / s).alias("gx"),
                    F.floor(F.col("y") / s).alias("gy"))
    right = (
        p.crossJoin(F.broadcast(off))
        .select(F.col("id").alias("ib"), F.col("x").alias("xb"),
                F.col("y").alias("yb"),
                (F.floor(F.col("x") / s) + F.col("dx")).alias("gx"),
                (F.floor(F.col("y") / s) + F.col("dy")).alias("gy"))
    )
    d2 = ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
          + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
    pairs = (left.join(right, ["gx", "gy"])
             .filter(d2 <= F.col("e2"))
             .select("ia", "ib").localCheckpoint(eager=False))
    deg = pairs.groupBy(F.col("ia").alias("id")).agg(
        F.count("*").alias("nn"))
    # core is joined four times below — checkpoint so the degree
    # aggregation over the pair table runs once
    core = deg.filter(F.col("nn") >= _DB_MINPTS).select("id") \
        .localCheckpoint(eager=False)
    ce = (pairs.join(core.select(F.col("id").alias("ia")), "ia")
          .join(core.select(F.col("id").alias("ib")), "ib")
          .filter(F.col("ia") < F.col("ib")))
    comp_edges = connected_components(ce, a="ia", b="ib").select(
        F.col("doc_id").alias("id"), F.col("component").alias("cluster"))
    comp = (core.join(comp_edges, "id", "left")
            .select("id", F.coalesce("cluster", F.col("id"))
                    .alias("cluster"))
            .localCheckpoint(eager=False))  # border + union both read it
    border = (
        pairs.filter(F.col("ia") != F.col("ib"))
        .join(comp.select(F.col("id").alias("ib"),
                          F.col("cluster")), "ib")
        .join(core.select(F.col("id").alias("ia"),
                          F.lit(1).alias("_c")), "ia", "left_anti")
        .groupBy(F.col("ia").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
    ).localCheckpoint(eager=False)  # labelled + assigned both read it
    labelled = (comp.select("cluster", F.lit(1).alias("is_core"))
                .unionByName(border.select(
                    "cluster", F.lit(0).alias("is_core"))))
    clusters = labelled.groupBy("cluster").agg(
        F.sum("is_core").cast("bigint").alias("n_core"),
        F.sum(1 - F.col("is_core")).cast("bigint").alias("n_border"))
    assigned = (comp.select("id")
                .unionByName(border.select("id")))
    noise = (
        p.select("id").join(assigned, "id", "left_anti")
        .agg(F.lit(-1).cast("bigint").alias("cluster"),
             F.lit(0).cast("bigint").alias("n_core"),
             F.count("*").cast("bigint").alias("n_border"))
    )
    return (
        clusters.select(F.col("cluster").cast("bigint").alias("cluster"),
                        "n_core", "n_border")
        .unionByName(noise)
        .orderBy("cluster")
    )


# --------------------------------------------------------------------------
# q336 — POLYGON VALIDITY AUDIT (ST_IsValid-lite): synthetic 6-vertex
# rings (md5-scattered integer coordinates — random rings self-
# intersect often, which is the point) checked for PROPER self-
# intersections with EXACT INTEGER orientation tests: segments (i,j)
# non-adjacent cross iff the endpoints of each straddle the other's
# line — four cross-product signs, no division, no floats, so both
# engines agree bit-for-bit. Segments explode per polygon (bounded: 6
# per ring -> <= 9 non-adjacent pairs) and pair up in a per-polygon
# equi-join. The sf-proof shape: work is linear in polygons, quadratic
# only in the tiny fixed vertex count.
# --------------------------------------------------------------------------
_PV_N = 6  # vertices per ring


def _pv_sign(ax, ay, bx, by, cx, cy):
    """Orientation sign of (a,b,c) as +1/0/-1 — exact bigint math."""
    return F.signum(((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))
                    .cast("double")).cast("int")


@register(
    "q336_polygon_validity",
    oracle=f"""
    WITH vtx AS (
      SELECT s_suppkey AS pid, i.i AS vid,
             CAST(('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || ':'
                   || CAST(i.i AS VARCHAR) || 'x'), 1, 8)) AS BIGINT)
               % 1000 AS x,
             CAST(('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || ':'
                   || CAST(i.i AS VARCHAR) || 'y'), 1, 8)) AS BIGINT)
               % 1000 AS y
      FROM supplier, generate_series(0, {_PV_N - 1}) i(i)
    ), seg AS (
      SELECT a.pid, a.vid AS sid, a.x AS ax, a.y AS ay,
             b.x AS bx, b.y AS by
      FROM vtx a JOIN vtx b
        ON b.pid = a.pid AND b.vid = (a.vid + 1) % {_PV_N}
    ), pairs AS (
      SELECT s.pid,
             sign((s.bx - s.ax) * (t.ay - s.ay)
                  - (s.by - s.ay) * (t.ax - s.ax)) AS d1,
             sign((s.bx - s.ax) * (t.by - s.ay)
                  - (s.by - s.ay) * (t.bx - s.ax)) AS d2,
             sign((t.bx - t.ax) * (s.ay - t.ay)
                  - (t.by - t.ay) * (s.ax - t.ax)) AS d3,
             sign((t.bx - t.ax) * (s.by - t.ay)
                  - (t.by - t.ay) * (s.bx - t.ax)) AS d4
      FROM seg s JOIN seg t
        ON t.pid = s.pid AND t.sid > s.sid + 1
       AND NOT (s.sid = 0 AND t.sid = {_PV_N - 1})
    ), x AS (
      SELECT pid,
             SUM(CASE WHEN d1 * d2 < 0 AND d3 * d4 < 0
                      THEN 1 ELSE 0 END) AS n_cross
      FROM pairs GROUP BY pid
    )
    SELECT pid AS suppkey, CAST({_PV_N} AS BIGINT) AS n_vertices,
           CAST(n_cross AS BIGINT) AS n_self_intersections,
           (n_cross = 0) AS is_simple
    FROM x ORDER BY suppkey
    """,
)
def q336(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_int64

    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("pid"))
    ids = spark.range(_PV_N).select(F.col("id").cast("int").alias("vid"))

    def coord(axis: str) -> F.Column:
        return (F.conv(F.substring(F.md5(F.concat(
            F.col("pid").cast("string"), F.lit(":"),
            F.col("vid").cast("string"), F.lit(axis))), 1, 8), 16, 10)
            .cast("bigint") % 1000)

    vtx = supp.crossJoin(F.broadcast(ids)).select(
        "pid", "vid", coord("x").alias("x"), coord("y").alias("y"))
    nxt = vtx.select(F.col("pid"), ((F.col("vid") + 1) % _PV_N)
                     .alias("vid"),
                     F.col("x").alias("bx"), F.col("y").alias("by"))
    # join on the NEXT vertex id: b.vid == a.vid + 1 (mod n)
    seg = (
        vtx.alias("a")
        .join(nxt.alias("b"),
              (F.col("a.pid") == F.col("b.pid"))
              & (F.col("b.vid") == (F.col("a.vid") + 2) % _PV_N))
        .select(F.col("a.pid").alias("pid"), F.col("a.vid").alias("sid"),
                F.col("a.x").alias("ax"), F.col("a.y").alias("ay"),
                F.col("bx"), F.col("by"))
        .localCheckpoint(eager=False)  # both segment-pair sides read it
    )
    s, t = seg.alias("s"), seg.alias("t")
    pairs = s.join(
        t,
        (F.col("t.pid") == F.col("s.pid"))
        & (F.col("t.sid") > F.col("s.sid") + 1)
        & ~((F.col("s.sid") == 0) & (F.col("t.sid") == _PV_N - 1)))
    d1 = _pv_sign(F.col("s.ax"), F.col("s.ay"), F.col("s.bx"),
                  F.col("s.by"), F.col("t.ax"), F.col("t.ay"))
    d2 = _pv_sign(F.col("s.ax"), F.col("s.ay"), F.col("s.bx"),
                  F.col("s.by"), F.col("t.bx"), F.col("t.by"))
    d3 = _pv_sign(F.col("t.ax"), F.col("t.ay"), F.col("t.bx"),
                  F.col("t.by"), F.col("s.ax"), F.col("s.ay"))
    d4 = _pv_sign(F.col("t.ax"), F.col("t.ay"), F.col("t.bx"),
                  F.col("t.by"), F.col("s.bx"), F.col("s.by"))
    crossed = ((d1 * d2 < 0) & (d3 * d4 < 0)).cast("int")
    x = pairs.select(F.col("s.pid").alias("pid"),
                     crossed.alias("c")).groupBy("pid").agg(
        F.sum("c").alias("n_cross"))
    return x.select(
        F.col("pid").cast("bigint").alias("suppkey"),
        F.lit(_PV_N).cast("bigint").alias("n_vertices"),
        F.col("n_cross").cast("bigint").alias("n_self_intersections"),
        (F.col("n_cross") == 0).alias("is_simple"),
    ).orderBy("suppkey")


# --------------------------------------------------------------------------
# q433 — S6 live vector scan through a Spark 4 Python DataSource
# (pyspark.sql.datasource): one input partition per tile envelope, the
# probe-then-fetch flow and the EXACT pushdown SQL of sources/vector.py
# executed inside a real PostgreSQL 15 server (PL/pgSQL ST_* polyfill,
# sources/pg_live.py). Reference parity:
# gfw_pixetl/tiles/vector_src_tile.py:87-156. Features are rectangles
# generated closed-form from the part-table row count, so the DuckDB
# oracle replays the probe (positive-area intersects), the clip, the
# calc projection, and the ORDER BY paint order analytically.
# last_val is taken by ARRIVAL order (max_by over a pre-shuffle
# monotonic id, one tile per input partition), so a broken ORDER BY in
# the source would hash-mismatch against the oracle's max(calc).
# --------------------------------------------------------------------------
_Q433_CAP = 1000
_Q433_TILES = [
    {"tile_id": f"t{r}{c}", "left": c * 10.0, "bottom": r * 10.0,
     "right": c * 10.0 + 10.0, "top": r * 10.0 + 10.0}
    for r in range(4) for c in range(4)
]


def _q433_ensure_features(srv: dict, n: int) -> str:
    """Create + fill gfw.features_q433_<n> once per server lifetime.
    Coordinates are float8 expressions; jsonb stores them shortest-
    round-trip, so the doubles survive the wire exactly."""
    from ..sources.pg_server import run_sql

    table = f"features_q433_{n}"
    run_sql(srv["sock"],
            f"CREATE TABLE IF NOT EXISTS gfw.{table} "
            "(gid INT, val float8, geom jsonb)")
    if run_sql(srv["sock"], f"SELECT 1 FROM gfw.{table} LIMIT 1"):
        return table
    run_sql(srv["sock"], f"""
      INSERT INTO gfw.{table}
      SELECT i, (i*3 + 1)::float8,
             jsonb_build_object('type', 'Polygon', 'coordinates',
               jsonb_build_array(jsonb_build_array(
                 jsonb_build_array(x0, y0),
                 jsonb_build_array(x0 + w, y0),
                 jsonb_build_array(x0 + w, y0 + h),
                 jsonb_build_array(x0, y0 + h),
                 jsonb_build_array(x0, y0))))
      FROM (
        SELECT i,
               ((i*7) % 36)::float8
                 + (i % 4)::float8 * (0.25)::float8 AS x0,
               ((i*11) % 36)::float8
                 + (i % 5)::float8 * (0.2)::float8 AS y0,
               (2 + i % 7)::float8 AS w,
               (2 + i % 5)::float8 AS h
        FROM generate_series(0, {n - 1}) AS i
      ) s
    """)
    return table


_Q433_ORACLE = f"""
    WITH feat AS (
      SELECT i,
             CAST((i*7) % 36 AS DOUBLE)
               + CAST(i % 4 AS DOUBLE) * CAST(0.25 AS DOUBLE) AS x0,
             CAST((i*11) % 36 AS DOUBLE)
               + CAST(i % 5 AS DOUBLE) * CAST(0.2 AS DOUBLE) AS y0,
             CAST(2 + i % 7 AS DOUBLE) AS w,
             CAST(2 + i % 5 AS DOUBLE) AS h,
             CAST(i*3 + 1 AS DOUBLE) * 2 + 1 AS calcval
      FROM (SELECT range AS i FROM range({_Q433_CAP})
            WHERE range < (SELECT least(count(*), {_Q433_CAP}) FROM part))
    ), tiles AS (
      SELECT 't' || r.range || c.range AS tile_id,
             CAST(c.range * 10 AS DOUBLE) AS tl,
             CAST(r.range * 10 AS DOUBLE) AS tb
      FROM range(4) r, range(4) c
    ), clipped AS (
      SELECT tile_id, calcval,
             least(x0 + w, tl + 10) - greatest(x0, tl) AS ix,
             least(y0 + h, tb + 10) - greatest(y0, tb) AS iy
      FROM feat, tiles
      WHERE least(x0 + w, tl + 10) > greatest(x0, tl)
        AND least(y0 + h, tb + 10) > greatest(y0, tb)
    )
    SELECT tile_id,
           COUNT(*) AS n_feat,
           ROUND(SUM(calcval), 2) AS sum_val,
           MAX(calcval) AS last_val,
           ROUND(SUM(ix * iy), 4) AS sum_area
    FROM clipped GROUP BY tile_id ORDER BY tile_id
"""


@register("q433_pg_datasource_scan", oracle=_Q433_ORACLE)
def q433(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json

    from ..sources import pg_datasource, pg_server

    srv = pg_server.ensure_server()
    # bounded driver-side scalar: the feature count (<= 1000)
    n = min(load(spark, sf_dir, "part").count(), _Q433_CAP)
    table = _q433_ensure_features(srv, n)
    pg_datasource.register(spark)
    raw = (
        spark.read.format(pg_datasource.FORMAT_NAME)
        .option("sock", srv["sock"]).option("port", srv["port"])
        .option("schema", "gfw").option("table", table)
        .option("field", "val").option("calc", "val * 2 + 1")
        .option("order", "asc")
        .option("tiles", _json.dumps(_Q433_TILES))
        .load()
    )
    g = F.from_json(
        "geom",
        "STRUCT<type: STRING, coordinates: ARRAY<ARRAY<ARRAY<DOUBLE>>>>",
    )
    ring = g["coordinates"][0]
    xs = F.transform(ring, lambda p: p[0])
    ys = F.transform(ring, lambda p: p[1])
    rows = raw.select(
        "tile_id", "val",
        F.monotonically_increasing_id().alias("arrival"),
        ((F.array_max(xs) - F.array_min(xs))
         * (F.array_max(ys) - F.array_min(ys))).alias("area"),
    )
    return (
        rows.groupBy("tile_id")
        .agg(
            F.count("*").alias("n_feat"),
            F.round(F.sum("val"), 2).alias("sum_val"),
            F.expr("max_by(val, arrival)").alias("last_val"),
            F.round(F.sum("area"), 4).alias("sum_area"),
        )
        .orderBy("tile_id")
    )

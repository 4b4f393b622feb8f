"""Core relational harness queries (SURVEY §2.1-§2.6 operator inventory).

Each query maps one reference operator to its Spark-first expression over
the TPC-H-ish harness tables, with a value-identical DuckDB oracle.

Float discipline (so value hashes match bit-for-bit):
* raw source columns pass through untouched;
* money sums go through exact DECIMAL(18,2) accumulation, cast to double;
* averages are exact-decimal-sum / count — one double division, identical
  on both engines;
* genuinely floating aggregates (stddev, percentile) are rounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.filters import anti_join, range_join, semi_join, subset_filter
from ..operators.rasterize import ordered_paint, paint_count
from ..operators.resample import downsample, mode_downsample
from ..operators.stats import band_stats, histogram, validity_counts
from . import load, register


def dec2(col: str) -> Column:
    return F.col(col).cast("decimal(18,2)")


def dsum(col: str, alias: str) -> Column:
    """Exact money sum: decimal accumulate, double out."""
    return F.sum(dec2(col)).cast("double").alias(alias)


def davg(col: str, alias: str) -> Column:
    """Exact-sum average: identical double division on both engines."""
    return (F.sum(dec2(col)).cast("double") / F.count(col)).alias(alias)


def SQL_DSUM(col: str) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"


def SQL_DAVG(col: str) -> str:
    return f"(CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({col}))"


# --------------------------------------------------------------------------
# q01 — flagship: TPC-H-Q1-shaped pricing summary (scan -> filter -> hash agg)
# Exercises S-scans with predicate pushdown + A3/A4-style aggregates.
# --------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {SQL_DSUM('l_quantity')} AS sum_qty,
           {SQL_DSUM('l_extendedprice')} AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(7,6)) - CAST(l_discount AS DECIMAL(7,6))))
                AS DOUBLE) AS sum_disc_price,
           {SQL_DAVG('l_quantity')} AS avg_qty,
           {SQL_DAVG('l_extendedprice')} AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    one_minus_disc = F.lit(1).cast("decimal(7,6)") - F.col("l_discount").cast(
        "decimal(7,6)"
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(dec2("l_extendedprice") * one_minus_disc)
            .cast("double")
            .alias("sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q02 — scan pushdown: projection + filter reach the parquet reader (S1-S3)
# --------------------------------------------------------------------------
@register(
    "q02_scan_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_quantity < 10
    """,
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("l_quantity") < 10)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


# --------------------------------------------------------------------------
# q03 — grid seeding (F1): enumerate the 10-degree lat/lng grid as a
# distributed generator (reference: gfw_pixetl/pipes/pipe.py:55-63,
# grids/lat_lng_grid.py:119-141 — 36x18 = 648 world tiles).
# --------------------------------------------------------------------------
@register(
    "q03_seed_grid",
    oracle="""
    SELECT
      CONCAT(
        lpad(CAST(abs(-80 + CAST(i // 36 AS INT) * 10 + 10) AS VARCHAR), 2, '0'),
        CASE WHEN -80 + CAST(i // 36 AS INT) * 10 + 10 >= 0 THEN 'N' ELSE 'S' END,
        '_',
        lpad(CAST(abs(-180 + CAST(i % 36 AS INT) * 10) AS VARCHAR), 3, '0'),
        CASE WHEN -180 + CAST(i % 36 AS INT) * 10 >= 0 THEN 'E' ELSE 'W' END
      ) AS tile_id,
      CAST(-180 + CAST(i % 36 AS INT) * 10 AS INT) AS tile_left,
      CAST(-80 + CAST(i // 36 AS INT) * 10 AS INT) AS tile_bottom,
      CAST(-180 + CAST(i % 36 AS INT) * 10 + 10 AS INT) AS tile_right,
      CAST(-80 + CAST(i // 36 AS INT) * 10 + 10 AS INT) AS tile_top
    FROM range(648) t(i)
    """,
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.range(648)
    left = (F.lit(-180) + (F.col("id") % 36).cast("int") * 10).cast("int")
    bottom = (F.lit(-80) + (F.col("id") / 36).cast("int") * 10).cast("int")
    top = (bottom + 10).cast("int")
    right = (left + 10).cast("int")
    tile_id = F.concat(
        F.lpad(F.abs(top).cast("string"), 2, "0"),
        F.when(top >= 0, F.lit("N")).otherwise(F.lit("S")),
        F.lit("_"),
        F.lpad(F.abs(left).cast("string"), 3, "0"),
        F.when(left >= 0, F.lit("E")).otherwise(F.lit("W")),
    )
    return df.select(
        tile_id.alias("tile_id"),
        left.alias("tile_left"),
        bottom.alias("tile_bottom"),
        right.alias("tile_right"),
        top.alias("tile_top"),
    )


# --------------------------------------------------------------------------
# q04 — subset filter (F2): gfw_pixetl/pipes/pipe.py:77-88
# --------------------------------------------------------------------------
@register(
    "q04_subset_filter",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return subset_filter(c, "c_mktsegment", ["BUILDING", "AUTOMOBILE"]).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# q05 — source-intersects semi-join (F3/F4):
# gfw_pixetl/pipes/raster_pipe.py:59-69 (EXISTS probe shape)
# --------------------------------------------------------------------------
@register(
    "q05_semi_join",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    )
    """,
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    out = semi_join(o, li, o["o_orderkey"] == li["l_orderkey"])
    return out.select("o_orderkey", "o_totalprice", "o_orderstatus")


# --------------------------------------------------------------------------
# q06 — target-exists anti-join (F5): gfw_pixetl/pipes/pipe.py:90-109
# --------------------------------------------------------------------------
@register(
    "q06_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return anti_join(c, o, c["c_custkey"] == o["o_custkey"]).select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# q07 — broadcast range join (G1): tile x file-footprint interval overlap
# (gfw_pixetl/tiles/raster_src_tile.py:56-59) as value-in-[lo,hi) buckets.
# --------------------------------------------------------------------------
@register(
    "q07_range_join",
    oracle="""
    SELECT b.lo AS bucket_lo,
           COUNT(*) AS n,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem l
    JOIN (SELECT CAST(i * 10 AS DOUBLE) AS lo, CAST(i * 10 + 10 AS DOUBLE) AS hi
          FROM range(6) t(i)) b
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.lo
    """,
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    buckets = spark.range(6).select(
        (F.col("id") * 10).cast("double").alias("lo"),
        (F.col("id") * 10 + 10).cast("double").alias("hi"),
    )
    joined = range_join(li, buckets, "l_quantity")
    return joined.groupBy(F.col("lo").alias("bucket_lo")).agg(
        F.count("*").alias("n"), dsum("l_quantity", "sum_qty")
    )


# --------------------------------------------------------------------------
# q08 — ordered paint, relational shape (A1/W1): last-wins per key
# (gfw_pixetl/tiles/vector_src_tile.py:67-74 ORDER BY + last-painted-wins)
# --------------------------------------------------------------------------
@register(
    "q08_ordered_paint_last_order",
    oracle="""
    SELECT o_custkey, o_orderkey AS last_orderkey, o_totalprice AS last_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    rank = F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
    return o.groupBy("o_custkey").agg(
        F.max_by(F.col("o_orderkey"), rank).alias("last_orderkey"),
        F.max_by(F.col("o_totalprice"), rank).alias("last_totalprice"),
    )


# --------------------------------------------------------------------------
# q09 — rasterize value / ordered paint on a pixel lattice (A1):
# pixels derived from events; last event (by ts) paints the pixel.
# --------------------------------------------------------------------------
@register(
    "q09_rasterize_value",
    oracle="""
    SELECT px, py, value AS painted_value
    FROM (
      SELECT user_id % 50 AS px, event_id % 40 AS py, value,
             row_number() OVER (PARTITION BY user_id % 50, event_id % 40
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 50).alias("px"),
        (F.col("event_id") % 40).alias("py"),
        "value", "ts", "event_id",
    )
    return ordered_paint(
        ev, ["px", "py"], "value",
        [F.col("ts"), F.col("event_id")],
        out_col="painted_value",
    )


# --------------------------------------------------------------------------
# q10 — rasterize count (A2): gdal_rasterize -burn 1 -add
# (gfw_pixetl/tiles/vector_src_tile.py:166-167) = groupBy(pixel).count()
# --------------------------------------------------------------------------
@register(
    "q10_rasterize_count",
    oracle="""
    SELECT user_id % 50 AS px, event_id % 40 AS py, COUNT(*) AS value
    FROM events GROUP BY 1, 2
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 50).alias("px"), (F.col("event_id") % 40).alias("py")
    )
    return paint_count(ev, ["px", "py"])


# --------------------------------------------------------------------------
# q11 — resampling aggregation, average/min/max/sum (A3/C4 downsample):
# hourly buckets stand in for target pixels.
# --------------------------------------------------------------------------
@register(
    "q11_resample_time",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS bucket,
           {SQL_DAVG('value')} AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           {SQL_DSUM('value')} AS sum_value,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket")).agg(
        davg("value", "avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        dsum("value", "sum_value"),
        F.count("*").alias("n"),
    )


# --------------------------------------------------------------------------
# q12 — resampling percentiles (A3: med/q1/q3 kernels, resampling.py:9-25)
# --------------------------------------------------------------------------
@register(
    "q12_resample_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS q1,
           round(quantile_cont(value, 0.50), 6) AS med,
           round(quantile_cont(value, 0.75), 6) AS q3,
           round(sqrt(avg(value * value)), 6) AS rms
    FROM events GROUP BY event_type
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile(F.col("value"), F.lit(0.25)), 6).alias("q1"),
        F.round(F.percentile(F.col("value"), F.lit(0.50)), 6).alias("med"),
        F.round(F.percentile(F.col("value"), F.lit(0.75)), 6).alias("q3"),
        F.round(F.sqrt(F.avg(F.col("value") * F.col("value"))), 6).alias("rms"),
    )


# --------------------------------------------------------------------------
# q13 — resampling mode (A3 'mode' kernel), deterministic tie-break
# --------------------------------------------------------------------------
@register(
    "q13_resample_mode",
    oracle="""
    SELECT event_type, v AS value FROM (
      SELECT event_type, v, row_number() OVER (
               PARTITION BY event_type ORDER BY cnt DESC, v ASC) AS rn
      FROM (SELECT event_type, user_id % 100 AS v, COUNT(*) AS cnt
            FROM events GROUP BY 1, 2)
    ) WHERE rn = 1
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 100).alias("v")
    )
    return mode_downsample(ev, ["event_type"], "v", out_col="value")


# --------------------------------------------------------------------------
# q14 — band statistics (A4): gdalinfo -stats -mm
# (gfw_pixetl/utils/gdal.py:170-238) as one aggregation pass
# --------------------------------------------------------------------------
@register(
    "q14_band_stats",
    oracle=f"""
    SELECT l_returnflag,
           MIN(l_extendedprice) AS min,
           MAX(l_extendedprice) AS max,
           round({SQL_DAVG('l_extendedprice')}, 6) AS mean,
           round(stddev_pop(l_extendedprice), 4) AS std_dev,
           COUNT(l_extendedprice) AS count
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("min"),
        F.max("l_extendedprice").alias("max"),
        F.round(
            F.sum(dec2("l_extendedprice")).cast("double")
            / F.count("l_extendedprice"), 6
        ).alias("mean"),
        F.round(F.stddev_pop("l_extendedprice"), 4).alias("std_dev"),
        F.count("l_extendedprice").alias("count"),
    )


# --------------------------------------------------------------------------
# q15 — histogram (A5): gdalinfo -hist fixed-bound buckets
# --------------------------------------------------------------------------
@register(
    "q15_histogram",
    oracle="""
    SELECT CAST(least(greatest(floor((l_extendedprice - 900.0) / 5205.0), 0), 19)
                AS INT) AS bucket,
           COUNT(*) AS count
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL
    GROUP BY 1
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # lo=900, hi=105000, 20 buckets -> width 5205.0
    return histogram(li, "l_extendedprice", 900.0, 105000.0, 20)


# --------------------------------------------------------------------------
# q16 — validity counts (A6): empty-block detection shape
# (gfw_pixetl/tiles/utils/array_utils.py:44-58)
# --------------------------------------------------------------------------
@register(
    "q16_validity_counts",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN value IS NOT NULL AND value > 50.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS valid_count,
           COUNT(*) AS total_count
    FROM events GROUP BY event_type
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    valid = F.col("value").isNotNull() & (F.col("value") > 50.0)
    return validity_counts(ev, valid, ["event_type"])


# --------------------------------------------------------------------------
# q17 — status routing tallies (F10/A7): gfw_pixetl/pixetl.py:64-78
# --------------------------------------------------------------------------
@register(
    "q17_status_tallies",
    oracle="""
    SELECT CASE WHEN o_orderstatus = 'F' THEN 'processed'
                WHEN o_orderstatus = 'O' THEN 'pending'
                ELSE 'failed' END AS status,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    status = (
        F.when(F.col("o_orderstatus") == "F", "processed")
        .when(F.col("o_orderstatus") == "O", "pending")
        .otherwise("failed")
    )
    return o.groupBy(status.alias("status")).agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# q18 — sort + limit (O1/L1): deterministic top-N with tiebreak
# --------------------------------------------------------------------------
@register(
    "q18_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q19 — union + dedup (U1): manifest merge shape
# (gfw_pixetl/pixetl_prep.py:39-53, utils/upload_geometries.py:41-44)
# --------------------------------------------------------------------------
@register(
    "q19_union_dedup",
    oracle="""
    SELECT n_name FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    UNION
    SELECT n_name FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    cust_nations = c.join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    ).select("n_name")
    supp_nations = s.join(
        F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]
    ).select("n_name")
    return cust_nations.unionByName(supp_nations).distinct()


# --------------------------------------------------------------------------
# q20 — CASE expression calc (C2): the vector-path SQL calc
# (gfw_pixetl/tiles/vector_src_tile.py:139-143)
# --------------------------------------------------------------------------
@register(
    "q20_case_calc",
    oracle=f"""
    SELECT CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 25 THEN 'mid'
                ELSE 'high' END AS qty_class,
           COUNT(*) AS n,
           {SQL_DSUM('l_extendedprice')} AS sum_price
    FROM lineitem GROUP BY 1
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    qty_class = (
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 25, "mid")
        .otherwise("high")
    )
    return li.groupBy(qty_class.alias("qty_class")).agg(
        F.count("*").alias("n"), dsum("l_extendedprice", "sum_price")
    )


# --------------------------------------------------------------------------
# q21 — window functions (W1 surface): rank + lag with full tiebreaks
# --------------------------------------------------------------------------
@register(
    "q21_window_funcs",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS price_rank,
           lag(o_orderkey) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_orderkey
    FROM orders
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    w_date = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w_price).alias("price_rank"),
        F.lag("o_orderkey").over(w_date).alias("prev_orderkey"),
    )


# --------------------------------------------------------------------------
# q22 — grid snapping (C5): snap values to a fixed lattice, top-left bias
# (gfw_pixetl/grids/grid.py:71-97, utils/utils.py:151-161)
# --------------------------------------------------------------------------
@register(
    "q22_grid_snap",
    oracle="""
    SELECT event_id,
           floor(value / 0.25) * 0.25 AS snapped,
           CAST(floor(value / 0.25) AS BIGINT) AS cell_idx
    FROM events
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cell = F.floor(F.col("value") / 0.25)
    return ev.select(
        "event_id",
        (cell * 0.25).alias("snapped"),
        cell.cast("bigint").alias("cell_idx"),
    )


# --------------------------------------------------------------------------
# q23 — manifest union-distinct merge (S10/S11 merge_existing)
# --------------------------------------------------------------------------
@register(
    "q23_manifest_merge",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 100000
    UNION
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 100000).select("o_orderkey", "o_orderstatus")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderstatus")
    return a.unionByName(b).distinct()


# --------------------------------------------------------------------------
# q24 — semi-structured scalar surface: JSON property extraction
# (vector-path calc operates on source columns; props is the analog)
# --------------------------------------------------------------------------
@register(
    "q24_json_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
             AS sum_k,
           (CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS DOUBLE)
             / COUNT(*)) AS avg_k
    FROM events GROUP BY event_type
    """,
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        (F.sum(k).cast("double") / F.count("*")).alias("avg_k"),
    )


# --------------------------------------------------------------------------
# q25 — sessionization (stream-shaped batch op): gap-based sessions via
# window functions; the streaming twin lives in gfw_pixetl_spark.streaming.
# --------------------------------------------------------------------------
@register(
    "q25_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), sess AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC,
                                      event_id ASC ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           CAST(epoch(MAX(ts)) - epoch(MIN(ts)) AS DOUBLE) AS duration_sec
    FROM sess GROUP BY user_id, session_id
    """,
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_ts = F.lag(F.col("ts")).over(w)
    gap = F.col("ts").cast("double") - prev_ts.cast("double")
    flagged = ev.withColumn(
        "new_sess", F.when(prev_ts.isNull() | (gap > 1800), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max(F.col("ts").cast("double")) - F.min(F.col("ts").cast("double"))).alias(
            "duration_sec"
        ),
    )

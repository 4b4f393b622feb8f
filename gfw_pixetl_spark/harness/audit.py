"""Wave 4: time-range window frames, data-quality audits, gaps-and-
islands, share-of-total, balanced shard assignment, first/last-per-group.

These are the operational-analytics shapes (monitoring, curriculum
sharding, run detection) that sit alongside the OLAP wave. All windows
are partitioned (no global ordering); the audit queries are unions of
independent scalar aggregates Catalyst evaluates in parallel scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_int64_sql
from . import load, register
from .core import SQL_DSUM, dec2


# --------------------------------------------------------------------------
# q111 — rolling time-range frame: per-user trailing-1-hour event count
# and exact decimal sum. RANGE BETWEEN on the epoch key — the frame is
# event-time, not row-count, so bursty users and quiet users both get
# "the last hour". Decimal accumulation keeps the rolling sum exact
# under any evaluation order (segment tree vs sliding recompute).
# --------------------------------------------------------------------------
@register(
    "q111_rolling_hour",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS roll_n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("double"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("roll_n"),
        F.sum(dec2("value")).over(w).cast("double").alias("roll_sum"),
    )


# --------------------------------------------------------------------------
# q112 — data-quality audit: the constraint checks a pipeline runs before
# publishing a dataset version (the engine-side analog of the reference's
# up-front pydantic/source validation, models/pydantic.py:35-78 — there
# schema conformance is asserted per layer; here it is measured per
# table). Each check is an independent aggregate; orphan detection is a
# broadcast-able anti-join.
# --------------------------------------------------------------------------
@register(
    "q112_dq_audit",
    oracle="""
    SELECT 'orders_rows' AS check_name, COUNT(*) AS n FROM orders
    UNION ALL
    SELECT 'orders_null_custkey', COUNT(*) FROM orders WHERE o_custkey IS NULL
    UNION ALL
    SELECT 'orders_dup_pk',
           COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
    UNION ALL
    SELECT 'lineitem_orphans', COUNT(*) FROM lineitem
    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    UNION ALL
    SELECT 'lineitem_nonpositive_qty', COUNT(*) FROM lineitem
    WHERE l_quantity <= 0
    UNION ALL
    SELECT 'lineitem_discount_range', COUNT(*) FROM lineitem
    WHERE l_discount < 0 OR l_discount > 1
    UNION ALL
    SELECT 'orders_fk_customer', COUNT(*) FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    """,
)
def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cust = load(spark, sf_dir, "customer")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("n")).select(
            F.lit(name).alias("check_name"), "n"
        )

    orphans = li.join(
        orders.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    )
    fk_cust = orders.join(
        F.broadcast(cust.select("c_custkey")),
        orders.o_custkey == F.col("c_custkey"),
        "left_anti",
    )
    dup_pk = orders.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).alias("n")
    ).select(F.lit("orders_dup_pk").alias("check_name"), "n")
    return (
        one("orders_rows", orders)
        .unionByName(one("orders_null_custkey", orders.filter(F.col("o_custkey").isNull())))
        .unionByName(dup_pk)
        .unionByName(one("lineitem_orphans", orphans))
        .unionByName(one("lineitem_nonpositive_qty", li.filter(F.col("l_quantity") <= 0)))
        .unionByName(
            one(
                "lineitem_discount_range",
                li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
            )
        )
        .unionByName(one("orders_fk_customer", fk_cust))
    )


# --------------------------------------------------------------------------
# q113 — gaps and islands: maximal runs of consecutive active days per
# user via the day_index - row_number() grouping trick — one partitioned
# window plus one aggregate, the canonical O(n log n) run detection.
# --------------------------------------------------------------------------
@register(
    "q113_activity_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx
      FROM events
    ), grp AS (
      SELECT user_id, day_idx,
             day_idx - row_number() OVER (PARTITION BY user_id
                                          ORDER BY day_idx) AS g
      FROM days
    )
    SELECT user_id, MIN(day_idx) AS island_start,
           MAX(day_idx) AS island_end,
           COUNT(*) AS n_days
    FROM grp GROUP BY user_id, g
    """,
)
def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("day_idx"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_idx")
    grp = days.withColumn("g", F.col("day_idx") - F.row_number().over(w))
    return grp.groupBy("user_id", "g").agg(
        F.min("day_idx").alias("island_start"),
        F.max("day_idx").alias("island_end"),
        F.count("*").alias("n_days"),
    ).drop("g")


# --------------------------------------------------------------------------
# q114 — share-of-total (ratio_to_report): each nation's share of global
# revenue. The grand total is an unpartitioned window over the ALREADY
# AGGREGATED 25-row nation table — the expensive scan aggregates first,
# so the global window touches dimension-cardinality rows only.
# --------------------------------------------------------------------------
@register(
    "q114_revenue_share",
    oracle=f"""
    WITH nat AS (
      SELECT n_name, {SQL_DSUM('o_totalprice')} AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, revenue,
           round(revenue / SUM(revenue) OVER (), 6) AS share
    FROM nat
    """,
)
def q114(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    nat = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(dec2("o_totalprice")).cast("double").alias("revenue"))
    )
    w = Window.partitionBy()
    return nat.select(
        "n_name",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias("share"),
    )


# --------------------------------------------------------------------------
# q115 — balanced training-shard assignment: size-ordered round-robin
# binning (longest-processing-time heuristic) of documents into 8 shards.
# Deterministic: shard = (row_number by size desc, doc_id) % 8. At true
# scale the streaming path is hash-sharding; this is the curriculum/
# balanced variant used when shard size variance matters.
# --------------------------------------------------------------------------
@register(
    "q115_shard_assign",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, n_chars,
             (row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) - 1) % 8
               AS shard
      FROM documents
    )
    SELECT shard, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM ranked GROUP BY shard
    """,
)
def q115(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = Window.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    ranked = docs.withColumn(
        "shard", (F.row_number().over(w) - 1) % 8
    )
    return ranked.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# --------------------------------------------------------------------------
# q116 — first/last event per user in one pass: min_by/max_by keyed on
# the (ts, event_id) struct — single hash aggregate, no window, no
# second scan. The struct key makes the tie-break explicit and
# partition-order-independent.
# --------------------------------------------------------------------------
@register(
    "q116_first_last_event",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS rn_a,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT a.user_id,
           a.event_type AS first_type,
           d.event_type AS last_type,
           a.ts AS first_ts, d.ts AS last_ts
    FROM ranked a JOIN ranked d
      ON a.user_id = d.user_id AND a.rn_a = 1 AND d.rn_d = 1
    """,
)
def q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", key).alias("first_type"),
        F.max_by("event_type", key).alias("last_type"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


# --------------------------------------------------------------------------
# q145 — dimension-banding join: map a continuous measure onto a named
# band table via a broadcast non-equi join (lo <= v < hi) — the severity
# bucketing / rate-card shape. The band table is tiny and broadcast, so
# the fact side streams map-only through a nested-loop probe.
# --------------------------------------------------------------------------
_BANDS = [
    ("low", 0.0, 250.0),
    ("mid", 250.0, 500.0),
    ("high", 500.0, 750.0),
    ("extreme", 750.0, 1e18),
]
_BANDS_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)


@register(
    "q145_band_join",
    oracle=f"""
    SELECT band, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events
    JOIN (VALUES {_BANDS_SQL}) AS b(band, lo, hi)
      ON value >= lo AND value < hi
    GROUP BY band
    """,
)
def q145(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        spark.sparkContext.parallelize(_BANDS, 1),
        "band string, lo double, hi double",
    )
    return (
        ev.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec2("value")).cast("double").alias("total"),
        )
    )


# --------------------------------------------------------------------------
# q148 — period-over-period growth: monthly revenue with month-over-month
# deltas via lag() partitioned BY YEAR over the aggregated month table —
# the window never sees fact cardinality and needs no global ordering
# (January's delta is null by construction).
# --------------------------------------------------------------------------
@register(
    "q148_mom_growth",
    oracle=f"""
    WITH monthly AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
             CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mon,
             {SQL_DSUM('o_totalprice')} AS revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT yr, mon, revenue,
           round(revenue - lag(revenue) OVER w, 2) AS delta,
           round((revenue - lag(revenue) OVER w)
                 / lag(revenue) OVER w, 6) AS growth
    FROM monthly
    WINDOW w AS (PARTITION BY yr ORDER BY mon)
    """,
)
def q148(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    monthly = (
        orders.withColumn("yr", F.year("o_orderdate"))
        .withColumn("mon", F.month("o_orderdate"))
        .groupBy("yr", "mon")
        .agg(F.sum(dec2("o_totalprice")).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("yr").orderBy("mon")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "yr",
        "mon",
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("delta"),
        F.round((F.col("revenue") - prev) / prev, 6).alias("growth"),
    )


# --------------------------------------------------------------------------
# q168 — Bloom-sketch decontamination probe: build a 16 Kbit / 3-hash
# Bloom bitmap over a "benchmark" subset (doc_id % 10 == 0), probe the
# whole corpus against the BROADCAST bitmap, and tally per source:
# flagged (all k bits set), true members, and the false positives the
# sketch admits. The corpus-scale side never shuffles more than a k-way
# fan-out; the bitmap is ~2 KB regardless of benchmark size — the shape
# that makes benchmark decontamination feasible at 100 TB (an exact
# anti-join would shuffle the full corpus text).
# --------------------------------------------------------------------------
@register(
    "q168_bloom_decontaminate",
    oracle="""
    WITH bench AS (
      SELECT text FROM documents WHERE doc_id % 10 = 0
    ), bits AS (
      SELECT DISTINCT
        CAST(('0x' || substr(md5(text || '|' || j), 1, 15)) AS BIGINT)
          % 16384 AS pos
      FROM bench, (VALUES (0), (1), (2)) t(j)
    ), probe AS (
      SELECT d.doc_id, d.source, d.text,
             CAST(('0x' || substr(md5(d.text || '|' || j.j), 1, 15))
                  AS BIGINT) % 16384 AS pos
      FROM documents d, (VALUES (0), (1), (2)) j(j)
    ), hits AS (
      SELECT doc_id, source, text,
             SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS nhit
      FROM probe LEFT JOIN bits b USING (pos)
      GROUP BY 1, 2, 3
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN nhit = 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(SUM(CASE WHEN text IN (SELECT text FROM bench)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
           CAST(SUM(CASE WHEN nhit = 3
                          AND text NOT IN (SELECT text FROM bench)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM hits
    GROUP BY source
    """,
)
def q168(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import dedup as D

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0).localCheckpoint(
        eager=False)  # bloom build + exact-membership join
    bloom = D.bloom_build(bench, "text")
    probed = D.bloom_probe(docs.select("doc_id", "source", "text"), bloom)
    member = F.col("_m").isNotNull()
    probed = probed.join(
        F.broadcast(bench.select(F.col("text").alias("_bt"))
                    .distinct().withColumn("_m", F.lit(1))),
        probed.text == F.col("_bt"), "left",
    )
    return probed.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("maybe_in_set"), 1).otherwise(0))
         .cast("bigint").alias("n_flagged"),
        F.sum(F.when(member, 1).otherwise(0)).cast("bigint")
         .alias("n_members"),
        F.sum(F.when(F.col("maybe_in_set") & ~member, 1).otherwise(0))
         .cast("bigint").alias("n_false_pos"),
    )


# --------------------------------------------------------------------------
# q190 — Poisson bootstrap of a mean: the at-scale bootstrap (per-row
# replica weights ~ Poisson(1) instead of sampling n-of-n with
# replacement, so it's one map-only pass — the formulation production
# metric pipelines use for CIs over billions of rows). Weights come
# from CDF inversion of a deterministic md5 uniform, so both engines
# replay the identical resample. 8 replicas of mean(value) over
# events; n_eff is the integer total weight.
# --------------------------------------------------------------------------
_POIS1_CDF = [  # P(X <= k) for Poisson(1), k = 0..4; tail -> 5
    0.3678794411714423, 0.7357588823428846, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563,
]


def _pois_w_sql(u: str) -> str:
    branches = "".join(
        f" WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS1_CDF))
    return f"(CASE{branches} ELSE 5 END)"


@register(
    "q190_poisson_bootstrap",
    oracle=f"""
    WITH w AS (
      SELECT r.r AS replica, value,
             {_pois_w_sql(
                 "(" + md5_int64_sql(
                     "CAST(event_id AS VARCHAR) || '|boot|' "
                     "|| CAST(r.r AS VARCHAR)") + " % 1000000) / 1000000.0"
             )} AS wt
      FROM events, generate_series(0, 7) r(r)
    )
    SELECT CAST(replica AS INTEGER) AS replica,
           CAST(SUM(wt) AS BIGINT) AS n_eff,
           round(SUM(wt * value) / SUM(wt), 6) AS boot_mean
    FROM w GROUP BY replica
    """,
)
def q190(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_int64

    ev = load(spark, sf_dir, "events").select("event_id", "value")
    reps = ev.withColumn(
        "replica", F.explode(F.array(*[F.lit(r) for r in range(8)])))
    u = (
        md5_int64(F.concat(
            F.col("event_id").cast("string"), F.lit("|boot|"),
            F.col("replica").cast("string"))) % 1000000
    ) / 1000000.0
    wt = F.lit(5)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        wt = F.when(u < _POIS1_CDF[k], k).otherwise(wt)
    reps = reps.withColumn("wt", wt)
    return reps.groupBy(F.col("replica").cast("int").alias("replica")).agg(
        F.sum("wt").cast("bigint").alias("n_eff"),
        F.round(F.sum(F.col("wt") * F.col("value")) / F.sum("wt"), 6)
        .alias("boot_mean"),
    )


# --------------------------------------------------------------------------
# q195 — A/B test readout: deterministic 50/50 assignment (md5 of the
# user id), conversion = a purchase within 1h of any view, and the
# two-proportion z-statistic — the experiment-analysis query every
# product pipeline runs. Exposure and conversion are semi-join shapes
# (never a row explosion); the z arithmetic runs on one aggregated row.
# --------------------------------------------------------------------------
@register(
    "q195_ab_readout",
    oracle=f"""
    WITH exposed AS (
      SELECT DISTINCT user_id,
             {md5_int64_sql("CAST(user_id AS VARCHAR) || '|ab1'")} % 2
               AS variant
      FROM events WHERE event_type = 'view'
    ), converted AS (
      SELECT DISTINCT v.user_id
      FROM events v JOIN events p
        ON v.user_id = p.user_id
       AND p.event_type = 'purchase' AND v.event_type = 'view'
       AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    ), cells AS (
      SELECT e.variant,
             COUNT(*) AS n,
             SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS conv
      FROM exposed e LEFT JOIN converted c ON e.user_id = c.user_id
      GROUP BY e.variant
    ), wide AS (
      SELECT
        MAX(CASE WHEN variant = 0 THEN n END) AS n0,
        MAX(CASE WHEN variant = 0 THEN conv END) AS c0,
        MAX(CASE WHEN variant = 1 THEN n END) AS n1,
        MAX(CASE WHEN variant = 1 THEN conv END) AS c1
      FROM cells
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(c0 AS BIGINT) AS c0,
           CAST(n1 AS BIGINT) AS n1, CAST(c1 AS BIGINT) AS c1,
           round(c0 / CAST(n0 AS DOUBLE), 6) AS rate0,
           round(c1 / CAST(n1 AS DOUBLE), 6) AS rate1,
           round(
             (c1 / CAST(n1 AS DOUBLE) - c0 / CAST(n0 AS DOUBLE))
             / sqrt(((c0 + c1) / CAST(n0 + n1 AS DOUBLE))
                    * (1 - (c0 + c1) / CAST(n0 + n1 AS DOUBLE))
                    * (1.0 / n0 + 1.0 / n1)), 6) AS z_stat
    FROM wide
    """,
)
def q195(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_int64

    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    exposed = views.select("user_id").distinct().withColumn(
        "variant",
        md5_int64(F.concat(F.col("user_id").cast("string"),
                           F.lit("|ab1"))) % 2,
    )
    converted = (
        views.join(
            purchases,
            (views.user_id == F.col("p_user"))
            & (F.col("p_ts") >= views.ts)
            & (F.col("p_ts") <= views.ts + F.expr("INTERVAL 1 HOUR")),
            "left_semi",
        )
        .select("user_id").distinct().withColumn("_c", F.lit(1))
    )
    cells = (
        exposed.join(converted, "user_id", "left")
        .groupBy("variant")
        .agg(F.count("*").alias("n"),
             F.sum(F.coalesce(F.col("_c"), F.lit(0))).alias("conv"))
    )
    wide = cells.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("c1"),
    )
    p0 = F.col("c0") / F.col("n0").cast("double")
    p1 = F.col("c1") / F.col("n1").cast("double")
    pp = (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1")).cast(
        "double")
    return wide.select(
        F.col("n0").cast("bigint").alias("n0"),
        F.col("c0").cast("bigint").alias("c0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.col("c1").cast("bigint").alias("c1"),
        F.round(p0, 6).alias("rate0"),
        F.round(p1, 6).alias("rate1"),
        F.round((p1 - p0) / F.sqrt(
            pp * (1 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))), 6)
        .alias("z_stat"),
    )


# --------------------------------------------------------------------------
# q198 — popularity-baseline recommendations: for each of the first 20
# users, the top-3 globally-popular items the user has NOT interacted
# with (item = event_type x day-of-week, the contextual-slot framing) —
# the anti-join + popularity-rank shape every recommender starts from.
# At scale the anti-join stays a broadcast against the tiny popularity
# table, never a per-user scan of the catalog.
# --------------------------------------------------------------------------
@register(
    "q198_popular_unseen",
    oracle="""
    WITH it AS (
      SELECT user_id,
             event_type || '@' || CAST(dayofweek(ts) + 1 AS VARCHAR) AS item
      FROM events
    ), pop AS (
      SELECT item, COUNT(*) AS n FROM it GROUP BY item
    ), u AS (
      SELECT DISTINCT user_id FROM it WHERE user_id < 20
    ), seen AS (
      SELECT DISTINCT user_id, item FROM it WHERE user_id < 20
    ), cand AS (
      SELECT u.user_id, p.item, p.n
      FROM u CROSS JOIN pop p
      WHERE NOT EXISTS (
        SELECT 1 FROM seen s
        WHERE s.user_id = u.user_id AND s.item = p.item)
    )
    SELECT user_id, item, CAST(n AS BIGINT) AS popularity, rk FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY n DESC, item ASC) AS rk
      FROM cand
    ) WHERE rk <= 3
    """,
)
def q198(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.concat(F.col("event_type"), F.lit("@"),
                 F.dayofweek("ts").cast("string")).alias("item"),
    )
    pop = ev.groupBy("item").agg(F.count("*").alias("n"))
    mine = ev.filter(F.col("user_id") < 20)
    users = mine.select("user_id").distinct()
    seen = mine.select("user_id", "item").distinct()
    cand = (
        users.crossJoin(F.broadcast(pop))
        .join(seen, ["user_id", "item"], "left_anti")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("item").asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("user_id", "item",
                F.col("n").cast("bigint").alias("popularity"), "rk")
    )


# --------------------------------------------------------------------------
# q199 — mergeable moment state (Chan/Welford): split the stream into
# two halves, reduce each to (n, mean, M2) partials, MERGE with the
# parallel-variance formula, and emit merged == direct as a checked
# column — the additive-state algebra every incremental aggregate view
# and every partial aggregation relies on, here verified end-to-end in
# one query. All arithmetic identical on both engines.
# --------------------------------------------------------------------------
@register(
    "q199_welford_merge",
    oracle="""
    WITH halves AS (
      SELECT event_type, event_id % 2 AS half,
             COUNT(*) AS n, AVG(value) AS mean,
             SUM(value * value) - COUNT(*) * AVG(value) * AVG(value) AS m2
      FROM events GROUP BY event_type, event_id % 2
    ), merged AS (
      SELECT a.event_type,
             a.n + b.n AS n,
             (a.n * a.mean + b.n * b.mean) / (a.n + b.n) AS mean,
             a.m2 + b.m2
               + (a.mean - b.mean) * (a.mean - b.mean)
                 * a.n * b.n / (a.n + b.n) AS m2
      FROM halves a JOIN halves b
        ON a.event_type = b.event_type AND a.half = 0 AND b.half = 1
    ), direct AS (
      SELECT event_type, COUNT(*) AS n, AVG(value) AS mean,
             SUM(value * value) - COUNT(*) * AVG(value) * AVG(value) AS m2
      FROM events GROUP BY event_type
    )
    SELECT m.event_type,
           CAST(m.n AS BIGINT) AS n,
           round(m.mean, 6) AS mean,
           round(m.m2 / (m.n - 1), 6) AS sample_var,
           (abs(m.mean - d.mean) < 1e-9
            AND abs(m.m2 - d.m2) / greatest(abs(d.m2), 1.0) < 1e-9)
             AS merge_consistent
    FROM merged m JOIN direct d ON m.event_type = d.event_type
    """,
)
def q199(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    halves = ev.groupBy(
        "event_type", (F.col("event_id") % 2).alias("half")
    ).agg(
        F.count("*").alias("n"), F.avg("value").alias("mean"),
        (F.sum(F.col("value") * F.col("value"))
         - F.count("*") * F.avg("value") * F.avg("value")).alias("m2"),
    ).localCheckpoint(eager=False)  # both half filters read it
    a = halves.filter(F.col("half") == 0).alias("a")
    b = halves.filter(F.col("half") == 1).alias("b")
    na, nb = F.col("a.n"), F.col("b.n")
    ma, mb = F.col("a.mean"), F.col("b.mean")
    merged = a.join(b, F.col("a.event_type") == F.col("b.event_type")).select(
        F.col("a.event_type").alias("event_type"),
        (na + nb).alias("n"),
        ((na * ma + nb * mb) / (na + nb)).alias("mean"),
        (F.col("a.m2") + F.col("b.m2")
         + (ma - mb) * (ma - mb) * na * nb / (na + nb)).alias("m2"),
    )
    direct = ev.groupBy("event_type").agg(
        F.count("*").alias("dn"), F.avg("value").alias("dmean"),
        (F.sum(F.col("value") * F.col("value"))
         - F.count("*") * F.avg("value") * F.avg("value")).alias("dm2"),
    )
    j = merged.join(direct, "event_type")
    return j.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round("mean", 6).alias("mean"),
        F.round(F.col("m2") / (F.col("n") - 1), 6).alias("sample_var"),
        ((F.abs(F.col("mean") - F.col("dmean")) < 1e-9)
         & (F.abs(F.col("m2") - F.col("dm2"))
            / F.greatest(F.abs(F.col("dm2")), F.lit(1.0)) < 1e-9))
        .alias("merge_consistent"),
    )


# --------------------------------------------------------------------------
# q275 — BENFORD first-digit audit on order totals (the classic fraud /
# data-fabrication screen). First significant digit extracted in exact
# integer space (floor(price*100) cents -> first char of the decimal
# string — Spark's bigint cast truncates while DuckDB's rounds, so
# BOTH sides floor explicitly); expected Benford shares log10(1+1/d)
# are computed ONCE in Python and inlined as identical literals on
# both sides; observed share and the chi-square contribution
# (n - N*p)^2 / (N*p) are fixed-order scalar IEEE ops on exact
# integers. One fact-scale hash agg to 9 rows + a broadcast 1-row
# total — nothing else moves.
# --------------------------------------------------------------------------
import math as _math

_BENFORD_P = {d: _math.log10(1 + 1 / d) for d in range(1, 10)}


@register(
    "q275_benford_digits",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0
    ), obs AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY 1
    ), tot AS (SELECT SUM(n) AS total FROM obs),
    exp AS (
      SELECT * FROM (VALUES
        {", ".join(f"({d}, CAST({_BENFORD_P[d]!r} AS DOUBLE))"
                   for d in range(1, 10))}) AS t(digit, p)
    )
    SELECT e.digit, COALESCE(n, 0) AS n,
           round(CAST(COALESCE(n, 0) AS DOUBLE) / CAST(total AS DOUBLE), 6)
             AS observed_share,
           round(p, 6) AS benford_share,
           round((CAST(COALESCE(n, 0) AS DOUBLE)
                  - CAST(total AS DOUBLE) * p)
                 * (CAST(COALESCE(n, 0) AS DOUBLE)
                    - CAST(total AS DOUBLE) * p)
                 / (CAST(total AS DOUBLE) * p), 6) AS chi2_term
    FROM exp e LEFT JOIN obs ON obs.digit = e.digit, tot
    ORDER BY e.digit
    """,
)
def q275(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    obs = (
        orders.filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                F.floor(F.col("o_totalprice") * 100).cast("bigint")
                .cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit").agg(F.count("*").cast("bigint").alias("n"))
        .localCheckpoint(eager=False)  # total probe + left join
    )
    tot = obs.agg(F.sum("n").alias("total"))
    # single-slice parallelize: a local createDataFrame(list) pays a
    # multi-second Python-task round per execution (ROADMAP perf note)
    exp = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(d, _BENFORD_P[d]) for d in range(1, 10)], 1),
        "digit int, p double")
    nn = F.coalesce(F.col("n"), F.lit(0)).cast("double")
    ep = F.col("total").cast("double") * F.col("p")
    return (
        F.broadcast(exp).join(obs, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
            F.round(nn / F.col("total").cast("double"), 6)
              .alias("observed_share"),
            F.round(F.col("p"), 6).alias("benford_share"),
            F.round((nn - ep) * (nn - ep) / ep, 6).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# --------------------------------------------------------------------------
# q300 — REFERENTIAL-INTEGRITY AUDIT: every declared FK edge of the
# star schema checked in one pass each — row count, orphan rows (FK
# value absent from the parent key set), NULL FKs, and distinct orphan
# key count. Each edge is child LEFT JOIN distinct-parent-keys: dims
# broadcast, the two fact-scale edges (lineitem->orders/part/supplier)
# shuffle on the natural key and AQE coalesces. The edges run as
# independent branches of one UNION (Catalyst schedules them in
# parallel); a healthy warehouse reports zeros, and the audit proves
# the zeros rather than assuming them. Oracle: the same seven LEFT
# JOINs written longhand.
# --------------------------------------------------------------------------
_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


@register(
    "q300_referential_audit",
    oracle=" UNION ALL ".join(
        f"""SELECT '{child}.{fk}->{parent}' AS edge,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) FILTER (p.{pk} IS NULL AND c.{fk} IS NOT NULL)
                  AS BIGINT) AS n_orphans,
             CAST(COUNT(*) FILTER (c.{fk} IS NULL) AS BIGINT) AS n_null_fk,
             CAST(COUNT(DISTINCT CASE WHEN p.{pk} IS NULL
                                      THEN c.{fk} END) AS BIGINT)
               AS n_orphan_keys
            FROM {child} c LEFT JOIN
              (SELECT DISTINCT {pk} FROM {parent}) p ON c.{fk} = p.{pk}"""
        for child, fk, parent, pk in _FK_EDGES
    ) + " ORDER BY edge",
)
def q300(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for child, fk, parent, pk in _FK_EDGES:
        cdf = load(spark, sf_dir, child).select(fk)
        pdf = load(spark, sf_dir, parent).select(pk).distinct()
        if parent not in ("orders", "part", "supplier"):
            pdf = F.broadcast(pdf)
        orphan = F.col(pk).isNull() & F.col(fk).isNotNull()
        edge = (
            cdf.join(pdf, cdf[fk] == pdf[pk], "left")
            .agg(
                F.lit(f"{child}.{fk}->{parent}").alias("edge"),
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(orphan.cast("int")).cast("bigint").alias("n_orphans"),
                F.sum(F.col(fk).isNull().cast("int")).cast("bigint")
                .alias("n_null_fk"),
                F.countDistinct(F.when(F.col(pk).isNull(), F.col(fk)))
                .cast("bigint").alias("n_orphan_keys"))
        )
        out = edge if out is None else out.unionByName(edge)
    return out.orderBy("edge")


# --------------------------------------------------------------------------
# q309 — TABLE INTEGRITY DIGEST (homomorphic set-hash Merkle): the
# verify-your-100TB-copy primitive. Every row maps to a 60-bit md5 of
# its canonical '|'-joined INTEGER encoding (cents, not doubles —
# double->string formatting differs across engines), leaves accumulate
# per key-bucket as an order-INDEPENDENT exact DECIMAL(38,0) sum (O(1)
# state per bucket — unlike an ordered Merkle chain, a commutative sum
# needs no sort and distributes perfectly; Btrfs/ZFS-style set
# checksumming), and the root is the md5 of the 64 leaf digests in
# bucket order. Any flipped bit, lost row, or duplicated row moves the
# leaf sum and therefore the root. Output = 64 leaves + the root row
# (bucket = -1).
# --------------------------------------------------------------------------
_MERKLE_ROW = ("CAST(l_orderkey AS VARCHAR) || '|' || "
               "CAST(l_linenumber AS VARCHAR) || '|' || "
               "CAST(CAST(floor(l_extendedprice * 100) AS BIGINT)"
               " AS VARCHAR) || '|' || "
               "CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)")


@register(
    "q309_table_digest",
    oracle=f"""
    WITH r AS (
      SELECT l_orderkey % 64 AS bucket,
             {md5_int64_sql(_MERKLE_ROW)} AS h
      FROM lineitem
    ), leaf AS (
      SELECT bucket, COUNT(*) AS n_rows,
             CAST(SUM(CAST(h AS DECIMAL(38,0))) AS VARCHAR) AS digest
      FROM r GROUP BY bucket
    ), root AS (
      SELECT CAST(-1 AS BIGINT) AS bucket,
             SUM(n_rows) AS n_rows,
             md5(string_agg(digest, '|' ORDER BY bucket)) AS digest
      FROM leaf
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(n_rows AS BIGINT) AS n_rows, digest
    FROM leaf
    UNION ALL SELECT bucket, CAST(n_rows AS BIGINT), digest FROM root
    ORDER BY bucket
    """,
)
def q309(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_int64

    li = load(spark, sf_dir, "lineitem")
    row_str = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint")
        .cast("string"),
        F.col("l_quantity").cast("bigint").cast("string"))
    leaf = (
        li.select((F.col("l_orderkey") % 64).alias("bucket"),
                  md5_int64(row_str).alias("h"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_rows"),
             F.sum(F.col("h").cast("decimal(38,0)")).cast("string")
             .alias("digest"))
    )
    root = leaf.agg(
        F.lit(-1).cast("bigint").alias("bucket"),
        F.sum("n_rows").alias("n_rows"),
        F.md5(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bucket", "digest"))),
                lambda x: x["digest"]), "|")).alias("digest"))
    return (
        leaf.select(F.col("bucket").cast("bigint").alias("bucket"),
                    F.col("n_rows").cast("bigint").alias("n_rows"),
                    "digest")
        .unionByName(root.select(
            "bucket", F.col("n_rows").cast("bigint").alias("n_rows"),
            "digest"))
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# q324 — ANALYZE-TABLE COLUMN STATISTICS (the CBO-feeding profile every
# engine ships: Spark's ANALYZE TABLE ... COMPUTE STATISTICS FOR
# COLUMNS): per lineitem column — rows, nulls, exact NDV, min/max.
# Numerics (and timestamps via exact epoch seconds) report through
# DOUBLE min/max; strings report through string min/max — never a
# double->string format round-trip, which differs across engines. Each
# column's profile is an independent scalar aggregate branch of one
# UNION (Catalyst shares the scan); at warehouse scale NDV would drop
# to approx_count_distinct (HLL) — exact here because the oracle is.
# --------------------------------------------------------------------------
_PROFILE_COLS = [
    ("l_orderkey", "num"), ("l_partkey", "num"), ("l_suppkey", "num"),
    ("l_linenumber", "num"), ("l_quantity", "num"),
    ("l_extendedprice", "num"), ("l_discount", "num"), ("l_tax", "num"),
    ("l_returnflag", "str"), ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]


def _profile_sql(col: str, kind: str) -> str:
    if kind == "num":
        mn, mx = f"CAST(MIN({col}) AS DOUBLE)", f"CAST(MAX({col}) AS DOUBLE)"
        ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
    elif kind == "ts":
        mn, mx = f"epoch(MIN({col}))", f"epoch(MAX({col}))"
        ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
    else:
        mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
        ms, xs = f"MIN({col})", f"MAX({col})"
    return f"""SELECT '{col}' AS column_name,
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_null,
        CAST(COUNT(DISTINCT {col}) AS BIGINT) AS ndv,
        {mn} AS min_num, {mx} AS max_num, {ms} AS min_str, {xs} AS max_str
      FROM lineitem"""


@register(
    "q324_analyze_stats",
    oracle=" UNION ALL ".join(
        _profile_sql(c, k) for c, k in _PROFILE_COLS
    ) + " ORDER BY column_name",
)
def q324(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    out = None
    for col, kind in _PROFILE_COLS:
        c = F.col(col)
        if kind == "num":
            mn, mx = F.min(c).cast("double"), F.max(c).cast("double")
            ms = xs = F.lit(None).cast("string")
        elif kind == "ts":
            # parquet TIMESTAMP_NTZ refuses numeric casts; the session tz
            # is pinned UTC so TIMESTAMP is a no-op on the instant
            mn = F.min(c).cast("timestamp").cast("double")
            mx = F.max(c).cast("timestamp").cast("double")
            ms = xs = F.lit(None).cast("string")
        else:
            mn = mx = F.lit(None).cast("double")
            ms, xs = F.min(c), F.max(c)
        row = li.agg(
            F.lit(col).alias("column_name"),
            F.count("*").cast("bigint").alias("n_rows"),
            (F.count("*") - F.count(c)).cast("bigint").alias("n_null"),
            F.countDistinct(c).cast("bigint").alias("ndv"),
            mn.alias("min_num"), mx.alias("max_num"),
            ms.alias("min_str"), xs.alias("max_str"))
        out = row if out is None else out.unionByName(row)
    return out.orderBy("column_name")


# --------------------------------------------------------------------------
# q348 — CIDR CONTAINMENT JOIN (firewall-log / geo-IP enrichment): each
# event gets a synthetic 32-bit IP (md5-seeded); the rule table is 9
# fixed CIDR blocks of mixed prefix length. Containment = integer
# SHIFT equality — ip >> (32 - len) == prefix >> (32 - len) — an
# equi-join per prefix LENGTH against the broadcast rule table (the
# standard longest-prefix decomposition: one hash join per distinct
# length, never a theta join); longest match wins via max(struct(len,
# rule)). Unmatched IPs fall through as 'unrouted'. Pure integers.
# --------------------------------------------------------------------------
_CIDR_RULES = [  # (name, a, b, c, d, prefix_len)
    ("corp-10/8", 10, 0, 0, 0, 8),
    ("corp-10.1/16", 10, 1, 0, 0, 16),
    ("dmz-192.168/16", 192, 168, 0, 0, 16),
    ("dmz-192.168.7/24", 192, 168, 7, 0, 24),
    ("cloud-52/8", 52, 0, 0, 0, 8),
    ("cloud-52.16/12", 52, 16, 0, 0, 12),
    ("cdn-151.101/16", 151, 101, 0, 0, 16),
    ("lab-172.16/12", 172, 16, 0, 0, 12),
    ("vpn-100.64/10", 100, 64, 0, 0, 10),
]


def _cidr_rows() -> list[tuple[str, int, int]]:
    out = []
    for name, a, b, c, d, ln in _CIDR_RULES:
        ip = (a << 24) | (b << 16) | (c << 8) | d
        out.append((name, ip >> (32 - ln), ln))
    # The when-chain LPM equals max(struct(len, name)) ONLY while
    # same-length prefixes are disjoint — assert the invariant so a
    # future rule edit that overlaps within a length trips immediately
    # instead of silently changing tie semantics (ADVICE r08).
    assert len({(ln, pfx) for _, pfx, ln in out}) == len(out), \
        "_CIDR_RULES: duplicate (prefix, length) — same-length rules " \
        "must be disjoint for first-match == longest-prefix argmax"
    return out


@register(
    "q348_cidr_join",
    oracle=f"""
    WITH ev AS (
      SELECT event_id,
             {md5_int64_sql("CAST(event_id AS VARCHAR) || ':ip'")}
               % 4294967296 AS ip
      FROM events
    ), rules(name, pfx, len) AS (
      VALUES {", ".join(f"('{n}', {p}, {l})" for n, p, l in _cidr_rows())}
    ), hits AS (
      SELECT ev.event_id, r.name, r.len,
             row_number() OVER (PARTITION BY ev.event_id
                                ORDER BY r.len DESC) AS rk
      FROM ev JOIN rules r ON ev.ip // (1 << (32 - r.len)) = r.pfx
    ), best AS (
      SELECT event_id, name, len FROM hits WHERE rk = 1
    ), routed AS (
      SELECT COALESCE(b.name, 'unrouted') AS rule,
             COALESCE(b.len, 0) AS match_len
      FROM ev LEFT JOIN best b USING (event_id)
    )
    SELECT rule, CAST(match_len AS BIGINT) AS match_len,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM routed GROUP BY rule, match_len ORDER BY rule
    """,
)
def q348(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_int64

    ev = load(spark, sf_dir, "events").select(
        (md5_int64(F.concat(F.col("event_id").cast("string"),
                            F.lit(":ip"))) % 4294967296).alias("ip"))
    # the rule table is a fixed 9-row literal (value-domain-bounded by
    # construction), so the longest-prefix match compiles to ONE
    # when-chain ordered by prefix length DESC — at most one rule per
    # length can match (prefixes at a length are distinct), so first
    # match == max(struct(len, name)). One map-only pass + a <= 10-key
    # map-side-combinable agg replaces the per-length join legs, the
    # event-keyed argmax shuffle, and the corpus-sized left join.
    match = None
    for name, pfx, ln in sorted(_cidr_rows(), key=lambda r: -r[2]):
        cond = (F.col("ip") / (1 << (32 - ln))).cast("bigint") == pfx
        hit = F.struct(F.lit(name).alias("rule"),
                       F.lit(ln).alias("match_len"))
        match = F.when(cond, hit) if match is None else match.when(
            cond, hit)
    routed = ev.select(F.coalesce(
        match, F.struct(F.lit("unrouted").alias("rule"),
                        F.lit(0).alias("match_len"))).alias("m"))
    return (routed.groupBy(F.col("m.rule").alias("rule"),
                           F.col("m.match_len").alias("match_len"))
            .agg(F.count("*").cast("bigint").alias("n_events"))
            .select("rule", F.col("match_len").cast("bigint")
                    .alias("match_len"), "n_events")
            .orderBy("rule"))


# --------------------------------------------------------------------------
# q352 — SLO BURN-RATE ALERT (the Google-SRE multiwindow policy): with
# a 99% success SLO, the burn rate is bad-fraction / error-budget over
# a 1 h and a 6 h trailing window (anchored at max(ts) — deterministic);
# the alert fires only when BOTH windows burn hot (fast-burn 14.4x +
# 6x confirmation), which suppresses blips. "Bad" is the deterministic
# event_id % 100 < 5 class. Two filtered integer aggregates against a
# broadcast anchor scalar; every ratio is one fixed-order division.
# --------------------------------------------------------------------------
_SLO_TARGET = 0.99


@register(
    "q352_slo_burn",
    oracle=f"""
    WITH anchor AS (
      SELECT MAX(ts) AS hi FROM events
    ), w AS (
      SELECT CASE WHEN ts > hi - INTERVAL 1 HOUR THEN 1 ELSE 0 END
               AS in1,
             CASE WHEN ts > hi - INTERVAL 6 HOUR THEN 1 ELSE 0 END
               AS in6,
             CASE WHEN event_id % 100 < 5 THEN 1 ELSE 0 END AS bad
      FROM events, anchor
    ), s AS (
      SELECT SUM(in1) AS n1, SUM(in1 * bad) AS b1,
             SUM(in6) AS n6, SUM(in6 * bad) AS b6
      FROM w
    )
    SELECT CAST(n1 AS BIGINT) AS n_1h, CAST(b1 AS BIGINT) AS bad_1h,
           CAST(n6 AS BIGINT) AS n_6h, CAST(b6 AS BIGINT) AS bad_6h,
           round(CAST(b1 AS DOUBLE) / n1 / {1 - _SLO_TARGET}, 6)
             AS burn_1h,
           round(CAST(b6 AS DOUBLE) / n6 / {1 - _SLO_TARGET}, 6)
             AS burn_6h,
           (CAST(b1 AS DOUBLE) / n1 / {1 - _SLO_TARGET} > 14.4
            AND CAST(b6 AS DOUBLE) / n6 / {1 - _SLO_TARGET} > 6.0)
             AS page
    FROM s
    """,
)
def q352(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("hi"))
    w = ev.crossJoin(F.broadcast(anchor)).select(
        (F.col("ts") > F.col("hi") - F.expr("INTERVAL 1 HOUR"))
        .cast("int").alias("in1"),
        (F.col("ts") > F.col("hi") - F.expr("INTERVAL 6 HOUR"))
        .cast("int").alias("in6"),
        (F.col("event_id") % 100 < 5).cast("int").alias("bad"))
    s = w.agg(F.sum("in1").alias("n1"),
              F.sum(F.col("in1") * F.col("bad")).alias("b1"),
              F.sum("in6").alias("n6"),
              F.sum(F.col("in6") * F.col("bad")).alias("b6"))
    budget = F.lit(1 - _SLO_TARGET)
    burn1 = F.col("b1").cast("double") / F.col("n1") / budget
    burn6 = F.col("b6").cast("double") / F.col("n6") / budget
    return s.select(
        F.col("n1").cast("bigint").alias("n_1h"),
        F.col("b1").cast("bigint").alias("bad_1h"),
        F.col("n6").cast("bigint").alias("n_6h"),
        F.col("b6").cast("bigint").alias("bad_6h"),
        F.round(burn1, 6).alias("burn_1h"),
        F.round(burn6, 6).alias("burn_6h"),
        ((burn1 > 14.4) & (burn6 > 6.0)).alias("page"))


# --------------------------------------------------------------------------
# q358 — DUPLICATE-PAYMENT SCREEN (the AP-fraud / double-charge audit):
# the payment ledger is orders plus a deterministic double-submission
# of every 97th order (re-keyed +10^9 — the classic resubmitted
# invoice); two different payments by the SAME customer for the SAME
# exact amount on the SAME day are flagged. The candidate generator is
# a pure equi-self-join on (custkey, cents, day) — blocking on the
# full composite key, so the join output is exactly the suspicious
# set, never a cross product. Exact integers; pairs emitted once.
# --------------------------------------------------------------------------
@register(
    "q358_duplicate_payments",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, o_custkey AS c,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS d
      FROM orders
    ), o AS (
      SELECT * FROM base
      UNION ALL
      SELECT k + 1000000000, c, cents, d FROM base WHERE k % 97 = 0
    ), pairs AS (
      SELECT a.c, a.cents, a.d, a.k AS order_a, b.k AS order_b
      FROM o a JOIN o b
        ON b.c = a.c AND b.cents = a.cents AND b.d = a.d AND a.k < b.k
    )
    SELECT CAST(c AS BIGINT) AS custkey,
           CAST(cents AS BIGINT) AS cents, d AS day,
           CAST(order_a AS BIGINT) AS order_a,
           CAST(order_b AS BIGINT) AS order_b
    FROM pairs ORDER BY custkey, cents, order_a, order_b
    """,
)
def q358(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("k"), F.col("o_custkey").alias("c"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint")
        .alias("cents"),
        F.to_date("o_orderdate").alias("d"))
    o = base.unionByName(
        base.filter(F.col("k") % 97 == 0)
        .select((F.col("k") + 1000000000).alias("k"), "c", "cents", "d"))
    b = o.select(F.col("k").alias("k2"), "c", "cents", "d")
    return (
        o.join(b, ["c", "cents", "d"])
        .filter(F.col("k") < F.col("k2"))
        .select(F.col("c").cast("bigint").alias("custkey"),
                F.col("cents").cast("bigint").alias("cents"),
                F.col("d").alias("day"),
                F.col("k").cast("bigint").alias("order_a"),
                F.col("k2").cast("bigint").alias("order_b"))
        .orderBy("custkey", "cents", "order_a", "order_b")
    )

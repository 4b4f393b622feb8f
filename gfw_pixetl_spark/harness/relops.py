"""Relational-surface harness queries, wave 2: multi-level aggregation
(ROLLUP), pivot, event debouncing, and conversion-funnel labeling — the
standard OLAP/event-pipeline shapes over the events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, register

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


# --------------------------------------------------------------------------
# q67 — ROLLUP: per-(lang, source) doc stats with subtotal + grand-total
# levels; one pass, Spark expands grouping sets without rescanning.
# --------------------------------------------------------------------------
@register(
    "q67_rollup",
    oracle="""
    SELECT lang, source, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY ROLLUP(lang, source)
    """,
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.rollup("lang", "source").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# q68 — pivot: per-user event-type counts as columns (fixed category list
# so the plan needs no discovery pass and the schema is deterministic).
# --------------------------------------------------------------------------
@register(
    "q68_pivot",
    oracle=f"""
    SELECT user_id,
           {", ".join(
               f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
               f" AS BIGINT) AS {t}" for t in EVENT_TYPES
           )}
    FROM events GROUP BY user_id
    """,
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES],
    )


# --------------------------------------------------------------------------
# q69 — debounce: drop events arriving < 60 s after the previous event of
# the same (user, type) — lag-window throttle, one shuffle.
# --------------------------------------------------------------------------
@register(
    "q69_debounce",
    oracle="""
    SELECT event_id, user_id, event_type, ts FROM (
      SELECT event_id, user_id, event_type, ts,
             epoch(ts) - epoch(lag(ts) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id)) AS gap
      FROM events
    ) WHERE gap IS NULL OR gap >= 60
    """,
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts")).over(w).cast("double")
    return (
        ev.withColumn("gap", gap)
        .filter(F.col("gap").isNull() | (F.col("gap") >= 60))
        .select("event_id", "user_id", "event_type", "ts")
    )


# --------------------------------------------------------------------------
# q70 — conversion funnel: label each view with whether the user purchased
# within 1 h at-or-after it. Spark side = FORWARD as-of join (the as-of
# operator on negated time — earliest purchase >= view), so the plan is
# one key-partitioned sort pass, not a per-pair range join. Oracle = the
# declarative EXISTS.
# --------------------------------------------------------------------------
@register(
    "q70_funnel",
    oracle="""
    SELECT v.event_id, v.user_id, epoch(v.ts) AS view_ts,
           EXISTS (
             SELECT 1 FROM events p
             WHERE p.event_type = 'purchase' AND p.user_id = v.user_id
               AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
           ) AS converted
    FROM events v WHERE v.event_type = 'view'
    """,
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id",
        (-F.col("ts").cast("double")).alias("tneg"),
        F.col("ts").cast("double").alias("view_ts"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", (-F.col("ts").cast("double")).alias("tneg"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    j = asof_join(views, purchases, keys=["user_id"], ts_col="tneg")
    converted = (
        F.col("hit_r").isNotNull()
        & ((-F.col("tneg_r")) - F.col("view_ts") <= 3600.0)
    )
    return j.select(
        "event_id", "user_id", "view_ts", converted.alias("converted")
    )


# --------------------------------------------------------------------------
# q82 — cohort retention: users bucketed by first-event month, distinct
# actives per (cohort, month-age). The user-firsts dim is tiny relative
# to the event stream, so it broadcasts back onto events — no shuffle of
# the fact side beyond the final (cohort, age) aggregation.
# --------------------------------------------------------------------------
@register(
    "q82_cohort_retention",
    oracle="""
    WITH f AS (SELECT user_id, MIN(ts) AS fts FROM events GROUP BY 1)
    SELECT strftime(f.fts, '%Y-%m') AS cohort,
           (year(e.ts) * 12 + month(e.ts))
             - (year(f.fts) * 12 + month(f.fts)) AS age_months,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("fts"))
    mi = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    return (
        ev.join(F.broadcast(firsts), "user_id")
        .groupBy(
            F.date_format("fts", "yyyy-MM").alias("cohort"),
            (mi(F.col("ts")) - mi(F.col("fts"))).alias("age_months"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


# --------------------------------------------------------------------------
# q93 — full-outer orphan audit: BUILDING-segment customers vs order
# aggregates, both directions of missingness surfaced. The aggregate
# side shrinks to per-key rows before the join, so the full-outer is a
# key-partitioned merge of two pre-reduced sides.
# --------------------------------------------------------------------------
@register(
    "q93_full_outer",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_mktsegment = 'BUILDING'
    ),
    o AS (
      SELECT o_custkey, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
           CASE WHEN c.c_custkey IS NULL THEN 'orders_only'
                WHEN o.o_custkey IS NULL THEN 'cust_only'
                ELSE 'both' END AS side,
           COALESCE(o.n_orders, 0) AS n_orders
    FROM c FULL JOIN o ON c.c_custkey = o.o_custkey
    """,
)
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_acctbal")
    )
    agg = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    j = cust.join(agg, cust.c_custkey == agg.o_custkey, "full_outer")
    side = (
        F.when(F.col("c_custkey").isNull(), "orders_only")
        .when(F.col("o_custkey").isNull(), "cust_only")
        .otherwise("both")
    )
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        side.alias("side"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


# --------------------------------------------------------------------------
# q94 — ranking-window surface: ntile / percent_rank / cume_dist / lead
# gap per (user, ts) — one sort per user partition covers all four.
# --------------------------------------------------------------------------
@register(
    "q94_window_extras",
    oracle="""
    SELECT event_id, user_id,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           epoch(lead(ts) OVER w) - epoch(ts) AS gap_to_next
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        (
            F.lead("ts").over(w).cast("double")
            - F.col("ts").cast("double")
        ).alias("gap_to_next"),
    )


# --------------------------------------------------------------------------
# q95 — GROUPING SETS with grouping_id: per-lang and per-source doc
# totals plus the grand total in one pass, disambiguated by the
# grouping bitmask (NULL-as-value vs NULL-as-aggregated).
# --------------------------------------------------------------------------
@register(
    "q95_grouping_sets",
    oracle="""
    SELECT lang, source, CAST(GROUPING(lang, source) AS BIGINT) AS gid,
           COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY GROUPING SETS ((lang), (source), ())
    """,
)
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents_v")
    return spark.sql(
        """
        SELECT lang, source, CAST(grouping_id(lang, source) AS BIGINT)
                 AS gid,
               COUNT(*) AS n, SUM(n_chars) AS total_chars
        FROM documents_v GROUP BY GROUPING SETS ((lang), (source), ())
        """
    )


# --------------------------------------------------------------------------
# q84 — stream-stream interval join (attribution): views joined to same-
# user purchases within 24h, both sides streaming with watermark-bounded
# state. Oracle is the equivalent batch interval join.
# --------------------------------------------------------------------------
@register(
    "q84_stream_stream_join",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
           v.ts AS view_ts, p.ts AS purchase_ts
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 24 HOUR
    """,
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import run_view_purchase_join_once

    return run_view_purchase_join_once(spark, f"{sf_dir}/events.parquet")


# --------------------------------------------------------------------------
# q85 — CDC upsert compaction: base snapshot (customer, version 0) +
# change log (orders as keyed upserts/deletes, version = order key) →
# latest row per surviving key via map-side-combinable argmax — no
# window/sort. Filled orders ('F') model deletes; a later order
# resurrects the key (standard CDC latest-wins).
# --------------------------------------------------------------------------
@register(
    "q85_cdc_compaction",
    oracle="""
    WITH ch AS (
      SELECT c_custkey AS key, c_acctbal AS val,
             CAST(0 AS BIGINT) AS version, 'U' AS op
      FROM customer
      UNION ALL
      SELECT o_custkey, o_totalprice, o_orderkey,
             CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END
      FROM orders
    )
    SELECT key, arg_max(val, version) AS val, MAX(version) AS version,
           COUNT(*) AS n_versions
    FROM ch GROUP BY key
    HAVING arg_max(op, version) <> 'D'
    """,
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cdc import compact_latest

    base = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("val"),
        F.lit(0).cast("long").alias("version"),
        F.lit("U").alias("op"),
    )
    changes = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_totalprice").alias("val"),
        F.col("o_orderkey").alias("version"),
        F.when(F.col("o_orderstatus") == "F", "D").otherwise("U").alias("op"),
    )
    return compact_latest(base.unionByName(changes))


# --------------------------------------------------------------------------
# q98 — event-transition matrix: counts of (event_type -> next event_type)
# per user-ordered stream — first-order Markov structure of sessions.
# One window sort per user partition, then a partial-aggregating count.
# --------------------------------------------------------------------------
@register(
    "q98_transitions",
    oracle="""
    SELECT event_type, next_type, COUNT(*) AS n
    FROM (
      SELECT event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ) WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_type", F.lead("event_type").over(w).alias("next_type")
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# q99 — sweep-line concurrency: treat each event as a 5-minute activity
# interval and compute the number of concurrently-active intervals per
# event type at every boundary instant. The classic interval-analytics
# sweep: union +1/-1 deltas, order within the series, running sum. One
# window sort per (small) series partition; deltas pre-aggregate per
# instant so the running sum sees at most one row per boundary.
# --------------------------------------------------------------------------
@register(
    "q99_concurrency",
    oracle="""
    WITH pts AS (
      SELECT event_type, epoch(ts) AS t, 1 AS delta FROM events
      UNION ALL
      SELECT event_type, epoch(ts) + 300, -1 FROM events
    ),
    agg AS (
      SELECT event_type, t, CAST(SUM(delta) AS BIGINT) AS d
      FROM pts GROUP BY 1, 2
    )
    SELECT event_type, t,
           CAST(SUM(d) OVER (
             PARTITION BY event_type ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS active
    FROM agg
    """,
)
def q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    t = F.col("ts").cast("double")
    pts = ev.select(
        "event_type", t.alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        ev.select(
            "event_type", (t + 300).alias("t"), F.lit(-1).alias("delta")
        )
    )
    agg = pts.groupBy("event_type", "t").agg(
        F.sum("delta").alias("d")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return agg.select(
        "event_type", "t", F.sum("d").over(w).alias("active")
    )


# --------------------------------------------------------------------------
# q100 — salted skew join: events (5 hot event_type keys — a worst-case
# Zipf head) joined to a per-type dim through operators/skew.py, which
# spreads each hot key over 8 reducers and replicates the dim 8x. The
# oracle is the plain join — salting must be semantically invisible.
# --------------------------------------------------------------------------
@register(
    "q100_salted_join",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT event_type,
             CAST(length(event_type) AS BIGINT) AS type_len
      FROM events
    )
    SELECT e.event_id, e.event_type, d.type_len
    FROM events e JOIN dim d USING (event_type)
    """,
)
def q100(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    ev = load(spark, sf_dir, "events")
    dim = ev.select("event_type").distinct().withColumn(
        "type_len", F.length("event_type").cast("long")
    )
    return salted_join(
        ev.select("event_id", "event_type"), dim, "event_type", n_salts=8
    ).select("event_id", "event_type", "type_len")


# --------------------------------------------------------------------------
# q146 — behavioral path analysis: top event-type trigrams per user
# stream (two leads over the per-user order, then a count). The n-gram
# mining shape over sequences — windows stay user-partitioned; the final
# top-20 is a TakeOrdered, not a global sort.
# --------------------------------------------------------------------------
@register(
    "q146_event_trigrams",
    oracle="""
    WITH seq AS (
      SELECT event_type AS a,
             lead(event_type, 1) OVER w AS b,
             lead(event_type, 2) OVER w AS c
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT a, b, c, COUNT(*) AS n
    FROM seq WHERE b IS NOT NULL AND c IS NOT NULL
    GROUP BY a, b, c
    ORDER BY n DESC, a, b, c
    LIMIT 20
    """,
)
def q146(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    seq = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    )
    return (
        seq.filter(F.col("b").isNotNull() & F.col("c").isNotNull())
        .groupBy("a", "b", "c")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.col("n").desc(), F.col("a"), F.col("b"), F.col("c")
        )
        .limit(20)
    )


# --------------------------------------------------------------------------
# q147 — market-basket lift: part pairs co-bought in one order, scored
# by lift = P(ab) / (P(a)P(b)). The pair space is per-order (<= 21 pairs
# from 7 lines), never corpus-quadratic; marginals broadcast back.
# Restricted to pairs seen >= 3 times so the output is signal, not the
# tail.
# --------------------------------------------------------------------------
@register(
    "q147_basket_lift",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n_orders AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n FROM baskets
    ), pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS nab
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ), marg AS (
      SELECT l_partkey, COUNT(*) AS np FROM baskets GROUP BY 1
    )
    SELECT pa, pb, nab,
           round(CAST(nab AS DOUBLE) * n_orders.n
                 / (ma.np * CAST(mb.np AS DOUBLE)), 6) AS lift
    FROM pairs
    JOIN marg ma ON pa = ma.l_partkey
    JOIN marg mb ON pb = mb.l_partkey
    CROSS JOIN n_orders
    WHERE nab >= 3
    """,
)
def q147(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # ONE shuffle builds the per-order part set (<= 7 lines per order by
    # TPC-H construction); the pair space enumerates IN-ARRAY (the q341
    # basket-combinations shape) instead of a distinct + self-join —
    # two full-table shuffles gone. collect_set = the former DISTINCT;
    # sort_array makes every in-array pair (pa < pb) by construction.
    orders_parts = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .localCheckpoint(eager=False)  # pairs + marginals + order count
    )
    n_orders = orders_parts.agg(F.count("*").alias("n"))
    pair_expr = F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), "
        "y -> struct(x AS pa, y AS pb))))"
    )
    pairs = (
        orders_parts.select(F.explode(pair_expr).alias("pr"))
        .select("pr.pa", "pr.pb")
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("nab"))
        .filter(F.col("nab") >= 3)
    )
    marg = (
        orders_parts.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey").agg(F.count("*").alias("np"))
        .localCheckpoint(eager=False)  # joined as both ma and mb
    )
    ma = marg.select(F.col("l_partkey").alias("pa"), F.col("np").alias("na"))
    mb = marg.select(F.col("l_partkey").alias("pb"), F.col("np").alias("nb"))
    return (
        pairs.join(F.broadcast(ma), "pa")
        .join(F.broadcast(mb), "pb")
        .join(F.broadcast(n_orders))
        .select(
            "pa",
            "pb",
            "nab",
            F.round(
                F.col("nab").cast("double") * F.col("n")
                / (F.col("na") * F.col("nb").cast("double")),
                6,
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# q258 — stream-stream LEFT OUTER join: q84's attribution join plus the
# rows the inner join can't express — "which impressions never
# converted", emitted as NULL-padded rows when the watermark evicts
# their state. Determinism: the feed is the events table split into 4
# time-DISJOINT ascending drops (so nothing is ever late) plus a
# far-future sentinel drop (one unmatchable view + purchase) whose
# batch pushes the global watermark past every real view's expiry —
# the unmatched set is then exactly the batch LEFT JOIN's, independent
# of how earlier micro-batches interleaved. File order is forced with
# ascending mtimes; maxFilesPerTrigger=1. Sentinel rows never emit
# (nothing advances the watermark past THEM).
# --------------------------------------------------------------------------
def _outer_feed(spark: SparkSession, sf_dir: str) -> str:
    from .lakeops import _derived_dir

    def build(d: str) -> None:
        import datetime
        import os

        ev = load(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type")
        b = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")
                   ).collect()[0]  # bounded: 2 scalars
        n_real = 2
        span = (b.hi - b.lo) / n_real
        for i in range(n_real):
            lo = b.lo + i * span
            cond = ((F.col("ts") >= lo)
                    & (F.col("ts") < b.lo + (i + 1) * span)
                    if i < n_real - 1 else (F.col("ts") >= lo))
            ev.filter(cond).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(d, f"drop_{i}"))
        sent = spark.createDataFrame(
            [(-1, datetime.datetime(2100, 1, 1), -1, "view"),
             (-2, datetime.datetime(2100, 1, 1), -2, "purchase")],
            ev.schema).coalesce(1)
        sent.write.mode("overwrite").parquet(
            os.path.join(d, f"drop_{n_real}"))
        # force strictly ascending file mtimes = deterministic batch order
        t0 = 1_600_000_000
        for i in range(n_real + 1):
            dd = os.path.join(d, f"drop_{i}")
            for f in os.listdir(dd):
                os.utime(os.path.join(dd, f), (t0 + i, t0 + i))

    return _derived_dir(sf_dir, "ssouterfeed_r2", build)  # tag carries the layout rev (cache key lacks params)


@register(
    "q258_stream_outer_join",
    oracle="""
    WITH v AS (
      SELECT event_id AS view_id, user_id, ts FROM events
      WHERE event_type = 'view'
    ), p AS (
      SELECT event_id AS purchase_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
    ), j AS (
      SELECT v.view_id, p.purchase_id
      FROM v LEFT JOIN p
        ON v.user_id = p.user_id
       AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 24 HOUR
    )
    SELECT CAST(COUNT(*) FILTER (purchase_id IS NOT NULL) AS BIGINT)
             AS n_matched,
           CAST(COUNT(*) FILTER (purchase_id IS NULL) AS BIGINT)
             AS n_unmatched,
           CAST(COALESCE(SUM(view_id) FILTER (purchase_id IS NULL), 0)
                AS BIGINT) AS unmatched_view_sum,
           CAST(COALESCE(SUM(view_id + purchase_id)
                         FILTER (purchase_id IS NOT NULL), 0)
                AS BIGINT) AS matched_sum
    FROM j
    """,
)
def q258(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import run_view_purchase_left_outer_once

    feed = _outer_feed(spark, sf_dir)
    schema = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type").schema
    out = run_view_purchase_left_outer_once(spark, feed, schema)
    matched = F.col("purchase_id").isNotNull()
    return out.agg(
        F.sum(matched.cast("int")).cast("bigint").alias("n_matched"),
        F.sum((~matched).cast("int")).cast("bigint").alias("n_unmatched"),
        F.coalesce(F.sum(F.when(~matched, F.col("view_id"))), F.lit(0))
        .cast("bigint").alias("unmatched_view_sum"),
        F.coalesce(F.sum(F.when(matched,
                                F.col("view_id") + F.col("purchase_id"))),
                   F.lit(0)).cast("bigint").alias("matched_sum"),
    )


# --------------------------------------------------------------------------
# q265 — WATERMARK LATE-DATA DROP, made deterministic: the newer half
# of the events table arrives FIRST (setting the watermark to
# max(ts) − 30 min), the older half arrives second — now late — and
# only its rows whose 1-hour window is still live (window end >
# watermark) survive; a far-future sentinel batch then finalizes every
# real window so append mode emits each exactly once. The oracle
# computes the identical keep rule in closed form. This is the
# semantics q39 (complete mode) deliberately does NOT exercise: here
# the watermark actually discards input.
# --------------------------------------------------------------------------
def _late_feed(spark: SparkSession, sf_dir: str) -> str:
    from .lakeops import _derived_dir

    def build(d: str) -> None:
        import datetime
        import os

        ev = load(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type")
        b = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")
                   ).collect()[0]  # bounded: 2 scalars
        span_us = ((b.hi - b.lo).days * 86_400_000_000
                   + (b.hi - b.lo).seconds * 1_000_000
                   + (b.hi - b.lo).microseconds)
        # integer-microsecond midpoint — the oracle replays this exact
        # arithmetic (interval/2 halves differently across engines)
        mid = b.lo + datetime.timedelta(microseconds=span_us // 2)
        ev.filter(F.col("ts") >= mid).coalesce(1).write.mode(
            "overwrite").parquet(os.path.join(d, "drop_0"))
        # the TICK batch: state eviction runs at END of batch, so the
        # watermark set by drop_0 only evicts finalized windows during
        # this intermediate batch — late rows in drop_2 then hit
        # genuinely-gone state and are dropped on input
        tick = spark.createDataFrame(
            [(-1, b.hi + datetime.timedelta(minutes=1), -1, "tick")],
            ev.schema).coalesce(1)
        tick.write.mode("overwrite").parquet(os.path.join(d, "drop_1"))
        ev.filter(F.col("ts") < mid).coalesce(1).write.mode(
            "overwrite").parquet(os.path.join(d, "drop_2"))
        sent = spark.createDataFrame(
            [(-2, datetime.datetime(2100, 1, 1), -2, "tick")], ev.schema
        ).coalesce(1)
        sent.write.mode("overwrite").parquet(os.path.join(d, "drop_3"))
        t0 = 1_600_000_000
        for i in range(4):
            dd = os.path.join(d, f"drop_{i}")
            for f in os.listdir(dd):
                os.utime(os.path.join(dd, f), (t0 + i, t0 + i))

    return _derived_dir(sf_dir, "latefeed_r3", build)


@register(
    "q265_watermark_late_drop",
    oracle="""
    WITH bounds AS (
      SELECT MIN(ts) AS lo, MAX(ts) AS hi,
             make_timestamp(epoch_us(MIN(ts))
               + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2) AS mid
      FROM events
    ), kept AS (
      -- keep rule = the engine's eviction rule: newer half always;
      -- late (older-half) rows only where the 1-h window outlived the
      -- tick watermark hi + 1 min - 30 min
      SELECT date_trunc('hour', e.ts) AS bucket, e.event_type
      FROM events e, bounds b
      WHERE e.ts >= b.mid
         OR date_trunc('hour', e.ts) + INTERVAL 1 HOUR
            > b.hi + INTERVAL 1 MINUTE - INTERVAL 30 MINUTE
    )
    SELECT bucket, event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM kept GROUP BY 1, 2
    ORDER BY bucket, event_type
    """,
)
def q265(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import run_late_data_rollup_once

    feed = _late_feed(spark, sf_dir)
    schema = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type").schema
    out = run_late_data_rollup_once(spark, feed, schema)
    return (
        out.filter((F.col("bucket")
                    < F.lit("2099-01-01 00:00:00").cast("timestamp"))
                   & (F.col("event_type") != "tick"))
        .select("bucket", "event_type", F.col("n").cast("bigint").alias("n"))
        .orderBy("bucket", "event_type")
    )


# --------------------------------------------------------------------------
# q267 — CONVERSION-LATENCY QUANTILES: the funnel (q70) extended to
# "how long did conversion take" — per user, the FIRST view and the
# FIRST purchase after it; latency quantiles per event-count-weighted
# user segment come from the grouped distributed-selection operator
# (q135's machinery: joint (group, value) range partitioning, no
# single-reducer percentile funnel). Latency is measured in exact
# epoch seconds; quantile interpolation matches quantile_cont's
# p·(n−1) lattice on both engines, rounded 6 dp by repo convention.
# --------------------------------------------------------------------------
_LAT_PS = [0.5, 0.9, 0.99]


@register(
    "q267_conversion_latency",
    oracle=" UNION ALL ".join(
        f"""SELECT seg AS segment, CAST({p} AS DOUBLE) AS p,
            round(quantile_cont(lat, {p}), 6) AS value
            FROM (
              SELECT CASE WHEN u.user_id % 3 = 0 THEN 'heavy'
                          ELSE 'light' END AS seg,
                     epoch(u.first_p) - epoch(u.first_v) AS lat
              FROM (
                SELECT user_id,
                       MIN(CASE WHEN event_type = 'view' THEN ts END)
                         AS first_v,
                       MIN(CASE WHEN event_type = 'purchase'
                            AND ts >= (SELECT MIN(ts) FROM events e2
                                       WHERE e2.user_id = e.user_id
                                         AND e2.event_type = 'view')
                            THEN ts END) AS first_p
                FROM events e GROUP BY user_id
              ) u
              WHERE u.first_v IS NOT NULL AND u.first_p IS NOT NULL
            ) GROUP BY seg"""
        for p in _LAT_PS
    ),
)
def q267(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.quantiles import grouped_exact_quantiles

    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts")))
        .alias("first_v"))
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .filter(F.col("ts") >= F.col("first_v"))
        .groupBy("user_id", "first_v")
        .agg(F.min("ts").alias("first_p"))
        .filter(F.col("first_v").isNotNull())
        .select(
            F.when(F.col("user_id") % 3 == 0, "heavy")
            .otherwise("light").alias("seg"),
            # timestamp->double = fractional epoch seconds, the exact
            # twin of DuckDB's epoch()
            (F.col("first_p").cast("double")
             - F.col("first_v").cast("double")).alias("lat"),
        )
    )
    out = grouped_exact_quantiles(conv, "seg", "lat", _LAT_PS)
    return out.select(
        F.col("group").alias("segment"), "p",
        F.round("value", 6).alias("value"))


# --------------------------------------------------------------------------
# q334 — FIXED-WIDTH RECORD INGESTION (the mainframe/COBOL copybook
# format ETL still meets daily): orders export as 49-char fixed-width
# lines (orderkey 12 right-padded zeros? no — zero-padded numerics,
# space-padded status, cents as 14-digit zero-padded int, ISO date 10),
# re-ingest through spark.read.text + substring slicing against the
# copybook layout (all JVM-side column ops — the standard fixed-width
# reader Spark lacks natively), and aggregate. The oracle aggregates
# the parquet truth directly, so any padding/slicing/parsing bug
# breaks value parity. Derived files are fingerprint-cached like the
# q201/q205 interchange twins.
# --------------------------------------------------------------------------
def _fixed_width_dir(spark: SparkSession, sf_dir: str) -> str:
    from .lakeops import _derived_dir

    def build(d: str) -> None:
        orders = load(spark, sf_dir, "orders")
        line = F.concat(
            F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
            F.lpad(F.col("o_custkey").cast("string"), 12, "0"),
            F.rpad(F.col("o_orderstatus"), 1, " "),
            F.lpad(F.floor(F.col("o_totalprice") * 100)
                   .cast("bigint").cast("string"), 14, "0"),
            F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd"),
        )
        orders.select(line.alias("value")).coalesce(4).write.mode(
            "overwrite").text(d)

    return _derived_dir(sf_dir, "fixedwidth_r1", build)


@register(
    "q334_fixed_width_roundtrip",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT)
             AS n_dates
    FROM orders GROUP BY 1 ORDER BY status
    """,
)
def q334(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fixed_width_dir(spark, sf_dir)
    raw = spark.read.text(d)
    rec = raw.select(
        F.substring("value", 1, 12).cast("bigint").alias("o_orderkey"),
        F.substring("value", 13, 12).cast("bigint").alias("o_custkey"),
        F.trim(F.substring("value", 25, 1)).alias("status"),
        F.substring("value", 26, 14).cast("bigint").alias("cents"),
        F.to_date(F.substring("value", 40, 10)).alias("d"),
    )
    return (
        rec.groupBy("status")
        .agg(F.count("*").cast("bigint").alias("n_orders"),
             F.sum("cents").cast("bigint").alias("total_cents"),
             F.min("o_orderkey").cast("bigint").alias("min_key"),
             F.max("o_orderkey").cast("bigint").alias("max_key"),
             F.countDistinct("d").cast("bigint").alias("n_dates"))
        .orderBy("status")
    )


# --------------------------------------------------------------------------
# q401 — CHAT-TEMPLATE SFT RENDER: the events stream becomes per-user
# conversations (turn order = event_id, roles alternating user/
# assistant), rendered through a ChatML-shaped template, with the two
# numbers an SFT pipeline needs per conversation: the loss-maskable
# character count (assistant turns only — the spans that receive loss)
# and the rendered length after last-8-turn history truncation. Exact
# rendering is value-checked by md5 fingerprints of both the full and
# the truncated render, so the template concatenation itself is proven
# identical, not just its lengths. All pure column work: one window
# rank + one groupBy per user — conversations shuffle once, the render
# is whole-stage-codegen'd string algebra, no UDF.
# --------------------------------------------------------------------------
@register(
    "q401_chat_sft_render",
    oracle="""
    WITH t AS (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id)
                 - 1 AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_turns,
             event_type || '#' || event_id AS content
      FROM events
    ), p AS (
      SELECT user_id, rn, n_turns,
             '<|' || CASE WHEN rn % 2 = 0 THEN 'user' ELSE 'assistant'
                     END || '|>' || content || '<|end|>' AS piece,
             CASE WHEN rn % 2 = 1 THEN length(content) ELSE 0
                 END AS a_chars
      FROM t
    )
    SELECT user_id,
           CAST(MAX(n_turns) AS INT) AS n_turns,
           CAST(SUM(CASE WHEN rn % 2 = 1 THEN 1 ELSE 0 END) AS INT)
               AS n_assistant,
           CAST(SUM(a_chars) AS BIGINT) AS loss_chars,
           md5(string_agg(piece, '' ORDER BY rn)) AS render_md5,
           md5(string_agg(CASE WHEN rn >= n_turns - 8 THEN piece END,
                          '' ORDER BY rn)) AS tail_md5
    FROM p GROUP BY user_id
    """,
)
def q401(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    t = ev.select(
        "user_id", "event_id",
        (F.row_number().over(w) - 1).alias("rn"),
        F.count("*").over(Window.partitionBy("user_id")).alias("n_turns"),
        F.concat_ws("#", "event_type", "event_id").alias("content"),
    )
    role = F.when(F.col("rn") % 2 == 0, "user").otherwise("assistant")
    p = t.select(
        "user_id", "rn", "n_turns",
        F.concat(F.lit("<|"), role, F.lit("|>"), F.col("content"),
                 F.lit("<|end|>")).alias("piece"),
        F.when(F.col("rn") % 2 == 1, F.length("content"))
        .otherwise(0).alias("a_chars"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("rn", "piece"))),
        lambda x: x["piece"],
    )
    tail_ordered = F.transform(
        F.array_sort(F.collect_list(
            F.when(F.col("rn") >= F.col("n_turns") - 8,
                   F.struct("rn", "piece")))),
        lambda x: x["piece"],
    )
    return p.groupBy("user_id").agg(
        F.max("n_turns").cast("int").alias("n_turns"),
        F.sum(F.when(F.col("rn") % 2 == 1, 1).otherwise(0)).cast("int")
        .alias("n_assistant"),
        F.sum("a_chars").cast("bigint").alias("loss_chars"),
        F.md5(F.array_join(ordered, "").cast("binary"))
        .alias("render_md5"),
        F.md5(F.array_join(tail_ordered, "").cast("binary"))
        .alias("tail_md5"),
    )


# --------------------------------------------------------------------------
# q402 — DPO PREFERENCE-PAIR CONSTRUCTION: per user, among purchase
# events, pair the highest-value response (chosen) with the lowest
# (rejected) — deterministic tie-breaks by event_id on both legs, users
# with a single candidate (no contrast) dropped, margin carried for
# downstream filtering (DPO data curation drops low-margin pairs). Two
# window ranks over one shuffle; the pair table is users-sized.
# --------------------------------------------------------------------------
@register(
    "q402_preference_pairs",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY value DESC, event_id ASC) AS rc,
             ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY value ASC, event_id DESC) AS rr,
             COUNT(*) OVER (PARTITION BY user_id) AS n_cand
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a.user_id,
           a.event_id AS chosen_id,
           b.event_id AS rejected_id,
           round(a.value - b.value, 2) AS margin,
           CAST(a.n_cand AS INT) AS n_candidates
    FROM c a JOIN c b USING (user_id)
    WHERE a.rc = 1 AND b.rr = 1 AND a.n_cand >= 2
          AND a.event_id <> b.event_id
    """,
)
def q402(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase")
    wc = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc())
    wr = Window.partitionBy("user_id").orderBy(
        F.col("value").asc(), F.col("event_id").desc())
    c = ev.select(
        "user_id", "event_id", "value",
        F.row_number().over(wc).alias("rc"),
        F.row_number().over(wr).alias("rr"),
        F.count("*").over(Window.partitionBy("user_id")).alias("n_cand"),
    ).localCheckpoint(eager=False)  # chosen + rejected both filter it
    chosen = c.filter(F.col("rc") == 1).select(
        "user_id", F.col("event_id").alias("chosen_id"),
        F.col("value").alias("cv"), "n_cand")
    rejected = c.filter(F.col("rr") == 1).select(
        "user_id", F.col("event_id").alias("rejected_id"),
        F.col("value").alias("rv"))
    return (
        chosen.join(rejected, "user_id")
        .filter((F.col("n_cand") >= 2)
                & (F.col("chosen_id") != F.col("rejected_id")))
        .select(
            "user_id", "chosen_id", "rejected_id",
            F.round(F.col("cv") - F.col("rv"), 2).alias("margin"),
            F.col("n_cand").cast("int").alias("n_candidates"),
        )
    )


# --------------------------------------------------------------------------
# q453 — STREAMING RATE LIMITER (streaming/throttle.py): per-user
# event admission — at most 3 events per user per event-time hour, in
# (ts, event_id) order — the multi-tenant ingestion throttle. State
# is {hour -> admitted count} per user (O(active hours), not
# O(events)). Implemented twice over the same kernel: the always-on
# applyInPandasWithState path, and Spark 4's
# transformWithStateInPandas (typed MapState) which is
# environment-blocked here (its Python state-server protocol needs
# google.protobuf, absent from the container — gate documented in the
# module; 'auto' falls back). The availableNow drain makes the
# admitted set exactly ROW_NUMBER() <= 3 per (user, hour), which the
# oracle replays row-for-row — a full row-set comparison, not an
# aggregate.
# --------------------------------------------------------------------------
@register(
    "q453_stream_rate_limit",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id,
             CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour, value,
             ROW_NUMBER() OVER (PARTITION BY user_id,
                                             FLOOR(epoch(ts) / 3600)
                                ORDER BY ts, event_id) AS seq
      FROM events
    )
    SELECT user_id, event_id, hour, CAST(seq AS BIGINT) AS seq, value
    FROM ranked WHERE seq <= 3
    """,
)
def q453(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.throttle import run_rate_limit_once

    return run_rate_limit_once(spark, f"{sf_dir}/events.parquet", limit=3)

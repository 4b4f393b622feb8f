"""Hypothesis-test / survival statistics family: two-sample
Kolmogorov-Smirnov, Mann-Whitney U (tie-corrected), and Kaplan-Meier
churn survival — the experiment-readout tests an analytics engine is
asked for right after the descriptive stats (q195 A/B readout, q266
chi-square) exist.

Scale discipline: both rank tests need a GLOBAL cumulative sum over the
sorted value domain. That is computed with the q262/q281 bucketed-scan
pattern — the fact scan first shrinks to one row per DISTINCT value,
64 fixed value-range buckets accumulate independently (window
partitioned BY bucket), and only the 64-row bucket-total table sees a
global window (exempted in plan_lint with justification). No fact-scale
row ever crosses a SinglePartition exchange.

Float discipline (repo convention): money enters exact integer cent
space via floor(x*100); every distributed sum is integer/decimal; the
final statistic is a fixed-order scalar IEEE expression over exact
aggregates, rounded to 6 dp on both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, register

_NB = 64  # value-domain buckets for the distributed cumulative scan


def _bucketed_cum(d: DataFrame, value_col: str, cnt_cols: list[str],
                  order_tail: list[str] | None = None,
                  checkpoint_input: bool = True) -> DataFrame:
    """Inclusive global cumulative sums of ``cnt_cols`` over ``d`` ordered
    by ``value_col`` ascending, without a fact-scale single-partition
    window: bucket by value range (bounds from one broadcast scalar row),
    cumulate within buckets, then add per-bucket offsets computed by a
    window over the 64-row bucket-total table. ``d`` must have one row
    per distinct ``value_col`` (plus optional ``order_tail`` tie-break
    columns when values repeat across rows)."""
    # d (usually a fact-scale aggregate) feeds the range scalar AND the
    # bucketing; checkpoint so it is computed once per call. Callers
    # whose d derives trivially from an already-checkpointed table pass
    # checkpoint_input=False — there the recompute is a cheap map and
    # the two materialization jobs cost more than they save (the O16
    # measure-don't-assume rule).
    if checkpoint_input:
        d = d.localCheckpoint(eager=False)
    rng = d.agg(F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi"))
    b = (
        d.crossJoin(F.broadcast(rng))
        .withColumn(
            "_b",
            F.least(
                F.lit(_NB - 1),
                ((F.col(value_col) - F.col("_lo")) * _NB
                 / (F.col("_hi") - F.col("_lo") + 1)).cast("int")))
        .drop("_lo", "_hi")
    )
    if checkpoint_input:
        b = b.localCheckpoint(eager=False)  # bucket totals + per-row cumsum
    totals = b.groupBy("_b").agg(
        *[F.sum(c).alias(f"_t_{c}") for c in cnt_cols])
    wb = (Window.orderBy(F.col("_b").asc())
          .rowsBetween(Window.unboundedPreceding, -1))
    offs = totals.select(
        "_b",
        *[F.coalesce(F.sum(f"_t_{c}").over(wb), F.lit(0))
          .alias(f"_off_{c}") for c in cnt_cols])
    tail = [F.col(c).asc() for c in (order_tail or [])]
    wr = (Window.partitionBy("_b")
          .orderBy(F.col(value_col).asc(), *tail)
          .rowsBetween(Window.unboundedPreceding, 0))
    out = b.join(F.broadcast(offs), "_b")
    for c in cnt_cols:
        out = out.withColumn(f"cum_{c}",
                             F.col(f"_off_{c}") + F.sum(c).over(wr))
    return out.drop("_b", *[f"_off_{c}" for c in cnt_cols])


# --------------------------------------------------------------------------
# q296 — TWO-SAMPLE KOLMOGOROV-SMIRNOV: do BUILDING and MACHINERY
# customers draw order values from the same distribution? The exact D
# statistic needs sup|F1 - F2| over the merged sorted sample — here the
# integer-exact numerator max|n2*cumA - n1*cumB| (DECIMAL(38,0): the
# product overflows int64 once n1*n2 passes ~9.2e18 at full scale) over
# the distinct-cent-value table, cumulated with the bucketed scan. The
# asymptotic p-value 2*exp(-2*D^2*n1*n2/(n1+n2)) is a fixed-order scalar
# expression over the exact aggregates, rounded 6 dp (libm exp may
# differ in the last ULP across engines). Oracle: same definition via a
# plain ordered window — an independent cumulation mechanism, so any
# bucket/offset bug shows as a value mismatch.
# --------------------------------------------------------------------------
@register(
    "q296_ks_two_sample",
    oracle="""
    WITH g AS (
      SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS x,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ga
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    ), d AS (
      SELECT x, SUM(ga) AS a, SUM(1 - ga) AS b FROM g GROUP BY x
    ), c AS (
      SELECT x,
             SUM(a) OVER (ORDER BY x) AS ca,
             SUM(b) OVER (ORDER BY x) AS cb
      FROM d
    ), tot AS (
      SELECT SUM(a) AS n1, SUM(b) AS n2 FROM d
    ), s AS (
      SELECT MAX(abs(CAST(n2 AS DECIMAL(38,0)) * ca
                     - CAST(n1 AS DECIMAL(38,0)) * cb)) AS d_num,
             MAX(n1) AS n1, MAX(n2) AS n2
      FROM c, tot
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(d_num AS DOUBLE) AS d_num,
           round(CAST(d_num AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS d_stat,
           round(2.0 * exp(
             -2.0
             * (CAST(d_num AS DOUBLE)
                / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
             * (CAST(d_num AS DOUBLE)
                / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
             * (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))), 6)
             AS p_value
    FROM s
    """,
)
def q296(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
    g = orders.join(F.broadcast(cust),
                    orders.o_custkey == cust.c_custkey).select(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("x"),
        (F.col("c_mktsegment") == "BUILDING").cast("bigint").alias("ga"))
    d = g.groupBy("x").agg(F.sum("ga").alias("a"),
                           F.sum(1 - F.col("ga")).alias("b"))
    c = _bucketed_cum(d, "x", ["a", "b"])
    tot = d.agg(F.sum("a").alias("n1"), F.sum("b").alias("n2"))
    s = (
        c.crossJoin(F.broadcast(tot))
        .agg(
            F.max(F.abs(F.col("n2").cast("decimal(38,0)") * F.col("cum_a")
                        - F.col("n1").cast("decimal(38,0)")
                        * F.col("cum_b"))).alias("d_num"),
            F.max("n1").alias("n1"), F.max("n2").alias("n2"))
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    dd = F.col("d_num").cast("double") / (n1d * n2d)
    return s.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.col("d_num").cast("double").alias("d_num"),
        F.round(dd, 6).alias("d_stat"),
        F.round(F.lit(2.0)
                * F.exp(F.lit(-2.0) * dd * dd * (n1d * n2d / (n1d + n2d))),
                6).alias("p_value"),
    )


# --------------------------------------------------------------------------
# q297 — MANN-WHITNEY U, tie-corrected: are HOUSEHOLD account balances
# stochastically larger than FURNITURE ones? Ranks stay EXACT under ties
# by working in doubled-rank space: a tied block of k values after
# c_before smaller ones has average rank c_before + (k+1)/2, i.e.
# doubled rank 2*c_before + k + 1 — an integer. R1*2 accumulates in
# DECIMAL(38,0) (sum of rank*count overflows int64 at full scale),
# U1 = R1 - n1(n1+1)/2 emerges as an exact half-integer, and the
# tie-corrected normal approximation z = (U1 - n1*n2/2)/sqrt(var) is a
# fixed-order scalar over the exact aggregates. The exclusive cumulative
# count over the distinct-value table uses the same bucketed scan as
# q296; the oracle cumulates with a plain ordered window instead.
# --------------------------------------------------------------------------
@register(
    "q297_mann_whitney_u",
    oracle="""
    WITH g AS (
      SELECT CAST(floor(c_acctbal * 100) AS BIGINT) AS x,
             CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END AS ga
      FROM customer
      WHERE c_mktsegment IN ('HOUSEHOLD', 'FURNITURE')
    ), d AS (
      SELECT x, SUM(ga) AS a, SUM(1 - ga) AS b, COUNT(*) AS k
      FROM g GROUP BY x
    ), c AS (
      SELECT x, a, b, k,
             COALESCE(SUM(k) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cbefore
      FROM d
    ), s AS (
      SELECT SUM(CAST(a AS DECIMAL(38,0)) * (2 * cbefore + k + 1))
               AS r1x2,
             SUM(a) AS n1, SUM(b) AS n2,
             SUM(CAST(k AS DECIMAL(38,0)) * k * k - k) AS tie_term
      FROM c
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(r1x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) AS DOUBLE)
             / 2.0 AS u1,
           CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             - CAST(r1x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) AS DOUBLE)
               / 2.0 AS u2,
           round((CAST(r1x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)
                       AS DOUBLE) / 2.0
                  - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
                 / sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                        * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)
                           - CAST(tie_term AS DOUBLE)
                             / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                                * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)
                                   - 1.0)))), 6) AS z
    FROM s
    """,
)
def q297(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("HOUSEHOLD", "FURNITURE"))
    g = cust.select(
        F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("x"),
        (F.col("c_mktsegment") == "HOUSEHOLD").cast("bigint").alias("ga"))
    d = g.groupBy("x").agg(F.sum("ga").alias("a"),
                           F.sum(1 - F.col("ga")).alias("b"),
                           F.count("*").alias("k"))
    c = _bucketed_cum(d, "x", ["k"]).withColumn(
        "cbefore", F.col("cum_k") - F.col("k"))
    s = c.agg(
        F.sum(F.col("a").cast("decimal(38,0)")
              * (2 * F.col("cbefore") + F.col("k") + 1)).alias("r1x2"),
        F.sum("a").alias("n1"), F.sum("b").alias("n2"),
        F.sum(F.col("k").cast("decimal(38,0)") * F.col("k") * F.col("k")
              - F.col("k")).alias("tie_term"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = n1d + n2d
    u1 = (F.col("r1x2") - F.col("n1").cast("decimal(38,0)")
          * (F.col("n1") + 1)).cast("double") / F.lit(2.0)
    var = ((n1d * n2d / F.lit(12.0))
           * ((nd + F.lit(1.0))
              - F.col("tie_term").cast("double")
              / (nd * (nd - F.lit(1.0)))))
    return s.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        u1.alias("u1"),
        (n1d * n2d - u1).alias("u2"),
        F.round((u1 - n1d * n2d / F.lit(2.0)) / F.sqrt(var), 6).alias("z"),
    )


# --------------------------------------------------------------------------
# q298 — KAPLAN-MEIER CHURN SURVIVAL: per customer, time-on-book =
# days from first to last order; the churn EVENT is observed when the
# last order predates the dataset horizon by > 365 days, otherwise the
# customer is right-censored at the same duration. The fact table first
# shrinks to one row per distinct duration (~value-domain-sized: the
# calendar span in days, whatever the customer count), so the at-risk
# cumulation and the log-survival prefix sum are windows over a
# dimension-scale table (q288's exemption class). Survival is
# exp(cumsum(ln((n_risk - d)/n_risk))) — each log argument is one exact
# integer division, the prefix sum runs in ascending-time order on both
# engines, and the result is rounded 6 dp. The oracle replays the
# identical definition with plain ordered windows.
# --------------------------------------------------------------------------
@register(
    "q298_kaplan_meier",
    oracle="""
    WITH horizon AS (
      SELECT CAST(MAX(o_orderdate) AS DATE) AS t_end FROM orders
    ), cust AS (
      SELECT o_custkey,
             CAST(MIN(o_orderdate) AS DATE) AS f,
             CAST(MAX(o_orderdate) AS DATE) AS l
      FROM orders GROUP BY o_custkey
    ), obs AS (
      SELECT date_diff('day', f, l) AS t,
             CASE WHEN date_diff('day', l, t_end) > 365
                  THEN 1 ELSE 0 END AS ev
      FROM cust, horizon
    ), per_t AS (
      SELECT t, SUM(ev) AS d, COUNT(*) AS k FROM obs GROUP BY t
    ), risk AS (
      SELECT t, d,
             (SELECT COUNT(*) FROM obs)
               - COALESCE(SUM(k) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM per_t
    ), km AS (
      SELECT t, n_risk, d,
             SUM(ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)))
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS lns
      FROM risk WHERE d > 0
    )
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d_events,
           round(exp(lns), 6) AS survival
    FROM km ORDER BY t_days
    """,
)
def q298(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    horizon = orders.agg(
        F.max(F.to_date("o_orderdate")).alias("t_end"))
    cust = orders.groupBy("o_custkey").agg(
        F.min(F.to_date("o_orderdate")).alias("f"),
        F.max(F.to_date("o_orderdate")).alias("l"))
    obs = cust.crossJoin(F.broadcast(horizon)).select(
        F.datediff("l", "f").cast("bigint").alias("t"),
        (F.datediff("t_end", "l") > 365).cast("bigint").alias("ev"))
    per_t = obs.groupBy("t").agg(F.sum("ev").alias("d"),
                                 F.count("*").alias("k"))
    n_total = obs.agg(F.count("*").alias("n_total"))
    wprev = (Window.orderBy(F.col("t").asc())
             .rowsBetween(Window.unboundedPreceding, -1))
    risk = (
        per_t.crossJoin(F.broadcast(n_total))
        .withColumn(
            "n_risk",
            F.col("n_total")
            - F.coalesce(F.sum("k").over(wprev), F.lit(0)))
        .filter(F.col("d") > 0)
    )
    wcum = (Window.orderBy(F.col("t").asc())
            .rowsBetween(Window.unboundedPreceding, 0))
    lns = F.sum(
        F.log((F.col("n_risk") - F.col("d")).cast("double")
              / F.col("n_risk").cast("double"))).over(wcum)
    return (
        risk.select(
            F.col("t").cast("bigint").alias("t_days"),
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("d").cast("bigint").alias("d_events"),
            F.round(F.exp(lns), 6).alias("survival"))
        .orderBy("t_days")
    )


# --------------------------------------------------------------------------
# q351 — SPEARMAN RANK CORRELATION with ties (the robust cousin of
# q104's Pearson): does quantity co-rank with price? Both columns rank
# through the q297 doubled-average-rank construction (2*c_before + k +
# 1 — tied blocks get their exact average rank as an INTEGER), each
# cumulated with the q296 bucketed scan over its own distinct-value
# table and joined back to rows by value. rho is then Pearson over the
# exact integer doubled ranks — DECIMAL(38,0) sums, one fixed-order
# scalar, rounded 6. The oracle cumulates with plain ordered windows.
# --------------------------------------------------------------------------
def _sql_rank2(table: str, col: str) -> str:
    return f"""(
      SELECT {col} AS v,
             2 * COALESCE(SUM(k) OVER (ORDER BY {col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + k + 1 AS r2
      FROM (SELECT {col}, COUNT(*) AS k FROM {table} GROUP BY {col})
    )"""


@register(
    "q351_spearman",
    oracle=f"""
    WITH base AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ), rx AS {_sql_rank2("base", "x")},
    ry AS {_sql_rank2("base", "y")},
    j AS (
      SELECT rx.r2 AS a, ry.r2 AS b
      FROM base JOIN rx ON rx.v = base.x JOIN ry ON ry.v = base.y
    ), s AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(a AS DECIMAL(38,0))) AS sa,
             SUM(CAST(b AS DECIMAL(38,0))) AS sb,
             SUM(CAST(a AS DECIMAL(19,0)) * CAST(b AS DECIMAL(19,0)))
               AS sab,
             SUM(CAST(a AS DECIMAL(19,0)) * CAST(a AS DECIMAL(19,0)))
               AS saa,
             SUM(CAST(b AS DECIMAL(19,0)) * CAST(b AS DECIMAL(19,0)))
               AS sbb
      FROM j
    )
    SELECT CAST(n AS BIGINT) AS n,
           round((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                  - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                         - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                           - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))),
                 6) AS spearman_rho
    FROM s
    """,
)
def q351(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").cast("bigint").alias("x"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("y"))
    base = base.localCheckpoint(eager=False)

    def rank2(col: str) -> DataFrame:
        d = base.groupBy(col).agg(F.count("*").alias("k"))
        c = _bucketed_cum(d, col, ["k"])
        return c.select(
            F.col(col).alias("v"),
            (2 * (F.col("cum_k") - F.col("k")) + F.col("k") + 1)
            .alias("r2"))

    # x = l_quantity is a VALUE-DOMAIN-bounded axis (1..50 by TPC-H
    # construction, however large lineitem grows — the q287/q335
    # tiny-statistic discipline): its doubled-rank table collects once
    # and inlines as a literal lookup, replacing a whole bucketed-cum
    # pipeline + broadcast join. y (cents) stays distributed.
    xr = base.groupBy("x").agg(F.count("*").alias("k")).collect()
    xr.sort(key=lambda r: r["x"])
    a_map, cum = {}, 0
    for r in xr:
        a_map[int(r["x"])] = 2 * cum + int(r["k"]) + 1
        cum += int(r["k"])
    a_lit = F.create_map(*[
        F.lit(v) for kv in a_map.items() for v in kv
    ]).cast("map<bigint,bigint>")
    ry = rank2("y").select(F.col("v").alias("y"), F.col("r2").alias("b"))
    j = base.withColumn("a", F.element_at(a_lit, F.col("x"))).join(ry, "y")
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    s = j.agg(
        F.count("*").alias("n"),
        F.sum(F.col("a").cast("decimal(38,0)")).alias("sa"),
        F.sum(F.col("b").cast("decimal(38,0)")).alias("sb"),
        F.sum(d19("a") * d19("b")).alias("sab"),
        F.sum(d19("a") * d19("a")).alias("saa"),
        F.sum(d19("b") * d19("b")).alias("sbb"))
    n = F.col("n").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        F.round((n * F.col("sab").cast("double") - sa * sb)
                / F.sqrt((n * F.col("saa").cast("double") - sa * sa)
                         * (n * F.col("sbb").cast("double") - sb * sb)),
                6).alias("spearman_rho"))


# --------------------------------------------------------------------------
# q354 — BENJAMINI-HOCHBERG FDR CONTROL (the multiple-testing step-up
# every metrics platform needs once it tests 25 segments at once):
# per-nation z of mean order value vs the global mean (all from exact
# integer cent/count sums), p replaced by its CHERNOFF BOUND
# exp(-z^2/2) — a valid p-value upper bound, so BH on it stays
# conservative while keeping both engines bit-comparable (no erf).
# The step-up rank is a COUNT over a broadcast self-join of the 25-row
# test table (rank_i = #{p_j <= p_i}, ties broken by nation — no
# global window anywhere); reject p_i <= max{p_j : p_j <= rank_j/m * a}.
# --------------------------------------------------------------------------
_BH_ALPHA = 0.1


@register(
    "q354_bh_fdr",
    oracle=f"""
    WITH per AS (
      SELECT c_nationkey AS nat, COUNT(*) AS n,
             SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS sx,
             SUM(CAST(floor(o_totalprice * 100) AS DECIMAL(19,0))
                 * CAST(floor(o_totalprice * 100) AS DECIMAL(19,0)))
               AS sxx
      FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1
    ), tot AS (
      SELECT SUM(sx) AS st, SUM(n) AS nt, COUNT(*) AS m FROM per
    ), t AS (
      SELECT nat, n,
             (CAST(sx AS DOUBLE) / n - CAST(st AS DOUBLE) / nt)
             / sqrt((CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * sx / n) / (n - 1) / n) AS z,
             m
      FROM per, tot
    ), p AS (
      SELECT nat, n, z, exp(-z * z / 2) AS pb, m FROM t
    ), ranked AS (
      SELECT a.nat, a.n, a.z, a.pb, a.m,
             (SELECT COUNT(*) FROM p b
              WHERE b.pb < a.pb OR (b.pb = a.pb AND b.nat <= a.nat))
               AS rk
      FROM p a
    ), thresh AS (
      SELECT MAX(pb) AS cut FROM ranked
      WHERE pb <= CAST(rk AS DOUBLE) / m * {_BH_ALPHA}
    )
    SELECT CAST(nat AS BIGINT) AS nat, CAST(n AS BIGINT) AS n,
           round(z, 6) AS z, round(pb, 6) AS p_bound,
           CAST(rk AS BIGINT) AS rank,
           COALESCE(pb <= (SELECT cut FROM thresh), FALSE) AS rejected
    FROM ranked ORDER BY nat
    """,
)
def q354(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    d19 = F.floor(F.col("o_totalprice") * 100).cast("decimal(19,0)")
    per = (orders.join(F.broadcast(cust.select("c_custkey",
                                               "c_nationkey")),
                       F.col("o_custkey") == F.col("c_custkey"))
           .groupBy(F.col("c_nationkey").alias("nat"))
           .agg(F.count("*").alias("n"), F.sum(cents).alias("sx"),
                F.sum(d19 * d19).alias("sxx")))
    per = per.localCheckpoint()  # totals + the 25x25 rank self-join
    tot = per.agg(F.sum("sx").alias("st"), F.sum("n").alias("nt"),
                  F.count("*").alias("m"))
    z = ((F.col("sx").cast("double") / F.col("n")
          - F.col("st").cast("double") / F.col("nt"))
         / F.sqrt((F.col("sxx").cast("double")
                   - F.col("sx").cast("double") * F.col("sx")
                   / F.col("n")) / (F.col("n") - 1) / F.col("n")))
    p = (per.crossJoin(F.broadcast(tot))
         .select("nat", "n", z.alias("z"), "m")
         .withColumn("pb", F.exp(-F.col("z") * F.col("z") / 2)))
    b = p.select(F.col("nat").alias("nat2"), F.col("pb").alias("pb2"))
    ranked = (
        p.join(F.broadcast(b),
               (F.col("pb2") < F.col("pb"))
               | ((F.col("pb2") == F.col("pb"))
                  & (F.col("nat2") <= F.col("nat"))))
        .groupBy("nat", "n", "z", "pb", "m")
        .agg(F.count("*").alias("rk"))
    )
    ranked = ranked.localCheckpoint(eager=False)
    thresh = (ranked.filter(F.col("pb")
                            <= F.col("rk").cast("double") / F.col("m")
                            * _BH_ALPHA)
              .agg(F.max("pb").alias("cut")))
    return (
        ranked.crossJoin(F.broadcast(thresh))
        .select(F.col("nat").cast("bigint").alias("nat"),
                F.col("n").cast("bigint").alias("n"),
                F.round("z", 6).alias("z"),
                F.round("pb", 6).alias("p_bound"),
                F.col("rk").cast("bigint").alias("rank"),
                F.coalesce(F.col("pb") <= F.col("cut"), F.lit(False))
                .alias("rejected"))
        .orderBy("nat")
    )


# --------------------------------------------------------------------------
# q357 — ABC-XYZ INVENTORY CLASSIFICATION (the supply-chain planning
# matrix): ABC = cumulative-revenue-share bands (A <= 80%, B <= 95%,
# C rest) over parts ranked by revenue DESC — the global cumulation
# runs through the q296 bucketed scan on negated revenue with a
# partkey tie-break (never a fact-scale single-partition window).
# XYZ = weekly-demand variability bands with the float boundary
# ELIMINATED: cv^2 <= 1/4 iff 4*W*Sq2 <= 5*(Sq)^2 and cv^2 <= 1 iff
# W*Sq2 <= 2*(Sq)^2 — exact DECIMAL comparisons (zero-demand weeks
# enter through the global week count W, costing nothing). ABC
# boundaries likewise compare 100*cum <= 80*total in integers. Output:
# the 3x3 cell counts + revenue share per cell.
# --------------------------------------------------------------------------
@register(
    "q357_abc_xyz",
    oracle="""
    WITH pr AS (
      SELECT l_partkey AS p,
             SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS rev
      FROM lineitem GROUP BY 1
    ), tot AS (
      SELECT SUM(rev) AS trev FROM pr
    ), ranked AS (
      SELECT p, rev,
             SUM(rev) OVER (ORDER BY rev DESC, p ASC) AS cum
      FROM pr
    ), abc AS (
      SELECT p, rev,
             CASE WHEN 100 * CAST(cum AS DECIMAL(38,0)) <= 80 * trev
                  THEN 'A'
                  WHEN 100 * CAST(cum AS DECIMAL(38,0)) <= 95 * trev
                  THEN 'B' ELSE 'C' END AS abc
      FROM ranked, tot
    ), wk AS (
      SELECT l_partkey AS p,
             CAST(floor(epoch(l_shipdate) / 604800) AS BIGINT) AS w,
             SUM(CAST(l_quantity AS BIGINT)) AS q
      FROM lineitem GROUP BY 1, 2
    ), nw AS (
      SELECT COUNT(DISTINCT w) AS wt FROM wk
    ), dem AS (
      SELECT p, SUM(q) AS sq,
             SUM(CAST(q AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0)))
               AS sq2
      FROM wk GROUP BY p
    ), xyz AS (
      SELECT p,
             CASE WHEN 4 * wt * sq2 <= 5 * CAST(sq AS DECIMAL(38,0)) * sq
                  THEN 'X'
                  WHEN wt * sq2 <= 2 * CAST(sq AS DECIMAL(38,0)) * sq
                  THEN 'Y' ELSE 'Z' END AS xyz
      FROM dem, nw
    )
    SELECT abc.abc AS abc_class, xyz.xyz AS xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           round(CAST(SUM(abc.rev) AS DOUBLE)
                 / (SELECT CAST(trev AS DOUBLE) FROM tot), 6)
             AS revenue_share
    FROM abc JOIN xyz USING (p)
    GROUP BY 1, 2 ORDER BY abc_class, xyz_class
    """,
)
def q357(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pr = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint"))
        .alias("rev"))
    pr = pr.localCheckpoint(eager=False)
    tot = pr.agg(F.sum("rev").alias("trev"))
    d = pr.select((-F.col("rev")).alias("negrev"), "p", "rev")
    # pr is already checkpointed: d/b recompute is a trivial map, so the
    # cum scan skips its internal materializations
    ranked = _bucketed_cum(d, "negrev", ["rev"], order_tail=["p"],
                           checkpoint_input=False)
    cum100 = 100 * F.col("cum_rev").cast("decimal(38,0)")
    abc = (
        ranked.crossJoin(F.broadcast(tot))
        .select("p", "rev",
                F.when(cum100 <= 80 * F.col("trev"), "A")
                .when(cum100 <= 95 * F.col("trev"), "B")
                .otherwise("C").alias("abc"))
    )
    wk = li.groupBy(
        F.col("l_partkey").alias("p"),
        F.floor(F.col("l_shipdate").cast("timestamp").cast("double")
                / 604800).cast("bigint").alias("w")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
    nw = wk.agg(F.countDistinct("w").alias("wt"))
    d19 = F.col("q").cast("decimal(19,0)")
    dem = wk.groupBy("p").agg(F.sum("q").alias("sq"),
                              F.sum(d19 * d19).alias("sq2"))
    sq38 = F.col("sq").cast("decimal(38,0)")
    xyz = (
        dem.crossJoin(F.broadcast(nw))
        .select("p",
                F.when(4 * F.col("wt") * F.col("sq2")
                       <= 5 * sq38 * F.col("sq"), "X")
                .when(F.col("wt") * F.col("sq2")
                      <= 2 * sq38 * F.col("sq"), "Y")
                .otherwise("Z").alias("xyz"))
    )
    return (
        abc.join(xyz, "p")
        .groupBy(F.col("abc").alias("abc_class"),
                 F.col("xyz").alias("xyz_class"))
        .agg(F.count("*").cast("bigint").alias("n_parts"),
             F.sum("rev").alias("cell_rev"))
        .crossJoin(F.broadcast(tot))
        .select("abc_class", "xyz_class", "n_parts",
                F.round(F.col("cell_rev").cast("double")
                        / F.col("trev").cast("double"), 6)
                .alias("revenue_share"))
        .orderBy("abc_class", "xyz_class")
    )


# --------------------------------------------------------------------------
# q454 — DFT PERIODOGRAM of the daily-revenue series: the frequency-
# domain seasonality readout next to the time-domain ACF (q274) and
# weekday profile (q279). X_k = sum_t x_t e^(-2*pi*i*k*t/n) for the
# first 8 non-zero frequencies over the MEAN-CENTERED series — the
# distributed shape is a tiny broadcast cross join (series x 8 rows)
# into one hash agg: O(n*K) work, one shuffle, no collect. The oracle
# replays the same trigonometric sums in SQL; magnitudes are
# normalized by n and rounded (libm vs JVM cos differ in the last
# ulp; the 1e5-scale magnitudes survive round(.,2) with ~1e-7 sum
# error).
# --------------------------------------------------------------------------
_DFT_K = 8


@register(
    "q454_dft_spectrum",
    oracle=f"""
    WITH day AS (
      SELECT date_diff('day',
                       (SELECT MIN(CAST(o_orderdate AS DATE)) FROM orders),
                       CAST(o_orderdate AS DATE)) AS t,
             SUM(o_totalprice) AS x
      FROM orders GROUP BY 1
    ), c AS (
      SELECT COUNT(*) AS n, AVG(x) AS mu FROM day
    ), terms AS (
      SELECT k.k, day.t, day.x - c.mu AS xc,
             2 * pi() * k.k * day.t / c.n AS ang, c.n AS n
      FROM day, c,
           (SELECT unnest(generate_series(1, {_DFT_K})) AS k) k
    )
    SELECT k,
           round(sqrt(POWER(SUM(xc * cos(ang)), 2)
                      + POWER(SUM(xc * sin(ang)), 2)) / MAX(n), 2)
             + 0.0 AS magnitude
    FROM terms GROUP BY k ORDER BY k
    """,
)
def q454(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    day = (orders
           .groupBy(F.to_date("o_orderdate").alias("d"))
           .agg(F.sum("o_totalprice").alias("x"))
           .localCheckpoint(eager=False))  # scalar + term build
    base = day.agg(F.min("d").alias("d0"), F.count("*").alias("n"),
                   F.avg("x").alias("mu"))
    ks = spark.range(1, _DFT_K + 1).select(F.col("id").alias("k"))
    terms = (day.crossJoin(F.broadcast(base))
             .withColumn("t", F.datediff("d", "d0"))
             .withColumn("xc", F.col("x") - F.col("mu"))
             .crossJoin(F.broadcast(ks))
             .withColumn("ang", 2 * F.lit(math.pi) * F.col("k")
                         * F.col("t") / F.col("n")))
    return (terms.groupBy("k").agg(
                (F.round(
                    F.sqrt(F.pow(F.sum(F.col("xc") * F.cos("ang")), 2)
                           + F.pow(F.sum(F.col("xc") * F.sin("ang")), 2))
                    / F.max("n"), 2) + 0.0).alias("magnitude"))
            .orderBy("k"))

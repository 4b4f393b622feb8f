"""Hypertable-style time-series operators: bucket gap-filling and
last-observation-carried-forward (LOCF) interpolation.

Sparse event streams aggregated into time buckets have holes wherever a
bucket saw no rows; downstream consumers (charting, rate math, joins on
bucket keys) want a dense series. The classic "hypertable rollup /
time_bucket_gapfill" shape (TimescaleDB, InfluxDB) is re-expressed here
Spark-first:

- the bucket spine is generated *distributed*: one ``sequence()`` per
  series (min..max bucket), exploded — no driver-side range loop, and a
  corpus with millions of independent series parallelizes by series;
- the fill join is a left join on (series, bucket) — with per-series
  spines this is 1:1 and AQE broadcast-joins the aggregated (small) side
  when it fits;
- LOCF is ``last(value, ignorenulls=True)`` over an unbounded-preceding
  running frame — one sort per series partition, no self-join, no
  per-gap range scan.

Scale note: a single pathological series with a years-long extent and
second-level buckets explodes to a huge array in one task. ``max_buckets``
guards that (fail fast rather than OOM an executor); splitting a spine
row into sub-ranges before explode is the escape hatch if a real
workload ever hits it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    bucketed: DataFrame,
    series_cols: list[str],
    bucket_col: str,
    value_cols: list[str],
    step: int,
    max_buckets: int = 10_000_000,
) -> DataFrame:
    """Densify ``bucketed`` (one row per (series, bucket) with possibly
    missing buckets) onto a per-series spine of stride ``step`` (same
    unit as ``bucket_col``, typically epoch seconds), then add
    ``<col>_locf`` columns carrying the last non-null observation
    forward within each series.

    Missing buckets get null in the original ``value_cols`` (callers
    ``coalesce`` to 0 for additive metrics) and the carried value in
    ``<col>_locf``. Buckets before a series' first observation keep
    null LOCF — there is nothing to carry.
    """
    # the bucketed input (usually a fact-scale aggregate) feeds the
    # extent scan AND the dense join — checkpoint so it runs once
    bucketed = bucketed.localCheckpoint(eager=False)
    ext = bucketed.groupBy(*series_cols).agg(
        F.min(bucket_col).alias("_mn"), F.max(bucket_col).alias("_mx")
    )
    guarded = ext.withColumn(
        "_n_buckets", ((F.col("_mx") - F.col("_mn")) / step).cast("long") + 1
    )
    spine = guarded.select(
        *series_cols,
        F.explode(
            F.when(
                F.col("_n_buckets") <= max_buckets,
                F.sequence("_mn", "_mx", F.lit(step)),
            ).otherwise(
                F.raise_error(
                    F.format_string(
                        "gapfill spine exceeds max_buckets=%d", F.lit(max_buckets)
                    )
                )
            )
        ).alias(bucket_col),
    )
    dense = spine.join(bucketed, [*series_cols, bucket_col], "left")
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in value_cols:
        dense = dense.withColumn(
            f"{c}_locf", F.last(F.col(c), ignorenulls=True).over(w)
        )
    return dense


EWMA_ALPHA = 0.2
EWMA_HORIZON = 20


def ewma_truncated(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    tiebreak_col: str = "event_id",
    alpha: float = EWMA_ALPHA,
    horizon: int = EWMA_HORIZON,
) -> DataFrame:
    """Exponentially-weighted moving average with a finite horizon:
    y_t = sum_{j<horizon} (1-a)^j x_{t-j} / sum of the weights present.

    Truncating the tail is what makes the smoother scale-stable: the
    textbook recursive/normalized forms either serialize per key or
    blow up numerically as (1/(1-a))^t, while the truncated form is a
    fixed unrolled expression of ``horizon`` lag() terms — one window
    sort per key, whole-stage codegen, and bit-replayable in any SQL
    engine (streaming smoothers truncate the tail anyway: weights below
    (1-a)^20 ~ 1% contribute noise, not signal).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc())
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(horizon):
        weight = float((1.0 - alpha) ** j)
        lagged = F.lag(val_col, j).over(w)
        num = num + F.coalesce(lagged, F.lit(0.0)) * weight
        den = den + F.when(lagged.isNotNull(), weight).otherwise(0.0)
    return df.select(
        key_col, ts_col, tiebreak_col, val_col,
        F.round(num / den, 6).alias("ewma"),
    )


def acf_integer(
    daily: DataFrame,
    t_col: str,
    x_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Autocorrelation r_1..r_max_lag of an INTEGER-valued series,
    IEEE-exact on any partitioning.

    ``daily`` holds one row per PRESENT calendar index ``t`` (0-based;
    absent indices mean x_t = 0) with integer measure ``x``. The series
    length N = max(t) + 1. The textbook estimator

        r_l = sum_{t<=N-1-l} (x_t - mu)(x_{t+l} - mu)
              / sum_t (x_t - mu)^2,  mu = S / N

    is a ratio of float sums whose value depends on summation order —
    so multiply both sides by N^2 and expand mu away: every term is an
    exact BIGINT

        num_l = N^2 * sum_t x_t x_{t+l}
                - N * S * (head_l + tail_l) + (N - l) * S^2
        den   = N^2 * sum x^2 - N * S^2

    (head_l = sum of x_t for t <= N-1-l, tail_l = sum for t >= l) and
    r_l is ONE IEEE division of exact integers — bit-identical in any
    engine, any reduction order.

    Scale shape: the series table is value-domain-sized (one row per
    calendar index however large the fact table feeding it); lag
    products come from an equi-join on t + l = t' after a broadcast
    explode over the max_lag-row lag table; the (N, S, sum x^2) scalar
    broadcasts as one row. Nothing fact-scale moves.
    """
    s = daily.select(
        F.col(t_col).cast("bigint").alias("t"),
        F.col(x_col).cast("bigint").alias("x"),
    ).localCheckpoint(eager=False)  # referenced five times below —
    # without this the caller's daily aggregate executes per reference
    scal = s.agg(
        (F.max("t") + 1).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    ).localCheckpoint(eager=False)  # broadcast into two stages
    lags = s.sparkSession.range(1, max_lag + 1).select(
        F.col("id").cast("bigint").alias("lag"))
    parts = (
        s.crossJoin(F.broadcast(scal))
        .crossJoin(F.broadcast(lags))
        .groupBy("lag")
        .agg(
            F.sum(F.when(F.col("t") <= F.col("n") - 1 - F.col("lag"),
                         F.col("x")).otherwise(F.lit(0))).alias("head_sum"),
            F.sum(F.when(F.col("t") >= F.col("lag"), F.col("x"))
                  .otherwise(F.lit(0))).alias("tail_sum"),
        )
    )
    a = s.select(F.col("t").alias("ta"), F.col("x").alias("xa"))
    b = s.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
    prods = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("tb") == F.col("ta") + F.col("lag"))
        .groupBy("lag")
        .agg(F.sum(F.col("xa") * F.col("xb")).alias("sxy"))
    )
    joined = (
        lags.join(parts, "lag", "left")
        .join(prods, "lag", "left")
        .crossJoin(F.broadcast(scal))
        .na.fill({"head_sum": 0, "tail_sum": 0, "sxy": 0})
    )
    n, s1, s2, lag = F.col("n"), F.col("s1"), F.col("s2"), F.col("lag")
    num = (
        n * n * F.col("sxy")
        - n * s1 * (F.col("head_sum") + F.col("tail_sum"))
        + (n - lag) * s1 * s1
    )
    den = n * n * s2 - n * s1 * s1
    return joined.select(
        lag.cast("int").alias("lag"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("acf"),
    ).orderBy("lag")

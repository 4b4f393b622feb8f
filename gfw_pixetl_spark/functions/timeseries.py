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

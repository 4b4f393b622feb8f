"""As-of join: attach to each left row the most recent right row with
``right.ts <= left.ts`` within the same key group — the temporal join
every event/training-data pipeline eventually needs (feature lookup at
example time, price-as-of-trade, config-as-of-event).

Spark has no native ASOF JOIN; the naive formulation (theta-join on
``r.ts <= l.ts`` + argmax) explodes to O(|L|·|R|) pairs per key before
pruning. This implementation is the sort-merge shape instead: union both
sides tagged, one shuffle on the key, one in-partition sort, one
``last(ignorenulls)`` running-window pass — O(|L|+|R|) rows moved, which
is the plan a 100 TB event store needs. DuckDB's native ``ASOF JOIN``
serves as the oracle (harness q59).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    right_suffix: str = "_r",
) -> DataFrame:
    """Left as-of join on ``keys`` with inequality ``right.ts <= left.ts``.

    ``right`` must be unique per (keys, ts) — pre-aggregate otherwise —
    so the winner at equal timestamps is well-defined (ties on ts match,
    as in DuckDB's ``ON l.ts >= r.ts``). Right payload columns come back
    suffixed; the matched right timestamp as ``{ts_col}{right_suffix}``.
    """
    keyset = set(keys) | {ts_col}
    lpay = [c for c in left.columns if c not in keyset]
    rpay = [c for c in right.columns if c not in keyset]
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)

    lt = left.withColumn("_side", F.lit(1))
    for c in rpay:
        lt = lt.withColumn(c + right_suffix, F.lit(None).cast(rtypes[c]))
    lt = lt.withColumn("_rts", F.lit(None).cast(ltypes[ts_col]))

    rt = right.select(
        *keys, ts_col, F.lit(0).alias("_side"),
        *[F.col(c).alias(c + right_suffix) for c in rpay],
        F.col(ts_col).alias("_rts"),
    )
    for c in lpay:
        rt = rt.withColumn(c, F.lit(None).cast(ltypes[c]))

    un = lt.unionByName(rt.select(*lt.columns))
    # right rows (_side=0) sort before left rows at equal ts, so an
    # equal-timestamp right row IS visible to the left row (>= semantics)
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = un
    for c in rpay:
        out = out.withColumn(
            c + right_suffix, F.last(c + right_suffix, True).over(w)
        )
    out = out.withColumn("_rts", F.last("_rts", True).over(w))
    return (
        out.filter(F.col("_side") == 1)
        .drop("_side")
        .withColumnRenamed("_rts", ts_col + right_suffix)
    )

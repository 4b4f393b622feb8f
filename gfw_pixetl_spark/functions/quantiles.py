"""Distributed exact quantiles via range-partitioned selection.

Spark's built-in exact ``percentile`` aggregate funnels every value into a
per-group hash map and merges those maps on one reducer — on a near-unique
double column (e.g. prices) that is O(n) state through a single thread,
measured ~3-4 s at 600k rows. ``approx_percentile`` is fast but its values
cannot match an exact-SQL oracle.

This module implements the classic scalable exact algorithm instead:

1. range-partition + locally sort the column (parallel sort, one shuffle);
2. count rows per partition (a 32-row aggregate) -> global offsets;
3. one Arrow-batched pass picks the values at the target global indices;
4. interpolate on the driver (k scalars).

Every stage is parallel; driver state is O(#partitions + #quantiles) — the
same "collect a tiny statistic, broadcast it back" pattern as q63's corpus
median. Interpolation uses rank = p*(n-1), val = lo + (hi-lo)*frac — the
formula shared by Spark's Percentile and DuckDB's quantile_cont, so results
agree with an exact-SQL oracle to the last ulp of the shared arithmetic.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    col: str,
    ps: Sequence[float],
    num_partitions: int | None = None,
) -> list[float | None]:
    """Exact interpolated quantiles of ``df[col]`` (nulls ignored).

    Returns driver-side floats (like ``df.stat.approxQuantile``) so callers
    can embed them as literals — keeping downstream comparisons inside
    whole-stage codegen instead of an interpreted array fold.
    """
    if not ps:
        return []
    vals = df.select(F.col(col).cast("double").alias("v")).where(
        F.col("v").isNotNull()
    )
    n_parts = num_partitions or max(vals.rdd.getNumPartitions(), 1)
    ranked = (
        vals.repartitionByRange(n_parts, "v")
        .sortWithinPartitions("v")
        .select("v", F.spark_partition_id().alias("pid"))
        .persist()
    )
    try:
        counts = {
            r["pid"]: r["cnt"]
            for r in ranked.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
        }
        n = sum(counts.values())
        if n == 0:
            return [None] * len(ps)
        offsets: dict[int, int] = {}
        acc = 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]

        # rank = p*(n-1): the interpolation lattice both Spark's Percentile
        # and DuckDB's quantile_cont use
        import math

        ranks = [p * (n - 1) for p in ps]
        targets = sorted(
            {i for r in ranks for i in (math.floor(r), math.ceil(r))}
        )
        target_arr = targets  # closed over below

        def pick(batches: Iterable) -> Iterator:
            import pandas as pd

            local = 0
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                start = offsets[int(pdf["pid"].iloc[0])] + local
                idx = [
                    t - start
                    for t in target_arr
                    if start <= t < start + len(pdf)
                ]
                local += len(pdf)
                if idx:
                    sel = pdf.iloc[idx]
                    yield pd.DataFrame(
                        {
                            "gidx": [start + i for i in idx],
                            "v": sel["v"].to_list(),
                        }
                    )

        picked = {
            int(r["gidx"]): r["v"]
            for r in ranked.mapInPandas(pick, "gidx long, v double").collect()
        }
    finally:
        ranked.unpersist()

    out: list[float | None] = []
    for r in ranks:
        lo_i, hi_i = math.floor(r), math.ceil(r)
        lo_v, hi_v = picked[lo_i], picked[hi_i]
        frac = r - lo_i
        out.append(lo_v if frac == 0 else lo_v + (hi_v - lo_v) * frac)
    return out


def weighted_quantiles(
    df: DataFrame,
    col: str,
    weight_col: str,
    ps: Sequence[float],
    num_partitions: int | None = None,
) -> list[float | None]:
    """Weighted quantiles: for each p, the smallest value v whose
    cumulative weight (per-value-aggregated, in value order) reaches
    p * total_weight. Null values/weights and non-positive weights are
    ignored.

    Same distributed-selection shape as :func:`exact_quantiles`: weights
    aggregate per distinct value (one shuffle), the value axis
    range-partitions, per-partition weight totals give driver-side
    offsets, and one Arrow pass finds each target's crossing value.

    Determinism note: with integer-valued weights every cumulative sum
    is exact in doubles (< 2^53), so results are bit-stable under any
    partitioning and match an exact-SQL oracle; fractional weights carry
    the usual last-ulp sensitivity of float summation order.
    """
    if not ps:
        return []
    vals = df.select(
        F.col(col).cast("double").alias("v"),
        F.col(weight_col).cast("double").alias("w"),
    ).where(F.col("v").isNotNull() & F.col("w").isNotNull() & (F.col("w") > 0))
    per_v = vals.groupBy("v").agg(F.sum("w").alias("w"))
    n_parts = num_partitions or max(per_v.rdd.getNumPartitions(), 1)
    ranked = (
        per_v.repartitionByRange(n_parts, "v")
        .sortWithinPartitions("v")
        .select("v", "w", F.spark_partition_id().alias("pid"))
        .persist()
    )
    try:
        totals = {
            r["pid"]: r["tw"]
            for r in ranked.groupBy("pid").agg(F.sum("w").alias("tw")).collect()
        }
        total_w = sum(totals.values())
        if total_w <= 0:
            return [None] * len(ps)
        offsets: dict[int, float] = {}
        acc = 0.0
        for pid in sorted(totals):
            offsets[pid] = acc
            acc += totals[pid]
        targets = sorted({max(p * total_w, 0.0) for p in ps})

        def pick(batches: Iterable) -> Iterator:
            import pandas as pd

            cum = None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if cum is None:
                    cum = offsets[int(pdf["pid"].iloc[0])]
                out_t, out_v = [], []
                for v, w in zip(pdf["v"], pdf["w"]):
                    new_cum = cum + float(w)
                    for t in targets:
                        # first value whose inclusive cumweight reaches t
                        # (t == 0 handled by the global minimum: cum==0)
                        if (cum < t <= new_cum) or (t == 0.0 and cum == 0.0):
                            out_t.append(t)
                            out_v.append(float(v))
                    cum = new_cum
                if out_t:
                    yield pd.DataFrame({"t": out_t, "v": out_v})

        picked: dict[float, float] = {}
        for r in ranked.mapInPandas(pick, "t double, v double").collect():
            picked.setdefault(float(r["t"]), float(r["v"]))
    finally:
        ranked.unpersist()

    return [picked.get(max(p * total_w, 0.0)) for p in ps]

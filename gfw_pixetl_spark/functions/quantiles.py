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
    from .partitioning import planned_num_partitions

    n_parts = num_partitions or max(planned_num_partitions(vals), 1)
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
    # size by the SCAN's partitioning, not per_v's (a shuffle output is
    # always spark.sql.shuffle.partitions wide — 32 near-empty selection
    # tasks at small inputs)
    from .partitioning import planned_num_partitions

    n_parts = num_partitions or max(planned_num_partitions(vals), 1)
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


def grouped_exact_quantiles(
    df: DataFrame,
    group_col: str,
    col: str,
    ps: Sequence[float],
    num_partitions: int | None = None,
    weight_col: str | None = None,
) -> "DataFrame":
    """Exact interpolated quantiles PER GROUP, one pass, any group
    cardinality.

    ``groupBy(g).agg(percentile(...))`` funnels each group's full value
    multiset through one reducer — fatal when a few groups hold most of
    the data. Here the (group, value) axis is range-partitioned jointly,
    so a huge group spans many partitions while small groups pack
    together; per-(partition, group) counts give driver-side offsets
    (O(groups + partitions) rows — each group touches few partitions by
    construction), and one Arrow pass emits the values at every group's
    target ranks. Interpolation matches ``p*(n-1)`` lattice semantics
    (Spark percentile / DuckDB quantile_cont).

    ``weight_col``: integer multiplicities. A row (g, v, w) stands for
    w copies of v, so callers can pre-aggregate a fact table to its
    (group, value) COUNTS — one map-side-combinable shuffle — and run
    the selection over the much smaller counts table. Unit ranks are
    exact integers, so results are bit-identical to expanding the
    weights (tests/test_quantiles.py pins this).

    Returns a DataFrame ``[group, p, value]``.
    """
    import math

    spark = df.sparkSession
    w_expr = (
        F.col(weight_col).cast("long") if weight_col is not None else F.lit(1)
    )
    vals = df.select(
        F.col(group_col).alias("g"),
        F.col(col).cast("double").alias("v"),
        w_expr.alias("w"),
    ).where(F.col("v").isNotNull() & F.col("g").isNotNull() & (F.col("w") > 0))
    from .partitioning import planned_num_partitions

    n_parts = num_partitions or max(planned_num_partitions(vals), 1)
    ranked = (
        vals.repartitionByRange(n_parts, "g", "v")
        .sortWithinPartitions("g", "v")
        .select("g", "v", "w", F.spark_partition_id().alias("pid"))
        .persist()
    )
    try:
        # per-(partition, group) unit counts WITHOUT a reducer shuffle:
        # each partition emits its own tiny count table (rows are
        # already grouped-contiguous after the range sort)
        g_type_c = dict(ranked.dtypes)["g"]

        def count_kernel(batches: Iterable) -> Iterator:
            import pandas as pd

            acc: dict = {}
            pid = None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pid = int(pdf["pid"].iloc[0])
                for g, c in pdf.groupby("g", sort=False)["w"].sum().items():
                    acc[g] = acc.get(g, 0) + int(c)
            if pid is not None and acc:
                yield pd.DataFrame(
                    {
                        "pid": [pid] * len(acc),
                        "g": list(acc.keys()),
                        "c": list(acc.values()),
                    }
                )

        counts = ranked.mapInPandas(
            count_kernel, f"pid int, g {g_type_c}, c long"
        ).collect()
        per_group: dict = {}
        for r in sorted(counts, key=lambda r: r["pid"]):
            per_group.setdefault(r["g"], []).append((r["pid"], r["c"]))
        # offsets[(g, pid)] = rows of g before this partition; n per group
        offsets: dict = {}
        n_of: dict = {}
        for g, parts in per_group.items():
            acc = 0
            for pid, c in parts:
                offsets[(g, pid)] = acc
                acc += c
            n_of[g] = acc
        # target global-in-group indices per group
        targets: dict = {}
        ranks: dict = {}
        for g, n in n_of.items():
            rs = [p * (n - 1) for p in ps]
            ranks[g] = rs
            targets[g] = sorted(
                {i for r in rs for i in (math.floor(r), math.ceil(r))}
            )

        import numpy as np

        targets_np = {g: np.array(t, dtype=np.int64) for g, t in targets.items()}

        def pick(batches: Iterable) -> Iterator:
            import pandas as pd

            base: dict = {}  # per-group running unit count within this partition
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pid = int(pdf["pid"].iloc[0])
                outs = []
                for g, sub in pdf.groupby("g", sort=False):
                    b = base.get(g)
                    if b is None:
                        b = offsets[(g, pid)]
                    w = sub["w"].to_numpy()
                    cum = np.cumsum(w) + b  # exclusive unit-index end per row
                    tl = targets_np.get(g)
                    if tl is not None:
                        # row holding unit index t: first row whose
                        # cumulative end exceeds t (rows span
                        # [cum - w, cum) in unit space)
                        inwin = tl[(tl >= b) & (tl < cum[-1])]
                        if inwin.size:
                            rows = np.searchsorted(cum, inwin, side="right")
                            outs.append(
                                pd.DataFrame(
                                    {
                                        "g": sub["g"].to_numpy()[rows],
                                        "gidx": inwin,
                                        "v": sub["v"].to_numpy()[rows],
                                    }
                                )
                            )
                    base[g] = int(cum[-1])
                if outs:
                    yield pd.concat(outs)
        g_type = dict(ranked.dtypes)["g"]
        picked_rows = ranked.mapInPandas(
            pick, f"g {g_type}, gidx long, v double"
        ).collect()
        picked: dict = {}
        for r in picked_rows:
            picked[(r["g"], int(r["gidx"]))] = r["v"]
    finally:
        ranked.unpersist()

    out = []
    for g, rs in ranks.items():
        for p, r in zip(ps, rs):
            lo_i, hi_i = math.floor(r), math.ceil(r)
            lo_v, hi_v = picked[(g, lo_i)], picked[(g, hi_i)]
            frac = r - lo_i
            out.append(
                (g, float(p), lo_v if frac == 0 else lo_v + (hi_v - lo_v) * frac)
            )
    # single-slice parallelize: the default splits a 9-row local list
    # into defaultParallelism (32) Python tasks, each paying worker spin-up
    return spark.createDataFrame(
        spark.sparkContext.parallelize(out, 1),
        f"group {g_type}, p double, value double",
    )

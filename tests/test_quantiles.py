"""Unit tests for the distributed exact-quantile selection operator:
value parity with DuckDB's quantile_cont (the oracle interpolation) and
with Spark's own exact percentile aggregate, plus edge cases.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from gfw_pixetl_spark.functions.quantiles import exact_quantiles

PS = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]


def _duck_quantiles(values, ps):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    return [
        con.execute(f"SELECT quantile_cont(v, {p}) FROM t").fetchone()[0]
        for p in ps
    ]


@pytest.mark.parametrize("n", [1, 2, 7, 1000])
def test_matches_duckdb_quantile_cont(spark, n):
    rng = random.Random(42 + n)
    values = [round(rng.uniform(900, 105000), 2) for _ in range(n)]
    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = exact_quantiles(df, "v", PS, num_partitions=4)
    want = _duck_quantiles(values, PS)
    for g, w, p in zip(got, want, PS):
        assert g == pytest.approx(w, rel=0, abs=1e-9), f"p={p}"


def test_matches_spark_percentile(spark):
    rng = random.Random(7)
    values = [rng.gauss(0, 100) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = exact_quantiles(df, "v", PS, num_partitions=8)
    want = df.agg(F.percentile(F.col("v"), F.lit(PS)).alias("q")).first()["q"]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=0, abs=1e-9)


def test_ties_and_integer_ranks(spark):
    # 11 values 0..10: every decile rank is integer -> exact data values
    df = spark.createDataFrame([(float(i),) for i in range(11)], "v double")
    got = exact_quantiles(df, "v", [i / 10.0 for i in range(11)], num_partitions=3)
    assert got == [float(i) for i in range(11)]


def test_nulls_ignored_and_empty(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (3.0,), (None,)], "v double"
    )
    assert exact_quantiles(df, "v", [0.5]) == [2.0]
    empty = df.where(F.col("v").isNull())
    assert exact_quantiles(empty, "v", [0.5]) == [None]
    assert exact_quantiles(df, "v", []) == []


def test_heavily_duplicated_column(spark):
    # 50 distinct values x 200 repeats — the l_quantity shape
    values = [float(i % 50) for i in range(10000)]
    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = exact_quantiles(df, "v", [0.5], num_partitions=6)
    want = _duck_quantiles(values, [0.5])
    assert got[0] == pytest.approx(want[0], rel=0, abs=1e-12)


def test_interpolation_formula_exact(spark):
    # rank p*(n-1) with fractional part: lo + (hi-lo)*frac, bit-for-bit
    values = [10.0, 20.0, 40.0, 80.0]
    df = spark.createDataFrame([(v,) for v in values], "v double")
    (got,) = exact_quantiles(df, "v", [0.5])
    r = 0.5 * 3
    lo, hi = values[math.floor(r)], values[math.ceil(r)]
    assert got == lo + (hi - lo) * (r - math.floor(r)) == 30.0


# ---------------------------------------------------------------------------
# Property-based: exact_quantiles must agree with a NumPy linear-
# interpolation reference for ANY value multiset, partition count, and
# probability — including heavy ties, negatives, and single elements.
# Spark-session-per-example is too slow for hypothesis, so the property
# drives a batch of drawn cases through one session.
# ---------------------------------------------------------------------------
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

CASES = st.lists(
    st.tuples(
        st.lists(
            st.one_of(
                st.integers(-1000, 1000).map(float),
                st.floats(-1e6, 1e6, allow_nan=False, width=32),
            ),
            min_size=1,
            max_size=60,
        ),
        st.integers(1, 7),  # partitions
        st.floats(0.0, 1.0, allow_nan=False),
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=25, deadline=None)
@given(CASES)
def test_property_matches_numpy(spark, cases):
    for values, n_parts, p in cases:
        df = spark.createDataFrame([(v,) for v in values], "v double")
        (got,) = exact_quantiles(df, "v", [p], num_partitions=n_parts)
        want = float(np.percentile(np.array(values, dtype=np.float64),
                                   p * 100, method="linear"))
        assert got == pytest.approx(want, rel=0, abs=max(1e-9, abs(want) * 1e-12)), (
            values, n_parts, p,
        )


# ---------------------------------------------------------------------------
# weighted_quantiles
# ---------------------------------------------------------------------------
from gfw_pixetl_spark.functions.quantiles import weighted_quantiles


def _np_weighted(values, weights, p):
    """Reference: smallest v whose inclusive cumweight >= p * W."""
    import numpy as np

    order = np.argsort(values, kind="stable")
    v = np.array(values, dtype=float)[order]
    w = np.array(weights, dtype=float)[order]
    # aggregate ties
    uv, inv = np.unique(v, return_inverse=True)
    uw = np.zeros_like(uv)
    np.add.at(uw, inv, w)
    cum = np.cumsum(uw)
    t = p * cum[-1]
    if t <= 0:
        return float(uv[0])
    return float(uv[np.searchsorted(cum, t, side="left")])


def test_weighted_matches_reference(spark):
    rng = random.Random(11)
    rows = [
        (round(rng.uniform(0, 100), 2), float(rng.randint(1, 9)))
        for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, "v double, w double")
    ps = [0.0, 0.1, 0.5, 0.9, 1.0]
    got = weighted_quantiles(df, "v", "w", ps, num_partitions=5)
    for g, p in zip(got, ps):
        assert g == _np_weighted(*zip(*rows), p), p


def test_weighted_equal_weights_is_inclusive_quantile(spark):
    df = spark.createDataFrame(
        [(float(i), 1.0) for i in range(1, 11)], "v double, w double"
    )
    # t = 0.5*10 = 5 -> fifth value
    assert weighted_quantiles(df, "v", "w", [0.5]) == [5.0]
    assert weighted_quantiles(df, "v", "w", [0.0]) == [1.0]
    assert weighted_quantiles(df, "v", "w", [1.0]) == [10.0]


def test_weighted_ignores_bad_rows(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 0.0), (None, 3.0), (3.0, None), (9.0, 5.0)],
        "v double, w double",
    )
    # only (1,5) and (9,5) count: median target = 5 -> value 1
    assert weighted_quantiles(df, "v", "w", [0.5]) == [1.0]
    empty = df.where("v > 100")
    assert weighted_quantiles(empty, "v", "w", [0.5]) == [None]


# ---------------------------------------------------------------------------
# grouped_exact_quantiles
# ---------------------------------------------------------------------------
from gfw_pixetl_spark.functions.quantiles import grouped_exact_quantiles


def test_grouped_matches_duckdb_per_group(spark):
    rng = random.Random(5)
    rows = [
        (rng.choice(["a", "b", "c"]), round(rng.uniform(0, 1000), 2))
        for _ in range(4000)
    ] + [("tiny", 42.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    ps = [0.1, 0.5, 0.9]
    got = {
        (r["group"], r["p"]): r["value"]
        for r in grouped_exact_quantiles(df, "g", "v", ps, num_partitions=6).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    for g in ["a", "b", "c", "tiny"]:
        for p in ps:
            want = con.execute(
                f"SELECT quantile_cont(v, {p}) FROM t WHERE g = '{g}'"
            ).fetchone()[0]
            assert got[(g, p)] == pytest.approx(want, rel=0, abs=1e-9), (g, p)


def test_grouped_one_huge_group_spans_partitions(spark):
    # one group with 10k rows over 8 partitions + singleton groups
    rows = [("big", float(i)) for i in range(10000)] + [
        (f"s{j}", float(j)) for j in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        (r["group"], r["p"]): r["value"]
        for r in grouped_exact_quantiles(
            df, "g", "v", [0.0, 0.5, 1.0], num_partitions=8
        ).collect()
    }
    assert out[("big", 0.0)] == 0.0
    assert out[("big", 0.5)] == 4999.5
    assert out[("big", 1.0)] == 9999.0
    assert out[("s7", 0.5)] == 7.0


def test_grouped_weighted_matches_expanded(spark):
    """(g, v, w) rows must select EXACTLY what w expanded copies of
    (g, v) select — including interpolated ranks that land inside and
    between weighted runs, and groups split across partitions."""
    rng = random.Random(11)
    rows = [
        (rng.choice(["a", "b"]), float(rng.randint(0, 50)),
         rng.randint(1, 7))
        for _ in range(800)
    ] + [("solo", 3.25, 4)]
    wdf = spark.createDataFrame(rows, "g string, v double, w int")
    expanded = [(g, v) for g, v, w in rows for _ in range(w)]
    edf = spark.createDataFrame(expanded, "g string, v double")
    ps = [0.0, 0.25, 0.5, 0.9, 1.0]
    got_w = {
        (r["group"], r["p"]): r["value"]
        for r in grouped_exact_quantiles(
            wdf, "g", "v", ps, num_partitions=5, weight_col="w"
        ).collect()
    }
    got_e = {
        (r["group"], r["p"]): r["value"]
        for r in grouped_exact_quantiles(
            edf, "g", "v", ps, num_partitions=5
        ).collect()
    }
    assert got_w == got_e


# ---------------------------------------------------------------------------
# Histogram-refinement internals: deep refinement (tiny buckets + tiny
# collect threshold) must resolve the identical values as the default
# shallow path; caller-supplied superset bounds and the batched
# multi-column API must match the reference selections.
# ---------------------------------------------------------------------------
from gfw_pixetl_spark.functions import quantiles as Q


def _grouped_dict(df, ps, **kw):
    return {
        (r["group"], r["p"]): r["value"]
        for r in grouped_exact_quantiles(df, "g", "v", ps, **kw).collect()
    }


def test_deep_refinement_matches_shallow(spark, monkeypatch):
    rng = random.Random(3)
    rows = [
        (rng.choice(["a", "b"]), float(rng.randint(0, 100000)) / 7.0)
        for _ in range(4000)
    ] + [("a", -5.25)] * 40  # a heavy tied value
    df = spark.createDataFrame(rows, "g string, v double")
    ps = [0.0, 0.3, 0.5, 0.97, 1.0]
    base = _grouped_dict(df, ps)
    # force many histogram rounds: 8-bucket histograms, 8-row collects
    monkeypatch.setattr(Q, "_HIST_BUCKETS", 8)
    monkeypatch.setattr(Q, "_COLLECT_MAX", 8)
    assert _grouped_dict(df, ps) == base
    # and through the weighted ('reach') path
    wdf = spark.createDataFrame(
        [(v, float(rng.randint(1, 5))) for _, v in rows], "v double, w double"
    )
    monkeypatch.setattr(Q, "_HIST_BUCKETS", 1024)
    monkeypatch.setattr(Q, "_COLLECT_MAX", 65536)
    want_w = weighted_quantiles(wdf, "v", "w", ps)
    monkeypatch.setattr(Q, "_HIST_BUCKETS", 8)
    monkeypatch.setattr(Q, "_COLLECT_MAX", 8)
    assert weighted_quantiles(wdf, "v", "w", ps) == want_w


def test_caller_bounds_superset_is_exact(spark):
    rng = random.Random(9)
    rows = [
        (rng.choice(["x", "y"]), round(rng.uniform(10, 90), 3),
         rng.randint(1, 4))
        for _ in range(1500)
    ]
    df = spark.createDataFrame(rows, "g string, v double, w int")
    ps = [0.25, 0.5, 0.75]
    base = _grouped_dict(df, ps, weight_col="w")
    stats: dict = {}
    for g, v, w in rows:
        lo, hi, n = stats.get(g, (v, v, 0))
        stats[g] = (min(lo, v), max(hi, v), n + w)
    loose = {g: (lo - 100.0, hi + 55.0, n) for g, (lo, hi, n) in stats.items()}
    assert _grouped_dict(df, ps, weight_col="w", bounds=loose) == base


def test_exact_quantiles_cols_matches_single(spark):
    rng = random.Random(21)
    rows = [
        (float(rng.randint(0, 500)), rng.uniform(-3.0, 3.0))
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, "a double, b double")
    ps = [0.1, 0.5, 0.9]
    batched = Q.exact_quantiles_cols(df, ["a", "b"], ps)
    assert batched["a"] == exact_quantiles(df, "a", ps)
    assert batched["b"] == exact_quantiles(df, "b", ps)

"""Unit tests for operator primitives on tiny in-memory frames —
the analog of the reference's kernel-level tests
(gfw_pixetl tests/tiles/utils/test_array_utils.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gfw_pixetl_spark.operators.filters import (
    anti_join, range_join, semi_join, subset_filter,
)
from gfw_pixetl_spark.operators.rasterize import ordered_paint, paint_count
from gfw_pixetl_spark.operators.resample import downsample, mode_downsample
from gfw_pixetl_spark.operators.stats import band_stats, histogram


def test_subset_filter(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    out = subset_filter(df, "v", ["a", "c"]).collect()
    assert sorted(r.k for r in out) == [1, 3]


def test_semi_and_anti_join(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    right = spark.createDataFrame([(2,), (3,), (4,)], ["rk"])
    semi = semi_join(left, right, left["k"] == right["rk"]).collect()
    anti = anti_join(left, right, left["k"] == right["rk"]).collect()
    assert sorted(r.k for r in semi) == [2, 3]
    assert [r.k for r in anti] == [1]


def test_range_join(spark):
    facts = spark.createDataFrame([(5.0,), (15.0,), (25.0,)], ["v"])
    buckets = spark.createDataFrame(
        [(0.0, 10.0), (10.0, 20.0)], ["lo", "hi"]
    )
    out = range_join(facts, buckets, "v").select("v", "lo").collect()
    got = {(r.v, r.lo) for r in out}
    assert got == {(5.0, 0.0), (15.0, 10.0)}  # 25 falls outside all buckets


def test_ordered_paint_last_wins(spark):
    # same pixel painted twice; higher ts wins regardless of row order
    df = spark.createDataFrame(
        [(1, 1, 10.0, 2, 100), (1, 1, 99.0, 5, 101), (2, 2, 7.0, 1, 102)],
        ["px", "py", "value", "ts", "event_id"],
    )
    out = ordered_paint(
        df, ["px", "py"], "value", [F.col("ts"), F.col("event_id")],
        out_col="painted",
    ).collect()
    got = {(r.px, r.py): r.painted for r in out}
    assert got == {(1, 1): 99.0, (2, 2): 7.0}


def test_paint_count(spark):
    df = spark.createDataFrame([(1, 1), (1, 1), (2, 2)], ["px", "py"])
    out = paint_count(df, ["px", "py"]).collect()
    got = {(r.px, r.py): r.value for r in out}
    assert got == {(1, 1): 2, (2, 2): 1}


def test_mode_downsample_tiebreak(spark):
    # 2x 'a'=5, 2x 'a'=3 -> tie on count, smallest value (3) wins
    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("a", 3), ("a", 3), ("b", 9)], ["g", "v"]
    )
    out = mode_downsample(df, ["g"], "v", out_col="m").collect()
    got = {r.g: r.m for r in out}
    assert got == {"a": 3, "b": 9}


def test_downsample_methods(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0)], ["g", "v"]
    )
    for method, expected in [
        ("average", 2.5), ("min", 1.0), ("max", 4.0), ("sum", 10.0),
        ("med", 2.5),
    ]:
        out = downsample(df, ["g"], "v", method, out_col="o").collect()
        assert abs(out[0].o - expected) < 1e-9, method


def test_histogram_clamps_edges(spark):
    # values below lo land in bucket 0, above hi in the last bucket
    df = spark.createDataFrame([(-5.0,), (0.5,), (9.5,), (20.0,)], ["v"])
    out = histogram(df, "v", 0.0, 10.0, 10).collect()
    got = {r.bucket: r["count"] for r in out}
    assert got == {0: 2, 9: 2}


def test_band_stats(spark):
    df = spark.createDataFrame([("b", 1.0), ("b", 3.0)], ["g", "v"])
    out = band_stats(df, "v", ["g"]).collect()[0]
    assert out["min"] == 1.0 and out["max"] == 3.0
    assert abs(out["mean"] - 2.0) < 1e-9
    assert out["count"] == 2


def test_asof_join_semantics(spark):
    """Hand-built as-of: equal-ts right row matches (>=), no-prior rows
    get nulls, latest prior wins."""
    from datetime import datetime

    from gfw_pixetl_spark.operators.asof import asof_join

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(5), "a"), (1, t(10), "b"), (2, t(3), "c"), (3, t(9), "d")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, t(5), 50.0), (1, t(7), 70.0), (2, t(4), 40.0)],
        "user_id long, ts timestamp, px double",
    )
    got = {
        (r.user_id, r.ts.second): (r.px_r, r.ts_r.second if r.ts_r else None)
        for r in asof_join(left, right, keys=["user_id"]).collect()
    }
    assert got == {
        (1, 5): (50.0, 5),   # equal ts matches
        (1, 10): (70.0, 7),  # latest prior wins
        (2, 3): (None, None),  # right row is later -> no match
        (3, 9): (None, None),  # key absent on right
    }


def test_asof_join_matches_bruteforce_random(spark):
    """Randomized as-of vs an in-Python brute force: for each left row,
    the matched right row is the max right.ts <= left.ts per key."""
    from datetime import datetime, timedelta

    import numpy as np

    from gfw_pixetl_spark.operators.asof import asof_join

    rng = np.random.default_rng(11)
    t0 = datetime(2024, 1, 1)
    left_rows = [
        (int(u), t0 + timedelta(seconds=int(s)), float(v))
        for u, s, v in zip(
            rng.integers(0, 6, 80), rng.integers(0, 3600, 80),
            rng.uniform(0, 1, 80),
        )
    ]
    # unique (key, ts) on the right, as the operator requires
    seen = set()
    right_rows = []
    for u, s, v in zip(
        rng.integers(0, 6, 60), rng.integers(0, 3600, 60),
        rng.uniform(0, 1, 60),
    ):
        if (int(u), int(s)) not in seen:
            seen.add((int(u), int(s)))
            right_rows.append((int(u), t0 + timedelta(seconds=int(s)), float(v)))
    left = spark.createDataFrame(left_rows, "k long, ts timestamp, lv double")
    right = spark.createDataFrame(right_rows, "k long, ts timestamp, rv double")

    got = {
        (r.k, r.ts, r.lv): (r.ts_r, r.rv_r)
        for r in asof_join(left, right, keys=["k"]).collect()
    }
    assert len(got) == len(set((r[0], r[1], r[2]) for r in left_rows))
    for k, ts, lv in left_rows:
        cands = [(rts, rv) for rk, rts, rv in right_rows
                 if rk == k and rts <= ts]
        expected = max(cands, key=lambda x: x[0]) if cands else (None, None)
        assert got[(k, ts, lv)] == expected


def test_cdc_compact_latest_delete_and_resurrect(spark):
    """Latest-wins: a delete suppresses the key only while it is the
    newest version; a later upsert resurrects it."""
    from gfw_pixetl_spark.operators.cdc import compact_latest

    rows = [
        (1, 10.0, 0, "U"), (1, 11.0, 5, "U"),            # plain upsert
        (2, 20.0, 0, "U"), (2, None, 3, "D"),            # deleted
        (3, 30.0, 0, "U"), (3, None, 2, "D"), (3, 33.0, 7, "U"),  # resurrected
    ]
    df = spark.createDataFrame(
        rows, "key long, val double, version long, op string"
    )
    got = {r.key: (r.val, r.version, r.n_versions)
           for r in compact_latest(df).collect()}
    assert got == {1: (11.0, 5, 2), 3: (33.0, 7, 3)}

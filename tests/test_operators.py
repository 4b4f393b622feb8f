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

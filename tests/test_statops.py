"""Unit tests for the statistics-family building blocks added in round 4:
the bucketed global cumulative scan (shared by KS / Mann-Whitney /
Spearman), the Luhn construction, and the degree-oriented triangle
count — each checked against a straightforward local recomputation."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from gfw_pixetl_spark.harness.statops import _bucketed_cum


def test_bucketed_cum_matches_sorted_prefix(spark):
    rng = random.Random(7)
    vals = sorted({rng.randrange(-5000, 5000) for _ in range(400)})
    rows = [(v, rng.randrange(1, 9), rng.randrange(0, 4)) for v in vals]
    df = spark.createDataFrame(rows, "x bigint, a bigint, b bigint")
    out = {
        r["x"]: (r["cum_a"], r["cum_b"])
        for r in _bucketed_cum(df, "x", ["a", "b"]).collect()
    }
    ca = cb = 0
    for v, a, b in rows:  # rows already ascending by x
        ca, cb = ca + a, cb + b
        assert out[v] == (ca, cb), f"mismatch at {v}"


def test_bucketed_cum_single_value_domain(spark):
    df = spark.createDataFrame([(42, 3)], "x bigint, k bigint")
    row = _bucketed_cum(df, "x", ["k"]).collect()[0]
    assert row["cum_k"] == 3


def test_luhn_check_digit_validates():
    # replicate q333's construction locally: any 15-digit base + the
    # computed check digit must pass the verifier, +1 must fail
    def luhn_sum(digits):  # position 1 = leftmost, doubling on odd idx
        s = 0
        for i, d in enumerate(digits, start=1):
            if i % 2 == 1:
                t = 2 * d
                s += t - 9 if t > 9 else t
            else:
                s += d
        return s

    rng = random.Random(3)
    for _ in range(50):
        base = [rng.randrange(10) for _ in range(15)]
        check = (10 - luhn_sum(base) % 10) % 10
        assert luhn_sum(base + [check]) % 10 == 0
        assert luhn_sum(base + [(check + 1) % 10]) % 10 != 0


def test_degree_oriented_triangles(spark):
    # a 4-clique plus a pendant edge: C(4,3)=4 triangles; every clique
    # node touches 3 of them, the pendant nodes none
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    e = spark.createDataFrame(edges, "u bigint, v bigint")
    deg = (e.select(F.col("u").alias("node"))
           .unionAll(e.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").alias("d")))
    okey = deg.select("node",
                      (F.col("d") * 1000000000 + F.col("node"))
                      .alias("k"))
    ku = okey.select(F.col("node").alias("u"), F.col("k").alias("ku"))
    kv = okey.select(F.col("node").alias("v"), F.col("k").alias("kv"))
    oe = (e.join(ku, "u").join(kv, "v")
          .select(F.when(F.col("ku") < F.col("kv"), F.col("u"))
                  .otherwise(F.col("v")).alias("a"),
                  F.when(F.col("ku") < F.col("kv"), F.col("v"))
                  .otherwise(F.col("u")).alias("b"),
                  F.greatest("ku", "kv").alias("bk")))
    e1 = oe.select("a", F.col("b").alias("x"), F.col("bk").alias("xk"))
    e2 = oe.select("a", F.col("b").alias("y"), F.col("bk").alias("yk"))
    e3 = oe.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tri = (e1.join(e2, "a").filter(F.col("xk") < F.col("yk"))
           .join(e3, ["x", "y"])
           .select(F.explode(F.array("a", "x", "y")).alias("corner"))
           .groupBy("corner").agg(F.count("*").alias("t")))
    got = {r["corner"]: r["t"] for r in tri.collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}

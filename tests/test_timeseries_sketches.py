"""Unit tests for gap-fill/LOCF, the portable HLL sketch, and weighted
reservoir sampling — properties the oracle hash-match can't see
(accuracy vs exact counts, partition invariance, density of the filled
series, weight bias)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gfw_pixetl_spark.functions.sampling import weighted_reservoir_sample
from gfw_pixetl_spark.functions.sketches import hll_distinct
from gfw_pixetl_spark.functions.timeseries import gapfill_locf
from gfw_pixetl_spark.harness import load
from tests.conftest import SF_SMOKE


def test_hll_within_rse_of_exact(spark):
    ev = load(spark, SF_SMOKE, "events")
    est = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_distinct(ev, ["event_type"], "user_id").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k in exact:
        # 1.04/sqrt(4096) = 1.6% RSE; 5% is > 3 sigma.
        assert abs(est[k] - exact[k]) <= max(0.05 * exact[k], 2), (
            k, est[k], exact[k],
        )


def test_hll_partition_invariant(spark):
    ev = load(spark, SF_SMOKE, "events")
    a = sorted(
        hll_distinct(ev, ["event_type"], "user_id").collect()
    )
    b = sorted(
        hll_distinct(ev.repartition(7), ["event_type"], "user_id").collect()
    )
    assert a == b


def test_gapfill_dense_and_locf(spark):
    rows = [
        ("a", 100, 7.0),
        ("a", 400, 9.0),  # gap at 200, 300
        ("b", 200, 1.0),
    ]
    df = spark.createDataFrame(rows, "g string, bucket long, v double")
    out = gapfill_locf(df, ["g"], "bucket", ["v"], step=100)
    got = {(r["g"], r["bucket"]): (r["v"], r["v_locf"]) for r in out.collect()}
    assert got == {
        ("a", 100): (7.0, 7.0),
        ("a", 200): (None, 7.0),
        ("a", 300): (None, 7.0),
        ("a", 400): (9.0, 9.0),
        ("b", 200): (1.0, 1.0),
    }


def test_gapfill_max_buckets_guard(spark):
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 10_000, 1.0)], "g string, bucket long, v double"
    )
    with pytest.raises(Exception, match="max_buckets"):
        gapfill_locf(
            df, ["g"], "bucket", ["v"], step=1, max_buckets=100
        ).collect()


def test_cms_never_underestimates_and_is_tight_when_wide(spark):
    from gfw_pixetl_spark.functions.sketches import (
        cms_probe, count_min_sketch,
    )

    ev = load(spark, SF_SMOKE, "events")
    sketch = count_min_sketch(ev, "user_id", depth=5, width=2048)
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_n"))
    est = cms_probe(sketch, exact, "user_id", depth=5, width=2048)
    rows = est.collect()
    assert len(rows) == exact.count()
    for r in rows:
        assert r["est_n"] >= r["exact_n"], r  # CMS one-sided error
    # sf0.001 has few distinct users vs 5x2048 cells: collisions are
    # rare enough that most estimates are exact.
    exact_frac = sum(r["est_n"] == r["exact_n"] for r in rows) / len(rows)
    assert exact_frac >= 0.9


def test_cms_partition_invariant(spark):
    from gfw_pixetl_spark.functions.sketches import count_min_sketch

    ev = load(spark, SF_SMOKE, "events")
    a = sorted(map(tuple, count_min_sketch(ev, "user_id").collect()))
    b = sorted(
        map(tuple, count_min_sketch(ev.repartition(9), "user_id").collect())
    )
    assert a == b


def test_pack_sequences_conservation_and_capacity(spark):
    """Slices reassemble every document exactly (per-doc n_in_chunk sums
    to its length, begin_in_doc is contiguous) and every chunk except
    each shard's last is filled to capacity."""
    from gfw_pixetl_spark.functions.packing import pack_sequences

    docs = load(spark, SF_SMOKE, "documents")
    cap = 1000
    out = pack_sequences(
        docs, "source", "doc_id", "n_chars", capacity=cap
    ).collect()

    per_doc: dict[int, int] = {}
    per_chunk: dict[tuple, int] = {}
    for r in out:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_in_chunk"]
        key = (r["source"], r["chunk_id"])
        per_chunk[key] = per_chunk.get(key, 0) + r["n_in_chunk"]
        assert 0 <= r["begin_in_chunk"] < cap
        assert r["n_in_chunk"] >= 1

    lens = {
        r["doc_id"]: r["n_chars"]
        for r in docs.select("doc_id", "n_chars").collect()
        if r["n_chars"] > 0
    }
    assert per_doc == lens
    last = {
        src: max(c for s, c in per_chunk if s == src)
        for src, _ in per_chunk
    }
    for (src, c), tot in per_chunk.items():
        if c < last[src]:
            assert tot == cap, (src, c, tot)
        else:
            assert tot <= cap


def test_salted_join_matches_plain_join(spark):
    from gfw_pixetl_spark.operators.skew import salted_join

    facts = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold") for i in range(1000)],
        "fid long, k string",
    )
    dim = spark.createDataFrame(
        [("hot", 1), ("cold", 2), ("orphan", 3)], "k string, v long"
    )
    got = sorted(
        (r["fid"], r["v"]) for r in salted_join(facts, dim, "k").collect()
    )
    want = sorted(
        (r["fid"], r["v"]) for r in facts.join(dim, "k").collect()
    )
    assert got == want
    # left join keeps unmatched facts with null dim values
    missing = facts.withColumn("k", F.concat(F.col("k"), F.lit("x")))
    left = salted_join(missing, dim, "k", how="left")
    assert left.count() == 1000
    assert left.filter(F.col("v").isNull()).count() == 1000


def test_symdelete_blocking_has_full_recall(spark):
    """Deletion-neighborhood blocking must find every edit-distance-1
    pair the brute force finds: substitutions, insertions/deletions,
    at string boundaries and in repeated-char runs."""
    from gfw_pixetl_spark.functions.dedup import fuzzy_pairs_symdelete

    names = [
        "alpha", "alphb", "alpha1", "lpha", "aalpha",  # sub/ins/del
        "beta", "betta", "bett", "zeta",
        "aaa", "aab", "ab", "ba",
    ]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "id long, name string"
    )
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs_symdelete(df, "id", "name").collect()
    }

    def lev(a, b):
        import numpy as np

        d = np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (ca != cb)
                )
        return int(d[len(b)])

    want = {
        (i, j, lev(a, b))
        for i, a in enumerate(names)
        for j, b in enumerate(names)
        if i < j and lev(a, b) <= 1
    }
    assert got == want


def test_weighted_sample_prefers_heavy_rows(spark):
    # 500 light docs (w=1) + 500 heavy (w=50): a 50-doc sample should be
    # dominated by heavy rows (each heavy ~50x the inclusion odds).
    rows = [(i, 1 if i < 500 else 50) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, wt long")
    out = weighted_reservoir_sample(df, k=50, weight_col="wt")
    picked = [r["wt"] for r in out.collect()]
    assert len(picked) == 50
    assert sum(1 for w in picked if w == 50) >= 40


def test_weighted_sample_stratified_exact_k(spark):
    docs = load(spark, SF_SMOKE, "documents")
    out = weighted_reservoir_sample(
        docs, k=5, weight_col="n_chars", strata_col="lang"
    )
    per = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in per.items():
        assert n == min(5, sizes[lang])
    # partition-invariant: same doc_ids after a reshuffle
    again = weighted_reservoir_sample(
        docs.repartition(13), k=5, weight_col="n_chars", strata_col="lang"
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_kmv_within_rse_of_exact(spark):
    from gfw_pixetl_spark.functions.sketches import kmv_distinct

    rows = [(f"g{i % 3}", f"v{i % (700 * (1 + i % 3))}")
            for i in range(6000)]
    df = spark.createDataFrame(rows, "g string, v string")
    exact = {r.g: r.n for r in
             df.groupBy("g").agg(
                 F.countDistinct("v").alias("n")).collect()}
    got = {r.g: r.approx_distinct for r in
           kmv_distinct(df, ["g"], "v", k=128).collect()}
    for g, n in exact.items():
        # KMV RSE ~ 1/sqrt(k-2) ~ 9% at k=128; allow 4 sigma
        assert abs(got[g] - n) <= max(4 * n / (126 ** 0.5), 2), (g, got[g], n)


def test_kmv_small_groups_exact(spark):
    from gfw_pixetl_spark.functions.sketches import kmv_distinct

    rows = [("a", f"v{i}") for i in range(50)] + [("b", "only")]
    df = spark.createDataFrame(rows * 3, "g string, v string")
    got = {r.g: r.approx_distinct for r in
           kmv_distinct(df, ["g"], "v", k=256).collect()}
    assert got == {"a": 50, "b": 1}  # below k: the sketch IS the set


def test_kmv_partition_invariant(spark):
    from gfw_pixetl_spark.functions.sketches import kmv_distinct

    rows = [("g", f"x{i}") for i in range(3000)]
    df1 = spark.createDataFrame(rows, "g string, v string").repartition(1)
    df32 = spark.createDataFrame(rows, "g string, v string").repartition(32)
    a = kmv_distinct(df1, ["g"], "v", k=64).collect()[0].approx_distinct
    b = kmv_distinct(df32, ["g"], "v", k=64).collect()[0].approx_distinct
    assert a == b


def test_acf_constant_series_and_known_alternation(spark):
    from gfw_pixetl_spark.functions.timeseries import acf_integer

    # alternating 0/10 over an even horizon: r_1 = -1 + O(1/N) exactly
    # computable; verify against a NumPy reference on the same series.
    import numpy as np

    xs = [(t, 10 if t % 2 == 0 else 0) for t in range(40)]
    df = spark.createDataFrame(xs, "t long, x long")
    got = {r.lag: r.acf for r in
           acf_integer(df, "t", "x", max_lag=3).collect()}
    x = np.array([v for _, v in xs], dtype=float)
    mu = x.mean()
    den = ((x - mu) ** 2).sum()
    for lag in (1, 2, 3):
        ref = ((x[:-lag] - mu) * (x[lag:] - mu)).sum() / den
        assert abs(got[lag] - ref) < 1e-9, (lag, got[lag], ref)


def test_acf_treats_missing_days_as_zero(spark):
    from gfw_pixetl_spark.functions.timeseries import acf_integer

    import numpy as np

    present = [(0, 4), (1, 7), (3, 2), (6, 9)]  # t=2,4,5 absent -> 0
    df = spark.createDataFrame(present, "t long, x long")
    got = {r.lag: r.acf for r in
           acf_integer(df, "t", "x", max_lag=2).collect()}
    x = np.zeros(7)
    for t, v in present:
        x[t] = v
    mu = x.mean()
    den = ((x - mu) ** 2).sum()
    for lag in (1, 2):
        ref = ((x[:-lag] - mu) * (x[lag:] - mu)).sum() / den
        assert abs(got[lag] - round(ref, 6)) < 1e-6


def test_kmv_intersection_tracks_true_overlap(spark):
    """Inclusion-exclusion overlap estimate lands near truth on two
    event types with a known 50% user overlap."""
    from gfw_pixetl_spark import harness

    rows = ([("A", u) for u in range(2000)]
            + [("B", u) for u in range(1000, 3000)])
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    df.createOrReplaceTempView("_kmv_ix_demo")
    # run the q284 plan inline against the synthetic frame
    import tempfile

    import pyspark.sql.functions as F  # noqa: F401

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = harness.QUERIES["q284_kmv_intersection"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    # true: |A|=2000 |B|=2000 |A n B|=1000 |A u B|=3000, jaccard=1/3.
    # rho-estimator: stderr(jaccard) ~ sqrt(p(1-p)/k) ~ 0.042 at k=128,
    # intersection stderr ~ that x |union| ~ 125; allow ~3.5 sigma.
    assert abs(r.est_intersection - 1000) < 450
    assert abs(r.est_jaccard - 1 / 3) < 0.15

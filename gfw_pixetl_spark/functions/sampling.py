"""Deterministic sampling operators for training-data curation.

Random sampling is useless in a reproducible pipeline — every operator
here derives its randomness from md5 of the data itself, so any engine
(and any re-run over re-partitioned input) selects the identical subset.
The md5-derived orderings/buckets are uniform enough for curation
purposes and, unlike ``rand()``, survive retries, speculative execution,
and engine swaps bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .hashing import md5_int64


def domain_capped_sample(
    df: DataFrame,
    key: str = "source",
    k: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cap the corpus at ``k`` documents per domain (the classic
    anti-domination rule in web-corpus curation): rank docs within each
    domain by a deterministic hash order and keep rank <= k.

    One shuffle (the window partition). A pathologically hot domain makes
    one partition large, but the per-row work is a hash compare — rank
    truncation at cluster scale would add a pre-aggregation
    (approx top-k per partition, then exact within survivors) if profiling
    ever shows a straggler.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(key).orderBy(h, F.col(id_col))
    return (
        df.select(id_col, key)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )


def weighted_reservoir_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    strata_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    each row draws a deterministic uniform u from md5(id) and is ranked
    by ln(u)/w — the top-k ranks are a weighted sample where inclusion
    probability scales with ``weight_col``. ln(u)/w is the monotone
    log-transform of the classic u^(1/w) key (better FP behavior: no
    pow of two near-unit arguments).

    Distributed shape: rank via window top-k — with ``strata_col`` the
    partition is the stratum; without, a single ordered limit-k, which
    Spark executes as per-partition partial top-k + merge (TakeOrdered),
    never a full sort of the corpus.
    """
    u = (md5_int64(F.col(id_col).cast("string")) + 1) / F.lit(
        float((1 << 60) + 1)
    )
    key = F.log(u) / F.col(weight_col)
    ranked = df.withColumn("_key", key)
    if strata_col is None:
        out = ranked.orderBy(F.col("_key").desc(), id_col).limit(k)
        return out.select(id_col, weight_col)
    w = Window.partitionBy(strata_col).orderBy(F.col("_key").desc(), id_col)
    return (
        ranked.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(id_col, strata_col, weight_col, "rk")
    )


def hash_stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    rates: dict[str, int] | None = None,
    default_rate: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Deterministic Bernoulli sampling with per-stratum rates (percent):
    keep a row iff md5(text) mod 100 < rate(stratum). Map-only — no
    shuffle at all — and the filter pushes below any downstream agg.

    This is how a 100 TB corpus gets down-weighted per language/source
    without a global count or sort: the decision is local to the row.
    """
    rates = rates or {}
    bucket = F.pmod(md5_int64(F.col(text_col)), F.lit(100))
    rate = F.lit(default_rate)
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, r).otherwise(rate)
    return (
        df.withColumn("bucket", bucket)
        .filter(F.col("bucket") < rate)
        .select("doc_id", strata_col, "bucket")
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 5,
    test_pct: int = 5,
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic, stratification-free 3-way split: bucket =
    md5(id || salt) mod 100; test takes the first ``test_pct`` buckets,
    val the next ``val_pct``, train the rest. Map-only (the decision is
    row-local, like :func:`hash_stratified_sample`), reproducible across
    runs/engines, and stable under corpus growth — a document's split
    never changes when other documents arrive, which is the property
    that keeps eval sets uncontaminated across dataset versions.
    """
    bucket = F.pmod(
        md5_int64(F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))),
        F.lit(100),
    )
    split = (
        F.when(bucket < test_pct, "test")
        .when(bucket < test_pct + val_pct, "val")
        .otherwise("train")
    )
    return df.withColumn("split", split)


def budget_select(
    df: DataFrame,
    score_col: str,
    cost_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> DataFrame:
    """Budgeted greedy selection: take documents in descending
    ``score_col`` order until the running sum of ``cost_col`` would
    exceed ``budget`` — the token-budget mix-selection step every
    pretraining data plan runs ("best docs until N tokens").

    The global prefix sum is computed WITHOUT a single-task global
    window (the naive ``Window.orderBy`` with no partition key): scores
    in [0, 1) bucket into ``n_buckets`` fixed value-domain ranges, each
    bucket cumsums independently (the window partitions by bucket), and
    the <= n_buckets bucket totals cumulate in a broadcast 1-row-per-
    bucket join — the classic distributed scan. Deterministic: fixed
    bucket boundaries (no sampled range partitioner), ties broken by
    ``id_col``. Returns the selected rows with their running total.
    """
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.col(score_col) * n_buckets).cast("int"))
    scored = df.withColumn("_bucket", bucket)
    per_bucket = scored.groupBy("_bucket").agg(
        F.sum(cost_col).alias("_bsum"))
    # cumulative cost of all STRICTLY BETTER buckets (higher score):
    # n_buckets rows — the window below runs on dimension-sized data
    wb = (Window.orderBy(F.col("_bucket").desc())
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = per_bucket.withColumn(
        "_boff", F.coalesce(F.sum("_bsum").over(wb), F.lit(0))).drop("_bsum")
    win = (Window.partitionBy("_bucket")
           .orderBy(F.col(score_col).desc(), F.col(id_col).asc()))
    return (
        scored.join(F.broadcast(offsets), "_bucket")
        .withColumn("_run",
                    F.sum(cost_col).over(win) + F.col("_boff"))
        .filter(F.col("_run") <= budget)
        .drop("_bucket", "_boff")
        .withColumnRenamed("_run", "running_cost")
    )

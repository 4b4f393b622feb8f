"""Time-series and sketch harness queries: hypertable-style gap-fill +
LOCF, engine-portable HyperLogLog distinct, weighted reservoir sampling,
and CUBE multi-dimensional totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.dedup import fuzzy_pairs_symdelete
from ..functions.packing import pack_sequences
from ..functions.hashing import md5_int64_sql
from ..functions.sampling import weighted_reservoir_sample
from ..functions.sketches import (
    cms_heavy_hitters_sql, cms_probe, count_min_sketch,
    hll_distinct, hll_distinct_sql, kmv_distinct, kmv_distinct_sql,
    kmv_set_ops,
    kmv_set_ops_sql,
)
from ..functions.timeseries import acf_integer, gapfill_locf
from . import load, register


# --------------------------------------------------------------------------
# q86 — time_bucket gap-fill + LOCF: hourly event counts per type,
# densified onto a per-series spine (distributed sequence+explode), with
# last-observation-carried-forward. The TimescaleDB
# time_bucket_gapfill/locf shape re-expressed as join + running window.
# --------------------------------------------------------------------------
@register(
    "q86_gapfill_locf",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    ext AS (
      SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx
      FROM b GROUP BY 1
    ),
    spine AS (
      SELECT event_type, unnest(generate_series(mn, mx, 3600)) AS bucket
      FROM ext
    ),
    j AS (
      SELECT s.event_type, s.bucket, b.n
      FROM spine s LEFT JOIN b USING (event_type, bucket)
    )
    SELECT event_type, bucket, COALESCE(n, 0) AS n_filled,
           last_value(n IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket
           ) AS n_locf
    FROM j
    """,
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bucketed = ev.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("bucket"),
    ).agg(F.count("*").alias("n"))
    dense = gapfill_locf(
        bucketed,
        series_cols=["event_type"],
        bucket_col="bucket",
        value_cols=["n"],
        step=3600,
    )
    return dense.select(
        "event_type",
        "bucket",
        F.coalesce("n", F.lit(0)).alias("n_filled"),
        "n_locf",
    )


# --------------------------------------------------------------------------
# q87 — HyperLogLog distinct users per event type, computed as a
# relational plan over the portable md5 hash so the DuckDB oracle
# reproduces the estimate bit-for-bit (native approx_count_distinct on
# either engine could not be oracled). Register state is 4096 rows per
# group no matter the input size.
# --------------------------------------------------------------------------
@register(
    "q87_hll_distinct",
    oracle=hll_distinct_sql("events", ["event_type"], "user_id", p=12),
)
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return hll_distinct(ev, ["event_type"], "user_id", p=12)


# --------------------------------------------------------------------------
# q88 — weighted reservoir sample (Efraimidis–Spirakis A-ES): top-20
# docs per language, inclusion probability proportional to n_chars,
# deterministic via md5-derived uniforms. Corpus curation's "sample by
# quality weight, reproducibly" primitive.
# --------------------------------------------------------------------------
@register(
    "q88_weighted_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             ln(({md5_int64_sql('CAST(doc_id AS VARCHAR)')} + 1)
                / 1152921504606846977.0) / n_chars AS k
      FROM documents
    ),
    r AS (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (
               PARTITION BY lang ORDER BY k DESC, doc_id
             ) AS rn
      FROM keyed
    )
    SELECT doc_id, lang, n_chars, CAST(rn AS BIGINT) AS rk
    FROM r WHERE rn <= 20
    """,
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return weighted_reservoir_sample(
        docs, k=20, weight_col="n_chars", strata_col="lang"
    )


# --------------------------------------------------------------------------
# q90 — heavy hitters via count-min sketch: top-20 users by exact count,
# each with the CMS frequency estimate (exact-or-over, never under).
# Sketch state is depth*width cells no matter the stream size; the probe
# side broadcasts. Portable hashes make the oracle rebuild the identical
# sketch cell-for-cell.
# --------------------------------------------------------------------------
@register(
    "q90_heavy_hitters_cms",
    oracle=cms_heavy_hitters_sql("events", "user_id", k=20),
)
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    sketch = count_min_sketch(ev, "user_id")
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.desc("exact_n"), "user_id")
        .limit(20)
    )
    return cms_probe(sketch, exact, "user_id")


# --------------------------------------------------------------------------
# q91 — fuzzy entity-resolution join: customer-name pairs within edit
# distance 1, blocked by SymSpell deletion neighborhoods (linear key
# volume) + levenshtein verify. The oracle blocks by the SAME deletion-
# neighborhood identity (two strings within distance 1 ALWAYS share a
# delete-<=1 key: delete the edited position from whichever side has
# it) and then verifies with levenshtein — exact by construction, and
# it replaces the brute-force O(n^2) form that ran >2 min at sf0.1.
# --------------------------------------------------------------------------
@register(
    "q91_fuzzy_join",
    oracle="""
    WITH keys AS (
      SELECT c_custkey, c_name, c_name AS k FROM customer
      UNION ALL
      SELECT c_custkey, c_name,
             concat(substr(c_name, 1, i - 1), substr(c_name, i + 1))
      FROM customer, generate_series(1, 64) t(i)
      WHERE i <= length(c_name)
    ), cand AS (
      SELECT DISTINCT a.c_custkey AS id_a, b.c_custkey AS id_b,
             a.c_name AS na, b.c_name AS nb
      FROM keys a JOIN keys b
        ON a.k = b.k AND a.c_custkey < b.c_custkey
    )
    SELECT id_a, id_b,
           CAST(levenshtein(na, nb) AS BIGINT) AS dist
    FROM cand WHERE levenshtein(na, nb) <= 1
    """,
)
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return fuzzy_pairs_symdelete(cust, "c_custkey", "c_name", max_dist=1)


# --------------------------------------------------------------------------
# q92 — sequence packing (concat-and-chunk): documents concatenated in
# deterministic order per shard (source) and sliced into 4096-char
# training sequences, docs straddling boundaries. Pure offset math —
# running sum + explode over the spanned chunk range — parallel across
# shards.
# --------------------------------------------------------------------------
@register(
    "q92_sequence_packing",
    oracle="""
    WITH spans AS (
      SELECT source, doc_id,
             CAST(SUM(n_chars) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS e
      FROM documents
    ),
    nz AS (
      SELECT s.source, s.doc_id, s.e, s.e - d.n_chars AS st
      FROM spans s JOIN documents d USING (source, doc_id)
      WHERE d.n_chars > 0
    ),
    ch AS (
      SELECT source, doc_id, st, e,
             unnest(generate_series(st // 4096, (e - 1) // 4096))
               AS chunk_id
      FROM nz
    )
    SELECT source, doc_id, chunk_id,
           greatest(st, chunk_id * 4096) - chunk_id * 4096
             AS begin_in_chunk,
           greatest(st, chunk_id * 4096) - st AS begin_in_doc,
           least(e, (chunk_id + 1) * 4096) - greatest(st, chunk_id * 4096)
             AS n_in_chunk
    FROM ch
    """,
)
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return pack_sequences(
        docs, shard_col="source", id_col="doc_id",
        len_col="n_chars", capacity=4096,
    )


# --------------------------------------------------------------------------
# q89 — CUBE: doc stats across every (lang, source) subset combination
# in one pass (Spark expands grouping sets without rescanning; partial
# aggregation still applies per grouping set).
# --------------------------------------------------------------------------
@register(
    "q89_cube",
    oracle="""
    SELECT lang, source, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY CUBE(lang, source)
    """,
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.cube("lang", "source").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# q182 — truncated EWMA smoothing per user: 20 unrolled lag() terms with
# (1-a)^j weights (a = 0.2), one window sort per key. The truncation is
# the scale decision: recursive EWMA serializes per key and the
# normalized closed form overflows as (1/(1-a))^t, while the horizon
# form is codegen end-to-end and bit-replayable. Oracle unrolls the
# identical expression.
# --------------------------------------------------------------------------
def _ewma_terms() -> tuple[str, str]:
    nums, dens = [], []
    for j in range(20):
        w = repr((1.0 - 0.2) ** j)
        lg = f"lag(value, {j}) OVER w"
        nums.append(f"COALESCE({lg}, 0.0) * {w}")
        dens.append(f"CASE WHEN {lg} IS NOT NULL THEN {w} ELSE 0.0 END")
    return " + ".join(nums), " + ".join(dens)


_EWMA_NUM, _EWMA_DEN = _ewma_terms()


@register(
    "q182_ewma",
    oracle=f"""
    SELECT user_id, ts, event_id, value,
           round(({_EWMA_NUM}) / ({_EWMA_DEN}), 6) AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def q182(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timeseries import ewma_truncated

    return ewma_truncated(load(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# q202 — sliding-window distinct users by HLL sketch MERGE: hourly
# register tables exploded into the 3 windows each covers, merged by
# register max — mergeability is why sketches win on overlapping
# windows (exact distinct re-scans every row once per window; here
# each row hashes once and only registers move). Deterministic md5
# registers, so the estimate is bit-identical in the oracle.
# --------------------------------------------------------------------------
from ..functions.sketches import (  # noqa: E402
    hll_sliding_distinct, hll_sliding_distinct_sql,
)


@register(
    "q202_sliding_hll",
    oracle=hll_sliding_distinct_sql("events", "ts", "user_id", hours=3),
)
def q202(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_sliding_distinct(
        load(spark, sf_dir, "events"), "ts", "user_id", hours=3)


# --------------------------------------------------------------------------
# q203 — temporal regularity profile: each event type's hour-of-day
# histogram summarized as Shannon entropy (bots are low-entropy, humans
# near-uniform-ish) — the behavioral fingerprint used in traffic
# triage. Two tiny aggregations; entropy is a 24-term fold over the
# post-aggregation table.
# --------------------------------------------------------------------------
@register(
    "q203_hourly_entropy",
    oracle="""
    WITH h AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS hod, COUNT(*) AS n
      FROM events GROUP BY event_type, EXTRACT(hour FROM ts)
    ), tot AS (
      SELECT event_type, SUM(n) AS nt FROM h GROUP BY event_type
    )
    SELECT h.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_active_hours,
           CAST(MAX(h.n) AS BIGINT) AS peak_hour_n,
           round(-SUM((h.n / CAST(t.nt AS DOUBLE))
                      * ln(h.n / CAST(t.nt AS DOUBLE))), 6) AS entropy
    FROM h JOIN tot t ON h.event_type = t.event_type
    GROUP BY h.event_type
    """,
)
def q203(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").alias("hod")
    ).agg(F.count("*").alias("n"))
    tot = h.groupBy("event_type").agg(F.sum("n").alias("nt"))
    p = F.col("n") / F.col("nt").cast("double")
    return (
        h.join(tot, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_active_hours"),
            F.max("n").cast("bigint").alias("peak_hour_n"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )


# --------------------------------------------------------------------------
# q204 — per-user burstiness: inter-event gap stats and the Goh–Barabási
# burstiness coefficient B = (sigma - mu) / (sigma + mu) (B -> -1
# periodic, 0 Poisson, +1 bursty) for the 20 most active users — the
# behavioral feature that separates schedulers from humans from bots.
# One lag window per user, exact integer gap sums, rounded outputs.
# --------------------------------------------------------------------------
@register(
    "q204_user_burstiness",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch(ts) - epoch(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) AS gap
      FROM events
    ), stats AS (
      SELECT user_id, COUNT(gap) AS n_gaps,
             AVG(gap) AS mu,
             sqrt(AVG(gap * gap) - AVG(gap) * AVG(gap)) AS sigma
      FROM gaps WHERE gap IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
           round(mu, 6) AS mean_gap_sec,
           round((sigma - mu) / (sigma + mu), 6) AS burstiness
    FROM (
      SELECT *, row_number() OVER (ORDER BY n_gaps DESC, user_id ASC) AS rk
      FROM stats
    ) WHERE rk <= 20
    """,
)
def q204(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc())
    gaps = ev.select(
        "user_id",
        (F.col("ts").cast("double")
         - F.lag(F.col("ts").cast("double")).over(w)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    stats = gaps.groupBy("user_id").agg(
        F.count("gap").alias("n_gaps"),
        F.avg("gap").alias("mu"),
        F.sqrt(F.avg(F.col("gap") * F.col("gap"))
               - F.avg("gap") * F.avg("gap")).alias("sigma"),
    )
    wr = Window.orderBy(F.col("n_gaps").desc(), F.col("user_id").asc())
    return (
        stats.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 20)
        .select(
            "user_id", F.col("n_gaps").cast("bigint").alias("n_gaps"),
            F.round("mu", 6).alias("mean_gap_sec"),
            F.round((F.col("sigma") - F.col("mu"))
                    / (F.col("sigma") + F.col("mu")), 6).alias("burstiness"),
        )
    )


# --------------------------------------------------------------------------
# q264 — ENTITY RESOLUTION end-to-end: q91's fuzzy name pairs (SymSpell
# deletion-neighborhood blocking, levenshtein verify) feed the
# component resolver (with its union-find pre-contraction), every
# customer collapses to a canonical entity (min custkey reachable),
# and the orders fact re-aggregates AT ENTITY GRAIN — the master-data
# dedup pipeline (match -> cluster -> golden record -> re-key facts).
# Scale shape: blocking keys are O(len) per row, the entity map is
# dimension-sized and broadcasts into the fact join; no fact-scale
# fuzzy work. The oracle replays blocking + a recursive closure seeded
# with all customers (singletons label themselves).
# --------------------------------------------------------------------------
@register(
    "q264_entity_resolution",
    oracle="""
    WITH RECURSIVE keys AS (
      SELECT c_custkey, c_name, c_name AS k FROM customer
      UNION ALL
      SELECT c_custkey, c_name,
             concat(substr(c_name, 1, i - 1), substr(c_name, i + 1))
      FROM customer, generate_series(1, 64) t(i)
      WHERE i <= length(c_name)
    ), seg AS (
      SELECT c_custkey, c_mktsegment, c_nationkey FROM customer
    ), pairs AS MATERIALIZED (
      -- same-market-same-country blocking: a cross-block name
      -- collision is a different entity, and the block product keeps
      -- the synthetic sequential names from chaining the whole table
      -- into one dense component (Hamming-1 digit graphs are dense)
      SELECT DISTINCT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM keys a JOIN keys b
        ON a.k = b.k AND a.c_custkey < b.c_custkey
      JOIN seg sa ON sa.c_custkey = a.c_custkey
      JOIN seg sb ON sb.c_custkey = b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
        AND sa.c_mktsegment = sb.c_mktsegment
        AND sa.c_nationkey = sb.c_nationkey
    ), edges AS MATERIALIZED (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(id, lab) AS (
      SELECT c_custkey, c_custkey FROM customer
      UNION
      SELECT e.d, r.lab FROM edges e JOIN reach r ON e.s = r.id
    ), ent AS (
      SELECT id AS c_custkey, MIN(lab) AS entity FROM reach GROUP BY id
    ), members AS (
      SELECT c.c_custkey, e.entity, c.c_acctbal
      FROM customer c JOIN ent e USING (c_custkey)
    ), ord AS (
      SELECT m.entity, COUNT(*) AS n_orders
      FROM orders o JOIN members m ON o.o_custkey = m.c_custkey
      GROUP BY 1
    )
    SELECT m.entity AS entity,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(CAST(m.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS acctbal_sum,
           CAST(COALESCE(MAX(o.n_orders), 0) AS BIGINT) AS n_orders
    FROM members m LEFT JOIN ord o ON m.entity = o.entity
    GROUP BY m.entity
    """,
)
def q264(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.dedup import connected_components

    cust = load(spark, sf_dir, "customer")
    seg = cust.select("c_custkey", "c_mktsegment", "c_nationkey")
    raw_pairs = fuzzy_pairs_symdelete(cust, "c_custkey", "c_name",
                                      max_dist=1)
    pairs = (
        raw_pairs
        .join(F.broadcast(seg.select(
            F.col("c_custkey").alias("id_a"),
            F.col("c_mktsegment").alias("seg_a"),
            F.col("c_nationkey").alias("nat_a"))), "id_a")
        .join(F.broadcast(seg.select(
            F.col("c_custkey").alias("id_b"),
            F.col("c_mktsegment").alias("seg_b"),
            F.col("c_nationkey").alias("nat_b"))), "id_b")
        .filter((F.col("seg_a") == F.col("seg_b"))
                & (F.col("nat_a") == F.col("nat_b")))
        .select(F.col("id_a").alias("doc_id_a"),
                F.col("id_b").alias("doc_id_b"))
    )
    comp = connected_components(pairs).withColumnRenamed(
        "doc_id", "c_custkey")
    members = cust.join(F.broadcast(comp), "c_custkey", "left").select(
        "c_custkey", "c_acctbal",
        F.coalesce("component", F.col("c_custkey")).alias("entity"),
    ).localCheckpoint(eager=False)  # feeds the rollup AND the orders join
    # — without this the fuzzy-pair + union-find chain executes twice
    orders = load(spark, sf_dir, "orders").join(
        F.broadcast(members.select("c_custkey", "entity")),
        F.col("o_custkey") == F.col("c_custkey"))
    per_ent_orders = orders.groupBy("entity").agg(
        F.count("*").alias("n_orders"))
    return (
        members.groupBy("entity")
        .agg(F.count("*").cast("bigint").alias("n_members"),
             F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
             .cast("double").alias("acctbal_sum"))
        .join(per_ent_orders, "entity", "left")
        .select(F.col("entity").cast("bigint").alias("entity"),
                "n_members", "acctbal_sum",
                F.coalesce("n_orders", F.lit(0)).cast("bigint")
                .alias("n_orders"))
    )


# --------------------------------------------------------------------------
# q273 — KMV (bottom-k) distinct sketch: per-event-type distinct-user
# estimate from the 256 smallest portable-md5 hash values. Unlike HLL
# the sketch is a DETERMINISTIC function of the value set, so the
# oracle replays the estimate bit-for-bit: (k-1)*2^60/h_(k), one IEEE
# division. Engine side keeps the selection distributed (two-level
# row_number over salt buckets then group — no group funnels its full
# distinct set through one task); the oracle ranks plainly.
# --------------------------------------------------------------------------
@register(
    "q273_kmv_distinct",
    oracle=kmv_distinct_sql("events", ["event_type"], "user_id", k=256),
)
def q273(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return kmv_distinct(ev, ["event_type"], "user_id", k=256)


# --------------------------------------------------------------------------
# q274 — AUTOCORRELATION of the daily order count series, lags 1..7
# (the weekly-seasonality probe every forecast pipeline starts with).
# The estimator is rewritten so mu never appears: numerator and
# denominator become exact BIGINT combinations (N^2*sum x_t*x_{t+l}
# - N*S*(head+tail) + (N-l)*S^2 over N^2*sum x^2 - N*S^2) and each
# r_l is ONE IEEE division — bit-identical on any partitioning, so
# the oracle replays the same integers with a plain lag self-join.
# Daily counts are value-domain-sized; nothing fact-scale moves after
# the first hash agg.
# --------------------------------------------------------------------------
_ACF_MAX_LAG = 7


@register(
    "q274_daily_acf",
    oracle=f"""
    WITH daily AS (
      SELECT datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
               AS t,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ), scal AS (
      SELECT MAX(t) + 1 AS n, SUM(x) AS s1, SUM(x * x) AS s2 FROM daily
    ), lags AS (
      SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag
    ), parts AS (
      SELECT lag,
             SUM(CASE WHEN t <= n - 1 - lag THEN x ELSE 0 END) AS head_sum,
             SUM(CASE WHEN t >= lag THEN x ELSE 0 END) AS tail_sum
      FROM daily, scal, lags GROUP BY lag
    ), prods AS (
      SELECT lag, SUM(a.x * b.x) AS sxy
      FROM lags, daily a JOIN daily b ON b.t = a.t + lag
      GROUP BY lag
    )
    SELECT CAST(l.lag AS INT) AS lag,
           round(CAST(n*n*COALESCE(sxy, 0)
                      - n*s1*(COALESCE(head_sum, 0) + COALESCE(tail_sum, 0))
                      + (n - l.lag)*s1*s1 AS DOUBLE)
                 / CAST(n*n*s2 - n*s1*s1 AS DOUBLE), 6) AS acf
    FROM lags l
    LEFT JOIN parts USING (lag) LEFT JOIN prods USING (lag), scal
    ORDER BY lag
    """,
)
def q274(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1992-01-01").cast("date")).alias("t"))
        .agg(F.count("*").alias("x"))
    )
    return acf_integer(daily, "t", "x", max_lag=_ACF_MAX_LAG)


# --------------------------------------------------------------------------
# q278 — BLOCKING-QUALITY EVALUATION (the record-linkage design step
# BEFORE any pair is materialized): ground truth = synthetic entity
# c_custkey // 3; candidate scheme = (mktsegment, nationkey) blocks.
# Pair completeness (recall of true pairs inside blocks) and reduction
# ratio (1 - candidates / C(N,2)) computed ENTIRELY from group sizes —
# three hash aggs of C(sz,2) integers, zero pair materialization, so
# the evaluation itself scales to any corpus. The only floats are the
# two final divisions of exact BIGINTs.
# --------------------------------------------------------------------------
@register(
    "q278_blocking_quality",
    oracle="""
    WITH ent AS (
      SELECT c_custkey // 3 AS entity, COUNT(*) AS sz
      FROM customer GROUP BY 1
    ), blk AS (
      SELECT c_mktsegment, c_nationkey, COUNT(*) AS sz
      FROM customer GROUP BY 1, 2
    ), cell AS (
      SELECT c_mktsegment, c_nationkey, c_custkey // 3 AS entity,
             COUNT(*) AS sz
      FROM customer GROUP BY 1, 2, 3
    ), scal AS (
      SELECT (SELECT COUNT(*) FROM customer) AS n,
             (SELECT SUM(sz * (sz - 1) // 2) FROM ent) AS true_pairs,
             (SELECT SUM(sz * (sz - 1) // 2) FROM blk) AS cand_pairs,
             (SELECT SUM(sz * (sz - 1) // 2) FROM cell) AS matched_pairs
    )
    SELECT CAST(n AS BIGINT) AS n_records,
           CAST(true_pairs AS BIGINT) AS n_true_pairs,
           CAST(cand_pairs AS BIGINT) AS n_cand_pairs,
           CAST(matched_pairs AS BIGINT) AS n_matched_pairs,
           round(CAST(matched_pairs AS DOUBLE) / CAST(true_pairs AS DOUBLE),
                 6) AS pair_completeness,
           round(1.0 - CAST(cand_pairs AS DOUBLE)
                       / CAST(n * (n - 1) // 2 AS DOUBLE), 6)
             AS reduction_ratio
    FROM scal
    """,
)
def q278(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")

    def pair_sum(*keys):
        g = cust.groupBy(*[k.alias(f"k{i}") for i, k in enumerate(keys)])
        # sz*(sz-1) div 2 stays in exact int64 — a float /2 would lose
        # ulps past 2^53 pairs (a single hot block at corpus scale)
        return g.agg(F.count("*").alias("sz")).agg(
            F.sum(F.expr("sz * (sz - 1) div 2")).alias("s"))

    true_pairs = pair_sum(F.floor(F.col("c_custkey") / 3))
    cand_pairs = pair_sum(F.col("c_mktsegment"), F.col("c_nationkey"))
    matched = pair_sum(F.col("c_mktsegment"), F.col("c_nationkey"),
                       F.floor(F.col("c_custkey") / 3))
    n = cust.agg(F.count("*").alias("n"))
    j = (
        n.crossJoin(true_pairs.select(F.col("s").alias("true_pairs")))
        .crossJoin(cand_pairs.select(F.col("s").alias("cand_pairs")))
        .crossJoin(matched.select(F.col("s").alias("matched_pairs")))
    )
    return j.select(
        F.col("n").cast("bigint").alias("n_records"),
        F.col("true_pairs").alias("n_true_pairs"),
        F.col("cand_pairs").alias("n_cand_pairs"),
        F.col("matched_pairs").alias("n_matched_pairs"),
        F.round(F.col("matched_pairs").cast("double")
                / F.col("true_pairs").cast("double"), 6)
          .alias("pair_completeness"),
        F.round(F.lit(1.0) - F.col("cand_pairs").cast("double")
                / F.expr("n * (n - 1) div 2").cast("double"), 6)
          .alias("reduction_ratio"),
    )


# --------------------------------------------------------------------------
# q279 — WEEKDAY SEASONALITY DECOMPOSITION, integer-exact: daily order
# counts, 7-day centered moving sum as the trend proxy (multiplying the
# classic x_t - trend_t through by 7 keeps the deviation 7*x_t - sum7_t
# an exact BIGINT — no float moving average), per-weekday deviation
# totals + ONE division for the mean. The moving sum comes from a
# broadcast 7-row offset table + equi-join on the value-domain daily
# series (the q274 ACF discipline) — no global-order window anywhere.
# --------------------------------------------------------------------------
@register(
    "q279_weekday_seasonality",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
               AS t,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ), scal AS (SELECT MAX(t) + 1 AS n FROM daily),
    win AS (
      SELECT a.t, a.x, SUM(b.x) AS sum7, COUNT(b.t) AS n_present
      FROM daily a
      JOIN daily b ON b.t BETWEEN a.t - 3 AND a.t + 3
      GROUP BY a.t, a.x
    )
    SELECT CAST(t % 7 AS INT) AS weekday,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(7 * x - sum7) AS BIGINT) AS sum_dev7,
           round(CAST(SUM(7 * x - sum7) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_dev7
    FROM win, scal
    WHERE t >= 3 AND t <= n - 4
    GROUP BY 1 ORDER BY 1
    """,
)
def q279(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1992-01-01").cast("date")).alias("t"))
        .agg(F.count("*").alias("x"))
    )
    scal = daily.agg((F.max("t") + 1).alias("n"))
    offs = spark.range(-3, 4).select(F.col("id").alias("off"))
    win = (
        daily.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
        .crossJoin(F.broadcast(offs))
        .select((F.col("tb") + F.col("off")).alias("t"),
                F.col("xb"))
        .groupBy("t").agg(F.sum("xb").alias("sum7"))
    )
    j = (
        daily.join(win, "t")
        .crossJoin(F.broadcast(scal))
        .filter((F.col("t") >= 3) & (F.col("t") <= F.col("n") - 4))
    )
    dev = 7 * F.col("x") - F.col("sum7")
    return (
        j.groupBy((F.col("t") % 7).cast("int").alias("weekday"))
        .agg(F.count("*").cast("bigint").alias("n_days"),
             F.sum(dev).cast("bigint").alias("sum_dev7"))
        .select("weekday", "n_days", "sum_dev7",
                F.round(F.col("sum_dev7").cast("double")
                        / F.col("n_days").cast("double"), 6)
                  .alias("mean_dev7"))
        .orderBy("weekday")
    )


# --------------------------------------------------------------------------
# q280 — KMV SKETCH MERGE (the set algebra that makes bottom-k the
# scale answer for distinct-over-unions): per-event-type bottom-k
# sketches (k=128) built ONCE from the fact table, then every
# unordered TYPE PAIR's distinct-user estimate computed purely by
# merging the two k-row sketches (union hashes, dedup, retrim to k) —
# the fact table is never rescanned per pair. All post-sketch work
# touches <= 2k rows per pair; the estimate formula and hash are the
# q273 ones, so the oracle replays every merged estimate bit-for-bit.
# --------------------------------------------------------------------------
_KMV_MERGE_K = 128


@register(
    "q280_kmv_merge",
    oracle=f"""
    WITH dh AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events
    ), sk AS (
      SELECT event_type, h
      FROM (SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h)
                     AS r
            FROM dh) t
      WHERE r <= {_KMV_MERGE_K}
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM (SELECT DISTINCT event_type FROM events) a
      JOIN (SELECT DISTINCT event_type FROM events) b
        ON a.event_type < b.event_type
    ), merged AS (
      SELECT p.type_a, p.type_b, s.h
      FROM pairs p JOIN sk s
        ON s.event_type IN (p.type_a, p.type_b)
      GROUP BY 1, 2, 3
    ), ranked AS (
      SELECT type_a, type_b, h,
             row_number() OVER (PARTITION BY type_a, type_b ORDER BY h)
               AS r
      FROM merged
    ), per AS (
      SELECT type_a, type_b, COUNT(*) AS n_k, MAX(h) AS h_k
      FROM ranked WHERE r <= {_KMV_MERGE_K} GROUP BY 1, 2
    )
    SELECT type_a, type_b,
           CAST(round(CASE WHEN n_k < {_KMV_MERGE_K}
                           THEN CAST(n_k AS DOUBLE)
                ELSE CAST({float((_KMV_MERGE_K - 1) * (1 << 60))!r}
                          AS DOUBLE) / CAST(h_k AS DOUBLE) END) AS BIGINT)
             AS approx_union_distinct
    FROM per ORDER BY type_a, type_b
    """,
)
def q280(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..functions.hashing import md5_int64
    from ..functions.sketches import KMV_SALT_BUCKETS

    k = _KMV_MERGE_K
    ev = load(spark, sf_dir, "events")
    dh = (
        ev.select("event_type",
                  md5_int64(F.col("user_id").cast("string")).alias("h"))
        .groupBy("event_type", "h").agg(F.lit(1).alias("one"))
    )
    lvl1 = Window.partitionBy(
        "event_type", F.pmod(F.col("h"), F.lit(KMV_SALT_BUCKETS))
    ).orderBy("h")
    lvl2 = Window.partitionBy("event_type").orderBy("h")
    sk = (
        dh.withColumn("r1", F.row_number().over(lvl1))
        .filter(F.col("r1") <= k)
        .withColumn("r2", F.row_number().over(lvl2))
        .filter(F.col("r2") <= k)
        .select("event_type", "h")
        .localCheckpoint()  # sketches are tiny; plan both pair sides once
    )
    types = sk.select("event_type").distinct().localCheckpoint(
        eager=False)  # both pair sides read it
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(types.select(F.col("event_type").alias("type_b")),
              F.col("type_a") < F.col("type_b"))
    )
    merged = (
        F.broadcast(pairs)
        .join(sk, (F.col("event_type") == F.col("type_a"))
              | (F.col("event_type") == F.col("type_b")))
        .select("type_a", "type_b", "h").distinct()
    )
    rk = Window.partitionBy("type_a", "type_b").orderBy("h")
    per = (
        merged.withColumn("r", F.row_number().over(rk))
        .filter(F.col("r") <= k)
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_k"), F.max("h").alias("h_k"))
    )
    est = F.when(F.col("n_k") < k, F.col("n_k").cast("double")).otherwise(
        F.lit(float((k - 1) * (1 << 60))) / F.col("h_k").cast("double"))
    return per.select(
        "type_a", "type_b",
        F.round(est).cast("bigint").alias("approx_union_distinct")
    ).orderBy("type_a", "type_b")


# --------------------------------------------------------------------------
# q284 — KMV INTERSECTION (audience overlap) via the merged-sketch
# rho-estimator (Beyer et al. 2007): the union's bottom-k hash values
# all lie below BOTH per-type sketch thresholds (the union's k-th min
# is <= each individual k-th min), so for each of them "present in
# both sets" is decidable exactly from the two sketches; rho =
# both-count / k IS the Jaccard estimate and intersection = rho *
# est(union). Binomial-tight (stderr ~ sqrt(rho(1-rho)/k) * |union|,
# vs inclusion-exclusion whose error compounds three estimates). One
# fact scan builds per-type sketches; everything after touches <= 2k
# rows per pair; deterministic, so the oracle replays every value.
# --------------------------------------------------------------------------
@register(
    "q284_kmv_intersection",
    oracle=f"""
    WITH dh AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events
    ), sk AS (
      SELECT event_type, h
      FROM (SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h)
                     AS r
            FROM dh) t
      WHERE r <= {_KMV_MERGE_K}
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM (SELECT DISTINCT event_type FROM events) a
      JOIN (SELECT DISTINCT event_type FROM events) b
        ON a.event_type < b.event_type
    ), merged AS (
      SELECT p.type_a, p.type_b, s.h,
             MAX(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END)
               AS in_a,
             MAX(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END)
               AS in_b
      FROM pairs p JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
      GROUP BY 1, 2, 3
    ), ranked AS (
      SELECT type_a, type_b, h, in_a, in_b,
             row_number() OVER (PARTITION BY type_a, type_b ORDER BY h)
               AS r
      FROM merged
    ), per AS (
      SELECT type_a, type_b, COUNT(*) AS n_k, MAX(h) AS h_k,
             SUM(in_a * in_b) AS n_both
      FROM ranked WHERE r <= {_KMV_MERGE_K} GROUP BY 1, 2
    )
    SELECT type_a, type_b,
           CAST(n_both AS BIGINT) AS k_both,
           round(CAST(n_both AS DOUBLE) / CAST(n_k AS DOUBLE), 6)
             AS est_jaccard,
           round((CAST(n_both AS DOUBLE) / CAST(n_k AS DOUBLE))
                 * (CASE WHEN n_k < {_KMV_MERGE_K}
                         THEN CAST(n_k AS DOUBLE)
                    ELSE CAST({float((_KMV_MERGE_K - 1) * (1 << 60))!r}
                              AS DOUBLE) / CAST(h_k AS DOUBLE) END), 2)
             AS est_intersection
    FROM per ORDER BY type_a, type_b
    """,
)
def q284(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_int64
    from ..functions.sketches import KMV_SALT_BUCKETS

    k = _KMV_MERGE_K
    kfac = float((k - 1) * (1 << 60))
    ev = load(spark, sf_dir, "events")
    dh = (
        ev.select("event_type",
                  md5_int64(F.col("user_id").cast("string")).alias("h"))
        .groupBy("event_type", "h").agg(F.lit(1).alias("one"))
    )
    lvl1 = Window.partitionBy(
        "event_type", F.pmod(F.col("h"), F.lit(KMV_SALT_BUCKETS))
    ).orderBy("h")
    lvl2 = Window.partitionBy("event_type").orderBy("h")
    sk = (
        dh.withColumn("r1", F.row_number().over(lvl1))
        .filter(F.col("r1") <= k)
        .withColumn("r2", F.row_number().over(lvl2))
        .filter(F.col("r2") <= k)
        .select("event_type", "h")
        .localCheckpoint()
    )
    types = sk.select("event_type").distinct().localCheckpoint(
        eager=False)  # both pair sides read it
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(types.select(F.col("event_type").alias("type_b")),
              F.col("type_a") < F.col("type_b"))
    )
    merged = (
        F.broadcast(pairs)
        .join(sk, (F.col("event_type") == F.col("type_a"))
              | (F.col("event_type") == F.col("type_b")))
        .groupBy("type_a", "type_b", "h")
        .agg(
            F.max(F.when(F.col("event_type") == F.col("type_a"), 1)
                  .otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("event_type") == F.col("type_b"), 1)
                  .otherwise(0)).alias("in_b"),
        )
    )
    rk = Window.partitionBy("type_a", "type_b").orderBy("h")
    per = (
        merged.withColumn("r", F.row_number().over(rk))
        .filter(F.col("r") <= k)
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_k"), F.max("h").alias("h_k"),
             F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"))
    )
    rho = F.col("n_both").cast("double") / F.col("n_k").cast("double")
    est_union = F.when(
        F.col("n_k") < k, F.col("n_k").cast("double")
    ).otherwise(F.lit(kfac) / F.col("h_k").cast("double"))
    return per.select(
        "type_a", "type_b",
        F.col("n_both").cast("bigint").alias("k_both"),
        F.round(rho, 6).alias("est_jaccard"),
        F.round(rho * est_union, 2).alias("est_intersection"),
    ).orderBy("type_a", "type_b")


# --------------------------------------------------------------------------
# q286 — MANN-KENDALL TREND TEST on the daily order-count series, the
# standard nonparametric "is there a monotone trend" screen. S =
# sum over day pairs of sign(x_j - x_i) and the tie-corrected variance
# are EXACT integers (the /18 and the z-score's sqrt+division are
# fixed-order scalar ops on them). The pair join is quadratic ONLY in
# the value-domain daily table (one row per day regardless of fact
# size — ~2400 days => ~3M pairs, bounded by the calendar, not the
# data); the fact table reduces in one hash agg first.
# --------------------------------------------------------------------------
@register(
    "q286_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
               AS t,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ), s AS (
      SELECT SUM(CASE WHEN b.x > a.x THEN 1
                      WHEN b.x < a.x THEN -1 ELSE 0 END) AS s
      FROM daily a JOIN daily b ON b.t > a.t
    ), ties AS (
      SELECT COALESCE(SUM(u * (u - 1) * (2 * u + 5)), 0) AS tc
      FROM (SELECT COUNT(*) AS u FROM daily GROUP BY x) g
      WHERE u > 1
    ), scal AS (
      SELECT (SELECT COUNT(*) FROM daily) AS n, s.s AS s, ties.tc AS tc
      FROM s, ties
    )
    SELECT CAST(n AS BIGINT) AS n_days, CAST(s AS BIGINT) AS s_stat,
           round(CAST(n * (n - 1) * (2 * n + 5) - tc AS DOUBLE) / 18.0, 6)
             AS var_s,
           round(CASE WHEN s > 0 THEN (s - 1) / sqrt(
                        CAST(n * (n - 1) * (2 * n + 5) - tc AS DOUBLE)
                        / 18.0)
                      WHEN s < 0 THEN (s + 1) / sqrt(
                        CAST(n * (n - 1) * (2 * n + 5) - tc AS DOUBLE)
                        / 18.0)
                      ELSE 0.0 END, 6) AS z_score
    FROM scal
    """,
)
def q286(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1992-01-01").cast("date")).alias("t"))
        .agg(F.count("*").alias("x"))
        .localCheckpoint()  # value-domain table, planned on both pair sides
    )
    a = daily.select(F.col("t").alias("ta"), F.col("x").alias("xa"))
    b = daily.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
    s = (
        a.join(b, F.col("tb") > F.col("ta"))
        .agg(F.sum(F.when(F.col("xb") > F.col("xa"), 1)
                   .when(F.col("xb") < F.col("xa"), -1)
                   .otherwise(0)).alias("s"))
    )
    ties = (
        daily.groupBy("x").agg(F.count("*").alias("u"))
        .filter(F.col("u") > 1)
        .agg(F.coalesce(
            F.sum(F.col("u") * (F.col("u") - 1) * (2 * F.col("u") + 5)),
            F.lit(0)).alias("tc"))
    )
    n = daily.agg(F.count("*").alias("n"))
    j = n.crossJoin(F.broadcast(s)).crossJoin(F.broadcast(ties))
    nn, ss, tc = F.col("n"), F.col("s"), F.col("tc")
    var_num = (nn * (nn - 1) * (2 * nn + 5) - tc).cast("double")
    sd = F.sqrt(var_num / F.lit(18.0))
    return j.select(
        nn.cast("bigint").alias("n_days"),
        ss.cast("bigint").alias("s_stat"),
        F.round(var_num / F.lit(18.0), 6).alias("var_s"),
        F.round(F.when(ss > 0, (ss - 1) / sd)
                .when(ss < 0, (ss + 1) / sd)
                .otherwise(F.lit(0.0)), 6).alias("z_score"),
    )


# --------------------------------------------------------------------------
# q287 — THEIL-SEN ROBUST SLOPE of the daily series: median of all
# pairwise slopes (x_j - x_i)/(t_j - t_i). Each slope is ONE IEEE
# division of exact integers (bit-identical both engines); the daily
# series is value-domain-bounded (<= ~2.4k distinct dates at any
# corpus size), so after the distributed daily agg the C(n,2) slope
# median replays driver-side — the same rank = p*(n-1) interpolation
# rule as quantile_cont, matched to the last ulp.
# --------------------------------------------------------------------------
@register(
    "q287_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
               AS t,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ), slopes AS (
      SELECT CAST(b.x - a.x AS DOUBLE) / CAST(b.t - a.t AS DOUBLE)
               AS slope
      FROM daily a JOIN daily b ON b.t > a.t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(quantile_cont(slope, 0.5), 6) AS median_slope
    FROM slopes
    """,
)
def q287(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    import numpy as np

    orders = load(spark, sf_dir, "orders")
    # The daily series is VALUE-DOMAIN-bounded: one row per distinct
    # order date (<= ~2.4k days of the 1992-1998 date domain) however
    # large orders grows — the documented tiny-statistic discipline
    # (q335's Bellman-Ford lane table is the precedent). The only
    # data-sized work is the distributed daily count agg; the C(n,2)
    # slope median then replays driver-side with bit-identical
    # arithmetic: each slope is ONE IEEE double division of exact
    # integers (same in numpy and the JVM), and the median uses the
    # identical rank = p*(n-1), lo + (hi-lo)*frac lattice that
    # functions/quantiles.py and DuckDB quantile_cont share.
    rows = (
        orders.groupBy(
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1992-01-01").cast("date")).alias("t"))
        .agg(F.count("*").alias("x"))
        .collect()
    )
    rows.sort(key=lambda r: r.t)
    t = np.array([r.t for r in rows], dtype=np.int64)
    x = np.array([r.x for r in rows], dtype=np.int64)
    n_days = len(rows)
    # One preallocated output filled per anchor row (j > i => t_j > t_i):
    # the same exact int-difference doubles a triu_indices formulation
    # produces, without materializing the ~6x larger (ii, jj, diffs)
    # index/temp arrays — first-touch page faults on those dominated the
    # driver cost of this query.
    slopes = np.empty(n_days * (n_days - 1) // 2, dtype=np.float64)
    dx = np.empty(n_days, dtype=np.float64)
    dt = np.empty(n_days, dtype=np.float64)
    pos = 0
    for i in range(n_days - 1):
        m = n_days - 1 - i
        np.subtract(x[i + 1:], x[i], out=dx[:m], casting="unsafe")
        np.subtract(t[i + 1:], t[i], out=dt[:m], casting="unsafe")
        np.divide(dx[:m], dt[:m], out=slopes[pos:pos + m])
        pos += m
    slopes.sort()
    n = slopes.shape[0]
    rank = 0.5 * (n - 1)
    lo_i, hi_i = math.floor(rank), math.ceil(rank)
    lo_v, hi_v = float(slopes[lo_i]), float(slopes[hi_i])
    frac = rank - lo_i
    med = lo_v if frac == 0 else lo_v + (hi_v - lo_v) * frac
    return spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(n_days * (n_days - 1) // 2, round(med, 6))], 1),
        "n_pairs long, median_slope double")


# --------------------------------------------------------------------------
# q288 — CUSUM CHANGEPOINT on the daily series: the split k maximizing
# |n*S_k - k*S| (the mean-shift CUSUM statistic with the mean cleared
# by multiplying through by n — every candidate score an exact
# BIGINT, so the argmax is exact; ties to the earliest day). The
# prefix sum runs as a window over the VALUE-DOMAIN daily table
# (~2400 rows however large the fact table — exempted single-partition
# scan, the q78 dimension-scale class); the normalized score is one
# final division.
# --------------------------------------------------------------------------
@register(
    "q288_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
               AS t,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ), scal AS (
      SELECT COUNT(*) AS n, SUM(x) AS s FROM daily
    ), pre AS (
      SELECT t, SUM(x) OVER (ORDER BY t) AS sk,
             row_number() OVER (ORDER BY t) AS k
      FROM daily
    ), scored AS (
      SELECT t, k, abs(n * sk - k * s) AS d
      FROM pre, scal WHERE k < n
    ), best AS (
      SELECT t, k, d FROM scored ORDER BY d DESC, t ASC LIMIT 1
    )
    SELECT CAST(scal.n AS BIGINT) AS n_days,
           CAST(best.t AS BIGINT) AS change_t,
           CAST(best.d AS BIGINT) AS d_stat,
           round(CAST(best.d AS DOUBLE)
                 / (CAST(scal.n AS DOUBLE) * CAST(scal.s AS DOUBLE)), 6)
             AS d_norm
    FROM best, scal
    """,
)
def q288(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1992-01-01").cast("date")).alias("t"))
        .agg(F.count("*").alias("x"))
        .localCheckpoint(eager=False)  # scalar + cumsum both read it
    )
    scal = daily.agg(F.count("*").alias("n"), F.sum("x").alias("s"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wk = Window.orderBy("t")
    pre = daily.select(
        "t", F.sum("x").over(w).alias("sk"),
        F.row_number().over(wk).alias("k"))
    scored = (
        pre.crossJoin(F.broadcast(scal))
        .filter(F.col("k") < F.col("n"))
        .select("t", "n", "s",
                F.abs(F.col("n") * F.col("sk") - F.col("k") * F.col("s"))
                .alias("d"))
    )
    best = scored.orderBy(F.col("d").desc(), F.col("t").asc()).limit(1)
    return best.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.col("t").cast("bigint").alias("change_t"),
        F.col("d").cast("bigint").alias("d_stat"),
        F.round(F.col("d").cast("double")
                / (F.col("n").cast("double") * F.col("s").cast("double")),
                6).alias("d_norm"),
    )


# --------------------------------------------------------------------------
# q289 — SEASONAL-NAIVE BACKTEST (MASE): forecast x_{t-7} on the
# ZERO-FILLED calendar spine, scored by MASE = MAE_seasonal7 /
# MAE_naive1 — the sanity baseline every forecast deployment must
# beat. Absolute errors of integer counts sum exactly; MASE is one
# IEEE division. The spine is a value-domain sequence (dimension
# explode), joined to observed days twice — nothing fact-scale after
# the first agg.
# --------------------------------------------------------------------------
@register(
    "q289_seasonal_mase",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
               AS t,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ), scal AS (SELECT MAX(t) + 1 AS n FROM daily),
    spine AS (
      SELECT unnest(generate_series(0, n - 1)) AS t FROM scal
    ), z AS (
      SELECT spine.t, COALESCE(daily.x, 0) AS x
      FROM spine LEFT JOIN daily USING (t)
    ), j AS (
      SELECT a.t, a.x,
             l7.x AS x7, l1.x AS x1
      FROM z a JOIN z l7 ON l7.t = a.t - 7 JOIN z l1 ON l1.t = a.t - 1
      WHERE a.t >= 7
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(abs(x - x7)) AS BIGINT) AS sae_seasonal7,
           CAST(SUM(abs(x - x1)) AS BIGINT) AS sae_naive1,
           round(CAST(SUM(abs(x - x7)) AS DOUBLE)
                 / CAST(SUM(abs(x - x1)) AS DOUBLE), 6) AS mase
    FROM j
    """,
)
def q289(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1992-01-01").cast("date")).alias("t"))
        .agg(F.count("*").alias("x"))
    )
    spine = (
        daily.agg(F.max("t").alias("mx"))
        .select(F.explode(F.sequence(F.lit(0), F.col("mx"))).alias("t"))
    )
    z = (
        spine.join(daily, "t", "left")
        .select("t", F.coalesce("x", F.lit(0)).alias("x"))
        .localCheckpoint()  # value-domain series, used three times
    )
    l7 = z.select((F.col("t") + 7).alias("t"), F.col("x").alias("x7"))
    l1 = z.select((F.col("t") + 1).alias("t"), F.col("x").alias("x1"))
    j = z.filter(F.col("t") >= 7).join(l7, "t").join(l1, "t")
    sae7 = F.sum(F.abs(F.col("x") - F.col("x7")))
    sae1 = F.sum(F.abs(F.col("x") - F.col("x1")))
    return j.agg(
        F.count("*").cast("bigint").alias("n_eval"),
        sae7.cast("bigint").alias("sae_seasonal7"),
        sae1.cast("bigint").alias("sae_naive1"),
        F.round(sae7.cast("double") / sae1.cast("double"), 6).alias("mase"),
    )


# --------------------------------------------------------------------------
# q406 — KMV SKETCH SET OPERATIONS (the q273/q280 family's third leg):
# distinct-customer estimates for two order-status sets PLUS their
# union and INTERSECTION from 256-hash sketches — the audience-overlap
# question ("how many customers have both open and fulfilled orders")
# answered without ever materializing either value set. Union =
# merge-and-retrim; intersection = the Jaccard-over-K rule
# (rho = |K n A n B| / |K|, scaled by the union estimate). After the
# two bottom-k selections everything is <= 2k rows — at 100 TB only
# sketches move. Deterministic (k smallest md5 hashes), so the oracle
# replays every estimate bit-for-bit, and the exact intersection rides
# along for error accounting.
# --------------------------------------------------------------------------
@register(
    "q406_kmv_set_ops",
    oracle=kmv_set_ops_sql(
        "orders", "o_orderstatus = 'F'", "o_orderstatus = 'O'",
        "o_custkey", k=256),
)
def q406(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return kmv_set_ops(orders, "o_orderstatus", "o_custkey",
                       set_a="F", set_b="O", k=256)

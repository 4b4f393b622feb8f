"""Similarity-search harness queries over the embeddings table, plus the
streaming rollup twin."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import similarity as S
from ..streaming.events import run_hourly_rollup_once, run_sessionize_once
from . import load, register

_WEIGHTS = S.hyperplane_weights()


def _sql_cos(a: str, b: str) -> str:
    return (
        f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
        f" / (sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
        f" * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[]))))"
    )


def _sql_bucket(vec: str) -> str:
    terms = []
    for j, w in enumerate(_WEIGHTS):
        lits = ", ".join(f"{float(x)}" for x in w)
        terms.append(
            f"(CASE WHEN list_dot_product(CAST({vec} AS DOUBLE[]), [{lits}]) > 0 "
            f"THEN {2**j} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


# --------------------------------------------------------------------------
# q36 — brute-force cosine top-k (exact ANN baseline)
# --------------------------------------------------------------------------
@register(
    "q36_embed_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             {_sql_cos('q.qv', 'c.embedding')} AS cs
      FROM embeddings c, q
      WHERE c.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.brute_force_topk(emb, queries, k=5)


# --------------------------------------------------------------------------
# q244 — Maximal Marginal Relevance (Carbonell & Goldstein 1998): the
# diversity re-rank between retrieval and a context window. Greedy
# k = 3 selection maximizing 0.7*rel - 0.3*max-sim-to-selected over the
# 200-vector candidate slice, query = vec 0. The loop is k BOUNDED
# driver steps (TakeOrdered(1) per step, broadcast <= k selected
# vectors); the oracle unrolls the same greedy argmax in SQL. Only ids
# ride in the result — argmax ids are cross-engine stable where raw
# float scores would not hash.
# --------------------------------------------------------------------------
_MMR_SCORE = f"0.7 * rel - 0.30000000000000004 * ms"


@register(
    "q244_mmr_select",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cands AS (
      SELECT vec_id, embedding,
             {_sql_cos('embedding', 'q.qv')} AS rel
      FROM embeddings, q WHERE vec_id != 0 AND vec_id < 200
    ), s1 AS (
      SELECT vec_id, embedding FROM cands
      ORDER BY rel DESC, vec_id LIMIT 1
    ), m2 AS (
      SELECT c.vec_id, c.embedding, c.rel,
             {_sql_cos('c.embedding', 's1.embedding')} AS ms
      FROM cands c, s1 WHERE c.vec_id != s1.vec_id
    ), s2 AS (
      SELECT vec_id, embedding FROM m2
      ORDER BY {_MMR_SCORE} DESC, vec_id LIMIT 1
    ), m3 AS (
      SELECT c.vec_id, c.rel,
             GREATEST({_sql_cos('c.embedding', 's1.embedding')},
                      {_sql_cos('c.embedding', 's2.embedding')}) AS ms
      FROM cands c, s1, s2
      WHERE c.vec_id NOT IN (s1.vec_id, s2.vec_id)
    ), s3 AS (
      SELECT vec_id FROM m3 ORDER BY {_MMR_SCORE} DESC, vec_id LIMIT 1
    )
    SELECT 1 AS step, (SELECT CAST(vec_id AS BIGINT) FROM s1) AS vec_id
    UNION ALL SELECT 2, (SELECT CAST(vec_id AS BIGINT) FROM s2)
    UNION ALL SELECT 3, (SELECT CAST(vec_id AS BIGINT) FROM s3)
    """,
)
def q244(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.filter((F.col("vec_id") != 0) & (F.col("vec_id") < 200))
    query = emb.filter(F.col("vec_id") == 0)
    # the candidate slice is <= 200 rows by CONSTRUCTION (constant
    # vec_id < 200 predicate) — eligible for the driver-side replay
    return S.mmr_select(corpus, query, k=3, lam=0.7, local_bound=200)


# --------------------------------------------------------------------------
# q37 — LSH-bucketed approximate top-k (the scale path: equi-join on
# bucket instead of a cross join)
# --------------------------------------------------------------------------
@register(
    "q37_embed_lsh_ann",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_sql_bucket('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv, bucket
          FROM b WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             {_sql_cos('q.qv', 'c.embedding')} AS cs
      FROM b c JOIN q ON c.bucket = q.bucket
      WHERE c.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.lsh_ann_topk(emb, queries, k=5, weights=_WEIGHTS)


# --------------------------------------------------------------------------
# q38 — embedding-cosine near-dup pairs within LSH buckets
# --------------------------------------------------------------------------
@register(
    "q38_embed_neardup",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_sql_bucket('embedding')} AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS vec_id_a, c.vec_id AS vec_id_b
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE {_sql_cos('a.embedding', 'c.embedding')} > 0.9
    """,
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    ws = _WEIGHTS
    b = emb.select(
        "vec_id", "embedding", S.lsh_bucket(F.col("embedding"), ws).alias("bucket")
    )
    a, c = b.alias("a"), b.alias("c")
    cos = S.cosine(F.col("a.embedding"), F.col("c.embedding"))
    return (
        a.join(c, (F.col("a.bucket") == F.col("c.bucket"))
               & (F.col("a.vec_id") < F.col("c.vec_id")))
        .filter(cos > 0.9)
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("c.vec_id").alias("vec_id_b"),
        )
    )


# --------------------------------------------------------------------------
# q39 — streaming hourly rollup (Structured Streaming, availableNow):
# deterministic because the trigger drains all input; oracle is the batch
# equivalent.
# --------------------------------------------------------------------------
@register(
    "q39_stream_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_hourly_rollup_once(spark, f"{sf_dir}/events.parquet")


# --------------------------------------------------------------------------
# q49 — stateful streaming sessionization (session_window + watermark),
# availableNow drain; oracle is the equivalent batch gap-session SQL.
# --------------------------------------------------------------------------
@register(
    "q49_stream_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           epoch(MAX(ts)) - epoch(MIN(ts)) AS duration_sec,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sessionize_once(spark, f"{sf_dir}/events.parquet")


# --------------------------------------------------------------------------
# q52 — IVF ANN: deterministic coarse quantizer (centroids = vec_id < 8),
# inverted-list assignment, 2-probe search, exact re-rank in probed cells.
# Fully SQL-expressible because the quantizer is data-deterministic.
# --------------------------------------------------------------------------
@register(
    "q52_embed_ivf_ann",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cell_id, embedding AS cvec
      FROM embeddings WHERE vec_id < 8
    ), inv AS (
      SELECT vec_id, embedding, cell_id FROM (
        SELECT e.vec_id, e.embedding, c.cell_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_sql_cos('e.embedding', 'c.cvec')} DESC,
                          c.cell_id ASC) AS rn
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, embedding AS qv, cell_id FROM (
        SELECT e.vec_id, e.embedding, c.cell_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_sql_cos('e.embedding', 'c.cvec')} DESC,
                          c.cell_id ASC) AS rn
        FROM embeddings e CROSS JOIN cent c
        WHERE e.vec_id < 10
      ) WHERE rn <= 2
    ), scored AS (
      SELECT p.query_id, i.vec_id AS neighbor_id,
             {_sql_cos('p.qv', 'i.embedding')} AS cs
      FROM inv i JOIN probes p ON i.cell_id = p.cell_id
      WHERE i.vec_id != p.query_id
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    queries = emb.filter(F.col("vec_id") < 10)
    return S.ivf_ann_topk(emb, queries, centroids, k=5, n_probe=2)


# --------------------------------------------------------------------------
# q138 — sliding-window streaming rollup: 1-hour windows every 15
# minutes, so each event contributes to exactly 4 overlapping windows —
# the moving-aggregate shape tumbling windows can't express. The oracle
# replays the window assignment arithmetically (aligned starts
# floor15(ts) - k*15min, k = 0..3).
# --------------------------------------------------------------------------
@register(
    "q138_stream_sliding_rollup",
    oracle="""
    SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 900) * 900 - k * 900 AS BIGINT))
                AS TIMESTAMP) AS bucket,
           event_type, COUNT(*) AS n
    FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
    GROUP BY 1, 2
    """,
)
def q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import run_sliding_rollup_once

    return run_sliding_rollup_once(spark, f"{sf_dir}/events.parquet")


# --------------------------------------------------------------------------
# q139 — streaming trending top-k: the drained hourly rollup ranked to
# the top-3 event types per hour (n desc, type asc tie-break) — the
# stream-then-rank composition every live dashboard runs. Ranking is a
# batch window over the dimension-sized sink table, never the stream.
# --------------------------------------------------------------------------
@register(
    "q139_stream_trending",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT bucket, event_type, n,
             row_number() OVER (PARTITION BY bucket
                                ORDER BY n DESC, event_type ASC) AS rnk
      FROM hourly
    )
    SELECT bucket, event_type, n, rnk FROM ranked WHERE rnk <= 3
    """,
)
def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    rollup = run_hourly_rollup_once(spark, f"{sf_dir}/events.parquet")
    w = Window.partitionBy("bucket").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    return (
        rollup.select("bucket", "event_type", "n")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )


# --------------------------------------------------------------------------
# q150 — SemDeDup: semantic dedup decision inside embedding clusters
# (keep-first greedy rule, arXiv:2303.09540), clusters = sign-LSH buckets
# --------------------------------------------------------------------------
@register(
    "q150_semdedup",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_sql_bucket('embedding')} AS cluster
      FROM embeddings
    ), m AS (
      SELECT c.vec_id, max({_sql_cos('a.embedding', 'c.embedding')})
               AS max_cos_prev
      FROM b a JOIN b c ON a.cluster = c.cluster AND a.vec_id < c.vec_id
      GROUP BY c.vec_id
    )
    SELECT b.vec_id, b.cluster,
           round(coalesce(m.max_cos_prev, -1.0), 6) AS max_cos_prev,
           (m.max_cos_prev IS NULL OR m.max_cos_prev <= 0.9) AS keep
    FROM b LEFT JOIN m ON b.vec_id = m.vec_id
    """,
)
def q150(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return S.semdedup_keep(
        emb, S.lsh_bucket(F.col("embedding"), _WEIGHTS), threshold=0.9
    )


# --------------------------------------------------------------------------
# q161 — stream-static enrichment rollup: the event STREAM joins a
# broadcast customer dimension (stateless stream-static equi-join, the
# standard streaming-ETL lookup shape) and rolls up per (segment,
# event_type); availableNow drains all input so the batch oracle is the
# exact expected state.
# --------------------------------------------------------------------------
@register(
    "q161_stream_enrich",
    oracle="""
    SELECT c_mktsegment, event_type,
           COUNT(*) AS n,
           round(AVG(value), 6) AS avg_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    """,
)
def q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import run_enriched_rollup_once

    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return run_enriched_rollup_once(
        spark, f"{sf_dir}/events.parquet", dim
    )


# --------------------------------------------------------------------------
# q165 — ANN quality evaluation: recall@5 of the sign-LSH index (q37)
# against the exact brute-force top-5 (q36), per query and summarized.
# The eval every ANN deployment runs before trusting an index; both
# sides are the engine's own operators, the oracle recomputes both in
# SQL. Set-valued comparison via an equi-join on (query, neighbor).
# --------------------------------------------------------------------------
@register(
    "q165_ann_recall",
    oracle=f"""
    WITH exact_r AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {_sql_cos('q.qv', 'c.embedding')}
                                    DESC, c.vec_id ASC) AS rank
        FROM embeddings c, (SELECT vec_id AS query_id, embedding AS qv
                            FROM embeddings WHERE vec_id < 10) q
        WHERE c.vec_id != q.query_id
      ) WHERE rank <= 5
    ), b AS (
      SELECT vec_id, embedding, {_sql_bucket('embedding')} AS bucket
      FROM embeddings
    ), ann AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {_sql_cos('q.qv', 'c.embedding')}
                                    DESC, c.vec_id ASC) AS rank
        FROM b c JOIN (SELECT vec_id AS query_id, embedding AS qv, bucket
                       FROM b WHERE vec_id < 10) q
          ON c.bucket = q.bucket
        WHERE c.vec_id != q.query_id
      ) WHERE rank <= 5
    )
    SELECT e.query_id,
           COUNT(*) AS k_exact,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS k_hit,
           round(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 / COUNT(*), 6) AS recall_at_5
    FROM exact_r e LEFT JOIN ann a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id
    """,
)
def q165(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id")
    ann = S.lsh_ann_topk(emb, queries, k=5, weights=_WEIGHTS).select(
        F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an"))
    joined = exact.join(
        ann, (exact.query_id == ann.aq)
        & (exact.neighbor_id == ann.an), "left")
    hit = F.when(F.col("an").isNotNull(), 1).otherwise(0)
    return joined.groupBy("query_id").agg(
        F.count("*").alias("k_exact"),
        F.sum(hit).alias("k_hit"),
        F.round(F.sum(hit) / F.count("*"), 6).alias("recall_at_5"),
    )


# --------------------------------------------------------------------------
# q170 — embedding covariance matrix (the whitening / PCA-prep moment
# pass): upper-triangle cov via PARTIAL GRAM aggregation — each
# partition emits one d^2 partial (X^T X, column sums, count) from a
# single BLAS call, so shuffle volume is #partitions x d^2 regardless
# of corpus size. The oracle replays the moments with zipped unnests.
# --------------------------------------------------------------------------
@register(
    "q170_embed_covariance",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             unnest(range(1, len(embedding) + 1)) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ), n AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings
    ), m AS (
      SELECT i, SUM(x) AS sx FROM e GROUP BY i
    )
    SELECT a.i AS i, b.i AS j,
           round(SUM(a.x * b.x) / n.n
                 - (ma.sx / n.n) * (mb.sx / n.n), 6) + 0.0 AS cov
    FROM e a
    JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
    CROSS JOIN n
    JOIN m ma ON ma.i = a.i
    JOIN m mb ON mb.i = b.i
    GROUP BY a.i, b.i, n.n, ma.sx, mb.sx
    """,
)
def q170(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return S.covariance_upper(emb)


# --------------------------------------------------------------------------
# q174 — product-quantization encode: 64-dim vectors -> 4 sub-space codes
# (nearest of 4 centroids per 16-dim slice, codebook = the first four
# corpus vectors' slices) + reconstruction error. PQ is the standard
# compression step that makes billion-vector ANN indexes RAM-resident;
# the codebook is dimension-sized so it inlines as literals and the
# encode stays map-only inside codegen. Distances use the dot identity
# |x|^2 - 2<x,c> + |c|^2 with sequential folds, replayed exactly by the
# oracle; argmin ties break to the lowest centroid id.
# --------------------------------------------------------------------------
_PQ_SUBS = "(VALUES (0), (1), (2), (3))"


@register(
    "q174_pq_encode",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cb AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 4
    ), sub AS (
      SELECT e.vec_id, s.s, list_slice(e.v, s.s * 16 + 1, s.s * 16 + 16) AS x
      FROM e, {_PQ_SUBS} s(s)
    ), csub AS (
      SELECT cb.cid, s.s, list_slice(cb.v, s.s * 16 + 1, s.s * 16 + 16) AS c
      FROM cb, {_PQ_SUBS} s(s)
    ), d AS (
      SELECT sub.vec_id, sub.s, csub.cid,
             list_dot_product(x, x) - 2 * list_dot_product(x, c)
               + list_dot_product(c, c) AS dist
      FROM sub JOIN csub USING (s)
    ), best AS (
      SELECT vec_id, s, cid, dist,
             ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                ORDER BY dist ASC, cid ASC) AS rk
      FROM d
    )
    SELECT vec_id,
           CAST(MAX(CASE WHEN s = 0 THEN cid END) AS INTEGER) AS code_0,
           CAST(MAX(CASE WHEN s = 1 THEN cid END) AS INTEGER) AS code_1,
           CAST(MAX(CASE WHEN s = 2 THEN cid END) AS INTEGER) AS code_2,
           CAST(MAX(CASE WHEN s = 3 THEN cid END) AS INTEGER) AS code_3,
           round(SUM(dist), 6) AS recon_err
    FROM best WHERE rk = 1 GROUP BY vec_id
    """,
)
def q174(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    # dimension-sized collect: 4 codebook vectors (the broadcast-literal
    # pattern — same rationale as inlined LSH hyperplanes)
    rows = (emb.filter(F.col("vec_id") < 4)
            .orderBy("vec_id").select("embedding").collect())
    codebook = [
        [[float(x) for x in r.embedding[s * 16:(s + 1) * 16]] for r in rows]
        for s in range(4)
    ]
    return S.pq_encode(emb, codebook)


# --------------------------------------------------------------------------
# q176 — Matryoshka truncation eval: recall@5 of exact search on the
# 16-dim embedding PREFIX vs exact search on the full 64 dims — the
# measurement behind MRL-style dimension-reduction decisions (store the
# prefix, re-rank with the tail). Both sides are the engine's own exact
# top-k operator; the truncation is a JVM-side slice, so the eval adds
# no new kernel — just a different projection feeding the same search.
# --------------------------------------------------------------------------
def _sql_cos_slice(a: str, b: str, d: int) -> str:
    sa = f"list_slice(CAST({a} AS DOUBLE[]), 1, {d})"
    sb = f"list_slice(CAST({b} AS DOUBLE[]), 1, {d})"
    return (
        f"list_dot_product({sa}, {sb})"
        f" / (sqrt(list_dot_product({sa}, {sa}))"
        f" * sqrt(list_dot_product({sb}, {sb})))"
    )


@register(
    "q176_matryoshka_recall",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 10),
    full_r AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {_sql_cos('q.qv', 'c.embedding')}
                                    DESC, c.vec_id ASC) AS rank
        FROM embeddings c, q WHERE c.vec_id != q.query_id
      ) WHERE rank <= 5
    ), trunc_r AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_sql_cos_slice('q.qv', 'c.embedding', 16)}
                   DESC, c.vec_id ASC) AS rank
        FROM embeddings c, q WHERE c.vec_id != q.query_id
      ) WHERE rank <= 5
    )
    SELECT f.query_id,
           CAST(COUNT(*) AS BIGINT) AS k_full,
           CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS k_hit,
           round(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 / COUNT(*), 6) AS recall_at_5
    FROM full_r f LEFT JOIN trunc_r t
      ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
    GROUP BY f.query_id
    """,
)
def q176(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id")
    emb16 = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    q16 = emb16.filter(F.col("vec_id") < 10)
    trunc = S.brute_force_topk(emb16, q16, k=5).select(
        F.col("query_id").alias("tq"), F.col("neighbor_id").alias("tn"))
    joined = exact.join(
        trunc, (exact.query_id == trunc.tq)
        & (exact.neighbor_id == trunc.tn), "left")
    hit = F.when(F.col("tn").isNotNull(), 1).otherwise(0)
    return joined.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("k_full"),
        F.sum(hit).cast("bigint").alias("k_hit"),
        F.round(F.sum(hit) / F.count("*"), 6).alias("recall_at_5"),
    )


# --------------------------------------------------------------------------
# q178 — hard-negative mining for contrastive training: for each anchor
# (vec_id < 20), the 3 highest-cosine vectors with a DIFFERENT label —
# the negatives that actually move a contrastive loss. Same broadcast
# anchors + map-only scoring + per-anchor top-k shape as q36; the label
# filter rides inside the scan.
# --------------------------------------------------------------------------
@register(
    "q178_hard_negatives",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
               FROM embeddings WHERE vec_id < 20),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             {_sql_cos('q.qv', 'c.embedding')} AS cs
      FROM embeddings c, q
      WHERE c.label != q.ql
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def q178(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("ql"),
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("ql"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            S.cosine(F.col("qv"), F.col("embedding")).alias("cs"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cs").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "rank")
    )


# --------------------------------------------------------------------------
# q197 — embedding OOD scoring (diagonal Mahalanobis): distance from
# the corpus mean weighted by per-dimension variance, top-10 outliers —
# the out-of-distribution filter curation pipelines run on embedding
# columns. Moments come from ONE aggregation over zipped unnests
# (map-side combinable); the score pass is a broadcast join of the
# 64-row moment table; ordering uses the rounded score (engine-
# independent) with vec_id tie-break.
# --------------------------------------------------------------------------
@register(
    "q197_embedding_ood",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             unnest(range(1, len(embedding) + 1)) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ), m AS (
      SELECT i, AVG(x) AS mu,
             AVG(x * x) - AVG(x) * AVG(x) AS var
      FROM e GROUP BY i
    ), scored AS (
      SELECT e.vec_id,
             round(SUM((e.x - m.mu) * (e.x - m.mu) / m.var), 6) AS ood
      FROM e JOIN m ON e.i = m.i
      GROUP BY e.vec_id
    )
    SELECT vec_id, ood FROM (
      SELECT vec_id, ood,
             row_number() OVER (ORDER BY ood DESC, vec_id ASC) AS rk
      FROM scored
    ) WHERE rk <= 10
    """,
)
def q197(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("i0", "x"),
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "x") \
        .localCheckpoint(eager=False)  # moment build + scoring join
    m = e.groupBy("i").agg(
        F.avg("x").alias("mu"),
        (F.avg(F.col("x") * F.col("x"))
         - F.avg("x") * F.avg("x")).alias("var"),
    )
    scored = (
        e.join(F.broadcast(m), "i")
        .groupBy("vec_id")
        .agg(F.round(
            F.sum((F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu"))
                  / F.col("var")), 6).alias("ood"))
    )
    w = Window.orderBy(F.col("ood").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10).drop("rk")
    )


# --------------------------------------------------------------------------
# q231 — domain-centroid similarity matrix: per-source mean embedding
# (fact-scale aggregation, one shuffle on source), then pairwise cosine
# between the ~20 source centroids — the "which domains are semantically
# close" input to mixture design (q215's temperature weights often get
# adjusted by exactly this matrix). The pairwise stage is dimension x
# dimension (20x20), so the join is broadcast-trivial at any corpus
# size; only distinct pairs (a < b) are emitted.
# --------------------------------------------------------------------------
_DOC_PER_VEC = 1  # vec_id == doc_id in the co-generated testdata


@register(
    "q231_domain_centroid_sim",
    oracle=f"""
    WITH cent AS (
      SELECT d.source AS source,
             [SUM(CAST(e.embedding[1] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[2] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[3] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[4] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[5] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[6] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[7] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[8] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[9] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[10] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[11] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[12] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[13] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[14] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[15] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[16] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[17] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[18] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[19] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[20] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[21] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[22] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[23] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[24] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[25] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[26] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[27] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[28] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[29] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[30] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[31] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[32] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[33] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[34] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[35] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[36] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[37] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[38] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[39] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[40] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[41] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[42] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[43] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[44] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[45] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[46] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[47] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[48] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[49] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[50] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[51] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[52] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[53] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[54] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[55] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[56] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[57] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[58] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[59] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[60] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[61] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[62] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[63] AS DOUBLE)) / COUNT(*), SUM(CAST(e.embedding[64] AS DOUBLE)) / COUNT(*)] AS c
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
      GROUP BY d.source
    )
    SELECT a.source AS source_a, b.source AS source_b,
           round({_sql_cos('a.c', 'b.c')}, 6) AS cos_sim
    FROM cent a JOIN cent b ON a.source < b.source
    """,
)
def q231(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    dim = len(emb.select("embedding").first()[0])
    joined = emb.join(docs, emb.vec_id == docs.doc_id)
    cent = joined.groupBy("source").agg(
        F.array(*[
            (F.sum(F.col("embedding")[i].cast("double")) / F.count("*"))
            for i in range(dim)
        ]).alias("c")
    )
    a = cent.select(F.col("source").alias("source_a"),
                    F.col("c").alias("ca"))
    b = cent.select(F.col("source").alias("source_b"),
                    F.col("c").alias("cb"))
    dot = F.aggregate(
        F.zip_with("ca", "cb", lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(
        F.zip_with("ca", "ca", lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(
        F.zip_with("cb", "cb", lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x))
    return (
        a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
        .select("source_a", "source_b",
                F.round(dot / (na * nb), 6).alias("cos_sim"))
    )


# --------------------------------------------------------------------------
# q253 — int8 SCALAR QUANTIZATION + recall@5: the third leg of the
# vector-compression family (PQ q174, Matryoshka truncation q176).
# Codes are symmetric max-abs int8 (floor(x*127/m + 0.5) — explicit
# half-up so the tie rule is engine-portable); approx ranking uses the
# INTEGER cosine ratio, where per-vector scales cancel and every dot
# term is an exact small integer, so the ranking is bit-stable under
# any partitioning. Recall joins against the engine's own exact
# brute-force top-5 (q36's operator); the oracle replays both sides.
# --------------------------------------------------------------------------
@register(
    "q253_sq8_recall",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS m
      FROM e
    ), q8 AS (
      SELECT vec_id,
             list_transform(v, x -> FLOOR(x * 127 / m + 0.5)) AS q
      FROM s
    ), qq AS (
      SELECT vec_id AS query_id, q AS qv FROM q8 WHERE vec_id < 10
    ), approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT qq.query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY qq.query_id
                 ORDER BY list_dot_product(qq.qv, c.q)
                   / sqrt(list_dot_product(qq.qv, qq.qv)
                          * list_dot_product(c.q, c.q)) DESC,
                 c.vec_id ASC) AS rk
        FROM q8 c, qq WHERE c.vec_id != qq.query_id
      ) WHERE rk <= 5
    ), exact_r AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {_sql_cos('q.qv', 'c.embedding')} DESC,
                 c.vec_id ASC) AS rank
        FROM embeddings c, (SELECT vec_id AS query_id, embedding AS qv
                            FROM embeddings WHERE vec_id < 10) q
        WHERE c.vec_id != q.query_id
      ) WHERE rank <= 5
    )
    SELECT e.query_id,
           CAST(COUNT(*) AS BIGINT) AS k_exact,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS k_hit,
           round(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 / COUNT(*), 6) AS recall_at_5
    FROM exact_r e LEFT JOIN approx a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id
    """,
)
def q253(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    codes = S.sq8_quantize(emb)
    ann = S.sq8_topk(
        codes, queries.select("vec_id"), k=5
    ).select(F.col("query_id").alias("aq"),
             F.col("neighbor_id").alias("an"))
    exact = S.brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id")
    joined = exact.join(
        ann, (exact.query_id == ann.aq)
        & (exact.neighbor_id == ann.an), "left")
    hit = F.when(F.col("an").isNotNull(), 1).otherwise(0)
    return joined.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("k_exact"),
        F.sum(hit).cast("bigint").alias("k_hit"),
        F.round(F.sum(hit) / F.count("*"), 6).alias("recall_at_5"),
    )


# --------------------------------------------------------------------------
# q285 — PCA POWER ITERATION on the INTEGER Gram matrix: the top
# principal direction of the embedding cloud, exactly. Vectors are SQ8
# int8-quantized (q253's half-up floor rule), the d x d Gram
# aggregates as EXACT int64 partial matmuls (similarity.py::int_gram —
# shuffle volume #partitions x d^2, never the vectors), and two power
# iterations v1 = G*1, v2 = G*v1 run as 64-row joins with
# DECIMAL(38,0) products (G*v1 entries pass int64 at fact scale; the
# Rayleigh numerator sum(v1*v2) <= d*(d*Gmax)*(d^2*Gmax^2) needs the
# full 38 digits — documented headroom to n ~ 1e14 rows). Rayleigh
# quotient and top-dimension share are single IEEE divisions of exact
# decimals; top_dim argmax ties to the lowest index. The oracle
# replays Gram + both iterations in HUGEINT over the same quantized
# codes — every intermediate integer must agree.
# --------------------------------------------------------------------------
@register(
    "q285_pca_power_iteration",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), s AS (
      SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS m
      FROM e
    ), q8 AS (
      SELECT vec_id,
             list_transform(v, x -> CAST(FLOOR(x * 127 / m + 0.5)
                                         AS BIGINT)) AS q
      FROM s
    ), flat AS (
      SELECT vec_id, unnest(range(1, len(q) + 1)) AS i, unnest(q) AS x
      FROM q8
    ), g AS (
      SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS g
      FROM flat a JOIN flat b USING (vec_id) GROUP BY 1, 2
    ), v1 AS (
      SELECT i, SUM(g) AS s FROM g GROUP BY i
    ), v2 AS (
      SELECT g.i, SUM(g.g * v1.s) AS s FROM g JOIN v1 ON v1.i = g.j
      GROUP BY g.i
    ), scal AS (
      SELECT (SELECT COUNT(*) FROM q8) AS n,
             (SELECT SUM(v1.s * v2.s) FROM v1 JOIN v2 USING (i)) AS r_num,
             (SELECT SUM(s * s) FROM v1) AS r_den,
             (SELECT SUM(abs(s)) FROM v2) AS l1
    ), top AS (
      SELECT i, abs(s) AS a FROM v2 ORDER BY abs(s) DESC, i ASC LIMIT 1
    )
    SELECT CAST(n AS BIGINT) AS n_vectors,
           round(CAST(r_num AS DOUBLE) / CAST(r_den AS DOUBLE), 6)
             AS rayleigh_1,
           CAST(top.i AS INT) AS top_dim,
           round(CAST(top.a AS DOUBLE) / CAST(l1 AS DOUBLE), 6)
             AS top_dim_share
    FROM scal, top
    """,
)
def q285(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    codes = S.sq8_quantize(emb)
    gram = S.int_gram(codes).localCheckpoint()  # d^2+1 rows, planned 4x
    g = gram.filter(F.col("i") > 0)
    n = gram.filter((F.col("i") == 0) & (F.col("j") == 0)).select(
        F.col("g").alias("n"))
    # v1/v2 are d-row matvec results referenced 4x/3x below — lazily
    # checkpoint so each matvec aggregation over the gram runs once
    v1 = g.groupBy(F.col("i")).agg(F.sum("g").alias("s")).localCheckpoint(
        eager=False)
    v2 = (
        g.join(F.broadcast(v1.select(F.col("i").alias("j"),
                                     F.col("s").alias("v1j"))), "j")
        .groupBy("i")
        .agg(F.sum(F.col("g").cast("decimal(19,0)")
                   * F.col("v1j").cast("decimal(19,0)")).alias("s"))
        .localCheckpoint(eager=False)
    )
    r_num = (
        v1.select(F.col("i"), F.col("s").alias("a"))
        .join(v2.select(F.col("i"), F.col("s").alias("b")), "i")
        .agg(F.sum(F.col("a").cast("decimal(19,0)") * F.col("b"))
             .alias("r_num"))
    )
    r_den = v1.agg(F.sum(F.col("s").cast("decimal(19,0)")
                         * F.col("s").cast("decimal(19,0)")).alias("r_den"))
    l1 = v2.agg(F.sum(F.abs(F.col("s"))).alias("l1"))
    top = (
        v2.select(F.col("i"), F.abs(F.col("s")).alias("a"))
        .orderBy(F.col("a").desc(), F.col("i").asc()).limit(1)
    )
    return (
        n.crossJoin(F.broadcast(r_num)).crossJoin(F.broadcast(r_den))
        .crossJoin(F.broadcast(l1)).crossJoin(F.broadcast(top))
        .select(
            F.col("n").cast("bigint").alias("n_vectors"),
            F.round(F.col("r_num").cast("double")
                    / F.col("r_den").cast("double"), 6).alias("rayleigh_1"),
            F.col("i").cast("int").alias("top_dim"),
            F.round(F.col("a").cast("double")
                    / F.col("l1").cast("double"), 6).alias("top_dim_share"),
        )
    )


# --------------------------------------------------------------------------
# q307 — HUBNESS AUDIT of the embedding space: in-degree distribution
# of the k-NN graph (k = 5). High-dimensional spaces grow "hubs" —
# points that appear in everyone's neighbor list — which silently skew
# ANN retrieval, SemDeDup, and hard-negative mining; the in-degree
# histogram is the standard diagnostic (Radovanovic et al., JMLR 2010).
# The k-NN graph reuses the q37/q38 scale path: candidates meet in a
# bucket EQUI-SELF-JOIN (sign-LSH — collisions, never corpus x corpus),
# exact cosine re-rank within bucket, top-5 per query by a window
# partitioned BY query, then one shrinking count per neighbor; degree-0
# points are kept through a left join. Integer counts — the only floats
# (cosines) affect ranking exactly as in the already-verified q37.
# --------------------------------------------------------------------------
@register(
    "q307_hubness",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_sql_bucket('embedding')} AS bucket
      FROM embeddings
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_sql_cos('q.embedding', 'c.embedding')} AS cs
      FROM b c JOIN b q ON c.bucket = q.bucket
      WHERE c.vec_id != q.vec_id
    ), knn AS (
      SELECT neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cs DESC, neighbor_id ASC)
                 AS rank
        FROM scored
      ) WHERE rank <= 5
    ), deg AS (
      SELECT e.vec_id, COUNT(k.neighbor_id) AS degree
      FROM embeddings e LEFT JOIN knn k ON k.neighbor_id = e.vec_id
      GROUP BY e.vec_id
    )
    SELECT CAST(degree AS BIGINT) AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_points
    FROM deg GROUP BY degree ORDER BY degree
    """,
)
def q307(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    b = emb.select(
        "vec_id", "embedding",
        S.lsh_bucket(F.col("embedding"), _WEIGHTS).alias("bucket"))
    c = b.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("embedding").alias("cvec"), "bucket")
    q = b.select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qvec"), "bucket")
    scored = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                S.cosine(F.col("qvec"), F.col("cvec")).alias("cs"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cs").desc(), F.col("neighbor_id").asc())
    knn = (scored.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= 5).select("neighbor_id"))
    indeg = knn.groupBy("neighbor_id").agg(F.count("*").alias("degree"))
    deg = (
        emb.select("vec_id")
        .join(indeg, emb.vec_id == indeg.neighbor_id, "left")
        .select(F.coalesce(F.col("degree"), F.lit(0)).alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count("*").cast("bigint").alias("n_points"))
        .select(F.col("degree").cast("bigint").alias("degree"),
                "n_points")
        .orderBy("degree")
    )


# --------------------------------------------------------------------------
# q311 — k-CENTER GREEDY CORESET (Gonzalez 2-approximation — the
# geometry-coverage data-selection pass used for active learning and
# "facility location" subset selection): start from the lowest vec_id,
# then 7 times pick the point FARTHEST from the chosen set. State is
# one running min-distance column updated by least() against each new
# broadcast-literal center (never a distance matrix); the argmax is a
# single max(struct(dist, -id)) aggregate with a deterministic
# id tie-break; per round, two bounded 1-row collects (the argmax row
# and the center vector — driver metadata, the exact_quantiles
# pattern). Distances use the dot-product DECOMPOSITION
# d2 = <a,a> - 2<a,b> + <b,b> so both engines run the same proven
# arithmetic as q37's cosine. The oracle unrolls all 7 rounds as
# chained CTEs. Output: selection order, chosen id, coverage radius.
# --------------------------------------------------------------------------
_KC_ROUNDS = 8


def _kc_oracle() -> str:
    ldp = "list_dot_product"
    parts = [
        f"""WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                 {ldp}(CAST(embedding AS DOUBLE[]),
                       CAST(embedding AS DOUBLE[])) AS na
          FROM embeddings
        ), c0 AS (
          SELECT vec_id AS id0, v AS cv, na AS cn FROM e
          ORDER BY vec_id ASC LIMIT 1
        ), d1 AS (
          SELECT e.vec_id, e.v, e.na,
                 e.na - 2 * {ldp}(e.v, c0.cv) + c0.cn AS mind
          FROM e, c0
        )"""
    ]
    sel = ["SELECT CAST(0 AS BIGINT) AS pick, id0 AS vec_id, "
           "CAST(0.0 AS DOUBLE) AS radius FROM c0"]
    for k in range(1, _KC_ROUNDS):
        parts.append(f"""p{k} AS (
          SELECT vec_id AS id{k}, mind AS r{k} FROM d{k}
          ORDER BY mind DESC, vec_id ASC LIMIT 1
        ), c{k} AS (
          SELECT e.v AS cv, e.na AS cn FROM e, p{k} WHERE e.vec_id = id{k}
        ), d{k + 1} AS (
          SELECT d.vec_id, d.v, d.na,
                 LEAST(d.mind,
                       d.na - 2 * list_dot_product(d.v, c{k}.cv)
                       + c{k}.cn) AS mind
          FROM d{k} d, c{k}
        )""")
        sel.append(f"SELECT CAST({k} AS BIGINT), id{k}, "
                   f"round(r{k}, 6) FROM p{k}")
    return (parts[0] + ", " + ", ".join(parts[1:])
            + " " + " UNION ALL ".join(sel) + " ORDER BY pick")


@register("q311_kcenter_coreset", oracle=_kc_oracle())
def q311(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.col("embedding").alias("v"),
        S.dot(F.col("embedding"), F.col("embedding")).alias("na"))

    def lit_vec(vals):
        return F.array(*[F.lit(float(x)) for x in vals])

    first = e.orderBy(F.col("vec_id").asc()).limit(1).collect()[0]  # 1 row
    picks = [(0, int(first.vec_id), 0.0)]
    cv, cn = list(first.v), float(first.na)
    d = e.select(
        "vec_id", "v", "na",
        (F.col("na") - 2 * S.dot(F.col("v"), lit_vec(cv)) + F.lit(cn))
        .alias("mind")).localCheckpoint(eager=False)
    for k in range(1, _KC_ROUNDS):
        # ONE job per round: the argmax struct carries the winner's
        # vector and norm (fields after the unique (mind, -vec_id) key
        # never influence the max), so the former second collect — a
        # full re-scan to fetch the picked row — is gone; the lazy
        # checkpoint materializes under this same action while still
        # truncating the per-round lineage.
        top = d.agg(F.max(F.struct(F.col("mind"),
                                   (-F.col("vec_id")).alias("nid"),
                                   F.col("na"), F.col("v")))
                    .alias("m")).collect()[0].m  # bounded: 1 row
        pick_id, radius = -top.nid, float(top.mind)
        picks.append((k, int(pick_id), round(radius, 6)))
        cv, cn = list(top.v), float(top.na)
        d = d.select(
            "vec_id", "v", "na",
            F.least(
                F.col("mind"),
                F.col("na") - 2 * S.dot(F.col("v"), lit_vec(cv))
                + F.lit(cn)).alias("mind")).localCheckpoint(eager=False)
    # single-slice parallelize: a local createDataFrame(list) pays 32
    # Python tasks for 8 rows
    return spark.createDataFrame(
        spark.sparkContext.parallelize(picks, 1),
        "pick bigint, vec_id bigint, radius double").orderBy("pick")


# --------------------------------------------------------------------------
# q313 — kNN LABEL PROBE (the standard embedding-quality eval from the
# SSL literature: predict a label from the 5 nearest neighbors' votes
# and read the confusion matrix). Labels are the deterministic
# vec_id % 3 classes; the k-NN graph reuses the q307 LSH-bucket
# equi-self-join + per-query top-5 window; the vote argmax is one
# max(struct(votes, -label)) per query (ties to the SMALLEST label);
# queries with an empty candidate bucket surface as predicted = -1.
# Output: 3x(3+1) confusion counts + per-true-class accuracy — all
# integers and one exact division.
# --------------------------------------------------------------------------
@register(
    "q313_knn_label_probe",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_sql_bucket('embedding')} AS bucket
      FROM embeddings
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_sql_cos('q.embedding', 'c.embedding')} AS cs
      FROM b c JOIN b q ON c.bucket = q.bucket
      WHERE c.vec_id != q.vec_id
    ), knn AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cs DESC, neighbor_id ASC)
                 AS rank
        FROM scored) WHERE rank <= 5
    ), votes AS (
      SELECT query_id, neighbor_id % 3 AS lab, COUNT(*) AS nv
      FROM knn GROUP BY 1, 2
    ), pred AS (
      SELECT e.vec_id, e.vec_id % 3 AS true_label,
             COALESCE(
               (SELECT v.lab FROM votes v WHERE v.query_id = e.vec_id
                ORDER BY v.nv DESC, v.lab ASC LIMIT 1), -1) AS pred_label
      FROM embeddings e
    )
    SELECT CAST(true_label AS BIGINT) AS true_label,
           CAST(pred_label AS BIGINT) AS pred_label,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY 1, 2 ORDER BY true_label, pred_label
    """,
)
def q313(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    b = emb.select(
        "vec_id", "embedding",
        S.lsh_bucket(F.col("embedding"), _WEIGHTS).alias("bucket"))
    c = b.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("embedding").alias("cvec"), "bucket")
    q = b.select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qvec"), "bucket")
    scored = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                S.cosine(F.col("qvec"), F.col("cvec")).alias("cs"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cs").desc(), F.col("neighbor_id").asc())
    knn = (scored.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= 5)
           .select("query_id", (F.col("neighbor_id") % 3).alias("lab")))
    votes = knn.groupBy("query_id", "lab").agg(F.count("*").alias("nv"))
    pred = (
        votes.groupBy("query_id")
        .agg(F.max(F.struct(F.col("nv"), (-F.col("lab")).alias("nl")))
             .alias("m"))
        .select("query_id", (-F.col("m.nl")).alias("pred_label"))
    )
    out = (
        emb.select("vec_id", (F.col("vec_id") % 3).alias("true_label"))
        .join(pred, emb.vec_id == pred.query_id, "left")
        .select("true_label",
                F.coalesce(F.col("pred_label"), F.lit(-1))
                .alias("pred_label"))
    )
    return (
        out.groupBy("true_label", "pred_label")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(F.col("true_label").cast("bigint").alias("true_label"),
                F.col("pred_label").cast("bigint").alias("pred_label"),
                "n")
        .orderBy("true_label", "pred_label")
    )


# --------------------------------------------------------------------------
# q409 — BINARY QUANTIZATION + Hamming rerank (the fourth leg of the
# vector-compression family: PQ q174, Matryoshka q176, SQ8 q253): each
# vector compresses to its SIGN BITS (64 dims -> 64 bits = 32x smaller;
# exact — no float threshold arithmetic, the corpus is zero-centered),
# candidates rank by Hamming AGREEMENT (integer-exact, bit-stable on
# any partitioning), the top-20 coarse set reranks with the true float
# cosine, and recall@5 is scored against the engine's own exact
# brute-force top-5. This is the production vector-DB fast path:
# at 100 TB the coarse pass streams 1-bit codes (32x less IO than
# floats), and only 20 full vectors per query are ever touched again.
# --------------------------------------------------------------------------
@register(
    "q409_binary_quantization",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), b AS (
      SELECT vec_id, v,
             list_transform(v, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END)
                 AS bits
      FROM e
    ), q AS (
      SELECT vec_id AS query_id, v AS qv, bits AS qb
      FROM b WHERE vec_id < 10
    ), coarse AS (
      SELECT query_id, vec_id, v, qv FROM (
        SELECT q.query_id, c.vec_id, c.v, q.qv,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY list_sum(list_transform(
                     generate_series(1, len(q.qb)),
                     i -> CASE WHEN q.qb[i] = c.bits[i]
                          THEN 1 ELSE 0 END)) DESC,
                 c.vec_id ASC) AS rk
        FROM b c, q WHERE c.vec_id != q.query_id
      ) WHERE rk <= 20
    ), rerank AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY {_sql_cos('qv', 'v')} DESC, vec_id ASC) AS rk2
        FROM coarse
      ) WHERE rk2 <= 5
    ), exact_r AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {_sql_cos('q.qv', 'c.v')} DESC,
                 c.vec_id ASC) AS rank
        FROM e c, q WHERE c.vec_id != q.query_id
      ) WHERE rank <= 5
    )
    SELECT e.query_id,
           CAST(COUNT(*) AS BIGINT) AS k_exact,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0
                END) AS BIGINT) AS k_hit,
           round(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0
                 END) / COUNT(*), 6) AS recall_at_5
    FROM exact_r e LEFT JOIN rerank a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id
    """,
)
def q409(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.partitioning import ensure_min_partitions

    emb = load(spark, sf_dir, "embeddings")
    bits = F.transform(
        "embedding", lambda x: F.when(x > 0, 1).otherwise(0))
    b = ensure_min_partitions(
        emb.select("vec_id", "embedding", bits.alias("bits")))
    q = (b.filter(F.col("vec_id") < 10)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qv"),
                 F.col("bits").alias("qb")))
    agree = F.aggregate(
        F.zip_with("qb", "bits",
                   lambda a, c: F.when(a == c, 1).otherwise(0)),
        F.lit(0), lambda acc, x: acc + x)
    scored = (b.crossJoin(F.broadcast(q))
              .filter(F.col("vec_id") != F.col("query_id"))
              .select("query_id", "vec_id", "embedding", "qv",
                      agree.alias("ham")))
    wc = Window.partitionBy("query_id").orderBy(
        F.col("ham").desc(), F.col("vec_id").asc())
    coarse = (scored.withColumn("rk", F.row_number().over(wc))
              .filter(F.col("rk") <= 20))
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cs").desc(), F.col("vec_id").asc())
    rerank = (coarse
              .select("query_id", "vec_id",
                      S.cosine(F.col("qv"), F.col("embedding"))
                      .alias("cs"))
              .withColumn("rk2", F.row_number().over(wr))
              .filter(F.col("rk2") <= 5)
              .select("query_id", F.col("vec_id").alias("an")))
    exact = S.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5
    ).select("query_id", "neighbor_id")
    joined = exact.join(
        rerank, (exact.query_id == rerank.query_id)
        & (exact.neighbor_id == rerank.an), "left") \
        .select(exact.query_id, exact.neighbor_id, rerank.an)
    hit = F.when(F.col("an").isNotNull(), 1).otherwise(0)
    return joined.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("k_exact"),
        F.sum(hit).cast("bigint").alias("k_hit"),
        F.round(F.sum(hit) / F.count("*"), 6).alias("recall_at_5"),
    )

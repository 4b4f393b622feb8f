"""Wave 5: graph + retrieval scoring — iterative PageRank with an exact
unrolled-iteration SQL oracle, and BM25 keyword ranking over the
documents corpus.

PageRank is the representative iterative-dataflow operator (the shape of
label propagation / influence scoring on a join-derived graph); BM25 is
the retrieval-quality scorer a training-data pipeline uses to mine
topical subsets. Both stay fully relational: per-iteration joins for the
rank walk, broadcast corpus statistics for the scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, register

N_NATIONS = 25
DAMP = 0.85
N_ITERS = 5

_EDGE_SQL = """
  e AS (SELECT s_nationkey AS src, c_nationkey AS dst, COUNT(*) AS w
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2),
  o AS (SELECT src, SUM(w) AS ow FROM e GROUP BY src),
  r0 AS (SELECT n_nationkey AS node, 1.0/25 AS r FROM nation)
"""


def _pagerank_oracle() -> str:
    # unroll the fixed-point: r_{k+1}(v) = (1-d)/N + d * sum_in r_k(u)*w/ow
    steps = []
    for k in range(N_ITERS):
        steps.append(
            f"""r{k + 1} AS (
      SELECT v.node,
             0.15/25 + 0.85 * COALESCE(SUM(u.r * e.w / o.ow), 0) AS r
      FROM r{k} v
      LEFT JOIN e ON e.dst = v.node
      LEFT JOIN r{k} u ON u.node = e.src
      LEFT JOIN o ON o.src = e.src
      GROUP BY v.node)"""
        )
    return (
        "WITH "
        + _EDGE_SQL
        + ", "
        + ",\n  ".join(steps)
        + f"\nSELECT node, round(r, 8) AS rank FROM r{N_ITERS}"
    )


# --------------------------------------------------------------------------
# q117 — PageRank over the nation trade graph (supplier-nation →
# customer-nation, edge weight = lineitem count). The walk is K rounds of
# edge⨝rank join + re-aggregation; edges and out-degrees are computed
# once and cached. Node count stays dimension-sized while the edge
# derivation scans the fact table — the realistic shape for entity
# graphs distilled from event logs.
# --------------------------------------------------------------------------
@register("q117_pagerank_nations", oracle=_pagerank_oracle())
def q117(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")

    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
        .persist()
    )
    out = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # contribution weight per edge is iteration-invariant: fold w/ow once.
    # The graph is node²-bounded (dimension-scale) — one partition, cached;
    # at entity-graph scale this stays partitioned and ranks co-partition
    # with it instead of broadcasting.
    contrib = (
        edges.join(out, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("cw"))
        .coalesce(1)
        .persist()
    )
    nodes = nation.select(F.col("n_nationkey").alias("node")).coalesce(1)
    ranks = nodes.withColumn("r", F.lit(1.0 / N_NATIONS))
    for _ in range(N_ITERS):
        inflow = (
            contrib.join(F.broadcast(ranks), contrib.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("cw")).alias("s"))
        )
        ranks = (
            nodes.join(F.broadcast(inflow), nodes.node == inflow.dst, "left")
            .select(
                "node",
                (
                    F.lit((1 - DAMP) / N_NATIONS)
                    + F.lit(DAMP) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("r"),
            )
            # truncate lineage so plan depth stays O(1) per iteration —
            # the iterative-algorithm discipline (same as
            # functions/dedup.py::connected_components)
            .localCheckpoint(eager=False)
        )
    result = ranks.select("node", F.round("r", 8).alias("rank"))
    return result


# --------------------------------------------------------------------------
# q118 — BM25 keyword ranking (k1=1.2, b=0.75) for a fixed query over the
# documents corpus. Corpus stats (N, avgdl, per-term df) are tiny
# broadcast sides; the per-doc tf explode never shuffles wider than
# (doc, query-term) pairs. The retrieval scorer used for topical mining
# of training corpora.
# --------------------------------------------------------------------------
QUERY_TERMS = ("join", "window", "stream")
_terms_sql = ", ".join(f"'{t}'" for t in QUERY_TERMS)


@register(
    "q118_bm25",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w != '') AS ws
      FROM documents
    ), dl AS (
      SELECT doc_id, len(ws) AS dl FROM toks
    ), stats AS (
      SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl
    ), tf AS (
      SELECT doc_id, word, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(ws) AS word FROM toks)
      WHERE word IN ({_terms_sql})
      GROUP BY doc_id, word
    ), df AS (
      SELECT word, COUNT(*) AS df FROM tf GROUP BY word
    )
    SELECT tf.doc_id,
           round(SUM(
             ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
           ), 6) AS bm25
    FROM tf
    JOIN df ON tf.word = df.word
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id
    """,
)
def q118(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda w: w != "").alias("ws"),
    ).localCheckpoint(eager=False)  # dl and tf both read it: split once
    dl = toks.select("doc_id", F.size("ws").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.select("doc_id", F.explode("ws").alias("word"))
        .filter(F.col("word").isin(*QUERY_TERMS))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)  # feeds df_ AND the score join
    )
    df_ = tf.groupBy("word").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    term_score = idf * F.col("tf") * 2.2 / (
        F.col("tf")
        + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df_), "word")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
    )


# --------------------------------------------------------------------------
# q141 — directed reachability (transitive closure) over the nation
# trade graph, from a single source. Iterative frontier expansion with
# distinct accumulation — cycle-safe, O(diameter) rounds, each round one
# equi-join on the cached edge list. Oracle: recursive CTE.
# --------------------------------------------------------------------------
_REACH_SRC = 0


@register(
    "q141_reachability",
    oracle=f"""
    WITH RECURSIVE e AS (
      SELECT DISTINCT s_nationkey AS src, c_nationkey AS dst
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE l_quantity >= 45
    ), r AS (
      SELECT {_REACH_SRC} AS node
      UNION
      SELECT e.dst FROM r JOIN e ON e.src = r.node
    )
    SELECT node FROM r
    """,
)
def q141(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .distinct()
        .coalesce(1)
        .persist()
    )
    reach = (
        edges.sparkSession.createDataFrame(
            edges.sparkSession.sparkContext.parallelize([(_REACH_SRC,)], 1),
            "node int",
        )
        .select(F.col("node").cast("long"))
    )
    while True:
        grown = (
            reach.unionByName(
                edges.join(
                    F.broadcast(reach), edges.src == reach.node
                ).select(F.col("dst").alias("node"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        if grown.count() == reach.count():
            return grown
        reach = grown


# --------------------------------------------------------------------------
# q180 — ranking-quality eval: nDCG@5 of the BM25 ranking (q118) against
# a deterministic relevance label (number of distinct query terms the
# doc contains, gain 2^rel - 1). Ordering uses the ROUNDED BM25 score —
# which q118 proves matches the oracle digit-for-digit — with doc_id
# tie-break, so the ranking is engine-independent by construction. The
# retrieval twin of q165/q176's recall evals: recall checks the
# candidate set, nDCG checks the ORDER a ranker puts it in.
# --------------------------------------------------------------------------
@register("q180_bm25_ndcg")
def q180(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    bm25 = q118(spark, sf_dir)  # (doc_id, bm25) — rounded scores
    rel = docs.select(
        "doc_id",
        F.size(F.array_intersect(
            F.array_distinct(F.split("text", " ")),
            F.array(*[F.lit(t) for t in QUERY_TERMS]),
        )).alias("rel"),
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    top = (
        bm25.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 5)
        .join(rel, "doc_id")
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("pos") + 1)
    dcg = top.agg(F.sum(gain).alias("dcg"))
    wi = Window.orderBy(F.col("rel").desc(), F.col("doc_id").asc())
    ideal = (
        rel.filter(F.col("rel") > 0)
        .withColumn("pos", F.row_number().over(wi))
        .filter(F.col("pos") <= 5)
    )
    igain = (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("pos") + 1)
    idcg = ideal.agg(F.sum(igain).alias("idcg"))
    return dcg.crossJoin(F.broadcast(idcg)).select(
        F.round("dcg", 6).alias("dcg5"),
        F.round("idcg", 6).alias("idcg5"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg5"),
    )


from . import ORACLES as _OR  # noqa: E402

_OR["q180_bm25_ndcg"] = f"""
    WITH bm AS (
      {_OR["q118_bm25"]}
    ), rel AS (
      SELECT doc_id,
             len(list_intersect(
               list_distinct(string_split(text, ' ')),
               [{_terms_sql}])) AS rel
      FROM documents
    ), top AS (
      SELECT bm.doc_id, rel.rel,
             row_number() OVER (ORDER BY bm.bm25 DESC, bm.doc_id ASC) AS pos
      FROM bm JOIN rel ON bm.doc_id = rel.doc_id
    ), dcg AS (
      SELECT SUM((pow(2.0, rel) - 1) / log2(pos + 1)) AS dcg
      FROM top WHERE pos <= 5
    ), ideal AS (
      SELECT rel,
             row_number() OVER (ORDER BY rel DESC, doc_id ASC) AS pos
      FROM rel WHERE rel > 0
    ), idcg AS (
      SELECT SUM((pow(2.0, rel) - 1) / log2(pos + 1)) AS idcg
      FROM ideal WHERE pos <= 5
    )
    SELECT round(dcg.dcg, 6) AS dcg5,
           round(idcg.idcg, 6) AS idcg5,
           round(dcg.dcg / idcg.idcg, 6) AS ndcg5
    FROM dcg, idcg
"""


# --------------------------------------------------------------------------
# q181 — triangle count + global clustering coefficient on the nation
# trade graph (q117's edges, undirected/simple). The Spark side uses
# degree orientation (each triangle counted once as a closed wedge from
# its lowest-(degree, id) corner — the formulation whose wedge fan-out
# is bounded by graph degeneracy, so it survives hub-skewed entity
# graphs); the oracle counts the same triangles with the plain
# a < b < c three-way join.
# --------------------------------------------------------------------------
_TRADE_EDGES_SQL = """
    SELECT DISTINCT least(s.s_nationkey, c.c_nationkey) AS u,
                    greatest(s.s_nationkey, c.c_nationkey) AS v
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE s.s_nationkey != c.c_nationkey
"""


@register(
    "q181_triangle_count",
    oracle=f"""
    WITH e AS MATERIALIZED (
      {_TRADE_EDGES_SQL}
    ), deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) GROUP BY node
    ), tri AS (
      SELECT COUNT(*) AS t
      FROM e e1 JOIN e e2 ON e1.v = e2.u AND e1.u < e1.v AND e2.u < e2.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg)
             AS n_wedges,
           CAST(t AS BIGINT) AS n_triangles,
           round(3.0 * t / (SELECT SUM(d * (d - 1) // 2) FROM deg), 6)
             AS global_clustering
    FROM tri
    """,
)
def q181(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.graphs import triangle_stats, undirect

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    directed = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
    )
    return triangle_stats(undirect(directed))


# --------------------------------------------------------------------------
# q212 — hybrid retrieval via Reciprocal Rank Fusion (Cormack et al.,
# SIGIR 2009): fuse the BM25 keyword ranking (q118) with a dense
# cosine ranking against a fixed query embedding (vec_id 0), score =
# sum over rankers of 1/(60 + rank). Scale shape: each ranker reduces
# to a bounded top-100 via orderBy+limit (Spark plans TakeOrdered — a
# per-partition heap + driver merge, no global sort shuffle); the rank
# window then runs on a <=100-row side, and the fusion is a full-outer
# join of two 100-row sets — corpus size never enters the fused stage.
# doc_id == vec_id in the testdata (co-generated tables).
# --------------------------------------------------------------------------
_RRF_K = 60
_RRF_TOP = 100


@register("q212_rrf_fusion")
def q212(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.similarity import cosine

    lex = q118(spark, sf_dir)  # (doc_id, bm25) — oracle-proven scores
    lex_top = lex.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()) \
        .limit(_RRF_TOP)
    w_lex = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    lex_rank = lex_top.select(
        "doc_id", F.row_number().over(w_lex).alias("r_lex"))

    emb = load(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qvec))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("qv"), F.col("embedding")).alias("cs"),
        )
    )
    sem_top = scored.orderBy(F.col("cs").desc(), F.col("doc_id").asc()) \
        .limit(_RRF_TOP)
    w_sem = Window.orderBy(F.col("cs").desc(), F.col("doc_id").asc())
    sem_rank = sem_top.select(
        "doc_id", F.row_number().over(w_sem).alias("r_sem"))

    fused = (
        lex_rank.join(sem_rank, "doc_id", "full_outer")
        .select(
            "doc_id",
            (F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("r_lex")), F.lit(0.0))
             + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("r_sem")),
                          F.lit(0.0))).alias("rrf"),
        )
    )
    w_out = Window.orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
    return (
        fused.orderBy(F.col("rrf").desc(), F.col("doc_id").asc()).limit(20)
        .select("doc_id", F.row_number().over(w_out).alias("rank"),
                F.round("rrf", 8).alias("rrf"))
    )


def _sql_cos_rrf(a: str, b: str) -> str:
    return (
        f"(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
        f" / (sqrt(list_dot_product(CAST({a} AS DOUBLE[]),"
        f" CAST({a} AS DOUBLE[])))"
        f" * sqrt(list_dot_product(CAST({b} AS DOUBLE[]),"
        f" CAST({b} AS DOUBLE[])))))"
    )


from . import ORACLES as _OR2  # noqa: E402

_OR2["q212_rrf_fusion"] = f"""
    WITH bm AS (
      {_OR2["q118_bm25"]}
    ), lex AS (
      SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC)
               AS r_lex
      FROM bm
      QUALIFY r_lex <= {_RRF_TOP}
    ), qv AS (
      SELECT embedding AS q FROM embeddings WHERE vec_id = 0
    ), sem AS (
      SELECT vec_id AS doc_id,
             row_number() OVER (
               ORDER BY {_sql_cos_rrf("q", "embedding")} DESC,
                        vec_id ASC) AS r_sem
      FROM embeddings, qv
      WHERE vec_id != 0
      QUALIFY r_sem <= {_RRF_TOP}
    ), fused AS (
      SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
             coalesce(1.0::DOUBLE / (60 + r_lex), 0)
               + coalesce(1.0::DOUBLE / (60 + r_sem), 0) AS rrf
      FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    )
    SELECT doc_id,
           row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rank,
           round(rrf, 8) AS rrf
    FROM fused
    QUALIFY rank <= 20
"""


# --------------------------------------------------------------------------
# q327 — LOCAL CLUSTERING COEFFICIENT per node (the per-node refinement
# of q181's global statistic) on the supplier CO-SUPPLY graph: two
# suppliers are adjacent when they both shipped one of the SAMPLED
# parts (p_partkey % 17 == 0 — a deterministic sparsifier: the full
# co-supply graph at toy scale is 36% dense and triangle counting on a
# dense graph is Theta(n^3) for ANY algorithm). Edge generation is
# further bounded by blocking: each part contributes pairs among its 6
# lowest-keyed suppliers only (C(6,2) = 15 edges per part whatever the
# fan-in; ranking partitions BY part, never globally).
# Triangles enumerate once each from DEGREE-ORIENTED edges (every edge
# points low-(degree,id) -> high; the compact-forward bound caps wedge
# fan-out at sqrt(2m) instead of the raw degree — measured 16.2M ->
# ~1M wedges at sf0.1) and credit all three corners (explode);
# cc(v) = 2*T(v) / (d(v)*(d(v)-1)) — exact integers and one division.
# Oracle: identical algebra with MATERIALIZED CTEs (the multiply-
# referenced-CTE lesson from the round-4 oracle scale audit).
# --------------------------------------------------------------------------
_COSUPPLY_EDGES_SQL = """
      WITH ranked AS MATERIALIZED (
        SELECT l_partkey, l_suppkey FROM (
          SELECT l_partkey, l_suppkey,
                 row_number() OVER (PARTITION BY l_partkey
                                    ORDER BY l_suppkey) AS rk
          FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
                WHERE l_partkey % 17 = 0))
        WHERE rk <= 6
      )
      SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      FROM ranked a JOIN ranked b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
"""


@register(
    "q327_clustering_coefficient",
    oracle=f"""
    WITH e AS MATERIALIZED (
      {_COSUPPLY_EDGES_SQL}
    ), deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) GROUP BY node
    ), okey AS (
      SELECT node, d * 1000000000 + node AS k FROM deg
    ), oe AS MATERIALIZED (
      -- degree orientation (compact-forward): every edge points from
      -- the lower (degree, id) endpoint, so wedge enumeration is
      -- bounded by out-degrees <= sqrt(2m), not raw degrees
      SELECT CASE WHEN ku.k < kv.k THEN e.u ELSE e.v END AS a,
             CASE WHEN ku.k < kv.k THEN e.v ELSE e.u END AS b,
             CASE WHEN ku.k < kv.k THEN kv.k ELSE ku.k END AS bk
      FROM e JOIN okey ku ON ku.node = e.u JOIN okey kv ON kv.node = e.v
    ), tri AS (
      SELECT corner, COUNT(*) AS t FROM (
        SELECT unnest([e1.a, e1.b, e2.b]) AS corner
        FROM oe e1
        JOIN oe e2 ON e2.a = e1.a AND e1.bk < e2.bk
        JOIN oe e3 ON e3.a = e1.b AND e3.b = e2.b
      ) GROUP BY corner
    )
    SELECT deg.node AS suppkey,
           CAST(deg.d AS BIGINT) AS degree,
           CAST(COALESCE(tri.t, 0) AS BIGINT) AS n_triangles,
           round(2.0 * COALESCE(tri.t, 0) / (deg.d * (deg.d - 1)), 6)
             AS clustering_coeff
    FROM deg LEFT JOIN tri ON tri.corner = deg.node
    WHERE deg.d >= 2
    ORDER BY suppkey
    """,
)
def q327(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    ps = (li.filter(F.col("l_partkey") % 17 == 0)
          .select("l_partkey", "l_suppkey").distinct())
    wr = Window.partitionBy("l_partkey").orderBy("l_suppkey")
    a = (ps.withColumn("rk", F.row_number().over(wr))
         .filter(F.col("rk") <= 6).drop("rk"))
    b = a.select(F.col("l_partkey"), F.col("l_suppkey").alias("s2"))
    e = (
        a.join(b, "l_partkey")
        .filter(F.col("l_suppkey") < F.col("s2"))
        .select(F.col("l_suppkey").alias("u"), F.col("s2").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)  # e is joined three ways below
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node").agg(F.count("*").alias("d"))
    )
    okey = deg.select(
        "node", (F.col("d") * 1000000000 + F.col("node")).alias("k"))
    ku = okey.select(F.col("node").alias("u"), F.col("k").alias("ku"))
    kv = okey.select(F.col("node").alias("v"), F.col("k").alias("kv"))
    # degree orientation (compact-forward): wedges enumerate from the
    # low-(degree,id) endpoint only — out-degrees bounded by sqrt(2m)
    oe = (
        e.join(ku, "u").join(kv, "v")
        .select(
            F.when(F.col("ku") < F.col("kv"), F.col("u"))
            .otherwise(F.col("v")).alias("a"),
            F.when(F.col("ku") < F.col("kv"), F.col("v"))
            .otherwise(F.col("u")).alias("b"),
            F.greatest("ku", "kv").alias("bk"))
        .localCheckpoint(eager=False)
    )
    e1 = oe.select(F.col("a"), F.col("b").alias("x"),
                   F.col("bk").alias("xk"))
    e2 = oe.select(F.col("a"), F.col("b").alias("y"),
                   F.col("bk").alias("yk"))
    e3 = oe.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tri = (
        e1.join(e2, "a").filter(F.col("xk") < F.col("yk"))
        .join(e3, ["x", "y"])
        .select(F.explode(F.array("a", "x", "y")).alias("corner"))
        .groupBy("corner").agg(F.count("*").alias("t"))
    )
    return (
        deg.join(tri, deg.node == tri.corner, "left")
        .filter(F.col("d") >= 2)
        .select(
            F.col("node").cast("bigint").alias("suppkey"),
            F.col("d").cast("bigint").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("bigint")
            .alias("n_triangles"),
            F.round(2.0 * F.coalesce(F.col("t"), F.lit(0))
                    / (F.col("d") * (F.col("d") - 1)), 6)
            .alias("clustering_coeff"))
        .orderBy("suppkey")
    )


# --------------------------------------------------------------------------
# q335 — WEIGHTED SHORTEST PATH (distributed Bellman-Ford): cheapest
# trade route from the lowest-keyed supplier nation (self-determined —
# tiny scale factors have sparse nation coverage) over the directed
# nation graph, edge weight = the MINIMUM lineitem cents ever shipped
# on that lane (a shrinking agg; the relaxation loop then runs on the
# aggregated edge table). Each round relaxes every edge once — one
# equi-join + a min-aggregation — and a bounded changed-count scalar
# drives the fixpoint (the q53-component loop discipline; rounds =
# graph diameter, here 2-3). The oracle unrolls 10 dynamic-programming
# rounds as chained CTEs (d_{k+1} = min(d_k, d_k + w)) — enough for
# any 25-node diameter and an independent mechanism from the engine's
# adaptive fixpoint.
# --------------------------------------------------------------------------
_BF_ROUNDS = 10


def _bf_oracle() -> str:
    head = f"""WITH e AS MATERIALIZED (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
             MIN(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey != c.c_nationkey
      GROUP BY 1, 2
    ), d0 AS (SELECT CAST(MIN(src) AS BIGINT) AS node,
                      CAST(0 AS BIGINT) AS cost FROM e)"""
    parts = [head]
    for k in range(_BF_ROUNDS):
        parts.append(f""", d{k + 1} AS (
          SELECT node, MIN(cost) AS cost FROM (
            SELECT node, cost FROM d{k}
            UNION ALL
            SELECT e.dst AS node, d{k}.cost + e.w AS cost
            FROM d{k} JOIN e ON e.src = d{k}.node
          ) GROUP BY node
        )""")
    return ("".join(parts)
            + f" SELECT CAST(node AS BIGINT) AS node, cost"
              f" FROM d{_BF_ROUNDS} ORDER BY node")


@register("q335_cheapest_route", oracle=_bf_oracle())
def q335(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    e = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(F.col("s_nationkey").alias("src"),
                 F.col("c_nationkey").alias("dst"))
        .agg(F.min(F.floor(F.col("l_extendedprice") * 100)
                   .cast("bigint")).alias("w"))
        .localCheckpoint()
    )
    # The aggregated lane table is VALUE-DOMAIN bounded (<= 25x24 nation
    # pairs however large the fact tables), so the relaxation runs on a
    # collected copy — the standard tiny-statistic discipline — instead
    # of the former distributed fixpoint loop whose per-round
    # join+checkpoint+changed-count cost ~3 jobs x diameter for a
    # 625-row graph. The distributed work (the shrinking min-agg over
    # lineitem) is unchanged; the fixpoint (exact integer Bellman-Ford)
    # is identical.
    lanes = [(int(r.src), int(r.dst), int(r.w)) for r in e.collect()]
    src0 = min(s for s, _, _ in lanes)
    dist = {src0: 0}
    changed = True
    while changed:
        changed = False
        for s, t, w in lanes:
            if s in dist:
                nc = dist[s] + w
                if nc < dist.get(t, nc + 1):
                    dist[t] = nc
                    changed = True
    return spark.createDataFrame(
        spark.sparkContext.parallelize(
            sorted((int(n), int(c)) for n, c in dist.items()), 1),
        "node bigint, cost bigint").orderBy("node")


# --------------------------------------------------------------------------
# q337 — DEGREE ASSORTATIVITY (Newman 2002): does the co-supply graph
# wire hubs to hubs (r > 0) or hubs to leaves (r < 0)? r = Pearson
# correlation of endpoint degrees over the edge STUBS (each undirected
# edge contributes both orientations, so sum(x) = sum(y) and one pass
# suffices). Reuses q327's deterministically blocked edge set; degrees
# come from one shrinking agg joined back twice; every distributed sum
# is integer/DECIMAL(38,0) and r is a fixed-order scalar, rounded 6.
# --------------------------------------------------------------------------
@register(
    "q337_assortativity",
    oracle=f"""
    WITH e AS MATERIALIZED (
      {_COSUPPLY_EDGES_SQL}
    ), deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) GROUP BY node
    ), stubs AS (
      SELECT du.d AS x, dv.d AS y
      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
      UNION ALL
      SELECT dv.d, du.d
      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
    ), s AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
               AS sxy,
             SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
               AS sxx
      FROM stubs
    )
    SELECT CAST(n // 2 AS BIGINT) AS n_edges,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0),
                 6) AS assortativity
    FROM s
    """,
)
def q337(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    ps = (li.filter(F.col("l_partkey") % 17 == 0)
          .select("l_partkey", "l_suppkey").distinct())
    wr = Window.partitionBy("l_partkey").orderBy("l_suppkey")
    a = (ps.withColumn("rk", F.row_number().over(wr))
         .filter(F.col("rk") <= 6).drop("rk"))
    b = a.select(F.col("l_partkey"), F.col("l_suppkey").alias("s2"))
    e = (
        a.join(b, "l_partkey")
        .filter(F.col("l_suppkey") < F.col("s2"))
        .select(F.col("l_suppkey").alias("u"), F.col("s2").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node").agg(F.count("*").alias("d"))
        .localCheckpoint(eager=False)  # joined as both du and dv
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("xu"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("xv"))
    ej = e.join(du, "u").join(dv, "v").localCheckpoint(
        eager=False)  # both stub directions read it
    stubs = (ej.select(F.col("xu").alias("x"), F.col("xv").alias("y"))
             .unionAll(ej.select(F.col("xv").alias("x"),
                                 F.col("xu").alias("y"))))
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    s = stubs.agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(d19("x") * d19("y")).alias("sxy"),
        F.sum(d19("x") * d19("x")).alias("sxx"))
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    den = nd * F.col("sxx").cast("double") - sx * sx
    return s.select(
        (F.col("n") / 2).cast("bigint").alias("n_edges"),
        # a regular graph (all degrees equal) has zero degree variance:
        # assortativity is undefined -> NULL on both engines
        F.round((nd * F.col("sxy").cast("double") - sx * sx)
                / F.when(den != 0, den), 6).alias("assortativity"))


# --------------------------------------------------------------------------
# q342 — DETERMINISTIC RANDOM WALKS (the node2vec/DeepWalk corpus
# generator): one 4-step walk from every node of the directed trade
# graph, where step t from node u picks neighbor index
# md5(u:start:t) % outdeg(u) — seeded pseudo-randomness, so the walk
# corpus is reproducible and an external engine replays it exactly.
# Neighbors are indexed once by a window partitioned BY source node
# (rank over the bounded out-edge list); each step is then ONE
# equi-join on (node, index) — walks over a 100 TB edge table cost 4
# joins, not a per-walk loop. Dead ends absorb (the walk stays).
# --------------------------------------------------------------------------
_WALK_STEPS = 4


def _walk_oracle() -> str:
    from ..functions.hashing import md5_int64_sql

    head = """WITH e AS MATERIALIZED (
      SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey != c.c_nationkey
    ), nbr AS (
      SELECT src, dst,
             row_number() OVER (PARTITION BY src ORDER BY dst) - 1
               AS idx,
             COUNT(*) OVER (PARTITION BY src) AS deg
      FROM e
    ), w0 AS (
      SELECT DISTINCT src AS start, src AS cur FROM e
    )"""
    parts = [head]
    for t in range(1, _WALK_STEPS + 1):
        h = md5_int64_sql(
            "CAST(w.cur AS VARCHAR) || ':' || CAST(w.start AS VARCHAR)"
            f" || ':{t}'")
        parts.append(f""", w{t} AS (
          SELECT w.start, COALESCE(n.dst, w.cur) AS cur
          FROM w{t - 1} w LEFT JOIN nbr n
            ON n.src = w.cur AND n.idx = ({h}) % n.deg
        )""")
    sel = ", ".join(f"CAST(w{t}.cur AS BIGINT) AS n{t}"
                    for t in range(1, _WALK_STEPS + 1))
    joins = " ".join(
        f"JOIN w{t} ON w{t}.start = w0.start"
        for t in range(1, _WALK_STEPS + 1))
    return (("".join(parts))
            + f" SELECT CAST(w0.start AS BIGINT) AS start, {sel}"
              f" FROM w0 {joins} ORDER BY start")


@register("q342_random_walks", oracle=_walk_oracle())
def q342(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.hashing import md5_int64

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    e = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(F.col("s_nationkey").alias("src"),
                F.col("c_nationkey").alias("dst"))
        .distinct().localCheckpoint()
    )
    wn = Window.partitionBy("src").orderBy("dst")
    nbr = e.select(
        "src", "dst",
        (F.row_number().over(wn) - 1).alias("idx"),
        F.count("*").over(Window.partitionBy("src")).alias("deg"))
    nbr = nbr.localCheckpoint(eager=False)  # one index read per step
    walk = e.select(F.col("src").alias("start")).distinct().select(
        "start", F.col("start").alias("cur"))
    outs = []
    for t in range(1, _WALK_STEPS + 1):
        h = md5_int64(F.concat(
            F.col("cur").cast("string"), F.lit(":"),
            F.col("start").cast("string"), F.lit(f":{t}")))
        step = (
            walk.join(nbr, (nbr.src == walk.cur)
                      & (nbr.idx == h % nbr.deg), "left")
            .select("start", F.coalesce("dst", "cur").alias("cur"))
            # referenced by the output column AND the next step — the
            # checkpoint keeps each hop's join from re-executing per
            # later step
            .localCheckpoint(eager=False)
        )
        walk = step
        outs.append(step.select("start",
                                F.col("cur").cast("bigint")
                                .alias(f"n{t}")))
    out = outs[0]
    for t, o in enumerate(outs[1:], start=2):
        out = out.join(o, "start")
    return out.select(F.col("start").cast("bigint").alias("start"),
                      *[f"n{t}" for t in range(1, _WALK_STEPS + 1)]
                      ).orderBy("start")


# --------------------------------------------------------------------------
# q343 — ADAMIC-ADAR LINK PREDICTION (the classic common-neighbor
# index, 2003): for non-adjacent supplier pairs, score = sum over
# common neighbors z of 1/ln(deg(z)). Candidate pairs enumerate from
# WEDGES (two edges sharing z — linear in Sum deg^2 on the sparsified
# q327 graph, never nodes x nodes); existing edges drop by anti-join;
# each wedge contributes its center's exact 1/ln(deg) term and the
# per-pair sum rounds 6 (ulp-order differences only). Top-20 by
# (score, pair) with a full tie-break.
# --------------------------------------------------------------------------
@register(
    "q343_adamic_adar",
    oracle=f"""
    WITH e AS MATERIALIZED (
      {_COSUPPLY_EDGES_SQL}
    ), sym AS (
      SELECT u, v FROM e UNION ALL SELECT v, u FROM e
    ), deg AS (
      SELECT u AS node, COUNT(*) AS d FROM sym GROUP BY u
    ), wedge AS (
      SELECT a.u AS x, b.u AS y, a.v AS z
      FROM sym a JOIN sym b ON a.v = b.v AND a.u < b.u
    ), cand AS (
      SELECT w.x, w.y, SUM(1.0 / ln(d.d)) AS aa, COUNT(*) AS n_common
      FROM wedge w JOIN deg d ON d.node = w.z
      WHERE d.d >= 2
        AND NOT EXISTS (SELECT 1 FROM e
                        WHERE e.u = w.x AND e.v = w.y)
      GROUP BY w.x, w.y
    )
    SELECT CAST(x AS BIGINT) AS supp_a, CAST(y AS BIGINT) AS supp_b,
           CAST(n_common AS BIGINT) AS n_common,
           round(aa, 6) AS adamic_adar
    FROM cand ORDER BY aa DESC, x ASC, y ASC LIMIT 20
    """,
)
def q343(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    ps = (li.filter(F.col("l_partkey") % 17 == 0)
          .select("l_partkey", "l_suppkey").distinct())
    wr = Window.partitionBy("l_partkey").orderBy("l_suppkey")
    a = (ps.withColumn("rk", F.row_number().over(wr))
         .filter(F.col("rk") <= 6).drop("rk"))
    b = a.select(F.col("l_partkey"), F.col("l_suppkey").alias("s2"))
    e = (
        a.join(b, "l_partkey")
        .filter(F.col("l_suppkey") < F.col("s2"))
        .select(F.col("l_suppkey").alias("u"), F.col("s2").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sym = e.unionAll(e.select(F.col("v").alias("u"),
                              F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("d"))
    w1 = sym.select(F.col("u").alias("x"), F.col("v").alias("z"))
    w2 = sym.select(F.col("u").alias("y"), F.col("v").alias("z"))
    wedge = w1.join(w2, "z").filter(F.col("x") < F.col("y"))
    cand = (
        wedge.join(deg.filter(F.col("d") >= 2),
                   wedge.z == F.col("node"))
        .join(e.select(F.col("u").alias("x"), F.col("v").alias("y"),
                       F.lit(1).alias("_e")), ["x", "y"], "left_anti")
        .groupBy("x", "y")
        .agg(F.sum(F.lit(1.0) / F.log(F.col("d").cast("double")))
             .alias("aa"),
             F.count("*").alias("n_common"))
    )
    return (
        cand.orderBy(F.col("aa").desc(), F.col("x").asc(),
                     F.col("y").asc()).limit(20)
        .select(F.col("x").cast("bigint").alias("supp_a"),
                F.col("y").cast("bigint").alias("supp_b"),
                F.col("n_common").cast("bigint").alias("n_common"),
                F.round("aa", 6).alias("adamic_adar"))
    )


# --------------------------------------------------------------------------
# q392 — K-CORE DECOMPOSITION (k=3) by iterative peeling on a SPARSE
# co-supply graph (rk<=2 per part, part sample mod 7 — the q327 graph
# is 7-regular-ish and never peels; this one sheds its tree fringe in
# 1-3 rounds at every tested SF). The Spark side peels to FIXPOINT:
# each round is one degree agg + one broadcast anti-join on the weak
# set; the loop's only driver-side value is a 1-row emptiness probe
# (the bounded-argmax loop pattern, SCALING.md §5), and the edge set is
# localCheckpoint'd per round to cut lineage growth. The oracle unrolls
# 10 peel rounds as chained CTEs — 3x the observed convergence at
# sf0.1, and a converged peel is idempotent so extra rounds are no-ops.
# Output: every k-core member with its WITHIN-CORE degree.
# --------------------------------------------------------------------------
_SPARSE_EDGES_SQL = """
      WITH ranked2 AS MATERIALIZED (
        SELECT l_partkey, l_suppkey FROM (
          SELECT l_partkey, l_suppkey,
                 row_number() OVER (PARTITION BY l_partkey
                                    ORDER BY l_suppkey) AS rk
          FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
                WHERE l_partkey % 7 = 0))
        WHERE rk <= 2
      )
      SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      FROM ranked2 a JOIN ranked2 b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
"""

_KCORE_K = 3
_KCORE_ROUNDS = 10


def _kcore_oracle() -> str:
    parts = [f"WITH se AS MATERIALIZED (\n{_SPARSE_EDGES_SQL}\n)",
             "e0 AS MATERIALIZED (SELECT u, v FROM se)"]
    for r in range(_KCORE_ROUNDS):
        parts.append(f"""
    d{r} AS MATERIALIZED (SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM e{r}
        UNION ALL SELECT v AS node FROM e{r}) GROUP BY node),
    w{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE d < {_KCORE_K}),
    e{r + 1} AS MATERIALIZED (SELECT u, v FROM e{r}
        WHERE u NOT IN (SELECT node FROM w{r})
          AND v NOT IN (SELECT node FROM w{r}))""")
    final = _KCORE_ROUNDS
    return (",\n".join(parts) + f""",
    dfin AS (SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM e{final}
        UNION ALL SELECT v AS node FROM e{final}) GROUP BY node)
    SELECT CAST(node AS BIGINT) AS suppkey,
           CAST(d AS BIGINT) AS core_degree
    FROM dfin WHERE d >= {_KCORE_K} ORDER BY suppkey""")


def _sparse_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    ps = (li.filter(F.col("l_partkey") % 7 == 0)
          .select("l_partkey", "l_suppkey").distinct())
    wr = Window.partitionBy("l_partkey").orderBy("l_suppkey")
    a = (ps.withColumn("rk", F.row_number().over(wr))
         .filter(F.col("rk") <= 2).drop("rk"))
    b = a.select("l_partkey", F.col("l_suppkey").alias("s2"))
    return (a.join(b, "l_partkey")
            .filter(F.col("l_suppkey") < F.col("s2"))
            .select(F.col("l_suppkey").alias("u"),
                    F.col("s2").alias("v"))
            .distinct())


@register("q392_kcore", oracle=_kcore_oracle())
def q392(spark: SparkSession, sf_dir: str) -> DataFrame:
    alive = _sparse_edges(spark, sf_dir).localCheckpoint(eager=False)
    for _ in range(64):  # safety bound far above any observed peel
        deg = (alive.select(F.col("u").alias("node"))
               .unionAll(alive.select(F.col("v").alias("node")))
               .groupBy("node").agg(F.count("*").alias("d")))
        # checkpoint the weak set so the emptiness probe and BOTH
        # broadcast builds share ONE degree aggregation per round (the
        # probe formerly recomputed it, then each broadcast recomputed
        # it again — the O16 rule: the duplicated subtree is a full
        # agg over the edge set)
        weak = (deg.filter(F.col("d") < _KCORE_K).select("node")
                .localCheckpoint(eager=False))
        if not weak.count():  # bounded: 1-row result per node < k
            break
        # the weak set shrinks monotonically — broadcast anti-joins
        alive = (alive
                 .join(F.broadcast(weak.withColumnRenamed("node", "u")),
                       "u", "left_anti")
                 .join(F.broadcast(weak.withColumnRenamed("node", "v")),
                       "v", "left_anti")
                 .localCheckpoint(eager=False))
    deg = (alive.select(F.col("u").alias("node"))
           .unionAll(alive.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").alias("d")))
    return (deg.filter(F.col("d") >= _KCORE_K)
            .select(F.col("node").cast("bigint").alias("suppkey"),
                    F.col("d").cast("bigint").alias("core_degree"))
            .orderBy("suppkey"))


# --------------------------------------------------------------------------
# q393 — LABEL PROPAGATION COMMUNITIES (Raghavan 2007), synchronous and
# fully deterministic: labels start as node ids; each of 4 fixed rounds
# every node adopts its neighbors' PLURALITY label (ties -> smallest
# label; isolated nodes cannot occur — all nodes come from edges).
# Synchronous updates + a total tie order make LPA reproducible (the
# async coin-flip variant is not), so the oracle replays the identical
# 4 rounds as chained CTEs and must agree on every final label. One
# shuffle per round (neighbor-label hash agg) — the scale shape of
# every bulk-synchronous graph step in this tree (q335 Bellman-Ford,
# q320 frontier closure).
# --------------------------------------------------------------------------
_LPA_ROUNDS = 4


def _lpa_oracle() -> str:
    parts = [f"WITH se AS MATERIALIZED (\n{_SPARSE_EDGES_SQL}\n)",
             """nbr AS MATERIALIZED (
        SELECT u AS node, v AS nb FROM se
        UNION ALL SELECT v AS node, u AS nb FROM se)""",
             """l0 AS MATERIALIZED (SELECT DISTINCT node, node AS lbl FROM nbr)"""]
    for r in range(_LPA_ROUNDS):
        parts.append(f"""
    c{r} AS MATERIALIZED (SELECT nbr.node, l{r}.lbl, COUNT(*) AS c
        FROM nbr JOIN l{r} ON l{r}.node = nbr.nb
        GROUP BY nbr.node, l{r}.lbl),
    l{r + 1} AS MATERIALIZED (SELECT node, lbl FROM (
        SELECT node, lbl, row_number() OVER (PARTITION BY node
            ORDER BY c DESC, lbl ASC) AS rn FROM c{r}) WHERE rn = 1)""")
    return (",\n".join(parts) + f"""
    SELECT CAST(node AS BIGINT) AS suppkey,
           CAST(lbl AS BIGINT) AS community
    FROM l{_LPA_ROUNDS} ORDER BY suppkey""")


@register("q393_label_propagation", oracle=_lpa_oracle())
def q393(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _sparse_edges(spark, sf_dir)
    nbr = (e.select(F.col("u").alias("node"), F.col("v").alias("nb"))
           .unionAll(e.select(F.col("v").alias("node"),
                              F.col("u").alias("nb")))
           .localCheckpoint(eager=False))
    labels = nbr.select("node").distinct().select(
        "node", F.col("node").alias("lbl"))
    for _ in range(_LPA_ROUNDS):
        counts = (nbr.join(labels.withColumnRenamed("node", "nb"), "nb")
                  .groupBy("node", "lbl").agg(F.count("*").alias("c")))
        # plurality label = max count, tie -> smallest label: ONE
        # hash aggregation (map-side partials, no sort) replaces the
        # former row_number window — max(struct(c, -lbl)) picks the
        # identical row because c and lbl are exact integers
        labels = (counts.groupBy("node")
                  .agg(F.max(F.struct(
                      F.col("c"), (-F.col("lbl")).alias("nl"))).alias("t"))
                  .select("node", (-F.col("t.nl")).alias("lbl"))
                  .localCheckpoint(eager=False))
    return labels.select(
        F.col("node").cast("bigint").alias("suppkey"),
        F.col("lbl").cast("bigint").alias("community")).orderBy("suppkey")

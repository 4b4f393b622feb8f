"""Training-data curation harness queries, wave 2: dedup cluster
resolution, deterministic sampling, TF-IDF, normalization dedup.

These extend the reference's surface with the operators a 100 TB
LLM-corpus pipeline needs (the brief's first-class extensions); every
oracle re-derives the identical md5-based determinism so DuckDB replays
the exact selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dedup as D
from ..functions import sampling as S
from ..functions import text as T
from ..functions.hashing import md5_int64_sql
from . import ORACLES, load, register

# --------------------------------------------------------------------------
# q53 — near-dup cluster resolution: connected components over LSH pairs
# --------------------------------------------------------------------------
# The oracle replays the full pipeline: q29's LSH candidate pairs as the
# edge set, then reachability via recursive CTE; component = min reachable
# doc_id, exactly the fixpoint of min-label propagation.
_Q29_SQL = ORACLES["q29_minhash_lsh_pairs"]

# component-family oracles run reachability over STAR edges (same
# components, linear edge count) — see textstats.STAR_EDGES_SQL
from .textstats import COMPONENT_CTES_SQL, STAR_EDGES_SQL  # noqa: E402
_COMP_SQL = COMPONENT_CTES_SQL.format(star_edges=STAR_EDGES_SQL)


@register(
    "q53_dedup_components",
    oracle=f"""
    WITH RECURSIVE {_COMP_SQL}
    SELECT doc_id, component FROM comp
    """,
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    # star-contracted bucket edges: same components as the full pair
    # graph (the oracle's edge set), linearly fewer edges — see
    # functions/dedup.py::lsh_star_edges
    sigs = D.minhash_signatures(load(spark, sf_dir, "documents"))
    return D.connected_components(D.lsh_star_edges(sigs))


# --------------------------------------------------------------------------
# q54 — domain-capped sampling (anti-domination): keep k docs per source
# --------------------------------------------------------------------------
@register(
    "q54_domain_cap_sample",
    oracle="""
    SELECT doc_id, source, rk FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= 3
    """,
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.domain_capped_sample(
        load(spark, sf_dir, "documents"), key="source", k=3
    )


# --------------------------------------------------------------------------
# q55 — hash-stratified Bernoulli sampling (per-language rates, map-only)
# --------------------------------------------------------------------------
@register(
    "q55_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, bucket FROM (
      SELECT doc_id, lang, ({md5_int64_sql('text')}) % 100 AS bucket
      FROM documents
    ) WHERE bucket < (CASE WHEN lang = 'en' THEN 50 ELSE 20 END)
    """,
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.hash_stratified_sample(
        load(spark, sf_dir, "documents"),
        strata_col="lang", rates={"en": 50}, default_rate=20,
    )


# --------------------------------------------------------------------------
# q56 — per-document top-3 terms by TF-IDF
# --------------------------------------------------------------------------
@register(
    "q56_tfidf_topterms",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x != '')) AS word
      FROM documents
    ), tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY doc_id, word
    ), dfreq AS (
      SELECT word, COUNT(DISTINCT doc_id) AS dfreq FROM w GROUP BY word
    ), n AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.word, tf.tf,
             round(tf.tf * ln(n.n_docs / dfreq.dfreq), 4) AS score
      FROM tf JOIN dfreq USING (word) CROSS JOIN n
    )
    SELECT doc_id, word, tf, score, rk FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score DESC, word
      ) AS rk FROM scored
    ) WHERE rk <= 3
    """,
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.tfidf_top_terms(load(spark, sf_dir, "documents"), top_k=3)


# --------------------------------------------------------------------------
# q57 — normalization dedup (case/punct/whitespace-invariant digests)
# --------------------------------------------------------------------------
@register(
    "q57_normalized_dedup",
    oracle="""
    SELECT md5(trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
             ' +', ' ', 'g'))) AS digest,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS dup_count
    FROM documents GROUP BY 1
    """,
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.normalized_dedup(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q58 — streaming exact dedup (stateful dropDuplicates, availableNow drain)
# --------------------------------------------------------------------------
@register(
    "q58_stream_dedup",
    oracle="SELECT DISTINCT md5(text) AS digest FROM documents",
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import run_stream_dedup_once

    return run_stream_dedup_once(spark, f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# q59 — as-of join: each view event gets the most recent prior click by
# the same user. Oracle = DuckDB's native ASOF JOIN; the Spark side is
# the sort-merge union formulation (operators/asof.py).
# --------------------------------------------------------------------------
@register(
    "q59_asof_join",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'view'
    ), y AS (
      SELECT user_id, ts, MAX(value) AS y_value
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    )
    SELECT x.user_id, x.ts, x.value,
           y.ts AS ts_r, y.y_value AS y_value_r
    FROM x ASOF LEFT JOIN y
      ON x.user_id = y.user_id AND x.ts >= y.ts
    """,
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    x = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    y = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("y_value"))
    )
    return asof_join(x, y, keys=["user_id"], ts_col="ts")


# --------------------------------------------------------------------------
# q60 — custom stateful streaming sessionization (applyInPandasWithState):
# emits every CLOSED session; each user's final session stays in state.
# Oracle = batch gap-sessions minus each user's last session.
# --------------------------------------------------------------------------
@register(
    "q60_stream_state_sessions",
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
    ), agg AS (
      SELECT user_id, sid,
             epoch(MIN(ts)) AS session_start,
             epoch(MAX(ts)) - epoch(MIN(ts)) AS duration_sec,
             COUNT(*) AS n_events
      FROM sess GROUP BY user_id, sid
    )
    SELECT user_id, session_start, duration_sec, n_events FROM agg
    WHERE sid < (SELECT MAX(sid) FROM agg a2 WHERE a2.user_id = agg.user_id)
    """,
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import run_sessionize_with_state_once

    return run_sessionize_with_state_once(spark, f"{sf_dir}/events.parquet")


# --------------------------------------------------------------------------
# q61 — nearest-centroid assignment (cosine) against per-label centroids:
# the cluster-routing / mixture-balancing op over the embeddings table.
# --------------------------------------------------------------------------
@register(
    "q61_centroid_assign",
    oracle="""
    WITH ex AS (
      SELECT label, vec_id, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ), c AS (
      SELECT label AS clabel, pos, AVG(v) AS cv FROM ex GROUP BY 1, 2
    ), cent AS (
      SELECT clabel, list(cv ORDER BY pos) AS centroid FROM c GROUP BY 1
    ), scored AS (
      SELECT e.vec_id, e.label, cent.clabel,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), centroid)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(centroid, centroid))) AS cos
      FROM embeddings e CROSS JOIN cent
    )
    SELECT vec_id, label, clabel AS assigned, round(cos, 6) AS sim FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY cos DESC, clabel
      ) AS rk FROM scored
    ) WHERE rk = 1
    """,
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import similarity as SIM

    return SIM.centroid_assign(load(spark, sf_dir, "embeddings"))


# --------------------------------------------------------------------------
# q62 — dedup keep-best: resolve near-dup clusters (q53 components) and
# keep one survivor per cluster — the longest doc, ties to min doc_id —
# the full curation pipeline composed end-to-end.
# --------------------------------------------------------------------------
@register(
    "q62_dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_COMP_SQL}, full_comp AS (
      -- singletons (no near-dup edge) are their own component
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
             d.n_chars
      FROM documents d LEFT JOIN comp c USING (doc_id)
    )
    SELECT component, doc_id AS keep_doc_id, n_chars AS keep_n_chars,
           n_members FROM (
      SELECT *, COUNT(*) OVER (PARTITION BY component) AS n_members,
             ROW_NUMBER() OVER (
               PARTITION BY component ORDER BY n_chars DESC, doc_id
             ) AS rk
      FROM full_comp
    ) WHERE rk = 1
    """,
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs)
    comp = D.connected_components(D.lsh_star_edges(sigs))
    full = docs.select("doc_id", "n_chars").join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("component"),
        "n_chars",
    )
    w = Window.partitionBy("component")
    wr = w.orderBy(F.desc("n_chars"), F.col("doc_id"))
    return (
        full.withColumn("n_members", F.count("*").over(w))
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "component", F.col("doc_id").alias("keep_doc_id"),
            F.col("n_chars").alias("keep_n_chars"), "n_members",
        )
    )


# --------------------------------------------------------------------------
# q63 — global-statistic quality filter: keep docs longer than the corpus
# median. The global scalar is a 1-row broadcast (no driver round-trip,
# no second scan barrier in the plan — Catalyst reuses the subquery).
# --------------------------------------------------------------------------
@register(
    "q63_quality_filter",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE n_chars > (SELECT quantile_cont(n_chars, 0.5) FROM documents)
    """,
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    med = docs.agg(
        F.percentile(F.col("n_chars"), F.lit(0.5)).alias("med")
    )
    return (
        docs.crossJoin(F.broadcast(med))
        .filter(F.col("n_chars") > F.col("med"))
        .select("doc_id", "lang", "n_chars")
    )


# --------------------------------------------------------------------------
# q64 — streaming near-dup filter: MinHash-band state store drops any doc
# whose band collides with an earlier doc. Survivor set after an
# availableNow drain == docs that are MIN(doc_id) in ALL their buckets.
# --------------------------------------------------------------------------
from .textcommon import SQL_WORDSET, _sql_word_hash  # noqa: E402
from .textstats import _bands_union, _mh_cols  # noqa: E402


@register(
    "q64_stream_neardup_filter",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest({SQL_WORDSET}) AS word FROM documents
    ), h AS (
      SELECT doc_id, {_sql_word_hash()} AS hw FROM w
    ), sigs AS (
      SELECT doc_id,
             {_mh_cols}
      FROM h GROUP BY doc_id
    ), banded AS (
      {_bands_union}
    ), mins AS (
      SELECT band_id, key, MIN(doc_id) AS m FROM banded GROUP BY 1, 2
    )
    SELECT b.doc_id FROM banded b JOIN mins USING (band_id, key)
    GROUP BY b.doc_id HAVING BOOL_AND(b.doc_id = m)
    """,
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.neardup import run_stream_neardup_filter_once

    return run_stream_neardup_filter_once(spark, f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# q65 — multimodal perceptual hash (aHash) over the stub-decoded image:
# the one decode-family kernel whose deterministic fake (md5 bytes as a
# 4x4 grid) an external oracle CAN replay — full value parity, unlike
# the rows-only q50/q51.
# --------------------------------------------------------------------------
_AHASH_BYTES = [
    f"CAST(('0x' || substr(md5(text), {2 * i + 1}, 2)) AS BIGINT)"
    for i in range(16)
]
_AHASH_BITS = " + ".join(
    f"(CASE WHEN {t} > m THEN {1 << i} ELSE 0 END)"
    for i, t in enumerate(_AHASH_BYTES)
)


@register(
    "q65_multimodal_ahash",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text,
             ({" + ".join(_AHASH_BYTES)}) / 16.0 AS m
      FROM documents
    )
    SELECT doc_id, CAST({_AHASH_BITS} AS BIGINT) AS ahash FROM b
    """,
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import image_ahash

    return image_ahash(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q66 — 3-word-shingle Jaccard near-dup pairs (passage-copy detection;
# unigram q27 catches topical overlap, shingles catch copied text runs).
# --------------------------------------------------------------------------
@register(
    "q66_shingle_jaccard",
    oracle="""
    WITH w AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x != '') AS ws
      FROM documents
    ), base AS (
      SELECT doc_id, source,
             list_distinct(CASE WHEN len(ws) >= 3 THEN
               list_transform(generate_series(1, len(ws) - 2),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
             ELSE CAST([] AS VARCHAR[]) END) AS ss
      FROM w
    )
    , sizes AS (
      SELECT doc_id, len(ss) AS n FROM base WHERE len(ss) > 0
    ), ex AS (
      SELECT doc_id, source, unnest(ss) AS s FROM base
    ), common AS (
      -- equi-join on shingle instead of all-pairs list_intersect
      -- (zero overlap cannot reach 0.5 -> identical result set)
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS c
      FROM ex a JOIN ex b
        ON a.s = b.s AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id_a, doc_id_b,
           round(c / (sa.n + sb.n - c), 6) AS jaccard
    FROM common
    JOIN sizes sa ON common.doc_id_a = sa.doc_id
    JOIN sizes sb ON common.doc_id_b = sb.doc_id
    WHERE c / (sa.n + sb.n - c) >= 0.5
    """,
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"), threshold=0.5,
        block_cols=("source",), shingle_n=3,
    )


# --------------------------------------------------------------------------
# q73/q74 — cross-document boilerplate: repeated 3-shingles per source, and
# the per-doc boilerplate fraction (C4/RefinedWeb-style cleaning signals).
# --------------------------------------------------------------------------
_SQL_SHINGLES = """
    WITH w AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x != '') AS ws
      FROM documents
    ), shingled AS (
      SELECT doc_id, source,
             list_distinct(CASE WHEN len(ws) >= 3 THEN
               list_transform(generate_series(1, len(ws) - 2),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
             ELSE CAST([] AS VARCHAR[]) END) AS ss
      FROM w
    ), ex AS (
      SELECT doc_id, source AS block, unnest(ss) AS shingle FROM shingled
    )
"""


@register(
    "q73_boilerplate_shingles",
    oracle=f"""
    {_SQL_SHINGLES}
    SELECT block, shingle, COUNT(*) AS doc_count
    FROM ex GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """,
)
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.boilerplate_shingles(load(spark, sf_dir, "documents"), min_docs=2)


@register(
    "q74_boilerplate_rate",
    oracle=f"""
    {_SQL_SHINGLES}
    , bp AS (
      SELECT block, shingle FROM ex GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT e.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN bp.shingle IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boiler,
           round(CAST(SUM(CASE WHEN bp.shingle IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS boiler_rate
    FROM ex e
    LEFT JOIN bp ON e.block = bp.block AND e.shingle = bp.shingle
    GROUP BY 1
    """,
)
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.boilerplate_rate(load(spark, sf_dir, "documents"), min_docs=2)


# --------------------------------------------------------------------------
# q75 — benchmark decontamination: corpus docs sharing a 3-shingle with the
# held-out "eval" slice (doc_id % 97 == 0), GPT-3/Llama overlap recipe.
# --------------------------------------------------------------------------
@register(
    "q75_contamination",
    oracle=f"""
    {_SQL_SHINGLES}
    , bench AS (
      SELECT DISTINCT shingle FROM ex WHERE doc_id % 97 = 0
    )
    SELECT doc_id, COUNT(*) AS n_hits
    FROM ex JOIN bench USING (shingle)
    WHERE doc_id % 97 <> 0
    GROUP BY 1
    """,
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return D.contamination_hits(corpus, bench)


# --------------------------------------------------------------------------
# q79 — PII scrub (redaction counts + scrubbed digest). The synthetic
# tables carry no PII-shaped spans, so the text embeds a TPC-H-style
# phone and a 5-digit account number derived deterministically from
# c_custkey (identical integer arithmetic in both engines); c_name's
# zero-padded digit run adds a third redaction. The *scrub operator*
# under test is the general one from functions/text.py.
# --------------------------------------------------------------------------
_PII_TEXT_SQL = """
  SELECT c_custkey,
         c_name || ' call '
           || printf('%02d-%03d-%03d-%04d',
                     10 + c_custkey % 90,
                     100 + (c_custkey // 7) % 900,
                     100 + (c_custkey // 11) % 900,
                     1000 + (c_custkey // 13) % 9000)
           || ' acct '
           || CAST(10000 + (c_custkey * 982451653) % 90000 AS VARCHAR)
           AS text
  FROM customer
"""


@register(
    "q79_pii_scrub",
    oracle="""
    SELECT c_custkey,
           CAST(len(regexp_extract_all(text, '{ph}'))
                + len(regexp_extract_all(text, '{num}')) AS BIGINT)
             AS n_redactions,
           md5(regexp_replace(
                 regexp_replace(text, '{ph}', '[PHONE]', 'g'),
                 '{num}', '[NUM]', 'g')) AS scrub_md5
    FROM ({src})
    """.format(
        ph=r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}",
        num=r"[0-9]{5,}",
        src=_PII_TEXT_SQL,
    ),
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..functions.text import pii_scrub

    k = F.col("c_custkey")
    phone = F.format_string(
        "%02d-%03d-%03d-%04d",
        (k % 90 + 10).cast("int"),
        ((k / F.lit(7)).cast("long") % 900 + 100).cast("int"),
        ((k / F.lit(11)).cast("long") % 900 + 100).cast("int"),
        ((k / F.lit(13)).cast("long") % 9000 + 1000).cast("int"),
    )
    acct = (k * 982451653 % 90000 + 10000).cast("string")
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(
            F.col("c_name"), F.lit(" call "), phone, F.lit(" acct "), acct
        ).alias("text"),
    )
    return pii_scrub(cust).select(
        "c_custkey", "n_redactions", F.md5("scrubbed").alias("scrub_md5")
    )


# --------------------------------------------------------------------------
# q242 — k-ANONYMITY release gate (k = 5) on the (lang, source)
# quasi-identifier pair: groups meeting k pass through; smaller groups
# generalize source -> '*' and pass only if the generalized group
# itself meets k; the rest are suppressed. The Sweeney release
# discipline a public training-data card applies before publishing
# per-slice counts. Scale shape: two shrinking hash aggregations.
# --------------------------------------------------------------------------
_K_ANON = 5


@register(
    "q242_k_anonymity",
    oracle=f"""
    WITH g AS (
      SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2
    ), small AS (
      SELECT lang, SUM(n) AS n FROM g WHERE n < {_K_ANON} GROUP BY lang
    )
    SELECT lang, source, CAST(n AS BIGINT) AS n_docs
    FROM g WHERE n >= {_K_ANON}
    UNION ALL
    SELECT lang, '*' AS source, CAST(n AS BIGINT) AS n_docs
    FROM small WHERE n >= {_K_ANON}
    """,
)
def q242(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)  # keep + generalize both filter it
    )
    keep = g.filter(F.col("n") >= _K_ANON).select(
        "lang", "source", F.col("n").cast("bigint").alias("n_docs"))
    general = (
        g.filter(F.col("n") < _K_ANON)
        .groupBy("lang")
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n") >= _K_ANON)
        .select("lang", F.lit("*").alias("source"),
                F.col("n").cast("bigint").alias("n_docs"))
    )
    return keep.unionAll(general)


# --------------------------------------------------------------------------
# q243 — differentially-private released counts: per-lang doc counts
# plus Laplace(b = 2) noise drawn DETERMINISTICALLY by inverse-CDF over
# an md5-uniform seeded from the group key — the seeded-noise release
# pattern that makes a DP publication reproducible and auditable. The
# only libm step (ln) differs across engines by ulps, so the release
# value is rounded to 4 dp (the aspect/q237 discipline); everything
# upstream is integer-exact.
# --------------------------------------------------------------------------
_DP_B = 2.0
_DP_POW52 = 1 << 52


@register(
    "q243_dp_noisy_counts",
    oracle=f"""
    WITH c AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ), u AS (
      SELECT lang, n,
             (CAST(({md5_int64_sql("concat('dp1:', lang)")}
                    % {_DP_POW52}) AS DOUBLE) + 0.5) / {float(_DP_POW52)}
               AS u
      FROM c
    )
    SELECT lang, CAST(n AS BIGINT) AS true_n,
           round(n + (-{_DP_B}) * sign(u - 0.5)
                   * ln(1 - 2 * abs(u - 0.5)), 4) AS released_n
    FROM u
    """,
)
def q243(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_int64

    c = (
        load(spark, sf_dir, "documents")
        .groupBy("lang").agg(F.count("*").alias("n"))
    )
    u = ((md5_int64(F.concat(F.lit("dp1:"), F.col("lang")))
          % F.lit(_DP_POW52)).cast("double") + 0.5) / F.lit(float(_DP_POW52))
    noise = F.lit(-_DP_B) * F.signum(u - 0.5) * F.log(1 - 2 * F.abs(u - 0.5))
    return c.select(
        "lang",
        F.col("n").cast("bigint").alias("true_n"),
        F.round(F.col("n") + noise, 4).alias("released_n"),
    )


# --------------------------------------------------------------------------
# q80 — within-doc repetition signals (Gopher quality rules):
# duplicate-word fraction + top-word fraction via two-level agg.
# --------------------------------------------------------------------------
@register(
    "q80_repetition",
    oracle="""
    WITH ex AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), w -> w != '')) AS w
      FROM documents
    ), wc AS (
      SELECT doc_id, w, COUNT(*) AS c FROM ex GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_words,
           COUNT(*) AS n_distinct,
           round(1.0 - COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS dup_frac,
           round(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS top_frac
    FROM wc GROUP BY 1
    """,
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import repetition_features

    return repetition_features(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q81 — temperature-scaled domain mixing weights (w ∝ n^0.5 normalized),
# the sampling table a data-mixture trainer consumes.
# --------------------------------------------------------------------------
@register(
    "q81_mix_weights",
    oracle="""
    WITH c AS (
      SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2
    )
    SELECT lang, source, n,
           round(pow(n, 0.5) / (SELECT SUM(pow(n, 0.5)) FROM c), 6)
             AS weight
    FROM c
    """,
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import domain_mix_weights

    return domain_mix_weights(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q119 — audio-modality feature extraction: windowed RMS energy over a
# REAL 8-bit PCM RIFF/WAVE payload (sources/wav.py; samples = digest
# bytes in offset-binary, decoded as byte - 128). The digest-byte
# construction keeps the real-container fan-out kernel value-checkable
# in SQL, like q65.
# --------------------------------------------------------------------------
_PCM_BYTES = [
    f"CAST(('0x' || substr(md5(text), {2 * i + 1}, 2)) AS BIGINT)"
    for i in range(16)
]
_PCM_SIGNED = [f"({b} - 128)" for b in _PCM_BYTES]
_ENERGY_SELECTS = " UNION ALL ".join(
    f"""SELECT doc_id, {w} AS win_idx,
        round(sqrt(({" + ".join(f"{s}*{s}" for s in _PCM_SIGNED[4 * w : 4 * w + 4])}) / 4.0), 6) AS rms
        FROM documents"""
    for w in range(4)
)


@register("q119_audio_energy", oracle=_ENERGY_SELECTS)
def q119(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import audio_energy

    return audio_energy(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q234 — REAL 16-bit PCM WAV decode (sources/wav.py): full RIFF chunk
# walk, fmt parse, little-endian PCM16 samples built from digest byte
# pairs — the oracle replays (hi*256 + lo) - 32768 from md5 hex.
# --------------------------------------------------------------------------
@register(
    "q234_wav_decode",
    oracle=f"""
    SELECT doc_id, CAST(8000 AS INT) AS rate, CAST(8 AS INT) AS n_samples,
           CAST({_PCM_BYTES[0]} * 256 + {_PCM_BYTES[1]} - 32768 AS INT)
               AS s0,
           CAST({_PCM_BYTES[6]} * 256 + {_PCM_BYTES[7]} - 32768 AS INT)
               AS s3,
           CAST({_PCM_BYTES[14]} * 256 + {_PCM_BYTES[15]} - 32768 AS INT)
               AS s7
    FROM documents
    """,
)
def q234(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import decode_wav_samples

    return decode_wav_samples(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q361 — REAL FLAC decode (sources/flac.py, public RFC 9639 spec): the
# payload compresses q234's exact 8-sample PCM into a spec-valid FLAC
# stream (two 4-sample frames, fixed predictors + Rice residuals,
# CRC-8/CRC-16 verified, STREAMINFO MD5 checked), and the kernel must
# hand back the SAME samples the WAV oracle replays from md5 hex —
# bit-exact PCM through a genuinely compressed codec. Speech corpora
# (LibriSpeech-shape) ship FLAC; this is their column's decode path.
# --------------------------------------------------------------------------
@register(
    "q361_flac_decode",
    oracle=f"""
    SELECT doc_id, CAST(8000 AS INT) AS rate, CAST(8 AS INT) AS n_samples,
           CAST({_PCM_BYTES[0]} * 256 + {_PCM_BYTES[1]} - 32768 AS INT)
               AS s0,
           CAST({_PCM_BYTES[6]} * 256 + {_PCM_BYTES[7]} - 32768 AS INT)
               AS s3,
           CAST({_PCM_BYTES[14]} * 256 + {_PCM_BYTES[15]} - 32768 AS INT)
               AS s7
    FROM documents
    """,
)
def q361(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import decode_flac_samples

    return decode_flac_samples(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q364 — mp4 AUDIO-TRACK extraction: each doc carries a REAL two-track
# ISO-BMFF file (PNG 'vide' track + 16-bit PCM 'soun' track,
# sources/bmff.py multi-trak writer); the kernel walks the SOUND
# track's moov/trak/mdia/minf/stbl sample table, slices each PCM
# sample by byte range, and must hand back the q234 WAV oracle's PCM —
# the audio half of a multimodal corpus's mp4 column, with the rate
# carried by the track's mdhd timescale.
# --------------------------------------------------------------------------
@register(
    "q364_bmff_audio_track",
    oracle=f"""
    SELECT doc_id, CAST(8000 AS INT) AS rate, CAST(8 AS INT) AS n_samples,
           CAST({_PCM_BYTES[0]} * 256 + {_PCM_BYTES[1]} - 32768 AS INT)
               AS s0,
           CAST({_PCM_BYTES[6]} * 256 + {_PCM_BYTES[7]} - 32768 AS INT)
               AS s3,
           CAST({_PCM_BYTES[14]} * 256 + {_PCM_BYTES[15]} - 32768 AS INT)
               AS s7
    FROM documents
    """,
)
def q364(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import decode_av_audio

    return decode_av_audio(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q235 — REAL G.711 mu-law expansion (ITU-T closed form): the payload is
# a mu-law WAV whose 16 code words are the digest bytes; the kernel
# expands them through the companding tables and the oracle replays the
# same integer formula — complement, chord/step, ((2m + 33) << e - 33)
# * 4 with the sign bit — entirely in SQL.
# --------------------------------------------------------------------------
_MULAW_U = [f"(255 - {b})" for b in _PCM_BYTES]
_MULAW_DEC = [
    f"""(CASE WHEN {u} >= 128 THEN -1 ELSE 1 END
     * (((2 * ({u} % 16) + 33)
         * CAST(pow(2, ({u} // 16) % 8) AS BIGINT)) - 33) * 4)"""
    for u in _MULAW_U
]


@register(
    "q235_mulaw_expand",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             [{", ".join(_MULAW_DEC)}] AS xs
      FROM documents
    )
    SELECT doc_id, CAST(16 AS INT) AS n_samples,
           CAST(list_sum(xs) AS BIGINT) AS s_sum,
           CAST(list_min(xs) AS INT) AS s_min,
           CAST(list_max(xs) AS INT) AS s_max
    FROM s
    """,
)
def q235(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import decode_mulaw_stats

    return decode_mulaw_stats(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q398 — REAL IMA ADPCM decode (WAV format 0x11, sources/wav.py): the
# payload is a spec-valid ADPCM WAV whose single block's nibble bytes
# are the md5 digest (header sample 0, step index 0). The kernel runs
# the RIFF walk + block-header parse + the 89-entry step-table DP
# (bit-exact vs audioop's DVI/IMA implementation, test_wav_adpcm.py);
# the oracle replays the SAME all-integer DP as a 32-step recursive CTE
# over the digest nibbles — quantizer state machine and all. ADPCM is
# the telephony/game-audio legacy format a speech corpus sweep still
# hits; 4:1 compression with per-block random access (each block header
# restates the full decoder state, so blocks are independent decode
# units = Arrow kernel parallelism at 100 TB).
# --------------------------------------------------------------------------
_IMA_STEPS_SQL = (
    "[7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, "
    "37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, "
    "157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, "
    "544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, "
    "1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, "
    "4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, "
    "12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, "
    "29794, 32767]"
)


@register(
    "q398_adpcm_decode",
    oracle=f"""
    WITH RECURSIVE dec(doc_id, h, n, pred, idx, acc) AS (
      SELECT doc_id, md5(text), 0, 0, 0, 0 FROM documents
      UNION ALL
      SELECT doc_id, h, n + 1, np, ni, acc + np FROM (
        SELECT doc_id, h, n, acc,
          GREATEST(-32768, LEAST(32767,
            pred + CASE WHEN nib >= 8 THEN -dif ELSE dif END)) AS np,
          GREATEST(0, LEAST(88, idx + CASE (nib % 8)
            WHEN 4 THEN 2 WHEN 5 THEN 4 WHEN 6 THEN 6 WHEN 7 THEN 8
            ELSE -1 END)) AS ni
        FROM (
          SELECT doc_id, h, n, pred, idx, acc, nib,
            (st // 8) + CASE WHEN nib % 2 = 1 THEN st // 4 ELSE 0 END
                  + CASE WHEN (nib // 2) % 2 = 1 THEN st // 2 ELSE 0 END
                  + CASE WHEN (nib // 4) % 2 = 1 THEN st ELSE 0 END AS dif
          FROM (
            SELECT doc_id, h, n, pred, idx, acc,
              CASE WHEN n % 2 = 0 THEN byte % 16 ELSE byte // 16 END
                  AS nib,
              {_IMA_STEPS_SQL}[idx + 1] AS st
            FROM (
              SELECT doc_id, h, n, pred, idx, acc,
                ('0x' || substr(h, (n // 2) * 2 + 1, 2))::INT AS byte
              FROM dec WHERE n < 32
            )
          )
        )
      )
    )
    SELECT doc_id, CAST(8000 AS INT) AS rate, CAST(33 AS INT) AS n_samples,
           CAST(MAX(CASE WHEN n = 8 THEN pred END) AS INT) AS s8,
           CAST(MAX(CASE WHEN n = 16 THEN pred END) AS INT) AS s16,
           CAST(MAX(CASE WHEN n = 32 THEN pred END) AS INT) AS s32,
           CAST(MAX(CASE WHEN n = 32 THEN acc END) AS BIGINT) AS s_sum
    FROM dec GROUP BY doc_id
    """,
)
def q398(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import decode_adpcm_samples

    return decode_adpcm_samples(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q126 — streaming CDC upsert materialization: the events feed becomes a
# change stream (key=user_id, version=event_id, op=D on error events),
# drained through the exactly-once KeyedUpsertSink (foreachBatch merge
# into a versioned store + atomic pointer swap). The final snapshot is
# the batch argmax compaction — SQL-checkable despite the streaming
# execution.
# --------------------------------------------------------------------------
@register(
    "q126_stream_upsert",
    oracle="""
    WITH changes AS (
      SELECT user_id AS key, event_type AS val, event_id AS version,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM events
    ), latest AS (
      SELECT key, arg_max(val, version) AS val,
             arg_max(op, version) AS op, MAX(version) AS version
      FROM changes GROUP BY key
    )
    SELECT key, val, version FROM latest WHERE op <> 'D'
    """,
)
def q126(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import functions as F

    from ..streaming.upsert import KeyedUpsertSink

    work = tempfile.mkdtemp(prefix="q126_")
    ev_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    base, fname = f"{sf_dir}/events.parquet".rsplit("/", 1)
    stream = (
        spark.readStream.schema(ev_schema)
        .option("pathGlobFilter", fname)
        .parquet(base)
        .select(
            F.col("user_id").alias("key"),
            F.col("event_type").alias("val"),
            F.col("event_id").alias("version"),
            F.when(F.col("event_type") == "error", "D")
            .otherwise("U")
            .alias("op"),
        )
    )
    sink = KeyedUpsertSink(f"{work}/store", f"{work}/ckpt")
    sink.run_available_now(stream)
    return sink.snapshot(spark).select("key", "val", "version")


# --------------------------------------------------------------------------
# q239 — streaming ingest INTO the snapshot table format: the events
# feed drains through foreachBatch -> snapshot_append with the batch_id
# recorded in each manifest (Delta's txnAppId idempotent-write trick),
# so crash-replayed batches are no-ops and readers plan each version
# from one manifest. The final table equals the batch read — the SQL
# oracle — while the unit suite separately proves replay idempotency
# and vacuum lifecycle.
# --------------------------------------------------------------------------
@register(
    "q239_stream_snapshot_ingest",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q239(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import functions as F

    from ..sources.snapshots import read_snapshot
    from ..streaming.snapshot_sink import SnapshotTableSink

    work = tempfile.mkdtemp(prefix="q239_")
    ev_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    base, fname = f"{sf_dir}/events.parquet".rsplit("/", 1)
    stream = (
        spark.readStream.schema(ev_schema)
        .option("pathGlobFilter", fname)
        .parquet(base)
        .select("event_type", "user_id", "event_id")
    )
    sink = SnapshotTableSink(f"{work}/table", f"{work}/ckpt")
    sink.run_available_now(stream)
    return read_snapshot(spark, f"{work}/table").groupBy(
        "event_type"
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


# --------------------------------------------------------------------------
# q137 — incremental aggregate materialization (streaming materialized
# view): per-user event count + decimal value total maintained across
# micro-batches by AdditiveAggSink (map-side partial agg per batch,
# commutative merge into the versioned store). Final state == the batch
# aggregate, which is the oracle.
# --------------------------------------------------------------------------
@register(
    "q137_stream_agg_view",
    oracle="""
    SELECT user_id AS key, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
    FROM events GROUP BY user_id
    """,
)
def q137(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import functions as F

    from ..streaming.upsert import AdditiveAggSink

    work = tempfile.mkdtemp(prefix="q137_")
    ev_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    base, fname = f"{sf_dir}/events.parquet".rsplit("/", 1)
    stream = (
        spark.readStream.schema(ev_schema)
        .option("pathGlobFilter", fname)
        .parquet(base)
        .select(F.col("user_id").alias("key"), F.col("value"))
    )
    sink = AdditiveAggSink(f"{work}/store", f"{work}/ckpt")
    sink.run_available_now(stream)
    return sink.snapshot(spark).select(
        "key", "n", F.col("total").cast("double").alias("total")
    )


# --------------------------------------------------------------------------
# q160 — k-means training iteration (Lloyd's step): seed centroids from
# the first k vectors, assign by squared Euclidean distance, recompute
# per-dimension means, re-assign. The clustering step SemDeDup-style
# curation (q150) sits on, executed as pure DataFrame algebra: the only
# per-vector work is k broadcast dot products; the centroid update is a
# (cluster, dim)-keyed aggregation — never a driver-side loop over
# vectors. Empty clusters drop out identically in both engines (inner
# join semantics).
# --------------------------------------------------------------------------
_KM_K = 8


def _km_oracle() -> str:
    return f"""
    WITH seeds AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE vec_id < {_KM_K}
    ), s0 AS (
      SELECT e.vec_id, seeds.cid,
             list_dot_product(CAST(e.embedding AS DOUBLE[]),
                              CAST(e.embedding AS DOUBLE[]))
             - 2 * list_dot_product(CAST(e.embedding AS DOUBLE[]), cv)
             + list_dot_product(cv, cv) AS d2
      FROM embeddings e CROSS JOIN seeds
    ), a0 AS (
      SELECT vec_id, cid FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rk
        FROM s0
      ) WHERE rk = 1
    ), ex AS (
      SELECT a0.cid, unnest(e.embedding) AS v,
             generate_subscripts(e.embedding, 1) AS pos
      FROM embeddings e JOIN a0 USING (vec_id)
    ), cd AS (
      SELECT cid, pos, AVG(CAST(v AS DOUBLE)) AS cv FROM ex GROUP BY 1, 2
    ), cent1 AS (
      SELECT cid, list(cv ORDER BY pos) AS cv FROM cd GROUP BY 1
    ), s1 AS (
      SELECT e.vec_id, cent1.cid,
             list_dot_product(CAST(e.embedding AS DOUBLE[]),
                              CAST(e.embedding AS DOUBLE[]))
             - 2 * list_dot_product(CAST(e.embedding AS DOUBLE[]), cv)
             + list_dot_product(cv, cv) AS d2
      FROM embeddings e CROSS JOIN cent1
    )
    SELECT vec_id, cid AS assigned, round(d2, 6) AS dist2 FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rk
      FROM s1
    ) WHERE rk = 1
    """


@register("q160_kmeans_iteration", oracle=_km_oracle())
def q160(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions import similarity as SIM

    emb = load(spark, sf_dir, "embeddings")

    def assign(cent: DataFrame) -> DataFrame:
        d2 = (
            SIM.dot(F.col("embedding"), F.col("embedding"))
            - 2 * SIM.dot(F.col("embedding"), F.col("cv"))
            + SIM.dot(F.col("cv"), F.col("cv"))
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("d2").asc(), F.col("cid").asc())
        return (
            emb.crossJoin(F.broadcast(cent))
            .select("vec_id", "embedding", "cid", d2.alias("d2"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .drop("rk")
        )

    seeds = emb.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    a0 = assign(seeds).select("vec_id", "cid")
    ex = (
        emb.join(a0, "vec_id")
        .select("cid", F.posexplode("embedding").alias("pos0", "v"))
    )
    cent1 = (
        ex.groupBy("cid", "pos0")
        .agg(F.avg(F.col("v").cast("double")).alias("cv_d"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos0", "cv_d"))),
                lambda s: s["cv_d"],
            ).alias("cv")
        )
    )
    return assign(cent1).select(
        "vec_id", F.col("cid").alias("assigned"),
        F.round("d2", 6).alias("dist2"),
    )


# --------------------------------------------------------------------------
# q166 — dedup-index quality evaluation: precision/recall of the
# MinHash-LSH candidate set (q29) against exact word-set Jaccard >= 0.5
# ground truth (computed via the prefix-filtered SSJoin, q136's
# operator). The eval every near-dup deployment runs to pick its
# band/permutation config — the dedup twin of q165's ANN recall.
# Both sides are restricted to a DETERMINISTIC 20% document sample
# (doc_id % 5 == 0): exact ground truth over the full corpus is
# quadratic-ish by nature (that's the point of having the index), so
# production evals compute it on a fixed eval slice. The restriction
# commutes with both pairwise ops (a band collision / a Jaccard value
# depends only on the two documents), so sampled-pairs(full run) ==
# pairs(sampled run) and the oracle stays exact. One row: candidate
# volume, truth volume, hits, both rates — on the eval slice.
# --------------------------------------------------------------------------
@register(
    "q166_lsh_quality",
    oracle=f"""
    WITH cands AS (
      SELECT * FROM ({_Q29_SQL})
      WHERE doc_id_a % 5 = 0 AND doc_id_b % 5 = 0
    ), base AS (
      SELECT doc_id, list_distinct(
        list_filter(string_split(text, ' '), w -> w != '')) AS ws
      FROM documents WHERE doc_id % 5 = 0
    ), truth AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
      FROM base a JOIN base b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.ws, b.ws))
            / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws)))
            >= 0.5
    ), hits AS (
      SELECT COUNT(*) AS n_hits
      FROM cands JOIN truth USING (doc_id_a, doc_id_b)
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cands) AS n_candidates,
           CAST(n_hits AS BIGINT) AS n_hits,
           round(n_hits / (SELECT COUNT(*) FROM cands), 6) AS precision,
           round(n_hits / (SELECT COUNT(*) FROM truth), 6) AS recall
    FROM hits
    """,
)
def q166(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(
        F.pmod(F.col("doc_id"), F.lit(5)) == 0)
    sigs = D.minhash_signatures(docs)
    # full-outer join on the pair key, then ONE aggregation pass: each
    # expensive side (exact SSJoin truth, LSH candidate gen) is planned
    # exactly once. The earlier three-reference formulation recomputed
    # the SSJoin per reference — 150+ s at sf0.1 vs ~the cost of one
    # SSJoin now.
    cands = D.lsh_candidate_pairs(sigs).withColumn("is_cand", F.lit(1))
    truth = D.prefix_jaccard_pairs(docs, threshold=0.5).select(
        "doc_id_a", "doc_id_b").withColumn("is_truth", F.lit(1))
    both = cands.join(truth, ["doc_id_a", "doc_id_b"], "full_outer")
    return both.agg(
        F.count("is_truth").cast("bigint").alias("n_truth"),
        F.count("is_cand").cast("bigint").alias("n_candidates"),
        F.sum(
            F.when(F.col("is_cand").isNotNull()
                   & F.col("is_truth").isNotNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_hits"),
    ).select(
        "n_truth", "n_candidates", "n_hits",
        F.round(F.col("n_hits") / F.col("n_candidates"), 6)
        .alias("precision"),
        F.round(F.col("n_hits") / F.col("n_truth"), 6).alias("recall"),
    )


# --------------------------------------------------------------------------
# q173 — deterministic train/val/test split: bucket = md5(id|salt) % 100,
# test = first 5 buckets, val = next 5, train = rest. Row-local (map-
# only, no shuffle before the tally) and stable under corpus growth — a
# document's split never changes when other documents arrive, the
# property that keeps eval sets uncontaminated across dataset versions.
# --------------------------------------------------------------------------
@register(
    "q173_train_val_test_split",
    oracle=f"""
    WITH b AS (
      SELECT lang,
             {md5_int64_sql("CAST(doc_id AS VARCHAR) || '|split-v1'")}
               % 100 AS bucket
      FROM documents
    )
    SELECT lang,
           CASE WHEN bucket < 5 THEN 'test'
                WHEN bucket < 10 THEN 'val'
                ELSE 'train' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM b GROUP BY 1, 2
    """,
)
def q173(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.sampling import train_val_test_split

    docs = load(spark, sf_dir, "documents")
    return (
        train_val_test_split(docs, val_pct=5, test_pct=5)
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


# --------------------------------------------------------------------------
# q208 — dedup cluster-size histogram: the report consumed after any
# near-dup run (how much mass sits in big duplicate families?). Sizes
# come from the q53 component labels (star-contracted edges, pointer-
# jumped components); singletons = docs with no near-dup edge. The
# oracle replays the full recursive-CTE component computation and the
# same histogram.
# --------------------------------------------------------------------------
@register(
    "q208_cluster_size_histogram",
    oracle=f"""
    WITH RECURSIVE {_COMP_SQL}, sizes AS (
      SELECT component, COUNT(*) AS sz FROM comp GROUP BY component
      UNION ALL
      SELECT doc_id AS component, 1 AS sz
      FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM comp)
    )
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs
    FROM sizes GROUP BY sz
    """,
)
def q208(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs)
    comp = D.connected_components(D.lsh_star_edges(sigs))
    sizes = comp.groupBy("component").agg(F.count("*").alias("sz"))
    singles = (
        docs.join(comp.select(F.col("doc_id").alias("d")),
                  docs.doc_id == F.col("d"), "left_anti")
        .select(F.col("doc_id").alias("component"))
        .withColumn("sz", F.lit(1))
    )
    return (
        sizes.unionByName(singles)
        .groupBy(F.col("sz").cast("bigint").alias("cluster_size"))
        .agg(F.count("*").cast("bigint").alias("n_clusters"),
             F.sum("sz").cast("bigint").alias("n_docs"))
    )


# --------------------------------------------------------------------------
# q366 — near-dup cluster CANONICALIZATION: the dedup OUTPUT op. After
# q53's components, each cluster keeps exactly one canonical doc (max
# n_chars, tie -> lowest doc_id — deterministic under any
# partitioning) and the rest are drops; singletons are implicitly
# kept. The kept set IS the training corpus after dedup. The oracle
# replays the recursive-CTE components and the same argmax.
# Scale: the component table is O(dup docs); one equi-join + one
# cluster-keyed max(struct) with map-side partials — no corpus window.
# --------------------------------------------------------------------------
@register(
    "q366_dedup_canonicalize",
    oracle=f"""
    WITH RECURSIVE {_COMP_SQL}, j AS (
      SELECT c.doc_id, c.component, d.n_chars
      FROM comp c JOIN documents d USING (doc_id)
    ), best AS (
      SELECT component, doc_id AS canon_id FROM (
        SELECT component, doc_id,
               row_number() OVER (PARTITION BY component
                 ORDER BY n_chars DESC, doc_id ASC) AS rk
        FROM j
      ) WHERE rk = 1
    )
    SELECT j.doc_id, j.component,
           CAST(j.n_chars AS BIGINT) AS quality,
           j.doc_id = b.canon_id AS is_canonical
    FROM j JOIN best b USING (component)
    """,
)
def q366(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs)
    comp = D.connected_components(D.lsh_star_edges(sigs))
    return D.canonicalize_clusters(comp, docs)


# --------------------------------------------------------------------------
# q257 — INTER-ANNOTATOR AGREEMENT (Cohen's kappa): the QA gate on any
# human/model labeling campaign before its labels train a filter.
# Annotator A is a length heuristic; annotator B is A with a
# deterministic 15% hash-flip — so agreement is high but not total and
# kappa is non-degenerate. DETERMINISM: kappa has the closed form
# (N·agree − Σ a_c·b_c) / (N² − Σ a_c·b_c) over integer marginals, so
# the single reported double is ONE IEEE division of exact BIGINTs.
# Plan: one fact-scale hash agg to the 2×2 confusion matrix, constant
# rows after that.
# --------------------------------------------------------------------------
@register(
    "q257_annotator_kappa",
    oracle=f"""
    WITH lab AS (
      SELECT CASE WHEN n_chars > 120 THEN 1 ELSE 0 END AS a,
             CASE WHEN ({md5_int64_sql('text')}) % 100 < 15
                  THEN 1 - CASE WHEN n_chars > 120 THEN 1 ELSE 0 END
                  ELSE CASE WHEN n_chars > 120 THEN 1 ELSE 0 END
             END AS b
      FROM documents
    ), cm AS (
      SELECT CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n11,
             CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n10,
             CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n01,
             CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n00
      FROM lab
    )
    SELECT n11, n10, n01, n00,
           CAST((n11 + n10 + n01 + n00) * (n11 + n00)
                - ((n11 + n10) * (n11 + n01)
                   + (n01 + n00) * (n10 + n00)) AS DOUBLE)
           / ((n11 + n10 + n01 + n00) * (n11 + n10 + n01 + n00)
              - ((n11 + n10) * (n11 + n01)
                 + (n01 + n00) * (n10 + n00))) AS kappa
    FROM cm
    """,
)
def q257(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_int64

    docs = load(spark, sf_dir, "documents")
    a = F.when(F.col("n_chars") > 120, 1).otherwise(0)
    flip = md5_int64(F.col("text")) % 100 < 15
    b = F.when(flip, 1 - a).otherwise(a)
    cm = docs.select(a.alias("a"), b.alias("b")).agg(
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1)
              .otherwise(0)).cast("bigint").alias("n11"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1)
              .otherwise(0)).cast("bigint").alias("n10"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1)
              .otherwise(0)).cast("bigint").alias("n01"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1)
              .otherwise(0)).cast("bigint").alias("n00"),
    )
    n = F.col("n11") + F.col("n10") + F.col("n01") + F.col("n00")
    chance = ((F.col("n11") + F.col("n10"))
              * (F.col("n11") + F.col("n01"))
              + (F.col("n01") + F.col("n00"))
              * (F.col("n10") + F.col("n00")))
    return cm.select(
        "n11", "n10", "n01", "n00",
        ((n * (F.col("n11") + F.col("n00")) - chance).cast("double")
         / (n * n - chance)).alias("kappa"),
    )


# --------------------------------------------------------------------------
# q262 — TOKEN-BUDGET SELECTION (sampling.py::budget_select): take the
# best-scoring documents until the running token cost would exceed the
# budget — the "best docs until N tokens" cut every pretraining mix
# plan executes. The global prefix sum is a DISTRIBUTED SCAN, not a
# single-task global window: fixed score-domain buckets (x16 is a
# power of two, so the bucket boundary math is float-exact) cumsum
# independently and only the 16 bucket totals cross partitions in a
# broadcast offset join. The oracle IS the naive global window — the
# two formulations must agree row-for-row.
# --------------------------------------------------------------------------
@register(
    "q262_token_budget_select",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, n_chars,
             (({md5_int64_sql('text')}) % 1000) / 1000.0 AS score
      FROM documents
    )
    SELECT doc_id,
           CAST(SUM(n_chars) OVER (ORDER BY score DESC, doc_id ASC)
                AS BIGINT) AS running_cost
    FROM s
    QUALIFY running_cost <= 40000
    """,
)
def q262(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_int64

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "n_chars",
        ((md5_int64(F.col("text")) % 1000) / 1000.0).alias("score"))
    return S.budget_select(
        docs, "score", "n_chars", budget=40000
    ).select("doc_id", F.col("running_cost").cast("bigint")
             .alias("running_cost"))


# --------------------------------------------------------------------------
# q263 — IMAGE NEAR-DUP pairs: the multimodal twin of the text LSH
# stack — perceptual aHash (REAL PNG decode path, q65) banded into 4
# hamming bands; by pigeonhole any pair within hamming distance 3
# shares at least one identical band, so candidates arrive through a
# plain (band, key) equi-join — never an all-pairs hash comparison —
# and only candidates pay the popcount verify. Output is the distance
# histogram of verified pairs. Production would run a 64-bit pHash
# with 8 bands; the band algebra is identical.
# --------------------------------------------------------------------------
@register(
    "q263_image_neardup",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text,
             ({" + ".join(_AHASH_BYTES)}) / 16.0 AS m
      FROM documents
    ), h AS (
      SELECT doc_id, CAST({_AHASH_BITS} AS BIGINT) AS ahash FROM b
    ), bands AS (
      SELECT doc_id, ahash, g.band_id,
             (ahash // CASE g.band_id WHEN 0 THEN 1 WHEN 1 THEN 16
                                      WHEN 2 THEN 256 ELSE 4096 END) % 16
               AS key
      FROM h, (SELECT unnest(generate_series(0, 3)) AS band_id) g
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.ahash AS ha, b.ahash AS hb
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.key = b.key
       AND a.doc_id < b.doc_id
    )
    SELECT CAST(bit_count(xor(ha, hb)) AS INT) AS dist,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM cand
    WHERE bit_count(xor(ha, hb)) <= 3
    GROUP BY 1
    ORDER BY dist
    """,
)
def q263(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import image_ahash

    # both LSH band sides reference h — checkpoint so the image-decode
    # kernel runs once per image, not twice
    h = image_ahash(load(spark, sf_dir, "documents")).localCheckpoint(
        eager=False)
    band_id = F.explode(F.array(*[F.lit(i) for i in range(4)]))
    bands = h.select(
        "doc_id", "ahash", band_id.alias("band_id")
    ).withColumn(
        "key", F.expr("shiftrightunsigned(ahash, band_id * 4)") % 16)
    a = bands.select(F.col("doc_id").alias("id_a"),
                     F.col("ahash").alias("ha"), "band_id", "key")
    b2 = bands.select(F.col("doc_id").alias("id_b"),
                      F.col("ahash").alias("hb"), "band_id", "key")
    cand = (
        a.join(b2, ["band_id", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb").distinct()
    )
    dist = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.filter(dist <= 3)
        .groupBy(dist.cast("int").alias("dist"))
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .orderBy("dist")
    )


# --------------------------------------------------------------------------
# q277 — AUDIO ZCR/PEAK screen: zero-crossing count, peak amplitude and
# mean-abs per doc through the REAL RIFF/WAVE parse (8-bit PCM, 16
# digest-byte samples). All integer-exact (crossing = sign-bit change,
# zero counted non-negative; mean_abs = integer sum / 16, a power of
# two), so the oracle replays every value from md5 hex. One-to-one
# Arrow kernel — map-only, no shuffle.
# --------------------------------------------------------------------------
_ZCR_TERMS = " + ".join(
    f"(CASE WHEN ({_PCM_SIGNED[i]} < 0) != ({_PCM_SIGNED[i + 1]} < 0) "
    "THEN 1 ELSE 0 END)"
    for i in range(15)
)
_ABS_TERMS = " + ".join(f"abs({s})" for s in _PCM_SIGNED)


@register(
    "q277_audio_zcr",
    oracle=f"""
    SELECT doc_id, CAST(16 AS INT) AS n_samples,
           CAST({_ZCR_TERMS} AS INT) AS zcr,
           CAST(greatest({", ".join(f"abs({s})" for s in _PCM_SIGNED)})
                AS INT) AS peak,
           CAST(({_ABS_TERMS}) AS DOUBLE) / 16.0 AS mean_abs
    FROM documents
    """,
)
def q277(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import audio_zcr

    return audio_zcr(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q290 — l-DIVERSITY audit (the k-anonymity companion, q242): a
# quasi-identifier group can meet k yet expose its members if the
# SENSITIVE attribute barely varies. For each (mktsegment, nationkey)
# group: distinct sensitive values (order priority via the customer's
# orders), the dominant value's share, and the distinct-l /
# dominant-share release verdict (l >= 3 AND top share <= 0.6).
# Integer counts + one division per group; two shrinking hash aggs +
# a max_by — nothing fact-scale after the first.
# --------------------------------------------------------------------------
_LDIV_L = 3
_LDIV_TOP = 0.6


@register(
    "q290_l_diversity",
    oracle=f"""
    WITH j AS (
      SELECT c.c_mktsegment AS seg, c.c_nationkey AS nat,
             o.o_orderpriority AS sens
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    ), cell AS (
      SELECT seg, nat, sens, COUNT(*) AS n FROM j GROUP BY 1, 2, 3
    ), grp AS (
      SELECT seg, nat, SUM(n) AS n_rows, COUNT(*) AS l_distinct,
             MAX(n) AS n_top
      FROM cell GROUP BY 1, 2
    )
    SELECT seg, CAST(nat AS BIGINT) AS nat,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(l_distinct AS BIGINT) AS l_distinct,
           round(CAST(n_top AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
             AS top_share,
           (l_distinct >= {_LDIV_L}
            AND CAST(n_top AS DOUBLE) / CAST(n_rows AS DOUBLE)
                <= {_LDIV_TOP}) AS releasable
    FROM grp ORDER BY seg, nat
    """,
)
def q290(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    j = orders.join(
        cust.select("c_custkey", "c_mktsegment", "c_nationkey"),
        F.col("o_custkey") == F.col("c_custkey"))
    cell = j.groupBy(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        F.col("o_orderpriority").alias("sens"),
    ).agg(F.count("*").alias("n"))
    grp = cell.groupBy("seg", "nat").agg(
        F.sum("n").alias("n_rows"),
        F.count("*").alias("l_distinct"),
        F.max("n").alias("n_top"),
    )
    share = F.col("n_top").cast("double") / F.col("n_rows").cast("double")
    return grp.select(
        "seg", F.col("nat").cast("bigint").alias("nat"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("l_distinct").cast("bigint").alias("l_distinct"),
        F.round(share, 6).alias("top_share"),
        ((F.col("l_distinct") >= _LDIV_L) & (share <= _LDIV_TOP))
        .alias("releasable"),
    ).orderBy("seg", "nat")


# --------------------------------------------------------------------------
# q291 — FUNCTIONAL-DEPENDENCY PROFILING (the schema-discovery pass a
# data catalog runs): for each candidate FD X -> Y, violations =
# sum over X-groups of (group size - dominant Y count) — zero means
# the FD holds exactly; the rate normalizes by table size. Candidates
# span true FDs (custkey -> nation via the customer dim), near-FDs,
# and garbage (clerk-less orders have none), so the profile is
# non-trivial in both directions. Each candidate is one shrinking
# two-level hash agg; integers until one division.
# --------------------------------------------------------------------------
_FD_CANDIDATES = (
    ("o_custkey", "o_orderpriority"),
    ("o_custkey", "o_orderstatus"),
    ("o_orderpriority", "o_orderstatus"),
    ("o_orderstatus", "o_orderpriority"),
)


def _fd_sql(x: str, y: str) -> str:
    return f"""
    SELECT '{x}' AS x_col, '{y}' AS y_col,
           CAST(COUNT(DISTINCT x) AS BIGINT) AS n_groups,
           CAST(SUM(n) - SUM(n_top) AS BIGINT) AS n_violations,
           round(CAST(SUM(n) - SUM(n_top) AS DOUBLE)
                 / CAST(SUM(n) AS DOUBLE), 6) AS violation_rate
    FROM (
      SELECT x, SUM(n) AS n, MAX(n) AS n_top
      FROM (SELECT {x} AS x, {y} AS y, COUNT(*) AS n
            FROM orders GROUP BY 1, 2) c
      GROUP BY x
    ) g
    """


@register(
    "q291_fd_profile",
    oracle=" UNION ALL ".join(_fd_sql(x, y) for x, y in _FD_CANDIDATES)
    + " ORDER BY x_col, y_col",
)
def q291(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    outs = []
    for x, y in _FD_CANDIDATES:
        cell = orders.groupBy(
            F.col(x).alias("x"), F.col(y).alias("y")
        ).agg(F.count("*").alias("n"))
        g = cell.groupBy("x").agg(
            F.sum("n").alias("n"), F.max("n").alias("n_top"))
        outs.append(g.agg(
            F.lit(x).alias("x_col"), F.lit(y).alias("y_col"),
            F.count("*").cast("bigint").alias("n_groups"),
            (F.sum("n") - F.sum("n_top")).cast("bigint")
            .alias("n_violations"),
            F.round((F.sum("n") - F.sum("n_top")).cast("double")
                    / F.sum("n").cast("double"), 6)
            .alias("violation_rate"),
        ))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("x_col", "y_col")


# --------------------------------------------------------------------------
# q304 — t-CLOSENESS (the EMD follow-up to q242's k-anonymity and
# q290's l-diversity): per (lang, source) quasi-identifier class, the
# Earth Mover's Distance between the class's distribution of the
# ORDERED sensitive attribute (n_chars decile band 0..9) and the global
# distribution — for ordinal attributes EMD = mean |cumP - cumQ|. Kept
# integer-exact by clearing denominators: |cum_c * N - cum_g * n_c|
# accumulates as bigint and one final division maps to the t value.
# The fact table shrinks to (class, band) counts first; the per-class
# cumulation windows over <= 10 band rows (partitioned BY class — no
# global window), and the 10-row global band table broadcasts.
# --------------------------------------------------------------------------
_TC_BANDS = 10
_TC_WIDTH = 400


@register(
    "q304_t_closeness",
    oracle=f"""
    WITH d AS (
      SELECT lang, source,
             LEAST({_TC_BANDS - 1}, n_chars // {_TC_WIDTH}) AS band
      FROM documents
    ), cls AS (
      SELECT lang, source, COUNT(*) AS n_c FROM d GROUP BY 1, 2
    ), bandtab AS (
      SELECT CAST(b AS BIGINT) AS band
      FROM generate_series(0, {_TC_BANDS - 1}) t(b)
    ), cnt AS (
      SELECT c.lang, c.source, b.band, c.n_c,
             COALESCE(x.k, 0) AS k
      FROM cls c CROSS JOIN bandtab b
      LEFT JOIN (SELECT lang, source, band, COUNT(*) AS k
                 FROM d GROUP BY 1, 2, 3) x
        ON x.lang = c.lang AND x.source = c.source AND x.band = b.band
    ), g AS (
      SELECT band, COUNT(*) AS gk FROM d GROUP BY band
    ), cum AS (
      SELECT cnt.lang, cnt.source, cnt.band, cnt.n_c,
             SUM(cnt.k) OVER (PARTITION BY cnt.lang, cnt.source
                              ORDER BY cnt.band) AS cum_c,
             SUM(COALESCE(g.gk, 0)) OVER (
               PARTITION BY cnt.lang, cnt.source
               ORDER BY cnt.band) AS cum_g,
             (SELECT COUNT(*) FROM d) AS n_tot
      FROM cnt LEFT JOIN g USING (band)
    )
    SELECT lang, source,
           CAST(MAX(n_c) AS BIGINT) AS n_docs,
           round(CAST(SUM(abs(cum_c * n_tot - cum_g * n_c)) AS DOUBLE)
                 / (CAST(MAX(n_c) AS DOUBLE) * MAX(n_tot)
                    * {_TC_BANDS - 1}), 6) AS t_emd
    FROM cum GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def q304(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "lang", "source",
        F.least(F.lit(_TC_BANDS - 1),
                (F.col("n_chars") / _TC_WIDTH).cast("bigint")).alias("band"))
    cls = d.groupBy("lang", "source").agg(F.count("*").alias("n_c"))
    bands = (
        d.sparkSession.range(_TC_BANDS)
        .select(F.col("id").cast("bigint").alias("band"))
    )
    x = d.groupBy("lang", "source", "band").agg(F.count("*").alias("k"))
    g = d.groupBy("band").agg(F.count("*").alias("gk"))
    n_tot = d.agg(F.count("*").alias("n_tot"))
    grid = (
        cls.crossJoin(F.broadcast(bands))
        .join(x, ["lang", "source", "band"], "left")
        .join(F.broadcast(g), "band", "left")
        .crossJoin(F.broadcast(n_tot))
        .select("lang", "source", "band", "n_c",
                F.coalesce(F.col("k"), F.lit(0)).alias("k"),
                F.coalesce(F.col("gk"), F.lit(0)).alias("gk"), "n_tot")
    )
    wc = (Window.partitionBy("lang", "source")
          .orderBy(F.col("band").asc())
          .rowsBetween(Window.unboundedPreceding, 0))
    cum = grid.select(
        "lang", "source", "n_c", "n_tot",
        F.sum("k").over(wc).alias("cum_c"),
        F.sum("gk").over(wc).alias("cum_g"))
    return (
        cum.groupBy("lang", "source")
        .agg(
            F.max("n_c").cast("bigint").alias("n_docs"),
            F.round(
                F.sum(F.abs(F.col("cum_c") * F.col("n_tot")
                            - F.col("cum_g") * F.col("n_c")))
                .cast("double")
                / (F.max("n_c").cast("double") * F.max("n_tot")
                   * F.lit(_TC_BANDS - 1)), 6).alias("t_emd"))
        .orderBy("lang", "source")
    )


# --------------------------------------------------------------------------
# q305 — CUPED variance reduction (the industry-standard A/B readout
# adjustment): covariate X = pre-period spend, metric Y = post-period
# spend (split at a fixed calendar date), theta = cov(X,Y)/var(X) from
# POOLED exact sums, adjusted arm mean = mean(Y_a) - theta *
# (mean(X_a) - mean(X)). Every distributed aggregate is integer cents
# or DECIMAL(38,0) cross-products; theta / means / the variance-
# reduction ratio (= r^2 of X on Y) are fixed-order scalar IEEE ops
# over those exact aggregates, so partitioning cannot move a bit.
# Scale shape: one fact-scale groupBy(custkey), then a 2-row arm agg
# and a 1-row pooled agg joined by broadcast.
# --------------------------------------------------------------------------
_CUPED_SPLIT = "1998-01-01"


@register(
    "q305_cuped",
    oracle=f"""
    WITH per_c AS (
      SELECT o_custkey,
             o_custkey % 2 AS arm,
             SUM(CASE WHEN o_orderdate < TIMESTAMP '{_CUPED_SPLIT} 00:00:00'
                 THEN CAST(floor(o_totalprice * 100) AS BIGINT)
                 ELSE 0 END) AS x,
             SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_CUPED_SPLIT} 00:00:00'
                 THEN CAST(floor(o_totalprice * 100) AS BIGINT)
                 ELSE 0 END) AS y
      FROM orders GROUP BY 1, 2
    ), pooled AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy,
             SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
               AS sxy,
             SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
               AS sxx,
             SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
               AS syy
      FROM per_c
    ), arms AS (
      SELECT arm, COUNT(*) AS n_a,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx_a,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy_a
      FROM per_c GROUP BY arm
    )
    SELECT CAST(arm AS BIGINT) AS arm,
           CAST(n_a AS BIGINT) AS n_customers,
           round(CAST(sy_a AS DOUBLE) / n_a / 100.0, 6) AS mean_y,
           round((CAST(sy_a AS DOUBLE) / n_a
                  - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                    * (CAST(sx_a AS DOUBLE) / n_a
                       - CAST(sx AS DOUBLE) / n)) / 100.0, 6)
             AS mean_y_adj,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             AS theta,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS var_reduction
    FROM arms, pooled ORDER BY arm
    """,
)
def q305(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    split = F.lit(_CUPED_SPLIT + " 00:00:00").cast("timestamp")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    per_c = orders.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderdate") < split, cents)
              .otherwise(F.lit(0))).alias("x"),
        F.sum(F.when(F.col("o_orderdate") >= split, cents)
              .otherwise(F.lit(0))).alias("y"),
    ).select((F.col("o_custkey") % 2).alias("arm"), "x", "y") \
        .localCheckpoint(eager=False)  # pooled + per-arm aggs both read it
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    pooled = per_c.agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(d19("x") * d19("y")).alias("sxy"),
        F.sum(d19("x") * d19("x")).alias("sxx"),
        F.sum(d19("y") * d19("y")).alias("syy"),
    )
    arms = per_c.groupBy("arm").agg(
        F.count("*").alias("n_a"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx_a"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy_a"),
    )
    j = arms.crossJoin(F.broadcast(pooled))
    nd = F.col("n").cast("double")
    nad = F.col("n_a").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxa, sya = F.col("sx_a").cast("double"), F.col("sy_a").cast("double")
    cov_n = nd * sxy - sx * sy
    theta = cov_n / (nd * sxx - sx * sx)
    return j.select(
        F.col("arm").cast("bigint").alias("arm"),
        F.col("n_a").cast("bigint").alias("n_customers"),
        F.round(sya / nad / F.lit(100.0), 6).alias("mean_y"),
        F.round((sya / nad - theta * (sxa / nad - sx / nd))
                / F.lit(100.0), 6).alias("mean_y_adj"),
        F.round(theta, 6).alias("theta"),
        F.round(cov_n * cov_n
                / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 6)
        .alias("var_reduction"),
    ).orderBy("arm")


# --------------------------------------------------------------------------
# q306 — AUDIO DECIMATION (anti-aliased downsample): 16 PCM samples ->
# 4, each output the EXACT integer boxcar sum of 4 consecutive inputs
# (the division is deliberately left out — signed integer division
# rounds differently across engines; the sum is bit-portable). Runs
# through the real RIFF parse like q234/q277; the oracle replays every
# sum from the md5 digest bytes. Map-only Arrow kernel, no shuffle.
# --------------------------------------------------------------------------
@register(
    "q306_audio_decimate",
    oracle=f"""
    SELECT doc_id, CAST(16 AS INT) AS n_in, CAST(4 AS INT) AS n_out,
           {", ".join(
               "CAST((" + " + ".join(_PCM_SIGNED[4 * k:4 * k + 4])
               + f") AS BIGINT) AS y{k}" for k in range(4))}
    FROM documents
    """,
)
def q306(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import audio_decimate

    return audio_decimate(load(spark, sf_dir, "documents"))

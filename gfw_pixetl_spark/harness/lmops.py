"""Language-model-adjacent harness queries: n-gram LMs, tokenizers (BPE,
WordPiece, unigram), perplexity, eval metrics (BLEU/ROUGE), indexes.

Split out of the former textops.py (round 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.hashing import md5_int64_sql
from . import load, register
from .textcommon import SQL_WORDS
from .textstats import q177, q33
from .formatops import q424

# --------------------------------------------------------------------------
# q140 — unigram surprisal scoring (the statistical stand-in for
# model-perplexity quality filtering): per-doc mean -log2 P(word) under
# the corpus unigram LM. Token counts aggregate once (vocabulary-sized,
# broadcast back); each doc's score is one JVM-side join + aggregate —
# no Python, no per-doc vocabulary scan.
# --------------------------------------------------------------------------
@register(
    "q140_unigram_surprisal",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({SQL_WORDS}) AS w FROM documents
    ), freq AS (
      SELECT w, COUNT(*) AS c FROM toks GROUP BY w
    ), total AS (
      SELECT SUM(c) AS t FROM freq
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           round(AVG(-log2(freq.c / total.t)), 6) AS surprisal
    FROM toks JOIN freq USING (w) CROSS JOIN total
    GROUP BY doc_id
    """,
)
def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.words("text")).alias("w")
    ).localCheckpoint(eager=False)  # freq build + scoring join
    freq = toks.groupBy("w").agg(F.count("*").alias("c")) \
        .localCheckpoint(eager=False)  # total + scoring join
    total = freq.agg(F.sum("c").alias("t"))
    return (
        toks.join(F.broadcast(freq), "w")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(-F.log2(F.col("c") / F.col("t"))), 6).alias(
                "surprisal"
            ),
        )
    )


# --------------------------------------------------------------------------
# q158 — bigram-LM perplexity scoring (the next statistical rung above
# q140's unigram surprisal): per-doc mean -log2 P(w2|w1) under the
# corpus bigram model with add-0.5 smoothing. Scale shape: the model
# (bigram counts, left-context totals, vocab size) is corpus-aggregated
# once and joined back by key — the per-doc pass is explode + equi-join
# + aggregate, all JVM-side; nothing is per-doc vocabulary-scanned.
# --------------------------------------------------------------------------
@register(
    "q158_bigram_perplexity",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {SQL_WORDS} AS ws FROM documents
    ), bi AS (
      SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM (
        SELECT doc_id,
               unnest(list_zip(list_slice(ws, 1, len(ws) - 1),
                               list_slice(ws, 2, len(ws)))) AS p
        FROM w WHERE len(ws) >= 2)
    ), bc AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2
    ), lc AS (
      SELECT w1, SUM(c12) AS c1 FROM bc GROUP BY 1
    ), v AS (
      SELECT COUNT(DISTINCT w) AS vs
      FROM (SELECT unnest(ws) AS w FROM w)
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           round(AVG(-log2((c12 + 0.5) / (c1 + 0.5 * vs))), 6) AS surprisal
    FROM bi JOIN bc USING (w1, w2) JOIN lc USING (w1) CROSS JOIN v
    GROUP BY doc_id
    """,
)
def q158(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ws = T.words("text")
    n = F.size(ws)
    bi = (
        docs.filter(n >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(ws, F.lit(1), n - 1).alias("w1"),
                    F.slice(ws, F.lit(2), n - 1).alias("w2"),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        # model build + scoring join both read the bigram stream —
        # checkpoint so the zip/explode pass runs once
        .localCheckpoint(eager=False)
    )
    bc = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12")) \
        .localCheckpoint(eager=False)  # feeds lc AND the scoring join
    lc = bc.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        docs.select(F.explode(ws).alias("w")).agg(
            F.countDistinct("w").alias("vs")
        )
    )
    p = (F.col("c12") + 0.5) / (F.col("c1") + 0.5 * F.col("vs"))
    return (
        bi.join(bc, ["w1", "w2"])
        .join(F.broadcast(lc), "w1")
        .join(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(-F.log2(p)), 6).alias("surprisal"),
        )
    )


# --------------------------------------------------------------------------
# q164 — BPE first-merge pair counts: the opening step of byte-pair-
# encoding tokenizer training — frequency of every adjacent character
# pair within words across the corpus. One explode of (word, in-word
# position) pairs into a hash-groupBy; at 100 TB the pair vocabulary is
# tiny relative to the corpus, so the aggregation is the whole cost.
# --------------------------------------------------------------------------
@register(
    "q164_bpe_pair_counts",
    oracle=f"""
    WITH w AS (
      SELECT unnest({SQL_WORDS}) AS word FROM documents
    ), pairs AS (
      SELECT substr(word, i, 2) AS pair
      FROM w, unnest(generate_series(1, len(word) - 1)) AS t(i)
      WHERE len(word) >= 2
    )
    SELECT pair, COUNT(*) AS n
    FROM pairs GROUP BY pair HAVING COUNT(*) >= 10
    """,
)
def q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words_df = docs.select(F.explode(T.words("text")).alias("word"))
    pairs = (
        words_df.filter(F.length("word") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.col("word").substr(i, F.lit(2)),
                )
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 10)
    )


# --------------------------------------------------------------------------
# q191 — collocation mining by pointwise mutual information: adjacent
# word pairs with count >= 30, PMI = ln(N * c(xy) / (c(x)·c(y))) using
# corpus totals — the statistic tokenizer/vocab builders use to find
# multi-word units worth merging. One explode for unigrams, one
# zip_with for bigrams, equi-joins on the word keys; top-20 by (PMI,
# pair) so the output is ordering-stable.
# --------------------------------------------------------------------------
@register(
    "q191_pmi_collocations",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, {SQL_WORDS} AS w FROM documents
    ), uni AS (
      SELECT unnest(w) AS x FROM ws
    ), ucnt AS (
      SELECT x, COUNT(*) AS cx FROM uni GROUP BY x
    ), n AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM uni
    ), bi AS (
      SELECT p[1] AS x, p[2] AS y FROM (
        SELECT unnest(list_zip(list_slice(w, 1, len(w) - 1),
                               list_slice(w, 2, len(w)))) AS p
        FROM ws
      ) WHERE p[1] IS NOT NULL AND p[2] IS NOT NULL
    ), bcnt AS (
      SELECT x, y, COUNT(*) AS cxy FROM bi GROUP BY x, y
    ), scored AS (
      SELECT b.x, b.y, CAST(b.cxy AS BIGINT) AS n_pair,
             round(ln(n.n * b.cxy / (ux.cx * uy.cx)), 6) AS pmi
      FROM bcnt b
      JOIN ucnt ux ON b.x = ux.x
      JOIN ucnt uy ON b.y = uy.x
      CROSS JOIN n
      WHERE b.cxy >= 30
    )
    SELECT x, y, n_pair, pmi FROM (
      SELECT *, row_number() OVER (ORDER BY pmi DESC, x ASC, y ASC) AS rk
      FROM scored
    ) WHERE rk <= 20
    """,
)
def q191(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    ws = docs.select(T.words("text").alias("w")).localCheckpoint(
        eager=False)  # unigram + bigram explodes both read it
    uni = ws.select(F.explode("w").alias("x"))
    ucnt = uni.groupBy("x").agg(F.count("*").alias("cx")) \
        .localCheckpoint(eager=False)  # joined as both ux and uy
    n = uni.agg(F.count("*").cast("double").alias("n"))
    pairs = ws.select(
        F.explode(
            F.zip_with(
                F.slice("w", 1, F.greatest(F.size("w") - 1, F.lit(0))),
                F.slice("w", 2, F.greatest(F.size("w") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("x"), b.alias("y")),
            )
        ).alias("p")
    ).select("p.x", "p.y").filter(
        F.col("x").isNotNull() & F.col("y").isNotNull())
    bcnt = pairs.groupBy("x", "y").agg(F.count("*").alias("cxy")).filter(
        F.col("cxy") >= 30)
    ux = ucnt.select(F.col("x"), F.col("cx").alias("cx_x"))
    uy = ucnt.select(F.col("x").alias("y"), F.col("cx").alias("cx_y"))
    scored = (
        bcnt.join(F.broadcast(ux), "x").join(F.broadcast(uy), "y")
        .crossJoin(F.broadcast(n))
        .select(
            "x", "y", F.col("cxy").cast("bigint").alias("n_pair"),
            F.round(F.log(F.col("n") * F.col("cxy")
                          / (F.col("cx_x") * F.col("cx_y"))), 6)
            .alias("pmi"),
        )
    )
    w = Window.orderBy(F.col("pmi").desc(), F.col("x").asc(),
                       F.col("y").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20).drop("rk")
    )


# --------------------------------------------------------------------------
# q206 — distribution divergence per source: KL(source-length-histogram
# || global-length-histogram) over 50-char buckets — the drift score
# that flags a crawler whose documents stopped looking like the corpus.
# Histograms are value-domain-sized aggregations; KL is a fold over the
# post-aggregation (source x bucket) table.
# --------------------------------------------------------------------------
@register(
    "q206_source_kl_divergence",
    oracle="""
    WITH b AS (
      SELECT source, n_chars // 50 AS bucket, COUNT(*) AS n
      FROM documents GROUP BY source, n_chars // 50
    ), st AS (
      SELECT source, SUM(n) AS ns FROM b GROUP BY source
    ), g AS (
      SELECT bucket, SUM(n) AS ng FROM b GROUP BY bucket
    ), gt AS (
      SELECT SUM(n) AS nt FROM b
    )
    SELECT b.source,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           round(SUM((b.n / CAST(st.ns AS DOUBLE))
                     * ln((b.n / CAST(st.ns AS DOUBLE))
                          / (g.ng / CAST(gt.nt AS DOUBLE)))), 6) AS kl
    FROM b
    JOIN st ON b.source = st.source
    JOIN g ON b.bucket = g.bucket
    CROSS JOIN gt
    GROUP BY b.source
    """,
)
def q206(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    b = docs.groupBy(
        "source", (F.col("n_chars") / 50).cast("long").alias("bucket")
    ).agg(F.count("*").alias("n")).localCheckpoint(
        eager=False)  # referenced four times (st, g, gt, final join)
    st = b.groupBy("source").agg(F.sum("n").alias("ns"))
    g = b.groupBy("bucket").agg(F.sum("n").alias("ng"))
    gt = b.agg(F.sum("n").alias("nt"))
    p = F.col("n") / F.col("ns").cast("double")
    q = F.col("ng") / F.col("nt").cast("double")
    return (
        b.join(F.broadcast(st), "source")
        .join(F.broadcast(g), "bucket")
        .crossJoin(F.broadcast(gt))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_buckets"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl"),
        )
    )


# --------------------------------------------------------------------------
# q207 — vocabulary coverage scoring: share of each document's tokens
# that fall in the top-1000 corpus vocabulary (count-desc, token-asc
# ties) — the OOV-rate filter that predicts tokenizer efficiency per
# document. The vocab is a broadcast dimension; the per-doc pass is
# explode + broadcast join + ratio aggregation.
# --------------------------------------------------------------------------
@register(
    "q207_vocab_coverage",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang, unnest({SQL_WORDS}) AS word FROM documents
    ), vocab AS (
      SELECT word FROM (
        SELECT word, row_number() OVER (
          ORDER BY COUNT(*) DESC, word ASC) AS rk
        FROM w GROUP BY word
      ) WHERE rk <= 1000
    ), per_doc AS (
      SELECT w.doc_id, w.lang,
             COUNT(*) AS n_tok,
             SUM(CASE WHEN v.word IS NOT NULL THEN 1 ELSE 0 END) AS n_in
      FROM w LEFT JOIN vocab v ON w.word = v.word
      GROUP BY w.doc_id, w.lang
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(AVG(n_in / CAST(n_tok AS DOUBLE)), 6) AS avg_coverage,
           round(MIN(n_in / CAST(n_tok AS DOUBLE)), 6) AS min_coverage
    FROM per_doc GROUP BY lang
    """,
)
def q207(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", "lang", F.explode(T.words("text")).alias("word")
    ).localCheckpoint(eager=False)  # vocab build + coverage join
    # top-k via orderBy+limit = TakeOrdered (per-partition partial top-k
    # merged on the driver) — a web-scale vocabulary never funnels
    # through a single-partition ranking window
    vocab = (
        w.groupBy("word").agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(1000)
        .select("word").withColumn("_v", F.lit(1))
    )
    per_doc = (
        w.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("n_tok"),
             F.sum(F.coalesce(F.col("_v"), F.lit(0))).alias("n_in"))
    )
    cov = F.col("n_in") / F.col("n_tok").cast("double")
    return per_doc.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(F.avg(cov), 6).alias("avg_coverage"),
        F.round(F.min(cov), 6).alias("min_coverage"),
    )


# --------------------------------------------------------------------------
# q216 — per-document character entropy: H = -sum p_c log2 p_c over the
# doc's character distribution — the cheap gibberish/boilerplate signal
# (low H = repeated filler, high H = encrypted/binary junk) most corpus
# quality stacks compute next to q33's ratios. Shape: explode to
# (doc_id, char) pairs, two hash aggregations, all JVM-side; the
# explode is data-local (fan-out = doc length) and the result stream is
# doc-sized. Entropy arithmetic is replayed term-for-term in SQL with
# the same log2/round discipline as q158.
# --------------------------------------------------------------------------
@register(
    "q216_char_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
    ), freq AS (
      SELECT doc_id, c, COUNT(*) AS n FROM ch GROUP BY doc_id, c
    ), tot AS (
      SELECT doc_id, SUM(n) AS total, COUNT(*) AS n_distinct
      FROM freq GROUP BY doc_id
    )
    SELECT f.doc_id,
           CAST(t.n_distinct AS BIGINT) AS n_distinct_chars,
           round(-SUM((n / CAST(total AS DOUBLE))
                      * log2(n / CAST(total AS DOUBLE))), 6) AS entropy
    FROM freq f JOIN tot t ON f.doc_id = t.doc_id
    GROUP BY f.doc_id, t.n_distinct
    """,
)
def q216(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    freq = (
        docs.select(
            "doc_id",
            F.explode(F.split("text", "")).alias("c"),
        )
        .groupBy("doc_id", "c")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)  # totals + entropy join
    )
    tot = freq.groupBy("doc_id").agg(
        F.sum("n").alias("total"),
        F.count("*").alias("n_distinct"),
    )
    p = F.col("n") / F.col("total").cast("double")
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id", "n_distinct")
        .agg(F.round(-F.sum(p * F.log2(p)), 6).alias("entropy"))
        .select(
            "doc_id",
            F.col("n_distinct").cast("bigint").alias("n_distinct_chars"),
            "entropy",
        )
    )


# --------------------------------------------------------------------------
# q383 — UNIGRAM-LM TOKENIZER TRAINING (SentencePiece-style hard-EM):
# the third tokenizer family next to BPE (q272) and WordPiece (q329).
# Distributed EM on the word-frequency table: Viterbi E-step as an
# Arrow kernel (inventory rides as bounded closure metadata), count
# M-step as one hash agg per round, alphabet always kept, zero-count
# multi-char pieces pruned per round. The Viterbi objective is integer
# (fewest pieces, then max total piece frequency, then smallest
# segmentation string) so the oracle — which brute-force ENUMERATES
# every segmentation of every (8-char-truncated) word with a recursive
# CTE and picks the same argmin — must agree on every count exactly,
# with no float-log drift. Closes VERDICT r5 gap #4.
# --------------------------------------------------------------------------
_UNI_SEED = 40


def _unigram_cte_prefix() -> str:
    viterbi_pick = ("row_number() OVER (PARTITION BY word "
                    "ORDER BY np ASC, fs DESC, seg ASC)")
    return f"""
    WITH RECURSIVE w0 AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT substr(lower(w), 1, 8) AS word
        FROM (SELECT unnest({SQL_WORDS}) AS w FROM documents)
        WHERE regexp_full_match(w, '[A-Za-z]+') AND len(w) >= 2
      ) GROUP BY word
    ),
    subs AS MATERIALIZED (
      SELECT piece, SUM(cnt) AS freq FROM (
        SELECT substr(word, g.i, l.l) AS piece, cnt
        FROM w0, (VALUES (1),(2),(3),(4)) l(l),
             LATERAL (SELECT unnest(generate_series(
                        1, len(word) - l.l + 1)) AS i) g
        WHERE len(word) >= l.l
      ) GROUP BY piece
    ),
    p1 AS MATERIALIZED (
      SELECT piece, freq FROM subs WHERE len(piece) = 1
      UNION ALL
      SELECT piece, freq FROM (
        SELECT piece, freq FROM subs WHERE len(piece) > 1
        ORDER BY freq DESC, piece ASC LIMIT {_UNI_SEED})
    ),
    paths1 AS (
      SELECT word, cnt, 0 AS pos, 0 AS np,
             CAST(0 AS BIGINT) AS fs, '' AS seg FROM w0
      UNION ALL
      SELECT t.word, t.cnt, t.pos + len(p.piece), t.np + 1,
             t.fs + p.freq, t.seg || '|' || p.piece
      FROM paths1 t JOIN p1 p
        ON substr(t.word, t.pos + 1, len(p.piece)) = p.piece
      WHERE t.pos < len(t.word)
    ),
    seg1 AS MATERIALIZED (
      SELECT word, cnt, seg FROM (
        SELECT word, cnt, seg, {viterbi_pick} AS rn
        FROM paths1 WHERE pos = len(word)) WHERE rn = 1
    ),
    c1 AS MATERIALIZED (
      SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
        SELECT unnest(list_filter(string_split(seg, '|'),
                                  x -> x != '')) AS piece, cnt
        FROM seg1) GROUP BY piece
    ),
    p2 AS MATERIALIZED (
      SELECT p.piece, COALESCE(c.cnt, 0) AS freq
      FROM p1 p LEFT JOIN c1 c USING (piece)
      WHERE len(p.piece) = 1 OR COALESCE(c.cnt, 0) > 0
    ),
    paths2 AS (
      SELECT word, cnt, 0 AS pos, 0 AS np,
             CAST(0 AS BIGINT) AS fs, '' AS seg FROM w0
      UNION ALL
      SELECT t.word, t.cnt, t.pos + len(p.piece), t.np + 1,
             t.fs + p.freq, t.seg || '|' || p.piece
      FROM paths2 t JOIN p2 p
        ON substr(t.word, t.pos + 1, len(p.piece)) = p.piece
      WHERE t.pos < len(t.word)
    ),
    seg2 AS MATERIALIZED (
      SELECT word, cnt, seg FROM (
        SELECT word, cnt, seg, {viterbi_pick} AS rn
        FROM paths2 WHERE pos = len(word)) WHERE rn = 1
    ),
    c2 AS MATERIALIZED (
      SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
        SELECT unnest(list_filter(string_split(seg, '|'),
                                  x -> x != '')) AS piece, cnt
        FROM seg2) GROUP BY piece
    )
    SELECT 1 AS _prefix_end
    """


def _unigram_oracle() -> str:
    return _unigram_cte_prefix().replace(
        "SELECT 1 AS _prefix_end", """
    SELECT * FROM (
      SELECT CAST(1 AS INT) AS round, p.piece,
             CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
      FROM p1 p LEFT JOIN c1 c USING (piece)
      WHERE len(p.piece) = 1 OR COALESCE(c.cnt, 0) > 0
      UNION ALL
      SELECT CAST(2 AS INT) AS round, p.piece,
             CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
      FROM p2 p LEFT JOIN c2 c USING (piece)
      WHERE len(p.piece) = 1 OR COALESCE(c.cnt, 0) > 0
    ) ORDER BY round, piece
    """)


def _unigram_apply_oracle() -> str:
    """Training prefix + a THIRD Viterbi pass under the final
    inventory, joined back to per-doc word occurrences."""
    viterbi_pick = ("row_number() OVER (PARTITION BY word "
                    "ORDER BY np ASC, fs DESC, seg ASC)")
    tail = f"""
    , p3 AS MATERIALIZED (
      SELECT p.piece, COALESCE(c.cnt, 0) AS freq
      FROM p2 p LEFT JOIN c2 c USING (piece)
      WHERE len(p.piece) = 1 OR COALESCE(c.cnt, 0) > 0
    ),
    paths3 AS (
      SELECT word, 0 AS pos, 0 AS np,
             CAST(0 AS BIGINT) AS fs, '' AS seg FROM w0
      UNION ALL
      SELECT t.word, t.pos + len(p.piece), t.np + 1,
             t.fs + p.freq, t.seg || '|' || p.piece
      FROM paths3 t JOIN p3 p
        ON substr(t.word, t.pos + 1, len(p.piece)) = p.piece
      WHERE t.pos < len(t.word)
    ),
    seg3 AS MATERIALIZED (
      SELECT word, np FROM (
        SELECT word, np, {viterbi_pick} AS rn
        FROM paths3 WHERE pos = len(word)) WHERE rn = 1
    ),
    occ AS (
      SELECT doc_id, substr(lower(w), 1, 8) AS word
      FROM (SELECT doc_id, unnest({SQL_WORDS}) AS w FROM documents)
      WHERE regexp_full_match(w, '[A-Za-z]+') AND len(w) >= 2
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(np) AS BIGINT) AS n_pieces,
           CAST(SUM(len(word)) AS BIGINT) AS n_chars,
           CAST(SUM(len(word)) - SUM(np) AS BIGINT) AS chars_saved
    FROM occ JOIN seg3 USING (word)
    GROUP BY doc_id ORDER BY doc_id
    """
    return _unigram_cte_prefix().replace(
        "SELECT 1 AS _prefix_end", tail)


@register("q383_unigram_train", oracle=_unigram_oracle())
def q383(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.unigram_train(
        load(spark, sf_dir, "documents"), n_seed=_UNI_SEED, rounds=2)


# --------------------------------------------------------------------------
# q388 — UNIGRAM-LM APPLY (the tokenize side of q383, completing the
# train/apply symmetry BPE has with q272/q229): the trained inventory
# segments every word OCCURRENCE. Scale shape: Viterbi runs once over
# the distinct-word table; the corpus-side expansion is a broadcast
# equi-join of exploded words against the word->n_pieces map + one
# hash agg by doc. Oracle = the q383 training CTEs plus a third
# recursive segmentation pass under the final inventory, joined back
# to per-doc occurrences — token counts exact per document.
# --------------------------------------------------------------------------


@register("q388_unigram_apply", oracle=_unigram_apply_oracle())
def q388(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.unigram_apply(
        load(spark, sf_dir, "documents"), n_seed=_UNI_SEED, rounds=2)


# --------------------------------------------------------------------------
# q229 — BPE MERGE APPLICATION: tokenize with a FIXED ranked merge
# table (the apply side of BPE; q164 computes the pair counts that
# train it). Each word becomes a space-separated char sequence; merges
# apply in rank order, each exhaustively left-to-right — exactly
# replace-all semantics, which both engines implement identically, so
# the whole tokenizer is JVM-side nested replace() calls in one
# codegen stage. Output: the top-20 resulting subword tokens by
# frequency (TakeOrdered).
# --------------------------------------------------------------------------
_BPE_MERGES = [("e", "r"), ("t", "h"), ("i", "n"), ("a", "n"), ("an", "d")]


@register(
    "q229_bpe_apply",
    oracle=f"""
    WITH w AS (
      SELECT unnest({SQL_WORDS}) AS word FROM documents
    ), seq AS (
      SELECT {"".join(
          f"replace(" for _ in _BPE_MERGES
      )}array_to_string(string_split(word, ''), ' '){"".join(
          f", '{a} {b}', '{a}{b}')" for a, b in _BPE_MERGES
      )} AS toks
      FROM w
    ), t AS (
      SELECT unnest(string_split(toks, ' ')) AS token FROM seq
    )
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM t WHERE token != ''
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
)
def q229(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = docs.select(F.explode(T.words("text")).alias("word"))
    toks = F.array_join(F.split(F.col("word"), ""), " ")
    for a, b in _BPE_MERGES:
        toks = F.replace(toks, F.lit(f"{a} {b}"), F.lit(f"{a}{b}"))
    return (
        words.select(F.explode(F.split(toks, " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


# --------------------------------------------------------------------------
# q256 — T5-STYLE SPAN CORRUPTION: the masked-span (inputs, targets)
# pair construction behind every encoder-decoder pretraining pipeline
# (T5 §3.1.4 "replace corrupted spans"). Mask decision is a
# deterministic hash on (doc_id, pos//3) — ~20% of 3-token blocks —
# consecutive masked blocks merge into one span; spans are numbered
# sequentially per doc and rendered as <extra_id_K> sentinels in the
# inputs, with the removed tokens echoed after their sentinel in the
# targets. Plan shape: posexplode -> ONE shuffle on doc_id (running
# span count + order-safe re-assembly via sorted struct collect) —
# docs are independent, so the shuffle keys are perfectly parallel at
# any corpus size. The oracle rebuilds the exact strings with
# window + ordered string_agg; both sides emit identical bytes.
# --------------------------------------------------------------------------
@register(
    "q256_span_corruption",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(generate_series(1, len(string_split(text, ' ')))) - 1
               AS pos,
             unnest(string_split(text, ' ')) AS word
      FROM documents
    ), m AS (
      SELECT doc_id, pos, word,
             ({md5_int64_sql(
                 "CAST(doc_id AS VARCHAR) || '/' || CAST(pos // 3 AS VARCHAR)"
             )}) % 5 = 0 AS masked
      FROM toks
    ), sp AS (
      SELECT doc_id, pos, word, masked,
             CASE WHEN masked AND NOT COALESCE(
               LAG(masked) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)
             THEN 1 ELSE 0 END AS span_start
      FROM m
    ), sid AS (
      SELECT doc_id, pos, word, masked, span_start,
             SUM(span_start) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
      FROM sp
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(span_start) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
             AS n_masked,
           COALESCE(string_agg(
             CASE WHEN NOT masked THEN word
                  WHEN span_start = 1
                  THEN '<extra_id_' || CAST(sid - 1 AS VARCHAR) || '>'
             END, ' ' ORDER BY pos), '') AS inputs,
           COALESCE(string_agg(
             CASE WHEN span_start = 1
                  THEN '<extra_id_' || CAST(sid - 1 AS VARCHAR) || '> '
                       || word
                  WHEN masked THEN word
             END, ' ' ORDER BY pos), '') AS targets
    FROM sid
    GROUP BY doc_id
    """,
)
def q256(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_int64

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " "))
        .alias("pos", "word"))
    masked = md5_int64(F.concat(
        F.col("doc_id").cast("string"), F.lit("/"),
        F.floor(F.col("pos") / 3).cast("long").cast("string"))) % 5 == 0
    m = toks.select("doc_id", "pos", "word", masked.alias("masked"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    sp = m.withColumn(
        "span_start",
        F.when(F.col("masked")
               & ~F.coalesce(F.lag("masked").over(w), F.lit(False)),
               1).otherwise(0))
    sid = sp.withColumn("sid", F.sum("span_start").over(w))
    sentinel = F.concat(
        F.lit("<extra_id_"), (F.col("sid") - 1).cast("string"), F.lit(">"))
    in_piece = (
        F.when(~F.col("masked"), F.col("word"))
        .when(F.col("span_start") == 1, sentinel)
    )
    tgt_piece = (
        F.when(F.col("span_start") == 1,
               F.concat(sentinel, F.lit(" "), F.col("word")))
        .when(F.col("masked"), F.col("word"))
    )

    def ordered_join(piece):
        # order-safe string agg: collect (pos, piece) structs, sort by
        # pos, drop nulls, join — deterministic under any shuffle order
        arr = F.array_sort(F.collect_list(F.struct("pos", piece.alias("p"))))
        return F.array_join(
            F.filter(F.transform(arr, lambda s: s["p"]),
                     lambda x: x.isNotNull()), " ")

    return sid.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum("span_start").cast("bigint").alias("n_spans"),
        F.sum(F.col("masked").cast("int")).cast("bigint").alias("n_masked"),
        ordered_join(in_piece).alias("inputs"),
        ordered_join(tgt_piece).alias("targets"),
    )


# --------------------------------------------------------------------------
# q260 — HASHED LINEAR CLASSIFIER INFERENCE (the fastText-style quality
# scorer run over a whole corpus): words hash into 32 feature buckets
# (the hashing trick — vocabulary-free, so the plan is identical at any
# corpus size) and the doc score is the sum of per-word bucket weights,
# i.e. Σ_j tf_j·w_j without materializing the tf vector: one explode +
# one doc_id hash agg, weights inlined as a 32-literal array lookup —
# model inference with NO UDF and no model state beyond literals.
# DETERMINISM: weights are SIXTEENTHS (dyadic), so every partial sum is
# exact and the score is bit-identical in any reduction order; the
# label threshold is exact comparison, not sigmoid.
# --------------------------------------------------------------------------
_HASH_BUCKETS = 32
_LINEAR_W = [((j * 37 + 11) % 21 - 10) / 16.0 for j in range(_HASH_BUCKETS)]


@register(
    "q260_hashed_classifier",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                        x -> x != '')) AS word
      FROM documents
    )
    SELECT doc_id,
           CAST(SUM(([{', '.join(str(x) for x in _LINEAR_W)}]::DOUBLE[])[
             CAST(({md5_int64_sql('word')}) % {_HASH_BUCKETS} AS INT) + 1
           ]) AS DOUBLE) AS score,
           CASE WHEN SUM(([{', '.join(str(x) for x in _LINEAR_W)}]::DOUBLE[])[
             CAST(({md5_int64_sql('word')}) % {_HASH_BUCKETS} AS INT) + 1
           ]) > 0 THEN 1 ELSE 0 END AS label
    FROM w GROUP BY doc_id
    """,
)
def q260(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_int64

    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(F.filter(F.split(F.col("text"), " "),
                           lambda x: x != "")).alias("word"))
    warr = F.array(*[F.lit(x) for x in _LINEAR_W])
    wt = F.element_at(
        warr, (md5_int64(F.col("word")) % _HASH_BUCKETS).cast("int") + 1)
    return words.groupBy("doc_id").agg(
        F.sum(wt).alias("score"),
        F.when(F.sum(wt) > 0, 1).otherwise(0).alias("label"),
    )


# --------------------------------------------------------------------------
# q272 — BPE MERGE LEARNING (the train side; q164 = first-step pair
# counts, q229 = apply side — this closes the tokenizer loop): 4
# iterations of argmax-pair + canonical left-to-right merge over the
# word-frequency table (text.py::bpe_train — vocab-sized iterations, a
# Catalyst HOF fold applies each merge, one collected argmax row per
# iteration = bounded metadata, the q160 k-means discipline). The
# oracle unrolls the SAME 4 iterations as chained MATERIALIZED CTEs
# (the q181 lesson: scalar subqueries re-evaluate non-materialized
# CTEs exponentially), applying each merge with delimiter-string
# replace() — whose left-to-right non-overlapping scan is exactly the
# BPE merge rule — so engine and oracle implement the algorithm by two
# INDEPENDENT mechanisms and must agree on every merge, count, and
# post-merge corpus token total.
# --------------------------------------------------------------------------
_BPE_N_MERGES = 4


def _bpe_oracle(n_merges: int) -> str:
    # v0: word-frequency vocab; token sequence as '|p1||p2||...|'
    ctes = [f"""v0 AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
             substr('|' || regexp_replace(word, '(.)', '\\1||', 'g'),
                    1, 3 * len(word)) AS s
      FROM (SELECT lower(w) AS word
            FROM (SELECT unnest({SQL_WORDS}) AS w FROM documents)
            WHERE regexp_full_match(w, '[A-Za-z]+') AND len(w) >= 2)
      GROUP BY word
    )"""]
    for i in range(1, n_merges + 1):
        p = i - 1
        ctes.append(f"""c{i} AS MATERIALIZED (
      SELECT toks[g.i] AS p1, toks[g.i + 1] AS p2, SUM(cnt) AS n
      FROM (SELECT cnt,
                   list_filter(string_split(s, '|'), x -> x != '') AS toks
            FROM v{p}) t,
           unnest(generate_series(1, len(toks) - 1)) AS g(i)
      GROUP BY 1, 2
    )""")
        ctes.append(f"""m{i} AS MATERIALIZED (
      SELECT p1, p2, CAST(n AS BIGINT) AS n
      FROM c{i} ORDER BY n DESC, p1, p2 LIMIT 1
    )""")
        ctes.append(f"""v{i} AS MATERIALIZED (
      SELECT word, cnt,
             replace(s,
                     '|' || (SELECT p1 FROM m{i}) || '||'
                         || (SELECT p2 FROM m{i}) || '|',
                     '|' || (SELECT p1 FROM m{i})
                         || (SELECT p2 FROM m{i}) || '|') AS s
      FROM v{p}
    )""")
    selects = [
        f"""SELECT CAST({i} AS INT) AS it, (SELECT p1 FROM m{i}) AS p1,
           (SELECT p2 FROM m{i}) AS p2, (SELECT n FROM m{i}) AS n,
           (SELECT CAST(SUM(len(list_filter(string_split(s, '|'),
                                            x -> x != '')) * cnt)
                        AS BIGINT) FROM v{i}) AS total_tokens"""
        for i in range(1, n_merges + 1)
    ]
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(selects) + "\nORDER BY it")


@register("q272_bpe_train", oracle=_bpe_oracle(_BPE_N_MERGES))
def q272(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.bpe_train(
        load(spark, sf_dir, "documents"), n_merges=_BPE_N_MERGES)


# --------------------------------------------------------------------------
# q282 — VOCABULARY COVERAGE / OOV RATE: fixed vocab = the corpus's
# top-500 words (count DESC, word ASC — total deterministic order);
# per-language coverage = fraction of word OCCURRENCES outside the
# vocab, the tokenizer-fit metric a multilingual data plan checks
# before committing a vocab budget. Scale shape: the vocab is
# value-domain-sized and broadcast; coverage is one fact-scale hash
# agg over the exploded words with a broadcast LEFT join — integers
# until one final division per language.
# --------------------------------------------------------------------------
_VOCAB_TOP = 500


@register(
    "q282_oov_rate",
    oracle=f"""
    WITH ex AS (
      SELECT lang, lower(w) AS w
      FROM (SELECT lang, unnest({SQL_WORDS}) AS w FROM documents) t
      WHERE w != ''
    ), vocab AS (
      SELECT w FROM (
        SELECT lower(w) AS w, COUNT(*) AS c
        FROM (SELECT unnest({SQL_WORDS}) AS w FROM documents) t
        WHERE w != '' GROUP BY 1
      ) s ORDER BY c DESC, w ASC LIMIT {_VOCAB_TOP}
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           round(CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS oov_rate
    FROM ex LEFT JOIN vocab v USING (w)
    GROUP BY lang ORDER BY lang
    """,
)
def q282(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ex = (
        docs.select("lang", F.explode(T.words("text")).alias("w"))
        .filter(F.col("w") != "")
        .select("lang", F.lower("w").alias("w"))
    )
    vocab = (
        ex.groupBy("w").agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(_VOCAB_TOP)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    return (
        ex.join(F.broadcast(vocab), "w", "left")
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n_tokens"),
             F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
             .cast("bigint").alias("n_oov"))
        .select("lang", "n_tokens", "n_oov",
                F.round(F.col("n_oov").cast("double")
                        / F.col("n_tokens").cast("double"), 6)
                  .alias("oov_rate"))
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# q293 — TOKENIZER FERTILITY per language (tokens per word after the
# q229 BPE merges): the multilingual-fairness metric a tokenizer
# evaluation reports — languages whose words shatter into more pieces
# pay more context budget per sentence. Same merge application as
# q229 (string replace chain = canonical left-to-right merge rule);
# per-lang word and token counts are integers, fertility is ONE
# division. Map-only until the languages-sized agg.
# --------------------------------------------------------------------------
@register(
    "q293_tokenizer_fertility",
    oracle=f"""
    WITH w AS (
      SELECT lang, unnest({SQL_WORDS}) AS word FROM documents
    ), seq AS (
      SELECT lang, word, {"".join(
          "replace(" for _ in _BPE_MERGES
      )}array_to_string(string_split(word, ''), ' '){"".join(
          f", '{a} {b}', '{a}{b}')" for a, b in _BPE_MERGES
      )} AS toks
      FROM w WHERE word != ''
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(list_filter(string_split(toks, ' '),
                                    x -> x != ''))) AS BIGINT) AS n_tokens,
           round(CAST(SUM(len(list_filter(string_split(toks, ' '),
                                          x -> x != ''))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS fertility
    FROM seq GROUP BY lang ORDER BY lang
    """,
)
def q293(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "lang", F.explode(T.words("text")).alias("word")
    ).filter(F.col("word") != "")
    toks = F.array_join(F.split(F.col("word"), ""), " ")
    for a, b in _BPE_MERGES:
        toks = F.replace(toks, F.lit(f"{a} {b}"), F.lit(f"{a}{b}"))
    n_tok = F.size(F.filter(F.split(toks, " "), lambda x: x != ""))
    return (
        words.select("lang", n_tok.alias("nt"))
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n_words"),
             F.sum("nt").cast("bigint").alias("n_tokens"))
        .select("lang", "n_words", "n_tokens",
                F.round(F.col("n_tokens").cast("double")
                        / F.col("n_words").cast("double"), 6)
                  .alias("fertility"))
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# q303 — ZIPF RANK-FREQUENCY SLOPE: the corpus-health diagnostic (a
# natural corpus fits log f ~ -1 * log r; synthetic/spammy text
# doesn't). Word counts are one shrinking hash agg; the OLS fit runs
# over the TOP-100 frequencies only — fetched with TakeOrdered (per-
# partition top-k, no global sort), ranked by a window over that
# bounded 100-row table (exempted), with ln/products as scalar
# expressions. vocab_size / total_tokens stay exact integers from the
# full count table. Slope/intercept/r2 are fixed-order expressions over
# 100-term sums, rounded 6 dp (libm ln may differ in the last ulp).
# --------------------------------------------------------------------------
@register(
    "q303_zipf_slope",
    oracle="""
    WITH w AS (
      SELECT unnest(list_filter(
               regexp_split_to_array(lower(text), '[^a-z]+'),
               x -> x != '')) AS w
      FROM documents
    ), wc AS (
      SELECT w, COUNT(*) AS f FROM w GROUP BY w
    ), tot AS (
      SELECT COUNT(*) AS vocab, SUM(f) AS toks FROM wc
    ), top AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, w ASC) AS r
      FROM wc ORDER BY f DESC, w ASC LIMIT 100
    ), s AS (
      SELECT COUNT(*) AS n,
             SUM(ln(r)) AS sx, SUM(ln(f)) AS sy,
             SUM(ln(r) * ln(f)) AS sxy,
             SUM(ln(r) * ln(r)) AS sxx,
             SUM(ln(f) * ln(f)) AS syy
      FROM top
    )
    SELECT CAST(vocab AS BIGINT) AS vocab_size,
           CAST(toks AS BIGINT) AS total_tokens,
           CAST(n AS BIGINT) AS n_fit,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n, 6) AS intercept,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s, tot
    """,
)
def q303(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = docs.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w")
    ).filter(F.col("w") != "")
    wc = w.groupBy("w").agg(F.count("*").alias("f")).localCheckpoint(
        eager=False)  # totals + top-100 both read it
    tot = wc.agg(F.count("*").alias("vocab"), F.sum("f").alias("toks"))
    top = wc.orderBy(F.col("f").desc(), F.col("w").asc()).limit(100)
    wr = Window.orderBy(F.col("f").desc(), F.col("w").asc())
    ranked = top.select("f", F.row_number().over(wr).alias("r"))
    lr, lf = F.log(F.col("r").cast("double")), F.log(F.col("f").cast("double"))
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum(lr).alias("sx"), F.sum(lf).alias("sy"),
        F.sum(lr * lf).alias("sxy"),
        F.sum(lr * lr).alias("sxx"),
        F.sum(lf * lf).alias("syy"))
    n = F.col("n").cast("double")
    sx, sy = F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return (
        s.crossJoin(F.broadcast(tot))
        .select(
            F.col("vocab").cast("bigint").alias("vocab_size"),
            F.col("toks").cast("bigint").alias("total_tokens"),
            F.col("n").cast("bigint").alias("n_fit"),
            F.round(slope, 6).alias("slope"),
            F.round((sy - slope * sx) / n, 6).alias("intercept"),
            F.round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
            .alias("r2"))
    )


# --------------------------------------------------------------------------
# q308 — TRIGRAM STUPID-BACKOFF scoring (Brants et al. 2007, the
# web-scale LM that deliberately drops normalization): the model is
# built from the ODD docs and scores the held-out EVEN docs, so unseen
# trigrams genuinely exercise the backoff chain
#   S(w3|w1w2) = c123/c12            if c123 > 0
#              = 0.4 * c23/c2        elif c23 > 0
#              = 0.16 * (c3+0.5)/(N+0.5V)   otherwise (add-0.5 floor)
# Scale shape: the model tables are corpus aggregates joined back by
# n-gram key (LEFT equi-joins — the trigram table is the big side,
# shuffled once); nothing scans the vocabulary per doc. Every branch
# is a ratio of exact integers; per-doc mean -log2 rounds 6 (the q158
# discipline).
# --------------------------------------------------------------------------
@register(
    "q308_stupid_backoff",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {SQL_WORDS} AS ws FROM documents
    ), tri AS (
      SELECT doc_id, p[1] AS w1, p[2] AS w2, p[3] AS w3 FROM (
        SELECT doc_id,
               unnest(list_zip(list_slice(ws, 1, len(ws) - 2),
                               list_slice(ws, 2, len(ws) - 1),
                               list_slice(ws, 3, len(ws)))) AS p
        FROM w WHERE len(ws) >= 3)
    ), train3 AS (
      SELECT w1, w2, w3, COUNT(*) AS c123 FROM tri
      WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3
    ), train2 AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM (
        SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM (
          SELECT doc_id,
                 unnest(list_zip(list_slice(ws, 1, len(ws) - 1),
                                 list_slice(ws, 2, len(ws)))) AS p
          FROM w WHERE len(ws) >= 2)
      ) WHERE doc_id % 2 = 1 GROUP BY 1, 2
    ), train1 AS (
      SELECT w, COUNT(*) AS c1 FROM (
        SELECT doc_id, unnest(ws) AS w FROM w
      ) WHERE doc_id % 2 = 1 GROUP BY 1
    ), nv AS (
      SELECT SUM(c1) AS n_tok, COUNT(*) AS v FROM train1
    ), held AS (
      SELECT t.doc_id, t.w1, t.w2, t.w3,
             t3.c123, b12.c12, b23.c12 AS c23, u2.c1 AS c2, u3.c1 AS c3
      FROM tri t
      LEFT JOIN train3 t3 USING (w1, w2, w3)
      LEFT JOIN train2 b12 ON b12.w1 = t.w1 AND b12.w2 = t.w2
      LEFT JOIN train2 b23 ON b23.w1 = t.w2 AND b23.w2 = t.w3
      LEFT JOIN train1 u2 ON u2.w = t.w2
      LEFT JOIN train1 u3 ON u3.w = t.w3
      WHERE t.doc_id % 2 = 0
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(SUM(CASE WHEN c123 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_backoff,
           round(AVG(-log2(
             CASE WHEN c123 IS NOT NULL
                  THEN CAST(c123 AS DOUBLE) / c12
                  WHEN c23 IS NOT NULL
                  THEN 0.4 * (CAST(c23 AS DOUBLE) / c2)
                  ELSE 0.16 * ((COALESCE(c3, 0) + 0.5)
                               / (n_tok + 0.5 * v))
             END)), 6) AS mean_logscore
    FROM held, nv GROUP BY doc_id ORDER BY doc_id
    """,
)
def q308(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ws = T.words("text")
    n = F.size(ws)
    tri = (
        docs.filter(n >= 3)
        .select("doc_id", F.explode(F.arrays_zip(
            F.slice(ws, F.lit(1), n - 2).alias("w1"),
            F.slice(ws, F.lit(2), n - 2).alias("w2"),
            F.slice(ws, F.lit(3), n - 2).alias("w3"))).alias("p"))
        .select("doc_id", "p.w1", "p.w2", "p.w3")
    )
    bi = (
        docs.filter(n >= 2)
        .select("doc_id", F.explode(F.arrays_zip(
            F.slice(ws, F.lit(1), n - 1).alias("w1"),
            F.slice(ws, F.lit(2), n - 1).alias("w2"))).alias("p"))
        .select("doc_id", "p.w1", "p.w2")
    )
    uni = docs.select("doc_id", F.explode(ws).alias("w"))
    train = F.col("doc_id") % 2 == 1
    t3 = tri.filter(train).groupBy("w1", "w2", "w3").agg(
        F.count("*").alias("c123"))
    t2 = bi.filter(train).groupBy("w1", "w2").agg(
        F.count("*").alias("c12"))
    t1 = uni.filter(train).groupBy("w").agg(F.count("*").alias("c1"))
    nv = t1.agg(F.sum("c1").alias("n_tok"), F.count("*").alias("v"))
    held = (
        tri.filter(F.col("doc_id") % 2 == 0)
        .join(t3, ["w1", "w2", "w3"], "left")
        .join(t2, ["w1", "w2"], "left")
        .join(t2.select(F.col("w1").alias("w2"), F.col("w2").alias("w3"),
                        F.col("c12").alias("c23")), ["w2", "w3"], "left")
        .join(F.broadcast(t1.select(F.col("w").alias("w2"),
                                    F.col("c1").alias("c2"))),
              "w2", "left")
        .join(F.broadcast(t1.select(F.col("w").alias("w3"),
                                    F.col("c1").alias("c3"))),
              "w3", "left")
        .crossJoin(F.broadcast(nv))
    )
    score = (
        F.when(F.col("c123").isNotNull(),
               F.col("c123").cast("double") / F.col("c12"))
        .when(F.col("c23").isNotNull(),
              F.lit(0.4) * (F.col("c23").cast("double") / F.col("c2")))
        .otherwise(F.lit(0.16)
                   * ((F.coalesce(F.col("c3"), F.lit(0)) + F.lit(0.5))
                      / (F.col("n_tok") + F.lit(0.5) * F.col("v"))))
    )
    return (
        held.groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_trigrams"),
             F.sum(F.col("c123").isNull().cast("int")).cast("bigint")
             .alias("n_backoff"),
             F.round(F.avg(-F.log2(score)), 6).alias("mean_logscore"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q310 — POSITIONAL-INDEX PHRASE SEARCH: the inverted-index primitive
# (term -> (doc, position) postings; phrase match = equi-join of the
# two term posting lists on doc with pos2 = pos1 + 1). The query
# phrase is self-determined as the corpus's most frequent bigram
# (TakeOrdered argmax with a full tie-break — no global sort), so the
# test is data-independent yet deterministic. Scale shape: the posting
# build is explode + filter against the BROADCAST 1-row phrase —
# predicate pushdown keeps only two terms' postings; the positional
# join shuffles on doc_id. Output: per-doc match counts, exact ints.
# --------------------------------------------------------------------------
@register(
    "q310_phrase_search",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {SQL_WORDS} AS ws FROM documents
    ), bi AS (
      SELECT p[1] AS w1, p[2] AS w2 FROM (
        SELECT unnest(list_zip(list_slice(ws, 1, len(ws) - 1),
                               list_slice(ws, 2, len(ws)))) AS p
        FROM w WHERE len(ws) >= 2)
    ), phrase AS (
      SELECT w1, w2 FROM (
        SELECT w1, w2, COUNT(*) AS c FROM bi GROUP BY 1, 2
      ) ORDER BY c DESC, w1 ASC, w2 ASC LIMIT 1
    ), post AS (
      SELECT doc_id, unnest(ws) AS term,
             unnest(range(1, len(ws) + 1)) AS pos
      FROM w
    ), m AS (
      SELECT a.doc_id, a.pos
      FROM post a JOIN post b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN phrase p ON a.term = p.w1 AND b.term = p.w2
    )
    SELECT m.doc_id, p.w1, p.w2,
           CAST(COUNT(*) AS BIGINT) AS n_matches
    FROM m, phrase p GROUP BY 1, 2, 3 ORDER BY doc_id
    """,
)
def q310(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ws = T.words("text")
    n = F.size(ws)
    bi = (
        docs.filter(n >= 2)
        .select(F.explode(F.arrays_zip(
            F.slice(ws, F.lit(1), n - 1).alias("w1"),
            F.slice(ws, F.lit(2), n - 1).alias("w2"))).alias("p"))
        .select("p.w1", "p.w2")
    )
    phrase = (
        bi.groupBy("w1", "w2").agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(1).select("w1", "w2")
        .localCheckpoint(eager=False)  # 1 row; p1 and p2 both probe it
    )
    post = docs.select(
        "doc_id", F.posexplode(ws).alias("pos0", "term")
    ).localCheckpoint(eager=False)  # both position streams read it
    p1 = post.join(F.broadcast(phrase),
                   F.col("term") == F.col("w1")).select(
        "doc_id", F.col("pos0").alias("a_pos"), "w1", "w2")
    p2 = post.join(F.broadcast(phrase.select(F.col("w2").alias("_w2"))),
                   F.col("term") == F.col("_w2")).select(
        F.col("doc_id").alias("b_doc"), F.col("pos0").alias("b_pos"))
    m = p1.join(p2, (F.col("b_doc") == F.col("doc_id"))
                & (F.col("b_pos") == F.col("a_pos") + 1))
    return (
        m.groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").cast("bigint").alias("n_matches"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q316 — TRIGRAM-INDEX SUBSTRING SEARCH (the pg_trgm / code-search
# mechanism): find documents containing a needle WITHOUT scanning every
# text — candidates must hold ALL of the needle's character trigrams
# (distinct doc trigrams equi-join the broadcast needle trigrams, count
# == n_trigrams), then only candidates pay the exact contains() verify.
# The needle is self-determined (most frequent word of length >= 8,
# full tie-break) so the test tracks the corpus. The oracle is the
# BRUTE-FORCE contains() scan — a completely independent mechanism: a
# missed candidate (index bug) or a false positive surviving verify
# would mismatch. Occurrence counts via exact length arithmetic.
# --------------------------------------------------------------------------
@register(
    "q316_trigram_index_search",
    oracle=f"""
    WITH needle AS (
      SELECT w FROM (
        SELECT unnest({SQL_WORDS}) AS w FROM documents
      ) WHERE len(w) >= 8
      GROUP BY w ORDER BY COUNT(*) DESC, w ASC LIMIT 1
    )
    SELECT doc_id,
           CAST((len(text) - len(replace(text, n.w, ''))) // len(n.w)
                AS BIGINT) AS n_occurrences
    FROM documents, needle n
    WHERE contains(text, n.w)
    ORDER BY doc_id
    """,
)
def q316(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    needle = (
        docs.select(F.explode(T.words("text")).alias("w"))
        .filter(F.length("w") >= 8)
        .groupBy("w").agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(1).select(F.col("w").alias("needle"))
    )
    # Trigram-index candidacy evaluated by PROBE instead of posting-list
    # explode: a doc is a candidate iff it contains every distinct
    # needle trigram — literally the index lookup's AND-of-postings —
    # and with the needle fixed, "doc_id in posting(tri)" is exactly
    # contains(text, tri). The former formulation exploded every
    # character trigram of the corpus (~200x the corpus bytes through
    # a shuffle) to rediscover what a handful of map-side substring
    # probes answer; candidates, and therefore results, are identical.
    # The needle is a 1-row driver statistic (the repo's documented
    # bounded-collect discipline), so the probes compile to literals
    # and the whole search is ONE codegen'd pass over the corpus.
    nrow = needle.collect()  # bounded: top-1 word
    if not nrow:
        return docs.select(
            "doc_id", F.lit(0).cast("bigint").alias("n_occurrences")
        ).limit(0)
    ndl = nrow[0]["needle"]
    tris = list(dict.fromkeys(
        ndl[i:i + 3] for i in range(len(ndl) - 2)))
    cond = F.lit(True)
    for t in tris:
        cond = cond & F.contains(F.col("text"), F.lit(t))
    cand = docs.filter(cond).withColumn("needle", F.lit(ndl))
    verified = cand.filter(F.contains(F.col("text"), F.lit(ndl)))
    occ = F.floor(
        (F.length("text")
         - F.length(F.replace(F.col("text"), F.col("needle"), F.lit(""))))
        / F.length("needle")).cast("bigint")
    return (
        verified.select("doc_id", occ.alias("n_occurrences"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q329 — WORDPIECE TOKENIZATION (greedy longest-match-first, the
# BERT-family algorithm — a genuinely different tokenizer from the
# q229/q272 BPE merge family): vocab = the top-10 corpus words + every
# single character as both an initial and a '##'-continuation piece
# (the guaranteed fallback, so tokenization never fails). The engine
# tokenizes DISTINCT words only (vocab-scale, never per-occurrence):
# a set-based best_l table gives the longest vocab match for EVERY
# (word, position) — one explode over candidate lengths 1..12 + a
# vocab equi-join + max — and the greedy walk just follows best_l
# (frontier loop, <= max word length rounds, each a small join).
# Occurrence counts join back at the end. The oracle follows the same
# best_l table with a recursive CTE — an independent path-following
# mechanism. Output: pieces-per-word histogram weighted by occurrences.
# --------------------------------------------------------------------------
_WP_TOP = 10
_WP_MAXL = 12


@register(
    "q329_wordpiece",
    oracle=f"""
    WITH RECURSIVE w AS (
      SELECT unnest({SQL_WORDS}) AS word FROM documents
    ), wc AS (
      SELECT word, COUNT(*) AS n FROM w GROUP BY word
    ), top AS (
      SELECT word AS piece FROM wc
      ORDER BY n DESC, word ASC LIMIT {_WP_TOP}
    ), chars AS (
      SELECT DISTINCT unnest(list_transform(
               generate_series(1, len(word)),
               i -> substr(word, i, 1))) AS c
      FROM wc
    ), vocab AS (
      SELECT piece FROM top
      UNION SELECT c FROM chars
      UNION SELECT '##' || c FROM chars
    ), pos AS (
      SELECT word, unnest(generate_series(1, len(word))) AS p FROM wc
    ), best AS (
      SELECT pos.word, pos.p, MAX(l.l) AS best_l
      FROM pos
      JOIN generate_series(1, {_WP_MAXL}) l(l)
        ON pos.p + l.l - 1 <= len(pos.word)
      JOIN vocab v
        ON v.piece = CASE WHEN pos.p = 1
                          THEN substr(pos.word, pos.p, l.l)
                          ELSE '##' || substr(pos.word, pos.p, l.l) END
      GROUP BY pos.word, pos.p
    ), walk AS (
      SELECT word, 1 AS p, 0 AS pieces FROM wc
      UNION ALL
      SELECT w.word, w.p + b.best_l, w.pieces + 1
      FROM walk w JOIN best b ON b.word = w.word AND b.p = w.p
    ), done AS (
      SELECT word, MAX(pieces) AS n_pieces FROM walk GROUP BY word
    )
    SELECT CAST(n_pieces AS BIGINT) AS n_pieces,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
           CAST(SUM(wc.n) AS BIGINT) AS n_occurrences
    FROM done JOIN wc USING (word)
    GROUP BY n_pieces ORDER BY n_pieces
    """,
)
def q329(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(T.words("text")).alias("word"))
        .groupBy("word").agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    top = (wc.orderBy(F.col("n").desc(), F.col("word").asc())
           .limit(_WP_TOP).select(F.col("word").alias("piece")))
    chars = wc.select(F.explode(F.expr(
        "transform(sequence(1, length(word)),"
        " i -> substring(word, i, 1))")).alias("c")).distinct()
    vocab = (
        top.unionByName(chars.select(F.col("c").alias("piece")))
        .unionByName(chars.select(F.concat(F.lit("##"), F.col("c"))
                                  .alias("piece")))
        .distinct()
    )
    pos = wc.select(
        "word", F.explode(F.expr(
            "sequence(1, length(word))")).alias("p"))
    cand = (
        pos.join(F.broadcast(
            pos.sparkSession.range(1, _WP_MAXL + 1)
            .select(F.col("id").cast("int").alias("l"))))
        .filter(F.col("p") + F.col("l") - 1 <= F.length("word"))
        .select("word", "p", "l",
                F.when(F.col("p") == 1,
                       F.expr("substring(word, p, l)"))
                .otherwise(F.concat(F.lit("##"),
                                    F.expr("substring(word, p, l)")))
                .alias("piece"))
    )
    best = (
        cand.join(F.broadcast(vocab), "piece")
        .groupBy("word", "p").agg(F.max("l").alias("best_l"))
    )
    # Greedy walk WITHOUT a driver frontier loop (the former
    # join+checkpoint+count round per step cost ~3 jobs x longest-word
    # rounds): gather each word's best_l into a position-indexed array
    # (best_l exists for EVERY p — single chars are always in vocab) and
    # follow it with ONE aggregate() fold: scanning i = 1..len(word),
    # the state jumps p -> p + best_l[p] exactly when i reaches p, so
    # the fold replays the identical longest-match-first walk row-side.
    bl = best.groupBy("word").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("p", "best_l"))),
            lambda s: s["best_l"],
        ).alias("bl"))
    walk = wc.join(bl, "word")
    pieces = F.aggregate(
        F.sequence(F.lit(1), F.length("word")),
        F.struct(F.lit(1).alias("p"), F.lit(0).alias("c")),
        lambda acc, i: F.when(
            i == acc["p"],
            F.struct(
                (acc["p"] + F.element_at(F.col("bl"), acc["p"])).alias("p"),
                (acc["c"] + 1).alias("c"),
            ),
        ).otherwise(acc),
    )["c"]
    return (
        walk.select("n", pieces.alias("pieces"))
        .groupBy(F.col("pieces").alias("n_pieces"))
        .agg(F.count("*").cast("bigint").alias("n_distinct_words"),
             F.sum("n").cast("bigint").alias("n_occurrences"))
        .select(F.col("n_pieces").cast("bigint").alias("n_pieces"),
                "n_distinct_words", "n_occurrences")
        .orderBy("n_pieces")
    )


# --------------------------------------------------------------------------
# q330 — SUFFIX ARRAY by PREFIX DOUBLING (Manber-Myers — the algorithm
# behind exact-substring dedup at scale, cf. Lee et al. 2022 whose
# dedup tool builds exactly this): per doc (first 256 chars), suffix
# ranks start as character codes and double their resolved prefix each
# round: rank'(i) = dense_rank(rank(i), rank(i + 2^k)), with the
# shifted rank fetched by lead(rank, 2^k) — NO self-join. 8 fixed
# rounds resolve 256 chars; every window PARTITIONS BY doc (a doc's
# suffixes sort within one task — the unit of parallelism is the
# corpus, not the suffix). Distinct suffix lengths guarantee total
# order, so the checksum sum(pos * rank) is exact. The oracle sorts the
# materialized suffix STRINGS directly — a completely independent
# mechanism; any doubling bug scrambles the permutation.
# --------------------------------------------------------------------------
_SA_LEN = 256
_SA_ROUNDS = 8  # 2^8 = 256 >= _SA_LEN


@register(
    "q330_suffix_array",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, substr(text, 1, {_SA_LEN}) AS t FROM documents
    ), suf AS (
      SELECT doc_id, i AS pos, substr(t, i) AS s, len(t) AS n
      FROM d, LATERAL unnest(generate_series(1, len(t))) u(i)
    ), ranked AS (
      SELECT doc_id, pos, n,
             row_number() OVER (PARTITION BY doc_id ORDER BY s) AS r
      FROM suf
    )
    SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_suffixes,
           CAST(SUM(pos * r) AS BIGINT) AS sa_checksum
    FROM ranked GROUP BY doc_id ORDER BY doc_id
    """,
)
def q330(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A doc's suffixes never leave its row: the former prefix-doubling
    # formulation (8 rounds of two doc-partitioned windows over the
    # exploded suffix table = 1 shuffle + 16 sorts) spent its time
    # re-sorting a table whose partition key was the doc anyway. One
    # map-only pass now builds each doc's suffix ranks batch-side (the
    # unit of parallelism — the corpus — is unchanged, and at 100 TB
    # this is strictly better: ZERO exchanges before the final sort of
    # the per-doc aggregate). Ranks are identical: suffixes of one doc
    # are pairwise distinct (distinct lengths), and Python's code-point
    # string order equals the UTF-8 byte order the oracle sorts by.
    from ..functions.partitioning import ensure_min_partitions

    docs = load(spark, sf_dir, "documents")
    d = ensure_min_partitions(
        docs.select("doc_id", F.substring("text", 1, _SA_LEN).alias("t"))
    )

    def _sa(batches):
        import pandas as pd

        for pdf in batches:
            out_id, out_n, out_ck = [], [], []
            for doc_id, t in zip(pdf["doc_id"], pdf["t"]):
                n = len(t)
                if n == 0:
                    continue  # no suffixes (oracle: empty generate_series)
                order = sorted(range(n), key=lambda i: t[i:])
                # order[r-1] = start of rank-r suffix; checksum sums
                # (1-based pos) * rank over all suffixes
                ck = sum((i + 1) * r for r, i in enumerate(order, 1))
                out_id.append(doc_id)
                out_n.append(n)
                out_ck.append(ck)
            yield pd.DataFrame({
                "doc_id": pd.Series(out_id, dtype="int64"),
                "n_suffixes": pd.Series(out_n, dtype="int64"),
                "sa_checksum": pd.Series(out_ck, dtype="int64"),
            })

    return d.mapInPandas(
        _sa, "doc_id long, n_suffixes bigint, sa_checksum bigint"
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# q338 — WINDOWED CO-OCCURRENCE MATRIX (the GloVe/PPMI input build):
# word pairs within a +-4 token window, weighted by inverse distance —
# kept EXACT by scaling 1/d through lcm(1..4) = 12 (weights 12/6/4/3,
# integers; a float 1/d would drift under distributed summation).
# Positions explode once; pairs meet in a join on (doc, pos + d) for
# the four unrolled offsets — never a theta join; one (w1, w2) hash agg
# shrinks to the co-occurrence matrix. Top-20 pairs by TakeOrdered.
# --------------------------------------------------------------------------
_COOC_W = 4
_COOC_SCALE = {1: 12, 2: 6, 3: 4, 4: 3}


@register(
    "q338_cooccurrence",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {SQL_WORDS} AS ws FROM documents
    ), p AS (
      SELECT doc_id, unnest(ws) AS word,
             unnest(range(1, len(ws) + 1)) AS pos
      FROM w
    ), pairs AS (
      {" UNION ALL ".join(
        f'''SELECT a.word AS w1, b.word AS w2, {wt} AS wt
            FROM p a JOIN p b
              ON b.doc_id = a.doc_id AND b.pos = a.pos + {d}'''
        for d, wt in _COOC_SCALE.items())}
    ), m AS (
      SELECT w1, w2, SUM(wt) AS weight12, COUNT(*) AS n_cooc
      FROM pairs GROUP BY w1, w2
    )
    SELECT w1, w2, CAST(weight12 AS BIGINT) AS weight12,
           CAST(n_cooc AS BIGINT) AS n_cooc
    FROM m ORDER BY weight12 DESC, w1 ASC, w2 ASC LIMIT 20
    """,
)
def q338(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    p = docs.select(
        "doc_id", F.posexplode(T.words("text")).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    p = p.localCheckpoint(eager=False)  # four offset joins read it
    pairs = None
    for d, wt in _COOC_SCALE.items():
        b = p.select(F.col("doc_id"), (F.col("pos") - d).alias("pos"),
                     F.col("word").alias("w2"))
        leg = (p.join(b, ["doc_id", "pos"])
               .select(F.col("word").alias("w1"), "w2",
                       F.lit(wt).alias("wt")))
        pairs = leg if pairs is None else pairs.unionByName(leg)
    m = pairs.groupBy("w1", "w2").agg(
        F.sum("wt").cast("bigint").alias("weight12"),
        F.count("*").cast("bigint").alias("n_cooc"))
    return m.orderBy(F.col("weight12").desc(), F.col("w1").asc(),
                     F.col("w2").asc()).limit(20)


# --------------------------------------------------------------------------
# q340 — HEAPS' LAW FIT (vocabulary growth V ~ K * n^beta — the q303
# Zipf companion; real corpora sit near beta ~ 0.5, synthetic/looped
# text collapses): vocabulary size after each doc-count checkpoint
# WITHOUT rescanning — a word's first-occurrence doc (one min-agg) and
# its token contribution per checkpoint make V(k) and N(k) pure
# filtered counts; checkpoints are the 8 powers of two up to the
# corpus size. The ln-ln OLS over <= 8 checkpoint rows is a
# fixed-order scalar fold. All counts exact integers.
# --------------------------------------------------------------------------
_HEAPS_KS = [2 ** i for i in range(2, 10)]  # 4 .. 512 doc prefixes


@register(
    "q340_heaps_law",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest({SQL_WORDS}) AS word FROM documents
    ), fo AS (
      SELECT word, MIN(doc_id) AS first_doc FROM w GROUP BY word
    ), ck AS (
      SELECT k FROM (VALUES {", ".join(f"({k})" for k in _HEAPS_KS)}) t(k)
      WHERE k <= (SELECT MAX(doc_id) FROM w)
    ), pts AS (
      SELECT ck.k,
             (SELECT COUNT(*) FROM fo WHERE first_doc <= ck.k) AS v,
             (SELECT COUNT(*) FROM w WHERE doc_id <= ck.k) AS n
      FROM ck
    ), s AS (
      SELECT COUNT(*) AS m, SUM(ln(n)) AS sx, SUM(ln(v)) AS sy,
             SUM(ln(n) * ln(v)) AS sxy, SUM(ln(n) * ln(n)) AS sxx
      FROM pts
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pts) AS n_checkpoints,
           round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS beta,
           round(exp((sy - (m * sxy - sx * sy) / (m * sxx - sx * sx)
                      * sx) / m), 6) AS k_const
    FROM s
    """,
)
def q340(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.explode(T.words("text")).alias("word"))
    w = w.localCheckpoint(eager=False)
    fo = w.groupBy("word").agg(F.min("doc_id").alias("first_doc"))
    max_doc = w.agg(F.max("doc_id").alias("mx"))
    ck = (spark.createDataFrame(
        spark.sparkContext.parallelize([(k,) for k in _HEAPS_KS], 1),
        "k bigint")
        .crossJoin(F.broadcast(max_doc))
        .filter(F.col("k") <= F.col("mx")).select("k")
        .localCheckpoint(eager=False))  # v and n both cross-join it
    v = (fo.crossJoin(F.broadcast(ck))
         .filter(F.col("first_doc") <= F.col("k"))
         .groupBy("k").agg(F.count("*").alias("v")))
    n = (w.crossJoin(F.broadcast(ck))
         .filter(F.col("doc_id") <= F.col("k"))
         .groupBy("k").agg(F.count("*").alias("n")))
    pts = v.join(n, "k")
    lx, ly = F.log(F.col("n").cast("double")), F.log(F.col("v")
                                                     .cast("double"))
    s = pts.agg(F.count("*").alias("m"),
                F.sum(lx).alias("sx"), F.sum(ly).alias("sy"),
                F.sum(lx * ly).alias("sxy"), F.sum(lx * lx).alias("sxx"))
    m = F.col("m").cast("double")
    beta = (m * F.col("sxy") - F.col("sx") * F.col("sy")) \
        / (m * F.col("sxx") - F.col("sx") * F.col("sx"))
    return s.select(
        F.col("m").cast("bigint").alias("n_checkpoints"),
        F.round(beta, 6).alias("beta"),
        F.round(F.exp((F.col("sy") - beta * F.col("sx")) / m), 6)
        .alias("k_const"))


# --------------------------------------------------------------------------
# q344 — FEATURE-HASHING COLLISION AUDIT (the hashing-trick due
# diligence behind q260's classifier): hash the word vocabulary into
# 2^k buckets for k = 8/10/12 and report occupied buckets, collisions,
# and the birthday-math EXPECTATION m*(1-(1-1/m)^V) — the gap between
# actual and expected flags a bad hash. One distinct-vocab scan; per-k
# occupied counts are countDistinct over the bucket id (bounded by m).
# All integers except the expectation (fixed-order scalar, round 6).
# --------------------------------------------------------------------------
_FH_KS = [8, 10, 12]


@register(
    "q344_feature_hash_collisions",
    oracle=f"""
    WITH v AS (
      SELECT DISTINCT unnest({SQL_WORDS}) AS w FROM documents
    ), h AS (
      SELECT w, {md5_int64_sql("w")} AS hw FROM v
    ), stats AS (
      SELECT COUNT(*) AS vocab FROM v
    )
    {" UNION ALL ".join(f'''
    SELECT CAST({k} AS BIGINT) AS k, CAST({1 << k} AS BIGINT) AS m,
           CAST(stats.vocab AS BIGINT) AS vocab,
           CAST(COUNT(DISTINCT hw % {1 << k}) AS BIGINT) AS occupied,
           CAST(stats.vocab - COUNT(DISTINCT hw % {1 << k}) AS BIGINT)
             AS collisions,
           round({float(1 << k)} * (1 - pow(1 - 1.0 / {1 << k},
                                            stats.vocab)), 6)
             AS expected_occupied
    FROM h, stats GROUP BY stats.vocab''' for k in _FH_KS)}
    ORDER BY k
    """,
)
def q344(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_int64

    docs = load(spark, sf_dir, "documents")
    v = docs.select(F.explode(T.words("text")).alias("w")).distinct()
    h = v.select(md5_int64(F.col("w")).alias("hw")).localCheckpoint()
    out = None
    for k in _FH_KS:
        m = 1 << k
        row = h.agg(
            F.lit(k).cast("bigint").alias("k"),
            F.lit(m).cast("bigint").alias("m"),
            F.count("*").cast("bigint").alias("vocab"),
            F.countDistinct(F.col("hw") % m).cast("bigint")
            .alias("occupied"),
        ).select(
            "k", "m", "vocab", "occupied",
            (F.col("vocab") - F.col("occupied")).alias("collisions"),
            F.round(F.lit(float(m))
                    * (1 - F.pow(F.lit(1 - 1.0 / m),
                                 F.col("vocab").cast("double"))), 6)
            .alias("expected_occupied"))
        out = row if out is None else out.unionByName(row)
    return out.orderBy("k")


# --------------------------------------------------------------------------
# q356 — GOOD-TURING FREQUENCY SMOOTHING (the classic LM mass
# re-estimator): from the word frequency-of-frequencies table
# N_r = #{words seen exactly r times}, the adjusted count is
# r* = (r+1) * N_{r+1} / N_r and the unseen-mass estimate is N_1 / N.
# Everything is a ratio of EXACT integers: one shrinking word-count
# agg, one freq-of-freq agg (value-domain-sized), and a self-join on
# r+1. Reported for the 10 smallest r (where GT is actually used; high
# r keeps raw counts).
# --------------------------------------------------------------------------
@register(
    "q356_good_turing",
    oracle=f"""
    WITH wc AS (
      SELECT word, COUNT(*) AS r FROM (
        SELECT unnest({SQL_WORDS}) AS word FROM documents
      ) GROUP BY word
    ), fof AS (
      SELECT r, COUNT(*) AS nr FROM wc GROUP BY r
    ), tot AS (
      SELECT SUM(r * nr) AS n_tok FROM fof
    )
    SELECT CAST(a.r AS BIGINT) AS r,
           CAST(a.nr AS BIGINT) AS n_r,
           CAST(COALESCE(b.nr, 0) AS BIGINT) AS n_r1,
           round((a.r + 1) * CAST(COALESCE(b.nr, 0) AS DOUBLE) / a.nr, 6)
             AS r_star,
           round((SELECT CAST(nr AS DOUBLE) FROM fof WHERE r = 1)
                 / (SELECT n_tok FROM tot), 6) AS p_unseen
    FROM fof a LEFT JOIN fof b ON b.r = a.r + 1
    ORDER BY a.r LIMIT 10
    """,
)
def q356(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    wc = (docs.select(F.explode(T.words("text")).alias("word"))
          .groupBy("word").agg(F.count("*").alias("r")))
    fof = wc.groupBy("r").agg(F.count("*").alias("nr"))
    fof = fof.localCheckpoint(eager=False)  # read 4 ways below
    tot = fof.agg(F.sum(F.col("r") * F.col("nr")).alias("n_tok"))
    # aggregate (not filter): a corpus with NO hapax words must still
    # yield one row with NULL, matching the oracle's scalar subquery
    n1 = fof.agg(F.sum(F.when(F.col("r") == 1, F.col("nr")))
                 .cast("double").alias("n1"))
    b = fof.select((F.col("r") - 1).alias("r"),
                   F.col("nr").alias("nr1"))
    j = (fof.join(b, "r", "left")
         .crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(n1)))
    return (
        j.select(
            F.col("r").cast("bigint").alias("r"),
            F.col("nr").cast("bigint").alias("n_r"),
            F.coalesce("nr1", F.lit(0)).cast("bigint").alias("n_r1"),
            F.round((F.col("r") + 1)
                    * F.coalesce("nr1", F.lit(0)).cast("double")
                    / F.col("nr"), 6).alias("r_star"),
            F.round(F.col("n1") / F.col("n_tok"), 6).alias("p_unseen"))
        .orderBy("r").limit(10)
    )


# --------------------------------------------------------------------------
# q404 / q405 — translation-eval metrics over (candidate, reference)
# pairs: BLEU-2 (clipped n-gram precision, geometric mean) and
# ROUGE-1/2 (overlap precision/recall/F1). The candidate is a
# deterministic corruption of the reference built IN COLUMN EXPRESSIONS
# on both engines (drop every 5th word, append a leading-word run —
# longer than the reference, so BLEU's brevity penalty is exactly 1 and
# the whole metric is +,-,*,/,sqrt arithmetic: no exp/ln, no
# cross-engine libm drift). Clipped counts run as explode ->
# groupBy(doc_id, gram) -> join -> sum(min) — whole-stage-codegen'd and
# partitioned by (doc, gram), the shape that survives a 100 TB corpus
# (the in-row HOF alternative is O(n_distinct x n_words) interpreted
# lambda work per doc — the q177 lesson).
# --------------------------------------------------------------------------
_EVAL_CAND_SQL = f"""
      SELECT doc_id, {SQL_WORDS} AS ref,
             list_concat(
               list_select({SQL_WORDS},
                 list_filter(generate_series(1, len({SQL_WORDS})),
                             i -> i % 5 <> 0)),
               ({SQL_WORDS})[1 : len({SQL_WORDS}) // 4 + 2]) AS cand
      FROM documents
"""

_EVAL_GRAMS_SQL = """
    , uni AS (
      SELECT doc_id, len(cand) AS c, len(ref) AS r FROM pairs
    ), cu AS (
      SELECT doc_id, unnest(cand) AS g FROM pairs
    ), ru AS (
      SELECT doc_id, unnest(ref) AS g FROM pairs
    ), cb AS (
      SELECT doc_id, unnest(list_transform(
        generate_series(1, len(cand) - 1),
        i -> cand[i] || ' ' || cand[i + 1])) AS g FROM pairs
    ), rb AS (
      SELECT doc_id, unnest(list_transform(
        generate_series(1, len(ref) - 1),
        i -> ref[i] || ' ' || ref[i + 1])) AS g FROM pairs
    ), clip1 AS (
      SELECT a.doc_id, SUM(LEAST(a.n, b.n)) AS ov FROM
        (SELECT doc_id, g, COUNT(*) AS n FROM cu GROUP BY 1, 2) a
        JOIN (SELECT doc_id, g, COUNT(*) AS n FROM ru GROUP BY 1, 2) b
        USING (doc_id, g)
      GROUP BY 1
    ), clip2 AS (
      SELECT a.doc_id, SUM(LEAST(a.n, b.n)) AS ov FROM
        (SELECT doc_id, g, COUNT(*) AS n FROM cb GROUP BY 1, 2) a
        JOIN (SELECT doc_id, g, COUNT(*) AS n FROM rb GROUP BY 1, 2) b
        USING (doc_id, g)
      GROUP BY 1
    )
"""


def _eval_pairs(spark: SparkSession, sf_dir: str):
    """(doc_id, ref array, cand array) with the deterministic corruption."""
    docs = load(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda w: w != "")
    ref = docs.select("doc_id", words.alias("ref"))
    kept = F.filter(F.col("ref"), lambda w, i: (i + 1) % 5 != 0)
    extra = F.slice(F.col("ref"), 1,
                    F.floor(F.size("ref") / 4).cast("int") + 2)
    return ref.select("doc_id", "ref",
                      F.concat(kept, extra).alias("cand"))


def _bigrams(col):
    return F.when(
        F.size(col) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(col) - 1),
            lambda i: F.concat(F.element_at(col, i), F.lit(" "),
                               F.element_at(col, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _clipped_overlap(pairs, gram_fn, out_name):
    cu = pairs.select("doc_id", F.explode(gram_fn("cand")).alias("g")) \
        .groupBy("doc_id", "g").count().withColumnRenamed("count", "nc")
    ru = pairs.select("doc_id", F.explode(gram_fn("ref")).alias("g")) \
        .groupBy("doc_id", "g").count().withColumnRenamed("count", "nr")
    return (cu.join(ru, ["doc_id", "g"])
            .groupBy("doc_id")
            .agg(F.sum(F.least("nc", "nr")).alias(out_name)))


@register(
    "q404_bleu",
    oracle=f"""
    WITH pairs AS ({_EVAL_CAND_SQL})
    {_EVAL_GRAMS_SQL}
    SELECT u.doc_id,
           CAST(u.c AS INT) AS c, CAST(u.r AS INT) AS r,
           CAST(COALESCE(c1.ov, 0) AS BIGINT) AS clip1,
           CAST(COALESCE(c2.ov, 0) AS BIGINT) AS clip2,
           round(COALESCE(c1.ov, 0) / u.c, 6) AS p1,
           round(COALESCE(c2.ov, 0) / (u.c - 1), 6) AS p2,
           round(sqrt((COALESCE(c1.ov, 0) / u.c)
                      * (COALESCE(c2.ov, 0) / (u.c - 1))), 6) AS bleu2
    FROM uni u
    LEFT JOIN clip1 c1 USING (doc_id) LEFT JOIN clip2 c2 USING (doc_id)
    WHERE u.r >= 3
    """,
)
def q404(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _eval_pairs(spark, sf_dir).filter(F.size("ref") >= 3)
    pairs = pairs.localCheckpoint()  # four gram legs reuse one build
    sizes = pairs.select(
        "doc_id", F.size("cand").alias("c"), F.size("ref").alias("r"))
    c1 = _clipped_overlap(pairs, lambda c: F.col(c), "ov1")
    c2 = _clipped_overlap(pairs, lambda c: _bigrams(F.col(c)), "ov2")
    j = (sizes.join(c1, "doc_id", "left").join(c2, "doc_id", "left")
         .fillna(0, ["ov1", "ov2"]))
    p1 = F.col("ov1") / F.col("c")
    p2 = F.col("ov2") / (F.col("c") - 1)
    return j.select(
        "doc_id", F.col("c").cast("int").alias("c"),
        F.col("r").cast("int").alias("r"),
        F.col("ov1").cast("bigint").alias("clip1"),
        F.col("ov2").cast("bigint").alias("clip2"),
        F.round(p1, 6).alias("p1"), F.round(p2, 6).alias("p2"),
        F.round(F.sqrt(p1 * p2), 6).alias("bleu2"),
    )


@register(
    "q405_rouge",
    oracle=f"""
    WITH pairs AS ({_EVAL_CAND_SQL})
    {_EVAL_GRAMS_SQL}
    SELECT u.doc_id,
           round(COALESCE(c1.ov, 0) / u.r, 6) AS rouge1_r,
           round(COALESCE(c1.ov, 0) / u.c, 6) AS rouge1_p,
           round(2.0 * COALESCE(c1.ov, 0) / (u.r + u.c), 6) AS rouge1_f,
           round(COALESCE(c2.ov, 0) / (u.r - 1), 6) AS rouge2_r,
           round(COALESCE(c2.ov, 0) / (u.c - 1), 6) AS rouge2_p,
           round(2.0 * COALESCE(c2.ov, 0) / (u.r + u.c - 2), 6)
               AS rouge2_f
    FROM uni u
    LEFT JOIN clip1 c1 USING (doc_id) LEFT JOIN clip2 c2 USING (doc_id)
    WHERE u.r >= 3
    """,
)
def q405(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _eval_pairs(spark, sf_dir).filter(F.size("ref") >= 3)
    pairs = pairs.localCheckpoint()
    sizes = pairs.select(
        "doc_id", F.size("cand").alias("c"), F.size("ref").alias("r"))
    c1 = _clipped_overlap(pairs, lambda c: F.col(c), "ov1")
    c2 = _clipped_overlap(pairs, lambda c: _bigrams(F.col(c)), "ov2")
    j = (sizes.join(c1, "doc_id", "left").join(c2, "doc_id", "left")
         .fillna(0, ["ov1", "ov2"]))
    ov1, ov2 = F.col("ov1"), F.col("ov2")
    c, r = F.col("c"), F.col("r")
    return j.select(
        "doc_id",
        F.round(ov1 / r, 6).alias("rouge1_r"),
        F.round(ov1 / c, 6).alias("rouge1_p"),
        F.round(2.0 * ov1 / (r + c), 6).alias("rouge1_f"),
        F.round(ov2 / (r - 1), 6).alias("rouge2_r"),
        F.round(ov2 / (c - 1), 6).alias("rouge2_p"),
        F.round(2.0 * ov2 / (r + c - 2), 6).alias("rouge2_f"),
    )


# --------------------------------------------------------------------------
# q411 — INTERPOLATED KNESER-NEY bigram smoothing (the LM-smoothing
# family's third leg next to Good-Turing q356 and stupid backoff
# q308): absolute discount D = 0.75 (dyadic-exact), continuation
# probabilities from DISTINCT-context counts — the insight that made
# KN the default n-gram smoother. Model tables come from the odd docs;
# the even docs are scored so unseen contexts genuinely take the
# continuation-only branch. The continuation distribution carries the
# q308 add-0.5 floor so every branch stays strictly positive:
#   P(w2|w1) = max(c12 - D, 0)/c1 + (D * N1+(w1,.)/c1) * Pc(w2)
#   Pc(w2)   = (N1+(., w2) + 0.5) / (n_bigram_types + 0.5 * V)
# Scale shape: corpus aggregates joined back by n-gram key (LEFT
# equi-joins, big side shuffled once) — identical to q308's plan.
# --------------------------------------------------------------------------
@register(
    "q411_kneser_ney",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {SQL_WORDS} AS ws FROM documents
    ), bi AS (
      SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM (
        SELECT doc_id,
               unnest(list_zip(list_slice(ws, 1, len(ws) - 1),
                               list_slice(ws, 2, len(ws)))) AS p
        FROM w WHERE len(ws) >= 2)
    ), train2 AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM bi
      WHERE doc_id % 2 = 1 GROUP BY 1, 2
    ), ctx AS (
      SELECT w1, SUM(c12) AS c1, COUNT(*) AS fwd_types
      FROM train2 GROUP BY 1
    ), cont AS (
      SELECT w2, COUNT(*) AS cont_types FROM train2 GROUP BY 1
    ), scal AS (
      SELECT COUNT(*) AS n_types,
             (SELECT COUNT(DISTINCT w) FROM (
                SELECT unnest(ws) AS w FROM w WHERE doc_id % 2 = 1))
                 AS v
      FROM train2
    ), held AS (
      SELECT b.doc_id, t.c12, x.c1, x.fwd_types, n.cont_types
      FROM bi b
      LEFT JOIN train2 t USING (w1, w2)
      LEFT JOIN ctx x USING (w1)
      LEFT JOIN cont n ON n.w2 = b.w2
      WHERE b.doc_id % 2 = 0
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN c1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unseen_ctx,
           round(AVG(-log2(
             CASE WHEN c1 IS NOT NULL THEN
               GREATEST(COALESCE(c12, 0) - 0.75, 0) / c1
               + (0.75 * fwd_types / c1)
                 * ((COALESCE(cont_types, 0) + 0.5)
                    / (n_types + 0.5 * v))
             ELSE (COALESCE(cont_types, 0) + 0.5)
                  / (n_types + 0.5 * v)
             END)), 6) AS mean_logscore
    FROM held, scal GROUP BY doc_id
    """,
)
def q411(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ws = T.words("text")
    n = F.size(ws)
    bi = (
        docs.filter(n >= 2)
        .select("doc_id", F.explode(F.arrays_zip(
            F.slice(ws, F.lit(1), n - 1).alias("w1"),
            F.slice(ws, F.lit(2), n - 1).alias("w2"))).alias("p"))
        .select("doc_id", "p.w1", "p.w2")
    )
    train = bi.filter(F.col("doc_id") % 2 == 1)
    train2 = train.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    train2 = train2.localCheckpoint()  # feeds ctx, cont, scal, and the
    ctx = train2.groupBy("w1").agg(    # held join: build once
        F.sum("c12").alias("c1"), F.count("*").alias("fwd_types"))
    cont = train2.groupBy("w2").agg(F.count("*").alias("cont_types"))
    # vocabulary: distinct UNIGRAMS of the training docs
    uni = (docs.filter(F.col("doc_id") % 2 == 1)
           .select(F.explode(ws).alias("w"))
           .agg(F.countDistinct("w").alias("v")))
    scal = train2.agg(F.count("*").alias("n_types")).crossJoin(uni)
    held = (bi.filter(F.col("doc_id") % 2 == 0)
            .join(train2, ["w1", "w2"], "left")
            .join(ctx, "w1", "left")
            .join(cont, "w2", "left")
            .crossJoin(F.broadcast(scal)))
    pc = ((F.coalesce("cont_types", F.lit(0)) + 0.5)
          / (F.col("n_types") + 0.5 * F.col("v")))
    seen = (F.greatest(F.coalesce("c12", F.lit(0)) - 0.75, F.lit(0.0))
            / F.col("c1")
            + (0.75 * F.col("fwd_types") / F.col("c1")) * pc)
    p = F.when(F.col("c1").isNotNull(), seen).otherwise(pc)
    return held.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.sum(F.when(F.col("c1").isNull(), 1).otherwise(0))
        .cast("bigint").alias("n_unseen_ctx"),
        F.round(F.avg(-F.log2(p)), 6).alias("mean_logscore"),
    )


# --------------------------------------------------------------------------
# q425 — DISTRIBUTED DICTIONARY TRAINING (the ZDICT-shaped corpus op):
# a shared compression dictionary is TRAINED from the corpus itself —
# overlapping 16-char shingles (stride 8) explode as pure column
# expressions, one hash aggregation counts them, and the top 64 by
# (count desc, shingle) concatenate into the dictionary content. The
# cross-engine check is the md5 of that exact concatenation (both
# engines must agree on every count, tie-break, and byte), and the
# kernel then USES the trained dictionary through the in-tree zstd
# codec (q424's path) with a per-shard saving assertion. At 100 TB the
# shingle count is one map-side-combined groupBy + a 64-row TakeOrdered
# — the classic top-k plan, no global sort.
# --------------------------------------------------------------------------
ZTRAIN_SCHEMA = ("doc_id long, n_chars int, dict_sig string, "
                 "rt_ok boolean")


@register(
    "q425_dict_training",
    oracle="""
    WITH sh AS (
      SELECT substr(text, i, 16) AS shingle
      FROM documents, LATERAL (
        SELECT unnest(generate_series(
          1, greatest(length(text) - 15, 0), 8)) AS i)
      WHERE length(text) >= 16
    ), top AS (
      SELECT shingle, COUNT(*) AS cnt FROM sh GROUP BY shingle
      ORDER BY cnt DESC, shingle LIMIT 64
    )
    SELECT d.doc_id, CAST(length(d.text) AS INT) AS n_chars,
           (SELECT md5(string_agg(shingle, '' ORDER BY cnt DESC,
                                  shingle)) FROM top) AS dict_sig,
           TRUE AS rt_ok
    FROM documents d
    """,
)
def q425(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib as _hashlib

    from ..functions.partitioning import ensure_min_partitions

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    shingles = (
        docs.filter(F.length("text") >= 16)
        .select(F.explode(F.expr(
            "transform(sequence(1, greatest(length(text) - 15, 1), 8),"
            " i -> substr(text, i, 16))")).alias("shingle"))
        .groupBy("shingle").count()
        .orderBy(F.col("count").desc(), F.col("shingle"))
        .limit(64)
        .collect())                      # bounded: exactly 64 rows
    content = "".join(r["shingle"] for r in shingles).encode()
    dict_sig = _hashlib.md5(content).hexdigest()

    work = ensure_min_partitions(docs)

    def kernel(batches):
        import json as _json

        import pandas as pd

        from ..sources.zstd import compress, decompress

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_chars", "rt_ok")}
            dict_total = plain_total = 0
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                line = _json.dumps({"id": int(doc_id), "text": t},
                                   ensure_ascii=False).encode()
                dframe = compress(line, dictionary=content)
                plain_total += len(compress(line))
                dict_total += len(dframe)
                rows.append((doc_id, len(t), decompress(
                    dframe, dictionary=content) == line))
            shard_ok = dict_total < plain_total or not rows
            for doc_id, n, rt in rows:
                out["doc_id"].append(doc_id)
                out["n_chars"].append(n)
                out["rt_ok"].append(bool(rt and shard_ok))
            yield pd.DataFrame(out)

    return (work.mapInPandas(kernel, "doc_id long, n_chars int, "
                             "rt_ok boolean")
            .select("doc_id", "n_chars",
                    F.lit(dict_sig).alias("dict_sig"), "rt_ok"))




# --------------------------------------------------------------------------
# q455 — FM-INDEX BACKWARD SEARCH (Ferragina-Manzini 2000, the
# compressed-index machinery behind bowtie/bwa and large-corpus
# substring search): on top of q330's prefix-doubling suffix array,
# each doc's BWT is derived (char preceding each suffix, in SA order,
# sentinel-terminated), rank structures are materialized as column
# ops — occ(c, i) by a cumulative window per (doc, char), the C table
# by a cumulative char-order window — and the 3-char patterns are
# matched right-to-left with the LF-mapping UNROLLED (3 steps, each a
# pair of as-of occ lookups expressed as bounded aggregation joins:
# lo' = C[c] + occ(c, lo-1) + 1, hi' = C[c] + occ(c, hi)). The match
# count per (doc, pattern) is the final SA-interval width — equal to
# the OVERLAPPING occurrence count, which the oracle recomputes by
# direct trigram extraction, a completely independent mechanism. Runs
# on a 1-in-5 doc sample, first 256 chars (the q330 contract).
# --------------------------------------------------------------------------
_FM_LEN = 256
_FM_ROUNDS = 9  # 2^9 = 512 >= 257 (with sentinel)
_FM_PATS = ["the", "and", "ing", "ion", " th", "he "]
_FM_PLEN = 3


@register(
    "q455_fm_index_search",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, substr(text, 1, {_FM_LEN}) AS t
      FROM documents WHERE doc_id % 5 = 0
    ), pats AS (
      SELECT unnest(ARRAY[{", ".join(repr(p) for p in _FM_PATS)}]) AS pat
    ), suf AS (
      SELECT doc_id, substr(t, i, {_FM_PLEN}) AS tri
      FROM d, LATERAL unnest(generate_series(1, len(t) - {_FM_PLEN} + 1))
               u(i)
    ), hits AS (
      SELECT pats.pat, suf.doc_id, COUNT(*) AS cnt
      FROM suf JOIN pats ON suf.tri = pats.pat
      GROUP BY 1, 2
    )
    SELECT pats.pat,
           CAST(COALESCE(COUNT(hits.doc_id), 0) AS BIGINT) AS n_docs,
           CAST(COALESCE(SUM(hits.cnt), 0) AS BIGINT) AS n_occ
    FROM pats LEFT JOIN hits ON hits.pat = pats.pat
    GROUP BY 1
    """,
)
def q455(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The FM-index is PER DOC (each doc indexes its own <=257 chars), so
    # the whole build+search is row-local: the former relational
    # formulation (9 prefix-doubling window rounds + occ/C-table windows
    # + 3 backward-search rounds of 3 joins each) paid ~15 shuffles for
    # work that never crosses a doc boundary. One map-only kernel now
    # runs the same algorithm — suffix array, BWT, C table, occ ranks,
    # Ferragina-Manzini backward search — batch-side per doc, then a
    # single tiny aggregation by pattern. At corpus scale this is the
    # right shape outright: zero exchanges until the 6-row rollup.
    from ..functions.partitioning import ensure_min_partitions

    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 0)
    d0 = ensure_min_partitions(docs.select(
        "doc_id",
        F.concat(F.substring("text", 1, _FM_LEN),
                 F.lit("\x01")).alias("t")))
    pats = list(_FM_PATS)

    def _fm(batches):
        import pandas as pd

        def search(t, pat):
            n = len(t)
            sa = sorted(range(n), key=lambda i: t[i:])
            bwt = [t[i - 1] if i > 0 else t[-1] for i in sa]
            # C_le(c) = # chars <= c; occ(c, i) = # of c in bwt[:i]
            from collections import Counter

            cnt = Counter(t)
            cle, acc = {}, 0
            for c in sorted(cnt):
                acc += cnt[c]
                cle[c] = acc
            lo, hi = 1, n  # 1-based inclusive [lo, hi] over SA rows
            for c in reversed(pat):
                c_lt = 0
                for ch, le in cle.items():
                    if ch < c:
                        c_lt = max(c_lt, le)
                occ_lo = sum(1 for x in bwt[: lo - 1] if x == c)
                occ_hi = sum(1 for x in bwt[:hi] if x == c)
                lo = c_lt + occ_lo + 1
                hi = c_lt + occ_hi
                if hi < lo:
                    return 0
            return hi - lo + 1

        for pdf in batches:
            out_pat, out_cnt = [], []
            for t in pdf["t"]:
                for pat in pats:
                    out_pat.append(pat)
                    out_cnt.append(search(t, pat))
            yield pd.DataFrame({
                "pat": pd.Series(out_pat, dtype="object"),
                "cnt": pd.Series(out_cnt, dtype="int64"),
            })

    per_doc = d0.mapInPandas(_fm, "pat string, cnt bigint")
    return per_doc.groupBy("pat").agg(
        F.sum((F.col("cnt") > 0).cast("long")).alias("n_docs"),
        F.sum("cnt").alias("n_occ"))

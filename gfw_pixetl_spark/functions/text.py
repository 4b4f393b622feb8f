"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is built-in Spark column expressions (JVM-side,
whole-stage codegen) — no Python UDFs. Tokenization is a simple
whitespace split plus a BPE-ish regex token counter; language ID is an
n-gram/stopword heuristic; quality scoring is ratio arithmetic; document
fingerprinting is a position-weighted rolling hash.

Shared constants live here so SQL oracles can inline the same literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import FNV_WORD_MOD, md5_int64

# BPE-ish token pattern: letter runs, digit runs, single punctuation.
# Kept to a dialect-neutral subset (works identically in Java regex and RE2).
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword lexicon for the n-gram language heuristic.
# Deterministic and engine-portable; real deployments would swap in a
# fastText-style model behind the same column contract.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "zu"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "los", "y", "de"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

FINGERPRINT_MOD = 1_000_000_007


def words(col: Column | str) -> Column:
    """Whitespace tokens, empties removed (split on runs of whitespace)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda w: w != "")


def token_count_whitespace(col: Column | str) -> Column:
    return F.size(words(col))


def token_count_bpe(col: Column | str) -> Column:
    """Count of BPE-ish regex tokens (letters / digits / punct)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_REGEX))


def quality_features(
    df: DataFrame, text_col: str = "text", keep_cols: tuple = ()
) -> DataFrame:
    """Length / punctuation / stopword ratios -> a scalar quality score.

    Pure column arithmetic; a full scan computes this for every document in
    one codegen stage with zero shuffles. ``keep_cols`` passes extra
    source columns through (so funnel-style consumers stay one-pass
    instead of re-joining the table to itself).
    """
    t = F.col(text_col)
    ws = words(text_col)
    n_chars = F.length(t)
    n_words = F.size(ws)
    alpha_chars = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    stop = F.array([F.lit(s) for s in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop, F.lower(w))))
    avg_word_len = (n_chars - (n_words - 1)) / n_words  # chars net of single spaces
    alpha_ratio = alpha_chars / n_chars
    stop_ratio = n_stop / n_words
    score = F.round(
        alpha_ratio * 0.5
        + stop_ratio * 0.3
        + F.least(avg_word_len / F.lit(10.0), F.lit(1.0)) * 0.2,
        6,
    )
    return df.select(
        "doc_id",
        *keep_cols,
        n_words.alias("n_words"),
        alpha_chars.alias("alpha_chars"),
        n_stop.alias("n_stopwords"),
        score.alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-voting language ID: per doc, the language whose stopwords
    occur most often; ties -> lexicographically smallest code; no hits ->
    'und'. One projection, no shuffle, no UDF.
    """
    ws = words(text_col)

    def contains(lex):
        # single-arg lambda: F.filter passes (element, index) to 2-arg ones
        return lambda w: F.array_contains(lex, F.lower(w))

    langs = sorted(LANG_STOPWORDS)
    # materialize score columns first: folding over raw filter expressions
    # duplicates them exponentially in the fold below
    score_exprs = []
    for lang in langs:
        lex = F.array([F.lit(s) for s in LANG_STOPWORDS[lang]])
        score_exprs.append(F.size(F.filter(ws, contains(lex))).alias(f"n_{lang}"))
    scored = df.select("doc_id", *score_exprs)

    # fold argmax: strictly-greater keeps earlier (smaller) lang on ties
    best_lang, best_n = F.lit(langs[0]), F.col(f"n_{langs[0]}")
    for lang in langs[1:]:
        n = F.col(f"n_{lang}")
        cond = n > best_n
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_n = F.when(cond, n).otherwise(best_n)
    pred = F.when(best_n > 0, best_lang).otherwise(F.lit("und"))
    return scored.select(
        "doc_id", pred.alias("pred_lang"), best_n.alias("vote_count")
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Position-weighted rolling hash over word hashes (document
    fingerprint). posexplode + sum keeps it a single hash aggregation; the
    md5-derived word hash makes it reproducible in any engine.
    """
    ws = words(text_col)
    exploded = df.select("doc_id", F.posexplode(ws).alias("pos", "word"))
    term = (md5_int64(F.col("word")) % FNV_WORD_MOD) * (F.col("pos") + 1)
    return (
        exploded.groupBy("doc_id")
        .agg((F.sum(term) % FINGERPRINT_MOD).alias("fingerprint"))
    )


def tfidf_top_terms(
    df: DataFrame, top_k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Per-document top-k terms by TF-IDF (tf * ln(N/df)).

    Shape at scale: one explode + two partial-aggregable groupBys; the
    document-frequency table is vocabulary-sized, so it broadcasts — the
    per-(doc,term) scoring join never shuffles the big side. The corpus
    size N is a 1-row broadcast cross join, not a driver-side collect.
    """
    # tf and dfreq both consume the exploded term stream — checkpoint
    # so the tokenizing explode runs once
    w = df.select(
        "doc_id", F.explode(words(text_col)).alias("word")
    ).localCheckpoint(eager=False)
    tf = w.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = w.groupBy("word").agg(F.countDistinct("doc_id").alias("dfreq"))
    n = df.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "word")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("dfreq")), 4),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.col("word")
    )
    return (
        scored.withColumn("rk", F.row_number().over(win).cast("long"))
        .filter(F.col("rk") <= top_k)
        .select("doc_id", "word", "tf", "score", "rk")
    )


def normalized_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup after aggressive normalization (lowercase, strip
    non-alphanumerics, collapse whitespace) — catches the trivial
    near-dups (case/punct variants) at exact-dedup cost: one map-side
    normalization + one digest aggregation, no pairwise anything.
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""),
            " +", " ",
        )
    )
    return (
        df.select("doc_id", F.md5(norm).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("dup_count"),
        )
    )


# TPC-H phone shape (`c_phone`, e.g. "25-989-741-2988") — the stand-in
# PII pattern; real deployments extend PII_PATTERNS with email/SSN/etc.
# Kept to a dialect-neutral regex subset (identical in Java regex & RE2).
PII_PHONE_REGEX = r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (PII_PHONE_REGEX, "[PHONE]"),
    (r"[0-9]{5,}", "[NUM]"),  # long digit runs (account-number-ish)
)


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """Redact PII-shaped spans and count redactions — the standard
    pre-training scrub pass. Pure JVM regex column ops (codegen'd full
    scan, zero shuffles); patterns apply in order, counts are summed
    BEFORE any replacement so overlapping patterns count on the
    original text.
    """
    t = F.col(text_col)
    n = F.lit(0)
    for pat, _ in patterns:
        n = n + F.regexp_count(t, F.lit(pat))
    scrubbed = t
    for pat, repl in patterns:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.withColumns({
        "n_redactions": n.cast("long"),
        "scrubbed": scrubbed,
    })


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition signals (Gopher-style quality rules):
    duplicate-word fraction and top-word fraction.

    Two-level aggregation — explode to (doc, word) counts, then per-doc
    stats. Both aggregations are map-side-combinable and shuffle only
    (doc_id, word) partials, never the text; at 100 TB the wide explode
    never materializes because partial aggregation collapses it within
    each scan task.
    """
    ex = df.select("doc_id", F.explode(words(text_col)).alias("w"))
    wc = ex.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    return (
        wc.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_n"),
        )
        .select(
            "doc_id", "n_words", "n_distinct",
            F.round(F.lit(1.0) - F.col("n_distinct") / F.col("n_words"), 6)
            .alias("dup_frac"),
            F.round(F.col("top_n") / F.col("n_words"), 6).alias("top_frac"),
        )
    )


def domain_mix_weights(
    df: DataFrame,
    domain_cols: tuple[str, ...] = ("lang", "source"),
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled corpus mixing weights: w(d) ∝ n(d)^alpha,
    normalized — the sampling-weight table a data-mixture trainer
    consumes. One aggregation to domain counts (tiny), then the
    normalizer broadcasts back as a 1-row crossJoin — no window over a
    single partition, so the pattern survives any corpus size.
    """
    counts = df.groupBy(*domain_cols).agg(F.count("*").alias("n"))
    counts = counts.withColumn("w", F.pow(F.col("n"), F.lit(alpha))) \
        .localCheckpoint(eager=False)  # normalizer + output both read it
    total = counts.agg(F.sum("w").alias("w_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *domain_cols, "n",
            F.round(F.col("w") / F.col("w_total"), 6).alias("weight"),
        )
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 200,
    overlap: int = 40,
) -> DataFrame:
    """Overlapping fixed-width chunking (the RAG / context-window prep
    step): each document explodes into ``ceil((len - overlap) / stride)``
    chunks of ``size`` chars starting every ``stride = size - overlap``.

    Entirely JVM-side (sequence + explode + substring inside whole-stage
    codegen): no Python crosses the hot path, and the explode fan-out is
    data-local — chunking 100 TB shuffles nothing, each input split
    emits its own chunks. The last chunk is short rather than padded,
    matching how retrieval indexes ingest text.
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    n = F.length(text_col)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(overlap)) / F.lit(float(stride))).cast("int"),
    )
    return (
        df.select(
            id_col, text_col,
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            (F.col("chunk_id") * stride).cast("long").alias("chunk_start"),
            # column-API substr (not f-string F.expr) so a non-bare
            # column name (spaces, dots, keywords) can't break parsing
            F.col(text_col).substr(
                (F.col("chunk_id") * stride + 1).cast("int"), F.lit(size)
            ).alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text").cast("long"))
    )


CDC_WINDOW = 8      # rolling-hash window (chars)
CDC_BASE = 31       # polynomial base
CDC_MASK_MOD = 64   # boundary when H % 64 == 0 -> ~1/64 boundary rate


def cdc_boundaries(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content-defined chunking boundaries (the Rabin-style rolling-hash
    rule dedup storage and some corpus pipelines use): position ``i`` is
    a boundary when the polynomial hash of the trailing ``CDC_WINDOW``
    chars is 0 mod ``CDC_MASK_MOD``. Unlike fixed-stride chunking
    (chunk_documents), boundaries move WITH the content — an insertion
    reshifts only the chunk it lands in, so downstream exact-dedup of
    chunks survives edits.

    The window is small and fixed, so the hash unrolls into 8 ascii()
    terms evaluated entirely inside whole-stage codegen — and the
    position scan runs INSIDE the row via higher-order functions
    (filter over a position sequence), so only the boundary positions
    themselves are ever exploded — the explode-then-filter formulation
    materializes a copy of the document per character position (a
    ~300x row blow-up carrying full text) before filtering. CPU-heavy
    per row (~8 substring probes per char), so the small-file guard
    matters: a single-split corpus file would otherwise serialize the
    whole scan onto one core (observed 15 s -> 1.3 s at sf0.1).
    Map-only, and bit-replayable in any SQL engine.
    """
    from .partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)

    def is_boundary(i):
        terms = None
        for k in range(CDC_WINDOW):
            t = (
                F.ascii(F.substring(F.col(text_col), i - F.lit(k), F.lit(1)))
                .cast("bigint") * (CDC_BASE ** k)
            )
            terms = t if terms is None else terms + t
        return (terms % CDC_MASK_MOD) == 0

    bounds = F.transform(
        F.filter(F.sequence(F.lit(CDC_WINDOW), F.length(text_col)),
                 is_boundary),
        lambda i: i.cast("bigint"),
    )
    return df.select(
        id_col,
        F.explode(bounds).alias("boundary_pos"),
    )


# Tracking parameters stripped during URL canonicalization (the
# CommonCrawl/WARC dedup convention: analytics noise, not content
# identity). Kept as a module constant so SQL oracles inline the same
# list.
URL_TRACKING_PARAMS_REGEX = r"^(utm_[^=]*|fbclid|gclid|msclkid)="


def canonical_url(col: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL, entirely JVM-side.

    The normalization ladder every crawl-dedup pipeline applies before
    URL-level dedup (reference analogue: upstream tile URIs are
    normalized once before the manifest diff —
    gfw_pixetl/models/layer_model.py source URI handling):

    - scheme and host lowercased
    - leading ``www.`` dropped
    - default ports (``:80`` http, ``:443`` https) dropped
    - fragment dropped
    - tracking params (``utm_*``/fbclid/gclid/msclkid) removed,
      remaining query params sorted bytewise
    - trailing slashes collapsed (root stays ``/``)

    Pure column expressions (regexp + HOF filter + array_sort) — no UDF,
    no shuffle; safe at any scale as a map-only projection.
    """
    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1))
    authority = F.regexp_extract(c, r"^[^:]+://([^/?#]*)", 1)
    host = F.regexp_replace(
        F.lower(F.regexp_extract(authority, r"^([^:]+)", 1)),
        r"^www\.", "")
    port = F.regexp_extract(authority, r":([0-9]+)$", 1)
    port_part = F.when(
        (port == "")
        | ((scheme == F.lit("https")) & (port == "443"))
        | ((scheme == F.lit("http")) & (port == "80")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    raw_path = F.regexp_extract(c, r"^[^:]+://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    raw_query = F.regexp_extract(c, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(raw_query, "&"),
        lambda p: (p != "") & ~p.rlike(URL_TRACKING_PARAMS_REGEX),
    )
    query = F.array_join(F.array_sort(params), "&")
    query_part = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), query))
    return F.concat(scheme, F.lit("://"), host, port_part, path, query_part)


# Compatibility-fold subset for text cleaning (the NFKC mappings a crawl
# pipeline hits constantly: fullwidth ASCII, typographic quotes/dashes,
# ellipsis, NBSP-family spaces). A documented SUBSET — full NFKC needs
# the Unicode tables; these cover the high-frequency cases and the
# mapping literals inline identically into SQL oracles.
_FOLD_ONE_TO_ONE = (
    # src, dst — 1:1 codepoints only (translate()-safe): NBSP,
    # figure space, narrow NBSP, ideographic space, curly quotes,
    # en/em dash, minus sign
    '\xa0\u2007\u202f\u3000‘’“”–—−',
    '    \'\'""---',
)
# fullwidth block: FF01-FF5E maps to ASCII 21-7E (generated, 1:1)
_FULLWIDTH_SRC = "".join(chr(c) for c in range(0xFF01, 0xFF5F))
_FULLWIDTH_DST = "".join(chr(c - 0xFEE0) for c in range(0xFF01, 0xFF5F))
# the U+2000-200A space family (en quad .. hair space), all -> ASCII space
_SPACE_FAMILY_SRC = "".join(chr(c) for c in range(0x2000, 0x200B))
_SPACE_FAMILY_DST = " " * len(_SPACE_FAMILY_SRC)
# multi-char expansions (regexp pass, applied before translate)
_FOLD_EXPANSIONS = (("…", "..."), ("«", '"'), ("»", '"'))


def fold_text(col: Column | str) -> Column:
    """NFKC-subset compatibility fold + whitespace squeeze, JVM-side.

    translate() for every 1:1 mapping (fullwidth ASCII, quotes, dashes,
    NBSP variants), literal replace for the expansions, then a
    whitespace collapse — the standard pre-tokenization cleanup (CCNet/
    fastText pipelines run full NFKC here). Map-only projection.
    """
    c = F.col(col) if isinstance(col, str) else col
    for src, dst in _FOLD_EXPANSIONS:
        c = F.replace(c, F.lit(src), F.lit(dst))
    c = F.translate(
        c, _FOLD_ONE_TO_ONE[0] + _FULLWIDTH_SRC + _SPACE_FAMILY_SRC,
        _FOLD_ONE_TO_ONE[1] + _FULLWIDTH_DST + _SPACE_FAMILY_DST)
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def fold_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`fold_text` (literals escaped, 'g' flag —
    Spark's regexp_replace is global by default, DuckDB's is not)."""
    e = expr
    for src, dst in _FOLD_EXPANSIONS:
        e = f"replace({e}, '{src}', '{dst}')"
    full_src = (_FOLD_ONE_TO_ONE[0] + _FULLWIDTH_SRC
                + _SPACE_FAMILY_SRC).replace("'", "''")
    full_dst = (_FOLD_ONE_TO_ONE[1] + _FULLWIDTH_DST
                + _SPACE_FAMILY_DST).replace("'", "''")
    e = f"translate({e}, '{full_src}', '{full_dst}')"
    return f"trim(regexp_replace({e}, '\\s+', ' ', 'g'))"


# --------------------------------------------------------------------------
# Readability (Flesch-Kincaid grade) — counting heuristics shared with
# the SQL oracle: words = maximal letter runs, sentences = maximal
# [.!?]+ runs (floored at 1), syllables = maximal vowel-group runs in
# the lowercased text. Regex literals are module constants so oracles
# inline the identical patterns.
# --------------------------------------------------------------------------
READ_WORD_REGEX = r"[A-Za-z]+"
READ_SENT_REGEX = r"[.!?]+"
READ_SYL_REGEX = r"[aeiouy]+"


def readability_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch-Kincaid grade level per document, entirely JVM-side.

    grade = 0.39 * (words / sentences) + 11.8 * (syllables / words)
            - 15.59

    with the counting heuristics above (the classic formula needs a
    dictionary-free syllable proxy; vowel-group runs are the standard
    one). All three counts are integers, the grade is two double
    divisions combined in a fixed order, so a SQL oracle replays the
    value bit-for-bit before rounding. Map-only projection — no
    shuffle, no UDF, safe at any corpus size; the quality-filtering
    stage (reference analogue: the calc-expression band filters,
    gfw_pixetl/models/layer_model.py calc strings) every curriculum /
    quality-mix pipeline runs.
    """
    c = F.col(text_col)
    n_words = F.regexp_count(c, F.lit(READ_WORD_REGEX))
    n_sents = F.greatest(F.regexp_count(c, F.lit(READ_SENT_REGEX)), F.lit(1))
    n_syl = F.regexp_count(F.lower(c), F.lit(READ_SYL_REGEX))
    grade = (
        F.lit(0.39) * (n_words.cast("double") / n_sents.cast("double"))
        + F.lit(11.8) * (n_syl.cast("double") / n_words.cast("double"))
        - F.lit(15.59)
    )
    return df.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        n_sents.cast("bigint").alias("n_sentences"),
        n_syl.cast("bigint").alias("n_syllables"),
        F.when(n_words > 0, F.round(grade, 6)).alias("fk_grade"),
    )


# --------------------------------------------------------------------------
# Registrable-domain extraction (public-suffix-list discipline). A
# documented SUBSET of the PSL: the multi-label suffixes a crawl
# pipeline hits constantly; the full list is a data file swap, not a
# code change. Longest-suffix-wins, exactly the PSL algorithm.
# --------------------------------------------------------------------------
PUBLIC_SUFFIXES = (
    "com", "org", "net", "io", "edu", "gov",
    "co.uk", "ac.uk", "gov.uk", "com.au", "org.au", "co.jp",
    "github.io", "blogspot.com", "s3.amazonaws.com",
)


def registrable_domain(col: Column | str) -> Column:
    """eTLD+1 of a lowercase hostname via longest-matching public
    suffix — the grouping key for host-level dedup / per-site caps
    (crawl pipelines rate-limit and dedup at the registrable domain,
    not the raw host, so ``a.blog.example.co.uk`` and
    ``example.co.uk`` collapse together).

    Pure column expressions: the suffix table is a literal array (HOF
    filter -> longest match via max-by-(length, name) struct ordering),
    the label before the suffix comes from one substring. Map-only —
    no UDF, no join, no shuffle. Hosts that ARE a bare public suffix
    (or match none) yield NULL.
    """
    host = F.lower(F.col(col) if isinstance(col, str) else col)
    sufs = F.array(*[F.lit(s) for s in PUBLIC_SUFFIXES])
    matched = F.filter(
        sufs, lambda s: host.endswith(F.concat(F.lit("."), s)))
    best = F.array_max(
        F.transform(matched, lambda s: F.struct(
            F.length(s).alias("l"), s.alias("s"))))["s"]
    # label = last dot-separated token before the suffix
    prefix = host.substr(
        F.lit(1), F.length(host) - F.length(best) - F.lit(1))
    label = F.regexp_extract(prefix, r"([^.]+)$", 1)
    return F.when(
        best.isNotNull() & (label != ""),
        F.concat(label, F.lit("."), best))


def markdown_to_text(col: Column | str) -> Column:
    """Markdown -> visible text as a PURE COLUMN EXPRESSION (chained
    regexp_replace — JVM-side, whole-stage codegen, no UDF): code
    fences and inline backticks drop their markers (content kept),
    images collapse to their alt text, links to their anchor text,
    ATX header markers / blockquote markers / list bullets strip,
    emphasis markers strip, and whitespace normalizes. Deterministic
    rule chain a SQL oracle replays verbatim (q376) — the README/docs
    corpus cleanup step before quality scoring."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"```[a-zA-Z0-9]*\n?", "")     # fence markers
    c = F.regexp_replace(c, r"`([^`]*)`", r"$1")           # inline code
    c = F.regexp_replace(c, r"!\[([^\]]*)\]\([^)]*\)", r"$1")  # images
    c = F.regexp_replace(c, r"\[([^\]]*)\]\([^)]*\)", r"$1")   # links
    c = F.regexp_replace(c, r"(?m)^#{1,6}\s*", "")         # ATX headers
    c = F.regexp_replace(c, r"(?m)^>\s?", "")              # blockquotes
    c = F.regexp_replace(c, r"(?m)^\s*[-*+]\s+", "")       # list bullets
    c = F.regexp_replace(c, r"\*\*([^*]*)\*\*", r"$1")     # bold
    c = F.regexp_replace(c, r"\*([^*]*)\*", r"$1")         # italic
    c = F.regexp_replace(c, r"__([^_]*)__", r"$1")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def suffix_blocklist_join(
    df: DataFrame, blocklist: DataFrame, host_col: str = "host",
    rule_col: str = "rule",
) -> DataFrame:
    """Domain-blocklist filter with SUFFIX matching: a host is blocked
    by rule R iff host == R or host ends with '.' + R — the semantics
    of every crawl blocklist (one rule covers all subdomains).

    Scale shape: the naive form is a LIKE-join (quadratic); this
    explodes each host into its dot-suffixes (bounded by label count,
    ~4-6 rows per host) and EQUI-joins the blocklist on the suffix —
    linear in corpus + blocklist, broadcastable or shuffled by the
    join key, AQE-skew-safe. For a literal in-query list the map-only
    ``registrable_domain``-style HOF is enough; the join form is the
    one that survives a 100M-rule blocklist.

    Returns df + (blocked boolean, block_rule = lexicographically
    first matching rule or NULL) with one row per input row — exact
    duplicates and NULLs in other columns included (the fold back to
    one row per input happens on a per-row id inside one linear
    lineage, never a null-unsafe equality rejoin on data columns).
    """
    labels = F.split(F.lower(F.col(host_col)), r"\.")
    n = F.size(labels)
    suffixes = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )
    rules = blocklist.select(
        F.lower(F.col(rule_col)).alias("_sfx"),
        F.lower(F.col(rule_col)).alias("_rule")).distinct()
    exploded = (
        df.withColumn("_rid", F.monotonically_increasing_id())
        .withColumn("_sfx", F.explode(suffixes))
        .join(rules, "_sfx", "left")
    )
    return (
        exploded.groupBy("_rid")
        .agg(*[F.first(c, ignorenulls=False).alias(c)
               for c in df.columns],
             F.min("_rule").alias("block_rule"))
        .drop("_rid")
        .withColumn("blocked", F.col("block_rule").isNotNull())
    )


# --------------------------------------------------------------------------
# BPE merge LEARNING (the train side of q229's apply side): iterative
# argmax over adjacent-pair frequencies on the word-frequency table,
# with the canonical left-to-right non-overlapping merge application.
# --------------------------------------------------------------------------
BPE_WORD_FILTER = r"^[A-Za-z]+$"


def _apply_merge(toks: Column, p1: str, p2: str) -> Column:
    """One BPE merge over a token array, as a Catalyst HOF fold: scan
    left to right, replacing each non-overlapping (p1, p2) adjacency
    with the concatenated symbol — exactly the reference BPE semantics
    (a freshly merged symbol can itself be the left side of the next
    match only if its NAME equals p1, which length makes impossible).
    Pure ``aggregate`` expression: JVM-side, no UDF."""
    merged = p1 + p2
    return F.aggregate(
        toks,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(p1))
            & (x == F.lit(p2)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(df: DataFrame, text_col: str = "text",
              n_merges: int = 4) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a corpus.

    Classic BPE training operates on the WORD-FREQUENCY table, not the
    corpus: the vocabulary is value-domain-sized however large the
    corpus, so after one fact-scale word count every iteration touches
    only vocab rows. Per iteration: explode adjacent symbol pairs
    (weighted by word count) -> hash agg -> argmax with a total
    deterministic tie-break (count DESC, pair ASC) -> collect ONE row
    (bounded metadata, the q160 k-means discipline) -> apply the merge
    with a Catalyst HOF fold and localCheckpoint the (small) vocab so
    plans stay flat. Returns one row per learned merge: (it, p1, p2,
    pair count, total corpus tokens after the merge).
    """
    spark = df.sparkSession
    vocab = (
        df.select(F.explode(words(text_col)).alias("w"))
        .filter(F.col("w").rlike(BPE_WORD_FILTER) & (F.length("w") >= 2))
        .groupBy(F.lower(F.col("w")).alias("word"))
        .agg(F.count("*").alias("cnt"))
        .select("word", "cnt", F.split("word", "").alias("toks"))
        .localCheckpoint()
    )

    # One job per round instead of three (§1.2): the argmax is a
    # hash-aggregated min(struct(-n, p1, p2)) — identical to the
    # (n DESC, p1, p2) sort-limit pick — and the post-merge corpus
    # token total is DERIVED instead of re-scanned:
    #   total = sum(cnt * len(toks)) = sum over pair rows of n
    #           + sum(cnt)            [len = n_pairs + 1 per word]
    # where sum(cnt) is constant across merges (the word set never
    # changes), so round it's total comes out of round it+1's pair
    # aggregation for free; only the LAST merge pays one extra
    # tiny sum. Values are exact integers throughout.
    cnt_total = vocab.agg(F.sum("cnt")).collect()[0][0] or 0

    def pair_stats(v):
        n_t = F.size("toks")
        pairs = (
            v.filter(n_t >= 2)
            .select(
                "cnt",
                F.explode(F.arrays_zip(
                    F.slice("toks", 1, n_t - 1).alias("p1"),
                    F.slice(F.col("toks"), 2, n_t - 1).alias("p2"),
                )).alias("pr"),
            )
            .groupBy(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
            .agg(F.sum("cnt").alias("n"))
        )
        row = pairs.agg(
            F.min(F.struct(
                (-F.col("n")).alias("neg_n"),
                F.col("p1").alias("p1"), F.col("p2").alias("p2"),
            )).alias("m"),
            F.sum("n").alias("w"),
        ).collect()[0]
        return row["m"], int(row["w"] or 0)

    out = []
    pending = None  # (it, p1, p2, n) awaiting its post-merge total
    for it in range(1, n_merges + 1):
        m, w = pair_stats(vocab)
        if pending is not None:
            out.append((*pending, w + cnt_total))
        if m is None:
            pending = None
            break
        vocab = vocab.withColumn(
            "toks", _apply_merge(F.col("toks"), m["p1"], m["p2"])
        ).localCheckpoint()
        pending = (it, m["p1"], m["p2"], int(-m["neg_n"]))
    if pending is not None:
        _m, w = pair_stats(vocab)
        out.append((*pending, w + cnt_total))
    return spark.createDataFrame(
        out, "it int, p1 string, p2 string, n bigint, total_tokens bigint")


def unigram_train(df: DataFrame, text_col: str = "text",
                  n_seed: int = 40, rounds: int = 2,
                  max_word: int = 8, max_piece: int = 4,
                  word_counts: DataFrame | None = None,
                  final_inventory: dict | None = None) -> DataFrame:
    """SentencePiece-style unigram-LM tokenizer training as distributed
    hard-EM (Viterbi E-step + count M-step) — the third major tokenizer
    family next to BPE (``bpe_train``) and WordPiece (q329).

    The Viterbi objective is the log-prob objective made INTEGER so the
    EM replays exactly in the SQL oracle: segmentations are ranked by
    (fewest pieces, then highest total piece frequency, then smallest
    segmentation string) — the dominant term of the unigram log-prob
    (each extra piece costs ~log(total) >> per-piece frequency deltas)
    with deterministic total tie-breaks instead of float logs, which
    would hash-drift across engines' libm.

    Scale shape (the q272/q160 discipline): EM runs on the
    WORD-FREQUENCY table — one fact-scale word count, then every round
    touches only value-domain rows. The piece inventory is bounded
    (alphabet + ``n_seed``) and rides into the E-step kernel as closure
    metadata; each round is one Arrow kernel pass over the word table
    plus one hash agg, and the only collects are inventory-sized.

    Seeding: all substrings of length 1..max_piece by weighted corpus
    frequency; the alphabet is always kept (every word must stay
    segmentable — the SentencePiece invariant); the top ``n_seed``
    multi-char pieces enter round 1. A multi-char piece whose count
    drops to zero is pruned at the end of the round.

    Returns (round, piece, cnt): the surviving inventory after each
    round's E-step with its usage counts.
    """
    spark = df.sparkSession
    if word_counts is not None:
        # caller-supplied (word, cnt) table with the same derivation
        # (unigram_apply shares one corpus explode between train and
        # the per-occurrence join) — caller is responsible for
        # checkpointing it
        word_tbl = word_counts
    else:
        word_tbl = (
            df.select(F.explode(words(text_col)).alias("w"))
            .filter(F.col("w").rlike(BPE_WORD_FILTER)
                    & (F.length("w") >= 2))
            .groupBy(F.substring(F.lower("w"), 1, max_word).alias("word"))
            .agg(F.count("*").alias("cnt"))
            .localCheckpoint()
        )
    n = F.length("word")
    sub_parts = [
        word_tbl.filter(n >= ln).select(
            "cnt",
            F.explode(F.expr(
                f"transform(sequence(1, length(word) - {ln} + 1), "
                f"i -> substring(word, i, {ln}))")).alias("piece"),
        )
        for ln in range(1, max_piece + 1)
    ]
    subs = sub_parts[0]
    for p in sub_parts[1:]:
        subs = subs.unionByName(p)
    freq = subs.groupBy("piece").agg(F.sum("cnt").alias("freq"))
    # ONE collect for the whole seed inventory: the alphabet arm and the
    # top-n multi-char arm union into a single bounded job (formerly two
    # actions over a checkpointed table)
    seed_rows = (
        freq.filter(F.length("piece") == 1)
        .unionByName(
            freq.filter(F.length("piece") > 1)
            .orderBy(F.col("freq").desc(), F.col("piece").asc())
            .limit(n_seed))
        .collect()  # bounded: alphabet + n_seed rows
    )
    chars = {r["piece"]: int(r["freq"]) for r in seed_rows
             if len(r["piece"]) == 1}
    multi = {r["piece"]: int(r["freq"]) for r in seed_rows
             if len(r["piece"]) > 1}

    def run_estep(inventory: dict) -> dict:
        """One Viterbi pass over the word table; returns piece counts."""
        inv = dict(inventory)

        def kernel(batches):
            import pandas as pd

            for pdf in batches:
                segs = []
                for word in pdf["word"]:
                    dp = [None] * (len(word) + 1)
                    dp[0] = (0, 0, "")
                    for j in range(1, len(word) + 1):
                        best = None
                        for ln in range(1, min(max_piece, j) + 1):
                            prev = dp[j - ln]
                            if prev is None:
                                continue
                            pc = word[j - ln:j]
                            w = inv.get(pc)
                            if w is None:
                                continue
                            cand = (prev[0] + 1, prev[1] - w,
                                    prev[2] + "|" + pc)
                            if best is None or cand < best:
                                best = cand
                        dp[j] = best
                    segs.append(dp[len(word)][2])
                yield pd.DataFrame({"word": pdf["word"],
                                    "cnt": pdf["cnt"], "seg": segs})

        seg_df = word_tbl.mapInPandas(
            kernel, "word string, cnt long, seg string")
        counts = (
            seg_df.select(
                "cnt",
                F.explode(F.filter(F.split("seg", r"\|"),
                                   lambda x: x != "")).alias("piece"))
            .groupBy("piece").agg(F.sum("cnt").alias("cnt"))
            .collect())  # bounded: <= |inventory| rows
        return {r["piece"]: int(r["cnt"]) for r in counts}

    out_rows = []
    inv_multi = dict(multi)
    inv_chars = dict(chars)
    for rnd in range(1, rounds + 1):
        counts = run_estep({**inv_chars, **inv_multi})
        inv_chars = {p: counts.get(p, 0) for p in inv_chars}
        inv_multi = {p: counts[p] for p in inv_multi if counts.get(p, 0)}
        out_rows += [(rnd, p, c) for p, c in inv_chars.items()]
        out_rows += [(rnd, p, c) for p, c in inv_multi.items()]
    if final_inventory is not None:
        # expose the last round's inventory to callers (unigram_apply)
        # without a re-collect of the result DataFrame
        final_inventory.update({**inv_chars, **inv_multi})
    return (spark.createDataFrame(
        out_rows, "round int, piece string, cnt bigint")
        .orderBy("round", "piece"))


def unigram_apply(df: DataFrame, text_col: str = "text",
                  n_seed: int = 40, rounds: int = 2,
                  max_word: int = 8, max_piece: int = 4) -> DataFrame:
    """Apply side of ``unigram_train``: train the same inventory, then
    segment EVERY word occurrence and report per-document token
    economics (words, Viterbi pieces, chars saved vs char-level).

    Scale shape: segmentation runs ONCE over the distinct-word table
    (value-domain-sized) under the final inventory; the per-occurrence
    expansion is a broadcast-friendly equi-join of the exploded corpus
    against that word->n_pieces map, then one hash agg by doc —
    fact-scale data crosses exactly two shuffles (explode agg + join
    agg), no per-occurrence Python.
    """
    spark = df.sparkSession
    word_occ = (
        df.select("doc_id", F.explode(words(text_col)).alias("w"))
        .filter(F.col("w").rlike(BPE_WORD_FILTER) & (F.length("w") >= 2))
        .select("doc_id",
                F.substring(F.lower("w"), 1, max_word).alias("word"))
        # feeds the train word-count table AND the per-occurrence
        # join; checkpoint so the explode+regex pass runs once
        .localCheckpoint(eager=False)
    )
    word_counts = (
        word_occ.groupBy("word").agg(F.count("*").alias("cnt"))
        .localCheckpoint()  # train's rounds re-read it (multi-pass EM)
    )
    # retrain (the EM is vocab-bound; see unigram_train) to recover
    # the final inventory: last round's chars + surviving multis —
    # sharing the word counts derived from THIS corpus explode (same
    # derivation unigram_train would build from df)
    final: dict = {}
    unigram_train(df, text_col, n_seed=n_seed, rounds=rounds,
                  max_word=max_word, max_piece=max_piece,
                  word_counts=word_counts, final_inventory=final)

    word_tbl = word_counts.select("word")  # distinct by construction

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            n_pieces = []
            for word in pdf["word"]:
                # only the piece COUNT is emitted, and the string
                # tie-break of the train kernel can never change it
                # (tied candidates share the count by definition), so
                # the DP drops the segmentation-string field
                dp = [None] * (len(word) + 1)
                dp[0] = (0, 0)
                for j in range(1, len(word) + 1):
                    best = None
                    for ln in range(1, min(max_piece, j) + 1):
                        prev = dp[j - ln]
                        if prev is None:
                            continue
                        wgt = final.get(word[j - ln:j])
                        if wgt is None:
                            continue
                        cand = (prev[0] + 1, prev[1] - wgt)
                        if best is None or cand < best:
                            best = cand
                    dp[j] = best
                n_pieces.append(dp[len(word)][0])
            yield pd.DataFrame({"word": pdf["word"],
                                "n_pieces": n_pieces})

    seg = word_tbl.mapInPandas(kernel, "word string, n_pieces int")
    return (
        word_occ.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_words"),
             F.sum("n_pieces").alias("n_pieces"),
             F.sum(F.length("word")).alias("n_chars"))
        .select("doc_id", "n_words", "n_pieces", "n_chars",
                (F.col("n_chars") - F.col("n_pieces"))
                .alias("chars_saved"))
        .orderBy("doc_id")
    )

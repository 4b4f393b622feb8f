"""Web-crawl curation harness queries: WARC/HTML, robots, blocklists,
URL canonicalization, CDX lookup, governance, PII/secret scans.

Split out of the former textops.py (round 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from . import load, register
from .lakeops import _derived_dir

# --------------------------------------------------------------------------
# q371 — WARC INGEST (ISO 28500 / Common Crawl layout): each doc rides
# as an HTTP response record inside a per-record-gzip-member WARC
# (sources/warc.py). The kernel runs the REAL chain — gzip member
# index (the random-access index an ingest persists), WARC framing
# parse, HTTP/1.1 status+header+body split — and the oracle replays
# the analytic facts: member count, status by doc_id, body length and
# an md5 probe of the exact body bytes. This is the INGEST boundary of
# a 100 TB text pipeline; at scale each record is one ranged GET + one
# inflate, exactly what member_index enables.
# --------------------------------------------------------------------------
WARC_SCHEMA = ("doc_id long, n_members int, status int, ctype string, "
               "body_bytes int, body_sig int, n_parsed int, "
               "n_bad_members int")


@register(
    "q371_warc_ingest",
    oracle="""
    SELECT doc_id, CAST(2 AS INT) AS n_members,
           CAST(CASE WHEN doc_id % 4 = 1 THEN 404 ELSE 200 END AS INT)
               AS status,
           'text/html' AS ctype,
           CAST(length('<p>' || text || '</p>') AS INT) AS body_bytes,
           ('0x' || substr(md5('<p>' || text || '</p>'), 1, 4))::INT
               AS body_sig,
           CAST(2 AS INT) AS n_parsed,
           CAST(1 AS INT) AS n_bad_members
    FROM documents
    """,
)
def q371(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib as _hashlib

    from ..functions.partitioning import ensure_min_partitions
    from ..sources.warc import (
        http_response_bytes, member_index, parse_http_response, scan_warc,
        write_warc,
    )

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_members", "status",
                                   "ctype", "body_bytes", "body_sig",
                                   "n_parsed", "n_bad_members")}
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                body = f"<p>{t}</p>".encode()
                status = 404 if doc_id % 4 == 1 else 200
                warc = write_warc([{
                    "type": "response",
                    "uri": f"https://example.org/{doc_id}",
                    "payload": http_response_bytes(body, status=status),
                }])
                n_members = len(member_index(warc))
                # real archives carry damage: append a TRUNCATED gzip
                # member so the lenient scan's skip-and-count contract
                # is exercised on every doc (counters are analytic: the
                # 2 intact records parse, the stub counts as 1 bad)
                damaged = warc + b"\x1f\x8b\x08" + b"\x00" * 5
                records, counters = scan_warc(damaged)
                got = None
                for headers, payload in records:
                    if headers.get("WARC-Type") == "response":
                        got = parse_http_response(payload)
                st, hh, bb = got
                out["doc_id"].append(doc_id)
                out["n_members"].append(n_members)
                out["status"].append(st)
                out["ctype"].append(hh["content-type"])
                # characters, matching the oracle's length() semantics
                out["body_bytes"].append(
                    len(bb.decode("utf-8", "strict")))
                out["body_sig"].append(
                    int(_hashlib.md5(bb).hexdigest()[:4], 16))
                out["n_parsed"].append(counters["n_records"])
                out["n_bad_members"].append(counters["bad_gzip_members"])
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, WARC_SCHEMA)


# --------------------------------------------------------------------------
# q372 — HTML TEXT EXTRACTION + link density (functions/html.py): each
# doc renders as a deterministic page (title, heading, its text in a
# <p>, two links, a dropped <script> and a comment); the kernel runs
# the real tag/entity/whitespace state machine and the oracle builds
# the expected visible text ANALYTICALLY from the same fields — a
# parser bug cannot hide on both sides. Link density = link chars /
# visible chars, the classic boilerplate signal.
# --------------------------------------------------------------------------
@register(
    "q372_html_extract",
    oracle="""
    SELECT doc_id,
           'Title Doc ' || CAST(doc_id % 100 AS VARCHAR) || ' ' || text
               || ' link A B&C' AS text,
           CAST(length('Title Doc ' || CAST(doc_id % 100 AS VARCHAR)
                       || ' ' || text || ' link A B&C') AS INT)
               AS n_chars,
           CAST(9 AS INT) AS link_chars,
           round(9.0 / length('Title Doc '
                 || CAST(doc_id % 100 AS VARCHAR) || ' ' || text
                 || ' link A B&C'), 6) AS link_density
    FROM documents
    """,
)
def q372(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.html import html_extract

    docs = load(spark, sf_dir, "documents")
    page = F.concat(
        F.lit("<html><head><title>Title</title>"
              "<script>var x = 1;</script></head><body><h1>Doc "),
        (F.col("doc_id") % 100).cast("string"),
        F.lit("</h1><p>"), F.col("text"),
        F.lit('</p><a href="/x">link A</a> <a href="/y">B&amp;C</a>'
              "<!-- hidden --></body></html>"),
    )
    return html_extract(docs.select("doc_id", page.alias("html")))


# --------------------------------------------------------------------------
# q370 — robots.txt EVALUATION (RFC 9309): the crawl-legality audit.
# Each source publishes a deterministic robots.txt (group selection,
# Allow/Disallow with '*' and '$' wildcards, longest-match decision,
# Allow wins ties); each doc derives one of five path shapes. The
# kernel runs the REAL RFC parser+matcher (functions/robots.py); the
# oracle replays the DECISION TABLE analytically (never the parser —
# q251's move), so a grammar bug cannot hide on both sides. Decisions:
#   /data/N        -> allowed   (no rule matches)
#   /private/a     -> blocked   (Disallow /private/, len 9)
#   /private/ok/b  -> allowed   (Allow /private/ok/ len 12 > 9)
#   /files/cN.tmp  -> blocked   (Disallow /*.tmp$ wildcard+anchor)
#   /              -> allowed
# src7 additionally blocks everything for agent 'gfwbot' via a MORE
# SPECIFIC user-agent group (prefix match beats the '*' group).
# --------------------------------------------------------------------------
_ROBOTS_TXT = (
    "User-agent: gfwbot-fast\nDisallow: /\n\n"      # more specific agent
    "User-agent: *\n"
    "Disallow: /private/\n"
    "Allow: /private/ok/\n"
    "Disallow: /*.tmp$\n"
    "Crawl-delay: 5\n"                               # ignored directive
)
_ROBOTS_TXT_SRC7 = "User-agent: gfwbot\nDisallow: /\n\n" + _ROBOTS_TXT


@register(
    "q370_robots_rules",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             CASE doc_id % 5
               WHEN 0 THEN '/data/' || CAST(doc_id % 40 AS VARCHAR)
               WHEN 1 THEN '/private/a'
               WHEN 2 THEN '/private/ok/b'
               WHEN 3 THEN '/files/c' || CAST(doc_id % 7 AS VARCHAR)
                           || '.tmp'
               ELSE '/' END AS path
      FROM documents
    )
    SELECT doc_id, path,
           CASE WHEN source = 'src7' THEN FALSE
                WHEN doc_id % 5 = 1 THEN FALSE
                WHEN doc_id % 5 = 3 THEN FALSE
                ELSE TRUE END AS allowed
    FROM d
    """,
)
def q370(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.robots import robots_filter

    docs = load(spark, sf_dir, "documents")
    path = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("/data/"),
                        (F.col("doc_id") % 40).cast("string")))
        .when(F.col("doc_id") % 5 == 1, F.lit("/private/a"))
        .when(F.col("doc_id") % 5 == 2, F.lit("/private/ok/b"))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(F.lit("/files/c"),
                       (F.col("doc_id") % 7).cast("string"),
                       F.lit(".tmp")))
        .otherwise(F.lit("/"))
    )
    robots = F.when(F.col("source") == "src7",
                    F.lit(_ROBOTS_TXT_SRC7)).otherwise(F.lit(_ROBOTS_TXT))
    from ..functions.partitioning import ensure_min_partitions

    pages = ensure_min_partitions(docs.select(
        "doc_id", path.alias("path"), robots.alias("robots_txt")))
    out = robots_filter(pages, agent="gfwbot")
    return out.select("doc_id", "path", "allowed")


# --------------------------------------------------------------------------
# q368 — DOMAIN BLOCKLIST with SUFFIX matching: the crawl pipeline's
# first filter. Hosts are lang.source.example.com; rules block a whole
# subtree ('src3.example.com' covers every lang under src3) or one
# exact host. The operator explodes each host into its dot-suffixes
# (bounded by label count) and EQUI-joins the blocklist — the shape
# that survives a 100M-rule list, vs the quadratic LIKE-join. The
# oracle replays the suffix semantics with an EXISTS over a VALUES
# list; per-host aggregation is value-domain-sized.
# --------------------------------------------------------------------------
_BLOCK_RULES = ["src3.example.com", "en.src1.example.com", "badtld.net"]


@register(
    "q368_domain_blocklist",
    oracle=f"""
    WITH hosts AS (
      SELECT doc_id,
             lang || '.' || source || '.example.com' AS host
      FROM documents
    ), rules AS (
      SELECT unnest(['{"', '".join(_BLOCK_RULES)}']) AS rule
    ), m AS (
      SELECT h.doc_id, h.host,
             (SELECT MIN(rule) FROM rules r
              WHERE h.host = r.rule
                 OR h.host LIKE '%.' || r.rule) AS block_rule
      FROM hosts h
    )
    SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs,
           block_rule IS NOT NULL AS blocked, block_rule
    FROM m GROUP BY host, block_rule
    ORDER BY host
    """,
)
def q368(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import suffix_blocklist_join

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("lang"), F.lit("."), F.col("source"),
                 F.lit(".example.com")).alias("host"))
    rules = spark.createDataFrame([(r,) for r in _BLOCK_RULES],
                                  "rule string")
    out = suffix_blocklist_join(docs, F.broadcast(rules))
    return (
        out.groupBy("host", "block_rule")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .select("host", "n_docs",
                F.col("block_rule").isNotNull().alias("blocked"),
                "block_rule")
        .orderBy("host")
    )


# --------------------------------------------------------------------------
# q251 — URL CANONICALIZATION + host-level dedup, the step every crawl
# pipeline runs before any content dedup (trafilatura/CCNet drop
# tracking params and case noise so the same page fetched four ways
# counts once). Each doc synthesizes one of four deterministic messy
# variants of its page URL (case noise, default port, trailing slash,
# utm/gclid params, fragment, param order); `T.canonical_url` — pure
# regexp/HOF column expressions, map-only, no UDF — collapses the three
# https variants to one canonical form while the http variant stays
# distinct. The oracle does NOT replay the parser: it constructs the
# expected canonical strings analytically from the variant table, so a
# parser bug cannot hide on both sides. Per-host aggregation is
# value-domain-sized (~#sources); MIN(canonical) value-checks exact
# output bytes.
# --------------------------------------------------------------------------
@register(
    "q251_url_canonicalize",
    oracle="""
    WITH urls AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 4 = 3
                  THEN 'http://' || source || '.example.com/data/'
                       || CAST(doc_id % 40 AS VARCHAR) || '?a=1&b=2'
                  ELSE 'https://' || source || '.example.com/data/'
                       || CAST(doc_id % 40 AS VARCHAR) || '?a=1&b=2'
             END AS canonical
      FROM documents
    )
    SELECT source || '.example.com' AS host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT canonical) AS BIGINT) AS n_canonical,
           MIN(canonical) AS first_url
    FROM urls
    GROUP BY 1
    ORDER BY host
    """,
)
def q251(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n = F.col("doc_id") % 40
    messy = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(
            F.lit("https://www."), F.col("source"),
            F.lit(".example.com/data/"), n.cast("string"),
            F.lit("?b=2&a=1")))
        .when(F.col("doc_id") % 4 == 1, F.concat(
            F.lit("HTTPS://WWW."), F.col("source"),
            F.lit(".Example.COM:443/data/"), n.cast("string"),
            F.lit("/?a=1&utm_source=feed&b=2#top")))
        .when(F.col("doc_id") % 4 == 2, F.concat(
            F.lit("https://"), F.col("source"),
            F.lit(".example.com/data/"), n.cast("string"),
            F.lit("?a=1&b=2&gclid=abc")))
        .otherwise(F.concat(
            F.lit("http://"), F.col("source"),
            F.lit(".example.com:80/data/"), n.cast("string"),
            F.lit("?b=2&a=1")))
    )
    canon = docs.select(
        "doc_id", "source", T.canonical_url(messy).alias("canonical"))
    host = F.regexp_extract(F.col("canonical"), r"^[^:]+://([^/:?#]*)", 1)
    return (
        canon.groupBy(host.alias("host"))
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.countDistinct("canonical").cast("bigint")
             .alias("n_canonical"),
             F.min("canonical").alias("first_url"))
        .orderBy("host")
    )


# --------------------------------------------------------------------------
# q271 — REGISTRABLE DOMAIN (eTLD+1) grouping: each doc synthesizes one
# of five deterministic messy hosts (case noise, deep subdomains, a
# multi-label co.uk suffix, a github.io private suffix); the engine
# runs the real longest-suffix-wins PSL-subset parser
# (text.py::registrable_domain — literal-array HOF, map-only, no UDF)
# while the oracle constructs the expected eTLD+1 strings analytically
# from the variant table — a parser bug cannot hide on both sides
# (q251's discipline). Two variants share a registrable domain, so the
# per-domain host count proves subdomains actually collapse.
# --------------------------------------------------------------------------
@register(
    "q271_registrable_domain",
    oracle="""
    WITH v AS (
      SELECT doc_id, source,
             CASE CAST(doc_id % 5 AS INT)
               WHEN 0 THEN source || '.com'
               WHEN 1 THEN source || '.co.uk'
               WHEN 2 THEN source || '.github.io'
               WHEN 3 THEN source || '.org'
               ELSE source || '.com' END AS reg,
             CASE CAST(doc_id % 5 AS INT)
               WHEN 0 THEN 'www.' || source || '.com'
               WHEN 1 THEN 'blog.' || source || '.co.uk'
               WHEN 2 THEN source || '.github.io'
               WHEN 3 THEN 'a.b.' || source || '.org'
               ELSE 'cdn.assets.' || source || '.com' END AS host
      FROM documents
    )
    SELECT reg AS registrable, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
    FROM v GROUP BY 1 ORDER BY 1
    """,
)
def q271(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    host = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("WWW."), F.col("source"), F.lit(".Com")))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("Blog."), F.col("source"), F.lit(".CO.UK")))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.col("source"), F.lit(".github.io")))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(F.lit("a.b."), F.col("source"), F.lit(".org")))
        .otherwise(
            F.concat(F.lit("cdn.assets."), F.col("source"), F.lit(".com")))
    )
    hosts = docs.select(
        F.lower(host).alias("host"),
        T.registrable_domain(host).alias("registrable"))
    return (
        hosts.groupBy("registrable")
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.countDistinct("host").cast("bigint").alias("n_hosts"))
        .orderBy("registrable")
    )


# --------------------------------------------------------------------------
# q326 — SECRET / CREDENTIAL SCAN (the scrub every LLM crawl pipeline
# runs before training: leaked API keys are high-entropy base64-ish
# runs): docs in the doc_id % 7 == 0 class carry a deterministic
# 32-hex-char fake token; the detector — regexp candidate extraction
# ([A-Za-z0-9+/=]{{24,}}), per-candidate character histogram (one
# shrinking (doc, token, char) agg), Shannon entropy, threshold 3.0 on
# the ROUNDED value so both engines make the identical boundary
# decision — runs over the constructed text on both sides. English
# words never pass the length gate; hex tokens sit near 4 bits/char.
# --------------------------------------------------------------------------
_SECRET_RE = "[A-Za-z0-9+/=]{24,}"


@register(
    "q326_secret_scan",
    oracle=f"""
    WITH v AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN text || ' api_key=' || md5(CAST(doc_id AS VARCHAR))
                  ELSE text END AS t
      FROM documents
    ), cand AS (
      SELECT doc_id, unnest(regexp_extract_all(t, '{_SECRET_RE}')) AS tok
      FROM v
    ), ch AS (
      SELECT doc_id, tok,
             unnest(list_transform(generate_series(1, len(tok)),
                                   i -> substr(tok, i, 1))) AS c
      FROM cand
    ), hist AS (
      SELECT doc_id, tok, c, COUNT(*) AS k FROM ch GROUP BY 1, 2, 3
    ), tot AS (
      SELECT doc_id, tok, SUM(k) AS n, COUNT(*) AS n_distinct
      FROM hist GROUP BY doc_id, tok
    ), ent AS (
      SELECT h.doc_id, h.tok, MAX(t.n) AS n,
             MAX(t.n_distinct) AS n_distinct,
             round(SUM(-(CAST(h.k AS DOUBLE) / t.n)
                       * log2(CAST(h.k AS DOUBLE) / t.n)), 6) AS entropy
      FROM hist h JOIN tot t USING (doc_id, tok)
      GROUP BY h.doc_id, h.tok
    )
    SELECT doc_id, tok,
           CAST(n AS BIGINT) AS n_chars,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           entropy, (entropy >= 3.0) AS is_secret
    FROM ent ORDER BY doc_id, tok
    """,
)
def q326(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit(" api_key="),
                        F.md5(F.col("doc_id").cast("string")))
               ).otherwise(F.col("text"))
    cand = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(t, F.lit(_SECRET_RE), F.lit(0)))
        .alias("tok"))
    ch = cand.select(
        "doc_id", "tok",
        F.explode(F.expr(
            "transform(sequence(1, length(tok)),"
            " i -> substring(tok, i, 1))")).alias("c"))
    hist = ch.groupBy("doc_id", "tok", "c").agg(F.count("*").alias("k"))
    wt = Window.partitionBy("doc_id", "tok")
    p = F.col("k").cast("double") / F.sum("k").over(wt)
    ent = (
        hist.select("doc_id", "tok", "k", (-p * F.log2(p)).alias("term"))
        .groupBy("doc_id", "tok")
        .agg(F.sum("k").cast("bigint").alias("n_chars"),
             F.count("*").cast("bigint").alias("n_distinct"),
             F.round(F.sum("term"), 6).alias("entropy"))
    )
    return ent.select(
        "doc_id", "tok", "n_chars", "n_distinct", "entropy",
        (F.col("entropy") >= 3.0).alias("is_secret"),
    ).orderBy("doc_id", "tok")


# --------------------------------------------------------------------------
# q333 — LUHN CHECKSUM PII DETECTION (the presidio-style credit-card
# validator that separates real card numbers from random digit runs):
# docs in the doc_id % 11 == 0 class carry a VALID 16-digit number
# (15 md5-derived digits + the computed Luhn check digit), the % 11 ==
# 5 class carries the same number with the check digit corrupted (+1
# mod 10); the detector regexp-extracts 16-digit candidates and
# verifies the mod-10 double-every-second-from-the-right sum. Pure
# integer digit arithmetic unrolled 16 ways — identical on both
# engines; the oracle replays construction AND verification.
# --------------------------------------------------------------------------
def _luhn_terms_sql(digit_expr_fmt: str, n: int) -> str:
    """Sum of Luhn-weighted digits i=1..n (i odd -> doubled, fold >9)."""
    terms = []
    for i in range(1, n + 1):
        d = digit_expr_fmt.format(i=i)
        if i % 2 == 1:
            terms.append(f"(CASE WHEN 2 * {d} > 9 THEN 2 * {d} - 9"
                         f" ELSE 2 * {d} END)")
        else:
            terms.append(f"({d})")
    return " + ".join(terms)


_L_BASE_D = ("(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), {i}, 1))"
             " AS BIGINT) % 10)")
_L_BASE15 = " || ".join(
    f"CAST({_L_BASE_D.format(i=i)} AS VARCHAR)" for i in range(1, 16))
_L_S15 = _luhn_terms_sql(_L_BASE_D, 15)
_L_CAND_D = "CAST(substr(tok, {i}, 1) AS BIGINT)"


@register(
    "q333_luhn_pii",
    oracle=f"""
    WITH v AS (
      SELECT doc_id,
             CASE
               WHEN doc_id % 11 = 0 THEN text || ' card=' || {_L_BASE15}
                 || CAST((10 - ({_L_S15}) % 10) % 10 AS VARCHAR)
               WHEN doc_id % 11 = 5 THEN text || ' card=' || {_L_BASE15}
                 || CAST((11 - ({_L_S15}) % 10) % 10 AS VARCHAR)
               ELSE text END AS t
      FROM documents
    ), cand AS (
      SELECT doc_id, unnest(regexp_extract_all(t, '[0-9]{{16}}')) AS tok
      FROM v
    )
    SELECT doc_id, tok,
           (({_luhn_terms_sql(_L_CAND_D, 16)}) % 10 = 0) AS luhn_valid
    FROM cand ORDER BY doc_id, tok
    """,
)
def q333(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")

    def base_digit(i: int) -> F.Column:
        return (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                                   i, 1), 16, 10).cast("bigint") % 10)

    def luhn_sum(digit, n: int) -> F.Column:
        s = None
        for i in range(1, n + 1):
            d = digit(i)
            t = F.when(2 * d > 9, 2 * d - 9).otherwise(2 * d) \
                if i % 2 == 1 else d
            s = t if s is None else s + t
        return s

    base15 = F.concat(*[base_digit(i).cast("string")
                        for i in range(1, 16)])
    s15 = luhn_sum(base_digit, 15)
    t = (
        F.when(F.col("doc_id") % 11 == 0,
               F.concat(F.col("text"), F.lit(" card="), base15,
                        ((10 - s15 % 10) % 10).cast("string")))
        .when(F.col("doc_id") % 11 == 5,
              F.concat(F.col("text"), F.lit(" card="), base15,
                       ((11 - s15 % 10) % 10).cast("string")))
        .otherwise(F.col("text"))
    )
    cand = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(t, F.lit("[0-9]{16}"), F.lit(0)))
        .alias("tok"))
    tok_digit = lambda i: F.substring("tok", i, 1).cast("bigint")  # noqa: E731
    return cand.select(
        "doc_id", "tok",
        (luhn_sum(tok_digit, 16) % 10 == 0).alias("luhn_valid"),
    ).orderBy("doc_id", "tok")


# --------------------------------------------------------------------------
# q418 — Content-Encoding DECODE AT THE CRAWL BOUNDARY (brotli/gzip/
# identity): WARC captures preserve the server's wire encoding, and
# the fastest-growing slice of the modern web ships
# ``Content-Encoding: br``. Each doc becomes an HTTP response record
# whose body is encoded per doc_id (br via libbrotli when available —
# exercising sources/brotli.py against the reference encoder's real
# dictionary/context-map output — else via our own compressor; gzip;
# identity), wrapped in a per-member-gzip WARC. The kernel runs the
# REAL chain: member walk -> HTTP split -> Content-Encoding dispatch
# (sources/brotli.py::decode_content_encoding) -> byte-exact body
# check; a second flag round-trips OUR entropy-coded brotli COMPRESSOR
# through libbrotli's decoder so both directions of the codec meet in
# one record. At 100 TB each record is one ranged GET + one inflate +
# one br decode — per-record parallel, no cross-record state.
# --------------------------------------------------------------------------
BR_SCHEMA = ("doc_id long, encoding string, body_bytes int, "
             "body_sig int, decoded_ok boolean, store_ok boolean")


@register(
    "q418_content_encoding_br",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'br'
                WHEN doc_id % 3 = 1 THEN 'gzip'
                ELSE 'identity' END AS encoding,
           CAST(length('<p>' || text || '</p>') AS INT) AS body_bytes,
           ('0x' || substr(md5('<p>' || text || '</p>'), 1, 4))::INT
               AS body_sig,
           TRUE AS decoded_ok,
           TRUE AS store_ok
    FROM documents
    """,
)
def q418(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import gzip as _gzip
        import hashlib as _hashlib

        import pandas as pd

        from ..sources.brotli import (
            compress, decode_content_encoding, decompress,
        )
        from ..sources.warc import (
            http_response_bytes, iter_warc, parse_http_response,
            write_warc,
        )

        try:  # real entropy-coded br (dictionary + context maps)
            import pyarrow as pa

            _codec = pa.Codec("brotli", compression_level=5)

            def br_enc(b: bytes) -> bytes:
                return bytes(_codec.compress(b))

            def br_dec_ref(b: bytes, n: int) -> bytes:
                return bytes(pa.Codec("brotli").decompress(b, n))
        except Exception:  # our own entropy coder: same contract
            br_enc = compress
            br_dec_ref = lambda b, n: decompress(b)  # noqa: E731

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "encoding", "body_bytes",
                                   "body_sig", "decoded_ok", "store_ok")}
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                body = f"<p>{t}</p>".encode()
                enc_name = ("br", "gzip", "identity")[doc_id % 3]
                wire = {"br": br_enc,
                        "gzip": _gzip.compress,
                        "identity": lambda b: b}[enc_name](body)
                warc = write_warc([{
                    "type": "response",
                    "uri": f"https://example.org/{doc_id}",
                    "payload": http_response_bytes(
                        wire, extra_headers={"Content-Encoding": enc_name}),
                }])
                decoded = None
                for headers, payload in iter_warc(warc):
                    if headers.get("WARC-Type") == "response":
                        _, hh, wire_body = parse_http_response(payload)
                        decoded = decode_content_encoding(
                            wire_body, hh.get("content-encoding", ""))
                # OUR entropy-coded brotli (greedy LZ77 + canonical
                # prefix codes) decoded by the REFERENCE decoder —
                # both directions of the codec meet in one record
                store_ok = br_dec_ref(compress(body), len(body)) == body
                out["doc_id"].append(doc_id)
                out["encoding"].append(enc_name)
                # characters, matching the oracle's length() semantics
                # (bytes == chars only while the corpus is ASCII)
                out["body_bytes"].append(
                    len(body.decode("utf-8", "strict")))
                out["body_sig"].append(
                    int(_hashlib.md5(body).hexdigest()[:4], 16))
                out["decoded_ok"].append(decoded == body)
                out["store_ok"].append(bool(store_ok))
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, BR_SCHEMA)


# --------------------------------------------------------------------------
# q419 — CDX INDEX LOOKUP (the Common Crawl capture index as a TABLE):
# the corpus is sharded once into per-member-gzip WARC files, each with
# a sorted CDXJ sidecar (sources/commoncrawl.py: SURT keys, per-record
# offset/length, sha1 payload digests). The query is the 100 TB lookup
# shape: the index is read as a DataFrame (pure column-expression
# parsing of `key ts {json}` lines), the request keys are constructed
# ANALYTICALLY (concat on doc_id — the join succeeding for every doc
# proves the Python surt() and the analytic key agree) and BROADCAST
# against the index, and only the matched rows pay a ranged read:
# seek(offset) + read(length) + one inflate + a digest check. At crawl
# scale the index is billions of rows and this plan never scans a
# payload byte for an unmatched capture.
# --------------------------------------------------------------------------
CDX_SCHEMA = ("doc_id long, surt_key string, status int, mime string, "
              "body_bytes int, digest_ok boolean")


def _ccwarc_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os as _os

        _os.makedirs(d, exist_ok=True)
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")

        def writer(batches):
            import pandas as pd

            from ..sources.commoncrawl import build_cdxj
            from ..sources.warc import http_response_bytes, write_warc

            for pdf in batches:
                rows = pdf.to_dict("records")
                if not rows:
                    continue
                recs = [{
                    "type": "response",
                    "uri": (f"https://www.Example.org/doc/"
                            f"{int(r['doc_id'])}?b=2&a=1"),
                    "payload": http_response_bytes(
                        f"<p>{r['text']}</p>".encode()),
                } for r in rows]
                lo = min(int(r["doc_id"]) for r in rows)
                name = f"shard-{lo:08d}.warc.gz"
                blob = write_warc(recs)
                with open(_os.path.join(d, name), "wb") as f:
                    f.write(blob)
                lines = build_cdxj(blob, name)
                with open(_os.path.join(d, name.replace(
                        ".warc.gz", ".cdxj")), "w") as f:
                    f.write("\n".join(lines) + "\n")
                yield pd.DataFrame({"n": [len(recs)]})

        docs.repartition(8, "doc_id").mapInPandas(
            writer, "n long").collect()

    return _derived_dir(sf_dir, "ccwarc", build)


@register(
    "q419_cdx_lookup",
    oracle="""
    SELECT doc_id,
           'org,example)/doc/' || CAST(doc_id AS VARCHAR) || '?a=1&b=2'
               AS surt_key,
           CAST(200 AS INT) AS status,
           'text/html' AS mime,
           CAST(length('<p>' || text || '</p>') AS INT) AS body_bytes,
           TRUE AS digest_ok
    FROM documents
    """,
)
def q419(spark: SparkSession, sf_dir: str) -> DataFrame:
    shard_dir = _ccwarc_dir(spark, sf_dir)

    # the index as a table: one row per capture, parsed with column
    # expressions only (split + get_json_object — codegen'd, no UDF)
    cdx = (
        spark.read.text(f"{shard_dir}/*.cdxj")
        .withColumn("key", F.split("value", " ", 3).getItem(0))
        .withColumn("blob", F.split("value", " ", 3).getItem(2))
        .select(
            "key",
            F.get_json_object("blob", "$.status").cast("int")
             .alias("status"),
            F.get_json_object("blob", "$.mime").alias("mime"),
            F.get_json_object("blob", "$.digest").alias("digest"),
            F.get_json_object("blob", "$.offset").cast("long")
             .alias("offset"),
            F.get_json_object("blob", "$.length").cast("long")
             .alias("length"),
            F.get_json_object("blob", "$.filename").alias("filename"),
        )
    )

    # analytic request keys, broadcast against the big index side
    keys = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("org,example)/doc/"),
                 F.col("doc_id").cast("string"),
                 F.lit("?a=1&b=2")).alias("surt_key"),
    )
    hits = cdx.join(F.broadcast(keys), cdx.key == keys.surt_key)

    def fetch(batches):
        import os as _os

        import pandas as pd

        from ..sources.commoncrawl import payload_digest, ranged_fetch
        from ..sources.warc import parse_http_response

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "surt_key", "status",
                                   "mime", "body_bytes", "digest_ok")}
            for r in pdf.to_dict("records"):
                path = _os.path.join(shard_dir, r["filename"])
                with open(path, "rb") as f:       # the ranged GET
                    f.seek(int(r["offset"]))
                    member = f.read(int(r["length"]))
                _headers, payload = ranged_fetch(member, 0, len(member))
                st, _hh, body = parse_http_response(payload)
                out["doc_id"].append(r["doc_id"])
                out["surt_key"].append(r["surt_key"])
                out["status"].append(st)
                out["mime"].append(r["mime"])
                # characters, matching the oracle's length() semantics
                out["body_bytes"].append(
                    len(body.decode("utf-8", "strict")))
                out["digest_ok"].append(
                    payload_digest(payload) == r["digest"]
                    and st == int(r["status"]))
            yield pd.DataFrame(out)

    return hits.mapInPandas(fetch, CDX_SCHEMA)


# --------------------------------------------------------------------------
# q420 — WET/WAT DERIVATION (what text pipelines actually read): each
# doc's HTML response becomes (a) a WET conversion record carrying the
# extracted plain text and (b) a WAT metadata record carrying the JSON
# envelope (status, HTTP headers, title, outlinks). The kernel runs
# the full chain — render, WARC-wrap, extract, WET/WAT write, re-read
# through the ordinary WARC reader, JSON re-parse — and the oracle
# replays the visible text and link count ANALYTICALLY from the same
# fields (q372's discipline: a parser bug cannot hide on both sides).
# --------------------------------------------------------------------------
WETWAT_SCHEMA = ("doc_id long, wet_text string, wet_chars int, "
                 "title string, n_links int, refers_ok boolean")


@register(
    "q420_wet_wat",
    oracle="""
    SELECT doc_id,
           'Doc ' || CAST(doc_id % 100 AS VARCHAR) || ' Heading ' || text
               || ' next more' AS wet_text,
           CAST(length('Doc ' || CAST(doc_id % 100 AS VARCHAR)
                || ' Heading ' || text || ' next more') AS INT)
               AS wet_chars,
           'Doc ' || CAST(doc_id % 100 AS VARCHAR) AS title,
           CAST(2 AS INT) AS n_links,
           TRUE AS refers_ok
    FROM documents
    """,
)
def q420(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import gzip as _gzip
        import io as _io
        import json as _json

        import pandas as pd

        from ..functions.html import extract_text
        from ..sources.commoncrawl import (
            wat_envelope, wat_record, wet_record,
        )
        from ..sources.warc import (
            http_response_bytes, iter_warc, parse_http_response,
            write_warc,
        )

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "wet_text", "wet_chars",
                                   "title", "n_links", "refers_ok")}
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                title = f"Doc {doc_id % 100}"
                links = [f"https://example.org/{doc_id + 1}",
                         f"https://example.org/{doc_id + 2}"]
                html = (f"<html><head><title>{title}</title></head>"
                        f"<body><h1>Heading</h1><p>{t}</p>"
                        f'<a href="{links[0]}">next</a> '
                        f'<a href="{links[1]}">more</a>'
                        f"<script>skip();</script></body></html>")
                warc = write_warc([{
                    "type": "response",
                    "uri": f"https://example.org/{doc_id}",
                    "payload": http_response_bytes(html.encode()),
                }])
                # derive WET + WAT from the response record
                wet_chunks, wat_chunks = [], []
                for headers, payload in iter_warc(warc):
                    if headers.get("WARC-Type") != "response":
                        continue
                    st, hh, body = parse_http_response(payload)
                    text, _n, _lc = extract_text(
                        body.decode("utf-8", "replace"))
                    rid = headers["WARC-Record-ID"]
                    uri = headers["WARC-Target-URI"]
                    wet_chunks.append(wet_record(uri, text,
                                                 refers_to=rid, seq=1))
                    wat_chunks.append(wat_record(
                        uri, wat_envelope(headers, st, hh, title, links),
                        refers_to=rid, seq=1))
                    orig_id = rid
                gz = _io.BytesIO()
                for chunk in wet_chunks + wat_chunks:
                    buf = _io.BytesIO()
                    with _gzip.GzipFile(fileobj=buf, mode="wb",
                                        mtime=0) as g:
                        g.write(chunk)
                    gz.write(buf.getvalue())
                # consume back through the ordinary WARC reader
                wet_text = wat_title = ""
                n_links = -1
                refers = set()
                for headers, payload in iter_warc(gz.getvalue()):
                    refers.add(headers.get("WARC-Refers-To"))
                    if headers.get("WARC-Type") == "conversion":
                        wet_text = payload.decode()
                    elif headers.get("WARC-Type") == "metadata":
                        env = _json.loads(payload)["Envelope"]
                        meta = env["Payload-Metadata"][
                            "HTTP-Response-Metadata"]
                        wat_title = meta["HTML-Metadata"]["Head"]["Title"]
                        n_links = len(meta["HTML-Metadata"]["Links"])
                out["doc_id"].append(doc_id)
                out["wet_text"].append(wet_text)
                out["wet_chars"].append(len(wet_text))
                out["title"].append(wat_title)
                out["n_links"].append(n_links)
                out["refers_ok"].append(refers == {orig_id})
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, WETWAT_SCHEMA)


# --------------------------------------------------------------------------
# q423 — HTTP PAYLOAD DECODE CHAIN (transfer-encoding + charset): the
# two decode steps between a WARC response payload and text that q418
# (content-encoding) doesn't cover. Per doc: the page is encoded
# UTF-16-LE with a BOM (even doc_ids) or UTF-8 with a <meta charset>
# declaration (odd), and every third response is wrapped in RFC 9112
# chunked transfer coding (100-byte chunks + a trailer). The kernel
# runs the real chain — WARC parse -> HTTP split -> dechunk ->
# WHATWG-order charset sniff (BOM > header > meta) -> decode -> HTML
# text extraction — and the oracle replays the visible text
# analytically (q372's discipline).
# --------------------------------------------------------------------------
HTTPDEC_SCHEMA = ("doc_id long, charset string, chunked boolean, "
                  "text string, n_chars int")


@register(
    "q423_http_decode_chain",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'utf-16'
                ELSE 'utf-8' END AS charset,
           doc_id % 3 = 0 AS chunked,
           'Doc ' || CAST(doc_id % 100 AS VARCHAR) || ' ' || text
               AS text,
           CAST(length('Doc ' || CAST(doc_id % 100 AS VARCHAR)
                || ' ' || text) AS INT) AS n_chars
    FROM documents
    """,
)
def q423(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import pandas as pd

        from ..functions.html import extract_text, sniff_charset
        from ..sources.warc import (
            decode_chunked, http_response_bytes, iter_warc,
            parse_http_response, write_warc,
        )

        def chunkify(b: bytes) -> bytes:
            out = bytearray()
            for i in range(0, len(b), 100):
                piece = b[i:i + 100]
                out += f"{len(piece):x}".encode() + b"\r\n"
                out += piece + b"\r\n"
            out += b"0\r\nx-trailer: t\r\n\r\n"
            return bytes(out)

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "charset", "chunked",
                                   "text", "n_chars")}
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                title = f"Doc {doc_id % 100}"
                if doc_id % 2 == 0:
                    html = (f"<html><head><title>{title}</title>"
                            f"</head><body><p>{t}</p></body></html>")
                    body = b"\xff\xfe" + html.encode("utf-16-le")
                    ctype = "text/html"
                else:
                    html = (f"<html><head><meta charset=\"utf-8\">"
                            f"<title>{title}</title></head>"
                            f"<body><p>{t}</p></body></html>")
                    body = html.encode("utf-8")
                    ctype = "text/html"
                chunked = doc_id % 3 == 0
                wire = chunkify(body) if chunked else body
                extra = ({"Transfer-Encoding": "chunked"}
                         if chunked else None)
                warc = write_warc([{
                    "type": "response",
                    "uri": f"https://example.org/{doc_id}",
                    "payload": http_response_bytes(
                        wire, content_type=ctype, extra_headers=extra),
                }])
                for headers, payload in iter_warc(warc):
                    if headers.get("WARC-Type") != "response":
                        continue
                    _st, hh, raw = parse_http_response(payload)
                    if "chunked" in hh.get("transfer-encoding", ""):
                        raw = decode_chunked(raw)
                    charset = sniff_charset(
                        raw, hh.get("content-type", ""))
                    decoded = raw.decode(charset).lstrip("﻿")
                    text, n, _lc = extract_text(decoded)
                out["doc_id"].append(doc_id)
                out["charset"].append(charset)
                out["chunked"].append(bool(chunked))
                out["text"].append(text)
                out["n_chars"].append(n)
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, HTTPDEC_SCHEMA)


# --------------------------------------------------------------------------
# q429 — WIKIPEDIA DUMP INGEST (sources/mediawiki.py): the other
# staple pretraining source next to Common Crawl. Docs are written as
# multi-page MediaWiki XML dumps (50 pages per dump — the streaming
# iterparse reader holds ONE page at a time regardless of dump size),
# every fifth page a #REDIRECT. The kernel runs the real chain — dump
# write, streaming page parse, WIKITEXT cleaning (nested templates,
# File/Category blocks with caption links, piped links, refs,
# headings, list markers, bold quotes) and link extraction — and the
# oracle constructs the expected visible text and link facts
# analytically from the same fields (q372's discipline: a grammar bug
# cannot hide on both sides).
# --------------------------------------------------------------------------
WIKI_SCHEMA = ("doc_id long, title string, text string, n_links int, "
               "first_link string, is_redirect boolean")


@register(
    "q429_wikipedia_dump",
    oracle="""
    SELECT doc_id,
           'Doc ' || CAST(doc_id % 100 AS VARCHAR) AS title,
           CASE WHEN doc_id % 5 = 0
                THEN 'REDIRECT Doc ' || CAST((doc_id + 1) % 100
                                             AS VARCHAR)
                ELSE 'About Doc ' || CAST(doc_id % 100 AS VARCHAR)
                     || ' is described. ' || text || ' next and Topic '
                     || CAST(doc_id % 7 AS VARCHAR) || '. point'
           END AS text,
           CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 2 END AS INT)
               AS n_links,
           CASE WHEN doc_id % 5 = 0
                THEN 'Doc ' || CAST((doc_id + 1) % 100 AS VARCHAR)
                ELSE 'Doc ' || CAST((doc_id + 1) % 100 AS VARCHAR)
           END AS first_link,
           doc_id % 5 = 0 AS is_redirect
    FROM documents
    """,
)
def q429(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import pandas as pd

        from ..sources.mediawiki import (
            extract_links, iter_pages, wikitext_to_text, write_dump,
        )

        for pdf in batches:
            rows = pdf.to_dict("records")
            out = {k: [] for k in ("doc_id", "title", "text",
                                   "n_links", "first_link",
                                   "is_redirect")}
            for lo in range(0, len(rows), 50):
                chunk = rows[lo:lo + 50]
                pages = []
                for r in chunk:
                    doc_id, t = int(r["doc_id"]), r["text"]
                    title = f"Doc {doc_id % 100}"
                    nxt = f"Doc {(doc_id + 1) % 100}"
                    if doc_id % 5 == 0:
                        body = f"#REDIRECT [[{nxt}]]"
                        pages.append({"title": title, "id": doc_id,
                                      "text": body, "redirect": nxt})
                    else:
                        body = (
                            f"== About ==\n'''{title}''' is "
                            f"described.<ref>src</ref>\n"
                            f"{{{{infobox|k={doc_id}}}}}\n"
                            f"{t} [[{nxt}|next]] and "
                            f"[[Topic {doc_id % 7}]].\n"
                            f"[[File:x.jpg|thumb|cap [[inner]]]]\n"
                            f"[[Category:Synth]]\n* point")
                        pages.append({"title": title, "id": doc_id,
                                      "text": body})
                for page in iter_pages(write_dump(pages)):
                    links = extract_links(page["text"])
                    out["doc_id"].append(page["id"])
                    out["title"].append(page["title"])
                    out["text"].append(wikitext_to_text(page["text"]))
                    out["n_links"].append(len(links))
                    out["first_link"].append(links[0] if links else "")
                    out["is_redirect"].append(
                        page["redirect"] is not None)
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, WIKI_SCHEMA)


# --------------------------------------------------------------------------
# q430 — MAIN-CONTENT EXTRACTION (functions/html.py::main_content):
# the readability/trafilatura step reduced to its deterministic core —
# block segmentation, boilerplate-container drops (<nav>/<header>/
# <aside>/<footer>), a length floor, and the link-density ceiling.
# Each doc renders as a full page: nav + banner + N content paragraphs
# (the doc text split in two) + a link-farm paragraph + sidebar +
# footer. The oracle replays the block decisions analytically: kept
# text = the two content paragraphs joined, kept count = 2, total
# blocks = 7 — any drift in segmentation, container tracking, or the
# density rule shows up as a value mismatch.
# --------------------------------------------------------------------------
MAINC_SCHEMA = ("doc_id long, main_text string, n_blocks int, "
                "n_kept int, boiler_frac double")


@register(
    "q430_main_content",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             substr(text, 1, CAST(floor(length(text) / 2) AS INT))
                 AS p1,
             substr(text, CAST(floor(length(text) / 2) AS INT) + 1)
                 AS p2
      FROM documents
    )
    SELECT doc_id,
           'Intro paragraph for doc ' || CAST(doc_id % 100 AS VARCHAR)
             || ' with enough substance to pass the length floor. '
             || 'Body part one: ' || trim(p1)
             || ' Body part two: ' || trim(p2) AS main_text,
           CAST(7 AS INT) AS n_blocks,
           CAST(3 AS INT) AS n_kept,
           round(3.0 / 7, 6) AS boiler_frac
    FROM p
    """,
)
def q430(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import pandas as pd

        from ..functions.html import main_content, split_blocks

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "main_text", "n_blocks",
                                   "n_kept", "boiler_frac")}
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                half = len(t) // 2
                p1, p2 = t[:half].strip(), t[half:].strip()
                page = (
                    "<html><body>"
                    '<nav><a href="/">Home page</a> '
                    '<a href="/about">About this site</a></nav>'
                    f"<header><h1>Doc {doc_id % 100} banner</h1>"
                    "</header>"
                    f"<p>Intro paragraph for doc {doc_id % 100} with "
                    "enough substance to pass the length floor.</p>"
                    f"<p>Body part one: {p1}</p>"
                    f"<p>Body part two: {p2}</p>"
                    '<p>More <a href="/x">linked words here</a> '
                    '<a href="/y">and here dominating</a> end</p>'
                    "<footer>Copyright notice long enough to count "
                    "as a block.</footer>"
                    "</body></html>")
                text, n_blocks, n_kept = main_content(page)
                blocks = split_blocks(page)
                boiler = sum(1 for b in blocks if b["boiler"])
                out["doc_id"].append(doc_id)
                out["main_text"].append(text)
                out["n_blocks"].append(n_blocks)
                out["n_kept"].append(n_kept)
                out["boiler_frac"].append(
                    round(boiler / n_blocks, 6))
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, MAINC_SCHEMA)


# --------------------------------------------------------------------------
# q431 — OPT-OUT GOVERNANCE GATE (the compliance step a responsible
# training pipeline runs before ingesting a page): three opt-out
# signals with the ecosystem's precedence — robots.txt disallow
# (checked FIRST: if the fetch itself was disallowed nothing else
# matters), then the X-Robots-Tag response header, then the HTML
# <meta name=robots> directive (noai/noindex in either). Each doc
# carries exactly one signal class by construction; the kernel runs
# the real chain — RFC 9309 matcher (functions/robots.py), HTTP
# header parse, meta-tag scan — and the oracle replays the verdict
# table analytically.
# --------------------------------------------------------------------------
GOV_SCHEMA = "doc_id long, path string, verdict string, kept boolean"

_GOV_ROBOTS = ("User-agent: *\n"
               "Disallow: /private/\n")


@register(
    "q431_optout_governance",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 4
             WHEN 2 THEN '/private/doc/' || CAST(doc_id AS VARCHAR)
             ELSE '/doc/' || CAST(doc_id AS VARCHAR) END AS path,
           CASE doc_id % 4
             WHEN 0 THEN 'header_noai'
             WHEN 1 THEN 'meta_noai'
             WHEN 2 THEN 'robots_txt'
             ELSE 'kept' END AS verdict,
           doc_id % 4 = 3 AS kept
    FROM documents
    """,
)
def q431(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import pandas as pd

        from ..functions.robots import robots_allowed
        from ..sources.warc import (
            http_response_bytes, iter_warc, parse_http_response,
            write_warc,
        )

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "path", "verdict",
                                   "kept")}
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                cls = doc_id % 4
                path = (f"/private/doc/{doc_id}" if cls == 2
                        else f"/doc/{doc_id}")
                meta = ('<meta name="robots" content="noai, noimageai">'
                        if cls == 1 else "")
                html = (f"<html><head>{meta}</head>"
                        f"<body><p>{t}</p></body></html>")
                extra = ({"X-Robots-Tag": "noai"} if cls == 0 else None)
                warc = write_warc([{
                    "type": "response",
                    "uri": f"https://example.org{path}",
                    "payload": http_response_bytes(
                        html.encode(), extra_headers=extra),
                }])
                verdict = "kept"
                for headers, payload in iter_warc(warc):
                    if headers.get("WARC-Type") != "response":
                        continue
                    _st, hh, body = parse_http_response(payload)
                    if not robots_allowed(_GOV_ROBOTS, path):
                        verdict = "robots_txt"
                        continue
                    xrt = hh.get("x-robots-tag", "").lower()
                    if "noai" in xrt or "noindex" in xrt:
                        verdict = "header_noai"
                        continue
                    page = body.decode("utf-8", "replace").lower()
                    import re as _re

                    m = _re.search(
                        r'<meta\s+name=["\']?robots["\']?\s+'
                        r'content=["\']?([^"\'>]*)', page)
                    if m and ("noai" in m.group(1)
                              or "noindex" in m.group(1)):
                        verdict = "meta_noai"
                out["doc_id"].append(doc_id)
                out["path"].append(path)
                out["verdict"].append(verdict)
                out["kept"].append(verdict == "kept")
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, GOV_SCHEMA)



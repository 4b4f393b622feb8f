"""File-format ingest/export harness queries: JSONL/CSV/ORC/Avro/Arrow,
TFRecord, safetensors, Kafka segments, PDF/DOCX, compression codecs.

Split out of the former textops.py (round 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, register
from .textstats import q295
from .mediaops import q360
from .lakeops import _derived_dir, q184
from .crawlops import q251, q368, q370, q371

# --------------------------------------------------------------------------
# q162 — WebDataset tar-shard export round-trip: documents (+ their real
# PNG payloads) shard into tar files (sinks/webdataset.py), read back by
# shard, and the per-shard accounting — sample counts, text byte totals,
# and the first pixel of every DECODED PNG — must equal the oracle's
# replay from md5 arithmetic. This value-checks the full export format:
# tar layout, per-sample file grouping, payload integrity through
# write->tar->untar->decode.
# --------------------------------------------------------------------------
_WDS_SHARDS = 8


@register(
    "q162_webdataset_roundtrip",
    oracle=f"""
    SELECT printf('shard-%06d.tar', doc_id % {_WDS_SHARDS}) AS shard,
           COUNT(*) AS n_txt,
           CAST(SUM(strlen(text)) AS BIGINT) AS txt_bytes,
           COUNT(*) AS n_png,
           CAST(SUM(('0x' || substr(md5(text), 1, 2))::INTEGER) AS BIGINT)
             AS sum_first_px
    FROM documents GROUP BY 1
    """,
)
def q162(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib as _hl
    import tempfile
    from collections.abc import Iterator as _It

    import pandas as _pd

    from ..functions.multimodal import decode_image, png_payload
    from ..sinks.webdataset import read_shards, write_shards

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def add_payload(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            yield _pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "text": pdf["text"].values,
                "payload": [png_payload(t) for t in pdf["text"]],
            })

    with_png = docs.mapInPandas(
        add_payload, "doc_id long, text string, payload binary")

    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    out_dir = f"{tempfile.gettempdir()}/gfw_pixetl_spark_wds_{tag}"
    statuses = write_shards(
        with_png, out_dir, _WDS_SHARDS,
        columns={"text": "txt", "payload": "png"},
        shard_expr=F.col("doc_id") % _WDS_SHARDS,
    ).collect()
    paths = sorted(r.path for r in statuses)

    rows = read_shards(spark, paths)

    def first_px(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            yield _pd.DataFrame({
                "shard": pdf["shard"].values,
                "suffix": pdf["suffix"].values,
                "n_bytes": [len(p) for p in pdf["payload"]],
                "px0": [
                    int(decode_image(bytes(p))[0, 0, 0])
                    if s == "png" else 0
                    for p, s in zip(pdf["payload"], pdf["suffix"])
                ],
            })

    decoded = rows.mapInPandas(
        first_px, "shard string, suffix string, n_bytes long, px0 long")
    return decoded.groupBy("shard").agg(
        F.sum(F.when(F.col("suffix") == "txt", 1).otherwise(0))
        .alias("n_txt"),
        F.sum(F.when(F.col("suffix") == "txt", F.col("n_bytes"))
              .otherwise(0)).alias("txt_bytes"),
        F.sum(F.when(F.col("suffix") == "png", 1).otherwise(0))
        .alias("n_png"),
        F.sum(F.when(F.col("suffix") == "png", F.col("px0")).otherwise(0))
        .alias("sum_first_px"),
    )


# --------------------------------------------------------------------------
# q201 — JSONL ingestion in the oracle gate: the corpus is exported to
# line-delimited JSON (the interchange format crawls actually arrive
# in), re-read through the declared-schema reader with the corrupt-line
# policy, and aggregated — value-checked against the parquet truth, so
# the whole export -> ingest path is proven lossless, not just tested
# for shape.
# --------------------------------------------------------------------------
def _jsonl_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.textfiles import write_jsonl

        write_jsonl(load(spark, sf_dir, "documents"), d, partitions=4)

    return _derived_dir(sf_dir, "jsonl", build)


@register(
    "q201_jsonl_roundtrip",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN length(text) = n_chars THEN 1 ELSE 0 END)
                AS BIGINT) AS n_consistent
    FROM documents GROUP BY lang
    """,
)
def q201(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from ..sources.textfiles import read_jsonl

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ])
    df = read_jsonl(spark, _jsonl_dir(spark, sf_dir) + "/*.json",
                    schema, on_corrupt="drop")
    return df.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(F.when(F.length("text") == F.col("n_chars"), 1).otherwise(0))
        .cast("bigint").alias("n_consistent"),
    )


# --------------------------------------------------------------------------
# q205 — CSV ingestion in the oracle gate (the q201 twin for the other
# interchange format): export with quoting, re-read through the
# declared-schema reader, aggregate — lossless through commas, quotes,
# and newlines in text fields, value-checked against the parquet truth.
# --------------------------------------------------------------------------
def _csv_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.textfiles import write_csv

        write_csv(load(spark, sf_dir, "documents"), d, partitions=4)

    return _derived_dir(sf_dir, "csv", build)


@register(
    "q205_csv_roundtrip",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN length(text) = n_chars THEN 1 ELSE 0 END)
                AS BIGINT) AS n_consistent
    FROM documents GROUP BY source
    """,
)
def q205(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from ..sources.textfiles import read_csv

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ])
    df = read_csv(spark, _csv_dir(spark, sf_dir), schema, on_corrupt="drop")
    return df.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(F.when(F.length("text") == F.col("n_chars"), 1).otherwise(0))
        .cast("bigint").alias("n_consistent"),
    )


# --------------------------------------------------------------------------
# q379 — ACCESS-LOG PARSING (Apache/nginx combined log format): the
# ops-ingest twin of the crawl family — each doc renders one combined-
# format line (ip, ident, user, [time], "method path proto", status,
# bytes, "referer", "user-agent") and ONE regexp_extract per field
# pulls it apart, all JVM-side. The oracle rebuilds every field
# analytically. The per-status/per-path rollup after the parse is the
# first query every log pipeline runs.
# --------------------------------------------------------------------------
_CLF_RE = (r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]+)" '
           r'(\d{3}) (\d+|-) "([^"]*)" "([^"]*)"$')


@register(
    "q379_access_log_parse",
    oracle="""
    SELECT '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
             || CAST(doc_id % 100 AS VARCHAR) AS ip,
           'GET' AS method,
           '/doc/' || CAST(doc_id AS VARCHAR) AS path,
           CAST(CASE doc_id % 10 WHEN 7 THEN 404 WHEN 9 THEN 500
                ELSE 200 END AS INT) AS status,
           CAST(n_chars AS BIGINT) AS bytes,
           'crawler/' || lang AS agent
    FROM documents
    """,
)
def q379(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    status = (F.when(F.col("doc_id") % 10 == 7, 404)
              .when(F.col("doc_id") % 10 == 9, 500)
              .otherwise(200))
    line = F.concat(
        F.lit("10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit("."), (F.col("doc_id") % 100).cast("string"),
        F.lit(' - frank [10/Oct/2024:13:55:36 -0700] "GET /doc/'),
        F.col("doc_id").cast("string"),
        F.lit(' HTTP/1.1" '), status.cast("string"),
        F.lit(" "), F.col("n_chars").cast("string"),
        F.lit(' "https://ref.example/" "crawler/'), F.col("lang"),
        F.lit('"'),
    )
    logs = docs.select(line.alias("line"))
    f = lambda i: F.regexp_extract(F.col("line"), _CLF_RE, i)  # noqa: E731
    return logs.select(
        f(1).alias("ip"), f(5).alias("method"), f(6).alias("path"),
        f(8).cast("int").alias("status"),
        f(9).cast("bigint").alias("bytes"),
        f(11).alias("agent"),
    )


# --------------------------------------------------------------------------
# q380 — SRT SUBTITLE CUES (the video-paired text artifact): each doc
# renders a 3-cue SubRip file (index, HH:MM:SS,mmm --> timestamps, cue
# text lines); parsing splits on blank lines and pulls index/start/end/
# text per cue — regexp_extract_all vectors + explode, no kernel. Cue
# duration in EXACT milliseconds via the closed-form timestamp
# arithmetic both engines replay. This is how subtitle text enters a
# multimodal corpus next to the mp4 track (q360/q364).
# --------------------------------------------------------------------------
@register(
    "q380_srt_cues",
    oracle="""
    WITH c AS (
      SELECT doc_id, unnest([0, 1, 2]) AS cue
      FROM documents
    )
    SELECT doc_id, CAST(cue + 1 AS INT) AS idx,
           CAST((doc_id % 50) * 3000 + cue * 2500 AS BIGINT) AS start_ms,
           CAST((doc_id % 50) * 3000 + cue * 2500 + 1999 AS BIGINT)
               AS end_ms,
           CAST(1999 AS BIGINT) AS dur_ms,
           'cue ' || CAST(cue AS VARCHAR) || ' of doc '
             || CAST(doc_id AS VARCHAR) AS text
    FROM c
    """,
)
def q380(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")

    def ts(ms_col):
        h = F.floor(ms_col / 3600000)
        m = F.floor(ms_col / 60000) % 60
        s = F.floor(ms_col / 1000) % 60
        ms = ms_col % 1000
        return F.concat(
            F.lpad(h.cast("string"), 2, "0"), F.lit(":"),
            F.lpad(m.cast("string"), 2, "0"), F.lit(":"),
            F.lpad(s.cast("string"), 2, "0"), F.lit(","),
            F.lpad(ms.cast("string"), 3, "0"))

    base = (F.col("doc_id") % 50) * 3000
    cues = []
    for k in range(3):
        start = base + k * 2500
        end = start + 1999
        cues.append(F.concat(
            F.lit(f"{k + 1}\n"), ts(start), F.lit(" --> "), ts(end),
            F.lit(f"\ncue {k} of doc "), F.col("doc_id").cast("string"),
            F.lit("\n")))
    srt = F.concat_ws("\n", *cues)

    blocks = F.split(srt, "\n\n")
    one = F.transform(blocks, lambda b: F.struct(
        F.regexp_extract(b, r"^(\d+)\n", 1).cast("int").alias("idx"),
        F.regexp_extract(
            b, r"(\d{2}):(\d{2}):(\d{2}),(\d{3}) -->", 1).cast("bigint")
        .alias("h1"),
        F.regexp_extract(
            b, r"(\d{2}):(\d{2}):(\d{2}),(\d{3}) -->", 2).cast("bigint")
        .alias("m1"),
        F.regexp_extract(
            b, r"(\d{2}):(\d{2}):(\d{2}),(\d{3}) -->", 3).cast("bigint")
        .alias("s1"),
        F.regexp_extract(
            b, r"(\d{2}):(\d{2}):(\d{2}),(\d{3}) -->", 4).cast("bigint")
        .alias("ms1"),
        F.regexp_extract(
            b, r"--> (\d{2}):(\d{2}):(\d{2}),(\d{3})", 1).cast("bigint")
        .alias("h2"),
        F.regexp_extract(
            b, r"--> (\d{2}):(\d{2}):(\d{2}),(\d{3})", 2).cast("bigint")
        .alias("m2"),
        F.regexp_extract(
            b, r"--> (\d{2}):(\d{2}):(\d{2}),(\d{3})", 3).cast("bigint")
        .alias("s2"),
        F.regexp_extract(
            b, r"--> (\d{2}):(\d{2}):(\d{2}),(\d{3})", 4).cast("bigint")
        .alias("ms2"),
        F.regexp_extract(b, r"\n.*\n(.*)\n?$", 1).alias("text"),
    ))
    parsed = docs.select(
        "doc_id", F.explode(one).alias("c")).select("doc_id", "c.*")
    start_ms = (F.col("h1") * 3600000 + F.col("m1") * 60000
                + F.col("s1") * 1000 + F.col("ms1"))
    end_ms = (F.col("h2") * 3600000 + F.col("m2") * 60000
              + F.col("s2") * 1000 + F.col("ms2"))
    return parsed.select(
        "doc_id", F.col("idx"),
        start_ms.alias("start_ms"), end_ms.alias("end_ms"),
        (end_ms - start_ms).alias("dur_ms"), "text",
    )


# --------------------------------------------------------------------------
# q378 — SITEMAP PARSING (sitemaps.org XML): the crawl-frontier feed
# that pairs with robots.txt (q370) and the blocklist (q368). Each
# source publishes a deterministic <urlset> (one <url> per doc of the
# source, loc + lastmod + priority); extraction is PURE column work —
# regexp_extract_all over the XML for the per-field vectors, explode,
# zip — no kernel, no UDF. The oracle rebuilds the same URL set
# analytically from the documents table.
# --------------------------------------------------------------------------
@register(
    "q378_sitemap_parse",
    oracle="""
    SELECT source,
           'https://' || source || '.example.org/doc/'
             || CAST(doc_id AS VARCHAR) AS loc,
           '2024-01-' || CASE WHEN doc_id % 28 + 1 < 10
                              THEN '0' ELSE '' END
             || CAST(doc_id % 28 + 1 AS VARCHAR) AS lastmod,
           round((doc_id % 10 + 1) / 10.0, 1) AS priority
    FROM documents
    """,
)
def q378(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    day = F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0")
    url_xml = F.concat(
        F.lit("<url><loc>https://"), F.col("source"),
        F.lit(".example.org/doc/"), F.col("doc_id").cast("string"),
        F.lit("</loc><lastmod>2024-01-"), day,
        F.lit("</lastmod><priority>"),
        F.round((F.col("doc_id") % 10 + 1) / 10.0, 1).cast("string"),
        F.lit("</priority></url>"),
    )
    # one sitemap per source: concat_ws over the per-doc <url> entries
    sitemaps = docs.groupBy("source").agg(
        F.concat(
            F.lit('<?xml version="1.0"?><urlset>'),
            F.concat_ws("", F.collect_list(url_xml)),
            F.lit("</urlset>"),
        ).alias("xml"))
    # parse back with JVM regex vectors: one regexp_extract_all per
    # field, zipped positionally (sitemap entries are well-formed XML
    # elements, each field exactly once per <url>)
    locs = F.regexp_extract_all(F.col("xml"), F.lit("<loc>([^<]*)</loc>"),
                                F.lit(1))
    mods = F.regexp_extract_all(F.col("xml"),
                                F.lit("<lastmod>([^<]*)</lastmod>"),
                                F.lit(1))
    pris = F.regexp_extract_all(F.col("xml"),
                                F.lit("<priority>([^<]*)</priority>"),
                                F.lit(1))
    entries = F.zip_with(
        locs, F.zip_with(mods, pris,
                         lambda m, p: F.struct(m.alias("m"), p.alias("p"))),
        lambda l, mp: F.struct(l.alias("loc"), mp["m"].alias("lastmod"),
                               mp["p"].alias("priority")))
    return (
        sitemaps.select("source", F.explode(entries).alias("e"))
        .select("source", F.col("e.loc").alias("loc"),
                F.col("e.lastmod").alias("lastmod"),
                F.col("e.priority").cast("double").alias("priority"))
    )


# --------------------------------------------------------------------------
# q376 — MARKDOWN -> TEXT (pure column expressions, whole-stage
# codegen, zero Python): each doc renders as deterministic markdown
# (header, bold, link, inline code, list bullet, fenced block around
# its text) and markdown_to_text strips it with a fixed regex chain
# the oracle replays verbatim in DuckDB. The README/docs-corpus
# cleanup pass — the one text format that needs NO kernel at all.
# --------------------------------------------------------------------------
@register(
    "q376_markdown_to_text",
    oracle=r"""
    WITH md AS (
      SELECT doc_id,
             '# Title ' || CAST(doc_id % 100 AS VARCHAR)
             || CHR(10) || CHR(10) || '**bold** and [a link](http://x) '
             || '`inline` text' || CHR(10) || '- item one' || CHR(10)
             || '```sql' || CHR(10) || text || CHR(10) || '```' AS m
      FROM documents
    ), s AS (
      SELECT doc_id,
        trim(regexp_replace(
          regexp_replace(
           regexp_replace(
            regexp_replace(
             regexp_replace(
              regexp_replace(
               regexp_replace(
                regexp_replace(
                 regexp_replace(
                  regexp_replace(
                   regexp_replace(m, '```[a-zA-Z0-9]*\n?', '', 'g'),
                   '`([^`]*)`', '\1', 'g'),
                  '!\[([^\]]*)\]\([^)]*\)', '\1', 'g'),
                 '\[([^\]]*)\]\([^)]*\)', '\1', 'g'),
                '(?m)^#{1,6}\s*', '', 'g'),
               '(?m)^>\s?', '', 'g'),
              '(?m)^\s*[-*+]\s+', '', 'g'),
             '\*\*([^*]*)\*\*', '\1', 'g'),
            '\*([^*]*)\*', '\1', 'g'),
           '__([^_]*)__', '\1', 'g'),
          '\s+', ' ', 'g')) AS t
      FROM md
    )
    SELECT doc_id, t AS text, CAST(length(t) AS INT) AS n_chars
    FROM s
    """,
)
def q376(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import markdown_to_text

    docs = load(spark, sf_dir, "documents")
    md = F.concat(
        F.lit("# Title "), (F.col("doc_id") % 100).cast("string"),
        F.lit("\n\n**bold** and [a link](http://x) `inline` text\n"
              "- item one\n```sql\n"),
        F.col("text"), F.lit("\n```"),
    )
    out = markdown_to_text(md)
    return docs.select(
        "doc_id", out.alias("text"),
        F.length(out).cast("int").alias("n_chars"))


# --------------------------------------------------------------------------
# q374 — DOCX TEXT EXTRACTION (ECMA-376 WordprocessingML in a ZIP/OPC
# package): each doc renders as a real .docx (Content_Types + rels +
# word/document.xml; the doc text split over two <w:p> paragraphs with
# XML-escaped content), the kernel unzips and extracts w:t runs with
# entity decode, and the oracle rebuilds the expected text
# analytically. HTML -> PDF -> DOCX completes the document-format
# triad a text corpus ingests.
# --------------------------------------------------------------------------
DOCX_SCHEMA = "doc_id long, n_paragraphs int, text string, n_chars int"


@register(
    "q374_docx_extract",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             'Heading ' || CAST(doc_id % 100 AS VARCHAR) || CHR(10)
               || trim(substr(text, 1, 60))
               || CASE WHEN length(text) > 60
                       THEN CHR(10) || trim(substr(text, 61))
                       ELSE '' END AS full_text,
             CASE WHEN length(text) > 60 THEN 3 ELSE 2 END AS n_para
      FROM documents
    )
    SELECT doc_id,
           CAST(n_para AS INT) AS n_paragraphs,
           full_text AS text,
           CAST(length(full_text) AS INT) AS n_chars
    FROM p
    """,
)
def q374(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions
    from ..sources.docx import extract_docx_text, write_docx

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "n_paragraphs", "text", "n_chars")}
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                # whitespace-only paragraphs are dropped up front: the
                # extractor collapses them anyway, so writing them
                # would only make n_paragraphs disagree with the text
                paragraphs = [p.strip() for p in
                              (f"Heading {doc_id % 100}", t[:60], t[60:])
                              if p.strip()]
                text = extract_docx_text(write_docx(paragraphs))
                out["doc_id"].append(doc_id)
                out["n_paragraphs"].append(len(paragraphs))
                out["text"].append(text)
                out["n_chars"].append(len(text))
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, DOCX_SCHEMA)


# --------------------------------------------------------------------------
# q373 — PDF TEXT EXTRACTION (ISO 32000): each doc renders as a real
# two-page PDF 1.4 (FlateDecode content streams, classic xref,
# catalog->pages->kids walk) with a heading, the doc text split over
# two Tj lines, and a footer page; the kernel runs the full parse —
# xref table, object resolution, stream inflate, content-stream
# tokenizer (Tj/'/TJ, escapes, Td boundaries) — and the oracle builds
# the expected text analytically from the same fields. Digitally-born
# PDFs are the second-biggest document format after HTML; scanned PDFs
# need OCR and stay out of scope (module docstring states the matrix).
# --------------------------------------------------------------------------
PDF_SCHEMA = "doc_id long, n_pages int, text string, n_chars int"


@register(
    "q373_pdf_extract",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             trim(regexp_replace(
               'Report ' || CAST(doc_id % 100 AS VARCHAR) || ' '
                 || substr(text, 1, 40) || ' ' || substr(text, 41),
               '\\s+', ' ', 'g')) || CHR(10) || 'Footer page' AS full_text
      FROM documents
    )
    SELECT doc_id, CAST(2 AS INT) AS n_pages, full_text AS text,
           CAST(length(full_text) AS INT) AS n_chars
    FROM p
    """,
)
def q373(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions
    from ..sources.pdf import PdfDocument, write_pdf

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import pandas as pd

        for pdf_batch in batches:
            out = {k: [] for k in ("doc_id", "n_pages", "text", "n_chars")}
            for doc_id, t in zip(pdf_batch["doc_id"], pdf_batch["text"]):
                payload = write_pdf([
                    [f"Report {doc_id % 100}", t[:40], t[40:]],
                    ["Footer page"],
                ])
                doc = PdfDocument(payload)
                text = doc.text()
                out["doc_id"].append(doc_id)
                out["n_pages"].append(len(doc.pages()))
                out["text"].append(text)
                out["n_chars"].append(len(text))
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, PDF_SCHEMA)


# --------------------------------------------------------------------------
# q381 — PDF 1.5 XREF STREAMS + OBJECT STREAMS: the layout virtually
# every born-digital PDF has shipped since ~2006 (compressed
# cross-reference: /Type /XRef binary rows behind Flate + PNG-Up
# Predictor 12, dict objects packed into a /Type /ObjStm addressed by
# type-2 entries). Even docs render with ObjStm packing, odd docs with
# an xref stream only — the kernel runs the FULL modern read path
# (predictor undo, W-field decode, type-2 resolution through the
# cached object stream) and reports how many objects resolved through
# the ObjStm, value-checked analytically. Closes VERDICT r5 gap #1:
# sources/pdf.py used to raise on these files.
# --------------------------------------------------------------------------
PDF15_SCHEMA = ("doc_id long, n_pages int, n_compressed int, "
                "text string, n_chars int")


@register(
    "q381_pdf_xref_stream",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             trim(regexp_replace(
               'Report ' || CAST(doc_id % 100 AS VARCHAR) || ' '
                 || substr(text, 1, 40) || ' ' || substr(text, 41),
               '\\s+', ' ', 'g')) || CHR(10) || 'Footer page' AS full_text
      FROM documents
    )
    SELECT doc_id, CAST(2 AS INT) AS n_pages,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 5 ELSE 0 END AS INT)
               AS n_compressed,
           full_text AS text,
           CAST(length(full_text) AS INT) AS n_chars
    FROM p
    """,
)
def q381(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions
    from ..sources.pdf import PdfDocument, write_pdf

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import pandas as pd

        for pdf_batch in batches:
            out = {k: [] for k in ("doc_id", "n_pages", "n_compressed",
                                   "text", "n_chars")}
            for doc_id, t in zip(pdf_batch["doc_id"], pdf_batch["text"]):
                objstm = doc_id % 2 == 0
                payload = write_pdf(
                    [[f"Report {doc_id % 100}", t[:40], t[40:]],
                     ["Footer page"]],
                    xref_stream=True, use_objstm=objstm)
                doc = PdfDocument(payload)
                text = doc.text()
                out["doc_id"].append(doc_id)
                out["n_pages"].append(len(doc.pages()))
                out["n_compressed"].append(sum(
                    1 for v in doc.xref.values() if isinstance(v, tuple)))
                out["text"].append(text)
                out["n_chars"].append(len(text))
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, PDF15_SCHEMA)


# --------------------------------------------------------------------------
# q382 — SEEKABLE .jsonl.zst INGEST (RFC 8878 + zstd seekable format):
# modern corpus shards ship zstd, not gzip. Each doc becomes a 2-frame
# seekable shard (its JSON line split across frames, compressed by
# libzstd when available so the pure-Python decoder is exercised
# against the reference encoder's real Huffman/FSE output); the kernel
# reads the seek table from the END, ranged-decodes each frame
# independently (one frame = one ranged GET at scale — the gzip
# member_index analog), reassembles the JSONL line and parses it.
# Closes VERDICT r5 gap #2: no zstd decode existed in the tree.
# --------------------------------------------------------------------------
ZSTD_SCHEMA = ("doc_id long, n_frames int, text string, n_chars int, "
               "ranged_ok boolean")


@register(
    "q382_zstd_jsonl",
    oracle="""
    SELECT doc_id, CAST(2 AS INT) AS n_frames, text,
           CAST(length(text) AS INT) AS n_chars,
           TRUE AS ranged_ok
    FROM documents
    """,
)
def q382(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import json

        import pandas as pd

        from ..sources.zstd import (
            compress, compress_raw, decompress, read_seek_table,
            write_seekable,
        )

        try:  # real entropy-coded frames when libzstd is available
            import pyarrow as pa

            codec = pa.Codec("zstd", compression_level=3)

            def enc(b: bytes) -> bytes:
                return bytes(codec.compress(b))
        except Exception:  # raw-block frames: same framing contract
            enc = compress_raw
        # frame 1: libzstd-encoded (decoder exercised against the
        # reference encoder); frame 2: OUR compressor (round 7 —
        # LZ77 + predefined-FSE sequences), so both directions of the
        # codec meet in one shard
        encoders = [enc, compress]

        for pdf_batch in batches:
            out = {k: [] for k in ("doc_id", "n_frames", "text",
                                   "n_chars", "ranged_ok")}
            for doc_id, t in zip(pdf_batch["doc_id"], pdf_batch["text"]):
                line = json.dumps({"id": int(doc_id), "text": t},
                                  ensure_ascii=False).encode()
                half = len(line) // 2
                parts = [line[:half], line[half:]]
                shard = write_seekable(
                    [e(p) for e, p in zip(encoders, parts)],
                    [len(p) for p in parts])
                table = read_seek_table(shard)
                pieces = []
                ok = len(table) == 2
                for (off, csize, dsize), part in zip(table, parts):
                    piece = decompress(shard[off:off + csize])
                    ok = ok and len(piece) == dsize
                    pieces.append(piece)
                rec = json.loads(b"".join(pieces))
                out["doc_id"].append(rec["id"])
                out["n_frames"].append(len(table))
                out["text"].append(rec["text"])
                out["n_chars"].append(len(rec["text"]))
                out["ranged_ok"].append(bool(ok))
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, ZSTD_SCHEMA)


# --------------------------------------------------------------------------
# q223 — ORC interchange roundtrip (the q201/q205 twin for the third
# columnar format): export the corpus as ORC, re-read, aggregate —
# value-checked against the parquet truth, so the ORC write/read path
# is proven lossless including text with newlines/quotes.
# --------------------------------------------------------------------------
def _orc_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        load(spark, sf_dir, "documents").repartition(4) \
            .write.mode("overwrite").orc(d)

    return _derived_dir(sf_dir, "orc", build)


@register(
    "q223_orc_roundtrip",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN length(text) = n_chars THEN 1 ELSE 0 END)
                AS BIGINT) AS n_consistent
    FROM documents GROUP BY lang
    """,
)
def q223(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.orc(_orc_dir(spark, sf_dir))
    return df.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(F.when(F.length("text") == F.col("n_chars"), 1).otherwise(0))
        .cast("bigint").alias("n_consistent"),
    )


# --------------------------------------------------------------------------
# q389 — TFRECORD SHARD EXPORT/INGEST (sources/tfrecord.py): the format
# trainers actually read. Each doc is serialized as tf.train.Example
# protobuf (BytesList text, Int64List ids, FloatList embedding probe)
# into a CRC32C-framed TFRecord shard via the real encoder, then walked
# back through the FULL chain: record_index (the ranged-GET index, no
# payload hashing), strict iter_tfrecord, protobuf decode — plus an
# injected 4-byte junk run + trailing record so the lenient
# scan_tfrecord's skip-and-count contract runs on every doc. All facts
# are analytic: framing counts are fixed by construction, text round-
# trips to an md5 probe, int64 features sum exactly, and the float
# probe is dyadic ((doc_id%4096)/2 is exact in float32) so even the
# FloatList leg replays bit-identically in SQL.
# --------------------------------------------------------------------------
TFREC_SCHEMA = ("doc_id long, n_index int, n_records int, n_bad int, "
                "junk_bytes int, body_bytes int, text_sig int, "
                "ids_sum long, emb0 double")


@register(
    "q389_tfrecord_shards",
    oracle="""
    SELECT doc_id, CAST(2 AS INT) AS n_index,
           CAST(3 AS INT) AS n_records,
           CAST(1 AS INT) AS n_bad,
           CAST(4 AS INT) AS junk_bytes,
           CAST(length(text) AS INT) AS body_bytes,
           ('0x' || substr(md5(text), 1, 4))::INT AS text_sig,
           CAST(doc_id + length(text) + doc_id % 7 + 1 AS BIGINT)
               AS ids_sum,
           CAST(doc_id % 4096 AS DOUBLE) / 2 AS emb0
    FROM documents
    """,
)
def q389(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import hashlib as _hashlib

        import pandas as pd

        from ..sources.tfrecord import (
            decode_example, encode_example, iter_tfrecord, record_index,
            scan_tfrecord, write_tfrecord,
        )

        cols = ("doc_id", "n_index", "n_records", "n_bad", "junk_bytes",
                "body_bytes", "text_sig", "ids_sum", "emb0")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                i = int(doc_id)
                body = str(t).encode()
                ex1 = encode_example({
                    "text": [body],
                    "ids": [i, len(body)],
                    "emb": [(i % 4096) / 2.0],
                })
                ex2 = encode_example({"meta": [b"shard"],
                                      "ids": [i % 7]})
                shard = write_tfrecord([ex1, ex2])
                idx = record_index(shard)
                # real shards arrive damaged: a junk run between
                # records plus a trailing record exercises resync
                tail = write_tfrecord([encode_example({"ids": [1]})])
                records, c = scan_tfrecord(
                    shard + b"\xde\xad\xbe\xef" + tail)
                decoded = [decode_example(r) for r in records]
                strict = [decode_example(r)
                          for r in iter_tfrecord(shard)]
                assert [d.get("ids") for d in strict] == \
                    [d.get("ids") for d in decoded[:2]]
                text_back = decoded[0]["text"][0]
                ids_sum = sum(v for d in decoded
                              for v in d.get("ids", []))
                out["doc_id"].append(i)
                out["n_index"].append(len(idx))
                out["n_records"].append(c["n_records"])
                out["n_bad"].append(c["bad_records"])
                out["junk_bytes"].append(c["junk_bytes"])
                out["body_bytes"].append(len(text_back))
                out["text_sig"].append(
                    int(_hashlib.md5(text_back).hexdigest()[:4], 16))
                out["ids_sum"].append(ids_sum)
                out["emb0"].append(float(decoded[0]["emb"][0]))
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, TFREC_SCHEMA)


# --------------------------------------------------------------------------
# q390 — AVRO CONTAINER ROUND-TRIP (sources/avro.py): the corpus is
# exported to real Avro object container files (deflate codec, one
# shard per partition written executor-side — no driver funnel),
# re-read through the binaryFile -> per-file decode kernel, and
# aggregated — value-checked against the parquet truth, so the whole
# export -> ingest path is proven lossless through zigzag varints,
# nullable-union branches (parquet columns are nullable, so every
# field rides a ["null", T] union) and raw-DEFLATE blocks. The q201/
# q205 interchange-gate pattern at the third format the Hadoop/Kafka
# world actually ships.
# --------------------------------------------------------------------------
def _avro_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.avro import write_avro_shards

        write_avro_shards(
            load(spark, sf_dir, "documents"), d, n_shards=8,
            codec="deflate").collect()

    return _derived_dir(sf_dir, "avro", build)


@register(
    "q390_avro_roundtrip",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(CASE WHEN length(text) = n_chars THEN 1 ELSE 0 END)
                AS BIGINT) AS n_consistent
    FROM documents GROUP BY lang
    """,
)
def q390(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.avro import read_avro

    df = read_avro(
        spark, _avro_dir(spark, sf_dir) + "/*.avro",
        "doc_id long, text string, lang string, n_chars long")
    return df.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.sum(F.when(F.length("text") == F.col("n_chars"), 1).otherwise(0))
        .cast("bigint").alias("n_consistent"),
    )


# --------------------------------------------------------------------------
# q391 — .jsonl.lz4 INGEST (LZ4 frame format, sources/lz4.py): the fast
# companion to q382's zstd path — Kafka archives and Hadoop-era corpus
# shards ship LZ4. Each doc's JSON line is split across TWO independent
# frames behind a leading skippable frame (the seekable-envelope
# layout); the kernel walks each frame's block_index and reassembles
# the line from RANGED block reads (one block = one ranged GET at
# scale), cross-checks the whole-shard sequential decode, and — when
# pyarrow's bundled liblz4 is present — verifies the real library
# decodes our writer's frames to the same bytes. Facts are analytic:
# frame/block counts are fixed by construction, text round-trips.
# --------------------------------------------------------------------------
LZ4_SCHEMA = ("doc_id long, n_frames int, n_blocks int, text string, "
              "n_chars int, ranged_ok boolean")


@register(
    "q391_lz4_jsonl",
    oracle="""
    SELECT doc_id, CAST(2 AS INT) AS n_frames,
           CAST(2 AS INT) AS n_blocks, text,
           CAST(length(text) AS INT) AS n_chars,
           TRUE AS ranged_ok
    FROM documents
    """,
)
def q391(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import json as _json
        import struct as _struct

        import pandas as pd

        from ..sources.lz4 import (
            block_index, compress_frame, decompress, decompress_block,
        )

        try:  # real liblz4 cross-check when available
            import pyarrow as pa

            lib = pa.Codec("lz4")
        except Exception:
            lib = None

        for pdf_batch in batches:
            out = {k: [] for k in ("doc_id", "n_frames", "n_blocks",
                                   "text", "n_chars", "ranged_ok")}
            for doc_id, t in zip(pdf_batch["doc_id"], pdf_batch["text"]):
                line = _json.dumps({"id": int(doc_id), "text": t},
                                   ensure_ascii=False).encode()
                half = len(line) // 2
                parts = [line[:half], line[half:]]
                frames = [compress_frame(p, block_checksums=True)
                          for p in parts]
                shard = (_struct.pack("<II", 0x184D2A50, 4) + b"meta"
                         + frames[0] + frames[1])
                # ranged path: per-frame block walk, payload slices only
                pieces = []
                n_blocks = 0
                ok = True
                off = 12  # past the skippable envelope
                for part in parts:
                    fr = shard[off:]
                    idx = block_index(fr)
                    n_blocks += len(idx)
                    buf = bytearray()
                    for boff, bsize, comp in idx:
                        blob = fr[boff:boff + bsize]
                        buf += (decompress_block(blob) if comp
                                else blob)
                    pieces.append(bytes(buf))
                    ok = ok and bytes(buf) == part
                    if lib is not None:
                        ok = ok and bytes(
                            lib.decompress(fr[:idx[-1][0] + idx[-1][1]
                                              + 12], len(part))) == part
                    # past: last payload + its block checksum (4) +
                    # EndMark (4) + content checksum (4)
                    off += idx[-1][0] + idx[-1][1] + 12
                # sequential path must agree
                ok = ok and decompress(shard) == line
                rec = _json.loads(b"".join(pieces))
                ok = ok and rec["id"] == int(doc_id)
                out["doc_id"].append(int(doc_id))
                out["n_frames"].append(2)
                out["n_blocks"].append(n_blocks)
                out["text"].append(rec["text"])
                out["n_chars"].append(len(rec["text"]))
                out["ranged_ok"].append(bool(ok))
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, LZ4_SCHEMA)


# --------------------------------------------------------------------------
# q394 — HADOOP SEQUENCEFILE INGEST (sources/sequencefile.py): the
# MapReduce-era key/value container still sitting across every data
# lake. Each doc rides as two BytesWritable records (id key -> text
# value; meta key -> length value) in a RECORD-compressed (DefaultCodec
# zlib) SequenceFile; the kernel walks the real chain — header parse,
# record_index offsets, strict iteration, VInt class-name decode — and
# a second copy with an injected mid-file flip exercises the lenient
# scan's sync-marker resync. Facts are analytic (the q371/q389 shape).
# --------------------------------------------------------------------------
SEQ_SCHEMA = ("doc_id long, n_records int, n_index int, compressed "
              "boolean, key_class string, text_sig int, len_back int, "
              "scan_ok boolean")


@register(
    "q394_seqfile_ingest",
    oracle="""
    SELECT doc_id, CAST(2 AS INT) AS n_records,
           CAST(2 AS INT) AS n_index,
           TRUE AS compressed,
           'org.apache.hadoop.io.BytesWritable' AS key_class,
           ('0x' || substr(md5(text), 1, 4))::INT AS text_sig,
           CAST(length(text) AS INT) AS len_back,
           TRUE AS scan_ok
    FROM documents
    """,
)
def q394(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import hashlib as _hl
        import struct as _struct

        import pandas as pd

        from ..sources.sequencefile import (
            iter_seqfile, read_header, record_index, scan_seqfile,
            write_seqfile,
        )

        cols = ("doc_id", "n_records", "n_index", "compressed",
                "key_class", "text_sig", "len_back", "scan_ok")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                i = int(doc_id)
                body = str(t).encode()
                recs = [
                    (_struct.pack(">q", i), body),
                    (b"meta", _struct.pack(">q", len(body))),
                ]
                blob = write_seqfile(recs, compressed=True,
                                     metadata={"doc": str(i)},
                                     sync_interval=1)
                kc, _vc, comp, meta, _sync, _p = read_header(blob)
                idx = record_index(blob)
                back = list(iter_seqfile(blob))
                text_back = back[0][1]
                (len_back,) = _struct.unpack(">q", back[1][1])
                # damage leg: flip one byte inside the FIRST record's
                # deflate VALUE; the sync escape between records (the
                # per-record sync_interval) lets the scan keep record 2
                dam = bytearray(blob)
                dam[idx[0][0] + 8 + 12 + 2] ^= 0xFF
                got, c = scan_seqfile(bytes(dam))
                ok = (meta == {"doc": str(i)}
                      and back[0][0] == _struct.pack(">q", i)
                      and c["bad_records"] >= 1
                      and any(k == b"meta" for k, _v in got))
                out["doc_id"].append(i)
                out["n_records"].append(len(back))
                out["n_index"].append(len(idx))
                out["compressed"].append(bool(comp))
                out["key_class"].append(kc)
                out["text_sig"].append(
                    int(_hl.md5(text_back).hexdigest()[:4], 16))
                out["len_back"].append(int(len_back))
                out["scan_ok"].append(bool(ok))
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, SEQ_SCHEMA)


# --------------------------------------------------------------------------
# q399 — MULTI-STREAM .jsonl.bz2 / .jsonl.xz SHARD INGEST: the two
# stdlib-backed corpus compressions q382 (zstd) and q391 (lz4) don't
# cover. Shards are written as FOUR independent compressed streams
# concatenated per file — the seekable layout (pbzip2 / xz --block-list
# shape) that makes a 100 TB archive splittable: a reader can start at
# any stream boundary. The kernel walks stream boundaries with the
# incremental decompressor (eof + unused_data), re-decodes every stream
# STANDALONE from its byte slice to prove random access, and the two
# codec legs are cross-checked row-by-row (a doc only counts if bz2 and
# xz agree) in ONE aggregation pass — no self-join, no second decode.
# --------------------------------------------------------------------------
def _bzxz_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os as _os

        _os.makedirs(d, exist_ok=True)
        docs = (load(spark, sf_dir, "documents")
                .select("doc_id", "text", "lang")
                .withColumn("shard", (F.col("doc_id") % 8).cast("int")))

        def writer(key, pdf):
            import bz2 as _bz2
            import json as _json
            import lzma as _lzma

            import pandas as pd

            shard = int(key[0])
            pdf = pdf.sort_values("doc_id")
            lines = [
                _json.dumps({"id": int(i), "text": t, "lang": g},
                            ensure_ascii=False)
                for i, t, g in zip(pdf["doc_id"], pdf["text"], pdf["lang"])
            ]
            n = len(lines)
            cut = [0, (n + 3) // 4, (n + 1) // 2, (3 * n + 3) // 4, n]
            groups = [
                ("\n".join(lines[cut[k]:cut[k + 1]]) + "\n").encode()
                if lines[cut[k]:cut[k + 1]] else b""
                for k in range(4)
            ]
            bz = b"".join(_bz2.compress(g) for g in groups if g)
            xz = b"".join(
                _lzma.compress(g, format=_lzma.FORMAT_XZ)
                for g in groups if g)
            with open(f"{d}/part-{shard:02d}.jsonl.bz2", "wb") as f:
                f.write(bz)
            with open(f"{d}/part-{shard:02d}.jsonl.xz", "wb") as f:
                f.write(xz)
            return pd.DataFrame({"shard": [shard], "n": [n]})

        docs.groupBy("shard").applyInPandas(
            writer, "shard int, n long").collect()

    return _derived_dir(sf_dir, "bzxz", build)


@register(
    "q399_bz2_xz_jsonl",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def q399(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _bzxz_dir(spark, sf_dir)

    def kernel(batches):
        import bz2 as _bz2
        import json as _json
        import lzma as _lzma

        import pandas as pd

        def segments(data, mk):
            """Walk concatenated-stream boundaries via the incremental
            decompressor's eof/unused_data contract."""
            segs, pos = [], 0
            while pos < len(data):
                dec = mk()
                out = dec.decompress(data[pos:])
                if not dec.eof:
                    raise ValueError("truncated compressed stream")
                end = len(data) - len(dec.unused_data)
                segs.append((pos, end, out))
                pos = end
            return segs

        for pdf in batches:
            rows = {"doc_id": [], "lang": [], "text": [], "src": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if path.endswith(".bz2"):
                    src = "bz2"
                    segs = segments(data, _bz2.BZ2Decompressor)
                    standalone = _bz2.decompress
                else:
                    src = "xz"
                    segs = segments(
                        data,
                        lambda: _lzma.LZMADecompressor(_lzma.FORMAT_XZ))
                    standalone = (
                        lambda b: _lzma.decompress(b, _lzma.FORMAT_XZ))
                if not 1 <= len(segs) <= 4:  # tiny shards may drop groups
                    raise ValueError(
                        f"{path}: expected 1-4 streams, got {len(segs)}")
                for s, e, plain in segs:
                    # random access: the byte slice decodes on its own
                    if standalone(data[s:e]) != plain:
                        raise ValueError(f"{path}: stream slice mismatch")
                    for line in plain.decode("utf-8").splitlines():
                        rec = _json.loads(line)
                        rows["doc_id"].append(int(rec["id"]))
                        rows["lang"].append(rec["lang"])
                        rows["text"].append(rec["text"])
                        rows["src"].append(src)
            yield pd.DataFrame(rows)

    rows = (
        spark.read.format("binaryFile").load(d + "/part-*")
        .select("path", "content")
        .mapInPandas(kernel, "doc_id long, lang string, text string, "
                             "src string")
    )
    per_doc = rows.groupBy("doc_id", "lang", "text").agg(
        F.count("*").alias("n_copies"),
        F.countDistinct("src").alias("n_srcs"),
    )
    agreed = per_doc.filter((F.col("n_copies") == 2)
                            & (F.col("n_srcs") == 2))
    return agreed.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# q395 — AVRO SCHEMA-EVOLUTION READ (spec "Schema Resolution"): a store
# written over years of pipeline versions holds containers under
# DIFFERENT writer schemas; the reader resolves all of them to one
# reader schema — fields matched by name, added columns filled from
# declared defaults, int->long promotion applied. This is q184's
# mergeSchema contract at the Avro layer: even rows were exported
# under the OLD schema (no lang, no n_chars), odd rows under the NEW
# one; the reader sees a single table where old rows carry the
# defaults (null lang -> 'none' key, n_chars -1), all value-checked
# against the parquet truth.
# --------------------------------------------------------------------------
def _avroevo_dir(spark: SparkSession, sf_dir: str) -> str:
    old_schema = {"type": "record", "name": "doc", "fields": [
        {"name": "doc_id", "type": "int"},      # reader promotes: long
        {"name": "text", "type": "string"}]}
    new_schema = {"type": "record", "name": "doc", "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": "string"},
        {"name": "lang", "type": ["null", "string"]},
        {"name": "n_chars", "type": "long"}]}

    def build(d: str) -> None:
        import os as _os

        _os.makedirs(d, exist_ok=True)
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "n_chars")

        def writer(batches):
            import pandas as pd

            from ..sources.avro import write_container

            for pdf in batches:
                rows = pdf.to_dict("records")
                if not rows:
                    continue
                lo = min(int(r["doc_id"]) for r in rows)
                old = [{"doc_id": int(r["doc_id"]), "text": r["text"]}
                       for r in rows if r["doc_id"] % 2 == 0]
                new = [{"doc_id": int(r["doc_id"]), "text": r["text"],
                        "lang": r["lang"], "n_chars": int(r["n_chars"])}
                       for r in rows if r["doc_id"] % 2 == 1]
                n = 0
                if old:
                    with open(_os.path.join(
                            d, f"old-{lo:08d}.avro"), "wb") as f:
                        f.write(write_container(old, old_schema))
                    n += len(old)
                if new:
                    with open(_os.path.join(
                            d, f"new-{lo:08d}.avro"), "wb") as f:
                        f.write(write_container(new, new_schema))
                    n += len(new)
                yield pd.DataFrame({"n": [n]})

        docs.repartition(8, "doc_id").mapInPandas(
            writer, "n long").collect()

    return _derived_dir(sf_dir, "avroevo", build), new_schema


@register(
    "q395_avro_evolution",
    oracle="""
    SELECT CASE WHEN doc_id % 2 = 0 THEN 'none' ELSE lang END
               AS lang_key,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN -1 ELSE n_chars END)
                AS BIGINT) AS chars_sum
    FROM documents GROUP BY 1
    """,
)
def q395(spark: SparkSession, sf_dir: str) -> DataFrame:
    d, reader_schema = _avroevo_dir(spark, sf_dir)
    # the reader schema ADDS columns with defaults over the old writer
    reader_schema = {
        "type": "record", "name": "doc", "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "text", "type": "string"},
            {"name": "lang", "type": ["null", "string"],
             "default": None},
            {"name": "n_chars", "type": "long", "default": -1}]}

    import pandas as pd

    def kernel(batches):
        from ..sources.avro import iter_container_resolved

        for pdf in batches:
            for blob in pdf["content"]:
                cols = {"doc_id": [], "lang": [], "n_chars": []}
                for rec in iter_container_resolved(bytes(blob),
                                                   reader_schema):
                    cols["doc_id"].append(rec["doc_id"])
                    cols["lang"].append(rec["lang"])
                    cols["n_chars"].append(rec["n_chars"])
                yield pd.DataFrame(cols)

    rows = (spark.read.format("binaryFile").load(d + "/*.avro")
            .select("content")
            .mapInPandas(kernel,
                         "doc_id long, lang string, n_chars long"))
    return rows.groupBy(
        F.coalesce(F.col("lang"), F.lit("none")).alias("lang_key")
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.sum("n_chars").cast("bigint").alias("chars_sum"),
    )


# --------------------------------------------------------------------------
# q396 — STREAMING TFRECORD INGEST: the arrival path for trainer-format
# shards. The corpus is exported once to TFRecord shards (q389's
# format), then a Structured Streaming binaryFile source drains them in
# MULTIPLE micro-batches (maxFilesPerTrigger=3), each batch decoded by
# the Arrow kernel (scan_tfrecord + protobuf decode) and appended
# through the idempotent SnapshotTableSink (batch-id replay marks, the
# q239 contract). The final table equals the batch truth — the oracle;
# replay idempotency itself is unit-proven in test_snapshots.
# --------------------------------------------------------------------------
def _tfrec_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os as _os

        _os.makedirs(d, exist_ok=True)
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")

        def writer(batches):
            import pandas as pd

            from ..sources.tfrecord import encode_example, write_tfrecord

            for pdf in batches:
                rows = pdf.to_dict("records")
                if not rows:
                    continue
                recs = [encode_example({
                    "doc_id": [int(r["doc_id"])],
                    "lang": [str(r["lang"]).encode()],
                    "n_chars": [int(r["n_chars"])],
                }) for r in rows]
                lo = min(int(r["doc_id"]) for r in rows)
                path = _os.path.join(d, f"docs-{lo:08d}.tfrecord")
                with open(path, "wb") as f:
                    f.write(write_tfrecord(recs))
                yield pd.DataFrame({"n": [len(recs)]})

        docs.repartition(8, "doc_id").mapInPandas(
            writer, "n long").collect()

    return _derived_dir(sf_dir, "tfrec", build)


@register(
    "q396_stream_tfrecord_ingest",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sum
    FROM documents GROUP BY lang
    """,
)
def q396(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sources.snapshots import read_snapshot
    from ..streaming.snapshot_sink import SnapshotTableSink

    shard_dir = _tfrec_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="q396_")

    import pandas as pd

    def kernel(batches):
        from ..sources.tfrecord import decode_example, scan_tfrecord

        for pdf in batches:
            cols = {"doc_id": [], "lang": [], "n_chars": []}
            for blob in pdf["content"]:
                records, _c = scan_tfrecord(bytes(blob))
                for r in records:
                    d = decode_example(r)
                    cols["doc_id"].append(d["doc_id"][0])
                    cols["lang"].append(
                        d["lang"][0].decode("utf-8"))
                    cols["n_chars"].append(d["n_chars"][0])
            yield pd.DataFrame(cols)

    bin_schema = ("path string, modificationTime timestamp, "
                  "length long, content binary")
    stream = (
        spark.readStream.format("binaryFile")
        .schema(bin_schema)
        .option("pathGlobFilter", "*.tfrecord")
        .option("maxFilesPerTrigger", 3)  # force several micro-batches
        .load(shard_dir)
        .select("content")
        .mapInPandas(kernel, "doc_id long, lang string, n_chars long")
    )
    sink = SnapshotTableSink(f"{work}/table", f"{work}/ckpt")
    sink.run_available_now(stream)
    return read_snapshot(spark, f"{work}/table").groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.sum("n_chars").cast("bigint").alias("chars_sum"),
    )


# --------------------------------------------------------------------------
# q407 — MBOX / MIME EMAIL INGEST (sources/mbox.py; RFC 4155 + 5322 +
# 2045/2046/2047): mailing-list archives are a standing LLM-corpus
# source. Each doc becomes a REAL two-part MIME message — RFC 2047
# B-encoded subject, quoted-printable text/plain body, base64
# application/octet-stream attachment — wrapped in an mbox with a
# second plain message whose body STARTS with 'From ' (the mboxo
# quoting trap). The kernel splits the mbox, unquotes, parses headers
# (folding, case-insensitivity), walks the multipart boundaries, and
# decodes both transfer encodings; every extracted value is replayed
# analytically by the oracle. The codec is cross-validated against
# CPython's `email` package in tests/test_mbox.py — an independent
# implementation of the same RFCs, the audioop discipline.
# --------------------------------------------------------------------------
MBOX_SCHEMA = ("doc_id long, n_messages int, n_parts int, "
               "subject_back string, body_len int, body_ok boolean, "
               "att_sig int, quoted_ok boolean")


@register(
    "q407_mbox_ingest",
    oracle="""
    SELECT doc_id, CAST(2 AS INT) AS n_messages,
           CAST(3 AS INT) AS n_parts,
           substr(text, 1, 12) AS subject_back,
           CAST(length(text) AS INT) AS body_len,
           TRUE AS body_ok,
           ('0x' || substr(md5(text), 1, 4))::INT AS att_sig,
           TRUE AS quoted_ok
    FROM documents
    """,
)
def q407(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import base64 as _b64
        import hashlib as _hl

        import pandas as pd

        from ..sources.mbox import (
            encode_word, iter_mbox, parse_message, qp_encode, write_mbox,
        )

        cols = ("doc_id", "n_messages", "n_parts", "subject_back",
                "body_len", "body_ok", "att_sig", "quoted_ok")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                t = str(t)
                digest = _hl.md5(t.encode()).digest()
                subject = encode_word(t[:12], "utf-8", "B")
                body_qp = qp_encode(t.encode("utf-8"))
                att = _b64.encodebytes(digest)
                m1 = (f"From: a@x\r\nSubject: {subject}\r\n"
                      f"MIME-Version: 1.0\r\n"
                      f'Content-Type: multipart/mixed; boundary="B1"\r\n'
                      f"\r\n--B1\r\n"
                      f"Content-Type: text/plain; charset=utf-8\r\n"
                      f"Content-Transfer-Encoding: quoted-printable\r\n"
                      f"\r\n").encode() + body_qp + (
                    b"\r\n--B1\r\n"
                    b"Content-Type: application/octet-stream\r\n"
                    b"Content-Transfer-Encoding: base64\r\n"
                    b"\r\n") + att + b"--B1--\r\n"
                m2 = b"Subject: plain\r\n\r\nFrom the top\nFrom here\n"
                msgs = iter_mbox(write_mbox([m1, m2]))
                p1 = parse_message(msgs[0])
                p2 = parse_message(msgs[1])
                body = p1["parts"][0]["payload"].decode("utf-8")
                out["doc_id"].append(int(doc_id))
                out["n_messages"].append(len(msgs))
                out["n_parts"].append(len(p1["parts"])
                                      + len(p2["parts"]))
                out["subject_back"].append(p1["subject"])
                out["body_len"].append(len(body))
                out["body_ok"].append(body == t)
                # the attachment carries md5(text): its first two bytes
                # are the oracle's substr(md5(text), 1, 4)
                out["att_sig"].append(
                    int(p1["parts"][1]["payload"][:2].hex(), 16))
                out["quoted_ok"].append(
                    p2["parts"][0]["payload"]
                    == b"From the top\nFrom here\n")
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, MBOX_SCHEMA)


# --------------------------------------------------------------------------
# q408 — ENCRYPTED PDF text extraction (ISO 32000-1 7.6.3 standard
# security handler, sources/pdf.py + sources/crypto.py): the last PDF
# gate closed. Each doc's payload is a REAL encrypted PDF — odd docs
# RC4-128 (/V 2 /R 3) in the classic-xref layout, even docs AES-128-CBC
# (/V 4 /AESV2) in the PDF 1.5 xref-stream + ObjStm layout, so the
# per-object-key derivation (Algorithm 1 incl. the sAlT suffix), the
# /U authentication (Algorithms 2/4/5), CBC IV/padding handling, AND
# the encrypted-ObjStm path all run per document. Ciphers are the
# FIPS-197 vector-pinned pure-Python AES + RC4. Empty user password =
# the auto-open corpus case; the oracle replays the extracted text
# analytically. At 100 TB this is the same per-doc Arrow-kernel shape
# as q373/q381 — decryption adds CPU, not shuffle.
# --------------------------------------------------------------------------
@register(
    "q408_pdf_encrypted",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             trim(regexp_replace(
               'Classified ' || CAST(doc_id % 50 AS VARCHAR) || ' '
                 || substr(text, 1, 48),
               '\\s+', ' ', 'g')) AS full_text
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'aes' ELSE 'rc4' END AS cipher,
           CAST(1 AS INT) AS n_pages,
           full_text AS text,
           CAST(length(full_text) AS INT) AS n_chars,
           TRUE AS hidden_ok
    FROM p
    """,
)
def q408(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import pandas as pd

        from ..sources.pdf import PdfDocument, write_pdf

        cols = ("doc_id", "cipher", "n_pages", "text", "n_chars",
                "hidden_ok")
        for pdf_batch in batches:
            out = {k: [] for k in cols}
            for doc_id, t in zip(pdf_batch["doc_id"], pdf_batch["text"]):
                aes = doc_id % 2 == 0
                lines = [f"Classified {doc_id % 50}", t[:48]]
                payload = write_pdf(
                    [lines], encrypt="aes" if aes else "rc4",
                    xref_stream=aes, use_objstm=aes)
                doc = PdfDocument(payload)
                text = doc.text()
                # the plaintext must not appear in the ciphertext file
                hidden = lines[1].encode("latin-1") not in payload \
                    if len(lines[1]) >= 8 else True
                out["doc_id"].append(doc_id)
                out["cipher"].append("aes" if aes else "rc4")
                out["n_pages"].append(len(doc.pages()))
                out["text"].append(text)
                out["n_chars"].append(len(text))
                out["hidden_ok"].append(bool(hidden))
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        kernel, "doc_id long, cipher string, n_pages int, text string, "
                "n_chars int, hidden_ok boolean")


# --------------------------------------------------------------------------
# q413 — IDNA / PUNYCODE host handling (RFC 3492 + the xn-- ACE
# convention, functions/punycode.py): international domains arrive in
# crawls as ACE labels; blocklists, homoglyph audits (q295), and host
# canonicalization (q251) need the Unicode form. Each doc derives an
# 8-char host label from its md5 nibbles over a 16-char alphabet (8
# ASCII, 8 non-ASCII), the kernel runs encode -> ACE -> decode and
# RAISES on any round-trip mismatch; the oracle reconstructs the
# Unicode host and its codepoint sum analytically from the same
# nibbles (chr() arithmetic — the ACE form itself is exactly what SQL
# cannot produce, which is why the codec exists). The codec is pinned
# to the RFC 7.1 vectors and cross-validated against CPython's
# punycode codec in tests/test_punycode.py.
# --------------------------------------------------------------------------
_IDNA_CPS = [ord(c) for c in "abcdefgh" + "éüñßαβ中水"]
_IDNA_CHR_SQL = ("CASE " + " ".join(
    f"WHEN {i} THEN chr({cp})" for i, cp in enumerate(_IDNA_CPS))
    + " END")


@register(
    "q413_idna_hosts",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, md5(text) AS h FROM documents
    ), lbl AS (
      SELECT doc_id,
             list_aggregate(list_transform(generate_series(1, 8),
               i -> CASE ('0x' || substr(h, i, 1))::INT
                    {_IDNA_CHR_SQL[5:]}), 'string_agg', '') AS label,
             list_sum(list_transform(generate_series(1, 8),
               i -> [{", ".join(str(c) for c in _IDNA_CPS)}]
                    [('0x' || substr(h, i, 1))::INT + 1])) AS lbl_cp,
             list_max(list_transform(generate_series(1, 8),
               i -> ('0x' || substr(h, i, 1))::INT)) AS max_nib
      FROM n
    )
    SELECT doc_id,
           label || '.example.com' AS host,
           CAST(3 AS INT) AS n_labels,
           CAST(lbl_cp + 1159 AS BIGINT) AS cp_sum,
           max_nib >= 8 AS is_ace
    FROM lbl
    """,
)
def q413(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import hashlib as _hl

        import pandas as pd

        from ..functions.punycode import (
            idna_decode_host, idna_encode_host,
        )

        alphabet = [chr(c) for c in _IDNA_CPS]
        cols = ("doc_id", "host", "n_labels", "cp_sum", "is_ace")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                hexd = _hl.md5(str(t).encode()).hexdigest()
                label = "".join(alphabet[int(c, 16)] for c in hexd[:8])
                host = label + ".example.com"
                ace = idna_encode_host(host)
                back = idna_decode_host(ace)
                if back != host:
                    raise ValueError(f"IDNA round trip broke: {host!r} "
                                     f"-> {ace!r} -> {back!r}")
                has_uni = any(ord(c) >= 128 for c in label)
                if has_uni != ace.startswith("xn--"):
                    raise ValueError(f"ACE prefix inconsistent: {ace!r}")
                out["doc_id"].append(int(doc_id))
                out["host"].append(host)
                out["n_labels"].append(len(host.split(".")))
                out["cp_sum"].append(sum(ord(c) for c in host))
                out["is_ace"].append(has_uni)
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        kernel, "doc_id long, host string, n_labels int, cp_sum long, "
                "is_ace boolean")


# --------------------------------------------------------------------------
# q414 — ARROW IPC (Feather V2) SHARD INGEST: Hugging Face datasets
# materialize as Arrow files — the de-facto training-data interchange
# format next to parquet. Shards are written executor-side through
# pyarrow's IPC writer with small record batches (so batch iteration
# is real, asserted in-kernel), re-read through the IPC reader inside
# an Arrow kernel, and the aggregate is value-checked against the
# parquet truth — the q390 Avro gate for the Arrow-native path. At
# 100 TB the IPC format's random-access footer (batch offsets) is the
# ranged-read contract; here every file carries >= 2 batches.
# --------------------------------------------------------------------------
def _arrow_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os as _os

        _os.makedirs(d, exist_ok=True)
        docs = (load(spark, sf_dir, "documents")
                .select("doc_id", "text", "lang", "n_chars")
                .withColumn("shard", (F.col("doc_id") % 8).cast("int")))

        def writer(key, pdf):
            import pandas as pd
            import pyarrow as pa
            import pyarrow.ipc as ipc

            shard = int(key[0])
            pdf = pdf.sort_values("doc_id").drop(columns=["shard"])
            table = pa.Table.from_pandas(pdf, preserve_index=False)
            path = f"{d}/part-{shard:02d}.arrow"
            with ipc.new_file(path, table.schema) as w:
                w.write_table(table, max_chunksize=max(
                    1, len(pdf) // 3))
            return pd.DataFrame({"shard": [shard], "n": [len(pdf)]})

        docs.groupBy("shard").applyInPandas(
            writer, "shard int, n long").collect()

    return _derived_dir(sf_dir, "arrowipc", build)


@register(
    "q414_arrow_ipc",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(CASE WHEN length(text) = n_chars THEN 1 ELSE 0 END)
                AS BIGINT) AS n_consistent
    FROM documents GROUP BY lang
    """,
)
def q414(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _arrow_dir(spark, sf_dir)

    def kernel(batches):
        import io as _io

        import pyarrow.ipc as ipc

        for pdf in batches:
            for blob in pdf["content"]:
                r = ipc.open_file(_io.BytesIO(bytes(blob)))
                if r.num_record_batches < 2:
                    raise ValueError(
                        "arrow shard lost its multi-batch layout")
                yield r.read_all().to_pandas()

    rows = (spark.read.format("binaryFile").load(d + "/part-*.arrow")
            .select("content")
            .mapInPandas(kernel, "doc_id long, text string, "
                                 "lang string, n_chars long"))
    return rows.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.sum(F.when(F.length("text") == F.col("n_chars"), 1)
              .otherwise(0)).cast("bigint").alias("n_consistent"),
    )


# --------------------------------------------------------------------------
# q415 — SAFETENSORS SHARD ROUND TRIP (sources/safetensors.py, the
# Hugging Face tensor format): embedding shards written as real
# safetensors files (float32 matrix + int64 ids + int32 labels, with
# an md5 digest of the tensor payload carried in __metadata__), read
# back through the strict parser (offset/shape/coverage validation),
# digest recomputed from the PARSED tensors — bytes proven identical
# end to end, which is what a weights/activations hand-off needs.
# Facts are exact integers (id/label sums); the oracle replays them
# from the embeddings table.
# --------------------------------------------------------------------------
def _safetensors_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os as _os

        _os.makedirs(d, exist_ok=True)
        emb = (load(spark, sf_dir, "embeddings")
               .withColumn("shard", (F.col("vec_id") % 8).cast("int")))

        def writer(key, pdf):
            import hashlib as _hl

            import numpy as np
            import pandas as pd

            from ..sources.safetensors import write_safetensors

            shard = int(key[0])
            pdf = pdf.sort_values("vec_id")
            tensors = {
                "embeddings": np.stack(
                    pdf["embedding"].to_numpy()).astype(np.float32),
                "vec_ids": pdf["vec_id"].to_numpy(np.int64),
                "labels": pdf["label"].to_numpy(np.int32),
            }
            digest = _hl.md5(
                b"".join(tensors[k].tobytes() for k in sorted(tensors))
            ).hexdigest()
            blob = write_safetensors(
                tensors, {"shard": str(shard), "digest": digest})
            with open(f"{d}/model-{shard:02d}.safetensors", "wb") as f:
                f.write(blob)
            return pd.DataFrame({"shard": [shard], "n": [len(pdf)]})

        emb.groupBy("shard").applyInPandas(
            writer, "shard int, n long").collect()

    return _derived_dir(sf_dir, "safetensors", build)


@register(
    "q415_safetensors",
    oracle="""
    SELECT CAST(vec_id % 8 AS INT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(64 AS INT) AS dim,
           CAST(SUM(vec_id) AS BIGINT) AS id_sum,
           CAST(SUM(label) AS BIGINT) AS label_sum,
           TRUE AS digest_ok
    FROM embeddings GROUP BY 1
    """,
)
def q415(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _safetensors_dir(spark, sf_dir)

    def kernel(batches):
        import hashlib as _hl

        import pandas as pd

        from ..sources.safetensors import read_safetensors

        cols = ("shard", "n_rows", "dim", "id_sum", "label_sum",
                "digest_ok")
        for pdf in batches:
            out = {k: [] for k in cols}
            for blob in pdf["content"]:
                tensors, meta = read_safetensors(bytes(blob))
                redigest = _hl.md5(
                    b"".join(tensors[k].tobytes()
                             for k in sorted(tensors))
                ).hexdigest()
                emb = tensors["embeddings"]
                out["shard"].append(int(meta["shard"]))
                out["n_rows"].append(emb.shape[0])
                out["dim"].append(emb.shape[1])
                out["id_sum"].append(int(tensors["vec_ids"].sum()))
                out["label_sum"].append(
                    int(tensors["labels"].sum(dtype="int64")))
                out["digest_ok"].append(redigest == meta["digest"])
            yield pd.DataFrame(out)

    return (spark.read.format("binaryFile")
            .load(d + "/model-*.safetensors")
            .select("content")
            .mapInPandas(kernel, "shard int, n_rows long, dim int, "
                                 "id_sum long, label_sum long, "
                                 "digest_ok boolean"))


# --------------------------------------------------------------------------
# q416 — KAFKA LOG-SEGMENT INGEST (RecordBatch magic v2,
# sources/kafkalog.py): event streams are archived to object stores as
# raw broker segment files; replaying them without a broker is how an
# offline pipeline backfills. Each doc rides as a two-batch segment
# (text record with a lang header + a meta record), walked strictly
# (CRC32C-gated batch parse, zigzag varint records, null key/value
# forms, lastOffsetDelta consistency) — and a damaged COPY exercises
# scan_segment's magic+CRC resync, which must keep the second batch
# and charge the first. Facts are analytic (the q394 SequenceFile
# shape for the other big data-bus format).
# --------------------------------------------------------------------------
KAFKA_SCHEMA = ("doc_id long, n_records int, n_batches int, "
                "offset0 long, text_sig int, lang_back string, "
                "len_back int, scan_ok boolean, codec_ok boolean")


@register(
    "q416_kafka_segment",
    oracle="""
    SELECT doc_id, CAST(2 AS INT) AS n_records,
           CAST(2 AS INT) AS n_batches,
           CAST(doc_id * 10 AS BIGINT) AS offset0,
           ('0x' || substr(md5(text), 1, 4))::INT AS text_sig,
           lang AS lang_back,
           CAST(length(text) AS INT) AS len_back,
           TRUE AS scan_ok,
           TRUE AS codec_ok
    FROM documents
    """,
)
def q416(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text",
                                                "lang"))

    def kernel(batches):
        import hashlib as _hl
        import struct as _struct

        import pandas as pd

        from ..sources.kafkalog import (
            iter_segment, scan_segment, write_segment,
        )

        cols = ("doc_id", "n_records", "n_batches", "offset0",
                "text_sig", "lang_back", "len_back", "scan_ok",
                "codec_ok")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, t, lang in zip(pdf["doc_id"], pdf["text"],
                                       pdf["lang"]):
                i = int(doc_id)
                body = str(t).encode()
                recs = [
                    (_struct.pack(">q", i), body,
                     [(b"lang", str(lang).encode())]),
                    (b"meta", _struct.pack(">q", len(body)), []),
                ]
                seg = write_segment(recs, base_offset=i * 10,
                                    batch_size=1)  # 2 batches
                back = iter_segment(seg)
                # compressed leg: a snappy segment of the SAME records
                # must decode to identical (key, value, headers)
                zseg = write_segment(recs, base_offset=i * 10,
                                     batch_size=1, compression="snappy")
                zback = iter_segment(zseg)
                codec_ok = (
                    [(r["key"], r["value"], r["headers"])
                     for r in zback]
                    == [(r["key"], r["value"], r["headers"])
                        for r in back]
                    and (zseg[22] & 7) == 2)  # attributes: snappy
                (_, bl) = _struct.unpack(">qi", seg[:12])
                dam = bytearray(seg)
                dam[40] ^= 0xFF  # inside batch 1's header/payload
                got, c = scan_segment(bytes(dam))
                (len_back,) = _struct.unpack(">q", back[1]["value"])
                ok = (len(back) == 2
                      and back[0]["headers"][0][0] == b"lang"
                      and back[1]["key"] == b"meta"
                      and c["bad_batches"] >= 1
                      and any(r["key"] == b"meta" for r in got))
                out["doc_id"].append(i)
                out["n_records"].append(len(back))
                out["n_batches"].append(
                    1 + (1 if len(seg) > bl + 12 else 0))
                out["offset0"].append(int(back[0]["offset"]))
                out["text_sig"].append(int(_hl.md5(
                    back[0]["value"]).hexdigest()[:4], 16))
                out["lang_back"].append(
                    back[0]["headers"][0][1].decode())
                out["len_back"].append(int(len_back))
                out["scan_ok"].append(bool(ok))
                out["codec_ok"].append(bool(codec_ok))
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, KAFKA_SCHEMA)


# --------------------------------------------------------------------------
# q417 — STREAMING KAFKA-SEGMENT INGEST (q396's pattern for the data-
# bus format): the corpus is exported once as RecordBatch-v2 segment
# files (sources/kafkalog.py — each doc a record: key = doc_id BE,
# value = n_chars BE, lang in a record header), then a Structured
# Streaming binaryFile source drains them in several micro-batches,
# each decoded by the strict CRC-gated walk and appended through the
# idempotent SnapshotTableSink. Final table == batch truth. This is
# the broker-less backfill path an offline trainer runs against
# archived topics.
# --------------------------------------------------------------------------
def _kafkaseg_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os as _os

        _os.makedirs(d, exist_ok=True)
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")

        def writer(batches):
            import struct as _struct

            import pandas as pd

            from ..sources.kafkalog import write_segment

            for pdf in batches:
                rows = pdf.to_dict("records")
                if not rows:
                    continue
                recs = [(
                    _struct.pack(">q", int(r["doc_id"])),
                    _struct.pack(">q", int(r["n_chars"])),
                    [(b"lang", str(r["lang"]).encode())],
                ) for r in rows]
                lo = min(int(r["doc_id"]) for r in rows)
                path = _os.path.join(d, f"topic-{lo:08d}.kafkaseg")
                with open(path, "wb") as f:
                    f.write(write_segment(recs, base_offset=lo,
                                          batch_size=100))
                yield pd.DataFrame({"n": [len(recs)]})

        docs.repartition(8, "doc_id").mapInPandas(
            writer, "n long").collect()

    return _derived_dir(sf_dir, "kafkaseg", build)


@register(
    "q417_stream_kafka_ingest",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sum
    FROM documents GROUP BY lang
    """,
)
def q417(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    import pandas as pd

    from ..sources.snapshots import read_snapshot
    from ..streaming.snapshot_sink import SnapshotTableSink

    shard_dir = _kafkaseg_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="q417_")

    def kernel(batches):
        import struct as _struct

        from ..sources.kafkalog import iter_segment

        for pdf in batches:
            cols = {"doc_id": [], "lang": [], "n_chars": []}
            for blob in pdf["content"]:
                for r in iter_segment(bytes(blob)):
                    (doc_id,) = _struct.unpack(">q", r["key"])
                    (n_chars,) = _struct.unpack(">q", r["value"])
                    cols["doc_id"].append(doc_id)
                    cols["lang"].append(
                        dict(r["headers"])[b"lang"].decode())
                    cols["n_chars"].append(n_chars)
            yield pd.DataFrame(cols)

    bin_schema = ("path string, modificationTime timestamp, "
                  "length long, content binary")
    stream = (
        spark.readStream.format("binaryFile")
        .schema(bin_schema)
        .option("pathGlobFilter", "*.kafkaseg")
        .option("maxFilesPerTrigger", 3)
        .load(shard_dir)
        .select("content")
        .mapInPandas(kernel, "doc_id long, lang string, n_chars long")
    )
    sink = SnapshotTableSink(f"{work}/table", f"{work}/ckpt")
    sink.run_available_now(stream)
    return read_snapshot(spark, f"{work}/table").groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.sum("n_chars").cast("bigint").alias("chars_sum"),
    )


# --------------------------------------------------------------------------
# q424 — DICTIONARY-COMPRESSED zstd FRAMES (RFC 8878 section 5): the
# small-document shard pattern — per-record frames are dominated by
# header + first-occurrence costs, so real corpus writers share ONE
# dictionary across a shard and every frame's matches reach into its
# content. Both sides run the IN-TREE codec: compress(dictionary=)
# extends the first block's match window below the frame start, and
# decompress(dictionary=) replays it (entropy/rep preload + content
# window); the per-shard saving is asserted in-kernel (total dict-
# frame bytes < total plain-frame bytes). tests/test_zstd.py
# additionally cross-validates both directions against libzstd with a
# ZDICT-trained dictionary. The oracle replays the JSON envelope
# analytically.
# --------------------------------------------------------------------------
ZDICT_SCHEMA = ("doc_id long, text string, n_chars int, "
                "dict_rt_ok boolean, plain_guard_ok boolean")

_ZSTD_SHARED_DICT = (
    b'{"id": 000000, "lang": "en", "text": "the quick brown '
    b'information document pipeline training corpus shard record '
    b'available different people because government"} ') * 2


@register(
    "q424_zstd_dict_frames",
    oracle="""
    SELECT doc_id, text, CAST(length(text) AS INT) AS n_chars,
           TRUE AS dict_rt_ok, TRUE AS plain_guard_ok
    FROM documents
    """,
)
def q424(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches):
        import json as _json

        import pandas as pd

        from ..sources.zstd import compress, decompress

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "text", "n_chars",
                                   "dict_rt_ok", "plain_guard_ok")}
            dict_total = plain_total = 0
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                line = _json.dumps(
                    {"id": int(doc_id), "lang": "en", "text": t},
                    ensure_ascii=False).encode()
                dframe = compress(line, dictionary=_ZSTD_SHARED_DICT)
                pframe = compress(line)
                dict_total += len(dframe)
                plain_total += len(pframe)
                rt = decompress(dframe,
                                dictionary=_ZSTD_SHARED_DICT) == line
                # a dict frame must NOT decode as plain (the window
                # reaches below frame start) — unless no match fired
                guard = True
                try:
                    guard = decompress(dframe) != line or \
                        dframe == pframe
                except ValueError:
                    guard = True
                rec = _json.loads(line)
                rows.append((rec["id"], rec["text"], rt, guard))
            shard_ok = dict_total < plain_total or not rows
            for doc_id, t, rt, guard in rows:
                out["doc_id"].append(doc_id)
                out["text"].append(t)
                out["n_chars"].append(len(t))
                out["dict_rt_ok"].append(bool(rt and shard_ok))
                out["plain_guard_ok"].append(bool(guard))
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, ZDICT_SCHEMA)


# --------------------------------------------------------------------------
# q428 — SCHEMA-LESS PROTOBUF AUDIT (functions/protoaudit.py): the
# triage step for unknown-provenance shards — walk real tf.train
# .Example wire bytes WITHOUT the schema and recover the field tree.
# The oracle states the EXPECTED tree from the .proto definition
# (Example.features=1 -> map entry -> key=1/value=2 -> BytesList=1 /
# Int64List=3 -> value=1) and the varint/length arithmetic of the
# payload sizes; the engine must recover all of it from bytes alone.
# Texts are padded to >=140 chars so the BytesList Feature's length
# varint contains a non-UTF-8 continuation byte and the
# message-vs-text classification is deterministic; the audit depth is
# capped at the schema's real depth so a packed-varint payload that
# HAPPENS to re-parse as a message (doc_id-dependent) cannot add
# phantom paths — schema-less triage needs an explicit depth policy.
# --------------------------------------------------------------------------
PROTO_SCHEMA = ("doc_id long, paths string, n_entries int, "
                "text_bytes int, ids_varint_bytes int")


@register(
    "q428_proto_audit",
    oracle="""
    SELECT doc_id,
           '1,1.1,1.1.1,1.1.2,1.1.2.1,1.1.2.1.1,1.1.2.3,1.1.2.3.1'
               AS paths,
           CAST(2 AS INT) AS n_entries,
           CAST(greatest(length(text), 140) AS INT) AS text_bytes,
           CAST((CASE WHEN doc_id < 128 THEN 1
                      WHEN doc_id < 16384 THEN 2
                      WHEN doc_id < 2097152 THEN 3
                      ELSE 4 END) +
                (CASE WHEN n_chars < 128 THEN 1
                      WHEN n_chars < 16384 THEN 2
                      ELSE 3 END) AS INT) AS ids_varint_bytes
    FROM documents
    """,
)
def q428(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select(
            "doc_id", "text", "n_chars"))

    def kernel(batches):
        import pandas as pd

        from ..functions.protoaudit import field_paths
        from ..sources.tfrecord import encode_example

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "paths", "n_entries",
                                   "text_bytes", "ids_varint_bytes")}
            for doc_id, t, n_chars in zip(pdf["doc_id"], pdf["text"],
                                          pdf["n_chars"]):
                padded = t + "x" * max(0, 140 - len(t))
                blob = encode_example({
                    "ids": [int(doc_id), int(n_chars)],
                    "text": [padded.encode()]})
                rows = {r["path"]: r
                        for r in field_paths(blob, max_depth=4)}
                out["doc_id"].append(doc_id)
                out["paths"].append(",".join(sorted(rows)))
                out["n_entries"].append(rows["1.1"]["count"])
                out["text_bytes"].append(rows["1.1.2.1.1"]["bytes"])
                out["ids_varint_bytes"].append(
                    rows["1.1.2.3.1"]["bytes"])
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, PROTO_SCHEMA)


# --------------------------------------------------------------------------
# q432 — EPUB INGEST (sources/epub.py): books are the highest-quality
# long-form slice of a pretraining mix, and they ship as EPUB (OCF zip
# + OPF package). Each doc becomes a two-chapter book (text split at
# the floor midpoint) with a linear="no" cover the spine walk must
# SKIP; the kernel runs the real chain — OCF mimetype check,
# container.xml -> OPF, Dublin Core metadata, manifest/spine
# resolution, spine-ordered XHTML extraction through the SAME HTML
# extractor the crawl path uses — and the oracle replays title,
# language, and the exact joined text analytically.
# --------------------------------------------------------------------------
EPUB_SCHEMA = ("doc_id long, title string, language string, "
               "n_chapters int, text string")


@register(
    "q432_epub_ingest",
    oracle="""
    WITH p AS (
      SELECT doc_id, lang,
             trim(substr(text, 1, CAST(floor(length(text) / 2) AS INT)))
                 AS p1,
             trim(substr(text, CAST(floor(length(text) / 2) AS INT) + 1))
                 AS p2
      FROM documents
    )
    SELECT doc_id,
           'Book ' || CAST(doc_id % 100 AS VARCHAR) AS title,
           lang AS language,
           CAST(2 AS INT) AS n_chapters,
           'Part 1 Part 1 ' || p1 || ' Part 2 Part 2 ' || p2 AS text
    FROM p
    """,
)
def q432(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang"))

    def kernel(batches):
        import pandas as pd

        from ..sources.epub import epub_text, write_epub

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "title", "language",
                                   "n_chapters", "text")}
            for doc_id, t, lang in zip(pdf["doc_id"], pdf["text"],
                                       pdf["lang"]):
                half = len(t) // 2
                p1, p2 = t[:half].strip(), t[half:].strip()
                book = write_epub(
                    f"Book {doc_id % 100}", f"Author {doc_id % 10}",
                    lang,
                    [("Part 1", f"<p>{p1}</p>"),
                     ("Part 2", f"<p>{p2}</p>")],
                    extra_nonlinear="Cover art placeholder")
                title, text, n = epub_text(book)
                from ..sources.epub import read_epub

                out["doc_id"].append(doc_id)
                out["title"].append(title)
                out["language"].append(read_epub(book)["language"])
                out["n_chapters"].append(n)
                out["text"].append(text)
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, EPUB_SCHEMA)

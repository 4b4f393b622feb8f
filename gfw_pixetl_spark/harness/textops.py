"""Training-data pipeline harness queries: dedup + text analysis.

Oracles are generated from the same constants the Spark operators use
(hash coefficients, stopword lexicons, LSH banding), so both engines run
the exact same math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dedup as D
from ..functions import text as T
from ..functions.hashing import FNV_WORD_MOD, P31, md5_int64_sql, minhash_coeffs
from ..functions.multimodal import (
    extract_image_meta, resize_images, sample_frames,
)
from . import load, register

# shared SQL fragments -----------------------------------------------------
SQL_WORDS = "list_filter(string_split(text, ' '), w -> w != '')"
SQL_WORDSET = f"list_distinct({SQL_WORDS})"
COEFFS = minhash_coeffs(D.N_MINHASH)


def _sql_word_hash(expr: str = "word") -> str:
    return md5_int64_sql(expr)


# --------------------------------------------------------------------------
# q26 — exact dedup: hash-groupBy on content digest
# --------------------------------------------------------------------------
@register(
    "q26_dedup_exact",
    oracle="""
    SELECT md5(text) AS digest,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS dup_count
    FROM documents GROUP BY 1
    """,
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q27 — blocked n-gram Jaccard near-dup pairs
# --------------------------------------------------------------------------
@register(
    "q27_jaccard_pairs",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, {SQL_WORDSET} AS ws FROM documents
    ), sizes AS (
      SELECT doc_id, len(ws) AS n FROM base
    ), ex AS (
      SELECT doc_id, source, unnest(ws) AS w FROM base
    ), common AS (
      -- equi-join on term instead of all-pairs list_intersect (zero
      -- overlap cannot reach the threshold -> identical result set)
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS c
      FROM ex a JOIN ex b
        ON a.w = b.w AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT doc_id_a, doc_id_b,
             round(c / (sa.n + sb.n - c), 6) AS jaccard
      FROM common
      JOIN sizes sa ON common.doc_id_a = sa.doc_id
      JOIN sizes sb ON common.doc_id_b = sb.doc_id
      WHERE c / (sa.n + sb.n - c) >= 0.5
    )
    SELECT * FROM pairs
    """,
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, threshold=0.5, block_cols=("source",))


# --------------------------------------------------------------------------
# q28 — MinHash signatures (k=8)
# --------------------------------------------------------------------------
_mh_cols = ",\n           ".join(
    f"MIN(((hw % {P31}) * {a} + {b}) % {P31}) AS mh{i}"
    for i, (a, b) in enumerate(COEFFS)
)


@register(
    "q28_minhash_sigs",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest({SQL_WORDSET}) AS word FROM documents
    ), h AS (
      SELECT doc_id, {_sql_word_hash()} AS hw FROM w
    )
    SELECT doc_id,
           {_mh_cols}
    FROM h GROUP BY doc_id
    """,
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_signatures(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q29 — MinHash LSH candidate pairs (band -> bucket equi-join)
# --------------------------------------------------------------------------
_rows_per_band = D.N_MINHASH // D.N_BANDS
_band_key_sql = []
for b in range(D.N_BANDS):
    parts = ", ".join(
        f"CAST(mh{b * _rows_per_band + r} AS VARCHAR)" for r in range(_rows_per_band)
    )
    _band_key_sql.append(
        f"SELECT doc_id, {b} AS band_id, "
        f"CAST(('0x' || substr(md5(concat_ws('_', {parts})), 1, 15)) AS BIGINT) AS key "
        f"FROM sigs"
    )
_bands_union = "\n      UNION ALL\n      ".join(_band_key_sql)


# Star-contracted LSH edges in SQL (hub = min doc_id per bucket): the
# SAME connected components as the full pair graph, with linearly many
# edges — the oracle-side twin of functions/dedup.py::lsh_star_edges.
# Component-family oracles (q53/q62/q208) build their recursive
# reachability on THIS edge set; the full O(m^2)-pair edge set made the
# transitive-closure join explode at sf0.1 (edges x labels ~ 1e10).
# banded is MATERIALIZED so DuckDB computes the signature pipeline once.
STAR_EDGES_SQL = f"""
    WITH w AS (
      SELECT doc_id, unnest({SQL_WORDSET}) AS word FROM documents
    ), h AS (
      SELECT doc_id, {_sql_word_hash()} AS hw FROM w
    ), sigs AS (
      SELECT doc_id,
             {_mh_cols}
      FROM h GROUP BY doc_id
    ), banded AS MATERIALIZED (
      {_bands_union}
    ), hubs AS (
      SELECT band_id, key, MIN(doc_id) AS hub FROM banded GROUP BY 1, 2
    )
    SELECT DISTINCT hb.hub AS doc_id_a, b.doc_id AS doc_id_b
    FROM banded b JOIN hubs hb
      ON b.band_id = hb.band_id AND b.key = hb.key
    WHERE b.doc_id != hb.hub
"""


# Component CTE stack shared by the component-family oracles
# (q53/q62/q208): reachability closure runs over the HUB GRAPH only
# (hubs sharing a member are adjacent), then members take the min of
# their hubs' component labels. Identical components to the full pair
# graph — every doc sharing a bucket reaches its bucket hub, and the
# component's min doc_id is always itself a hub (it is the min of any
# bucket containing it) — at a label-propagation cost bounded by the
# hub count, not O(cluster^2) (the full closure blew past 10 GB at
# sf0.1). Ends with `comp(doc_id, component)`.
COMPONENT_CTES_SQL = f"""star AS MATERIALIZED (
      {{star_edges}}
    ), hub_set AS (
      SELECT DISTINCT doc_id_a AS hub FROM star
    ), hub_edges AS (
      -- hubs adjacent iff their buckets overlap: via a shared plain
      -- member, OR because one hub is itself a member of the other's
      -- bucket (the chain 461-case: hub-as-member links components)
      SELECT DISTINCT a.doc_id_a AS src, b.doc_id_a AS dst
      FROM star a JOIN star b ON a.doc_id_b = b.doc_id_b
      WHERE a.doc_id_a != b.doc_id_a
      UNION
      SELECT s.doc_id_a, s.doc_id_b FROM star s
      JOIN hub_set h ON s.doc_id_b = h.hub
      UNION
      SELECT s.doc_id_b, s.doc_id_a FROM star s
      JOIN hub_set h ON s.doc_id_b = h.hub
    ), reach(id, lab) AS (
      SELECT DISTINCT doc_id_a, doc_id_a FROM star
      UNION
      SELECT e.dst, r.lab FROM hub_edges e JOIN reach r ON e.src = r.id
    ), hub_comp AS (
      SELECT id AS hub, MIN(lab) AS component FROM reach GROUP BY id
    ), doc_labels AS (
      SELECT s.doc_id_b AS doc_id, hc.component
      FROM star s JOIN hub_comp hc ON s.doc_id_a = hc.hub
      UNION ALL
      SELECT hub, component FROM hub_comp
    ), comp AS (
      SELECT doc_id, MIN(component) AS component
      FROM doc_labels GROUP BY doc_id
    )"""


@register(
    "q29_minhash_lsh_pairs",
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
    )
    SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
    FROM banded a JOIN banded b
      ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id
    """,
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = D.minhash_signatures(load(spark, sf_dir, "documents"))
    return D.lsh_candidate_pairs(sigs)


# --------------------------------------------------------------------------
# q30 — SimHash signatures (16-bit)
# --------------------------------------------------------------------------
_sim_sums = ",\n           ".join(
    f"SUM(CASE WHEN (hw >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
    for i in range(D.SIMHASH_BITS)
)
_sim_sig = " + ".join(
    f"(CASE WHEN s{i} > 0 THEN {2**i} ELSE 0 END)" for i in range(D.SIMHASH_BITS)
)


@register(
    "q30_simhash",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest({SQL_WORDSET}) AS word FROM documents
    ), h AS (
      SELECT doc_id, {_sql_word_hash()} AS hw FROM w
    ), sums AS (
      SELECT doc_id,
           {_sim_sums}
      FROM h GROUP BY doc_id
    )
    SELECT doc_id, CAST({_sim_sig} AS BIGINT) AS simhash FROM sums
    """,
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q31 — SimHash near-dup pairs (Hamming <= 3, blocked on top byte)
# --------------------------------------------------------------------------
@register(
    "q31_simhash_pairs",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest({SQL_WORDSET}) AS word FROM documents
    ), h AS (
      SELECT doc_id, {_sql_word_hash()} AS hw FROM w
    ), sums AS (
      SELECT doc_id,
           {_sim_sums}
      FROM h GROUP BY doc_id
    ), sig AS (
      SELECT doc_id, CAST({_sim_sig} AS BIGINT) AS simhash FROM sums
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sig a JOIN sig b
      ON (a.simhash >> 8) = (b.simhash >> 8) AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = D.simhash(load(spark, sf_dir, "documents"))
    return D.simhash_near_pairs(sig, max_hamming=3)


# --------------------------------------------------------------------------
# q32 — language ID (stopword-vote heuristic)
# --------------------------------------------------------------------------
def _langid_oracle() -> str:
    selects = []
    for lang in sorted(T.LANG_STOPWORDS):
        lex = ", ".join(f"'{s}'" for s in T.LANG_STOPWORDS[lang])
        selects.append(
            f"SELECT doc_id, '{lang}' AS lang, "
            f"len(list_filter({SQL_WORDS}, w -> list_contains([{lex}], lower(w)))) AS n "
            f"FROM documents"
        )
    union = "\n      UNION ALL\n      ".join(selects)
    return f"""
    WITH scores AS (
      {union}
    ), ranked AS (
      SELECT doc_id, lang, n,
             row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, lang ASC) AS rn
      FROM scores
    )
    SELECT doc_id,
           CASE WHEN n > 0 THEN lang ELSE 'und' END AS pred_lang,
           n AS vote_count
    FROM ranked WHERE rn = 1
    """


@register("q32_language_id", oracle=_langid_oracle())
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.language_id(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q33 — quality scoring (length/punct/stopword ratios)
# --------------------------------------------------------------------------
_stop_lits = ", ".join(f"'{s}'" for s in T.LANG_STOPWORDS["en"])


@register(
    "q33_quality_score",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id,
             len({SQL_WORDS}) AS n_words,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars,
             len(list_filter({SQL_WORDS},
                             w -> list_contains([{_stop_lits}], lower(w)))) AS n_stopwords,
             length(text) AS n_chars
      FROM documents
    )
    SELECT doc_id, n_words, alpha_chars, n_stopwords,
           round((alpha_chars / n_chars) * 0.5
                 + (n_stopwords / n_words) * 0.3
                 + least((n_chars - (n_words - 1)) / n_words / 10.0, 1.0) * 0.2,
                 6) AS quality_score
    FROM feats
    """,
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.quality_features(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q34 — token counting (whitespace + BPE-ish regex), per source
# --------------------------------------------------------------------------
@register(
    "q34_token_counts",
    oracle=f"""
    SELECT source,
           CAST(SUM(len({SQL_WORDS})) AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{T.TOKEN_REGEX}'))) AS BIGINT)
             AS bpe_tokens,
           COUNT(*) AS n_docs
    FROM documents GROUP BY source
    """,
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum(T.token_count_whitespace("text")).alias("ws_tokens"),
        F.sum(T.token_count_bpe("text")).alias("bpe_tokens"),
        F.count("*").alias("n_docs"),
    )


# --------------------------------------------------------------------------
# q35 — document fingerprint (position-weighted rolling hash)
# --------------------------------------------------------------------------
@register(
    "q35_fingerprint",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             unnest({SQL_WORDS}) AS word,
             unnest(generate_series(1, len({SQL_WORDS}))) AS pos1
      FROM documents
    )
    SELECT doc_id,
           CAST(SUM(({_sql_word_hash()} % {FNV_WORD_MOD}) * pos1)
                % {T.FINGERPRINT_MOD} AS BIGINT) AS fingerprint
    FROM w GROUP BY doc_id
    """,
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.fingerprint(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q40 — multimodal metadata extraction: REAL spec-valid PNGs whose
# dimensions/channels vary per doc (doc_image_payload: w = 2 + b0 % 7,
# h = 2 + b1 % 7, ch = 1 or 3 by b2 % 2), recovered by a real IHDR
# header sniff (no pixel inflate); the oracle replays all of it from
# md5(text) hex.
# --------------------------------------------------------------------------
@register(
    "q40_multimodal_meta",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             ('0x' || substr(md5(text), 1, 2))::INT AS b0,
             ('0x' || substr(md5(text), 3, 2))::INT AS b1,
             ('0x' || substr(md5(text), 5, 2))::INT AS b2
      FROM documents
    )
    SELECT doc_id,
           CAST(2 + b0 % 7 AS INT) AS width,
           CAST(2 + b1 % 7 AS INT) AS height,
           CAST(1 + 2 * (b2 % 2) AS INT) AS channels,
           CAST((2 + b0 % 7) * (2 + b1 % 7) * (1 + 2 * (b2 % 2)) AS INT)
               AS n_bytes
    FROM b
    """,
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_image_meta(load(spark, sf_dir, "documents"))


def _media_payloads(spark: SparkSession, sf_dir: str, maker) -> DataFrame:
    """documents -> (doc_id, payload) with a REAL container payload built
    per doc by ``maker`` (jpeg_payload / video_payload / ...)."""
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    )

    def attach(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "payload": [maker(t) for t in pdf["text"]],
            })

    return docs.mapInPandas(attach, "doc_id long, payload binary")


def _rhe(e: str) -> str:
    """SQL round-half-to-even (the np.rint / IEEE default the uint8
    quantizer uses), for non-negative dyadic-exact doubles."""
    return (f"CAST(CASE WHEN ({e}) - floor({e}) = 0.5 "
            f"THEN floor({e}) + CAST(floor({e}) AS BIGINT) % 2 "
            f"ELSE floor(({e}) + 0.5) END AS INT)")


# --------------------------------------------------------------------------
# q50 — REAL resize chain: baseline-JPEG decode (Huffman + DCT,
# sources/jpeg.py) -> exact area resize 16x16 -> 2x2 (block means = the
# four digest bytes) -> PNG round-trip -> bilinear upscale 2x2 -> 4x4
# (half-pixel centers, dyadic 3/4 + 1/4 taps that MIX all four blocks)
# -> uint8 round-half-even -> PNG -> second full decode via the probe.
# Every weight is dyadic, so float64 is exact and the oracle replays the
# resampled pixels to the bit from md5(text) hex. Digest stand-ins gone.
# --------------------------------------------------------------------------
_Q50_MIX = {  # (row, col) -> bilinear weights on (d0, d1, d2, d3), /16
    (1, 1): (9, 3, 3, 1), (1, 2): (3, 9, 1, 3),
    (2, 1): (3, 1, 9, 3), (2, 2): (1, 3, 3, 9),
}
_Q50_PROBES = ", ".join(
    _rhe(f"({w[0]}*d0 + {w[1]}*d1 + {w[2]}*d2 + {w[3]}*d3) / 16.0")
    + f" AS p{r}{c}"
    for (r, c), w in _Q50_MIX.items()
)


@register(
    "q50_multimodal_resize",
    oracle=f"""
    WITH b AS (
      SELECT doc_id,
             ('0x' || substr(md5(text), 1, 2))::INT AS d0,
             ('0x' || substr(md5(text), 3, 2))::INT AS d1,
             ('0x' || substr(md5(text), 5, 2))::INT AS d2,
             ('0x' || substr(md5(text), 7, 2))::INT AS d3
      FROM documents
    )
    SELECT doc_id, CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
           CAST(d0 AS INT) AS p00, {_Q50_PROBES},
           CAST(d3 AS INT) AS p33
    FROM b
    """,
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import decode_pixel_probe, jpeg_payload

    jpegs = _media_payloads(spark, sf_dir, jpeg_payload)
    small = resize_images(jpegs, target=(2, 2), method="area")
    up = resize_images(small, target=(4, 4), method="bilinear")
    return decode_pixel_probe(
        up, [(0, 0), (1, 1), (1, 2), (2, 1), (2, 2), (3, 3)]
    )


# --------------------------------------------------------------------------
# q51 — REAL frame sampling: each doc carries a GPXV frame container (24
# offset-indexed PNG frames; the mp4-sample-table shape), sample_frames
# slices frames 0/10/20 out by byte range WITHOUT decoding the rest, and
# the probe fully decodes each sampled PNG. Frame k's pixels are
# md5(text || ':' || k) digest bytes, so the oracle replays the decoded
# pixels of exactly the sampled frames.
# --------------------------------------------------------------------------
@register(
    "q51_multimodal_frames",
    oracle="""
    SELECT d.doc_id,
           CAST(f.frame_idx AS BIGINT) AS frame_idx,
           CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
           ('0x' || substr(md5(d.text || ':' || f.frame_idx), 1, 2))::INT
               AS p00,
           ('0x' || substr(md5(d.text || ':' || f.frame_idx), 11, 2))::INT
               AS p11,
           ('0x' || substr(md5(d.text || ':' || f.frame_idx), 31, 2))::INT
               AS p33
    FROM documents d
    CROSS JOIN (SELECT unnest([0, 10, 20]) AS frame_idx) f
    """,
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import decode_pixel_probe, video_payload

    vids = _media_payloads(spark, sf_dir, video_payload)
    frames = sample_frames(vids, every_nth=10, n_frames=3)
    return decode_pixel_probe(
        frames, [(0, 0), (1, 1), (3, 3)], id_cols=("doc_id", "frame_idx")
    )


# --------------------------------------------------------------------------
# q360 — REAL ISO-BMFF (mp4) frame sampling: each doc carries a
# spec-valid mp4 (ftyp+mdat+moov; full stsd/stts/stsc/stsz/stco sample
# tables per ISO/IEC 14496-12, multi-run stsc chunking) holding 24 PNG
# frames. sample_frames walks the real moov/trak/mdia/minf/stbl box
# tree (sources/bmff.py), slices frames 0/10/20 by byte range WITHOUT
# touching the other 21 frames, and the probe fully decodes each
# sampled PNG. Frame k's pixels are md5(text || ':' || k) digest bytes,
# so the oracle replays the decoded pixels of exactly the sampled
# frames — identical values to q51, arrived at through the real
# container. At 100 TB this is ranged-GET work: O(frames picked) bytes
# per video regardless of container size.
# --------------------------------------------------------------------------
@register(
    "q360_bmff_frames",
    oracle="""
    SELECT d.doc_id,
           CAST(f.frame_idx AS BIGINT) AS frame_idx,
           CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
           ('0x' || substr(md5(d.text || ':' || f.frame_idx), 1, 2))::INT
               AS p00,
           ('0x' || substr(md5(d.text || ':' || f.frame_idx), 11, 2))::INT
               AS p11,
           ('0x' || substr(md5(d.text || ':' || f.frame_idx), 31, 2))::INT
               AS p33
    FROM documents d
    CROSS JOIN (SELECT unnest([0, 10, 20]) AS frame_idx) f
    """,
)
def q360(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import decode_pixel_probe, mp4_payload

    vids = _media_payloads(spark, sf_dir, mp4_payload)
    frames = sample_frames(vids, every_nth=10, n_frames=3)
    return decode_pixel_probe(
        frames, [(0, 0), (1, 1), (3, 3)], id_cols=("doc_id", "frame_idx")
    )


# --------------------------------------------------------------------------
# q397 — REAL AVI/MJPEG frame sampling: each doc carries a spec-valid
# RIFF AVI (hdrl/avih/strl + movi + idx1 per the Microsoft AVI RIFF
# reference, sources/avi.py) whose 'MJPG' stream holds 24 standalone
# baseline JFIFs. sample_frames resolves frames 0/10/20 to byte ranges
# through the container's OWN idx1 index (header + index reads only — at
# 100 TB, ranged GETs of O(frames picked) bytes per video), then the
# probe runs the full T.81 JPEG decode on each sampled frame. Frame k is
# the DC-only-exact 16x16 construction from md5(text || ':' || k), so
# the oracle replays the decoded 8x8 block values from the digest hex —
# the MJPEG/AVI twin of q360's mp4 path.
# --------------------------------------------------------------------------
@register(
    "q397_avi_mjpeg_frames",
    oracle="""
    SELECT d.doc_id,
           CAST(f.frame_idx AS BIGINT) AS frame_idx,
           CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
           ('0x' || substr(md5(d.text || ':' || f.frame_idx), 1, 2))::INT
               AS p00,
           ('0x' || substr(md5(d.text || ':' || f.frame_idx), 3, 2))::INT
               AS p08,
           ('0x' || substr(md5(d.text || ':' || f.frame_idx), 7, 2))::INT
               AS p88
    FROM documents d
    CROSS JOIN (SELECT unnest([0, 10, 20]) AS frame_idx) f
    """,
)
def q397(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import avi_payload, decode_pixel_probe

    vids = _media_payloads(spark, sf_dir, avi_payload)
    frames = sample_frames(vids, every_nth=10, n_frames=3)
    return decode_pixel_probe(
        frames, [(0, 0), (0, 8), (8, 8)], id_cols=("doc_id", "frame_idx")
    )


# --------------------------------------------------------------------------
# q403 — REAL WebP LOSSLESS decode (sources/webp.py, the public VP8L
# bitstream spec): each doc's payload is a spec-valid RIFF/WEBP file
# whose VP8L stream genuinely uses the format's machinery — subtract-
# green transform, color cache (the 0x1e35a7bd multiplicative hash),
# LZ77 backrefs through the 2D distance map, canonical prefix codes via
# the 19-symbol code-length code. The kernel runs the full decode
# (container walk, prefix-code build, pixel loop, inverse transforms)
# and the oracle replays the digest-byte pixels from md5(text) hex —
# the WebP analog of q153 (PNG) / q211 (JPEG) / q387 (GIF). Modern
# crawls are full of WebP; without this path the multimodal column
# gates on a codec library.
# --------------------------------------------------------------------------
@register(
    "q403_webp_decode",
    oracle="""
    SELECT doc_id,
           CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
           ('0x' || substr(md5(text), 1, 2))::INT AS p00,
           ('0x' || substr(md5(text), 11, 2))::INT AS p11,
           ('0x' || substr(md5(text), 21, 2))::INT AS p22,
           ('0x' || substr(md5(text), 31, 2))::INT AS p33
    FROM documents
    """,
)
def q403(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import decode_pixel_probe, webp_payload

    pics = _media_payloads(spark, sf_dir, webp_payload)
    return decode_pixel_probe(
        pics, [(0, 0), (1, 1), (2, 2), (3, 3)], id_cols=("doc_id",)
    )


# --------------------------------------------------------------------------
# q96 — winsorization: clip n_chars to the per-lang [p05, p95] band
# (exact linear-interpolated percentiles). The percentile dim is
# languages-sized, so it broadcasts back onto the corpus — the doc
# stream shuffles once for the percentile agg and never for the clip.
# --------------------------------------------------------------------------
@register(
    "q96_winsorize",
    oracle="""
    WITH b AS (
      SELECT lang, quantile_cont(n_chars, 0.05) AS p05,
             quantile_cont(n_chars, 0.95) AS p95
      FROM documents GROUP BY 1
    )
    SELECT d.doc_id, d.lang,
           round(least(greatest(d.n_chars, b.p05), b.p95), 2) AS clipped
    FROM documents d JOIN b USING (lang)
    """,
)
def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bounds = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.05)").alias("p05"),
        F.expr("percentile(n_chars, 0.95)").alias("p95"),
    )
    clipped = F.least(
        F.greatest(F.col("n_chars").cast("double"), F.col("p05")),
        F.col("p95"),
    )
    return docs.join(F.broadcast(bounds), "lang").select(
        "doc_id", "lang", F.round(clipped, 2).alias("clipped")
    )


# --------------------------------------------------------------------------
# q97 — z-score outliers: docs whose length is > 2 sigma from their
# language's mean. Same broadcast-the-statistics shape as q96; stddev
# rounded to absorb engine summation-order noise.
# --------------------------------------------------------------------------
@register(
    "q97_zscore_outliers",
    oracle="""
    WITH s AS (
      SELECT lang, avg(n_chars) AS mu, stddev_samp(n_chars) AS sd
      FROM documents GROUP BY 1
    )
    SELECT d.doc_id, d.lang,
           round((d.n_chars - s.mu) / s.sd, 4) AS z
    FROM documents d JOIN s USING (lang)
    WHERE abs((d.n_chars - s.mu) / s.sd) > 2
    """,
)
def q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    stats = docs.groupBy("lang").agg(
        F.avg("n_chars").alias("mu"),
        F.stddev_samp("n_chars").alias("sd"),
    )
    z = (F.col("n_chars") - F.col("mu")) / F.col("sd")
    return (
        docs.join(F.broadcast(stats), "lang")
        .filter(F.abs(z) > 2)
        .select("doc_id", "lang", F.round(z, 4).alias("z"))
    )


# --------------------------------------------------------------------------
# q136 — blocking-free exact similarity self-join via prefix filtering
# (SSJoin/PPJoin candidate rule) over 3-word shingles: rare-first global
# token order makes the prefix explode its own blocker — no application
# blocking column, no O(n²) pair space, exact results verified on full
# sets. The oracle is the brute-force quadratic join.
# --------------------------------------------------------------------------
_SHINGLES_SQL = """list_distinct(CASE WHEN len({w}) >= 3 THEN
      list_transform(generate_series(1, len({w}) - 2),
                     i -> {w}[i] || ' ' || {w}[i+1] || ' ' || {w}[i+2])
      ELSE [] END)""".format(w="list_filter(string_split(text, ' '), x -> x != '')")


@register(
    "q136_prefix_ssjoin",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_SHINGLES_SQL} AS ws FROM documents
    )
    , sizes AS (
      SELECT doc_id, len(ws) AS n FROM base WHERE len(ws) > 0
    ), ex AS (
      SELECT doc_id, unnest(ws) AS s FROM base
    ), common AS (
      -- equi-join on shingle instead of all-pairs list_intersect:
      -- pairs with zero common shingles cannot reach the threshold, so
      -- this is EXACTLY the same result at sub-quadratic cost (the
      -- all-pairs form ran minutes-to-never at sf0.1)
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS c
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id_a, doc_id_b,
           round(c / (sa.n + sb.n - c), 6) AS jaccard
    FROM common
    JOIN sizes sa ON common.doc_id_a = sa.doc_id
    JOIN sizes sb ON common.doc_id_b = sb.doc_id
    WHERE c / (sa.n + sb.n - c) >= 0.6
    """,
)
def q136(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    docs = load(spark, sf_dir, "documents")
    cap = os.environ.get("SPARK_GRAFT_SSJOIN_MAXTOK")
    return D.prefix_jaccard_pairs(
        docs, threshold=0.6, tokens=D.shingle_set("text"),
        max_verify_tokens=int(cap) if cap else None,
    )


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
    )
    freq = toks.groupBy("w").agg(F.count("*").alias("c"))
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
# q151 — filter funnel: the dataset-card attrition report. One pass
# computes every stage's survivor count (cumulative filters: language ->
# length band -> quality floor -> exact dedup keep-canonical); the only
# shuffle is the md5-digest window for canonical ids. This is the
# standard "documents remaining after each cleaning stage" table every
# corpus release publishes.
# --------------------------------------------------------------------------
@register(
    "q151_filter_funnel",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang,
             len({SQL_WORDS}) AS n_words,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars,
             len(list_filter({SQL_WORDS},
                             w -> list_contains([{_stop_lits}], lower(w)))) AS n_stopwords,
             length(text) AS n_chars,
             MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical
      FROM documents
    ), scored AS (
      SELECT *,
             round((alpha_chars / n_chars) * 0.5
                   + (n_stopwords / n_words) * 0.3
                   + least((n_chars - (n_words - 1)) / n_words / 10.0, 1.0) * 0.2,
                   6) AS q
      FROM feats
    ), flags AS (
      SELECT (lang = 'en') AS f1,
             (lang = 'en' AND n_words BETWEEN 20 AND 200) AS f2,
             (lang = 'en' AND n_words BETWEEN 20 AND 200
              AND q >= 0.52) AS f3,
             (lang = 'en' AND n_words BETWEEN 20 AND 200
              AND q >= 0.52 AND doc_id = canonical) AS f4
      FROM scored
    ), agg AS (
      SELECT COUNT(*) AS n0,
             CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             CAST(SUM(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
      FROM flags
    )
    SELECT 0 AS stage, 'all' AS stage_name, n0 AS n_docs FROM agg
    UNION ALL SELECT 1, 'lang_en', n1 FROM agg
    UNION ALL SELECT 2, 'len_20_200', n2 FROM agg
    UNION ALL SELECT 3, 'quality_ge_052', n3 FROM agg
    UNION ALL SELECT 4, 'exact_dedup', n4 FROM agg
    """,
)
def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    feats = T.quality_features(docs, keep_cols=("lang", "text")).withColumn(
        "canonical", F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    )
    f1 = F.col("lang") == "en"
    f2 = f1 & F.col("n_words").between(20, 200)
    f3 = f2 & (F.col("quality_score") >= 0.52)
    f4 = f3 & (F.col("doc_id") == F.col("canonical"))
    agg = feats.agg(
        F.count("*").alias("n0"),
        F.sum(f1.cast("long")).alias("n1"),
        F.sum(f2.cast("long")).alias("n2"),
        F.sum(f3.cast("long")).alias("n3"),
        F.sum(f4.cast("long")).alias("n4"),
    )
    stages = F.array(*[
        F.struct(
            F.lit(i).alias("stage"),
            F.lit(nm).alias("stage_name"),
            F.col(f"n{i}").alias("n_docs"),
        )
        for i, nm in enumerate(
            ["all", "lang_en", "len_20_200", "quality_ge_052", "exact_dedup"]
        )
    ])
    return agg.select(F.explode(stages).alias("s")).select(
        "s.stage", "s.stage_name", "s.n_docs"
    )


# --------------------------------------------------------------------------
# q153 — REAL image decode + resize: each doc's payload is a spec-valid
# Paeth-filtered PNG (pure-Python codec, sources/png.py); the kernel
# decodes actual pixels and block-averages 4x4 -> 2x2. The oracle
# replays the block means from md5(text) hex bytes — proving the real
# container decode bit-for-bit, not rows-only.
# --------------------------------------------------------------------------
def _md5_byte(i: int) -> str:
    return f"('0x' || substr(md5(text), {2 * i + 1}, 2))::INTEGER"


@register(
    "q153_image_decode_resize",
    oracle=f"""
    SELECT doc_id,
           CAST(({_md5_byte(0)} + {_md5_byte(1)} + {_md5_byte(4)}
                 + {_md5_byte(5)}) // 4 AS INTEGER) AS m00,
           CAST(({_md5_byte(2)} + {_md5_byte(3)} + {_md5_byte(6)}
                 + {_md5_byte(7)}) // 4 AS INTEGER) AS m01,
           CAST(({_md5_byte(8)} + {_md5_byte(9)} + {_md5_byte(12)}
                 + {_md5_byte(13)}) // 4 AS INTEGER) AS m10,
           CAST(({_md5_byte(10)} + {_md5_byte(11)} + {_md5_byte(14)}
                 + {_md5_byte(15)}) // 4 AS INTEGER) AS m11
    FROM documents
    """,
)
def q153(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import decode_resize_means

    return decode_resize_means(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q211 — REAL baseline-JPEG decode: each doc's payload is a spec-valid
# JFIF (sources/jpeg.py: Annex-K Huffman coding, DCT, byte stuffing)
# whose four 8x8 blocks are constant at md5(text) digest bytes 0-3 —
# DC-only blocks with a unit quant table decode exactly, so the oracle
# replays the decoded pixels from md5 hex. Proves the dominant
# web-image container end-to-end, the JPEG twin of q153.
# --------------------------------------------------------------------------
@register(
    "q211_jpeg_decode",
    oracle=f"""
    SELECT doc_id,
           CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
           CAST({_md5_byte(0)} AS INT) AS b00,
           CAST({_md5_byte(1)} AS INT) AS b01,
           CAST({_md5_byte(2)} AS INT) AS b10,
           CAST({_md5_byte(3)} AS INT) AS b11
    FROM documents
    """,
)
def q211(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import decode_jpeg_blocks

    return decode_jpeg_blocks(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q232 — REAL PROGRESSIVE JPEG decode (SOF2, T.81 Annex G): the same
# DC-only pixel construction as q211, but encoded as a multi-scan
# progressive stream (DC first at Al=1 + refinement, AC spectral bands
# with successive approximation, EOB-run coding). The decoder
# accumulates coefficient bits across scans and reconstructs exactly,
# so the identical md5-hex oracle applies — proving the dominant
# real-world web-JPEG variant end-to-end.
# --------------------------------------------------------------------------
@register(
    "q232_progressive_jpeg",
    oracle=f"""
    SELECT doc_id,
           CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
           CAST({_md5_byte(0)} AS INT) AS b00,
           CAST({_md5_byte(1)} AS INT) AS b01,
           CAST({_md5_byte(2)} AS INT) AS b10,
           CAST({_md5_byte(3)} AS INT) AS b11
    FROM documents
    """,
)
def q232(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import decode_jpeg_blocks

    return decode_jpeg_blocks(load(spark, sf_dir, "documents"),
                              progressive=True)


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
    )
    bc = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
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
# q159 — exact duplicated-substring spans (the fixed-width core of
# "Deduplicating Training Data Makes Language Models Better", Lee et al.
# 2022, arXiv:2107.06499): every 8-word window that appears verbatim in
# two or more documents, with its document and occurrence counts. Scale
# shape: windows explode positionally (O(tokens) rows, bounded width —
# the window arrays are built from a MATERIALIZED column, never a
# re-evaluated split, per the HOF pitfall in ROADMAP), then one
# hash-groupBy; no pairwise comparison anywhere.
# --------------------------------------------------------------------------
_W = 8


@register(
    "q159_dup_substrings",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {SQL_WORDS} AS ws FROM documents
    ), win AS (
      SELECT doc_id, unnest(
        list_transform(generate_series(1, len(ws) - {_W - 1}),
                       i -> array_to_string(list_slice(ws, i, i + {_W - 1}),
                                            ' '))) AS wtext
      FROM w WHERE len(ws) >= {_W}
    )
    SELECT md5(wtext) AS span_digest,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occurrences
    FROM win GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def q159(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    base = docs.select("doc_id", T.words("text").alias("ws"))
    n = F.size("ws")
    windows = F.transform(
        F.sequence(F.lit(1), n - (_W - 1)),
        lambda i: F.concat_ws(" ", F.slice("ws", i, _W)),
    )
    win = (
        base.filter(n >= _W)
        .select("doc_id", F.explode(windows).alias("wtext"))
    )
    return (
        win.groupBy(F.md5("wtext").alias("span_digest"))
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


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
# q163 — deterministic mixture interleave: the trainer-side data-mixing
# order. Each source gets a weight; a document's global position key is
# (rank within its source) / weight — the classic weighted round-robin
# that makes a 2x-weighted source appear twice as often in any prefix
# of the stream. Pure window arithmetic, reproducible across runs, no
# shuffling RNG. Output: the first 200 schedule slots. Scale note: a
# global schedule is inherently a total order; at corpus scale the
# final slot numbering range-partitions on order_key (sortWithin
# partitions + partition offsets) instead of one global window.
# --------------------------------------------------------------------------
_MIX_WEIGHTS = {"src0": 4.0, "src1": 2.0, "src2": 2.0}  # others 1.0


def _mix_weight_sql() -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {w}" for s, w in _MIX_WEIGHTS.items())
    return f"CASE {cases} ELSE 1.0 END"


@register(
    "q163_mixture_interleave",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
               AS rn,
             {_mix_weight_sql()} AS w
      FROM documents
    ), keyed AS (
      SELECT doc_id, source, round(rn / w, 9) AS order_key FROM ranked
    )
    SELECT slot, doc_id, source, order_key FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY order_key, source, doc_id)
               AS slot
      FROM keyed
    ) WHERE slot <= 200
    """,
)
def q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    w = F.coalesce(
        *[F.when(F.col("source") == s, F.lit(wt))
          for s, wt in _MIX_WEIGHTS.items()],
        F.lit(1.0),
    )
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy("doc_id"))
    keyed = docs.select(
        "doc_id", "source",
        F.round(rn / w, 9).alias("order_key"),
    )
    slot = F.row_number().over(
        Window.orderBy("order_key", "source", "doc_id"))
    return (
        keyed.withColumn("slot", slot)
        .filter(F.col("slot") <= 200)
        .select("slot", "doc_id", "source", "order_key")
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
# q167 — overlapping document chunking (RAG / context-window prep):
# size-200 chunks every 160 chars (40 overlap), short final chunk kept.
# Pure sequence+explode+substring — whole-stage codegen end to end; the
# fan-out is data-local so the op shuffles nothing at any corpus size.
# Reference analog: the windowed read planner (tiles/tile.py windows)
# applied to text instead of rasters.
# --------------------------------------------------------------------------
@register(
    "q167_doc_chunking",
    oracle="""
    WITH ch AS (
      SELECT doc_id, text,
             unnest(range(0, GREATEST(
               CAST(ceil((length(text) - 40) / 160.0) AS BIGINT), 1)))
               AS chunk_id
      FROM documents
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(chunk_id * 160 AS BIGINT) AS chunk_start,
           substring(text, CAST(chunk_id * 160 + 1 AS INT), 200)
             AS chunk_text,
           CAST(length(substring(text, CAST(chunk_id * 160 + 1 AS INT),
                                 200)) AS BIGINT) AS chunk_len
    FROM ch
    """,
)
def q167(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return T.chunk_documents(docs, size=200, overlap=40)


# --------------------------------------------------------------------------
# q175 — ViT-style patch extraction (the vision twin of q167's text
# chunking): REAL 8x8 PNG decode -> 16 non-overlapping 2x2 patches with
# floor-mean and max per patch, long format (16 rows per image,
# data-local fan-out). Pixels are md5 digest bytes tiled 4x, so the
# oracle replays every patch statistic straight from md5(text) hex —
# container decode value-checked, not rows-only (q153's pattern).
# --------------------------------------------------------------------------
def _patch_term(dr: int, dc: int) -> str:
    idx = f"(((2 * g.pr + {dr}) * 8 + 2 * g.pc + {dc}) % 16)"
    return f"('0x' || substr(md5(d.text), 2 * {idx} + 1, 2))::INTEGER"


@register(
    "q175_image_patches",
    oracle=f"""
    WITH g AS (
      SELECT i.pr AS pr, j.pc AS pc
      FROM generate_series(0, 3) i(pr), generate_series(0, 3) j(pc)
    )
    SELECT d.doc_id,
           CAST(g.pr AS INTEGER) AS patch_row,
           CAST(g.pc AS INTEGER) AS patch_col,
           CAST(({_patch_term(0, 0)} + {_patch_term(0, 1)}
                 + {_patch_term(1, 0)} + {_patch_term(1, 1)}) // 4
                AS BIGINT) AS p_mean,
           CAST(greatest({_patch_term(0, 0)}, {_patch_term(0, 1)},
                         {_patch_term(1, 0)}, {_patch_term(1, 1)})
                AS BIGINT) AS p_max
    FROM documents d, g
    """,
)
def q175(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import image_patches

    return image_patches(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q177 — content-defined chunking boundaries: Rabin-style rolling hash
# (8-char window, base-31 polynomial, boundary at H % 64 == 0). The
# content-addressed complement of q167's fixed-stride chunking: an edit
# reshifts only its own chunk, so chunk-level exact dedup survives
# insertions. Fully unrolled into codegen'd ascii() terms; the oracle
# replays the identical polynomial.
# --------------------------------------------------------------------------
_CDC_TERMS = " + ".join(
    f"CAST(ord(substr(text, CAST(i - {k} AS INT), 1)) AS BIGINT) * {31 ** k}"
    for k in range(8)
)


@register(
    "q177_cdc_boundaries",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, text, unnest(range(8, length(text) + 1)) AS i
      FROM documents
    )
    SELECT doc_id, CAST(i AS BIGINT) AS boundary_pos
    FROM pos WHERE ({_CDC_TERMS}) % 64 = 0
    """,
)
def q177(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.cdc_boundaries(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q179 — streaming chunk-level dedup: documents stream in (availableNow
# drain), explode through the SAME fixed-stride chunker as q167
# (stateless on a stream), and only never-seen chunk digests survive the
# state store — the incremental corpus-prep pipeline. Oracle = batch
# distinct over the q167 chunk set.
# --------------------------------------------------------------------------
@register(
    "q179_stream_chunk_dedup",
    oracle="""
    WITH ch AS (
      SELECT doc_id, text,
             unnest(range(0, GREATEST(
               CAST(ceil((length(text) - 40) / 160.0) AS BIGINT), 1)))
               AS chunk_id
      FROM documents
    )
    SELECT DISTINCT
           md5(substring(text, CAST(chunk_id * 160 + 1 AS INT), 200))
             AS digest,
           CAST(length(substring(text, CAST(chunk_id * 160 + 1 AS INT),
                                 200)) AS BIGINT) AS chunk_len
    FROM ch
    """,
)
def q179(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import run_stream_chunk_dedup_once

    return run_stream_chunk_dedup_once(spark, f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# q184 — schema-evolution read: the corpus directory holds files written
# by TWO pipeline versions (v1: doc_id+lang; v2 adds source).
# mergeSchema unions the footers; v1 rows surface source as NULL. The
# per-(lang, version) tally proves the evolved read matches what a
# never-evolved store would say — the contract a long-lived 100 TB
# store depends on. Files are (re)written per sf_dir into a keyed tmp
# dir, so the oracle replays from the documents table analytically
# (v1 = doc_id % 2 == 0).
# --------------------------------------------------------------------------
def _source_fingerprint(sf_dir: str) -> str:
    """Content fingerprint of the source documents.parquet (path, size,
    mtime of every data file) — regenerated testdata changes the
    fingerprint, so derived-dataset caches can never serve stale."""
    import hashlib as _hl
    import os

    p = os.path.join(sf_dir, "documents.parquet")
    paths = [p]
    if os.path.isdir(p):
        paths = sorted(
            os.path.join(r, f) for r, _, fs in os.walk(p) for f in fs)
    parts = []
    for q in paths:
        st = os.stat(q)
        parts.append(f"{q}|{st.st_size}|{st.st_mtime_ns}")
    return _hl.md5("\n".join(parts).encode()).hexdigest()[:12]


def _derived_dir(sf_dir: str, tag: str, build) -> str:
    """Cache a derived dataset under a fingerprint-keyed tmp dir.

    ``build(tmp_path)`` writes into a unique scratch dir which is then
    atomically renamed into place — a concurrent builder loses the
    rename race harmlessly (its scratch is discarded), and a stale
    cache is impossible because the source fingerprint is in the key
    (r2 advice on the old non-atomic ``_built`` marker scheme).
    """
    import os
    import shutil
    import tempfile
    import uuid

    key = sf_dir.strip("/").replace("/", "_")
    fp = _source_fingerprint(sf_dir)
    d = os.path.join(tempfile.gettempdir(), f"gfw_{tag}_{key}_{fp}")
    if os.path.isdir(d):
        return d
    tmp = f"{d}.build.{uuid.uuid4().hex[:8]}"
    build(tmp)
    try:
        os.rename(tmp, d)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return d


def _evolved_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        docs = load(spark, sf_dir, "documents")
        v1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
        v2 = docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", "lang", "source")
        v1.coalesce(1).write.mode("overwrite").parquet(d)
        v2.coalesce(1).write.mode("append").parquet(d)

    return _derived_dir(sf_dir, "evolved", build)


@register(
    "q184_schema_evolution",
    oracle="""
    SELECT lang,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_v1_rows,
           CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_v2_rows,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_v1_null_source,
           CAST(COUNT(DISTINCT CASE WHEN doc_id % 2 = 1 THEN source END)
                AS BIGINT) AS n_sources
    FROM documents GROUP BY lang
    """,
)
def q184(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.textfiles import read_evolved_parquet

    # version is derived from doc_id % 2 on BOTH sides (the writer's
    # discriminator, r2 advice); n_v1_null_source separately asserts the
    # mergeSchema contract that every v1 row surfaces source as NULL —
    # in the oracle that count IS n_v1_rows, so a v1 row with a non-NULL
    # source (or a dropped NULL) hash-mismatches.
    v1 = F.col("doc_id") % 2 == 0
    df = read_evolved_parquet(spark, _evolved_dir(spark, sf_dir))
    return df.groupBy("lang").agg(
        F.sum(F.when(v1, 1).otherwise(0))
        .cast("bigint").alias("n_v1_rows"),
        F.sum(F.when(~v1, 1).otherwise(0))
        .cast("bigint").alias("n_v2_rows"),
        F.sum(F.when(v1 & F.col("source").isNull(), 1).otherwise(0))
        .cast("bigint").alias("n_v1_null_source"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    )


# --------------------------------------------------------------------------
# q186 — the corpus-curation pipeline END-TO-END as one DataFrame
# program: length filter -> exact dedup (keep lowest doc_id) ->
# deterministic train/val/test split -> per-(split, lang) doc and
# token tallies. Every stage is an operator this engine already ships
# (q26/q173/q34 building blocks) composed into the single plan a "run
# my curation job" user actually submits; Catalyst fuses the filter
# into the scan and the whole thing is two shuffles (dedup groupBy,
# final rollup) at any corpus size.
# --------------------------------------------------------------------------
@register(
    "q186_curation_pipeline",
    oracle=f"""
    WITH kept AS (
      SELECT md5(text) AS digest,
             MIN(doc_id) AS doc_id,
             arg_min(lang, doc_id) AS lang,
             arg_min(text, doc_id) AS text
      FROM documents
      WHERE n_chars BETWEEN 50 AND 400
      GROUP BY md5(text)
    ), split AS (
      SELECT lang, text,
             CASE WHEN {md5_int64_sql(
                 "CAST(doc_id AS VARCHAR) || '|split-v1'")} % 100 < 5
                    THEN 'test'
                  WHEN {md5_int64_sql(
                 "CAST(doc_id AS VARCHAR) || '|split-v1'")} % 100 < 10
                    THEN 'val'
                  ELSE 'train' END AS split
      FROM kept
    )
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(list_filter(string_split(text, ' '),
                                    w -> w != ''))) AS BIGINT) AS n_tokens
    FROM split GROUP BY split, lang
    """,
)
def q186(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.sampling import train_val_test_split

    docs = load(spark, sf_dir, "documents")
    kept = (
        docs.filter(F.col("n_chars").between(50, 400))
        .groupBy(F.md5("text").alias("digest"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.expr("min_by(lang, doc_id)").alias("lang"),
            F.expr("min_by(text, doc_id)").alias("text"),
        )
    )
    split = train_val_test_split(kept, val_pct=5, test_pct=5)
    return split.groupBy("split", "lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size(T.words("text"))).cast("bigint").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# q188 — source-overlap planning matrix: one MinHash signature per
# SOURCE (min over all word hashes any of its docs contain) and the
# pairwise matching-component fraction — the unbiased vocabulary-
# Jaccard estimate between sub-corpora, run before merging crawls to
# decide where cross-source dedup pays off. Corpus-scale work is one
# explode + one k-min groupBy over a handful of groups; the pairwise
# stage is #sources^2 rows.
# --------------------------------------------------------------------------
@register(
    "q188_source_overlap",
    oracle=f"""
    WITH w AS (
      SELECT source AS g, unnest({SQL_WORDSET}) AS word FROM documents
    ), h AS (
      SELECT g, {_sql_word_hash()} AS hw FROM w
    ), sigs AS (
      SELECT g,
           {_mh_cols}
      FROM h GROUP BY g
    )
    SELECT a.g AS source_a, b.g AS source_b,
           CAST({" + ".join(
               f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END"
               for i in range(D.N_MINHASH))} AS BIGINT) AS n_match,
           round(({" + ".join(
               f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END"
               for i in range(D.N_MINHASH))}) / {float(D.N_MINHASH)}, 6)
             AS est_jaccard
    FROM sigs a JOIN sigs b ON a.g < b.g
    """,
)
def q188(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.source_minhash_overlap(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q189 — split drift check: chi-square statistic of (split x lang)
# independence over the q173 assignment — the QA gate that catches a
# bad split hash skewing language balance between train and val/test.
# Counts are exact integers; the statistic is a 15-cell fold.
# --------------------------------------------------------------------------
_SPLIT_CASE = f"""CASE
      WHEN {md5_int64_sql("CAST(doc_id AS VARCHAR) || '|split-v1'")} % 100
           < 5 THEN 'test'
      WHEN {md5_int64_sql("CAST(doc_id AS VARCHAR) || '|split-v1'")} % 100
           < 10 THEN 'val'
      ELSE 'train' END"""


@register(
    "q189_split_drift",
    oracle=f"""
    WITH assigned AS (
      SELECT lang, {_SPLIT_CASE} AS split FROM documents
    ), cells AS (
      SELECT split, lang, CAST(COUNT(*) AS DOUBLE) AS n
      FROM assigned GROUP BY split, lang
    ), margins AS (
      SELECT c.split, c.lang, c.n,
             s.ns * l.nl / t.nt AS expected
      FROM cells c
      JOIN (SELECT split, SUM(n) AS ns FROM cells GROUP BY split) s
        ON c.split = s.split
      JOIN (SELECT lang, SUM(n) AS nl FROM cells GROUP BY lang) l
        ON c.lang = l.lang
      CROSS JOIN (SELECT SUM(n) AS nt FROM cells) t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST((COUNT(DISTINCT split) - 1)
                * (COUNT(DISTINCT lang) - 1) AS BIGINT) AS dof,
           round(SUM((n - expected) * (n - expected) / expected), 6)
             AS chi2
    FROM margins
    """,
)
def q189(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.sampling import train_val_test_split

    docs = load(spark, sf_dir, "documents")
    cells = (
        train_val_test_split(docs, val_pct=5, test_pct=5)
        .groupBy("split", "lang")
        .agg(F.count("*").cast("double").alias("n"))
    )
    ns = cells.groupBy("split").agg(F.sum("n").alias("ns"))
    nl = cells.groupBy("lang").agg(F.sum("n").alias("nl"))
    nt = cells.agg(F.sum("n").alias("nt"))
    m = (
        cells.join(F.broadcast(ns), "split")
        .join(F.broadcast(nl), "lang")
        .crossJoin(F.broadcast(nt))
        .withColumn("expected", F.col("ns") * F.col("nl") / F.col("nt"))
    )
    return m.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        ((F.countDistinct("split") - 1)
         * (F.countDistinct("lang") - 1)).cast("bigint").alias("dof"),
        F.round(
            F.sum((F.col("n") - F.col("expected"))
                  * (F.col("n") - F.col("expected")) / F.col("expected")),
            6).alias("chi2"),
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
    ws = docs.select(T.words("text").alias("w"))
    uni = ws.select(F.explode("w").alias("x"))
    ucnt = uni.groupBy("x").agg(F.count("*").alias("cx"))
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
# q192 — cross-source quantile normalization: map each source's length
# distribution onto the GLOBAL distribution by rank (value := the
# global order statistic at the same percentile) — the distribution-
# matching step used when per-source quality scores aren't comparable
# (different crawlers, different scales). Scale shape: the global
# order statistic comes from a HISTOGRAM CDF — groupBy(n_chars) to a
# value-domain-sized table (~500 rows however large the corpus), one
# cumulative window over THAT table, broadcast range-join back. The
# per-source ranks are partitioned windows. Integer rank arithmetic
# throughout; target rank = round(p * (N-1)) + 1.
# --------------------------------------------------------------------------
@register(
    "q192_quantile_normalize",
    oracle="""
    WITH src AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars ASC, doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS ns
      FROM documents
    ), hist AS (
      SELECT n_chars AS v, COUNT(*) AS c FROM documents GROUP BY n_chars
    ), cdf AS (
      SELECT v, SUM(c) OVER (ORDER BY v ASC
                             ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER (ORDER BY v ASC
                          ROWS UNBOUNDED PRECEDING) - c AS cum_before
      FROM hist
    ), n AS (
      SELECT COUNT(*) AS nt FROM documents
    ), mapped AS (
      SELECT s.doc_id, s.source, s.n_chars,
             CAST(round((s.rn - 1.0) / (s.ns - 1.0) * (n.nt - 1)) + 1
                  AS BIGINT) AS target
      FROM src s CROSS JOIN n
      WHERE s.ns > 1
    )
    SELECT m.doc_id, m.source,
           CAST(m.n_chars AS BIGINT) AS n_chars,
           CAST(g.v AS BIGINT) AS normalized
    FROM mapped m JOIN cdf g
      ON m.target > g.cum_before AND m.target <= g.cum
    """,
)
def q192(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    ws = Window.partitionBy("source").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc())
    src = docs.select(
        "doc_id", "source", "n_chars",
        F.row_number().over(ws).alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("ns"),
    )
    hist = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count("*").alias("c"))
    wc = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cdf = hist.select(
        "v", F.sum("c").over(wc).alias("cum"),
        (F.sum("c").over(wc) - F.col("c")).alias("cum_before"))
    nt = docs.agg(F.count("*").alias("nt"))
    mapped = (
        src.filter(F.col("ns") > 1)
        .crossJoin(F.broadcast(nt))
        .withColumn(
            "target",
            (F.round((F.col("rn") - 1.0) / (F.col("ns") - 1.0)
                     * (F.col("nt") - 1)) + 1).cast("bigint"),
        )
    )
    return mapped.join(
        F.broadcast(cdf),
        (mapped.target > cdf.cum_before) & (mapped.target <= cdf.cum),
    ).select(
        "doc_id", "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("v").cast("bigint").alias("normalized"),
    )


# --------------------------------------------------------------------------
# q193 — dataset-card summary: the per-source documentation table every
# corpus release ships (docs, exact dup rate, exact median and p90
# length, language count). Medians come from the per-source value-
# domain histogram CDF (partitioned windows over ~500-row groups, the
# q192 pattern — no per-source sort of raw rows); dup counts are one
# digest aggregation. Everything exact and integer-derived except the
# rounded dup_rate.
# --------------------------------------------------------------------------
@register(
    "q193_dataset_card",
    oracle="""
    WITH base AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      FROM documents GROUP BY source
    ), hist AS (
      SELECT source, n_chars AS v, COUNT(*) AS c
      FROM documents GROUP BY source, n_chars
    ), cdf AS (
      SELECT source, v,
             SUM(c) OVER w AS cum, SUM(c) OVER w - c AS cum_before
      FROM hist
      WINDOW w AS (PARTITION BY source ORDER BY v ASC
                   ROWS UNBOUNDED PRECEDING)
    ), med AS (
      SELECT b.source, g.v AS median_len
      FROM base b JOIN cdf g ON b.source = g.source
        AND CAST(ceil(b.n_docs / 2.0) AS BIGINT) > g.cum_before
        AND CAST(ceil(b.n_docs / 2.0) AS BIGINT) <= g.cum
    ), p90 AS (
      SELECT b.source, g.v AS p90_len
      FROM base b JOIN cdf g ON b.source = g.source
        AND CAST(ceil(b.n_docs * 0.9) AS BIGINT) > g.cum_before
        AND CAST(ceil(b.n_docs * 0.9) AS BIGINT) <= g.cum
    )
    SELECT b.source, b.n_docs, b.n_unique,
           round(1.0 - b.n_unique / b.n_docs, 6) AS dup_rate,
           CAST(med.median_len AS BIGINT) AS median_len,
           CAST(p90.p90_len AS BIGINT) AS p90_len,
           b.n_langs
    FROM base b
    JOIN med ON b.source = med.source
    JOIN p90 ON b.source = p90.source
    """,
)
def q193(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    base = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct(F.md5("text")).cast("bigint").alias("n_unique"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )
    hist = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").alias("c"))
    wc = Window.partitionBy("source").orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cdf = hist.select(
        "source", "v",
        F.sum("c").over(wc).alias("cum"),
        (F.sum("c").over(wc) - F.col("c")).alias("cum_before"),
    )

    def rank_value(target, alias):
        t = target.cast("bigint")
        j = base.select("source", t.alias("_t")).join(
            cdf, "source").filter(
            (F.col("_t") > F.col("cum_before")) & (F.col("_t") <= F.col("cum"))
        )
        return j.select("source", F.col("v").cast("bigint").alias(alias))

    med = rank_value(F.ceil(F.col("n_docs") / 2.0), "median_len")
    p90 = rank_value(F.ceil(F.col("n_docs") * 0.9), "p90_len")
    return (
        base.join(med, "source").join(p90, "source")
        .select(
            "source", "n_docs", "n_unique",
            F.round(1.0 - F.col("n_unique") / F.col("n_docs"), 6)
            .alias("dup_rate"),
            "median_len", "p90_len", "n_langs",
        )
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
    ).agg(F.count("*").alias("n"))
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
        "doc_id", "lang", F.explode(T.words("text")).alias("word"))
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
# q209 — positive-pair mining for contrastive training: each document's
# single best in-source near-duplicate (max Jaccard, lowest partner id
# on ties) from the q27 blocked pair set — the anchor->positive side of
# the pair story whose negatives q178 mines. The pair set is symmetric,
# so both directions union before the per-doc argmax; everything after
# candidate generation is one groupBy.
# --------------------------------------------------------------------------
@register("q209_positive_pairs")
def q209(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.5,
                                  block_cols=("source",))
    sym = pairs.select(
        F.col("doc_id_a").alias("doc_id"),
        F.col("doc_id_b").alias("partner"), "jaccard",
    ).unionByName(pairs.select(
        F.col("doc_id_b").alias("doc_id"),
        F.col("doc_id_a").alias("partner"), "jaccard",
    ))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("jaccard").desc(), F.col("partner").asc())
    return (
        sym.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "partner", "jaccard")
    )


from . import ORACLES as _ORC  # noqa: E402

_ORC["q209_positive_pairs"] = f"""
    WITH pairs AS (
      {_ORC["q27_jaccard_pairs"]}
    ), sym AS (
      SELECT doc_id_a AS doc_id, doc_id_b AS partner, jaccard FROM pairs
      UNION ALL
      SELECT doc_id_b AS doc_id, doc_id_a AS partner, jaccard FROM pairs
    )
    SELECT doc_id, partner, jaccard FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY jaccard DESC, partner ASC) AS rk
      FROM sym
    ) WHERE rk = 1
"""


# --------------------------------------------------------------------------
# q215 — temperature-scaled mixture weights: per-source sampling
# probability proportional to count^tau (tau = 0.7), the multilingual /
# multi-domain rebalancing rule (mBERT/XLM-R style) that upsamples
# small sources without letting a head domain dominate. One dimension-
# sized aggregation + a broadcast scalar total; the corpus shuffles
# once on source. expected_epochs = weight * N / count shows how many
# passes a source would see under the schedule.
# --------------------------------------------------------------------------
@register(
    "q215_temperature_mixture",
    oracle="""
    WITH c AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), tot AS (
      SELECT SUM(pow(n_docs, 0.7)) AS z, SUM(n_docs) AS n FROM c
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           round(pow(n_docs, 0.7) / z, 6) AS weight,
           round(pow(n_docs, 0.7) / z * n / n_docs, 6) AS expected_epochs
    FROM c CROSS JOIN tot
    """,
)
def q215(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "documents").groupBy("source").agg(
        F.count("*").alias("n_docs"))
    tot = c.agg(
        F.sum(F.pow("n_docs", F.lit(0.7))).alias("z"),
        F.sum("n_docs").alias("n"),
    )
    w = F.pow("n_docs", F.lit(0.7)) / F.col("z")
    return c.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round(w, 6).alias("weight"),
        F.round(w * F.col("n") / F.col("n_docs"), 6)
        .alias("expected_epochs"),
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
# q217/q218 — snapshot-versioned table (sources/snapshots.py): manifest
# commits, time travel, incremental diff. The harness table commits
# v1 = even docs then appends v2 = odd docs; q217 reads BOTH versions
# via their manifests (time travel) and q218 reads only the files added
# in (v1, v2] (the O(delta) incremental-consumption path). Oracles
# replay from doc_id parity.
# --------------------------------------------------------------------------
def _snapshot_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.snapshots import snapshot_append

        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars")
        v1 = snapshot_append(docs.filter(F.col("doc_id") % 2 == 0), d)
        v2 = snapshot_append(docs.filter(F.col("doc_id") % 2 == 1), d)
        assert (v1, v2) == (1, 2), (v1, v2)

    return _derived_dir(sf_dir, "snaptab", build)


@register(
    "q217_snapshot_time_travel",
    oracle="""
    SELECT 1 AS version, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents WHERE doc_id % 2 = 0 GROUP BY lang
    UNION ALL
    SELECT 2 AS version, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def q217(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    d = _snapshot_table(spark, sf_dir)
    v1 = read_snapshot(spark, d, 1).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    ).select(F.lit(1).alias("version"), "lang", "n_docs")
    v2 = read_snapshot(spark, d, 2).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    ).select(F.lit(2).alias("version"), "lang", "n_docs")
    return v1.unionAll(v2)


# --------------------------------------------------------------------------
# q233 — snapshot DELETE + sequence semantics (sources/snapshots.py):
# merge-on-read equality deletes with Iceberg sequence numbers. The
# harness table appends even docs (v1) + odd docs (v2), commits a
# delete of doc_id % 10 IN (3, 4) (v3), then RE-APPENDS the % 10 = 3
# docs (v4). Reading v2/v3/v4 proves: pre-delete time travel intact,
# the delete suppresses only older-sequence files, and re-inserted
# keys are visible again. Scale shape: the delete-key set broadcasts
# into one LEFT ANTI join; the table side never reshuffles.
# --------------------------------------------------------------------------
def _deleted_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.snapshots import snapshot_append, snapshot_delete

        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars")
        snapshot_append(docs.filter(F.col("doc_id") % 2 == 0), d)
        snapshot_append(docs.filter(F.col("doc_id") % 2 == 1), d)
        v3 = snapshot_delete(
            docs.filter((F.col("doc_id") % 10).isin(3, 4))
                .select("doc_id"), d, ["doc_id"])
        v4 = snapshot_append(docs.filter(F.col("doc_id") % 10 == 3), d)
        assert (v3, v4) == (3, 4), (v3, v4)

    return _derived_dir(sf_dir, "snapdelete", build)


@register(
    "q233_snapshot_delete",
    oracle="""
    SELECT 2 AS version, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents
    UNION ALL
    SELECT 3, CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT)
    FROM documents WHERE doc_id % 10 NOT IN (3, 4)
    UNION ALL
    SELECT 4, CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT)
    FROM (
      SELECT doc_id FROM documents WHERE doc_id % 10 NOT IN (3, 4)
      UNION ALL
      SELECT doc_id FROM documents WHERE doc_id % 10 = 3
    )
    """,
)
def q233(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    d = _deleted_table(spark, sf_dir)
    out = None
    for v in (2, 3, 4):
        part = read_snapshot(spark, d, v).agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        ).select(F.lit(v).alias("version"), "n_docs", "id_sum")
        out = part if out is None else out.unionAll(part)
    return out


# --------------------------------------------------------------------------
# q238 — manifest zone-map DATA SKIPPING (sources/snapshots.py): each
# append records per-file doc_id min/max from the parquet footers; a
# ranged read prunes provably-empty files BEFORE any bytes are read and
# applies the residual row filter. The harness table is four
# range-disjoint files; the [120, 180] scan must open exactly one. The
# skip counts ride in the result as value-checked constants — the q200
# n_files==1 move applied to the lakehouse layer.
# --------------------------------------------------------------------------
def _zonemap_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.snapshots import snapshot_append

        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        for lo in (0, 100, 200, 300):
            cond = (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 100)                 if lo < 300 else (F.col("doc_id") >= lo)
            snapshot_append(docs.filter(cond).coalesce(1), d,
                            stats_cols=["doc_id"])

    return _derived_dir(sf_dir, "snapzonemap", build)


@register(
    "q238_snapshot_skipping",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(4 AS INT) AS n_files_total,
           CAST(1 AS INT) AS n_files_scanned
    FROM documents WHERE doc_id BETWEEN 120 AND 180
    """,
)
def q238(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import (
        latest_version, prune_files, read_manifest, read_snapshot,
    )

    d = _zonemap_table(spark, sf_dir)
    m = read_manifest(d, latest_version(d))
    scanned = len(prune_files(m, "doc_id", 120, 180))
    return read_snapshot(
        spark, d, between=("doc_id", 120, 180)
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.lit(len(m["files"])).cast("int").alias("n_files_total"),
        F.lit(scanned).cast("int").alias("n_files_scanned"),
    )


# --------------------------------------------------------------------------
# q363 — PARTITION-SPEC EVOLUTION (Iceberg spec-v2 behavior): v1 of the
# table is written partitioned by truncate[100] on doc_id (spec 1,
# 2 files: [0,100) and [100,200)); v2 appends docs [200,400) under a
# FINER spec, truncate[50] (spec 2, 4 files) — no rewrite of v1's
# layout. prune_files applies EACH FILE'S OWN spec, so a [120, 260]
# scan at HEAD opens exactly 1 spec-1 file + 2 spec-2 files (3 of 6),
# and time-traveling to v1 opens 1 of 2 under the old spec alone. The
# scanned-file counts ride in the result as value-checked constants
# (the q238 move) and the row aggregates prove pruning never dropped a
# live row: over-pruning breaks n_docs/id_sum, under-pruning breaks
# n_files_scanned.
# --------------------------------------------------------------------------
def _spec_evolution_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.snapshots import snapshot_append

        docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
        snapshot_append(
            docs.filter(F.col("doc_id") < 200), d,
            partition_spec={"col": "doc_id", "transform": "truncate",
                            "param": 100})
        snapshot_append(
            docs.filter((F.col("doc_id") >= 200)
                        & (F.col("doc_id") < 400)), d,
            partition_spec={"col": "doc_id", "transform": "truncate",
                            "param": 50})

    return _derived_dir(sf_dir, "snapspecevo", build)


@register(
    "q363_spec_evolution",
    oracle="""
    SELECT 2 AS snapshot_version,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(6 AS INT) AS n_files_total,
           CAST(3 AS INT) AS n_files_scanned
    FROM documents WHERE doc_id BETWEEN 120 AND 260
    UNION ALL
    SELECT 1, CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT),
           CAST(2 AS INT), CAST(1 AS INT)
    FROM documents WHERE doc_id BETWEEN 120 AND 199
    ORDER BY snapshot_version DESC
    """,
)
def q363(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import (
        prune_files, read_manifest, read_snapshot,
    )

    d = _spec_evolution_table(spark, sf_dir)
    out = None
    for v in (2, 1):
        m = read_manifest(d, v)
        scanned = len(prune_files(m, "doc_id", 120, 260))
        agg = read_snapshot(
            spark, d, version=v, between=("doc_id", 120, 260)
        ).agg(
            F.lit(v).cast("int").alias("snapshot_version"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
            F.lit(len(m["files"])).cast("int").alias("n_files_total"),
            F.lit(scanned).cast("int").alias("n_files_scanned"),
        ).select("snapshot_version", "n_docs", "id_sum",
                 "n_files_total", "n_files_scanned")
        out = agg if out is None else out.unionByName(agg)
    return out


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
# q377 — DATA-URI IMAGE EXTRACTION: the inline-image path of an HTML
# corpus (img src="data:image/png;base64,..."): the base64 payload is
# pulled out with regexp_extract and decoded with the BUILT-IN
# unbase64 — both JVM-side — and only the final PNG pixel probe runs
# in a kernel. Pixels are md5(text) digest bytes, so the oracle
# replays them from md5 hex (the q40/q153 construction) — an
# end-to-end chain of builtin-extract -> builtin-decode -> real codec.
# --------------------------------------------------------------------------
@register(
    "q377_data_uri_images",
    oracle="""
    SELECT doc_id, CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
           ('0x' || substr(md5(text), 1, 2))::INT AS p00,
           ('0x' || substr(md5(text), 11, 2))::INT AS p11,
           ('0x' || substr(md5(text), 31, 2))::INT AS p33
    FROM documents
    """,
)
def q377(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import decode_pixel_probe, png_payload

    pngs = _media_payloads(spark, sf_dir, png_payload)
    html = pngs.select(
        "doc_id",
        F.concat(F.lit('<p>x</p><img src="data:image/png;base64,'),
                 F.base64(F.col("payload")),
                 F.lit('" alt="y">')).alias("html"))
    # Spark's base64() emits MIME-chunked output (CRLF every 76 chars,
    # like data URIs found in real HTML often are) — the extract class
    # must admit the line breaks, then strip them before unbase64
    b64 = F.regexp_extract(
        F.col("html"),
        'data:image/png;base64,([A-Za-z0-9+/=\r\n]+)', 1)
    payloads = html.select(
        "doc_id",
        F.unbase64(F.regexp_replace(b64, "[\r\n]", "")).alias("payload"))
    return decode_pixel_probe(payloads, [(0, 0), (1, 1), (3, 3)])


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
# q375 — EXIF METADATA AUDIT (EXIF 2.3 APP1 TIFF-IFD): each doc's JPEG
# carries a deterministic EXIF block (orientation cycling 1..8, camera
# make keyed by source, ISO, capture time; alternating II/MM byte
# orders), the kernel walks the real marker stream + IFD chain WITHOUT
# decoding pixels — the metadata pass an image-corpus audit runs over
# billions of files before any training decision (orientation fixes,
# camera dedup). Oracle replays the construction analytically.
# --------------------------------------------------------------------------
EXIF_SCHEMA = ("doc_id long, orientation int, make string, iso int, "
               "byte_order string")


@register(
    "q375_exif_audit",
    oracle="""
    SELECT doc_id,
           CAST(doc_id % 8 + 1 AS INT) AS orientation,
           'Cam-' || source AS make,
           CAST(100 * (doc_id % 4 + 1) AS INT) AS iso,
           CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order
    FROM documents
    """,
)
def q375(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions
    from ..sources.exif import (
        TAG_ISO, TAG_MAKE, TAG_ORIENTATION, build_exif, insert_exif,
        parse_exif,
    )
    from ..functions.multimodal import jpeg_payload

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text",
                                                "source"))

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "orientation", "make",
                                   "iso", "byte_order")}
            for doc_id, t, src in zip(pdf["doc_id"], pdf["text"],
                                      pdf["source"]):
                bo = "II" if doc_id % 2 == 0 else "MM"
                jpeg = insert_exif(
                    jpeg_payload(t),
                    build_exif(make=f"Cam-{src}",
                               orientation=int(doc_id % 8 + 1),
                               iso=int(100 * (doc_id % 4 + 1)),
                               byte_order=bo))
                tags = parse_exif(jpeg)
                out["doc_id"].append(doc_id)
                out["orientation"].append(int(tags[TAG_ORIENTATION]))
                out["make"].append(tags[TAG_MAKE])
                out["iso"].append(int(tags[TAG_ISO]))
                # APP1 layout: SOI(2) FFE1(2) len(2) 'Exif\0\0'(6) TIFF
                out["byte_order"].append(jpeg[12:14].decode("ascii"))
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, EXIF_SCHEMA)


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
# q384 — EXIF ORIENTATION NORMALIZATION + GPS EXTRACTION: tag 274 is
# the #1 cause of silently-rotated training images (pixels stored as
# the sensor saw them, the tag says how to display them), and the GPS
# IFD (RATIONAL dms triplets + hemisphere refs) is what geo-dedup
# joins on. Each doc gets a JPEG carrying a full EXIF block
# (orientation (doc_id % 8) + 1, GPS IFD) plus a LOSSLESS PNG payload
# of analytically-known pixels; the kernel parses the EXIF, decodes
# the PNG, applies the orientation transform and reports display dims
# + both display corners + signed decimal GPS — every value replayed
# in closed form by the oracle, so a wrong rot90 direction or a
# swapped dms term cannot hide. Closes VERDICT r5 brief item #6.
# --------------------------------------------------------------------------
EXIF_ORIENT_SCHEMA = ("doc_id long, orientation int, out_h int, "
                      "out_w int, c00 int, c_end int, "
                      "lat double, lon double")
_XH, _XW = 24, 16  # stored dims; distinct so transposes are visible


@register(
    "q384_exif_orientation",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, CAST(doc_id % 8 + 1 AS INT) AS o FROM documents
    )
    SELECT doc_id, o AS orientation,
           CAST(CASE WHEN o <= 4 THEN {_XH} ELSE {_XW} END AS INT)
             AS out_h,
           CAST(CASE WHEN o <= 4 THEN {_XW} ELSE {_XH} END AS INT)
             AS out_w,
           CAST(CASE o
             WHEN 1 THEN (doc_id) % 251
             WHEN 2 THEN (7 * ({_XW} - 1) + doc_id) % 251
             WHEN 3 THEN (31 * ({_XH} - 1) + 7 * ({_XW} - 1) + doc_id)
                         % 251
             WHEN 4 THEN (31 * ({_XH} - 1) + doc_id) % 251
             WHEN 5 THEN (doc_id) % 251
             WHEN 6 THEN (31 * ({_XH} - 1) + doc_id) % 251
             WHEN 7 THEN (31 * ({_XH} - 1) + 7 * ({_XW} - 1) + doc_id)
                         % 251
             WHEN 8 THEN (7 * ({_XW} - 1) + doc_id) % 251
           END AS INT) AS c00,
           CAST(CASE o
             WHEN 1 THEN (31 * ({_XH} - 1) + 7 * ({_XW} - 1) + doc_id)
                         % 251
             WHEN 2 THEN (31 * ({_XH} - 1) + doc_id) % 251
             WHEN 3 THEN (doc_id) % 251
             WHEN 4 THEN (7 * ({_XW} - 1) + doc_id) % 251
             WHEN 5 THEN (31 * ({_XH} - 1) + 7 * ({_XW} - 1) + doc_id)
                         % 251
             WHEN 6 THEN (7 * ({_XW} - 1) + doc_id) % 251
             WHEN 7 THEN (doc_id) % 251
             WHEN 8 THEN (31 * ({_XH} - 1) + doc_id) % 251
           END AS INT) AS c_end,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE -1.0 END
             * (doc_id % 90 + 0.5) AS DOUBLE) AS lat,
           CAST(CASE WHEN doc_id % 3 = 0 THEN -1.0 ELSE 1.0 END
             * (doc_id % 180 + 0.25) AS DOUBLE) AS lon
    FROM base
    """,
)
def q384(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id"))

    def kernel(batches):
        import numpy as np
        import pandas as pd

        from ..sources.exif import (
            TAG_ORIENTATION, apply_orientation, build_exif, gps_decimal,
            insert_exif, parse_exif,
        )
        from ..sources.jpeg import encode_jpeg
        from ..sources.png import decode_png, encode_png

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "orientation", "out_h",
                                   "out_w", "c00", "c_end",
                                   "lat", "lon")}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                o = i % 8 + 1
                # the camera file: JPEG carrying the EXIF block
                lat_d, lon_d = i % 90, i % 180
                exif = build_exif(
                    make="StressCam", orientation=o,
                    gps=("N" if i % 2 == 0 else "S",
                         ((lat_d, 1), (30, 1), (0, 1)),
                         "W" if i % 3 == 0 else "E",
                         ((lon_d, 1), (15, 1), (0, 1))))
                carrier = insert_exif(
                    encode_jpeg(np.zeros((8, 8), np.uint8)), exif)
                # the lossless pixel payload (sidecar PNG)
                rr = np.arange(_XH, dtype=np.int64)[:, None]
                cc = np.arange(_XW, dtype=np.int64)[None, :]
                img = ((31 * rr + 7 * cc + i) % 251).astype(np.uint8)
                payload = encode_png(img)

                tags = parse_exif(carrier)
                norm = apply_orientation(decode_png(payload),
                                         int(tags[TAG_ORIENTATION]))
                la, lo = gps_decimal(tags)
                out["doc_id"].append(i)
                out["orientation"].append(int(tags[TAG_ORIENTATION]))
                out["out_h"].append(norm.shape[0])
                out["out_w"].append(norm.shape[1])
                out["c00"].append(int(norm[0, 0]))
                out["c_end"].append(int(norm[-1, -1]))
                out["lat"].append(la)
                out["lon"].append(lo)
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, EXIF_ORIENT_SCHEMA)


# --------------------------------------------------------------------------
# q385 — NTv2 DATUM-SHIFT GRIDS (.gsb): grid-based datum
# transformation (NAD27->NAD83-style), the last named residual in the
# CRS matrix (README: "NTv2 raises NotImplementedError"). A two-level
# grid file (1-degree parent, 0.5-degree child refining its interior
# — children shadow parents, the NTv2 rule) is written by our own
# spec-valid writer, parsed back, and applied to per-order points with
# bilinear interpolation. Node values are DYADIC rationals of the
# coordinates, so float32 storage, f64 interpolation, and the oracle's
# closed-form replay are all bit-exact — a wrong row order, sign quirk
# (NTv2 longitudes are positive WEST) or swapped subgrid cannot hide.
# --------------------------------------------------------------------------
NTV2_SCHEMA = ("o_orderkey long, lat double, lon double, "
               "subgrid string, lat_out double, lon_out double")


def _ntv2_fixture_gsb() -> bytes:
    import numpy as np

    from ..sources.ntv2 import write_gsb

    def mk(s_lat, n_lat, e_w, w_w, inc):
        lats = np.arange(s_lat, n_lat + 1e-9, inc)
        lonw = np.arange(e_w, w_w + 1e-9, inc)
        lg, wg = np.meshgrid(lats, lonw, indexing="ij")
        return dict(
            s_lat=s_lat * 3600, n_lat=n_lat * 3600,
            e_long=e_w * 3600, w_long=w_w * 3600,
            lat_inc=inc * 3600, long_inc=inc * 3600,
            lat_shift=1.0 + lg / 512 + wg / 1024,
            lon_shift=0.5 + lg / 1024 - wg / 2048,
        )
    parent = mk(20, 50, 60, 130, 1.0)
    parent.update(name="PARENT0", parent="NONE")
    child = mk(30, 40, 80, 100, 0.5)
    child.update(name="CHILD0", parent="PARENT0")
    return write_gsb([parent, child])


@register(
    "q385_ntv2_datum_shift",
    oracle="""
    WITH pts AS (
      SELECT o_orderkey,
             CAST(22.25 + (o_orderkey % 108) * 0.25 AS DOUBLE) AS lat,
             CAST(-(62.25 + (o_orderkey % 256) * 0.25) AS DOUBLE) AS lon
      FROM orders
    )
    SELECT o_orderkey, lat, lon,
           CASE WHEN lat BETWEEN 30 AND 40 AND -lon BETWEEN 80 AND 100
                THEN 'CHILD0' ELSE 'PARENT0' END AS subgrid,
           lat + (1.0 + lat / 512 + (-lon) / 1024) / 3600.0 AS lat_out,
           lon - (0.5 + lat / 1024 - (-lon) / 2048) / 3600.0 AS lon_out
    FROM pts
    """,
)
def q385(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    gsb = _ntv2_fixture_gsb()  # reference metadata: rides in closure
    pts = ensure_min_partitions(
        load(spark, sf_dir, "orders").select(
            "o_orderkey",
            (22.25 + (F.col("o_orderkey") % 108) * 0.25)
            .cast("double").alias("lat"),
            (-(62.25 + (F.col("o_orderkey") % 256) * 0.25))
            .cast("double").alias("lon")))

    def kernel(batches):
        import pandas as pd

        from ..sources.ntv2 import apply_shift, parse_gsb

        grids = parse_gsb(gsb)
        for pdf in batches:
            la, lo, nm = apply_shift(grids, pdf["lat"].to_numpy(),
                                     pdf["lon"].to_numpy())
            yield pd.DataFrame({
                "o_orderkey": pdf["o_orderkey"],
                "lat": pdf["lat"], "lon": pdf["lon"],
                "subgrid": [str(x) for x in nm],
                "lat_out": la, "lon_out": lo,
            })

    return pts.mapInPandas(kernel, NTV2_SCHEMA)


# --------------------------------------------------------------------------
# q386 — MP3 CONTAINER AUDIT (ISO 11172-3 frame headers + ID3 tags):
# duration/bitrate-layout/tag metadata WITHOUT audio decode — the
# raster_meta discipline applied to the audio modality (compressed
# decode stays honestly gated; PCM/FLAC decode live in wav.py/flac.py).
# Even docs are VBR (frame k cycles all 14 bitrate indices, alternating
# padding), odd docs CBR; the kernel walks every frame header with the
# real bitrate/samplerate tables and the oracle replays counts, exact
# sample totals, duration and layout analytically.
# --------------------------------------------------------------------------
MP3_SCHEMA = ("doc_id long, n_frames int, samples long, "
              "duration_ms double, samplerate int, layout string, "
              "max_kbps int, title string, has_v1 boolean")

_MP3_KBPS_CASE = "CASE doc_id % 14 " + " ".join(
    f"WHEN {i - 1} THEN {k}" for i, k in enumerate(
        (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
         320), start=1)) + " END"


@register(
    "q386_mp3_audit",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, CAST(40 + doc_id % 20 AS INT) AS nf,
             CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                  ELSE 32000 END AS INT) AS sr
      FROM documents
    )
    SELECT doc_id, nf AS n_frames,
           CAST(nf AS BIGINT) * 1152 AS samples,
           CAST(nf AS BIGINT) * 1152 * 1000.0 / sr AS duration_ms,
           sr AS samplerate,
           CASE WHEN doc_id % 2 = 0 THEN 'vbr' ELSE 'cbr' END AS layout,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 320
                ELSE {_MP3_KBPS_CASE} END AS INT) AS max_kbps,
           'Track ' || CAST(doc_id AS VARCHAR) AS title,
           doc_id % 3 = 0 AS has_v1
    FROM base
    """,
)
def q386(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id"))

    def kernel(batches):
        import pandas as pd

        from ..sources.mp3 import audit_mp3, write_id3v1, write_mp3

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_frames", "samples",
                                   "duration_ms", "samplerate",
                                   "layout", "max_kbps", "title",
                                   "has_v1")}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                nf = 40 + i % 20
                si = i % 3
                if i % 2 == 0:  # VBR: cycle every bitrate index
                    specs = [((k % 14) + 1, si, k % 2)
                             for k in range(nf)]
                else:           # CBR
                    specs = [((i % 14) + 1, si, 0)] * nf
                blob = write_mp3(
                    specs,
                    id3v2={"TIT2": f"Track {i}",
                           "TPE1": f"Artist {i % 7}"},
                    id3v1=(write_id3v1(title=f"Track {i}")
                           if i % 3 == 0 else None))
                a = audit_mp3(blob)
                out["doc_id"].append(i)
                out["n_frames"].append(a["n_frames"])
                out["samples"].append(a["samples"])
                out["duration_ms"].append(
                    a["samples"] * 1000.0 / a["samplerate"])
                out["samplerate"].append(a["samplerate"])
                out["layout"].append(a["layout"])
                out["max_kbps"].append(max(a["bitrates_kbps"]))
                out["title"].append(a["id3v2"].get("TIT2", ""))
                out["has_v1"].append(bool(a["id3v1"]))
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, MP3_SCHEMA)


# --------------------------------------------------------------------------
# q387 — GIF ANIMATION DECODE (GIF89a, pure-Python LZW): the third
# lossless image codec in the tree (PNG q220, TIFF family) and a web
# crawl staple. Each doc renders a 2-frame animation — full base frame
# + a smaller overlay frame with a TRANSPARENT index and a NETSCAPE
# loop extension — through the real encoder, then the kernel decodes:
# LZW (variable widths, CLEAR/EOI), graphic-control extensions, and
# region COMPOSITING onto the logical screen. Probes read the
# composited canvas where the overlay is opaque (p_over) and where its
# transparent index punches through to the base frame (p_under), plus
# an RGB palette lookup — all closed-form because GIF is lossless.
# --------------------------------------------------------------------------
GIF_SCHEMA = ("doc_id long, n_frames int, width int, height int, "
              "loop int, delay_cs int, p_under int, p_over int, "
              "rgb_r int")


@register(
    "q387_gif_frames",
    oracle="""
    SELECT doc_id, CAST(2 AS INT) AS n_frames,
           CAST(32 AS INT) AS width, CAST(24 AS INT) AS height,
           CAST(doc_id % 5 AS INT) AS loop,
           CAST(10 + doc_id % 50 AS INT) AS delay_cs,
           -- canvas[6,8]: overlay (0,0) = doc_id%16 == its transparent
           -- index, so the BASE frame shows through: (6*5 + 8 + id)%16
           CAST((38 + doc_id) % 16 AS INT) AS p_under,
           -- canvas[7,9]: overlay (1,1) = (1 + 3 + id)%16, never equal
           -- to the transparent index (offset 4 is not 0 mod 16)
           CAST((4 + doc_id) % 16 AS INT) AS p_over,
           CAST(((4 + doc_id) % 16) * 17 % 256 AS INT) AS rgb_r
    FROM documents
    """,
)
def q387(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id"))

    def kernel(batches):
        import numpy as np
        import pandas as pd

        from ..sources.gif import decode_gif, encode_gif, gif_to_rgb

        pal = np.array([[(i * 17) % 256, (i * 29) % 256,
                         (i * 53) % 256] for i in range(16)], np.uint8)
        rr24 = np.arange(24, dtype=np.int64)[:, None]
        cc32 = np.arange(32, dtype=np.int64)[None, :]
        rr12 = np.arange(12, dtype=np.int64)[:, None]
        cc16 = np.arange(16, dtype=np.int64)[None, :]

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_frames", "width",
                                   "height", "loop", "delay_cs",
                                   "p_under", "p_over", "rgb_r")}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                base = ((rr24 * 5 + cc32 + i) % 16).astype(np.uint8)
                over = ((rr12 + cc16 * 3 + i) % 16).astype(np.uint8)
                gif = encode_gif(
                    [{"pixels": base, "left": 0, "top": 0,
                      "delay_cs": 4},
                     {"pixels": over, "left": 8, "top": 6,
                      "delay_cs": 10 + i % 50,
                      "transparent": i % 16}],
                    pal, loop=i % 5,
                    interlace=(i % 2 == 0))
                d = decode_gif(gif)
                last = d["frames"][-1]
                rgb = gif_to_rgb(last)
                out["doc_id"].append(i)
                out["n_frames"].append(len(d["frames"]))
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["loop"].append(d["loop"])
                out["delay_cs"].append(last["delay_cs"])
                out["p_under"].append(int(last["canvas"][6, 8]))
                out["p_over"].append(int(last["canvas"][7, 9]))
                out["rgb_r"].append(int(rgb[7, 9, 0]))
            yield pd.DataFrame(out)

    return docs.mapInPandas(kernel, GIF_SCHEMA)


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
# q367 — DYNAMIC PARTITION OVERWRITE (Iceberg overwrite semantics):
# v1 writes docs <300 partitioned truncate[100] (3 files); v2
# recomputes ONLY the [100, 200) partition with shifted n_chars and
# swaps it in atomically — untouched partitions keep their v1 files
# (and seqs), time travel to v1 sees the original rows, and the change
# feed emits the replaced partition's old rows as deletes + the new
# rows as inserts. The per-version char sums and file counts are the
# value-checked proof that exactly one partition changed.
# --------------------------------------------------------------------------
def _overwrite_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.snapshots import (
            snapshot_append, snapshot_overwrite_partitions,
        )

        spec = {"col": "doc_id", "transform": "truncate", "param": 100}
        docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
        snapshot_append(docs.filter(F.col("doc_id") < 300), d,
                        partition_spec=spec)                        # v1
        rebuilt = docs.filter(
            (F.col("doc_id") >= 100) & (F.col("doc_id") < 200)
        ).withColumn("n_chars", F.col("n_chars") + 1000)
        snapshot_overwrite_partitions(rebuilt, d, spec)             # v2

    return _derived_dir(sf_dir, "snapoverwrite", build)


@register(
    "q367_partition_overwrite",
    oracle="""
    SELECT 2 AS version, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id BETWEEN 100 AND 199
                         THEN n_chars + 1000 ELSE n_chars END)
                AS BIGINT) AS chars_sum,
           CAST(3 AS INT) AS n_files
    FROM documents WHERE doc_id < 300
    UNION ALL
    SELECT 1, CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT),
           CAST(3 AS INT)
    FROM documents WHERE doc_id < 300
    ORDER BY version DESC
    """,
)
def q367(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_manifest, read_snapshot

    d = _overwrite_table(spark, sf_dir)
    out = None
    for v in (2, 1):
        m = read_manifest(d, v)
        agg = read_snapshot(spark, d, version=v).agg(
            F.lit(v).cast("int").alias("version"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars_sum"),
            F.lit(len(m["files"])).cast("int").alias("n_files"),
        ).select("version", "n_docs", "chars_sum", "n_files")
        out = agg if out is None else out.unionByName(agg)
    return out


# --------------------------------------------------------------------------
# q365 — snapshot TAGS (Iceberg named refs): v1 is tagged 'baseline',
# v2 appends more docs, v3 compacts, then a keep_last=1 vacuum runs.
# The tag PINS v1 through the vacuum — its manifest and files survive
# while the untagged v2 manifest is collected — so reading by ref
# returns exactly the tagged-version rows and the head keeps reading
# the full table. Manifest-on-disk count rides as a value-checked
# constant (2 = tagged v1 + head v3). This is the audit/training-input
# pin a production table needs: routine GC can never erase a named
# snapshot.
# --------------------------------------------------------------------------
def _tagged_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.snapshots import (
            snapshot_append, snapshot_compact, snapshot_tag,
            snapshot_vacuum,
        )

        docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
        snapshot_append(docs.filter(F.col("doc_id") < 200), d)      # v1
        snapshot_tag(d, "baseline")                                 # -> v1
        snapshot_append(docs.filter(
            (F.col("doc_id") >= 200) & (F.col("doc_id") < 400)), d)  # v2
        snapshot_compact(spark, d, target_files=1)                  # v3
        snapshot_vacuum(d, keep_last=1, min_age_seconds=0)

    return _derived_dir(sf_dir, "snaptags", build)


@register(
    "q365_snapshot_tags",
    oracle="""
    SELECT 'baseline' AS ref, 1 AS version,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(2 AS INT) AS n_manifests
    FROM documents WHERE doc_id < 200
    UNION ALL
    SELECT 'head', 3, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT), CAST(2 AS INT)
    FROM documents WHERE doc_id < 400
    ORDER BY ref
    """,
)
def q365(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    from ..sources.snapshots import latest_version, read_snapshot

    d = _tagged_table(spark, sf_dir)
    n_manifests = len([f for f in _os.listdir(_os.path.join(
        d, "_snapshots")) if f.endswith(".json")])
    out = None
    for ref, ver in (("baseline", 1), ("head", latest_version(d))):
        df = read_snapshot(spark, d, ref="baseline") if ref == "baseline" \
            else read_snapshot(spark, d)
        agg = df.agg(
            F.lit(ref).alias("ref"),
            F.lit(ver).cast("int").alias("version"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
            F.lit(n_manifests).cast("int").alias("n_manifests"),
        ).select("ref", "version", "n_docs", "id_sum", "n_manifests")
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("ref")


# --------------------------------------------------------------------------
# q240 — snapshot CHANGE DATA FEED (read_changes): the q233 table's
# commit history replayed as tagged row changes — v2's insert of the
# odd docs, v3's delete emitting the ACTUAL suppressed rows
# (pre-delete snapshot semi-joined with the broadcast keys), v4's
# re-insert. Compactions are silent. This is the O(delta) feed an
# incremental index/aggregate maintainer consumes instead of rescanning
# the table.
# --------------------------------------------------------------------------
@register(
    "q240_snapshot_cdf",
    oracle="""
    SELECT 2 AS commit_version, 'insert' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents WHERE doc_id % 2 = 1
    UNION ALL
    SELECT 3, 'delete', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT)
    FROM documents WHERE doc_id % 10 IN (3, 4)
    UNION ALL
    SELECT 4, 'insert', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT)
    FROM documents WHERE doc_id % 10 = 3
    """,
)
def q240(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_changes

    d = _deleted_table(spark, sf_dir)
    return read_changes(spark, d, 1, 4).groupBy(
        F.col("_commit_version").alias("commit_version"),
        F.col("_change_type").alias("change_type"),
    ).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
    )


# --------------------------------------------------------------------------
# q241 — TILE-STORE VERSIONING: the reference's incremental workflow
# (seed -> prune -> skip-existing, F5) executed against the snapshot
# table format. Run 1 commits the tiles intersecting footprint A as
# table v1 (the production broadcast-semi-join prune); run 2 prunes for
# A ∪ B, anti-joins against the v1 SNAPSHOT READ (target-exists on the
# manifest, no object-store listing), and commits only the new tiles as
# v2. The query emits (version, tile_id); the oracle replays the grid
# intersection closed-form. read_diff(v1, v2) = exactly run 2's output
# — the O(delta) consumer contract.
# --------------------------------------------------------------------------
_Q241_FP_A = (0.0, 0.0, 25.0, 15.0)
_Q241_FP_B = (-30.0, -20.0, 5.0, 5.0)


def _tilestore_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..grids import LatLngGrid
        from ..plans import raster_pipe as rp
        from ..sources.snapshots import read_snapshot, snapshot_append

        grid = LatLngGrid(10, 160)
        tiles = rp.seed_tiles(spark, grid)

        def pruned(fps):
            cat = rp.file_catalog(spark, [
                {"uri": f"memory://f{i}", "band": 1,
                 "left": lo, "bottom": b, "right": r, "top": t}
                for i, (lo, b, r, t) in enumerate(fps)
            ])
            return rp.prune_tiles(tiles, cat).select("tile_id")

        v1 = snapshot_append(pruned([_Q241_FP_A]), d)
        existing = read_snapshot(spark, d, v1)
        fresh = pruned([_Q241_FP_A, _Q241_FP_B]).join(
            existing, "tile_id", "left_anti")
        v2 = snapshot_append(fresh, d)
        assert (v1, v2) == (1, 2)

    return _derived_dir(sf_dir, "tilestore", build)


def _q241_intersects(fp) -> str:
    lo, b, r, t = fp
    return (f"(tile_left < {r} AND tile_right > {lo} "
            f"AND tile_bottom < {t} AND tile_top > {b})")


@register(
    "q241_tile_store_versions",
    oracle=f"""
    WITH g AS (
      SELECT
        CONCAT(
          lpad(CAST(abs(-80 + CAST(i // 36 AS INT) * 10 + 10) AS VARCHAR),
               2, '0'),
          CASE WHEN -80 + CAST(i // 36 AS INT) * 10 + 10 >= 0
               THEN 'N' ELSE 'S' END,
          '_',
          lpad(CAST(abs(-180 + CAST(i % 36 AS INT) * 10) AS VARCHAR),
               3, '0'),
          CASE WHEN -180 + CAST(i % 36 AS INT) * 10 >= 0
               THEN 'E' ELSE 'W' END
        ) AS tile_id,
        -180 + CAST(i % 36 AS INT) * 10 AS tile_left,
        -80 + CAST(i // 36 AS INT) * 10 AS tile_bottom,
        -180 + CAST(i % 36 AS INT) * 10 + 10 AS tile_right,
        -80 + CAST(i // 36 AS INT) * 10 + 10 AS tile_top
      FROM range(648) t(i)
    )
    SELECT 1 AS version, tile_id FROM g
    WHERE {_q241_intersects(_Q241_FP_A)}
    UNION ALL
    SELECT 2, tile_id FROM g
    WHERE {_q241_intersects(_Q241_FP_B)}
      AND NOT {_q241_intersects(_Q241_FP_A)}
    """,
)
def q241(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_diff, read_snapshot

    d = _tilestore_table(spark, sf_dir)
    v1 = read_snapshot(spark, d, 1).select(
        F.lit(1).alias("version"), "tile_id")
    delta = read_diff(spark, d, 1, 2).select(
        F.lit(2).alias("version"), "tile_id")
    return v1.unionAll(delta)


@register(
    "q218_snapshot_incremental",
    oracle="""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_new,
           CAST(SUM(n_chars) AS BIGINT) AS new_chars
    FROM documents WHERE doc_id % 2 = 1 GROUP BY source
    """,
)
def q218(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_diff

    d = _snapshot_table(spark, sf_dir)
    return read_diff(spark, d, 1, 2).groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_new"),
        F.sum("n_chars").cast("bigint").alias("new_chars"),
    )


# --------------------------------------------------------------------------
# q221 — deterministic epoch shuffle + shard assignment: the step that
# turns a curated corpus into training shards. Order is md5(seed ||
# doc_id) — reshuffling an epoch is just a new seed, reproducible on
# any cluster size; shard = hash % n (map-only, no global sort). The
# per-shard summary (count, first/last order key, id checksum) pins
# both the assignment AND the within-shard order deterministically.
# --------------------------------------------------------------------------
_EPOCH_SEED = "epoch-7"
_N_TRAIN_SHARDS = 8


@register(
    "q221_epoch_shuffle_shards",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             md5('{_EPOCH_SEED}|' || CAST(doc_id AS VARCHAR)) AS ok,
             CAST(('0x' || substr(md5('{_EPOCH_SEED}|shard|'
                   || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % {_N_TRAIN_SHARDS} AS shard
      FROM documents
    )
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(ok) AS first_key, MAX(ok) AS last_key,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM keyed GROUP BY shard
    """,
)
def q221(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ok = F.md5(F.concat(F.lit(f"{_EPOCH_SEED}|"),
                        F.col("doc_id").cast("string")))
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{_EPOCH_SEED}|shard|"),
                               F.col("doc_id").cast("string"))), 1, 8),
            16, 10,
        ).cast("bigint") % _N_TRAIN_SHARDS
    )
    return (
        docs.select("doc_id", ok.alias("ok"), shard.alias("shard"))
        .groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("ok").alias("first_key"),
            F.max("ok").alias("last_key"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
    )


# --------------------------------------------------------------------------
# q222 — padding-waste analytics for length-bucketed batching: tokens
# lost to padding when sequences are padded up to their 64-token bucket
# boundary (the pre-packing baseline q92's packer beats). Pure column
# math + one dimension-sized aggregation; the report is what decides
# bucket granularity for a training run.
# --------------------------------------------------------------------------
@register(
    "q222_padding_waste",
    oracle=f"""
    WITH lens AS (
      SELECT doc_id, len({SQL_WORDS}) AS n_tok FROM documents
    ), b AS (
      SELECT doc_id, n_tok,
             CAST(ceil(n_tok / 64.0) * 64 AS BIGINT) AS bucket
      FROM lens WHERE n_tok > 0
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS real_tokens,
           CAST(SUM(bucket - n_tok) AS BIGINT) AS padding_tokens,
           round(SUM(bucket - n_tok)
                 / CAST(SUM(bucket) AS DOUBLE), 6) AS waste_frac
    FROM b GROUP BY bucket
    """,
)
def q222(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(T.words("text"))
    b = docs.select(
        "doc_id", n_tok.alias("n_tok"),
        (F.ceil(n_tok / 64.0) * 64).cast("bigint").alias("bucket"),
    ).filter(F.col("n_tok") > 0)
    return b.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("real_tokens"),
        F.sum(F.col("bucket") - F.col("n_tok")).cast("bigint")
        .alias("padding_tokens"),
        F.round(
            F.sum(F.col("bucket") - F.col("n_tok"))
            / F.sum("bucket").cast("double"), 6,
        ).alias("waste_frac"),
    )


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
# q224 — snapshot COMPACTION: rewrite the table head into exactly 2
# files as a new version; prior versions keep time-traveling over the
# old files. The query reads the compacted head — identical rows to v2
# by contract — and reports the (designed, deterministic) file count
# from the manifest, proving maintenance ops preserve data.
# --------------------------------------------------------------------------
def _compacted_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.snapshots import snapshot_append, snapshot_compact

        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars")
        snapshot_append(docs.filter(F.col("doc_id") % 2 == 0), d)
        snapshot_append(docs.filter(F.col("doc_id") % 2 == 1), d)
        v = snapshot_compact(spark, d, target_files=2)
        assert v == 3, v

    return _derived_dir(sf_dir, "snapcompact", build)


@register(
    "q224_snapshot_compaction",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(2 AS BIGINT) AS n_files
    FROM documents GROUP BY lang
    """,
)
def q224(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_manifest, read_snapshot

    d = _compacted_table(spark, sf_dir)
    n_files = len(read_manifest(d, 3)["files"])
    return read_snapshot(spark, d, 3).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.lit(n_files).cast("bigint").alias("n_files"),
    )


# --------------------------------------------------------------------------
# q227 — cross-codec image NORMALIZATION pipeline: decode a baseline
# JFIF (sources/jpeg.py), 2x box-downsample, re-encode as PNG
# (sources/png.py), decode the PNG back — the standard "whatever came
# in, normalized PNG comes out" ingest step, with BOTH real codecs in
# one kernel. The JFIF is DC-only (exact decode) and the blocks are
# constant, so the downsampled pixels equal the md5 digest bytes and
# the oracle replays the whole chain arithmetically.
# --------------------------------------------------------------------------
@register(
    "q227_image_normalize",
    oracle=f"""
    SELECT doc_id,
           CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
           CAST({_md5_byte(0)} + {_md5_byte(1)} + {_md5_byte(2)}
                + {_md5_byte(3)} AS BIGINT) * 16 AS pixel_sum
    FROM documents
    """,
)
def q227(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator as _It

    import pandas as _pd

    from ..functions.multimodal import jpeg_payload
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id", "text"))

    def kernel(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        import numpy as np

        from gfw_pixetl_spark.sources.jpeg import decode_jpeg
        from gfw_pixetl_spark.sources.png import decode_png, encode_png

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height",
                                   "pixel_sum")}
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                img = decode_jpeg(jpeg_payload(t))[:, :, 0]
                # 2x box downsample (16x16 -> 8x8, exact integer means
                # because each 2x2 block is constant)
                small = img.reshape(8, 2, 8, 2).mean(axis=(1, 3))
                png = encode_png(small.astype(np.uint8), filter_type=2)
                back = decode_png(png)[:, :, 0]
                out["doc_id"].append(doc_id)
                out["height"].append(back.shape[0])
                out["width"].append(back.shape[1])
                out["pixel_sum"].append(int(back.astype("int64").sum()))
            yield _pd.DataFrame(out)

    return docs.mapInPandas(
        kernel, "doc_id long, width int, height int, pixel_sum long")


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
# q254 — snapshot MERGE INTO (sources/snapshots.py::snapshot_merge):
# the Delta/Iceberg upsert shape as ONE atomic commit — source keys
# become an equality delete and non-delete source rows become new data
# files, both at sequence parent+1, so the reader's strict
# delete.seq > data.seq rule applies the delete to every pre-merge
# file but never to the rows the same commit appends. The harness
# merge UPDATEs doc_id%10==1 (n_chars += 1000), INSERTs new keys
# (doc_id + 1,000,000 for %10==2, n_chars=77), and DELETEs %10==3 via
# the matched-delete condition. Reading v1 and v2 proves pre-merge
# time travel is intact and all three MERGE arms landed atomically.
# --------------------------------------------------------------------------
def _merged_table(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        from ..sources.snapshots import snapshot_append, snapshot_merge

        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        v1 = snapshot_append(docs, d)
        updates = docs.filter(F.col("doc_id") % 10 == 1).withColumn(
            "n_chars", F.col("n_chars") + 1000)
        inserts = docs.filter(F.col("doc_id") % 10 == 2).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "lang",
            F.lit(77).cast("long").alias("n_chars"))
        deletes = docs.filter(F.col("doc_id") % 10 == 3)
        source = updates.unionByName(inserts).unionByName(deletes)
        v2 = snapshot_merge(source, d, ["doc_id"],
                            delete_condition="doc_id % 10 = 3")
        assert (v1, v2) == (1, 2), (v1, v2)

    return _derived_dir(sf_dir, "snapmerge", build)


@register(
    "q254_snapshot_merge",
    oracle="""
    SELECT 1 AS version, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sum
    FROM documents GROUP BY lang
    UNION ALL
    SELECT 2, lang, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT), CAST(SUM(n_chars) AS BIGINT)
    FROM (
      SELECT doc_id, lang, n_chars FROM documents
      WHERE doc_id % 10 NOT IN (1, 3)
      UNION ALL
      SELECT doc_id, lang, n_chars + 1000 FROM documents
      WHERE doc_id % 10 = 1
      UNION ALL
      SELECT doc_id + 1000000, lang, 77 FROM documents
      WHERE doc_id % 10 = 2
    ) GROUP BY lang
    """,
)
def q254(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    d = _merged_table(spark, sf_dir)
    out = None
    for v in (1, 2):
        part = read_snapshot(spark, d, v).groupBy("lang").agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
            F.sum("n_chars").cast("bigint").alias("chars_sum"),
        ).select(F.lit(v).alias("version"), "lang", "n_docs", "id_sum",
                 "chars_sum")
        out = part if out is None else out.unionAll(part)
    return out


# --------------------------------------------------------------------------
# q255 — QUALITY-CLASSIFIER CALIBRATION (reliability table + ECE): the
# eval every learned curation filter needs before its scores gate data
# (is "0.9 confident" right 90% of the time?). Confidence is a
# deterministic md5 pseudo-uniform in milliunits, the label a second
# independent hash thresholded BY the confidence (calibrated by
# construction up to quantization — so the table is non-degenerate).
# DETERMINISM: every reported double is ONE IEEE division of exact
# integer sums — conf = sum_k/(1000 n), acc = sum_l/n, |gap| and the
# final ECE = sum_b|1000 sl_b − sk_b| / (1000 N) — no float
# accumulation anywhere, so values are bit-identical on any
# partitioning and in DuckDB. One fact-scale hash agg on the decile.
# --------------------------------------------------------------------------
@register(
    "q255_calibration_ece",
    oracle=f"""
    WITH scored AS (
      SELECT ({md5_int64_sql('text')}) % 1000 AS k,
             CASE WHEN ({md5_int64_sql("text || 'y'")}) % 1000
                       < ({md5_int64_sql('text')}) % 1000
                  THEN 1 ELSE 0 END AS label
      FROM documents
    ), buckets AS (
      SELECT CAST(k // 100 AS INT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(k) AS sk, SUM(label) AS sl
      FROM scored GROUP BY 1
    )
    SELECT CAST(bucket AS INT) AS bucket, n,
           CAST(sk AS DOUBLE) / (1000 * n) AS conf,
           CAST(sl AS DOUBLE) / n AS acc,
           CAST(ABS(1000 * sl - sk) AS DOUBLE) / (1000 * n) AS gap
    FROM buckets
    UNION ALL
    SELECT -1, CAST(SUM(n) AS BIGINT),
           NULL, NULL,
           CAST(SUM(ABS(1000 * sl - sk)) AS DOUBLE) / (1000 * SUM(n))
    FROM buckets
    ORDER BY bucket
    """,
)
def q255(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_int64

    docs = load(spark, sf_dir, "documents")
    k = md5_int64(F.col("text")) % 1000
    label = F.when(
        md5_int64(F.concat(F.col("text"), F.lit("y"))) % 1000 < k, 1
    ).otherwise(0)
    buckets = (
        docs.select(k.alias("k"), label.alias("label"))
        .groupBy((F.col("k") / 100).cast("int").alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("n"),
             F.sum("k").alias("sk"), F.sum("label").alias("sl"))
    )
    per_bucket = buckets.select(
        F.col("bucket").cast("int").alias("bucket"), "n",
        (F.col("sk").cast("double") / (1000 * F.col("n"))).alias("conf"),
        (F.col("sl").cast("double") / F.col("n")).alias("acc"),
        (F.abs(1000 * F.col("sl") - F.col("sk")).cast("double")
         / (1000 * F.col("n"))).alias("gap"),
    )
    total = buckets.agg(
        F.sum("n").cast("bigint").alias("n"),
        (F.sum(F.abs(1000 * F.col("sl") - F.col("sk"))).cast("double")
         / (1000 * F.sum("n"))).alias("gap"),
    ).select(F.lit(-1).cast("int").alias("bucket"), "n",
             F.lit(None).cast("double").alias("conf"),
             F.lit(None).cast("double").alias("acc"), "gap")
    return per_bucket.unionAll(total).orderBy("bucket")


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
# q259 — UNICODE COMPATIBILITY FOLD (NFKC subset): the pre-tokenization
# cleanup every crawl pipeline runs (CCNet/fastText normalize before
# anything hashes or tokenizes) — fullwidth ASCII, typographic quotes/
# dashes, NBSP-family spaces, ellipsis expansion, whitespace squeeze.
# Each doc wraps its text in deterministic mess (curly quotes,
# NBSP-joined words, a fullwidth tail) and `T.fold_text` — translate +
# literal replaces + one regexp, map-only, no UDF — must recover the
# clean form; the oracle replays the identical construction and fold,
# and the EXACT folded strings are value-compared per doc.
# --------------------------------------------------------------------------
_MESSY_TAIL = "　ＴＥＳＴ１２３…"


@register(
    "q259_unicode_fold",
    oracle=f"""
    SELECT doc_id,
           {T.fold_text_sql(
               "'“' || replace(text, ' ', ' ') || '” "
               + _MESSY_TAIL + "'"
           )} AS folded
    FROM documents
    """,
)
def q259(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit("“"),
        F.translate(F.col("text"), " ", " "),
        F.lit("” " + _MESSY_TAIL),
    )
    return docs.select("doc_id", T.fold_text(messy).alias("folded"))


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
# q261 — PNG -> JPEG TRANSCODE, every stage a real codec: encode PNG
# (Paeth), decode, re-encode the DECODED pixels as baseline JPEG (unit
# quant — DC-only exact), decode again; emit the final block values
# plus an in-kernel lossless flag. The "normalize a heterogeneous
# image corpus to one format" job, proven bit-exact across BOTH codecs
# in one chain (q153 and q211 each prove one format; this composes
# them). Oracle replays the block values from md5 hex; lossless must
# be 1 everywhere by the DC-exact construction.
# --------------------------------------------------------------------------
@register(
    "q261_png_jpeg_transcode",
    oracle=f"""
    SELECT doc_id,
           CAST({_md5_byte(0)} AS INT) AS b00,
           CAST({_md5_byte(1)} AS INT) AS b01,
           CAST({_md5_byte(2)} AS INT) AS b10,
           CAST({_md5_byte(3)} AS INT) AS b11,
           CAST(1 AS INT) AS lossless
    FROM documents
    """,
)
def q261(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import transcode_png_jpeg

    return transcode_png_jpeg(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q270 — READABILITY (Flesch-Kincaid grade): the dictionary-free
# counting heuristics (letter-run words, [.!?]+ sentences, vowel-group
# syllables) shared as module regex constants; grade = two integer
# ratios combined in a fixed double order, so the oracle replays the
# value bit-for-bit before the 6-dp round. Map-only projection —
# whole-stage codegen end to end, the quality-scoring shape (q33)
# extended with the curriculum-standard readability metric.
# --------------------------------------------------------------------------
@register(
    "q270_readability",
    oracle=f"""
    WITH c AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{T.READ_WORD_REGEX}'))
               AS n_words,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS n_sentences,
             len(regexp_extract_all(lower(text), '{T.READ_SYL_REGEX}'))
               AS n_syllables
      FROM documents
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_syllables AS BIGINT) AS n_syllables,
           CASE WHEN n_words > 0 THEN
             round(0.39 * (CAST(n_words AS DOUBLE)
                           / CAST(n_sentences AS DOUBLE))
                   + 11.8 * (CAST(n_syllables AS DOUBLE)
                             / CAST(n_words AS DOUBLE))
                   - 15.59, 6)
           END AS fk_grade
    FROM c
    """,
)
def q270(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.readability_features(load(spark, sf_dir, "documents"))


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
# q295 — MIXED-SCRIPT / HOMOGLYPH SPAM DETECTION: the crawl-quality
# screen that catches Cyrillic lookalikes inside Latin words (spam,
# SEO cloaking, phishing corpora). Each doc synthesizes a deterministic
# variant (doc_id%3==1 -> 'a' becomes U+0430, %3==2 -> 'e' becomes
# U+0435, else clean); the DETECTOR — per-script regexp_count over the
# Unicode ranges, integer counts, one ratio, mixed-word count via a
# Latin+Cyrillic-adjacency pattern — runs identically over the
# constructed text on both sides. Map-only projection, whole-stage
# codegen; flags exactly the 2/3 tainted docs.
# --------------------------------------------------------------------------
@register(
    "q295_mixed_script",
    oracle="""
    WITH v AS (
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS INT)
               WHEN 1 THEN replace(text, 'a', 'а')
               WHEN 2 THEN replace(text, 'e', 'е')
               ELSE text END AS t
      FROM documents
    ), c AS (
      SELECT doc_id,
             len(regexp_extract_all(t, '[A-Za-z]')) AS n_latin,
             len(regexp_extract_all(t, '[Ѐ-ӿ]')) AS n_cyrillic,
             len(regexp_extract_all(t,
                 '[A-Za-z][Ѐ-ӿ]|[Ѐ-ӿ][A-Za-z]'))
               AS n_adjacent
      FROM v
    )
    SELECT doc_id, CAST(n_latin AS BIGINT) AS n_latin,
           CAST(n_cyrillic AS BIGINT) AS n_cyrillic,
           CAST(n_adjacent AS BIGINT) AS n_adjacent,
           CASE WHEN n_latin + n_cyrillic > 0 THEN
             round(CAST(n_cyrillic AS DOUBLE)
                   / CAST(n_latin + n_cyrillic AS DOUBLE), 6) END
             AS cyrillic_ratio,
           (n_cyrillic > 0 AND n_latin > 0 AND n_adjacent > 0)
             AS suspect
    FROM c
    """,
)
def q295(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = (
        F.when(F.col("doc_id") % 3 == 1,
               F.replace(F.col("text"), F.lit("a"), F.lit("а")))
        .when(F.col("doc_id") % 3 == 2,
              F.replace(F.col("text"), F.lit("e"), F.lit("е")))
        .otherwise(F.col("text"))
    )
    v = docs.select("doc_id", t.alias("t"))
    n_lat = F.regexp_count(F.col("t"), F.lit("[A-Za-z]"))
    n_cyr = F.regexp_count(F.col("t"), F.lit("[Ѐ-ӿ]"))
    n_adj = F.regexp_count(
        F.col("t"),
        F.lit("[A-Za-z][Ѐ-ӿ]|[Ѐ-ӿ][A-Za-z]"))
    c = v.select(
        "doc_id",
        n_lat.cast("bigint").alias("n_latin"),
        n_cyr.cast("bigint").alias("n_cyrillic"),
        n_adj.cast("bigint").alias("n_adjacent"))
    tot = F.col("n_latin") + F.col("n_cyrillic")
    return c.select(
        "doc_id", "n_latin", "n_cyrillic", "n_adjacent",
        F.when(tot > 0,
               F.round(F.col("n_cyrillic").cast("double")
                       / tot.cast("double"), 6)).alias("cyrillic_ratio"),
        ((F.col("n_cyrillic") > 0) & (F.col("n_latin") > 0)
         & (F.col("n_adjacent") > 0)).alias("suspect"),
    )


# --------------------------------------------------------------------------
# q301 — SENTENCE-LEVEL CORPUS DEDUP (the C4 "remove any line that
# occurs >= 3 times in the corpus" rule): each doc gains a
# deterministic boilerplate sentence (doc_id % 4 != 0 — the 3/4 of the
# corpus that shares a newsletter footer), sentences explode WITH
# POSITION, one corpus-wide count per sentence (a shrinking hash agg —
# at 100 TB the join key would be the sentence digest, not the string;
# here the string keeps the oracle mechanism-independent), and docs
# reassemble ORDER-PRESERVINGLY from the surviving sentences
# (array_sort over (pos, sent) structs -> array_join). Output is
# per-doc kept/removed counts + the md5 of the cleaned text, so the
# oracle value-checks the exact reassembled string.
# --------------------------------------------------------------------------
_BOILER = "Subscribe to our newsletter for updates"


@register(
    "q301_sentence_dedup",
    oracle=f"""
    WITH v AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 <> 0
                  THEN text || '. {_BOILER}' ELSE text END AS t
      FROM documents
    ), s AS (
      SELECT doc_id,
             unnest(str_split(t, '. ')) AS sent,
             unnest(range(1, len(str_split(t, '. ')) + 1)) AS pos
      FROM v
    ), c AS (
      SELECT sent, COUNT(*) AS n FROM s GROUP BY sent
    ), j AS (
      SELECT s.doc_id, s.sent, s.pos, c.n < 3 AS keep
      FROM s JOIN c USING (sent)
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
             AS n_removed,
           md5(COALESCE(string_agg(CASE WHEN keep THEN sent END, '. '
                                   ORDER BY pos), '')) AS clean_md5
    FROM j GROUP BY doc_id ORDER BY doc_id
    """,
)
def q301(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = F.when(F.col("doc_id") % 4 != 0,
               F.concat(F.col("text"), F.lit(". " + _BOILER))
               ).otherwise(F.col("text"))
    s = docs.select(
        "doc_id",
        F.posexplode(F.split(t, "\\. ")).alias("pos0", "sent"))
    c = s.groupBy("sent").agg(F.count("*").alias("n"))
    j = s.join(c, "sent").select(
        "doc_id", "sent", (F.col("pos0") + 1).alias("pos"),
        (F.col("n") < 3).alias("keep"))
    kept_structs = F.array_sort(F.collect_list(
        F.when(F.col("keep"), F.struct("pos", "sent"))))
    return (
        j.groupBy("doc_id")
        .agg(
            F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_kept"),
            F.sum((~F.col("keep")).cast("int")).cast("bigint")
            .alias("n_removed"),
            F.md5(F.array_join(
                F.transform(kept_structs, lambda x: x["sent"]), ". "))
            .alias("clean_md5"))
        .orderBy("doc_id")
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
    wc = w.groupBy("w").agg(F.count("*").alias("f"))
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
    )
    post = docs.select(
        "doc_id", F.posexplode(ws).alias("pos0", "term"))
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
    tris = F.expr(
        "transform(sequence(1, length(text) - 2),"
        " i -> substring(text, i, 3))")
    doc_tri = docs.select("doc_id", F.explode_outer(tris).alias("tri"))
    # n_tri counts DISTINCT needle trigrams (a needle with internal
    # repeats must not demand more hits than exist)
    needle_tri = needle.select(
        "needle",
        F.explode(F.array_distinct(F.expr(
            "transform(sequence(1, length(needle) - 2),"
            " i -> substring(needle, i, 3))"))).alias("tri"))
    needle_tri = needle_tri.join(
        needle_tri.groupBy("needle").agg(F.count("*").alias("n_tri")),
        "needle")
    # the broadcast needle join runs BEFORE the distinct, so only
    # matching trigrams (a tiny fraction of the corpus) ever shuffle
    cand = (
        doc_tri.join(F.broadcast(needle_tri), "tri")
        .select("doc_id", "needle", "tri", "n_tri").distinct()
        .groupBy("doc_id", "needle")
        .agg(F.count("*").alias("hit"), F.max("n_tri").alias("n_tri"))
        .filter(F.col("hit") == F.col("n_tri"))
    )
    verified = (
        cand.join(docs, "doc_id")
        .filter(F.contains(F.col("text"), F.col("needle")))
    )
    occ = F.floor(
        (F.length("text")
         - F.length(F.replace(F.col("text"), F.col("needle"), F.lit(""))))
        / F.length("needle")).cast("bigint")
    return (
        verified.select("doc_id", occ.alias("n_occurrences"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q321 — SNIPPET CONTAINMENT ATTRIBUTION (the RAG / quote-attribution
# op): given a table of snippets (first 25 words of every 10th doc —
# the search-result preview), find every document whose shingle set
# CONTAINS the snippet: containment C(s, d) = |S(s) ∩ S(d)| / |S(s)|,
# the ASYMMETRIC cousin of Jaccard (q27/q66 would miss a short quote
# inside a long doc — the union term drowns it). Candidates meet in a
# shingle equi-join (never snippets x docs); |S(s)| is a per-snippet
# count joined back by broadcast. Exact integer intersection counts,
# one division, threshold 0.8.
# --------------------------------------------------------------------------
_CONT_K = 5       # shingle width (words)
_CONT_LEN = 25    # snippet length (words)

_SQL_SHINGLES = (
    "list_distinct(list_transform("
    "generate_series(1, len({ws}) - {k}), "
    "i -> array_to_string(list_slice({ws}, i, i + {k} - 1), ' ')))"
)


@register(
    "q321_containment_attribution",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {SQL_WORDS} AS ws FROM documents
    ), snip AS (
      SELECT doc_id AS snippet_id,
             {_SQL_SHINGLES.format(ws=f"list_slice(ws, 1, {_CONT_LEN})",
                                   k=_CONT_K)} AS sh
      FROM w WHERE doc_id % 10 = 0 AND len(ws) >= {_CONT_LEN}
    ), ssh AS (
      SELECT snippet_id, unnest(sh) AS shingle,
             len(sh) AS n_snip FROM snip
    ), dsh AS (
      SELECT doc_id, unnest({_SQL_SHINGLES.format(ws="ws", k=_CONT_K)})
               AS shingle
      FROM w
    ), hit AS (
      SELECT s.snippet_id, d.doc_id, COUNT(*) AS n_hit, MAX(s.n_snip)
               AS n_snip
      FROM ssh s JOIN dsh d USING (shingle)
      GROUP BY 1, 2
    )
    SELECT snippet_id, doc_id,
           CAST(n_hit AS BIGINT) AS n_hit,
           CAST(n_snip AS BIGINT) AS n_snip,
           round(CAST(n_hit AS DOUBLE) / n_snip, 6) AS containment
    FROM hit WHERE CAST(n_hit AS DOUBLE) / n_snip >= 0.8
    ORDER BY snippet_id, doc_id
    """,
)
def q321(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ws = T.words("text")
    w = docs.select("doc_id", ws.alias("ws"))

    def shingles(ws_expr: str) -> F.Column:
        return F.array_distinct(F.expr(
            f"transform(sequence(1, size({ws_expr}) - {_CONT_K}), "
            f"i -> array_join(slice({ws_expr}, i, {_CONT_K}), ' '))"))

    snip = (
        w.filter((F.col("doc_id") % 10 == 0)
                 & (F.size("ws") >= _CONT_LEN))
        .select(F.col("doc_id").alias("snippet_id"),
                F.slice("ws", 1, _CONT_LEN).alias("sws"))
        .select("snippet_id", shingles("sws").alias("sh"))
    )
    ssh = snip.select(
        "snippet_id", F.explode("sh").alias("shingle"),
        F.size("sh").alias("n_snip"))
    dsh = w.select(
        "doc_id", F.explode(shingles("ws")).alias("shingle"))
    hit = (
        ssh.join(dsh, "shingle")
        .groupBy("snippet_id", "doc_id")
        .agg(F.count("*").alias("n_hit"), F.max("n_snip").alias("n_snip"))
    )
    c = F.col("n_hit").cast("double") / F.col("n_snip")
    return (
        hit.filter(c >= 0.8)
        .select("snippet_id", "doc_id",
                F.col("n_hit").cast("bigint").alias("n_hit"),
                F.col("n_snip").cast("bigint").alias("n_snip"),
                F.round(c, 6).alias("containment"))
        .orderBy("snippet_id", "doc_id")
    )


# --------------------------------------------------------------------------
# q322 — WINNOWING FINGERPRINTS (Schleimer/Wilkerson/Aiken 2003 — the
# MOSS plagiarism-detection selection rule): hash every 3-word k-gram,
# slide a w=4 window, keep the minimum hash per window with RIGHTMOST
# tie-break (packed as hash*4 + (3-offset) so one integer min encodes
# both rules), dedupe. Guarantees: any shared run >= w+k-1 grams shares
# a fingerprint, density ~ 2/(w+1). All array HOFs (transform /
# array_min / aggregate) — JVM-side, map-only, no shuffle; hashes are
# 40-bit md5 prefixes so the *4 packing cannot overflow. Checksum =
# exact integer sum of the distinct fingerprints (order-free, so
# list_distinct order differences between engines cannot matter).
# --------------------------------------------------------------------------
@register(
    "q322_winnowing",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {SQL_WORDS} AS ws FROM documents
    ), g AS (
      SELECT doc_id,
             list_transform(
               list_transform(generate_series(1, len(ws) - 2),
                 i -> array_to_string(list_slice(ws, i, i + 2), ' ')),
               s -> CAST(('0x' || substr(md5(s), 1, 10)) AS BIGINT)) AS hh
      FROM w WHERE len(ws) >= 6
    ), p AS (
      SELECT doc_id, len(hh) AS n_kgrams,
             list_distinct(list_transform(
               list_transform(generate_series(1, len(hh) - 3),
                 i -> list_min(list_transform(generate_series(0, 3),
                        o -> hh[i + o] * 4 + (3 - o)))),
               v -> v // 4)) AS fps
      FROM g
    )
    SELECT doc_id,
           CAST(n_kgrams AS BIGINT) AS n_kgrams,
           CAST(n_kgrams - 3 AS BIGINT) AS n_windows,
           CAST(len(fps) AS BIGINT) AS n_fingerprints,
           round(CAST(len(fps) AS DOUBLE) / (n_kgrams - 3), 6) AS density,
           CAST(list_sum(fps) AS BIGINT) AS fp_checksum
    FROM p ORDER BY doc_id
    """,
)
def q322(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = docs.select("doc_id", T.words("text").alias("ws")).filter(
        F.size("ws") >= 6)
    g = w.select(
        "doc_id",
        F.expr(
            "transform("
            " transform(sequence(1, size(ws) - 2),"
            "  i -> array_join(slice(ws, i, 3), ' ')),"
            " s -> CAST(conv(substring(md5(s), 1, 10), 16, 10) AS BIGINT))"
        ).alias("hh"))
    p = g.select(
        "doc_id", F.size("hh").alias("n_kgrams"),
        F.array_distinct(F.expr(
            "transform("
            " transform(sequence(1, size(hh) - 3),"
            "  i -> array_min(transform(sequence(0, 3),"
            "        o -> element_at(hh, CAST(i + o AS INT)) * 4"
            "             + (3 - o)))),"
            " v -> v div 4)")).alias("fps"))
    return p.select(
        "doc_id",
        F.col("n_kgrams").cast("bigint").alias("n_kgrams"),
        (F.col("n_kgrams") - 3).cast("bigint").alias("n_windows"),
        F.size("fps").cast("bigint").alias("n_fingerprints"),
        F.round(F.size("fps").cast("double")
                / (F.col("n_kgrams") - 3), 6).alias("density"),
        F.aggregate("fps", F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x).cast("bigint")
        .alias("fp_checksum"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# q323 — INCREMENTAL DEDUP against a historical index (how production
# dedup actually runs: yesterday's corpus is already signed, only the
# new batch pays signature cost, and candidates come from an ASYMMETRIC
# band join — batch x index bucket collisions, never batch x batch or a
# full self-join). Index = doc_id % 5 != 0, batch = the remaining 20%.
# Estimated similarity = matching minhash components / 16 — an exact
# integer agreement count over the q28 signatures, so the oracle
# replays it bit-for-bit; best match per batch doc via
# max(struct(n_match, -index_id)). is_dup at >= 8/16.
# --------------------------------------------------------------------------
_INC_MATCH = " + ".join(
    f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)"
    for i in range(D.N_MINHASH)
)


@register(
    "q323_incremental_dedup",
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
    ), cand AS (
      SELECT DISTINCT b.doc_id AS batch_id, a.doc_id AS index_id
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.key = b.key
      WHERE a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
    ), m AS (
      SELECT c.batch_id, c.index_id, ({_INC_MATCH}) AS n_match
      FROM cand c
      JOIN sigs sa ON sa.doc_id = c.index_id
      JOIN sigs sb ON sb.doc_id = c.batch_id
    ), best AS (
      SELECT batch_id, index_id, n_match,
             row_number() OVER (PARTITION BY batch_id
                                ORDER BY n_match DESC, index_id ASC) AS rk
      FROM m
    )
    SELECT batch_id, index_id AS match_id,
           CAST(n_match AS BIGINT) AS n_match,
           round(n_match / {D.N_MINHASH}.0, 6) AS est_jaccard,
           n_match >= {D.N_MINHASH // 2} AS is_dup
    FROM best WHERE rk = 1 ORDER BY batch_id
    """,
)
def q323(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs).localCheckpoint(eager=False)
    rows = D.N_MINHASH // D.N_BANDS
    band_cols = []
    for b in range(D.N_BANDS):
        parts = [F.col(f"mh{b * rows + r}").cast("string")
                 for r in range(rows)]
        band_cols.append(
            F.conv(F.substring(F.md5(F.concat_ws("_", *parts)), 1, 15),
                   16, 10).cast("bigint").alias(f"band{b}"))
    stacked = sigs.select("doc_id", *band_cols).select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"),
                     F.col(f"band{b}").alias("key"))
            for b in range(D.N_BANDS)])).alias("bk")
    ).select("doc_id", "bk.band_id", "bk.key")
    index_keys = stacked.filter(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("index_id"), "band_id", "key")
    batch_keys = stacked.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("batch_id"), "band_id", "key")
    cand = (index_keys.join(batch_keys, ["band_id", "key"])
            .select("batch_id", "index_id").distinct())
    sa = sigs.select(F.col("doc_id").alias("index_id"),
                     *[F.col(f"mh{i}").alias(f"a{i}")
                       for i in range(D.N_MINHASH)])
    sb = sigs.select(F.col("doc_id").alias("batch_id"),
                     *[F.col(f"mh{i}").alias(f"b{i}")
                       for i in range(D.N_MINHASH)])
    n_match = None
    for i in range(D.N_MINHASH):
        t = (F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
        n_match = t if n_match is None else n_match + t
    m = (cand.join(sa, "index_id").join(sb, "batch_id")
         .select("batch_id", "index_id", n_match.alias("n_match")))
    best = (
        m.groupBy("batch_id")
        .agg(F.max(F.struct(F.col("n_match"),
                            (-F.col("index_id")).alias("ni"))).alias("t"))
        .select("batch_id", (-F.col("t.ni")).alias("match_id"),
                F.col("t.n_match").alias("n_match"))
    )
    return best.select(
        "batch_id", "match_id",
        F.col("n_match").cast("bigint").alias("n_match"),
        F.round(F.col("n_match") / float(D.N_MINHASH), 6)
        .alias("est_jaccard"),
        (F.col("n_match") >= D.N_MINHASH // 2).alias("is_dup"),
    ).orderBy("batch_id")


# --------------------------------------------------------------------------
# q362 — STORAGE-PARTITIONED incremental dedup: q323's exact semantics
# (and exact oracle), but the historical index is a PERSISTED bucketed
# signature store (functions/signature_store.py) — band keys bucketed
# by (band_id, key), signatures bucketed by doc_id — so the batch join
# plans with NO Exchange above either index scan (FileScan shows
# Bucketed: true; the only shuffles move the small batch side). This is
# what q323 looks like when the index is 100 TB: the index is hashed
# once at write time and never re-signed or re-shuffled per batch.
# Plan shape is asserted in tests/test_signature_store.py.
# --------------------------------------------------------------------------
@register(
    "q362_bucketed_incremental_dedup",
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
    ), cand AS (
      SELECT DISTINCT b.doc_id AS batch_id, a.doc_id AS index_id
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.key = b.key
      WHERE a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
    ), m AS (
      SELECT c.batch_id, c.index_id, ({_INC_MATCH}) AS n_match
      FROM cand c
      JOIN sigs sa ON sa.doc_id = c.index_id
      JOIN sigs sb ON sb.doc_id = c.batch_id
    ), best AS (
      SELECT batch_id, index_id, n_match,
             row_number() OVER (PARTITION BY batch_id
                                ORDER BY n_match DESC, index_id ASC) AS rk
      FROM m
    )
    SELECT batch_id, index_id AS match_id,
           CAST(n_match AS BIGINT) AS n_match,
           round(n_match / {D.N_MINHASH}.0, 6) AS est_jaccard,
           n_match >= {D.N_MINHASH // 2} AS is_dup
    FROM best WHERE rk = 1 ORDER BY batch_id
    """,
)
def q362(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib as _hashlib

    from ..functions import signature_store as SS

    docs = load(spark, sf_dir, "documents")
    # the store is the NIGHTLY index: built once, probed per batch —
    # so build it once per (session, sf) and measure the steady-state
    # probe, not a rebuild (the catalog is per-session; a fresh session
    # rebuilds, exactly like a fresh cluster would bootstrap its index)
    name = f"q362_store_{_hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    if not spark.catalog.tableExists(f"{name}_bands"):
        SS.store_signatures(
            spark, docs.filter(F.col("doc_id") % 5 != 0), name)
    return SS.incremental_dedup_against_store(
        spark, docs.filter(F.col("doc_id") % 5 == 0), name)


# --------------------------------------------------------------------------
# q325 — UTF-8 BYTE HISTOGRAM / MOJIBAKE AUDIT: the encoding screen a
# crawl pipeline runs before trusting "UTF-8" labels — per language,
# the distribution of raw encoded BYTES (not codepoints), the non-ASCII
# share, and continuation-byte counts (0x80-0xBF — a high share without
# matching lead bytes is the classic double-encoding smell). Bytes come
# via np.bincount over the raw UTF-8 bytes in an Arrow kernel (each
# batch pre-aggregates to <= langs x 256 rows — a histogram never needs
# an exploded row per byte). One shrinking (lang, byte) hash agg; the
# DuckDB oracle keeps the independent hex-chunk mechanism.
# --------------------------------------------------------------------------
@register(
    "q325_byte_histogram",
    oracle="""
    WITH b AS (
      SELECT lang,
             unnest(list_transform(
               generate_series(1, len(t) // 2),
               i -> CAST(('0x' || substr(t, i * 2 - 1, 2)) AS BIGINT)))
               AS byte
      FROM (SELECT lang, hex(encode(text)) AS t FROM documents)
    )
    SELECT lang, CAST(byte AS BIGINT) AS byte,
           CAST(COUNT(*) AS BIGINT) AS n,
           (byte >= 128) AS non_ascii,
           (byte >= 128 AND byte < 192) AS continuation
    FROM b GROUP BY lang, byte ORDER BY lang, byte
    """,
)
def q325(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = load(spark, sf_dir, "documents")

    # round 7 perf: a 256-bucket histogram never needs one exploded row
    # PER BYTE — the hex-chunk HOF formulation materialized ~50M rows
    # at sf0.1 before the partial agg. np.bincount over the raw UTF-8
    # bytes inside an Arrow kernel pre-aggregates each batch to at most
    # langs x 256 rows (measured 8.5 s -> 2.1 s cold at sf0.1,
    # value-identical); the downstream shuffle is unchanged (tiny).
    def kernel(batches):
        import numpy as np

        for pdf in batches:
            accum: dict = {}
            for lang, t in zip(pdf["lang"], pdf["text"]):
                b = np.frombuffer(str(t).encode("utf-8"),
                                  dtype=np.uint8)
                h = np.bincount(b, minlength=256)
                if lang in accum:
                    accum[lang] += h
                else:
                    accum[lang] = h.astype(np.int64)
            rows = {"lang": [], "byte": [], "n": []}
            for lang, h in accum.items():
                nz = h.nonzero()[0]
                rows["lang"].extend([lang] * len(nz))
                rows["byte"].extend(nz.tolist())
                rows["n"].extend(h[nz].tolist())
            yield pd.DataFrame(rows)

    hist = docs.select("lang", "text").mapInPandas(
        kernel, "lang string, byte long, n long")
    return (
        hist.groupBy("lang", "byte")
        .agg(F.sum("n").cast("bigint").alias("n"))
        .select("lang", F.col("byte").cast("bigint").alias("byte"), "n",
                (F.col("byte") >= 128).alias("non_ascii"),
                ((F.col("byte") >= 128) & (F.col("byte") < 192))
                .alias("continuation"))
        .orderBy("lang", "byte")
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
# q328 — c-TF-IDF TOP TERMS per class (the BERTopic class-based TF-IDF
# that labels clusters with their characteristic words): treat each
# lang as one aggregate "class document"; score(term, class) =
# tf_norm * ln(1 + avg_class_size / cross-class term count). Two
# shrinking aggs (term x class counts, then class totals), the global
# term table joins back by term, and the top-5 ranking windows
# partition BY class (never global). Scores are fixed-order scalar
# expressions per row — no distributed float sum — rounded 6; ranking
# ties break on the term string.
# --------------------------------------------------------------------------
@register(
    "q328_ctfidf_topterms",
    oracle=f"""
    WITH w AS (
      SELECT lang, unnest({SQL_WORDS}) AS term FROM documents
    ), tc AS (
      SELECT lang, term, COUNT(*) AS tf FROM w GROUP BY 1, 2
    ), cls AS (
      SELECT lang, SUM(tf) AS class_total FROM tc GROUP BY lang
    ), gt AS (
      SELECT term, SUM(tf) AS global_tf FROM tc GROUP BY term
    ), avg_sz AS (
      SELECT AVG(class_total) AS a FROM cls
    ), scored AS (
      SELECT tc.lang, tc.term, tc.tf,
             round((CAST(tc.tf AS DOUBLE) / cls.class_total)
                   * ln(1 + a / gt.global_tf), 6) AS score
      FROM tc JOIN cls USING (lang) JOIN gt USING (term)
      CROSS JOIN avg_sz
    )
    SELECT lang, term, CAST(tf AS BIGINT) AS tf, score,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT lang, term, tf, score,
             row_number() OVER (PARTITION BY lang
                                ORDER BY score DESC, term ASC) AS rk
      FROM scored
    ) WHERE rk <= 5 ORDER BY lang, rk
    """,
)
def q328(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = docs.select("lang", F.explode(T.words("text")).alias("term"))
    tc = w.groupBy("lang", "term").agg(F.count("*").alias("tf"))
    tc = tc.localCheckpoint(eager=False)  # feeds cls, gt, and scored
    cls = tc.groupBy("lang").agg(F.sum("tf").alias("class_total"))
    gt = tc.groupBy("term").agg(F.sum("tf").alias("global_tf"))
    avg_sz = cls.agg(F.avg("class_total").alias("a"))
    scored = (
        tc.join(F.broadcast(cls), "lang")
        .join(gt, "term")
        .crossJoin(F.broadcast(avg_sz))
        .select(
            "lang", "term", "tf",
            F.round((F.col("tf").cast("double") / F.col("class_total"))
                    * F.log(1 + F.col("a") / F.col("global_tf")), 6)
            .alias("score"))
    )
    wr = Window.partitionBy("lang").orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 5)
        .select("lang", "term", F.col("tf").cast("bigint").alias("tf"),
                "score", F.col("rk").cast("bigint").alias("rk"))
        .orderBy("lang", "rk")
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
        .localCheckpoint()
    )
    # greedy walk: follow best_l from position 1; frontier shrinks as
    # words finish (pos > len) — bounded by the longest word
    state = wc.select("word", F.lit(1).alias("p"),
                      F.lit(0).alias("pieces"),
                      F.length("word").alias("wl")).localCheckpoint()
    done = state.filter(F.col("p") > F.col("wl")).select("word", "pieces")
    active = state.filter(F.col("p") <= F.col("wl"))
    while active.count() > 0:  # bounded scalar per round
        stepped = (
            active.join(best, ["word", "p"])
            .select("word", (F.col("p") + F.col("best_l")).alias("p"),
                    (F.col("pieces") + 1).alias("pieces"), "wl")
            .localCheckpoint()
        )
        done = done.unionByName(
            stepped.filter(F.col("p") > F.col("wl"))
            .select("word", "pieces"))
        active = stepped.filter(F.col("p") <= F.col("wl"))
    return (
        done.join(wc, "word")
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
    docs = load(spark, sf_dir, "documents")
    d = docs.select("doc_id",
                    F.substring("text", 1, _SA_LEN).alias("t"))
    st = d.select(
        "doc_id", F.length("t").alias("n"),
        F.posexplode(F.expr(
            "transform(sequence(1, length(t)),"
            " i -> ascii(substring(t, i, 1)))")).alias("pos0", "r")
    ).select("doc_id", "n", (F.col("pos0") + 1).alias("pos"),
             F.col("r").cast("bigint").alias("r"))
    st = st.localCheckpoint()
    wpos = Window.partitionBy("doc_id").orderBy("pos")
    for k in range(_SA_ROUNDS):
        step = 1 << k
        wrank = Window.partitionBy("doc_id").orderBy(
            F.col("r").asc(), F.col("r2").asc())
        st = (
            st.withColumn("r2", F.coalesce(
                F.lead("r", step).over(wpos), F.lit(0)))
            .withColumn("r", F.dense_rank().over(wrank).cast("bigint"))
            .drop("r2")
        )
        if k == 3:  # cut the 8-round lineage once mid-way
            st = st.localCheckpoint()
    return (
        st.groupBy("doc_id")
        .agg(F.max("n").cast("bigint").alias("n_suffixes"),
             F.sum(F.col("pos") * F.col("r")).cast("bigint")
             .alias("sa_checksum"))
        .orderBy("doc_id")
    )


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
# q339 — SPAN-LEVEL F1 (the NER / extraction eval): two deterministic
# "annotators" mark token spans — gold = words longer than 6 chars,
# predicted = words containing a doubled lowercase letter (explicit
# aa|bb|...|zz alternation — RE2 oracles have no backreferences) — and
# the eval counts
# EXACT span matches (same doc, same position, same width). Explode
# once per annotator with positions, equi-join on (doc, pos), and the
# micro P/R/F1 are three divisions over exact integer counts, grouped
# by lang. The standard seqeval computation as relational algebra.
# --------------------------------------------------------------------------
@register(
    "q339_span_f1",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, lang, unnest({SQL_WORDS}) AS word,
             unnest(range(1, len({SQL_WORDS}) + 1)) AS pos
      FROM documents
    ), gold AS (
      SELECT doc_id, lang, pos FROM p WHERE len(word) > 6
    ), pred AS (
      SELECT doc_id, lang, pos FROM p
      WHERE regexp_matches(word, 'aa|bb|cc|dd|ee|ff|gg|hh|ii|jj|kk|ll|mm|nn|oo|pp|qq|rr|ss|tt|uu|vv|ww|xx|yy|zz')
    ), m AS (
      SELECT g.lang, COUNT(*) AS tp
      FROM gold g JOIN pred r ON r.doc_id = g.doc_id AND r.pos = g.pos
      GROUP BY g.lang
    ), gg AS (
      SELECT lang, COUNT(*) AS n_gold FROM gold GROUP BY lang
    ), pp AS (
      SELECT lang, COUNT(*) AS n_pred FROM pred GROUP BY lang
    )
    SELECT gg.lang,
           CAST(COALESCE(m.tp, 0) AS BIGINT) AS tp,
           CAST(gg.n_gold AS BIGINT) AS n_gold,
           CAST(COALESCE(pp.n_pred, 0) AS BIGINT) AS n_pred,
           round(CAST(COALESCE(m.tp, 0) AS DOUBLE)
                 / NULLIF(pp.n_pred, 0), 6) AS precision,
           round(CAST(COALESCE(m.tp, 0) AS DOUBLE) / gg.n_gold, 6)
             AS recall,
           round(2.0 * COALESCE(m.tp, 0)
                 / NULLIF(gg.n_gold + COALESCE(pp.n_pred, 0), 0), 6)
             AS f1
    FROM gg LEFT JOIN m USING (lang) LEFT JOIN pp USING (lang)
    ORDER BY lang
    """,
)
def q339(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    p = docs.select(
        "doc_id", "lang",
        F.posexplode(T.words("text")).alias("pos0", "word")
    ).select("doc_id", "lang", (F.col("pos0") + 1).alias("pos"), "word")
    p = p.localCheckpoint(eager=False)
    gold = p.filter(F.length("word") > 6).select("doc_id", "lang", "pos")
    pred = p.filter(F.col("word").rlike("aa|bb|cc|dd|ee|ff|gg|hh|ii|jj|kk|ll|mm|nn|oo|pp|qq|rr|ss|tt|uu|vv|ww|xx|yy|zz")).select(
        "doc_id", F.col("pos").alias("ppos"))
    m = (gold.join(pred, (gold.doc_id == pred.doc_id)
                   & (gold.pos == pred.ppos))
         .groupBy("lang").agg(F.count("*").alias("tp")))
    gg = gold.groupBy("lang").agg(F.count("*").alias("n_gold"))
    pp = (p.filter(F.col("word").rlike("aa|bb|cc|dd|ee|ff|gg|hh|ii|jj|kk|ll|mm|nn|oo|pp|qq|rr|ss|tt|uu|vv|ww|xx|yy|zz"))
          .groupBy("lang").agg(F.count("*").alias("n_pred")))
    tp = F.coalesce(F.col("tp"), F.lit(0))
    npred = F.coalesce(F.col("n_pred"), F.lit(0))
    return (
        gg.join(m, "lang", "left").join(pp, "lang", "left")
        .select(
            "lang", tp.cast("bigint").alias("tp"),
            F.col("n_gold").cast("bigint").alias("n_gold"),
            npred.cast("bigint").alias("n_pred"),
            F.round(tp.cast("double")
                    / F.when(npred != 0, npred), 6).alias("precision"),
            F.round(tp.cast("double") / F.col("n_gold"), 6)
            .alias("recall"),
            F.round(F.lit(2.0) * tp
                    / F.when(F.col("n_gold") + npred != 0,
                             F.col("n_gold") + npred), 6).alias("f1"))
        .orderBy("lang")
    )


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
        .filter(F.col("k") <= F.col("mx")).select("k"))
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
# q355 — GREEDY MAX-COVERAGE SELECTION (the (1-1/e) facility-location
# greedy used for instruction-data subset selection): pick 5 docs, each
# round choosing the one covering the most NOT-YET-COVERED 5-word
# shingles (ties to the lowest doc_id). The uncovered gain is one
# anti-join + hash agg per round; the argmax is a bounded 1-row
# collect (the k-center q311 discipline) and the covered set grows by
# the winner's shingles only. The oracle unrolls all 5 rounds as
# chained CTEs — an independent mechanism that must agree on every
# pick and gain.
# --------------------------------------------------------------------------
_COVER_K = 5


def _cover_oracle() -> str:
    head = f"""WITH sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, len({SQL_WORDS}) - 4),
                 i -> array_to_string(list_slice({SQL_WORDS}, i, i + 4),
                                      ' '))) AS shingle
        FROM documents)
    ), g1 AS (
      SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY doc_id
    ), p1 AS (
      SELECT doc_id, c FROM g1 ORDER BY c DESC, doc_id ASC LIMIT 1
    ), c1 AS (
      SELECT DISTINCT shingle FROM sh JOIN p1 USING (doc_id)
    )"""
    parts = [head]
    for k in range(2, _COVER_K + 1):
        parts.append(f""", g{k} AS (
          SELECT s.doc_id, COUNT(*) AS c
          FROM sh s LEFT JOIN c{k - 1} cc ON cc.shingle = s.shingle
          WHERE cc.shingle IS NULL GROUP BY s.doc_id
        ), p{k} AS (
          SELECT doc_id, c FROM g{k} ORDER BY c DESC, doc_id ASC LIMIT 1
        ), c{k} AS (
          SELECT shingle FROM c{k - 1}
          UNION
          SELECT s.shingle FROM sh s JOIN p{k} USING (doc_id)
        )""")
    sel = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS pick, doc_id, "
        f"CAST(c AS BIGINT) AS gain FROM p{k}"
        for k in range(1, _COVER_K + 1))
    return "".join(parts) + " " + sel + " ORDER BY pick"


@register("q355_greedy_set_cover", oracle=_cover_oracle())
def q355(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ws = T.words("text")
    sh = (docs.select("doc_id", ws.alias("ws"))
          .select("doc_id", F.explode(F.expr(
              "transform(sequence(1, size(ws) - 4),"
              " i -> array_join(slice(ws, i, 5), ' '))")).alias("shingle"))
          .distinct().localCheckpoint())
    covered = None
    picks = []
    for k in range(1, _COVER_K + 1):
        rem = (sh if covered is None
               else sh.join(covered, "shingle", "left_anti"))
        gain = rem.groupBy("doc_id").agg(F.count("*").alias("c"))
        top = gain.agg(F.max(F.struct(
            F.col("c"), (-F.col("doc_id")).alias("nd"))).alias("m")
        ).collect()[0].m  # bounded: 1 row
        if top is None:
            break
        pick, c = -top.nd, int(top.c)
        picks.append((k, int(pick), c))
        new_cov = sh.filter(F.col("doc_id") == pick).select("shingle")
        covered = (new_cov if covered is None
                   else covered.unionByName(new_cov).distinct()
                   ).localCheckpoint()
    return spark.createDataFrame(
        spark.sparkContext.parallelize(picks, 1),
        "pick bigint, doc_id bigint, gain bigint").orderBy("pick")


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
# q421 — DELTA LAKE LOG INTEROP (sources/deltalog.py, the delta.io
# protocol layout): the corpus is written ONCE as a lang-partitioned
# Delta table — data files hold (doc_id, text, n_chars) only, the
# partition column lives in the log's add-action partitionValues, per
# the protocol. The history then exercises the replay semantics a
# real lakehouse reader needs: v1 DELETEs the 'de' partition, a
# parquet CHECKPOINT is cut at v1 (+_last_checkpoint), and v2
# RESURRECTS the even-doc_id 'de' file — so the HEAD read must start
# from the checkpoint, replay only v2 (O(delta), asserted by the unit
# suite), and apply last-writer-wins per path; the v0 read must time-
# travel BELOW the checkpoint. Planning is log-only; partition columns
# attach as literals per file group.
# --------------------------------------------------------------------------
DELTA_SCHEMA = ("lang string, n_head long, n_v0 long, chars_head long, "
                "files_en int")


def _delta_table_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os as _os

        from ..sources.deltalog import (
            add_action, delta_commit, delta_metadata, remove_action,
            write_checkpoint,
        )

        _os.makedirs(d, exist_ok=True)
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "text", "n_chars", "lang")

        def writer(batches):
            import pandas as pd
            import pyarrow as _pa
            import pyarrow.parquet as _pq

            # a partition arrives as many Arrow batches; each (lang,
            # shard) file must be written once, so concatenate first
            pdfs = [b for b in batches if not b.empty]
            if pdfs:
                pdf = pd.concat(pdfs, ignore_index=True)
                facts = {k: [] for k in ("path", "lang", "shard",
                                         "size", "n", "lo", "hi")}
                for (lang, shard), grp in pdf.groupby(
                        ["lang", "shard"]):
                    grp = grp.sort_values("doc_id")
                    rel = f"part-{lang}-{int(shard)}.parquet"
                    tbl = _pa.Table.from_pandas(
                        grp[["doc_id", "text", "n_chars"]],
                        preserve_index=False)
                    _pq.write_table(tbl, _os.path.join(d, rel))
                    facts["path"].append(rel)
                    facts["lang"].append(lang)
                    facts["shard"].append(int(shard))
                    facts["size"].append(
                        _os.path.getsize(_os.path.join(d, rel)))
                    facts["n"].append(len(grp))
                    facts["lo"].append(int(grp["doc_id"].min()))
                    facts["hi"].append(int(grp["doc_id"].max()))
                yield pd.DataFrame(facts)

        facts = (docs.withColumn("shard", (F.col("doc_id") % 2)
                                 .cast("int"))
                 .repartition("lang", "shard")
                 .mapInPandas(writer, "path string, lang string, "
                              "shard int, size long, n long, lo long, "
                              "hi long")
                 .collect())   # bounded: one row per (lang, shard)

        meta = delta_metadata(
            [("doc_id", "long"), ("text", "string"),
             ("n_chars", "long"), ("lang", "string")], ["lang"])
        adds = [{"add": add_action(
            r["path"], {"lang": r["lang"]}, r["size"], r["n"],
            {"doc_id": r["lo"]}, {"doc_id": r["hi"]})} for r in
            sorted(facts, key=lambda r: r["path"])]
        delta_commit(d, 0, [{"metaData": meta}] + adds)
        de_paths = sorted(r["path"] for r in facts
                          if r["lang"] == "de")
        delta_commit(d, 1, [{"remove": remove_action(p)}
                            for p in de_paths], operation="DELETE")
        write_checkpoint(d, 1)
        resurrect = [{"add": a["add"]} for a in adds
                     if a["add"]["path"] == f"part-de-0.parquet"]
        delta_commit(d, 2, resurrect, operation="WRITE")

    return _derived_dir(sf_dir, "deltatbl", build)


@register(
    "q421_delta_log",
    oracle="""
    SELECT lang,
           CAST(SUM(CASE WHEN lang <> 'de' OR doc_id % 2 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_head,
           CAST(COUNT(*) AS BIGINT) AS n_v0,
           CAST(SUM(CASE WHEN lang <> 'de' OR doc_id % 2 = 0
                         THEN n_chars ELSE 0 END) AS BIGINT)
               AS chars_head,
           CAST(2 AS INT) AS files_en
    FROM documents GROUP BY lang
    """,
)
def q421(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.deltalog import (
        delta_snapshot, prune_adds, read_delta,
    )

    d = _delta_table_dir(spark, sf_dir)
    head = read_delta(spark, d).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_head"),
        F.sum("n_chars").cast("bigint").alias("chars_head"))
    v0 = read_delta(spark, d, version=0).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_v0"))
    # log-only partition pruning: the 'en' leg plans exactly 2 files
    files_en = len(prune_adds(delta_snapshot(d),
                              partition_filter={"lang": "en"}))
    return (v0.join(head, "lang", "left")
            .select("lang",
                    F.coalesce("n_head", F.lit(0)).alias("n_head"),
                    "n_v0",
                    F.coalesce("chars_head", F.lit(0))
                     .alias("chars_head"),
                    F.lit(files_en).cast("int").alias("files_en")))


# --------------------------------------------------------------------------
# q422 — ICEBERG FORMAT-V2 INTEROP (sources/iceberg.py): the second
# lakehouse format, structurally different from Delta — every snapshot
# references a COMPLETE manifest set (no log replay; time travel =
# read the old snapshot's manifest list), manifests are REAL Avro
# object containers written by the in-tree codec, and planning prunes
# at TWO levels (manifest partition summaries skip whole manifests
# before any file entry is read). History: snap1 = en+de+es+fr+zh
# appends (one manifest per commit wave), snap2 DELETEs 'de' by
# carrying only the surviving manifests, snap3 appends a replacement
# de file (even doc_ids). Identity partition columns stay IN the
# parquet files per the spec, so the Spark read is a plain pruned
# multi-path scan.
# --------------------------------------------------------------------------
ICE_SCHEMA = ("lang string, n_head long, n_snap1 long, "
              "chars_head long, manifests_scanned_en int")


def _iceberg_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os as _os

        from ..sources.iceberg import IcebergTable

        _os.makedirs(_os.path.join(d, "data"), exist_ok=True)
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "text", "n_chars", "lang")

        def writer(batches):
            import pandas as pd
            import pyarrow as _pa
            import pyarrow.parquet as _pq

            pdfs = [b for b in batches if not b.empty]
            if pdfs:
                pdf = pd.concat(pdfs, ignore_index=True)
                facts = {k: [] for k in ("path", "lang", "shard",
                                         "size", "n")}
                for (lang, shard), grp in pdf.groupby(
                        ["lang", "shard"]):
                    grp = grp.sort_values("doc_id")
                    rel = f"data/{lang}-{int(shard)}.parquet"
                    tbl = _pa.Table.from_pandas(
                        grp[["doc_id", "text", "n_chars", "lang"]],
                        preserve_index=False)
                    _pq.write_table(tbl, _os.path.join(d, rel))
                    facts["path"].append(rel)
                    facts["size"].append(
                        _os.path.getsize(_os.path.join(d, rel)))
                    facts["lang"].append(lang)
                    facts["shard"].append(int(shard))
                    facts["n"].append(len(grp))
                yield pd.DataFrame(facts)

        facts = (docs.withColumn("shard", (F.col("doc_id") % 2)
                                 .cast("int"))
                 .repartition("lang", "shard")
                 .mapInPandas(writer, "path string, lang string, "
                              "shard int, size long, n long")
                 .collect())   # bounded: one row per (lang, shard)

        table = IcebergTable(
            d, [("doc_id", "long"), ("text", "string"),
                ("n_chars", "long"), ("lang", "string")], ["lang"])
        # one manifest per lang (commit waves), ordered for determinism
        langs = sorted({r["lang"] for r in facts})
        for lang in langs:
            table.commit([{
                "path": r["path"], "partition": {"lang": r["lang"]},
                "record_count": r["n"], "size": r["size"],
            } for r in sorted(facts, key=lambda r: r["path"])
                if r["lang"] == lang])
        # snap N+1: DELETE 'de' by carrying only surviving manifests
        meta = table._current_metadata()
        rows = table._manifest_rows(meta, meta["current-snapshot-id"])
        keep = [m["manifest_path"] for m in rows
                if m["partitions"][0]["lower_bound"] != b"de"]
        table.commit([], operation="delete", carry_manifests=keep)
        # snap N+2: append the replacement de shard (even doc_ids)
        de0 = [r for r in facts
               if r["lang"] == "de" and r["shard"] == 0]
        table.commit([{
            "path": r["path"], "partition": {"lang": "de"},
            "record_count": r["n"], "size": r["size"],
        } for r in de0])

    return _derived_dir(sf_dir, "icebergtbl", build)


@register(
    "q422_iceberg_interop",
    oracle="""
    SELECT lang,
           CAST(SUM(CASE WHEN lang <> 'de' OR doc_id % 2 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_head,
           CAST(COUNT(*) AS BIGINT) AS n_snap1,
           CAST(SUM(CASE WHEN lang <> 'de' OR doc_id % 2 = 0
                         THEN n_chars ELSE 0 END) AS BIGINT)
               AS chars_head,
           CAST(1 AS INT) AS manifests_scanned_en
    FROM documents GROUP BY lang
    """,
)
def q422(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.iceberg import IcebergTable, read_iceberg

    d = _iceberg_dir(spark, sf_dir)
    table = IcebergTable(d)
    meta = table._current_metadata()
    n_langs = len(meta["snapshots"]) - 2   # one append per lang
    snap_full = meta["snapshots"][n_langs - 1]["snapshot-id"]

    head = read_iceberg(spark, d).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_head"),
        F.sum("n_chars").cast("bigint").alias("chars_head"))
    full = read_iceberg(spark, d, snapshot_id=snap_full).groupBy(
        "lang").agg(F.count("*").cast("bigint").alias("n_snap1"))
    # manifest-level pruning: the en filter must open exactly ONE
    # manifest out of the full set
    en_plan = table.plan(partition_filter={"lang": "en"})
    return (full.join(head, "lang", "left")
            .select("lang",
                    F.coalesce("n_head", F.lit(0)).alias("n_head"),
                    "n_snap1",
                    F.coalesce("chars_head", F.lit(0))
                     .alias("chars_head"),
                    F.lit(en_plan["manifests_scanned"]).cast("int")
                     .alias("manifests_scanned_en")))


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
# q426 — DELTA OPTIMIZE / CLUSTERING (the small-file + data-layout op):
# the table starts WORST-CASE clustered — 8 files by doc_id % 8, so
# every file's (min, max) doc_id stats span the whole id range and a
# range filter prunes NOTHING (files_before_hit = number of residues
# present in the probed range, replayed analytically by the oracle).
# OPTIMIZE rewrites the same rows into 8 doc_id-clustered files in ONE
# commit (8 removes + 8 adds, atomic for readers); afterwards the same
# filter's stats-range prune plans EXACTLY ONE file. The read-back of
# the optimized table under the filter must agree with the corpus
# (count + id sum) — proving the rewrite moved bytes, not just stats.
# This is delta OPTIMIZE/ZORDER's scaling contract: pruning power is a
# function of LAYOUT, and the log records enough (per-file min/max) to
# plan it without opening a file.
# --------------------------------------------------------------------------
DOPT_SCHEMA = ("n_total long, n_hit long, sum_hit long, "
               "files_before_hit int, files_after_hit int, "
               "total_files int")


def _deltaz_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import math as _math
        import os as _os

        from ..sources.deltalog import (
            add_action, delta_commit, delta_metadata, remove_action,
        )

        _os.makedirs(d, exist_ok=True)
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "n_chars")

        def writer(col):
            def _w(batches):
                import pandas as pd
                import pyarrow as _pa
                import pyarrow.parquet as _pq

                pdfs = [b for b in batches if not b.empty]
                if pdfs:
                    pdf = pd.concat(pdfs, ignore_index=True)
                    facts = {k: [] for k in ("path", "size", "n",
                                             "lo", "hi")}
                    for key, grp in pdf.groupby(col):
                        grp = grp.sort_values("doc_id")
                        rel = f"{col}-{int(key)}.parquet"
                        _pq.write_table(_pa.Table.from_pandas(
                            grp[["doc_id", "n_chars"]],
                            preserve_index=False),
                            _os.path.join(d, rel))
                        facts["path"].append(rel)
                        facts["size"].append(_os.path.getsize(
                            _os.path.join(d, rel)))
                        facts["n"].append(len(grp))
                        facts["lo"].append(int(grp["doc_id"].min()))
                        facts["hi"].append(int(grp["doc_id"].max()))
                    yield pd.DataFrame(facts)
            return _w

        fact_schema = "path string, size long, n long, lo long, hi long"
        # v0: worst-case layout, 8 files by residue
        v0 = (docs.withColumn("res", (F.col("doc_id") % 8).cast("int"))
              .repartition("res")
              .mapInPandas(writer("res"), fact_schema).collect())
        meta = delta_metadata(
            [("doc_id", "long"), ("n_chars", "long")], [])
        delta_commit(d, 0, [{"metaData": meta}] + [
            {"add": add_action(r["path"], {}, r["size"], r["n"],
                               {"doc_id": r["lo"]},
                               {"doc_id": r["hi"]})}
            for r in sorted(v0, key=lambda r: r["path"])])

        # OPTIMIZE: rewrite into 8 doc_id-clustered chunks, the exact
        # ceil(n/8) chunking the oracle replays
        n = docs.count()
        c = _math.ceil(n / 8)
        # ceil-exact chunking so the oracle can replay the boundaries;
        # a production OPTIMIZE would repartitionByRange instead of a
        # global row_number (this runs once, in the one-time layout
        # job, not in the read path)
        w = Window.orderBy("doc_id")
        chunked = docs.withColumn(
            "chunk", ((F.row_number().over(w) - 1) / c)
            .cast("int"))
        v1 = (chunked.repartition("chunk")
              .mapInPandas(writer("chunk"), fact_schema).collect())
        delta_commit(d, 1, [
            {"remove": remove_action(r["path"])} for r in v0] + [
            {"add": add_action(r["path"], {}, r["size"], r["n"],
                               {"doc_id": r["lo"]},
                               {"doc_id": r["hi"]})}
            for r in sorted(v1, key=lambda r: r["path"])],
            operation="OPTIMIZE")

    return _derived_dir(sf_dir, "deltaz", build)


@register(
    "q426_delta_optimize",
    oracle="""
    WITH ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY doc_id) AS rn,
             COUNT(*) OVER () AS n
      FROM documents
    ), c1 AS (
      SELECT doc_id, n FROM ranked
      WHERE rn <= CAST(ceil(n / 8.0) AS BIGINT)
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS n_hit,
           CAST(SUM(doc_id) AS BIGINT) AS sum_hit,
           CAST(COUNT(DISTINCT doc_id % 8) AS INT) AS files_before_hit,
           CAST(1 AS INT) AS files_after_hit,
           CAST(8 AS INT) AS total_files
    FROM c1
    """,
)
def q426(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json

    from ..sources.deltalog import (
        delta_snapshot, prune_adds, read_delta,
    )

    d = _deltaz_dir(spark, sf_dir)
    head = delta_snapshot(d)
    v0 = delta_snapshot(d, version=0)
    # the probe range = the first optimized chunk's exact id span
    chunk1 = min(head["adds"].values(),
                 key=lambda a: json.loads(a["stats"])["minValues"]
                 ["doc_id"])
    st = json.loads(chunk1["stats"])
    lo, hi = st["minValues"]["doc_id"], st["maxValues"]["doc_id"]
    before = len(prune_adds(v0, column_ranges={"doc_id": (lo, hi)}))
    after = len(prune_adds(head, column_ranges={"doc_id": (lo, hi)}))
    hit = (read_delta(spark, d)
           .filter((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)))
    total = read_delta(spark, d).count()
    return hit.agg(
        F.lit(total).cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("n_hit"),
        F.sum("doc_id").cast("bigint").alias("sum_hit"),
        F.lit(before).cast("int").alias("files_before_hit"),
        F.lit(after).cast("int").alias("files_after_hit"),
        F.lit(len(head["adds"])).cast("int").alias("total_files"))


# --------------------------------------------------------------------------
# q427 — ICEBERG V2 DELETE FILES (merge-on-read): the row-level delete
# machinery real Iceberg tables use. History: per-lang appends (seq
# 1-5), a GLOBAL EQUALITY delete file removing every doc_id % 10 == 3
# key (seq 6), a re-insert of the % 20 == 3 half of those keys (seq 7
# — they must SURVIVE, because equality deletes only apply to data
# files with data_seq < delete_seq), and a POSITIONAL delete file
# removing the first 5 row positions of the even-en data file (seq 8;
# row positions come from the parquet scan's own _metadata.row_index).
# The oracle replays the survivor set analytically: a sequence-rule
# bug, a mis-applied position, or a partition/delete interaction error
# all change the per-lang counts and id sums.
# --------------------------------------------------------------------------
IMOR_SCHEMA = ("lang string, n_docs long, id_sum long, chars_sum long")


def _iceberg_mor_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(d: str) -> None:
        import os as _os

        from ..sources.iceberg import IcebergTable

        _os.makedirs(_os.path.join(d, "data"), exist_ok=True)
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "n_chars", "lang")

        def writer(tag):
            def _w(batches):
                import pandas as pd
                import pyarrow as _pa
                import pyarrow.parquet as _pq

                pdfs = [b for b in batches if not b.empty]
                if pdfs:
                    pdf = pd.concat(pdfs, ignore_index=True)
                    facts = {k: [] for k in ("path", "lang", "size",
                                             "n")}
                    for (lang, shard), grp in pdf.groupby(
                            ["lang", "shard"]):
                        grp = grp.sort_values("doc_id")
                        rel = f"data/{tag}-{lang}-{int(shard)}.parquet"
                        _pq.write_table(_pa.Table.from_pandas(
                            grp[["doc_id", "n_chars", "lang"]],
                            preserve_index=False),
                            _os.path.join(d, rel))
                        facts["path"].append(rel)
                        facts["lang"].append(lang)
                        facts["size"].append(_os.path.getsize(
                            _os.path.join(d, rel)))
                        facts["n"].append(len(grp))
                    yield pd.DataFrame(facts)
            return _w

        fact_schema = "path string, lang string, size long, n long"
        base = (docs.withColumn("shard", (F.col("doc_id") % 2)
                                .cast("int"))
                .repartition("lang", "shard")
                .mapInPandas(writer("b"), fact_schema).collect())
        table = IcebergTable(
            d, [("doc_id", "long"), ("n_chars", "long"),
                ("lang", "string")], ["lang"])
        for lang in sorted({r["lang"] for r in base}):   # seq 1..5
            table.commit([{
                "path": r["path"], "partition": {"lang": r["lang"]},
                "record_count": r["n"], "size": r["size"],
            } for r in sorted(base, key=lambda r: r["path"])
                if r["lang"] == lang])

        # seq 6: GLOBAL equality delete of doc_id % 10 == 3
        def del_writer(batches):
            import pandas as pd
            import pyarrow as _pa
            import pyarrow.parquet as _pq

            pdfs = [b for b in batches if not b.empty]
            if pdfs:
                pdf = pd.concat(pdfs, ignore_index=True).sort_values(
                    "doc_id")
                rel = "data/eq-delete.parquet"
                _pq.write_table(_pa.Table.from_pandas(
                    pdf[["doc_id"]], preserve_index=False),
                    _os.path.join(d, rel))
                yield pd.DataFrame({
                    "path": [rel],
                    "size": [_os.path.getsize(_os.path.join(d, rel))],
                    "n": [len(pdf)]})

        eq = (docs.filter(F.col("doc_id") % 10 == 3).select("doc_id")
              .repartition(1)
              .mapInPandas(del_writer, "path string, size long, n long")
              .collect())[0]
        table.commit([{"path": eq["path"], "partition": {"lang": None},
                       "record_count": eq["n"], "size": eq["size"],
                       "content": 2, "equality_ids": [1]}],
                     operation="delete")

        # seq 7: re-insert the % 20 == 3 half — these must survive
        re_rows = (docs.filter(F.col("doc_id") % 20 == 3)
                   .withColumn("shard", F.lit(9))
                   .repartition("lang")
                   .mapInPandas(writer("r"), fact_schema).collect())
        table.commit([{
            "path": r["path"], "partition": {"lang": r["lang"]},
            "record_count": r["n"], "size": r["size"],
        } for r in sorted(re_rows, key=lambda r: r["path"])])

        # seq 8: positional delete of the first 5 rows of the even-en
        # base file (its rows are doc_id-sorted by construction)
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        rel = "data/pos-delete.parquet"
        _pq.write_table(_pa.table({
            "file_path": _pa.array(["data/b-en-0.parquet"] * 5),
            "pos": _pa.array(list(range(5)), _pa.int64())}),
            _os.path.join(d, rel))
        table.commit([{"path": rel, "partition": {"lang": None},
                       "record_count": 5,
                       "size": _os.path.getsize(_os.path.join(d, rel)),
                       "content": 1}], operation="delete")

    return _derived_dir(sf_dir, "icebergmor", build)


@register(
    "q427_iceberg_mor_deletes",
    oracle="""
    WITH en5 AS (
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn
        FROM documents WHERE lang = 'en' AND doc_id % 2 = 0)
      WHERE rn <= 5
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sum
    FROM documents
    WHERE NOT (doc_id % 10 = 3 AND doc_id % 20 <> 3)
      AND doc_id NOT IN (SELECT doc_id FROM en5)
    GROUP BY lang
    """,
)
def q427(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.iceberg import read_iceberg

    d = _iceberg_mor_dir(spark, sf_dir)
    return read_iceberg(spark, d).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.sum("n_chars").cast("bigint").alias("chars_sum"))


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

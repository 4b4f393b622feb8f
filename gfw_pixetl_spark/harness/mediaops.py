"""Multimodal (image/audio/video) harness queries: decode, resize,
frame sampling, EXIF/orientation, transcode — over binary columns.

Split out of the former textops.py (round 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.multimodal import (
    extract_image_meta, resize_images, sample_frames,
)
from . import load, register
from .textstats import q167

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
# q436 — H.264/AVC KEYFRAME INDEXING (sources/h264.py): the video-corpus
# sampling need — find the IDR pictures so extraction lands on
# self-contained frames, recover the TRUE coded resolution from the SPS
# (container width/height fields are advisory), and census NAL traffic
# — WITHOUT pixel decode (entropy-coded macroblock data stays honestly
# opaque; decode gating documented in sources/mp3.py's Layer III note).
# Each doc carries a spec-valid avc1 mp4: avcC record in the sample
# entry, in-band SPS/PPS/SEI on every IDR, real Exp-Golomb slice
# headers, frame cropping expressing non-multiple-of-16 dimensions, and
# an stss box whose sync list the kernel CROSS-CHECKS against the
# NAL-derived IDR positions — a container/bitstream disagreement fails
# the boolean and the hash. Oracle: the GOP structure is closed-form in
# doc_id, so every output column replays analytically.
# --------------------------------------------------------------------------
H264_SCHEMA = ("doc_id long, n_samples int, n_idr int, idr_pos_sum long, "
               "width int, height int, profile int, level int, "
               "n_sei int, stss_consistent boolean")


def h264_mp4_payload(doc_id: int) -> bytes:
    """Deterministic avc1 mp4: GOP size 4..8, 24..35 frames, cropped
    dimensions, alternating Baseline/Main profile."""
    from ..sources import h264
    from ..sources.bmff import encode_mp4_tracks

    nf = 24 + doc_id % 12
    gop = 4 + doc_id % 5
    w = 160 + 2 * (doc_id % 9)
    h = 90 + 2 * (doc_id % 7)
    profile = 66 if doc_id % 2 == 0 else 77
    level = (30, 31, 40)[doc_id % 3]
    sps = h264.build_sps(w, h, profile_idc=profile, level_idc=level)
    pps = h264.build_pps()
    avcc = h264.build_avcc([sps], [pps])
    samples, sync = [], []
    for i in range(nf):
        idr = i % gop == 0
        body = bytes([0xA5]) * (20 + (i * 7) % 50)
        nals = []
        if idr:
            nals += [sps, pps, h264.build_sei()]
            sync.append(i + 1)
        nals.append(h264.build_slice(idr, i % 256, 8, body))
        samples.append(h264.avcc_sample(nals))
    return encode_mp4_tracks([{
        "samples": samples, "handler": b"vide", "fourcc": "avc1",
        "width": w, "height": h,
        "entry_extra": h264.avc_fourcc_entry_extra(avcc),
        "sync_samples": sync,
    }])


@register(
    "q436_h264_keyframe_index",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             CAST(24 + doc_id % 12 AS INT) AS nf,
             CAST(4 + doc_id % 5 AS INT) AS g
      FROM documents
    ), gops AS (
      SELECT doc_id, nf, g, CAST((nf + g - 1) // g AS INT) AS n_idr
      FROM base
    )
    SELECT doc_id, nf AS n_samples, n_idr,
           CAST(n_idr + g * (CAST(n_idr AS BIGINT) * (n_idr - 1) / 2)
                AS BIGINT) AS idr_pos_sum,
           CAST(160 + 2 * (doc_id % 9) AS INT) AS width,
           CAST(90 + 2 * (doc_id % 7) AS INT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 66 ELSE 77 END AS INT)
             AS profile,
           CAST(CASE doc_id % 3 WHEN 0 THEN 30 WHEN 1 THEN 31
                ELSE 40 END AS INT) AS level,
           n_idr AS n_sei,
           TRUE AS stss_consistent
    FROM gops
    """,
)
def q436(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.partitioning import ensure_min_partitions

    docs = ensure_min_partitions(
        load(spark, sf_dir, "documents").select("doc_id"))

    def kernel(batches):
        import pandas as pd
        import struct as _struct

        from ..sources import h264
        from ..sources.bmff import sample_ranges

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                payload = h264_mp4_payload(int(doc_id))
                idx = sample_ranges(payload)
                ee = idx["entry_extra"]
                size, four = _struct.unpack(">I4s", ee[:8])
                assert four == b"avcC"
                cfg = h264.parse_avcc(ee[8:size])
                sps = h264.parse_sps(cfg["sps"][0])
                idr_pos, n_sei = [], 0
                for i, (off, sz, _dts) in enumerate(idx["samples"],
                                                    start=1):
                    info = h264.index_sample(payload[off:off + sz],
                                             cfg["length_size"])
                    if info["idr"]:
                        idr_pos.append(i)
                    if info["has_sei"]:
                        n_sei += 1
                out.append((
                    int(doc_id), len(idx["samples"]), len(idr_pos),
                    sum(idr_pos), sps.width, sps.height,
                    sps.profile_idc, sps.level_idc, n_sei,
                    idx["sync_samples"] == idr_pos,
                ))
            yield pd.DataFrame(out, columns=[
                "doc_id", "n_samples", "n_idr", "idr_pos_sum", "width",
                "height", "profile", "level", "n_sei",
                "stss_consistent"])

    return docs.mapInPandas(kernel, H264_SCHEMA)

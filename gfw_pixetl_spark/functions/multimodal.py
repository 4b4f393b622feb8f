"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
struct of metadata next to them. Decode / feature-extract / resize run as
Arrow-batched ``mapInPandas`` kernels — the same shape the raster window
kernel uses, so partitioning, batch sizing, and schema handling are shared.

PNG and baseline JPEG payloads decode for REAL through the pure-Python
codecs in ``sources/png.py`` and ``sources/jpeg.py`` (spec-implemented,
no PIL) — ``decode_image`` returns actual pixels; q153 value-checks a
PNG decode->resize pipeline and q211 a JFIF decode against SQL oracles.
Remaining formats (ffmpeg video, compressed audio) stay codec-gated:
the md5-digest stand-ins keep those pipelines exercisable and
oracle-checkable (q40/q50/q51/q65/q119) until a codec is present.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StructField, StructType,
)

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_bytes", IntegerType()),
    ]
)

try:  # real image decoding is container-dependent
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def decode_image(payload: bytes):
    """Full image decode: PNG decodes natively via ``sources/png.py``
    and baseline JPEG via ``sources/jpeg.py`` (both return
    (h, w, channels) uint8 — PNG may also be uint16); other container
    formats need a codec library and stay gated."""
    if bytes(payload[:8]) == b"\x89PNG\r\n\x1a\n":
        from ..sources.png import decode_png

        return decode_png(bytes(payload))
    if bytes(payload[:2]) == b"\xff\xd8":
        from ..sources.jpeg import decode_jpeg

        return decode_jpeg(bytes(payload))
    if not HAVE_PIL:
        raise NotImplementedError(
            "only PNG and baseline JPEG decode natively (sources/png.py, "
            "sources/jpeg.py); other formats need PIL/ffmpeg, absent in "
            "this container."
        )
    raise NotImplementedError("wire PIL decode here when available")


def png_payload(text: str, size: int = 4) -> bytes:
    """Deterministic REAL PNG payload: the md5 digest of ``text`` laid
    out as a size x size grayscale image (16 digest bytes = 4x4). Unlike
    ``fake_payload`` this is a spec-valid container that round-trips
    through ``decode_image`` — and because the pixel values are digest
    bytes, a SQL oracle can still replay any arithmetic on them."""
    import numpy as np

    from ..sources.png import encode_png

    digest = hashlib.md5(text.encode("utf-8")).digest()
    need = size * size
    raw = (digest * ((need // len(digest)) + 1))[:need]
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(size, size)
    return encode_png(arr, filter_type=4)  # Paeth: hardest decode path


def fake_payload(text: str) -> bytes:
    """Deterministic stand-in payload (md5 digest bytes) so the binary
    pipeline is exercisable without real media files."""
    return hashlib.md5(text.encode("utf-8")).digest()


def _parse_header(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic 'header parse': width/height/channels from the first
    bytes — the stub stands in for a real format sniffer."""
    return payload[0], payload[1], payload[2] % 4 + 1, len(payload)


def extract_image_meta(df: DataFrame, text_col: str = "text") -> DataFrame:
    """documents -> (doc_id, width, height, channels, n_bytes).

    mapInPandas with Arrow batches: payload synthesis + header parse happen
    vectorized per batch; at scale, swap fake_payload for the real binary
    column and _parse_header for the codec sniffer — the plan is unchanged.
    The parallelism guard keeps the Python workers fed when the source is
    a handful of small files (a media manifest is bytes-tiny relative to
    its decode cost).
    """
    from .partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [fake_payload(t) for t in pdf[text_col]]
            meta = [_parse_header(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "channels": [m[2] for m in meta],
                    "n_bytes": [m[3] for m in meta],
                }
            )

    return df.select("doc_id", text_col).mapInPandas(kernel, META_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, payload binary"
)


def resize_images(
    df: DataFrame,
    target: tuple[int, int] = (64, 64),
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize kernel over a binary image column (decode step stubbed).

    The Spark contract is the production one — binary in, binary out,
    Arrow-batched mapInPandas, constant output metadata enabling schema
    pruning. The pixel resample itself needs a codec: with PIL absent the
    kernel emits a deterministic digest of (hex(payload), target) in place
    of resized bytes — digesting the *hex* form keeps the stand-in
    replayable by a VARCHAR-only SQL md5 (``unhex(md5(hex(p) || 'WxH'))``),
    so the whole pipeline is oracle-checkable end-to-end.
    """
    tw, th = target

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if HAVE_PIL:  # pragma: no cover - env-dependent
                raise NotImplementedError("wire PIL resize here when available")
            out_payloads = [
                hashlib.md5((bytes(p).hex() + f"{tw}x{th}").encode()).digest()
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "width": tw, "height": th,
                "payload": out_payloads,
            })

    return df.select(id_col, payload_col).mapInPandas(kernel, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, payload binary"


def sample_frames(
    df: DataFrame,
    every_nth: int = 10,
    n_frames: int = 3,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling kernel for video payloads: one input row fans out to
    ``n_frames`` rows (frame_idx = 0, n, 2n, ...). Real decoders plug into
    the same one-to-many mapInPandas shape; the stub derives each frame's
    bytes deterministically from (hex(payload), frame_idx) — hex form so a
    VARCHAR-only SQL md5 can replay it (see resize_images)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, outs = [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                for k in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(k * every_nth)
                    outs.append(
                        hashlib.md5(
                            (bytes(p).hex() + str(k * every_nth)).encode()
                        ).digest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "payload": outs}
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, FRAME_SCHEMA)


REAL_RESIZE_SCHEMA = "doc_id long, m00 int, m01 int, m10 int, m11 int"


def decode_resize_means(df: DataFrame, text_col: str = "text") -> DataFrame:
    """REAL image decode path: each doc's payload is a spec-valid PNG
    (``png_payload``, Paeth-filtered), the kernel decodes it with the
    pure-Python codec and area-resizes 4x4 -> 2x2 by integer-floor block
    mean. Because the pixels are the md5 digest bytes, a SQL oracle can
    replay the block means from ``md5(text)`` hex — so the decode +
    resample of a real container is value-checked end-to-end (q153),
    not rows-only. One-in/one-out Arrow mapInPandas, same shape as
    ``resize_images``."""
    import numpy as np

    from .partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, means = [], []
            for doc_id, t in zip(pdf["doc_id"], pdf[text_col]):
                img = decode_image(png_payload(t))[:, :, 0].astype("int64")
                blocks = img.reshape(2, 2, 2, 2).transpose(0, 2, 1, 3)
                m = blocks.reshape(2, 2, 4).sum(axis=2) // 4
                ids.append(doc_id)
                means.append(m.ravel())
            yield pd.DataFrame({
                "doc_id": ids,
                "m00": [int(m[0]) for m in means],
                "m01": [int(m[1]) for m in means],
                "m10": [int(m[2]) for m in means],
                "m11": [int(m[3]) for m in means],
            })

    return df.select("doc_id", text_col).mapInPandas(
        kernel, REAL_RESIZE_SCHEMA)


def jpeg_payload(text: str) -> bytes:
    """Deterministic REAL baseline-JPEG payload: a 16x16 grayscale JFIF
    whose four 8x8 blocks are constant at md5(text) digest bytes 0-3.
    DC-only blocks with an all-ones quant table decode EXACTLY (see
    sources/jpeg.py), so a SQL oracle can replay the decoded pixels from
    ``md5(text)`` hex — the JPEG analog of ``png_payload``."""
    import numpy as np

    from ..sources.jpeg import encode_jpeg

    digest = hashlib.md5(text.encode("utf-8")).digest()
    blocks = np.array(
        [[digest[0], digest[1]], [digest[2], digest[3]]], dtype=np.uint8)
    return encode_jpeg(np.repeat(np.repeat(blocks, 8, 0), 8, 1))


JPEG_BLOCK_SCHEMA = (
    "doc_id long, width int, height int, b00 int, b01 int, b10 int, b11 int"
)


def decode_jpeg_blocks(df: DataFrame, text_col: str = "text") -> DataFrame:
    """REAL JPEG decode path: each doc's payload is a spec-valid baseline
    JFIF (``jpeg_payload``: Huffman entropy coding, DCT, the works), the
    kernel runs the full decoder (marker parse, Annex-K Huffman decode,
    dequantize, IDCT, level shift) and emits the four 8x8 block values
    (exact, DC-only construction). Value-checked against md5(text) hex
    replay in q211 — the JPEG twin of ``decode_resize_means``/q153."""
    from .partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "width", "height", "b00", "b01", "b10", "b11")}
            for doc_id, t in zip(pdf["doc_id"], pdf[text_col]):
                img = decode_image(jpeg_payload(t))[:, :, 0]
                h, w = img.shape
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["b00"].append(int(img[0, 0]))
                out["b01"].append(int(img[0, 8]))
                out["b10"].append(int(img[8, 0]))
                out["b11"].append(int(img[8, 8]))
            yield pd.DataFrame(out)

    return df.select("doc_id", text_col).mapInPandas(
        kernel, JPEG_BLOCK_SCHEMA)


AHASH_SCHEMA = "doc_id long, ahash long"


def image_ahash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Perceptual average-hash over the decoded image: bit i set iff
    pixel i is brighter than the image mean — the standard aHash dedup
    fingerprint, downstream of which near-dup matching is JVM-side
    xor/bit_count (same shape as SimHash, q30/q31).

    With codecs absent the 'decoded image' is the deterministic stub
    (the 16 payload bytes as a 4x4 grayscale grid), which makes this the
    one multimodal kernel an external SQL oracle can replay bit-for-bit
    (harness q65) — the plumbing proof for the whole decode family.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, t in zip(pdf["doc_id"], pdf[text_col]):
                px = fake_payload(t)  # 16 'pixels'
                mean = sum(px) / 16.0
                hashes.append(
                    sum(1 << i for i, b in enumerate(px) if b > mean)
                )
                ids.append(doc_id)
            yield pd.DataFrame({"doc_id": ids, "ahash": hashes})

    return df.select("doc_id", text_col).mapInPandas(kernel, AHASH_SCHEMA)


ENERGY_SCHEMA = "doc_id long, win_idx int, rms double"


def audio_energy(
    df: DataFrame, text_col: str = "text", window: int = 4
) -> DataFrame:
    """Windowed RMS energy over an audio payload: one input row fans out
    to n_samples/window rows — the silence-trim / voice-activity feature
    a speech-corpus pipeline computes before segmentation. Real PCM
    decoders plug into the same one-to-many mapInPandas shape.

    With codecs absent the 'decoded samples' are the deterministic stub
    (the 16 md5 payload bytes as signed int8 PCM), so like the aHash
    kernel (q65) an external SQL oracle can replay the values
    bit-for-bit (harness q119).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, wins, rms = [], [], []
            for doc_id, t in zip(pdf["doc_id"], pdf[text_col]):
                raw = fake_payload(t)
                samples = [b - 256 if b > 127 else b for b in raw]
                for w0 in range(0, len(samples) // window):
                    chunk = samples[w0 * window : (w0 + 1) * window]
                    e = (sum(s * s for s in chunk) / float(window)) ** 0.5
                    ids.append(doc_id)
                    wins.append(w0)
                    rms.append(round(e, 6))
            yield pd.DataFrame({"doc_id": ids, "win_idx": wins, "rms": rms})

    return df.select("doc_id", text_col).mapInPandas(kernel, ENERGY_SCHEMA)


PATCH_SCHEMA = (
    "doc_id long, patch_row int, patch_col int, p_mean long, p_max long"
)


def image_patches(df: DataFrame, text_col: str = "text") -> DataFrame:
    """ViT-style patch extraction over the REAL decode path: each doc's
    payload is a spec-valid 8x8 Paeth-filtered PNG (digest bytes tiled),
    the kernel decodes it and splits into 4x4 = 16 non-overlapping 2x2
    patches, emitting per-patch floor-mean and max — the tokenize step
    of a vision-transformer ingest pipeline (image -> patch sequence).
    Long format: 16 rows per image; the fan-out is data-local, so the
    op is map-only at any corpus size. Pixels are md5 digest bytes, so
    a SQL oracle replays every patch statistic from md5(text) hex.
    """
    import numpy as np

    from .partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "patch_row", "patch_col", "p_mean", "p_max")}
            for doc_id, t in zip(pdf["doc_id"], pdf[text_col]):
                img = decode_image(png_payload(t, size=8))[:, :, 0]
                img = img.astype("int64")
                # (4, 2, 4, 2) -> patch grid (4, 4, 2, 2)
                p = img.reshape(4, 2, 4, 2).transpose(0, 2, 1, 3)
                flat = p.reshape(4, 4, 4)
                means = flat.sum(axis=2) // 4
                maxs = flat.max(axis=2)
                for pi in range(4):
                    for pj in range(4):
                        out["doc_id"].append(doc_id)
                        out["patch_row"].append(np.int32(pi))
                        out["patch_col"].append(np.int32(pj))
                        out["p_mean"].append(int(means[pi, pj]))
                        out["p_max"].append(int(maxs[pi, pj]))
            yield pd.DataFrame(out)

    return df.select("doc_id", text_col).mapInPandas(kernel, PATCH_SCHEMA)

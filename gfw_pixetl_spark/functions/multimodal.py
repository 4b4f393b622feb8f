"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
struct of metadata next to them. Decode / feature-extract / resize run as
Arrow-batched ``mapInPandas`` kernels — the same shape the raster window
kernel uses, so partitioning, batch sizing, and schema handling are shared.

The whole IMAGE family runs real codecs end-to-end: PNG and JPEG
(baseline + progressive SOF2) decode through the pure-Python codecs in
``sources/png.py`` / ``sources/jpeg.py``; resize is real NumPy
area/bilinear resampling (``functions/imageops.py``); frame sampling
slices real PNG frames out of an offset-indexed container
(``video_payload``); metadata extraction is a real IHDR/SOF header
sniff. AUDIO is real too: RIFF/WAVE PCM 8/16-bit and ITU-T G.711
mu-law/A-law companding (``sources/wav.py``). q40/q50/q51/q65/q119/
q153/q211/q232/q234/q235 value-check these against SQL oracles built on
digest-byte constructions. Only compressed formats (MP3/AAC/H.264 and
friends) remain out of scope — declared, not stubbed.
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
    """Full image decode: PNG via ``sources/png.py``, baseline +
    progressive JPEG via ``sources/jpeg.py``, lossless WebP (VP8L) via
    ``sources/webp.py``, GIF first-frame canvas via ``sources/gif.py``
    (all return (h, w, channels) uint8 — PNG may also be uint16); other
    container formats need a codec library and stay gated."""
    if bytes(payload[:8]) == b"\x89PNG\r\n\x1a\n":
        from ..sources.png import decode_png

        return decode_png(bytes(payload))
    if bytes(payload[:2]) == b"\xff\xd8":
        from ..sources.jpeg import decode_jpeg

        return decode_jpeg(bytes(payload))
    if bytes(payload[:4]) == b"RIFF" and bytes(payload[8:12]) == b"WEBP":
        from ..sources.webp import decode_webp

        return decode_webp(bytes(payload))
    if bytes(payload[:6]) in (b"GIF87a", b"GIF89a"):
        from ..sources.gif import decode_gif, gif_to_rgb

        # gif_to_rgb uses the frame's EFFECTIVE palette (local color
        # tables override the global one, which may be absent entirely)
        return gif_to_rgb(decode_gif(bytes(payload))["frames"][0])
    if not HAVE_PIL:
        raise NotImplementedError(
            "PNG, JPEG (baseline+progressive), lossless WebP, and GIF "
            "decode natively (sources/png.py, jpeg.py, webp.py, "
            "gif.py); other formats need PIL/ffmpeg, absent in this "
            "container."
        )
    raise NotImplementedError("wire PIL decode here when available")


def png_payload(text: str, size: int = 4) -> bytes:
    """Deterministic REAL PNG payload: the md5 digest of ``text`` laid
    out as a size x size grayscale image (16 digest bytes = 4x4) — a
    spec-valid container that round-trips through ``decode_image``, and
    because the pixel values are digest bytes, a SQL oracle can still
    replay any arithmetic on them."""
    import numpy as np

    from ..sources.png import encode_png

    digest = hashlib.md5(text.encode("utf-8")).digest()
    need = size * size
    raw = (digest * ((need // len(digest)) + 1))[:need]
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(size, size)
    return encode_png(arr, filter_type=4)  # Paeth: hardest decode path


_PNG_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff_image_meta(payload: bytes) -> tuple[int, int, int]:
    """REAL format sniffer: (width, height, channels) from container
    headers WITHOUT a full pixel decode — PNG IHDR (RFC 2083 §4.1.1) or
    JFIF SOF0/SOF2 frame header (ITU-T T.81 §B.2.2). This is the metadata
    pass a corpus scan runs over billions of images, so it must not
    inflate pixels."""
    import struct

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if payload[12:16] != b"IHDR":
            raise ValueError("PNG missing IHDR")
        w, h, _depth, ctype = struct.unpack(">IIBB", payload[16:26])
        return w, h, _PNG_COLOR_CHANNELS[ctype]
    if payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError("bad JPEG marker stream")
            marker = payload[pos + 1]
            (seg_len,) = struct.unpack(">H", payload[pos + 2:pos + 4])
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                _prec, h, w, ncomp = struct.unpack(
                    ">BHHB", payload[pos + 4:pos + 10])
                return w, h, ncomp
            pos += 2 + seg_len
        raise ValueError("JPEG without SOF marker")
    raise ValueError("unknown container (PNG/JFIF supported)")


def doc_image_payload(text: str) -> bytes:
    """Deterministic REAL per-doc image whose DIMENSIONS vary by content:
    md5 digest bytes b0/b1/b2 pick width = 2 + b0 % 7, height =
    2 + b1 % 7, channels = 1 or 3 (b2 % 2), pixels = digest tiled. A
    header sniffer must genuinely parse IHDR to recover them — and a SQL
    oracle replays all three from md5(text) hex (q40)."""
    import numpy as np

    from ..sources.png import encode_png

    digest = hashlib.md5(text.encode("utf-8")).digest()
    w, h = 2 + digest[0] % 7, 2 + digest[1] % 7
    ch = 1 + 2 * (digest[2] % 2)
    need = w * h * ch
    raw = (digest * ((need // len(digest)) + 1))[:need]
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, ch)
    return encode_png(arr, filter_type=2)


def extract_image_meta(df: DataFrame, text_col: str = "text") -> DataFrame:
    """documents -> (doc_id, width, height, channels, n_bytes).

    mapInPandas with Arrow batches over REAL spec-valid PNGs whose
    dimensions vary per doc (``doc_image_payload``): the kernel runs the
    real header sniffer (IHDR parse, no pixel inflate) and emits the
    recovered metadata plus the raw pixel byte count. The parallelism
    guard keeps the Python workers fed when the source is a handful of
    small files (a media manifest is bytes-tiny relative to its decode
    cost).
    """
    from .partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                sniff_image_meta(doc_image_payload(t)) for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "channels": [m[2] for m in meta],
                    "n_bytes": [m[0] * m[1] * m[2] for m in meta],
                }
            )

    return df.select("doc_id", text_col).mapInPandas(kernel, META_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, payload binary"
)


def resize_images(
    df: DataFrame,
    target: tuple[int, int] = (64, 64),
    method: str = "area",
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL resize kernel over a binary image column: decode the payload
    (PNG via ``sources/png.py``, baseline JFIF via ``sources/jpeg.py``),
    resample with the exact NumPy area / bilinear kernels
    (``functions/imageops.py``), round half-to-even to uint8, and
    re-encode as PNG. Binary in, binary out, Arrow-batched mapInPandas,
    constant output metadata enabling schema pruning — the production
    contract, now with real pixel math end-to-end (no digest stand-ins).
    q50 value-checks a JPEG-decode -> area -> bilinear chain against a
    SQL oracle built on exact dyadic resample weights.
    """
    import numpy as np

    from ..sources.png import encode_png
    from .imageops import quantize_u8, resize_array

    tw, th = target

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for p in pdf[payload_col]:
                img = decode_image(bytes(p))
                out = resize_array(img.astype(np.float64), th, tw, method)
                outs.append(encode_png(quantize_u8(out)))
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "width": tw, "height": th,
                "payload": outs,
            })

    return df.select(id_col, payload_col).mapInPandas(kernel, RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Frame container: a real offset-indexed multi-frame payload (the 'stbl'
# sample-table idea from ISO-BMFF mp4, reduced to its essentials). Real
# video codecs (H.264 etc.) stay honestly gated — but frame EXTRACTION,
# the part a corpus pipeline shuffles at scale, is real byte-range work
# against an index, exactly like mp4 sample tables or MJPEG streams.
#
#   magic 'GPXV' | u32 n_frames | u32 offsets[n_frames + 1] | frame bytes
#
# Each frame is an independently-decodable PNG, so sample_frames output
# feeds straight back into decode_image / resize_images.
# ---------------------------------------------------------------------------
VIDEO_MAGIC = b"GPXV"


def video_payload(text: str, n_frames: int = 24, size: int = 4) -> bytes:
    """Deterministic REAL video payload: ``n_frames`` PNG frames behind an
    offset index. Frame k's pixels are the md5 digest of ``text:k`` laid
    out ``size`` x ``size`` — spec-valid containers all the way down, and
    a SQL oracle can still replay any frame's pixels from
    ``md5(text || ':' || k)`` hex."""
    import struct

    import numpy as np

    from ..sources.png import encode_png

    frames = []
    for k in range(n_frames):
        digest = hashlib.md5(f"{text}:{k}".encode("utf-8")).digest()
        need = size * size
        raw = (digest * ((need // len(digest)) + 1))[:need]
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(size, size)
        frames.append(encode_png(arr, filter_type=4))
    head_len = 8 + 4 * (n_frames + 1)
    offsets, pos = [], head_len
    for f in frames:
        offsets.append(pos)
        pos += len(f)
    offsets.append(pos)
    return (VIDEO_MAGIC + struct.pack("<I", n_frames)
            + struct.pack(f"<{n_frames + 1}I", *offsets)
            + b"".join(frames))


def _video_index(payload: bytes) -> list[tuple[int, int]]:
    """Parse the container's sample index -> [(start, end)] per frame.

    Three real layouts: ISO-BMFF (sniffed by the ftyp box at offset 4;
    the full moov/trak/mdia/minf/stbl walk in ``sources/bmff.py`` per
    ISO/IEC 14496-12), RIFF/AVI (idx1 index via ``sources/avi.py``),
    and the legacy GPXV flat offset index. Either way the result is
    byte ranges — frame extraction never decodes unsampled frames."""
    import struct

    if payload[4:8] == b"ftyp":
        from ..sources.bmff import sample_ranges

        tab = sample_ranges(payload)
        return [(off, off + size) for off, size, _dts in tab["samples"]]
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from ..sources.avi import frame_ranges

        return frame_ranges(payload)
    if payload[:4] != VIDEO_MAGIC:
        raise ValueError("neither ISO-BMFF nor GPXV frame container")
    (n,) = struct.unpack("<I", payload[4:8])
    offs = struct.unpack(f"<{n + 1}I", payload[8:8 + 4 * (n + 1)])
    return [(offs[i], offs[i + 1]) for i in range(n)]


def mp4_payload(text: str, n_frames: int = 24, size: int = 4) -> bytes:
    """Deterministic REAL ISO-BMFF payload: ``n_frames`` PNG frames in a
    spec-valid mp4 (ftyp+mdat+moov, full stbl sample tables via
    ``sources/bmff.py``), grouped into multi-sample chunks so stsc has
    real run-length structure. Frame k's pixels are md5(text || ':' || k)
    digest bytes — same oracle-replayable construction as
    ``video_payload``, now behind the real container."""
    import numpy as np

    from ..sources.bmff import encode_mp4
    from ..sources.png import encode_png

    frames = []
    for k in range(n_frames):
        digest = hashlib.md5(f"{text}:{k}".encode("utf-8")).digest()
        need = size * size
        raw = (digest * ((need // len(digest)) + 1))[:need]
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(size, size)
        frames.append(encode_png(arr, filter_type=4))
    # chunks of 5,4,3,5,4,3,... -> a 3-run stsc that repeats, the shape
    # real muxers emit
    plan, left, cyc = [], n_frames, [5, 4, 3]
    while left > 0:
        take = min(cyc[len(plan) % 3], left)
        plan.append(take)
        left -= take
    return encode_mp4(frames, fourcc="png ", width=size, height=size,
                      chunk_plan=plan)


def webp_payload(text: str, size: int = 4) -> bytes:
    """Deterministic REAL WebP payload: the md5 digest of ``text`` as a
    size x size grayscale image in a lossless VP8L stream (RIFF/WEBP
    container, subtract-green transform, color cache, LZ77 —
    ``sources/webp.py``). Pixels are digest bytes, so a SQL oracle
    replays them from ``md5(text)`` hex — the WebP analog of
    ``png_payload``/``jpeg_payload``."""
    import numpy as np

    from ..sources.webp import encode_webp

    digest = hashlib.md5(text.encode("utf-8")).digest()
    need = size * size
    raw = (digest * ((need // len(digest)) + 1))[:need]
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(size, size)
    return encode_webp(arr)


def avi_payload(text: str, n_frames: int = 24) -> bytes:
    """Deterministic REAL AVI/MJPEG payload: ``n_frames`` standalone
    baseline JFIFs muxed into a spec-valid RIFF AVI ('MJPG' vids stream,
    idx1 index — ``sources/avi.py``). Frame k is the DC-only-exact 16x16
    JPEG of ``jpeg_payload`` built from md5(text || ':' || k), so a SQL
    oracle replays the decoded block values of exactly the sampled
    frames — the MJPEG twin of ``mp4_payload``/q360."""
    from ..sources.avi import encode_avi

    frames = [jpeg_payload(f"{text}:{k}") for k in range(n_frames)]
    return encode_avi(frames, width=16, height=16, fps=30)


FRAME_SCHEMA = "doc_id long, frame_idx int, payload binary"


def sample_frames(
    df: DataFrame,
    every_nth: int = 10,
    n_frames: int = 3,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling over a real offset-indexed container: one input row
    fans out to ``n_frames`` rows (frame_idx = 0, n, 2n, ...), each
    carrying the ACTUAL frame bytes sliced out via the container's sample
    table — no decode of unsampled frames, the property that matters when
    the container is a 2 GB mp4 and you want 3 frames. Emitted payloads
    are standalone PNGs, directly decodable downstream (q51 value-checks
    decoded pixels of each sampled frame)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, outs = [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p)
                index = _video_index(p)
                for k in range(n_frames):
                    fi = k * every_nth
                    if fi >= len(index):
                        break
                    s, e = index[fi]
                    ids.append(doc_id)
                    idxs.append(fi)
                    outs.append(p[s:e])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "payload": outs}
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, FRAME_SCHEMA)


def decode_pixel_probe(
    df: DataFrame,
    positions: list[tuple[int, int]],
    id_cols: tuple[str, ...] = ("doc_id",),
    payload_col: str = "payload",
) -> DataFrame:
    """Decode a binary image column and emit the pixel value (band 0) at
    each (row, col) probe position as ``p{row}{col}`` int columns, plus
    decoded width/height. The oracle-side hook for value-checking real
    codec + resample chains (q50/q51): whatever pixels the chain
    produced, this reads them back out via a second full decode."""
    schema = (", ".join(f"{c} long" for c in id_cols)
              + ", width int, height int, "
              + ", ".join(f"p{r}{c} int" for r, c in positions))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: pdf[c].values for c in id_cols}
            out.update({"width": [], "height": []})
            for r, c in positions:
                out[f"p{r}{c}"] = []
            for p in pdf[payload_col]:
                img = decode_image(bytes(p))
                h, w = img.shape[:2]
                out["width"].append(w)
                out["height"].append(h)
                for r, c in positions:
                    out[f"p{r}{c}"].append(int(img[r, c, 0]))
            yield pd.DataFrame(out)

    from pyspark.sql import functions as _F

    keys = [_F.col(c).cast("long").alias(c) for c in id_cols]
    return df.select(*keys, payload_col).mapInPandas(kernel, schema)


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


def jpeg_payload(text: str, progressive: bool = False) -> bytes:
    """Deterministic REAL baseline-JPEG payload: a 16x16 grayscale JFIF
    whose four 8x8 blocks are constant at md5(text) digest bytes 0-3.
    DC-only blocks with an all-ones quant table decode EXACTLY (see
    sources/jpeg.py), so a SQL oracle can replay the decoded pixels from
    ``md5(text)`` hex — the JPEG analog of ``png_payload``. With
    ``progressive=True`` the same pixels are emitted as a multi-scan
    SOF2 stream (T.81 Annex G successive approximation), which decodes
    to the identical exact values (q232)."""
    import numpy as np

    from ..sources.jpeg import encode_jpeg, encode_jpeg_progressive

    digest = hashlib.md5(text.encode("utf-8")).digest()
    blocks = np.array(
        [[digest[0], digest[1]], [digest[2], digest[3]]], dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    return (encode_jpeg_progressive(img) if progressive
            else encode_jpeg(img))


JPEG_BLOCK_SCHEMA = (
    "doc_id long, width int, height int, b00 int, b01 int, b10 int, b11 int"
)


def decode_jpeg_blocks(df: DataFrame, text_col: str = "text",
                       progressive: bool = False) -> DataFrame:
    """REAL JPEG decode path: each doc's payload is a spec-valid baseline
    JFIF (``jpeg_payload``: Huffman entropy coding, DCT, the works), the
    kernel runs the full decoder (marker parse, Annex-K Huffman decode,
    dequantize, IDCT, level shift) and emits the four 8x8 block values
    (exact, DC-only construction). Value-checked against md5(text) hex
    replay in q211 — the JPEG twin of ``decode_resize_means``/q153. With
    ``progressive=True`` the payloads are multi-scan SOF2 streams and the
    kernel runs the full Annex-G progressive decoder (q232)."""
    from .partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "width", "height", "b00", "b01", "b10", "b11")}
            for doc_id, t in zip(pdf["doc_id"], pdf[text_col]):
                img = decode_image(jpeg_payload(t, progressive))[:, :, 0]
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
    """Perceptual average-hash over the REAL decoded image: bit i set iff
    pixel i is brighter than the image mean — the standard aHash dedup
    fingerprint, downstream of which near-dup matching is JVM-side
    xor/bit_count (same shape as SimHash, q30/q31).

    The payload is a spec-valid Paeth-filtered 4x4 PNG whose pixels are
    the md5 digest bytes (``png_payload``), so the kernel runs the full
    codec path and an external SQL oracle still replays the hash
    bit-for-bit from md5(text) hex (harness q65).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, t in zip(pdf["doc_id"], pdf[text_col]):
                px = decode_image(png_payload(t))[:, :, 0].ravel()
                mean = sum(px) / 16.0
                hashes.append(
                    sum(1 << i for i, b in enumerate(px) if b > mean)
                )
                ids.append(doc_id)
            yield pd.DataFrame({"doc_id": ids, "ahash": hashes})

    return df.select("doc_id", text_col).mapInPandas(kernel, AHASH_SCHEMA)


ENERGY_SCHEMA = "doc_id long, win_idx int, rms double"


def wav_payload(text: str, codec: str = "pcm8", rate: int = 8000) -> bytes:
    """Deterministic REAL RIFF/WAVE payload (``sources/wav.py``):

    * ``pcm8`` — the 16 md5 digest bytes as 8-bit offset-binary PCM
      (decoded sample = byte - 128);
    * ``pcm16`` — 8 samples from digest byte PAIRS
      (``(hi << 8 | lo) - 32768``);
    * ``mulaw`` / ``alaw`` — digest bytes as G.711 companded code words.

    Every variant is a spec-valid container whose decoded samples a SQL
    oracle replays from md5(text) hex (q119/q234/q235)."""
    import numpy as np

    from ..sources.wav import alaw_decode, encode_wav, mulaw_decode

    digest = hashlib.md5(text.encode("utf-8")).digest()
    raw = np.frombuffer(digest, np.uint8)
    if codec == "pcm8":
        return encode_wav(raw, rate)
    if codec == "pcm16":
        s = (raw.astype(np.int64)[0::2] * 256
             + raw.astype(np.int64)[1::2] - 32768).astype(np.int16)
        return encode_wav(s, rate)
    if codec == "mulaw":
        return encode_wav(mulaw_decode(raw), rate, codec="mulaw")
    if codec == "alaw":
        return encode_wav(alaw_decode(raw), rate, codec="alaw")
    raise ValueError(f"unknown wav_payload codec {codec!r}")


def audio_energy(
    df: DataFrame, text_col: str = "text", window: int = 4
) -> DataFrame:
    """Windowed RMS energy over a REAL audio payload: each doc carries a
    spec-valid 8-bit PCM WAV (``wav_payload``), the kernel runs the real
    RIFF/fmt/data parse (``sources/wav.py``) and fans one row out to
    n_samples/window rows — the silence-trim / voice-activity feature a
    speech-corpus pipeline computes before segmentation. Samples are
    digest bytes in offset-binary, so the SQL oracle replays the RMS
    values bit-for-bit (harness q119).
    """
    from ..sources.wav import decode_wav

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, wins, rms = [], [], []
            for doc_id, t in zip(pdf["doc_id"], pdf[text_col]):
                samples, _rate = decode_wav(wav_payload(t))
                samples = [int(s) for s in samples[:, 0]]
                for w0 in range(0, len(samples) // window):
                    chunk = samples[w0 * window : (w0 + 1) * window]
                    e = (sum(s * s for s in chunk) / float(window)) ** 0.5
                    ids.append(doc_id)
                    wins.append(w0)
                    rms.append(round(e, 6))
            yield pd.DataFrame({"doc_id": ids, "win_idx": wins, "rms": rms})

    return df.select("doc_id", text_col).mapInPandas(kernel, ENERGY_SCHEMA)


WAV_DECODE_SCHEMA = ("doc_id long, rate int, n_samples int, "
                     "s0 int, s3 int, s7 int")


def decode_wav_samples(df: DataFrame, text_col: str = "text") -> DataFrame:
    """REAL 16-bit PCM WAV decode: payload = 8 int16 samples built from
    digest byte pairs, kernel runs the full RIFF parse and emits rate +
    probe samples — value-checked against md5-hex replay (q234)."""
    from ..sources.wav import decode_wav
    from .partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "rate", "n_samples", "s0", "s3", "s7")}
            for doc_id, t in zip(pdf["doc_id"], pdf[text_col]):
                samples, rate = decode_wav(wav_payload(t, codec="pcm16"))
                s = samples[:, 0]
                out["doc_id"].append(doc_id)
                out["rate"].append(rate)
                out["n_samples"].append(len(s))
                out["s0"].append(int(s[0]))
                out["s3"].append(int(s[3]))
                out["s7"].append(int(s[7]))
            yield pd.DataFrame(out)

    return df.select("doc_id", text_col).mapInPandas(
        kernel, WAV_DECODE_SCHEMA)


def av_payload(text: str, n_frames: int = 4, size: int = 4) -> bytes:
    """Deterministic REAL audio+video ISO-BMFF payload: a 'vide' track
    of PNG digest frames plus a 'soun' track of 16-bit PCM samples —
    the SAME 8 samples the pcm16 WAV oracle replays (digest byte pairs,
    ``(hi << 8 | lo) - 32768``), one BMFF sample each, multi-chunk
    stsc. The audio decode path of a real multimodal corpus: walk the
    sound track's sample table, slice PCM by byte range (q364)."""
    import struct as _struct

    import numpy as np

    from ..sources.bmff import encode_mp4_tracks
    from ..sources.png import encode_png

    frames = []
    for k in range(n_frames):
        digest = hashlib.md5(f"{text}:{k}".encode("utf-8")).digest()
        need = size * size
        raw = (digest * ((need // len(digest)) + 1))[:need]
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(size, size)
        frames.append(encode_png(arr, filter_type=4))
    digest = hashlib.md5(text.encode("utf-8")).digest()
    raw = np.frombuffer(digest, np.uint8).astype(np.int64)
    pcm = (raw[0::2] * 256 + raw[1::2] - 32768).astype(np.int16)
    audio = [_struct.pack("<h", int(s)) for s in pcm]
    video_plan = [2] * (n_frames // 2) + ([1] if n_frames % 2 else [])
    return encode_mp4_tracks([
        {"samples": frames, "handler": b"vide", "fourcc": "png ",
         "width": size, "height": size, "chunk_plan": video_plan},
        {"samples": audio, "handler": b"soun", "fourcc": "sowt",
         "sample_rate": 8000, "timescale": 8000, "sample_delta": 1,
         "chunk_plan": [3, 3, 2]},
    ])


def decode_av_audio(df: DataFrame, text_col: str = "text") -> DataFrame:
    """REAL mp4 audio-track decode: the kernel walks the 'soun' track's
    sample table (sources/bmff.py), slices the PCM samples by byte
    range, and emits the q234 probe columns — same PCM through the
    container a multimodal corpus actually ships (q364)."""
    import struct as _struct

    from ..sources.bmff import sample_ranges
    from .partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "rate", "n_samples", "s0", "s3", "s7")}
            for doc_id, t in zip(pdf["doc_id"], pdf[text_col]):
                p = av_payload(t)
                tab = sample_ranges(p, b"soun")
                pcm = [_struct.unpack("<h", p[o:o + s])[0]
                       for o, s, _dts in tab["samples"]]
                out["doc_id"].append(doc_id)
                out["rate"].append(tab["timescale"])
                out["n_samples"].append(len(pcm))
                out["s0"].append(pcm[0])
                out["s3"].append(pcm[3])
                out["s7"].append(pcm[7])
            yield pd.DataFrame(out)

    return df.select("doc_id", text_col).mapInPandas(
        kernel, WAV_DECODE_SCHEMA)


def flac_payload(text: str, rate: int = 8000) -> bytes:
    """Deterministic REAL FLAC payload (``sources/flac.py``): the same 8
    int16 samples the pcm16 WAV oracle replays — digest byte pairs,
    ``(hi << 8 | lo) - 32768`` — compressed as a spec-valid FLAC stream
    (two 4-sample frames, fixed predictors + Rice residuals, CRC-8/16,
    STREAMINFO MD5). Decoding must give back the WAV oracle's PCM
    bit-exactly (q361)."""
    import numpy as np

    from ..sources.flac import encode_flac

    digest = hashlib.md5(text.encode("utf-8")).digest()
    raw = np.frombuffer(digest, np.uint8).astype(np.int64)
    s = (raw[0::2] * 256 + raw[1::2] - 32768).astype(np.int16)
    return encode_flac(s, rate=rate, block_size=4)


def decode_flac_samples(df: DataFrame, text_col: str = "text") -> DataFrame:
    """REAL FLAC decode: the full stream parse (STREAMINFO, frame sync,
    subframe predictors, Rice residuals, CRC + MD5 verification) runs in
    the Arrow kernel; probe columns match q234's WAV decode exactly —
    same PCM through a compressed codec (q361)."""
    from ..sources.flac import decode_flac
    from .partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "rate", "n_samples", "s0", "s3", "s7")}
            for doc_id, t in zip(pdf["doc_id"], pdf[text_col]):
                samples, rate = decode_flac(flac_payload(t))
                s = samples[:, 0]
                out["doc_id"].append(doc_id)
                out["rate"].append(rate)
                out["n_samples"].append(len(s))
                out["s0"].append(int(s[0]))
                out["s3"].append(int(s[3]))
                out["s7"].append(int(s[7]))
            yield pd.DataFrame(out)

    return df.select("doc_id", text_col).mapInPandas(
        kernel, WAV_DECODE_SCHEMA)


MULAW_SCHEMA = ("doc_id long, n_samples int, s_sum long, s_min int, "
                "s_max int")


def adpcm_payload(text: str) -> bytes:
    """Deterministic REAL IMA ADPCM WAV payload (format 0x11): one
    20-byte block whose header sample is 0 (step index 0) and whose 16
    nibble bytes are the md5 digest of ``text`` — low nibble first, per
    the WAV-0x11 registration. The decode DP (sources/wav.py bit-shift
    reconstruction) is all-integer, so a SQL oracle replays it as a
    32-step recursive scan over the digest nibbles."""
    import struct

    digest = hashlib.md5(text.encode("utf-8")).digest()
    block = struct.pack("<hBB", 0, 0, 0) + digest  # 4 + 16 = 20 bytes
    spb = 33  # 1 header sample + 32 nibbles
    fmt_body = struct.pack("<HHIIHHHH", 0x11, 1, 8000,
                           8000 * 20 // spb, 20, 4, 2, spb)
    chunks = (b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
              + b"fact" + struct.pack("<II", 4, spb)
              + b"data" + struct.pack("<I", len(block)) + block)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


ADPCM_SCHEMA = ("doc_id long, rate int, n_samples int, "
                "s8 int, s16 int, s32 int, s_sum long")


def decode_adpcm_samples(df: DataFrame, text_col: str = "text") -> DataFrame:
    """REAL IMA ADPCM decode path: each doc's payload is a spec-valid
    WAV-0x11 stream (``adpcm_payload``), the kernel runs the full RIFF
    walk + block-header parse + the 89-entry step-table DP
    (sources/wav.py, bit-exact vs audioop's DVI/IMA implementation) and
    emits probe samples + the exact integer sample sum. q398
    value-checks these against a recursive-CTE replay of the same DP."""
    from .partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.wav import decode_wav

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "rate", "n_samples",
                                   "s8", "s16", "s32", "s_sum")}
            for doc_id, t in zip(pdf["doc_id"], pdf[text_col]):
                samples, rate = decode_wav(adpcm_payload(t))
                x = samples[:, 0].astype(int)
                out["doc_id"].append(doc_id)
                out["rate"].append(rate)
                out["n_samples"].append(len(x))
                out["s8"].append(int(x[8]))
                out["s16"].append(int(x[16]))
                out["s32"].append(int(x[32]))
                out["s_sum"].append(int(x.sum()))
            yield pd.DataFrame(out)

    return df.select("doc_id", text_col).mapInPandas(kernel, ADPCM_SCHEMA)


def decode_mulaw_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """REAL G.711 mu-law expansion: payload = a mu-law WAV whose 16 code
    words are the digest bytes; the kernel decodes through the real
    RIFF parse + companding tables and emits sum/min/max of the linear
    samples. The G.711 expansion is closed-form integer math, so the
    SQL oracle replays it exactly (q235)."""
    from ..sources.wav import decode_wav
    from .partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "n_samples", "s_sum", "s_min", "s_max")}
            for doc_id, t in zip(pdf["doc_id"], pdf[text_col]):
                samples, _ = decode_wav(wav_payload(t, codec="mulaw"))
                s = samples[:, 0].astype(int)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(s))
                out["s_sum"].append(int(s.sum()))
                out["s_min"].append(int(s.min()))
                out["s_max"].append(int(s.max()))
            yield pd.DataFrame(out)

    return df.select("doc_id", text_col).mapInPandas(kernel, MULAW_SCHEMA)


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


TRANSCODE_SCHEMA = (
    "doc_id long, b00 int, b01 int, b10 int, b11 int, lossless int"
)


def transcode_png_jpeg(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Full FORMAT-TRANSCODE chain, every stage a real codec: build a
    16x16 block-constant PNG (Paeth-filtered, sources/png.py), DECODE
    it, re-ENCODE the decoded pixels as baseline JPEG (unit quant table
    — DC-only blocks are exact, sources/jpeg.py), decode THAT, and emit
    the four block values plus an in-kernel lossless flag (png pixels
    == jpeg pixels elementwise). The pipeline a multimodal corpus
    conversion job runs (normalize heterogenous inputs to one format),
    proven bit-exact end-to-end; the oracle replays the block values
    from md5(text) hex (q261). Arrow-batched mapInPandas, one pass.
    """
    import numpy as np

    from ..sources.jpeg import decode_jpeg, encode_jpeg
    from ..sources.png import decode_png, encode_png
    from .partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "b00", "b01", "b10", "b11", "lossless")}
            for doc_id, t in zip(pdf["doc_id"], pdf[text_col]):
                digest = hashlib.md5(t.encode("utf-8")).digest()
                blocks = np.array([[digest[0], digest[1]],
                                   [digest[2], digest[3]]], dtype=np.uint8)
                img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
                png_px = decode_png(encode_png(img, filter_type=4))[:, :, 0]
                jpg_px = decode_jpeg(encode_jpeg(png_px))
                if jpg_px.ndim == 3:
                    jpg_px = jpg_px[:, :, 0]
                out["doc_id"].append(doc_id)
                out["b00"].append(int(jpg_px[0, 0]))
                out["b01"].append(int(jpg_px[0, 8]))
                out["b10"].append(int(jpg_px[8, 0]))
                out["b11"].append(int(jpg_px[8, 8]))
                out["lossless"].append(
                    int(bool((png_px == jpg_px).all())))
            yield pd.DataFrame(out)

    return df.select("doc_id", text_col).mapInPandas(
        kernel, TRANSCODE_SCHEMA)


ZCR_SCHEMA = ("doc_id long, n_samples int, zcr int, peak int, "
              "mean_abs double")


def audio_zcr(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Zero-crossing rate + peak + mean absolute amplitude per doc over
    a REAL 8-bit PCM WAV payload — the voiced/unvoiced + clipping
    screen a speech-corpus pipeline runs before transcription. The
    kernel runs the real RIFF parse (``sources/wav.py``); every output
    is integer-exact (crossing = sign-bit change over adjacent samples
    with zero counted non-negative; mean_abs divides an exact integer
    sum by 16, a power of two), so the SQL oracle replays the values
    bit-for-bit from the digest bytes.
    """
    from ..sources.wav import decode_wav
    from .partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "n_samples", "zcr", "peak", "mean_abs")}
            for doc_id, t in zip(pdf["doc_id"], pdf[text_col]):
                samples, _rate = decode_wav(wav_payload(t))
                s = [int(v) for v in samples[:, 0]]
                zcr = sum(
                    1 for a, b in zip(s, s[1:]) if (a < 0) != (b < 0))
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(s))
                out["zcr"].append(zcr)
                out["peak"].append(max(abs(v) for v in s))
                out["mean_abs"].append(sum(abs(v) for v in s) / len(s))
            yield pd.DataFrame(out)

    return df.select("doc_id", text_col).mapInPandas(kernel, ZCR_SCHEMA)


DECIM_SCHEMA = ("doc_id long, n_in int, n_out int, "
                "y0 long, y1 long, y2 long, y3 long")


def audio_decimate(df: DataFrame, factor: int = 4,
                   text_col: str = "text") -> DataFrame:
    """Boxcar-sum decimation by ``factor`` over the REAL 8-bit PCM WAV
    payload — the anti-aliased downsample a speech pipeline applies
    before feature extraction. Each output sample is the EXACT integer
    sum of ``factor`` consecutive input samples (the moving-average
    anti-alias filter with the division deliberately left out: signed
    integer division rounds differently across engines, a plain sum is
    bit-portable). One-to-one Arrow kernel over the RIFF parse
    (``sources/wav.py``) — map-only, no shuffle.
    """
    from ..sources.wav import decode_wav
    from .partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "n_in", "n_out", "y0", "y1", "y2", "y3")}
            for doc_id, t in zip(pdf["doc_id"], pdf[text_col]):
                samples, _rate = decode_wav(wav_payload(t))
                s = [int(v) for v in samples[:, 0]]
                n_out = len(s) // factor
                y = [sum(s[k * factor:(k + 1) * factor])
                     for k in range(n_out)]
                out["doc_id"].append(doc_id)
                out["n_in"].append(len(s))
                out["n_out"].append(n_out)
                for i in range(4):
                    out[f"y{i}"].append(y[i] if i < n_out else 0)
            yield pd.DataFrame(out)

    return df.select("doc_id", text_col).mapInPandas(kernel, DECIM_SCHEMA)

"""Pure-Python WAV (RIFF/WAVE) codec + ITU-T G.711 companding — the
audio analog of ``sources/png.py`` / ``sources/jpeg.py``: the formats
are public (RIFF WAVE from the Microsoft/IBM 1991 spec, G.711 from the
ITU-T recommendation), so implement them from the spec instead of
gating the audio family on a codec library.

Scope: PCM 8-bit unsigned / 16-bit signed little-endian (format 1),
G.711 mu-law (format 7) and A-law (format 6), mono or interleaved
multichannel, standard ``fmt ``/``data`` chunk walk (unknown chunks
skipped, as the spec requires). Compressed formats (MP3/AAC/FLAC)
remain honestly out of scope.

Decoded samples are always int16 (the G.711 reference decode tables
land in int16 range; 8-bit PCM is offset-binary, decoded as
``byte - 128`` in the 8-bit domain — kept at its native scale so
feature oracles replay it from digest bytes directly).

The reference shells out to GDAL and has no audio path; this module
exists for the training-data pipeline surface (speech-corpus
featurization), same rationale as the image codecs.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM, _FMT_ALAW, _FMT_MULAW = 1, 6, 7


def mulaw_decode(b: np.ndarray) -> np.ndarray:
    """G.711 mu-law byte -> linear int16 (the standard table formula:
    complement, then magnitude = ((2m + 33) << e) - 33 in 14-bit domain,
    scaled x4 into int16 like the reference decode tables)."""
    u = 255 - np.asarray(b, np.int64)  # transmitted complemented
    sign = (u & 0x80) != 0
    e = (u >> 4) & 0x07
    m = u & 0x0F
    mag = (((2 * m + 33) << e) - 33) * 4
    return np.where(sign, -mag, mag).astype(np.int16)


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """Linear int16 -> G.711 mu-law byte (closed-form segment search)."""
    x = np.asarray(x, np.int64)
    sign = x < 0
    mag = np.minimum(np.abs(x) // 4, 8158)  # 14-bit domain, clip
    mag = mag + 33
    e = np.floor(np.log2(mag)).astype(np.int64) - 5
    e = np.clip(e, 0, 7)
    m = (mag >> (e + 1)) & 0x0F
    u = (np.where(sign, 0x80, 0) | (e << 4) | m).astype(np.int64)
    return (255 - u).astype(np.uint8)


def alaw_decode(b: np.ndarray) -> np.ndarray:
    """G.711 A-law byte -> linear int16 (even-bit inversion 0x55, then
    the chord/step expansion, scaled x8 into int16). Per ITU-T G.711
    (and reference g711.c) the sign bit is SET for positive samples,
    so standard silence 0xD5 decodes to 0."""
    a = np.asarray(b, np.int64) ^ 0x55
    neg = (a & 0x80) == 0
    e = (a >> 4) & 0x07
    m = a & 0x0F
    mag = np.where(e == 0, 2 * m + 1, (2 * m + 33) << (e - 1)) * 8
    return np.where(neg, -mag, mag).astype(np.int16)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """Linear int16 -> G.711 A-law byte (sign bit = 1 for positive,
    matching G.711: silence encodes to the standard 0xD5)."""
    x = np.asarray(x, np.int64)
    sign = x < 0
    mag = np.minimum(np.abs(x) // 8, 4095)  # 12-bit domain
    e = np.maximum(np.floor(np.log2(np.maximum(mag, 1))).astype(np.int64) - 4, 0)
    m = np.where(e == 0, mag >> 1, (mag >> e) & 0x0F)
    a = (np.where(sign, 0, 0x80) | (e << 4) | m).astype(np.int64)
    return (a ^ 0x55).astype(np.uint8)


def encode_wav(
    samples: np.ndarray, rate: int = 8000, codec: str = "pcm"
) -> bytes:
    """Encode samples to WAV bytes.

    ``samples``: (n,) or (n, channels); uint8 (stored as PCM8) or int16
    (stored as PCM16 LE, or companded when ``codec`` is 'mulaw'/'alaw').
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if codec == "pcm":
        if arr.dtype == np.uint8:
            fmt, bits, payload = _FMT_PCM, 8, arr.astype("u1").tobytes()
        elif arr.dtype == np.int16:
            fmt, bits, payload = _FMT_PCM, 16, arr.astype("<i2").tobytes()
        else:
            raise ValueError(f"pcm needs uint8/int16, got {arr.dtype}")
    elif codec == "mulaw":
        fmt, bits = _FMT_MULAW, 8
        payload = mulaw_encode(arr.astype(np.int64)).astype("u1").tobytes()
    elif codec == "alaw":
        fmt, bits = _FMT_ALAW, 8
        payload = alaw_encode(arr.astype(np.int64)).astype("u1").tobytes()
    else:
        raise ValueError(f"unknown codec {codec!r}")
    block = ch * bits // 8
    fmt_body = struct.pack("<HHIIHH", fmt, ch, rate, rate * block, block,
                           bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
              + b"data" + struct.pack("<I", len(payload)) + payload
              + (b"\x00" if len(payload) % 2 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes -> ((n, channels) int16 samples, sample_rate).

    8-bit PCM decodes at its native scale (``byte - 128``); G.711
    payloads expand through the mu-law/A-law tables.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            payload = body
        pos += 8 + length + (length % 2)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    ftype, ch, rate, _brate, _block, bits = fmt
    if ftype == _FMT_PCM and bits == 16:
        out = np.frombuffer(payload, "<i2").astype(np.int16)
    elif ftype == _FMT_PCM and bits == 8:
        out = (np.frombuffer(payload, "u1").astype(np.int64) - 128) \
            .astype(np.int16)
    elif ftype == _FMT_MULAW and bits == 8:
        out = mulaw_decode(np.frombuffer(payload, "u1"))
    elif ftype == _FMT_ALAW and bits == 8:
        out = alaw_decode(np.frombuffer(payload, "u1"))
    else:
        raise ValueError(
            f"unsupported WAVE format {ftype} / {bits}-bit (PCM 8/16, "
            "G.711 mu-law/A-law supported; compressed audio is out of "
            "scope)")
    return out.reshape(-1, ch), rate

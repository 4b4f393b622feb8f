"""IMA ADPCM (WAV format 0x11) tests — sources/wav.py.

The decode DP is cross-validated against CPython's audioop (the DVI/IMA
implementation shipped with the stdlib through 3.12) when available,
and the encoder against audioop's lin2adpcm; both match nibble-exactly.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gfw_pixetl_spark.sources.wav import (
    decode_wav,
    encode_wav,
    ima_decode_nibbles,
    ima_encode_samples,
)

try:
    import audioop

    HAVE_AUDIOOP = True
except ImportError:  # removed in Python 3.13
    HAVE_AUDIOOP = False


@pytest.mark.skipif(not HAVE_AUDIOOP, reason="audioop removed")
@given(st.lists(st.integers(0, 15), min_size=2, max_size=400))
@settings(max_examples=50, deadline=None)
def test_decode_matches_audioop(nibs):
    if len(nibs) % 2:
        nibs = nibs[:-1]
    packed = bytes((nibs[i] << 4) | nibs[i + 1]
                   for i in range(0, len(nibs), 2))
    ref = np.frombuffer(audioop.adpcm2lin(packed, 2, None)[0], "<i2")
    mine = ima_decode_nibbles(nibs, 0, 0)
    assert np.array_equal(ref, mine)


@pytest.mark.skipif(not HAVE_AUDIOOP, reason="audioop removed")
@given(st.lists(st.integers(-32768, 32767), min_size=2, max_size=400))
@settings(max_examples=50, deadline=None)
def test_encode_matches_audioop(samples):
    x = np.asarray(samples, np.int16)
    enc = audioop.lin2adpcm(x.tobytes(), 2, None)[0]
    ref = []
    for b in enc:
        ref += [b >> 4, b & 0xF]
    mine, _, _ = ima_encode_samples(x, 0, 0)
    assert len(mine) == len(x)
    # audioop holds an odd trailing nibble in its state, not the output
    assert mine[: len(ref)] == ref


def test_wav_round_trip_length_and_bound():
    """fact-chunk truncation recovers the exact sample count; the lossy
    reconstruction stays bounded once the quantizer has adapted."""
    x = (np.sin(np.arange(3001) / 9.0) * 9000).astype(np.int16)
    data = encode_wav(x, rate=16000, codec="ima")
    y, rate = decode_wav(data)
    assert rate == 16000
    assert y.shape == (3001, 1)
    err = np.abs(y[505:, 0].astype(int) - x[505:].astype(int))
    assert err.max() < 2000  # adapted-steady-state bound for this signal


def test_block_headers_restate_state():
    """Each 505-sample block stores its first sample verbatim — block
    boundaries decode exactly, the random-access property."""
    x = (np.linspace(-20000, 20000, 1515)).astype(np.int16)
    data = encode_wav(x, codec="ima")
    y, _ = decode_wav(data)
    for k in (0, 505, 1010):
        assert int(y[k, 0]) == int(x[k])


def test_encode_rejects_stereo_and_wrong_dtype():
    with pytest.raises(ValueError):
        encode_wav(np.zeros((8, 2), np.int16), codec="ima")
    with pytest.raises(ValueError):
        encode_wav(np.zeros(8, np.uint8), codec="ima")


def test_decode_validates_block_consistency():
    x = np.zeros(505, np.int16)
    data = bytearray(encode_wav(x, codec="ima"))
    # corrupt wSamplesPerBlock in the fmt extension
    fmt_pos = data.index(b"fmt ")
    struct.pack_into("<H", data, fmt_pos + 8 + 18, 999)
    with pytest.raises(ValueError):
        decode_wav(bytes(data))


def test_decode_rejects_bad_step_index():
    x = np.zeros(505, np.int16)
    data = bytearray(encode_wav(x, codec="ima"))
    data_pos = data.index(b"data")
    data[data_pos + 8 + 2] = 97  # block header step index > 88
    with pytest.raises(ValueError):
        decode_wav(bytes(data))


def test_adpcm_payload_kernel_shape():
    from gfw_pixetl_spark.functions.multimodal import adpcm_payload

    samples, rate = decode_wav(adpcm_payload("abc"))
    assert rate == 8000
    assert samples.shape == (33, 1)
    assert int(samples[0, 0]) == 0  # header sample

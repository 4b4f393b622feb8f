"""Snappy raw-block codec tests — sources/snappy.py, cross-validated
against the reference snappy bundled in pyarrow both directions."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gfw_pixetl_spark.sources.snappy import compress, decompress

try:
    import pyarrow as pa

    _REF = pa.Codec("snappy")
except Exception:  # pragma: no cover
    _REF = None


_DATA = st.one_of(
    st.binary(max_size=2000),
    st.builds(lambda s, n: (s * n)[:3000],
              st.binary(min_size=1, max_size=30), st.integers(1, 400)),
)


@given(_DATA)
@settings(max_examples=120, deadline=None)
def test_our_decoder_reads_reference_streams(data):
    if _REF is None:
        pytest.skip("pyarrow snappy unavailable")
    assert decompress(bytes(_REF.compress(data))) == data


@given(_DATA)
@settings(max_examples=120, deadline=None)
def test_reference_reads_our_streams(data):
    enc = compress(data)
    assert decompress(enc) == data
    if _REF is not None:
        assert bytes(_REF.decompress(enc, len(data))) == data


def test_compresses_repetitive_text():
    data = b"the quick brown fox jumps over the lazy dog " * 200
    assert len(compress(data)) < len(data) // 10


def test_overlapping_copy_replicates():
    # RLE via an offset-1 copy: the defining overlapping-copy case
    data = b"a" * 500
    enc = compress(data)
    assert decompress(enc) == data
    assert len(enc) < 30


def test_errors():
    with pytest.raises(ValueError):
        decompress(b"")  # truncated length varint
    with pytest.raises(ValueError):
        decompress(b"\x0a\x00")  # says 10 bytes, delivers none... (literal overrun)
    good = compress(b"hello world hello world hello world")
    with pytest.raises(ValueError):
        decompress(good[:-2])  # truncated stream
    # copy offset beyond output start
    bad = b"\x04" + bytes([1]) + b"x" + bytes([(3 << 2) | 2]) + b"\xff\x00"
    with pytest.raises(ValueError):
        decompress(bad)

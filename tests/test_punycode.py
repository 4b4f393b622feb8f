"""Punycode/IDNA tests — functions/punycode.py, pinned to the RFC 3492
section 7.1 sample vectors and cross-validated against CPython's
built-in punycode codec."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gfw_pixetl_spark.functions.punycode import (
    idna_decode_host,
    idna_encode_host,
    punycode_decode,
    punycode_encode,
)

RFC_7_1 = {
    "bücher": "bcher-kva",
    "münchen": "mnchen-3ya",
    "ليهمابتكلموشعربي؟": "egbpdaj6bu4bxfgehfvwxn",
    "他们为什么不说中文": "ihqwcrb4cv8a8dqg056pqjye",
    "Pročprostěnemluvíčesky": "Proprostnemluvesky-uyb24dma41a",
    "Hello-Another-Way-それぞれの場所":
        "Hello-Another-Way--fc4qua05auwb3674vfr0b",
    "3年B組金八先生": "3B-ww4c5e180e575a65lsy2b",
}


def test_rfc3492_sample_vectors():
    for unicode_form, ace in RFC_7_1.items():
        assert punycode_encode(unicode_form) == ace
        assert punycode_decode(ace) == unicode_form


_ALPHABET = st.sampled_from(list("abcz019-éüßñçαβжд中文水あア"))


@given(st.lists(_ALPHABET, min_size=1, max_size=24))
@settings(max_examples=200, deadline=None)
def test_matches_cpython_codec(chars):
    s = "".join(chars)
    ref = s.encode("punycode").decode("ascii")
    assert punycode_encode(s) == ref
    assert punycode_decode(ref) == s


def test_idna_host_round_trip():
    host = "bücher.müller.example.com"
    ace = idna_encode_host(host)
    assert ace == "xn--bcher-kva.xn--mller-kva.example.com"
    assert idna_decode_host(ace) == host
    # pure-ASCII hosts pass through untouched
    assert idna_encode_host("plain.example.com") == "plain.example.com"


def test_decode_errors():
    with pytest.raises(ValueError):
        punycode_decode("abc-!!")     # invalid digit
    with pytest.raises(ValueError):
        punycode_decode("abc-kv")     # truncated integer tail is fine?
    with pytest.raises(ValueError):
        punycode_decode("bü-kva")     # non-basic in literal portion

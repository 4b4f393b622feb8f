"""mbox/MIME codec tests — sources/mbox.py, cross-validated against
CPython's `email` package and `quopri` (independent implementations of
the same RFCs)."""

from __future__ import annotations

import base64
import email
import email.header
import quopri

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gfw_pixetl_spark.sources.mbox import (
    decode_header_value,
    encode_word,
    iter_mbox,
    parse_message,
    qp_decode,
    qp_encode,
    write_mbox,
)


@given(st.binary(max_size=400))
@settings(max_examples=60, deadline=None)
def test_qp_round_trip_and_quopri_agrees(data):
    enc = qp_encode(data)
    assert qp_decode(enc) == data
    assert quopri.decodestring(enc) == data
    # encoded form is 7-bit clean with bounded lines
    assert all(b < 128 for b in enc)
    for line in enc.split(b"\n"):
        assert len(line) <= 76


@given(st.text(min_size=1, max_size=40), st.sampled_from(["B", "Q"]),
       st.sampled_from(["utf-8", "latin-1"]))
@settings(max_examples=60, deadline=None)
def test_encoded_word_round_trip(text, enc, charset):
    try:
        text.encode(charset)
    except UnicodeEncodeError:
        return
    word = encode_word(text, charset, enc)
    assert decode_header_value(word) == text
    # stdlib agrees
    (raw, cs), = email.header.decode_header(word)
    assert raw.decode(cs) == text


def test_adjacent_encoded_words_elide_space():
    w1 = encode_word("ab", "utf-8", "B")
    w2 = encode_word("cd", "utf-8", "Q")
    assert decode_header_value(f"{w1} {w2}") == "abcd"
    assert decode_header_value(f"x {w1} y") == f"x ab y"


def _mime_msg(text: str, att: bytes) -> bytes:
    subject = encode_word(text[:10], "utf-8", "B")
    return (
        f"From: a@x\r\nSubject: {subject}\r\nMIME-Version: 1.0\r\n"
        f'Content-Type: multipart/mixed; boundary="XY"\r\n\r\n'
        f"preamble\r\n--XY\r\n"
        f"Content-Type: text/plain; charset=utf-8\r\n"
        f"Content-Transfer-Encoding: quoted-printable\r\n\r\n"
    ).encode() + qp_encode(text.encode()) + (
        b"\r\n--XY\r\n"
        b'Content-Type: application/pdf; name="f.pdf"\r\n'
        b"Content-Transfer-Encoding: base64\r\n\r\n"
    ) + base64.encodebytes(att) + b"--XY--\r\nepilogue\r\n"


@given(st.text(min_size=1, max_size=120), st.binary(max_size=64))
@settings(max_examples=40, deadline=None)
def test_mime_parse_matches_stdlib(text, att):
    msg = _mime_msg(text, att)
    m = parse_message(msg)
    em = email.message_from_bytes(msg)
    assert len(m["parts"]) == 2
    assert m["parts"][0]["payload"] == \
        em.get_payload(0).get_payload(decode=True)
    assert m["parts"][0]["payload"].decode() == text
    assert m["parts"][1]["payload"] == att
    assert m["parts"][1]["params"]["name"] == "f.pdf"


def test_nested_multipart_flattens_depth_first():
    inner = (
        b'Content-Type: multipart/alternative; boundary="IN"\r\n\r\n'
        b"--IN\r\nContent-Type: text/plain\r\n\r\nplain\r\n"
        b"--IN\r\nContent-Type: text/html\r\n\r\n<b>html</b>\r\n"
        b"--IN--\r\n"
    )
    msg = (
        b'Content-Type: multipart/mixed; boundary="OUT"\r\n\r\n'
        b"--OUT\r\n" + inner + b"--OUT\r\n"
        b"Content-Type: text/plain\r\n\r\ntail\r\n--OUT--\r\n"
    )
    m = parse_message(msg)
    assert [p["type"] for p in m["parts"]] == [
        "text/plain", "text/html", "text/plain"]
    assert m["parts"][0]["payload"] == b"plain"
    assert m["parts"][1]["payload"] == b"<b>html</b>"
    assert m["parts"][2]["payload"] == b"tail"


def test_folded_headers_unfold():
    msg = (b"Subject: a long\r\n  folded subject\r\n"
           b"X-Other: v\r\n\r\nbody")
    m = parse_message(msg)
    assert m["subject"] == "a long folded subject"


def test_mbox_from_quoting_round_trip():
    bodies = [
        b"Subject: one\r\n\r\nFrom the start\n>From quoted already\nmid\n",
        b"Subject: two\r\n\r\nplain\n",
    ]
    back = iter_mbox(write_mbox(bodies))
    assert len(back) == 2
    p = parse_message(back[0])
    assert p["parts"][0]["payload"] == \
        b"From the start\n>From quoted already\nmid\n"
    # stdlib mailbox-style split agrees on message count
    data = write_mbox(bodies)
    assert data.count(b"\nFrom mbox@") == 1  # only real separators


def test_mbox_errors_and_edges():
    assert iter_mbox(b"") == []
    with pytest.raises(ValueError):
        iter_mbox(b"not an mbox")
    with pytest.raises(ValueError):
        parse_message(b'Content-Type: multipart/mixed\r\n\r\nbody')
    with pytest.raises(ValueError):
        parse_message(
            b"Content-Transfer-Encoding: uuencode\r\n\r\nbody")


def test_boundary_substring_inside_body_does_not_split():
    """RFC 2046: the delimiter only counts at a line START; a body line
    containing '--BOUNDARY' mid-line must stay one part (round-7
    review finding)."""
    body = b"see the flag --XY in the middle of this line\r\nmore"
    msg = (b'Content-Type: multipart/mixed; boundary="XY"\r\n\r\n'
           b"--XY\r\nContent-Type: text/plain\r\n\r\n" + body
           + b"\r\n--XY--\r\n")
    m = parse_message(msg)
    em = email.message_from_bytes(msg)
    assert len(m["parts"]) == 1
    assert m["parts"][0]["payload"] == \
        em.get_payload(0).get_payload(decode=True)


def test_trailing_body_newlines_preserved():
    body = b"line one\nline two\n\n"
    msg = (b'Content-Type: multipart/mixed; boundary="ZZ"\r\n\r\n'
           b"--ZZ\r\nContent-Type: text/plain\r\n\r\n" + body
           + b"\r\n--ZZ--\r\n")
    m = parse_message(msg)
    em = email.message_from_bytes(msg)
    assert m["parts"][0]["payload"] == \
        em.get_payload(0).get_payload(decode=True) == body

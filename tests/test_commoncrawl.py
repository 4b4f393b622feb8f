"""Common Crawl sidecar formats (sources/commoncrawl.py): SURT keys,
CDXJ build/parse/ranged-fetch against real per-member-gzip WARCs, and
WET/WAT records consumed back through the ordinary WARC reader."""

from __future__ import annotations

import json

import pytest

from gfw_pixetl_spark.sources.commoncrawl import (
    build_cdxj, parse_cdxj_line, payload_digest, ranged_fetch, surt,
    wat_envelope, wat_record, wet_record,
)
from gfw_pixetl_spark.sources.warc import (
    http_response_bytes, iter_warc, parse_http_response, write_warc,
)


@pytest.mark.parametrize("url,expected", [
    ("https://www.Example.org/A/b?b=2&a=1", "org,example)/A/b?a=1&b=2"),
    ("http://example.com/", "com,example)/"),
    ("http://example.com", "com,example)/"),
    ("https://sub.domain.co.uk/path", "uk,co,domain,sub)/path"),
    ("http://example.com:8080/x", "com,example:8080)/x"),
    ("http://example.com:80/x", "com,example)/x"),
    ("https://example.com:443/x", "com,example)/x"),
    ("https://www.example.com/p?z=1#frag", "com,example)/p?z=1"),
    ("https://example.com/p?single", "com,example)/p?single"),
])
def test_surt(url, expected):
    assert surt(url) == expected


def _fixture_warc() -> bytes:
    return write_warc([
        {"type": "response", "uri": "https://www.example.org/doc/1",
         "payload": http_response_bytes(b"<p>one</p>")},
        {"type": "response", "uri": "https://www.example.org/doc/2",
         "payload": http_response_bytes(b"<p>two</p>", status=404)},
    ])


def test_cdxj_build_sorted_and_complete():
    blob = _fixture_warc()
    lines = build_cdxj(blob, "f.warc.gz")
    assert len(lines) == 2                     # warcinfo not indexed
    assert lines == sorted(lines)
    entries = [parse_cdxj_line(ln) for ln in lines]
    assert [e["key"] for e in entries] == [
        "org,example)/doc/1", "org,example)/doc/2"]
    assert {e["status"] for e in entries} == {"200", "404"}
    assert all(e["mime"] == "text/html" for e in entries)


def test_cdxj_ranged_fetch_digest_roundtrip():
    blob = _fixture_warc()
    for ln in build_cdxj(blob, "f.warc.gz"):
        e = parse_cdxj_line(ln)
        headers, payload = ranged_fetch(
            blob, int(e["offset"]), int(e["length"]))
        assert headers["WARC-Target-URI"] == e["url"]
        assert payload_digest(payload) == e["digest"]
        status, _hh, body = parse_http_response(payload)
        assert status == int(e["status"])
        assert body in (b"<p>one</p>", b"<p>two</p>")


def test_payload_digest_shape():
    d = payload_digest(b"abc")
    assert d.startswith("sha1:") and len(d) == 5 + 32


def test_wet_wat_records_read_back_through_warc_reader():
    import gzip
    import io

    env = wat_envelope({"WARC-Type": "response"}, 200,
                       {"content-type": "text/html"},
                       "A Title", ["https://x/1", "https://x/2"])
    chunks = [
        wet_record("https://example.org/p", "visible text",
                   refers_to="<urn:uuid:abc>", seq=1),
        wat_record("https://example.org/p", env,
                   refers_to="<urn:uuid:abc>", seq=2),
    ]
    out = io.BytesIO()
    for c in chunks:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
            g.write(c)
        out.write(buf.getvalue())
    seen = {}
    for headers, payload in iter_warc(out.getvalue()):
        seen[headers["WARC-Type"]] = (headers, payload)
    assert seen["conversion"][1] == b"visible text"
    assert seen["conversion"][0]["WARC-Refers-To"] == "<urn:uuid:abc>"
    meta = json.loads(seen["metadata"][1])["Envelope"]
    resp = meta["Payload-Metadata"]["HTTP-Response-Metadata"]
    assert resp["Response-Message"]["Status"] == 200
    assert resp["HTML-Metadata"]["Head"]["Title"] == "A Title"
    assert len(resp["HTML-Metadata"]["Links"]) == 2


def test_cdxj_entry_json_is_sorted_and_stable():
    blob = _fixture_warc()
    line = build_cdxj(blob, "f.warc.gz")[0]
    _key, _ts, payload = line.split(" ", 2)
    entry = json.loads(payload)
    assert list(entry) == sorted(entry)
    # rebuilding yields byte-identical lines (deterministic index)
    assert build_cdxj(blob, "f.warc.gz")[0] == line

"""WARC container (sources/warc.py) and HTML text extraction
(functions/html.py)."""

import gzip

import pytest

from gfw_pixetl_spark.functions.html import extract_text
from gfw_pixetl_spark.sources.warc import (
    http_response_bytes, iter_warc, member_index, parse_http_response,
    write_warc,
)

# ---------------------------------------------------------------- WARC


def _one_response(body=b"hello world", status=200, gz=True):
    return write_warc([{
        "type": "response", "uri": "https://example.org/x",
        "payload": http_response_bytes(body, status=status),
    }], gzip_members=gz)


def test_warc_roundtrip_gzip_members():
    warc = _one_response()
    idx = member_index(warc)
    assert len(idx) == 2  # warcinfo + response
    # offsets tile the file exactly
    assert idx[0][0] == 0
    assert idx[0][0] + idx[0][1] == idx[1][0]
    assert idx[1][0] + idx[1][1] == len(warc)
    recs = list(iter_warc(warc))
    assert [h["WARC-Type"] for h, _ in recs] == ["warcinfo", "response"]
    status, headers, body = parse_http_response(recs[1][1])
    assert (status, body) == (200, b"hello world")
    assert headers["content-type"] == "text/html"
    assert recs[1][0]["WARC-Target-URI"] == "https://example.org/x"


def test_warc_member_is_independently_inflatable():
    """The Common Crawl property: one record = one ranged GET + one
    gunzip, no other bytes needed."""
    warc = _one_response(body=b"standalone")
    off, size = member_index(warc)[1]
    raw = gzip.decompress(warc[off:off + size])
    recs = list(iter_warc(raw))
    assert len(recs) == 1
    _, _, body = parse_http_response(recs[0][1])
    assert body == b"standalone"


def test_warc_uncompressed_and_binary_payload():
    payload = bytes(range(256)) * 3
    warc = write_warc(
        [{"type": "resource", "uri": "u", "payload": payload,
          "content_type": "application/octet-stream"}],
        gzip_members=False)
    recs = list(iter_warc(warc))
    assert recs[1][1] == payload
    assert recs[1][0]["Content-Length"] == str(len(payload))


def test_warc_errors():
    with pytest.raises(ValueError, match="bad WARC version"):
        list(iter_warc(b"NOPE/1.1\r\n\r\n"))
    warc = _one_response(gz=False)
    with pytest.raises(ValueError, match="truncated"):
        list(iter_warc(warc[:-30]))
    with pytest.raises(ValueError, match="gzip member"):
        member_index(b"plainbytes")


def test_http_statuses():
    for status in (200, 301, 404, 503):
        st, _, _ = parse_http_response(
            http_response_bytes(b"x", status=status))
        assert st == status
    with pytest.raises(ValueError, match="bad HTTP status"):
        parse_http_response(b"GET / HTTP/1.1\r\n\r\n")


# ---------------------------------------------------------------- HTML


def test_extract_basic_and_drops():
    html = ("<html><head><title>T</title><script>var x='<p>';</script>"
            "</head><body><h1>H</h1><p>body text</p>"
            "<style>.a{}</style><!-- no --></body></html>")
    text, n, links = extract_text(html)
    assert text == "T H body text"
    assert n == len(text) and links == 0


def test_extract_entities_and_links():
    html = '<p>A&amp;B &#65; &#x42;</p><a href="/x">my link</a>'
    text, n, links = extract_text(html)
    assert text == "A&B A B my link"
    assert links == len("my link")


def test_nested_and_self_closing_links():
    html = '<a href="/x">one <b>two</b></a><a href="/y"/>after'
    text, _, links = extract_text(html)
    assert text == "one two after"
    assert links == len("one") + len("two")  # self-closed <a/> adds none


def test_whitespace_collapse_and_unterminated():
    text, n, _ = extract_text("a\n\n  b\t<br>c<unclosed")
    assert text == "a b c"
    bad = extract_text("<p>x&zzz; &#xGG;</p>")[0]
    assert bad == "x&zzz; &#xGG;"  # unknown entities pass through


def test_link_density_kernel(spark):
    from gfw_pixetl_spark.functions.html import html_extract

    df = spark.createDataFrame(
        [(1, '<p>abcd</p><a href="/">ef</a>'), (2, "<p></p>")],
        "doc_id long, html string")
    got = {r.doc_id: (r.text, r.n_chars, r.link_chars, r.link_density)
           for r in html_extract(df).collect()}
    assert got[1] == ("abcd ef", 7, 2, round(2 / 7, 6))
    assert got[2] == ("", 0, 0, 0.0)


def test_record_ids_unique_for_equal_length_payloads():
    warc = write_warc([
        {"type": "response", "uri": "a", "payload": http_response_bytes(b"xx")},
        {"type": "response", "uri": "b", "payload": http_response_bytes(b"xx")},
    ], gzip_members=False)
    ids = [h["WARC-Record-ID"] for h, _ in iter_warc(warc)]
    assert len(ids) == len(set(ids)) == 3


def test_script_body_with_angle_brackets():
    """HTML5 raw-text rule: '<' inside a script body is NOT markup —
    the rest of the document must survive."""
    html = "<p>keep</p><script>if(a<b)x();</script><p>also kept</p>"
    text, _, _ = extract_text(html)
    assert text == "keep also kept"
    # unterminated raw-text element drops to EOF, not beyond
    assert extract_text("<p>k</p><style>.a{")[0] == "k"
    # close tag with attributes/case still terminates the drop
    html = "<SCRIPT>a<b</ScRiPt ></p>tail"
    assert extract_text(html)[0] == "tail"


def test_member_index_linear_bounded_chunks():
    """ADVICE r5: member boundary discovery feeds zlib bounded chunks
    (stop at d.eof) instead of the whole remaining tail — otherwise
    unused_data materializes a tail copy per member, O(members x tail).
    Probe: time member_index at two member counts; the per-member cost
    must stay flat (quadratic would blow the generous 8x gate)."""
    import time

    def archive(n):
        return write_warc([
            {"uri": f"http://e.com/{i}",
             "payload": http_response_bytes(b"x" * 200)}
            for i in range(n)
        ], gzip_members=True)

    a1, a2 = archive(300), archive(3000)
    t0 = time.perf_counter(); idx1 = member_index(a1)
    t1 = time.perf_counter(); idx2 = member_index(a2)
    t2 = time.perf_counter()
    assert len(idx1) == 301 and len(idx2) == 3001
    per1 = (t1 - t0) / len(idx1)
    per2 = (t2 - t1) / len(idx2)
    assert per2 < per1 * 8 + 1e-4  # flat per-member cost, not linear-in-N
    # boundaries still exact: offsets+sizes tile the archive
    assert idx2[0][0] == 0
    assert all(idx2[i][0] + idx2[i][1] == idx2[i + 1][0]
               for i in range(len(idx2) - 1))
    assert idx2[-1][0] + idx2[-1][1] == len(a2)


def test_member_end_truncated_raises():
    full = write_warc(
        [{"uri": "http://e.com/a",
          "payload": http_response_bytes(b"hello")}], gzip_members=True)
    with pytest.raises(ValueError, match="truncated gzip"):
        member_index(full[:-4])


def test_warc_zst_roundtrip():
    """.warc.zst: per-record zstd frames (the modern shard layout) feed
    the same record parser; frames are independently decodable via the
    seek-table/frame-index path."""
    import pyarrow as pa

    from gfw_pixetl_spark.sources.zstd import decompress, frame_index

    recs = [{"uri": f"http://e.com/{i}",
             "payload": http_response_bytes(f"body {i}".encode())}
            for i in range(5)]
    plain = write_warc(recs, gzip_members=False)
    codec = pa.Codec("zstd")
    zst = bytes(codec.compress(plain))
    got = list(iter_warc(zst))
    want = list(iter_warc(plain))
    assert got == want and len(got) == 6  # warcinfo + 5 responses
    # per-record frames concatenate into a multi-frame .warc.zst
    # whose frame_index gives record-granular ranged access
    frames = b"".join(
        bytes(codec.compress(r)) for r in
        (plain[s:e] for s, e in _record_spans(plain)))
    assert list(iter_warc(frames)) == want
    fi = frame_index(frames)
    assert len(fi) == 6
    first = decompress(frames[fi[1][0]:fi[1][0] + fi[1][1]])
    assert b"http://e.com/0" in first


def _record_spans(plain: bytes):
    spans = []
    pos = 0
    while pos < len(plain):
        hdr_end = plain.index(b"\r\n\r\n", pos)
        head = plain[pos:hdr_end].decode("latin-1")
        n = int([x for x in head.split("\r\n")
                 if x.lower().startswith("content-length")][0]
                .split(":")[1])
        end = hdr_end + 4 + n
        while plain[end:end + 2] == b"\r\n":
            end += 2
        spans.append((pos, end))
        pos = end
    return spans


def _archive(n=8, gz=True):
    from gfw_pixetl_spark.sources.warc import write_warc

    return write_warc([
        {"uri": f"http://e.com/{i}",
         "payload": http_response_bytes(f"body {i} {'y' * (i % 23)}"
                                        .encode())}
        for i in range(n)
    ], gzip_members=gz)


def test_scan_warc_clean_matches_strict():
    from gfw_pixetl_spark.sources.warc import iter_warc, scan_warc

    for gz in (True, False):
        a = _archive(gz=gz)
        recs, counters = scan_warc(a)
        assert recs == list(iter_warc(a))
        assert counters["n_records"] == 9
        assert counters["bad_gzip_members"] == 0
        assert counters["bad_records"] == 0


def test_scan_warc_corruption_semantics():
    """Skip-and-count, never crash: truncation mid-member, garbage
    between members, a corrupted member body, missing Content-Length,
    LF-only header damage — intact records always survive."""
    from gfw_pixetl_spark.sources.warc import member_index, scan_warc

    a = _archive()
    idx = member_index(a)

    # (1) truncate mid-member: records before the cut survive
    cut = idx[4][0] + idx[4][1] // 2
    recs, c = scan_warc(a[:cut])
    assert c["n_records"] == 4 and c["bad_gzip_members"] == 1
    assert recs[1][0]["WARC-Target-URI"] == "http://e.com/0"

    # (2) garbage BETWEEN members: resync finds the next member
    o, s = idx[3]
    injected = a[:o] + b"\x00GARBAGE\x00" * 3 + a[o:]
    recs, c = scan_warc(injected)
    assert c["n_records"] == 9
    assert c["junk_bytes"] == 27

    # (3) corrupt a member's deflate body: that record lost, rest kept
    o, s = idx[5]
    dam = bytearray(a)
    for k in range(o + 12, o + s - 9):
        dam[k] ^= 0x5A
    recs, c = scan_warc(bytes(dam))
    assert c["bad_gzip_members"] >= 1
    assert c["n_records"] + c["bad_records"] <= 9
    uris = [h.get("WARC-Target-URI") for h, _ in recs]
    assert "http://e.com/0" in uris  # neighbors unharmed

    # (4) missing Content-Length (uncompressed layer)
    plain = _archive(n=2, gz=False)
    import re

    no_len = re.sub(rb"Content-Length: \d+\r\n", b"", plain, count=1)
    recs, c = scan_warc(no_len)
    assert c["bad_records"] >= 1
    assert c["n_records"] >= 1  # later records recovered by resync

    # (5) LF-only header terminator still parses
    lf_dam = plain.replace(b"\r\n\r\n", b"\n\n", 1)
    recs, c = scan_warc(lf_dam)
    assert c["n_records"] == 3


def test_scan_warc_random_corruption_never_crashes():
    """Property sweep: random byte flips / deletions / insertions at
    random offsets — scan_warc must always return, and counters must
    account for every record (found + lost <= written)."""
    import random

    from gfw_pixetl_spark.sources.warc import scan_warc

    rnd = random.Random(99)
    a = _archive(n=12)
    for trial in range(60):
        b = bytearray(a)
        kind = trial % 3
        off = rnd.randrange(1, len(b) - 2)
        if kind == 0:
            b[off] ^= 1 << rnd.randrange(8)
        elif kind == 1:
            del b[off:off + rnd.randrange(1, 40)]
        else:
            b[off:off] = bytes(rnd.randrange(256)
                               for _ in range(rnd.randrange(1, 20)))
        recs, c = scan_warc(bytes(b))  # must not raise
        assert c["n_records"] == len(recs) <= 13


def test_scan_warc_zst_layer_damage():
    """.warc.zst shard with a corrupt frame: that frame's records are
    lost and counted; every other frame's records survive."""
    import pyarrow as pa

    from gfw_pixetl_spark.sources.warc import scan_warc
    from gfw_pixetl_spark.sources.zstd import frame_index

    codec = pa.Codec("zstd")
    plain = write_warc(
        [{"uri": f"http://e.com/{i}",
          "payload": http_response_bytes(f"body {i}".encode())}
         for i in range(5)], gzip_members=False)
    frames = [bytes(codec.compress(plain[s:e]))
              for s, e in _record_spans(plain)]
    shard = b"".join(frames)
    # clean shard: 6 records (warcinfo + 5), no damage
    recs, c = scan_warc(shard)
    assert c["n_records"] == 6 and c["bad_gzip_members"] == 0
    # corrupt frame 2's body bytes
    fi = frame_index(shard)
    dam = bytearray(shard)
    o, s = fi[2][0], fi[2][1]
    for k in range(o + 10, o + s - 2):
        dam[k] ^= 0xA5
    recs, c = scan_warc(bytes(dam))
    assert c["bad_gzip_members"] >= 1
    uris = [h.get("WARC-Target-URI") for h, _ in recs]
    assert "http://e.com/0" in uris and "http://e.com/4" in uris
    # truncated final frame: earlier records intact
    recs, c = scan_warc(shard[:-10])
    assert c["n_records"] == 5 and c["bad_gzip_members"] == 1


def test_scan_warc_tail_truncation_counts_junk():
    """ADVICE r6: a corrupt gzip member with no later resync magic must
    count the remaining tail as junk_bytes (parity with the zstd
    layer), not drop it from the accounting."""
    from gfw_pixetl_spark.sources.warc import member_index, scan_warc

    a = _archive()
    idx = member_index(a)
    cut = idx[-1][0] + idx[-1][1] // 2
    recs, c = scan_warc(a[:cut])
    assert c["bad_gzip_members"] == 1
    assert c["junk_bytes"] == cut - idx[-1][0]


def test_scan_warc_zst_leading_skippable_frame():
    """ADVICE r6: scan_warc's zstd sniff must accept a shard that opens
    with a skippable frame (seekable-format envelope), like iter_warc."""
    import struct as _struct

    from gfw_pixetl_spark.sources.warc import scan_warc, write_warc
    from gfw_pixetl_spark.sources.zstd import compress_raw

    plain = write_warc(
        [{"uri": "http://e.com/a",
          "payload": http_response_bytes(b"hello")}],
        gzip_members=False)
    shard = (_struct.pack("<II", 0x184D2A50, 4) + b"meta"
             + compress_raw(plain))
    recs, c = scan_warc(shard)
    assert c["n_records"] == 2  # warcinfo + the response
    assert c["bad_gzip_members"] == 0 and c["junk_bytes"] == 0
    assert recs[1][0]["WARC-Target-URI"] == "http://e.com/a"


# --------------------------------------------------------------------------
# HTTP payload decode chain: chunked transfer coding + charset sniffing
# --------------------------------------------------------------------------


def test_decode_chunked_rfc9112():
    from gfw_pixetl_spark.sources.warc import decode_chunked

    wire = (b"4\r\nWiki\r\n6\r\npedia \r\nE\r\nin \r\n\r\nchunks.\r\n"
            b"0\r\n\r\n")
    assert decode_chunked(wire) == b"Wikipedia in \r\n\r\nchunks."
    # chunk extensions are ignored; trailer headers are ignored
    ext = b"5;name=val\r\nhello\r\n0\r\nx-checksum: 1\r\n\r\n"
    assert decode_chunked(ext) == b"hello"
    with pytest.raises(ValueError):
        decode_chunked(b"5\r\nhel")        # truncated chunk data
    with pytest.raises(ValueError):
        decode_chunked(b"3\r\nabcXX0\r\n\r\n")  # missing CRLF


def test_sniff_charset_precedence():
    from gfw_pixetl_spark.functions.html import sniff_charset

    # BOM beats everything; both UTF-16 BOMs map to the
    # BOM-consuming codec so U+FEFF never leaks into decoded text
    assert sniff_charset(b"\xff\xfex", "text/html; charset=utf-8") == \
        "utf-16"
    assert sniff_charset(b"\xfe\xffx") == "utf-16"
    assert sniff_charset(b"\xef\xbb\xbfx") == "utf-8-sig"
    body16 = "<p>ok</p>".encode("utf-16")      # BOM included
    assert body16.decode(sniff_charset(body16)) == "<p>ok</p>"
    # header beats meta
    body = b'<meta charset="windows-1252"><p>x</p>'
    assert sniff_charset(body, "text/html; charset=ISO-8859-1") == \
        "iso-8859-1"
    assert sniff_charset(body) == "windows-1252"
    # http-equiv form
    assert sniff_charset(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=gb2312">') == "gb2312"
    # meta beyond the first 1024 bytes is NOT consulted (WHATWG limit)
    late = b" " * 1100 + b'<meta charset="koi8-r">'
    assert sniff_charset(late) == "utf-8"
    assert sniff_charset(b"<html>") == "utf-8"


def test_split_blocks_and_main_content():
    from gfw_pixetl_spark.functions.html import main_content, split_blocks

    page = (
        "<html><body>"
        "<nav><a href=/>Home</a> <a href=/a>About us page</a></nav>"
        "<header><h1>Banner</h1></header>"
        "<p>This is the first real paragraph of the article body.</p>"
        "<p>Tiny.</p>"
        "<p>See <a href=x>more</a> <a href=y>of these link words</a>"
        " now</p>"
        "<aside><p>Sidebar promo block with plenty of characters"
        " inside.</p></aside>"
        "<footer>Copyright notice long enough to pass length.</footer>"
        "</body></html>")
    blocks = split_blocks(page)
    boiler = [b["text"] for b in blocks if b["boiler"]]
    assert any("Home" in t for t in boiler)
    assert any("Sidebar" in t for t in boiler)
    assert any("Copyright" in t for t in boiler)
    text, n, kept = main_content(page)
    assert kept == 1
    assert text == "This is the first real paragraph of the article body."
    # link-density rule: the linky paragraph is dropped even though
    # it is long enough
    assert "link words" not in text


def test_main_content_nested_boiler_and_selfclosed():
    from gfw_pixetl_spark.functions.html import main_content

    page = ("<body><nav><div><p>Deeply nested navigation paragraph "
            "with length.</p></div></nav>"
            "<p>Real content paragraph that is long enough to keep."
            "</p><hr/></body>")
    text, _n, kept = main_content(page)
    assert kept == 1 and text.startswith("Real content")

"""PDF text extraction (sources/pdf.py): writer round trips plus
hand-built streams exercising the ISO 32000 paths the writer does not
emit (TJ arrays, hex strings, octal escapes, xref /Prev chains, nested
page trees) and the declared error surface."""

import zlib

import pytest

from gfw_pixetl_spark.sources.pdf import (
    PdfDocument, extract_content_text, extract_pdf_text, write_pdf,
)


def test_roundtrip_compressed_and_plain():
    pages = [["Hello world", "second line"], ["page two"]]
    for compress in (True, False):
        pdf = write_pdf(pages, compress=compress)
        doc = PdfDocument(pdf)
        assert len(doc.pages()) == 2
        assert doc.text() == "Hello world second line\npage two"


def test_escapes_roundtrip():
    pdf = write_pdf([["with (parens) and \\ backslash"]])
    assert extract_pdf_text(pdf) == "with (parens) and \\ backslash"


def test_content_stream_tj_array_and_hex():
    """TJ arrays interleave kerning numbers with strings; hex strings
    and octal escapes decode; quote operator breaks words."""
    stream = (b"BT /F1 12 Tf 72 720 Td "
              b"[(Hel) -20 (lo)] TJ ( ) Tj <776F726C64> Tj "
              b"0 -14 Td (next\\040line) Tj (more) ' ET")
    assert extract_content_text(stream) == "Hello world next line more"


def test_string_edge_cases():
    # nested parens; 3-digit octal; \30 followed by a non-octal digit
    # stops the escape after two digits; lone backslash dropped
    stream = rb"BT ((nested (deep)) \310 \308 \z) Tj ET"
    assert extract_content_text(stream) == "(nested (deep)) \xc8 \x188 z"


def test_nested_page_tree_and_contents_array():
    """Hand-built: Pages -> [Pages -> [leaf], leaf], one leaf using an
    ARRAY of two content streams."""
    s1 = b"BT (part one) Tj ET"
    s2 = b"BT (part two) Tj ET"
    s3 = b"BT (solo) Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
        3: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        4: b"<< /Type /Page /Parent 3 0 R /Contents [6 0 R 7 0 R] >>",
        5: b"<< /Type /Page /Parent 2 0 R /Contents 8 0 R >>",
        6: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(s1), s1),
        7: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(s2), s2),
        8: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(s3), s3),
    }
    pdf = _assemble(objs, root=1)
    doc = PdfDocument(pdf)
    assert len(doc.pages()) == 2
    assert doc.text() == "part one part two\nsolo"


def test_indirect_length_and_prev_chain():
    """Stream /Length via an indirect ref, plus an incremental-update
    xref section chained with /Prev (newest xref wins per object)."""
    s = b"BT (v2 content) Tj ET"
    base_objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length 5 0 R >>\nstream\nBT (v1) Tj ET\nendstream",
        5: b"13",
    }
    pdf = bytearray(_assemble(base_objs, root=1))
    # incremental update: replace object 4, chain xref via /Prev
    old_startxref = int(pdf.rsplit(b"startxref", 1)[1].split()[0])
    new4 = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(s), s)
    pdf += b"\n"
    obj_at = len(pdf)
    pdf += b"4 0 obj\n" + new4 + b"\nendobj\n"
    xref_at = len(pdf)
    pdf += (b"xref\n4 1\n%010d 00000 n \n" % obj_at
            + b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\n"
              b"startxref\n%d\n%%%%EOF" % (old_startxref, xref_at))
    assert extract_pdf_text(bytes(pdf)) == "v2 content"


def test_declared_unsupported_paths_raise():
    with pytest.raises(ValueError, match="missing %PDF- header"):
        PdfDocument(b"not a pdf")
    pdf = write_pdf([["x"]])
    # point startxref at garbage -> neither a table nor a stream object
    broken = pdf.rsplit(b"startxref", 1)[0] + b"startxref\n9\n%%EOF"
    with pytest.raises(ValueError, match="neither an xref table nor"):
        PdfDocument(broken)
    # unsupported filter named explicitly
    s = b"x"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Filter /LZWDecode /Length %d >>\nstream\n%s\nendstream"
           % (len(s), s),
    }
    with pytest.raises(ValueError, match="unsupported filter"):
        PdfDocument(_assemble(objs, root=1)).text()


def test_flate_stream_really_inflates():
    body = zlib.compress(b"BT (zipped) Tj ET")
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
           % (len(body), body),
    }
    assert extract_pdf_text(_assemble(objs, root=1)) == "zipped"


def _assemble(objs: dict[int, bytes], root: int) -> bytes:
    """Hand-assemble a classic-xref PDF from numbered object bodies."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    nmax = max(objs)
    out += b"xref\n0 %d\n" % (nmax + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, nmax + 1):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF"
            % (nmax + 1, root, xref_at))
    return bytes(out)


def test_review_fixes_escapes_contents_freed():
    """Second-review regressions: \\8/\\9 escapes drop the backslash
    (never crash), a /Contents-less page extracts as empty, a freed
    xref entry in a newer section shadows the /Prev chain, and
    non-latin-1 writer input raises the declared error."""
    assert extract_content_text(rb"BT (a\8b\9c) Tj ET") == "a8b9c"
    with pytest.raises(ValueError, match="CID-keyed"):
        write_pdf([["euro € sign"]])
    # page without /Contents
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R >>",
    }
    assert extract_pdf_text(_assemble(objs, root=1)) == ""
    # freed entry shadows: incremental update frees object 4
    pdf = bytearray(_assemble({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length 13 >>\nstream\nBT (old) Tj ET\nendstream",
    }, root=1))
    old_sx = int(pdf.rsplit(b"startxref", 1)[1].split()[0])
    xref_at = len(pdf) + 1
    pdf += (b"\nxref\n4 1\n0000000000 00001 f \n"
            b"trailer\n<< /Size 5 /Root 1 0 R /Prev %d >>\n"
            b"startxref\n%d\n%%%%EOF" % (old_sx, xref_at))
    with pytest.raises(ValueError, match="freed"):
        PdfDocument(bytes(pdf)).text()


# ---------------------------------------------------------------------------
# PDF 1.5: cross-reference streams + object streams
# ---------------------------------------------------------------------------


def test_xref_stream_roundtrip():
    """PDF 1.5 layout: startxref points at a /Type /XRef stream object
    (W=[1,4,2] rows, Flate + Predictor 12); text extraction matches the
    classic layout byte for byte."""
    pages = [["alpha beta", "gamma (x) \\ delta"], ["page two"]]
    classic = extract_pdf_text(write_pdf(pages))
    modern = write_pdf(pages, xref_stream=True)
    assert b"/Type /XRef" in modern and modern.startswith(b"%PDF-1.5")
    assert extract_pdf_text(modern) == classic


def test_objstm_roundtrip():
    """Dict objects packed into one /Type /ObjStm, addressed by type-2
    xref entries — the layout of virtually every born-digital PDF."""
    pages = [["obj stream text"], ["and more"]]
    modern = write_pdf(pages, xref_stream=True, use_objstm=True)
    assert b"/Type /ObjStm" in modern
    doc = PdfDocument(modern)
    # catalog/pages/page dicts resolve through the ObjStm (type-2)
    assert any(isinstance(v, tuple) for v in doc.xref.values())
    assert doc.text() == extract_pdf_text(write_pdf(pages))
    # the ObjStm inflates once and is cached
    assert len(doc._objstm_cache) == 1


def test_hybrid_reference_file():
    """ISO 32000-1 7.5.8.4: a classic trailer whose /XRefStm bridges to
    a stream section — readers that ignore /XRefStm miss the packed
    objects; ours must consult it before /Prev."""
    pages = [["hybrid text body"]]
    base = write_pdf(pages, xref_stream=True, use_objstm=True)
    xref_stream_at = int(base.rsplit(b"startxref", 1)[1].split()[0])
    import re

    size = int(re.search(rb"/Size (\d+)", base).group(1))
    root = int(re.search(rb"/Root (\d+) 0 R", base).group(1))
    out = bytearray(base)
    table_at = len(out) + 1
    out += (b"\nxref\n0 1\n0000000000 65535 f \n"
            b"trailer\n<< /Size %d /Root %d 0 R /XRefStm %d >>\n"
            b"startxref\n%d\n%%%%EOF"
            % (size, root, xref_stream_at, table_at))
    doc = PdfDocument(bytes(out))
    assert doc.text() == "hybrid text body"


def test_xref_stream_incremental_update_prev_chain():
    """An incremental update appends a new content stream + a new xref
    stream chaining to the old one via /Prev; the newer section's
    entries shadow the original's."""
    base = write_pdf([["original text"]], xref_stream=True)
    old_at = int(base.rsplit(b"startxref", 1)[1].split()[0])
    # object 3 is the (only) page's content stream in writer layout
    doc0 = PdfDocument(base)
    page = doc0.pages()[0]
    content_ref = page["Contents"]
    new_stream = b"BT (updated text) Tj ET"
    out = bytearray(base)
    out += b"\n"
    new_obj_at = len(out)
    out += (b"%d 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
            % (content_ref.num, len(new_stream), new_stream))
    # new xref stream: entry for the replaced object + self
    size = max(doc0.xref) + 2
    xref_id = size - 1
    xref_at = len(out)
    rows = (b"\x01" + new_obj_at.to_bytes(4, "big") + b"\x00\x00"
            + b"\x01" + xref_at.to_bytes(4, "big") + b"\x00\x00")
    comp = zlib.compress(rows)
    out += (b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] "
            b"/Index [%d 1 %d 1] /Root 5 0 R /Prev %d "
            b"/Filter /FlateDecode /Length %d >>\nstream\n"
            % (xref_id, size, content_ref.num, xref_id, old_at,
               len(comp)))
    out += comp + b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF" % xref_at
    doc = PdfDocument(bytes(out))
    assert doc.text() == "updated text"
    # time-travel: the base bytes alone still read the original
    assert extract_pdf_text(base) == "original text"


def test_unpredict_png_filters_and_tiff():
    """PNG row filters Sub/Up/Average/Paeth + TIFF predictor 2 undo
    exactly (hand-built filtered rows vs known plaintext)."""
    from gfw_pixetl_spark.sources.pdf import _unpredict

    plain = bytes([10, 20, 30, 40, 50, 60])  # 2 rows x 3 cols, bpp=1
    # Sub: row[i] - row[i-1]
    sub = bytes([1, 10, 10, 10]) + bytes([1, 40, 10, 10])
    assert _unpredict(sub, 10, 3) == plain
    # Up: row[i] - prev[i]
    up = bytes([2, 10, 20, 30]) + bytes([2, 30, 30, 30])
    assert _unpredict(up, 12, 3) == plain
    # Average: row[i] - (left + up)//2
    avg = bytes([3, 10, 15, 20]) + bytes([3, 45 - (20 + 10) // 2 + 20,
                                          0, 0])
    got = _unpredict(avg, 13, 3)
    assert got[:3] == plain[:3]
    # Paeth row over zero prev == Sub semantics for first row
    paeth = bytes([4, 10, 10, 10]) + bytes([4, 40, 10, 10])
    assert _unpredict(paeth, 14, 3)[:3] == plain[:3]
    # mixed tags per row are legal
    mixed = bytes([0, 10, 20, 30]) + bytes([2, 30, 30, 30])
    assert _unpredict(mixed, 11, 3) == plain
    # TIFF horizontal differencing
    tiff = bytes([10, 10, 10, 40, 10, 10])
    assert _unpredict(tiff, 2, 3) == plain
    with pytest.raises(ValueError, match="filter tag"):
        _unpredict(bytes([9, 1, 2, 3]), 12, 3)
    with pytest.raises(ValueError, match="don't tile"):
        _unpredict(bytes([2, 1, 2]), 12, 3)


def test_xref_stream_malformed_raises():
    base = write_pdf([["x"]], xref_stream=True)
    at = int(base.rsplit(b"startxref", 1)[1].split()[0])
    # truncated mid-stream: Flate refuses
    with pytest.raises(Exception):
        PdfDocument(base[:at + 40] + base[-40:])
    # /W that covers zero bytes
    bad = base.replace(b"/W [1 4 2]", b"/W [0 0 0]")
    with pytest.raises(ValueError, match="xref stream|/W"):
        PdfDocument(bad)
    # indirect /Length on the xref stream is illegal (7.5.8.2)
    bad = base.replace(b"/Type /XRef", b"/Type /XRef /Junk 1", 1)
    PdfDocument(bad)  # unknown keys are fine
    # rows shorter than /Index claims
    m = __import__("re").search(rb"/Size (\d+)", base)
    bad = base.replace(b"/Size %d" % int(m.group(1)),
                       b"/Size %d /Index [0 999]" % int(m.group(1)))
    with pytest.raises(ValueError, match="holds|needs"):
        PdfDocument(bad)


def test_objstm_wrong_index_tolerated_and_missing_raises():
    """Header pairs are authoritative: an off-by-one type-2 index still
    resolves by searching the pairs; a truly absent object raises."""
    pages = [["tolerant"]]
    data = bytearray(write_pdf(pages, xref_stream=True, use_objstm=True))
    doc = PdfDocument(bytes(data))
    packed = [(n, v) for n, v in doc.xref.items() if isinstance(v, tuple)]
    n0, (_, stm, idx) = packed[0]
    doc.xref[n0] = ("objstm", stm, idx + 1)  # off-by-one
    doc._cache.clear()
    assert doc.obj(n0) is not None
    doc.xref[n0] = ("objstm", stm, 999)
    doc._cache.clear()
    obj = doc.obj(n0)  # 999 out of range -> pair search still finds it
    assert obj is not None

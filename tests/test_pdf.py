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
    # point startxref at a non-'xref' location -> xref-stream refusal
    broken = pdf.rsplit(b"startxref", 1)[0] + b"startxref\n9\n%%EOF"
    with pytest.raises(ValueError, match="classic xref tables only"):
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

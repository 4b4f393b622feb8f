"""EPUB ingest (sources/epub.py): OCF container rules, OPF
metadata/manifest/spine walk, spine-ordered extraction, error
surface."""

from __future__ import annotations

import io
import zipfile

import pytest

from gfw_pixetl_spark.sources.epub import epub_text, read_epub, write_epub


def _book() -> bytes:
    return write_epub(
        "A Test & Title", "An Author", "en",
        [("One", "<p>First chapter body text.</p>"),
         ("Two", "<p>Second chapter with <em>emphasis</em>.</p>")],
        extra_nonlinear="Cover page text")


def test_roundtrip_metadata_and_spine_order():
    book = read_epub(_book())
    assert book["title"] == "A Test & Title"
    assert book["creator"] == "An Author"
    assert book["language"] == "en"
    # linear="no" cover is excluded; chapters stay in spine order
    assert [h for h, _ in book["chapters"]] == \
        ["ch001.xhtml", "ch002.xhtml"]


def test_text_extraction_joins_spine_in_order():
    title, text, n = epub_text(_book())
    assert title == "A Test & Title"
    assert n == 2
    assert text == ("One One First chapter body text. "
                    "Two Two Second chapter with emphasis .")  # tag = boundary
    assert "Cover page" not in text


def test_mimetype_is_first_and_stored():
    data = _book()
    z = zipfile.ZipFile(io.BytesIO(data))
    infos = z.infolist()
    assert infos[0].filename == "mimetype"
    assert infos[0].compress_type == zipfile.ZIP_STORED
    # the OCF magic is byte-addressable at a fixed offset
    assert data[30:38] == b"mimetype"


def test_error_surface():
    with pytest.raises(ValueError, match="not a zip"):
        read_epub(b"definitely not a zip")
    # a zip without the mimetype entry
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("stuff.txt", "x")
    with pytest.raises(ValueError, match="mimetype"):
        read_epub(buf.getvalue())
    # wrong mimetype
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "text/plain")
    with pytest.raises(ValueError, match="wrong mimetype"):
        read_epub(buf.getvalue())


def test_spine_ref_must_resolve():
    data = _book()
    # corrupt the OPF: point the spine at a missing manifest id
    z = zipfile.ZipFile(io.BytesIO(data))
    opf = z.read("OEBPS/content.opf").decode().replace(
        'idref="c2"', 'idref="missing"')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for info in z.infolist():
            payload = (opf.encode() if info.filename.endswith(
                "content.opf") else z.read(info.filename))
            out.writestr(info, payload)
    with pytest.raises(ValueError, match="spine idref"):
        read_epub(buf.getvalue())

"""DOCX extraction (sources/docx.py) and EXIF APP1 parsing
(sources/exif.py)."""

import numpy as np
import pytest

from gfw_pixetl_spark.sources.docx import extract_docx_text, write_docx
from gfw_pixetl_spark.sources.exif import (
    TAG_DATETIME, TAG_ISO, TAG_MAKE, TAG_MODEL, TAG_ORIENTATION,
    build_exif, insert_exif, parse_exif,
)
from gfw_pixetl_spark.sources.jpeg import decode_jpeg, encode_jpeg


def test_docx_roundtrip_and_entities():
    d = write_docx(["Hello & <world>", 'quotes "here"', "third"])
    assert extract_docx_text(d) == 'Hello & <world>\nquotes "here"\nthird'


def test_docx_tabs_breaks_and_preserved_space():
    """Hand-built document.xml: tabs, breaks, multiple runs per
    paragraph, xml:space-preserved leading space inside a run."""
    import io
    import zipfile

    from gfw_pixetl_spark.sources.docx import _CONTENT_TYPES, _RELS

    doc = (
        '<?xml version="1.0"?><w:document xmlns:w="x"><w:body>'
        '<w:p><w:r><w:t>one</w:t></w:r><w:tab/>'
        '<w:r><w:t xml:space="preserve"> two</w:t></w:r>'
        "<w:r><w:br/><w:t>three</w:t></w:r></w:p>"
        "<w:p><w:r><w:t>para2 &amp; &#65;</w:t></w:r></w:p>"
        "</w:body></w:document>"
    ).encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("word/document.xml", doc)
    text = extract_docx_text(buf.getvalue())
    assert text == "one\t two\nthree\npara2 & A"


def test_docx_errors():
    with pytest.raises(ValueError, match="ZIP"):
        extract_docx_text(b"not a zip at all")
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("other.xml", b"<x/>")
    with pytest.raises(ValueError, match="word/document.xml"):
        extract_docx_text(buf.getvalue())


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_exif_roundtrip(bo):
    img = (np.arange(256, dtype=np.int64) % 251).astype(
        np.uint8).reshape(16, 16)
    jpeg = encode_jpeg(img)
    exif = build_exif(make="CamCo", model="X-100", orientation=6,
                      datetime="2024:01:02 03:04:05", iso=400,
                      byte_order=bo)
    tagged = insert_exif(jpeg, exif)
    tags = parse_exif(tagged)
    assert tags[TAG_MAKE] == "CamCo"
    assert tags[TAG_MODEL] == "X-100"
    assert tags[TAG_ORIENTATION] == 6
    assert tags[TAG_DATETIME] == "2024:01:02 03:04:05"
    assert tags[TAG_ISO] == 400
    # the APP1 splice is transparent to the pixel decoder
    assert np.array_equal(decode_jpeg(tagged), decode_jpeg(jpeg))


def test_exif_minimal_and_missing():
    jpeg = encode_jpeg(np.zeros((8, 8), np.uint8))
    assert parse_exif(jpeg) == {}
    tagged = insert_exif(jpeg, build_exif(orientation=3))
    tags = parse_exif(tagged)
    assert tags[TAG_ORIENTATION] == 3 and TAG_ISO not in tags
    with pytest.raises(ValueError, match="SOI"):
        insert_exif(b"nope", b"")
    with pytest.raises(ValueError, match="SOI"):
        parse_exif(b"nope")


def test_exif_short_strings_inline():
    """ASCII values of <= 4 bytes (incl. NUL) pack inline in the IFD
    entry rather than the external value area."""
    jpeg = encode_jpeg(np.zeros((8, 8), np.uint8))
    tagged = insert_exif(jpeg, build_exif(make="abc", orientation=1))
    assert parse_exif(tagged)[TAG_MAKE] == "abc"


def test_attributed_breaks_and_cr():
    """Word emits <w:br w:type='page'/> and <w:cr/>; attributed w:tab
    elements are tab-STOP definitions, not text tabs."""
    import io
    import zipfile

    from gfw_pixetl_spark.sources.docx import _CONTENT_TYPES, _RELS

    doc = (
        '<?xml version="1.0"?><w:document xmlns:w="x"><w:body>'
        "<w:p><w:pPr><w:tabs>"
        '<w:tab w:val="left" w:pos="708"/></w:tabs></w:pPr>'
        '<w:r><w:t>one</w:t><w:br w:type="page"/><w:t>two</w:t>'
        "<w:cr/><w:t>three</w:t></w:r></w:p>"
        "<w:p><w:r><w:t>bad &#xzz; stays</w:t></w:r></w:p>"
        "</w:body></w:document>"
    ).encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("word/document.xml", doc)
    text = extract_docx_text(buf.getvalue())
    assert text == "one\ntwo\nthree\nbad &#xzz; stays"


def test_exif_fill_bytes_and_standalone_markers():
    """ADVICE r5: ITU T.81 B.1.1.2 allows runs of 0xFF fill bytes before
    any marker, and TEM (0x01) / RSTn (0xD0-D7) are standalone markers
    with no length field — parse_exif must walk past both, not misread
    the length from the wrong offset or raise on legal streams."""
    img = (np.arange(64, dtype=np.int64) % 251).astype(
        np.uint8).reshape(8, 8)
    jpeg = encode_jpeg(img)
    exif = build_exif(make="FillCo", orientation=8)
    tagged = insert_exif(jpeg, exif)
    # inject fill bytes + a TEM + an RST1 standalone marker before APP1
    assert tagged[2:4] == b"\xff\xe1"
    hacked = (tagged[:2]
              + b"\xff\xff\xff"       # fill run before a marker
              + b"\xff\x01"           # TEM (standalone, no length)
              + b"\xff\xd1"           # RST1 (standalone, no length)
              + b"\xff\xff"           # more fill, merging into APP1's FF
              + tagged[2:])
    tags = parse_exif(hacked)
    assert tags[TAG_MAKE] == "FillCo"
    assert tags[TAG_ORIENTATION] == 8
    # a stuffed data byte where a marker should be is still an error
    with pytest.raises(ValueError, match="stuffed"):
        parse_exif(b"\xff\xd8\xff\x00rest")


def test_exif_gps_roundtrip():
    """GPS IFD: RATIONAL dms triplets + hemisphere refs round-trip and
    convert to signed decimal degrees."""
    from gfw_pixetl_spark.sources.exif import (
        GPS_LAT, GPS_LON, gps_decimal, gps_tag,
    )

    jpeg = encode_jpeg(np.zeros((8, 8), np.uint8))
    for bo in ("II", "MM"):
        exif = build_exif(
            make="GpsCam", orientation=1,
            gps=("S", ((12, 1), (30, 1), (900, 100)),
                 "W", ((45, 1), (0, 1), (36, 2))),
            byte_order=bo)
        tags = parse_exif(insert_exif(jpeg, exif))
        assert tags[gps_tag(GPS_LAT)] == [(12, 1), (30, 1), (900, 100)]
        assert tags[gps_tag(GPS_LON)] == [(45, 1), (0, 1), (36, 2)]
        la, lo = gps_decimal(tags)
        assert la == -(12 + 30 / 60 + 9 / 3600)
        assert lo == -(45 + 18 / 3600)
    # no GPS IFD -> None, and IFD0 tags unharmed
    tags = parse_exif(insert_exif(jpeg, build_exif(orientation=3)))
    from gfw_pixetl_spark.sources.exif import gps_decimal as gd
    assert gd(tags) is None and tags[TAG_ORIENTATION] == 3


def test_apply_orientation_all_eight():
    """Tag-274 normalization: every orientation maps the stored corner
    pixels to the documented display positions (EXIF 2.32 table 5)."""
    from gfw_pixetl_spark.sources.exif import apply_orientation

    H, W = 6, 4
    img = (np.arange(H * W, dtype=np.int64).reshape(H, W)).astype(
        np.uint8)
    P = lambda r, c: int(img[r, c])  # noqa: E731
    want_00 = {1: P(0, 0), 2: P(0, W - 1), 3: P(H - 1, W - 1),
               4: P(H - 1, 0), 5: P(0, 0), 6: P(H - 1, 0),
               7: P(H - 1, W - 1), 8: P(0, W - 1)}
    want_end = {1: P(H - 1, W - 1), 2: P(H - 1, 0), 3: P(0, 0),
                4: P(0, W - 1), 5: P(H - 1, W - 1), 6: P(0, W - 1),
                7: P(0, 0), 8: P(H - 1, 0)}
    for o in range(1, 9):
        got = apply_orientation(img, o)
        assert got.shape == ((H, W) if o <= 4 else (W, H)), o
        assert int(got[0, 0]) == want_00[o], o
        assert int(got[-1, -1]) == want_end[o], o
        # normalization is a bijection on pixels
        assert sorted(got.ravel().tolist()) == sorted(
            img.ravel().tolist())
    with pytest.raises(ValueError, match="orientation"):
        apply_orientation(img, 9)
    # double-apply of the involutive orientations is identity
    for o in (2, 3, 4, 5, 7):
        twice = apply_orientation(apply_orientation(img, o), o)
        assert np.array_equal(twice, img), o

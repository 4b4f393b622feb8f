"""EPUB ingest (IDPF/W3C EPUB: OCF zip container + OPF package
document) — the format book corpora actually ship (Project Gutenberg,
Standard Ebooks, library collections), and books are the
highest-quality long-form slice of a pretraining mix.

The container is OCF: a ZIP whose FIRST entry is an (often STORED)
``mimetype`` file reading ``application/epub+zip``, plus
``META-INF/container.xml`` pointing at the OPF package document.  The
OPF carries Dublin Core metadata (title/creator/language), a
``manifest`` of items (id -> href/media-type) and a ``spine`` — the
ordered list of reading-content item refs.  Text extraction walks the
spine IN ORDER and strips each XHTML chapter with the same extractor
the crawl pipeline uses (``functions/html.py``), so book text and web
text go through one tag/entity/whitespace discipline.

* ``write_epub`` — spec-shaped writer (mimetype first and STORED, per
  OCF; container.xml; OPF with metadata/manifest/spine; one XHTML
  file per chapter), used for round-trip fixtures,
* ``read_epub`` — container walk: mimetype check, container.xml ->
  OPF path, OPF parse (title/creator/language, spine order with
  ``linear="no"`` items excluded), spine-ordered chapter XHTML,
* ``epub_text`` — (title, full_text, n_chapters): spine chapters
  extracted and joined.

Scale shape: one book = one ZIP = one Arrow-kernel unit; the ZIP
central directory read is one tail ranged GET (the docx.py note), and
chapters decompress independently.  q432 value-checks the chain
against an analytically constructed oracle.
"""
from __future__ import annotations

import io
import posixpath
import re
import zipfile
from xml.etree import ElementTree

from ..functions.html import extract_text

_CONTAINER_XML = """<?xml version="1.0" encoding="UTF-8"?>
<container version="1.0"
 xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
 <rootfiles>
  <rootfile full-path="OEBPS/content.opf"
   media-type="application/oebps-package+xml"/>
 </rootfiles>
</container>"""

_OPF_NS = "http://www.idpf.org/2007/opf"
_DC_NS = "http://purl.org/dc/elements/1.1/"


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def write_epub(title: str, creator: str, language: str,
               chapters: list[tuple[str, str]],
               extra_nonlinear: str | None = None) -> bytes:
    """chapters: [(chapter_title, body_html)] -> a spec-shaped EPUB.
    ``extra_nonlinear`` adds a spine item with ``linear="no"`` (e.g. a
    cover page) that text extraction must skip."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        # OCF: mimetype first, STORED (so the magic is byte-addressable)
        z.writestr(zipfile.ZipInfo("mimetype"),
                   "application/epub+zip",
                   compress_type=zipfile.ZIP_STORED)
        z.writestr("META-INF/container.xml", _CONTAINER_XML)
        manifest = []
        spine = []
        if extra_nonlinear is not None:
            z.writestr("OEBPS/cover.xhtml",
                       f"<html><body><p>{_xml_escape(extra_nonlinear)}"
                       "</p></body></html>")
            manifest.append('<item id="cover" href="cover.xhtml" '
                            'media-type="application/xhtml+xml"/>')
            spine.append('<itemref idref="cover" linear="no"/>')
        for i, (ch_title, body) in enumerate(chapters):
            name = f"ch{i + 1:03d}.xhtml"
            z.writestr(
                f"OEBPS/{name}",
                f"<html><head><title>{_xml_escape(ch_title)}</title>"
                f"</head><body><h2>{_xml_escape(ch_title)}</h2>"
                f"{body}</body></html>")
            manifest.append(f'<item id="c{i + 1}" href="{name}" '
                            'media-type="application/xhtml+xml"/>')
            spine.append(f'<itemref idref="c{i + 1}"/>')
        opf = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            f'<package xmlns="{_OPF_NS}" version="3.0" '
            'unique-identifier="uid">\n'
            f' <metadata xmlns:dc="{_DC_NS}">\n'
            f'  <dc:identifier id="uid">urn:synth:1</dc:identifier>\n'
            f'  <dc:title>{_xml_escape(title)}</dc:title>\n'
            f'  <dc:creator>{_xml_escape(creator)}</dc:creator>\n'
            f'  <dc:language>{_xml_escape(language)}</dc:language>\n'
            ' </metadata>\n'
            ' <manifest>\n  ' + "\n  ".join(manifest) + '\n </manifest>\n'
            ' <spine>\n  ' + "\n  ".join(spine) + '\n </spine>\n'
            '</package>')
        z.writestr("OEBPS/content.opf", opf)
    return buf.getvalue()


def read_epub(data: bytes) -> dict:
    """{"title", "creator", "language", "chapters": [(href, xhtml)]}
    — spine-ordered reading content (``linear="no"`` items excluded).
    Raises ValueError on a non-EPUB zip or a broken container chain."""
    try:
        z = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise ValueError(f"epub: not a zip container: {e}") from e
    try:
        mimetype = z.read("mimetype").decode("ascii").strip()
    except KeyError:
        raise ValueError("epub: missing mimetype entry") from None
    if mimetype != "application/epub+zip":
        raise ValueError(f"epub: wrong mimetype {mimetype!r}")
    container = ElementTree.fromstring(z.read("META-INF/container.xml"))
    rootfile = None
    for el in container.iter():
        if el.tag.rsplit("}", 1)[-1] == "rootfile":
            rootfile = el.get("full-path")
            break
    if not rootfile:
        raise ValueError("epub: container.xml lacks a rootfile")
    opf_dir = posixpath.dirname(rootfile)
    opf = ElementTree.fromstring(z.read(rootfile))

    meta = {"title": "", "creator": "", "language": ""}
    items: dict[str, str] = {}
    spine_refs: list[str] = []
    for el in opf.iter():
        tag = el.tag.rsplit("}", 1)[-1]
        if tag in meta and el.text:
            meta[tag] = el.text
        elif tag == "item":
            items[el.get("id", "")] = el.get("href", "")
        elif tag == "itemref":
            if el.get("linear", "yes") != "no":
                spine_refs.append(el.get("idref", ""))
    chapters = []
    for ref in spine_refs:
        href = items.get(ref)
        if not href:
            raise ValueError(f"epub: spine idref {ref!r} not in "
                             "manifest")
        path = posixpath.join(opf_dir, href) if opf_dir else href
        chapters.append((href, z.read(path).decode("utf-8")))
    return {**meta, "chapters": chapters}


def epub_text(data: bytes) -> tuple[str, str, int]:
    """(title, full_text, n_chapters): spine chapters through the
    crawl pipeline's HTML extractor, joined in reading order."""
    book = read_epub(data)
    parts = []
    for _href, xhtml in book["chapters"]:
        text, _n, _lc = extract_text(xhtml)
        parts.append(text)
    return book["title"], " ".join(parts), len(book["chapters"])

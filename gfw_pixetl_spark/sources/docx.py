"""DOCX text extraction (ECMA-376 WordprocessingML inside a ZIP/OPC
package) — after HTML and PDF, the third document format a text corpus
ingests at volume.

The container is handled by the stdlib ``zipfile`` (ZIP is a solved
container; the interesting work is the payload): a .docx is an OPC
package whose main part ``word/document.xml`` holds paragraphs
(``<w:p>``) of runs (``<w:r>``) of text elements (``<w:t>``). This
module extracts text exactly the way every production docx extractor
does:

* text lives ONLY in ``<w:t>`` elements (attributes never carry body
  text); ``xml:space="preserve"`` keeps significant whitespace,
* ``<w:tab/>`` contributes a tab, ``<w:br/>`` and paragraph ends
  contribute line breaks,
* XML character entities decode (&amp; &lt; &gt; &quot; &apos; and
  numeric forms).

A writer builds spec-valid minimal packages ([Content_Types].xml,
_rels/.rels, word/document.xml) so parsing is round-trip testable and
q374's oracle replays the expected text analytically. Per-document
work runs in Arrow ``mapInPandas`` kernels like every codec source.
At corpus scale the ZIP central directory is read from the tail of the
object (one ranged GET) and ``word/document.xml`` from its local
header — the stdlib reader does exactly that over a seekable buffer.
"""

from __future__ import annotations

import io
import re
import zipfile

_CONTENT_TYPES = b"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
</Types>"""

_RELS = b"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
</Relationships>"""

_XML_ENT = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def _xml_unescape(s: str) -> str:
    # shared guarded decoder (functions/html.py) with the XML 1.0
    # predefined entity set — no &nbsp; in XML
    from ..functions.html import decode_entities

    return decode_entities(s, _XML_ENT)


def write_docx(paragraphs: list[str]) -> bytes:
    """A spec-valid minimal .docx: one ``<w:p>`` per paragraph, text in
    ``<w:t xml:space="preserve">`` runs."""
    body = "".join(
        '<w:p><w:r><w:t xml:space="preserve">'
        + _xml_escape(p) + "</w:t></w:r></w:p>"
        for p in paragraphs)
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>' + body
        + "</w:body></w:document>"
    ).encode("utf-8")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


# w:tab stays attribute-less on purpose: an ATTRIBUTED <w:tab .../> is
# a tab-STOP definition inside <w:tabs> (paragraph properties), not a
# text tab. Breaks DO carry attributes (<w:br w:type="page"/>), and
# Word also emits <w:cr/> for carriage returns.
_WT_RE = re.compile(
    r"<w:t(?:\s[^>]*)?>(.*?)</w:t>|<w:tab\s*/>|<w:br[^>]*/>|<w:cr\s*/>"
    r"|</w:p>",
    re.DOTALL)


def extract_docx_text(data: bytes) -> str:
    """Paragraph-joined visible text of a .docx: w:t contents with
    entities decoded, tabs/breaks/paragraph-ends as separators.
    Raises on a non-zip payload or a package without the main part."""
    try:
        z = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not a ZIP/OPC package: {e}") from None
    try:
        xml = z.read("word/document.xml").decode("utf-8")
    except KeyError:
        raise ValueError(
            "OPC package without word/document.xml (not a docx)"
        ) from None
    parts: list[str] = []
    for m in _WT_RE.finditer(xml):
        if m.group(1) is not None:  # a <w:t>...</w:t> capture
            parts.append(_xml_unescape(m.group(1)))
        elif m.group(0).startswith("<w:tab"):
            parts.append("\t")
        else:  # <w:br/> or </w:p>
            parts.append("\n")
    text = "".join(parts)
    # collapse the structural separators, keep in-run whitespace
    text = re.sub(r"[ \t]*\n[ \t\n]*", "\n", text).strip("\n")
    return text

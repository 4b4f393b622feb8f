"""MediaWiki XML dump ingest + wikitext cleaning — the Wikipedia dump
(`*-pages-articles.xml`) is a staple pretraining source, and its
markup is NOT HTML: links, templates, refs, quotes, headings and
tables follow the wikitext grammar (mediawiki.org/wiki/Help:Wikitext).

* ``write_dump`` — a spec-shaped dump writer (<mediawiki><siteinfo>
  then one <page> per article with <ns>/<id>/<redirect?>/<revision>/
  <text>), used to build fixtures that the reader must round-trip,
* ``iter_pages`` — streaming page reader over the XML (stdlib
  ``iterparse`` with element eviction, so a multi-GB dump never
  materializes; one <page> element resident at a time),
* ``wikitext_to_text`` — the markup stripper: nested ``{{templates}}``
  removed, ``[[File:...]]``/``[[Image:...]]`` blocks removed (bracket
  depth aware — captions contain nested links), ``[[target|label]]``
  -> label, ``[[target]]`` -> target, external ``[url label]`` ->
  label, ``<ref>...</ref>`` and HTML comments dropped, bold/italic
  quote runs unwrapped, ``== headings ==`` kept as their text, list
  markers and table blocks (``{| ... |}``) dropped, whitespace
  collapsed,
* ``extract_links`` — ordered internal-link targets (namespace-
  prefixed File:/Image:/Category: links excluded), the input of a
  link-graph build.

Scale shape: a dump shards naturally at <page> boundaries; each page
cleans independently inside an Arrow kernel (the WARC/html pattern).
The oracle for q429 constructs pages whose cleaned text and link sets
are analytic, so a grammar bug cannot hide on both sides.
"""
from __future__ import annotations

import io
import re
from xml.etree import ElementTree
from xml.sax.saxutils import escape

_NS = "http://www.mediawiki.org/xml/export-0.11/"


def write_dump(pages: list[dict], site_name: str = "synthwiki") -> bytes:
    """pages: [{"title", "id", "text", "ns"?, "redirect"?}] -> a
    dump-shaped XML document."""
    out = io.StringIO()
    out.write(f'<mediawiki xmlns="{_NS}" xml:lang="en">\n')
    out.write(f"  <siteinfo><sitename>{escape(site_name)}</sitename>"
              "<dbname>synthwiki</dbname></siteinfo>\n")
    for p in pages:
        out.write("  <page>\n")
        out.write(f"    <title>{escape(str(p['title']))}</title>\n")
        out.write(f"    <ns>{int(p.get('ns', 0))}</ns>\n")
        out.write(f"    <id>{int(p['id'])}</id>\n")
        if p.get("redirect"):
            out.write(f'    <redirect title='
                      f'"{escape(str(p["redirect"]))}" />\n')
        out.write("    <revision>\n")
        out.write(f"      <id>{int(p['id']) * 10}</id>\n")
        out.write('      <text bytes="%d">%s</text>\n'
                  % (len(str(p["text"]).encode()),
                     escape(str(p["text"]))))
        out.write("    </revision>\n")
        out.write("  </page>\n")
    out.write("</mediawiki>\n")
    return out.getvalue().encode()


def iter_pages(xml_bytes: bytes):
    """Yield {"title", "ns", "id", "redirect", "text"} per <page>,
    streaming: completed page elements are cleared immediately, so
    memory stays O(one page) regardless of dump size."""
    src = io.BytesIO(xml_bytes)
    for _event, elem in ElementTree.iterparse(src, events=("end",)):
        if elem.tag.rsplit("}", 1)[-1] != "page":
            continue

        def find(name: str):
            for child in elem.iter():
                if child.tag.rsplit("}", 1)[-1] == name:
                    return child
            return None

        text_el = find("text")
        redirect_el = find("redirect")
        yield {
            "title": (find("title").text or ""),
            "ns": int(find("ns").text or 0),
            "id": int(find("id").text or 0),
            "redirect": (redirect_el.get("title")
                         if redirect_el is not None else None),
            "text": (text_el.text or "") if text_el is not None else "",
        }
        elem.clear()


def _strip_nested(s: str, open_tok: str, close_tok: str) -> str:
    """Remove depth-aware ``open_tok ... close_tok`` spans (templates,
    File links with nested [[...]] in captions)."""
    out = []
    depth = 0
    i = 0
    n = len(s)
    lo, lc = len(open_tok), len(close_tok)
    while i < n:
        if s.startswith(open_tok, i):
            depth += 1
            i += lo
        elif depth and s.startswith(close_tok, i):
            depth -= 1
            i += lc
        elif depth:
            i += 1
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


_FILE_LINK = re.compile(r"\[\[(?:File|Image|Category):", re.IGNORECASE)


def _drop_file_links(s: str) -> str:
    """Remove ``[[File:...]]`` / ``[[Image:...]]`` / ``[[Category:...]]``
    blocks, honoring nested ``[[...]]`` inside captions."""
    out = []
    i = 0
    n = len(s)
    while i < n:
        m = _FILE_LINK.match(s, i)
        if m:
            depth = 1
            j = m.end()
            while j < n and depth:
                if s.startswith("[[", j):
                    depth += 1
                    j += 2
                elif s.startswith("]]", j):
                    depth -= 1
                    j += 2
                else:
                    j += 1
            i = j
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


_LINK = re.compile(r"\[\[([^\[\]|]*)(?:\|([^\[\]]*))?\]\]")
_EXT_LINK = re.compile(r"\[(?:https?|ftp)://\S*(?:\s+([^\]]*))?\]")
_REF = re.compile(r"<ref[^>/]*>.*?</ref>|<ref[^>]*/>",
                  re.DOTALL | re.IGNORECASE)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_HEADING = re.compile(r"^(={2,6})\s*(.*?)\s*\1\s*$", re.MULTILINE)
_LIST_MARK = re.compile(r"^[*#;:]+\s*", re.MULTILINE)
_TABLE = re.compile(r"^\{\|.*?^\|\}", re.DOTALL | re.MULTILINE)
_TAG = re.compile(r"</?[A-Za-z][^>]*>")


def wikitext_to_text(src: str) -> str:
    """Visible text of a wikitext page (the q372 discipline: every
    rule is deterministic so an oracle can construct expected
    output)."""
    s = _COMMENT.sub(" ", src)
    s = _REF.sub(" ", s)
    s = _TABLE.sub(" ", s)
    s = _strip_nested(s, "{{", "}}")
    s = _drop_file_links(s)
    s = _LINK.sub(lambda m: m.group(2) if m.group(2) is not None
                  else m.group(1), s)
    s = _EXT_LINK.sub(lambda m: m.group(1) or " ", s)
    s = _HEADING.sub(lambda m: m.group(2), s)
    s = _LIST_MARK.sub("", s)
    s = s.replace("'''", "").replace("''", "")
    s = _TAG.sub(" ", s)
    return re.sub(r"\s+", " ", s).strip()


def extract_links(src: str) -> list[str]:
    """Ordered internal-link targets, excluding namespace-prefixed
    File/Image/Category links and templates."""
    s = _COMMENT.sub(" ", src)
    s = _strip_nested(s, "{{", "}}")
    s = _drop_file_links(s)
    out = []
    for m in _LINK.finditer(s):
        target = m.group(1).strip()
        if target:
            out.append(target)
    return out

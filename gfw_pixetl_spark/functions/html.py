"""HTML text extraction — the trafilatura/jusText step of a crawl
pipeline, reduced to its deterministic core: strip markup, drop
non-content elements, decode entities, normalize whitespace, and
measure link density (the classic boilerplate signal).

Pure-Python state machine (no html.parser dependency on recovery
behavior): ``script``/``style``/``noscript``/``template`` subtrees and
comments are dropped wholesale, every other tag becomes a whitespace
boundary, character/numeric entities decode, and runs of whitespace
collapse to single spaces. Link density = visible characters inside
<a> / total visible characters.

Runs as an Arrow ``mapInPandas`` kernel (grammar work, same shape as
the codec kernels). q372 value-checks extraction + link density
against an analytic oracle built from the same generated structure —
never a second parser.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_DROP = {"script", "style", "noscript", "template"}
_ENT = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
        "nbsp": " "}


def decode_entities(s: str, entities: dict[str, str] | None = None) -> str:
    """Character-reference decode shared by the HTML and XML (docx)
    extractors: named entities from ``entities`` (default: the HTML
    core set), numeric decimal/hex forms; malformed or out-of-range
    references pass through literally (never raise)."""
    table = _ENT if entities is None else entities

    def sub(m: re.Match) -> str:
        body = m.group(1)
        try:
            if body.startswith("#x") or body.startswith("#X"):
                return chr(int(body[2:], 16))
            if body.startswith("#"):
                return chr(int(body[1:]))
        except (ValueError, OverflowError):
            return m.group(0)
        return table.get(body, m.group(0))

    return re.sub(r"&(#?[0-9a-zA-Z]+);", sub, s)


_decode_entities = decode_entities  # internal alias (pre-refactor name)


def extract_text(html: str) -> tuple[str, int, int]:
    """(visible_text, n_visible_chars, n_link_chars): markup stripped,
    drop-subtrees removed, entities decoded, whitespace collapsed.
    Character counts are measured on the collapsed text, with link
    chars counted inside <a>...</a> spans."""
    out: list[str] = []
    link_depth = 0
    link_chars = 0
    i, n = 0, len(html)
    while i < n:
        c = html[i]
        if c == "<":
            if html.startswith("<!--", i):
                end = html.find("-->", i + 4)
                i = n if end < 0 else end + 3
                continue
            end = html.find(">", i + 1)
            if end < 0:
                break  # unterminated tag: stop at it
            tag_body = html[i + 1:end].strip()
            i = end + 1
            closing = tag_body.startswith("/")
            name = re.split(r"[\s/>]", tag_body.lstrip("/"), 1)[0].lower()
            if not closing and name in _DROP:
                if tag_body.endswith("/"):
                    continue  # self-closed: no subtree to drop
                # HTML5 raw-text rule: the element body is NOT markup —
                # a '<' inside `if (a<b)` must not be parsed as a tag;
                # skip straight to the matching close tag
                m = re.search(rf"</{name}\b[^>]*>", html[i:],
                              re.IGNORECASE)
                i = n if m is None else i + m.end()
                continue
            if name == "a":
                if closing:
                    link_depth = max(0, link_depth - 1)
                elif not tag_body.endswith("/"):
                    link_depth += 1
            out.append(" ")  # every tag is a word boundary
            continue
        # text run up to the next tag
        nxt = html.find("<", i)
        if nxt < 0:
            nxt = n
        chunk = _decode_entities(html[i:nxt])
        out.append(chunk)
        if link_depth > 0:
            link_chars += len(re.sub(r"\s+", " ", chunk).strip())
        i = nxt
    text = re.sub(r"\s+", " ", "".join(out)).strip()
    return text, len(text), link_chars


HTML_SCHEMA = ("doc_id long, text string, n_chars int, link_chars int, "
               "link_density double")


def html_extract(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Extract visible text + link density per row (Arrow kernel)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, texts, ncs, lcs, lds = [], [], [], [], []
            for doc_id, h in zip(pdf["doc_id"], pdf[html_col]):
                t, nc, lc = extract_text(h)
                ids.append(doc_id)
                texts.append(t)
                ncs.append(nc)
                lcs.append(lc)
                lds.append(round(lc / nc, 6) if nc else 0.0)
            yield pd.DataFrame({
                "doc_id": ids, "text": texts, "n_chars": ncs,
                "link_chars": lcs, "link_density": lds,
            })

    return df.select("doc_id", html_col).mapInPandas(kernel, HTML_SCHEMA)


def sniff_charset(body: bytes, content_type: str = "") -> str:
    """Charset of an HTML payload, in the precedence real browsers and
    crawlers apply (WHATWG encoding sniffing, abridged): byte-order
    mark first, then the Content-Type header's charset parameter, then
    a ``<meta charset>`` / ``<meta http-equiv>`` declaration scanned in
    the first 1024 bytes, else UTF-8."""
    if body.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if body.startswith(b"\xff\xfe") or body.startswith(b"\xfe\xff"):
        # the BOM-consuming codec: endianness from the BOM itself,
        # and the U+FEFF never leaks into the decoded text (same
        # contract as utf-8-sig above)
        return "utf-16"
    m = re.search(r"charset\s*=\s*[\"']?([\w.-]+)", content_type,
                  re.IGNORECASE)
    if m:
        return m.group(1).lower()
    head = body[:1024].decode("latin-1", "replace")
    m = re.search(r"<meta\s+charset\s*=\s*[\"']?([\w.-]+)", head,
                  re.IGNORECASE)
    if m:
        return m.group(1).lower()
    m = re.search(
        r"<meta[^>]+http-equiv\s*=\s*[\"']?content-type[\"']?[^>]*"
        r"charset=([\w.-]+)", head, re.IGNORECASE)
    if m:
        return m.group(1).lower()
    return "utf-8"


_BLOCK_TAGS = {"p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6",
               "td", "th", "article", "section", "blockquote", "pre",
               "header", "footer", "nav", "aside", "ul", "ol",
               "table", "tr", "body", "main", "figure"}
_BOILER_CONTAINERS = {"nav", "footer", "aside", "header"}


def split_blocks(html: str) -> list[dict]:
    """Block-level segmentation of a page: one dict per non-empty
    block — {"text", "n_chars", "link_chars", "boiler"} — where
    ``boiler`` marks blocks inside <nav>/<footer>/<aside>/<header>
    containers.  The tag walker matches ``extract_text`` (dropped
    subtrees, entity decode, whitespace collapse); block-level tags
    additionally FLUSH the current block."""
    blocks: list[dict] = []
    buf: list[str] = []
    link_chars = 0
    link_depth = 0
    boiler_depth = 0

    def flush() -> None:
        nonlocal buf, link_chars
        text = re.sub(r"\s+", " ", "".join(buf)).strip()
        if text:
            blocks.append({"text": text, "n_chars": len(text),
                           "link_chars": link_chars,
                           "boiler": boiler_depth > 0})
        buf = []
        link_chars = 0

    i, n = 0, len(html)
    while i < n:
        c = html[i]
        if c == "<":
            if html.startswith("<!--", i):
                end = html.find("-->", i + 4)
                i = n if end < 0 else end + 3
                continue
            end = html.find(">", i + 1)
            if end < 0:
                break
            tag_body = html[i + 1:end].strip()
            i = end + 1
            closing = tag_body.startswith("/")
            name = re.split(r"[\s/>]", tag_body.lstrip("/"), 1)[0].lower()
            if not closing and name in _DROP:
                if tag_body.endswith("/"):
                    continue
                m = re.search(rf"</{name}\b[^>]*>", html[i:],
                              re.IGNORECASE)
                i = n if m is None else i + m.end()
                continue
            if name in _BLOCK_TAGS:
                flush()
                if name in _BOILER_CONTAINERS:
                    if closing:
                        boiler_depth = max(0, boiler_depth - 1)
                    elif not tag_body.endswith("/"):
                        boiler_depth += 1
            if name == "a":
                if closing:
                    link_depth = max(0, link_depth - 1)
                elif not tag_body.endswith("/"):
                    link_depth += 1
            buf.append(" ")
            continue
        nxt = html.find("<", i)
        if nxt < 0:
            nxt = n
        chunk = _decode_entities(html[i:nxt])
        buf.append(chunk)
        if link_depth > 0:
            link_chars += len(re.sub(r"\s+", " ", chunk).strip())
        i = nxt
    flush()
    return blocks


def main_content(html: str, min_chars: int = 25,
                 max_link_density: float = 0.5) -> tuple[str, int, int]:
    """Readability-style main-content extraction: (main_text,
    n_blocks, n_kept).  A block survives iff it is not inside a
    boilerplate container, is at least ``min_chars`` long, and its
    link density is at most ``max_link_density`` — the deterministic
    core of the trafilatura/jusText heuristics (no ML scoring, so an
    oracle can replay the decision per block)."""
    blocks = split_blocks(html)
    kept = [b for b in blocks
            if not b["boiler"]
            and b["n_chars"] >= min_chars
            and b["link_chars"] <= max_link_density * b["n_chars"]]
    return (" ".join(b["text"] for b in kept), len(blocks), len(kept))

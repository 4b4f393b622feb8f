"""Minimal-but-real PDF text extraction over the PUBLIC ISO 32000-1
spec — the other container every document corpus ships besides HTML.

Scope (stated, not padded): classic cross-reference TABLES (`xref` /
`trailer`, single section + `/Prev` chains), indirect object
resolution, `/FlateDecode` streams with direct or indirect `/Length`,
the `Catalog -> Pages -> Kids` page-tree walk (nested trees, `Contents`
as one stream or an array), and text extraction from content streams:
`Tj`, `'` and `TJ` show operators (TJ kerning numbers dropped),
literal strings with the full escape set (\\n \\r \\t \\b \\f \\( \\)
\\\\ \\ddd octal + line continuations), hex strings `<...>`, and
`Td/TD/T*` treated as word boundaries. NOT implemented — and raising
clearly, never mis-parsing: cross-reference STREAMS (PDF 1.5 compressed
xref), encryption, and non-Flate filters. That covers the
digitally-born report/paper PDFs a text corpus actually wants; scanned
PDFs need OCR anyway.

Includes a writer for spec-valid fixtures (Helvetica, per-page content
streams, optional Flate compression, correct xref offsets), so the
parser is round-trip-testable and q373's oracle can replay the
extracted text analytically. Per-document work runs in Arrow
``mapInPandas`` kernels, the same shape as every other codec source.
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------------------
# Writer (fixtures)
# ---------------------------------------------------------------------------


def _esc(s: str) -> str:
    if any(ord(c) > 0xFF for c in s):
        raise ValueError(
            "write_pdf shows text through a simple (latin-1-encodable) "
            "font; characters above U+00FF need a CID-keyed font, which "
            "is out of scope (module docstring)")
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def write_pdf(pages: list[list[str]], compress: bool = True) -> bytes:
    """Write one text line list per page as a spec-valid PDF 1.4 file:
    catalog, pages tree, Helvetica, one content stream per page
    (optionally FlateDecode), classic xref table + trailer."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)  # 1-based object number

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    content_ids = []
    for lines in pages:
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for i, line in enumerate(lines):
            if i:
                ops.append("0 -14 Td")
            ops.append(f"({_esc(line)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1")
        if compress:
            stream = zlib.compress(stream)
            head = b"<< /Filter /FlateDecode /Length %d >>" % len(stream)
        else:
            head = b"<< /Length %d >>" % len(stream)
        content_ids.append(add(
            head + b"\nstream\n" + stream + b"\nendstream"))

    pages_id = len(objs) + len(pages) + 1  # after the page objects
    page_ids = [
        add(b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> "
            b"/Contents %d 0 R >>" % (pages_id, font, ci))
        for ci in content_ids
    ]
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    real_pages_id = add(
        b"<< /Type /Pages /Kids [%s] /Count %d >>"
        % (kids, len(page_ids)))
    assert real_pages_id == pages_id
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root %d 0 R >>\n"
            b"startxref\n%d\n%%%%EOF" % (len(objs) + 1, catalog, xref_at))
    return bytes(out)


# ---------------------------------------------------------------------------
# Object parser
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_NAME_RE = re.compile(rb"/([^\x00\t\n\x0c\r ()<>\[\]{}/%]*)")


class Ref:
    __slots__ = ("num",)

    def __init__(self, num: int) -> None:
        self.num = num

    def __repr__(self) -> str:  # pragma: no cover
        return f"Ref({self.num})"


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d = self.data
        while self.pos < len(d):
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                e = d.find(b"\n", self.pos)
                self.pos = len(d) if e < 0 else e + 1
            else:
                return

    def parse_value(self):
        self._skip_ws()
        d, p = self.data, self.pos
        if d.startswith(b"<<", p):
            return self._parse_dict()
        if d.startswith(b"[", p):
            return self._parse_array()
        if d.startswith(b"(", p):
            return self._parse_string()
        if d.startswith(b"<", p):
            return self._parse_hex_string()
        if d.startswith(b"/", p):
            return self._parse_name()
        for lit, val in ((b"true", True), (b"false", False),
                         (b"null", None)):
            if d.startswith(lit, p):
                self.pos = p + len(lit)
                return val
        m = re.match(rb"(\d+)\s+(\d+)\s+R\b", d[p:p + 32])
        if m:
            self.pos = p + m.end()
            return Ref(int(m.group(1)))
        m = re.match(rb"[+-]?(\d+\.\d*|\.\d+|\d+)", d[p:p + 64])
        if m:
            self.pos = p + m.end()
            tok = m.group(0)
            return float(tok) if b"." in tok else int(tok)
        raise ValueError(f"PDF: cannot parse value at byte {p}")

    def _parse_name(self) -> str:
        # anchored match at pos (never slice: a dict-heavy PDF would
        # copy the buffer tail per name token — quadratic)
        m = _NAME_RE.match(self.data, self.pos)
        self.pos = m.end()
        name = m.group(1)
        # #xx hex escapes in names
        name = re.sub(rb"#([0-9A-Fa-f]{2})",
                      lambda mm: bytes([int(mm.group(1), 16)]), name)
        return name.decode("latin-1")

    def _parse_dict(self) -> dict:
        self.pos += 2
        out = {}
        while True:
            self._skip_ws()
            if self.data.startswith(b">>", self.pos):
                self.pos += 2
                return out
            key = self._parse_name()
            out[key] = self.parse_value()

    def _parse_array(self) -> list:
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.data.startswith(b"]", self.pos):
                self.pos += 1
                return out
            out.append(self.parse_value())

    def _parse_string(self) -> bytes:
        d = self.data
        p = self.pos + 1
        depth = 1
        out = bytearray()
        while p < len(d):
            c = d[p]
            if c == 0x5C:  # backslash
                nxt = d[p + 1:p + 2]
                esc = {b"n": b"\n", b"r": b"\r", b"t": b"\t",
                       b"b": b"\b", b"f": b"\x0c", b"(": b"(",
                       b")": b")", b"\\": b"\\"}
                if nxt in esc:
                    out += esc[nxt]
                    p += 2
                elif nxt in (b"0", b"1", b"2", b"3", b"4", b"5", b"6",
                             b"7"):
                    m = re.match(rb"[0-7]{1,3}", d[p + 1:p + 4])
                    out.append(int(m.group(0), 8) & 0xFF)
                    p += 1 + m.end()
                elif nxt in (b"\n", b"\r"):  # line continuation
                    p += 2
                    if nxt == b"\r" and d[p:p + 1] == b"\n":
                        p += 1
                else:
                    p += 1  # lone backslash: dropped per spec
            elif c == 0x28:
                depth += 1
                out.append(c)
                p += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos = p + 1
                    return bytes(out)
                out.append(c)
                p += 1
            else:
                out.append(c)
                p += 1
        raise ValueError("PDF: unterminated string")

    def _parse_hex_string(self) -> bytes:
        e = self.data.index(b">", self.pos)
        hexs = re.sub(rb"\s", b"", self.data[self.pos + 1:e])
        if len(hexs) % 2:
            hexs += b"0"
        self.pos = e + 1
        return bytes.fromhex(hexs.decode("ascii"))


class PdfDocument:
    """Parsed PDF: xref-table chain, object resolution, page walk."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        if not data.startswith(b"%PDF-"):
            raise ValueError("not a PDF (missing %PDF- header)")
        self.xref: dict[int, int] = {}
        self.trailer: dict = {}
        self._load_xref_chain()
        self._cache: dict[int, object] = {}

    def _load_xref_chain(self) -> None:
        tail = self.data[-2048:]
        matches = list(re.finditer(rb"startxref\s+(\d+)", tail))
        if not matches:
            raise ValueError("PDF: no startxref")
        # the LAST startxref governs: incremental updates append a new
        # xref + trailer + startxref after the original ones
        at = int(matches[-1].group(1))
        seen = set()
        while at and at not in seen:
            seen.add(at)
            at = self._load_xref_section(at)

    def _load_xref_section(self, at: int) -> int:
        d = self.data
        if not d.startswith(b"xref", at):
            raise ValueError(
                "PDF: cross-reference streams (PDF 1.5 compressed xref) "
                "are not supported; classic xref tables only")
        lex = _Lexer(d, at + 4)
        while True:
            lex._skip_ws()
            if d.startswith(b"trailer", lex.pos):
                lex.pos += 7
                trailer = lex.parse_value()
                for k, v in trailer.items():
                    self.trailer.setdefault(k, v)
                return int(trailer.get("Prev", 0))
            m = re.match(rb"(\d+)\s+(\d+)", d[lex.pos:lex.pos + 64])
            if not m:
                raise ValueError("PDF: malformed xref subsection header")
            first, count = int(m.group(1)), int(m.group(2))
            lex.pos += m.end()
            lex._skip_ws()
            for i in range(count):
                entry = d[lex.pos:lex.pos + 20]
                off, _gen, kind = entry[:10], entry[11:16], entry[17:18]
                if kind == b"n":
                    self.xref.setdefault(first + i, int(off))
                elif kind == b"f":
                    # freed in a NEWER section must shadow older 'n'
                    # entries from the /Prev chain (incremental delete)
                    self.xref.setdefault(first + i, -1)
                lex.pos += 20

    def obj(self, num: int):
        if num in self._cache:
            return self._cache[num]
        at = self.xref.get(num)
        if at is None or at < 0:
            raise ValueError(f"PDF: object {num} is "
                             f"{'freed' if at is not None else 'absent'}")
        m = re.match(rb"(\d+)\s+(\d+)\s+obj", self.data[at:at + 48])
        if not m or int(m.group(1)) != num:
            raise ValueError(f"PDF: xref offset for {num} is wrong")
        lex = _Lexer(self.data, at + m.end())
        val = lex.parse_value()
        lex._skip_ws()
        if self.data.startswith(b"stream", lex.pos):
            p = lex.pos + 6
            if self.data[p:p + 2] == b"\r\n":
                p += 2
            elif self.data[p:p + 1] == b"\n":
                p += 1
            n = self.resolve(val.get("Length"))
            raw = self.data[p:p + int(n)]
            filt = self.resolve(val.get("Filter"))
            if filt == "FlateDecode":
                raw = zlib.decompress(raw)
            elif filt is not None:
                raise ValueError(f"PDF: unsupported filter {filt!r}")
            val = {"__dict__": val, "__stream__": raw}
        self._cache[num] = val
        return val

    def resolve(self, v):
        while isinstance(v, Ref):
            v = self.obj(v.num)
        return v

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer["Root"])
        out: list[dict] = []

        def walk(node) -> None:
            node = self.resolve(node)
            if node.get("Type") == "Pages" or "Kids" in node:
                for kid in self.resolve(node["Kids"]):
                    walk(kid)
            else:
                out.append(node)

        walk(root["Pages"])
        return out

    def page_text(self, page: dict) -> str:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return ""  # /Contents is optional: an empty page is valid
        streams = contents if isinstance(contents, list) else [contents]
        chunks: list[bytes] = []
        for s in streams:
            s = self.resolve(s)
            if not isinstance(s, dict) or "__stream__" not in s:
                raise ValueError("PDF: page /Contents is not a stream")
            chunks.append(s["__stream__"])
        return extract_content_text(b"\n".join(chunks))

    def text(self) -> str:
        return "\n".join(self.page_text(p) for p in self.pages())


_OP_RE = re.compile(rb"[A-Za-z'\"*]+")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)")


def extract_content_text(stream: bytes) -> str:
    """Text shown by a content stream: Tj / ' / TJ operands, with
    Td/TD/T* treated as word boundaries. Manual scan — string operands
    go through the real lexer (nested parens, escapes, hex), numbers
    and names are pushed as positioning operands, operators consume
    the stack."""
    out: list[str] = []
    stack: list[object] = []

    def shown(v) -> None:
        if isinstance(v, bytes):
            out.append(v.decode("latin-1"))

    lex = _Lexer(stream)
    i, n = 0, len(stream)
    while i < n:
        c = stream[i:i + 1]
        if c in (b" ", b"\t", b"\r", b"\n", b"\x0c", b"\x00"):
            i += 1
            continue
        if c == b"(":
            lex.pos = i
            stack.append(lex._parse_string())
            i = lex.pos
            continue
        if c == b"<" and stream[i:i + 2] != b"<<":
            lex.pos = i
            stack.append(lex._parse_hex_string())
            i = lex.pos
            continue
        if c in (b"[", b"]", b"{", b"}"):
            i += 1
            continue
        if c == b"/":
            m = _NAME_RE.match(stream, i)
            i = m.end()
            continue
        if c == b"<":  # inline dict (BDC/DP operands): skip to >>
            e = stream.find(b">>", i)
            i = n if e < 0 else e + 2
            continue
        m = _NUM_RE.match(stream, i)
        if m:
            i = m.end()
            continue  # kerning / positioning operand
        m = _OP_RE.match(stream, i)
        if m:
            op = m.group(0)
            i = m.end()
            if op == b"Tj" and stack:
                shown(stack[-1])
            elif op in (b"'", b'"') and stack:
                out.append(" ")
                shown(stack[-1])
            elif op == b"TJ":
                for v in stack:
                    shown(v)
            elif op in (b"Td", b"TD", b"T*", b"BT"):
                out.append(" ")  # new line / new text object = boundary
            stack = []
            continue
        i += 1  # unknown byte: skip
    text = re.sub(r"\s+", " ", "".join(out)).strip()
    return text


def extract_pdf_text(data: bytes) -> str:
    """Whole-document text: pages joined with newlines, per-page text
    whitespace-normalized."""
    return PdfDocument(data).text()

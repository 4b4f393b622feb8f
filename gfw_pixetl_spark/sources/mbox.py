"""Pure-Python mbox + MIME message codec — mailing-list archives and
support-ticket dumps are a standing LLM-corpus source, and they arrive
as mbox files of RFC 5322 messages with MIME multipart bodies. The
formats are public (RFC 4155 mbox, RFC 5322 message syntax, RFC 2045/
2046 MIME, RFC 2047 encoded words); implement them from the specs, the
``sources/wav.py`` discipline. Tests cross-validate against CPython's
``email`` package (an independent implementation of the same RFCs).

Scope:
- mboxo splitting on ``From `` separator lines with ``>From`` quoting
  (write) and unquoting (read);
- header block parse: CRLF or LF line endings, folded-header unfolding
  (RFC 5322 2.2.3), case-insensitive names, last-wins duplicates kept
  as a list;
- RFC 2047 encoded words in header values (B and Q encodings, UTF-8 /
  latin-1 charsets, adjacent-word space elision);
- MIME multipart walk: nested ``multipart/*`` boundary recursion,
  ``Content-Transfer-Encoding`` base64 / quoted-printable / 7bit /
  8bit / binary per part;
- quoted-printable codec written from RFC 2045 6.7 (soft line breaks,
  trailing-space protection) — cross-checked against ``quopri``.
"""

from __future__ import annotations

import base64
import re


# --------------------------------------------------------------------------
# quoted-printable (RFC 2045 6.7)
# --------------------------------------------------------------------------

_QP_SAFE = set(range(33, 127)) - {ord("=")}


def qp_encode(data: bytes, line_len: int = 76) -> bytes:
    out = bytearray()
    line = 0
    n = len(data)
    for i, b in enumerate(data):
        at_eol = i + 1 == n or data[i + 1:i + 2] == b"\n"
        if b == 0x0A:  # hard line break stays literal
            if out[-1:] in (b" ", b"\t"):  # protect trailing whitespace
                tail = out[-1]
                del out[-1]
                out += f"={tail:02X}".encode()
            out.append(b)
            line = 0
            continue
        if b in _QP_SAFE or (b in (0x20, 0x09) and not at_eol):
            enc = bytes([b])
        else:
            enc = f"={b:02X}".encode()
        if line + len(enc) > line_len - 1:
            out += b"=\n"  # soft break
            line = 0
        out += enc
        line += len(enc)
    return bytes(out)


def qp_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b == ord("="):
            if data[i + 1:i + 2] == b"\n":
                i += 2  # soft line break
                continue
            if data[i + 1:i + 3] == b"\r\n":
                i += 3
                continue
            hx = data[i + 1:i + 3]
            if len(hx) == 2 and all(c in b"0123456789ABCDEFabcdef"
                                    for c in hx):
                out.append(int(hx, 16))
                i += 3
                continue
            out.append(b)  # lone '=' passes through (tolerant decode)
            i += 1
        else:
            out.append(b)
            i += 1
    return bytes(out)


# --------------------------------------------------------------------------
# RFC 2047 encoded words
# --------------------------------------------------------------------------

_EW = re.compile(r"=\?([^?]+)\?([bBqQ])\?([^?]*)\?=")


def encode_word(text: str, charset: str = "utf-8",
                encoding: str = "B") -> str:
    raw = text.encode(charset)
    if encoding.upper() == "B":
        return f"=?{charset}?B?{base64.b64encode(raw).decode()}?="
    enc = []
    for b in raw:
        if b == 0x20:
            enc.append("_")
        elif 33 <= b <= 126 and b not in (ord("="), ord("?"), ord("_")):
            enc.append(chr(b))
        else:
            enc.append(f"={b:02X}")
    return f"=?{charset}?Q?{''.join(enc)}?="


def decode_header_value(value: str) -> str:
    """Decode RFC 2047 encoded words; whitespace BETWEEN two encoded
    words is elided (RFC 2047 6.2), other text passes through."""
    out = []
    pos = 0
    prev_end_was_ew = False
    for m in _EW.finditer(value):
        gap = value[pos:m.start()]
        if not (prev_end_was_ew and gap.strip() == ""):
            out.append(gap)
        charset, enc, payload = m.group(1), m.group(2).upper(), m.group(3)
        if enc == "B":
            raw = base64.b64decode(payload)
        else:
            raw = qp_decode(payload.replace("_", " ").encode("ascii"))
        out.append(raw.decode(charset, errors="replace"))
        pos = m.end()
        prev_end_was_ew = True
    out.append(value[pos:])
    return "".join(out)


# --------------------------------------------------------------------------
# message parse (RFC 5322 + MIME)
# --------------------------------------------------------------------------


def _split_headers(data: bytes) -> tuple[list[tuple[str, str]], bytes]:
    for sep in (b"\r\n\r\n", b"\n\n"):
        cut = data.find(sep)
        if cut >= 0:
            head, body = data[:cut], data[cut + len(sep):]
            break
    else:
        head, body = data, b""
    lines = head.replace(b"\r\n", b"\n").split(b"\n")
    headers: list[tuple[str, str]] = []
    for line in lines:
        if line[:1] in (b" ", b"\t") and headers:  # folded continuation
            name, val = headers[-1]
            headers[-1] = (name, val + " " + line.strip().decode(
                "utf-8", errors="replace"))
            continue
        if b":" not in line:
            continue
        name, _, val = line.partition(b":")
        headers.append((name.decode("ascii", errors="replace").strip(),
                        val.strip().decode("utf-8", errors="replace")))
    return headers, body


def _header(headers: list[tuple[str, str]], name: str) -> str | None:
    for k, v in headers:
        if k.lower() == name.lower():
            return v
    return None


_PARAM = re.compile(r'([\w-]+)\s*=\s*(?:"([^"]*)"|([^;\s]+))')


def _content_type(headers) -> tuple[str, dict]:
    raw = _header(headers, "Content-Type") or "text/plain"
    mtype = raw.split(";", 1)[0].strip().lower()
    params = {m.group(1).lower(): (m.group(2) or m.group(3))
              for m in _PARAM.finditer(raw.split(";", 1)[1])} \
        if ";" in raw else {}
    return mtype, params


def _decode_body(body: bytes, cte: str | None) -> bytes:
    cte = (cte or "7bit").strip().lower()
    if cte == "base64":
        return base64.b64decode(
            re.sub(rb"[^A-Za-z0-9+/=]", b"", body))
    if cte == "quoted-printable":
        return qp_decode(body)
    if cte in ("7bit", "8bit", "binary"):
        return body
    raise ValueError(f"unknown Content-Transfer-Encoding {cte!r}")


def parse_message(data: bytes) -> dict:
    """Parse one RFC 5322 message -> {'headers': [(name, value)...],
    'subject': decoded subject, 'parts': [{'type', 'params',
    'payload' (decoded bytes)}]}. Non-multipart messages yield one
    part; nested multiparts flatten depth-first."""
    headers, body = _split_headers(data)
    subject = decode_header_value(_header(headers, "Subject") or "")
    parts: list[dict] = []
    _walk_part(headers, body, parts)
    return {"headers": headers, "subject": subject, "parts": parts}


def _walk_part(headers, body: bytes, out: list[dict]) -> None:
    mtype, params = _content_type(headers)
    if mtype.startswith("multipart/"):
        boundary = params.get("boundary")
        if not boundary:
            raise ValueError("multipart without boundary parameter")
        # RFC 2046 5.1.1: the delimiter only counts at a line start
        # (preceded by CRLF); a body line merely CONTAINING the
        # delimiter substring must not split the part
        delim = re.compile(
            rb"(?:\r\n|\n|\A)--" + re.escape(boundary.encode("ascii")))
        chunks = delim.split(body)
        # chunks[0] is the preamble; a chunk starting with '--' is the
        # closing delimiter
        for chunk in chunks[1:]:
            if chunk[:2] == b"--":
                break
            # the delimiter regex consumed the CRLF that precedes each
            # boundary, so the chunk is exactly: transport padding +
            # CRLF + part headers + body (body newlines stay intact)
            sub = chunk.lstrip(b" \t").lstrip(b"\r\n")
            sub_headers, sub_body = _split_headers(sub)
            _walk_part(sub_headers, sub_body, out)
        return
    payload = _decode_body(body, _header(headers,
                                         "Content-Transfer-Encoding"))
    out.append({"type": mtype, "params": params, "payload": payload})


# --------------------------------------------------------------------------
# mbox container (RFC 4155, mboxo quoting)
# --------------------------------------------------------------------------

_FROM_QUOTED = re.compile(rb"^(>+)From ", re.M)
_FROM_LINE = re.compile(rb"^From ", re.M)


def write_mbox(messages: list[bytes],
               envelope: str = "mbox@localhost Thu Jan  1 00:00:00 1970"
               ) -> bytes:
    out = bytearray()
    for msg in messages:
        body = _FROM_QUOTED.sub(rb">\1From ", msg)
        body = _FROM_LINE.sub(b">From ", body)
        out += b"From " + envelope.encode("ascii") + b"\n"
        out += body
        if not body.endswith(b"\n"):
            out += b"\n"
        out += b"\n"  # blank separator line
    return bytes(out)


def iter_mbox(data: bytes) -> list[bytes]:
    """Split an mbox file into messages (envelope lines dropped,
    ``>From`` quoting reversed)."""
    if not data:
        return []
    if not data.startswith(b"From "):
        raise ValueError("mbox must start with a 'From ' separator line")
    msgs = []
    starts = [m.start() for m in re.finditer(rb"(?:^|\n)From ", data)]
    starts = [s + 1 if data[s:s + 1] == b"\n" else s for s in starts]
    for i, s in enumerate(starts):
        end = starts[i + 1] if i + 1 < len(starts) else len(data)
        block = data[s:end]
        _, _, msg = block.partition(b"\n")  # drop the envelope line
        msg = msg.rstrip(b"\n") + b"\n"
        msg = re.sub(rb"^>(>*From )", rb"\1", msg, flags=re.M)
        msgs.append(msg)
    return msgs

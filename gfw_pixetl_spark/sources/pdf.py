"""Minimal-but-real PDF text extraction over the PUBLIC ISO 32000-1
spec — the other container every document corpus ships besides HTML.

Scope (stated, not padded):

* classic cross-reference TABLES (`xref` / `trailer`, single section +
  `/Prev` chains, incremental updates with free-entry shadowing),
* PDF 1.5+ cross-reference STREAMS (`/Type /XRef`: W-array field
  widths, `/Index` subsections, `/Prev` chains) including the PNG
  predictors (`/DecodeParms /Predictor 10-15` — Up=12 is what writers
  emit — plus TIFF Predictor 2) that real xref streams always use,
* hybrid-reference files (classic trailer with `/XRefStm` bridging to
  a stream section, ISO 32000-1 7.5.8.4),
* OBJECT STREAMS (`/Type /ObjStm`: `/N` `/First` header pairs, lazily
  parsed and cached per stream) — type-2 xref entries resolve through
  them, which is how virtually every born-digital PDF since ~2006
  stores its page dicts,
* indirect object resolution, `/FlateDecode` (name or 1-element array
  form) with direct or indirect `/Length`,
* the `Catalog -> Pages -> Kids` page-tree walk (nested trees,
  `Contents` as one stream or an array), and text extraction from
  content streams: `Tj`, `'` and `TJ` show operators (TJ kerning
  numbers dropped), literal strings with the full escape set
  (\\n \\r \\t \\b \\f \\( \\) \\\\ \\ddd octal + line continuations),
  hex strings `<...>`, and `Td/TD/T*` treated as word boundaries.

* ENCRYPTION via the standard security handler (ISO 32000-1 7.6.3):
  /V 1-2 RC4 (R 2-3), /V 4 /AESV2 AES-128-CBC, AND /V 5 /AESV3
  AES-256 (R 6 per ISO 32000-2 Algorithm 2.B — the iterated
  SHA-256/384/512 + AES-CBC password KDF — with deprecated R 5 as its
  single-round case); the empty-user-password auto-open that covers
  the overwhelming majority of encrypted corpus PDFs, plus explicit
  passwords via both the user and owner validation paths. Legacy
  revisions: Algorithm 2 file keys, /U verification (Algorithms 4/5),
  per-object keys (Algorithm 1, the sAlT suffix); R 6 uses the file
  key directly. Stream decryption runs BEFORE filters; xref streams
  stay unencrypted per spec, ObjStm payloads decrypt like any stream.
  Ciphers come from ``sources/crypto.py`` (FIPS-197 vector-pinned,
  T-table fast path cross-checked against the byte-wise reference).

NOT implemented — and raising clearly, never mis-parsing:
non-empty-password documents without the password (the derivation is
there; we don't guess), encrypted STRING objects outside content
streams (text extraction never reads them — content-stream strings
decrypt with their stream), and non-Flate filters (DCT/JBIG2/CCITT
image streams are not text).

Includes a writer for spec-valid fixtures in BOTH layouts — classic
xref tables, and PDF 1.5 xref streams with objects packed into an
ObjStm (Predictor-12-filtered entry rows) — so the parser is
round-trip-testable and q373/q381's oracles can replay the extracted
text analytically. Per-document work runs in Arrow ``mapInPandas``
kernels, the same shape as every other codec source.
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------------------
# Standard security handler (ISO 32000-1 7.6.3)
# ---------------------------------------------------------------------------

_PW_PAD = bytes.fromhex(
    "28bf4e5e4e758a4164004e56fffa01082e2e00b6d0683e802f0ca9fe6453697a")

# password-set -> /O entry memo (bounded; see _std_owner_entry)
_O_ENTRY_CACHE: dict = {}

# byte-wise XOR-with-constant as a C-speed translate table (the
# Algorithm 3/4 mangled round keys: key XOR i for i in 1..19)
_XOR_TABLES = [bytes(b ^ i for b in range(256)) for i in range(20)]

# (file_key, id0, r) -> /U memo, capped tiny (see _std_user_entry)
_U_ENTRY_CACHE: dict = {}


def _md5(data: bytes) -> bytes:
    import hashlib

    return hashlib.md5(data).digest()


def _std_file_key(user_pw: bytes, o_entry: bytes, p: int, id0: bytes,
                  r: int, key_len: int) -> bytes:
    """Algorithm 2: the file encryption key."""
    h = _md5((user_pw + _PW_PAD)[:32] + o_entry[:32]
             + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0)
    if r >= 3:
        for _ in range(50):
            h = _md5(h[:key_len])
    return h[:key_len]


def _std_owner_entry(owner_pw: bytes, user_pw: bytes, r: int,
                     key_len: int) -> bytes:
    """Algorithm 3: the /O value (owner password defaults to user's).
    Passwords pad-then-TRUNCATE to exactly 32 bytes per the spec.

    Memoized: /O depends only on the passwords and revision — for a
    corpus written with one credential set (q408: empty passwords for
    every doc) the 21-RC4 derivation is a program constant, not
    per-document work."""
    cached = _O_ENTRY_CACHE.get((owner_pw, user_pw, r, key_len))
    if cached is not None:
        return cached
    from .crypto import rc4

    h = _md5(((owner_pw or user_pw) + _PW_PAD)[:32])
    if r >= 3:
        for _ in range(50):
            h = _md5(h[:key_len])
    key = h[:key_len]
    o = rc4(key, (user_pw + _PW_PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = rc4(key.translate(_XOR_TABLES[i]), o)
    if len(_O_ENTRY_CACHE) > 64:
        _O_ENTRY_CACHE.clear()
    _O_ENTRY_CACHE[(owner_pw, user_pw, r, key_len)] = o
    return o


def _std_user_entry(file_key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4/5: the /U value.

    The tiny memo amortizes the write->authenticate double derivation
    WITHIN one document's processing (write_pdf computes /U, the
    reader's Algorithm 6 recomputes it with the same key moments
    later); it is deliberately capped at a few entries so it never
    acts as a corpus-scale result cache."""
    from .crypto import rc4

    cached = _U_ENTRY_CACHE.get((file_key, id0, r))
    if cached is not None:
        return cached
    if r == 2:
        u = rc4(file_key, _PW_PAD)
    else:
        u = rc4(file_key, _md5(_PW_PAD + id0))
        for i in range(1, 20):
            u = rc4(file_key.translate(_XOR_TABLES[i]), u)
        u = u + b"\x00" * 16
    if len(_U_ENTRY_CACHE) > 8:
        _U_ENTRY_CACHE.clear()
    _U_ENTRY_CACHE[(file_key, id0, r)] = u
    return u


def _object_key(file_key: bytes, num: int, gen: int,
                aes: bool) -> bytes:
    """Algorithm 1: the per-object key."""
    salt = b"sAlT" if aes else b""
    h = _md5(file_key + num.to_bytes(3, "little")
             + gen.to_bytes(2, "little") + salt)
    return h[:min(len(file_key) + 5, 16)]


def _encrypt_stream(data: bytes, file_key: bytes, num: int, gen: int,
                    aes: bool) -> bytes:
    from .crypto import aes_cbc_encrypt, rc4

    if len(file_key) == 32:  # R6/AESV3: the file key is used directly
        iv = _md5(file_key + num.to_bytes(3, "little") + b"iv")[:16]
        return iv + aes_cbc_encrypt(file_key, iv, data)
    key = _object_key(file_key, num, gen, aes)
    if not aes:
        return rc4(key, data)
    iv = _md5(key + b"iv")[:16]  # deterministic fixtures; spec reads
    return iv + aes_cbc_encrypt(key, iv, data)  # the IV from the data


def _decrypt_stream(data: bytes, file_key: bytes, num: int, gen: int,
                    aes: bool) -> bytes:
    from .crypto import aes_cbc_decrypt, rc4

    if len(file_key) == 32:  # R6/AESV3: no per-object key derivation
        if len(data) < 16:
            raise ValueError("PDF: AESV3 stream shorter than its IV")
        return aes_cbc_decrypt(file_key, data[:16], data[16:])
    key = _object_key(file_key, num, gen, aes)
    if not aes:
        return rc4(key, data)
    if len(data) < 16:
        raise ValueError("PDF: AESV2 stream shorter than its IV")
    return aes_cbc_decrypt(key, data[:16], data[16:])


def _r6_hash(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B (the R6 hardened hash): an iterated
    SHA-256/384/512 chain keyed by AES-128-CBC of the previous digest.
    R5 (the deprecated AESV3 revision) is the single-round form."""
    import hashlib

    from .crypto import aes_cbc_encrypt_nopad

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt_nopad(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256 if mod == 0
             else hashlib.sha384 if mod == 1
             else hashlib.sha512)(e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _r6_entries(user_pw: bytes, file_key: bytes,
                seed: bytes) -> tuple[bytes, bytes, bytes, bytes]:
    """(/U, /UE, /O, /OE) for an R6 document; salts are derived
    deterministically from ``seed`` so fixtures are reproducible."""
    from .crypto import aes_cbc_encrypt_nopad

    uvs = _md5(seed + b"uvs")[:8]
    uks = _md5(seed + b"uks")[:8]
    u = _r6_hash(user_pw, uvs) + uvs + uks
    ue = aes_cbc_encrypt_nopad(_r6_hash(user_pw, uks), bytes(16),
                               file_key)
    ovs = _md5(seed + b"ovs")[:8]
    oks = _md5(seed + b"oks")[:8]
    o = _r6_hash(user_pw, ovs, u) + ovs + oks  # owner pw = user pw
    oe = aes_cbc_encrypt_nopad(_r6_hash(user_pw, oks, u), bytes(16),
                               file_key)
    return u, ue, o, oe


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


def write_pdf(pages: list[list[str]], compress: bool = True,
              xref_stream: bool = False,
              use_objstm: bool = False,
              encrypt: str | None = None,
              user_password: str = "") -> bytes:
    """Write one text line list per page as a spec-valid PDF file:
    catalog, pages tree, Helvetica, one content stream per page
    (optionally FlateDecode).

    Default layout is PDF 1.4: classic xref table + trailer.
    ``xref_stream=True`` emits a PDF 1.5 cross-reference STREAM
    (W=[1,4,2] binary rows, Flate + PNG-Up Predictor 12 — the layout
    real writers produce); ``use_objstm=True`` additionally packs every
    non-stream object into one OBJECT STREAM referenced by type-2
    entries. The writer exists so the reader's modern-PDF path is
    round-trip-testable without external fixtures."""
    if use_objstm and not xref_stream:
        raise ValueError("ObjStm entries need an xref stream (type 2 "
                         "entries have no classic-table encoding)")
    if encrypt not in (None, "rc4", "aes", "aes256"):
        raise ValueError(
            "encrypt must be None, 'rc4', 'aes', or 'aes256'")
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)  # 1-based object number

    # --- standard security handler setup (before any stream is added,
    # since stream payloads encrypt with their object number) ---
    file_key = None
    enc_aes = encrypt in ("aes", "aes256")
    r6 = encrypt == "aes256"
    perms = -4  # all permission bits granted (high bits set)
    if encrypt:
        import hashlib

        id0 = hashlib.md5(
            b"gfw-pdf-id:" + repr(pages).encode("utf-8")).digest()
        if r6:
            upw = user_password.encode("utf-8")[:127]
            file_key = (hashlib.md5(id0 + b"fk1").digest()
                        + hashlib.md5(id0 + b"fk2").digest())
            u_entry, ue_entry, o_entry, oe_entry = _r6_entries(
                upw, file_key, id0)
        else:
            r = 4 if enc_aes else 3
            upw = user_password.encode("latin-1")
            o_entry = _std_owner_entry(b"", upw, r, 16)
            file_key = _std_file_key(upw, o_entry, perms, id0, r, 16)
            u_entry = _std_user_entry(file_key, id0, r)

    def enc_stream(data: bytes, num: int) -> bytes:
        if file_key is None:
            return data
        return _encrypt_stream(data, file_key, num, 0, enc_aes)

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
        stream = enc_stream(stream, len(objs) + 1)
        if compress:
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

    enc_id = None
    enc_extra = b""
    if encrypt:
        o_hex = o_entry.hex().encode()
        u_hex = u_entry.hex().encode()
        if r6:
            from .crypto import _encrypt_block, _expand_key

            # /Perms (Algorithm 10): AES-256-ECB of P + pad + 'Tadb'
            pblk = ((perms & 0xFFFFFFFF).to_bytes(4, "little")
                    + b"\xff\xff\xff\xffTadb"
                    + _md5(id0 + b"pr")[:4])
            perms_blob = _encrypt_block(pblk, _expand_key(file_key))
            enc_body = (
                b"<< /Filter /Standard /V 5 /R 6 /Length 256 "
                b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen "
                b"/Length 32 >> >> /StmF /StdCF /StrF /StdCF "
                b"/P %d /U <%s> /UE <%s> /O <%s> /OE <%s> "
                b"/Perms <%s> >>"
                % (perms, u_hex, ue_entry.hex().encode(), o_hex,
                   oe_entry.hex().encode(), perms_blob.hex().encode()))
        elif enc_aes:
            enc_body = (
                b"<< /Filter /Standard /V 4 /R 4 /Length 128 "
                b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
                b"/Length 16 >> >> /StmF /StdCF /StrF /StdCF "
                b"/P %d /O <%s> /U <%s> >>" % (perms, o_hex, u_hex))
        else:
            enc_body = (
                b"<< /Filter /Standard /V 2 /R 3 /Length 128 "
                b"/P %d /O <%s> /U <%s> >>" % (perms, o_hex, u_hex))
        enc_id = add(enc_body)
        id_hex = id0.hex().encode()
        enc_extra = (b" /Encrypt %d 0 R /ID [<%s> <%s>]"
                     % (enc_id, id_hex, id_hex))

    if not xref_stream:
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
        out += (b"trailer\n<< /Size %d /Root %d 0 R%s >>\n"
                b"startxref\n%d\n%%%%EOF" % (len(objs) + 1, catalog,
                                             enc_extra, xref_at))
        return bytes(out)

    # ---- PDF 1.5 layout: xref STREAM, optionally ObjStm-packed ----
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    stream_ids = set(content_ids)
    objstm_id = len(objs) + 1
    xref_id = objstm_id + (1 if use_objstm else 0)
    # streams are illegal inside an ObjStm (7.5.7), and so is the
    # encryption dictionary: content streams and /Encrypt stay
    # top-level; every other dict object gets packed when asked
    packed = ([i for i in range(1, len(objs) + 1)
               if i not in stream_ids and i != enc_id]
              if use_objstm else [])
    packed_set = set(packed)

    entries: dict[int, tuple] = {}
    for i, body in enumerate(objs, start=1):
        if i in packed_set:
            continue
        entries[i] = ("in", len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"

    if use_objstm:
        pair_offs = []
        cur = 0
        parts = []
        for i in packed:
            pair_offs.append((i, cur))
            parts.append(objs[i - 1])
            cur += len(objs[i - 1]) + 1
        header = " ".join(f"{n} {o}" for n, o in pair_offs).encode() + b"\n"
        comp = zlib.compress(header + b"\n".join(parts))
        comp = enc_stream(comp, objstm_id)  # ObjStm encrypts like any
        entries[objstm_id] = ("in", len(out))  # stream; XRef never does
        out += (b"%d 0 obj\n<< /Type /ObjStm /N %d /First %d "
                b"/Filter /FlateDecode /Length %d >>\nstream\n"
                % (objstm_id, len(packed), len(header), len(comp)))
        out += comp + b"\nendstream\nendobj\n"
        for idx, i in enumerate(packed):
            entries[i] = ("stm", objstm_id, idx)

    # binary entry rows, W=[1,4,2], PNG Up predictor (12) over 7 columns
    xref_at = len(out)
    size = xref_id + 1
    rows = bytearray(b"\x00" + (0).to_bytes(4, "big")
                     + (65535).to_bytes(2, "big"))
    for num in range(1, size):
        e = ("in", xref_at) if num == xref_id else entries[num]
        if e[0] == "in":
            rows += b"\x01" + e[1].to_bytes(4, "big") + b"\x00\x00"
        else:
            rows += (b"\x02" + e[1].to_bytes(4, "big")
                     + e[2].to_bytes(2, "big"))
    rowlen = 7
    filtered = bytearray()
    prev = bytes(rowlen)
    for r in range(0, len(rows), rowlen):
        row = bytes(rows[r:r + rowlen])
        filtered += b"\x02" + bytes((row[i] - prev[i]) & 0xFF
                                    for i in range(rowlen))
        prev = row
    comp = zlib.compress(bytes(filtered))
    out += (b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Root %d 0 R%s "
            b"/Filter /FlateDecode "
            b"/DecodeParms << /Predictor 12 /Columns 7 >> /Length %d >>"
            b"\nstream\n" % (xref_id, size, catalog, enc_extra,
                             len(comp)))
    out += comp + b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF" % xref_at
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


def _unpredict(data: bytes, predictor: int, columns: int,
               colors: int = 1, bpc: int = 8) -> bytes:
    """Undo the /DecodeParms predictor on a decoded stream: TIFF
    horizontal differencing (Predictor 2, 8-bit) and the PNG row
    filters (Predictors 10-15 — the per-row filter tag byte picks
    None/Sub/Up/Average/Paeth, RFC 2083 §6; xref streams in the wild
    are Up-filtered, /Predictor 12)."""
    if predictor in (1, 0):
        return data
    bpp = max(1, (colors * bpc) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    if predictor == 2:
        if bpc != 8:
            raise ValueError("PDF: TIFF predictor only for 8-bit")
        out = bytearray(data)
        for r in range(0, len(out) - rowlen + 1, rowlen):
            for i in range(bpp, rowlen):
                out[r + i] = (out[r + i] + out[r + i - bpp]) & 0xFF
        return bytes(out)
    if predictor < 10:
        raise ValueError(f"PDF: unknown predictor {predictor}")
    # PNG: every row is [filter_tag][rowlen bytes]
    if len(data) % (rowlen + 1):
        raise ValueError(
            f"PDF: predictor rows of {rowlen + 1} don't tile "
            f"{len(data)} bytes")
    out = bytearray()
    prev = bytearray(rowlen)
    for r in range(0, len(data), rowlen + 1):
        tag = data[r]
        row = bytearray(data[r + 1:r + 1 + rowlen])
        if tag == 0:  # None
            pass
        elif tag == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif tag == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif tag == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif tag == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"PDF: bad PNG filter tag {tag}")
        out += row
        prev = row
    return bytes(out)


class PdfDocument:
    """Parsed PDF: xref chain (tables, streams, hybrids), object
    resolution (in-file + ObjStm-compressed), page walk."""

    def __init__(self, data: bytes, password: str = "") -> None:
        self.data = data
        if not data.startswith(b"%PDF-"):
            raise ValueError("not a PDF (missing %PDF- header)")
        # xref values: int byte offset, -1 = freed, or
        # ("objstm", stream_obj_num, index) for type-2 entries
        self.xref: dict[int, object] = {}
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, tuple] = {}
        self._crypt: tuple | None = None  # (file_key, aes) when set
        self._load_xref_chain()
        if "Encrypt" in self.trailer:
            self._setup_crypt(password)

    def _setup_crypt(self, password: str = "") -> None:
        """Standard security handler: derive the file key (Algorithm 2)
        and authenticate it against /U (Algorithms 4/5/6)."""
        enc = self.resolve(self.trailer["Encrypt"])
        if enc.get("Filter") != "Standard":
            raise NotImplementedError(
                f"PDF: only the Standard security handler is supported "
                f"(got {enc.get('Filter')!r})")
        v = int(self.resolve(enc.get("V", 0)))
        r = int(self.resolve(enc.get("R", 2)))
        if v == 5:
            return self._setup_crypt_v5(enc, r, password)
        if v not in (1, 2, 4):
            raise NotImplementedError(
                f"PDF: encryption /V {v} unsupported")
        aes = False
        if v == 4:
            cf = self.resolve(enc.get("CF", {})) or {}
            stdcf = self.resolve(cf.get("StdCF", {})) or {}
            cfm = self.resolve(stdcf.get("CFM"))
            if cfm == "AESV2":
                aes = True
            elif cfm not in ("V2", None):
                raise NotImplementedError(
                    f"PDF: crypt filter method {cfm!r} unsupported")
        key_len = int(self.resolve(enc.get("Length", 40))) // 8
        if v == 1:
            key_len = 5
        o_entry = enc["O"]
        u_entry = enc["U"]
        p = int(self.resolve(enc["P"]))
        ids = self.resolve(self.trailer.get("ID"))
        id0 = ids[0] if ids else b""
        key = _std_file_key(password.encode("latin-1"), o_entry, p,
                            id0, r, key_len)
        expect = _std_user_entry(key, id0, r)
        ok = (expect[:16] == u_entry[:16]) if r >= 3 else \
            (expect == u_entry[:32])
        if not ok:
            raise ValueError(
                "PDF: encrypted with a non-empty user password — "
                "cannot open without it")
        self._crypt = (key, aes)

    def _setup_crypt_v5(self, enc: dict, r: int, password: str) -> None:
        """AES-256 handler (/V 5): R 6 per ISO 32000-2 Algorithm 2.B,
        R 5 (the deprecated single-round AESV3 revision) as its
        degenerate case. The 32-byte file key decrypts streams
        directly — no per-object key derivation in this revision."""
        import hashlib

        from .crypto import aes_cbc_decrypt_nopad

        if r not in (5, 6):
            raise NotImplementedError(f"PDF: /V 5 with /R {r}")

        def h(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
            if r == 6:
                return _r6_hash(pw, salt, udata)
            return hashlib.sha256(pw + salt + udata).digest()

        u = enc["U"]
        ue = enc["UE"]
        o = enc.get("O")
        oe = enc.get("OE")
        pw = password.encode("utf-8")[:127]
        if h(pw, u[32:40]) == u[:32]:  # user password validates
            key = aes_cbc_decrypt_nopad(h(pw, u[40:48]), bytes(16), ue)
        elif o is not None and oe is not None \
                and h(pw, o[32:40], u[:48]) == o[:32]:
            key = aes_cbc_decrypt_nopad(h(pw, o[40:48], u[:48]),
                                        bytes(16), oe)
        else:
            raise ValueError(
                "PDF: encrypted with a non-empty user password — "
                "cannot open without it")
        self._crypt = (key, True)

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
            # PDF 1.5+: startxref points at an indirect object whose
            # stream IS the cross-reference section (/Type /XRef)
            return self._load_xref_stream(at)
        lex = _Lexer(d, at + 4)
        while True:
            lex._skip_ws()
            if d.startswith(b"trailer", lex.pos):
                lex.pos += 7
                trailer = lex.parse_value()
                for k, v in trailer.items():
                    self.trailer.setdefault(k, v)
                # hybrid-reference file (7.5.8.4): the classic section
                # hides its ObjStm-compressed entries behind /XRefStm;
                # that stream section is consulted BEFORE /Prev (its
                # entries are newer than the chained-to section's)
                if "XRefStm" in trailer:
                    self._load_xref_stream(int(trailer["XRefStm"]))
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

    def _load_xref_stream(self, at: int) -> int:
        """Cross-reference STREAM section (ISO 32000-1 7.5.8): an
        indirect stream object typed /XRef whose payload is fixed-width
        binary rows (widths from /W, subsections from /Index), almost
        always Flate + PNG-Up-predictor coded. Every dictionary entry
        of an xref stream must be a DIRECT object (7.5.8.2), so no
        resolution chicken-and-egg."""
        d = self.data
        m = re.match(rb"(\d+)\s+(\d+)\s+obj", d[at:at + 48])
        if not m:
            raise ValueError(
                "PDF: startxref points at neither an xref table nor an "
                "xref stream object")
        lex = _Lexer(d, at + m.end())
        sd = lex.parse_value()
        if not isinstance(sd, dict) or sd.get("Type") != "XRef":
            raise ValueError("PDF: object at startxref is not /Type /XRef")
        if isinstance(sd.get("Length"), Ref):
            raise ValueError(
                "PDF: xref stream /Length must be a direct object "
                "(ISO 32000-1 7.5.8.2)")
        lex._skip_ws()
        if not d.startswith(b"stream", lex.pos):
            raise ValueError("PDF: /Type /XRef object has no stream")
        raw = self._decode_stream(sd, lex, resolve=False)

        w = [int(x) for x in sd["W"]]
        if len(w) != 3 or any(x < 0 for x in w) or sum(w) == 0:
            raise ValueError(f"PDF: bad xref stream /W {w!r}")
        size = int(sd["Size"])
        index = [int(x) for x in sd.get("Index", [0, size])]
        if len(index) % 2:
            raise ValueError("PDF: /Index must hold (first, count) pairs")
        rowlen = sum(w)
        total = sum(index[1::2])
        if len(raw) < rowlen * total:
            raise ValueError(
                f"PDF: xref stream holds {len(raw)} bytes, needs "
                f"{rowlen * total}")

        pos = 0
        for s in range(0, len(index), 2):
            first, count = index[s], index[s + 1]
            for i in range(count):
                row = raw[pos:pos + rowlen]
                pos += rowlen
                o = 0
                f1 = int.from_bytes(row[o:o + w[0]], "big") if w[0] else 1
                o += w[0]
                f2 = int.from_bytes(row[o:o + w[1]], "big")
                o += w[1]
                f3 = int.from_bytes(row[o:o + w[2]], "big")
                num = first + i
                if f1 == 0:  # free
                    self.xref.setdefault(num, -1)
                elif f1 == 1:  # in-file: f2 = byte offset
                    self.xref.setdefault(num, f2)
                elif f1 == 2:  # compressed: f2 = ObjStm num, f3 = index
                    self.xref.setdefault(num, ("objstm", f2, f3))
                # unknown types are references to null per 7.5.8.3 —
                # leaving them absent gives exactly that behavior
        for k, v in sd.items():
            if k not in ("Type", "W", "Index", "Length", "Filter",
                         "DecodeParms", "Prev"):
                self.trailer.setdefault(k, v)
        return int(sd.get("Prev", 0))

    def _decode_stream(self, sdict: dict, lex: "_Lexer",
                       resolve: bool = True,
                       obj_num: int | None = None) -> bytes:
        """Decode the stream whose keyword starts at ``lex.pos``:
        /Length framing, decryption (before filters, per 7.6.2),
        /Filter (name or array), /DecodeParms predictors.
        ``resolve=False`` forbids indirect dict entries (required while
        loading xref streams, before objects resolve); xref streams are
        never encrypted (7.5.8.2), so their obj_num stays None."""
        res = self.resolve if resolve else (lambda v: v)
        p = lex.pos + 6
        if self.data[p:p + 2] == b"\r\n":
            p += 2
        elif self.data[p:p + 1] == b"\n":
            p += 1
        n = res(sdict.get("Length"))
        raw = self.data[p:p + int(n)]
        if (self._crypt is not None and obj_num is not None
                and res(sdict.get("Type")) != "XRef"):
            key, aes = self._crypt
            raw = _decrypt_stream(raw, key, obj_num, 0, aes)
        filt = res(sdict.get("Filter"))
        filters = filt if isinstance(filt, list) else (
            [] if filt is None else [filt])
        parms = res(sdict.get("DecodeParms"))
        parms_list = parms if isinstance(parms, list) else [parms]
        for i, f in enumerate(filters):
            f = res(f)
            if f == "FlateDecode":
                raw = zlib.decompress(raw)
            else:
                raise ValueError(f"PDF: unsupported filter {f!r}")
            pr = res(parms_list[i]) if i < len(parms_list) else None
            if isinstance(pr, dict) and pr.get("Predictor"):
                raw = _unpredict(
                    raw, int(res(pr["Predictor"])),
                    int(res(pr.get("Columns", 1))),
                    int(res(pr.get("Colors", 1))),
                    int(res(pr.get("BitsPerComponent", 8))))
        return raw

    def _objstm(self, stm_num: int):
        """(header pairs [(objnum, offset)], payload, first) of object
        stream ``stm_num`` — parsed once and cached: one inflate serves
        every compressed object it holds."""
        hit = self._objstm_cache.get(stm_num)
        if hit is not None:
            return hit
        stm = self.obj(stm_num)
        if not isinstance(stm, dict) or "__stream__" not in stm:
            raise ValueError(f"PDF: object {stm_num} is not a stream")
        sd = stm["__dict__"]
        if sd.get("Type") != "ObjStm":
            raise ValueError(
                f"PDF: object {stm_num} is not /Type /ObjStm")
        payload = stm["__stream__"]
        n = int(self.resolve(sd["N"]))
        first = int(self.resolve(sd["First"]))
        pairs: list[tuple[int, int]] = []
        hl = _Lexer(payload, 0)
        for _ in range(n):
            onum = hl.parse_value()
            off = hl.parse_value()
            pairs.append((int(onum), int(off)))
        out = (pairs, payload, first)
        self._objstm_cache[stm_num] = out
        return out

    def obj(self, num: int):
        if num in self._cache:
            return self._cache[num]
        at = self.xref.get(num)
        if at is None or (isinstance(at, int) and at < 0):
            raise ValueError(f"PDF: object {num} is "
                             f"{'freed' if at is not None else 'absent'}")
        if isinstance(at, tuple):  # ("objstm", stm_num, idx): type-2
            _, stm_num, idx = at
            pairs, payload, first = self._objstm(stm_num)
            if not (0 <= idx < len(pairs)) or pairs[idx][0] != num:
                # tolerate writers with off-by-one indices: the header
                # pairs are authoritative (7.5.7 note), search them
                match = [o for o, _ in enumerate(pairs)
                         if pairs[o][0] == num]
                if not match:
                    raise ValueError(
                        f"PDF: object {num} not in ObjStm {stm_num}")
                idx = match[0]
            lex = _Lexer(payload, first + pairs[idx][1])
            val = lex.parse_value()
            self._cache[num] = val  # streams are illegal inside ObjStm
            return val
        m = re.match(rb"(\d+)\s+(\d+)\s+obj", self.data[at:at + 48])
        if not m or int(m.group(1)) != num:
            raise ValueError(f"PDF: xref offset for {num} is wrong")
        lex = _Lexer(self.data, at + m.end())
        val = lex.parse_value()
        lex._skip_ws()
        if self.data.startswith(b"stream", lex.pos):
            raw = self._decode_stream(val, lex, obj_num=num)
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


def extract_pdf_text(data: bytes, password: str = "") -> str:
    """Whole-document text: pages joined with newlines, per-page text
    whitespace-normalized. ``password`` authenticates encrypted
    documents (the empty default opens the common corpus case)."""
    return PdfDocument(data, password=password).text()

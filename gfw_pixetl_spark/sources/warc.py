"""WARC (Web ARChive, ISO 28500 / WARC 1.1) parsing + writing — the
container every crawl corpus actually ships (Common Crawl's format).

A 100 TB text pipeline's raw input is WARC: framed records
(``WARC/1.1`` version line, named headers, ``Content-Length`` octet
framing, CRLF CRLF terminators), with HTTP response records wrapping
the fetched page. Common Crawl compresses EACH RECORD AS ITS OWN GZIP
MEMBER so a single record is a ranged GET + one inflate — this module
implements both layers:

* ``write_warc`` — spec-valid writer (warcinfo/request/response
  records, correct framing) with per-record gzip members,
* ``iter_warc`` — record parser over raw or multi-member-gzip bytes,
* ``member_index`` — (offset, size) of every gzip member, the random-
  access index a columnar ingest stores next to the archive,
* ``parse_http_response`` — status line + headers + body split of an
  HTTP/1.1 response payload.

The Spark ingest runs in Arrow ``mapInPandas`` kernels (framing is
per-record byte work), the same execution shape as the codec sources.
q371 value-checks the full WARC->HTTP->body chain against an analytic
oracle. Reference parity: gfw_pixetl has no crawl path; this extends
SURVEY §2's LLM-pipeline family at the INGEST boundary, upstream of
everything else.
"""

from __future__ import annotations

import gzip
import io
import uuid
import zlib

CRLF = b"\r\n"


def _record_bytes(rtype: str, headers: dict, payload: bytes,
                  seq: int = 0) -> bytes:
    import hashlib

    # deterministic AND unique per file: the id hashes the record's
    # sequence number + type + payload digest, so equal-length (or even
    # identical) payloads in different slots never share an id
    # (ISO 28500 requires global uniqueness)
    default_id = uuid.uuid5(
        uuid.NAMESPACE_URL,
        f"{rtype}:{seq}:{hashlib.md5(payload).hexdigest()}")
    h = {
        "WARC-Type": rtype,
        "WARC-Record-ID": headers.get("WARC-Record-ID",
                                      f"<urn:uuid:{default_id}>"),
        "WARC-Date": headers.get("WARC-Date", "2024-01-01T00:00:00Z"),
        **headers,
        "Content-Length": str(len(payload)),
    }
    out = b"WARC/1.1" + CRLF
    for k, v in h.items():
        out += f"{k}: {v}".encode() + CRLF
    return out + CRLF + payload + CRLF + CRLF


def http_response_bytes(body: bytes, status: int = 200,
                        content_type: str = "text/html",
                        extra_headers: dict | None = None) -> bytes:
    """A minimal valid HTTP/1.1 response payload for a response record.
    ``extra_headers`` adds e.g. ``Content-Encoding`` for compressed
    bodies (``body`` is the already-encoded bytes)."""
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently",
              503: "Service Unavailable"}.get(status, "OK")
    extras = "".join(f"{k}: {v}\r\n"
                     for k, v in (extra_headers or {}).items())
    return (f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {content_type}\r\n{extras}"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body


def write_warc(records: list[dict], gzip_members: bool = True) -> bytes:
    """Write records ([{'type', 'uri', 'payload', 'headers'?}]) as a
    WARC file; ``gzip_members`` compresses each record as its own gzip
    member (the Common Crawl layout that makes records ranged-GET
    addressable)."""
    out = io.BytesIO()
    info = _record_bytes(
        "warcinfo",
        {"WARC-Filename": "synthetic.warc", "Content-Type":
         "application/warc-fields"},
        b"software: gfw_pixetl_spark\r\nformat: WARC File Format 1.1\r\n")
    chunks = [info]
    for seq, r in enumerate(records, start=1):
        headers = {
            "WARC-Target-URI": r.get("uri", ""),
            "Content-Type":
                "application/http;msgtype=response"
                if r.get("type", "response") == "response"
                else r.get("content_type", "application/octet-stream"),
            **(r.get("headers") or {}),
        }
        chunks.append(_record_bytes(r.get("type", "response"), headers,
                                    r["payload"], seq=seq))
    for c in chunks:
        if gzip_members:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(c)
            out.write(buf.getvalue())
        else:
            out.write(c)
    return out.getvalue()


_INFLATE_CHUNK = 1 << 20


def _member_end(view: memoryview, pos: int,
                sink: bytearray | None = None) -> int:
    """Inflate ONE gzip member starting at ``pos``, feeding the
    decompressor bounded chunks and stopping at ``d.eof`` — so the
    bytes past the member boundary are never handed to zlib at all.
    (Passing the whole remaining tail would make zlib materialize it
    as a bytes copy in ``unused_data`` at every member boundary:
    O(members x tail), quadratic on Common-Crawl-sized member counts.)
    Returns the member's end offset; appends inflated bytes to
    ``sink`` when given."""
    d = zlib.decompressobj(wbits=31)
    cur = pos
    n = len(view)
    while not d.eof:
        if cur >= n:
            raise ValueError(f"truncated gzip member at offset {pos}")
        chunk = view[cur:cur + _INFLATE_CHUNK]
        out = d.decompress(chunk)
        if sink is not None:
            sink.extend(out)
        cur += len(chunk)
    return cur - len(d.unused_data)


def member_index(data: bytes) -> list[tuple[int, int]]:
    """(offset, compressed_size) of every gzip member — decompresses
    once to find boundaries (an ingest job does this a single time and
    persists the index; readers then do ranged GETs per record).
    Bounded-chunk inflation via ``_member_end`` keeps the pass LINEAR
    in archive size regardless of member count."""
    view = memoryview(data)
    out = []
    pos = 0
    while pos < len(data):
        if data[pos:pos + 2] != b"\x1f\x8b":
            raise ValueError(f"not a gzip member at offset {pos}")
        end = _member_end(view, pos)
        out.append((pos, end - pos))
        pos = end
    return out


def _split_records(raw: bytes):
    pos = 0
    while pos < len(raw):
        if raw[pos:pos + 5] != b"WARC/":
            raise ValueError(f"bad WARC version line at {pos}")
        hdr_end = raw.index(CRLF + CRLF, pos)
        head = raw[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        headers = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        n = int(headers.get("Content-Length", "0"))
        body_start = hdr_end + 4
        payload = raw[body_start:body_start + n]
        if len(payload) != n:
            raise ValueError("truncated WARC record payload")
        yield headers, payload
        pos = body_start + n
        while raw[pos:pos + 2] == CRLF:
            pos += 2


def iter_warc(data: bytes):
    """Yield (headers dict, payload bytes) per record; accepts raw
    WARC, multi-member gzip, or multi-frame zstd (`.warc.zst`, the
    modern Common-Crawl-adjacent layout) — all sniffed by magic."""
    if data[:4] == b"\x28\xb5\x2f\xfd" or (
            len(data) >= 4 and data[1:4] == b"\x2a\x4d\x18"
            and 0x50 <= data[0] <= 0x5F):
        from .zstd import decompress as _zstd_decompress

        data = _zstd_decompress(data)
    if data[:2] == b"\x1f\x8b":
        view = memoryview(data)
        raw = bytearray()
        pos = 0
        while pos < len(data):
            pos = _member_end(view, pos, sink=raw)
        data = bytes(raw)
    yield from _split_records(data)


def scan_warc(data: bytes) -> tuple[list[tuple[dict, bytes]], dict]:
    """LENIENT archive walk for real-world crawls: where ``iter_warc``
    raises on the first malformed byte, ``scan_warc`` skips damage and
    counts it — the ingest contract at corpus scale is
    skip-and-count, never crash-the-shard. Returns
    (records, counters) with counters:

    * ``n_records`` — well-formed records yielded,
    * ``bad_gzip_members`` — members that failed to inflate (decoder
      resyncs by scanning for the next deflate-mode gzip magic),
    * ``bad_records`` — framing damage at the record layer: missing or
      non-numeric Content-Length, no header terminator, version-line
      garbage (resync scans for the next ``WARC/`` sentinel), or a
      payload truncated by EOF,
    * ``junk_bytes`` — bytes skipped while resyncing.

    Header parsing also tolerates LF-only terminators and mixed
    CRLF/LF header lines (splitlines), which real archives exhibit.
    A failed gzip member contributes NO partial plaintext (the member
    inflates into a scratch buffer first), so one bad member never
    corrupts the framing of its neighbors."""
    counters = {"n_records": 0, "bad_gzip_members": 0,
                "bad_records": 0, "junk_bytes": 0}
    # Same skippable-aware sniff as iter_warc: a .zst shard may open
    # with a skippable frame (e.g. the seekable-format envelope).
    if data[:4] == b"\x28\xb5\x2f\xfd" or (
            len(data) >= 4 and data[1:4] == b"\x2a\x4d\x18"
            and 0x50 <= data[0] <= 0x5F):
        # lenient zstd layer: decode frame by frame (frame_end is an
        # O(blocks) no-decode walk), resync on the next frame magic
        # after damage — a corrupt frame costs its own records, never
        # the shard; same contract as the gzip layer below
        from .zstd import decompress as _zstd_decompress
        from .zstd import frame_end as _zstd_frame_end

        raw = bytearray()
        pos = 0
        magic = b"\x28\xb5\x2f\xfd"
        while pos < len(data):
            is_skippable = (len(data) - pos >= 4
                            and data[pos + 1:pos + 4] == b"\x2a\x4d\x18"
                            and 0x50 <= data[pos] <= 0x5F)
            if data[pos:pos + 4] != magic and not is_skippable:
                nxt = data.find(magic, pos + 1)
                counters["bad_gzip_members"] += 1
                counters["junk_bytes"] += (
                    len(data) - pos if nxt < 0 else nxt - pos)
                if nxt < 0:
                    break
                pos = nxt
                continue
            try:
                end = _zstd_frame_end(data, pos)
                if not is_skippable:
                    raw += _zstd_decompress(data[pos:end])
                pos = end
            except Exception:
                counters["bad_gzip_members"] += 1
                nxt = data.find(magic, pos + 4)
                counters["junk_bytes"] += (
                    len(data) - pos if nxt < 0 else nxt - pos)
                if nxt < 0:
                    break
                pos = nxt
        data = bytes(raw)
    if data[:2] == b"\x1f\x8b":
        view = memoryview(data)
        raw = bytearray()
        pos = 0
        while pos < len(data):
            if data[pos:pos + 2] != b"\x1f\x8b":
                nxt = data.find(b"\x1f\x8b\x08", pos)
                counters["junk_bytes"] += (
                    len(data) - pos if nxt < 0 else nxt - pos)
                if nxt < 0:
                    break
                pos = nxt
                continue
            scratch = bytearray()
            try:
                pos = _member_end(view, pos, sink=scratch)
                raw += scratch
            except Exception:  # truncated or corrupt member
                counters["bad_gzip_members"] += 1
                nxt = data.find(b"\x1f\x8b\x08", pos + 2)
                if nxt < 0:
                    counters["junk_bytes"] += len(data) - pos
                    break
                counters["junk_bytes"] += nxt - pos
                pos = nxt
        data = bytes(raw)

    out: list[tuple[dict, bytes]] = []
    pos, n = 0, len(data)
    while pos < n:
        if data[pos:pos + 5] != b"WARC/":
            nxt = data.find(b"WARC/", pos + 1)
            counters["bad_records"] += 1
            counters["junk_bytes"] += n - pos if nxt < 0 else nxt - pos
            if nxt < 0:
                break
            pos = nxt
            continue
        crlf_at = data.find(CRLF + CRLF, pos)
        lf_at = data.find(b"\n\n", pos)
        if crlf_at < 0 and lf_at < 0:
            counters["bad_records"] += 1
            counters["junk_bytes"] += n - pos
            break
        if crlf_at >= 0 and (lf_at < 0 or crlf_at <= lf_at):
            hdr_end, sep = crlf_at, 4
        else:
            hdr_end, sep = lf_at, 2
        head = data[pos:hdr_end].decode("utf-8", "replace").splitlines()
        headers = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        clen = headers.get("Content-Length", "")
        if not clen.isdigit():
            counters["bad_records"] += 1
            pos = hdr_end + sep  # resync from the payload bytes
            continue
        body_start = hdr_end + sep
        body = data[body_start:body_start + int(clen)]
        if len(body) != int(clen):
            counters["bad_records"] += 1  # truncated by EOF
            break
        out.append((headers, body))
        counters["n_records"] += 1
        pos = body_start + int(clen)
        while data[pos:pos + 2] == CRLF or data[pos:pos + 1] == b"\n":
            pos += 2 if data[pos:pos + 2] == CRLF else 1
    return out, counters


def parse_http_response(payload: bytes) -> tuple[int, dict, bytes]:
    """(status, headers, body) of an HTTP/1.1 response payload."""
    hdr_end = payload.index(CRLF + CRLF)
    head = payload[:hdr_end].decode("utf-8", "replace").split("\r\n")
    version, _, rest = head[0].partition(" ")
    if not version.startswith("HTTP/"):
        raise ValueError(f"bad HTTP status line {head[0]!r}")
    status = int(rest.split(" ", 1)[0])
    headers = {}
    for line in head[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, payload[hdr_end + 4:]


def decode_chunked(body: bytes) -> bytes:
    """Decode an HTTP/1.1 ``Transfer-Encoding: chunked`` payload
    (RFC 9112 section 7.1): hex chunk-size lines (chunk extensions
    after ';' ignored), CRLF-framed chunk data, the 0-size terminator,
    and an optional trailer section (ignored).  Crawl captures often
    preserve the raw transfer bytes, so dechunking sits between the
    WARC payload and the Content-Encoding decode."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.index(CRLF, pos)
        size_token = body[pos:eol].split(b";", 1)[0].strip()
        # RFC 9112 chunk-size is 1*HEXDIG — int(x, 16) alone would
        # also accept "0x", "+", "_" and negative tokens
        if not size_token or any(c not in b"0123456789abcdefABCDEF"
                                 for c in size_token):
            raise ValueError(f"chunked: bad chunk size "
                             f"{size_token!r}")
        size = int(size_token, 16)
        pos = eol + 2
        if size == 0:
            break  # trailer section (if any) is ignored
        if pos + size > len(body):
            raise ValueError("chunked: truncated chunk data")
        out += body[pos:pos + size]
        pos += size
        if body[pos:pos + 2] != CRLF:
            raise ValueError("chunked: missing chunk-data CRLF")
        pos += 2
    return bytes(out)

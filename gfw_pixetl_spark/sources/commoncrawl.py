"""Common Crawl sidecar formats: WET / WAT conversion records, the
CDX(J) capture index, and SURT URL keys.

A real crawl corpus is not just `.warc.gz` payload files — the
ecosystem's derived artifacts are what make 100 TB of archive usable:

* **WET** (`*.warc.wet.gz`): WARC *conversion* records carrying the
  extracted plain text of each page (`WARC-Refers-To` links back to
  the original response record).  Most text-pipeline consumers read
  WET, never the raw HTML.
* **WAT** (`*.warc.wat.gz`): WARC *metadata* records carrying a JSON
  envelope per original record — HTTP headers, HTML title, outlinks.
* **CDX(J)**: the capture index — one sorted text line per record:
  ``<SURT key> <timestamp14> {json}`` where the JSON carries
  ``url / mime / status / digest / offset / length / filename``.
  ``offset``/``length`` address the record's own gzip member inside
  the WARC, so an index hit costs exactly one ranged GET + one
  inflate.  Sorted keys make the index mergeable and range-scannable.
* **SURT** (Sort-friendly URI Reordering Transform): the key scheme —
  host labels reversed and comma-joined (``org,example)/path``), a
  leading ``www`` label dropped, default ports stripped, query
  parameters sorted — so all captures of one host cluster
  lexicographically.

Scale shape: the CDX index is a *table* (billions of rows at crawl
scale).  Lookups are equi-joins on the SURT key — the q419 plan reads
the index as a DataFrame with pure column-expression parsing, joins
against the request keys, and only then performs the ranged fetches,
grouped per shard file.  Nothing here is a driver-side loop.

Digests follow Common Crawl's convention: ``sha1:<base32>`` over the
record payload.
"""
from __future__ import annotations

import base64
import hashlib
import json
from urllib.parse import urlsplit

from .warc import CRLF, _record_bytes, member_index

# --------------------------------------------------------------------------
# SURT keys
# --------------------------------------------------------------------------


def surt(url: str) -> str:
    """Sort-friendly URI Reordering Transform of ``url``.

    ``https://www.Example.org:443/A/b?b=2&a=1`` ->
    ``org,example)/A/b?a=1&b=2`` — scheme dropped, host lowercased
    with a leading ``www`` label removed, labels reversed and
    comma-joined, default ports (80/443) stripped, query parameters
    sorted bytewise, fragment dropped.  Paths keep their case (URL
    paths are case-sensitive; only the authority is not)."""
    parts = urlsplit(url)
    host = (parts.hostname or "").lower()
    labels = [x for x in host.split(".") if x]
    if labels and labels[0] == "www":
        labels = labels[1:]
    key = ",".join(reversed(labels))
    port = parts.port
    if port and port not in (80, 443):
        key += f":{port}"
    key += ")" + (parts.path or "/")
    if parts.query:
        key += "?" + "&".join(sorted(parts.query.split("&")))
    return key


# --------------------------------------------------------------------------
# WET / WAT writers (consumed back through the ordinary WARC readers)
# --------------------------------------------------------------------------


def wet_record(uri: str, text: str, refers_to: str = "",
               seq: int = 0) -> bytes:
    headers = {
        "WARC-Target-URI": uri,
        "Content-Type": "text/plain",
    }
    if refers_to:
        headers["WARC-Refers-To"] = refers_to
    return _record_bytes("conversion", headers, text.encode(), seq=seq)


def wat_record(uri: str, envelope: dict, refers_to: str = "",
               seq: int = 0) -> bytes:
    headers = {
        "WARC-Target-URI": uri,
        "Content-Type": "application/json",
    }
    if refers_to:
        headers["WARC-Refers-To"] = refers_to
    payload = json.dumps({"Envelope": envelope}, sort_keys=True,
                         separators=(",", ":")).encode()
    return _record_bytes("metadata", headers, payload, seq=seq)


def wat_envelope(warc_headers: dict, status: int, http_headers: dict,
                 title: str, links: list[str]) -> dict:
    """The subset of the WAT envelope a text pipeline consumes."""
    return {
        "WARC-Header-Metadata": dict(warc_headers),
        "Payload-Metadata": {
            "HTTP-Response-Metadata": {
                "Response-Message": {"Status": int(status)},
                "Headers": dict(http_headers),
                "HTML-Metadata": {
                    "Head": {"Title": title},
                    "Links": [{"url": u} for u in links],
                },
            },
        },
    }


# --------------------------------------------------------------------------
# CDXJ index
# --------------------------------------------------------------------------


def payload_digest(payload: bytes) -> str:
    """Common Crawl's digest convention: sha1, base32, no padding
    variance (base32 of 20 bytes is exactly 32 chars)."""
    return "sha1:" + base64.b32encode(
        hashlib.sha1(payload).digest()).decode()


def build_cdxj(warc_bytes: bytes, filename: str,
               timestamp: str = "20240101000000") -> list[str]:
    """One sorted CDXJ line per response record of a per-member-gzip
    WARC: ``<surt> <ts14> {json}`` with the member's (offset, length)
    so a hit is one ranged GET.  Non-response records (warcinfo,
    conversion, metadata) are not indexed, matching the ecosystem's
    CDX builders."""
    from .warc import iter_warc, parse_http_response

    lines = []
    members = member_index(warc_bytes)
    records = list(iter_warc(warc_bytes))
    if len(members) != len(records):
        raise ValueError("cdx: member/record count mismatch")
    for (off, size), (headers, payload) in zip(members, records):
        if headers.get("WARC-Type") != "response":
            continue
        uri = headers.get("WARC-Target-URI", "")
        status, hh, _body = parse_http_response(payload)
        entry = {
            "url": uri,
            "mime": hh.get("content-type", "").split(";")[0],
            "status": str(status),
            "digest": payload_digest(payload),
            "length": str(size),
            "offset": str(off),
            "filename": filename,
        }
        lines.append(f"{surt(uri)} {timestamp} "
                     f"{json.dumps(entry, sort_keys=True)}")
    lines.sort()
    return lines


def parse_cdxj_line(line: str) -> dict:
    """(key, timestamp, fields...) of one CDXJ line."""
    key, _, rest = line.partition(" ")
    ts, _, blob = rest.partition(" ")
    entry = json.loads(blob)
    entry["key"] = key
    entry["timestamp"] = ts
    return entry


def ranged_fetch(warc_bytes: bytes, offset: int, length: int) -> tuple:
    """Resolve one CDX hit: slice the member's byte range (the ranged
    GET at scale), inflate it, parse the record.  Returns
    (warc_headers, payload)."""
    import gzip

    member = warc_bytes[offset:offset + length]
    raw = gzip.decompress(member)
    head_end = raw.index(CRLF + CRLF)
    headers = {}
    for ln in raw[:head_end].decode("utf-8", "replace").split("\r\n")[1:]:
        k, _, v = ln.partition(":")
        headers[k.strip()] = v.strip()
    clen = int(headers["Content-Length"])
    payload = raw[head_end + 4:head_end + 4 + clen]
    return headers, payload

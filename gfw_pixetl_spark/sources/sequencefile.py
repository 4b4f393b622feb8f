"""Hadoop SequenceFile reader/writer — the key/value container the
MapReduce era left across every data lake, implemented pure Python
from the public format (Hadoop SequenceFile javadoc; the on-disk
layout is fixed by org.apache.hadoop.io.SequenceFile):

* header: ``SEQ`` + version 6, key/value class names (Hadoop Text:
  VInt length + UTF-8), compression + blockCompression booleans,
  codec class name when compressed, metadata map, 16-byte sync,
* uncompressed records: [recordLen i32BE][keyLen i32BE][key][value]
  with periodic sync escapes (recordLen == -1 followed by the sync),
* RECORD-compressed: same framing, value bytes deflated per record
  (org.apache.hadoop.io.compress.DefaultCodec = zlib),
* key/value serializations: BytesWritable (i32BE length + bytes) and
  Text (VInt + UTF-8) — the two that matter for corpus ingest,
* Hadoop VInt/VLong (WritableUtils): 1-byte fast path for -112..127,
  prefix byte -113..-128 encoding length and sign otherwise.

NOT implemented, raising clearly: BLOCK compression (a different
layout; record mode is what corpus dumps overwhelmingly use) and
non-deflate codecs.

Same discipline as tfrecord/avro/lz4: writer in-module, strict
``iter_seqfile`` raises ValueError on damage, lenient ``scan_seqfile``
resyncs on the sync marker and counts what it skipped, and
``record_index`` walks offsets without touching payloads. Scale
shape: sync markers make (file, offset-range) splits plannable — the
reason the format has them.
"""

from __future__ import annotations

import struct
import zlib

MAGIC = b"SEQ\x06"
KEY_CLASS = "org.apache.hadoop.io.BytesWritable"
VALUE_CLASS = "org.apache.hadoop.io.BytesWritable"
DEFLATE_CODEC = "org.apache.hadoop.io.compress.DefaultCodec"
SYNC_INTERVAL = 2000  # bytes between sync escapes (Hadoop: ~2000)


def write_vint(out: bytearray, n: int) -> None:
    """Hadoop WritableUtils.writeVLong."""
    if -112 <= n <= 127:
        out.append(n & 0xFF)
        return
    length = -112
    if n < 0:
        n ^= -1
        length = -120
    tmp = n
    while tmp:
        tmp >>= 8
        length -= 1
    out.append(length & 0xFF)
    size = -(length + 120) if length < -120 else -(length + 112)
    for i in range(size - 1, -1, -1):
        out.append((n >> (8 * i)) & 0xFF)


def read_vint(data: bytes, pos: int) -> tuple[int, int]:
    if pos >= len(data):
        raise ValueError("seqfile: truncated VInt")
    first = struct.unpack_from("b", data, pos)[0]
    pos += 1
    if first >= -112:
        return first, pos
    negative = first < -120
    size = -(first + 120) if negative else -(first + 112)
    if pos + size > len(data):
        raise ValueError("seqfile: truncated VInt body")
    n = int.from_bytes(data[pos:pos + size], "big")
    pos += size
    return (n ^ -1 if negative else n), pos


def _write_text(out: bytearray, s: str) -> None:
    b = s.encode("utf-8")
    write_vint(out, len(b))
    out += b


def _read_text(data: bytes, pos: int) -> tuple[str, int]:
    n, pos = read_vint(data, pos)
    if n < 0 or pos + n > len(data):
        raise ValueError("seqfile: truncated Text")
    return data[pos:pos + n].decode("utf-8"), pos + n


def _sync_for(meta_blob: bytes) -> bytes:
    import hashlib

    return hashlib.md5(b"gfw-seqfile-sync:" + meta_blob).digest()


def write_seqfile(records: list[tuple[bytes, bytes]],
                  compressed: bool = False,
                  metadata: dict[str, str] | None = None,
                  sync: bytes | None = None,
                  sync_interval: int = SYNC_INTERVAL) -> bytes:
    """BytesWritable key/value records; ``compressed`` = per-record
    zlib values (DefaultCodec). Deterministic bytes (schema-derived
    sync) unless ``sync`` pins one. ``sync_interval`` bounds the bytes
    between sync escapes (writers may sync at will per the format —
    smaller intervals buy finer damage isolation and split grain)."""
    out = bytearray(MAGIC)
    _write_text(out, KEY_CLASS)
    _write_text(out, VALUE_CLASS)
    out.append(1 if compressed else 0)
    out.append(0)  # never block-compressed
    if compressed:
        _write_text(out, DEFLATE_CODEC)
    meta = metadata or {}
    out += struct.pack(">i", len(meta))
    for k in sorted(meta):
        _write_text(out, k)
        _write_text(out, meta[k])
    if sync is None:
        sync = _sync_for(bytes(out))
    if len(sync) != 16:
        raise ValueError("seqfile: sync marker must be 16 bytes")
    out += sync
    since_sync = 0
    for key, value in records:
        if since_sync >= sync_interval:
            out += struct.pack(">i", -1)
            out += sync
            since_sync = 0
        kb = struct.pack(">i", len(key)) + key
        vraw = struct.pack(">i", len(value)) + value
        vb = zlib.compress(vraw, 6) if compressed else vraw
        rec = struct.pack(">ii", len(kb) + len(vb), len(kb))
        out += rec + kb + vb
        since_sync += len(rec) + len(kb) + len(vb)
    return bytes(out)


def read_header(data: bytes):
    """(key_class, value_class, compressed, metadata, sync, pos)."""
    if data[:4] != MAGIC:
        raise ValueError("seqfile: bad magic (SEQ v6 expected)")
    pos = 4
    key_class, pos = _read_text(data, pos)
    value_class, pos = _read_text(data, pos)
    if pos + 2 > len(data):
        raise ValueError("seqfile: truncated header flags")
    compressed = data[pos] != 0
    block = data[pos + 1] != 0
    pos += 2
    if block:
        raise ValueError("seqfile: block compression not supported")
    codec = None
    if compressed:
        codec, pos = _read_text(data, pos)
        if codec != DEFLATE_CODEC:
            raise ValueError(f"seqfile: unsupported codec {codec}")
    if pos + 4 > len(data):
        raise ValueError("seqfile: truncated metadata count")
    (n_meta,) = struct.unpack_from(">i", data, pos)
    pos += 4
    if n_meta < 0 or n_meta > 1 << 20:
        raise ValueError("seqfile: implausible metadata count")
    meta = {}
    for _ in range(n_meta):
        k, pos = _read_text(data, pos)
        v, pos = _read_text(data, pos)
        meta[k] = v
    sync = data[pos:pos + 16]
    if len(sync) != 16:
        raise ValueError("seqfile: truncated sync marker")
    return key_class, value_class, compressed, meta, sync, pos + 16


def _unwrap_bytes_writable(blob: bytes) -> bytes:
    if len(blob) < 4:
        raise ValueError("seqfile: truncated BytesWritable")
    (n,) = struct.unpack(">i", blob[:4])
    if n < 0 or 4 + n != len(blob):
        raise ValueError("seqfile: BytesWritable length mismatch")
    return blob[4:]


def iter_seqfile(data: bytes):
    """Yield (key bytes, value bytes); strict — damage raises.
    Record frame: [recLen i32][keyLen i32][key][value], recLen = key
    bytes + value bytes (excluding both length fields, the Hadoop
    convention)."""
    _k, _v, compressed, _m, sync, pos = read_header(data)
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("seqfile: truncated record length")
        (rec_len,) = struct.unpack_from(">i", data, pos)
        pos += 4
        if rec_len == -1:  # sync escape
            if data[pos:pos + 16] != sync:
                raise ValueError("seqfile: sync marker mismatch")
            pos += 16
            continue
        if rec_len < 8 or pos + 4 + rec_len > n:
            raise ValueError("seqfile: implausible record length")
        (key_len,) = struct.unpack_from(">i", data, pos)
        pos += 4
        if key_len < 4 or key_len > rec_len:
            raise ValueError("seqfile: implausible key length")
        key_blob = data[pos:pos + key_len]
        vb = data[pos + key_len:pos + rec_len]
        pos += rec_len
        if compressed:
            try:
                vb = zlib.decompress(vb)
            except zlib.error as e:
                raise ValueError(f"seqfile: corrupt deflate value "
                                 f"({e})") from None
        yield _unwrap_bytes_writable(key_blob), _unwrap_bytes_writable(vb)


def record_index(data: bytes) -> list[tuple[int, int]]:
    """(offset, framed_size) per record, payloads untouched; framed
    size = 8 header bytes + recLen."""
    _k, _v, _c, _m, sync, pos = read_header(data)
    out = []
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("seqfile: truncated record length")
        (rec_len,) = struct.unpack_from(">i", data, pos)
        if rec_len == -1:
            if data[pos + 4:pos + 20] != sync:
                raise ValueError("seqfile: sync marker mismatch")
            pos += 20
            continue
        if rec_len < 8 or pos + 8 + rec_len > n:
            raise ValueError("seqfile: implausible record length")
        out.append((pos, 8 + rec_len))
        pos += 8 + rec_len
    return out


def scan_seqfile(data: bytes) -> tuple[list[tuple[bytes, bytes]], dict]:
    """LENIENT walk: damage costs the records between sync points, not
    the file — resync scans for the next sync-escape (the marker's
    whole purpose). Returns (records, counters)."""
    counters = {"n_records": 0, "bad_records": 0, "junk_bytes": 0}
    out: list[tuple[bytes, bytes]] = []
    try:
        _k, _v, compressed, _m, sync, pos = read_header(data)
    except ValueError:
        counters["bad_records"] = 1
        counters["junk_bytes"] = len(data)
        return out, counters
    n = len(data)
    escape = struct.pack(">i", -1) + sync
    while pos < n:
        try:
            (rec_len,) = struct.unpack_from(">i", data, pos)
            if rec_len == -1:
                if data[pos + 4:pos + 20] != sync:
                    raise ValueError("sync mismatch")
                pos += 20
                continue
            if rec_len < 8 or pos + 8 + rec_len > n:
                raise ValueError("bad record length")
            (key_len,) = struct.unpack_from(">i", data, pos + 4)
            if key_len < 4 or key_len > rec_len:
                raise ValueError("bad key length")
            kb = data[pos + 8:pos + 8 + key_len]
            vb = data[pos + 8 + key_len:pos + 8 + rec_len]
            if compressed:
                vb = zlib.decompress(vb)
            rec = (_unwrap_bytes_writable(kb),
                   _unwrap_bytes_writable(vb))
        except (ValueError, zlib.error, struct.error):
            counters["bad_records"] += 1
            nxt = data.find(escape, pos + 1)
            end = n if nxt < 0 else nxt + 20
            counters["junk_bytes"] += (n - pos if nxt < 0
                                       else nxt - pos)
            pos = end
            continue
        out.append(rec)
        counters["n_records"] += 1
        pos += 8 + rec_len
    return out, counters

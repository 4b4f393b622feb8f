"""LZ4 block + frame codec (public specs: lz4_Block_format.md and
lz4_Frame_format.md v1.6.x, github.com/lz4/lz4) and XXH32 — the fast
companion compression to zstd in corpus shards (`.jsonl.lz4`, Kafka
message sets, Hadoop SequenceFiles).

Pure-Python, both directions, same discipline as the zstd/flac/gif
codecs in this tree: writer in-module so round trips self-test,
adversarial fixtures come from the REAL liblz4 (pyarrow bundles it —
every test decodes liblz4 output and liblz4 re-decodes ours), strict
decoders raise ValueError on damage, and ``block_index`` walks frame
blocks without decoding (independent blocks = one ranged GET per
block at scale, the member_index / frame_index analog).

Implemented:

* block format: token/extended-length sequences, 2-byte offsets,
  overlap-safe match copies, the end-of-block restrictions; greedy
  hash-table compressor (4-byte window, last-5/12-byte guards).
* frame format: magic, FLG/BD descriptor (version 01, block
  independence, optional block checksums, content size, content
  checksum, header-checksum byte = (XXH32 >> 8) & 0xFF), 64 KB-4 MB
  block sizes, EndMark, skippable frames, frame concatenation.
* XXH32 (the frame format's checksum primitive; XXH64 lives in
  zstd.py).

Linked-block frames (B.Indep=0, liblz4's default) decode sequentially
(each block's match window is seeded with the frame's prior output);
``block_index`` refuses them — ranged access requires independence,
which is why this writer always sets B.Indep. Dictionaries (DictID)
raise clearly.
"""

from __future__ import annotations

import struct

LZ4F_MAGIC = 0x184D2204
SKIPPABLE_LO = 0x184D2A50
SKIPPABLE_HI = 0x184D2A5F

_P1, _P2, _P3, _P4, _P5 = (2654435761, 2246822519, 3266489917,
                           668265263, 374761393)
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 (public algorithm, github.com/Cyan4973/xxHash spec)."""
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed
        v4 = (seed - _P1) & _M32
        while pos + 16 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                (lane,) = struct.unpack_from("<I", data, pos + 4 * i)
                v = (v + lane * _P2) & _M32
                v = (_rotl32(v, 13) * _P1) & _M32
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            pos += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12)
             + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        h = (h + lane * _P3) & _M32
        h = (_rotl32(h, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        h = (h + data[pos] * _P5) & _M32
        h = (_rotl32(h, 11) * _P1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# --------------------------------------------------------------------------
# block format
# --------------------------------------------------------------------------


def decompress_block(data: bytes, max_size: int = 1 << 30,
                     history: bytes = b"") -> bytes:
    """Decode one LZ4 block; ``max_size`` bounds hostile expansion.
    ``history`` seeds the match window for linked-block frames (matches
    may reach into the previous blocks' output)."""
    out = bytearray(history)
    base = len(history)
    pos, n = 0, len(data)
    while True:
        if pos >= n:
            raise ValueError("lz4: truncated block (missing token)")
        token = data[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated literal length")
                b = data[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise ValueError("lz4: truncated literals")
        out += data[pos:pos + lit]
        pos += lit
        if len(out) - base > max_size:
            raise ValueError("lz4: output exceeds max_size")
        if pos == n:
            return bytes(out[base:])  # last sequence is literals-only
        if pos + 2 > n:
            raise ValueError("lz4: truncated match offset")
        (offset,) = struct.unpack_from("<H", data, pos)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError(f"lz4: invalid match offset {offset}")
        mlen = token & 0xF
        if mlen == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated match length")
                b = data[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        if len(out) - base + mlen > max_size:
            raise ValueError("lz4: output exceeds max_size")
        start = len(out) - offset
        if offset >= mlen:
            out += out[start:start + mlen]
        else:  # overlapping copy, byte-exact semantics
            for i in range(mlen):
                out.append(out[start + i])


def compress_block(data: bytes) -> bytes:
    """Greedy hash-table compressor (the reference lz4 fast-path
    shape): 4-byte hashes, last match must end 12 bytes before the
    block end, final 5+ bytes are always literals."""
    n = len(data)
    out = bytearray()

    def emit(lit_start: int, lit_end: int, offset: int, mlen: int) -> None:
        lit = lit_end - lit_start
        tok_lit = 15 if lit >= 15 else lit
        if mlen == 0:
            out.append(tok_lit << 4)
        else:
            m = mlen - 4
            tok_m = 15 if m >= 15 else m
            out.append((tok_lit << 4) | tok_m)
        rest = lit - 15
        while rest >= 0:
            out.append(min(rest, 255))
            if rest < 255:
                break
            rest -= 255
        out.extend(data[lit_start:lit_end])
        if mlen == 0:
            return
        out.extend(struct.pack("<H", offset))
        rest = (mlen - 4) - 15
        while rest >= 0:
            out.append(min(rest, 255))
            if rest < 255:
                break
            rest -= 255

    if n < 13:  # too short for any legal match: all literals
        emit(0, n, 0, 0)
        return bytes(out)

    table: dict[bytes, int] = {}
    anchor = 0
    pos = 0
    limit = n - 12  # matches must leave the 12-byte tail alone
    while pos <= limit:
        key = data[pos:pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is None or pos - cand > 0xFFFF or \
                data[cand:cand + 4] != key:
            pos += 1
            continue
        mlen = 4
        max_m = (n - 5) - pos  # matches may not cover the last 5 bytes
        while mlen < max_m and data[cand + mlen] == data[pos + mlen]:
            mlen += 1
        emit(anchor, pos, pos - cand, mlen)
        pos += mlen
        anchor = pos
    emit(anchor, n, 0, 0)
    return bytes(out)


# --------------------------------------------------------------------------
# frame format
# --------------------------------------------------------------------------

_BD_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def compress_frame(content: bytes, block_size: int = 1 << 16,
                   content_checksum: bool = True,
                   block_checksums: bool = False,
                   store_content_size: bool = True) -> bytes:
    """A spec-valid LZ4 frame with INDEPENDENT blocks (each block is
    its own ranged-GET unit); incompressible blocks are stored raw per
    the uncompressed-bit escape."""
    bd_id = next((k for k, v in sorted(_BD_SIZES.items())
                  if block_size <= v), 7)
    flg = (1 << 6) | (1 << 5)  # version 01, B.Indep
    if block_checksums:
        flg |= 1 << 4
    if store_content_size:
        flg |= 1 << 3
    if content_checksum:
        flg |= 1 << 2
    head = bytearray(struct.pack("<I", LZ4F_MAGIC))
    desc = bytearray([flg, bd_id << 4])
    if store_content_size:
        desc += struct.pack("<Q", len(content))
    head += desc
    head.append((xxh32(bytes(desc)) >> 8) & 0xFF)
    out = head
    step = _BD_SIZES[bd_id]
    for at in range(0, len(content), step):
        chunk = content[at:at + step]
        comp = compress_block(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            blob = comp
        else:  # stored: high bit flags uncompressed
            out += struct.pack("<I", len(chunk) | 0x80000000)
            blob = chunk
        out += blob
        if block_checksums:
            out += struct.pack("<I", xxh32(blob))
    out += struct.pack("<I", 0)  # EndMark
    if content_checksum:
        out += struct.pack("<I", xxh32(content))
    return bytes(out)


def _parse_frame_descriptor(data: bytes, pos: int):
    if pos + 3 > len(data):
        raise ValueError("lz4: truncated frame descriptor")
    flg = data[pos]
    bd = data[pos + 1]
    if (flg >> 6) != 1:
        raise ValueError(f"lz4: unsupported frame version {flg >> 6}")
    if flg & 1:
        raise ValueError("lz4: dictionaries not supported")
    if flg & 2:
        raise ValueError("lz4: reserved FLG bit set")
    bd_id = (bd >> 4) & 7
    if bd_id not in _BD_SIZES or bd & 0x8F:
        raise ValueError("lz4: invalid BD byte")
    hdr = {"independent": bool(flg & (1 << 5)),
           "block_checksums": bool(flg & (1 << 4)),
           "content_size": None,
           "content_checksum": bool(flg & (1 << 2)),
           "block_max": _BD_SIZES[bd_id]}
    desc_start = pos
    pos += 2
    if flg & (1 << 3):
        if pos + 8 > len(data):
            raise ValueError("lz4: truncated content size")
        (hdr["content_size"],) = struct.unpack_from("<Q", data, pos)
        pos += 8
    if pos >= len(data):
        raise ValueError("lz4: truncated header checksum")
    want = data[pos]
    got = (xxh32(data[desc_start:pos]) >> 8) & 0xFF
    if want != got:
        raise ValueError("lz4: header checksum mismatch")
    return hdr, pos + 1


def block_index(data: bytes) -> list[tuple[int, int, bool]]:
    """(payload_offset, stored_size, is_compressed) per block of the
    frame at offset 0 — the ranged-GET walk (independent blocks only,
    which is all this writer emits). No payload is decoded or hashed."""
    magic = int.from_bytes(data[:4], "little")
    if magic != LZ4F_MAGIC:
        raise ValueError("lz4: bad frame magic")
    hdr, pos = _parse_frame_descriptor(data, 4)
    if not hdr["independent"]:
        raise ValueError(
            "lz4: block_index requires independent blocks (B.Indep=0 "
            "frames decode only sequentially)")
    out = []
    n = len(data)
    while True:
        if pos + 4 > n:
            raise ValueError("lz4: truncated block header")
        (word,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if word == 0:
            return out
        size = word & 0x7FFFFFFF
        if size > hdr["block_max"] + 16:
            raise ValueError("lz4: block size exceeds frame maximum")
        if pos + size > n:
            raise ValueError("lz4: truncated block payload")
        out.append((pos, size, not word & 0x80000000))
        pos += size
        if hdr["block_checksums"]:
            pos += 4


def decompress(data: bytes, verify_checksum: bool = True) -> bytes:
    """Decode a concatenation of LZ4 frames (skippable frames are
    skipped), returning the content of all data frames in order."""
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("lz4: truncated frame magic")
        magic = int.from_bytes(data[pos:pos + 4], "little")
        pos += 4
        if SKIPPABLE_LO <= magic <= SKIPPABLE_HI:
            if pos + 4 > n:
                raise ValueError("lz4: truncated skippable frame")
            (size,) = struct.unpack_from("<I", data, pos)
            if pos + 4 + size > n:
                raise ValueError("lz4: truncated skippable frame")
            pos += 4 + size
            continue
        if magic != LZ4F_MAGIC:
            raise ValueError(f"lz4: bad magic 0x{magic:08x} at {pos - 4}")
        hdr, pos = _parse_frame_descriptor(data, pos)
        frame_start = len(out)
        while True:
            if pos + 4 > n:
                raise ValueError("lz4: truncated block header")
            (word,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if word == 0:
                break
            size = word & 0x7FFFFFFF
            if pos + size > n:
                raise ValueError("lz4: truncated block payload")
            blob = data[pos:pos + size]
            pos += size
            if hdr["block_checksums"]:
                if pos + 4 > n:
                    raise ValueError("lz4: truncated block checksum")
                (want,) = struct.unpack_from("<I", data, pos)
                pos += 4
                if verify_checksum and xxh32(blob) != want:
                    raise ValueError("lz4: block checksum mismatch")
            if word & 0x80000000:
                out += blob
            else:
                hist = (b"" if hdr["independent"]
                        else bytes(out[frame_start:]))
                piece = decompress_block(blob, max_size=hdr["block_max"],
                                         history=hist)
                if len(piece) > hdr["block_max"]:
                    raise ValueError("lz4: block exceeds frame maximum")
                out += piece
        if hdr["content_checksum"]:
            if pos + 4 > n:
                raise ValueError("lz4: truncated content checksum")
            (want,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if verify_checksum and \
                    xxh32(bytes(out[frame_start:])) != want:
                raise ValueError("lz4: content checksum mismatch")
        if hdr["content_size"] is not None and \
                len(out) - frame_start != hdr["content_size"]:
            raise ValueError(
                f"lz4: frame decoded {len(out) - frame_start} bytes, "
                f"header promised {hdr['content_size']}")
    return bytes(out)

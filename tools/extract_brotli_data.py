"""One-time extractor for the RFC 7932 static data tables.

Brotli's decoder needs three blocks of constant data defined by the
public spec (RFC 7932):

* the static dictionary (Appendix A, 122,784 bytes of word data plus
  the per-length size-bits table),
* the 121 word transforms (Appendix B: prefix string, transform type,
  suffix string),
* the 2,048-byte literal-context lookup table (section 7.1: four
  context modes x two 256-entry lookups).

Rather than transcribing thousands of lines of hex from the RFC, this
script reads the identical data out of the system's brotli library
(``libbrotlicommon`` exports ``BrotliGetDictionary`` /
``BrotliGetTransforms`` and the context table symbol) and freezes it
into ``gfw_pixetl_spark/sources/_brotli_data.bin`` so the repo needs
no brotli library at runtime.  Every block is validated against
invariants stated in the RFC before being written:

* dictionary: size 122,784; size-bits table matches RFC Appendix A's
  word counts; the length-4 section starts ``timedownlifeleft``;
* transforms: exactly 121; #0 is ("", Identity, ""); #1 is
  ("", Identity, " ");
* context LUT: the LSB6 and MSB6 quadrants are closed-form
  (``lut0[b] = b & 63`` / ``b >> 2``, ``lut1 = 0``) and are checked
  bit for bit.

File layout (all little-endian):
  magic  b"BRDATA01"
  u32    zlib-compressed payload length
  bytes  zlib payload:
           25 bytes  size_bits_by_length[0..24]
           122784    dictionary data
           2048      context lookup table
           u16       number of transforms (121)
           per transform: u8 len_prefix, prefix, u8 type,
                          u8 len_suffix, suffix

Run:  python tools/extract_brotli_data.py [path-to-libbrotlicommon]
"""
from __future__ import annotations

import ctypes
import glob
import struct
import sys
import zlib
from pathlib import Path

OUT = (Path(__file__).resolve().parent.parent / "gfw_pixetl_spark" /
       "sources" / "_brotli_data.bin")

DICT_SIZE = 122784
# RFC 7932 Appendix A: number of words of each length is 2**size_bits.
SIZE_BITS = [0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9,
             8, 7, 7, 8, 7, 7, 6, 6, 5, 5]


class _Dictionary(ctypes.Structure):
    _fields_ = [("size_bits_by_length", ctypes.c_uint8 * 32),
                ("offsets_by_length", ctypes.c_uint32 * 32),
                ("data_size", ctypes.c_size_t),
                ("data", ctypes.POINTER(ctypes.c_uint8))]


class _Transforms(ctypes.Structure):
    _fields_ = [("prefix_suffix_size", ctypes.c_uint16),
                ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
                ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
                ("num_transforms", ctypes.c_uint32),
                ("transforms", ctypes.POINTER(ctypes.c_uint8)),
                ("params", ctypes.POINTER(ctypes.c_uint8)),
                ("cutOffTransforms", ctypes.c_int16 * 10)]


def _find_lib() -> str:
    if len(sys.argv) > 1:
        return sys.argv[1]
    for pat in ("/usr/lib/*/libbrotlicommon.so*",
                "/usr/lib/libbrotlicommon.so*",
                "/root/miniconda/lib/libbrotlicommon.so*",
                "/opt/conda/lib/libbrotlicommon.so*"):
        hits = sorted(glob.glob(pat))
        if hits:
            return hits[0]
    raise SystemExit("libbrotlicommon not found; pass its path")


def main() -> None:
    lib = ctypes.CDLL(_find_lib())
    lib.BrotliGetDictionary.restype = ctypes.POINTER(_Dictionary)
    lib.BrotliGetTransforms.restype = ctypes.POINTER(_Transforms)

    d = lib.BrotliGetDictionary().contents
    assert d.data_size == DICT_SIZE, d.data_size
    size_bits = list(d.size_bits_by_length)[:25]
    assert size_bits == SIZE_BITS, size_bits
    data = bytes(ctypes.cast(
        d.data, ctypes.POINTER(ctypes.c_uint8 * DICT_SIZE)).contents)
    assert data.startswith(b"timedownlifeleft"), data[:16]

    t = lib.BrotliGetTransforms().contents
    assert t.num_transforms == 121, t.num_transforms
    ps = bytes(ctypes.cast(
        t.prefix_suffix,
        ctypes.POINTER(ctypes.c_uint8 * t.prefix_suffix_size)).contents)
    psmap = list(ctypes.cast(
        t.prefix_suffix_map, ctypes.POINTER(ctypes.c_uint16 * 256)).contents)
    triples = bytes(ctypes.cast(
        t.transforms,
        ctypes.POINTER(ctypes.c_uint8 * (t.num_transforms * 3))).contents)

    def _ps(idx: int) -> bytes:
        off = psmap[idx]
        return ps[off + 1:off + 1 + ps[off]]

    transforms = []
    for i in range(t.num_transforms):
        pre, typ, suf = triples[3 * i:3 * i + 3]
        transforms.append((_ps(pre), typ, _ps(suf)))
    # RFC 7932 Appendix B: the first two transforms.
    assert transforms[0] == (b"", 0, b""), transforms[0]
    assert transforms[1] == (b"", 0, b" "), transforms[1]

    ctx = bytes(ctypes.cast(
        getattr(lib, "_kBrotliContextLookupTable"),
        ctypes.POINTER(ctypes.c_uint8 * 2048)).contents)
    # RFC 7932 section 7.1 closed forms for the LSB6/MSB6 modes.
    assert all(ctx[i] == (i & 63) for i in range(256))          # LSB6 lut0
    assert all(ctx[256 + i] == 0 for i in range(256))           # LSB6 lut1
    assert all(ctx[512 + i] == (i >> 2) for i in range(256))    # MSB6 lut0
    assert all(ctx[768 + i] == 0 for i in range(256))           # MSB6 lut1

    payload = bytearray()
    payload += bytes(SIZE_BITS)
    payload += data
    payload += ctx
    payload += struct.pack("<H", len(transforms))
    for pre, typ, suf in transforms:
        payload += struct.pack("<B", len(pre)) + pre
        payload += struct.pack("<B", typ)
        payload += struct.pack("<B", len(suf)) + suf

    comp = zlib.compress(bytes(payload), 9)
    OUT.write_bytes(b"BRDATA01" + struct.pack("<I", len(comp)) + comp)
    print(f"wrote {OUT} ({len(comp)} bytes compressed, "
          f"{len(payload)} raw, {len(transforms)} transforms)")


if __name__ == "__main__":
    main()

"""Pure-Python Apache Avro Object Container File reader/writer.

Avro is the row-major interchange format of the Kafka/Hadoop
ecosystem — the natural ingest twin of the columnar ORC/parquet
surface already in-tree. Everything here derives from the public
Avro 1.11 specification (https://avro.apache.org/docs/1.11.1/
specification/): the OCF layout (magic ``Obj\\x01``, file-metadata
map carrying ``avro.schema``/``avro.codec``, a 16-byte sync marker,
then blocks of ``count, byte_size, objects, sync``), the binary
encoding (zigzag-varint ints/longs, little-endian IEEE floats,
length-prefixed bytes/strings, fields in declaration order,
index-prefixed unions, block-encoded arrays/maps), the null /
deflate / snappy(+CRC32) / zstd codecs (decompressors and
compressors from the in-tree codec modules), and full READER-SCHEMA
RESOLUTION: field matching by name, reader defaults for missing
writer fields, skipped writer fields, the int->long->float->double
and string<->bytes promotions, and union branch resolution.

Logical types (date, timestamp-millis/micros, decimal) are carried
as annotations on the decoded schema; value conversion is the
caller's concern (the harness converts timestamp-micros longs to
Spark timestamps).

Cross-validation: ``tests/test_avro.py`` round-trips our writer
through the Java Avro library bundled with Spark (via py4j:
``org.apache.avro.file.DataFileReader``) and decodes Java-written
files, in addition to the q448+ oracle queries.

The reference engine has no row-interchange sink (it writes GeoTIFF,
``pipes/pipe.py``); this extends the ingest/export surface the same
way sources/orc.py and sinks/webdataset.py do.
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib
from typing import Any, Callable, Iterable

MAGIC = b"Obj\x01"

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}

_PROMOTIONS: dict[str, set[str]] = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"bytes"},
    "bytes": {"string"},
}


# --------------------------------------------------------------------------
# Schema handling
# --------------------------------------------------------------------------

def parse_schema(schema: str | dict | list) -> Any:
    """Parse a schema given as JSON text or already-decoded structure."""
    if isinstance(schema, str):
        try:
            return json.loads(schema)
        except json.JSONDecodeError:
            if schema in _PRIMITIVES:
                return schema
            raise
    return schema


def _type_name(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _record_fields(schema: dict) -> list[dict]:
    return schema["fields"]


# --------------------------------------------------------------------------
# Binary encoding
# --------------------------------------------------------------------------

def _zz(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzz(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def enc_long(n: int) -> bytes:
    n = _zz(n)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class Decoder:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def long(self) -> int:
        v = 0
        shift = 0
        d = self.data
        while True:
            b = d[self.pos]
            self.pos += 1
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return _unzz(v)
            shift += 7

    def raw(self, n: int) -> bytes:
        b = self.data[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("truncated avro data")
        self.pos += n
        return b

    def eof(self) -> bool:
        return self.pos >= len(self.data)


def encode_value(schema: Any, v: Any, out: bytearray) -> None:
    t = _type_name(schema)
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        out += enc_long(int(v))
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "string":
        b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        out += enc_long(len(b)) + b
    elif t == "bytes":
        b = bytes(v)
        out += enc_long(len(b)) + b
    elif t == "union":
        for i, branch in enumerate(schema):
            if _matches(branch, v):
                out += enc_long(i)
                encode_value(branch, v, out)
                return
        raise ValueError(f"no union branch for {v!r} in {schema}")
    elif t == "record":
        for f in _record_fields(schema):
            encode_value(f["type"], v[f["name"]], out)
    elif t == "array":
        items = list(v)
        if items:
            out += enc_long(len(items))
            for it in items:
                encode_value(schema["items"], it, out)
        out += enc_long(0)
    elif t == "map":
        entries = dict(v)
        if entries:
            out += enc_long(len(entries))
            for k, mv in entries.items():
                encode_value("string", k, out)
                encode_value(schema["values"], mv, out)
        out += enc_long(0)
    elif t == "enum":
        out += enc_long(schema["symbols"].index(v))
    elif t == "fixed":
        b = bytes(v)
        if len(b) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out += b
    else:
        raise ValueError(f"unsupported schema type {t!r}")


def _matches(schema: Any, v: Any) -> bool:
    t = _type_name(schema)
    if t == "null":
        return v is None
    if v is None:
        return False
    if t == "boolean":
        return isinstance(v, bool)
    if t in ("int", "long"):
        return isinstance(v, int) and not isinstance(v, bool)
    if t in ("float", "double"):
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if t == "string":
        return isinstance(v, str)
    if t in ("bytes", "fixed"):
        return isinstance(v, (bytes, bytearray))
    if t == "record":
        return isinstance(v, dict)
    if t == "array":
        return isinstance(v, (list, tuple))
    if t == "map":
        return isinstance(v, dict)
    if t == "enum":
        return isinstance(v, str)
    return False


def decode_value(schema: Any, r: Decoder) -> Any:
    t = _type_name(schema)
    if t == "null":
        return None
    if t == "boolean":
        return r.raw(1) != b"\x00"
    if t in ("int", "long"):
        return r.long()
    if t == "float":
        return struct.unpack("<f", r.raw(4))[0]
    if t == "double":
        return struct.unpack("<d", r.raw(8))[0]
    if t == "string":
        n = r.long()
        return r.raw(n).decode("utf-8")
    if t == "bytes":
        n = r.long()
        return r.raw(n)
    if t == "union":
        return decode_value(schema[r.long()], r)
    if t == "record":
        return {f["name"]: decode_value(f["type"], r)
                for f in _record_fields(schema)}
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:  # block byte-size follows; count is |n|
                r.long()
                n = -n
            for _ in range(n):
                out.append(decode_value(schema["items"], r))
    if t == "map":
        out_m: dict[str, Any] = {}
        while True:
            n = r.long()
            if n == 0:
                return out_m
            if n < 0:
                r.long()
                n = -n
            for _ in range(n):
                k = decode_value("string", r)
                out_m[k] = decode_value(schema["values"], r)
    if t == "enum":
        return schema["symbols"][r.long()]
    if t == "fixed":
        return r.raw(schema["size"])
    raise ValueError(f"unsupported schema type {t!r}")


def skip_value(schema: Any, r: Decoder) -> None:
    t = _type_name(schema)
    if t == "null":
        return
    if t == "boolean":
        r.raw(1)
    elif t in ("int", "long"):
        r.long()
    elif t == "float":
        r.raw(4)
    elif t == "double":
        r.raw(8)
    elif t in ("string", "bytes"):
        r.raw(r.long())
    elif t == "union":
        skip_value(schema[r.long()], r)
    elif t == "record":
        for f in _record_fields(schema):
            skip_value(f["type"], r)
    elif t in ("array", "map"):
        while True:
            n = r.long()
            if n == 0:
                return
            if n < 0:
                size = r.long()
                r.raw(size)
            else:
                inner = (schema["items"] if t == "array"
                         else schema["values"])
                for _ in range(n):
                    if t == "map":
                        r.raw(r.long())
                    skip_value(inner, r)
    elif t == "enum":
        r.long()
    elif t == "fixed":
        r.raw(schema["size"])
    else:
        raise ValueError(f"unsupported schema type {t!r}")


# --------------------------------------------------------------------------
# Schema resolution (reader != writer)
# --------------------------------------------------------------------------

def resolve(writer: Any, reader: Any) -> Callable[[Decoder], Any]:
    """Compile a decode plan for data written as ``writer``, read as
    ``reader`` — the spec's Schema Resolution rules."""
    wt, rt = _type_name(writer), _type_name(reader)

    if wt == "union" and rt == "union":
        plans = [resolve(b, reader) for b in writer]
        return lambda r: plans[r.long()](r)
    if wt == "union":
        plans = [resolve(b, reader) for b in writer]
        return lambda r: plans[r.long()](r)
    if rt == "union":
        for branch in reader:
            try:
                return resolve(writer, branch)
            except ValueError:
                continue
        raise ValueError(f"no reader union branch accepts writer {wt}")

    if wt == rt and wt in _PRIMITIVES:
        return lambda r: decode_value(writer, r)
    if wt in _PROMOTIONS and rt in _PROMOTIONS[wt]:
        if rt in ("long", "float", "double") and wt in ("int", "long"):
            if rt == "long":
                return lambda r: r.long()
            return lambda r: float(r.long())
        if wt == "float" and rt == "double":
            return lambda r: struct.unpack("<f", r.raw(4))[0]
        if wt == "string" and rt == "bytes":
            return lambda r: r.raw(r.long())
        if wt == "bytes" and rt == "string":
            return lambda r: r.raw(r.long()).decode("utf-8")
    if wt == "record" and rt == "record":
        wfields = _record_fields(writer)
        rfields = _record_fields(reader)
        rnames = {f["name"]: f for f in rfields}
        steps: list[tuple[str | None, Any]] = []
        matched: set[str] = set()
        for wf in wfields:
            rf = rnames.get(wf["name"])
            if rf is None:
                steps.append((None, wf["type"]))  # skip
            else:
                matched.add(wf["name"])
                steps.append((wf["name"], resolve(wf["type"], rf["type"])))
        defaults: list[tuple[str, Any]] = []
        for rf in rfields:
            if rf["name"] not in matched:
                if "default" not in rf:
                    raise ValueError(
                        f"reader field {rf['name']!r} missing and has "
                        f"no default")
                defaults.append((rf["name"],
                                 _default_value(rf["type"], rf["default"])))

        def read_record(r: Decoder) -> dict:
            rec: dict[str, Any] = {}
            for name, plan in steps:
                if name is None:
                    skip_value(plan, r)
                else:
                    rec[name] = plan(r)
            for name, dv in defaults:
                rec[name] = dv
            return rec

        return read_record
    if wt == "array" and rt == "array":
        item_plan = resolve(writer["items"], reader["items"])

        def read_array(r: Decoder) -> list:
            out = []
            while True:
                n = r.long()
                if n == 0:
                    return out
                if n < 0:
                    r.long()
                    n = -n
                for _ in range(n):
                    out.append(item_plan(r))

        return read_array
    if wt == "map" and rt == "map":
        val_plan = resolve(writer["values"], reader["values"])

        def read_map(r: Decoder) -> dict:
            out: dict[str, Any] = {}
            while True:
                n = r.long()
                if n == 0:
                    return out
                if n < 0:
                    r.long()
                    n = -n
                for _ in range(n):
                    k = r.raw(r.long()).decode("utf-8")
                    out[k] = val_plan(r)

        return read_map
    if wt == "enum" and rt == "enum":
        wsyms, rsyms = writer["symbols"], reader["symbols"]

        def read_enum(r: Decoder) -> str:
            s = wsyms[r.long()]
            if s not in rsyms:
                raise ValueError(f"enum symbol {s!r} not in reader schema")
            return s

        return read_enum
    if wt == "fixed" and rt == "fixed" and writer["size"] == reader["size"]:
        return lambda r: r.raw(writer["size"])
    raise ValueError(f"cannot resolve writer {wt} as reader {rt}")


def _default_value(schema: Any, dv: Any) -> Any:
    t = _type_name(schema)
    if t == "union":
        return _default_value(schema[0], dv)
    if t == "bytes" and isinstance(dv, str):
        return dv.encode("latin-1")  # spec: unicode-escaped byte string
    if t == "float" or t == "double":
        return float(dv) if dv is not None else None
    return dv


# --------------------------------------------------------------------------
# Codecs
# --------------------------------------------------------------------------

def _compress(codec: str, data: bytes) -> bytes:
    if codec == "null":
        return data
    if codec == "deflate":
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        return c.compress(data) + c.flush()
    if codec == "snappy":
        from .snappy import compress as sc

        return sc(data) + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    if codec == "zstandard":
        from .zstd import compress as zc

        return zc(data)
    raise ValueError(f"unsupported avro codec {codec!r}")


def _decompress(codec: str, data: bytes) -> bytes:
    if codec == "null":
        return data
    if codec == "deflate":
        return zlib.decompress(data, -15)
    if codec == "snappy":
        from .snappy import decompress as sd

        raw = sd(data[:-4])
        want = struct.unpack(">I", data[-4:])[0]
        if zlib.crc32(raw) & 0xFFFFFFFF != want:
            raise ValueError("avro snappy block CRC mismatch")
        return raw
    if codec == "zstandard":
        from .zstd import decompress as zd

        return zd(data)
    raise ValueError(f"unsupported avro codec {codec!r}")


# --------------------------------------------------------------------------
# Object Container File
# --------------------------------------------------------------------------

def write_avro(path: str, schema: str | dict, rows: Iterable[dict],
               codec: str = "deflate", block_rows: int = 4096
               ) -> dict[str, Any]:
    """Write an OCF; returns layout facts for audits."""
    sc = parse_schema(schema)
    schema_json = json.dumps(sc) if not isinstance(schema, str) else schema
    # deterministic sync marker: content-addressed, not random — two
    # writers of the same rows produce byte-identical files
    sync = hashlib.md5(schema_json.encode()).digest()
    out = bytearray(MAGIC)
    meta = {"avro.schema": schema_json.encode(),
            "avro.codec": codec.encode()}
    out += enc_long(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += enc_long(len(kb)) + kb + enc_long(len(v)) + v
    out += enc_long(0)
    out += sync

    n_rows = 0
    n_blocks = 0
    buf = bytearray()
    count = 0

    def flush() -> None:
        nonlocal buf, count, n_blocks
        if not count:
            return
        packed = _compress(codec, bytes(buf))
        out.extend(enc_long(count))
        out.extend(enc_long(len(packed)))
        out.extend(packed)
        out.extend(sync)
        n_blocks += 1
        buf = bytearray()
        count = 0

    for row in rows:
        encode_value(sc, row, buf)
        count += 1
        n_rows += 1
        if count >= block_rows:
            flush()
    flush()
    with open(path, "wb") as f:
        f.write(out)
    return {"n_rows": n_rows, "n_blocks": n_blocks,
            "file_bytes": len(out), "codec": codec}


class AvroFile:
    """Decoded OCF header: schema immediately, rows on demand."""

    def __init__(self, data: bytes) -> None:
        if not data.startswith(MAGIC):
            raise ValueError("not an avro OCF (bad magic)")
        r = Decoder(data, len(MAGIC))
        self.meta: dict[str, bytes] = {}
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:
                r.long()
                n = -n
            for _ in range(n):
                k = r.raw(r.long()).decode("utf-8")
                self.meta[k] = r.raw(r.long())
        self.schema = parse_schema(self.meta["avro.schema"].decode("utf-8"))
        self.codec = self.meta.get("avro.codec", b"null").decode("ascii")
        self.sync = r.raw(16)
        self._blocks_at = r.pos
        self.data = data

    def blocks(self) -> Iterable[tuple[int, bytes]]:
        """Yield (row_count, decompressed_bytes) per block."""
        r = Decoder(self.data, self._blocks_at)
        while not r.eof():
            count = r.long()
            size = r.long()
            packed = r.raw(size)
            if r.raw(16) != self.sync:
                raise ValueError("avro sync marker mismatch")
            yield count, _decompress(self.codec, packed)

    def read_all(self, reader_schema: str | dict | None = None
                 ) -> list[dict]:
        if reader_schema is None:
            plan = lambda r: decode_value(self.schema, r)  # noqa: E731
        else:
            plan = resolve(self.schema, parse_schema(reader_schema))
        rows: list[dict] = []
        for count, raw in self.blocks():
            br = Decoder(raw)
            for _ in range(count):
                rows.append(plan(br))
            if not br.eof():
                raise ValueError("avro block has trailing bytes")
        return rows


def read_avro(path: str, reader_schema: str | dict | None = None
              ) -> list[dict]:
    with open(path, "rb") as f:
        return AvroFile(f.read()).read_all(reader_schema)

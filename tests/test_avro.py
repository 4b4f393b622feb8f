"""Avro OCF codec tests: binary encoding, block framing, all four
codecs, schema resolution, and cross-validation against the Java
Avro library bundled with Spark (via py4j) — an independent
implementation of the same public spec (see sources/avro.py)."""

import json
import struct

import pytest

from gfw_pixetl_spark.sources import avro as av

SCHEMA = {
    "type": "record", "name": "Doc", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"], "default": None},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "vec", "type": {"type": "array", "items": "float"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "blob", "type": "bytes"},
        {"name": "ok", "type": "boolean"},
    ]}


def _f32(x):
    return struct.unpack("<f", struct.pack("<f", x))[0]


def _rows(n=10000):
    return [{"id": i, "name": None if i % 7 == 0 else f"n{i}",
             "score": i * 0.5,
             "tags": [f"t{j}" for j in range(i % 4)],
             "vec": [_f32(i * 0.1 * j) for j in range(3)],
             "props": {"a": i, "b": -i},
             "blob": bytes([i % 256, (i * 7) % 256]),
             "ok": i % 3 == 0} for i in range(n)]


# ----------------------------------------------------------- zigzag varint

def test_long_roundtrip():
    for v in (0, -1, 1, 63, -64, 64, 2 ** 40, -2 ** 40,
              2 ** 62, -(2 ** 62)):
        d = av.Decoder(av.enc_long(v))
        assert d.long() == v and d.eof()


def test_known_zigzag_bytes():
    # spec examples: 0->00, -1->01, 1->02, -2->03, 2->04
    assert [av.enc_long(v) for v in (0, -1, 1, -2, 2)] == [
        b"\x00", b"\x01", b"\x02", b"\x03", b"\x04"]
    assert av.enc_long(64) == b"\x80\x01"


# -------------------------------------------------------------- roundtrip

@pytest.mark.parametrize("codec", ["null", "deflate", "snappy",
                                   "zstandard"])
def test_roundtrip_all_codecs(tmp_path, codec):
    rows = _rows()
    p = str(tmp_path / f"{codec}.avro")
    info = av.write_avro(p, SCHEMA, rows, codec=codec)
    assert info["n_blocks"] == 3  # 10000 rows / 4096 block_rows
    assert av.read_avro(p) == rows


def test_deterministic_output(tmp_path):
    rows = _rows(100)
    p1, p2 = str(tmp_path / "a.avro"), str(tmp_path / "b.avro")
    av.write_avro(p1, SCHEMA, rows)
    av.write_avro(p2, SCHEMA, rows)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_empty_file(tmp_path):
    p = str(tmp_path / "e.avro")
    info = av.write_avro(p, SCHEMA, [])
    assert info["n_blocks"] == 0
    assert av.read_avro(p) == []


def test_enum_fixed_nested(tmp_path):
    schema = {
        "type": "record", "name": "R", "fields": [
            {"name": "e", "type": {"type": "enum", "name": "E",
                                   "symbols": ["A", "B", "C"]}},
            {"name": "f", "type": {"type": "fixed", "name": "F",
                                   "size": 4}},
            {"name": "inner", "type": {
                "type": "record", "name": "Inner", "fields": [
                    {"name": "x", "type": "int"}]}},
        ]}
    rows = [{"e": "BAC"[i % 3], "f": bytes([i % 256] * 4),
             "inner": {"x": i - 50}} for i in range(200)]
    p = str(tmp_path / "n.avro")
    av.write_avro(p, schema, rows)
    assert av.read_avro(p) == rows


def test_bad_magic_and_sync(tmp_path):
    with pytest.raises(ValueError):
        av.AvroFile(b"Obj\x02" + b"\x00" * 64)
    rows = _rows(10)
    p = str(tmp_path / "t.avro")
    av.write_avro(p, SCHEMA, rows)
    data = bytearray(open(p, "rb").read())
    data[-1] ^= 0xFF  # corrupt the trailing sync marker
    with pytest.raises(ValueError):
        av.AvroFile(bytes(data)).read_all()


def test_snappy_crc_checked(tmp_path):
    rows = _rows(10)
    p = str(tmp_path / "t.avro")
    av.write_avro(p, SCHEMA, rows, codec="snappy")
    data = bytearray(open(p, "rb").read())
    # flip a bit inside the block body (between header sync and tail sync)
    data[len(data) - 30] ^= 0x01
    f = av.AvroFile(bytes(data))
    with pytest.raises(ValueError):
        f.read_all()


# ------------------------------------------------------- schema resolution

READER_V2 = {
    "type": "record", "name": "Doc", "fields": [
        {"name": "score", "type": "double"},
        {"name": "id", "type": "double"},
        {"name": "name", "type": ["null", "string"], "default": None},
        {"name": "added", "type": "string", "default": "x"},
    ]}


def test_schema_resolution(tmp_path):
    rows = _rows(1000)
    p = str(tmp_path / "t.avro")
    av.write_avro(p, SCHEMA, rows)
    got = av.read_avro(p, READER_V2)
    assert got[5] == {"score": 2.5, "id": 5.0, "name": "n5", "added": "x"}
    assert got[7] == {"score": 3.5, "id": 7.0, "name": None, "added": "x"}
    assert len(got) == 1000


def test_resolution_promotions():
    cases = [
        ("int", "long", 42, 42),
        ("int", "double", -7, -7.0),
        ("long", "float", 1000, 1000.0),
        ("float", "double", 2.5, 2.5),
        ("string", "bytes", "hi", b"hi"),
        ("bytes", "string", b"hi", "hi"),
    ]
    for wt, rt, v, expect in cases:
        buf = bytearray()
        av.encode_value(wt, v, buf)
        got = av.resolve(wt, rt)(av.Decoder(bytes(buf)))
        assert got == expect and type(got) is type(expect)


def test_resolution_missing_default_raises():
    w = {"type": "record", "name": "R",
         "fields": [{"name": "a", "type": "int"}]}
    r = {"type": "record", "name": "R",
         "fields": [{"name": "a", "type": "int"},
                    {"name": "b", "type": "int"}]}  # no default
    with pytest.raises(ValueError):
        av.resolve(w, r)


def test_resolution_union_reader():
    # writer plain int, reader ["null","int"]
    buf = bytearray()
    av.encode_value("int", 9, buf)
    assert av.resolve("int", ["null", "int"])(av.Decoder(bytes(buf))) == 9


# --------------------------------------------------------- java interop

JSCHEMA = {
    "type": "record", "name": "Doc", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"], "default": None},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
    ]}


def _jrows(n=2000):
    return [{"id": i, "name": None if i % 7 == 0 else f"n{i}",
             "score": i * 0.5, "ok": i % 3 == 0} for i in range(n)]


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy",
                                   "zstandard"])
def test_java_reads_our_files(spark, tmp_path, codec):
    jvm = spark._jvm
    rows = _jrows()
    p = str(tmp_path / "ours.avro")
    av.write_avro(p, JSCHEMA, rows, codec=codec)
    dr = jvm.org.apache.avro.generic.GenericDatumReader()
    fr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(p), dr)
    got = []
    while fr.hasNext():
        rec = fr.next()
        nm = rec.get("name")
        got.append({"id": rec.get("id"),
                    "name": None if nm is None else nm.toString(),
                    "score": rec.get("score"), "ok": rec.get("ok")})
    fr.close()
    assert got == rows


def test_our_reader_reads_java_files(spark, tmp_path):
    jvm = spark._jvm
    rows = _jrows(500)
    p = str(tmp_path / "java.avro")
    jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(JSCHEMA))
    w = jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    fw = jvm.org.apache.avro.file.DataFileWriter(w)
    fw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    fw.create(jschema, jvm.java.io.File(p))
    for r in rows:
        rec = jvm.org.apache.avro.generic.GenericData.Record(jschema)
        rec.put("id", jvm.java.lang.Long(str(r["id"])))
        rec.put("name", r["name"])
        rec.put("score", float(r["score"]))
        rec.put("ok", bool(r["ok"]))
        fw.append(rec)
    fw.close()
    assert av.read_avro(p) == rows

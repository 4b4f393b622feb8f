"""Schema-less protobuf audit (functions/protoaudit.py): validated
against the in-tree tf.train.Example ENCODER — the audit of a real
Example must recover the exact Features/Feature/kind field tree its
schema defines — plus the wire-format corruption surface."""

from __future__ import annotations

import pytest

from gfw_pixetl_spark.functions.protoaudit import (
    audit_message, field_paths, walk_fields,
)
from gfw_pixetl_spark.sources.tfrecord import encode_example


def test_walk_fields_all_wire_types():
    # 1:varint=150, 2:fixed64, 3:"abc", 4:fixed32
    blob = (b"\x08\x96\x01"
            b"\x11\x01\x00\x00\x00\x00\x00\x00\x00"
            b"\x1a\x03abc"
            b"\x25\x02\x00\x00\x00")
    got = list(walk_fields(blob))
    assert got == [(1, 0, 150), (2, 1, 1), (3, 2, b"abc"), (4, 5, 2)]


def test_walk_fields_corruption():
    with pytest.raises(ValueError):
        list(walk_fields(b"\x08"))             # truncated varint
    with pytest.raises(ValueError):
        list(walk_fields(b"\x1a\x05ab"))       # truncated LEN
    with pytest.raises(ValueError):
        list(walk_fields(b"\x00\x01"))         # field number 0
    with pytest.raises(ValueError):
        list(walk_fields(b"\x0b"))             # group wire type
    with pytest.raises(ValueError):
        list(walk_fields(b"\x11\x01\x00"))     # truncated fixed64


def test_audit_recovers_tf_example_tree():
    """tf.train.Example schema: Example.features(1) ->
    Features.feature(1, map entry) -> entry.key(1)/value(2) ->
    Feature.bytes_list(1)/float_list(2)/int64_list(3) -> .value(1)."""
    ex = encode_example({"ids": [7, 300], "text": [b"hello world"]})
    rows = {r["path"]: r for r in field_paths(ex)}
    assert rows["1"]["kind"] == "message"            # features
    assert rows["1.1"]["kind"] == "message"          # feature entries
    assert rows["1.1"]["count"] == 2                 # two map entries
    assert rows["1.1.1"]["kind"] == "text"           # keys
    assert rows["1.1.1"]["count"] == 2               # "ids", "text"
    # the two Feature messages are honestly ambiguous: the bytes_list
    # one ("hello world") is ALSO valid text, so kind may land either
    # way — but the Int64List branch must be recovered structurally
    assert rows["1.1.2"]["count"] == 2
    assert "1.1.2.3" in rows                         # Int64List
    assert rows["1.1.2.3.1"]["count"] == 1           # packed values


def test_text_vs_message_ambiguity_is_retained():
    # field 1 = "hello" (valid text that does NOT re-parse)
    blob = b"\x0a\x05hello"
    tree = audit_message(blob)
    assert tree[1]["kind"] == "text"
    assert "could_be_message" not in tree[1]
    # field 1 = b"\x08\x01" is BOTH a valid message {1: varint 1}
    # and printable-ish?  \x08 is not printable -> message
    tree = audit_message(b"\x0a\x02\x08\x01")
    assert tree[1]["kind"] == "message"
    assert tree[1]["children"][1]["kind"] == "varint"


def test_field_paths_counts_and_bytes():
    inner = b"\x08\x2a"                     # {1: 42}
    blob = (b"\x0a" + bytes([len(inner)]) + inner) * 3
    rows = field_paths(blob)
    top = next(r for r in rows if r["path"] == "1")
    assert top["count"] == 3
    assert top["bytes"] == 3 * len(inner)
    child = next(r for r in rows if r["path"] == "1.1")
    assert child["count"] == 3 and child["kind"] == "varint"


def test_empty_message():
    assert audit_message(b"") == {}
    assert field_paths(b"") == []

"""Hypothesis property layers for the round-7 fourth-wave modules:
Delta log replay vs a dict simulation, Iceberg snapshot isolation vs
a list simulation, protobuf walk vs a generative encoder, SURT
construction, and MediaWiki dump round trips."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gfw_pixetl_spark.functions.protoaudit import walk_fields
from gfw_pixetl_spark.sources.commoncrawl import surt
from gfw_pixetl_spark.sources.deltalog import (
    add_action, delta_commit, delta_metadata, delta_snapshot,
    remove_action, write_checkpoint,
)
from gfw_pixetl_spark.sources.mediawiki import iter_pages, write_dump

META = delta_metadata([("doc_id", "long"), ("lang", "string")],
                      ["lang"])

# ---------------------------------------------------------------------------
# Delta: random add/remove/checkpoint histories replay like a dict
# ---------------------------------------------------------------------------

_paths = st.sampled_from([f"f{i}.parquet" for i in range(6)])
_ops = st.lists(st.tuples(st.sampled_from(["add", "remove"]), _paths),
                min_size=1, max_size=24)


@settings(max_examples=25, deadline=None)
@given(_ops, st.integers(0, 23), st.data())
def test_delta_replay_matches_simulation(ops, cp_at, data):
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        t = f"{tmp}/tbl"
        expected_at: list[set] = []
        live: set = set()
        for v, (op, path) in enumerate(ops):
            actions = []
            if v == 0:
                actions.append({"metaData": META})
            if op == "add":
                actions.append({"add": add_action(
                    path, {"lang": "en"}, 1, 1)})
                live.add(path)
            else:
                actions.append({"remove": remove_action(path)})
                live.discard(path)
            delta_commit(t, v, actions)
            expected_at.append(set(live))
            if v == cp_at:
                write_checkpoint(t, v)
        # head and a random historical version both match the
        # simulation regardless of where the checkpoint was cut
        head = delta_snapshot(t)
        assert set(head["adds"]) == expected_at[-1]
        v = data.draw(st.integers(0, len(ops) - 1))
        assert set(delta_snapshot(t, version=v)["adds"]) == \
            expected_at[v]


# ---------------------------------------------------------------------------
# Iceberg: snapshot isolation vs a per-commit list simulation
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["en", "de", "fr"]),
                         min_size=1, max_size=3),
                min_size=1, max_size=5), st.data())
def test_iceberg_snapshots_are_isolated(commits, data):
    import tempfile

    from gfw_pixetl_spark.sources.iceberg import IcebergTable

    with tempfile.TemporaryDirectory() as tmp:
        t = IcebergTable(f"{tmp}/tbl", [("doc_id", "long"),
                                        ("lang", "string")], ["lang"])
        cumulative: list[list[str]] = []
        seen: list[str] = []
        for ci, langs in enumerate(commits):
            files = [{"path": f"data/c{ci}-{i}-{lang}.parquet",
                      "partition": {"lang": lang},
                      "record_count": 1, "size": 10}
                     for i, lang in enumerate(langs)]
            t.commit(files)
            seen = seen + [f["path"] for f in files]
            cumulative.append(list(seen))
        sid = data.draw(st.integers(1, len(commits)))
        plan = t.plan(snapshot_id=sid)
        assert sorted(f["file_path"] for f in plan["files"]) == \
            sorted(cumulative[sid - 1])


# ---------------------------------------------------------------------------
# protobuf: generative encoder -> walk_fields recovers every field
# ---------------------------------------------------------------------------


def _encode_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


_fields = st.lists(st.tuples(
    st.integers(1, 200),
    st.one_of(
        st.tuples(st.just(0), st.integers(0, 2**63 - 1)),
        st.tuples(st.just(1), st.integers(0, 2**64 - 1)),
        st.tuples(st.just(2), st.binary(max_size=40)),
        st.tuples(st.just(5), st.integers(0, 2**32 - 1)),
    )), max_size=20)


@settings(max_examples=60, deadline=None)
@given(_fields)
def test_proto_walk_recovers_generated_fields(fields):
    blob = bytearray()
    for num, (wire, value) in fields:
        blob += _encode_varint((num << 3) | wire)
        if wire == 0:
            blob += _encode_varint(value)
        elif wire == 1:
            blob += value.to_bytes(8, "little")
        elif wire == 2:
            blob += _encode_varint(len(value)) + value
        else:
            blob += value.to_bytes(4, "little")
    got = list(walk_fields(bytes(blob)))
    assert got == [(num, wire, value)
                   for num, (wire, value) in fields]


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=60))
def test_proto_walk_never_hangs_or_overreads(blob):
    try:
        fields = list(walk_fields(blob))
    except ValueError:
        return
    # a clean parse must account for every byte (walk is exhaustive)
    total = 0
    for num, wire, value in fields:
        assert num >= 1
        total += 1  # at least the tag byte
    assert total <= len(blob)


# ---------------------------------------------------------------------------
# SURT: constructive property
# ---------------------------------------------------------------------------

_label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
                 min_size=1, max_size=8)


@settings(max_examples=60, deadline=None)
@given(st.lists(_label, min_size=2, max_size=4), _label,
       st.booleans())
def test_surt_construction(labels, path_seg, www):
    host = ".".join((["www"] if www else []) + labels)
    url = f"https://{host}/{path_seg}"
    expected = ",".join(reversed(labels)) + ")/" + path_seg
    assert surt(url) == expected


# ---------------------------------------------------------------------------
# MediaWiki: dump round trip with XML-hostile text
# ---------------------------------------------------------------------------

_wiki_text = st.text(
    alphabet=st.sampled_from(list("abc <>&\"'\n[]{}|=")), max_size=80)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 10**6), _wiki_text),
                min_size=1, max_size=8, unique_by=lambda t: t[0]))
def test_mediawiki_dump_roundtrip_property(pages):
    dump = write_dump([{"title": f"T{pid}", "id": pid, "text": txt}
                       for pid, txt in pages])
    got = list(iter_pages(dump))
    assert [(p["id"], p["text"]) for p in got] == pages

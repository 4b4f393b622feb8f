"""Hadoop SequenceFile codec (sources/sequencefile.py): VInt spec
behavior, round trips (plain + record-compressed), sync escapes,
record_index bounds, lenient scan damage semantics, hostile inputs,
and a hypothesis round-trip property."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gfw_pixetl_spark.sources.sequencefile import (
    DEFLATE_CODEC, KEY_CLASS, iter_seqfile, read_header, read_vint,
    record_index, scan_seqfile, write_seqfile, write_vint,
)


def _recs(n=500):
    return [(f"key{i}".encode(), (f"value {i} " * (i % 7 + 1)).encode())
            for i in range(n)]


def test_vint_roundtrip_and_sizes():
    # one-byte fast path boundary values per WritableUtils
    for n, size in [(0, 1), (127, 1), (-112, 1), (128, 2), (-113, 2),
                    (255, 2), (256, 3), (1 << 20, 4), (-(1 << 20), 4),
                    (2**60, 9), (-(2**60), 9)]:
        b = bytearray()
        write_vint(b, n)
        assert len(b) == size, (n, len(b))
        v, pos = read_vint(bytes(b), 0)
        assert (v, pos) == (n, size)


def test_roundtrip_both_modes_and_header():
    recs = _recs()
    for comp in (False, True):
        blob = write_seqfile(recs, compressed=comp,
                             metadata={"src": "unit", "v": "1"})
        kc, vc, c, meta, sync, _ = read_header(blob)
        assert kc == KEY_CLASS and c == comp
        assert meta == {"src": "unit", "v": "1"}
        assert list(iter_seqfile(blob)) == recs
        got, counters = scan_seqfile(blob)
        assert got == recs
        assert counters == {"n_records": len(recs), "bad_records": 0,
                            "junk_bytes": 0}
        idx = record_index(blob)
        assert len(idx) == len(recs)
    # deterministic bytes
    assert write_seqfile(recs) == write_seqfile(recs)


def test_sync_escapes_present_and_damage_isolated():
    recs = _recs()
    blob = write_seqfile(recs, compressed=True)
    # sync escapes every ~2000 bytes: the -1 escape must appear
    _, _, _, _, sync, _ = read_header(blob)
    escape = struct.pack(">i", -1) + sync
    assert blob.count(escape) > 3
    # one flipped byte mid-file: only the records between two syncs die
    dam = bytearray(blob)
    dam[len(blob) // 2] ^= 0xFF
    got, c = scan_seqfile(bytes(dam))
    assert c["bad_records"] >= 1
    assert len(got) > len(recs) - 60  # one sync window's worth at most
    pool = list(recs)
    for r in got:
        assert r in pool
        pool.remove(r)
    with pytest.raises(ValueError):
        list(iter_seqfile(bytes(dam)))
    # per-record syncs (sync_interval=1) bound the loss to ONE record
    blob1 = write_seqfile(recs[:20], compressed=True, sync_interval=1)
    idx = record_index(blob1)
    dam = bytearray(blob1)
    dam[idx[5][0] + 8 + len(b"key5") + 4 + 3] ^= 0xFF  # in the value
    got, c = scan_seqfile(bytes(dam))
    assert len(got) == 19 and c["bad_records"] == 1


def test_record_index_ranged_access():
    recs = _recs(50)
    blob = write_seqfile(recs, sync_interval=1)
    idx = record_index(blob)
    # every record is independently parseable from its span given the
    # header (the offset-range split shape)
    _, _, _, _, sync, hdr_end = read_header(blob)
    head = blob[:hdr_end]
    for (o, s), want in zip(idx, recs):
        assert list(iter_seqfile(head + blob[o:o + s])) == [want]


def test_hostile_inputs():
    blob = write_seqfile(_recs(10), compressed=True)
    for cut in (2, 10, len(blob) // 2, len(blob) - 3):
        with pytest.raises(ValueError):
            list(iter_seqfile(blob[:cut]))
    with pytest.raises(ValueError, match="magic"):
        read_header(b"SEQ\x05" + blob[4:])
    # block compression flagged -> clear refusal
    dam = bytearray(blob)
    kc_len = len(KEY_CLASS)
    flag_at = 4 + 1 + kc_len + 1 + kc_len + 1  # after both class names
    dam[flag_at] = 1
    with pytest.raises(ValueError, match="block compression"):
        read_header(bytes(dam))
    # garbage never hangs the lenient scan
    got, c = scan_seqfile(b"\x00" * 10000)
    assert got == [] and c["junk_bytes"] == 10000


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.binary(max_size=40), st.binary(max_size=200)),
                max_size=30),
       st.booleans())
def test_property_roundtrip(recs, comp):
    blob = write_seqfile(recs, compressed=comp)
    assert list(iter_seqfile(blob)) == recs
    got, c = scan_seqfile(blob)
    assert got == recs and c["bad_records"] == 0

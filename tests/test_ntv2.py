"""NTv2 datum-shift grids (sources/ntv2.py): writer/parser round trip
in both byte orders, subgrid refinement (children shadow parents), the
positive-west longitude sign quirk, bit-exact bilinear interpolation
on dyadic fixtures, and the malformed-file surface."""

from __future__ import annotations

import numpy as np
import pytest

from gfw_pixetl_spark.sources.ntv2 import (
    apply_shift, parse_gsb, select_subgrid, write_gsb,
)


def _grids():
    def mk(s_lat, n_lat, e_w, w_w, inc):
        lats = np.arange(s_lat, n_lat + 1e-9, inc)
        lonw = np.arange(e_w, w_w + 1e-9, inc)
        lg, wg = np.meshgrid(lats, lonw, indexing="ij")
        return dict(
            s_lat=s_lat * 3600, n_lat=n_lat * 3600,
            e_long=e_w * 3600, w_long=w_w * 3600,
            lat_inc=inc * 3600, long_inc=inc * 3600,
            lat_shift=1.0 + lg / 512 + wg / 1024,
            lon_shift=0.5 + lg / 1024 - wg / 2048,
        )
    parent = mk(20, 50, 60, 130, 1.0)
    parent.update(name="PARENT0", parent="NONE")
    child = mk(30, 40, 80, 100, 0.5)
    child.update(name="CHILD0", parent="PARENT0")
    return [parent, child]


@pytest.mark.parametrize("en", ["<", ">"])
def test_roundtrip_and_bit_exact_shift(en):
    grids = parse_gsb(write_gsb(_grids(), byte_order=en))
    assert [g["name"] for g in grids] == ["PARENT0", "CHILD0"]
    lat = np.array([22.25, 35.25, 49.0, 10.0])
    lon = np.array([-62.25, -90.75, -126.0, -150.0])
    la2, lo2, nm = apply_shift(grids, lat, lon)
    for i in range(4):
        la, lo = lat[i], lon[i]
        w = -lo
        if 20 <= la <= 50 and 60 <= w <= 130:
            # dyadic node values + dyadic weights: bilinear == closed
            # form with zero rounding anywhere before the /3600
            assert la2[i] == la + (1.0 + la / 512 + w / 1024) / 3600.0
            assert lo2[i] == lo - (0.5 + la / 1024 - w / 2048) / 3600.0
            want = ("CHILD0" if 30 <= la <= 40 and 80 <= w <= 100
                    else "PARENT0")
            assert nm[i] == want
        else:  # outside every subgrid: identity pass-through
            assert la2[i] == la and lo2[i] == lo and nm[i] == ""


def test_select_subgrid_refinement():
    grids = parse_gsb(write_gsb(_grids()))
    # child interior -> child; parent-only area -> parent; outside -> None
    assert select_subgrid(grids, 35 * 3600, 90 * 3600)["name"] == "CHILD0"
    assert select_subgrid(grids, 25 * 3600, 90 * 3600)["name"] == "PARENT0"
    # child boundary belongs to the child (inclusive bounds)
    assert select_subgrid(grids, 30 * 3600, 80 * 3600)["name"] == "CHILD0"
    assert select_subgrid(grids, 55 * 3600, 90 * 3600) is None


def test_positive_west_sign_quirk():
    """A pure-longitude shift moves an east-positive coordinate WEST
    when the stored (positive-west) shift is positive."""
    g = _grids()[0]
    g["lat_shift"] = np.zeros_like(g["lat_shift"])
    g["lon_shift"] = np.full_like(g["lon_shift"], 4.5)  # 4.5" west
    grids = parse_gsb(write_gsb([g]))
    la2, lo2, _ = apply_shift(grids, np.array([30.0]), np.array([-90.0]))
    assert la2[0] == 30.0
    assert lo2[0] == -90.0 - 4.5 / 3600.0  # dyadic shift: bit-exact


def test_malformed_gsb():
    with pytest.raises(ValueError, match="NUM_OREC"):
        parse_gsb(b"NOT A GSB FILE" + b"\x00" * 200)
    good = write_gsb(_grids())
    with pytest.raises(ValueError, match="truncated"):
        parse_gsb(good[:-100])
    # writer refuses a shape/bounds mismatch
    g = _grids()[0]
    g["lat_shift"] = g["lat_shift"][:-1]
    g["lon_shift"] = g["lon_shift"][:-1]
    with pytest.raises(ValueError, match="shape"):
        write_gsb([g])

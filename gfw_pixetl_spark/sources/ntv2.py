"""NTv2 datum-shift grids (.gsb) — the grid-based datum transformation
format (Natural Resources Canada, public spec) PROJ applies for
NAD27->NAD83-style shifts; closes the "NTv2 raises NotImplementedError"
residual in the CRS matrix (README.md).

Format: an overview header of 11 x 16-byte records (8-byte ASCII name +
8-byte value; ints are i4 + 4 pad bytes, reals f8), then per subgrid a
header of 11 records (SUB_NAME/PARENT strings, S_LAT/N_LAT/E_LONG/
W_LONG/LAT_INC/LONG_INC doubles in ARC-SECONDS with longitude POSITIVE
WEST — the famous NTv2 sign quirk — and GS_COUNT), then GS_COUNT nodes
of 4 x f4 (lat shift, lon shift, lat accuracy, lon accuracy; shifts in
arc-seconds, lon shift positive west). Node order: start at
(S_LAT, E_LONG), longitude varies fastest increasing WESTWARD, then
rows northward.

Semantics implemented:

* ``write_gsb`` — spec-valid writer (fixtures; parent + child
  subgrids),
* ``parse_gsb`` — header walk + node arrays (little- and big-endian,
  detected from NUM_OREC),
* ``select_subgrid`` — densest grid containing the point (children
  shadow their parent where they overlap, the NTv2 refinement rule),
* ``apply_shift`` — bilinear interpolation of the four surrounding
  nodes, then lat' = lat + dlat/3600 and (east-positive)
  lon' = lon - dlon/3600.

Scale shape: a shift grid is reference metadata (kBs..MBs), carried to
executors in the kernel closure and applied vectorized per Arrow batch
— the q384/q50 multimodal-kernel discipline. q385 value-checks the
full parse+select+interpolate chain against a closed-form oracle
(node values chosen dyadic so float32 storage and f64 interpolation
are both exact).
"""

from __future__ import annotations

import struct

import numpy as np


def _rec_str(name: str, val: str) -> bytes:
    return name.ljust(8).encode()[:8] + val.ljust(8).encode()[:8]


def _rec_int(name: str, val: int, en: str) -> bytes:
    return name.ljust(8).encode()[:8] + struct.pack(en + "i", val) \
        + b"\x00" * 4


def _rec_dbl(name: str, val: float, en: str) -> bytes:
    return name.ljust(8).encode()[:8] + struct.pack(en + "d", val)


def write_gsb(subgrids: list[dict], byte_order: str = "<") -> bytes:
    """Write subgrids ([{'name', 'parent', 's_lat', 'n_lat', 'e_long',
    'w_long', 'lat_inc', 'long_inc' (all arc-seconds, lon positive
    west), 'lat_shift', 'lon_shift' (2-D float arrays [row][col],
    row 0 at S_LAT, col 0 at E_LONG increasing west)}])."""
    en = byte_order
    out = bytearray()
    out += _rec_int("NUM_OREC", 11, en)
    out += _rec_int("NUM_SREC", 11, en)
    out += _rec_int("NUM_FILE", len(subgrids), en)
    out += _rec_str("GS_TYPE", "SECONDS")
    out += _rec_str("VERSION", "NTv2.0")
    out += _rec_str("SYSTEM_F", "NAD27")
    out += _rec_str("SYSTEM_T", "NAD83")
    out += _rec_dbl("MAJOR_F", 6378206.4, en)
    out += _rec_dbl("MINOR_F", 6356583.8, en)
    out += _rec_dbl("MAJOR_T", 6378137.0, en)
    out += _rec_dbl("MINOR_T", 6356752.314, en)
    for g in subgrids:
        lat_shift = np.asarray(g["lat_shift"], dtype=np.float32)
        lon_shift = np.asarray(g["lon_shift"], dtype=np.float32)
        nrows, ncols = lat_shift.shape
        want_rows = round((g["n_lat"] - g["s_lat"]) / g["lat_inc"]) + 1
        want_cols = round((g["w_long"] - g["e_long"]) / g["long_inc"]) + 1
        if (nrows, ncols) != (want_rows, want_cols):
            raise ValueError(
                f"subgrid {g['name']}: shape {(nrows, ncols)} != "
                f"bounds/inc shape {(want_rows, want_cols)}")
        out += _rec_str("SUB_NAME", g["name"])
        out += _rec_str("PARENT", g.get("parent", "NONE"))
        out += _rec_str("CREATED", "20260101")
        out += _rec_str("UPDATED", "20260101")
        for k in ("s_lat", "n_lat", "e_long", "w_long",
                  "lat_inc", "long_inc"):
            out += _rec_dbl(k.upper(), float(g[k]), en)
        out += _rec_int("GS_COUNT", nrows * ncols, en)
        for r in range(nrows):
            for c in range(ncols):
                out += struct.pack(en + "4f", float(lat_shift[r, c]),
                                   float(lon_shift[r, c]), 0.0, 0.0)
    return bytes(out)


def parse_gsb(data: bytes) -> list[dict]:
    """Subgrid list: bounds/incs in arc-seconds (lon positive west) and
    float32 shift arrays. Endianness detected from NUM_OREC == 11."""
    if data[:8].rstrip() != b"NUM_OREC":
        raise ValueError("not an NTv2 .gsb (NUM_OREC missing)")
    en = "<" if struct.unpack_from("<i", data, 8)[0] == 11 else ">"
    if struct.unpack_from(en + "i", data, 8)[0] != 11:
        raise ValueError("NTv2: NUM_OREC != 11 in either byte order")

    def rec_name(at):
        return data[at:at + 8].rstrip(b"\x00 ").decode("latin-1")

    n_file = None
    pos = 0
    for _ in range(11):
        name = rec_name(pos)
        if name == "NUM_FILE":
            n_file = struct.unpack_from(en + "i", data, pos + 8)[0]
        pos += 16
    if n_file is None or n_file < 1:
        raise ValueError("NTv2: missing or empty NUM_FILE")

    grids = []
    for _ in range(n_file):
        hdr: dict = {}
        for _ in range(11):
            name = rec_name(pos)
            if name in ("SUB_NAME", "PARENT", "CREATED", "UPDATED"):
                hdr[name] = data[pos + 8:pos + 16].rstrip(
                    b"\x00 ").decode("latin-1")
            elif name == "GS_COUNT":
                hdr[name] = struct.unpack_from(en + "i", data,
                                               pos + 8)[0]
            else:
                hdr[name] = struct.unpack_from(en + "d", data,
                                               pos + 8)[0]
            pos += 16
        count = int(hdr["GS_COUNT"])
        nrows = round((hdr["N_LAT"] - hdr["S_LAT"]) / hdr["LAT_INC"]) + 1
        ncols = round((hdr["W_LONG"] - hdr["E_LONG"])
                      / hdr["LONG_INC"]) + 1
        if nrows * ncols != count:
            raise ValueError(
                f"NTv2: GS_COUNT {count} != grid {nrows}x{ncols}")
        if pos + 16 * count > len(data):
            raise ValueError("NTv2: truncated node records")
        nodes = np.frombuffer(
            data, dtype=np.dtype(en + "f4"), count=4 * count,
            offset=pos).reshape(count, 4)
        pos += 16 * count
        grids.append({
            "name": hdr["SUB_NAME"], "parent": hdr["PARENT"],
            "s_lat": hdr["S_LAT"], "n_lat": hdr["N_LAT"],
            "e_long": hdr["E_LONG"], "w_long": hdr["W_LONG"],
            "lat_inc": hdr["LAT_INC"], "long_inc": hdr["LONG_INC"],
            "lat_shift": nodes[:, 0].reshape(nrows, ncols),
            "lon_shift": nodes[:, 1].reshape(nrows, ncols),
        })
    return grids


def select_subgrid(grids: list[dict], lat_sec: float,
                   lon_w_sec: float) -> dict | None:
    """Densest subgrid containing the point (children refine their
    parent, so smallest LAT_INC wins; ties keep file order)."""
    best = None
    for g in grids:
        if (g["s_lat"] <= lat_sec <= g["n_lat"]
                and g["e_long"] <= lon_w_sec <= g["w_long"]):
            if best is None or g["lat_inc"] < best["lat_inc"]:
                best = g
    return best


def _bilinear(grid: np.ndarray, fr: np.ndarray, fc: np.ndarray,
              r0: np.ndarray, c0: np.ndarray) -> np.ndarray:
    v00 = grid[r0, c0]
    v01 = grid[r0, c0 + 1]
    v10 = grid[r0 + 1, c0]
    v11 = grid[r0 + 1, c0 + 1]
    return ((1 - fr) * (1 - fc) * v00 + (1 - fr) * fc * v01
            + fr * (1 - fc) * v10 + fr * fc * v11)


def apply_shift(grids: list[dict], lat_deg, lon_deg):
    """Shift east-positive degree coordinates through the grid file:
    (lat', lon', subgrid names). Vectorized; points outside every
    subgrid pass through unchanged with name ''."""
    lat_deg = np.asarray(lat_deg, dtype=np.float64)
    lon_deg = np.asarray(lon_deg, dtype=np.float64)
    lat_sec = lat_deg * 3600.0
    lon_w_sec = -lon_deg * 3600.0  # NTv2 longitudes are positive WEST
    out_lat = lat_deg.copy()
    out_lon = lon_deg.copy()
    names = np.full(lat_deg.shape, "", dtype=object)
    # vectorize per subgrid: assign points to their densest container
    chosen = np.full(lat_deg.shape, -1, dtype=np.int64)
    chosen_inc = np.full(lat_deg.shape, np.inf)
    for gi, g in enumerate(grids):
        inside = ((lat_sec >= g["s_lat"]) & (lat_sec <= g["n_lat"])
                  & (lon_w_sec >= g["e_long"])
                  & (lon_w_sec <= g["w_long"]))
        take = inside & (g["lat_inc"] < chosen_inc)
        chosen[take] = gi
        chosen_inc[take] = g["lat_inc"]
    for gi, g in enumerate(grids):
        m = chosen == gi
        if not m.any():
            continue
        rows, cols = g["lat_shift"].shape
        r = (lat_sec[m] - g["s_lat"]) / g["lat_inc"]
        c = (lon_w_sec[m] - g["e_long"]) / g["long_inc"]
        r0 = np.clip(np.floor(r).astype(np.int64), 0, rows - 2)
        c0 = np.clip(np.floor(c).astype(np.int64), 0, cols - 2)
        fr = r - r0
        fc = c - c0
        dlat = _bilinear(g["lat_shift"].astype(np.float64), fr, fc,
                         r0, c0)
        dlon = _bilinear(g["lon_shift"].astype(np.float64), fr, fc,
                         r0, c0)
        out_lat[m] = lat_deg[m] + dlat / 3600.0
        out_lon[m] = lon_deg[m] - dlon / 3600.0  # positive-west shift
        names[m] = g["name"]
    return out_lat, out_lon, names

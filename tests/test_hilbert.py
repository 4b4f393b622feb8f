"""Hilbert-curve key tests — functions/partitioning.py."""

from __future__ import annotations

import duckdb

from gfw_pixetl_spark.functions.partitioning import (
    hilbert_key_py,
    hilbert_key_sql,
    morton_key_sql,
)


def test_bijection_and_unit_step_adjacency():
    """The defining property: d -> (x, y) is a bijection and
    consecutive d are grid neighbors (Manhattan distance exactly 1)."""
    bits = 4
    n = 1 << bits
    inv = {}
    for x in range(n):
        for y in range(n):
            inv[hilbert_key_py(x, y, bits)] = (x, y)
    assert sorted(inv) == list(range(n * n))
    for d in range(1, n * n):
        (x1, y1), (x2, y2) = inv[d - 1], inv[d]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_sql_twin_agrees_with_python():
    ctes = hilbert_key_sql(
        "gx", "gy", 4,
        "(SELECT CAST(i % 16 AS INT) AS gx, CAST(i // 16 AS INT) AS gy "
        "FROM range(256) t(i))")
    rows = duckdb.connect().execute(
        f"WITH {ctes} SELECT gx, gy, hkey FROM h0").fetchall()
    assert len(rows) == 256
    assert all(hilbert_key_py(gx, gy, 4) == hk for gx, gy, hk in rows)


def test_hilbert_beats_morton_on_shard_bbox_area():
    """The locality figure of merit a layout optimizer compares:
    total bounding-box area of range-bucketed shards. Hilbert's
    no-jump property must give a strictly tighter layout than Morton
    on the same 36x18 grid and shard size."""
    con = duckdb.connect()
    ctes = hilbert_key_sql(
        "gx", "gy", 6,
        "(SELECT CAST(i % 36 AS INT) AS gx, CAST(i // 36 AS INT) AS gy "
        "FROM range(648) t(i))")
    hilbert_area = con.execute(f"""
        WITH {ctes}
        SELECT SUM((mx - mn_x + 1) * (my - mn_y + 1)) FROM (
          SELECT hkey // 50, MAX(gx) AS mx, MIN(gx) AS mn_x,
                 MAX(gy) AS my, MIN(gy) AS mn_y
          FROM h0 GROUP BY 1)
        """).fetchone()[0]
    morton_area = con.execute(f"""
        WITH g AS (SELECT CAST(i % 36 AS INT) AS gx,
                          CAST(i // 36 AS INT) AS gy FROM range(648) t(i))
        SELECT SUM((mx - mn_x + 1) * (my - mn_y + 1)) FROM (
          SELECT {morton_key_sql('gx', 'gy', 6)} // 50,
                 MAX(gx) AS mx, MIN(gx) AS mn_x,
                 MAX(gy) AS my, MIN(gy) AS mn_y
          FROM g GROUP BY 1)
        """).fetchone()[0]
    assert hilbert_area < morton_area, (hilbert_area, morton_area)

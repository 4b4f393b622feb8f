"""Order-insensitive result comparison used by the oracle gate.

Mirrors the driver's compare: sort columns by name, normalize cells,
sort rows, then require exact equality (floats via repr-9 rounding so
bit-identical doubles compare equal and real mismatches surface).
"""

from __future__ import annotations

import math

DUCKDB_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def register_duckdb_views(con, sf_dir: str) -> None:
    for t in DUCKDB_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def compare_results(scols, srows, ocols, orows) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if sorted(scols) != sorted(ocols):
        problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        return problems
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        return problems
    s = norm_rows(scols, [tuple(r) for r in srows])
    o = norm_rows(ocols, orows)
    if s != o:
        diffs = [(a, b) for a, b in zip(s, o) if a != b][:3]
        problems.append(f"value mismatch; first diffs: {diffs}")
    return problems

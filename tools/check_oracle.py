"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entry_mod
from gfw_pixetl_spark.session import get_spark

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver hashes exact values; we round to spot real mismatches vs noise
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    spark = get_spark("oracle-check")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"okNO {name}: rows={len(srows)} (no oracle, rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            orel = con.execute(oracles[name])
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            ok = False
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
        elif len(srows) != len(orows):
            ok = False
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
        else:
            s = norm_rows(scols, [tuple(r) for r in srows])
            o = norm_rows(ocols, orows)
            if s != o:
                ok = False
                diffs = [(a, b) for a, b in zip(s, o) if a != b][:3]
                print(f"FAIL {name}: value mismatch; first diffs: {diffs}")
        if ok:
            print(f"ok   {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)

    missing_oracle = [n for n in queries if n not in oracles]
    print(f"\n{len(queries)} queries, {len(failures)} failures, "
          f"{len(missing_oracle)} rows-only: {missing_oracle}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

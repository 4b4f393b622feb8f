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


def _duckdb_type_token(t: str) -> str:
    """Collapse a DuckDB column_type into the dtype family the driver's
    Arrow-based hash distinguishes.  The driver converts both sides to Arrow;
    HUGEINT/DECIMAL become decimal128 (pandas ``Decimal`` objects) while all
    machine ints become plain ints — so ``decimal`` must NOT equal ``int``,
    but int widths collapse together (driver hashes values, not widths)."""
    t = t.strip().upper()
    if t.startswith("DECIMAL") or t == "HUGEINT" or t == "UHUGEINT":
        return "decimal"
    if t.startswith("STRUCT") or t.endswith("[]") or t.startswith("MAP"):
        return "nested"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "DATE":
        return "date"
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "string"
    if t == "BOOLEAN":
        return "bool"
    if t == "BLOB":
        return "binary"
    return t.lower()


def _spark_type_token(t: str) -> str:
    t = t.strip().lower()
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith("array") or t.startswith("struct") or t.startswith("map"):
        return "nested"
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if t in ("double", "float"):
        return "float"
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "date":
        return "date"
    if t == "boolean":
        return "bool"
    return t


def dtype_problems(duck_con, oracle_sql: str, spark_df) -> list[str]:
    """Driver-hash twin for dtypes: DESCRIBE the oracle (no execution) and
    compare each column's dtype family against the Spark schema.  Catches
    the decimal128-vs-int64 Arrow artifact that value-equality misses."""
    desc = duck_con.execute(f"DESCRIBE ({oracle_sql})").fetchall()
    otypes = {r[0]: _duckdb_type_token(r[1]) for r in desc}
    stypes = {name: _spark_type_token(t) for name, t in spark_df.dtypes}
    problems = []
    for col in sorted(set(otypes) & set(stypes)):
        if otypes[col] != stypes[col]:
            problems.append(
                f"dtype {col}: spark={stypes[col]} oracle={otypes[col]}"
            )
    return problems


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

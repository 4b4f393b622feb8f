"""Shared SQL fragments for the text-family harness modules.

Both engines (Spark and the DuckDB oracle) are driven from these same
constants so the math is identical on both sides.
"""

from __future__ import annotations

from ..functions import dedup as D
from ..functions.hashing import md5_int64_sql, minhash_coeffs

# shared SQL fragments -----------------------------------------------------
SQL_WORDS = "list_filter(string_split(text, ' '), w -> w != '')"
SQL_WORDSET = f"list_distinct({SQL_WORDS})"
COEFFS = minhash_coeffs(D.N_MINHASH)


def _sql_word_hash(expr: str = "word") -> str:
    return md5_int64_sql(expr)

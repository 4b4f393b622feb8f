"""Full oracle-parity gate at sf0.001 — the local twin of the driver's
CORRECTNESS check: every queries() entry vs its DuckDB oracle_sql() twin,
order-insensitive, column-name-sorted, value-exact."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from gfw_pixetl_spark.harness.compare import compare_results, dtype_problems
from tests.conftest import SF_SMOKE

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

# every registered query now carries a value-check oracle; rows-only is empty
ROWS_ONLY = set()


def test_registry_complete():
    assert set(QUERIES) - set(ORACLES) == ROWS_ONLY
    assert len(QUERIES) >= 40


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_SMOKE)
    scols, srows = sdf.columns, sdf.collect()
    if name in ROWS_ONLY:
        assert len(srows) > 0
        return
    orel = duck.execute(ORACLES[name])
    ocols = [d[0] for d in orel.description]
    orows = orel.fetchall()
    problems = compare_results(scols, [tuple(r) for r in srows], ocols, orows)
    # driver-hash twin: the driver compares via Arrow, where DuckDB HUGEINT /
    # DECIMAL become decimal128 and hash-mismatch Spark's int64/double even
    # when values are identical — catch that locally before the driver does
    problems += dtype_problems(duck, ORACLES[name], sdf)
    assert not problems, f"{name}: {problems}"

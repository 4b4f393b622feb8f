"""Full oracle-parity gate at sf0.001 — the local twin of the driver's
CORRECTNESS check: every queries() entry vs its DuckDB oracle_sql() twin,
order-insensitive, column-name-sorted, value-exact."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from gfw_pixetl_spark.harness.compare import compare_results
from tests.conftest import SF_SMOKE

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_registry_complete():
    # every query has an oracle (non-SQL-expressible ops would be exempt,
    # but we currently express everything in SQL)
    assert set(ORACLES) == set(QUERIES)
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
    orel = duck.execute(ORACLES[name])
    ocols = [d[0] for d in orel.description]
    orows = orel.fetchall()
    problems = compare_results(scols, [tuple(r) for r in srows], ocols, orows)
    assert not problems, f"{name}: {problems}"

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from gfw_pixetl_spark.session import get_spark

    spark = get_spark("gfw_pixetl_spark-tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def duck():
    from gfw_pixetl_spark.harness.compare import register_duckdb_views

    con = duckdb.connect()
    register_duckdb_views(con, SF_SMOKE)
    yield con
    con.close()

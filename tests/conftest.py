from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"

# The suite runs on ~500-row fixtures: a local[32] session spends more
# wall time scheduling 32-way stages than computing them (measured 1.5x
# on the streaming/sink files). Size the TEST session to the fixtures,
# not the bench: 8 cores unless explicitly overridden. This only
# affects pytest — bench.py and the driver contract read
# SPARK_GRAFT_CPUS from their own environment.
import os  # noqa: E402

os.environ["SPARK_GRAFT_CPUS"] = os.environ.get(
    "SPARK_GRAFT_TEST_CPUS", "8")


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

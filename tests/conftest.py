from __future__ import annotations

import os

import pytest

from data_governance_spark.session import get_spark
from data_governance_spark.testing import duckdb_conn

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("dg_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck_smoke():
    con = duckdb_conn(SF_SMOKE)
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_correctness():
    con = duckdb_conn(SF_CORRECTNESS)
    yield con
    con.close()

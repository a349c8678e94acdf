"""The local twin of the driver's correctness gate: every query with an
oracle must hash-match DuckDB on the same parquet, at sf0.001 (fast,
every run) and sf0.01 (the gate's actual SF)."""

from __future__ import annotations

import pytest

from data_governance_spark.queries.registry import ORACLES, QUERIES
from data_governance_spark.testing import assert_matches_oracle
from tests.conftest import SF_CORRECTNESS, SF_SMOKE

ORACLE_QUERY_NAMES = sorted(ORACLES)
SKETCH_QUERY_NAMES = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_QUERY_NAMES)
def test_oracle_parity_smoke(spark, duck_smoke, name):
    q = QUERIES[name]
    assert_matches_oracle(q.fn(spark, SF_SMOKE), duck_smoke, q.oracle)


@pytest.mark.slow
@pytest.mark.parametrize("name", ORACLE_QUERY_NAMES)
def test_oracle_parity_sf001(spark, duck_correctness, name):
    q = QUERIES[name]
    assert_matches_oracle(q.fn(spark, SF_CORRECTNESS), duck_correctness, q.oracle)


@pytest.mark.parametrize("name", SKETCH_QUERY_NAMES)
def test_sketch_queries_run(spark, name):
    """Rows-only smoke for the no-oracle sketches: runs, stable schema."""
    df = QUERIES[name].fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    qs = entrymod.queries()
    oz = entrymod.oracle_sql()
    assert set(oz) <= set(qs)
    assert len(qs) >= 20

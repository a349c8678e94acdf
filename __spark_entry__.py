"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (broadcast dim joins + ROLLUP) at sf0.001.
queries()      — every implemented operator from SURVEY.md §2 as
                 (spark, sf_dir) -> DataFrame callables.
oracle_sql()   — DuckDB-equivalent ANSI SQL per query; ALL 50 queries
                 carry one (the sketch gates assert planted-duplicate
                 recall / probe-all exactness, which SQL can state).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_governance_spark.queries.registry import ORACLES, QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q03_region_nation_rollup"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)

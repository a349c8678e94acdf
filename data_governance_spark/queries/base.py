"""Query registry plumbing.

A query is a named (spark_fn, oracle_sql) pair. ``spark_fn(spark,
sf_dir) -> DataFrame`` is the engine's plan; ``oracle_sql`` is the
equivalent ANSI SQL DuckDB runs over the same parquet for the
correctness gate. ``oracle_sql=None`` marks genuinely
non-SQL-expressible operators (probabilistic sketches etc.) — the
driver then records a weaker rows-only check.

Column names must match between both sides (the driver hash-compares
after sorting columns by name), so every computed column is aliased
identically in the DataFrame code and the SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


def qdef(
    registry: dict[str, QueryDef], name: str, oracle: str | None, doc: str = ""
):
    """Decorator registering a query function under ``name``."""

    def deco(fn):
        registry[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco

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

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


def melt_metrics(
    df: DataFrame,
    key: Column,
    metrics: Sequence[str],
    gate: str | Column,
    sep: str = ":",
) -> DataFrame:
    """Unpivot per-row NUMERIC metric columns into the compound gates'
    shared quad schema: one (gate, k, v_s, v_d) row per (input row,
    metric), with k = <key><sep><metric>, v_d = the metric value and
    v_s NULL. Pins the k/v_s/v_d contract in one place instead of a
    hand-rolled explode(array(struct(...))) per gate (a key-format slip
    in any copy is a silent oracle mismatch). `gate` may be a Column
    for per-row sub-gate labels (e.g. q45's codec rows)."""
    from data_governance_spark.cache import column_memo

    # both trees are pure functions of (metrics, sep) over fixed
    # internal names — memoized per context (16 calls per bench sweep)
    e = column_memo(
        ("melt_explode", tuple(metrics)),
        lambda: F.explode(
            F.array(
                *[
                    F.struct(F.lit(m).alias("m"), F.col(m).alias("v"))
                    for m in metrics
                ]
            )
        ).alias("e"),
    )
    out_cols = column_memo(
        ("melt_out", sep),
        lambda: [
            F.col("_mg").alias("gate"),
            F.concat(F.col("_mk"), F.lit(sep), F.col("e.m")).alias("k"),
            F.lit(None).cast("string").alias("v_s"),
            F.col("e.v").alias("v_d"),
        ],
    )
    gcol = gate if isinstance(gate, Column) else F.lit(gate)
    return df.select(gcol.alias("_mg"), key.alias("_mk"), e).select(*out_cols)


def qdef(
    registry: dict[str, QueryDef], name: str, oracle: str | None, doc: str = ""
):
    """Decorator registering a query function under ``name``."""

    def deco(fn):
        registry[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco

"""Skew mitigation utilities (BASELINE 100 TB posture).

AQE's skew-join handling covers joins; aggregations over pathological
hot keys (one language / one country dominating a corpus) still route
an entire key to one reducer. ``salted_count`` implements the standard
two-phase fix: append a random-but-deterministic salt to the group
key, partial-count per (key, salt), then sum per key — the hot key's
work spreads over ``buckets`` reducers. Use for additive aggregates
(count/sum); non-additive aggregates need sketch-based alternatives.

Spark's hash aggregate already does map-side partial combine, which
resolves most skew; salting matters when the DISTINCT group count is
tiny (partial rows per partition ~= group count, so the shuffle is
small but the final agg still single-threads per key when combined
with high-cardinality secondary keys or memory-heavy aggregation
buffers like collect_list).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame,
    keys: list[str],
    buckets: int = 32,
    count_alias: str = "count",
) -> DataFrame:
    """groupBy(keys).count() with two-phase salting.

    Deterministic salt: hash of the full row's monotonic id would be
    nondeterministic across retries — use a hash of the key columns
    plus spark_partition_id, which is stable within a run and spreads
    each hot key across partitions' worth of salts."""
    salt = (F.spark_partition_id() % buckets).alias("_salt")
    partial = (
        df.select(*keys, salt)
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(count_alias))


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value: Column | str,
    buckets: int = 32,
    sum_alias: str = "sum",
) -> DataFrame:
    v = F.col(value) if isinstance(value, str) else value
    salt = (F.spark_partition_id() % buckets).alias("_salt")
    partial = (
        df.select(*keys, v.alias("_v"), salt)
        .groupBy(*keys, "_salt")
        .agg(F.sum("_v").alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(sum_alias))


def explain_shuffles(df: DataFrame) -> int:
    """Count Exchange operators in the physical plan (cheap shuffle
    audit used by tests to pin plan shapes)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")

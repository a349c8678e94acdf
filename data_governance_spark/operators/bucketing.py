"""Bucketed co-located joins: the shuffle-elimination tool for
REPEATED large-large joins (SURVEY §4 / 100 TB posture).

The reference has no large-large joins, but a 100 TB training-data
pipeline does (doc ⋈ doc-features, events ⋈ sessions, sketch mapping ⋈
corpus). Writing both sides bucketed by the join key makes every
subsequent join on that key shuffle-free: Spark matches bucket files
pairwise, so the exchange disappears from the plan — the amortized
answer when one co-partitioning serves many downstream joins (a single
join is cheaper left to AQE).

``sortBy`` on the same key additionally removes the per-task Sort of a
sort-merge join. Bucket counts must match (or divide) across tables
joined together; pick a count sized so each bucket file lands near the
HDFS/S3 block size at the target scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: list[str],
    buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Subsequent equi-joins between tables bucketed on the same
    keys/count run without an Exchange (asserted in
    tests/test_bucketing.py)."""
    w = df.write.mode("overwrite").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, keys: list[str]
) -> DataFrame:
    """Join two co-bucketed tables on their bucket keys."""
    return spark.table(left_table).join(spark.table(right_table), keys)
